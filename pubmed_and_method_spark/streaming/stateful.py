"""Turn-level stateful conversation aggregation —
``applyInPandasWithState``.

`incremental.py` assumes whole conversations arrive per file.  This is
the TURN-level variant it points at: individual turns stream in, state
is keyed by ``conv_id``, and each micro-batch emits the conversation's
current aggregate (update semantics — a latest-wins view over the sink
gives always-current sessions, same read pattern as
``current_signatures``).

State carried per conversation (mirrors what ``build_signatures``
aggregates per conv, plans/pipeline.py): assistant (turn_idx, text)
pairs, distinct tools, ts span, turn count.  Order correctness does
NOT depend on arrival order — turns are re-sorted by turn_idx at every
emit, so late/out-of-order turns within the state horizon are handled
(the per-turn ordering invariant, SURVEY §2.5 W3).

Scale notes: state is O(turns per conversation) per key, partitioned
by conv_id across executors (RocksDB state store in production);
emit-per-batch keeps the sink append-only.  Pass ``idle_timeout`` to
evict idle conversations via event-time timeout + watermark — without
it, a 24/7 stream's state store grows monotonically (every
conversation ever seen).  An evicted conversation whose turns arrive
later is rebuilt from scratch (fresh state), exactly like a brand-new
conversation.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

STATE_SCHEMA = T.StructType(
    [
        T.StructField("turn_idxs", T.ArrayType(T.LongType())),
        T.StructField("texts", T.ArrayType(T.StringType())),
        T.StructField("tools", T.ArrayType(T.StringType())),
        T.StructField("ts_min", T.LongType()),
        T.StructField("ts_max", T.LongType()),
        T.StructField("n_turns", T.LongType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("n_turns", T.LongType()),
        T.StructField("ts_min", T.LongType()),
        T.StructField("ts_max", T.LongType()),
        T.StructField("full_text", T.StringType()),
        T.StructField("tool_profile", T.ArrayType(T.StringType())),
    ]
)


def _fold_conversation(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: Any, idle_seconds: int | None = None
) -> Iterator[pd.DataFrame]:
    if getattr(state, "hasTimedOut", False):
        # watermark passed this conversation's idle deadline with no
        # new turns: evict.  No tombstone emit — the sink keeps the
        # last aggregate; a later turn rebuilds state from scratch.
        state.remove()
        return
    if state.exists:
        turn_idxs, texts, tools, ts_min, ts_max, n_turns = state.get
        turn_idxs, texts, tools = list(turn_idxs), list(texts), list(tools)
    else:
        turn_idxs, texts, tools = [], [], []
        ts_min, ts_max, n_turns = None, None, 0

    for pdf in pdfs:
        n_turns += len(pdf)
        asst = pdf[pdf["role"] == "assistant"]
        turn_idxs.extend(int(i) for i in asst["turn_idx"])
        texts.extend(str(t) for t in asst["text"])
        tools.extend(str(t) for t in pdf["tool"] if t)
        ts = pd.to_datetime(pdf["ts"]).astype("int64") // 10**9
        lo, hi = int(ts.min()), int(ts.max())
        ts_min = lo if ts_min is None else min(ts_min, lo)
        ts_max = hi if ts_max is None else max(ts_max, hi)

    tools = sorted(set(tools))
    state.update((turn_idxs, texts, tools, ts_min, ts_max, n_turns))
    if idle_seconds is not None and ts_max is not None:
        # event-time idle deadline: evict when the watermark passes
        # last-seen-turn + idle_seconds (timeout fires on a LATER
        # trigger in which this conversation has no data)
        state.setTimeoutTimestamp((ts_max + idle_seconds) * 1000)

    order = sorted(range(len(turn_idxs)), key=lambda i: (turn_idxs[i], texts[i]))
    yield pd.DataFrame(
        {
            "conv_id": [key[0]],
            "n_turns": [n_turns],
            "ts_min": [ts_min],
            "ts_max": [ts_max],
            "full_text": [" ".join(texts[i] for i in order)],
            "tool_profile": [tools],
        }
    )


def stateful_conversation_sessions(
    turns: DataFrame,
    idle_timeout: _dt.timedelta | None = None,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Streaming turn feed -> per-conversation running aggregates.

    ``turns`` is a streaming DataFrame with the transcript schema
    (conv_id, turn_idx, role, text, tool, ts).  Returns the update
    stream of conversation aggregates.

    ``idle_timeout``: when set, the input is watermarked on ``ts`` by
    ``watermark_delay`` and a conversation's state is EVICTED
    (event-time timeout) once the watermark passes its last turn +
    idle_timeout — bounding total state for 24/7 streams.  Turns of an
    evicted conversation arriving later re-key a fresh state (clean
    restart, same as a new conversation).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    if idle_timeout is None:
        fold, conf = _fold_conversation, GroupStateTimeout.NoTimeout
    else:
        idle_s = int(idle_timeout.total_seconds())
        turns = turns.withWatermark("ts", watermark_delay)

        def fold(key, pdfs, state):
            return _fold_conversation(key, pdfs, state, idle_seconds=idle_s)

        conf = GroupStateTimeout.EventTimeTimeout
    return (
        turns.groupBy("conv_id")
        .applyInPandasWithState(
            fold,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=conf,
        )
    )
