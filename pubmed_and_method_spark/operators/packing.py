"""Sequence packing — concat-and-chunk documents into fixed
token-budget training sequences (the standard LLM-pretraining batch
layout: shard-local document streams are concatenated and cut every
``budget`` tokens; documents may straddle a cut and contribute spans
to two consecutive sequences).

Spark-first shape: token counts are a narrow projection
(functions.normalize.clean_tokens — no UDF), the per-shard running
offset is ONE window cumsum, and straddling documents fan out via a
``sequence()`` explode — no iterative driver loop, no per-row Python.

Scale contract: a global concatenation order would serialize the
corpus through one partition, so packing is SHARDED — documents are
deterministically assigned to ``n_shards`` independent streams
(``id % n_shards``) and each shard packs in parallel (its own window
partition).  Sequence ids are (shard, seq_id): every shard emits
full ``budget``-token sequences except its final partial one.  At
100 TB, n_shards scales with the cluster (each shard's cumsum is one
sorted partition-local pass; AQE balances shard skew).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 128,
    n_shards: int = 4,
) -> DataFrame:
    """(doc_id, shard, seq_id, start_in_seq, tok_start, tok_len) —
    the span layout of each document inside the packed sequences.

    - shard = doc_id % n_shards (deterministic, engine-portable);
    - within a shard, documents concatenate in doc_id order;
    - sequence s covers shard-token offsets [s*budget, (s+1)*budget);
    - a document with token offsets [prev, prev+n) contributes one
      span per overlapped sequence: tok_start/tok_len locate the
      slice inside the document, start_in_seq its position in the
      packed sequence.  Zero-token documents emit no spans.

    Invariants (pytest-pinned): spans tile every document exactly
    (sum tok_len per doc == its token count) and every sequence is
    exactly ``budget`` tokens except each shard's last.
    """
    from pubmed_and_method_spark.functions.normalize import clean_tokens

    b = int(budget)
    toks = df.select(
        F.col(id_col),
        (F.col(id_col) % n_shards).alias("shard"),
        F.size(clean_tokens(text_col)).alias("__n"),
    ).filter(F.col("__n") > 0)
    w = W.partitionBy("shard").orderBy(id_col)
    cum = F.sum("__n").over(w)
    spans = toks.select(
        F.col(id_col),
        "shard",
        "__n",
        (cum - F.col("__n")).alias("__prev"),
        cum.alias("__cum"),
    ).select(
        F.col(id_col),
        "shard",
        "__n",
        "__prev",
        F.explode(
            F.sequence(
                F.floor(F.col("__prev") / b),
                F.floor((F.col("__cum") - 1) / b),
            )
        ).alias("seq_id"),
    )
    seq_start = F.col("seq_id") * b
    return spans.select(
        F.col(id_col),
        "shard",
        "seq_id",
        F.greatest(F.col("__prev") - seq_start, F.lit(0)).alias(
            "start_in_seq"
        ),
        F.greatest(seq_start - F.col("__prev"), F.lit(0)).alias(
            "tok_start"
        ),
        (
            F.least(F.col("__prev") + F.col("__n"), seq_start + b)
            - F.greatest(F.col("__prev"), seq_start)
        ).alias("tok_len"),
    )
