"""Deterministic synthetic transcript corpus with planted entities.

The analog of the reference's gold-standard corpora (SONG:
resources/gold_standard_dataset/song/and_corpus.txt, DDL
database/and_datasets.sql:8-14): a seeded generator that emits

- ``transcripts``  (conv_id, turn_idx, role, text, tool, ts)  — the
  BASELINE.json input_hint schema, verbatim;
- ``entities_truth`` (entity_id, conv_id, role, block_key) — planted
  ground truth, several entities per block key so the task is
  non-trivial (SONG: 385 authors across 36 lastname groups,
  database/and_datasets.sql:16-26);
- hot blocks (many entities sharing one key) to exercise the skew
  path (analog of >1000-member namespaces, reference README.md:3).

Everything is numpy-seeded — two runs with the same seed are
byte-identical (fixes the reference's unseeded rand()/now64() sites,
database/and_datasets.sql:130, pubmed_inner_outer_feature.sql:819).
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

TRUTH_SCHEMA = T.StructType(
    [
        T.StructField("entity_id", T.StringType(), False),
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("block_key", T.StringType(), False),
    ]
)

_SURNAMES = [
    "smith", "lee", "wang", "garcia", "kim", "mueller", "ivanov", "sato",
    "chen", "brown", "davis", "lopez", "nguyen", "cohen", "silva", "patel",
    "rossi", "novak", "jensen", "olsen",
]
_TOOLS = [
    "search", "calculator", "code_exec", "browser", "file_read", "sql",
    "translate", "summarize", "",
]

# Given-name stems per initial letter — entities in the same block share
# surname + first initial (the reference's ns = lastname_firstinitial,
# database/model_building_using_rich_features.sql:438-444) but carry
# distinct full given names, so name-similarity features are informative.
_GIVEN_STEMS = [
    "ndrea", "lex", "nton", "melia", "rturo", "lan", "bigail", "dam",
    "urora", "lbert", "rchie", "gnes",
]
_VOCAB = [
    "model", "train", "query", "table", "join", "cluster", "vector",
    "token", "batch", "shuffle", "metric", "label", "feature", "score",
    "graph", "node", "edge", "block", "index", "cache", "stream", "window",
    "filter", "sample", "entity", "record", "linkage", "pair", "match",
    "spark", "parquet", "schema", "column", "partition", "hash", "sketch",
    "corpus", "author", "paper", "journal", "topic", "embed", "cosine",
    "recall", "precision", "gradient", "forest", "boost", "learn", "deploy",
]
# widen the vocabulary with deterministic compounds so entity cores
# rarely collide (50 base words -> 50 + 200 compounds)
_VOCAB = _VOCAB + [
    _VOCAB[i] + _VOCAB[(i * 7 + j * 13 + 3) % 50] for j in range(4) for i in range(50)
]


def generate_transcripts(
    n_entities: int = 40,
    n_blocks: int = 18,
    seed: int = 42,
    convs_per_entity: tuple[int, int] = (2, 8),
    turns_per_conv: tuple[int, int] = (3, 30),
    hot_block_entities: int = 8,
    long_conv: bool = True,
    hardness: float = 0.0,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Return (transcripts_pdf, entities_truth_pdf) as pandas frames.

    Entities in the same block share a normalized key; same-entity
    conversations share a vocabulary core + tool profile + time window
    so the downstream feature stack separates them from different
    entities in the same block.

    ``hardness`` (0..1, default 0) plants the confusions real AND
    corpora have (the reference's hardest SONG cases: homonymous
    full names, byline variants, shared journals/affiliations,
    src/comparison/result.txt name-only collapse):

    - homonyms: later same-block entities reuse an earlier entity's
      FULL given name with prob ``0.35*hardness`` — name features
      become actively deceptive for those pairs;
    - self-intro dropout/typo: the introduction turn is omitted with
      prob ``0.3*hardness`` or carries a surname char-swap typo with
      prob ``0.2*hardness`` (byline-noise analog);
    - shared evidence: entity cores draw from a small per-block word
      pool, tools from a per-block tool triple, and epochs cluster
      around a per-block day — content/tool/time overlap between
      same-block entities scales with hardness.

    The hardness=0 path consumes the SAME rng stream as before the
    knob existed: the seed-42 default corpus (q26/q27/q44 oracle
    input) is byte-identical.
    """
    rng = np.random.default_rng(seed)
    base_ts = dt.datetime(2024, 1, 1)

    # block 0 is the planted hot block (skew analog).
    block_of_entity: list[int] = []
    for e in range(n_entities):
        if e < hot_block_entities:
            block_of_entity.append(0)
        else:
            block_of_entity.append(1 + int(rng.integers(0, n_blocks - 1)))

    # hard mode: per-block shared pools, drawn from a SEPARATE rng so
    # the main stream (and thus the hardness=0 corpus) is untouched.
    block_pool: dict[int, np.ndarray] = {}
    block_tools: dict[int, np.ndarray] = {}
    block_day: dict[int, int] = {}
    if hardness > 0.0:
        hrng = np.random.default_rng(seed + 0x9E3779B9)
        pool_sz = max(12, int(24 - 10 * hardness))
        for b in range(n_blocks):
            block_pool[b] = hrng.choice(len(_VOCAB), size=pool_sz, replace=False)
            block_tools[b] = hrng.choice(len(_TOOLS), size=5, replace=False)
            block_day[b] = int(hrng.integers(0, 365))

    truth_rows = []
    turn_rows = []
    conv_counter = 0
    # distinct given-name stem per entity within a block
    stem_cursor: dict[int, int] = {}
    first_given: dict[int, str] = {}
    for e in range(n_entities):
        entity_id = f"E{e:04d}"
        block = block_of_entity[e]
        surname = _SURNAMES[block % len(_SURNAMES)]
        initial = chr(ord("a") + block % 26)
        block_key = f"{surname}_{initial}"
        stem_i = stem_cursor.get(block, 0)
        stem_cursor[block] = stem_i + 1
        given = initial + _GIVEN_STEMS[stem_i % len(_GIVEN_STEMS)]
        if hardness > 0.0:
            if stem_i == 0:
                first_given[block] = given
            elif rng.random() < 0.35 * hardness:
                given = first_given[block]  # planted homonym
        # entity-specific core vocabulary + tool preferences + epoch
        if hardness > 0.0:
            core = block_pool[block][
                rng.choice(len(block_pool[block]), size=10, replace=False)
            ]
            tools = block_tools[block][rng.choice(5, size=3, replace=False)]
            epoch_day = block_day[block] + int(
                rng.integers(-10, 11) * (1.0 - 0.5 * hardness)
            )
        else:
            core = rng.choice(len(_VOCAB), size=10, replace=False)
            tools = rng.choice(len(_TOOLS), size=3, replace=False)
            epoch_day = int(rng.integers(0, 365))
        n_convs = int(rng.integers(convs_per_entity[0], convs_per_entity[1] + 1))
        for c in range(n_convs):
            conv_id = f"c{conv_counter:05d}"
            conv_counter += 1
            truth_rows.append((entity_id, conv_id, "assistant", block_key))
            n_turns = int(rng.integers(turns_per_conv[0], turns_per_conv[1] + 1))
            if long_conv and e == 0 and c == 0:
                n_turns = 60  # >50-turn cap analog (link_pubmed...sql:342-343)
            day = epoch_day + int(rng.integers(-15, 16))
            t0 = base_ts + dt.timedelta(days=day, minutes=int(rng.integers(0, 1440)))
            for t in range(n_turns):
                role = ["user", "assistant", "tool"][
                    t % 2 if t % 7 != 6 else 2
                ]
                # text: mostly entity-core words, some global noise
                k = int(rng.integers(4, 12))
                use_core = rng.random(k) < 0.7
                words = [
                    _VOCAB[core[int(rng.integers(0, len(core)))]]
                    if uc
                    else _VOCAB[int(rng.integers(0, len(_VOCAB)))]
                    for uc in use_core
                ]
                # mixed case + punctuation + occasional unicode to
                # exercise normalization (N1/F3)
                if rng.random() < 0.3:
                    words[0] = words[0].capitalize()
                text = " ".join(words) + ("." if rng.random() < 0.5 else "!")
                if rng.random() < 0.05:
                    text += " café"
                if role == "assistant" and t == 1:
                    # planted self-introduction: the analog of the author
                    # name string on a paper byline.  Sometimes the given
                    # name is abbreviated to its initial (name-variant
                    # noise, author_name_enhancement.sql:85-120).
                    shown = given if rng.random() < 0.8 else given[0]
                    shown_sur = surname
                    intro = True
                    if hardness > 0.0:
                        if rng.random() < 0.3 * hardness:
                            intro = False  # byline missing entirely
                        elif rng.random() < 0.2 * hardness and len(surname) > 3:
                            i = 1 + int(rng.integers(0, len(surname) - 2))
                            shown_sur = (  # char-swap typo
                                surname[:i]
                                + surname[i + 1]
                                + surname[i]
                                + surname[i + 2:]
                            )
                    if intro:
                        text = f"Hello, I am agent {shown} {shown_sur}. " + text
                tool = (
                    _TOOLS[tools[int(rng.integers(0, len(tools)))]]
                    if role != "user" and rng.random() < 0.6
                    else ""
                )
                ts = t0 + dt.timedelta(seconds=int(t) * 90 + int(rng.integers(0, 60)))
                turn_rows.append((conv_id, t, role, text, tool, ts))

    transcripts = pd.DataFrame(
        turn_rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    transcripts["turn_idx"] = transcripts["turn_idx"].astype("int32")
    truth = pd.DataFrame(
        truth_rows, columns=["entity_id", "conv_id", "role", "block_key"]
    )
    return transcripts, truth


def transcripts_df(
    spark: SparkSession, seed: int = 42, **kwargs
) -> tuple[DataFrame, DataFrame]:
    """Spark DataFrames for (transcripts, entities_truth)."""
    t, g = generate_transcripts(seed=seed, **kwargs)
    return (
        spark.createDataFrame(t, schema=TRANSCRIPT_SCHEMA),
        spark.createDataFrame(g, schema=TRUTH_SCHEMA),
    )


def clustered_embeddings_df(
    spark: SparkSession,
    n_entities: int = 40,
    per_entity: int = 6,
    dim: int = 64,
    noise: float = 0.15,
    seed: int = 7,
) -> DataFrame:
    """(vec_id, entity, embedding) — the ER-shaped ANN eval corpus.

    Each entity is a Gaussian centroid; members are the centroid plus
    ``noise``-scaled Gaussian perturbations (expected sibling cosine
    ≈ 1/(1+noise²), ~0.978 at 0.15).  True top-k neighbors of a member
    are its siblings — the structure an entity-resolution embedding
    space actually has, unlike the driver's i.i.d. random vectors whose
    nearest neighbors are near-orthogonal (cos ~0.4) and therefore
    unrecoverable by ANY sub-exhaustive index.  Used by the
    ``topk_recall`` harness and its pytest gate.
    """
    rng = np.random.default_rng(seed)
    centroids = rng.standard_normal((n_entities, dim))
    rows = []
    for e in range(n_entities):
        for m in range(per_entity):
            v = centroids[e] + noise * rng.standard_normal(dim)
            rows.append(
                (e * per_entity + m, e, [float(x) for x in v])
            )
    return spark.createDataFrame(
        rows, "vec_id long, entity int, embedding array<float>"
    )
