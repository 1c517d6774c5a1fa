"""Distributed deterministic transcript synthesis — the scale path.

The pandas generator (datagen.py) builds the corpus on the driver;
fine for unit tests, impossible at 10^12 turns.  This variant derives
every attribute as a pure function of (ids, seed) with xxhash64-based
pseudo-randomness, starting from ``spark.range`` — so generation is
embarrassingly parallel, deterministic at any partition count, and
never touches the driver.

Same schema and statistical shape as datagen.generate_transcripts:
planted entities sharing block keys (hot block 0), entity-specific
vocabulary cores / tool profiles / time epochs, a self-introduction
on the first assistant turn.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from pubmed_and_method_spark.sources.datagen import (
    _GIVEN_STEMS,
    _SURNAMES,
    _TOOLS,
    _VOCAB,
)


def _h(*cols, seed: int) -> F.Column:
    """Deterministic non-negative pseudo-random long."""
    return F.abs(F.xxhash64(F.lit(seed), *cols))


def distributed_transcripts(
    spark: SparkSession,
    n_entities: int = 1000,
    n_blocks: int = 500,
    seed: int = 42,
    hot_block_entities: int = 8,
    convs_rng: tuple[int, int] = (2, 8),
    turns_rng: tuple[int, int] = (3, 30),
    partitions: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Return (transcripts, entities_truth) DataFrames, fully lazy."""
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism

    ent = spark.range(0, n_entities, numPartitions=partitions).select(
        F.col("id").alias("e")
    )
    block = F.when(
        F.col("e") < hot_block_entities, F.lit(0)
    ).otherwise(1 + F.pmod(_h(F.col("e"), F.lit("blk"), seed=seed), F.lit(n_blocks - 1)))
    ent = ent.withColumn("block", block.cast("int"))
    # Surname = stem + 4-letter base-26 suffix of the block number so the
    # block-key space GROWS with n_blocks (distinct key per block; pair
    # volume stays linear in input).  A fixed stem list alone saturates
    # at len(_SURNAMES) x 26 keys, which makes block sizes — and the
    # within-block pair count — grow quadratically with n_entities.
    # Letters only: the planted self-intro must stay extractable by the
    # signature stage's name regex ([a-z]+ groups).
    suffix = F.concat(
        *[
            F.chr(
                F.lit(97)
                + F.pmod(F.floor(F.col("block") / F.lit(26**k)), F.lit(26))
            )
            for k in (3, 2, 1, 0)
        ]
    )
    surname = F.concat(
        F.element_at(
            F.array(*[F.lit(s) for s in _SURNAMES]),
            (F.pmod(F.col("block"), F.lit(len(_SURNAMES))) + 1).cast("int"),
        ),
        suffix,
    )
    initial = F.chr(F.lit(97) + F.pmod(F.col("block"), F.lit(26)))
    # distinct given-name stem per entity within its block
    stem_i = F.row_number().over(W.partitionBy("block").orderBy("e")) - 1
    stem = F.element_at(
        F.array(*[F.lit(s) for s in _GIVEN_STEMS]),
        (F.pmod(stem_i, F.lit(len(_GIVEN_STEMS))) + 1).cast("int"),
    )
    ent = (
        ent.withColumn("surname", surname)
        .withColumn("initial", initial)
        .withColumn("given", F.concat(initial, stem))
        .withColumn("block_key", F.concat_ws("_", "surname", "initial"))
        .withColumn(
            "entity_id", F.format_string("E%04d", F.col("e").cast("int"))
        )
        .withColumn(
            "epoch_day", F.pmod(_h(F.col("e"), F.lit("epoch"), seed=seed), F.lit(365))
        )
        .withColumn(
            "n_convs",
            (
                convs_rng[0]
                + F.pmod(
                    _h(F.col("e"), F.lit("nc"), seed=seed),
                    F.lit(convs_rng[1] - convs_rng[0] + 1),
                )
            ).cast("int"),
        )
        # restore generation parallelism: the stem_i window's shuffle
        # is byte-tiny (one row per entity), so AQE coalesces it to ONE
        # partition and the whole conv/turn explode + per-word text
        # synthesis downstream runs serially (measured: 102 s single
        # task for 8.3M turns at local[32]).  Row placement only —
        # every attribute is a pure function of (ids, seed).
        .repartition(partitions)
    )

    conv = ent.withColumn(
        "c", F.explode(F.sequence(F.lit(0), F.col("n_convs") - 1))
    ).withColumn(
        "conv_id", F.format_string("c%05d_%02d", F.col("e").cast("int"), F.col("c").cast("int"))
    )

    truth = conv.select(
        "entity_id", "conv_id", F.lit("assistant").alias("role"), "block_key"
    )

    n_turn_span = turns_rng[1] - turns_rng[0] + 1
    conv = conv.withColumn(
        "n_turns",
        (
            turns_rng[0]
            + F.pmod(_h(F.col("conv_id"), F.lit("nt"), seed=seed), F.lit(n_turn_span))
        ).cast("int"),
    ).withColumn(
        "t0_sec",
        (
            F.col("epoch_day") * 86400
            + F.pmod(_h(F.col("conv_id"), F.lit("t0"), seed=seed), F.lit(86400))
        ).cast("long"),
    )

    turns = conv.withColumn(
        "turn_idx", F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1))
    )
    role = F.when(
        F.pmod(F.col("turn_idx"), F.lit(7)) == 6, F.lit("tool")
    ).otherwise(
        F.when(F.pmod(F.col("turn_idx"), F.lit(2)) == 0, F.lit("user")).otherwise(
            F.lit("assistant")
        )
    )

    vocab_arr = F.array(*[F.lit(w) for w in _VOCAB])
    nv = len(_VOCAB)

    # text: 4-11 words; 70% from the entity's 10-word core.
    k_words = 4 + F.pmod(_h(F.col("conv_id"), F.col("turn_idx"), F.lit("k"), seed=seed), F.lit(8))
    slot = F.sequence(F.lit(0), k_words - 1)

    # Word identities live in a LARGE hash space (stem list x 26^2
    # letter suffixes x id-space), not the bare 250-stem list: with a
    # shared 250-word vocabulary every pair of documents has jaccard
    # ~0.09 and LSH banding degenerates to near-all-pairs — unlike any
    # real corpus, where cross-document token overlap is ~0.  Core
    # word ids are functions of (entity, core slot), so same-entity
    # conversations still overlap (~0.3 jaccard) while cross-entity
    # overlap is negligible.
    def _surface(wid):
        stem = F.element_at(vocab_arr, (F.pmod(wid, F.lit(nv)) + 1).cast("int"))
        s1 = F.chr(F.lit(97) + F.pmod(F.floor(wid / F.lit(nv)), F.lit(26)))
        s2 = F.chr(F.lit(97) + F.pmod(F.floor(wid / F.lit(nv * 26)), F.lit(26)))
        return F.concat(stem, s1, s2)

    def word_for(i):
        use_core = (
            F.pmod(_h(F.col("conv_id"), F.col("turn_idx"), i, F.lit("uc"), seed=seed), F.lit(10))
            < 7
        )
        core_slot = F.pmod(
            _h(F.col("conv_id"), F.col("turn_idx"), i, F.lit("cs"), seed=seed), F.lit(10)
        )
        core_wid = F.pmod(
            _h(F.col("e"), core_slot, F.lit("core"), seed=seed), F.lit(10_000_000)
        )
        any_wid = F.pmod(
            _h(F.col("conv_id"), F.col("turn_idx"), i, F.lit("aw"), seed=seed),
            F.lit(10_000_000),
        )
        wid = F.when(use_core, core_wid).otherwise(any_wid)
        return _surface(wid)

    body = F.array_join(F.transform(slot, word_for), " ")
    punct = F.when(
        F.pmod(_h(F.col("conv_id"), F.col("turn_idx"), F.lit("p"), seed=seed), F.lit(2)) == 0,
        F.lit("."),
    ).otherwise(F.lit("!"))
    text = F.concat(body, punct)
    # planted self-introduction on the first assistant turn (t==1);
    # ~20% of conversations abbreviate the given name to its initial.
    shown = F.when(
        F.pmod(_h(F.col("conv_id"), F.lit("abbr"), seed=seed), F.lit(10)) < 8,
        F.col("given"),
    ).otherwise(F.substring("given", 1, 1))
    text = F.when(
        (F.col("turn_idx") == 1),
        F.concat(
            F.lit("Hello, I am agent "), shown, F.lit(" "), F.col("surname"),
            F.lit(". "), text,
        ),
    ).otherwise(text)

    tool_arr = F.array(*[F.lit(t) for t in _TOOLS if t])
    tool_pref = F.pmod(
        _h(F.col("e"), F.pmod(_h(F.col("conv_id"), F.col("turn_idx"), F.lit("tp"), seed=seed), F.lit(3)), F.lit("tools"), seed=seed),
        F.lit(len(_TOOLS) - 1),
    )
    use_tool = (
        (role != "user")
        & (F.pmod(_h(F.col("conv_id"), F.col("turn_idx"), F.lit("ut"), seed=seed), F.lit(10)) < 6)
    )
    tool = F.when(use_tool, F.element_at(tool_arr, (tool_pref + 1).cast("int"))).otherwise(
        F.lit("")
    )

    base = F.lit("2024-01-01 00:00:00").cast("timestamp")
    ts = F.timestamp_seconds(
        F.unix_timestamp(base)
        + F.col("t0_sec")
        + F.col("turn_idx") * 90
        + F.pmod(_h(F.col("conv_id"), F.col("turn_idx"), F.lit("js"), seed=seed), F.lit(60))
    )

    transcripts = turns.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )
    return transcripts, truth
