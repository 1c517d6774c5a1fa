"""End-to-end AND (author/speaker name disambiguation) pipeline.

The Spark-first rebuild of the reference DAG (SURVEY.md §3.3):

  transcripts -> signatures -> blocking -> candidate pairs ->
  pair features -> supervised scoring -> connected components ->
  clusters + evaluation

Every stage runs through StageStore (checkpoint + lineage + metrics;
the analog of the reference's ~30 eager materialized views).  All
randomness is seeded; the per-turn text invariant (stable
(conv_id, turn_idx) ordering) holds at every stage because turn
ordering is carried by sort_array over (turn_idx, ...) structs, never
by physical row order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pubmed_and_method_spark.functions.normalize import (
    clean_tokens,
    shingle_hashes_from_hash_seq,
    shingles_from_tokens,
)
from pubmed_and_method_spark.functions.strings import (
    jaro_winkler_udf,
    levenshtein_ratio,
    token_jaccard,
)
from pubmed_and_method_spark.ml.model import (
    fit_match_classifier,
    grouped_split,
    pairwise_metrics,
    predict_prob,
)
from pubmed_and_method_spark.operators.any_join import any_join
from pubmed_and_method_spark.operators.blocking import (
    block_commonness,
    generate_pairs,
)
from pubmed_and_method_spark.operators.connected_components import (
    connected_components,
)
from pubmed_and_method_spark.plans.checkpoint import StageStore

NAME_RE = r"[Ii] am agent ([a-z]+)\.? ([a-z]+)"

FEATURE_COLS = [
    "name_jw",
    "name_lev_ratio",
    "initial_eq",
    "token_jacc",
    "shingle_jacc",
    "tool_jacc",
    "time_diff_days",
    "time_overlap",
    "ambiguity_score",
]


def build_signatures(transcripts: DataFrame) -> DataFrame:
    """One row per (conv_id, role=assistant) mention.

    The analog of and.pubmed_inner_feature (one wide row per mention,
    database/pubmed_inner_outer_feature.sql:111-203).  Turn order is
    reconstructed with sort_array over (turn_idx, text) structs — the
    W3 pattern (SURVEY.md §2.5) — so the signature is independent of
    input row order (per-turn ordering invariant).
    """
    # Lean aggregation: collect ordered structs ONLY for assistant turns
    # and only (turn_idx, text); everything else is a plain aggregate
    # (min/max/count/collect_set) with map-side partial aggregation.
    # Collecting all five turn fields for every turn doubles the shuffle
    # bytes and the reduce-side allocation rate for no consumer.
    conv = transcripts.groupBy("conv_id").agg(
        F.array_sort(
            F.collect_list(
                F.when(
                    F.col("role") == "assistant", F.struct("turn_idx", "text")
                )
            )
        ).alias("aturns"),
        F.array_sort(
            F.collect_set(F.when(F.col("tool") != "", F.col("tool")))
        ).alias("tool_profile"),
        F.min("ts").alias("ts_min"),
        F.max("ts").alias("ts_max"),
        F.count("*").alias("n_turns"),
    )
    sig = conv.select(
        "conv_id",
        F.concat_ws(
            " ", F.transform(F.col("aturns"), lambda t: t["text"])
        ).alias("full_text"),
        # speaker self-identification lives in the first assistant turn
        # (the byline analog); F.get is null-safe under ANSI mode
        F.lower(F.get(F.col("aturns"), 0)["text"]).alias("__first_asst"),
        "tool_profile",
        "ts_min",
        "ts_max",
        "n_turns",
    )
    low = F.col("__first_asst")
    sig = (
        sig.withColumn(
            "given_name", F.coalesce(F.regexp_extract(low, NAME_RE, 1), F.lit(""))
        )
        .withColumn(
            "surname", F.coalesce(F.regexp_extract(low, NAME_RE, 2), F.lit(""))
        )
        .drop("__first_asst")
        .withColumn(
            "block_key",
            F.when(
                (F.col("surname") != "") & (F.col("given_name") != ""),
                F.concat_ws(
                    "_", F.col("surname"), F.substring("given_name", 1, 1)
                ),
            ).otherwise(F.lit("__unblocked__")),
        )
        .withColumn("tokens", clean_tokens("full_text"))
        .withColumn("shingle_set", shingles_from_tokens(F.col("tokens"), n=3))
        # 64-bit hashes of the token/shingle sets: the pair double-join
        # shuffles these per pair, and an array<long> is ~4x smaller than
        # the string arrays (at 10^12 turns the pair-join shuffle is the
        # dominant byte mover).  Jaccard over hashes == jaccard over
        # strings modulo 2^-64 collisions.
        .withColumn("__th_seq", F.transform("tokens", lambda t: F.xxhash64(t)))
        .withColumn("token_hashes", F.array_sort(F.array_distinct("__th_seq")))
        .withColumn(
            "shingle_hashes", shingle_hashes_from_hash_seq(F.col("__th_seq"))
        )
        .drop("__th_seq")
        .withColumn("mention_id", F.concat_ws("#", "conv_id", F.lit("assistant")))
        .withColumn("role", F.lit("assistant"))
    )
    return sig


def build_candidate_pairs(
    signatures: DataFrame,
    num_buckets: int = 1,
    max_block_size: int | None = None,
    lsh: bool = False,
    lsh_hashes: int = 16,
    lsh_bands: int = 8,
    lsh_col: str = "token_hashes",
) -> DataFrame:
    """Multi-pass blocking -> candidate pairs (canonical id1<id2).

    Pass 1: exact normalized-key blocks (J9 semantics,
    database/and_datasets.sql:56-68).  Pass 2 (``lsh=True``):
    MinHash-LSH banding over token-shingle sketches — recovers pairs
    whose mentions fall outside exact blocks (e.g. no parsable
    self-introduction), the north-star's second blocking pass.  LSH
    pairs not already produced by pass 1 are tagged
    ``block_key='__lsh__'``.

    Shingle length: unigram (``token_hashes``) by default — measured
    same-entity jaccard on multi-turn transcripts is ~0.30 for token
    sets vs ~0.016 for word-3-gram sets (turn texts are short and
    order-noisy), so 16 hashes x 8 bands (r=2) gives ~95% per-victim
    recall through any of ~4 sibling conversations while banding keeps
    the candidate volume ~6% of cross-entity pairs.  Pass
    ``lsh_col='shingle_hashes'`` for 3-gram sketches on longer texts.
    """
    members = signatures.select("block_key", "mention_id", "conv_id").filter(
        F.col("block_key") != "__unblocked__"
    )
    pairs = generate_pairs(
        members,
        key_col="block_key",
        id_col="mention_id",
        num_buckets=num_buckets,
        max_block_size=max_block_size,
        carry_cols=("conv_id",),
    )
    if lsh:
        from pubmed_and_method_spark.operators.blocking import (
            lsh_candidate_pairs,
        )

        cand2 = lsh_candidate_pairs(
            signatures.select("mention_id", lsh_col),
            id_col="mention_id",
            shingle_col=lsh_col,
            num_hashes=lsh_hashes,
            bands=lsh_bands,
            num_buckets=num_buckets,
        )
        conv_of = F.substring_index  # mention_id = conv_id#role
        lsh_pairs = (
            cand2.join(
                pairs.select("mention_id1", "mention_id2"),
                ["mention_id1", "mention_id2"],
                "left_anti",
            )
            .withColumn("block_key", F.lit("__lsh__"))
            .withColumn("conv_id1", conv_of(F.col("mention_id1"), "#", 1))
            .withColumn("conv_id2", conv_of(F.col("mention_id2"), "#", 1))
            .select("block_key", "mention_id1", "mention_id2", "conv_id1", "conv_id2")
        )
        pairs = pairs.unionByName(lsh_pairs)
    return pairs


def build_labeled_pairs(
    signatures: DataFrame,
    truth: DataFrame,
    num_buckets: int = 1,
    max_block_size: int | None = None,
    lsh: bool = False,
) -> DataFrame:
    """Multi-pass candidate pairs + planted labels.

    Labels come from joining the truth table on both sides
    (same_entity = entity_id1==entity_id2), the SONG construction
    (and_datasets.sql:44-79).
    """
    pairs = build_candidate_pairs(
        signatures,
        num_buckets=num_buckets,
        max_block_size=max_block_size,
        lsh=lsh,
    )
    t = truth.select("conv_id", "entity_id")
    pairs = (
        any_join(pairs, t.withColumnRenamed("conv_id", "conv_id1")
                 .withColumnRenamed("entity_id", "entity_id1"), "conv_id1", broadcast=True)
        .transform(
            lambda d: any_join(
                d,
                t.withColumnRenamed("conv_id", "conv_id2").withColumnRenamed(
                    "entity_id", "entity_id2"
                ),
                "conv_id2",
                broadcast=True,
            )
        )
        .withColumn(
            "same_entity",
            (F.col("entity_id1") == F.col("entity_id2")).cast("int"),
        )
    )
    return pairs


def build_pair_features(pairs: DataFrame, signatures: DataFrame) -> DataFrame:
    """The flagship pair-assembly double-join (J3):
    pair table joined against the mention-feature table twice —
    database/pubmed_inner_outer_feature.sql:672-781 — then the
    vectorized feature stack (X1-X17 analogs)."""
    feat_cols = [
        "mention_id",
        "given_name",
        "surname",
        "token_hashes",
        "shingle_hashes",
        "tool_profile",
        "ts_min",
        "ts_max",
        "block_key",
    ]
    s = signatures.select(*feat_cols)
    s1 = s.select([F.col(c).alias(f"{c}1") for c in feat_cols]).withColumnRenamed(
        "block_key1", "bk1"
    )
    s2 = s.select([F.col(c).alias(f"{c}2") for c in feat_cols]).withColumnRenamed(
        "block_key2", "bk2"
    )
    df = (
        pairs.join(s1, "mention_id1")
        .join(s2, "mention_id2")
        .drop("bk1", "bk2")
    )
    amb = block_commonness(
        signatures.filter(F.col("block_key") != "__unblocked__"), "block_key"
    )
    df = df.join(F.broadcast(amb), "block_key", "left")

    day = 86400.0
    mid1 = (F.unix_timestamp("ts_min1") + F.unix_timestamp("ts_max1")) / 2
    mid2 = (F.unix_timestamp("ts_min2") + F.unix_timestamp("ts_max2")) / 2
    overlap_start = F.greatest(F.unix_timestamp("ts_min1"), F.unix_timestamp("ts_min2"))
    overlap_end = F.least(F.unix_timestamp("ts_max1"), F.unix_timestamp("ts_max2"))

    return (
        df.withColumn(
            "name_jw",
            jaro_winkler_udf(
                F.concat_ws(" ", "given_name1", "surname1"),
                F.concat_ws(" ", "given_name2", "surname2"),
            ),
        )
        .withColumn(
            "name_lev_ratio",
            levenshtein_ratio(F.col("given_name1"), F.col("given_name2")),
        )
        .withColumn(
            "initial_eq",
            (
                F.substring("given_name1", 1, 1)
                == F.substring("given_name2", 1, 1)
            ).cast("int"),
        )
        .withColumn("token_jacc", token_jaccard("token_hashes1", "token_hashes2"))
        .withColumn(
            "shingle_jacc", token_jaccard("shingle_hashes1", "shingle_hashes2")
        )
        .withColumn("tool_jacc", token_jaccard("tool_profile1", "tool_profile2"))
        .withColumn("time_diff_days", F.abs(mid1 - mid2) / day)
        .withColumn(
            "time_overlap",
            ((overlap_end - overlap_start) > 0).cast("int"),
        )
        .withColumn("ambiguity_score", F.coalesce("ambiguity_score", F.lit(0.0)))
    )


def run_pipeline(
    spark: SparkSession,
    store: StageStore,
    seed: int = 42,
    algo: str = "gbt",
    num_buckets: int = 4,
    cluster_threshold: float = 0.85,
    lsh: bool = True,
    datagen_kwargs: dict | None = None,
) -> dict:
    """Full AND pipeline on the synthetic corpus; returns metrics."""
    from pubmed_and_method_spark.sources.datagen import transcripts_df

    transcripts, truth = transcripts_df(spark, seed=seed, **(datagen_kwargs or {}))
    transcripts = store.run_stage(
        "transcripts", lambda: transcripts, params={"seed": seed}
    )
    truth = store.run_stage("entities_truth", lambda: truth, params={"seed": seed})

    signatures = store.run_stage(
        "signatures",
        lambda: build_signatures(transcripts),
        inputs=("transcripts",),
        params={"seed": seed},
    )
    pairs = store.run_stage(
        "labeled_pairs",
        lambda: build_labeled_pairs(
            signatures, truth, num_buckets=num_buckets, lsh=lsh
        ),
        inputs=("signatures", "entities_truth"),
        params={"num_buckets": num_buckets, "lsh": lsh},
    )
    features = store.run_stage(
        "pair_features",
        lambda: build_pair_features(pairs, signatures),
        inputs=("labeled_pairs", "signatures"),
        params={},
    )

    split = grouped_split(features, "block_key", train_pct=70, salt=seed)
    train = split.filter(F.col("is_train") == 1)
    test = split.filter(F.col("is_train") == 0)
    model = fit_match_classifier(train, FEATURE_COLS, algo=algo, seed=seed)
    scored_test = predict_prob(model, test)
    metrics = pairwise_metrics(scored_test)

    scored_all = store.run_stage(
        "scored_pairs",
        lambda: predict_prob(model, split).select(
            "block_key",
            "mention_id1",
            "mention_id2",
            "same_entity",
            "is_train",
            "pred_prob",
            "pred",
        ),
        inputs=("pair_features",),
        params={"algo": algo, "seed": seed},
    )

    # clustering uses a stricter edge bar than the 0.5 pair threshold:
    # transitive closure amplifies every FP edge into a full cluster
    # merge (precision collapse), while missing edges are recovered via
    # paths, so recall is cheap.  0.85 measured optimal on the
    # synthetic corpus (1.0/1.0 at 0.8-0.9).
    matched = scored_all.filter(F.col("pred_prob") > cluster_threshold)
    components = store.run_stage(
        "clusters",
        lambda: connected_components(
            matched, u_col="mention_id1", v_col="mention_id2"
        ),
        inputs=("scored_pairs",),
        params={"cluster_threshold": cluster_threshold},
    )

    # cluster-level pairwise agreement vs truth (within candidate pairs)
    cc = components.select(
        F.col("id").alias("mention_id"), "component"
    )
    with_cc = (
        scored_all.join(
            cc.withColumnRenamed("mention_id", "mention_id1").withColumnRenamed(
                "component", "component1"
            ),
            "mention_id1",
            "left",
        )
        .join(
            cc.withColumnRenamed("mention_id", "mention_id2").withColumnRenamed(
                "component", "component2"
            ),
            "mention_id2",
            "left",
        )
        .withColumn(
            "cluster_pred",
            (
                F.col("component1").isNotNull()
                & (F.col("component1") == F.col("component2"))
            ).cast("int"),
        )
    )
    cluster_metrics = pairwise_metrics(with_cc, pred_col="cluster_pred")

    return {
        "pair_model": metrics,
        "clusters": cluster_metrics,
        "n_mentions": signatures.count(),
        "n_pairs": pairs.count(),
    }
