"""Blocking-quality metrics: pair completeness, reduction ratio,
block-size stats — one row of evaluation for a candidate-generation
pass.

The reference evaluates its pair generator only implicitly (dual
derivations of the same pair set, database/and_datasets.sql:81-105,
plus block-count statistics, database/statistics.sql:96-245); the
record-linkage literature's standard blocking metrics make the two
quantities that actually govern an ER system explicit:

- pair completeness (blocking recall): the fraction of TRUE pairs
  that survive blocking — the hard ceiling on end-to-end recall; no
  classifier can recover a pair blocking never generated.
- reduction ratio: 1 - |candidates| / (n choose 2) — how much of the
  quadratic comparison space blocking eliminated; the cost axis.

At 10^12 turns both sides stay linear: true pairs are COUNTED from
per-entity member counts (sum m*(m-1)/2 — never materialized), and
candidate stats aggregate the already-blocked pair set.  Block-size
max/avg come from one groupBy on the signature table and are the
hot-block early-warning (a max_block_size of 10^6 means a 5*10^11-
comparison block is coming).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

METRIC_COLS = [
    "n_mentions",
    "n_entities",
    "n_true_pairs",
    "n_blocks",
    "n_blocked_mentions",
    "max_block_size",
    "avg_block_size",
    "n_candidates",
    "n_matched_true",
    "pair_completeness",
    "reduction_ratio",
]


def cluster_size_stats(
    components: DataFrame,
    component_col: str = "component",
) -> DataFrame:
    """Cluster-size distribution: one row per size —
    (cluster_size, n_clusters, n_members, member_share).

    The reference publishes exactly these distribution tables for its
    own groupings (database/statistics.sql:96-266: per-field counts
    pivoted into named distribution rows); here they describe the
    OUTPUT of clustering, where the size histogram is the first thing
    an operator inspects (a sudden giant component means an FP edge
    bridged two entities — transitive closure turns one bad edge into
    a mega-cluster).  Two linear groupBys; the share denominator rides
    a broadcast 1-row total.
    """
    dist = (
        components.groupBy(component_col)
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .withColumn(
            "n_members", F.col("cluster_size") * F.col("n_clusters")
        )
    )
    total = dist.agg(
        F.coalesce(F.sum("n_members"), F.lit(0)).alias("__t")
    )
    return (
        dist.crossJoin(F.broadcast(total))
        .select(
            "cluster_size",
            "n_clusters",
            "n_members",
            F.when(
                F.col("__t") > 0,
                F.round(F.col("n_members") / F.col("__t"), 6),
            ).alias("member_share"),
        )
        .orderBy("cluster_size")
    )


def blocking_quality(
    signatures: DataFrame,
    labeled_pairs: DataFrame,
    truth: DataFrame,
    unblocked_key: str = "__unblocked__",
) -> DataFrame:
    """One-row blocking evaluation.

    ``signatures``: one row per mention with ``block_key`` (the
    ``unblocked_key`` sentinel marks mentions no exact block covers).
    ``labeled_pairs``: the candidate pairs WITH planted labels
    (``same_entity`` 0/1, as built by ``plans.pipeline
    .build_labeled_pairs``).  ``truth``: (conv_id, entity_id) gold.

    Every aggregate is a distributed groupBy/agg; the four one-row
    summaries are cross-joined at the end (literally free).
    """
    sig_agg = signatures.agg(F.count(F.lit(1)).alias("n_mentions"))
    block_agg = (
        signatures.filter(F.col("block_key") != unblocked_key)
        .groupBy("block_key")
        .agg(F.count(F.lit(1)).alias("sz"))
        .agg(
            F.count(F.lit(1)).alias("n_blocks"),
            F.coalesce(F.sum("sz"), F.lit(0)).alias("n_blocked_mentions"),
            F.coalesce(F.max("sz"), F.lit(0)).alias("max_block_size"),
            F.round(F.coalesce(F.avg("sz"), F.lit(0.0)), 6).alias(
                "avg_block_size"
            ),
        )
    )
    truth_agg = (
        truth.groupBy("entity_id")
        .agg(F.count(F.lit(1)).alias("m"))
        .agg(
            F.count(F.lit(1)).alias("n_entities"),
            F.coalesce(
                F.sum(F.col("m") * (F.col("m") - F.lit(1))), F.lit(0)
            ).alias("tp2"),
        )
        # integer `div`, not float /: exact past 2^53 true pairs
        .select("n_entities", F.expr("tp2 div 2").alias("n_true_pairs"))
    )
    pair_agg = labeled_pairs.agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.coalesce(F.sum("same_entity"), F.lit(0))
        .cast("long")
        .alias("n_matched_true"),
    )
    row = sig_agg.crossJoin(block_agg).crossJoin(truth_agg).crossJoin(pair_agg)
    total_pairs = (
        F.col("n_mentions") * (F.col("n_mentions") - F.lit(1)) / F.lit(2)
    )
    return row.select(
        "n_mentions",
        "n_entities",
        "n_true_pairs",
        "n_blocks",
        "n_blocked_mentions",
        "max_block_size",
        "avg_block_size",
        "n_candidates",
        "n_matched_true",
        F.when(
            F.col("n_true_pairs") > 0,
            F.round(F.col("n_matched_true") / F.col("n_true_pairs"), 6),
        ).alias("pair_completeness"),
        F.when(
            F.col("n_mentions") > 1,
            F.round(F.lit(1.0) - F.col("n_candidates") / total_pairs, 6),
        ).alias("reduction_ratio"),
    )
