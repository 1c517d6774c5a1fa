"""Meta-blocking: restructure a redundancy-positive block collection
into a pruned pair graph (Papadakis et al., TKDE 2013).

Schema-agnostic blocking (every token of every attribute is a block
key) trades precision for recall: a true pair almost always shares
SOME block, but so do mountains of coincidental pairs.  Meta-blocking
recovers precision WITHOUT touching recall-critical key design: the
number of blocks two records share is itself match evidence, so weigh
each candidate pair by block overlap and prune the weak edges.

The reference has one hand-designed key per pass
(database/model_building_using_rich_features.sql:438-444) and no
notion of redundancy; this operator is the standard scale move for
the schema-agnostic regime (JedAI / Papadakis et al.), built from
three linear DataFrame passes:

1. pair materialization per block — ``generate_pairs`` (inherits
   triangle-split / adaptive salting: a hot token block never lands
   in one task);
2. ONE (id1, id2) groupBy: CBS = count of shared blocks (map-side
   partial agg folds the per-block duplicates before the shuffle);
3. per-record block counts joined to derive Jaccard weights, then
   per-node mean thresholds from ONE exploded-endpoint groupBy.

All weights are exact integer ratios evaluated in double (cbs,
block-count sums and edge counts are ints), so cross-engine value
parity holds without rounding tricks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pubmed_and_method_spark.operators.blocking import generate_pairs


def pair_block_weights(
    members: DataFrame,
    key_col: str = "block_key",
    id_col: str = "mention_id",
    max_block_size: int | None = None,
    adaptive_target: int | None = None,
) -> DataFrame:
    """Weighted pair graph of a (possibly purged) block collection.

    ``members``: one row per (record, block) membership.  Oversized
    blocks are purged FIRST (block purging — the stop-word analog:
    a token shared by half the corpus carries no evidence and would
    dominate the pair volume); purging happens before pairing, so the
    cost of a degenerate block is one broadcast lookup, never its
    quadratic pair set.  Per-record block counts (for the Jaccard
    weight) are computed on the SAME purged collection, keeping
    weights consistent.

    Output: (id1, id2, cbs, nb1, nb2, js) — CBS (common-blocks) and
    Jaccard ``cbs / (nb1 + nb2 - cbs)`` weights, one row per
    candidate pair.
    """
    m = members.select(key_col, id_col).distinct()
    if max_block_size is not None:
        # broadcast only the OVERSIZED blocks (few, by construction)
        # and anti-join — never the keep-set, which is ~every block
        oversized = (
            m.groupBy(key_col)
            .agg(F.count("*").alias("__bs"))
            .filter(F.col("__bs") > max_block_size)
            .select(key_col)
        )
        m = m.join(F.broadcast(oversized), key_col, "left_anti")

    per_block = generate_pairs(
        m, key_col=key_col, id_col=id_col, adaptive_target=adaptive_target
    )
    cbs = per_block.groupBy(f"{id_col}1", f"{id_col}2").agg(
        F.count("*").alias("cbs")
    )
    nb = m.groupBy(id_col).agg(F.count("*").alias("__nb"))
    return (
        cbs.join(
            nb.select(
                F.col(id_col).alias(f"{id_col}1"), F.col("__nb").alias("nb1")
            ),
            f"{id_col}1",
        )
        .join(
            nb.select(
                F.col(id_col).alias(f"{id_col}2"), F.col("__nb").alias("nb2")
            ),
            f"{id_col}2",
        )
        .withColumn(
            "js",
            (
                F.col("cbs")
                / (F.col("nb1") + F.col("nb2") - F.col("cbs"))
            ).cast("double"),
        )
    )


def block_filtering(
    members: DataFrame,
    key_col: str = "block_key",
    id_col: str = "mention_id",
    keep_num: int = 4,
    keep_den: int = 5,
) -> DataFrame:
    """Block filtering (Papadakis et al., PVLDB 2016): each record
    keeps only its ``keep_num/keep_den`` SMALLEST blocks (default
    4/5), because a record's small blocks are its most selective
    evidence — the big ones re-pair it with everything.  The
    complementary lever to block purging: purging removes globally
    degenerate blocks, filtering trims each record's own membership
    list, shrinking pair volume roughly quadratically in the dropped
    memberships while true pairs (which share SELECTIVE keys) survive.

    The keep rule is evaluated in INTEGER arithmetic —
    ``keep_den * (rank-1) < keep_num * nb``, i.e. rank <= ceil(r*nb)
    without the float ceil (0.8*15 is already not exact in binary) —
    so cross-engine value parity is exact.  Rank orders by
    (block_size, key): fully deterministic under ties.

    One block-size aggregation + one hash join (the size table is
    corpus-scale at schema-agnostic key density — never broadcast)
    + one per-record window (records own few memberships; the window
    partitions by id, so no skew beyond a record's own key count).
    Appends ``kept`` rather than filtering, so callers can audit what
    was dropped (the WNP convention).

    Output: (id, key, block_size, nb, rnk, kept) — one row per
    distinct membership.
    """
    from pyspark.sql import Window

    m = members.select(id_col, key_col).distinct()
    bs = m.groupBy(key_col).agg(F.count("*").alias("block_size"))
    ranked = (
        m.join(bs, key_col)
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy("block_size", key_col)
            ),
        )
        .withColumn(
            "nb", F.count("*").over(Window.partitionBy(id_col))
        )
    )
    return ranked.select(
        id_col,
        key_col,
        "block_size",
        "nb",
        "rnk",
        (
            F.lit(keep_den) * (F.col("rnk") - 1)
            < F.lit(keep_num) * F.col("nb")
        )
        .cast("int")
        .alias("kept"),
    )


def weighted_node_pruning(
    weights: DataFrame,
    id_col: str = "mention_id",
    weight_col: str = "cbs",
) -> DataFrame:
    """WNP: keep an edge iff its weight reaches the MEAN incident
    weight of either endpoint (the redefined node-centric pruning of
    Papadakis et al. — local thresholds adapt to each record's own
    evidence level, where one global cut misclassifies records whose
    every weight is low).

    Node thresholds come from ONE pass: explode each edge to its two
    endpoints, groupBy node, avg (integer sum / integer count — exact
    in double, so the >= comparison is engine-stable).  Appends
    ``thr1``/``thr2``/``kept`` rather than filtering, so callers can
    audit what pruning discarded.
    """
    ends = weights.select(
        F.explode(
            F.array(F.col(f"{id_col}1"), F.col(f"{id_col}2"))
        ).alias(id_col),
        F.col(weight_col).alias("__w"),
    )
    thr = ends.groupBy(id_col).agg(F.avg("__w").alias("__thr"))
    # per-record table: one row per node — hash joins, NEVER broadcast
    # (at 10^12 records the threshold table is corpus-sized)
    return (
        weights.join(
            thr.select(
                F.col(id_col).alias(f"{id_col}1"),
                F.col("__thr").alias("thr1"),
            ),
            f"{id_col}1",
        )
        .join(
            thr.select(
                F.col(id_col).alias(f"{id_col}2"),
                F.col("__thr").alias("thr2"),
            ),
            f"{id_col}2",
        )
        .withColumn(
            "kept",
            (
                (F.col(weight_col) >= F.col("thr1"))
                | (F.col(weight_col) >= F.col("thr2"))
            ).cast("int"),
        )
    )
