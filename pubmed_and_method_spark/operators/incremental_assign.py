"""Incremental cluster assignment: fold a batch of NEW records into an
EXISTING clustering without re-resolving the whole corpus.

The batch analog of the streaming pair frontier
(streaming/incremental.py): when a resolved corpus (the reference's
full-corpus weld, database/and_datasets.sql:56-68) receives new
mentions, re-clustering 10^12 turns for a 10^6-turn delta is the wrong
plan.  Standard record-at-a-time incremental ER instead assigns each
new record independently: block against the existing members, score,
take the best cluster when it clears a threshold, else open a new
singleton cluster.  (Merges BETWEEN new records are deliberately out
of scope — that is the full clusterer's job on the next compaction;
this operator's contract is that existing cluster ids are stable.)

Rule (deterministic):

1. Candidates = new x catalog members sharing ``block_col``, both
   sides with non-empty token sets.
2. Score = token Jaccard, kept as INTEGER (intersection, union)
   counts; the best candidate per new record is the minimum of
   ``struct(-inter/union, cluster, member)`` — IEEE double division
   is exactly rounded so the ratio ordering is engine-stable, and the
   (cluster, member) tail makes ties deterministic.
3. Assign to the best cluster when ``den * inter >= num * union``
   (integer threshold, the q88/q92 discipline; a below-threshold
   candidate can never outrank an above-threshold one under ratio
   ordering, so thresholding after the argmax equals before).
   Otherwise — including no candidate at all — the record opens a new
   cluster keyed by its own id.

Scale design: one hash join on the blocking key (the same key the
full pipeline blocks on, so hot-block salting upstream applies), one
partial-aggregable min-struct shuffle on the new-record id, one left
join back.  No iteration, no windows over the catalog, catalog never
re-clustered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assign_to_clusters(
    new: DataFrame,
    catalog: DataFrame,
    id_col: str = "id",
    member_col: str = "member_id",
    cluster_col: str = "cluster",
    toks_col: str = "toks",
    block_col: str = "block",
    num: int = 1,
    den: int = 2,
) -> DataFrame:
    """Assign each row of ``new`` to its best existing cluster.

    ``new``: (``id_col``, ``block_col``, ``toks_col``).  ``catalog``:
    (``member_col``, ``cluster_col``, ``block_col``, ``toks_col``) —
    one row per existing member.  Threshold = ``num/den`` token
    Jaccard.  Output: ``id_col``, ``cluster`` (existing id or own id),
    ``is_new_cluster`` (1 when a singleton was opened), ``n_inter`` /
    ``n_union`` (the winning candidate's counts; 0 for singletons).
    """
    if not (0 < num <= den):
        raise ValueError(f"threshold {num}/{den} must be in (0, 1]")
    n = new.select(
        F.col(id_col).alias("__nid"),
        F.col(block_col).alias("__nb"),
        F.col(toks_col).alias("__nts"),
    )
    c = catalog.select(
        F.col(member_col).alias("__member"),
        F.col(cluster_col).alias("__cluster"),
        F.col(block_col).alias("__cb"),
        F.col(toks_col).alias("__cts"),
    )
    inter = F.size(F.array_intersect(F.col("__nts"), F.col("__cts")))
    cand = (
        n.filter(F.size("__nts") > 0)
        .join(
            c.filter(F.size("__cts") > 0),
            on=F.col("__nb") == F.col("__cb"),
        )
        .select(
            "__nid",
            "__cluster",
            "__member",
            inter.alias("__i"),
            (F.size("__nts") + F.size("__cts") - inter).alias("__u"),
        )
    )
    best = cand.groupBy("__nid").agg(
        F.min(
            F.struct(
                (-(F.col("__i") / F.col("__u"))).alias("negr"),
                F.col("__cluster").alias("cluster"),
                F.col("__member").alias("member"),
                F.col("__i").alias("ninter"),
                F.col("__u").alias("nunion"),
            )
        ).alias("__b")
    )
    miss = F.col("__b").isNull() | (
        F.lit(den) * F.col("__b.ninter") < F.lit(num) * F.col("__b.nunion")
    )
    return (
        n.join(best, "__nid", "left")
        .select(
            F.col("__nid").alias(id_col),
            F.when(miss, F.col("__nid"))
            .otherwise(F.col("__b.cluster"))
            .alias("cluster"),
            F.when(miss, F.lit(1)).otherwise(F.lit(0)).alias(
                "is_new_cluster"
            ),
            F.when(miss, F.lit(0))
            .otherwise(F.col("__b.ninter"))
            .alias("n_inter"),
            F.when(miss, F.lit(0))
            .otherwise(F.col("__b.nunion"))
            .alias("n_union"),
        )
    )


def persistent_cluster_ids(
    old: DataFrame,
    new: DataFrame,
    member_col: str = "mention_id",
    old_id_col: str = "old_cluster",
    new_id_col: str = "new_cluster",
) -> DataFrame:
    """Stable entity ids across clustering releases: a new cluster
    INHERITS an old cluster's id iff they mutually-majority overlap
    (shared members > half of EACH side) — the downstream-consumer
    contract q83's churn report measures but does not enforce.

    The mutual-majority rule makes inheritance a perfect partial
    matching with no tie-breaking needed: two new clusters cannot
    each hold >half of one old cluster (their member sets are
    disjoint), nor one new cluster >half-overlap two old ones — so
    every persistent id survives into AT MOST one successor and every
    successor claims at most one ancestor, by integer comparisons
    alone.  Non-inheriting clusters mint a fresh id from their
    smallest member ("new:<member>").

    Scale: one (new, old) contingency-cell groupBy — O(cells), cells
    bounded by members — two size groupBys OF the cells' inputs, an
    argmax struct-min per new cluster, and a broadcast-size join
    back.  No pair expansion anywhere.
    """
    o = old.select(
        F.col(member_col).alias("__m"), F.col(old_id_col).alias("__oc")
    )
    n = new.select(
        F.col(member_col).alias("__m"), F.col(new_id_col).alias("__nc")
    )
    cells = (
        n.join(o, "__m", "left")
        .groupBy("__nc", "__oc")
        .agg(F.count(F.lit(1)).alias("__ov"))
    )
    n_new = n.groupBy("__nc").agg(F.count(F.lit(1)).alias("__n_new"))
    n_old = o.groupBy("__oc").agg(F.count(F.lit(1)).alias("__n_old"))
    best = (
        cells.where(F.col("__oc").isNotNull())
        .join(n_old, "__oc")
        .groupBy("__nc")
        .agg(
            F.min(
                F.struct(
                    (-F.col("__ov")).alias("__neg"),
                    F.col("__oc").alias("__oc"),
                    F.col("__ov").alias("__ov"),
                    F.col("__n_old").alias("__n_old"),
                )
            ).alias("__b")
        )
        .select(
            "__nc",
            F.col("__b.__oc").alias("__oc"),
            F.col("__b.__ov").alias("__ov"),
            F.col("__b.__n_old").alias("__n_old"),
        )
    )
    fresh = n.groupBy("__nc").agg(F.min("__m").alias("__rep"))
    inherit = (
        n_new.join(best, "__nc", "left")
        .join(fresh, "__nc")
        .withColumn(
            "inherited",
            (
                F.col("__oc").isNotNull()
                & (2 * F.col("__ov") > F.col("__n_new"))
                & (2 * F.col("__ov") > F.col("__n_old"))
            ).cast("int"),
        )
    )
    return inherit.select(
        F.col("__nc").alias(new_id_col),
        F.when(F.col("inherited") == 1, F.col("__oc"))
        .otherwise(F.concat(F.lit("new:"), F.col("__rep")))
        .alias("persistent_id"),
        "inherited",
        F.coalesce(
            F.when(F.col("inherited") == 1, F.col("__ov")), F.lit(0)
        ).alias("n_shared"),
        F.col("__n_new").alias("n_members"),
    )
