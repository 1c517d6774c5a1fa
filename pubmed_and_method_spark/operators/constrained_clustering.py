"""Cannot-link constrained cluster repair: enforce hard negative
constraints on an existing clustering.

ER clusterers weld on positive evidence only (transitive closure —
the reference's namespace weld, database/and_datasets.sql:56-68 — or
star/pivot covers).  Real corpora also carry HARD negative evidence:
two mentions with conflicting exclusive attributes (different ORCIDs,
different declared languages on the "same" document) must never share
an entity, yet closure happily welds them through intermediate nodes.
The standard post-pass (Dedupe's cluster repair; collective-ER
cannot-link constraints) splits violating clusters.

Rule (deterministic, single-pass, non-iterative):

1. A cannot-link pair VIOLATES when both endpoints sit in the same
   cluster.
2. For every violating pair, EVICT the endpoint with the greater
   ``(md5(id), id)`` hash priority — the same portable-permutation
   discipline as the star/pivot clusterers, so eviction is stable
   across runs/engines and not biased toward large ids.  Each
   violating pair loses at least one endpoint, so NO violation can
   survive among the kept members (the guarantee is one-pass, no
   fixpoint needed).
3. Evicted mentions become singletons (cluster = own id); kept
   members are re-keyed to ``min(kept id)`` per original cluster so
   cluster ids never collide with evicted singletons (the old min may
   itself have been evicted).

Scale design: constraints join the cluster map twice on the id key
(hash joins; the CL table is tiny next to the corpus — broadcast when
it fits), the evict set is a distinct on ids, and re-keying is one
partial-aggregable ``min`` shuffle on ``cluster_col``.  No iteration,
no windows over the full corpus, no driver collection — survives a
100x corpus as three key-partitioned shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _priority(id_col: F.Column) -> F.Column:
    """Portable hash priority: md5 of the decimal string form —
    identical in Spark and DuckDB for non-negative integer ids."""
    return F.md5(id_col.cast("string"))


def cannot_link_repair(
    clusters: DataFrame,
    cannot_link: DataFrame,
    id_col: str = "id",
    cluster_col: str = "cluster",
    id1_col: str = "id1",
    id2_col: str = "id2",
    out_col: str = "repaired_cluster",
    evicted_col: str = "evicted",
) -> DataFrame:
    """Split clusters so no cannot-link pair stays co-clustered.

    ``clusters``: one row per mention (``id_col``, ``cluster_col``,
    extra columns pass through).  ``cannot_link``: pair table
    (``id1_col``, ``id2_col``); order and duplicates don't matter.
    Output = input columns + ``out_col`` (post-repair cluster id) +
    ``evicted_col`` (1 when the row was split out as a singleton).
    CL pairs with an endpoint absent from ``clusters`` are inert.
    """
    ids = F.col(id_col)
    cmap = clusters.select(ids.alias("__clid"), F.col(cluster_col).alias("__clc"))
    viol = (
        cannot_link.select(
            F.col(id1_col).alias("__a"), F.col(id2_col).alias("__b")
        )
        .filter(F.col("__a") != F.col("__b"))
        .join(cmap.withColumnRenamed("__clid", "__a"), "__a")
        .withColumnRenamed("__clc", "__ca")
        .join(cmap.withColumnRenamed("__clid", "__b"), "__b")
        .filter(F.col("__ca") == F.col("__clc"))
    )
    # the greater (md5(id), id) endpoint of each violating pair
    evict = viol.select(
        F.when(
            (_priority(F.col("__a")) > _priority(F.col("__b")))
            | (
                (_priority(F.col("__a")) == _priority(F.col("__b")))
                & (F.col("__a") > F.col("__b"))
            ),
            F.col("__a"),
        )
        .otherwise(F.col("__b"))
        .alias("__evict")
    ).distinct()

    kept = clusters.join(
        evict, on=ids == F.col("__evict"), how="left_anti"
    )
    # re-key kept members to min(kept id) per original cluster
    remin = kept.groupBy(F.col(cluster_col).alias("__rc")).agg(
        F.min(ids).alias("__newc")
    )
    kept_out = (
        kept.join(remin, on=F.col(cluster_col) == F.col("__rc"))
        .drop("__rc")
        .withColumn(out_col, F.col("__newc"))
        .drop("__newc")
        .withColumn(evicted_col, F.lit(0))
    )
    evicted_out = (
        clusters.join(evict, on=ids == F.col("__evict"), how="left_semi")
        .withColumn(out_col, ids)
        .withColumn(evicted_col, F.lit(1))
    )
    return kept_out.unionByName(evicted_out)
