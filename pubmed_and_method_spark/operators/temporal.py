"""Temporal cluster analysis: gap-based entity-epoch splitting.

The reference's clusters are static — a disambiguated author is one
block for all time (database/and_datasets.sql builds blocks with no
temporal dimension; the only time usage is the pairwise year-diff
feature, pubmed_inner_outer_feature.sql:819).  A production ER system
over activity streams needs the temporal VIEW of a cluster: the same
resolved entity active in January and again in June is two epochs —
the unit for slowly-changing-entity modelling, drift detection, and
"was this one agent or two successive agents behind one name?"
review.

``entity_epochs`` is the standard gap-based sessionization applied at
cluster granularity: order a cluster's mentions by event time, cut
where the silence between consecutive mentions exceeds
``gap_seconds``, and summarize each resulting epoch.  Exactly the
semantics of streaming session windows (streaming/stateful.py applies
the same rule per-key incrementally); this is the batch/backfill twin
over already-resolved clusters.

Scale: one shuffle on the cluster key for the ordered window, then a
(cluster, epoch) groupBy that reuses the same hash partitioning (group
keys are a superset of the window partition key, so no second
exchange).  All arithmetic on integer epoch-seconds — no floats, so
the DuckDB oracle (q77) re-derives every boundary exactly.  A
mega-cluster lands its whole timeline on one task — the q53
cluster-size histogram is the alarm for that; salting is wrong here
because the running gap comparison is inherently sequential per
cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def entity_epochs(
    assignments: DataFrame,
    cluster_col: str = "cluster",
    id_col: str = "mention_id",
    ts_col: str = "ts",
    gap_seconds: int = 172_800,
) -> DataFrame:
    """One row per (cluster, epoch): mention count, start/end epoch
    seconds, and span.

    An epoch starts at a cluster's first mention and at every mention
    whose gap to the previous one (ordered by time, then ``id_col``
    for a total order) exceeds ``gap_seconds``.  Ties in the
    timestamp cannot straddle an epoch boundary (equal timestamps have
    gap 0), so the output is deterministic regardless of tie order.

    ``ts_col`` may be a timestamp (converted via unix seconds) or an
    integer second column (used as-is).
    """
    ts_type = dict(assignments.dtypes).get(ts_col)
    secs = (
        F.col(ts_col).cast("long")
        if ts_type in ("bigint", "int", "long")
        else F.unix_timestamp(ts_col)
    )
    rows = assignments.select(
        F.col(cluster_col).alias("cluster"),
        F.col(id_col).alias("__id"),
        secs.alias("__secs"),
    )
    w = Window.partitionBy("cluster").orderBy("__secs", "__id")
    flagged = rows.withColumn(
        "__brk",
        F.when(
            F.lag("__secs").over(w).isNull()
            | (F.col("__secs") - F.lag("__secs").over(w) > gap_seconds),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    ep = flagged.withColumn(
        "epoch",
        F.sum("__brk").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return ep.groupBy("cluster", "epoch").agg(
        F.count(F.lit(1)).alias("n_mentions"),
        F.min("__secs").alias("epoch_start"),
        F.max("__secs").alias("epoch_end"),
        (F.max("__secs") - F.min("__secs")).alias("span_seconds"),
    )
