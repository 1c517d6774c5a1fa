"""Large-star / small-star (hash-min) connected components.

The reference stops at pairwise labels; the north rule requires
transitive entity clusters.  This is the alternating large-star /
small-star algorithm (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14) expressed as pure DataFrame joins —
no collect_list per node (a hot node's neighbor list never
materializes in one task), no RDDs, O(log n) rounds.

Per-iteration ``localCheckpoint`` truncates lineage so plans don't
grow unboundedly (at production scale this is an Iceberg stage write
per iteration — see plans/checkpoint.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """(u,v) -> for every neighbor v > u: (v, min(N(u) ∪ {u}))."""
    bidir = edges.select("u", "v").union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = bidir.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.withColumn("mn", F.least("mn", "u"))
    return (
        bidir.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("mn").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Direct edges high->low, then point each neighborhood at its min."""
    directed = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).where(F.col("u") != F.col("v")).distinct()
    mins = directed.groupBy("u").agg(F.min("v").alias("mn"))
    relinked = (
        directed.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("mn").alias("v"))
        .where(F.col("u") != F.col("v"))
    )
    self_link = mins.select(F.col("u"), F.col("mn").alias("v"))
    return relinked.union(self_link).distinct()


def connected_components(
    edges: DataFrame,
    u_col: str = "u",
    v_col: str = "v",
    max_iter: int = 20,
) -> DataFrame:
    """Return (id, component) where component = min node id reachable.

    ``edges`` may be strings or numerics; comparison uses the column's
    natural ordering.  Isolated nodes (absent from edges) are the
    caller's concern — union them back with component = own id.
    """
    e = edges.select(F.col(u_col).alias("u"), F.col(v_col).alias("v")).where(
        F.col(u_col) != F.col(v_col)
    ).distinct()
    e = e.localCheckpoint(eager=True)

    def _checksum(df: DataFrame):
        # order-insensitive set fingerprint: xor of row hashes (no
        # overflow under ANSI mode, unlike sum).
        return df.select(
            F.count("*").alias("c"),
            F.coalesce(
                F.bit_xor(F.xxhash64("u", "v")), F.lit(0).cast("long")
            ).alias("h"),
        ).first()

    prev = _checksum(e)
    for _ in range(max_iter):
        e2 = _small_star(_large_star(e)).localCheckpoint(eager=True)
        new = _checksum(e2)
        e = e2
        if prev.c == new.c and prev.h == new.h:
            break
        prev = new

    members = e.select(F.col("u").alias("id"), F.col("v").alias("component"))
    roots = e.select(F.col("v").alias("id")).distinct().withColumn(
        "component", F.col("id")
    )
    return members.union(roots).groupBy("id").agg(
        F.min("component").alias("component")
    )
