"""Cluster consolidation (golden records): one canonical row per
entity cluster, every output column merged by a declared strategy.

The post-clustering step every ER consumer needs — dedup/AND stops at
cluster ids, but downstream training pipelines want ONE record per
entity.  The reference's closest pattern is its per-group profile
build with any()/groupArray (database/and_datasets.sql:515-520); this
operator makes the merge declarative.

Scale design: one shuffle on ``cluster_col`` for every strategy except
``mode``.  min/max/sum/count/set-union are partial-aggregable native
exprs (map-side combine); ``of_rep`` rides ``min(struct(order, value))``
so the representative row's value needs NO self-join back; ``mode``
pre-aggregates (cluster, value) counts — its first shuffle carries one
row per distinct value per cluster, never the raw rows — then argmaxes
per cluster with a deterministic tie-break (largest count, then
smallest value), joined back on the already-clustered key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: strategies accepted by :func:`consolidate`
STRATEGIES = ("min", "max", "sum", "set_union", "of_rep", "mode")


def consolidate(
    df: DataFrame,
    cluster_col: str,
    specs: dict[str, tuple[str, str]],
    rep_col: str | None = None,
    count_col: str = "n_members",
) -> DataFrame:
    """One golden record per cluster.

    ``specs``: output column -> (strategy, input expression/column).
    Strategies: ``min`` / ``max`` / ``sum`` (native aggs),
    ``set_union`` (sorted distinct values — deterministic order),
    ``of_rep`` (the value on the representative row, i.e. the row with
    the smallest ``rep_col``), ``mode`` (most frequent value; ties
    break to the smallest value, so the result is deterministic).
    ``count_col`` always carries the cluster size.
    """
    unknown = {s for s, _ in specs.values()} - set(STRATEGIES)
    if unknown:
        raise ValueError(f"unknown strategies {unknown}; one of {STRATEGIES}")
    if rep_col is None and any(s == "of_rep" for s, _ in specs.values()):
        raise ValueError("of_rep strategy requires rep_col")

    def col_of(expr: str | Column) -> Column:
        return F.expr(expr) if isinstance(expr, str) else expr

    aggs: list[Column] = [F.count(F.lit(1)).alias(count_col)]
    mode_cols: list[tuple[str, Column]] = []
    for out, (strategy, expr) in specs.items():
        c = col_of(expr)
        if strategy == "min":
            aggs.append(F.min(c).alias(out))
        elif strategy == "max":
            aggs.append(F.max(c).alias(out))
        elif strategy == "sum":
            aggs.append(F.sum(c).alias(out))
        elif strategy == "set_union":
            aggs.append(F.array_sort(F.collect_set(c)).alias(out))
        elif strategy == "of_rep":
            aggs.append(
                F.min(
                    F.struct(
                        F.col(rep_col).alias("__o"), c.alias("__v")
                    )
                )["__v"].alias(out)
            )
        else:  # mode
            mode_cols.append((out, c))

    base = df.groupBy(cluster_col).agg(*aggs)
    for out, c in mode_cols:
        # (cluster, value) pre-agg -> per-cluster argmax; -count in the
        # struct makes min() pick (largest count, smallest value)
        m = (
            df.groupBy(cluster_col, c.alias(out))
            .agg(F.count(F.lit(1)).alias("__n"))
            .groupBy(cluster_col)
            .agg(
                F.min(
                    F.struct(
                        (-F.col("__n")).alias("__neg"),
                        F.col(out).alias("__v"),
                    )
                )["__v"].alias(out)
            )
        )
        base = base.join(m, cluster_col)
    return base


def mine_alias_map(
    assignments: DataFrame,
    cluster_col: str,
    value_col: str,
) -> DataFrame:
    """Mine a variant -> canonical alias dictionary from RESOLVED
    clusters: within each cluster the most frequent value (ties to
    the smallest) is canonical, every co-occurring variant casts one
    vote for the mapping, and votes aggregate across clusters into
    (variant, canonical, support, n_votes_variant).

    The classic ER flywheel byproduct: this run's resolved entities
    teach the NEXT run's blocking which spellings co-refer (nickname
    and typo tables are mined exactly this way from linked records),
    turning q108's per-entity resolution into reusable corpus
    knowledge.  ``support`` = clusters where the variant coexists
    with that canonical; a variant seen under several canonicals
    keeps one row per canonical, ranked by the caller.

    Scale: one (cluster, value) count shuffle, a per-cluster argmax
    struct-min over those cells, one hash join of cells back to
    their cluster's canonical, one (variant, canonical) roll-up —
    all O(cells), never row-pair expansion.
    """
    cells = assignments.groupBy(
        F.col(cluster_col).alias("__c"), F.col(value_col).alias("__v")
    ).agg(F.count(F.lit(1)).alias("__n"))
    canon = (
        cells.groupBy("__c")
        .agg(
            F.min(
                F.struct(
                    (-F.col("__n")).alias("__neg"),
                    F.col("__v").alias("__v"),
                )
            )["__v"].alias("__canon")
        )
    )
    votes = (
        cells.join(canon, "__c")
        .where(F.col("__v") != F.col("__canon"))
        .groupBy(
            F.col("__v").alias("variant"),
            F.col("__canon").alias("canonical"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("support"),
            F.sum("__n").cast("long").alias("n_votes_variant"),
        )
    )
    return votes
