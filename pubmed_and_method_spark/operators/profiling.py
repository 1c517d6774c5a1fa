"""Corpus statistics / column profiling.

The reference's statistics table (database/statistics.sql:96-245)
computes per-field validity counts as ~20 separate ``select count()
... where isNotNull(x)`` subqueries UNION'd together — one full scan
per field.  Re-expressed Spark-first: ALL per-column metrics are
conditional aggregations over a SINGLE scan — Catalyst plans the
multi-column exact distincts as one Expand (one branch per distinct
column) over that scan, shuffling only the expanded key stream (a
distinct count must shuffle SOMETHING; it shuffles keys, not the
table, and only once for all columns) — then pivoted to the
reference's long ``(name, cnt)`` presentation with ``stack``.

At 100 TB the difference is 20 scans vs 1; the distinct counts swap
to HyperLogLog sketches (``approx_count_distinct``) with bounded
relative error — mergeable across partitions, constant memory — while
the exact variant stays the cross-engine oracle path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame,
    cols: list[str],
    approx: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """(col_name, n_valid, n_distinct, avg_len) — one row per profiled
    column, computed in ONE pass over ``df``.

    - n_valid: rows where the column is non-null AND its trimmed
      string form is non-empty — the reference's ``num_valid_X``
      convention (empty string == missing,
      database/statistics.sql:107-170).
    - n_distinct: exact ``count_distinct`` (oracle path) or HLL
      ``approx_count_distinct(rsd)`` when ``approx=True`` (the 100 TB
      path: mergeable sketch, constant memory per column).
    - avg_len: mean string length of the column's non-null values
      (cast to string; callers should profile columns whose cast is
      engine-portable — ints/strings — when oracling cross-engine).

    All metrics for all columns ride ONE aggregate: Catalyst computes
    the conditional sums map-side and merges partials, so cost is a
    single scan regardless of len(cols) — vs the reference's
    one-subquery-per-field union of full scans.
    """
    aggs = []
    for c in cols:
        s = F.col(c).cast("string")
        valid = F.col(c).isNotNull() & (F.length(F.trim(s)) > 0)
        aggs.append(F.sum(valid.cast("long")).alias(f"__v_{c}"))
        dc = (
            F.approx_count_distinct(c, rsd)
            if approx
            else F.count_distinct(F.col(c))
        )
        aggs.append(dc.alias(f"__d_{c}"))
        aggs.append(F.round(F.avg(F.length(s)), 6).alias(f"__l_{c}"))
    row = df.agg(*aggs)
    pairs = ", ".join(
        f"'{c}', `__v_{c}`, `__d_{c}`, `__l_{c}`" for c in cols
    )
    return row.selectExpr(
        f"stack({len(cols)}, {pairs}) as (col_name, n_valid, n_distinct, avg_len)"
    )


def block_skew_profile(
    records: DataFrame, key_col: str, salt_target: int = 32
) -> DataFrame:
    """Block-size skew diagnostics: the table that PLANS the salting
    the pair stage applies (operators/blocking.generate_pairs
    ``adaptive_target``).

    One row per power-of-two block-size bucket: how many blocks land
    there, the records and within-block pairs they carry, each
    bucket's share of TOTAL pair mass, the share held by this bucket
    and larger ("cum" — the tail the salting exists for), the largest
    block, and the salt factor ``ceil(max_block/salt_target)`` that
    bucket's worst block needs to meet the target.  The reference
    eyeballs exactly this distribution to justify its
    ``commonness > 1000`` hot-namespace cap (README.md:3,
    database/model_building_using_rich_features.sql:438-448); here it
    is an operator, because at 10^12 turns the pair stage's fate is
    decided by the tail of this histogram, not its mean.

    Scale: one count shuffle on the block key, then aggregation over
    (#distinct sizes -> #buckets) rows; the ordered windows run on
    the ~60-row bucket frame.  floor(log2(n)) is engine-portable here
    (identical doubles from identical ints, same libm).
    """
    sizes = records.groupBy(key_col).agg(F.count(F.lit(1)).alias("__n"))
    b = sizes.withColumn(
        "size_bucket", F.floor(F.log2("__n")).cast("int")
    )
    g = b.groupBy("size_bucket").agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum("__n").alias("n_records"),
        F.sum(F.expr("__n * (__n - 1) div 2")).alias("n_pairs"),
        F.max("__n").alias("max_block_size"),
    )
    tot = Window.partitionBy()
    cum = Window.orderBy(F.col("size_bucket").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        g.withColumn("__tot", F.sum("n_pairs").over(tot))
        .withColumn("__cum", F.sum("n_pairs").over(cum))
        .select(
            "size_bucket",
            "n_blocks",
            "n_records",
            "n_pairs",
            F.when(
                F.col("__tot") > 0,
                F.round(F.col("n_pairs") / F.col("__tot"), 6),
            )
            .otherwise(F.lit(0.0))
            .alias("pair_share"),
            F.when(
                F.col("__tot") > 0,
                F.round(F.col("__cum") / F.col("__tot"), 6),
            )
            .otherwise(F.lit(0.0))
            .alias("cum_pair_share"),
            "max_block_size",
            F.expr(
                f"(max_block_size + {salt_target} - 1) div {salt_target}"
            ).alias("rec_salt"),
        )
        .orderBy("size_bucket")
    )
