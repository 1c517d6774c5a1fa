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

from pyspark.sql import DataFrame
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
