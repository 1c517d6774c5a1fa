"""ANY-join semantic shim.

Every join in the reference uses ClickHouse ``ANY LEFT/INNER JOIN``
(e.g. database/and_datasets.sql:69-79,
database/pubmed_inner_outer_feature.sql:686): at most ONE right-side
row is kept per key, so joins never fan out.  Spark joins are
all-match; the parity-preserving move is to dedup the build side to
one row per key before joining.

For determinism we do NOT use dropDuplicates (which keeps an
arbitrary row, like ClickHouse ANY) but a min-ordered pick, so two
runs produce identical output — part of the engine's seeding
discipline (SURVEY.md §4).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def any_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    how: str = "left",
    order_by: str | Sequence[str] | None = None,
    broadcast: bool = False,
) -> DataFrame:
    """left JOIN (one-row-per-key right) — deterministic ANY join.

    ``order_by``: columns deciding which right row survives (ascending
    min).  Default: all non-key columns, giving a stable total order.
    ``broadcast``: hint the deduped right side for a broadcast join
    (the commonness/dimension-table pattern,
    database/model_building_using_rich_features.sql:438-448).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if order_by is None:
        order_cols = [c for c in right.columns if c not in keys]
    else:
        order_cols = [order_by] if isinstance(order_by, str) else list(order_by)
    if order_cols:
        w = W.partitionBy(*keys).orderBy(*[F.col(c).asc_nulls_last() for c in order_cols])
        deduped = (
            right.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    else:
        deduped = right.dropDuplicates(keys)
    if broadcast:
        deduped = F.broadcast(deduped)
    return left.join(deduped, keys, how)
