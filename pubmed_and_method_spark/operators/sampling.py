"""Ordering/sampling operators: seeded global shuffle (O3) and
deterministic split/sample helpers.

The reference shuffles with non-reproducible entropy — ``order by
rand()`` / ``xxHash32(now64())`` (database/and_datasets.sql sampling
blocks; round-1 SURVEY flagged the seed leak) — so the rebuild makes
the seed explicit: ordering key = hash(row key, seed).  A global sort
in Spark is a range-partitioned total order (sampling pass + range
exchange), which is exactly the declarative form a 1000-executor sort
needs; never collect-and-shuffle on the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def shuffle_key(
    cols: list[str | Column], seed: int = 0, portable: bool = False
) -> Column:
    """Deterministic pseudo-random ordering key.

    ``portable=True`` uses md5 (string hex, reproducible in any SQL
    engine — the oracle-checkable twin); default is xxhash64 (fast JVM
    path)."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    if portable:
        return F.md5(
            F.concat_ws("#", *[c.cast("string") for c in cs], F.lit(str(seed)))
        )
    return F.xxhash64(*cs, F.lit(seed))


def seeded_shuffle(
    df: DataFrame,
    key_cols: list[str],
    seed: int = 0,
    portable: bool = False,
) -> DataFrame:
    """O3: seeded global shuffle — a total order that is stable across
    runs, partitionings, and cluster sizes (same seed -> same order),
    unlike ``orderBy(rand())`` whose sample depends on task layout."""
    return df.orderBy(shuffle_key(key_cols, seed, portable), *key_cols)


def seeded_sample(
    df: DataFrame,
    key_cols: list[str],
    fraction: float,
    seed: int = 0,
) -> DataFrame:
    """Deterministic Bernoulli-style sample: keep rows whose seeded
    hash bucket falls under ``fraction`` (the O2/F6 hash-bucket
    pattern; reproducible unlike df.sample at partition changes)."""
    bucket = F.pmod(shuffle_key(key_cols, seed), F.lit(1_000_000))
    return df.where(bucket < int(fraction * 1_000_000))


def sample_mixture(
    df: DataFrame,
    id_col: str,
    token_count: Column | str,
    source_col: str,
    budgets: dict[str, int],
    seed: int = 0,
) -> DataFrame:
    """Weighted dataset-mixture sampling: per source, take documents
    in deterministic seeded-hash order until the source's TOKEN budget
    is exhausted (a document is taken while the budget is not yet full
    when it starts, so each source may overshoot by at most one
    document — the standard greedy mixing rule).

    This is the Dolma/RedPajama-style mixture step: the training set
    is specified as tokens-per-source, not row fractions, because
    document lengths differ across sources.  Deterministic: the order
    key is md5(id, seed) (the portable ``shuffle_key``), so the same
    budgets + seed reproduce the same mixture on any cluster size or
    engine.

    Scale: one window shuffle partitioned BY SOURCE — each source's
    cumulative sum is independent, so skew is bounded by the largest
    single source (salt-free; sources are the natural partition).  The
    budget map is a literal (O(sources), not corpus-growing).  Sources
    absent from ``budgets`` are dropped.

    Returns (id, source, n_toks, cum_toks) for the taken documents.
    """
    from pyspark.sql import Window as W

    tc = F.col(token_count) if isinstance(token_count, str) else token_count
    budget_map = F.create_map(
        *[F.lit(x) for kv in sorted(budgets.items()) for x in kv]
    )
    ordk = shuffle_key([id_col], seed, portable=True)
    w = (
        W.partitionBy("source")  # the aliased column, not source_col
        .orderBy(ordk, id_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        df.select(
            F.col(id_col),
            F.col(source_col).alias("source"),
            tc.alias("n_toks"),
        )
        .withColumn("cum_toks", F.sum("n_toks").over(w))
        .where(
            (F.col("cum_toks") - F.col("n_toks"))
            < F.coalesce(budget_map[F.col("source")], F.lit(0))
        )
        .select(id_col, "source", "n_toks", "cum_toks")
    )


def random_cross_pairs(
    df: DataFrame, id_col: str, bucket_hex_len: int = 1
) -> DataFrame:
    """Deterministic pseudo-random disjoint pairing of a record set:
    each record appears in AT MOST one pair, partners drawn without
    regard to any blocking key.

    The sampling primitive behind unsupervised u-probability
    estimation (Splink's estimate_u workflow; Fellegi-Sunter's
    comparison-of-nonmatches): random cross-corpus pairs are almost
    surely NON-matches, so per-feature agreement rates on them
    estimate u without labels.  The reference has no u-estimation at
    all (its weights come from labeled data only).

    Determinism without a global sort: records bucket by an md5-hex
    prefix, rank inside each bucket by (md5(id), id), and odd ranks
    pair with the following even rank — per-bucket windows only
    (16^k buckets bound each window's partition), one shuffle, and
    the same rule re-derives in any engine.  Odd leftovers are
    dropped: at most ONE record per bucket, i.e. up to 16^k records
    total (16 at the default bucket_hex_len=1) — negligible for
    u-estimation, but not "one record" (ADVICE r04 wording fix).
    """
    from pyspark.sql import Window

    t = (
        df.select(F.col(id_col).alias("__id"))
        .distinct()
        .withColumn("__b", F.substring(F.md5("__id"), 1, bucket_hex_len))
        .withColumn("__h", F.md5("__id"))
    )
    w = Window.partitionBy("__b").orderBy("__h", "__id")
    t = t.withColumn("__r", F.row_number().over(w))
    odd = t.where(F.col("__r") % 2 == 1).select(
        F.col("__id").alias("id1"),
        "__b",
        F.expr("(__r + 1) div 2").alias("__k"),
    )
    even = t.where(F.col("__r") % 2 == 0).select(
        F.col("__id").alias("id2"),
        "__b",
        F.expr("__r div 2").alias("__k"),
    )
    return odd.join(even, ["__b", "__k"]).select("id1", "id2")
