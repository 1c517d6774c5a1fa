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


def temporal_decay_score(
    pairs: DataFrame,
    weights: dict[str, tuple[float, float]],
    gap_col: str,
    half_life_days: float = 30.0,
) -> DataFrame:
    """Time-decayed Fellegi-Sunter evidence (the decay idea of Li,
    Dong, Maurino & Srivastava, "Linking Temporal Records", VLDB'11):
    the further apart two mentions' activity windows, the less their
    feature agreement OR disagreement should count — entities drift
    (tools change, names re-spell), so stale evidence in either
    direction is discounted toward zero rather than trusted at face
    value.

    Appends three columns: ``decay`` = round-6 2^(-gap/half_life),
    ``llr`` = the plain q67 score (identical literal term order), and
    ``llr_decayed`` = the same terms each multiplied by the pair's
    decay (round-6 per term, summed left-to-right) — so a same-week
    pair keeps its full evidence and a year-apart pair's llr shrinks
    toward the indifference point, pushing it into the clerical band
    instead of a confident auto-decision.

    Pure codegen projection: weights are literals baked into the
    plan, no join or shuffle beyond what produced the pairs; every
    term is round-6 with a fixed order, so any engine re-derives it
    bit-for-bit.

    ORDERING CONTRACT (ADVICE r04): "fixed order" means the
    ITERATION ORDER OF ``weights`` — terms are summed left-to-right
    in dict insertion order, so a caller re-deriving the score in
    another engine (the q117 oracle does) must list the features in
    the same order; a differently-ordered dict yields a float sum
    that can differ in the last rounded digit.  Pass an ordered
    mapping (python dicts preserve insertion order) built in the same
    sequence as the oracle's expression.
    """
    decay = F.round(
        F.pow(F.lit(2.0), -F.col(gap_col) / F.lit(half_life_days)), 6
    )
    plain = None
    dec = None
    for c, (mw, dw) in weights.items():
        w = (
            F.when(F.col(c) == 1, F.lit(round(mw, 6)))
            .otherwise(F.lit(round(dw, 6)))
        )
        t = F.round(w * F.col("__decay"), 6)
        plain = w if plain is None else plain + w
        dec = t if dec is None else dec + t
    return (
        pairs.withColumn("__decay", decay)
        .withColumn("llr", F.round(plain, 6))
        .withColumn("llr_decayed", F.round(dec, 6))
        .withColumnRenamed("__decay", "decay")
    )


def interval_overlap_join(
    df: DataFrame,
    id_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Exact interval-overlap self-join by time-bucket hashing — the
    RANGE join Spark's equi-join machinery lacks natively, built the
    scalable way: a naive ``a.start <= b.end AND b.start <= a.end``
    theta-join plans as a nested-loop over the corpus; instead every
    interval explodes into the fixed-width buckets it covers, and
    candidates come from an EQUI-join on (partition cols, bucket).
    Complete by construction: any point of a non-empty intersection
    lies in a bucket both intervals cover.  Candidates then verify
    the exact predicate and dedupe (an overlapping pair shares every
    bucket of its intersection).

    Fan-out per row is interval_length/bucket_seconds + 1 — pick the
    bucket near the typical interval so the explode stays O(1) per
    record; ``partition_cols`` (e.g. the blocking key) bound the
    bucket-collision groups the same way blocks bound pair
    generation.  Returns (id1, id2, partition cols, overlap_seconds
    > 0).
    """
    parts = list(partition_cols or [])
    w = int(bucket_seconds)
    s, e = F.col(start_col).cast("long"), F.col(end_col).cast("long")
    b = df.select(
        F.col(id_col).alias("__id"),
        *[F.col(c) for c in parts],
        s.alias("__s"),
        e.alias("__e"),
        F.explode(
            F.sequence(
                F.floor(s / F.lit(w)).cast("long"),
                F.floor(e / F.lit(w)).cast("long"),
            )
        ).alias("__bk"),
    )
    left = b.select(
        F.col("__id").alias("id1"),
        *[F.col(c).alias(f"__p_{c}") for c in parts],
        F.col("__s").alias("__s1"),
        F.col("__e").alias("__e1"),
        "__bk",
    )
    right = b.select(
        F.col("__id").alias("id2"),
        *[F.col(c).alias(f"__q_{c}") for c in parts],
        F.col("__s").alias("__s2"),
        F.col("__e").alias("__e2"),
        "__bk",
    )
    cond = [left["__bk"] == right["__bk"]] + [
        left[f"__p_{c}"] == right[f"__q_{c}"] for c in parts
    ]
    cand = (
        left.join(right, cond)
        .where(F.col("id1") < F.col("id2"))
        .where(
            (F.col("__s1") <= F.col("__e2"))
            & (F.col("__s2") <= F.col("__e1"))
        )
        .select(
            "id1",
            "id2",
            *[F.col(f"__p_{c}").alias(c) for c in parts],
            (
                F.least("__e1", "__e2") - F.greatest("__s1", "__s2")
            ).alias("overlap_seconds"),
        )
        .where(F.col("overlap_seconds") > 0)
        .distinct()
    )
    return cand
