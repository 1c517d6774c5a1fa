"""Truth discovery: conflict resolution by source-reliability
weighted voting (TruthFinder family — Yin, Han, Yu TKDE'08; the
Dong/Srivastava data-fusion survey's baseline iteration).

``consolidate`` (q54) merges cluster attributes by declared
strategies — mode voting counts every claim equally.  Truth discovery
closes the loop the fusion literature adds on top: sources that tend
to agree with the consensus earn trust, and trusted sources' votes
count for more.  One update round (uniform-prior vote -> source trust
-> reweighted vote) is the canonical step; it is what separates a
feed full of typos from a clean feed when they disagree on an
entity's attribute.

Cross-engine exactness (the q80/q91 fold discipline): every ratio is
rounded to 6 decimals the moment it is born, and every sum of those
ratios is a strict left fold over an explicitly sorted list — never a
plain SUM aggregate, whose accumulation order is engine-specific.
The winner per object is then an integer-free argmax over identical
doubles, tie-broken to the smallest value.

Scale design: claims dedup is one shuffle on (source, object, value);
vote shares are two keyed aggregations; the trust fold groups by
source and the reweighted vote by object — each a single shuffle of
the (already deduped) claim table, never the raw mention table.
Per-group fold lists hold one entry per claim in that group (bounded
by claims-per-source / claims-per-object, not corpus size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _fold_sum(struct_col, value_field: str):
    """Strict left fold of ``value_field`` over the sorted struct list."""
    return F.aggregate(
        F.array_sort(F.collect_list(struct_col)),
        F.lit(0.0),
        lambda acc, x: acc + x[value_field],
    )


def truth_discovery(
    claims: DataFrame,
    source_col: str,
    object_col: str,
    value_col: str,
) -> DataFrame:
    """Resolve one value per object from conflicting source claims.

    Returns one row per object: the trust-weighted winning value, its
    confidence (round-6 share of reweighted votes), the claim count,
    and the distinct-value count.  Claims are deduped on
    (source, object, value) first — a source asserting the same value
    twice gets one vote, the standard fusion-model treatment.
    """
    s, o, v = source_col, object_col, value_col
    c = claims.select(s, o, v).distinct()

    oc = c.groupBy(o).agg(F.count(F.lit(1)).alias("__n_o"))
    vc = c.groupBy(o, v).agg(F.count(F.lit(1)).alias("__n_v"))
    nv = vc.groupBy(o).agg(F.count(F.lit(1)).alias("n_values"))
    share = vc.join(oc, o).select(
        o, v, F.round(F.col("__n_v") / F.col("__n_o"), 6).alias("__share")
    )

    # source trust = round-6 mean of its claims' uniform-vote shares,
    # folded in (object, value) order
    cs = c.join(share, [o, v])
    trust = cs.groupBy(s).agg(
        F.round(
            _fold_sum(
                F.struct(
                    F.col(o).alias("__o"),
                    F.col(v).alias("__v"),
                    F.col("__share").alias("__x"),
                ),
                "__x",
            )
            / F.count(F.lit(1)),
            6,
        ).alias("__trust")
    )

    # reweighted vote: per-(object, value) trust mass over per-object
    # total trust mass, both as sorted strict folds
    ct = c.join(trust, s)
    num = ct.groupBy(o, v).agg(
        _fold_sum(
            F.struct(F.col(s).alias("__s"), F.col("__trust").alias("__x")),
            "__x",
        ).alias("__tv")
    )
    den = ct.groupBy(o).agg(
        _fold_sum(
            F.struct(
                F.col(v).alias("__v"),
                F.col(s).alias("__s"),
                F.col("__trust").alias("__x"),
            ),
            "__x",
        ).alias("__tall")
    )
    conf = num.join(den, o).select(
        o, v, F.round(F.col("__tv") / F.col("__tall"), 6).alias("confidence")
    )

    win = (
        conf.groupBy(o)
        .agg(
            F.min(
                F.struct(
                    (-F.col("confidence")).alias("__neg"),
                    F.col(v).alias("__v"),
                    F.col("confidence").alias("__c"),
                )
            ).alias("__w")
        )
        .select(
            o,
            F.col("__w.__v").alias("resolved_value"),
            F.col("__w.__c").alias("confidence"),
        )
    )
    return (
        win.join(oc, o)
        .join(nv, o)
        .select(
            o,
            "resolved_value",
            "confidence",
            F.col("__n_o").alias("n_claims"),
            "n_values",
        )
    )


def source_trust(
    claims: DataFrame,
    source_col: str,
    object_col: str,
    value_col: str,
) -> DataFrame:
    """The per-source trust table the resolution run is weighted by
    (same derivation as :func:`truth_discovery`, exposed for audit):
    source, its round-6 trust, and its claim count."""
    s, o, v = source_col, object_col, value_col
    c = claims.select(s, o, v).distinct()
    oc = c.groupBy(o).agg(F.count(F.lit(1)).alias("__n_o"))
    vc = c.groupBy(o, v).agg(F.count(F.lit(1)).alias("__n_v"))
    share = vc.join(oc, o).select(
        o, v, F.round(F.col("__n_v") / F.col("__n_o"), 6).alias("__share")
    )
    cs = c.join(share, [o, v])
    return cs.groupBy(s).agg(
        F.round(
            _fold_sum(
                F.struct(
                    F.col(o).alias("__o"),
                    F.col(v).alias("__v"),
                    F.col("__share").alias("__x"),
                ),
                "__x",
            )
            / F.count(F.lit(1)),
            6,
        ).alias("trust"),
        F.count(F.lit(1)).alias("n_claims"),
    )
