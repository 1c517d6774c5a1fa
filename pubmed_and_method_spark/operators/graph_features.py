"""Structural match evidence: common-neighbor features over the
high-confidence match graph (Liben-Nowell & Kleinberg, CIKM 2003).

Every feature the reference computes is PAIR-LOCAL — two mentions'
own strings/sets/times (src/pubmed_inner_feature_extract.py).  But a
borderline pair is often decided by the graph AROUND it: if a and b
each match the same third mentions with high confidence, that shared
neighborhood is match evidence no pairwise feature sees (the cheap,
one-hop form of collective entity resolution).  This operator scores
candidate pairs by:

- ``cn`` — the number of common high-confidence neighbors;
- ``nbr_jaccard`` — |N(a)∩N(b)| / |N(a)∪N(b)|, an exact integer
  ratio (engine-stable with no rounding tricks).

Plan shape: symmetrized evidence adjacency (one distinct), degrees
(one groupBy), then the triangle enumeration as TWO hash joins —
candidates join adj on endpoint a, result joins adj on endpoint b
with the shared-neighbor equality — reduced by ONE pair-keyed count
(map-side partial agg).  Cost is Σ_z deg(z)·cand_deg(z), so hubs
dominate; ``max_degree`` drops nodes above the cap from the NEIGHBOR
role only (their own candidate pairs still score via other
neighbors) — the same hot-key discipline as the blocking caps, and at
10^12 edges the cap is what keeps the join from going quadratic on a
celebrity node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def common_neighbor_features(
    pairs: DataFrame,
    edges: DataFrame,
    id_cols: tuple[str, str] = ("id1", "id2"),
    max_degree: int | None = None,
) -> DataFrame:
    """Append (cn, nbr_jaccard) to every candidate pair.

    ``pairs``: candidate pairs to score (columns ``id_cols``).
    ``edges``: the high-confidence evidence graph (same columns).
    Pairs with no common neighbor get cn=0, nbr_jaccard=0.0 — the
    left join keeps every candidate.  Under ``max_degree`` the
    DEGREES stay uncapped (the union denominator reflects true
    neighborhood sizes) while cn becomes a lower bound — the feature
    degrades conservatively on hub-adjacent pairs.
    """
    c1, c2 = id_cols
    e = edges.select(F.col(c1).alias("a"), F.col(c2).alias("b")).filter(
        F.col("a") != F.col("b")
    )
    adj = e.unionAll(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    deg = adj.groupBy("a").agg(F.count("*").alias("deg"))
    if max_degree is not None:
        # drop hubs from the NEIGHBOR role only: broadcast the (few)
        # over-cap nodes, never the keep-set
        hubs = deg.filter(F.col("deg") > max_degree).select(
            F.col("a").alias("b")
        )
        nbr = adj.join(F.broadcast(hubs), "b", "left_anti")
    else:
        nbr = adj

    cand = pairs.select(F.col(c1).alias("u"), F.col(c2).alias("v"))
    cn = (
        cand.join(nbr.select(F.col("a").alias("u"), F.col("b").alias("z")), "u")
        .join(nbr.select(F.col("a").alias("v"), F.col("b").alias("z")), ["v", "z"])
        .groupBy("u", "v")
        .agg(F.count("*").alias("cn"))
    )
    out = (
        cand.join(cn, ["u", "v"], "left")
        .join(deg.select(F.col("a").alias("u"), F.col("deg").alias("__d1")), "u", "left")
        .join(deg.select(F.col("a").alias("v"), F.col("deg").alias("__d2")), "v", "left")
        .withColumn("cn", F.coalesce("cn", F.lit(0)))
        .withColumn("__d1", F.coalesce("__d1", F.lit(0)))
        .withColumn("__d2", F.coalesce("__d2", F.lit(0)))
    )
    union = F.col("__d1") + F.col("__d2") - F.col("cn")
    return out.select(
        F.col("u").alias(c1),
        F.col("v").alias(c2),
        "cn",
        F.when(union > 0, F.col("cn") / union)
        .otherwise(F.lit(0.0))
        .alias("nbr_jaccard"),
    )
