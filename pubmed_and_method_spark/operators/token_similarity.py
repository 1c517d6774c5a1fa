"""Monge-Elkan token-set similarity: transposition-robust name
comparison.

The reference compares names as WHOLE strings (Jaro-Winkler /
Levenshtein over the concatenated name, src/eutilities/
string_utils.py:80-102), so "maria santos" vs "santos maria" — a
given/surname TRANSPOSITION, one of the most common real-world name
variations — scores as a near-mismatch.  Monge-Elkan (Monge & Elkan
1996) fixes exactly this: each token of one name is matched to its
BEST-scoring counterpart in the other, and the per-token bests are
averaged, so token order stops mattering while per-token typo
tolerance (inner JW) is kept.

Cross-engine float discipline: the per-token best is a ``max`` of
round-6 JW scores (order-safe), and the per-side mean is built by a
STRICT LEFT FOLD over the bests sorted by token index —
``F.aggregate(sorted, 0.0, +)`` here, ``list_reduce(list(... ORDER BY
idx))`` in the DuckDB oracle — so the floating-point summation order
is pinned identically in both engines and the final round-6 score is
bit-reproducible (the q44/BENCH float-parity rule).

Scale: the token cross product is bounded by the token counts of the
two NAMES (2x2 for given+surname), so the explode is a constant-factor
row multiply, never quadratic in corpus size; everything downstream is
two pair-keyed groupBys that reuse one hash partitioning.  For long
token lists (documents) this operator is the wrong tool — use the
MinHash/TF-IDF paths instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pubmed_and_method_spark.functions.strings import jaro_winkler_udf


def monge_elkan_scores(
    pairs: DataFrame,
    toks1_col: str,
    toks2_col: str,
    id1_col: str = "mention_id1",
    id2_col: str = "mention_id2",
) -> DataFrame:
    """(id1, id2, me_fwd, me_bwd, monge_elkan) — per candidate pair,
    the directed Monge-Elkan means and their symmetrized average, all
    round-6 and bit-reproducible cross-engine (see module docstring).

    ``me_fwd`` = mean over tokens t of ``toks1`` of the best round-6
    JW(t, s) over s in ``toks2``; ``me_bwd`` is the reverse;
    ``monge_elkan`` = (me_fwd + me_bwd) / 2.  Pairs where EITHER side
    has no tokens are omitted (the similarity is undefined, matching
    the null contract of the inner JW which scores empty as 0.0 —
    dropping beats fabricating zeros that look like evidence).
    """
    base = pairs.select(
        F.col(id1_col).alias("__id1"),
        F.col(id2_col).alias("__id2"),
        F.col(toks1_col).alias("__t1s"),
        F.col(toks2_col).alias("__t2s"),
    ).filter((F.size("__t1s") > 0) & (F.size("__t2s") > 0))

    def directed(a_col: str, b_col: str, out: str) -> DataFrame:
        e = base.select(
            "__id1",
            "__id2",
            F.posexplode(a_col).alias("__i", "__t"),
            F.col(b_col).alias("__bs"),
        ).select(
            "__id1", "__id2", "__i", "__t",
            F.explode("__bs").alias("__s"),
        )
        best = (
            e.withColumn(
                "__jw", F.round(jaro_winkler_udf("__t", "__s"), 6)
            )
            .groupBy("__id1", "__id2", "__i")
            .agg(F.max("__jw").alias("__best"))
        )
        return (
            best.groupBy("__id1", "__id2")
            .agg(
                F.sort_array(
                    F.collect_list(F.struct("__i", "__best"))
                ).alias("__arr")
            )
            .select(
                "__id1",
                "__id2",
                (
                    F.aggregate(
                        F.transform("__arr", lambda x: x["__best"]),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    )
                    / F.size("__arr")
                ).alias(out),
            )
        )

    fwd = directed("__t1s", "__t2s", "__fwd")
    bwd = directed("__t2s", "__t1s", "__bwd")
    return (
        fwd.join(bwd, ["__id1", "__id2"])
        .select(
            F.col("__id1").alias(id1_col),
            F.col("__id2").alias(id2_col),
            F.round("__fwd", 6).alias("me_fwd"),
            F.round("__bwd", 6).alias("me_bwd"),
            F.round(
                (F.col("__fwd") + F.col("__bwd")) / 2, 6
            ).alias("monge_elkan"),
        )
    )
