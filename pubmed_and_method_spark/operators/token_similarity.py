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


def soft_tfidf_scores(
    pairs: DataFrame,
    corpus: DataFrame,
    toks1_col: str,
    toks2_col: str,
    id1_col: str = "mention_id1",
    id2_col: str = "mention_id2",
    corpus_id_col: str = "mention_id",
    corpus_toks_col: str = "toks",
    threshold: float = 0.9,
) -> DataFrame:
    """Soft-TF-IDF hybrid name similarity (Cohen, Ravikumar &
    Fienberg, IIWeb 2003): the third classic token-set scheme next to
    Monge-Elkan (q80) and plain TF-IDF cosine (q37) — and the best
    performer in their study.  Monge-Elkan treats every token as
    equally important; TF-IDF cosine requires EXACT token agreement.
    Soft-TF-IDF combines both: tokens pair up by best Jaro-Winkler
    (>= ``threshold``, the CLOSE set), and each matched pair
    contributes the PRODUCT of the two tokens\' corpus TF-IDF weights
    scaled by the JW — so agreeing on a rare surname moves the score
    far more than agreeing on a ubiquitous given name, even through a
    typo.

    Weights: V(w, d) = round-6( idf(w) / ||d|| ), idf = round-6 of
    MLlib\'s ln((N+1)/(df+1)) over ``corpus`` (one row per mention, a
    token array; rows with empty arrays are excluded from N); the
    document norm is a STRICT LEFT FOLD of idf^2 in token-index order
    (the q80 summation-order discipline, so every float is
    bit-reproducible cross-engine).  Duplicate tokens within one name
    contribute one occurrence per position.

    Directed score over the tokens w_i of side 1 (``st_fwd``):
        sum_i [best_jw(i) >= threshold] * V(w_i, d1) * V(partner_i, d2)
              * best_jw(i)
    where best_jw(i)/partner_i come from the (jw, token) struct max
    over side 2 (round-6 JW, deterministic ties), and the sum is a
    strict left fold in token-index order with the below-threshold
    zeros included.  ``st_bwd`` is the reverse; ``soft_tfidf`` their
    round-6 mean.  Pairs where either side has no tokens are omitted
    (the q80 contract).

    Scale: the weight table is two linear aggregations over the
    corpus (token df, per-mention norm) reused by every pair; the
    pair stage multiplies rows only by NAME token counts (2x2 for
    given+surname), the corpus total N rides a 1-row broadcast, and
    the weight joins are plain hash joins — no corpus-sized
    broadcast, no quadratic blowup.
    """
    c = corpus.select(
        F.col(corpus_id_col).alias("__cid"),
        F.col(corpus_toks_col).alias("__ts"),
    ).filter(F.size("__ts") > 0)
    n1 = c.agg(F.count("*").alias("__n"))
    tok_rows = c.select(
        "__cid", F.posexplode("__ts").alias("__pos", "__tok")
    )
    dfq = (
        tok_rows.select("__cid", "__tok")
        .distinct()
        .groupBy("__tok")
        .agg(F.count("*").alias("__df"))
    )
    idf = dfq.crossJoin(F.broadcast(n1)).select(
        "__tok",
        F.round(
            F.log((F.col("__n") + 1) / (F.col("__df") + 1)), 6
        ).alias("__idf"),
    )
    wt = tok_rows.join(idf, "__tok")
    nrm = (
        wt.groupBy("__cid")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("__pos", "__idf"))
            ).alias("__arr")
        )
        .select(
            "__cid",
            F.sqrt(
                F.aggregate(
                    F.transform(
                        "__arr", lambda x: x["__idf"] * x["__idf"]
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            ).alias("__nrm"),
        )
    )
    # per-(mention, position) weight for the DRIVING side; the
    # per-(mention, token) view for the PARTNER side (duplicate
    # positions of one token share the same weight by construction)
    # v_pos / v_tok / base are each referenced by BOTH directed
    # passes (fwd and bwd), and Spark shares no common subtrees
    # across DataFrame branches: unpinned, every reference re-inlines
    # (and re-executes) the whole upstream weight chain — tok df,
    # idf, norm fold — and `base` re-inlines the caller's entire
    # candidate-pair pipeline (q91's physical plan reached ~5,600
    # operators; Catalyst planning dominated execution).  Lazy
    # localCheckpoint truncates lineage; values are unchanged.
    v_pos = wt.join(nrm, "__cid").select(
        "__cid",
        "__pos",
        "__tok",
        F.round(F.col("__idf") / F.col("__nrm"), 6).alias("__v"),
    ).localCheckpoint(eager=False)
    v_tok = v_pos.select("__cid", "__tok", "__v").distinct()

    base = pairs.select(
        F.col(id1_col).alias("__id1"),
        F.col(id2_col).alias("__id2"),
        F.col(toks1_col).alias("__t1s"),
        F.col(toks2_col).alias("__t2s"),
    ).filter(
        (F.size("__t1s") > 0) & (F.size("__t2s") > 0)
    ).localCheckpoint(eager=False)

    def directed_score(a_col: str, b_col: str, a_id: str, b_id: str,
                       out: str) -> DataFrame:
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
            .agg(
                F.max(
                    F.struct(
                        F.col("__jw").alias("jw"),
                        F.col("__s").alias("tok"),
                    )
                ).alias("__best")
            )
            .select(
                "__id1", "__id2", "__i",
                F.col("__best.jw").alias("__jw"),
                F.col("__best.tok").alias("__ptok"),
            )
        )
        contrib = (
            best.join(
                v_pos.select(
                    F.col("__cid").alias(a_id),
                    F.col("__pos").alias("__i"),
                    F.col("__v").alias("__v1"),
                ),
                [a_id, "__i"],
            )
            .join(
                v_tok.select(
                    F.col("__cid").alias(b_id),
                    F.col("__tok").alias("__ptok"),
                    F.col("__v").alias("__v2"),
                ),
                [b_id, "__ptok"],
            )
            .select(
                "__id1",
                "__id2",
                "__i",
                F.when(
                    F.col("__jw") >= F.lit(threshold),
                    F.col("__v1") * F.col("__v2") * F.col("__jw"),
                )
                .otherwise(F.lit(0.0))
                .alias("__c"),
            )
        )
        return (
            contrib.groupBy("__id1", "__id2")
            .agg(
                F.sort_array(
                    F.collect_list(F.struct("__i", "__c"))
                ).alias("__arr")
            )
            .select(
                "__id1",
                "__id2",
                F.aggregate(
                    F.transform("__arr", lambda x: x["__c"]),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias(out),
            )
        )

    fwd = directed_score("__t1s", "__t2s", "__id1", "__id2", "__fwd")
    bwd = directed_score("__t2s", "__t1s", "__id2", "__id1", "__bwd")
    return (
        fwd.join(bwd, ["__id1", "__id2"])
        .select(
            F.col("__id1").alias(id1_col),
            F.col("__id2").alias(id2_col),
            F.round("__fwd", 6).alias("st_fwd"),
            F.round("__bwd", 6).alias("st_bwd"),
            F.round(
                (F.col("__fwd") + F.col("__bwd")) / 2, 6
            ).alias("soft_tfidf"),
        )
    )
