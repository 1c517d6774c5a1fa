"""Benchmark decontamination: n-gram collision against an eval set.

The standard training-data hygiene pass (GPT-3 App. C / PaLM / Llama
style): a training document is contaminated if it shares at least one
word n-gram with any document in the held-out benchmark/eval set.
Spark-first shape:

- both sides tokenize with the SAME clean-token pipeline the dedup
  family uses (``functions.normalize.clean_tokens``) and hash each
  word n-gram to md5 (the q19 portable hash space — any engine
  reproduces the exact gram set);
- grams are built as posexplode + n-1 window leads over (doc, pos) —
  ONE id-keyed shuffle, each token touched once.  The in-row
  higher-order alternative (transform over sequence with slice) is a
  trap: Catalyst inlines the token-array alias into every lambda
  element, re-running the whole tokenization per gram — O(tokens²)
  per row, measured 25x slower at sf0.1 (the CollapseProject hazard
  documented at functions/normalize.shingle_hashes_from_hash_seq,
  which survives even withColumn/filter/repartition barriers);
- the benchmark gram set is BROADCAST: an eval set is curated and
  bounded (MBs of text -> at most a few million grams) regardless of
  corpus size, so this is the gazetteer-style correct broadcast, not
  the banned corpus-growing vocabulary broadcast.  The 100 TB corpus
  side then decontaminates with a map-side semi-join;
- per-document DISTINCT-gram counts use countDistinct (map-side
  partial dedup), so the gram stream is never pre-deduplicated with
  an extra shuffle.

Generalizes the reference's exclusion-list discipline — training
pairs whose mentions appear in the evaluation split are dropped
before fitting (src/comparison/result.txt "exclusions" block;
database/and_datasets.sql:81-105 dual-derivation) — from ids to
content overlap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pubmed_and_method_spark.functions.normalize import clean_tokens


def ngram_hashes(
    df: DataFrame, id_col: str, text_col: str, n: int = 8
) -> DataFrame:
    """(id, g) — word n-gram md5 stream per document (NOT deduped;
    aggregate with countDistinct or distinct() downstream).

    Documents shorter than ``n`` clean tokens contribute one
    whole-document gram (so short benchmark answers still match
    verbatim copies); empty documents contribute no rows.

    Long docs ride posexplode + (n-1) leads over one Window — Spark
    evaluates all leads in a single pass over the id-sorted partition;
    work and shuffle are O(total tokens).
    """
    base = df.select(F.col(id_col), clean_tokens(text_col).alias("__toks"))
    cnt = F.size("__toks")
    short = base.filter((cnt > 0) & (cnt < n)).select(
        F.col(id_col), F.md5(F.array_join("__toks", " ")).alias("g")
    )
    ex = base.filter(cnt >= n).select(
        F.col(id_col), F.posexplode("__toks").alias("__p", "__t")
    )
    w = Window.partitionBy(id_col).orderBy("__p")
    parts = [F.col("__t")] + [
        F.lead("__t", k).over(w) for k in range(1, n)
    ]
    # a gram starts at every position with n-1 successors; concat_ws
    # would silently skip null tails, so gate on the last lead
    long = (
        ex.select(
            F.col(id_col),
            F.when(
                F.lead("__t", n - 1).over(w).isNotNull(),
                F.md5(F.concat_ws(" ", *parts)),
            ).alias("g"),
        )
        .filter(F.col("g").isNotNull())
    )
    return long.unionByName(short)


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    min_hits: int = 1,
) -> DataFrame:
    """(id, n_hit_grams, n_grams, hit_frac) for corpus documents that
    share >= ``min_hits`` distinct word n-grams with the benchmark.

    ``n_hit_grams`` counts the corpus document's own distinct grams
    that occur anywhere in the benchmark; ``hit_frac`` is that count
    over the document's distinct-gram total (rounded to 6 decimals,
    the registry parity convention).  Downstream either drops flagged
    docs or routes them to snippet-level scrubbing.
    """
    cg = ngram_hashes(corpus, id_col, text_col, n=n)
    bg = ngram_hashes(benchmark, id_col, text_col, n=n).select("g").distinct()
    totals = cg.groupBy(id_col).agg(
        F.countDistinct("g").alias("n_grams")
    )
    hits = (
        cg.join(F.broadcast(bg), "g")
        .groupBy(id_col)
        .agg(F.countDistinct("g").alias("n_hit_grams"))
    )
    return (
        totals.join(hits, id_col)
        .filter(F.col("n_hit_grams") >= min_hits)
        .select(
            id_col,
            "n_hit_grams",
            "n_grams",
            F.round(
                F.col("n_hit_grams")
                / F.greatest(F.col("n_grams"), F.lit(1)),
                6,
            ).alias("hit_frac"),
        )
    )
