"""Text-analysis operators for large-scale training-data pipelines.

Language-ID (stopword-lexicon heuristic), quality scoring, token
counting (whitespace + BPE-ish regex), and document fingerprinting —
all native Spark SQL expressions (JVM-side, codegen'd); no UDFs.

These generalize the reference's clean-text/keyword machinery
(database/pubmed_inner_outer_feature.sql:2-93,
src/eutilities/string_utils.py:25-56) into reusable column builders.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from pubmed_and_method_spark.functions.normalize import STOPWORDS, normalize_text

# tiny per-language function-word lexicons for the heuristic
# language-ID (deterministic, broadcast-as-literal scale: the lexicon
# is O(100) words regardless of corpus size)
LANG_LEXICONS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "des", "que", "dans"],
    "es": ["el", "los", "las", "es", "una", "por", "con", "para", "del", "como"],
    "zh": ["de5", "shi4", "le5", "zai4", "you3", "wo3", "ta1", "men5", "zhe4", "bu4"],
}

# BPE-ish token pattern: word pieces, numbers, or single non-space
# symbols — the shape GPT-style pre-tokenizers use.
BPE_ISH_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def whitespace_token_count(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.when(F.length(F.trim(c)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(c), r"\s+"))
    )


def bpe_ish_token_count(c: Column | str) -> Column:
    """Count of BPE-pre-tokenizer-shaped pieces via one regex pass."""
    c = F.col(c) if isinstance(c, str) else c
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_RE), 0))


def lang_scores(c: Column | str) -> dict[str, Column]:
    """Per-language function-word hit counts over lowercase tokens."""
    c = F.col(c) if isinstance(c, str) else c
    toks = F.split(F.lower(F.trim(c)), r"\s+")
    out = {}
    for lang, lex in LANG_LEXICONS.items():
        arr = F.array(*[F.lit(w) for w in lex])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    return out


def predict_lang(c: Column | str, default: str = "en") -> Column:
    """argmax language by lexicon hits; deterministic tie-break by
    language code order; `default` when no lexicon word hits."""
    scores = lang_scores(c)
    langs = sorted(scores)
    best = None
    for lang in langs:
        pair = F.struct(scores[lang].alias("score"), F.lit(lang).alias("lang"))
        best = pair if best is None else F.when(
            (pair["score"] > best["score"]), pair
        ).otherwise(best)
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit(default))


def quality_features(c: Column | str) -> dict[str, Column]:
    """Length / punctuation / stopword-ratio quality signals."""
    c = F.col(c) if isinstance(c, str) else c
    ws = F.split(F.trim(c), " ")
    low_ws = F.split(F.lower(F.trim(c)), " ")
    punct = F.size(F.regexp_extract_all(c, F.lit(r"[.,;:!?]"), 0))
    sw = F.array(*[F.lit(s) for s in STOPWORDS])
    return {
        "n_chars": F.length(c),
        "n_ws_tokens": F.size(ws),
        "n_punct": punct,
        "punct_ratio": punct * 1.0 / F.greatest(F.length(c), F.lit(1)),
        "stopword_ratio": (
            F.size(F.filter(low_ws, lambda t: F.array_contains(sw, t)))
            * 1.0
            / F.greatest(F.size(ws), F.lit(1))
        ),
    }


def fingerprint(c: Column | str) -> Column:
    """Normalized-content fingerprint (md5 of the canonical text) —
    the exact-dedup key."""
    return F.md5(normalize_text(c))


def gazetteer_lookup(
    df,
    id_col: str,
    token_col: str,
    gazetteer,
    term_col: str = "term",
    tag_col: str = "tag",
    out_col: str = "gazetteer_tags",
):
    """E4: dictionary/gazetteer extraction as a broadcast hash join.

    The reference ships location/organization gazetteers into its Java
    NER sidecar (SURVEY §2.13); Spark-first the dictionary is a small
    DataFrame broadcast to every task, tokens join against it, and
    matched tags aggregate per doc.  Broadcast is CORRECT here (unlike
    the banned vocabulary broadcast): a curated gazetteer is
    fixed-size, not corpus-growing.

    Returns ``df`` + ``out_col``: sorted distinct matched tags
    (empty array when none).
    """
    gaz = gazetteer.select(
        F.col(term_col).alias("__term"), F.col(tag_col).alias("__tag")
    )
    ex = df.select(F.col(id_col), F.explode(token_col).alias("__term"))
    hits = (
        ex.join(F.broadcast(gaz), "__term")
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_set("__tag")).alias(out_col))
    )
    return df.join(hits, id_col, "left").withColumn(
        out_col,
        F.coalesce(F.col(out_col), F.array().cast("array<string>")),
    )


def repetition_stats(
    df, id_col: str, text_col: str, ngram: int = 2
) -> "DataFrame":
    """Per-document repetition/boilerplate metrics (the Gopher /
    RefinedWeb repetition-filter family): ``n_toks``,
    ``distinct_token_ratio``, ``dup_ngram_frac`` (1 - distinct/total
    word n-grams) and ``top_ngram_frac`` (most frequent n-gram's share
    of all n-grams).  High dup/top fractions mark template or
    crawler-loop text that quality filters drop before training.

    Tokens are RAW lowercase whitespace pieces (repetition is a
    surface property — stopwords count, unlike the clean-token dedup
    pipeline).  Token-level stats are native array exprs (no shuffle);
    n-grams come from posexplode + (ngram-1) window leads — one
    id-keyed shuffle, each token touched once (the in-row
    transform-over-sequence alternative re-evaluates the token alias
    per element, the CollapseProject hazard documented in
    operators/decontam.py) — then per-(doc, gram) counts aggregate
    with map-side partial agg.  Ratios round to 6 decimals per the
    registry parity convention; documents with fewer than ``ngram``
    tokens report zero fractions.
    """
    from pyspark.sql import Window as W

    toks_expr = F.when(
        F.length(F.trim(F.col(text_col))) == 0,
        F.array().cast("array<string>"),
    ).otherwise(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
    toks = df.select(F.col(id_col), toks_expr.alias("__toks"))
    base = toks.select(
        F.col(id_col),
        F.size("__toks").alias("n_toks"),
        F.size(F.array_distinct("__toks")).alias("__n_distinct_toks"),
    )
    ex = toks.select(
        F.col(id_col), F.posexplode("__toks").alias("__p", "__t")
    )
    w = W.partitionBy(id_col).orderBy("__p")
    parts = [F.col("__t")] + [
        F.lead("__t", k).over(w) for k in range(1, ngram)
    ]
    grams = ex.select(
        F.col(id_col),
        F.when(
            F.lead("__t", ngram - 1).over(w).isNotNull(),
            F.concat_ws(" ", *parts),
        ).alias("__g"),
    ).filter(F.col("__g").isNotNull())
    gcnt = grams.groupBy(id_col, "__g").agg(F.count("*").alias("__c"))
    gstat = gcnt.groupBy(id_col).agg(
        F.sum("__c").alias("__n_grams"),
        F.count("*").alias("__n_distinct_grams"),
        F.max("__c").alias("__top_cnt"),
    )
    return (
        base.join(gstat, id_col, "left")
        .select(
            id_col,
            "n_toks",
            F.round(
                F.col("__n_distinct_toks")
                / F.greatest(F.col("n_toks"), F.lit(1)),
                6,
            ).alias("distinct_token_ratio"),
            F.round(
                (
                    F.coalesce(F.col("__n_grams"), F.lit(0))
                    - F.coalesce(F.col("__n_distinct_grams"), F.lit(0))
                )
                / F.greatest(F.coalesce(F.col("__n_grams"), F.lit(0)), F.lit(1)),
                6,
            ).alias("dup_ngram_frac"),
            F.round(
                F.coalesce(F.col("__top_cnt"), F.lit(0))
                / F.greatest(F.coalesce(F.col("__n_grams"), F.lit(0)), F.lit(1)),
                6,
            ).alias("top_ngram_frac"),
        )
    )


def compression_ratio(text_col: str) -> Column:
    """zlib compression ratio of the UTF-8 text — the Gopher/FineWeb
    repetitiveness signal q56's n-gram fractions approximate: highly
    compressible (low ratio) means template/boilerplate/repeated
    content, near-1.0 means high-entropy text.

    An Arrow-batched pandas UDF by necessity, not convenience: DEFLATE
    has no SQL form.  Level pinned to 6 so the byte count (and thus
    the round-6 ratio) is a pure function of the text; empty texts
    yield null (nothing to compress, not "perfectly compressible").
    Cost is one streaming pass per batch, no shuffle — the UDF slots
    into any projection.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _ratio(s):
        import zlib

        def one(t):
            if t is None:
                return None
            raw = t.encode("utf-8")
            if not raw:
                return None
            return round(len(zlib.compress(raw, 6)) / len(raw), 6)

        return s.map(one)

    return _ratio(F.col(text_col))
