"""Text normalization: the signature-building core.

Rebuilds the reference's clean-text pipeline
(database/pubmed_inner_outer_feature.sql:2-93 — lower, strip
non-letters, squeeze spaces, drop short/stopword tokens, rejoin) and
the unicode->ASCII name fold (src/help/specifal_name_transformer.py:17-22)
as native Spark expressions plus one pandas UDF for the unicode fold.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Minimal stopword set, mirroring the reference's token-drop behavior
# (database/pubmed_inner_outer_feature.sql:9-36 drops a fixed list).
STOPWORDS = (
    "the a an and or of to in for on with at by from is are was were be "
    "been this that these those it its as not no"
).split()


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def normalize_text(c: Column | str) -> Column:
    """lower -> non-letters to space -> squeeze -> trim (pure native)."""
    c = _col(c)
    cleaned = F.regexp_replace(F.lower(c), "[^a-z0-9]+", " ")
    return F.trim(F.regexp_replace(cleaned, " +", " "))


def clean_tokens(c: Column | str, min_len: int = 3, drop_stopwords: bool = True) -> Column:
    """Tokenize normalized text into an array, dropping short tokens,
    pure numbers, and stopwords (reference clean_abstract semantics,
    database/pubmed_inner_outer_feature.sql:9-36)."""
    toks = F.split(normalize_text(c), " ")
    toks = F.filter(toks, lambda t: F.length(t) >= min_len)
    toks = F.filter(toks, lambda t: ~t.rlike("^[0-9]+$"))
    if drop_stopwords:
        sw = F.array(*[F.lit(s) for s in STOPWORDS])
        toks = F.filter(toks, lambda t: ~F.array_contains(sw, t))
    return toks


def shingles(c: Column | str, n: int = 3) -> Column:
    """Word n-gram shingle array over clean tokens (for MinHash-LSH
    blocking and n-gram Jaccard dedup).  Native: sequence + transform
    + slice + array_join, no Python.

    NOTE: prefer ``shingles_from_tokens(F.col("tokens"))`` on a
    materialized tokens column — passing raw text embeds the whole
    tokenization expression inside the per-shingle lambda, which
    whole-stage codegen re-evaluates per index (O(tokens²) per row).
    """
    return shingles_from_tokens(clean_tokens(c), n)


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Shingle array from an already-computed token array column."""
    cnt = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(cnt - n, F.lit(0)))
    sh = F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
    return F.when(cnt >= n, F.array_distinct(sh)).otherwise(
        F.when(cnt > 0, F.array(F.array_join(toks, " "))).otherwise(
            F.array().cast(T.ArrayType(T.StringType()))
        )
    )


def shingle_hashes_from_hash_seq(th: Column, n: int = 3) -> Column:
    """64-bit hashes of word n-gram shingles composed from a bound
    per-token hash-sequence COLUMN — never materializes shingle strings.

    Equivalent (modulo 2^-64 collisions) to
    ``transform(shingles_from_tokens(toks), xxhash64)``: the distinct
    set of window hashes is in bijection with the distinct shingle
    strings.

    ``th`` MUST be a materialized column attribute (e.g. built with
    ``withColumn('th', transform(tokens, xxhash64))``), NOT an inline
    expression: the lambda below references it 3x per window, and
    CollapseProject would otherwise re-evaluate the whole token-hash
    construction per reference — O(tokens²) per row (measured 3x stage
    slowdown at 33M turns).
    """
    cnt = F.size(th)
    idx = F.sequence(F.lit(0), F.greatest(cnt - n, F.lit(0)))
    win = F.transform(
        idx,
        lambda i: F.xxhash64(*[F.element_at(th, i + k + 1) for k in range(n)]),
    )
    return (
        F.when(cnt >= n, F.array_sort(F.array_distinct(win)))
        .when(cnt > 0, F.array(F.xxhash64(th)))
        .otherwise(F.array().cast(T.ArrayType(T.LongType())))
    )


@F.pandas_udf(T.StringType())
def ascii_fold_udf(s: pd.Series) -> pd.Series:
    """NFD-normalize, strip combining marks, lowercase.

    Rebuild of src/help/specifal_name_transformer.py:17-22, batched via
    Arrow instead of the reference's per-shard Python loop (:33-60).
    """

    def fold(x: str | None) -> str | None:
        if x is None:
            return None
        return (
            unicodedata.normalize("NFD", x)
            .encode("ascii", "ignore")
            .decode("ascii")
            .lower()
        )

    return s.map(fold)
