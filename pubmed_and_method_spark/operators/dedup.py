"""Deduplication family: exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Each returns either a per-doc key table (exact/simhash) or a candidate
/confirmed pair table (LSH/jaccard/cosine).  All native exprs; the
only shuffles are the groupBys/joins that the algorithm itself
requires.  At 100 TB the pattern per operator:

- exact:   one shuffle on the 16-byte fingerprint (tiny rows).
- minhash: shuffle one row per (doc, band) — k mins computed map-side.
- simhash: vocabulary-hash broadcast join + one groupBy.
- jaccard: verify only LSH candidates, never all pairs.
- cosine:  LSH/bucket the vectors first; brute force only in-bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pubmed_and_method_spark.operators.blocking import lsh_candidate_pairs
from pubmed_and_method_spark.operators.text import fingerprint


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(fingerprint, rep_id, n_dups, ids) — hash-groupBy exact dedup.
    Representative = min id (deterministic)."""
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("rep_id"),
            F.count("*").alias("n_dups"),
        )
    )


def exact_dup_assignments(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, rep_id): every doc mapped to its exact-dup representative."""
    fp = df.select(F.col(id_col), fingerprint(text_col).alias("fingerprint"))
    reps = fp.groupBy("fingerprint").agg(F.min(id_col).alias("rep_id"))
    return fp.join(reps, "fingerprint").select(id_col, "rep_id")


def minhash_dedup_candidates(
    df: DataFrame,
    id_col: str,
    shingle_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    num_buckets: int = 1,
) -> DataFrame:
    """MinHash+LSH banded candidate pairs (xxhash64 fast path)."""
    return lsh_candidate_pairs(
        df, id_col, shingle_col, num_hashes=num_hashes, bands=bands,
        num_buckets=num_buckets,
    )


def jaccard_verify(
    candidates: DataFrame,
    df: DataFrame,
    id_col: str,
    token_col: str,
    threshold: float = 0.8,
) -> DataFrame:
    """Verify candidate pairs with true token Jaccard; keep >= threshold.
    The LSH->verify two-phase shape: exact O(n²) work never happens."""
    t = df.select(F.col(id_col), F.array_distinct(F.col(token_col)).alias("__t"))
    a = t.select(F.col(id_col).alias(f"{id_col}1"), F.col("__t").alias("__t1"))
    b = t.select(F.col(id_col).alias(f"{id_col}2"), F.col("__t").alias("__t2"))
    joined = candidates.join(a, f"{id_col}1").join(b, f"{id_col}2")
    inter = F.size(F.array_intersect("__t1", "__t2"))
    union = F.size("__t1") + F.size("__t2") - inter
    jac = F.when(union > 0, inter * 1.0 / union).otherwise(F.lit(0.0))
    return (
        joined.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select(f"{id_col}1", f"{id_col}2", "jaccard")
    )


def simhash64(df: DataFrame, id_col: str, token_col: str) -> DataFrame:
    """64-bit SimHash per doc from xxhash64 token hashes.

    Bit-majority via explode x 64 — at scale prefer the vocabulary
    broadcast (queries.q20 shows the md5-portable variant)."""
    ex = df.select(
        F.col(id_col), F.explode(F.array_distinct(F.col(token_col))).alias("tok")
    ).select(F.col(id_col), F.xxhash64("tok").alias("h"))
    bits = ex.select(
        id_col, F.explode(F.sequence(F.lit(0), F.lit(63))).alias("bit"), "h"
    ).groupBy(id_col, "bit").agg(
        F.sum(F.when(F.expr("(h >> bit) & 1") == 1, 1).otherwise(-1)).alias(
            "score"
        )
    )
    return bits.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("score") > 0, F.expr("shiftleft(1L, bit)")).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("simhash")
    )


def simhash_near_dups(
    df: DataFrame,
    id_col: str,
    token_col: str,
    max_hamming: int = 3,
    max_block_size: int | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming.

    Blocking: split the 64-bit hash into (max_hamming+1) bands — by
    pigeonhole any pair within the distance agrees exactly on at least
    one band, so candidate generation is a band-key self-join (never
    all-pairs).  Verify with bit_count(xor).

    ``max_block_size`` caps a band bucket's membership before the
    self-join (a degenerate bucket — e.g. thousands of identical
    simhashes — goes quadratic otherwise).  Pairs dropped from an
    oversized bucket can still surface via their other bands."""
    nb = max_hamming + 1
    width = 64 // nb
    sh = simhash64(df, id_col, token_col)
    bands = sh.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.expr(
                            f"(simhash >> {b * width}) & {(1 << width) - 1}"
                        ).alias("band_key"),
                    )
                    for b in range(nb)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "simhash", F.col("bb.band").alias("band"), F.col("bb.band_key").alias("band_key"))
    if max_block_size is not None:
        sizes = bands.groupBy("band", "band_key").agg(F.count("*").alias("__bs"))
        bands = bands.join(
            sizes.filter(F.col("__bs") <= max_block_size), ["band", "band_key"]
        ).drop("__bs")
    a = bands.select(
        "band", "band_key",
        F.col(id_col).alias(f"{id_col}1"), F.col("simhash").alias("sh1"),
    )
    b2 = bands.select(
        "band", "band_key",
        F.col(id_col).alias(f"{id_col}2"), F.col("simhash").alias("sh2"),
    )
    cands = (
        a.join(b2, ["band", "band_key"])
        .where(F.col(f"{id_col}1") < F.col(f"{id_col}2"))
        .select(f"{id_col}1", f"{id_col}2", "sh1", "sh2")
        .distinct()
    )
    ham = F.bit_count(F.expr("sh1 ^ sh2"))
    return (
        cands.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select(f"{id_col}1", f"{id_col}2", "hamming")
    )
