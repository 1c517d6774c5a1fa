"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k (baseline; JVM-side
  zip_with/aggregate dot products, row_number top-k).
- lsh_topk: random-hyperplane (sign-LSH) bucketed approximate top-k —
  the scale path: candidates come from same-bucket collisions across
  a few hash tables, brute force runs only inside buckets.
- cosine_near_dup_pairs: embedding near-duplicate detection.

Hyperplanes are derived deterministically from a seed (numpy
Generator) and shipped as literal arrays — no driver-side collect of
data, only O(tables * bits * dim) constants.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def _dot(x: Column, y: Column) -> Column:
    return F.aggregate(
        F.zip_with(x, y, lambda a, b: a * b), F.lit(0.0), lambda acc, v: acc + v
    )


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    v = F.col(vec_col)
    return df.withColumn("__norm", F.sqrt(_dot(v, v)))


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """(query_id, cand_id, cos, rnk<=k) — exact baseline.

    The cross join is intentional and must stay bounded: use it for
    small query sets or inside LSH buckets; never all x all at scale.
    """
    qd = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.col("__norm").alias("__qn"),
    )
    cd = with_norm(candidates, vec_col).select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("__cv"),
        F.col("__norm").alias("__cn"),
    )
    sims = (
        qd.crossJoin(cd)
        .where(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            (_dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn"))).alias(
                "cos"
            ),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), "cand_id")
    return (
        sims.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)
    )


def hyperplane_buckets(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    bits: int = 8,
    tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """(id, table, bucket) sign-LSH bucket assignment.

    bucket = integer of sign bits of <v, h_i> for the table's
    hyperplanes.  Deterministic: hyperplanes from seeded Gaussian.
    """
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((tables, bits, dim))
    table_cols = []
    for t in range(tables):
        bit_terms = []
        for b in range(bits):
            h = F.array(*[F.lit(float(x)) for x in planes[t, b]])
            bit_terms.append(
                F.when(_dot(F.col(vec_col), h) >= 0, F.lit(1 << b)).otherwise(
                    F.lit(0)
                )
            )
        bucket = bit_terms[0]
        for term in bit_terms[1:]:
            bucket = bucket + term
        table_cols.append(
            F.struct(F.lit(t).alias("table"), bucket.cast("long").alias("bucket"))
        )
    return (
        df.select(id_col, vec_col, F.explode(F.array(*table_cols)).alias("tb"))
        .select(
            id_col,
            F.col("tb.table").alias("table"),
            F.col("tb.bucket").alias("bucket"),
        )
    )


def _bucket_candidate_sims(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    bits: int,
    tables: int,
    seed: int,
) -> DataFrame:
    """(query_id, cand_id, cos) for same-LSH-bucket pairs."""
    buckets = hyperplane_buckets(
        df, id_col, vec_col, dim=dim, bits=bits, tables=tables, seed=seed
    )
    a = buckets.select("table", "bucket", F.col(id_col).alias("query_id"))
    b = buckets.select("table", "bucket", F.col(id_col).alias("cand_id"))
    cands = (
        a.join(b, ["table", "bucket"])
        .where(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id")
        .distinct()
    )
    e = with_norm(df, vec_col).select(
        F.col(id_col), F.col(vec_col), F.col("__norm")
    )
    q = e.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.col("__norm").alias("__qn"),
    )
    c = e.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("__cv"),
        F.col("__norm").alias("__cn"),
    )
    return (
        cands.join(q, "query_id")
        .join(c, "cand_id")
        .select(
            "query_id",
            "cand_id",
            (_dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn"))).alias(
                "cos"
            ),
        )
    )


def lsh_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 5,
    bits: int = 8,
    tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: same-bucket candidates across tables, exact
    cosine only on candidates.  Work per table ~ sum over buckets of
    b² instead of n²."""
    sims = _bucket_candidate_sims(df, id_col, vec_col, dim, bits, tables, seed)
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), "cand_id")
    return sims.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= k
    )


def topk_recall(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 5,
    bits: int = 8,
    tables: int = 4,
    seed: int = 42,
) -> dict:
    """Recall@k of ``lsh_topk`` vs the exact ``brute_force_topk``
    ground truth, plus the candidate-volume cost that bought it.

    The dual-implementation cross-check the reference applies to its
    own pair generator (database/and_datasets.sql:81-105: SQL pair
    build vs python reimplementation compared row-for-row), applied to
    the ANN scale path: both sides already exist, the harness joins
    them.  Macro recall = mean over queries of
    |approx_topk ∩ exact_topk| / |exact_topk| — ties at the k
    boundary resolve identically on both sides (both order by
    (desc cos, cand_id)).

    Returns a small dict (one aggregate row collected — eval harness,
    not a pipeline stage): recall_at_k, n_queries,
    mean_candidates_per_query (the cost knob: exact work per query
    the LSH pass actually performed), bits, tables, k.

    The exact baseline is O(n²) — run this on a bounded eval corpus
    (the seeded clustered fixture or a sample), never the full table;
    at 100 TB recall is estimated on a seeded sample exactly as here.
    """
    exact = brute_force_topk(df, df, id_col, vec_col, k=k).select(
        "query_id", "cand_id"
    )
    approx = lsh_topk(
        df, id_col, vec_col, dim=dim, k=k, bits=bits, tables=tables, seed=seed
    ).select("query_id", "cand_id")
    hits = exact.join(approx, ["query_id", "cand_id"], "left_semi")
    per_q = (
        exact.groupBy("query_id")
        .agg(F.count("*").alias("__n_true"))
        .join(
            hits.groupBy("query_id").agg(F.count("*").alias("__n_hit")),
            "query_id",
            "left",
        )
        .select(
            (
                F.coalesce(F.col("__n_hit"), F.lit(0)) / F.col("__n_true")
            ).alias("__recall")
        )
    )
    # candidate volume: distinct same-bucket pairs across tables — the
    # number of exact cosine evaluations the LSH pass paid per query
    buckets = hyperplane_buckets(
        df, id_col, vec_col, dim=dim, bits=bits, tables=tables, seed=seed
    )
    a = buckets.select("table", "bucket", F.col(id_col).alias("query_id"))
    b = buckets.select("table", "bucket", F.col(id_col).alias("cand_id"))
    n_cands = (
        a.join(b, ["table", "bucket"])
        .where(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id")
        .distinct()
        .count()
    )
    row = per_q.agg(
        F.avg("__recall").alias("r"), F.count("*").alias("n")
    ).collect()[0]
    n_queries = int(row["n"]) or 1
    return {
        "recall_at_k": float(row["r"]) if row["r"] is not None else 0.0,
        "k": k,
        "bits": bits,
        "tables": tables,
        "n_queries": int(row["n"]),
        "mean_candidates_per_query": round(n_cands / n_queries, 2),
    }


def cosine_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    threshold: float = 0.95,
    bits: int = 8,
    tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id1<id2, cos>=threshold)
    via sign-LSH candidates + exact verification."""
    sims = _bucket_candidate_sims(df, id_col, vec_col, dim, bits, tables, seed)
    return (
        sims.where(
            (F.col("query_id") < F.col("cand_id"))
            & (F.col("cos") >= threshold)
        )
        .select(
            F.col("query_id").alias(f"{id_col}1"),
            F.col("cand_id").alias(f"{id_col}2"),
            "cos",
        )
    )


def _portable_plane_sign(t: int, b: int, d: int) -> int:
    """+1/-1 from md5 hex-char parity of "t_b_d" — reproducible in any
    engine with md5 (DuckDB: ascii(substr(md5(key),1,1)) % 2)."""
    import hashlib

    h = hashlib.md5(f"{t}_{b}_{d}".encode()).hexdigest()
    return 1 if ord(h[0]) % 2 == 0 else -1


def lsh_topk_portable(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 5,
    bits: int = 8,
    tables: int = 2,
    quant: int = 10_000,
) -> DataFrame:
    """Integer-exact sign-LSH top-k — the cross-engine value-checkable
    twin of ``lsh_topk`` (the q19-md5 / q32-portable pattern applied to
    ANN; the reference's dual-implementation pair check,
    database/and_datasets.sql:81-105).

    ``lsh_topk`` itself is float math: bucket bits come from the SIGN
    of a float dot product, so an independent implementation can flip
    a near-zero bit and produce a different (equally valid) candidate
    set — it can only ever be rows-only checked.  This twin removes
    every float from the *decision* path:

    - vectors quantize to ``floor(x * quant)`` int64 (floor, not
      round: round-half rules differ across engines);
    - hyperplanes are ±1 ints from md5 parity (`_portable_plane_sign`)
      — any engine reproduces them from the key string alone, no
      literal shipping needed on the SQL side;
    - bucket bits compare an INTEGER dot against 0 — no sign
      ambiguity;
    - in-bucket scores divide the int64 dot by
      sqrt(double(nn1) * double(nn2)) — identical int inputs, one
      correctly-rounded IEEE op sequence, identical doubles — and
      ranking breaks ties on (rounded cos DESC, cand_id).

    All int64-safe for |x| <= ~1e4 * quant at dim<=64 (dot <= 1e13).
    Plan shape is identical to ``lsh_topk``: per-table bucket map
    (narrow), self-join on (table, bucket), exact scoring only on
    candidates.
    """
    v = F.col(vec_col)
    ql = F.transform(v, lambda x: F.floor(x.cast("double") * F.lit(float(quant))))
    base = df.select(F.col(id_col), ql.alias("__q"))
    nn = F.aggregate(
        F.transform(F.col("__q"), lambda x: x * x),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    # no materialization: the quantize/norm map is a cheap stateless
    # projection, recomputing it per consumer beats storing n rows
    base = base.withColumn("__nn", nn)

    def int_dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    table_cols = []
    for t in range(tables):
        bucket = F.lit(0).cast("long")
        for b in range(bits):
            plane = F.array(
                *[F.lit(_portable_plane_sign(t, b, d)).cast("long") for d in range(dim)]
            )
            bucket = bucket + F.when(
                int_dot(F.col("__q"), plane) >= 0, F.lit(1 << b)
            ).otherwise(F.lit(0))
        table_cols.append(
            F.struct(F.lit(t).alias("table"), bucket.alias("bucket"))
        )
    buckets = base.select(
        id_col, F.explode(F.array(*table_cols)).alias("tb")
    ).select(id_col, F.col("tb.table").alias("table"), F.col("tb.bucket").alias("bucket"))

    a = buckets.select("table", "bucket", F.col(id_col).alias("query_id"))
    c = buckets.select("table", "bucket", F.col(id_col).alias("cand_id"))
    cands = (
        a.join(c, ["table", "bucket"])
        .where(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id")
        .distinct()
    )
    qs = base.select(
        F.col(id_col).alias("query_id"),
        F.col("__q").alias("__q1"),
        F.col("__nn").alias("__nn1"),
    )
    cs = base.select(
        F.col(id_col).alias("cand_id"),
        F.col("__q").alias("__q2"),
        F.col("__nn").alias("__nn2"),
    )
    scored = (
        cands.join(qs, "query_id")
        .join(cs, "cand_id")
        .select(
            "query_id",
            "cand_id",
            F.round(
                int_dot(F.col("__q1"), F.col("__q2"))
                / F.sqrt(
                    F.col("__nn1").cast("double") * F.col("__nn2").cast("double")
                ),
                9,
            ).alias("cos_r"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_r"), "cand_id")
    return scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= k
    )
