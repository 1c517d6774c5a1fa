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


def mutual_top1(
    sims: DataFrame,
    q_col: str = "query_id",
    c_col: str = "cand_id",
    score_col: str = "cos",
) -> DataFrame:
    """Mutual nearest-neighbor pairs: (a, b) survives iff b is a's
    best-scoring neighbor AND a is b's — the reciprocal-top-1 rule
    (the MNN anchor criterion of embedding-alignment literature,
    e.g. Haghverdi et al. 2018, and the highest-precision variant of
    nearest-neighbor dedup).  Where a one-directional top-1 links
    every record to SOMETHING (hubs collect spurious in-edges), the
    reciprocal requirement kills hub edges without any score
    threshold to tune.

    ``sims`` is any directed similarity table — exact bounded
    all-pairs (q22-style), LSH-bucket candidates (lsh_topk's
    candidate stage), or IVF candidates — so the precision rule
    composes with whichever candidate generator fits the scale.
    Top-1 per query is ONE window ordered by (score desc, cand id)
    (deterministic under exact float ties: both engines evaluate the
    same IEEE sums in the same order); mutuality is a self-join of
    the 1-row-per-node best table on the reversed key pair — at most
    |nodes| rows ever shuffle.

    Output: (id1, id2) with id1 < id2, column names taken from
    ``q_col``/``c_col`` with 1/2 suffixes.
    """
    w = W.partitionBy(q_col).orderBy(F.desc(score_col), c_col)
    best = (
        sims.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") == 1)
        .select(q_col, c_col)
    )
    rev = best.select(
        F.col(c_col).alias(q_col), F.col(q_col).alias(c_col)
    )
    return (
        best.join(rev, [q_col, c_col])
        .filter(F.col(q_col) < F.col(c_col))
        .select(
            F.col(q_col).alias(f"{q_col}1"),
            F.col(c_col).alias(f"{c_col}2"),
        )
    )


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


# ---------------------------------------------------------------------------
# IVF (inverted-file) coarse-quantizer ANN — the second scale path.
#
# Sign-LSH (above) needs no training but its recall/cost curve is fixed
# by (bits, tables); an IVF index trains nlist coarse centroids on a
# bounded sample, assigns every vector to its nearest list, and probes
# only nprobe lists per query — the FAISS IVF-Flat layout re-expressed
# as DataFrame ops: assignment/probing are NARROW whole-stage-codegen
# projections against literal centroid arrays (no shuffle, no UDF), and
# the only shuffle is the probe⋈list hash join + the per-query top-k
# window.  At 100 TB the centroid table stays O(nlist·dim) on the
# driver (index-build step, like FAISS training on a sample), lists are
# hash-partitioned by list_id, and per-list skew is bounded by k-means
# balance — the same plan shape the LSH path already proved out.
# ---------------------------------------------------------------------------


def train_ivf_centroids(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    sample_size: int = 2048,
    iters: int = 8,
    seed: int = 42,
) -> np.ndarray:
    """(nlist, dim) float64 k-means centroids from a DETERMINISTIC
    bounded sample (rows with the ``sample_size`` smallest
    xxhash64(id, seed) — a seeded uniform draw that any rerun
    reproduces), Lloyd-iterated on the driver.

    Driver-side by design: IVF coarse quantizers are trained on a
    sample everywhere (FAISS trains on ~256·nlist points), and
    O(sample·nlist·dim) numpy on ≤2048 points is microseconds — a
    distributed k-means here would be all overhead.  Empty clusters
    keep their previous centroid (Lloyd's standard degenerate-case
    rule), so the function is total for any nlist ≤ sample."""
    rows = (
        df.select(F.col(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)))
        .limit(sample_size)
        .collect()
    )
    x = np.asarray([r.v for r in rows], dtype=np.float64)
    if len(x) < nlist:
        raise ValueError(f"sample {len(x)} < nlist {nlist}")
    cents = x[:nlist].copy()
    for _ in range(iters):
        d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for j in range(nlist):
            members = x[assign == j]
            if len(members):
                cents[j] = members.mean(axis=0)
    return cents



def _ivf_candidate_sims(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    cents: np.ndarray,
    nprobe: int,
) -> DataFrame:
    """(query_id, cand_id, cos) for query-probes-candidate's-list
    pairs.  Assignment and probing go through a BROADCAST centroid
    DataFrame + explode-join + struct-min argmin (r06, VERDICT #6):
    the former literal-centroid expression array grew the plan
    O(nlist·dim) and was re-analyzed by the driver per execution; the
    join plan is O(1) expression nodes at any nlist.  Distances fold
    index-ascending exactly like the literal plan, so assignments are
    bit-identical."""
    v = F.col(vec_col).cast("array<double>")
    base = with_norm(df, vec_col).select(
        F.col(id_col), F.col(vec_col), F.col("__norm")
    )
    cdf = df.sparkSession.createDataFrame(
        [(j, [float(x) for x in cents[j]]) for j in range(len(cents))],
        "cid int, __qc array<double>",
    )
    d2 = F.aggregate(
        F.zip_with(v, F.col("__qc"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    # vector/norm carried through the aggregation via first() (all
    # rows of a group agree) — no join-backs, one exchange total
    per = (
        base.crossJoin(F.broadcast(cdf))
        .select(
            F.col(id_col), F.col(vec_col), F.col("__norm"),
            d2.alias("dist"), F.col("cid"),
        )
        .groupBy(id_col)
        .agg(
            F.first(vec_col).alias(vec_col),
            F.first("__norm").alias("__norm"),
            F.min(F.struct("dist", "cid")).alias("__mn"),
            F.slice(
                F.array_sort(F.collect_list(F.struct("dist", "cid"))),
                1,
                nprobe,
            ).alias("__pr"),
        )
    )
    assigned = per.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("__cv"),
        F.col("__norm").alias("__cn"),
        F.col("__mn.cid").alias("list_id"),
    )
    probes = per.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.col("__norm").alias("__qn"),
        F.explode(
            F.transform(F.col("__pr"), lambda e: e.getField("cid"))
        ).alias("list_id"),
    )
    return (
        probes.join(assigned, "list_id")
        .where(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            (
                _dot(F.col("__qv"), F.col("__cv"))
                / (F.col("__qn") * F.col("__cn"))
            ).alias("cos"),
        )
    )


def ivf_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    sample_size: int = 2048,
    iters: int = 8,
    seed: int = 42,
) -> DataFrame:
    """(query_id, cand_id, cos, rnk<=k) approximate top-k via a
    trained IVF index: exact cosine runs only on vectors in the
    query's ``nprobe`` nearest lists.

    Plan: one narrow projection computes the per-centroid distance
    struct array; ``array_min`` picks the home list (tie-break on
    centroid id — struct comparison is lexicographic) and
    ``slice(array_sort(...), 1, nprobe)`` the probe lists — both stay
    inside whole-stage codegen with zero shuffle.  Work per query ~
    nprobe/nlist of brute force.  Like ``lsh_topk`` this is float
    math (rows-only checkable); ``ivf_topk_portable`` is the
    integer-exact oracle twin, and ``ivf_recall`` measures what the
    approximation loses."""
    cents = train_ivf_centroids(
        df, id_col, vec_col, nlist=nlist, sample_size=sample_size,
        iters=iters, seed=seed,
    )
    sims = _ivf_candidate_sims(df, id_col, vec_col, cents, nprobe)
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), "cand_id")
    return sims.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= k
    )


def ivf_recall(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    seed: int = 42,
) -> dict:
    """Recall@k of ``ivf_topk`` vs exact brute force, plus the
    exact-evaluation volume the probes paid — the same
    dual-implementation harness as ``topk_recall`` (reference:
    database/and_datasets.sql:81-105) pointed at the IVF path.
    Bounded-corpus eval harness, not a pipeline stage."""
    exact = brute_force_topk(df, df, id_col, vec_col, k=k).select(
        "query_id", "cand_id"
    )
    cents = train_ivf_centroids(
        df, id_col, vec_col, nlist=nlist, seed=seed
    )
    sims = _ivf_candidate_sims(df, id_col, vec_col, cents, nprobe)
    n_cands = sims.count()
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), "cand_id")
    approx_pairs = (
        sims.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "cand_id")
    )
    hits = exact.join(approx_pairs, ["query_id", "cand_id"], "left_semi")
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
    row = per_q.agg(
        F.avg("__recall").alias("r"), F.count("*").alias("n")
    ).collect()[0]
    n_queries = int(row["n"]) or 1
    return {
        "recall_at_k": float(row["r"]) if row["r"] is not None else 0.0,
        "k": k,
        "nlist": nlist,
        "nprobe": nprobe,
        "n_queries": int(row["n"]),
        "mean_candidates_per_query": round(n_cands / n_queries, 2),
    }


def _int_dot_cols(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )



def ivf_topk_portable(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 2,
    quant: int = 10_000,
) -> DataFrame:
    """Integer-exact IVF top-k — the cross-engine value-checkable twin
    of ``ivf_topk`` (the q45 pattern applied to the IVF path).

    ``ivf_topk``'s k-means is float math: an independent engine can
    assign a near-boundary vector to a different (equally valid) list,
    so it is only rows-only checkable.  This twin removes every float
    from the decision path:

    - vectors quantize to ``floor(x * quant)`` int64 (floor, not
      round — round-half rules differ across engines);
    - centroids are DATA POINTS, not trained means: the ``nlist`` rows
      with the smallest ``(md5(cast(id as string)), id)`` — a seeded
      uniform draw any engine re-derives from the table alone (k-means
      init without Lloyd steps; FAISS's init sampling as the whole
      quantizer).  No centroid table ships to the oracle side;
    - assignment/probing rank INTEGER squared-L2 distances with
      ``(dist, centroid_id)`` tie-breaks (struct array_min /
      array_sort here ≡ ``row_number() OVER (ORDER BY dist, cid)``
      there);
    - in-list scores are the q45 integer-cosine: int64 dot /
      sqrt(double(nn1)*double(nn2)), rounded to 9 places, ranked by
      (cos_r DESC, cand_id).

    Plan shape is identical to ``ivf_topk``: narrow assignment/probe
    projections, one hash join on list_id, one per-query window.  The
    driver-side collect is ``nlist`` quantized vectors — the index
    build step, O(nlist·dim) like any IVF quantizer."""
    v = F.col(vec_col)
    ql = F.transform(v, lambda x: F.floor(x.cast("double") * F.lit(float(quant))))
    base = df.select(F.col(id_col), ql.alias("__q"))
    base = base.withColumn("__nn", _int_dot_cols(F.col("__q"), F.col("__q")))
    cent_rows = (
        base.orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(nlist)
        .select(id_col, "__q")
        .collect()
    )
    cents = [(int(r[id_col]), [int(x) for x in r["__q"]]) for r in cent_rows]
    # r06 (VERDICT #6, guide §3.3 plan size): centroids ride a
    # BROADCAST DataFrame + explode-join + struct-min argmin instead
    # of an nlist-literal expression array.  The literal plan embedded
    # nlist x dim unrolled (x-y)^2 terms (16k expression nodes at the
    # registered nlist=16, O(nlist·dim) growth), re-analyzed by the
    # single-threaded driver on EVERY execution; the join plan is
    # O(1) expression nodes at any nlist.  Values are identical:
    # zip_with folds index-ascending exactly like the literal fold,
    # min(struct(dist, cid)) is the same lexicographic comparison as
    # array_min over (dist, cid) structs, and
    # slice(array_sort(collect_list(...)), 1, nprobe) reproduces
    # slice(array_sort(entries), 1, nprobe) on the same integer
    # tuples.
    cdf = df.sparkSession.createDataFrame(
        cents, "cid long, __qc array<bigint>"
    )
    d2 = F.aggregate(
        F.zip_with(
            F.col("__q"), F.col("__qc"), lambda x, y: (x - y) * (x - y)
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    # carry the vector/norm THROUGH the argmin aggregation (first() is
    # deterministic here — every row of a group carries the same id-
    # derived value) instead of joining back to base: map-side partial
    # aggregation collapses the nlist fan-out before the exchange, so
    # the shuffle is one row per vector and the two join-back stages
    # (and their AQE round-trips) disappear
    dists = base.crossJoin(F.broadcast(cdf)).select(
        F.col(id_col), F.col("__q"), F.col("__nn"),
        d2.alias("dist"), F.col("cid"),
    )
    per = dists.groupBy(id_col).agg(
        F.first("__q").alias("__q"),
        F.first("__nn").alias("__nn"),
        F.min(F.struct("dist", "cid")).alias("__mn"),
        F.slice(
            F.array_sort(F.collect_list(F.struct("dist", "cid"))),
            1,
            nprobe,
        ).alias("__pr"),
    )
    assigned = per.select(
        F.col(id_col).alias("cand_id"),
        F.col("__q").alias("__q2"),
        F.col("__nn").alias("__nn2"),
        F.col("__mn.cid").alias("list_id"),
    )
    probes = per.select(
        F.col(id_col).alias("query_id"),
        F.col("__q").alias("__q1"),
        F.col("__nn").alias("__nn1"),
        F.explode(
            F.transform(F.col("__pr"), lambda e: e.getField("cid"))
        ).alias("list_id"),
    )
    scored = (
        probes.join(assigned, "list_id")
        .where(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(
                _int_dot_cols(F.col("__q1"), F.col("__q2"))
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


def semantic_dedup_portable(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    nlist: int = 16,
    threshold_num: int = 9,
    threshold_den: int = 10,
    quant: int = 1_000,
) -> DataFrame:
    """SemDeDup (Abbas et al., 2023): semantic deduplication by
    embedding similarity WITHIN k-means clusters — cluster the corpus
    coarsely, compare pairs only inside each cluster, drop the larger
    id of every pair whose cosine clears the threshold.  The
    embedding-space generalization of the reference's string-identity
    dedup (``database/and_datasets.sql:62-68`` canonical id1<id2
    pairing; same keep-smallest discipline as the exact-dedup family).

    Integer-exact like ``ivf_topk_portable`` so a DuckDB oracle can
    re-derive every verdict: vectors quantize to ``floor(x*quant)``
    int64, centroids are the ``nlist`` data points with the smallest
    ``(md5(id), id)``, assignment ranks INTEGER squared-L2 with
    ``(dist, cid)`` tie-breaks, and the cosine threshold is decided in
    integer arithmetic — ``cos >= p/q``  ⇔  ``dot >= 0  ∧
    q²·dot² >= p²·nn1·nn2`` — so no engine ever compares a float near
    the boundary (the q34-margin hazard designed out).  With
    ``quant=1000``, unit-scale vectors keep ``q²·dot²`` under 2^63 on
    the Spark side; DuckDB sums to HUGEINT.

    Output: one verdict row per vector — (id, cluster id, is_kept,
    dup_of) with ``dup_of`` the smallest same-cluster duplicate that
    evicted it (−1 when kept).

    Scale: ONE shuffle on the cluster id; the in-cluster self-join is
    quadratic in cluster size, which is SemDeDup's contract — size
    ``nlist ≈ n / target_cluster_size`` so clusters stay bounded (the
    paper uses 50k clusters for LAION-440M; same ratio here).  The
    driver-side collect is the nlist quantized centroids, O(nlist·dim)
    — the quantizer build, as in any IVF index."""
    v = F.col(vec_col)
    ql = F.transform(
        v, lambda x: F.floor(x.cast("double") * F.lit(float(quant)))
    )
    base = df.select(F.col(id_col), ql.alias("__q"))
    base = base.withColumn("__nn", _int_dot_cols(F.col("__q"), F.col("__q")))
    cent_rows = (
        base.orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(nlist)
        .select(id_col, "__q")
        .collect()
    )
    cents = [(int(r[id_col]), [int(x) for x in r["__q"]]) for r in cent_rows]
    # broadcast-DF + argmin assignment — same rewrite (and the same
    # value-identity argument) as ivf_topk_portable above
    cdf = df.sparkSession.createDataFrame(
        cents, "cid long, __qc array<bigint>"
    )
    d2 = F.aggregate(
        F.zip_with(
            F.col("__q"), F.col("__qc"), lambda x, y: (x - y) * (x - y)
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    assigned = (
        base.crossJoin(F.broadcast(cdf))
        .select(
            F.col(id_col), F.col("__q"), F.col("__nn"),
            d2.alias("dist"), F.col("cid"),
        )
        .groupBy(id_col)
        .agg(
            F.first("__q").alias("__q"),
            F.first("__nn").alias("__nn"),
            F.min(F.struct("dist", "cid")).alias("__mn"),
        )
        .select(
            F.col(id_col), "__q", "__nn",
            F.col("__mn.cid").alias("cid"),
        )
    )
    a = assigned.select(
        F.col(id_col).alias("id1"),
        F.col("__q").alias("q1"),
        F.col("__nn").alias("nn1"),
        "cid",
    )
    b = assigned.select(
        F.col(id_col).alias("id2"),
        F.col("__q").alias("q2"),
        F.col("__nn").alias("nn2"),
        "cid",
    )
    dot = _int_dot_cols(F.col("q1"), F.col("q2"))
    pairs = (
        a.join(b, "cid")
        .where(F.col("id1") < F.col("id2"))
        .select("id1", "id2", "nn1", "nn2", dot.alias("dot"))
    )
    p2 = threshold_num * threshold_num
    q2 = threshold_den * threshold_den
    dup = pairs.where(
        (F.col("nn1") > 0)
        & (F.col("nn2") > 0)
        & (F.col("dot") >= 0)
        & (
            F.lit(q2) * F.col("dot") * F.col("dot")
            >= F.lit(p2) * F.col("nn1") * F.col("nn2")
        )
    )
    dropped = dup.groupBy(F.col("id2").alias(id_col)).agg(
        F.min("id1").alias("__dup_of")
    )
    return (
        assigned.select(id_col, "cid")
        .join(dropped, id_col, "left")
        .select(
            F.col(id_col),
            F.col("cid"),
            F.col("__dup_of").isNull().cast("int").alias("is_kept"),
            F.coalesce(F.col("__dup_of"), F.lit(-1).cast("long")).alias(
                "dup_of"
            ),
        )
    )
