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

from pyspark.sql import Column, DataFrame, Window
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


def bit_majority_hash(
    hashed: DataFrame,
    id_col: str,
    hash_col: str,
    bits: int = 64,
    out_col: str = "simhash",
) -> DataFrame:
    """(id, simhash): SimHash bit-majority over per-(id, token) hash
    rows — ONE groupBy with ``bits`` conditional-sum columns.

    The naive plan explodes every hash row into ``bits`` (id, bit)
    rows before aggregating — a ``bits``x row multiplication feeding
    TWO shuffles.  Here each bit is a conditional sum over the same
    rows (sum(when(bit set, 1).otherwise(-1))), all computed in one
    map-side-partial-agg pass; the shuffle carries one ``bits``-column
    row per id and the bit pattern is assembled with a bitwise-OR fold
    (no integer-overflow concern at bit 63)."""
    import functools

    h = F.col(hash_col)
    scores = hashed.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(h.bitwiseAND(F.expr(f"shiftleft(1L, {i})")) != 0, 1)
                .otherwise(-1)
            ).alias(f"__b{i}")
            for i in range(bits)
        ]
    )
    terms = [
        F.when(F.col(f"__b{i}") > 0, F.expr(f"shiftleft(1L, {i})")).otherwise(
            F.lit(0).cast("long")
        )
        for i in range(bits)
    ]
    pattern = functools.reduce(lambda x, y: x.bitwiseOR(y), terms)
    return scores.select(F.col(id_col), pattern.alias(out_col))


def simhash64(df: DataFrame, id_col: str, token_col: str) -> DataFrame:
    """64-bit SimHash per doc from xxhash64 token hashes (engine-native
    fast path; simhash64_portable is the md5 oracle-checkable twin)."""
    ex = df.select(
        F.col(id_col), F.explode(F.array_distinct(F.col(token_col))).alias("tok")
    ).select(F.col(id_col), F.xxhash64("tok").alias("h"))
    return bit_majority_hash(ex, id_col, "h", bits=64, out_col="simhash")


def simhash64_portable(df: DataFrame, id_col: str, token_col: str) -> DataFrame:
    """(id, sh_hi, sh_lo): 64-bit SimHash from md5-derived token
    hashes, split into two NON-NEGATIVE 32-bit halves.

    Portable across engines: md5 is bit-identical everywhere, and the
    hi/lo split keeps every value in [0, 2^32) so a DuckDB oracle can
    reproduce it without 64-bit shift overflow (DuckDB's BIGINT <<
    raises on overflow where Spark's shiftleft wraps).  Token hash =
    first 16 hex chars of md5(tok): hi = chars 1-8, lo = chars 9-16."""
    toks = df.select(
        F.col(id_col), F.explode(F.array_distinct(F.col(token_col))).alias("tok")
    )
    # vocabulary-hash join: md5 computed once per distinct token, not
    # once per (doc, token) occurrence; AQE broadcasts when it fits.
    vocab = toks.select("tok").distinct().select(
        "tok",
        F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long").alias("__hi"),
        F.conv(F.substring(F.md5("tok"), 9, 8), 16, 10).cast("long").alias("__lo"),
    )
    ex = toks.join(vocab, "tok")
    # ONE aggregation pass: 64 conditional sums (32 per half) on the
    # same rows — no bit explode, no second groupBy/join.
    import functools

    aggs = []
    for half, col in (("hi", "__hi"), ("lo", "__lo")):
        c = F.col(col)
        aggs += [
            F.sum(
                F.when(c.bitwiseAND(F.expr(f"shiftleft(1L, {i})")) != 0, 1)
                .otherwise(-1)
            ).alias(f"__{half}{i}")
            for i in range(32)
        ]
    scores = ex.groupBy(id_col).agg(*aggs)

    def pattern(half: str):
        terms = [
            F.when(
                F.col(f"__{half}{i}") > 0, F.expr(f"shiftleft(1L, {i})")
            ).otherwise(F.lit(0).cast("long"))
            for i in range(32)
        ]
        return functools.reduce(lambda x, y: x.bitwiseOR(y), terms)

    return scores.select(
        F.col(id_col), pattern("hi").alias("sh_hi"), pattern("lo").alias("sh_lo")
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


def simhash_near_dups_portable(
    df: DataFrame,
    id_col: str,
    token_col: str,
    max_hamming: int = 3,
    max_block_size: int | None = None,
) -> DataFrame:
    """64-bit SimHash near-dup pairs on the PORTABLE md5 hash
    (simhash64_portable) — the value-checkable twin of
    simhash_near_dups, same pigeonhole band blocking.

    Bands are 4 x 16-bit slices of the hi/lo halves (max_hamming=3 ->
    4 bands: any pair within Hamming 3 agrees exactly on >=1 band);
    Hamming distance = bit_count(hi1^hi2) + bit_count(lo1^lo2)."""
    assert max_hamming == 3, "portable variant is fixed at 4x16-bit bands"
    sh = simhash64_portable(df, id_col, token_col)
    mask = (1 << 16) - 1
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.expr(expr).cast("long").alias("band_key"),
        )
        for b, expr in enumerate(
            [
                f"sh_lo & {mask}",
                f"(sh_lo >> 16) & {mask}",
                f"sh_hi & {mask}",
                f"(sh_hi >> 16) & {mask}",
            ]
        )
    ]
    bands = sh.select(
        id_col, "sh_hi", "sh_lo",
        F.explode(F.array(*band_structs)).alias("bb"),
    ).select(
        id_col, "sh_hi", "sh_lo",
        F.col("bb.band").alias("band"), F.col("bb.band_key").alias("band_key"),
    )
    if max_block_size is not None:
        sizes = bands.groupBy("band", "band_key").agg(F.count("*").alias("__bs"))
        bands = bands.join(
            sizes.filter(F.col("__bs") <= max_block_size), ["band", "band_key"]
        ).drop("__bs")
    a = bands.select(
        "band", "band_key",
        F.col(id_col).alias(f"{id_col}1"),
        F.col("sh_hi").alias("hi1"), F.col("sh_lo").alias("lo1"),
    )
    b2 = bands.select(
        "band", "band_key",
        F.col(id_col).alias(f"{id_col}2"),
        F.col("sh_hi").alias("hi2"), F.col("sh_lo").alias("lo2"),
    )
    cands = (
        a.join(b2, ["band", "band_key"])
        .where(F.col(f"{id_col}1") < F.col(f"{id_col}2"))
        .select(f"{id_col}1", f"{id_col}2", "hi1", "lo1", "hi2", "lo2")
        .distinct()
    )
    ham = (
        F.bit_count(F.expr("hi1 ^ hi2")) + F.bit_count(F.expr("lo1 ^ lo2"))
    ).cast("int")
    return (
        cands.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select(f"{id_col}1", f"{id_col}2", "hamming")
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """(id, fp) — winnowing document fingerprints (Schleimer et al.,
    SIGMOD'03; the MOSS local fingerprinting scheme).

    Pipeline per document, all native higher-order array exprs (no
    Python, no shuffle until the caller aggregates):

      ordered clean tokens -> ordered word k-gram hashes (md5 of the
      joined k-gram: the q19-md5 portable hash space, so any engine
      reproduces the exact fingerprint set) -> sliding window of w
      consecutive hashes, keep each window's MINIMUM -> distinct kept
      hashes are the document's fingerprints.

    Unlike whole-document hashing (exact_dedup / q17) these are LOCAL
    fingerprints: any shared token run of length >= w+k-1 between two
    documents yields at least one shared fingerprint (the winnowing
    guarantee), while only ~2/(w+1) of all k-gram hashes are kept.
    Shorter docs degrade gracefully: fewer than w windows -> one
    global-min fingerprint; fewer than k tokens -> one whole-doc gram;
    empty -> no rows.

    Scale: per-row O(tokens * w) compute inside whole-stage codegen,
    output ~2/(w+1) * tokens rows per doc.  The token and hash arrays
    are materialized as column attributes between selects so
    CollapseProject cannot inline the construction into each lambda
    reference (the O(tokens^2) trap documented at
    functions/normalize.shingle_hashes_from_hash_seq).
    """
    from pubmed_and_method_spark.functions.normalize import clean_tokens

    toks = df.select(
        F.col(id_col), clean_tokens(text_col).alias("__toks")
    )
    cnt = F.size("__toks")
    gram = F.transform(
        F.sequence(F.lit(0), cnt - k),
        lambda i: F.md5(F.array_join(F.slice("__toks", i + 1, k), " ")),
    )
    hashed = toks.select(
        F.col(id_col),
        F.when(cnt >= k, gram)
        .when(cnt > 0, F.array(F.md5(F.array_join("__toks", " "))))
        .otherwise(F.array().cast("array<string>"))
        .alias("__hs"),
    )
    m = F.size("__hs")
    wins = F.transform(
        F.sequence(F.lit(0), m - w),
        lambda j: F.array_min(F.slice("__hs", j + 1, w)),
    )
    fps = hashed.select(
        F.col(id_col),
        F.when(m >= w, wins)
        .when(m > 0, F.array(F.array_min("__hs")))
        .otherwise(F.array().cast("array<string>"))
        .alias("__wm"),
    )
    return fps.select(
        F.col(id_col), F.explode(F.array_distinct("__wm")).alias("fp")
    )


def winnow_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    w: int = 4,
    min_shared: int = 2,
    max_doc_freq: int = 50,
) -> DataFrame:
    """(id1, id2, n_shared) — near-duplicate pairs by shared winnowing
    fingerprints, via an inverted index (fp -> docs) self-join.

    The scale contract mirrors the MinHash band join: pair volume is
    sum over fingerprints of df^2, so fingerprints appearing in more
    than ``max_doc_freq`` documents are dropped BEFORE the self-join
    (boilerplate/template grams — the standard df-cap; at 100 TB this
    cap is what keeps the join from going quadratic on a boilerplate
    gram shared by millions of docs).  The drop is reported honestly
    by the count of capped fingerprints in the plan, not silently:
    callers that need the hot grams can raise the cap.
    """
    fps = winnow_fingerprints(df, id_col, text_col, k=k, w=w)
    freq = fps.groupBy("fp").agg(F.count("*").alias("__df"))
    rare = freq.filter(F.col("__df") <= max_doc_freq).select("fp")
    # pin the inverted-index partitioning: the pair fan-out below is
    # compute-heavy but byte-tiny on small corpora, and AQE's
    # byte-based coalescing otherwise runs it as ONE task (measured
    # ~3 s single-task stages inside q57); repartitioning `kept` once
    # also co-partitions both self-join sides (no further exchange)
    n_shuffle = int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    kept = fps.join(rare, "fp").repartition(n_shuffle, "fp")
    a = kept.select("fp", F.col(id_col).alias(f"{id_col}1"))
    b = kept.select("fp", F.col(id_col).alias(f"{id_col}2"))
    return (
        a.join(b, "fp")
        .where(F.col(f"{id_col}1") < F.col(f"{id_col}2"))
        .groupBy(f"{id_col}1", f"{id_col}2")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    min_count: int = 2,
) -> DataFrame:
    """(id, span_start, span_end, span_len, n_dup_grams) — exact
    duplicated-substring SPANS, the Lee et al. (ACL'22,
    "Deduplicating Training Data Makes Language Models Better")
    ExactSubstr semantics re-expressed as DataFrame ops: a token
    k-gram that occurs >= ``min_count`` times in the whole corpus is a
    duplicated gram, and overlapping/adjacent duplicated grams within
    a document merge into maximal spans (1-based token offsets,
    inclusive).

    Where q17 (whole-doc hash) finds identical DOCUMENTS and q46/q47
    (winnowing) find documents sharing passages, this finds the
    passage EXTENTS themselves — the actual byte ranges a training-
    data pipeline cuts out, boilerplate headers included, without the
    suffix array: at web scale the suffix array's global sort is
    replaced by one k-gram frequency shuffle.

    Plan (three shuffles, all on narrow rows):
      1. per-doc ordered clean tokens posexploded to rows, then
         k-grams built by a (doc, pos) window with k-1 ``lead``s —
         NOT by an array ``transform`` with ``slice`` in the lambda:
         CollapseProject inlines the tokenization expression into
         such a lambda and codegen re-evaluates it per gram index
         (measured 4x on sf0.1), and the whole quadratic build would
         run in the scan's partitioning BEFORE any exchange; the
         window form tokenizes once per doc, builds each gram from
         its own row, and runs AFTER the doc-key exchange (full
         parallelism whatever the file layout);
      2. gram frequency groupBy (map-side partial agg; 16-byte-ish
         keys) -> grams with total count >= min_count;
      3. semi-join positions against duplicated grams, then per-doc
         window: with fixed gram length the interval ends are
         monotone in the starts, so a new span begins exactly where
         ``pos - lag(pos) > k`` (no running-max needed) and a
         cumulative sum numbers the spans; one (doc, span) groupBy
         summarizes (reuses the window's hash partitioning).

    Everything is integer/md5 arithmetic — the q78 DuckDB oracle
    re-derives every gram, frequency, and span boundary exactly.  A
    boilerplate gram shared by millions of docs costs ONE frequency
    row here (unlike the pair self-join in winnow_near_dup_pairs,
    which caps it) — span detection never joins doc-to-doc.
    """
    from pubmed_and_method_spark.functions.normalize import clean_tokens

    toks = df.select(
        F.col(id_col), clean_tokens(text_col).alias("__toks")
    )
    cnt = F.size("__toks")
    tok_rows = toks.where(cnt >= k).select(
        F.col(id_col),
        cnt.alias("__n"),
        F.posexplode("__toks").alias("__p0", "__t"),
    )
    w_tok = Window.partitionBy(id_col).orderBy("__p0")
    gram = F.md5(
        F.concat_ws(
            " ",
            F.col("__t"),
            *[F.lead("__t", j).over(w_tok) for j in range(1, k)],
        )
    )
    pos_grams = (
        tok_rows.withColumn("gram", gram)
        # the last k-1 positions have no full gram (their leads are
        # null and concat_ws would silently SHORTEN the gram) — the
        # filter drops them before anything consumes the hash
        .filter(F.col("__p0") <= F.col("__n") - k)
        .select(
            F.col(id_col),
            (F.col("__p0") + 1).alias("pos"),
            "gram",
        )
    )
    dup_grams = (
        pos_grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= min_count)
        .select("gram")
    )
    dup_pos = pos_grams.join(dup_grams, "gram", "left_semi")
    w = Window.partitionBy(id_col).orderBy("pos")
    spans = (
        dup_pos.withColumn(
            "__brk",
            F.when(
                F.lag("pos").over(w).isNull()
                | (F.col("pos") - F.lag("pos").over(w) > k),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "__span",
            F.sum("__brk").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy(id_col, "__span")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + k - 1).alias("span_end"),
            F.count(F.lit(1)).alias("n_dup_grams"),
        )
    )
    return spans.select(
        F.col(id_col),
        "span_start",
        "span_end",
        (F.col("span_end") - F.col("span_start") + 1).alias("span_len"),
        "n_dup_grams",
    )


def dedup_retention(
    df: DataFrame,
    cluster_col: str,
    id_col: str,
    score_col: str,
) -> DataFrame:
    """Retention policy over dedup clusters: keep ONE survivor per
    cluster — the highest-``score_col`` member, ties to the smallest
    id — and tag every other member with the survivor it duplicates.

    The step every training-data dedup pipeline runs after clustering
    (Dolma/FineWeb-style "keep the best representative"): clustering
    says WHICH docs are the same; this decides WHICH COPY survives,
    by quality rather than the arbitrary min-id convention of
    ``exact_dedup``.  Keep ``score_col`` INTEGER (e.g. a token/punct
    blend) for exact cross-engine argmax parity.

    Output = (``id_col``, ``cluster_col``, ``score_col``, ``kept``
    0/1, ``kept_doc``).  Scale shape: ONE partial-aggregable
    min-struct shuffle on the cluster key + one hash join back on the
    same key (co-partitioned — AQE reuses the exchange); no windows
    over the corpus, no driver state.
    """
    win = df.groupBy(cluster_col).agg(
        F.min(
            F.struct(
                (-F.col(score_col)).alias("negs"),
                F.col(id_col).alias("id"),
            )
        )["id"].alias("kept_doc")
    )
    return df.join(win, cluster_col).select(
        id_col,
        cluster_col,
        score_col,
        (F.col(id_col) == F.col("kept_doc")).cast("int").alias("kept"),
        "kept_doc",
    )
