"""Blocking + candidate pair generation — the O(N²) -> Σ O(b²) move.

Rebuilds the reference's within-namespace pairing
(database/and_datasets.sql:56-68: groupArray -> arrayMap cross product
-> canonicalize x>y?y:x -> arrayDistinct) WITHOUT ever collecting a
block into one array: at 10^12-turn scale a hot block
(>1000 members, reference README.md:3) must never land in one task.

Two scale mechanisms:

1. **Triangle-split salting** (generate_pairs): members of a block are
   hashed into ``s`` buckets; every unordered bucket pair (i,j) i<=j
   becomes an independent join task keyed (block, i, j).  A block of
   n rows is processed by s(s+1)/2 tasks of ~(n/s)² work instead of
   one n² task.  Each unordered member pair appears in exactly one
   task, so no dedup shuffle is needed afterwards.
2. **AQE skew-join splitting** stays enabled as backstop (session.py).

Plus MinHash-LSH as blocking pass 2 (north-star: "MinHash-LSH on
token shingles") built from native exprs only: explode -> k seeded
xxhash64 mins (map-side partial agg) -> banded bucket keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def block_commonness(
    members: DataFrame, key_col: str = "block_key"
) -> DataFrame:
    """Blocking-key frequency + normalized ambiguity score.

    Analog of and.lastname_firat_initial_commonness
    (database/model_building_using_rich_features.sql:438-448) and
    ambiguity_score = commonness / sum(commonness)
    (database/pubmed_inner_outer_feature.sql:112-113).  The scalar
    total is a single-row broadcast cross join — no driver collect.
    """
    counts = members.groupBy(key_col).agg(F.count("*").alias("commonness"))
    total = counts.agg(F.sum("commonness").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn(
            "ambiguity_score", (F.col("commonness") / F.col("__total")).cast("double")
        )
        .drop("__total")
    )


def generate_pairs(
    members: DataFrame,
    key_col: str = "block_key",
    id_col: str = "mention_id",
    num_buckets: int = 1,
    max_block_size: int | None = None,
    carry_cols: tuple[str, ...] = (),
    adaptive_target: int | None = None,
    max_salt: int = 1024,
    pin_salted_shuffle: bool = False,
) -> DataFrame:
    """All unordered pairs within each block, canonical id1 < id2.

    ``num_buckets`` = s enables triangle-split salting (s=1 is a plain
    skew-join-assisted self-join).  ``max_block_size`` drops blocks
    larger than the cap before pairing (hot-row control, analog of
    ``length(authors_list_raw) < 50`` at
    database/link_pubmed_to_aminer_amg_s2.sql:342-343).

    ``adaptive_target`` (overrides ``num_buckets``): derive the salt
    PER BLOCK from its size — s_b = ceil(n_b / target), clamped to
    ``max_salt`` — so typical blocks (n_b <= target) skip the ~2x
    replication overhead of salting entirely (s_b=1 takes the plain
    single-task path) while a hot block gets quadratically many tasks
    of ~target² work each.  A global s must be sized for the WORST
    block and taxes every block with it (BENCH.md hot-block table:
    s=8 costs ~1.7x on uniform blocks); per-block s pays only where
    skew exists.  Only oversized blocks (n_b > target) ride the
    broadcast — at reference scale ~5.8M namespaces but few hot ones
    (README.md:3), so the broadcast stays tiny.

    Output: (block_key, id1, id2[, carry1..., carry2...]).
    """
    m = members.select(key_col, id_col, *carry_cols)
    sizes = None
    if max_block_size is not None:
        # one sizes aggregation serves BOTH the cap filter and the
        # adaptive-salt hot-block detection below (r06): the cap
        # filter doesn't change surviving keys' counts, so the
        # filtered sizes ARE the capped table's sizes — the second
        # full groupBy over the member table was pure recompute
        sizes = (
            m.groupBy(key_col)
            .agg(F.count("*").alias("__bs"))
            .filter(F.col("__bs") <= max_block_size)
        )
        m = m.join(F.broadcast(sizes.select(key_col)), key_col)

    def side(alias: str) -> DataFrame:
        cols = [F.col(id_col).alias(f"{id_col}{alias}")] + [
            F.col(c).alias(f"{c}{alias}") for c in carry_cols
        ]
        return m.select(key_col, *cols)

    if adaptive_target is None and num_buckets <= 1:
        # Pin the self-join's partitioning to the session's shuffle
        # parallelism: block pairing is compute-heavy per row but tiny
        # in bytes on small corpora, and AQE's byte-based coalescing
        # otherwise collapses the exchange to ONE partition and runs
        # the whole quadratic fan-out serially (measured: q28's band
        # join as a single 6 s task at local[32]).  Repartitioning the
        # member table once also co-partitions both join sides, so the
        # join itself adds no exchange (one shuffle instead of two).
        n_shuffle = int(
            m.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
        m = m.repartition(n_shuffle, key_col)
        left, right = side("1"), side("2")
        pairs = left.join(right, key_col).where(
            F.col(f"{id_col}1") < F.col(f"{id_col}2")
        )
    else:
        if adaptive_target is not None:
            # per-block salt: 1 for blocks at/below the target (left
            # join misses -> coalesce), ceil(n/target) for hot blocks;
            # reuse the cap pass's sizes when it ran (same counts)
            hot_sizes = (
                sizes
                if sizes is not None
                else m.groupBy(key_col).agg(F.count("*").alias("__bs"))
            )
            hot = (
                hot_sizes.filter(F.col("__bs") > adaptive_target)
                .select(
                    key_col,
                    F.least(
                        F.ceil(F.col("__bs") / adaptive_target).cast("int"),
                        F.lit(max_salt),
                    ).alias("__s"),
                )
            )
            bucketed = (
                m.join(F.broadcast(hot), key_col, "left")
                .withColumn("__s", F.coalesce("__s", F.lit(1)))
            )
        else:
            bucketed = m.withColumn("__s", F.lit(num_buckets))
        bucketed = bucketed.withColumn(
            "__b",
            F.pmod(F.xxhash64(F.col(id_col)), F.col("__s")).cast("int"),
        )
        # left replicates into tasks (b, j) for j >= b;
        # right replicates into tasks (i, b) for i <= b.
        left = (
            bucketed.withColumn(
                "__t", F.explode(F.sequence(F.col("__b"), F.col("__s") - 1))
            )
            .select(
                key_col,
                F.col("__b").alias("__ti"),
                F.col("__t").alias("__tj"),
                *[F.col(c).alias(f"{c}1") for c in (id_col, *carry_cols)],
            )
        )
        right = (
            bucketed.withColumn(
                "__t", F.explode(F.sequence(F.lit(0), F.col("__b")))
            )
            .select(
                key_col,
                F.col("__t").alias("__ti"),
                F.col("__b").alias("__tj"),
                *[F.col(c).alias(f"{c}2") for c in (id_col, *carry_cols)],
            )
        )
        if pin_salted_shuffle:
            # Opt-in for byte-tiny but compute-heavy corpora: AQE's
            # byte-based coalescing otherwise merges the salted tasks
            # back into one partition, undoing the split (measured:
            # q19's salted join serialized to one task).  Off by
            # default: at real scale the salted shuffle is byte-heavy,
            # AQE never coalesces it, and its skew-split backstop
            # stays available.
            n_shuffle = int(
                m.sparkSession.conf.get(
                    "spark.sql.shuffle.partitions", "200"
                )
            )
            left = left.repartition(n_shuffle, key_col, "__ti", "__tj")
            right = right.repartition(n_shuffle, key_col, "__ti", "__tj")
        joined = left.join(right, [key_col, "__ti", "__tj"])
        same_bucket = F.col("__ti") == F.col("__tj")
        # same-bucket tasks see both orders -> keep id1<id2;
        # cross-bucket tasks see each pair once -> canonicalize.
        id1, id2 = F.col(f"{id_col}1"), F.col(f"{id_col}2")
        pairs = (
            joined.where(~same_bucket | (id1 < id2))
            .withColumn("__swap", ~same_bucket & (id1 > id2))
            .where(id1 != id2)
        )
        swapped = [
            F.when(F.col("__swap"), F.col(f"{c}2")).otherwise(F.col(f"{c}1")).alias(f"{c}1")
            for c in (id_col, *carry_cols)
        ] + [
            F.when(F.col("__swap"), F.col(f"{c}1")).otherwise(F.col(f"{c}2")).alias(f"{c}2")
            for c in (id_col, *carry_cols)
        ]
        pairs = pairs.select(key_col, *swapped)

    out_cols = [key_col, f"{id_col}1", f"{id_col}2"] + [
        f"{c}{s}" for c in carry_cols for s in ("1", "2")
    ]
    return pairs.select(*out_cols)


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    shingle_col: str,
    num_hashes: int = 16,
) -> DataFrame:
    """k MinHash values per id via explode + k seeded xxhash64 mins.

    One wide aggregation — map-side partial agg keeps the shuffle at
    one row per (id, k mins).  No Python, no collect.
    """
    exploded = df.select(id_col, F.explode(shingle_col).alias("__sh"))
    aggs = [
        F.min(F.xxhash64(F.col("__sh"), F.lit(i))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return exploded.groupBy(id_col).agg(*aggs)


def minhash_lsh_blocks(
    df: DataFrame,
    id_col: str,
    shingle_col: str,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Banded LSH bucket keys: (id, band, band_key).

    Ids sharing a band_key within a band are near-duplicate
    candidates; use the band key as a blocking key for
    ``generate_pairs``.  rows/band = num_hashes // bands.
    """
    assert num_hashes % bands == 0
    rows = num_hashes // bands
    sig = minhash_signatures(df, id_col, shingle_col, num_hashes)
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(*[F.col(f"mh{b * rows + r}") for r in range(rows)]).alias(
                "band_key"
            ),
        )
        for b in range(bands)
    ]
    return (
        sig.withColumn("__bands", F.array(*band_cols))
        .select(id_col, F.explode("__bands").alias("__band"))
        .select(
            id_col,
            F.col("__band.band").alias("band"),
            F.col("__band.band_key").alias("band_key"),
        )
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    shingle_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    num_buckets: int = 1,
    max_block_size: int | None = None,
    adaptive_target: int | None = None,
) -> DataFrame:
    """Distinct candidate pairs from MinHash-LSH banding (pass-2
    blocking).  Pairs colliding in several bands are deduped.

    ``max_block_size`` caps band buckets: a degenerate band key (empty
    token lists, identical signatures) would otherwise go quadratic.
    Dropping an oversized bucket trades recall, not correctness — a
    true near-dup pair usually collides in several bands and survives
    via the others; set None for exact oracle parity at small scale.
    """
    blocks = minhash_lsh_blocks(df, id_col, shingle_col, num_hashes, bands)
    blocks = blocks.withColumn(
        "block_key", F.concat_ws("_", F.col("band"), F.col("band_key"))
    )
    # NOT pinned (r06, measured both ways): a lazy localCheckpoint here
    # halved the isolated LSH pairing stage (74.7 -> 37.2 s — it stops
    # generate_pairs' ~4 references re-running the minhash aggregation)
    # but the pinned blocks then sit in the block manager for the REST
    # of the fused pipeline action, and the evicted execution memory
    # cost the downstream features/CC stages far more than the saved
    # recompute (content CC stage 18.3 -> 83.2 s with the pin).  Guide
    # §5: cached data competes with execution memory — recompute is
    # the cheaper currency here.
    pairs = generate_pairs(
        blocks, key_col="block_key", id_col=id_col, num_buckets=num_buckets,
        max_block_size=max_block_size, adaptive_target=adaptive_target,
    )
    return pairs.select(f"{id_col}1", f"{id_col}2").distinct()


def sorted_neighborhood_pairs(
    members: DataFrame,
    sort_cols: list[str],
    id_col: str = "mention_id",
    window: int = 4,
    num_partitions: int | None = None,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernández & Stolfo, SIGMOD'95):
    order the corpus by a sliding key and pair every record with its
    ``window-1`` successors — blocking pass 3, catching pairs whose key
    TYPO severs every equality-based block (exact and phonetic alike)
    but whose shared sort-key prefix keeps them adjacent.

    The global rank is computed WITHOUT a single-partition window (the
    classic `Window.orderBy` trap pulls 10^12 rows into one task):

    1. `repartitionByRange` on the full sort key — Spark's sampled
       range partitioner, the same machinery a cluster sort uses;
    2. per-partition counts -> prefix-sum offsets.  This is the one
       driver round-trip and it is O(partitions), never O(rows);
    3. local `row_number` inside each range partition + offset.

    Rank is a property of the TOTAL order (ties broken by ``id_col``),
    so the result is independent of partition count and boundary
    sampling.  Pairing is one equi-join of the rank table against its
    own ranks shifted by d=1..window-1 (posexplode), each side narrow
    (id + rank) — O(N·window) rows, no self-cartesian anywhere.

    The reference blocks only on key equality
    (database/model_building_using_rich_features.sql:438-444); SNB is
    the standard complement the record-linkage literature pairs with
    it (multi-pass blocking).
    """
    if window < 2:
        raise ValueError("window must be >= 2 (w-1 successors per row)")
    order_cols = [F.col(c) for c in sort_cols] + [F.col(id_col)]
    keyed = members.select(id_col, *sort_cols)
    n_parts = num_partitions or keyed.sparkSession.sparkContext.defaultParallelism
    # pinned: the offsets collect and the rank computation below are
    # separate jobs — both must see ONE materialization of the range
    # partitioning (and the upstream plan runs once, not twice)
    ranged = (
        keyed.repartitionByRange(n_parts, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )

    # O(partitions) driver round-trip: partition sizes -> rank offsets
    counts = {
        r["__pid"]: r["n"]
        for r in ranged.groupBy("__pid").agg(F.count("*").alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_df = F.broadcast(
        keyed.sparkSession.createDataFrame(
            [(pid, off) for pid, off in offsets.items()] or [(0, 0)],
            "__pid int, __off long",
        )
    )

    from pyspark.sql import Window

    local = Window.partitionBy("__pid").orderBy(*order_cols)
    ranks = (
        ranged.withColumn("__lrank", F.row_number().over(local))
        .join(off_df, "__pid")
        .select(
            F.col(id_col),
            (F.col("__off") + F.col("__lrank") - 1).alias("__rank"),
        )
    )

    shifts = F.array(*[F.lit(d) for d in range(1, window)])
    lhs = ranks.select(
        F.col(id_col).alias(f"{id_col}1"),
        F.explode(
            F.transform(shifts, lambda d: F.col("__rank") + d)
        ).alias("__rank2"),
        F.col("__rank").alias("__rank1"),
    )
    rhs = ranks.select(
        F.col(id_col).alias(f"{id_col}2"), F.col("__rank").alias("__rank2")
    )
    return lhs.join(rhs, "__rank2").select(
        f"{id_col}1",
        f"{id_col}2",
        (F.col("__rank2") - F.col("__rank1")).cast("int").alias("sort_dist"),
    )


def deletion_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    s_col: str,
    verify: bool = True,
) -> DataFrame:
    """Candidate pairs whose ``s_col`` values are within OSA
    (Damerau restricted) distance 1 — equal, one edit apart, or one
    ADJACENT TRANSPOSITION apart — found by the SymSpell
    deletion-neighborhood trick; the typo-blocking pass with a
    PROVABLE recall guarantee, distinct from phonetic keys (heuristic
    sound classes) and SNB (rank windows): if osa(a, b) <= 1 then
    {a} ∪ del1(a) and {b} ∪ del1(b) intersect (substitution at i:
    both i-deletions equal; insertion: deleting the inserted char of
    b yields a; transposition at i,i+1: deleting EITHER swapped char
    from both sides agrees; equality: trivial), so joining on the
    deletion variants misses NOTHING at OSA distance 1.  The
    transposition case matters in practice: char-swap typos are the
    classic byline noise (and what the hard corpus plants), they are
    plain-Levenshtein distance 2, and a swap can change the Soundex
    class ("smith" -> "sbith") so the phonetic pass misses it.

    The join over-generates (e.g. "abc"/"bca" share variant "bc" at
    OSA distance 2), so ``verify`` re-checks the exact predicate —
    ``levenshtein <= 1`` OR adjacent-transposition (equal length,
    exactly two diff positions, adjacent, crossed-equal) — candidate
    count stays tiny because a shared variant already pins the
    strings to near-identical shapes.

    Scale: variants per string = O(len) — a bounded explode, no
    quadratic step anywhere; the self-join keys on the variant string
    (hash shuffle), and a hot variant ("smith"-family names) costs
    |occurrences|² only WITHIN that variant bucket, the same profile
    generate_pairs salts when it matters.  Everything is native
    substring arithmetic — exactly reproducible in SQL, so the oracle
    re-derives every variant, join row, and distance.
    """
    s = F.col(s_col)
    dels = F.transform(
        F.sequence(F.lit(1), F.length(s)),
        lambda i: F.concat(
            F.substring(s, 1, i - 1),
            s.substr(i + 1, F.length(s)),
        ),
    )
    variants = F.when(
        F.length(s) > 0, F.array_union(F.array(s), dels)
    ).otherwise(F.array(s))
    ev = df.select(
        F.col(id_col).alias("__id"),
        s.alias("__s"),
        F.explode(variants).alias("__v"),
    )
    a = ev.select(
        F.col("__id").alias(f"{id_col}1"),
        F.col("__s").alias(f"{s_col}1"),
        "__v",
    )
    b = ev.select(
        F.col("__id").alias(f"{id_col}2"),
        F.col("__s").alias(f"{s_col}2"),
        "__v",
    )
    pairs = (
        a.join(b, "__v")
        .filter(F.col(f"{id_col}1") < F.col(f"{id_col}2"))
        .drop("__v")
        .distinct()
    )
    if verify:
        c1, c2 = F.col(f"{s_col}1"), F.col(f"{s_col}2")
        diffs = F.filter(
            F.sequence(F.lit(1), F.length(c1)),
            lambda i: c1.substr(i, F.lit(1)) != c2.substr(i, F.lit(1)),
        )
        d0, d1 = F.get(diffs, 0), F.get(diffs, 1)  # null-safe indexing
        transposed = (
            (F.length(c1) == F.length(c2))
            & (F.size(diffs) == 2)
            & (d1 == d0 + 1)
            & (c1.substr(d0, F.lit(1)) == c2.substr(d1, F.lit(1)))
            & (c1.substr(d1, F.lit(1)) == c2.substr(d0, F.lit(1)))
        )
        pairs = pairs.filter(
            (F.levenshtein(f"{s_col}1", f"{s_col}2") <= 1) | transposed
        )
    return pairs


def greedy_blocking_scheme(
    labeled: DataFrame,
    scheme_col: str = "scheme",
    id1_col: str = "mention_id1",
    id2_col: str = "mention_id2",
    label_col: str = "same_entity",
    total_true: int | None = None,
) -> DataFrame:
    """Greedy blocking-scheme selection (the Michelson & Knoblock
    AAAI'06 BSL idea applied to whole blocking PASSES): given the
    labeled candidate-pair set of every available pass (the q73
    ladder), pick passes one at a time by MARGINAL value — most new
    true pairs first, fewest new candidates as the tie-break, then
    name — until every pass is ranked.  The ladder (q73) prices each
    pass in isolation; the learner prices them in composition, where
    overlap makes isolated recall numbers add up to less than they
    promise.

    ``labeled``: (scheme, id1, id2, label) — duplicates within a
    scheme are deduped here.  ``total_true``: the corpus true-pair
    count for the recall denominator (cum_recall is null without it).

    Scale shape: the labeled pair table is pinned once; each round is
    ONE anti-join against the covered set + ONE groupBy on the scheme
    tag (collecting only #schemes count rows — the 2-row class-count
    precedent, never pair data), and the covered set grows by a
    distinct union, re-pinned per round so no lineage compounds.
    Rounds = #schemes (a handful), fixed and data-independent.

    Output: one row per round — (pick_round, scheme,
    marginal_candidates, marginal_true, cum_candidates, cum_true,
    cum_recall round-6).  (``pick_round``, not ``round`` — a DuckDB
    reserved function name, the q87 ``pivot`` lesson.)
    """
    spark = labeled.sparkSession
    lab = (
        labeled.select(scheme_col, id1_col, id2_col, label_col)
        .distinct()
        .localCheckpoint(eager=True)
    )
    schemes = sorted(
        r[0] for r in lab.select(scheme_col).distinct().collect()
    )
    covered: DataFrame | None = None
    remaining = list(schemes)
    rows = []
    rnd = cum_c = cum_t = 0
    while remaining:
        rnd += 1
        rem = lab.filter(F.col(scheme_col).isin(remaining))
        if covered is not None:
            rem = rem.join(covered, [id1_col, id2_col], "left_anti")
        marg = {s: (0, 0) for s in remaining}
        for r in (
            rem.groupBy(scheme_col)
            .agg(
                F.count(F.lit(1)).alias("mc"),
                F.sum(F.col(label_col).cast("long")).alias("mt"),
            )
            .collect()
        ):
            marg[r[0]] = (int(r["mc"]), int(r["mt"]))
        pick = sorted(
            remaining, key=lambda s: (-marg[s][1], marg[s][0], s)
        )[0]
        mc, mt = marg[pick]
        cum_c += mc
        cum_t += mt
        rows.append(
            (
                rnd,
                pick,
                mc,
                mt,
                cum_c,
                cum_t,
                round(cum_t / total_true, 6) if total_true else None,
            )
        )
        newcov = lab.filter(F.col(scheme_col) == pick).select(
            id1_col, id2_col
        )
        covered = (
            newcov
            if covered is None
            else covered.unionByName(newcov).distinct()
        ).localCheckpoint(eager=True)
        remaining.remove(pick)
    return spark.createDataFrame(
        rows,
        "pick_round int, scheme string, marginal_candidates long,"
        " marginal_true long, cum_candidates long, cum_true long,"
        " cum_recall double",
    )


def suffix_blocking_pairs(
    df: DataFrame,
    id_col: str,
    s_col: str,
    min_suffix_len: int = 4,
    max_block_size: int = 50,
) -> DataFrame:
    """Suffix-array blocking (de Vries et al., "Robust record linkage
    blocking using suffix arrays", CIKM'09): every string keys into
    one block per suffix of length >= ``min_suffix_len`` (a string
    shorter than that keys on itself whole), suffixes whose block
    would exceed ``max_block_size`` records are DROPPED entirely (the
    RSA promiscuous-suffix rule — "son"/"man" name endings would
    otherwise pair half the corpus), and candidates are the distinct
    within-block pairs.  Complementary to the other typo passes: a
    PREFIX disturbance of any length (dropped particle "vandenberg"
    -> "berg", truncated OCR head, glued initial) lands both forms in
    the shared-suffix block, while del1 (OSA-1, q85) only covers one
    edit and SNB (q68) needs sort-adjacency — and symmetrically it
    never recovers a suffix typo, which is exactly what q85 covers.

    The pair predicate is EXACT, not heuristic: a pair survives iff
    its common suffix reaches ``min_suffix_len`` (or a short string
    matches whole) AND some shared suffix block is under the cap, so
    no verify pass is needed; ``common_suffix_len`` is emitted as the
    match evidence.

    Scale shape: suffixes per string = O(len) — a bounded explode
    like q85's deletion variants; the block-size cap is enforced with
    ONE groupBy count on the suffix key plus a left-semi join (no
    broadcast of the big side), and the self-join shuffles on the
    suffix key where the cap bounds every bucket at
    ``max_block_size``² pair work — the skew valve is structural, not
    salted.  All substring arithmetic is native (whole-stage
    codegen); DuckDB re-derives every suffix, cap, pair, and
    common-suffix length.  Reference analog: the blocking ladder the
    AND pipeline unions (database/and_datasets.sql:56-68 exact-key
    blocks; this pass widens recall like src's lastname-initial
    relaxations).
    """
    s = F.col(s_col)
    n = F.length(s)
    sufs = F.when(
        n >= min_suffix_len,
        F.transform(
            F.sequence(F.lit(1), n - min_suffix_len + 1),
            lambda i: s.substr(i, n),
        ),
    ).otherwise(F.array(s))
    ev = df.select(
        F.col(id_col).alias("__id"),
        s.alias("__s"),
        F.explode(sufs).alias("__v"),
    )
    ok = (
        ev.groupBy("__v")
        .agg(F.count(F.lit(1)).alias("__bs"))
        .filter(F.col("__bs") <= max_block_size)
        .select("__v")
    )
    ev = ev.join(ok, "__v", "left_semi")
    a = ev.select(
        F.col("__id").alias(f"{id_col}1"),
        F.col("__s").alias(f"{s_col}1"),
        "__v",
    )
    b = ev.select(
        F.col("__id").alias(f"{id_col}2"),
        F.col("__s").alias(f"{s_col}2"),
        "__v",
    )
    pairs = (
        a.join(b, "__v")
        .filter(F.col(f"{id_col}1") < F.col(f"{id_col}2"))
        .drop("__v")
        .distinct()
    )
    c1, c2 = F.col(f"{s_col}1"), F.col(f"{s_col}2")
    r1, r2 = F.reverse(c1), F.reverse(c2)
    common = F.size(
        F.filter(
            F.sequence(F.lit(1), F.least(F.length(c1), F.length(c2))),
            lambda i: r1.substr(F.lit(1), i) == r2.substr(F.lit(1), i),
        )
    )
    return pairs.withColumn("common_suffix_len", common.cast("int"))
