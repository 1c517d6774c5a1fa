"""Blocking / pair-generation golden-count tests.

Mirrors the reference's dual-generator cross-check
(database/and_datasets.sql:81-105): pair count per block must equal
b*(b-1)/2, ids canonical (id1 < id2), no self pairs, and the salted
triangle-split generator must emit the EXACT same pair set as the
plain self-join.
"""

import pytest
from pyspark.sql import functions as F

from pubmed_and_method_spark.operators.blocking import (
    block_commonness,
    generate_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
)


@pytest.fixture(scope="module")
def members(spark):
    rows = [(f"b{i % 5}", f"m{i:03d}") for i in range(40)]
    rows += [("hot", f"h{i:03d}") for i in range(30)]  # skewed block
    return spark.createDataFrame(rows, ["block_key", "mention_id"]).cache()


def expected_pair_count(members_df):
    sizes = [r["count"] for r in members_df.groupBy("block_key").count().collect()]
    return sum(b * (b - 1) // 2 for b in sizes)


def test_plain_pair_counts(spark, members):
    pairs = generate_pairs(members, num_buckets=1)
    assert pairs.count() == expected_pair_count(members)
    bad = pairs.filter(F.col("mention_id1") >= F.col("mention_id2")).count()
    assert bad == 0
    assert pairs.distinct().count() == pairs.count()


@pytest.mark.parametrize("s", [2, 4, 7])
def test_triangle_split_equals_plain(spark, members, s):
    plain = {
        (r.mention_id1, r.mention_id2)
        for r in generate_pairs(members, num_buckets=1).collect()
    }
    salted = {
        (r.mention_id1, r.mention_id2)
        for r in generate_pairs(members, num_buckets=s).collect()
    }
    assert salted == plain


@pytest.mark.parametrize("target", [4, 8, 16, 64])
def test_adaptive_salting_equals_plain(spark, members, target):
    """r03 verdict #8: per-block salt s_b = ceil(n_b/target) must emit
    the EXACT pair set of the plain self-join at every target —
    including targets where some blocks take the s_b=1 fast path (the
    8-member b* blocks at target>=8) and the 30-member hot block is
    salted."""
    plain = {
        (r.mention_id1, r.mention_id2)
        for r in generate_pairs(members, num_buckets=1).collect()
    }
    adaptive = {
        (r.mention_id1, r.mention_id2)
        for r in generate_pairs(members, adaptive_target=target).collect()
    }
    assert adaptive == plain


def test_adaptive_salting_bounds_hot_tasks(spark):
    """Adaptive salting must give the hot block the SAME per-task
    bound the global-s stress test asserts, with s derived from the
    block's own size."""
    n, target = 3000, 400
    s = -(-n // target)  # ceil -> 8
    hot = spark.range(n).select(
        F.lit("hotblock").alias("block_key"),
        F.format_string("m%05d", F.col("id")).alias("mention_id"),
    )
    pairs = generate_pairs(hot, adaptive_target=target)
    total = n * (n - 1) // 2
    assert pairs.count() == total
    b = hot.select(
        F.pmod(F.xxhash64("mention_id"), F.lit(s)).cast("int").alias("b")
    )
    sizes = {r.b: r["count"] for r in b.groupBy("b").count().collect()}
    loads = [
        sizes.get(i, 0) * (sizes.get(i, 0) - 1) // 2
        if i == j
        else sizes.get(i, 0) * sizes.get(j, 0)
        for i in range(s)
        for j in range(i, s)
    ]
    ideal = total / (s * (s + 1) / 2)
    assert max(loads) <= 2 * ideal
    assert sum(loads) == total


def test_max_block_size_cap(spark, members):
    pairs = generate_pairs(members, num_buckets=1, max_block_size=10)
    # 'hot' (30) dropped; five b* blocks of 8 remain
    assert pairs.count() == 5 * (8 * 7 // 2)


def test_block_commonness(spark, members):
    amb = block_commonness(members)
    rows = {r.block_key: r for r in amb.collect()}
    assert rows["hot"].commonness == 30
    total = sum(r.commonness for r in rows.values())
    assert total == 70
    assert rows["hot"].ambiguity_score == pytest.approx(30 / 70)


def test_hot_block_stress_bounded_tasks(spark):
    """Skew stress (judge r02 #8): one planted 3000-member hot block
    (the transcript analog of the reference's >1000-member namespaces,
    README.md:3).  The salted triangle split must (a) emit EXACTLY
    n*(n-1)/2 canonical pairs and (b) bound every join task's work:
    with s buckets no (i,j) task may see more than ~(n/s)^2 of the n^2
    pair space — the property that keeps one hot block from pinning a
    single executor at 10^12-turn scale."""
    n, s = 3000, 8
    hot = spark.range(n).select(
        F.lit("hotblock").alias("block_key"),
        F.format_string("m%05d", F.col("id")).alias("mention_id"),
    )
    pairs = generate_pairs(hot, num_buckets=s)
    assert pairs.count() == n * (n - 1) // 2
    assert pairs.filter(F.col("mention_id1") >= F.col("mention_id2")).count() == 0

    # per-task workload bound, computed from the same bucket assignment
    # generate_pairs uses: task (i,j) joins bucket i x bucket j
    b = hot.select(
        F.pmod(F.xxhash64("mention_id"), F.lit(s)).cast("int").alias("b")
    )
    sizes = {r.b: r["count"] for r in b.groupBy("b").count().collect()}
    loads = []
    for i in range(s):
        for j in range(i, s):
            ni, nj = sizes.get(i, 0), sizes.get(j, 0)
            loads.append(ni * (ni - 1) // 2 if i == j else ni * nj)
    total = n * (n - 1) // 2
    # a single unsalted task would carry `total`; the max salted task
    # must be close to the ideal total/(s^2/2 + s/2) share (2x slack
    # for hash imbalance), i.e. ~36x smaller than the unsalted task
    ideal = total / (s * (s + 1) / 2)
    assert max(loads) <= 2 * ideal
    assert sum(loads) == total


def test_minhash_identical_inputs_collide(spark):
    df = spark.createDataFrame(
        [
            ("a", ["x y z", "y z w", "z w v"]),
            ("b", ["x y z", "y z w", "z w v"]),  # identical shingles
            ("c", ["p q r", "q r s", "r s t"]),  # disjoint
        ],
        "id string, sh array<string>",
    )
    sig = minhash_signatures(df, "id", "sh", num_hashes=8)
    by = {r.id: [r[f"mh{i}"] for i in range(8)] for r in sig.collect()}
    assert by["a"] == by["b"]
    assert by["a"] != by["c"]

    cands = lsh_candidate_pairs(df, "id", "sh", num_hashes=8, bands=2)
    got = {(r.id1, r.id2) for r in cands.collect()}
    assert ("a", "b") in got
    assert ("a", "c") not in got


def test_blocking_quality_hand_computed(spark):
    """blocking_quality on a 7-mention corpus with every regime:
    a missed true pair (members of one entity split across blocks),
    an unblocked mention, and a mixed block — all metrics re-derived
    by hand in the asserts."""
    from pubmed_and_method_spark.operators.er_metrics import (
        METRIC_COLS,
        blocking_quality,
    )

    # entity E1: m1,m2,m3 (m3 lands in block B, away from A -> 2 of 3
    # true pairs survive); entity E2: m4,m5 in block B; entity E3: m6
    # blocked alone; entity E4: m7 unblocked.
    sig = spark.createDataFrame(
        [
            ("A", "m1", "c1"), ("A", "m2", "c2"), ("B", "m3", "c3"),
            ("B", "m4", "c4"), ("B", "m5", "c5"), ("C", "m6", "c6"),
            ("__unblocked__", "m7", "c7"),
        ],
        ["block_key", "mention_id", "conv_id"],
    )
    truth = spark.createDataFrame(
        [("c1", "E1"), ("c2", "E1"), ("c3", "E1"), ("c4", "E2"),
         ("c5", "E2"), ("c6", "E3"), ("c7", "E4")],
        ["conv_id", "entity_id"],
    )
    # within-block pairs: A -> (m1,m2); B -> (m3,m4),(m3,m5),(m4,m5)
    pairs = spark.createDataFrame(
        [("m1", "m2", 1), ("m3", "m4", 0), ("m3", "m5", 0),
         ("m4", "m5", 1)],
        ["mention_id1", "mention_id2", "same_entity"],
    )
    row = blocking_quality(sig, pairs, truth).collect()[0].asDict()
    assert list(row) == METRIC_COLS
    assert row["n_mentions"] == 7
    assert row["n_entities"] == 4
    # true pairs: C(3,2) + C(2,2->1) = 3 + 1 = 4
    assert row["n_true_pairs"] == 4
    assert row["n_blocks"] == 3
    assert row["n_blocked_mentions"] == 6
    assert row["max_block_size"] == 3
    assert row["avg_block_size"] == 2.0
    assert row["n_candidates"] == 4
    # matched: (m1,m2) and (m4,m5); (c1,c3)/(c2,c3) never generated
    assert row["n_matched_true"] == 2
    assert row["pair_completeness"] == 0.5
    # 1 - 4 / C(7,2)=21
    assert row["reduction_ratio"] == round(1 - 4 / 21, 6)


def test_blocking_quality_empty_edges(spark):
    """Zero candidates / all-unblocked / single-mention corpora hit
    the coalesce+guard paths instead of dividing by zero."""
    from pubmed_and_method_spark.operators.er_metrics import blocking_quality

    sig = spark.createDataFrame(
        [("__unblocked__", "m1", "c1")],
        ["block_key", "mention_id", "conv_id"],
    )
    truth = spark.createDataFrame([("c1", "E1")], ["conv_id", "entity_id"])
    pairs = spark.createDataFrame(
        [], "mention_id1 string, mention_id2 string, same_entity int"
    )
    row = blocking_quality(sig, pairs, truth).collect()[0].asDict()
    assert row["n_mentions"] == 1
    assert row["n_blocks"] == 0
    assert row["max_block_size"] == 0
    assert row["avg_block_size"] == 0.0
    assert row["n_candidates"] == 0
    assert row["n_true_pairs"] == 0
    assert row["pair_completeness"] is None
    assert row["reduction_ratio"] is None


def test_threshold_sweep_hand_computed(spark):
    """6 scored pairs, n_bins=4: every tp/fp/fn and metric at each of
    the 4 thresholds re-derived by hand, including the zero_division=0
    convention at the empty top bucket and clamping of score 1.0."""
    from pubmed_and_method_spark.operators.er_metrics import threshold_sweep

    rows = [
        (0.05, 0), (0.10, 1), (0.30, 0), (0.60, 1), (0.74, 1), (1.0, 0),
    ]
    df = spark.createDataFrame(rows, "score double, same_entity int")
    got = {
        r.threshold: r
        for r in threshold_sweep(df, n_bins=4).collect()
    }
    assert len(got) == 4
    # P (total positives) = 3
    # t=0.00: everything predicted positive
    r = got[0.0]
    assert (r.tp, r.fp, r.fn) == (3, 3, 0)
    assert (r.precision, r.recall, r.f1) == (0.5, 1.0, round(2 * 3 / 9, 6))
    # t=0.25: {0.30,0.60,0.74,1.0} positive -> tp=2 fp=2
    r = got[0.25]
    assert (r.tp, r.fp, r.fn) == (2, 2, 1)
    assert (r.precision, r.recall) == (0.5, round(2 / 3, 6))
    # t=0.50: {0.60,0.74,1.0} -> tp=2 fp=1
    r = got[0.5]
    assert (r.tp, r.fp, r.fn) == (2, 1, 1)
    assert (r.precision, r.recall, r.f1) == (
        round(2 / 3, 6), round(2 / 3, 6), round(4 / 6, 6),
    )
    # t=0.75: only the clamped 1.0 -> tp=0 fp=1; zero-division -> 0.0
    r = got[0.75]
    assert (r.tp, r.fp, r.fn) == (0, 1, 3)
    assert (r.precision, r.recall, r.f1) == (0.0, 0.0, 0.0)


def test_progressive_recall_hand_computed(spark):
    """6 scored pairs with a tie group at each of two scores,
    n_steps=3: every cut rank ceil(i*6/3), cumulative TP, recall,
    prefix precision, and lift re-derived by hand — including the
    (score DESC, id1, id2) tie order inside the 0.8 and 0.5 groups."""
    from pubmed_and_method_spark.operators.er_metrics import (
        progressive_recall,
    )

    rows = [
        (0.9, 1, "a", "b"),
        (0.8, 1, "a", "c"),
        (0.8, 0, "a", "d"),
        (0.5, 0, "b", "c"),
        (0.5, 1, "b", "d"),
        (0.1, 0, "c", "d"),
    ]
    df = spark.createDataFrame(
        rows,
        "score double, same_entity int, mention_id1 string, "
        "mention_id2 string",
    )
    got = {
        r.effort_frac: r for r in progressive_recall(df, n_steps=3).collect()
    }
    assert len(got) == 3
    # rank order: (a,b)1 (a,c)1 (a,d)0 (b,c)0 (b,d)1 (c,d)0; N=6 P=3
    r = got[round(1 / 3, 6)]
    assert (r.examined, r.tp) == (2, 2)
    assert (r.recall, r.precision, r.lift) == (round(2 / 3, 6), 1.0, 2.0)
    r = got[round(2 / 3, 6)]
    assert (r.examined, r.tp) == (4, 2)
    assert (r.recall, r.precision, r.lift) == (round(2 / 3, 6), 0.5, 1.0)
    r = got[1.0]
    assert (r.examined, r.tp) == (6, 3)
    assert (r.recall, r.precision, r.lift) == (1.0, 0.5, 1.0)
    # empty input -> empty curve (no cut rank exists)
    empty = progressive_recall(df.limit(0), n_steps=3)
    assert empty.count() == 0


def test_subsample_f1_ci_brute_force(spark):
    """Every replicate's membership bits and confusion counts
    re-derived with hashlib + pure Python on an 8-pair fixture,
    including the grid guarantee (exactly n_replicates rows) and the
    zero_division=0 conventions."""
    from pubmed_and_method_spark.operators.er_metrics import (
        subsample_f1_ci,
    )
    import hashlib

    rows = [
        ("a", "b", "link", 1),
        ("a", "c", "link", 0),
        ("a", "d", "nonlink", 1),
        ("b", "c", "nonlink", 0),
        ("b", "d", "possible", 1),
        ("c", "d", "link", 1),
        ("c", "e", "nonlink", 0),
        ("d", "e", "link", 0),
    ]
    df = spark.createDataFrame(
        rows,
        "mention_id1 string, mention_id2 string, decision string, "
        "same_entity int",
    )
    got = {
        r.replicate: r for r in subsample_f1_ci(df, n_replicates=4).collect()
    }
    assert sorted(got) == [0, 1, 2, 3]
    for b in range(4):
        kept = [
            (dec == "link", y)
            for (i1, i2, dec, y) in rows
            if hashlib.md5(f"{i1}#{i2}#{b}".encode()).hexdigest()[0] < "8"
        ]
        tp = sum(1 for p, y in kept if p and y)
        fp = sum(1 for p, y in kept if p and not y)
        fn = sum(1 for p, y in kept if not p and y)
        r = got[b]
        assert (r.n_kept, r.tp, r.fp, r.fn) == (len(kept), tp, fp, fn)
        assert r.precision == (round(tp / (tp + fp), 6) if tp + fp else 0.0)
        assert r.recall == (round(tp / (tp + fn), 6) if tp + fn else 0.0)
        assert r.f1 == (
            round(2 * tp / (2 * tp + fp + fn), 6) if 2 * tp + fp + fn else 0.0
        )


def test_cluster_agreement_hand_computed(spark):
    """Clusters {A:[e1,e1], B:[e1], C:[e2,e2]} vs gold {e1 x3, e2 x2}:
    every metric re-derived independently in the test body (pure
    clusters -> B-cubed precision and homogeneity exactly 1.0; the
    e1 split costs recall and completeness)."""
    import math

    from pubmed_and_method_spark.operators.er_metrics import (
        cluster_agreement_metrics,
    )

    rows = [
        ("A", "e1"), ("A", "e1"), ("B", "e1"), ("C", "e2"), ("C", "e2"),
    ]
    df = spark.createDataFrame(rows, "cluster string, entity_id string")
    r = cluster_agreement_metrics(df).collect()[0]
    assert (r.n_items, r.n_clusters, r.n_entities) == (5, 3, 2)
    # B-cubed: P = (4/2 + 1/1 + 4/2)/5, R = (4/3 + 1/3 + 4/2)/5
    assert r.bcubed_precision == 1.0
    assert r.bcubed_recall == round(11 / 15, 6)
    assert r.bcubed_f1 == round(2 * 1.0 * (11 / 15) / (1 + 11 / 15), 6)
    # pure clusters -> H(E|C)=0 -> homogeneity 1
    assert r.homogeneity == 1.0
    h_c_e = -(2 * math.log(2 / 3) + math.log(1 / 3)) / 5
    h_c = math.log(5) - (2 * math.log(2) + 2 * math.log(2)) / 5
    com = 1.0 - h_c_e / h_c
    assert r.completeness == round(com, 6)
    assert r.v_measure == round(2 * com / (1 + com), 6)


def test_cluster_agreement_degenerate_and_empty(spark):
    """sklearn conventions: single-cluster-single-entity input has
    zero entropy on both sides -> hom = com = v = 1.0; empty input
    yields one all-zero row."""
    from pubmed_and_method_spark.operators.er_metrics import (
        cluster_agreement_metrics,
    )

    one = spark.createDataFrame(
        [("A", "e1"), ("A", "e1")], "cluster string, entity_id string"
    )
    r = cluster_agreement_metrics(one).collect()[0]
    assert (r.homogeneity, r.completeness, r.v_measure) == (1.0, 1.0, 1.0)
    assert (r.bcubed_precision, r.bcubed_recall, r.bcubed_f1) == (
        1.0, 1.0, 1.0,
    )

    empty = spark.createDataFrame([], "cluster string, entity_id string")
    r = cluster_agreement_metrics(empty).collect()[0]
    assert (r.n_items, r.n_clusters, r.n_entities) == (0, 0, 0)
    assert (r.bcubed_precision, r.bcubed_recall, r.bcubed_f1) == (
        0.0, 0.0, 0.0,
    )
    assert (r.homogeneity, r.completeness, r.v_measure) == (0.0, 0.0, 0.0)


def test_pair_counting_hand_computed(spark):
    """Same {A:[e1,e1], B:[e1], C:[e2,e2]} fixture as the B-cubed
    test: tp=2, pred=2, true=4, total=10 pairs, so Rand=0.8,
    ARI=(2-0.8)/((2+4)/2-0.8)=1.2/2.2, FM=2/sqrt(8), P=1.0, R=0.5 —
    every number re-derived by hand."""
    import math

    from pubmed_and_method_spark.operators.er_metrics import (
        pair_counting_metrics,
    )

    rows = [
        ("A", "e1"), ("A", "e1"), ("B", "e1"), ("C", "e2"), ("C", "e2"),
    ]
    df = spark.createDataFrame(rows, "cluster string, entity_id string")
    r = pair_counting_metrics(df).collect()[0]
    assert (r.n_items, r.tp_pairs, r.pred_pairs, r.true_pairs,
            r.total_pairs) == (5, 2, 2, 4, 10)
    assert r.rand_index == 0.8
    assert r.adjusted_rand == round(1.2 / 2.2, 6)
    assert r.fowlkes_mallows == round(2 / math.sqrt(8), 6)
    assert (r.pair_precision, r.pair_recall) == (1.0, 0.5)


def test_pair_counting_degenerate_and_empty(spark):
    """sklearn conventions: a single trivially-agreeing partition has
    ARI denominator 0 -> ARI = 1.0; empty input yields one all-zero
    row (no division blows up)."""
    from pubmed_and_method_spark.operators.er_metrics import (
        pair_counting_metrics,
    )

    one = spark.createDataFrame(
        [("A", "e1"), ("A", "e1")], "cluster string, entity_id string"
    )
    r = pair_counting_metrics(one).collect()[0]
    assert (r.tp_pairs, r.pred_pairs, r.true_pairs, r.total_pairs) == (
        1, 1, 1, 1,
    )
    assert (r.rand_index, r.adjusted_rand, r.fowlkes_mallows) == (
        1.0, 1.0, 1.0,
    )

    empty = spark.createDataFrame([], "cluster string, entity_id string")
    r = pair_counting_metrics(empty).collect()[0]
    assert (r.n_items, r.tp_pairs, r.total_pairs) == (0, 0, 0)
    assert (r.rand_index, r.adjusted_rand, r.fowlkes_mallows,
            r.pair_precision, r.pair_recall) == (0.0, 0.0, 0.0, 0.0, 0.0)


def test_tf_adjusted_weights_hand_computed(spark):
    """4 mentions {x,x,x,y}, 4 labeled pairs: base m=2/2 (clamped to
    1-1e-6), u=1/2; p_x=0.75 so agreeing on x LOSES bits
    (log2(0.5/0.75) < 0) while p_y=0.25 GAINS exactly +1 bit — every
    count and weight re-derived by hand."""
    import math

    from pubmed_and_method_spark.operators.er_metrics import (
        tf_adjusted_weights,
    )

    mentions = spark.createDataFrame(
        [("m1", "x"), ("m2", "x"), ("m3", "x"), ("m4", "y")],
        "mention_id string, given_name string",
    )
    pairs = spark.createDataFrame(
        [("x", "x", 1), ("x", "x", 0), ("x", "y", 0), ("y", "y", 1)],
        "g1 string, g2 string, same_entity int",
    )
    got = {
        r.value: r
        for r in tf_adjusted_weights(
            pairs, mentions, "given_name", "g1", "g2"
        ).collect()
    }
    m, u = 1.0 - 1e-6, 0.5
    x, y = got["x"], got["y"]
    assert (x.n_value, x.n_mentions, x.n_agree_pairs, x.n_agree_match) == (
        3, 4, 2, 1,
    )
    assert (y.n_value, y.n_agree_pairs, y.n_agree_match) == (1, 1, 1)
    assert (x.u_value, y.u_value) == (0.75, 0.25)
    assert x.base_weight == y.base_weight == round(math.log2(m / u), 6)
    assert x.tf_weight == round(math.log2(m / 0.75), 6)
    assert y.tf_weight == round(math.log2(m / 0.25), 6)
    assert x.tf_adjustment == round(math.log2(u / 0.75), 6) < 0
    assert y.tf_adjustment == 1.0  # log2(0.5/0.25)


def test_deletion_neighborhood_pairs(spark):
    """OSA-1 recall: substitution, insertion, AND adjacent
    transposition ("ab"/"ba") all verified; the over-generation case
    ("abc"/"bca" share variant "bc" at OSA distance 2) present
    without verify and removed with it; empty-string degenerate."""
    from pubmed_and_method_spark.operators.blocking import (
        deletion_neighborhood_pairs,
    )

    rows = [
        (1, "smith"), (2, "smyth"), (3, "smiths"), (4, "ab"),
        (5, "ba"), (6, ""), (7, "abc"), (8, "bca"),
    ]
    df = spark.createDataFrame(rows, "mention_id long, surname string")
    verified = sorted(
        (r.mention_id1, r.mention_id2)
        for r in deletion_neighborhood_pairs(
            df, "mention_id", "surname"
        ).collect()
    )
    # sub (1,2), insertion (1,3), adjacent transposition (4,5), plus
    # the genuine insertions (4,7) ab->abc and (5,8) ba->bca;
    # NOT the rotation (7,8) at OSA distance 2
    assert verified == [(1, 2), (1, 3), (4, 5), (4, 7), (5, 8)]
    raw = sorted(
        (r.mention_id1, r.mention_id2)
        for r in deletion_neighborhood_pairs(
            df, "mention_id", "surname", verify=False
        ).collect()
    )
    assert (7, 8) in raw  # the join over-generates; verify prunes it
    assert all(6 not in p for p in raw)  # empty string pairs nothing


def test_review_queue_hand_computed(spark):
    """Uncertainty order (band depth DESC), the per-key cap, and
    exclusion of already-decided pairs — every depth and rank
    re-derived by hand."""
    from pubmed_and_method_spark.operators.er_metrics import review_queue

    rows = [
        ("K1", "a", "b", 2.0, "possible"),   # depth 2.0 -> rank 1
        ("K1", "a", "c", 3.9, "possible"),   # depth 0.1 -> rank 3 (cut)
        ("K1", "b", "c", 0.5, "possible"),   # depth 0.5 -> rank 2
        ("K1", "a", "d", 5.0, "link"),       # decided: excluded
        ("K2", "x", "y", 1.0, "possible"),   # depth 1.0 -> rank 1
    ]
    df = spark.createDataFrame(
        rows,
        "block_key string, mention_id1 string, mention_id2 string, "
        "llr double, decision string",
    )
    got = sorted(
        (r.block_key, r.review_rank, r.mention_id1, r.mention_id2,
         r.band_depth)
        for r in review_queue(
            df, k=2, lower=0.0, upper=4.0, key_col="block_key"
        ).collect()
    )
    assert got == [
        ("K1", 1, "a", "b", 2.0),
        ("K1", 2, "b", "c", 0.5),
        ("K2", 1, "x", "y", 1.0),
    ]


def test_cluster_churn_hand_computed(spark):
    """All three statuses from one fixture: A1 splits across B1/B2,
    A2 is absorbed (merged) into B1, A3 maps bijectively (stable) —
    every count, containment ratio, and status re-derived by hand."""
    from pubmed_and_method_spark.operators.er_metrics import cluster_churn

    a = spark.createDataFrame(
        [("m1", "A1"), ("m2", "A1"), ("m3", "A1"), ("m4", "A2"),
         ("m5", "A3"), ("m6", "A3")],
        "mention_id string, cluster string",
    )
    b = spark.createDataFrame(
        [("m1", "B1"), ("m2", "B1"), ("m4", "B1"), ("m3", "B2"),
         ("m5", "B3"), ("m6", "B3")],
        "mention_id string, cluster string",
    )
    got = {r.cluster_a: r for r in cluster_churn(a, b).collect()}
    a1, a2, a3 = got["A1"], got["A2"], got["A3"]
    assert (a1.n_mentions, a1.n_parts_b, a1.best_b, a1.best_overlap) == (
        3, 2, "B1", 2,
    )
    assert (a1.frac_of_a, a1.frac_of_b, a1.status) == (
        0.666667, 0.666667, "split",
    )
    assert (a2.n_parts_b, a2.best_b, a2.frac_of_a, a2.frac_of_b) == (
        1, "B1", 1.0, 0.333333,
    )
    assert a2.status == "merged"
    assert (a3.n_parts_b, a3.frac_of_a, a3.frac_of_b, a3.status) == (
        1, 1.0, 1.0, "stable",
    )


def test_ceaf_alignment_hand_computed(spark):
    """The weld cluster W={e1,e1,e1,e2,e2} can match only ONE entity
    (greedy takes e1, overlap 3, round 1); e2 then falls to its
    second-best cluster C2 in round 2.  Every size and phi re-derived
    by hand."""
    from pubmed_and_method_spark.operators.er_metrics import ceaf_alignment

    rows = [
        ("W", "e1"), ("W", "e1"), ("W", "e1"), ("W", "e2"), ("W", "e2"),
        ("C2", "e2"),
    ]
    df = spark.createDataFrame(rows, "cluster string, entity_id string")
    got = {
        r.cluster: r for r in ceaf_alignment(df, rounds=4).collect()
    }
    w, c2 = got["W"], got["C2"]
    assert (w.entity_id, w.phi_m, w.n_cluster, w.n_entity) == ("e1", 3, 5, 3)
    assert (w.phi_e, w.round_matched) == (0.75, 1)  # 2*3/(5+3)
    assert (c2.entity_id, c2.phi_m, c2.n_cluster, c2.n_entity) == (
        "e2", 1, 1, 3,
    )
    assert (c2.phi_e, c2.round_matched) == (0.5, 2)  # 2*1/(1+3)
    assert len(got) == 2  # 1:1 — no entity or cluster used twice


def test_monge_elkan_hand_computed(spark):
    """Transposition invariance (the point of the operator), exact
    inner-JW agreement on a typo pair, directional asymmetry when
    token counts differ, and omission of empty-token pairs."""
    from pubmed_and_method_spark.functions.strings import jaro_winkler
    from pubmed_and_method_spark.operators.token_similarity import (
        monge_elkan_scores,
    )

    rows = [
        ("a1", "b1", ["maria", "santos"], ["santos", "maria"]),
        ("a2", "b2", ["maria"], ["mario"]),
        ("a3", "b3", ["maria", "santos"], ["maria"]),
        ("a4", "b4", [], ["maria"]),
    ]
    df = spark.createDataFrame(
        rows,
        "mention_id1 string, mention_id2 string, "
        "toks1 array<string>, toks2 array<string>",
    )
    got = {
        r.mention_id1: r
        for r in monge_elkan_scores(df, "toks1", "toks2").collect()
    }
    # swapped given/surname: every token finds its exact twin
    assert (
        got["a1"].me_fwd, got["a1"].me_bwd, got["a1"].monge_elkan
    ) == (1.0, 1.0, 1.0)
    # single-token typo pair: symmetric, equals the inner JW
    jw = round(jaro_winkler("maria", "mario"), 6)
    assert jw == 0.92
    assert (got["a2"].me_fwd, got["a2"].monge_elkan) == (jw, jw)
    # asymmetry: fwd averages over 2 tokens, bwd over 1
    sm = round(jaro_winkler("santos", "maria"), 6)
    assert got["a3"].me_fwd == round((1.0 + sm) / 2, 6)
    assert got["a3"].me_bwd == 1.0
    # empty side omitted, not fabricated as zero
    assert "a4" not in got


def test_entity_epochs_hand_computed(spark):
    """Gap-based epoch splitting: cluster A's timeline [0, 100, 100,
    5000] at gap 1000 cuts exactly once (4900 > 1000); equal
    timestamps (gap 0) can never straddle a boundary; a singleton
    cluster is one epoch of span 0.  Integer-second and timestamp
    inputs produce identical output."""
    import datetime

    from pubmed_and_method_spark.operators.temporal import entity_epochs

    rows = [
        ("A", "m1", 0), ("A", "m2", 100), ("A", "m3", 100),
        ("A", "m4", 5000), ("B", "m5", 7),
    ]
    df = spark.createDataFrame(rows, "cluster string, mention_id string, ts long")
    expect = {
        ("A", 1): (3, 0, 100, 100),
        ("A", 2): (1, 5000, 5000, 0),
        ("B", 1): (1, 7, 7, 0),
    }
    got = {
        (r.cluster, r.epoch): (
            r.n_mentions, r.epoch_start, r.epoch_end, r.span_seconds
        )
        for r in entity_epochs(df, gap_seconds=1000).collect()
    }
    assert got == expect

    ts_rows = [
        (c, m, datetime.datetime.fromtimestamp(s, datetime.timezone.utc))
        for c, m, s in rows
    ]
    tdf = spark.createDataFrame(
        ts_rows, "cluster string, mention_id string, ts timestamp"
    )
    got_ts = {
        (r.cluster, r.epoch): (
            r.n_mentions, r.epoch_start, r.epoch_end, r.span_seconds
        )
        for r in entity_epochs(tdf, gap_seconds=1000).collect()
    }
    assert got_ts == expect


def test_fs_weights_hand_computed(spark):
    """Two features over 7 labeled pairs: m/u and both log2 weights
    re-derived by hand, including eps-clamping when a feature never
    agrees on non-matches (u -> 1e-6, weight stays finite) and when
    one class is empty."""
    import math

    from pubmed_and_method_spark.operators.er_metrics import fs_weights

    # y=1 pairs: f1 agrees 2/3, f2 agrees 3/3; y=0: f1 1/4, f2 0/4
    rows = [
        (1, 1, 1), (1, 1, 1), (1, 0, 1),
        (0, 1, 0), (0, 0, 0), (0, 0, 0), (0, 0, 0),
    ]
    df = spark.createDataFrame(rows, "same_entity int, f1 int, f2 int")
    got = {r.feature: r for r in fs_weights(df, ["f1", "f2"]).collect()}
    r = got["f1"]
    assert (r.n_match, r.n_nonmatch) == (3, 4)
    assert (r.agree_match, r.agree_nonmatch) == (2, 1)
    assert (r.m_prob, r.u_prob) == (round(2 / 3, 6), 0.25)
    assert r.match_weight == round(math.log2((2 / 3) / 0.25), 6)
    assert r.disagree_weight == round(math.log2((1 / 3) / 0.75), 6)
    r = got["f2"]
    # m = 1.0 clamps to 1-1e-6; u = 0 clamps to 1e-6
    assert (r.m_prob, r.u_prob) == (0.999999, 0.000001)
    assert r.match_weight == round(math.log2((1 - 1e-6) / 1e-6), 6)
    assert r.disagree_weight == round(math.log2(1e-6 / (1 - 1e-6)), 6)

    # empty match class: m falls back to eps
    neg = spark.createDataFrame(
        [(0, 1), (0, 0)], "same_entity int, f1 int"
    )
    r = fs_weights(neg, ["f1"]).collect()[0]
    assert (r.n_match, r.m_prob, r.u_prob) == (0, 0.000001, 0.5)


def test_transitive_conflicts_chain(spark):
    """Chain a-b-c with strong direct edges and a weak a-c pair: the
    closure puts a and c in one component, so (a, c) is the single
    conflict; the weak pair (a, d) in another component is not."""
    from pubmed_and_method_spark.operators.er_metrics import (
        transitive_conflicts,
    )

    rows = [
        ("a", "b", 0.9, 1),
        ("b", "c", 0.8, 1),
        ("a", "c", 0.3, 1),   # transitively merged, weak direct score
        ("a", "d", 0.2, 0),   # d is isolated -> never a conflict
        ("d", "e", 0.7, 1),   # separate component
    ]
    df = spark.createDataFrame(
        rows, "mention_id1 string, mention_id2 string, score double,"
        " same_entity int"
    )
    got = transitive_conflicts(df, threshold=0.6).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.mention_id1, r.mention_id2, r.component) == ("a", "c", "a")
    assert (r.score, r.same_entity) == (0.3, 1)


def test_fs_em_single_step_hand_computed(spark):
    """k=1, n_iter=1: the E and M steps re-derived by hand from the
    two-pattern histogram (4 agreeing pairs, 6 disagreeing), through
    the same clamp+round-12 sync the operator applies."""
    from pubmed_and_method_spark.operators.er_metrics import fs_em

    rows = [(1,)] * 4 + [(0,)] * 6
    df = spark.createDataFrame(rows, "f int")
    r = fs_em(df, ["f"], n_iter=1).collect()[0]
    # E-step at (m,u,lam)=(0.9,0.1,0.1):
    w1 = 0.1 * 0.9 / (0.1 * 0.9 + 0.9 * 0.1)          # = 0.5
    w0 = 0.1 * 0.1 / (0.1 * 0.1 + 0.9 * 0.9)
    sw, swc = w1 * 4 + w0 * 6, (1 - w1) * 4 + (1 - w0) * 6
    lam = round(min(max(sw / 10, 1e-6), 1 - 1e-6), 12)
    m = round(min(max(w1 * 4 / sw, 1e-6), 1 - 1e-6), 12)
    u = round(min(max(w1 * 4 / swc, 1e-6), 1 - 1e-6), 12)
    assert r.lambda_match == round(lam, 6)
    assert r.m_prob == round(m, 6)
    assert r.u_prob == round(u, 6)


def test_fs_em_recovers_separation(spark):
    """Well-separated unlabeled mixture (30% matches agreeing on both
    features, 70% non-matches agreeing on neither): EM recovers
    prevalence ~0.3, m near 1, u near 0, positive match weights —
    with no labels anywhere.  Determinism: two runs identical."""
    from pubmed_and_method_spark.operators.er_metrics import fs_em

    rows = [(1, 1)] * 30 + [(0, 0)] * 70
    df = spark.createDataFrame(rows, "fa int, fb int")
    got = fs_em(df, ["fa", "fb"], n_iter=5).collect()
    for r in got:
        assert 0.25 < r.lambda_match < 0.35
        assert r.m_prob > 0.95
        assert r.u_prob < 0.05
        assert r.match_weight > 3.0
        assert r.disagree_weight < -3.0
    again = fs_em(df, ["fa", "fb"], n_iter=5).collect()
    assert got == again


def test_fs_em_missing_single_step_hand_computed(spark):
    """k=1, n_iter=1, three patterns (4 agree, 6 disagree, 5 missing):
    E and M steps re-derived by hand — missing mass contributes factor
    1 to both likelihoods, joins λ's average, and is EXCLUDED from the
    feature's m/u numerators and denominators."""
    from pubmed_and_method_spark.operators.er_metrics import fs_em_missing

    rows = [(1,)] * 4 + [(0,)] * 6 + [(-1,)] * 5
    df = spark.createDataFrame(rows, "f int")
    r = fs_em_missing(df, ["f"], n_iter=1).collect()[0]
    w1 = 0.1 * 0.9 / (0.1 * 0.9 + 0.9 * 0.1)          # = 0.5
    w0 = 0.1 * 0.1 / (0.1 * 0.1 + 0.9 * 0.9)
    wm = 0.1 / (0.1 + 0.9)                             # factor-1 pattern
    sw = w1 * 4 + w0 * 6 + wm * 5
    dm = w1 * 4 + w0 * 6
    du = (1 - w1) * 4 + (1 - w0) * 6
    sync = lambda x: round(min(max(x, 1e-6), 1 - 1e-6), 12)  # noqa: E731
    assert r.lambda_match == round(sync(sw / 15), 6)
    assert r.m_prob == round(sync(w1 * 4 / dm), 6)
    assert r.u_prob == round(sync((1 - w1) * 4 / du), 6)
    assert r.missing_share == round(5 / 15, 6)


def test_fs_em_missing_mass_inert_for_feature_params(spark):
    """At n_iter=1 the responsibility of every non-missing pattern
    depends only on the (shared) inits, so adding missing-only rows
    must leave that feature's m/u untouched — the MAR guarantee the
    zero-fill treatment (fs_em with missing->0) violates."""
    from pubmed_and_method_spark.operators.er_metrics import (
        fs_em,
        fs_em_missing,
    )

    base = [(1,)] * 4 + [(0,)] * 6
    with_miss = base + [(-1,)] * 20
    a = fs_em_missing(
        spark.createDataFrame(base, "f int"), ["f"], n_iter=1
    ).collect()[0]
    b = fs_em_missing(
        spark.createDataFrame(with_miss, "f int"), ["f"], n_iter=1
    ).collect()[0]
    assert (a.m_prob, a.u_prob) == (b.m_prob, b.u_prob)
    # the zero-fill treatment DOES move the params on the same data
    zf = fs_em(
        spark.createDataFrame(
            [(max(v, 0),) for (v,) in with_miss], "f int"
        ),
        ["f"],
        n_iter=1,
    ).collect()[0]
    assert (zf.m_prob, zf.u_prob) != (b.m_prob, b.u_prob)


def test_fs_em_missing_rejects_bad_values(spark):
    import pytest as _pytest

    from pubmed_and_method_spark.operators.er_metrics import fs_em_missing

    df = spark.createDataFrame([(2,), (1,)], "f int")
    with _pytest.raises(ValueError):
        fs_em_missing(df, ["f"])


def test_fs_em_missing_no_missing_equals_fs_em(spark):
    """With zero missing values the 3-state estimator must reproduce
    fs_em exactly (same trajectory, same outputs)."""
    from pubmed_and_method_spark.operators.er_metrics import (
        fs_em,
        fs_em_missing,
    )

    rows = [(1, 1)] * 30 + [(0, 0)] * 70 + [(1, 0)] * 5
    df = spark.createDataFrame(rows, "fa int, fb int")
    a = {r.feature: r for r in fs_em(df, ["fa", "fb"], n_iter=5).collect()}
    b = {
        r.feature: r
        for r in fs_em_missing(df, ["fa", "fb"], n_iter=5).collect()
    }
    for f in ("fa", "fb"):
        assert (a[f].m_prob, a[f].u_prob, a[f].lambda_match) == (
            b[f].m_prob,
            b[f].u_prob,
            b[f].lambda_match,
        )
        assert b[f].missing_share == 0.0


def test_fs_classify_hand_computed(spark):
    """Two-feature decision rule with hand weights: scores sum the
    per-feature agreement/disagreement weights and the three-way
    decision is inclusive at both thresholds (>= upper links,
    <= lower rejects)."""
    from pubmed_and_method_spark.operators.er_metrics import fs_classify

    weights = {"fa": (3.0, -1.0), "fb": (2.0, -2.0)}
    rows = [
        ("p1", 1, 1),   # 3 + 2 = 5 -> link
        ("p2", 1, 0),   # 3 - 2 = 1 -> possible
        ("p3", 0, 1),   # -1 + 2 = 1 -> possible
        ("p4", 0, 0),   # -1 - 2 = -3 -> nonlink
        ("p5", 1, 1),   # boundary: upper = 5 -> still link (>=)
    ]
    df = spark.createDataFrame(rows, "pid string, fa int, fb int")
    got = {
        r.pid: r for r in fs_classify(df, weights, upper=5.0, lower=-3.0)
        .collect()
    }
    assert (got["p1"].llr, got["p1"].decision) == (5.0, "link")
    assert (got["p2"].llr, got["p2"].decision) == (1.0, "possible")
    assert (got["p3"].llr, got["p3"].decision) == (1.0, "possible")
    assert (got["p4"].llr, got["p4"].decision) == (-3.0, "nonlink")
    assert got["p5"].decision == "link"


def test_threshold_sweep_empty_input(spark):
    """Zero pairs still yields n_bins total-ordered rows, all zeros."""
    from pubmed_and_method_spark.operators.er_metrics import threshold_sweep

    df = spark.createDataFrame([], "score double, same_entity int")
    rows = threshold_sweep(df, n_bins=5).collect()
    assert len(rows) == 5
    assert all(
        (r.tp, r.fp, r.fn, r.precision, r.recall, r.f1)
        == (0, 0, 0, 0.0, 0.0, 0.0)
        for r in rows
    )


def test_sorted_neighborhood_rank_definition(spark):
    """SNB pairs == every (i, i+d) of the total order for d < window,
    independent of partition count (empty range partitions included);
    window < 2 rejected."""
    from pubmed_and_method_spark.operators.blocking import (
        sorted_neighborhood_pairs,
    )

    rows = [(f"m{i:02d}", k) for i, k in enumerate("bacbddaacab")]
    df = spark.createDataFrame(rows, "mid string, k string")
    order = sorted(rows, key=lambda r: (r[1], r[0]))
    w = 3
    expected = {
        (order[i][0], order[i + d][0], d)
        for i in range(len(order))
        for d in range(1, w)
        if i + d < len(order)
    }
    for nparts in (1, 3, 8):
        got = {
            (r.mid1, r.mid2, r.sort_dist)
            for r in sorted_neighborhood_pairs(
                df, ["k"], id_col="mid", window=w, num_partitions=nparts
            ).collect()
        }
        assert got == expected, f"nparts={nparts}"
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(df, ["k"], id_col="mid", window=1)


def test_meta_blocking_hand_computed(spark):
    """4-record token-block collection with one purged oversized
    block: CBS/Jaccard weights and WNP keep/prune decisions match the
    hand derivation (incl. edges kept only via the weaker endpoint's
    threshold)."""
    from pubmed_and_method_spark.operators.meta_blocking import (
        pair_block_weights,
        weighted_node_pruning,
    )

    memb = [
        ("b1", "A"), ("b1", "B"), ("b1", "C"),
        ("b2", "A"), ("b2", "B"),
        ("b3", "B"), ("b3", "C"), ("b3", "D"),
        ("b4", "A"), ("b4", "D"),
        # oversized (4 > 3): must be purged before pairing
        ("b5", "A"), ("b5", "B"), ("b5", "C"), ("b5", "D"),
    ]
    df = spark.createDataFrame(memb, "block_key string, mention_id string")
    w = pair_block_weights(df, max_block_size=3)
    got = {
        (r.mention_id1, r.mention_id2): (r.cbs, r.nb1, r.nb2, r.js)
        for r in w.collect()
    }
    assert got == {
        ("A", "B"): (2, 3, 3, 0.5),
        ("A", "C"): (1, 3, 2, 0.25),
        ("A", "D"): (1, 3, 2, 0.25),
        ("B", "C"): (2, 3, 2, 2 / 3),
        ("B", "D"): (1, 3, 2, 0.25),
        ("C", "D"): (1, 2, 2, 1 / 3),
    }
    pruned = weighted_node_pruning(w, weight_col="cbs")
    kept = {
        (r.mention_id1, r.mention_id2): r.kept for r in pruned.collect()
    }
    # node means: A=4/3, B=5/3, C=4/3, D=1
    assert kept == {
        ("A", "B"): 1,   # 2 >= 4/3
        ("A", "C"): 0,   # 1 < 4/3 both sides -> the pruned edge
        ("A", "D"): 1,   # kept only via D's threshold (1 >= 1)
        ("B", "C"): 1,
        ("B", "D"): 1,   # kept only via D
        ("C", "D"): 1,   # kept only via D
    }


def test_greedy_one_to_one_matching(spark):
    """Parallel local-dominance matching == sequential greedy by
    (score, l, r): conflict resolution across rounds, rank-aligned
    resolution of an equal-score clique (one match per round), and the
    non-convergence guard."""
    from pubmed_and_method_spark.operators.linkage import greedy_one_to_one

    edges = [
        ("L1", "R1", 0.9), ("L1", "R2", 0.8),
        ("L2", "R1", 0.8), ("L2", "R2", 0.7),
    ]
    df = spark.createDataFrame(edges, "left_id string, right_id string, score double")
    got = {
        (r.left_id, r.right_id): r.round_matched
        for r in greedy_one_to_one(df).collect()
    }
    assert got == {("L1", "R1"): 1, ("L2", "R2"): 2}

    clique = [
        (l, r, 0.5) for l in ("L1", "L2", "L3") for r in ("R1", "R2", "R3")
    ]
    cdf = spark.createDataFrame(
        clique, "left_id string, right_id string, score double"
    )
    got2 = {
        (r.left_id, r.right_id): r.round_matched
        for r in greedy_one_to_one(cdf).collect()
    }
    # ties break by descending id: (L3,R3) then (L2,R2) then (L1,R1)
    assert got2 == {
        ("L3", "R3"): 1, ("L2", "R2"): 2, ("L1", "R1"): 3,
    }

    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="did not converge"):
        greedy_one_to_one(cdf, rounds=2)

    empty = spark.createDataFrame(
        [], "left_id string, right_id string, score double"
    )
    assert greedy_one_to_one(empty).count() == 0


def test_bloom_encoding_matches_reference(spark):
    """Spark Bloom encodings match an independent hashlib re-derivation
    bit-for-bit; self-Dice is 1.0; Dice is symmetric; similar names
    score far above dissimilar ones."""
    import hashlib

    from pubmed_and_method_spark.operators.pprl import (
        bloom_bits,
        dice_similarity,
    )

    def ref(name, m=256, k=4, gl=2):
        p = "_" + name.lower() + "_"
        pos = set()
        for i in range(len(p) - gl + 1):
            g = p[i : i + gl]
            for h in range(k):
                pos.add(
                    int(
                        hashlib.md5((g + f"#{h}").encode()).hexdigest()[:8],
                        16,
                    )
                    % m
                )
        return sorted(pos)

    names = ["Smith", "smyth", "garcia", "", "a"]
    df = spark.createDataFrame([(n,) for n in names], "name string")
    got = {
        r.name: list(r.b)
        for r in df.select("name", bloom_bits("name").alias("b")).collect()
    }
    assert got == {n: ref(n) for n in names}

    d = (
        df.alias("x")
        .crossJoin(df.alias("y"))
        .select(
            F.col("x.name").alias("a"),
            F.col("y.name").alias("b"),
            dice_similarity(
                bloom_bits("x.name"), bloom_bits("y.name")
            ).alias("dice"),
        )
        .collect()
    )
    dd = {(r.a, r.b): r.dice for r in d}
    for n in names:
        assert abs(dd[(n, n)] - 1.0) < 1e-12
    assert dd[("Smith", "smyth")] == dd[("smyth", "Smith")]
    assert dd[("Smith", "smyth")] > 0.6 > 0.2 > dd[("Smith", "garcia")]


def test_common_neighbor_features_hand_computed(spark):
    """Triangle + pendant evidence graph: cn and neighborhood Jaccard
    match the hand derivation; unknown nodes score zero; the degree
    cap drops hubs from the neighbor role only."""
    from pubmed_and_method_spark.operators.graph_features import (
        common_neighbor_features,
    )

    ev = [("x1", "x2"), ("x1", "x3"), ("x2", "x3"), ("x3", "x4")]
    edges = spark.createDataFrame(ev, "id1 string, id2 string")
    cand = spark.createDataFrame(
        [("x1", "x2"), ("x1", "x4"), ("x2", "x4"), ("x1", "x5")],
        "id1 string, id2 string",
    )
    got = {
        (r.id1, r.id2): (r.cn, round(r.nbr_jaccard, 6))
        for r in common_neighbor_features(cand, edges).collect()
    }
    assert got == {
        ("x1", "x2"): (1, round(1 / 3, 6)),
        ("x1", "x4"): (1, 0.5),
        ("x2", "x4"): (1, 0.5),
        ("x1", "x5"): (0, 0.0),
    }
    capped = {
        (r.id1, r.id2): r.cn
        for r in common_neighbor_features(
            cand, edges, max_degree=1
        ).collect()
    }
    # x1/x2/x3 exceed the cap -> excluded as NEIGHBORS; every common
    # neighbor in this graph was one of them
    assert capped == {
        ("x1", "x2"): 0, ("x1", "x4"): 0, ("x2", "x4"): 0, ("x1", "x5"): 0,
    }


def test_block_filtering_hand_computed(spark):
    """Per-record smallest-blocks keep rule on a hand-sized
    collection: ranks order by (block_size, key), the integer keep
    rule equals rank <= ceil(0.8*nb), and ties break by key."""
    from pubmed_and_method_spark.operators.meta_blocking import (
        block_filtering,
    )

    memb = [
        # sizes: k1=2, k2=2, k3=3, k4=4, k5=5
        ("k1", "A"), ("k1", "B"),
        ("k2", "A"), ("k2", "C"),
        ("k3", "A"), ("k3", "B"), ("k3", "C"),
        ("k4", "A"), ("k4", "B"), ("k4", "C"), ("k4", "D"),
        ("k5", "A"), ("k5", "B"), ("k5", "C"), ("k5", "D"), ("k5", "E"),
    ]
    df = spark.createDataFrame(memb, "block_key string, mention_id string")
    got = {
        (r.mention_id, r.block_key): (r.block_size, r.nb, r.rnk, r.kept)
        for r in block_filtering(df).collect()
    }
    # A has nb=5 -> keep ceil(0.8*5)=4: drops only its biggest (k5)
    assert got[("A", "k1")] == (2, 5, 1, 1)
    assert got[("A", "k2")] == (2, 5, 2, 1)   # tie with k1 -> key order
    assert got[("A", "k3")] == (3, 5, 3, 1)
    assert got[("A", "k4")] == (4, 5, 4, 1)
    assert got[("A", "k5")] == (5, 5, 5, 0)
    # E has nb=1 -> always keeps its single block
    assert got[("E", "k5")] == (5, 1, 1, 1)
    # D has nb=2 -> ceil(1.6)=2: keeps both
    assert got[("D", "k4")][3] == 1 and got[("D", "k5")][3] == 1
    # B/C have nb=4 -> ceil(3.2)=4: keep all four
    assert all(v[3] == 1 for k, v in got.items() if k[0] in ("B", "C"))


def test_block_filtering_quality(spark):
    """On the hard corpus's schema-agnostic collection, dropping each
    record's biggest fifth of blocks cuts candidate-pair volume by
    >25% while keeping >=99% of the true pairs the full collection
    covers — the PVLDB'16 trade the operator exists to make."""
    from itertools import combinations

    from pubmed_and_method_spark.functions.names import phonetic_key
    from pubmed_and_method_spark.operators.meta_blocking import (
        block_filtering,
    )
    from pubmed_and_method_spark.plans.pipeline import build_signatures
    from pubmed_and_method_spark.sources.datagen import transcripts_df

    t, g = transcripts_df(spark, seed=42, hardness=0.7)
    sig = build_signatures(t, tfidf=False)
    named = sig.filter(F.col("block_key") != "__unblocked__")
    mid = F.col("mention_id")
    members = (
        named.select(mid, F.concat(F.lit("sn_"), "surname").alias("block_key"))
        .unionAll(
            named.select(
                mid, F.concat(F.lit("gv_"), "given_name").alias("block_key")
            )
        )
        .unionAll(
            named.select(
                mid,
                F.concat(F.lit("ph_"), phonetic_key("surname")).alias(
                    "block_key"
                ),
            )
        )
        .unionAll(
            named.select(mid, F.explode("tool_profile").alias("tool")).select(
                mid, F.concat(F.lit("tl_"), "tool").alias("block_key")
            )
        )
    )
    filt = block_filtering(members).collect()
    truth = {
        r.conv_id: r.entity_id
        for r in g.select("conv_id", "entity_id").collect()
    }

    def pair_sets(rows):
        blocks = {}
        for r in rows:
            blocks.setdefault(r.block_key, set()).add(r.mention_id)
        cands, true = set(), set()
        for ms in blocks.values():
            for a, b in combinations(sorted(ms), 2):
                cands.add((a, b))
                if truth[a.split("#")[0]] == truth[b.split("#")[0]]:
                    true.add((a, b))
        return cands, true

    all_c, all_t = pair_sets(filt)
    kept_c, kept_t = pair_sets([r for r in filt if r.kept == 1])
    assert len(kept_c) < 0.75 * len(all_c), (len(kept_c), len(all_c))
    assert len(kept_t) >= 0.99 * len(all_t), (len(kept_t), len(all_t))


def test_soft_tfidf_hand_computed(spark):
    """Soft-TF-IDF on a 4-mention corpus re-derived with python math
    step for step (round-6 idf -> fold norm -> round-6 V -> round-6
    JW best -> CLOSE cut -> index-order fold): the typo'd rare
    surname pair scores far above the exact-common-token pair, and a
    below-threshold best contributes exactly zero."""
    import math

    from pubmed_and_method_spark.functions.strings import jaro_winkler
    from pubmed_and_method_spark.operators.token_similarity import (
        soft_tfidf_scores,
    )

    corpus = [
        ("m1", ["maria", "santos"]),
        ("m2", ["maria", "santoz"]),
        ("m3", ["maria", "lopez"]),
        ("m4", ["jose", "lopez"]),
    ]
    cdf = spark.createDataFrame(
        corpus, "mention_id string, toks array<string>"
    )
    pairs = [
        ("m1", "m2", ["maria", "santos"], ["maria", "santoz"]),
        ("m1", "m3", ["maria", "santos"], ["maria", "lopez"]),
    ]
    pdf = spark.createDataFrame(
        pairs,
        "mention_id1 string, mention_id2 string, "
        "toks1 array<string>, toks2 array<string>",
    )
    got = {
        (r.mention_id1, r.mention_id2): (r.st_fwd, r.st_bwd, r.soft_tfidf)
        for r in soft_tfidf_scores(
            pdf, cdf, toks1_col="toks1", toks2_col="toks2"
        ).collect()
    }

    # python twin with the same rounding/fold discipline
    n = len(corpus)
    df_ = {}
    for _, ts in corpus:
        for t in set(ts):
            df_[t] = df_.get(t, 0) + 1
    idf = {t: round(math.log((n + 1) / (d + 1)), 6) for t, d in df_.items()}
    toks = dict(corpus)

    def v(mid):
        acc = 0.0
        for t in toks[mid]:
            acc += idf[t] * idf[t]
        nr = math.sqrt(acc)
        return {t: round(idf[t] / nr, 6) for t in toks[mid]}

    def directed(a, b):
        va, vb = v(a), v(b)
        acc = 0.0
        for t in toks[a]:
            jw, ptok = max(
                (round(jaro_winkler(t, s), 6), s) for s in toks[b]
            )
            acc += va[t] * vb[ptok] * jw if jw >= 0.9 else 0.0
        return acc

    for a, b in (("m1", "m2"), ("m1", "m3")):
        fwd, bwd = directed(a, b), directed(b, a)
        assert got[(a, b)] == (
            round(fwd, 6),
            round(bwd, 6),
            round((fwd + bwd) / 2, 6),
        )
    # the typo'd RARE surname pair dominates the exact-common pair:
    # (m1,m3) agree only on ubiquitous 'maria' (lopez vs santos is
    # below CLOSE), (m1,m2) add the heavy santos~santoz JW match
    assert got[("m1", "m2")][2] > 2 * got[("m1", "m3")][2]


def test_greedy_blocking_scheme_hand_computed(spark):
    """Marginal accounting on a fixture where isolated recall lies:
    scheme A covers true pairs {p1,p2} at cost 3, B covers {p1,p2,p3}
    at cost 5, C covers {p2} at cost 1 (subsumed).  Greedy must pick
    B first (3 true), then A adds NOTHING true (marginal 1 candidate,
    0 true) vs C (0 new candidates... C's pair is covered) -> after B,
    both A and C have marginal_true 0; fewest new candidates wins."""
    from pubmed_and_method_spark.operators.blocking import (
        greedy_blocking_scheme,
    )

    rows = [
        # scheme, id1, id2, y
        ("A", "p1a", "p1b", 1), ("A", "p2a", "p2b", 1), ("A", "n1a", "n1b", 0),
        ("B", "p1a", "p1b", 1), ("B", "p2a", "p2b", 1), ("B", "p3a", "p3b", 1),
        ("B", "n2a", "n2b", 0), ("B", "n3a", "n3b", 0),
        ("C", "p2a", "p2b", 1),
    ]
    df = spark.createDataFrame(
        rows, "scheme string, mention_id1 string, mention_id2 string,"
        " same_entity int"
    )
    got = greedy_blocking_scheme(df, total_true=4).collect()
    assert [r.scheme for r in got] == ["B", "C", "A"]
    r1, r2, r3 = got
    assert (r1.marginal_candidates, r1.marginal_true) == (5, 3)
    # C after B: its only pair is covered -> 0/0; A would add 1 new
    # non-true candidate -> C wins the (mt, mc) tie at 0 true
    assert (r2.marginal_candidates, r2.marginal_true) == (0, 0)
    assert (r3.marginal_candidates, r3.marginal_true) == (1, 0)
    assert (r3.cum_candidates, r3.cum_true) == (6, 3)
    assert r3.cum_recall == round(3 / 4, 6)
    # duplicates within a scheme are deduped before counting
    dup = df.unionByName(df)
    again = greedy_blocking_scheme(dup, total_true=4).collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in got]


def test_linkage_waterfall_consumption(spark):
    """Tier semantics by hand: all qualifying pairs fire SIMULTANEOUSLY
    within a tier, and records matched by an earlier tier are consumed
    — a later tier's rule firing on a consumed endpoint yields no
    match."""
    from pyspark.sql import functions as F

    from pubmed_and_method_spark.operators.linkage import (
        linkage_waterfall,
    )

    rows = [
        ("x", "y", True, False, False),   # tier a
        ("x", "z", False, True, True),    # x consumed at tier a -> none
        ("u", "v", False, True, False),   # tier b
        ("u", "w", False, False, True),   # u consumed at tier b -> none
        ("p", "q", False, False, True),   # tier c
        ("r", "s", False, False, False),  # no rule fires
    ]
    df = spark.createDataFrame(
        rows,
        "mention_id1 string, mention_id2 string, ca boolean, "
        "cb boolean, cc boolean",
    )
    got = {
        (r.mention_id1, r.mention_id2): r.tier
        for r in linkage_waterfall(
            df,
            [("a", F.col("ca")), ("b", F.col("cb")), ("c", F.col("cc"))],
        ).collect()
    }
    assert got == {("x", "y"): "a", ("u", "v"): "b", ("p", "q"): "c"}


def test_merge_distance_hand_computed(spark):
    """{A:[e1,e1,e2], B:[e1], C:[e3]}: A spans 2 entities (1 split),
    e1 spans 2 clusters (1 merge) -> gmd 2; VI re-derived from the
    same cells with math.log in the test body."""
    import math

    from pubmed_and_method_spark.operators.er_metrics import (
        merge_distance_metrics,
    )

    rows = [
        ("A", "e1"), ("A", "e1"), ("A", "e2"), ("B", "e1"), ("C", "e3"),
    ]
    df = spark.createDataFrame(rows, "cluster string, entity_id string")
    r = merge_distance_metrics(df).collect()[0]
    assert (r.n_items, r.n_clusters, r.n_entities) == (5, 3, 3)
    assert (r.n_splits, r.n_merges, r.gmd) == (1, 1, 2)
    # H(E|C): cells (A,e1,2)/n_c=3, (A,e2,1)/3, (B,e1,1)/1, (C,e3,1)/1
    lec = 2 * math.log(2 / 3) + math.log(1 / 3)
    # H(C|E): n_e(e1)=3 -> (A,e1,2): ln(2/3), (B,e1,1): ln(1/3)
    lce = 2 * math.log(2 / 3) + math.log(1 / 3)
    vi = (-lec - lce) / 5
    assert r.vi == round(vi, 6)
    assert r.vi_norm == round(vi / math.log(5), 6)


def test_merge_distance_perfect_and_empty(spark):
    """A clustering identical to truth needs zero edits and has VI 0;
    empty input yields one all-zero row."""
    from pubmed_and_method_spark.operators.er_metrics import (
        merge_distance_metrics,
    )

    perfect = spark.createDataFrame(
        [("A", "e1"), ("A", "e1"), ("B", "e2")],
        "cluster string, entity_id string",
    )
    r = merge_distance_metrics(perfect).collect()[0]
    assert (r.n_splits, r.n_merges, r.gmd) == (0, 0, 0)
    assert (r.vi, r.vi_norm) == (0.0, 0.0)

    empty = spark.createDataFrame([], "cluster string, entity_id string")
    r = merge_distance_metrics(empty).collect()[0]
    assert (r.n_items, r.n_splits, r.n_merges, r.gmd) == (0, 0, 0, 0)
    assert (r.vi, r.vi_norm) == (0.0, 0.0)


def test_calibration_hand_computed(spark):
    """Balanced prior (lpo = 0): llr +-2 -> posteriors 0.8 / 0.2, so
    bins 8 and 2; every rate, gap, Brier, and ECE re-derived by
    hand."""
    from pubmed_and_method_spark.operators.er_metrics import (
        calibration_table,
    )

    rows = [(2.0, 1), (2.0, 1), (-2.0, 0), (-2.0, 0)]
    df = spark.createDataFrame(rows, "llr double, same_entity int")
    got = {r.bin: r for r in calibration_table(df).collect()}
    assert set(got) == {2, 8}
    hi, lo = got[8], got[2]
    assert (hi.n_pairs, hi.n_match, hi.match_rate, hi.avg_post) == (
        2, 2, 1.0, 0.8,
    )
    assert (lo.n_pairs, lo.n_match, lo.match_rate, lo.avg_post) == (
        2, 0, 0.0, 0.2,
    )
    assert hi.gap == lo.gap == 0.2
    # Brier: (2*(0.8-1)^2 + 2*(0.2-0)^2)/4; ECE: (2*0.2 + 2*0.2)/4
    assert hi.brier == lo.brier == 0.04
    assert hi.ece == lo.ece == 0.2


def test_calibration_prior_odds(spark):
    """Unbalanced labels shift the posterior by the prior log-odds:
    all-zero LLRs land every pair at the base rate, a perfectly
    calibrated (gap 0) single bin."""
    import math

    from pubmed_and_method_spark.operators.er_metrics import (
        calibration_table,
    )

    rows = [(0.0, 1)] + [(0.0, 0)] * 3
    df = spark.createDataFrame(rows, "llr double, same_entity int")
    out = calibration_table(df).collect()
    assert len(out) == 1
    r = out[0]
    lpo = round(math.log2(1 / 3), 6)
    p = round(1 / (1 + 2 ** (-lpo)), 6)
    assert r.bin == int(p * 10)
    assert (r.n_pairs, r.n_match, r.match_rate) == (4, 1, 0.25)
    assert r.avg_post == p
    assert r.gap == round(abs(0.25 - p), 6)


def test_group_linkage_hand_computed(spark):
    """A1{k1,k2,k3} x B1{k1,k2} -> 2/3; A2{k4} x B2{k4,k5} -> 1/2;
    duplicate member rows dedupe (set semantics); min_jaccard
    filters; the stop-key cap drops promiscuous keys."""
    from pubmed_and_method_spark.operators.group_linkage import (
        group_linkage,
    )

    a = spark.createDataFrame(
        [("A1", "k1"), ("A1", "k1"), ("A1", "k2"), ("A1", "k3"),
         ("A2", "k4")],
        "group_id string, member_key string",
    )
    b = spark.createDataFrame(
        [("B1", "k1"), ("B1", "k2"), ("B2", "k4"), ("B2", "k5"),
         ("B3", "k9")],
        "group_id string, member_key string",
    )
    got = {
        (r.group_a, r.group_b): r
        for r in group_linkage(a, b).collect()
    }
    assert set(got) == {("A1", "B1"), ("A2", "B2")}
    r = got[("A1", "B1")]
    assert (r.n_a, r.n_b, r.n_common) == (3, 2, 2)
    assert r.jaccard == round(2 / 3, 6)
    assert got[("A2", "B2")].jaccard == 0.5

    only_hi = group_linkage(a, b, min_jaccard=0.6).collect()
    assert [(r.group_a, r.group_b) for r in only_hi] == [("A1", "B1")]

    # max_key_freq=1 drops every shared key (each appears twice across
    # the deduped sides), leaving no candidate pairs at all.
    assert group_linkage(a, b, max_key_freq=1).count() == 0


def test_suffix_blocking_hand_computed(spark):
    """RSA semantics by hand: a prefix disturbance of ANY length pairs
    via the shared tail; no shared >=min_suffix_len tail -> no pair;
    short strings key whole (equal shorts still pair); the block-size
    cap drops a promiscuous suffix ENTIRELY."""
    from pubmed_and_method_spark.operators.blocking import (
        suffix_blocking_pairs,
    )

    rows = [
        (1, "vandenberg"), (2, "berg"),      # dropped particle
        (3, "smith"), (4, "smyth"),          # common tail "th" only
        (5, "ith"),                          # short: keys whole
        (7, "li"), (8, "li"),                # equal shorts pair
    ]
    df = spark.createDataFrame(rows, "mention_id long, surname string")
    got = {
        (r.mention_id1, r.mention_id2): r.common_suffix_len
        for r in suffix_blocking_pairs(df, "mention_id", "surname").collect()
    }
    assert got == {(1, 2): 4, (7, 8): 2}

    trio = spark.createDataFrame(
        [(1, "mason"), (2, "jason"), (3, "cason")],
        "mention_id long, surname string",
    )
    at3 = sorted(
        (r.mention_id1, r.mention_id2)
        for r in suffix_blocking_pairs(
            trio, "mention_id", "surname", max_block_size=3
        ).collect()
    )
    assert at3 == [(1, 2), (1, 3), (2, 3)]
    # cap 2: the only shared suffix block ("ason") holds 3 records ->
    # dropped whole, nothing pairs
    at2 = suffix_blocking_pairs(
        trio, "mention_id", "surname", max_block_size=2
    ).collect()
    assert at2 == []


def test_suffix_blocking_equals_model(spark):
    """Pair set == the brute-force RSA model (suffix inventory ->
    cap-filtered eligible keys -> within-key pairs) on a seeded
    pseudo-random corpus, including common_suffix_len."""
    import random

    from pubmed_and_method_spark.operators.blocking import (
        suffix_blocking_pairs,
    )

    rng = random.Random(42)
    frags = ["berg", "son", "de", "van", "wit", "man", "stra", "ko"]
    rows = [
        (i, "".join(rng.choice(frags) for _ in range(rng.randint(1, 3))))
        for i in range(60)
    ]
    min_len, cap = 4, 12

    def suffixes(s):
        if len(s) < min_len:
            return {s}
        return {s[i:] for i in range(0, len(s) - min_len + 1)}

    inv = {}
    for i, s in rows:
        for v in suffixes(s):
            inv.setdefault(v, []).append(i)
    eligible = {v: ids for v, ids in inv.items() if len(ids) <= cap}
    want = set()
    for ids in eligible.values():
        for a in ids:
            for b in ids:
                if a < b:
                    want.add((a, b))

    def common_suffix(s1, s2):
        n = 0
        while (
            n < min(len(s1), len(s2))
            and s1[len(s1) - 1 - n] == s2[len(s2) - 1 - n]
        ):
            n += 1
        return n

    by_id = dict(rows)
    df = spark.createDataFrame(rows, "mention_id long, surname string")
    got = {
        (r.mention_id1, r.mention_id2): r.common_suffix_len
        for r in suffix_blocking_pairs(
            df, "mention_id", "surname",
            min_suffix_len=min_len, max_block_size=cap,
        ).collect()
    }
    assert set(got) == want
    for (a, b), n in got.items():
        assert n == common_suffix(by_id[a], by_id[b])


def test_cluster_cohesion_hand_computed(spark):
    """Triangle (clique), 4-chain, and 4-star: density, min degree,
    and leaf counts hand-computed; duplicate/reversed/self edges
    collapse first."""
    from pubmed_and_method_spark.operators.graph_features import (
        cluster_cohesion,
    )

    edges = [
        ("a", "b"), ("b", "c"), ("c", "a"),          # triangle
        ("b", "a"), ("a", "a"),                      # dup/reverse/self
        ("d", "e"), ("e", "f"), ("f", "g"),          # chain
        ("h", "i"), ("h", "j"), ("h", "k"),          # star
    ]
    df = spark.createDataFrame(edges, ["u", "v"])
    out = {r.component: r for r in cluster_cohesion(df, "u", "v").collect()}
    assert set(out) == {"a", "d", "h"}
    tri, chain, star = out["a"], out["d"], out["h"]
    assert (tri.n_nodes, tri.n_edges, tri.density) == (3, 3, 1.0)
    assert (tri.min_degree, tri.n_leaf_nodes) == (2, 0)
    assert (chain.n_nodes, chain.n_edges, chain.density) == (4, 3, 0.5)
    assert (chain.min_degree, chain.n_leaf_nodes) == (1, 2)
    assert (star.n_nodes, star.n_edges, star.density) == (4, 3, 0.5)
    assert (star.min_degree, star.n_leaf_nodes) == (1, 3)


def test_propagate_scores_promotion_and_decay(spark):
    """A borderline pair inside an agreeing triangle is promoted;
    an isolated high pair decays geometrically; exact micro-int
    arithmetic re-derived by hand."""
    from pubmed_and_method_spark.operators.graph_features import (
        propagate_scores,
    )

    rows = [
        ("a", "b", 0.55),  # borderline, but a and b share neighbor c
        ("a", "c", 0.9),
        ("b", "c", 0.9),
        ("d", "e", 0.9),   # isolated high pair: no shared structure
    ]
    df = spark.createDataFrame(rows, ["id1", "id2", "score"])
    out = {
        (r.id1, r.id2): r
        for r in propagate_scores(df, rounds=2).collect()
    }
    ab = out[("a", "b")]
    # round 1: jacc(a,b) = 1 (both see only c) ->
    # (7*550000 + 3*1000000)//10 = 685000 — promoted past the bar
    assert ab.score_1 == 0.685
    # round 2: the promoted edge thickens the graph, jacc drops to
    # 1/3 -> (7*685000 + 3*333333)//10 = 579499
    assert ab.score_2 == 0.579499
    de = out[("d", "e")]
    # no common neighbor ever: pure decay 0.9 -> 0.63 -> 0.441
    assert (de.score_1, de.score_2) == (0.63, 0.441)
    assert de.promoted == 0
    # at rounds=1 the triangle promotion IS the outcome
    one = {
        (r.id1, r.id2): r
        for r in propagate_scores(df, rounds=1).collect()
    }
    assert one[("a", "b")].promoted == 1
    assert one[("a", "b")].score_1 == 0.685


def test_knn_sparsify_hand_computed(spark):
    """Star + clique fixture: union keeps every node's top-3, mutual
    kills one-sided hub attachments; reversed/dup edges collapse."""
    from pubmed_and_method_spark.operators.graph_features import (
        knn_sparsify,
    )

    edges = [
        # hub h with 5 satellites at descending scores
        ("h", "s1", 0.9), ("h", "s2", 0.8), ("h", "s3", 0.7),
        ("h", "s4", 0.6), ("h", "s5", 0.5),
        ("s1", "h", 0.9),  # reversed dup
        # triangle among satellites s4, s5, s6 (their own best edges)
        ("s4", "s5", 0.95), ("s4", "s6", 0.94), ("s5", "s6", 0.93),
    ]
    df = spark.createDataFrame(edges, ["id1", "id2", "score"])
    out = {
        (r.id1, r.id2): r.kept_by
        for r in knn_sparsify(df, k=3).collect()
    }
    # h keeps only its top-3: h-s4, h-s5 dropped from h's list, but
    # s4/s5 keep h within THEIR top-3? s4's edges: s5 .95, s6 .94,
    # h .6 -> h is rank 3 -> kept one-sided; s5: s4 .95, s6 .93,
    # h .5 -> rank 3 -> kept one-sided.
    assert out[("h", "s1")] == 2  # top for both
    assert out[("h", "s4")] == 1 and out[("h", "s5")] == 1
    assert ("s4", "s5") in out and out[("s4", "s5")] == 2
    # mutual mode drops the one-sided hub tails
    mut = {
        (r.id1, r.id2)
        for r in knn_sparsify(df, k=3, mutual=True).collect()
    }
    assert ("h", "s4") not in mut and ("h", "s5") not in mut
    assert ("h", "s1") in mut and ("s4", "s5") in mut
    # mutual=True at k=1 is the reciprocal-top-1 rule
    top1 = {
        (r.id1, r.id2)
        for r in knn_sparsify(df, k=1, mutual=True).collect()
    }
    # h<->s1 reciprocal best (0.9 both ways); s4<->s5 likewise (0.95);
    # s6's best is s4 whose best is s5 -> not mutual
    assert top1 == {("h", "s1"), ("s4", "s5")}
