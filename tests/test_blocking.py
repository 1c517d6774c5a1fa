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
