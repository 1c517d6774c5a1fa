"""Incremental cluster assignment invariants: argmax determinism,
integer threshold semantics, singleton fallback, catalog stability."""

import pytest
from pyspark.sql import functions as F

from pubmed_and_method_spark.operators.incremental_assign import (
    assign_to_clusters,
)


def _run(spark, new_rows, cat_rows, num=1, den=2):
    new = spark.createDataFrame(new_rows, "id long, block string, toks array<string>")
    cat = spark.createDataFrame(
        cat_rows, "member_id long, cluster long, block string, toks array<string>"
    )
    out = assign_to_clusters(new, cat, num=num, den=den).collect()
    return {r.id: r for r in out}


def test_best_cluster_wins_and_counts_reported(spark):
    # new doc {a,b,c}: member 10 (cluster 1) shares 2/4, member 20
    # (cluster 2) shares 3/3 -> cluster 2 wins at threshold 1/2
    got = _run(
        spark,
        [(100, "a", ["a", "b", "c"])],
        [
            (10, 1, "a", ["a", "b", "x"]),
            (20, 2, "a", ["a", "b", "c"]),
        ],
    )
    r = got[100]
    assert (r.cluster, r.is_new_cluster, r.n_inter, r.n_union) == (2, 0, 3, 3)


def test_below_threshold_opens_singleton(spark):
    got = _run(
        spark,
        [(100, "a", ["a", "b", "c", "d"])],
        [(10, 1, "a", ["a", "x", "y", "z"])],  # jacc 1/7 < 1/2
    )
    r = got[100]
    assert (r.cluster, r.is_new_cluster, r.n_inter, r.n_union) == (100, 1, 0, 0)


def test_no_candidate_block_opens_singleton(spark):
    got = _run(
        spark,
        [(100, "zz", ["a", "b"])],
        [(10, 1, "a", ["a", "b"])],
    )
    assert got[100].cluster == 100 and got[100].is_new_cluster == 1


def test_empty_token_new_doc_is_singleton(spark):
    got = _run(
        spark,
        [(100, None, [])],
        [(10, 1, "a", ["a"])],
    )
    assert got[100].cluster == 100 and got[100].is_new_cluster == 1


def test_tie_breaks_to_smaller_cluster_then_member(spark):
    # two candidates with IDENTICAL jaccard -> smaller cluster id wins
    got = _run(
        spark,
        [(100, "a", ["a", "b"])],
        [
            (20, 7, "a", ["a", "b"]),
            (10, 3, "a", ["a", "b"]),
        ],
    )
    assert got[100].cluster == 3
    # same cluster id, two members, equal score -> deterministic result
    got2 = _run(
        spark,
        [(100, "a", ["a", "b"])],
        [
            (20, 3, "a", ["a", "b"]),
            (10, 3, "a", ["a", "b"]),
        ],
    )
    assert got2[100].cluster == 3 and got2[100].is_new_cluster == 0


def test_threshold_is_integer_exact(spark):
    # jacc exactly 1/2 passes num=1,den=2; exactly-below fails
    got = _run(
        spark,
        [(100, "a", ["a", "b"]), (200, "a", ["a", "b", "c"])],
        [(10, 1, "a", ["a", "x"])],  # 100: 1/3 fail; 200: 1/4 fail
    )
    assert got[100].is_new_cluster == 1 and got[200].is_new_cluster == 1
    got = _run(
        spark,
        [(100, "a", ["a", "b", "c"])],
        [(10, 1, "a", ["a", "b", "c", "d", "e", "f"])],  # 3/6 == 1/2
    )
    assert got[100].is_new_cluster == 0 and got[100].cluster == 1


def test_invalid_threshold_raises(spark):
    new = spark.createDataFrame([], "id long, block string, toks array<string>")
    with pytest.raises(ValueError):
        assign_to_clusters(new, new, num=3, den=2)
    with pytest.raises(ValueError):
        assign_to_clusters(new, new, num=0, den=2)


def test_every_new_record_out_exactly_once_and_catalog_untouched(spark):
    new_rows = [(i, "b", ["a", "b"]) for i in range(100, 120)]
    cat_rows = [(i, i % 3, "b", ["a", "b"]) for i in range(30)]
    got = _run(spark, new_rows, cat_rows)
    assert sorted(got) == [r[0] for r in new_rows]
    # assigned clusters must be existing catalog cluster ids
    for r in got.values():
        if r.is_new_cluster == 0:
            assert r.cluster in {0, 1, 2}


def test_q94_registry_query_matches_duckdb(spark):
    import duckdb

    from pubmed_and_method_spark.queries import ORACLES, QUERIES

    sf = "/root/testdata/sf0.001"
    got = sorted(
        map(
            tuple,
            QUERIES["q94_incremental_assignment"](spark, sf).collect(),
        )
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    want = sorted(
        map(tuple, con.execute(ORACLES["q94_incremental_assignment"]).fetchall())
    )
    assert got == want and len(got) > 0
    # both outcomes occur on the real corpus
    news = [t for t in got if t[2] == 1]
    assert 0 < len(news) < len(got)


def test_persistent_ids_mutual_majority(spark):
    """Inheritance requires >half of BOTH sides; an ancestor split in
    two is inherited by neither half; unmatched clusters mint
    new:<smallest member>."""
    from pubmed_and_method_spark.operators.incremental_assign import (
        persistent_cluster_ids,
    )

    old = spark.createDataFrame(
        [("m1", "A"), ("m2", "A"), ("m3", "A"), ("m4", "B"), ("m5", "B"),
         ("m6", "C"), ("n0", "D"), ("n1", "D"), ("n2", "D"), ("n3", "D")],
        ["mention_id", "old_cluster"],
    )
    new = spark.createDataFrame(
        [("m1", "X"), ("m2", "X"), ("m3", "X"), ("m4", "X"),
         ("m5", "Y"), ("m6", "Y"), ("m7", "Y"),
         ("m8", "Z"),
         ("n0", "P"), ("n1", "P"), ("n2", "Q"), ("n3", "Q")],
        ["mention_id", "new_cluster"],
    )
    out = {
        r.new_cluster: r
        for r in persistent_cluster_ids(old, new).collect()
    }
    # X holds 3/4 of itself and 3/3 of A -> inherits A
    assert (out["X"].persistent_id, out["X"].inherited) == ("A", 1)
    assert out["X"].n_shared == 3 and out["X"].n_members == 4
    # Y: best old overlap is 1 (B or C) -> no majority -> fresh id
    assert out["Y"].persistent_id == "new:m5" and out["Y"].inherited == 0
    assert out["Y"].n_shared == 0
    # Z: no old members at all
    assert out["Z"].persistent_id == "new:m8"
    # D split evenly: neither P nor Q takes >half of D -> both fresh
    assert out["P"].persistent_id == "new:n0" and out["P"].inherited == 0
    assert out["Q"].persistent_id == "new:n2" and out["Q"].inherited == 0
    # every persistent id unique (perfect partial matching)
    ids = [r.persistent_id for r in out.values()]
    assert len(ids) == len(set(ids))
