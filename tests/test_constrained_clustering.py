"""Cannot-link constrained cluster repair invariants.

Property checked everywhere: after repair, NO cannot-link pair shares
a cluster — the one-pass guarantee (every violating pair loses its
greater-priority endpoint) — plus determinism, id-collision freedom,
and inertness of constraints that don't violate anything.
"""

import hashlib

from pyspark.sql import functions as F

from pubmed_and_method_spark.operators.constrained_clustering import (
    cannot_link_repair,
)


def _mk(spark, rows, cl_pairs):
    clusters = spark.createDataFrame(rows, ["id", "cluster"])
    cl = spark.createDataFrame(cl_pairs, ["id1", "id2"]) if cl_pairs else (
        spark.createDataFrame([], "id1 long, id2 long")
    )
    return cannot_link_repair(clusters, cl).collect()


def _no_violation(out, cl_pairs):
    c = {r.id: r.repaired_cluster for r in out}
    for a, b in cl_pairs:
        if a in c and b in c:
            assert c[a] != c[b], f"CL pair ({a},{b}) still co-clustered"


def _md5(i):
    return hashlib.md5(str(i).encode()).hexdigest()


def test_basic_split_and_eviction_priority(spark):
    # one cluster of 3; (1,2) cannot link -> greater-md5 endpoint out
    rows = [(1, 1), (2, 1), (3, 1)]
    out = _mk(spark, rows, [(1, 2)])
    _no_violation(out, [(1, 2)])
    loser = 1 if _md5(1) > _md5(2) else 2
    by_id = {r.id: r for r in out}
    assert by_id[loser].evicted == 1
    assert by_id[loser].repaired_cluster == loser
    keep = {1, 2, 3} - {loser}
    # kept members re-key to min(kept id)
    for k in keep:
        assert by_id[k].evicted == 0
        assert by_id[k].repaired_cluster == min(keep)


def test_rekey_avoids_collision_with_evicted_min(spark):
    # force the CLUSTER MIN to be evicted: pick ids where md5(min) is
    # the greater priority of the pair
    a, b = 8, 26  # md5('8') > md5('26') (the q93 sf0.01 case)
    assert _md5(a) > _md5(b)
    rows = [(a, a), (b, a), (100, a)]
    out = _mk(spark, rows, [(a, b)])
    by_id = {r.id: r for r in out}
    assert by_id[a].evicted == 1 and by_id[a].repaired_cluster == a
    # kept members must NOT keep cluster id == a (the evicted singleton)
    assert by_id[b].repaired_cluster == min(b, 100)
    assert by_id[100].repaired_cluster == min(b, 100)


def test_duplicate_and_reversed_pairs_inert(spark):
    rows = [(1, 1), (2, 1)]
    out1 = _mk(spark, rows, [(1, 2)])
    out2 = _mk(spark, rows, [(1, 2), (2, 1), (1, 2)])
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))


def test_absent_endpoint_and_cross_cluster_pairs_inert(spark):
    rows = [(1, 1), (2, 1), (3, 3)]
    # (1,99): endpoint missing; (1,3): different clusters already
    out = _mk(spark, rows, [(1, 99), (1, 3)])
    assert all(r.evicted == 0 for r in out)
    by_id = {r.id: r for r in out}
    assert by_id[1].repaired_cluster == 1
    assert by_id[2].repaired_cluster == 1
    assert by_id[3].repaired_cluster == 3


def test_mutually_constrained_triple_all_singletons_but_one(spark):
    # all three pairwise cannot-link: each pair evicts one endpoint;
    # survivors of the evict set must be pairwise violation-free
    rows = [(i, 1) for i in (1, 2, 3)]
    cl = [(1, 2), (1, 3), (2, 3)]
    out = _mk(spark, rows, cl)
    _no_violation(out, cl)
    # at most one member can remain un-evicted
    assert sum(1 for r in out if r.evicted == 0) <= 1
    assert len(out) == 3


def test_deterministic_across_runs(spark):
    rows = [(i, i % 4) for i in range(40)]
    cl = [(i, i + 4) for i in range(0, 32, 2)]
    r1 = sorted(map(tuple, _mk(spark, rows, cl)))
    r2 = sorted(map(tuple, _mk(spark, rows, cl)))
    assert r1 == r2
    _no_violation(_mk(spark, rows, cl), cl)


def test_passthrough_columns_preserved(spark):
    clusters = spark.createDataFrame(
        [(1, 1, "en"), (2, 1, "de")], ["id", "cluster", "lang"]
    )
    cl = spark.createDataFrame([(1, 2)], ["id1", "id2"])
    out = cannot_link_repair(clusters, cl).collect()
    assert {r.lang for r in out} == {"en", "de"}
    assert set(out[0].asDict()) == {
        "id", "cluster", "lang", "repaired_cluster", "evicted"
    }


def test_q93_registry_query_matches_duckdb(spark):
    import duckdb

    from pubmed_and_method_spark.queries import ORACLES, QUERIES

    sf = "/root/testdata/sf0.001"
    got = sorted(
        map(
            tuple,
            QUERIES["q93_cannot_link_repair"](spark, sf)
            .orderBy("doc_id")
            .collect(),
        )
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    want = sorted(
        map(tuple, con.execute(ORACLES["q93_cannot_link_repair"]).fetchall())
    )
    assert got == want
    assert len(got) > 0
    # the repair invariant on the real corpus
    rows = [
        dict(zip(("doc_id", "lang", "component", "cluster", "evicted"), t))
        for t in got
    ]
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster"], set()).add(r["lang"])
    for langs in by_cluster.values():
        assert len(langs) == 1
