"""Within-block HAC clusterer: hand-computed linkage semantics, the
single-link == connected-components dual-implementation check, the
complete-link clique invariant, brute-force-model equality for
average linkage, order/partitioning invariance, and the block-size
guard."""

import random

import pytest

from pubmed_and_method_spark.operators.hac import hac_within_blocks


def _clusters(rows):
    """rows -> set of frozenset(member ids) per block."""
    by = {}
    for r in rows:
        by.setdefault((r.block_key, r.cluster), set()).add(r.id)
    return {frozenset(v) for v in by.values()}


def _edges_df(spark, rows):
    return spark.createDataFrame(
        rows, "block_key string, id1 string, id2 string, sim double"
    )


def test_hac_linkages_hand_computed(spark):
    """a-b .9, c-d .8, b-c .6, everything else absent (=0), t=.5:
    average keeps {ab},{cd} (cross mean .15); single chains all four
    into one; complete keeps {ab},{cd} (cross min 0)."""
    rows = [
        ("K", "a", "b", 0.9),
        ("K", "c", "d", 0.8),
        ("K", "b", "c", 0.6),
    ]
    df = _edges_df(spark, rows)
    avg = _clusters(
        hac_within_blocks(df, threshold=0.5, linkage="average").collect()
    )
    assert avg == {frozenset("ab"), frozenset("cd")}
    sgl = _clusters(
        hac_within_blocks(df, threshold=0.5, linkage="single").collect()
    )
    assert sgl == {frozenset("abcd")}
    cpl = _clusters(
        hac_within_blocks(df, threshold=0.5, linkage="complete").collect()
    )
    assert cpl == {frozenset("ab"), frozenset("cd")}
    # cluster ids are the min member; sizes carried per row
    got = {
        (r.id): (r.cluster, r.cluster_size)
        for r in hac_within_blocks(
            df, threshold=0.5, linkage="single"
        ).collect()
    }
    assert got == {v: ("a", 4) for v in "abcd"}


def _random_fixture(seed, n_blocks=2, n=14, p=0.35):
    rng = random.Random(seed)
    rows = []
    for b in range(n_blocks):
        ids = [f"b{b}m{i:02d}" for i in range(n)]
        for i in range(n):
            for j in range(i + 1, n):
                if rng.random() < p:
                    rows.append(
                        (f"B{b}", ids[i], ids[j], rng.randint(1, 20) / 20)
                    )
    return rows


def test_hac_single_equals_connected_components(spark):
    """Dual implementation: single-link HAC at threshold t == the
    large-star/small-star CC operator on the t-filtered edge set
    (plus the records all of whose edges fell below t, which HAC
    keeps as singletons)."""
    from pubmed_and_method_spark.operators.connected_components import (
        connected_components,
    )

    t = 0.5
    rows = _random_fixture(7)
    df = _edges_df(spark, rows)
    hac = _clusters(
        hac_within_blocks(df, threshold=t, linkage="single").collect()
    )
    strong = df.filter("sim >= 0.5")
    cc_rows = connected_components(
        strong.selectExpr("id1 as u", "id2 as v")
    ).collect()
    by = {}
    for r in cc_rows:
        by.setdefault(r.component, set()).add(r.id)
    cc = {frozenset(v) for v in by.values()}
    seen = {x for s in cc for x in s}
    allids = {r[1] for r in rows} | {r[2] for r in rows}
    cc |= {frozenset([x]) for x in allids - seen}
    assert hac == cc


def test_hac_complete_clique_invariant(spark):
    """Every complete-link cluster is a threshold-clique: each
    internal pair's similarity (absent = 0) >= t, because each merge
    required the MIN cross similarity >= t."""
    t = 0.5
    rows = _random_fixture(11)
    sim = {}
    for _, a, b, s in rows:
        sim[(a, b)] = sim[(b, a)] = max(s, sim.get((a, b), 0.0))
    out = hac_within_blocks(
        _edges_df(spark, rows), threshold=t, linkage="complete"
    ).collect()
    for cl in _clusters(out):
        mem = sorted(cl)
        for i in range(len(mem)):
            for j in range(i + 1, len(mem)):
                assert sim.get((mem[i], mem[j]), 0.0) >= t, (mem[i], mem[j])


def _model_average(rows, t):
    """From-scratch average-link model: linkage recomputed as the
    direct mean over all cross pairs each round (no Lance-Williams),
    same (-sim, minA, minB) tie-break."""
    sim = {}
    ids = set()
    for _, a, b, s in rows:
        ids |= {a, b}
        sim[(a, b)] = sim[(b, a)] = max(s, sim.get((a, b), 0.0))
    clusters = [frozenset([x]) for x in sorted(ids)]
    while True:
        best = None
        for x in range(len(clusters)):
            for y in range(x + 1, len(clusters)):
                A, B = clusters[x], clusters[y]
                tot = sum(sim.get((a, b), 0.0) for a in A for b in B)
                link = tot / (len(A) * len(B))
                if link < t:
                    continue
                ra, rb = sorted((min(A), min(B)))
                key = (-link, ra, rb)
                if best is None or key < best[0]:
                    best = (key, x, y)
        if best is None:
            return {fs for fs in clusters}
        _, x, y = best
        merged = clusters[x] | clusters[y]
        clusters = [
            c for k, c in enumerate(clusters) if k not in (x, y)
        ] + [merged]


@pytest.mark.parametrize("seed", [3, 19, 101])
def test_hac_average_equals_model(spark, seed):
    rows = _random_fixture(seed)
    got = _clusters(
        hac_within_blocks(
            _edges_df(spark, rows), threshold=0.5, linkage="average"
        ).collect()
    )
    want = set()
    for b in sorted({r[0] for r in rows}):
        want |= _model_average([r for r in rows if r[0] == b], 0.5)
    assert got == want


def test_hac_order_and_partition_invariant(spark):
    rows = _random_fixture(23)
    df = _edges_df(spark, rows)
    base = sorted(
        tuple(r)
        for r in hac_within_blocks(df, threshold=0.5).collect()
    )
    shuffled = _edges_df(spark, list(reversed(rows))).repartition(7)
    again = sorted(
        tuple(r)
        for r in hac_within_blocks(shuffled, threshold=0.5).collect()
    )
    assert base == again


def test_hac_block_guard(spark):
    rows = [("K", f"m{i}", f"m{i + 1}", 0.9) for i in range(5)]
    df = _edges_df(spark, rows)
    with pytest.raises(Exception, match="max_block_records"):
        hac_within_blocks(df, threshold=0.5, max_block_records=3).collect()
    with pytest.raises(ValueError, match="linkage"):
        hac_within_blocks(df, linkage="ward")
