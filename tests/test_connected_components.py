"""Large-star/small-star connected components correctness.

Cross-checked against a plain union-find on the collected edge list
(valid at test scale only; the Spark operator never collects).
"""

import random

from pubmed_and_method_spark.operators.connected_components import (
    connected_components,
)


def union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for u, v in edges:
        union(u, v)
    return {x: find(x) for x in parent}


def check(spark, edges):
    df = spark.createDataFrame(edges, ["u", "v"])
    got = {r.id: r.component for r in connected_components(df).collect()}
    want_roots = union_find(edges)
    # same partition into groups AND component label == min member
    groups_got = {}
    for node, comp in got.items():
        groups_got.setdefault(comp, set()).add(node)
    groups_want = {}
    for node, root in want_roots.items():
        groups_want.setdefault(root, set()).add(node)
    assert set(map(frozenset, groups_got.values())) == set(
        map(frozenset, groups_want.values())
    )
    for comp, nodes in groups_got.items():
        assert comp == min(nodes)


def test_simple_chain(spark):
    check(spark, [("a", "b"), ("b", "c"), ("x", "y")])


def test_star_and_clique(spark):
    edges = [("h", f"s{i}") for i in range(10)]
    edges += [(f"c{i}", f"c{j}") for i in range(5) for j in range(i + 1, 5)]
    check(spark, edges)


def test_random_graph(spark):
    rng = random.Random(7)
    nodes = [f"n{i:02d}" for i in range(60)]
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(80)
    ]
    edges = [(u, v) for u, v in edges if u != v]
    check(spark, edges)


def test_long_path_converges(spark):
    # path of length 40 — exercises multi-round convergence
    edges = [(f"p{i:02d}", f"p{i + 1:02d}") for i in range(40)]
    check(spark, edges)


def test_update_components_matches_batch(spark):
    """Incremental fold over 4 edge batches == batch CC on the full
    edge set, row-identical (labels are canonical min ids).  Batches
    engineer every merge regime: edges inside one component, a bridge
    between two existing components, edges introducing brand-new
    nodes, and a batch touching nothing previously seen."""
    from pubmed_and_method_spark.operators.connected_components import (
        update_components,
    )

    rng = random.Random(7)
    nodes = list(range(200))
    edges = [
        (min(a, b), max(a, b))
        for a, b in (
            (rng.choice(nodes), rng.choice(nodes)) for _ in range(260)
        )
        if a != b
    ]
    batches = [edges[i::4] for i in range(4)]

    comp = connected_components(
        spark.createDataFrame(batches[0], ["u", "v"])
    ).localCheckpoint(eager=True)
    for b in batches[1:]:
        comp = update_components(
            comp, spark.createDataFrame(b, ["u", "v"])
        ).localCheckpoint(eager=True)

    batch = connected_components(spark.createDataFrame(edges, ["u", "v"]))
    got = {(r.id, r.component) for r in comp.collect()}
    want = {(r.id, r.component) for r in batch.collect()}
    assert got == want


def test_update_components_disjoint_and_empty_batch(spark):
    """A batch entirely among NEW nodes leaves old labels untouched
    (they ride the anti-join path); an empty batch is an identity."""
    from pubmed_and_method_spark.operators.connected_components import (
        update_components,
    )

    comp = connected_components(
        spark.createDataFrame([(1, 2), (2, 3), (10, 11)], ["u", "v"])
    )
    before = {(r.id, r.component) for r in comp.collect()}

    new_only = update_components(
        comp, spark.createDataFrame([(100, 101)], ["u", "v"])
    )
    got = {(r.id, r.component) for r in new_only.collect()}
    assert got == before | {(100, 100), (101, 100)}

    empty = update_components(
        comp, spark.createDataFrame([], "u int, v int")
    )
    assert {(r.id, r.component) for r in empty.collect()} == before


def test_cluster_size_stats_hand_computed(spark):
    """Histogram over a labeling with sizes {3,1,1}: rows, shares and
    the empty-input guard re-derived by hand."""
    from pubmed_and_method_spark.operators.er_metrics import (
        cluster_size_stats,
    )

    comp = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (20, 20)], ["id", "component"]
    )
    rows = {
        r.cluster_size: r for r in cluster_size_stats(comp).collect()
    }
    assert set(rows) == {1, 3}
    assert rows[1].n_clusters == 2 and rows[1].n_members == 2
    assert rows[3].n_clusters == 1 and rows[3].n_members == 3
    assert rows[1].member_share == 0.4 and rows[3].member_share == 0.6

    empty = cluster_size_stats(
        spark.createDataFrame([], "id int, component int")
    )
    assert empty.count() == 0


def test_star_clusters_path_and_weights(spark):
    """6-path: peel produces centers {p5, p3, p1} (3 bounded-diameter
    stars where CC would weld all 6); satellite assignment prefers
    edge WEIGHT over center degree; under-provisioned rounds raise."""
    import pytest

    from pubmed_and_method_spark.operators.star_clustering import (
        star_clusters,
    )

    path = [(f"p{i}", f"p{i+1}", 1.0) for i in range(1, 6)]
    df = spark.createDataFrame(path, "id1 string, id2 string, w double")
    got = {
        r.node: (r.center, r.is_center)
        for r in star_clusters(df, weight_col="w").collect()
    }
    assert got == {
        "p5": ("p5", 1), "p3": ("p3", 1), "p1": ("p1", 1),
        "p4": ("p5", 0), "p6": ("p5", 0), "p2": ("p3", 0),
    }

    # s sits between center c1 (w .9, deg 3) and center c2 (w .5,
    # deg 4): weight dominates the (w, cdeg, id) struct order
    star2 = [
        ("c1", "a1", 1.0), ("c1", "a2", 1.0), ("c1", "s", 0.9),
        ("c2", "b1", 1.0), ("c2", "b2", 1.0), ("c2", "b3", 1.0),
        ("c2", "s", 0.5),
    ]
    df2 = spark.createDataFrame(star2, "id1 string, id2 string, w double")
    got2 = {
        r.node: (r.center, r.is_center)
        for r in star_clusters(df2, weight_col="w").collect()
    }
    assert got2["s"] == ("c1", 0)
    assert got2["c1"] == ("c1", 1) and got2["c2"] == ("c2", 1)
    assert {n for n, (c, _) in got2.items() if c == "c2"} == {
        "c2", "b1", "b2", "b3",
    }

    with pytest.raises(RuntimeError, match="did not converge"):
        star_clusters(df, weight_col="w", rounds=1)


def _py_pivot_reference(edges, rounds=16, salt=7):
    """Pure-Python twin of operators/pivot_clustering.pivot_clusters:
    same portable (md5-hash, id) priority, same local-min election,
    same in-round min-priority attachment."""
    import hashlib

    def prio(n):
        return (
            int(hashlib.md5(f"{n}#{salt}".encode()).hexdigest()[:15], 16),
            n,
        )

    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    status = {n: 0 for n in adj}
    piv = {}
    for _ in range(rounds):
        unk = {n for n in adj if status[n] == 0}
        if not unk:
            break
        newp = {
            u
            for u in unk
            if all(prio(u) < prio(v) for v in adj[u] if v in unk)
        }
        for p in newp:
            status[p], piv[p] = 1, p
        for u in unk - newp:
            cands = [p for p in adj[u] if p in newp]
            if cands:
                status[u], piv[u] = 2, min(cands, key=prio)
    assert all(status[n] != 0 for n in adj), "reference unconverged"
    return {n: (piv[n], 1 if status[n] == 1 else 0) for n in adj}


def test_pivot_clusters_reference_parity(spark):
    """pivot_clusters equals the sequential twin of its own parallel
    rounds on seeded random multigraphs, and satisfies the structural
    invariants: pivots form an independent set, every satellite is
    edge-adjacent to its pivot, every edge-touching node is assigned;
    under-provisioned rounds raise."""
    import random

    import pytest

    from pubmed_and_method_spark.operators.pivot_clustering import (
        pivot_clusters,
    )

    rng = random.Random(5)
    for _ in range(3):
        n = rng.randint(8, 30)
        m = rng.randint(n, n * 3)
        edges = [
            (f"m{rng.randint(0, n)}", f"m{rng.randint(0, n)}")
            for _ in range(m)
        ]
        df = spark.createDataFrame(edges, "id1 string, id2 string")
        got = {
            r.node: (r.pivot, r.is_pivot)
            for r in pivot_clusters(df).collect()
        }
        assert got == _py_pivot_reference(edges)
        adjset = {(a, b) for a, b in edges if a != b}
        adjset |= {(b, a) for a, b in adjset}
        pivots = {k for k, (_, isp) in got.items() if isp == 1}
        assert not any(
            (a, b) in adjset for a in pivots for b in pivots if a != b
        )
        assert all(
            (k, p) in adjset for k, (p, isp) in got.items() if isp == 0
        )

    # a path chained in ASCENDING hash-priority order needs
    # ceil(k/2) rounds (only the head is a local min each round),
    # so rounds=1 must raise regardless of which names hash where
    import hashlib

    nodes = sorted(
        (f"p{i}" for i in range(8)),
        key=lambda n: int(
            hashlib.md5(f"{n}#7".encode()).hexdigest()[:15], 16
        ),
    )
    path = list(zip(nodes, nodes[1:]))
    df = spark.createDataFrame(path, "id1 string, id2 string")
    with pytest.raises(RuntimeError, match="did not converge"):
        pivot_clusters(df, rounds=1)


def test_canopy_assign_overlap_and_removal(spark):
    """Canopy semantics on a 3-node hand case: the tight-isolated
    node always becomes a center; of the tight pair, only the lower
    priority does (the other is removed); the bridging node lands in
    BOTH canopies (overlap — the property hard blocking can't
    express).  Plus the guard rails: tight<loose validation and the
    fixed-rounds convergence raise."""
    import hashlib

    import pytest

    from pubmed_and_method_spark.operators.canopy import canopy_assign

    def prio(n):
        return (
            int(hashlib.md5(f"{n}#7".encode()).hexdigest()[:15], 16),
            n,
        )

    sims = [
        ("c1", "x", 0.9),   # tight edge
        ("c2", "x", 0.55),  # loose-only edge
        ("c1", "c2", 0.3),  # below loose: invisible
    ]
    df = spark.createDataFrame(
        sims, "query_id string, cand_id string, cos double"
    )
    got = {
        (r.node, r.canopy): r.is_center
        for r in canopy_assign(df, loose=0.5, tight=0.8).collect()
    }
    wins, loses = sorted(("c1", "x"), key=prio)
    expected = {
        ("c2", "c2"): 1,          # tight-isolated -> center
        (wins, wins): 1,          # tight local min -> center
        (loses, wins): 0,         # removed, loose member of the winner
        ("x", "c2"): 0,           # x bridges into c2's canopy too
    }
    assert got == expected
    # the overlap property: x always holds TWO memberships — either
    # (member of winner's canopy + member of c2's) or, if x itself
    # won the tight pair, (center of its own + member of c2's)
    assert len([k for k in got if k[0] == "x"]) == 2

    with pytest.raises(ValueError, match="tight"):
        canopy_assign(df, loose=0.8, tight=0.5)

    # ascending-priority tight path: only the head resolves per round
    nodes = sorted((f"p{i}" for i in range(8)), key=prio)
    path = [(a, b, 0.9) for a, b in zip(nodes, nodes[1:])]
    df2 = spark.createDataFrame(
        path, "query_id string, cand_id string, cos double"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        canopy_assign(df2, loose=0.5, tight=0.8, rounds=1)


def test_delete_and_repair_matches_full_recompute(spark):
    """Incremental deletion repair == batch CC over the remaining
    graph (+ singletons for edge-less survivors) on seeded random
    graphs, including deletions that split a component."""
    import random

    from pubmed_and_method_spark.operators.connected_components import (
        connected_components,
        delete_and_repair,
    )

    rng = random.Random(13)
    for trial in range(3):
        nodes = [f"n{i:02d}" for i in range(30)]
        edges = {
            tuple(sorted(rng.sample(nodes, 2)))
            for _ in range(rng.randint(15, 40))
        }
        # a guaranteed bridge: chain x-y-z where y will be deleted
        edges |= {("xa", "yb"), ("yb", "zc")}
        deleted = set(rng.sample(nodes, rng.randint(3, 8))) | {"yb"}

        edf = spark.createDataFrame(sorted(edges), ["u", "v"])
        comps = connected_components(edf, "u", "v")
        ddf = spark.createDataFrame([(d,) for d in sorted(deleted)], ["id"])
        got = {
            (r.id, r.component)
            for r in delete_and_repair(comps, edf, ddf).collect()
        }

        survivors = {
            n for e in edges for n in e if n not in deleted
        }
        remaining = [
            e for e in edges if e[0] not in deleted and e[1] not in deleted
        ]
        # brute-force union-find model
        parent = {n: n for n in survivors}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in remaining:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = set()
        for n in survivors:
            root = find(n)
            members = [m for m in survivors if find(m) == root]
            want.add((n, min(members)))
        assert got == want, f"trial {trial}"
        # the planted bridge must have split: xa and zc now apart
        assert ("xa", "xa") in got or any(
            a == "xa" and c != next(
                (c2 for a2, c2 in got if a2 == "zc"), None
            )
            for a, c in got
        )
