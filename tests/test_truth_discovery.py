"""truth_discovery vs a from-scratch model, plus the behavioral claim
that justifies it over equal-vote mode survivorship: an habitually
wrong source loses contested objects it would tie or win by count."""

import random
from collections import defaultdict

import pytest

from pubmed_and_method_spark.operators.truth_discovery import (
    source_trust,
    truth_discovery,
)


def _model(claims):
    """Replicates the operator: round-6 at birth, sorted-fold sums."""
    cl = sorted(set(claims))
    n_o = defaultdict(int)
    n_v = defaultdict(int)
    for s, o, v in cl:
        n_o[o] += 1
        n_v[(o, v)] += 1
    share = {k: round(n_v[k] / n_o[k[0]], 6) for k in n_v}
    by_s = defaultdict(list)
    for s, o, v in cl:
        by_s[s].append((o, v))
    trust = {
        s: round(
            sum(share[(o, v)] for o, v in sorted(ovs)) / len(ovs), 6
        )
        for s, ovs in by_s.items()
    }
    tv = defaultdict(float)
    tall = defaultdict(float)
    for s, o, v in cl:
        pass
    for (o, v) in sorted({(o, v) for _, o, v in cl}):
        ss = sorted(s for s, oo, vv in cl if (oo, vv) == (o, v))
        tv[(o, v)] = sum(trust[s] for s in ss)
    for o in n_o:
        vs = sorted((v, s) for s, oo, v in cl if oo == o)
        tall[o] = sum(trust[s] for v, s in vs)
    out = {}
    for o in n_o:
        cands = sorted(
            (
                -round(tv[(oo, v)] / tall[o], 6),
                v,
            )
            for (oo, v) in tv
            if oo == o
        )
        negc, v = cands[0]
        n_vals = len(cands)
        out[o] = (v, -negc, n_o[o], n_vals)
    return out, trust


def test_truth_discovery_equals_model_random(spark):
    rng = random.Random(5)
    claims = []
    for _ in range(200):
        claims.append(
            (
                f"s{rng.randrange(6)}",
                f"o{rng.randrange(20)}",
                rng.choice("abcde"),
            )
        )
    df = spark.createDataFrame(claims, ["src", "obj", "val"])
    got = {
        r.obj: (r.resolved_value, r.confidence, r.n_claims, r.n_values)
        for r in truth_discovery(df, "src", "obj", "val").collect()
    }
    want, trust = _model(claims)
    assert set(got) == set(want)
    for o in want:
        assert got[o][0] == want[o][0], o
        assert got[o][1] == pytest.approx(want[o][1], abs=1e-6)
        assert got[o][2:] == want[o][2:]
    ts = {
        r.src: (r.trust, r.n_claims)
        for r in source_trust(df, "src", "obj", "val").collect()
    }
    for s in trust:
        assert ts[s][0] == pytest.approx(trust[s], abs=1e-6)


def test_noisy_source_loses_contested_object(spark):
    """A habitually wrong feed ties 1-1 on a contested object; mode's
    smallest-value tie-break would pick its (alphabetically earlier)
    wrong claim, but its low earned trust makes the reliable feed's
    value win."""
    claims = []
    for i in range(4):
        claims += [
            ("good1", f"o{i}", "v"),
            ("good2", f"o{i}", "v"),
            ("noisy", f"o{i}", "w"),
        ]
    claims += [("good1", "o9", "zeta"), ("noisy", "o9", "alpha")]
    df = spark.createDataFrame(claims, ["src", "obj", "val"])
    res = {
        r.obj: r.resolved_value
        for r in truth_discovery(df, "src", "obj", "val").collect()
    }
    assert res["o9"] == "zeta"
    assert all(res[f"o{i}"] == "v" for i in range(4))
    ts = {
        r.src: r.trust
        for r in source_trust(df, "src", "obj", "val").collect()
    }
    assert ts["noisy"] < ts["good1"]


def test_mine_alias_map_hand_computed(spark):
    """Canonical = most frequent per cluster (ties smallest); variants
    vote once per cluster; votes aggregate across clusters."""
    from pubmed_and_method_spark.operators.consolidate import (
        mine_alias_map,
    )

    rows = (
        [("e1", "robert")] * 3 + [("e1", "bob")] * 2 + [("e1", "rob")]
        + [("e2", "robert")] * 2 + [("e2", "bob")]
        + [("e3", "bob")] * 2 + [("e3", "robert")]  # bob canonical here
        + [("e4", "ann"), ("e4", "anne")]           # tie -> ann (smaller)
    )
    df = spark.createDataFrame(rows, ["entity", "name"])
    out = {
        (r.variant, r.canonical): (r.support, r.n_votes_variant)
        for r in mine_alias_map(df, "entity", "name").collect()
    }
    assert out[("bob", "robert")] == (2, 3)   # e1 (2 votes) + e2 (1)
    assert out[("rob", "robert")] == (1, 1)
    assert out[("robert", "bob")] == (1, 1)   # e3's minority direction
    assert out[("anne", "ann")] == (1, 1)     # tie broke to 'ann'
    assert ("ann", "anne") not in out
    assert len(out) == 4
