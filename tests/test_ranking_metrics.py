"""ranking_metrics vs a from-scratch pairwise model: AUC must equal
P(pos > neg) + 0.5*P(pos == neg) over all (pos, neg) pairs, KS the max
CDF gap — checked on tie-heavy and degenerate fixtures."""

import itertools

import pytest

from pubmed_and_method_spark.operators.er_metrics import ranking_metrics


def _model(scores, labels):
    pos = [s for s, y in zip(scores, labels) if y == 1]
    neg = [s for s, y in zip(scores, labels) if y == 0]
    wins = sum(
        1.0 if p > n else 0.5 if p == n else 0.0
        for p, n in itertools.product(pos, neg)
    )
    auc = wins / (len(pos) * len(neg))
    cuts = sorted(set(scores))
    ks = max(
        abs(
            sum(1 for p in pos if p <= c) / len(pos)
            - sum(1 for n in neg if n <= c) / len(neg)
        )
        for c in cuts
    )
    return len(pos), len(neg), round(auc, 6), round(2 * auc - 1, 6), round(ks, 6)


@pytest.mark.parametrize(
    "scores,labels",
    [
        # heavy ties spanning both classes
        ([3.0, 3.0, 2.0, 1.0, 1.0, 1.0, 0.0], [1, 1, 1, 0, 1, 0, 0]),
        # perfect separation -> auc 1, ks 1
        ([5.0, 4.0, 1.0, 0.0], [1, 1, 0, 0]),
        # anti-separation -> auc 0
        ([0.0, 1.0, 4.0, 5.0], [1, 1, 0, 0]),
        # all scores identical -> auc 0.5
        ([2.0, 2.0, 2.0, 2.0], [1, 0, 1, 0]),
    ],
)
def test_ranking_metrics_equals_pairwise_model(spark, scores, labels):
    df = spark.createDataFrame(
        list(zip(scores, labels)), ["score", "label"]
    )
    row = ranking_metrics(df, "score", "label").collect()[0]
    n_pos, n_neg, auc, gini, ks = _model(scores, labels)
    assert (row.n_pos, row.n_neg) == (n_pos, n_neg)
    assert row.auc == pytest.approx(auc, abs=1e-6)
    assert row.gini == pytest.approx(gini, abs=1e-6)
    assert row.ks == pytest.approx(ks, abs=1e-6)


def _fs_model(rows, mu, lam):
    """Brute-force FS threshold scan over distinct observed scores."""
    from collections import Counter

    n = Counter()
    pos = Counter()
    for s, y in rows:
        n[s] += 1
        pos[s] += y
    scores = sorted(n)
    tot_pos = sum(pos.values())
    tot_n = sum(n.values())
    uppers = [
        t
        for t in scores
        if mu[1] * sum(n[s] - pos[s] for s in scores if s >= t)
        <= mu[0] * sum(n[s] for s in scores if s >= t)
    ]
    lowers = [
        t
        for t in scores
        if lam[1] * sum(pos[s] for s in scores if s <= t)
        <= lam[0] * tot_pos
    ]
    u = min(uppers) if uppers else None
    l = max(lowers) if lowers else None
    n_link = sum(n[s] for s in scores if s >= u) if u is not None else None
    n_non = sum(n[s] for s in scores if s <= l) if l is not None else None
    return u, l, n_link, n_non, tot_n


def test_fs_select_thresholds_matches_scan_model(spark):
    from pubmed_and_method_spark.operators.er_metrics import (
        fs_select_thresholds,
    )

    rows = (
        [(5.0, 1)] * 10
        + [(4.0, 1)] * 5
        + [(4.0, 0)] * 1
        + [(3.0, 1)] * 2
        + [(3.0, 0)] * 2
        + [(2.0, 1)] * 1
        + [(2.0, 0)] * 10
        + [(1.0, 0)] * 30
    )
    df = spark.createDataFrame(rows, ["score", "label"])
    for mu, lam in [((10, 100), (10, 100)), ((1, 100), (20, 100))]:
        r = fs_select_thresholds(df, "score", "label", mu=mu, lam=lam).collect()[0]
        u, l, n_link, n_non, tot = _fs_model(rows, mu, lam)
        assert (r.upper, r.lower) == (u, l)
        assert (r.n_link, r.n_nonlink) == (n_link, n_non)
        assert r.n_review == tot - n_link - n_non
        # realized rates honor the declared bounds
        assert r.link_fdr * mu[1] <= mu[0] + 1e-9
        assert r.miss_rate * lam[1] <= lam[0] + 1e-9


def test_fs_select_thresholds_degenerate_guards(spark):
    """ADVICE r04: degenerate bound choices must be explicit, never
    silent nulls or negative review counts.  (1) impossibly tight mu
    with no clean top score -> upper null, n_link 0 (not null),
    band_flag 'no_upper'; (2) loose bounds -> lower >= upper, the
    auto sets overlap, n_review/review_share clamp to 0 and
    band_flag = 'overlap'; (3) healthy band -> band_flag null."""
    from pubmed_and_method_spark.operators.er_metrics import (
        fs_select_thresholds,
    )

    # every score level mixes labels -> no t can reach FDR <= 1/1000
    mixed = [(2.0, 1)] * 3 + [(2.0, 0)] * 3 + [(1.0, 1)] * 3 + [(1.0, 0)] * 3
    df = spark.createDataFrame(mixed, ["score", "label"])
    r = fs_select_thresholds(
        df, "score", "label", mu=(1, 1000), lam=(99, 100)
    ).collect()[0]
    assert r.upper is None
    assert r.n_link == 0
    assert "no_upper" in r.band_flag
    assert r.n_review >= 0 and r.review_share >= 0

    # clean separation + loose bounds: every score passes both checks
    # -> lower (max score) >= upper (min score): overlapping band
    sep = [(5.0, 1)] * 5 + [(1.0, 0)] * 5
    df2 = spark.createDataFrame(sep, ["score", "label"])
    r2 = fs_select_thresholds(
        df2, "score", "label", mu=(50, 100), lam=(99, 100)
    ).collect()[0]
    assert r2.lower >= r2.upper
    assert r2.band_flag == "overlap"
    assert r2.n_review == 0 and r2.review_share == 0.0

    # healthy band: tight-but-satisfiable bounds -> no flag
    # healthy band (upper=5.0 from the clean top, lower=1.0): no flag
    r3 = fs_select_thresholds(
        df2, "score", "label", mu=(1, 100), lam=(1, 100)
    ).collect()[0]
    assert (r3.upper, r3.lower) == (5.0, 1.0)
    assert r3.band_flag is None


def test_fs_independence_audit_rejects_bad_identifiers(spark):
    """ADVICE r04: names that can't be safely interpolated into the
    generated stack() SQL are rejected up front with a clear error."""
    import pytest

    from pubmed_and_method_spark.operators.er_metrics import (
        fs_independence_audit,
    )

    df = spark.createDataFrame([(1, 1, 1)], ["f1", "f2", "label"])
    with pytest.raises(ValueError, match="feature_cols"):
        fs_independence_audit(df, ["f1", "bad-name"], "label")
    with pytest.raises(ValueError, match="feature_cols"):
        fs_independence_audit(df, ["f1", "f2'); DROP"], "label")


def test_fs_independence_audit_hand_computed(spark):
    """Designed fixture: a perfectly correlated feature pair (ratio
    1/p), an independent pair (~1.0), and a zero-marginal null."""
    from pubmed_and_method_spark.operators.er_metrics import (
        fs_independence_audit,
    )

    rows = []
    # among matches (y=1), f1 == f2 always (perfectly dependent),
    # f3 fires independently half the time f1 does
    for i in range(8):
        a = 1 if i < 4 else 0
        rows.append((a, a, 1 if i % 2 == 0 else 0, 0, 1))
    # among nonmatches f1 fires alone (f2 never -> zero marginal)
    for i in range(4):
        rows.append((1 if i < 2 else 0, 0, 1 if i < 1 else 0, 0, 0))
    df = spark.createDataFrame(rows, ["f1", "f2", "f3", "f4", "label"])
    out = {
        (r.feature_a, r.feature_b): r
        for r in fs_independence_audit(
            df, ["f1", "f2", "f3", "f4"], "label"
        ).collect()
    }
    r12 = out[("f1", "f2")]
    # matches: n=8, f1=f2=4, both=4 -> 4*8/(4*4) = 2.0
    assert r12.n_both_match == 4 and r12.ratio_match == 2.0
    # nonmatches: f2 marginal 0 -> null
    assert r12.ratio_nonmatch is None
    r13 = out[("f1", "f3")]
    # matches: f1=4, f3=4, both=2 -> 2*8/16 = 1.0 (independent)
    assert r13.ratio_match == 1.0
    # f4 never fires: all its rows null, counts 0
    assert out[("f1", "f4")].n_both_match == 0
    assert out[("f1", "f4")].ratio_match is None
    assert len(out) == 6
