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
