"""ML-layer tests: grouped CV leakage, importances, baseline, error
analysis — mirroring the reference's model-layer checks (SURVEY §2.12)."""

import pytest
from pyspark.sql import functions as F

from pubmed_and_method_spark.ml.model import (
    error_analysis,
    feature_importances,
    fit_match_classifier,
    grouped_cv,
    id_agreement_baseline,
    pairwise_metrics,
    predict_prob,
)
from pubmed_and_method_spark.plans.pipeline import (
    FEATURE_COLS,
    build_labeled_pairs,
    build_pair_features,
    build_signatures,
)


@pytest.fixture(scope="module")
def features(spark, corpus):
    t, g = corpus
    sig = build_signatures(t)
    pairs = build_labeled_pairs(sig, g, num_buckets=2)
    return build_pair_features(pairs, sig).cache()


def test_grouped_cv_folds_disjoint_and_sane(features):
    folds = grouped_cv(
        features, FEATURE_COLS, n_folds=4, algo="rf", seed=42
    )
    assert len(folds) >= 3
    import numpy as np

    assert float(np.mean([f["f1"] for f in folds])) > 0.8


def test_feature_importances_report(features):
    model = fit_match_classifier(features, FEATURE_COLS, algo="rf", seed=42)
    imps = feature_importances(model, FEATURE_COLS)
    assert len(imps) == len(FEATURE_COLS)
    assert abs(sum(v for _, v in imps) - 1.0) < 1e-6
    assert imps == sorted(imps, key=lambda kv: -kv[1])
    # the name and token-overlap features must carry real signal
    top = {k for k, _ in imps[:4]}
    assert top & {"name_jw", "name_lev_ratio", "token_jacc", "shingle_jacc"}


def test_id_agreement_baseline_is_oracle(features):
    """Feeding the TRUE entity ids must give perfect metrics —
    harness smoke test exactly like the reference's author-id
    baseline (src/comparison/author_id_baseline.py)."""
    m = id_agreement_baseline(features, "entity_id1", "entity_id2")
    assert m["f1"] == 1.0 and m["accuracy"] == 1.0


def test_error_analysis_tags(spark):
    rows = [(1, 1), (1, 0), (0, 1), (0, 0)]
    df = spark.createDataFrame(rows, ["same_entity", "pred"])
    got = {
        (r.same_entity, r.pred): r.error_type
        for r in error_analysis(df).collect()
    }
    assert got[(1, 0)] == "false_negative"
    assert got[(0, 1)] == "false_positive"
    assert got[(1, 1)] is None and got[(0, 0)] is None
