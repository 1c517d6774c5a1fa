"""ML-layer tests: grouped CV leakage, importances, baseline, error
analysis — mirroring the reference's model-layer checks (SURVEY §2.12)."""

import pytest
from pyspark.sql import functions as F

from pubmed_and_method_spark.ml.model import (
    AVAILABLE_ALGOS,
    downsample_majority,
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


@pytest.mark.parametrize("algo", sorted(set(AVAILABLE_ALGOS)))
def test_classifier_zoo_parity(features, algo):
    """Every zoo member (the reference's 9-model dispatch,
    src/model/classification.py:18-40 run per-model by
    src/main_app.py:43) trains and clears a sanity F1 bar on a
    70/30 grouped split."""
    from pubmed_and_method_spark.ml.model import grouped_split

    split = grouped_split(features, "block_key", train_pct=70, salt=7)
    train = split.filter(F.col("is_train") == 1)
    test = split.filter(F.col("is_train") == 0)
    model = fit_match_classifier(train, FEATURE_COLS, algo=algo, seed=42)
    m = pairwise_metrics(predict_prob(model, test))
    assert m["n"] > 0
    assert m["f1"] > 0.8, f"{algo}: {m}"


def test_downsample_majority_balances(features):
    ds = downsample_majority(features, "same_entity", ratio=1.0, seed=1)
    counts = {
        r["same_entity"]: r["n"]
        for r in ds.groupBy("same_entity").agg(F.count("*").alias("n")).collect()
    }
    orig = {
        r["same_entity"]: r["n"]
        for r in features.groupBy("same_entity").agg(
            F.count("*").alias("n")
        ).collect()
    }
    minority = min(orig, key=orig.get)
    majority = max(orig, key=orig.get)
    # all minority rows kept; majority within ~3 sigma of the target
    assert counts[minority] == orig[minority]
    assert counts[majority] < orig[majority]
    assert abs(counts[majority] - counts[minority]) < 4 * (counts[minority] ** 0.5) + 10


def test_feature_group_ablation(spark, features):
    """The result.txt-table analog (src/comparison/feature_group.py +
    inner_feature_method.py:43-58): per (feature_group, model)
    fold-averaged metrics; name features must beat time-only."""
    from pubmed_and_method_spark.ml.ablation import (
        ablation_table,
        feature_group_ablation,
    )

    groups = {
        "name_based": [
            "name_char_jacc_lf", "name_jw", "given_jw", "initial_eq",
            "name_edit_diff_chars",
        ],
        "content_based": ["token_jacc", "shingle_jacc", "content_tfidf_cos"],
        "time_based": ["time_diff_days", "time_overlap"],
    }
    rows = feature_group_ablation(
        features, groups=groups, algos=("rf",), group_col="block_key",
        n_folds=3, seed=42,
    )
    assert {r["feature_group"] for r in rows} == set(groups)
    by = {r["feature_group"]: r for r in rows}
    # same-block entities are homonyms by construction (the AND
    # ambiguity model), so content must dominate; name-only is weak
    # within blocks — exactly the reference's SONG-vs-GS style spread
    assert by["content_based"]["f1"] > by["time_based"]["f1"]
    assert by["content_based"]["f1"] > by["name_based"]["f1"]
    tbl = ablation_table(spark, rows)
    assert tbl.count() == len(rows)
    assert "f1" in tbl.columns


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
