"""Supervised match scoring: Spark ML rebuild of the model layer.

Reference: sklearn classifier zoo dispatched by name
(src/model/classification.py:18-40), production default RandomForest
n_estimators=100 (src/model/available_model.py:15-18), MinMax+Standard
scaling (src/eutilities/preprocessor.py:25-30 — fit on the FULL matrix,
a leak we deliberately fix by fitting on train only), group-aware CV by
lastname-hash (src/comparison/inner_feature_method.py:48-55), metrics
at prob>0.5 (src/metric/metric.py:6-20).

Here: VectorAssembler -> GBTClassifier (north-star mandate; RF kept as
an option), deterministic block-hash splits, and pairwise P/R/F1 as
DataFrame aggregations.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import (
    DecisionTreeClassifier,
    GBTClassifier,
    LinearSVC,
    LogisticRegression,
    MultilayerPerceptronClassifier,
    RandomForestClassifier,
)
from pyspark.ml.feature import MinMaxScaler, StandardScaler, VectorAssembler
from pyspark.ml.regression import LinearRegression
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: the reference's 9-way model zoo (src/model/available_model.py,
#: src/model/classification.py:18-40) re-expressed in Spark ML.
#: ``xgboost``/``gb`` both map to GBTClassifier (Spark's gradient
#: boosting; no xgboost lib here), ``c45`` to an entropy-criterion
#: decision tree (C4.5's information-gain split, src/model/c45.py),
#: ``svm`` to LinearSVC (Spark has no kernel SVC).
AVAILABLE_ALGOS = (
    "linear", "logistic", "dt", "c45", "svm", "xgboost", "rf", "gbt", "mlp",
)


def grouped_split(
    df: DataFrame,
    group_col: str = "block_key",
    train_pct: int = 70,
    salt: int = 0,
) -> DataFrame:
    """Deterministic leakage-free split: whole blocks go to one side.

    Rebuild of GroupShuffleSplit over xxHash32(lastname)%100
    (src/comparison/inner_feature_method.py:48-55; key built at
    database/pubmed_inner_outer_feature.sql:680-681), made fully
    deterministic (the reference's split depends on sklearn RNG).
    """
    bucket = F.pmod(F.xxhash64(F.col(group_col), F.lit(salt)), F.lit(100))
    return df.withColumn("__split_bucket", bucket.cast("int")).withColumn(
        "is_train", (F.col("__split_bucket") < train_pct).cast("int")
    )


def downsample_majority(
    df: DataFrame,
    label_col: str = "same_entity",
    ratio: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """M4 class down-sampling: keep all minority-class rows, sample the
    majority class to ``ratio`` x the minority count.

    Rebuild of down_sample (src/eutilities/preprocessor.py:11-22),
    distributed (sampleBy, no driver materialization) and seeded (the
    reference uses np.random.randint with replacement; we sample
    without replacement, which only improves sample diversity)."""
    counts = {
        r[label_col]: r["n"]
        for r in df.groupBy(label_col).agg(F.count("*").alias("n")).collect()
    }
    if len(counts) < 2:
        return df
    # equal class counts: min() and max() over the dict would return the
    # SAME label, leaving the other stratum out of the fractions dict
    # (sampleBy defaults missing strata to 0 — an entire class silently
    # dropped).  Nothing to rebalance; return unchanged.
    if len(set(counts.values())) == 1:
        return df
    minority = min(counts, key=counts.get)
    majority = max(counts, key=counts.get)
    want = min(1.0, ratio * counts[minority] / counts[majority])
    fractions = {lbl: 1.0 for lbl in counts}
    fractions[majority] = want
    return df.sampleBy(label_col, fractions, seed=seed)


def fit_match_classifier(
    train: DataFrame,
    feature_cols: list[str],
    label_col: str = "same_entity",
    algo: str = "gbt",
    seed: int = 42,
) -> PipelineModel:
    """Scalers + tree ensemble in one Pipeline (fit on train only)."""
    assembler = VectorAssembler(
        inputCols=feature_cols, outputCol="raw_features", handleInvalid="keep"
    )
    mm = MinMaxScaler(inputCol="raw_features", outputCol="mm_features")
    std = StandardScaler(
        inputCol="mm_features", outputCol="features", withMean=False
    )
    if algo in ("gbt", "xgboost"):
        clf = GBTClassifier(
            labelCol=label_col, featuresCol="features", maxIter=40, seed=seed
        )
    elif algo == "rf":
        # reference production default: RF with 100 trees, gini
        # (src/model/classification.py:101-111)
        clf = RandomForestClassifier(
            labelCol=label_col, featuresCol="features", numTrees=100, seed=seed
        )
    elif algo == "logistic":
        # LogisticRegression(max_iter=1000, tol=1e-4, C=2) ->
        # regParam = 1/(2*n) approximated by a small fixed reg
        # (src/model/classification.py:51-57)
        clf = LogisticRegression(
            labelCol=label_col, featuresCol="features",
            maxIter=1000, tol=1e-4, regParam=1e-4,
        )
    elif algo == "dt":
        clf = DecisionTreeClassifier(
            labelCol=label_col, featuresCol="features", seed=seed
        )
    elif algo == "c45":
        # C4.5 = entropy/information-gain splits (src/model/c45.py:10-84)
        clf = DecisionTreeClassifier(
            labelCol=label_col, featuresCol="features",
            impurity="entropy", seed=seed,
        )
    elif algo == "svm":
        clf = LinearSVC(labelCol=label_col, featuresCol="features", maxIter=100)
    elif algo == "mlp":
        # sklearn MLPClassifier default ~ one hidden layer of 100
        # (src/model/classification.py:126-131); binary softmax head
        clf = MultilayerPerceptronClassifier(
            labelCol=label_col, featuresCol="features",
            layers=[len(feature_cols), 100, 2], seed=seed, maxIter=100,
        )
    elif algo == "linear":
        # LinearRegression + 0.5 threshold (classification.py:43-48);
        # thresholding happens in predict_prob
        clf = LinearRegression(
            labelCol=label_col, featuresCol="features", predictionCol="__linpred"
        )
    else:
        raise ValueError(f"unknown algo {algo!r}; one of {AVAILABLE_ALGOS}")
    return Pipeline(stages=[assembler, mm, std, clf]).fit(train)


def predict_prob(model: PipelineModel, df: DataFrame) -> DataFrame:
    """Append pred_prob (P(match)) and pred (threshold 0.5,
    src/metric/metric.py:7-8).

    Handles all zoo heads: probabilistic classifiers use
    probability[1]; LinearSVC maps its margin through a sigmoid;
    the linear-regression head thresholds its raw prediction at 0.5
    exactly like the reference (src/model/classification.py:43-48).
    """
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(df)
    if "probability" in scored.columns:
        p1 = F.element_at(vector_to_array(F.col("probability")), 2)
    elif "__linpred" in scored.columns:
        p1 = F.col("__linpred")
    else:  # LinearSVC: margin -> pseudo-probability
        margin = F.element_at(vector_to_array(F.col("rawPrediction")), 2)
        p1 = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
    scored = scored.withColumn("pred_prob", p1.cast("double"))
    return scored.withColumn(
        "pred", (F.col("pred_prob") >= 0.5).cast("int")
    ).drop(
        "raw_features", "mm_features", "features",
        "rawPrediction", "probability", "prediction", "__linpred",
    )


def pairwise_metrics(
    scored: DataFrame, label_col: str = "same_entity", pred_col: str = "pred"
) -> dict[str, float]:
    """Accuracy / precision / recall / F1 in ONE aggregation pass
    (reference loops sklearn metrics per fold, src/metric/metric.py)."""
    lab, prd = F.col(label_col), F.col(pred_col)
    row = scored.agg(
        F.count("*").alias("n"),
        F.sum(((lab == 1) & (prd == 1)).cast("long")).alias("tp"),
        F.sum(((lab == 0) & (prd == 1)).cast("long")).alias("fp"),
        F.sum(((lab == 1) & (prd == 0)).cast("long")).alias("fn"),
        F.sum((lab == prd).cast("long")).alias("correct"),
    ).first()
    precision = row.tp / (row.tp + row.fp) if (row.tp + row.fp) else 0.0
    recall = row.tp / (row.tp + row.fn) if (row.tp + row.fn) else 0.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if (precision + recall)
        else 0.0
    )
    return {
        "n": row.n,
        "accuracy": row.correct / row.n if row.n else 0.0,
        "precision": precision,
        "recall": recall,
        "f1": f1,
    }


def grouped_cv(
    df: DataFrame,
    feature_cols: list[str],
    group_col: str = "block_key",
    label_col: str = "same_entity",
    n_folds: int = 10,
    algo: str = "gbt",
    seed: int = 42,
    parallelism: int = 1,
) -> list[dict[str, float]]:
    """Group-aware k-fold CV: fold f tests on blocks with
    xxhash64(group) % n_folds == f, trains on the rest — the
    deterministic rebuild of GroupShuffleSplit(n_splits=10)
    (src/comparison/inner_feature_method.py:48-55).  Returns one
    metrics dict per fold; average like the reference's np.average
    (src/comparison/inner_feature_method.py:57).

    ``parallelism`` > 1 fits that many folds concurrently from driver
    threads over the shared SparkSession (Spark ML's own
    ``CrossValidator(parallelism=)`` scheme).  Fold seeds and data are
    per-fold, so the returned metrics are identical to the sequential
    run and keep fold order."""
    fold_col = F.pmod(F.xxhash64(F.col(group_col), F.lit(seed)), F.lit(n_folds))
    tagged = df.withColumn("__fold", fold_col).cache()

    def run_fold(f: int) -> dict[str, float] | None:
        train = tagged.filter(F.col("__fold") != f)
        test = tagged.filter(F.col("__fold") == f)
        if test.isEmpty() or train.isEmpty():
            return None
        model = fit_match_classifier(
            train, feature_cols, label_col=label_col, algo=algo, seed=seed
        )
        m = pairwise_metrics(predict_prob(model, test), label_col=label_col)
        m["fold"] = f
        return m

    try:
        if parallelism > 1 and n_folds > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(
                max_workers=min(parallelism, n_folds)
            ) as ex:
                out = list(ex.map(run_fold, range(n_folds)))
        else:
            out = [run_fold(f) for f in range(n_folds)]
    finally:
        tagged.unpersist()
    return [m for m in out if m is not None]


def feature_importances(
    model: PipelineModel, feature_cols: list[str]
) -> list[tuple[str, float]]:
    """(feature, importance) sorted desc — rebuild of
    model.feature_importances_ report (src/error_analysis.py:59-61).

    Tree models expose featureImportances; linear heads expose
    coefficients (the reference likewise returns model.coef_ for
    linear/logistic/svm, classification.py:48,57); MLP exposes
    neither -> empty list."""
    clf = model.stages[-1]
    if hasattr(clf, "featureImportances"):
        imps = clf.featureImportances.toArray()
    elif hasattr(clf, "coefficients"):
        imps = [abs(c) for c in clf.coefficients.toArray()]
    else:
        return []
    pairs = list(zip(feature_cols, (float(x) for x in imps)))
    return sorted(pairs, key=lambda kv: -kv[1])


def id_agreement_baseline(
    pairs: DataFrame,
    id1_col: str,
    id2_col: str,
    label_col: str = "same_entity",
) -> dict[str, float]:
    """External-id oracle baseline (M10): predict match iff the two
    side ids agree (src/comparison/author_id_baseline.py:19-35).
    Null on either side -> predict 0."""
    scored = pairs.withColumn(
        "pred",
        (
            F.col(id1_col).isNotNull()
            & F.col(id2_col).isNotNull()
            & (F.col(id1_col) == F.col(id2_col))
        ).cast("int"),
    )
    return pairwise_metrics(scored, label_col=label_col)


def error_analysis(scored: DataFrame, label_col: str = "same_entity") -> DataFrame:
    """false_positive / false_negative tagging for the error sink
    (analog of database/statistics.sql:717-737,765-781)."""
    lab, prd = F.col(label_col), F.col("pred")
    return scored.withColumn(
        "error_type",
        F.when((lab == 0) & (prd == 1), "false_positive")
        .when((lab == 1) & (prd == 0), "false_negative")
        .otherwise(F.lit(None).cast("string")),
    )
