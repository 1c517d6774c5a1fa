"""Feature-group ablation harness — the reference's headline
comparison deliverable.

Rebuild of src/comparison/feature_group.py (SONG / GS / combined /
supplementary feature subsets) + the per-group result.txt runs driven
by src/comparison/inner_feature_method.py:43-58: for each
(feature_group, model) the reference runs GroupShuffleSplit 10-fold CV
and reports fold-averaged pairwise metrics (the BASELINE.md quality
table).  Here each cell is a grouped_cv run over the engine's pair
feature table, and the result is a DataFrame ready for a StageStore
sink instead of a result.txt.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pubmed_and_method_spark.ml.model import grouped_cv

# Transcript analogs of the reference's groups
# (src/comparison/feature_group.py:5-41).  SONG = name + coauthor +
# content; GS = name-shape + initials + ambiguity + coauthor + date;
# "supplement" = the engine's own additions (editops count, uniq-char
# diff, TF-IDF cosine — mirroring our_suppl_features).
FEATURE_GROUPS: dict[str, list[str]] = {
    "name_based": [
        "name_char_jacc_li", "name_char_jacc_lf", "name_jw",
        "lastname_len_avg", "given_jw", "initial_eq",
        "name_edit_diff_chars", "name_uniq_char_diff",
        "initial_len_score", "name_lev_ratio",
    ],
    "content_based": ["token_jacc", "shingle_jacc", "content_tfidf_cos"],
    "tool_based": ["tool_jacc"],
    "time_based": ["time_diff_days", "time_overlap"],
    "song_analog": [
        "name_char_jacc_li", "name_jw", "tool_jacc", "token_jacc",
    ],
    "gs_analog": [
        "lastname_len_avg", "given_jw", "initial_eq", "ambiguity_score",
        "tool_jacc", "time_diff_days",
    ],
    "supplement": [
        "name_edit_diff_chars", "name_uniq_char_diff", "content_tfidf_cos",
    ],
}


def feature_group_ablation(
    features: DataFrame,
    groups: dict[str, list[str]] | None = None,
    algos: tuple[str, ...] = ("gbt",),
    group_col: str = "split_group",
    n_folds: int = 4,
    seed: int = 42,
) -> list[dict]:
    """One row per (feature_group, algo): fold-averaged grouped-CV
    metrics — the result.txt table shape
    (src/comparison/inner_feature_method.py:57 np.average)."""
    groups = FEATURE_GROUPS if groups is None else groups
    out: list[dict] = []
    cached = features.cache()
    try:
        for gname, cols in groups.items():
            for algo in algos:
                folds = grouped_cv(
                    cached, cols, group_col=group_col,
                    n_folds=n_folds, algo=algo, seed=seed,
                )
                if not folds:
                    continue
                n = len(folds)
                out.append(
                    {
                        "feature_group": gname,
                        "algo": algo,
                        "n_features": len(cols),
                        "n_folds": n,
                        "accuracy": sum(f["accuracy"] for f in folds) / n,
                        "precision": sum(f["precision"] for f in folds) / n,
                        "recall": sum(f["recall"] for f in folds) / n,
                        "f1": sum(f["f1"] for f in folds) / n,
                    }
                )
    finally:
        cached.unpersist()
    return out


def model_comparison(
    features: DataFrame,
    feature_cols: list[str],
    algos: tuple[str, ...] | None = None,
    group_col: str = "split_group",
    n_folds: int = 4,
    seed: int = 42,
) -> list[dict]:
    """The reference's per-model comparison loop (src/main_app.py:43
    iterates available_modes() and CV-evaluates each): one fold-avg
    metrics row per classifier over the full feature stack."""
    from pubmed_and_method_spark.ml.model import AVAILABLE_ALGOS

    algos = tuple(AVAILABLE_ALGOS) if algos is None else algos
    return feature_group_ablation(
        features,
        groups={"all_features": list(feature_cols)},
        algos=algos,
        group_col=group_col,
        n_folds=n_folds,
        seed=seed,
    )


def ablation_table(spark: SparkSession, rows: list[dict]) -> DataFrame:
    """Materialize the ablation rows as a DataFrame (StageStore-ready,
    the result.txt artifact analog)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("feature_group", T.StringType()),
            T.StructField("algo", T.StringType()),
            T.StructField("n_features", T.IntegerType()),
            T.StructField("n_folds", T.IntegerType()),
            T.StructField("accuracy", T.DoubleType()),
            T.StructField("precision", T.DoubleType()),
            T.StructField("recall", T.DoubleType()),
            T.StructField("f1", T.DoubleType()),
        ]
    )
    return spark.createDataFrame(rows, schema)
