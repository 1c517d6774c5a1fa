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
    parallelism: int = 1,
    progress=None,
) -> list[dict]:
    """One row per (feature_group, algo): fold-averaged grouped-CV
    metrics — the result.txt table shape
    (src/comparison/inner_feature_method.py:57 np.average).

    ``parallelism`` > 1 fits that many (group, algo) cells
    concurrently from driver threads over the shared SparkSession —
    the same scheme as Spark ML's own ``CrossValidator(parallelism=)``.
    Each cell's fold loop stays sequential and seeded, so the returned
    rows are identical to the sequential run (cell order preserved);
    concurrency only overlaps the per-fit scheduling barriers that
    leave most executor cores idle during a single small fit.
    ``progress`` (optional ``str -> None``) is called once per
    finished cell."""
    groups = FEATURE_GROUPS if groups is None else groups
    cells = [
        (gname, cols, algo)
        for gname, cols in groups.items()
        for algo in algos
    ]
    cached = features.cache()

    def run_cell(cell):
        gname, cols, algo = cell
        folds = grouped_cv(
            cached, cols, group_col=group_col,
            n_folds=n_folds, algo=algo, seed=seed,
        )
        if progress is not None:
            progress(f"{gname}/{algo}: {len(folds)} folds fit")
        if not folds:
            return None
        n = len(folds)
        return {
            "feature_group": gname,
            "algo": algo,
            "n_features": len(cols),
            "n_folds": n,
            "accuracy": sum(f["accuracy"] for f in folds) / n,
            "precision": sum(f["precision"] for f in folds) / n,
            "recall": sum(f["recall"] for f in folds) / n,
            "f1": sum(f["f1"] for f in folds) / n,
        }

    try:
        if parallelism > 1 and len(cells) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(
                max_workers=min(parallelism, len(cells))
            ) as ex:
                rows = list(ex.map(run_cell, cells))
        else:
            rows = [run_cell(c) for c in cells]
    finally:
        cached.unpersist()
    return [r for r in rows if r is not None]


def model_comparison(
    features: DataFrame,
    feature_cols: list[str],
    algos: tuple[str, ...] | None = None,
    group_col: str = "split_group",
    n_folds: int = 4,
    seed: int = 42,
    parallelism: int = 1,
    progress=None,
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
        parallelism=parallelism,
        progress=progress,
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
