from pubmed_and_method_spark.ml.model import (  # noqa: F401
    AVAILABLE_ALGOS,
    downsample_majority,
    fit_match_classifier,
    grouped_split,
    pairwise_metrics,
)
