from pubmed_and_method_spark.plans.checkpoint import StageStore  # noqa: F401
