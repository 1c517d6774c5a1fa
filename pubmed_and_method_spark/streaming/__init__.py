from pubmed_and_method_spark.streaming.incremental import (  # noqa: F401
    run_incremental_signatures,
)
