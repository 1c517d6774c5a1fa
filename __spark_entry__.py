"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship dedup-cluster query at sf0.001;
``queries``/``oracle_sql`` expose the operator-coverage registry in
``pubmed_and_method_spark.queries`` (each Spark plan paired with a
DuckDB-runnable ANSI oracle; rows-only entries have no oracle).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pubmed_and_method_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q.flagship(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_q.QUERIES)


def oracle_sql() -> dict[str, str]:
    # q26/q27 oracles read the materialized synthetic corpus — make
    # sure the parquet exists before any of these SQL strings can run
    _q.ensure_transcript_corpus()
    return dict(_q.ORACLES)
