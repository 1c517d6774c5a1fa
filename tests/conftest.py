import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pubmed_and_method_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def corpus(spark):
    """(transcripts, truth) synthetic fixture, seed 42."""
    from pubmed_and_method_spark.sources.datagen import transcripts_df

    t, g = transcripts_df(spark, seed=42)
    t.cache().count()
    g.cache().count()
    return t, g


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
