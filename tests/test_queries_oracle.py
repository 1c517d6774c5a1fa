"""Replicates the driver's correctness gate locally: every oracle-
paired query runs on Spark AND DuckDB at sf0.001; row counts, column
names, and (order-insensitively) values must match exactly."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def norm_val(v):
        if isinstance(v, bool):
            return int(v)
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return round(v, 6)
        if hasattr(v, "isoformat"):
            return v.isoformat()
        return v

    return sorted(tuple(norm_val(r[i]) for i in order) for r in rows)


ORACLE_KEYS = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, duck, name):
    qfn = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]

    sdf = qfn(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: rowcount {len(spark_rows)} vs {len(duck_rows)}"
    )
    ns, nd = normalize(spark_rows, spark_cols), normalize(duck_rows, duck_cols)
    mismatches = [(a, b) for a, b in zip(ns, nd) if a != b]
    assert not mismatches, f"{name}: first diffs {mismatches[:3]}"


def test_q34_threshold_margin(duck):
    """ADVICE r03: q34's Spark-vs-DuckDB ID-set comparison is only
    engine-stable because no pair's cosine sits near the 0.9
    threshold (planted dups ~0.999, random 64-dim pairs far below).
    Pin that invariant: the exact all-pairs cosine distribution on the
    q34 corpus must keep a >=1e-3 exclusion band around the
    threshold, so float accumulation-order differences between
    engines cannot flip a pair's membership.  A corpus change that
    violates this fails HERE, not as a flaky driver hash."""
    n = duck.execute(
        """
        WITH planted AS (
            SELECT vec_id + 1000000000 AS vec_id,
                   list_transform(embedding,
                       (x, i) -> CASE WHEN i = 1 THEN x + 0.01 ELSE x END)
                       AS embedding
            FROM embeddings WHERE vec_id % 20 = 0),
        corpus AS (
            SELECT vec_id, embedding FROM embeddings
            UNION ALL SELECT vec_id, embedding FROM planted),
        sims AS (
            SELECT list_dot_product(a.embedding, b.embedding)
                     / (sqrt(list_dot_product(a.embedding, a.embedding))
                        * sqrt(list_dot_product(b.embedding, b.embedding)))
                     AS cos
            FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id)
        SELECT count(*) FROM sims WHERE abs(cos - 0.9) < 1e-3
        """
    ).fetchone()[0]
    assert n == 0, f"{n} pairs within 1e-3 of the q34 threshold"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_rows_only_queries_run(spark):
    oracles = entry_mod.oracle_sql()
    for name, fn in entry_mod.queries().items():
        if name not in oracles:
            assert fn(spark, SF_DIR).count() >= 0, name
