"""The correctness gate, locally: every query in the registry with a DuckDB
oracle must match it on row count, columns, and order-insensitive values —
the same comparison the driver runs at sf0.01 (run here at sf0.001 for
speed; set SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 for the full gate).
"""

from __future__ import annotations

import pytest

from url_counter_mapreduce_spark import QUERIES, ORACLES

from .oracle_utils import assert_frames_match, duckdb_connection

ORACLE_QUERIES = sorted(name for name, sql in ORACLES.items() if sql is not None)
ROWS_ONLY_QUERIES = sorted(name for name, sql in ORACLES.items() if sql is None)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir, con, name):
    spark_pdf = QUERIES[name](spark, sf_dir).toPandas()
    oracle_pdf = con.sql(ORACLES[name]).df()
    assert_frames_match(spark_pdf, oracle_pdf, name)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert len(df.columns) > 0
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"token", "cnt"}
    # top-k is sorted desc by cnt with deterministic tie order
    cnts = [r["cnt"] for r in rows]
    assert cnts == sorted(cnts, reverse=True)


def test_contract_shapes():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert all(callable(f) for f in q.values())
