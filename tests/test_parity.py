"""Every oracle-checked suite query must match DuckDB exactly at sf0.001.

This is the local mirror of the driver's correctness gate — if this file is
green, CORRECTNESS_r{N}.json should be green."""

from __future__ import annotations

import pytest

from iceberg_kafka_connect_spark.suite import load_all

from .oracle import compare, duckdb_connection

SPECS = load_all()
ORACLE_QUERIES = sorted(n for n, s in SPECS.items() if s.oracle is not None)
ROWS_ONLY = sorted(n for n, s in SPECS.items() if s.oracle is None)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, sf_dir, duck, name):
    spec = SPECS[name]
    sdf = spec.fn(spark, sf_dir).toPandas()
    ddf = duck.execute(spec.oracle).df()
    problems = compare(sdf, ddf)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, sf_dir, name):
    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
