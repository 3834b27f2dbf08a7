"""Oracle parity at sf0.01 — the exact scale the driver's correctness gate
runs at. Slower than the sf0.001 suite; kept separate so -x iteration stays
fast. Run explicitly or in CI-style full passes."""

from __future__ import annotations

import pytest

from iceberg_kafka_connect_spark.suite import load_all

from .oracle import compare, duckdb_connection

SPECS = load_all()
ORACLE_QUERIES = sorted(n for n, s in SPECS.items() if s.oracle is not None)


@pytest.fixture(scope="module")
def duck(sf_correct_dir):
    con = duckdb_connection(sf_correct_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity_sf001(spark, sf_correct_dir, duck, name):
    spec = SPECS[name]
    sdf = spec.fn(spark, sf_correct_dir).toPandas()
    ddf = duck.execute(spec.oracle).df()
    problems = compare(sdf, ddf)
    assert not problems, f"{name}: " + "; ".join(problems)
