"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All queries live in iceberg_kafka_connect_spark/suite/ — one registry entry
per implemented operator from SURVEY.md §2 plus the training-data-pipeline
extensions (dedup / similarity / text / multimodal).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from iceberg_kafka_connect_spark.session import tune_session  # noqa: E402
from iceberg_kafka_connect_spark.suite import load_all  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    tune_session(spark)
    specs = load_all()
    return specs["tpch_q1"].fn(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    specs = load_all()
    return {name: spec.fn for name, spec in specs.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted entries (LSH/SimHash/numpy
    paths whose hashing isn't SQL-expressible) get the rows-only check."""
    specs = load_all()
    return {
        name: spec.oracle for name, spec in specs.items() if spec.oracle is not None
    }
