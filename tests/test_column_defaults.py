"""Iceberg v3 default values: initial-default backfills pre-existing
files at read time (no rewrite); write-default fills appends that omit
the column; explicit values always win."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from iceberg_kafka_connect_spark.sinks.table import LakehouseTable

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("v", T.LongType(), True),
    ]
)


def test_initial_and_write_defaults(spark, tmp_path):
    t = LakehouseTable.create(str(tmp_path / "t"), SCHEMA)
    t.append(spark.range(0, 10).select("id", (F.col("id") * 2).alias("v")))
    t.add_column(
        "region", T.StringType(),
        initial_default="unassigned", write_default="web",
    )
    # append omitting the column → write-default
    t.append(spark.range(10, 20).select("id", (F.col("id") * 2).alias("v")))
    # append with explicit values → kept verbatim (including NULL)
    t.append(
        spark.range(20, 30).select(
            "id",
            (F.col("id") * 2).alias("v"),
            F.when(F.col("id") % 2 == 0, F.lit("eu")).alias("region"),
        )
    )
    got = {r.id: r.region for r in t.read(spark).collect()}
    assert all(got[i] == "unassigned" for i in range(0, 10))
    assert all(got[i] == "web" for i in range(10, 20))
    assert all(
        got[i] == ("eu" if i % 2 == 0 else None) for i in range(20, 30)
    )


def test_defaults_survive_compaction_and_typed(spark, tmp_path):
    t = LakehouseTable.create(str(tmp_path / "t2"), SCHEMA)
    t.append(spark.range(0, 5).select("id", F.col("id").alias("v")))
    t.add_column("score", T.DoubleType(), initial_default=1.5)
    t.append(
        spark.range(5, 8).select(
            "id", F.col("id").alias("v"), F.lit(9.0).alias("score")
        )
    )
    before = sorted((r.id, r.score) for r in t.read(spark).collect())
    assert before == [(i, 1.5) for i in range(5)] + [(i, 9.0) for i in range(5, 8)]
    # compaction materializes the defaults into plain data files
    t.compact(spark)
    assert sorted((r.id, r.score) for r in t.read(spark).collect()) == before
    # schema type is applied (double, not string)
    assert dict(t.read(spark).dtypes)["score"] == "double"


def test_add_column_rejects_duplicates_and_no_default_is_null(
    spark, tmp_path
):
    t = LakehouseTable.create(str(tmp_path / "t3"), SCHEMA)
    t.append(spark.range(0, 3).select("id", F.col("id").alias("v")))
    t.add_column("w", T.LongType())  # no defaults: NULL everywhere
    with pytest.raises(ValueError, match="already exists"):
        t.add_column("w", T.LongType())
    t.append(spark.range(3, 5).select("id", F.col("id").alias("v")))
    assert [r.w for r in t.read(spark).collect()] == [None] * 5
