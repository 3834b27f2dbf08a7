"""Streaming read of the lakehouse (table_stream_source): each committed
data file surfaces exactly once across restarts, like Iceberg's streaming
read."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from iceberg_kafka_connect_spark.sinks import Catalog
from iceberg_kafka_connect_spark.sources.stream import table_stream_source

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("v", T.StringType()),
    ]
)


@pytest.fixture()
def catalog(tmp_path):
    return Catalog(str(tmp_path / "wh"))


def _rows(lo, hi):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    return [(i, base + dt.timedelta(minutes=i), f"v{i}") for i in range(lo, hi)]


def _drain(spark, t, checkpoint, out_dir=None, name=None):
    src = table_stream_source(spark, t)
    if out_dir is not None:
        # parquet sink: supports checkpoint recovery (memory sink doesn't)
        q = (
            src.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.schema(src.schema).parquet(out_dir)
    q = (
        src.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_stream_reads_appends_exactly_once(spark, catalog, tmp_path):
    t = catalog.create_table("default.s1", SCHEMA)
    t.append(spark.createDataFrame(_rows(0, 10), SCHEMA))
    t.append(spark.createDataFrame(_rows(10, 20), SCHEMA))
    cp, out_dir = str(tmp_path / "cp"), str(tmp_path / "out")
    out = _drain(spark, t, cp, out_dir)
    assert sorted(r.id for r in out.collect()) == list(range(20))
    # new commit, same checkpoint: only the new file's rows arrive — every
    # id appears exactly once in the cumulative sink output
    t.append(spark.createDataFrame(_rows(20, 30), SCHEMA))
    out2 = _drain(spark, t, cp, out_dir)
    assert sorted(r.id for r in out2.collect()) == list(range(30))


def test_stream_rederives_transform_partitions(spark, catalog, tmp_path):
    t = catalog.create_table(
        "default.s2", SCHEMA, partition_by="day(ts)"
    )
    t.append(spark.createDataFrame(_rows(0, 5), SCHEMA))
    out = _drain(spark, t, str(tmp_path / "cp2"), name="stream_t2")
    batch_cols = set(t.read(spark).columns)
    assert set(out.columns) == batch_cols
    assert out.count() == 5


def test_stream_rejects_identity_partitions(spark, catalog, tmp_path):
    t = catalog.create_table("default.s3", SCHEMA, partition_by="v")
    t.append(spark.createDataFrame(_rows(0, 3), SCHEMA))
    with pytest.raises(ValueError, match="identity partition"):
        table_stream_source(spark, t)
