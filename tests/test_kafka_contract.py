"""S1 conformance without a broker: the real ``kafka_stream_source``
option assembly must produce exactly the reader options and output
columns the file-based stand-in emulates. The recording stub stands in
for ``spark.readStream`` and hands back a DataFrame with the kafka
source's RAW schema (binary key/value + metadata, per the Spark kafka
integration docs), so the projection runs for real."""

from __future__ import annotations

from pyspark.sql import types as T

from iceberg_kafka_connect_spark.sources.stream import (
    KAFKA_SHAPE,
    batch_file_source,
    kafka_stream_source,
)

# the kafka source's fixed output schema (Spark docs: key/value BINARY,
# topic STRING, partition INT, offset LONG, timestamp TIMESTAMP,
# timestampType INT)
_KAFKA_RAW = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("timestampType", T.IntegerType()),
    ]
)


class _RecordingReader:
    def __init__(self, spark):
        self._spark = spark
        self.fmt = None
        self.opts: dict[str, str] = {}

    def format(self, fmt):
        self.fmt = fmt
        return self

    def option(self, k, v):
        self.opts[k] = v
        return self

    def load(self):
        import datetime

        return self._spark.createDataFrame(
            [
                (
                    b"k1",
                    b'{"id": 1}',
                    "events",
                    0,
                    42,
                    datetime.datetime(2026, 1, 1),
                    0,
                )
            ],
            _KAFKA_RAW,
        )


class _StubSession:
    def __init__(self, spark):
        self.readStream = _RecordingReader(spark)


def test_kafka_source_option_assembly(spark):
    stub = _StubSession(spark)
    out = kafka_stream_source(
        stub,
        bootstrap_servers="b1:9092,b2:9092",
        topics="events,orders",
        starting_offsets='{"events":{"0":23}}',
        kafka_props={
            "security.protocol": "SASL_SSL",
            "sasl.mechanism": "PLAIN",
        },
        max_offsets_per_trigger=50_000,
    )
    r = stub.readStream
    assert r.fmt == "kafka"
    # option-for-option: the reference's iceberg.kafka.* passthrough lands
    # as kafka.<prop>; subscribe carries the comma list unchanged;
    # startingOffsets passes the JSON through verbatim
    assert r.opts == {
        "kafka.bootstrap.servers": "b1:9092,b2:9092",
        "subscribe": "events,orders",
        "startingOffsets": '{"events":{"0":23}}',
        "kafka.security.protocol": "SASL_SSL",
        "kafka.sasl.mechanism": "PLAIN",
        "maxOffsetsPerTrigger": "50000",
    }
    # the projected shape is exactly the stand-in's KAFKA_SHAPE
    assert out.schema == KAFKA_SHAPE
    [row] = out.collect()
    assert (row.key, row.value, row.topic, row.partition, row.offset) == (
        "k1",
        '{"id": 1}',
        "events",
        0,
        42,
    )


def test_kafka_source_defaults_and_standin_shape(spark, tmp_path):
    stub = _StubSession(spark)
    kafka_stream_source(stub, "b:9092", "t")
    assert stub.readStream.opts == {
        "kafka.bootstrap.servers": "b:9092",
        "subscribe": "t",
        "startingOffsets": "earliest",
    }
    # the file stand-in reads into the identical column set/types
    p = tmp_path / "recs"
    p.mkdir()
    (p / "a.json").write_text(
        '{"key": "k", "value": "v", "topic": "t", "partition": 0, '
        '"offset": 1, "timestamp": "2026-01-01T00:00:00"}\n'
    )
    standin = batch_file_source(spark, str(p))
    assert standin.schema == KAFKA_SHAPE
