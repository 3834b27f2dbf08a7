"""Stream sources producing the kafka-shaped record columns.

The reference's source is the Kafka Connect framework (S1,
IcebergSinkTask.java:52-78): every record carries topic / partition /
offset / timestamp plus key and value. In Spark the ``kafka`` source
exposes exactly those columns; this module adds a file-based source with
the SAME shape so the whole pipeline (transforms → routing → sink) is
testable without a broker and swaps to real Kafka by changing one call.

Offset tracking / restore (S2/S3) is Structured Streaming's checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

KAFKA_SHAPE = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("value", T.StringType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
    ]
)


def kafka_stream_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Real Kafka source (requires the spark-sql-kafka package on the
    cluster; not present in this container — the file source below is the
    drop-in stand-in with identical columns)."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return raw.select(
        F.col("key").cast("string"),
        F.col("value").cast("string"),
        "topic",
        "partition",
        "offset",
        "timestamp",
    )


def file_stream_source(spark: SparkSession, path: str) -> DataFrame:
    """Kafka-shaped stream from JSON-lines files (one record per line with
    the KAFKA_SHAPE fields). Used by tests and local runs; exactly-once
    comes from the same checkpoint machinery as the kafka source."""
    return (
        spark.readStream.schema(KAFKA_SHAPE)
        .option("maxFilesPerTrigger", "8")
        .json(path)
    )


def batch_file_source(spark: SparkSession, path: str) -> DataFrame:
    """Batch flavor of the file source (for foreachBatch unit tests)."""
    return spark.read.schema(KAFKA_SHAPE).json(path)
