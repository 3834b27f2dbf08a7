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
    topics: str | None,
    starting_offsets: str = "earliest",
    kafka_props: dict[str, str] | None = None,
    max_offsets_per_trigger: int | None = None,
    subscribe_pattern: str | None = None,
) -> DataFrame:
    """Real Kafka source (requires the spark-sql-kafka package on the
    cluster; not present in this container — the file source below is the
    drop-in stand-in with identical columns).

    ``kafka_props`` is the reference's ``iceberg.kafka.*`` client-property
    passthrough (IcebergSinkConfig.java:63,259-260): each entry lands as a
    ``kafka.<prop>`` option on the source (security.protocol,
    sasl.jaas.config, ...), exactly how Spark's kafka source forwards
    client properties to the consumer."""
    if bool(topics) == bool(subscribe_pattern):
        raise ValueError(
            "exactly one of topics / subscribe_pattern is required"
        )
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("startingOffsets", starting_offsets)
    )
    # Connect's topics vs topics.regex subscription modes map onto the
    # kafka source's subscribe vs subscribePattern options
    if topics:
        reader = reader.option("subscribe", topics)
    else:
        reader = reader.option("subscribePattern", subscribe_pattern)
    for k, v in (kafka_props or {}).items():
        reader = reader.option(f"kafka.{k}", v)
    if max_offsets_per_trigger is not None:
        # backpressure: cap records per micro-batch so a deep backlog
        # replays in bounded batches instead of one giant first batch
        reader = reader.option(
            "maxOffsetsPerTrigger", str(max_offsets_per_trigger)
        )
    raw = reader.load()
    return raw.select(
        F.col("key").cast("string"),
        F.col("value").cast("string"),
        "topic",
        "partition",
        "offset",
        "timestamp",
    )


def file_stream_source(
    spark: SparkSession, path: str, binary_value: bool = False
) -> DataFrame:
    """Kafka-shaped stream from JSON-lines files (one record per line with
    the KAFKA_SHAPE fields). Used by tests and local runs; exactly-once
    comes from the same checkpoint machinery as the kafka source.

    ``binary_value=True`` is the wire-format twin: key/value carry
    base64 text in the files (JSON can't hold raw bytes) and decode to
    BINARY columns JVM-side (``unbase64``) — the exact column types the
    real kafka source emits, so value.converter/key.converter stages
    run unchanged against either source."""
    raw = (
        spark.readStream.schema(KAFKA_SHAPE)
        .option("maxFilesPerTrigger", "8")
        .json(path)
    )
    return _as_binary(raw) if binary_value else raw


def _as_binary(df: DataFrame) -> DataFrame:
    return df.select(
        F.unbase64("key").alias("key"),
        F.unbase64("value").alias("value"),
        "topic",
        "partition",
        "offset",
        "timestamp",
    )


def batch_file_source(
    spark: SparkSession, path: str, binary_value: bool = False
) -> DataFrame:
    """Batch flavor of the file source (for foreachBatch unit tests)."""
    raw = spark.read.schema(KAFKA_SHAPE).json(path)
    return _as_binary(raw) if binary_value else raw


def table_stream_source(spark: SparkSession, lake_table) -> DataFrame:
    """Streaming read of a LakehouseTable's appends — Iceberg streaming-read
    parity (SparkMicroBatchStream in the Iceberg runtime the reference
    writes through): downstream jobs `readStream` the table and each newly
    committed data file surfaces exactly once, tracked by the file-source
    checkpoint.

    Semantics and limits (same shape as Iceberg's streaming read):
    - append-only: equality deletes are not applied mid-stream, and a
      compaction (replace snapshot) re-emits rows — run compaction on a
      branch or on tables not being streamed;
    - identity-partitioned tables are rejected: the identity column lives
      only in the directory name, which ``recursiveFileLookup`` (needed to
      walk per-commit dirs) cannot recover. Transform partitions
      (day/bucket/truncate/...) are re-derived from their source columns.
    """
    import os

    fmt = lake_table.file_format()
    if fmt == "avro":
        raise ValueError(
            "streaming read requires a Spark-native file format "
            "(avro tables use the OCF codec readable only in batch)"
        )
    spec = lake_table.partition_spec()
    identity = [f.name for f in spec if f.transform == "identity"]
    if identity:
        raise ValueError(
            f"identity partition column(s) {identity} live only in "
            "directory names; stream a transform-partitioned or "
            "unpartitioned table, or poll appends_between() instead"
        )
    # the file schema = read schema minus derived partition columns (they
    # were moved to directory names at write time) …
    derived = {f.name for f in spec}
    file_schema = T.StructType(
        [f for f in lake_table.read_schema().fields if f.name not in derived]
    )
    df = (
        spark.readStream.schema(file_schema)
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", f"*.{fmt}")
        .option("maxFilesPerTrigger", "64")
        .format(fmt)
        .load(os.path.join(lake_table.root, "data"))
    )
    # … and re-derived here, so the streamed shape equals the batch read
    for f in spec:
        df = df.withColumn(f.name, f.expr())
    return df
