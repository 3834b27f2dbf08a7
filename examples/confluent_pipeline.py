"""Wire-format walkthrough: Schema-Registry-framed topics → lakehouse.

What a reference-connector deployment behind Confluent converters
(`README.md:77` of the reference) does today, end-to-end against local
temp dirs:

  1. start the in-process Confluent-protocol Schema Registry
  2. produce a topic: two writer-schema GENERATIONS of framed Avro wire
     bytes (v2 adds a column — the schema-evolution shape)
  3. run the SinkPipeline with ``value.converter=AvroConverter`` config
     keys verbatim; old records fill the new column with the reader
     default, decode failures route to the DLQ
  4. read the landed table and the DLQ back

Usage: python examples/confluent_pipeline.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datetime import datetime

from pyspark.sql import types as T

from iceberg_kafka_connect_spark.config import SinkConfig, TableConfig
from iceberg_kafka_connect_spark.session import get_spark
from iceberg_kafka_connect_spark.sinks import Catalog
from iceberg_kafka_connect_spark.sinks.avro_io import spark_to_avro_schema
from iceberg_kafka_connect_spark.sources.confluent import (
    encode_avro_payload,
    frame,
    value_converter_from_properties,
)
from iceberg_kafka_connect_spark.sources.registry import (
    SchemaRegistryClient,
    SchemaRegistryServer,
)
from iceberg_kafka_connect_spark.streaming import SinkPipeline


def main() -> None:
    spark = get_spark(app_name="confluent-pipeline-example")
    spark.sparkContext.setLogLevel("ERROR")

    v1 = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
    ])
    v2 = T.StructType(list(v1.fields) + [
        T.StructField("source", T.StringType()),
    ])
    avro_v1 = spark_to_avro_schema(v1, name="user")
    avro_v2 = spark_to_avro_schema(v2, name="user")

    with SchemaRegistryServer() as registry:
        client = SchemaRegistryClient(registry.uri)
        id1 = client.register("users-value", avro_v1)
        id2 = client.register("users-value", avro_v2)
        print(f"registry at {registry.uri}: v1 id={id1}, v2 id={id2}")

        ts = datetime(2024, 1, 1)
        rows = []
        for i in range(3):  # old producer generation
            rows.append((str(i), frame(id1, encode_avro_payload(
                avro_v1, {"id": i, "name": f"old{i}"})), "users", 0, i, ts))
        for i in range(3, 6):  # upgraded producer
            rows.append((str(i), frame(id2, encode_avro_payload(
                avro_v2, {"id": i, "name": f"new{i}", "source": "k2"})),
                "users", 0, i, ts))
        rows.append(("bad", b"\x07not-framed", "users", 0, 6, ts))
        rows.append(("gone", None, "users", 0, 7, ts))  # tombstone
        batch = spark.createDataFrame(
            rows,
            "key string, value binary, topic string, partition int, "
            "offset long, timestamp timestamp",
        )

        converter = value_converter_from_properties({
            "value.converter": "io.confluent.connect.avro.AvroConverter",
            "value.converter.schema.registry.url": registry.uri,
            "errors.tolerance": "all",
        })
        wh = tempfile.mkdtemp(prefix="confluent-example-")
        catalog = Catalog(wh)
        cfg = SinkConfig(
            tables=[TableConfig("default.users")],
            auto_create=True,
            errors_tolerance="all",
            dlq_table="default.users_dlq",
        )
        pipe = SinkPipeline(
            catalog, cfg, "example", value_schema=v2,
            value_converter=converter,
        )
        pipe.process_batch(batch, 0)

        users = catalog.load_table("default.users").read(spark)
        print("landed rows (old generation fills `source` as null):")
        for r in users.orderBy("id").collect():
            print("  ", r.id, r.name, r.source)
        dlq = catalog.load_table("default.users_dlq").read(spark)
        print("DLQ rows:", dlq.count(), "(the unframed record)")
        offsets = json.loads(
            catalog.load_table("default.users")
            .current_snapshot()["summary"]["kafka.connect.offsets"]
        )
        print("committed offsets (tombstone advanced too):", offsets)


if __name__ == "__main__":
    main()
