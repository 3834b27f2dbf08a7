"""Deployment walkthrough: the two services a reference deployment
talks to — Schema Registry + Kafka Connect REST — both in-process.

Reproduces the reference README's operational flow end-to-end:

  1. serve the Confluent-protocol Schema Registry and the Connect REST
     worker (file-based kafka twin standing in for the broker)
  2. produce a framed-Avro topic (base64 wire files)
  3. POST the connector JSON — the README's exact shape plus the
     value.converter keys a real deployment sets
  4. poll /status, read the landed table, pause/resume, delete

Usage: python examples/connect_deployment.py
"""

from __future__ import annotations

import base64
import json
import os
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import types as T

from iceberg_kafka_connect_spark.connect_server import ConnectRestServer
from iceberg_kafka_connect_spark.connect_worker import ConnectWorker
from iceberg_kafka_connect_spark.session import get_spark
from iceberg_kafka_connect_spark.sinks import Catalog
from iceberg_kafka_connect_spark.sinks.avro_io import spark_to_avro_schema
from iceberg_kafka_connect_spark.sources.confluent import (
    encode_avro_payload,
    frame,
)
from iceberg_kafka_connect_spark.sources.registry import (
    SchemaRegistryClient,
    SchemaRegistryServer,
)


def _call(uri, method="GET", body=None):
    req = urllib.request.Request(
        uri, method=method,
        data=json.dumps(body).encode() if body is not None else None,
    )
    with urllib.request.urlopen(req) as resp:
        raw = resp.read()
        return json.loads(raw) if raw else None


def main() -> None:
    spark = get_spark(app_name="connect-deployment-example")
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="connect-example-")

    value_schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("type", T.StringType()),
    ])
    avro = spark_to_avro_schema(value_schema, name="event")

    with SchemaRegistryServer() as registry:
        sid = SchemaRegistryClient(registry.uri).register(
            "events-value", avro
        )
        topic = f"{base}/topics/events"
        os.makedirs(topic)
        with open(f"{topic}/c0.json", "w") as f:
            for i in range(6):
                framed = frame(sid, encode_avro_payload(
                    avro, {"id": i, "type": "list" if i % 2 else "create"}
                ))
                f.write(json.dumps({
                    "key": base64.b64encode(str(i).encode()).decode(),
                    "value": base64.b64encode(framed).decode(),
                    "topic": "events", "partition": 0, "offset": i,
                    "timestamp": "2024-01-01T00:00:00.000Z",
                }) + "\n")

        worker = ConnectWorker(
            spark,
            warehouse=f"{base}/wh",
            checkpoint_root=f"{base}/ck",
            files_root=f"{base}/topics",
            binary_value=True,
        )
        with ConnectRestServer(worker) as srv:
            print("connect REST at", srv.uri)
            info = _call(f"{srv.uri}/connectors", "POST", {
                "name": "events-sink",
                "config": {
                    "connector.class":
                        "io.tabular.iceberg.connect."
                        "IcebergSinkConnector",
                    "tasks.max": "2",
                    "topics": "events",
                    "iceberg.tables": "default.events",
                    "iceberg.tables.auto-create-enabled": "true",
                    "iceberg.control.commit.interval-ms": "500",
                    "value.converter":
                        "io.confluent.connect.avro.AvroConverter",
                    "value.converter.schema.registry.url": registry.uri,
                    "value.schema.ddl": "id long, type string",
                },
            })
            print("created:", info["name"], info["type"])
            cat = Catalog(f"{base}/wh")
            for _ in range(120):
                try:
                    if cat.load_table("default.events").read(
                        spark
                    ).count() == 6:
                        break
                except Exception:
                    pass
                time.sleep(0.5)
            status = _call(f"{srv.uri}/connectors/events-sink/status")
            print("status:", status["connector"]["state"])
            rows = sorted(
                (r.id, r.type)
                for r in cat.load_table("default.events")
                .read(spark).collect()
            )
            print("landed:", rows)
            _call(f"{srv.uri}/connectors/events-sink", "DELETE")
            print("deleted; connectors now:",
                  _call(f"{srv.uri}/connectors"))


if __name__ == "__main__":
    main()
