"""End-to-end walkthrough: Debezium CDC stream → lakehouse → curation → SQL.

Runs everything a user of the reference connector does today, plus the
training-data extensions, against local temp dirs:

  1. ingest a Debezium CDC stream (file-based kafka-shaped source) with
     upsert-on-id into a partitioned lakehouse table
  2. kill/restart the stream and show exactly-once replays
  3. run SQL analytics over the landed table
  4. run the curation operators (dedup + quality + language stats) on the
     driver's documents corpus

Usage: python examples/end_to_end.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import types as T

from iceberg_kafka_connect_spark.config import from_properties
from iceberg_kafka_connect_spark.operators import dedup, text
from iceberg_kafka_connect_spark.session import get_spark
from iceberg_kafka_connect_spark.sinks import Catalog
from iceberg_kafka_connect_spark.sources.stream import file_stream_source
from iceberg_kafka_connect_spark.streaming import SinkPipeline
from iceberg_kafka_connect_spark.transforms import debezium_transform

_ENVELOPE_DDL = (
    "op string, before struct<id: bigint, amount: double, region: string>, "
    "after struct<id: bigint, amount: double, region: string>, "
    "source struct<db: string, schema: string, table: string>, ts_ms bigint"
)


def emit(src: str, envelopes: list[dict], offset0: int) -> None:
    with open(os.path.join(src, f"batch-{offset0}.json"), "w") as f:
        for i, env in enumerate(envelopes):
            f.write(
                json.dumps(
                    {
                        "key": str(env.get("after", {}) or {}).replace("'", ""),
                        "value": json.dumps(env),
                        "topic": "appdb.orders",
                        "partition": 0,
                        "offset": offset0 + i,
                        "timestamp": f"2024-01-01T00:00:{(offset0 + i) % 60:02d}Z",
                    }
                )
                + "\n"
            )


def env(op, before, after, ts):
    return {
        "op": op,
        "before": before,
        "after": after,
        "source": {"db": "appdb", "schema": None, "table": "orders"},
        "ts_ms": ts,
    }


def main() -> None:
    work = tempfile.mkdtemp(prefix="iks-example-")
    src = os.path.join(work, "in")
    os.makedirs(src)
    spark = get_spark(app_name="iks-example", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    # --- 1. the connector config, reference property names verbatim -------
    cfg = from_properties(
        {
            "iceberg.tables": "default.orders",
            "iceberg.tables.cdc-field": "_cdc.op",
            "iceberg.table.default.orders.id-columns": "id",
            "iceberg.table.default.orders.partition-by": "region",
            "iceberg.tables.auto-create-enabled": "true",
        }
    )
    catalog = Catalog(os.path.join(work, "warehouse"))
    pipe = SinkPipeline(
        catalog, cfg, "example", value_schema=T.StructType.fromDDL(_ENVELOPE_DDL),
        transforms=[debezium_transform()],
    )

    emit(src, [
        env("c", None, {"id": 1, "amount": 10.0, "region": "eu"}, 1000),
        env("c", None, {"id": 2, "amount": 20.0, "region": "us"}, 2000),
        env("u", {"id": 1, "amount": 10.0, "region": "eu"},
            {"id": 1, "amount": 15.0, "region": "eu"}, 3000),
    ], 0)
    ckpt = os.path.join(work, "ckpt")
    q = pipe.start(file_stream_source(spark, src), ckpt, available_now=True)
    q.awaitTermination(120)

    t = catalog.load_table("default.orders")
    print("after batch 1:", sorted((r.id, r.amount) for r in t.read(spark).collect()))

    # --- 2. restart with new data: exactly-once, no dup/lost ids ----------
    emit(src, [env("d", {"id": 2, "amount": 20.0, "region": "us"}, None, 4000)], 3)
    q = pipe.start(file_stream_source(spark, src), ckpt, available_now=True)
    q.awaitTermination(120)
    print("after restart+delete:", sorted((r.id, r.amount) for r in t.read(spark).collect()))
    print("snapshot offsets:", t.current_snapshot()["summary"]["kafka.connect.offsets"])

    # --- 3. SQL over the landed warehouse ---------------------------------
    catalog.register_views(spark)
    spark.sql(
        "SELECT region, count(*) AS n, sum(amount) AS total "
        "FROM default_orders GROUP BY region ORDER BY region"
    ).show()

    # --- 4. training-data operators on the documents corpus ---------------
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pairs = dedup.minhash_lsh_pairs(docs, n=3, threshold=0.5)
    print("near-duplicate pairs found:", pairs.count())
    profile = text.profile(docs)
    profile.select("doc_id", "lang_pred", "quality").show(5)

    # --- 5. table management: tags, sorted rewrite, pruned + incremental --
    snap_before = t.current_snapshot()["snapshot_id"]
    t.create_tag("after-cdc")
    t.merge(
        spark,
        spark.createDataFrame(
            [(2, 99.0, "us")], "id long, amount double, region string"
        ),
        on=["id"],
        when_matched=None,  # WHEN NOT MATCHED THEN INSERT only
    )
    print("tag view:", sorted(r.id for r in t.read(spark, tag="after-cdc").collect()))
    print("head view:", sorted(r.id for r in t.read(spark).collect()))
    print(
        "incremental (since tag):",
        sorted(r.id for r in t.appends_between(spark, snap_before).collect()),
    )
    t.compact(spark, sort_by=["id"])
    kept, total = t.scan_files("id >= 2")
    print(f"pruned scan opens {len(kept)}/{total} files")

    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
