"""Lakehouse table lifecycle: DML, DDL, WAP publish, and CDC consumption.

Walks the table-management surfaces added on top of the ingestion engine —
the operations a warehouse operator runs day-to-day — against a local temp
warehouse:

  1. create + append (bloom-filter property, metadata-only COUNT)
  2. row-level UPDATE WHERE / DELETE WHERE (merge-on-read, pruned scans)
  3. column rename/drop (metadata-only; old files resolve via name mapping)
  4. partition spec evolution (new layout for future writes only)
  5. write-audit-publish: stage on a branch, validate, fast-forward main
  6. changelog consumption: poll changes_between and mirror into a replica

Usage: python examples/lakehouse_lifecycle.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import types as T

from iceberg_kafka_connect_spark.session import get_spark
from iceberg_kafka_connect_spark.sinks.table import LakehouseTable

SCHEMA = T.StructType(
    [
        T.StructField("order_id", T.LongType()),
        T.StructField("status", T.StringType()),
        T.StructField("amount", T.LongType()),
    ]
)


def main() -> None:
    spark = get_spark(app_name="lakehouse-lifecycle")
    spark.sparkContext.setLogLevel("ERROR")
    wh = tempfile.mkdtemp(prefix="lifecycle-wh-")
    try:
        # 1. create + append
        t = LakehouseTable.create(
            os.path.join(wh, "orders"),
            SCHEMA,
            properties={
                "write.parquet.bloom-filter-enabled.column.order_id": "true"
            },
        )
        t.append(
            spark.createDataFrame(
                [(i, "NEW", i * 10) for i in range(1, 1001)], SCHEMA
            )
        )
        print("rows (metadata-only count):", t.count_rows())

        # 2. row-level DML
        t.update_where(
            spark, "order_id <= 100", {"status": "'SHIPPED'"},
            key_cols=["order_id"],
        )
        t.delete_where(spark, "order_id > 900", key_cols=["order_id"])
        print(
            "after DML:",
            t.read(spark).groupBy("status").count().orderBy("status").collect(),
        )

        # 3. column DDL — files written above keep the old physical name
        t.rename_column("amount", "total_cents")
        print("renamed read:", t.read(spark).select("total_cents").first())

        # 4. spec evolution — only future writes get the new layout
        t.update_partition_spec("bucket(8, order_id)")
        t.append(
            spark.createDataFrame([(2000, "NEW", 5)], "order_id long, "
                                  "status string, total_cents long")
        )

        # 5. write-audit-publish
        t.create_branch("audit")
        t.append(
            spark.createDataFrame([(3000, "NEW", 7)], "order_id long, "
                                  "status string, total_cents long"),
            branch="audit",
        )
        staged = t.read(spark, branch="audit").count()
        live = t.read(spark).count()
        assert staged == live + 1, "staged rows invisible on main until publish"
        t.fast_forward("main", "audit")
        print("published; main rows:", t.read(spark).count())

        # 6. CDC mirror via the changelog
        replica: dict[int, tuple] = {}
        for r in sorted(
            t.changes_between(spark, None).collect(),
            key=lambda r: (r._change_ordinal, r._change_type != "delete"),
        ):
            if r._change_type == "delete":
                replica.pop(r.order_id, None)
            else:
                replica[r.order_id] = (r.status, r.total_cents)
        live_rows = {
            r.order_id: (r.status, r.total_cents)
            for r in t.read(spark).collect()
        }
        assert replica == live_rows, "changelog replay reconstructs the table"
        print("changelog mirror matches live table:", len(replica), "rows")

        # 7. round-7 maintenance surface: squash the metadata walk without
        # touching data, refresh column stats, stand up a zero-copy twin
        snap = t.rewrite_manifests()
        print("manifests squashed:", snap["summary"]["manifests-squashed"])
        t.analyze(spark, mode="exact")
        stats = t.column_stats()
        print("order_id ndv:", stats["columns"]["order_id"]["ndv"])
        twin = t.clone_to(wh + "/orders_staging")
        assert twin.read(spark).count() == t.read(spark).count()
        twin.append(
            spark.createDataFrame([(9000, "TEST", 1)], "order_id long, "
                                  "status string, total_cents long")
        )
        assert twin.read(spark).count() == t.read(spark).count() + 1
        print("zero-copy staging twin diverged safely")
    finally:
        shutil.rmtree(wh, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
