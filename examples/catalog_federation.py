"""Catalog walkthrough: one warehouse, three catalog protocols.

The reference builds whatever catalog ``iceberg.catalog.*`` names
(data/Utilities.java:68-121) and the sink runs unchanged on top. Same
here — this example drives the SAME connector-style config surface
through all three executable backends, against local temp dirs:

  1. directory (hadoop-style) catalog — the plain warehouse
  2. REST catalog — in-process server (public Iceberg REST API),
     client resolved from ``iceberg.catalog.type=rest``; commits
     (properties, tags) route through the protocol's CAS endpoint
  3. JDBC catalog — the public two-table pointer schema on sqlite3;
     a raw SQL query shows the pointer row an external engine follows
  4. registerTable federation: export a table from the directory
     catalog and ADOPT it into the REST catalog, zero data copy

Usage: python examples/catalog_federation.py
"""

from __future__ import annotations

import json
import os
import shutil
import sqlite3
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import types as T

from iceberg_kafka_connect_spark.session import get_spark
from iceberg_kafka_connect_spark.sinks.catalog import (
    Catalog,
    catalog_from_properties,
)
from iceberg_kafka_connect_spark.sinks.iceberg_export import (
    _snapshot_id_int,
    export_iceberg_metadata,
)
from iceberg_kafka_connect_spark.sinks.rest_server import IcebergRestServer

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("region", T.StringType(), True),
        T.StructField("amount", T.DoubleType(), True),
    ]
)


def main() -> None:
    spark = get_spark(app_name="catalog-federation", cpus=4)
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="catalog_demo_")
    rows = [(i, "emea" if i % 2 else "amer", float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, SCHEMA)

    try:
        # 1. directory catalog ------------------------------------------------
        dir_cat = Catalog(os.path.join(base, "wh_dir"))
        t = dir_cat.create_table("sales.orders", SCHEMA)
        t.append(df)
        print("[dir]  rows:", t.read(spark).count())

        # 2. REST catalog -----------------------------------------------------
        with IcebergRestServer(os.path.join(base, "wh_rest")) as srv:
            rest = catalog_from_properties(
                {
                    "iceberg.catalog.type": "rest",
                    "iceberg.catalog.uri": srv.uri,
                }
            )
            rt = rest.create_table(
                "sales.orders", SCHEMA, partition_by=["iceberg_bucket(4, id)"]
            )
            rt.append(df)
            # catalog-side commits: CAS'd property + tag
            rest.set_properties("sales.orders", {"owner": "demo"})
            head = rt.current_snapshot()["snapshot_id"]
            rest.set_ref(
                "sales.orders", "v1", _snapshot_id_int(head), ref_type="tag"
            )
            loc, meta = rest.load_table_metadata("sales.orders")
            print(
                "[rest] rows:",
                rest.load_table("sales.orders").read(spark).count(),
                "| refs:",
                sorted(meta["refs"]),
                "| served:",
                os.path.basename(loc),
            )

            # 4. federation: adopt the DIRECTORY catalog's table over REST
            exported = export_iceberg_metadata(dir_cat.load_table("sales.orders"))
            adopted = rest.register_table("sales.adopted", exported)
            print("[rest] adopted rows (zero copy):", adopted.read(spark).count())

        # 3. JDBC catalog -----------------------------------------------------
        jdbc = catalog_from_properties(
            {
                "iceberg.catalog.type": "jdbc",
                "iceberg.catalog.uri": f"jdbc:sqlite:{base}/catalog.sqlite",
                "iceberg.catalog.warehouse": os.path.join(base, "wh_jdbc"),
            }
        )
        jt = jdbc.create_table("sales.orders", SCHEMA)
        jt.append(df)
        jt.delete_where(spark, "id >= 90", ["id"])
        print("[jdbc] rows:", jdbc.load_table("sales.orders").read(spark).count())
        con = sqlite3.connect(f"{base}/catalog.sqlite")
        ns, name, ptr = con.execute(
            "SELECT table_namespace, table_name, metadata_location "
            "FROM iceberg_tables"
        ).fetchone()
        con.close()
        print(
            "[jdbc] pointer row:",
            json.dumps(
                {"ns": ns, "table": name, "metadata": os.path.basename(ptr)}
            ),
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
