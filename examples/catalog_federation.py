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


def _external_commit_demo(rest, spark) -> None:
    """Act as an independent Iceberg writer: write a parquet data file,
    an Avro manifest, and a manifest list (carrying the parent snapshot's
    manifests — a snapshot's list is the COMPLETE live set) under the
    served table location, then commit through the REST protocol."""
    import time
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_kafka_connect_spark.sinks.iceberg_export import (
        _manifest_entry_schema,
        _manifest_list_schema,
        _read_ocf,
        _write_ocf,
    )

    from iceberg_kafka_connect_spark.functions.murmur3 import (
        iceberg_bucket_value,
    )

    _, meta = rest.load_table_metadata("sales.orders")
    root = meta["location"].removeprefix("file://")
    head = meta["current-snapshot-id"]
    seq = meta["last-sequence-number"] + 1
    sid = 7_700_000_001
    # the table is bucket[4]-partitioned on id: a conformant writer hashes
    # each row into its bucket and lays the file out under that partition
    # dir (here both rows share a bucket so one file suffices)
    ids = [1000, 1000 + next(
        d for d in range(1, 64)
        if iceberg_bucket_value(1000 + d, 4) == iceberg_bucket_value(1000, 4)
    )]
    bucket = iceberg_bucket_value(ids[0], 4)
    ddir = os.path.join(root, "data", f"id_iceberg_bucket4={bucket}")
    os.makedirs(ddir, exist_ok=True)
    dpath = os.path.join(ddir, f"ext-{uuid.uuid4().hex}.parquet")
    pq.write_table(
        pa.table(
            {
                "id": pa.array(ids, pa.int64()),
                "region": ["apac", "apac"],
                "amount": [1.5, 2.5],
            }
        ),
        dpath,
    )
    mpath = os.path.join(root, "metadata", f"ext-{uuid.uuid4().hex}.avro")
    _write_ocf(
        mpath,
        _manifest_entry_schema(),
        [
            {
                "status": 1,
                "snapshot_id": sid,
                "sequence_number": seq,
                "file_sequence_number": seq,
                "data_file": {
                    "content": 0,
                    "file_path": "file://" + dpath,
                    "file_format": "PARQUET",
                    "partition": {},
                    "record_count": 2,
                    "file_size_in_bytes": os.path.getsize(dpath),
                    "equality_ids": None,
                    "value_counts": None,
                    "lower_bounds": None,
                    "upper_bounds": None,
                    "sort_order_id": None,
                },
            }
        ],
        {},
    )
    parent = next(s for s in meta["snapshots"] if s["snapshot-id"] == head)
    _, _, carried = _read_ocf(
        parent["manifest-list"].removeprefix("file://")
    )
    mlpath = os.path.join(
        root, "metadata", f"snap-{sid}-1-{uuid.uuid4().hex}.avro"
    )
    _write_ocf(
        mlpath,
        _manifest_list_schema(),
        carried
        + [
            {
                "manifest_path": "file://" + mpath,
                "manifest_length": os.path.getsize(mpath),
                "partition_spec_id": 0,
                "content": 0,
                "sequence_number": seq,
                "min_sequence_number": seq,
                "added_snapshot_id": sid,
                "added_files_count": 1,
                "existing_files_count": 0,
                "deleted_files_count": 0,
                "added_rows_count": 2,
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
            }
        ],
        {},
    )
    rest._commit(
        "sales.orders",
        updates=[
            {
                "action": "add-snapshot",
                "snapshot": {
                    "snapshot-id": sid,
                    "parent-snapshot-id": head,
                    "sequence-number": seq,
                    "timestamp-ms": int(time.time() * 1000),
                    "manifest-list": "file://" + mlpath,
                    "summary": {"operation": "append"},
                    "schema-id": 0,
                },
            },
            {
                "action": "set-snapshot-ref",
                "ref-name": "main",
                "type": "branch",
                "snapshot-id": sid,
            },
        ],
        requirements=[
            {
                "type": "assert-ref-snapshot-id",
                "ref": "main",
                "snapshot-id": head,
            }
        ],
        retries=1,
    )
    t = rest.load_table("sales.orders")
    _, meta2 = rest.load_table_metadata("sales.orders")
    print(
        "[rest] external writer committed snapshot",
        meta2["current-snapshot-id"],
        "| rows now:",
        t.read(spark).count(),
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

            # 5. the protocol's WRITE side: an external spec-conformant
            # writer commits data THROUGH the catalog — parquet + Avro
            # manifest + manifest list written against the served
            # metadata, then add-snapshot + set-snapshot-ref in one
            # atomic commit (stale CAS → 409)
            _external_commit_demo(rest, spark)

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
