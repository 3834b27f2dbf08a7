"""Iceberg v3 variant type + shredding semantics.

v3 spec 'Schemas and Data Types' adds ``variant``; the Parquet Variant
Shredding spec defines typed_value extraction. These tests pin: the
lakehouse round-trip, v3 export/import of the type (v2 refuses), and
the shredded scan's plan shape (typed pushdown, variant pruned)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from iceberg_kafka_connect_spark.operators.variant_shred import (
    shred_variant,
    shredded_filter_plan,
    unshred_variant,
)
from iceberg_kafka_connect_spark.sinks.iceberg_export import (
    IcebergExportUnsupported,
    export_iceberg_metadata,
)
from iceberg_kafka_connect_spark.sinks.iceberg_import import (
    import_iceberg_table,
)
from iceberg_kafka_connect_spark.sinks.table import LakehouseTable


def _vdf(spark, n=50):
    return spark.range(n).select(
        "id",
        F.parse_json(
            F.format_string(
                '{"kind": "k%d", "score": %d, "geo": {"lat": %d.5}}',
                F.col("id") % 3,
                "id",
                "id",
            )
        ).alias("payload"),
    )


def test_lakehouse_variant_append_read_delete(spark, tmp_path):
    df = _vdf(spark)
    t = LakehouseTable.create(str(tmp_path / "t"), df.schema)
    t.append(df)
    got = t.read(spark).select(
        "id", F.variant_get("payload", "$.kind", "string").alias("k")
    )
    assert got.where(F.col("k") == "k1").count() == 17  # ids 1,4,...,49
    t.delete_where(spark, "id < 10", key_cols=["id"])
    assert t.read(spark).count() == 40


def test_v3_export_variant_and_import_roundtrip(spark, tmp_path):
    df = _vdf(spark, 30)
    t = LakehouseTable.create(
        str(tmp_path / "t"), df.schema, properties={"format-version": "3"}
    )
    t.append(df)
    out = export_iceberg_metadata(t)
    md = json.load(open(out))
    assert md["format-version"] == 3
    [schema] = [s for s in md["schemas"] if s["schema-id"] == md["current-schema-id"]]
    ptype = {f["name"]: f["type"] for f in schema["fields"]}["payload"]
    assert ptype == "variant"
    # spec validator accepts the tree
    from iceberg_kafka_connect_spark.sinks.spec_validator import (
        validate_exported_tree,
    )
    assert validate_exported_tree(out) == []
    # import back: VariantType column, values intact
    imp = import_iceberg_table(out, str(tmp_path / "imp"))
    back = imp.read(spark)
    assert isinstance(
        dict(zip(back.schema.names, back.schema.fields))["payload"].dataType,
        T.VariantType,
    )
    s = back.select(
        F.sum(F.variant_get("payload", "$.score", "long")).alias("s")
    ).collect()[0].s
    assert s == sum(range(30))


def test_v2_export_with_variant_refuses(spark, tmp_path):
    df = _vdf(spark, 5)
    t = LakehouseTable.create(str(tmp_path / "t"), df.schema)  # v2 default
    t.append(df)
    with pytest.raises(IcebergExportUnsupported, match="format-version 3"):
        export_iceberg_metadata(t)


def test_shred_extract_and_type_mismatch_goes_null(spark):
    df = spark.createDataFrame(
        [(1, '{"a": 5, "b": "x"}'), (2, '{"a": "not-an-int", "b": "y"}')],
        "id long, j string",
    ).select("id", F.parse_json("j").alias("v"))
    shredded = shred_variant(
        df,
        "v",
        T.StructType([
            T.StructField("a", T.LongType()),
            T.StructField("b", T.StringType()),
        ]),
    )
    rows = {r.id: r.v_typed for r in shredded.collect()}
    assert rows[1].a == 5 and rows[1].b == "x"
    # spec: type-mismatched value stays residual-only -> typed null
    assert rows[2].a is None and rows[2].b == "y"


def test_shredded_scan_pushdown_and_variant_pruned(spark, tmp_path):
    df = _vdf(spark, 200)
    shredded = shred_variant(
        df,
        "payload",
        T.StructType([
            T.StructField("kind", T.StringType()),
            T.StructField("score", T.LongType()),
        ]),
    )
    p = str(tmp_path / "shredded")
    shredded.write.parquet(p)
    back = spark.read.parquet(p)
    q = back.where(F.col("payload_typed.kind") == "k1").select(
        F.sum("payload_typed.score").alias("s")
    )
    plan = shredded_filter_plan(q)
    # typed filter reaches the scan; the variant binary is NOT read
    assert "PushedFilters: [" in plan and "kind" in plan
    assert "payload#" not in plan.split("ReadSchema")[1][:300]
    assert q.collect()[0].s == sum(i for i in range(200) if i % 3 == 1)


def test_unshred_prefers_residual_and_rebuilds_when_fully_shredded(spark):
    df = spark.createDataFrame(
        [(1, '{"a": 5, "extra": true}')], "id long, j string"
    ).select("id", F.parse_json("j").alias("v"))
    sh = shred_variant(df, "v", T.StructType([T.StructField("a", T.LongType())]))
    # residual present: full document survives (extra field intact)
    re1 = unshred_variant(sh, "v")
    assert json.loads(re1.select(F.to_json("v").alias("j")).collect()[0].j) == {
        "a": 5, "extra": True,
    }
    # fully shredded: rebuilt from typed struct
    sh2 = shred_variant(
        df, "v", T.StructType([T.StructField("a", T.LongType())]),
        keep_value=False,
    )
    re2 = unshred_variant(sh2, "v")
    assert json.loads(re2.select(F.to_json("v").alias("j")).collect()[0].j) == {
        "a": 5,
    }


def test_footer_num_rows_matches_pyarrow_and_reads_variant(spark, tmp_path):
    """The stdlib compact-thrift footer walk agrees with pyarrow on
    ordinary files and still works where pyarrow's logical-type
    whitelist gives up (VARIANT)."""
    import pyarrow.parquet as pq

    from iceberg_kafka_connect_spark.sinks.parquet_footer import (
        footer_num_rows,
    )

    plain = str(tmp_path / "plain")
    spark.range(123).withColumn("s", F.format_string("x%d", "id")) \
        .coalesce(1).write.parquet(plain)
    import glob as g
    [pf] = g.glob(plain + "/*.parquet")
    assert footer_num_rows(pf) == pq.ParquetFile(pf).metadata.num_rows == 123

    vdir = str(tmp_path / "var")
    _vdf(spark, 77).coalesce(1).write.parquet(vdir)
    [vf] = g.glob(vdir + "/*.parquet")
    with pytest.raises(Exception):
        pq.ParquetFile(vf)  # pyarrow wheel predates VARIANT
    assert footer_num_rows(vf) == 77


def test_footer_column_stats_agrees_with_pyarrow_fold(spark, tmp_path):
    """The protocol-level stats fold must produce EXACTLY what the
    pyarrow fold produces on an ordinary file (same tags, same values,
    same sit-outs), and still extract typed-column bounds from a
    variant-bearing footer pyarrow rejects."""
    from datetime import date as d_, datetime
    from decimal import Decimal

    from iceberg_kafka_connect_spark.sinks.parquet_footer import (
        footer_column_stats,
    )
    from iceberg_kafka_connect_spark.sinks.stats import (
        collect_parquet_stats,
    )

    df = spark.createDataFrame(
        [
            (1, 2.5, "alpha", datetime(2024, 1, 1, 6), d_(2024, 1, 1),
             Decimal("10.25"), True),
            (9, -1.5, "zeta", datetime(2024, 6, 1, 18), d_(2024, 6, 1),
             Decimal("99.99"), False),
        ],
        "i long, f double, s string, ts timestamp, d date, "
        "amt decimal(10,2), b boolean",
    )
    p = str(tmp_path / "plain")
    df.coalesce(1).write.parquet(p)
    import glob as g
    [pf] = g.glob(p + "/*.parquet")
    via_pyarrow = collect_parquet_stats(pf)
    via_footer = footer_column_stats(pf)
    # the footer fold must agree with pyarrow wherever pyarrow reads a
    # bound, and is a strict SUPERSET: pyarrow's wheel raises
    # ArrowNotImplementedError casting decimal statistics (they land in
    # the except->dead lane), while the protocol walk decodes them
    assert via_footer["rows"] == via_pyarrow["rows"]
    for col, st in via_pyarrow["cols"].items():
        assert via_footer["cols"][col] == st, col
    assert "amt" in via_footer["cols"]
    assert via_footer["cols"]["i"] == {"t": "i", "min": 1, "max": 9}
    assert via_footer["cols"]["s"] == {"t": "s", "min": "alpha",
                                       "max": "zeta"}
    assert via_footer["cols"]["ts"]["t"] == "ts"
    assert via_footer["cols"]["d"] == {"t": "d", "min": "2024-01-01",
                                       "max": "2024-06-01"}
    assert via_footer["cols"]["amt"] == {"t": "f", "min": 10.25,
                                         "max": 99.99}  # pyarrow can't
    # variant-bearing file: typed columns STILL get bounds
    vdir = str(tmp_path / "var")
    _vdf(spark, 40).coalesce(1).write.parquet(vdir)
    [vf] = g.glob(vdir + "/*.parquet")
    vst = footer_column_stats(vf)
    assert vst["rows"] == 40
    assert vst["cols"]["id"] == {"t": "i", "min": 0, "max": 39}
    assert "payload" not in vst["cols"]
    # and the commit-path fallback now returns bounds too
    assert collect_parquet_stats(vf) == vst


def test_variant_table_typed_columns_prune(spark, tmp_path):
    """Shredded typed columns written NEXT TO a variant column keep
    their manifest bounds (via the footer fallback), so file pruning
    still works on a variant-bearing lakehouse table."""
    from iceberg_kafka_connect_spark.operators.variant_shred import (
        shred_variant,
    )

    df = shred_variant(
        _vdf(spark, 90),
        "payload",
        T.StructType([T.StructField("score", T.LongType())]),
    )
    t = LakehouseTable.create(str(tmp_path / "t"), df.schema)
    # three appends -> three files with disjoint id/typed ranges
    for lo, hi in ((0, 30), (30, 60), (60, 90)):
        t.append(df.where((F.col("id") >= lo) & (F.col("id") < hi))
                 .coalesce(1))
    data_files, _ = t.live_files()
    with_bounds = [
        f for f in data_files
        if ((f.get("stats") or {}).get("cols") or {}).get("id")
    ]
    assert len(with_bounds) == 3
    # typed struct members are nested (dotted) — top-level id prunes
    pruned = t.read(spark).where(F.col("id") >= 60)
    assert pruned.count() == 30
