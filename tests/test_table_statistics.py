"""Iceberg "Table statistics" parity: KMV NDV sketches, Puffin statistics
files keyed by snapshot, export/import of the `statistics` metadata list,
and planner consumption of imported NDVs."""

from __future__ import annotations

import json

from pyspark.sql import functions as F  # noqa: F401

from iceberg_kafka_connect_spark.operators.sketch import (
    kmv_deserialize,
    kmv_estimate,
    kmv_ndv,
    kmv_serialize,
    kmv_sketch,
)
from iceberg_kafka_connect_spark.sinks.iceberg_export import (
    export_iceberg_metadata,
)
from iceberg_kafka_connect_spark.sinks.iceberg_import import (
    import_iceberg_table,
)
from iceberg_kafka_connect_spark.sinks.table import LakehouseTable


def _mk(spark, root, n=3000):
    t = LakehouseTable.create(
        root,
        spark.range(0, 1)
        .selectExpr("id", "cast(id as string) grp", "id % 7 v")
        .schema,
    )
    t.append(
        spark.range(0, n).selectExpr(
            "id", "cast(id % 13 as string) grp", "id % 7 v"
        )
    )
    return t


def test_kmv_exact_below_k(spark):
    df = spark.range(0, 500).selectExpr("id", "id % 13 v")
    assert kmv_ndv(df, ["id", "v"], k=1024) == {"id": 500, "v": 13}


def test_kmv_estimate_above_k(spark):
    df = spark.range(0, 10_000).selectExpr("id")
    est = kmv_ndv(df, ["id"], k=256)["id"]
    # KMV relative error ~ 1/sqrt(k) ≈ 6%; allow 4 sigma
    assert abs(est - 10_000) < 10_000 * 0.25
    # deterministic: same input, same estimate
    assert kmv_ndv(df, ["id"], k=256)["id"] == est


def test_kmv_nulls_do_not_count(spark):
    df = spark.range(0, 100).selectExpr(
        "CASE WHEN id % 2 = 0 THEN id END AS id"
    )
    assert kmv_ndv(df, ["id"], k=1024) == {"id": 50}


def test_kmv_serialization_and_merge(spark):
    a = spark.range(0, 800).selectExpr("id")
    b = spark.range(400, 1200).selectExpr("id")
    k = 128
    sa, sb = kmv_sketch(a, "id", k), kmv_sketch(b, "id", k)
    vals, k2 = kmv_deserialize(kmv_serialize(sa, k))
    assert (vals, k2) == (sa, k)
    merged = sorted(set(sa) | set(sb))[:k]
    full = kmv_sketch(a.unionByName(b), "id", k)
    assert merged == full  # mergeability: union-and-truncate == rescan
    assert abs(kmv_estimate(merged, k) - 1200) < 1200 * 0.4


def test_compute_statistics_and_accessors(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    ndv = t.compute_statistics(spark, k=256)
    assert ndv["grp"] == 13 and ndv["v"] == 7
    assert abs(ndv["id"] - 3000) < 3000 * 0.25
    assert t.statistics() == ndv
    doc = t.column_stats()
    assert doc["mode"] == "puffin"
    assert {c: s["ndv"] for c, s in doc["columns"].items()} == ndv
    # stale stats not served by statistics() after a new commit…
    t.append(spark.range(5000, 5100).selectExpr("id", "'x' grp", "0 v"))
    assert t.statistics() is None
    # …but column_stats ages gracefully to the nearest analyzed ancestor
    assert t.column_stats() is not None


def test_statistics_survive_export_import(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "src"))
    ndv = t.compute_statistics(spark, k=256)
    out = export_iceberg_metadata(t)
    md = json.load(open(out))
    [entry] = md["statistics"]
    assert entry["statistics-path"].endswith(".puffin")
    got = {
        b["properties"]["column"]: int(b["properties"]["ndv"])
        for b in entry["blob-metadata"]
    }
    assert got == ndv
    assert all(b["fields"] for b in entry["blob-metadata"])
    imp = import_iceberg_table(out, str(tmp_path / "dst"))
    assert imp.statistics() == ndv
    # the planner consumes the imported NDVs
    doc = imp.column_stats()
    assert doc["columns"]["grp"]["ndv"] == 13


def test_analyze_docs_export_as_puffin_stats(spark, tmp_path):
    """analyze() JSON docs materialize as spec statistics files on
    export: real DataSketches HLL payloads (approx mode) with the ndv
    property on every blob."""
    from iceberg_kafka_connect_spark.sinks.puffin import (
        read_blob,
        read_puffin_footer,
    )

    t = _mk(spark, str(tmp_path / "srca"), n=500)
    t.analyze(spark, mode="approx")
    out = export_iceberg_metadata(t)
    md = json.load(open(out))
    [entry] = md["statistics"]
    p = entry["statistics-path"].removeprefix("file://")
    footer = read_puffin_footer(p)
    by_col = {
        b["properties"]["column"]: b for b in footer["blobs"]
    }
    assert by_col["grp"]["type"] == "apache-datasketches-hll-v1"
    assert int(by_col["grp"]["properties"]["ndv"]) == 13
    blob = read_blob(p, by_col["grp"]["offset"], by_col["grp"]["length"])
    assert len(blob) > 0  # the real HLL binary rides the blob
    imp = import_iceberg_table(out, str(tmp_path / "dsta"))
    assert imp.statistics()["grp"] == 13


def test_planner_uses_imported_ndv(spark, tmp_path):
    """plan_join's skew surfacing reads NDV through column_stats —
    including the puffin-format entries an import writes."""
    from iceberg_kafka_connect_spark.operators.joinplan import plan_join

    t = _mk(spark, str(tmp_path / "p1"))
    t.compute_statistics(spark, k=256)
    out = export_iceberg_metadata(t)
    imp = import_iceberg_table(out, str(tmp_path / "p2"))
    big = _mk(spark, str(tmp_path / "p3"))
    decision = plan_join(
        imp,
        big,
        key="grp",
        broadcast_threshold_bytes=1,  # force the shuffle path
        shuffle_partitions=200,
        skew_ndv_per_partition=4,
    )
    assert decision["strategy"] == "shuffle"
    assert decision["skew_risk"] is True  # ndv 13 << 4 * 200


def test_incremental_statistics_refresh(spark, tmp_path):
    """mode='incremental' scans only the appended rows and unions the
    stored sketches — the result equals a full rebuild exactly."""
    t = _mk(spark, str(tmp_path / "inc"), n=2000)
    t.compute_statistics(spark, k=256)
    t.append(
        spark.range(2000, 3500).selectExpr(
            "id", "cast(id % 29 as string) grp", "id % 7 v"
        )
    )
    inc = t.compute_statistics(spark, k=256, mode="incremental")
    # incremental == full rebuild, bit for bit (KMV mergeability)
    t2 = _mk(spark, str(tmp_path / "full"), n=2000)
    t2.append(
        spark.range(2000, 3500).selectExpr(
            "id", "cast(id % 29 as string) grp", "id % 7 v"
        )
    )
    assert inc == t2.compute_statistics(spark, k=256)
    assert inc["grp"] == 29
    # head already covered (same k) → served from the entry, no rescan
    assert t.compute_statistics(spark, k=256, mode="incremental") == inc


def test_incremental_falls_back_across_rewrites(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "rw"), n=1000)
    t.compute_statistics(spark, k=256)
    t.delete_where_positions(spark, "v = 3")
    t.compact(spark)
    # the range contains a replace — incremental silently rebuilds full
    ndv = t.compute_statistics(spark, k=256, mode="incremental")
    assert ndv["v"] == 6  # v=3 rows deleted


def test_incremental_with_different_params_rebuilds_full(spark, tmp_path):
    """Asking for different columns or a different k than the stored
    sketches rebuilds full for exactly what was asked — never silently
    serves the old column set."""
    t = _mk(spark, str(tmp_path / "params"), n=1000)
    t.compute_statistics(spark, columns=["grp"], k=256)
    t.append(
        spark.range(1000, 1200).selectExpr(
            "id", "cast(id % 13 as string) grp", "id % 7 v"
        )
    )
    out = t.compute_statistics(
        spark, columns=["grp", "v"], k=256, mode="incremental"
    )
    assert set(out) == {"grp", "v"} and out["v"] == 7
    # different k: also a full rebuild (exact at k=2048)
    t.append(
        spark.range(2000, 2100).selectExpr(
            "id", "cast(id % 13 as string) grp", "id % 7 v"
        )
    )
    out2 = t.compute_statistics(
        spark, columns=["id"], k=2048, mode="incremental"
    )
    assert out2 == {"id": 1300}


def test_incremental_default_columns_rebuilds_on_narrower_base(
    spark, tmp_path
):
    """columns=None means ALL schema columns — if the ancestor sketch
    covers a narrower set, incremental must rebuild full instead of
    silently serving only the ancestor's columns."""
    t = _mk(spark, str(tmp_path / "defcols"), n=1000)
    t.compute_statistics(spark, columns=["grp"], k=256)
    t.append(
        spark.range(1000, 1200).selectExpr(
            "id", "cast(id % 13 as string) grp", "id % 7 v"
        )
    )
    out = t.compute_statistics(spark, k=256, mode="incremental")
    assert set(out) == {"id", "grp", "v"}
    # id has 1200 distinct values > k=256 → KMV estimate, not exact
    assert out["v"] == 7 and abs(out["id"] - 1200) / 1200 < 0.15
