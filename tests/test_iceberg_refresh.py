"""refresh_from_iceberg: incremental sync of new external main-branch
snapshots into an imported table — the continuous READ direction of the
Iceberg mirror (the reference keeps reading live tables through its
catalog, data/Utilities.java:68-121)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import types as T

from iceberg_kafka_connect_spark.sinks.iceberg_export import (
    export_iceberg_metadata,
)
from iceberg_kafka_connect_spark.sinks.iceberg_import import (
    IcebergImportUnsupported,
    import_iceberg_table,
    refresh_from_iceberg,
)
from iceberg_kafka_connect_spark.sinks.table import LakehouseTable

SCHEMA = T.StructType(
    [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
)


def _df(spark, a, b):
    return spark.createDataFrame([(i, f"v{i}") for i in range(a, b)], SCHEMA)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_refresh_appends(spark, tmp_path):
    src = LakehouseTable.create(str(tmp_path / "src"), SCHEMA)
    src.append(_df(spark, 0, 10))
    imp = import_iceberg_table(
        export_iceberg_metadata(src), str(tmp_path / "dst")
    )
    # external writer commits twice more
    src.append(_df(spark, 10, 20))
    src.append(_df(spark, 20, 30))
    export_iceberg_metadata(src)
    res = refresh_from_iceberg(imp)
    assert res["synced"] == 2
    assert _rows(imp.read(spark)) == _rows(src.read(spark))
    # new external snapshots commit as appends, not replaces
    ops = [
        s["summary"].get("operation")
        for s in imp.metadata()["snapshots"]
    ]
    assert ops.count("import-refresh") == 2
    # idempotent: nothing new → no-op
    res2 = refresh_from_iceberg(imp)
    assert res2["synced"] == 0
    assert res2["from"] == res2["to"]


def test_refresh_with_deletes(spark, tmp_path):
    src = LakehouseTable.create(str(tmp_path / "src"), SCHEMA)
    src.append(_df(spark, 0, 20))
    imp = import_iceberg_table(
        export_iceberg_metadata(src), str(tmp_path / "dst")
    )
    src.delete_where(spark, "k % 4 = 0", key_cols=["k"])
    src.delete_where_positions(spark, "k = 7")
    export_iceberg_metadata(src)
    res = refresh_from_iceberg(imp)
    assert res["synced"] == 2
    assert _rows(imp.read(spark)) == _rows(src.read(spark))
    assert imp.read(spark).count() == 14


def test_refresh_after_external_rewrite(spark, tmp_path):
    """An external snapshot that REMOVED files (compaction) mirrors as a
    replace of its full live set."""
    src = LakehouseTable.create(str(tmp_path / "src"), SCHEMA)
    src.append(_df(spark, 0, 10))
    src.append(_df(spark, 10, 20))
    imp = import_iceberg_table(
        export_iceberg_metadata(src), str(tmp_path / "dst")
    )
    src.compact(spark)
    src.append(_df(spark, 20, 25))
    export_iceberg_metadata(src)
    res = refresh_from_iceberg(imp)
    assert res["synced"] >= 1
    assert _rows(imp.read(spark)) == _rows(src.read(spark))


def test_refresh_schema_evolution(spark, tmp_path):
    """External column additions evolve the imported table first."""
    src = LakehouseTable.create(str(tmp_path / "src"), SCHEMA)
    src.append(_df(spark, 0, 5))
    imp = import_iceberg_table(
        export_iceberg_metadata(src), str(tmp_path / "dst")
    )
    wide = T.StructType(
        SCHEMA.fields + [T.StructField("extra", T.LongType())]
    )
    src.evolve_schema(wide)
    src.append(
        spark.createDataFrame([(100, "w", 42)], wide)
    )
    export_iceberg_metadata(src)
    refresh_from_iceberg(imp)
    got = {r.k: r.extra for r in imp.read(spark).collect()}
    assert got[100] == 42
    assert got[0] is None


def test_refresh_refuses_foreign_table(spark, tmp_path):
    src = LakehouseTable.create(str(tmp_path / "src"), SCHEMA)
    src.append(_df(spark, 0, 5))
    imp = import_iceberg_table(
        export_iceberg_metadata(src), str(tmp_path / "dst")
    )
    other = LakehouseTable.create(str(tmp_path / "other"), SCHEMA)
    other.append(_df(spark, 0, 5))
    out2 = export_iceberg_metadata(other)
    with pytest.raises(IcebergImportUnsupported, match="table-uuid"):
        refresh_from_iceberg(imp, source=out2)


def test_refresh_requires_imported_table(spark, tmp_path):
    t = LakehouseTable.create(str(tmp_path / "t"), SCHEMA)
    t.append(_df(spark, 0, 5))
    with pytest.raises(IcebergImportUnsupported, match="import"):
        refresh_from_iceberg(t)


def test_sync_loop_catches_up_and_stops(spark, tmp_path):
    from iceberg_kafka_connect_spark.streaming.iceberg_sync import (
        iceberg_sync_loop,
    )

    src = LakehouseTable.create(str(tmp_path / "src"), SCHEMA)
    src.append(_df(spark, 0, 5))
    imp = import_iceberg_table(
        export_iceberg_metadata(src), str(tmp_path / "dst")
    )
    src.append(_df(spark, 5, 10))
    export_iceberg_metadata(src)
    src.append(_df(spark, 10, 15))
    export_iceberg_metadata(src)
    seen = []
    res = iceberg_sync_loop(
        imp,
        poll_interval_s=0.01,
        max_polls=10,
        on_refresh=seen.append,
        stop_when_current=True,
    )
    assert res["synced"] == 2
    assert res["polls"] == 2  # one catch-up poll + one no-op poll
    assert seen and seen[0]["synced"] == 2
    assert _rows(imp.read(spark)) == _rows(src.read(spark))


def test_refresh_applies_external_rename(spark, tmp_path):
    """An external rename between refreshes applies by FIELD-ID diff
    against the names recorded at import — not as an added column."""
    src = LakehouseTable.create(str(tmp_path / "src"), SCHEMA)
    src.append(_df(spark, 0, 5))
    imp = import_iceberg_table(
        export_iceberg_metadata(src), str(tmp_path / "dst")
    )
    src.rename_column("v", "label")
    renamed = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("label", T.StringType())]
    )
    src.append(spark.createDataFrame([(100, "x")], renamed))
    export_iceberg_metadata(src)
    refresh_from_iceberg(imp)
    assert imp.schema().fieldNames() == ["k", "label"]
    got = {r.k: r.label for r in imp.read(spark).collect()}
    assert got[0] == "v0" and got[100] == "x"


def test_cli_refresh_iceberg(spark, tmp_path, capsys):
    import json as _json

    from iceberg_kafka_connect_spark.cli import main

    src = LakehouseTable.create(str(tmp_path / "src"), SCHEMA)
    src.append(_df(spark, 0, 5))
    out = export_iceberg_metadata(src)
    wh = str(tmp_path / "wh")
    assert main(
        ["table", "--warehouse", wh, "--name", "default.m",
         "import-iceberg", "--source", out]
    ) == 0
    src.append(_df(spark, 5, 10))
    export_iceberg_metadata(src)
    assert main(
        ["table", "--warehouse", wh, "--name", "default.m",
         "refresh-iceberg"]
    ) == 0
    got = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert got["synced"] == 1
    # --follow drains then stops when current
    src.append(_df(spark, 10, 15))
    export_iceberg_metadata(src)
    assert main(
        ["table", "--warehouse", wh, "--name", "default.m",
         "refresh-iceberg", "--follow", "--poll-interval", "0.01",
         "--max-polls", "5"]
    ) == 0
    got = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert got["synced"] == 1 and got["polls"] == 2
    from iceberg_kafka_connect_spark.sinks import Catalog

    assert Catalog(wh).load_table("default.m").read(spark).count() == 15


def test_refresh_from_depth_capped_mirror(spark, tmp_path):
    """The write-direction mirror exports heads only (history_depth=1);
    refresh must still sync append commits via the head's dangling
    parent link + its own ADDED entries."""
    src = LakehouseTable.create(str(tmp_path / "src"), SCHEMA)
    src.append(_df(spark, 0, 5))
    export_iceberg_metadata(src, history_depth=1)
    imp = import_iceberg_table(
        str(tmp_path / "src" / "iceberg-metadata"), str(tmp_path / "dst")
    )
    src.append(_df(spark, 5, 10))
    export_iceberg_metadata(src, history_depth=1)
    res = refresh_from_iceberg(imp)
    assert res["synced"] == 1
    assert _rows(imp.read(spark)) == _rows(src.read(spark))
    # a file-removing commit under depth-1 raises with guidance
    src.compact(spark)
    export_iceberg_metadata(src, history_depth=1)
    with pytest.raises(IcebergImportUnsupported, match="history-depth"):
        refresh_from_iceberg(imp)
    # ...and full-history export unblocks the same sync
    export_iceberg_metadata(src)
    res = refresh_from_iceberg(imp)
    assert res["synced"] >= 1
    assert _rows(imp.read(spark)) == _rows(src.read(spark))


def test_refresh_marker_rides_commits(spark, tmp_path):
    """The sync marker lives in snapshot summaries (atomic with each
    commit): wiping the property cache must not cause re-application."""
    src = LakehouseTable.create(str(tmp_path / "src"), SCHEMA)
    src.append(_df(spark, 0, 5))
    imp = import_iceberg_table(
        export_iceberg_metadata(src), str(tmp_path / "dst")
    )
    src.append(_df(spark, 5, 10))
    export_iceberg_metadata(src)
    refresh_from_iceberg(imp)
    # simulate the crash window: property write lost after the commit
    imp.set_properties({"import.source-snapshot-id": "0"})
    res = refresh_from_iceberg(imp)
    assert res["synced"] == 0
    assert imp.read(spark).count() == 10  # no duplication


def test_refresh_expired_marker_raises_cleanly(spark, tmp_path):
    """A marker that left the source's ancestry (expired + unreferenced)
    raises the designed error, not a KeyError."""
    src = LakehouseTable.create(str(tmp_path / "src"), SCHEMA)
    src.append(_df(spark, 0, 5))
    imp = import_iceberg_table(
        export_iceberg_metadata(src), str(tmp_path / "dst")
    )
    src.append(_df(spark, 5, 10))
    out = export_iceberg_metadata(src, history_depth=1)
    # sever ancestry: drop the parent link from the only exported snapshot
    with open(out) as f:
        md = json.load(f)
    for s in md["snapshots"]:
        s.pop("parent-snapshot-id", None)
    with open(out, "w") as f:
        json.dump(md, f)
    with pytest.raises(IcebergImportUnsupported, match="ancestry"):
        refresh_from_iceberg(imp)
