"""CLI test: connector-style JSON config → drained pipeline → correct table."""

from __future__ import annotations

import json

from iceberg_kafka_connect_spark.cli import build_pipeline
from iceberg_kafka_connect_spark.sinks import Catalog


def test_cli_job_spec_end_to_end(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    with open(src / "a.json", "w") as f:
        for i, (id_, op) in enumerate([(1, "I"), (2, "I"), (1, "U"), (2, "D")]):
            f.write(
                json.dumps(
                    {
                        "key": str(id_),
                        "value": json.dumps({"id": id_, "type": f"t{i}", "op": op}),
                        "topic": "t",
                        "partition": 0,
                        "offset": i,
                        "timestamp": "2024-01-01T00:00:00.000Z",
                    }
                )
                + "\n"
            )
    spec = {
        "name": "cli-test",
        "config": {
            "iceberg.tables": "default.events_sink",
            "iceberg.tables.cdc-field": "op",
            "iceberg.table.default.events_sink.id-columns": "id",
            "iceberg.tables.auto-create-enabled": "true",
        },
        "source": {"type": "files", "path": str(src)},
        "value_schema": "id long, type string, op string",
        "warehouse": str(tmp_path / "wh"),
        "checkpoint": str(tmp_path / "ck"),
        "run_mode": "available_now",
    }
    _, pipeline, stream = build_pipeline(spec, spark=spark)
    q = pipeline.start(stream, spec["checkpoint"], available_now=True)
    q.awaitTermination(120)

    t = Catalog(spec["warehouse"]).load_table("default.events_sink")
    assert sorted((r.id, r.type) for r in t.read(spark).collect()) == [(1, "t2")]
    assert t.current_snapshot()["summary"]["pipeline-id"] == "cli-test"


def test_cli_table_maintenance(spark, tmp_path, capsys):
    import json as _json

    from iceberg_kafka_connect_spark.cli import main
    from iceberg_kafka_connect_spark.sinks import Catalog
    from pyspark.sql import types as T

    wh = str(tmp_path / "wh")
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    t = Catalog(wh).create_table("default.m", schema)
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], schema))
    t.append(spark.createDataFrame([(3, "c")], schema))

    def run(*argv):
        assert main(["table", "--warehouse", wh, "--name", "default.m", *argv]) == 0
        return _json.loads(capsys.readouterr().out.strip())

    assert len(run("snapshots")) == 2
    hist = run("history")
    assert all(h["is_current_ancestor"] for h in hist)
    parts = run("partitions")
    assert parts[0]["n_rows"] == 3 or sum(p["n_rows"] for p in parts) == 3
    run("tag", "rel-1")
    assert "rel-1" in run("tags")
    run("drop-tag", "rel-1")
    assert run("tags") == {}
    files = run("files")
    assert len(files["data"]) >= 2 and files["deletes"] == []
    assert run("expire", "--keep", "1") == {"expired": 1}


def test_cli_table_dml_ddl_mirror(spark, tmp_path, capsys):
    import json as _json

    from pyspark.sql import types as T

    from iceberg_kafka_connect_spark.cli import main
    from iceberg_kafka_connect_spark.sinks import Catalog

    wh = str(tmp_path / "wh")
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.LongType())]
    )
    cat = Catalog(wh)
    t = cat.create_table("default.s", schema)
    cat.create_table("default.r", schema)
    t.append(spark.createDataFrame([(i, i * 10) for i in range(10)], schema))

    def run(*argv):
        assert main(["table", "--warehouse", wh, "--name", "default.s", *argv]) == 0
        return _json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    out = run("delete-where", "id >= 8", "--keys", "id")
    assert "snapshot_id" in out
    out = run("mirror", "--to", "default.r", "--keys", "id")
    assert "snapshot_id" in out
    r = cat.load_table("default.r")
    assert {(row.id, row.v) for row in r.read(spark).collect()} == {
        (i, i * 10) for i in range(8)
    }
    out = run("rename-column", "v", "val")
    assert out["schema"] == ["id", "val"]
    out = run("rewrite-where", "id < 5", "--sort-by", "id")
    assert "snapshot_id" in out
    assert t.read(spark).count() == 8


def test_cli_mv_refresh(spark, tmp_path, capsys):
    import json as _json

    from pyspark.sql import types as T

    from iceberg_kafka_connect_spark.cli import main
    from iceberg_kafka_connect_spark.operators.incremental import (
        aggregate_state,
    )
    from iceberg_kafka_connect_spark.sinks import Catalog

    wh = str(tmp_path / "wh")
    src_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("g", T.StringType()),
            T.StructField("v", T.LongType()),
        ]
    )
    mv_schema = T.StructType(
        [
            T.StructField("g", T.StringType()),
            T.StructField("n_rows", T.LongType()),
            T.StructField("sum_v", T.LongType()),
        ]
    )
    cat = Catalog(wh)
    t = cat.create_table("default.src", src_schema)
    cat.create_table("default.mv", mv_schema)
    t.append(
        spark.createDataFrame(
            [(i, "g" + str(i % 2), i) for i in range(10)], src_schema
        )
    )

    def run(*argv):
        assert (
            main(["table", "--warehouse", wh, "--name", "default.src", *argv])
            == 0
        )
        return _json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    args = ("mv-refresh", "--to", "default.mv", "--keys", "id",
            "--group-by", "g", "--sum", "v")
    out = run(*args)
    assert out["summary"]["mv-refresh-mode"] == "seed"
    mv = cat.load_table("default.mv")
    want = aggregate_state(t.read(spark), ["g"], ["v"])
    assert sorted(mv.read(spark).collect()) == sorted(want.collect())
    # idempotent re-poll
    assert run(*args) == {"status": "up to date"}


def test_cli_delete_where_positional(spark, tmp_path, capsys):
    import json as _json

    from pyspark.sql import types as T

    from iceberg_kafka_connect_spark.cli import main
    from iceberg_kafka_connect_spark.sinks import Catalog

    wh = str(tmp_path / "wh")
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.LongType())]
    )
    cat = Catalog(wh)
    t = cat.create_table("default.p", schema)
    # duplicate rows: no unique key, equality deletes can't express this
    rows = [(i % 5, i % 5) for i in range(10)]
    t.append(spark.createDataFrame(rows, schema))

    assert (
        main(
            [
                "table", "--warehouse", wh, "--name", "default.p",
                "delete-where", "v >= 3", "--positional",
            ]
        )
        == 0
    )
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "snapshot_id" in out
    assert t.read(spark).count() == 6  # ids 0,1,2 x2 copies each


def test_job_spec_catalog_properties_pick_backend(spark, tmp_path):
    """iceberg.catalog.* in the connector config selects the catalog
    backend, exactly the reference's Utilities.loadCatalog path."""
    from iceberg_kafka_connect_spark.cli import build_pipeline
    from iceberg_kafka_connect_spark.sinks.jdbc_catalog import JdbcCatalog

    spec = {
        "name": "jdbc-job",
        "config": {
            "iceberg.tables": "default.sink",
            "iceberg.tables.auto-create-enabled": "true",
            "iceberg.catalog.type": "jdbc",
            "iceberg.catalog.uri": f"jdbc:sqlite:{tmp_path}/cat.sqlite",
            "iceberg.catalog.warehouse": str(tmp_path / "wh"),
        },
        "source": {"type": "files", "path": str(tmp_path / "in")},
        "warehouse": str(tmp_path / "ignored"),
    }
    (tmp_path / "in").mkdir()
    _spark, pipeline, _stream = build_pipeline(spec, spark=spark)
    assert isinstance(pipeline.catalog, JdbcCatalog)


def test_cli_cherry_pick_and_publish_wap(spark, tmp_path, capsys):
    """table cherry-pick / publish-wap verbs publish staged snapshots onto
    a diverged main from the ops surface."""
    import json as _json

    from iceberg_kafka_connect_spark.cli import main
    from iceberg_kafka_connect_spark.sinks import Catalog

    wh = str(tmp_path / "wh")
    cat = Catalog(wh)
    t = cat.create_table(
        "db.cp",
        spark.createDataFrame([(1, "a")], "id long, v string").schema,
    )
    t.append(spark.createDataFrame([(1, "a")], "id long, v string"))
    t.create_branch("audit")
    staged = t.append(
        spark.createDataFrame([(2, "b")], "id long, v string"),
        branch="audit",
        snapshot_props={"wap.id": "cli-7"},
    )
    t.append(spark.createDataFrame([(9, "z")], "id long, v string"))
    assert (
        main(
            [
                "table",
                "--warehouse",
                wh,
                "--name",
                "db.cp",
                "publish-wap",
                "cli-7",
            ]
        )
        == 0
    )
    out = _json.loads(capsys.readouterr().out)
    assert out["summary"]["published-wap-id"] == "cli-7"
    assert {r.id for r in t.read(spark).collect()} == {1, 2, 9}
    # cherry-pick by snapshot id is refused for already-published
    rc_ok = True
    try:
        main(
            [
                "table",
                "--warehouse",
                wh,
                "--name",
                "db.cp",
                "cherry-pick",
                staged["snapshot_id"],
            ]
        )
        rc_ok = False
    except ValueError:
        pass
    assert rc_ok


def test_cli_job_spec_table_source(spark, tmp_path, capsys):
    """source.type='table': the job spec drives a table→table CDC
    pipeline (changelog source → upsert sink) through the same CLI
    entrypoint as kafka/files jobs."""
    from iceberg_kafka_connect_spark.cli import main
    from iceberg_kafka_connect_spark.sinks import Catalog
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("v", T.StringType(), True),
        ]
    )
    cat = Catalog(str(tmp_path / "wh"))
    src = cat.create_table("db.src", schema)
    src.append(
        spark.createDataFrame([(i, f"a{i}") for i in range(4)], schema)
    )
    spec = {
        "name": "table-sync",
        "config": {
            "iceberg.source.table": "db.src",
            "iceberg.tables": "db.dst",
            "iceberg.tables.default-id-columns": "id",
            "iceberg.tables.auto-create-enabled": "true",
        },
        "source": {"type": "table"},
        "warehouse": str(tmp_path / "wh"),
        "checkpoint": str(tmp_path / "ck"),
        "run_mode": "available_now",
    }
    spec_path = tmp_path / "job.json"
    spec_path.write_text(json.dumps(spec))
    assert main([str(spec_path)]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["status"] == "drained" and out["synced"] == 1
    got = sorted(
        (r.id, r.v) for r in cat.load_table("db.dst").read(spark).collect()
    )
    assert got == [(0, "a0"), (1, "a1"), (2, "a2"), (3, "a3")]
    # second run over the same checkpoint: drained again, zero replay
    src.delete_where(spark, "id = 2", key_cols=["id"])
    assert main([str(spec_path)]) == 0
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["synced"] == 1
    assert sorted(
        r.id for r in cat.load_table("db.dst").read(spark).collect()
    ) == [0, 1, 3]


def test_cli_rewrite_manifests_analyze_stats_clone(spark, tmp_path, capsys):
    """Round-7 CLI verbs: rewrite-manifests, analyze/stats, clone."""
    import json as _json

    from pyspark.sql import types as T

    from iceberg_kafka_connect_spark.cli import main
    from iceberg_kafka_connect_spark.sinks import Catalog

    wh = str(tmp_path / "wh")
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    cat = Catalog(wh)
    t = cat.create_table("default.r7", schema)
    for i in range(3):
        t.append(spark.createDataFrame([(i, "x")], schema))

    def run(*argv, name="default.r7"):
        assert main(["table", "--warehouse", wh, "--name", name, *argv]) == 0
        return _json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    out = run("rewrite-manifests")
    assert out["summary"]["manifests-squashed"] == "3"
    assert run("rewrite-manifests") == {"status": "nothing to squash"}

    out = run("analyze", "--exact")
    assert out["columns"]["id"]["ndv"] == 3
    out = run("stats")
    assert out["mode"] == "exact" and out["row-count"] == 3
    out = run("analyze", "--columns", "id")
    assert list(out["columns"]) == ["id"]

    out = run("clone", "default.r7copy")
    assert out["data_files"] == len(t.live_files()[0])
    c = cat.load_table("default.r7copy")
    assert c.read(spark).count() == 3
    assert run("stats", name="default.r7copy") == {"status": "never analyzed"}

    assert run("remove-dangling-deletes") == {"status": "nothing dangling"}
    assert run("read", "--count", "--where", "id >= 1") == {"count": 2}
    rows = run("read", "--limit", "2")
    assert len(rows) == 2 and {"id", "v"} <= set(rows[0])
    out = run("truncate", name="default.r7copy")
    assert "snapshot_id" in out
    assert c.read(spark).count() == 0
    assert t.read(spark).count() == 3  # zero-copy source untouched


def test_cli_warehouse_maintain_sweep(spark, tmp_path, capsys):
    """`maintain`: one warehouse-wide pass over every table, steps opt-in,
    per-table errors don't stop the fleet."""
    import json as _json

    from pyspark.sql import types as T

    from iceberg_kafka_connect_spark.cli import main
    from iceberg_kafka_connect_spark.sinks import Catalog

    wh = str(tmp_path / "wh")
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    cat = Catalog(wh)
    a = cat.create_table("default.ma", schema)
    for i in range(4):
        a.append(spark.createDataFrame([(i, "x")], schema))
    b = cat.create_table("default.mb", schema)
    b.append(spark.createDataFrame([(1, "y")], schema))

    rc = main(
        [
            "maintain",
            "--warehouse", wh,
            "--rewrite-manifests", "3",
            "--remove-dangling-deletes",
            "--expire-keep", "2",
            "--orphans-older-than-ms", "0",
            "--analyze",
        ]
    )
    assert rc == 0
    report = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["default.ma"]["manifests_squashed"] == 4
    assert report["default.mb"]["manifests_squashed"] == 0
    assert report["default.ma"]["dangling_deletes_removed"] == 0
    assert report["default.ma"]["expired"] >= 1
    assert report["default.ma"]["analyzed"] is True
    assert a.read(spark).count() == 4
    assert a.column_stats() is not None
    # a poisoned table is recorded, not fatal
    import os as _os

    vpath = b._version_path(b.current_version())
    with open(vpath) as f:
        raw = f.read()
    with open(vpath, "w") as f:
        f.write(raw[: len(raw) // 2])  # truncate: metadata unreadable
    rc = main(["maintain", "--warehouse", wh, "--expire-keep", "1"])
    assert rc == 1
    report = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "error" in report["default.mb"]
    assert "expired" in report["default.ma"]


def test_cli_rewrite_position_deletes_verb_and_maintain_flag(
    spark, tmp_path, capsys
):
    import json as _json

    from pyspark.sql import types as T

    from iceberg_kafka_connect_spark.cli import main
    from iceberg_kafka_connect_spark.sinks import Catalog

    wh = str(tmp_path / "wh")
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.LongType())]
    )
    t = Catalog(wh).create_table("default.dv", schema)
    t.append(spark.createDataFrame([(i, i % 3) for i in range(60)], schema))
    t.delete_where_positions(spark, "v = 1")
    t.delete_where_positions(spark, "v = 2")

    assert main(
        ["table", "--warehouse", wh, "--name", "default.dv",
         "rewrite-position-deletes"]
    ) == 0
    out = _json.loads(capsys.readouterr().out.strip())
    assert int(out["summary"]["deletion-vectors-written"]) >= 1
    assert t.read(spark).count() == 20
    # idempotent: second run reports nothing to do
    assert main(
        ["table", "--warehouse", wh, "--name", "default.dv",
         "rewrite-position-deletes"]
    ) == 0
    assert _json.loads(capsys.readouterr().out.strip()) == {
        "status": "no position deletes"
    }

    # the warehouse sweep consolidates once the file count crosses MIN
    t.delete_where_positions(spark, "v = 0 AND id < 10")
    t.delete_where_positions(spark, "v = 0 AND id >= 10")
    assert main(
        ["maintain", "--warehouse", wh, "--rewrite-position-deletes", "2"]
    ) == 0
    rep = _json.loads(capsys.readouterr().out.strip())
    assert rep["default.dv"]["deletion_vectors_written"] >= 1
    _, deletes = t.live_files()
    assert {d.get("delete_type") for d in deletes} == {"dv"}
    assert t.read(spark).count() == 0


def test_cli_compute_statistics(spark, tmp_path, capsys):
    import json as _json

    from iceberg_kafka_connect_spark.cli import main
    from iceberg_kafka_connect_spark.sinks import Catalog
    from pyspark.sql import types as T

    wh = str(tmp_path / "wh")
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("g", T.StringType())]
    )
    t = Catalog(wh).create_table("default.s", schema)
    t.append(
        spark.range(0, 300).selectExpr("id", "cast(id % 11 as string) g")
    )

    def run(*argv):
        assert (
            main(["table", "--warehouse", wh, "--name", "default.s", *argv])
            == 0
        )
        return _json.loads(capsys.readouterr().out.strip())

    assert run("compute-statistics", "--k", "512") == {"id": 300, "g": 11}
    t.append(
        spark.range(300, 400).selectExpr("id", "cast(id % 17 as string) g")
    )
    out = run("compute-statistics", "--k", "512", "--incremental")
    assert out["id"] == 400 and out["g"] == 17


def test_cli_validate_export(spark, tmp_path, capsys):
    import json as _json

    from iceberg_kafka_connect_spark.cli import main
    from iceberg_kafka_connect_spark.sinks import Catalog
    from pyspark.sql import types as T

    wh = str(tmp_path / "wh")
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.LongType())]
    )
    t = Catalog(wh).create_table("default.ve", schema)
    t.append(spark.createDataFrame([(1, 0), (2, 1)], schema))

    def run(*argv):
        rc = main(
            ["table", "--warehouse", wh, "--name", "default.ve", *argv]
        )
        return rc, _json.loads(capsys.readouterr().out.strip())

    rc, out = run("validate-export")
    assert rc == 0 and out["spec_violations"] == []
    # export --validate also sweeps and reports
    rc, out = run("export-iceberg", "--validate")
    assert rc == 0 and out["spec_violations"] == []
    # corrupt: point current-snapshot-id at nothing → non-zero exit
    md = _json.loads(open(out["metadata_json"]).read())
    md["current-snapshot-id"] = 1234
    with open(out["metadata_json"], "w") as f:
        _json.dump(md, f)
    rc, bad = run("validate-export", "--metadata", out["metadata_json"])
    assert rc == 1
    assert any("current-snapshot-id" in v for v in bad["spec_violations"])


def test_cli_job_spec_wire_format_converter(spark, tmp_path):
    """Connector-JSON converter keys drive the pipeline: a files source
    in binary mode + value.converter=AvroConverter lands framed wire
    records; the serve-registry verb's server backs the schema ids."""
    import base64

    from iceberg_kafka_connect_spark.sinks.avro_io import (
        spark_to_avro_schema,
    )
    from iceberg_kafka_connect_spark.sources.confluent import (
        encode_avro_payload,
        frame,
    )
    from iceberg_kafka_connect_spark.sources.registry import (
        SchemaRegistryClient,
        SchemaRegistryServer,
    )
    from pyspark.sql import types as T

    value_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
        ]
    )
    avro = spark_to_avro_schema(value_schema, name="rec")
    src = tmp_path / "in"
    src.mkdir()
    with SchemaRegistryServer() as srv:
        sid = SchemaRegistryClient(srv.uri).register("t-value", avro)
        with open(src / "a.json", "w") as f:
            for i in range(3):
                framed = frame(
                    sid,
                    encode_avro_payload(
                        avro, {"id": i, "name": f"n{i}"}
                    ),
                )
                f.write(
                    json.dumps(
                        {
                            "key": base64.b64encode(
                                str(i).encode()
                            ).decode(),
                            "value": base64.b64encode(framed).decode(),
                            "topic": "t",
                            "partition": 0,
                            "offset": i,
                            "timestamp": "2024-01-01T00:00:00.000Z",
                        }
                    )
                    + "\n"
                )
        spec = {
            "name": "cli-wire",
            "config": {
                "iceberg.tables": "default.wire_sink",
                "iceberg.tables.auto-create-enabled": "true",
                "value.converter":
                    "io.confluent.connect.avro.AvroConverter",
                "value.converter.schema.registry.url": srv.uri,
            },
            "source": {
                "type": "files",
                "path": str(src),
                "binary_value": True,
            },
            "value_schema": "id long, name string",
            "warehouse": str(tmp_path / "wh"),
            "checkpoint": str(tmp_path / "ck"),
            "run_mode": "available_now",
        }
        _, pipeline, stream = build_pipeline(spec, spark=spark)
        q = pipeline.start(stream, spec["checkpoint"], available_now=True)
        assert q.awaitTermination(120)
    t = Catalog(spec["warehouse"]).load_table("default.wire_sink")
    assert sorted((r.id, r.name) for r in t.read(spark).collect()) == [
        (0, "n0"), (1, "n1"), (2, "n2"),
    ]
