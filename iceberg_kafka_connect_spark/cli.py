"""Run a sink pipeline from a connector-style JSON config.

The reference is deployed by POSTing a JSON connector config to Kafka
Connect. This CLI accepts the same flat property map (plus a small
``source``/``warehouse`` section Spark needs) so an existing config ports
with an envelope, not a rewrite:

    {
      "name": "events-sink",
      "config": {
        "iceberg.tables": "default.events_sink",
        "iceberg.tables.cdc-field": "op",
        "iceberg.table.default.events_sink.id-columns": "id",
        "iceberg.tables.auto-create-enabled": "true"
      },
      "source": {"type": "files", "path": "/data/in"},          # or kafka,
                                         # or {"type": "table"} — a lakehouse
                                         # table as the CDC source, paired
                                         # with iceberg.source.table in config
                                         # (streaming/changelog_source.py)
      "value_schema": "id long, type string, ts timestamp, op string",
      "transforms": ["debezium"],                               # SMT chain
      "warehouse": "/data/warehouse",
      "checkpoint": "/data/checkpoints/events-sink",
      "run_mode": "available_now"                               # or continuous
    }

``transforms`` names the SMT chain (like the connector's ``transforms=``
property): debezium | dms | json_to_map_root | kafka_metadata.

Usage: python -m iceberg_kafka_connect_spark.cli job.json
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import types as T

from .config import from_properties
from .session import get_spark
from .sinks import Catalog
from .sources.stream import file_stream_source, kafka_stream_source
from .streaming import SinkPipeline


def _resolve_transforms(names: list[str]):
    from .transforms import (
        debezium_transform,
        dms_transform,
        json_to_map,
        kafka_metadata,
    )

    registry = {
        "debezium": debezium_transform,
        "dms": dms_transform,
        "json_to_map_root": lambda: json_to_map(root=True),
        "kafka_metadata": kafka_metadata,
    }
    out = []
    for name in names:
        if name not in registry:
            raise ValueError(f"unknown transform: {name}")
        out.append(registry[name]())
    return out


def build_pipeline(spec: dict, spark=None):
    spark = spark or get_spark(app_name=spec.get("name", "iceberg-sink"))
    cfg = from_properties(spec["config"])
    # catalog selection exactly as the reference does it: when the
    # connector config carries iceberg.catalog.* properties, they pick
    # the backend (hadoop dir / rest / jdbc — Utilities.loadCatalog);
    # the plain spec["warehouse"] shortcut stays for bare dir jobs
    if any(k.startswith("iceberg.catalog.") for k in spec["config"]):
        from .sinks.catalog import catalog_from_properties

        catalog = catalog_from_properties(spec["config"])
    else:
        catalog = Catalog(spec["warehouse"])
    schema = None
    if spec.get("value_schema"):
        schema = T.StructType.fromDDL(spec["value_schema"])
    # SMT chain from either surface: the spec's short-name list AND the
    # connector-JSON `transforms=` + `transforms.<name>.*` properties
    # (parse_transform_chain — reference config key names verbatim)
    from .config import parse_transform_chain

    chain = _resolve_transforms(spec.get("transforms", []))
    chain += parse_transform_chain(spec["config"])
    # Connect's converter stage from the same flat properties
    # (value.converter / key.converter + their sub-keys — README.md:77)
    from .sources.confluent import (
        key_converter_from_properties,
        value_converter_from_properties,
    )

    pipeline = SinkPipeline(
        catalog,
        cfg,
        pipeline_id=spec.get("name", "pipeline"),
        value_schema=schema,
        transforms=chain,
        value_converter=value_converter_from_properties(spec["config"]),
        key_converter=key_converter_from_properties(spec["config"]),
    )
    src = spec["source"]
    if src["type"] == "kafka":
        mopt = src.get("max_offsets_per_trigger")
        stream = kafka_stream_source(
            spark,
            src["bootstrap_servers"],
            src["topics"],
            src.get("starting_offsets", "earliest"),
            kafka_props=cfg.kafka_props or None,
            max_offsets_per_trigger=int(mopt) if mopt is not None else None,
        )
    elif src["type"] == "files":
        stream = file_stream_source(
            spark,
            src["path"],
            binary_value=bool(src.get("binary_value")),
        )
    else:
        raise ValueError(f"unknown source type: {src['type']}")
    return spark, pipeline, stream


def table_main(argv: list[str]) -> int:
    """Maintenance / inspection subcommand (the ops surface Iceberg users
    reach via CALL procedures and metadata tables):

        python -m iceberg_kafka_connect_spark.cli table \\
            --warehouse WH --name db.t ACTION [...]

    Metadata actions (snapshots/files/history/partitions/tags) read JSON
    only — no SparkSession. compact and rollback start Spark.
    """
    ap = argparse.ArgumentParser(prog="cli table")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--name", required=True)
    sub = ap.add_subparsers(dest="action", required=True)
    for meta_action in (
        "snapshots", "files", "history", "partitions", "tags", "stats"
    ):
        sub.add_parser(meta_action)
    c = sub.add_parser("compact")
    c.add_argument("--sort-by", help="comma-separated sort columns")
    c.add_argument(
        "--zorder-by",
        help="comma-separated z-order columns (2+, mutually exclusive "
        "with --sort-by)",
    )
    bp = sub.add_parser("binpack")
    bp.add_argument("--min-size", type=int, default=32 * 1024 * 1024)
    rm = sub.add_parser("rewrite-manifests")
    rm.add_argument("--min-manifests", type=int, default=2)
    an = sub.add_parser("analyze")
    an.add_argument("--columns", help="comma-separated subset (default: all)")
    an.add_argument("--exact", action="store_true")
    an.add_argument(
        "--incremental",
        action="store_true",
        help="scan only files appended since the last sketch-bearing "
        "ANALYZE and union the HLL sketches (falls back to full approx)",
    )
    cs = sub.add_parser("compute-statistics")
    cs.add_argument("--columns", help="comma-separated subset (default: all)")
    cs.add_argument("--k", type=int, default=4096, help="KMV sketch size")
    cs.add_argument(
        "--incremental",
        action="store_true",
        help="union stored KMV sketches with sketches of only the rows "
        "appended since (falls back to a full rebuild across rewrites)",
    )
    cl = sub.add_parser("clone")
    cl.add_argument("dst", help="destination table name in this warehouse")
    sub.add_parser("remove-dangling-deletes")
    sub.add_parser("rewrite-position-deletes")
    sub.add_parser("truncate")
    rd = sub.add_parser("read")
    rd.add_argument("--where", default=None)
    rd.add_argument("--limit", type=int, default=20)
    rd.add_argument("--count", action="store_true",
                    help="print only the row count")
    rd.add_argument("--snapshot", default=None)
    rd.add_argument("--as-of-ms", type=int, default=None)
    e = sub.add_parser("expire")
    e.add_argument("--keep", type=int, default=10)
    e.add_argument("--older-than-ms", type=int, default=None)
    o = sub.add_parser("orphans")
    o.add_argument("--delete", action="store_true")
    o.add_argument(
        "--older-than-ms",
        type=int,
        default=None,
        help="age threshold; unreferenced files younger than this are "
        "kept (default: 3 days, Iceberg's olderThan default)",
    )
    tg = sub.add_parser("tag")
    tg.add_argument("tag_name")
    tg.add_argument("--snapshot")
    dt = sub.add_parser("drop-tag")
    dt.add_argument("tag_name")
    rb = sub.add_parser("rollback")
    rb.add_argument("snapshot")
    rw = sub.add_parser("rewrite-where")
    rw.add_argument("predicate")
    rw.add_argument("--sort-by", help="comma-separated sort columns")
    dw = sub.add_parser("delete-where")
    dw.add_argument("predicate")
    dw.add_argument(
        "--keys",
        help="comma-separated id columns (equality deletes); omit with "
        "--positional for row-identity deletes",
    )
    dw.add_argument(
        "--positional",
        action="store_true",
        help="delete by (file, row-ordinal) — exact even without unique keys",
    )
    ff = sub.add_parser("fast-forward")
    ff.add_argument("branch")
    ff.add_argument("to_branch")
    cp = sub.add_parser("cherry-pick")
    cp.add_argument("snapshot")
    cp.add_argument("--branch", default="main")
    pw = sub.add_parser("publish-wap")
    pw.add_argument("wap_id")
    pw.add_argument("--branch", default="main")
    rc = sub.add_parser("rename-column")
    rc.add_argument("old")
    rc.add_argument("new")
    dc = sub.add_parser("drop-column")
    dc.add_argument("column")
    mi = sub.add_parser("mirror")
    mi.add_argument("--to", required=True, help="replica table name")
    mi.add_argument("--keys", required=True, help="comma-separated id columns")
    mr = sub.add_parser("mv-refresh")
    mr.add_argument("--to", required=True, help="materialized-view table name")
    mr.add_argument("--keys", required=True, help="comma-separated id columns")
    mr.add_argument(
        "--group-by", required=True, help="comma-separated group columns"
    )
    mr.add_argument("--sum", default="", help="comma-separated sum columns")
    ei = sub.add_parser("export-iceberg")
    ei.add_argument(
        "--out", help="metadata output dir (default <table>/iceberg-metadata)"
    )
    ei.add_argument(
        "--validate",
        action="store_true",
        help="run the spec validator over the exported tree (fails on "
        "any violation)",
    )
    va = sub.add_parser("validate-export")
    va.add_argument(
        "--metadata",
        help="an exported metadata.json to validate (default: export "
        "fresh, then validate)",
    )
    ii = sub.add_parser("import-iceberg")
    ii.add_argument(
        "--source",
        required=True,
        help="external Iceberg table dir, metadata dir, or metadata.json",
    )
    ii.add_argument(
        "--snapshot-id", type=int, help="import a specific snapshot"
    )
    ri = sub.add_parser("refresh-iceberg")
    ri.add_argument(
        "--source",
        help="override the recorded import.source-metadata location",
    )
    ri.add_argument(
        "--follow",
        action="store_true",
        help="poll until caught up (iceberg_sync_loop, stop when current)",
    )
    ri.add_argument(
        "--poll-interval", type=float, default=5.0, help="seconds per poll"
    )
    ri.add_argument(
        "--max-polls", type=int, default=None, help="bound the follow loop"
    )
    args = ap.parse_args(argv)

    catalog = Catalog(args.warehouse)
    if args.action == "import-iceberg":
        from .sinks.iceberg_import import import_iceberg_table

        t = import_iceberg_table(
            args.source,
            catalog._path(args.name),
            snapshot_id=args.snapshot_id,
        )
        data_f, del_f = t.live_files()
        print(
            json.dumps(
                {
                    "table": args.name,
                    "data_files": len(data_f),
                    "delete_files": len(del_f),
                    "snapshot_id": t.current_snapshot()["snapshot_id"],
                },
                default=str,
            )
        )
        return 0
    if args.action == "validate-export" and args.metadata:
        # standalone sweep of an existing exported metadata.json — the
        # only input is the file, no live table needed
        from .sinks.spec_validator import validate_exported_tree

        violations = validate_exported_tree(args.metadata)
        print(
            json.dumps(
                {
                    "metadata_json": args.metadata,
                    "spec_violations": violations,
                },
                indent=2 if violations else None,
            )
        )
        return 1 if violations else 0
    t = catalog.load_table(args.name)
    out: object
    if args.action == "refresh-iceberg":
        if args.follow:
            from .streaming.iceberg_sync import iceberg_sync_loop

            print(
                json.dumps(
                    iceberg_sync_loop(
                        t,
                        source=args.source,
                        poll_interval_s=args.poll_interval,
                        max_polls=args.max_polls,
                        stop_when_current=True,
                    )
                )
            )
            return 0
        from .sinks.iceberg_import import refresh_from_iceberg

        print(json.dumps(refresh_from_iceberg(t, source=args.source)))
        return 0
    if args.action == "snapshots":
        out = t.snapshots()
    elif args.action == "files":
        data, deletes = t.live_files()
        out = {"data": data, "deletes": deletes}
    elif args.action == "history":
        out = [
            dict(
                zip(
                    (
                        "made_current_at_ms",
                        "snapshot_id",
                        "parent_id",
                        "is_current_ancestor",
                    ),
                    r,
                )
            )
            for r in t.history_rows()
        ]
    elif args.action == "partitions":
        out = [
            dict(zip(("partition", "n_files", "n_rows"), r))
            for r in t.partition_rows()
        ]
    elif args.action == "tags":
        out = t.tags()
    elif args.action == "stats":
        out = t.column_stats() or {"status": "never analyzed"}
    elif args.action == "analyze":
        spark = get_spark(app_name="table-maintenance")
        if args.exact and args.incremental:
            raise SystemExit("--exact and --incremental are mutually exclusive")
        out = t.analyze(
            spark,
            columns=args.columns.split(",") if args.columns else None,
            mode="exact" if args.exact
            else ("incremental" if args.incremental else "approx"),
        )
        out = {k: v for k, v in out.items() if k != "columns"} | {
            "columns": {
                c: {k: v for k, v in st.items() if k != "sketch"}
                for c, st in out["columns"].items()
            }
        }
    elif args.action == "compute-statistics":
        spark = get_spark(app_name="table-maintenance")
        out = t.compute_statistics(
            spark,
            columns=args.columns.split(",") if args.columns else None,
            k=args.k,
            mode="incremental" if args.incremental else "full",
        )
    elif args.action == "read":
        spark = get_spark(app_name="table-read")
        df = t.read(
            spark,
            where=args.where,
            snapshot_id=args.snapshot,
            as_of_ms=args.as_of_ms,
        )
        if args.count:
            out = {"count": df.count()}
        else:
            out = [r.asDict() for r in df.limit(args.limit).collect()]
    elif args.action == "remove-dangling-deletes":
        snap = t.remove_dangling_deletes()
        out = (
            {"snapshot_id": snap["snapshot_id"], "summary": snap["summary"]}
            if snap
            else {"status": "nothing dangling"}
        )
    elif args.action == "rewrite-position-deletes":
        snap = t.rewrite_position_deletes(get_spark(app_name="dv-rewrite"))
        out = (
            {"snapshot_id": snap["snapshot_id"], "summary": snap["summary"]}
            if snap
            else {"status": "no position deletes"}
        )
    elif args.action == "truncate":
        snap = t.truncate()
        out = {"snapshot_id": snap["snapshot_id"]}
    elif args.action == "clone":
        dst = catalog.clone_table(args.name, args.dst)
        head = dst.current_snapshot()
        out = {
            "root": dst.root,
            "snapshot_id": head["snapshot_id"] if head else None,
            "data_files": len(dst.live_files()[0]),
        }
    elif args.action == "expire":
        out = {
            "expired": t.expire_snapshots(
                keep_last=args.keep, older_than_ms=args.older_than_ms
            )
        }
    elif args.action == "orphans":
        out = {
            "orphans": t.remove_orphan_files(
                dry_run=not args.delete, older_than_ms=args.older_than_ms
            )
        }
    elif args.action == "tag":
        t.create_tag(args.tag_name, snapshot_id=args.snapshot)
        out = t.tags()
    elif args.action == "drop-tag":
        t.drop_tag(args.tag_name)
        out = t.tags()
    elif args.action == "compact":
        spark = get_spark(app_name="table-maintenance")
        sort_by = (
            [c.strip() for c in args.sort_by.split(",")] if args.sort_by else None
        )
        zorder_by = (
            [c.strip() for c in args.zorder_by.split(",")]
            if getattr(args, "zorder_by", None)
            else None
        )
        snap = t.compact(spark, sort_by=sort_by, zorder_by=zorder_by)
        out = {"snapshot_id": snap["snapshot_id"], "operation": snap["operation"]}
    elif args.action == "binpack":
        spark = get_spark(app_name="table-maintenance")
        snap = t.rewrite_small_files(spark, min_file_size=args.min_size)
        out = (
            {"snapshot_id": snap["snapshot_id"], "summary": snap["summary"]}
            if snap
            else {"status": "nothing to rewrite"}
        )
    elif args.action == "rewrite-manifests":
        snap = t.rewrite_manifests(min_manifests=args.min_manifests)
        out = (
            {"snapshot_id": snap["snapshot_id"], "summary": snap["summary"]}
            if snap
            else {"status": "nothing to squash"}
        )
    elif args.action == "rollback":
        snap = t.rollback(args.snapshot)
        out = {"snapshot_id": snap["snapshot_id"]}
    elif args.action == "cherry-pick":
        snap = t.cherry_pick(args.snapshot, branch=args.branch)
        out = {"snapshot_id": snap["snapshot_id"], "summary": snap["summary"]}
    elif args.action == "publish-wap":
        snap = t.publish_wap(args.wap_id, branch=args.branch)
        out = {"snapshot_id": snap["snapshot_id"], "summary": snap["summary"]}
    elif args.action == "rewrite-where":
        spark = get_spark(app_name="table-maintenance")
        sort_by = (
            [c.strip() for c in args.sort_by.split(",")] if args.sort_by else None
        )
        snap = t.rewrite_where(spark, args.predicate, sort_by=sort_by)
        out = (
            {"snapshot_id": snap["snapshot_id"], "summary": snap["summary"]}
            if snap
            else {"status": "no file matches"}
        )
    elif args.action == "delete-where":
        spark = get_spark(app_name="table-maintenance")
        if args.positional:
            snap = t.delete_where_positions(spark, args.predicate)
        elif args.keys:
            snap = t.delete_where(
                spark, args.predicate, key_cols=args.keys.split(",")
            )
        else:
            raise SystemExit(
                "delete-where needs --keys (equality) or --positional"
            )
        out = (
            {"snapshot_id": snap["snapshot_id"]}
            if snap
            else {"status": "no row matches"}
        )
    elif args.action == "fast-forward":
        snap = t.fast_forward(args.branch, args.to_branch)
        out = {"snapshot_id": snap["snapshot_id"]}
    elif args.action == "rename-column":
        t.rename_column(args.old, args.new)
        out = {"schema": [f.name for f in t.schema().fields]}
    elif args.action == "drop-column":
        t.drop_column(args.column)
        out = {"schema": [f.name for f in t.schema().fields]}
    elif args.action == "export-iceberg":
        from .sinks.iceberg_export import export_iceberg_metadata

        path = export_iceberg_metadata(t, out_dir=args.out)
        out = {"metadata_json": path}
        if args.validate:
            from .sinks.spec_validator import validate_exported_tree

            violations = validate_exported_tree(path)
            out["spec_violations"] = violations
            if violations:
                print(json.dumps(out, indent=2))
                return 1
    elif args.action == "validate-export":
        # --metadata short-circuits before the table load above; here:
        # export fresh, then sweep
        from .sinks.iceberg_export import export_iceberg_metadata
        from .sinks.spec_validator import validate_exported_tree

        path = export_iceberg_metadata(t)
        violations = validate_exported_tree(path)
        out = {"metadata_json": path, "spec_violations": violations}
        if violations:
            print(json.dumps(out, indent=2))
            return 1
    elif args.action == "mirror":
        from .streaming.replicate import mirror_changes

        spark = get_spark(app_name="table-mirror")
        dst = catalog.load_table(args.to)
        snap = mirror_changes(
            spark, t, dst, key_cols=args.keys.split(",")
        )
        out = (
            {"snapshot_id": snap["snapshot_id"], "summary": snap["summary"]}
            if snap
            else {"status": "up to date"}
        )
    elif args.action == "mv-refresh":
        from .streaming.mv import refresh_materialized_agg

        spark = get_spark(app_name="table-mv-refresh")
        dst = catalog.load_table(args.to)
        snap = refresh_materialized_agg(
            spark,
            t,
            dst,
            key_cols=args.keys.split(","),
            group_cols=args.group_by.split(","),
            sum_cols=[c for c in args.sum.split(",") if c],
        )
        out = (
            {"snapshot_id": snap["snapshot_id"], "summary": snap["summary"]}
            if snap
            else {"status": "up to date"}
        )
    else:  # pragma: no cover — argparse enforces choices
        raise ValueError(args.action)
    print(json.dumps(out, default=str))
    return 0


def maintain_main(argv: list[str]) -> int:
    """Warehouse-wide maintenance sweep — the cron job a lakehouse fleet
    runs: per table (in dependency-safe order) squash manifests, binpack
    small files, expire snapshots, remove orphans, refresh column stats.
    Each step is opt-in via its flag; per-table failures are recorded and
    the sweep continues (exit 1 if anything failed)."""
    ap = argparse.ArgumentParser(prog="maintain")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument(
        "--rewrite-manifests", type=int, default=None, metavar="MIN",
        help="squash metadata walks at least MIN manifests deep",
    )
    ap.add_argument("--binpack-min-size", type=int, default=None)
    ap.add_argument(
        "--rewrite-position-deletes", type=int, default=None, metavar="MIN",
        help="consolidate MIN+ position-delete files into deletion "
        "vectors (one roaring bitmap per referenced data file)",
    )
    ap.add_argument("--remove-dangling-deletes", action="store_true")
    ap.add_argument("--expire-keep", type=int, default=None)
    ap.add_argument("--orphans-older-than-ms", type=int, default=None)
    ap.add_argument("--analyze", action="store_true")
    args = ap.parse_args(argv)
    catalog = Catalog(args.warehouse)
    spark = None

    def _spark():
        nonlocal spark
        if spark is None:
            spark = get_spark(app_name="warehouse-maintenance")
        return spark

    report: dict = {}
    failed = False
    for name in sorted(catalog.list_tables()):
        t = catalog.load_table(name)
        r: dict = {}
        try:
            if args.rewrite_manifests is not None:
                snap = t.rewrite_manifests(
                    min_manifests=args.rewrite_manifests
                )
                r["manifests_squashed"] = (
                    int(snap["summary"]["manifests-squashed"]) if snap else 0
                )
            if args.binpack_min_size is not None:
                snap = t.rewrite_small_files(
                    _spark(), min_file_size=args.binpack_min_size
                )
                r["binpacked"] = snap is not None
            if args.rewrite_position_deletes is not None:
                n_pos = sum(
                    1
                    for f in t.live_files()[1]
                    if f.get("delete_type") == "position"
                )
                if n_pos >= args.rewrite_position_deletes:
                    snap = t.rewrite_position_deletes(_spark())
                    r["deletion_vectors_written"] = (
                        int(snap["summary"]["deletion-vectors-written"])
                        if snap
                        else 0
                    )
            if args.remove_dangling_deletes:
                snap = t.remove_dangling_deletes()
                r["dangling_deletes_removed"] = (
                    int(snap["summary"]["dangling-deletes-removed"])
                    if snap
                    else 0
                )
            if args.expire_keep is not None:
                r["expired"] = t.expire_snapshots(keep_last=args.expire_keep)
            if args.orphans_older_than_ms is not None:
                r["orphans_removed"] = len(
                    t.remove_orphan_files(
                        older_than_ms=args.orphans_older_than_ms
                    )
                )
            if args.analyze:
                # incremental: a sweep re-analyzes the fleet every run —
                # only the newly appended files should pay
                t.analyze(_spark(), mode="incremental")
                r["analyzed"] = True
        except Exception as e:  # noqa: BLE001 — sweep must finish the fleet
            r["error"] = f"{type(e).__name__}: {e}"
            failed = True
        report[name] = r
    print(json.dumps(report))
    return 1 if failed else 0


def serve_rest_main(argv: list[str]) -> int:
    """Front a warehouse with the Iceberg REST catalog protocol:

        python -m iceberg_kafka_connect_spark.cli serve-rest \\
            --warehouse WH [--host H] [--port P] [--token T]

    Prints one JSON line with the bound uri, then serves until
    interrupted. Any REST-catalog client (including this package's
    ``RestCatalog`` and external engines configured with
    ``iceberg.catalog.type=rest``) can then load/create/commit tables.
    """
    ap = argparse.ArgumentParser(prog="cli serve-rest")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8181)
    ap.add_argument("--token", default=None)
    args = ap.parse_args(argv)
    from .sinks.rest_server import IcebergRestServer

    srv = IcebergRestServer(
        args.warehouse, host=args.host, port=args.port, token=args.token
    ).start()
    print(
        json.dumps({"uri": srv.uri, "warehouse": args.warehouse}), flush=True
    )
    try:
        import threading

        threading.Event().wait()
    except KeyboardInterrupt:
        pass
    finally:
        srv.stop()
    return 0


def serve_nessie_main(argv: list[str]) -> int:
    """Run the in-process Nessie REST v2 service:

        python -m iceberg_kafka_connect_spark.cli serve-nessie \
            [--host H] [--port P] [--token T] [--default-branch B]

    Prints one JSON line with the bound /api/v2 uri, then serves until
    interrupted. Clients configured with ``iceberg.catalog.type=nessie``
    (including this package's ``NessieCatalog``) get the full versioned
    surface: key-level-CAS commits, branches/tags, merge, commit log.
    """
    ap = argparse.ArgumentParser(prog="cli serve-nessie")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=19120)
    ap.add_argument("--token", default=None)
    ap.add_argument("--default-branch", default="main")
    args = ap.parse_args(argv)
    from .sinks.nessie_server import NessieServer

    srv = NessieServer(
        host=args.host,
        port=args.port,
        token=args.token,
        default_branch=args.default_branch,
    ).start()
    print(json.dumps({"uri": srv.uri}), flush=True)
    try:
        import threading

        threading.Event().wait()
    except KeyboardInterrupt:
        pass
    finally:
        srv.stop()
    return 0


def serve_registry_main(argv: list[str]) -> int:
    """Run the in-process Confluent-protocol Schema Registry:

        python -m iceberg_kafka_connect_spark.cli serve-registry \\
            [--host H] [--port P] [--token T]

    Prints one JSON line with the bound uri, then serves until
    interrupted. Pipelines configured with ``value.converter.schema.
    registry.url`` (AvroConverter / JsonSchemaConverter /
    ProtobufConverter lanes) resolve wire-format schema ids here.
    """
    ap = argparse.ArgumentParser(prog="cli serve-registry")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8081)
    ap.add_argument("--token", default=None)
    args = ap.parse_args(argv)
    from .sources.registry import SchemaRegistryServer

    srv = SchemaRegistryServer(
        host=args.host, port=args.port, token=args.token
    )
    print(json.dumps({"uri": srv.uri}), flush=True)
    try:
        import threading

        threading.Event().wait()
    except KeyboardInterrupt:
        pass
    finally:
        srv.close()
    return 0


def serve_connect_main(argv: list[str]) -> int:
    """Run the Kafka Connect REST worker twin:

        python -m iceberg_kafka_connect_spark.cli serve-connect \\
            --warehouse WH --checkpoint-root CK \\
            (--files-root DIR | --bootstrap-servers H:P) \\
            [--host H] [--port P] [--token T] [--binary-value]

    Prints one JSON line with the bound uri, then serves until
    interrupted. Deployment tooling speaks the public Connect REST
    protocol to it: POST/PUT /connectors with the reference's connector
    JSON verbatim, /status, pause/resume/restart/stop, DELETE,
    /connector-plugins/.../config/validate.
    """
    ap = argparse.ArgumentParser(prog="cli serve-connect")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--checkpoint-root", required=True)
    ap.add_argument("--files-root", default=None)
    ap.add_argument("--bootstrap-servers", default=None)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8083)
    ap.add_argument("--token", default=None)
    ap.add_argument("--binary-value", action="store_true")
    args = ap.parse_args(argv)
    from .connect_server import ConnectRestServer
    from .connect_worker import ConnectWorker

    spark = get_spark(app_name="connect-worker")
    worker = ConnectWorker(
        spark,
        warehouse=args.warehouse,
        checkpoint_root=args.checkpoint_root,
        files_root=args.files_root,
        bootstrap_servers=args.bootstrap_servers,
        binary_value=args.binary_value,
    )
    srv = ConnectRestServer(
        worker, host=args.host, port=args.port, token=args.token
    )
    print(json.dumps({"uri": srv.uri}), flush=True)
    try:
        import threading

        threading.Event().wait()
    except KeyboardInterrupt:
        pass
    finally:
        srv.close()
    return 0


def views_main(argv: list[str]) -> int:
    """SQL-view subcommand over a warehouse (sinks/views.py):

        python -m iceberg_kafka_connect_spark.cli views \\
            --warehouse WH {list | show NAME | create NAME SQL |
                            replace NAME SQL | drop NAME |
                            rename SRC DST}
    """
    from .sinks.views import ViewStore, sql_view_version

    ap = argparse.ArgumentParser(prog="cli views")
    ap.add_argument("--warehouse", required=True)
    sub = ap.add_subparsers(dest="action", required=True)
    sub.add_parser("list")
    for a in ("show", "drop"):
        p = sub.add_parser(a)
        p.add_argument("name")
    for a in ("create", "replace"):
        p = sub.add_parser(a)
        p.add_argument("name")
        p.add_argument("sql")
    rn = sub.add_parser("rename")
    rn.add_argument("src")
    rn.add_argument("dst")
    args = ap.parse_args(argv)
    store = ViewStore(args.warehouse)
    if args.action == "list":
        out: object = store.list()
    elif args.action == "show":
        out = store.load(args.name)[1]
    elif args.action == "create":
        out = store.create(
            args.name,
            {"type": "struct", "schema-id": 0, "fields": []},
            sql_view_version(args.sql),
        )
    elif args.action == "replace":
        out = store.add_version(args.name, sql_view_version(args.sql))
    elif args.action == "drop":
        store.drop(args.name)
        out = {"dropped": args.name}
    else:  # rename
        store.rename(args.src, args.dst)
        out = {"renamed": [args.src, args.dst]}
    print(json.dumps(out, indent=2, default=str))
    return 0


def main(argv: list[str] | None = None) -> int:
    if argv is None:
        argv = sys.argv[1:]
    if argv and argv[0] == "table":
        return table_main(argv[1:])
    if argv and argv[0] == "views":
        return views_main(argv[1:])
    if argv and argv[0] == "serve-rest":
        return serve_rest_main(argv[1:])
    if argv and argv[0] == "serve-nessie":
        return serve_nessie_main(argv[1:])
    if argv and argv[0] == "serve-registry":
        return serve_registry_main(argv[1:])
    if argv and argv[0] == "serve-connect":
        return serve_connect_main(argv[1:])
    if argv and argv[0] == "maintain":
        return maintain_main(argv[1:])
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("job_spec", help="path to the job spec JSON")
    ap.add_argument(
        "--once",
        action="store_true",
        help="force availableNow (drain and exit) regardless of run_mode",
    )
    args = ap.parse_args(argv)
    with open(args.job_spec) as f:
        spec = json.load(f)

    available_now = args.once or spec.get("run_mode", "continuous") == "available_now"
    if spec.get("source", {}).get("type") == "table":
        # table→table CDC: a lakehouse table as the pipeline SOURCE
        # (streaming/changelog_source.py), symmetric with kafka/files
        from .streaming.changelog_source import ChangelogPipeline

        spark = get_spark(app_name=spec.get("name", "iceberg-table-sync"))
        if any(k.startswith("iceberg.catalog.") for k in spec["config"]):
            from .sinks.catalog import catalog_from_properties

            catalog = catalog_from_properties(spec["config"])
        else:
            catalog = Catalog(spec["warehouse"])
        cp = ChangelogPipeline.from_properties(
            catalog, spec["config"], spec["checkpoint"]
        )
        out = cp.run(
            spark,
            available_now=available_now,
            max_polls=spec.get("max_polls"),
        )
        print(
            json.dumps(
                {
                    "name": spec.get("name"),
                    "status": "drained" if available_now else "terminated",
                    **out,
                }
            )
        )
        return 0

    spark, pipeline, stream = build_pipeline(spec)
    query = pipeline.start(stream, spec["checkpoint"], available_now=available_now)
    query.awaitTermination()
    print(
        json.dumps(
            {
                "name": spec.get("name"),
                "status": "drained" if available_now else "terminated",
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
