"""Delta Lake table import: transaction-log replay -> lakehouse table.

Migration tooling for the other common lakehouse format: reads a Delta
table's ``_delta_log`` per the PUBLIC Delta transaction protocol
(PROTOCOL.md — checkpoint parquet + ordered JSON commits of
add/remove/metaData/protocol actions), reconstructs the live file set
at a version, and registers those parquet files in a LakehouseTable via
``add_files`` — the same zero-copy shape as the Iceberg ``snapshot``
migration (no data rewrite, one metadata commit; the only sane move at
100 TB). Delta's ``schemaString`` is Spark schema JSON, so the schema
maps losslessly.

Honest scope (refused loudly, never silently wrong):
- protocol ``minReaderVersion`` > 1 is accepted ONLY when every
  ``readerFeatures`` entry is in the supported set (none today —
  deletion vectors, column mapping, and v2 checkpoints all change how
  the file set or the bytes must be interpreted);
- ``add`` entries carrying ``deletionVector`` refuse;
- partitioned Delta tables refuse for now (partition values live in
  the log, not the directory layout our identity-partition reader
  derives them from).
"""

from __future__ import annotations

import glob as globmod
import json
import os
from typing import Any

from pyspark.sql import types as T


class DeltaImportUnsupported(ValueError):
    pass


class DeltaImportError(ValueError):
    pass


_SUPPORTED_READER_FEATURES: frozenset[str] = frozenset()


def _log_dir(table_path: str) -> str:
    d = os.path.join(table_path, "_delta_log")
    if not os.path.isdir(d):
        raise DeltaImportError(f"{table_path!r} has no _delta_log")
    return d


def _commit_versions(log_dir: str) -> list[int]:
    out = []
    for p in globmod.glob(os.path.join(log_dir, "*.json")):
        stem = os.path.basename(p).split(".")[0]
        if stem.isdigit():
            out.append(int(stem))
    return sorted(out)


def _apply_action(state: dict, action: dict) -> None:
    if "add" in action:
        a = action["add"]
        if a.get("deletionVector"):
            raise DeltaImportUnsupported(
                "add entry carries a deletionVector — DV-bearing Delta "
                "tables are not importable (compact the source first)"
            )
        state["adds"][a["path"]] = a
    elif "remove" in action:
        state["adds"].pop(action["remove"]["path"], None)
    elif "metaData" in action:
        state["metaData"] = action["metaData"]
    elif "protocol" in action:
        state["protocol"] = action["protocol"]
    # commitInfo / txn / cdc: no table-state effect for import


def _read_checkpoint(log_dir: str, version: int, parts: int | None) -> list[dict]:
    """Checkpoint parquet rows -> action dicts (one non-null member per
    row, per the protocol's checkpoint schema)."""
    import pyarrow.parquet as pq

    if parts:
        files = [
            os.path.join(
                log_dir,
                f"{version:020d}.checkpoint.{i + 1:010d}.{parts:010d}.parquet",
            )
            for i in range(parts)
        ]
    else:
        files = [os.path.join(log_dir, f"{version:020d}.checkpoint.parquet")]
    actions: list[dict] = []
    for fp in files:
        if not os.path.exists(fp):
            raise DeltaImportError(f"checkpoint part missing: {fp}")
        tbl = pq.read_table(fp)
        for row in tbl.to_pylist():
            for key in ("protocol", "metaData", "add", "remove"):
                member = row.get(key)
                if member is not None:
                    actions.append({key: _prune_nones(member)})
    return actions


def _prune_nones(d: Any) -> Any:
    if isinstance(d, dict):
        return {k: _prune_nones(v) for k, v in d.items() if v is not None}
    return d


def read_delta_log(table_path: str, version: int | None = None) -> dict:
    """Replay the log to ``version`` (default: latest commit). Returns
    ``{"version", "schema": StructType, "partition_columns", "files":
    [absolute parquet paths], "adds": {path: add-action}}``."""
    log_dir = _log_dir(table_path)
    versions = _commit_versions(log_dir)
    if version is None:
        if not versions:
            raise DeltaImportError(f"{table_path!r}: empty _delta_log")
        version = versions[-1]
    elif versions and version > versions[-1]:
        raise DeltaImportError(
            f"requested version {version} beyond latest commit "
            f"{versions[-1]}"
        )
    state: dict = {"adds": {}, "metaData": None, "protocol": None}
    start = 0
    lc_path = os.path.join(log_dir, "_last_checkpoint")
    if os.path.exists(lc_path):
        with open(lc_path) as f:
            lc = json.load(f)
        cv = int(lc["version"])
        if cv <= version:
            for action in _read_checkpoint(log_dir, cv, lc.get("parts")):
                _apply_action(state, action)
            start = cv + 1
    # contiguity: replaying across a GAP silently drops the missing
    # commit's removes/adds — real Delta readers refuse, so do we
    expected = start
    replay = [v for v in versions if start <= v <= version]
    for v in replay:
        if v != expected:
            raise DeltaImportError(
                f"commit versions are not contiguous: expected "
                f"{expected:020d}.json, found {v:020d}.json"
            )
        expected += 1
    if start <= version and (not replay or replay[-1] != version):
        raise DeltaImportError(
            f"commit {version:020d}.json missing (latest contiguous: "
            f"{replay[-1] if replay else start - 1})"
        )
    for v in replay:
        with open(os.path.join(log_dir, f"{v:020d}.json")) as f:
            for line in f:
                line = line.strip()
                if line:
                    _apply_action(state, json.loads(line))
    proto = state["protocol"] or {}
    reader_v = proto.get("minReaderVersion", 1)
    features = set(proto.get("readerFeatures") or [])
    unsupported = features - _SUPPORTED_READER_FEATURES
    if reader_v > 1 and (reader_v != 3 or unsupported):
        raise DeltaImportUnsupported(
            f"protocol minReaderVersion={reader_v} with readerFeatures="
            f"{sorted(features)} — unsupported: {sorted(unsupported) or reader_v}"
        )
    md = state["metaData"]
    if md is None:
        raise DeltaImportError(f"{table_path!r}: no metaData action in log")
    if (md.get("format") or {}).get("provider", "parquet") != "parquet":
        raise DeltaImportUnsupported(
            f"format.provider={md['format'].get('provider')!r} (parquet only)"
        )
    part_cols = md.get("partitionColumns") or []
    if part_cols:
        raise DeltaImportUnsupported(
            f"partitioned Delta table (partitionColumns={part_cols}) — "
            "import the compacted/unpartitioned form"
        )
    schema = T.StructType.fromJson(json.loads(md["schemaString"]))
    files = [
        os.path.join(table_path, a["path"]) for a in state["adds"].values()
    ]
    missing = [p for p in files if not os.path.exists(p)]
    if missing:
        raise DeltaImportError(
            f"live data files missing on disk: {missing[:3]}"
        )
    return {
        "version": version,
        "schema": schema,
        "partition_columns": part_cols,
        "files": sorted(files),
        "adds": state["adds"],
    }


def import_delta_table(
    table_path: str, dest_root: str, version: int | None = None
):
    """Zero-copy migrate: live files at ``version`` register in a new
    LakehouseTable (snapshot summary records the source + version for
    lineage). Row counts cross-check the log's add-action stats when
    present."""
    from .table import LakehouseTable

    log = read_delta_log(table_path, version)
    t = LakehouseTable.create(dest_root, log["schema"])
    t.add_files(log["files"])
    # cross-check: the log's add.stats numRecords (when present) must
    # equal the footer-derived record counts add_files recorded
    logged = 0
    have_stats = True
    for a in log["adds"].values():
        st = a.get("stats")
        if not st:
            have_stats = False
            break
        logged += json.loads(st).get("numRecords", 0)
    if have_stats and log["adds"]:
        data_files, _ = t.live_files()
        actual = sum(
            (f.get("stats") or {}).get("rows") or 0 for f in data_files
        )
        if actual != logged:
            raise DeltaImportError(
                f"row-count mismatch: delta log claims {logged}, parquet "
                f"footers say {actual}"
            )
    t.set_properties(
        {
            "migrated.from": "delta",
            "migrated.source": os.path.abspath(table_path),
            "migrated.source-version": str(log["version"]),
        }
    )
    return t
