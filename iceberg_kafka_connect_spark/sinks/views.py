"""Iceberg SQL views over the directory warehouse.

Public-spec parity: the Iceberg *view spec* (format-version 1
``view-metadata.json``: ``view-uuid`` / ``location`` /
``current-version-id`` / ``versions`` (each with SQL ``representations``)
/ ``version-log`` / ``schemas`` / ``properties``) and the REST catalog's
``/v1/namespaces/{ns}/views`` surface (public
``rest-catalog-open-api.yaml``: CreateViewRequest / LoadViewResult /
UpdateViewRequest with ``add-view-version`` + ``set-current-view-version``).
The reference itself is a table sink, but every catalog it fronts
(``data/Utilities.java:68-121`` → RESTCatalog) serves views to the engines
downstream — an engine swap needs the surface.

Storage: one spec-shaped JSON document per view at
``<warehouse>/<ns-dirs>/<name>.view.json`` — replace-view appends a new
version and advances ``current-version-id`` (versions are retained, the
spec's version-log time travel), written atomically via tmp+rename. A
``.view.json`` file can never collide with a table (tables are
directories holding ``metadata/``).

Execution: a view's SQL runs against the warehouse's registered temp
views (``Catalog.register_views``: table ``db.t`` → temp view ``db_t``),
the same naming a user of ``spark.sql`` over this engine already uses.
"""

from __future__ import annotations

import glob
import json
import os
import time
import uuid


class NoSuchViewError(Exception):
    pass


class ViewAlreadyExistsError(Exception):
    pass


class ViewCycleError(Exception):
    """A view's SQL (transitively) references itself — layered view
    resolution would recurse forever. The message carries the cycle path."""


def referenced_identifiers(sql: str) -> set[str]:
    """Candidate relation tokens in a SQL text: every identifier-shaped
    word (including inside backticks). Over-approximating is harmless —
    the resolver intersects with the catalog's actual table/view names —
    while under-approximating would fail resolution, so no attempt is made
    to skip keywords or strings."""
    import re

    return set(re.findall(r"[A-Za-z_][A-Za-z0-9_]*", sql))


def register_relations(
    spark,
    sql: str,
    *,
    list_tables,
    read_table,
    view_names,
    view_sql,
    prefix: str = "",
    _stack: tuple = (),
) -> None:
    """Register exactly the relations ``sql`` references as temp views
    (table ``db.t`` → ``db_t``): tables directly, sibling views recursively
    in dependency order — the Iceberg view spec's engine-agnostic SQL
    representation allows layered views, so a view over a view must plan.

    Scale: O(relations the SQL references) DataFrame constructions, never
    O(tables in warehouse) — listing names stays cheap (directory walk /
    one catalog request), it's materializing unreferenced DataFrames that
    the previous register-everything approach wasted per view read.

    ``list_tables``/``view_names`` are zero-arg callables returning dotted
    names; ``read_table(name)`` returns the table's DataFrame;
    ``view_sql(name)`` the sibling view's current SQL. A reference cycle
    raises :class:`ViewCycleError` naming the path."""
    tables = list(list_tables())  # names listed once, not per level
    views = list(view_names())
    done: set[str] = set()

    def _resolve(s: str, stack: tuple) -> None:
        tokens = referenced_identifiers(s)
        for tname in tables:
            tv = (prefix + tname).replace(".", "_")
            if tv in tokens and tv not in done:
                read_table(tname).createOrReplaceTempView(tv)
                done.add(tv)
        for vname in views:
            tv = (prefix + vname).replace(".", "_")
            if tv not in tokens or tv in done:
                continue
            if vname in stack:
                raise ViewCycleError(
                    "view reference cycle: "
                    + " -> ".join([*stack[stack.index(vname):], vname])
                )
            vsql = view_sql(vname)
            _resolve(vsql, (*stack, vname))
            spark.sql(vsql).createOrReplaceTempView(tv)
            done.add(tv)

    _resolve(sql, _stack)


def _now_ms() -> int:
    return int(time.time() * 1000)


def view_path(warehouse: str, name: str) -> str:
    parts = name.split(".")
    if len(parts) == 1:
        parts = ["default", parts[0]]
    return os.path.join(warehouse, *parts[:-1], parts[-1] + ".view.json")


def _write_atomic(path: str, doc: dict) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(doc, f, indent=2)
    os.replace(tmp, path)


class _ViewLock:
    """Cross-process writer lock for one view's read-modify-write commits
    (replace / set-current / properties): an ``os.mkdir`` on
    ``<doc>.lock`` is atomic on POSIX, so two processes can't interleave
    load→mutate→write and silently drop a version. Stale locks (a writer
    died mid-commit) break after ``stale_s``. Readers never lock — the
    doc itself is replaced atomically."""

    def __init__(self, doc_path: str, timeout_s: float = 10.0, stale_s: float = 10.0):
        self.path = doc_path + ".lock"
        self.timeout_s = timeout_s
        self.stale_s = stale_s

    def __enter__(self):
        deadline = time.monotonic() + self.timeout_s
        while True:
            try:
                os.makedirs(os.path.dirname(self.path), exist_ok=True)
                os.mkdir(self.path)
                return self
            except FileExistsError:
                try:
                    if time.time() - os.path.getmtime(self.path) > self.stale_s:
                        os.rmdir(self.path)
                        continue
                except OSError:
                    continue  # raced with the holder's release
                if time.monotonic() > deadline:
                    raise TimeoutError(
                        f"view commit lock busy: {self.path}"
                    ) from None
                time.sleep(0.02)

    def __exit__(self, *exc):
        try:
            os.rmdir(self.path)
        except OSError:
            pass


def new_view_metadata(
    location: str,
    schema_json: dict,
    view_version: dict,
    properties: dict | None = None,
) -> dict:
    """Spec-shaped format-version-1 view metadata with one version."""
    vv = dict(view_version)
    vv.setdefault("version-id", 1)
    vv.setdefault("timestamp-ms", _now_ms())
    vv.setdefault("schema-id", schema_json.get("schema-id", 0))
    vv.setdefault("summary", {})
    sj = dict(schema_json)
    sj.setdefault("schema-id", vv["schema-id"])
    return {
        "view-uuid": str(uuid.uuid4()),
        "format-version": 1,
        "location": location,
        "current-version-id": vv["version-id"],
        "versions": [vv],
        "version-log": [
            {"timestamp-ms": vv["timestamp-ms"], "version-id": vv["version-id"]}
        ],
        "schemas": [sj],
        "properties": dict(properties or {}),
    }


def sql_view_version(
    sql: str,
    dialect: str = "spark",
    default_namespace: list[str] | None = None,
    version_id: int = 1,
    schema_id: int = 0,
) -> dict:
    return {
        "version-id": version_id,
        "timestamp-ms": _now_ms(),
        "schema-id": schema_id,
        "summary": {"engine-name": "iceberg-kafka-connect-spark"},
        "representations": [
            {"type": "sql", "sql": sql, "dialect": dialect}
        ],
        "default-namespace": default_namespace or ["default"],
    }


def apply_add_version(
    meta: dict,
    view_version: dict,
    schema_json: dict | None = None,
    make_current: bool = True,
) -> dict:
    """Append a view version (and optional schema) to ``meta`` in place —
    the pure half of the spec's replace-view flow, shared by the one-shot
    ``ViewStore.add_version`` and multi-update commits that must write the
    document exactly once."""
    vv = dict(view_version)
    next_id = 1 + max(v["version-id"] for v in meta["versions"])
    vv["version-id"] = next_id
    vv.setdefault("timestamp-ms", _now_ms())
    if schema_json is not None:
        sj = dict(schema_json)
        sj["schema-id"] = 1 + max(
            s.get("schema-id", 0) for s in meta["schemas"]
        )
        meta["schemas"].append(sj)
        vv["schema-id"] = sj["schema-id"]
    else:
        vv.setdefault("schema-id", meta["versions"][-1]["schema-id"])
    vv.setdefault("summary", {})
    meta["versions"].append(vv)
    if make_current:
        meta["current-version-id"] = next_id
        meta["version-log"].append(
            {"timestamp-ms": vv["timestamp-ms"], "version-id": next_id}
        )
    return vv


def apply_set_current(meta: dict, version_id: int) -> bool:
    """Advance ``current-version-id`` in place; returns whether ``meta``
    changed. ``-1`` = the version added last (the spec's same-commit ref)."""
    if version_id == -1:
        version_id = meta["versions"][-1]["version-id"]
    if version_id not in {v["version-id"] for v in meta["versions"]}:
        raise ValueError(f"view has no version {version_id}")
    if meta["current-version-id"] == version_id:
        return False
    meta["current-version-id"] = version_id
    meta["version-log"].append(
        {"timestamp-ms": _now_ms(), "version-id": version_id}
    )
    return True


def apply_update_properties(
    meta: dict, updates: dict | None, removals: list | None = None
) -> None:
    for k in removals or []:
        meta["properties"].pop(k, None)
    meta["properties"].update(updates or {})


class ViewStore:
    """View CRUD over a warehouse directory — the piece both the directory
    Catalog and the REST server share."""

    def __init__(self, warehouse: str):
        self.warehouse = warehouse

    # ------------------------------------------------------------- basics
    def exists(self, name: str) -> bool:
        return os.path.isfile(view_path(self.warehouse, name))

    def load(self, name: str) -> tuple[str, dict]:
        p = view_path(self.warehouse, name)
        if not os.path.isfile(p):
            raise NoSuchViewError(name)
        with open(p) as f:
            return p, json.load(f)

    def drop(self, name: str) -> None:
        p = view_path(self.warehouse, name)
        if not os.path.isfile(p):
            raise NoSuchViewError(name)
        os.unlink(p)

    def list(self, namespace: str | None = None) -> list[str]:
        out = []
        for dirpath, dirnames, files in os.walk(self.warehouse):
            # view docs live at namespace level, never inside a table —
            # prune table directories BEFORE descending, so listing stays
            # O(namespaces + views). Prune the child, not the parent:
            # skipping the parent's own file scan would hide sibling
            # *.view.json whenever any child is named `metadata`. A table
            # is identified by LakehouseTable.exists's exact signature
            # (`metadata/v*.json`), not the mere presence of a `metadata`
            # child — a namespace holding a TABLE named `metadata` has
            # `<ns>/metadata/metadata/` but no `<ns>/metadata/v*.json`.
            dirnames[:] = [
                d
                for d in dirnames
                if not glob.glob(
                    os.path.join(dirpath, d, "metadata", "v*.json")
                )
            ]
            for fn in files:
                if not fn.endswith(".view.json"):
                    continue
                rel = os.path.relpath(dirpath, self.warehouse)
                ns = [] if rel == "." else rel.split(os.sep)
                full = ".".join([*ns, fn[: -len(".view.json")]])
                if namespace is None or full.rsplit(".", 1)[0] == namespace:
                    out.append(full)
        return sorted(out)

    def rename(self, src: str, dst: str) -> None:
        sp = view_path(self.warehouse, src)
        dp = view_path(self.warehouse, dst)
        if not os.path.isfile(sp):
            raise NoSuchViewError(src)
        if os.path.isfile(dp):
            raise ViewAlreadyExistsError(dst)
        os.makedirs(os.path.dirname(dp), exist_ok=True)
        os.rename(sp, dp)

    # -------------------------------------------------------------- create
    def create(
        self,
        name: str,
        schema_json: dict,
        view_version: dict,
        properties: dict | None = None,
    ) -> dict:
        p = view_path(self.warehouse, name)
        if os.path.isfile(p):
            raise ViewAlreadyExistsError(name)
        meta = new_view_metadata(
            "file://" + os.path.abspath(os.path.dirname(p)),
            schema_json,
            view_version,
            properties,
        )
        _write_atomic(p, meta)
        return meta

    # -------------------------------------------------------- replace/commit
    def add_version(
        self,
        name: str,
        view_version: dict,
        schema_json: dict | None = None,
        make_current: bool = True,
    ) -> dict:
        """The spec's replace-view flow: ``add-view-version`` (+ optional
        ``add-schema``) then ``set-current-view-version``. Old versions are
        retained in ``versions``/``version-log`` — the spec's history.
        Serialized against concurrent writers by the per-view lock, so two
        replaces can't both read versions=[..,N] and silently drop one."""
        with _ViewLock(view_path(self.warehouse, name)):
            return self._add_version_locked(
                name, view_version, schema_json, make_current
            )

    def _add_version_locked(
        self,
        name: str,
        view_version: dict,
        schema_json: dict | None = None,
        make_current: bool = True,
    ) -> dict:
        p, meta = self.load(name)
        apply_add_version(meta, view_version, schema_json, make_current)
        _write_atomic(p, meta)
        return meta

    def set_current(self, name: str, version_id: int) -> dict:
        with _ViewLock(view_path(self.warehouse, name)):
            return self._set_current_locked(name, version_id)

    def _set_current_locked(self, name: str, version_id: int) -> dict:
        p, meta = self.load(name)
        if apply_set_current(meta, version_id):
            _write_atomic(p, meta)
        return meta

    def update_properties(
        self, name: str, updates: dict | None, removals: list | None = None
    ) -> dict:
        with _ViewLock(view_path(self.warehouse, name)):
            return self._update_properties_locked(name, updates, removals)

    def _update_properties_locked(
        self, name: str, updates: dict | None, removals: list | None = None
    ) -> dict:
        p, meta = self.load(name)
        apply_update_properties(meta, updates, removals)
        _write_atomic(p, meta)
        return meta

    # ------------------------------------------------- multi-update commits
    def locked(self, name: str) -> _ViewLock:
        """The per-view cross-process writer lock, for callers composing a
        multi-update commit (load → apply_* in memory → write once)."""
        return _ViewLock(view_path(self.warehouse, name))

    def write(self, name: str, meta: dict) -> None:
        """Replace the view document atomically. Hold ``locked(name)``
        around the enclosing load→apply→write."""
        _write_atomic(view_path(self.warehouse, name), meta)

    # ----------------------------------------------------------- execution
    @staticmethod
    def current_sql(meta: dict, dialect: str | None = None) -> str:
        cur = next(
            v
            for v in meta["versions"]
            if v["version-id"] == meta["current-version-id"]
        )
        reps = [r for r in cur.get("representations", []) if r["type"] == "sql"]
        if dialect is not None:
            exact = [r for r in reps if r.get("dialect") == dialect]
            reps = exact or reps  # spec: fall back to any SQL representation
        if not reps:
            raise ValueError("view has no SQL representation")
        return reps[0]["sql"]
