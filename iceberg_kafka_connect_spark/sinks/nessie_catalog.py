"""Nessie catalog client — the ``iceberg.catalog.type=nessie`` leg.

Reference parity: ``data/Utilities.java:68-121`` loads
``org.apache.iceberg.nessie.NessieCatalog`` for ``type=nessie`` configs.
This is that client re-expressed against the public Nessie REST API v2
(see ``nessie_server.py`` for the service side and the semantics notes):
the catalog stores one ``ICEBERG_TABLE`` content (a metadata-location
POINTER) per table key per reference, commits move the pointer with
Nessie's key-level CAS, and the VERSIONED part — branches, tags, merge —
applies to the whole catalog, not one table:

- ``create_branch("audit")`` then ``on_ref("audit")`` gives a catalog
  view where every table pointer is frozen at the branch point; commits
  there never disturb ``main``.
- ``merge("audit")`` lands every pointer the branch moved back on main
  in ONE atomic commit — cross-table transactional publish, the thing a
  per-table catalog cannot express.

Pointer publication mirrors ``jdbc_catalog``: the metadata location is a
real Iceberg metadata.json (``iceberg_export``), re-exported
sync-on-read whenever the live table moved past the published pointer,
so spec-conformant readers that only follow the catalog stay current.
"""

from __future__ import annotations

import json
import os
import urllib.error
import urllib.parse
import urllib.request
import uuid

from pyspark.sql import types as T

from .catalog import NoSuchTableError, TableAlreadyExistsError
from .table import CommitConflict, LakehouseTable


def _uri_to_path(uri: str) -> str:
    if uri.startswith("file://"):
        return uri[len("file://") :]
    return uri


class NessieCatalog:
    def __init__(
        self,
        uri: str,
        warehouse: str | None = None,
        ref: str = "main",
        token: str | None = None,
        timeout: float = 10.0,
    ):
        self.uri = uri.rstrip("/")
        self.warehouse = warehouse
        self.ref = ref
        self.token = token
        self.timeout = timeout
        # config handshake — fails loud and early when the service is
        # unreachable (the missing-runtime error contract)
        self._get("config")

    # ---------------------------------------------------------------- http
    def _req(self, method: str, path: str, body: dict | None = None) -> dict:
        data = json.dumps(body).encode() if body is not None else None
        req = urllib.request.Request(
            f"{self.uri}/{path}", data=data, method=method
        )
        req.add_header("Content-Type", "application/json")
        if self.token:
            req.add_header("Authorization", f"Bearer {self.token}")
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return json.loads(resp.read() or b"{}")
        except urllib.error.HTTPError as e:
            payload = e.read().decode(errors="replace")
            if e.code == 409:
                raise CommitConflict(payload) from None
            if e.code == 404:
                raise KeyError(payload) from None
            raise RuntimeError(f"nessie {method} {path}: {e.code} {payload}")

    def _get(self, path: str) -> dict:
        return self._req("GET", path)

    # ------------------------------------------------------------ identity
    @staticmethod
    def _key(name: str) -> str:
        parts = name.split(".")
        if len(parts) == 1:
            parts = ["default", parts[0]]
        return ".".join(parts)

    def _head(self) -> str:
        return self._get(f"trees/{urllib.parse.quote(self.ref)}")[
            "reference"
        ]["hash"]

    def _content(self, key: str) -> dict | None:
        try:
            return self._get(
                f"trees/{urllib.parse.quote(self.ref)}/contents/"
                f"{urllib.parse.quote(key)}"
            )["content"]
        except KeyError:
            return None

    def _commit(
        self,
        ops: list[dict],
        message: str,
        expected: str | None = None,
    ) -> dict:
        expected = expected or self._head()
        ref = urllib.parse.quote(f"{self.ref}@{expected}")
        return self._req(
            "POST",
            f"trees/{ref}/history/commit",
            {"commitMeta": {"message": message}, "operations": ops},
        )

    def _put_op(self, key: str, content: dict) -> dict:
        return {
            "type": "PUT",
            "key": {"elements": key.split(".")},
            "content": content,
        }

    def _publish(self, key: str, table: LakehouseTable, content: dict | None):
        """(Re-)export the table and commit the moved pointer."""
        from .iceberg_export import export_iceberg_metadata

        loc = export_iceberg_metadata(table)
        # the content's snapshotId must equal the exported metadata.json's
        # current-snapshot-id (a Nessie-aware reader cross-checks the two;
        # the exporter remaps internal sequence numbers to Iceberg
        # snapshot ids, so read the published value, don't recompute it)
        with open(loc) as f:
            exported_snap = json.load(f).get("current-snapshot-id", -1)
        body = {
            "type": "ICEBERG_TABLE",
            "id": (content or {}).get("id") or str(uuid.uuid4()),
            "metadataLocation": "file://" + os.path.abspath(loc),
            "snapshotId": int(exported_snap if exported_snap is not None else -1),
            "schemaId": 0,
            "specId": 0,
            "sortOrderId": 0,
        }
        self._commit(
            [self._put_op(key, body)],
            f"publish {key} -> {os.path.basename(loc)}",
        )

    # ------------------------------------------------------------- surface
    def table_exists(self, name: str) -> bool:
        return self._content(self._key(name)) is not None

    def load_table(self, name: str) -> LakehouseTable:
        key = self._key(name)
        content = self._content(key)
        if content is None:
            raise NoSuchTableError(name)
        with open(_uri_to_path(content["metadataLocation"])) as f:
            meta = json.load(f)
        table = LakehouseTable(_uri_to_path(meta["location"]))
        stamped = meta.get("properties", {}).get("export.source-version")
        if stamped != str(table.current_version()):
            try:
                self._publish(key, table, content)
            except CommitConflict:
                pass  # a concurrent republish is just as fresh
        return table

    def load_table_metadata(self, name: str) -> tuple[str, dict]:
        """(metadata-location, Iceberg metadata JSON) as published — the
        external-engine view."""
        self.load_table(name)  # republish if stale
        content = self._content(self._key(name))
        if content is None:
            raise NoSuchTableError(name)
        loc = content["metadataLocation"]
        with open(_uri_to_path(loc)) as f:
            return loc, json.load(f)

    def create_table(
        self,
        name: str,
        schema: T.StructType,
        partition_by: list[str] | str | None = None,
        properties: dict | None = None,
        identifier_fields: list[str] | None = None,
    ) -> LakehouseTable:
        if not self.warehouse:
            raise ValueError(
                "nessie catalog requires iceberg.catalog.warehouse to "
                "create tables"
            )
        key = self._key(name)
        if self._content(key) is not None:
            raise TableAlreadyExistsError(name)
        root = os.path.join(self.warehouse, *key.split("."))
        try:
            table = LakehouseTable.create(
                root, schema, partition_by, properties, identifier_fields
            )
        except (CommitConflict, FileExistsError):
            raise TableAlreadyExistsError(name) from None
        try:
            self._publish(key, table, None)
        except CommitConflict:
            raise TableAlreadyExistsError(name) from None
        return table

    def create_table_if_not_exists(
        self,
        name: str,
        schema: T.StructType,
        partition_by: list[str] | str | None = None,
        properties: dict | None = None,
        identifier_fields: list[str] | None = None,
    ) -> LakehouseTable:
        """The streaming pipeline's auto-create contract: idempotent
        under races (the key-level CAS turns a lost create into
        TableAlreadyExists, which loads the winner's table)."""
        if self.table_exists(name):
            return self.load_table(name)
        try:
            return self.create_table(
                name, schema, partition_by, properties, identifier_fields
            )
        except TableAlreadyExistsError:
            return self.load_table(name)

    def register_table(self, name: str, metadata_location: str):
        """Iceberg ``registerTable``: adopt an existing metadata tree."""
        from .iceberg_import import import_iceberg_table

        if not self.warehouse:
            raise ValueError(
                "nessie catalog requires iceberg.catalog.warehouse to "
                "register tables"
            )
        key = self._key(name)
        if self._content(key) is not None:
            raise TableAlreadyExistsError(name)
        table = import_iceberg_table(
            metadata_location,
            os.path.join(self.warehouse, *key.split(".")),
        )
        self._publish(key, table, None)
        return table

    def drop_table(self, name: str, purge: bool = False) -> None:
        key = self._key(name)
        content = self._content(key)
        if content is None:
            raise NoSuchTableError(name)
        self._commit(
            [{"type": "DELETE", "key": {"elements": key.split(".")}}],
            f"drop {key}",
        )
        if purge:
            import shutil

            with open(_uri_to_path(content["metadataLocation"])) as f:
                meta = json.load(f)
            shutil.rmtree(_uri_to_path(meta["location"]), ignore_errors=True)

    def rename_table(self, src: str, dst: str) -> LakehouseTable:
        skey, dkey = self._key(src), self._key(dst)
        content = self._content(skey)
        if content is None:
            raise NoSuchTableError(src)
        if self._content(dkey) is not None:
            raise TableAlreadyExistsError(dst)
        # one atomic commit moves the pointer — Nessie renames are
        # transactional by construction
        self._commit(
            [
                {"type": "DELETE", "key": {"elements": skey.split(".")}},
                self._put_op(dkey, content),
            ],
            f"rename {skey} -> {dkey}",
        )
        return self.load_table(dst)

    def list_tables(self) -> list[str]:
        out = self._get(f"trees/{urllib.parse.quote(self.ref)}/entries")
        return sorted(
            ".".join(e["name"]["elements"]) for e in out["entries"]
        )

    # ------------------------------------------------------ versioned part
    def create_branch(self, name: str, from_ref: str | None = None) -> dict:
        src = from_ref or self.ref
        h = self._get(f"trees/{urllib.parse.quote(src)}")["reference"][
            "hash"
        ]
        return self._req(
            "POST",
            f"trees?name={urllib.parse.quote(name)}&type=BRANCH",
            {"type": "BRANCH", "name": src, "hash": h},
        )["reference"]

    def create_tag(self, name: str, from_ref: str | None = None) -> dict:
        src = from_ref or self.ref
        h = self._get(f"trees/{urllib.parse.quote(src)}")["reference"][
            "hash"
        ]
        return self._req(
            "POST",
            f"trees?name={urllib.parse.quote(name)}&type=TAG",
            {"type": "TAG", "name": src, "hash": h},
        )["reference"]

    def on_ref(self, ref: str) -> "NessieCatalog":
        """A catalog view pinned to another reference — same service,
        same warehouse, different pointer universe."""
        c = object.__new__(NessieCatalog)
        c.uri, c.warehouse, c.ref = self.uri, self.warehouse, ref
        c.token, c.timeout = self.token, self.timeout
        return c

    def merge(self, from_ref: str, from_hash: str | None = None) -> dict:
        """Merge ``from_ref``'s pointer moves into THIS catalog's ref —
        every table the branch changed publishes atomically, key-level
        conflicts raise CommitConflict."""
        head = self._head()
        ref = urllib.parse.quote(f"{self.ref}@{head}")
        return self._req(
            "POST",
            f"trees/{ref}/history/merge",
            {"fromRefName": from_ref, **(
                {"fromHash": from_hash} if from_hash else {}
            )},
        )

    def history(self) -> list[dict]:
        return self._get(f"trees/{urllib.parse.quote(self.ref)}/history")[
            "logEntries"
        ]
