"""DynamoDB catalog client — the AWS pointer-catalog leg.

Reference parity: ``data/Utilities.java:68-121`` builds Iceberg's
``DynamoDbCatalog`` when the connector config names it. This is that
client re-expressed on stdlib HTTP + a full AWS Signature Version 4
signer (public AWS spec — canonical request, string-to-sign, derived
signing key), speaking the DynamoDB JSON 1.0 protocol. Item layout per
the public ``apache/iceberg`` ``DynamoDbCatalog`` source (cited for
parity, re-implemented — not copied): key schema
``identifier`` (HASH) + ``namespace`` (RANGE), table properties under
``p.``-prefixed attributes (``p.metadata_location`` /
``p.previous_metadata_location``), and a ``v`` version UUID regenerated
on every write — the optimistic lock: pointer swaps are ``UpdateItem``
calls conditional on the expected ``v``, so a racing writer's stale
version fails the conditional check exactly like Iceberg's.

Pointer publication mirrors ``jdbc_catalog``/``nessie_catalog``: the
metadata location is a real exported ``metadata.json``, republished
sync-on-read when the live table moved past it.

``dynamodb_server.DynamoDbServer`` is the in-process service twin; with
credentials set it VERIFIES each request's SigV4 signature, so this
signer is tested end-to-end. Against real AWS the same client signs the
same way — only the endpoint differs.
"""

from __future__ import annotations

import json
import os
import urllib.error
import urllib.request
import uuid
from urllib.parse import urlparse

from pyspark.sql import types as T

from .catalog import NoSuchTableError, TableAlreadyExistsError
from .dynamodb_server import sign_aws_request
from .table import CommitConflict, LakehouseTable

_NAMESPACE_MARK = "NAMESPACE"


def _uri_to_path(uri: str) -> str:
    if uri.startswith("file://"):
        return uri[len("file://") :]
    return uri


class DynamoDbCatalog:
    def __init__(
        self,
        uri: str,
        warehouse: str | None = None,
        table_name: str = "iceberg",
        access_key: str | None = None,
        secret_key: str | None = None,
        region: str = "us-east-1",
        timeout: float = 10.0,
    ):
        self.uri = uri.rstrip("/")
        self.warehouse = warehouse
        self.table_name = table_name
        self.access_key = access_key
        self.secret_key = secret_key
        self.region = region
        self.timeout = timeout
        self._ensure_catalog_table()

    # ----------------------------------------------------------- protocol
    def _call(self, op: str, body: dict) -> dict:
        payload = json.dumps(body).encode()
        u = urlparse(self.uri)
        headers = {
            "Content-Type": "application/x-amz-json-1.0",
            "X-Amz-Target": f"DynamoDB_20120810.{op}",
            "Host": u.netloc,
        }
        if self.access_key and self.secret_key:
            headers.update(
                sign_aws_request(
                    u.netloc,
                    u.path,
                    headers["X-Amz-Target"],
                    headers["Content-Type"],
                    payload,
                    self.access_key,
                    self.secret_key,
                    self.region,
                    "dynamodb",
                )
            )
        req = urllib.request.Request(
            self.uri, data=payload, method="POST", headers=headers
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return json.loads(resp.read() or b"{}")
        except urllib.error.HTTPError as e:
            err = json.loads(e.read() or b"{}")
            etype = (err.get("__type") or "").rpartition("#")[2]
            if etype == "ConditionalCheckFailedException":
                raise CommitConflict(err.get("message", etype)) from None
            if etype == "ResourceInUseException":
                raise TableAlreadyExistsError(
                    err.get("message", etype)
                ) from None
            raise RuntimeError(
                f"dynamodb {op}: {e.code} {err.get('message', err)}"
            ) from None

    def _ensure_catalog_table(self) -> None:
        try:
            self._call(
                "CreateTable",
                {
                    "TableName": self.table_name,
                    "KeySchema": [
                        {"AttributeName": "identifier", "KeyType": "HASH"},
                        {"AttributeName": "namespace", "KeyType": "RANGE"},
                    ],
                    "AttributeDefinitions": [
                        {"AttributeName": "identifier", "AttributeType": "S"},
                        {"AttributeName": "namespace", "AttributeType": "S"},
                    ],
                    # the namespace-identifier GSI Iceberg's
                    # DynamoDbCatalog creates: listing a namespace is a
                    # Query on this index (real DynamoDB rejects a Query
                    # whose condition misses the index's HASH key)
                    "GlobalSecondaryIndexes": [
                        {
                            "IndexName": "namespace-identifier",
                            "KeySchema": [
                                {
                                    "AttributeName": "namespace",
                                    "KeyType": "HASH",
                                },
                                {
                                    "AttributeName": "identifier",
                                    "KeyType": "RANGE",
                                },
                            ],
                            "Projection": {"ProjectionType": "ALL"},
                        }
                    ],
                    "BillingMode": "PAY_PER_REQUEST",
                },
            )
        except TableAlreadyExistsError:
            pass  # shared catalog table — expected

    # ------------------------------------------------------------ identity
    @staticmethod
    def _ident(name: str) -> tuple[str, str]:
        parts = name.split(".")
        if len(parts) == 1:
            parts = ["default", parts[0]]
        return ".".join(parts[:-1]), parts[-1]

    def _item_key(self, ns: str, t: str) -> dict:
        return {
            "identifier": {"S": f"{ns}.{t}"},
            "namespace": {"S": ns},
        }

    def _get_item(self, ns: str, t: str) -> dict | None:
        out = self._call(
            "GetItem",
            {"TableName": self.table_name, "Key": self._item_key(ns, t)},
        )
        return out.get("Item")

    def _pointer(self, ns: str, t: str) -> tuple[str, str] | None:
        """(metadata_location, version) or None."""
        item = self._get_item(ns, t)
        if item is None:
            return None
        return item["p.metadata_location"]["S"], item["v"]["S"]

    def _insert_pointer(self, name: str, ns: str, t: str, loc: str) -> None:
        try:
            self._call(
                "PutItem",
                {
                    "TableName": self.table_name,
                    "Item": {
                        **self._item_key(ns, t),
                        "p.metadata_location": {"S": loc},
                        "v": {"S": uuid.uuid4().hex},
                        "created_at": {"S": _now_ms()},
                        "updated_at": {"S": _now_ms()},
                    },
                    "ConditionExpression": (
                        "attribute_not_exists(identifier)"
                    ),
                },
            )
        except CommitConflict:
            raise TableAlreadyExistsError(name) from None

    def _swap_pointer(
        self, ns: str, t: str, old_loc: str, old_v: str, new_loc: str
    ) -> None:
        """The catalog's commit: conditional on the version attribute —
        Iceberg DynamoDbCatalog's optimistic lock."""
        self._call(
            "UpdateItem",
            {
                "TableName": self.table_name,
                "Key": self._item_key(ns, t),
                "UpdateExpression": (
                    "SET #ml = :new, #pml = :old, #v = :newv, #ua = :ua"
                ),
                "ConditionExpression": "#v = :oldv",
                "ExpressionAttributeNames": {
                    "#ml": "p.metadata_location",
                    "#pml": "p.previous_metadata_location",
                    "#v": "v",
                    "#ua": "updated_at",
                },
                "ExpressionAttributeValues": {
                    ":new": {"S": new_loc},
                    ":old": {"S": old_loc},
                    ":newv": {"S": uuid.uuid4().hex},
                    ":oldv": {"S": old_v},
                    ":ua": {"S": _now_ms()},
                },
            },
        )

    def _publish(
        self, table: LakehouseTable, ns: str, t: str, old: tuple[str, str]
    ) -> str:
        from .iceberg_export import export_iceberg_metadata

        new = "file://" + os.path.abspath(export_iceberg_metadata(table))
        self._swap_pointer(ns, t, old[0], old[1], new)
        return new

    # ------------------------------------------------------------- surface
    def table_exists(self, name: str) -> bool:
        ns, t = self._ident(name)
        return self._pointer(ns, t) is not None

    def load_table(self, name: str) -> LakehouseTable:
        ns, t = self._ident(name)
        ptr = self._pointer(ns, t)
        if ptr is None:
            raise NoSuchTableError(name)
        with open(_uri_to_path(ptr[0])) as f:
            meta = json.load(f)
        table = LakehouseTable(_uri_to_path(meta["location"]))
        stamped = meta.get("properties", {}).get("export.source-version")
        if stamped != str(table.current_version()):
            try:
                self._publish(table, ns, t, ptr)
            except CommitConflict:
                pass  # concurrent republish is just as fresh
        return table

    def load_table_metadata(self, name: str) -> tuple[str, dict]:
        ns, t = self._ident(name)
        self.load_table(name)  # republish if stale
        ptr = self._pointer(ns, t)
        if ptr is None:
            raise NoSuchTableError(name)
        with open(_uri_to_path(ptr[0])) as f:
            return ptr[0], json.load(f)

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
                "dynamodb catalog requires iceberg.catalog.warehouse to "
                "create tables"
            )
        ns, t = self._ident(name)
        if self._pointer(ns, t) is not None:
            raise TableAlreadyExistsError(name)
        root = os.path.join(self.warehouse, *ns.split("."), t)
        try:
            table = LakehouseTable.create(
                root, schema, partition_by, properties, identifier_fields
            )
        except (CommitConflict, FileExistsError):
            raise TableAlreadyExistsError(name) from None
        from .iceberg_export import export_iceberg_metadata

        loc = "file://" + os.path.abspath(export_iceberg_metadata(table))
        self._insert_pointer(name, ns, t, loc)
        return table

    def create_table_if_not_exists(
        self,
        name: str,
        schema: T.StructType,
        partition_by: list[str] | str | None = None,
        properties: dict | None = None,
        identifier_fields: list[str] | None = None,
    ) -> LakehouseTable:
        if self.table_exists(name):
            return self.load_table(name)
        try:
            return self.create_table(
                name, schema, partition_by, properties, identifier_fields
            )
        except TableAlreadyExistsError:
            return self.load_table(name)

    def drop_table(self, name: str, purge: bool = False) -> None:
        ns, t = self._ident(name)
        ptr = self._pointer(ns, t)
        if ptr is None:
            raise NoSuchTableError(name)
        self._call(
            "DeleteItem",
            {"TableName": self.table_name, "Key": self._item_key(ns, t)},
        )
        if purge:
            import shutil

            with open(_uri_to_path(ptr[0])) as f:
                meta = json.load(f)
            shutil.rmtree(_uri_to_path(meta["location"]), ignore_errors=True)

    def rename_table(self, src: str, dst: str) -> LakehouseTable:
        """Pointer move: conditional put of the destination, then delete
        of the source (Iceberg's DynamoDbCatalog shape — the put's
        attribute_not_exists condition keeps the destination safe; a
        crash between the two ops leaves both names readable, never
        neither)."""
        sns, st = self._ident(src)
        dns, dt = self._ident(dst)
        ptr = self._pointer(sns, st)
        if ptr is None:
            raise NoSuchTableError(src)
        self._insert_pointer(dst, dns, dt, ptr[0])
        self._call(
            "DeleteItem",
            {"TableName": self.table_name, "Key": self._item_key(sns, st)},
        )
        return self.load_table(dst)

    def list_tables(self, namespace: str = "default") -> list[str]:
        out = self._call(
            "Query",
            {
                "TableName": self.table_name,
                "IndexName": "namespace-identifier",
                "KeyConditionExpression": "#ns = :ns",
                "ExpressionAttributeNames": {"#ns": "namespace"},
                "ExpressionAttributeValues": {":ns": {"S": namespace}},
            },
        )
        return sorted(
            it["identifier"]["S"]
            for it in out.get("Items", [])
            if it["identifier"]["S"] != _NAMESPACE_MARK
        )


def _now_ms() -> str:
    import time

    return str(int(time.time() * 1000))
