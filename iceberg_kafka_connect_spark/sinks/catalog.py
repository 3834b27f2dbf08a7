"""Catalog — table discovery/creation over a warehouse directory.

Reference parity: data/Utilities.java:68-121 builds any Iceberg catalog from
``iceberg.catalog.*`` props; data/IcebergWriterFactory.java:69-117 implements
auto-create with retry-on-race. Here the warehouse is a directory tree
``<root>/<db>/<table>``; creation races are resolved by the table's
version-0 commit (O_EXCL hard link) — first writer wins, the loser loads.
"""

from __future__ import annotations

import os

from pyspark.sql import types as T

from .table import CommitConflict, LakehouseTable


class NoSuchTableError(Exception):
    pass


class Catalog:
    def __init__(self, warehouse: str):
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)

    def _path(self, name: str) -> str:
        # name = "db.table" or bare "table" (default db)
        parts = name.split(".")
        if len(parts) == 1:
            parts = ["default", parts[0]]
        return os.path.join(self.warehouse, *parts)

    def table_exists(self, name: str) -> bool:
        return LakehouseTable.exists(self._path(name))

    def load_table(self, name: str) -> LakehouseTable:
        if not self.table_exists(name):
            raise NoSuchTableError(name)
        return LakehouseTable(self._path(name))

    def create_table(
        self,
        name: str,
        schema: T.StructType,
        partition_by: list[str] | str | None = None,
        properties: dict | None = None,
        identifier_fields: list[str] | None = None,
    ) -> LakehouseTable:
        return LakehouseTable.create(
            self._path(name), schema, partition_by, properties, identifier_fields
        )

    def list_tables(self) -> list[str]:
        import glob as globmod

        out = []
        for meta in globmod.glob(
            os.path.join(self.warehouse, "*", "*", "metadata")
        ):
            tdir = os.path.dirname(meta)
            db = os.path.basename(os.path.dirname(tdir))
            out.append(f"{db}.{os.path.basename(tdir)}")
        return sorted(out)

    def register_views(self, spark, prefix: str = "") -> list[str]:
        """Expose every table as a temp view so users can spark.sql over the
        warehouse: view name = ``<db>_<table>`` (dots aren't valid in temp
        view names)."""
        registered = []
        for name in self.list_tables():
            view = (prefix + name).replace(".", "_")
            self.load_table(name).read(spark).createOrReplaceTempView(view)
            registered.append(view)
        return registered

    def create_table_if_not_exists(
        self,
        name: str,
        schema: T.StructType,
        partition_by: list[str] | str | None = None,
        properties: dict | None = None,
        identifier_fields: list[str] | None = None,
    ) -> LakehouseTable:
        """Auto-create with race tolerance (IcebergWriterFactory.java:69-117:
        create, and on a concurrent-create conflict, load instead)."""
        if self.table_exists(name):
            return self.load_table(name)
        try:
            return self.create_table(
                name, schema, partition_by, properties, identifier_fields
            )
        except (CommitConflict, FileExistsError):
            return self.load_table(name)
