"""Record routing (reference §2.3: channel/Worker.java:96-158).

Three modes, identical semantics, Spark-first execution:

- broadcast (R1, Worker.java:103-113): no route field — every record goes to
  every configured table. In Spark this is one filtered write per table from
  the SAME cached micro-batch DataFrame (scan once, fan out).
- static regex (R2, Worker.java:115-132): each table declares a route-regex;
  a record goes to every table whose regex matches the route-field value;
  non-matching records are dropped. Spark: ``df.filter(col.rlike(rx))`` per
  table — a pushed-down predicate, not a per-record loop.
- dynamic (R3, Worker.java:135-144): the target table name IS the lowercased
  route-field value; records naming unknown tables are skipped. Spark: one
  pass computing the target name, then per-table filters (the set of
  distinct targets is tiny compared to the data).

At scale the batch is persisted once and each route is a column-pruned,
predicate-pushed pass over the cached data — no shuffle at all.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class RouteSpec:
    """Per-table routing config (TableSinkConfig.java:25-53)."""

    table: str
    route_regex: str | None = None


@dataclass
class RoutingConfig:
    tables: list[RouteSpec] = field(default_factory=list)
    route_field: str | None = None
    dynamic: bool = False

    def mode(self) -> str:
        if self.dynamic:
            return "dynamic"
        if self.route_field is None:
            return "broadcast"
        return "static"


def route_field_col(route_field: str) -> Column:
    """Dotted-path route-field extraction (Utilities.java:123-155):
    ``a.b.c`` traverses nested structs."""
    return F.col(route_field)


def static_route_filter(route_field: str, regex: str) -> Column:
    """R2: case-sensitive unanchored regex match, null route values drop
    (Worker.java:120-129 uses java Pattern.matcher().matches() → anchored)."""
    return F.col(route_field).isNotNull() & F.col(route_field).rlike(f"^(?:{regex})$")


def dynamic_target_col(route_field: str) -> Column:
    """R3: target table = lowercased route value (Worker.java:137)."""
    return F.lower(route_field_col(route_field))


def plan_routes(df: DataFrame, cfg: RoutingConfig) -> dict[str, DataFrame]:
    """Return {table_name: routed DataFrame}. Caller persists ``df`` first
    when len(result) > 1 so the source is scanned once."""
    mode = cfg.mode()
    if mode == "broadcast":
        return {spec.table: df for spec in cfg.tables}
    if mode == "static":
        out = {}
        for spec in cfg.tables:
            if spec.route_regex is None:
                continue
            out[spec.table] = df.filter(
                static_route_filter(cfg.route_field, spec.route_regex)
            )
        return out
    # dynamic: known tables come from the catalog; unknown targets skipped
    # (IcebergWriterFactory.java:56-60 no-op writer)
    known = {spec.table.lower() for spec in cfg.tables}
    target = dynamic_target_col(cfg.route_field)
    return {
        t: df.filter(target == F.lit(t)) for t in sorted(known)
    }
