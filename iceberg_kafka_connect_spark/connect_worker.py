"""Kafka Connect worker twin: connector lifecycle over SinkPipeline.

The reference is DEPLOYED through the Kafka Connect REST API — its
README's quickstart is ``PUT /connectors/events-sink/config`` with
``{"connector.class": "io.tabular.iceberg.connect.IcebergSinkConnector",
...}`` (`README.md:213-225`). This module is that operational surface
re-expressed over Structured Streaming: a worker that accepts the SAME
config maps verbatim, builds the SinkPipeline (config.from_properties +
catalog selection + SMT chain + converter stages — every key the
connector parses), runs it as a continuous streaming query, and manages
the Connect lifecycle states (RUNNING / PAUSED / FAILED-with-trace /
STOPPED; pause stops the query and resume restarts it from the same
checkpoint, so no records are lost or duplicated across the gap —
exactly-once carries over the lifecycle operations).

``connect_server.py`` (package root) wraps this in the Connect REST
protocol.
The worker's source is pluggable: real Kafka via ``bootstrap.servers``
(the production path) or the file-based kafka-shaped twin rooted at
``files_root`` (topic name -> directory), which is how the sandbox
exercises the full lifecycle without a broker.
"""

from __future__ import annotations

import threading
import traceback
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import SparkSession

SINK_CLASS = "io.tabular.iceberg.connect.IcebergSinkConnector"


class ConnectError(ValueError):
    def __init__(self, code: int, message: str) -> None:
        super().__init__(message)
        self.code = code
        self.message = message


@dataclass
class _Connector:
    name: str
    config: dict[str, str]
    pipeline: Any = None
    stream_factory: Callable[[], Any] | None = None
    checkpoint: str = ""
    query: Any = None
    state: str = "RUNNING"
    trace: str | None = None
    topics: list[str] = field(default_factory=list)


def validate_config(config: dict[str, str]) -> list[str]:
    """Connect's config-validation surface: returns human-readable
    errors (empty = valid). Checks the keys the connector itself
    validates plus the converter/transform sub-configs."""
    errs = []
    cls = config.get("connector.class")
    if cls != SINK_CLASS:
        errs.append(
            f"connector.class must be {SINK_CLASS!r}, got {cls!r}"
        )
    if not config.get("topics") and not config.get("topics.regex"):
        errs.append("one of topics / topics.regex is required")
    try:
        from .config import from_properties, parse_transform_chain

        from_properties(config)
        parse_transform_chain(config)
    except (ValueError, KeyError) as exc:
        errs.append(str(exc))
    try:
        from .sources.confluent import (
            key_converter_from_properties,
            value_converter_from_properties,
        )

        value_converter_from_properties(config)
        key_converter_from_properties(config)
    except ValueError as exc:
        errs.append(str(exc))
    tm = config.get("tasks.max", "1")
    if not tm.isdigit() or int(tm) < 1:
        errs.append(f"tasks.max must be a positive integer, got {tm!r}")
    return errs


class ConnectWorker:
    """One worker process managing named connectors (the distributed
    herd's coordination — rebalancing, config topics — collapses into
    the Spark driver exactly like the commit coordination did)."""

    def __init__(
        self,
        spark: SparkSession,
        warehouse: str,
        checkpoint_root: str,
        files_root: str | None = None,
        bootstrap_servers: str | None = None,
        binary_value: bool = False,
        worker_id: str = "worker-0",
    ) -> None:
        self.spark = spark
        self.warehouse = warehouse
        self.checkpoint_root = checkpoint_root
        self.files_root = files_root
        self.bootstrap_servers = bootstrap_servers
        self.binary_value = binary_value
        self.worker_id = worker_id
        self._lock = threading.Lock()
        self._connectors: dict[str, _Connector] = {}
        # Connect persists connector configs (the config topic); the
        # twin persists them under checkpoint_root and resumes every
        # stored connector from its checkpoint — exactly-once carries
        # across worker restarts
        self._restore()

    # ------------------------------------------------------------ build
    def _build(self, name: str, config: dict[str, str]) -> _Connector:
        errs = validate_config(config)
        if errs:
            raise ConnectError(400, "; ".join(errs))
        from .config import from_properties, parse_transform_chain
        from .sources.confluent import (
            key_converter_from_properties,
            value_converter_from_properties,
        )
        from .streaming import SinkPipeline

        cfg = from_properties(config)
        if any(k.startswith("iceberg.catalog.") for k in config):
            from .sinks.catalog import catalog_from_properties

            catalog = catalog_from_properties(config)
        else:
            from .sinks import Catalog

            catalog = Catalog(self.warehouse)
        value_schema = None
        if config.get("value.schema.ddl"):
            from pyspark.sql import types as T

            value_schema = T.StructType.fromDDL(config["value.schema.ddl"])
        pipeline = SinkPipeline(
            catalog,
            cfg,
            pipeline_id=name,
            value_schema=value_schema,
            transforms=parse_transform_chain(config),
            value_converter=value_converter_from_properties(config),
            key_converter=key_converter_from_properties(config),
        )
        topics = self._resolve_topics(config)

        def stream_factory():
            if self.bootstrap_servers:
                from .sources.stream import kafka_stream_source

                return kafka_stream_source(
                    self.spark,
                    self.bootstrap_servers,
                    config.get("topics") or None,
                    subscribe_pattern=config.get("topics.regex"),
                    kafka_props=cfg.kafka_props or None,
                )
            if self.files_root is None:
                raise ConnectError(
                    500, "worker has neither bootstrap.servers nor a "
                    "files_root to read topics from"
                )
            if not topics:
                raise ConnectError(
                    400, "topics.regex matched no topic directories "
                    f"under {self.files_root!r}"
                )
            from .sources.stream import file_stream_source

            # file twin: each topic is a directory under files_root;
            # multiple topics read as a glob
            path = (
                f"{self.files_root}/{topics[0]}"
                if len(topics) == 1
                else f"{self.files_root}/{{{','.join(topics)}}}"
            )
            return file_stream_source(
                self.spark, path, binary_value=self.binary_value
            )

        return _Connector(
            name=name,
            config=dict(config),
            pipeline=pipeline,
            stream_factory=stream_factory,
            checkpoint=f"{self.checkpoint_root}/{name}",
            topics=topics,
        )

    def _start(self, c: _Connector) -> None:
        try:
            # cadence parity: the connector's own
            # iceberg.control.commit.interval-ms IS the trigger (T1)
            c.query = c.pipeline.start(c.stream_factory(), c.checkpoint)
            c.state = "RUNNING"
            c.trace = None
        except Exception:
            c.state = "FAILED"
            c.trace = traceback.format_exc()

    # -------------------------------------------------------- lifecycle
    def create_or_update(
        self, name: str, config: dict[str, str], create_only: bool = False
    ) -> tuple[dict, bool]:
        """PUT /connectors/{name}/config semantics: create or replace
        (``create_only`` = POST /connectors: 409 on an existing name,
        checked UNDER the lock so concurrent creates can't silently
        replace each other). The replacement builds and validates the
        NEW connector BEFORE stopping the old one — a rejected update
        leaves the running connector untouched. Returns (info,
        created)."""
        with self._lock:
            existing = self._connectors.get(name)
            if create_only and existing is not None:
                raise ConnectError(
                    409, f"connector {name!r} already exists"
                )
            c = self._build(name, config)  # may raise: old keeps running
            if existing is not None:
                self._stop_query(existing)
            self._connectors[name] = c
            self._start(c)
            self._persist()
            return self.info(name), existing is None

    def info(self, name: str) -> dict:
        c = self._get(name)
        return {
            "name": c.name,
            "config": dict(c.config),
            "tasks": [{"connector": c.name, "task": 0}],
            "type": "sink",
        }

    def status(self, name: str) -> dict:
        c = self._get(name)
        self._refresh(c)
        task_state = c.state if c.state != "STOPPED" else "UNASSIGNED"
        task = {"id": 0, "state": task_state, "worker_id": self.worker_id}
        if c.trace:
            task["trace"] = c.trace
        return {
            "name": c.name,
            "connector": {"state": c.state, "worker_id": self.worker_id},
            "tasks": [task],
            "type": "sink",
        }

    def topics_of(self, name: str) -> dict:
        c = self._get(name)
        return {c.name: {"topics": list(c.topics)}}

    def names(self) -> list[str]:
        with self._lock:
            return sorted(self._connectors)

    def pause(self, name: str) -> None:
        with self._lock:
            c = self._get(name)
            self._stop_query(c)
            c.state = "PAUSED"

    def resume(self, name: str) -> None:
        with self._lock:
            c = self._get(name)
            if c.state == "PAUSED" or c.state == "STOPPED":
                self._start(c)

    def restart(self, name: str) -> None:
        with self._lock:
            c = self._get(name)
            self._stop_query(c)
            self._start(c)

    def stop(self, name: str) -> None:
        """PUT /connectors/{name}/stop (Connect 3.5+): release the
        query, keep the connector and its checkpoint."""
        with self._lock:
            c = self._get(name)
            self._stop_query(c)
            c.state = "STOPPED"

    def delete(self, name: str) -> None:
        with self._lock:
            c = self._get(name)
            self._stop_query(c)
            del self._connectors[name]
            self._persist()

    def shutdown(self) -> None:
        with self._lock:
            for c in self._connectors.values():
                self._stop_query(c)

    def offsets(self, name: str) -> dict:
        """GET /connectors/{name}/offsets (Connect 3.5+): the committed
        consumer positions, read from the SAME place the engine trusts
        for exactly-once — the sink tables' snapshot summaries
        (kafka.connect.offsets, S2/A4 parity) — rendered in the public
        response shape."""
        import json as _json

        c = self._get(name)
        from .streaming.pipeline import OFFSETS_PROP

        merged: dict[tuple[str, int], int] = {}
        for tc in c.pipeline.config.tables or []:
            try:
                t = c.pipeline.catalog.load_table(tc.name)
            except Exception:
                continue
            for snap in reversed(t.snapshots()):
                raw = (snap.get("summary") or {}).get(OFFSETS_PROP)
                if not raw:
                    continue
                for tp, off in _json.loads(raw).items():
                    topic, _, part = tp.rpartition("-")
                    key = (topic, int(part))
                    merged[key] = max(merged.get(key, 0), int(off))
                break  # newest offsets-bearing snapshot per table
        return {
            "offsets": [
                {
                    "partition": {
                        "kafka_topic": topic,
                        "kafka_partition": part,
                    },
                    "offset": {"kafka_offset": off},
                }
                for (topic, part), off in sorted(merged.items())
            ]
        }

    # ------------------------------------------------------ persistence
    @property
    def _store_path(self) -> str:
        import os

        return os.path.join(self.checkpoint_root, "connectors.json")

    def _persist(self) -> None:
        """Atomic write of {name: config} (the config-topic twin)."""
        import json as _json
        import os

        os.makedirs(self.checkpoint_root, exist_ok=True)
        tmp = self._store_path + ".tmp"
        with open(tmp, "w") as f:
            _json.dump(
                {n: c.config for n, c in self._connectors.items()},
                f,
                indent=1,
                sort_keys=True,
            )
        os.replace(tmp, self._store_path)

    def _restore(self) -> None:
        import json as _json
        import os

        if not os.path.exists(self._store_path):
            return
        with open(self._store_path) as f:
            stored = _json.load(f)
        for name, config in stored.items():
            try:
                c = self._build(name, config)
                self._connectors[name] = c
                self._start(c)
            except Exception:
                import traceback as _tb

                self._connectors[name] = _Connector(
                    name=name,
                    config=dict(config),
                    state="FAILED",
                    trace=_tb.format_exc(),
                )

    # ---------------------------------------------------------- helpers
    def _resolve_topics(self, config: dict[str, str]) -> list[str]:
        if config.get("topics"):
            return [
                t.strip()
                for t in config["topics"].split(",")
                if t.strip()
            ]
        pattern = config.get("topics.regex")
        if pattern and self.files_root is not None:
            import os
            import re

            rx = re.compile(pattern)
            try:
                names = sorted(os.listdir(self.files_root))
            except FileNotFoundError:
                return []
            return [
                n
                for n in names
                if rx.fullmatch(n)
                and os.path.isdir(os.path.join(self.files_root, n))
            ]
        return []

    def _get(self, name: str) -> _Connector:
        c = self._connectors.get(name)
        if c is None:
            raise ConnectError(404, f"connector {name!r} not found")
        return c

    def _refresh(self, c: _Connector) -> None:
        """Fold the streaming query's health into the Connect state."""
        if c.state == "RUNNING" and c.query is not None:
            if not c.query.isActive:
                exc = c.query.exception()
                if exc is not None:
                    c.state = "FAILED"
                    c.trace = str(exc)

    @staticmethod
    def _stop_query(c: _Connector) -> None:
        if c.query is not None and c.query.isActive:
            c.query.stop()
            try:
                c.query.awaitTermination(30)
            except Exception:
                pass
        c.query = None
