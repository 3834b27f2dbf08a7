"""Continuous sync loop from an external Iceberg table — the read
direction of the streaming mirror (streaming/pipeline.py exports one per
commit; this consumes one per poll).

The reference's steady state is "an external system keeps committing to
an Iceberg table; downstream engines keep reading it through the catalog"
(data/Utilities.java:68-121, docs/design.md:119-141 for the exactly-once
story). Here the imported copy converges on its source via
``refresh_from_iceberg`` (sinks/iceberg_import.py) — each poll is a cheap
metadata check (resolve the source's current metadata version, compare
the recorded snapshot id) and only NEW snapshots translate into commits,
so a poll at an unchanged head costs one directory listing plus one JSON
read, never a manifest walk.

Crash safety mirrors the engine's other loops (streaming/mv.py,
streaming/dedup.py): the recorded ``import.source-snapshot-id`` property
only advances after every new snapshot committed, and each refresh commit
is itself atomic — a crash mid-refresh resumes from the last fully
applied external snapshot (re-translating an already-applied snapshot is
prevented by the ancestry walk starting at the RECORDED id).
"""

from __future__ import annotations

import time
from typing import Callable

from ..sinks.iceberg_import import refresh_from_iceberg


def iceberg_sync_loop(
    table,
    source: str | None = None,
    poll_interval_s: float = 1.0,
    max_polls: int | None = None,
    on_refresh: Callable[[dict], None] | None = None,
    stop_when_current: bool = False,
) -> dict:
    """Poll the external source and refresh ``table`` until stopped.

    ``max_polls`` bounds the loop (tests / batch catch-up jobs);
    ``stop_when_current`` exits after the first no-op poll (catch-up
    semantics: drain everything the source has, then return).
    Returns {"polls": n, "synced": total snapshots applied}.
    """
    polls = synced = 0
    while max_polls is None or polls < max_polls:
        polls += 1
        res = refresh_from_iceberg(table, source=source)
        synced += res["synced"]
        if on_refresh is not None and res["synced"]:
            on_refresh(res)
        if res["synced"] == 0 and stop_when_current:
            break
        if max_polls is None or polls < max_polls:
            time.sleep(poll_interval_s)
    return {"polls": polls, "synced": synced}
