"""Commit-notification listener (T12 parity).

Reference: Coordinator.java:159-167,259-275 publishes CommitToTable /
CommitComplete events on the control topic for downstream consumers. Spark's
StreamingQueryListener carries the same information per micro-batch; this
listener re-shapes progress events into the reference's notification form
and hands them to a callback (or an in-memory log for tests)."""

from __future__ import annotations

import json

from pyspark.sql.streaming import StreamingQueryListener


class CommitNotificationListener(StreamingQueryListener):
    def __init__(self, callback=None):
        self.events: list[dict] = []
        self.callback = callback

    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        p = event.progress
        note = {
            "type": "CommitComplete",  # EventType.java:21-27 parity
            "query_id": str(p.id),
            "batch_id": p.batchId,
            "timestamp": p.timestamp,
            "num_input_rows": p.numInputRows,
        }
        self.events.append(note)
        if self.callback:
            self.callback(json.dumps(note))

    def onQueryTerminated(self, event):
        pass

    def onQueryIdle(self, event):
        pass
