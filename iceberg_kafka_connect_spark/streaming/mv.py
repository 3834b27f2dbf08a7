"""Incrementally-maintained materialized aggregate over a lakehouse table.

``refresh_materialized_agg`` advances a stored COUNT/SUM aggregate (the
``mv`` table) across everything its source table committed since the last
refresh, using the changelog-differencing operator
(operators/incremental.py) — per poll it pays O(touched keys) + O(groups),
never a source rescan. The reference has no query-state plane (its
Coordinator tracks offsets, not aggregates — Coordinator.java:193-202); a
maintained aggregate is the Spark-side extension of the same
"snapshot-property bookkeeping drives exactly-once progress" pattern the
ingest pipeline already uses (streaming/pipeline.py).

Consistency contract:
- the mv's latest refresh stamps ``mv-source-snapshot-id`` in its snapshot
  summary — the exact source snapshot its content equals;
- a refresh reads that marker, diffs the source between marker and head,
  and commits the new state with ONE atomic REPLACE carrying the new
  marker — crash anywhere leaves either the old consistent (state, marker)
  pair or the new one, never a mix;
- re-polling at an unchanged head is a no-op (marker equality), so the
  loop is idempotent under any re-delivery.

Fallbacks (both stamped in ``mv-refresh-mode`` for observability):
- first refresh seeds with a full aggregation;
- a window containing history-rewriting snapshots (compaction, expired
  ancestry) cannot be expressed as a changelog — the refresh detects the
  ``changes_between`` refusal and falls back to one full recompute, then
  returns to incremental mode on the next poll.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..operators.incremental import aggregate_state, incremental_agg_refresh

MV_SOURCE_SNAPSHOT_PROP = "mv-source-snapshot-id"
MV_REFRESH_MODE_PROP = "mv-refresh-mode"


def refresh_materialized_agg(
    spark: SparkSession,
    source,
    mv,
    key_cols: list[str],
    group_cols: list[str],
    sum_cols: list[str],
) -> dict | None:
    """Advance ``mv`` to ``source``'s current snapshot; returns the REPLACE
    snapshot committed, or None when already current (or source empty)."""
    head = source.current_snapshot()
    if head is None:
        return None
    from_sid = mv.last_summary_value(MV_SOURCE_SNAPSHOT_PROP)
    if from_sid == head["snapshot_id"]:
        return None
    if from_sid is None:
        state = aggregate_state(
            source.read(spark, snapshot_id=head["snapshot_id"]),
            group_cols,
            sum_cols,
        )
        mode = "seed"
    else:
        try:
            changes = source.changes_between(
                spark, from_sid, head["snapshot_id"]
            )
            state = incremental_agg_refresh(
                mv.read(spark),
                pre_image=source.read(spark, snapshot_id=from_sid),
                post_image=source.read(spark, snapshot_id=head["snapshot_id"]),
                touched_keys=changes.select(*key_cols),
                key_cols=key_cols,
                group_cols=group_cols,
                sum_cols=sum_cols,
            )
            mode = "incremental"
        except ValueError:
            # window contains a replace/compaction snapshot, or the marker
            # snapshot was expired — the changelog cannot express it
            state = aggregate_state(
                source.read(spark, snapshot_id=head["snapshot_id"]),
                group_cols,
                sum_cols,
            )
            mode = "full"
    return mv.overwrite(
        state,
        snapshot_props={
            MV_SOURCE_SNAPSHOT_PROP: head["snapshot_id"],
            MV_REFRESH_MODE_PROP: mode,
        },
    )
