"""Streaming exact deduplication: at-least-once → exactly-once-per-key.

A training-data ingest stream re-delivers documents (retries, replays,
multi-source overlap). ``streaming_dedup`` drops re-occurrences of a key
within the watermark horizon using Spark's dropDuplicates state store —
state is one entry per key inside the horizon, evicted as the watermark
advances, so memory is bounded by (arrival rate × horizon), not stream
length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_dedup(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "timestamp",
    watermark: str = "1 hour",
) -> DataFrame:
    return stream.withWatermark(ts_col, watermark).dropDuplicates(key_cols)


def curation_loop(
    stream: DataFrame,
    corpus_table,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    checkpoint: str | None = None,
):
    """Streaming corpus curation: every micro-batch is deduplicated against
    the corpus accumulated so far (exact AND near-dup, via
    operators.dedup.incremental_dedup) and only the survivors are appended
    to ``corpus_table`` (a lakehouse table). The corpus therefore stays
    deduplicated BY CONSTRUCTION — the invariant a training-data store
    needs, enforced at ingest rather than by periodic recuration.

    Scale shape per batch: history is signature-scanned, never self-paired
    (cost grows with corpus size only linearly, amortizable by persisting
    the history signature table); the batch pays the standard in-batch LSH.
    Exactly-once: foreachBatch + lakehouse batch-id idempotence, the same
    recovery contract as SinkPipeline.

    Returns the StreamingQuery.
    """
    from ..operators.dedup import incremental_dedup

    from .pipeline import BATCH_ID_PROP

    marker = "curation-loop"

    def _last_batch_id() -> int | None:
        # table-level ancestry walk (clean unknown-snapshot errors even
        # after expire_snapshots pruned part of the chain)
        v = corpus_table.last_summary_value(BATCH_ID_PROP, where_key=marker)
        return int(v) if v is not None else None

    def process(batch: DataFrame, batch_id: int) -> None:
        # exactly-once: replayed batches (checkpoint restart) are skipped by
        # the batch-id already stamped in the last snapshot's summary
        last = _last_batch_id()
        if last is not None and batch_id <= last:
            return
        batch = batch.dropDuplicates([id_col]).persist()
        try:
            spark = batch.sparkSession
            try:
                history = corpus_table.read(spark).select(id_col, text_col)
                have_history = True
            except Exception:  # first batch: table empty/unreadable
                have_history = False
            if have_history and history.limit(1).count() > 0:
                verdicts = incremental_dedup(
                    batch, history, id_col, text_col, threshold=threshold
                )
                keep_ids = verdicts.filter(F.col("kept")).select(id_col)
                survivors = batch.join(keep_ids, id_col, "left_semi")
            else:
                # no history yet: in-batch dedup only
                from ..operators.dedup import minhash_lsh_pairs, exact_dedup

                digests = exact_dedup(batch, id_col, text_col)
                reps = batch.join(
                    digests.select(F.col("keep_id").alias(id_col)),
                    id_col,
                    "left_semi",
                )
                losers = (
                    minhash_lsh_pairs(reps, id_col, text_col, threshold=threshold)
                    .select(F.col("id_b").alias(id_col))
                    .distinct()
                )
                survivors = reps.join(losers, id_col, "left_anti")
            corpus_table.append(
                survivors,
                snapshot_props={BATCH_ID_PROP: str(batch_id), marker: "1"},
            )
        finally:
            batch.unpersist()

    writer = stream.writeStream.foreachBatch(process).outputMode("append")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
