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

from ..functions import local_df


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
    signature_table=None,
):
    """Streaming corpus curation: every micro-batch is deduplicated against
    the corpus accumulated so far (exact AND near-dup, via
    operators.dedup.incremental_dedup) and only the survivors are appended
    to ``corpus_table`` (a lakehouse table). The corpus therefore stays
    deduplicated BY CONSTRUCTION — the invariant a training-data store
    needs, enforced at ingest rather than by periodic recuration.

    Scale shape per batch: history is signature-scanned, never self-paired
    (cost grows with corpus size only linearly); with ``signature_table``
    set (a lakehouse table maintained by this loop), history text is never
    re-read or re-hashed AT ALL — each poll deduplicates against the stored
    per-doc signatures (operators.dedup.doc_signatures: digest + band
    hashes + shingle-hash set, a few hundred bytes/doc) and appends the
    survivors' signatures for the next poll. That turns the per-batch
    history cost from "re-tokenize the corpus" into "column-pruned scan of
    a compact signature table" — the production shape.
    Exactly-once: foreachBatch + lakehouse batch-id idempotence, the same
    recovery contract as SinkPipeline (the signature table commits FIRST
    with its own marker, so a crash between the two commits replays into a
    consistent state).

    Returns the StreamingQuery.
    """
    from ..operators.dedup import (
        doc_signatures,
        incremental_dedup,
        incremental_dedup_cached,
    )

    from .pipeline import BATCH_ID_PROP

    marker = "curation-loop"

    if (
        signature_table is not None
        and corpus_table.current_snapshot() is not None
        and signature_table.current_snapshot() is None
    ):
        raise ValueError(
            "corpus_table already has data but signature_table is empty — "
            "the loop would stop deduplicating against existing history. "
            "Backfill first: signature_table.append(doc_signatures("
            "corpus_table.read(spark), id_col, text_col))"
        )

    def _last_batch_id(table) -> int | None:
        # table-level ancestry walk (clean unknown-snapshot errors even
        # after expire_snapshots pruned part of the chain)
        v = table.last_summary_value(BATCH_ID_PROP, where_key=marker)
        return int(v) if v is not None else None

    def _committed_sig_ids(spark, batch_id):
        """Survivor ids a crashed run already committed to the signature
        table for ``batch_id`` (the rows its marked snapshot appended)."""
        for s in signature_table.snapshots():
            if s["summary"].get(BATCH_ID_PROP) == str(batch_id) and s[
                "summary"
            ].get(marker):
                return signature_table.appends_between(
                    spark, s["parent"], s["snapshot_id"]
                ).select("id")
        return None

    def _cached_verdicts(spark, batch, batch_id):
        # replayed batch whose signature commit already landed (crash
        # between the two commits): the committed signature rows ARE the
        # verdict — recomputing would dedup the batch against its OWN
        # stored signatures and drop everything as exact_history
        last_sig = _last_batch_id(signature_table)
        if last_sig is not None and batch_id <= last_sig:
            committed = _committed_sig_ids(spark, batch_id)
            if committed is None:
                # the marked snapshot was pruned (expire_snapshots): the
                # signature table already holds this batch's own signatures,
                # so recomputing would drop EVERY doc as exact_history and
                # permanently lose the batch. Unrecoverable without the
                # marker — fail loudly instead.
                raise RuntimeError(
                    f"curation-loop replay of batch {batch_id}: its marked "
                    "signature snapshot was expired, so committed survivor "
                    "ids cannot be recovered. Keep signature-table snapshots "
                    "at least as long as the streaming checkpoint horizon "
                    "(expire_snapshots retain-last must cover in-flight "
                    "batches)."
                )
            return committed.withColumnRenamed("id", id_col)
        batch_sigs = doc_signatures(batch, id_col, text_col)
        if signature_table.current_snapshot() is None:
            hist_sigs = local_df(spark, [], batch_sigs.schema)
        else:
            hist_sigs = signature_table.read(spark)
        verdicts = incremental_dedup_cached(
            batch_sigs, hist_sigs, threshold=threshold, id_col=id_col
        )
        keep_ids = verdicts.filter(F.col("kept")).select(
            F.col(id_col).alias("id")
        )
        # signature table commits BEFORE the corpus so recovery can't lose
        # signatures for docs that made it into the corpus
        signature_table.append(
            batch_sigs.join(keep_ids, "id", "left_semi"),
            snapshot_props={BATCH_ID_PROP: str(batch_id), marker: "1"},
        )
        return keep_ids.withColumnRenamed("id", id_col)

    def process(batch: DataFrame, batch_id: int) -> None:
        # exactly-once: replayed batches (checkpoint restart) are skipped by
        # the batch-id already stamped in the last snapshot's summary
        last = _last_batch_id(corpus_table)
        if last is not None and batch_id <= last:
            return
        batch = batch.dropDuplicates([id_col]).persist()
        try:
            spark = batch.sparkSession
            if signature_table is not None:
                keep_ids = _cached_verdicts(spark, batch, batch_id)
                survivors = batch.join(keep_ids, id_col, "left_semi")
                corpus_table.append(
                    survivors,
                    snapshot_props={BATCH_ID_PROP: str(batch_id), marker: "1"},
                )
                return
            # explicit emptiness check — a transient read ERROR must fail
            # the batch (foreachBatch retries), not silently skip history
            # and admit duplicates
            have_history = corpus_table.current_snapshot() is not None
            if have_history:
                history = corpus_table.read(spark).select(id_col, text_col)
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
