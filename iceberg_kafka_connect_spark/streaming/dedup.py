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


def streaming_dedup(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "timestamp",
    watermark: str = "1 hour",
) -> DataFrame:
    return stream.withWatermark(ts_col, watermark).dropDuplicates(key_cols)
