"""Shared column/frame helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def local_df(spark: SparkSession, rows, schema) -> DataFrame:
    """``createDataFrame`` for SMALL driver-local row lists, as ONE partition.

    ``spark.createDataFrame(list, schema)`` parallelizes the rows over
    ``defaultParallelism`` Python partitions (32 on this rig): every action
    over the frame then pays one Python-worker round-trip per partition, and
    a ``coalesce(1)`` over it is catastrophic — the single coalesced task
    evaluates all 32 parent Python partitions *serially* (measured 6.6s for
    a one-row frame vs 0.7s uncoalesced, vs ~0.1s for this one-slice form).
    Tiny metadata/result frames have no business being 32 Python partitions;
    one slice makes them one worker round-trip total.

    Values and schema semantics are unchanged — the RDD input path applies
    the same per-row type verification/conversion as the list path, just
    inside the single task instead of eagerly on the driver.
    """
    return spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
