"""Storage-partitioned join over bucket-partitioned Lakehouse tables.

Spark's Storage-Partitioned Join (SPARK-37375) lets two v2 tables that
share a partition transform join WITHOUT shuffling either side — the
scan's physical layout IS the join distribution. This module provides the
same shape at the table layer: two tables bucket-partitioned by the same
spec-conformant ``iceberg_bucket(N, key)`` join per bucket (equal keys
are guaranteed co-bucketed — both sides hash with the identical murmur3
Appendix-B transform, ``functions/murmur3.py``), and the per-bucket joins
union. Neither table's rows ever cross the wire keyed by the join key:
each sub-join reads only its bucket's files, and broadcasting the smaller
bucket slice turns the whole join into N independent broadcast joins.

At 100 TB this is the co-located-join pattern bucketed tables exist for:
a shuffle join moves BOTH tables across the cluster; here the only data
movement is the broadcast of the small side's 1/N slices. (The same
layout also serves point lookups via bucket pruning — sinks/stats.py.)

Constraints, refused loudly rather than silently degraded:
- both tables' partition specs must carry ``iceberg_bucket`` on the join
  key with the SAME bucket count;
- no live delete files on either side (merge-on-read delete state is not
  bucket-scoped — ``compact()`` first folds it);
- inner joins only (an outer row's bucket is still well-defined, but
  keeping the semantics airtight beats generality here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sinks.spec import HIVE_NULL_PARTITION, partition_dir_value


def _bucket_field(table, key: str):
    for pf in table.partition_spec():
        if pf.transform == "iceberg_bucket" and pf.source == key:
            return pf
    raise ValueError(
        f"table at {table.root!r} is not bucket-partitioned on {key!r} "
        "(storage-partitioned join needs iceberg_bucket on the join key)"
    )


def _files_by_bucket(table, pf) -> dict[int, list[dict]]:
    data_files, delete_files = table.live_files()
    if delete_files:
        raise ValueError(
            f"table at {table.root!r} has live delete files — merge-on-read "
            "state is not bucket-scoped; compact() before a "
            "storage-partitioned join"
        )
    out: dict[int, list[dict]] = {}
    for f in data_files:
        raw = partition_dir_value(f["path"], pf.name)
        if raw is None:
            raise ValueError(
                f"data file {f['path']!r} predates the bucket spec "
                f"(no {pf.name}=<n> directory) — compact() to rewrite it "
                "under the current spec"
            )
        if raw == HIVE_NULL_PARTITION:
            # a NULL join key can never satisfy an inner equality join —
            # the null partition's files are correctly skipped entirely
            continue
        out.setdefault(int(raw), []).append(f)
    return out


def storage_partitioned_join(
    spark: SparkSession,
    left,
    right,
    key: str,
    broadcast_right: bool = True,
) -> DataFrame:
    """Inner-join two bucket-co-partitioned tables with no join-key
    shuffle: a union of per-bucket joins, right side broadcast per bucket
    by default. Output columns: all left columns + the right table's
    non-key columns (suffixed ``_r`` on collision)."""
    pa, pb = _bucket_field(left, key), _bucket_field(right, key)
    if int(pa.param) != int(pb.param):
        raise ValueError(
            f"bucket counts differ: left {pa.param} vs right {pb.param} — "
            "co-location needs identical specs"
        )
    la, lb = _files_by_bucket(left, pa), _files_by_bucket(right, pb)
    lcols = [f.name for f in left.read_schema().fields]
    rcols = [f.name for f in right.read_schema().fields]
    rename = {
        c: f"{c}_r" for c in rcols if c != key and c in set(lcols)
    }
    parts: list[DataFrame] = []
    for b in sorted(set(la) & set(lb)):
        da = left._read_file_group(spark, la[b], left.read_schema()).drop(
            "__seq"
        )
        db = right._read_file_group(
            spark, lb[b], right.read_schema()
        ).drop("__seq")
        for old, new in rename.items():
            db = db.withColumnRenamed(old, new)
        if broadcast_right:
            db = F.broadcast(db)
        parts.append(da.join(db, key, "inner"))
    if not parts:
        # no shared buckets → empty result with the joined schema
        da = left.read(spark).limit(0)
        db = right.read(spark).limit(0)
        for old, new in rename.items():
            db = db.withColumnRenamed(old, new)
        return da.join(db, key, "inner")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
