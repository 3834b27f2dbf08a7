"""Statistics-driven join planning over Lakehouse tables.

What Iceberg buys engines by shipping puffin NDV stats + manifest byte
counts: the JOIN STRATEGY can be decided from metadata before any task
launches. This is the consumer side of ``LakehouseTable.analyze()``:

1. **Broadcast** — a side whose live data-file bytes fit under the
   threshold (Spark's ``autoBroadcastJoinThreshold`` idea, but decided
   from table metadata rather than scan estimates, so it holds even
   when the scan is wrapped in merge-on-read plumbing Spark can't see
   through).
2. **Storage-partitioned join** — both sides bucket-co-partitioned on
   the key: zero join-key shuffle (``operators/spj.py``).
3. **Shuffle join** — otherwise; when analyze() stats exist, a
   low-NDV key on BOTH big sides (every shuffle partition hot) is
   surfaced in the decision record so callers can opt into salting
   (``operators/skew.py``) — the planner never silently rewrites
   semantics.

``plan_join`` returns the decision record (pure metadata, no Spark
job); ``stats_join`` executes it. Reference analogue: none — engine-side
planning the reference delegates to its query engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_BROADCAST_BYTES = 64 << 20  # Spark default is 10 MiB; MoR inflates


def _live_bytes(table, branch: str) -> int | None:
    data, _ = table.live_files(branch=branch)
    sizes = [f.get("bytes") for f in data]
    if any(s is None for s in sizes):
        return None  # unknown-size entries: never guess small
    return sum(sizes)


def _ndv(table, key: str, branch: str) -> int | None:
    doc = table.column_stats(branch)
    if doc is None:
        return None
    st = doc["columns"].get(key)
    return None if st is None else st["ndv"]


def _spj_eligible(left, right, key: str) -> bool:
    from .spj import _bucket_field

    try:
        pa, pb = _bucket_field(left, key), _bucket_field(right, key)
    except ValueError:
        return False
    return int(pa.param) == int(pb.param)


def plan_join(
    left,
    right,
    key: str,
    how: str = "inner",
    branch: str = "main",
    broadcast_threshold_bytes: int = DEFAULT_BROADCAST_BYTES,
    skew_ndv_per_partition: int = 4,
    shuffle_partitions: int = 200,
) -> dict:
    """Decide a join strategy from table metadata alone (no Spark job):
    returns ``{"strategy": "broadcast"|"spj"|"shuffle", "build_side":
    "left"|"right"|None, "skew_risk": bool, ...evidence}``.

    ``skew_risk`` flags a shuffle join whose key NDV (from analyze()
    stats, when present on either side) is below
    ``skew_ndv_per_partition × shuffle_partitions`` — too few distinct
    keys to keep every shuffle partition busy; the caller chooses
    between AQE skew handling and an explicit salted join.
    """
    lb, rb = _live_bytes(left, branch), _live_bytes(right, branch)
    decision: dict = {"key": key, "left_bytes": lb, "right_bytes": rb}
    # a broadcast build side must be the NON-preserved side: right for
    # inner/left joins, left for inner/right joins, neither for full outer
    # (Spark's build-side legality — an illegal hint is silently ignored,
    # so the planner never emits one)
    h = how.lower().replace("-", "_")
    sides = []  # prefer right build (Spark-ish) when both are legal
    if h in ("inner", "left", "left_outer", "leftouter", "cross"):
        sides.append((rb, "right"))
    if h in ("inner", "right", "right_outer", "rightouter", "cross"):
        sides.append((lb, "left"))
    for size, side in sides:
        if size is not None and size <= broadcast_threshold_bytes:
            decision.update(strategy="broadcast", build_side=side,
                            skew_risk=False)
            return decision
    # cross joins have no equi-key, so bucket co-location buys nothing
    if h != "cross" and _spj_eligible(left, right, key):
        decision.update(strategy="spj", build_side=None, skew_risk=False)
        return decision
    ndvs = [n for n in (_ndv(left, key, branch), _ndv(right, key, branch))
            if n is not None]
    ndv = min(ndvs) if ndvs else None
    decision.update(
        strategy="shuffle",
        build_side=None,
        key_ndv=ndv,
        skew_risk=bool(
            ndv is not None
            and ndv < skew_ndv_per_partition * shuffle_partitions
        ),
    )
    return decision


def stats_join(
    spark: SparkSession,
    left,
    right,
    key: str,
    how: str = "inner",
    branch: str = "main",
    broadcast_threshold_bytes: int = DEFAULT_BROADCAST_BYTES,
    runtime_filter: bool = True,
) -> tuple[DataFrame, dict]:
    """Execute the ``plan_join`` decision: returns ``(joined, decision)``.
    Output columns: key, left columns, right's non-key columns (``_r``
    suffix on collision) — the SPJ column contract, matched here for all
    strategies so the caller's shape is plan-independent.

    ``runtime_filter`` (dynamic file pruning, the Spark 3.3 runtime
    filtering / Databricks DFP idea done from table metadata): on an
    INNER broadcast join, the build side's metadata key bounds become a
    ``key BETWEEN lo AND hi`` predicate on the probe side's SCAN — files
    whose recorded bounds fall outside never open. Zero extra jobs (both
    the decision and the bounds come from manifests); inner-only because
    a preserved side must keep its unmatched rows. The predicate lands in
    ``decision["runtime_filter"]`` when applied."""
    decision = plan_join(
        left, right, key, how=how, branch=branch,
        broadcast_threshold_bytes=broadcast_threshold_bytes,
    )
    if decision["strategy"] == "spj":
        from .spj import storage_partitioned_join

        return (
            storage_partitioned_join(
                spark, left, right, key, how=how, branch=branch
            ),
            decision,
        )
    rf_left = rf_right = None
    if (
        runtime_filter
        and decision["strategy"] == "broadcast"
        and how.lower().replace("-", "_") == "inner"
    ):
        build = right if decision["build_side"] == "right" else left
        bounds = build.column_bounds(key, branch=branch)
        if bounds is not None:
            lo, hi = bounds
            numeric = all(
                isinstance(v, (int, float)) and not isinstance(v, bool)
                for v in (lo, hi)
            )
            if numeric:
                pred = f"{key} >= {lo!r} AND {key} <= {hi!r}"
                decision["runtime_filter"] = pred
                if decision["build_side"] == "right":
                    rf_left = pred
                else:
                    rf_right = pred
    ldf = left.read(spark, branch=branch, where=rf_left)
    rdf = right.read(spark, branch=branch, where=rf_right)
    lcols = set(ldf.columns)
    rdf = rdf.select(
        key,
        *[
            F.col(c).alias(c + "_r" if c in lcols else c)
            for c in rdf.columns
            if c != key
        ],
    )
    if decision["strategy"] == "broadcast":
        if decision["build_side"] == "right":
            rdf = F.broadcast(rdf)
        else:
            ldf = F.broadcast(ldf)
    if how.lower().replace("-", "_") == "cross":
        # a using-column join rejects joinType=cross; the SPJ column
        # contract (key, left cols, right non-key cols) needs the right
        # key column dropped after the cartesian product
        return ldf.crossJoin(rdf.drop(key)), decision
    return ldf.join(rdf, on=key, how=how), decision
