"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line with per-query seconds.

Execution is forced with the noop sink (full computation, no driver
collect / disk write skew)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from iceberg_kafka_connect_spark.session import get_spark  # noqa: E402
from iceberg_kafka_connect_spark.suite import load_all  # noqa: E402

BENCH_QUERIES = [
    # analytics over the ingested lakehouse (scan/join/agg/window)
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q7",
    "tpch_q10",
    "tpch_q13",
    "tpch_q14",
    "tpch_q18",
    "tpch_q19",
    "tpch_q22",
    "order_priority_count",
    "top_customers_per_nation",
    "events_hourly_rollup",
    "events_sessionize",
    "events_value_percentiles",
    # ingestion surface (conversion, CDC, routing)
    "record_convert_coerce",
    "cdc_apply",
    "route_static",
    # training-data extensions
    "text_profile",
    "dedup_minhash_lsh",
    "ann_topk_bruteforce",
    "curation_pipeline",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    spark = get_spark(app_name="iks-bench")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()

    # Per-query JVM/codegen warm-up at the smallest SF: whole-stage codegen
    # compiles each query's expression tree once; measured runs are
    # steady-state throughput, which is what matters at scale.
    for name in BENCH_QUERIES:
        specs[name].fn(spark, "/root/testdata/sf0.001").write.format(
            "noop"
        ).mode("overwrite").save()

    # best-of-3: single-JVM local runs have multi-second GC/compilation
    # noise; the minimum is the steady-state figure. Cache is cleared
    # between queries so one operator's persisted intermediates can't
    # pressure the next one's GC.
    times: dict[str, float] = {}
    for name in BENCH_QUERIES:
        best = None
        for _ in range(3):
            df = specs[name].fn(spark, sf_dir)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        spark.catalog.clearCache()
        times[name] = round(best, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "suite_total_seconds",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
