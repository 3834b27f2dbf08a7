"""Physical-plan quality gates: the scale-readiness assertions.

Each test pins a property that matters at 100 TB: dimension joins stay
broadcast (no fact-side shuffle), filters reach the parquet scan
(PushedFilters), hot paths stay inside whole-stage codegen (no Python
row-at-a-time eval), and partitioned lakehouse reads prune directories."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from iceberg_kafka_connect_spark.plans import assert_plan, count_in_plan, plan_string
from iceberg_kafka_connect_spark.sinks import Catalog
from iceberg_kafka_connect_spark.suite import load_all

SPECS = load_all()


def test_q5_all_dimension_joins_broadcast(spark, sf_dir):
    df = SPECS["tpch_q5"].fn(spark, sf_dir)
    assert count_in_plan(df, "BroadcastHashJoin") >= 4
    assert_plan(df, absent=["SortMergeJoin"])


def test_q3_broadcast_and_pushdown(spark, sf_dir):
    df = SPECS["tpch_q3"].fn(spark, sf_dir)
    plan = plan_string(df)
    assert "BroadcastHashJoin" in plan
    # date predicates reach the parquet scans
    assert "PushedFilters: [IsNotNull(o_orderdate)" in plan or "LessThan(o_orderdate" in plan


def test_q6_filter_fully_pushed(spark, sf_dir):
    df = SPECS["tpch_q6"].fn(spark, sf_dir)
    plan = plan_string(df)
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_quantity,24.0)" in plan


def test_q1_map_side_combine_and_no_python(spark, sf_dir):
    df = SPECS["tpch_q1"].fn(spark, sf_dir)
    plan = plan_string(df)
    # partial aggregation present (map-side combine): each task ships ~6
    # pre-aggregated rows into the exchange, not its whole scan
    assert "partial_sum" in plan
    assert_plan(df, absent=["BatchEvalPython", "ArrowEvalPython"])


def test_ingestion_queries_no_python_udfs(spark, sf_dir):
    """The whole SMT/conversion layer is Catalyst-only — no Python in any
    hot path (UDFs are the slow path; the reference's per-record Java loops
    must not become per-record Python loops)."""
    for name in ("record_convert_coerce", "smt_debezium_unwrap", "cdc_apply",
                 "route_static", "text_profile"):
        df = SPECS[name].fn(spark, sf_dir)
        assert_plan(df, absent=["BatchEvalPython"])


def test_column_pruning_reaches_scan(spark, sf_dir):
    """A 2-column projection must not read all columns (ReadSchema check)."""
    df = SPECS["tpch_q6"].fn(spark, sf_dir)
    plan = plan_string(df)
    read = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_returnflag" not in read and "l_orderkey" not in read


def test_lakehouse_partition_pruning(spark, tmp_path):
    """Reading a partitioned lakehouse table with a partition predicate
    scans only matching partition directories."""
    cat = Catalog(str(tmp_path / "wh"))
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("ts", T.TimestampType())]
    )
    t = cat.create_table("default.p", schema, partition_by=["day(ts)"])
    df = spark.createDataFrame(
        [(1, "2024-01-01 01:00:00"), (2, "2024-01-02 01:00:00")],
        "id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    t.append(df)
    read = t.read(spark).filter(F.col("ts_day") == "2024-01-01")
    plan = plan_string(read)
    assert "PartitionFilters" in plan
    assert [r.id for r in read.collect()] == [1]


def test_shingles_no_repartition_when_input_parallel(spark):
    """Scale guard: shingles() must NOT shuffle the raw corpus when the scan
    already yields >= defaultParallelism splits (an unconditional repartition
    would move the entire 100 TB text corpus before any hashing)."""
    from iceberg_kafka_connect_spark.operators.dedup import shingles

    par = spark.sparkContext.defaultParallelism

    def mkdocs(n_splits):
        # range with native slices — no exchange in the input plan
        return spark.range(0, 10_000, 1, n_splits).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("w1 w2 w3 w4 doc"), F.col("id")).alias("text"),
        )

    docs = mkdocs(par)
    sh = shingles(docs)
    # exactly the shuffles the algorithm needs (the distinct), none injected
    # before the tokenize/explode
    plan = plan_string(sh)
    import re

    exchanges = re.findall(r"Exchange \w+partitioning", plan)
    assert len(exchanges) <= 1, plan  # only the distinct's hash exchange
    assert "RoundRobinPartitioning" not in plan  # no injected repartition
    # while a single-split input DOES get widened (round-robin repartition)
    assert "RoundRobinPartitioning" in plan_string(shingles(mkdocs(1)))


def test_q22_scalar_via_broadcast_single_plan(spark, sf_dir):
    """q22's average-balance scalar is a one-row broadcast cross-join inside
    ONE plan — no driver-side collect splitting the query into two jobs."""
    df = SPECS["tpch_q22"].fn(spark, sf_dir)
    plan = plan_string(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_asof_join_one_shuffle_no_join_operator(spark, sf_dir):
    """The as-of join is union+window: ONE hash exchange on the keys and no
    join operator at all — no sort-merge fan-out, no per-left-row right-side
    scan. This is the property that makes it linear at 100 TB."""
    df = SPECS["asof_join_purchase"].fn(spark, sf_dir)
    plan = plan_string(df, "simple")
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_interval_join_no_nested_loop(spark, sf_dir):
    """The bucketed range join must stay an equi-join: an inequality-only
    join would fall back to BroadcastNestedLoopJoin / CartesianProduct and
    go quadratic."""
    df = SPECS["range_join_attribution"].fn(spark, sf_dir)
    assert_plan(df, absent=["BroadcastNestedLoopJoin", "CartesianProduct"])


def test_contamination_benchmark_broadcast_probe(spark, sf_dir):
    """The benchmark shingle set broadcasts; corpus shingles are probed
    map-side — the corpus never shuffles on shingle values."""
    df = SPECS["contamination_check"].fn(spark, sf_dir)
    plan = plan_string(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert_plan(df, absent=["BatchEvalPython"])


def test_repetition_zero_shuffles_on_parallel_input(spark):
    """Repetition metrics are single-pass per-row array arithmetic: with a
    well-split input there must be NO exchange anywhere in the plan."""
    from iceberg_kafka_connect_spark.operators import text as tx

    par = spark.sparkContext.defaultParallelism
    docs = spark.range(0, 5_000, 1, par).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("alpha beta gamma delta epsilon doc"), F.col("id")).alias(
            "text"
        ),
    )
    t = F.col("text")
    prof = docs.select(
        "doc_id",
        tx.top_word_ratio(t).alias("twr"),
        tx.dup_ngram_ratio(t, 2).alias("d2"),
        tx.repetition_filter(t).alias("passes"),
    )
    plan = plan_string(prof)
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan


def test_keyterms_single_tf_subtree(spark, sf_dir):
    """df comes from a window over tf, not a groupBy+join re-aggregation —
    the documents scan appears exactly twice (tf chain + corpus count), not
    three times."""
    df = SPECS["docs_keyterms"].fn(spark, sf_dir)
    plan = plan_string(df, "simple")
    assert plan.count("Scan parquet") == 2, plan


def test_quality_bins_never_global_sort(spark, sf_dir):
    """The decile window is keyed by source: the plan must hash-partition on
    source and never collapse to a single partition (a global NTILE would)."""
    df = SPECS["quality_bins_by_source"].fn(spark, sf_dir)
    plan = plan_string(df)
    assert "hashpartitioning(source" in plan, plan
    assert "Exchange SinglePartition" not in plan, plan


def test_q4_semi_join_not_inner_plus_distinct(spark, sf_dir):
    df = SPECS["tpch_q4"].fn(spark, sf_dir)
    plan = plan_string(df)
    assert "LeftSemi" in plan, plan


def test_q16_q21_anti_join_shapes(spark, sf_dir):
    plan16 = plan_string(SPECS["tpch_q16"].fn(spark, sf_dir))
    assert "LeftAnti" in plan16, plan16
    plan21 = plan_string(SPECS["tpch_q21"].fn(spark, sf_dir))
    assert "LeftSemi" in plan21 and "LeftAnti" in plan21, plan21


def test_q8_joins_stay_broadcast(spark, sf_dir):
    df = SPECS["tpch_q8"].fn(spark, sf_dir)
    assert count_in_plan(df, "BroadcastHashJoin") >= 5
    assert_plan(df, absent=["SortMergeJoin"])


def test_span_dedup_no_python_and_partial_agg(spark, sf_dir):
    """Span frequency/first-occurrence must partial-aggregate (hot
    boilerplate spans collapse map-side) and the whole op stays JVM-side."""
    df = SPECS["docs_span_dedup"].fn(spark, sf_dir)
    assert_plan(df, absent=["BatchEvalPython"])
    assert count_in_plan(df, "partial_count") >= 1 or count_in_plan(
        df, "partial"
    ) >= 1


def test_source_mix_broadcasts_rates_no_doc_shuffle(spark, sf_dir):
    """The per-source rate table must broadcast back onto the corpus — the
    documents themselves never shuffle for the filter."""
    df = SPECS["docs_source_mix"].fn(spark, sf_dir)
    assert count_in_plan(df, "BroadcastHashJoin") >= 1
    assert_plan(df, absent=["BatchEvalPython", "SortMergeJoin"])


def test_stats_pruned_read_filter_reapplied(spark, tmp_path):
    """read(where=) must re-apply the predicate to rows (pruning is an
    optimization, never the correctness mechanism) and push it to the scan."""
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.DoubleType())]
    )
    t = Catalog(str(tmp_path / "wh")).create_table("default.pp", schema)
    t.append(
        spark.createDataFrame([(i, float(i)) for i in range(100)], schema)
    )
    df = t.read(spark, where="id >= 50")
    p = plan_string(df)
    assert "PushedFilters" in p and "GreaterThanOrEqual(id,50)" in p


def test_q2_q11_q20_single_fact_scan(spark, sf_dir):
    """Correlated-subquery shapes must not scan the fact table twice: the
    window rewrites (q2/q20) and the persisted aggregate (q11) each keep
    exactly one lineitem scan in the plan — a groupBy-then-rejoin would
    silently double the 100 TB scan."""
    for name in ("tpch_q2", "tpch_q20"):
        plan = plan_string(SPECS[name].fn(spark, sf_dir))
        assert plan.count("lineitem.parquet") == 1, name
    # q11: the pv aggregate is localCheckpoint'ed (eager), so the single
    # lineitem pass happened at checkpoint time — the final plan must read
    # the materialized RDD twice (filter + total) and never re-scan parquet
    q11 = SPECS["tpch_q11"].fn(spark, sf_dir)
    plan = plan_string(q11)
    assert plan.count("lineitem.parquet") == 0
    assert "ExistingRDD" in plan  # checkpointed pv reused for the total


def test_lm_surprise_and_shard_shuffle_no_python(spark, sf_dir):
    """Scoring/addressing passes stay Catalyst-only: the literal-map LM
    fold and the md5 shard math must not fall back to Python eval."""
    for name in ("docs_lm_surprise", "docs_shard_shuffle"):
        df = SPECS[name].fn(spark, sf_dir)
        assert_plan(df, absent=["BatchEvalPython", "ArrowEvalPython"])
    # shard shuffle: the only exchange is the hash partition by shard —
    # never a global range sort
    plan = plan_string(SPECS["docs_shard_shuffle"].fn(spark, sf_dir))
    assert "rangepartitioning" not in plan.lower()


def test_gopher_rules_zero_shuffles_no_python(spark):
    """The Gopher battery is one projection: no exchange, no Python eval."""
    from iceberg_kafka_connect_spark.operators import text as tx

    par = spark.sparkContext.defaultParallelism
    docs = spark.range(0, 5_000, 1, par).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("the quick brown fox and that dog have words of note "),
            F.col("id"),
        ).alias("text"),
    )
    out = docs.select("doc_id", *tx.gopher_rules(F.col("text"))).select(
        "*", tx.gopher_passes()
    )
    plan = plan_string(out)
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan


def test_delete_where_scan_prunes_files(spark, tmp_path):
    """DELETE WHERE plans against file bounds: only files whose recorded
    min/max admit the predicate are opened (scan_files is its planner)."""
    from pyspark.sql import types as T

    from iceberg_kafka_connect_spark.sinks.table import LakehouseTable

    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.LongType())]
    )
    t = LakehouseTable.create(str(tmp_path / "t"), schema)
    for lo in (0, 100, 200, 300):
        t.append(
            spark.range(lo, lo + 100, 1, 1).select(
                F.col("id"), (F.col("id") * 2).alias("v")
            )
        )
    kept, total = t.scan_files("id >= 350")
    assert total == 4 and len(kept) == 1
    t.delete_where(spark, "id >= 350", key_cols=["id"])
    assert t.read(spark).count() == 350


def test_bloom_prefilter_fresh_path_no_join(spark, sf_dir):
    """dedup_exact_bloom: the definitely-new branch (probe miss) must be a
    pure scan+filter — its rows never enter the anti-join exchange, which
    is the operator's entire point at steady-state ingest."""
    from iceberg_kafka_connect_spark.functions.bloom import (
        bloom_build,
        bloom_contains,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = bloom_build(
        docs.limit(50).select(F.md5("text").alias("d")), "d", 1 << 12, 3
    )
    fresh = docs.filter(~bloom_contains(F.md5("text"), words, 3)).select(
        "doc_id"
    )
    plan = plan_string(fresh)
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan
    assert "Join" not in plan


def test_knn_graph_single_window_exchange(spark):
    """ann_knn_graph: after the block-pair GEMM partials, exactly ONE
    hash-partitioned exchange feeds the global top-k window (rank merge);
    the GEMM itself must be Arrow-batched, not row-at-a-time Python."""
    import numpy as np

    from iceberg_kafka_connect_spark.operators.similarity import (
        knn_graph_blocked,
    )

    rng = np.random.default_rng(5)
    emb = spark.createDataFrame(
        [(int(i), [float(x) for x in rng.normal(size=4)]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    out = knn_graph_blocked(emb, k=3, num_blocks=3)
    plan = plan_string(out)
    assert "BatchEvalPython" not in plan  # mapInPandas is ArrowEvalPython
    assert plan.count("+- Window (") == 1  # one global top-k merge window


def test_incremental_refresh_images_never_shuffle(spark):
    """incremental_agg_refresh: both image scans are broadcast-semi-joined
    on the touched keys — the table-sized sides contribute no Exchange
    before their partial aggregation."""
    from iceberg_kafka_connect_spark.operators.incremental import (
        aggregate_state,
        incremental_agg_refresh,
    )

    rows = [(i, "g" + str(i % 3), i) for i in range(100)]
    pre = spark.createDataFrame(rows, "k long, g string, v long")
    post = spark.createDataFrame(rows[1:] + [(999, "g0", 5)], "k long, g string, v long")
    out = incremental_agg_refresh(
        aggregate_state(pre, ["g"], ["v"]),
        pre, post,
        spark.createDataFrame([(0,), (999,)], "k long"),
        ["k"], ["g"], ["v"],
    )
    plan = plan_string(out)
    assert plan.count("BroadcastExchange") >= 1
    # semi joins keyed via broadcast: no hash-partition exchange upstream
    # of the two partial aggs (the only SinglePartition-free exchange is
    # the final group merge)
    assert "SortMergeJoin" not in plan


def test_bm25_broadcast_queries_no_global_sort(spark, sf_dir):
    """BM25 retrieval at 100 TB: the query vocabulary joins the posting
    table broadcast (the corpus never reshuffles by term for scoring) and
    top-k election is a per-query window — no global sort anywhere."""
    df = SPECS["docs_bm25_topk"].fn(spark, sf_dir)
    plan = plan_string(df)
    assert "BroadcastHashJoin" in plan
    # window sort is within hashpartitioning(qid); a global ordering would
    # show a rangepartitioning exchange
    assert "rangepartitioning" not in plan.lower(), plan
    assert "PythonUDF" not in plan


def test_boilerplate_topk_is_take_ordered_not_global_sort(spark, sf_dir):
    """The df >= min_df filter runs before any ordering and the final
    top-20 compiles to TakeOrderedAndProject (per-partition heaps + one
    driver merge), never a rangepartitioning full sort of the gram set."""
    df = SPECS["docs_boilerplate_ngrams"].fn(spark, sf_dir)
    plan = plan_string(df)
    assert "TakeOrderedAndProject" in plan, plan
    assert "rangepartitioning" not in plan.lower(), plan


def test_quality_linear_single_shuffle_no_python(spark, sf_dir):
    """The hashed linear scorer at 100 TB is one pass: per-token weights
    are pure JVM expressions (md5 + integer ops, whole-stage codegen),
    the ONLY exchange is the groupBy(id) hash aggregation with a map-side
    partial, and no Python ever runs."""
    df = SPECS["docs_quality_linear"].fn(spark, sf_dir)
    plan = plan_string(df)
    assert "PythonUDF" not in plan
    assert "rangepartitioning" not in plan.lower(), plan
    assert plan.count("hashpartitioning") == 1, plan
    # partial_count/partial_sum before the exchange = map-side combine
    assert "partial_count" in plan and "partial_sum" in plan, plan
