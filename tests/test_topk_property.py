"""Property-based parity: the bounded two-level top-K-per-group must equal
the ROW_NUMBER window for arbitrary group/score layouts — ties on the
score (broken by the unique id), groups smaller than K, single-group
inputs, and K of 1."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from iceberg_kafka_connect_spark.operators.topk import topk_per_group

GROUPS = st.sampled_from(["g0", "g1", "g2"])
SCORES = st.integers(min_value=0, max_value=5)  # small range → many ties
# ties, prefix pairs ("m" / "mm"), empty strings — the hex-complement
# encoding's hard cases
WORDS = st.sampled_from(["", "a", "ab", "abc", "m", "mm", "z", "zz"])


@settings(max_examples=15, deadline=None)
@given(
    rows=st.lists(st.tuples(GROUPS, SCORES), min_size=1, max_size=40),
    k=st.integers(min_value=1, max_value=6),
    direction=st.sampled_from(["asc", "desc"]),
)
def test_topk_matches_window(spark, rows, k, direction):
    data = [(g, s, i) for i, (g, s) in enumerate(rows)]
    df = spark.createDataFrame(data, "g string, score long, id long")
    got = topk_per_group(df, ["g"], [("score", direction), ("id", "asc")], k)
    order = (
        [F.asc("score"), F.asc("id")]
        if direction == "asc"
        else [F.desc("score"), F.asc("id")]
    )
    w = Window.partitionBy("g").orderBy(*order)
    want = (
        df.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= k)
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


@settings(max_examples=15, deadline=None)
@given(
    rows=st.lists(st.tuples(GROUPS, WORDS), min_size=1, max_size=40),
    k=st.integers(min_value=1, max_value=6),
    direction=st.sampled_from(["asc", "desc"]),
)
def test_topk_matches_window_string_keys(spark, rows, k, direction):
    data = [(g, s, i) for i, (g, s) in enumerate(rows)]
    df = spark.createDataFrame(data, "g string, word string, id long")
    got = topk_per_group(df, ["g"], [("word", direction), ("id", "asc")], k)
    order = (
        [F.asc("word"), F.asc("id")]
        if direction == "asc"
        else [F.desc("word"), F.asc("id")]
    )
    w = Window.partitionBy("g").orderBy(*order)
    want = (
        df.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= k)
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
