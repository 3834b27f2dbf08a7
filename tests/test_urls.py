"""URL canonicalization / registrable-domain / bounded top-K-per-group."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from iceberg_kafka_connect_spark.operators.topk import topk_per_group
from iceberg_kafka_connect_spark.operators.urls import (
    canonicalize_url,
    registrable_domain,
    url_host,
)
from iceberg_kafka_connect_spark.plans import assert_plan, count_in_plan


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], ["u"])
    return [
        r.c
        for r in df.select(canonicalize_url(F.col("u")).alias("c")).collect()
    ]


def test_canonicalize_url_contract(spark):
    cases = {
        # case noise, tracking params, fragment, duplicate + trailing slash
        "HTTPS://WWW.News-3.Example.COM/Path//Sub/?utm_source=f&b=2&a=1#x":
            "https://news-3.example.com/Path/Sub?a=1&b=2",
        # userinfo + explicit port dropped; single-segment path slash kept
        "http://user:pw@media.site.co.uk:8080/a/":
            "http://media.site.co.uk/a",
        # bare host; empty query's '?' dropped
        "https://Example.com?": "https://example.com",
        # query survives sorted; fbclid dropped; path case preserved
        "https://h.io/A/B?z=1&fbclid=abc&a=2": "https://h.io/A/B?a=2&z=1",
        # only-tracking query collapses entirely
        "https://h.io/?utm_campaign=x&utm_medium=y": "https://h.io",
    }
    got = _canon(spark, list(cases))
    assert got == list(cases.values())


def test_canonicalize_url_null_for_non_urls(spark):
    assert _canon(spark, ["not a url", "/relative/path", ""]) == [
        None,
        None,
        None,
    ]


def test_canonical_form_is_idempotent(spark):
    urls = [
        "HTTPS://WWW.A.COM//x/?b=2&a=1#f",
        "http://u@B.co.uk:80/p/",
        "https://c.io",
    ]
    once = _canon(spark, urls)
    assert _canon(spark, once) == once


def test_registrable_domain(spark):
    cases = {
        "a.b.example.com": "example.com",
        "media.news-3.co.uk": "news-3.co.uk",
        "example.com": "example.com",
        "co.uk": "co.uk",  # host IS a suffix: pass through
        "localhost": "localhost",
        "x.com.au": "x.com.au",
        "deep.x.com.au": "x.com.au",
    }
    df = spark.createDataFrame([(h,) for h in cases], ["h"])
    got = [
        r.d
        for r in df.select(registrable_domain(F.col("h")).alias("d")).collect()
    ]
    assert got == list(cases.values())


def test_url_host_none_vs_port_only(spark):
    df = spark.createDataFrame(
        [("https://WWW.X.io:443/p",), ("nope",)], ["u"]
    )
    got = [r.h for r in df.select(url_host(F.col("u")).alias("h")).collect()]
    assert got == ["x.io", None]


def test_topk_per_group_matches_window(spark):
    import random

    random.seed(11)
    rows = [
        (f"g{random.randint(0, 7)}", random.randint(0, 500), i)
        for i in range(4000)
    ]
    df = spark.createDataFrame(rows, ["g", "score", "id"])
    got = topk_per_group(df, ["g"], [("score", "desc"), ("id", "asc")], 15)
    w = Window.partitionBy("g").orderBy(F.desc("score"), F.asc("id"))
    want = (
        df.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 15)
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_topk_per_group_small_groups_and_k1(spark):
    df = spark.createDataFrame(
        [("a", 1, 1), ("a", 2, 2), ("b", 9, 3)], ["g", "score", "id"]
    )
    got = topk_per_group(df, ["g"], [("score", "asc"), ("id", "asc")], 1)
    assert sorted((r.g, r.score, r.rk) for r in got.collect()) == [
        ("a", 1, 1),
        ("b", 9, 1),
    ]


def test_topk_per_group_desc_strings_match_window(spark):
    """Desc STRING keys (the hex byte-complement encoding) — including
    prefix pairs like 'ab' vs 'abc', which a naive complement without a
    terminator would invert wrongly."""
    import random

    random.seed(13)
    words = ["ab", "abc", "a", "zz", "z", "m", "mm", "mmm", ""]
    rows = [
        (f"g{random.randint(0, 5)}", random.choice(words), i)
        for i in range(3000)
    ]
    df = spark.createDataFrame(rows, ["g", "s", "id"])
    got = topk_per_group(df, ["g"], [("s", "desc"), ("id", "asc")], 7)
    w = Window.partitionBy("g").orderBy(F.desc("s"), F.asc("id"))
    want = (
        df.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 7)
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_topk_per_group_desc_float_nan_matches_window(spark):
    """NaN sorts FIRST under ORDER BY col DESC; the NaN pre-key keeps the
    bounded form identical to the window twin."""
    nan = float("nan")
    rows = [
        ("g", 1.5, 1), ("g", nan, 2), ("g", -2.0, 3), ("g", nan, 4),
        ("g", float("inf"), 5), ("g", float("-inf"), 6), ("g", 0.0, 7),
    ]
    df = spark.createDataFrame(rows, ["g", "x", "id"])
    got = topk_per_group(df, ["g"], [("x", "desc"), ("id", "asc")], 5)
    assert [(r.id, r.rk) for r in sorted(got.collect(), key=lambda r: r.rk)] == [
        (2, 1), (4, 2), (5, 3), (1, 4), (7, 5)
    ]


def test_topk_per_group_rejects_desc_unsupported_type(spark):
    df = spark.createDataFrame([("a", [1], 1)], ["g", "arr", "id"])
    with pytest.raises(ValueError, match="desc order on column"):
        topk_per_group(df, ["g"], [("arr", "desc"), ("id", "asc")], 3)


def test_topk_per_group_plan_no_window_sort(spark):
    """The scale contract: no Window operator (whose sort is per-group in
    one task) — two bounded aggregation levels instead."""
    df = spark.range(0, 10000).select(
        (F.col("id") % 3).alias("g"),
        (F.col("id") % 97).alias("score"),
        F.col("id"),
    )
    out = topk_per_group(df, ["g"], [("score", "desc"), ("id", "asc")], 10)
    assert_plan(out, absent=["Window"])
    assert count_in_plan(out, "ObjectHashAggregate") >= 2


def test_docs_domain_caps_plan_no_window(spark, sf_dir):
    from iceberg_kafka_connect_spark.suite import load_all

    df = load_all()["docs_domain_caps"].fn(spark, sf_dir)
    assert_plan(df, absent=["Window", "BatchEvalPython"])


def test_filter_blocked_domains(spark):
    from iceberg_kafka_connect_spark.operators.urls import (
        filter_blocked_domains,
    )
    from iceberg_kafka_connect_spark.plans import assert_plan, count_in_plan

    df = spark.createDataFrame(
        [
            ("https://www.spam-farm.com/x", 1),
            ("https://sub.spam-farm.com/y", 2),   # subdomain blocked too
            ("https://fine.org/z", 3),
            ("not a url", 4),
        ],
        ["url", "id"],
    )
    out = filter_blocked_domains(df, "url", ["spam-farm.com"])
    assert {r.id for r in out.collect()} == {3}
    kept = filter_blocked_domains(df, "url", ["spam-farm.com"],
                                  keep_unparseable=True)
    assert {r.id for r in kept.collect()} == {3, 4}
    assert count_in_plan(out, "BroadcastHashJoin") >= 1
    assert_plan(out, absent=["SortMergeJoin", "BatchEvalPython"])


def test_canonicalize_idempotent_property(spark):
    """Hypothesis: canonicalize(canonicalize(u)) == canonicalize(u) over
    generated URL-ish strings (noise prefixes, ports, params, fragments)."""
    from hypothesis import given, settings, strategies as st

    host_label = st.sampled_from(["Ex-1", "news", "WWW", "a.b"])
    tld = st.sampled_from([".COM", ".co.uk", ".io"])
    prefix = st.sampled_from(["", "www.", "USER:pw@", "Media."])
    port = st.sampled_from(["", ":443", ":8080"])
    path = st.sampled_from(["", "/", "/A//b/", "/x"])
    query = st.sampled_from(["", "?", "?b=2&a=1", "?utm_x=1", "?a=1&utm_y=2&a=1"])
    frag = st.sampled_from(["", "#f", "#"])

    @settings(max_examples=20, deadline=None)
    @given(prefix, host_label, tld, port, path, query, frag)
    def check(pre, label, t, po, pa, q, fr):
        u = f"HTTPS://{pre}{label}{t}{po}{pa}{q}{fr}"
        once = _canon(spark, [u])
        assert _canon(spark, once) == once

    check()


def test_curation_pipeline_web_plan(spark, sf_dir):
    """The composite keeps every stage's scale shape: no Window anywhere
    (dedup is groupBy+semi-join, caps is the two-level top-K), blocklist
    joins broadcast, nothing drops to Python."""
    from iceberg_kafka_connect_spark.suite import load_all

    df = load_all()["curation_pipeline_web"].fn(spark, sf_dir)
    assert_plan(df, absent=["Window", "BatchEvalPython", "CartesianProduct"])
    assert count_in_plan(df, "BroadcastHashJoin") >= 1
