"""Full-PSL registrable domains: wildcard/exception rules, the
broadcast-join form, and agreement between both evaluation forms."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from iceberg_kafka_connect_spark.operators.psl import (
    default_rules,
    parse_psl,
    registrable_domain,
    with_registrable_domain,
)

CASES = {
    # plain ICANN rules
    "a.b.example.com": "example.com",
    "example.com": "example.com",
    "media.news-3.co.uk": "news-3.co.uk",
    "deep.x.com.au": "x.com.au",
    # private-section suffix: every *.github.io site is its own domain
    "me.github.io": "me.github.io",
    "pages.me.github.io": "me.github.io",
    "github.io": "github.io",  # host IS a suffix: pass through
    # wildcard rule *.ck: any <x>.ck is a public suffix
    "www.anything.ck": "www.anything.ck",
    "a.b.anything.ck": "b.anything.ck",
    # exception rule !www.ck punches through the wildcard
    "www.ck": "www.ck",
    "sub.www.ck": "www.ck",
    # wildcard *.kawasaki.jp with exception !city.kawasaki.jp
    "x.host.kawasaki.jp": "x.host.kawasaki.jp",
    "city.kawasaki.jp": "city.kawasaki.jp",
    "sub.city.kawasaki.jp": "city.kawasaki.jp",
    # ordinary .jp (kawasaki.miyagi.jp is an EXACT rule, not wildcard)
    "x.kawasaki.miyagi.jp": "x.kawasaki.miyagi.jp",
    # unknown TLD → implicit '*' rule
    "foo.bar.internal": "bar.internal",
    "localhost": "localhost",
}


def test_rules_parse_shape():
    r = default_rules()
    assert "co.uk" in r.exact[2]
    assert "github.io" in r.exact[2]
    assert "ck" in r.wild_bases[1]
    assert "kawasaki.jp" in r.wild_bases[2]
    assert "www.ck" in r.exceptions[2]
    assert "city.kawasaki.jp" in r.exceptions[3]
    assert sum(len(s) for s in r.exact.values()) > 9000  # full list, not a stub


def test_registrable_domain_expression(spark):
    df = spark.createDataFrame([(h,) for h in CASES], ["h"])
    got = [
        r.d
        for r in df.select(registrable_domain(F.col("h")).alias("d")).collect()
    ]
    assert got == list(CASES.values())


def test_registrable_domain_broadcast_join_agrees(spark):
    df = spark.createDataFrame([(h,) for h in CASES], ["h"])
    got = {
        r.h: r.domain
        for r in with_registrable_domain(df, "h").collect()
    }
    assert got == CASES


def test_parse_psl_custom_rules(spark):
    rules = parse_psl(
        """
        // comment
        com
        *.zz
        !ok.zz
        deep.multi.level.example
        """
    )
    df = spark.createDataFrame(
        [("a.b.zz",), ("sub.ok.zz",), ("x.deep.multi.level.example",)], ["h"]
    )
    got = [
        r.d
        for r in df.select(
            registrable_domain(F.col("h"), rules).alias("d")
        ).collect()
    ]
    assert got == ["a.b.zz", "ok.zz", "x.deep.multi.level.example"]


@pytest.mark.parametrize("host", ["", "nodots"])
def test_degenerate_hosts_pass_through(spark, host):
    df = spark.createDataFrame([(host,)], ["h"])
    [row] = df.select(registrable_domain(F.col("h")).alias("d")).collect()
    assert row.d == host


def test_with_registrable_domain_plan_no_corpus_shuffle(spark):
    """The scale contract: ONE broadcast hash join on the tail key — the
    corpus side never exchanges by hash, and no per-level join chain."""
    from iceberg_kafka_connect_spark.plans import count_in_plan, plan_string

    df = spark.range(0, 10_000).selectExpr(
        "concat('h', id % 97, '.example.com') AS host"
    )
    out = with_registrable_domain(df, "host")
    plan = plan_string(out)
    assert plan.count("BroadcastHashJoin") >= 1
    assert count_in_plan(out, "BroadcastHashJoin", mode="simple") == 1
    assert "Exchange hashpartitioning" not in plan, plan


def test_rules_frame_cache_keys_are_stable(spark):
    """Cache keys must survive id() reuse: the session half is the JVM
    application id, the rules half a token minted on the rules object."""
    from iceberg_kafka_connect_spark.operators.psl import (
        _RULES_DF_CACHE,
        _rules_frame,
        default_rules,
    )

    rules = default_rules()
    f1 = _rules_frame(spark, rules)
    f2 = _rules_frame(spark, rules)
    assert f1 is f2  # cache hit on repeated calls
    app_id = spark.sparkContext.applicationId
    tok = rules._df_cache_token
    assert (app_id, tok) in _RULES_DF_CACHE
    # a stale entry from another application is evicted on the next miss
    _RULES_DF_CACHE[("dead-app", "t")] = object()
    _RULES_DF_CACHE.pop((app_id, tok))
    _rules_frame(spark, rules)
    assert ("dead-app", "t") not in _RULES_DF_CACHE
