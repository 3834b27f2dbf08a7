"""Property-based PSL agreement: both Spark evaluation forms must match
an independent pure-Python implementation of the public-suffix algorithm
over generated hosts (labels drawn to collide with real rules: ICANN
two-level tails, wildcard bases, exception labels, unknown TLDs)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from iceberg_kafka_connect_spark.operators.psl import (
    default_rules,
    registrable_domain,
    with_registrable_domain,
)

LABELS = st.sampled_from(
    [
        "a", "bb", "www", "city", "example", "github", "io", "com",
        "co", "uk", "ck", "kawasaki", "jp", "miyagi", "au", "internal",
    ]
)
HOSTS = st.lists(LABELS, min_size=1, max_size=5).map(".".join)


def _py_registrable(host: str) -> str:
    """Independent reference: the publicsuffix.org algorithm, straight
    from the parsed rule sets (longest rule wins; exceptions beat
    wildcards; default rule '*')."""
    r = default_rules()
    labels = host.split(".")
    n = len(labels)

    def last(k):
        return ".".join(labels[-k:]) if k <= n else None

    ps = 1
    for k, ss in r.exact.items():
        if k != 1 and last(k) in ss and k > ps:
            ps = k
    for b, ss in r.wild_bases.items():
        if n >= b + 1 and last(b) in ss and b + 1 > ps:
            ps = b + 1
    for k in sorted(r.exceptions, reverse=True):
        if last(k) in r.exceptions[k]:
            ps = k - 1
            break
    if n > ps:
        return ".".join(labels[-(ps + 1):])
    return host  # host IS a suffix (or too short): pass through


@settings(max_examples=8, deadline=None)
@given(hosts=st.lists(HOSTS, min_size=1, max_size=25, unique=True))
def test_psl_forms_match_python_reference(spark, hosts):
    import pyspark.sql.functions as F

    df = spark.createDataFrame([(h,) for h in hosts], ["h"])
    want = {h: _py_registrable(h) for h in hosts}
    col_form = {
        r.h: r.d
        for r in df.select(
            "h", registrable_domain(F.col("h")).alias("d")
        ).collect()
    }
    join_form = {
        r.h: r.domain for r in with_registrable_domain(df, "h").collect()
    }
    assert col_form == want
    assert join_form == want
