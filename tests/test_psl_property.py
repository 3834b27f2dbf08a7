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


# ---------------------------------------------------------------------------
# Adversarial cases from the publicsuffix.org "Test data" corpus
# (https://publicsuffix.org/list/ → checkPublicSuffix vectors), adapted to
# this module's contract: hosts are lowercased by callers, and a host that
# IS a public suffix (the corpus' null cases) passes through unchanged.
# Mixed case exercises the caller-side lower(); IDN rows exercise
# unicode-label rules (the vendored list carries them verbatim) and their
# punycode twins exercise xn-- labels.
# ---------------------------------------------------------------------------
PSL_CORPUS = [
    # (host-as-seen, expected registrable domain after lower())
    ("COM", "com"),
    ("example.COM", "example.com"),
    ("WwW.example.COM", "example.com"),
    ("example", "example"),
    ("example.example", "example.example"),
    ("biz", "biz"),
    ("domain.biz", "domain.biz"),
    ("uk.com", "uk.com"),
    ("example.uk.com", "example.uk.com"),
    ("b.example.uk.com", "example.uk.com"),
    ("test.ac", "test.ac"),
    # *.mm wildcard
    ("mm", "mm"),
    ("c.mm", "c.mm"),
    ("b.c.mm", "b.c.mm"),
    ("a.b.c.mm", "b.c.mm"),
    # jp with geo rules
    ("jp", "jp"),
    ("test.jp", "test.jp"),
    ("www.test.jp", "test.jp"),
    ("ac.jp", "ac.jp"),
    ("test.ac.jp", "test.ac.jp"),
    ("www.test.ac.jp", "test.ac.jp"),
    ("kyoto.jp", "kyoto.jp"),
    ("test.kyoto.jp", "test.kyoto.jp"),
    ("ide.kyoto.jp", "ide.kyoto.jp"),
    ("b.ide.kyoto.jp", "b.ide.kyoto.jp"),
    ("a.b.ide.kyoto.jp", "b.ide.kyoto.jp"),
    # *.kobe.jp wildcard + !city.kobe.jp exception
    ("c.kobe.jp", "c.kobe.jp"),
    ("b.c.kobe.jp", "b.c.kobe.jp"),
    ("a.b.c.kobe.jp", "b.c.kobe.jp"),
    ("city.kobe.jp", "city.kobe.jp"),
    ("www.city.kobe.jp", "city.kobe.jp"),
    # *.ck wildcard + !www.ck exception
    ("ck", "ck"),
    ("test.ck", "test.ck"),
    ("b.test.ck", "b.test.ck"),
    ("a.b.test.ck", "b.test.ck"),
    ("www.ck", "www.ck"),
    ("www.www.ck", "www.ck"),
    # us k12
    ("us", "us"),
    ("test.us", "test.us"),
    ("www.test.us", "test.us"),
    ("ak.us", "ak.us"),
    ("test.ak.us", "test.ak.us"),
    ("www.test.ak.us", "test.ak.us"),
    ("k12.ak.us", "k12.ak.us"),
    ("test.k12.ak.us", "test.k12.ak.us"),
    ("www.test.k12.ak.us", "test.k12.ak.us"),
    # IDN labels (unicode rules are in the list verbatim)
    ("食狮.com.cn", "食狮.com.cn"),
    ("食狮.公司.cn", "食狮.公司.cn"),
    ("www.食狮.公司.cn", "食狮.公司.cn"),
    ("shishi.公司.cn", "shishi.公司.cn"),
    ("公司.cn", "公司.cn"),
    ("食狮.中国", "食狮.中国"),
    ("www.食狮.中国", "食狮.中国"),
    ("shishi.中国", "shishi.中国"),
    ("中国", "中国"),
    # punycoded twins
    ("xn--85x722f.com.cn", "xn--85x722f.com.cn"),
    ("xn--85x722f.xn--55qx5d.cn", "xn--85x722f.xn--55qx5d.cn"),
    ("www.xn--85x722f.xn--55qx5d.cn", "xn--85x722f.xn--55qx5d.cn"),
    ("shishi.xn--55qx5d.cn", "shishi.xn--55qx5d.cn"),
    ("xn--55qx5d.cn", "xn--55qx5d.cn"),
    ("xn--85x722f.xn--fiqs8s", "xn--85x722f.xn--fiqs8s"),
    ("www.xn--85x722f.xn--fiqs8s", "xn--85x722f.xn--fiqs8s"),
    ("shishi.xn--fiqs8s", "shishi.xn--fiqs8s"),
    ("xn--fiqs8s", "xn--fiqs8s"),
]


def test_psl_corpus_vectors_both_forms(spark):
    """Both evaluation forms agree with the corpus AND the pure-Python
    reference on every adversarial vector."""
    import pyspark.sql.functions as F

    rows = [(raw.lower(), want) for raw, want in PSL_CORPUS]
    for host, want in rows:
        assert _py_registrable(host) == want, host
    df = spark.createDataFrame(rows, ["h", "want"])
    col_form = df.select(
        "h", "want", registrable_domain(F.col("h")).alias("d")
    )
    bad = [
        (r.h, r.want, r.d)
        for r in col_form.collect()
        if r.d != r.want
    ]
    assert not bad, f"Column form mismatches: {bad}"
    join_form = with_registrable_domain(df, "h", out="d")
    bad = [
        (r.h, r.want, r.d)
        for r in join_form.collect()
        if r.d != r.want
    ]
    assert not bad, f"Join form mismatches: {bad}"
