"""The composite training-data curation pipeline as ONE oracle-checked
query: quality filter → exact dedup → near-dup removal → per-language
corpus stats.

This is the product use-case every individual operator exists for, composed
end-to-end. Spark-side it is a linear chain of the engine's operators; the
oracle reproduces the identical pipeline in SQL CTEs. At scale each stage is
shuffle-bounded exactly like its standalone operator: the full pipeline adds
no new shuffle beyond its parts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import dedup
from ..operators import text as tx
from . import register
from .core import davg, sql_davg, table
from .dedup import _DUCK_JACCARD_FROM_DOCS


@register(
    "curation_pipeline",
    oracle=rf"""
    WITH quality AS (
        SELECT d.doc_id, d.lang, d.n_chars, d.text,
               md5(trim(regexp_replace(lower(d.text), '\s+', ' ', 'g'))) AS digest,
               (CAST(len(string_split_regex(trim(d.text), '\s+')) AS DOUBLE)) AS n_words
        FROM documents d
        WHERE len(string_split_regex(trim(d.text), '\s+')) >= 20
    ),
    exact_kept AS (
        SELECT * FROM quality q
        WHERE q.doc_id = (SELECT MIN(q2.doc_id) FROM quality q2
                          WHERE q2.digest = q.digest)
    ),
    docs AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        FROM exact_kept
    ),
    {_DUCK_JACCARD_FROM_DOCS},
    near_dup_losers AS (
        SELECT DISTINCT id_b AS doc_id FROM jac WHERE jaccard >= 0.5
    ),
    final AS (
        SELECT * FROM exact_kept
        WHERE doc_id NOT IN (SELECT doc_id FROM near_dup_losers)
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           {sql_davg('n_words', 4)} AS avg_words
    FROM final
    GROUP BY lang
    ORDER BY lang
    """,
    tags=("curation", "bench"),
)
def curation_pipeline(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")

    # stage 1: quality floor (≥ 20 words)
    n_words = tx.word_count(F.col("text")).cast("double")
    quality = docs.withColumn("n_words", n_words).filter(F.col("n_words") >= 20)
    quality = quality.withColumn("digest", tx.fingerprint(F.col("text"))).persist()

    # stage 2: exact dedup — keep min doc_id per content digest
    keep = quality.groupBy("digest").agg(F.min("doc_id").alias("keep_id"))
    exact_kept = quality.join(
        keep,
        (quality.digest == keep.digest) & (quality.doc_id == keep.keep_id),
        "left_semi",
    ).persist()

    # stage 3: near-dup removal among the exact-dedup REPRESENTATIVES only —
    # drop the higher id of each Jaccard pair. (Pair-drop keeps two docs that
    # are only TRANSITIVELY similar through a middle doc — deliberately: they
    # are not near-dups of each other. The aggressive policy — collapse whole
    # connected components — is dedup_components/dedup_collapse.) Feeding
    # representatives (not
    # the raw corpus) to LSH is the hot-bucket fix: a cluster of f identical
    # docs would share every band bucket and emit O(f²·bands) candidates;
    # after exact dedup each cluster is one doc. MinHash-LSH with exact
    # verification: pair set identical to the all-pairs Jaccard oracle
    # (recall 1-1e-8 at s=0.5, precision 1) at a fraction of the join cost.
    losers = (
        dedup.minhash_lsh_pairs(
            exact_kept, n=3, threshold=0.5, num_hashes=128, bands=64
        )
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    final = exact_kept.join(losers, "doc_id", "left_anti")

    # stage 4: per-language corpus stats
    return (
        final.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            davg(F.col("n_words"), 4, "avg_words"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# URL curation (RefinedWeb/CCNet-style §3.1): the documents table carries no
# URL column, so both engines synthesize the same deterministic crawl-shaped
# URL per doc (case noise, www/media prefixes, default ports implied,
# tracking params, unsorted queries, duplicate slashes, fragments) and the
# gate checks the CANONICALIZATION itself — Spark's regex-primitive
# canonicalize_url vs the identical transform spelled in DuckDB SQL.
# --------------------------------------------------------------------------
_URL_SYNTH_SQL = """
        'HTTPS://'
        || CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'WWW.'
                WHEN 1 THEN 'Media.' ELSE '' END
        || source || '-' || CAST(doc_id % 7 AS VARCHAR)
        || CASE WHEN doc_id % 2 = 0 THEN '.COM' ELSE '.CO.UK' END
        || '/Articles//' || CAST(doc_id % 5 AS VARCHAR)
        || CASE CAST(doc_id % 3 AS INT)
                WHEN 0 THEN '/?utm_source=feed&b=2&a=1'
                WHEN 1 THEN '?b=2&a=1' ELSE '/' END
        || CASE WHEN doc_id % 11 = 0 THEN '#frag' ELSE '' END
"""

# DuckDB mirror of operators/urls.py (same regexes; 'g' everywhere since
# Spark's regexp_replace is always global)
_URL_CANON_SQL = r"""
    parts AS (
        SELECT doc_id,
               lower(regexp_extract(nu, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
                   AS scheme,
               regexp_replace(lower(regexp_replace(regexp_replace(
                   regexp_extract(nu,
                       '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
                   '^[^@]*@', '', 'g'), ':[0-9]*$', '', 'g')),
                   '^(www\.)+', '', 'g') AS host,
               regexp_replace(regexp_replace(
                   regexp_extract(nu,
                       '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1),
                   '/{2,}', '/', 'g'), '/+$', '', 'g') AS path,
               array_to_string(list_sort(list_filter(
                   string_split(regexp_extract(nu, '\?([^#]*)', 1), '&'),
                   x -> x <> '' AND NOT regexp_matches(x,
                       '^(utm_[^=]*|fbclid|gclid|msclkid|mc_cid|mc_eid|igshid)=')
               )), '&') AS q
        FROM stripped
    ),
    canon AS (
        SELECT doc_id,
               scheme || '://' || host || path
               || CASE WHEN q <> '' THEN '?' || q ELSE '' END AS canonical_url,
               host
        FROM parts
    )
"""


def _synth_url_col():
    d = F.col("doc_id")
    return F.concat(
        F.lit("HTTPS://"),
        F.when(d % 4 == 0, F.lit("WWW."))
        .when(d % 4 == 1, F.lit("Media."))
        .otherwise(F.lit("")),
        F.col("source"), F.lit("-"), (d % 7).cast("string"),
        F.when(d % 2 == 0, F.lit(".COM")).otherwise(F.lit(".CO.UK")),
        F.lit("/Articles//"), (d % 5).cast("string"),
        F.when(d % 3 == 0, F.lit("/?utm_source=feed&b=2&a=1"))
        .when(d % 3 == 1, F.lit("?b=2&a=1"))
        .otherwise(F.lit("/")),
        F.when(d % 11 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )


@register(
    "docs_url_canonical_dedup",
    oracle=rf"""
    WITH d AS (
        SELECT doc_id, {_URL_SYNTH_SQL} AS u FROM documents
    ),
    stripped AS (
        SELECT doc_id, regexp_replace(trim(u), '#.*$', '', 'g') AS nu FROM d
    ),
    {_URL_CANON_SQL}
    SELECT canonical_url,
           CAST(COUNT(*) AS BIGINT) AS n_dups,
           CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id
    FROM canon GROUP BY canonical_url
    """,
    tags=("curation", "urls"),
)
def docs_url_canonical_dedup(spark, sf_dir):
    # fan=False: r10 fan A/B, nofan/fan=0.56x — the scan fan-out
    # exchange costs more than the trivial map side it parallelizes
    # (interleaved best-of-3; see OPTIMIZATION_r10.md fan study)
    """Exact-URL dedup on the canonical form: tracking params, fragments,
    case/slash/port noise and www/userinfo prefixes collapse, duplicates
    group on the canonical key, the lowest doc_id is kept. One scan + one
    map-side-combined groupBy on the canonical string — the canonical key
    is also a valid bucket/shuffle key at 100 TB."""
    from ..operators.urls import canonicalize_url

    docs = table(spark, sf_dir, "documents", fan=False)
    return (
        docs.select(
            "doc_id", canonicalize_url(_synth_url_col()).alias("canonical_url")
        )
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_dups"),
            F.min("doc_id").cast("bigint").alias("keep_doc_id"),
        )
    )


@register(
    "docs_domain_caps",
    oracle=rf"""
    WITH d AS (
        SELECT doc_id, n_chars, {_URL_SYNTH_SQL} AS u FROM documents
    ),
    stripped AS (
        SELECT doc_id, regexp_replace(trim(u), '#.*$', '', 'g') AS nu FROM d
    ),
    {_URL_CANON_SQL},
    dom AS (
        SELECT c.doc_id, d.n_chars,
               CASE WHEN c.host LIKE '%.co.uk' THEN
                   CASE WHEN len(string_split(c.host, '.')) > 3
                        THEN array_to_string(string_split(c.host, '.')[-3:], '.')
                        ELSE c.host END
               ELSE
                   CASE WHEN len(string_split(c.host, '.')) > 2
                        THEN array_to_string(string_split(c.host, '.')[-2:], '.')
                        ELSE c.host END
               END AS domain
        FROM canon c JOIN d USING (doc_id)
    )
    SELECT domain, CAST(doc_id AS BIGINT) AS doc_id,
           CAST(n_chars AS BIGINT) AS n_chars, rk
    FROM (
        SELECT domain, doc_id, n_chars,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY domain ORDER BY n_chars DESC, doc_id
               ) AS INT) AS rk
        FROM dom
    ) WHERE rk <= 20
    """,
    tags=("curation", "urls"),
)
def docs_domain_caps(spark, sf_dir):
    # fan=False: r10 fan A/B, nofan/fan=0.75x — the scan fan-out
    # exchange costs more than the trivial map side it parallelizes
    # (interleaved best-of-3; see OPTIMIZATION_r10.md fan study)
    """Per-domain caps (keep the best K docs per registrable domain — the
    RefinedWeb anti-SEO-farm step), via the bounded two-level top-K of
    operators/topk.py instead of a window: no single task ever sorts a
    mega-domain. The oracle is the ROW_NUMBER window twin."""
    from ..operators.psl import with_registrable_domain
    from ..operators.topk import topk_per_group
    from ..operators.urls import url_host

    docs = table(spark, sf_dir, "documents", fan=False)
    d = with_registrable_domain(
        docs.select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.col("n_chars").cast("bigint").alias("n_chars"),
            url_host(_synth_url_col()).alias("host"),
        ),
        "host",
        out="domain",
    ).drop("host")
    return topk_per_group(
        d, ["domain"], [("n_chars", "desc"), ("doc_id", "asc")], k=20
    ).select("domain", "doc_id", "n_chars", "rk")


# --------------------------------------------------------------------------
# The WEB curation pipeline composed end-to-end (RefinedWeb §3.1 order):
# domain blocklist → canonical-URL exact dedup (keep lowest doc_id) →
# per-domain caps → per-source corpus stats. Every stage is the engine
# operator; the oracle reproduces the identical pipeline in SQL CTEs. Scale
# shape: blocklist is a broadcast anti-join, dedup is groupBy + semi-join
# (no window), caps is the bounded two-level top-K — the pipeline adds no
# shuffle beyond its parts and never sorts a whole domain in one task.
# --------------------------------------------------------------------------
@register(
    "curation_pipeline_web",
    oracle=rf"""
    WITH d AS (
        SELECT doc_id, n_chars, source, {_URL_SYNTH_SQL} AS u FROM documents
    ),
    stripped AS (
        SELECT doc_id, regexp_replace(trim(u), '#.*$', '', 'g') AS nu FROM d
    ),
    {_URL_CANON_SQL},
    dom AS (
        SELECT c.doc_id, c.canonical_url,
               CASE WHEN c.host LIKE '%.co.uk' THEN
                   CASE WHEN len(string_split(c.host, '.')) > 3
                        THEN array_to_string(string_split(c.host, '.')[-3:], '.')
                        ELSE c.host END
               ELSE
                   CASE WHEN len(string_split(c.host, '.')) > 2
                        THEN array_to_string(string_split(c.host, '.')[-2:], '.')
                        ELSE c.host END
               END AS domain
        FROM canon c
    ),
    unblocked AS (
        SELECT d.doc_id, d.n_chars, d.source, m.canonical_url, m.domain
        FROM d JOIN dom m USING (doc_id)
        WHERE m.domain NOT IN ('src0-0.com', 'src0-0.co.uk', 'src1-3.com')
    ),
    dedup AS (
        SELECT * FROM (
            SELECT u.*, MIN(doc_id) OVER (PARTITION BY canonical_url) AS keep
            FROM unblocked u
        ) WHERE doc_id = keep
    ),
    caps AS (
        SELECT * FROM (
            SELECT dedup.*,
                   ROW_NUMBER() OVER (
                       PARTITION BY domain ORDER BY n_chars DESC, doc_id
                   ) AS rk
            FROM dedup
        ) WHERE rk <= 10
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM caps GROUP BY source
    """,
    tags=("curation", "urls"),
)
def curation_pipeline_web(spark, sf_dir):
    # fan=False: r10 fan A/B, nofan/fan=0.84x — the scan fan-out
    # exchange costs more than the trivial map side it parallelizes
    # (interleaved best-of-3; see OPTIMIZATION_r10.md fan study)
    from ..operators.psl import with_registrable_domain
    from ..operators.topk import topk_per_group
    from ..operators.urls import (
        canonicalize_url,
        filter_blocked_domains,
        url_host,
    )

    docs = (
        table(spark, sf_dir, "documents", fan=False)
        .select("doc_id", "n_chars", "source")
        .withColumn("url", _synth_url_col())
    )
    unblocked = filter_blocked_domains(
        docs, "url", ["src0-0.com", "src0-0.co.uk", "src1-3.com"]
    )
    canon = unblocked.withColumn(
        "canonical_url", canonicalize_url(F.col("url"))
    )
    # window-free keep-lowest-doc_id per canonical URL: map-side-combined
    # min + semi-join back (the canonical key never sorts in one task)
    keep = canon.groupBy("canonical_url").agg(F.min("doc_id").alias("doc_id"))
    dedup = canon.join(keep, ["canonical_url", "doc_id"], "left_semi")
    dom = with_registrable_domain(
        dedup.withColumn("host", url_host(F.col("url"))), "host",
        out="domain",
    ).drop("host")
    caps = topk_per_group(
        dom.select("doc_id", "n_chars", "source", "domain"),
        ["domain"],
        [("n_chars", "desc"), ("doc_id", "asc")],
        k=10,
    )
    return caps.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
    )


# --------------------------------------------------------------------------
# X95: full-PSL registrable domains. Hosts hitting every PSL rule class —
# plain ICANN, private-section suffix (github.io), wildcard (*.ck),
# exception (!www.ck), Japanese city wildcard + its exception — are
# synthesized per doc; Spark runs the real PSL expression
# (operators/psl.py, vendored Mozilla list) and the oracle states the
# hand-derived expected registrable domain for each host class, so the
# gate pins the ALGORITHM (longest rule, wildcards, exceptions), not a
# reimplementation of it.
# --------------------------------------------------------------------------
_PSL_HOSTS = [
    # (host, expected registrable domain)
    ("a.b.example.com", "example.com"),          # plain ICANN
    ("pages.me.github.io", "me.github.io"),      # private-section suffix
    ("sub.www.ck", "www.ck"),                    # !www.ck exception
    ("a.b.anything.ck", "b.anything.ck"),        # *.ck wildcard
    ("sub.city.kawasaki.jp", "city.kawasaki.jp"),  # !city.kawasaki.jp
    ("x.host.kawasaki.jp", "x.host.kawasaki.jp"),  # *.kawasaki.jp wildcard
    ("x.kawasaki.miyagi.jp", "x.kawasaki.miyagi.jp"),  # exact 3-label rule
    ("deep.x.com.au", "x.com.au"),               # exact 2-label rule
    ("foo.bar.internal", "bar.internal"),        # unknown TLD → default '*'
]


def _psl_host_col():
    d = F.col("doc_id") % len(_PSL_HOSTS)
    expr = None
    for i, (h, _) in enumerate(_PSL_HOSTS):
        expr = (
            F.when(d == i, F.lit(h))
            if expr is None
            else expr.when(d == i, F.lit(h))
        )
    return expr


_PSL_HOST_SQL = "CASE CAST(doc_id % {n} AS INT) {whens} END".format(
    n=len(_PSL_HOSTS),
    whens=" ".join(
        f"WHEN {i} THEN '{h}'" for i, (h, _) in enumerate(_PSL_HOSTS)
    ),
)
_PSL_EXPECT_SQL = "CASE CAST(doc_id % {n} AS INT) {whens} END".format(
    n=len(_PSL_HOSTS),
    whens=" ".join(
        f"WHEN {i} THEN '{e}'" for i, (_, e) in enumerate(_PSL_HOSTS)
    ),
)


@register(
    "docs_psl_registrable",
    oracle=f"""
    SELECT {_PSL_HOST_SQL} AS host,
           {_PSL_EXPECT_SQL} AS domain,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents
    GROUP BY 1, 2
    """,
    tags=("curation", "urls"),
)
def docs_psl_registrable(spark, sf_dir):
    """Registrable-domain extraction under the full vendored Mozilla PSL
    (broadcast-join form: exact rules as a per-level broadcast lookup,
    wildcard/exception rules as tiny InSet probes — no UDF, no shuffle of
    the corpus), grouped to per-domain counts. The oracle hand-states the
    expected domain per host class."""
    from ..operators.psl import with_registrable_domain

    docs = table(spark, sf_dir, "documents")
    return (
        with_registrable_domain(
            docs.select(_psl_host_col().alias("host")), "host"
        )
        .groupBy("host", "domain")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )


# --------------------------------------------------------------------------
# X96: per-domain "newest first" caps — the desc-STRING ordering path of
# the bounded top-K (hex byte-complement encoding; operators/topk.py). A
# crawl keeps the K most RECENT pages per registrable domain: order by a
# date string descending, doc_id ascending tiebreak. The oracle is the
# ROW_NUMBER window twin, so the gate pins the string-desc encoding
# against the engine-independent semantics.
# --------------------------------------------------------------------------
@register(
    "docs_domain_caps_recent",
    oracle=rf"""
    WITH d AS (
        SELECT doc_id, n_chars, {_URL_SYNTH_SQL} AS u,
               strftime(DATE '2025-01-01' + INTERVAL (doc_id % 400) DAY,
                        '%Y-%m-%d') AS crawl_date
        FROM documents
    ),
    stripped AS (
        SELECT doc_id, regexp_replace(trim(u), '#.*$', '', 'g') AS nu FROM d
    ),
    {_URL_CANON_SQL},
    dom AS (
        SELECT c.doc_id, d.crawl_date,
               CASE WHEN c.host LIKE '%.co.uk' THEN
                   CASE WHEN len(string_split(c.host, '.')) > 3
                        THEN array_to_string(string_split(c.host, '.')[-3:], '.')
                        ELSE c.host END
               ELSE
                   CASE WHEN len(string_split(c.host, '.')) > 2
                        THEN array_to_string(string_split(c.host, '.')[-2:], '.')
                        ELSE c.host END
               END AS domain
        FROM canon c JOIN d USING (doc_id)
    )
    SELECT domain, CAST(doc_id AS BIGINT) AS doc_id, crawl_date, rk
    FROM (
        SELECT domain, doc_id, crawl_date,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY domain ORDER BY crawl_date DESC, doc_id
               ) AS INT) AS rk
        FROM dom
    ) WHERE rk <= 5
    """,
    tags=("curation", "urls"),
)
def docs_domain_caps_recent(spark, sf_dir):
    from ..operators.psl import with_registrable_domain
    from ..operators.topk import topk_per_group
    from ..operators.urls import url_host

    docs = table(spark, sf_dir, "documents")
    d = with_registrable_domain(
        docs.select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.date_format(
                F.date_add(F.lit("2025-01-01").cast("date"),
                           (F.col("doc_id") % 400).cast("int")),
                "yyyy-MM-dd",
            ).alias("crawl_date"),
            url_host(_synth_url_col()).alias("host"),
        ),
        "host",
        out="domain",
    ).drop("host")
    return topk_per_group(
        d, ["domain"], [("crawl_date", "desc"), ("doc_id", "asc")], k=5
    ).select("domain", "doc_id", "crawl_date", "rk")
