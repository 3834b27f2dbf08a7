r"""URL canonicalization and domain extraction for web-corpus curation.

A crawl-derived training corpus keys most of its curation on URLs: exact
URL dedup needs a canonical form (tracking params, fragments, case and
slash noise collapse billions of "distinct" URLs), and per-domain caps /
blocklists need the registrable domain (the label under the public
suffix), not the raw host.

Everything here is pure Spark ``Column`` expressions — regex + array
built-ins, whole-stage-codegen'd JVM work, no UDFs — so canonicalization
runs at scan speed and the canonical form can serve as a shuffle/bucket
key. Each transform is deliberately regex-primitive (not ``parse_url``)
so the DuckDB oracles in ``suite/curation.py`` reproduce it exactly.

Canonical form (documented contract, in order):
1. trim; strip the fragment (``#...``);
2. scheme and host lowercased; path/query case preserved (case-sensitive
   per RFC 3986);
3. host: strip every leading ``www.`` label (one-shot ``^(www\.)+`` so
   the transform is idempotent — a dedup KEY may merge the odd
   ``www.www.x`` host); ports are dropped entirely (crawl URLs on
   non-default ports are near-noise);
4. path: collapse ``//+`` runs to ``/``, strip trailing slashes;
5. query: split on ``&``, drop empty pairs and tracking params
   (``utm_*``, ``fbclid``, ``gclid``, ``msclkid``, ``mc_cid``,
   ``mc_eid``, ``igshid``), sort the remainder, rejoin; an emptied query
   drops its ``?``.

Reference analogue: none (the reference ships records; it doesn't curate
web corpora) — this is the CCNet/RefinedWeb-style URL-curation stage
(Penedo et al. 2023, arXiv:2306.01116 §3.1 "URL filtering").
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions import local_df

# kept in sync with the DuckDB oracle SQL in suite/curation.py
TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid|mc_cid|mc_eid|igshid)="

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTHORITY_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"

# retained for callers that want the tiny-literal expression shape; the
# real registrable_domain below uses the full vendored Mozilla PSL
# (operators/psl.py — wildcard + exception rules included)
TWO_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "co.za",
)


def _strip_fragment(url: Column) -> Column:
    return F.regexp_replace(F.trim(url), "#.*$", "")


def url_scheme(url: Column) -> Column:
    """Lowercased scheme, or NULL for non-absolute URLs."""
    s = F.regexp_extract(_strip_fragment(url), _SCHEME_RE, 1)
    return F.when(s != "", F.lower(s))


def url_host(url: Column) -> Column:
    """Lowercased host: userinfo and port dropped, one leading ``www.``
    stripped. NULL when the URL has no ``scheme://host``."""
    h = F.regexp_extract(_strip_fragment(url), _AUTHORITY_RE, 1)
    h = F.regexp_replace(h, r"^[^@]*@", "")   # userinfo
    h = F.lower(F.regexp_replace(h, r":[0-9]*$", ""))  # port
    h = F.regexp_replace(h, r"^(www\.)+", "")
    return F.when(h != "", h)


def url_path(url: Column) -> Column:
    """Path with ``//`` runs collapsed and trailing slashes stripped
    (``'' `` for a bare host). Case preserved."""
    p = F.regexp_extract(_strip_fragment(url), _PATH_RE, 1)
    return F.regexp_replace(F.regexp_replace(p, "/{2,}", "/"), "/+$", "")


def url_query_canonical(url: Column) -> Column:
    """Query string with tracking params and empty pairs dropped and the
    survivors sorted; ``''`` when nothing survives."""
    q = F.regexp_extract(_strip_fragment(url), _QUERY_RE, 1)
    pairs = F.filter(
        F.split(q, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    return F.array_join(F.array_sort(pairs), "&")


def canonicalize_url(url: Column) -> Column:
    """The canonical URL (see module contract); NULL for strings that are
    not absolute ``scheme://host`` URLs."""
    scheme, host = url_scheme(url), url_host(url)
    path, query = url_path(url), url_query_canonical(url)
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )
    return F.when(scheme.isNotNull() & host.isNotNull(), canon)


def registrable_domain(host: Column) -> Column:
    """The registrable domain of a host: the label directly under the
    public suffix plus the suffix (``media.news-3.co.uk`` →
    ``news-3.co.uk``; ``a.b.example.com`` → ``example.com``;
    ``me.github.io`` stays ``me.github.io`` — ``github.io`` is a public
    suffix). Full Mozilla PSL semantics incl. wildcard (``*.ck``) and
    exception (``!www.ck``) rules — see ``operators/psl.py``. Hosts with
    fewer labels than the suffix needs pass through unchanged."""
    from .psl import registrable_domain as _psl_registrable

    return _psl_registrable(host)


def filter_blocked_domains(
    df, url_col: str, blocklist, keep_unparseable: bool = False
):
    """Drop rows whose registrable domain is on ``blocklist`` (the
    URL-filtering stage of RefinedWeb §3.1: adult/malware/spam domain
    lists). ``blocklist`` is a small collection of registrable domains —
    broadcast anti-join, so the corpus never shuffles. Unparseable URLs
    (no scheme://host) drop by default; ``keep_unparseable`` retains them
    for a later text-level filter."""
    from pyspark.sql import functions as F

    from .psl import with_registrable_domain

    spark = df.sparkSession
    tagged = with_registrable_domain(
        df.withColumn("__host", url_host(F.col(url_col))), "__host",
        out="__dom",
    ).drop("__host")
    blocked = F.broadcast(
        local_df(spark, [(d,) for d in blocklist], "__dom string")
    )
    out = tagged.join(blocked, on="__dom", how="left_anti")
    if not keep_unparseable:
        out = out.filter(F.col("__dom").isNotNull())
    else:
        # left_anti keeps NULL __dom rows (NULL never matches) — nothing
        # further to do
        pass
    return out.drop("__dom")
