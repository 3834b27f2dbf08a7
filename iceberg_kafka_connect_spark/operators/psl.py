r"""Public-Suffix-List registrable domains, evaluated inside Catalyst.

Per-domain caps, blocklists and host-level dedup all key on the
REGISTRABLE domain (the label directly under the public suffix), and
getting that right needs the full Mozilla Public Suffix List — a
two-level heuristic mis-groups every ``github.io`` site into one
"domain" and splits ``*.kawasaki.jp`` municipalities wrongly.

The vendored snapshot (``data/public_suffix_list.dat``, MPL 2.0, from
the Debian ``publicsuffix`` package — the standard
https://publicsuffix.org/list/ file) parses once per process into
per-level rule sets:

- exact rules (``co.uk``, ``github.io``) at label-levels 1..5;
- wildcard rules (``*.ck``, ``*.kawasaki.jp``) as their base suffix —
  a match at base level ``b`` makes the public suffix ``b+1`` labels;
- exception rules (``!www.ck``, ``!city.kawasaki.jp``) which punch
  through a wildcard: a level-``k`` exception match caps the public
  suffix at ``k-1`` labels;
- the implicit default rule ``*`` (an unknown TLD is its own suffix).

Longest matching rule wins; exceptions beat wildcards (the standard
PSL algorithm, https://publicsuffix.org/list/ "Algorithm").

Two evaluation forms, same results:

- ``with_registrable_domain(df, host_col)`` — THE production form: the
  exact rules become a tiny broadcast table joined per candidate level
  (map-side only, no shuffle of ``df``), so the query plan stays small
  no matter the list size and the rule set ships to executors once as
  a broadcast, not per-task in the serialized plan. The rules frame is
  cached per session, so repeated calls pay nothing to build.
- ``registrable_domain(host)`` — a pure ``Column`` expression for
  ad-hoc use and tests. The exact-rule sets become ``isin``
  predicates, which Catalyst converts to ``InSet`` (hash-set
  membership, NOT unrolled comparisons), so EXECUTION is one set probe
  per level — but CONSTRUCTION crosses py4j once per literal (~6 s for
  the ~9.4k rules), so hot paths should use the join form above.

Hosts with no labels under their public suffix (``co.uk`` itself,
``localhost``) pass through unchanged — same contract as the previous
two-level subset, so existing dedup keys are stable.

Reference analogue: none (curation-layer extension; RefinedWeb §3.1
keys its URL stages on exactly this grouping).
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass
from functools import lru_cache

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import local_df

_DATA_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data",
    "public_suffix_list.dat",
)


@dataclass(frozen=True)
class PSLRules:
    """Parsed rule sets, keyed by label count ("level")."""

    exact: dict[int, frozenset[str]]      # rule text, e.g. {"co.uk", ...}
    wild_bases: dict[int, frozenset[str]]  # "*.ck" stored as {"ck"}
    exceptions: dict[int, frozenset[str]]  # "!www.ck" stored as {"www.ck"}

    @property
    def max_exact_level(self) -> int:
        return max(self.exact, default=1)

    @property
    def max_wild_base_level(self) -> int:
        return max(self.wild_bases, default=0)

    @property
    def max_exception_level(self) -> int:
        return max(self.exceptions, default=0)


def _punycode_twin(rule: str) -> str | None:
    """ASCII (xn--) twin of a rule containing non-ASCII labels, or None
    when the rule is pure ASCII / unencodable. Crawled hostnames arrive
    punycoded (IDNA wire form), while the PSL publishes unicode rules —
    registering both spellings lets either form of a host match
    (publicsuffix.org test corpus: ``xn--85x722f.xn--55qx5d.cn`` groups
    exactly like ``食狮.公司.cn``)."""
    if rule.isascii():
        return None
    try:
        return ".".join(
            lbl if lbl.isascii() else lbl.encode("idna").decode("ascii")
            for lbl in rule.split(".")
        )
    except UnicodeError:
        return None


def parse_psl(text: str) -> PSLRules:
    """Parse the standard PSL file format: one rule per line, ``//``
    comment lines, blank lines ignored; ``*.`` wildcard and ``!``
    exception markers; ICANN and PRIVATE sections both included (the
    Mozilla algorithm's default). Non-ASCII rules also register their
    punycode twins so IDNA-wire-form hosts match."""
    exact: dict[int, set[str]] = {}
    wild: dict[int, set[str]] = {}
    exc: dict[int, set[str]] = {}

    def _add(sets: dict[int, set[str]], rule: str) -> None:
        sets.setdefault(rule.count(".") + 1, set()).add(rule)
        twin = _punycode_twin(rule)
        if twin:
            sets.setdefault(twin.count(".") + 1, set()).add(twin)

    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("//"):
            continue
        # rules are defined lowercase; hosts are lowercased by callers
        line = line.lower()
        if line.startswith("!"):
            _add(exc, line[1:])
        elif line.startswith("*."):
            _add(wild, line[2:])
        else:
            _add(exact, line)
    return PSLRules(
        exact={k: frozenset(v) for k, v in exact.items()},
        wild_bases={k: frozenset(v) for k, v in wild.items()},
        exceptions={k: frozenset(v) for k, v in exc.items()},
    )


@lru_cache(maxsize=1)
def default_rules() -> PSLRules:
    with open(_DATA_PATH, encoding="utf-8") as f:
        return parse_psl(f.read())


def _last_k(labels: Column, k: int) -> Column:
    """The last ``k`` labels joined — '' when the host is shorter."""
    return F.array_join(F.slice(labels, -k, k), ".")


def public_suffix_len(host: Column, rules: PSLRules | None = None) -> Column:
    """Label count of ``host``'s public suffix under ``rules`` (INT).
    Pure expression form; see module docstring for the InSet shape."""
    rules = rules or default_rules()
    labels = F.split(host, r"\.")
    last = {
        k: _last_k(labels, k)
        for k in range(
            1,
            max(
                rules.max_exact_level,
                rules.max_wild_base_level + 1,
                rules.max_exception_level,
            )
            + 1,
        )
    }
    # longest matching rule wins → the when-chain must TEST longest
    # levels first (chained .when evaluates in construction order); exact
    # level-1 rules coincide with the implicit default '*' (ps_len 1)
    def _chain(conds: list[tuple[Column, int]], default: int) -> Column:
        expr = None
        for cond, val in conds:  # callers pass longest-first
            expr = F.when(cond, F.lit(val)) if expr is None else expr.when(
                cond, F.lit(val)
            )
        return F.lit(default) if expr is None else expr.otherwise(F.lit(default))

    matched = _chain(
        [
            (last[k].isin(*sorted(rules.exact[k])), k)
            for k in sorted(rules.exact, reverse=True)
            if k != 1
        ],
        1,
    )
    wild_ps = _chain(
        [
            (last[b].isin(*sorted(rules.wild_bases[b])), b + 1)
            for b in sorted(rules.wild_bases, reverse=True)
        ],
        1,
    )
    ps = F.greatest(matched, wild_ps)
    # exceptions beat wildcards: a level-k exception match caps at k-1;
    # longest exception first, then fall through to the wildcard result
    for k in sorted(rules.exceptions):
        ps = F.when(
            last[k].isin(*sorted(rules.exceptions[k])), F.lit(k - 1)
        ).otherwise(ps)
    return ps.cast("int")


def registrable_domain(host: Column, rules: PSLRules | None = None) -> Column:
    """The registrable domain of a (lowercased) host under the full PSL:
    ``a.b.example.com`` → ``example.com``; ``me.github.io`` →
    ``me.github.io`` (``github.io`` is a public suffix);
    ``x.www.ck`` → ``www.ck`` (the ``!www.ck`` exception). Hosts that
    ARE a public suffix (or have no dots under it) pass through."""
    rules = rules or default_rules()
    labels = F.split(host, r"\.")
    n = F.size(labels)
    ps = public_suffix_len(host, rules)
    take = ps + F.lit(1)
    return F.when(n > ps, F.array_join(F.slice(labels, -take, take), ".")).otherwise(
        host
    )


_RULES_DF_CACHE: dict[tuple[str, str], object] = {}


def _rules_frame(spark, rules: PSLRules):
    """Every exact rule of level >= 2, grouped by its last-2-label tail:
    ``(tail2, rs: array<struct<suffix, ps_len>>)``. A host's own last-2
    candidate probes the table ONCE (one broadcast hash join); the ≤5
    rules sharing that tail are then tested per row with a tiny array
    filter. Wildcards/exceptions (107 / 8 rules) stay literal ``isin``
    sets. Cached per (session, rules) so repeated queries reuse the same
    local relation. Neither key half uses ``id()`` — CPython reuses ids
    after GC, which could hand a new session a DataFrame bound to a
    stopped one (or the wrong rule set): the session half is the JVM
    application id, the rules half a uuid token minted once per rules
    object (dies with it, never reused). Entries from other applications
    are evicted on the next miss."""
    tok = getattr(rules, "_df_cache_token", None)
    if tok is None:
        tok = uuid.uuid4().hex
        object.__setattr__(rules, "_df_cache_token", tok)
    key = (spark.sparkContext.applicationId, tok)
    cached = _RULES_DF_CACHE.get(key)
    if cached is not None:
        return cached
    # one app at a time in practice: drop entries from other sessions so
    # the cache can't accumulate dead-session frames across restarts
    for k in [k for k in _RULES_DF_CACHE if k[0] != key[0]]:
        del _RULES_DF_CACHE[k]
    grouped: dict[str, list[tuple[str, int]]] = {}
    for k, ss in rules.exact.items():
        if k < 2:
            continue
        for s in ss:
            tail2 = ".".join(s.split(".")[-2:])
            grouped.setdefault(tail2, []).append((s, k))
    df = local_df(spark, 
        sorted((t, sorted(v)) for t, v in grouped.items()),
        "__psl_tail2 string, __psl_rs array<struct<suffix string, ps_len int>>",
    )
    _RULES_DF_CACHE[key] = df
    return df


def _sql_str(v: str) -> str:
    """A Spark SQL string literal for ``v`` (default non-ANSI escaping)."""
    return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _domain_expr_sql(rules: PSLRules, host_sql: str) -> str:
    """The registrable-domain expression as ONE SQL string over
    ``host_sql`` + the joined ``__psl_rs`` rule array — the identical
    expression tree ``with_registrable_domain`` used to compose
    Column-by-Column (same functions, same branch order, same literal
    sets), parsed in a single py4j round-trip instead of one per literal
    (~300 round-trips, ~0.2s of driver time per call for the 107
    wildcard + 8 exception rules)."""
    labels = f"split({host_sql}, '\\\\.')"

    def last_k(k: int) -> str:
        return f"array_join(slice({labels}, -{k}, {k}), '.')"

    def in_list(k: int, values) -> str:
        items = ", ".join(_sql_str(s) for s in sorted(values))
        return f"{last_k(k)} IN ({items})"

    # a candidate rule matches when the host's last ps_len labels ARE the
    # rule; the longest match wins (array_max), other lanes merge below
    exact_ps = (
        "array_max(transform(filter(__psl_rs, "
        f"e -> array_join(slice({labels}, -e.ps_len, e.ps_len), '.') = e.suffix), "
        "e -> e.ps_len))"
    )
    # ascending iteration + wrapping ⇒ the LONGEST level is the
    # outermost (first-evaluated) branch — longest matching rule wins
    wild_ps = "1"
    for b in sorted(rules.wild_bases):
        wild_ps = (
            f"CASE WHEN {in_list(b, rules.wild_bases[b])} "
            f"THEN {b + 1} ELSE {wild_ps} END"
        )
    ps = f"greatest(1, {wild_ps}, coalesce({exact_ps}, 1))"
    for k in sorted(rules.exceptions):
        ps = (
            f"CASE WHEN {in_list(k, rules.exceptions[k])} "
            f"THEN {k - 1} ELSE {ps} END"
        )
    return (
        f"CASE WHEN size({labels}) > ({ps}) "
        f"THEN array_join(slice({labels}, -(({ps}) + 1), ({ps}) + 1), '.') "
        f"ELSE {host_sql} END"
    )


def with_registrable_domain(
    df: DataFrame,
    host_col: str,
    out: str = "domain",
    rules: PSLRules | None = None,
) -> DataFrame:
    """Broadcast-join form of ``registrable_domain``: appends ``out``
    without growing the query plan by the rule list. ONE broadcast hash
    join (on the host's last-2-label tail; map-side, no shuffle of
    ``df``) retrieves the ≤5 exact rules sharing that tail, which a tiny
    per-row array filter then tests — every exact rule of any level is
    found through its tail, so one probe replaces one-join-per-level.
    The wildcard/exception CASE chain is built as one parsed SQL string
    (see _domain_expr_sql) — identical expression tree, one py4j
    round-trip."""
    rules = rules or default_rules()
    spark = df.sparkSession
    rf = _rules_frame(spark, rules)
    host_sql = f"`{host_col}`"
    labels_sql = f"split({host_sql}, '\\\\.')"
    work = (
        df.withColumn(
            "__psl_tail2",
            F.expr(f"array_join(slice({labels_sql}, -2, 2), '.')"),
        )
        .join(F.broadcast(rf), on="__psl_tail2", how="left")
        .drop("__psl_tail2")
    )
    dom = F.expr(_domain_expr_sql(rules, host_sql))
    return work.withColumn(out, dom).drop("__psl_rs")
