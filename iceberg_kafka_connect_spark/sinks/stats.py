"""Per-file column statistics and scan-time file pruning.

Iceberg stores lower/upper bounds per column in every manifest entry and its
scan planner skips files whose bounds can't satisfy the residual predicate
(core/src/main/java/org/apache/iceberg in the Iceberg runtime the reference
writes through; the reference itself delegates planning entirely to that
library). Same semantics here, Spark-first:

- at commit time each parquet data file's footer already carries row-group
  min/max statistics; we fold them to one (min, max) per top-level column
  and record them in the file's manifest entry;
- at scan time a conjunctive predicate is evaluated *intervally* against the
  bounds: a file survives unless some conjunct is provably false over the
  whole [min, max] range. Pruning is best-effort and conservative — any
  unparseable conjunct, OR-term, or missing stat keeps the file — and the
  full predicate is always re-applied to the rows, so correctness never
  depends on the stats.

Scale note: footers are O(KB) regardless of file size, but reading thousands
of them serially on the driver would bottleneck commits on a 1000-executor
cluster — there, this fold runs as a `mapPartitions` over the file list (the
same place Iceberg's manifest-writing executors do it). At local test scale
the driver loop is fine and keeps the commit path simple.
"""

from __future__ import annotations

import datetime as _dt
import re
from decimal import Decimal
from typing import Any

# ---------------------------------------------------------------- collection


def _norm(v: Any) -> tuple[str, Any] | None:
    """Normalize a pyarrow statistics value to (type-tag, JSON-safe value).

    Only totally-ordered primitive domains participate in pruning; anything
    else (bytes, nested) is skipped.
    """
    if isinstance(v, bool):  # bool before int: bool is an int subclass
        return None
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, float):
        # NaN poisons interval comparisons (every predicate test would be
        # False → wrongful pruning); a column whose bounds touch NaN simply
        # doesn't participate
        if v != v:
            return None
        return ("f", v)
    if isinstance(v, str):
        return ("s", v)
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc)
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, _dt.date):
        return ("d", v.isoformat())
    if isinstance(v, Decimal):
        return ("f", float(v))
    return None


def collect_parquet_stats(path: str) -> dict[str, dict] | None:
    """Fold a parquet file's row-group statistics to per-column bounds:
    ``{col: {"t": tag, "min": v, "max": v}}``. Columns with any stats-less
    row group are omitted (their bounds would be partial, hence unsafe)."""
    try:
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(path)
        md = pf.metadata
    except Exception:
        # pyarrow's thrift deserializer rejects logical types newer than
        # the wheel (Spark 4 VARIANT columns); thrift itself is
        # forward-compatible, so fall back to the protocol-level footer
        # walk — exact rows (correctness-critical) AND per-column bounds
        # (so the typed columns beside a variant still prune; pinned
        # against the pyarrow fold in tests/test_variant.py).
        try:
            from .parquet_footer import footer_column_stats

            return footer_column_stats(path)
        except Exception:
            return None
    rows = md.num_rows
    agg: dict[str, dict] = {}
    dead: set[str] = set()
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema
            if "." in name or name in dead:
                continue
            try:
                st = col.statistics
                has = st is not None and st.has_min_max
                # .min/.max cast lazily and can ALSO raise for types
                # pyarrow can't extract (ArrowNotImplementedError)
                lo, hi = (
                    (_norm(st.min), _norm(st.max)) if has else (None, None)
                )
            except Exception:
                # no bounds for this column, never a failed commit
                has = False
            if not has:
                dead.add(name)
                agg.pop(name, None)
                continue
            if lo is None or hi is None or lo[0] != hi[0]:
                dead.add(name)
                agg.pop(name, None)
                continue
            cur = agg.get(name)
            if cur is None:
                agg[name] = {"t": lo[0], "min": lo[1], "max": hi[1]}
            elif cur["t"] != lo[0]:
                dead.add(name)
                agg.pop(name, None)
            else:
                cur["min"] = min(cur["min"], lo[1])
                cur["max"] = max(cur["max"], hi[1])
    return {"rows": rows, "cols": agg}


# ------------------------------------------------------------------- pruning

_LIT = r"""
    (?P<dt>(?:DATE|TIMESTAMP)\s*'[^']*')
  | (?P<str>'[^']*')
  | (?P<num>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
"""

_CMP_RE = re.compile(
    rf"^\s*(?P<col>[A-Za-z_][A-Za-z_0-9]*)\s*(?P<op><=|>=|!=|<>|=|<|>)"
    rf"\s*(?:{_LIT})\s*$",
    re.VERBOSE,
)
_IN_RE = re.compile(
    r"^\s*(?P<col>[A-Za-z_][A-Za-z_0-9]*)\s+IN\s*\((?P<body>[^()]*)\)\s*$",
    re.IGNORECASE,
)
_LIT_RE = re.compile(rf"^\s*(?:{_LIT})\s*$", re.VERBOSE)
_NULLCHECK_RE = re.compile(
    r"^\s*[A-Za-z_][A-Za-z_0-9]*\s+IS\s+(?:NOT\s+)?NULL\s*$", re.IGNORECASE
)


def _parse_lit(m: re.Match) -> tuple[str, Any] | None:
    if m.group("num") is not None:
        txt = m.group("num")
        return ("f", float(txt)) if re.search(r"[.eE]", txt) else ("i", int(txt))
    if m.group("str") is not None:
        return ("s", m.group("str")[1:-1])
    txt = m.group("dt")
    body = txt[txt.index("'") + 1 : -1]
    if txt.lstrip().upper().startswith("DATE"):
        return ("d", body)
    try:
        ts = _dt.datetime.fromisoformat(body)
    except ValueError:
        return None
    # stored bounds are UTC wall-clock; a tz-offset literal must be
    # CONVERTED to UTC (stripping the offset alone would shift the
    # comparison by the offset and prune files that contain matches)
    if ts.tzinfo is not None:
        ts = ts.astimezone(_dt.timezone.utc)
    return ("ts", ts.replace(tzinfo=None).isoformat())


def _comparable(tag_s: str, lo: Any, hi: Any, tag_l: str, lit: Any):
    """Bring stat bounds and a literal into one comparable domain, or None."""
    num = {"i", "f"}
    if tag_s in num and tag_l in num:
        lo, hi, lit = float(lo), float(hi), float(lit)
        # NaN anywhere (e.g. bounds recorded before the collection-time
        # guard) makes every comparison False → wrongful pruning; bail out
        if lo != lo or hi != hi or lit != lit:
            return None
        return lo, hi, lit
    if tag_s != tag_l:
        return None
    return lo, hi, lit  # str / iso-date / iso-timestamp: lexicographic == temporal


def _conjunct_may_match(expr: str, cols: dict[str, dict]) -> bool:
    """Interval evaluation of one conjunct; True (keep) when in doubt."""
    if _NULLCHECK_RE.match(expr):
        return True  # bounds say nothing about null presence
    m = _IN_RE.match(expr)
    if m:
        st = cols.get(m.group("col"))
        if st is None:
            return True
        for part in m.group("body").split(","):
            lm = _LIT_RE.match(part)
            if lm is None:
                return True
            lit = _parse_lit(lm)
            if lit is None:
                return True
            dom = _comparable(st["t"], st["min"], st["max"], *lit)
            if dom is None:
                return True
            lo, hi, v = dom
            if lo <= v <= hi:
                return True
        return False
    m = _CMP_RE.match(expr)
    if m is None:
        return True
    st = cols.get(m.group("col"))
    if st is None:
        return True
    lit = _parse_lit(m)
    if lit is None:
        return True
    dom = _comparable(st["t"], st["min"], st["max"], *lit)
    if dom is None:
        return True
    lo, hi, v = dom
    op = m.group("op")
    if op == "=":
        return lo <= v <= hi
    if op in ("!=", "<>"):
        return not (lo == hi == v)
    if op == "<":
        return lo < v
    if op == "<=":
        return lo <= v
    if op == ">":
        return hi > v
    return hi >= v  # >=


def split_conjuncts(where: str) -> list[str] | None:
    """Split a predicate on top-level AND, respecting single-quoted string
    literals. A literal like ``'x AND event_id = 3 AND y'`` must NOT yield
    phantom conjuncts — a naive ``re.split(r"\\bAND\\b")`` extracts
    ``event_id = 3`` from inside the quotes and silently prunes files/
    buckets that DO match (r4 advice). Returns None — caller keeps
    everything — when a top-level OR appears (a disjunct could rescue rows
    a conjunct rules out), on an unbalanced quote, or when a backslash
    appears inside a quoted literal: under Spark SQL's default parser
    ``\\'`` is an escaped quote (so ``'x\\' AND b = 1 AND c = \\'y'`` is ONE
    literal), while under ANSI doubling it is not — the dialect of the
    caller-supplied predicate is unknowable here, so any in-quote backslash
    disables pruning rather than risking a phantom conjunct (r5 advice).
    """
    parts: list[str] = []
    buf: list[str] = []
    i, n, in_q = 0, len(where), False
    while i < n:
        ch = where[i]
        if in_q and ch == "\\":
            return None
        if ch == "'":
            if in_q and i + 1 < n and where[i + 1] == "'":
                buf.append("''")  # SQL doubled-quote escape stays inside
                i += 2
                continue
            in_q = not in_q
            buf.append(ch)
            i += 1
            continue
        if not in_q and (ch.isalpha()):
            prev = where[i - 1] if i else ""
            if not (prev.isalnum() or prev == "_"):
                word = where[i : i + 3].upper()
                nxt3 = where[i + 3] if i + 3 < n else ""
                nxt2 = where[i + 2] if i + 2 < n else ""
                if word == "AND" and not (nxt3.isalnum() or nxt3 == "_"):
                    parts.append("".join(buf))
                    buf = []
                    i += 3
                    continue
                if word[:2] == "OR" and not (nxt2.isalnum() or nxt2 == "_"):
                    return None
        buf.append(ch)
        i += 1
    if in_q:
        return None
    parts.append("".join(buf))
    return parts


def file_may_match(entry: dict, where: str) -> bool:
    """True unless ``entry``'s recorded bounds prove ``where`` unsatisfiable.

    OR anywhere outside quotes disables pruning (a disjunct could rescue
    rows a conjunct rules out, e.g. ``a=1 AND b=2 OR c=3``). Otherwise the
    quote-aware AND-split is conservative by construction: every fragment
    either parses as a real conjunct (safe to test intervally) or doesn't
    parse and keeps the file — BETWEEN / NOT / parenthesized groups all
    fall through to "keep".
    """
    stats = entry.get("stats")
    if not stats or not stats.get("cols"):
        return True
    conjuncts = split_conjuncts(where)
    if conjuncts is None:
        return True
    return all(_conjunct_may_match(c, stats["cols"]) for c in conjuncts)
