"""Property tests for the quote-aware conjunct splitter (sinks/stats.py).

The r4 advice bug class: a naive regex AND-split extracted phantom
conjuncts from INSIDE single-quoted string literals, silently mis-pruning
stats files and murmur3 buckets. These properties pin the splitter's
contract against randomly composed predicates."""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st

from iceberg_kafka_connect_spark.sinks.stats import split_conjuncts

# literal contents: anything printable without quote chars, PLUS the
# adversarial tokens the bug was about
_lit_inner = st.lists(
    st.one_of(
        st.text(
            alphabet="abcdefghij XYZ_0123456789<>=!.-",
            min_size=0,
            max_size=8,
        ),
        st.sampled_from(
            [" AND ", " OR ", " and id = 3 ", "AND", "OR", "''"]
        ),
    ),
    min_size=0,
    max_size=4,
).map("".join)

_column = st.sampled_from(["id", "name", "note", "ANDrew", "orders_col"])
_num = st.integers(min_value=-999, max_value=999).map(str)


@st.composite
def _conjunct(draw):
    col = draw(_column)
    op = draw(st.sampled_from(["=", "!=", "<", ">", "<=", ">="]))
    if draw(st.booleans()):
        lit = "'" + draw(_lit_inner) + "'"
    else:
        lit = draw(_num)
    return f"{col} {op} {lit}"


@given(st.lists(_conjunct(), min_size=1, max_size=5))
@settings(max_examples=300, deadline=None)
def test_split_roundtrips_and_never_splits_inside_quotes(conjuncts):
    where = " AND ".join(conjuncts)
    parts = split_conjuncts(where)
    assert parts is not None, where
    # exactly one fragment per real conjunct: literals containing AND/OR
    # never create or swallow boundaries
    assert len(parts) == len(conjuncts), (where, parts)
    assert [p.strip() for p in parts] == [c.strip() for c in conjuncts]


@given(st.lists(_conjunct(), min_size=2, max_size=4), st.integers(0, 3))
@settings(max_examples=150, deadline=None)
def test_top_level_or_always_bails(conjuncts, pos):
    pos = pos % len(conjuncts)
    parts = []
    for i, c in enumerate(conjuncts):
        parts.append(c)
        if i < len(conjuncts) - 1:
            parts.append("OR" if i == pos % (len(conjuncts) - 1) else "AND")
    where = " ".join(parts)
    assert split_conjuncts(where) is None


@given(_lit_inner)
@settings(max_examples=200, deadline=None)
def test_unbalanced_quote_bails(inner):
    # strip the doubled-escape token so the dangling quote stays dangling
    inner = inner.replace("''", "")
    assert split_conjuncts(f"name = '{inner}") is None


@given(st.lists(_conjunct(), min_size=1, max_size=4))
@settings(max_examples=150, deadline=None)
def test_agrees_with_naive_split_when_no_quoted_literals(conjuncts):
    """On predicates with no string literals at all, the quote-aware
    split must agree exactly with the old regex split (no behavior change
    for the common numeric case)."""
    if any("'" in c for c in conjuncts):
        return
    where = " AND ".join(conjuncts)
    naive = re.split(r"\bAND\b", where, flags=re.IGNORECASE)
    assert split_conjuncts(where) == naive


def test_backslash_inside_quotes_bails():
    """r5 advice: under Spark's default parser ``\\'`` escapes the quote,
    so this whole WHERE is ONE literal comparison — the doubled-quote-only
    splitter used to emit a phantom conjunct ``b = 1``. Any in-quote
    backslash now disables pruning (dialect unknowable → conservative)."""
    assert split_conjuncts(r"a = 'x\' AND b = 1 AND c = \'y'") is None
    assert split_conjuncts(r"a = 'x\\y' AND b = 1") is None
    assert split_conjuncts(r"a = '\n' AND b = 1") is None
    # backslash OUTSIDE quotes does not bail (not a literal-escape context)
    assert split_conjuncts(r"a = 1 AND b = 2") == ["a = 1 ", " b = 2"]


@given(_lit_inner, st.integers(0, 10))
@settings(max_examples=150, deadline=None)
def test_any_backslash_in_literal_bails(inner, pos):
    # a "''" token in inner is a doubled-quote escape — inserting the
    # backslash between the pair would land it OUTSIDE the literal under
    # doubling semantics, so keep inner quote-free for this property
    inner = inner.replace("'", "")
    cut = pos % (len(inner) + 1)
    inner = inner[:cut] + "\\" + inner[cut:]
    assert split_conjuncts(f"name = '{inner}' AND id = 1") is None
