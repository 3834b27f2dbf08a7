"""Property-based parity: the distributed union+window as-of join must equal
pandas.merge_asof for arbitrary key/timestamp layouts — including ties,
empty sides, keys missing on one side, and both directions."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from iceberg_kafka_connect_spark.operators.relational import as_of_join

BASE = dt.datetime(2024, 1, 1)

KEYS = st.sampled_from(["a", "b", "c"])
# second offsets; small range to force ties and dense overlap
TS = st.integers(min_value=0, max_value=20)


def _mk(spark, rows, with_val):
    schema = "k string, ts timestamp" + (", v long" if with_val else ", q long")
    return spark.createDataFrame(rows, schema)


@settings(max_examples=15, deadline=None)
@given(
    left=st.lists(st.tuples(KEYS, TS), min_size=1, max_size=8),
    right=st.lists(st.tuples(KEYS, TS), max_size=8),
    direction=st.sampled_from(["backward", "forward"]),
)
def test_asof_matches_pandas_merge_asof(spark, left, right, direction):
    lrows = [
        (k, BASE + dt.timedelta(seconds=s), i) for i, (k, s) in enumerate(left)
    ]
    # unique right (k, ts): merge_asof tie behavior among equal right keys is
    # positional, while the engine resolves ties by greatest value — dedup to
    # keep the oracle well-defined (the engine's tie rule has its own test)
    seen = set()
    rrows = []
    for k, s in right:
        if (k, s) not in seen:
            seen.add((k, s))
            rrows.append((k, BASE + dt.timedelta(seconds=s), 100 + s))
    ldf = _mk(spark, lrows, False)
    rdf = _mk(spark, rrows, True) if rrows else _mk(
        spark, [("zzz", BASE, 0)], True
    ).filter("k != k")

    out = as_of_join(ldf, rdf, on=["k"], left_ts="ts", direction=direction)
    got = {r["q"]: r["v"] for r in out.collect()}

    lpd = pd.DataFrame(lrows, columns=["k", "ts", "q"]).sort_values("ts")
    if rrows:
        rpd = pd.DataFrame(rrows, columns=["k", "ts", "v"]).sort_values("ts")
    else:
        rpd = pd.DataFrame({"k": pd.Series(dtype=object),
                            "ts": pd.Series(dtype="datetime64[ns]"),
                            "v": pd.Series(dtype="int64")})
    m = pd.merge_asof(
        lpd, rpd, on="ts", by="k", direction=direction, allow_exact_matches=True
    )
    expected = {
        int(r.q): (None if pd.isna(r.v) else int(r.v)) for r in m.itertuples()
    }
    assert got == expected
