"""Local mirror of the driver's correctness gate: run a suite query on Spark
and its oracle SQL on DuckDB over the same parquet, canonicalize both frames,
and diff values. Used by test_parity.py so every oracle-checked query is
validated before the driver ever sees it."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from iceberg_kafka_connect_spark.suite.core import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    out = out[sorted(out.columns)]
    for c in out.columns:
        if pd.api.types.is_datetime64_any_dtype(out[c]):
            out[c] = out[c].astype("datetime64[us]").astype(str)
        elif out[c].dtype == object:
            out[c] = out[c].map(lambda v: str(v) if v is not None else None)
    out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(
        drop=True
    )
    return out


def _cell_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b  # exact — parity idioms guarantee bit-identical doubles
    return a == b


def compare(spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    a, b = canonicalize(spark_df), canonicalize(duck_df)
    if list(a.columns) != list(b.columns):
        return [f"column mismatch: spark={list(a.columns)} duck={list(b.columns)}"]
    if len(a) != len(b):
        problems.append(f"row count: spark={len(a)} duck={len(b)}")
    n = min(len(a), len(b))
    bad = 0
    for i in range(n):
        for c in a.columns:
            va, vb = a.iloc[i][c], b.iloc[i][c]
            try:
                eq = _cell_equal(va, vb) or (pd.isna(va) and pd.isna(vb))
            except (TypeError, ValueError):
                eq = False
            if not eq:
                bad += 1
                if bad <= 5:
                    problems.append(f"row {i} col {c}: spark={va!r} duck={vb!r}")
    if bad > 5:
        problems.append(f"... {bad} mismatched cells total")
    return problems
