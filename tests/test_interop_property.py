"""Property-based interop test: export → import must preserve read(), and
refresh_from_iceberg must converge an earlier import onto the source, for
ARBITRARY short DML scripts (appends, equality deletes, position deletes,
column rename, compaction). The source table itself is the oracle — its
read() semantics are pinned by the rest of the suite."""

from __future__ import annotations

import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from iceberg_kafka_connect_spark.sinks.iceberg_export import (
    export_iceberg_metadata,
)
from iceberg_kafka_connect_spark.sinks.iceberg_import import (
    import_iceberg_table,
    refresh_from_iceberg,
)
from iceberg_kafka_connect_spark.sinks.table import LakehouseTable

SCHEMA = T.StructType(
    [T.StructField("k", T.LongType()), T.StructField("v", T.LongType())]
)

APPEND = st.tuples(
    st.just("append"),
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=-5, max_value=5),
        ),
        min_size=1,
        max_size=6,
    ),
)
EDEL = st.tuples(st.just("edel"), st.integers(min_value=2, max_value=5))
PDEL = st.tuples(st.just("pdel"), st.integers(min_value=2, max_value=5))
RENAME = st.tuples(st.just("rename"), st.none())
COMPACT = st.tuples(st.just("compact"), st.none())
OPS = st.lists(
    st.one_of(APPEND, EDEL, PDEL, RENAME, COMPACT), min_size=1, max_size=6
)


def _apply(spark, t, op, arg, renamed):
    vcol = "v2" if renamed else "v"
    sch = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField(vcol, T.LongType())]
    )
    if op == "append":
        t.append(spark.createDataFrame(arg, sch))
    elif op == "edel":
        t.delete_where(spark, f"k % {arg} = 0", key_cols=["k"])
    elif op == "pdel":
        t.delete_where_positions(spark, f"k % {arg} = 1")
    elif op == "rename" and not renamed:
        t.rename_column("v", "v2")
        return True
    elif op == "compact":
        t.compact(spark)
    return renamed


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pre_ops=OPS, post_ops=OPS)
def test_roundtrip_and_refresh_under_arbitrary_dml(spark, pre_ops, post_ops):
    base = tempfile.mkdtemp(prefix="interop_prop_")
    src = LakehouseTable.create(base + "/src", SCHEMA)
    renamed = False
    src.append(spark.createDataFrame([(i, 0) for i in range(8)], SCHEMA))
    for op, arg in pre_ops:
        renamed = _apply(spark, src, op, arg, renamed)
    # (1) point-in-time round trip
    imp = import_iceberg_table(export_iceberg_metadata(src), base + "/dst")
    assert _rows(imp.read(spark)) == _rows(src.read(spark))
    # (2) the source moves on; one refresh converges the copy
    for op, arg in post_ops:
        renamed = _apply(spark, src, op, arg, renamed)
    export_iceberg_metadata(src)
    refresh_from_iceberg(imp)
    assert _rows(imp.read(spark)) == _rows(src.read(spark))
