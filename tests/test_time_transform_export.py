"""Faithful export of time partition transforms (year/month/day/hour) and
string truncate.

The writer's calendar-string partition directories (sinks/spec.py,
pinned-UTC sessions) convert bijectively to Iceberg's epoch-ordinal
partition values, so these specs export as real transforms — external
engines prune time predicates — instead of ``void``. Reference partitions
through Iceberg's own transforms (data/SchemaUtils.java:150-199); this is
the interop-faithful leg of that surface.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from iceberg_kafka_connect_spark.sinks.iceberg_export import (
    _time_transform_parser,
    export_iceberg_metadata,
    read_exported,
)
from iceberg_kafka_connect_spark.sinks.iceberg_import import (
    import_iceberg_table,
)
from iceberg_kafka_connect_spark.sinks.table import LakehouseTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _table(spark, tmp_path, partition_by, rows):
    t = LakehouseTable.create(
        str(tmp_path / "src"), SCHEMA, partition_by=partition_by
    )
    t.append(spark.createDataFrame(rows, SCHEMA))
    return t


def _ts(s):
    return dt.datetime.fromisoformat(s)


ROWS = [
    (1, "alpha", _ts("1995-03-15 07:30:00")),
    (2, "alpine", _ts("1995-03-20 23:59:59")),
    (3, "beta", _ts("1995-04-01 00:00:00")),
    (4, "betamax", _ts("1998-12-31 12:00:00")),
    (5, "gamma", _ts("1969-12-31 23:45:00")),  # pre-epoch → negative ordinals
    (6, "alphabet", _ts("1970-01-02 03:00:00")),
]


# ----------------------------------------------------------- parser units
@pytest.mark.parametrize(
    "transform,value,want",
    [
        ("year", "1995", 25),
        ("year", "1969", -1),
        ("month", "1995-03", (1995 - 1970) * 12 + 2),
        ("month", "1969-12", -1),
        ("day", "1970-01-02", 1),
        ("day", "1969-12-31", -1),
        ("day", "1995-03-15", (dt.date(1995, 3, 15) - dt.date(1970, 1, 1)).days),
        ("hour", "1970-01-02-03", 27),
        ("hour", "1969-12-31-23", -1),
        ("hour", "1995-03-15-07", (dt.date(1995, 3, 15) - dt.date(1970, 1, 1)).days * 24 + 7),
    ],
)
def test_time_parser_pinned_ordinals(transform, value, want):
    assert _time_transform_parser(transform)(value) == want


# ------------------------------------------------------- export per shape
def test_day_transform_exports_faithfully(spark, tmp_path):
    t = _table(spark, tmp_path, ["day(ts)"], ROWS)
    info = read_exported(export_iceberg_metadata(t))
    spec = info["partition_spec"]
    assert [f["transform"] for f in spec["fields"]] == ["day"]
    epoch = dt.date(1970, 1, 1)
    want = {(r[2].date() - epoch).days for r in ROWS}
    assert {p["ts_day"] for p in info["partitions"]} == want


def test_day_partition_row_counts_reachable(spark, tmp_path):
    """Tuple + file list reproduce per-day row counts — what an external
    reader pruning ``ts >= X`` would scan."""
    t = _table(spark, tmp_path, ["day(ts)"], ROWS)
    info = read_exported(export_iceberg_metadata(t))
    epoch = dt.date(1970, 1, 1)
    want: dict = {}
    for r in ROWS:
        d = (r[2].date() - epoch).days
        want[d] = want.get(d, 0) + 1
    got: dict = {}
    for p, n in zip(info["partitions"], info["record_counts"]):
        got[p["ts_day"]] = got.get(p["ts_day"], 0) + n
    assert got == want


def test_year_month_hour_transforms_export(spark, tmp_path):
    for transform, fmt, conv in [
        ("year", None, lambda d: d.year - 1970),
        ("month", None, lambda d: (d.year - 1970) * 12 + d.month - 1),
        (
            "hour",
            None,
            lambda d: (
                (d.date() - dt.date(1970, 1, 1)).days * 24 + d.hour
            ),
        ),
    ]:
        t = _table(
            spark, tmp_path / transform, [f"{transform}(ts)"], ROWS
        )
        info = read_exported(export_iceberg_metadata(t))
        assert [
            f["transform"] for f in info["partition_spec"]["fields"]
        ] == [transform]
        key = f"ts_{transform}"
        assert {p[key] for p in info["partitions"]} == {
            conv(r[2]) for r in ROWS
        }


def test_string_truncate_exports_faithfully(spark, tmp_path):
    t = _table(spark, tmp_path, ["truncate(name, 4)"], ROWS)
    info = read_exported(export_iceberg_metadata(t))
    spec = info["partition_spec"]
    assert [f["transform"] for f in spec["fields"]] == ["truncate[4]"]
    assert {p["name_truncate4"] for p in info["partitions"]} == {
        r[1][:4] for r in ROWS
    }


def test_nonstring_truncate_stays_void(spark, tmp_path):
    """Iceberg floors numerics to width multiples; sinks/spec.py truncates
    the cast string — different values, so the spec must NOT claim the
    transform (external engines would prune wrongly)."""
    t = _table(spark, tmp_path, ["truncate(k, 2)"], ROWS)
    info = read_exported(export_iceberg_metadata(t))
    assert [
        f["transform"] for f in info["partition_spec"]["fields"]
    ] == ["void"]
    assert all(p["k_truncate2"] is None for p in info["partitions"])


def test_mixed_time_and_identity_spec(spark, tmp_path):
    t = _table(spark, tmp_path, ["month(ts)", "truncate(name, 1)"], ROWS)
    info = read_exported(export_iceberg_metadata(t))
    tfs = {
        f["name"]: f["transform"]
        for f in info["partition_spec"]["fields"]
    }
    assert tfs == {"ts_month": "month", "name_truncate1": "truncate[1]"}
    for p in info["partitions"]:
        assert p["ts_month"] is not None
        assert p["name_truncate1"] is not None


# ------------------------------------------------------------ round trips
def test_day_partition_roundtrip_import(spark, tmp_path):
    t = _table(spark, tmp_path, ["day(ts)"], ROWS)
    out = export_iceberg_metadata(t)
    imp = import_iceberg_table(out, str(tmp_path / "dst"))
    # the time transform survives the import (not skipped-to-unpartitioned)
    assert [(p.source, p.transform) for p in imp.partition_spec()] == [
        ("ts", "day")
    ]
    assert sorted(tuple(r) for r in imp.read(spark).collect()) == sorted(
        tuple(r) for r in t.read(spark).collect()
    )
    assert "import.skipped-partition-transforms" not in imp.properties()


def test_truncate_partition_roundtrip_import(spark, tmp_path):
    t = _table(spark, tmp_path, ["truncate(name, 3)"], ROWS)
    out = export_iceberg_metadata(t)
    imp = import_iceberg_table(out, str(tmp_path / "dst"))
    assert [(p.source, p.transform, p.param) for p in imp.partition_spec()] == [
        ("name", "truncate", 3)
    ]
    assert sorted(tuple(r) for r in imp.read(spark).collect()) == sorted(
        tuple(r) for r in t.read(spark).collect()
    )


def test_imported_day_table_accepts_further_writes(spark, tmp_path):
    """Future writes to an imported time-partitioned table keep the layout
    and re-export faithfully (spec no longer degrades to void)."""
    t = _table(spark, tmp_path, ["day(ts)"], ROWS[:3])
    imp = import_iceberg_table(
        export_iceberg_metadata(t), str(tmp_path / "dst")
    )
    imp.append(spark.createDataFrame(ROWS[3:], SCHEMA))
    assert imp.read(spark).count() == len(ROWS)
    info = read_exported(export_iceberg_metadata(imp))
    assert [
        f["transform"] for f in info["partition_spec"]["fields"]
    ] == ["day"]
