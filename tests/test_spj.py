"""Storage-partitioned join (operators/spj.py): bucket-co-partitioned
tables join with no join-key shuffle — Spark SPARK-37375's SPJ shape at
the table layer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from iceberg_kafka_connect_spark.operators.spj import (
    storage_partitioned_join,
)
from iceberg_kafka_connect_spark.sinks import Catalog

FACT = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("v", T.StringType(), True),
    ]
)
DIM = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("v", T.StringType(), True),
        T.StructField("tier", T.StringType(), True),
    ]
)


@pytest.fixture()
def tables(spark, tmp_path):
    cat = Catalog(str(tmp_path / "wh"))
    fact = cat.create_table(
        "db.fact", FACT, partition_by=["iceberg_bucket(4, user_id)"]
    )
    dim = cat.create_table(
        "db.dim", DIM, partition_by=["iceberg_bucket(4, user_id)"]
    )
    fact.append(
        spark.createDataFrame(
            [(i, i % 37, f"e{i}") for i in range(300)], FACT
        )
    )
    dim.append(
        spark.createDataFrame(
            [(u, f"d{u}", "gold" if u % 2 else "basic") for u in range(30)],
            DIM,
        )
    )
    return cat, fact, dim


def test_spj_matches_plain_join_and_never_shuffles_by_key(
    spark, tables
):
    cat, fact, dim = tables
    out = storage_partitioned_join(spark, fact, dim, key="user_id")
    plain = fact.read(spark).join(
        dim.read(spark)
        .withColumnRenamed("v", "v_r"),
        "user_id",
        "inner",
    )
    got = sorted(
        (r.event_id, r.user_id, r.v, r.v_r, r.tier) for r in out.collect()
    )
    want = sorted(
        (r.event_id, r.user_id, r.v, r.v_r, r.tier)
        for r in plain.collect()
    )
    assert got == want and len(got) > 0
    # the SPJ plan moves data only via broadcasts — no join-key shuffle
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan, plan


def test_spj_refusals(spark, tmp_path, tables):
    cat, fact, dim = tables
    # unbucketed side
    plain = cat.create_table("db.plain", DIM)
    plain.append(spark.createDataFrame([(1, "d", "t")], DIM))
    with pytest.raises(ValueError, match="not bucket-partitioned"):
        storage_partitioned_join(spark, fact, plain, key="user_id")
    # mismatched bucket counts
    dim8 = cat.create_table(
        "db.dim8", DIM, partition_by=["iceberg_bucket(8, user_id)"]
    )
    dim8.append(spark.createDataFrame([(1, "d", "t")], DIM))
    with pytest.raises(ValueError, match="bucket counts differ"):
        storage_partitioned_join(spark, fact, dim8, key="user_id")
    # live merge-on-read delete state applies per bucket — no compaction
    # demanded (delete rows for other buckets are anti-join no-ops)
    dim.delete_where(spark, "user_id = 3", key_cols=["user_id"])
    out = storage_partitioned_join(spark, fact, dim, key="user_id")
    assert out.filter(F.col("user_id") == 3).count() == 0
    assert out.count() > 0
    # and the answer is identical after compaction folds the delete state
    pre = sorted(map(tuple, out.collect()))
    dim.compact(spark)
    post = sorted(
        map(
            tuple,
            storage_partitioned_join(
                spark, fact, dim, key="user_id"
            ).collect(),
        )
    )
    assert pre == post


def test_spj_skips_null_key_partition(spark, tmp_path):
    """NULL join keys land in the Hive default partition; an inner join
    can never match them, so SPJ skips that partition rather than failing
    with a false predates-the-spec diagnosis (review fix)."""
    import pyspark.sql.types as T2

    cat = Catalog(str(tmp_path / "whn"))
    nfact = T2.StructType(
        [
            T2.StructField("event_id", T2.LongType(), False),
            T2.StructField("user_id", T2.LongType(), True),
            T2.StructField("v", T2.StringType(), True),
        ]
    )
    fact = cat.create_table(
        "db.nf", nfact, partition_by=["iceberg_bucket(4, user_id)"]
    )
    dim = cat.create_table(
        "db.nd", DIM, partition_by=["iceberg_bucket(4, user_id)"]
    )
    fact.append(
        spark.createDataFrame(
            [(1, 7, "a"), (2, None, "null-key"), (3, 8, "c")], nfact
        )
    )
    dim.append(
        spark.createDataFrame([(7, "d7", "t"), (8, "d8", "t")], DIM)
    )
    out = storage_partitioned_join(spark, fact, dim, key="user_id")
    assert sorted((r.event_id, r.user_id) for r in out.collect()) == [
        (1, 7),
        (3, 8),
    ]


def _multiset(df):
    from collections import Counter

    return Counter(tuple(r) for r in df.collect())


def test_spj_outer_joins_match_shuffle_join(spark, tmp_path):
    """Left/right/full-outer SPJ agree with the plain shuffle join: a
    key's bucket is deterministic on both sides, so per-bucket outer
    preservation (plus one-sided buckets and NULL partitions) covers
    exactly the unmatched rows."""
    cat = Catalog(str(tmp_path / "who"))
    nfact = T.StructType(
        [
            T.StructField("event_id", T.LongType(), False),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("v", T.StringType(), True),
        ]
    )
    ndim = T.StructType(
        [
            T.StructField("user_id", T.LongType(), True),
            T.StructField("v", T.StringType(), True),
            T.StructField("tier", T.StringType(), True),
        ]
    )
    fact = cat.create_table(
        "db.of", nfact, partition_by=["iceberg_bucket(4, user_id)"]
    )
    dim = cat.create_table(
        "db.od", ndim, partition_by=["iceberg_bucket(4, user_id)"]
    )
    # fact: users 0..19 plus fact-only 90..93 plus two NULL keys
    fact.append(
        spark.createDataFrame(
            [(i, i % 20, f"e{i}") for i in range(100)]
            + [(200 + u, 90 + u, "fact-only") for u in range(4)]
            + [(300, None, "n1"), (301, None, "n2")],
            nfact,
        )
    )
    # dim: users 0..14 plus dim-only 500..502 plus a NULL key
    dim.append(
        spark.createDataFrame(
            [(u, f"d{u}", "gold" if u % 2 else "basic") for u in range(15)]
            + [(500 + u, f"x{u}", "dim-only") for u in range(3)]
            + [(None, "dnull", "t")],
            ndim,
        )
    )
    cols = ["user_id", "event_id", "v", "v_r", "tier"]
    for how in ("inner", "left", "right", "full"):
        out = storage_partitioned_join(spark, fact, dim, key="user_id", how=how)
        plain = fact.read(spark).join(
            dim.read(spark).withColumnRenamed("v", "v_r"), "user_id", how
        )
        assert _multiset(out.select(*cols)) == _multiset(
            plain.select(*cols)
        ), how
    with pytest.raises(ValueError, match="unsupported join type"):
        storage_partitioned_join(spark, fact, dim, key="user_id", how="cross")


def test_spj_merge_on_read_without_compaction(spark, tmp_path):
    """MoR tables SPJ directly: each side's delete state (equality AND
    position deletes) applies per bucket before the join — same rows as
    the shuffle join over table reads, no compact() demanded."""
    cat = Catalog(str(tmp_path / "whm"))
    fact = cat.create_table(
        "db.mf", FACT, partition_by=["iceberg_bucket(4, user_id)"]
    )
    dim = cat.create_table(
        "db.md", DIM, partition_by=["iceberg_bucket(4, user_id)"]
    )
    fact.append(
        spark.createDataFrame(
            [(i, i % 11, f"e{i}") for i in range(120)], FACT
        )
    )
    dim.append(
        spark.createDataFrame(
            [(u, f"d{u}", "gold" if u % 2 else "basic") for u in range(11)],
            DIM,
        )
    )
    # position deletes on the fact, equality deletes on the dim
    fact.delete_where_positions(spark, "event_id % 7 = 0")
    dim.delete_where(spark, "user_id = 4", key_cols=["user_id"])
    cols = ["user_id", "event_id", "v", "v_r", "tier"]
    for how in ("inner", "left"):
        out = storage_partitioned_join(spark, fact, dim, key="user_id", how=how)
        plain = fact.read(spark).join(
            dim.read(spark).withColumnRenamed("v", "v_r"), "user_id", how
        )
        assert _multiset(out.select(*cols)) == _multiset(
            plain.select(*cols)
        ), how
    assert (
        storage_partitioned_join(spark, fact, dim, key="user_id")
        .filter(F.col("user_id") == 4)
        .count()
        == 0
    )


def test_spj_left_outer_plan_stays_broadcast_per_bucket(spark, tables):
    """Outer SPJ keeps the zero-join-key-shuffle shape: per-bucket
    BroadcastHashJoin (LeftOuter), no SortMergeJoin, no hashpartitioning
    exchange."""
    cat, fact, dim = tables
    out = storage_partitioned_join(spark, fact, dim, key="user_id", how="left")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftOuter" in plan
    assert "SortMergeJoin" not in plan
    assert "Exchange hashpartitioning" not in plan, plan


def test_spj_wide_spec_folds_into_grouped_unions(spark, tmp_path):
    """A 64-bucket spec must NOT build a 64-way union of per-bucket joins:
    buckets fold into at most max_join_groups grouped sub-joins (default
    32), the plan stays shuffle-free on the join key, and results still
    match the plain join exactly."""
    from iceberg_kafka_connect_spark.plans import count_in_plan

    cat = Catalog(str(tmp_path / "wh64"))
    fact = cat.create_table(
        "db.fact64", FACT, partition_by=["iceberg_bucket(64, user_id)"]
    )
    dim = cat.create_table(
        "db.dim64", DIM, partition_by=["iceberg_bucket(64, user_id)"]
    )
    fact.append(
        spark.createDataFrame(
            [(i, i % 200, f"e{i}") for i in range(2000)], FACT
        )
    )
    dim.append(
        spark.createDataFrame(
            [(u, f"d{u}", "gold" if u % 2 else "basic") for u in range(150)],
            DIM,
        )
    )
    out = storage_partitioned_join(spark, fact, dim, key="user_id")
    # simple mode prints each node once (formatted repeats it in details)
    assert 1 <= count_in_plan(out, "BroadcastHashJoin", mode="simple") <= 32
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    want = sorted(
        map(
            tuple,
            fact.read(spark)
            .join(
                dim.read(spark).withColumnRenamed("v", "v_r"), "user_id"
            )
            .select("user_id", "event_id", "v", "v_r", "tier")
            .collect(),
        )
    )
    got = sorted(
        map(
            tuple,
            out.select("user_id", "event_id", "v", "v_r", "tier").collect(),
        )
    )
    assert got == want


def test_spj_group_fold_outer_agrees(spark, tmp_path):
    """Grouped folding with one-sided buckets: full outer at
    max_join_groups=3 equals the plain full-outer join row-for-row."""
    cat = Catalog(str(tmp_path / "wh16"))
    fact = cat.create_table(
        "db.fact16", FACT, partition_by=["iceberg_bucket(16, user_id)"]
    )
    dim = cat.create_table(
        "db.dim16", DIM, partition_by=["iceberg_bucket(16, user_id)"]
    )
    # disjoint-ish key ranges so several buckets are one-sided
    fact.append(
        spark.createDataFrame([(i, i % 23, f"e{i}") for i in range(400)], FACT)
    )
    dim.append(
        spark.createDataFrame(
            [(u, f"d{u}", "t") for u in range(15, 40)], DIM
        )
    )
    out = storage_partitioned_join(
        spark, fact, dim, key="user_id", how="full", max_join_groups=3
    )
    want = sorted(
        map(
            tuple,
            fact.read(spark)
            .join(
                dim.read(spark).withColumnRenamed("v", "v_r"),
                "user_id",
                "full",
            )
            .select("user_id", "event_id", "v", "v_r", "tier")
            .collect(),
        ),
        key=str,
    )
    got = sorted(
        map(
            tuple,
            out.select("user_id", "event_id", "v", "v_r", "tier").collect(),
        ),
        key=str,
    )
    assert got == want
