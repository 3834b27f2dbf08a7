"""Stateful streaming tests: watermarked window rollup and
applyInPandasWithState sessionization over the kafka-shaped file stream."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from iceberg_kafka_connect_spark.sources.stream import file_stream_source
from iceberg_kafka_connect_spark.streaming.stateful import (
    sessionize_stream,
    windowed_rollup,
)


def _emit(path, rows, offset0=0):
    path.mkdir(parents=True, exist_ok=True)
    with open(path / f"c{offset0}.json", "w") as f:
        for i, (user, ts) in enumerate(rows):
            f.write(
                json.dumps(
                    {
                        "key": str(user),
                        "value": json.dumps({"user": user}),
                        "topic": "t",
                        "partition": 0,
                        "offset": offset0 + i,
                        "timestamp": ts,
                    }
                )
                + "\n"
            )


def _run_to_memory(stream_df, name, ckpt, output_mode):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_windowed_rollup_stream(spark, tmp_path):
    src = tmp_path / "src"
    _emit(
        src,
        [
            (1, "2024-01-01T00:10:00.000Z"),
            (1, "2024-01-01T00:50:00.000Z"),
            (2, "2024-01-01T01:10:00.000Z"),
        ],
    )
    stream = file_stream_source(spark, str(src))
    rolled = windowed_rollup(stream, window="1 hour", watermark="10 minutes")
    _run_to_memory(rolled, "rollup_t", tmp_path / "ck", "append")
    # with availableNow + append, only windows passed by the watermark emit;
    # the 00:00 window (2 events) finalizes once the 01:10 event advances it
    rows = {
        (r.window_start.isoformat(), r.n_events)
        for r in spark.sql("select * from rollup_t").collect()
    }
    assert ("2024-01-01T00:00:00", 2) in rows


def test_windowed_rollup_with_groups_and_sum(spark, tmp_path):
    src = tmp_path / "src"
    _emit(
        src,
        [
            (1, "2024-01-01T00:10:00.000Z"),
            (2, "2024-01-01T00:20:00.000Z"),
            (1, "2024-01-01T02:00:00.000Z"),  # advances the watermark
        ],
    )
    stream = file_stream_source(spark, str(src)).withColumn(
        "amount", F.col("offset").cast("double") + 1.0
    )
    rolled = windowed_rollup(
        stream,
        window="1 hour",
        watermark="10 minutes",
        group_cols=("key",),
        agg_col="amount",
    )
    _run_to_memory(rolled, "rollup_g", tmp_path / "ck", "append")
    rows = {
        (r.key, r.n_events, r.sum_amount)
        for r in spark.sql("select * from rollup_g").collect()
    }
    assert (str(1), 1, 1.0) in rows or (1, 1, 1.0) in rows
    assert any(r[1] == 1 for r in rows)


def test_sessionize_stream_state(spark, tmp_path):
    src = tmp_path / "src"
    # user 1: two events 5 min apart (1 session), then one 2h later (2nd)
    _emit(
        src,
        [
            (1, "2024-01-01T00:00:00.000Z"),
            (1, "2024-01-01T00:05:00.000Z"),
            (1, "2024-01-01T02:05:00.000Z"),
            (2, "2024-01-01T00:00:00.000Z"),
        ],
    )
    stream = file_stream_source(spark, str(src))
    sessions = sessionize_stream(stream, user_col="key", gap_minutes=30)
    _run_to_memory(sessions, "sess_t", tmp_path / "ck", "update")
    out = {
        r.user_id: (r.n_sessions, r.n_events)
        for r in spark.sql(
            "select user_id, n_sessions, n_events from sess_t"
        ).collect()
    }
    assert out[1] == (2, 3)
    assert out[2] == (1, 1)


def test_sessionize_state_survives_batches(spark, tmp_path):
    """Second micro-batch continues from stored state (no session double
    count when the gap spans batches)."""
    src = tmp_path / "src"
    ck = tmp_path / "ck"
    results: dict[int, tuple[int, int]] = {}

    def sink(batch, _bid):
        for r in batch.collect():
            results[r.user_id] = (r.n_sessions, r.n_events)

    def run_once():
        stream = file_stream_source(spark, str(src))
        sessions = sessionize_stream(stream, user_col="key", gap_minutes=30)
        q = (
            sessions.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", str(ck))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _emit(src, [(7, "2024-01-01T00:00:00.000Z")])
    run_once()
    assert results[7] == (1, 1)
    # 10 minutes later (same session) in a new batch after a restart
    _emit(src, [(7, "2024-01-01T00:10:00.000Z")], offset0=1)
    run_once()
    assert results[7] == (1, 2)  # still one session, two events


# ---------------------------------------------------------------- curation

def test_streaming_curation_loop(spark, tmp_path):
    """Streaming curation: each micro-batch is deduplicated (exact + near)
    against the corpus accumulated in the lakehouse table; the corpus stays
    deduplicated by construction across batches."""
    import json

    from pyspark.sql import types as T

    from iceberg_kafka_connect_spark.sinks import Catalog
    from iceberg_kafka_connect_spark.streaming.dedup import curation_loop

    cat = Catalog(str(tmp_path / "wh"))
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    table = cat.create_table("default.corpus", schema)
    src = tmp_path / "docs"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def emit(name, docs):
        with open(src / name, "w") as f:
            for d in docs:
                f.write(json.dumps(d) + "\n")

    def run_once():
        stream = spark.readStream.schema("doc_id long, text string").option(
            "maxFilesPerTrigger", "100"
        ).json(str(src))
        q = curation_loop(stream, table, checkpoint=ckpt)
        q.processAllAvailable()
        q.stop()

    # batch 1: 4 (near-dup of 3) and 2' (exact dup of 2) must be dropped
    emit("b1.json", [
        {"doc_id": 1, "text": "the quick brown fox jumps over the lazy dog"},
        {"doc_id": 2, "text": "uno dos tres cuatro cinco seis siete ocho"},
        {"doc_id": 5, "text": "UNO dos tres  cuatro cinco seis siete ocho"},
        {"doc_id": 3, "text": "alpha beta gamma delta epsilon zeta eta"},
        {"doc_id": 4, "text": "alpha beta gamma delta epsilon zeta THETA"},
    ])
    run_once()
    assert sorted(r.doc_id for r in table.read(spark).collect()) == [1, 2, 3]

    # batch 2: 10 exact-dups history doc 1, 11 near-dups history doc 3,
    # 12 is new
    emit("b2.json", [
        {"doc_id": 10, "text": "The quick  brown fox jumps over the lazy dog"},
        {"doc_id": 11, "text": "alpha beta gamma delta epsilon zeta IOTA"},
        {"doc_id": 12, "text": "completely fresh content with new words here"},
    ])
    run_once()
    assert sorted(r.doc_id for r in table.read(spark).collect()) == [1, 2, 3, 12]


def test_stream_stream_interval_join(spark, tmp_path):
    """Stream-stream interval join: points land inside concurrent streaming
    intervals; the time-range condition + watermarks bound the join state."""
    import json

    from iceberg_kafka_connect_spark.streaming.joins import stream_interval_join

    pdir = tmp_path / "points"
    idir = tmp_path / "ivals"
    pdir.mkdir()
    idir.mkdir()
    with open(pdir / "p.json", "w") as f:
        for pid, ts in [(1, "2024-01-01 10:15:00"), (2, "2024-01-01 11:30:00"),
                        (3, "2024-01-01 10:45:00")]:
            f.write(json.dumps({"k": "u1", "ts": ts, "pid": pid}) + "\n")
    with open(idir / "i.json", "w") as f:
        f.write(json.dumps({"k": "u1", "start": "2024-01-01 10:00:00",
                            "end": "2024-01-01 11:00:00", "name": "w1"}) + "\n")

    points = spark.readStream.schema("k string, ts timestamp, pid long").json(
        str(pdir)
    )
    ivals = spark.readStream.schema(
        "k string, start timestamp, end timestamp, name string"
    ).json(str(idir))
    out = stream_interval_join(points, ivals, on=["k"])
    q = (
        out.writeStream.format("memory")
        .queryName("ssij")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT pid, name FROM ssij").collect()
    finally:
        q.stop()
    assert sorted((r.pid, r.name) for r in rows) == [(1, "w1"), (3, "w1")]


def test_streaming_curation_loop_with_signature_table(spark, tmp_path):
    """Signature-store mode: same invariant, but history is never
    re-tokenized — every batch dedups against the signature table, and the
    signature table tracks exactly the corpus survivors."""
    import json

    from pyspark.sql import types as T

    from iceberg_kafka_connect_spark.sinks import Catalog
    from iceberg_kafka_connect_spark.streaming.dedup import curation_loop

    cat = Catalog(str(tmp_path / "wh"))
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    sig_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("digest", T.StringType()),
            T.StructField("bands", T.ArrayType(T.LongType())),
            T.StructField("shingle_hashes", T.ArrayType(T.LongType())),
        ]
    )
    table = cat.create_table("default.corpus2", schema)
    sigs = cat.create_table("default.corpus2_sigs", sig_schema)
    src = tmp_path / "docs"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def emit(name, docs):
        with open(src / name, "w") as f:
            for d in docs:
                f.write(json.dumps(d) + "\n")

    def run_once():
        stream = spark.readStream.schema("doc_id long, text string").option(
            "maxFilesPerTrigger", "100"
        ).json(str(src))
        q = curation_loop(
            stream, table, checkpoint=ckpt, signature_table=sigs
        )
        q.processAllAvailable()
        q.stop()

    emit("b1.json", [
        {"doc_id": 1, "text": "the quick brown fox jumps over the lazy dog"},
        {"doc_id": 2, "text": "uno dos tres cuatro cinco seis siete ocho"},
        {"doc_id": 5, "text": "UNO dos tres  cuatro cinco seis siete ocho"},
        {"doc_id": 3, "text": "alpha beta gamma delta epsilon zeta eta"},
        {"doc_id": 4, "text": "alpha beta gamma delta epsilon zeta THETA"},
    ])
    run_once()
    assert sorted(r.doc_id for r in table.read(spark).collect()) == [1, 2, 3]
    assert sorted(r.id for r in sigs.read(spark).collect()) == [1, 2, 3]

    emit("b2.json", [
        {"doc_id": 10, "text": "The quick  brown fox jumps over the lazy dog"},
        {"doc_id": 11, "text": "alpha beta gamma delta epsilon zeta IOTA"},
        {"doc_id": 12, "text": "completely fresh content with new words here"},
    ])
    run_once()
    assert sorted(r.doc_id for r in table.read(spark).collect()) == [1, 2, 3, 12]
    assert sorted(r.id for r in sigs.read(spark).collect()) == [1, 2, 3, 12]


def test_curation_loop_replay_after_sig_commit_crash(spark, tmp_path):
    """Crash between the signature commit and the corpus commit: the replay
    must land the SAME survivors in the corpus (not dedup the batch against
    its own stored signatures and drop everything)."""
    import json

    from pyspark.sql import types as T

    from iceberg_kafka_connect_spark.operators.dedup import doc_signatures
    from iceberg_kafka_connect_spark.sinks import Catalog
    from iceberg_kafka_connect_spark.streaming.dedup import curation_loop
    from iceberg_kafka_connect_spark.streaming.pipeline import BATCH_ID_PROP

    cat = Catalog(str(tmp_path / "wh"))
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    table = cat.create_table("default.crash_corpus", schema)
    sigs = cat.create_table(
        "default.crash_sigs",
        T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("digest", T.StringType()),
                T.StructField("bands", T.ArrayType(T.LongType())),
                T.StructField("shingle_hashes", T.ArrayType(T.LongType())),
            ]
        ),
    )
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "uno dos tres cuatro cinco seis siete ocho"),
        ],
        schema,
    )
    # simulate the crashed half-batch: signature commit landed (batch 0),
    # corpus commit did not
    sigs.append(
        doc_signatures(docs),
        snapshot_props={BATCH_ID_PROP: "0", "curation-loop": "1"},
    )
    src = tmp_path / "docs"
    src.mkdir()
    with open(src / "b0.json", "w") as f:
        for r in docs.collect():
            f.write(json.dumps({"doc_id": r.doc_id, "text": r.text}) + "\n")
    stream = spark.readStream.schema("doc_id long, text string").json(str(src))
    q = curation_loop(
        stream, table, checkpoint=str(tmp_path / "ckpt"), signature_table=sigs
    )
    q.processAllAvailable()
    q.stop()
    # the replayed batch 0 must commit the committed-signature survivors
    assert sorted(r.doc_id for r in table.read(spark).collect()) == [1, 2]
    assert sorted(r.id for r in sigs.read(spark).collect()) == [1, 2]


def test_curation_loop_rejects_unbackfilled_signature_table(spark, tmp_path):
    import pytest as _pytest
    from pyspark.sql import types as T

    from iceberg_kafka_connect_spark.sinks import Catalog
    from iceberg_kafka_connect_spark.streaming.dedup import curation_loop

    cat = Catalog(str(tmp_path / "wh"))
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    table = cat.create_table("default.pop_corpus", schema)
    table.append(spark.createDataFrame([(1, "existing doc words")], schema))
    sigs = cat.create_table(
        "default.pop_sigs",
        T.StructType([T.StructField("id", T.LongType())]),
    )
    src = tmp_path / "empty_src"
    src.mkdir()
    stream = spark.readStream.schema("doc_id long, text string").json(str(src))
    with _pytest.raises(ValueError, match="[Bb]ackfill"):
        curation_loop(stream, table, signature_table=sigs)


def _emit_typed(path, rows, offset0=0):
    path.mkdir(parents=True, exist_ok=True)
    with open(path / f"f{offset0}.json", "w") as f:
        for i, (user, ts, etype) in enumerate(rows):
            f.write(
                json.dumps(
                    {
                        "key": str(user),
                        "value": json.dumps({"t": etype}),
                        "topic": "t",
                        "partition": 0,
                        "offset": offset0 + i,
                        "timestamp": ts,
                        "event_type": etype,
                    }
                )
                + "\n"
            )


def test_funnel_stream_depths(spark, tmp_path):
    from iceberg_kafka_connect_spark.streaming.stateful import funnel_stream

    src = tmp_path / "src"
    _emit_typed(
        src,
        [
            (1, "2024-01-01T00:00:00.000Z", "view"),
            (1, "2024-01-01T00:01:00.000Z", "click"),
            (1, "2024-01-01T00:02:00.000Z", "purchase"),
            # user 2: purchase before click — stops at 2
            (2, "2024-01-01T00:00:00.000Z", "view"),
            (2, "2024-01-01T00:01:00.000Z", "purchase"),
            (2, "2024-01-01T00:02:00.000Z", "click"),
            # user 3: click with no prior view
            (3, "2024-01-01T00:00:00.000Z", "click"),
        ],
    )
    stream = spark.readStream.schema(
        "key string, value string, topic string, partition int, "
        "offset long, timestamp timestamp, event_type string"
    ).json(str(src))
    out = funnel_stream(
        stream, ["view", "click", "purchase"], user_col="key"
    )
    _run_to_memory(out, "funnel_t", tmp_path / "ck", "update")
    got = {
        int(r.key): r.depth
        for r in spark.sql("select * from funnel_t").collect()
    }
    assert got == {1: 3, 2: 2, 3: 0}


def test_funnel_stream_state_survives_batches(spark, tmp_path):
    """Step 2 arriving in a LATER micro-batch still chains off step 1's
    stored earliest completion."""
    from iceberg_kafka_connect_spark.streaming.stateful import funnel_stream

    src = tmp_path / "src"
    ck = tmp_path / "ck"
    results: dict[int, int] = {}

    def sink(batch, _bid):
        for r in batch.collect():
            results[int(r.key)] = r.depth

    def run_batch():
        stream = spark.readStream.schema(
            "key string, value string, topic string, partition int, "
            "offset long, timestamp timestamp, event_type string"
        ).json(str(src))
        q = (
            funnel_stream(stream, ["view", "click"], user_col="key")
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", str(ck))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _emit_typed(src, [(1, "2024-01-01T00:00:00.000Z", "view")])
    run_batch()
    assert results[1] == 1
    _emit_typed(
        src, [(1, "2024-01-01T00:05:00.000Z", "click")], offset0=10
    )
    run_batch()
    assert results[1] == 2


def test_funnel_stream_long_keys(spark, tmp_path):
    """A LongType user column — the events-table shape — types through:
    the output key keeps the input's name and dtype."""
    from iceberg_kafka_connect_spark.streaming.stateful import funnel_stream

    src = tmp_path / "srcl"
    src.mkdir(parents=True, exist_ok=True)
    with open(src / "c0.json", "w") as f:
        for i, (u, s_, ty) in enumerate(
            [(7, 0, "view"), (7, 1, "click"), (8, 0, "click")]
        ):
            f.write(
                json.dumps(
                    {
                        "user_id": u,
                        "timestamp": f"2024-01-01T00:00:0{s_}.000Z",
                        "event_type": ty,
                        "offset": i,
                    }
                )
                + "\n"
            )
    stream = spark.readStream.schema(
        "user_id long, timestamp timestamp, event_type string, offset long"
    ).json(str(src))
    out = funnel_stream(stream, ["view", "click"])
    assert [f.name for f in out.schema.fields[:1]] == ["user_id"]
    assert out.schema["user_id"].dataType.simpleString() == "bigint"
    _run_to_memory(out, "funnel_long", tmp_path / "ckl", "update")
    got = {
        r.user_id: r.depth
        for r in spark.sql("select * from funnel_long").collect()
    }
    assert got == {7: 2, 8: 0}
