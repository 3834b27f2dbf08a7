"""Multimodal-column queries: binary payload plumbing over `documents`.

The container has no codecs, so payloads are synthesized (utf-8 bytes of the
text) — but the operators are the real plumbing: binary columns, typed
metadata structs with decode-free filtering, byte-level digests, frame
sampling, and an Arrow-batched fake decoder (rows-only checked here, its
semantics are pytest-verified).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import multimodal as mm
from . import register
from .core import table


def _with_payload(docs):
    """binary payload column = utf-8 bytes of the text (stand-in blob)."""
    return docs.withColumn("payload", F.encode(F.col("text"), "utf-8"))


# --------------------------------------------------------------------------
# Byte-level stats without decoding: size + sha256 digest (blob dedup keys).
# --------------------------------------------------------------------------
@register(
    "multimodal_payload_stats",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
           sha256(text) AS sha256
    FROM documents
    """,
    tags=("multimodal",),
)
def multimodal_payload_stats(spark, sf_dir):
    docs = _with_payload(table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.length("payload").alias("byte_len"),
        F.sha2("payload", 256).alias("sha256"),
    )


# --------------------------------------------------------------------------
# Typed metadata struct + decode-free predicate: media rows are filtered on
# the meta columns BEFORE any (expensive) decode touches the payload.
# --------------------------------------------------------------------------
@register(
    "multimodal_meta_filter",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) % 1920 AS INTEGER) AS width,
           CAST(octet_length(encode(text)) % 1080 AS INTEGER) AS height,
           CAST(octet_length(encode(text)) AS BIGINT) * 10 AS duration_ms
    FROM documents
    WHERE (octet_length(encode(text)) % 1920) >= 200
    """,
    tags=("multimodal",),
)
def multimodal_meta_filter(spark, sf_dir):
    docs = _with_payload(table(spark, sf_dir, "documents"))
    with_meta = mm.attach_media_meta(docs, media_type="video")
    return with_meta.filter(F.col("media_meta.width") >= 200).select(
        "doc_id",
        F.col("media_meta.width").alias("width"),
        F.col("media_meta.height").alias("height"),
        F.col("media_meta.duration_ms").alias("duration_ms"),
    )


# --------------------------------------------------------------------------
# Frame sampling: every 16th position of the payload is a "frame"; rows
# explode per frame. (String form so the oracle can mirror it; the binary
# form is operators/multimodal.sample_frames, pytest-covered.)
# --------------------------------------------------------------------------
@register(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id, CAST(u.pos AS BIGINT) AS frame_pos,
           CAST(ascii(substring(text, CAST(u.pos AS INTEGER), 1)) AS INTEGER) AS frame_val
    FROM documents, unnest(generate_series(1, length(text), 16)) AS u(pos)
    """,
    tags=("multimodal",),
)
def multimodal_frame_sample(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    positions = F.sequence(F.lit(1).cast("bigint"), F.length("text").cast("bigint"), F.lit(16).cast("bigint"))
    return docs.select(
        "doc_id", F.explode(positions).alias("frame_pos"), "text"
    ).select(
        "doc_id",
        "frame_pos",
        F.ascii(F.expr("substring(text, cast(frame_pos as int), 1)")).alias("frame_val"),
    )


# --------------------------------------------------------------------------
# Arrow-batched fake decode (mapInPandas): real schema/batching/partitioning,
# deterministic byte-histogram features. No SQL oracle → rows-only + pytest.
# --------------------------------------------------------------------------
@register("multimodal_decode_features", oracle=None, tags=("multimodal",))
def multimodal_decode_features(spark, sf_dir):
    docs = _with_payload(table(spark, sf_dir, "documents"))
    feats = mm.decode_image_features(docs, feature_dim=8, use_fake=True)
    return feats.select(
        F.col("id").alias("doc_id"),
        "byte_len",
        F.size("features").alias("feature_dim"),
        F.round(F.element_at("features", 1).cast("double"), 6).alias("f0"),
    )


# --------------------------------------------------------------------------
# Decode-free resize planning: target dims from metadata only (integer
# arithmetic, aspect preserved, no upscaling) — the projection that lets a
# pipeline skip decoding rows that need no resample.
# --------------------------------------------------------------------------
@register(
    "multimodal_resize_plan",
    oracle="""
    WITH meta AS (
        SELECT doc_id,
               CAST(octet_length(encode(text)) % 1920 AS BIGINT) AS w,
               CAST(octet_length(encode(text)) % 1080 AS BIGINT) AS h
        FROM documents
    )
    SELECT doc_id,
           CAST(w AS INT) AS width,
           CAST(h AS INT) AS height,
           CAST(CASE WHEN greatest(w, h) > 224
                     THEN floor((w * 224) / CAST(greatest(w, h) AS DOUBLE))
                     ELSE w END AS INT) AS target_w,
           CAST(CASE WHEN greatest(w, h) > 224
                     THEN floor((h * 224) / CAST(greatest(w, h) AS DOUBLE))
                     ELSE h END AS INT) AS target_h,
           greatest(w, h) > 224 AS needs_resize
    FROM meta
    """,
    tags=("multimodal",),
)
def multimodal_resize_plan(spark, sf_dir):
    docs = _with_payload(table(spark, sf_dir, "documents"))
    with_meta = mm.attach_media_meta(docs, media_type="image")
    planned = mm.resize_plan(with_meta, max_side=224)
    return planned.select(
        "doc_id",
        F.col("media_meta.width").cast("int").alias("width"),
        F.col("media_meta.height").cast("int").alias("height"),
        F.col("resize.target_w").alias("target_w"),
        F.col("resize.target_h").alias("target_h"),
        F.col("resize.needs_resize").alias("needs_resize"),
    )


# --------------------------------------------------------------------------
# Perceptual-hash dedup groups: decode (deterministic byte-histogram fake;
# ASCII corpus ⇒ DuckDB can replicate it character-wise) → average-hash
# with the LITERAL 1/8 threshold (= the analytic mean of the normalized
# histogram; a computed mean would tie exactly with features and let
# float summation-order noise decide the strict comparison per engine) →
# exact groupBy on the 64-bit hash. Every feature sits ≥ 1/(8·len) from
# the literal unless exactly equal, so float32 rounding can't flip a bit
# vs the exact-arithmetic oracle.
# --------------------------------------------------------------------------
@register(
    "multimodal_phash_dedup",
    oracle="""
    WITH chars AS (
        SELECT doc_id,
               list_transform(
                   range(1, length(text) + 1),
                   i -> ascii(substr(text, CAST(i AS INT), 1)) % 8
               ) AS codes
        FROM documents
    ),
    feat AS (
        SELECT doc_id, d.d AS dim,
               CAST(len(list_filter(codes, c -> c = d.d)) AS DOUBLE)
                   / GREATEST(len(codes), 1) AS f
        FROM chars, (SELECT unnest(range(0, 8)) AS d) d
    ),
    sig AS (
        SELECT doc_id,
               -- CAST: DuckDB promotes SUM(BIGINT) to HUGEINT, which the
               -- driver's fetch materializes as float64 (1.0 vs int64 1)
               -- and hash-mismatches despite identical values (r4 verdict).
               CAST(SUM(CASE WHEN f > 0.125
                             THEN CAST(1 AS BIGINT) << dim
                             ELSE 0 END) AS BIGINT) AS phash
        FROM feat
        GROUP BY doc_id
    )
    SELECT phash,
           CAST(MIN(doc_id) AS BIGINT) AS keep_id,
           CAST(COUNT(*) AS BIGINT) AS n_imgs
    FROM sig GROUP BY phash
    """,
    tags=("multimodal",),
)
def multimodal_phash_dedup(spark, sf_dir):
    docs = _with_payload(table(spark, sf_dir, "documents"))
    return mm.phash_groups(docs, use_fake=True, threshold=1 / 8)
