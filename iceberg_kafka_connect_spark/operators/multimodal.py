"""Multimodal column handling: image/audio/video as opaque binary columns
with typed metadata.

The container has no image/audio codecs, so the decode step is STUBBED
(NotImplementedError behind an import-try, plus a deterministic fake for
tests) — but the Spark-side plumbing is real: schema, Arrow batch shape,
mapInPandas signatures, and partitioning are exactly what a production
decode would use. At 100 TB the design rules are:

- binary payloads never shuffle: decode/feature-extract runs mapInPandas on
  the scan partitioning, emitting small typed features; only features move.
- metadata (codec, dims, duration) is a typed struct column so filters like
  `meta.width >= 512` prune BEFORE any decode.
- Arrow batch size bounds executor memory: payload_bytes × batch ≤ heap slice.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image/audio/video
        T.StructField("codec", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def attach_media_meta(
    df: DataFrame,
    payload_col: str = "payload",
    media_type: str = "image",
    codec: str = "raw",
) -> DataFrame:
    """Attach the typed metadata struct. Real pipelines parse container
    headers (cheap, bounded reads); here dims derive from payload size."""
    size = F.length(F.col(payload_col))
    meta = F.struct(
        F.lit(media_type).alias("media_type"),
        F.lit(codec).alias("codec"),
        (size % 1920).cast("int").alias("width"),
        (size % 1080).cast("int").alias("height"),
        (size.cast("bigint") * 10).alias("duration_ms"),
    )
    return df.withColumn("media_meta", meta)


def payload_stats(payload: Column) -> list[Column]:
    """Cheap byte-level stats that never decode: size + content digest.
    Used for exact dedup of media blobs and storage accounting."""
    return [
        F.length(payload).alias("byte_len"),
        F.sha2(payload, 256).alias("sha256"),
        F.crc32(payload).alias("crc32"),
    ]


def _real_image_decode_available() -> bool:
    try:
        import PIL  # noqa: F401, PLC0415

        return True
    except ImportError:
        return False


def decode_image_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    feature_dim: int = 8,
    use_fake: bool | None = None,
) -> DataFrame:
    """Decode → feature-extract via mapInPandas (Arrow-batched).

    Two executable branches behind the same plumbing (schema, batching,
    partition alignment — identical plan either way):

    - **real** (``use_fake=False``, default when PIL importable): decode
      each payload with PIL, grayscale, resize to a ``feature_dim``-square
      thumbnail, emit per-row band means — a genuine pixel-space feature.
    - **fake** (default in codec-less containers like this one): a
      deterministic byte-histogram standing in for the decode, so the
      Spark-side machinery stays fully exercised and tested everywhere.

    ``NotImplementedError`` is raised only when the real branch is
    requested and PIL is genuinely absent.
    """
    if use_fake is None:
        use_fake = not _real_image_decode_available()
    if not use_fake and not _real_image_decode_available():
        raise NotImplementedError(
            "real image decode requires PIL — not installed in this container"
        )

    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
            T.StructField("byte_len", T.IntegerType()),
        ]
    )

    def extract_fake(batches: Iterator) -> Iterator:
        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        for pdf in batches:
            feats, lens = [], []
            for blob in pdf[payload_col]:
                arr = np.frombuffer(blob or b"", dtype=np.uint8)
                # deterministic fake "decode": normalized byte histogram
                hist = np.bincount(arr % feature_dim, minlength=feature_dim)
                total = max(int(hist.sum()), 1)
                feats.append((hist / total).astype(np.float32))
                lens.append(len(arr))
            yield pd.DataFrame(
                {"id": pdf[id_col].values, "features": feats, "byte_len": lens}
            )

    def extract_real(batches: Iterator) -> Iterator:
        import io  # noqa: PLC0415

        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415
        from PIL import Image  # noqa: PLC0415

        for pdf in batches:
            feats, lens = [], []
            for blob in pdf[payload_col]:
                raw = bytes(blob or b"")
                lens.append(len(raw))
                img = (
                    Image.open(io.BytesIO(raw))
                    .convert("L")
                    .resize((feature_dim, feature_dim))
                )
                a = np.asarray(img, dtype=np.float32) / 255.0
                feats.append(a.mean(axis=1))  # per-row band means
            yield pd.DataFrame(
                {"id": pdf[id_col].values, "features": feats, "byte_len": lens}
            )

    extract = extract_fake if use_fake else extract_real
    return df.select(id_col, payload_col).mapInPandas(extract, schema=out_schema)


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    stride: int = 16,
) -> DataFrame:
    """Frame sampling for "video" payloads: every stride-th byte stands in
    for a frame (the real version seeks keyframes). Pure Catalyst — the
    positions array is computed per row and exploded; no Python."""
    n = F.length(F.col(payload_col))
    positions = F.sequence(F.lit(1), n, F.lit(stride))
    frames = df.select(
        F.col(id_col),
        F.explode(positions).alias("frame_pos"),
        F.col(payload_col),
    )
    # one "frame" = a 1-byte slice at the sampled position, digested
    return frames.select(
        id_col,
        "frame_pos",
        F.crc32(F.expr(f"substring({payload_col}, frame_pos, 1)")).alias("frame_crc"),
    )


def resize_plan(
    df: DataFrame,
    meta_col: str = "media_meta",
    max_side: int = 224,
) -> DataFrame:
    """Resize planning WITHOUT decoding: compute each media row's target
    dimensions (longest side → ``max_side``, aspect preserved, never
    upscaled) from the metadata struct alone — integer arithmetic only, so
    the plan is engine-exact and the expensive decode+resample can be
    scheduled ONLY for rows whose target differs from the source. The
    actual pixel resample belongs in the Arrow decode stage
    (decode_image_features); at 100 TB the win is that this projection
    prunes no-op resizes before any payload byte is read."""
    w = F.col(f"{meta_col}.width").cast("bigint")
    h = F.col(f"{meta_col}.height").cast("bigint")
    longest = F.greatest(w, h)
    needs = longest > max_side
    tw = F.when(needs, (w * max_side) / longest).otherwise(w)
    th = F.when(needs, (h * max_side) / longest).otherwise(h)
    return df.withColumn(
        "resize",
        F.struct(
            F.floor(tw).cast("int").alias("target_w"),
            F.floor(th).cast("int").alias("target_h"),
            needs.alias("needs_resize"),
        ),
    )


def phash_groups(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    feature_dim: int = 8,
    use_fake: bool | None = None,
    threshold: float | None = None,
) -> DataFrame:
    """Perceptual-hash dedup groups over binary payloads: decode →
    average-hash → exact groupBy — the image-side sibling of exact text
    dedup (near-identical images that decode to the same coarse features
    collapse to one group).

    The hash is the classic aHash: bit i set iff feature i exceeds the
    feature mean (or an explicit ``threshold``). It rides whichever decode
    branch ``decode_image_features`` takes (real PIL thumbnail bands, or
    the deterministic byte-histogram fake in codec-less containers) — the
    hashing itself is pure Catalyst over the features array, so only the
    decode is Python and the shuffle key is one 64-bit long per image.

    For the fake path pass ``threshold=1/feature_dim``: the fake features
    sum to 1 so their mean IS 1/feature_dim analytically, and the literal
    threshold removes the tie ambiguity a computed mean has (a feature can
    equal the mean exactly; float summation-order noise would then decide
    the strict comparison differently per engine). Against the literal,
    every feature is ≥ 1/(dim·len) away unless exactly equal — float32
    rounding (~1e-7 relative) can never flip a bit vs an exact-arithmetic
    SQL oracle, which is what makes the fake path hash-checkable.

    Output: (phash, keep_id = min id, n_imgs).
    """
    feats = decode_image_features(
        df, payload_col, id_col, feature_dim, use_fake
    )
    f = F.col("features")
    if threshold is not None:
        mean = F.lit(float(threshold))
    else:
        mean = F.aggregate(
            f, F.lit(0.0), lambda a, x: a + x.cast("double")
        ) / F.size(f).cast("double")
    bits = F.transform(
        f,
        lambda x, i: F.when(
            x.cast("double") > mean,
            F.call_function("shiftleft", F.lit(1).cast("long"), i.cast("int")),
        ).otherwise(F.lit(0).cast("long")),
    )
    ahash = F.aggregate(bits, F.lit(0).cast("long"), lambda a, x: a + x)
    return (
        feats.select(F.col("id"), ahash.alias("phash"))
        .groupBy("phash")
        .agg(
            F.min("id").alias("keep_id"),
            F.count(F.lit(1)).cast("bigint").alias("n_imgs"),
        )
    )
