"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (BASELINE.json north-star surface; not in the reference).

Data model: ``binary`` payload column + struct metadata column
(modality, mime, width/height/duration, sha) — the layout a 100 TB
training-data lake uses (payloads inline for small media, or
path-references for large; both shapes supported).

The Spark-side plumbing (schema, partitioning, Arrow batch shape,
UDF signatures) is real and tested; the actual codec work (decode,
resize, frame-sample) requires image/audio libraries that are NOT in
this container, so the decode kernel is stubbed: by default it
raises NotImplementedError; with ``fake=True`` it produces a
deterministic fake (payload-hash-seeded dimensions/features) so the
distributed pipeline can be exercised end-to-end.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("modality", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def media_table(df: DataFrame, payload_col: str, modality: str, mime: str) -> DataFrame:
    """Wrap a binary column into the canonical media layout:
    (media_id, payload binary, meta struct, sha256). The sha enables
    exact dedup of media without decoding — same hash-aggregate
    pattern as text dedup."""
    return df.select(
        F.monotonically_increasing_id().alias("media_id"),
        F.col(payload_col).alias("payload"),
        F.struct(
            F.lit(modality).alias("modality"),
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
        F.sha2(F.col(payload_col), 256).alias("sha256"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, list[float]]:
    """Deterministic fake decode: dimensions/features derived from
    the payload hash. CLEARLY A STUB — stands in for PIL/ffmpeg which
    are not installed in this container."""
    h = hashlib.sha256(payload or b"").digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    n_frames = 1 + h[2] % 8
    feature = [b / 255.0 for b in h[:16]]
    return width, height, n_frames, feature


def decode_media(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode/feature-extract media payloads via mapInPandas (Arrow
    batches; one python worker per partition — the right shape for
    CPU-bound codec work). Real decoding is NotImplemented in this
    environment; ``fake=True`` runs the deterministic stub through
    the identical distributed plumbing."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decoding requires image/audio libraries not "
                    "installed in this container; pass fake=True to run "
                    "the deterministic stub"
                )
            rows = []
            for mid, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                w, h, nf, feat = _fake_decode(bytes(payload or b""))
                modality = meta["modality"] if meta is not None else None
                rows.append((mid, modality, w, h, nf, feat))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "modality",
                    "width",
                    "height",
                    "n_frames",
                    "feature",
                ],
            )

    return media.mapInPandas(decode_batches, schema=DECODED_SCHEMA)


def frame_sample(decoded: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame-sampling plan: explode n_frames into frame indices and
    keep every n-th — pure column expressions (the decode already
    happened); the real pipeline would carry frame payloads."""
    frames = F.sequence(F.lit(0), F.col("n_frames") - 1)
    return (
        decoded.select(
            "media_id",
            F.explode(F.filter(frames, lambda i: i % every_n == 0)).alias("frame_idx"),
            "width",
            "height",
        )
    )


def dedup_media_exact(media: DataFrame) -> DataFrame:
    """Exact media dedup on content hash — no decode required."""
    return media.groupBy("sha256").agg(
        F.min("media_id").alias("media_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )
