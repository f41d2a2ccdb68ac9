"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side design is real and tested — schema, partition-friendly batch
shape, Arrow-batched UDF signatures via ``mapInPandas`` — while the actual
codec work is STUBBED (image/audio libraries are not in this container):

- ``decode_stub=True`` (default) runs a clearly-marked deterministic fake
  decoder (dimensions/bytes derived from the payload hash) so the plumbing
  is testable end-to-end.
- ``decode_stub=False`` raises ``NotImplementedError`` at the exact seam
  where a real codec (PIL / torchaudio / pyav) plugs in.

At 100 TB the binary payloads dominate: the operators keep them out of
shuffles (metadata-only projections before any wide op; feature extraction
is a map-only ``mapInPandas`` that never reorders data).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),  # opaque encoded bytes
        T.StructField("mime", T.StringType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)


def synthetic_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """deterministic fake media table (payload = seeded bytes)."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        F.sha2(F.concat(F.lit(str(seed)), F.col("id").cast("string")), 256)
        .cast("binary")
        .alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )
    return df


FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, sha256 string, "
    "width int, height int, n_frames int, features array<float>"
)


def _fake_decode(payload: bytes, kind: str) -> dict:
    """STUB decoder — deterministic pseudo-features from the payload hash.
    Replace with PIL/pyav/torchaudio in a real deployment."""
    h = hashlib.sha256(payload or b"").digest()
    return {
        "width": 64 + h[0],
        "height": 64 + h[1],
        "n_frames": 1 if kind == "image" else 1 + h[2] % 32,
        "features": [b / 255.0 for b in h[:16]],
    }


def extract_features(df: DataFrame, decode_stub: bool = True) -> DataFrame:
    """decode + feature-extract via Arrow-batched ``mapInPandas`` (map-only:
    no shuffle; binary stays within its input partition)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires codec libraries (PIL/pyav); "
                    "install them and replace _fake_decode"
                )
            rows = []
            for r in pdf.itertuples(index=False):
                payload = bytes(r.payload) if r.payload is not None else b""
                d = _fake_decode(payload, r.kind)
                rows.append(
                    {
                        "media_id": r.media_id,
                        "kind": r.kind,
                        "n_bytes": len(payload),
                        "sha256": hashlib.sha256(payload).hexdigest(),
                        **d,
                    }
                )
            yield pd.DataFrame(rows)

    cols = ["media_id", "kind", "payload"]
    return df.select(*cols).mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int, decode_stub: bool = True) -> DataFrame:
    """image resize seam — STUB: passes metadata through, marks the op."""
    if not decode_stub:
        raise NotImplementedError("real resize requires PIL — plug in here")
    return df.filter(F.col("kind") == "image").withColumn(
        "meta",
        F.struct(
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("meta.duration_ms").alias("duration_ms"),
        ),
    )


def sample_frames(df: DataFrame, every_n: int = 10, decode_stub: bool = True) -> DataFrame:
    """video frame-sampling seam — STUB: emits frame index rows derived from
    the fake decoder's n_frames (real impl: pyav keyframe iteration)."""
    feats = extract_features(df.filter(F.col("kind") == "video"), decode_stub)
    return feats.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))).alias("frame_idx"),
    )
