"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side design is real and tested — schema, partition-friendly batch
shape, Arrow-batched UDF signatures via ``mapInPandas``. Codec status:

- **BMP images decode for REAL** (``pyetl_spark.functions.codecs``: a
  pure-stdlib 24-bit BI_RGB encoder/decoder — no PIL needed). With
  ``decode_stub=False``, ``extract_features`` computes true width/height
  and pixel-histogram features, and ``resize_images`` re-encodes actually
  resampled pixels, for any payload whose magic bytes say BMP.
- **PNG images decode for REAL too** (same module: chunk walk + stdlib
  zlib inflate + all five per-scanline unfilters; 8-bit gray/RGB/RGBA,
  non-interlaced — the layout most corpus PNGs use). ``resize_images``
  round-trips PNG payloads through decode → resample → re-encode.
- **WAV audio decodes for REAL** (same module: RIFF/PCM-16 encoder/decoder
  + spectrum/RMS/zero-crossing features — no torchaudio needed).
  ``sample_audio_windows`` emits per-window RMS rows from actual samples.
- **uncompressed-DIB AVI video decodes for REAL** (same module: RIFF/AVI
  encoder/decoder whose '00db' frames share BMP's pixel layout — no pyav
  needed). ``sample_frames`` emits every-Nth-frame rows with true
  per-frame histogram features and timestamps.
- Codec-library formats (JPEG/MP3/H.264) remain STUBBED (their
  libraries are not in this container): ``decode_stub=True`` (default)
  runs a clearly-marked deterministic fake decoder so the plumbing is
  testable end-to-end; ``decode_stub=False`` raises
  ``NotImplementedError`` for them at the exact seam where a real codec
  (PIL / torchaudio / pyav) plugs in.

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


def synthetic_bmp_media(
    spark, n: int = 50, width: int = 32, height: int = 24, seed: int = 42
) -> DataFrame:
    """deterministic REAL-media table: every payload is a valid 24-bit BMP
    (seeded random pixels), generated distributed via ``mapInPandas`` —
    exercises the un-stubbed decode path end-to-end."""
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyetl_spark.functions import codecs

        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                rng = np.random.default_rng(seed + int(mid))
                px = rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)
                rows.append(
                    {
                        "media_id": int(mid),
                        "kind": "image",
                        "payload": codecs.encode_bmp(px),
                        "mime": "image/bmp",
                        "meta": {"width": width, "height": height, "duration_ms": None},
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def synthetic_png_media(
    spark, n: int = 50, width: int = 32, height: int = 24, seed: int = 42
) -> DataFrame:
    """deterministic REAL-media table: every payload is a valid 8-bit RGB
    PNG (seeded random pixels). The scanline filter type CYCLES 0-4 with
    media_id, so a scan of the table exercises every PNG unfilter path —
    a decoder that mishandles Sub/Up/Average/Paeth fails 4/5 of rows."""
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyetl_spark.functions import codecs

        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                rng = np.random.default_rng(seed + int(mid))
                px = rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)
                rows.append(
                    {
                        "media_id": int(mid),
                        "kind": "image",
                        "payload": codecs.encode_png(px, filter_type=int(mid) % 5),
                        "mime": "image/png",
                        "meta": {"width": width, "height": height, "duration_ms": None},
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def synthetic_wav_media(
    spark, n: int = 50, sample_rate: int = 8000, duration_ms: int = 250, seed: int = 42
) -> DataFrame:
    """deterministic REAL-audio table: every payload is a valid PCM16 WAV
    (seeded sine + noise mix, mono), generated distributed via
    ``mapInPandas`` — exercises the un-stubbed audio decode path."""
    import numpy as np

    n_frames = sample_rate * duration_ms // 1000

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyetl_spark.functions import codecs

        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                rng = np.random.default_rng(seed + int(mid))
                freq = 100.0 + float(rng.integers(0, 2000))
                t = np.arange(n_frames) / sample_rate
                wave = 0.6 * np.sin(2 * np.pi * freq * t) + 0.1 * rng.standard_normal(n_frames)
                samples = np.clip(wave * 16000.0, -32768, 32767).astype(np.int16)
                rows.append(
                    {
                        "media_id": int(mid),
                        "kind": "audio",
                        "payload": codecs.encode_wav(samples, sample_rate),
                        "mime": "audio/wav",
                        "meta": {"width": None, "height": None, "duration_ms": duration_ms},
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def synthetic_avi_media(
    spark,
    n: int = 20,
    width: int = 24,
    height: int = 16,
    n_frames: int = 12,
    fps: int = 10,
    seed: int = 42,
) -> DataFrame:
    """deterministic REAL-video table: every payload is a valid
    uncompressed-DIB AVI (seeded moving-gradient frames), generated
    distributed via ``mapInPandas`` — exercises the un-stubbed video path."""
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyetl_spark.functions import codecs

        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                rng = np.random.default_rng(seed + int(mid))
                base = rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)
                # gradient drifts one pixel per frame: frames differ but are
                # correlated, like real video
                frames = np.stack(
                    [np.roll(base, shift=t, axis=1) for t in range(n_frames)]
                )
                rows.append(
                    {
                        "media_id": int(mid),
                        "kind": "video",
                        "payload": codecs.encode_avi(frames, fps),
                        "mime": "video/x-msvideo",
                        "meta": {
                            "width": width,
                            "height": height,
                            "duration_ms": n_frames * 1000 // fps,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


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


def _real_decode(payload: bytes) -> dict | None:
    """real decode for formats the stdlib codec handles (BMP, PNG, WAV,
    AVI); None otherwise — caller falls back to stub/raise."""
    from pyetl_spark.functions import codecs

    if codecs.is_bmp(payload) or codecs.is_png(payload):
        px = (
            codecs.decode_bmp(payload)
            if codecs.is_bmp(payload)
            else codecs.decode_png(payload)
        )
        if px.shape[2] == 1:  # grayscale PNG: histogram over the one channel
            px = px.repeat(3, axis=2)
        elif px.shape[2] == 4:  # RGBA: features over the color planes
            px = px[:, :, :3]
        return {
            "width": int(px.shape[1]),
            "height": int(px.shape[0]),
            "n_frames": 1,
            "features": codecs.image_features(px),
        }
    if codecs.is_wav(payload):
        samples, rate = codecs.decode_wav(payload)
        af = codecs.audio_features(samples, rate)
        return {
            "width": None,
            "height": None,
            "n_frames": int(samples.shape[0]),
            "features": af["features"],
        }
    if codecs.is_avi(payload):
        frames, _fps = codecs.decode_avi(payload)
        import numpy as np

        # video-level feature = mean of per-frame histograms (cheap, real)
        feats = np.mean(
            [codecs.image_features(frames[i]) for i in range(frames.shape[0])], axis=0
        ) if frames.shape[0] else np.zeros(16)
        return {
            "width": int(frames.shape[2]),
            "height": int(frames.shape[1]),
            "n_frames": int(frames.shape[0]),
            "features": [float(x) for x in feats],
        }
    return None


def extract_features(df: DataFrame, decode_stub: bool = True) -> DataFrame:
    """decode + feature-extract via Arrow-batched ``mapInPandas`` (map-only:
    no shuffle; binary stays within its input partition). BMP, PNG, WAV and
    AVI payloads (magic-sniffed) decode for real in EITHER mode;
    ``decode_stub`` controls what happens to everything else (fake vs
    NotImplementedError)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                payload = bytes(r.payload) if r.payload is not None else b""
                d = _real_decode(payload)
                if d is None:
                    if decode_stub:
                        d = _fake_decode(payload, r.kind)
                    else:
                        raise NotImplementedError(
                            "real decode for non-BMP/PNG/WAV/AVI media "
                            "requires codec libraries (PIL/pyav); install "
                            "them and extend _real_decode"
                        )
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
    """image resize. ``decode_stub=False``: REAL path — decode BMP/PNG
    payloads, nearest-neighbor resample, re-encode in the SAME container
    (map-only ``mapInPandas``; any other format raises at the codec seam).
    ``decode_stub=True``: stub — passes payload through and stamps the
    target dimensions in metadata."""
    imgs = df.filter(F.col("kind") == "image")
    if decode_stub:
        return imgs.withColumn(
            "meta",
            F.struct(
                F.lit(width).alias("width"),
                F.lit(height).alias("height"),
                F.col("meta.duration_ms").alias("duration_ms"),
            ),
        )

    out_schema = imgs.schema

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyetl_spark.functions import codecs

        for pdf in batches:
            payloads, metas = [], []
            for r in pdf.itertuples(index=False):
                payload = bytes(r.payload) if r.payload is not None else b""
                if codecs.is_bmp(payload):
                    px = codecs.resize_nearest(codecs.decode_bmp(payload), width, height)
                    payloads.append(codecs.encode_bmp(px))
                elif codecs.is_png(payload):
                    px = codecs.resize_nearest(codecs.decode_png(payload), width, height)
                    payloads.append(codecs.encode_png(px))
                else:
                    raise NotImplementedError(
                        "real resize for non-BMP/PNG images requires PIL — "
                        "plug in at this seam"
                    )
                meta = dict(r.meta) if isinstance(r.meta, dict) else {}
                metas.append(
                    {"width": width, "height": height, "duration_ms": meta.get("duration_ms")}
                )
            pdf = pdf.copy()
            pdf["payload"] = payloads
            pdf["meta"] = metas
            yield pdf

    return imgs.mapInPandas(run, schema=out_schema)


AUDIO_WINDOW_SCHEMA = (
    "media_id long, window_idx int, start_ms int, rms double, zcr double"
)


def sample_audio_windows(df: DataFrame, window_ms: int = 50) -> DataFrame:
    """REAL windowed audio analysis: decode WAV payloads and emit one row
    per ``window_ms`` window with its RMS energy and zero-crossing rate —
    the audio analogue of video frame sampling (silence trimming, VAD
    pre-filtering, segment-level dedup all start from these rows).

    Map-only ``mapInPandas``: each payload is decoded once inside its input
    partition; only the tiny per-window rows ever reach a shuffle. Non-WAV
    audio raises at the codec seam (plug pyav/torchaudio in there)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from pyetl_spark.functions import codecs

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                payload = bytes(r.payload) if r.payload is not None else b""
                if not codecs.is_wav(payload):
                    raise NotImplementedError(
                        "real windowing for non-WAV audio requires codec "
                        "libraries (pyav/torchaudio) — plug in at this seam"
                    )
                samples, rate = codecs.decode_wav(payload)
                mono = samples.astype(np.float64).mean(axis=1)
                step = max(1, rate * window_ms // 1000)
                for w in range(0, mono.size, step):
                    seg = mono[w : w + step]
                    zcr = (
                        float(np.mean(np.signbit(seg[1:]) != np.signbit(seg[:-1])))
                        if seg.size > 1
                        else 0.0
                    )
                    rows.append(
                        {
                            "media_id": r.media_id,
                            "window_idx": w // step,
                            "start_ms": int(w * 1000 / rate),
                            "rms": float(np.sqrt(np.mean(seg**2))),
                            "zcr": zcr,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "window_idx", "start_ms", "rms", "zcr"]
            )

    return (
        df.filter(F.col("kind") == "audio")
        .select("media_id", "payload")
        .mapInPandas(run, schema=AUDIO_WINDOW_SCHEMA)
    )


FRAME_SCHEMA = (
    "media_id long, frame_idx int, ts_ms int, width int, height int, "
    "features array<float>"
)


def sample_frames(df: DataFrame, every_n: int = 10, decode_stub: bool = True) -> DataFrame:
    """video frame sampling. AVI payloads decode for REAL in either mode:
    every ``every_n``-th frame becomes a row with its true timestamp and
    per-frame histogram features (the input to frame-level dedup /
    embedding pipelines). Non-AVI video falls back to the stub decoder's
    synthetic frame count (``decode_stub=True``) or raises at the codec
    seam where pyav plugs in (``decode_stub=False``).

    Map-only ``mapInPandas``: each payload is decoded once inside its input
    partition; only small per-frame rows ever reach a shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyetl_spark.functions import codecs

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                payload = bytes(r.payload) if r.payload is not None else b""
                if codecs.is_avi(payload):
                    frames, fps = codecs.decode_avi(payload)
                    for idx in range(0, frames.shape[0], every_n):
                        rows.append(
                            {
                                "media_id": r.media_id,
                                "frame_idx": idx,
                                "ts_ms": int(idx * 1000 / fps),
                                "width": int(frames.shape[2]),
                                "height": int(frames.shape[1]),
                                "features": codecs.image_features(frames[idx]),
                            }
                        )
                elif decode_stub:
                    d = _fake_decode(payload, "video")
                    for idx in range(0, d["n_frames"], every_n):
                        rows.append(
                            {
                                "media_id": r.media_id,
                                "frame_idx": idx,
                                "ts_ms": None,
                                "width": d["width"],
                                "height": d["height"],
                                "features": None,
                            }
                        )
                else:
                    raise NotImplementedError(
                        "real frame sampling for non-AVI video requires "
                        "pyav — plug in at this seam"
                    )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_idx", "ts_ms", "width", "height", "features"],
            )

    return (
        df.filter(F.col("kind") == "video")
        .select("media_id", "payload")
        .mapInPandas(run, schema=FRAME_SCHEMA)
    )
