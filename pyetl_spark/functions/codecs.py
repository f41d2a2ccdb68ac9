"""Pure-stdlib media codecs for the multimodal seam.

The sandbox has no PIL/pyav, but an UNCOMPRESSED format needs neither: BMP
(Windows V3, 24-bit BI_RGB) is struct + bytes math. This module implements
a real, tested encoder/decoder pair so the multimodal operators
(`extract_features`, `resize_images`) run **un-stubbed** on BMP payloads —
the stub seam in multimodal.py remains only for compressed formats
(JPEG/PNG/video), where a real library must plug in.

Everything here is plain Python/numpy executed INSIDE Arrow-batched pandas
UDFs — one call per image, vectorized numpy math per pixel — so the Spark
plan stays a map-only ``mapInPandas`` with no shuffle.
"""

from __future__ import annotations

import struct

import numpy as np

_FILE_HDR = struct.Struct("<2sIHHI")  # magic, file size, res1, res2, data offset
_INFO_HDR = struct.Struct("<IiiHHIIiiII")  # V3 BITMAPINFOHEADER (40 bytes)
_HDR_SIZE = _FILE_HDR.size + _INFO_HDR.size  # 54


def bmp_row_stride(width: int) -> int:
    """bytes per stored row: 3 bytes/pixel padded up to a 4-byte boundary."""
    return (width * 3 + 3) & ~3


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(height, width, 3) uint8 RGB array -> 24-bit BI_RGB BMP bytes.

    BMP stores rows bottom-up in BGR order; both flips happen here so
    callers only ever see top-down RGB arrays."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB array, got shape {pixels.shape}")
    h, w = pixels.shape[:2]
    stride = bmp_row_stride(w)
    data = np.zeros((h, stride), dtype=np.uint8)
    data[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    raw = data.tobytes()
    file_hdr = _FILE_HDR.pack(b"BM", _HDR_SIZE + len(raw), 0, 0, _HDR_SIZE)
    info_hdr = _INFO_HDR.pack(_INFO_HDR.size, w, h, 1, 24, 0, len(raw), 2835, 2835, 0, 0)
    return file_hdr + info_hdr + raw


def is_bmp(payload: bytes | None) -> bool:
    return bool(payload) and payload[:2] == b"BM" and len(payload) >= _HDR_SIZE


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP bytes -> (height, width, 3) uint8 RGB array
    (top-down regardless of the file's row order)."""
    magic, _fsize, _r1, _r2, offset = _FILE_HDR.unpack_from(payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    (hdr_size, w, h, _planes, bpp, compression, *_rest) = _INFO_HDR.unpack_from(
        payload, _FILE_HDR.size
    )
    if hdr_size < _INFO_HDR.size:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit BI_RGB supported (got bpp={bpp}, compression={compression})")
    top_down = h < 0
    h = abs(h)
    stride = bmp_row_stride(w)
    raw = np.frombuffer(payload, dtype=np.uint8, count=h * stride, offset=offset)
    rows = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """nearest-neighbor resample via integer index maps (pure numpy)."""
    h, w = pixels.shape[:2]
    yi = (np.arange(height) * h // height).clip(0, h - 1)
    xi = (np.arange(width) * w // width).clip(0, w - 1)
    return pixels[yi][:, xi]


def image_features(pixels: np.ndarray, bins: int = 16) -> list[float]:
    """deterministic real features from decoded pixels: a ``bins``-bucket
    grayscale intensity histogram (L1-normalized) — the same shape a real
    embedding model would emit, computed from actual pixel values."""
    gray = pixels.astype(np.float32).mean(axis=2)
    hist, _ = np.histogram(gray, bins=bins, range=(0.0, 256.0))
    total = max(int(hist.sum()), 1)
    return [float(c) / total for c in hist]
