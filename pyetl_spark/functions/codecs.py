"""Pure-stdlib media codecs for the multimodal seam.

The sandbox has no PIL/pyav, but an UNCOMPRESSED format needs neither: BMP
(Windows V3, 24-bit BI_RGB) and WAV (RIFF PCM 16-bit) are struct + bytes
math. This module implements real, tested encoder/decoder pairs so the
multimodal operators (`extract_features`, `resize_images`,
`sample_audio_windows`) run **un-stubbed** on BMP and WAV payloads — the
stub seam in multimodal.py remains only for compressed formats
(JPEG/PNG/MP3/video), where a real library must plug in.

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


# --------------------------------------------------------------------- WAV
# RIFF/WAVE, PCM (format tag 1), 16-bit signed little-endian — the simplest
# interchange audio format; `wave` in the stdlib reads the same layout, but
# parsing the two chunks directly keeps encode+decode symmetric and
# byte-exact under our control.

_RIFF_HDR = struct.Struct("<4sI4s")  # 'RIFF', riff size, 'WAVE'
_CHUNK_HDR = struct.Struct("<4sI")  # chunk id, chunk size
_FMT_PCM16 = struct.Struct("<HHIIHH")  # tag, channels, rate, byterate, align, bits


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n_frames,) or (n_frames, channels) int16 array -> PCM16 WAV bytes."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2:
        raise ValueError(f"expected (frames,) or (frames, channels), got shape {samples.shape}")
    channels = s.shape[1]
    raw = s.tobytes()  # interleaved little-endian on every platform numpy supports
    align = channels * 2
    fmt = _FMT_PCM16.pack(1, channels, sample_rate, sample_rate * align, align, 16)
    body = (
        _CHUNK_HDR.pack(b"fmt ", len(fmt))
        + fmt
        + _CHUNK_HDR.pack(b"data", len(raw))
        + raw
    )
    return _RIFF_HDR.pack(b"RIFF", 4 + len(body), b"WAVE") + body


def is_wav(payload: bytes | None) -> bool:
    return (
        bool(payload)
        and len(payload) >= _RIFF_HDR.size
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"WAVE"
    )


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM16 WAV bytes -> ((n_frames, channels) int16 array, sample_rate).

    Walks the RIFF chunk list (skipping unknown chunks like LIST/INFO), so
    files written by other encoders decode too — not just our own."""
    magic, _size, wave_id = _RIFF_HDR.unpack_from(payload, 0)
    if magic != b"RIFF" or wave_id != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = _RIFF_HDR.size, None, None
    while pos + _CHUNK_HDR.size <= len(payload):
        cid, csize = _CHUNK_HDR.unpack_from(payload, pos)
        pos += _CHUNK_HDR.size
        if cid == b"fmt ":
            fmt = _FMT_PCM16.unpack_from(payload, pos)
        elif cid == b"data":
            data = payload[pos : pos + csize]
        pos += csize + (csize & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV payload missing fmt/data chunk")
    tag, channels, rate, _byterate, _align, bits = fmt
    if tag != 1 or bits != 16:
        raise ValueError(f"only PCM 16-bit supported (got tag={tag}, bits={bits})")
    frames = np.frombuffer(data, dtype="<i2")
    n = frames.size // channels
    return frames[: n * channels].reshape(n, channels), rate


def audio_features(samples: np.ndarray, sample_rate: int, bins: int = 16) -> dict:
    """deterministic real features from decoded PCM: duration, global RMS,
    zero-crossing rate, and a ``bins``-bucket L1-normalized magnitude
    spectrum (numpy rfft on the channel-mean signal) — the shape a real
    audio embedding would have, computed from actual sample values."""
    mono = np.asarray(samples, dtype=np.float64).mean(axis=1) if samples.ndim == 2 else np.asarray(samples, dtype=np.float64)
    n = mono.size
    if n == 0:
        return {"duration_ms": 0, "rms": 0.0, "zcr": 0.0, "features": [0.0] * bins}
    rms = float(np.sqrt(np.mean(mono**2)))
    zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if n > 1 else 0.0
    mag = np.abs(np.fft.rfft(mono))
    # collapse the half-spectrum into `bins` equal-width bands
    edges = np.linspace(0, mag.size, bins + 1).astype(int)
    band = np.array([mag[a:b].sum() for a, b in zip(edges[:-1], edges[1:])])
    total = band.sum()
    feats = (band / total).tolist() if total > 0 else [0.0] * bins
    return {
        "duration_ms": int(round(n * 1000.0 / sample_rate)),
        "rms": rms,
        "zcr": zcr,
        "features": [float(f) for f in feats],
    }


# --------------------------------------------------------------------- AVI
# RIFF/'AVI ' with ONE uncompressed 'DIB ' video stream: each '00db' frame
# chunk is bottom-up padded BGR rows — byte-identical pixel layout to BMP —
# so video decode is the same numpy math as images, per frame. This is the
# classic "uncompressed AVI" every tool (ffmpeg -c:v rawvideo, VirtualDub)
# can read and write; no codec library needed on either side.

_AVIH = struct.Struct("<14I")  # MainAVIHeader: 14 uint32 (56 bytes)
_STRH = struct.Struct("<4s4sIHHIIIIIIII4h")  # AVIStreamHeader (56 bytes)


def _list(list_type: bytes, body: bytes) -> bytes:
    return _CHUNK_HDR.pack(b"LIST", 4 + len(body)) + list_type + body


def _chunk(cid: bytes, body: bytes) -> bytes:
    return _CHUNK_HDR.pack(cid, len(body)) + body + (b"\x00" if len(body) & 1 else b"")


def encode_avi(frames: np.ndarray, fps: int = 10) -> bytes:
    """(n_frames, height, width, 3) uint8 RGB array -> uncompressed-DIB AVI.

    Emits hdrl (avih + one vids/'DIB ' strl), movi ('00db' chunks holding
    bottom-up BGR rows, exactly BMP's pixel layout), and an idx1 index so
    standard players can seek."""
    f = np.asarray(frames, dtype=np.uint8)
    if f.ndim != 4 or f.shape[3] != 3:
        raise ValueError(f"expected (n, h, w, 3) RGB array, got shape {frames.shape}")
    n, h, w = f.shape[:3]
    stride = bmp_row_stride(w)
    frame_size = h * stride
    data = np.zeros((n, h, stride), dtype=np.uint8)
    data[:, :, : w * 3] = f[:, ::-1, :, ::-1].reshape(n, h, w * 3)  # bottom-up, BGR

    avih = _chunk(
        b"avih",
        _AVIH.pack(1_000_000 // max(fps, 1), frame_size * fps, 0, 0x10, n, 0, 1,
                   frame_size, w, h, 0, 0, 0, 0),
    )
    strh = _chunk(
        b"strh",
        _STRH.pack(b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, n, frame_size, 0, 0,
                   0, 0, w, h),
    )
    strf = _chunk(
        b"strf", _INFO_HDR.pack(_INFO_HDR.size, w, h, 1, 24, 0, frame_size, 2835, 2835, 0, 0)
    )
    hdrl = _list(b"hdrl", avih + _list(b"strl", strh + strf))

    movi_parts = [b"movi"]  # accumulate + join once: bytes += is O(n^2) in frames
    idx, offset = [], 4  # idx1 offsets are relative to the start of 'movi'
    for i in range(n):
        raw = data[i].tobytes()
        movi_parts.append(_chunk(b"00db", raw))
        idx.append(struct.pack("<4sIII", b"00db", 0x10, offset, len(raw)))
        offset += _CHUNK_HDR.size + len(raw) + (len(raw) & 1)
    movi_body = b"".join(movi_parts)
    movi = _CHUNK_HDR.pack(b"LIST", len(movi_body)) + movi_body
    idx1 = _chunk(b"idx1", b"".join(idx))

    body = hdrl + movi + idx1
    return _CHUNK_HDR.pack(b"RIFF", 4 + len(body)) + b"AVI " + body


def is_avi(payload: bytes | None) -> bool:
    return (
        bool(payload)
        and len(payload) >= 12
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"AVI "
    )


def _walk_riff(payload: bytes, pos: int, end: int):
    """yield (chunk_id, list_type_or_None, body_start, body_size) over a
    RIFF chunk run; callers recurse into LIST bodies themselves."""
    while pos + _CHUNK_HDR.size <= end:
        cid, csize = _CHUNK_HDR.unpack_from(payload, pos)
        pos += _CHUNK_HDR.size
        if cid == b"LIST" and csize >= 4:
            yield cid, payload[pos : pos + 4], pos + 4, csize - 4
        else:
            yield cid, None, pos, csize
        pos += csize + (csize & 1)


def decode_avi(payload: bytes) -> tuple[np.ndarray, int]:
    """uncompressed-DIB AVI bytes -> ((n, h, w, 3) uint8 RGB array, fps).

    Walks the RIFF tree (hdrl for the BITMAPINFOHEADER + frame rate, movi
    for '00db'/'00dw' frame chunks), skipping unknown chunks (JUNK, idx1,
    INFO) so files from other writers decode too."""
    if not is_avi(payload):
        raise ValueError("not a RIFF/'AVI ' payload")
    info, fps, frames = None, 10, []

    def visit(pos: int, end: int) -> None:
        nonlocal info, fps
        for cid, ltype, start, size in _walk_riff(payload, pos, end):
            if ltype is not None:  # a LIST: recurse into hdrl/strl/movi/rec
                visit(start, start + size)
            elif cid == b"avih":
                usec = struct.unpack_from("<I", payload, start)[0]
                if usec:
                    fps = max(1, round(1_000_000 / usec))
            elif cid == b"strf" and info is None:
                info = _INFO_HDR.unpack_from(payload, start)
            elif cid[2:] in (b"db", b"dw"):  # uncompressed DIB frame
                frames.append((start, size))

    visit(12, len(payload))
    if info is None:
        raise ValueError("AVI payload missing strf BITMAPINFOHEADER")
    _hdr, w, h, _planes, bpp, compression, *_rest = info
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit BI_RGB AVI supported (got bpp={bpp}, compression={compression})")
    top_down = h < 0
    h = abs(h)
    stride = bmp_row_stride(w)
    out = np.empty((len(frames), h, w, 3), dtype=np.uint8)
    for i, (start, _size) in enumerate(frames):
        raw = np.frombuffer(payload, dtype=np.uint8, count=h * stride, offset=start)
        rows = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
        out[i] = (rows if top_down else rows[::-1])[:, :, ::-1]  # BGR -> RGB
    return out, fps


# --------------------------------------------------------------------- PNG
# PNG needs no codec library either: the container is chunked (length, type,
# body, CRC32), the pixel stream is zlib (stdlib) over per-scanline filtered
# rows, and the five filter predictors (None/Sub/Up/Average/Paeth, PNG spec
# §9) are byte arithmetic. Scope: 8-bit depth, color types 0 (gray),
# 2 (RGB) and 6 (RGBA), non-interlaced — the layout every screenshot tool
# and most training-corpus PNGs use; palette (3), 16-bit and Adam7 raise.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_IHDR = struct.Struct(">IIBBBBB")  # width, height, depth, color, comp, filter, interlace
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}  # color type -> samples per pixel


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _png_filter_row(ftype: int, row: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """apply filter ``ftype`` to one raw scanline (forward direction, for
    the encoder). int16/int32 math, returned mod 256 as uint8."""
    r = row.astype(np.int32)
    left = np.zeros_like(r)
    left[bpp:] = r[:-bpp]
    up = prev.astype(np.int32)
    upleft = np.zeros_like(up)
    upleft[bpp:] = up[:-bpp]
    if ftype == 0:
        out = r
    elif ftype == 1:
        out = r - left
    elif ftype == 2:
        out = r - up
    elif ftype == 3:
        out = r - (left + up) // 2
    elif ftype == 4:
        out = r - _paeth(left, up, upleft)
    else:
        raise ValueError(f"unknown PNG filter type {ftype}")
    return (out % 256).astype(np.uint8)


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized (PNG spec §9.4)."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def encode_png(pixels: np.ndarray, filter_type: int = 0, level: int = 6) -> bytes:
    """uint8 array -> PNG bytes. Shapes: (h, w) gray, (h, w, 3) RGB,
    (h, w, 4) RGBA. ``filter_type`` picks the per-scanline filter (0-4) —
    real encoders choose per row; a fixed type keeps the output
    deterministic while letting tests exercise every unfilter path."""
    import zlib

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    if px.ndim != 3 or px.shape[2] not in (1, 3, 4):
        raise ValueError(f"expected (h, w[, 1|3|4]) uint8 array, got shape {pixels.shape}")
    h, w, ch = px.shape
    color = {1: 0, 3: 2, 4: 6}[ch]
    raw = px.reshape(h, w * ch)
    prev = np.zeros(w * ch, dtype=np.uint8)
    lines = []
    for y in range(h):
        lines.append(bytes([filter_type]))
        filt = _png_filter_row(filter_type, raw[y], prev, ch)
        lines.append(filt.tobytes())
        prev = raw[y]
    idat = zlib.compress(b"".join(lines), level)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", _IHDR.pack(w, h, 8, color, 0, 0, 0))
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def is_png(payload: bytes | None) -> bool:
    return bool(payload) and payload[: len(_PNG_SIG)] == _PNG_SIG


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, channels) uint8 array (gray decoded as (h, w, 1)).
    Walks the chunk list (IDAT may be split; ancillary chunks skipped),
    inflates with stdlib zlib, and un-filters every scanline per its own
    filter byte — all five PNG filter types. Interlaced, paletted and
    16-bit images raise (out of the pure-stdlib scope)."""
    import zlib

    if not is_png(payload):
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = len(_PNG_SIG), None, []
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            ihdr = _IHDR.unpack(body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + body + CRC
    if ihdr is None or not idat:
        raise ValueError("PNG payload missing IHDR/IDAT")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"only 8-bit PNG supported (got depth={depth})")
    if color not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG color type {color} (palette needs PLTE handling)")
    if interlace:
        raise ValueError("Adam7-interlaced PNG not supported")
    ch = _PNG_CHANNELS[color]
    stride = w * ch
    stream = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if stream.size != h * (stride + 1):
        raise ValueError(
            f"PNG pixel stream is {stream.size} bytes, expected {h * (stride + 1)}"
        )
    scan = stream.reshape(h, stride + 1)
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ftype = int(scan[y, 0])
        row = scan[y, 1:].astype(np.int32)
        if ftype == 0:
            cur = row
        elif ftype == 1:
            # Sub reconstructs to a per-channel prefix sum mod 256 —
            # fully vectorized (cumsum in int64, mod distributes over +)
            cur = (
                np.cumsum(row.reshape(-1, ch), axis=0, dtype=np.int64) % 256
            ).reshape(stride).astype(np.int32)
        elif ftype == 2:
            cur = (row + prev) % 256
        elif ftype in (3, 4):
            # Average/Paeth are a true recurrence on the reconstructed left
            # pixel — no vector form; plain-int byte loop (no per-step
            # numpy allocs), ~linear in bytes, only for rows that use them
            row_l, prev_l = row.tolist(), prev.tolist()
            cur_l = [0] * stride
            if ftype == 3:
                for x in range(stride):
                    left = cur_l[x - ch] if x >= ch else 0
                    cur_l[x] = (row_l[x] + ((left + prev_l[x]) >> 1)) & 255
            else:
                for x in range(stride):
                    a = cur_l[x - ch] if x >= ch else 0
                    b = prev_l[x]
                    c = prev_l[x - ch] if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur_l[x] = (row_l[x] + pred) & 255
            cur = np.array(cur_l, dtype=np.int32)
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur  # the RECONSTRUCTED row is the next row's 'up' reference
    return out.reshape(h, w, ch)


def image_features(pixels: np.ndarray, bins: int = 16) -> list[float]:
    """deterministic real features from decoded pixels: a ``bins``-bucket
    grayscale intensity histogram (L1-normalized) — the same shape a real
    embedding model would emit, computed from actual pixel values."""
    gray = pixels.astype(np.float32).mean(axis=2)
    hist, _ = np.histogram(gray, bins=bins, range=(0.0, 256.0))
    total = max(int(hist.sum()), 1)
    return [float(c) / total for c in hist]
