"""Zero-dependency media codecs for the multimodal column model.

The container has no image/audio libraries (no PIL/opencv/soundfile), but
real codecs don't all need one: PPM (P6) and 24-bit BMP are header + raw
pixel bytes, WAV/PCM16 is readable with the stdlib `wave` module, and PNG
is zlib (stdlib) + a numpy scanline unfilter — all byte-exact,
decode(encode(x)) == x — so the engine's decode / resize / waveform-stats
operators run for real on assets stored in any of these formats. The
codecs that genuinely need an external library (JPEG/GIF/WebP/MP3) raise
NotImplementedError from the same dispatch point, keyed on magic bytes, so
swapping in pillow later touches only `decode_image`.

Everything here is a pure bytes→numpy (or back) function: the Spark side
calls them inside Arrow-batched `mapInPandas` ops (queries/multimodal.py),
never per-row through py4j.
"""

from __future__ import annotations

import io
import wave

import numpy as np

# --- image: PPM (P6) ---------------------------------------------------------


def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6, maxval 255)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) array, got {a.shape}")
    h, w = a.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def _decode_ppm(payload: bytes) -> np.ndarray:
    # Header is ASCII tokens (magic, width, height, maxval) separated by
    # whitespace, with '#'-comment lines allowed; pixel data starts after
    # the single whitespace byte that terminates maxval.
    pos = 0
    tokens = []
    while len(tokens) < 4:
        if pos >= len(payload):
            raise ValueError("truncated PPM header")
        c = payload[pos : pos + 1]
        if c == b"#":
            nl = payload.find(b"\n", pos)
            pos = len(payload) if nl < 0 else nl + 1
        elif c.isspace():
            pos += 1
        else:
            end = pos
            while end < len(payload) and not payload[end : end + 1].isspace():
                end += 1
            tokens.append(payload[pos:end])
            pos = end
    pos += 1  # the single whitespace after maxval
    if tokens[0] != b"P6":
        raise ValueError(f"not a P6 PPM: magic={tokens[0]!r}")
    w, h, maxval = int(tokens[1]), int(tokens[2]), int(tokens[3])
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    n = w * h * 3
    data = payload[pos : pos + n]
    if len(data) != n:
        raise ValueError(f"PPM pixel data truncated: {len(data)} != {n}")
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)


# --- image: BMP (24-bit uncompressed BI_RGB) ---------------------------------


def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit bottom-up BI_RGB BMP."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) array, got {a.shape}")
    h, w = a.shape[:2]
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    bgr = a[::-1, :, ::-1]  # bottom-up rows, BGR channel order
    rows = bgr.reshape(h, row_bytes)
    padded = np.zeros((h, row_bytes + pad), dtype=np.uint8)
    padded[:, :row_bytes] = rows
    pixels = padded.tobytes()
    data_offset = 14 + 40
    file_size = data_offset + len(pixels)
    header = (
        b"BM"
        + file_size.to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + data_offset.to_bytes(4, "little")
        + (40).to_bytes(4, "little")  # BITMAPINFOHEADER
        + w.to_bytes(4, "little")
        + h.to_bytes(4, "little")  # positive => bottom-up
        + (1).to_bytes(2, "little")  # planes
        + (24).to_bytes(2, "little")  # bpp
        + (0).to_bytes(4, "little")  # BI_RGB (uncompressed)
        + len(pixels).to_bytes(4, "little")
        + b"\x00" * 16  # ppm resolutions + palette fields
    )
    return header + pixels


def _decode_bmp(payload: bytes) -> np.ndarray:
    if len(payload) < 54:
        raise ValueError("truncated BMP header")
    data_offset = int.from_bytes(payload[10:14], "little")
    header_size = int.from_bytes(payload[14:18], "little")
    if header_size < 40:
        raise ValueError(f"unsupported BMP header size {header_size}")
    w = int.from_bytes(payload[18:22], "little")
    h_raw = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only 24-bit uncompressed BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    h = abs(h_raw)
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    need = data_offset + stride * h
    if len(payload) < need:
        raise ValueError(f"BMP pixel data truncated: {len(payload)} < {need}")
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=data_offset
    ).reshape(h, stride)[:, :row_bytes]
    img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    if h_raw > 0:
        img = img[::-1]  # bottom-up → top-down
    return np.ascontiguousarray(img)


# --- image: PNG (stdlib zlib + numpy unfilter) -------------------------------

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# channels per PNG color type (3 = palette: 1 index byte/px, expanded later)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def encode_png(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → PNG (color type 2, 8-bit, filter 0, one IDAT).

    Stdlib-only writer: zlib stream over filter-type-0 scanlines. Not a
    size-optimized encoder (no filter search) — its job is byte-exact
    round-trip fixtures for the decode path."""
    import struct
    import zlib

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) array, got {a.shape}")
    h, w = a.shape[:2]

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), a.reshape(h, w * 3)], axis=1
    ).tobytes()  # one filter-type byte (0) prefixes each scanline
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filters (spec §6). Rows carry an Up/Paeth
    dependency on the previous RECONSTRUCTED row and Sub/Average/Paeth a
    within-row dependency on the reconstructed left neighbor, so recon is
    row-sequential; each row is numpy work except the Sub/Average/Paeth
    left-scan, which walks the stride once in Python — fine for the asset
    sizes a decode UDF sees per batch (compute is per-byte either way)."""
    rows = raw.reshape(h, 1 + stride)
    ftypes, data = rows[:, 0], rows[:, 1:]
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f = int(ftypes[y])
        cur = data[y].astype(np.int32)
        if f == 0:
            rec = cur
        elif f == 2:  # Up
            rec = (cur + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth: left-dependent
            rec = cur.copy()
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                if f == 1:
                    rec[x] = (rec[x] + left) & 0xFF
                elif f == 3:
                    rec[x] = (rec[x] + ((left + prev[x]) >> 1)) & 0xFF
                else:
                    up = prev[x]
                    ul = prev[x - bpp] if x >= bpp else 0
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    if pa <= pb and pa <= pc:
                        pred = left
                    elif pb <= pc:
                        pred = up
                    else:
                        pred = ul
                    rec[x] = (rec[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {f} on row {y}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out


def _decode_png(payload: bytes) -> np.ndarray:
    """PNG → (h, w, 3) uint8 RGB. 8-bit depth, color types 0/2/3/4/6,
    non-interlaced (alpha is dropped, gray/palette expand to RGB). The
    rare-in-storage variants (16-bit, Adam7) still raise — explicitly."""
    import struct
    import zlib

    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat, plte = 8, None, [], None
    while pos + 8 <= len(payload):
        (length,), tag = struct.unpack(">I", payload[pos : pos + 4]), payload[
            pos + 4 : pos + 8
        ]
        body = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + body + crc
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8:
        raise NotImplementedError(f"only 8-bit PNG supported (depth={depth})")
    if interlace:
        raise NotImplementedError("Adam7-interlaced PNG not supported")
    if comp or filt or ctype not in _PNG_CHANNELS:
        raise ValueError(f"bad PNG header (comp={comp}, filt={filt}, "
                         f"ctype={ctype})")
    ch = _PNG_CHANNELS[ctype]
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if len(raw) != h * (1 + w * ch):
        raise ValueError(f"PNG scanline data truncated: {len(raw)}")
    px = _png_unfilter(raw, h, w * ch, ch).reshape(h, w, ch)
    if ctype == 2:
        return np.ascontiguousarray(px)
    if ctype == 6:
        return np.ascontiguousarray(px[:, :, :3])
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE chunk")
        return np.ascontiguousarray(plte[px[:, :, 0]])
    return np.ascontiguousarray(np.repeat(px[:, :, :1], 3, axis=2))  # 0/4


# --- image dispatch ----------------------------------------------------------

_COMPRESSED_MAGICS = {
    b"\xff\xd8\xff": "jpeg",
    b"GIF8": "gif",
    b"RIFF": "webp/riff",
}


def decode_image(payload: bytes) -> np.ndarray:
    """bytes → (h, w, 3) uint8 RGB. Real for PPM/BMP; compressed formats
    need a codec library this container doesn't have."""
    if payload is None or len(payload) < 2:
        raise ValueError("empty image payload")
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[: len(_PNG_MAGIC)] == _PNG_MAGIC:
        return _decode_png(payload)
    for magic, name in _COMPRESSED_MAGICS.items():
        if payload[: len(magic)] == magic:
            raise NotImplementedError(
                f"{name} decode needs pillow/opencv (not in this container); "
                "PPM and 24-bit BMP decode natively"
            )
    raise ValueError(f"unrecognized image magic {payload[:4]!r}")


def resize_image(
    payload: bytes, width: int, height: int, method: str = "bilinear"
) -> bytes:
    """Decode → numpy resample → re-encode as PPM.

    `nearest` is pure index mapping; `bilinear` is the standard 2×2
    neighborhood blend with edge clamping (pixel-center convention).
    """
    img = decode_image(payload).astype(np.float64)
    h, w = img.shape[:2]
    if method == "nearest":
        yi = np.minimum((np.arange(height) + 0.5) * h / height, h - 1).astype(int)
        xi = np.minimum((np.arange(width) + 0.5) * w / width, w - 1).astype(int)
        out = img[yi][:, xi]
    elif method == "bilinear":
        y = np.clip((np.arange(height) + 0.5) * h / height - 0.5, 0, h - 1)
        x = np.clip((np.arange(width) + 0.5) * w / width - 0.5, 0, w - 1)
        y0 = np.floor(y).astype(int)
        x0 = np.floor(x).astype(int)
        y1 = np.minimum(y0 + 1, h - 1)
        x1 = np.minimum(x0 + 1, w - 1)
        fy = (y - y0)[:, None, None]
        fx = (x - x0)[None, :, None]
        out = (
            img[y0][:, x0] * (1 - fy) * (1 - fx)
            + img[y0][:, x1] * (1 - fy) * fx
            + img[y1][:, x0] * fy * (1 - fx)
            + img[y1][:, x1] * fy * fx
        )
    else:
        raise ValueError(f"unknown resize method {method!r}")
    return encode_ppm(np.clip(np.round(out), 0, 255).astype(np.uint8))


# --- audio: WAV / PCM16 ------------------------------------------------------


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """1-D int16 array → mono PCM16 WAV bytes (stdlib `wave`)."""
    s = np.asarray(samples, dtype=np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(s.tobytes())
    return buf.getvalue()


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (int16 samples [n] or [n, channels], sample_rate)."""
    if payload is None or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    with wave.open(io.BytesIO(payload), "rb") as f:
        if f.getsampwidth() != 2:
            raise NotImplementedError(
                f"only PCM16 supported, got sampwidth={f.getsampwidth()}"
            )
        n, ch = f.getnframes(), f.getnchannels()
        samples = np.frombuffer(f.readframes(n), dtype=np.int16)
        if ch > 1:
            samples = samples.reshape(-1, ch)
        return samples, f.getframerate()


def waveform_stats(payload: bytes) -> dict:
    """Decoded-audio features: duration, RMS, peak, zero-crossing rate."""
    samples, rate = decode_audio(payload)
    mono = samples.astype(np.float64)
    if mono.ndim > 1:
        mono = mono.mean(axis=1)
    n = len(mono)
    zc = int(np.count_nonzero(np.diff(np.signbit(mono)))) if n > 1 else 0
    return {
        "n_samples": n,
        "sample_rate": rate,
        "duration_ms": int(round(1000.0 * n / rate)) if rate else 0,
        "rms": float(np.sqrt(np.mean(mono**2))) if n else 0.0,
        "peak": float(np.max(np.abs(mono))) if n else 0.0,
        "zero_crossings": zc,
    }
