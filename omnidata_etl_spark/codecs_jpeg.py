"""Baseline-sequential JPEG codec (ITU-T T.81 / ISO 10918-1), pure
numpy + stdlib — closes the last real multimodal capability gap
(VERDICT r9 #7): compressed-photo corpora are dominated by JPEG, and the
engine's decode/resize/feature ops previously raised on it.

Scope — exactly the baseline process every camera/web JPEG uses:
  * decode: SOF0/SOF1 (sequential DCT, Huffman), 8-bit samples, grayscale
    or YCbCr with any h×v sampling factors ≤ 2 (4:4:4 / 4:2:2 / 4:2:0),
    restart markers, 16-bit quant tables, JFIF/EXIF APPn passthrough.
    Progressive (SOF2), arithmetic coding, 12-bit, and hierarchical
    raise NotImplementedError with an actionable message (the codec
    family's honest-scope pattern).
  * encode: baseline 4:4:4 or 4:2:0, Annex-K standard Huffman + quality-
    scaled Annex-K quant tables (the libjpeg quality formula) — used for
    fixtures and as the re-encode side of resize pipelines.

Validation strategy (this container has no libjpeg/PIL to diff against):
the DCT pair is pinned by its mathematical identity (IDCT∘FDCT == id to
float precision), encode→decode round-trips are bounded by per-pixel
tolerance on smooth content and exact on solid colors (DC-only blocks),
and the decoder is additionally pinned against two REAL libjpeg-produced
files embedded in tests (CPython's 16×16 4:2:0 test logo, IPython's 2×2
grayscale) — structure parsed, dimensions exact, decoded planes
regression-pinned (tests/test_codecs_jpeg.py).

Like every codec here: pure bytes→numpy functions, called from
Arrow-batched mapInPandas ops (queries/multimodal.py), never per-row py4j.
"""

from __future__ import annotations

import struct

import numpy as np

# zig-zag scan order: ZIGZAG[k] = row-major index of the k-th coefficient
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K (K.1/K.2) reference quantization tables, zig-zag order
_Q_LUMA = np.array(
    [
        16, 11, 12, 14, 12, 10, 16, 14, 13, 14, 18, 17, 16, 19, 24, 40,
        26, 24, 22, 22, 24, 49, 35, 37, 29, 40, 58, 51, 61, 60, 57, 51,
        56, 55, 64, 72, 92, 78, 64, 68, 87, 69, 55, 56, 80, 109, 81, 87,
        95, 98, 103, 104, 103, 62, 77, 113, 121, 112, 100, 120, 92, 101,
        103, 99,
    ],
    dtype=np.int64,
)
_Q_CHROMA = np.array(
    [
        17, 18, 18, 24, 21, 24, 47, 26, 26, 47, 99, 66, 56, 66, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K (K.3) typical Huffman tables: (BITS counts per length 1..16,
# HUFFVAL symbol list)
_HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8×8 DCT-II basis C: forward F = C·x·Cᵀ, inverse
    x = Cᵀ·F·C (the identity the tests pin)."""
    k = np.arange(8)
    c = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16) * 0.5
    c[0] *= 1 / np.sqrt(2)
    return c


_C = _dct_matrix()


def _canonical_codes(bits: list[int], vals: list[int]):
    """(BITS, HUFFVAL) → {(length, code): symbol} and its inverse —
    canonical Huffman code assignment per T.81 Annex C."""
    decode: dict[tuple[int, int], int] = {}
    encode: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            sym = vals[k]
            decode[(length, code)] = sym
            encode[sym] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return decode, encode


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 sign extension of an s-bit magnitude."""
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 unstuffing;
    stops (zero-pads) at any real marker, which the MCU loop consumes via
    restart()."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bit = 0
        self.eos = False

    def _cur(self) -> int:
        if self.eos or self.pos >= len(self.data):
            return 0
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
            if nxt != 0x00:  # a real marker terminates entropy data
                self.eos = True
                return 0
        return b

    def read_bit(self) -> int:
        b = self._cur()
        bit = (b >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            if not self.eos:
                self.pos += 1 + (self.data[self.pos] == 0xFF)  # skip stuffing
        return bit

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    def restart(self) -> None:
        """Byte-align and consume an RSTn marker (T.81 F.2.1.3.1)."""
        self.bit = 0
        self.eos = False
        # scan to the marker (tolerates pad 0xFF fill bytes)
        while self.pos + 1 < len(self.data):
            if (
                self.data[self.pos] == 0xFF
                and 0xD0 <= self.data[self.pos + 1] <= 0xD7
            ):
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected JPEG restart marker")


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes → (h, w, 3) uint8 RGB (grayscale replicated)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id) -> table
    frame = None
    restart_interval = 0
    i = 2
    n = len(payload)
    while i < n - 1:
        if payload[i] != 0xFF:
            i += 1
            continue
        m = payload[i + 1]
        if m in (0xFF, 0x01) or 0xD0 <= m <= 0xD8:
            i += 2
            continue
        if m == 0xD9:  # EOI before SOS: no image
            break
        ln = struct.unpack(">H", payload[i + 2 : i + 4])[0]
        seg = payload[i + 4 : i + 2 + ln]
        if m == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 15
                p += 1
                if prec:
                    tbl = np.frombuffer(
                        seg[p : p + 128], dtype=">u2"
                    ).astype(np.int64)
                    p += 128
                else:
                    tbl = np.frombuffer(
                        seg[p : p + 64], dtype=np.uint8
                    ).astype(np.int64)
                    p += 64
                qt[tid] = tbl
        elif m == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1 : p + 17])
                cnt = sum(bits)
                vals = list(seg[p + 17 : p + 17 + cnt])
                huff[(tc, th)], _ = _canonical_codes(bits, vals)
                p += 17 + cnt
        elif m in (0xC0, 0xC1):  # SOF0/1: baseline & extended sequential
            prec = seg[0]
            if prec != 8:
                raise NotImplementedError(
                    f"{prec}-bit JPEG not supported (8-bit baseline only)"
                )
            h, w = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif m == 0xC2:
            raise NotImplementedError(
                "progressive JPEG (SOF2) not supported — baseline "
                "sequential only; re-encode with baseline settings"
            )
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF marker 0xFF{m:02X} (lossless/arithmetic/"
                "hierarchical) not supported — baseline sequential only"
            )
        elif m == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif m == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            tables = {}
            for c in range(ns):
                cs, td_ta = seg[1 + 2 * c], seg[2 + 2 * c]
                tables[cs] = (td_ta >> 4, td_ta & 15)
            return _decode_scan(
                payload, i + 2 + ln, frame, qt, huff, tables, restart_interval
            )
        i += 2 + ln
    raise ValueError("JPEG has no SOS scan")


def _decode_scan(data, pos, frame, qt, huff, tables, ri) -> np.ndarray:
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mx = -(-w // mcu_w)
    my = -(-h // mcu_h)
    planes = {}
    for c in comps:
        planes[c["id"]] = np.zeros(
            (my * c["v"] * 8, mx * c["h"] * 8), dtype=np.float64
        )
    br = _BitReader(data, pos)
    dc_pred = {c["id"]: 0 for c in comps}
    zz = ZIGZAG
    for mcu in range(mx * my):
        if ri and mcu and mcu % ri == 0:
            br.restart()
            dc_pred = {c["id"]: 0 for c in comps}
        myi, mxi = divmod(mcu, mx)
        for c in comps:
            dc_tbl = huff[(0, tables[c["id"]][0])]
            ac_tbl = huff[(1, tables[c["id"]][1])]
            q = qt[c["tq"]]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    coef = np.zeros(64, dtype=np.float64)
                    s = br.decode_huff(dc_tbl)
                    dc_pred[c["id"]] += _extend(br.receive(s), s)
                    coef[0] = dc_pred[c["id"]] * q[0]
                    k = 1
                    while k < 64:
                        rs = br.decode_huff(ac_tbl)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("JPEG AC run past block end")
                        coef[k] = _extend(br.receive(s), s) * q[k]
                        k += 1
                    blk = np.zeros(64, dtype=np.float64)
                    blk[zz] = coef
                    spatial = _C.T @ blk.reshape(8, 8) @ _C + 128.0
                    y0 = (myi * c["v"] + by) * 8
                    x0 = (mxi * c["h"] + bx) * 8
                    planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = spatial
    out = []
    for c in comps:
        p = planes[c["id"]]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        g = np.clip(np.round(out[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ------------------------------------------------------------------ encoder


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        pad = (8 - self.nbits % 8) % 8
        if pad:
            self.write((1 << pad) - 1, pad)  # pad to byte boundary with 1s


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg quality scaling of the Annex-K tables (zig-zag order)."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (_Q_LUMA, _Q_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int64))
    return out[0], out[1]


def _encode_block(blk, qtbl, dc_enc, ac_enc, bw, dc_pred) -> int:
    """FDCT + quantize + Huffman-encode one 8×8 block; returns the updated
    DC predictor. ``abs(v).bit_length()`` IS the T.81 magnitude category:
    category s holds magnitudes [2^(s-1), 2^s)."""
    zz = ZIGZAG
    coef = (_C @ (blk - 128.0) @ _C.T).reshape(64)[zz]
    qc = np.round(coef / qtbl).astype(np.int64)
    diff = int(qc[0]) - dc_pred
    dc_pred = int(qc[0])
    s = abs(diff).bit_length()
    code, ln = dc_enc[s]
    bw.write(code, ln)
    if s:
        bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = int(np.nonzero(qc[1:])[0][-1]) + 1 if np.any(qc[1:]) else 0
    for k in range(1, last_nz + 1):
        v = int(qc[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_enc[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = abs(v).bit_length()
        code, ln = ac_enc[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_enc[0x00]  # EOB
        bw.write(code, ln)
    return dc_pred


def _pad_to(arr: np.ndarray, mh: int, mw: int) -> np.ndarray:
    """Edge-replicate pad a plane up to multiples of (mh, mw)."""
    h, w = arr.shape
    return np.pad(
        arr, ((0, (-h) % mh), (0, (-w) % mw)), mode="edge"
    )


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 90,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """(h, w, 3) uint8 RGB (or (h, w) grayscale) → baseline JPEG bytes.
    ``restart_interval``: emit DRI + an RSTn marker every N MCUs (DC
    predictors reset) — what multi-strip camera encoders produce, and the
    fixture knob that pins the decoder's restart path in tests."""
    arr = np.asarray(arr)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    ql, qc = _quality_tables(quality)
    _, dcl_enc = _canonical_codes(*_HUFF_DC_LUMA)
    _, acl_enc = _canonical_codes(*_HUFF_AC_LUMA)
    _, dcc_enc = _canonical_codes(*_HUFF_DC_CHROMA)
    _, acc_enc = _canonical_codes(*_HUFF_AC_CHROMA)

    if gray:
        planes = [arr.astype(np.float64)]
        samp = [(1, 1)]
    else:
        x = arr.astype(np.float64)
        y = 0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]
        cb = -0.168736 * x[..., 0] - 0.331264 * x[..., 1] + 0.5 * x[..., 2] + 128.0
        cr = 0.5 * x[..., 0] - 0.418688 * x[..., 1] - 0.081312 * x[..., 2] + 128.0
        if subsampling == "4:2:0":
            cbp = _pad_to(cb, 2, 2)
            crp = _pad_to(cr, 2, 2)
            cb = (
                cbp[0::2, 0::2] + cbp[0::2, 1::2] + cbp[1::2, 0::2] + cbp[1::2, 1::2]
            ) / 4.0
            cr = (
                crp[0::2, 0::2] + crp[0::2, 1::2] + crp[1::2, 0::2] + crp[1::2, 1::2]
            ) / 4.0
            samp = [(2, 2), (1, 1), (1, 1)]
        elif subsampling == "4:4:4":
            samp = [(1, 1), (1, 1), (1, 1)]
        else:
            raise ValueError(f"unsupported subsampling {subsampling!r}")
        planes = [y, cb, cr]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    nc = 1 if gray else 3

    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0"
        + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HH", 1, 1)
        + b"\x00\x00"
    )
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(
        ql.astype(np.uint8)
    )
    if not gray:
        out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x01" + bytes(
            qc.astype(np.uint8)
        )
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for ci in range(nc):
        out += bytes(
            [ci + 1, (samp[ci][0] << 4) | samp[ci][1], 0 if ci == 0 else 1]
        )
    dht = [(0x00, _HUFF_DC_LUMA), (0x10, _HUFF_AC_LUMA)]
    if not gray:
        dht += [(0x01, _HUFF_DC_CHROMA), (0x11, _HUFF_AC_CHROMA)]
    for tc_th, (bits, vals) in dht:
        out += (
            b"\xff\xc4"
            + struct.pack(">H", 2 + 1 + 16 + len(vals))
            + bytes([tc_th])
            + bytes(bits)
            + bytes(vals)
        )
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for ci in range(nc):
        out += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    out += b"\x00\x3f\x00"  # Ss/Se/Ah-Al (baseline fixed)

    # interleaved MCU order, matching the decoder: each component plane is
    # edge-padded to cover mx·8·sh × my·8·sv samples
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mx = -(-w // mcu_w)
    my = -(-h // mcu_h)
    full = []
    for p, (sh, sv) in zip(planes, samp):
        tgt_h, tgt_w = my * 8 * sv, mx * 8 * sh
        ph, pw = p.shape
        full.append(np.pad(p, ((0, tgt_h - ph), (0, tgt_w - pw)), mode="edge"))
    bw = _BitWriter()
    dc_pred = [0] * nc
    for mcu in range(mx * my):
        if restart_interval and mcu and mcu % restart_interval == 0:
            bw.flush()
            out_rst = 0xD0 + (mcu // restart_interval - 1) % 8
            bw.out += bytes([0xFF, out_rst])
            dc_pred = [0] * nc
        myi, mxi = divmod(mcu, mx)
        for ci in range(nc):
            sh, sv = samp[ci]
            q = ql if ci == 0 else qc
            de = dcl_enc if ci == 0 else dcc_enc
            ae = acl_enc if ci == 0 else acc_enc
            for by in range(sv):
                for bx in range(sh):
                    y0 = (myi * sv + by) * 8
                    x0 = (mxi * sh + bx) * 8
                    dc_pred[ci] = _encode_block(
                        full[ci][y0 : y0 + 8, x0 : x0 + 8],
                        q, de, ae, bw, dc_pred[ci],
                    )
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
