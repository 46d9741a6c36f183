"""Baseline JPEG codec tests (codecs_jpeg.py, VERDICT r9 #7).

Validation strategy per the module docstring: mathematical identities
(IDCT∘FDCT), bounded encode→decode round-trips (exact on solid colors),
and — the independent leg — two REAL libjpeg-produced files embedded
below: CPython's 16×16 4:2:0 Python-logo test image (PSF-licensed test
data) and IPython's 2×2 grayscale test image (BSD). A from-scratch
decoder agreeing with libjpeg output on signature colors is evidence no
self-consistent encoder/decoder bug pair can fake.
"""

from __future__ import annotations

import base64

import numpy as np
import pytest

from omnidata_etl_spark.codecs import decode_image, resize_image
from omnidata_etl_spark.codecs_jpeg import (
    _C,
    decode_jpeg,
    encode_jpeg,
)

# CPython Lib/test/imghdrdata/python.jpg — 16×16 baseline YCbCr 4:2:0
PYTHON_LOGO = base64.b64decode(
    "/9j/4AAQSkZJRgABAQEAAQABAAD/2wBDAAMCAgICAgMCAgIDAwMDBAYEBAQEBAgGBgUGCQgK"
    "CgkICQkKDA8MCgsOCwkJDRENDg8QEBEQCgwSExIQEw8QEBD/2wBDAQMDAwQDBAgEBAgQCwkL"
    "EBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBD/wAAR"
    "CAAQABADASIAAhEBAxEB/8QAFgABAQEAAAAAAAAAAAAAAAAABwQF/8QAJBAAAQQBBAICAwAA"
    "AAAAAAAAAQIDBAYFBwgSExEiABQJMTL/xAAVAQEBAAAAAAAAAAAAAAAAAAAABv/EACMRAAEC"
    "BQMFAAAAAAAAAAAAAAECEQMEBQYhABIxFRZhgeH/2gAMAwEAAhEDEQA/ABSm0mobc8HmExLU"
    "lRzzEWPkJWW+ulrsaUVAseUgslSlH9LKuPryIKuWPZdskzXmm3fX5m2nF4GlVxx/HOpx4ks5"
    "1+MiU/Iaad7UcUo4tILoS4kqcWkezS0hO/HvuRp0rO6hWnWO1UisZVuFi4GFeyEpmGepa5S5"
    "SWVPuciFKRFLgSrwetnyPIB+Vb4N9mKhQMzo5po9XLdDs9d6ZVix2VEhiL9kuNPxw2gEKcDQ"
    "/rs8AuA8VAe0vdl7VOYn+27flGAUgmITjbhSmCg3BYlyeWDkMolvw4KOp1KM6iCNvngZHwet"
    "f//Z"
)
# IPython/core/tests/2x2.jpg — 2×2 baseline grayscale
GRAY_2X2 = base64.b64decode(
    "/9j/4AAQSkZJRgABAQAAAQABAAD/2wBDAAgGBgcGBQgHBwcJCQgKDBQNDAsLDBkSEw8UHRof"
    "Hh0aHBwgJC4nICIsIxwcKDcpLDAxNDQ0Hyc5PTgyPC4zNDL/wAALCAACAAIBAREA/8QAHwAA"
    "AQUBAQEBAQEAAAAAAAAAAAECAwQFBgcICQoL/8QAtRAAAgEDAwIEAwUFBAQAAAF9AQIDAAQR"
    "BRIhMUEGE1FhByJxFDKBkaEII0KxwRVS0fAkM2JyggkKFhcYGRolJicoKSo0NTY3ODk6Q0RF"
    "RkdISUpTVFVWV1hZWmNkZWZnaGlqc3R1dnd4eXqDhIWGh4iJipKTlJWWl5iZmqKjpKWmp6ip"
    "qrKztLW2t7i5usLDxMXGx8jJytLT1NXW19jZ2uHi4+Tl5ufo6erx8vP09fb3+Pn6/9oACAEB"
    "AAA/ACv/2Q=="
)


def _gradient(h=33, w=47):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(yy * 3 % 256), (xx * 2 % 256), ((yy + xx) % 256)], axis=-1
    ).astype(np.uint8)


def test_dct_inverse_identity():
    rng = np.random.default_rng(0)
    x = rng.uniform(-128, 127, (8, 8))
    assert np.abs(_C.T @ (_C @ x @ _C.T) @ _C - x).max() < 1e-10
    # orthonormality: C·Cᵀ == I
    assert np.abs(_C @ _C.T - np.eye(8)).max() < 1e-12


def test_solid_color_exact():
    img = np.full((16, 24, 3), [120, 64, 200], dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=90))
    assert out.shape == img.shape
    assert np.array_equal(out, img)


@pytest.mark.parametrize("sub", ["4:4:4", "4:2:0"])
def test_gradient_roundtrip_bounded(sub):
    img = _gradient()
    out = decode_jpeg(encode_jpeg(img, quality=95, subsampling=sub))
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int)).max()
    assert err <= (1 if sub == "4:4:4" else 4), err


def test_noise_roundtrip_q100_tight():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(12, 16, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=100))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 4


def test_grayscale_roundtrip():
    g = (np.mgrid[0:20, 0:28][0] * 5 % 256).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=95))
    assert out.shape == (20, 28, 3)
    assert np.array_equal(out[:, :, 0], out[:, :, 1])
    assert np.abs(out[:, :, 0].astype(int) - g.astype(int)).max() <= 1


@pytest.mark.parametrize("ri", [1, 3])
def test_restart_markers_bit_identical_decode(ri):
    img = _gradient(40, 56)
    base = decode_jpeg(encode_jpeg(img, quality=95, subsampling="4:2:0"))
    rst = decode_jpeg(
        encode_jpeg(img, quality=95, subsampling="4:2:0", restart_interval=ri)
    )
    assert np.array_equal(base, rst)


def test_real_libjpeg_python_logo():
    """Decode a REAL libjpeg-produced 4:2:0 file and find the Python
    logo's signature colors — the independent-implementation check."""
    img = decode_jpeg(PYTHON_LOGO)
    assert img.shape == (16, 16, 3)
    flat = img.reshape(-1, 3).astype(int)
    yellows = flat[
        (flat[:, 0] > 150) & (flat[:, 1] > 120) & (flat[:, 2] < 120)
    ]
    blues = flat[(flat[:, 2] > 130) & (flat[:, 2] > flat[:, 0] + 30)]
    assert len(yellows) > 30 and len(blues) > 30
    # regression pin: the exact signature shades this decoder produces
    assert [255, 224, 74] in yellows.tolist()


def test_real_libjpeg_grayscale():
    img = decode_jpeg(GRAY_2X2)
    assert img.shape == (2, 2, 3)
    assert np.array_equal(img[:, :, 0], img[:, :, 1])
    # pinned: a uniform mid-gray 2×2 (single DC-only block)
    assert np.array_equal(img, np.full((2, 2, 3), 128, dtype=np.uint8))


def test_decode_image_dispatch_and_resize():
    img = _gradient(12, 16)
    payload = encode_jpeg(img, quality=100)
    out = decode_image(payload)
    assert out.shape == (12, 16, 3)
    resized = resize_image(payload, 8, 6)
    assert decode_image(resized).shape == (6, 8, 3)


def test_sof2_on_sequential_scan_rejected():
    """Progressive decodes for real since r10; flipping a BASELINE file's
    SOF0 to SOF2 leaves a sequential SOS (Ss=0, Se=63) that is illegal in
    a progressive frame — the decoder rejects it as corrupt instead of
    misreading the scan."""
    data = bytearray(PYTHON_LOGO)
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2
    with pytest.raises(ValueError, match="DC and AC"):
        decode_jpeg(bytes(data))


def test_truncated_and_garbage():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")
    with pytest.raises(ValueError, match="no SOS"):
        decode_jpeg(b"\xff\xd8\xff\xd9")


def test_sixteen_bit_quant_tables_parse():
    """Force a 16-bit DQT (precision 1) through the decoder: re-emit the
    gradient JPEG's quant table widened to 16 bits."""
    import struct

    img = _gradient(8, 8)
    data = bytearray(encode_jpeg(img, quality=100, subsampling="4:4:4"))
    i = data.find(b"\xff\xdb")
    ln = struct.unpack(">H", data[i + 2 : i + 4])[0]
    assert ln == 67
    tbl8 = bytes(data[i + 5 : i + 69])
    wide = b"".join(struct.pack(">H", b) for b in tbl8)
    seg16 = b"\xff\xdb" + struct.pack(">H", 2 + 1 + 128) + b"\x10" + wide
    patched = bytes(data[:i]) + seg16 + bytes(data[i + 2 + ln :])
    assert np.array_equal(decode_jpeg(patched), decode_jpeg(bytes(data)))


def test_jpeg_roundtrip_property():
    """Hypothesis: arbitrary small images round-trip through q100 baseline
    JPEG within the measured tolerance, at every dims/subsampling combo —
    odd sizes exercise the MCU edge-padding and crop paths."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        h=st.integers(1, 20),
        w=st.integers(1, 26),
        sub=st.sampled_from(["4:4:4", "4:2:0"]),
        seed=st.integers(0, 2**32 - 1),
    )
    def check(h, w, sub, seed):
        rng = np.random.default_rng(seed)
        if sub == "4:2:0":
            # constant 2×2 pixel blocks make chroma subsampling lossless
            # (averaging equal values), so the tight RGB bound still
            # applies; arbitrary noise through 4:2:0 genuinely loses
            # chroma (and clipping breaks luma linearity) — that path is
            # bounded by the smooth-gradient test instead
            base = rng.integers(
                0, 256, size=((h + 1) // 2, (w + 1) // 2, 3), dtype=np.uint8
            )
            img = np.repeat(np.repeat(base, 2, axis=0), 2, axis=1)[:h, :w]
        else:
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=100, subsampling=sub))
        assert out.shape == img.shape
        err = np.abs(out.astype(int) - img.astype(int)).max()
        assert err <= 4, (h, w, sub, err)

    check()


# ---------------------------------------------------- progressive (r10)


def test_progressive_equals_baseline_exactly():
    """The cross-pipeline identity: progressive and baseline encodes of
    the same pixels carry IDENTICAL quantized coefficients (shared FDCT +
    tables), so the two decodes must match byte-for-byte. The baseline
    pipeline is itself pinned against real libjpeg files, so a
    compensating progressive encoder/decoder bug pair cannot pass."""
    import numpy as np

    from omnidata_etl_spark.codecs_jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(7)
    for h, w, q in ((8, 8, 90), (16, 24, 75), (13, 17, 90), (5, 3, 100),
                    (40, 33, 50)):
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        base = decode_jpeg(encode_jpeg(img, quality=q, subsampling="4:4:4"))
        prog = decode_jpeg(encode_jpeg_progressive(img, quality=q))
        assert np.array_equal(base, prog), (h, w, q)


def test_progressive_grayscale_and_solid():
    import numpy as np

    from omnidata_etl_spark.codecs_jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    g = np.random.default_rng(3).integers(0, 256, size=(11, 9), dtype=np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg_progressive(g, quality=85)),
        decode_jpeg(encode_jpeg(g, quality=85)),
    )
    solid = np.full((16, 16, 3), 200, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg_progressive(solid, quality=95))
    assert np.array_equal(out, solid)  # DC-only blocks decode exactly


def test_progressive_scan_structure_is_really_progressive():
    """The emitted stream must be SOF2 with multiple SOS scans covering
    DC first, AC first (two bands), DC refine, AC refine — i.e., the
    equality test above exercised every scan kind, not a degenerate
    single-scan file."""
    import struct

    import numpy as np

    from omnidata_etl_spark.codecs_jpeg import encode_jpeg_progressive

    data = encode_jpeg_progressive(
        np.random.default_rng(1).integers(0, 256, (16, 16, 3), dtype=np.uint8)
    )
    assert b"\xff\xc2" in data and b"\xff\xc0" not in data
    scans = []
    i = 2
    while i < len(data) - 2:
        if data[i] != 0xFF or data[i + 1] in (0x00,) or 0xD0 <= data[i + 1] <= 0xD7:
            i += 1
            continue
        m = data[i + 1]
        if m == 0xD9:
            break
        ln = struct.unpack(">H", data[i + 2 : i + 4])[0]
        if m == 0xDA:
            seg = data[i + 4 : i + 2 + ln]
            ns = seg[0]
            scans.append(
                (seg[1 + 2 * ns], seg[2 + 2 * ns],
                 seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 15)
            )
            # skip entropy to next marker
            i += 2 + ln
            while i < len(data) - 1 and not (
                data[i] == 0xFF and data[i + 1] != 0x00
                and not (0xD0 <= data[i + 1] <= 0xD7)
            ):
                i += 1
            continue
        i += 2 + ln
    assert (0, 0, 0, 1) in scans  # DC first Al=1
    assert (1, 5, 0, 1) in scans and (6, 63, 0, 1) in scans  # AC bands
    assert (0, 0, 1, 0) in scans  # DC refine
    assert (1, 63, 1, 0) in scans  # AC refine
    assert len(scans) == 11  # 1 + 3*2 + 1 + 3


def test_progressive_real_libjpeg_fixtures():
    """Two REAL libjpeg-produced progressive files shipped in this
    container (/usr/share/doc/nodejs): 493-wide banner images, mostly
    white body below a dark logo row. The thin one is plain spectral
    selection; the full one adds AC successive approximation (Al=1
    first pass + Ah=1 refinement) — and both decode the SAME logo
    pixel in the shared banner region, a cross-stream consistency no
    broken refinement path could produce."""
    import os

    import numpy as np
    import pytest as _pytest

    from omnidata_etl_spark.codecs_jpeg import decode_jpeg

    thin = "/usr/share/doc/nodejs/thin-white-stripe.jpg"
    full = "/usr/share/doc/nodejs/full-white-stripe.jpg"
    if not (os.path.exists(thin) and os.path.exists(full)):
        _pytest.skip("nodejs doc fixtures not present on this host")
    a = decode_jpeg(open(thin, "rb").read())
    b = decode_jpeg(open(full, "rb").read())
    assert a.shape == (58, 493, 3)
    assert b.shape == (312, 493, 3)
    # bodies are white stripes
    assert a[10:].mean() > 240
    assert b[40:].mean() > 248
    # the shared banner, decoded from two different scan scripts (one
    # with AC refinement, one without): regression-pinned per file, and
    # within lossy tolerance of each other (separate encodes of the same
    # art — exact cross-file equality is not expected)
    assert a[0, 0].tolist() == [68, 136, 62]
    assert b[0, 0].tolist() == [67, 136, 62]
    assert a[-1, -1].tolist() == [255, 255, 255]
    assert abs(int(a[0, 0][0]) - int(b[0, 0][0])) <= 2


# ---- fuzz: the actionable-error contract on corrupt streams (r10 #8) ----

_OK_ERRORS = (ValueError, NotImplementedError)


def _fuzz_decode(payload: bytes):
    try:
        img = decode_jpeg(payload)
    except _OK_ERRORS:
        return "raised"
    assert img.ndim == 3 and img.shape[2] == 3 and img.dtype == np.uint8
    return "decoded"


def test_fuzz_truncated_jpeg_is_actionable():
    for fixture in (PYTHON_LOGO, GRAY_2X2):
        outcomes = set()
        for cut in range(2, len(fixture), 13):
            outcomes.add(_fuzz_decode(fixture[:cut]))
        assert "raised" in outcomes


def test_fuzz_bitflipped_jpeg_is_actionable():
    import random

    rng = random.Random(0x17E6)
    data = bytearray(PYTHON_LOGO)
    for trial in range(400):
        i = rng.randrange(2, len(data))  # keep SOI so the parser engages
        bit = 1 << rng.randrange(8)
        data[i] ^= bit
        _fuzz_decode(bytes(data))
        data[i] ^= bit


def test_fuzz_bitflipped_progressive_is_actionable():
    import random

    from omnidata_etl_spark.codecs_jpeg import encode_jpeg_progressive

    img = (np.indices((24, 24)).sum(axis=0) % 256).astype(np.uint8)
    rgb = np.stack([img, img.T, 255 - img], axis=2)
    payload = bytearray(encode_jpeg_progressive(rgb))
    rng = random.Random(0xBADC0DE)
    for trial in range(300):
        i = rng.randrange(2, len(payload))
        bit = 1 << rng.randrange(8)
        payload[i] ^= bit
        _fuzz_decode(bytes(payload))
        payload[i] ^= bit


def test_fuzz_random_bytes_rejected():
    import random

    rng = random.Random(7)
    for n in (0, 1, 2, 64, 1024):
        blob = bytes(rng.randrange(256) for _ in range(n))
        try:
            decode_jpeg(blob)
            # a random blob that still decoded must have been a real JPEG
            raise AssertionError("random bytes decoded")
        except _OK_ERRORS:
            pass
        # with a forced SOI prefix the decoder must still stay actionable
        _fuzz_decode(b"\xff\xd8" + blob)
