"""Zero-dependency media codecs (omnidata_etl_spark/codecs.py): byte-exact
round trips, resize semantics, WAV decode, and the compressed-format
dispatch that still raises until a codec library exists in the container."""

from __future__ import annotations

import numpy as np
import pytest

from omnidata_etl_spark.codecs import (
    decode_audio,
    decode_image,
    encode_bmp,
    encode_ppm,
    encode_wav,
    resize_image,
    waveform_stats,
)


def _img(h=12, w=16, seed=7):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_ppm_roundtrip_byte_exact():
    a = _img()
    assert np.array_equal(decode_image(encode_ppm(a)), a)


def test_ppm_header_comments_and_whitespace():
    a = _img(2, 3)
    raw = encode_ppm(a)
    # rewrite header with a comment line and extra whitespace
    body = raw.split(b"255\n", 1)[1]
    fancy = b"P6\n# a comment\n 3  2\n255\n" + body
    assert np.array_equal(decode_image(fancy), a)


def test_bmp_roundtrip_byte_exact():
    for w in (3, 4, 5):  # hits every 4-byte row-padding case
        a = _img(5, w, seed=w)
        assert np.array_equal(decode_image(encode_bmp(a)), a)


def test_compressed_formats_raise_not_implemented():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n\x1a\n....")
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0....")
    with pytest.raises(ValueError):
        decode_image(b"??garbage")


def test_resize_nearest_identity_and_constant():
    a = _img(6, 8)
    same = decode_image(resize_image(encode_ppm(a), 8, 6, method="nearest"))
    assert np.array_equal(same, a)  # identity resize is exact
    const = np.full((4, 4, 3), 77, dtype=np.uint8)
    up = decode_image(resize_image(encode_ppm(const), 9, 7, method="bilinear"))
    assert up.shape == (7, 9, 3)
    assert np.all(up == 77)  # interpolating a constant stays constant


def test_resize_bilinear_ramp_monotone():
    ramp = np.tile(
        np.linspace(0, 255, 16, dtype=np.uint8)[None, :, None], (4, 1, 3)
    )
    down = decode_image(resize_image(encode_ppm(ramp), 8, 4, method="bilinear"))
    row = down[0, :, 0].astype(int)
    assert all(b >= a for a, b in zip(row, row[1:]))  # monotone preserved
    assert abs(float(down.mean()) - float(ramp.mean())) < 2.0


def test_wav_roundtrip_and_stats():
    t = np.arange(800)
    sine = (10000 * np.sin(2 * np.pi * 440 * t / 8000)).astype(np.int16)
    payload = encode_wav(sine, rate=8000)
    out, rate = decode_audio(payload)
    assert rate == 8000
    assert np.array_equal(out, sine)
    st = waveform_stats(payload)
    assert st["n_samples"] == 800
    assert st["duration_ms"] == 100
    # 440 Hz over 100 ms crosses zero ~2*44 times
    assert 80 <= st["zero_crossings"] <= 96
    assert st["rms"] == pytest.approx(10000 / np.sqrt(2), rel=0.01)


def test_wav_rejects_non_riff():
    with pytest.raises(ValueError):
        decode_audio(b"nope")


def test_spark_image_decode_query(spark, sf_dir):
    from omnidata_etl_spark.queries.multimodal import (
        multimodal_image_decode_stats,
        multimodal_image_resize,
        multimodal_audio_stats,
    )

    dec = multimodal_image_decode_stats(spark, sf_dir).collect()
    assert len(dec) > 0
    assert all(r["roundtrip_ok_all"] for r in dec)
    assert all(r["width"] == 16 and r["height"] == 12 for r in dec)
    assert all(0 <= r["avg_brightness"] <= 255 for r in dec)

    rs = multimodal_image_resize(spark, sf_dir).collect()
    assert all(r["dims_ok_all"] for r in rs)
    assert all(r["avg_abs_brightness_shift"] < 3.0 for r in rs)

    au = multimodal_audio_stats(spark, sf_dir).collect()
    assert all(r["decode_ok_all"] for r in au)
    assert all(r["avg_rms"] > 0 for r in au)
