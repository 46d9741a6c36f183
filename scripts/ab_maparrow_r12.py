#!/usr/bin/env python
"""r12 same-session A/B: mapInArrow (committed) vs mapInPandas (r11 form)
for representative multimodal ops. The pandas twins below are verbatim
copies of the r11 op bodies; the arrow arms call the committed builders.
Value equality is asserted before timing.

Env: OPT_SF_DIR (default /root/testdata/sf0.1), OPT_RUNS (default 4)
"""

from __future__ import annotations

import os
import sys
import time
from collections.abc import Iterator

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from omnidata_etl_spark.catalog import table  # noqa: E402
from omnidata_etl_spark.queries._util import spread  # noqa: E402
from omnidata_etl_spark.queries.multimodal import (  # noqa: E402
    _JPEG_TOL,
    _synth_image_payload,
    _synth_pixels,
    _synth_scenecut_payload,
    assets_from_documents,
    decode_image,
    encode_wav,
    fake_features,
    waveform_stats,
)
from omnidata_etl_spark.registry import all_specs  # noqa: E402
from omnidata_etl_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("OPT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("OPT_RUNS", "4"))


def decode_stats_pandas(spark, sf_dir):
    import numpy as np

    from omnidata_etl_spark.codecs import encode_bmp, encode_gif, encode_png
    from omnidata_etl_spark.codecs import encode_ppm

    encoders = (
        encode_ppm, encode_bmp, encode_png, encode_gif, None,
        lambda a: encode_png(a, interlace=True),
        lambda a: encode_gif(a, interlace=True),
        None,
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"source": pdf["source"], "brightness": [], "width": [],
                   "height": [], "roundtrip_ok": []}
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                payload = _synth_image_payload(int(did), text)
                img = decode_image(payload)
                out["brightness"].append(float(np.mean(img)))
                out["height"].append(img.shape[0])
                out["width"].append(img.shape[1])
                enc = encoders[int(did) % 8]
                if enc is None:
                    src = _synth_pixels(int(did), text)
                    ok = bool(img.shape == src.shape and np.abs(
                        img.astype(int) - src.astype(int)).max() <= _JPEG_TOL)
                else:
                    ok = enc(img) == payload
                out["roundtrip_ok"].append(ok)
            yield pd.DataFrame(out)

    schema = ("source string, brightness double, width int, height int, "
              "roundtrip_ok boolean")
    docs = spread(
        table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    )
    decoded = docs.mapInPandas(op, schema=schema)
    return (
        decoded.groupBy("source")
        .agg(
            F.count("*").alias("n_images"),
            F.round(F.avg("brightness"), 4).alias("avg_brightness"),
            F.max("width").alias("width"),
            F.max("height").alias("height"),
            F.min("roundtrip_ok").alias("roundtrip_ok_all"),
        )
        .orderBy("source")
    )


def feature_extract_pandas(spark, sf_dir):
    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                    "feature": pdf["payload"].map(fake_features),
                }
            )

    from omnidata_etl_spark.queries.multimodal import FEATURE_SCHEMA

    docs = table(spark, sf_dir, "documents")
    feats = assets_from_documents(docs).mapInPandas(op, schema=FEATURE_SCHEMA)
    return feats.groupBy("media_type").agg(
        F.count("*").alias("n_assets"),
        F.sum("n_bytes").alias("total_bytes"),
        F.round(
            F.sum(F.element_at("feature", 2).cast("decimal(18,9)")).cast(
                "double"
            )
            / F.count("*"),
            4,
        ).alias("avg_mean_byte"),
        F.min(
            F.element_at("feature", 1) == F.col("n_bytes").cast("double")
        ).alias("feature_matches_bytes"),
    )


def scene_cut_pandas(spark, sf_dir):
    import numpy as np

    from omnidata_etl_spark.codecs import decode_gif_frames_with_delays

    CUT_AT = 3
    payload = _synth_scenecut_payload

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ok, n_cuts = [], []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                dec, _ = decode_gif_frames_with_delays(payload(did, text))
                diffs = np.array(
                    [np.abs(dec[i].astype(int) - dec[i - 1].astype(int)).mean()
                     for i in range(1, len(dec))]
                )
                cuts = np.nonzero(diffs > 1.5 * np.median(diffs))[0] + 1
                n_cuts.append(len(cuts))
                ok.append(len(cuts) == 1 and int(cuts[0]) == CUT_AT)
            yield pd.DataFrame({"ok": ok, "n_cuts": n_cuts})

    docs = spread(table(spark, sf_dir, "documents").select("doc_id", "text"))
    scored = docs.mapInPandas(op, schema="ok boolean, n_cuts int")
    return scored.agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum(F.col("ok").cast("int")).alias("n_detected"),
        (F.sum(F.col("ok").cast("int")).cast("double") / F.count(F.lit(1))
         ).alias("cut_detect_rate"),
        F.max("n_cuts").alias("max_cuts_per_asset"),
    )


def audio_stats_pandas(spark, sf_dir):
    import numpy as np

    RATE = 8000

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"source": pdf["source"], "duration_ms": [], "rms": [],
                   "zcr": [], "decode_ok": []}
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                raw = (text or "").encode("utf-8") or bytes([int(did) % 256])
                wavef = (
                    np.frombuffer(raw, dtype=np.uint8).astype(np.int16) - 128
                ) * 256
                payload = encode_wav(wavef, rate=RATE)
                st = waveform_stats(payload)
                out["duration_ms"].append(st["duration_ms"])
                out["rms"].append(st["rms"])
                out["zcr"].append(
                    st["zero_crossings"] / st["n_samples"]
                    if st["n_samples"] else 0.0
                )
                out["decode_ok"].append(st["n_samples"] == len(wavef))
            yield pd.DataFrame(out)

    schema = ("source string, duration_ms long, rms double, zcr double, "
              "decode_ok boolean")
    docs = spread(
        table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    )
    stats = docs.mapInPandas(op, schema=schema)
    return (
        stats.groupBy("source")
        .agg(
            F.count("*").alias("n_assets"),
            F.sum("duration_ms").alias("total_duration_ms"),
            F.round(F.avg("rms"), 2).alias("avg_rms"),
            F.round(F.avg("zcr"), 4).alias("avg_zcr"),
            F.min("decode_ok").alias("decode_ok_all"),
        )
        .orderBy("source")
    )


PAIRS = {
    "multimodal_image_decode_stats": decode_stats_pandas,
    "multimodal_feature_extract": feature_extract_pandas,
    "multimodal_video_scene_cut": scene_cut_pandas,
    "multimodal_audio_stats": audio_stats_pandas,
}


def main() -> int:
    specs = all_specs()
    spark = get_session("ab-maparrow-r12")
    # value equality
    for name, pandas_build in PAIRS.items():
        a = sorted(map(tuple, specs[name].fn(spark, SF_DIR).collect()))
        p = sorted(map(tuple, pandas_build(spark, SF_DIR).collect()))
        print(f"{name}: equal={a == p} rows={len(a)}")
        if a != p:
            return 1
    results = {n: {"arrow": [], "pandas": []} for n in PAIRS}
    for pass_i in range(1 + RUNS):
        for name, pandas_build in PAIRS.items():
            for arm, build in (
                ("arrow", specs[name].fn), ("pandas", pandas_build)
            ):
                spark.sparkContext.setJobDescription(f"{name} {arm} p{pass_i}")
                df = build(spark, SF_DIR)
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                if pass_i:
                    results[name][arm].append(dt)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
    w = max(len(n) for n in PAIRS)
    for name, r in results.items():
        print(
            f"{name:{w}s}  arrow={min(r['arrow']):.4f}  "
            f"pandas={min(r['pandas']):.4f}  "
            f"delta={min(r['pandas']) - min(r['arrow']):+.4f}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
