"""Multimodal plumbing tests: the Arrow-batched mapInPandas pipeline works on
binary payloads with the declared schemas; real decode is a marked stub."""

from __future__ import annotations

import pytest

from omnidata_etl_spark.catalog import table
from omnidata_etl_spark.queries.multimodal import (
    FEATURE_SCHEMA,
    assets_from_documents,
    decode_image,
    extract_features,
    fake_features,
)


def test_library_needing_decodes_are_marked_stubs():
    # PNG decodes for real since r6 (zlib+numpy), GIF since r7 (LZW);
    # JPEG is documented OUT OF SCOPE without a codec library and must
    # keep raising from the magic-byte dispatch. A malformed GIF is a
    # ValueError from the real decoder, not a stub.
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0...")
    with pytest.raises(ValueError):
        decode_image(b"GIF89a...")


def test_fake_features_deterministic():
    assert fake_features(b"abc") == fake_features(b"abc")
    assert fake_features(None) == [0.0, 0.0, 0.0, 0.0]
    assert fake_features(b"") == [0.0, 0.0, 0.0, 0.0]


def test_feature_extraction_pipeline(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").limit(50)
    assets = assets_from_documents(docs)
    assert dict(assets.dtypes)["payload"] == "binary"
    feats = extract_features(assets)
    assert feats.schema == FEATURE_SCHEMA
    rows = feats.collect()
    assert len(rows) == 50
    for r in rows:
        assert r["media_type"] in ("image", "audio", "video")
        assert r["n_bytes"] > 0
        assert len(r["feature"]) == 4
        assert r["feature"][0] == float(r["n_bytes"])  # stub contract


def test_grouped_minmax_arrow_equals_pandas_and_window(spark, sf_dir):
    """The registered applyInArrow form, its applyInPandas twin, and the
    window-expression scale path must agree row-for-row (min/max over 2dp
    values are exact; the division is one fixed double op in all three)."""
    from omnidata_etl_spark.queries.multimodal import (
        grouped_minmax_scale_arrow,
        grouped_minmax_scale_pandas_form,
        grouped_minmax_scale,
    )

    def as_map(df):
        return {r["event_id"]: r["scaled"] for r in df.collect()}

    arrow = as_map(grouped_minmax_scale_arrow(spark, sf_dir))
    pandas = as_map(grouped_minmax_scale_pandas_form(spark, sf_dir))
    window = as_map(grouped_minmax_scale(spark, sf_dir))
    assert arrow == pandas == window
    assert len(arrow) > 0


def test_binary_assets_ingest_self_evidencing(spark, sf_dir):
    """binaryFile-source ingestion: every staged PPM must decode to its
    filename-declared dimensions and re-encode byte-identically, proven by
    the query's own decode_ok_all output column."""
    from omnidata_etl_spark.registry import all_specs

    row = all_specs()["ingest_binary_assets"].fn(spark, sf_dir).collect()[0]
    assert row["n_assets"] == 24
    assert row["decode_ok_all"] is True
    assert row["n_shapes"] == 6
    assert row["total_bytes"] > 0
