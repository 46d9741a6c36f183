"""Behavioral checks for the quality/sampling operators (rows-only keys)."""

from __future__ import annotations

from omnidata_etl_spark.catalog import table
from omnidata_etl_spark.registry import all_specs


def _sample_counts(spark, sf_dir):
    return sorted(
        (r["lang"], r["n_sampled"])
        for r in all_specs()["sample_stratified"].fn(spark, sf_dir).collect()
    )


def test_stratified_sample_deterministic(spark, sf_dir):
    assert _sample_counts(spark, sf_dir) == _sample_counts(spark, sf_dir)


def test_stratified_sample_fractions_plausible(spark, sf_dir):
    src = {
        r["lang"]: r["n"]
        for r in table(spark, sf_dir, "documents")
        .groupBy("lang")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    got = dict(_sample_counts(spark, sf_dir))
    assert set(got) <= set(src)
    for lang, n in got.items():
        assert 0 < n <= src[lang]
    # the 'en' stratum is downsampled 0.25 vs 0.8 elsewhere: its keep-rate
    # must be well below any other stratum's
    rates = {lang: got.get(lang, 0) / src[lang] for lang in src}
    assert rates["en"] < min(v for k, v in rates.items() if k != "en")
