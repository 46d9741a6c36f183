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


def test_observation_rides_a_real_write(spark, sf_dir, tmp_path):
    """The production form of etl_observed_metrics: metrics ride the sink
    write itself (the declared query drives the observation with count() to
    keep the bench free of a full-table copy — this pins that the same
    observation works on the real write action, at zero extra scans)."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    obs = Observation("write_metrics")
    observed = li.observe(
        obs, F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )
    out = str(tmp_path / "observed_write")
    observed.write.mode("overwrite").parquet(out)
    assert obs.get["n_rows"] == li.count()
    assert spark.read.parquet(out).count() == obs.get["n_rows"]
