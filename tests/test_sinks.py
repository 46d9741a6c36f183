"""Behavioral checks for sink-shaped queries (rows-only in the driver).

`sink_partitioned` writes a Hive-partitioned copy of `documents` and reads
it back pruned; the counts must match a direct aggregate over the source
(partitioning must never duplicate or drop rows). Pruning itself is
asserted in tests/test_plans.py::test_partitioned_write_prunes_partitions.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from omnidata_etl_spark.catalog import table
from omnidata_etl_spark.registry import all_specs


def test_sink_partitioned_counts_match_source(spark, sf_dir):
    result = {
        r["lang"]: r["n_docs"]
        for r in all_specs()["sink_partitioned"].fn(spark, sf_dir).collect()
    }
    expected = {
        r["lang"]: r["n"]
        for r in table(spark, sf_dir, "documents")
        .where(F.col("lang").isin("en", "de"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert result == expected and set(result) == {"en", "de"}


def test_compaction_conserves_rows_and_shrinks_files(spark, sf_dir):
    row = all_specs()["etl_compact_small_files"].fn(spark, sf_dir).collect()[0]
    assert row["files_before"] == 64
    assert row["files_after"] == 4
    assert row["rows_before"] == row["rows_after"]
    n_docs = table(spark, sf_dir, "documents").count()
    assert row["rows_after"] == n_docs


def test_orc_roundtrip_matches_csv(spark, sf_dir):
    from omnidata_etl_spark.ingest.fixtures import fixture_path
    from omnidata_etl_spark.ingest.readers import read_any

    orc = all_specs()["ingest_orc"].fn(spark, sf_dir)
    csv = read_any(spark, fixture_path("people_comma.csv"))
    assert orc.schema == csv.schema
    assert sorted(map(tuple, orc.collect())) == sorted(map(tuple, csv.collect()))


def test_dynamic_partition_overwrite_touches_only_target(spark, sf_dir):
    got = {
        r["lang"]: r["n_docs"]
        for r in all_specs()["sink_dynamic_partition_overwrite"]
        .fn(spark, sf_dir)
        .collect()
    }
    docs = table(spark, sf_dir, "documents")
    want = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_en_redo = docs.filter(
        (F.col("lang") == "en") & (F.col("doc_id") % 2 == 0)
    ).count()
    for lang, n in want.items():
        if lang == "en":
            assert got[lang] == n_en_redo  # only en replaced
        else:
            assert got[lang] == n  # siblings untouched


def test_gzip_ingest_matches_plain_csv(spark, sf_dir):
    from omnidata_etl_spark.ingest.fixtures import fixture_path
    from omnidata_etl_spark.ingest.readers import read_any

    gz = all_specs()["ingest_csv_gzip"].fn(spark, sf_dir)
    csv = read_any(spark, fixture_path("people_comma.csv"))
    assert sorted(map(tuple, gz.collect())) == sorted(map(tuple, csv.collect()))


def test_zorder_layout_skips_files(spark, sf_dir):
    """Z-order clustering must (a) preserve query results exactly and
    (b) prune strictly more files than the 1-D layout on the 2-D
    predicate, both proven from the written parquet footers."""
    from omnidata_etl_spark.registry import all_specs

    row = all_specs()["etl_zorder_layout"].fn(spark, sf_dir).collect()[0]
    assert row["rows_match"] is True
    assert row["z_skips_fewer"] is True
    assert row["files_scanned_z"] < row["files_scanned_naive"]
    assert row["files_total"] == 16
