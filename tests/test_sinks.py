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
