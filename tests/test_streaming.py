"""Streaming checks (SURVEY.md §5 item 5): the streaming tumbling count must
equal the batch equivalent; append mode demonstrates watermark withholding."""

from __future__ import annotations

from pyspark.sql import functions as F

from omnidata_etl_spark.queries.streaming import tumbling_stream
from omnidata_etl_spark.registry import all_specs
from tests.oracle_util import canonical


def test_stream_complete_equals_batch(spark, sf_dir):
    stream_pdf = tumbling_stream(spark, sf_dir).toPandas()
    batch_pdf = (
        all_specs()["stream_tumbling_counts"].fn(spark, sf_dir).toPandas()
    )
    assert canonical(stream_pdf) == canonical(batch_pdf)


def test_stateful_totals_equal_batch(spark, sf_dir):
    """applyInPandasWithState final per-user state == batch groupBy."""
    from pyspark.sql import functions as F

    from omnidata_etl_spark.catalog import table

    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in all_specs()["stream_stateful_user_totals"]
        .fn(spark, sf_dir)
        .collect()
    }
    want = {
        r["user_id"]: (r["n"], r["t"])
        for r in table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    assert set(got) == set(want)
    for uid, (n, t) in want.items():
        assert got[uid][0] == n
        assert abs(got[uid][1] - t) < 1e-6


def test_stream_append_withholds_unclosed_windows(spark, sf_dir):
    """In append mode, windows not yet past the watermark are withheld — with
    one static batch the watermark only advances *after* it, so nothing is
    emitted. That asymmetry vs complete mode IS the watermark-drop behavior."""
    append_pdf = tumbling_stream(spark, sf_dir, output_mode="append").toPandas()
    complete_pdf = tumbling_stream(spark, sf_dir).toPandas()
    assert len(append_pdf) < len(complete_pdf)


def test_foreachbatch_upsert_invariants(spark, sf_dir):
    from pyspark.sql import functions as F

    from omnidata_etl_spark.catalog import table

    row = all_specs()["stream_foreachbatch_upsert"].fn(spark, sf_dir).collect()[0]
    events = table(spark, sf_dir, "events")
    n_src = events.count()
    n_upd = events.where(F.col("event_id") % 10 == 0).count()
    assert row["n_rows"] == n_src      # upsert never duplicates or drops keys
    assert row["n_updated"] == n_upd   # exactly the %10 keys carry the update


def test_stream_dedup_watermark_equals_batch_distinct(spark, sf_dir):
    from omnidata_etl_spark.catalog import table
    from omnidata_etl_spark.queries.streaming import stream_dedup_watermark

    got = {
        r["event_type"]: r["n_events"]
        for r in stream_dedup_watermark(spark, sf_dir).collect()
    }
    want = {
        r["event_type"]: r["n"]
        for r in table(spark, sf_dir, "events")
        .dropDuplicates(["event_id"])
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_stream_static_join_equals_batch(spark, sf_dir):
    from omnidata_etl_spark.catalog import table
    from omnidata_etl_spark.queries.streaming import stream_static_join

    got = {
        r["tier"]: r["n_events"]
        for r in stream_static_join(spark, sf_dir).collect()
    }
    ev = table(spark, sf_dir, "events")
    want = {
        r["tier"]: r["n"]
        for r in ev.withColumn(
            "tier",
            F.concat(F.lit("tier_"), (F.col("user_id") % 3).cast("string")),
        )
        .groupBy("tier")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want
