"""Streaming checks (SURVEY.md §5 item 5): the streaming tumbling count must
equal the batch equivalent; append mode demonstrates watermark withholding."""

from __future__ import annotations

from omnidata_etl_spark.queries.streaming import tumbling_stream
from omnidata_etl_spark.registry import all_specs
from tests.oracle_util import canonical


def test_stream_complete_equals_batch(spark, sf_dir):
    stream_pdf = tumbling_stream(spark, sf_dir).toPandas()
    batch_pdf = (
        all_specs()["stream_tumbling_counts"].fn(spark, sf_dir).toPandas()
    )
    assert canonical(stream_pdf) == canonical(batch_pdf)


def test_stream_append_withholds_unclosed_windows(spark, sf_dir):
    """In append mode, windows not yet past the watermark are withheld — with
    one static batch the watermark only advances *after* it, so nothing is
    emitted. That asymmetry vs complete mode IS the watermark-drop behavior."""
    append_pdf = tumbling_stream(spark, sf_dir, output_mode="append").toPandas()
    complete_pdf = tumbling_stream(spark, sf_dir).toPandas()
    assert len(append_pdf) < len(complete_pdf)
