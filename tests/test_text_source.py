"""Custom Python DataSource tests: format('omnidata_text') must agree with
the expression-based readers on every fixture format."""

from __future__ import annotations

import pytest

from omnidata_etl_spark.ingest.fixtures import (
    N_PEOPLE,
    PEOPLE_HEADERS,
    fixture_path,
)
from omnidata_etl_spark.ingest.readers import read_any
from omnidata_etl_spark.sources import register_text_source


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_text_source(spark)


@pytest.mark.parametrize(
    "name",
    [
        "people_comma.csv",
        "people_tab.tsv",
        "people_pipe.md",
        "people_quoted.csv",
        "people_blanklines.csv",
    ],
)
def test_source_matches_expression_readers(spark, name):
    path = fixture_path(name)
    via_source = spark.read.format("omnidata_text").load(path)
    via_readers = read_any(spark, path)
    assert via_source.columns == list(PEOPLE_HEADERS)
    rows_s = sorted(map(tuple, via_source.collect()))
    rows_r = sorted(map(tuple, via_readers.collect()))
    assert rows_s == rows_r
    assert len(rows_s) == N_PEOPLE


def test_source_sparse_nulls(spark):
    df = spark.read.format("omnidata_text").load(fixture_path("people_sparse.csv"))
    rows = {r["person_id"]: r for r in df.collect()}
    assert rows["2"]["signup_ts"] is None  # short row padded with NULL
    assert rows["1"]["balance"] is None  # empty cell → NULL


def test_stream_tail_follow(spark, tmp_path):
    """readStream over omnidata_text: each micro-batch consumes exactly the
    segment files appended since the last offset (log-segment tailing)."""
    import shutil
    import uuid

    seg_dir = tmp_path / "segments"
    seg_dir.mkdir()
    shutil.copy(fixture_path("people_comma.csv"), seg_dir / "part-00001.csv")

    qname = f"txtstream_{uuid.uuid4().hex[:8]}"
    stream = spark.readStream.format("omnidata_text").load(str(seg_dir))
    q = (
        stream.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        n1 = spark.table(qname).count()
        assert n1 == N_PEOPLE

        shutil.copy(fixture_path("people_tab.tsv"), seg_dir / "part-00002.tsv")
        q.processAllAvailable()
        n2 = spark.table(qname).count()
        assert n2 == 2 * N_PEOPLE
        # header agreed across segments -> same columns, no null smearing
        got = spark.table(qname).select(*PEOPLE_HEADERS).collect()
        assert len(got) == 2 * N_PEOPLE
    finally:
        q.stop()


def test_writer_roundtrip_append_and_overwrite(spark, tmp_path):
    """Batch write path: rows written through the custom sink read back
    value-identical through the custom scan (NULL ↔ empty cell), append
    adds segments, overwrite replaces them."""
    from omnidata_etl_spark.sources import register_text_source

    register_text_source(spark)
    out = str(tmp_path / "seg")
    df = spark.createDataFrame(
        [("1", "ada", None), ("2", None, "9.5"), ("3", "lin", "7.25")],
        "person_id string, name string, score string",
    )
    df.write.format("omnidata_text").mode("append").save(out)
    back = spark.read.format("omnidata_text").load(out)
    assert sorted(back.columns) == ["name", "person_id", "score"]
    got = {tuple(r) for r in back.collect()}
    assert got == {
        ("1", "ada", None),
        ("2", None, "9.5"),
        ("3", "lin", "7.25"),
    }
    # append: same rows again -> double count
    df.write.format("omnidata_text").mode("append").save(out)
    assert spark.read.format("omnidata_text").load(out).count() == 6
    # overwrite: back to one copy
    df.write.format("omnidata_text").mode("overwrite").save(out)
    assert spark.read.format("omnidata_text").load(out).count() == 3
    # no staged leftovers
    import os

    assert not [f for f in os.listdir(out) if f.endswith(".inprogress")]


def test_writer_rejects_unrepresentable_cells(spark, tmp_path):
    """The format has no quoting (reference parser parity): a tab inside a
    value must fail the job loudly, not corrupt the table."""
    import pytest

    from omnidata_etl_spark.sources import register_text_source

    register_text_source(spark)
    df = spark.createDataFrame([("1", "has\ttab")], "a string, b string")
    with pytest.raises(Exception, match="(?i)tab|cannot represent"):
        df.write.format("omnidata_text").mode("append").save(
            str(tmp_path / "bad")
        )
