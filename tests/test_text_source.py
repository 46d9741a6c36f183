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
