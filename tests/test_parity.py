"""Oracle-differential tests (SURVEY.md §5 item 1): every declared query with
an oracle runs in Spark AND DuckDB at sf0.001 and must match on row count +
name-sorted columns + order-insensitive values — the driver's gate, locally."""

from __future__ import annotations

import pytest

from omnidata_etl_spark.registry import all_specs
from tests.oracle_util import assert_matches, duckdb_connection

_SPECS = all_specs()
_ORACLE_NAMES = sorted(n for n, s in _SPECS.items() if s.oracle is not None)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", _ORACLE_NAMES)
def test_oracle_parity(spark, sf_dir, duck, name):
    spec = _SPECS[name]
    spark_pdf = spec.fn(spark, sf_dir).toPandas()
    oracle_pdf = duck.execute(spec.oracle).df()
    assert_matches(spark_pdf, oracle_pdf, name)
