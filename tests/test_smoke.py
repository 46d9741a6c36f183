"""Smoke: the driver contract module loads, entry() returns rows, and every
rows-only query executes with a stable schema."""

from __future__ import annotations

import pytest

import __spark_entry__ as contract
from omnidata_etl_spark.registry import all_specs

_SPECS = all_specs()
_ROWS_ONLY = sorted(n for n, s in _SPECS.items() if s.oracle is None)


def test_entry_returns_rows(spark):
    df = contract.entry(spark)
    assert len(df.columns) > 0
    assert df.count() > 0


def test_contract_shape():
    qs = contract.queries()
    oracles = contract.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 40


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_queries_run(spark, sf_dir, name):
    df = _SPECS[name].fn(spark, sf_dir)
    assert df.columns  # stable, non-empty schema
    assert df.count() >= 0
