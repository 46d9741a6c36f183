"""Oracle-differential comparison utilities (mimics the driver's check:
row-count + name-sorted schema + order-insensitive value hash)."""

from __future__ import annotations

import datetime as dt
import decimal
import math

import duckdb
import numpy as np
import pandas as pd

from omnidata_etl_spark.catalog import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        # Spark-written tables are directories of part files (the x10
        # synthetic sweep, r10) — glob them for DuckDB; single-file
        # testdata parquet reads directly.
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{path}')"
        )
    return con


def _canon_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float) and math.isnan(v):
        return "NULL"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "NULL"
        if f.is_integer():
            return str(int(f))
        return repr(f)
    if isinstance(v, (bool, np.bool_)):
        return "true" if v else "false"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, decimal.Decimal):
        f = format(v.normalize(), "f")
        return f  # normalize() already strips trailing zeros ('18', '1.5')
    if isinstance(v, pd.Timestamp):
        # DATE columns come back from duckdb as midnight datetime64 while
        # Spark yields datetime.date — canonicalize midnight to date-only.
        if v.hour == v.minute == v.second == v.microsecond == 0:
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, dt.datetime):
        if (
            v.hour == v.minute == v.second == v.microsecond == 0
            and v.tzinfo is None
        ):
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return str(v)


def canonical(df: pd.DataFrame) -> tuple[int, list[str], list[tuple]]:
    cols = sorted(df.columns)
    rows = [
        tuple(_canon_cell(row[c]) for c in cols)
        for _, row in df.iterrows()
    ]
    rows.sort()
    return (len(df), cols, rows)


def assert_matches(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str):
    s_n, s_cols, s_rows = canonical(spark_pdf)
    o_n, o_cols, o_rows = canonical(oracle_pdf)
    assert s_cols == o_cols, f"{name}: column mismatch {s_cols} != {o_cols}"
    assert s_n == o_n, f"{name}: row count {s_n} != {o_n}"
    if s_rows != o_rows:
        diffs = [
            (a, b) for a, b in zip(s_rows, o_rows) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch; first diffs: {diffs}")
