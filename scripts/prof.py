"""Interactive profiling helpers: `python -i scripts/prof.py`.

Warm shared session + per-query timing/explain, for iterating on the
bench-slow queries without paying JVM startup per experiment.
"""

import sys
import time

sys.path.insert(0, ".")

from omnidata_etl_spark.registry import all_specs  # noqa: E402
from omnidata_etl_spark.session import get_session  # noqa: E402

SF = "/root/testdata/sf0.1"
spark = get_session("profile")
specs = all_specs()


def t(name, n=3, sf=SF):
    f = specs[name].fn
    best = 1e9
    for i in range(n + 1):
        t0 = time.perf_counter()
        df = f(spark, sf)
        df.toPandas()
        dt = time.perf_counter() - t0
        if i:
            best = min(best, dt)
    print(name, round(best, 3))
    return best


def tdf(build, n=3):
    """Time an arbitrary zero-arg DataFrame builder (build -> toPandas)."""
    best = 1e9
    for i in range(n + 1):
        t0 = time.perf_counter()
        build().toPandas()
        dt = time.perf_counter() - t0
        if i:
            best = min(best, dt)
    print(round(best, 3))
    return best


def ex(name, sf=SF):
    specs[name].fn(spark, sf).explain("formatted")


def duck(name, n=3, sf=SF):
    import duckdb

    from omnidata_etl_spark.catalog import TABLES

    con = duckdb.connect()
    for tab in TABLES:
        con.execute(
            f"CREATE VIEW {tab} AS SELECT * FROM read_parquet('{sf}/{tab}.parquet')"
        )
    q = specs[name].oracle
    if q is None:
        print(name, "has no DuckDB oracle (rows-only)")
        return None
    con.execute(q).fetchall()
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        con.execute(q).fetchall()
        best = min(best, time.perf_counter() - t0)
    print(name, "duck", round(best, 4))
    return best
