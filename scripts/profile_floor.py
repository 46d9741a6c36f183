#!/usr/bin/env python
"""Decompose the per-query overhead floor (VERDICT.md Next round #6).

For a handful of representative queries, splits wall time into:
  build   — Python-side plan construction (py4j round-trips)
  exec    — JVM execution materialized via count() (no result transfer)
  pandas  — full toPandas() (bench protocol: execution + Arrow transfer)

and re-times `pandas` with AQE off, to isolate AQE's extra stage
materialization cost at small SF. Usage:

    python scripts/profile_floor.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from omnidata_etl_spark.registry import all_specs  # noqa: E402
from omnidata_etl_spark.session import get_session  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
QUERIES = [
    "distinct_rows",
    "agg_global",
    "agg_pricing_summary",
    "agg_salted_two_phase",
    "fn_try_cast",
    "fn_json_struct",
    "window_range_frame",
    "agg_percentiles",
    "tpch_q5_local_supplier",
    "subquery_exists_correlated",
]


def t(f, reps=3):
    f()  # warm
    best = min(timeit(f) for _ in range(reps))
    return best


def timeit(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def main() -> None:
    spark = get_session("floor-profile")
    specs = all_specs()
    print(f"{'query':28s} {'build':>7s} {'exec':>7s} {'pandas':>7s} {'noAQE':>7s}")
    for name in QUERIES:
        fn = specs[name].fn
        build = t(lambda: fn(spark, SF_DIR))
        df = fn(spark, SF_DIR)
        ex = t(lambda: df.count())
        pd_ = t(lambda: fn(spark, SF_DIR).toPandas())
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        no_aqe = t(lambda: fn(spark, SF_DIR).toPandas())
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        print(
            f"{name:28s} {build*1000:6.0f}m {ex*1000:6.0f}m "
            f"{pd_*1000:6.0f}m {no_aqe*1000:6.0f}m"
        )


if __name__ == "__main__":
    main()
