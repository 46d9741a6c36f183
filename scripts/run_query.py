#!/usr/bin/env python
"""Run any declared query by name against a scale-factor directory.

    python scripts/run_query.py <query_name> [--sf DIR] [--explain]
                                [--oracle] [--limit N] [--list]

  --list      list all declared query names (with oracle/rows-only marker)
  --explain   print the formatted physical plan instead of rows
  --oracle    print the DuckDB oracle SQL (if declared) and exit
  --limit N   show at most N rows (default 20)
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from omnidata_etl_spark.registry import all_specs  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("name", nargs="?")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--explain", action="store_true")
    ap.add_argument("--oracle", action="store_true")
    ap.add_argument("--limit", type=int, default=20)
    ap.add_argument("--list", action="store_true")
    args = ap.parse_args()

    specs = all_specs()
    if args.list or not args.name:
        for n in sorted(specs):
            kind = "oracle" if specs[n].oracle else "rows-only"
            print(f"{n:42s} {kind}  {','.join(specs[n].tags)}")
        return 0
    if args.name not in specs:
        print(f"unknown query {args.name!r}; --list shows all", file=sys.stderr)
        return 2
    spec = specs[args.name]
    if args.oracle:
        print(spec.oracle or "(rows-only: no oracle declared)")
        return 0

    from omnidata_etl_spark.session import get_session

    spark = get_session(f"run-{args.name}")
    spark.sparkContext.setLogLevel("ERROR")
    df = spec.fn(spark, args.sf)
    if args.explain:
        print(
            spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        )
    else:
        df.show(args.limit, truncate=40)
        print(f"(showing up to {args.limit} rows)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
