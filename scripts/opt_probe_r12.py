#!/usr/bin/env python
"""r12 optimization probe: for each named query, capture the formatted plan
(plans/r12/<name>_<tag>.txt) and time the computation in isolation — noop
sink (guide §1.4: computes every column, discards the result) vs the bench's
toPandas materialization — min of N runs each, interleaved.

Usage: python scripts/opt_probe_r12.py <tag> <name> [name...]
       python scripts/opt_probe_r12.py <tag> @file-with-names
Env: OPT_SF_DIR (default /root/testdata/sf0.1), OPT_RUNS (default 3)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from omnidata_etl_spark.registry import all_specs  # noqa: E402
from omnidata_etl_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("OPT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("OPT_RUNS", "3"))
PLANS_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12")


def main() -> int:
    tag = sys.argv[1]
    names: list[str] = []
    for a in sys.argv[2:]:
        if a.startswith("@"):
            names += [l.strip() for l in open(a[1:]) if l.strip()]
        else:
            names.append(a)
    specs = all_specs()
    spark = get_session("opt-probe-r12")
    os.makedirs(PLANS_DIR, exist_ok=True)

    results: dict[str, dict[str, float]] = {n: {} for n in names}
    # interleaved passes, same discipline as bench.py
    for p in range(1 + RUNS):
        for n in names:
            spec = specs[n]
            spark.sparkContext.setJobDescription(f"{n} [{tag} pass {p}]")
            try:
                df = spec.fn(spark, SF_DIR)
                if p == 0:
                    plan = df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"
                    )
                    with open(os.path.join(PLANS_DIR, f"{n}_{tag}.txt"), "w") as f:
                        f.write(plan)
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                noop = time.perf_counter() - t0
                df2 = spec.fn(spark, SF_DIR)
                t0 = time.perf_counter()
                df2.toPandas()
                pands = time.perf_counter() - t0
            except Exception as e:
                results[n]["error"] = str(e)[:200]
                continue
            if p == 0:
                continue
            r = results[n]
            r["noop"] = round(min(noop, r.get("noop", noop)), 4)
            r["topandas"] = round(min(pands, r.get("topandas", pands)), 4)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    w = max(len(n) for n in names)
    for n in names:
        r = results[n]
        if "error" in r:
            print(f"{n:{w}s}  ERROR {r['error']}")
        else:
            print(f"{n:{w}s}  noop={r['noop']:.4f}  topandas={r['topandas']:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
