#!/usr/bin/env python
"""r12 same-session A/B: directory mirror ON vs OFF (OMNIDATA_NO_MIRROR).

Alternates mirrored/unmirrored builds of the named queries inside ONE
session (r11 lesson: fresh-session numbers are not comparable), busting
the catalog's per-session DataFrame-handle cache between flips so each
build resolves its scan path under the current env. Min of N per arm.

Usage: python scripts/ab_mirror_r12.py <name> [name...]
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


def main() -> int:
    names = sys.argv[1:]
    specs = all_specs()
    spark = get_session("ab-mirror-r12")
    results = {n: {"mirror": [], "nomirror": []} for n in names}
    for p in range(1 + RUNS):
        for arm in ("mirror", "nomirror"):
            if arm == "nomirror":
                os.environ["OMNIDATA_NO_MIRROR"] = "1"
            else:
                os.environ.pop("OMNIDATA_NO_MIRROR", None)
            spark._omnidata_handle_cache = {}
            for n in names:
                spark.sparkContext.setJobDescription(f"{n} [{arm} p{p}]")
                try:
                    df = specs[n].fn(spark, SF_DIR)
                    t0 = time.perf_counter()
                    df.write.format("noop").mode("overwrite").save()
                    dt = time.perf_counter() - t0
                except Exception as e:
                    print(f"{n} {arm} ERROR {e}")
                    continue
                if p:
                    results[n][arm].append(dt)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
    os.environ.pop("OMNIDATA_NO_MIRROR", None)
    w = max(len(n) for n in names)
    for n in names:
        m, nm = results[n]["mirror"], results[n]["nomirror"]
        if m and nm:
            print(
                f"{n:{w}s}  mirror={min(m):.4f}  nomirror={min(nm):.4f}  "
                f"delta={min(nm) - min(m):+.4f}"
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
