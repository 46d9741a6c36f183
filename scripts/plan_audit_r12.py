#!/usr/bin/env python
"""r12 whole-registry plan sweep: flag guide-§4.4 duplicate Python-UDF
evaluations (the same UDF Arguments string appearing in 2+ eval nodes of
ONE plan) and count exchange-class / Python-boundary nodes per query.

Usage: python scripts/plan_audit_r12.py [--sf DIR] > PLAN_AUDIT_r12.txt
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from omnidata_etl_spark.registry import all_specs  # noqa: E402
from omnidata_etl_spark.session import get_session  # noqa: E402

SF_DIR = (
    sys.argv[sys.argv.index("--sf") + 1]
    if "--sf" in sys.argv
    else "/root/testdata/sf0.1"
)

EVAL_RE = re.compile(
    r"\((\d+)\) (ArrowEvalPython|BatchEvalPython|PythonMapInArrow|"
    r"MapInArrow|MapInPandas|FlatMapGroupsInPandas|BatchEvalPythonUDTF)\n"
    r"(?:Input[^\n]*\n)?Arguments: ([^\n]*)"
)


def main() -> int:
    spark = get_session("plan-audit-r12")
    specs = all_specs()
    dup_flags, errors = [], []
    for name, spec in specs.items():
        try:
            df = spec.fn(spark, SF_DIR)
            plan = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 - audit must not stop
            errors.append((name, str(e).splitlines()[0][:120]))
            continue
        tree = plan.split("\n\n", 1)[0]
        n_exch = len(re.findall(r"\bExchange\b", tree))
        n_reused = len(re.findall(r"ReusedExchange", tree))
        n_py = len(
            re.findall(
                r"ArrowEvalPython|BatchEvalPython|MapInArrow|MapInPandas",
                tree,
            )
        )
        # §4.4: same UDF argument list evaluated in >1 node of one plan
        args = [
            re.sub(r"#\d+L?", "#x", m.group(3))
            for m in EVAL_RE.finditer(plan)
            if m.group(2) in ("ArrowEvalPython", "BatchEvalPython")
        ]
        dups = [a for a, c in Counter(args).items() if c > 1]
        flag = f"  DUP-UDF×{len(dups)}" if dups else ""
        print(
            f"{name:42s} exch={n_exch:2d} reused={n_reused} py={n_py}{flag}"
        )
        if dups:
            dup_flags.append((name, dups))
    print("\n== duplicate-UDF flags ==")
    for name, dups in dup_flags:
        print(f"{name}: {[d[:90] for d in dups]}")
    print(f"\n== errors ({len(errors)}) ==")
    for name, e in errors:
        print(f"{name}: {e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
