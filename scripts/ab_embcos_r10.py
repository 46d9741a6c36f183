#!/usr/bin/env python
"""Round-10 driver-regime A/B for dedup_embedding_cosine (VERDICT r9 #1).

Reproduces bench.py's exact execution semantics per timed run:
  * one shared SparkSession (JVM startup excluded),
  * prepared-STATEMENT mode — both forms' analyzed plans built once,
    every timed run re-executes from the parquet scan up via a fresh
    QueryExecution (df.toPandas() on the cached DataFrame object),
  * spark.catalog.clearCache() + System.gc() before EVERY timed run, so
    each run starts cold-cache exactly like a bench.py pass boundary,
  * min-of-N with the A/B interleaved (A,B,B,A alternation kills both
    order bias and slow host-drift bias).

Forms:
  A = SQL-expression LSH hashing (the r8 shape: NUMPY_LSH_MIN_N above
      the 2 000-vector sf0.1 corpus, whole-stage-codegen-free but
      JVM-interpreted higher-order functions)
  B = numpy/Arrow LSH hashing (the r9 shape: pandas_udf BLAS matmul,
      Python-worker round-trip)

Prints per-run seconds, min/median per form, and the statusTracker job
count per run (the AQE-ladder depth the PLANS floor-pin cites).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from omnidata_etl_spark.queries import similarity  # noqa: E402
from omnidata_etl_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = int(os.environ.get("AB_PASSES", "8"))


def main() -> None:
    spark = get_session("ab-embcos-r10")
    jvm = spark.sparkContext._jvm
    tracker = spark.sparkContext.statusTracker()

    from pyspark.sql import DataFrame

    saved = similarity.NUMPY_LSH_MIN_N
    similarity.NUMPY_LSH_MIN_N = 1 << 30  # force SQL path
    df_sql = similarity.dedup_embedding_cosine(spark, SF_DIR)
    # form C: SQL path with persist() stubbed out — rely on AQE query-stage
    # reuse to dedup the identical subplans inside the single execution
    real_persist = DataFrame.persist
    DataFrame.persist = lambda self, *a, **k: self
    df_nop = similarity.dedup_embedding_cosine(spark, SF_DIR)
    DataFrame.persist = real_persist
    similarity.NUMPY_LSH_MIN_N = 2_000  # force numpy path (2k corpus)
    df_np = similarity.dedup_embedding_cosine(spark, SF_DIR)
    similarity.NUMPY_LSH_MIN_N = saved

    def run(df) -> tuple[float, int]:
        spark.catalog.clearCache()
        jvm.System.gc()
        j0 = len(tracker.getJobIdsForGroup(None) or [])
        t0 = time.perf_counter()
        # prepared-STATEMENT semantics (registry.prepare_execute): a fresh
        # QueryExecution per run — no shuffle-stage or broadcast reuse
        df.select("*").toPandas()
        sec = time.perf_counter() - t0
        j1 = len(tracker.getJobIdsForGroup(None) or [])
        return sec, j1 - j0

    forms = (("sql", df_sql), ("np", df_np), ("nop", df_nop))
    # warm-up (plan compilation, codegen, IO) — not timed
    for _, df in forms:
        run(df)

    rows: list[tuple[str, float, int]] = []
    for p in range(PASSES):
        order = forms if p % 2 == 0 else forms[::-1]
        for label, df in order:
            sec, jobs = run(df)
            rows.append((label, sec, jobs))
            print(f"pass {p} {label:>3}: {sec:6.3f} s  {jobs} jobs", flush=True)

    for label in ("sql", "np", "nop"):
        xs = sorted(s for lb, s, _ in rows if lb == label)
        js = [j for lb, _, j in rows if lb == label]
        print(
            f"{label:>3}: min {xs[0]:.3f}  med {statistics.median(xs):.3f}  "
            f"max {xs[-1]:.3f}  jobs {min(js)}-{max(js)}"
        )


if __name__ == "__main__":
    main()
