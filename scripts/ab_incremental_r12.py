#!/usr/bin/env python
"""r12 A/B: dedup_incremental_delta pair generation.

Committed form: banded (minhash) frame consumed by TWO join sides
(new_bands semi, corpus_bands anti) — the minhash aggregation evaluates
twice per run (the r11 banded-persist A/B showed a persist costs more
than the second evaluation).

Candidate form: ONE evaluation — attach the is_new flag with a broadcast
join, group by (band_id, band_hash), collect the new/corpus doc lists per
bucket, and explode their cross product. One exchange, no persist; the
distinct() and everything downstream identical.

Same-session alternating A/B, min of N, plus value-equality check.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from omnidata_etl_spark.catalog import table  # noqa: E402
from omnidata_etl_spark.queries.dedup import (  # noqa: E402
    JACCARD_THRESHOLD,
    _banded,
    _planted_recall,
    _shingle_sets,
    exact_jaccard,
    minhash_signatures,
)
from omnidata_etl_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("OPT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("OPT_RUNS", "3"))


def build_old(spark):
    docs = table(spark, SF_DIR, "documents")
    is_new = F.col("source").isin("src15", "src16", "src17", "src18", "src19")
    new_ids = docs.where(is_new).select("doc_id")
    shingle_sets = _shingle_sets(spark, SF_DIR, n=5).persist()
    sigs = minhash_signatures(shingle_sets)
    banded = _banded(sigs)
    new_bands = banded.join(F.broadcast(new_ids), "doc_id")
    corpus_bands = banded.join(F.broadcast(new_ids), "doc_id", "left_anti")
    cands = (
        new_bands.alias("a")
        .join(
            corpus_bands.alias("b"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    verified = exact_jaccard(cands, shingle_sets).filter(
        F.col("jaccard") >= JACCARD_THRESHOLD
    )
    return verified.select(
        F.col("doc_a").alias("doc_id"),
        F.col("doc_b").alias("dup_of"),
        "jaccard",
    ).crossJoin(F.broadcast(_planted_recall(spark, SF_DIR, n=5)))


def build_new(spark):
    docs = table(spark, SF_DIR, "documents")
    is_new = F.col("source").isin("src15", "src16", "src17", "src18", "src19")
    new_ids = docs.where(is_new).select(
        "doc_id", F.lit(True).alias("_new")
    )
    shingle_sets = _shingle_sets(spark, SF_DIR, n=5).persist()
    sigs = minhash_signatures(shingle_sets)
    banded = _banded(sigs).join(F.broadcast(new_ids), "doc_id", "left")
    bucket = banded.groupBy("band_id", "band_hash").agg(
        F.collect_set(F.when(F.col("_new"), F.col("doc_id"))).alias("ns"),
        F.collect_set(F.when(F.col("_new").isNull(), F.col("doc_id"))).alias(
            "cs"
        ),
    )
    cands = (
        bucket.where((F.size("ns") > 0) & (F.size("cs") > 0))
        .select(F.explode("ns").alias("doc_a"), "cs")
        .select("doc_a", F.explode("cs").alias("doc_b"))
        .distinct()
    )
    verified = exact_jaccard(cands, shingle_sets).filter(
        F.col("jaccard") >= JACCARD_THRESHOLD
    )
    return verified.select(
        F.col("doc_a").alias("doc_id"),
        F.col("doc_b").alias("dup_of"),
        "jaccard",
    ).crossJoin(F.broadcast(_planted_recall(spark, SF_DIR, n=5)))


def main() -> int:
    spark = get_session("ab-incremental-r12")
    # value equality first
    old_rows = sorted(map(tuple, build_old(spark).collect()))
    new_rows = sorted(map(tuple, build_new(spark).collect()))
    print(f"rows: old={len(old_rows)} new={len(new_rows)} "
          f"equal={old_rows == new_rows}")
    if old_rows != new_rows:
        only_old = set(old_rows) - set(new_rows)
        only_new = set(new_rows) - set(old_rows)
        print("only_old", list(only_old)[:5])
        print("only_new", list(only_new)[:5])
        return 1
    times = {"old": [], "new": []}
    for p in range(1 + RUNS):
        for tag, build in (("old", build_old), ("new", build_new)):
            spark.sparkContext.setJobDescription(f"incremental {tag} p{p}")
            t0 = time.perf_counter()
            build(spark).toPandas()
            dt = time.perf_counter() - t0
            if p:
                times[tag].append(dt)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
    for tag, ts in times.items():
        print(f"{tag}: min={min(ts):.4f} all={[round(t,3) for t in ts]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
