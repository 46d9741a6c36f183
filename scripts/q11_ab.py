#!/usr/bin/env python
"""Bench-true A/B of tpch_q11 forms at sf0.1 (clearCache between runs,
min-of-N with a warm-up, prepared-statement semantics — the driver's
protocol, per the repo's three-timing-regimes finding)."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from omnidata_etl_spark.catalog import table
from omnidata_etl_spark.queries._util import rev_units
from omnidata_etl_spark.session import get_session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = 5


def current(spark, sf_dir):
    from omnidata_etl_spark.queries.tpch_extended import (
        tpch_q11_important_value,
    )

    return tpch_q11_important_value(spark, sf_dir)


def _fact(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    sn = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey"
    )
    return li.join(F.broadcast(sn), li.l_suppkey == F.col("s_suppkey"))


def rollup_collect(spark, sf_dir):
    """One rollup pass produces per-part rows AND the totals row; persist
    the small agged frame, collect the 1-row total as literals."""
    agged = (
        _fact(spark, sf_dir)
        .rollup("l_partkey")
        .agg(
            F.sum(rev_units()).alias("value_units"),
            F.count_distinct("l_partkey").alias("nd"),
        )
        .persist()
    )
    tot = agged.where(F.col("l_partkey").isNull()).collect()[0]
    total_units, n_parts = int(tot["value_units"]), int(tot["nd"])
    return (
        agged.where(F.col("l_partkey").isNotNull())
        .where(
            F.col("value_units").cast("decimal(38,0)") * F.lit(n_parts)
            > F.lit(3) * F.lit(total_units).cast("decimal(38,0)")
        )
        .select(
            "l_partkey", (F.col("value_units") / 10000.0).alias("value")
        )
    )


def twopass_nocache(spark, sf_dir):
    """No persist: totals computed directly from the fact (second scan)."""
    fact = _fact(spark, sf_dir)
    v = fact.groupBy("l_partkey").agg(
        F.sum(rev_units()).alias("value_units")
    )
    totals = fact.agg(
        F.sum(rev_units()).cast("decimal(38,0)").alias("total_units"),
        F.count_distinct("l_partkey").alias("n_parts"),
    )
    return (
        v.crossJoin(F.broadcast(totals))
        .where(
            F.col("value_units").cast("decimal(38,0)") * F.col("n_parts")
            > F.lit(3) * F.col("total_units")
        )
        .select(
            "l_partkey", (F.col("value_units") / 10000.0).alias("value")
        )
    )


def persisted_collect(spark, sf_dir):
    """Current persisted-v shape but totals collected as driver literals
    (1 bounded row) instead of broadcast-crossJoined."""
    v = (
        _fact(spark, sf_dir)
        .groupBy("l_partkey")
        .agg(F.sum(rev_units()).alias("value_units"))
        .persist()
    )
    tot = v.agg(
        F.sum(F.col("value_units").cast("decimal(38,0)")).alias("t"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    return (
        v.where(
            F.col("value_units").cast("decimal(38,0)") * F.lit(int(tot["n"]))
            > F.lit(3) * F.lit(int(tot["t"])).cast("decimal(38,0)")
        )
        .select(
            "l_partkey", (F.col("value_units") / 10000.0).alias("value")
        )
    )


def main():
    spark = get_session("q11-ab")
    spark.sparkContext.setLogLevel("ERROR")
    variants = {
        "current(persist+bcast)": current,
        "rollup+persist+collect": rollup_collect,
        "twopass_nocache": twopass_nocache,
        "persist+collect": persisted_collect,
    }
    ref = None
    for label, fn in variants.items():
        best = 1e9
        rows = None
        for i in range(N + 1):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            rows = fn(spark, SF).toPandas()
            dt = time.perf_counter() - t0
            if i:
                best = min(best, dt)
        rows = rows.sort_values("l_partkey").reset_index(drop=True)
        if ref is None:
            ref = rows
            ok = "ref"
        else:
            ok = "MATCH" if rows.equals(ref) else "MISMATCH"
        print(f"{label:28s} {best*1000:8.1f} ms  rows={len(rows)}  {ok}")


if __name__ == "__main__":
    main()
