# exec(open('scripts/floor_probe.py').read()) inside scripts/prof.py REPL
import time

import pyspark.sql.functions as F

from omnidata_etl_spark.catalog import table


def mp(label, build, n=4):
    best, r = 1e9, None
    for i in range(n + 1):
        t0 = time.perf_counter()
        r = build().toPandas()
        dt = time.perf_counter() - t0
        if i:
            best = min(best, dt)
    print(f"{label:52s} {best*1000:8.1f} ms")
    return r


def q21_agg(sf=SF):  # noqa: F821
    li = table(spark, sf, "lineitem")  # noqa: F821
    o = table(spark, sf, "orders").where(F.col("o_orderstatus") == "F")  # noqa: F821
    s = table(spark, sf, "supplier")  # noqa: F821
    n = table(spark, sf, "nation")  # noqa: F821
    l1 = (
        li.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(
            o.select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left_semi",
        )
        .persist()
    )
    S = l1.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("smax")
    )
    # two-phase: m1 first, then m2/n_top need m1 — do it in one agg via
    # max_by-free formulation: m2 = max of smax where smax < m1 requires m1;
    # compute via sort-free trick: top-2 distinct smax values per order
    O = S.groupBy("l_orderkey").agg(
        F.max("smax").alias("m1"),
        F.count(F.lit(1)).alias("n_supp"),
    )
    SO = S.join(O, "l_orderkey")
    O2 = SO.groupBy("l_orderkey", "m1", "n_supp").agg(
        F.sum((F.col("smax") == F.col("m1")).cast("int")).alias("n_top"),
        F.max(F.when(F.col("smax") < F.col("m1"), F.col("smax"))).alias("m2"),
    )
    winners = (
        SO.join(
            O2.filter((F.col("n_top") == 1) & (F.col("n_supp") >= 2)).select(
                "l_orderkey", "n_top", "m2"
            ),
            "l_orderkey",
        )
        .where(F.col("smax") == F.col("m1"))
        .select(
            F.col("l_orderkey").alias("w_okey"),
            F.col("l_suppkey").alias("w_skey"),
            "m2",
        )
    )
    waiting = l1.join(
        F.broadcast(winners),
        (F.col("l_orderkey") == F.col("w_okey"))
        & (F.col("l_suppkey") == F.col("w_skey"))
        & (F.col("l_shipdate") > F.col("m2")),
    )
    return (
        waiting.join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("s_name")
        .agg(F.count("*").cast("bigint").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


cur = specs["tpch_q21_waiting_supplier"].fn  # noqa: F821
a = mp("q21 current window form", lambda: cur(spark, SF))  # noqa: F821
b = mp("q21 agg + broadcast join-back", q21_agg)
print("equal:", a.reset_index(drop=True).equals(b.reset_index(drop=True)))
