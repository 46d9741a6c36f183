# exec(open('scripts/floor_probe.py').read()) inside scripts/prof.py REPL
import time

import pyspark.sql.functions as F
from pyspark.sql import Window

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


def q18_window():
    c = table(spark, SF, "customer")  # noqa: F821
    o = table(spark, SF, "orders")  # noqa: F821
    li = table(spark, SF, "lineitem")  # noqa: F821
    w = Window.partitionBy("l_orderkey")
    big_lines = (
        li.select("l_orderkey", "l_quantity")
        .withColumn("order_qty", F.sum("l_quantity").over(w))
        .where(F.col("order_qty") > 250)
    )
    return (
        big_lines.join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


def q18_agg():
    c = table(spark, SF, "customer")  # noqa: F821
    o = table(spark, SF, "orders")  # noqa: F821
    li = table(spark, SF, "lineitem")  # noqa: F821
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 250)
    )
    return (
        big.join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


a = mp("q18 window form (current)", q18_window)
b = mp("q18 plain partial agg", q18_agg)
print("equal:", a.reset_index(drop=True).equals(b.reset_index(drop=True)))
