# exec(open('scripts/floor_probe.py').read()) inside scripts/prof.py REPL
import time

import pyspark.sql.functions as F
from pyspark.sql import Window

from omnidata_etl_spark.catalog import table


def mp(label, build, n=4):
    best = 1e9
    for i in range(n + 1):
        t0 = time.perf_counter()
        build().toPandas()
        dt = time.perf_counter() - t0
        if i:
            best = min(best, dt)
    print(f"{label:52s} {best*1000:8.1f} ms")


def q21(pre_repart):
    li = table(spark, SF, "lineitem")  # noqa: F821
    o = table(spark, SF, "orders").where(F.col("o_orderstatus") == "F")  # noqa: F821
    s = table(spark, SF, "supplier")  # noqa: F821
    n = table(spark, SF, "nation")  # noqa: F821
    l1 = li.select("l_orderkey", "l_suppkey", "l_shipdate").join(
        o.select("o_orderkey"),
        F.col("l_orderkey") == F.col("o_orderkey"),
        "left_semi",
    )
    if pre_repart:
        l1 = l1.repartition(F.col("l_orderkey"))
    w_os = Window.partitionBy("l_orderkey", "l_suppkey")
    w_o = Window.partitionBy("l_orderkey")
    staged = (
        l1.withColumn("smax", F.max("l_shipdate").over(w_os))
        .withColumn(
            "first_of_supp",
            F.row_number().over(w_os.orderBy("l_shipdate")) == 1,
        )
        .withColumn("m1", F.max("l_shipdate").over(w_o))
        .withColumn("n_supp", F.sum(F.col("first_of_supp").cast("int")).over(w_o))
        .withColumn(
            "n_top",
            F.sum(
                F.when(F.col("first_of_supp") & (F.col("smax") == F.col("m1")), 1).otherwise(0)
            ).over(w_o),
        )
        .withColumn("m2", F.max(F.when(F.col("smax") < F.col("m1"), F.col("smax"))).over(w_o))
    )
    waiting = staged.where(
        (F.col("smax") == F.col("m1"))
        & (F.col("n_top") == 1)
        & (F.col("n_supp") >= 2)
        & (F.col("l_shipdate") > F.col("m2"))
    )
    return (
        waiting.join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("s_name")
        .agg(F.count("*").cast("bigint").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


mp("q21 current (window exchanges)", lambda: q21(False))
mp("q21 pre-repartition(okey)", lambda: q21(True))
a = q21(False).toPandas()
b = q21(True).toPandas()
print("equal:", a.equals(b))
import io, contextlib
buf = io.StringIO()
with contextlib.redirect_stdout(buf):
    q21(True).explain("formatted")
print("exchanges in pre-repart plan:", buf.getvalue().count("hashpartitioning(l_orderkey"))
