"""Sort / limit / top-k queries (SURVEY.md §2B "Sorts / limits / top-k").

Provenance: the reference's only ordering-adjacent op is the 10-row preview
(R5, /root/reference backend/index.js:92-103 — `sheetRows:10`, stop-after-11
lines, `SELECT TOP 10`). Spark plans ORDER BY + LIMIT as
TakeOrderedAndProject — per-partition top-k then a k-row merge on the driver,
never a full sort of the table (the scale path for any top-k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from omnidata_etl_spark.catalog import table
from omnidata_etl_spark.registry import query


@query(
    "order_multi_nulls",
    oracle="""
        SELECT o_orderkey, o_orderpriority, o_totalprice
        FROM orders
        ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey ASC
        LIMIT 100
    """,
    tags=("sort",),
)
def order_multi_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort + limit; o_orderkey tiebreak makes the 100-row set
    deterministic (oracle hash is order-insensitive but the *set* must match)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_orderpriority", "o_totalprice")
        .orderBy(
            F.asc("o_orderpriority"), F.desc("o_totalprice"), F.asc("o_orderkey")
        )
        .limit(100)
    )


@query(
    "limit_preview",
    oracle="""
        SELECT n_nationkey, n_name, n_regionkey FROM nation
        ORDER BY n_nationkey LIMIT 10
    """,
    tags=("sort", "limit"),
)
def limit_preview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's 10-row preview (R5) with a deterministic order."""
    n = table(spark, sf_dir, "nation")
    return n.orderBy("n_nationkey").limit(10)
