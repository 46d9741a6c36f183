"""Set-operation queries (SURVEY.md §2B "Set operations"). EXT provenance.

Both sides are aliased to the same column name (`nationkey`) so the driver's
name-sorted hash lines up. Spark's `intersect`/`exceptAll→except` are the
SQL-distinct variants, matching DuckDB INTERSECT/EXCEPT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from omnidata_etl_spark.catalog import table
from omnidata_etl_spark.registry import query


def _cust_keys(spark, sf_dir) -> DataFrame:
    return table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )


def _supp_keys(spark, sf_dir) -> DataFrame:
    return table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )


@query(
    "set_union_all",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        UNION ALL
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop",),
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_keys(spark, sf_dir).unionAll(_supp_keys(spark, sf_dir))


@query(
    "set_union_distinct",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop",),
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _cust_keys(spark, sf_dir).union(_supp_keys(spark, sf_dir)).distinct()
    )


@query(
    "set_intersect",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop",),
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_keys(spark, sf_dir).intersect(_supp_keys(spark, sf_dir))


@query(
    "set_intersect_all",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT ALL
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop",),
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset intersection: each value kept min(left count, right count)
    times."""
    return _cust_keys(spark, sf_dir).intersectAll(_supp_keys(spark, sf_dir))


@query(
    "set_except_all",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT ALL
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop",),
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference: left multiplicities reduced by right's."""
    return _cust_keys(spark, sf_dir).exceptAll(_supp_keys(spark, sf_dir))


@query(
    "set_except",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT
        SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 8000
    """,
    tags=("setop",),
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    # subtract == EXCEPT DISTINCT (exceptAll().distinct() would wrongly keep
    # values whose left multiplicity merely exceeds the right's).
    # The right side is restricted to high-balance suppliers: unrestricted,
    # suppliers cover every nation and the difference is vacuously empty.
    supp = (
        table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") > 8000)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    return _cust_keys(spark, sf_dir).subtract(supp)


@query(
    "set_union_by_name",
    oracle="""
        SELECT o_orderkey, o_orderpriority, o_totalprice
        FROM (
            SELECT o_orderkey, o_orderpriority,
                   NULL::DOUBLE AS o_totalprice
            FROM orders WHERE o_orderstatus = 'F'
            UNION ALL BY NAME
            SELECT o_totalprice, o_orderkey,
                   NULL::VARCHAR AS o_orderpriority
            FROM orders WHERE o_orderstatus = 'O'
        ) u
    """,
    tags=("setop", "schema"),
)
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Name-based union across mismatched schemas
    (``unionByName(allowMissingColumns=True)``) — the in-memory analog of
    parquet schema evolution: two generations of the same feed with
    different column sets (and different column ORDER — name resolution,
    not position) append into one frame with NULL backfill. The positional
    ``UNION ALL`` would mis-align or reject these inputs; the declared op
    pins the name-resolved semantics against DuckDB's UNION ALL BY NAME."""
    o = table(spark, sf_dir, "orders")
    v1 = o.where(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderpriority"
    )
    v2 = o.where(F.col("o_orderstatus") == "O").select(
        "o_totalprice", "o_orderkey"
    )
    return v1.unionByName(v2, allowMissingColumns=True).select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
