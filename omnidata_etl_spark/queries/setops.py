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
