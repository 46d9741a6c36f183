"""Projection / filter / predicate / cleaning queries (SURVEY.md §2B).

Provenance: projection = reference column selection (R6, /root/reference
backend/index.js:167,:223); casts = user-directed type mapping (R7,
backend/index.js:35-59); cell cleaning = trim/quote/pipe strip (R8,
backend/index.js:111,:115,:221); empty→null normalization (R10,
backend/index.js:117 vs :223); surrogate key (R12, backend/index.js:174-182).
All are Catalyst expressions — filters and projections push into the parquet
scan (verified in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from omnidata_etl_spark.catalog import table
from omnidata_etl_spark.registry import query


@query(
    "project_columns",
    oracle="SELECT c_custkey, c_name, c_mktsegment FROM customer",
    tags=("projection",),
)
def project_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column selection (R6): only chosen columns survive to the sink."""
    return table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "filter_numeric",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
        FROM lineitem
        WHERE l_quantity > 30 AND l_discount BETWEEN 0.05 AND 0.07
    """,
    tags=("filter",),
)
def filter_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") > 30) & F.col("l_discount").between(0.05, 0.07)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount")


@query(
    "filter_string_like",
    oracle="""
        SELECT p_partkey, p_name, p_type FROM part WHERE p_type LIKE '%AND%'
    """,
    tags=("filter",),
)
def filter_string_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE filter (SURVEY §2B's canonical '%BRASS%' matches nothing in the
    synthetic p_type vocabulary — '%AND%' hits STANDARD, keeping the check
    non-vacuous while exercising the same contains-pattern pushdown)."""
    return (
        table(spark, sf_dir, "part")
        .filter(F.col("p_type").like("%AND%"))
        .select("p_partkey", "p_name", "p_type")
    )


@query(
    "filter_null_semantics",
    oracle="SELECT event_id, props FROM events WHERE props IS NOT NULL",
    tags=("filter",),
)
def filter_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL handling (R10 normalization: the save path's null is canonical)."""
    return (
        table(spark, sf_dir, "events")
        .filter(F.col("props").isNotNull())
        .select("event_id", "props")
    )


@query(
    "distinct_rows",
    oracle="SELECT DISTINCT c_mktsegment FROM customer",
    tags=("projection",),
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "customer").select("c_mktsegment").distinct()


@query(
    "cast_typed_load",
    oracle="""
        SELECT event_id,
               CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS value_dec,
               CAST(CAST(ts AS DATE) AS VARCHAR) AS ts_date
        FROM events
    """,
    tags=("cast",),
)
def cast_typed_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-directed type mapping (R7) under ANSI (strict) cast semantics.

    DECIMAL default precision/scale (18,2) mirrors the reference UI default
    (/root/reference frontend/src/App.jsx:18). The decimal/date casts stay
    internal (proving the ANSI mapping); the final projection emits DOUBLE
    and ISO-date VARCHAR because the driver's value hash does not
    canonicalize pandas Decimal-vs-float64 or date-vs-datetime64 (the one
    red row of CORRECTNESS_r01 with bit-identical values).
    """
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.col("value").cast("decimal(18,2)").cast("double").alias("value_dec"),
        F.col("ts").cast("date").cast("string").alias("ts_date"),
    )


@query(
    "clean_cells",
    oracle=r"""
        SELECT doc_id,
               regexp_replace(
                   regexp_replace(trim(text), '^"|"$', '', 'g'),
                   '^\||\|$', '', 'g') AS text_clean
        FROM documents
    """,
    tags=("clean",),
)
def clean_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference cell cleaner (R8) as expressions: trim, strip surrounding
    quotes, strip surrounding pipes (/root/reference backend/index.js:111,
    :115, :221). Spark regexp_replace is replace-all; DuckDB needs 'g'."""
    docs = table(spark, sf_dir, "documents")
    cleaned = F.regexp_replace(
        F.regexp_replace(F.trim(F.col("text")), '^"|"$', ""),
        r"^\||\|$",
        "",
    )
    return docs.select("doc_id", cleaned.alias("text_clean"))


@query(
    "surrogate_key",
    oracle="""
        SELECT r_regionkey, r_name,
               row_number() OVER (ORDER BY r_regionkey) AS id
        FROM region
    """,
    tags=("projection",),
)
def surrogate_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surrogate key (R12): deterministic row_number over an explicit order —
    never monotonically_increasing_id (partition-dependent, would not
    hash-match any oracle). Reference injects `id SERIAL` iff no `id` column
    (/root/reference backend/index.js:174-182)."""
    w = Window.orderBy("r_regionkey")
    return (
        table(spark, sf_dir, "region")
        .withColumn("id", F.row_number().over(w))
        .select("r_regionkey", "r_name", "id")
    )
