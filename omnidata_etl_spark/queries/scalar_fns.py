"""Scalar-function queries (SURVEY.md §2B "Scalar functions").

Provenance: string cleaning generalizes the reference's cell cleaner (R8,
/root/reference backend/index.js:111,:115); empty-string→null conditional is
R10 (:117 vs :223); JSON extraction is the JSONB type + stringify-at-insert
path (R11, backend/index.js:56,:258). Date/math/array are EXT.

All expressions are built-in `pyspark.sql.functions` — JVM-side, inside
whole-stage codegen; no Python UDFs (SURVEY.md §2B UDF note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from omnidata_etl_spark.catalog import table
from omnidata_etl_spark.queries._util import spread
from omnidata_etl_spark.registry import query


@query(
    "fn_string",
    oracle="""
        SELECT p_partkey,
               UPPER(p_brand) AS brand_upper,
               SUBSTRING(p_type, 1, 5) AS type_prefix,
               REPLACE(p_name, ' ', '_') AS name_snake,
               LENGTH(p_name) AS name_len,
               CONCAT_WS('::', p_brand, p_type) AS brand_type
        FROM part
    """,
    tags=("scalar",),
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("::", "p_brand", "p_type").alias("brand_type"),
    )


@query(
    "fn_date",
    oracle="""
        SELECT o_orderkey,
               YEAR(o_orderdate) AS order_year,
               MONTH(o_orderdate) AS order_month,
               DATE_TRUNC('month', o_orderdate) AS order_month_start,
               DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '1998-01-01')
                   AS days_to_ref
        FROM orders
    """,
    tags=("scalar",),
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date parts + truncation + day difference to a fixed reference date.

    Arg-order note: DuckDB datediff('day', start, end) == Spark
    datediff(end, start) — both end minus start.
    """
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.date_trunc("month", F.col("o_orderdate")).alias("order_month_start"),
        F.datediff(
            F.to_date(F.lit("1998-01-01")), F.col("o_orderdate").cast("date")
        ).alias("days_to_ref"),
    )


@query(
    "fn_math",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))
                    * (1 + CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE) AS charge,
               ABS(l_discount - 0.05) AS disc_dev,
               l_orderkey % 7 AS key_mod,
               l_orderkey // 3 AS key_div
        FROM lineitem
    """,
    tags=("scalar",),
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic. The charge expression runs in exact DECIMAL (the raw
    columns are 2dp-exact) and converts to double once — per-row ROUND of a
    computed double is not portable across engines (see _util docs)."""
    from omnidata_etl_spark.queries._util import dec2

    li = table(spark, sf_dir, "lineitem")
    charge = (
        dec2("l_extendedprice")
        * (1 - dec2("l_discount"))
        * (1 + dec2("l_tax"))
    ).cast("double")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        charge.alias("charge"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.expr("l_orderkey div 3").alias("key_div"),
    )


@query(
    "fn_conditional",
    oracle="""
        SELECT o_orderkey,
               CASE WHEN o_totalprice < 50000  THEN 'low'
                    WHEN o_totalprice < 150000 THEN 'mid'
                    ELSE 'high' END AS price_band,
               COALESCE(NULLIF(o_orderstatus, ''), 'UNKNOWN') AS status_norm
        FROM orders
    """,
    tags=("scalar",),
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE bands + the reference's empty-string→null normalization (R10)."""
    o = table(spark, sf_dir, "orders")
    band = (
        F.when(F.col("o_totalprice") < 50000, "low")
        .when(F.col("o_totalprice") < 150000, "mid")
        .otherwise("high")
    )
    status = F.coalesce(
        F.nullif(F.col("o_orderstatus"), F.lit("")), F.lit("UNKNOWN")
    )
    return o.select(
        "o_orderkey", band.alias("price_band"), status.alias("status_norm")
    )


@query(
    "fn_json_extract",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
        FROM events WHERE props IS NOT NULL
    """,
    tags=("scalar", "json"),
)
def fn_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-string column accessor — the engine's JSONB story (R11): JSON
    rides as a string column (reference stringifies objects at insert,
    /root/reference backend/index.js:258) and is unpacked by expression."""
    ev = spread(table(spark, sf_dir, "events"))
    return (
        ev.filter(F.col("props").isNotNull())
        .select(
            "event_id",
            F.get_json_object("props", "$.k").cast("int").alias("k_val"),
        )
    )


@query(
    "fn_json_struct",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
               json_extract_string(props, '$.missing') AS missing_val,
               CAST(json_valid(props) AS BOOLEAN) AS is_valid
        FROM events WHERE props IS NOT NULL
    """,
    tags=("scalar", "json"),
)
def fn_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-directed JSON unpacking: from_json into a typed struct (the
    engine's JSONB accessor for known shapes — one parse, many fields),
    plus missing-key null semantics and validity probing."""
    ev = spread(table(spark, sf_dir, "events"))
    parsed = F.from_json(
        F.col("props"), "struct<k:int, missing:string>"
    )
    return ev.filter(F.col("props").isNotNull()).select(
        "event_id",
        parsed.getField("k").alias("k_val"),
        parsed.getField("missing").alias("missing_val"),
        F.get_json_object("props", "$").isNotNull().alias("is_valid"),
    )


@query(
    "fn_array",
    oracle="""
        SELECT vec_id,
               len(embedding) AS dim,
               CAST(embedding[1] AS DOUBLE) AS first_val
        FROM embeddings
    """,
    tags=("scalar", "array"),
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-column accessors (element_at is 1-indexed in both engines)."""
    e = table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_val"),
    )


@query(
    "fn_array_higher_order",
    oracle="""
        SELECT vec_id,
               len(list_filter(embedding, x -> x > 0)) AS n_positive,
               CAST(list_max(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
                    AS DOUBLE) AS max_sq,
               len(list_filter(embedding, x -> x > 2.0)) > 0 AS has_large
        FROM embeddings
    """,
    tags=("scalar", "array", "lambda"),
)
def fn_array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions (lambda transform/filter/exists) — the
    JVM-side way to compute over embedding vectors without a UDF.

    Each float element is cast to double *before* arithmetic so both engines
    do the identical IEEE double multiply; max is order-independent.  These
    stay inside whole-stage codegen — no Python, no shuffle, scan-only."""
    e = table(spark, sf_dir, "embeddings")
    sq = F.transform(
        "embedding", lambda x: x.cast("double") * x.cast("double")
    )
    return e.select(
        "vec_id",
        F.size(F.filter("embedding", lambda x: x > F.lit(0.0))).alias(
            "n_positive"
        ),
        F.array_max(sq).cast("double").alias("max_sq"),
        F.exists("embedding", lambda x: x > F.lit(2.0)).alias("has_large"),
    )


@query(
    "fn_try_cast",
    oracle="""
        SELECT event_id,
               TRY_CAST(event_type AS DOUBLE) AS bad_num,
               TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int
        FROM events
    """,
    tags=("scalar", "cast"),
)
def fn_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permissive casting: TRY_CAST yields NULL on malformed input instead
    of aborting — the per-expression escape hatch from the engine's global
    ANSI strict-cast mode (reference rollback semantics, SURVEY.md §1.2).
    Strict by default, permissive where declared."""
    ev = spread(table(spark, sf_dir, "events"))
    return ev.select(
        "event_id",
        F.expr("try_cast(event_type AS DOUBLE)").alias("bad_num"),
        F.expr(
            "try_cast(get_json_object(props, '$.k') AS INT)"
        ).alias("k_int"),
    )


@query(
    "fn_json_variant",
    oracle="""
        SELECT event_id,
               TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int
        FROM events
    """,
    tags=("scalar", "json", "variant"),
)
def fn_json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access via VariantType (Spark 4): parse the JSON
    string once into the binary variant encoding, then typed-path extract.
    Same result as `fn_json_extract`'s per-access string parse, but the
    variant parse happens once per row and every subsequent `variant_get`
    is a binary walk — the scale answer for wide JSON with many accessed
    keys (open schemas where from_json's fixed struct can't be declared)."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.variant_get(F.parse_json("props"), "$.k", "int").alias("k_int"),
    )


@query(
    "fn_bitwise",
    oracle="""
        SELECT o_orderkey,
               o_orderkey & 255 AS low_byte,
               o_orderkey | 4096 AS with_flag,
               xor(o_orderkey, 1365) AS toggled,
               o_orderkey << 2 AS shifted_up,
               o_orderkey >> 3 AS shifted_down,
               CAST(bit_count(o_orderkey) AS INTEGER) AS popcount
        FROM orders
        WHERE o_orderkey < 1000
    """,
    tags=("scalar", "bitwise"),
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar functions — AND/OR/XOR masks, shifts, and popcount
    (the primitives the engine's own simhash lane packing and z-order
    interleaving are built from, exposed as a declared scalar surface).
    Integer-exact on both engines by definition; bounded by the key filter
    so the demo output stays small."""
    o = table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 1000)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.lit(1365)).alias("toggled"),
        F.shiftleft(k, 2).alias("shifted_up"),
        F.shiftright(k, 3).alias("shifted_down"),
        F.bit_count(k).cast("int").alias("popcount"),
    )
