"""Window-function queries (SURVEY.md §2B "Window functions"). EXT provenance.

Determinism: every window ORDER BY ends in a unique key (c_custkey, event_id,
o_orderkey) so row_number/ntile/lag assignments are total-order-stable across
engines. Running sums use per-row DECIMAL casts (order-proof, _util doc).

Scale: a window partitioned by a high-cardinality key (user_id) shuffles once
on that key and sorts within partitions — the same cost shape as a groupBy;
no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from omnidata_etl_spark.catalog import table
from omnidata_etl_spark.queries._util import cents, dec2
from omnidata_etl_spark.registry import query


@query(
    "window_rank_topn",
    oracle="""
        SELECT c_mktsegment, c_custkey, c_name, c_acctbal, rnk FROM (
            SELECT c_mktsegment, c_custkey, c_name, c_acctbal,
                   row_number() OVER (PARTITION BY c_mktsegment
                                      ORDER BY c_acctbal DESC, c_custkey) AS rnk
            FROM customer
        ) WHERE rnk <= 3
    """,
    tags=("window",),
)
def window_rank_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by balance per segment, tie-broken by c_custkey."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        c.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("c_mktsegment", "c_custkey", "c_name", "c_acctbal", "rnk")
    )


@query(
    "window_lag_lead",
    oracle="""
        SELECT event_id, user_id, event_type,
               lag(event_type)  OVER w AS prev_type,
               lead(event_type) OVER w AS next_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("window",),
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@query(
    "window_running_sum",
    oracle="""
        SELECT event_id, user_id,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS DOUBLE) AS running_value
        FROM events
    """,
    tags=("window",),
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = (F.sum(cents("value")).over(w) / 100.0)
    return ev.select("event_id", "user_id", running.alias("running_value"))


@query(
    "window_moving_avg",
    oracle="""
        SELECT event_id, user_id,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
                   / COUNT(value) OVER w AS mov_avg
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    tags=("window",),
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row moving average as exact-cents-SUM/COUNT (deterministic; _util.cents)."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    mov = (F.sum(cents("value")).over(w) / 100.0) / F.count("value").over(w)
    return ev.select("event_id", "user_id", mov.alias("mov_avg"))


@query(
    "window_rank_metrics",
    oracle="""
        SELECT o_orderkey,
               percent_rank() OVER w AS pct_rank,
               cume_dist() OVER w AS cume,
               rank() OVER w AS rnk,
               dense_rank() OVER w AS drnk
        FROM orders
        WINDOW w AS (PARTITION BY o_orderstatus
                     ORDER BY o_totalprice, o_orderkey)
    """,
    tags=("window",),
)
def window_rank_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist / rank / dense_rank over a total order
    (o_orderkey tiebreak ⇒ both engines compute identical (r-1)/(n-1) and
    r/n doubles — same integer inputs, same division)."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@query(
    "window_range_frame",
    oracle="""
        SELECT o_orderkey, o_orderstatus,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                    PARTITION BY o_orderstatus ORDER BY o_orderkey
                    RANGE BETWEEN 100 PRECEDING AND CURRENT ROW)
                    AS DOUBLE) AS near_total
        FROM orders
    """,
    tags=("window", "range-frame"),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based (RANGE) frame: sum over orders whose key lies within 100
    of the current row's — frame membership driven by values, not row
    positions (both engines define RANGE identically over a numeric key)."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderstatus")
        .orderBy("o_orderkey")
        .rangeBetween(-100, Window.currentRow)
    )
    near = (F.sum(cents("o_totalprice")).over(w) / 100.0)
    return o.select("o_orderkey", "o_orderstatus", near.alias("near_total"))


@query(
    "window_ntile",
    oracle="""
        SELECT o_orderkey, o_orderstatus,
               ntile(4) OVER (PARTITION BY o_orderstatus
                              ORDER BY o_totalprice, o_orderkey) AS quartile
        FROM orders
    """,
    tags=("window",),
)
def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey", "o_orderstatus", F.ntile(4).over(w).alias("quartile")
    )


@query(
    "window_ignore_nulls",
    oracle="""
        SELECT event_id,
               LAST_VALUE(good_value IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS filled_value
        FROM (
            SELECT event_id, user_id, ts,
                   CASE WHEN event_type <> 'error' THEN value END AS good_value
            FROM events
        ) e
    """,
    tags=("window", "nulls"),
)
def window_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill via IGNORE NULLS: carry the last non-error reading forward
    per user (error rows contribute NULL and inherit the previous good
    value) — the standard sensor/telemetry forward-fill, one window pass,
    no self-join. Ordered by (ts, event_id) for a total order."""
    ev = table(spark, sf_dir, "events")
    good = F.when(F.col("event_type") != "error", F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        F.last(good, ignorenulls=True).over(w).alias("filled_value"),
    )


@query(
    "window_cume_dist_pctrank",
    oracle="""
        SELECT o_orderkey, o_orderstatus,
               cume_dist() OVER w AS cdist,
               percent_rank() OVER w AS prank
        FROM orders
        WINDOW w AS (PARTITION BY o_orderstatus
                     ORDER BY o_totalprice, o_orderkey)
    """,
    tags=("window",),
)
def window_cume_dist_pctrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-standing window pair: cume_dist (rows ≤ current / rows in
    partition) and percent_rank ((rank−1)/(n−1)) — the normalized-rank
    operators behind percentile badges and score normalization. Both are
    single integer÷integer double divisions, bit-identical across engines;
    the (o_totalprice, o_orderkey) tiebreak makes every rank unique so the
    hash is order-proof. One shuffle on the partition key."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.cume_dist().over(w).alias("cdist"),
        F.percent_rank().over(w).alias("prank"),
    )


@query(
    "window_rolling_distinct",
    oracle="""
        SELECT event_id, user_id,
               CAST(len(list_distinct(list(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 9 PRECEDING AND CURRENT ROW
               ))) AS INTEGER) AS distinct_types_10
        FROM events
    """,
    tags=("window",),
)
def window_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling distinct count over the last 10 events per user (behavioral
    diversity signal). Neither engine supports COUNT(DISTINCT) OVER a
    frame natively; both express it as collect-within-frame + distinct —
    Spark size(array_distinct(collect_list)), DuckDB
    len(list_distinct(list())). The frame bounds the state at 10 elements
    per row regardless of history length, so unlike a naive set-per-user
    this stays O(frame) at any scale; one user_id shuffle."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.size(F.array_distinct(F.collect_list("event_type").over(w))).alias(
            "distinct_types_10"
        ),
    )


@query(
    "window_share_of_total",
    oracle="""
        WITH g AS (
            SELECT o_orderstatus,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS s
            FROM orders GROUP BY o_orderstatus
        )
        SELECT o_orderstatus,
               CAST(s AS DOUBLE) AS status_total,
               CAST(s AS DOUBLE)
               / CAST(SUM(s) OVER () AS DOUBLE) AS share_of_total
        FROM g
    """,
    tags=("window", "agg"),
)
def window_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-total (the BI percent-of-whole op): per-status revenue
    over the grand total via an unpartitioned window over the ALREADY
    AGGREGATED frame — the one place a global window is legitimate
    (|statuses| rows, not |orders|; the same bounded-frame argument as
    daily_user_growth). Both numerator and denominator are exact decimal
    sums (the grand total re-aggregates the per-group decimals, so the
    division inputs — and hence the double quotient — are bit-identical
    across engines)."""
    o = table(spark, sf_dir, "orders")
    g = o.groupBy("o_orderstatus").agg(
        F.sum(dec2("o_totalprice")).alias("s")
    )
    w = Window.partitionBy()
    return g.select(
        "o_orderstatus",
        F.col("s").cast("double").alias("status_total"),
        (
            F.col("s").cast("double") / F.sum("s").over(w).cast("double")
        ).alias("share_of_total"),
    )
