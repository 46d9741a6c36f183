"""Subquery shapes (EXT provenance — SURVEY.md §2B extensions).

The reference has no subqueries of any kind (SURVEY.md §2A: the backend is
single-table preview/save; /root/reference backend/index.js has no SELECT
composition at all).  These queries cover the three classic decorrelation
shapes an analytics engine must plan well:

  * scalar aggregate subquery  -> one-row aggregate, broadcast to the probe
    side (no shuffle of the fact table; the scalar is computed once);
  * NOT IN (non-null rhs)      -> null-safe here by construction, planned as
    a broadcast left-anti join;
  * correlated EXISTS          -> decorrelated into a left-semi equi-join
    with the correlated predicate as a join conjunct (Catalyst does exactly
    this rewrite for SQL EXISTS; we express it directly).

Scale notes (100 TB design point): all three keep the big table shuffle-free
— the scalar and the NOT-IN list broadcast, and the EXISTS semi-join shuffles
on the equi-key only (AQE picks sort-merge when both sides are facts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from omnidata_etl_spark.catalog import table
from omnidata_etl_spark.queries._util import csum
from omnidata_etl_spark.registry import query


@query(
    "subquery_scalar_avg",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_totalprice >
              (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                      / COUNT(*)
               FROM orders)
    """,
    tags=("subquery", "agg"),
)
def subquery_scalar_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders priced above the global average (scalar aggregate subquery).

    The average is an exact decimal SUM divided by COUNT in double — the
    same bits on both engines regardless of summation order — then
    broadcast-joined to the probe side (single-row build, no fact shuffle).
    """
    o = table(spark, sf_dir, "orders")
    avg_price = o.agg(
        (csum("o_totalprice") / F.count(F.lit(1))).alias(
            "avg_price"
        )
    )
    return (
        o.join(F.broadcast(avg_price))
        .where(F.col("o_totalprice") > F.col("avg_price"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "subquery_not_in",
    oracle="""
        SELECT c_custkey, c_name, c_nationkey
        FROM customer
        WHERE c_nationkey NOT IN
              (SELECT s_nationkey FROM supplier WHERE s_acctbal < 0)
    """,
    tags=("subquery", "join"),
)
def subquery_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers in nations with no negative-balance supplier (NOT IN).

    Both columns are non-null by construction, so NOT IN coincides with a
    left-anti join against the distinct (tiny) rhs, which broadcasts.  (With
    a nullable rhs SQL NOT IN returns no rows if any rhs value is NULL; that
    three-valued case is covered by `filter_null_semantics`.)
    """
    c = table(spark, sf_dir, "customer")
    s = (
        table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_nationkey")
        .distinct()
    )
    return c.join(
        F.broadcast(s), c.c_nationkey == s.s_nationkey, "left_anti"
    ).select("c_custkey", "c_name", "c_nationkey")


@query(
    "subquery_exists_correlated",
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
    """,
    tags=("subquery", "tpch", "agg"),
)
def subquery_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders with at least one line shipped after the order
    date, counted per priority (correlated EXISTS).

    Decorrelated one step past Catalyst's semi-join rewrite: EXISTS(line
    with l_shipdate > o_orderdate) ⟺ MAX(l_shipdate) > o_orderdate, so
    lineitem pre-aggregates to one (l_orderkey, max_ship) row per order
    BELOW the join (map-side partial MAX — the shuffle carries per-order
    rows, ~4× fewer than per-line, and the join emits each order at most
    once because the build key is now unique). Same shuffle count as the
    semi-join form, strictly less shuffle mass — the reduction that
    matters when lineitem is the 100 TB fact.
    """
    o = table(spark, sf_dir, "orders")
    last_ship = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("max_ship"))
    )
    return (
        o.join(
            last_ship,
            (o.o_orderkey == last_ship.l_orderkey)
            & (last_ship.max_ship > o.o_orderdate),
            "inner",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "subquery_lateral_topn",
    oracle="""
        SELECT n.n_name, t.c_custkey, t.c_acctbal
        FROM nation n,
        LATERAL (
            SELECT c_custkey, c_acctbal FROM customer c
            WHERE c.c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_custkey
            LIMIT 2
        ) t
    """,
    tags=("subquery", "lateral"),
)
def subquery_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: each nation's two richest customers.
    Catalyst decorrelates the lateral top-1-per-group into a DomainJoin →
    window/limit per key — the same physical work as window_rank_topn, but
    exercising the planner's lateral-subquery path (an optimizer feature a
    reference user migrating SQL will hit). Tie-broken by c_custkey."""
    table(spark, sf_dir, "nation").createOrReplaceTempView("v_nation")
    table(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    return spark.sql("""
        SELECT n.n_name, t.c_custkey, t.c_acctbal
        FROM v_nation n,
        LATERAL (
            SELECT c_custkey, c_acctbal FROM v_customer c
            WHERE c.c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_custkey
            LIMIT 2
        ) t
    """)


@query(
    "sql_api_cte_topn",
    oracle="""
        WITH seg_rev AS (
            SELECT c_mktsegment,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                       AS seg_total,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM customer JOIN orders ON c_custkey = o_custkey
            GROUP BY c_mktsegment
        )
        SELECT c_mktsegment, seg_total, n_orders
        FROM seg_rev
        ORDER BY seg_total DESC, c_mktsegment
        LIMIT 3
    """,
    tags=("sql-api", "join", "agg"),
)
def sql_api_cte_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The spark.sql entry point as first-class surface: the identical CTE
    text a reference user would bring runs over the registered catalog
    views unchanged (register_views) — Catalyst plans SQL text and the
    DataFrame API into the same logical plans, so everything the plan
    suite pins (pushdown, broadcast, partial agg) holds for SQL users
    too. Oracle is the same text modulo view names."""
    from omnidata_etl_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql("""
        WITH seg_rev AS (
            SELECT c_mktsegment,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                       AS seg_total,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM customer JOIN orders ON c_custkey = o_custkey
            GROUP BY c_mktsegment
        )
        SELECT c_mktsegment, seg_total, n_orders
        FROM seg_rev
        ORDER BY seg_total DESC, c_mktsegment
        LIMIT 3
    """)


@query(
    "subquery_select_scalar_correlated",
    oracle="""
        SELECT o_orderkey,
               (SELECT COUNT(*) FROM lineitem
                WHERE l_orderkey = o_orderkey) AS n_lines,
               (SELECT CAST(MAX(CAST(l_extendedprice AS DECIMAL(18,2)))
                            AS DOUBLE)
                FROM lineitem WHERE l_orderkey = o_orderkey) AS max_line
        FROM orders
        WHERE o_orderkey < 500
    """,
    tags=("subquery", "correlated"),
)
def subquery_select_scalar_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries in the SELECT list — the last canonical
    subquery position (WHERE-scalar, NOT IN, EXISTS, and LATERAL are the
    other declared shapes). Catalyst decorrelates both subqueries into
    left outer aggregate joins on the correlation key; the COUNT form
    exercises the COUNT-bug handling (an order with no lines must read 0,
    not NULL — the decorrelation inserts the coalesce), MAX stays NULL.
    Expressed as SQL text so the decorrelation itself is what's exercised;
    one lineitem scan per subquery is the cost model Catalyst chooses at
    this shape (a manual rewrite would share one scan — the declared op
    keeps the canonical form)."""
    from omnidata_etl_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey,
               (SELECT COUNT(*) FROM lineitem
                WHERE l_orderkey = o_orderkey) AS n_lines,
               (SELECT CAST(MAX(CAST(l_extendedprice AS DECIMAL(18,2)))
                            AS DOUBLE)
                FROM lineitem WHERE l_orderkey = o_orderkey) AS max_line
        FROM orders
        WHERE o_orderkey < 500
        """
    )
