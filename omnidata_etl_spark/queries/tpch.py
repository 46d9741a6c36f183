"""Classic TPC-H-shaped analytics queries (EXT provenance — the standard
relational workload a reference user would bring to the engine).

All follow the determinism discipline: decimal money arithmetic from raw 2dp
columns, aliased aggregates, unique-key tiebreaks on top-k (SURVEY.md §2B).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from omnidata_etl_spark.catalog import table
from omnidata_etl_spark.queries._util import cents, crevsum, rev_units
from omnidata_etl_spark.registry import query


@query(
    "tpch_q3_shipping_priority",
    oracle="""
        SELECT l_orderkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2))))
                    AS DOUBLE) AS revenue,
               o_orderdate, o_orderpriority
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND l_shipdate > TIMESTAMP '1998-01-01'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    tags=("tpch", "join", "agg"),
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered 3-way join, revenue per order,
    top-10 (tie-broken by l_orderkey). The date constants are adapted to
    the synthetic data's ranges; o_orderdate is the TIMESTAMP the parquet
    carries.

    Plan (r6 rewrite — was customer⋈orders⋈lineitem left-to-right at
    3.9×): the l_shipdate predicate keeps only the latest shippers, so
    revenue pre-aggregates per order from that sliver BELOW the join
    (map-side partial SUM on the int64 unit path; exact because the other
    group keys are functionally dependent on l_orderkey). Orders
    semi-reduce by the BUILDING customer keys — a key-only projection, so
    the join carries 8 bytes per customer, and the semi output drops
    o_custkey before the fact join. Both reductions shrink linearly with
    their filters at any SF; no forced broadcasts (customer and the
    filtered facts all grow with SF — AQE picks the build side from
    runtime sizes)."""
    c_keys = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    o_red = o.join(
        c_keys, o.o_custkey == c_keys.c_custkey, "left_semi"
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    rev = li.groupBy("l_orderkey").agg(
        F.sum(rev_units()).alias("_rev_units")
    )
    return (
        rev.join(o_red, rev.l_orderkey == o_red.o_orderkey)
        .select(
            "l_orderkey",
            (F.col("_rev_units") / 10000.0).alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "tpch_q10_returned_items",
    oracle="""
        SELECT c_custkey, c_name,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2))))
                    AS DOUBLE) AS revenue,
               c_acctbal, n_name
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    tags=("tpch", "join", "agg"),
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: customers ranked by revenue of returned items.

    Plan (r5, the q5-style reduction): the returnflag-filtered lineitem
    joins ONLY the two-column orders projection and the revenue is fully
    aggregated per o_custkey BEFORE customer enters — every grouping
    column besides the sum is functionally dependent on c_custkey, so
    pre-agg-below-the-join is semantics-preserving (each order has one
    customer; int64-cents sums are associative). The wide customer row
    (name/acctbal) and the broadcast nation then decorate one row per
    customer instead of riding through the fact join and the big groupBy —
    at 100 TB the shuffle carries (custkey, cents) pairs, not customer
    payloads. Top-20 tie-broken by c_custkey."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    rev_per_cust = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(crevsum().alias("revenue"))
    )
    return (
        rev_per_cust.join(c, rev_per_cust.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "fn_string_distance",
    oracle="""
        SELECT p_partkey,
               levenshtein(p_brand, 'Brand#11') AS brand_dist,
               CAST(starts_with(p_type, 'SMALL') AS BOOLEAN) AS is_small
        FROM part
    """,
    tags=("scalar", "fuzzy"),
)
def fn_string_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance + prefix predicates (fuzzy-matching primitives for
    entity resolution pipelines)."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.levenshtein(F.col("p_brand"), F.lit("Brand#11")).alias("brand_dist"),
        F.col("p_type").startswith("SMALL").alias("is_small"),
    )


@query("agg_approx_percentile", tags=("agg", "approx"))
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based percentiles — the one-pass 100 TB path for quantiles
    (exact `agg_percentiles` shuffles group values). Rows-only: sketch
    algorithms are engine-specific (like agg_approx_distinct)."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("median_approx"),
        F.percentile_approx("o_totalprice", 0.9, 10000).alias("p90_approx"),
    )


@query(
    "tpch_q5_local_supplier",
    oracle="""
        SELECT n_name,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2))))
                    AS DOUBLE) AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY n_name
    """,
    tags=("tpch", "join", "agg"),
)
def tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue by nation where the supplier is local to the
    customer (the c_nationkey = s_nationkey conjunct makes the supplier join
    semantically load-bearing, not just a star lookup).

    Plan: the broadcast ASIA supplier/nation/region dim joins lineitem FIRST
    — a map-side semi-reduction that drops ~4/5 of the fact before anything
    shuffles (only ASIA-supplier lineitems survive). The previous
    formulation joined customer⋈orders⋈lineitem first, and the planner
    chose the column-pruned 600k-row lineitem as a BROADCAST build side
    (4 of 16 columns deflate the size estimate under the 20 MB threshold)
    — the broadcast-a-fact antipattern sneaking back in via projection
    pruning, a single-threaded 600k hash build locally and an OOM at
    cluster scale. Dim-first is both faster (A/B min-of-5 interleaved:
    501 ms vs 598 ms at sf0.1) and the plan that survives 100 TB: facts
    shuffle only after dim pruning, dims broadcast, the residual
    lineitem⋈(customer⋈orders) equi-join carries both the orderkey and
    nationkey conjuncts so AQE can pick broadcast vs sort-merge from the
    runtime size of the reduced sides."""
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = table(spark, sf_dir, "nation")
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    dims = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    li_asia = li.join(F.broadcast(dims), li.l_suppkey == dims.s_suppkey)
    co = c.join(o, c.c_custkey == o.o_custkey).select(
        "o_orderkey", "c_nationkey"
    )
    return (
        li_asia.join(
            co,
            (li_asia.l_orderkey == co.o_orderkey)
            & (li_asia.s_nationkey == co.c_nationkey),
        )
        .groupBy("n_name")
        .agg(crevsum().alias("revenue"))
    )


@query(
    "tpch_q6_forecast_revenue",
    oracle="""
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(l_discount AS DECIMAL(18,2)))
                    AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    tags=("tpch", "agg", "filter"),
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate, the pushdown benchmark.
    All four predicates reach the parquet reader (PushedFilters); the global
    sum is a two-phase partial/final with no groupBy shuffle at all."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (F.sum(cents("l_extendedprice") * cents("l_discount")) / 10000.0)
            .alias("revenue")
        )
    )


@query(
    "tpch_q14_promo_revenue",
    oracle="""
        SELECT CAST(100.0 AS DOUBLE)
               * CAST(SUM(CASE WHEN p_type = 'PROMO'
                               THEN CAST(l_extendedprice AS DECIMAL(18,2))
                                    * (1 - CAST(l_discount AS DECIMAL(18,2)))
                          END) AS DOUBLE)
               / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,2))))
                      AS DOUBLE) AS promo_revenue
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-03-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
    """,
    tags=("tpch", "join", "agg"),
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share for one month.  The conditional
    SUM has no ELSE (NULL outside the promo branch) so both engines skip the
    same rows; both sums are exact decimals and the ratio is one double
    division.  `part` broadcasts — the month of lineitem never shuffles."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    return joined.agg(
        (
            F.lit(100.0).cast("double")
            * (F.sum(F.when(F.col("p_type") == "PROMO", rev_units())) / 10000.0)
            / (F.sum(rev_units()) / 10000.0)
        ).alias("promo_revenue")
    )


@query(
    "tpch_q18_large_orders",
    oracle="""
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
               SUM(l_quantity) AS sum_qty
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                             GROUP BY l_orderkey
                             HAVING SUM(l_quantity) > 250)
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 20
    """,
    tags=("tpch", "subquery", "join", "agg"),
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders (IN over a grouped-HAVING
    subquery), top-20 by price.  l_quantity values are small integers, so
    the double SUM is exact and order-independent on both engines.

    Plan (round 3, final form): every output column is ORDER-level, so no
    line rows need to survive at all — the query is one plain aggregation:
    groupBy(l_orderkey) sum → HAVING filter → join the order/customer dims
    → top-20. Map-side partial aggregation collapses ~4 lines/order before
    the one orderkey exchange. This strictly dominates both earlier forms:
    the IN-subquery decorrelation (two fact scans + two fact shuffles) and
    a SUM-OVER-(PARTITION BY l_orderkey) window pass (one shuffle but a
    full SORT of every fact row — no partial aggregation; measured 0.72s
    vs 0.50s at sf0.1, and the gap is the sort's n·log n at 100 TB).
    Top-20 is TakeOrderedAndProject with the o_orderkey tiebreak.

    The big↔orders join is MERGE-hinted (r10): ``big`` is fact-DERIVED —
    it grows linearly with lineitem — so letting AQE broadcast it
    whenever a particular scale factor happens to sit under the
    threshold is the estimate-undershoot hazard the other fact-fact
    joins already hint against. Caught by the r10 ×10 oracle sweep: in a
    memory-pressured long-lived session (default 1g driver heap holding
    the dedup family's persisted frames), AQE chose to broadcast the
    ×10 ``big`` (~600k rows) and died with
    notEnoughMemoryToBuildAndBroadcastTableError; at 100 TB ``big`` is
    billions of rows and a broadcast is never right. The orderkey
    exchange from the aggregation is reused by the SMJ, so the hint
    costs one sort of the pre-shuffled side, not a new fact shuffle
    (sf0.1 driver-regime A/B below)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 250)
        .hint("merge")
    )
    return (
        big.join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )
