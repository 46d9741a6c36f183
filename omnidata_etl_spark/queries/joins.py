"""Join queries (SURVEY.md §2B "Joins"). All EXT provenance — the reference
has no joins of any kind (SURVEY.md §2A, "Explicitly absent").

Scale notes (100 TB design point):
  * Dimension joins (nation, region) are explicitly broadcast — no shuffle of
    the fact side on a 5/25-row dim.
  * Fact-fact joins (lineitem ⋈ orders) are left to Catalyst: at scale AQE
    picks sort-merge with skew splitting; the equi-keys shuffle-partition both
    sides on the join key exactly once.
  * The star query joins facts first (orderkey → custkey), then broadcasts
    the dim chain, so lineitem is shuffled at most twice and the dims never
    shuffle anything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from omnidata_etl_spark.catalog import table
from omnidata_etl_spark.queries._util import crevsum, dec2, rev_units
from omnidata_etl_spark.registry import query


@query(
    "join_inner_equi",
    oracle="""
        SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
        FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    """,
    tags=("join",),
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "inner").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@query(
    "join_left_outer",
    oracle="""
        SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    """,
    tags=("join",),
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@query(
    "join_full_outer",
    oracle="""
        SELECT s.s_suppkey, s.s_name, c.c_custkey, c.c_name,
               COALESCE(s.s_nationkey, c.c_nationkey) AS nationkey
        FROM supplier s FULL JOIN customer c ON s.s_nationkey = c.c_nationkey
    """,
    tags=("join",),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    return s.join(c, s.s_nationkey == c.c_nationkey, "full").select(
        "s_suppkey",
        "s_name",
        "c_custkey",
        "c_name",
        F.coalesce(s.s_nationkey, c.c_nationkey).alias("nationkey"),
    )


@query(
    "join_semi",
    oracle="""
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("join",),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers having ≥1 order. left_semi never duplicates the left side."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_anti",
    oracle="""
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderpriority = '1-URGENT')
    """,
    tags=("join",),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join: customers with no URGENT order. (Every synthetic customer
    has SOME order, so the plain no-orders anti join would be vacuously
    empty — the priority filter keeps the check non-trivial.)"""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_broadcast_dims",
    oracle="""
        SELECT n.n_nationkey, n.n_name, r.r_name
        FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
    tags=("join",),
)
def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tiny-dimension join with an explicit broadcast hint: zero shuffle."""
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return n.join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey, "inner"
    ).select("n_nationkey", "n_name", "r_name")


@query(
    "join_multiway_star",
    oracle="""
        SELECT r_name,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2))))
                    AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    tags=("join", "agg", "flagship"),
)
def join_multiway_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: revenue per region over the 5-way star (SURVEY.md §7.1 M1).

    Fact-fact joins shuffle once per key; nation/region broadcast. Revenue is
    summed as exact int64 1e-4 units per row (_util.cents) so the result is
    summation-order-proof and stays on the codegen primitive path.
    """
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(crevsum().alias("revenue"))
    )


@query(
    "join_theta_range",
    oracle="""
        SELECT o_orderkey, l_linenumber, l_quantity, l_extendedprice
        FROM orders JOIN lineitem
          ON o_orderkey = l_orderkey AND l_shipdate > o_orderdate
    """,
    tags=("join",),
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-key + non-equi conjunct: the equi part still drives the shuffle
    partitioning; the range predicate is evaluated post-match (no cartesian)."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    return o.join(
        li,
        (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        "inner",
    ).select("o_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    *,
    key: str,
    probe_ts: str,
    build_ts: str,
    values: list[str],
    tiebreak: list[str] | None = None,
    strict: bool = False,
) -> DataFrame:
    """Generic distributed as-of join: every probe row gains the `values`
    columns of the latest build row with build_ts <= probe_ts (or < when
    ``strict``) for the same ``key``; no match → NULLs (LEFT semantics).

    The linear union+window emulation (one shuffle on the key, parallel
    per-key sorts, no per-row probe join — the 100 TB shape; Spark has no
    native ASOF JOIN operator): tag both sides into one keyed stream,
    sort within key by (ts, side, tiebreak) and carry the last-seen build
    values forward with last(ignorenulls). Non-strict sorts build rows
    BEFORE probe rows at equal ts (same-instant builds visible); strict
    flips the side order. Among build rows tied on (key, ts), the max of
    ``tiebreak`` wins (pass the build's unique id for a total order —
    required for a deterministic result). Build `values` must be
    non-null; NULLs read as "no build here" to last(ignorenulls).
    The 19th fuzz layer (tests/test_properties.py) drives this against
    DuckDB's native ASOF JOIN on randomized frames."""
    assert not set(values) & set(probe.columns), "value/probe name clash"
    build_side, probe_side = (0, 1) if not strict else (1, 0)
    tiebreak = tiebreak or []
    probe_cols = probe.columns
    b = build.select(
        F.col(key).alias("_ak"),
        F.col(build_ts).alias("_at"),
        F.lit(build_side).alias("_aside"),
        *[F.col(c) for c in values],
        *[
            F.lit(None).cast(probe.schema[c].dataType).alias(c)
            for c in probe_cols
        ],
    )
    p = probe.select(
        F.col(key).alias("_ak"),
        F.col(probe_ts).alias("_at"),
        F.lit(probe_side).alias("_aside"),
        *[
            F.lit(None).cast(build.schema[c].dataType).alias(c)
            for c in values
        ],
        *probe_cols,
    )
    w = (
        Window.partitionBy("_ak")
        .orderBy("_at", "_aside", *tiebreak)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = b.unionByName(p).select(
        "_aside",
        *probe_cols,
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in values],
    )
    return tagged.filter(F.col("_aside") == probe_side).drop("_aside")


@query(
    "join_asof",
    oracle="""
        SELECT e.event_id,
               o.o_orderkey AS asof_orderkey,
               o.o_totalprice AS asof_totalprice
        FROM events e
        LEFT JOIN LATERAL (
            SELECT o_orderkey, o_totalprice
            FROM orders o
            WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
            LIMIT 1
        ) o ON TRUE
    """,
    tags=("join", "asof"),
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (SURVEY.md §7.3 #4 stretch): for each event, the latest
    order of that customer (user_id ≡ custkey) at-or-before the event time;
    ties on date broken by o_orderkey (a total order, so both engines agree).

    Spark lacks a native as-of join; this is the *linear* union+window
    emulation — tag both sides into one keyed stream, sort within key by
    (ts, side, key), and carry the last-seen build row forward with
    last(ignorenulls). One shuffle on the key, no per-row probe join: the
    100 TB shape. The oracle is a completely different formulation (LATERAL
    top-1 per probe row), making this a genuine differential check of the
    emulation's semantics.
    """
    orders = table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderdate",
        F.col("o_orderkey").alias("asof_orderkey"),
        F.col("o_totalprice").alias("asof_totalprice"),
    )
    ev = table(spark, sf_dir, "events").select(
        "event_id", F.col("user_id").alias("k"), F.col("ts").alias("t")
    )
    # ts comparison is date <= timestamp: cast the build date to the
    # probe's timestamp type so the union column is homogeneous (the
    # pre-refactor form relied on unionByName's implicit coercion)
    build = orders.withColumn(
        "o_orderdate", F.col("o_orderdate").cast("timestamp")
    )
    return asof_join(
        ev,
        build.select(
            F.col("o_custkey").alias("k"),
            F.col("o_orderdate").alias("t"),
            "asof_orderkey",
            "asof_totalprice",
        ),
        key="k",
        probe_ts="t",
        build_ts="t",
        values=["asof_orderkey", "asof_totalprice"],
        tiebreak=["asof_orderkey"],
    ).select("event_id", "asof_orderkey", "asof_totalprice")


@query(
    "join_cross_limited",
    oracle="SELECT r_name, n_name FROM region CROSS JOIN nation",
    tags=("join",),
)
def join_cross_limited(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Guarded cartesian: both inputs are bounded dims (5 × 25)."""
    r = table(spark, sf_dir, "region").select("r_name")
    n = table(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(n)


@query(
    "join_skew_salted",
    oracle="""
        SELECT o_orderpriority,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2))))
                    AS DOUBLE) AS revenue
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_orderpriority
    """,
    tags=("join", "scale", "skew"),
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant salted pre-aggregation feeding a join, oracle-checked
    against the plain join+group.

    The pattern for a hot join key at 100 TB (one orderkey holding a huge
    slice of lineitem): salt the fact with a deterministic hash in [0, N),
    partially aggregate on (key, salt) — the hot key's rows now reduce on N
    tasks instead of one — and join the collapsed partials (≤N rows per
    key, ~|orders| total instead of |lineitem|) to the other side on the
    bare key. No build-side replication at all, unlike the replicate-and-
    salt join (an earlier form of this query benched the 4× explode at
    1.5s for nothing the aggregation semantics needed). Revenue sums are
    int64 units (associative), so salted partials re-aggregate to exactly
    the unsalted answer — which is what the oracle asserts. AQE's skewJoin
    solves the same problem adaptively when runtime stats expose it; the
    explicit form covers stats-blind skew and pushes the reduction below
    the join, which AQE never does.
    """
    n_salt = 4
    li = table(spark, sf_dir, "lineitem").withColumn(
        "salt",
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(n_salt)),
    )
    partial = li.groupBy("l_orderkey", "salt").agg(
        F.sum(rev_units()).alias("rev_units_partial")
    )
    o = table(spark, sf_dir, "orders")
    return (
        partial.join(o, partial.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg((F.sum("rev_units_partial") / 10000.0).alias("revenue"))
    )


@query(
    "join_fuzzy_blocked",
    oracle="""
        WITH probes AS (
            SELECT c_custkey AS probe_id,
                   CASE WHEN c_custkey % 30 = 0 THEN reverse(c_name)
                        ELSE c_name || 'x' END AS probe_name
            FROM customer WHERE c_custkey % 10 = 0
        )
        SELECT probe_id, probe_name,
               c.c_custkey AS matched_key,
               c.c_name AS matched_name,
               CAST(levenshtein(probe_name, c.c_name) AS INTEGER) AS dist
        FROM probes p
        JOIN customer c
          ON substring(p.probe_name, 10, 8) = substring(c.c_name, 10, 8)
         AND levenshtein(p.probe_name, c.c_name) <= 1
    """,
    tags=("join", "fuzzy", "entity-resolution"),
)
def join_fuzzy_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy join — the entity-resolution/record-linkage pattern
    (matching noisy source names against a canonical registry, the author/
    domain dedup step of a corpus pipeline). A naive edit-distance join is
    O(n·m); BLOCKING makes it tractable at 100 TB: both sides derive a
    cheap blocking key (here a stable substring of the identifier), the
    join is an EQUI-join on the block key — hash-partitioned, never a
    cartesian — and the expensive levenshtein runs only on within-block
    candidates. Probes are synthesized from customers: every 10th gets a
    one-char typo suffix (links at distance 1); every 30th is corrupted
    beyond recognition (reversed) and must fall out — blocking on the
    OBSERVED string sends it to a garbage block with no candidates, the
    honest production behavior for unlinkable records.

    Plan: block-key equi-join with the distance predicate as a post-join
    conjunct; the probe side is dim-sized here so it broadcasts, and at
    equal scales AQE falls back to the hash-partitioned form. Block
    granularity is the candidate-count lever: an 8-char key yields ~10
    candidates per block (r5; the earlier 7-char key yielded ~100 — 10×
    the levenshtein evals for the identical result set). The identical-
    result claim is DATA-SPECIFIC, not a property of distance-1 pairs in
    general: this fixture's linkable probes are trailing-appends of
    c_name, so characters 10-17 are untouched and every true match shares
    the full 8-char block; a distance-1 substitution INSIDE the block
    window (e.g. ...0010 vs ...0020) would pass a 7-char key but miss the
    8-char one. Widening the block key always trades recall for candidate
    count — pick the window from the known corruption model (here:
    suffix typos), and keep the oracle's blocking identical so the parity
    hash pins the choice.
    Levenshtein agrees between Spark and DuckDB (same DP definition) —
    pinned by the oracle hash."""
    c = table(spark, sf_dir, "customer")
    probes = c.where(F.col("c_custkey") % 10 == 0).select(
        F.col("c_custkey").alias("probe_id"),
        F.when(
            F.col("c_custkey") % 30 == 0, F.reverse(F.col("c_name"))
        )
        .otherwise(F.concat(F.col("c_name"), F.lit("x")))
        .alias("probe_name"),
    )
    # equi-join on the block key ONLY, then compute levenshtein ONCE per
    # candidate and filter — the distance in the join condition AND the
    # projection would run the O(len²) DP twice per pair (no CSE across
    # join predicate and project). Marginal on these 19-char identifiers
    # (measured −2%); the single-evaluation shape is what matters on real
    # free-text fields where the DP dominates.
    return (
        probes.join(
            c,
            F.substring("probe_name", 10, 8) == F.substring("c_name", 10, 8),
        )
        .select(
            "probe_id",
            "probe_name",
            F.col("c_custkey").alias("matched_key"),
            F.col("c_name").alias("matched_name"),
            F.levenshtein(F.col("probe_name"), F.col("c_name"))
            .cast("int")
            .alias("dist"),
        )
        .where(F.col("dist") <= 1)
    )


@query(
    "join_null_safe_eq",
    oracle="""
        WITH a AS (
            SELECT nullif(o_orderpriority, '5-LOW') AS pri,
                   CAST(COUNT(*) AS BIGINT) AS n_f
            FROM orders WHERE o_orderstatus = 'F' GROUP BY 1
        ),
        b AS (
            SELECT nullif(o_orderpriority, '5-LOW') AS pri,
                   CAST(COUNT(*) AS BIGINT) AS n_o
            FROM orders WHERE o_orderstatus = 'O' GROUP BY 1
        )
        SELECT a.pri, n_f, n_o
        FROM a JOIN b ON a.pri IS NOT DISTINCT FROM b.pri
    """,
    tags=("join", "null-semantics"),
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (``<=>`` / IS NOT DISTINCT FROM): the NULL
    group on each side must MATCH (one row out), where ordinary ``=``
    silently drops it — the classic silent-data-loss corner when a join
    key is nullable (here '5-LOW' nulled out as the stand-in). Both sides
    pre-aggregate so the NULL-key match stays 1×1; Spark plans eqNullSafe
    as a hash join on a null-safe key, not a cartesian."""
    o = table(spark, sf_dir, "orders")
    pri = F.nullif(F.col("o_orderpriority"), F.lit("5-LOW"))
    a = (
        o.where(F.col("o_orderstatus") == "F")
        .groupBy(pri.alias("pri"))
        .agg(F.count(F.lit(1)).alias("n_f"))
    )
    b = (
        o.where(F.col("o_orderstatus") == "O")
        .groupBy(pri.alias("pri_b"))
        .agg(F.count(F.lit(1)).alias("n_o"))
    )
    return a.join(b, a.pri.eqNullSafe(b.pri_b)).select("pri", "n_f", "n_o")


@query(
    "join_range_bucketed",
    oracle="""
        WITH win AS (
            SELECT event_id AS window_id, ts AS w_start,
                   ts + INTERVAL 2 HOUR AS w_end
            FROM events WHERE event_id % 500 = 0
        )
        SELECT w.window_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_value
        FROM win w JOIN events e
          ON e.ts >= w.w_start AND e.ts < w.w_end
        GROUP BY w.window_id
    """,
    tags=("join", "range"),
)
def join_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range (interval) join with NO equi key — "events inside each
    maintenance window" — the join shape that naively degenerates to a
    cartesian product with a post-filter (O(n·m) at any cluster size).

    The scale-safe form implemented here is bucket decomposition: each
    2-hour window explodes into the 1-hour epoch buckets it overlaps
    (≤3), each event maps to exactly one bucket, and the join becomes an
    EQUI join on bucket with the precise range predicate as a residual
    conjunct — shuffle is O(n + m·buckets_per_window) and the matcher
    only sees same-bucket pairs. A window pairs with an event in at most
    one shared bucket (the event's own), so no post-join dedup is
    needed. The oracle states the naive range join declaratively; the
    hash match proves the decomposition exact. Windows every 500th
    event keep |windows| data-proportional, so the probe side never
    broadcasts by luck at adjudication scale."""
    ev = table(spark, sf_dir, "events")
    win = ev.where(F.col("event_id") % 500 == 0).select(
        F.col("event_id").alias("window_id"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("w_end"),
    )
    hour = 3600
    # explode each window into the hour-epoch buckets it overlaps
    wb = win.select(
        "window_id",
        "w_start",
        "w_end",
        F.explode(
            F.sequence(
                F.floor(F.col("w_start").cast("double") / hour).cast("long"),
                F.floor(
                    # end is EXCLUSIVE: an end on an exact hour boundary
                    # contributes no events from its own bucket, but the
                    # extra bucket only costs a few residual comparisons
                    F.col("w_end").cast("double") / hour
                ).cast("long"),
            )
        ).alias("bucket"),
    )
    eb = ev.select(
        "ts",
        dec2("value").alias("v"),
        F.floor(F.col("ts").cast("double") / hour).cast("long").alias(
            "bucket"
        ),
    )
    joined = wb.join(eb, "bucket").where(
        (F.col("ts") >= F.col("w_start")) & (F.col("ts") < F.col("w_end"))
    )
    return joined.groupBy("window_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("v").cast("double").alias("total_value"),
    )


@query(
    "join_scd2_asof",
    oracle="""
        WITH changes AS (
            SELECT o_custkey, o_orderstatus, o_orderdate AS valid_from,
                   o_orderkey
            FROM (
                SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
                       lag(o_orderstatus) OVER (
                           PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey
                       ) AS prev_status
                FROM orders
            )
            WHERE prev_status IS NULL OR prev_status <> o_orderstatus
        ),
        hist AS (
            SELECT o_custkey, o_orderstatus, valid_from,
                   lead(valid_from) OVER (
                       PARTITION BY o_custkey
                       ORDER BY valid_from, o_orderkey
                   ) AS valid_to
            FROM changes
        )
        SELECT e.event_id, h.o_orderstatus AS status_at_event
        FROM events e
        LEFT JOIN hist h
          ON h.o_custkey = e.user_id
         AND CAST(h.valid_from AS TIMESTAMP) <= e.ts
         AND (h.valid_to IS NULL OR e.ts < CAST(h.valid_to AS TIMESTAMP))
    """,
    tags=("join", "scd2", "asof"),
)
def join_scd2_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension lookup against SCD2 history — the
    warehouse op that makes type-2 dimensions useful: each event joins
    to the customer-status interval that was valid AT the event's
    timestamp ([valid_from, valid_to), open-ended current row). The
    interval-form complement of join_asof's union+window emulation: the
    history is built once (etl_scd2_history's lag/lead shape, one
    o_custkey shuffle) and probes join on the EQUI key with the interval
    containment as a residual predicate — a plain hash join at any
    scale, never a theta join, because each customer holds few intervals
    and the residual filters within the matched bucket.

    Events before a user's first interval (or from users with no orders)
    keep a NULL status via the left join — at most one interval matches
    per event (intervals partition the timeline), so row count is
    exactly |events| and the whole frame hash-checks."""
    o = table(spark, sf_dir, "orders")
    w_scan = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    changes = (
        o.withColumn("prev_status", F.lag("o_orderstatus").over(w_scan))
        .where(
            F.col("prev_status").isNull()
            | (F.col("prev_status") != F.col("o_orderstatus"))
        )
        .select(
            "o_custkey",
            "o_orderstatus",
            F.col("o_orderdate").alias("valid_from"),
            "o_orderkey",
        )
    )
    w_close = Window.partitionBy("o_custkey").orderBy(
        "valid_from", "o_orderkey"
    )
    hist = changes.select(
        "o_custkey",
        "o_orderstatus",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.lead("valid_from").over(w_close).cast("timestamp").alias("valid_to"),
    )
    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    return ev.join(
        hist,
        (hist.o_custkey == ev.user_id)
        & (hist.valid_from <= ev.ts)
        & (hist.valid_to.isNull() | (ev.ts < hist.valid_to)),
        "left",
    ).select("event_id", F.col("o_orderstatus").alias("status_at_event"))
