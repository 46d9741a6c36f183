"""Event-stream-shaped queries in batch form (SURVEY.md §2B "Events").

These define the *semantics* (hash-checkable against DuckDB); the true
Structured Streaming variant lives in queries/streaming.py and is asserted
against these (SURVEY.md §5 item 5).

Timestamp discipline: events.ts is nanosecond parquet (µs in Spark, ns in
DuckDB) — raw ts never appears in an output column; it is always bucketed
(date_trunc) or consumed as epoch seconds (SURVEY.md §7.3 #7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from omnidata_etl_spark.catalog import table
from omnidata_etl_spark.queries._util import dec2
from omnidata_etl_spark.registry import query


@query(
    "stream_tumbling_counts",
    oracle="""
        SELECT date_trunc('hour', ts) AS hour_start, event_type,
               COUNT(*) AS n_events
        FROM events GROUP BY 1, 2
    """,
    tags=("events",),
)
def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling counts, batch form (`window(ts,'1 hour')` in the
    streaming twin — same buckets as date_trunc for aligned hours)."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour_start"), "event_type"
    ).agg(F.count("*").alias("n_events"))


@query(
    "stream_sessionize",
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sess AS (
            SELECT user_id, event_id,
                   SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS session_id
            FROM flagged
        )
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM sess GROUP BY user_id, session_id
    """,
    tags=("events", "session"),
)
def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (gap > 30 min ⇒ new session): lag + running
    sum of session-start flags — the classic batch formulation; the streaming
    equivalent is session_window(ts, '30 minutes').

    Scale note: one shuffle on user_id; sessions never cross users so the
    window state is bounded per partition.
    """
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("double")
    gap = epoch - F.lag(epoch).over(w)
    is_new = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        ev.withColumn("is_new", is_new)
        .withColumn("session_id", F.sum("is_new").over(cum))
        .groupBy("user_id", "session_id")
        .agg(F.count("*").alias("n_events"))
    )


@query(
    "stream_hopping_counts",
    oracle="""
        WITH buckets AS (
            SELECT time_bucket(INTERVAL '30 minutes', ts) AS win_start,
                   event_type FROM events
            UNION ALL
            SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes',
                   event_type FROM events
        )
        SELECT win_start, event_type, CAST(COUNT(*) AS BIGINT) AS n_events
        FROM buckets GROUP BY win_start, event_type
    """,
    tags=("events", "window"),
)
def stream_hopping_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) window counts: 1-hour windows every 30 minutes —
    each event lands in exactly two windows. The oracle materializes the
    same two window starts per event explicitly (time_bucket and its
    predecessor), a different formulation of the same semantics."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("win_start"), "event_type", "n_events"
        )
    )


@query(
    "stream_session_window_batch",
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch(ts) - epoch(lag(ts) OVER w) >= 1800
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sess AS (
            SELECT user_id, event_id,
                   SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS session_id
            FROM flagged
        )
        SELECT user_id, CAST(MIN(event_id) AS BIGINT) AS first_event,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM sess GROUP BY user_id, session_id
    """,
    tags=("events", "session"),
)
def stream_session_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's native session_window in batch mode, differentially checked
    against the lag+cumsum formulation (as SQL oracle). Boundary semantics:
    session_window merges an event iff ts < previous + gap, so the oracle's
    new-session condition is `>= 1800` — strictly-greater (`stream_sessionize`)
    and at-or-beyond differ exactly on gap == 30 min.

    Sessions are identified by their MIN(event_id) (ts-free, deterministic) —
    never by raw session timestamps (ns/µs mismatch, SURVEY.md §7.3 #7).
    """
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.min("event_id").alias("first_event"),
            F.count("*").alias("n_events"),
        )
        .select("user_id", "first_event", "n_events")
    )


@query(
    "stream_dedup_latest",
    oracle="""
        SELECT event_id, user_id, event_type, value FROM (
            SELECT event_id, user_id, event_type, value,
                   row_number() OVER (PARTITION BY event_id
                                      ORDER BY ts DESC, user_id DESC,
                                               event_type DESC, value DESC) AS rn
            FROM events
        ) WHERE rn = 1
    """,
    tags=("events", "dedup"),
)
def stream_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep the latest row per event_id (north-star dedup shape). The ORDER BY
    lists every output column after ts so exact-tie rows resolve identically
    on both engines. Streaming twin: dropDuplicates within a watermark."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_id").orderBy(
        F.col("ts").desc(),
        F.col("user_id").desc(),
        F.col("event_type").desc(),
        F.col("value").desc(),
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type", "value")
    )


@query(
    "events_funnel_counts",
    oracle="""
        SELECT CAST(COUNT(*) FILTER (WHERE t_signup IS NOT NULL) AS BIGINT)
                   AS n_signup,
               CAST(COUNT(*) FILTER (WHERE t_view >= t_signup) AS BIGINT)
                   AS n_viewed,
               CAST(COUNT(*) FILTER (WHERE t_click >= t_view
                                       AND t_view >= t_signup) AS BIGINT)
                   AS n_clicked,
               CAST(COUNT(*) FILTER (WHERE t_purchase >= t_click
                                       AND t_click >= t_view
                                       AND t_view >= t_signup) AS BIGINT)
                   AS n_purchased
        FROM (
            SELECT user_id,
                   MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
                   MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
                   MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
                   MIN(CASE WHEN event_type = 'purchase' THEN ts END)
                       AS t_purchase
            FROM events
            GROUP BY user_id
        ) stages
    """,
    tags=("events", "agg"),
)
def events_funnel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel signup → view → click → purchase: users
    whose first occurrence of each stage respects the stage order. The
    classic product-analytics operator, expressed as one conditional-MIN
    pivot per user plus ordered-timestamp predicates — a single user_id
    shuffle, no joins, no sessionization state.

    NULL semantics carry the funnel logic: a user missing a stage has a NULL
    min, every >= against NULL is false, and FILTER/when counts skip them
    identically on both engines. ts comparisons are safe because stage
    ordering is µs-resolution at worst (SURVEY.md §7.3 #7 only bans raw ts
    OUTPUT, not internal comparisons)."""
    ev = table(spark, sf_dir, "events")
    stages = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t_signup"),
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    sign = F.col("t_signup").isNotNull()
    view = F.col("t_view") >= F.col("t_signup")
    click = (F.col("t_click") >= F.col("t_view")) & view
    buy = (F.col("t_purchase") >= F.col("t_click")) & click
    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")  # noqa: E731
    return stages.agg(
        cnt(sign).alias("n_signup"),
        cnt(view).alias("n_viewed"),
        cnt(click).alias("n_clicked"),
        cnt(buy).alias("n_purchased"),
    )


@query(
    "events_weekly_retention",
    oracle="""
        WITH weeks AS (
            SELECT DISTINCT user_id,
                   CAST(date_trunc('week', ts) AS DATE) AS week_start
            FROM events
        )
        SELECT CAST(a.week_start AS VARCHAR) AS week_start,
               CAST(COUNT(*) AS BIGINT) AS n_active,
               CAST(COUNT(b.user_id) AS BIGINT) AS n_retained
        FROM weeks a
        LEFT JOIN weeks b
          ON a.user_id = b.user_id
         AND b.week_start = a.week_start + 7
        GROUP BY a.week_start
    """,
    tags=("events", "join", "agg"),
)
def events_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week retention cohort: per ISO week, users active that week
    and still active the next — the standard growth-analytics operator.

    Formulated as distinct (user, week) → self left-join shifted by 7 days →
    conditional count. date_trunc('week') lands on Monday midnight in both
    engines and is cast to DATE before output (ns/µs parity, SURVEY.md
    §7.3 #7). The distinct and the join share the user_id-keyed shuffle;
    retained = COUNT(matched user_id) under left-join null semantics.
    week_start stays DATE internally (the +7d join key) and is emitted as an
    ISO string: the driver's value hash does not canonicalize date-vs-
    datetime64 dtypes (the CORRECTNESS_r01 cast_typed_load lesson)."""
    ev = table(spark, sf_dir, "events")
    # Single user-keyed shuffle, no self-join (the r3 form persisted a
    # distinct (user, week) frame and broadcast a 7-day-shifted copy of it
    # back onto itself — two consumers, a broadcast build, and a second
    # aggregation). collect_set folds each user's activity to their
    # distinct weeks map-side; sort it once and "active in week+7" is a
    # pure array-lambda lookup: the immediate NEXT distinct week equals
    # week+7 iff the user was active then. The per-user array is bounded
    # by #weeks in the corpus (dozens), so the shuffled state is tiny at
    # any corpus scale; `if()` guards the i+1 lookup (ANSI subscripts
    # throw out-of-range, and only If guarantees conditional evaluation).
    per_user = (
        ev.select(
            "user_id",
            F.date_trunc("week", "ts").cast("date").alias("w"),
        )
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_set("w")).alias("ws"))
    )
    pairs = per_user.select(
        F.explode(
            F.expr(
                "transform(ws, (w, i) -> named_struct("
                "  'week_start', w,"
                "  'retained', if(i < size(ws) - 1,"
                "                 ws[i + 1] = date_add(w, 7), false)))"
            )
        ).alias("p")
    ).select("p.week_start", "p.retained")
    return (
        pairs.groupBy("week_start")
        .agg(
            F.count("*").cast("bigint").alias("n_active"),
            F.sum(F.col("retained").cast("long")).cast("bigint").alias(
                "n_retained"
            ),
        )
        .select(
            F.col("week_start").cast("string").alias("week_start"),
            "n_active",
            "n_retained",
        )
    )


@query(
    "events_anomaly_zscore",
    oracle="""
        SELECT event_id, user_id, value,
               (value - CAST(sumx AS DOUBLE) / n)
               / sqrt((CAST(sumsq AS DOUBLE)
                       - CAST(sumx AS DOUBLE) * CAST(sumx AS DOUBLE) / n)
                      / (n - 1)) AS zscore
        FROM events
        JOIN (
            SELECT user_id AS agg_user, COUNT(*) AS n,
                   SUM(CAST(value AS DECIMAL(18,2))) AS sumx,
                   SUM(CAST(value AS DECIMAL(18,2))
                       * CAST(value AS DECIMAL(18,2))) AS sumsq
            FROM events
            GROUP BY user_id
            HAVING COUNT(*) > 1
        ) m ON user_id = agg_user
        WHERE abs((value - CAST(sumx AS DOUBLE) / n)
                  / sqrt((CAST(sumsq AS DOUBLE)
                          - CAST(sumx AS DOUBLE) * CAST(sumx AS DOUBLE) / n)
                         / (n - 1))) > 2.5
    """,
    tags=("events", "stats", "quality"),
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score anomaly flags (|z| > 2.5) — the monitoring op that
    pages someone. Mean/stddev come from EXACT decimal moments per user
    (same trick as agg_variance_exact: order-independent sums, then one
    fixed tree of double ops), so even the inequality at the 2.5 boundary
    is engine-independent. One user_id shuffle for moments, then a
    same-key broadcast-or-shuffle join back to the rows."""
    ev = table(spark, sf_dir, "events")
    v = dec2("value")
    moments = (
        ev.groupBy(F.col("user_id").alias("agg_user"))
        .agg(
            F.count("*").alias("n"),
            F.sum(v).alias("sumx"),
            F.sum(v * v).alias("sumsq"),
        )
        .where(F.col("n") > 1)
    )
    mean = F.col("sumx").cast("double") / F.col("n")
    var = (
        F.col("sumsq").cast("double")
        - F.col("sumx").cast("double") * F.col("sumx").cast("double") / F.col("n")
    ) / (F.col("n") - 1)
    z = (F.col("value") - mean) / F.sqrt(var)
    return (
        ev.join(moments, ev.user_id == moments.agg_user)
        .where(F.abs(z) > 2.5)
        .select("event_id", "user_id", "value", z.alias("zscore"))
    )


@query(
    "events_daily_user_growth",
    oracle="""
        WITH days AS (
            SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
            FROM events GROUP BY user_id, CAST(date_trunc('day', ts) AS DATE)
        ),
        first_seen AS (
            SELECT user_id, MIN(d) AS fd FROM days GROUP BY user_id
        ),
        daily AS (
            SELECT d, CAST(COUNT(*) AS BIGINT) AS n_active,
                   CAST(COUNT(*) FILTER (WHERE fd = d) AS BIGINT) AS n_new
            FROM days JOIN first_seen USING (user_id)
            GROUP BY d
        )
        SELECT CAST(d AS VARCHAR) AS day,
               n_active, n_new,
               CAST(SUM(n_new) OVER (ORDER BY d) AS BIGINT)
                   AS cumulative_users
        FROM daily
    """,
    tags=("events", "agg", "window"),
)
def events_daily_user_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily growth dashboard: active users, NEW users (first-ever-seen
    that day), and the cumulative distinct-user count — the other standard
    growth-analytics operator next to retention.

    One user-keyed shuffle does all the heavy lifting: distinct (user,
    day) pairs collapse map-side, each user's first day is a MIN over
    their own days (same shuffle), and the per-day rollup + running sum
    work on |days| rows (bounded by the corpus time span, so the final
    unpartitioned window is over dozens of rows at any data scale — the
    one place a global window is legitimate). Day is emitted as an ISO
    string (ns/µs dtype parity, SURVEY §7.3 #7)."""
    ev = table(spark, sf_dir, "events")
    days = (
        ev.select(
            "user_id", F.date_trunc("day", "ts").cast("date").alias("d")
        )
        .groupBy("user_id", "d")
        .agg(F.lit(1))
        .select("user_id", "d")
    )
    first_seen = days.groupBy("user_id").agg(F.min("d").alias("fd"))
    daily = (
        days.join(first_seen, "user_id")
        .groupBy("d")
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.sum((F.col("fd") == F.col("d")).cast("long")).alias("n_new"),
        )
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "n_active",
        "n_new",
        F.sum("n_new").over(w).alias("cumulative_users"),
    )


@query(
    "events_resample_gapfill",
    oracle="""
        WITH bounds AS (
            SELECT date_trunc('hour', MIN(ts)) AS lo,
                   date_trunc('hour', MAX(ts)) AS hi
            FROM events WHERE event_type = 'error'
        ),
        spine AS (
            SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
            FROM bounds
        ),
        actual AS (
            SELECT date_trunc('hour', ts) AS h,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
                       / 100 AS sum_value
            FROM events WHERE event_type = 'error'
            GROUP BY date_trunc('hour', ts)
        )
        SELECT CAST(spine.h AS VARCHAR) AS hour,
               COALESCE(actual.n, 0) AS n_events,
               COALESCE(actual.sum_value, 0.0) AS sum_value
        FROM spine LEFT JOIN actual ON spine.h = actual.h
    """,
    tags=("events", "timeseries", "agg"),
)
def events_resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling with gap fill: hourly counts of a sparse
    event type over a COMPLETE hour spine — missing hours appear as
    explicit zeros (the shape every downstream anomaly detector, chart,
    and forecast model needs; a naive groupBy silently drops empty
    buckets).

    The spine is generated, not scanned: ``sequence(min, max, 1 hour)``
    exploded from the 1-row bounds aggregate — O(#hours) rows regardless
    of corpus size — and the left join against the bucketed aggregate is
    a broadcast of the tiny spine side at any scale. Money-style exact
    sum (value is 2dp) keeps the oracle hash stable; hour emitted as ISO
    string per the ns/µs dtype-parity rule."""
    ev = table(spark, sf_dir, "events").where(F.col("event_type") == "error")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("h")
    )
    actual = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(F.round(F.col("value") * 100).cast("bigint")).cast("double")
            / 100
        ).alias("sum_value"),
    )
    return spine.join(actual, "h", "left").select(
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_events"),
        F.coalesce(F.col("sum_value"), F.lit(0.0)).alias("sum_value"),
    )


@query(
    "events_ewma_smoothed",
    oracle="""
        WITH RECURSIVE seq AS (
            SELECT user_id, event_id, value,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS rn
            FROM events
        ),
        ew AS (
            SELECT user_id, rn, event_id, value AS ewma
            FROM seq WHERE rn = 1
            UNION ALL
            SELECT s.user_id, s.rn, s.event_id,
                   0.2 * s.value + 0.8 * e.ewma
            FROM seq s JOIN ew e
              ON s.user_id = e.user_id AND s.rn = e.rn + 1
        )
        SELECT user_id, event_id, ewma FROM ew
    """,
    tags=("events", "timeseries", "stateful"),
)
def events_ewma_smoothed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially weighted moving average (alpha = 0.2) over
    the event stream — the classic sequential-state time-series smooth
    Spark's built-in windows cannot express (the recursion s_n = αx_n +
    (1-α)s_{n-1} has no fixed frame).

    The 100 TB shape for per-entity sequential state: ONE shuffle keyed
    on user_id, rows sorted within partitions, and a single mapInPandas
    pass runs pandas' cython grouped ewm over each partition — keys run
    in parallel across executors, each key's history replays serially
    inside its partition. This replaced the r10 applyInPandas form: the
    semantics are identical but applyInPandas invoked Python once per
    GROUP (1,500 tiny pandas frames at sf0.1 — 1.68 s, the suite's
    slowest entry); the partition-level pass is one fused cython loop
    (measured ~3× cut). Executor memory bounds at one partition, same
    as any sort-based operator.

    Oracle-EXACT, not tolerance-checked: pandas ewm(adjust=False)
    evaluates the identical IEEE expression tree as the explicit
    recursion and DuckDB's WITH RECURSIVE (verified bit-identical over
    200 randomized trials, tests/test_quality.py pins the recursion) —
    identical op order → identical bits, so the driver's value hash
    matches with no rounding. The closed-form window rewrite (powers of
    (1-α)) is REJECTED for the scale path: (1-α)^(-k) overflows past
    ~4k rows per key, and its float error diverges from the recursion."""
    import pandas as pd

    ev = (
        table(spark, sf_dir, "events")
        .select("user_id", "event_id", "ts", "value")
        .repartition("user_id")
        .sortWithinPartitions("user_id", "ts", "event_id")
    )

    def op(batches):
        import numpy as np

        # Streaming across Arrow batches (r10 ADVICE): the earlier form
        # concatenated every batch of a shuffle partition into one frame,
        # so peak worker memory was a full (skew-sensitive) hash
        # partition. Instead carry s_{n-1} per user across batches and
        # splice it back in as a synthetic seed row before the user's
        # first row of the next batch — ewm(adjust=False) over
        # [seed, x1, ...] emits 0.2*x1 + 0.8*seed at x1, the exact op
        # the uninterrupted recursion would run, so outputs stay
        # bit-identical while peak memory bounds at ONE batch. Rows are
        # partition-sorted by user_id, so users are contiguous and the
        # per-batch group scan below is O(distinct users in batch); the
        # smoothing itself stays one fused cython ewm call per batch.
        state: dict = {}
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            uids = pdf["user_id"].to_numpy()
            vals = pdf["value"].to_numpy(dtype="float64")
            starts = np.flatnonzero(np.r_[True, uids[1:] != uids[:-1]])
            seed_pos, seed_val, seed_uid = [], [], []
            for s in starts:
                u = uids[s]
                if u in state:
                    seed_pos.append(s)
                    seed_val.append(state[u])
                    seed_uid.append(u)
            if seed_pos:
                ins = np.asarray(seed_pos)
                aug_u = np.insert(uids, ins, seed_uid)
                aug_v = np.insert(vals, ins, seed_val)
                keep = np.ones(len(aug_u), dtype=bool)
                keep[ins + np.arange(len(ins))] = False
            else:
                aug_u, aug_v, keep = uids, vals, None
            ewma = (
                pd.Series(aug_v)
                .groupby(aug_u, sort=False)
                .ewm(alpha=0.2, adjust=False)
                .mean()
                .to_numpy()
            )
            if keep is not None:
                ewma = ewma[keep]
            ends = np.r_[starts[1:] - 1, n - 1]
            for s, e in zip(starts, ends):
                state[uids[s]] = ewma[e]
            yield pd.DataFrame(
                {"user_id": pdf["user_id"], "event_id": pdf["event_id"],
                 "ewma": ewma}
            )

    return ev.mapInPandas(op, schema="user_id long, event_id long, ewma double")


@query(
    "events_gaps_islands",
    oracle="""
        WITH days AS (
            SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
            FROM events GROUP BY 1, 2
        ),
        anch AS (
            SELECT user_id, d,
                   d - CAST(row_number() OVER (
                           PARTITION BY user_id ORDER BY d
                       ) AS INTEGER) * INTERVAL 1 DAY AS anchor
            FROM days
        )
        SELECT user_id,
               CAST(MIN(d) AS VARCHAR) AS streak_start,
               CAST(MAX(d) AS VARCHAR) AS streak_end,
               CAST(COUNT(*) AS BIGINT) AS n_days
        FROM anch GROUP BY user_id, anchor
    """,
    tags=("events", "window", "session"),
)
def events_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity streaks (gaps-and-islands): maximal runs of consecutive
    active days per user — the classic consecutive-sequence operator
    (login streaks, SLA uptime windows) that needs the row_number-anchor
    trick rather than any single window frame.

    Anchor = day − row_number·1day: constant within a consecutive run,
    jumps at every gap, so a plain groupBy on (user, anchor) recovers the
    islands. Scale: one user_id shuffle for the distinct-day collapse
    (count pushed map-side), the per-user window rides the same
    partitioning, and the final groupBy keys on (user, anchor) — never a
    global sort, state bounded by one user's distinct days."""
    ev = table(spark, sf_dir, "events")
    days = (
        ev.select("user_id", F.date_trunc("day", "ts").cast("date").alias("d"))
        .distinct()
    )
    rn = F.row_number().over(Window.partitionBy("user_id").orderBy("d"))
    anch = days.withColumn("anchor", F.date_sub(F.col("d"), rn))
    return anch.groupBy("user_id", "anchor").agg(
        F.date_format(F.min("d"), "yyyy-MM-dd").alias("streak_start"),
        F.date_format(F.max("d"), "yyyy-MM-dd").alias("streak_end"),
        F.count(F.lit(1)).alias("n_days"),
    ).select("user_id", "streak_start", "streak_end", "n_days")


@query(
    "events_markov_transitions",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS nxt
            FROM events
        ),
        trans AS (
            SELECT event_type AS from_state, nxt AS to_state,
                   CAST(COUNT(*) AS BIGINT) AS n_trans
            FROM seq WHERE nxt IS NOT NULL
            GROUP BY 1, 2
        )
        SELECT from_state, to_state, n_trans,
               CAST(n_trans AS DOUBLE)
               / SUM(n_trans) OVER (PARTITION BY from_state) AS prob
        FROM trans
    """,
    tags=("events", "stats"),
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    P(next event type | current) — the behavioral-model operator behind
    next-action prediction and funnel-drop diagnosis.

    lead() rides one user_id shuffle; the transition count collapses to
    |types|² rows so the per-from normalizing window is over a
    cardinality-bounded frame at any data scale. prob is an integer ÷
    integer double division — bit-identical on both engines."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.select(
            F.col("event_type").alias("from_state"),
            F.lead("event_type").over(w).alias("to_state"),
        )
        .where(F.col("to_state").isNotNull())
        .groupBy("from_state", "to_state")
        .agg(F.count(F.lit(1)).alias("n_trans"))
    )
    norm = Window.partitionBy("from_state")
    return trans.select(
        "from_state",
        "to_state",
        "n_trans",
        (F.col("n_trans").cast("double") / F.sum("n_trans").over(norm)).alias(
            "prob"
        ),
    )


@query(
    "events_rollup_multires",
    oracle="""
        WITH hourly AS (
            SELECT date_trunc('hour', ts) AS b, event_type,
                   COUNT(*) AS n_events,
                   SUM(CAST(value AS DECIMAL(18,2))) AS sv
            FROM events GROUP BY 1, 2
        ),
        daily AS (
            SELECT date_trunc('day', ts) AS b, event_type,
                   COUNT(*) AS n_events,
                   SUM(CAST(value AS DECIMAL(18,2))) AS sv
            FROM events GROUP BY 1, 2
        )
        SELECT 'hour' AS resolution,
               strftime(b, '%Y-%m-%d %H:%M:%S') AS bucket_start,
               event_type, CAST(n_events AS BIGINT) AS n_events,
               CAST(sv AS DOUBLE) AS sum_value
        FROM hourly
        UNION ALL
        SELECT 'day', strftime(b, '%Y-%m-%d %H:%M:%S'), event_type,
               CAST(n_events AS BIGINT), CAST(sv AS DOUBLE)
        FROM daily
    """,
    tags=("events", "agg", "timeseries"),
)
def events_rollup_multires(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cascading multi-resolution rollup (the hypertable continuous-
    aggregate shape): hourly partials computed ONCE from the base table,
    daily derived by re-aggregating the hourly frame — never a second
    base scan. The oracle computes BOTH resolutions directly from base,
    so the hash match proves the cascade is lossless (decimal partial
    sums re-aggregate exactly; a double partial would drift).

    Scale: at 100 TB the hourly layer is what you persist; the daily
    re-agg runs over |hours|×|types| rows — thousands, not billions. In
    this one-shot form Catalyst reuses the hourly exchange for both
    branches of the union."""
    ev = table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("b"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(dec2("value")).alias("sv"),
    )
    daily = hourly.groupBy(
        F.date_trunc("day", "b").alias("b"), "event_type"
    ).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("sv").alias("sv"),
    )

    def shape(df: DataFrame, res: str) -> DataFrame:
        return df.select(
            F.lit(res).alias("resolution"),
            F.date_format("b", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
            "event_type",
            F.col("n_events").cast("long").alias("n_events"),
            F.col("sv").cast("double").alias("sum_value"),
        )

    return shape(hourly, "hour").unionAll(shape(daily, "day"))


@query(
    "events_ab_test",
    oracle="""
        WITH assigned AS (
            SELECT user_id, user_id % 2 AS arm,
                   MAX(CASE WHEN event_type = 'purchase' AND value > 200
                            THEN 1 ELSE 0 END) AS converted
            FROM events GROUP BY user_id
        ),
        arms AS (
            SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_users,
                   CAST(SUM(converted) AS BIGINT) AS n_converted
            FROM assigned GROUP BY arm
        ),
        wide AS (
            SELECT
                MAX(CASE WHEN arm = 0 THEN n_users END) AS n0,
                MAX(CASE WHEN arm = 0 THEN n_converted END) AS c0,
                MAX(CASE WHEN arm = 1 THEN n_users END) AS n1,
                MAX(CASE WHEN arm = 1 THEN n_converted END) AS c1
            FROM arms
        )
        SELECT n0, c0, n1, c1,
               CAST(c0 AS DOUBLE) / n0 AS rate_control,
               CAST(c1 AS DOUBLE) / n1 AS rate_treatment,
               (CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0)
               / sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                      * (1 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                      * (1.0 / n0 + 1.0 / n1)) AS z_stat
        FROM wide
    """,
    tags=("events", "stats"),
)
def events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test — the experimentation readout (did the
    treatment arm convert more?). Users hash into arms (user_id % 2
    stands in for the assignment hash), conversion = a 'purchase'
    event over 200 (any-purchase saturates this corpus: every user buys,
    pooled rate 1, se 0), and the z statistic uses the pooled-proportion standard
    error.

    All heavy work is one user_id-keyed aggregation (conversion flag
    collapses map-side); the arm rollup is 2 rows and the z arithmetic
    is a fixed tree of double ops over exact integer counts —
    bit-identical across engines, no simulation, no UDF. At 100 TB the
    only shuffle is the per-user collapse, and 'arm' would come from a
    bucketing-stable hash so re-runs assign identically (as user_id % 2
    does here)."""
    ev = table(spark, sf_dir, "events")
    assigned = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 200),
                1,
            ).otherwise(0)
        ).alias("converted")
    ).select((F.col("user_id") % 2).alias("arm"), "converted")
    arms = assigned.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").alias("n_converted"),
    )
    wide = arms.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n_users"))).alias("n0"),
        F.max(F.when(F.col("arm") == 0, F.col("n_converted"))).alias("c0"),
        F.max(F.when(F.col("arm") == 1, F.col("n_users"))).alias("n1"),
        F.max(F.when(F.col("arm") == 1, F.col("n_converted"))).alias("c1"),
    )
    p0 = F.col("c0").cast("double") / F.col("n0")
    p1 = F.col("c1").cast("double") / F.col("n1")
    pooled = (F.col("c0") + F.col("c1")).cast("double") / (
        F.col("n0") + F.col("n1")
    )
    se = F.sqrt(
        pooled
        * (1 - pooled)
        * (1.0 / F.col("n0") + 1.0 / F.col("n1"))
    )
    return wide.select(
        "n0", "c0", "n1", "c1",
        p0.alias("rate_control"),
        p1.alias("rate_treatment"),
        ((p1 - p0) / se).alias("z_stat"),
    )


@query(
    "events_concurrency_peak",
    oracle="""
        WITH iv AS (
            SELECT ts AS t0,
                   ts + CAST(floor(value) AS BIGINT) * INTERVAL 1 SECOND AS t1
            FROM events
        ),
        pts AS (
            SELECT t0 AS t, 1 AS delta FROM iv
            UNION ALL
            SELECT t1 AS t, -1 AS delta FROM iv
        ),
        run AS (
            SELECT CAST(date_trunc('day', t) AS DATE) AS d,
                   SUM(delta) OVER (
                       PARTITION BY CAST(date_trunc('day', t) AS DATE)
                       ORDER BY t, delta
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS running
            FROM pts
        )
        SELECT CAST(d AS VARCHAR) AS day,
               CAST(MAX(running) AS BIGINT) AS peak_concurrency
        FROM run GROUP BY d
    """,
    tags=("events", "window", "timeseries"),
)
def events_concurrency_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent intervals per day (sweep line): each event opens an
    interval [ts, ts + floor(value) seconds); the floor is explicit
    because bare double→bigint casts disagree across engines (Spark
    truncates, DuckDB rounds half-even — caught by the sf0.1 hash); +1/−1 deltas sorted within the day
    and a running sum gives instantaneous concurrency; MAX per day is the
    capacity-planning number (peak simultaneous sessions / connections).

    The tiebreak at equal timestamps orders −1 before +1 (delta ASC), so
    an interval ending exactly when another starts never double-counts —
    the same convention in both engines makes the hash exact. Scale: the
    sweep partitions by DAY, so the sort is per-day and distributes;
    deltas crossing midnight are intentionally counted in their own day's
    sweep (per-day peaks treat each day's window independently — stated
    contract, matching how capacity dashboards bucket). No global
    ordering at any scale."""
    ev = table(spark, sf_dir, "events")
    iv = ev.select(
        F.col("ts").alias("t0"),
        (
            F.col("ts")
            + F.make_interval(secs=F.floor("value"))
        ).alias("t1"),
    )
    pts = iv.select(F.col("t0").alias("t"), F.lit(1).alias("delta")).unionAll(
        iv.select(F.col("t1").alias("t"), F.lit(-1).alias("delta"))
    )
    d = F.date_trunc("day", "t").cast("date")
    w = (
        Window.partitionBy(d)
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = pts.select(d.alias("d"), F.sum("delta").over(w).alias("running"))
    return run.groupBy("d").agg(
        F.max("running").cast("long").alias("peak_concurrency")
    ).select(F.date_format("d", "yyyy-MM-dd").alias("day"), "peak_concurrency")


@query(
    "events_cohort_ltv",
    oracle="""
        WITH firsts AS (
            SELECT user_id,
                   date_trunc('week', MIN(ts)) AS cohort_week
            FROM events GROUP BY user_id
        ),
        purchases AS (
            SELECT e.user_id, f.cohort_week,
                   CAST(floor(date_diff('day', f.cohort_week,
                                        date_trunc('day', e.ts)) / 7)
                        AS BIGINT) AS week_offset,
                   CAST(e.value AS DECIMAL(18,2)) AS v
            FROM events e JOIN firsts f USING (user_id)
            WHERE e.event_type = 'purchase'
        )
        SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
               week_offset,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_buyers,
               CAST(SUM(v) AS DOUBLE) AS revenue,
               CAST(SUM(SUM(v)) OVER (
                   PARTITION BY cohort_week ORDER BY week_offset
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS cumulative_ltv
        FROM purchases
        GROUP BY cohort_week, week_offset
    """,
    tags=("events", "agg", "window"),
)
def events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV triangle: users grouped by first-seen week, purchase
    revenue accumulated per week-offset — the value twin of
    events_weekly_retention (which counts users; this sums what they
    spend, the growth metric LTV/CAC runs on).

    One user_id shuffle finds cohorts, the purchase join rides the same
    key, and the rollup collapses to |cohorts|×|offsets| rows before the
    tiny running-sum window (cardinality-bounded at any data scale —
    same argument as daily_user_growth). Revenue sums ride exact 2dp
    decimals and the cumulative sum RE-AGGREGATES the decimal partials
    (cast to double only at the edge) so the cascade is
    order-independent on both engines."""
    ev = table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.floor(
                F.datediff(F.date_trunc("day", "ts"), "cohort_week") / 7
            ).alias("week_offset"),
            dec2("value").alias("v"),
        )
    )
    cell = purchases.groupBy("cohort_week", "week_offset").agg(
        F.countDistinct("user_id").alias("n_buyers"),
        F.sum("v").alias("rev_dec"),
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return cell.select(
        F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
        "week_offset",
        "n_buyers",
        F.col("rev_dec").cast("double").alias("revenue"),
        F.sum("rev_dec").over(w).cast("double").alias("cumulative_ltv"),
    )


@query(
    "events_time_to_convert",
    oracle="""
        WITH spans AS (
            SELECT user_id,
                   epoch(MIN(CASE WHEN event_type = 'purchase' THEN ts END))
                   - epoch(MIN(CASE WHEN event_type = 'view' THEN ts END))
                       AS delta_s
            FROM events GROUP BY user_id
        ),
        conv AS (
            SELECT delta_s FROM spans WHERE delta_s >= 0
        ),
        v AS (SELECT list_sort(list(delta_s)) AS a FROM conv)
        SELECT CAST(len(a) AS BIGINT) AS n_converted,
               a[CAST(floor(CAST(0.5 AS DOUBLE) * (len(a) - 1)) AS INTEGER) + 1]
                   * ((floor(CAST(0.5 AS DOUBLE) * (len(a) - 1)) + 1) - CAST(0.5 AS DOUBLE) * (len(a) - 1))
               + COALESCE(a[CAST(floor(CAST(0.5 AS DOUBLE) * (len(a) - 1)) AS INTEGER) + 2], 0)
                   * (CAST(0.5 AS DOUBLE) * (len(a) - 1) - floor(CAST(0.5 AS DOUBLE) * (len(a) - 1)))
                   AS median_s,
               a[CAST(floor(CAST(0.9 AS DOUBLE) * (len(a) - 1)) AS INTEGER) + 1]
                   * ((floor(CAST(0.9 AS DOUBLE) * (len(a) - 1)) + 1) - CAST(0.9 AS DOUBLE) * (len(a) - 1))
               + COALESCE(a[CAST(floor(CAST(0.9 AS DOUBLE) * (len(a) - 1)) AS INTEGER) + 2], 0)
                   * (CAST(0.9 AS DOUBLE) * (len(a) - 1) - floor(CAST(0.9 AS DOUBLE) * (len(a) - 1)))
                   AS p90_s
        FROM v
    """,
    tags=("events", "percentile", "funnel"),
)
def events_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: per user, seconds from first 'view'
    to first 'purchase' (negative spans — purchase before any view — are
    non-conversions and drop), then exact median/p90 over the converted
    population. The funnel-latency readout next to events_funnel_counts'
    volume readout.

    One user_id shuffle computes both firsts as conditional MINs in a
    single pass (no self-join of two filtered scans); the percentile
    uses the repo's two-sided interpolation op tree (agg_percentiles)
    on epoch-second doubles, bit-identical across engines. Population
    percentiles over per-user scalars collapse the frame to |users|
    before the sort — the global sorted-array is the declared exact
    form, approx_percentile is the stated 100 TB path."""
    ev = table(spark, sf_dir, "events")
    epoch = F.col("ts").cast("double")
    spans = ev.groupBy("user_id").agg(
        (
            F.min(F.when(F.col("event_type") == "purchase", epoch))
            - F.min(F.when(F.col("event_type") == "view", epoch))
        ).alias("delta_s")
    )
    conv = spans.where(F.col("delta_s") >= 0)
    g = conv.agg(F.array_sort(F.collect_list("delta_s")).alias("a"))
    exprs = []
    for name, p in (("median_s", 0.5), ("p90_s", 0.9)):
        pos = F.lit(p) * (F.size("a") - 1)
        lo = F.floor(pos).cast("int")
        vlo = F.element_at("a", lo + 1)
        vhi = F.element_at("a", lo + 2)
        exprs.append(
            F.when(lo + 2 > F.size("a"), vlo)
            .otherwise(vlo * ((lo + 1) - pos) + vhi * (pos - lo))
            .alias(name)
        )
    return g.select(F.size("a").cast("long").alias("n_converted"), *exprs)


@query(
    "events_seasonality_profile",
    oracle="""
        SELECT isodow(ts) AS dow, hour(ts) AS hod,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
                   AS avg_value
        FROM events GROUP BY 1, 2
    """,
    tags=("events", "agg", "timeseries"),
)
def events_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality heat-map input: event intensity and mean value per
    (ISO day-of-week × hour-of-day) cell — the traffic-shape profile
    behind capacity planning and anomaly baselines.

    Day-of-week numbering is the classic cross-engine trap: Spark's
    dayofweek() is 1=Sunday, DuckDB's dayofweek() is 0=Sunday; the ISO
    convention (1=Monday) is expressed as weekday()+1 in Spark and
    isodow() in DuckDB — pinned by the hash. One map-side-combining
    aggregation to a ≤168-row frame; averages divide an exact decimal
    sum by the count in double."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy(
        (F.weekday("ts") + 1).alias("dow"), F.hour("ts").alias("hod")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.sum(dec2("value")).cast("double") / F.count(F.lit(1))).alias(
            "avg_value"
        ),
    )


@query(
    "events_cep_pattern",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_id, ts, event_type,
                   lag(event_type, 1) OVER w AS p1,
                   lag(event_type, 2) OVER w AS p2
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT user_id, event_id AS third_error_event,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS detected_at
        FROM seq
        WHERE event_type = 'error' AND p1 = 'error' AND p2 = 'error'
    """,
    tags=("events", "window", "cep"),
)
def events_cep_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-event-processing pattern detection without a
    MATCH_RECOGNIZE operator (Spark has none): 'three consecutive errors
    from one user' — the alerting pattern — as a lag-chain over the
    per-user ordered stream. Fixed-length patterns compile to lag
    conjunctions (this shape); variable-length ones compile to the
    gaps-and-islands machinery (events_gaps_islands). One user_id
    shuffle, pattern evaluated row-local in the window stage; emits the
    completing event of each match (overlapping matches emit one row
    each, the standard CEP 'every match' policy)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.lag("event_type", 1).over(w).alias("p1"),
        F.lag("event_type", 2).over(w).alias("p2"),
    )
    return seq.where(
        (F.col("event_type") == "error")
        & (F.col("p1") == "error")
        & (F.col("p2") == "error")
    ).select(
        "user_id",
        F.col("event_id").alias("third_error_event"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("detected_at"),
    )


@query(
    "events_top_paths",
    oracle="""
        WITH seq AS (
            SELECT user_id,
                   array_to_string(
                       (list(event_type ORDER BY ts, event_id))[1:5], '>'
                   ) AS path
            FROM events GROUP BY user_id
        )
        SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
        FROM seq GROUP BY path
        ORDER BY n_users DESC, path
        LIMIT 20
    """,
    tags=("events", "sequence", "path"),
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user journeys: each user's first five event types in time
    order joined into a path string, counted across users — the
    product-analytics "common paths" readout (the aggregation half of
    what events_markov_transitions models pairwise).

    One user_id shuffle: collect_list gathers each user's (ts, event_id,
    event_type) triples, array_sort orders them by the total (ts,
    event_id) key — deterministic regardless of arrival order, which is
    what makes the path string hash-stable — and the per-user path
    reduces to ≤5 joined tokens before the second (tiny) path-count
    aggregate. Per-user state is bounded by that user's event count,
    the same guarantee stream_sessionize rides at 100 TB."""
    ev = table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    seq = ev.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "event_type"))
        ).alias("seq")
    )
    path = F.concat_ws(
        ">",
        F.slice(
            F.transform(F.col("seq"), lambda s: s["event_type"]), 1, 5
        ),
    )
    return (
        seq.select(path.alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.desc("n_users"), F.asc("path"))
        .limit(20)
    )


@query(
    "events_gap_histogram",
    oracle="""
        WITH e AS (
            -- integer epoch seconds (floor), matching Spark's
            -- timestamp->long cast; fractional epochs would move
            -- boundary gaps across buckets
            SELECT user_id, ts, event_id,
                   CAST(floor(epoch(ts)) AS BIGINT) AS es
            FROM events
        ),
        g AS (
            SELECT es - lag(es) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS gap_s
            FROM e
        ),
        b AS (
            SELECT CASE
                       WHEN gap_s < 10 THEN 'a_lt_10s'
                       WHEN gap_s < 60 THEN 'b_lt_1m'
                       WHEN gap_s < 600 THEN 'c_lt_10m'
                       WHEN gap_s < 3600 THEN 'd_lt_1h'
                       WHEN gap_s < 86400 THEN 'e_lt_1d'
                       ELSE 'f_ge_1d'
                   END AS bucket,
                   gap_s
            FROM g WHERE gap_s IS NOT NULL
        )
        SELECT bucket,
               CAST(COUNT(*) AS BIGINT) AS n_gaps,
               CAST(MIN(gap_s) AS BIGINT) AS min_gap_s,
               CAST(MAX(gap_s) AS BIGINT) AS max_gap_s
        FROM b GROUP BY bucket
    """,
    tags=("events", "timeseries", "profile"),
)
def events_gap_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap histogram per user stream, bucketed on fixed
    semantic edges (10s/1m/10m/1h/1d) — the cadence profile that picks
    sessionization timeouts and watermark widths (stream_sessionize's
    30-minute gap and the watermark in stream_dedup_watermark are
    exactly the parameters this readout justifies).

    A per-user LAG window (partitioned — parallel, no funnel) over
    epoch seconds, then a groupBy on a 6-value bucket key with map-side
    combine. Bucket edges are integer comparisons (no log-scale float
    boundaries), so every column is integer-exact and hash-checked."""
    ev = table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("long")
    g = ev.select((epoch - F.lag(epoch).over(w)).alias("gap_s")).where(
        F.col("gap_s").isNotNull()
    )
    bucket = (
        F.when(F.col("gap_s") < 10, "a_lt_10s")
        .when(F.col("gap_s") < 60, "b_lt_1m")
        .when(F.col("gap_s") < 600, "c_lt_10m")
        .when(F.col("gap_s") < 3600, "d_lt_1h")
        .when(F.col("gap_s") < 86400, "e_lt_1d")
        .otherwise("f_ge_1d")
    )
    return g.select(bucket.alias("bucket"), "gap_s").groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.min("gap_s").alias("min_gap_s"),
        F.max("gap_s").alias("max_gap_s"),
    )


@query(
    "agg_entropy_by_group",
    oracle="""
        WITH c AS (
            SELECT CAST(date_trunc('day', ts) AS DATE) AS d, event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_i
            FROM events GROUP BY 1, 2
        ),
        t AS (
            SELECT d, SUM(n_i) AS n FROM c GROUP BY d
        )
        SELECT CAST(c.d AS VARCHAR) AS day,
               CAST(t.n AS BIGINT) AS n_events,
               CAST(SUM(CAST(round(
                   -(CAST(c.n_i AS DOUBLE) / CAST(t.n AS DOUBLE))
                   * ln(CAST(c.n_i AS DOUBLE) / CAST(t.n AS DOUBLE)), 9)
                   AS DECIMAL(18,9))) AS DOUBLE) AS entropy_nats
        FROM c JOIN t USING (d)
        GROUP BY c.d, t.n
    """,
    tags=("events", "agg", "profile"),
)
def agg_entropy_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day Shannon entropy of the event-type mix — the drift monitor
    for event pipelines (a day whose entropy collapses is one where a
    single event type flooded the stream; a spike means a new type
    appeared). H = −Σ pᵢ·ln pᵢ in nats over each day's type distribution.

    Two tiny aggregations (day×type counts with map-side combine, then
    day totals joined back — |days|·|types| rows, constant at any event
    volume). Cross-engine exactness uses the perplexity-family trick:
    pᵢ is an integer-ratio double (bit-identical), each −pᵢ·ln pᵢ term
    is rounded to 9dp and summed as DECIMAL — associative, so partial
    aggregation order can't perturb the hash."""
    ev = table(spark, sf_dir, "events")
    c = ev.groupBy(
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("d"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_i"))
    t = c.groupBy("d").agg(F.sum("n_i").alias("n"))
    p = F.col("n_i").cast("double") / F.col("n").cast("double")
    term = F.round(-p * F.log(p), 9).cast("decimal(18,9)")
    return (
        c.join(t, "d")
        .groupBy("d", "n")
        .agg(F.sum(term).cast("double").alias("entropy_nats"))
        .select(
            F.col("d").cast("string").alias("day"),
            F.col("n").alias("n_events"),
            "entropy_nats",
        )
    )


@query(
    "events_user_overlap_jaccard",
    oracle="""
        WITH ut AS (
            SELECT DISTINCT user_id, event_type FROM events
        ),
        sizes AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users
            FROM ut GROUP BY event_type
        ),
        inter AS (
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   CAST(COUNT(*) AS BIGINT) AS n_both
            FROM ut a JOIN ut b
              ON a.user_id = b.user_id AND a.event_type < b.event_type
            GROUP BY 1, 2
        )
        SELECT i.type_a, i.type_b, sa.n_users AS n_a, sb.n_users AS n_b,
               i.n_both,
               CAST(i.n_both AS DOUBLE)
                   / CAST(sa.n_users + sb.n_users - i.n_both AS DOUBLE)
                   AS jaccard
        FROM inter i
        JOIN sizes sa ON sa.event_type = i.type_a
        JOIN sizes sb ON sb.event_type = i.type_b
    """,
    tags=("events", "similarity", "join"),
)
def events_user_overlap_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix: Jaccard similarity between event types'
    user sets (do the users who purchase overlap the users who click?) —
    the segmentation readout behind "people who did A also did B".

    Scale shape: the corpus collapses to DISTINCT (user, type) pairs
    first (one shuffle, ≤|types| rows per user), the self-join fans out
    at most |types|² per user (types are a bounded vocabulary), and the
    bounded sizes frame broadcasts onto the pair counts. The Jaccard is
    an integer-ratio double — bit-identical across engines."""
    ev = table(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    sizes = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_users"))
    a = ut.alias("a")
    b = ut.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sa = sizes.select(
        F.col("event_type").alias("type_a"), F.col("n_users").alias("n_a")
    )
    sb = sizes.select(
        F.col("event_type").alias("type_b"), F.col("n_users").alias("n_b")
    )
    return (
        inter.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_both",
            (
                F.col("n_both").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_both")).cast(
                    "double"
                )
            ).alias("jaccard"),
        )
    )


@query(
    "events_attribution_first_touch",
    oracle="""
        WITH per_user AS (
            SELECT user_id, event_type, value,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS rn
            FROM events
        ),
        first_touch AS (
            SELECT user_id, event_type AS first_type
            FROM per_user WHERE rn = 1
        ),
        conv AS (
            SELECT user_id,
                   SUM(CAST(value AS DECIMAL(18,2))) AS purchase_value
            FROM events WHERE event_type = 'purchase'
            GROUP BY user_id
        )
        SELECT f.first_type,
               CAST(COUNT(c.user_id) AS BIGINT) AS n_converting_users,
               CAST(COALESCE(SUM(c.purchase_value), 0) AS DOUBLE)
                   AS attributed_value
        FROM first_touch f
        LEFT JOIN conv c USING (user_id)
        GROUP BY f.first_type
    """,
    tags=("events", "attribution", "funnel"),
)
def events_attribution_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution: each user's total purchase value is
    credited to the event type that FIRST brought them in (their
    earliest event by the (ts, event_id) total order) — the standard
    marketing-attribution readout, the single-credit complement of the
    funnel counts.

    ONE user_id shuffle computes both sides: min(struct(ts, event_id,
    event_type)) picks the first touch and a conditional decimal sum
    accumulates purchase value in the same aggregate — no second scan,
    no join back to events. The per-type rollup is a tiny second
    aggregate. Values are exact decimals until the final double cast."""
    ev = table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.struct("ts", "event_id", "event_type")).alias("first"),
        F.sum(
            F.when(F.col("event_type") == "purchase", dec2("value"))
        ).alias("purchase_value"),
    )
    return per_user.groupBy(
        F.col("first.event_type").alias("first_type")
    ).agg(
        F.count(F.col("purchase_value")).alias("n_converting_users"),
        F.coalesce(F.sum("purchase_value"), F.lit(0))
        .cast("double")
        .alias("attributed_value"),
    )


@query(
    "events_bot_detection",
    oracle="""
        WITH per_min AS (
            SELECT user_id, date_trunc('minute', ts) AS m,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        ),
        peaks AS (
            SELECT user_id, MAX(n) AS peak_per_min,
                   CAST(SUM(n) AS BIGINT) AS n_events,
                   CAST(COUNT(*) AS BIGINT) AS n_active_minutes
            FROM per_min GROUP BY user_id
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(CASE WHEN peak_per_min >= 5 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_flagged,
               CAST(MAX(peak_per_min) AS BIGINT) AS max_peak_per_min,
               CAST(SUM(CASE WHEN peak_per_min >= 5 THEN n_events ELSE 0
                        END) AS BIGINT) AS n_events_from_flagged
        FROM peaks
    """,
    tags=("events", "quality", "ml"),
)
def events_bot_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-based bot/automation detection — the traffic-hygiene filter a
    training-data pipeline runs before user-generated content enters a
    corpus: a user whose peak event rate hits ≥5 events within one
    minute is flagged, and the summary reports how much event volume the
    flagged cohort contributes (the mass that would be excluded).

    Two cascaded aggregations, both map-side combining: (user, minute)
    counts collapse the stream, per-user peaks collapse the minutes, and
    the final summary is one row. No windows, no joins — the cheapest
    possible shape for a per-entity rate statistic, and every column is
    integer-exact."""
    ev = table(spark, sf_dir, "events")
    per_min = ev.groupBy(
        "user_id", F.date_trunc("minute", F.col("ts")).alias("m")
    ).agg(F.count(F.lit(1)).alias("n"))
    peaks = per_min.groupBy("user_id").agg(
        F.max("n").alias("peak_per_min"),
        F.sum("n").alias("n_events"),
        F.count(F.lit(1)).alias("n_active_minutes"),
    )
    flagged = F.col("peak_per_min") >= 5
    return peaks.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(flagged.cast("bigint")).alias("n_flagged"),
        F.max("peak_per_min").alias("max_peak_per_min"),
        F.sum(F.when(flagged, F.col("n_events")).otherwise(0)).alias(
            "n_events_from_flagged"
        ),
    )
