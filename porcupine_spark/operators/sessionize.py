"""Sessionization: gap-based session assignment over an event stream.

Batch form: the lag+cumsum idiom — flag a new session when the gap to
the previous event of the same user exceeds the threshold, then a
running sum of flags numbers the sessions. Two window passes over ONE
shuffle (both windows share the user_id partitioning, so Spark reuses
the exchange). The streaming twin is ``session_window`` in
streaming/windows.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from porcupine_spark.plans.registry import query
from porcupine_spark.tables import load_table

GAP_SECONDS = 1800


def sessionize(df: DataFrame, key: str, ts: str, order_tiebreak: str, gap_s: int) -> DataFrame:
    """Add a ``session_id`` column (1-based per key) to an event frame."""
    w = W.partitionBy(key).orderBy(ts, order_tiebreak)
    # integer microsecond arithmetic: exact, identical in the oracle
    gap = F.unix_micros(F.col(ts)) - F.lag(F.unix_micros(F.col(ts))).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_s * 1_000_000), 1).otherwise(0)
    wrun = w.rowsBetween(W.unboundedPreceding, 0)
    return df.withColumn("__new", is_new).withColumn(
        "session_id", F.sum("__new").over(wrun)
    ).drop("__new")


@query(
    "sessionize_events",
    f"""
    WITH flagged AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {GAP_SECONDS} * 1000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id, event_id, ts, value,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
      FROM flagged
    )
    SELECT user_id, session_id,
           COUNT(*) AS n_events,
           CAST(MIN(ts) AS TIMESTAMP_NS) AS session_start,
           CAST(MAX(ts) AS TIMESTAMP_NS) AS session_end,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
    tags=("sessionize", "window"),
    doc="Gap-based sessionization (30 min) via lag+cumsum, then per-"
    "session rollup. epoch() diff on both sides; decimal-sum for the "
    "value rollup.",
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    s = sessionize(ev, key="user_id", ts="ts", order_tiebreak="event_id", gap_s=GAP_SECONDS)
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("total_value"),
    )


@query(
    "funnel_view_click_purchase",
    """
    WITH firsts AS (
      SELECT user_id,
             MIN(ts) FILTER (WHERE event_type = 'view') AS t_view,
             MIN(ts) FILTER (WHERE event_type = 'click') AS t_click,
             MIN(ts) FILTER (WHERE event_type = 'purchase') AS t_purchase
      FROM events GROUP BY user_id
    ),
    staged AS (
      SELECT user_id,
             CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END AS reached_view,
             CASE WHEN t_view IS NOT NULL AND t_click > t_view THEN 1 ELSE 0 END
               AS reached_click,
             CASE WHEN t_view IS NOT NULL AND t_click > t_view AND t_purchase > t_click
                  THEN 1 ELSE 0 END AS reached_purchase
      FROM firsts
    )
    SELECT CAST(SUM(reached_view) AS BIGINT) AS n_view,
           CAST(SUM(reached_click) AS BIGINT) AS n_view_click,
           CAST(SUM(reached_purchase) AS BIGINT) AS n_view_click_purchase,
           COUNT(*) AS n_users
    FROM staged
    """,
    tags=("funnel", "agg"),
    doc="Ordered funnel (view -> click -> purchase): per-user first "
    "event times per stage in ONE conditional-min pass, stage "
    "predicates enforce strict ordering, then a global rollup. Two "
    "aggregations, one shuffle on user_id - no self-joins, which is "
    "what makes the funnel viable at event-log scale.",
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    def first_ts(etype: str):
        return F.min(F.when(F.col("event_type") == etype, F.col("ts")))

    firsts = ev.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    reached_view = F.when(F.col("t_view").isNotNull(), 1).otherwise(0)
    reached_click = F.when(
        F.col("t_view").isNotNull() & (F.col("t_click") > F.col("t_view")), 1
    ).otherwise(0)
    reached_purchase = F.when(
        F.col("t_view").isNotNull()
        & (F.col("t_click") > F.col("t_view"))
        & (F.col("t_purchase") > F.col("t_click")),
        1,
    ).otherwise(0)
    staged = firsts.select(
        reached_view.alias("reached_view"),
        reached_click.alias("reached_click"),
        reached_purchase.alias("reached_purchase"),
    )
    return staged.agg(
        F.sum("reached_view").alias("n_view"),
        F.sum("reached_click").alias("n_view_click"),
        F.sum("reached_purchase").alias("n_view_click_purchase"),
        F.count(F.lit(1)).alias("n_users"),
    )


@query(
    "retention_cohorts",
    """
    WITH firsts AS (
      SELECT user_id, MIN(date_trunc('week', ts)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS activity_week
      FROM events
    )
    SELECT CAST(f.cohort_week AS TIMESTAMP_NS) AS cohort_week,
           CAST(DATEDIFF('week', f.cohort_week, a.activity_week) AS BIGINT) AS week_offset,
           COUNT(*) AS n_users
    FROM activity a JOIN firsts f USING (user_id)
    GROUP BY 1, 2
    """,
    tags=("events", "cohort"),
    doc="Weekly retention cohorts: users grouped by first-seen week, "
    "counted in each later activity week (offset in weeks). Two "
    "user-keyed aggregations + one join on user_id + one small final "
    "agg — every shuffle moves one row per user(-week), never raw "
    "events; the cohort matrix itself is tiny at any corpus size.",
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    week = F.date_trunc("week", F.col("ts"))
    # join-free: cohort week = min activity week via a window over the
    # already-distinct (user, week) rows — at scale this saves the
    # firsts aggregation AND the user-keyed join (no hash tables, no
    # broadcast dependency); three bounded exchanges total, each moving
    # one row per user(-week)
    activity = ev.select("user_id", week.alias("activity_week")).distinct()
    cohort = F.min("activity_week").over(W.partitionBy("user_id"))
    # offset must be CALENDAR weeks between week-starts (DuckDB
    # datediff('week')), not elapsed-days/7: integer weeks between
    # Monday-truncated timestamps are exactly datediff(day)/7
    with_cohort = activity.select(
        cohort.alias("cohort_week"), "activity_week"
    )
    offset = (
        F.datediff(F.col("activity_week"), F.col("cohort_week")) / 7
    ).cast("long")
    return (
        with_cohort.groupBy("cohort_week", offset.alias("week_offset"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "daily_new_users_cumulative",
    """
    WITH first_seen AS (
      SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY user_id
    ),
    daily AS (
      SELECT CAST(date_trunc('day', first_ts) AS TIMESTAMP_NS) AS day,
             COUNT(*) AS new_users
      FROM first_seen GROUP BY 1
    )
    SELECT day, new_users,
           CAST(SUM(new_users) OVER (ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_users
    FROM daily
    """,
    tags=("events", "window"),
    doc="New-vs-returning user accounting: first-seen day per user "
    "(one groupBy min — per-user parallel, the only shuffle that "
    "scales with data), daily new-user counts, and a cumulative total. "
    "The running sum's unpartitioned window runs over the DAILY "
    "aggregate — bounded by calendar days, a few hundred rows at any "
    "corpus size — so the classic 'global cumsum single reducer' trap "
    "never sees more than that.",
)
def daily_new_users_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    daily = first_seen.groupBy(
        F.date_trunc("day", "first_ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("new_users"))
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    return daily.select(
        "day", "new_users", F.sum("new_users").over(w).alias("cum_users")
    )


FUNNEL_WINDOW = "1 hour"


@query(
    "funnel_time_bounded",
    """
    WITH w1 AS (
      SELECT user_id, ts, event_type,
             MIN(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id) AS t_view
      FROM events
    ),
    w2 AS (
      SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > t_view THEN ts END)
               OVER (PARTITION BY user_id) AS t_click
      FROM w1
    ),
    w3 AS (
      SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > t_click THEN ts END)
               OVER (PARTITION BY user_id) AS t_purchase
      FROM w2
    )
    SELECT user_id,
           MAX(CASE
             WHEN t_purchase IS NOT NULL
                  AND t_purchase <= t_view + INTERVAL 1 HOUR THEN 3
             WHEN t_click IS NOT NULL
                  AND t_click <= t_view + INTERVAL 1 HOUR THEN 2
             WHEN t_view IS NOT NULL THEN 1
             ELSE 0 END) AS funnel_depth
    FROM w3 GROUP BY user_id
    """,
    tags=("funnel", "window"),
    doc="Time-bounded ordered funnel (the ClickHouse windowFunnel "
    "semantics): per user, the chain first-view -> first-click-after-"
    "view -> first-purchase-after-that-click must complete within 1h "
    "of the view. Three sequential window passes over the SAME "
    "user_id partitioning - Catalyst plans them behind one exchange, "
    "so the whole funnel costs a single shuffle of the event log; no "
    "self-joins, no per-user event collections.",
)
def funnel_time_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    wu = W.partitionBy("user_id")
    w1 = ev.withColumn(
        "t_view",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(wu),
    )
    w2 = w1.withColumn(
        "t_click",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts") > F.col("t_view")),
                F.col("ts"),
            )
        ).over(wu),
    )
    w3 = w2.withColumn(
        "t_purchase",
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t_click")),
                F.col("ts"),
            )
        ).over(wu),
    )
    bound = F.col("t_view") + F.expr(f"INTERVAL {FUNNEL_WINDOW}")
    depth = (
        F.when(F.col("t_purchase").isNotNull() & (F.col("t_purchase") <= bound), 3)
        .when(F.col("t_click").isNotNull() & (F.col("t_click") <= bound), 2)
        .when(F.col("t_view").isNotNull(), 1)
        .otherwise(0)
    )
    return w3.groupBy("user_id").agg(F.max(depth).alias("funnel_depth"))


@query(
    "event_transition_counts",
    f"""
    WITH seq AS (
      SELECT session_key, event_type,
             lead(event_type) OVER (PARTITION BY session_key
                                    ORDER BY ts, event_id) AS next_type
      FROM (
        SELECT user_id, event_id, ts, event_type,
               concat(user_id, ':', CAST(SUM(is_new) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT))
                 AS session_key
        FROM (
          SELECT user_id, event_id, ts, event_type,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                           > {GAP_SECONDS} * 1000000
                      THEN 1 ELSE 0 END AS is_new
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
      )
    )
    SELECT event_type AS from_type, next_type AS to_type,
           COUNT(*) AS n_transitions
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    """,
    tags=("sessionize", "window", "markov"),
    doc="First-order Markov transition matrix over within-session event "
    "paths: sessionize (lag+cumsum), lead() the next event type inside "
    "each session, count (from, to) pairs. All three window passes "
    "share the user_id partitioning, so the event log shuffles once; "
    "the final count is a 25-cell aggregate (|types|^2) with map-side "
    "partials - nothing here grows with corpus size except the one "
    "keyed shuffle. Exact integer output.",
)
def event_transition_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    s = sessionize(ev, key="user_id", ts="ts", order_tiebreak="event_id", gap_s=GAP_SECONDS)
    # lead over the SAME user_id window the sessionizer used (exchange
    # reuse - one shuffle total); a transition only counts when the next
    # event is in the same session, so guard on lead(session_id).
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = s.withColumn("next_type", F.lead("event_type").over(w)).withColumn(
        "next_sess", F.lead("session_id").over(w)
    )
    return (
        seq.where(F.col("next_type").isNotNull() & (F.col("next_sess") == F.col("session_id")))
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


@query(
    "event_disorder_stats",
    """
    WITH seq AS (
      SELECT user_id, ts,
             MAX(ts) OVER (PARTITION BY user_id ORDER BY event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS high_water
      FROM events
    )
    SELECT user_id,
           COUNT(*) AS n_events,
           COUNT(*) FILTER (WHERE ts < high_water) AS n_late,
           CAST(COALESCE(MAX(CASE WHEN ts < high_water
                         THEN epoch_us(high_water) - epoch_us(ts) END), 0)
             AS BIGINT) AS max_lateness_us
    FROM seq
    GROUP BY user_id
    """,
    tags=("sessionize", "streaming", "monitoring"),
    doc="Event-time disorder profile - the watermark-sizing analytic: "
    "replay each user's events in ARRIVAL order (event_id is the "
    "ingest sequence), track the event-time high-water mark, and "
    "measure how many events arrive late and by how much. "
    "max_lateness_us is exactly the per-key watermark delay that "
    "would have admitted every event - the number you set "
    "withWatermark() from. One keyed window pass sharing the "
    "aggregation's partitioning (single shuffle); lateness is exact "
    "integer microseconds.",
)
def event_disorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    seq = ev.withColumn("high_water", F.max("ts").over(w))
    late = F.col("ts") < F.col("high_water")
    lateness = F.unix_micros(F.col("high_water")) - F.unix_micros(F.col("ts"))
    return seq.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count(F.when(late, 1)).alias("n_late"),
        F.coalesce(F.max(F.when(late, lateness)), F.lit(0)).alias("max_lateness_us"),
    )


@query(
    "twap_user_value",
    """
    WITH seq AS (
      SELECT user_id,
             CAST(value AS DECIMAL(18,6)) AS v,
             lead(epoch_us(ts)) OVER w - epoch_us(ts) AS dt_us
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           COUNT(*) AS n_intervals,
           CAST(SUM(dt_us) AS BIGINT) AS total_us,
           CAST(CAST(SUM(v * CAST(dt_us AS DECIMAL(20,0))) * 1000000 AS HUGEINT)
                  // CAST(SUM(dt_us) AS HUGEINT) AS BIGINT) AS twap_micro
    FROM seq WHERE dt_us IS NOT NULL
    GROUP BY user_id
    """,
    tags=("window", "timeseries"),
    doc="Time-weighted average value per user: each event's value is "
    "held until the next event (step-function integral / total time), "
    "the metrics-correct mean for irregularly sampled series where "
    "the arithmetic mean over-weights bursts. Weights are exact "
    "integer microseconds from the lead() window (sharing the "
    "aggregation's user_id exchange - one shuffle), the integral "
    "accumulates in decimal (narrow enough that NEITHER engine "
    "overflows 38 digits and silently falls back to double), and the mean is emitted as "
    "integer micro-units via truncating division (decimal div / "
    "HUGEINT //) - the same bit-stable recipe as bm25_topk, dodging "
    "the double-rounding that wide-decimal->double casts disagree on.",
)
def twap_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    seq = ev.select(
        "user_id",
        F.col("value").cast("decimal(18,6)").alias("v"),
        (F.lead(us).over(w) - us).alias("dt_us"),
    ).where(F.col("dt_us").isNotNull())
    return seq.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum("dt_us").alias("total_us"),
        F.expr(
            "(CAST(SUM(v * CAST(dt_us AS DECIMAL(20,0))) * 1000000"
            " AS DECIMAL(38,0))) div SUM(dt_us)"
        ).alias("twap_micro"),
    )


ROLLING_WINDOW_S = 3600


@query(
    "rolling_distinct_types",
    f"""
    SELECT e.user_id, e.event_id,
           CAST(e.ts AS TIMESTAMP_NS) AS ts,
           (SELECT COUNT(DISTINCT w.event_type)
            FROM events w
            WHERE w.user_id = e.user_id
              AND w.ts > e.ts - INTERVAL {ROLLING_WINDOW_S} SECOND
              AND w.ts <= e.ts) AS n_types_1h
    FROM events e
    """,
    tags=("window", "timeseries"),
    doc="Rolling DISTINCT count over a time-range window: per event, "
    "how many distinct event types the user produced in the trailing "
    "hour - the engagement-breadth / anomaly feature. Spark has no "
    "distinct range-window aggregate, so this composes "
    "size(array_distinct(collect_list)) over a rangeBetween window on "
    "unix_micros: per-window state is bounded by window row count "
    "(and could be bounded by |types| via collect_set), rides the "
    "same user_id exchange as any window query. The oracle is an "
    "independent correlated-subquery formulation, not a "
    "transliteration.",
)
def rolling_distinct_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = (
        W.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-(ROLLING_WINDOW_S * 1_000_000 - 1), 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.size(F.array_distinct(F.collect_list("event_type").over(w))).cast(
            "long"
        ).alias("n_types_1h"),
    )


@query(
    "peak_concurrent_sessions",
    f"""
    WITH flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                       > {GAP_SECONDS} * 1000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id, session_id, MIN(ts) AS s, MAX(ts) AS e
      FROM (
        SELECT user_id, ts,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS session_id
        FROM flagged
      )
      GROUP BY user_id, session_id
    ),
    deltas AS (
      SELECT s AS t, 1 AS d FROM sessions
      UNION ALL
      SELECT e AS t, -1 AS d FROM sessions
    ),
    swept AS (
      SELECT t, d,
             CAST(SUM(d) OVER (ORDER BY t, d DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS concurrency
      FROM deltas
    ),
    day_summary AS (
      SELECT date_trunc('day', t) AS day,
             MAX(concurrency) AS within_max,
             SUM(d) AS day_delta
      FROM swept GROUP BY 1
    ),
    spine AS (
      SELECT UNNEST(generate_series(
        (SELECT MIN(day) FROM day_summary),
        (SELECT MAX(day) FROM day_summary),
        INTERVAL 1 DAY)) AS day
    ),
    carried AS (
      SELECT sp.day, ds.within_max,
             CAST(COALESCE(
               SUM(ds.day_delta) OVER (
                 ORDER BY sp.day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS carry_in
      FROM spine sp LEFT JOIN day_summary ds ON ds.day = sp.day
    )
    SELECT CAST(day AS TIMESTAMP_NS) AS day,
           GREATEST(COALESCE(within_max, 0), carry_in) AS peak_concurrent
    FROM carried
    """,
    tags=("sessionize", "interval"),
    doc="Peak concurrent sessions per day - the interval-algebra sweep: "
    "each session (closed [start, end], gap-sessionized) contributes "
    "+1/-1 boundary deltas; a running sum over the time-ordered "
    "boundary stream IS the concurrency curve. Day peaks CARRY ACROSS "
    "MIDNIGHT: a day's peak is max(carry-in concurrency at 00:00, "
    "within-day max), with the carry computed as a TIE-FREE prefix sum "
    "of per-day delta totals over a day spine (not a last-row pick, "
    "which is nondeterministic when boundary instants collide) "
    "- so sessions spanning a whole day (no boundary that day) still "
    "hold its level up, which a boundary-only group-by silently "
    "drops. Ties order +1 before -1, so touching sessions count as "
    "concurrent (mirrored in the oracle). The sweep is HIERARCHICAL "
    "so no window ever sees the whole boundary stream: a DAY-KEYED "
    "window computes each day's RELATIVE running sum (within-day sum "
    "= global running sum minus that day's carry-in, since carry-in "
    "is exactly the cumulative delta through the previous midnight), "
    "the only global window is the prefix sum over the BOUNDED day "
    "spine, and peak(day) = carry_in + max(relative_max, 0) — "
    "identical results to the single global sweep, but every "
    "unbounded window is partitioned by day.",
)
def peak_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    s = sessionize(ev, key="user_id", ts="ts", order_tiebreak="event_id", gap_s=GAP_SECONDS)
    sessions = s.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("s"), F.max("ts").alias("e")
    )
    deltas = (
        sessions.select(F.col("s").alias("t"), F.lit(1).alias("d"))
        .unionByName(sessions.select(F.col("e").alias("t"), F.lit(-1).alias("d")))
        .withColumn("day", F.date_trunc("day", F.col("t")))
    )
    # day-keyed sweep: relative concurrency within the day (starts at 0
    # each midnight); the global level is recovered by adding carry_in.
    # Partitioning by day keeps every boundary window bounded by one
    # day's sessions instead of the whole corpus (the W-flag fix).
    wsweep = (
        W.partitionBy("day")
        .orderBy("t", F.col("d").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    swept = deltas.select("day", "d", F.sum("d").over(wsweep).alias("rel"))
    # a day's CLOSING concurrency = cumulative delta total through the
    # end of that day. Deriving it as a prefix sum of per-day SUM(d)
    # over the day spine is tie-free; picking the "last" sweep row via
    # max_by keyed on (t, d) is NOT unique when several sessions share
    # a boundary instant and direction — among tied rows the running
    # sums differ, so max_by/arg_max choose arbitrarily and the
    # carry-in could be off by up to k-1 (both engines, independently).
    day_summary = swept.groupBy("day").agg(
        F.max("rel").alias("max_rel"),
        F.sum("d").alias("day_delta"),
    )
    bounds = day_summary.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    wcarry = W.orderBy("day").rowsBetween(W.unboundedPreceding, -1)
    carried = (
        spine.join(day_summary, "day", "left")
        .withColumn(
            "carry_in",
            F.coalesce(F.sum("day_delta").over(wcarry), F.lit(0)).cast("long"),
        )
    )
    # peak = max(carry_in + max_rel, carry_in): a day of only session
    # ends has max_rel < 0 and peaks at its carry-in; an empty spine
    # day peaks at carry-in too (max_rel -> 0)
    return carried.select(
        "day",
        (
            F.col("carry_in")
            + F.greatest(F.coalesce("max_rel", F.lit(0)), F.lit(0))
        ).alias("peak_concurrent"),
    )




ZSCORE_K = 3  # flag |z| > 3


@query(
    "value_zscore_outliers_exact",
    f"""
    WITH u AS (
      SELECT event_id, user_id, ts, value,
             CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS HUGEINT) AS xi
      FROM events
    ),
    st AS (
      SELECT COUNT(*) AS n, SUM(xi) AS s, SUM(xi * xi) AS sxx FROM u
    )
    SELECT u.event_id, u.user_id, CAST(u.ts AS TIMESTAMP_NS) AS ts, u.value
    FROM u CROSS JOIN st
    WHERE (st.n * u.xi - st.s) * (st.n * u.xi - st.s)
          > {ZSCORE_K * ZSCORE_K} * (st.n * st.sxx - st.s * st.s)
    """,
    tags=("statistics", "monitoring"),
    doc="Global z-score outliers with ZERO floating point: |z| > 3 is "
    "equivalent to (n*x - s)^2 > 9*(n*sxx - s^2) after scaling values "
    "to exact integer micro-units, so the flag is a pure integer "
    "comparison - no mean, no stddev, no sqrt, no rounding anywhere, "
    "bit-identical across engines BY CONSTRUCTION rather than by "
    "careful rounding analysis. The corpus-stats row is the justified "
    "1-row broadcast; the filter itself is a scan-side predicate. "
    "Magnitudes stay under 38 digits for value*1e6 < 1e13 and n < "
    "1e12 (documented domain; widen the scaling or shard the moments "
    "past that).",
)
def value_zscore_outliers_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    u = ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        (F.col("value").cast("decimal(18,6)") * 1_000_000)
        .cast("bigint")
        .alias("xi"),
    )
    st = u.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xi").alias("s"),
        F.sum(dec(F.col("xi")) * F.col("xi")).alias("sxx"),
    )
    j = u.crossJoin(F.broadcast(st))
    dev = dec(F.col("n")) * F.col("xi") - F.col("s")
    bound = F.lit(ZSCORE_K * ZSCORE_K) * (
        dec(F.col("n")) * F.col("sxx") - dec(F.col("s")) * F.col("s")
    )
    return j.where(dev * dev > bound).select("event_id", "user_id", "ts", "value")


@query(
    "longest_error_run",
    """
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn_all,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn_type
      FROM events
    ),
    islands AS (
      SELECT user_id, COUNT(*) AS run_len,
             CAST(MIN(ts) AS TIMESTAMP_NS) AS run_start
      FROM seq WHERE event_type = 'error'
      GROUP BY user_id, rn_all - rn_type
    ),
    ranked AS (
      SELECT user_id, run_len, run_start,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY run_len DESC, run_start) AS rk
      FROM islands
    )
    SELECT user_id, run_len AS longest_error_run, run_start
    FROM ranked WHERE rk = 1
    """,
    tags=("window", "gaps-islands", "monitoring"),
    doc="Longest consecutive-error streak per user - the gaps-and-"
    "islands shape (health-monitoring's 'how bad did it get'). "
    "Island id = difference of two row_numbers (overall vs per-type), "
    "constant exactly within a run of equal types - no iteration, no "
    "self-join; both window passes and the rollup share the user_id "
    "exchange. Deterministic winner via (len DESC, start) tiebreak.",
)
def longest_error_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w_all = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "event_type", "ts", "event_id",
        F.row_number().over(w_all).alias("rn_all"),
        F.row_number().over(w_type).alias("rn_type"),
    ).where(F.col("event_type") == "error")
    islands = seq.groupBy(
        "user_id", (F.col("rn_all") - F.col("rn_type")).alias("island")
    ).agg(F.count(F.lit(1)).alias("run_len"), F.min("ts").alias("run_start"))
    wr = W.partitionBy("user_id").orderBy(F.col("run_len").desc(), "run_start")
    return (
        islands.withColumn("rk", F.row_number().over(wr))
        .where(F.col("rk") == 1)
        .select("user_id", F.col("run_len").alias("longest_error_run"), "run_start")
    )


PATH_TOPK = 10
PATH_MAX_LEN = 5


@query(
    "top_session_paths",
    f"""
    WITH flagged AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                       > {GAP_SECONDS} * 1000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, event_id, ts, event_type,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM flagged
    ),
    paths AS (
      SELECT user_id, session_id,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS path,
             COUNT(*) AS path_len
      FROM sess
      GROUP BY user_id, session_id
      HAVING COUNT(*) <= {PATH_MAX_LEN}
    ),
    counted AS (
      SELECT path, COUNT(*) AS n_sessions FROM paths GROUP BY path
    )
    SELECT path, n_sessions FROM counted
    ORDER BY n_sessions DESC, path LIMIT {PATH_TOPK}
    """,
    tags=("sessionize", "path-mining"),
    doc="Top complete session paths (event-type sequences, sessions up "
    "to 5 events) - the UX path-mining report. The path string builds "
    "INSIDE the per-session group-by (ordered string_agg / sorted "
    "collect_list), so nothing longer than one session's events ever "
    "concatenates, and the bounded-length gate keeps the path-string "
    "domain finite; top-k is TakeOrderedAndProject with a "
    "deterministic (count, path) tiebreak.",
)
def top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    s = sessionize(ev, key="user_id", ts="ts", order_tiebreak="event_id", gap_s=GAP_SECONDS)
    paths = (
        s.groupBy("user_id", "session_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("ts"), F.col("event_id"), F.col("event_type")
                            )
                        )
                    ),
                    lambda r: r["event_type"],
                ),
                ">",
            ).alias("path"),
            F.count(F.lit(1)).alias("path_len"),
        )
        .where(F.col("path_len") <= PATH_MAX_LEN)
    )
    counted = paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_sessions"))
    return counted.orderBy(F.col("n_sessions").desc(), "path").limit(PATH_TOPK)


BURST_FACTOR = 5  # flag when the peak hour is >5x the user's mean rate


@query(
    "event_rate_burst_users",
    f"""
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS us, epoch_us(ts) // 3600000000 AS hr
      FROM events
    ),
    hourly AS (
      SELECT user_id, hr, COUNT(*) AS c FROM e GROUP BY user_id, hr
    ),
    per_user AS (
      SELECT e.user_id,
             COUNT(*) AS n_events,
             (MAX(us) - MIN(us)) // 3600000000 + 1 AS span_hours
      FROM e GROUP BY e.user_id
    ),
    peak AS (
      SELECT user_id, MAX(c) AS peak_hour_events FROM hourly GROUP BY user_id
    )
    SELECT p.user_id, p.n_events, p.span_hours, k.peak_hour_events,
           CAST(CAST(k.peak_hour_events AS HUGEINT) * p.span_hours * 1000000
                // p.n_events AS BIGINT) AS burst_ratio_micro,
           CAST(CASE WHEN CAST(k.peak_hour_events AS HUGEINT) * p.span_hours
                          > {BURST_FACTOR} * CAST(p.n_events AS HUGEINT)
                     THEN 1 ELSE 0 END AS BIGINT) AS flagged
    FROM per_user p JOIN peak k USING (user_id)
    """,
    tags=("events", "monitoring", "quality"),
    doc=f"Bot/abuse burst detection: a user whose single busiest hour "
    f"holds more than {BURST_FACTOR}x their lifetime mean hourly rate "
    f"(peak * span_hours > {BURST_FACTOR} * n, cross-multiplied - no "
    f"division in the test) is flagged; the ratio is also reported in "
    f"integer micro-units. Human activity spreads; scrapers and replay "
    f"scripts spike. Two map-side-combined aggregations "
    f"((user, hour) then user) - the hourly table is the shuffle "
    f"payload and it is bounded by active user-hours, not events.",
)
def event_rate_burst_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("us"),
        F.expr("unix_micros(ts) div 3600000000").alias("hr"),
    )
    hourly = e.groupBy("user_id", "hr").agg(F.count(F.lit(1)).alias("c"))
    per_user = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr("(MAX(us) - MIN(us)) div 3600000000 + 1").alias("span_hours"),
    )
    peak = hourly.groupBy("user_id").agg(F.max("c").alias("peak_hour_events"))
    return (
        per_user.join(peak, "user_id")
        .select(
            "user_id",
            "n_events",
            "span_hours",
            "peak_hour_events",
            F.expr(
                "CAST(CAST(peak_hour_events AS DECIMAL(38,0)) * span_hours"
                " * 1000000 div n_events AS DECIMAL(38,0))"
            )
            .cast("long")
            .alias("burst_ratio_micro"),
            F.expr(
                f"CAST(CASE WHEN CAST(peak_hour_events AS DECIMAL(38,0)) * span_hours"
                f" > {BURST_FACTOR} * CAST(n_events AS DECIMAL(38,0))"
                f" THEN 1 ELSE 0 END AS BIGINT)"
            ).alias("flagged"),
        )
    )


# Two-level-scan bucket width over ARRIVAL time: 6h of arrival per
# bucket. Size to hold ~sqrt(n) rows per bucket at the working scale
# (local: 100k events / ~90 days -> ~280 rows per 6h bucket; a
# cluster-scale run picks span/sqrt(n)).
SCAN_BUCKET_US = 21_600_000_000

# Deterministic replay of a realistic ingest: each event arrives
# delay = md5("lat:"||event_id) % 900000 ms (0..15 min) after its event
# time — the corpus parquet is globally time-ordered, so replaying raw
# ingest order would make every event on-time and the audit degenerate.
# (arrival, event_id) is a unique total order.
_LAT_DELAY_SQL = (
    "(CAST(concat('0x', substr(md5(concat('lat:', CAST(event_id AS VARCHAR))),"
    " 1, 15)) AS BIGINT) % 900000) * 1000"
)


@query(
    "global_watermark_audit",
    f"""
    WITH arr AS (
      SELECT event_id, epoch_us(ts) AS tsu,
             epoch_us(ts) + {_LAT_DELAY_SQL} AS arr_us
      FROM events
    ),
    seq AS (
      SELECT tsu,
             MAX(tsu) OVER (ORDER BY arr_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hw
      FROM arr
    ),
    lat AS (
      SELECT CASE WHEN hw IS NULL OR tsu >= hw THEN 0 ELSE hw - tsu END
               AS lateness_us
      FROM seq
    ),
    banded AS (
      SELECT CASE WHEN lateness_us = 0 THEN 'on_time'
                  WHEN lateness_us <= 60000000 THEN 'le_1m'
                  WHEN lateness_us <= 600000000 THEN 'le_10m'
                  WHEN lateness_us <= 3600000000 THEN 'le_1h'
                  ELSE 'gt_1h' END AS band,
             CASE WHEN lateness_us > 600000000 THEN 1 ELSE 0 END AS would_drop_10m
      FROM lat
    ),
    tot AS (SELECT COUNT(*) AS n FROM banded)
    SELECT band, CAST(MAX(would_drop_10m) AS BIGINT) AS would_drop_10m,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(*) * 1000000 // MAX(tot.n) AS BIGINT) AS share_ppm
    FROM banded, tot
    GROUP BY band
    """,
    tags=("sessionize", "streaming", "monitoring", "scan"),
    doc="GLOBAL watermark-lateness audit: replay events in modeled "
    "arrival order (event time + deterministic 0-15 min hash jitter — "
    "the parquet is time-ordered, so raw ingest order is degenerately "
    "on-time) against the stream-wide event-time high-water mark — the "
    "quantity Spark's withWatermark() actually thresholds (watermarks "
    "are global, not per-key; event_disorder_stats gives the per-key "
    "view). Bands the lateness into a histogram and flags the share a "
    "10-minute watermark would drop. The Spark side computes the "
    "running max with the two-level distributed prefix scan "
    "(functions/scans.py: bucket maxima -> exclusive prefix over the "
    "n/B-row bucket table -> within-bucket windows of <= B rows) so NO "
    "corpus-sized window ever runs on one partition; the oracle uses "
    "the direct global window, proving the decomposition equals the "
    "global scan on every run.",
)
def global_watermark_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from porcupine_spark.functions.hashing import md5_long60
    from porcupine_spark.functions.scans import prefix_max_exclusive

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", F.unix_micros("ts").alias("tsu")
    )
    delay_us = (
        md5_long60(F.concat(F.lit("lat:"), F.col("event_id").cast("string")))
        % 900_000
    ) * 1000
    ev = ev.withColumn("arr_us", F.col("tsu") + delay_us)
    hw = prefix_max_exclusive(ev, "arr_us", "event_id", "tsu", "hw", SCAN_BUCKET_US)
    lateness = F.when(
        F.col("hw").isNull() | (F.col("tsu") >= F.col("hw")), F.lit(0)
    ).otherwise(F.col("hw") - F.col("tsu"))
    banded = hw.select(
        F.when(lateness == 0, "on_time")
        .when(lateness <= 60_000_000, "le_1m")
        .when(lateness <= 600_000_000, "le_10m")
        .when(lateness <= 3_600_000_000, "le_1h")
        .otherwise("gt_1h")
        .alias("band"),
        F.when(lateness > 600_000_000, 1).otherwise(0).alias("wd"),
    )
    tot = banded.agg(F.count(F.lit(1)).alias("n"))
    return (
        banded.crossJoin(F.broadcast(tot))
        .groupBy("band")
        .agg(
            F.max("wd").cast("long").alias("would_drop_10m"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.floor((F.count(F.lit(1)) * F.lit(1_000_000)) / F.max("n"))
            .cast("long")
            .alias("share_ppm"),
        )
    )


INCIDENT_GAP_S = 300
INCIDENT_MIN_EVENTS = 5
OVERLAP_BUCKET_US = 3_600_000_000  # 1h decomposition buckets

# Shared CTEs: user sessions as [lo, hi) intervals and global error
# incidents (per-day gap-islands of error events, >= INCIDENT_MIN_EVENTS)
_SQL_INTERVALS = f"""sess AS (
      SELECT user_id, session_id,
             MIN(epoch_us(ts)) AS s_lo, MAX(epoch_us(ts)) + 1 AS s_hi
      FROM (
        SELECT user_id, ts,
               CAST(SUM(CASE WHEN gap IS NULL OR gap > {GAP_SECONDS} * 1000000
                   THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS session_id
        FROM (
          SELECT user_id, ts, event_id,
                 epoch_us(ts) - LAG(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
          FROM events)
      ) GROUP BY user_id, session_id
    ),
    inc AS (
      SELECT MIN(epoch_us(ts)) AS i_lo, MAX(epoch_us(ts)) + 1 AS i_hi,
             COUNT(*) AS n_err
      FROM (
        SELECT ts, day,
               SUM(CASE WHEN gap IS NULL OR gap > {INCIDENT_GAP_S} * 1000000
                   THEN 1 ELSE 0 END)
                 OVER (PARTITION BY day ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS island
        FROM (
          SELECT ts, event_id, date_trunc('day', ts) AS day,
                 epoch_us(ts) - LAG(epoch_us(ts))
                   OVER (PARTITION BY date_trunc('day', ts)
                         ORDER BY ts, event_id) AS gap
          FROM events WHERE event_type = 'error')
      ) GROUP BY day, island
      HAVING COUNT(*) >= {INCIDENT_MIN_EVENTS}
    )"""


@query(
    "session_incident_overlap",
    f"""
    WITH {_SQL_INTERVALS}
    SELECT s.user_id, s.session_id,
           CAST(COUNT(*) AS BIGINT) AS n_incidents,
           CAST(SUM(LEAST(s.s_hi, i.i_hi) - GREATEST(s.s_lo, i.i_lo))
                AS BIGINT) AS overlap_us
    FROM sess s JOIN inc i
      ON s.s_lo < i.i_hi AND i.i_lo < s.s_hi
    GROUP BY s.user_id, s.session_id
    """,
    tags=("sessionize", "join", "interval", "monitoring"),
    doc="Interval x interval OVERLAP join — the join class the corpus "
    "had not yet covered (range_join = point-in-range, as-of/PIT = "
    "point-in-time; this is interval-vs-interval): which user sessions "
    "overlapped a global error incident, and for how long. Incidents "
    f"are per-day gap-islands of error events (gap > {INCIDENT_GAP_S}s "
    f"splits, >= {INCIDENT_MIN_EVENTS} events qualify — day "
    "partitioning keeps the island windows keyed, never global). The "
    "Spark join DECOMPOSES both interval sets into covered 1h buckets "
    "and equi-joins on the bucket — the standard genomics/telemetry "
    "overlap-join shape: shuffle is keyed by bucket, no "
    "BroadcastNestedLoopJoin, fan-out bounded by interval_len/bucket "
    "(sessions are gap-bounded, incidents day-bounded). Duplicate "
    "(session, incident) bucket hits are deduped before the exact "
    "half-open overlap arithmetic; the oracle is the direct "
    "inequality join. Exact integer microseconds.",
)
def session_incident_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sess = (
        sessionize(ev, "user_id", "ts", "event_id", GAP_SECONDS)
        .groupBy("user_id", "session_id")
        .agg(
            F.min(F.unix_micros("ts")).alias("s_lo"),
            (F.max(F.unix_micros("ts")) + 1).alias("s_hi"),
        )
    )
    err = ev.filter(F.col("event_type") == "error").withColumn(
        "day", F.date_trunc("day", F.col("ts"))
    )
    w = W.partitionBy("day").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    is_new = F.when(
        gap.isNull() | (gap > INCIDENT_GAP_S * 1_000_000), 1
    ).otherwise(0)
    wrun = w.rowsBetween(W.unboundedPreceding, 0)
    inc = (
        err.withColumn("island", F.sum(is_new).over(wrun))
        .groupBy("day", "island")
        .agg(
            F.min(F.unix_micros("ts")).alias("i_lo"),
            (F.max(F.unix_micros("ts")) + 1).alias("i_hi"),
            F.count(F.lit(1)).alias("n_err"),
        )
        .filter(F.col("n_err") >= INCIDENT_MIN_EVENTS)
        .select("i_lo", "i_hi")
    )

    def buckets(lo: str, hi: str):
        return F.sequence(
            F.expr(f"{lo} div {OVERLAP_BUCKET_US}"),
            F.expr(f"({hi} - 1) div {OVERLAP_BUCKET_US}"),
        )

    s_b = sess.withColumn("bucket", F.explode(buckets("s_lo", "s_hi")))
    i_b = inc.withColumn("bucket", F.explode(buckets("i_lo", "i_hi")))
    pairs = (
        s_b.join(i_b, "bucket")
        .filter((F.col("s_lo") < F.col("i_hi")) & (F.col("i_lo") < F.col("s_hi")))
        # key on the FULL incident interval: two distinct incidents can
        # start at the same microsecond (different days/islands), and a
        # start-only key would silently merge them
        .dropDuplicates(["user_id", "session_id", "i_lo", "i_hi"])
    )
    overlap = F.least("s_hi", "i_hi") - F.greatest("s_lo", "i_lo")
    return pairs.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_incidents"),
        F.sum(overlap).cast("long").alias("overlap_us"),
    )
