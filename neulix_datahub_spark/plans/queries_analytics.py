"""Event-analytics / time-series tier (round 5): the product-analytics
queries every events warehouse runs — funnel conversion (+ latency
profile and journey trigram mining), cohort retention, activity
streaks (gaps-and-islands), range-frame rolling aggregates, time-spine
gap filling with LOCF, per-event dynamic session gaps, RFM
segmentation, trailing-window anomaly days, native linear-trend
regression aggregates, grouped-map autocorrelation, and the Spark-4
VARIANT path for semi-structured payloads.

The reference's events surface is poll-based dashboards over SQL
(``core/utils/db_core.py:119-135`` delegates arbitrary SQL to the
warehouse); these are the canonical dashboard queries re-expressed as
native DataFrame plans. Registered into the main QUERIES dict by
plans/queries.py.

Scale notes (100 TB design point):
- Funnel/cohort/streak plans shuffle on ``user_id`` only — every join
  and window is co-partitioned on the same key, so AQE reuses one
  exchange layout; per-user state after the first aggregation is a few
  rows regardless of raw event volume.
- The rolling-window and gap-fill queries window over a DAILY
  AGGREGATE, not raw rows: the distributed scan+agg reduces to one row
  per calendar day, so the single-partition ordered window holds only
  O(days) rows (365/year) no matter how many raw events feed it.
- The VARIANT path keeps semi-structured extraction inside the JVM
  (no Python UDF): ``parse_json``/``try_variant_get`` are Catalyst
  expressions and benefit from Parquet variant shredding at rest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from neulix_datahub_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Funnel conversion: view -> click -> purchase, each step within 72 h of
# the previous step's first completion. The "after the previous step"
# constraint makes this non-expressible as one conditional aggregation:
# it is a chain of per-user min-aggregations, each joined back to the
# raw events on user_id (the same shuffle key throughout).
# ---------------------------------------------------------------------------

from neulix_datahub_spark.params import (  # noqa: E402
    FUNNEL_DEADLINE_HOURS as _FUNNEL_DEADLINE_HOURS,
    SESSION_GAP_DEFAULT as _GAP_DEFAULT,
    SESSION_GAP_ERROR as _GAP_ERROR,
)


def _funnel_step(
    events: DataFrame, prev: DataFrame, step_type: str, prev_ts: str, out_ts: str
) -> DataFrame:
    """First `step_type` event per user strictly after `prev_ts` and
    within the deadline window — one user_id-keyed join + min-agg."""
    return (
        events.filter(F.col("event_type") == step_type)
        .join(prev.select("user_id", prev_ts), "user_id")
        .where(
            (F.col("ts") > F.col(prev_ts))
            & (
                F.col("ts")
                <= F.col(prev_ts) + F.expr(f"INTERVAL {_FUNNEL_DEADLINE_HOURS} HOURS")
            )
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias(out_ts))
    )


def event_funnel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis over the events stream: users reaching
    view -> click -> purchase with a 72 h step deadline, plus step- and
    end-to-end conversion rates. All joins/aggregations key on user_id
    (one exchange layout end-to-end); the final agg is a 1-row reduce."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = _funnel_step(ev, v, "click", "t1", "t2")
    p = _funnel_step(ev, c, "purchase", "t2", "t3")
    wide = v.join(c.select("user_id", "t2"), "user_id", "left").join(
        p.select("user_id", "t3"), "user_id", "left"
    )
    return wide.agg(
        F.count("t1").alias("view_users"),
        F.count("t2").alias("click_users"),
        F.count("t3").alias("purchase_users"),
        F.round(F.try_divide(F.count("t2") * 100.0, F.count("t1")), 4).alias(
            "view_to_click_pct"
        ),
        F.round(F.try_divide(F.count("t3") * 100.0, F.count("t2")), 4).alias(
            "click_to_purchase_pct"
        ),
        F.round(F.try_divide(F.count("t3") * 100.0, F.count("t1")), 4).alias(
            "overall_pct"
        ),
    )


FUNNEL_SQL = f"""
WITH v AS (
    SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY 1
),
c AS (
    SELECT e.user_id, min(e.ts) AS t2
    FROM events e JOIN v ON e.user_id = v.user_id
    WHERE e.event_type = 'click'
      AND e.ts > v.t1 AND e.ts <= v.t1 + INTERVAL {_FUNNEL_DEADLINE_HOURS} HOURS
    GROUP BY 1
),
p AS (
    SELECT e.user_id, min(e.ts) AS t3
    FROM events e JOIN c ON e.user_id = c.user_id
    WHERE e.event_type = 'purchase'
      AND e.ts > c.t2 AND e.ts <= c.t2 + INTERVAL {_FUNNEL_DEADLINE_HOURS} HOURS
    GROUP BY 1
)
SELECT CAST(nv AS BIGINT) AS view_users,
       CAST(nc AS BIGINT) AS click_users,
       CAST(np AS BIGINT) AS purchase_users,
       round(nc * 100.0 / NULLIF(nv, 0), 4) AS view_to_click_pct,
       round(np * 100.0 / NULLIF(nc, 0), 4) AS click_to_purchase_pct,
       round(np * 100.0 / NULLIF(nv, 0), 4) AS overall_pct
FROM (SELECT (SELECT count(*) FROM v) AS nv,
             (SELECT count(*) FROM c) AS nc,
             (SELECT count(*) FROM p) AS np)
"""


# ---------------------------------------------------------------------------
# Cohort retention: users grouped by the ISO week of their first event;
# activity counted per (cohort week, whole weeks since cohort).
# ---------------------------------------------------------------------------

def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort-retention matrix (long form). Per-user first-event
    week (one user_id-keyed agg), joined back to raw events on the same
    key, then a distinct-user count per (cohort_week, week_offset) —
    the output is bounded by calendar weeks squared, not data size."""
    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("__cw")
    )
    return (
        ev.join(first, "user_id")
        .groupBy(
            F.date_format("__cw", "yyyy-MM-dd").alias("cohort_week"),
            (
                F.floor(
                    F.datediff(F.date_trunc("week", F.col("ts")), F.col("__cw")) / 7
                )
            ).alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("active_users"))
        .orderBy("cohort_week", "week_offset")
    )


COHORT_SQL = """
WITH f AS (
    SELECT user_id, date_trunc('week', min(ts)) AS cw FROM events GROUP BY 1
)
SELECT strftime(f.cw, '%Y-%m-%d') AS cohort_week,
       CAST(floor(date_diff('day', f.cw, date_trunc('week', e.ts)) / 7.0) AS BIGINT)
           AS week_offset,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS active_users
FROM events e JOIN f ON e.user_id = f.user_id
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Gaps-and-islands: longest consecutive-active-day streak per user,
# reported as a distribution (streak length -> user count).
# ---------------------------------------------------------------------------

def user_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user via the classic
    day - row_number() island key. The only window partitions by
    user_id over that user's DISTINCT active days (<= calendar days,
    bounded state); everything else is user-keyed aggregation."""
    ev = _t(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("__day")).distinct()
    w = Window.partitionBy("user_id").orderBy("__day")
    islands = days.withColumn(
        "__island", F.date_sub(F.col("__day"), F.row_number().over(w))
    )
    longest = (
        islands.groupBy("user_id", "__island")
        .agg(F.count(F.lit(1)).alias("__len"))
        .groupBy("user_id")
        .agg(F.max("__len").alias("longest_streak_days"))
    )
    return (
        longest.groupBy("longest_streak_days")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("longest_streak_days")
    )


STREAKS_SQL = """
WITH days AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
islands AS (
    SELECT user_id,
           day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
                      AS INTEGER) AS island
    FROM days
),
longest AS (
    SELECT user_id, max(len) AS longest_streak_days
    FROM (SELECT user_id, island, count(*) AS len FROM islands GROUP BY 1, 2)
    GROUP BY 1
)
SELECT CAST(longest_streak_days AS BIGINT) AS longest_streak_days,
       CAST(count(*) AS BIGINT) AS n_users
FROM longest
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Range-frame rolling aggregate: 7-day trailing revenue over the daily
# series. RANGE (value-based) framing, not ROWS, so missing days
# genuinely narrow the window — the semantics ROWS BETWEEN gets wrong.
# ---------------------------------------------------------------------------

def rolling_revenue_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day trailing revenue sum/avg over the 1996 daily order series.
    The distributed scan+groupBy reduces raw orders to one row per day
    first, so the ordered RANGE window runs over <=366 rows regardless
    of raw scale (Spark range frames need a numeric ordering key, hence
    the epoch-day ordinal; DuckDB expresses the same frame with
    RANGE BETWEEN INTERVAL). All money flows as exact integer CENTS —
    a float daily sum is order-dependent, and the sf0.001 sweep caught
    the two engines landing on opposite sides of a half-cent rounding
    boundary; the trailing average rounds half-up in INTEGER space
    (floor((2s+n)/2n)) so both engines emit the identical double."""
    orders = _t(spark, sf_dir, "orders")
    daily = (
        orders.filter(F.year("o_orderdate") == 1996)
        .groupBy(F.to_date("o_orderdate").alias("__day"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("__cents")
        )
    )
    w = (
        # bounded grain: window over per-DAY aggregates (<=366 rows)
        Window.orderBy(F.datediff("__day", F.lit("1970-01-01").cast("date")))
        .rangeBetween(-6, 0)
    )
    s7 = F.sum("__cents").over(w)
    n7 = F.count(F.lit(1)).over(w)
    return (
        daily.select(
            F.date_format("__day", "yyyy-MM-dd").alias("day"),
            (F.col("__cents") / 100.0).alias("revenue"),
            (s7 / 100.0).alias("revenue_7d"),
            (F.floor((2 * s7 + n7) / (2 * n7)) / 100.0).alias("avg_daily_7d"),
        )
        .orderBy("day")
    )


ROLLING_SQL = """
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT) AS cents
    FROM orders WHERE year(o_orderdate) = 1996 GROUP BY 1
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       cents / 100.0 AS revenue,
       sum(cents) OVER w / 100.0 AS revenue_7d,
       floor((2 * sum(cents) OVER w + count(*) OVER w)
             / (2.0 * count(*) OVER w)) / 100.0 AS avg_daily_7d
FROM daily
WINDOW w AS (ORDER BY day RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW)
ORDER BY day
"""


# ---------------------------------------------------------------------------
# Time-spine gap filling + LOCF: resample a sparse daily series onto a
# dense calendar spine, zero-filling counts and carrying the last
# observation forward for the price column.
# ---------------------------------------------------------------------------

def gap_filled_daily_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily series for 1996 urgent orders: a sequence()-generated
    calendar spine left-joined to the sparse daily aggregate, counts
    zero-filled, average price LOCF-filled via last(ignorenulls) over
    the ordered spine. Spine generation is a narrow explode of one
    bounds row; the window input is O(days), same argument as
    rolling_revenue_7d."""
    orders = _t(spark, sf_dir, "orders")
    daily = (
        orders.filter(
            (F.year("o_orderdate") == 1996)
            & (F.col("o_orderpriority") == "1-URGENT")
        )
        .groupBy(F.to_date("o_orderdate").alias("__day"))
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.avg("o_totalprice").alias("__price"),
        )
    )
    spine = (
        daily.agg(F.min("__day").alias("__lo"), F.max("__day").alias("__hi"))
        .select(
            F.explode(
                F.sequence("__lo", "__hi", F.expr("INTERVAL 1 DAY"))
            ).alias("__day")
        )
    )
    # bounded grain: cumulative sum over per-DAY aggregates, not raw rows
    w = Window.orderBy("__day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        spine.join(daily, "__day", "left")
        .select(
            F.date_format("__day", "yyyy-MM-dd").alias("day"),
            F.coalesce("__n", F.lit(0)).alias("n_orders"),
            F.round(
                F.last("__price", ignorenulls=True).over(w), 6
            ).alias("locf_avg_price"),
        )
        .orderBy("day")
    )


GAP_FILL_SQL = """
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS day,
           count(*) AS n, avg(o_totalprice) AS price
    FROM orders
    WHERE year(o_orderdate) = 1996 AND o_orderpriority = '1-URGENT'
    GROUP BY 1
),
spine AS (
    SELECT unnest(generate_series((SELECT min(day) FROM daily),
                                  (SELECT max(day) FROM daily),
                                  INTERVAL 1 DAY))::DATE AS day
)
SELECT strftime(s.day, '%Y-%m-%d') AS day,
       CAST(coalesce(d.n, 0) AS BIGINT) AS n_orders,
       round(last_value(d.price IGNORE NULLS)
             OVER (ORDER BY s.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             6) AS locf_avg_price
FROM spine s LEFT JOIN daily d ON s.day = d.day
ORDER BY day
"""


# ---------------------------------------------------------------------------
# Spark-4 VARIANT path for semi-structured payloads: parse_json ->
# try_variant_get is the schema-flexible alternative to from_json with a
# declared schema (SC7's scale form — variant values shred into Parquet
# typed subcolumns at rest, and extraction stays a JVM expression).
# ---------------------------------------------------------------------------

def variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type stats over a field extracted from the JSON props
    payload via the VARIANT type (parse_json + try_variant_get), no
    declared schema and no Python UDF. try_variant_get nulls out
    missing/mistyped paths instead of failing — the PERMISSIVE-mode
    analogue for semi-structured extraction."""
    ev = _t(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "bigint")
    return (
        ev.select("event_type", k.alias("__k"))
        .groupBy("event_type")
        .agg(
            F.count("__k").alias("n_present"),
            F.round(F.avg("__k"), 6).alias("avg_k"),
            F.min("__k").alias("min_k"),
            F.max("__k").alias("max_k"),
        )
        .orderBy("event_type")
    )


VARIANT_SQL = """
SELECT event_type,
       CAST(count(k) AS BIGINT) AS n_present,
       round(avg(k), 6) AS avg_k,
       CAST(min(k) AS BIGINT) AS min_k,
       CAST(max(k) AS BIGINT) AS max_k
FROM (
    SELECT event_type,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
)
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Dynamic-gap session windows: the gap depends on the EVENT (errors hold
# a session open 2 h, everything else 8 h) — Spark's expression-valued
# session_window gap, which the fixed-gap form can't emulate.
# ---------------------------------------------------------------------------

def dynamic_gap_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 depth: session windows with a PER-EVENT gap expression
    (error events extend a session 2 h, others 8 h), summarized as the
    session-size distribution. Session merge semantics are interval
    union: each event holds the session open until ts + its own gap,
    so the oracle mirrors with a running max of (ts + gap) — a plain
    lag() comparison is wrong once gaps are heterogeneous. Same state
    story as fixed-gap sessions (per-user keyed state in streaming);
    the distribution output is bounded by max session size."""
    ev = _t(spark, sf_dir, "events")
    # session_window's expression gap needs CalendarIntervalType —
    # string literals cast to it; DayTimeInterval (INTERVAL 2 HOURS) is
    # rejected.
    gap = F.when(
        F.col("event_type") == "error", F.lit(_GAP_ERROR)
    ).otherwise(F.lit(_GAP_DEFAULT))
    sessions = (
        ev.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum("value").alias("__sv"),
        )
    )
    return (
        sessions.groupBy(F.col("__n").alias("events_per_session"))
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.round(F.sum("__sv"), 4).alias("total_value"),
        )
        .orderBy("events_per_session")
    )


def _gap_to_us(interval: str) -> int:
    """'2 hours' -> 7_200_000_000 (µs) — keeps the oracle SQL derived
    from the SAME shared constants as both engine spellings."""
    n, unit = interval.split()
    return int(n) * {"hours": 3_600_000_000, "minutes": 60_000_000}[unit]


_GAP_ERR_US = _gap_to_us(_GAP_ERROR)
_GAP_DEF_US = _gap_to_us(_GAP_DEFAULT)

DYNAMIC_SESSIONS_SQL = f"""
WITH g AS (
    SELECT user_id, ts, value,
           CASE WHEN event_type = 'error' THEN {_GAP_ERR_US}
                ELSE {_GAP_DEF_US} END AS gap_us,
           max(epoch_us(ts) + CASE WHEN event_type = 'error' THEN {_GAP_ERR_US}
                                   ELSE {_GAP_DEF_US} END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
    FROM events
),
marked AS (
    SELECT user_id, ts, value,
           CASE WHEN prev_end IS NULL OR epoch_us(ts) >= prev_end
                THEN 1 ELSE 0 END AS new_session
    FROM g
),
sessions AS (
    SELECT user_id, value,
           sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS sid
    FROM marked
),
sized AS (
    SELECT user_id, sid, count(*) AS n, sum(value) AS sv
    FROM sessions GROUP BY user_id, sid
)
SELECT CAST(n AS BIGINT) AS events_per_session,
       CAST(count(*) AS BIGINT) AS n_sessions,
       round(sum(sv), 4) AS total_value
FROM sized
GROUP BY n
ORDER BY events_per_session
"""


# ---------------------------------------------------------------------------
# RFM segmentation: recency/frequency/monetary quintiles per customer —
# the standard marketing segmentation matrix.
# ---------------------------------------------------------------------------

def rfm_segment_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation over orders: per-customer recency (last order
    date), frequency (order count) and monetary (total spend), each
    quintiled by ntile(5) with the customer key as tiebreak (ntile
    assigns deterministically given a total order, and both engines
    give earlier tiles the remainder rows), then the (R, F) segment
    matrix with sizes and average spend. One shuffle to the per-customer
    aggregate; each quintile then comes from the TWO-PHASE ntile
    (operators/sequence.py with_ntile: range-repartition + local
    row_number + broadcast offsets + the ANSI remainder formula) — NO
    single-partition global window, so the exact quintiles hold at
    10⁹-customer grain."""
    from neulix_datahub_spark.operators.sequence import with_ntile

    orders = _t(spark, sf_dir, "orders")
    rfm = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("__last"),
        F.count(F.lit(1)).alias("__freq"),
        F.sum("o_totalprice").alias("__monetary"),
    )
    scored = with_ntile(
        with_ntile(rfm, ["__last", "o_custkey"], 5, "r_quintile"),
        ["__freq", "o_custkey"],
        5,
        "f_quintile",
    ).select("r_quintile", "f_quintile", "__monetary")
    return (
        scored.groupBy("r_quintile", "f_quintile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("__monetary"), 2).alias("avg_monetary"),
        )
        .orderBy("r_quintile", "f_quintile")
    )


RFM_SQL = """
WITH rfm AS (
    SELECT o_custkey,
           max(o_orderdate) AS last_order,
           count(*) AS freq,
           sum(o_totalprice) AS monetary
    FROM orders GROUP BY o_custkey
),
scored AS (
    SELECT ntile(5) OVER (ORDER BY last_order, o_custkey) AS r_quintile,
           ntile(5) OVER (ORDER BY freq, o_custkey) AS f_quintile,
           monetary
    FROM rfm
)
SELECT r_quintile, f_quintile,
       CAST(count(*) AS BIGINT) AS n_customers,
       round(avg(monetary), 2) AS avg_monetary
FROM scored
GROUP BY r_quintile, f_quintile
ORDER BY r_quintile, f_quintile
"""


# ---------------------------------------------------------------------------
# Time-series anomaly detection: trailing-window z-score on the daily
# revenue series (the monitoring query behind every ops dashboard).
# ---------------------------------------------------------------------------

def revenue_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days whose revenue deviates >3 sigma from the TRAILING 28-day
    window (window excludes the current day — self-inclusion dilutes
    the very deviation being tested); days with under 14 trailing
    observations are not scored (cold start). Same O(days) window
    input argument as rolling_revenue_7d: the raw scan distributes,
    the ordered window sees one row per calendar day."""
    orders = _t(spark, sf_dir, "orders")
    daily = (
        orders.filter(F.year("o_orderdate") == 1996)
        .groupBy(F.to_date("o_orderdate").alias("__day"))
        .agg(F.sum("o_totalprice").alias("__rev"))
    )
    w = (
        # bounded grain: window over per-DAY aggregates, not raw rows
        Window.orderBy(F.datediff("__day", F.lit("1970-01-01").cast("date")))
        .rangeBetween(-28, -1)
    )
    scored = daily.select(
        "__day",
        "__rev",
        F.avg("__rev").over(w).alias("__mu"),
        F.stddev_samp("__rev").over(w).alias("__sd"),
        F.count(F.lit(1)).over(w).alias("__n"),
    )
    return (
        scored.filter(
            (F.col("__n") >= 14)
            & (F.abs(F.col("__rev") - F.col("__mu")) > 3 * F.col("__sd"))
        )
        .select(
            F.date_format("__day", "yyyy-MM-dd").alias("day"),
            F.round("__rev", 2).alias("revenue"),
            F.round("__mu", 2).alias("trailing_mean"),
            F.round((F.col("__rev") - F.col("__mu")) / F.col("__sd"), 4).alias(
                "z_score"
            ),
        )
        .orderBy("day")
    )


ANOMALY_SQL = """
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS day, sum(o_totalprice) AS rev
    FROM orders WHERE year(o_orderdate) = 1996 GROUP BY 1
),
scored AS (
    SELECT day, rev,
           avg(rev) OVER w AS mu,
           stddev_samp(rev) OVER w AS sd,
           count(*) OVER w AS n
    FROM daily
    WINDOW w AS (ORDER BY day
                 RANGE BETWEEN INTERVAL 28 DAYS PRECEDING
                           AND INTERVAL 1 DAY PRECEDING)
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       round(rev, 2) AS revenue,
       round(mu, 2) AS trailing_mean,
       round((rev - mu) / sd, 4) AS z_score
FROM scored
WHERE n >= 14 AND abs(rev - mu) > 3 * sd
ORDER BY day
"""


# ---------------------------------------------------------------------------
# Grouped-map (batch applyInPandas) surface: per-type weekly
# autocorrelation of the daily event series.
# ---------------------------------------------------------------------------

def weekly_autocorr_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3's BATCH grouped-map form (operators/timeseries.py): per
    event type, the lag-7 Pearson autocorrelation of the daily count
    series — each group's calendar-aligned pairing runs as numpy inside
    ``applyInPandas``. The oracle recomputes the identical statistic
    with a calendar self-join + corr(); hash-matching proves the
    grouped-map path end-to-end (Arrow exchange, per-group frame,
    declared schema), not just that pandas ran."""
    from neulix_datahub_spark.operators.timeseries import grouped_autocorr

    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    return grouped_autocorr(
        daily, key_col="event_type", day_col="day", value_col="cnt", lag=7
    ).orderBy("event_type")


# Mirrors grouped_autocorr exactly, including the sparse edges: a type
# with ZERO lag pairs still gets a row (left join), and fewer than 3
# pairs nulls the statistic rather than computing a degenerate corr —
# the inner-join-only formulation would drop/keep those types
# differently from the operator.
AUTOCORR_SQL = """
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day, count(*)::DOUBLE AS cnt
    FROM events GROUP BY 1, 2
),
per_type AS (
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
    FROM daily GROUP BY 1
),
pairs AS (
    SELECT a.event_type, b.cnt AS prev, a.cnt AS cur
    FROM daily a JOIN daily b
      ON a.event_type = b.event_type AND b.day = a.day - 7
),
stats AS (
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
           CASE WHEN count(*) >= 3 THEN round(corr(prev, cur), 6) END AS ac
    FROM pairs GROUP BY 1
)
SELECT t.event_type, t.n_days,
       coalesce(s.n_pairs, 0) AS n_pairs,
       s.ac AS autocorr
FROM per_type t LEFT JOIN stats s USING (event_type)
ORDER BY t.event_type
"""


# ---------------------------------------------------------------------------
# Journey mining + funnel latency: the two follow-on questions every
# funnel dashboard asks next.
# ---------------------------------------------------------------------------

def top_event_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 3-step user journeys: per-user event sequences (ordered by
    ts with event_id tiebreak) sliced into overlapping trigrams via two
    lead() windows — one user-keyed shuffle, top-k with deterministic
    tiebreak."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("__e2"),
        F.lead("event_type", 2).over(w).alias("__e3"),
    ).filter(F.col("__e2").isNotNull() & F.col("__e3").isNotNull())
    return (
        seq.groupBy(
            F.concat_ws(">", "event_type", "__e2", "__e3").alias("journey")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "journey")
        .limit(10)
    )


TRIGRAMS_SQL = """
WITH seq AS (
    SELECT user_id, event_type,
           lead(event_type, 1) OVER w AS e2,
           lead(event_type, 2) OVER w AS e3
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_type || '>' || e2 || '>' || e3 AS journey,
       CAST(count(*) AS BIGINT) AS n
FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
GROUP BY 1
ORDER BY n DESC, journey
LIMIT 10
"""


def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latency profile of the funnel's completers: average and exact
    median hours from first view to the completing purchase (same step
    chain as event_funnel_stats). Microsecond-exact arithmetic in both
    engines (unix_micros / epoch_us) so the interpolated median cannot
    drift on integer-second truncation."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = _funnel_step(ev, v, "click", "t1", "t2")
    p = _funnel_step(ev, c, "purchase", "t2", "t3")
    # events ts is TIMESTAMP_NTZ (unix_micros wants TIMESTAMP); a cast
    # through TIMESTAMP in the session's UTC zone is value-preserving
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))
    hours = (us("t3") - us("t1")) / 3.6e9
    return (
        p.join(v, "user_id")
        .select(hours.alias("__h"))
        .agg(
            F.count(F.lit(1)).alias("converters"),
            F.round(F.avg("__h"), 4).alias("avg_hours"),
            F.round(F.percentile("__h", F.lit(0.5)), 4).alias("median_hours"),
        )
    )


TIME_TO_CONVERT_SQL = f"""
WITH v AS (
    SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY 1
),
c AS (
    SELECT e.user_id, min(e.ts) AS t2
    FROM events e JOIN v ON e.user_id = v.user_id
    WHERE e.event_type = 'click'
      AND e.ts > v.t1 AND e.ts <= v.t1 + INTERVAL {_FUNNEL_DEADLINE_HOURS} HOURS
    GROUP BY 1
),
p AS (
    SELECT e.user_id, min(e.ts) AS t3
    FROM events e JOIN c ON e.user_id = c.user_id
    WHERE e.event_type = 'purchase'
      AND e.ts > c.t2 AND e.ts <= c.t2 + INTERVAL {_FUNNEL_DEADLINE_HOURS} HOURS
    GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS converters,
       round(avg((epoch_us(p.t3) - epoch_us(v.t1)) / 3.6e9), 4) AS avg_hours,
       round(quantile_cont((epoch_us(p.t3) - epoch_us(v.t1)) / 3.6e9, 0.5), 4)
           AS median_hours
FROM p JOIN v ON p.user_id = v.user_id
"""


def daily_trend_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/W2 breadth: per-type linear trend of the daily event series
    via the NATIVE regression aggregates (regr_slope / regr_intercept /
    regr_r2 — single-pass, decomposable, shuffle bounded by group
    count; the expression-only sibling of the grouped-map
    autocorrelation). x is the day ordinal from the fixture epoch, so
    slope reads as events/day drift."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("__day")
    ).agg(F.count(F.lit(1)).cast("double").alias("__cnt"))
    x = F.datediff("__day", F.lit("2024-01-01").cast("date")).cast("double")
    return (
        daily.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.round(F.regr_slope(F.col("__cnt"), x), 6).alias("slope"),
            F.round(F.regr_intercept(F.col("__cnt"), x), 6).alias("intercept"),
            F.round(F.regr_r2(F.col("__cnt"), x), 6).alias("r2"),
        )
        .orderBy("event_type")
    )


TREND_SQL = """
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day, count(*)::DOUBLE AS cnt
    FROM events GROUP BY 1, 2
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_days,
       round(regr_slope(cnt, date_diff('day', DATE '2024-01-01', day)), 6) AS slope,
       round(regr_intercept(cnt, date_diff('day', DATE '2024-01-01', day)), 6)
           AS intercept,
       round(regr_r2(cnt, date_diff('day', DATE '2024-01-01', day)), 6) AS r2
FROM daily
GROUP BY 1
ORDER BY 1
"""


def last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing-style LAST-TOUCH attribution — the canonical as-of-join
    application: each purchase is credited to the user's latest prior
    touch within a 6 h window (operators/asof.py with ``tolerance``;
    stale or missing touches fall to 'direct'). Touches are deduped to
    one row per (user, ts) first so an equal-timestamp tie cannot make
    the carried payload nondeterministic in either engine. One
    user-keyed shuffle for the as-of carry, then a channel-cardinality
    aggregation."""
    from neulix_datahub_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    touches = (
        ev.filter(F.col("event_type") != "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_type").alias("touch"))
    )
    attributed = asof_join(
        purchases, touches, on="ts", by="user_id", tolerance="6 hours"
    )
    return (
        attributed.groupBy(
            F.coalesce("touch", F.lit("direct")).alias("channel")
        )
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(F.sum("value"), 4).alias("attributed_value"),
        )
        .orderBy("channel")
    )


ATTRIBUTION_SQL = """
WITH purchases AS (
    SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
),
touches AS (
    SELECT user_id, ts, max(event_type) AS touch
    FROM events WHERE event_type <> 'purchase'
    GROUP BY 1, 2
),
attributed AS (
    SELECT p.user_id, p.ts, p.value, t.touch, t.ts AS touch_ts
    FROM purchases p ASOF LEFT JOIN touches t
      ON p.user_id = t.user_id AND t.ts <= p.ts
)
SELECT CASE WHEN touch IS NULL OR touch_ts < ts - INTERVAL 6 HOURS
            THEN 'direct' ELSE touch END AS channel,
       CAST(count(*) AS BIGINT) AS n_purchases,
       round(sum(value), 4) AS attributed_value
FROM attributed
GROUP BY 1
ORDER BY channel
"""


def funnel_steps_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The generalized N-step funnel operator (operators/funnel.py)
    driven with a FOUR-step chain (view→click→signup→purchase, 72 h
    step deadline), long-form conversion table — one row per step with
    users reached, percent of the previous step and of the entry. The
    oracle chains the same four min-aggregations and unions the step
    rows."""
    from neulix_datahub_spark.operators.funnel import build_funnel, funnel_summary

    steps = ["view", "click", "signup", "purchase"]
    ev = _t(spark, sf_dir, "events")
    wide = build_funnel(ev, steps, deadline_hours=_FUNNEL_DEADLINE_HOURS)
    return funnel_summary(wide, steps).orderBy("step_idx")


FUNNEL_LONG_SQL = f"""
WITH s0 AS (
    SELECT user_id, min(ts) AS t FROM events WHERE event_type = 'view' GROUP BY 1
),
s1 AS (
    SELECT e.user_id, min(e.ts) AS t
    FROM events e JOIN s0 ON e.user_id = s0.user_id
    WHERE e.event_type = 'click'
      AND e.ts > s0.t AND e.ts <= s0.t + INTERVAL {_FUNNEL_DEADLINE_HOURS} HOURS
    GROUP BY 1
),
s2 AS (
    SELECT e.user_id, min(e.ts) AS t
    FROM events e JOIN s1 ON e.user_id = s1.user_id
    WHERE e.event_type = 'signup'
      AND e.ts > s1.t AND e.ts <= s1.t + INTERVAL {_FUNNEL_DEADLINE_HOURS} HOURS
    GROUP BY 1
),
s3 AS (
    SELECT e.user_id, min(e.ts) AS t
    FROM events e JOIN s2 ON e.user_id = s2.user_id
    WHERE e.event_type = 'purchase'
      AND e.ts > s2.t AND e.ts <= s2.t + INTERVAL {_FUNNEL_DEADLINE_HOURS} HOURS
    GROUP BY 1
),
n AS (
    SELECT (SELECT count(*) FROM s0) AS n0, (SELECT count(*) FROM s1) AS n1,
           (SELECT count(*) FROM s2) AS n2, (SELECT count(*) FROM s3) AS n3
)
SELECT * FROM (
    SELECT 0 AS step_idx, 'view' AS step, CAST(n0 AS BIGINT) AS users,
           round(n0 * 100.0 / n0, 4) AS pct_of_prev,
           round(n0 * 100.0 / n0, 4) AS pct_of_entry FROM n
    UNION ALL
    SELECT 1, 'click', CAST(n1 AS BIGINT),
           round(n1 * 100.0 / n0, 4), round(n1 * 100.0 / n0, 4) FROM n
    UNION ALL
    SELECT 2, 'signup', CAST(n2 AS BIGINT),
           round(n2 * 100.0 / n1, 4), round(n2 * 100.0 / n0, 4) FROM n
    UNION ALL
    SELECT 3, 'purchase', CAST(n3 AS BIGINT),
           round(n3 * 100.0 / n2, 4), round(n3 * 100.0 / n0, 4) FROM n
)
ORDER BY step_idx
"""


def cohort_retention_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cohort_retention normalized to RATES: percent of each cohort's
    size active at every week offset — the form a retention dashboard
    renders (offset 0 is 100% by construction: every member is active
    in their first-event week). Same two user-keyed aggregations plus
    a broadcastable cohort-size join."""
    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("__cw")
    )
    sizes = first.groupBy("__cw").agg(F.count(F.lit(1)).alias("__size"))
    active = (
        ev.join(first, "user_id")
        .groupBy(
            "__cw",
            F.floor(
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("__cw")) / 7
            ).alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("__active"))
    )
    return (
        active.join(sizes, "__cw")
        .select(
            F.date_format("__cw", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            F.col("__size").alias("cohort_size"),
            F.col("__active").alias("active_users"),
            F.round(F.col("__active") * 100.0 / F.col("__size"), 4).alias(
                "retention_pct"
            ),
        )
        .orderBy("cohort_week", "week_offset")
    )


COHORT_RATES_SQL = """
WITH f AS (
    SELECT user_id, date_trunc('week', min(ts)) AS cw FROM events GROUP BY 1
),
sizes AS (SELECT cw, CAST(count(*) AS BIGINT) AS size FROM f GROUP BY 1),
active AS (
    SELECT f.cw,
           CAST(floor(date_diff('day', f.cw, date_trunc('week', e.ts)) / 7.0)
                AS BIGINT) AS week_offset,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS active_users
    FROM events e JOIN f ON e.user_id = f.user_id
    GROUP BY 1, 2
)
SELECT strftime(a.cw, '%Y-%m-%d') AS cohort_week,
       a.week_offset,
       s.size AS cohort_size,
       a.active_users,
       round(a.active_users * 100.0 / s.size, 4) AS retention_pct
FROM active a JOIN sizes s ON a.cw = s.cw
ORDER BY cohort_week, week_offset
"""


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov view of the event stream: P(next | current)
    for every observed transition — the probabilistic form of the edge
    table event_pagerank ranks. One user-keyed lead() window, one
    pair-count aggregation, row-normalized by a window sum (25 keys)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("cur"),
            F.lead("event_type").over(w).alias("nxt"),
        )
        .filter(F.col("nxt").isNotNull())
        .groupBy("cur", "nxt")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    row_total = Window.partitionBy("cur")
    return (
        pairs.select(
            "cur",
            "nxt",
            "n",
            F.round(F.col("n") / F.sum("n").over(row_total), 6).alias("p"),
        )
        .orderBy("cur", "nxt")
    )


TRANSITION_SQL = """
WITH pairs AS (
    SELECT event_type AS cur,
           lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
    FROM events
),
counts AS (
    SELECT cur, nxt, CAST(count(*) AS BIGINT) AS n
    FROM pairs WHERE nxt IS NOT NULL GROUP BY 1, 2
)
SELECT cur, nxt, n,
       round(n / sum(n) OVER (PARTITION BY cur), 6) AS p
FROM counts
ORDER BY cur, nxt
"""


def repeat_purchase_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase latency: the gap between a user's consecutive
    purchases, day-bucketed into a distribution with per-bucket counts
    and average value of the repeat order — one lag() window over the
    purchase subset (user-keyed), then a <=31-key aggregation."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "user_id", "ts", "value", F.lag("ts").over(w).alias("__prev")
        )
        .filter(F.col("__prev").isNotNull())
    )
    gap_days = F.floor(
        (F.unix_micros(F.col("ts").cast("timestamp"))
         - F.unix_micros(F.col("__prev").cast("timestamp"))) / 86_400_000_000
    )
    return (
        p.groupBy(gap_days.alias("gap_days"))
        .agg(
            F.count(F.lit(1)).alias("n_repeats"),
            F.round(F.avg("value"), 4).alias("avg_repeat_value"),
        )
        .orderBy("gap_days")
    )


REPEAT_SQL = """
WITH p AS (
    SELECT user_id, ts, value,
           lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
    FROM events WHERE event_type = 'purchase'
)
SELECT CAST(floor((epoch_us(ts) - epoch_us(prev)) / 86400000000.0) AS BIGINT)
           AS gap_days,
       CAST(count(*) AS BIGINT) AS n_repeats,
       round(avg(value), 4) AS avg_repeat_value
FROM p WHERE prev IS NOT NULL
GROUP BY 1
ORDER BY gap_days
"""


def hourly_activity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daypart profile: event volume, average value and share per
    hour-of-day — the load-shape query capacity planning and
    bot-detection both start from. One scan, 24-key aggregation,
    window normalizer over the 24-row frame."""
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.hour("ts").cast("bigint").alias("hour_of_day")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.avg("value"), 4).alias("avg_value"),
    )
    return (
        hourly.select(
            "hour_of_day",
            "n_events",
            "avg_value",
            F.round(
                100.0 * F.col("n_events")
                / F.sum("n_events").over(Window.partitionBy()),
                4,
            ).alias("pct"),
        )
        .orderBy("hour_of_day")
    )


DAYPART_SQL = """
SELECT CAST(hour(ts) AS BIGINT) AS hour_of_day,
       CAST(count(*) AS BIGINT) AS n_events,
       round(avg(value), 4) AS avg_value,
       round(100.0 * count(*) / sum(count(*)) OVER (), 4) AS pct
FROM events
GROUP BY 1
ORDER BY hour_of_day
"""


# ---------------------------------------------------------------------------
# Exponentially-weighted moving average (round 6): recursive EWMA is not
# window-expressible, but a BOUNDED calendar lookback is — each day
# joins its trailing 28 days (on the tiny daily aggregate) with weight
# (1-alpha)^distance, normalized over the weights actually present, so
# calendar gaps stay honest instead of silently compounding.
# ---------------------------------------------------------------------------

_EWMA_ALPHA = 0.25
_EWMA_LOOKBACK = 28


def ewma_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day order revenue with a 28-day exponentially-weighted moving
    average (alpha=0.25). The weighted self-join runs on the DAILY
    aggregate — O(days × 28) rows regardless of raw order volume — the
    same reduce-then-window discipline as rolling_revenue_7d. Emitted
    for days with a full 28-day history only (cold-start rows excluded
    so the smoothing level is comparable across the series)."""
    orders = _t(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.to_date("o_orderdate").alias("day")
    ).agg(F.sum("o_totalprice").alias("revenue"))
    a = daily.select(F.col("day"), F.col("revenue"))
    b = daily.select(
        F.col("day").alias("prev_day"), F.col("revenue").alias("prev_revenue")
    )
    d = F.datediff(F.col("day"), F.col("prev_day"))
    w = F.pow(F.lit(1.0 - _EWMA_ALPHA), d)
    joined = a.join(
        b,
        (F.col("prev_day") <= F.col("day"))
        & (F.col("prev_day") > F.date_sub(F.col("day"), _EWMA_LOOKBACK)),
    )
    first_day = daily.agg(F.min("day").alias("__first"))
    return (
        joined.groupBy("day", "revenue")
        .agg(
            F.round(
                F.sum(w * F.col("prev_revenue")) / F.sum(w), 4
            ).alias("ewma_revenue"),
            F.count(F.lit(1)).alias("n_days_in_window"),
        )
        .crossJoin(first_day)
        .filter(F.datediff(F.col("day"), F.col("__first")) >= _EWMA_LOOKBACK)
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.round("revenue", 2).alias("revenue"),
            "ewma_revenue",
            "n_days_in_window",
        )
        .orderBy("day")
    )


_EWMA_SQL = f"""
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS day, sum(o_totalprice) AS revenue
    FROM orders GROUP BY 1
),
joined AS (
    SELECT a.day, a.revenue,
           pow({1.0 - _EWMA_ALPHA}, date_diff('day', b.day, a.day)) AS w,
           b.revenue AS prev_revenue
    FROM daily a JOIN daily b
      ON b.day <= a.day AND b.day > a.day - INTERVAL {_EWMA_LOOKBACK} DAYS
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       round(revenue, 2) AS revenue,
       round(sum(w * prev_revenue) / sum(w), 4) AS ewma_revenue,
       count(*) AS n_days_in_window
FROM joined
WHERE date_diff('day', (SELECT min(day) FROM daily), day) >= {_EWMA_LOOKBACK}
GROUP BY day, revenue
ORDER BY day
"""


# ---------------------------------------------------------------------------
# Linear multi-touch attribution (round 6): every touch in the 6 h
# window before a purchase shares the credit EQUALLY — the fairness
# counterpoint to last_touch_attribution, and the one that requires a
# per-purchase fan-out + renormalization rather than an as-of carry.
# ---------------------------------------------------------------------------


def linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per channel: purchases credited (fractionally) and value
    attributed under equal-split multi-touch. Purchases with no touch in
    the window credit 'direct' in full. Both joins key on user_id (the
    per-user event volume bounds the fan-out); the per-purchase touch
    count renormalizes via one window over the joined frame."""
    ev = _t(spark, sf_dir, "events")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.sum("value").alias("value"))
    )
    touches = (
        ev.filter(F.col("event_type") != "purchase")
        .groupBy("user_id", F.col("ts").alias("t_ts"))
        .agg(F.max("event_type").alias("touch"))
    )
    in_window = purchases.join(touches, "user_id").filter(
        (F.col("t_ts") <= F.col("ts"))
        & (F.col("t_ts") > F.col("ts") - F.expr("INTERVAL 6 HOURS"))
    )
    # touches per (purchase, channel), then the purchase's total — the
    # per-channel credit is n_channel / n_total (several same-channel
    # touches accumulate, they must not collapse)
    per_channel = in_window.groupBy("user_id", "ts", "value", "touch").agg(
        F.count(F.lit(1)).alias("__n_ch")
    )
    w = Window.partitionBy("user_id", "ts")
    credited = per_channel.withColumn(
        "__credit", F.col("__n_ch") / F.sum("__n_ch").over(w)
    ).select("value", F.col("touch").alias("channel"), "__credit")
    direct = (
        purchases.join(
            per_channel.select("user_id", "ts").distinct(),
            ["user_id", "ts"],
            "left_anti",
        )
        .select("value", F.lit("direct").alias("channel"), F.lit(1.0).alias("__credit"))
    )
    return (
        credited.unionByName(direct)
        .groupBy("channel")
        .agg(
            F.round(F.sum("__credit"), 4).alias("credited_purchases"),
            F.round(F.sum(F.col("__credit") * F.col("value")), 4).alias(
                "attributed_value"
            ),
        )
        .orderBy("channel")
    )


_LINEAR_ATTR_SQL = """
WITH purchases AS (
    SELECT user_id, ts, sum(value) AS value
    FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
),
touches AS (
    SELECT user_id, ts AS t_ts, max(event_type) AS touch
    FROM events WHERE event_type != 'purchase' GROUP BY 1, 2
),
per_channel AS (
    SELECT p.user_id, p.ts, p.value, t.touch, count(*) AS n_ch
    FROM purchases p JOIN touches t
      ON p.user_id = t.user_id
     AND t.t_ts <= p.ts AND t.t_ts > p.ts - INTERVAL 6 HOURS
    GROUP BY 1, 2, 3, 4
),
credited AS (
    SELECT value, touch AS channel,
           CAST(n_ch AS DOUBLE)
             / sum(n_ch) OVER (PARTITION BY user_id, ts) AS credit
    FROM per_channel
),
direct AS (
    SELECT value, 'direct' AS channel, 1.0 AS credit
    FROM purchases p
    WHERE NOT EXISTS (
        SELECT 1 FROM per_channel c
        WHERE c.user_id = p.user_id AND c.ts = p.ts)
)
SELECT channel,
       round(sum(credit), 4) AS credited_purchases,
       round(sum(credit * value), 4) AS attributed_value
FROM (SELECT * FROM credited UNION ALL SELECT * FROM direct)
GROUP BY channel
ORDER BY channel
"""


def holt_daily_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing (level + trend) of the daily
    per-type event value — the sequential recurrence that needs the
    grouped map (operators/timeseries.py grouped_holt, U3), hashed
    bit-exactly against a DuckDB RECURSIVE CTE replaying the identical
    IEEE expression sequence. Inputs are made engine-identical first
    (daily sums recovered as exact integer cents), α = β = 0.5 keeps
    every coefficient literal the same double in both engines, and the
    outputs ship UN-rounded — the strongest form of the cross-engine
    determinism discipline (SCALE.md round-7 notes).

    Last 10 steps per type are emitted (bounded output; the recurrence
    still runs the full series)."""
    from neulix_datahub_spark.operators.timeseries import grouped_holt

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(F.sum("value").alias("__sv"))
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            (F.expr("CAST(round(__sv * 100) AS BIGINT)") / F.lit(100.0)).alias("x"),
        )
    )
    smoothed = grouped_holt(daily, "event_type", "day", "x")
    w = Window.partitionBy("event_type").orderBy(F.desc("day"))
    return (
        smoothed.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= 10)
        .select("event_type", "day", "level", "trend", "forecast")
        .orderBy("event_type", "day")
    )


_HOLT_SQL = """
WITH daily AS (
    SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
           CAST(round(sum(value) * 100) AS BIGINT) / 100.0 AS x
    FROM events GROUP BY 1, 2
),
s AS (
    SELECT event_type, day, x,
           row_number() OVER (PARTITION BY event_type ORDER BY day) AS t
    FROM daily
),
hw AS (
    WITH RECURSIVE rec AS (
        SELECT event_type, day, t, x AS level, CAST(0.0 AS DOUBLE) AS trend
        FROM s WHERE t = 1
        UNION ALL
        SELECT s.event_type, s.day, s.t,
               0.5 * s.x + (1.0 - 0.5) * (rec.level + rec.trend) AS level,
               0.5 * ((0.5 * s.x + (1.0 - 0.5) * (rec.level + rec.trend)) - rec.level)
                   + (1.0 - 0.5) * rec.trend AS trend
        FROM rec JOIN s ON s.event_type = rec.event_type AND s.t = rec.t + 1
    )
    SELECT * FROM rec
),
ranked AS (
    SELECT event_type, day, level, trend, level + trend AS forecast,
           row_number() OVER (PARTITION BY event_type ORDER BY day DESC) AS rk
    FROM hw
)
SELECT event_type, day, level, trend, forecast
FROM ranked WHERE rk <= 10
ORDER BY event_type, day
"""


def time_decay_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-DECAY multi-touch attribution: every prior touch within 2
    days of a purchase earns credit ∝ 2^(−Δhours) — and because the
    decay base is a power of two and Δhours an integer, every weight is
    an EXACT binary fraction: per-channel weighted credit is engine-
    identical with no rounding tolerance (contrast exponential decay
    with base e, where exp() is libm-dependent). Credits normalize per
    purchase (ratio of exact sums), then value-weight by the purchase
    amount in cents — the whole chain is exact rationals until one
    final division per row.

    Plan: one user-keyed interval join (purchase × its ≤2-day touch
    window), two bounded aggregations. Window size bounds the per-
    purchase fan-out."""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("u"),
        F.col("ts").alias("pts"),
        F.col("event_id").alias("pid"),
        F.round(F.col("value").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    touches = ev.filter(F.col("event_type") != "purchase").select(
        F.col("user_id").alias("u"),
        F.col("ts").alias("tts"),
        F.col("event_type").alias("channel"),
    )
    joined = purchases.join(touches, "u").filter(
        (F.col("tts") <= F.col("pts"))
        & (F.col("tts") > F.col("pts") - F.expr("INTERVAL 2 DAYS"))
    )
    # exact integer MICROSECONDS, then one integer division: Spark's
    # timestampdiff(SECOND) floors the true diff while SQL engines
    # count second boundaries — they disagree on sub-second parts, and
    # a pair near an exact hour multiple then lands in different decay
    # buckets (found at sf0.1). Timestamps are µs-precision, so the µs
    # diff is the same exact integer everywhere.
    dh = F.expr("timestampdiff(MICROSECOND, tts, pts) div 3600000000").cast("int")
    # 2^-dh as an exact binary fraction: 1 / shiftleft(1, dh); the 2-day
    # window caps dh at 47 — well under the 64-bit shift wrap both
    # engines would otherwise hit (shift counts reduce mod 64)
    w = F.lit(1.0) / F.expr("shiftleft(1L, CAST(__dh AS INT))")
    per_touch = joined.withColumn("__dh", dh).select(
        "pid", "cents", "channel", w.alias("__w")
    )
    tot = per_touch.groupBy("pid").agg(F.sum("__w").alias("__tw"))
    credited = per_touch.join(tot, "pid").select(
        "channel",
        (F.col("__w") / F.col("__tw") * F.col("cents")).alias("__credit_cents"),
    )
    return (
        credited.groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.round(F.sum("__credit_cents") / 100.0, 4).alias("attributed_value"),
        )
        .orderBy("channel")
    )


_TIME_DECAY_SQL = """
WITH purchases AS (
    SELECT user_id AS u, ts AS pts, event_id AS pid,
           CAST(round(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS cents
    FROM events WHERE event_type = 'purchase'
),
touches AS (
    SELECT user_id AS u, ts AS tts, event_type AS channel
    FROM events WHERE event_type <> 'purchase'
),
per_touch AS (
    SELECT pid, cents, channel,
           1.0 / (CAST(1 AS BIGINT) << CAST(date_diff('microsecond', tts, pts) // 3600000000 AS INT)) AS w
    FROM purchases JOIN touches USING (u)
    WHERE tts <= pts AND tts > pts - INTERVAL 2 DAY
),
tot AS (SELECT pid, sum(w) AS tw FROM per_touch GROUP BY pid)
SELECT channel,
       count(*) AS n_touches,
       round(sum(w / tw * cents) / 100.0, 4) AS attributed_value
FROM per_touch JOIN tot USING (pid)
GROUP BY channel
ORDER BY channel
"""


ANALYTICS_QUERIES = {
    "time_decay_attribution": (
        time_decay_attribution,
        _TIME_DECAY_SQL,
        "2^-hours time-decay multi-touch attribution, exact binary weights",
    ),
    "holt_daily_by_type": (
        holt_daily_by_type,
        _HOLT_SQL,
        "Holt level+trend smoothing via grouped map, bit-exact recursive-CTE oracle",
    ),
    "ewma_daily_revenue": (
        ewma_daily_revenue,
        _EWMA_SQL,
        "bounded-lookback EWMA on the daily aggregate",
    ),
    "linear_attribution": (
        linear_attribution,
        _LINEAR_ATTR_SQL,
        "equal-split multi-touch attribution (fan-out + renormalize)",
    ),
    "event_funnel_stats": (
        event_funnel_stats,
        FUNNEL_SQL,
        "funnel conversion: chained per-user min-aggs, one shuffle key",
    ),
    "cohort_retention": (
        cohort_retention,
        COHORT_SQL,
        "weekly cohort-retention matrix (long form)",
    ),
    "user_activity_streaks": (
        user_activity_streaks,
        STREAKS_SQL,
        "gaps-and-islands longest-streak distribution",
    ),
    "rolling_revenue_7d": (
        rolling_revenue_7d,
        ROLLING_SQL,
        "W2: RANGE-frame 7-day trailing window over the daily series",
    ),
    "gap_filled_daily_series": (
        gap_filled_daily_series,
        GAP_FILL_SQL,
        "time-spine resample: zero-fill counts + LOCF price",
    ),
    "variant_props_stats": (
        variant_props_stats,
        VARIANT_SQL,
        "SC7 scale form: VARIANT parse_json/try_variant_get extraction",
    ),
    "dynamic_gap_sessions": (
        dynamic_gap_sessions,
        DYNAMIC_SESSIONS_SQL,
        "S2 depth: expression-valued session gaps (interval-union merge)",
    ),
    "rfm_segment_counts": (
        rfm_segment_counts,
        RFM_SQL,
        "RFM quintile segmentation matrix over orders",
    ),
    "revenue_anomaly_days": (
        revenue_anomaly_days,
        ANOMALY_SQL,
        "trailing-window 3-sigma anomaly days on daily revenue",
    ),
    "weekly_autocorr_by_type": (
        weekly_autocorr_by_type,
        AUTOCORR_SQL,
        "U3 batch grouped-map: per-type lag-7 autocorrelation",
    ),
    "top_event_trigrams": (
        top_event_trigrams,
        TRIGRAMS_SQL,
        "journey mining: top-10 per-user event trigrams",
    ),
    "funnel_time_to_convert": (
        funnel_time_to_convert,
        TIME_TO_CONVERT_SQL,
        "funnel latency: avg + exact-median view->purchase hours",
    ),
    "daily_trend_by_type": (
        daily_trend_by_type,
        TREND_SQL,
        "A1: native regr_slope/intercept/r2 linear trend per type",
    ),
    "last_touch_attribution": (
        last_touch_attribution,
        ATTRIBUTION_SQL,
        "as-of tolerance application: last-touch purchase attribution",
    ),
    "funnel_steps_long": (
        funnel_steps_long,
        FUNNEL_LONG_SQL,
        "N-step funnel operator: 4-step long-form conversion table",
    ),
    "cohort_retention_rates": (
        cohort_retention_rates,
        COHORT_RATES_SQL,
        "cohort retention normalized to percent-of-cohort rates",
    ),
    "event_transition_matrix": (
        event_transition_matrix,
        TRANSITION_SQL,
        "first-order Markov transition probabilities per event type",
    ),
    "repeat_purchase_intervals": (
        repeat_purchase_intervals,
        REPEAT_SQL,
        "repeat-purchase latency distribution (lag gap, day buckets)",
    ),
    "hourly_activity_profile": (
        hourly_activity_profile,
        DAYPART_SQL,
        "daypart load shape: per-hour volume, value and share",
    ),
}
