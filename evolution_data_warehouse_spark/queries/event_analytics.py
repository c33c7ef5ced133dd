"""Event-analytics family over the events table: funnel conversion,
cohort retention, forward-fill, and time-spine resampling — the
product-analytics queries a warehouse's event stream serves (reference
analog: the connection/usage tracking marts,
analytics/etl/track_connexions.py + Terraform/sql/005 datamart shapes,
re-expressed over the synthetic events stream).

Determinism: timestamps are exact µs on both engines (see
queries/common.py::t), sums go through dsum, every window order is
fully tie-broken by event_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from evolution_data_warehouse_spark.queries.common import (
    dsum,
    dsum_sql,
    fpq,
    fpq_sql,
    register,
    t,
)

_FUNNEL_ORACLE = """
WITH s AS (
    SELECT user_id, MIN(ts) AS t_signup FROM events
    WHERE event_type = 'signup' GROUP BY user_id
),
v AS (
    SELECT e.user_id, MIN(e.ts) AS t_view
    FROM events e JOIN s ON e.user_id = s.user_id
    WHERE e.event_type = 'view' AND e.ts > s.t_signup
    GROUP BY e.user_id
),
p AS (
    SELECT e.user_id, MIN(e.ts) AS t_purchase
    FROM events e JOIN v ON e.user_id = v.user_id
    WHERE e.event_type = 'purchase' AND e.ts > v.t_view
    GROUP BY e.user_id
)
SELECT 'signup' AS stage, COUNT(*) AS users FROM s
UNION ALL SELECT 'view_after_signup', COUNT(*) FROM v
UNION ALL SELECT 'purchase_after_view', COUNT(*) FROM p
"""


@register(
    "funnel_conversion",
    _FUNNEL_ORACLE,
    doc="Ordered funnel (signup → first view after → first purchase "
    "after that): each stage is one conditional-min aggregate joined to "
    "the previous stage's per-user timestamps — stage count shuffles on "
    "user_id, never a self-join over raw events. At 100 TB every stage "
    "input is the type-filtered slice (pushed to the scan) and the "
    "per-user stage table, both far smaller than the stream.",
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_signup"))
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("t_signup"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    def stage(df: DataFrame, name: str) -> DataFrame:
        return df.agg(F.count("*").alias("users")).select(
            F.lit(name).alias("stage"), "users"
        )
    return (
        stage(s, "signup")
        .unionAll(stage(v, "view_after_signup"))
        .unionAll(stage(p, "purchase_after_view"))
    )


_COHORT_ORACLE = """
WITH first_seen AS (
    SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
    FROM events GROUP BY user_id
)
SELECT cohort_week,
       CAST(date_diff('day', CAST(cohort_week AS DATE),
                      CAST(date_trunc('week', ts) AS DATE)) // 7 AS INT)
           AS week_offset,
       COUNT(DISTINCT e.user_id) AS active_users
FROM events e JOIN first_seen f ON e.user_id = f.user_id
GROUP BY cohort_week, week_offset
"""


@register(
    "cohort_retention",
    _COHORT_ORACLE,
    doc="Weekly cohort retention triangle: users bucket into the week "
    "they were first seen, activity counts distinct users per (cohort, "
    "week offset). Two aggregates — per-user first-seen, then the "
    "cohort×offset rollup — both shuffling on keys whose cardinality "
    "is users, not events. Week arithmetic is Monday-truncated dates "
    "diffed in whole days ÷ 7, identical on both engines.",
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select("user_id", "ts")
    # cast to DATE: DuckDB's date_trunc('week') yields DATE while
    # Spark's yields TIMESTAMP — the values are identical week starts
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    offset = F.floor(
        F.datediff(
            F.date_trunc("week", F.col("ts")).cast("date"),
            F.col("cohort_week"),
        )
        / 7
    ).cast("int")
    return (
        ev.join(first_seen, "user_id")
        .groupBy("cohort_week", offset.alias("week_offset"))
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


_FFILL_ORACLE = """
SELECT event_id, user_id, ts, event_type,
       LAST_VALUE(CASE WHEN event_type <> 'error' THEN value END
                  IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS value_ffill
FROM events
"""


@register(
    "win_fill_forward",
    _FFILL_ORACLE,
    doc="Forward-fill over the event stream: error rows' values are "
    "nulled and replaced by the user's last good value (last-ignore-"
    "nulls over a tie-broken running frame) — the gap-repair pass a "
    "sensor/metrics pipeline runs. One shuffle on user_id; the running "
    "frame is O(1) state per row.",
)
def win_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    good = F.when(F.col("event_type") != "error", F.col("value"))
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.last(good, ignorenulls=True).over(w).alias("value_ffill"),
    )


_RESAMPLE_ORACLE = f"""
WITH daily AS (
    SELECT user_id, date_trunc('day', ts) AS day,
           COUNT(*) AS n_events, {dsum_sql('value')} AS day_value
    FROM events GROUP BY user_id, day
),
bounds AS (
    SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily
    GROUP BY user_id
),
spine AS (
    SELECT user_id,
           unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
    FROM bounds
)
SELECT s.user_id, s.day,
       COALESCE(n_events, 0) AS n_events,
       COALESCE(day_value, CAST(0.0 AS DOUBLE)) AS day_value
FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
"""


@register(
    "ts_resample_daily",
    _RESAMPLE_ORACLE,
    doc="Per-user daily resample with gap zero-fill: aggregate to the "
    "day grain, build each user's calendar spine with sequence() (rows "
    "generated executor-side, no driver loop), left-join the "
    "aggregates back. Spine size is users × days — dimension-scale — "
    "while the event stream is touched exactly once.",
)
def ts_resample_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day"), "value"
    )
    daily = ev.groupBy("user_id", "day").agg(
        F.count("*").alias("n_events"), dsum("value").alias("day_value")
    )
    bounds = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = bounds.select(
        "user_id",
        F.explode(
            F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    return spine.join(daily, ["user_id", "day"], "left").select(
        "user_id",
        "day",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.coalesce("day_value", F.lit(0.0)).alias("day_value"),
    )


_TRANSITION_ORACLE = """
WITH nxt AS (
    SELECT event_type,
           LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS next_type
    FROM events
)
SELECT event_type, next_type, COUNT(*) AS n_transitions
FROM nxt WHERE next_type IS NOT NULL
GROUP BY event_type, next_type
"""


@register(
    "event_transition_matrix",
    _TRANSITION_ORACLE,
    doc="Event-to-next-event transition matrix (the Markov-chain "
    "summary behind path analysis): lead() per user over a tie-broken "
    "order, then a type×type rollup whose cardinality is the square of "
    "the event vocabulary — one user_id shuffle plus a tiny aggregate.",
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select("user_id", "event_id", "ts", "event_type")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count("*").alias("n_transitions"))
    )


_TWAP_ORACLE = f"""
WITH spans AS (
    SELECT user_id, value,
           epoch_us(LEAD(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           )) - epoch_us(ts) AS w_us
    FROM events
)
SELECT user_id,
       {fpq_sql(f"{dsum_sql('value * w_us', 4)} / CAST(SUM(w_us) AS DOUBLE)")}
           AS twap
FROM spans WHERE w_us IS NOT NULL
GROUP BY user_id
"""


@register(
    "ts_time_weighted_avg",
    _TWAP_ORACLE,
    doc="Time-weighted average per user (the sensor/finance TWAP): "
    "each observation weighted by the µs span until the next one "
    "(lead over a tie-broken order), value·weight summed through "
    "decimal casts so the accumulation is order-independent, the final "
    "ratio fixed-point-quantized. One user_id shuffle end-to-end.",
)
def ts_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_us = F.unix_micros(F.lead("ts").over(w)) - F.unix_micros(F.col("ts"))
    spans = ev.withColumn("w_us", w_us).filter(F.col("w_us").isNotNull())
    twap = dsum(F.col("value") * F.col("w_us"), 4) / F.sum(
        "w_us"
    ).cast("double")
    return spans.groupBy("user_id").agg(fpq(twap).alias("twap"))


_CDC_ORACLE = """
WITH ranked AS (
    SELECT user_id, event_id, ts, event_type, value,
           ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
           ) AS rn
    FROM events
)
SELECT user_id, event_id AS last_event_id, ts AS last_ts, value AS last_value
FROM ranked
WHERE rn = 1 AND event_type <> 'error'
"""


@register(
    "cdc_apply_log",
    _CDC_ORACLE,
    doc="CDC log apply: the events stream read as a change log per key "
    "— keep each user's latest operation (fully tie-broken by ts then "
    "event_id) and drop keys whose latest op is a tombstone ('error' "
    "stands in for DELETE). One window shuffle on the key; at 100 TB "
    "this is the compaction step a log-structured table runs, and "
    "rn=1 compiles to a per-partition top-1 (WindowGroupLimit), never "
    "a full sort of the log.",
)
def cdc_apply_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("ts").alias("last_ts"),
            F.col("value").alias("last_value"),
        )
    )


_MODE_ORACLE = """
WITH counts AS (
    SELECT user_id, event_type, COUNT(*) AS n
    FROM events GROUP BY user_id, event_type
),
ranked AS (
    SELECT user_id, event_type, n,
           ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY n DESC, event_type
           ) AS rn
    FROM counts
)
SELECT user_id, event_type AS mode_type, n AS mode_count
FROM ranked WHERE rn = 1
"""


@register(
    "agg_mode_per_group",
    _MODE_ORACLE,
    doc="Deterministic mode (most frequent event type per user): count "
    "per (key, value), then top-1 by (count desc, value asc) — the "
    "explicit tie-break native mode() functions don't guarantee, which "
    "is why engines disagree on raw mode(). Two hash aggregates; the "
    "window runs on key×vocabulary rows, not events.",
)
def agg_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts = (
        t(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n"))
    )
    w = W.partitionBy("user_id").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("mode_type"),
            F.col("n").alias("mode_count"),
        )
    )


_SESSION_CONV_ORACLE = """
WITH g AS (
    SELECT user_id, event_id, ts, event_type,
           CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  OR lag(ts) OVER w IS NULL
                THEN 1 ELSE 0 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
    SELECT user_id, event_id, ts, event_type,
           SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS session_id
    FROM g
),
per_session AS (
    SELECT user_id, session_id,
           COUNT(*) AS n_events,
           MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
           MAX(CASE WHEN event_type = 'purchase' THEN ts END) AS last_purchase
    FROM sess GROUP BY user_id, session_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(CASE WHEN first_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS sessions_with_view,
       CAST(SUM(CASE WHEN first_view IS NOT NULL
                      AND last_purchase > first_view THEN 1 ELSE 0 END)
            AS BIGINT) AS converted_sessions
FROM per_session
"""


@register(
    "session_conversion",
    _SESSION_CONV_ORACLE,
    doc="Sessionized conversion: gap-based sessions (the win_session_gap "
    "operator) composed with funnel logic — a session converts when a "
    "purchase follows its first view. Three window/aggregate passes all "
    "keyed on user_id (one shuffle, reused), then a constant-size "
    "rollup; demonstrates the session and funnel operators composing "
    "without new shuffle keys.",
)
def session_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # exact µs gap, matching the oracle's exact interval comparison
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    marker = F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    sess = ev.withColumn("session_id", F.sum(marker).over(run))
    per_session = sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "first_view"
        ),
        F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "last_purchase"
        ),
    )
    has_view = F.col("first_view").isNotNull()
    converted = has_view & (F.col("last_purchase") > F.col("first_view"))
    return per_session.agg(
        F.count("*").alias("n_sessions"),
        F.sum(has_view.cast("int")).alias("sessions_with_view"),
        F.sum(converted.cast("int")).alias("converted_sessions"),
    )


_STREAK_ORACLE = """
WITH days AS (
    SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
    FROM events
),
islands AS (
    SELECT user_id, day,
           day - CAST(ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY day
           ) AS INT) AS island_key
    FROM days
)
SELECT user_id,
       MIN(day) AS streak_start,
       MAX(day) AS streak_end,
       COUNT(*) AS streak_days
FROM islands
GROUP BY user_id, island_key
"""


@register(
    "win_gaps_islands",
    _STREAK_ORACLE,
    doc="Gaps-and-islands (consecutive-day activity streaks per user): "
    "distinct active days, then the day-minus-row_number constant "
    "groups each consecutive run into one island — two aggregates and "
    "one window, all shuffling on user_id; no self-join, no recursion. "
    "The canonical streak/uptime/retention-run primitive.",
)
def win_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    days = (
        t(spark, sf_dir, "events")
        .select(
            "user_id",
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        )
        .distinct()
    )
    w = W.partitionBy("user_id").orderBy("day")
    islands = days.withColumn(
        "island_key",
        F.date_sub(F.col("day"), F.row_number().over(w)),
    )
    return (
        islands.groupBy("user_id", "island_key")
        .agg(
            F.min("day").alias("streak_start"),
            F.max("day").alias("streak_end"),
            F.count("*").alias("streak_days"),
        )
        .drop("island_key")
    )
