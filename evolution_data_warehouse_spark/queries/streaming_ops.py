"""Streaming-shaped operators, batch-checked against the oracle.

The windowed aggregation below shares its logical plan with the
readStream variant (streaming/events.py) — Structured Streaming runs
the same plan incrementally. The oracle uses DuckDB's time_bucket
(hour buckets align on :00 in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from evolution_data_warehouse_spark.queries.common import dsum_sql, register, t
from evolution_data_warehouse_spark.streaming.events import windowed_counts

_WINDOW_ORACLE = f"""
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       {dsum_sql('value')} AS total_value
FROM events
GROUP BY time_bucket(INTERVAL '1 hour', ts), event_type
"""


@register(
    "stream_window_counts",
    _WINDOW_ORACLE,
    doc="Tumbling-window counts + sums over the event stream (batch twin "
    "of the watermarked streaming query; SURVEY §2.9 extension).",
)
def stream_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return windowed_counts(t(spark, sf_dir, "events"), "1 hour")


_INTERVAL_ORACLE = """
SELECT p.event_id AS purchase_id, p.user_id,
       p.ts AS purchase_ts,
       v.event_id AS view_id, v.ts AS view_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id
 AND v.ts <= p.ts
 AND v.ts >= p.ts - INTERVAL '1 hour'
"""


@register(
    "stream_interval_join",
    _INTERVAL_ORACLE,
    doc="Interval attribution join: every view by the same user within "
    "1 hour before a purchase — the batch twin of the watermarked "
    "stream-stream join (streaming/events.py "
    "stream_stream_attribution), whose two-sided watermarks bound join "
    "state on unbounded streams (SURVEY §2.9 extension).",
)
def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from evolution_data_warehouse_spark.streaming.events import (
        stream_stream_attribution,
    )

    ev = t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        "user_id",
        F.col("ts").alias("view_ts"),
    )
    return stream_stream_attribution(purchases, views, max_gap="1 hour")
