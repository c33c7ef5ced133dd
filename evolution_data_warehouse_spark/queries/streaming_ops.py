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
