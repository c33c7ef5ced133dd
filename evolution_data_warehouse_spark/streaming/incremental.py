"""Incremental landing-zone loads via availableNow triggered streaming.

The reference's idempotence is count-before-insert guards
(load_facts.py:162-166) re-run by cron; Structured Streaming's file
source + checkpoint gives the same exactly-once semantics natively:
each run picks up only files not yet processed (SURVEY §2.9 mapping).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def incremental_append(
    spark: SparkSession,
    src_dir: str,
    schema: T.StructType | str,
    out_dir: str,
    checkpoint_dir: str,
    transform=None,
) -> int:
    """Drain new files from src_dir into out_dir (parquet, append),
    tracked by checkpoint. Returns number of batches processed this run."""
    stream = spark.readStream.schema(schema).parquet(src_dir)
    if transform is not None:
        stream = transform(stream)
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return len(q.recentProgress)


def read_target(spark: SparkSession, out_dir: str, schema) -> DataFrame:
    return spark.read.schema(schema).parquet(out_dir)
