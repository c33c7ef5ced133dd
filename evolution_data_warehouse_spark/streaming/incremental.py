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


def incremental_upsert_latest(
    spark: SparkSession,
    src_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    schema,
    key_col: str = "user_id",
    seq_cols: tuple[str, str] = ("ts", "event_id"),
    tombstone_pred=None,
) -> None:
    """Streaming CDC apply: drain new files and merge latest-op-per-key
    into a keyed parquet store via foreachBatch — the streaming twin of
    the batch ``cdc_apply_log`` query.

    Each micro-batch reduces to its own latest row per key (tie-broken
    by ``seq_cols``), then merges against the store keeping whichever
    side is newer; keys whose winning op satisfies ``tombstone_pred``
    are deleted. The merge is one outer join keyed on ``key_col`` —
    batch-sized × store-sized, never log-sized — and the store rewrite
    is the same read-merge-overwrite discipline as the SCD batches.
    Exactly-once across restarts comes from the file-source checkpoint.
    Deletion is as-of-the-latest-op: a tombstoned key stays absent
    unless a NEWER op arrives — rows older than an applied tombstone
    would re-insert only under out-of-order delivery, the same
    in-order assumption the stateful operators document (pair with a
    watermark-bounded source at real scale).
    """
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    s1, s2 = seq_cols

    def merge(batch_df, batch_id):
        w = W.partitionBy(key_col).orderBy(F.desc(s1), F.desc(s2))
        latest = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        spark_l = batch_df.sparkSession
        try:
            store = spark_l.read.parquet(store_dir)
            merged = (
                latest.withColumn("_src", F.lit("new"))
                .unionByName(store.withColumn("_src", F.lit("old")))
                .withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn", "_src")
            )
        except Exception:  # first batch: no store yet
            merged = latest
        if tombstone_pred is not None:
            merged = merged.filter(~tombstone_pred(merged))
        tmp = f"{store_dir}__staging"
        merged.write.mode("overwrite").parquet(tmp)
        final = spark_l.read.parquet(tmp)
        final.write.mode("overwrite").parquet(store_dir)

    q = (
        spark.readStream.schema(schema)
        .parquet(src_dir)
        .writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
