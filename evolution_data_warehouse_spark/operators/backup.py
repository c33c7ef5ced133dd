"""Snapshot backup + retention (proc_backup analog).

Re-expresses the observable effects of analytics/etl/
backup_to_datalake.py:74-189 (BACPAC export + 30-day retention) as
parquet snapshot copies with stamped directories and a keep-last-N
cleanup. Orchestration, not a query op (SURVEY §2.10).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def snapshot_table(df: DataFrame, backup_root: str, table: str, stamp: str) -> str:
    """Write a stamped snapshot copy; returns the snapshot path."""
    path = os.path.join(backup_root, table, stamp)
    df.write.mode("overwrite").parquet(path)
    return path


def list_snapshots(backup_root: str, table: str) -> list[str]:
    base = os.path.join(backup_root, table)
    if not os.path.isdir(base):
        return []
    return sorted(d for d in os.listdir(base) if not d.startswith("_"))


def retention_cleanup(backup_root: str, table: str, keep_last: int) -> list[str]:
    """Delete all but the newest ``keep_last`` snapshots (stamp-sorted);
    returns the deleted stamps. Ref: backup_to_datalake.py:133,250-251
    (30-day retention)."""
    snaps = list_snapshots(backup_root, table)
    doomed = snaps[:-keep_last] if keep_last > 0 else snaps
    for stamp in doomed:
        shutil.rmtree(os.path.join(backup_root, table, stamp))
    return doomed


def restore_snapshot(
    spark: SparkSession, backup_root: str, table: str, stamp: str | None = None
) -> DataFrame:
    """Read a snapshot back (latest when no stamp given)."""
    snaps = list_snapshots(backup_root, table)
    if not snaps:
        raise FileNotFoundError(f"no snapshots for {table} under {backup_root}")
    stamp = stamp or snaps[-1]
    return spark.read.parquet(os.path.join(backup_root, table, stamp))
