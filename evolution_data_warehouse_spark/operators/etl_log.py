"""Structured ETL event logging (dwh.log_etl / dwh.log_erreurs analog).

Ref: Terraform/sql/008_configure_logging.sql:15-25,59-68 (tables),
:94-133 (sp_log_etl); Python mirror analytics/etl/load_facts.py:43-57.
Append-only parquet tables + monitoring views as DataFrames.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LOG_SCHEMA = (
    "etape string, nom_table string, statut string, lignes_traitees long, "
    "duree_secondes double, message string, date_execution timestamp"
)


def log_event(
    spark: SparkSession,
    log_dir: str,
    etape: str,
    nom_table: str,
    statut: str,
    lignes: int = 0,
    duree: float = 0.0,
    message: str = "",
) -> None:
    row = [(etape, nom_table, statut, lignes, duree, message)]
    df = spark.createDataFrame(
        row,
        schema="etape string, nom_table string, statut string, "
        "lignes_traitees long, duree_secondes double, message string",
    ).withColumn("date_execution", F.current_timestamp())
    df.write.mode("append").parquet(log_dir)


@contextmanager
def logged_step(spark: SparkSession, log_dir: str, etape: str, nom_table: str):
    """Time a pipeline step and append OK/ERREUR on exit (sp_log_etl
    shape). Yields a dict the step can fill with 'lignes'."""
    info = {"lignes": 0}
    t0 = time.time()
    try:
        yield info
    except Exception as exc:  # noqa: BLE001 - logged then re-raised
        log_event(
            spark, log_dir, etape, nom_table, "ERREUR",
            info.get("lignes", 0), time.time() - t0, str(exc)[:500],
        )
        raise
    log_event(
        spark, log_dir, etape, nom_table, "OK",
        info.get("lignes", 0), time.time() - t0, "",
    )


def read_log(spark: SparkSession, log_dir: str) -> DataFrame:
    return spark.read.schema(LOG_SCHEMA).parquet(log_dir)


def monitoring_summary(log: DataFrame) -> DataFrame:
    """v_monitoring_etl analog (008:171-205): per step/status counts +
    conditional error counters."""
    return log.groupBy("etape", "nom_table").agg(
        F.count("*").alias("n_executions"),
        F.sum(F.when(F.col("statut") == "ERREUR", 1).otherwise(0))
        .cast("long")
        .alias("n_erreurs"),
        F.max("date_execution").alias("derniere_execution"),
        F.sum("lignes_traitees").alias("total_lignes"),
    )
