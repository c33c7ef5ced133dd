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


def render_report_html(report_dict: dict) -> str:
    """HTML pipeline report — the observable effect of the reference's
    email notifier (analytics/etl/etl_notifier.py:156-303), minus SMTP
    (transport is infrastructure, SURVEY §7.4)."""
    status_color = {
        "OK": "#2e7d32", "SKIP": "#757575", "IGNORE": "#f9a825",
        "ERREUR": "#c62828",
    }
    rows = "".join(
        f"<tr><td>{s['name']}</td>"
        f"<td style='color:{status_color.get(s['status'], '#000')}'>"
        f"{s['status']}</td>"
        f"<td>{s['rows'] if s['rows'] is not None else ''}</td>"
        f"<td>{s['duration_sec']}s</td><td>{s['error']}</td></tr>"
        for s in report_dict["steps"]
    )
    overall = "SUCCES" if report_dict["ok"] else "ECHEC"
    return (
        "<html><body><h2>Rapport ETL — "
        f"{overall}</h2><table border='1' cellpadding='4'>"
        "<tr><th>Etape</th><th>Statut</th><th>Lignes</th>"
        "<th>Duree</th><th>Erreur</th></tr>"
        f"{rows}</table></body></html>"
    )


ERROR_SCHEMA = (
    "erreur_id long, date_erreur timestamp, source string, "
    "type_erreur string, message_erreur string, est_resolu boolean"
)


def log_error(
    spark: SparkSession,
    err_dir: str,
    erreur_id: int,
    date_erreur: str,
    source: str,
    type_erreur: str,
    message: str,
    est_resolu: bool = False,
) -> None:
    """Append one row to the error log (dwh.log_erreurs analog,
    008_configure_logging.sql:59-68)."""
    spark.createDataFrame(
        [(erreur_id, date_erreur, source, type_erreur, message, est_resolu)],
        schema="erreur_id long, date_erreur string, source string, "
        "type_erreur string, message_erreur string, est_resolu boolean",
    ).withColumn("date_erreur", F.col("date_erreur").cast("timestamp")).select(
        "erreur_id", "date_erreur", "source", "type_erreur",
        "message_erreur", "est_resolu",
    ).write.mode("append").parquet(err_dir)


def read_error_log(spark: SparkSession, err_dir: str) -> DataFrame:
    return spark.read.schema(ERROR_SCHEMA).parquet(err_dir)


def open_errors(errors: DataFrame, as_of) -> DataFrame:
    """v_erreurs_ouvertes analog (008:190-205): unresolved errors with
    their age in whole hours relative to ``as_of`` (the reference uses
    GETDATE(); a pinned as_of keeps the view deterministic and
    backfill-safe)."""
    hours = F.floor(
        (F.unix_timestamp(as_of) - F.unix_timestamp(F.col("date_erreur")))
        / F.lit(3600)
    )
    return (
        errors.filter(~F.col("est_resolu"))
        .select(
            "erreur_id",
            "date_erreur",
            "source",
            "type_erreur",
            "message_erreur",
            hours.alias("heures_depuis_erreur"),
        )
    )
