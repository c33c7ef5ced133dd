"""Local mirror of the driver's DuckDB-oracle comparison."""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal

import duckdb

from evolution_data_warehouse_spark.queries.common import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    return v


def normalize_rows(rows, columns, col_order):
    """Sort columns by name, normalize values, sort rows."""
    idx = [columns.index(c) for c in col_order]
    out = [tuple(_norm(r[i]) for i in idx) for r in rows]
    return sorted(out, key=repr)


def compare(spark_df, con, sql):
    """Return (ok, message) comparing a Spark DataFrame against DuckDB."""
    oracle = con.execute(sql)
    o_cols = [d[0] for d in oracle.description]
    o_rows = oracle.fetchall()
    s_cols = spark_df.columns
    if sorted(s_cols) != sorted(o_cols):
        return False, f"columns differ: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    order = sorted(s_cols)
    s_rows = [tuple(row) for row in spark_df.collect()]
    if len(s_rows) != len(o_rows):
        return False, f"row counts differ: spark={len(s_rows)} oracle={len(o_rows)}"
    sn = normalize_rows(s_rows, s_cols, order)
    on = normalize_rows(o_rows, o_cols, order)
    if sn != on:
        diffs = [(a, b) for a, b in zip(sn, on) if a != b][:3]
        return False, f"values differ; first diffs (spark, oracle): {diffs}"
    return True, "ok"
