"""The TableSpec staging pipeline — schema-on-read, rename-driven,
tolerant.

Re-expresses the reference's staging layer (analytics/notebooks/
data_preparation.ipynb cells 4-9; analytics/export_to_sql.py:228-256):

    read CSV/JSON/parquet
    → normalize column names (lower, %→pct, non-alnum→_)
    → per-source rename map
    → geo_id regex enrichment
    → tolerant numeric coercion (errors='coerce' ↔ try_cast)
    → dtype overrides
    → row dedup
    → lineage columns (source_file, dataset)
    → optional pluggable DataFrame→DataFrame transform
      (§2.10 udf_extra_transform — a plan hook, not a row UDF)

Everything is a declarative column operation, so at 100 TB the whole
staging pass is one scan with no shuffle (dedup adds one only when
requested).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from evolution_data_warehouse_spark.functions.geo import enrich_geo_columns
from evolution_data_warehouse_spark.functions.naming import normalize_name


@dataclass
class TableSpec:
    """One staging source. Mirrors notebook cell 4's TableSpec."""

    name: str
    source_path: str
    fmt: str = "csv"  # csv | json | parquet
    rename: dict[str, str] = field(default_factory=dict)
    numeric_columns: Sequence[str] = ()
    dtype_overrides: dict[str, str] = field(default_factory=dict)
    dedup: bool = True
    dedup_subset: Sequence[str] | None = None
    geo_col: str | None = None  # enrich when present
    extra_transform: Callable[[DataFrame], DataFrame] | None = None


def read_source(spark: SparkSession, spec: TableSpec) -> DataFrame:
    if spec.fmt == "csv":
        return spark.read.option("header", True).csv(spec.source_path)
    if spec.fmt == "json":
        return spark.read.option("multiLine", True).json(spec.source_path)
    if spec.fmt == "parquet":
        return spark.read.parquet(spec.source_path)
    raise ValueError(f"unsupported staging format: {spec.fmt}")


def load_table(spark: SparkSession, spec: TableSpec) -> DataFrame:
    """Run the full staging pipeline for one spec."""
    df = read_source(spark, spec)

    # 1. mechanical name normalization
    df = df.toDF(*[normalize_name(c) for c in df.columns])

    # 2. per-source rename map (keys given in raw or normalized form)
    renames = {normalize_name(k): v for k, v in spec.rename.items()}
    df = df.withColumnsRenamed({k: v for k, v in renames.items() if k in df.columns})

    # 3. geo enrichment
    geo_col = spec.geo_col or ("geo_id" if "geo_id" in df.columns else None)
    if geo_col and geo_col in df.columns:
        df = enrich_geo_columns(df, geo_col)

    # 4. tolerant numeric coercion (pandas errors='coerce')
    for c in spec.numeric_columns:
        if c in df.columns:
            df = df.withColumn(c, F.col(c).try_cast("double"))

    # 5. dtype overrides
    for c, dtype in spec.dtype_overrides.items():
        if c in df.columns:
            df = df.withColumn(c, F.col(c).try_cast(dtype))

    # 6. dedup
    if spec.dedup:
        df = (
            df.dropDuplicates(list(spec.dedup_subset))
            if spec.dedup_subset
            else df.dropDuplicates()
        )

    # 7. lineage (from the spec, like the reference's pandas pipeline —
    # input_file_name() is empty under the DSv2 parquet/csv readers)
    import os

    df = df.withColumn(
        "source_file", F.lit(os.path.basename(spec.source_path))
    ).withColumn("dataset", F.lit(spec.name))

    # 8. pluggable transform hook
    if spec.extra_transform is not None:
        df = spec.extra_transform(df)
    return df


def prepare_tables(
    spark: SparkSession, specs: Sequence[TableSpec]
) -> dict[str, DataFrame]:
    """The reference's prepare_tables(): name → staged DataFrame."""
    return {spec.name: load_table(spark, spec) for spec in specs}


def tables_summary(tables: dict[str, DataFrame]) -> DataFrame:
    """name / n_rows / n_cols summary (analytics/export_to_sql.py
    tables_summary analog). Lazy union of per-table 1-row aggregates:
    a single Spark job when collected, instead of one driver-side
    count() job per table."""
    parts = [
        df.agg(F.count(F.lit(1)).cast("long").alias("n_rows")).select(
            F.lit(name).alias("table_name"),
            "n_rows",
            F.lit(len(df.columns)).cast("int").alias("n_cols"),
        )
        for name, df in tables.items()
    ]
    if not parts:
        raise ValueError("tables_summary: no staged tables to summarize")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def resolve_column(df: DataFrame, *candidates: str) -> str | None:
    """Case-insensitive column resolution with fallback aliases —
    the reference's defensive schema-on-read (load_facts.py:121-136:
    YEAR → TIME_PERIOD → ANNEE)."""
    lower = {c.lower(): c for c in df.columns}
    for cand in candidates:
        if cand.lower() in lower:
            return lower[cand.lower()]
    return None
