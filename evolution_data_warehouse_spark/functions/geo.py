"""Geo-code helpers reproducing the reference's staging enrichment.

Ref: analytics/notebooks/data_preparation.ipynb cell 4
(`enrich_geo_columns`): geo_id strings like "2024-DEP-02" are parsed
into (geo_reference_year, geo_level_code, geo_code), with geo_code
zero-padded to width >= 2.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GEO_ID_PATTERN = r"(\d+)-([A-Z]+)-(.+)"


def zfill(col: Column, width: int = 2) -> Column:
    """Zero-pad to width, preserving longer strings (pandas str.zfill
    semantics, not lpad truncation)."""
    return F.when(F.length(col) < width, F.lpad(col, width, "0")).otherwise(col)


def enrich_geo_columns(df: DataFrame, col: str = "geo_id") -> DataFrame:
    """Add geo_reference_year / geo_level_code / geo_code parsed from
    ``col``. Unparseable values yield NULLs (regexp_extract returns ''
    → try_cast/NULLIF handles it), mirroring pandas' tolerant extract."""
    year_s = F.regexp_extract(F.col(col), GEO_ID_PATTERN, 1)
    level = F.regexp_extract(F.col(col), GEO_ID_PATTERN, 2)
    code = F.regexp_extract(F.col(col), GEO_ID_PATTERN, 3)
    return (
        df.withColumn("geo_reference_year", year_s.try_cast("int"))
        .withColumn("geo_level_code", F.nullif(level, F.lit("")))
        .withColumn("geo_code", zfill(F.nullif(code, F.lit(""))))
    )
