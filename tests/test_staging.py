"""Staging pipeline tests mirroring the reference's fixtures
(FIXTURES.md §1: INSEE SDMX-style CSVs with geo_id, tolerant numerics)."""

from __future__ import annotations

import os

import pytest

from evolution_data_warehouse_spark.sources.staging import (
    TableSpec,
    load_table,
    prepare_tables,
    resolve_column,
    tables_summary,
)

CSV = """GEO_ID,PCS_CODE,TIME_PERIOD,OBS_VALUE,Market/Segment %
2021-DEP-59,1,2021,123.5,a b
2021-DEP-2,2,2021,oops,c
2021-DEP-59,1,2021,123.5,a b
bad-id,3,2020,7,d
"""


@pytest.fixture(scope="module")
def csv_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("staging") / "population.csv"
    p.write_text(CSV)
    return str(p)


@pytest.fixture(scope="module")
def spec(csv_path):
    return TableSpec(
        name="stg_population",
        source_path=csv_path,
        rename={"TIME_PERIOD": "year", "OBS_VALUE": "population_value"},
        numeric_columns=["population_value"],
        dtype_overrides={"year": "int"},
    )


def test_normalize_and_rename(spark, spec):
    df = load_table(spark, spec)
    assert "geo_id" in df.columns
    assert "year" in df.columns
    assert "population_value" in df.columns
    # '%' → pct, '/' and spaces → '_'
    assert "market_segment_pct" in df.columns


def test_geo_enrichment(spark, spec):
    df = load_table(spark, spec)
    rows = {r.geo_id: r for r in df.collect()}
    good = rows["2021-DEP-59"]
    assert good.geo_reference_year == 2021
    assert good.geo_level_code == "DEP"
    assert good.geo_code == "59"
    # zero-padding of width-1 codes (pandas zfill semantics)
    assert rows["2021-DEP-2"].geo_code == "02"
    # unparseable geo_id → NULLs, no error
    bad = rows["bad-id"]
    assert bad.geo_reference_year is None and bad.geo_level_code is None


def test_tolerant_coercion_and_dedup(spark, spec):
    df = load_table(spark, spec)
    rows = {r.geo_id: r for r in df.collect()}
    assert rows["2021-DEP-59"].population_value == 123.5
    assert rows["2021-DEP-2"].population_value is None  # 'oops' coerced
    assert df.count() == 3  # duplicate row dropped


def test_lineage_and_transform_hook(spark, csv_path):
    spec = TableSpec(
        name="hooked",
        source_path=csv_path,
        extra_transform=lambda df: df.filter(df.geo_id != "bad-id"),
    )
    df = load_table(spark, spec)
    assert df.filter(df.dataset != "hooked").count() == 0
    assert df.select("source_file").first()[0] == "population.csv"
    assert df.filter(df.geo_id == "bad-id").count() == 0


def test_prepare_and_summary(spark, spec):
    tables = prepare_tables(spark, [spec])
    summary = tables_summary(tables)
    row = summary.first()
    assert row.table_name == "stg_population" and row.n_rows == 3


def test_resolve_column_alias_fallback(spark, spec):
    df = load_table(spark, spec)
    # load_facts.py:121-136 semantics: first existing candidate wins,
    # case-insensitively.
    assert resolve_column(df, "YEAR", "TIME_PERIOD", "ANNEE") == "year"
    assert resolve_column(df, "nonexistent", "GEO_ID") == "geo_id"
    assert resolve_column(df, "nope") is None
