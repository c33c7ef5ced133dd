"""SCD merge scenario tests mirroring the reference's documented cases
(docs/E6_SCALABILITY_PROCEDURES.md:253-276: commune rename/fusion;
010_scd_dimensions.sql close/insert/version semantics)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from evolution_data_warehouse_spark.operators.scd import (
    scd1_apply,
    scd2_apply,
    scd3_apply,
)

def _ts():
    return F.lit("2025-06-01 00:00:00").cast("timestamp")


@pytest.fixture(scope="module")
def current(spark):
    # k1: will change; k2: unchanged; k3: absent from staged;
    # k1 also has an inactive historical row that must pass through.
    return spark.createDataFrame(
        [
            ("k1", "Lille", 2, True, "2020-01-01 00:00:00", None),
            ("k1", "Lisle", 1, False, "2010-01-01 00:00:00", "2020-01-01 00:00:00"),
            ("k2", "Amiens", 1, True, "2020-01-01 00:00:00", None),
            ("k3", "Arras", 1, True, "2020-01-01 00:00:00", None),
        ],
        schema="commune_code string, nom string, version int, est_actif boolean, "
        "date_debut_validite string, date_fin_validite string",
    ).select(
        "commune_code", "nom", "version", "est_actif",
        F.col("date_debut_validite").cast("timestamp").alias("date_debut_validite"),
        F.col("date_fin_validite").cast("timestamp").alias("date_fin_validite"),
    )


@pytest.fixture(scope="module")
def staged(spark):
    # k1 renamed, k2 unchanged, k4 brand-new; k3 missing (no delete).
    return spark.createDataFrame(
        [("k1", "Lille-Metropole"), ("k2", "Amiens"), ("k4", "Calais")],
        schema="commune_code string, nom string",
    )


def test_scd2_branches(spark, current, staged):
    out = scd2_apply(current, staged, "commune_code", ["nom"], _ts())
    rows = {(r.commune_code, r.version): r for r in out.collect()}
    assert len(rows) == 6  # 4 current + 1 new version + 1 brand-new

    closed = rows[("k1", 2)]
    assert closed.est_actif is False and closed.nom == "Lille"
    assert closed.date_fin_validite is not None

    new_ver = rows[("k1", 3)]
    assert new_ver.est_actif is True and new_ver.nom == "Lille-Metropole"
    assert new_ver.date_fin_validite is None

    history = rows[("k1", 1)]
    assert history.nom == "Lisle" and history.est_actif is False

    assert rows[("k2", 1)].est_actif is True  # unchanged
    assert rows[("k3", 1)].est_actif is True  # absent from staged: kept
    brand_new = rows[("k4", 1)]
    assert brand_new.nom == "Calais" and brand_new.est_actif is True


def test_scd2_one_active_row_per_key(spark, current, staged):
    out = scd2_apply(current, staged, "commune_code", ["nom"], _ts())
    active = out.filter(F.col("est_actif")).groupBy("commune_code").count()
    assert active.filter(F.col("count") > 1).count() == 0


def test_scd2_idempotent(spark, current, staged):
    once = scd2_apply(current, staged, "commune_code", ["nom"], _ts())
    twice = scd2_apply(once, staged, "commune_code", ["nom"], _ts())
    # Re-applying the same staged snapshot changes nothing.
    assert twice.count() == once.count()
    assert (
        twice.filter(F.col("est_actif")).count()
        == once.filter(F.col("est_actif")).count()
    )


def test_scd1_overwrite(spark, current, staged):
    cur = current.filter(F.col("est_actif")).select("commune_code", "nom")
    out = scd1_apply(cur, staged, "commune_code", ["nom"])
    got = {r.commune_code: r.nom for r in out.collect()}
    assert got == {
        "k1": "Lille-Metropole",
        "k2": "Amiens",
        "k3": "Arras",  # untouched
        "k4": "Calais",  # inserted
    }


def test_scd3_shift(spark, current, staged):
    cur = current.filter(F.col("est_actif")).select("commune_code", "nom")
    out = scd3_apply(cur, staged, "commune_code", "nom", _ts())
    rows = {r.commune_code: r for r in out.collect()}
    assert rows["k1"].nom == "Lille-Metropole"
    assert rows["k1"].ancien_nom == "Lille"
    assert rows["k1"].date_changement is not None
    assert rows["k2"].ancien_nom is None and rows["k2"].date_changement is None
    assert rows["k3"].nom == "Arras"
    assert rows["k4"].nom == "Calais" and rows["k4"].ancien_nom is None
