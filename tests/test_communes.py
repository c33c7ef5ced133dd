"""Nested communes.json ingestion + bridge + geojson side-table
(FIXTURES.md §2; notebook cells 8-9)."""

from __future__ import annotations

import json

import pytest

from evolution_data_warehouse_spark.sources.communes import (
    bridge_commune_postal,
    commune_geojson_side_table,
    load_communes,
)

PAYLOAD = {
    "source": "geo.api.gouv.fr",
    "generated_at": "2026-01-01T00:00:00",
    "commune_count": 3,
    "communes": [
        {
            "nom": "Lille",
            "code": "59350",
            "codesPostaux": ["59000", "59800", "59160"],
            "codeDepartement": "59",
            "departement": {"code": "59", "nom": "Nord"},
            "centre": {"type": "Point", "coordinates": [3.0456, 50.6311]},
            "population": 236234,
        },
        {
            "nom": "Arras",
            "code": "62041",
            "codesPostaux": ["62000"],
            "codeDepartement": "62",
            "departement": {"code": "62", "nom": "Pas-de-Calais"},
            "centre": {"type": "Point", "coordinates": [2.7819, 50.2930]},
            "population": 41694,
        },
        # duplicate record → dedup on commune_code
        {
            "nom": "Arras",
            "code": "62041",
            "codesPostaux": ["62000"],
            "codeDepartement": "62",
            "departement": {"code": "62", "nom": "Pas-de-Calais"},
            "centre": {"type": "Point", "coordinates": [2.7819, 50.2930]},
            "population": 41694,
        },
    ],
}


@pytest.fixture(scope="module")
def communes(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("communes") / "communes.json"
    p.write_text(json.dumps(PAYLOAD))
    return load_communes(spark, str(p))


def test_load_communes_flatten_and_dedup(spark, communes):
    rows = {r.commune_code: r for r in communes.collect()}
    assert set(rows) == {"59350", "62041"}  # dup dropped
    lille = rows["59350"]
    assert lille.departement_nom == "Nord"
    assert lille.longitude == pytest.approx(3.0456)
    assert lille.codes_postaux == ["59000", "59800", "59160"]


def test_bridge_explode(spark, communes):
    bridge = bridge_commune_postal(communes)
    assert bridge.count() == 4  # 3 Lille + 1 Arras
    lille_codes = {
        r.code_postal
        for r in bridge.filter(bridge.commune_code == "59350").collect()
    }
    assert lille_codes == {"59000", "59800", "59160"}


def test_geojson_side_table(spark, communes):
    side = commune_geojson_side_table(communes)
    g = json.loads(
        side.filter(side.commune_code == "62041").first().geojson
    )
    assert g == {"type": "Point", "coordinates": [2.7819, 50.2930]}


def test_dim_logement_seed(spark):
    from evolution_data_warehouse_spark.warehouse.dimensions import (
        build_all,
        dim_logement,
    )

    d = dim_logement(spark)
    assert d.count() == 6
    assert {r.type_code for r in d.collect()} == {"OVEROCC", "OCS"}
    assert len(build_all(spark)) == 6  # all six reference dimensions
