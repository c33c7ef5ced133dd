"""Nested communes.json ingestion (FIXTURES.md §2; notebook cells 8-9).

The payload envelope is {source, fields, generated_at, departements,
commune_count, communes: [...]} (fetch_communes.py:257-264); each
commune carries nested structs (centre, departement) and an array of
postal codes. Spark keeps the nesting native — struct access instead
of the reference's json_normalize + serialize round trip — and the
bridge table is one explode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

COMMUNE_SCHEMA = T.StructType(
    [
        T.StructField("nom", T.StringType()),
        T.StructField("code", T.StringType()),
        T.StructField("codesPostaux", T.ArrayType(T.StringType())),
        T.StructField("codeDepartement", T.StringType()),
        T.StructField(
            "departement",
            T.StructType(
                [
                    T.StructField("code", T.StringType()),
                    T.StructField("nom", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "centre",
            T.StructType(
                [
                    T.StructField("type", T.StringType()),
                    T.StructField("coordinates", T.ArrayType(T.DoubleType())),
                ]
            ),
        ),
        T.StructField("population", T.LongType()),
    ]
)

PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("generated_at", T.StringType()),
        T.StructField("commune_count", T.LongType()),
        T.StructField("communes", T.ArrayType(COMMUNE_SCHEMA)),
    ]
)


def load_communes(spark: SparkSession, path: str) -> DataFrame:
    """Payload JSON → one row per commune with flattened geo columns
    and the postal-code array kept native (notebook cell 8)."""
    payload = spark.read.option("multiLine", True).schema(PAYLOAD_SCHEMA).json(path)
    c = payload.select(F.explode("communes").alias("c")).select(
        F.col("c.code").alias("commune_code"),
        F.col("c.nom").alias("commune_nom"),
        F.col("c.codesPostaux").alias("codes_postaux"),
        F.col("c.codeDepartement").alias("departement_code"),
        F.col("c.departement.nom").alias("departement_nom"),
        F.col("c.centre.coordinates").getItem(0).alias("longitude"),
        F.col("c.centre.coordinates").getItem(1).alias("latitude"),
        F.col("c.population").alias("population"),
    )
    return c.dropDuplicates(["commune_code"])


def bridge_commune_postal(communes: DataFrame) -> DataFrame:
    """Commune ↔ postal-code many-to-many bridge (notebook cell 9)."""
    return communes.select(
        "commune_code", F.explode("codes_postaux").alias("code_postal")
    ).dropDuplicates()


def commune_geojson_side_table(communes: DataFrame) -> DataFrame:
    """GeoJSON point side-table: nested struct serialized once for
    egress (notebook cell 8 / export_to_sql.py:167-171)."""
    geom = F.struct(
        F.lit("Point").alias("type"),
        F.array("longitude", "latitude").alias("coordinates"),
    )
    return communes.select(
        "commune_code", F.to_json(geom).alias("geojson")
    )
