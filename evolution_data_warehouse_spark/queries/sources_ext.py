"""Acquisition-edge + procedural operators as registry queries:
REST fetch, blob listing, the staging transform hook, ANALYZE stats."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from evolution_data_warehouse_spark.queries.common import register, t
from evolution_data_warehouse_spark.queries.relational import _scratch
from evolution_data_warehouse_spark.sources.external import (
    jdbc_available,
    list_blobs,
    read_jdbc,
    rest_to_dataframe,
    write_jdbc,
)
from evolution_data_warehouse_spark.sources.staging import TableSpec, load_table

_TESTDATA_FILES = (
    "customer documents embeddings events lineitem nation orders part "
    "region supplier"
).split()


@register(
    "src_blob_list",
    "SELECT * FROM (VALUES "
    + ", ".join(f"('{n}.parquet')" for n in _TESTDATA_FILES)
    + ") AS t(object_name)",
    doc="List objects under a prefix via the Hadoop FS API (catalog op). "
    "Ref: analytics/data_loader.py:44-45 (list_blobs). Same call works "
    "for s3a:// / abfss:// at scale.",
)
def src_blob_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = list_blobs(spark, sf_dir, suffix=".parquet")
    return spark.createDataFrame([(n,) for n in names], schema="object_name string")


def _stub_fetcher(url: str) -> str:
    """Deterministic stand-in for the paged government API (the real
    fetcher is requests-based; network egress is out of scope here)."""
    import json

    dept = url.rsplit("=", 1)[-1]
    return json.dumps(
        {
            "communes": [
                {
                    "code": f"{dept}00{i}",
                    "nom": f"Commune-{dept}-{i}",
                    "codeDepartement": dept,
                }
                for i in range(1, 4)
            ]
        }
    )


_REST_ORACLE = "SELECT * FROM (VALUES " + ", ".join(
    f"('{d}00{i}', 'Commune-{d}-{i}', '{d}')"
    for d in ("59", "62")
    for i in range(1, 4)
) + ") AS t(code, nom, codeDepartement)"


@register(
    "src_rest_api",
    _REST_ORACLE,
    doc="Paged REST fetch per department → DataFrame. Ref: ingestion/API/"
    "fetch_communes.py:116-154. Acquisition is driver-side by nature; "
    "the fetcher is injected (stubbed here — no network egress).",
)
def src_rest_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rest_to_dataframe(
        spark,
        _stub_fetcher,
        "https://geo.example/communes?dept={}",
        ["59", "62"],
        schema="code string, nom string, codeDepartement string",
    )


_XFORM_ORACLE = """
SELECT r_regionkey, r_name, concat('R-', r_name) AS region_label,
       'region.csv' AS source_file, 'region_spec' AS dataset
FROM region
"""


@register(
    "udf_extra_transform",
    _XFORM_ORACLE,
    doc="Pluggable per-table DataFrame→DataFrame transform hook in the "
    "staging pipeline (a plan hook, not a row UDF). Ref: notebook cell 4 "
    "(TableSpec.extra_transform).",
)
def udf_extra_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _scratch("udf_extra_transform", sf_dir)
    t(spark, sf_dir, "region").coalesce(1).write.mode("overwrite").option(
        "header", True
    ).csv(path)
    csv_file = next(
        os.path.join(path, f) for f in sorted(os.listdir(path)) if f.endswith(".csv")
    )
    # Stable lineage name regardless of Spark's part-file naming.
    stable = os.path.join(path, "region.csv")
    if csv_file != stable:
        os.replace(csv_file, stable)
    spec = TableSpec(
        name="region_spec",
        source_path=stable,
        dtype_overrides={"r_regionkey": "int"},
        extra_transform=lambda df: df.withColumn(
            "region_label", F.concat(F.lit("R-"), F.col("r_name"))
        ),
    )
    return load_table(spark, spec)


@register(
    "proc_refresh_stats",
    "SELECT CAST(COUNT(*) AS BIGINT) AS num_rows FROM region",
    doc="ANALYZE TABLE COMPUTE STATISTICS post-load (sp_updatestats "
    "analog). Ref: run_etl.py:263; 007:165-175. Returns the row count "
    "recorded in the catalog (not a fresh scan).",
)
def proc_refresh_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    tbl = f"stats_region_{tag}"
    # External table at a scratch location: survives catalog resets
    # (a fresh session's in-memory catalog doesn't know about leftover
    # managed-table dirs and refuses the location otherwise).
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    path = _scratch("refresh_stats", sf_dir)
    t(spark, sf_dir, "region").write.mode("overwrite").option(
        "path", path
    ).saveAsTable(tbl)
    spark.sql(f"ANALYZE TABLE {tbl} COMPUTE STATISTICS")
    stats = (
        spark.sql(f"DESC EXTENDED {tbl}")
        .filter(F.col("col_name") == "Statistics")
        .select("data_type")
        .first()
    )
    import re

    m = re.search(r"(\d+) rows", stats.data_type if stats else "")
    num_rows = int(m.group(1)) if m else -1
    return spark.createDataFrame([(num_rows,)], schema="num_rows long")


_DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"

_JDBC_ORACLE = """
SELECT n_nationkey, n_name, n_regionkey FROM nation
"""


@register(
    "snk_jdbc_roundtrip",
    _JDBC_ORACLE,
    doc="JDBC sink + source round trip over embedded Derby (the driver "
    "jar Spark ships for its Hive metastore — no network, no install). "
    "Exercises the same write_jdbc/read_jdbc path the reference uses "
    "for Azure SQL (export_to_sql.py:160-203 chunked to_sql; "
    "load_facts.py:105 read_sql): pandas if_exists modes → save modes, "
    "chunked inserts → connector batchsize, distributed writers.",
)
def snk_jdbc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    if not jdbc_available(spark, _DERBY_DRIVER):
        raise RuntimeError(
            f"embedded Derby ({_DERBY_DRIVER}) missing from the Spark "
            "classpath"
        )
    scratch = _scratch("jdbc_derby", sf_dir)
    # Keep Derby's engine log out of the process CWD.
    spark._jvm.java.lang.System.setProperty(  # noqa: SLF001
        "derby.system.home", scratch
    )
    url = f"jdbc:derby:{os.path.join(scratch, 'db')};create=true"
    src = t(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    write_jdbc(
        src, url, "nation_t", _DERBY_DRIVER,
        if_exists="replace", driver=_DERBY_DRIVER,
    )
    back = read_jdbc(spark, url, "nation_t", _DERBY_DRIVER, driver=_DERBY_DRIVER)
    # Derby round-trips INTEGER/CLOB; project back to the source dtypes
    # so the schema check compares like for like.
    src_types = dict(src.dtypes)
    return back.select(
        *[F.col(c).cast(src_types[c]).alias(c) for c in src.columns]
    )


_ORC_ORACLE = """
SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier
"""


@register(
    "src_orc",
    _ORC_ORACLE,
    doc="ORC scan round trip — format breadth beyond the reference's "
    "CSV/JSON/parquet/xlsx (SURVEY §2.1); same columnar pushdown "
    "properties as parquet.",
)
def src_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _scratch("src_orc", sf_dir)
    t(spark, sf_dir, "supplier").write.mode("overwrite").orc(path)
    return spark.read.orc(path).select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    )
