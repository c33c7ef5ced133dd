"""External connector gates + backup/retention tests."""

from __future__ import annotations

import pytest

from evolution_data_warehouse_spark.operators.backup import (
    list_snapshots,
    restore_snapshot,
    retention_cleanup,
    snapshot_table,
)
from evolution_data_warehouse_spark.sources.external import (
    jdbc_available,
    list_blobs,
    read_jdbc,
    rest_to_dataframe,
    write_excel,
    write_jdbc,
)
from evolution_data_warehouse_spark.queries.common import t


def test_rest_fetch_stub(spark):
    import json

    def fetcher(url):
        dept = url[-2:]
        return json.dumps({"communes": [{"code": dept + "001", "nom": "X",
                                         "codeDepartement": dept}]})

    df = rest_to_dataframe(
        spark, fetcher, "https://api/communes?dept={}", ["59", "62"],
        schema="code string, nom string, codeDepartement string",
    )
    assert df.count() == 2
    assert {r.code for r in df.collect()} == {"59001", "62001"}


def test_jdbc_gate(spark):
    assert not jdbc_available(spark, "org.example.NoSuchDriver")
    with pytest.raises(RuntimeError, match="not on the classpath"):
        read_jdbc(spark, "jdbc:fake://x", "t", "org.example.NoSuchDriver")
    df = spark.range(3)
    with pytest.raises(RuntimeError, match="not on the classpath"):
        write_jdbc(df, "jdbc:fake://x", "t", "org.example.NoSuchDriver")


def test_excel_gate(spark):
    # openpyxl is not in this image: the sink must fail loudly, not mid-write.
    with pytest.raises((NotImplementedError, Exception)):
        write_excel(spark.range(2), "/tmp/x.xlsx")


def test_list_blobs(spark, sf_dir):
    names = list_blobs(spark, sf_dir, suffix=".parquet")
    assert "lineitem.parquet" in names and names == sorted(names)


def test_backup_snapshot_retention(spark, sf_dir, tmp_path):
    root = str(tmp_path / "backups")
    df = t(spark, sf_dir, "region")
    for stamp in ["20260101", "20260102", "20260103"]:
        snapshot_table(df, root, "region", stamp)
    assert list_snapshots(root, "region") == ["20260101", "20260102", "20260103"]

    deleted = retention_cleanup(root, "region", keep_last=2)
    assert deleted == ["20260101"]
    assert list_snapshots(root, "region") == ["20260102", "20260103"]

    restored = restore_snapshot(spark, root, "region")  # latest
    assert restored.count() == df.count()
    with pytest.raises(FileNotFoundError):
        restore_snapshot(spark, root, "nope")


def test_jdbc_roundtrip_embedded_derby(spark, sf_dir, tmp_path):
    # Spark ships Derby for its Hive metastore, so the JDBC write/read
    # path can execute for real — no network, no extra install.
    drv = "org.apache.derby.jdbc.EmbeddedDriver"
    if not jdbc_available(spark, drv):
        pytest.skip("embedded Derby not on the Spark classpath")
    spark._jvm.java.lang.System.setProperty(  # noqa: SLF001
        "derby.system.home", str(tmp_path)
    )
    url = f"jdbc:derby:{tmp_path}/db;create=true"
    src = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    write_jdbc(src, url, "nation_t", drv, if_exists="replace", driver=drv)
    # if_exists="replace" must be idempotent (DROP + CREATE), like
    # pandas to_sql(if_exists="replace")
    write_jdbc(src, url, "nation_t", drv, if_exists="replace", driver=drv)
    back = read_jdbc(spark, url, "nation_t", drv, driver=drv)
    assert sorted((r.n_nationkey, r.n_name) for r in back.collect()) == sorted(
        (r.n_nationkey, r.n_name) for r in src.collect()
    )
    # append doubles the rows
    write_jdbc(src, url, "nation_t", drv, if_exists="append", driver=drv)
    assert read_jdbc(spark, url, "nation_t", drv, driver=drv).count() == 2 * src.count()
