"""Behavioral RLS tests mirroring analytics/tests/test_rls.py:123-237:
dept-scoped user sees only their department, region user sees all,
unregistered user sees all (011_security_rls.sql:171-189), and
cross-department isolation is empty."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from evolution_data_warehouse_spark.operators.rls import secured
from evolution_data_warehouse_spark.queries.common import t


@pytest.fixture(scope="module")
def dim(spark):
    return spark.createDataFrame(
        [("c1", "59"), ("c2", "59"), ("c3", "62"), ("c4", "80")],
        schema="commune string, departement_code string",
    )


@pytest.fixture(scope="module")
def zones(spark):
    return spark.createDataFrame(
        [("agent59", "59"), ("multi", "59"), ("multi", "62"), ("region", None)],
        schema="login string, scope string",
    )


def _depts(df):
    return {r.departement_code for r in df.select("departement_code").collect()}


def test_scoped_user_sees_own_department(spark, dim, zones):
    out = secured(dim, zones, "agent59", "departement_code")
    assert _depts(out) == {"59"}
    assert out.count() == 2


def test_multi_zone_user(spark, dim, zones):
    assert _depts(secured(dim, zones, "multi", "departement_code")) == {"59", "62"}


def test_region_user_sees_all(spark, dim, zones):
    assert secured(dim, zones, "region", "departement_code").count() == 4


def test_unregistered_user_sees_all(spark, dim, zones):
    # 011:171-175: a login with no zone rows is unrestricted.
    assert secured(dim, zones, "ghost", "departement_code").count() == 4


def test_cross_department_isolation(spark, dim, zones):
    # test_rls.py:200-237: agent59 ∩ dept 62 = ∅.
    out = secured(dim, zones, "agent59", "departement_code").filter(
        F.col("departement_code") == "62"
    )
    assert out.count() == 0


def test_rls_on_streaming_read(spark, sf_dir, tmp_path):
    # The view-factory RLS is pure plan rewriting (broadcast flag +
    # zone joins), so the same `secured` call composes with a streaming
    # scan as stream-static joins — per-batch row security on streams.
    src = str(tmp_path / "stream_src")
    t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    ).write.mode("overwrite").parquet(src)

    zones = spark.createDataFrame(
        [("analyst_a", 1), ("analyst_a", 2), ("manager", None)],
        schema="login string, scope int",
    )
    stream = spark.readStream.schema(
        "c_custkey long, c_name string, c_nationkey long"
    ).parquet(src)
    out = secured(stream, zones, "analyst_a", "c_nationkey")
    assert out.isStreaming

    q = (
        out.writeStream.format("memory")
        .queryName("rls_stream_probe")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT * FROM rls_stream_probe")
    expected = t(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(1, 2)
    )
    assert got.count() == expected.count() > 0
    assert {r.c_nationkey for r in got.select("c_nationkey").distinct().collect()} == {1, 2}


def test_rbac_grant_matrix(spark):
    from evolution_data_warehouse_spark.operators.rbac import (
        GRANTS,
        AccessDenied,
        authorize,
        can,
    )

    # the four roles of 006_configure_security.sql, line-for-line
    assert set(GRANTS) == {
        "role_admin", "role_etl_process", "role_analyst", "role_consultant",
    }
    assert can("role_admin", "write", "dm")
    assert can("role_etl_process", "write", "stg")
    assert not can("role_etl_process", "write", "dm")       # 006:64 read-only
    assert can("role_analyst", "read", "dwh")
    assert not can("role_analyst", "read", "stg")            # 006:75 no staging
    assert can("role_consultant", "read", "analytics")
    assert not can("role_consultant", "read", "dwh")         # 006:92-93 marts only
    assert not can("ghost_role", "read", "dm")               # unknown → nothing
    with pytest.raises(AccessDenied):
        authorize("role_consultant", "write", "dm")
    with pytest.raises(ValueError):
        can("role_admin", "drop", "dm")


def test_rbac_read_composes_rls_for_consultants(spark, dim, zones):
    from evolution_data_warehouse_spark.operators.rbac import (
        AccessDenied,
        read_secured,
    )

    # consultant: grant passes for dm, RLS composes → only dept 59
    out = read_secured(dim, zones, "role_consultant", "agent59", "dm",
                       "departement_code")
    assert _depts(out) == {"59"}

    # analyst: same table, no RLS scoping → all rows
    assert read_secured(
        dim, zones, "role_analyst", "agent59", "dm", "departement_code"
    ).count() == 4

    # consultant may not touch the warehouse schema at all
    with pytest.raises(AccessDenied):
        read_secured(dim, zones, "role_consultant", "agent59", "dwh",
                     "departement_code")
