"""Skew-salting correctness + bucketed-join shuffle elimination."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from evolution_data_warehouse_spark.operators.skew import (
    plan_has_exchange,
    salted_count,
    salted_join,
    write_bucketed,
)
from evolution_data_warehouse_spark.queries.common import t


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = li.join(orders, "l_orderkey").count()
    salted = salted_join(li, orders, "l_orderkey", n_salts=4).count()
    assert salted == plain


def test_salted_count_matches_plain(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    plain = {r.event_type: r.n for r in ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n")).collect()}
    salted = {r.event_type: r.n for r in salted_count(ev, "event_type").collect()}
    assert salted == plain


def test_bucketed_join_skips_shuffle(spark, sf_dir, tmp_path):
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    write_bucketed(li, "b_lineitem", "l_orderkey", 8, str(tmp_path / "bl"))
    write_bucketed(orders, "b_orders", "l_orderkey", 8, str(tmp_path / "bo"))

    joined = spark.table("b_lineitem").join(spark.table("b_orders"), "l_orderkey")
    # Both sides bucketed on the key → no Exchange in the plan.
    assert not plan_has_exchange(joined)
    assert joined.count() == li.join(orders, "l_orderkey").count()

    # Control: the un-bucketed join DOES shuffle when broadcast is off.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert plan_has_exchange(li.join(orders, "l_orderkey"))
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_salted_join_rejects_right_outer(spark, sf_dir):
    # Replicating the right side once per salt would emit each unmatched
    # right row n_salts times under right/full outer semantics.
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    for how in ("right", "right_outer", "full", "full_outer", "outer"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(nation, region, "n_regionkey", how=how)
