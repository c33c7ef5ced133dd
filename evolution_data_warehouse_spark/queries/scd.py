"""SCD merges, RLS, and the as-of join as oracle-checked queries.

Each query synthesizes a deterministic staged/current pair from the
customer table (fixed literal effective timestamps), runs the engine
operator, and is hash-checked against a DuckDB SQL restatement of the
same merge semantics — making the SCD write-path algorithms themselves
part of the correctness gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from evolution_data_warehouse_spark.operators.asof import asof_join
from evolution_data_warehouse_spark.operators.rls import secured
from evolution_data_warehouse_spark.operators.scd import (
    scd1_apply,
    scd2_apply,
    scd3_apply,
)
from evolution_data_warehouse_spark.queries.common import register, t

_T0 = "2020-01-01 00:00:00"
_T1 = "2024-01-01 00:00:00"


def _current_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Current dimension snapshot: every customer at version 1, active."""
    return t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("customer_key"),
        F.col("c_mktsegment").alias("segment"),
        F.lit(1).alias("version"),
        F.lit(True).alias("est_actif"),
        F.lit(_T0).cast("timestamp").alias("date_debut_validite"),
        F.lit(None).cast("timestamp").alias("date_fin_validite"),
    )


def _staged_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged snapshot: delinquent accounts reclassified + new keys."""
    c = t(spark, sf_dir, "customer")
    updates = c.select(
        F.col("c_custkey").alias("customer_key"),
        F.when(F.col("c_acctbal") < 0, F.lit("DELINQUENT"))
        .otherwise(F.col("c_mktsegment"))
        .alias("segment"),
    )
    new_keys = c.filter(F.col("c_custkey") % 50 == 0).select(
        (F.col("c_custkey") + 1000000).alias("customer_key"),
        F.lit("NEWSEG").alias("segment"),
    )
    return updates.unionByName(new_keys)


_STAGED_SQL = """
SELECT c_custkey AS customer_key,
       CASE WHEN c_acctbal < 0 THEN 'DELINQUENT' ELSE c_mktsegment END AS segment
FROM customer
UNION ALL
SELECT c_custkey + 1000000, 'NEWSEG' FROM customer WHERE c_custkey % 50 = 0
"""

_SCD1_ORACLE = f"""
WITH staged AS ({_STAGED_SQL})
SELECT customer_key, segment FROM staged
"""
# (Every current key appears in staged, so SCD1's output == staged here;
# the Spark side still runs the full overwrite-merge.)


@register(
    "proc_scd1",
    _SCD1_ORACLE,
    doc="SCD Type 1 overwrite-in-place. Ref: 010_scd_dimensions.sql:30-91; "
    "load_dimensions.py:88-132.",
)
def proc_scd1(spark: SparkSession, sf_dir: str) -> DataFrame:
    current = _current_dim(spark, sf_dir).select("customer_key", "segment")
    staged = _staged_dim(spark, sf_dir)
    return scd1_apply(current, staged, "customer_key", ["segment"])


_SCD2_ORACLE = f"""
WITH staged AS ({_STAGED_SQL})
-- unchanged active rows
SELECT c_custkey AS customer_key, c_mktsegment AS segment,
       CAST(1 AS INT) AS version, TRUE AS est_actif,
       TIMESTAMP '{_T0}' AS date_debut_validite,
       CAST(NULL AS TIMESTAMP) AS date_fin_validite
FROM customer WHERE c_acctbal >= 0
UNION ALL
-- closed previous versions of changed keys
SELECT c_custkey, c_mktsegment, CAST(1 AS INT), FALSE,
       TIMESTAMP '{_T0}', TIMESTAMP '{_T1}'
FROM customer WHERE c_acctbal < 0
UNION ALL
-- new active versions of changed keys
SELECT c_custkey, 'DELINQUENT', CAST(2 AS INT), TRUE,
       TIMESTAMP '{_T1}', CAST(NULL AS TIMESTAMP)
FROM customer WHERE c_acctbal < 0
UNION ALL
-- brand-new business keys
SELECT customer_key, segment, CAST(1 AS INT), TRUE,
       TIMESTAMP '{_T1}', CAST(NULL AS TIMESTAMP)
FROM staged WHERE customer_key >= 1000000
"""


@register(
    "proc_scd2",
    _SCD2_ORACLE,
    doc="SCD Type 2 batch merge: close changed rows, insert v+1, insert "
    "brand-new keys. Ref: 010_scd_dimensions.sql:391-522. One full-outer "
    "join; replaces the reference's 5-minute recency pairing hack "
    "(010:449-456) with an explicit changed-keys set.",
)
def proc_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    current = _current_dim(spark, sf_dir)
    staged = _staged_dim(spark, sf_dir)
    return scd2_apply(
        current,
        staged,
        "customer_key",
        ["segment"],
        F.lit(_T1).cast("timestamp"),
    )


_SCD3_ORACLE = f"""
WITH staged AS ({_STAGED_SQL})
SELECT c_custkey AS customer_key,
       CASE WHEN c_acctbal < 0 THEN 'DELINQUENT' ELSE c_mktsegment END AS segment,
       CASE WHEN c_acctbal < 0 THEN c_mktsegment END AS ancien_segment,
       CASE WHEN c_acctbal < 0 THEN TIMESTAMP '{_T1}' END AS date_changement
FROM customer
UNION ALL
SELECT customer_key, segment, CAST(NULL AS VARCHAR), CAST(NULL AS TIMESTAMP)
FROM staged WHERE customer_key >= 1000000
"""


@register(
    "proc_scd3",
    _SCD3_ORACLE,
    doc="SCD Type 3: shift current value into ancien_*, stamp "
    "date_changement. Ref: 010_scd_dimensions.sql:312-373; "
    "load_dimensions.py:224-270.",
)
def proc_scd3(spark: SparkSession, sf_dir: str) -> DataFrame:
    current = _current_dim(spark, sf_dir).select("customer_key", "segment")
    staged = _staged_dim(spark, sf_dir)
    return scd3_apply(
        current,
        staged,
        "customer_key",
        "segment",
        F.lit(_T1).cast("timestamp"),
    )


@register(
    "udtf_rls_predicate",
    "SELECT c_custkey, c_name, c_nationkey FROM customer "
    "WHERE c_nationkey IN (1, 2)",
    doc="Row-level security predicate as a view factory — the scoped-user "
    "branch. Ref: 011_security_rls.sql:165-214. The unregistered-user and "
    "NULL-grant branches are covered behaviorally in tests/test_rls.py.",
)
def udtf_rls_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    zones = spark.createDataFrame(
        [("analyst_a", 1), ("analyst_a", 2), ("manager", None)],
        schema="login string, scope int",
    )
    dim = t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    return secured(dim, zones, "analyst_a", "c_nationkey")


_ASOF_ORACLE = """
SELECT purchase_id, user_id, purchase_ts, last_view_id, last_view_ts FROM (
    SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
           v.event_id AS last_view_id, v.ts AS last_view_ts,
           row_number() OVER (
               PARTITION BY p.event_id
               ORDER BY v.ts DESC NULLS LAST, v.event_id DESC NULLS LAST
           ) AS rn
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND v.ts <= p.ts
) WHERE rn = 1
"""


@register(
    "join_asof",
    _ASOF_ORACLE,
    doc="Backward as-of join (latest prior view per purchase) — engine "
    "extension motivated by the SCD2 validity window (SURVEY §2.3). "
    "Equi-join on key + window; asof_join_pandas is the high-fanout path.",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("last_view_id"),
        F.col("ts").alias("last_view_ts"),
    )
    return asof_join(
        purchases,
        views,
        on="user_id",
        left_ts="purchase_ts",
        right_ts="last_view_ts",
        left_key="purchase_id",
        right_cols=["last_view_id", "last_view_ts"],
        tie_breaker="last_view_id",
    )
