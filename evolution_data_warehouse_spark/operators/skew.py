"""Skew and co-location tools for large-scale joins.

SURVEY §4 / the 100 TB design notes: AQE's skew-join handling
(spark.sql.adaptive.skewJoin, on in session.py) covers sort-merge
joins; explicit salting covers the cases AQE can't see (aggregations
on a hot key, broadcast-ineligible dimension joins), and bucketing
removes the shuffle entirely for repeated equi-joins on the same key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the hot-key fan-out trick: the (large, skewed)
    left side gets a random salt in [0, n_salts); the (smaller) right
    side is replicated once per salt value, so one hot key spreads over
    n_salts reducers instead of one.

    Only join types where the replicated right side can't surface
    unmatched rows are allowed: a right/full outer join would emit each
    unmatched right row once per salt after ``_salt`` is dropped."""
    allowed = {
        "inner", "cross",
        "left", "left_outer", "leftouter",
        "left_semi", "leftsemi", "semi",
        "left_anti", "leftanti", "anti",
    }
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join does not support how={how!r}: replicating the "
            "right side duplicates its unmatched rows under right/full "
            "outer semantics"
        )
    salted_left = left.withColumn(
        "_salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    salts = F.explode(
        F.array(*[F.lit(i) for i in range(n_salts)])
    ).alias("_salt")
    salted_right = right.select("*", salts)
    out = salted_left.join(salted_right, [key, "_salt"], how)
    return out.drop("_salt")


def salted_count(df: DataFrame, key: str, n_salts: int = 8) -> DataFrame:
    """Two-phase aggregation for hot grouping keys: count per
    (key, salt) map-side, then re-aggregate per key — the partial sums
    bound any single reducer's load.

    Measured honesty (bench extras `skew_*`, r6): for DECOMPOSABLE
    aggregates like count/sum, Spark's map-side partial aggregation
    already collapses a hot key to one row per input partition, so the
    plain groupBy is skew-immune and the extra shuffle here makes the
    salted form ~2× slower — use plain groupBy for those. The salted
    two-phase shape earns its keep where partial state does NOT
    compress (collect_list-style accumulation, custom UDAFs) or where
    the per-key work itself is the bottleneck; the measured win in this
    module is ``salted_join`` (1.5× on a 50%-hot-key fixture, even with
    AQE skew-join enabled — AQE splits map output partitions, salting
    spreads the key itself)."""
    salted = df.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    partial = salted.groupBy(key, "_salt").agg(F.count("*").alias("_n"))
    return partial.groupBy(key).agg(F.sum("_n").cast("long").alias("n"))


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int, path: str
) -> None:
    """Persist bucketed by the join key: later equi-joins between tables
    bucketed the same way skip the shuffle entirely (SortMergeJoin with
    no Exchange)."""
    (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def plan_has_exchange(df: DataFrame) -> bool:
    """True when the physical plan contains a shuffle Exchange —
    the thing bucketing is supposed to remove."""
    plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    return "Exchange hashpartitioning" in plan
