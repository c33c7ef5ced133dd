"""As-of (point-in-time) join — engine extension.

The reference's SCD2 validity window (date_debut/date_fin_validite,
010_scd_dimensions.sql:114-127) is the natural home of an as-of join
(SURVEY.md §2.3). Spark has no native as-of join; two strategies:

* ``asof_join`` — equi-join on the key + inequality filter + per-left-row
  row_number. One shuffle; fine when the per-key right-side fan-out is
  bounded (dimension versions: a handful per key). Fully expressible to
  the DuckDB oracle.
* ``asof_join_pandas`` — groups co-partitioned by key, pd.merge_asof
  inside ``applyInPandas``. The scale path when the right side has many
  rows per key (sorted-merge is O(n+m) per key instead of O(n·m)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    left_key: str,
    right_cols: list[str] | None = None,
    tie_breaker: str | None = None,
) -> DataFrame:
    """For each left row (uniquely identified by ``left_key``), attach the
    latest right row with right_ts <= left_ts (backward as-of),
    left-outer semantics."""
    right_cols = right_cols or [c for c in right.columns if c != on]
    r = right.select(F.col(on).alias("_r_key"), *right_cols)
    j = left.join(
        r,
        (F.col(on) == F.col("_r_key")) & (F.col(right_ts) <= F.col(left_ts)),
        "left",
    )
    order = [F.desc_nulls_last(right_ts)]
    if tie_breaker:
        order.append(F.desc_nulls_last(tie_breaker))
    w = W.partitionBy(left_key).orderBy(*order)
    return (
        j.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_r_key")
    )


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    out_schema: str,
) -> DataFrame:
    """merge_asof per co-partitioned key group (the 100 TB path: one
    shuffle each side, linear merge per group, no pairwise blow-up)."""
    import pandas as pd

    lcols = left.columns

    def merge(key, pdf_l: pd.DataFrame, pdf_r: pd.DataFrame) -> pd.DataFrame:
        pdf_l = pdf_l.sort_values(left_ts)
        pdf_r = pdf_r.sort_values(right_ts)
        if pdf_l.empty:
            return pd.DataFrame(
                columns=lcols + [c for c in pdf_r.columns if c != on]
            )
        return pd.merge_asof(
            pdf_l, pdf_r.drop(columns=[on]), left_on=left_ts, right_on=right_ts
        )

    return left.groupBy(on).cogroup(right.groupBy(on)).applyInPandas(merge, out_schema)
