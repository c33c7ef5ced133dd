"""Slowly-changing-dimension merges as pure DataFrame algorithms.

The reference implements SCD 1/2/3 as T-SQL stored procedures
(Terraform/sql/010_scd_dimensions.sql:30-91, 179-268, 312-373, and the
batch MERGE at 010:391-522) plus generic pandas helpers
(analytics/etl/load_dimensions.py:88-270). Here each type is a
declarative read-merge-emit over two DataFrames — the shape Catalyst
optimizes into one shuffle-join per merge, and that scales to
arbitrarily large dimensions (no driver-side state).

Conventions (mirroring 010:114-127):
    version               INT, 1-based
    est_actif             BOOLEAN, exactly one true row per business key
    date_debut_validite   TIMESTAMP
    date_fin_validite     TIMESTAMP, NULL while active

The reference's 5-minute-recency hack for pairing closed/new rows
(010:449-456) is replaced by an explicit changed-keys set — the
full-outer join below — which is both deterministic and shuffle-minimal
(one join, branches are projections of it).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

META_COLS = ["version", "est_actif", "date_debut_validite", "date_fin_validite"]


def _changed(attrs: list[str]) -> Column:
    """Null-safe any-attribute-differs predicate."""
    return reduce(
        lambda a, b: a | b,
        [~F.col(a).eqNullSafe(F.col(f"_s_{a}")) for a in attrs],
    )


def _prep(current: DataFrame, staged: DataFrame, key: str, attrs: list[str]):
    """Full-outer join active-current vs staged with staged attrs prefixed."""
    s = staged.select(
        F.col(key),
        *[F.col(a).alias(f"_s_{a}") for a in attrs],
        F.lit(True).alias("_s_present"),
    )
    c = current.withColumn("_c_present", F.lit(True))
    return c.join(s, key, "full_outer")


def scd1_apply(
    current: DataFrame, staged: DataFrame, key: str, attrs: list[str]
) -> DataFrame:
    """SCD Type 1: overwrite attributes in place; insert brand-new keys.

    Ref: 010_scd_dimensions.sql:30-91; load_dimensions.py:88-132.
    """
    j = _prep(current.select(key, *attrs), staged, key, attrs)
    return j.select(
        F.col(key),
        *[
            F.when(F.col("_s_present"), F.col(f"_s_{a}"))
            .otherwise(F.col(a))
            .alias(a)
            for a in attrs
        ],
    )


def scd2_apply(
    current: DataFrame,
    staged: DataFrame,
    key: str,
    attrs: list[str],
    effective_ts: Column,
) -> DataFrame:
    """SCD Type 2: close changed rows, insert v+1; insert brand-new keys v1.

    ``current`` must carry the META_COLS. Historical (inactive) rows pass
    through untouched; only active rows participate in the merge. One
    full-outer join; the four branches are cheap projections of it, so
    the whole merge costs a single shuffle on ``key``.

    Ref: 010_scd_dimensions.sql:391-522 (close changed :410-422, insert
    new versions :425-459, insert brand-new :461-487).
    """
    out_cols = [key, *attrs, *META_COLS]
    history = current.filter(~F.col("est_actif")).select(*out_cols)
    active = current.filter(F.col("est_actif"))

    # Four branches project the same full-outer join; an eager
    # localCheckpoint computes it once and lets the blocks be reclaimed
    # when the merge result is dropped. (A bare .cache() is pinned in
    # the CacheManager until an explicit unpersist, which nothing here
    # could issue — repeated streaming merges via scd2_foreach_batch
    # would accumulate cached blocks in executor storage forever.)
    j = _prep(active, staged, key, attrs).localCheckpoint(eager=True)
    changed = F.col("_c_present") & F.col("_s_present") & _changed(attrs)

    unchanged_rows = j.filter(
        F.col("_c_present") & (~F.coalesce(F.col("_s_present"), F.lit(False)) | ~_changed(attrs))
    ).select(*out_cols)

    closed_rows = j.filter(changed).select(
        F.col(key),
        *[F.col(a) for a in attrs],
        F.col("version"),
        F.lit(False).alias("est_actif"),
        F.col("date_debut_validite"),
        effective_ts.alias("date_fin_validite"),
    )

    new_version_rows = j.filter(changed).select(
        F.col(key),
        *[F.col(f"_s_{a}").alias(a) for a in attrs],
        (F.col("version") + F.lit(1)).alias("version"),
        F.lit(True).alias("est_actif"),
        effective_ts.alias("date_debut_validite"),
        F.lit(None).cast("timestamp").alias("date_fin_validite"),
    )

    brand_new_rows = j.filter(
        F.col("_s_present") & ~F.coalesce(F.col("_c_present"), F.lit(False))
    ).select(
        F.col(key),
        *[F.col(f"_s_{a}").alias(a) for a in attrs],
        F.lit(1).alias("version"),
        F.lit(True).alias("est_actif"),
        effective_ts.alias("date_debut_validite"),
        F.lit(None).cast("timestamp").alias("date_fin_validite"),
    )

    return (
        history.unionByName(unchanged_rows)
        .unionByName(closed_rows)
        .unionByName(new_version_rows)
        .unionByName(brand_new_rows)
    )


def scd2_rekey_apply(
    current: DataFrame,
    mapping: DataFrame,
    key: str,
    attrs: list[str],
    effective_ts: Column,
) -> DataFrame:
    """SCD Type 2 re-keyed-entity merge — the commune-fusion case.

    The reference's sp_scd_type2_geographie (010_scd_dimensions.sql:
    179-268, close :210-225 + re-keyed insert :228-252) takes an
    explicit old→new mapping: in ONE batch the active row of the old
    business key is closed and a successor row is inserted under the
    (possibly new) key at version+1 — semantics a snapshot diff cannot
    express, because a changed key looks like an unrelated
    delete+insert.

    ``mapping`` columns: ``old_key``; ``new_key`` (NULL → key
    unchanged, mirroring ISNULL(@nouveau_code, commune_code)); and
    optionally ``new_<attr>`` overrides (NULL → carry the old value).
    The mapping is dimension-change-sized (a handful of fusions per
    load), so the join broadcasts; branches are projections of it —
    no extra shuffle at any dimension size.
    """
    out_cols = [key, *attrs, *META_COLS]
    override_cols = {
        a: f"new_{a}" for a in attrs if f"new_{a}" in mapping.columns
    }
    m = mapping.select(
        F.col("old_key"),
        F.col("new_key"),
        *[F.col(c).alias(f"_n_{a}") for a, c in override_cols.items()],
    )
    j = current.join(
        F.broadcast(m), current[key] == m.old_key, "left"
    )
    hit = F.col("old_key").isNotNull() & F.col("est_actif")

    untouched = j.filter(~F.coalesce(hit, F.lit(False))).select(*out_cols)

    closed = j.filter(hit).select(
        F.col(key),
        *[F.col(a) for a in attrs],
        F.col("version"),
        F.lit(False).alias("est_actif"),
        F.col("date_debut_validite"),
        effective_ts.alias("date_fin_validite"),
    )

    successors = j.filter(hit).select(
        F.coalesce(F.col("new_key"), F.col(key)).alias(key),
        *[
            (
                F.coalesce(F.col(f"_n_{a}"), F.col(a))
                if a in override_cols
                else F.col(a)
            ).alias(a)
            for a in attrs
        ],
        (F.col("version") + F.lit(1)).alias("version"),
        F.lit(True).alias("est_actif"),
        effective_ts.alias("date_debut_validite"),
        F.lit(None).cast("timestamp").alias("date_fin_validite"),
    )

    return untouched.unionByName(closed).unionByName(successors)


def scd3_apply(
    current: DataFrame,
    staged: DataFrame,
    key: str,
    attr: str,
    effective_ts: Column,
    prev_col: str | None = None,
    change_ts_col: str = "date_changement",
) -> DataFrame:
    """SCD Type 3: shift the current value into an 'ancien_*' column.

    Ref: 010_scd_dimensions.sql:312-373; load_dimensions.py:224-270.
    """
    prev_col = prev_col or f"ancien_{attr}"
    attr_type = dict(current.dtypes)[attr]
    j = _prep(current, staged, key, [attr])
    changed = (
        F.col("_c_present") & F.col("_s_present") & ~F.col(attr).eqNullSafe(F.col(f"_s_{attr}"))
    )
    passthrough = [
        c
        for c in current.columns
        if c not in {key, attr, prev_col, change_ts_col}
    ]
    return j.select(
        F.col(key),
        F.when(changed, F.col(f"_s_{attr}"))
        .otherwise(F.coalesce(F.col(attr), F.col(f"_s_{attr}")))
        .alias(attr),
        F.when(changed, F.col(attr)).otherwise(
            F.col(prev_col)
            if prev_col in current.columns
            else F.lit(None).cast(attr_type)
        ).alias(prev_col),
        F.when(changed, effective_ts)
        .otherwise(
            F.col(change_ts_col)
            if change_ts_col in current.columns
            else F.lit(None).cast("timestamp")
        )
        .alias(change_ts_col),
        *[F.col(c) for c in passthrough],
    )
