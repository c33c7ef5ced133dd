"""Round-8 query batch: new operator families only (per the r7 review's
consolidation guidance) — progressive-JPEG decode evidence, spatial
grid-bucketed radius join, inferential statistics (two-proportion
z-test), a privacy audit (k-anonymity), and survival analysis
(Kaplan-Meier) — plus nothing that duplicates an already-proven shape.

Same contract as every other registry module: each query is a Spark
callable plus a DuckDB oracle, aliased identically on both sides, with
the repo determinism rules (integer arithmetic wherever possible,
fixed-point quantization before any float aggregation, closed-form
double expressions only over identical integer operands, tie-broken
ordering, no native round()).

Reference parity note: the reference (haelbrek/Evolution-DATA-WAREHOUSE)
has no spatial/survival/inference operators — these extend the engine's
surface the way its BI deployment would grow next; media decode remains
the multimodal suite's domain (analytics/etl treats media as opaque
blobs; see operators/jpeg.py module docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from evolution_data_warehouse_spark.queries.common import (
    fpq,
    fpq_sql,
    register,
    t,
)

# ---------------------------------------------------------------------------
# Progressive (SOF2) JPEG decode — driver-level evidence for the r8 codec
# ---------------------------------------------------------------------------

_MM_PROG_ORACLE = """
SELECT doc_id,
       'jpeg-progressive' AS format,
       CAST(4 + doc_id % 13 AS INT) AS width,
       CAST(3 + doc_id % 7 AS INT) AS height,
       CAST(doc_id % 3 AS INT) AS restart_interval,
       TRUE AS exact_match
FROM documents
"""


@register(
    "mm_decode_progressive",
    _MM_PROG_ORACLE,
    doc="REAL progressive (SOF2) JPEG decode, pure numpy "
    "(operators/jpeg.py): spectral-selection + successive-approximation "
    "scans — DC first/refine, AC bands with EOB runs and ZRL, the AC "
    "refinement correction-bit algorithm, and per-scan DRI/RSTn restart "
    "intervals (doc_id % 3: 0 disables them). Progressive re-orders the "
    "SAME coefficients a baseline stream carries, so the check is the "
    "strongest possible: the decoded progressive pixels must be "
    "BIT-IDENTICAL to decoding the baseline encode of the same image — "
    "any divergence anywhere in the multi-scan path breaks the hash. "
    "One narrow mapInPandas stage, Arrow-batched, no shuffle; "
    "embarrassingly parallel at any corpus size.",
)
def mm_decode_progressive(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    def synth_and_decode(batches):
        from evolution_data_warehouse_spark.operators.jpeg import (
            decode_jpeg,
            encode_jpeg,
            encode_jpeg_progressive,
        )

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 4 + d % 13, 3 + d % 7
                px = np.zeros((h, w, 3), dtype=np.uint8)
                px[:, :, 0] = np.arange(w, dtype=np.uint8)[None, :]
                px[:, :, 1] = np.arange(h, dtype=np.uint8)[:, None]
                px[:, :, 2] = d % 256
                ri = d % 3
                _, _, base = decode_jpeg(encode_jpeg(px))
                ww, hh, prog = decode_jpeg(
                    encode_jpeg_progressive(px, restart_interval=ri)
                )
                rows.append(
                    {
                        "doc_id": d,
                        "format": "jpeg-progressive",
                        "width": np.int32(ww),
                        "height": np.int32(hh),
                        "restart_interval": np.int32(ri),
                        "exact_match": bool(np.array_equal(base, prog)),
                    }
                )
            yield pd.DataFrame(rows)

    ids = t(spark, sf_dir, "documents").select("doc_id")
    return ids.mapInPandas(
        synth_and_decode,
        "doc_id long, format string, width int, height int, "
        "restart_interval int, exact_match boolean",
    )


# ---------------------------------------------------------------------------
# Spatial radius join via grid bucketing (never all-pairs)
# ---------------------------------------------------------------------------
#
# Points live on a planar integer grid in milli-degrees (closed-form
# from the keys, so both engines synthesize identical coordinates and
# the distance test is EXACT BIGINT arithmetic — no trig, no float
# boundary flips). The join strategy is the part that matters at scale:
# each point keys into one grid cell of side R; each hub probes its
# 3x3 cell neighbourhood. Candidate pairs are bounded by cell
# occupancy — the all-pairs cross join this shape invites is never
# formed. Swap haversine into the exact-distance predicate and the
# plan is the standard geo radius join.

_SPATIAL_R_MD = 2000  # radius = cell side, milli-degrees

_SPATIAL_ORACLE = f"""
WITH pts AS (
    SELECT c_custkey,
           (CAST(c_custkey AS BIGINT) * 7919) % 120000 AS lat_md,
           (CAST(c_custkey AS BIGINT) * 104729) % 340000 AS lon_md
    FROM customer
),
hubs AS (
    SELECT n_nationkey, n_name,
           (n_nationkey * 9973) % 120000 AS hlat_md,
           (n_nationkey * 31337) % 340000 AS hlon_md
    FROM nation
)
SELECT n_nationkey, n_name,
       CAST(COUNT(c_custkey) AS BIGINT) AS n_within,
       CAST(MIN(CASE WHEN c_custkey IS NOT NULL THEN
            (lat_md - hlat_md) * (lat_md - hlat_md)
            + (lon_md - hlon_md) * (lon_md - hlon_md) END) AS BIGINT)
           AS min_d2
FROM hubs LEFT JOIN pts
  ON (lat_md - hlat_md) * (lat_md - hlat_md)
     + (lon_md - hlon_md) * (lon_md - hlon_md)
     <= {_SPATIAL_R_MD} * {_SPATIAL_R_MD}
GROUP BY n_nationkey, n_name
"""


@register(
    "join_spatial_grid",
    _SPATIAL_ORACLE,
    doc="Radius join: customers within R of each hub, joined through "
    "grid cells of side R — each point lands in ONE cell, each hub "
    "probes its 3x3 neighbourhood (a superset of the R-ball), and the "
    "exact integer distance predicate prunes the candidates. The "
    "oracle states the same result as a plain cross join; the Spark "
    "plan never forms it — candidate pairs are bounded by cell "
    "occupancy, the scale difference between 'works' and 'melts' on a "
    "planetary point set. Hub cells broadcast; counts and min-d² are "
    "exact BIGINTs.",
)
def join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    R = _SPATIAL_R_MD
    # cast to long BEFORE multiplying: c_custkey * 104729 overflows int32
    # past ~20k customers (sf>=1); DuckDB's INTEGER multiply would error
    # there too, so the oracle carries the same cast.
    ck = F.col("c_custkey").cast("long")
    pts = t(spark, sf_dir, "customer").select(
        "c_custkey",
        ((ck * 7919) % 120000).alias("lat_md"),
        ((ck * 104729) % 340000).alias("lon_md"),
    ).withColumn("cx", F.expr(f"lat_md div {R}")).withColumn(
        "cy", F.expr(f"lon_md div {R}")
    )
    hubs = t(spark, sf_dir, "nation").select(
        "n_nationkey",
        "n_name",
        ((F.col("n_nationkey") * 9973) % 120000).alias("hlat_md"),
        ((F.col("n_nationkey") * 31337) % 340000).alias("hlon_md"),
    )
    probes = hubs.select(
        "*",
        F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])).alias("dx"),
    ).select(
        "*",
        F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])).alias("dy"),
    ).select(
        "n_nationkey", "n_name", "hlat_md", "hlon_md",
        (F.expr(f"hlat_md div {R}") + F.col("dx")).alias("cx"),
        (F.expr(f"hlon_md div {R}") + F.col("dy")).alias("cy"),
    )
    d2 = (
        (F.col("lat_md") - F.col("hlat_md"))
        * (F.col("lat_md") - F.col("hlat_md"))
        + (F.col("lon_md") - F.col("hlon_md"))
        * (F.col("lon_md") - F.col("hlon_md"))
    )
    hits = (
        pts.join(F.broadcast(probes), ["cx", "cy"])
        .filter(d2 <= F.lit(R * R))
        .groupBy("n_nationkey", "n_name")
        .agg(
            F.count("*").alias("n_within"),
            F.min(d2).cast("long").alias("min_d2"),
        )
    )
    # hubs with zero matches must still appear (LEFT JOIN semantics)
    return (
        hubs.select("n_nationkey", "n_name")
        .join(hits, ["n_nationkey", "n_name"], "left")
        .select(
            "n_nationkey",
            "n_name",
            F.coalesce(F.col("n_within"), F.lit(0)).cast("long").alias(
                "n_within"
            ),
            F.col("min_d2").cast("long").alias("min_d2"),
        )
    )


# ---------------------------------------------------------------------------
# Two-proportion z-test (A/B experiment readout)
# ---------------------------------------------------------------------------

_ABTEST_CONV_MIN = 95  # "converted" = made a purchase of at least this value
                       # (a bare any-purchase definition saturates: every
                       # synthetic user buys eventually, making p=1 and the
                       # pooled variance 0)

_ABTEST_ORACLE = f"""
WITH assign AS (
    SELECT user_id,
           user_id % 2 AS variant,
           MAX(CASE WHEN event_type = 'purchase'
                     AND value >= {_ABTEST_CONV_MIN} THEN 1 ELSE 0 END)
               AS converted
    FROM events GROUP BY user_id
),
arms AS (
    SELECT variant,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(converted) AS BIGINT) AS x
    FROM assign GROUP BY variant
),
wide AS (
    SELECT
        MAX(CASE WHEN variant = 0 THEN n END) AS n_a,
        MAX(CASE WHEN variant = 0 THEN x END) AS x_a,
        MAX(CASE WHEN variant = 1 THEN n END) AS n_b,
        MAX(CASE WHEN variant = 1 THEN x END) AS x_b
    FROM arms
)
SELECT n_a, x_a, n_b, x_b,
       {fpq_sql('CAST(x_a AS DOUBLE) / n_a - CAST(x_b AS DOUBLE) / n_b', 9)}
           AS lift,
       CASE WHEN x_a + x_b = 0 OR x_a + x_b = n_a + n_b THEN NULL
       ELSE {fpq_sql(
        '(CAST(x_a AS DOUBLE) / n_a - CAST(x_b AS DOUBLE) / n_b)'
        ' / sqrt((CAST(x_a + x_b AS DOUBLE) / (n_a + n_b))'
        '        * (1 - CAST(x_a + x_b AS DOUBLE) / (n_a + n_b))'
        '        * (1.0 / n_a + 1.0 / n_b))', 9)}
       END AS zscore
FROM wide
"""


@register(
    "stats_ab_test",
    _ABTEST_ORACLE,
    doc="Two-proportion z-test on a deterministic 50/50 user split "
    "(user_id parity = the variant assignment a real experiment would "
    "hash): per-arm users and converters are exact integer aggregates, "
    "the pooled-variance z statistic is ONE closed-form double "
    "expression over those four integers (IEEE ops on identical "
    "operands are engine-identical; sqrt is correctly rounded), "
    "fixed-point quantized for the hash. The inferential-statistics "
    "readout every experimentation warehouse serves; user-cardinality "
    "aggregate then a 4-integer reduction — nothing scales with event "
    "volume past the first map-side combine.",
)
def stats_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    assign = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") >= _ABTEST_CONV_MIN),
                    1,
                ).otherwise(0)
            ).alias("converted")
        )
        .select((F.col("user_id") % 2).alias("variant"), "converted")
    )
    arms = assign.groupBy("variant").agg(
        F.count("*").alias("n"), F.sum("converted").cast("long").alias("x")
    )
    wide = arms.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("variant") == 0, F.col("x"))).alias("x_a"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("variant") == 1, F.col("x"))).alias("x_b"),
    )
    pa = F.col("x_a").cast("double") / F.col("n_a")
    pb = F.col("x_b").cast("double") / F.col("n_b")
    pp = (F.col("x_a") + F.col("x_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    se = F.sqrt(
        pp * (1 - pp)
        * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
    )
    x_tot = F.col("x_a") + F.col("x_b")
    n_tot = F.col("n_a") + F.col("n_b")
    # guard the degenerate arms (p in {0,1} makes the pooled variance 0);
    # the ANSI session would otherwise raise DIVIDE_BY_ZERO
    zscore = F.when(
        (x_tot == 0) | (x_tot == n_tot), F.lit(None).cast("double")
    ).otherwise(fpq((pa - pb) / se, 9))
    return wide.select(
        "n_a", "x_a", "n_b", "x_b",
        fpq(pa - pb, 9).alias("lift"),
        zscore.alias("zscore"),
    )


# ---------------------------------------------------------------------------
# k-anonymity audit (privacy risk on quasi-identifiers)
# ---------------------------------------------------------------------------

_K_ANON_K = 5

_K_ANON_ORACLE = f"""
WITH q AS (
    SELECT c_nationkey, c_mktsegment,
           CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket
    FROM customer
),
g AS (
    SELECT c_nationkey, c_mktsegment, bal_bucket, COUNT(*) AS k
    FROM q GROUP BY c_nationkey, c_mktsegment, bal_bucket
)
SELECT c_nationkey, c_mktsegment, bal_bucket, CAST(k AS BIGINT) AS k
FROM g WHERE k < {_K_ANON_K}
"""


@register(
    "quality_k_anonymity",
    _K_ANON_ORACLE,
    doc="k-anonymity audit over the quasi-identifier tuple (nation, "
    "market segment, account-balance bucket): every equivalence class "
    "smaller than k=5 is a re-identification risk the privacy review "
    "must see before the table ships. One hash aggregate at "
    "quasi-identifier cardinality, map-side combinable; the filter "
    "keeps only the risky classes, so output is small even when the "
    "input is not. The audit the PII scan suite (pii_scan_report, "
    "text_redact) does not cover: PII you created by grouping, not "
    "PII in the values.",
)
def quality_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = t(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias("bal_bucket"),
    )
    g = q.groupBy("c_nationkey", "c_mktsegment", "bal_bucket").agg(
        F.count("*").alias("k")
    )
    return g.filter(F.col("k") < _K_ANON_K)


# ---------------------------------------------------------------------------
# Kaplan-Meier survival curve (user retention with censoring)
# ---------------------------------------------------------------------------

_KM_ORACLE = f"""
WITH spans AS (
    SELECT user_id,
           MIN(CAST(ts AS DATE)) AS first_day,
           MAX(CAST(ts AS DATE)) AS last_day
    FROM events GROUP BY user_id
),
horizon AS (SELECT MAX(last_day) AS obs_end FROM spans),
lives AS (
    SELECT user_id,
           CAST(last_day - first_day AS BIGINT) AS t,
           CASE WHEN last_day < obs_end - 7 THEN 1 ELSE 0 END AS died
    FROM spans CROSS JOIN horizon
),
by_t AS (
    SELECT t,
           CAST(SUM(died) AS BIGINT) AS d,
           CAST(COUNT(*) AS BIGINT) AS ending
    FROM lives GROUP BY t
),
risk AS (
    SELECT t, d,
           CAST(SUM(ending) OVER (
               ORDER BY t DESC ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW
           ) AS BIGINT) AS n_risk
    FROM by_t
),
terms AS (
    SELECT t, d, n_risk,
           CASE WHEN d > 0 AND d < n_risk THEN
               CAST(floor(ln(CAST(n_risk - d AS DOUBLE) / n_risk)
                          * 1e12 + 0.5) AS BIGINT)
           ELSE 0 END AS logterm_fp,
           CASE WHEN d >= n_risk THEN 1 ELSE 0 END AS extinct
    FROM risk
),
curve AS (
    SELECT t, d, n_risk,
           CAST(SUM(logterm_fp) OVER (
               ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cumlog_fp,
           CAST(SUM(extinct) OVER (
               ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_extinct
    FROM terms
)
SELECT t, d, n_risk,
       CASE WHEN n_extinct > 0 THEN CAST(0.0 AS DOUBLE)
       ELSE {fpq_sql('exp(CAST(cumlog_fp AS DOUBLE) / 1e12)', 9)}
       END AS survival
FROM curve WHERE d > 0
"""


@register(
    "surv_kaplan_meier",
    _KM_ORACLE,
    doc="Kaplan-Meier survival estimate of user lifetime (days between "
    "first and last event), right-censored at the observation horizon "
    "minus 7 days — the retention curve with the statistics done "
    "properly (censored users leave the risk set without counting as "
    "churn). The product-limit estimator is computed in log space with "
    "each ln(1 - d/n) term fixed-point quantized BEFORE the running "
    "sum (the agg_entropy rule), so the float product is order-"
    "independent; the risk set is a reverse cumulative count, one "
    "window over day-cardinality data. If the risk set ever dies out "
    "entirely the curve pins to exactly 0 from that point on.",
)
def surv_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    spans = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.min(F.to_date("ts")).alias("first_day"),
            F.max(F.to_date("ts")).alias("last_day"),
        )
    )
    horizon = spans.agg(F.max("last_day").alias("obs_end"))
    lives = spans.crossJoin(F.broadcast(horizon)).select(
        F.datediff("last_day", "first_day").cast("long").alias("t"),
        F.when(
            F.col("last_day") < F.date_sub(F.col("obs_end"), 7), 1
        ).otherwise(0).alias("died"),
    )
    by_t = lives.groupBy("t").agg(
        F.sum("died").cast("long").alias("d"),
        F.count("*").alias("ending"),
    )
    w_desc = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = by_t.select(
        "t", "d", F.sum("ending").over(w_desc).cast("long").alias("n_risk")
    )
    logterm = F.when(
        (F.col("d") > 0) & (F.col("d") < F.col("n_risk")),
        F.floor(
            F.log(
                (F.col("n_risk") - F.col("d")).cast("double")
                / F.col("n_risk")
            )
            * F.lit(1e12)
            + F.lit(0.5)
        ).cast("bigint"),
    ).otherwise(F.lit(0))
    extinct = F.when(F.col("d") >= F.col("n_risk"), 1).otherwise(0)
    terms = risk.select(
        "t", "d", "n_risk",
        logterm.alias("logterm_fp"), extinct.alias("extinct"),
    )
    w_asc = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    curve = terms.select(
        "t", "d", "n_risk",
        F.sum("logterm_fp").over(w_asc).cast("long").alias("cumlog_fp"),
        F.sum("extinct").over(w_asc).cast("long").alias("n_extinct"),
    )
    survival = F.when(
        F.col("n_extinct") > 0, F.lit(0.0).cast("double")
    ).otherwise(fpq(F.exp(F.col("cumlog_fp").cast("double") / F.lit(1e12)), 9))
    return curve.filter(F.col("d") > 0).select(
        "t", "d", "n_risk", survival.alias("survival")
    )
