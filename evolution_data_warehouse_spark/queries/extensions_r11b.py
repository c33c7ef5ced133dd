"""Round-11 query batch (second module): string-similarity and bitwise
scalar functions, rank/moment statistics, referential-integrity audit,
k-fold CV splits, RSI time-series indicator, neighbor-set Jaccard link
prediction, OHLC bars, and a WebDataset-style tar shard training sink.

Same contract as every other registry module: each query is a Spark
callable plus a DuckDB oracle, aliased identically on both sides, with
the repo determinism rules (integer arithmetic wherever possible,
fixed-point quantization before any float comparison, tie-broken
ordering, no native round()).

Reference parity note: the reference (haelbrek/Evolution-DATA-WAREHOUSE)
has no string-distance, graph, or training-sink surface — this batch
extends the engine's analytics and LLM-pipeline coverage beyond
reference parity (the declared SURVEY §7 growth direction).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from evolution_data_warehouse_spark.operators.dedup import (
    content_hash64,
    content_hash64_sql,
)
from evolution_data_warehouse_spark.queries.common import (
    davg_sql,
    dsum,
    dsum_sql,
    fpq,
    fpq_sql,
    register,
    t,
)

# ---------------------------------------------------------------------------
# fn_levenshtein — edit-distance matching against a pinned canon list
# ---------------------------------------------------------------------------

# Pinned catalog-canon names the fuzzy matcher resolves against. The
# list is a LITERAL (never derived from data) so the match target set —
# and the CASE tie-break order below — is identical on both engines and
# at every scale.
_LEV_CANON = (
    "small widget",
    "large bolt",
    "green gear",
    "shiny gadget",
    "cold pump",
    "round flange",
)


def _lev_oracle() -> str:
    d_exprs = ",\n           ".join(
        f"levenshtein(lower(p_name), '{c}') AS d{i}"
        for i, c in enumerate(_LEV_CANON)
    )
    least = "least(" + ", ".join(f"d{i}" for i in range(len(_LEV_CANON))) + ")"
    case = " ".join(
        f"WHEN d{i} = best_d THEN '{c}'"
        for i, c in enumerate(_LEV_CANON)
    )
    return f"""
WITH dists AS (
    SELECT p_partkey,
           {d_exprs}
    FROM part
),
best AS (
    SELECT p_partkey, {least} AS best_d FROM dists
),
pick AS (
    SELECT d.p_partkey, b.best_d,
           CASE {case} END AS canon
    FROM dists d JOIN best b ON b.p_partkey = d.p_partkey
)
SELECT canon, best_d, CAST(COUNT(*) AS BIGINT) AS n_parts
FROM pick GROUP BY canon, best_d
"""


@register(
    "fn_levenshtein",
    _lev_oracle(),
    doc="Edit-distance fuzzy matching of part names against a pinned "
    "6-entry catalog-canon list (the record-linkage primitive next to "
    "dedup_fuzzy_names): per part, levenshtein() to each canon, best "
    "match = min distance with ties broken by the canon list's pinned "
    "order (a CASE chain — never a data-dependent argmin), then a "
    "(canon, distance) histogram. The canon side is a literal inside "
    "the expression — NO join, NO broadcast: the whole match is one "
    "shuffle-free scan plus a tiny hash aggregate, linear at 100 TB. "
    "levenshtein() is exact integer DP on both engines.",
)
def fn_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part").select("p_partkey", "p_name")
    name = F.lower(F.col("p_name"))
    dists = [
        F.levenshtein(name, F.lit(c)).alias(f"d{i}")
        for i, c in enumerate(_LEV_CANON)
    ]
    df = p.select("p_partkey", *dists)
    best = F.least(*[F.col(f"d{i}") for i in range(len(_LEV_CANON))])
    df = df.withColumn("best_d", best)
    # CASE chain in pinned canon order — first match wins, mirroring
    # the oracle's WHEN order exactly.
    canon: Column | None = None
    for i, c in enumerate(_LEV_CANON):
        cond = F.col(f"d{i}") == F.col("best_d")
        canon = (
            F.when(cond, F.lit(c))
            if canon is None
            else canon.when(cond, F.lit(c))
        )
    return (
        df.select(canon.alias("canon"), "best_d")
        .groupBy("canon", "best_d")
        .agg(F.count("*").cast("bigint").alias("n_parts"))
    )


# ---------------------------------------------------------------------------
# fn_bitwise_ops — bitwise scalar + aggregate suite
# ---------------------------------------------------------------------------

# 28-bit mask keeps every shifted value far below int64 overflow, which
# DuckDB raises on (Spark would silently wrap — masking first makes the
# question moot on both engines).
_BIT_MASK = (1 << 28) - 1

_BITWISE_ORACLE = f"""
WITH b AS (
    SELECT o_orderpriority,
           ((o_orderkey & {_BIT_MASK}) << 3) AS shifted,
           (o_orderkey >> 2) AS rshift,
           xor(o_orderkey, 1442695040888963407) AS mixed,
           CAST(bit_count(o_orderkey) AS BIGINT) AS pops,
           (o_orderkey & 255) AS low8
    FROM orders
)
SELECT o_orderpriority,
       CAST(bit_xor(shifted) AS BIGINT) AS xor_fold,
       CAST(bit_or(low8) AS BIGINT) AS or_low8,
       CAST(bit_and(mixed | 4095) AS BIGINT) AS and_mixed,
       CAST(SUM(pops) AS BIGINT) AS sum_popcount,
       CAST(SUM(rshift) AS BIGINT) AS sum_rshift
FROM b GROUP BY o_orderpriority
"""


@register(
    "fn_bitwise_ops",
    _BITWISE_ORACLE,
    doc="Bitwise scalar + aggregate suite (&, |, xor, shifts, "
    "bit_count scalars; bit_xor/bit_or/bit_and aggregates) — the "
    "bitmap/flag-word toolbox behind agg_bitmap_presence and every "
    "hash-mixing operator in the repo, exercised end-to-end as its "
    "own entry. All values are masked to 28 bits BEFORE shifting so "
    "no engine can overflow int64 (DuckDB raises, Spark wraps — the "
    "mask makes both moot). Pure integer arithmetic, one map-side "
    "combinable hash aggregate: bit-identical and linear at any "
    "scale.",
)
def fn_bitwise_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    k = F.col("o_orderkey")
    b = o.select(
        "o_orderpriority",
        F.shiftleft(k.bitwiseAND(F.lit(_BIT_MASK)), 3).alias("shifted"),
        F.shiftright(k, 2).alias("rshift"),
        k.bitwiseXOR(F.lit(1442695040888963407)).alias("mixed"),
        F.bit_count(k).cast("bigint").alias("pops"),
        k.bitwiseAND(F.lit(255)).alias("low8"),
    )
    return b.groupBy("o_orderpriority").agg(
        F.expr("bit_xor(shifted)").cast("bigint").alias("xor_fold"),
        F.expr("bit_or(low8)").cast("bigint").alias("or_low8"),
        F.expr("bit_and(mixed | 4095)").cast("bigint").alias("and_mixed"),
        F.sum("pops").cast("bigint").alias("sum_popcount"),
        F.sum("rshift").cast("bigint").alias("sum_rshift"),
    )


# ---------------------------------------------------------------------------
# stats_spearman_corr — rank correlation per group
# ---------------------------------------------------------------------------

_SPEARMAN_ORACLE = f"""
WITH r AS (
    SELECT o_orderpriority,
           CAST(row_number() OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_totalprice, o_orderkey
           ) AS BIGINT) AS rx,
           CAST(row_number() OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_orderdate, o_orderkey
           ) AS BIGINT) AS ry
    FROM orders
),
s AS (
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM((rx - ry) * (rx - ry)) AS DOUBLE) AS sd2
    FROM r GROUP BY o_orderpriority
)
SELECT o_orderpriority, n,
       {fpq_sql(
           "1.0 - (6.0 * sd2) / (CAST(n AS DOUBLE)"
           " * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - 1.0))", 9
       )} AS rho
FROM s
"""


@register(
    "stats_spearman_corr",
    _SPEARMAN_ORACLE,
    doc="Spearman rank correlation between order value and order "
    "recency per priority class (do later orders run larger?) — the "
    "monotonic-association twin of the Pearson correlation in "
    "agg_stats_suite. Ranks are row_number() tie-broken by the UNIQUE "
    "o_orderkey (a non-unique tie-break would make rank assignment "
    "engine-dependent — measured: lineitem's duplicate keys shifted "
    "rho by ~4e-8), so each rank column is a deterministic "
    "permutation 1..n and the classic rho = 1 - 6*sum(d^2)/(n(n^2-1)) "
    "closed form applies exactly; sum(d^2) is summed wide (decimal on "
    "Spark, HUGEINT on DuckDB) before one double division quantized "
    "at 1e-9. Scale note: exact Spearman fundamentally needs a "
    "per-group global rank (two sorts sharing one exchange here); at "
    "100 TB the same statistic is approximated by binned ranks "
    "(agg_equidepth_histogram's machinery) — this entry is the exact "
    "form.",
)
def stats_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice", "o_orderdate", "o_orderkey"
    )
    wx = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    wy = Window.partitionBy("o_orderpriority").orderBy(
        "o_orderdate", "o_orderkey"
    )
    r = o.select(
        "o_orderpriority",
        F.row_number().over(wx).cast("bigint").alias("rx"),
        F.row_number().over(wy).cast("bigint").alias("ry"),
    )
    d2 = (F.col("rx") - F.col("ry")) * (F.col("rx") - F.col("ry"))
    s = r.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(d2.cast("decimal(38,0)")).cast("double").alias("sd2"),
    )
    n_d = F.col("n").cast("double")
    rho = F.lit(1.0) - (F.lit(6.0) * F.col("sd2")) / (
        n_d * (n_d * n_d - F.lit(1.0))
    )
    return s.select("o_orderpriority", "n", fpq(rho, 9).alias("rho"))


# ---------------------------------------------------------------------------
# agg_skew_kurtosis — 3rd/4th standardized moments from exact power sums
# ---------------------------------------------------------------------------

_SKEWKURT_ORACLE = f"""
WITH s AS (
    SELECT l_returnflag,
           CAST(COUNT(l_quantity) AS BIGINT) AS n,
           {dsum_sql('l_quantity', 6)} AS s1,
           {dsum_sql('l_quantity * l_quantity', 6)} AS s2,
           {dsum_sql('l_quantity * l_quantity * l_quantity', 6)} AS s3,
           {dsum_sql(
               'l_quantity * l_quantity * l_quantity * l_quantity', 6
           )} AS s4
    FROM lineitem GROUP BY l_returnflag
),
m AS (
    SELECT l_returnflag, n,
           s1 / CAST(n AS DOUBLE) AS m1,
           s2 / CAST(n AS DOUBLE) AS m2,
           s3 / CAST(n AS DOUBLE) AS m3,
           s4 / CAST(n AS DOUBLE) AS m4
    FROM s
),
c AS (
    SELECT l_returnflag, n, m1,
           m2 - m1 * m1 AS v,
           m3 - 3.0 * m1 * m2 + 2.0 * m1 * m1 * m1 AS c3,
           m4 - 4.0 * m1 * m3 + 6.0 * m1 * m1 * m2
              - 3.0 * m1 * m1 * m1 * m1 AS c4
    FROM m
)
SELECT l_returnflag, n,
       {fpq_sql('m1', 8)} AS mean_qty,
       {fpq_sql('c3 / (v * sqrt(v))', 8)} AS skewness,
       {fpq_sql('c4 / (v * v) - 3.0', 8)} AS excess_kurtosis
FROM c
"""


@register(
    "agg_skew_kurtosis",
    _SKEWKURT_ORACLE,
    doc="Population skewness and excess kurtosis of quantity per return "
    "flag, computed from DECIMAL-EXACT raw power sums (sum x..x^4) "
    "combined into central moments in double with an identical "
    "expression shape on both engines — never the engines' one-pass "
    "accumulators, whose partial-merge order is nondeterministic under "
    "parallelism. Extends agg_stats_suite (covar/corr/stddev) to the "
    "3rd/4th moments used for distribution-shape data profiling. One "
    "map-side-combinable hash aggregate; fixed-point at 1e-8 absorbs "
    "any final-ulp residue.",
)
def agg_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = F.col("l_quantity")
    s = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count("l_quantity").cast("bigint").alias("n"),
            dsum(q, 6).alias("s1"),
            dsum(q * q, 6).alias("s2"),
            dsum(q * q * q, 6).alias("s3"),
            dsum(q * q * q * q, 6).alias("s4"),
        )
    )
    n_d = F.col("n").cast("double")
    m1 = (F.col("s1") / n_d).alias("m1")
    m = s.select(
        "l_returnflag", "n", m1,
        (F.col("s2") / n_d).alias("m2"),
        (F.col("s3") / n_d).alias("m3"),
        (F.col("s4") / n_d).alias("m4"),
    )
    v = F.col("m2") - F.col("m1") * F.col("m1")
    c3 = (
        F.col("m3")
        - F.lit(3.0) * F.col("m1") * F.col("m2")
        + F.lit(2.0) * F.col("m1") * F.col("m1") * F.col("m1")
    )
    c4 = (
        F.col("m4")
        - F.lit(4.0) * F.col("m1") * F.col("m3")
        + F.lit(6.0) * F.col("m1") * F.col("m1") * F.col("m2")
        - F.lit(3.0) * F.col("m1") * F.col("m1") * F.col("m1") * F.col("m1")
    )
    c = m.select(
        "l_returnflag", "n", "m1",
        v.alias("v"), c3.alias("c3"), c4.alias("c4"),
    )
    return c.select(
        "l_returnflag",
        "n",
        fpq(F.col("m1"), 8).alias("mean_qty"),
        fpq(F.col("c3") / (F.col("v") * F.sqrt(F.col("v"))), 8).alias(
            "skewness"
        ),
        fpq(F.col("c4") / (F.col("v") * F.col("v")) - F.lit(3.0), 8).alias(
            "excess_kurtosis"
        ),
    )


# ---------------------------------------------------------------------------
# quality_fk_orphans — referential-integrity audit across the star schema
# ---------------------------------------------------------------------------

_FK_RELATIONS = (
    # (relation label, child table, child key, parent table, parent key)
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
     "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey",
     "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
     "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey",
     "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey",
     "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey",
     "nation", "n_nationkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey",
     "region", "r_regionkey"),
)


def _fk_oracle() -> str:
    legs = []
    for label, child, ck, parent, pk in _FK_RELATIONS:
        legs.append(f"""
SELECT '{label}' AS relation,
       CAST(COUNT(*) AS BIGINT) AS n_child,
       CAST(SUM(CASE WHEN p.{pk} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_orphans
FROM {child} c
LEFT JOIN (SELECT DISTINCT {pk} FROM {parent}) p ON p.{pk} = c.{ck}""")
    return "\nUNION ALL\n".join(legs)


@register(
    "quality_fk_orphans",
    _fk_oracle(),
    doc="Referential-integrity audit across the whole star schema: for "
    "each of the 7 FK relations (lineitem->orders/part/supplier, "
    "orders->customer, customer/supplier->nation, nation->region), "
    "the child row count and the count of orphans (child keys with no "
    "parent; NULL child keys join to nothing on both engines, so they "
    "count as orphans). The completeness leg of the quality_* suite "
    "that key-gap and expectation checks don't cover. Plan: each leg "
    "is ONE left join + ONE aggregate — the orphan count is the "
    "null-parent sum of the same join, never a second anti-join pass; "
    "parent keys are deduped defensively (they are PKs, but a dirty "
    "parent must surface as orphan counts, not row inflation). Dims "
    "broadcast; the one big-parent leg (lineitem->orders) is a "
    "two-column shuffle join — linear at 100 TB. All 7 legs are "
    "independent and union into a 7-row audit.",
)
def quality_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    out: DataFrame | None = None
    for label, child, ck, parent, pk in _FK_RELATIONS:
        c = t(spark, sf_dir, child).select(ck)
        p = t(spark, sf_dir, parent).select(pk).distinct()
        joined = c.join(p, c[ck] == p[pk], "left")
        leg = joined.agg(
            F.count("*").cast("bigint").alias("n_child"),
            F.sum(F.when(p[pk].isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_orphans"),
        ).select(F.lit(label).alias("relation"), "n_child", "n_orphans")
        out = leg if out is None else out.unionAll(leg)
    return out


# ---------------------------------------------------------------------------
# split_kfold_hash — deterministic k-fold cross-validation assignment
# ---------------------------------------------------------------------------

_K_FOLDS = 5


def _kfold_bucket_sql() -> str:
    h = content_hash64_sql("'kfold:' || CAST(doc_id AS VARCHAR)")
    return f"({h} % {_K_FOLDS})"


_KFOLD_ORACLE = f"""
SELECT {_kfold_bucket_sql()} AS fold,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents
GROUP BY 1
"""


@register(
    "split_kfold_hash",
    _KFOLD_ORACLE,
    doc="Deterministic k-fold cross-validation assignment (k=5) by md5 "
    "hash bucket of the salted document id — the CV counterpart of "
    "split_train_hash's fixed 90/5/5 split. Every document lands in "
    "exactly one fold by construction (a single modulo — no sampling, "
    "no state), so fold membership is reproducible across runs, "
    "engines, and re-ingestions, and fold i's train set is simply "
    "'fold != i' computed on the fly. The salt ('kfold:') makes the "
    "fold assignment independent of split_train_hash's buckets, so "
    "CV folds don't correlate with the train/val/test split. Output "
    "is the per-fold count/id/char checksums; zero shuffle beyond one "
    "5-group hash aggregate.",
)
def split_kfold_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    fold = content_hash64(
        F.concat(F.lit("kfold:"), F.col("doc_id").cast("string"))
    ) % _K_FOLDS
    return (
        docs.select(fold.alias("fold"), "doc_id", "n_chars")
        .groupBy("fold")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("doc_id").cast("bigint").alias("sum_doc_id"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
    )


# ---------------------------------------------------------------------------
# win_rsi — Relative Strength Index over the daily order-value series
# ---------------------------------------------------------------------------

_RSI_PERIOD = 14

_RSI_ORACLE = f"""
WITH daily AS (
    SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS day,
           {dsum_sql('o_totalprice', 2)} AS v
    FROM orders GROUP BY 1, 2
),
d AS (
    SELECT o_orderpriority, day, v,
           v - lag(v) OVER (
               PARTITION BY o_orderpriority ORDER BY day
           ) AS delta,
           CAST(row_number() OVER (
               PARTITION BY o_orderpriority ORDER BY day
           ) AS BIGINT) AS rn
    FROM daily
),
gl AS (
    SELECT o_orderpriority, day, rn,
           CAST(SUM(CAST(greatest(delta, 0.0) AS DECIMAL(28,6))) OVER (
               PARTITION BY o_orderpriority ORDER BY day
               ROWS BETWEEN {_RSI_PERIOD - 1} PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS g,
           CAST(SUM(CAST(greatest(-delta, 0.0) AS DECIMAL(28,6))) OVER (
               PARTITION BY o_orderpriority ORDER BY day
               ROWS BETWEEN {_RSI_PERIOD - 1} PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS l
    FROM d
)
SELECT o_orderpriority, day,
       CASE WHEN g + l = 0.0 THEN 50.0
            ELSE {fpq_sql('100.0 * g / (g + l)', 6)} END AS rsi
FROM gl WHERE rn >= {_RSI_PERIOD + 1}
"""


@register(
    "win_rsi",
    _RSI_ORACLE,
    doc="Relative Strength Index (RSI-14) over the daily order-value "
    "series per priority class — the momentum indicator beside "
    "win_drawdown_max and win_zscore_rolling in the financial-window "
    "family. Daily values are decimal-exact sums; deltas split into "
    "gain/loss legs; the 14-row rolling sums go through per-row "
    "DECIMAL casts (window frames are sequential scans, but the "
    "decimal cast keeps the two engines' accumulation identical); "
    "RSI = 100*g/(g+l) with the flat-market g+l=0 case pinned to 50. "
    "Rows before the warm-up window are dropped. Scale: the series is "
    "one row per (priority, day) — the window pass runs over an "
    "already-aggregated frame orders of magnitude smaller than the "
    "fact table.",
)
def win_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        t(spark, sf_dir, "orders")
        .groupBy(
            "o_orderpriority",
            F.to_date("o_orderdate").alias("day"),
        )
        .agg(dsum("o_totalprice", 2).alias("v"))
    )
    w = Window.partitionBy("o_orderpriority").orderBy("day")
    frame = w.rowsBetween(-(_RSI_PERIOD - 1), 0)
    d = daily.select(
        "o_orderpriority",
        "day",
        (F.col("v") - F.lag("v").over(w)).alias("delta"),
        F.row_number().over(w).cast("bigint").alias("rn"),
    )
    g = (
        F.sum(
            F.greatest(F.col("delta"), F.lit(0.0)).cast("decimal(28,6)")
        )
        .over(frame)
        .cast("double")
    )
    loss = (
        F.sum(
            F.greatest(-F.col("delta"), F.lit(0.0)).cast("decimal(28,6)")
        )
        .over(frame)
        .cast("double")
    )
    gl = d.select(
        "o_orderpriority", "day", "rn", g.alias("g"), loss.alias("l")
    )
    rsi = F.when(F.col("g") + F.col("l") == 0.0, F.lit(50.0)).otherwise(
        fpq(F.lit(100.0) * F.col("g") / (F.col("g") + F.col("l")), 6)
    )
    return gl.filter(F.col("rn") >= _RSI_PERIOD + 1).select(
        "o_orderpriority", "day", rsi.alias("rsi")
    )


# ---------------------------------------------------------------------------
# ts_ohlc_bars — open/high/low/close candle aggregation
# ---------------------------------------------------------------------------

_OHLC_ORACLE = f"""
SELECT event_type, CAST(ts AS DATE) AS day,
       (min(struct_pack(ts := ts, eid := event_id, v := value))).v AS open,
       max(value) AS high,
       min(value) AS low,
       (max(struct_pack(ts := ts, eid := event_id, v := value))).v AS close,
       CAST(COUNT(*) AS BIGINT) AS n_trades,
       {dsum_sql('value', 6)} AS vol
FROM events
GROUP BY event_type, CAST(ts AS DATE)
"""


@register(
    "ts_ohlc_bars",
    _OHLC_ORACLE,
    doc="OHLC candle bars: per (event_type, day), the first/max/min/"
    "last event value plus count and decimal-exact volume — the "
    "market-data resampling primitive beside ts_resample_daily. "
    "Open/close use MIN/MAX over a (ts, event_id, value) struct — "
    "lexicographic struct ordering IS the tie-broken argmin/argmax "
    "(event_id is unique, so the value field never decides), one "
    "hash aggregate with full map-side combine, NO window pass and "
    "NO per-group sort: at 100 TB this is a single linear shuffle "
    "on the bar key, the plan a first/last window formulation would "
    "not give.",
)
def ts_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id", "value"
    )
    s = F.struct(
        F.col("ts").alias("ts"),
        F.col("event_id").alias("eid"),
        F.col("value").alias("v"),
    )
    return ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.min(s).getField("v").alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(s).getField("v").alias("close"),
        F.count("*").cast("bigint").alias("n_trades"),
        dsum("value", 6).alias("vol"),
    )


# ---------------------------------------------------------------------------
# graph_jaccard_neighbors — neighbor-set similarity (link prediction)
# ---------------------------------------------------------------------------

# Hub guard: nodes whose degree exceeds this cap are removed from the
# graph before the wedge join (their edges too) — the same default-on
# hot-key discipline as DEFAULT_MAX_SHINGLE_DF. The wedge fan-out is
# sum(deg(n)^2) over wedge centers, so one hub node would dominate the
# whole pair generation; the co-purchase support prune bounds degrees
# on THIS fixture, but the cap makes the worst case linear by
# construction at any scale.
_MAX_NBR_DEG = 1000
_JACCARD_FP = 1_000_000
_JACCARD_TOP = 20


def _jaccard_oracle() -> str:
    from evolution_data_warehouse_spark.queries.extensions_r7 import (
        _EDGES_SQL,
    )

    return f"""
WITH {_EDGES_SQL},
adj0 AS (
    SELECT pa AS node, pb AS nbr FROM edges
    UNION ALL
    SELECT pb AS node, pa AS nbr FROM edges
),
deg0 AS (
    SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM adj0 GROUP BY node
),
keep AS (SELECT node FROM deg0 WHERE d <= {_MAX_NBR_DEG}),
adj AS (
    SELECT a.node, a.nbr FROM adj0 a
    JOIN keep k1 ON k1.node = a.node
    JOIN keep k2 ON k2.node = a.nbr
),
deg AS (
    SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM adj GROUP BY node
),
wedge AS (
    SELECT a.nbr AS u, b.nbr AS w, CAST(COUNT(*) AS BIGINT) AS common
    FROM adj a JOIN adj b ON b.node = a.node AND a.nbr < b.nbr
    GROUP BY a.nbr, b.nbr
    HAVING COUNT(*) >= 2
)
SELECT u, w, common, du.d AS deg_u, dw.d AS deg_w,
       (common * {_JACCARD_FP}) // (du.d + dw.d - common) AS jaccard_fp
FROM wedge
JOIN deg du ON du.node = u
JOIN deg dw ON dw.node = w
ORDER BY jaccard_fp DESC, u, w
LIMIT {_JACCARD_TOP}
"""


@register(
    "graph_jaccard_neighbors",
    _jaccard_oracle(),
    doc="Neighbor-set Jaccard similarity over the co-purchase graph — "
    "the classic link-prediction / node-similarity score (parts whose "
    "co-purchase neighborhoods overlap are substitutes or kit-mates). "
    "Candidate pairs come from a wedge join through shared neighbors "
    "(only pairs with >= 2 common neighbors survive — never all "
    f"pairs), hub nodes above the default-on degree cap "
    f"({_MAX_NBR_DEG}) are dropped with their edges before the wedge "
    "join (the same hot-key guard discipline as the shingle df-cap), "
    "and jaccard = common / (du + dw - common) is an exact int64 "
    "floor division at 1e6 fixed point — no float ever ranks. Top-20 "
    "fully tie-broken by (score, u, w). Scale: wedge fan-out is "
    "sum(deg^2) over the CAPPED degrees; the pruned edge list is "
    "localCheckpoint-pinned so the support aggregate runs once, and "
    "the degree table broadcasts.",
)
def graph_jaccard_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from evolution_data_warehouse_spark.queries.extensions_r7 import _edges

    e = (
        _edges(spark, sf_dir)
        .select("pa", "pb")
        .localCheckpoint(eager=True)
    )
    adj0 = e.select(
        F.col("pa").alias("node"), F.col("pb").alias("nbr")
    ).unionAll(e.select(F.col("pb").alias("node"), F.col("pa").alias("nbr")))
    deg0 = adj0.groupBy("node").agg(F.count("*").cast("bigint").alias("d"))
    keep = deg0.filter(F.col("d") <= _MAX_NBR_DEG).select("node")
    adj = (
        adj0.join(F.broadcast(keep), "node")
        .join(
            F.broadcast(keep.withColumnRenamed("node", "nbr")),
            "nbr",
        )
        .select("node", "nbr")
        .localCheckpoint(eager=True)
    )
    deg = adj.groupBy("node").agg(F.count("*").cast("bigint").alias("d"))
    a, b = adj.alias("a"), adj.alias("b")
    wedge = (
        a.join(
            b,
            (F.col("b.node") == F.col("a.node"))
            & (F.col("a.nbr") < F.col("b.nbr")),
        )
        .groupBy(F.col("a.nbr").alias("u"), F.col("b.nbr").alias("w"))
        .agg(F.count("*").cast("bigint").alias("common"))
        .filter(F.col("common") >= 2)
    )
    du = F.broadcast(
        deg.select(F.col("node").alias("u"), F.col("d").alias("deg_u"))
    )
    dw = F.broadcast(
        deg.select(F.col("node").alias("w"), F.col("d").alias("deg_w"))
    )
    scored = (
        wedge.join(du, "u")
        .join(dw, "w")
        .withColumn(
            "jaccard_fp",
            F.expr(
                f"(common * {_JACCARD_FP}) DIV (deg_u + deg_w - common)"
            ),
        )
    )
    return (
        scored.select("u", "w", "common", "deg_u", "deg_w", "jaccard_fp")
        .orderBy(F.col("jaccard_fp").desc(), "u", "w")
        .limit(_JACCARD_TOP)
    )


# ---------------------------------------------------------------------------
# snk_webdataset_shards — WebDataset-style tar shard training sink
# ---------------------------------------------------------------------------

_WDS_SHARDS = 8
# Per-sample body hashes are summed mod this prime so the checksum can
# never overflow int64 at any corpus size (60-bit raw hashes would at
# ~8k rows/shard).
_WDS_MOD = 1_000_000_007


def _wds_oracle() -> str:
    rk = content_hash64_sql("'wds:' || CAST(doc_id AS VARCHAR)")
    body_h = content_hash64_sql("body")
    return f"""
WITH k AS (
    SELECT doc_id, COALESCE(text, '') AS body,
           {rk} AS rk
    FROM documents
),
p AS (
    SELECT doc_id, body, rk, rk % {_WDS_SHARDS} AS shard,
           CAST(row_number() OVER (
               PARTITION BY rk % {_WDS_SHARDS} ORDER BY rk, doc_id
           ) AS BIGINT) AS pos
    FROM k
)
SELECT shard,
       CAST(COUNT(*) AS BIGINT) AS n_samples,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
       CAST(SUM(strlen(body)) AS BIGINT) AS bytes_text,
       CAST(SUM(pos * doc_id) AS BIGINT) AS pos_checksum,
       CAST(SUM({body_h} % {_WDS_MOD}) AS BIGINT) AS body_checksum,
       CAST(0 AS BIGINT) AS n_bad_rk
FROM p GROUP BY shard
"""


@register(
    "snk_webdataset_shards",
    _wds_oracle(),
    doc="WebDataset-style tar shard training sink — the multimodal "
    "loader format (Beaumont et al.'s img2dataset / LAION tooling "
    "convention: one tar per shard, one sample = same-basename member "
    "files, loaders stream tars sequentially with zero coordination). "
    "Each document's shard is its salted md5 hash mod 8; within a "
    "shard, samples are laid out in (rank, doc_id) order and written "
    "as {doc_id}.txt (the body) + {doc_id}.json (metadata incl. the "
    "rank key) with pinned mtime/uid so the tar bytes are fully "
    "deterministic. The writer is one applyInPandas per shard group "
    "(atomic tmp+rename, so task retries are idempotent); the reader "
    "re-opens every tar in a second Arrow stage, walks members IN TAR "
    "ORDER, recomputes the rank from the payload, and checks the "
    "stored rank (n_bad_rk must be 0). The emitted per-shard count / "
    "id / byte / POSITIONAL checksums only match the oracle if shard "
    "assignment, sample order, and bodies are all exactly right. "
    "Scale: shard count would be O(cluster cores) at 100 TB (pinned "
    "8 here); each shard writes and verifies independently — no "
    "global sort, no driver data path.",
)
def snk_webdataset_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    import io
    import json
    import os
    import shutil
    import tarfile
    import tempfile
    from hashlib import md5

    import pandas as pd

    from evolution_data_warehouse_spark.queries.relational import _scratch

    base = _scratch("snk_webdataset_shards", sf_dir)
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base, exist_ok=True)

    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.coalesce("text", F.lit("")).alias("body")
    )
    keyed = docs.select(
        "doc_id",
        "body",
        content_hash64(
            F.concat(F.lit("wds:"), F.col("doc_id").cast("string"))
        ).alias("rk"),
    ).withColumn("shard", F.col("rk") % _WDS_SHARDS)

    def _write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        pdf = pdf.sort_values(["rk", "doc_id"])
        path = os.path.join(base, f"shard-{shard:05d}.tar")
        fd, tmp = tempfile.mkstemp(dir=base, suffix=".tmp")
        with os.fdopen(fd, "wb") as fh:
            with tarfile.open(fileobj=fh, mode="w") as tar:
                for doc_id, body, rk in zip(
                    pdf["doc_id"], pdf["body"], pdf["rk"]
                ):
                    key = f"{int(doc_id):012d}"
                    txt = str(body).encode("utf-8")
                    meta = json.dumps(
                        {"doc_id": int(doc_id), "rk": int(rk)},
                        sort_keys=True,
                    ).encode("utf-8")
                    for suffix, payload in ((".txt", txt), (".json", meta)):
                        info = tarfile.TarInfo(name=key + suffix)
                        info.size = len(payload)
                        info.mtime = 0  # pinned: byte-deterministic tars
                        tar.addfile(info, io.BytesIO(payload))
        os.replace(tmp, path)  # atomic publish — retries are idempotent
        return pd.DataFrame(
            {"shard": [shard], "path": [path], "n": [len(pdf)]}
        )

    manifest = (
        keyed.repartition(_WDS_SHARDS, "shard")
        .groupBy("shard")
        .applyInPandas(_write_shard, "shard bigint, path string, n bigint")
    )

    def _read_shards(batches):
        for pdf in batches:
            out = {
                "shard": [],
                "pos": [],
                "doc_id": [],
                "octet_len": [],
                "body_h": [],
                "bad_rk": [],
            }
            for shard, path in zip(pdf["shard"], pdf["path"]):
                with tarfile.open(path, "r") as tar:
                    pos = 0
                    pending: dict[str, bytes] = {}
                    for member in tar:
                        key, suffix = os.path.splitext(member.name)
                        payload = tar.extractfile(member).read()
                        pending[suffix] = payload
                        if len(pending) < 2:
                            continue
                        # one full sample (.txt + .json) collected
                        pos += 1
                        body = pending[".txt"]
                        meta = json.loads(pending[".json"])
                        pending = {}
                        doc_id = int(key)
                        expect_rk = int(
                            md5(f"wds:{doc_id}".encode()).hexdigest()[:15],
                            16,
                        )
                        bad = (
                            int(meta["doc_id"]) != doc_id
                            or int(meta["rk"]) != expect_rk
                        )
                        out["shard"].append(int(shard))
                        out["pos"].append(pos)
                        out["doc_id"].append(doc_id)
                        out["octet_len"].append(len(body))
                        out["body_h"].append(
                            int(md5(body).hexdigest()[:15], 16) % _WDS_MOD
                        )
                        out["bad_rk"].append(1 if bad else 0)
            yield pd.DataFrame(out)

    samples = manifest.repartition(_WDS_SHARDS).mapInPandas(
        _read_shards,
        "shard bigint, pos bigint, doc_id bigint, octet_len bigint, "
        "body_h bigint, bad_rk bigint",
    )
    return samples.groupBy("shard").agg(
        F.count("*").cast("bigint").alias("n_samples"),
        F.sum("doc_id").cast("bigint").alias("sum_doc_id"),
        F.sum("octet_len").cast("bigint").alias("bytes_text"),
        F.sum(F.col("pos") * F.col("doc_id"))
        .cast("bigint")
        .alias("pos_checksum"),
        F.sum("body_h").cast("bigint").alias("body_checksum"),
        F.sum("bad_rk").cast("bigint").alias("n_bad_rk"),
    )


# ---------------------------------------------------------------------------
# src_xml_roundtrip — native XML datasource (Spark 4 built-in)
# ---------------------------------------------------------------------------

_XML_ORACLE = """
SELECT n.n_regionkey, r.r_name,
       CAST(COUNT(*) AS BIGINT) AS n_nations,
       CAST(SUM(n.n_nationkey) AS BIGINT) AS sum_nationkey
FROM nation n JOIN region r ON r.r_regionkey = n.n_regionkey
GROUP BY n.n_regionkey, r.r_name
"""


@register(
    "src_xml_roundtrip",
    _XML_ORACLE,
    doc="XML source/sink round-trip via Spark 4's NATIVE xml datasource "
    "(spark-xml was merged into core in 4.0 — no external package): "
    "the nation-region join is written as <rows><row>...</row></rows> "
    "documents, read back with an EXPLICIT schema (never inference — "
    "schema drift must fail loudly, and an inference pass is a second "
    "full scan at 100 TB), and aggregated per region. The aggregate "
    "only matches the oracle if the XML writer/parser preserved every "
    "row and type. Dimension-sized here by design: XML is a feed "
    "format for reference data, not a fact-table format.",
)
def src_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from evolution_data_warehouse_spark.queries.relational import _scratch

    path = _scratch("src_xml_roundtrip", sf_dir)
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    joined = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_regionkey", "r_name"
    )
    (
        joined.coalesce(1)
        .write.mode("overwrite")
        .format("xml")
        .option("rootTag", "rows")
        .option("rowTag", "row")
        .save(path)
    )
    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    )
    back = (
        spark.read.format("xml")
        .option("rowTag", "row")
        .schema(schema)
        .load(path)
    )
    return back.groupBy("n_regionkey", "r_name").agg(
        F.count("*").cast("bigint").alias("n_nations"),
        F.sum("n_nationkey").cast("bigint").alias("sum_nationkey"),
    )


# ---------------------------------------------------------------------------
# dim_date_spine — generated calendar dimension over the fact date range
# ---------------------------------------------------------------------------

# Monday anchor for an engine-independent day-of-week: 1970-01-05 was a
# Monday, so dow = ((date - anchor) mod 7) with 0=Monday — pure integer
# date arithmetic, immune to the engines' differing dayofweek()
# conventions (Spark: 1=Sunday; DuckDB: 0=Sunday).
_DOW_ANCHOR = "1970-01-05"

_DATE_SPINE_ORACLE = f"""
WITH bounds AS (
    SELECT CAST(MIN(o_orderdate) AS DATE) AS d0,
           CAST(MAX(o_orderdate) AS DATE) AS d1
    FROM orders
),
spine AS (
    SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
    FROM bounds
)
SELECT day,
       CAST(year(day) AS INT) AS yr,
       CAST(month(day) AS INT) AS mo,
       CAST((month(day) + 2) // 3 AS INT) AS qtr,
       CAST(((day - DATE '{_DOW_ANCHOR}') % 7 + 7) % 7 AS INT) AS dow,
       CAST(CASE WHEN ((day - DATE '{_DOW_ANCHOR}') % 7 + 7) % 7 >= 5
            THEN 1 ELSE 0 END AS INT) AS is_weekend,
       CAST(CASE WHEN day = last_day(day) THEN 1 ELSE 0 END AS INT)
           AS is_month_end
FROM spine
"""


@register(
    "dim_date_spine",
    _DATE_SPINE_ORACLE,
    doc="Generated calendar dimension (date spine) covering the fact "
    "table's [min, max] order-date range — the gap-free scaffold "
    "every time-series join in the warehouse hangs off (win_fill_"
    "forward / ts_gap_detection consume exactly this shape). Spark "
    "side is sequence() + explode over the 1-row bounds aggregate — "
    "a generator, not a scan, so the spine costs O(days) regardless "
    "of fact size. Day-of-week comes from integer arithmetic against "
    "a pinned Monday anchor (1970-01-05) because the engines' native "
    "dayofweek() conventions differ (Spark 1=Sunday, DuckDB "
    "0=Sunday); quarter is an integer division on month. No float "
    "anywhere.",
)
def dim_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    bounds = t(spark, sf_dir, "orders").agg(
        F.min(F.to_date("o_orderdate")).alias("d0"),
        F.max(F.to_date("o_orderdate")).alias("d1"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))
        ).alias("day")
    )
    dow = ((F.datediff(F.col("day"), F.lit(_DOW_ANCHOR).cast("date")) % 7) + 7) % 7
    return spine.select(
        "day",
        F.year("day").cast("int").alias("yr"),
        F.month("day").cast("int").alias("mo"),
        ((F.month("day") + 2) / 3).cast("int").alias("qtr"),
        dow.cast("int").alias("dow"),
        F.when(dow >= 5, 1).otherwise(0).cast("int").alias("is_weekend"),
        F.when(F.col("day") == F.last_day("day"), 1)
        .otherwise(0)
        .cast("int")
        .alias("is_month_end"),
    )


# ---------------------------------------------------------------------------
# win_bollinger — rolling mean +/- 2 sigma bands over the daily series
# ---------------------------------------------------------------------------

_BOLL_WINDOW = 20

_BOLL_ORACLE = f"""
WITH daily AS (
    SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS day,
           {dsum_sql('o_totalprice', 2)} AS v
    FROM orders GROUP BY 1, 2
),
w AS (
    SELECT o_orderpriority, day, v,
           CAST(row_number() OVER (
               PARTITION BY o_orderpriority ORDER BY day
           ) AS BIGINT) AS rn,
           CAST(SUM(CAST(v AS DECIMAL(28,6))) OVER (
               PARTITION BY o_orderpriority ORDER BY day
               ROWS BETWEEN {_BOLL_WINDOW - 1} PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS s1,
           CAST(SUM(CAST(v * v AS DECIMAL(38,6))) OVER (
               PARTITION BY o_orderpriority ORDER BY day
               ROWS BETWEEN {_BOLL_WINDOW - 1} PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS s2
    FROM daily
),
m AS (
    SELECT o_orderpriority, day, v,
           s1 / {_BOLL_WINDOW}.0 AS mu,
           sqrt(greatest(s2 / {_BOLL_WINDOW}.0
                - (s1 / {_BOLL_WINDOW}.0) * (s1 / {_BOLL_WINDOW}.0), 0.0))
               AS sigma
    FROM w WHERE rn >= {_BOLL_WINDOW}
)
SELECT o_orderpriority, day,
       {fpq_sql('mu', 4)} AS mid,
       {fpq_sql('mu - 2.0 * sigma', 4)} AS lower_band,
       {fpq_sql('mu + 2.0 * sigma', 4)} AS upper_band,
       CAST(CASE WHEN v > mu + 2.0 * sigma THEN 1
                 WHEN v < mu - 2.0 * sigma THEN -1
                 ELSE 0 END AS INT) AS band_break
FROM m
"""


@register(
    "win_bollinger",
    _BOLL_ORACLE,
    doc="Bollinger bands (20-day rolling mean +/- 2 sigma) over the "
    "daily order-value series per priority — the volatility envelope "
    "beside win_rsi's momentum. Rolling first/second moments go "
    "through per-row DECIMAL casts inside the frame so both engines "
    "accumulate identically; sigma = sqrt(max(E[x^2]-E[x]^2, 0)) with "
    "an identical expression shape (the greatest() guards the "
    "constant-series case where cancellation can dip epsilon-negative "
    "on either engine); band placement of the raw value is emitted as "
    "an integer break flag. Warm-up rows are dropped. Same scale "
    "shape as win_rsi: the window pass runs over the tiny "
    "pre-aggregated daily frame.",
)
def win_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        t(spark, sf_dir, "orders")
        .groupBy(
            "o_orderpriority",
            F.to_date("o_orderdate").alias("day"),
        )
        .agg(dsum("o_totalprice", 2).alias("v"))
    )
    w = Window.partitionBy("o_orderpriority").orderBy("day")
    frame = w.rowsBetween(-(_BOLL_WINDOW - 1), 0)
    base = daily.select(
        "o_orderpriority",
        "day",
        "v",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.sum(F.col("v").cast("decimal(28,6)"))
        .over(frame)
        .cast("double")
        .alias("s1"),
        F.sum((F.col("v") * F.col("v")).cast("decimal(38,6)"))
        .over(frame)
        .cast("double")
        .alias("s2"),
    ).filter(F.col("rn") >= _BOLL_WINDOW)
    k = float(_BOLL_WINDOW)
    mu = F.col("s1") / F.lit(k)
    sigma = F.sqrt(
        F.greatest(
            F.col("s2") / F.lit(k) - mu * mu,
            F.lit(0.0),
        )
    )
    m = base.select(
        "o_orderpriority", "day", "v", mu.alias("mu"), sigma.alias("sigma")
    )
    return m.select(
        "o_orderpriority",
        "day",
        fpq(F.col("mu"), 4).alias("mid"),
        fpq(F.col("mu") - F.lit(2.0) * F.col("sigma"), 4).alias("lower_band"),
        fpq(F.col("mu") + F.lit(2.0) * F.col("sigma"), 4).alias("upper_band"),
        F.when(F.col("v") > F.col("mu") + F.lit(2.0) * F.col("sigma"), 1)
        .when(F.col("v") < F.col("mu") - F.lit(2.0) * F.col("sigma"), -1)
        .otherwise(0)
        .cast("int")
        .alias("band_break"),
    )


# ---------------------------------------------------------------------------
# stats_cohens_d — effect size between two customer segments
# ---------------------------------------------------------------------------

_COHEN_A = "BUILDING"
_COHEN_B = "MACHINERY"

_COHEN_ORACLE = f"""
WITH s AS (
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n,
           {dsum_sql('c_acctbal', 6)} AS s1,
           {dsum_sql('c_acctbal * c_acctbal', 6)} AS s2
    FROM customer
    WHERE c_mktsegment IN ('{_COHEN_A}', '{_COHEN_B}')
    GROUP BY c_mktsegment
),
ab AS (
    SELECT
        (SELECT n FROM s WHERE c_mktsegment = '{_COHEN_A}') AS na,
        (SELECT s1 FROM s WHERE c_mktsegment = '{_COHEN_A}') AS sa1,
        (SELECT s2 FROM s WHERE c_mktsegment = '{_COHEN_A}') AS sa2,
        (SELECT n FROM s WHERE c_mktsegment = '{_COHEN_B}') AS nb,
        (SELECT s1 FROM s WHERE c_mktsegment = '{_COHEN_B}') AS sb1,
        (SELECT s2 FROM s WHERE c_mktsegment = '{_COHEN_B}') AS sb2
),
d AS (
    SELECT na, nb,
           sa1 / CAST(na AS DOUBLE) AS ma,
           sb1 / CAST(nb AS DOUBLE) AS mb,
           (sa2 - (sa1 / CAST(na AS DOUBLE)) * sa1)
               / (CAST(na AS DOUBLE) - 1.0) AS va,
           (sb2 - (sb1 / CAST(nb AS DOUBLE)) * sb1)
               / (CAST(nb AS DOUBLE) - 1.0) AS vb
    FROM ab
)
SELECT na, nb,
       {fpq_sql('ma', 6)} AS mean_a,
       {fpq_sql('mb', 6)} AS mean_b,
       {fpq_sql(
           "(ma - mb) / sqrt(((CAST(na AS DOUBLE) - 1.0) * va"
           " + (CAST(nb AS DOUBLE) - 1.0) * vb)"
           " / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE) - 2.0))", 8
       )} AS cohens_d
FROM d
"""


@register(
    "stats_cohens_d",
    _COHEN_ORACLE,
    doc="Cohen's d effect size between two customer segments' account "
    "balances — the practical-significance companion to "
    "stats_ab_test's hypothesis test (a significant difference with "
    "d ~ 0 is noise you can't act on). Per-segment moments are "
    "decimal-exact sums reshaped into sample variances with an "
    "identical double expression on both engines; d = (mean_a - "
    "mean_b) / pooled_sigma, quantized at 1e-8. Spark plan: one "
    "2-group aggregate pivoted into a single row — no join, no "
    "window; the heavy lifting is the same one-pass scan any mean "
    "takes.",
)
def stats_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    bal = F.col("c_acctbal")
    s = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment").isin(_COHEN_A, _COHEN_B))
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            dsum(bal, 6).alias("s1"),
            dsum(bal * bal, 6).alias("s2"),
        )
    )
    seg = F.col("c_mktsegment")
    ab = s.agg(
        F.max(F.when(seg == _COHEN_A, F.col("n"))).alias("na"),
        F.max(F.when(seg == _COHEN_A, F.col("s1"))).alias("sa1"),
        F.max(F.when(seg == _COHEN_A, F.col("s2"))).alias("sa2"),
        F.max(F.when(seg == _COHEN_B, F.col("n"))).alias("nb"),
        F.max(F.when(seg == _COHEN_B, F.col("s1"))).alias("sb1"),
        F.max(F.when(seg == _COHEN_B, F.col("s2"))).alias("sb2"),
    )
    na_d = F.col("na").cast("double")
    nb_d = F.col("nb").cast("double")
    ma = F.col("sa1") / na_d
    mb = F.col("sb1") / nb_d
    va = (F.col("sa2") - (F.col("sa1") / na_d) * F.col("sa1")) / (
        na_d - F.lit(1.0)
    )
    vb = (F.col("sb2") - (F.col("sb1") / nb_d) * F.col("sb1")) / (
        nb_d - F.lit(1.0)
    )
    d = ab.select(
        "na", "nb",
        ma.alias("ma"), mb.alias("mb"), va.alias("va"), vb.alias("vb"),
    )
    na_d2 = F.col("na").cast("double")
    nb_d2 = F.col("nb").cast("double")
    pooled = F.sqrt(
        ((na_d2 - F.lit(1.0)) * F.col("va")
         + (nb_d2 - F.lit(1.0)) * F.col("vb"))
        / (na_d2 + nb_d2 - F.lit(2.0))
    )
    return d.select(
        "na", "nb",
        fpq(F.col("ma"), 6).alias("mean_a"),
        fpq(F.col("mb"), 6).alias("mean_b"),
        fpq((F.col("ma") - F.col("mb")) / pooled, 8).alias("cohens_d"),
    )


# ---------------------------------------------------------------------------
# text_ngram_novelty — first-occurrence novelty profile per source
# ---------------------------------------------------------------------------

_NOVELTY_FP = 1_000_000

_NOVELTY_ORACLE = f"""
WITH bg AS (
    SELECT DISTINCT doc_id, source,
           unnest(list_distinct(list_transform(
               range(1, greatest(len(tk), 1)),
               i -> tk[i] || ' ' || tk[i+1]
           ))) AS bigram
    FROM (
        SELECT doc_id, source,
               str_split(lower(COALESCE(text, '')), ' ') AS tk
        FROM documents
    )
),
first_seen AS (
    SELECT bigram, MIN(doc_id) AS first_doc FROM bg GROUP BY bigram
),
per_doc AS (
    SELECT b.doc_id, b.source,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(CASE WHEN f.first_doc = b.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel
    FROM bg b JOIN first_seen f ON f.bigram = b.bigram
    GROUP BY b.doc_id, b.source
),
src AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
    GROUP BY source
)
SELECT s.source, s.n_docs,
       CAST(COALESCE(SUM(p.n_bigrams), 0) AS BIGINT) AS total_bigrams,
       CAST(COALESCE(SUM(p.n_novel), 0) AS BIGINT) AS total_novel,
       CAST(CASE WHEN COALESCE(SUM(p.n_bigrams), 0) = 0 THEN 0
            ELSE (SUM(p.n_novel) * {_NOVELTY_FP}) // SUM(p.n_bigrams)
            END AS BIGINT) AS novelty_fp
FROM src s LEFT JOIN per_doc p ON p.source = s.source
GROUP BY s.source, s.n_docs
"""


@register(
    "text_ngram_novelty",
    _NOVELTY_ORACLE,
    doc="First-occurrence n-gram novelty profile per source — the "
    "corpus-freshness signal behind dedup-aware mixing decisions (a "
    "source whose bigrams were all seen in earlier documents adds "
    "little; the inverse of text_repetition's within-doc view and "
    "dedup_lines_corpus's exact-line view). Each document's DISTINCT "
    "bigram set is attributed to its first-appearing document "
    "(min doc_id per bigram — ingestion order as tie-break), then "
    "per-source totals and a 1e6 fixed-point novelty share computed "
    "with integer floor division. Plan: one explode into a (doc, "
    "bigram) relation — already distinct by construction "
    "(array_distinct per doc + unique doc_id), no re-dedup shuffle — "
    "then first-seen attribution as a WINDOW MIN over the bigram "
    "key instead of an aggregate + join-back (one exchange, not two; "
    "the cap_shingle_df guard argument; A/B at sf1: 11.5 s vs "
    "13.3 s), one per-doc hash aggregate, one small per-source "
    "rollup. Sources with zero bigrams survive via the left join "
    "from the per-source frame.",
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), " ")
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), n - 2),
                lambda i: F.concat_ws(
                    " ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    docs = t(spark, sf_dir, "documents")
    bg = docs.select(
        "doc_id", "source", F.explode(bigrams).alias("bigram")
    )
    w = Window.partitionBy("bigram")
    flagged = bg.withColumn("first_doc", F.min("doc_id").over(w))
    per_doc = (
        flagged.groupBy("doc_id", "source")
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_novel"),
        )
    )
    src = docs.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs")
    )
    rolled = (
        src.join(per_doc, "source", "left")
        .groupBy("source", "n_docs")
        .agg(
            F.coalesce(F.sum("n_bigrams"), F.lit(0))
            .cast("bigint")
            .alias("total_bigrams"),
            F.coalesce(F.sum("n_novel"), F.lit(0))
            .cast("bigint")
            .alias("total_novel"),
        )
    )
    novelty = F.when(F.col("total_bigrams") == 0, F.lit(0)).otherwise(
        F.expr(f"(total_novel * {_NOVELTY_FP}) DIV total_bigrams")
    )
    return rolled.select(
        "source", "n_docs", "total_bigrams", "total_novel",
        novelty.cast("bigint").alias("novelty_fp"),
    )


# ---------------------------------------------------------------------------
# event_window_funnel — time-window-constrained funnel depth
# ---------------------------------------------------------------------------

_WF_WINDOW = "1 HOUR"

_WF_ORACLE = f"""
WITH v AS (
    SELECT user_id, event_id, ts FROM events WHERE event_type = 'view'
),
c AS (
    SELECT v.user_id, v.event_id, v.ts,
           MIN(e.ts) AS click_ts
    FROM v LEFT JOIN events e
      ON e.user_id = v.user_id AND e.event_type = 'click'
     AND e.ts > v.ts AND e.ts <= v.ts + INTERVAL {_WF_WINDOW}
    GROUP BY v.user_id, v.event_id, v.ts
),
p AS (
    SELECT c.user_id, c.event_id, c.click_ts,
           MIN(e.ts) AS buy_ts
    FROM c LEFT JOIN events e
      ON e.user_id = c.user_id AND e.event_type = 'purchase'
     AND c.click_ts IS NOT NULL
     AND e.ts > c.click_ts AND e.ts <= c.click_ts + INTERVAL {_WF_WINDOW}
    GROUP BY c.user_id, c.event_id, c.click_ts
),
depth AS (
    SELECT user_id,
           MAX(CASE WHEN buy_ts IS NOT NULL THEN 3
                    WHEN click_ts IS NOT NULL THEN 2
                    ELSE 1 END) AS depth
    FROM p GROUP BY user_id
)
SELECT CAST(depth AS INT) AS depth,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM depth GROUP BY depth
"""


@register(
    "event_window_funnel",
    _WF_ORACLE,
    doc="Time-window-constrained funnel depth (the ClickHouse "
    "windowFunnel analog): view -> click within 1h -> purchase within "
    "1h of the click, reported as a per-user max-depth histogram. "
    "Unlike funnel_conversion's unbounded 'first event after' chain, "
    "every hop here must land inside the sliding window, which is "
    "what product funnels actually measure (a purchase a week later "
    "is not this funnel). Each hop is an equi-join on user_id with a "
    "range predicate + a MIN aggregate — fan-out is bounded by "
    "events-per-user-per-hour, and everything shuffles on the same "
    "user_id key so the two hops and the depth rollup share one "
    "partitioning. MIN over timestamps is exact (µs integers) — no "
    "float anywhere.",
)
def event_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select("user_id", "event_id", "event_type", "ts")
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", "event_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    c = (
        v.join(
            clicks,
            (F.col("c_user") == F.col("user_id"))
            & (F.col("c_ts") > F.col("ts"))
            & (F.col("c_ts") <= F.expr(f"ts + INTERVAL {_WF_WINDOW}")),
            "left",
        )
        .groupBy("user_id", "event_id", "ts")
        .agg(F.min("c_ts").alias("click_ts"))
    )
    p = (
        c.join(
            buys,
            (F.col("p_user") == F.col("user_id"))
            & F.col("click_ts").isNotNull()
            & (F.col("p_ts") > F.col("click_ts"))
            & (
                F.col("p_ts")
                <= F.expr(f"click_ts + INTERVAL {_WF_WINDOW}")
            ),
            "left",
        )
        .groupBy("user_id", "event_id", "click_ts")
        .agg(F.min("p_ts").alias("buy_ts"))
    )
    depth = p.groupBy("user_id").agg(
        F.max(
            F.when(F.col("buy_ts").isNotNull(), 3)
            .when(F.col("click_ts").isNotNull(), 2)
            .otherwise(1)
        ).alias("depth")
    )
    return depth.groupBy(F.col("depth").cast("int").alias("depth")).agg(
        F.count("*").cast("bigint").alias("n_users")
    )


# ---------------------------------------------------------------------------
# corpus_epoch_schedule — data-budget planner with repeat factors
# ---------------------------------------------------------------------------

# Pinned training-token budget and the max number of passes (epochs)
# any single source may be repeated for — the data-constrained-scaling
# knob (repeating a small source more than ~4 epochs stops helping).
_EPOCH_BUDGET = 200_000
_EPOCH_MAX_REPEAT = 4
_EPOCH_FP = 1_000_000

_EPOCH_SCHED_ORACLE = f"""
WITH toks AS (
    SELECT source,
           CAST(SUM(len(str_split(COALESCE(text, ''), ' '))) AS BIGINT)
               AS tokens_available
    FROM documents GROUP BY source
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_sources FROM toks),
plan AS (
    SELECT t.source, t.tokens_available,
           CAST({_EPOCH_BUDGET} // n.n_sources AS BIGINT) AS alloc_target
    FROM toks t CROSS JOIN n
)
SELECT source, tokens_available, alloc_target,
       CAST(least(alloc_target,
                  {_EPOCH_MAX_REPEAT} * tokens_available) AS BIGINT)
           AS tokens_granted,
       CAST(greatest(alloc_target
                     - {_EPOCH_MAX_REPEAT} * tokens_available, 0)
            AS BIGINT) AS shortfall,
       CAST(CASE WHEN tokens_available = 0 THEN 0
            ELSE (least(alloc_target,
                        {_EPOCH_MAX_REPEAT} * tokens_available)
                  * {_EPOCH_FP}) // tokens_available END AS BIGINT)
           AS repeat_fp
FROM plan
"""


@register(
    "corpus_epoch_schedule",
    _EPOCH_SCHED_ORACLE,
    doc="Training-data budget planner: given a pinned token budget "
    "split uniformly across sources, how many passes (epochs) over "
    "each source does its allocation imply, capped at the data-"
    "constrained-scaling limit of 4 repeats (Muennighoff et al. 2023: "
    "returns from re-reading data decay past ~4 epochs) — the "
    "planning table a run reads BEFORE corpus_mix_sample does the "
    "actual md5-bucket sampling. Emits per source: available tokens, "
    "uniform target, granted tokens (capped), the unfillable "
    "shortfall, and the repeat factor at 1e6 fixed point — all "
    "integer arithmetic (floor divisions both engines). Plan: one "
    "token-count aggregate + a 1-row source-count broadcast; the "
    "whole planner is O(sources).",
)
def corpus_epoch_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = (
        t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.sum(
                F.size(
                    F.split(F.coalesce(F.col("text"), F.lit("")), " ")
                )
            )
            .cast("bigint")
            .alias("tokens_available")
        )
    )
    n = toks.agg(F.count("*").cast("bigint").alias("n_sources"))
    plan = toks.crossJoin(F.broadcast(n)).select(
        "source",
        "tokens_available",
        F.expr(f"{_EPOCH_BUDGET} DIV n_sources")
        .cast("bigint")
        .alias("alloc_target"),
    )
    granted = F.least(
        F.col("alloc_target"),
        F.lit(_EPOCH_MAX_REPEAT) * F.col("tokens_available"),
    )
    shortfall = F.greatest(
        F.col("alloc_target")
        - F.lit(_EPOCH_MAX_REPEAT) * F.col("tokens_available"),
        F.lit(0),
    )
    repeat = F.when(F.col("tokens_available") == 0, F.lit(0)).otherwise(
        F.expr(
            f"(least(alloc_target, {_EPOCH_MAX_REPEAT} * tokens_available)"
            f" * {_EPOCH_FP}) DIV tokens_available"
        )
    )
    return plan.select(
        "source",
        "tokens_available",
        "alloc_target",
        granted.cast("bigint").alias("tokens_granted"),
        shortfall.cast("bigint").alias("shortfall"),
        repeat.cast("bigint").alias("repeat_fp"),
    )


# ---------------------------------------------------------------------------
# limit_keyset_page — seek-method pagination
# ---------------------------------------------------------------------------

_PAGE_SIZE = 15
_PAGE_CURSOR_DATE = "1999-06-01"
_PAGE_CURSOR_KEY = 0

_KEYSET_ORACLE = f"""
SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate, o_totalprice
FROM orders
WHERE CAST(o_orderdate AS DATE) > DATE '{_PAGE_CURSOR_DATE}'
   OR (CAST(o_orderdate AS DATE) = DATE '{_PAGE_CURSOR_DATE}'
       AND o_orderkey > {_PAGE_CURSOR_KEY})
ORDER BY CAST(o_orderdate AS DATE), o_orderkey
LIMIT {_PAGE_SIZE}
"""


@register(
    "limit_keyset_page",
    _KEYSET_ORACLE,
    doc="Keyset (seek-method) pagination: the page AFTER a cursor in a "
    "stable (o_orderdate, o_orderkey) ordering — the API-serving "
    "pattern that replaces OFFSET (which must scan and discard every "
    "skipped row; page 10,000 of an OFFSET plan reads 10,000 pages). "
    "The cursor predicate is sargable, so the scan prunes to rows "
    "past the cursor (parquet min/max footer skipping at scale), and "
    "the LIMIT is a TakeOrdered — per-partition top-15 then a 15-row "
    "merge, never a global sort. Ordering is total (unique key in "
    "the cursor), so pages are gap-free and overlap-free at any "
    "concurrency.",
)
def limit_keyset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = F.to_date("o_orderdate")
    cursor_d = F.lit(_PAGE_CURSOR_DATE).cast("date")
    return (
        t(spark, sf_dir, "orders")
        .filter(
            (d > cursor_d)
            | ((d == cursor_d) & (F.col("o_orderkey") > _PAGE_CURSOR_KEY))
        )
        .select(
            "o_orderkey", d.alias("o_orderdate"), "o_totalprice"
        )
        .orderBy("o_orderdate", "o_orderkey")
        .limit(_PAGE_SIZE)
    )


# ---------------------------------------------------------------------------
# quality_pk_uniqueness — primary-key uniqueness audit
# ---------------------------------------------------------------------------

_PK_DECLS = (
    ("region", ("r_regionkey",)),
    ("nation", ("n_nationkey",)),
    ("customer", ("c_custkey",)),
    ("supplier", ("s_suppkey",)),
    ("part", ("p_partkey",)),
    ("orders", ("o_orderkey",)),
    ("lineitem", ("l_orderkey", "l_linenumber")),
    ("events", ("event_id",)),
    ("documents", ("doc_id",)),
    ("embeddings", ("vec_id",)),
)


def _pk_oracle() -> str:
    legs = []
    for table, keys in _PK_DECLS:
        key_expr = ", ".join(keys)
        # NULL-key rows are excluded from the distinct count on BOTH
        # engines (Spark's COUNT(DISTINCT a, b) skips any-NULL rows;
        # the WHERE mirrors that) — a NULL key is a different defect
        # class, reported by filter_dropna_keys/quality_expectations.
        not_null = " AND ".join(f"{k} IS NOT NULL" for k in keys)
        legs.append(f"""
SELECT '{table}' AS tbl, '{",".join(keys)}' AS pk,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST((SELECT COUNT(*) FROM (
           SELECT DISTINCT {key_expr} FROM {table} WHERE {not_null}
       )) AS BIGINT) AS n_distinct
FROM {table}""")
    return "\nUNION ALL\n".join(legs)


@register(
    "quality_pk_uniqueness",
    _pk_oracle(),
    doc="Primary-key uniqueness audit across every table in the "
    "warehouse: declared key vs row count vs exact distinct count — "
    "the constraint-validation twin of quality_fk_orphans (files "
    "enforce nothing; the audit is how a lakehouse notices). "
    "Deliberately includes lineitem's composite (l_orderkey, "
    "l_linenumber), which this fixture genuinely violates — the "
    "audit REPORTS it (n_distinct < n_rows) rather than assuming "
    "cleanliness, exactly the finding that forced "
    "stats_spearman_corr onto a unique key during development. "
    "Each leg is one scan + one exact-distinct aggregate (map-side "
    "partial on the key); legs are independent and union into a "
    "10-row report.",
)
def quality_pk_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    out: DataFrame | None = None
    for table, keys in _PK_DECLS:
        df = t(spark, sf_dir, table)
        leg = df.agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.countDistinct(*[F.col(k) for k in keys])
            .cast("bigint")
            .alias("n_distinct"),
        ).select(
            F.lit(table).alias("tbl"),
            F.lit(",".join(keys)).alias("pk"),
            "n_rows",
            "n_distinct",
        )
        out = leg if out is None else out.unionAll(leg)
    return out


# ---------------------------------------------------------------------------
# dedup_threshold_sweep — near-dup threshold calibration curve
# ---------------------------------------------------------------------------

_SWEEP_THRESHOLDS = (100_000, 300_000, 500_000, 700_000, 900_000)
_SWEEP_FP = 1_000_000


def _sweep_oracle() -> str:
    from evolution_data_warehouse_spark.operators.dedup import (
        DEFAULT_MAX_SHINGLE_DF,
    )
    from evolution_data_warehouse_spark.queries.llm_ops import _SHINGLES_SQL

    thr_list = ", ".join(str(x) for x in _SWEEP_THRESHOLDS)
    return f"""
WITH sh0 AS ({_SHINGLES_SQL}),
shu AS (SELECT doc_id,
              CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT)
                  AS shingle_h
       FROM sh0),
sh AS (SELECT doc_id, shingle_h FROM shu
       QUALIFY COUNT(*) OVER (PARTITION BY shingle_h)
               <= {DEFAULT_MAX_SHINGLE_DF}),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
    FROM sh a JOIN sh b ON a.shingle_h = b.shingle_h AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
),
pairs AS (
    SELECT doc_a, doc_b,
           (n_common * {_SWEEP_FP})
               // (sa.n_sh + sb.n_sh - n_common) AS jac_fp
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
),
thr_list AS (SELECT unnest([{thr_list}]) AS thr),
swept AS (
    SELECT t.thr, p.doc_a, p.doc_b
    FROM pairs p JOIN thr_list t ON p.jac_fp >= t.thr
),
pair_counts AS (
    SELECT thr, CAST(COUNT(*) AS BIGINT) AS n_pairs FROM swept GROUP BY thr
),
doc_counts AS (
    SELECT thr, CAST(COUNT(DISTINCT doc) AS BIGINT) AS n_docs_flagged
    FROM (
        SELECT thr, unnest([doc_a, doc_b]) AS doc FROM swept
    ) GROUP BY thr
)
SELECT t.thr,
       CAST(COALESCE(p.n_pairs, 0) AS BIGINT) AS n_pairs,
       CAST(COALESCE(d.n_docs_flagged, 0) AS BIGINT) AS n_docs_flagged
FROM thr_list t
LEFT JOIN pair_counts p ON p.thr = t.thr
LEFT JOIN doc_counts d ON d.thr = t.thr
"""


@register(
    "dedup_threshold_sweep",
    _sweep_oracle(),
    doc="Near-dup threshold calibration curve: the exact n-gram "
    "Jaccard pair relation (dedup_ngram_jaccard's df-capped shingle "
    "self-join, jaccard as int64 floor division at 1e6 fixed point — "
    "no float ranks) swept across five pinned thresholds, reporting "
    "pairs and distinct flagged documents per threshold. This is the "
    "table a pipeline owner reads to PICK the dedup threshold before "
    "committing a 100 TB pass (too loose deletes real data, too "
    "strict leaves boilerplate). Every threshold appears in the "
    "output even at zero pairs (left join from the pinned literal "
    "list — a silent-vanish would read as 'no dupes'). Plan: the "
    "expensive pair relation is computed ONCE and checkpoint-pinned, "
    "then the sweep is an explode over 5 literals + two small "
    "aggregates; the hot-shingle df cap keeps the self-join linear "
    "exactly as in the parent query.",
)
def dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from evolution_data_warehouse_spark.operators.dedup import (
        cap_shingle_df,
    )
    from evolution_data_warehouse_spark.queries.llm_ops import _doc_shingles

    sh = (
        cap_shingle_df(
            _doc_shingles(spark, sf_dir).select(
                "doc_id",
                content_hash64(F.col("shingle")).alias("shingle_h"),
            )
        )
        .localCheckpoint(eager=True)
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle_h") == F.col("b.shingle_h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    pairs = (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.expr(
                f"(n_common * {_SWEEP_FP})"
                " DIV (sa.n_sh + sb.n_sh - n_common)"
            ).alias("jac_fp"),
        )
        .localCheckpoint(eager=True)
    )
    thr_arr = F.array(*[F.lit(x) for x in _SWEEP_THRESHOLDS])
    swept = pairs.select(
        F.explode(thr_arr).alias("thr"), "doc_a", "doc_b", "jac_fp"
    ).filter(F.col("jac_fp") >= F.col("thr"))
    pair_counts = swept.groupBy("thr").agg(
        F.count("*").cast("bigint").alias("n_pairs")
    )
    doc_counts = (
        swept.select(
            "thr", F.explode(F.array("doc_a", "doc_b")).alias("doc")
        )
        .groupBy("thr")
        .agg(F.countDistinct("doc").cast("bigint").alias("n_docs_flagged"))
    )
    thr_df = spark.range(1).select(F.explode(thr_arr).alias("thr"))
    return (
        thr_df.join(F.broadcast(pair_counts), "thr", "left")
        .join(F.broadcast(doc_counts), "thr", "left")
        .select(
            "thr",
            F.coalesce("n_pairs", F.lit(0))
            .cast("bigint")
            .alias("n_pairs"),
            F.coalesce("n_docs_flagged", F.lit(0))
            .cast("bigint")
            .alias("n_docs_flagged"),
        )
    )


# ---------------------------------------------------------------------------
# stream_session_windows — native session_window operator, oracle-checked
# ---------------------------------------------------------------------------

_SESSW_GAP_MIN = 30
_SESSW_GAP = f"{_SESSW_GAP_MIN} minutes"

_SESSW_ORACLE = f"""
WITH marked AS (
    SELECT user_id, ts, event_id,
           CASE WHEN ts - lag(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                ) > INTERVAL {_SESSW_GAP_MIN} MINUTE
                OR lag(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                ) IS NULL
           THEN 1 ELSE 0 END AS is_start
    FROM events
),
islands AS (
    -- the cumulative sum MUST use the same full (ts, event_id)
    -- tie-break as the lag: with ORDER BY ts alone, two events at an
    -- identical timestamp straddling a session start would be
    -- assigned engine-dependently (only the first of a tie group can
    -- carry is_start = 1; every tied row must sort after it)
    SELECT user_id, ts,
           SUM(is_start) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS sess
    FROM marked
)
SELECT MIN(ts) AS session_start,
       MAX(ts) + INTERVAL {_SESSW_GAP_MIN} MINUTE AS session_end,
       user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM islands
GROUP BY user_id, sess
"""


@register(
    "stream_session_windows",
    _SESSW_ORACLE,
    doc="Native session_window() gap-based sessionization (30-min gap) "
    "— Spark's built-in session operator run in batch mode, the same "
    "callable streaming/events.py::session_window_counts feeds to "
    "Structured Streaming (tests/test_streaming.py asserts the "
    "streaming form equals this batch twin across checkpoint "
    "restarts). The oracle is the classic lag + cumulative-sum "
    "gap-islands formulation, so this entry proves the BUILT-IN "
    "operator agrees with the hand-rolled window algebra "
    "(win_session_gap) — window end = last event + gap, per Spark's "
    "session_window contract. Boundary semantics probed empirically: "
    "an event at EXACTLY prev + gap MERGES into the session (verified "
    "on 10:00/10:30/10:59:59 with a 30-min gap -> one 3-event "
    "session), so the oracle's strict 'gap > 30 min starts a new "
    "session' is the exact mirror — do not 'fix' it to >=. One "
    "shuffle on user_id; session state merges map-side. Timestamps "
    "are exact µs integers end to end.",
)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from evolution_data_warehouse_spark.streaming.events import (
        session_window_counts,
    )

    ev = t(spark, sf_dir, "events").select("user_id", "ts")
    out = session_window_counts(ev, gap=_SESSW_GAP)
    return out.select(
        "session_start",
        "session_end",
        "user_id",
        F.col("n_events").cast("bigint").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# win_rolling_median — rolling exact median (robust smoother)
# ---------------------------------------------------------------------------

_MED_HALF = 7  # centered 15-row frame

_ROLLMED_ORACLE = f"""
WITH daily AS (
    SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS day,
           {dsum_sql('o_totalprice', 2)} AS v
    FROM orders GROUP BY 1, 2
)
SELECT o_orderpriority, day,
       {fpq_sql('quantile_cont(v, 0.5) OVER ('
                'PARTITION BY o_orderpriority ORDER BY day '
                f'ROWS BETWEEN {_MED_HALF} PRECEDING '
                f'AND {_MED_HALF} FOLLOWING)', 4)} AS med
FROM daily
"""


@register(
    "win_rolling_median",
    _ROLLMED_ORACLE,
    doc="Rolling exact median over a centered 15-row frame of the "
    "daily order-value series — the robust smoother that, unlike "
    "win_moving_avg, one outlier day cannot drag (the median filter "
    "of signal processing). Spark evaluates percentile() as a window "
    "aggregate over the same ROWS frame DuckDB's quantile_cont uses; "
    "both interpolate the even-count midpoint with the same formula "
    "and the inputs are decimal-exact daily sums, so the 1e-4 "
    "fixed-point quantization only absorbs final-ulp noise. Edge "
    "rows keep their truncated frames (identical on both engines) "
    "rather than being dropped — a smoother that loses its first "
    "week is not a smoother. Runs over the tiny pre-aggregated "
    "daily frame, not the fact table.",
)
def win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        t(spark, sf_dir, "orders")
        .groupBy(
            "o_orderpriority",
            F.to_date("o_orderdate").alias("day"),
        )
        .agg(dsum("o_totalprice", 2).alias("v"))
    )
    frame = (
        Window.partitionBy("o_orderpriority")
        .orderBy("day")
        .rowsBetween(-_MED_HALF, _MED_HALF)
    )
    med = F.expr("percentile(v, 0.5)").over(frame)
    return daily.select(
        "o_orderpriority", "day", fpq(med, 4).alias("med")
    )


# ---------------------------------------------------------------------------
# graph_bfs_distance — bounded-hop BFS from a deterministic source
# ---------------------------------------------------------------------------

_BFS_MAX_HOPS = 4


def _bfs_oracle() -> str:
    from evolution_data_warehouse_spark.queries.extensions_r7 import (
        _EDGES_SQL,
    )

    return f"""
WITH RECURSIVE {_EDGES_SQL},
adj AS (
    SELECT pa AS node, pb AS nbr FROM edges
    UNION ALL
    SELECT pb AS node, pa AS nbr FROM edges
),
reach(node, dist) AS (
    SELECT (SELECT MIN(pa) FROM edges), 0
    UNION
    SELECT a.nbr, r.dist + 1
    FROM reach r JOIN adj a ON a.node = r.node
    WHERE r.dist < {_BFS_MAX_HOPS}
),
best AS (
    SELECT node, CAST(MIN(dist) AS INT) AS dist FROM reach GROUP BY node
)
SELECT dist,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(SUM(node) AS BIGINT) AS sum_node_id
FROM best GROUP BY dist
"""


@register(
    "graph_bfs_distance",
    _bfs_oracle(),
    doc="Bounded-hop BFS: shortest hop distance from a deterministic "
    "source (the minimum node id — pinned BY RULE, not by data "
    "sample, so it is reproducible at any scale) over the "
    "co-purchase graph, reported as a per-distance histogram with an "
    "id-sum checksum — the reachability/radius probe beside "
    "pagerank's centrality and the triangle count's clustering. "
    "Spark side is frontier BFS: 4 rounds of frontier-join-adjacency "
    "with an anti-join against the visited set, each round over the "
    "localCheckpoint-pinned edge list (the iterative-algorithm "
    "pattern shared with graph_pagerank — no lineage growth, no "
    "recomputed edge build). The oracle is a recursive CTE with "
    "UNION (set) semantics so path explosion dedups to (node, dist) "
    "pairs per level. At 100 TB each round is one shuffle join on "
    "the frontier — O(diameter) rounds, never materialized paths.",
)
def graph_bfs_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from evolution_data_warehouse_spark.queries.extensions_r7 import _edges

    e = _edges(spark, sf_dir).select("pa", "pb").localCheckpoint(eager=True)
    adj = e.select(F.col("pa").alias("node"), F.col("pb").alias("nbr")).unionAll(
        e.select(F.col("pb").alias("node"), F.col("pa").alias("nbr"))
    ).localCheckpoint(eager=True)
    src = e.agg(F.min("pa").alias("node")).select(
        "node", F.lit(0).alias("dist")
    )
    visited = src.localCheckpoint(eager=True)
    frontier = visited
    for hop in range(1, _BFS_MAX_HOPS + 1):
        nxt = (
            frontier.join(adj, "node")
            .select(F.col("nbr").alias("node"), F.lit(hop).alias("dist"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .localCheckpoint(eager=True)
        )
        visited = visited.unionAll(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited.groupBy(F.col("dist").cast("int").alias("dist")).agg(
        F.count("*").cast("bigint").alias("n_nodes"),
        F.sum("node").cast("bigint").alias("sum_node_id"),
    )


# ---------------------------------------------------------------------------
# stats_cuped_adjust — CUPED variance reduction for experiment metrics
# ---------------------------------------------------------------------------

_CUPED_SPLIT_DATE = "1999-01-01"

_CUPED_ORACLE = f"""
WITH per_cust AS (
    SELECT o_custkey AS cust,
           {dsum_sql(
               "CASE WHEN CAST(o_orderdate AS DATE)"
               f" < DATE '{_CUPED_SPLIT_DATE}'"
               " THEN o_totalprice ELSE 0 END", 2
           )} AS x,
           {dsum_sql(
               "CASE WHEN CAST(o_orderdate AS DATE)"
               f" >= DATE '{_CUPED_SPLIT_DATE}'"
               " THEN o_totalprice ELSE 0 END", 2
           )} AS y
    FROM orders GROUP BY o_custkey
),
armd AS (
    SELECT cust, x, y, CAST(cust % 2 AS INT) AS arm FROM per_cust
),
s AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           {dsum_sql('x', 6)} AS sx, {dsum_sql('y', 6)} AS sy,
           {dsum_sql('x * x', 6)} AS sxx, {dsum_sql('x * y', 6)} AS sxy,
           CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
           {dsum_sql('CASE WHEN arm = 0 THEN y ELSE 0 END', 6)} AS sy0,
           {dsum_sql('CASE WHEN arm = 0 THEN x ELSE 0 END', 6)} AS sx0,
           CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
           {dsum_sql('CASE WHEN arm = 1 THEN y ELSE 0 END', 6)} AS sy1,
           {dsum_sql('CASE WHEN arm = 1 THEN x ELSE 0 END', 6)} AS sx1
    FROM armd
),
d AS (
    SELECT n, n0, n1,
           CASE WHEN sxx - sx * sx / CAST(n AS DOUBLE) <= 0.0 THEN 0.0
                ELSE (sxy - sx * sy / CAST(n AS DOUBLE))
                     / (sxx - sx * sx / CAST(n AS DOUBLE)) END AS theta,
           sx / CAST(n AS DOUBLE) AS mx,
           sy0 / CAST(n0 AS DOUBLE) AS my0,
           sx0 / CAST(n0 AS DOUBLE) AS mx0,
           sy1 / CAST(n1 AS DOUBLE) AS my1,
           sx1 / CAST(n1 AS DOUBLE) AS mx1
    FROM s
)
SELECT n0, n1,
       {fpq_sql('theta', 8)} AS theta,
       {fpq_sql('my1 - my0', 4)} AS lift_raw,
       {fpq_sql(
           '(my1 - theta * (mx1 - mx)) - (my0 - theta * (mx0 - mx))', 4
       )} AS lift_cuped
FROM d
"""


@register(
    "stats_cuped_adjust",
    _CUPED_ORACLE,
    doc="CUPED-adjusted experiment lift (Deng et al. 2013, WSDM: "
    "Improving the Sensitivity of Online Controlled Experiments): "
    "pre-period spend is the covariate, theta = cov(x,y)/var(x) "
    "pooled over all units, and each arm's metric mean is adjusted "
    "by -theta*(mean_x_arm - mean_x) — the variance-reduction "
    "preprocessing every experimentation platform applies before "
    "stats_ab_test-style inference. Arms are custkey parity (the "
    "same deterministic assignment convention as stats_ab_test). "
    "Everything reduces in ONE aggregate row: per-unit pre/post "
    "sums via one group-by on customer, then conditional "
    "decimal-exact moment sums — no scalar broadcast, no second "
    "pass; theta and both lifts are identical double expression "
    "shapes quantized fixed-point. Two linear shuffles total "
    "(customer rollup, then the 1-row reduce).",
)
def stats_cuped_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = F.to_date("o_orderdate")
    split = F.lit(_CUPED_SPLIT_DATE).cast("date")
    per_cust = (
        t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("cust"))
        .agg(
            dsum(
                F.when(d < split, F.col("o_totalprice")).otherwise(0.0), 2
            ).alias("x"),
            dsum(
                F.when(d >= split, F.col("o_totalprice")).otherwise(0.0), 2
            ).alias("y"),
        )
    )
    armd = per_cust.withColumn("arm", (F.col("cust") % 2).cast("int"))
    x, y, arm = F.col("x"), F.col("y"), F.col("arm")
    s = armd.agg(
        F.count("*").cast("bigint").alias("n"),
        dsum(x, 6).alias("sx"),
        dsum(y, 6).alias("sy"),
        dsum(x * x, 6).alias("sxx"),
        dsum(x * y, 6).alias("sxy"),
        F.sum(F.when(arm == 0, 1).otherwise(0)).cast("bigint").alias("n0"),
        dsum(F.when(arm == 0, y).otherwise(0.0), 6).alias("sy0"),
        dsum(F.when(arm == 0, x).otherwise(0.0), 6).alias("sx0"),
        F.sum(F.when(arm == 1, 1).otherwise(0)).cast("bigint").alias("n1"),
        dsum(F.when(arm == 1, y).otherwise(0.0), 6).alias("sy1"),
        dsum(F.when(arm == 1, x).otherwise(0.0), 6).alias("sx1"),
    )
    n_d = F.col("n").cast("double")
    # degenerate-covariate guard: zero pre-period variance would make
    # theta NaN/inf with engine-dependent fixed-point behavior — CUPED
    # with a constant covariate is a no-op, so theta = 0 is the right
    # answer, not an error
    var_x = F.col("sxx") - F.col("sx") * F.col("sx") / n_d
    theta = F.when(var_x <= 0.0, F.lit(0.0)).otherwise(
        (F.col("sxy") - F.col("sx") * F.col("sy") / n_d) / var_x
    )
    dd = s.select(
        "n", "n0", "n1",
        theta.alias("theta"),
        (F.col("sx") / n_d).alias("mx"),
        (F.col("sy0") / F.col("n0").cast("double")).alias("my0"),
        (F.col("sx0") / F.col("n0").cast("double")).alias("mx0"),
        (F.col("sy1") / F.col("n1").cast("double")).alias("my1"),
        (F.col("sx1") / F.col("n1").cast("double")).alias("mx1"),
    )
    lift_raw = F.col("my1") - F.col("my0")
    lift_cuped = (
        F.col("my1") - F.col("theta") * (F.col("mx1") - F.col("mx"))
    ) - (F.col("my0") - F.col("theta") * (F.col("mx0") - F.col("mx")))
    return dd.select(
        "n0", "n1",
        fpq(F.col("theta"), 8).alias("theta"),
        fpq(lift_raw, 4).alias("lift_raw"),
        fpq(lift_cuped, 4).alias("lift_cuped"),
    )


# ---------------------------------------------------------------------------
# src_python_datasource — custom Python DataSource (Spark 4 API)
# ---------------------------------------------------------------------------

_SYNTH_N = 100_000
_SYNTH_PARTS = 8


def _pyds_oracle() -> str:
    from evolution_data_warehouse_spark.sources.pydatasource import (
        SYNTH_MOD,
        SYNTH_MULT,
    )

    return f"""
WITH rows AS (
    SELECT g AS row_id,
           CAST(g % {_SYNTH_PARTS} AS INT) AS part_id,
           (g * {SYNTH_MULT}) % {SYNTH_MOD} AS val
    FROM generate_series(0, {_SYNTH_N - 1}) t(g)
)
SELECT part_id,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(val) AS BIGINT) AS sum_val,
       CAST(MIN(row_id) AS BIGINT) AS min_row,
       CAST(MAX(row_id) AS BIGINT) AS max_row,
       CAST(SUM((row_id * val) % {SYNTH_MOD}) AS BIGINT) AS mix_checksum
FROM rows GROUP BY part_id
"""


@register(
    "src_python_datasource",
    _pyds_oracle(),
    doc="Custom Python DataSource via Spark 4's official "
    "pyspark.sql.datasource extension API (sources/pydatasource.py) — "
    "the sanctioned way to teach Spark a source only Python can read "
    "(bespoke feeds, internal formats), superseding driver-side "
    "collect-then-parallelize loaders. The source PLANS one "
    "InputPartition per round-robin slice and each task generates "
    "only its own rows, so the scan parallelizes like a file source "
    "(no driver data path); the per-partition min/max/count/checksum "
    "aggregate only matches the oracle's generate_series replay if "
    "every partition produced exactly its slice — a partition-"
    "planning bug (dup/missing/shifted slice) breaks min_row/"
    "max_row/mix_checksum. Row values are int64 Knuth-hash "
    "arithmetic kept below 2^63 (both engines exact).",
)
def src_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    from evolution_data_warehouse_spark.sources.pydatasource import (
        SYNTH_MOD,
        register_synth_source,
    )

    register_synth_source(spark)
    df = (
        spark.read.format("synthrange")
        .option("n", _SYNTH_N)
        .option("parts", _SYNTH_PARTS)
        .load()
    )
    return df.groupBy("part_id").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum("val").cast("bigint").alias("sum_val"),
        F.min("row_id").cast("bigint").alias("min_row"),
        F.max("row_id").cast("bigint").alias("max_row"),
        F.sum((F.col("row_id") * F.col("val")) % SYNTH_MOD)
        .cast("bigint")
        .alias("mix_checksum"),
    )


# ---------------------------------------------------------------------------
# udtf_sentence_stats — genuine Python UDTF (Spark 4 functions.udtf API)
# ---------------------------------------------------------------------------

_SENT_UDTF_ORACLE = """
WITH s AS (
    SELECT doc_id, str_split(COALESCE(text, ''), '. ') AS sents
    FROM documents
)
SELECT doc_id,
       CAST(i - 1 AS INT) AS sent_idx,
       CAST(len(str_split(sents[i], ' ')) AS INT) AS n_tokens,
       CAST(strlen(sents[i]) AS INT) AS n_chars
FROM s, unnest(generate_series(1, len(sents))) t(i)
"""


@register(
    "udtf_sentence_stats",
    _SENT_UDTF_ORACLE,
    doc="Genuine Python UDTF via Spark 4's functions.udtf API (the "
    "table-function extension point, complementing udtf_rls_"
    "predicate's DataFrame-composed form): each document LATERAL-"
    "expands into per-sentence rows with token and byte counts. "
    "Declared with useArrow=True so the plan node is "
    "ArrowEvalPythonUDTF (Arrow-batched — the row-at-a-time "
    "BatchEvalPython serde path stays banned, and "
    "tests/test_plan_invariants.py would catch a silent fallback "
    "because 'BatchEvalPythonUDTF' contains the banned substring). "
    "Byte counts use len(utf-8 bytes) to mirror DuckDB's strlen "
    "exactly — char counts would silently diverge on multibyte "
    "text. Splitting is a pure per-row expansion: zero shuffle, "
    "linear at any scale.",
)
def udtf_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(
        returnType="sent_idx int, n_tokens int, n_chars int",
        useArrow=True,
    )
    class SentStats:
        def eval(self, text: str):  # noqa: ANN001 - UDTF contract
            for i, s in enumerate((text or "").split(". ")):
                yield i, len(s.split(" ")), len(s.encode("utf-8"))

    spark.udtf.register("sent_stats", SentStats)
    t(spark, sf_dir, "documents").createOrReplaceTempView(
        "udtf_sentence_docs"
    )
    return spark.sql(
        "SELECT doc_id, s.sent_idx, s.n_tokens, s.n_chars "
        "FROM udtf_sentence_docs, LATERAL sent_stats(text) s"
    )


# ---------------------------------------------------------------------------
# snk_python_datasource — custom Python DataSource WRITER (2-phase commit)
# ---------------------------------------------------------------------------

_PYSNK_ORACLE = """
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
FROM documents GROUP BY lang
"""


@register(
    "snk_python_datasource",
    _PYSNK_ORACLE,
    doc="Custom Python DataSource WRITER via Spark 4's "
    "pyspark.sql.datasource API (sources/pydatasource.py JsonlSink) — "
    "the sink-side twin of src_python_datasource, demonstrating the "
    "API's TWO-PHASE COMMIT protocol: every task publishes a "
    "uniquely-named file via tmp + atomic rename and returns a "
    "commit message; only the driver-side commit() writes the "
    "manifest that makes work visible. The query re-reads ONLY the "
    "manifest-listed files (uncommitted or retried-task orphans are "
    "invisible by construction — the exactly-once story object "
    "stores need) and aggregates per language; the totals only "
    "match the oracle if no task output was lost or double-counted. "
    "Scale: tasks write independently, commit is O(tasks) metadata "
    "— the same shape as a Hadoop commit protocol.",
)
def snk_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil

    from pyspark.sql import types as T

    from evolution_data_warehouse_spark.queries.relational import _scratch
    from evolution_data_warehouse_spark.sources.pydatasource import (
        read_manifest,
        register_jsonl_sink,
    )

    register_jsonl_sink(spark)
    base = _scratch("snk_python_datasource", sf_dir)
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base, exist_ok=True)
    docs = t(spark, sf_dir, "documents").select("doc_id", "lang")
    (
        docs.repartition(8, "doc_id")
        .write.format("jsonlsink")
        .option("path", base)
        .mode("append")
        .save()
    )
    manifest = read_manifest(base)
    files = [os.path.join(base, f) for f in manifest["files"]]
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    if not files:  # empty input relation → manifest lists zero files
        back = spark.createDataFrame([], schema)
    else:
        back = spark.read.schema(schema).json(files)
    return back.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("doc_id").cast("bigint").alias("sum_doc_id"),
    )


# ---------------------------------------------------------------------------
# fn_variant_extract — Spark 4 VARIANT semi-structured type
# ---------------------------------------------------------------------------

_VARIANT_ORACLE = """
WITH j AS (
    SELECT event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       CAST(MIN(k) AS BIGINT) AS min_k,
       CAST(MAX(k) AS BIGINT) AS max_k
FROM j GROUP BY event_type
"""


@register(
    "fn_variant_extract",
    _VARIANT_ORACLE,
    doc="Semi-structured access through Spark 4's VARIANT type: "
    "props parses ONCE into the binary variant encoding "
    "(parse_json), then typed path extraction via variant_get — the "
    "shred-on-read path that replaces per-access JSON string "
    "re-parsing (at 100 TB, parsing each JSON blob once and reading "
    "binary-encoded paths after is the difference between one scan "
    "and one scan per accessed field; VARIANT is also the Parquet "
    "shredding story going forward). The oracle reads the same "
    "values through DuckDB's JSON extraction, so the entry proves "
    "the variant round-trip is value-exact. One hash aggregate per "
    "event type; integer aggregates only.",
)
def fn_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select("event_type", "props")
    v = ev.select(
        "event_type",
        F.expr("variant_get(parse_json(props), '$.k', 'bigint')").alias("k"),
    )
    return v.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sum("k").cast("bigint").alias("sum_k"),
        F.min("k").cast("bigint").alias("min_k"),
        F.max("k").cast("bigint").alias("max_k"),
    )


# ---------------------------------------------------------------------------
# ts_interpolate_linear — gap-filling by linear interpolation
# ---------------------------------------------------------------------------

_INTERP_ORACLE = f"""
WITH daily AS (
    SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS day,
           {dsum_sql('o_totalprice', 2)} AS v
    FROM orders GROUP BY 1, 2
),
bounds AS (
    SELECT o_orderpriority, MIN(day) AS d0, MAX(day) AS d1
    FROM daily GROUP BY o_orderpriority
),
spine AS (
    SELECT b.o_orderpriority,
           unnest(generate_series(b.d0, b.d1, INTERVAL 1 DAY))::DATE AS day
    FROM bounds b
),
joined AS (
    SELECT s.o_orderpriority, s.day, d.v FROM spine s
    LEFT JOIN daily d
      ON d.o_orderpriority = s.o_orderpriority AND d.day = s.day
),
bracketed AS (
    SELECT o_orderpriority, day, v,
           last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
               OVER w_prev AS prev_day,
           last_value(v IGNORE NULLS) OVER w_prev AS prev_v,
           first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
               OVER w_next AS next_day,
           first_value(v IGNORE NULLS) OVER w_next AS next_v
    FROM joined
    WINDOW w_prev AS (
        PARTITION BY o_orderpriority ORDER BY day
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ),
    w_next AS (
        PARTITION BY o_orderpriority ORDER BY day
        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
    )
)
SELECT o_orderpriority, day,
       CAST(CASE WHEN v IS NOT NULL THEN 0 ELSE 1 END AS INT) AS filled,
       {fpq_sql(
           "CASE WHEN v IS NOT NULL THEN v"
           " ELSE prev_v + (next_v - prev_v)"
           " * (CAST(day - prev_day AS DOUBLE)"
           "    / CAST(next_day - prev_day AS DOUBLE)) END", 4
       )} AS v_interp
FROM bracketed
"""


@register(
    "ts_interpolate_linear",
    _INTERP_ORACLE,
    doc="Gap-filling by LINEAR interpolation over the per-priority "
    "date spine — the upgrade over win_fill_forward's LOCF when the "
    "series is a level, not an event count (a 3-day gap fills with "
    "the trend line, not a plateau). Spine rows missing a value take "
    "prev + (next - prev) * elapsed/gap_span from the bracketing "
    "observations (last_value/first_value IGNORE NULLS over "
    "mirror-image frames); day arithmetic is exact integer date "
    "subtraction, the one division is an identical double shape "
    "quantized at 1e-4, and edge rows (first/last days are always "
    "observed per bounds construction) need no extrapolation branch. "
    "Scale: the spine is O(days x priorities) — built by generator, "
    "joined once against the pre-aggregated daily frame.",
)
def ts_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        t(spark, sf_dir, "orders")
        .groupBy(
            "o_orderpriority",
            F.to_date("o_orderdate").alias("day"),
        )
        .agg(dsum("o_totalprice", 2).alias("v"))
    )
    bounds = daily.groupBy("o_orderpriority").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = bounds.select(
        "o_orderpriority",
        F.explode(
            F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    joined = spine.join(daily, ["o_orderpriority", "day"], "left")
    w_prev = (
        Window.partitionBy("o_orderpriority")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy("o_orderpriority")
        .orderBy("day")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("v").isNotNull(), F.col("day"))
    b = joined.select(
        "o_orderpriority",
        "day",
        "v",
        F.last(obs_day, ignorenulls=True).over(w_prev).alias("prev_day"),
        F.last("v", ignorenulls=True).over(w_prev).alias("prev_v"),
        F.first(obs_day, ignorenulls=True).over(w_next).alias("next_day"),
        F.first("v", ignorenulls=True).over(w_next).alias("next_v"),
    )
    interp = F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * (
        F.datediff(F.col("day"), F.col("prev_day")).cast("double")
        / F.datediff(F.col("next_day"), F.col("prev_day")).cast("double")
    )
    return b.select(
        "o_orderpriority",
        "day",
        F.when(F.col("v").isNotNull(), 0)
        .otherwise(1)
        .cast("int")
        .alias("filled"),
        fpq(
            F.when(F.col("v").isNotNull(), F.col("v")).otherwise(interp), 4
        ).alias("v_interp"),
    )


# ---------------------------------------------------------------------------
# join_lateral_topk — correlated LATERAL subquery join
# ---------------------------------------------------------------------------

_LATERAL_ORACLE = """
SELECT n.n_name, c.c_custkey, c.c_acctbal
FROM nation n,
LATERAL (
    SELECT c_custkey, c_acctbal
    FROM customer
    WHERE c_nationkey = n.n_nationkey
    ORDER BY c_acctbal DESC, c_custkey
    LIMIT 3
) c
"""


@register(
    "join_lateral_topk",
    _LATERAL_ORACLE,
    doc="Correlated LATERAL join: top-3 customers by balance FOR EACH "
    "nation, written as the SQL-standard LATERAL subquery (the "
    "operator form users port from Postgres/DuckDB) rather than the "
    "window-function idiom win_topn_recent uses — this entry proves "
    "the engine accepts the declarative form AND that Catalyst "
    "decorrelates it into the same shuffle-join + per-group-limit "
    "plan instead of executing one subquery per outer row (the "
    "naive O(outer x inner) evaluation). Fully tie-broken by "
    "(balance DESC, custkey). At scale the decorrelated plan is one "
    "hash join + WindowGroupLimit — never a re-scan per nation.",
)
def join_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    t(spark, sf_dir, "nation").createOrReplaceTempView("lat_nation")
    t(spark, sf_dir, "customer").createOrReplaceTempView("lat_customer")
    return spark.sql(
        """
        SELECT n.n_name, c.c_custkey, c.c_acctbal
        FROM lat_nation n,
        LATERAL (
            SELECT c_custkey, c_acctbal
            FROM lat_customer
            WHERE c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_custkey
            LIMIT 3
        ) c
        """
    )


# ---------------------------------------------------------------------------
# pii_pseudonymize_join — deterministic pseudonymization, joinability kept
# ---------------------------------------------------------------------------

_PSEUDO_SALT = "pseudo-v1:"


def _pseudo_sql(expr: str) -> str:
    return f"md5('{_PSEUDO_SALT}' || CAST({expr} AS VARCHAR))"


_PSEUDO_ORACLE = f"""
WITH c AS (
    SELECT {_pseudo_sql('c_custkey')} AS cust_token, c_nationkey
    FROM customer
),
o AS (
    SELECT {_pseudo_sql('o_custkey')} AS cust_token, o_totalprice
    FROM orders
)
SELECT n.n_name,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COUNT(DISTINCT o.cust_token) AS BIGINT) AS n_customers,
       {dsum_sql('o.o_totalprice', 2)} AS revenue
FROM o
JOIN c ON c.cust_token = o.cust_token
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY n.n_name
"""


@register(
    "pii_pseudonymize_join",
    _PSEUDO_ORACLE,
    doc="Deterministic pseudonymization that PRESERVES joinability — "
    "the privacy-layer primitive beside pii_scan_report's detection "
    "and text_redact's masking: customer keys are replaced on BOTH "
    "fact and dimension sides by a salted md5 token (the salt is "
    "versioned so a token vault rotation is a recompute, and raw "
    "keys never appear downstream), then the revenue-by-nation "
    "rollup runs ENTIRELY in token space. The aggregate equals the "
    "raw-key join's answer by construction (the token map is "
    "injective), which is exactly what the oracle verifies — a "
    "collision or a salt mismatch between the two sides would break "
    "counts. Plan: same star join shape as the raw query (hash join "
    "on the token, broadcast nation); pseudonymization is a "
    "scan-level projection, zero extra passes.",
)
def pii_pseudonymize_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    def token(col: str):
        return F.md5(
            F.concat(F.lit(_PSEUDO_SALT), F.col(col).cast("string"))
        )

    c = t(spark, sf_dir, "customer").select(
        token("c_custkey").alias("cust_token"), "c_nationkey"
    )
    o = t(spark, sf_dir, "orders").select(
        token("o_custkey").alias("cust_token"), "o_totalprice"
    )
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        o.join(c, "cust_token")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.countDistinct("cust_token")
            .cast("bigint")
            .alias("n_customers"),
            dsum("o_totalprice", 2).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# dedup_minhash_recall_eval — LSH recall against exact Jaccard ground truth
# ---------------------------------------------------------------------------

_RECALL_EXACT_FP = 800_000  # ground truth: exact Jaccard >= 0.8
_RECALL_FP = 1_000_000


def _recall_oracle() -> str:
    from evolution_data_warehouse_spark.operators.dedup import (
        DEFAULT_MAX_BUCKET,
        DEFAULT_MAX_SHINGLE_DF,
    )
    from evolution_data_warehouse_spark.queries.llm_ops import (
        _SHINGLES_SQL,
        _mh_sql_fragments,
    )

    f = _mh_sql_fragments()
    return f"""
WITH sh0 AS ({_SHINGLES_SQL}),
shu AS (SELECT doc_id,
              CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT)
                  AS shingle_h
       FROM sh0),
shc AS (SELECT doc_id, shingle_h FROM shu
        QUALIFY COUNT(*) OVER (PARTITION BY shingle_h)
                <= {DEFAULT_MAX_SHINGLE_DF}),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shc GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
    FROM shc a JOIN shc b
      ON a.shingle_h = b.shingle_h AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
),
exact AS (
    SELECT doc_a, doc_b FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE (n_common * {_RECALL_FP}) // (sa.n_sh + sb.n_sh - n_common)
          >= {_RECALL_EXACT_FP}
),
sh AS ({_SHINGLES_SQL}),
h AS (SELECT doc_id, {f["hm"]} AS hm FROM sh),
mh AS (SELECT doc_id, {f["mh_cols"]} FROM h GROUP BY doc_id),
bands_raw AS ({f["bands"]}),
bands AS (
    SELECT doc_id, band, band_key FROM (
        SELECT doc_id, band, band_key,
               COUNT(*) OVER (PARTITION BY band, band_key) AS bucket_n
        FROM bands_raw
    ) WHERE bucket_n <= {DEFAULT_MAX_BUCKET}
),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_key = b.band_key
     AND a.doc_id < b.doc_id
),
hit AS (
    SELECT e.doc_a, e.doc_b FROM exact e
    JOIN cand c ON c.doc_a = e.doc_a AND c.doc_b = e.doc_b
)
SELECT CAST((SELECT COUNT(*) FROM exact) AS BIGINT) AS n_exact,
       CAST((SELECT COUNT(*) FROM cand) AS BIGINT) AS n_candidates,
       CAST((SELECT COUNT(*) FROM hit) AS BIGINT) AS n_hit,
       CAST(CASE WHEN (SELECT COUNT(*) FROM exact) = 0
            THEN {_RECALL_FP}
            ELSE ((SELECT COUNT(*) FROM hit) * {_RECALL_FP})
                 // (SELECT COUNT(*) FROM exact) END AS BIGINT)
           AS recall_fp
"""


@register(
    "dedup_minhash_recall_eval",
    _recall_oracle(),
    doc="LSH recall evaluation: what fraction of TRUE near-dup pairs "
    "(exact n-gram Jaccard >= 0.8 over the df-capped shingle "
    "relation) does the banded MinHash candidate generation actually "
    "surface? The index-quality metric a pipeline owner checks "
    "before trusting dedup_minhash_lsh's parameters (16 hashes, 4x4 "
    "bands => ~98.6% theoretical recall at j=0.9, ~67% at j=0.7 — "
    "this entry measures the REAL number on the real corpus, the "
    "companion to dedup_threshold_sweep's threshold calibration). "
    "Both legs reuse the exact shared machinery of their parent "
    "queries (one source of truth for shingles, coefficients, band "
    "keys, and both hot-key guards); recall is integer fixed-point "
    "with the vacuous zero-truth case pinned to 1e6. Scale: the two "
    "pair relations are each guarded-linear; the hit join is "
    "pair-keyed.",
)
def dedup_minhash_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from evolution_data_warehouse_spark.operators.dedup import (
        DEFAULT_MAX_BUCKET,
        cap_lsh_buckets,
        cap_shingle_df,
        lsh_bands,
        materialize_bands,
        minhash_signature,
    )
    from evolution_data_warehouse_spark.queries.llm_ops import _doc_shingles

    shingled = _doc_shingles(spark, sf_dir).localCheckpoint(eager=True)
    shc = cap_shingle_df(
        shingled.select(
            "doc_id", content_hash64(F.col("shingle")).alias("shingle_h")
        )
    ).localCheckpoint(eager=True)
    sizes = shc.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a, b = shc.alias("a"), shc.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle_h") == F.col("b.shingle_h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count("*").alias("n_common"))
    )
    exact = (
        inter.join(
            sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed(
                "n_sh", "na"
            ),
            "doc_a",
        )
        .join(
            sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
                "n_sh", "nb"
            ),
            "doc_b",
        )
        .filter(
            F.expr(
                f"(n_common * {_RECALL_FP}) DIV (na + nb - n_common)"
                f" >= {_RECALL_EXACT_FP}"
            )
        )
        .select("doc_a", "doc_b")
        # pinned: n_exact and the hit join both consume this relation —
        # without the checkpoint each of the three counts below would
        # recompute the full pair self-join (measured 112 s -> see
        # SCALE.md before/after)
        .localCheckpoint(eager=True)
    )
    # candidate PAIRS only — minhash_lsh_pairs also joins signatures
    # back for est_jaccard, two joins recall never reads; building the
    # band self-join directly keeps this leg pairs-only
    sig = minhash_signature(shingled)
    # materialized once: AQE does not stage-reuse the guarded band
    # subtree across the self-join's two sides, so without this both
    # sides recompute the signature aggregate + band expansion + guard
    # window (see operators.dedup.materialize_bands).
    bands = materialize_bands(
        cap_lsh_buckets(lsh_bands(sig), DEFAULT_MAX_BUCKET)
    )
    ba, bb = bands.alias("a"), bands.alias("b")
    cand = (
        ba.join(
            bb,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    hit = exact.join(cand, ["doc_a", "doc_b"])
    n_exact = exact.count()
    n_cand = cand.count()
    n_hit = hit.count()
    recall = (
        _RECALL_FP if n_exact == 0 else (n_hit * _RECALL_FP) // n_exact
    )
    return spark.createDataFrame(
        [(n_exact, n_cand, n_hit, recall)],
        "n_exact bigint, n_candidates bigint, n_hit bigint, recall_fp bigint",
    )


# ---------------------------------------------------------------------------
# join_bucketed_noshuffle — bucketed tables join without an Exchange
# ---------------------------------------------------------------------------

_BUCKETS = 8

_BUCKETED_ORACLE = f"""
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       {dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderpriority
"""


@register(
    "join_bucketed_noshuffle",
    _BUCKETED_ORACLE,
    doc="Bucketed-table co-located join: both fact tables are "
    "persisted bucketBy(8, orderkey) + sortBy (operators/skew.py "
    "write_bucketed), so the orders-lineitem equi-join runs WITHOUT "
    "a shuffle Exchange on either side — the storage-layout move "
    "that, at 100 TB, converts every repeated join on the warehouse's "
    "hottest key from a full network shuffle into a local merge. The "
    "query ASSERTS the property at run time (plan_has_exchange must "
    "be False on the join subplan — a regression fails loudly rather "
    "than silently re-shuffling) and then proves value-correctness "
    "via the revenue rollup against the oracle's plain join. The "
    "only Exchange left in the whole plan is the final 5-group "
    "rollup's.",
)
def join_bucketed_noshuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from evolution_data_warehouse_spark.operators.skew import (
        plan_has_exchange,
        write_bucketed,
    )
    from evolution_data_warehouse_spark.queries.relational import _scratch

    base = _scratch("join_bucketed_noshuffle", sf_dir)
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    write_bucketed(
        li, "r11b_bucketed_lineitem", "l_orderkey", _BUCKETS, f"{base}/li"
    )
    write_bucketed(
        orders, "r11b_bucketed_orders", "o_orderkey", _BUCKETS, f"{base}/o"
    )
    bl = spark.table("r11b_bucketed_lineitem")
    bo = spark.table("r11b_bucketed_orders")
    joined = bl.join(bo, bl.l_orderkey == bo.o_orderkey)
    if plan_has_exchange(joined):
        raise AssertionError(
            "bucketed join plan regressed: shuffle Exchange present"
        )
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n_lines"),
        dsum(rev, 4).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# ts_forecast_snaive_error — seasonal-naive backtest error profile
# ---------------------------------------------------------------------------

_SNAIVE_LAG = 7
_SNAIVE_FP = 1_000_000

_SNAIVE_ORACLE = f"""
WITH daily AS (
    SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS day,
           {dsum_sql('o_totalprice', 2)} AS v
    FROM orders GROUP BY 1, 2
),
f AS (
    SELECT cur.o_orderpriority, cur.day, cur.v, prev.v AS yhat
    FROM daily cur
    JOIN daily prev
      ON prev.o_orderpriority = cur.o_orderpriority
     AND prev.day = cur.day - {_SNAIVE_LAG}
),
e AS (
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           {dsum_sql('abs(v - yhat)', 4)} AS sum_abs_err,
           {dsum_sql('v', 4)} AS sum_actual
    FROM f GROUP BY o_orderpriority
)
SELECT o_orderpriority, n_points,
       {fpq_sql('sum_abs_err', 4)} AS sum_abs_err,
       CAST(CASE WHEN sum_actual <= 0.0 THEN 0
            ELSE CAST(floor(sum_abs_err * {_SNAIVE_FP} / sum_actual)
                 AS BIGINT) END AS BIGINT) AS wape_fp
FROM e
"""


@register(
    "ts_forecast_snaive_error",
    _SNAIVE_ORACLE,
    doc="Seasonal-naive forecast backtest: yhat(t) = v(t-7) (the "
    "same-weekday-last-week baseline every demand forecast must "
    "beat), scored as WAPE = sum|err|/sum(actual) per priority — the "
    "error yardstick that tells a team whether their model earns its "
    "complexity. The join is an exact calendar self-join on (key, "
    "day-7) over the pre-aggregated daily frame (the ts_autocorr "
    "shape); error sums are decimal-exact; WAPE is floor fixed-point "
    "with the degenerate zero-actual case pinned to 0. Days with no "
    "week-ago observation drop out of the backtest on both engines "
    "identically (inner join).",
)
def ts_forecast_snaive_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        t(spark, sf_dir, "orders")
        .groupBy(
            "o_orderpriority",
            F.to_date("o_orderdate").alias("day"),
        )
        .agg(dsum("o_totalprice", 2).alias("v"))
    )
    cur, prev = daily.alias("cur"), daily.alias("prev")
    f = cur.join(
        prev,
        (F.col("prev.o_orderpriority") == F.col("cur.o_orderpriority"))
        & (
            F.col("prev.day")
            == F.date_sub(F.col("cur.day"), _SNAIVE_LAG)
        ),
    ).select(
        F.col("cur.o_orderpriority").alias("o_orderpriority"),
        F.col("cur.v").alias("v"),
        F.col("prev.v").alias("yhat"),
    )
    e = f.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n_points"),
        dsum(F.abs(F.col("v") - F.col("yhat")), 4).alias("sum_abs_err"),
        dsum("v", 4).alias("sum_actual"),
    )
    wape = F.when(F.col("sum_actual") <= 0.0, F.lit(0)).otherwise(
        F.floor(
            F.col("sum_abs_err") * F.lit(float(_SNAIVE_FP))
            / F.col("sum_actual")
        ).cast("bigint")
    )
    return e.select(
        "o_orderpriority",
        "n_points",
        fpq(F.col("sum_abs_err"), 4).alias("sum_abs_err"),
        wape.cast("bigint").alias("wape_fp"),
    )


# ---------------------------------------------------------------------------
# win_winsorized_mean — robust mean via p5/p95 clamping
# ---------------------------------------------------------------------------

_WINSOR_LO = 0.05
_WINSOR_HI = 0.95

_WINSOR_ORACLE = f"""
WITH lim AS (
    SELECT c_mktsegment,
           {fpq_sql(f'quantile_cont(c_acctbal, {_WINSOR_LO})', 6)} AS lo,
           {fpq_sql(f'quantile_cont(c_acctbal, {_WINSOR_HI})', 6)} AS hi
    FROM customer GROUP BY c_mktsegment
),
w AS (
    SELECT c.c_mktsegment,
           greatest(l.lo, least(l.hi, c.c_acctbal)) AS clamped,
           CASE WHEN c.c_acctbal < l.lo OR c.c_acctbal > l.hi
                THEN 1 ELSE 0 END AS clipped
    FROM customer c JOIN lim l ON l.c_mktsegment = c.c_mktsegment
)
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(clipped) AS BIGINT) AS n_clipped,
       {fpq_sql(davg_sql('clamped', 6), 6)} AS winsorized_mean
FROM w GROUP BY c_mktsegment
"""


@register(
    "win_winsorized_mean",
    _WINSOR_ORACLE,
    doc="Winsorized mean per market segment: balances clamp to the "
    "segment's quantized [p5, p95] before averaging — the robust "
    "location estimate that, unlike a trimmed mean, keeps n constant "
    "(every row still votes, outliers just vote at the fence). The "
    "percentile fences are interpolated then FIXED-POINT QUANTIZED "
    "(fpq at 1e-6) BEFORE the clamp on both engines, so a final-ulp "
    "difference in the interpolation can never flip a borderline "
    "row's clamp decision — the same pin every fpq-threshold query "
    "uses; the clamped average is a decimal-exact davg. Plan: one "
    "per-segment percentile aggregate joined back (broadcast — "
    "segment cardinality), one scan with map-side-combined moments.",
)
def win_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer").select("c_mktsegment", "c_acctbal")
    lim = cust.groupBy("c_mktsegment").agg(
        fpq(F.expr(f"percentile(c_acctbal, {_WINSOR_LO})"), 6).alias("lo"),
        fpq(F.expr(f"percentile(c_acctbal, {_WINSOR_HI})"), 6).alias("hi"),
    )
    w = cust.join(F.broadcast(lim), "c_mktsegment").select(
        "c_mktsegment",
        F.greatest(
            F.col("lo"), F.least(F.col("hi"), F.col("c_acctbal"))
        ).alias("clamped"),
        F.when(
            (F.col("c_acctbal") < F.col("lo"))
            | (F.col("c_acctbal") > F.col("hi")),
            1,
        )
        .otherwise(0)
        .alias("clipped"),
    )
    from evolution_data_warehouse_spark.queries.common import davg

    return w.groupBy("c_mktsegment").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("clipped").cast("bigint").alias("n_clipped"),
        fpq(davg("clamped", 6), 6).alias("winsorized_mean"),
    )


# ---------------------------------------------------------------------------
# text_code_detect — code-vs-prose routing gate
# ---------------------------------------------------------------------------

# Fixed-point thresholds (per mille): a doc routes to 'code' when its
# symbol density or its braces/semicolon density crosses the fence, or
# when a keyword hits. All ratios are integer cross-multiplications.
_CODE_SYM_PM = 60  # >6% of chars in {}();=<>[] => code-like
_CODE_KW = ("def ", "return ", "import ", "function ", "var ", "class ")


def _code_oracle() -> str:
    kw = " OR ".join(
        f"contains(lower(body), '{k}')" for k in _CODE_KW
    )
    return f"""
WITH d AS (
    SELECT doc_id, source, COALESCE(text, '') AS body FROM documents
),
m AS (
    SELECT doc_id, source,
           strlen(body) AS n_bytes,
           strlen(body) - strlen(
               regexp_replace(body, '[{{}}();=<>\\[\\]]', '', 'g')
           ) AS n_sym,
           CASE WHEN {kw} THEN 1 ELSE 0 END AS has_kw
    FROM d
),
flagged AS (
    SELECT doc_id, source,
           CASE WHEN n_bytes > 0
                 AND (n_sym * 1000 >= {_CODE_SYM_PM} * n_bytes
                      OR has_kw = 1)
           THEN 1 ELSE 0 END AS is_code
    FROM m
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(is_code) AS BIGINT) AS n_code,
       CAST(SUM(CASE WHEN is_code = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_prose
FROM flagged GROUP BY source
"""


@register(
    "text_code_detect",
    _code_oracle(),
    doc="Code-vs-prose routing gate per source — the pretraining "
    "router that decides which quality stack a document enters "
    "(Gopher/C4 rules make no sense on source code; code corpora get "
    "their own dedup and quality path). Signals: symbol-character "
    "density via a regexp strip-and-measure (byte counts, integer "
    "cross-multiplied against a per-mille fence — no float ratio) "
    "OR a pinned keyword hit; thresholds are literals so the gate is "
    "identical at any scale. One shuffle-free scan + a per-source "
    "rollup.",
)
def text_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    body = F.coalesce(F.col("text"), F.lit(""))
    n_bytes = F.octet_length(body)
    n_sym = n_bytes - F.octet_length(
        F.regexp_replace(body, r"[{}();=<>\[\]]", "")
    )
    has_kw = None
    lower = F.lower(body)
    for k in _CODE_KW:
        cond = F.contains(lower, F.lit(k))
        has_kw = cond if has_kw is None else (has_kw | cond)
    is_code = F.when(
        (n_bytes > 0)
        & (
            (n_sym * 1000 >= F.lit(_CODE_SYM_PM) * n_bytes)
            | has_kw
        ),
        1,
    ).otherwise(0)
    return (
        t(spark, sf_dir, "documents")
        .select("source", is_code.alias("is_code"))
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("is_code").cast("bigint").alias("n_code"),
            F.sum(F.lit(1) - F.col("is_code"))
            .cast("bigint")
            .alias("n_prose"),
        )
    )


# ---------------------------------------------------------------------------
# sim_ann_recall_eval — IVF recall against the exact top-k ground truth
# ---------------------------------------------------------------------------

_ANN_RECALL_FP = 1_000_000


def _ann_recall_oracle() -> str:
    from evolution_data_warehouse_spark.queries.llm_ops import (
        _ANN_ORACLE,
        _ivf_oracle,
    )

    return f"""
WITH bf AS (SELECT query_id, neighbor_id FROM ({_ANN_ORACLE})),
iv AS (SELECT query_id, neighbor_id FROM ({_ivf_oracle()})),
truth AS (
    SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_truth
    FROM bf GROUP BY query_id
),
hit AS (
    SELECT b.query_id, CAST(COUNT(*) AS BIGINT) AS n_hit
    FROM bf b JOIN iv
      ON iv.query_id = b.query_id AND iv.neighbor_id = b.neighbor_id
    GROUP BY b.query_id
)
SELECT t.query_id, t.n_truth,
       CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
       CAST((COALESCE(h.n_hit, 0) * {_ANN_RECALL_FP}) // t.n_truth
            AS BIGINT) AS recall_fp
FROM truth t LEFT JOIN hit h ON h.query_id = t.query_id
"""


@register(
    "sim_ann_recall_eval",
    _ann_recall_oracle(),
    doc="ANN recall@10 evaluation: per query, what fraction of the "
    "EXACT brute-force top-10 cosine neighbors does the IVF "
    "multi-probe search return? The index-quality metric that "
    "decides nprobe/list-count before trusting sim_ann_ivf at scale "
    "— the vector-search twin of dedup_minhash_recall_eval's LSH "
    "measurement. Both legs ARE the registered queries themselves "
    "(sim_ann_bruteforce and sim_ann_ivf called as callables, their "
    "oracles composed as subqueries) — one source of truth, so this "
    "eval can never drift from what those entries actually compute. "
    "Recall is integer fixed-point against the per-query truth size "
    "(not a hardcoded 10 — short truth lists divide by what exists). "
    "Scale: the truth leg is the O(Q*N) exact scan — an eval you run "
    "on a query SAMPLE at calibration time, exactly like the LSH "
    "recall entry.",
)
def sim_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from evolution_data_warehouse_spark.queries.llm_ops import (
        sim_ann_bruteforce,
        sim_ann_ivf,
    )

    # pinned: truth and hit both consume the O(Q*N) exact-scan leg —
    # without the checkpoint its window-rank stages evaluate twice
    # (the dedup_minhash_recall_eval lesson, measured there at 3.5x)
    bf = (
        sim_ann_bruteforce(spark, sf_dir)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=True)
    )
    iv = sim_ann_ivf(spark, sf_dir).select(
        F.col("query_id").alias("iq"), F.col("neighbor_id").alias("inb")
    )
    truth = bf.groupBy("query_id").agg(
        F.count("*").cast("bigint").alias("n_truth")
    )
    hit = (
        bf.join(
            iv,
            (F.col("iq") == F.col("query_id"))
            & (F.col("inb") == F.col("neighbor_id")),
        )
        .groupBy("query_id")
        .agg(F.count("*").cast("bigint").alias("n_hit"))
    )
    return (
        truth.join(hit, "query_id", "left")
        .select(
            "query_id",
            "n_truth",
            F.coalesce("n_hit", F.lit(0)).cast("bigint").alias("n_hit"),
            F.expr(
                f"(coalesce(n_hit, 0) * {_ANN_RECALL_FP}) DIV n_truth"
            )
            .cast("bigint")
            .alias("recall_fp"),
        )
    )


# ---------------------------------------------------------------------------
# event_inter_arrival_cv — burstiness profile of the event stream
# ---------------------------------------------------------------------------

_IACV_ORACLE = f"""
WITH g AS (
    SELECT event_type,
           CAST(epoch_us(ts) - epoch_us(lag(ts) OVER (
               PARTITION BY event_type ORDER BY ts, event_id
           )) AS BIGINT) AS gap_us
    FROM events
),
s AS (
    SELECT event_type,
           CAST(COUNT(gap_us) AS BIGINT) AS n_gaps,
           {dsum_sql('gap_us', 0)} AS s1,
           {dsum_sql('CAST(gap_us AS DOUBLE) * CAST(gap_us AS DOUBLE)', 0)}
               AS s2
    FROM g GROUP BY event_type
)
SELECT event_type, n_gaps,
       {fpq_sql('s1 / CAST(n_gaps AS DOUBLE) / 1e6', 6)} AS mean_gap_s,
       {fpq_sql(
           "sqrt(greatest(s2 / CAST(n_gaps AS DOUBLE)"
           " - (s1 / CAST(n_gaps AS DOUBLE))"
           " * (s1 / CAST(n_gaps AS DOUBLE)), 0.0))"
           " / (s1 / CAST(n_gaps AS DOUBLE))", 6
       )} AS cv
FROM s
"""


@register(
    "event_inter_arrival_cv",
    _IACV_ORACLE,
    doc="Burstiness profile: coefficient of variation of inter-arrival "
    "times per event type (cv ~ 1 is Poisson-like, cv >> 1 is bursty, "
    "cv << 1 is metronomic) — the traffic-shape diagnostic that "
    "decides whether event_error_spike-style anomaly thresholds can "
    "assume Poisson noise. Gaps are exact integer microseconds from "
    "the lag over the full (ts, event_id) tie-break; moments are "
    "decimal-exact sums (gap^2 at µs scale needs the wide decimal — "
    "(1e10 us)^2 overflows int64); the epsilon-negative variance "
    "guard mirrors win_bollinger. One window pass + one hash "
    "aggregate, both keyed on event_type.",
)
def event_inter_arrival_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    g = t(spark, sf_dir, "events").select(
        "event_type",
        (
            F.unix_micros(F.col("ts"))
            - F.unix_micros(F.lag("ts").over(w))
        )
        .cast("bigint")
        .alias("gap_us"),
    )
    s = g.groupBy("event_type").agg(
        F.count("gap_us").cast("bigint").alias("n_gaps"),
        dsum("gap_us", 0).alias("s1"),
        dsum(
            F.col("gap_us").cast("double") * F.col("gap_us").cast("double"),
            0,
        ).alias("s2"),
    )
    n_d = F.col("n_gaps").cast("double")
    mean = F.col("s1") / n_d
    var = F.greatest(
        F.col("s2") / n_d - mean * mean, F.lit(0.0)
    )
    return s.select(
        "event_type",
        "n_gaps",
        fpq(mean / F.lit(1e6), 6).alias("mean_gap_s"),
        fpq(F.sqrt(var) / mean, 6).alias("cv"),
    )


# ---------------------------------------------------------------------------
# fe_target_encoding_loo — leave-one-out mean target encoding
# ---------------------------------------------------------------------------

_TE_ORACLE = f"""
WITH base AS (
    SELECT o_custkey, o_orderpriority AS cat, o_totalprice AS y
    FROM orders
),
g AS (
    SELECT cat,
           CAST(COUNT(*) AS BIGINT) AS n_cat,
           {dsum_sql('y', 2)} AS sum_y
    FROM base GROUP BY cat
),
enc AS (
    SELECT b.o_custkey, b.cat, b.y, g.n_cat,
           CASE WHEN g.n_cat <= 1 THEN NULL
                ELSE (g.sum_y - b.y) / (CAST(g.n_cat AS DOUBLE) - 1.0)
           END AS te_loo
    FROM base b JOIN g ON g.cat = b.cat
)
SELECT cat, n_cat,
       CAST(COUNT(te_loo) AS BIGINT) AS n_encoded,
       {fpq_sql(dsum_sql('te_loo', 6) + ' / CAST(COUNT(te_loo) AS DOUBLE)', 6)}
           AS mean_encoding,
       {fpq_sql('MIN(te_loo)', 6)} AS min_encoding,
       {fpq_sql('MAX(te_loo)', 6)} AS max_encoding
FROM enc GROUP BY cat, n_cat
"""


@register(
    "fe_target_encoding_loo",
    _TE_ORACLE,
    doc="Leave-one-out mean target encoding — the feature-engineering "
    "primitive for high-cardinality categoricals (each row's encoding "
    "is its category's target mean EXCLUDING the row itself, the "
    "standard leak-free form: encoding with the row included lets "
    "the feature memorize its own label). te = (sum_y - y)/(n-1) "
    "from ONE decimal-exact per-category aggregate broadcast back — "
    "no per-row window, no second scan shape; singleton categories "
    "encode NULL (no leave-one-out mean exists) and are excluded "
    "from the roll-up on both engines identically. Emitted as "
    "per-category encoding profiles (count/mean/min/max) so the "
    "oracle pins the whole distribution.",
)
def fe_target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("cat"),
        F.col("o_totalprice").alias("y"),
    )
    g = base.groupBy("cat").agg(
        F.count("*").cast("bigint").alias("n_cat"),
        dsum("y", 2).alias("sum_y"),
    )
    enc = base.join(F.broadcast(g), "cat").select(
        "cat",
        "n_cat",
        F.when(F.col("n_cat") <= 1, F.lit(None).cast("double")).otherwise(
            (F.col("sum_y") - F.col("y"))
            / (F.col("n_cat").cast("double") - F.lit(1.0))
        ).alias("te_loo"),
    )
    return enc.groupBy("cat", "n_cat").agg(
        F.count("te_loo").cast("bigint").alias("n_encoded"),
        fpq(
            dsum("te_loo", 6) / F.count("te_loo").cast("double"), 6
        ).alias("mean_encoding"),
        fpq(F.min("te_loo"), 6).alias("min_encoding"),
        fpq(F.max("te_loo"), 6).alias("max_encoding"),
    )


# ---------------------------------------------------------------------------
# emb_centroid_drift — embedding-space drift between two snapshots
# ---------------------------------------------------------------------------

_DRIFT_DIM = 64

_EMB_DRIFT_ORACLE = f"""
WITH cent AS (
    SELECT label, CAST(vec_id % 2 AS INT) AS half, CAST(i AS INT) AS dim,
           (CAST(SUM(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e12)
                          AS BIGINT)) AS DOUBLE) / 1e12)
           / CAST(COUNT(*) AS DOUBLE) AS c
    FROM embeddings, range(1, {_DRIFT_DIM + 1}) t(i)
    GROUP BY label, vec_id % 2, i
),
diffs AS (
    SELECT a.label,
           CAST(floor(pow(a.c - b.c, 2) * 1e12 + 0.5) AS BIGINT) AS d2_fp
    FROM cent a
    JOIN cent b ON b.label = a.label AND b.dim = a.dim
    WHERE a.half = 0 AND b.half = 1
)
SELECT label,
       CAST(floor(sqrt(CAST(SUM(d2_fp) AS DOUBLE) / 1e12) * 1e9 + 0.5) / 1e9
            AS DOUBLE) AS drift
FROM diffs GROUP BY label
"""


@register(
    "emb_centroid_drift",
    _EMB_DRIFT_ORACLE,
    doc="Embedding-space drift monitor: per label, the L2 distance "
    "between the centroid of one data half (vec_id parity simulates "
    "two ingestion snapshots) and the other — the encoder-regression "
    "check that catches a silently retrained or misversioned "
    "embedding model BEFORE downstream ANN/dedup quality decays "
    "(drift_psi and snapshot_column_drift watch tabular columns; "
    "this watches the vector space itself). Centroids use the repo's "
    "elementwise-mean rule (floor(v*1e12) integer sums / count — the "
    "emb_centroid_separation convention) and the squared diffs are "
    "fixed-pointed before the final sqrt, so both engines agree "
    "bit-for-bit. One explode + hash aggregate keyed (label, half, "
    "dim); only O(labels x dims) rows survive the first aggregate.",
)
def emb_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from evolution_data_warehouse_spark.operators.similarity import as_double

    e = t(spark, sf_dir, "embeddings").select(
        "label",
        (F.col("vec_id") % 2).cast("int").alias("half"),
        F.posexplode(as_double(F.col("embedding"))).alias("pos", "v"),
    )
    cent = e.groupBy(
        "label", "half", (F.col("pos") + 1).cast("int").alias("dim")
    ).agg(
        (
            (F.sum(F.floor(F.col("v") * 1e12).cast("long")).cast("double") / 1e12)
            / F.count("*").cast("double")
        ).alias("c")
    )
    a = cent.filter(F.col("half") == 0).select(
        "label", "dim", F.col("c").alias("ca")
    )
    b = cent.filter(F.col("half") == 1).select(
        "label", "dim", F.col("c").alias("cb")
    )
    diffs = a.join(b, ["label", "dim"]).select(
        "label",
        F.floor(
            F.pow(F.col("ca") - F.col("cb"), F.lit(2)) * 1e12 + F.lit(0.5)
        )
        .cast("bigint")
        .alias("d2_fp"),
    )
    drift = F.sqrt(F.sum("d2_fp").cast("double") / 1e12)
    return diffs.groupBy("label").agg(
        (F.floor(drift * 1e9 + F.lit(0.5)) / 1e9)
        .cast("double")
        .alias("drift")
    )


# ---------------------------------------------------------------------------
# dedup_cluster_size_hist — duplicate-cluster size distribution
# ---------------------------------------------------------------------------


def _cluster_hist_oracle() -> str:
    from evolution_data_warehouse_spark.queries.llm_ops import (
        _CLUSTERS_ORACLE,
    )

    return f"""
SELECT sz AS cluster_size,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(SUM(sz) AS BIGINT) AS n_docs
FROM (
    SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS sz
    FROM ({_CLUSTERS_ORACLE}) GROUP BY cluster_id
) GROUP BY sz
"""


@register(
    "dedup_cluster_size_hist",
    _cluster_hist_oracle(),
    doc="Duplicate-cluster size distribution — the corpus-structure "
    "report read off dedup_clusters' connected components (size-1 "
    "clusters are unique docs; a long tail of large clusters means "
    "boilerplate the keep-one-per-cluster pass will collapse, and "
    "sizes near the hot-bucket cap say the LSH guard is doing real "
    "work). Composes the REGISTERED dedup_clusters callable (its "
    "oracle as a subquery) so the histogram can never drift from the "
    "actual cluster assignment; two tiny integer aggregates on top. "
    "n_docs per size row makes the histogram a partition of the "
    "corpus — the oracle catches a lost or double-counted document.",
)
def dedup_cluster_size_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    from evolution_data_warehouse_spark.queries.llm_ops import dedup_clusters

    clusters = dedup_clusters(spark, sf_dir)
    sizes = clusters.groupBy("cluster_id").agg(
        F.count("*").cast("bigint").alias("sz")
    )
    return sizes.groupBy(F.col("sz").alias("cluster_size")).agg(
        F.count("*").cast("bigint").alias("n_clusters"),
        F.sum("sz").cast("bigint").alias("n_docs"),
    )


# ---------------------------------------------------------------------------
# event_entropy_rate — conditional next-event entropy per from-state
# ---------------------------------------------------------------------------

_ER_FP = 1_000_000_000_000


def _entropy_rate_oracle() -> str:
    return f"""
WITH seq AS (
    SELECT user_id, event_type AS cur,
           lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS nxt
    FROM events
),
trans AS (
    SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS k
    FROM seq WHERE nxt IS NOT NULL GROUP BY cur, nxt
),
tot AS (SELECT cur, CAST(SUM(k) AS BIGINT) AS n FROM trans GROUP BY cur),
terms AS (
    SELECT t.cur,
           CAST(floor(-(CAST(t.k AS DOUBLE) / o.n)
                      * log2(CAST(t.k AS DOUBLE) / o.n)
                      * {_ER_FP}) AS BIGINT) AS term_fp
    FROM trans t JOIN tot o ON o.cur = t.cur
)
SELECT s.cur AS from_type, o.n AS n_transitions,
       CAST(CAST(SUM(s.term_fp) AS DOUBLE) / {_ER_FP} AS DOUBLE)
           AS entropy_bits
FROM terms s JOIN tot o ON o.cur = s.cur
GROUP BY s.cur, o.n
"""


@register(
    "event_entropy_rate",
    _entropy_rate_oracle(),
    doc="Conditional next-event entropy per from-state — how "
    "predictable is what a user does NEXT given what they just did "
    "(the entropy-rate view of event_transition_matrix: ~log2(5) "
    "bits means the process is memoryless noise, near 0 means "
    "deterministic flows worth productizing). Each -p*log2(p) term "
    "is fixed-point quantized BEFORE the sum — the agg_entropy rule "
    "— so the float log's ulps can't make the aggregation "
    "order-dependent; transitions come from one lead() window over "
    "the full (ts, event_id) tie-break. Output is per from-state "
    "with its transition count; O(types^2) intermediate only.",
)
def event_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = t(spark, sf_dir, "events").select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    )
    trans = (
        seq.filter(F.col("nxt").isNotNull())
        .groupBy("cur", "nxt")
        .agg(F.count("*").cast("bigint").alias("k"))
    )
    tot = trans.groupBy("cur").agg(F.sum("k").cast("bigint").alias("n"))
    p = F.col("k").cast("double") / F.col("n").cast("double")
    terms = trans.join(F.broadcast(tot), "cur").select(
        "cur",
        F.floor(-p * F.log2(p) * F.lit(float(_ER_FP)))
        .cast("bigint")
        .alias("term_fp"),
    )
    return (
        terms.groupBy("cur")
        .agg(F.sum("term_fp").alias("sum_fp"))
        .join(F.broadcast(tot), "cur")
        .select(
            F.col("cur").alias("from_type"),
            F.col("n").alias("n_transitions"),
            (F.col("sum_fp").cast("double") / F.lit(float(_ER_FP)))
            .cast("double")
            .alias("entropy_bits"),
        )
    )


# ---------------------------------------------------------------------------
# sim_ann_nprobe_sweep — recall@10 as a function of nprobe
# ---------------------------------------------------------------------------


def _ivf_corpus_ctes() -> str:
    """The IVF corpus-assignment CTE chain (d → long → ranked →
    corpus_b) every IVF oracle leg shares — mirrors
    llm_ops._ivf_oracle()'s construction; rank by exact double
    distance, centroid-id tie-break, rnk = 1 is the inverted-list
    assignment. One source of truth for sim_ann_nprobe_sweep and
    extensions_r13's sim_ann_frontier so the two oracles cannot
    silently diverge."""
    from evolution_data_warehouse_spark.queries.llm_ops import (
        DIM,
        _KM_CENTROIDS,
    )

    dist_exprs = []
    for c in _KM_CENTROIDS:
        terms = " + ".join(
            f"((CAST(embedding[{j+1}] AS DOUBLE) - {c[j]:.17e}) "
            f"* (CAST(embedding[{j+1}] AS DOUBLE) - {c[j]:.17e}))"
            for j in range(DIM)
        )
        dist_exprs.append(f"({terms})")
    d_cols = ", ".join(f"{d} AS d{k}" for k, d in enumerate(dist_exprs))
    long_union = " UNION ALL ".join(
        f"SELECT vec_id, {k} AS centroid_id, d{k} AS dist FROM d"
        for k in range(len(_KM_CENTROIDS))
    )
    return f"""
d AS (SELECT vec_id, {d_cols} FROM embeddings),
long AS ({long_union}),
ranked AS (
    SELECT vec_id, centroid_id, row_number() OVER (
        PARTITION BY vec_id ORDER BY dist ASC, centroid_id ASC) AS rnk
    FROM long
),
corpus_b AS (SELECT vec_id, CAST(centroid_id AS INT) AS centroid_id
             FROM ranked WHERE rnk = 1)"""


def _nprobe_sweep_oracle() -> str:
    from evolution_data_warehouse_spark.queries.llm_ops import (
        _ANN_ORACLE,
        _sqnorm_sql,
    )

    def leg(probes: int) -> str:
        return f"""
    SELECT {probes} AS nprobe, p.vec_id AS query_id, cb.vec_id AS neighbor_id
    FROM (SELECT vec_id, CAST(centroid_id AS INT) AS centroid_id
          FROM ranked WHERE rnk <= {probes} AND vec_id < 5) p
    JOIN corpus_b cb
      ON p.centroid_id = cb.centroid_id AND p.vec_id <> cb.vec_id"""

    return f"""
WITH e AS (
    SELECT vec_id, embedding, sqrt({_sqnorm_sql('embeddings')}) AS norm
    FROM embeddings
),
{_ivf_corpus_ctes()},
cand AS ({leg(1)} UNION ALL {leg(2)}),
bf AS (SELECT query_id, neighbor_id FROM ({_ANN_ORACLE})),
truth AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM bf),
hit AS (
    SELECT c.nprobe, CAST(COUNT(*) AS BIGINT) AS n_hit
    FROM bf b JOIN cand c
      ON c.query_id = b.query_id AND c.neighbor_id = b.neighbor_id
    GROUP BY c.nprobe
)
SELECT h.nprobe, t.n_truth, h.n_hit,
       CAST((h.n_hit * 1000000) // t.n_truth AS BIGINT) AS recall_fp
FROM hit h CROSS JOIN truth t
"""


@register(
    "sim_ann_nprobe_sweep",
    _nprobe_sweep_oracle(),
    doc="IVF recall-vs-nprobe calibration curve: total recall@10 over "
    "the query sample at probe depth 1 and 2 — the knob-tuning table "
    "(sim_ann_recall_eval scores ONE operating point; this sweeps "
    "the probe depth the way dedup_threshold_sweep sweeps the "
    "Jaccard fence, and the marginal recall of the second probe is "
    "exactly what decides whether its extra list scans are worth "
    "it). Candidate sets at both depths come from ONE centroid "
    "ranking (rnk <= nprobe — the deeper probe is a superset by "
    "construction); ground truth is the registered brute-force "
    "oracle composed as a subquery. Recall is integer fixed-point "
    "per depth. Scale: same guarded shapes as the parents, query "
    "sample bounded by rule.",
)
def sim_ann_nprobe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from evolution_data_warehouse_spark.operators.similarity import (
        ivf_assign,
        with_norm,
    )
    from evolution_data_warehouse_spark.queries.llm_ops import (
        _KM_CENTROIDS,
        sim_ann_bruteforce,
    )

    e = with_norm(t(spark, sf_dir, "embeddings")).select(
        "vec_id", "_vec", "_norm"
    )
    corpus_b = ivf_assign(e, _KM_CENTROIDS, n_probe=1).localCheckpoint(
        eager=True
    )
    queries = e.filter(F.col("vec_id") < 5)
    bf = (
        sim_ann_bruteforce(spark, sf_dir)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=True)
    )
    legs = None
    for probes in (1, 2):
        qb = ivf_assign(queries, _KM_CENTROIDS, n_probe=probes)
        cand = (
            qb.alias("qb")
            .join(corpus_b.alias("cb"), "centroid_id")
            .filter(F.col("qb.vec_id") != F.col("cb.vec_id"))
            .select(
                F.lit(probes).alias("nprobe"),
                F.col("qb.vec_id").alias("query_id"),
                F.col("cb.vec_id").alias("neighbor_id"),
            )
        )
        legs = cand if legs is None else legs.unionAll(cand)
    hit = (
        bf.join(legs, ["query_id", "neighbor_id"])
        .groupBy("nprobe")
        .agg(F.count("*").cast("bigint").alias("n_hit"))
    )
    truth = bf.agg(F.count("*").cast("bigint").alias("n_truth"))
    return hit.crossJoin(F.broadcast(truth)).select(
        "nprobe",
        "n_truth",
        "n_hit",
        F.expr("(n_hit * 1000000) DIV n_truth")
        .cast("bigint")
        .alias("recall_fp"),
    )


# ---------------------------------------------------------------------------
# ts_peak_detection — local maxima with a prominence fence
# ---------------------------------------------------------------------------

# A day is a reported peak when it exceeds BOTH neighbors and clears
# the trailing 7-day minimum by the fixed-point prominence fence
# (peak/base >= 1.25, integer cross-multiplied: 4*peak >= 5*base).
_PEAK_NUM, _PEAK_DEN = 5, 4

_PEAK_ORACLE = f"""
WITH daily AS (
    SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS day,
           {dsum_sql('o_totalprice', 2)} AS v
    FROM orders GROUP BY 1, 2
),
w AS (
    SELECT o_orderpriority, day, v,
           lag(v) OVER win AS prev_v,
           lead(v) OVER win AS next_v,
           MIN(v) OVER (
               PARTITION BY o_orderpriority ORDER BY day
               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING
           ) AS base
    FROM daily
    WINDOW win AS (PARTITION BY o_orderpriority ORDER BY day)
)
SELECT o_orderpriority, day,
       {fpq_sql('v', 4)} AS v,
       {fpq_sql('base', 4)} AS base
FROM w
WHERE prev_v IS NOT NULL AND next_v IS NOT NULL AND base IS NOT NULL
  AND v > prev_v AND v > next_v
  AND {_PEAK_DEN} * v >= {_PEAK_NUM} * base
"""


@register(
    "ts_peak_detection",
    _PEAK_ORACLE,
    doc="Local-maximum peak detection with a prominence fence: a day "
    "is a peak when it beats both neighbors AND clears the trailing "
    "7-day minimum by >= 25% (integer cross-multiplication 4v >= "
    "5*base — a float ratio at the fence would be engine-dependent "
    "for borderline days) — the spike-mining primitive between "
    "event_error_spike's z-score and win_drawdown_max's trough view. "
    "Edge days without both neighbors or a full base window are "
    "excluded identically on both engines (NULL predicates). One "
    "window pass over the pre-aggregated daily frame; the lag/lead/"
    "rolling-min trio shares a single sort.",
)
def ts_peak_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        t(spark, sf_dir, "orders")
        .groupBy(
            "o_orderpriority",
            F.to_date("o_orderdate").alias("day"),
        )
        .agg(dsum("o_totalprice", 2).alias("v"))
    )
    win = Window.partitionBy("o_orderpriority").orderBy("day")
    base_w = win.rowsBetween(-7, -1)
    w = daily.select(
        "o_orderpriority",
        "day",
        "v",
        F.lag("v").over(win).alias("prev_v"),
        F.lead("v").over(win).alias("next_v"),
        F.min("v").over(base_w).alias("base"),
    )
    return w.filter(
        F.col("prev_v").isNotNull()
        & F.col("next_v").isNotNull()
        & F.col("base").isNotNull()
        & (F.col("v") > F.col("prev_v"))
        & (F.col("v") > F.col("next_v"))
        & (
            F.lit(_PEAK_DEN) * F.col("v")
            >= F.lit(_PEAK_NUM) * F.col("base")
        )
    ).select(
        "o_orderpriority",
        "day",
        fpq(F.col("v"), 4).alias("v"),
        fpq(F.col("base"), 4).alias("base"),
    )


# ---------------------------------------------------------------------------
# fn_math_suite — cross-engine math-function determinism canary
# ---------------------------------------------------------------------------

_MATH_ORACLE = f"""
WITH x AS (
    SELECT o_orderkey,
           1.0 + CAST(o_orderkey % 97 AS DOUBLE) / 97.0 AS u
    FROM orders
),
m AS (
    SELECT o_orderkey % 5 AS grp,
           {fpq_sql('sqrt(u)', 9)} AS f_sqrt,
           {fpq_sql('ln(u)', 9)} AS f_ln,
           {fpq_sql('exp(u)', 9)} AS f_exp,
           {fpq_sql('log2(u)', 9)} AS f_log2,
           {fpq_sql('pow(u, 3.0)', 9)} AS f_pow,
           {fpq_sql('atan(u)', 9)} AS f_atan
    FROM x
)
SELECT CAST(grp AS BIGINT) AS grp,
       CAST(COUNT(*) AS BIGINT) AS n,
       {dsum_sql('f_sqrt', 9)} AS sum_sqrt,
       {dsum_sql('f_ln', 9)} AS sum_ln,
       {dsum_sql('f_exp', 9)} AS sum_exp,
       {dsum_sql('f_log2', 9)} AS sum_log2,
       {dsum_sql('f_pow', 9)} AS sum_pow,
       {dsum_sql('f_atan', 9)} AS sum_atan
FROM m GROUP BY grp
"""


@register(
    "fn_math_suite",
    _MATH_ORACLE,
    doc="Cross-engine math-function determinism canary: sqrt/ln/exp/"
    "log2/pow/atan over a derived u in [1, 2), each value fixed-point "
    "quantized at 1e-9 PER ROW and only then decimal-summed per "
    "group — the per-term-quantize-then-sum rule (agg_entropy's) "
    "applied to the whole transcendental toolbox. This entry exists "
    "to fail loudly the day an engine upgrade changes a math "
    "library's rounding beyond 1e-9, BEFORE some downstream score "
    "silently drifts: every other query that touches ln/log2/sqrt "
    "leans on the property this one pins. Shuffle-free scan + one "
    "5-group aggregate.",
)
def fn_math_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = (
        F.lit(1.0)
        + (F.col("o_orderkey") % 97).cast("double") / F.lit(97.0)
    )
    m = t(spark, sf_dir, "orders").select(
        (F.col("o_orderkey") % 5).alias("grp"),
        fpq(F.sqrt(u), 9).alias("f_sqrt"),
        fpq(F.log(u), 9).alias("f_ln"),
        fpq(F.exp(u), 9).alias("f_exp"),
        fpq(F.log2(u), 9).alias("f_log2"),
        fpq(F.pow(u, F.lit(3.0)), 9).alias("f_pow"),
        fpq(F.atan(u), 9).alias("f_atan"),
    )
    return m.groupBy(F.col("grp").cast("bigint").alias("grp")).agg(
        F.count("*").cast("bigint").alias("n"),
        dsum("f_sqrt", 9).alias("sum_sqrt"),
        dsum("f_ln", 9).alias("sum_ln"),
        dsum("f_exp", 9).alias("sum_exp"),
        dsum("f_log2", 9).alias("sum_log2"),
        dsum("f_pow", 9).alias("sum_pow"),
        dsum("f_atan", 9).alias("sum_atan"),
    )


# ---------------------------------------------------------------------------
# agg_percent_of_parent — hierarchy share (nation within region)
# ---------------------------------------------------------------------------

_POP_ORACLE = f"""
WITH rev AS (
    SELECT n.n_name AS nation, r.r_name AS region,
           {dsum_sql('o.o_totalprice', 2)} AS revenue
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY n.n_name, r.r_name
),
tot AS (
    SELECT region, {dsum_sql('revenue', 2)} AS region_revenue
    FROM rev GROUP BY region
)
SELECT rev.region, rev.nation,
       {fpq_sql('rev.revenue', 2)} AS revenue,
       {fpq_sql('tot.region_revenue', 2)} AS region_revenue,
       {fpq_sql('rev.revenue / tot.region_revenue', 6)} AS share_of_region
FROM rev JOIN tot ON tot.region = rev.region
"""


@register(
    "agg_percent_of_parent",
    _POP_ORACLE,
    doc="Percent-of-parent in the geography hierarchy: each nation's "
    "revenue as a share of its REGION's total — the drill-down "
    "reporting shape (win_share_of_total shares against the grand "
    "total; rollup/cube emit the parent rows but not the ratio). "
    "Two decimal-exact aggregates — nation grain, then region grain "
    "REAGGREGATED FROM the nation frame so parent and child totals "
    "can never disagree — joined back on the tiny region key "
    "(broadcast); the share divides two decimal-derived doubles and "
    "quantizes at 1e-6. Star join broadcasts both dims; one fact "
    "shuffle total.",
)
def agg_percent_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = t(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.col("r_name").alias("region")
        )
        .agg(dsum("o_totalprice", 2).alias("revenue"))
    )
    tot = rev.groupBy("region").agg(dsum("revenue", 2).alias("region_revenue"))
    return rev.join(F.broadcast(tot), "region").select(
        "region",
        "nation",
        fpq(F.col("revenue"), 2).alias("revenue"),
        fpq(F.col("region_revenue"), 2).alias("region_revenue"),
        fpq(F.col("revenue") / F.col("region_revenue"), 6).alias(
            "share_of_region"
        ),
    )


# ---------------------------------------------------------------------------
# join_asof_tolerance — as-of join with a bounded staleness window
# ---------------------------------------------------------------------------

_ASOF_TOL = "7 DAY"

_ASOF_TOL_ORACLE = f"""
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
     AND v.ts > p.ts - INTERVAL {_ASOF_TOL}
) WHERE rn = 1
"""


@register(
    "join_asof_tolerance",
    _ASOF_TOL_ORACLE,
    doc="Backward as-of join with a staleness tolerance (pandas "
    "merge_asof's `tolerance`, Flink's interval join): the latest "
    "prior view per purchase, but only if it happened within the "
    "last 7 days — older matches yield NULL instead of stale "
    "attribution. Beyond correctness, the tolerance is the SCALE "
    "lever join_asof lacks: the range predicate bounds each "
    "purchase's candidate fan-out to one window of history (the "
    "batch analog of the streaming interval join's watermark-bounded "
    "state), where an untolerated as-of must consider a user's "
    "entire past. Same equi-join + per-purchase window shape as "
    "join_asof; unmatched purchases survive via the left join.",
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("last_view_id"),
        F.col("ts").alias("last_view_ts"),
    )
    joined = p.join(
        v,
        (F.col("v_user") == F.col("user_id"))
        & (F.col("last_view_ts") <= F.col("purchase_ts"))
        & (
            F.col("last_view_ts")
            > F.expr(f"purchase_ts - INTERVAL {_ASOF_TOL}")
        ),
        "left",
    )
    w = Window.partitionBy("purchase_id").orderBy(
        F.col("last_view_ts").desc_nulls_last(),
        F.col("last_view_id").desc_nulls_last(),
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "purchase_id",
            "user_id",
            "purchase_ts",
            "last_view_id",
            "last_view_ts",
        )
    )
