"""Scalar function operators (SURVEY.md §2.8) as registry queries.

All JVM-side `pyspark.sql.functions` compositions — no Python UDFs —
so every expression stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from evolution_data_warehouse_spark.queries.common import dsum, dsum_sql, register, t


@register(
    "fn_zfill",
    "SELECT n_nationkey, lpad(CAST(n_nationkey AS VARCHAR), 2, '0') AS nation_code "
    "FROM nation",
    doc="Zero-pad codes to width 2 ('2'→'02'). Ref: notebook cell 4; "
    "load_facts.py:134-136,303,355.",
)
def fn_zfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "nation").select(
        "n_nationkey",
        F.lpad(F.col("n_nationkey").cast("string"), 2, "0").alias("nation_code"),
    )


_GEO_PATTERN = r"(\d+)-([A-Z]+)-(.+)"
_REGEX_ORACLE = f"""
WITH g AS (
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS VARCHAR) || '-DEP-' ||
           lpad(CAST(o_custkey % 100 AS VARCHAR), 2, '0') AS geo_id
    FROM orders
)
SELECT o_orderkey, geo_id,
       regexp_extract(geo_id, '{_GEO_PATTERN}', 1) AS geo_reference_year,
       regexp_extract(geo_id, '{_GEO_PATTERN}', 2) AS geo_level_code,
       regexp_extract(geo_id, '{_GEO_PATTERN}', 3) AS geo_code
FROM g
"""


@register(
    "fn_regex_extract",
    _REGEX_ORACLE,
    doc="Parse geo_id '2024-DEP-02' → (year, level, code) via regex groups. "
    "Ref: notebook cell 4 (enrich_geo_columns).",
)
def fn_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.concat(
            F.year("o_orderdate").cast("string"),
            F.lit("-DEP-"),
            F.lpad((F.col("o_custkey") % 100).cast("string"), 2, "0"),
        ).alias("geo_id"),
    )
    return g.select(
        "o_orderkey",
        "geo_id",
        F.regexp_extract("geo_id", _GEO_PATTERN, 1).alias("geo_reference_year"),
        F.regexp_extract("geo_id", _GEO_PATTERN, 2).alias("geo_level_code"),
        F.regexp_extract("geo_id", _GEO_PATTERN, 3).alias("geo_code"),
    )


@register(
    "fn_cast_numeric",
    "SELECT l_orderkey, l_linenumber, "
    "TRY_CAST(CAST(l_quantity AS VARCHAR) AS DOUBLE) AS qty_recast, "
    "TRY_CAST(l_returnflag AS DOUBLE) AS flag_cast FROM lineitem",
    doc="Tolerant numeric coercion (pandas errors='coerce' ↔ try_cast: "
    "non-numeric → NULL, never an error even under ANSI mode). Ref: "
    "notebook cell 4; load_facts.py:125-127,302.",
)
def fn_cast_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("string").try_cast("double").alias("qty_recast"),
        F.col("l_returnflag").try_cast("double").alias("flag_cast"),
    )


@register(
    "fn_case_when",
    "SELECT o_orderkey, CASE WHEN o_totalprice > 50000.0 THEN 'HIGH' "
    "WHEN o_totalprice > 10000.0 THEN 'MED' ELSE 'LOW' END AS price_band "
    "FROM orders",
    doc="CASE WHEN guards / status labels. Ref: 005:29-34; 010:548-551.",
)
def fn_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 50000.0, "HIGH")
        .when(F.col("o_totalprice") > 10000.0, "MED")
        .otherwise("LOW")
        .alias("price_band"),
    )


_COALESCE_ORACLE = f"""
SELECT o_orderkey, COALESCE(big_qty, 0.0) AS big_qty_filled
FROM orders LEFT JOIN (
    SELECT l_orderkey, {dsum_sql('l_quantity')} AS big_qty
    FROM lineitem WHERE l_quantity > 45 GROUP BY l_orderkey
) li ON o_orderkey = l_orderkey
"""


@register(
    "fn_coalesce",
    _COALESCE_ORACLE,
    doc="ISNULL(x, y) defaults after an outer join. Ref: 010:168-170,239; "
    "011:319,328.",
)
def fn_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    big = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("big_qty"))
    )
    return orders.join(big, orders.o_orderkey == big.l_orderkey, "left").select(
        "o_orderkey", F.coalesce("big_qty", F.lit(0.0)).alias("big_qty_filled")
    )


_NULLIF_ORACLE = f"""
SELECT l_returnflag,
       {dsum_sql('l_extendedprice * l_discount', 4)}
       / NULLIF({dsum_sql('l_quantity')}, 0.0) AS discount_per_unit
FROM lineitem GROUP BY l_returnflag
"""


@register(
    "fn_nullif",
    _NULLIF_ORACLE,
    doc="NULLIF(SUM(x), 0) divide-by-zero guard — ANSI-mode safe. Ref: "
    "005_create_datamarts.sql:248.",
)
def fn_nullif(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            (
                dsum(F.col("l_extendedprice") * F.col("l_discount"), 4)
                / F.nullif(dsum("l_quantity"), F.lit(0.0))
            ).alias("discount_per_unit")
        )
    )


@register(
    "fn_current_ts",
    "SELECT r_regionkey, r_name, TRUE AS has_load_ts, TRUE AS ts_is_recent "
    "FROM region",
    doc="GETDATE() load timestamps. Ref: 002:23-24; 010:222-225. The raw "
    "value is wall-clock, so the checked projection keeps "
    "current_timestamp() in the plan but asserts deterministic facts about "
    "it (non-null, after the epoch of this repo's creation) that any "
    "correct clock satisfies.",
)
def fn_current_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    now = F.current_timestamp()
    return t(spark, sf_dir, "region").select(
        "r_regionkey",
        "r_name",
        now.isNotNull().alias("has_load_ts"),
        (now > F.lit("2024-01-01").cast("timestamp")).alias("ts_is_recent"),
    )


_DATEDIFF_ORACLE = """
SELECT user_id,
       CAST(date_diff('day', CAST(MIN(ts) AS DATE), CAST(MAX(ts) AS DATE)) AS INT)
           AS active_days,
       CAST(floor((epoch(date_trunc('second', MAX(ts)))
                   - epoch(date_trunc('second', MIN(ts)))) / 3600) AS BIGINT)
           AS active_hours
FROM events GROUP BY user_id
"""


@register(
    "fn_datediff",
    _DATEDIFF_ORACLE,
    doc="DATEDIFF(HOUR/DAY, a, b) — error age / session duration. Ref: "
    "008:203; 011:365. Hours computed on second-truncated epochs so both "
    "engines agree on sub-second inputs.",
)
def fn_datediff(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = t(spark, sf_dir, "events").groupBy("user_id").agg(
        F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts")
    )
    return g.select(
        "user_id",
        F.datediff(F.col("last_ts").cast("date"), F.col("first_ts").cast("date"))
        .cast("int")
        .alias("active_days"),
        F.floor(
            (
                F.unix_timestamp(F.date_trunc("second", F.col("last_ts")))
                - F.unix_timestamp(F.date_trunc("second", F.col("first_ts")))
            )
            / F.lit(3600)
        ).alias("active_hours"),
    )


@register(
    "fn_dateadd",
    "SELECT o_orderkey, CAST(o_orderdate AS DATE) + 7 AS due_date, "
    "CAST(o_orderdate AS DATE) - 7 AS reminder_date FROM orders",
    doc="DATEADD(DAY, ±7, d) recency windows. Ref: "
    "docs/E6_MAINTENANCE_METHODOLOGY.md:210; 010:449,456.",
)
def fn_dateadd(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = F.col("o_orderdate").cast("date")
    return t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.date_add(d, 7).alias("due_date"),
        F.date_sub(d, 7).alias("reminder_date"),
    )


@register(
    "fn_date_format",
    "SELECT strftime(ts, '%Y-%m') AS month, COUNT(*) AS n_events "
    "FROM events GROUP BY strftime(ts, '%Y-%m')",
    doc="FORMAT(date, 'yyyy-MM') month bucketing. Ref: "
    "docs/E6_MAINTENANCE_METHODOLOGY.md:270; 008:173.",
)
def fn_date_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "events")
        .groupBy(F.date_format("ts", "yyyy-MM").alias("month"))
        .agg(F.count("*").alias("n_events"))
    )


@register(
    "fn_concat",
    "SELECT o_orderkey, concat_ws('-', o_orderpriority, o_orderstatus) AS label "
    "FROM orders",
    doc="String concatenation for labels (prenom + ' ' + nom). Ref: "
    "011:305,355; 010:255-257.",
)
def fn_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.concat_ws("-", "o_orderpriority", "o_orderstatus").alias("label"),
    )


@register(
    "fn_round_arith",
    "SELECT o_orderkey, floor(o_totalprice / 1024.0 * 100.0 + 0.5) / 100.0 "
    "AS price_kb, o_totalprice * 100.0 AS price_cents FROM orders",
    doc="ROUND / division / scaling arithmetic. Ref: 007:193-194; 009:50. "
    "Half-up rounding is spelled floor(x*100+0.5)/100 — pure IEEE ops — "
    "because engine-native round() disagrees across engines at double "
    "representation boundaries (Spark rounds the shortest decimal repr, "
    "DuckDB the binary value).",
)
def fn_round_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.floor(F.col("o_totalprice") / 1024.0 * 100.0 + 0.5) / 100.0).alias(
            "price_kb"
        ),
        (F.col("o_totalprice") * 100.0).alias("price_cents"),
    )


@register(
    "fn_ascii_fold",
    "SELECT n_nationkey, strip_accents('Crédit Régional ' || n_name) AS folded "
    "FROM nation",
    doc="Accent stripping for login generation (unicodedata.NFKD). Ref: "
    "load_security.py:108-116. JVM-side translate — no UDF needed for a "
    "known accent map.",
)
def fn_ascii_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    accents = "àâäéèêëîïôöùûüçÀÂÄÉÈÊËÎÏÔÖÙÛÜÇ"
    plain = "aaaeeeeiioouuucAAAEEEEIIOOUUUC"
    return t(spark, sf_dir, "nation").select(
        "n_nationkey",
        F.translate(
            F.concat(F.lit("Crédit Régional "), F.col("n_name")), accents, plain
        ).alias("folded"),
    )


@register(
    "fn_array_join",
    "SELECT doc_id, array_to_string(list_slice(str_split(text, ' '), 1, 5), ',') "
    "AS first_tokens FROM documents",
    doc="Array → delimited string (postal codes → CSV). Ref: notebook cell 8 "
    "(','.join(codes_postaux)).",
)
def fn_array_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat_ws(",", F.slice(F.split("text", " "), 1, 5)).alias("first_tokens"),
    )


@register(
    "fn_explode",
    "SELECT token, COUNT(*) AS n FROM ("
    "SELECT unnest(str_split(text, ' ')) AS token FROM documents) "
    "GROUP BY token",
    doc="Array → rows (bridge table from codes_postaux). Ref: notebook "
    "cell 9 (.explode).",
)
def fn_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )


@register(
    "fn_json_serialize",
    "SELECT n_nationkey, to_json(struct_pack(id := n_nationkey, name := n_name)) "
    "AS payload FROM nation",
    doc="dict → JSON string before persistence (GeoJSON contours). Ref: "
    "export_to_sql.py:167-171; notebook cell 8.",
)
def fn_json_serialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "nation").select(
        "n_nationkey",
        F.to_json(
            F.struct(
                F.col("n_nationkey").alias("id"), F.col("n_name").alias("name")
            )
        ).alias("payload"),
    )


@register(
    "fn_struct_extract",
    "SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k_value "
    "FROM events",
    doc="Pull nested fields out of JSON/struct payloads (centre.coordinates). "
    "Ref: fetch_communes.py:162-177.",
)
def fn_struct_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "events").select(
        "event_id",
        F.from_json("props", "k INT").getField("k").alias("k_value"),
    )


@register(
    "fn_derived_measure",
    "SELECT l_orderkey, l_linenumber, "
    "l_extendedprice * (1 - l_discount) AS net_price, "
    "l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge "
    "FROM lineitem",
    doc="Computed persisted measures (solde_naturel = naissances - deces). "
    "Ref: 003_create_facts.sql:61; load_facts.py:615-617. Per-row IEEE "
    "double arithmetic — bit-identical across engines.",
)
def fn_derived_measure(spark: SparkSession, sf_dir: str) -> DataFrame:
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        net.alias("net_price"),
        (net * (1 + F.col("l_tax"))).alias("charge"),
    )


_TRY_CAST_ORACLE = """
SELECT doc_id,
       TRY_CAST(CASE WHEN regexp_matches(split_part(text, ' ', 1), '^-?[0-9]+$')
                     THEN split_part(text, ' ', 1) END AS INT)
           AS first_token_as_int,
       TRY_CAST(CASE WHEN doc_id % 3 = 0 THEN CAST(n_chars AS VARCHAR)
                     ELSE lang END AS INT) AS mixed_as_int,
       TRY_CAST(CAST(n_chars AS VARCHAR) AS BIGINT) AS n_chars_roundtrip
FROM documents
"""


@register(
    "fn_try_cast",
    _TRY_CAST_ORACLE,
    doc="Safe casting (try_cast): malformed input yields NULL instead "
    "of failing the job — the ingestion-hardening behavior that "
    "matters under ANSI mode, where a single bad cell would otherwise "
    "kill a 100 TB load. Three shapes: never-numeric text (all NULL), "
    "a genuinely mixed column (integer strings succeed, language codes "
    "null out — integer strings deliberately, since Spark truncates "
    "and DuckDB rounds decimal strings cast to INT), and a round trip "
    "that always succeeds. The first-token cast is gated by an "
    "integer-only regexp on BOTH sides so a decimal-looking token in a "
    "future testdata refresh cannot trip the truncate-vs-round "
    "divergence — the gate, not the data, carries the parity.",
)
def fn_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    raw_tok = F.split(F.col("text"), " ").getItem(0)
    first_tok = F.when(raw_tok.rlike(r"^-?[0-9]+$"), raw_tok)
    mixed = F.when(
        F.col("doc_id") % 3 == 0, F.col("n_chars").cast("string")
    ).otherwise(F.col("lang"))
    return docs.select(
        "doc_id",
        first_tok.try_cast("int").alias("first_token_as_int"),
        mixed.try_cast("int").alias("mixed_as_int"),
        F.col("n_chars")
        .cast("string")
        .try_cast("bigint")
        .alias("n_chars_roundtrip"),
    )


_EXPLODE_OUTER_ORACLE = """
WITH toks AS (
    SELECT doc_id,
           CASE WHEN doc_id % 5 = 0 THEN []
                ELSE str_split(lower(text), ' ')[1:3] END AS head_toks
    FROM documents
)
SELECT doc_id, t.tok
FROM toks LEFT JOIN LATERAL (
    SELECT unnest(head_toks) AS tok
) AS t ON TRUE
"""


@register(
    "fn_explode_outer",
    _EXPLODE_OUTER_ORACLE,
    doc="explode_outer: rows with EMPTY arrays survive as a NULL row "
    "instead of disappearing — the difference between 'tokenize and "
    "keep every document' and silently losing empty ones (plain "
    "explode's trap in a corpus pipeline). Empty arrays synthesized "
    "deterministically on one doc in five.",
)
def fn_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = F.when(
        F.col("doc_id") % 5 == 0, F.array().cast("array<string>")
    ).otherwise(F.slice(F.split(F.lower(F.col("text")), " "), 1, 3))
    return (
        t(spark, sf_dir, "documents")
        .select("doc_id", toks.alias("head_toks"))
        .select("doc_id", F.explode_outer("head_toks").alias("tok"))
    )
