"""Registry queries for the training-data pipeline operators
(operators/datapipe.py): deterministic splits, context-window packing,
eval-set decontamination, stratified sampling, incremental dedup.

All hash-based (md5) so every query has an exact DuckDB oracle; see
operators/datapipe.py for the 100 TB plan shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from evolution_data_warehouse_spark.operators.datapipe import (
    DECONTAM_DROP_AT,
    DECONTAM_FLAG_AT,
    PACK_CAPACITY,
    PACK_SHARDS,
    SPLIT_BUCKETS,
    decontaminate,
    hash_split,
    incremental_new,
    ngram_overlap,
    pack_contiguous,
    stratified_hash_sample,
)
from evolution_data_warehouse_spark.operators.dedup import content_hash64_sql
from evolution_data_warehouse_spark.queries.common import (
    cpu_repartition,
    register,
    t,
)

# DuckDB mirror of operators.datapipe.hash_bucket.
def _bucket_sql(expr: str, buckets: int) -> str:
    return f"({content_hash64_sql(f'CAST({expr} AS VARCHAR)')} % {buckets})"


# --------------------------------------------------------------------------
# deterministic train/val/test split
# --------------------------------------------------------------------------

_SPLIT_ORACLE = f"""
SELECT doc_id,
       {_bucket_sql('doc_id', SPLIT_BUCKETS)} AS bucket,
       CASE WHEN {_bucket_sql('doc_id', SPLIT_BUCKETS)} < 90 THEN 'train'
            WHEN {_bucket_sql('doc_id', SPLIT_BUCKETS)} < 95 THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


@register(
    "split_train_hash",
    _SPLIT_ORACLE,
    doc="Deterministic train/val/test split (90/5/5) by md5 hash bucket "
    "of the document id — no shuffle, stable across runs and engines, "
    "so re-ingestion can never leak documents across splits.",
)
def split_train_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hash_split(t(spark, sf_dir, "documents")).select(
        "doc_id", "bucket", "split"
    )


# --------------------------------------------------------------------------
# context-window packing
# --------------------------------------------------------------------------

_PACK_ORACLE = f"""
WITH toks AS (
    SELECT doc_id,
           CAST(len(str_split(text, ' ')) AS INT) AS n_tokens,
           {_bucket_sql('doc_id', PACK_SHARDS)} AS shard
    FROM documents
),
runs AS (
    SELECT doc_id, n_tokens, shard,
           COALESCE(SUM(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS cum_before
    FROM toks
)
SELECT doc_id, n_tokens, shard,
       CAST((shard << 40) + (cum_before // {PACK_CAPACITY}) AS BIGINT) AS bin_id,
       CAST(cum_before % {PACK_CAPACITY} AS BIGINT) AS bin_pos
FROM runs
"""


@register(
    "pack_sequences",
    _PACK_ORACLE,
    doc="Contiguous-fill context-window packing: docs shard by id hash, "
    "each shard packs independently by running token count into "
    f"{PACK_CAPACITY}-token bins — the distributed greedy packer (no "
    "global sort; shards scale with the cluster).",
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split(F.col("text"), " ")).alias("n_tokens")
    )
    return pack_contiguous(docs).select(
        "doc_id", "n_tokens", "shard", "bin_id", "bin_pos"
    )


# --------------------------------------------------------------------------
# eval-set decontamination
# --------------------------------------------------------------------------

_SHINGLES_SRC_SQL = """
SELECT doc_id, source, shingle FROM (
    SELECT doc_id, source,
           unnest(list_distinct(list_transform(
               range(1, greatest(len(toks) - 1, 1)),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
           ))) AS shingle
    FROM (SELECT doc_id, source, str_split(lower(text), ' ') AS toks
          FROM documents)
)
"""

_DECONTAM_ORACLE = f"""
WITH sh AS ({_SHINGLES_SRC_SQL}),
bench AS (SELECT DISTINCT shingle FROM sh WHERE source = 'src0'),
cand AS (SELECT doc_id, shingle FROM sh WHERE source <> 'src0'),
ov AS (
    SELECT doc_id, COUNT(DISTINCT shingle) AS n_shared
    FROM cand JOIN bench USING (shingle) GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(ov.n_shared, 0) AS n_shared,
       COALESCE(ov.n_shared, 0) > 0 AS contaminated
FROM documents d LEFT JOIN ov ON d.doc_id = ov.doc_id
WHERE d.source <> 'src0'
"""


def _shingles_with_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, shingle) — 3-gram word shingles, same recipe as
    llm_ops._doc_shingles plus the source column.

    Spread to core width before the tokenize+explode for the same
    reason as _doc_shingles (r14 profile: split_leakage_audit's
    shingle stage held 57.5 s of executorRunTime in the 10 scan tasks
    at sf1; the raw-doc shuffle is tiny next to the exploded output,
    and the spread is a no-op once the scan is already wide)."""
    docs = cpu_repartition(t(spark, sf_dir, "documents"), "doc_id")
    toks = F.split(F.lower(F.col("text")), " ")
    n = F.size(toks)
    shingles = F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(0), n - 3),
            lambda i: F.concat_ws(
                " ",
                F.element_at(toks, i + 1),
                F.element_at(toks, i + 2),
                F.element_at(toks, i + 3),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select(
        "doc_id", "source", F.explode(F.array_distinct(shingles)).alias("shingle")
    )


@register(
    "decontaminate_ngram",
    _DECONTAM_ORACLE,
    doc="Eval-set decontamination: per-training-doc count of distinct "
    "3-gram shingles shared with the benchmark corpus (source 'src0' "
    "stands in for the eval set). Shingle equi-join + hash aggregate — "
    "work scales with matches, never doc x doc.",
)
def decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _shingles_with_source(spark, sf_dir)
    bench = sh.filter(F.col("source") == "src0").select("shingle")
    cand = sh.filter(F.col("source") != "src0").select("doc_id", "shingle")
    ov = ngram_overlap(cand, bench)
    docs = (
        t(spark, sf_dir, "documents")
        .filter(F.col("source") != "src0")
        .select("doc_id")
    )
    return docs.join(ov, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_shared"), F.lit(0)).alias("n_shared"),
        (F.coalesce(F.col("n_shared"), F.lit(0)) > 0).alias("contaminated"),
    )


# Thresholds interpolated into the oracle from the operator constants
# (same pattern as the minhash hot-bucket guard) so engine and oracle
# can't drift apart.
_DECONTAM_APPLY_ORACLE = f"""
WITH sh AS ({_SHINGLES_SRC_SQL}),
bench AS (SELECT DISTINCT shingle FROM sh WHERE source = 'src0'),
cand AS (SELECT doc_id, shingle FROM sh WHERE source <> 'src0'),
tot AS (
    SELECT doc_id, COUNT(DISTINCT shingle) AS n_shingles
    FROM cand GROUP BY doc_id
),
ov AS (
    SELECT doc_id, COUNT(DISTINCT shingle) AS n_shared
    FROM cand JOIN bench USING (shingle) GROUP BY doc_id
),
j AS (
    SELECT tot.doc_id, tot.n_shingles,
           COALESCE(ov.n_shared, 0) AS n_shared,
           CAST(COALESCE(ov.n_shared, 0) AS DOUBLE)
               / CAST(tot.n_shingles AS DOUBLE) AS overlap_frac
    FROM tot LEFT JOIN ov ON tot.doc_id = ov.doc_id
)
SELECT d.doc_id,
       COALESCE(j.n_shingles, 0) AS n_shingles,
       COALESCE(j.n_shared, 0) AS n_shared,
       COALESCE(j.overlap_frac, 0.0) AS overlap_frac,
       CASE WHEN COALESCE(j.overlap_frac, 0.0) >= {DECONTAM_DROP_AT} THEN 'drop'
            WHEN COALESCE(j.overlap_frac, 0.0) >= {DECONTAM_FLAG_AT} THEN 'flag'
            ELSE 'keep' END AS decision
FROM documents d LEFT JOIN j ON d.doc_id = j.doc_id
WHERE d.source <> 'src0'
"""


@register(
    "decontaminate_apply",
    _DECONTAM_APPLY_ORACLE,
    doc="Decontamination policy layer over decontaminate_ngram's "
    f"counts: per-doc overlap fraction thresholded into drop (≥"
    f"{DECONTAM_DROP_AT}) / flag (≥{DECONTAM_FLAG_AT}) / keep, with "
    "the audit columns (shingle total, shared count, fraction) in the "
    "output — the report IS the result. Zero-shingle docs (too short "
    "to fingerprint) are kept explicitly rather than dropped silently.",
)
def decontaminate_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _shingles_with_source(spark, sf_dir)
    bench = sh.filter(F.col("source") == "src0").select("shingle")
    cand = sh.filter(F.col("source") != "src0").select("doc_id", "shingle")
    res = decontaminate(cand, bench)
    docs = (
        t(spark, sf_dir, "documents")
        .filter(F.col("source") != "src0")
        .select("doc_id")
    )
    return docs.join(res, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_shingles"), F.lit(0)).alias("n_shingles"),
        F.coalesce(F.col("n_shared"), F.lit(0)).alias("n_shared"),
        F.coalesce(F.col("overlap_frac"), F.lit(0.0)).alias("overlap_frac"),
        F.coalesce(F.col("decision"), F.lit("keep")).alias("decision"),
    )


# --------------------------------------------------------------------------
# stratified deterministic sampling
# --------------------------------------------------------------------------

_STRAT_K = 5
_STRAT_ORACLE = f"""
SELECT doc_id, source, CAST(rn AS INT) AS rn FROM (
    SELECT doc_id, source,
           ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY {_bucket_sql('doc_id', 1000000007)} ASC, doc_id ASC
           ) AS rn
    FROM documents
) WHERE rn <= {_STRAT_K}
"""


@register(
    "sample_stratified_hash",
    _STRAT_ORACLE,
    doc=f"Deterministic stratified sample: {_STRAT_K} docs per source, "
    "ranked by md5-hash order with an id tie-break. Rank-limit pushes "
    "below the per-stratum sort (WindowGroupLimit), so no stratum ever "
    "fully sorts at scale.",
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stratified_hash_sample(
        t(spark, sf_dir, "documents"), "source", k=_STRAT_K
    ).select("doc_id", "source", "rn")


# --------------------------------------------------------------------------
# incremental dedup (new batch vs corpus)
# --------------------------------------------------------------------------

_INCR_ORACLE = """
SELECT d.doc_id, md5(d.text) AS content_hash
FROM documents d
WHERE d.source = 'src1' AND NOT EXISTS (
    SELECT 1 FROM documents c
    WHERE c.source <> 'src1' AND md5(c.text) = md5(d.text)
)
"""


@register(
    "dedup_incremental",
    _INCR_ORACLE,
    doc="Incremental exact dedup: new-batch docs (source 'src1' stands "
    "in for today's ingest) whose content hash is absent from the "
    "existing corpus — anti-join on the hash, corpus side pruned to "
    "one column.",
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    batch = docs.filter(F.col("source") == "src1")
    corpus = docs.filter(F.col("source") != "src1")
    return incremental_new(batch, corpus).select("doc_id", "content_hash")


# --------------------------------------------------------------------------
# packing efficiency report
# --------------------------------------------------------------------------

_PACK_EFF_ORACLE = f"""
WITH toks AS (
    SELECT doc_id,
           CAST(len(str_split(text, ' ')) AS INT) AS n_tokens,
           {_bucket_sql('doc_id', PACK_SHARDS)} AS shard
    FROM documents
),
runs AS (
    SELECT doc_id, n_tokens, shard,
           COALESCE(SUM(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS cum_before
    FROM toks
),
packed AS (
    SELECT shard, n_tokens,
           CAST((shard << 40) + (cum_before // {PACK_CAPACITY}) AS BIGINT)
               AS bin_id
    FROM runs
)
SELECT shard,
       COUNT(DISTINCT bin_id) AS n_bins,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(n_tokens) AS DOUBLE)
           / (COUNT(DISTINCT bin_id) * {PACK_CAPACITY}.0) AS fill_rate
FROM packed
GROUP BY shard
"""


@register(
    "pack_efficiency",
    _PACK_EFF_ORACLE,
    doc="Packing-efficiency report over pack_sequences: bins, docs, "
    "token totals and fill rate per shard — the pipeline-health number "
    "a packing job publishes (fill_rate can exceed 1.0 because "
    "contiguous fill lets one doc straddle each bin boundary). Exact "
    "integer arithmetic end-to-end; the only double is the final "
    "int÷int ratio, bit-identical across engines.",
)
def pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split(F.col("text"), " ")).alias("n_tokens")
    )
    packed = pack_contiguous(docs)
    return packed.groupBy("shard").agg(
        F.countDistinct("bin_id").alias("n_bins"),
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        (
            F.sum("n_tokens").cast("double")
            / (F.countDistinct("bin_id") * F.lit(float(PACK_CAPACITY)))
        ).alias("fill_rate"),
    )


# --------------------------------------------------------------------------
# cross-split contamination audit
# --------------------------------------------------------------------------

_LEAK_ORACLE = f"""
WITH sh AS (
    SELECT doc_id, shingle FROM (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   range(1, greatest(len(toks) - 1, 1)),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
               ))) AS shingle
        FROM (SELECT doc_id, str_split(lower(text), ' ') AS toks
              FROM documents)
    )
),
splits AS (
    SELECT doc_id,
           CASE WHEN {_bucket_sql('doc_id', SPLIT_BUCKETS)} < 90 THEN 'train'
                WHEN {_bucket_sql('doc_id', SPLIT_BUCKETS)} < 95 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
),
train_sh AS (
    SELECT DISTINCT shingle FROM sh JOIN splits USING (doc_id)
    WHERE split = 'train'
),
test_sh AS (
    SELECT doc_id, shingle FROM sh JOIN splits USING (doc_id)
    WHERE split = 'test'
),
ov AS (
    SELECT doc_id, COUNT(DISTINCT shingle) AS n_in_train
    FROM test_sh JOIN train_sh USING (shingle) GROUP BY doc_id
),
tot AS (
    SELECT doc_id, COUNT(DISTINCT shingle) AS n_shingles
    FROM test_sh GROUP BY doc_id
)
SELECT tot.doc_id, tot.n_shingles,
       COALESCE(ov.n_in_train, 0) AS n_in_train,
       CAST(COALESCE(ov.n_in_train, 0) AS DOUBLE)
           / CAST(tot.n_shingles AS DOUBLE) AS leak_frac
FROM tot LEFT JOIN ov ON tot.doc_id = ov.doc_id
"""


@register(
    "split_leakage_audit",
    _LEAK_ORACLE,
    doc="Cross-split contamination audit: for every test-split document "
    "(hash_split assignment), the fraction of its 3-gram shingles that "
    "also occur in the train split — the leakage number a train/val/"
    "test pipeline must publish before anyone trains on the split. "
    "Distinct train shingles join test shingles on the shingle value; "
    "work scales with matches, never doc x doc.",
)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    splits = hash_split(docs).select("doc_id", "split")
    sh = _shingles_with_source(spark, sf_dir).select("doc_id", "shingle")
    sh_split = sh.join(splits, "doc_id")
    train_sh = (
        sh_split.filter(F.col("split") == "train").select("shingle").distinct()
    )
    test_sh = sh_split.filter(F.col("split") == "test").select(
        "doc_id", "shingle"
    )
    tot = test_sh.groupBy("doc_id").agg(
        F.countDistinct("shingle").alias("n_shingles")
    )
    ov = ngram_overlap(test_sh, train_sh)
    n_in_train = F.coalesce(F.col("n_shared"), F.lit(0))
    return tot.join(ov, "doc_id", "left").select(
        "doc_id",
        "n_shingles",
        n_in_train.alias("n_in_train"),
        (
            n_in_train.cast("double") / F.col("n_shingles").cast("double")
        ).alias("leak_frac"),
    )


# --------------------------------------------------------------------------
# corpus mixing (language rebalance)
# --------------------------------------------------------------------------

def _mix_case_sql() -> str:
    from evolution_data_warehouse_spark.operators.datapipe import (
        MIX_BUCKETS,
        MIX_RATES,
    )

    whens = " ".join(
        f"WHEN lang = '{g}' THEN {int(r * MIX_BUCKETS)}"
        for g, r in sorted(MIX_RATES.items())
    )
    return f"CASE {whens} ELSE {MIX_BUCKETS} END"


def _mix_oracle() -> str:
    from evolution_data_warehouse_spark.operators.datapipe import MIX_BUCKETS

    return f"""
SELECT doc_id, lang, source,
       {_bucket_sql('doc_id', MIX_BUCKETS)} AS mix_bucket,
       {_mix_case_sql()} AS keep_under
FROM documents
WHERE {_bucket_sql('doc_id', MIX_BUCKETS)} < {_mix_case_sql()}
"""


@register(
    "corpus_mix_sample",
    _mix_oracle(),
    doc="Deterministic corpus-mixing sampler (language rebalance): "
    "per-language keep rates applied as an md5-bucket threshold on the "
    "doc id — exact, reproducible Bernoulli mixing with zero shuffle; "
    "the rates are interpolated from operators/datapipe.py MIX_RATES "
    "into the oracle so engine and oracle cannot drift.",
)
def corpus_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from evolution_data_warehouse_spark.operators.datapipe import mix_sample

    return mix_sample(t(spark, sf_dir, "documents")).select(
        "doc_id", "lang", "source", "mix_bucket", "keep_under"
    )


# --------------------------------------------------------------------------
# per-source curation report
# --------------------------------------------------------------------------

def _source_report_oracle() -> str:
    from evolution_data_warehouse_spark.queries.common import davg_sql

    h = content_hash64_sql("text")
    return f"""
WITH hashed AS (
    SELECT source, lang, n_chars,
           COUNT(*) OVER (PARTITION BY {h}) AS n_same
    FROM documents
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN n_same > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup_docs,
       {davg_sql('n_chars', 2)} AS avg_chars,
       COUNT(DISTINCT lang) AS n_langs
FROM hashed
GROUP BY source
"""


@register(
    "source_quality_report",
    _source_report_oracle(),
    doc="Per-source curation rollup (the domain-level report a crawl "
    "pipeline uses to drop whole sources): doc counts, exact-duplicate "
    "counts via a window count over the content hash (shares one "
    "shuffle keyed on the hash), decimal-exact mean length, distinct "
    "languages. Two shuffles total regardless of corpus size.",
)
def source_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from evolution_data_warehouse_spark.operators.dedup import content_hash64
    from evolution_data_warehouse_spark.queries.common import davg
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents").select(
        "source", "lang", "n_chars", content_hash64(F.col("text")).alias("h")
    )
    n_same = F.count("*").over(Window.partitionBy("h"))
    return (
        docs.withColumn("n_same", n_same)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("n_same") > 1, 1).otherwise(0)).alias(
                "n_dup_docs"
            ),
            davg("n_chars", 2).alias("avg_chars"),
            F.countDistinct("lang").alias("n_langs"),
        )
    )


# --------------------------------------------------------------------------
# packed-sample rendering
# --------------------------------------------------------------------------

_PACK_RENDER_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, text,
           CAST(len(str_split(text, ' ')) AS INT) AS n_tokens,
           {_bucket_sql('doc_id', PACK_SHARDS)} AS shard
    FROM documents
),
runs AS (
    SELECT doc_id, text, n_tokens, shard,
           COALESCE(SUM(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS cum_before
    FROM toks
),
packed AS (
    SELECT doc_id, text, n_tokens, shard,
           CAST((shard << 40) + (cum_before // {PACK_CAPACITY}) AS BIGINT)
               AS bin_id
    FROM runs
)
SELECT bin_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
       string_agg(text, '<|endofdoc|>' ORDER BY doc_id) AS packed_text
FROM packed
GROUP BY bin_id
"""


@register(
    "pack_render",
    _PACK_RENDER_ORACLE,
    doc="Packed-sample rendering — the output half of sequence packing: "
    "each bin's documents concatenated in id order with a separator "
    "token, one training row per bin. One hash aggregate keyed on "
    "bin_id (collect_list is bounded by the bin capacity, so per-group "
    "state is O(context window), never O(corpus)).",
)
def pack_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
    )
    packed = pack_contiguous(docs)
    parts = F.array_sort(
        F.collect_list(F.struct("doc_id", "text")),
    )
    return packed.groupBy("bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("bin_tokens"),
        F.array_join(
            F.transform(parts, lambda s: s.getField("text")),
            "<|endofdoc|>",
        ).alias("packed_text"),
    )
