"""Round-10 query batch: the refine stage that completes the IVF-PQ
search architecture (IVFADC+refine — compressed-domain shortlist,
exact re-rank on raw vectors), the full published Gopher text-quality
rule suite, frame-level audio spectral fingerprints + banded audio
near-dup, WARC revisit-record handling with cross-crawl digest dedup,
and the sitemap→robots crawl-frontier composition.

Same contract as every other registry module: each query is a Spark
callable plus a DuckDB oracle, aliased identically on both sides, with
the repo determinism rules (integer arithmetic wherever possible,
fixed-point quantization before any float aggregation, tie-broken
ordering, no native round()).

Reference parity note: the reference (haelbrek/Evolution-DATA-WAREHOUSE)
is a curated-CSV warehouse with no ANN/media/crawl surface — this
batch extends the engine's LLM-training-pipeline coverage beyond
reference parity (the declared SURVEY §7 growth direction), composing
operators that are each already oracle-proven.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from evolution_data_warehouse_spark.queries.common import (
    register,
    t,
)
from evolution_data_warehouse_spark.queries.extensions_r9 import (
    _IVFPQ_NPROBE,
    _IVFPQ_TOPK,
    _PQ_BOOKS,
    _PQ_QUERY,
    _ivfpq_adc_df,
    _pq_adc_sql,
    _pq_dist_code_sql,
    _pq_vdefs_sql,
)

# ---------------------------------------------------------------------------
# IVF-PQ + exact refine — the production IVFADC+refine composition
# ---------------------------------------------------------------------------

_IVFPQ_RERANK = 100


def _ivfpq_refine_oracle() -> str:
    from evolution_data_warehouse_spark.operators.similarity import (
        PQ_SCALE,
        pq_adc_lut,
        pq_probe_lists,
        pq_quantize_codebooks,
    )
    from evolution_data_warehouse_spark.queries.pq_codebooks import (
        PQ_COARSE,
    )

    fine_d, fine_c = _pq_dist_code_sql(
        pq_quantize_codebooks(_PQ_BOOKS), "d"
    )
    coarse_d, coarse_c = _pq_dist_code_sql(
        pq_quantize_codebooks([PQ_COARSE]), "g"
    )
    adc = _pq_adc_sql(pq_adc_lut(_PQ_BOOKS, _PQ_QUERY), "d")
    probes = pq_probe_lists(PQ_COARSE, _PQ_QUERY, _IVFPQ_NPROBE)
    qq = [round(x * PQ_SCALE) for x in _PQ_QUERY]
    qlit = "[" + ", ".join(str(q) for q in qq) + "]"
    return f"""
WITH v AS (SELECT vec_id, {_pq_vdefs_sql()} FROM embeddings),
d AS (SELECT vec_id, {", ".join(fine_d + coarse_d)} FROM v),
c AS (SELECT vec_id, {", ".join(fine_c + coarse_c)} FROM d),
shortlist AS (
    SELECT vec_id,
           CAST(gcode0 AS INT) AS list_id,
           CAST({adc} AS BIGINT) AS adc_dist
    FROM c
    WHERE gcode0 IN ({", ".join(str(p) for p in probes)})
    ORDER BY adc_dist, vec_id
    LIMIT {_IVFPQ_RERANK}
),
q AS (SELECT {qlit} AS qq)
SELECT s.vec_id, s.list_id, s.adc_dist,
       CAST(list_sum(list_transform(v.vq,
            (x, i) -> (x - qq[i]) * (x - qq[i]))) AS BIGINT) AS exact_dist
FROM shortlist s JOIN v ON s.vec_id = v.vec_id CROSS JOIN q
ORDER BY exact_dist, s.vec_id
LIMIT {_IVFPQ_TOPK}
"""


@register(
    "sim_ivfpq_refine",
    _ivfpq_refine_oracle(),
    doc="IVF-PQ search with exact re-rank (FAISS's IVFADC+refine, the "
    "production shape): the compressed-domain scan (sim_ivfpq_topk's "
    "single coarse-probe + ADC pass) finds the top-100 CANDIDATES, "
    "and only those 100 rows join back to the raw vectors for an "
    "exact fixed-point L2 re-rank to the final top-25 — the refine "
    "step that fixes PQ quantization error and makes compressed-scan "
    "recall usable. The raw-vector join touches ONLY the R candidates "
    "(the 100-row shortlist is the broadcast build side; the probed "
    "lists are never re-joined) — at 100 TB the ADC scan reads the "
    "~32x-compressed code table and this stage fetches R raw vectors "
    "by key, so refine cost is O(R·d) regardless of corpus size. "
    "exact_dist is the deterministic fixed-point metric (database "
    "vectors floor(v*PQ_SCALE), query round(q*PQ_SCALE) — the ADC-"
    "side query quantization), tie-broken (exact_dist, vec_id). "
    "Refine-vs-ADC recall gain is measured in test_properties.",
)
def sim_ivfpq_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from evolution_data_warehouse_spark.operators.similarity import (
        PQ_SCALE,
    )

    shortlist = (
        _ivfpq_adc_df(spark, sf_dir)
        .orderBy("adc_dist", "vec_id")
        .limit(_IVFPQ_RERANK)
    )
    qq = [round(x * PQ_SCALE) for x in _PQ_QUERY]
    vq = F.transform(
        F.col("embedding"),
        lambda x: F.floor(
            x.cast("double") * F.lit(float(PQ_SCALE))
        ).cast("long"),
    )
    qarr = F.array(*[F.lit(int(q)).cast("long") for q in qq])
    exact = F.aggregate(
        F.zip_with(vq, qarr, lambda v, q: (v - q) * (v - q)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    emb = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return (
        emb.join(F.broadcast(shortlist), "vec_id")
        .select(
            "vec_id",
            "list_id",
            "adc_dist",
            exact.cast("bigint").alias("exact_dist"),
        )
        .orderBy("exact_dist", "vec_id")
        .limit(_IVFPQ_TOPK)
    )


# ---------------------------------------------------------------------------
# Gopher text-quality rule suite — the full published gate, one scan
# ---------------------------------------------------------------------------


def _gopher_oracle() -> str:
    from evolution_data_warehouse_spark.operators.gopher import (
        gopher_flags_sql,
        gopher_metrics_sql,
    )

    m = gopher_metrics_sql("COALESCE(text, '')")
    f = gopher_flags_sql()
    mcols = ", ".join(f"{sql} AS {name}" for name, sql in m.items())
    fcols = ", ".join(f"{sql} AS {name}" for name, sql in f.items())
    return f"""
WITH m AS (SELECT doc_id, {mcols} FROM documents)
SELECT doc_id, n_words, total_chars, n_alpha_words, n_symbols,
       n_lines, n_bullet_lines, n_ellipsis_lines, stop_hits,
       {fcols}
FROM m
"""


@register(
    "text_quality_gopher",
    _gopher_oracle(),
    doc="The complete published Gopher quality-rule suite (Rae et al. "
    "2021 §A1.1; operators/gopher.py) as ONE scan: word-count bounds, "
    "mean word length 3-10, symbol-to-word ratio, bullet-line and "
    "ellipsis-line ratios, alphabetic-word fraction, and stop-word "
    "presence (occurrence-counted, the public RedPajama/Dolma "
    "reading), each emitted as a boolean beside its integer evidence "
    "counts plus the conjunction verdict — the per-rule observability "
    "a curation operator needs to tune thresholds. Every ratio is an "
    "integer cross-multiplication, never a float division, so "
    "verdicts are bit-identical across engines and partitionings. "
    "Pure column expressions over one documents scan — whole-stage "
    "codegen, zero shuffle, zero Python — the same single-scan shape "
    "as quality_expectations (plan-locked); gates a 100 TB corpus at "
    "scan speed and drops into web_corpus_curation as a funnel stage.",
)
def text_quality_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    from evolution_data_warehouse_spark.operators.gopher import (
        gopher_flags,
        gopher_metrics,
    )

    text = F.coalesce(F.col("text"), F.lit(""))
    m = gopher_metrics(text)
    f = gopher_flags(m)
    return t(spark, sf_dir, "documents").select(
        "doc_id",
        *[c.alias(name) for name, c in m.items()],
        *[c.alias(name) for name, c in f.items()],
    )
