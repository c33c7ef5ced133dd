"""Round-12 query batch: cross-document exact-substring dedup
(ExactSubstr pairwise form), OPQ-rotated product quantization, and
DoReMi-style domain reweighting for the corpus-mixing family.

Same contract as every other registry module: each query is a Spark
callable plus a DuckDB oracle, aliased identically on both sides, with
the repo determinism rules (integer arithmetic wherever possible,
fixed-point quantization before any float comparison, tie-broken
ordering, no native round()).

Reference parity note: the reference (haelbrek/Evolution-DATA-WAREHOUSE)
has no substring-level dedup, vector-quantization, or corpus-mixing
surface (its dedup is row-level DISTINCT, transformation/nettoyage.py)
— this batch extends the LLM-pipeline layer beyond reference parity
(the declared SURVEY §7 growth direction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from evolution_data_warehouse_spark.operators.dedup import (
    content_hash64_sql as _ch64_sql,
)
from evolution_data_warehouse_spark.queries.common import (
    fpq,
    fpq_sql,
    register,
    t,
)

# ---------------------------------------------------------------------------
# dedup_substring_cross — cross-document ExactSubstr (Lee et al. 2022)
# ---------------------------------------------------------------------------

_XS_W = 5
_XS_MAX_DF = 1000  # anchor-frequency guard, interpolated into the
# oracle below so engine and oracle can never diverge silently (same
# pattern as DEFAULT_MAX_BUCKET / DEFAULT_MAX_SHINGLE_DF)

_XS_ORACLE = f"""
WITH toks AS (SELECT doc_id, str_split(lower(text), ' ') AS tk FROM documents),
wins AS (
    SELECT doc_id, CAST(i AS BIGINT) AS pos,
           {_ch64_sql(f"array_to_string(tk[i:i+{_XS_W - 1}], ' ')")} AS h
    FROM toks, LATERAL unnest(range(1, len(tk) - {_XS_W} + 2)) t(i)
    WHERE len(tk) >= {_XS_W}
),
anch AS (
    SELECT doc_id, pos, h FROM (
        SELECT doc_id, pos, h, COUNT(*) OVER (PARTITION BY h) AS df
        FROM wins
    ) WHERE df BETWEEN 2 AND {_XS_MAX_DF}
),
m AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pos_a,
           a.pos - b.pos AS diag
    FROM anch a JOIN anch b USING (h)
    WHERE a.doc_id < b.doc_id
),
runs AS (
    SELECT doc_a, doc_b, diag, pos_a,
           pos_a - ROW_NUMBER() OVER (PARTITION BY doc_a, doc_b, diag
                                      ORDER BY pos_a) AS island
    FROM m
),
spans AS (
    SELECT doc_a, doc_b, diag, island,
           MAX(pos_a) - MIN(pos_a) + {_XS_W} AS span_tokens
    FROM runs GROUP BY doc_a, doc_b, diag, island
)
SELECT doc_a, doc_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared_spans,
       CAST(MAX(span_tokens) AS BIGINT) AS longest_span_tokens,
       CAST(SUM(span_tokens) AS BIGINT) AS shared_tokens
FROM spans GROUP BY doc_a, doc_b
"""


@register(
    "dedup_substring_cross",
    _XS_ORACLE,
    doc="Cross-document exact-substring dedup — the pairwise form of "
    "Lee et al. 2022's ExactSubstr (operators/dedup.py::"
    "cross_substring_spans): which document PAIRS share a verbatim "
    ">= 5-token run, where, and how long. Anchor k-gram hashes are "
    "df-guarded (window-count + filter sharing the pair join's "
    "exchange), the pair join runs on the hash key only (bucket-keyed "
    "equi-join, never all-pairs — plan-locked), and within-pair span "
    "extension is a gaps-and-islands pass per alignment diagonal. "
    "All-integer output, exactly engine-reproducible. Complements "
    "dedup_substring_spans (per-document span marking) with the "
    "provenance question cross-snapshot curation needs. The reference "
    "has no substring-level operator (row-level DISTINCT only, "
    "transformation/nettoyage.py).",
)
def dedup_substring_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    from evolution_data_warehouse_spark.operators.dedup import (
        cross_substring_spans,
    )

    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.lower(F.col("text")), " ").alias("tk")
    )
    return cross_substring_spans(docs, w=_XS_W, max_anchor_df=_XS_MAX_DF)
