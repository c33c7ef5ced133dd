"""Query registry: op-id → (Spark callable, DuckDB oracle SQL).

Every operator from SURVEY.md §2 that is implemented gets a named entry
here; ``__spark_entry__.py`` exposes the registry to the driver, which
hash-checks each Spark result against its oracle at sf0.01.

Determinism rules applied across the registry (see queries/common.py):

* double aggregates go through per-row DECIMAL casts so the sum is
  exact and independent of partitioning / execution order, then back
  to DOUBLE — bit-identical between Spark and DuckDB;
* any LIMIT/top-N is fully tie-broken by a unique key;
* pivots pin their value lists; collected lists are sorted.
"""

from __future__ import annotations

from evolution_data_warehouse_spark.queries.common import REGISTRY, Query

# Importing the modules populates REGISTRY via the @register decorator.
from evolution_data_warehouse_spark.queries import relational as _relational  # noqa: E402,F401
from evolution_data_warehouse_spark.queries import scalar_fns as _scalar_fns  # noqa: E402,F401
from evolution_data_warehouse_spark.queries import scd as _scd  # noqa: E402,F401
from evolution_data_warehouse_spark.queries import llm_ops as _llm_ops  # noqa: E402,F401
from evolution_data_warehouse_spark.queries import streaming_ops as _streaming_ops  # noqa: E402,F401
from evolution_data_warehouse_spark.queries import sources_ext as _sources_ext  # noqa: E402,F401
from evolution_data_warehouse_spark.queries import extensions as _extensions  # noqa: E402,F401
from evolution_data_warehouse_spark.queries import tpch_style as _tpch_style  # noqa: E402,F401
from evolution_data_warehouse_spark.queries import dashboard as _dashboard  # noqa: E402,F401
from evolution_data_warehouse_spark.queries import datapipe as _datapipe  # noqa: E402,F401
from evolution_data_warehouse_spark.queries import event_analytics as _event_analytics  # noqa: E402,F401
from evolution_data_warehouse_spark.queries import extensions_r6 as _extensions_r6  # noqa: E402,F401
from evolution_data_warehouse_spark.queries import extensions_r7 as _extensions_r7  # noqa: E402,F401
from evolution_data_warehouse_spark.queries import extensions_r8 as _extensions_r8  # noqa: E402,F401
from evolution_data_warehouse_spark.queries import extensions_r9 as _extensions_r9  # noqa: E402,F401
from evolution_data_warehouse_spark.queries import extensions_r10 as _extensions_r10  # noqa: E402,F401
from evolution_data_warehouse_spark.queries import extensions_r11 as _extensions_r11  # noqa: E402,F401
from evolution_data_warehouse_spark.queries import extensions_r11b as _extensions_r11b  # noqa: E402,F401

# Registration order is verification priority, not import order: the
# driver verifies the FIRST 50 registry entries each round, so the
# front of the registry is the set we most need a verdict on.  The
# round-11 window (per the CLAUDE.md rotation): first the 28 round-10
# additions that have never had an official driver verdict (all green
# in LOCAL_CONTRACT_r10.json at 335/335; 8 of them independently
# re-verified by the r10 judge), then the 9 remaining r4-stale entries
# (src_csv .. win_session_gap), then the 13 alphabetically-first
# entries of the 50-entry r5 block to fill the window at exactly 50.
# Queries added during round 11 land AFTER the window (verified
# locally by drive_contract) and lead the round-12 head.
# Carried-forward evidence: end-of-r10 the full 335-query registry
# passed drive_contract (LOCAL_CONTRACT_r10.json) — the determinism
# rules are partition-count- and scale-independent across the full
# surface.
_R11_WINDOW = (
    # 28 never-driver-verified (the r10 additions, registration order)
    "sim_ivfpq_refine", "text_quality_gopher", "mm_audio_spectral",
    "dedup_audio_fingerprint", "src_warc_revisit", "dedup_crawl_snapshots",
    "web_frontier_build", "text_repetition_gopher", "text_quality_c4",
    "dedup_lines_corpus", "decontaminate_semantic", "tok_compression_ratio",
    "mm_video_keyframes", "mm_image_quality", "mm_image_curation",
    "mm_audio_quality", "mm_audio_curation", "mm_video_curation",
    "web_url_quality", "snk_jsonl_shards", "quality_profile_table",
    "stream_quality_gate", "stats_bootstrap_ci", "agg_weighted_percentile",
    "pack_curriculum", "win_streak_islands", "stats_mad_outliers",
    "ts_acf_lag1",
    # 9 remaining r4-stale entries (last official verdict: round 4)
    "src_csv", "src_json_nested", "text_repetition", "tpch_q10",
    "tpch_q14", "tpch_q19", "tpch_q4", "win_pct_dist", "win_session_gap",
    # 13 alphabetically-first r5-stale entries to fill the 50
    "agg_distinct", "agg_rollup", "decontaminate_apply", "dedup_clusters",
    "dedup_embedding_lsh", "dedup_keep_canonical", "fn_case_when",
    "fn_cast_numeric", "fn_coalesce", "fn_current_ts", "fn_datediff",
    "fn_nullif", "fn_regex_extract",
)
_ordered: list[str] = list(_R11_WINDOW)
_ordered.extend(n for n in REGISTRY if n not in _ordered)
_missing = [n for n in _R11_WINDOW if n not in REGISTRY]
if _missing:
    raise RuntimeError(f"priority names absent from REGISTRY: {_missing}")
_reordered = {name: REGISTRY[name] for name in _ordered}
if len(_reordered) != len(REGISTRY):
    raise RuntimeError(
        f"registry reorder dropped entries: {len(_reordered)} != {len(REGISTRY)}"
    )
REGISTRY.clear()
REGISTRY.update(_reordered)

__all__ = ["REGISTRY", "Query"]
