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

# Registration order is verification priority, not import order: the
# driver verifies the FIRST 50 registry entries each round, so the
# front of the registry is the set we most need a verdict on.  The
# round-9 window (per the CLAUDE.md rotation): first the 21 round-8
# additions that have never had an official driver verdict (all green
# in LOCAL_CONTRACT_r08.json at 295/295, plus 200-shuffle-partition
# and sf0.1 spot checks), then the whole 26-entry r3-stale block, then
# the 3 alphabetically-first r4-stale entries to fill the window at
# exactly 50.  After this round no entry's freshest driver verdict is
# older than round 4.  Queries added during round 9 land AFTER the
# window (verified locally by drive_contract) and lead the round-10
# head.  Carried-forward evidence: end-of-r8 the full 295-query
# registry passed drive_contract (LOCAL_CONTRACT_r08.json) — the
# determinism rules are partition-count- and scale-independent across
# the full surface.
_R9_WINDOW = (
    # 21 never-driver-verified (the r8 additions, registration order)
    "mm_decode_progressive", "join_spatial_grid", "stats_ab_test",
    "quality_k_anonymity", "surv_kaplan_meier", "agg_countmin_sketch",
    "stats_mannwhitney_u", "stats_ks_two_sample", "drift_psi",
    "mm_decode_interlaced", "tok_bpe_segment", "mm_decode_tolerant",
    "mm_video_frames", "agg_kmv_overlap", "dedup_substring_spans",
    "sim_semantic_dedup", "mm_decode_gif", "quality_blocklist_phrases",
    "mm_decode_paletted", "mm_audio_wav", "src_warc_records",
    # all 26 remaining r3-stale entries (alphabetical)
    "join_asof", "mm_decode_stub", "proc_scd1", "proc_scd2",
    "proc_scd2_rekey", "proc_scd3", "set_except", "set_intersect",
    "sim_ann_bruteforce", "sim_ann_lsh", "text_fingerprint",
    "text_langid", "text_quality", "text_redact", "text_tokens",
    "tpch_q1", "tpch_q3", "tpch_q5", "tpch_q6", "udtf_rls_predicate",
    "view_dashboard_twograin", "view_scd3_changes", "view_scd_history",
    "view_scd_summary", "win_lag_lead", "win_ntile_rank",
    # 3 oldest r4-stale entries (alphabetical) to fill the 50
    "agg_approx_percentile", "agg_avg_min_max", "agg_conditional_sum",
)
_ordered: list[str] = list(_R9_WINDOW)
_ordered.extend(n for n in REGISTRY if n not in _ordered)
_missing = [n for n in _R9_WINDOW if n not in REGISTRY]
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
