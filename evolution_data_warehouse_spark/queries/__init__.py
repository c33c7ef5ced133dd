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
from evolution_data_warehouse_spark.queries import extensions_r12 as _extensions_r12  # noqa: E402,F401
from evolution_data_warehouse_spark.queries import extensions_r13 as _extensions_r13  # noqa: E402,F401

# Registration order is verification priority, not import order: the
# driver verifies the FIRST 50 registry entries each round, so the
# front of the registry is the set we most need a verdict on.  The
# round-13 window (per the CLAUDE.md rotation and the r12 verdict's
# directive #1): the 33 entries never yet in a driver window (the 11
# r11 leftovers + 22 r12 mid-round additions, all green in
# LOCAL_CONTRACT_r12.json and 7 of them judge-re-verified), then the
# remaining 17 slots from the oldest-verdict block — the r5 set —
# so after this round no entry's official verdict is older than r6.
# Queries added during round 13 land after the window (verified
# locally by drive_contract) and lead the round-14 window.
_R13_WINDOW = (
    # 11 never-driver-verified r11 additions (carried from r12 tail)
    "sim_ann_recall_eval", "event_inter_arrival_cv", "fe_target_encoding_loo",
    "emb_centroid_drift", "dedup_cluster_size_hist", "event_entropy_rate",
    "sim_ann_nprobe_sweep", "ts_peak_detection", "fn_math_suite",
    "agg_percent_of_parent", "join_asof_tolerance",
    # 22 never-driver-verified r12 additions (registration order)
    "dedup_substring_cross", "sim_opq_assign", "sim_pq_opq_recall",
    "corpus_doremi_weights", "stream_minhash_ingest", "agg_hll_distinct",
    "emb_binarize_hamming", "stats_chi2_independence",
    "event_markov_stationary", "fe_woe_encoding", "text_quality_ccnet",
    "stream_hll_merge", "emb_matryoshka_eval", "quality_psi_drift",
    "graph_hits", "dedup_bloom_prefilter", "graph_kcore",
    "stream_scd2_ingest", "event_attribution_ushape",
    "event_attribution_timedecay", "agg_hll_sliding_distinct",
    "text_template_ratio",
    # 17 oldest-verdict entries (official verdict r5) — refresh them
    "src_rest_api", "snk_jdbc_roundtrip", "src_blob_list",
    "win_version_latest", "win_topn_recent", "win_surrogate_key",
    "sort_multikey", "limit_topn", "sort_view", "set_union_all",
    "set_concat_append", "fn_zfill", "udf_extra_transform",
    "proc_log_etl", "proc_refresh_stats", "proc_backup",
    "proc_orchestration",
)
_ordered: list[str] = list(_R13_WINDOW)
_ordered.extend(n for n in REGISTRY if n not in _ordered)
_missing = [n for n in _R13_WINDOW if n not in REGISTRY]
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
