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
from evolution_data_warehouse_spark.queries import extensions_r14 as _extensions_r14  # noqa: E402,F401

# Registration order is verification priority, not import order: the
# driver verifies the FIRST 50 registry entries each round, so the
# front of the registry is the set we most need a verdict on.  The
# round-14 window (per the CLAUDE.md rotation and the r13 verdict's
# directive #1): the 39 r13 mid-round additions never yet in a driver
# window (all green in LOCAL_CONTRACT_r13.json at sf0.01 AND sf0.1),
# then 11 slots from the oldest-verdict block — the r5 set — so the
# remaining r5-era verdicts (9 entries) lead the round-15 window.
# Queries added during round 14 land after the window (verified
# locally by drive_contract) and lead the round-15 window.
_R14_WINDOW = (
    # 39 never-driver-verified r13 additions (registration order)
    "dedup_substring_maximal", "sim_ann_frontier", "stream_lateness_audit",
    "snk_partitioned_prune", "sim_ivf_balance_report",
    "text_query_likelihood", "corpus_dup_rate_by_source",
    "sim_adc_batch_topk", "emb_pca_recon_error", "dedup_minhash_band_sweep",
    "stats_permutation_test", "corpus_token_budget_plan",
    "quality_t_closeness", "graph_modularity", "fe_feature_hashing",
    "ts_acf_multi_lag", "ts_seasonal_residual_anomaly",
    "stats_power_analysis", "emb_knn_graph", "corpus_quality_mix_report",
    "tok_fertility_by_lang", "sim_lsh_recall_eval",
    "quality_dp_count_release", "graph_assortativity",
    "text_burstiness_dispersion", "ivm_agg_retraction",
    "text_keyphrase_rake", "ts_theil_sen_trend", "tok_vocab_coverage_curve",
    "join_asof_nearest", "src_jsonl_quarantine", "fn_try_arithmetic",
    "corpus_cross_source_overlap", "mm_phash_threshold_sweep",
    "stream_ivm_ingest", "er_blocking_eval", "tok_bpe_merge_curve",
    "graph_clustering_coeff", "stream_lateness_policy_sweep",
    # 11 oldest-verdict entries (official verdict r5) — refresh them
    "win_running_sum", "sim_centroid", "sim_kmeans_assign", "sim_ann_ivf",
    "mm_resize_stub", "mm_frame_sample", "mm_audio_features",
    "pandas_zscore", "mm_embedding_quantize", "text_tfidf", "src_orc",
)
_ordered: list[str] = list(_R14_WINDOW)
_ordered.extend(n for n in REGISTRY if n not in _ordered)
_missing = [n for n in _R14_WINDOW if n not in REGISTRY]
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
