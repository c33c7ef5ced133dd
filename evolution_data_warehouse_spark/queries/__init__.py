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

# Registration order is verification priority, not import order: the
# driver verifies the FIRST 50 registry entries each round, so the
# front of the registry is the set we most need a verdict on.  The
# round-12 window (per the CLAUDE.md rotation): the 61 entries added
# during round 11 have never had an official driver verdict (all 396
# green in LOCAL_CONTRACT_r11.json; 8 independently re-verified by the
# r11 judge).  The first 50 of them, in registration order, fill the
# r12 window exactly; the remaining 11 are placed immediately after so
# they lead the round-13 window.  Queries added during round 12 land
# after those (verified locally by drive_contract).
# Carried-forward evidence: end-of-r11 the full 396-query registry
# passed drive_contract (LOCAL_CONTRACT_r11.json) — the determinism
# rules are partition-count- and scale-independent across the full
# surface.
_R12_WINDOW = (
    # 50 never-driver-verified r11 additions (registration order)
    "mm_caption_alignment", "text_bm25_topk", "snk_shuffled_shards",
    "sim_rrf_fusion", "text_inverted_index", "tok_oov_rate",
    "text_quality_classifier", "corpus_dsir_weights", "graph_pagerank",
    "stream_dedup_ingest", "pack_multimodal", "quality_l_diversity",
    "agg_histogram_quantiles", "src_parquet_mergeschema", "fn_levenshtein",
    "fn_bitwise_ops", "stats_spearman_corr", "agg_skew_kurtosis",
    "quality_fk_orphans", "split_kfold_hash", "win_rsi", "ts_ohlc_bars",
    "graph_jaccard_neighbors", "snk_webdataset_shards", "src_xml_roundtrip",
    "dim_date_spine", "win_bollinger", "stats_cohens_d",
    "text_ngram_novelty", "event_window_funnel", "corpus_epoch_schedule",
    "limit_keyset_page", "quality_pk_uniqueness", "dedup_threshold_sweep",
    "stream_session_windows", "win_rolling_median", "graph_bfs_distance",
    "stats_cuped_adjust", "src_python_datasource", "udtf_sentence_stats",
    "snk_python_datasource", "fn_variant_extract", "ts_interpolate_linear",
    "join_lateral_topk", "pii_pseudonymize_join", "dedup_minhash_recall_eval",
    "join_bucketed_noshuffle", "ts_forecast_snaive_error",
    "win_winsorized_mean", "text_code_detect",
    # 11 remaining never-verified r11 additions — lead the r13 window
    "sim_ann_recall_eval", "event_inter_arrival_cv", "fe_target_encoding_loo",
    "emb_centroid_drift", "dedup_cluster_size_hist", "event_entropy_rate",
    "sim_ann_nprobe_sweep", "ts_peak_detection", "fn_math_suite",
    "agg_percent_of_parent", "join_asof_tolerance",
)
_ordered: list[str] = list(_R12_WINDOW)
_ordered.extend(n for n in REGISTRY if n not in _ordered)
_missing = [n for n in _R12_WINDOW if n not in REGISTRY]
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
