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

# Registration order is verification priority, not import order: the
# driver verifies the FIRST 50 registry entries each round, so the
# front of the registry is the set we most need a verdict on.  The
# round-8 window (per the CLAUDE.md rotation): first the 2 r7 driver
# FAILs (win_cumulative_unique, ts_concurrency_sweep — the HUGEINT
# oracle-type defect, fixed this round by CAST(... AS BIGINT) on the
# oracle side; the whole class is now fenced by
# tests/test_oracle_types.py), then the 31 r7 additions that have
# never had an official driver verdict (all green in
# LOCAL_CONTRACT_r07.json and re-verified after the r8 HUGEINT casts),
# then the 17 alphabetically-first of the 43 r3-stale entries to fill
# the window at exactly 50.  Queries added during round 8 land AFTER
# the window (verified locally by drive_contract) and lead the
# round-9 head.  Carried-forward evidence: end-of-r7 the whole
# registry passed drive_contract at harness defaults, at a truly-
# vanilla 200-shuffle-partition session, AND at sf0.1 (274/274 on all
# three axes) — the determinism rules are partition-count- and
# scale-independent across the full surface.  The 14 round-8 additions
# (mm_decode_progressive, join_spatial_grid, stats_ab_test,
# quality_k_anonymity, surv_kaplan_meier, agg_countmin_sketch,
# stats_mannwhitney_u, stats_ks_two_sample, drift_psi,
# mm_decode_interlaced, tok_bpe_segment, mm_decode_tolerant,
# mm_video_frames, agg_kmv_overlap) carry the
# same three-axis evidence: defaults (LOCAL_CONTRACT_r08.json plus a
# follow-up for the last addition), a 200-shuffle-partition session,
# and sf0.1 — all green.
_R8_WINDOW = (
    # 2 r7 driver FAILs, fixed (HUGEINT oracle outputs cast to BIGINT)
    "win_cumulative_unique", "ts_concurrency_sweep",
    # 31 never-driver-verified (the r7 additions, registration order)
    "text_hapax_ratio", "corpus_token_drift", "pii_scan_report",
    "win_yoy_growth", "seq_top_paths", "graph_copurchase_triangles",
    "graph_degree_distribution", "ts_autocorr_daily", "agg_skew_report",
    "agg_bitmap_presence", "agg_cramers_v", "text_charclass_profile",
    "emb_centroid_separation", "mm_decode_jpeg", "text_zipf_slope",
    "session_duration_pct", "agg_theil_index", "ts_weekday_seasonality",
    "win_drawdown_max", "agg_hhi_concentration", "text_simpson_diversity",
    "event_cooccurrence_pmi", "ts_revenue_anomaly_months",
    "agg_heavy_hitters_mg", "mm_channel_histogram", "warehouse_time_travel",
    "event_error_spike", "quality_key_gaps", "text_ttr_curve",
    "quality_financial_reconcile", "ts_cusum_drift",
    # 17 oldest-stale (r3 verdicts, alphabetical)
    "agg_approx_distinct", "agg_cube", "agg_grouping_sets",
    "agg_percentile", "dedup_embedding_cosine", "dedup_exact",
    "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_simhash",
    "fn_array_join", "fn_derived_measure", "fn_explode",
    "fn_json_serialize", "fn_map_ops", "fn_string_suite",
    "fn_struct_extract", "fn_unpivot",
)
_ordered: list[str] = list(_R8_WINDOW)
_ordered.extend(n for n in REGISTRY if n not in _ordered)
_missing = [n for n in _R8_WINDOW if n not in REGISTRY]
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
