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

# Registration order is verification priority, not import order: the
# driver verifies the FIRST 50 registry entries each round, so the
# front of the registry is the set we most need a verdict on.  The
# round-7 window (per the CLAUDE.md rotation): the 45 entries that have
# never had an official driver verdict — the r6 additions plus the two
# r5 leftovers (session_conversion, win_gaps_islands) — all already
# green via tools/drive_contract.py (LOCAL_CONTRACT_r06.json, 243/243)
# AND via the r6 judge's independent 45/45 drive_contract run; then the
# 5 oldest-stale entries (r3 verdicts: the fn_dateadd…fn_ascii_fold
# scalar-fn block) to fill the window at exactly 50.  Queries added
# during round 7 land AFTER the window (verified locally by
# drive_contract) and lead the round-8 head.  End-of-r7 evidence: the
# whole 274-entry registry passed drive_contract at the harness
# defaults, AND registry-wide at a truly-vanilla 200-shuffle-partition
# session (274/274), AND registry-wide at sf0.1 (274/274, 10x the
# driver's verification scale) — the determinism rules are
# partition-count- and scale-independent across the full surface.
_R7_WINDOW = (
    # 45 never-driver-verified (r6 additions + 2 r5 leftovers)
    "mm_decode_real", "mm_png_metadata", "session_conversion",
    "win_gaps_islands", "fn_url_canonicalize", "text_html_strip",
    "pii_luhn_cards", "text_shingle_containment", "win_cumulative_unique",
    "ts_ewma_window", "agg_equidepth_histogram", "agg_benford_firstdigit",
    "join_delta_maintenance", "join_bloom_prefilter", "snapshot_table_diff",
    "agg_mad_outliers", "sample_weighted_det", "stream_trending_topk",
    "agg_linreg_slope", "agg_gini", "agg_rfm_segments", "fn_ip_cidr",
    "fn_base64_codec", "fn_date_parts", "text_sentence_stats",
    "dedup_url_canonical", "win_zscore_rolling", "agg_market_basket",
    "join_n_way_merge", "text_dedup_paragraphs", "agg_entropy",
    "src_csv_permissive", "corpus_mix_temperature", "curation_funnel_report",
    "dedup_fuzzy_names", "ts_gap_detection", "snapshot_column_drift",
    "event_stickiness", "ts_concurrency_sweep", "join_drill_across",
    "fn_uuid_from_hash", "event_churn_monthly", "event_transition_latency",
    "text_keywords_topk", "agg_pareto_deciles",
    # 5 oldest-stale (r3 verdicts)
    "fn_dateadd", "fn_date_format", "fn_concat", "fn_round_arith",
    "fn_ascii_fold",
)
_ordered: list[str] = list(_R7_WINDOW)
_ordered.extend(n for n in REGISTRY if n not in _ordered)
_missing = [n for n in _R7_WINDOW if n not in REGISTRY]
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
