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

# Registration order is verification priority, not import order: the
# driver verifies the FIRST 50 registry entries each round, so the
# front of the registry is the set we most need a verdict on.  The
# round-10 window (per the CLAUDE.md rotation): first the 12 round-9
# additions that have never had an official driver verdict (all green
# in LOCAL_CONTRACT_r09.json at 307/307 and independently re-verified
# 12/12 by the r9 judge), then the 38 alphabetically-first entries of
# the 47-entry r4-stale block (the relational core + data-pipe batch)
# to fill the window at exactly 50.  The 9 remaining r4-stale entries
# (src_csv .. win_session_gap) lead the r11 fill.  Queries added
# during round 10 land AFTER the window (verified locally by
# drive_contract) and lead the round-11 head.  Carried-forward
# evidence: end-of-r9 the full 307-query registry passed
# drive_contract (LOCAL_CONTRACT_r09.json) — the determinism rules are
# partition-count- and scale-independent across the full surface.
_R10_WINDOW = (
    # 12 never-driver-verified (the r9 additions, registration order)
    "dedup_image_phash", "web_corpus_curation", "mm_audio_companding",
    "sim_pq_assign", "web_charset_detect", "src_sitemap_urls",
    "web_main_content", "web_robots_filter", "mm_exif_gps_redact",
    "sim_ivfpq_topk", "proc_zorder_report", "tok_bpe_encode",
    # 38 alphabetically-first r4-stale entries to fill the 50
    "agg_count", "agg_filtered_multi", "agg_groupby_sum", "agg_pivot",
    "agg_ratio_postagg", "agg_scalar_lookup", "agg_skew_salted",
    "agg_string_concat", "decontaminate_ngram", "dedup_incremental",
    "dedup_rows", "filter_current_version", "filter_dropna_keys",
    "filter_equality", "filter_null_pred", "filter_threshold",
    "filter_view_level", "fn_array_ops", "fn_date_trunc",
    "join_anti_notexists", "join_broadcast_lookup", "join_change_detect",
    "join_cross", "join_full_merge_events", "join_inner_equi",
    "join_left_outer", "join_left_subquery", "join_range_bucketed",
    "join_self_hierarchy", "join_semi_exists", "join_skew_salted",
    "pack_sequences", "proj_rename_normalize", "proj_select",
    "sample_stratified_hash", "snk_json", "snk_parquet",
    "split_train_hash",
)
_ordered: list[str] = list(_R10_WINDOW)
_ordered.extend(n for n in REGISTRY if n not in _ordered)
_missing = [n for n in _R10_WINDOW if n not in REGISTRY]
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
