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

# Registration order is verification priority, not import order: the
# driver verifies the FIRST 50 registry entries each round, so the
# front of the registry is the set we most need a verdict on.  After
# r1∪r2∪r3∪r4 every registry query has a green driver verdict; the
# round-5 window is sized to exactly 50: the 6 never-verified round-5
# additions (decontaminate_apply + five TPC-H shapes) lead, then the
# 17 queries whose only green dates to r1 (windows/sorts/sets/scalar-fn
# head — three rounds and one Spark minor version old, the one place a
# silent behavior drift could hide), then the 27 r2-stale entries.
# Everything registered after the 50-window (the second round-5 batch,
# the TPC-H completion set, and the round-5 additions: event analytics,
# corpus mixing/curation, stats/sketch/AQP aggregates, data-layout and
# maintenance queries, CDC, LM scoring, incremental near-dup — the
# never-verified entries in the COVERAGE.md ledger) deliberately lands
# AFTER the window: tools/drive_contract.py verifies all of it locally
# this round (plus vanilla-200-partition and sf0.1 spot checks), and it
# leads the round-6 window with the r3-stale refresh behind it per the
# CLAUDE.md rotation procedure.
_R5_NEW = (
    "decontaminate_apply",
    "tpch_q7", "tpch_q12", "tpch_q13", "tpch_q15", "tpch_q18",
)
_R1_STALE = (
    "win_version_latest", "win_topn_recent", "win_surrogate_key",
    "win_running_sum", "sort_multikey", "sort_view", "limit_topn",
    "set_union_all", "set_concat_append", "agg_distinct", "agg_rollup",
    "fn_zfill", "fn_regex_extract", "fn_cast_numeric", "fn_case_when",
    "fn_coalesce", "fn_nullif",
)
_R2_STALE = (
    "dedup_clusters", "dedup_embedding_lsh", "dedup_keep_canonical",
    "fn_current_ts", "fn_datediff", "mm_audio_features",
    "mm_embedding_quantize", "mm_frame_sample", "mm_resize_stub",
    "pandas_zscore", "proc_backup", "proc_log_etl", "proc_orchestration",
    "proc_refresh_stats", "profile_columns", "sim_ann_ivf", "sim_centroid",
    "sim_kmeans_assign", "snk_jdbc_roundtrip", "src_blob_list", "src_orc",
    "src_rest_api", "stream_interval_join", "stream_window_counts",
    "text_tfidf", "udf_extra_transform", "view_open_errors",
)
_ordered: list[str] = list(_R5_NEW)
_ordered.extend(n for n in _R1_STALE if n not in _ordered)
_ordered.extend(n for n in _R2_STALE if n not in _ordered)
_ordered.extend(n for n in REGISTRY if n not in _ordered)
_missing = [
    n for n in (_R5_NEW + _R1_STALE + _R2_STALE) if n not in REGISTRY
]
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
