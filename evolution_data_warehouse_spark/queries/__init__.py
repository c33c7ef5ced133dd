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

# Registration order is verification priority, not import order: the
# driver verifies the FIRST 50 registry entries each round, so the
# front of the registry is the set we most need a verdict on.  After
# rounds 1+2, 99/126 queries have a green CORRECTNESS row; the 27
# below never had one (the §2.8 scalar-fn tail, TPC-H, and the
# beyond-reference extensions sat past entry 50 both rounds).  They
# lead round 3, followed by the highest-value re-confirms (SCD/RLS
# procs, the LLM dedup family, streaming) filling the window's
# remaining 23 slots; everything already double-covered comes last.
_R3_DARK = (
    # §2.8 scalar-function tail (no driver verdict in r1/r2)
    "fn_dateadd", "fn_date_format", "fn_concat", "fn_round_arith",
    "fn_ascii_fold", "fn_array_join", "fn_explode", "fn_json_serialize",
    "fn_struct_extract", "fn_derived_measure",
    # TPC-H composite set
    "tpch_q1", "tpch_q3", "tpch_q5", "tpch_q6",
    # beyond-reference extensions
    "set_intersect", "set_except", "win_session_gap", "agg_cube",
    "agg_percentile", "fn_unpivot", "agg_approx_distinct", "fn_map_ops",
    "win_lag_lead", "join_range_bucketed", "win_ntile_rank",
    "agg_grouping_sets", "fn_string_suite",
)
# High-value re-confirms for the window's remaining slots: the proc /
# warehouse family and the LLM data-pipeline family (the operators a
# 100 TB user leans on hardest).
_R3_RECONFIRM_MODULES = (_scd, _dashboard, _llm_ops, _streaming_ops)


def _module_names(mod) -> list[str]:
    return [n for n, q in REGISTRY.items() if q.fn.__module__ == mod.__name__]


_ordered: list[str] = list(_R3_DARK)
for _mod in _R3_RECONFIRM_MODULES:
    _ordered.extend(n for n in _module_names(_mod) if n not in _ordered)
_ordered.extend(n for n in REGISTRY if n not in _ordered)
_missing = [n for n in _R3_DARK if n not in REGISTRY]
assert not _missing, f"_R3_DARK names absent from REGISTRY: {_missing}"
_reordered = {name: REGISTRY[name] for name in _ordered}
assert len(_reordered) == len(REGISTRY)
REGISTRY.clear()
REGISTRY.update(_reordered)

__all__ = ["REGISTRY", "Query"]
