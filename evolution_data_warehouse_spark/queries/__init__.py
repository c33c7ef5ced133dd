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
# driver walks the registry front-to-back, so queries that have never
# had a driver verdict (round-1 stopped at entry 50) come first —
# SCD/RLS procs, the §2.8 scalar-function tail, the LLM data-pipeline
# family, streaming, external sources, TPC-H — followed by the
# beyond-reference extensions, with round-1-green §2.2-§2.7 queries
# last (their evidence is already on record in CORRECTNESS_r01.json).
_PRIORITY_MODULES = (
    _scd,
    _dashboard,
    _llm_ops,
    _streaming_ops,
    _sources_ext,
    _scalar_fns,  # §2.8 core ahead of beyond-reference extensions
    _tpch_style,
    _extensions,
    _relational,
)
_r1_green_scalars = {
    "fn_zfill", "fn_regex_extract", "fn_cast_numeric",
    "fn_case_when", "fn_coalesce", "fn_nullif",
}


def _module_names(mod) -> list[str]:
    return [n for n, q in REGISTRY.items() if q.fn.__module__ == mod.__name__]


_ordered: list[str] = []
for _mod in _PRIORITY_MODULES:
    _names = _module_names(_mod)
    if _mod is _scalar_fns:  # unverified tail ahead of round-1-green heads
        _names.sort(key=lambda n: n in _r1_green_scalars)
    _ordered.extend(_names)
_reordered = {name: REGISTRY[name] for name in _ordered}
assert len(_reordered) == len(REGISTRY)
REGISTRY.clear()
REGISTRY.update(_reordered)

__all__ = ["REGISTRY", "Query"]
