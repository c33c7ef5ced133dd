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

# Registration order is verification priority, not import order: the
# driver verifies the FIRST 50 registry entries each round, so the
# front of the registry is the set we most need a verdict on.  After
# r1∪r2∪r3, every registry query has a driver verdict; the round-4
# window leads with the two r3 errors (the TIMESTAMP_NTZ event-time
# queries, fixed this round) and then refreshes the OLDEST evidence —
# the §2.2-§2.7 relational block plus the first scalar fns, whose
# only green rows date to r1 — so no green row goes >2 rounds stale.
_R4_FIXED = ("win_session_gap", "join_range_bucketed")


def _module_names(mod) -> list[str]:
    return [n for n, q in REGISTRY.items() if q.fn.__module__ == mod.__name__]


# r1-evidence scalar fns (fn_current_ts/fn_datediff were r2; the
# fn_dateadd..fn_derived_measure tail was r3).
_R1_SCALAR = (
    "fn_zfill", "fn_regex_extract", "fn_cast_numeric", "fn_case_when",
    "fn_coalesce", "fn_nullif",
)
_R4_NEW = (
    # round-4 additions beyond the datapipe module (picked up wholesale
    # below): TPC-H shapes, driver-gated skew paths, repetition signals
    "tpch_q4", "tpch_q10", "tpch_q14", "tpch_q19",
    "join_skew_salted", "agg_skew_salted", "text_repetition",
    "win_pct_dist", "fn_date_trunc", "fn_array_ops",
    "agg_approx_percentile",
)
_ordered: list[str] = list(_R4_FIXED)
# Never-verified beats stale-green: the round-4 additions (datapipe
# splits/packing/decontamination/sampling/incremental dedup, plus
# _R4_NEW) go next.
_ordered.extend(n for n in _module_names(_datapipe) if n not in _ordered)
_ordered.extend(n for n in _R4_NEW if n not in _ordered)
_ordered.extend(
    n for n in _module_names(_relational) if n not in _ordered
)  # 43 entries, all last verified r1
_ordered.extend(n for n in _R1_SCALAR if n not in _ordered)
_ordered.extend(n for n in REGISTRY if n not in _ordered)
_missing = [
    n for n in (_R4_FIXED + _R4_NEW + _R1_SCALAR) if n not in REGISTRY
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
