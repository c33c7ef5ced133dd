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

__all__ = ["REGISTRY", "Query"]
