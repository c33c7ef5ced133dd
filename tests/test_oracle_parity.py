"""Every registered query must hash-match its DuckDB oracle — the local
twin of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from evolution_data_warehouse_spark.queries import REGISTRY
from tests.oracle_utils import compare, duckdb_conn

_WITH_ORACLE = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
_ROWS_ONLY = sorted(n for n, q in REGISTRY.items() if q.oracle is None)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_parity(spark, sf_dir, con, name):
    q = REGISTRY[name]
    df = q.fn(spark, sf_dir)
    ok, msg = compare(df, con, q.oracle)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only(spark, sf_dir, name):
    q = REGISTRY[name]
    df = q.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
