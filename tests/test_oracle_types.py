"""Oracle output-type lint + events.ts precision pinning.

Round-7's only driver-visible defect class was oracle-side type/env
divergence: DuckDB promotes integer SUMs to HUGEINT (int128), which the
driver's environment canonicalizes differently from BIGINT, failing the
value-hash even when every value is identical. Likewise DuckDB ≥1.1
surfaces the events table's TIMESTAMP(NANOS) column as TIMESTAMP_NS
while Spark µs-truncates.

This module makes the class unrepresentable:

* every registered oracle is DESCRIBEd in DuckDB and its output columns
  must come from an allowlist of environment-stable types (no HUGEINT,
  no TIMESTAMP_NS, no unsigned ints, DECIMAL precision ≤ 38);
* every oracle's ``events`` reference must be the µs-pinned inline view
  installed by queries/common.py::pin_events_us at registration time.

No Spark session needed — this is a pure-DuckDB test and runs in
seconds for the whole registry.
"""

from __future__ import annotations

import re

import duckdb
import pytest

from evolution_data_warehouse_spark.queries import REGISTRY
from evolution_data_warehouse_spark.queries.common import (
    TABLES,
    pin_events_us,
)

SF = "/root/testdata/sf0.001"

# Environment-stable DuckDB output types. Everything else — HUGEINT,
# UHUGEINT/UBIGINT/..., TIMESTAMP_NS/TIMESTAMP_S/TIMESTAMP_MS, TIME,
# INTERVAL, BLOB, ENUM — either canonicalizes differently across driver
# environments or has no stable Spark twin, so oracles must cast it away.
_SIMPLE_ALLOWED = frozenset(
    "BIGINT INTEGER SMALLINT TINYINT DOUBLE FLOAT VARCHAR DATE "
    "TIMESTAMP BOOLEAN JSON".split()
)
_DECIMAL_RE = re.compile(r"^DECIMAL\((\d+),\s*\d+\)$")


def _type_allowed(t: str) -> bool:
    t = t.strip()
    if t.endswith("[]"):  # list of an allowed element type
        return _type_allowed(t[:-2])
    if t in _SIMPLE_ALLOWED:
        return True
    m = _DECIMAL_RE.match(t)
    return bool(m and int(m.group(1)) <= 38)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for tbl in TABLES:
        c.execute(
            f"CREATE VIEW {tbl} AS "
            f"SELECT * FROM read_parquet('{SF}/{tbl}.parquet')"
        )
    return c


def test_every_oracle_output_type_is_stable(con):
    bad: list[tuple[str, str, str]] = []
    n_checked = 0
    for name, q in REGISTRY.items():
        if q.oracle is None:
            continue
        n_checked += 1
        for col, typ, *_ in con.execute(f"DESCRIBE ({q.oracle})").fetchall():
            if not _type_allowed(typ):
                bad.append((name, col, typ))
    assert n_checked > 200, "registry went missing?"
    assert not bad, f"unstable oracle output types: {bad}"


def test_lint_rejects_the_hugeint_fixture(con):
    """An uncast integer SUM is HUGEINT in DuckDB — assert the lint's
    allowlist actually catches the class it exists for (and TIMESTAMP
    variants beyond µs)."""
    ((_, typ, *_),) = con.execute(
        "DESCRIBE (SELECT SUM(1) AS s FROM region)"
    ).fetchall()
    assert typ == "HUGEINT"
    assert not _type_allowed(typ)
    for t in ("TIMESTAMP_NS", "UBIGINT", "UINTEGER", "DECIMAL(39,0)", "BLOB"):
        assert not _type_allowed(t), t
    for t in ("BIGINT", "DECIMAL(38,0)", "VARCHAR[]", "TIMESTAMP"):
        assert _type_allowed(t), t


def test_every_events_reference_is_precision_pinned():
    """pin_events_us ran at registration: no registered oracle may still
    read the bare events table (whose ts is TIMESTAMP_NS on DuckDB ≥1.1)."""
    bare = re.compile(r"\b(?:FROM|JOIN)\s+events\b", re.IGNORECASE)
    offenders = [
        name
        for name, q in REGISTRY.items()
        if q.oracle
        for m in bare.finditer(q.oracle)
        # the pinned view's own "FROM events)" tail is the one allowed hit
        if q.oracle[m.end() : m.end() + 1] != ")"
    ]
    assert not offenders, offenders


def test_pin_events_us_rewrite_shapes(con):
    pinned = "(SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)"
    # bare reference → aliased back to `events` so qualified refs resolve
    out = pin_events_us("SELECT ts FROM events WHERE events.value > 0")
    assert f"FROM {pinned} events WHERE" in out
    # keyword after the table name is not an alias
    out = pin_events_us("SELECT ts FROM events ORDER BY ts")
    assert f"FROM {pinned} events ORDER BY ts" in out
    # explicit aliases are preserved (incl. self-join)
    out = pin_events_us("SELECT * FROM events a JOIN events b ON a.x = b.x")
    assert f"FROM {pinned} a JOIN {pinned} b ON" in out
    # string literals are untouched
    out = pin_events_us("SELECT 'events' AS tag FROM orders")
    assert out == "SELECT 'events' AS tag FROM orders"
    # every DuckDB clause starter that can follow a table ref is in the
    # keyword blocklist — ASOF/SEMI/... must not be captured as aliases
    # (r8 ADVICE: `FROM events ASOF JOIN x` would otherwise silently
    # become a plain join on an ASOF-aliased view)
    for kw in (
        "ASOF", "SEMI", "ANTI", "POSITIONAL", "PIVOT", "UNPIVOT",
        "TABLESAMPLE", "FETCH", "OFFSET",
    ):
        out = pin_events_us(f"SELECT * FROM events {kw} JOIN x ON y")
        assert f"{pinned} events {kw} JOIN" in out, kw
    # rewritten SQL still parses and pins the type in DuckDB
    desc = con.execute(
        f"DESCRIBE ({pin_events_us('SELECT ts FROM events LIMIT 1')})"
    ).fetchall()
    assert desc[0][1] == "TIMESTAMP"
