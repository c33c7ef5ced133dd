"""Role-based access control — the engine analog of the reference's
role/grant matrix (Terraform/sql/006_configure_security.sql:16-93):
four roles over four schema namespaces, with the consultant role
additionally subject to row-level security (011_security_rls.sql —
operators/rls.py here).

On an immutable-parquet engine the GRANT matrix is an authorization
gate evaluated BEFORE a plan is built — schema-level, driver-side,
zero runtime cost — while RLS composes into the plan itself (a
broadcast filter; see rls.secured). That split mirrors the reference:
grants are static catalog state, RLS is a per-query predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# action sets per (role, schema); "w" implies the ETL write path
# (insert/update/delete collapse to Spark's write/overwrite)
# 006:39-47 — CONTROL on all four schemas + DDL
# 006:57-65 — ETL: rw on stg/dwh, read-only marts
# 006:75-79 — analysts: read dwh + marts, no staging
# 006:92-93 — consultants: read marts only, RLS-scoped
GRANTS: dict[str, dict[str, str]] = {
    "role_admin": {"stg": "rw", "dwh": "rw", "dm": "rw", "analytics": "rw"},
    "role_etl_process": {"stg": "rw", "dwh": "rw", "dm": "r", "analytics": "r"},
    "role_analyst": {"dwh": "r", "dm": "r", "analytics": "r"},
    "role_consultant": {"dm": "r", "analytics": "r"},
}

# roles whose reads must pass through row-level security (006:85-90
# pairs role_consultant with the RLS policy of 011)
RLS_SCOPED_ROLES = frozenset({"role_consultant"})


class AccessDenied(PermissionError):
    """Raised when a role lacks the grant for an action on a schema."""


def can(role: str, action: str, schema: str) -> bool:
    """True iff ``role`` may perform ``action`` ('read'|'write') on
    ``schema``. Unknown roles and schemas have no grants."""
    if action not in ("read", "write"):
        raise ValueError(f"action must be 'read' or 'write', got {action!r}")
    modes = GRANTS.get(role, {}).get(schema, "")
    return ("r" if action == "read" else "w") in modes


def authorize(role: str, action: str, schema: str) -> None:
    """Gate an operation: raise :class:`AccessDenied` unless granted."""
    if not can(role, action, schema):
        raise AccessDenied(f"{role} may not {action} schema {schema!r}")


def read_secured(
    df: DataFrame,
    zones: DataFrame,
    role: str,
    user: str,
    schema: str,
    scope_col: str,
) -> DataFrame:
    """Read ``df`` (living in ``schema``) as ``user`` holding ``role``:
    the grant matrix gates the read, then RLS-scoped roles get the
    rls.secured predicate composed into the plan; other readers see
    the table unfiltered. The RLS filter is a broadcast join — the
    authorization layer adds zero shuffles.
    """
    from evolution_data_warehouse_spark.operators.rls import secured

    authorize(role, "read", schema)
    if role in RLS_SCOPED_ROLES:
        return secured(df, zones, user, scope_col)
    return df
