"""Column-name normalization (driver-side, operates on names not rows).

Reproduces the reference's `normalize_name` (analytics/notebooks/
data_preparation.ipynb cell 4): lowercase, '%' → 'pct', any run of
non-alphanumerics → '_', squeeze repeats, strip edges.
"""

from __future__ import annotations

import re
import unicodedata

_NON_ALNUM = re.compile(r"[^a-z0-9]+")


def normalize_name(name: str) -> str:
    """Normalize one column name to snake_case ascii."""
    s = unicodedata.normalize("NFKD", name)
    s = "".join(ch for ch in s if not unicodedata.combining(ch))
    s = s.lower().replace("%", " pct ")
    s = _NON_ALNUM.sub("_", s)
    return s.strip("_")


def ascii_fold(text: str) -> str:
    """Driver-side accent folding (for login generation). Ref:
    analytics/etl/load_security.py:108-116."""
    s = unicodedata.normalize("NFKD", text)
    return "".join(ch for ch in s if not unicodedata.combining(ch))
