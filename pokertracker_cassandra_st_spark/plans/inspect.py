"""Physical-plan inspection helpers (used by tests and tuning)."""

from __future__ import annotations

import contextlib
from io import StringIO

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """Return ``df.explain(mode)`` output as a string."""
    buf = StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()
