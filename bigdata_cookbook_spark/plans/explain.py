"""Plan introspection helpers — the engine's `.explain` feedback loop.

Used by tests/test_plans.py to pin physical-plan properties that matter at
100 TB: filter/column pushdown into the parquet scan, broadcast joins for
dim tables, partial (map-side) aggregation, and whole-stage codegen.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """df.explain(mode) captured as a string."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()
