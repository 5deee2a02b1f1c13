"""Capture a DataFrame's physical plan as a string for assertions.

Used by tests/test_plans.py to enforce the 100 TB posture in CI: pushed
filters, pruned read schemas, broadcast joins, TakeOrderedAndProject,
partial aggregation (SURVEY.md §4.2).
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()
