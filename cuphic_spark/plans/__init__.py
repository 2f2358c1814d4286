"""Physical-plan capture and assertion helpers.

The engine's performance contract is enforced two ways:

* ``capture`` dumps formatted plans of the key operators into
  BENCH/PLANS.md (the human-audited `.explain` trail: pushdown,
  codegen spans, join strategies, no stray Python stages) — run
  ``python BENCH/capture_plans.py``;
* the helpers below give tests a stable way to pin plan properties
  (tests/test_spark_extract.py pins the single-MapInPandas multi-
  pattern scan and head-filter pushdown; tests/test_frontier.py pins
  the all-broadcast seen check).
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout


def formatted_plan(df) -> str:
    """df.explain('formatted') as a string."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def executed_plan(df) -> str:
    """The executed physical plan's toString (join strategies etc.)."""
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df) -> str:
    """The optimized logical plan's toString (stage counts etc.)."""
    return df._jdf.queryExecution().optimizedPlan().toString()
