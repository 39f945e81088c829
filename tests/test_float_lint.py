"""Float-boundary oracle lint gate (the q174/q260/q230 bug class).

A float expression with systematic mass at a representable boundary
(floor(1000.0 * a / b) landing on an integer, ROUND at a .5 tie,
-0.0) can evaluate differently across engine BUILDS even when both
are IEEE - a different DuckDB version re-deriving the driver's hash
is exactly how q230 went red in round 4 while being bit-identical
locally. The fix pattern is pure-integer arithmetic on both engines;
this gate keeps the class from re-entering via a new oracle.
"""

from __future__ import annotations

from tools.oracle_check import FLOAT_LINT_ALLOW, lint_float_boundary
from web_scraping_etl_pipeline_spark.plans import ORACLE


def test_no_unadjudicated_float_boundary_oracles():
    hits = lint_float_boundary()
    assert hits == {}, (
        "floor/ceil over a float expression in oracle SQL - rewrite as "
        f"integer DIV (or adjudicate in FLOAT_LINT_ALLOW): {hits}"
    )


def test_allowlist_entries_still_exist():
    stale = FLOAT_LINT_ALLOW - set(ORACLE)
    assert not stale, f"allowlisted queries no longer registered: {stale}"
