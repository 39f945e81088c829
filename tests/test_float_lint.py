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

from tools.oracle_check import (
    FLOAT_LINT_ALLOW,
    ORDER_FOLD_ALLOW,
    lint_float_boundary,
    lint_order_fold,
)
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


def test_no_unadjudicated_order_sensitive_folds():
    # VERDICT r7 item 7: SUM over a float expression accumulates in
    # engine partial-agg order; every such fold must be integer by
    # construction or carry an adjudicated rationale class.
    hits = lint_order_fold()
    assert hits == {}, (
        "SUM over a float expression in oracle SQL - quantize the "
        "summand to bigint (the q283/q286/q287 r8 fixes) or "
        f"adjudicate in ORDER_FOLD_ALLOW: {hits}"
    )


def test_order_fold_allowlist_hygiene():
    stale = set(ORDER_FOLD_ALLOW) - set(ORACLE)
    assert not stale, f"allowlisted queries no longer registered: {stale}"
    # the three folds FIXED in r8 must stay fixed, not re-adjudicated
    # (q283's entry covers only its DOT ranking stage, pinned below).
    for fixed in ("q286_lang_source_chi2", "q287_quality_dup_auc"):
        assert fixed not in ORDER_FOLD_ALLOW
    assert "bigint" in ORDER_FOLD_ALLOW["q283_rank_agreement_rbo"]


def test_order_fold_lint_is_not_vacuous():
    # the detector must actually fire on the shape it exists for.
    from tools import oracle_check

    probe = {"zz_probe": "SELECT ROUND(SUM(x / 3.0), 6) AS s FROM t"}
    orig = oracle_check.ORACLE
    oracle_check.ORACLE = probe
    try:
        hits = lint_order_fold()
    finally:
        oracle_check.ORACLE = orig
    assert "zz_probe" in hits
    # and the integer shapes it deliberately clears stay cleared.
    probe2 = {
        "a": "SELECT SUM(CAST(ROUND(x * 1e6) AS BIGINT)) FROM t",
        "b": "SELECT SUM(CASE WHEN y > 0.5 THEN 1 ELSE 0 END) FROM t",
    }
    oracle_check.ORACLE = probe2
    try:
        hits2 = lint_order_fold()
    finally:
        oracle_check.ORACLE = orig
    assert hits2 == {}
