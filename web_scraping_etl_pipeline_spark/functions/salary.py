"""C2/C3/C6/C7 - salary parsing and transformation as Column expressions.

Reference semantics (/root/reference/src/utils.py:18-41):

``clean_salary(salary, exchange_rate=23000)``: lowercase+strip, collect
``[\\d,]+`` runs; USD amounts (text contains ``usd`` or ``$``) convert at
``exchange_rate / 1e6`` -> millions of VND; ``triệu`` amounts are already
millions; a ``-`` in the text means a (lo, hi) range; no digits -> the
``'Thỏa thuận'`` ("negotiable") sentinel.

Deliberate deviations, per SURVEY.md section 8 decision log:

- B2 fixed: the reference's ``triệu`` range branch loses the high bound
  (returns ``matches[0]`` twice, utils.py:31); we return (lo, hi) as the
  USD branch (utils.py:25) shows was intended.
- B3 fixed: grouping commas are stripped before the cast in every
  branch (the reference's single-``triệu`` branch would raise on
  ``float('1,000')``, utils.py:33).
- C6 folded in: the sentinel becomes a genuine NULL at clean time
  instead of a post-load ``UPDATE ... SET salary = NULL`` (script.sql:1-4).
- Like the reference, digit-bearing text that mentions neither USD nor
  ``triệu`` falls through to None/NULL (utils.py:18-35 has no else).

``transform_salary`` (utils.py:37-41) = arithmetic mean of the bounds.
``script.sql:6-10``'s numeric cast + ROUND becomes one expression
(:func:`salary_rounded`) - no ALTER TABLE retype dance.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: the reference's "negotiable" marker (utils.py:35, script.sql:3).
SENTINEL = "Thỏa thuận"

#: reference default exchange rate (utils.py:18).
DEFAULT_EXCHANGE_RATE = 23_000.0

def _null_bounds() -> Column:
    return F.lit(None).cast("array<double>")


def salary_tokens(salary: Column) -> tuple[Column, Column]:
    """Stage 1 of the salary parse: normalized text + extracted digit
    runs, as two Columns meant to be materialized in their OWN
    projection (``.select``) before :func:`clean_salary_bounds_from`
    consumes them.

    Staging matters for codegen: ``nums`` is referenced 5+ times by the
    branch logic, and a single fused projection would inline (or at best
    subexpression-cache under lazy ``CASE`` branches) that regex walk
    into one huge generated method - slow to JIT and at risk of running
    interpreted.  Materializing the tokens first keeps every generated
    method small; CollapseProject will NOT re-fuse the stages because
    that would duplicate a non-cheap expression used more than once."""
    s = F.lower(F.trim(salary))
    # \d[\d,]* not [\d,]+: a digit-free token (a bare comma, e.g. in
    # ",$") would survive extraction, strip to the empty string in the
    # amount parse, and crash the ANSI cast - found by the hypothesis
    # property suite (tests/test_property.py). The reference's Python
    # float('') would raise on the same input (same bug class as
    # SURVEY.md section 8 B2/B3), so requiring a leading digit is a
    # deliberate fix, not a semantics change: every real salary token
    # starts with a digit.
    nums = F.regexp_extract_all(s, F.lit(r"\d[\d,]*"), 0)
    return s, nums


def clean_salary_bounds_from(
    s: Column, nums: Column, exchange_rate: float = DEFAULT_EXCHANGE_RATE
) -> Column:
    """Stage 2: bounds array from pre-extracted tokens (no regex here -
    pure element_at/cast/when, tiny generated code).

    Shape note: branch arrays are built from plain element_at/cast
    expressions, NOT a slice+transform higher-order function - a HOF
    here pulls the whole projection onto the interpreted path and
    measured 2-4x slower than this codegen-friendly form."""

    def amount(i: int) -> Column:
        return F.regexp_replace(F.element_at(nums, i), ",", "").cast("double")

    is_range = s.contains("-") & (F.size(nums) >= 2)
    rate = F.lit(exchange_rate) / F.lit(1_000_000.0)
    usd = F.when(
        is_range, F.array(amount(1) * rate, amount(2) * rate)
    ).otherwise(F.array(amount(1) * rate))
    vnd = F.when(is_range, F.array(amount(1), amount(2))).otherwise(
        F.array(amount(1))
    )
    return (
        F.when(F.size(nums) == 0, _null_bounds())
        .when(s.contains("usd") | s.contains("$"), usd)
        .when(s.contains("triệu"), vnd)
        .otherwise(_null_bounds())
    )


def clean_salary_bounds(
    salary: Column, exchange_rate: float = DEFAULT_EXCHANGE_RATE
) -> Column:
    """Parse raw salary text -> ``array<double>`` of 1-2 bounds (millions
    VND); NULL for negotiable/unparseable text.

    One-expression form (both stages fused).  Prefer the staged pair
    :func:`salary_tokens` + :func:`clean_salary_bounds_from` on hot
    paths - see the codegen note on :func:`salary_tokens`."""
    s, nums = salary_tokens(salary)
    return clean_salary_bounds_from(s, nums, exchange_rate)


def salary_mean(bounds: Column) -> Column:
    """C3: mean of the 1-2 element bounds array (NULL passes through).

    Written as a plain two-branch expression, not an ``F.aggregate``
    fold: a HOF lambda kicks the whole enclosing projection out of
    whole-stage codegen onto the interpreted path (observed directly in
    q12's plan - the Project lost its codegen star), and the array here
    is at most 2 elements."""
    lo = F.element_at(bounds, 1)
    return F.when(
        F.size(bounds) > 1, (lo + F.element_at(bounds, 2)) / 2.0
    ).otherwise(lo)


def salary_rounded(salary: Column) -> Column:
    """C7: ``ROUND(salary::numeric)`` as a single typed expression."""
    return F.round(salary.cast("double")).cast("long")


def sentinel_to_null(col: Column) -> Column:
    """C6 standalone form (for string-typed inputs that still carry the
    sentinel, e.g. replaying the reference's staging data)."""
    return F.when(col == SENTINEL, F.lit(None).cast("string")).otherwise(col)
