from .titles import clean_title
from .salary import (
    SENTINEL,
    clean_salary_bounds,
    clean_salary_bounds_from,
    salary_mean,
    salary_rounded,
    salary_tokens,
    sentinel_to_null,
)
from .dates import (
    LOCAL_TZ,
    UNIT_SECONDS,
    parse_relative_seconds,
    posted_date,
    due_date,
    localize,
)
from .remaining import render_remaining_time

__all__ = [
    "clean_title",
    "SENTINEL",
    "clean_salary_bounds",
    "clean_salary_bounds_from",
    "salary_tokens",
    "salary_mean",
    "salary_rounded",
    "sentinel_to_null",
    "LOCAL_TZ",
    "UNIT_SECONDS",
    "parse_relative_seconds",
    "posted_date",
    "due_date",
    "localize",
    "render_remaining_time",
]
