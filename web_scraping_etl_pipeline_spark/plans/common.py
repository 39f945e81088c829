"""Shared helpers for the query suites."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.star import ANCHOR_US, EVENTS_EPOCH_US, US_PER_DAY, load_table

__all__ = ["ANCHOR_US", "EVENTS_EPOCH_US", "US_PER_DAY", "t", "HORIZON_US"]

#: Q1's deadline horizon: NOW() + INTERVAL '20 DAYS' (script.sql:54 -
#: the code says 20; the comment says 10; SURVEY.md section 8 B7 keeps the code).
HORIZON_US = ANCHOR_US + 20 * US_PER_DAY


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)
