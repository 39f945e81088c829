"""F1 - incremental high-watermark filter.

Reference: the watermark predicate is string-appended to the staging
SELECT so Postgres filters before fetchall
(/root/reference/src/topcv_pipeline.py:122-126); absent watermark ->
full scan. As a Column predicate, Catalyst pushes it into the parquet
scan (PushedFilters) - same hand-rolled optimization, for free, and it
composes with partition pruning when bronze is partitioned by ingest
date.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, functions as F


def newer_than(col: str | Column, watermark: dt.datetime | None) -> Column:
    """``col > watermark``; None watermark -> keep-all (first run)."""
    if watermark is None:
        return F.lit(True)
    target = F.col(col) if isinstance(col, str) else col
    return target > F.lit(watermark)
