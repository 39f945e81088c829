"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

The engine lives in ``web_scraping_etl_pipeline_spark``; queries and
their oracle twins are registered side by side in
``web_scraping_etl_pipeline_spark/plans/*.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from web_scraping_etl_pipeline_spark.plans import ORACLE, QUERIES  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"

#: flagship = the reference's daily-pipeline shape in one query:
#: incremental horizon filter + remaining-time render (script.sql:51-54
#: + the stored-procedure C8 bucketing).
FLAGSHIP = "q01_deadline_horizon"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES[FLAGSHIP](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query (keys match
    ``queries()``; missing keys fall back to the rows-only check)."""
    return dict(ORACLE)
