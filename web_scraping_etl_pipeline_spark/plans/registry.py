"""Query registry: name -> (spark callable, duckdb oracle SQL).

Every operator in SURVEY.md section 2 is exposed here as a named query; the
driver runs the Spark callable and the oracle SQL side by side at
sf0.01 and compares row count + schema + order-insensitive value hash.

Authoring rules that keep the two sides hash-identical (learned from
the systems' type/precision differences, documented once here):

- Alias every computed column, identically on both sides.
- No raw TIMESTAMP outputs: event time is epoch **micros** (bigint) -
  DuckDB truncates the parquet NANOS to micros, Spark reads nanos as
  long and we floor-divide - or a DATE cast (tz-free in both).
- Float aggregates are ROUNDed on both sides; sums of many doubles
  carry ~1e-9 relative accumulation differences between engines, so
  round money sums to whole units and unit-interval scores to 4-6
  decimals (flip probability ~diff/granularity, negligible there).
- ``SUM(int)`` is HUGEINT in DuckDB vs bigint in Spark: cast to BIGINT
  in the oracle.
- Cross-engine hashing uses md5-prefix-to-bigint (not the engines'
  native ``hash()``, which differ): Spark ``conv(substr(md5(x),1,15),
  16,10)`` == DuckDB ``CAST('0x' || substr(md5(x),1,15) AS BIGINT)``
  (60 bits, fits bigint).
- Top-k queries order by a unique tie-break column so the selected set
  is deterministic in both engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query; ``oracle=None`` marks a non-SQL-expressible op
    (driver falls back to a rows-only check)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco
