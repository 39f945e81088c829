"""Loaders for the driver star schema (/root/testdata/sf*/ - TESTDATA.md).

Plays the role of the reference's table scans
(/root/reference/src/topcv_pipeline.py:119-129 ``SELECT * FROM
staging_table``): one loader per table, returning a DataFrame whose plan
still supports predicate pushdown and column pruning (we add derived
columns lazily; Catalyst prunes them when unused).

events time handling
--------------------
``events.parquet`` stores ``TIMESTAMP(NANOS)``. Spark has no nanosecond
timestamp; with ``spark.sql.legacy.parquet.nanosAsLong`` the column
arrives as bigint nanoseconds. DuckDB (the correctness oracle) truncates
the same values to microseconds. The canonical event-time column this
engine exposes is therefore ``ts_us`` - epoch **microseconds** (bigint):
identical in both systems, timezone-free, cheap to compare/bucket at
100 TB (a long column beats a timestamp for shuffle/sort keys). Helpers
convert to real timestamps only at presentation/streaming boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..session import configure

#: deterministic "now" for every query that the reference writes with
#: NOW() (script.sql:54) - mid-range of the events table's January 2024
#: span so horizon/expiry predicates select non-trivial subsets at every
#: scale factor. 2024-01-15T00:00:00 UTC in epoch microseconds.
ANCHOR_US = 1_705_276_800_000_000

#: events epoch for bucketing (2024-01-01T00:00:00 UTC, micros).
EVENTS_EPOCH_US = 1_704_067_200_000_000

US_PER_DAY = 86_400_000_000


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one star-schema table; events gains ``ts_us`` (epoch micros)."""
    configure(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # nanos bigint -> micros bigint. Integer division (DIV), not
        # float: int64 nanos (~1.7e18) exceed double's 2^53 exact range,
        # so `/ 1000` rounds ~12% of rows off by 1 us. DuckDB's
        # epoch_us(ts) truncates in integer space; DIV matches exactly
        # (ts >= 0 here, so DIV == floor division).
        df = df.withColumn("ts_us", F.expr("ts DIV 1000"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    from ..schemas import STAR_TABLES

    return {name: load_table(spark, sf_dir, name) for name in STAR_TABLES}


def ts_us_le(bound_us: int):
    """``ts_us <= bound`` with a parquet-pushable twin on the raw ``ts``
    column. ``ts_us`` is derived (``ts DIV 1000``) so a predicate on it
    alone never reaches the scan; the equivalent raw bound
    (``ts <= bound*1000 + 999``, exact for ts >= 0) is pushed into the
    parquet reader, so row groups outside the horizon are skipped by
    footer stats - the difference between scanning 100 TB and scanning
    the matching slice."""
    return (F.col("ts") <= F.lit(bound_us * 1000 + 999)) & (
        F.col("ts_us") <= F.lit(bound_us)
    )


def ts_us_gt(bound_us: int):
    """``ts_us > bound`` with the pushable raw-``ts`` twin
    (``ts > bound*1000 + 999``); see :func:`ts_us_le`."""
    return (F.col("ts") > F.lit(bound_us * 1000 + 999)) & (
        F.col("ts_us") > F.lit(bound_us)
    )


def with_event_time(df: DataFrame) -> DataFrame:
    """Add ``event_time`` (TIMESTAMP, UTC instant) from ``ts_us``.

    For streaming/windowing APIs that need a real timestamp column;
    session tz is pinned to UTC by :func:`..session.configure`, so the
    wall clock equals the naive value DuckDB sees.
    """
    return df.withColumn("event_time", F.timestamp_micros(F.col("ts_us")))
