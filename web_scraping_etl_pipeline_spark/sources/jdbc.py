"""S2/S9 JDBC flavor - the reference's Postgres sink/source surface
(/root/reference/src/topcv_pipeline.py:98-112 row-at-a-time INSERTs,
config-driven connections :35-49) as Spark's JDBC data source.

The engine's scale path is parquet (bronze/silver); JDBC exists because
the reference's operational surface is a SQL database. Differences from
the reference, by construction:

- one distributed, batched write (``batchsize`` rows per round trip)
  instead of one INSERT statement per row;
- typed bind parameters instead of f-string SQL (B5 injection fixed);
- parallel partitioned reads (``partitionColumn/lowerBound/upperBound/
  numPartitions``) instead of a single-cursor ``fetchall``;
- predicate/column pushdown into the remote scan (``pushDownPredicate``
  is on by default in the JDBC source).

Tested against embedded Derby (in ``pyspark/jars``); any JDBC database
works by swapping ``url``/``driver``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: conservative default rows-per-round-trip for writes.
DEFAULT_BATCH_SIZE = 10_000


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    driver: str | None = None,
    batch_size: int = DEFAULT_BATCH_SIZE,
    **options: str,
) -> None:
    """Distributed JDBC sink (replaces S2's per-row INSERT loop and the
    S6/S7 SQL-text sink in one typed write)."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .mode(mode)
    )
    if driver:
        writer = writer.option("driver", driver)
    for key, value in options.items():
        writer = writer.option(key, value)
    writer.save()


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    **options: str,
) -> DataFrame:
    """JDBC scan (S3 flavor). With ``partition_column`` bounds the read
    fans out over ``num_partitions`` parallel range queries - the scan
    shape that holds when the remote table is large; without them it is
    a single-partition read (fine for dimension-sized tables only)."""
    reader = (
        spark.read.format("jdbc").option("url", url).option("dbtable", table)
    )
    if driver:
        reader = reader.option("driver", driver)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 4))
        )
    for key, value in options.items():
        reader = reader.option(key, value)
    return reader.load()
