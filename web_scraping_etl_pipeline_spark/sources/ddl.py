"""S8 - table bootstrap (the reference's create_table.py DDL,
/root/reference/src/create_table.py:50-79, as idempotent Spark SQL).

The reference creates ``staging_table`` (raw copy for replay) and
``jobs_table`` (cleaned). Here they are the bronze/silver pair, as
parquet tables in the session catalog.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..schemas import JOBS, JOBS_RAW


def _ddl(struct) -> str:
    return ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in struct.fields
    )


def create_tables(
    spark: SparkSession,
    bronze_name: str = "jobs_staging",
    silver_name: str = "jobs",
    location: str | None = None,
) -> None:
    """CREATE TABLE IF NOT EXISTS for bronze + silver (idempotent, same
    semantics as the reference's DDL)."""
    for name, struct, extra in (
        (bronze_name, JOBS_RAW, ", ingest_date string"),
        (silver_name, JOBS, ""),
    ):
        loc = f" LOCATION '{location}/{name}'" if location else ""
        part = " PARTITIONED BY (ingest_date)" if extra else ""
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {name} ({_ddl(struct)}{extra}) "
            f"USING parquet{part}{loc}"
        )
