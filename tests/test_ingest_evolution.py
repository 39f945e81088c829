"""Sink-side lakehouse features: dynamic partition overwrite (backfill
idempotency) and mergeSchema scan-side schema evolution.

These are pytest-gated (no SQL oracle: they are write-path behaviors),
mirroring the reference's daily re-scrape reality - a partition may be
re-landed and the bronze schema may gain columns over time.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from web_scraping_etl_pipeline_spark.sources.ingest import (
    read_bronze_evolved,
    rewrite_bronze_partition,
    write_bronze,
)


def _batch(spark, links):
    return spark.createDataFrame(
        [(link, f"job {link}") for link in links],
        "job_link string, job_name string",
    )


def test_partition_rewrite_replaces_only_its_partition(spark, tmp_path):
    bronze = str(tmp_path / "bronze")
    write_bronze(_batch(spark, ["a", "b"]), bronze, "2025-06-20")
    write_bronze(_batch(spark, ["c"]), bronze, "2025-06-21")

    # backfill day 1 with a corrected batch - twice, to prove idempotency
    for _ in range(2):
        rewrite_bronze_partition(
            _batch(spark, ["a2", "b2", "x2"]), bronze, "2025-06-20"
        )

    out = spark.read.parquet(bronze)
    day1 = {
        r["job_link"]
        for r in out.filter(F.col("ingest_date") == "2025-06-20").collect()
    }
    day2 = {
        r["job_link"]
        for r in out.filter(F.col("ingest_date") == "2025-06-21").collect()
    }
    # day 1 fully replaced (no a/b leftovers, no duplicate re-appends)
    assert day1 == {"a2", "b2", "x2"}
    # day 2 untouched by the day-1 overwrite
    assert day2 == {"c"}


def test_merge_schema_reads_mixed_partition_versions(spark, tmp_path):
    bronze = str(tmp_path / "bronze")
    write_bronze(_batch(spark, ["a"]), bronze, "2025-06-20")
    # schema v2 adds a column; old partitions are never rewritten
    v2 = _batch(spark, ["b"]).withColumn("source_site", F.lit("topcv"))
    write_bronze(v2, bronze, "2025-06-21")

    out = read_bronze_evolved(spark, bronze)
    assert "source_site" in out.columns
    rows = {r["job_link"]: r["source_site"] for r in out.collect()}
    # old files surface the new column as NULL; new files carry it
    assert rows["a"] is None
    assert rows["b"] == "topcv"
