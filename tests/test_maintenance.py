"""Lake-maintenance operators: small-file compaction and one-pass
table statistics."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from web_scraping_etl_pipeline_spark.sources.ingest import (
    collect_stats,
    compact_bronze_partition,
)


@pytest.fixture
def fragmented_bronze(spark, tmp_path):
    """A bronze partition written as many small files (simulated
    micro-batch appends)."""
    bronze = str(tmp_path / "bronze")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").withColumn(
        "ingest_date", F.lit("2024-01-15")
    )
    (
        ev.repartition(16)
        .write.mode("append")
        .partitionBy("ingest_date")
        .parquet(bronze)
    )
    (
        ev.limit(100)
        .repartition(8)
        .write.mode("append")
        .partitionBy("ingest_date")
        .parquet(bronze)
    )
    return bronze


def test_compaction_preserves_rows_and_shrinks_files(
    spark, fragmented_bronze
):
    part_glob = f"{fragmented_bronze}/ingest_date=2024-01-15/*.parquet"
    before_files = len(glob.glob(part_glob))
    assert before_files >= 20
    before = spark.read.parquet(fragmented_bronze)
    before_n = before.count()
    before_ids = {
        r.event_id
        for r in before.select("event_id").distinct().collect()
    }

    n_files = compact_bronze_partition(
        spark, fragmented_bronze, "2024-01-15"
    )
    assert n_files == 1  # well under target_rows_per_file

    after_files = len(glob.glob(part_glob))
    assert after_files == 1
    after = spark.read.parquet(fragmented_bronze)
    assert after.count() == before_n
    after_ids = {
        r.event_id for r in after.select("event_id").distinct().collect()
    }
    assert after_ids == before_ids


def test_compaction_is_idempotent(spark, fragmented_bronze):
    compact_bronze_partition(spark, fragmented_bronze, "2024-01-15")
    n1 = spark.read.parquet(fragmented_bronze).count()
    compact_bronze_partition(spark, fragmented_bronze, "2024-01-15")
    assert spark.read.parquet(fragmented_bronze).count() == n1


def test_collect_stats_one_pass_matches_exact(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    stats = collect_stats(ev)
    assert stats["rows"] == ev.count()
    cols = stats["columns"]
    assert set(cols) == set(ev.columns)
    # exact cross-checks on a couple of columns
    assert cols["event_id"]["nulls"] == 0
    exact_users = ev.select("user_id").distinct().count()
    approx = cols["user_id"]["approx_ndv"]
    assert abs(approx - exact_users) <= max(2, 0.05 * exact_users)
    mm = ev.agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    ).first()
    assert cols["value"]["min"] == mm.lo
    assert cols["value"]["max"] == mm.hi
