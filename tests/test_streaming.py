"""Streaming jobs pipeline: one availableNow cycle end-to-end, checkpoint
replay idempotency, and incremental drains (SURVEY.md section 2.7 contract;
the oracle cannot check streaming, so this test is the gate)."""

import datetime as dt

import pytest

from web_scraping_etl_pipeline_spark.schemas import JOBS_RAW
from web_scraping_etl_pipeline_spark.streaming import run_stream

BASE = dt.datetime(2025, 6, 20, 5, 0, 0)
BASE_US = int((BASE - dt.datetime(1970, 1, 1)).total_seconds() * 1_000_000)


def _rows(*specs):
    """(link, salary, posted_offset_hours) -> full JOBS_RAW tuples."""
    return [
        (
            f"Engineer {link.rsplit('/', 1)[-1]}",
            link,
            salary,
            "Acme",
            "Cập nhật 1 giờ trước",
            "Hà Nội",
            "Còn 5 ngày để ứng tuyển",
            BASE - dt.timedelta(hours=off),
            BASE + dt.timedelta(days=5),
        )
        for link, salary, off in specs
    ]


def test_stream_cycle_and_replay(spark, tmp_path):
    bronze = str(tmp_path / "bronze")
    silver = str(tmp_path / "silver")
    ckpt = str(tmp_path / "ckpt")

    batch1 = _rows(
        ("https://x/1", "10 - 20 triệu", 3),
        ("https://x/2", "Thỏa thuận", 2),
        ("https://x/2", "Thỏa thuận", 2),  # in-batch duplicate link
    )
    spark.createDataFrame(batch1, JOBS_RAW).write.mode("append").parquet(bronze)

    res = run_stream(spark, bronze, silver, ckpt, now_us=BASE_US)
    assert res["finished"]
    got = {r["job_link"]: r for r in spark.read.parquet(silver).collect()}
    assert set(got) == {"https://x/1", "https://x/2"}  # dup dropped
    assert got["https://x/1"]["salary"] == pytest.approx(15.0)
    assert got["https://x/2"]["salary"] is None  # sentinel -> NULL

    # replay: same bronze, same checkpoint -> no-op (exactly-once files)
    res2 = run_stream(spark, bronze, silver, ckpt, now_us=BASE_US)
    assert res2["finished"]
    assert spark.read.parquet(silver).count() == 2

    # incremental drain: a new bronze file is picked up; rows 1-2 are in
    # already-processed files so they are not re-read (checkpoint, not
    # timestamp, is the source watermark)
    batch2 = _rows(("https://x/3", "1,000 USD", 1))
    spark.createDataFrame(batch2, JOBS_RAW).write.mode("append").parquet(bronze)
    res3 = run_stream(spark, bronze, silver, ckpt, now_us=BASE_US)
    assert res3["finished"]
    after = {r["job_link"]: r for r in spark.read.parquet(silver).collect()}
    assert set(after) == {"https://x/1", "https://x/2", "https://x/3"}
    assert after["https://x/3"]["salary"] == pytest.approx(23.0)


def test_stream_upsert_updates_instead_of_appending(spark, tmp_path):
    """foreachBatch MERGE sink: a re-scraped link in a later drain must
    UPDATE its silver row (latest salary wins), never append a
    duplicate; replaying a drained checkpoint is a no-op."""
    from web_scraping_etl_pipeline_spark.streaming.jobs_stream import (
        run_stream_upsert,
    )

    bronze = str(tmp_path / "bronze")
    silver = str(tmp_path / "silver")
    ckpt = str(tmp_path / "ckpt")

    batch1 = _rows(
        ("https://x/1", "10 - 20 triệu", 3),
        ("https://x/2", "Thỏa thuận", 2),
    )
    spark.createDataFrame(batch1, JOBS_RAW).write.mode("append").parquet(bronze)
    res = run_stream_upsert(spark, bronze, silver, ckpt, now_us=BASE_US)
    assert res["finished"]
    assert spark.read.parquet(silver).count() == 2

    # re-scrape link 1 with a new salary in a NEW bronze file
    batch2 = _rows(("https://x/1", "20 - 30 triệu", 1))
    spark.createDataFrame(batch2, JOBS_RAW).write.mode("append").parquet(bronze)
    res2 = run_stream_upsert(spark, bronze, silver, ckpt, now_us=BASE_US)
    assert res2["finished"]
    got = {r["job_link"]: r for r in spark.read.parquet(silver).collect()}
    assert len(got) == 2  # updated, not appended
    assert got["https://x/1"]["salary"] == pytest.approx(25.0)
    assert got["https://x/2"]["salary"] is None

    # replay with the drained checkpoint: nothing changes
    res3 = run_stream_upsert(spark, bronze, silver, ckpt, now_us=BASE_US)
    assert res3["finished"]
    assert spark.read.parquet(silver).count() == 2
