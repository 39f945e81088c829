"""The jobs pipeline as a Structured Streaming job.

Streaming twin of :func:`..pipeline.run_batch`, mapping the reference's
batch-incremental contract (SURVEY.md section 2.7) onto the streaming
engine:

- daily Airflow trigger (`/root/reference/airflow/dags/topcv_flow.py:24-25`)
  -> ``trigger(availableNow=True)``: each invocation drains everything
  new in bronze, then stops - a micro-batch "run" with cluster-managed
  progress instead of a cron.
- high-watermark file + drop of rows ``<= last_processed_time``
  (`/root/reference/src/topcv_pipeline.py:20-33,122-124`) ->
  the file-source checkpoint (exactly-once file tracking, strictly
  stronger than a timestamp watermark: reprocessing a bronze file can
  never double-append) plus ``withWatermark("posted_date", "0 seconds")``
  for event-time lateness, the reference's zero-allowance drop.
- the reference's at-least-once replay duplicates (no key constraint,
  SURVEY.md section 8 B4) -> ``dropDuplicatesWithinWatermark("job_link")``:
  streaming state dedups the de-facto primary key within the watermark
  window, and state is evicted as the watermark advances, so state size
  is bounded by the lateness window - not by history. (Cross-run dedup
  of *re-scraped* links beyond the watermark is the batch pipeline's
  anti-join / a MERGE sink - documented, not silently promised.)
- B4 fix for free: sink commit and source progress commit both live in
  the checkpoint WAL, so a mid-flight failure replays the batch instead
  of losing it.

At 100 TB this is the shape that holds: bronze lands as files
partitioned by ingest date, each ``availableNow`` drain reads only new
files (no full-history scan, no shuffle before the stateful dedup's
hash exchange on ``job_link``), and the parquet sink appends
atomically via the manifest log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..pipeline import clean, transform
from ..schemas import JOBS_RAW
from ..session import configure


def read_bronze_stream(spark: SparkSession, bronze_dir: str) -> DataFrame:
    """File-source stream over the bronze landing zone (explicit schema;
    no inference on the pipeline path - schemas.py is the contract)."""
    configure(spark)
    return spark.readStream.schema(JOBS_RAW).parquet(bronze_dir)


def run_stream(
    spark: SparkSession,
    bronze_dir: str,
    silver_dir: str,
    checkpoint_dir: str,
    now_us: int | None = None,
    timeout_sec: float = 300.0,
) -> dict:
    """Drain everything new in bronze into silver; returns telemetry.

    One call == one reference DAG run. Safe to call repeatedly: the
    checkpoint makes re-runs no-ops until new bronze files arrive.
    """
    raw = (
        read_bronze_stream(spark, bronze_dir)
        .withWatermark("posted_date", "0 seconds")
        .dropDuplicatesWithinWatermark(["job_link"])
    )
    cleaned = transform(clean(raw), now_us=now_us)
    q = (
        cleaned.writeStream.format("parquet")
        .option("path", silver_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(timeout_sec)
    if not finished:  # hung drain: stop rather than leak the query
        q.stop()
    progress = q.lastProgress or {}
    return {
        "finished": finished,
        "batches": progress.get("batchId"),
        "rows": (progress.get("sources") or [{}])[0].get("numInputRows"),
    }
