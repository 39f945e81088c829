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


def run_stream_upsert(
    spark: SparkSession,
    bronze_dir: str,
    silver_dir: str,
    checkpoint_dir: str,
    now_us: int | None = None,
    timeout_sec: float = 300.0,
) -> dict:
    """Streaming UPSERT sink: like :func:`run_stream`, but each
    micro-batch MERGEs into silver keyed on ``job_link`` via
    ``foreachBatch`` - re-scraped links *older than the watermark*
    update their silver row instead of appending a duplicate (the gap
    the plain append sink documents away).

    foreachBatch semantics: the batch function runs with at-least-once
    delivery (a failed commit replays the batch), so the sink must be
    idempotent - and a keyed MERGE is exactly that: replaying the same
    batch rewrites the same keys to the same values. The MERGE here is
    the parquet emulation (read current silver, anti-join the batch's
    keys, write back union) because the container ships no Delta/
    Iceberg; a lakehouse deployment replaces the body with
    ``target.merge(batch, "t.job_link = s.job_link")`` and the
    streaming scaffold is unchanged. The full-rewrite cost is why the
    batch pipeline (pipeline.py) documents bucketing silver by
    job_link at scale - MERGE on a bucketed/partitioned layout
    rewrites only matching buckets."""
    from pyspark.sql import functions as F

    raw = (
        read_bronze_stream(spark, bronze_dir)
        .withWatermark("posted_date", "0 seconds")
        .dropDuplicatesWithinWatermark(["job_link"])
    )
    cleaned = transform(clean(raw), now_us=now_us)

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        batch = batch_df.dropDuplicates(["job_link"]).cache()
        try:
            try:
                current = sess.read.parquet(silver_dir)
                kept = current.join(
                    F.broadcast(batch.select("job_link")),
                    "job_link",
                    "left_anti",
                )
                merged = kept.unionByName(batch)
            except Exception as exc:  # first batch: no silver yet
                if "PATH_NOT_FOUND" not in str(exc):
                    raise
                merged = batch
            # stage-then-swap write: never read and overwrite the same
            # files in one job
            staged = merged.localCheckpoint(eager=True)
            staged.write.mode("overwrite").parquet(silver_dir)
        finally:
            batch.unpersist()

    q = (
        cleaned.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(timeout_sec)
    if not finished:
        q.stop()
    progress = q.lastProgress or {}
    return {
        "finished": finished,
        "batches": progress.get("batchId"),
        "rows": (progress.get("sources") or [{}])[0].get("numInputRows"),
    }
