"""Gates for the custom Python DataSource pair (sources/pyds.py):
batch partition planning and the streaming offset-resume contract.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F


def test_batch_source_partition_planning(spark):
    """parts=N plans N InputPartitions -> N Spark tasks, and the full
    id range arrives exactly once."""
    from web_scraping_etl_pipeline_spark.sources.pyds import register

    register(spark)
    df = (
        spark.read.format("wsep_range")
        .option("n", 1000)
        .option("parts", 7)
        .load()
    )
    assert df.rdd.getNumPartitions() == 7
    assert df.count() == 1000
    assert df.select(F.countDistinct("id")).first()[0] == 1000
    assert df.agg(F.min("id"), F.max("id")).first() == (0, 999)


def test_stream_source_resumes_offsets_across_runs(spark):
    """Repeated availableNow drains against ONE checkpoint advance the
    cursor batch by batch - each run appends the next chunk, nothing
    is duplicated, and a run past the end appends nothing (the
    nightly-incremental contract)."""
    from web_scraping_etl_pipeline_spark.sources.pyds import (
        register_stream,
    )

    register_stream(spark)
    scratch = tempfile.mkdtemp(prefix="wsep-pyds-resume-")

    def drain():
        s = (
            spark.readStream.format("wsep_range_stream")
            .option("n", 250)
            .option("batch", 100)
            .load()
        )
        q = (
            s.writeStream.format("parquet")
            .option("path", f"{scratch}/sink")
            .option("checkpointLocation", f"{scratch}/ckpt")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return spark.read.parquet(f"{scratch}/sink")

    counts = []
    for _ in range(4):
        counts.append(drain().count())
    # 100, 200, 250, 250: two full chunks, the 50-row tail, then a no-op
    assert counts == [100, 200, 250, 250]
    final = spark.read.parquet(f"{scratch}/sink")
    assert final.select(F.countDistinct("id")).first()[0] == 250
    assert final.agg(F.min("id"), F.max("id")).first() == (0, 249)
