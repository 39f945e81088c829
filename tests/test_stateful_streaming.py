"""applyInPandasWithState: running per-user profiles across micro-batches,
state carried by the checkpoint between availableNow runs (no SQL oracle
can express managed state - this test is the gate)."""

from pyspark.sql import functions as F

from web_scraping_etl_pipeline_spark.streaming.stateful import user_profiles


def _drain(spark, bronze, sink, ckpt):
    schema = "user_id long, ts_us long, value double"
    stream = spark.readStream.schema(schema).parquet(bronze)
    q = (
        user_profiles(stream)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)


def test_state_accumulates_across_runs(spark, tmp_path):
    bronze = str(tmp_path / "bronze")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    batch1 = [(1, 100, 2.0), (1, 200, 3.0), (2, 150, 5.0)]
    spark.createDataFrame(
        batch1, "user_id long, ts_us long, value double"
    ).write.mode("append").parquet(bronze)
    _drain(spark, bronze, sink, ckpt)

    out1 = {r["user_id"]: r for r in spark.read.parquet(sink).collect()}
    assert out1[1]["n_events"] == 2 and out1[1]["total_value"] == 5.0
    assert out1[1]["last_ts_us"] == 200
    assert out1[2]["n_events"] == 1

    # second batch: state for user 1 must carry over via the checkpoint
    batch2 = [(1, 300, 10.0), (3, 50, 1.0)]
    spark.createDataFrame(
        batch2, "user_id long, ts_us long, value double"
    ).write.mode("append").parquet(bronze)
    _drain(spark, bronze, sink, ckpt)

    rows = spark.read.parquet(sink)
    latest = {
        r["user_id"]: r
        for r in rows.groupBy("user_id")
        .agg(F.max(F.struct("last_ts_us", "n_events", "total_value")).alias("s"))
        .select("user_id", "s.*")
        .collect()
    }
    assert latest[1]["n_events"] == 3  # 2 from run 1 + 1 from run 2
    assert latest[1]["total_value"] == 15.0
    assert latest[3]["n_events"] == 1
    # user 2 got no new events: not re-emitted in run 2, still visible
    assert latest[2]["n_events"] == 1
