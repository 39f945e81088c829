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


def _drain_quota(spark, bronze, sink, ckpt):
    from web_scraping_etl_pipeline_spark.streaming.docs_stream import (
        source_quota_admit,
    )

    schema = "doc_id long, source string"
    stream = spark.readStream.schema(schema).parquet(bronze)
    q = (
        source_quota_admit(stream)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)


def test_source_quota_carries_across_runs(spark, tmp_path, monkeypatch):
    """Docs admitted in run 1 consume run 2's budget; once a source's
    quota is exhausted, later batches admit nothing for it."""
    import web_scraping_etl_pipeline_spark.streaming.docs_stream as ds

    monkeypatch.setattr(ds, "SOURCE_QUOTA", 3)
    bronze = str(tmp_path / "bronze")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    batch1 = [(1, "a"), (2, "a"), (10, "b")]
    spark.createDataFrame(batch1, "doc_id long, source string").write.mode(
        "append"
    ).parquet(bronze)
    _drain_quota(spark, bronze, sink, ckpt)
    out1 = spark.read.parquet(sink).collect()
    assert {(r["doc_id"], r["admit_rank"]) for r in out1} == {
        (1, 1), (2, 2), (10, 1),
    }

    # run 2: source a has 1 slot left -> only the smallest doc_id of
    # the new batch is admitted, at rank 3; b admits both.
    batch2 = [(4, "a"), (3, "a"), (11, "b"), (12, "b")]
    spark.createDataFrame(batch2, "doc_id long, source string").write.mode(
        "append"
    ).parquet(bronze)
    _drain_quota(spark, bronze, sink, ckpt)
    out2 = spark.read.parquet(sink).collect()
    admitted = {(r["doc_id"], r["admit_rank"]) for r in out2}
    assert (3, 3) in admitted and (4, 4) not in admitted
    assert (11, 2) in admitted and (12, 3) in admitted

    # run 3: source a is exhausted - nothing new admitted for it.
    batch3 = [(5, "a")]
    spark.createDataFrame(batch3, "doc_id long, source string").write.mode(
        "append"
    ).parquet(bronze)
    _drain_quota(spark, bronze, sink, ckpt)
    out3 = spark.read.parquet(sink).collect()
    assert (5, "a") not in {(r["doc_id"], r["source"]) for r in out3}


def test_transform_with_state_profile(spark):
    """transformWithStateInPandas flavor of the q37 profile operator -
    runs only where the protobuf state protocol is available (this
    container ships without it; the processor code is environment-
    independent)."""
    import pytest

    from web_scraping_etl_pipeline_spark.streaming.events_stream import (
        _tws_available,
    )

    if not _tws_available():
        pytest.skip("google.protobuf not available in this environment")
    from web_scraping_etl_pipeline_spark.plans import QUERIES

    out = QUERIES["q249_transform_with_state"](
        spark, "/root/testdata/sf0.001"
    )
    assert out.count() > 0
