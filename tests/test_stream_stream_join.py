"""Cross-micro-batch state for the stream-stream interval join.

q115's oracle already checks the single-drain result; this test forces
MULTIPLE micro-batches (one file per trigger) with the matching click
and purchase arriving in DIFFERENT batches, proving the join buffers
state across batches and still emits the pair - the property a batch
re-phrasing could never demonstrate.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

BASE = dt.datetime(2024, 1, 10, 12, 0, 0)


def _events(spark, specs):
    """(event_id, type, user, minute_offset) -> events-shaped frame
    (ts as bigint nanoseconds, like the nanosAsLong parquet scan)."""
    rows = [
        (
            eid,
            int((BASE + dt.timedelta(minutes=off)).timestamp() * 1e9),
            user,
            etype,
            1.0,
            "{}",
        )
        for eid, etype, user, off in specs
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, ts long, user_id long, event_type string,"
        " value double, props string",
    )


def test_join_matches_across_micro_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    # file 0: clicks only; file 1: purchases only. maxFilesPerTrigger=1
    # means the purchase arrives one batch AFTER its matching click, so
    # the match can only come from buffered state.
    import glob as _glob
    import os
    import shutil

    os.makedirs(src)
    for i, specs in enumerate(
        [
            [(1, "click", 7, 0), (2, "click", 8, 0), (3, "click", 7, -120)],
            [(10, "purchase", 7, 30)],
        ]
    ):
        staging = str(tmp_path / f"stage{i}")
        _events(spark, specs).coalesce(1).write.parquet(staging)
        (part,) = _glob.glob(f"{staging}/part-*.parquet")
        shutil.move(part, f"{src}/b{i}.parquet")

    schema = spark.read.parquet(src).schema

    def side(expected_type, prefix):
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .filter(F.col("event_type") == expected_type)
            .withColumn(
                "event_time", F.timestamp_micros(F.expr("ts DIV 1000"))
            )
            .select(
                F.col("event_id").alias(f"{prefix}_id"),
                F.col("user_id").alias(f"{prefix}_user"),
                F.col("event_time").alias(f"{prefix}_time"),
            )
            .withWatermark(f"{prefix}_time", "0 seconds")
        )

    p, c = side("purchase", "p"), side("click", "c")
    joined = p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_time") >= F.col("p_time") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_time") <= F.col("p_time")),
    ).select("p_id", "c_id", F.col("p_user").alias("user_id"))

    q = (
        joined.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)

    out = {(r["p_id"], r["c_id"]) for r in spark.read.parquet(sink).collect()}
    # purchase 10 (user 7, +30min) matches click 1 (user 7, 0min;
    # within the preceding hour) - and NOT click 3 (2h earlier) or
    # click 2 (other user), even though the click arrived a batch early.
    assert out == {(10, 1)}
