"""AQE skew-join pin: the session enables
``spark.sql.adaptive.skewJoin`` (session.py) as the runtime half of
the skew story (q67/q68 salt proactively; AQE splits reactively).
This test proves the engine configuration actually triggers the
split: a join with one hot key, thresholds scaled to the fixture,
must show ``skew=true`` on the sort-merge join in the FINAL adaptive
plan and still produce exact results.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join(spark):
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # 60k rows on ONE hot key, 3k rows spread over 3k keys; dim
        # side has every key once. The padding must carry ENTROPY
        # (md5 of the row id): a constant pad lz4-compresses to
        # almost nothing in the shuffle and the skew detector (which
        # sees compressed map-output sizes) never fires - itself a
        # production lesson in why "skewed rows" and "skewed bytes"
        # differ.
        fact = spark.range(63_000).select(
            F.when(F.col("id") < 60_000, F.lit(7))
            .otherwise(F.col("id") % 3_000 + 10_000)
            .alias("k"),
            F.md5(F.col("id").cast("string")).alias("pad"),
        )
        dim = spark.range(20_000).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("dv")
        )
        # join-only: a downstream groupBy on the join key would make
        # the split break required partitioning, and AQE (correctly)
        # refuses without forceOptimizeSkewedJoin - itself a scale
        # lesson: skew splitting and partitioning reuse trade off.
        joined = fact.join(dim, "k").select("k", "dv", "pad")
        counts: dict[int, int] = {}
        mdv: dict[int, int] = {}
        for r in joined.collect():
            counts[r["k"]] = counts.get(r["k"], 0) + 1
            mdv[r["k"]] = max(mdv.get(r["k"], -1), r["dv"])

        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]

        # exactness under the split: the hot key kept every row
        assert counts[7] == 60_000 and mdv[7] == 21
        assert len(counts) == 3_001
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
