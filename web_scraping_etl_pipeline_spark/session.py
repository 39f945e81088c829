"""SparkSession factory and configuration.

Two entry points:

- :func:`get_spark` - build a session we own (tests, bench, pipeline).
- :func:`configure` - apply the runtime-settable confs this engine
  depends on to a session someone else built (the correctness driver
  hands us its own ``SparkSession``).

Conf rationale (all deterministic-read requirements, not tuning):

- ``spark.sql.legacy.parquet.nanosAsLong=true``: the driver's
  ``events.parquet`` stores ``TIMESTAMP(NANOS)``, which Spark 4 refuses
  to read as a timestamp; with this conf it arrives as bigint
  nanoseconds and :mod:`.sources.star` derives epoch-micros columns
  (micros is the precision DuckDB keeps, so the oracle agrees).
- ``spark.sql.session.timeZone=UTC``: tz-free semantics - a naive
  parquet timestamp renders/extracts the same wall clock Spark-side and
  DuckDB-side.

Tuning confs (AQE, broadcast threshold, shuffle partitions) live only in
:func:`get_spark`; we never mutate a caller's performance settings.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: confs that must hold for correct reads; safe to set at runtime.
RUNTIME_CONF = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # UDTFs evaluate row-at-a-time (pickled) unless Arrow is opted in;
    # batched Arrow transfer is strictly better for our typed yields.
    "spark.sql.execution.pythonUDTF.arrow.enabled": "true",
}

#: performance confs applied when we build the session ourselves.
#: Sized for local[N] testing but chosen to scale: AQE re-plans at
#: runtime (coalesces small shuffles, splits skewed ones), and the
#: broadcast threshold covers every dimension table of a 100 TB TPC-H
#: style layout (region/nation/part/supplier stay << 256 MB).
BUILD_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.driver.memory": "8g",
    # Headroom for a long-lived session: a 69-query suite generates
    # hundreds of whole-stage-codegen classes in one JVM; the default
    # 240 MB reserved code cache leaves little margin before HotSpot
    # stops JIT-compiling new methods.
    "spark.driver.extraJavaOptions": "-XX:ReservedCodeCacheSize=1g",
    "spark.ui.enabled": "false",
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)


def configure(spark: SparkSession) -> SparkSession:
    """Apply the engine's required runtime confs to an existing session.

    Idempotent and cheap; every public query/loader calls this so the
    engine behaves identically under the driver's session and ours.
    """
    for key, value in RUNTIME_CONF.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            # non-settable in some deployment: leave the session as-is
            # rather than failing the query; loaders fall back where
            # they can.
            pass
    return spark


def get_spark(
    app_name: str = "web-scraping-etl-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[N]`` with N from ``SPARK_GRAFT_CPUS``
    (or all cores); ``shuffle_partitions`` defaults to the same N - at
    local scale a 200-partition shuffle is pure overhead, and on a real
    cluster the deploy sets this (or AQE coalesces it).
    """
    # Python workers inherit the JVM's env: put the package root on
    # PYTHONPATH *before* the gateway starts so worker-side imports of
    # this package resolve regardless of the driver's cwd. (UDF closures
    # are value-pickled anyway - see multimodal/media.py - this is
    # defense in depth for future module-referencing UDFs.)
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + (os.pathsep + existing if existing else "")
        )
    cores = default_parallelism()
    builder = SparkSession.builder.appName(app_name)
    builder = builder.master(master or f"local[{cores}]")
    for key, value in {**BUILD_CONF, **RUNTIME_CONF}.items():
        builder = builder.config(key, value)
    # SPARK_GRAFT_SHUFFLE_PARTITIONS lets CI replay the whole suite
    # under the cluster-default 200 (VERDICT r7 item 8) without code
    # changes - a query that silently depends on the tuned
    # low-partition local config fails that sweep loudly.
    env_shuffle = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "0"))
    builder = builder.config(
        "spark.sql.shuffle.partitions",
        str(shuffle_partitions or env_shuffle or cores),
    )
    spark = builder.getOrCreate()
    return configure(spark)
