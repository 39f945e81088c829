"""Production-backend gates: the RocksDB state store provider behind
the streaming queries, and the Spark 4 built-in XML source round-trip.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from tests.conftest import SF_DIR

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


def test_streaming_dedup_on_rocksdb_state_store(spark):
    """q145's streaming dedup produces identical results on the
    RocksDB state store provider (the production backend for large
    state - spillable, incremental checkpoints) as on the default
    HDFS-backed in-memory provider."""
    from web_scraping_etl_pipeline_spark.plans import QUERIES

    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    baseline = {
        tuple(r)
        for r in QUERIES["q145_stream_dedup"](spark, SF_DIR).collect()
    }
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB)
    try:
        rocks = {
            tuple(r)
            for r in QUERIES["q145_stream_dedup"](spark, SF_DIR).collect()
        }
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
    assert rocks == baseline
    assert len(rocks) > 0


def test_xml_source_round_trip(spark):
    """Spark 4 built-in XML source: write a slice of documents as XML,
    read it back, values survive (the scrape-feed format the reference
    ecosystem would ingest)."""
    from web_scraping_etl_pipeline_spark.plans.common import t

    docs = (
        t(spark, SF_DIR, "documents")
        .select("doc_id", "lang", "source", "n_chars")
        .limit(50)
    )
    scratch = tempfile.mkdtemp(prefix="wsep-xml-")
    docs.write.format("xml").option("rowTag", "doc").mode(
        "overwrite"
    ).save(scratch + "/docs")
    back = (
        spark.read.format("xml")
        .option("rowTag", "doc")
        .load(scratch + "/docs")
        .select("doc_id", "lang", "source", "n_chars")
    )
    assert {tuple(r) for r in back.collect()} == {
        tuple(r) for r in docs.collect()
    }
