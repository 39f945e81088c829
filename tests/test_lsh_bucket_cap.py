"""LSH hot-bucket guard invariants (VERDICT r4 item 6).

A degenerate band_key (many documents collapsing to one signature)
makes one LSH bucket quadratic at corpus scale. The guard counts
members per (band, band_key) and excludes over-cap buckets from the
pair join, flagging them via q270 instead. Two invariants:

1. On healthy fixtures the cap is a NO-OP: capped output ==
   uncapped output (the guard never silently changes results where
   no hot bucket exists).
2. On a synthetic corpus with one boilerplate class larger than the
   cap, the hot bucket contributes ZERO pairs, other near-dup pairs
   still surface, and q270 reports the excluded bucket - the
   no-silent-caps ledger.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import SF_DIR
from web_scraping_etl_pipeline_spark.plans import ORACLE, QUERIES
from web_scraping_etl_pipeline_spark.plans.common import release_transients
from web_scraping_etl_pipeline_spark.plans.dedup import (
    LSH_BUCKET_CAP,
    band_keys,
    cached_minhash_sigs,
)
from pyspark.sql import functions as F


def test_cap_is_noop_on_fixture(spark):
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["q43_lsh_candidate_pairs"](spark, SF_DIR).collect()
    }
    banded = band_keys(cached_minhash_sigs(spark, SF_DIR))
    a, b = banded.alias("a"), banded.alias("b")
    uncapped = {
        (r["doc_a"], r["doc_b"])
        for r in a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
        .collect()
    }
    assert capped == uncapped
    # and the ledger is empty where the cap did nothing
    assert QUERIES["q270_lsh_hot_buckets"](spark, SF_DIR).count() == 0


@pytest.fixture()
def hot_corpus(tmp_path):
    """LSH_BUCKET_CAP+6 identical boilerplate docs (one hot bucket in
    every band) plus two genuine near-dup docs and one unique doc."""
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
        "source VARCHAR, n_chars BIGINT)"
    )
    boiler = "terms of service apply all rights reserved contact us"
    near_a = "the quick brown fox jumps over the lazy dog tonight again"
    near_b = "the quick brown fox jumps over the lazy dog tonight maybe"
    uniq = "completely different content about distributed query engines"
    rows = [(i, boiler) for i in range(1, LSH_BUCKET_CAP + 7)]
    rows += [(1001, near_a), (1002, near_b), (1003, uniq)]
    for did, text in rows:
        con.execute(
            "INSERT INTO d VALUES (?, ?, 'en', 'web', ?)",
            [did, text, len(text)],
        )
    con.execute(f"COPY d TO '{tmp_path}/documents.parquet' (FORMAT PARQUET)")
    con.close()
    yield str(tmp_path)
    release_transients()


def test_hot_bucket_excluded_and_flagged(spark, hot_corpus):
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["q43_lsh_candidate_pairs"](
            spark, hot_corpus
        ).collect()
    }
    boiler_ids = set(range(1, LSH_BUCKET_CAP + 7))
    assert not any(
        a in boiler_ids or b in boiler_ids for a, b in pairs
    ), "over-cap bucket leaked pairs into the join"
    assert (1001, 1002) in pairs, "healthy near-dup pair lost"

    flagged = QUERIES["q270_lsh_hot_buckets"](spark, hot_corpus).collect()
    assert flagged, "hot bucket not reported by the ledger"
    assert all(r["n_members"] == LSH_BUCKET_CAP + 6 for r in flagged)

    # the oracle twin states the identical cap: same pairs, same flags
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{hot_corpus}/documents.parquet')"
    )
    dpairs = {
        tuple(r)
        for r in con.execute(
            ORACLE["q43_lsh_candidate_pairs"]
        ).fetchall()
    }
    dflag = con.execute(ORACLE["q270_lsh_hot_buckets"]).fetchall()
    con.close()
    assert dpairs == pairs
    assert len(dflag) == len(flagged)
