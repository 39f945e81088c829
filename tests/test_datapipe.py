"""Invariant tests for the round-4 datapipe batch (q204-q211).

The DuckDB oracle pins value-equality; these pin the semantic
guarantees a value diff cannot express: cap enforcement, span-bound
validity, LSH recall of the streaming screen, mixture normalization,
SemDeDup containment in brute-force cosine pairs, and the snake-shard
balance bound.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from web_scraping_etl_pipeline_spark.plans.datapipe import (
    MIX_BUDGET,
    N_SHARDS,
    SEMDEDUP_T,
    SOURCE_CAP,
    SPAN_STRIDE,
    SPAN_W,
    q204_source_caps,
    q205_substring_dup_spans,
    q207_temperature_mixture,
    q209_semantic_cluster_dedup,
    q211_balanced_token_shards,
)
from web_scraping_etl_pipeline_spark.plans.textops import _tokens
from web_scraping_etl_pipeline_spark.plans.vectors import _dot


def test_source_caps_enforced_and_maximal(spark):
    """No source exceeds the cap, and a source with >= cap documents
    contributes exactly cap rows (the cap prunes, never starves)."""
    out = q204_source_caps(spark, SF_DIR).cache()
    per_src = out.groupBy("source").count()
    assert per_src.filter(F.col("count") > SOURCE_CAP).count() == 0
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rich = (
        docs.groupBy("source")
        .count()
        .filter(F.col("count") >= SOURCE_CAP)
        .count()
    )
    assert per_src.filter(F.col("count") == SOURCE_CAP).count() == rich


def test_substring_spans_within_doc_bounds(spark):
    """Every flagged span starts on the stride grid and fits inside
    its document's token count; every flagged hash really is shared
    (n_docs >= 2)."""
    out = q205_substring_dup_spans(spark, SF_DIR).cache()
    assert out.filter((F.col("span_start") - 1) % SPAN_STRIDE != 0).count() == 0
    assert out.filter(F.col("n_docs") < 2).count() == 0
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", F.size(_tokens()).alias("n_tok")
    )
    oob = (
        out.join(docs, "doc_id")
        .filter(F.col("span_start") + SPAN_W - 1 > F.col("n_tok"))
        .count()
    )
    assert oob == 0


def test_mixture_weights_normalized_and_flattened(spark):
    """Weights sum to 1, expected docs sum to ~budget, and the
    temperature flattens: the largest language's weight is below its
    raw token share, the smallest's above."""
    rows = q207_temperature_mixture(spark, SF_DIR).collect()
    assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["expected_docs"] for r in rows) - MIX_BUDGET) <= len(rows)
    tot = sum(r["tok_total"] for r in rows)
    hi = max(rows, key=lambda r: r["tok_total"])
    lo = min(rows, key=lambda r: r["tok_total"])
    assert hi["weight"] < hi["tok_total"] / tot
    assert lo["weight"] > lo["tok_total"] / tot


def test_semdedup_pairs_subset_of_bruteforce(spark):
    """Every dropped vector must have a brute-force cosine >= T with
    some lower-id vector (no false drops), and its reported max_sim
    must match the brute-force maximum over lower ids in its cluster
    to rounding."""
    out = q209_semantic_cluster_dedup(spark, SF_DIR).collect()
    assert len(out) > 0
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    x = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    y = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    brute = (
        x.crossJoin(y)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", _dot("ea", "eb").alias("dp"))
        .filter(F.col("dp") >= SEMDEDUP_T)
    )
    brute_victims = {
        r["vec_b"] for r in brute.select("vec_b").distinct().collect()
    }
    assert {r["vec_id"] for r in out} <= brute_victims


def test_snake_shards_balanced(spark):
    """The serpentine deal bounds per-shard token imbalance: max-min
    spread across shards is at most the largest document's token
    count, and doc counts differ by at most one."""
    rows = q211_balanced_token_shards(spark, SF_DIR).collect()
    assert len(rows) == N_SHARDS
    toks = [r["tok_total"] for r in rows]
    counts = [r["n_docs"] for r in rows]
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    max_doc = docs.select(F.max(F.size(_tokens()))).first()[0]
    assert max(toks) - min(toks) <= max_doc
    assert max(counts) - min(counts) <= 1


def test_dup_ngram_fraction_bounded(spark):
    """dup_char_frac is a fraction in [0,1] and is 0 exactly when no
    3-gram repeats within the document."""
    from web_scraping_etl_pipeline_spark.plans.datapipe import (
        q213_dup_ngram_char_fraction,
    )

    out = q213_dup_ngram_char_fraction(spark, SF_DIR).cache()
    assert out.filter(
        (F.col("dup_char_frac") < 0) | (F.col("dup_char_frac") > 1)
    ).count() == 0
    assert out.count() > 0


def test_containment_bounds_jaccard(spark):
    """For every LSH candidate pair, both containments are >= the
    pair's Jaccard (|A n B|/|A| >= |A n B|/|A u B|) and <= 1."""
    from web_scraping_etl_pipeline_spark.plans.datapipe import (
        q215_containment_verify,
    )
    from web_scraping_etl_pipeline_spark.plans.dedup import (
        q46_lsh_verified_jaccard,
    )

    cont = q215_containment_verify(spark, SF_DIR)
    jac = q46_lsh_verified_jaccard(spark, SF_DIR)
    j = cont.join(jac, ["doc_a", "doc_b"])
    eps = 1e-3  # both sides round at 4 decimals
    bad = j.filter(
        (F.col("containment_a_in_b") + eps < F.col("jaccard"))
        | (F.col("containment_b_in_a") + eps < F.col("jaccard"))
        | (F.col("containment_a_in_b") > 1)
        | (F.col("containment_b_in_a") > 1)
    ).count()
    assert bad == 0
    assert j.count() > 0


def test_stream_sessions_are_batch_sessions_minus_open(spark):
    """The streaming finalized sessions equal the batch q70 sessions
    whose end precedes the corpus max event time (the append-mode
    emission rule)."""
    from web_scraping_etl_pipeline_spark.plans.temporal import (
        q70_session_window,
    )
    from web_scraping_etl_pipeline_spark.streaming.events_stream import (
        q212_stream_session_finalized,
    )
    from web_scraping_etl_pipeline_spark.plans.common import t

    ev = t(spark, SF_DIR, "events")
    max_us = ev.agg(F.max("ts_us")).first()[0]
    batch = q70_session_window(spark, SF_DIR).filter(
        F.col("session_end_us") <= max_us
    )
    stream = q212_stream_session_finalized(spark, SF_DIR)
    cols = ["user_id", "session_start_us", "session_end_us", "n_events"]
    assert (
        batch.select(cols).exceptAll(stream.select(cols)).count() == 0
        and stream.select(cols).exceptAll(batch.select(cols)).count() == 0
    )
