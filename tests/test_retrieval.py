"""Invariant gates for the retrieval/evaluation suite (plans/retrieval.py)
and the r4 corpus-assembly additions (plans/datapipe.py q218-q222).

Exact-value correctness is the DuckDB oracle's job; these pin the
cross-query invariants an oracle can't see: recall bounded by the pool,
incremental dedup never forming in-batch pairs, quotas respecting both
the budget and cell supply.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR, SF_DIR_T2


def test_ann_recall_bounds_and_exact_is_perfect(spark):
    """recall@k in [0,1]; hits never exceed the ANN pool; and the
    evaluation harness sanity-checks itself: evaluating the EXACT
    ranker against itself would give recall 1 - approximated here by
    asserting every query with a full ANN pool of k has n_hit <= k."""
    from web_scraping_etl_pipeline_spark.plans.retrieval import (
        _EVAL_K,
        _EVAL_QUERIES,
        q221_ann_recall,
    )

    out = q221_ann_recall(spark, SF_DIR_T2).cache()
    assert out.count() == _EVAL_QUERIES
    bad = out.filter(
        (F.col("recall_at_k") < 0)
        | (F.col("recall_at_k") > 1)
        | (F.col("n_hit") > F.col("n_ann"))
        | (F.col("n_hit") > _EVAL_K)
        | (F.col("n_ann") > _EVAL_K)
    ).count()
    assert bad == 0
    # the query vector itself lives in its own bucket, so every query
    # recovers at least its own nearest neighbor (itself).
    assert out.filter(F.col("n_hit") == 0).count() == 0


def test_incremental_dedup_never_pairs_within_batch(spark):
    """Every match points from a batch doc (doc_id % 10 == 0) to an
    INDEXED doc (% 10 != 0) - the incremental contract: no new x new,
    no old x old."""
    from web_scraping_etl_pipeline_spark.plans.datapipe import (
        q219_incremental_lsh_dedup,
    )

    out = q219_incremental_lsh_dedup(spark, SF_DIR_T2).cache()
    assert out.filter(F.col("doc_id") % 10 != 0).count() == 0
    matched = out.filter(F.col("is_dup"))
    assert matched.filter(F.col("match_id") % 10 == 0).count() == 0
    # flagged rows carry the verification score, unflagged carry null
    assert matched.filter(F.col("match_agree").isNull()).count() == 0
    assert (
        out.filter(~F.col("is_dup"))
        .filter(F.col("match_agree").isNotNull())
        .count()
        == 0
    )


def test_corpus_assembly_respects_budget_and_supply(spark):
    """Total picks == budget when supply allows; per-cell picks equal
    min(quota, supply); picks are the cell's hash-rank prefix."""
    from web_scraping_etl_pipeline_spark.plans.common import t
    from web_scraping_etl_pipeline_spark.plans.datapipe import (
        _ASSEMBLY_N,
        q220_corpus_assembly,
    )

    out = q220_corpus_assembly(spark, SF_DIR_T2).cache()
    assert out.count() <= _ASSEMBLY_N
    per_cell = out.groupBy("source", "lang").agg(
        F.count("*").alias("picked"),
        F.max("cell_quota").alias("quota"),
        F.max("cell_rank").alias("max_rank"),
    )
    # picked == quota (cap already folded into quota) and the picks are
    # exactly ranks 1..picked (a prefix, no holes).
    assert per_cell.filter(F.col("picked") != F.col("quota")).count() == 0
    assert per_cell.filter(F.col("max_rank") != F.col("picked")).count() == 0
    supply = t(spark, SF_DIR_T2, "documents").groupBy("source", "lang").agg(
        F.count("*").alias("cnt")
    )
    over = per_cell.join(supply, ["source", "lang"]).filter(
        F.col("picked") > F.col("cnt")
    )
    assert over.count() == 0


def test_novelty_complements_duplication(spark):
    """Exact-duplicate documents (q40 copies >= 2) must score novelty
    0: every shingle of a copy also lives in its twin."""
    from web_scraping_etl_pipeline_spark.plans.datapipe import (
        q218_ngram_novelty,
    )
    from web_scraping_etl_pipeline_spark.plans.dedup import q40_dedup_exact

    nov = q218_ngram_novelty(spark, SF_DIR_T2).cache()
    bad_range = nov.filter(
        (F.col("novelty") < 0) | (F.col("novelty") > 1)
    ).count()
    assert bad_range == 0
    dups = q40_dedup_exact(spark, SF_DIR_T2).filter(F.col("copies") >= 2)
    if dups.count() > 0:
        from web_scraping_etl_pipeline_spark.plans.common import t

        docs = t(spark, SF_DIR_T2, "documents")
        dup_ids = (
            docs.join(
                dups.select("content_hash"),
                F.md5("text") == F.col("content_hash"),
                "left_semi",
            )
            .select("doc_id")
        )
        nonzero = nov.join(dup_ids, "doc_id").filter(
            F.col("novelty") > 0
        ).count()
        assert nonzero == 0


def test_hybrid_rrf_contains_both_rankers_heads(spark):
    """RRF with C=60 and two rankers: a doc ranked 1 by BOTH rankers
    must be the global top result; every returned doc appears in at
    least one pool (no score fabrication)."""
    from web_scraping_etl_pipeline_spark.plans.retrieval import (
        q225_hybrid_rrf,
    )

    out = q225_hybrid_rrf(spark, SF_DIR_T2).cache()
    rows = out.collect()
    assert len(rows) > 0
    assert all(
        r["r_lex"] is not None or r["r_vec"] is not None for r in rows
    )
    both_first = [
        r for r in rows if r["r_lex"] == 1 and r["r_vec"] == 1
    ]
    if both_first:
        top = max(rows, key=lambda r: (r["rrf_score"], -r["doc_id"]))
        assert top["doc_id"] == both_first[0]["doc_id"]
