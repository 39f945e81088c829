"""Cross-query consistency gates: independent queries that must agree
on shared quantities. The oracle checks each query in isolation; these
pin the suite-level coherence a user composing operators relies on.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR_T2


def test_datasheet_agrees_with_pair_and_doc_counts(spark):
    """q241's summary numbers recount against the queries they
    summarize: q43's pair list and the raw documents table."""
    from web_scraping_etl_pipeline_spark.plans import QUERIES
    from web_scraping_etl_pipeline_spark.plans.common import t

    card = QUERIES["q241_corpus_datasheet"](spark, SF_DIR_T2).first()
    pairs = QUERIES["q43_lsh_candidate_pairs"](spark, SF_DIR_T2).count()
    docs = t(spark, SF_DIR_T2, "documents")
    assert card["neardup_pairs"] == pairs
    assert card["n_docs"] == docs.count()
    assert card["n_sources"] == docs.select("source").distinct().count()


def test_leakage_matrix_partitions_the_pair_list(spark):
    """q255's split matrix must partition q43's pairs exactly: cell
    counts sum to the pair count, and every cell is correctly flagged
    as leak iff its parts differ."""
    from web_scraping_etl_pipeline_spark.plans import QUERIES

    matrix = QUERIES["q255_split_leakage"](spark, SF_DIR_T2).collect()
    pairs = QUERIES["q43_lsh_candidate_pairs"](spark, SF_DIR_T2).count()
    assert sum(r["n_pairs"] for r in matrix) == pairs
    for r in matrix:
        assert r["is_leak"] == (r["part_a"] != r["part_b"])


def test_budget_fill_is_prefix_of_quality_order(spark):
    """q230's admitted set must be a PREFIX of the quality order: no
    excluded document may rank strictly better (higher score, or same
    score with smaller id) than an admitted one unless the budget cut
    fell between them - i.e. the worst admitted row is better than
    every excluded row."""
    from web_scraping_etl_pipeline_spark.plans import QUERIES
    from web_scraping_etl_pipeline_spark.plans.common import t
    from web_scraping_etl_pipeline_spark.plans.datapipe import _FILL_BUDGET

    fill = QUERIES["q230_token_budget_fill"](spark, SF_DIR_T2).cache()
    assert fill.agg(F.max("cum_tokens")).first()[0] <= _FILL_BUDGET
    worst = fill.orderBy(F.asc("score"), F.desc("doc_id")).first()
    docs = t(spark, SF_DIR_T2, "documents")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    scored = docs.select(
        "doc_id",
        F.floor(1000.0 * F.size(F.array_distinct(toks)) / F.size(toks))
        .cast("long")
        .alias("score"),
    )
    excluded = scored.join(
        fill.select("doc_id"), "doc_id", "left_anti"
    )
    better_excluded = excluded.filter(
        (F.col("score") > worst["score"])
        | (
            (F.col("score") == worst["score"])
            & (F.col("doc_id") < worst["doc_id"])
        )
    )
    assert better_excluded.count() == 0


def test_quantile_normalization_equalizes_distributions(spark):
    """After q242, every source's max normalized score equals the
    corpus maximum (rank ns maps to index N), and normalization is
    monotone within each source."""
    from pyspark.sql import Window

    from web_scraping_etl_pipeline_spark.plans import QUERIES

    out = QUERIES["q242_quantile_normalization"](spark, SF_DIR_T2).cache()
    corpus_max = out.agg(F.max("score")).first()[0]
    per_src_max = out.groupBy("source").agg(
        F.max("norm_score").alias("m")
    )
    assert per_src_max.filter(F.col("m") != corpus_max).count() == 0
    w = Window.partitionBy("source").orderBy("score", "doc_id")
    mono = out.withColumn(
        "prev", F.lag("norm_score").over(w)
    ).filter(
        F.col("prev").isNotNull() & (F.col("norm_score") < F.col("prev"))
    )
    assert mono.count() == 0


def test_decay_features_bounded_by_plain_aggregates(spark):
    """q253's decayed count/value must be positive and never exceed
    the undecayed per-user aggregates (every weight is in (0, 1])."""
    from web_scraping_etl_pipeline_spark.plans import QUERIES
    from web_scraping_etl_pipeline_spark.plans.common import t

    out = QUERIES["q253_time_decay_features"](spark, SF_DIR_T2)
    plain = (
        t(spark, SF_DIR_T2, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_plain"),
            F.sum(F.abs("value")).alias("abs_sum"),
        )
    )
    j = out.join(plain, "user_id")
    assert j.count() == out.count()
    bad = j.filter(
        (F.col("decayed_count") <= 0)
        | (F.col("decayed_count") > F.col("n_plain"))
        | (F.abs(F.col("decayed_value")) > F.col("abs_sum") + 1e-6)
    )
    assert bad.count() == 0


def test_leakage_safe_split_has_zero_cross_split_pairs(spark):
    """q268's guarantee, verified against q43's pair list: no
    near-dup candidate pair may straddle two splits (the exact leak
    class q255 counts must be empty under the cluster-keyed split)."""
    from web_scraping_etl_pipeline_spark.plans import QUERIES

    split = QUERIES["q268_leakage_safe_split"](spark, SF_DIR_T2).select(
        "doc_id", "part"
    )
    pairs = QUERIES["q43_lsh_candidate_pairs"](spark, SF_DIR_T2)
    pa = split.select(
        F.col("doc_id").alias("doc_a"), F.col("part").alias("part_a")
    )
    pb = split.select(
        F.col("doc_id").alias("doc_b"), F.col("part").alias("part_b")
    )
    crossing = (
        pairs.join(pa, "doc_a")
        .join(pb, "doc_b")
        .filter(F.col("part_a") != F.col("part_b"))
    )
    assert crossing.count() == 0
    assert pairs.count() > 0
