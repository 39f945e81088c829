"""kNN-graph hot-bucket guard invariants (VERDICT r12 item 2).

q158's pair stage is a sign-LSH bucket equi-join; without a cap one
skewed bucket makes it quadratic (the r12 64x scale probe measured
72.6M candidate pairs on a skew-FREE corpus - a skewed real corpus
does that in one bucket). KNN_BUCKET_CAP extends q43's
LSH_BUCKET_CAP discipline to the kNN-graph build: the CANDIDATE side
of each bucket keeps its lowest-{cap} vec_ids, bounding pairs by
N * cap while every source still gets a neighborhood. Invariants:

1. On healthy fixtures (every bucket <= cap) the guard is a NO-OP:
   capped edges == uncapped edges, byte for byte.
2. On a corpus with an over-cap bucket (sf0.1: max bucket 146) the
   pair volume is bounded and NO source loses its whole
   neighborhood.
3. On a synthetic one-hot-bucket corpus, Spark and the DuckDB twin
   state the identical cap (same edges).
4. Recall vs exact brute-force kNN is quantified at a no-op SF and
   at the cap-binding SF, with floors pinned (numbers recorded in
   PERF.md).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from web_scraping_etl_pipeline_spark.plans import ORACLE, QUERIES
from web_scraping_etl_pipeline_spark.plans.common import release_transients
from web_scraping_etl_pipeline_spark.plans.vectors import (
    KNN_BUCKET_CAP,
    KNN_K,
    _bucket_expr,
    _dot,
)

SF01 = "/root/testdata/sf0.1"


def _uncapped_edges(spark, sf_dir):
    """q158's pre-cap formulation: every bucket member is a
    candidate."""
    from web_scraping_etl_pipeline_spark.plans.common import t

    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id",
        "embedding",
        _bucket_expr(F.col("embedding")).alias("bucket"),
    )
    a = emb.select(
        F.col("vec_id").alias("src"), F.col("embedding").alias("ea"), "bucket"
    )
    x = emb.select(
        F.col("vec_id").alias("dst"), F.col("embedding").alias("eb"), "bucket"
    )
    pairs = (
        a.join(x, "bucket")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst", F.round(_dot("ea", "eb"), 6).alias("sim"))
    )
    w = Window.partitionBy("src").orderBy(F.desc("sim"), F.asc("dst"))
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= KNN_K)
        .select("src", "dst", "sim", F.col("rk").cast("long").alias("rk"))
    )


def test_cap_is_noop_on_fixture(spark):
    """sf0.001's largest bucket holds 38 members (< cap=64): the
    capped graph must equal the uncapped graph exactly."""
    capped = {
        tuple(r) for r in QUERIES["q158_knn_graph"](spark, SF_DIR).collect()
    }
    uncapped = {tuple(r) for r in _uncapped_edges(spark, SF_DIR).collect()}
    assert capped == uncapped
    release_transients()


def test_cap_binds_at_sf01_and_keeps_every_neighborhood(spark):
    """sf0.1's largest bucket holds 146 members: the cap must
    actually thin the candidate side there (this is the SF the bench
    quotes), pair volume must be bounded by N * cap, and no source
    may lose its whole neighborhood (the exclusion-style guard q43
    uses WOULD zero out hot-bucket nodes; the kNN cap must not)."""
    from web_scraping_etl_pipeline_spark.plans.common import t

    emb = t(spark, SF01, "embeddings").select(
        "vec_id", _bucket_expr(F.col("embedding")).alias("bucket")
    )
    sizes = {
        r["bucket"]: r["n"]
        for r in emb.groupBy("bucket").agg(F.count("*").alias("n")).collect()
    }
    assert max(sizes.values()) > KNN_BUCKET_CAP, (
        "fixture no longer exercises the cap - move this test to a "
        "corpus with an over-cap bucket"
    )
    edges = QUERIES["q158_knn_graph"](spark, SF01)
    per_src = edges.groupBy("src").agg(F.count("*").alias("deg"))
    n_sources = per_src.count()
    # every vector sharing a bucket with >= 1 other vector keeps a
    # neighborhood under the candidate-side cap
    expect_sources = sum(n for n in sizes.values() if n >= 2)
    assert n_sources == expect_sources
    # and the uncapped graph is genuinely different here (cap binds)
    uncapped = _uncapped_edges(spark, SF01)
    assert (
        edges.select("src", "dst").exceptAll(
            uncapped.select("src", "dst")
        ).count()
        > 0
    )
    release_transients()


@pytest.fixture()
def hot_corpus(tmp_path):
    """KNN_BUCKET_CAP + 20 vectors in ONE sign-LSH bucket (all four
    sign dims positive) plus 3 in another: the capped candidate set
    must bound the hot bucket's fan-out on both engines."""
    rng = np.random.RandomState(7)
    n_hot = KNN_BUCKET_CAP + 20
    rows = []
    for i in range(n_hot):
        v = rng.uniform(-1.0, 1.0, 64).astype(np.float32)
        # LSH_DIMS = (1, 17, 33, 49) 1-indexed -> 0-indexed 0/16/32/48
        for d in (0, 16, 32, 48):
            v[d] = abs(v[d]) + 0.01
        rows.append((i + 1, [float(x) for x in v], i % 3))
    for i in range(3):
        v = rng.uniform(-1.0, 1.0, 64).astype(np.float32)
        for d in (0, 16, 32, 48):
            v[d] = -abs(v[d]) - 0.01
        rows.append((1001 + i, [float(x) for x in v], 0))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE e (vec_id BIGINT, embedding FLOAT[], label INTEGER)"
    )
    con.executemany("INSERT INTO e VALUES (?, ?, ?)", rows)
    con.execute(
        f"COPY e TO '{tmp_path}/embeddings.parquet' (FORMAT PARQUET)"
    )
    con.close()
    yield str(tmp_path)
    release_transients()


def test_hot_bucket_capped_and_oracle_agrees(spark, hot_corpus):
    edges = QUERIES["q158_knn_graph"](spark, hot_corpus).collect()
    # the hot bucket's candidate set is its lowest-64 vec_ids: no dst
    # above the cap boundary may appear for a hot-bucket source
    hot_dsts = {
        r["dst"] for r in edges if r["src"] <= KNN_BUCKET_CAP + 20
    }
    assert hot_dsts <= set(range(1, KNN_BUCKET_CAP + 1)), (
        "over-cap candidate leaked into the hot bucket's kNN edges"
    )
    # every hot-bucket member (capped or not) keeps a neighborhood
    srcs = {r["src"] for r in edges}
    assert set(range(1, KNN_BUCKET_CAP + 21)) <= srcs
    # the oracle twin states the identical cap
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{hot_corpus}/embeddings.parquet')"
    )
    dedges = con.execute(ORACLE["q158_knn_graph"]).fetchall()
    con.close()
    assert {tuple(r) for r in dedges} == {tuple(r) for r in edges}


def _recall_vs_brute(spark, sf_dir) -> tuple[float, float]:
    """(capped recall@K, uncapped-LSH recall@K) vs exact brute-force
    kNN by rounded cosine-dot with (sim DESC, dst ASC) tie order."""
    emb = duckdb.sql(
        f"SELECT vec_id, embedding FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in emb], dtype=np.int64)
    mat = np.array([r[1] for r in emb], dtype=np.float64)
    sims = np.round(mat @ mat.T, 6)
    np.fill_diagonal(sims, -np.inf)
    brute: set[tuple[int, int]] = set()
    for i, src in enumerate(ids):
        # sort by (-sim, dst): lexsort keys are applied last-first
        order = np.lexsort((ids, -sims[i]))[:KNN_K]
        brute.update((int(src), int(ids[j])) for j in order)
    capped = {
        (r["src"], r["dst"])
        for r in QUERIES["q158_knn_graph"](spark, sf_dir)
        .select("src", "dst")
        .collect()
    }
    uncapped = {
        (r["src"], r["dst"])
        for r in _uncapped_edges(spark, sf_dir)
        .select("src", "dst")
        .collect()
    }
    release_transients()
    return (
        len(capped & brute) / len(brute),
        len(uncapped & brute) / len(brute),
    )


def test_recall_vs_brute_force_quantified(spark):
    """The no-silent-caps ledger for the kNN graph: recall@3 vs exact
    brute-force kNN, at the no-op SF (isolates the LSH bucketing's
    own recall) and at the cap-binding SF (adds the cap's cost). The
    floors pin the measured r13 values with slack; the PRINTED
    numbers are the PERF.md record."""
    r_small_capped, r_small_uncapped = _recall_vs_brute(spark, SF_DIR)
    assert r_small_capped == r_small_uncapped  # no-op below the cap
    r_big_capped, r_big_uncapped = _recall_vs_brute(spark, SF01)
    # the cap's OWN cost, isolated from the bucketing: how much of the
    # uncapped-LSH edge set survives the candidate thinning
    capped_edges = {
        (r["src"], r["dst"])
        for r in QUERIES["q158_knn_graph"](spark, SF01)
        .select("src", "dst")
        .collect()
    }
    uncapped_edges = {
        (r["src"], r["dst"])
        for r in _uncapped_edges(spark, SF01).select("src", "dst").collect()
    }
    release_transients()
    r_within = len(capped_edges & uncapped_edges) / len(uncapped_edges)
    print(
        f"\nknn recall@{KNN_K}: vs brute force sf0.001 "
        f"lsh={r_small_uncapped:.4f} (cap no-op), sf0.1 "
        f"lsh={r_big_uncapped:.4f} capped={r_big_capped:.4f}; "
        f"capped-vs-uncapped-LSH sf0.1 = {r_within:.4f}"
    )
    # Measured r13 values, pinned with slack. Context for the floors:
    # the synthetic embeddings are uniform random (near-zero cosine
    # structure), so global brute-force recall is bounded by the
    # probability that a true top-3 neighbor lands in the same 4-bit
    # sign bucket (~1/16 base rate; measured LSH-only recall 0.13 at
    # sf0.001 / 0.15 at sf0.1). On real clustered embeddings the
    # bucketing recovers far more; the production recall knob is
    # multi-probe (q184) / more bits, NOT removing the cap. The cap's
    # multiplicative cost tracks bucket_size/cap (sf0.1 buckets ~125
    # vs cap 64 -> ~0.5 of uncapped-LSH edges survive, measured
    # 0.5158 within-LSH, 0.074 vs brute).
    assert r_small_uncapped >= 0.10
    assert r_big_uncapped >= 0.10
    assert r_big_capped >= 0.05
    assert r_within >= 0.40
