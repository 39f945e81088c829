"""q382 LOF hot-bucket guard invariants (VERDICT r13 item 2).

q382's pair stage was the one remaining uncapped bucket equi-join
after r13 cured q158: the 64x scale probe measured it at 72.6M pairs
/ 99.3s = 103.7x time on 64x data (SCALE_PROBE.json
lof_bucket_pairs), and one hot bucket on a skewed corpus makes it
quadratic alone. r14 extends the KNN_BUCKET_CAP discipline to the
LOF candidate side - lowest-{cap} vec_ids per bucket, stated
identically in the DuckDB oracle via the shared _knn_cand_sql CTE.
Invariants (the test_knn_bucket_cap.py pattern):

1. On healthy fixtures (every bucket <= cap) the guard is a NO-OP:
   capped LOF == uncapped LOF, row for row.
2. At the cap-binding SF (sf0.1: max bucket 146) the candidate side
   is genuinely thinned, every source keeps a neighborhood, and the
   LOF-score drift vs the uncapped formulation is quantified with
   floors pinned (numbers recorded in PERF.md).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from web_scraping_etl_pipeline_spark.plans import QUERIES
from web_scraping_etl_pipeline_spark.plans.common import (
    release_transients,
    t,
    transient_persist,
)
from web_scraping_etl_pipeline_spark.plans.vectors import (
    KNN_BUCKET_CAP,
    _bucket_expr,
)
from web_scraping_etl_pipeline_spark.plans.vectors import (
    _LOF_K,
    _LOF_TOPK,
)

SF01 = "/root/testdata/sf0.1"


def _lof(spark, sf_dir, cap, limit=None):
    """q382's plan with the candidate cap as a parameter (cap=None =
    the pre-r14 uncapped formulation) and an optional LIMIT override
    (None = all scored nodes, for whole-ranking drift measurement)."""
    emb = t(spark, sf_dir, "embeddings")
    qi_spark = (
        "transform(embedding,"
        " v -> CAST(FLOOR(CAST(v AS DOUBLE) * 1000000) AS BIGINT))"
    )
    pts = transient_persist(
        emb.select(
            "vec_id",
            F.expr(qi_spark).alias("qi"),
            _bucket_expr(F.col("embedding")).alias("bucket"),
        )
    )
    src = pts
    if cap is not None:
        wc = Window.partitionBy("bucket").orderBy("vec_id")
        src = (
            pts.withColumn("_crk", F.row_number().over(wc))
            .filter(F.col("_crk") <= cap)
            .drop("_crk")
        )
    a = pts.select(
        F.col("vec_id").alias("p"), F.col("qi").alias("qa"), "bucket"
    )
    b = src.select(
        F.col("vec_id").alias("o"), F.col("qi").alias("qb"), "bucket"
    )
    dist = (
        "aggregate(zip_with(qa, qb, (x, y) -> (x - y) * (x - y)),"
        " 0L, (acc, v) -> acc + v)"
    )
    d = (
        a.join(b, "bucket")
        .filter(F.col("p") != F.col("o"))
        .select("p", "o", F.expr(dist).alias("d2"))
    )
    w = Window.partitionBy("p").orderBy("d2", "o")
    knn = transient_persist(
        d.withColumn("rk", F.row_number().over(w)).filter(
            F.col("rk") <= _LOF_K
        )
    )
    kd = knn.filter(F.col("rk") == _LOF_K).select(
        F.col("p").alias("node"), F.col("d2").alias("kdist")
    )
    sr = transient_persist(
        knn.join(kd, knn.o == kd.node)
        .groupBy("p")
        .agg(
            F.sum(F.greatest(F.col("kdist"), F.col("d2")))
            .cast("long")
            .alias("sreach")
        )
    )
    srn = (
        knn.select("p", "o")
        .join(
            sr.select(F.col("p").alias("o"), F.col("sreach").alias("so")),
            "o",
        )
        .groupBy("p")
        .agg(F.sum(F.expr("1.0 / NULLIF(so, 0)")).alias("s"))
    )
    out = (
        sr.join(srn, "p")
        .select(
            F.col("p").alias("vec_id"),
            "sreach",
            F.round(
                F.col("s") * F.col("sreach").cast("double")
                / (_LOF_K * _LOF_K),
                6,
            ).alias("lof"),
        )
        .orderBy(F.col("lof").desc(), "vec_id")
    )
    return out.limit(limit) if limit is not None else out


def test_cap_is_noop_on_fixture(spark):
    """sf0.001's largest bucket holds < cap=64 members: the capped
    query (the registered q382) must equal the uncapped formulation
    exactly, top-10 rows included."""
    capped = [
        tuple(r)
        for r in QUERIES["q382_lof_outliers"](spark, SF_DIR).collect()
    ]
    uncapped = [
        tuple(r)
        for r in _lof(spark, SF_DIR, None, limit=_LOF_TOPK).collect()
    ]
    assert capped == uncapped
    release_transients()


def test_cap_binds_at_sf01_and_drift_quantified(spark):
    """sf0.1's largest bucket holds 146 members, so the cap genuinely
    thins the candidate side at the SF the bench quotes. Pins:

    - every node scored uncapped is still scored capped (no source
      loses its neighborhood - the candidate-side cap never zeroes a
      hot-bucket node, unlike an exclusion-style guard);
    - mean and max |capped - uncapped| LOF over common nodes stay
      below measured ceilings (r14 measured: mean 0.0070, max
      0.0547 on a whole-corpus score spread of ~0.06-0.39);
    - top-100 overlap stays above a measured floor (r14: 23/100).

    Deliberately NOT pinned: top-10 identity. The fixture's
    embeddings are uniform-random, so the LOF distribution is nearly
    flat (every score within ~0.06 of every other) and the top-10 is
    a near-tie lottery - r14 measured 0/10 overlap from a mean score
    drift of only 0.007. On a corpus with genuine density outliers
    the score gap dominates the cap drift; here it cannot. Numbers
    recorded in PERF.md item 81.
    """
    from web_scraping_etl_pipeline_spark.plans.common import t as _t

    emb = _t(spark, SF01, "embeddings").select(
        "vec_id", _bucket_expr(F.col("embedding")).alias("bucket")
    )
    max_bucket = (
        emb.groupBy("bucket").agg(F.count("*").alias("n"))
        .agg(F.max("n").alias("m")).collect()[0]["m"]
    )
    assert max_bucket > KNN_BUCKET_CAP, (
        "fixture no longer exercises the cap - move this test to a "
        "corpus with an over-cap bucket"
    )
    capped = {
        r["vec_id"]: r["lof"]
        for r in _lof(spark, SF01, KNN_BUCKET_CAP).collect()
    }
    uncapped = {
        r["vec_id"]: r["lof"] for r in _lof(spark, SF01, None).collect()
    }
    # anchor the local copy to the REGISTERED plan at the SF where
    # the cap binds: if q382's body drifts from _lof, the drift
    # ceilings below would silently quantify a formulation the query
    # no longer runs (code-review r14 - the q158 desync-hazard class)
    registered = [
        tuple(r)
        for r in QUERIES["q382_lof_outliers"](spark, SF01).collect()
    ]
    local = [
        tuple(r)
        for r in _lof(spark, SF01, KNN_BUCKET_CAP, limit=_LOF_TOPK)
        .collect()
    ]
    assert registered == local
    # no node loses its score: sources are uncapped, and any node
    # with >= _LOF_K capped candidates still ranks. The capped run
    # may score a node the uncapped one also scores - never fewer.
    assert set(uncapped) == set(capped)
    top_c = sorted(capped, key=lambda v: (-capped[v], v))
    top_u = sorted(uncapped, key=lambda v: (-uncapped[v], v))
    overlap10 = len(set(top_c[:_LOF_TOPK]) & set(top_u[:_LOF_TOPK]))
    overlap100 = len(set(top_c[:100]) & set(top_u[:100]))
    drift = [abs(capped[v] - uncapped[v]) for v in capped]
    mean_drift = sum(drift) / len(drift)
    max_drift = max(drift)
    print(
        f"LOF cap drift sf0.1: top{_LOF_TOPK} overlap {overlap10}, "
        f"top100 overlap {overlap100}, mean |dLOF| {mean_drift:.6f}, "
        f"max |dLOF| {max_drift:.6f}, nodes {len(capped)}"
    )
    # ceilings/floors: r14 measured mean 0.0070 / max 0.0547 /
    # top100 23; pinned with headroom so fixture regeneration or
    # contention reruns stay green while a REAL regression (an
    # order-of-magnitude score distortion) still fails.
    assert mean_drift < 0.03
    assert max_drift < 0.2
    assert overlap100 >= 10
    release_transients()
