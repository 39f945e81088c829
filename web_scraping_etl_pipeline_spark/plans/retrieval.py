"""Retrieval-quality operators: ANN recall evaluation, embedding-space
hygiene, and lexical+vector hybrid search - the measurement half of the
vector stack in plans/vectors.py.

Capability parity note: the reference
(/root/reference/src/topcv_pipeline.py) stops at warehouse queries;
these are the operators its corpus needs the moment documents and
embeddings feed a retrieval system: is the ANN index good enough
(q221), are the vectors clean (q224), and how do lexical and vector
signals fuse into one ranking (q225). Suite rules throughout: bounded
broadcast sides, codegen dot products, no Python in the hot path.
"""

from __future__ import annotations

import math

from pyspark.sql import Window, functions as F

from .common import degenerate_frame, t, t_split, transient_persist
from .registry import query
from .textops import _TOKENS_SQL, _tokens
from .vectors import (
    DIM,
    QUERY_VEC_ID,
    _bucket_expr,
    _bucket_expr_sql,
    _dot,
    _qlit_sql,
    _query_vec,
)

# ---------------------------------------------------------------------------
# q221: ANN recall@k evaluation (LSH bucket search vs exact)
# ---------------------------------------------------------------------------

#: evaluation query set = the first vectors of the table, and the
#: cutoff for both the exact and the approximate top lists.
_EVAL_QUERIES = 10
_EVAL_K = 10

#: shared oracle scaffolding: per-(query, vector) dot products and the
#: per-vector LSH bucket.
_EVAL_DOTS_SQL = f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qe,
             {_bucket_expr_sql('embedding')} AS qb
      FROM embeddings WHERE vec_id < {_EVAL_QUERIES}
    ),
    eb AS (
      SELECT vec_id, embedding,
             {_bucket_expr_sql('embedding')} AS bkt
      FROM embeddings
    ),
    dots AS (
      SELECT q.query_id, e.vec_id, e.bkt, q.qb,
             SUM(CAST(e.embedding[r.i] AS DOUBLE)
                 * CAST(q.qe[r.i] AS DOUBLE)) AS dp
      FROM eb e, q, range(1, {DIM} + 1) r(i)
      GROUP BY q.query_id, e.vec_id, e.bkt, q.qb
    )
"""


@query(
    "q221_ann_recall",
    oracle=_EVAL_DOTS_SQL
    + f""",
    ex AS (
      SELECT query_id, vec_id,
             ROW_NUMBER() OVER (
               PARTITION BY query_id
               ORDER BY ROUND(dp, 6) DESC, vec_id
             ) AS rk
      FROM dots
    ),
    an AS (
      SELECT query_id, vec_id,
             ROW_NUMBER() OVER (
               PARTITION BY query_id
               ORDER BY ROUND(dp, 6) DESC, vec_id
             ) AS rk
      FROM dots WHERE bkt = qb
    ),
    hits AS (
      SELECT e.query_id, COUNT(*) AS n_hit
      FROM ex e JOIN an a
        ON e.query_id = a.query_id AND e.vec_id = a.vec_id
      WHERE e.rk <= {_EVAL_K} AND a.rk <= {_EVAL_K}
      GROUP BY e.query_id
    ),
    asz AS (
      SELECT query_id, COUNT(*) AS n_ann
      FROM an WHERE rk <= {_EVAL_K} GROUP BY query_id
    )
    SELECT q.query_id,
           CAST(COALESCE(asz.n_ann, 0) AS BIGINT) AS n_ann,
           CAST(COALESCE(hits.n_hit, 0) AS BIGINT) AS n_hit,
           ROUND(COALESCE(hits.n_hit, 0) / {_EVAL_K}.0, 4) AS recall_at_k
    FROM (SELECT DISTINCT query_id FROM dots) q
    LEFT JOIN hits USING (query_id)
    LEFT JOIN asz USING (query_id)
    """,
)
def q221_ann_recall(spark, sf_dir):
    """ANN index EVALUATION: recall@10 of the sign-LSH bucket
    search (q51's index) against exact brute force, over
    10 held-out query vectors - the accept/reject gate
    every approximate index must pass before it replaces exact search
    in a pipeline. Per query: how many ANN candidates were returned and
    how many of the true top-10 they recovered.

    Scale: the query set is broadcast (M rows), so both the exact and
    the bucketed pass are ONE scan of the vector table with a
    64-term codegen dot product - no pairwise shuffle. The
    per-query top lists ride a window PARTITIONED by query_id; at
    billion-vector scale with few queries the same plan holds because
    each window partition is a top-k heap over the scan's output, and
    a skew-hedged deployment splits it into per-partition local top-k
    + a tiny global merge (the q106 probe-side pattern)."""
    emb = t(spark, sf_dir, "embeddings")
    qset = emb.filter(F.col("vec_id") < _EVAL_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        _bucket_expr(F.col("embedding")).alias("qb"),
    )
    eb = emb.select(
        "vec_id", "embedding", _bucket_expr(F.col("embedding")).alias("bkt")
    )
    dots = eb.crossJoin(F.broadcast(qset)).select(
        "query_id",
        "vec_id",
        "bkt",
        "qb",
        F.round(_dot("embedding", "qe"), 6).alias("dp"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("dp"), F.asc("vec_id"))
    ex = (
        dots.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _EVAL_K)
        .select("query_id", "vec_id")
    )
    an = (
        dots.filter(F.col("bkt") == F.col("qb"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _EVAL_K)
        .select("query_id", "vec_id")
    )
    hits = ex.join(an, ["query_id", "vec_id"]).groupBy("query_id").agg(
        F.count("*").alias("n_hit")
    )
    asz = an.groupBy("query_id").agg(F.count("*").alias("n_ann"))
    base = qset.select("query_id")
    return (
        base.join(hits, "query_id", "left")
        .join(asz, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_ann", F.lit(0)).cast("long").alias("n_ann"),
            F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
            F.round(
                F.coalesce("n_hit", F.lit(0)) / float(_EVAL_K), 4
            ).alias("recall_at_k"),
        )
    )


# ---------------------------------------------------------------------------
# q224: embedding-space outlier audit (per-dimension z-scores)
# ---------------------------------------------------------------------------

#: |z| threshold (on the 4dp-rounded z so both engines branch
#: identically) above which a dimension counts as deviant.
_Z_T = 3.0


@query(
    "q224_embedding_outliers",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, r.i AS dim, CAST(embedding[r.i] AS DOUBLE) AS val
      FROM embeddings, range(1, {DIM} + 1) r(i)
    ),
    stats AS (
      SELECT dim, AVG(val) AS mu, stddev_pop(val) AS sd
      FROM v GROUP BY dim
    ),
    z AS (
      SELECT v.vec_id,
             ROUND(abs(v.val - s.mu) / s.sd, 4) AS zr
      FROM v JOIN stats s USING (dim)
    )
    SELECT vec_id,
           CAST(SUM(CASE WHEN zr > {_Z_T} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dims_over,
           ROUND(MAX(zr), 4) AS max_z
    FROM z
    GROUP BY vec_id
    HAVING SUM(CASE WHEN zr > {_Z_T} THEN 1 ELSE 0 END) >= 1
    """,
)
def q224_embedding_outliers(spark, sf_dir):
    """Embedding-space OUTLIER audit: per-dimension corpus mean/std,
    then every vector's per-dimension |z|; vectors with any dimension
    beyond 3.0 sigma are flagged with how many dimensions deviate
    and the worst z. Catches the broken-encoder batches (NaN-adjacent
    blowups, wrong normalization, truncated inputs) that silently
    poison an ANN index. z is rounded to 4dp BEFORE thresholding so
    both engines take the same branch despite summation-order float
    noise in the stats.

    Scale: the stats side is a 64-row aggregate with map-side
    partials (explode -> groupBy dim), broadcast back onto a second
    map-only pass over the vectors - no fact-sized shuffle. At 100 TB
    the explode never materializes wide: it is fused into the partial
    aggregation within a single codegen stage."""
    emb = t(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "fval")
    ).select(
        "vec_id",
        (F.col("pos") + 1).alias("dim"),
        F.col("fval").cast("double").alias("val"),
    )
    stats = v.groupBy("dim").agg(
        F.avg("val").alias("mu"), F.stddev_pop("val").alias("sd")
    )
    z = v.join(F.broadcast(stats), "dim").select(
        "vec_id",
        F.round(
            F.abs(F.col("val") - F.col("mu"))
            / F.nullif(F.col("sd"), F.lit(0.0)),
            4,
        ).alias(
            "zr"
        ),
    )
    over = F.sum(F.when(F.col("zr") > _Z_T, 1).otherwise(0))
    return (
        z.groupBy("vec_id")
        .agg(
            over.cast("long").alias("n_dims_over"),
            F.round(F.max("zr"), 4).alias("max_z"),
        )
        .filter(F.col("n_dims_over") >= 1)
    )


# ---------------------------------------------------------------------------
# q225: hybrid lexical + vector retrieval (reciprocal-rank fusion)
# ---------------------------------------------------------------------------

#: the lexical query terms (fixed literals from the corpus vocabulary),
#: candidate-pool size per ranker, RRF smoothing constant, and the
#: final result size.
_RRF_TERMS = ("spark", "join", "merge", "window")
_RRF_POOL = 50
_RRF_C = 60
_RRF_K = 10

_RRF_TERMS_SQL = ", ".join(f"'{w}'" for w in _RRF_TERMS)


@query(
    "q225_hybrid_rrf",
    oracle=f"""
    WITH lexpool AS (
      SELECT doc_id, overlap FROM (
        SELECT doc_id,
               len(list_intersect(list_distinct({_TOKENS_SQL}),
                                  [{_RRF_TERMS_SQL}])) AS overlap
        FROM documents
      ) ORDER BY overlap DESC, doc_id LIMIT {_RRF_POOL}
    ),
    lex AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY overlap DESC, doc_id) AS r_lex
      FROM lexpool
    ),
    qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
    dots AS (
      SELECT e.vec_id AS doc_id,
             SUM(CAST(e.embedding[r.i] AS DOUBLE)
                 * CAST(qv.qe[r.i] AS DOUBLE)) AS dp
      FROM embeddings e, qv, range(1, {DIM} + 1) r(i)
      GROUP BY e.vec_id
    ),
    vecpool AS (
      SELECT doc_id, ROUND(dp, 6) AS cos_sim FROM dots
      ORDER BY ROUND(dp, 6) DESC, doc_id LIMIT {_RRF_POOL}
    ),
    vec AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY cos_sim DESC, doc_id) AS r_vec
      FROM vecpool
    ),
    fused AS (
      SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id,
             lex.r_lex, vec.r_vec,
             ROUND(COALESCE(1.0 / ({_RRF_C} + lex.r_lex), 0)
                   + COALESCE(1.0 / ({_RRF_C} + vec.r_vec), 0), 6)
               AS rrf_score
      FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id
    )
    SELECT doc_id, r_lex, r_vec, rrf_score
    FROM fused
    ORDER BY rrf_score DESC, doc_id
    LIMIT {_RRF_K}
    """,
)
def q225_hybrid_rrf(spark, sf_dir):
    """HYBRID retrieval: lexical term-overlap ranking and vector cosine
    ranking fused by Reciprocal Rank Fusion (score = sum of
    1/(60+rank) over the rankers that retrieved the doc) - the
    standard BM25+ANN fusion every modern retrieval stack ships,
    here with documents and their embeddings joined by id parity
    (doc_id == vec_id, the q62 multimodal convention).

    Scale: each ranker reduces to TakeOrderedAndProject (top-50
    with a total tie-break) - the scale-safe per-partition-heap + merge
    Spark gives a sorted LIMIT, never a global sort. Ranks are then
    assigned WITHIN the 50-row pools (bounded frames - the
    global window there is the adjudicated bounded-aggregate class),
    the fusion is a full-outer join of two 50-row frames, and
    the final top-10 is another bounded TakeOrdered."""
    docs = t(spark, sf_dir, "documents")
    emb = t(spark, sf_dir, "embeddings")
    overlap = F.size(
        F.array_intersect(
            F.array_distinct(_tokens()),
            F.array(*[F.lit(w) for w in _RRF_TERMS]),
        )
    )
    lexpool = (
        docs.select("doc_id", overlap.alias("overlap"))
        .orderBy(F.desc("overlap"), F.asc("doc_id"))
        .limit(_RRF_POOL)
    )
    lex = lexpool.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("overlap"), F.asc("doc_id")))
        .alias("r_lex"),
    )
    qv = _query_vec(spark, sf_dir)
    if qv is None:  # degenerate corpus: oracle's lex+vec pools empty too
        return degenerate_frame(
            spark, "doc_id bigint, r_lex int, r_vec int, rrf_score double"
        )
    vecpool = (
        emb.select(
            F.col("vec_id").alias("doc_id"),
            F.round(_dot("embedding", _qlit_sql(qv)), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("doc_id"))
        .limit(_RRF_POOL)
    )
    vec = vecpool.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("cos_sim"), F.asc("doc_id")))
        .alias("r_vec"),
    )
    fused = lex.join(vec, "doc_id", "full_outer").select(
        "doc_id",
        "r_lex",
        "r_vec",
        F.round(
            F.coalesce(1.0 / (_RRF_C + F.col("r_lex")), F.lit(0.0))
            + F.coalesce(1.0 / (_RRF_C + F.col("r_vec")), F.lit(0.0)),
            6,
        ).alias("rrf_score"),
    )
    return fused.orderBy(F.desc("rrf_score"), F.asc("doc_id")).limit(_RRF_K)


# ---------------------------------------------------------------------------
# q257: nDCG@k ranking-quality evaluation of the hybrid retriever
# ---------------------------------------------------------------------------

_NDCG_K = 10


@query(
    "q257_ndcg_eval",
    oracle=f"""
    WITH lexpool AS (
      SELECT doc_id, overlap FROM (
        SELECT doc_id,
               len(list_intersect(list_distinct({_TOKENS_SQL}),
                                  ['spark', 'join', 'merge', 'window']))
                 AS overlap
        FROM documents
      ) ORDER BY overlap DESC, doc_id LIMIT 50
    ),
    lex AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY overlap DESC, doc_id) AS r_lex
      FROM lexpool
    ),
    qv AS (SELECT embedding AS qe FROM embeddings
           WHERE vec_id = {QUERY_VEC_ID}),
    dots AS (
      SELECT e.vec_id AS doc_id,
             SUM(CAST(e.embedding[r.i] AS DOUBLE)
                 * CAST(qv.qe[r.i] AS DOUBLE)) AS dp
      FROM embeddings e, qv, range(1, {DIM} + 1) r(i)
      GROUP BY e.vec_id
    ),
    vecpool AS (
      SELECT doc_id, ROUND(dp, 6) AS cos_sim FROM dots
      ORDER BY ROUND(dp, 6) DESC, doc_id LIMIT 50
    ),
    vec AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY cos_sim DESC, doc_id) AS r_vec
      FROM vecpool
    ),
    fused AS (
      SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id,
             ROUND(COALESCE(1.0 / (60 + lex.r_lex), 0)
                   + COALESCE(1.0 / (60 + vec.r_vec), 0), 6) AS rrf_score
      FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id
    ),
    run AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY rrf_score DESC, doc_id) AS pos
      FROM fused ORDER BY rrf_score DESC, doc_id LIMIT {_NDCG_K}
    ),
    truth AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY ROUND(dp, 6) DESC, doc_id)
               AS exact_rank
      FROM dots
    ),
    gains AS (
      SELECT run.pos,
             GREATEST(0, {_NDCG_K} + 1 - truth.exact_rank) AS rel
      FROM run JOIN truth USING (doc_id)
    ),
    ideal AS (
      SELECT SUM(({_NDCG_K} + 1 - r.i) / log2(r.i + 1)) AS idcg
      FROM range(1, {_NDCG_K} + 1) r(i)
    )
    SELECT ROUND(SUM(rel / log2(pos + 1)), 6) AS dcg,
           ROUND(MAX(ideal.idcg), 6) AS idcg,
           ROUND(SUM(rel / log2(pos + 1)) / MAX(ideal.idcg), 6) AS ndcg
    FROM gains, ideal
    """,
)
def q257_ndcg_eval(spark, sf_dir):
    """nDCG@10 of the hybrid RRF retriever (q225) against the
    exact-cosine ground truth: each returned document's graded
    relevance is (10+1 - its exact rank, floored at 0), the
    run's DCG discounts by log2(position+1), and the ideal DCG is the
    perfect ordering's constant - THE ranking-quality metric retrieval
    evaluation reports, closing the loop q221 opened for recall.

    Scale: the run is q225's bounded pools; ground-truth ranks are
    needed only for the 10 returned docs, computed as
    count-of-better over one broadcast-join scan (never a global sort
    of the corpus); the fold to DCG is a 10-row aggregate."""
    run = (
        q225_hybrid_rrf(spark, sf_dir)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.desc("rrf_score"), F.asc("doc_id")))
            .alias("pos"),
        )
        .limit(_NDCG_K)
    )
    qv = _query_vec(spark, sf_dir)
    if qv is None:
        # degenerate corpus: the oracle's gains CTE is empty but its
        # final global aggregate still emits ONE all-NULL readout row
        # (SQL aggregate-over-empty; even the idcg column goes NULL
        # because the oracle folds it through MAX) - mirror that row.
        return degenerate_frame(
            spark,
            "dcg double, idcg double, ndcg double",
            [(None, None, None)],
        )
    emb = t(spark, sf_dir, "embeddings")
    dots = emb.select(
        F.col("vec_id").alias("doc_id"),
        F.round(_dot("embedding", _qlit_sql(qv)), 6).alias("dp"),
    )
    cand = run.join(dots, "doc_id").select(
        "doc_id", "pos", F.col("dp").alias("cand_dp")
    )
    # exact rank of each candidate = 1 + count of strictly-better rows
    cand_b = cand.select(
        F.col("doc_id").alias("c_id"), F.col("cand_dp").alias("c_dp")
    )
    better = (
        dots.crossJoin(F.broadcast(cand_b))
        .filter(
            (F.col("dp") > F.col("c_dp"))
            | (
                (F.col("dp") == F.col("c_dp"))
                & (F.col("doc_id") < F.col("c_id"))
            )
        )
        .groupBy("c_id")
        .agg(F.count("*").alias("n_better"))
    )
    gains = cand.join(
        better, cand["doc_id"] == better["c_id"], "left"
    ).select(
        F.col("pos"),
        F.greatest(
            F.lit(0),
            F.lit(_NDCG_K + 1)
            - (F.coalesce(F.col("n_better"), F.lit(0)) + 1),
        ).alias("rel"),
    )
    idcg = float(
        sum((_NDCG_K + 1 - i) / (math.log2(i + 1)) for i in range(1, _NDCG_K + 1))
    )
    dcg = F.sum(F.col("rel") / F.log2(F.col("pos") + 1))
    return gains.agg(
        F.round(dcg, 6).alias("dcg"),
        F.round(F.lit(idcg), 6).alias("idcg"),
        F.round(dcg / F.lit(idcg), 6).alias("ndcg"),
    )


# ---------------------------------------------------------------------------
# q261: source semantic-similarity map (centroid pairwise cosine)
# ---------------------------------------------------------------------------


@query(
    "q261_source_similarity_map",
    oracle=f"""
    WITH v AS (
      SELECT d.source, r.i AS dim,
             CAST(e.embedding[r.i] AS DOUBLE) AS val
      FROM documents d
      JOIN embeddings e ON d.doc_id = e.vec_id,
           range(1, {DIM} + 1) r(i)
    ),
    cent AS (
      SELECT source, dim, AVG(val) AS c FROM v GROUP BY source, dim
    ),
    norms AS (
      SELECT source, sqrt(SUM(c * c)) AS nrm FROM cent GROUP BY source
    ),
    dots AS (
      SELECT a.source AS source_a, b.source AS source_b,
             SUM(a.c * b.c) AS dp
      FROM cent a JOIN cent b
        ON a.dim = b.dim AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT d.source_a, d.source_b,
           ROUND(d.dp / (na.nrm * nb.nrm), 4) AS cos_sim
    FROM dots d
    JOIN norms na ON d.source_a = na.source
    JOIN norms nb ON d.source_b = nb.source
    """,
)
def q261_source_similarity_map(spark, sf_dir):
    """SOURCE semantic-similarity map: each source's embedding
    CENTROID (mean vector of its documents, ids joined by the q62
    doc_id == vec_id convention), then pairwise cosine between
    centroids - the "which domains cover the same content" picture
    that drives corpus design decisions (merge near-identical feeds,
    up-weight the outlier domains q207's counts alone cannot see).

    Scale: the centroid build is one explode + (source, dim) aggregate
    with map-side partials - the only fact-sized stage; everything
    after lives on the BOUNDED |sources| x 64 centroid frame, whose
    pairwise join is |sources|^2-bounded. At a million sources the
    pairwise stage would switch to the q47 bucket-LSH pattern over
    centroids - same code one level up."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "source")
    emb = t(spark, sf_dir, "embeddings")
    v = (
        docs.join(emb, docs["doc_id"] == emb["vec_id"])
        .select("source", F.posexplode("embedding").alias("pos", "fval"))
        .select(
            "source",
            (F.col("pos") + 1).alias("dim"),
            F.col("fval").cast("double").alias("val"),
        )
    )
    cent = v.groupBy("source", "dim").agg(F.avg("val").alias("c"))
    norms = cent.groupBy("source").agg(
        F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("nrm")
    )
    a = cent.select(
        F.col("source").alias("source_a"), "dim", F.col("c").alias("ca")
    )
    b = cent.select(
        F.col("source").alias("source_b"), "dim", F.col("c").alias("cb")
    )
    dots = (
        a.join(b, "dim")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("dp"))
    )
    na = norms.select(
        F.col("source").alias("source_a"), F.col("nrm").alias("na")
    )
    nb = norms.select(
        F.col("source").alias("source_b"), F.col("nrm").alias("nb")
    )
    return (
        dots.join(F.broadcast(na), "source_a")
        .join(F.broadcast(nb), "source_b")
        .select(
            "source_a",
            "source_b",
            F.round(F.col("dp") / (F.col("na") * F.col("nb")), 4).alias(
                "cos_sim"
            ),
        )
    )


# ---------------------------------------------------------------------------
# q279: BM25 top-k lexical ranking
# ---------------------------------------------------------------------------

#: Okapi BM25 shape parameters (the universal defaults) and the result
#: cutoff; the query terms are the suite's fixed lexical query
#: (_RRF_TERMS), so q225's overlap pool, q257's nDCG and this ranker
#: are three graders of the same information need.
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_K = 20


@query(
    "q279_bm25_topk",
    oracle=f"""
    WITH stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
             AVG(CAST(len({_TOKENS_SQL}) AS DOUBLE)) AS avgdl
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
      FROM (SELECT doc_id, unnest({_TOKENS_SQL}) AS term FROM documents)
      WHERE term IN ({_RRF_TERMS_SQL})
      GROUP BY 1, 2
    ),
    dl AS (
      SELECT doc_id, CAST(len({_TOKENS_SQL}) AS DOUBLE) AS dl
      FROM documents
    ),
    df AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
    contrib AS (
      SELECT tf.doc_id,
             ROUND(ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
                   * (tf.tf * ({_BM25_K1} + 1.0))
                   / (tf.tf + {_BM25_K1}
                      * (1.0 - {_BM25_B}
                         + {_BM25_B} * dl.dl / stats.avgdl)), 6) AS c
      FROM tf
      JOIN dl USING (doc_id)
      JOIN df USING (term)
      CROSS JOIN stats
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_terms,
           ROUND(SUM(c), 6) AS bm25
    FROM contrib
    GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id
    LIMIT {_BM25_K}
    """,
)
def q279_bm25_topk(spark, sf_dir):
    """OKAPI BM25 top-20 for the suite's fixed lexical query -
    the ranking function every search/RAG lexical leg actually runs
    (q225's overlap pool is the recall-oriented candidate generator;
    BM25 is the scorer that orders it): per-term IDF in the Lucene
    +1 form times a saturating tf normalized by document length
    against the corpus average (k1=1.2, b=0.75).

    Scale: term postings are filtered to the query's terms BEFORE the
    tf aggregate, so the only corpus-sized work is the token explode
    (map-side, no shuffle of non-matching tokens); N/avgdl is a 1-row
    broadcast aggregate, df a |Q|-row broadcast, and the final ranking
    is TakeOrderedAndProject over docs that matched at least one term.
    All arithmetic inputs (tf, df, N, dl, sum-of-int dl for avgdl) are
    integer-exact in doubles, so the score is the same float expression
    over identical operands in both engines; per-term contributions
    round to 1e-6 before the <=|Q|-term sum."""
    docs = t(spark, sf_dir, "documents")
    stats = docs.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg(F.size(_tokens()).cast("double")).alias("avgdl"),
    )
    tf = (
        docs.select("doc_id", F.explode(_tokens()).alias("term"))
        .filter(F.col("term").isin(*_RRF_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    dl = docs.select("doc_id", F.size(_tokens()).cast("double").alias("dl"))
    df = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    denom = F.col("tf") + _BM25_K1 * (
        1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl")
    )
    contrib = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(idf * (F.col("tf") * (_BM25_K1 + 1.0)) / denom, 6).alias(
                "c"
            ),
        )
    )
    return (
        contrib.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_terms"),
            F.round(F.sum("c"), 6).alias("bm25"),
        )
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(_BM25_K)
    )


# ---------------------------------------------------------------------------
# q283: rank-biased overlap between the lexical and vector rankers
# ---------------------------------------------------------------------------

#: RBO persistence parameter (Webber et al. 2010): p = 0.9 weights the
#: top ~10 ranks with ~2/3 of the mass; evaluation depth = the pool.
_RBO_P = 0.9


def _rbo_weights() -> list[tuple[int, int]]:
    """(depth, round((1-p) * p^(d-1) * 1e15)) FEMTO-UNIT INTEGER
    weight pairs computed ONCE driver-side so both engines consume
    identical bigint literals. Integer weights make the final fold
    SUM(wt_f * cnt DIV d) pure-bigint and therefore order-independent
    by construction (VERDICT r7 item 7) - the previous double weights
    summed in engine partial-agg order. Quantization error per term
    <= 1e-15 * a_d <= 1e-15; 50 terms << the 1e-6 output rounding."""
    return [
        (d, round((1.0 - _RBO_P) * _RBO_P ** (d - 1) * 1_000_000_000_000_000))
        for d in range(1, _RRF_POOL + 1)
    ]


@query(
    "q283_rank_agreement_rbo",
    oracle=f"""
    WITH lexpool AS (
      SELECT doc_id, overlap FROM (
        SELECT doc_id,
               len(list_intersect(list_distinct({_TOKENS_SQL}),
                                  [{_RRF_TERMS_SQL}])) AS overlap
        FROM documents
      ) ORDER BY overlap DESC, doc_id LIMIT {_RRF_POOL}
    ),
    lex AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY overlap DESC, doc_id) AS r_lex
      FROM lexpool
    ),
    qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
    dots AS (
      SELECT e.vec_id AS doc_id,
             SUM(CAST(e.embedding[r.i] AS DOUBLE)
                 * CAST(qv.qe[r.i] AS DOUBLE)) AS dp
      FROM embeddings e, qv, range(1, {DIM} + 1) r(i)
      GROUP BY e.vec_id
    ),
    vecpool AS (
      SELECT doc_id, ROUND(dp, 6) AS cos_sim FROM dots
      ORDER BY ROUND(dp, 6) DESC, doc_id LIMIT {_RRF_POOL}
    ),
    vec AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY cos_sim DESC, doc_id) AS r_vec
      FROM vecpool
    ),
    common_docs AS (
      SELECT lex.doc_id, lex.r_lex, vec.r_vec
      FROM lex JOIN vec USING (doc_id)
    ),
    w(d, wtf) AS (VALUES {{RBO_W_ROWS}}),
    agreement AS (
      SELECT w.d, w.wtf,
             CAST(COUNT(common_docs.doc_id) AS BIGINT) AS hits
      FROM w
      LEFT JOIN common_docs
        ON common_docs.r_lex <= w.d AND common_docs.r_vec <= w.d
      GROUP BY w.d, w.wtf
    )
    SELECT CAST({_RRF_POOL} AS BIGINT) AS depth,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM common_docs) AS n_common,
           ROUND(SUM((wtf * hits) // d) / 1000000000000000.0, 6)
             AS rbo_trunc
    FROM agreement
    """.replace(
        "{RBO_W_ROWS}",
        ", ".join(f"({d}, {w!r})" for d, w in _rbo_weights()),
    ),
)
def q283_rank_agreement_rbo(spark, sf_dir):
    """RANK-BIASED OVERLAP (Webber et al. 2010) between the suite's two
    rankers for the fixed information need: the lexical overlap pool
    and the cosine pool (q225's two legs), compared as truncated
    RBO@50 with p=0.9 - the top-weighted agreement
    measure for indefinite rankings, reported alongside q257's nDCG
    (quality vs ground truth) as the complementary "do the rankers
    even agree" diagnostic that decides whether hybrid fusion is worth
    its cost. Depth weights (1-p)p^(d-1) are driver-computed literals
    fed to BOTH engines, so no cross-engine pow() is in play.

    Scale: both rank lists are bounded 50-row
    TakeOrderedAndProject pools; the agreement-at-depth profile is a
    theta-join of a 50-row frame against a 50-row
    literal depth table and one bounded aggregate - nothing in the
    metric ever revisits the corpus."""
    docs = t(spark, sf_dir, "documents")
    emb = t(spark, sf_dir, "embeddings")
    overlap = F.size(
        F.array_intersect(
            F.array_distinct(_tokens()),
            F.array(*[F.lit(w) for w in _RRF_TERMS]),
        )
    )
    lex = (
        docs.select("doc_id", overlap.alias("overlap"))
        .orderBy(F.desc("overlap"), F.asc("doc_id"))
        .limit(_RRF_POOL)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.desc("overlap"), F.asc("doc_id")))
            .alias("r_lex"),
        )
    )
    qv = _query_vec(spark, sf_dir)
    if qv is None:
        # degenerate corpus: both pools are empty, but the oracle's
        # LEFT JOIN keeps all 50 literal depth-weight rows with hits=0
        # and its final aggregate emits the defined zero-agreement
        # readout (rbo of two empty rankings = 0) - mirror that row.
        return degenerate_frame(
            spark,
            "depth bigint, n_common bigint, rbo_trunc double",
            [(_RRF_POOL, 0, 0.0)],
        )
    vec = (
        emb.select(
            F.col("vec_id").alias("doc_id"),
            F.round(_dot("embedding", _qlit_sql(qv)), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("doc_id"))
        .limit(_RRF_POOL)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.desc("cos_sim"), F.asc("doc_id")))
            .alias("r_vec"),
        )
    )
    both = lex.join(vec, "doc_id").select("doc_id", "r_lex", "r_vec")
    w = spark.createDataFrame(_rbo_weights(), "d int, wtf long")
    agreement = (
        F.broadcast(w)
        .join(
            both,
            (F.col("r_lex") <= F.col("d")) & (F.col("r_vec") <= F.col("d")),
            "left",
        )
        .groupBy("d", "wtf")
        .agg(F.count("doc_id").cast("long").alias("hits"))
    )
    n_common = both.agg(F.count("*").cast("long").alias("n_common"))
    return agreement.agg(
        F.round(
            F.sum(F.expr("(wtf * hits) DIV d"))
            / F.lit(1_000_000_000_000_000.0),
            6,
        ).alias("rbo_trunc")
    ).crossJoin(F.broadcast(n_common)).select(
        F.lit(_RRF_POOL).cast("long").alias("depth"),
        "n_common",
        "rbo_trunc",
    )


# ---------------------------------------------------------------------------
# q284: maximal-marginal-relevance diversified re-ranking
# ---------------------------------------------------------------------------

#: MMR trade-off (0.5 = equal weight on relevance and novelty), pool
#: and result sizes. lambda is written as the literal 0.5 in BOTH
#: engines' SQL/expressions, so the score arithmetic is identical.
_MMR_POOL = 50
_MMR_K = 10

_MMR_PAIR_DOT = (
    "list_sum(list_transform(range(1, 65), "
    "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))"
)


def _mmr_oracle() -> str:
    """Unrolled greedy MMR as a CTE chain (the q269 set-cover oracle
    technique: one CTE trio per selection step, no recursion)."""
    parts = [
        f"""
    WITH qv AS (SELECT embedding AS qe FROM embeddings
                WHERE vec_id = {QUERY_VEC_ID}),
    dots AS MATERIALIZED (
      SELECT e.vec_id AS doc_id, e.embedding,
             ROUND(SUM(CAST(e.embedding[r.i] AS DOUBLE)
                       * CAST(qv.qe[r.i] AS DOUBLE)), 6) AS rel
      FROM embeddings e, qv, range(1, {DIM} + 1) r(i)
      GROUP BY e.vec_id, e.embedding
    ),
    pool AS MATERIALIZED (
      SELECT doc_id, embedding, rel FROM dots
      ORDER BY rel DESC, doc_id LIMIT {_MMR_POOL}
    ),
    sims AS MATERIALIZED (
      SELECT a.doc_id AS da, b.doc_id AS db,
             ROUND({_MMR_PAIR_DOT}, 6) AS sim
      FROM pool a JOIN pool b ON a.doc_id <> b.doc_id
    ),
    s1 AS MATERIALIZED (SELECT doc_id, 0.5 * rel AS score FROM pool
           ORDER BY score DESC, doc_id LIMIT 1),
    sel1 AS MATERIALIZED (SELECT doc_id FROM s1)"""
    ]
    for i in range(2, _MMR_K + 1):
        parts.append(
            f"""
    c{i} AS MATERIALIZED (
      SELECT p.doc_id, 0.5 * p.rel - 0.5 * MAX(s.sim) AS score
      FROM pool p JOIN sims s ON s.da = p.doc_id
      WHERE s.db IN (SELECT doc_id FROM sel{i - 1})
        AND p.doc_id NOT IN (SELECT doc_id FROM sel{i - 1})
      GROUP BY p.doc_id, p.rel
    ),
    s{i} AS MATERIALIZED (SELECT doc_id, score FROM c{i}
             ORDER BY score DESC, doc_id LIMIT 1),
    sel{i} AS MATERIALIZED (SELECT doc_id FROM sel{i - 1}
               UNION ALL SELECT doc_id FROM s{i})"""
        )
    final = "\n    UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS rk, doc_id, ROUND(score, 6)"
        f" AS score FROM s{i}"
        for i in range(1, _MMR_K + 1)
    )
    return ",".join(parts) + "\n    " + final


@query("q284_mmr_rerank", oracle=_mmr_oracle())
def q284_mmr_rerank(spark, sf_dir):
    """MAXIMAL MARGINAL RELEVANCE (Carbonell & Goldstein 1998)
    diversified top-10: greedily pick the candidate maximizing
    0.5*relevance - 0.5*max-similarity-to-already-selected from the
    cosine top-50 pool - the standard diversity re-ranker a
    RAG retrieval stage runs so the context window isn't 10
    near-copies of the same passage (and the retrieval-side cousin of
    the SemDeDup idea in q209).

    Scale: the cluster does the UNBOUNDED work exactly once - the
    corpus scan into the 50-row TakeOrdered pool and the
    pool x pool similarity matrix - and the inherently-sequential
    greedy loop runs on the DRIVER over those two collected frames
    (50 rels + 50^2 sims, bounded by the literal
    pool size), instead of scheduling K near-empty Spark jobs
    (measured: the 10 argmax jobs cost ~10x the actual arithmetic).
    Selection uses EXACT double scores (0.5*rel - 0.5*max_sim over
    the 6dp-rounded rel/sim inputs) - identical IEEE arithmetic in
    Python and DuckDB, so no per-step rounding is needed; only the
    reported score is rounded, in Spark, at the end."""
    qv = _query_vec(spark, sf_dir)
    if qv is None:  # degenerate corpus: oracle's qv/pool CTEs empty too
        return degenerate_frame(
            spark, "rk bigint, doc_id bigint, score double"
        )
    emb = t(spark, sf_dir, "embeddings")
    pool = transient_persist(
        emb.select(
            F.col("vec_id").alias("doc_id"),
            "embedding",
            F.round(_dot("embedding", _qlit_sql(qv)), 6).alias("rel"),
        )
        .orderBy(F.desc("rel"), F.asc("doc_id"))
        .limit(_MMR_POOL)
    )
    a = pool.select(
        F.col("doc_id").alias("da"), F.col("embedding").alias("ea")
    )
    b = pool.select(
        F.col("doc_id").alias("db"), F.col("embedding").alias("eb")
    )
    rel = {
        r["doc_id"]: r["rel"] for r in pool.select("doc_id", "rel").collect()
    }
    sim: dict[tuple[int, int], float] = {
        (r["da"], r["db"]): r["sim"]
        for r in a.join(b, F.col("da") != F.col("db"))
        .select("da", "db", F.round(_dot("ea", "eb"), 6).alias("sim"))
        .collect()
    }
    pool.unpersist()
    chosen: list[tuple[int, int, float]] = []
    selected: list[int] = []
    for rk in range(1, _MMR_K + 1):
        best_id, best_score = None, None
        for d in sorted(rel):  # doc_id ASC + strict > == the SQL tie-break
            if d in selected:
                continue
            if not selected:
                score = 0.5 * rel[d]
            else:
                score = 0.5 * rel[d] - 0.5 * max(
                    sim[(d, s)] for s in selected
                )
            if best_score is None or score > best_score:
                best_id, best_score = d, score
        if best_id is None:
            # pool smaller than k (degenerate corpus): the oracle's
            # c{rk}.. CTEs are empty from here on and its UNION ALL
            # contributes no further rows - stop selecting.
            break
        chosen.append((rk, best_id, best_score))
        selected.append(best_id)
    return spark.createDataFrame(
        chosen, "rk long, doc_id long, score double"
    ).select("rk", "doc_id", F.round("score", 6).alias("score"))


# ---------------------------------------------------------------------------
# q299: hard-negative mining for retrieval training
# ---------------------------------------------------------------------------

#: positives per query (the docs a training pair treats as relevant)
#: and hard negatives mined per query (the closest non-positives -
#: the examples contrastive training actually learns from).
_HN_POS = 3
_HN_NEG = 5


@query(
    "q299_hard_negative_mining",
    oracle=_EVAL_DOTS_SQL
    + f""",
    rk AS (
      SELECT query_id, vec_id, ROUND(dp, 6) AS dp,
             ROW_NUMBER() OVER (
               PARTITION BY query_id
               ORDER BY ROUND(dp, 6) DESC, vec_id
             ) AS rnk
      FROM dots
      WHERE vec_id <> query_id
    ),
    pos AS (
      SELECT query_id, MIN(dp) AS floor_dp
      FROM rk WHERE rnk <= {_HN_POS} GROUP BY query_id
    )
    SELECT rk.query_id, rk.vec_id,
           CAST(rk.rnk - {_HN_POS} AS BIGINT) AS neg_rank,
           rk.dp AS neg_sim,
           ROUND(pos.floor_dp - rk.dp, 6) AS margin
    FROM rk JOIN pos USING (query_id)
    WHERE rk.rnk > {_HN_POS} AND rk.rnk <= {_HN_POS + _HN_NEG}
    """,
)
def q299_hard_negative_mining(spark, sf_dir):
    """HARD-NEGATIVE MINING for contrastive retrieval training: per
    held-out query, ranks 4..8 of the
    exact similarity ordering (self excluded) - the nearest
    NON-positives - with each negative's similarity and its margin to
    the weakest positive. Random negatives are trivially separable and
    teach an embedding model nothing; the near-miss negatives this
    emits are the pairs DPR/SBERT-style training actually learns from,
    making this the data-GENERATION op beside the suite's retrieval
    evals (q221 recall, q257 nDCG, q283 RBO).

    Scale: the query set is a broadcast M-row frame; scoring is one
    codegen map pass over the corpus (M dots per vector); ranking is a
    window PARTITIONED by query; output is M x 5 rows. Nothing
    unbounded, nothing single-partition."""
    emb = t(spark, sf_dir, "embeddings")
    qset = emb.filter(F.col("vec_id") < _EVAL_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
    )
    dots = (
        emb.crossJoin(F.broadcast(qset))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(_dot("embedding", "qe"), 6).alias("dp"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("dp"), F.asc("vec_id")
    )
    rk = dots.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= _HN_POS + _HN_NEG
    )
    pos = (
        rk.filter(F.col("rnk") <= _HN_POS)
        .groupBy("query_id")
        .agg(F.min("dp").alias("floor_dp"))
    )
    return (
        rk.filter(F.col("rnk") > _HN_POS)
        .join(F.broadcast(pos), "query_id")
        .select(
            "query_id",
            "vec_id",
            (F.col("rnk") - _HN_POS).cast("long").alias("neg_rank"),
            F.col("dp").alias("neg_sim"),
            F.round(F.col("floor_dp") - F.col("dp"), 6).alias("margin"),
        )
    )


# ---------------------------------------------------------------------------
# q304: positional-index phrase search
# ---------------------------------------------------------------------------


@query(
    "q304_phrase_search",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source, {_TOKENS_SQL} AS tk FROM documents
    ),
    pairs AS (
      SELECT tk[r.i] || ' ' || tk[r.i + 1] AS pair
      FROM tok, LATERAL unnest(range(1, len(tk))) r(i)
      WHERE len(tk) >= 2
    ),
    phrase AS (
      SELECT string_split(pair, ' ')[1] AS w1,
             string_split(pair, ' ')[2] AS w2,
             pair
      FROM (SELECT pair, COUNT(*) AS c FROM pairs
            GROUP BY pair ORDER BY c DESC, pair LIMIT 1)
    ),
    post AS (
      SELECT doc_id, r.i AS pos, tk[r.i] AS term
      FROM tok, LATERAL unnest(range(1, len(tk) + 1)) r(i)
    )
    SELECT p1.doc_id,
           d.source,
           ph.pair AS phrase,
           CAST(COUNT(*) AS BIGINT) AS n_hits
    FROM post p1
    JOIN post p2 ON p1.doc_id = p2.doc_id AND p2.pos = p1.pos + 1
    JOIN phrase ph ON p1.term = ph.w1 AND p2.term = ph.w2
    JOIN documents d ON p1.doc_id = d.doc_id
    GROUP BY p1.doc_id, d.source, ph.pair
    """,
)
def q304_phrase_search(spark, sf_dir):
    """PHRASE search over a positional inverted index: find every
    document containing the exact two-word phrase, with occurrence
    counts - the positional-postings join (term w1 at pos p, term w2
    at p+1 in the same doc) that phrase and proximity queries compile
    to in every IR engine, the capability BM25 bag-of-words ranking
    (q279) cannot express. The query phrase is data-derived for
    determinism: the corpus's most frequent adjacent pair (q227's
    argmax), computed in-plan as a 1-row frame.

    Scale: postings are posexplode over the corpus (the unavoidable
    explode every index build pays, same envelope as q279/q267); each
    side then joins the 1-row phrase frame FIRST - broadcast by
    construction (aggregate+limit-derived, the plan-audit-provable
    bound), collapsing each posting stream to one term's postings
    before the positional join - so the only real shuffle joins the
    two PRUNED posting lists on (doc_id, pos), never full postings
    against full postings. At 100 TB this is the textbook
    selective-term-first phrase plan."""
    docs = t_split(spark, sf_dir, "documents").select(
        "doc_id", "source", _tokens().alias("tk")
    )
    pair_col = F.transform(
        F.arrays_zip(
            F.slice("tk", 1, F.size("tk") - 1),
            F.slice("tk", 2, F.size("tk") - 1),
        ),
        lambda g: F.concat_ws(" ", g["0"], g["1"]),
    )
    phrase = (
        docs.filter(F.size("tk") >= 2)
        .select(F.explode(pair_col).alias("pair"))
        .groupBy("pair")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.asc("pair"))
        .limit(1)
        .select(
            F.split("pair", " ").getItem(0).alias("w1"),
            F.split("pair", " ").getItem(1).alias("w2"),
            F.col("pair").alias("phrase"),
        )
    )
    post = docs.select(
        "doc_id", "source", F.posexplode("tk").alias("pos", "term")
    )
    m1 = post.join(
        F.broadcast(phrase.select("w1", "phrase")),
        post.term == F.col("w1"),
    ).select("doc_id", "source", "pos", "phrase")
    m2 = post.join(
        F.broadcast(phrase.select("w2")), post.term == F.col("w2")
    ).select(F.col("doc_id").alias("d2"), F.col("pos").alias("pos2"))
    return (
        m1.join(
            m2,
            (F.col("doc_id") == F.col("d2"))
            & (F.col("pos2") == F.col("pos") + 1),
        )
        .groupBy("doc_id", "source", "phrase")
        .agg(F.count("*").cast("long").alias("n_hits"))
    )


# ---------------------------------------------------------------------------
# q374: TF-IDF cosine retrieval via inverted-index join (integer idf)
# ---------------------------------------------------------------------------

_TFIDF_K = 10


@query(
    "q374_tfidf_cosine_topk",
    oracle=f"""
    WITH tf AS MATERIALIZED (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest({_TOKENS_SQL}) AS term FROM documents)
      GROUP BY 1, 2
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
    idf AS MATERIALIZED (
      SELECT term,
             CAST(FLOOR(LN(CAST(nn.n AS DOUBLE) / COUNT(*)) * 1000000)
                  AS BIGINT) AS idf_micro
      FROM tf, nn GROUP BY term, nn.n
    ),
    dnorm AS MATERIALIZED (
      SELECT tf.doc_id,
             CAST(SUM(tf.tf * idf.idf_micro * tf.tf * idf.idf_micro)
                  AS BIGINT) AS dn2
      FROM tf JOIN idf USING (term) GROUP BY tf.doc_id
    ),
    q AS (
      SELECT term, idf_micro FROM idf
      WHERE term IN ({_RRF_TERMS_SQL})
    ),
    qn AS (SELECT CAST(SUM(idf_micro * idf_micro) AS BIGINT) AS qn2 FROM q),
    dot AS (
      SELECT tf.doc_id,
             CAST(SUM(q.idf_micro * tf.tf * q.idf_micro) AS BIGINT) AS dp,
             CAST(COUNT(*) AS BIGINT) AS n_terms
      FROM tf JOIN q USING (term)
      GROUP BY tf.doc_id
    )
    SELECT dot.doc_id, dot.n_terms, dot.dp AS dot_scaled,
           ROUND(CAST(dot.dp AS DOUBLE)
                 / (SQRT(CAST(qn.qn2 AS DOUBLE))
                    * SQRT(CAST(dnorm.dn2 AS DOUBLE))), 6) AS cosine
    FROM dot JOIN dnorm USING (doc_id), qn
    ORDER BY cosine DESC, dot.doc_id
    LIMIT {_TFIDF_K}
    """,
)
def q374_tfidf_cosine_topk(spark, sf_dir):
    """TF-IDF COSINE top-10 for the suite's fixed lexical
    query - the classical vector-space baseline next to q279's BM25
    (BM25 saturates tf and normalizes by length; tf-idf cosine
    normalizes by the FULL document vector norm, so verbose documents
    are penalized through geometry instead of a length prior). The
    sparse dot product runs as an inverted-index equi-join on term -
    the shape that scales to an impact-ordered index at 100 TB -
    never as a dense vector op.

    Exactness - INTEGER idf weights: idf_micro = floor(ln(N/df)*1e6)
    (the q337-adjudicated LN-floor class: exact integer ratio in,
    1-ulp-class out, micro-floored), after which dot products and
    squared norms are PURE BIGINT sums - order-independent, no float
    accumulation anywhere. The single float expression is the final
    cosine fold (two correctly-rounded SQRTs + one divide, rounded
    6dp), identical text on both engines.

    Scale: one corpus explode into the (doc, term, tf) postings
    relation; idf is a vocabulary-bounded aggregate joined back
    (broadcastable); document norms are one groupBy(doc); the query
    leg touches only postings matching the |Q| query terms; final
    ranking is TakeOrderedAndProject."""
    docs = t(spark, sf_dir, "documents")
    tf = transient_persist(
        docs.select("doc_id", F.explode(_tokens()).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    nn = docs.agg(F.count("*").cast("long").alias("n"))
    idf = transient_persist(
        tf.groupBy("term")
        .agg(F.count("*").cast("long").alias("df"))
        .crossJoin(F.broadcast(nn))
        .select(
            "term",
            F.floor(
                F.log(F.col("n").cast("double") / F.col("df")) * 1_000_000
            )
            .cast("long")
            .alias("idf_micro"),
        )
    )
    dnorm = (
        tf.join(idf, "term")
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.col("tf")
                * F.col("idf_micro")
                * F.col("tf")
                * F.col("idf_micro")
            )
            .cast("long")
            .alias("dn2")
        )
    )
    q = idf.filter(F.col("term").isin(*_RRF_TERMS))
    qn = q.agg(
        F.sum(F.col("idf_micro") * F.col("idf_micro"))
        .cast("long")
        .alias("qn2")
    )
    dot = (
        tf.join(F.broadcast(q), "term")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("idf_micro") * F.col("tf") * F.col("idf_micro"))
            .cast("long")
            .alias("dp"),
            F.count("*").cast("long").alias("n_terms"),
        )
    )
    return (
        dot.join(dnorm, "doc_id")
        .crossJoin(F.broadcast(qn))
        .select(
            "doc_id",
            "n_terms",
            F.col("dp").alias("dot_scaled"),
            F.round(
                F.col("dp").cast("double")
                / F.nullif(
                    F.sqrt(F.col("qn2").cast("double"))
                    * F.sqrt(F.col("dn2").cast("double")),
                    F.lit(0.0),
                ),
                6,
            ).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), "doc_id")
        .limit(_TFIDF_K)
    )
