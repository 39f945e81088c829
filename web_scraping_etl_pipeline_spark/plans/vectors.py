"""Vector-similarity suite over ``embeddings`` (64-dim unit-norm
float vectors).

Scale design: similarity against a query vector is a pure map stage
(broadcast the query, zip_with/aggregate dot product in codegen) +
TakeOrderedAndProject for top-k - no cross join, no shuffle except the
final k-row ordering. The LSH-bucketed variant (q51) prunes the scan to
one bucket: the standard ANN recall/latency trade, expressed as a
filter that pushes into the scan. Embeddings are unit-normalized
(verified on the test data), so cosine == dot product; a general deploy
divides by the norms (q52 computes them).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

from .common import degenerate_frame, shared_stage, t, transient_persist
from .registry import query

DIM = 64
TOP_K = 10

#: deterministic "query vector" = the embedding of vec_id 0, referenced
#: from the table itself so Spark and the oracle use bit-identical
#: floats.
QUERY_VEC_ID = 0

#: dims whose signs form the 4-bit LSH bucket key (axis-aligned random
#: projection; deterministic and cheap - a production variant hashes
#: against seeded Gaussian hyperplanes the same way).
LSH_DIMS = (1, 17, 33, 49)


#: embedding dimensionality of the driver's tables (TESTDATA.md).
DIM = 64


def _dot(a: str, b: str, dim: int = DIM) -> Column:
    """f64 dot product of two float arrays (given as SQL expressions),
    summed in index order.

    Unrolled into a plain 64-term expression instead of a
    ``zip_with`` + ``aggregate`` fold: higher-order-function lambdas
    evaluate on the interpreted path and drag the whole enclosing
    projection out of whole-stage codegen - on a billion-vector scan
    that is the difference between a vectorized codegen loop and
    per-element interpreted eval.  Built as ONE ``F.expr`` string
    rather than 64 nested Column operations: each Column operator is a
    Py4J round-trip, and the 256-call construction measurably costs
    seconds of DRIVER time per query (the plan, not the data, was the
    bottleneck - profiled at sf0.1). SQL ``+`` parses left-associative,
    preserving the fold's summation order, so results stay
    bit-identical."""
    expr = " + ".join(
        f"(CAST(element_at({a}, {i}) AS DOUBLE)"
        f" * CAST(element_at({b}, {i}) AS DOUBLE))"
        for i in range(1, dim + 1)
    )
    return F.expr(expr)


def _query_vec(spark: SparkSession, sf_dir: str):
    """The shared query vector, or None on a corpus where vec_id 0
    does not exist (the degenerate-corpus censuses) - callers early-out
    with their oracle's own empty-input output via degenerate_frame."""
    emb = t(spark, sf_dir, "embeddings")
    row = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select("embedding").first()
    return None if row is None else row["embedding"]


def _qlit_sql(vec) -> str:
    """SQL array literal for a query vector; string-parsed doubles
    (repr round-trips exactly), one expression instead of 64 lit()
    Py4J calls."""
    return (
        "array("
        + ", ".join(f"CAST('{float(v)!r}' AS DOUBLE)" for v in vec)
        + ")"
    )


_ORACLE_DOT = f"""
    WITH q AS (
      SELECT embedding AS qe FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
    ),
    dots AS (
      SELECT e.vec_id,
             SUM(CAST(e.embedding[r.i] AS DOUBLE) * CAST(q.qe[r.i] AS DOUBLE))
               AS dp
      FROM embeddings e, q, range(1, {DIM} + 1) r(i)
      GROUP BY e.vec_id
    )
"""


@query(
    "q50_cosine_topk",
    oracle=_ORACLE_DOT
    + f"""
    SELECT vec_id, ROUND(dp, 6) AS cos_sim
    FROM dots
    ORDER BY ROUND(dp, 6) DESC, vec_id
    LIMIT {TOP_K}
    """,
)
def q50_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k against the query vector: broadcast
    literal + codegen dot product + TakeOrderedAndProject. The exact
    baseline every ANN variant is measured against."""
    qv = _query_vec(spark, sf_dir)
    if qv is None:  # degenerate corpus: oracle's qv CTE is empty too
        return degenerate_frame(spark, "vec_id bigint, cos_sim double")
    emb = t(spark, sf_dir, "embeddings")
    sim = F.round(_dot("embedding", _qlit_sql(qv)), 6).alias("cos_sim")
    return (
        emb.select("vec_id", sim)
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(TOP_K)
    )


def _bucket_expr_sql(col: str) -> str:
    return " + ".join(
        f"(CASE WHEN {col}[{d}] > 0 THEN {1 << i} ELSE 0 END)"
        for i, d in enumerate(LSH_DIMS)
    )


def _bucket_expr(col: Column) -> Column:
    out = F.lit(0)
    for i, d in enumerate(LSH_DIMS):
        out = out + F.when(F.element_at(col, d) > 0.0, F.lit(1 << i)).otherwise(
            F.lit(0)
        )
    return out


@query(
    "q51_ann_lsh_topk",
    oracle=f"""
    WITH q AS (
      SELECT embedding AS qe, {_bucket_expr_sql('embedding')} AS qb
      FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
    ),
    cand AS (
      SELECT e.vec_id, e.embedding
      FROM embeddings e, q
      WHERE {_bucket_expr_sql('e.embedding')} = q.qb
    ),
    dots AS (
      SELECT c.vec_id,
             SUM(CAST(c.embedding[r.i] AS DOUBLE) * CAST(q.qe[r.i] AS DOUBLE))
               AS dp
      FROM cand c, q, range(1, {DIM} + 1) r(i)
      GROUP BY c.vec_id
    )
    SELECT vec_id, ROUND(dp, 6) AS cos_sim
    FROM dots
    ORDER BY ROUND(dp, 6) DESC, vec_id
    LIMIT {TOP_K}
    """,
)
def q51_ann_lsh_topk(spark, sf_dir):
    """ANN via sign-LSH bucketing: candidates = vectors in the query's
    4-bit sign bucket (~1/16 of the data), then exact rerank inside the
    bucket. The bucket predicate is a scan filter - at 100 TB the table
    is written partitioned by bucket and this becomes partition
    pruning."""
    qv = _query_vec(spark, sf_dir)
    if qv is None:  # degenerate corpus: oracle's q CTE is empty too
        return degenerate_frame(spark, "vec_id bigint, cos_sim double")
    qb = sum((1 << i) for i, d in enumerate(LSH_DIMS) if float(qv[d - 1]) > 0.0)
    emb = t(spark, sf_dir, "embeddings")
    cand = emb.filter(_bucket_expr(F.col("embedding")) == F.lit(qb))
    sim = F.round(_dot("embedding", _qlit_sql(qv)), 6).alias("cos_sim")
    return (
        cand.select("vec_id", sim)
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(TOP_K)
    )


@query(
    "q52_vector_norms",
    oracle=f"""
    SELECT e.vec_id,
           ROUND(sqrt(SUM(CAST(e.embedding[r.i] AS DOUBLE) *
                          CAST(e.embedding[r.i] AS DOUBLE))), 6) AS l2_norm,
           CAST(len(e.embedding) AS BIGINT) AS dim
    FROM embeddings e, range(1, {DIM} + 1) r(i)
    GROUP BY e.vec_id, len(e.embedding)
    """,
)
def q52_vector_norms(spark, sf_dir):
    """L2 norms (the denominator a general cosine needs) - pure map."""
    emb = t(spark, sf_dir, "embeddings")
    norm = F.round(
        F.sqrt(_dot("embedding", "embedding")), 6
    ).alias("l2_norm")
    return emb.select(
        "vec_id", norm, F.size("embedding").cast("long").alias("dim")
    )


@query(
    "q53_label_centroids",
    oracle="""
    SELECT label, CAST(r.i - 1 AS BIGINT) AS dim,
           ROUND(AVG(CAST(e.embedding[r.i] AS DOUBLE)), 6) AS centroid
    FROM embeddings e, range(1, 65) r(i)
    GROUP BY label, r.i
    """,
)
def q53_label_centroids(spark, sf_dir):
    """Per-label centroids via posexplode + partial-agg mean: the
    IVF-style coarse quantizer training step (centroids then bucket
    vectors for the IVF ANN path)."""
    emb = t(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label", F.posexplode("embedding").alias("dim", "val")
    )
    return exploded.groupBy("label", F.col("dim").cast("long").alias("dim")).agg(
        F.round(F.avg(F.col("val").cast("double")), 6).alias("centroid")
    )


#: IVF probe count (how many inverted lists the query visits).
NPROBE = 2


@query(
    "q54_ivf_topk",
    oracle=f"""
    WITH q AS (
      SELECT embedding AS qe FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
    ),
    cent AS (
      SELECT label, r.i AS i, AVG(CAST(e.embedding[r.i] AS DOUBLE)) AS c
      FROM embeddings e, range(1, {DIM} + 1) r(i)
      GROUP BY label, r.i
    ),
    cdot AS (
      SELECT cent.label, SUM(cent.c * CAST(q.qe[cent.i] AS DOUBLE)) AS cdp
      FROM cent, q GROUP BY cent.label
    ),
    probed AS (
      SELECT label FROM cdot ORDER BY cdp DESC, label LIMIT {NPROBE}
    ),
    dots AS (
      SELECT e.vec_id,
             SUM(CAST(e.embedding[r.i] AS DOUBLE) * CAST(q.qe[r.i] AS DOUBLE))
               AS dp
      FROM embeddings e, q, range(1, {DIM} + 1) r(i)
      WHERE e.label IN (SELECT label FROM probed)
      GROUP BY e.vec_id
    )
    SELECT vec_id, ROUND(dp, 6) AS cos_sim
    FROM dots
    ORDER BY ROUND(dp, 6) DESC, vec_id
    LIMIT {TOP_K}
    """,
)
def q54_ivf_topk(spark, sf_dir):
    """IVF ANN: the label column is the inverted-list assignment (its
    centroids are the coarse quantizer, cf. q53); the query probes the
    NPROBE nearest centroids and exact-reranks only those lists.

    Scale shape: the quantizer is tiny by design (n_lists x DIM), so
    ranking centroids driver-side is a 2-row collect - the probe
    decision, not data movement. The candidate filter (label IN probed)
    prunes the scan to NPROBE/n_lists of the table; at 100 TB the table
    is written partitioned by list id and this is partition pruning,
    exactly like q51's sign-bucket variant."""
    qv = _query_vec(spark, sf_dir)
    if qv is None:  # degenerate corpus: oracle's q CTE is empty too
        return degenerate_frame(spark, "vec_id bigint, cos_sim double")
    qlit = F.expr(_qlit_sql(qv))
    emb = t(spark, sf_dir, "embeddings")
    cent = emb.select("label", F.posexplode("embedding").alias("d", "val"))
    cdot = (
        cent.groupBy("label", "d")
        .agg(F.avg(F.col("val").cast("double")).alias("c"))
        .groupBy("label")
        .agg(
            F.sum(
                F.col("c") * F.element_at(qlit, (F.col("d") + 1).cast("int"))
            ).alias("cdp")
        )
    )
    probed = [
        r["label"]
        for r in cdot.orderBy(F.desc("cdp"), F.asc("label")).limit(NPROBE).collect()
    ]
    sim = F.round(_dot("embedding", _qlit_sql(qv)), 6).alias("cos_sim")
    return (
        emb.filter(F.col("label").isin(probed))
        .select("vec_id", sim)
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(TOP_K)
    )


@query(
    "q99_kmeans_assign",
    oracle=f"""
    WITH cent AS (
      SELECT label AS c_label, r.i AS i,
             AVG(CAST(e.embedding[r.i] AS DOUBLE)) AS c
      FROM embeddings e, range(1, {DIM} + 1) r(i)
      GROUP BY 1, 2
    ),
    dots AS (
      SELECT e.vec_id, cent.c_label,
             SUM(CAST(e.embedding[cent.i] AS DOUBLE) * cent.c) AS dp
      FROM embeddings e, cent
      GROUP BY 1, 2
    ),
    r AS (
      SELECT vec_id, c_label, dp,
             ROW_NUMBER() OVER (
               PARTITION BY vec_id ORDER BY dp DESC, c_label DESC
             ) AS rn
      FROM dots
    )
    SELECT vec_id, c_label AS nearest_label, ROUND(dp, 5) AS cos_sim
    FROM r WHERE rn = 1
    """,
)
def q99_kmeans_assign(spark, sf_dir):
    """One Lloyd's-iteration assignment step: re-assign every vector to
    its nearest current centroid (label centroids as the running
    means, cosine distance on unit-norm vectors). Chained with q53's
    centroid recompute this is k-means; one step is the oracle-checkable
    unit.

    Scale: centroids are k x DIM (tiny, always broadcast); the
    assignment is a broadcast cross join - k dot products per vector in
    one codegen map stage, argmax folded into a map-side-combinable
    max_by. No shuffle touches the vectors themselves; the only
    exchange carries one (vec, best) row per vector. This is exactly
    how Spark MLlib's KMeans spends its iterations, minus its extra
    norm-precompute pass."""
    return kmeans_assign(spark, sf_dir)


def kmeans_assign(spark, sf_dir):
    """The q99 assignment plan as a reusable stage, persisted once per
    session (q99 returns it, q209's semantic dedup clusters on it; on
    a cluster the assignment is materialized once and every dedup job
    scans it)."""
    from .common import shared_stage

    return shared_stage(
        spark, sf_dir, "kmeans_assign", lambda: _kmeans_assign_build(spark, sf_dir)
    )


def _kmeans_assign_build(spark, sf_dir):
    emb = t(spark, sf_dir, "embeddings")
    cent = (
        emb.select("label", F.posexplode("embedding").alias("dim", "val"))
        .groupBy("label", "dim")
        .agg(F.avg(F.col("val").cast("double")).alias("c"))
        .groupBy("label")
        .agg(
            F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("dc")
        )
        .select(
            F.col("label").alias("c_label"),
            F.expr("transform(dc, x -> x.c)").alias("cvec"),
        )
    )
    scored = emb.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "c_label",
        _dot("embedding", "cvec").alias("dp"),
    )
    ordk = F.struct(F.col("dp"), F.col("c_label"))
    return scored.groupBy("vec_id").agg(
        F.max_by("c_label", ordk).alias("nearest_label"),
        F.round(F.max("dp"), 5).alias("cos_sim"),
    )


@query(
    "q123_embedding_quantization",
    oracle=f"""
    WITH stats AS (
      SELECT r.i AS i,
             MIN(CAST(e.embedding[r.i] AS DOUBLE)) AS lo,
             MAX(CAST(e.embedding[r.i] AS DOUBLE)) AS hi
      FROM embeddings e, range(1, {DIM} + 1) r(i)
      GROUP BY r.i
    )
    SELECT e.vec_id,
           CAST(s.i - 1 AS BIGINT) AS dim,
           CAST(CASE WHEN s.hi = s.lo THEN 0
                ELSE LEAST(FLOOR(255.0 * (CAST(e.embedding[s.i] AS DOUBLE) - s.lo)
                                 / (s.hi - s.lo)), 255) - 128
                END AS BIGINT) AS code
    FROM embeddings e, stats s
    """,
)
def q123_embedding_quantization(spark, sf_dir):
    """Scalar (int8) quantization of the embedding table: per-dimension
    min/max over the corpus define a linear grid; each value maps to
    floor(255 * (v-lo)/(hi-lo)) - 128, the storage/ANN-memory
    compression step (4 bytes -> 1 byte per dim) before building an
    IVF/PQ index.

    Scale: the stats pass is a posexplode + (DIM)-row aggregate (tiny,
    broadcast back); the encode pass is a map stage. FLOOR, not ROUND:
    both engines floor identically on any double, while their ROUND
    implementations diverge at representability boundaries (cf. q91).
    The top-of-range value clamps into bin 255 (LEAST) so hi itself
    does not overflow the int8 domain."""
    emb = t(spark, sf_dir, "embeddings")
    stats = (
        emb.select(F.posexplode("embedding").alias("dim", "val"))
        .groupBy("dim")
        .agg(
            F.min(F.col("val").cast("double")).alias("lo"),
            F.max(F.col("val").cast("double")).alias("hi"),
        )
    )
    ex = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim", "val")
    )
    code = F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
        F.least(
            F.floor(
                255.0
                * (F.col("val").cast("double") - F.col("lo"))
                / (F.col("hi") - F.col("lo"))
            ),
            F.lit(255),
        )
        - 128
    )
    return ex.join(F.broadcast(stats), "dim").select(
        "vec_id",
        F.col("dim").cast("long").alias("dim"),
        code.cast("long").alias("code"),
    )


# ---------------------------------------------------------------------------
# q156: quantized coarse search + exact rerank (production ANN shape)
# ---------------------------------------------------------------------------

#: coarse candidate pool reranked exactly (5x the final k).
RERANK_POOL = 50

#: int8 dequantization back to the grid midpoint's left edge:
#: v' = lo + (code + 128) / 255 * (hi - lo).
_DEQ_SQL = "(lo + (CAST(code AS DOUBLE) + 128) / 255.0 * (hi - lo))"

_Q156_CTES = f"""
    WITH stats AS (
      SELECT r.i AS i,
             MIN(CAST(e.embedding[r.i] AS DOUBLE)) AS lo,
             MAX(CAST(e.embedding[r.i] AS DOUBLE)) AS hi
      FROM embeddings e, range(1, {DIM} + 1) r(i)
      GROUP BY r.i
    ),
    codes AS (
      SELECT e.vec_id, s.i,
             CASE WHEN s.hi = s.lo THEN 0
                  ELSE LEAST(FLOOR(255.0 *
                         (CAST(e.embedding[s.i] AS DOUBLE) - s.lo)
                         / (s.hi - s.lo)), 255) - 128
             END AS code,
             s.lo AS lo, s.hi AS hi
      FROM embeddings e, stats s
    ),
    deq AS (
      SELECT vec_id, i, {_DEQ_SQL} AS v FROM codes
    ),
    qdeq AS (
      SELECT i, v AS qv FROM deq WHERE vec_id = {QUERY_VEC_ID}
    ),
    approx AS (
      SELECT d.vec_id, ROUND(SUM(d.v * q.qv), 6) AS approx_sim
      FROM deq d JOIN qdeq q USING (i)
      GROUP BY d.vec_id
    ),
    pool AS (
      SELECT vec_id, approx_sim FROM approx
      ORDER BY approx_sim DESC, vec_id LIMIT {RERANK_POOL}
    ),
    q AS (
      SELECT embedding AS qe FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
    ),
    exact AS (
      SELECT p.vec_id, p.approx_sim,
             ROUND(SUM(CAST(e.embedding[r.i] AS DOUBLE)
                       * CAST(q.qe[r.i] AS DOUBLE)), 6) AS cos_sim
      FROM pool p
      JOIN embeddings e ON e.vec_id = p.vec_id, q, range(1, {DIM} + 1) r(i)
      GROUP BY p.vec_id, p.approx_sim
    )
"""


@query(
    "q156_quantized_rerank",
    oracle=_Q156_CTES
    + f"""
    SELECT vec_id, approx_sim, cos_sim FROM exact
    ORDER BY cos_sim DESC, vec_id LIMIT {TOP_K}
    """,
)
def q156_quantized_rerank(spark, sf_dir):
    """Two-tier ANN search the way production vector stores run it:
    a COARSE pass scores int8-quantized vectors (the q123 grid,
    dequantized - 1 byte/dim of memory traffic instead of 4), keeps a
    50-candidate pool, and an EXACT rerank over full-precision
    embeddings picks the final top-10.

    The scan-heavy stage touches only quantized codes (4x less memory
    bandwidth - at 100 TB the codes fit where the floats do not);
    full-precision vectors are fetched for just 50 rows.
    Candidate selection orders by ROUNDED approx score + vec_id so the
    pool is deterministic in both engines; the exact rerank makes the
    tier-1 approximation invisible whenever the true top-10 survive
    the pool (the standard recall contract of quantized search)."""
    emb = t(spark, sf_dir, "embeddings")
    stats = (
        emb.select(F.posexplode("embedding").alias("dim", "val"))
        .groupBy("dim")
        .agg(
            F.min(F.col("val").cast("double")).alias("lo"),
            F.max(F.col("val").cast("double")).alias("hi"),
        )
    )
    ex = emb.select("vec_id", F.posexplode("embedding").alias("dim", "val"))
    code = F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
        F.least(
            F.floor(
                255.0
                * (F.col("val").cast("double") - F.col("lo"))
                / (F.col("hi") - F.col("lo"))
            ),
            F.lit(255),
        )
        - 128
    )
    deq = (
        ex.join(F.broadcast(stats), "dim")
        .select(
            "vec_id",
            "dim",
            (
                F.col("lo")
                + (code.cast("double") + 128) / 255.0 * (F.col("hi") - F.col("lo"))
            ).alias("v"),
        )
    )
    qdeq = deq.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        "dim", F.col("v").alias("qv")
    )
    approx = (
        deq.join(F.broadcast(qdeq), "dim")
        .groupBy("vec_id")
        .agg(F.round(F.sum(F.col("v") * F.col("qv")), 6).alias("approx_sim"))
    )
    pool = approx.orderBy(
        F.desc("approx_sim"), F.asc("vec_id")
    ).limit(RERANK_POOL)
    qv = _query_vec(spark, sf_dir)
    if qv is None:  # degenerate corpus: oracle's qv/pool CTEs empty too
        return degenerate_frame(
            spark, "vec_id bigint, approx_sim double, cos_sim double"
        )
    exact = (
        emb.join(F.broadcast(pool), "vec_id")
        .select(
            "vec_id",
            "approx_sim",
            F.round(_dot("embedding", _qlit_sql(qv)), 6).alias("cos_sim"),
        )
    )
    return exact.orderBy(F.desc("cos_sim"), F.asc("vec_id")).limit(TOP_K)


# ---------------------------------------------------------------------------
# q157: random projection (Johnson-Lindenstrauss) to 8 dims
# ---------------------------------------------------------------------------

#: output dimensionality and the deterministic integer projection
#: matrix M[i][j] = ((i*31 + j*17) % 7) - 3 (both engines rebuild it
#: from the formula; no RNG, no shipped state).
RP_DIM = 8


def _rp_coeff(i: int, j: int) -> int:
    return ((i * 31 + j * 17) % 7) - 3


@query(
    "q157_random_projection",
    oracle=f"""
    SELECT e.vec_id,
           {", ".join(
               "ROUND(SUM(CAST(e.embedding[r.i] AS DOUBLE) * "
               f"(((r.i - 1) * 31 + {j} * 17) % 7 - 3)), 6) AS p{j}"
               for j in range(RP_DIM)
           )}
    FROM embeddings e, range(1, {DIM} + 1) r(i)
    GROUP BY e.vec_id
    """,
)
def q157_random_projection(spark, sf_dir):
    """Johnson-Lindenstrauss-style random projection: 64-dim embeddings
    x a fixed RP_DIM (8)-column integer matrix - the dimensionality-
    reduction step before cheap clustering/visualization, and the
    general form of the sign-LSH bucketing (q51) with full projections
    kept instead of sign bits.

    The matrix is derived from a deterministic formula, so both engines
    rebuild identical coefficients and the projection is a pure map
    stage: RP_DIM (8) unrolled 64-term expressions in one codegen pass, no
    shuffle, no state. At 100 TB this runs at scan speed; a learned
    projection swaps the literal coefficients for a broadcast matrix
    with the same plan."""
    emb = t(spark, sf_dir, "embeddings")
    # one F.expr string per projection, not 64 nested Column ops each:
    # the 512-operator construction costs ~5s of driver-side Py4J
    # round-trips (measured at sf0.1) while the actual execution is
    # milliseconds; SQL + is left-associative so summation order (and
    # bit-exactness vs the oracle) is unchanged.
    cols = []
    for j in range(RP_DIM):
        expr = " + ".join(
            f"(CAST(element_at(embedding, {i + 1}) AS DOUBLE)"
            f" * {float(_rp_coeff(i, j))!r}D)"
            for i in range(DIM)
        )
        cols.append(F.round(F.expr(expr), 6).alias(f"p{j}"))
    return emb.select("vec_id", *cols)


# ---------------------------------------------------------------------------
# q158: k-NN graph over LSH buckets
# ---------------------------------------------------------------------------

KNN_K = 3

#: VERDICT r12 item 2 - the q43 LSH_BUCKET_CAP discipline extended to
#: the kNN-graph build: the CANDIDATE (dst) side of the bucket
#: equi-join keeps at most this many members per bucket (the lowest
#: vec_ids - deterministic and identical cross-engine), so pair
#: fan-out is bounded by N * CAP instead of sum(bucket^2): the 64x
#: scale probe's 72.6M-pair curve (SCALE_PROBE.json lsh_bucket_knn,
#: r12) was exactly this shape going quadratic on a skew-free corpus;
#: a skewed real corpus makes one bucket quadratic on its own. Every
#: SOURCE still gets edges (only the candidate set is thinned), so no
#: node loses its neighborhood entirely. The per-bucket rank that
#: implements the cap costs O(n_b log n_b) in the bucket's task -
#: strictly cheaper than the O(n_b^2) join it prevents; at 100 TB the
#: bucket count grows with the corpus (more sign bits), and this cap
#: is the skew backstop, not the primary sizing device. Recall impact
#: quantified in tests/test_knn_bucket_cap.py + PERF.md (the cap is a
#: provable NO-OP below 64 members, i.e. at sf0.001/sf0.01).
KNN_BUCKET_CAP = 64

def _knn_cand_sql(
    extra_cols: str = "", payload: str = "embedding", src: str = "b"
) -> str:
    """The capped-candidate CTE body, the ONE statement of the
    KNN_BUCKET_CAP discipline on the oracle side (q158's edge CTE and
    q340's label-carrying variant share it verbatim - code-review r13
    flagged the hand-copied twin as a desync hazard; q382's LOF pair
    stage shares it too as of r14, with ``payload``/``src`` selecting
    its quantized-int column and pts CTE). ``extra_cols`` threads
    additional b-columns (q340's label) through the cap."""
    cols = f"vec_id, {payload}{extra_cols}, bucket"
    return f"""
      SELECT {cols} FROM (
        SELECT {cols},
               ROW_NUMBER() OVER (
                 PARTITION BY bucket ORDER BY vec_id
               ) AS crk
        FROM {src}
      ) WHERE crk <= {KNN_BUCKET_CAP}
    """


#: the kNN-graph derivation as shared oracle CTE text (q158's edge
#: set, reused by the q376 modularity audit): bucket -> capped
#: candidate set -> exact-dot pairs -> per-source rank.
_KNN_EDGES_SQL = f"""
    WITH b AS (
      SELECT vec_id, embedding,
             {_bucket_expr_sql("embedding")} AS bucket
      FROM embeddings
    ),
    cand AS ({_knn_cand_sql()}),
    pairs AS (
      SELECT a.vec_id AS src, x.vec_id AS dst,
             ROUND(SUM(CAST(a.embedding[r.i] AS DOUBLE)
                       * CAST(x.embedding[r.i] AS DOUBLE)), 6) AS sim
      FROM b a JOIN cand x ON a.bucket = x.bucket AND a.vec_id <> x.vec_id,
           range(1, {DIM} + 1) r(i)
      GROUP BY a.vec_id, x.vec_id
    ),
    ranked AS (
      SELECT src, dst, sim,
             ROW_NUMBER() OVER (
               PARTITION BY src ORDER BY sim DESC, dst
             ) AS rk
      FROM pairs
    )"""


@query(
    "q158_knn_graph",
    oracle=_KNN_EDGES_SQL + f"""
    SELECT src, dst, sim, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= {KNN_K}
    """,
)
def q158_knn_graph(spark, sf_dir):
    """k-NN graph construction: each vector's top-KNN_K (3) most similar
    neighbors among its LSH bucket's candidates - the neighborhood
    graph behind label propagation, kNN classification, and
    graph-based ANN indexes (HNSW's bottom layer is exactly this).

    Never all-pairs, and never quadratic-in-a-bucket: candidates come
    from the sign-LSH bucket equi-join (~1/16 of the corpus per
    bucket), the candidate side of each bucket is CAPPED at
    KNN_BUCKET_CAP (64) members (see KNN_BUCKET_CAP - the q43 hot-bucket
    discipline; every source still gets edges), the exact dot product
    runs once per candidate pair, and a per-source window keeps
    KNN_K (3). At 100 TB the bucket count grows with the corpus (more
    sign bits) to hold bucket sizes - the cap is the skew backstop -
    and recall is tuned by multi-probing neighboring buckets, same
    plan shape.

    The ranked edge set rides shared_stage: q340 (label smoothing) and
    q376 (label modularity) consume the identical graph, and on a
    cluster the kNN edges are a materialized table every downstream
    job scans - one session-persisted build here plays that role
    (the q42/q46 dedup-chain device; r13 bench: the suite rebuilt
    this stage three times, ~12.6 s of 411)."""

    def build():
        emb = t(spark, sf_dir, "embeddings").select(
            "vec_id",
            "embedding",
            _bucket_expr(F.col("embedding")).alias("bucket"),
        )
        wc = Window.partitionBy("bucket").orderBy("vec_id")
        cand = (
            emb.withColumn("_crk", F.row_number().over(wc))
            .filter(F.col("_crk") <= KNN_BUCKET_CAP)
            .drop("_crk")
        )
        # The probe side is split to full parallelism: the test file
        # is one row group and the small build side broadcast-joins,
        # so without this the ENTIRE pair-generation + dot-product map
        # runs in the scan's single task (measured: the whole query
        # serialized on one core). On a real multi-split table this
        # repartition is a no-op cost-wise; the per-pair work is what
        # dominates either way.
        a = emb.repartition(
            spark.sparkContext.defaultParallelism
        ).select(
            F.col("vec_id").alias("src"),
            F.col("embedding").alias("ea"),
            "bucket",
        )
        x = cand.select(
            F.col("vec_id").alias("dst"),
            F.col("embedding").alias("eb"),
            "bucket",
        )
        pairs = (
            a.join(x, "bucket")
            .filter(F.col("src") != F.col("dst"))
            .select(
                "src",
                "dst",
                F.round(_dot("ea", "eb"), 6).alias("sim"),
            )
        )
        w = Window.partitionBy("src").orderBy(F.desc("sim"), F.asc("dst"))
        return (
            pairs.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= KNN_K)
            .select(
                "src", "dst", "sim", F.col("rk").cast("long").alias("rk")
            )
        )

    return shared_stage(spark, sf_dir, "knn_edges", build)


@query(
    "q184_multiprobe_ann",
    oracle=f"""
    WITH q AS (
      SELECT embedding AS qe, {_bucket_expr_sql('embedding')} AS qb
      FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
    ),
    cand AS (
      SELECT e.vec_id, e.embedding
      FROM embeddings e, q
      WHERE {_bucket_expr_sql('e.embedding')} IN
            (q.qb, xor(q.qb, 1), xor(q.qb, 2), xor(q.qb, 4), xor(q.qb, 8))
    ),
    dots AS (
      SELECT c.vec_id,
             SUM(CAST(c.embedding[r.i] AS DOUBLE) * CAST(q.qe[r.i] AS DOUBLE))
               AS dp
      FROM cand c, q, range(1, {DIM} + 1) r(i)
      GROUP BY c.vec_id
    )
    SELECT vec_id, ROUND(dp, 6) AS cos_sim
    FROM dots
    ORDER BY ROUND(dp, 6) DESC, vec_id
    LIMIT {TOP_K}
    """,
)
def q184_multiprobe_ann(spark, sf_dir):
    """Multi-probe sign-LSH ANN: q51's single-bucket search plus the
    four Hamming-distance-1 neighbor buckets - the standard recall
    knob. A vector similar to the query but on the wrong side of ONE
    separating hyperplane lands in an adjacent bucket; probing those
    buckets recovers it at 5/16 of the scan instead of 1/16, with no
    index rebuild (probe count is a query-time parameter).

    Scale: the probe set is a 5-element IN-list over the same derived
    bucket expression, so on a bucket-partitioned table this is
    multi-partition pruning - 5 partitions read, the rest skipped;
    the exact rerank stays proportional to the candidate pool."""
    qv = _query_vec(spark, sf_dir)
    if qv is None:  # degenerate corpus: oracle's q CTE is empty too
        return degenerate_frame(spark, "vec_id bigint, cos_sim double")
    qb = sum((1 << i) for i, d in enumerate(LSH_DIMS) if float(qv[d - 1]) > 0.0)
    probes = [qb] + [qb ^ (1 << i) for i in range(len(LSH_DIMS))]
    emb = t(spark, sf_dir, "embeddings")
    cand = emb.filter(
        _bucket_expr(F.col("embedding")).isin(*probes)
    )
    sim = F.round(_dot("embedding", _qlit_sql(qv)), 6).alias("cos_sim")
    return (
        cand.select("vec_id", sim)
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(TOP_K)
    )


# ---------------------------------------------------------------------------
# q289: embedding isotropy audit per label
# ---------------------------------------------------------------------------


@query(
    "q289_embedding_isotropy",
    oracle=f"""
    WITH dimsum AS (
      SELECT e.label, r.i AS dim,
             SUM(CAST(e.embedding[r.i] AS DOUBLE)) AS s
      FROM embeddings e, range(1, {DIM} + 1) r(i)
      GROUP BY 1, 2
    ),
    persum AS (
      SELECT label, SUM(s * s) AS ssum2 FROM dimsum GROUP BY 1
    ),
    selfdot AS (
      SELECT label,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(list_sum(list_transform(range(1, {DIM} + 1),
                 i -> CAST(embedding[i] AS DOUBLE)
                      * CAST(embedding[i] AS DOUBLE)))) AS sumsq
      FROM embeddings
      GROUP BY 1
    )
    SELECT p.label, d.n,
           ROUND(SQRT(p.ssum2) / d.n, 4) AS mean_norm,
           ROUND((p.ssum2 - d.sumsq) / (CAST(d.n AS DOUBLE) * (d.n - 1)),
                 4) AS avg_pair_cos
    FROM persum p JOIN selfdot d USING (label)
    """,
)
def q289_embedding_isotropy(spark, sf_dir):
    """EMBEDDING-SPACE isotropy audit per label: the mean pairwise
    cosine among a label's vectors computed EXACTLY via the identity
    avg_pair = (||sum v||^2 - sum ||v||^2) / (n(n-1)) - no pair join,
    ever - plus the mean-vector norm. High average pairwise cosine is
    the anisotropy/"narrow cone" pathology (Ethayarajh 2019) that
    cripples cosine-based retrieval and similarity dedup; this is the
    one-scan screen run before trusting q50/q209-style cosine
    operators on a new embedding model.

    Scale: one posexplode aggregate for per-dim sums (64 x |labels|
    rows) and one map-stage self-dot aggregate; the identity removes
    the O(n^2) pair enumeration entirely. The only shuffles carry
    (label, dim) partials."""
    emb = t(spark, sf_dir, "embeddings")
    dimsum = (
        emb.select("label", F.posexplode("embedding").alias("dim", "val"))
        .groupBy("label", "dim")
        .agg(F.sum(F.col("val").cast("double")).alias("s"))
    )
    persum = dimsum.groupBy("label").agg(
        F.sum(F.col("s") * F.col("s")).alias("ssum2")
    )
    selfdot = emb.groupBy("label").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(_dot("embedding", "embedding")).alias("sumsq"),
    )
    return persum.join(selfdot, "label").select(
        "label",
        "n",
        F.round(F.sqrt(F.col("ssum2")) / F.col("n"), 4).alias("mean_norm"),
        F.round(
            (F.col("ssum2") - F.col("sumsq"))
            / F.nullif(
                F.col("n").cast("double") * (F.col("n") - 1), F.lit(0.0)
            ),
            4,
        ).alias("avg_pair_cos"),
    )


# ---------------------------------------------------------------------------
# q303: dominant principal component via power iteration
# ---------------------------------------------------------------------------

#: power-iteration rounds. Correctness does not depend on convergence:
#: both engines run the SAME fixed iteration count from the same exact
#: start vector, so the comparison pins the computation, and 6 rounds
#: already separate the dominant eigenvector on this data.
_PI_ROUNDS = 6

#: exact start vector: 1/sqrt(DIM) = 0.125 for DIM=64 - representable
#: exactly in binary, so both engines begin bit-identical.
_PI_V0 = 0.125


def _pi_oracle(t_rounds: int) -> str:
    """Unrolled DuckDB twin of the power iteration (q300's no-hidden-
    iteration discipline): v0 is a 64-element literal; each round
    computes the per-row projection s = <x, v> as the same unrolled
    64-term sum the Spark side uses, aggregates u = X^T s, and
    normalizes. Only the cross-ROW sums are engine-order-dependent
    (~1e-15 relative); power iteration is self-correcting, and the
    outputs are rounded (loadings 5dp, eigenvalue 3dp)."""
    v0 = ", ".join([str(_PI_V0)] * DIM)
    parts = [f"v0 AS (SELECT [{v0}] AS v)"]
    for i in range(1, t_rounds + 1):
        s_terms = " + ".join(
            f"(CAST(e.embedding[{k}] AS DOUBLE) * v.v[{k}])"
            for k in range(1, DIM + 1)
        )
        u_terms = ", ".join(
            f"SUM(s * CAST(embedding[{d}] AS DOUBLE))"
            for d in range(1, DIM + 1)
        )
        parts.append(
            f"""
    s{i} AS MATERIALIZED (
      SELECT {s_terms} AS s, e.embedding
      FROM embeddings e, v{i - 1} v
    ),
    u{i} AS MATERIALIZED (
      SELECT [{u_terms}] AS u FROM s{i}
    ),
    v{i} AS MATERIALIZED (
      SELECT list_transform(
               u, x -> x / sqrt(list_sum(list_transform(u, y -> y * y)))
             ) AS v
      FROM u{i}
    )"""
        )
    return (
        "WITH "
        + ",".join(parts)
        + f"""
    SELECT CAST(r.d AS BIGINT) AS dim,
           ROUND(v.v[r.d], 5) AS loading,
           ROUND(sqrt(list_sum(list_transform(u.u, y -> y * y))), 3)
             AS eigenvalue
    FROM v{t_rounds} v, u{t_rounds} u,
         LATERAL unnest(range(1, {DIM + 1})) r(d)
    """
    )


@query("q303_power_iteration_pca", oracle=_pi_oracle(_PI_ROUNDS))
def q303_power_iteration_pca(spark, sf_dir):
    """Dominant PRINCIPAL COMPONENT of the embedding matrix by power
    iteration: 6 rounds of v <- normalize(X^T (X v)) from
    the exact 1/sqrt(64) start vector, returning the 64 loadings and
    the dominant eigenvalue of X^T X (= ||u|| after the final round).
    The anisotropy axis this finds is what embedding post-processing
    removes (all-but-the-top principal component, Mu & Viswanath
    2018), and the same iteration shape is every distributed spectral
    method's inner loop.

    Scale: each round is ONE map + aggregate pass - the projection
    s = <x, v> is an unrolled 64-term codegen expression (v rides in
    as literals, the q269 broadcast-not-plan rule doesn't apply: v is
    64 doubles, constant-size), and u = X^T s is 64 partial-aggregated
    SUMs, so the full iteration is 6 scans with NO shuffle
    beyond each aggregate's 64-value reduce. Driver state is one
    64-double vector per round (the q177/q269 bounded pattern). At
    1B vectors this is the textbook distributed power method.

    Cross-engine: per-row products and the iteration arithmetic are
    IEEE-identical; only cross-row SUM order differs (~1e-15
    relative), which power iteration self-corrects; outputs rounded
    (loadings 5dp, eigenvalue 3dp, the suite's adjudicated float
    pattern)."""
    import math  # noqa: PLC0415

    emb = t(spark, sf_dir, "embeddings")
    # Decode + widen ONCE (optimization r14, guide sections 5/6): the
    # 6 rounds used to re-read parquet and re-cast all 64 float32
    # elements per term each pass; the iteration now scans one
    # persisted double-array column. element_at over the pre-widened
    # array is the same float32->double value bit-for-bit, and the
    # projection/aggregate expression shapes (hence summation order)
    # are unchanged.
    xs = transient_persist(
        emb.select(
            F.expr(
                "transform(embedding, v -> CAST(v AS DOUBLE))"
            ).alias("x")
        )
    )
    v = [_PI_V0] * DIM
    u = v
    for _ in range(_PI_ROUNDS):
        s_sql = " + ".join(
            f"(element_at(x, {k}) * ({v[k - 1]!r}))"
            for k in range(1, DIM + 1)
        )
        proj = xs.select(F.expr(s_sql).alias("s"), "x")
        row = proj.agg(
            *[
                F.sum(F.expr(f"s * element_at(x, {d})")).alias(f"u{d}")
                for d in range(1, DIM + 1)
            ]
        ).collect()[0]
        if row["u1"] is None:
            # degenerate corpus: every SUM is NULL; the oracle's
            # unrolled CTE chain carries that NULL through to all 64
            # output rows - emit the same readout instead of iterating
            return degenerate_frame(
                spark,
                "dim bigint, loading double, eigenvalue double",
                [(d, None, None) for d in range(1, DIM + 1)],
            )
        u = [float(row[f"u{d}"]) for d in range(1, DIM + 1)]
        ss = 0.0
        for x in u:  # left-assoc fold, mirroring list_sum
            ss += x * x
        norm = math.sqrt(ss)
        if norm == 0.0:
            # all-zero projection (e.g. every embedding is the zero
            # vector - code-review r12): the normalization is
            # undefined and the oracle's u/0 divisions propagate NULL
            # through every remaining round into an all-NULL 64-row
            # readout - mirror it instead of ZeroDivisionError.
            return degenerate_frame(
                spark,
                "dim bigint, loading double, eigenvalue double",
                [(d, None, None) for d in range(1, DIM + 1)],
            )
        v = [x / norm for x in u]
    ss = 0.0
    for x in u:
        ss += x * x
    lam = math.sqrt(ss)
    out = spark.createDataFrame(
        [(d, v[d - 1], lam) for d in range(1, DIM + 1)],
        "dim bigint, raw_loading double, raw_eigenvalue double",
    )
    return out.select(
        "dim",
        F.round("raw_loading", 5).alias("loading"),
        F.round("raw_eigenvalue", 3).alias("eigenvalue"),
    )


# ---------------------------------------------------------------------------
# q306: full k-means (Lloyd) training loop
# ---------------------------------------------------------------------------

#: clusters and Lloyd rounds. q99 is the ASSIGNMENT unit; this is the
#: training loop around it: assign -> re-center -> repeat.
_KM_K = 4
_KM_T = 3
#: centroid re-sync precision: after every AVG re-center both engines
#: round to 7dp, collapsing their ~1e-15 cross-row summation-order
#: difference to bit-identical centroids, so the NEXT round's
#: assignments compare identical doubles (the distance expression
#: itself is unrolled in fixed order on both sides).
_KM_DP = 7


def _km_dist_duck() -> str:
    return " + ".join(
        f"((CAST(e.embedding[{k}] AS DOUBLE) - c.c[{k}])"
        f" * (CAST(e.embedding[{k}] AS DOUBLE) - c.c[{k}]))"
        for k in range(1, DIM + 1)
    )


def _km_oracle(t_rounds: int) -> str:
    """Unrolled Lloyd chain (no hidden iteration): ctr0 = the first
    4 vectors; a{i} assigns every vector to its nearest
    ctr{i-1} centroid (squared L2, ties to the lower cluster id);
    ctr{i} re-centers as the 7dp-rounded per-dim mean."""
    dist = _km_dist_duck()
    avg_list = ", ".join(
        f"ROUND(AVG(CAST(embedding[{d}] AS DOUBLE)), {_KM_DP})"
        for d in range(1, DIM + 1)
    )
    parts = [
        f"""ctr0 AS MATERIALIZED (
      SELECT CAST(vec_id AS BIGINT) AS cluster,
             list_transform(embedding, v -> CAST(v AS DOUBLE)) AS c
      FROM embeddings WHERE vec_id < {_KM_K}
    )"""
    ]
    for i in range(1, t_rounds + 1):
        parts.append(
            f"""
    a{i} AS MATERIALIZED (
      SELECT vec_id, cluster, embedding FROM (
        SELECT e.vec_id, c.cluster, e.embedding,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {dist}, c.cluster
               ) AS rn
        FROM embeddings e, ctr{i - 1} c
      ) WHERE rn = 1
    ),
    ctr{i} AS MATERIALIZED (
      SELECT cluster, [{avg_list}] AS c
      FROM a{i} GROUP BY cluster
    )"""
        )
    return (
        "WITH "
        + ",".join(parts)
        + f"""
    SELECT c.cluster, CAST(r.d AS BIGINT) AS dim,
           c.c[r.d] AS centroid, s.n_members
    FROM ctr{t_rounds} c
    JOIN (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_members
          FROM a{t_rounds} GROUP BY cluster) s USING (cluster),
         LATERAL unnest(range(1, {DIM + 1})) r(d)
    """
    )


@query("q306_kmeans_lloyd", oracle=_km_oracle(_KM_T))
def q306_kmeans_lloyd(spark, sf_dir):
    """FULL k-means training (Lloyd's algorithm): 3 rounds of
    assign-to-nearest-centroid + re-center over the embedding table,
    from the deterministic init (first 4 vectors), returning the
    final centroids (per dim) and cluster sizes. q99 ships the
    assignment STEP; this is the training LOOP - the clustering stage
    SemDeDup-style semantic dedup (q209) and IVF index construction
    (q54) both assume as given.

    Scale: the whole loop is ONE lazy plan - no driver collects at
    all. Each round is (a) a broadcast nested-loop join of the corpus
    against the 4-row centroid frame (aggregate/limit-derived,
    provably bounded - the adjudicated q99/q269 crossJoin shape), with
    the squared-L2 distance unrolled into a fixed-order codegen
    expression, (b) a per-vector window argmin (partitioned by vec_id,
    never global), (c) a groupBy re-center whose per-dim AVGs are the
    round's only shuffle. 3 rounds = 3 scans; at 1B
    vectors this is the textbook broadcast-Lloyd with k small.

    Cross-engine: distances are computed in identical operation order
    on identical doubles (centroids re-sync to 7dp after every
    AVG), so ASSIGNMENTS match exactly; only the AVG itself carries
    the adjudicated rounding-boundary risk."""
    emb = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    ctr = (
        emb.orderBy("vec_id")
        .limit(_KM_K)
        .select(
            F.col("vec_id").cast("long").alias("cluster"),
            F.transform("embedding", lambda v: v.cast("double")).alias("c"),
        )
    )
    dist = F.expr(
        " + ".join(
            f"((CAST(element_at(embedding, {k}) AS DOUBLE)"
            f" - element_at(c, {k}))"
            f" * (CAST(element_at(embedding, {k}) AS DOUBLE)"
            f" - element_at(c, {k})))"
            for k in range(1, DIM + 1)
        )
    )
    for _ in range(_KM_T):
        # argmin by (dist, cluster) as a HASH aggregate (min_by over a
        # struct orders lexicographically = the oracle's ROW_NUMBER
        # tie-break), not a per-vector sort window: at 1B vectors the
        # window would sort k x N rows every round, min_by folds them
        # in the partial aggregate.
        assigned = (
            emb.crossJoin(F.broadcast(ctr))
            .withColumn("dist", dist)
            .groupBy("vec_id")
            .agg(
                F.min_by(
                    F.col("cluster"), F.struct("dist", "cluster")
                ).alias("cluster"),
                F.any_value("embedding").alias("embedding"),
            )
        )
        ctr = (
            assigned.groupBy("cluster")
            .agg(
                *[
                    F.round(
                        F.avg(
                            F.expr(
                                f"CAST(element_at(embedding, {d}) AS DOUBLE)"
                            )
                        ),
                        _KM_DP,
                    ).alias(f"c{d}")
                    for d in range(1, DIM + 1)
                ],
                # cluster size rides the SAME re-center aggregate
                # (optimization r14, guide section 2.4): the old plan
                # recomputed the final round's full assignment pass
                # (scan + broadcast NLJ + argmin aggregate) a SECOND
                # time just to count members, then joined it back -
                # one extra corpus scan per run at any scale. The
                # count over the identical groupBy is free here and
                # the values are the same integers.
                F.count("*").cast("long").alias("n_members"),
            )
            .select(
                "cluster",
                F.array(*[f"c{d}" for d in range(1, DIM + 1)]).alias("c"),
                "n_members",
            )
            # Lineage cut on the k-ROW centroid frame (the q416/q177
            # lesson): lazily-chained rounds made round r's ANALYSIS
            # re-walk a plan containing every earlier round - measured
            # ~6 s of driver-side construction at 3 rounds before any
            # executor ran. Checkpointing 4 rows per round costs three
            # tiny jobs and keeps each round's plan flat; the values
            # (and the oracle) are unchanged.
            .localCheckpoint(eager=True)
        )
    return ctr.select(
        "cluster",
        F.posexplode("c").alias("pos", "centroid"),
        "n_members",
    ).select(
        "cluster",
        (F.col("pos") + 1).cast("long").alias("dim"),
        "centroid",
        "n_members",
    )


# ---------------------------------------------------------------------------
# q334: Johnson-Lindenstrauss random-projection distortion audit
# ---------------------------------------------------------------------------

#: projection target dimensionality and audited sample size.
_JL_K = 16
_JL_SAMPLE = 32


@query(
    "q334_jl_projection_distortion",
    oracle=f"""
    WITH s AS (
      SELECT e.vec_id, CAST(r.i - 1 AS BIGINT) AS d,
             CAST(floor(CAST(e.embedding[r.i] AS DOUBLE) * 1000000)
                  AS BIGINT) AS q
      FROM embeddings e, range(1, {DIM} + 1) r(i)
      WHERE e.vec_id < {_JL_SAMPLE}
    ),
    sgn AS (
      SELECT dd.d, jj.j,
             CASE WHEN CAST(concat('0x', substr(md5(
                    concat('jl:', CAST(dd.d AS VARCHAR), ':',
                           CAST(jj.j AS VARCHAR))), 1, 15)) AS BIGINT)
                  % 2 = 0 THEN 1 ELSE -1 END AS r
      FROM range(0, {DIM}) dd(d), range(0, {_JL_K}) jj(j)
    ),
    y AS (
      SELECT s.vec_id, sgn.j,
             CAST(SUM(s.q * sgn.r) AS BIGINT) AS y
      FROM s JOIN sgn ON s.d = sgn.d
      GROUP BY s.vec_id, sgn.j
    ),
    proj AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             CAST(SUM((a.y - b.y) * (a.y - b.y)) AS BIGINT) AS proj_sq
      FROM y a JOIN y b ON a.j = b.j AND a.vec_id < b.vec_id
      GROUP BY a.vec_id, b.vec_id
    ),
    orig AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             CAST(SUM((a.q - b.q) * (a.q - b.q)) AS BIGINT) AS orig_sq
      FROM s a JOIN s b ON a.d = b.d AND a.vec_id < b.vec_id
      GROUP BY a.vec_id, b.vec_id
    )
    SELECT o.vec_a, o.vec_b, o.orig_sq, p.proj_sq,
           CASE WHEN o.orig_sq > 0
                THEN ROUND(CAST(p.proj_sq AS DOUBLE) / {_JL_K}
                           / o.orig_sq, 6) END AS distortion,
           CAST(CASE WHEN o.orig_sq > 0
                      AND ROUND(CAST(p.proj_sq AS DOUBLE) / {_JL_K}
                                / o.orig_sq, 6) BETWEEN 0.5 AND 1.5
                THEN 1 ELSE 0 END AS BIGINT) AS within_half
    FROM orig o JOIN proj p
      ON o.vec_a = p.vec_a AND o.vec_b = p.vec_b
    """,
)
def q334_jl_projection_distortion(spark, sf_dir):
    """JOHNSON-LINDENSTRAUSS random-projection distortion audit:
    project the 64-dim embeddings to 16 dims with a
    deterministic +-1 sign matrix (Achlioptas 2003's database-friendly
    construction - signs from the md5 bridge, no Gaussian needed) and
    measure, over all pairs of a 32-vector probe sample,
    the ratio ||y_a-y_b||^2/k over ||x_a-x_b||^2 that the JL lemma
    promises concentrates near 1. This is the go/no-go audit run
    before swapping full embeddings for cheap projections in dedup /
    ANN candidate generation (q47/q51 consume exactly such
    projections; this query quantifies what they lose).

    Exactness: embedding coordinates are micro-unit FLOOR-quantized
    (float32 parquet values widen to identical doubles on both
    engines, so the floor is bit-identical - the q319/q333 quantize-
    then-sum discipline, adjudicated in the float lint); projections,
    squared distances, and their sums are then EXACT BIGINT
    arithmetic end-to-end (pair diffs bounded by ~2^27 micro-units,
    squares ~2^54 comfortably inside bigint). One double division at
    the end, identical expression string, rounded once; the JL band
    flag compares the ROUNDED ratio.

    Scale: the sign matrix is a 64x16 constant grid
    (Range-derived, broadcastable by construction); the projection
    y = R'q is ONE equi-join on dim + hash aggregate - at corpus
    scale this is the map-side pattern that projects billions of
    vectors without a shuffle of the embedding table (the grid
    broadcasts). Pair distances run on the 32-vector
    probe frame only (~500 pairs, adjudicated bounded self-joins) -
    the full-corpus consumer of the projections is ANN, not this
    audit."""
    s = (
        t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < _JL_SAMPLE)
        .select(
            "vec_id", F.posexplode("embedding").alias("d", "x")
        )
        .select(
            "vec_id",
            F.col("d").cast("long").alias("d"),
            F.floor(F.col("x").cast("double") * 1000000)
            .cast("long")
            .alias("q"),
        )
    )
    dims = spark.range(DIM).select(F.col("id").alias("d"))
    projs = spark.range(_JL_K).select(F.col("id").alias("j"))
    sgn = dims.crossJoin(projs).select(
        "d",
        "j",
        F.when(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("jl:"),
                            F.col("d").cast("string"),
                            F.lit(":"),
                            F.col("j").cast("string"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % 2
            == 0,
            1,
        )
        .otherwise(-1)
        .alias("r"),
    )
    from .common import transient_persist  # noqa: PLC0415

    s = transient_persist(s)
    y = (
        s.join(F.broadcast(sgn), "d")
        .groupBy("vec_id", "j")
        .agg(F.sum(F.col("q") * F.col("r")).cast("long").alias("y"))
    )
    ya = y.select(
        F.col("vec_id").alias("vec_a"),
        "j",
        F.col("y").alias("y_a"),
    )
    yb = y.select(
        F.col("vec_id").alias("vec_b"),
        "j",
        F.col("y").alias("y_b"),
    )
    proj = (
        ya.join(yb, "j")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .groupBy("vec_a", "vec_b")
        .agg(
            F.sum(
                (F.col("y_a") - F.col("y_b"))
                * (F.col("y_a") - F.col("y_b"))
            ).cast("long").alias("proj_sq")
        )
    )
    sa = s.select(
        F.col("vec_id").alias("vec_a"), "d", F.col("q").alias("q_a")
    )
    sb = s.select(
        F.col("vec_id").alias("vec_b"), "d", F.col("q").alias("q_b")
    )
    orig = (
        sa.join(sb, "d")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .groupBy("vec_a", "vec_b")
        .agg(
            F.sum(
                (F.col("q_a") - F.col("q_b"))
                * (F.col("q_a") - F.col("q_b"))
            ).cast("long").alias("orig_sq")
        )
    )
    # NULLIF keeps the DIVISION total (NULL, like the oracle's CASE)
    # on an all-identical-embeddings corpus where orig_sq = 0: the
    # F.when guards below do not stop ANSI from evaluating the ratio
    # inside the `&` predicate (the q125 guard-does-not-cover-the-
    # argument class, caught by the r12 const-corpus census).
    ratio = F.round(
        F.col("proj_sq").cast("double") / _JL_K / F.expr("NULLIF(orig_sq, 0)"),
        6,
    )
    return orig.join(proj, ["vec_a", "vec_b"]).select(
        "vec_a",
        "vec_b",
        "orig_sq",
        "proj_sq",
        F.when(F.col("orig_sq") > 0, ratio).alias("distortion"),
        F.when(
            (F.col("orig_sq") > 0) & ratio.between(0.5, 1.5), 1
        )
        .otherwise(0)
        .cast("long")
        .alias("within_half"),
    )


# ---------------------------------------------------------------------------
# q340: kNN-vote label smoothing over the q158 neighbor graph
# ---------------------------------------------------------------------------


@query(
    "q340_knn_label_smoothing",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, embedding, label,
             {_bucket_expr_sql("embedding")} AS bucket
      FROM embeddings
    ),
    cand AS ({_knn_cand_sql(", label")}),
    pairs AS (
      SELECT a.vec_id AS src, x.vec_id AS dst, x.label AS nb_label,
             ROUND(SUM(CAST(a.embedding[r.i] AS DOUBLE)
                       * CAST(x.embedding[r.i] AS DOUBLE)), 6) AS sim
      FROM b a JOIN cand x ON a.bucket = x.bucket AND a.vec_id <> x.vec_id,
           range(1, {DIM} + 1) r(i)
      GROUP BY a.vec_id, x.vec_id, x.label
    ),
    knn AS (
      SELECT src, nb_label FROM (
        SELECT src, nb_label,
               ROW_NUMBER() OVER (
                 PARTITION BY src ORDER BY sim DESC, dst
               ) AS rk
        FROM pairs
      ) WHERE rk <= {KNN_K}
    ),
    votes AS (
      -- an UNLABELED neighbor keeps its kNN slot (the neighborhood
      -- is geometric) but casts no vote (r13 partial-records census)
      SELECT src, nb_label, COUNT(*) AS cnt FROM knn
      WHERE nb_label IS NOT NULL GROUP BY src, nb_label
    ),
    smoothed AS (
      SELECT src, nb_label AS voted FROM (
        SELECT src, nb_label,
               ROW_NUMBER() OVER (
                 PARTITION BY src ORDER BY cnt DESC, nb_label
               ) AS vr
        FROM votes
      ) WHERE vr = 1
    )
    SELECT b.label AS label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(CASE WHEN s.voted IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_isolated,
           CAST(SUM(CASE WHEN s.voted IS NOT NULL AND s.voted <> b.label
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_flipped,
           (1000 * CAST(SUM(CASE WHEN s.voted IS NOT NULL
                                  AND s.voted <> b.label
                                 THEN 1 ELSE 0 END) AS BIGINT))
             // COUNT(*) AS flip_milli
    FROM b LEFT JOIN smoothed s ON b.vec_id = s.src
    GROUP BY b.label
    """,
)
def q340_knn_label_smoothing(spark, sf_dir):
    """WEAK-LABEL DENOISING BY NEIGHBORHOOD VOTE: re-label every
    vector by the majority label of its KNN_K (3) nearest same-bucket
    neighbors (the q158 graph) and report, per original label, how
    many points the vote would FLIP - the standard label-noise audit
    before training on weakly-labeled embeddings (Confident Learning
    / kNN-agreement screens), and the one-step special case of label
    propagation.

    Semantics are deterministic end to end: q158's neighbor ranking
    ties break on dst id, the vote argmax breaks on (count DESC,
    label ASC), and every reported number is an integer count or a
    milli-rate by integer division.

    Scale: inherits q158's never-all-pairs discipline (sign-LSH
    bucket equi-join with the KNN_BUCKET_CAP (64)-member candidate cap,
    per-src window top-KNN_K (3)); the vote is one
    hash aggregate on the |V|*KNN_K (3)-edge frame plus a per-src
    window over <=KNN_K (3) rows; the final per-label rollup is
    dimension-bounded. Isolated vectors (no same-bucket neighbor)
    are surfaced, not silently dropped."""
    emb = t(spark, sf_dir, "embeddings")
    labels = emb.select(F.col("vec_id").alias("dst"), F.col("label").alias("nb_label"))
    knn = (
        q158_knn_graph(spark, sf_dir)
        .join(labels, "dst")
        .select("src", "nb_label")
    )
    # unlabeled neighbors occupy kNN slots but cast no vote (mirrors
    # the oracle's votes filter - r13 partial-records census)
    votes = (
        knn.filter(F.col("nb_label").isNotNull())
        .groupBy("src", "nb_label")
        .agg(F.count("*").alias("cnt"))
    )
    wv = Window.partitionBy("src").orderBy(
        F.desc("cnt"), F.asc("nb_label")
    )
    smoothed = (
        votes.withColumn("vr", F.row_number().over(wv))
        .filter(F.col("vr") == 1)
        .select("src", F.col("nb_label").alias("voted"))
    )
    flipped = F.when(
        F.col("voted").isNotNull() & (F.col("voted") != F.col("label")), 1
    ).otherwise(0)
    return (
        emb.select("vec_id", "label")
        .join(smoothed, emb.vec_id == smoothed.src, "left")
        .groupBy("label")
        .agg(
            F.count("*").cast("long").alias("n_vecs"),
            F.sum(F.when(F.col("voted").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_isolated"),
            F.sum(flipped).cast("long").alias("n_flipped"),
            F.expr(
                "(1000 * CAST(SUM(CASE WHEN voted IS NOT NULL"
                " AND voted <> label THEN 1 ELSE 0 END) AS LONG))"
                " DIV COUNT(*)"
            ).alias("flip_milli"),
        )
    )


# ---------------------------------------------------------------------------
# q349: product-quantization codebooks (per-subspace Lloyd)
# ---------------------------------------------------------------------------

#: PQ geometry: M subspaces of SUBD dims, K codes each, T Lloyd rounds
_PQ_M = 4
_PQ_SUBD = DIM // _PQ_M
_PQ_K = 4
_PQ_T = 2


def _pq_oracle() -> str:
    parts = []
    for m in range(_PQ_M):
        base = m * _PQ_SUBD
        dist = " + ".join(
            f"((CAST(e.embedding[{base + k}] AS DOUBLE) - c.c[{k}])"
            f" * (CAST(e.embedding[{base + k}] AS DOUBLE) - c.c[{k}]))"
            for k in range(1, _PQ_SUBD + 1)
        )
        avg_list = ", ".join(
            f"ROUND(AVG(CAST(embedding[{base + d}] AS DOUBLE)), {_KM_DP})"
            for d in range(1, _PQ_SUBD + 1)
        )
        parts.append(
            f"""c{m}_0 AS MATERIALIZED (
      SELECT CAST(vec_id AS BIGINT) AS code,
             list_transform(embedding[{base + 1}:{base + _PQ_SUBD}],
                            v -> CAST(v AS DOUBLE)) AS c
      FROM embeddings WHERE vec_id < {_PQ_K}
    )"""
        )
        for i in range(1, _PQ_T + 1):
            parts.append(
                f"""
    a{m}_{i} AS MATERIALIZED (
      SELECT vec_id, code, embedding FROM (
        SELECT e.vec_id, c.code, e.embedding,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {dist}, c.code
               ) AS rn
        FROM embeddings e, c{m}_{i - 1} c
      ) WHERE rn = 1
    ),
    c{m}_{i} AS MATERIALIZED (
      SELECT code, [{avg_list}] AS c
      FROM a{m}_{i} GROUP BY code
    )"""
            )
    selects = "\n    UNION ALL\n".join(
        f"""    SELECT CAST({m} AS BIGINT) AS subspace, c.code,
           CAST(r.d AS BIGINT) AS dim, c.c[r.d] AS centroid, s.n_members
    FROM c{m}_{_PQ_T} c
    JOIN (SELECT code, CAST(COUNT(*) AS BIGINT) AS n_members
          FROM a{m}_{_PQ_T} GROUP BY code) s USING (code),
         LATERAL unnest(range(1, {_PQ_SUBD + 1})) r(d)"""
        for m in range(_PQ_M)
    )
    return "WITH " + ",".join(parts) + "\n" + selects


@query("q349_pq_codebooks", oracle=_pq_oracle())
def q349_pq_codebooks(spark, sf_dir):
    """PRODUCT-QUANTIZATION codebook training (Jegou et al. 2011):
    split the 64-dim embedding into 4 subspaces of
    16 dims and run an independent 4-centroid Lloyd
    loop (2 rounds, deterministic first-4 init) in each -
    the quantizer that turns q54's IVF into IVF-PQ: a vector becomes
    4 one-byte codes, distances become table lookups, and a
    100 TB embedding store shrinks ~256x. Returns every subspace's
    codebook (per-dim centroids) with cluster occupancy.

    Cross-engine discipline inherited from q306: distances are
    fixed-operation-order doubles against 7dp-re-synced
    centroids, argmin ties break to the lower code id (min_by struct
    == ROW_NUMBER tie-break), so assignments match exactly and only
    the AVG re-center carries the adjudicated rounding-boundary risk.

    Scale: the 4 sub-loops share the SAME scans (one lazy plan;
    Spark schedules the subspace branches independently); each round
    is a broadcast NLJ against a 4-row aggregate-derived frame
    (adjudicated) + min_by hash argmin + groupBy re-center. No driver
    state, no collects; codebook size is 4x4x16
    by construction."""
    emb = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    outs = []
    for m in range(_PQ_M):
        base = m * _PQ_SUBD
        ctr = (
            emb.orderBy("vec_id")
            .limit(_PQ_K)
            .select(
                F.col("vec_id").cast("long").alias("code"),
                F.transform(
                    F.slice("embedding", base + 1, _PQ_SUBD),
                    lambda v: v.cast("double"),
                ).alias("c"),
            )
        )
        dist = F.expr(
            " + ".join(
                f"((CAST(element_at(embedding, {base + k}) AS DOUBLE)"
                f" - element_at(c, {k}))"
                f" * (CAST(element_at(embedding, {base + k}) AS DOUBLE)"
                f" - element_at(c, {k})))"
                for k in range(1, _PQ_SUBD + 1)
            )
        )
        assigned = None
        for _ in range(_PQ_T):
            assigned = (
                emb.crossJoin(F.broadcast(ctr))
                .withColumn("dist", dist)
                .groupBy("vec_id")
                .agg(
                    F.min_by(F.col("code"), F.struct("dist", "code")).alias(
                        "code"
                    ),
                    F.any_value("embedding").alias("embedding"),
                )
            )
            ctr = (
                assigned.groupBy("code")
                .agg(
                    *[
                        F.round(
                            F.avg(
                                F.expr(
                                    f"CAST(element_at(embedding, {base + d})"
                                    " AS DOUBLE)"
                                )
                            ),
                            _KM_DP,
                        ).alias(f"c{d}")
                        for d in range(1, _PQ_SUBD + 1)
                    ],
                    # occupancy rides the same re-center aggregate
                    # (optimization r14, the q306 device): the old
                    # plan duplicated the whole final-round assignment
                    # subtree per subspace just to count members, then
                    # joined it back - 4 duplicated argmin aggregates
                    # in one plan. Same integers, one subtree.
                    F.count("*").cast("long").alias("n_members"),
                )
                .select(
                    "code",
                    F.array(
                        *[f"c{d}" for d in range(1, _PQ_SUBD + 1)]
                    ).alias("c"),
                    "n_members",
                )
                # NO per-round localCheckpoint here, deliberately: the
                # q306 lineage cut was measured on THIS loop too and
                # made it SLOWER (5.3 s -> 6.6 s warm) - eager
                # checkpoints serialize the _PQ_M subspace branches
                # that the single lazy plan lets Spark schedule in
                # parallel. The q306 fix pays only on single-chain
                # loops.
            )
        outs.append(
            ctr.select(
                F.lit(m).cast("long").alias("subspace"),
                "code",
                F.posexplode("c").alias("pos", "centroid"),
                "n_members",
            )
            .select(
                "subspace",
                "code",
                (F.col("pos") + 1).cast("long").alias("dim"),
                "centroid",
                "n_members",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


# ---------------------------------------------------------------------------
# q360: grid-accelerated DBSCAN over the 2D-projected embeddings
# ---------------------------------------------------------------------------

#: DBSCAN parameters in integer micro-coordinates: eps = 0.025 on the
#: (dim0, dim1) projection, minPts = 5 (self included - standard
#: DBSCAN). Probed at sf0.01: 303/500 core points, 7 clusters.
_DBSCAN_EPS = 25_000
_DBSCAN_MINPTS = 5


@query(
    "q360_dbscan_grid",
    oracle=f"""
    WITH RECURSIVE p AS MATERIALIZED (
      SELECT vec_id,
             CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * 1000000) AS BIGINT)
               AS xi,
             CAST(FLOOR(CAST(embedding[2] AS DOUBLE) * 1000000) AS BIGINT)
               AS yi
      FROM embeddings
    ),
    c AS MATERIALIZED (
      SELECT vec_id, xi, yi,
             xi // {_DBSCAN_EPS} AS cx, yi // {_DBSCAN_EPS} AS cy
      FROM p
    ),
    cand AS MATERIALIZED (
      SELECT a.vec_id AS ia, b.vec_id AS ib
      FROM c a JOIN c b
        ON b.cx BETWEEN a.cx - 1 AND a.cx + 1
       AND b.cy BETWEEN a.cy - 1 AND a.cy + 1
      WHERE (a.xi - b.xi) * (a.xi - b.xi)
            + (a.yi - b.yi) * (a.yi - b.yi)
            <= CAST({_DBSCAN_EPS} AS BIGINT) * {_DBSCAN_EPS}
    ),
    deg AS MATERIALIZED (
      SELECT ia AS v, CAST(COUNT(*) AS BIGINT) AS n FROM cand GROUP BY ia
    ),
    core AS MATERIALIZED (
      SELECT v FROM deg WHERE n >= {_DBSCAN_MINPTS}
    ),
    e AS MATERIALIZED (
      SELECT cand.ia AS s, cand.ib AS d FROM cand
      JOIN core c1 ON c1.v = cand.ia
      JOIN core c2 ON c2.v = cand.ib
      WHERE cand.ia <> cand.ib
    ),
    reach AS (
      SELECT s, d FROM e
      UNION
      SELECT r.s, e.d FROM reach r JOIN e ON r.d = e.s
    ),
    lab AS MATERIALIZED (
      SELECT core.v,
             LEAST(core.v, COALESCE(m.mn, core.v)) AS cluster_id
      FROM core LEFT JOIN
           (SELECT s, MIN(d) AS mn FROM reach GROUP BY s) m
        ON m.s = core.v
    ),
    border AS MATERIALIZED (
      SELECT cand.ia AS v, MIN(lab.cluster_id) AS cluster_id
      FROM cand
      JOIN lab ON lab.v = cand.ib
      LEFT JOIN core nc ON nc.v = cand.ia
      WHERE nc.v IS NULL AND cand.ia <> cand.ib
      GROUP BY cand.ia
    ),
    clusters AS (
      SELECT l.cluster_id,
             CAST(COUNT(*) AS BIGINT) AS n_core,
             CAST(COALESCE(ANY_VALUE(b.nb), 0) AS BIGINT) AS n_border
      FROM lab l
      LEFT JOIN (SELECT cluster_id, COUNT(*) AS nb
                 FROM border GROUP BY cluster_id) b
        ON b.cluster_id = l.cluster_id
      GROUP BY l.cluster_id
    ),
    noise AS (
      SELECT CAST(-1 AS BIGINT) AS cluster_id,
             CAST(0 AS BIGINT) AS n_core,
             CAST(COUNT(*) AS BIGINT) AS n_border
      FROM p
      WHERE vec_id NOT IN (SELECT v FROM core)
        AND vec_id NOT IN (SELECT v FROM border)
    )
    SELECT cluster_id, n_core, n_border, n_core + n_border AS n_total
    FROM (SELECT * FROM clusters UNION ALL SELECT * FROM noise)
    """,
)
def q360_dbscan_grid(spark, sf_dir):
    """GRID-ACCELERATED DBSCAN (Ester et al. 1996) over the (dim0,
    dim1) projection of the embeddings: density clustering with
    eps = 25000 micro-units and minPts = 5 -
    the density-based companion to q306's k-means (finds non-convex
    clusters, labels sparse points NOISE instead of forcing them into
    a centroid). Output: per-cluster core/border counts plus a
    cluster_id = -1 noise row.

    The neighbor search is the GRID trick that makes DBSCAN a
    data-parallel plan: bucket points into eps-sized cells, join each
    point only to the 3x3 adjacent cells (banded non-equi join on two
    integer keys), then exact-filter by squared distance - the q173
    geo-grid device. Core points (>= minPts neighbors incl. self)
    form an edge graph; clusters are min-label connected components
    (the q78 loop: localCheckpoint lineage cuts, label-sum
    convergence); border points take the MIN cluster among their core
    neighbors (deterministic, where textbook DBSCAN is
    arrival-order-dependent); everything else is noise.

    Exactness: coordinates are micro-FLOORed float32-widened doubles
    (bit-identical cross-engine - the q334 adjudicated mechanism);
    distances and counts are pure bigint from there.

    Scale: cell join fan-in is bounded by 9 x occupancy (eps-density
    bound), never all-pairs; components iterate on the CORE edge
    list only. 100x data at the same density = 100x cells, same
    per-cell work; the oracle's transitive closure is replaced by the
    iterative loop whose state is |core| labels.

    RESOLUTION-SCALES-WITH-DENSITY contract (VERDICT r13 item 6): a
    FIXED eps over a densifying corpus grows TRUE neighbor counts -
    the algorithm's own output - quadratically, so no plan can keep
    it linear (SCALE_PROBE grid_neighbors measures exactly that:
    4096x pairs on 64x replicated-in-place data). A deploy that
    multiplies corpus density re-derives eps from density (cell area
    ~ 1/N keeps expected per-cell occupancy constant), the same way
    the LSH family grows sign bits with corpus size. SCALE_PROBE
    grid_neighbors_scaled states the contract executably - eps/sqrt(k)
    with interleaved densification - and measures ~linear pairs and
    time (r14: 2.3M pairs / 7.9x time on 64x data vs 172.6M / 11.3x
    fixed-eps)."""
    emb = t(spark, sf_dir, "embeddings")
    p = emb.select(
        "vec_id",
        F.floor(F.element_at("embedding", 1).cast("double") * 1_000_000)
        .cast("long")
        .alias("xi"),
        F.floor(F.element_at("embedding", 2).cast("double") * 1_000_000)
        .cast("long")
        .alias("yi"),
    )
    c = p.select(
        "vec_id",
        "xi",
        "yi",
        F.expr(f"xi DIV {_DBSCAN_EPS}").alias("cx"),
        F.expr(f"yi DIV {_DBSCAN_EPS}").alias("cy"),
    )
    offs = spark.range(1).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(dx).cast("long").alias("dx"),
                        F.lit(dy).cast("long").alias("dy"),
                    )
                    for dx in (-1, 0, 1)
                    for dy in (-1, 0, 1)
                ]
            )
        ).alias("o")
    ).select("o.dx", "o.dy")
    a = (
        c.crossJoin(F.broadcast(offs))
        .select(
            F.col("vec_id").alias("ia"),
            F.col("xi").alias("xa"),
            F.col("yi").alias("ya"),
            (F.col("cx") + F.col("dx")).alias("jx"),
            (F.col("cy") + F.col("dy")).alias("jy"),
        )
    )
    b = c.select(
        F.col("vec_id").alias("ib"),
        F.col("xi").alias("xb"),
        F.col("yi").alias("yb"),
        F.col("cx").alias("jx"),
        F.col("cy").alias("jy"),
    )
    cand = (
        a.join(b, ["jx", "jy"])
        .filter(
            (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb"))
            + (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb"))
            <= F.lit(_DBSCAN_EPS).cast("long") * _DBSCAN_EPS
        )
        .select("ia", "ib")
        .persist()
    )
    from .common import _TRANSIENT_PERSISTS

    _TRANSIENT_PERSISTS.append(cand)
    deg = cand.groupBy("ia").agg(F.count("*").alias("n"))
    core = deg.filter(F.col("n") >= _DBSCAN_MINPTS).select(
        F.col("ia").alias("v")
    )
    # localCheckpoint, deliberately NOT repartition(d).persist()
    # (r14 attempt): the cached InMemoryRelation would let each
    # round's join reuse hashpartitioning(d), but persist does not
    # cut the ANALYZED-plan lineage (the q416 class), so every round
    # re-planned the full cand subtree and measured 8.6 -> 11.3-13.9 s
    # solo. The checkpoint's unknown partitioning costs one edge
    # exchange per substep and still wins.
    e = (
        cand.filter(F.col("ia") != F.col("ib"))
        .join(core.select(F.col("v").alias("ia")), "ia", "left_semi")
        .join(core.select(F.col("v").alias("ib")), "ib", "left_semi")
        .select(F.col("ia").alias("s"), F.col("ib").alias("d"))
        .localCheckpoint(eager=True)
    )
    labels = core.select(F.col("v").alias("node"), F.col("v").alias("label"))

    def _min_jump(lbl):
        """One contraction substep in MESSAGE-UNION form (optimization
        r15, guide section 2.4): L'(v) = min(L(v), min over in-nbrs
        L(u), L(L(v))) computed as ONE groupBy over a union of
        self / edge / pointer-jump messages. The r14 shape (min step,
        then a jump LEFT-join against the post-min frame) self-joined
        a DERIVED frame, so each substep's plan embedded its own
        subtree twice and two chained substeps planned as 45
        Exchanges / 50 SortMergeJoins per round; here both joins read
        the substep's INPUT (an RDD scan after the checkpoint below),
        so the plan is linear: two small joins + one aggregate.
        The jump goes through the PRE-min label L(L(v)) instead of
        the post-min pointer - a weaker contraction per substep
        (measured +1 round at sf0.1: 7 vs 6) but every surviving
        round is ~0.6 s vs ~1.0 s and the fixpoint is unchanged (any
        monotone label-decreasing propagation over the symmetric core
        edge set has the unique fixpoint L(v) = min of v's component;
        the convergence check below stops exactly there)."""
        edge = e.join(lbl, e.d == lbl.node).select(
            F.col("s").alias("node"), "label"
        )
        jump = (
            lbl.select(
                F.col("node").alias("xn"), F.col("label").alias("xl")
            )
            .join(
                lbl.select(
                    F.col("node").alias("jn"), F.col("label").alias("jl")
                ),
                F.col("xl") == F.col("jn"),
            )
            .select(F.col("xn").alias("node"), F.col("jl").alias("label"))
        )
        return (
            lbl.select("node", "label")
            .union(edge)
            .union(jump)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )

    prev = None
    # labels only decrease, so label-sum stability IS convergence
    # (any label change strictly decreases the sum, and the substep
    # fixpoint - every node at its component min - is unique, so a
    # stable DOUBLE round is exactly the single-substep fixpoint).
    # Each materialized round chains TWO (min, jump) substeps
    # (optimization r14, guide section 1.2: the loop's cost at this
    # graph size is per-round exchanges + driver actions, so halving
    # the materialized rounds at constant substep count halves the
    # action/checkpoint overhead; measured 10 rounds/19 s -> 6
    # rounds/11.5 s cold at sf0.1; THREE substeps per round was tried
    # and lost - 12-join plans push optimizer time superlinear).
    # Cap is a safety net, never the stop condition.
    for _ in range(30):
        labels = (
            # lineage is cut between the two substeps as well as at
            # the round boundary (optimization r15, guide section
            # 1.2/7.2): chaining the substeps LAZILY doubled the plan
            # per self-join - the jump join embeds its probe subtree
            # in the broadcast build, so two chained substeps planned
            # as ONE tree carried 45 Exchanges / 50 SortMergeJoins /
            # 52 RDD scans per round (captured steady-state round
            # plan, sf0.1) and ~3 s of optimizer+stage bookkeeping
            # per round. The eager=False checkpoints keep it ONE
            # driver action per round (the agg below materializes
            # both substeps in one job chain) while each substep's
            # plan stays constant-size over RDD-scan inputs.
            _min_jump(_min_jump(labels).localCheckpoint(eager=False))
            .localCheckpoint(eager=False)
        )
        cur = labels.agg(F.sum("label")).first()[0]
        if cur == prev:
            break
        prev = cur
    lab = labels.select(
        F.col("node").alias("v"), F.col("label").alias("cluster_id")
    )
    border = (
        cand.filter(F.col("ia") != F.col("ib"))
        .join(core.select(F.col("v").alias("ia")), "ia", "left_anti")
        .join(lab.select(F.col("v").alias("ib"), "cluster_id"), "ib")
        .groupBy("ia")
        .agg(F.min("cluster_id").alias("cluster_id"))
    )
    clusters = (
        lab.groupBy("cluster_id")
        .agg(F.count("*").cast("long").alias("n_core"))
        .join(
            border.groupBy("cluster_id").agg(
                F.count("*").cast("long").alias("nb")
            ),
            "cluster_id",
            "left",
        )
        .select(
            "cluster_id",
            "n_core",
            F.coalesce("nb", F.lit(0)).cast("long").alias("n_border"),
        )
    )
    assigned = core.select("v").union(border.select(F.col("ia").alias("v")))
    noise = (
        p.join(assigned, p.vec_id == assigned.v, "left_anti")
        .agg(F.count("*").cast("long").alias("n_border"))
        .select(
            F.lit(-1).cast("long").alias("cluster_id"),
            F.lit(0).cast("long").alias("n_core"),
            "n_border",
        )
    )
    return clusters.unionByName(noise).select(
        "cluster_id",
        "n_core",
        "n_border",
        (F.col("n_core") + F.col("n_border")).alias("n_total"),
    )


# ---------------------------------------------------------------------------
# q362: k-center greedy coreset (farthest-first traversal)
# ---------------------------------------------------------------------------

_KC_K = 8

#: micro-quantized integer coordinates (the q334/q360 mechanism):
#: float32 -> double widening and one multiply are bit-identical
#: cross-engine, so the floored lattice point is too; every distance
#: after that is pure bigint.
_KC_QI_SQL = (
    "list_transform(embedding,"
    " v -> CAST(FLOOR(CAST(v AS DOUBLE) * 1000000) AS BIGINT))"
)
_KC_DIST_SQL = (
    "list_sum(list_transform(list_zip({a}, {b}),"
    " z -> (z[1] - z[2]) * (z[1] - z[2])))"
)


def _kcenter_oracle() -> str:
    """Bounded running-min formulation (VERDICT r12 item 3). The
    original unrolled CTEs re-joined ``pts`` on ``vec_id`` at every
    step just to recover ``qi``, and on a key-DUPLICATED corpus that
    self-join fans out multiplicatively per step - exponential in
    _KC_K, which is why the PK-dup census once recorded an OOM instead
    of a verdict for this row. Carrying ``qi`` inside each ``d{i}``
    removes the self-join entirely: every step is |pts| rows cross a
    1-row center CTE (the exact running-min-dist device the Spark plan
    uses), so total oracle work is O(k*N) on ANY input, duplicated
    keys included - and the dup-census row becomes a real
    verification (green: byte-identical duplicates have identical
    coordinates, so the farthest-first walk and radii are
    multiplicity-insensitive on both engines)."""
    head = f"""
    WITH pts AS MATERIALIZED (
      SELECT vec_id, {_KC_QI_SQL} AS qi FROM embeddings
    ),
    c1 AS MATERIALIZED (
      SELECT vec_id, qi FROM pts ORDER BY vec_id LIMIT 1
    ),
    d1 AS MATERIALIZED (
      SELECT p.vec_id, p.qi,
             {_KC_DIST_SQL.format(a="p.qi", b="c.qi")} AS md
      FROM pts p, c1 c
    )"""
    parts = [head]
    for i in range(2, _KC_K + 1):
        parts.append(
            f"""
    c{i} AS MATERIALIZED (
      SELECT vec_id, qi, md AS radius
      FROM d{i - 1} ORDER BY md DESC, vec_id LIMIT 1
    ),
    d{i} AS MATERIALIZED (
      SELECT d.vec_id, d.qi,
             LEAST(d.md, {_KC_DIST_SQL.format(a="d.qi", b="c.qi")}) AS md
      FROM d{i - 1} d, c{i} c
    )"""
        )
    finals = [
        "SELECT CAST(1 AS BIGINT) AS step,"
        " CAST(vec_id AS BIGINT) AS center_id,"
        " CAST(NULL AS BIGINT) AS radius_sq FROM c1"
    ]
    finals += [
        f"SELECT CAST({i} AS BIGINT) AS step,"
        f" CAST(vec_id AS BIGINT) AS center_id,"
        f" CAST(radius AS BIGINT) AS radius_sq FROM c{i}"
        for i in range(2, _KC_K + 1)
    ]
    return ",".join(parts) + "\n    " + "\n    UNION ALL ".join(finals)


@query("q362_kcenter_coreset", oracle=_kcenter_oracle())
def q362_kcenter_coreset(spark, sf_dir):
    """K-CENTER GREEDY CORESET (farthest-first traversal, Gonzalez
    1985 - the 2-approximation behind coreset data pruning a la
    Sener & Savarese): pick 8 embedding rows such that every
    point is close to some pick, by repeatedly taking the point
    FARTHEST from the current centers. Output: each center with the
    max-min squared distance at its selection - the COVERAGE RADIUS
    curve, which is both the pruning-quality certificate and the
    elbow diagnostic for choosing k.

    Exactness: coordinates are micro-floored float32-widened doubles
    (bit-identical cross-engine - q334/q360 mechanism); 64-dim squared
    distances are bigint zip_with/aggregate folds (~1e13 max, no
    overflow); argmax ties break on vec_id. Both engines walk the
    identical center sequence.

    Scale - the RUNNING-MIN-DIST device: the naive greedy recomputes
    |centers| x |points| distances per step; instead ONE per-point
    running min-distance column is maintained (persisted, updated by
    a map against the broadcast 1-row new-center frame), so each of
    the 8 steps is one vectorized map + one TakeOrdered(1) -
    total work O(k * N) distances, driver state O(1). This is the
    textbook distributed k-center; the oracle unrolls the same steps
    as MATERIALIZED CTEs."""
    emb = t(spark, sf_dir, "embeddings")
    qi_spark = (
        "transform(embedding,"
        " v -> CAST(FLOOR(CAST(v AS DOUBLE) * 1000000) AS BIGINT))"
    )
    pts = transient_persist(
        emb.select("vec_id", F.expr(qi_spark).alias("qi"))
    )

    def dist_lit(cq) -> str:
        # the new center is already ON THE DRIVER (TakeOrdered row),
        # so its 64 quantized coordinates enter the next round as
        # bigint LITERALS in an unrolled codegen sum (optimization
        # r14, guide section 4.1/2.4): the old round shape crossJoined
        # a broadcast 1-row center frame and folded an interpreted
        # zip_with/aggregate HOF per row - per-row array allocations
        # plus one broadcast-build job per step. Bigint addition is
        # exact and both folds are left-associative term chains, so
        # every distance is the identical integer.
        return " + ".join(
            f"(element_at(qi, {k}) - CAST({int(cq[k - 1])} AS BIGINT))"
            f" * (element_at(qi, {k}) - CAST({int(cq[k - 1])} AS BIGINT))"
            for k in range(1, DIM + 1)
        )

    first = pts.orderBy("vec_id").limit(1).first()
    if first is None:  # degenerate corpus: oracle's c1 CTE is empty too
        return degenerate_frame(
            spark, "step long, center_id long, radius_sq long"
        )
    if first["qi"] is None:
        # NULL embedding seed: the zip_with fold propagated NULL to
        # every md (so did the oracle); keep that path on the
        # all-NULL census where no literal coordinates exist.
        null_md = "CAST(NULL AS BIGINT)"
        d = pts.select("vec_id", "qi", F.expr(null_md).alias("md"))
    else:
        d = pts.select(
            "vec_id", "qi", F.expr(dist_lit(first["qi"])).alias("md")
        )
    out = [(1, int(first["vec_id"]), None)]
    from .common import _TRANSIENT_PERSISTS

    prev_cached = None
    for step in range(2, _KC_K + 1):
        d = d.persist()
        _TRANSIENT_PERSISTS.append(d)
        # ONE job per round: the TakeOrdered argmax row already
        # carries the new center's quantized coordinates, so the
        # next round's distance expression is pure literals (no
        # broadcast build, no second lookup job against d).
        far = d.orderBy(F.col("md").desc(), "vec_id").limit(1).first()
        # d is materialized now; the round BEFORE last is dead - at
        # scale the running-min chain must hold 2 cached copies, not
        # k (optimization r14, guide section 5).
        if prev_cached is not None:
            prev_cached.unpersist()
        prev_cached = d
        out.append((step, int(far["vec_id"]), int(far["md"])))
        step_dist = (
            F.expr(dist_lit(far["qi"]))
            if far["qi"] is not None
            else F.expr("CAST(NULL AS BIGINT)")
        )
        d = d.select(
            "vec_id",
            "qi",
            F.least(F.col("md"), step_dist).alias("md"),
        )
    return spark.createDataFrame(
        out, "step long, center_id long, radius_sq long"
    )


# ---------------------------------------------------------------------------
# q376: modularity of the ground-truth labels on the kNN graph
# ---------------------------------------------------------------------------


@query(
    "q376_label_modularity",
    oracle=_KNN_EDGES_SQL + f""",
    dedges AS (
      SELECT src, dst FROM ranked WHERE rk <= {KNN_K}
    ),
    und AS (
      SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
      FROM dedges
    ),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM und),
    lab AS (SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings),
    deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS d
      FROM (SELECT u AS node FROM und UNION ALL SELECT v FROM und)
      GROUP BY node
    ),
    dc AS (
      SELECT lab.label, CAST(COALESCE(SUM(deg.d), 0) AS BIGINT) AS d_c,
             CAST(COUNT(*) AS BIGINT) AS n_nodes
      FROM lab LEFT JOIN deg ON deg.node = lab.vec_id
      GROUP BY lab.label
    ),
    ec AS (
      SELECT la.label, CAST(COUNT(*) AS BIGINT) AS e_c
      FROM und
      JOIN lab la ON la.vec_id = und.u
      JOIN lab lb ON lb.vec_id = und.v AND lb.label = la.label
      GROUP BY la.label
    )
    SELECT dc.label, dc.n_nodes,
           CAST(COALESCE(ec.e_c, 0) AS BIGINT) AS e_within,
           dc.d_c AS degree_sum,
           ROUND(CAST(4 * m.m * COALESCE(ec.e_c, 0) - dc.d_c * dc.d_c
                      AS DOUBLE) / (4.0 * m.m * m.m), 6) AS q_contrib
    FROM dc LEFT JOIN ec ON ec.label = dc.label, m
    """,
)
def q376_label_modularity(spark, sf_dir):
    """NEWMAN MODULARITY of the ground-truth label partition on the
    q158 kNN graph: per label, Q_c = e_c/m - (d_c/2m)^2 over the
    symmetrized edge set - the standard "are these labels actually
    graph communities?" audit. Sum of q_contrib near 0 means the kNN
    structure ignores the labels (embedding space and labels
    disagree - a red flag for any label-propagation or
    cluster-dedup plan built on that graph); near its maximum means
    the graph does the labels' work.

    Exactness: m, e_c, d_c are exact bigints from the deduplicated
    undirected edge list; each Q_c is ONE division of the exact
    integer 4m*e_c - d_c^2 by 4m^2, rounded at 6dp.

    Scale: the kNN edges come from the LSH-bucketed build (q158 -
    candidates only); symmetrization is a distinct over <= 2|E| rows;
    degrees and within-label counts are two hash aggregates keyed by
    node/label with the |labels|-row frames joined at the end."""
    edges = q158_knn_graph(spark, sf_dir).select("src", "dst")
    und = transient_persist(
        edges.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        ).distinct()
    )
    m = und.agg(F.count("*").cast("long").alias("m"))
    lab = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("label").cast("long").alias("label")
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .union(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("d"))
    )
    dc = (
        lab.join(deg, lab.vec_id == deg.node, "left")
        .groupBy("label")
        .agg(
            F.coalesce(F.sum("d"), F.lit(0)).cast("long").alias("d_c"),
            F.count("*").cast("long").alias("n_nodes"),
        )
    )
    la = lab.select(F.col("vec_id").alias("u"), F.col("label").alias("la"))
    lb = lab.select(F.col("vec_id").alias("v"), F.col("label").alias("lb"))
    ec = (
        und.join(la, "u")
        .join(lb, "v")
        .filter(F.col("la") == F.col("lb"))
        .groupBy(F.col("la").alias("label"))
        .agg(F.count("*").cast("long").alias("e_c"))
    )
    return (
        dc.join(ec, "label", "left")
        .crossJoin(F.broadcast(m))
        .select(
            "label",
            "n_nodes",
            F.coalesce("e_c", F.lit(0)).cast("long").alias("e_within"),
            F.col("d_c").alias("degree_sum"),
            F.round(
                (
                    4 * F.col("m") * F.coalesce("e_c", F.lit(0))
                    - F.col("d_c") * F.col("d_c")
                ).cast("double")
                / F.nullif(4.0 * F.col("m") * F.col("m"), F.lit(0.0)),
                6,
            ).alias("q_contrib"),
        )
    )


# ---------------------------------------------------------------------------
# q382: Local Outlier Factor over the micro-lattice kNN structure
# ---------------------------------------------------------------------------

_LOF_K = 3
_LOF_TOPK = 10


@query(
    "q382_lof_outliers",
    oracle=f"""
    WITH pts AS MATERIALIZED (
      SELECT vec_id, {_KC_QI_SQL} AS qi,
             {_bucket_expr_sql("embedding")} AS bucket
      FROM embeddings
    ),
    cand AS MATERIALIZED ({_knn_cand_sql(payload="qi", src="pts")}),
    d AS MATERIALIZED (
      SELECT a.vec_id AS p, b.vec_id AS o,
             {_KC_DIST_SQL.format(a="a.qi", b="b.qi")} AS d2
      FROM pts a JOIN cand b
        ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
    ),
    knn AS MATERIALIZED (
      SELECT p, o, d2,
             ROW_NUMBER() OVER (PARTITION BY p ORDER BY d2, o) AS rk
      FROM d
    ),
    kd AS MATERIALIZED (
      SELECT p AS node, d2 AS kdist FROM knn WHERE rk = {_LOF_K}
    ),
    nb AS MATERIALIZED (
      SELECT p, o, d2 FROM knn WHERE rk <= {_LOF_K}
    ),
    sr AS MATERIALIZED (
      SELECT nb.p,
             CAST(SUM(GREATEST(kd.kdist, nb.d2)) AS BIGINT) AS sreach
      FROM nb JOIN kd ON kd.node = nb.o
      GROUP BY nb.p
    )
    SELECT sr.p AS vec_id, sr.sreach,
           ROUND(srn.s * CAST(sr.sreach AS DOUBLE) / {_LOF_K * _LOF_K}, 6)
             AS lof
    FROM sr
    JOIN (
      SELECT nb.p, SUM(1.0 / NULLIF(so.sreach, 0)) AS s
      FROM nb JOIN sr so ON so.p = nb.o
      GROUP BY nb.p
    ) srn ON srn.p = sr.p
    ORDER BY lof DESC, vec_id
    LIMIT {_LOF_TOPK}
    """,
)
def q382_lof_outliers(spark, sf_dir):
    """LOCAL OUTLIER FACTOR (Breunig et al. 2000, k = 3) over
    the embedding micro-lattice: density-RELATIVE outlier scoring -
    a point is anomalous if its neighborhood is sparse compared to
    its neighbors' neighborhoods, which catches the boundary cases
    q224's global z-score and q360's fixed-eps noise label both
    miss (a point can be globally ordinary but locally stranded).
    Top-10 by LOF, ties on vec_id. Uses the algebraic
    rearrangement LOF(p) = sreach(p)/k^2 * sum_o 1/sreach(o), which
    needs only per-node reachability SUMS, never materialized lrd
    ratios.

    Exactness: squared distances, k-distances, and reachability sums
    are pure bigint on the q360/q362 micro lattice; the single float
    stage is the 3-term sum of reciprocals + one multiply,
    rounded at 6dp (the q286 adjudicated class - a 1-ulp tie would
    need two LOF values within 1e-6 AND straddling the top-10 cut).

    Scale: candidate pairs come from the sign-LSH bucket EQUI-JOIN
    (the q158/q51 device - never all-pairs; kNN is "k nearest within
    bucket", the standard LSH-LOF approximation, identical on both
    engines because the bucket function is), and the CANDIDATE side
    of each bucket is capped at KNN_BUCKET_CAP members (lowest
    vec_ids - the q158/q43 hot-bucket discipline, VERDICT r13 item 2:
    the uncapped join was the one remaining super-linear curve,
    103.7x time on 64x data; SCALE_PROBE.json lof_bucket_pairs keeps
    that counterfactual curve honest while knn_capped_pairs is this
    query's actual shape). Every source still gets a neighborhood;
    LOF's kdist/reachability statistics are then defined over the
    capped candidate set, identically on both engines (cap drift
    quantified in tests/test_lof_bucket_cap.py + PERF.md; a provable
    NO-OP below KNN_BUCKET_CAP (64)-member buckets, i.e. at
    sf0.001/sf0.01). Downstream kNN / kdist / reachability algebra is
    per-node bounded (3 reach terms)."""
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
    wc = Window.partitionBy("bucket").orderBy("vec_id")
    cand = (
        pts.withColumn("_crk", F.row_number().over(wc))
        .filter(F.col("_crk") <= KNN_BUCKET_CAP)
        .drop("_crk")
    )
    a = pts.select(
        F.col("vec_id").alias("p"), F.col("qi").alias("qa"), "bucket"
    )
    b = cand.select(
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
    return (
        sr.join(srn, "p")
        .select(
            F.col("p").alias("vec_id"),
            "sreach",
            F.round(
                F.col("s") * F.col("sreach").cast("double") / (_LOF_K * _LOF_K),
                6,
            ).alias("lof"),
        )
        .orderBy(F.col("lof").desc(), "vec_id")
        .limit(_LOF_TOPK)
    )


# ---------------------------------------------------------------------------
# q386: simplified (squared-distance) silhouette of the label partition
# ---------------------------------------------------------------------------

#: shared cluster-moment CTE text on the micro lattice: per label,
#: count, coordinate-sum vector, and sum of squared norms. The
#: identity sum_j ||x - y_j||^2 = n_c*||x||^2 - 2*x.S_c + Q_c turns
#: every "mean distance to cluster" into CLUSTER-MOMENT arithmetic -
#: no point-pair relation exists anywhere.
_SIL_MOMENTS_SQL = f"""
    WITH pts AS MATERIALIZED (
      SELECT vec_id, CAST(label AS BIGINT) AS label,
             {_KC_QI_SQL} AS qi
      FROM embeddings
      -- cluster-quality indices are defined over LABELED points; an
      -- unlabeled vector belongs to no cluster (r13 partial-records
      -- census: the mom join dropped the NULL group on one engine
      -- while the other kept it as a phantom cluster)
      WHERE label IS NOT NULL
    ),
    dimsum AS MATERIALIZED (
      SELECT label, r.i AS i, CAST(SUM(qi[r.i]) AS BIGINT) AS sv
      FROM pts, range(1, {{dim}} + 1) r(i)
      GROUP BY label, r.i
    ),
    mom AS MATERIALIZED (
      SELECT m0.label, m0.n_c, sc.s_c, m0.q_c FROM (
        SELECT label,
               CAST(COUNT(*) AS BIGINT) AS n_c,
               CAST(SUM(list_sum(list_transform(qi, v -> v * v)))
                    AS BIGINT) AS q_c
        FROM pts GROUP BY label
      ) m0 JOIN (
        SELECT label, list(sv ORDER BY i) AS s_c
        FROM dimsum GROUP BY label
      ) sc ON sc.label = m0.label
    ),
    pq AS MATERIALIZED (
      SELECT vec_id, label, qi,
             CAST(list_sum(list_transform(qi, v -> v * v)) AS BIGINT)
               AS x2
      FROM pts
    ),
    md AS MATERIALIZED (
      SELECT pq.vec_id, pq.label AS own, mom.label AS c, mom.n_c,
             (CASE WHEN mom.label = pq.label THEN
               (CASE WHEN mom.n_c = 1 THEN NULL ELSE
                 (mom.n_c * pq.x2
                  - 2 * list_sum(list_transform(
                        list_zip(pq.qi, mom.s_c), z -> z[1] * z[2]))
                  + mom.q_c) // (mom.n_c - 1) END)
             ELSE
               (mom.n_c * pq.x2
                - 2 * list_sum(list_transform(
                      list_zip(pq.qi, mom.s_c), z -> z[1] * z[2]))
                + mom.q_c) // mom.n_c
             END) AS mean_d2
      FROM pq, mom
    )"""


@query(
    "q386_silhouette_sq",
    oracle=_SIL_MOMENTS_SQL.format(dim=64) + """,
    ab AS (
      SELECT vec_id, own,
             MAX(CASE WHEN c = own THEN mean_d2 END) AS a2,
             MIN(CASE WHEN c <> own THEN mean_d2 END) AS b2
      FROM md GROUP BY vec_id, own
    ),
    s AS (
      SELECT own AS label,
             CASE WHEN a2 IS NULL THEN 0
                  ELSE (1000 * (b2 - a2)) // GREATEST(a2, b2) END AS s_milli
      FROM ab
    )
    SELECT label, CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(SUM(s_milli) // COUNT(*) AS BIGINT) AS avg_silhouette_milli
    FROM s GROUP BY label
    """,
)
def q386_silhouette_sq(spark, sf_dir):
    """SIMPLIFIED SILHOUETTE (squared-distance variant) of the
    ground-truth labels on the embedding micro-lattice: per point,
    a = mean squared distance to its OWN cluster, b = the smallest
    mean squared distance to any OTHER cluster, s = (b-a)/max(a,b);
    reported as the per-label average in milli-units - the standard
    "are these clusters tight and separated?" score next to q376's
    graph-side modularity.

    THE MOMENT TRICK (why this scales): sum_j ||x-y_j||^2 =
    n_c*||x||^2 - 2*x.S_c + Q_c, so every mean-distance-to-cluster is
    arithmetic between a point and its cluster's (count, coordinate
    sum, squared-norm sum) MOMENTS - the all-pairs relation the
    textbook silhouette implies never exists; cost is
    O(N * k * dim), embarrassingly parallel, one aggregate + one
    broadcast join.

    Exactness: lattice coordinates, moments, dot products and the
    floor-divided means are pure bigint (max |dot| ~ 64 * 4e5 * 2e8 ~
    5e15 < 2^63); s_milli floors once; singleton clusters emit s = 0
    by convention (both engines alike)."""
    emb = t(spark, sf_dir, "embeddings")
    qi_spark = (
        "transform(embedding,"
        " v -> CAST(FLOOR(CAST(v AS DOUBLE) * 1000000) AS BIGINT))"
    )
    pts = transient_persist(
        emb.filter(F.col("label").isNotNull()).select(
            "vec_id",
            F.col("label").cast("long").alias("label"),
            F.expr(qi_spark).alias("qi"),
        )
    )
    x2 = "aggregate(transform(qi, v -> v * v), 0L, (a, v) -> a + v)"
    mom = pts.groupBy("label").agg(
        F.count("*").cast("long").alias("n_c"),
        F.array(
            *[
                F.sum(F.element_at("qi", i)).cast("long")
                for i in range(1, 65)
            ]
        ).alias("s_c"),
        F.sum(F.expr(x2)).cast("long").alias("q_c"),
    )
    pq = pts.select("vec_id", "label", "qi", F.expr(x2).alias("x2"))
    dot = (
        "aggregate(zip_with(qi, s_c, (p, q) -> p * q),"
        " 0L, (a, v) -> a + v)"
    )
    md = (
        pq.crossJoin(F.broadcast(mom.withColumnRenamed("label", "c")))
        .select(
            "vec_id",
            F.col("label").alias("own"),
            "c",
            F.when(
                F.col("c") == F.col("label"),
                F.when(F.col("n_c") == 1, F.lit(None)).otherwise(
                    F.expr(
                        f"(n_c * x2 - 2 * ({dot}) + q_c) DIV (n_c - 1)"
                    )
                ),
            )
            .otherwise(F.expr(f"(n_c * x2 - 2 * ({dot}) + q_c) DIV n_c"))
            .alias("mean_d2"),
        )
    )
    ab = md.groupBy("vec_id", "own").agg(
        F.max(F.when(F.col("c") == F.col("own"), F.col("mean_d2"))).alias(
            "a2"
        ),
        F.min(F.when(F.col("c") != F.col("own"), F.col("mean_d2"))).alias(
            "b2"
        ),
    )
    s = ab.select(
        F.col("own").alias("label"),
        F.when(F.col("a2").isNull(), F.lit(0))
        .otherwise(
            F.expr("(1000 * (b2 - a2)) DIV GREATEST(a2, b2)")
        )
        .cast("long")
        .alias("s_milli"),
    )
    return s.groupBy("label").agg(
        F.count("*").cast("long").alias("n_points"),
        F.expr("SUM(s_milli) DIV COUNT(*)")
        .cast("long")
        .alias("avg_silhouette_milli"),
    )


# ---------------------------------------------------------------------------
# q387: Calinski-Harabasz index of the label partition
# ---------------------------------------------------------------------------


@query(
    "q387_calinski_harabasz",
    oracle=_SIL_MOMENTS_SQL.format(dim=64) + """,
    tot AS (
      SELECT CAST(SUM(n_c) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(q_c) AS BIGINT) AS q_all
      FROM mom
    ),
    gsum AS (
      SELECT r.i AS i, CAST(SUM(s_c[r.i]) AS BIGINT) AS g
      FROM mom, range(1, 65) r(i) GROUP BY r.i
    ),
    parts AS (
      SELECT
        (SELECT CAST(SUM(list_sum(list_transform(
                   list_zip(s_c, s_c), z -> z[1] * z[2])) // n_c)
                AS BIGINT)
         FROM mom) AS ssc,
        (SELECT CAST(SUM(g * g) AS BIGINT) FROM gsum) AS g2
    )
    SELECT tot.n AS n_points, tot.k AS n_clusters,
           tot.q_all - parts.ssc AS w_ssq,
           parts.ssc - parts.g2 // tot.n AS b_ssq,
           ROUND(CAST(parts.ssc - parts.g2 // tot.n AS DOUBLE)
                 * (tot.n - tot.k)
                 / ((tot.q_all - parts.ssc) * (tot.k - 1)), 6) AS ch_index
    FROM tot, parts
    """,
)
def q387_calinski_harabasz(spark, sf_dir):
    """CALINSKI-HARABASZ INDEX (variance-ratio criterion) of the
    ground-truth labels: [B/(k-1)] / [W/(N-k)], where W is
    within-cluster and B between-cluster sum of squared deviations -
    the third clustering-quality lens next to q386's silhouette
    (per-point geometry) and q376's modularity (graph structure),
    and the one usually used to pick k. Computed ENTIRELY from the
    q386 cluster moments via the decompositions
    W = sum_c (Q_c - |S_c|^2/n_c) and B = sum_c |S_c|^2/n_c - |G|^2/N
    - again no point-pair relation and no centroid materialization.

    Exactness: Q, S, G are exact bigints; the two floor-divided
    scaled sums (|S_c|^2/n_c summed, |G|^2/N) introduce at most
    k (resp. 1) unit of floor error on quantities of order 1e16 -
    documented sub-ppb bias, identical on both engines because the
    division order is pinned; the final ratio rounds at 6dp.

    Scale: one groupBy(label) for moments, a 64-row dimension fold
    for the grand sum, constant-size arithmetic after. O(N*dim) total.
    """
    emb = t(spark, sf_dir, "embeddings")
    qi_spark = (
        "transform(embedding,"
        " v -> CAST(FLOOR(CAST(v AS DOUBLE) * 1000000) AS BIGINT))"
    )
    pts = emb.filter(F.col("label").isNotNull()).select(
        F.col("label").cast("long").alias("label"),
        F.expr(qi_spark).alias("qi"),
    )
    x2 = "aggregate(transform(qi, v -> v * v), 0L, (a, v) -> a + v)"
    mom = transient_persist(
        pts.groupBy("label").agg(
            F.count("*").cast("long").alias("n_c"),
            F.array(
                *[
                    F.sum(F.element_at("qi", i)).cast("long")
                    for i in range(1, 65)
                ]
            ).alias("s_c"),
            F.sum(F.expr(x2)).cast("long").alias("q_c"),
        )
    )
    s2 = (
        "aggregate(zip_with(s_c, s_c, (p, q) -> p * q),"
        " 0L, (a, v) -> a + v)"
    )
    tot = mom.agg(
        F.sum("n_c").cast("long").alias("n"),
        F.count("*").cast("long").alias("k"),
        F.sum("q_c").cast("long").alias("q_all"),
        F.sum(F.expr(f"({s2}) DIV n_c")).cast("long").alias("ssc"),
    )
    gsum = mom.select(
        F.array(
            *[
                F.sum(F.element_at("s_c", i)).cast("long")
                for i in range(1, 65)
            ]
        ).alias("g")
    ).select(
        F.expr(
            "aggregate(transform(g, v -> v * v), 0L, (a, v) -> a + v)"
        ).alias("g2")
    )
    return tot.crossJoin(F.broadcast(gsum)).select(
        F.col("n").alias("n_points"),
        F.col("k").alias("n_clusters"),
        (F.col("q_all") - F.col("ssc")).alias("w_ssq"),
        (F.col("ssc") - F.expr("g2 DIV n")).alias("b_ssq"),
        F.round(
            (F.col("ssc") - F.expr("g2 DIV n")).cast("double")
            * (F.col("n") - F.col("k"))
            / F.nullif(
                (
                    (F.col("q_all") - F.col("ssc")) * (F.col("k") - 1)
                ).cast("double"),
                F.lit(0.0),
            ),
            6,
        ).alias("ch_index"),
    )


# ---------------------------------------------------------------------------
# q388: Davies-Bouldin index (squared-distance variant) from moments
# ---------------------------------------------------------------------------


@query(
    "q388_davies_bouldin",
    oracle=_SIL_MOMENTS_SQL.format(dim=64) + """,
    cstat AS (
      SELECT label, n_c,
             list_transform(s_c, v -> v // n_c) AS cent,
             (n_c * q_c - list_sum(list_transform(
                 list_zip(s_c, s_c), z -> z[1] * z[2]))) // (n_c * n_c)
               AS s2
      FROM mom
    ),
    pair AS (
      SELECT a.label AS i, b.label AS j,
             (1000 * (a.s2 + b.s2))
               // list_sum(list_transform(
                    list_zip(a.cent, b.cent),
                    z -> (z[1] - z[2]) * (z[1] - z[2]))) AS r_milli
      FROM cstat a JOIN cstat b ON a.label <> b.label
    ),
    worst AS (
      SELECT i, CAST(MAX(r_milli) AS BIGINT) AS worst_r_milli
      FROM pair GROUP BY i
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(worst_r_milli) // COUNT(*) AS BIGINT) AS db_milli,
           CAST(MAX(worst_r_milli) AS BIGINT) AS max_pair_milli
    FROM worst
    """,
)
def q388_davies_bouldin(spark, sf_dir):
    """DAVIES-BOULDIN INDEX (squared-distance variant) of the label
    partition: DB = mean over clusters of max_j (s2_i + s2_j) /
    d2_ij, with s2 the mean squared scatter and d2 the squared
    centroid separation - low DB = tight, well-separated clusters.
    Completes the internal-validation trio (q386 silhouette: per-
    point; q387 CH: global variance ratio; DB: WORST-NEIGHBOR per
    cluster, the one that flags a single merged pair the other two
    average away).

    Exactness: scatter uses (n*Q - |S|^2) DIV n^2 (max |S|^2 term
    ~2.6e18, inside bigint); centroids are floor-micro coordinate
    vectors; every ratio is floor-milli - deterministic on both
    engines because every floor's operand order is pinned. The
    squared-distance variant (no sqrt) is documented: rankings match
    classic DB when scatter/separation scale together.

    Scale: everything after the one groupBy(label) runs on the k-row
    moment frame - the k^2 pair enumeration is |labels|^2, constant
    in corpus size (bounded-frame class)."""
    emb = t(spark, sf_dir, "embeddings")
    qi_spark = (
        "transform(embedding,"
        " v -> CAST(FLOOR(CAST(v AS DOUBLE) * 1000000) AS BIGINT))"
    )
    pts = emb.filter(F.col("label").isNotNull()).select(
        F.col("label").cast("long").alias("label"),
        F.expr(qi_spark).alias("qi"),
    )
    x2 = "aggregate(transform(qi, v -> v * v), 0L, (a, v) -> a + v)"
    mom = pts.groupBy("label").agg(
        F.count("*").cast("long").alias("n_c"),
        F.array(
            *[
                F.sum(F.element_at("qi", i)).cast("long")
                for i in range(1, 65)
            ]
        ).alias("s_c"),
        F.sum(F.expr(x2)).cast("long").alias("q_c"),
    )
    s2sum = (
        "aggregate(zip_with(s_c, s_c, (p, q) -> p * q),"
        " 0L, (a, v) -> a + v)"
    )
    cstat = transient_persist(
        mom.select(
            "label",
            F.expr("transform(s_c, v -> v DIV n_c)").alias("cent"),
            F.expr(f"(n_c * q_c - ({s2sum})) DIV (n_c * n_c)").alias("s2"),
        )
    )
    a = cstat.select(
        F.col("label").alias("i"),
        F.col("cent").alias("ca"),
        F.col("s2").alias("sa"),
    )
    b = cstat.select(
        F.col("label").alias("j"),
        F.col("cent").alias("cb"),
        F.col("s2").alias("sb"),
    )
    d2 = (
        "aggregate(zip_with(ca, cb, (p, q) -> (p - q) * (p - q)),"
        " 0L, (acc, v) -> acc + v)"
    )
    pair = a.join(F.broadcast(b), F.col("i") != F.col("j")).select(
        "i",
        F.expr(f"(1000 * (sa + sb)) DIV ({d2})").alias("r_milli"),
    )
    worst = pair.groupBy("i").agg(
        F.max("r_milli").cast("long").alias("worst_r_milli")
    )
    return worst.agg(
        F.count("*").cast("long").alias("n_clusters"),
        F.expr("SUM(worst_r_milli) DIV COUNT(*)")
        .cast("long")
        .alias("db_milli"),
        F.max("worst_r_milli").cast("long").alias("max_pair_milli"),
    )


# ---------------------------------------------------------------------------
# q389: external cluster validation - purity + NMI vs k-means assignment
# ---------------------------------------------------------------------------


@query(
    "q389_cluster_agreement",
    oracle=f"""
    WITH cells AS MATERIALIZED (
      SELECT CAST(e.label AS BIGINT) AS truth,
             CAST(FLOOR(CAST(e.embedding[1] AS DOUBLE) * 1000000)
                  AS BIGINT) // 200000 AS pred,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM embeddings e
      GROUP BY 1, 2
    ),
    nt AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cells),
    rowm AS (SELECT truth, CAST(SUM(c) AS BIGINT) AS rt FROM cells
             GROUP BY truth),
    colm AS (SELECT pred, CAST(SUM(c) AS BIGINT) AS ct FROM cells
             GROUP BY pred),
    pur AS (
      SELECT CAST(SUM(mx) AS BIGINT) AS hits FROM (
        SELECT pred, MAX(c) AS mx FROM cells GROUP BY pred
      )
    ),
    mi AS (
      SELECT CAST(SUM(cells.c * FLOOR(LN(CAST(cells.c AS DOUBLE) * nt.n
                     / (rowm.rt * colm.ct)) * 1000000)) AS BIGINT) AS mi_n
      FROM cells JOIN rowm USING (truth) JOIN colm USING (pred), nt
    ),
    hh AS (
      SELECT
        (SELECT CAST(SUM(rt * FLOOR(LN(CAST(nt.n AS DOUBLE) / rt)
                         * 1000000)) AS BIGINT) FROM rowm, nt) AS ht_n,
        (SELECT CAST(SUM(ct * FLOOR(LN(CAST(nt.n AS DOUBLE) / ct)
                         * 1000000)) AS BIGINT) FROM colm, nt) AS hp_n
    )
    SELECT nt.n AS n_points,
           CAST((SELECT COUNT(*) FROM colm) AS BIGINT) AS n_pred_bins,
           ROUND(CAST(pur.hits AS DOUBLE) / nt.n, 6) AS purity,
           ROUND(2.0 * mi.mi_n / (hh.ht_n + hh.hp_n), 6) AS nmi
    FROM nt, pur, mi, hh
    """,
)
def q389_cluster_agreement(spark, sf_dir):
    """EXTERNAL CLUSTER VALIDATION of a cheap 1-D quantizer against
    the ground-truth labels: the prediction is the dim-0 micro
    coordinate bucketed at 0.2 (a deliberately weak, deterministic
    "clustering" - the operator's value is the metric machinery, and
    a weak quantizer exercises the full contingency table where a
    perfect one would make NMI degenerate). Reports PURITY (majority-
    truth mass per predicted bin) and NMI = 2*I(T;P)/(H(T)+H(P)) -
    the pair every clustering paper tables.

    Exactness: the contingency cells, margins, and purity hits are
    exact bigints; each log term is micro-FLOORed from a ratio of
    exact integers (the q337/q375 adjudicated LN class, |cells| +
    |margins| evaluations) and weighted by integer counts, so the
    entropy/MI numerators are bigint sums; the two output ratios
    round once at 6dp.

    Scale: ONE groupBy over (truth, pred) - the |labels| x |bins|
    contingency aggregate - then margin folds and constant
    arithmetic. The corpus is scanned once."""
    emb = t(spark, sf_dir, "embeddings")
    cells = transient_persist(
        emb.groupBy(
            F.col("label").cast("long").alias("truth"),
            F.expr(
                "CAST(FLOOR(CAST(element_at(embedding, 1) AS DOUBLE)"
                " * 1000000) AS BIGINT) DIV 200000"
            ).alias("pred"),
        ).agg(F.count("*").cast("long").alias("c"))
    )
    nt = cells.agg(F.sum("c").cast("long").alias("n"))
    rowm = cells.groupBy("truth").agg(F.sum("c").cast("long").alias("rt"))
    colm = cells.groupBy("pred").agg(F.sum("c").cast("long").alias("ct"))
    pur = (
        cells.groupBy("pred")
        .agg(F.max("c").alias("mx"))
        .agg(F.sum("mx").cast("long").alias("hits"))
    )
    mi = (
        cells.join(rowm, "truth")
        .join(colm, "pred")
        .crossJoin(F.broadcast(nt))
        .agg(
            F.sum(
                F.col("c")
                * F.floor(
                    F.log(
                        F.col("c").cast("double")
                        * F.col("n")
                        / (F.col("rt") * F.col("ct"))
                    )
                    * 1_000_000
                ).cast("long")
            )
            .cast("long")
            .alias("mi_n")
        )
    )
    ht = rowm.crossJoin(F.broadcast(nt)).agg(
        F.sum(
            F.col("rt")
            * F.floor(
                F.log(F.col("n").cast("double") / F.col("rt")) * 1_000_000
            ).cast("long")
        )
        .cast("long")
        .alias("ht_n")
    )
    hp = colm.crossJoin(F.broadcast(nt)).agg(
        F.sum(
            F.col("ct")
            * F.floor(
                F.log(F.col("n").cast("double") / F.col("ct")) * 1_000_000
            ).cast("long")
        )
        .cast("long")
        .alias("hp_n")
    )
    nbins = colm.agg(F.count("*").cast("long").alias("n_pred_bins"))
    return (
        nt.crossJoin(F.broadcast(nbins))
        .crossJoin(F.broadcast(pur))
        .crossJoin(F.broadcast(mi))
        .crossJoin(F.broadcast(ht))
        .crossJoin(F.broadcast(hp))
        .select(
            F.col("n").alias("n_points"),
            "n_pred_bins",
            F.round(F.col("hits").cast("double") / F.col("n"), 6).alias(
                "purity"
            ),
            F.round(
                2.0 * F.col("mi_n")
                / F.nullif(
                    (F.col("ht_n") + F.col("hp_n")).cast("double"),
                    F.lit(0.0),
                ),
                6,
            ).alias("nmi"),
        )
    )
