"""Round-4 training-data pipeline additions: crawl-hygiene caps,
substring-level dedup, corpus mixture design, embedding hygiene, and
balanced shard assignment - the operators between "corpus is deduped"
(plans/dedup.py, plans/mlprep.py) and "tokens hit the trainer".

Capability parity note: the reference pipeline
(/root/reference/src/topcv_pipeline.py) is a web scraper feeding a
warehouse; these are the operations the same pipeline needs the moment
its corpus feeds model training at scale. Every plan keeps the suite's
rules: hash aggregates keyed on ids/hashes (never full text), bounded
broadcast sides, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from .common import degenerate_frame, global_rn, t, t_split, transient_persist
from .mlprep import _h60, _h60_sql, _h60_sql_ns
from .registry import query
from .textops import _SCORE_SQL, _TOKENS_SQL, _int_score, _tokens

# ---------------------------------------------------------------------------
# q204: per-source document cap (crawl politeness / anti-spam cap)
# ---------------------------------------------------------------------------

#: max documents kept per source - the per-host cap every crawl corpus
#: applies so one prolific domain cannot dominate the training mix.
SOURCE_CAP = 20


@query(
    "q204_source_caps",
    oracle=f"""
    WITH r AS (
      SELECT doc_id, source, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY n_chars DESC, doc_id
             ) AS rk
      FROM documents
    )
    SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
           CAST(rk AS BIGINT) AS rk
    FROM r WHERE rk <= {SOURCE_CAP}
    """,
)
def q204_source_caps(spark, sf_dir):
    """Per-source cap: keep the top SOURCE_CAP (20) documents per source
    (longest first, doc_id tie-break) - the per-domain cap web-scale
    corpora apply so no single host dominates (C4/RefinedWeb both cap
    per-domain contributions).

    Scale: a window PARTITIONED by source - one hash exchange on the
    source key, each domain ranked independently in parallel. Skewed
    hosts (one domain = billions of pages) are exactly why the rank
    runs per-partition-key and the filter drops rows before any
    downstream stage sees them; a pathological single-host skew would
    layer the q67 salting pattern on top (rank within salted slices,
    re-rank the <= salt*CAP survivors)."""
    docs = t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.desc("n_chars"), F.col("doc_id")
    )
    return (
        docs.select(
            "doc_id",
            "source",
            F.col("n_chars").cast("long").alias("n_chars"),
            F.row_number().over(w).cast("long").alias("rk"),
        )
        .filter(F.col("rk") <= SOURCE_CAP)
    )


# ---------------------------------------------------------------------------
# q205: duplicated substring spans (Lee et al. 2022 exact-substring dedup)
# ---------------------------------------------------------------------------

#: window width (tokens) and stride for the rolling substring scan.
SPAN_W = 8
SPAN_STRIDE = 4


@query(
    "q205_substring_dup_spans",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, i AS pos,
             {_h60_sql(f"array_to_string(list_slice({_TOKENS_SQL}, i, i + {SPAN_W - 1}), ' ')")}
               AS h
      FROM documents,
           LATERAL unnest(range(1,
             greatest(len({_TOKENS_SQL}) - {SPAN_W - 1}, 0) + 1,
             {SPAN_STRIDE})) AS r(i)
    ),
    dup AS (
      SELECT h, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
      FROM w GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
    )
    SELECT w.doc_id, CAST(w.pos AS BIGINT) AS span_start, dup.n_docs
    FROM w JOIN dup USING (h)
    """,
)
def q205_substring_dup_spans(spark, sf_dir):
    """Exact duplicated-substring spans: every SPAN_W (8)-token window
    (stride SPAN_STRIDE (4)) is hashed; windows whose hash occurs in >= 2
    distinct documents are flagged with how many documents share them.
    This is the deduplicate-training-data signal of Lee et al. 2022
    ("Deduplicating Training Data Makes Language Models Better") -
    exact substring matches that survive document-level dedup - with
    the suffix array replaced by the shuffle-friendly fixed-window
    rolling scan.

    Scale: the window explode is a map stage (~n_tokens/SPAN_STRIDE (4)
    rows per doc); only 60-bit hashes cross the shuffle, never text.
    The text is TOKENIZED ONCE per document (the token array rides the
    explode projection; an earlier draft re-split the text per window -
    O(len^2/stride) per doc, measured 8.2 s -> 4.5 s at sf0.1), and
    the hashed window frame is persisted because both the census and
    the join-back consume it. Two hash aggregates (per-hash
    distinct-doc count, then the hash-keyed join back) - the same
    two-exchange shape as q87's contamination audit. The
    duplicated-hash side shrinks to the dup vocabulary, so AQE
    typically broadcasts the join-back."""
    docs = t_split(spark, sf_dir, "documents")
    toks = _tokens()
    n = F.size(toks)
    starts = F.when(
        n >= SPAN_W,
        F.sequence(F.lit(1), n - (SPAN_W - 1), F.lit(SPAN_STRIDE)),
    ).otherwise(F.array().cast("array<int>"))
    wins = transient_persist(
        docs.select("doc_id", toks.alias("tk"), F.explode(starts).alias("pos"))
        .select(
            "doc_id",
            "pos",
            _h60(
                F.concat_ws(" ", F.slice(F.col("tk"), F.col("pos"), SPAN_W))
            ).alias("h"),
        )
    )
    dup = (
        wins.groupBy("h")
        .agg(F.countDistinct("doc_id").cast("long").alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
    )
    return wins.join(dup, "h").select(
        "doc_id", F.col("pos").cast("long").alias("span_start"), "n_docs"
    )


# ---------------------------------------------------------------------------
# q207: temperature-scaled corpus mixture weights
# ---------------------------------------------------------------------------

#: mixture temperature (T=2 = square-root sampling, the multilingual
#: rebalancing used by mBERT/XLM-R/mT5) and the per-epoch doc budget.
MIX_T = 2.0
MIX_BUDGET = 100_000


@query(
    "q207_temperature_mixture",
    oracle=f"""
    WITH g AS (
      SELECT lang, COUNT(*) AS n_docs,
             SUM(len({_TOKENS_SQL})) AS tok
      FROM documents GROUP BY lang
    ),
    tot AS (SELECT SUM(tok) AS corpus_tok FROM g),
    u AS (
      SELECT g.lang, g.n_docs, g.tok,
             pow(CAST(g.tok AS DOUBLE) / tot.corpus_tok,
                 1.0 / {MIX_T}) AS uw
      FROM g, tot
    ),
    z AS (SELECT SUM(uw) AS zsum FROM u)
    SELECT u.lang, CAST(u.n_docs AS BIGINT) AS n_docs,
           CAST(u.tok AS BIGINT) AS tok_total,
           ROUND(u.uw / z.zsum, 6) AS weight,
           CAST(ROUND(u.uw / z.zsum * {MIX_BUDGET}, 0) AS BIGINT)
             AS expected_docs
    FROM u, z
    """,
)
def q207_temperature_mixture(spark, sf_dir):
    """Temperature-scaled mixture weights per language: raw token share
    p_g is flattened to p_g^(1/T) and renormalized (T=MIX_T (2.0) = the
    square-root sampling mT5/XLM-R use to keep low-resource languages
    from vanishing), then converted to an expected document count at a
    MIX_BUDGET (100000)-doc epoch budget.

    Scale: one map-side-combinable aggregate to ~|languages| rows; the
    two normalization constants ride 1-row broadcast frames (bounded
    build sides - same adjudicated shape as q77's n_docs frame). The
    fact table is touched exactly once."""
    docs = t(spark, sf_dir, "documents")
    g = docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(_tokens())).alias("tok"),
    )
    tot = g.agg(F.sum("tok").alias("corpus_tok"))
    u = g.crossJoin(F.broadcast(tot)).withColumn(
        "uw",
        F.pow(
            F.col("tok").cast("double") / F.col("corpus_tok"),
            1.0 / MIX_T,
        ),
    )
    z = u.agg(F.sum("uw").alias("zsum"))
    w = F.col("uw") / F.col("zsum")
    return u.crossJoin(F.broadcast(z)).select(
        "lang",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("tok").cast("long").alias("tok_total"),
        F.round(w, 6).alias("weight"),
        F.round(w * MIX_BUDGET, 0).cast("long").alias("expected_docs"),
    )


# ---------------------------------------------------------------------------
# q208: per-dimension embedding statistics (feature-drift / scaler fit)
# ---------------------------------------------------------------------------


@query(
    "q208_dimwise_embedding_stats",
    oracle="""
    SELECT CAST(r.i - 1 AS BIGINT) AS dim,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(CAST(e.embedding[r.i] AS DOUBLE)), 5) AS mean,
           ROUND(stddev_pop(CAST(e.embedding[r.i] AS DOUBLE)), 5) AS sd,
           MIN(CAST(e.embedding[r.i] AS DOUBLE)) AS lo,
           MAX(CAST(e.embedding[r.i] AS DOUBLE)) AS hi
    FROM embeddings e, range(1, 65) r(i)
    GROUP BY r.i
    """,
)
def q208_dimwise_embedding_stats(spark, sf_dir):
    """Per-dimension mean/stddev/min/max across the embedding corpus -
    the statistics pass that fits a standard/robust scaler, checks for
    dead or exploding dimensions, and baselines embedding drift between
    model versions (q123's quantizer consumes the same lo/hi grid).

    Scale: posexplode to (dim, value) then ONE map-side-combinable
    aggregate over exactly DIM=64 keys - partial aggs shrink each task's
    output to 64 rows before the (tiny, perfectly-balanced) shuffle.
    Unrounded lo/hi are exact: float->double widening is value-preserving
    and identical in both engines; mean/sd round at 5 (accumulation
    order differs)."""
    emb = t(spark, sf_dir, "embeddings")
    return (
        emb.select(F.posexplode("embedding").alias("dim", "val"))
        .select(F.col("dim"), F.col("val").cast("double").alias("v"))
        .groupBy("dim")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.avg("v"), 5).alias("mean"),
            F.round(F.stddev_pop("v"), 5).alias("sd"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .select(
            F.col("dim").cast("long").alias("dim"),
            "n",
            "mean",
            "sd",
            "lo",
            "hi",
        )
    )


# ---------------------------------------------------------------------------
# q209: SemDeDup - semantic dedup within k-means clusters
# ---------------------------------------------------------------------------

#: cosine threshold for "semantically duplicate" within a cluster. The
#: synthetic embeddings are random unit vectors, so the threshold is
#: set where the corpus has non-empty output (max in-cluster cosine
#: ~0.49); a production run on model embeddings uses ~0.95+ - same
#: plan, different literal. Matches dedup.COSINE_NEARDUP_T.
SEMDEDUP_T = 0.4

#: the q99 assignment as oracle CTE text (label-mean centroids, argmax
#: cosine, c_label DESC tie-break - kept formula-identical with
#: vectors.kmeans_assign).
_ASSIGN_SQL = """
    cent AS (
      SELECT label AS c_label, r.i AS i,
             AVG(CAST(e.embedding[r.i] AS DOUBLE)) AS c
      FROM embeddings e, range(1, 65) r(i)
      GROUP BY 1, 2
    ),
    dots AS (
      SELECT e.vec_id, cent.c_label,
             SUM(CAST(e.embedding[cent.i] AS DOUBLE) * cent.c) AS dp
      FROM embeddings e, cent
      GROUP BY 1, 2
    ),
    rk AS (
      SELECT vec_id, c_label,
             ROW_NUMBER() OVER (
               PARTITION BY vec_id ORDER BY dp DESC, c_label DESC
             ) AS rn
      FROM dots
    ),
    asg AS (SELECT vec_id, c_label AS cluster FROM rk WHERE rn = 1)
"""


@query(
    "q209_semantic_cluster_dedup",
    oracle=f"""
    WITH {_ASSIGN_SQL},
    b AS (
      SELECT a.vec_id, a.cluster, e.embedding
      FROM asg a JOIN embeddings e USING (vec_id)
    ),
    p AS (
      SELECT x.vec_id AS vec_a, y.vec_id AS vec_b, x.cluster,
             list_sum(list_transform(range(1, 65),
               i -> CAST(x.embedding[i] AS DOUBLE) *
                    CAST(y.embedding[i] AS DOUBLE))) AS dp
      FROM b x JOIN b y
        ON x.cluster = y.cluster AND x.vec_id < y.vec_id
    )
    SELECT vec_b AS vec_id, CAST(cluster AS INTEGER) AS cluster,
           CAST(COUNT(*) AS BIGINT) AS n_better,
           ROUND(MAX(dp), 6) AS max_sim
    FROM p WHERE dp >= {SEMDEDUP_T}
    GROUP BY vec_b, cluster
    """,
)
def q209_semantic_cluster_dedup(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023): cluster the embedding space with
    k-means (the q99 assignment step), then inside each cluster mark
    every vector that has a LOWER-id neighbor above the cosine
    threshold as a semantic duplicate to drop - pairwise comparison
    happens only within a cluster, never across the corpus.

    Scale: this is exactly why SemDeDup clusters first - the all-pairs
    O(N^2) becomes sum over clusters of |c|^2, and the cluster count
    grows with the corpus to keep |c| bounded (the paper uses ~100k
    clusters for LAION). The plan is: broadcast k-means assign (map
    stage), one self-equi-join ON the cluster id, codegen dot products,
    and a per-victim aggregate; the only fact-sized shuffle is the
    cluster-keyed join."""
    from .vectors import _dot, kmeans_assign

    asg = kmeans_assign(spark, sf_dir).select(
        "vec_id", F.col("nearest_label").alias("cluster")
    )
    emb = t(spark, sf_dir, "embeddings")
    b = transient_persist(
        emb.join(asg, "vec_id").select("vec_id", "cluster", "embedding")
    )
    x = b.select(
        F.col("vec_id").alias("vec_a"),
        "cluster",
        F.col("embedding").alias("ea"),
    )
    y = b.select(
        F.col("vec_id").alias("vec_b"),
        "cluster",
        F.col("embedding").alias("eb"),
    )
    pairs = (
        x.join(y, ["cluster"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_b", "cluster", _dot("ea", "eb").alias("dp"))
        .filter(F.col("dp") >= SEMDEDUP_T)
    )
    return pairs.groupBy("vec_b", "cluster").agg(
        F.count("*").cast("long").alias("n_better"),
        F.round(F.max("dp"), 6).alias("max_sim"),
    ).select(
        F.col("vec_b").alias("vec_id"),
        F.col("cluster").cast("int").alias("cluster"),
        "n_better",
        "max_sim",
    )


# ---------------------------------------------------------------------------
# q210: tokenizer fertility by language
# ---------------------------------------------------------------------------

_BPE_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


@query(
    "q210_tokenizer_fertility",
    oracle=f"""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(regexp_extract_all(lower(text), '{_BPE_RE}')))
                AS BIGINT) AS bpe_tokens,
           CAST(SUM(len({_TOKENS_SQL})) AS BIGINT) AS ws_tokens,
           ROUND(CAST(SUM(len(regexp_extract_all(lower(text), '{_BPE_RE}')))
                      AS DOUBLE)
                 / SUM(len({_TOKENS_SQL})), 4) AS fertility,
           ROUND(100.0 * SUM(len(regexp_extract_all(lower(text), '{_BPE_RE}')))
                 / SUM(n_chars), 4) AS tokens_per_100_chars
    FROM documents GROUP BY lang
    """,
)
def q210_tokenizer_fertility(spark, sf_dir):
    """Tokenizer fertility per language: subword (BPE-ish regex,
    q69's pre-tokenizer) tokens per whitespace word and per 100
    characters. Fertility is the standard multilingual-tokenizer
    efficiency metric - languages the vocabulary serves badly burn more
    tokens per word, which distorts both cost and the effective
    mixture (and feeds back into q207's weights).

    Scale: pure map stage (two regexp_extract_all counts per row in
    codegen) into a ~|languages|-key map-side-combined aggregate - the
    cheapest possible shape; no Python, no wide shuffle."""
    docs = t(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))
    bpe = F.size(F.regexp_extract_all(low, F.lit(_BPE_RE), F.lit(0)))
    ws = F.size(_tokens())
    return docs.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(bpe).cast("long").alias("bpe_tokens"),
        F.sum(ws).cast("long").alias("ws_tokens"),
        F.round(
            F.sum(bpe).cast("double") / F.sum(ws), 4
        ).alias("fertility"),
        F.round(100.0 * F.sum(bpe) / F.sum("n_chars"), 4).alias(
            "tokens_per_100_chars"
        ),
    )


# ---------------------------------------------------------------------------
# q211: balanced token shards (snake/serpentine packing by global rank)
# ---------------------------------------------------------------------------

#: number of output shards for the training-shard writer.
N_SHARDS = 8


@query(
    "q211_balanced_token_shards",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, len({_TOKENS_SQL}) AS n_tok FROM documents
    ),
    r AS (
      SELECT doc_id, n_tok,
             ROW_NUMBER() OVER (ORDER BY n_tok DESC, doc_id) AS rn
      FROM d
    ),
    s AS (
      SELECT n_tok,
             CASE WHEN ((rn - 1) // {N_SHARDS}) % 2 = 0
                  THEN (rn - 1) % {N_SHARDS}
                  ELSE {N_SHARDS - 1} - ((rn - 1) % {N_SHARDS})
             END AS shard
      FROM r
    )
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS tok_total
    FROM s GROUP BY shard
    """,
)
def q211_balanced_token_shards(spark, sf_dir):
    """Balanced training-shard assignment: rank documents by token
    count (desc, doc_id tie-break) and deal them to N_SHARDS (8) shards
    in SNAKE order (0..7, 7..0, ...) - the classic serpentine greedy
    that bounds per-shard token imbalance by one document, so every
    data-parallel reader gets near-identical work.

    Scale: the global rank comes from :func:`plans.common.global_rn` -
    one range exchange + pure-JVM per-partition ordinals + broadcast
    offsets, NO single-partition window - then the shard id is a map
    expression and the report a N_SHARDS (8)-key aggregate. This is the
    distributed total-order machinery applied to the shard-writer use
    case; the same frame with a .write.partitionBy("shard") IS the
    shard writer."""
    docs = t(spark, sf_dir, "documents")
    d = docs.select("doc_id", F.size(_tokens()).alias("n_tok"))
    ranked, _total = global_rn(
        d, [F.desc("n_tok"), F.col("doc_id")], rn_col="_rn"
    )
    shard = F.expr(
        f"CASE WHEN ((_rn - 1) DIV {N_SHARDS}) % 2 = 0 "
        f"THEN (_rn - 1) % {N_SHARDS} "
        f"ELSE {N_SHARDS - 1} - ((_rn - 1) % {N_SHARDS}) END"
    )
    return (
        ranked.select(shard.cast("long").alias("shard"), "n_tok")
        .groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("tok_total"),
        )
    )


# ---------------------------------------------------------------------------
# q213: within-document duplicated n-gram character fraction (Gopher rule)
# ---------------------------------------------------------------------------


@query(
    "q213_dup_ngram_char_fraction",
    oracle=f"""
    WITH g AS (
      SELECT doc_id, s, COUNT(*) AS tf, len(s) AS chars
      FROM (
        SELECT doc_id,
               unnest(list_transform(
                 range(1, greatest(len({_TOKENS_SQL}) - 2, 0) + 1),
                 i -> array_to_string(
                        list_slice({_TOKENS_SQL}, i, i + 2), ' '))) AS s
        FROM documents)
      GROUP BY doc_id, s
    )
    SELECT doc_id,
           CAST(SUM(tf) AS BIGINT) AS n_ngrams,
           ROUND(CAST(SUM(CASE WHEN tf >= 2 THEN tf * chars ELSE 0 END)
                      AS DOUBLE)
                 / SUM(tf * chars), 4) AS dup_char_frac
    FROM g GROUP BY doc_id
    """,
)
def q213_dup_ngram_char_fraction(spark, sf_dir):
    """Gopher/MassiveText repetition rule at the n-gram level: per
    document, the fraction of 3-gram characters that belong to 3-grams
    occurring MORE THAN ONCE in that document. Complements q80 (unigram
    repetition) and q205 (cross-document spans): this is the intra-doc
    boilerplate/loop detector ("duplicated n-gram char fraction" in the
    Gopher filtering table).

    Scale: explode 3-grams once, two stacked aggregates both keyed on
    doc_id (per-(doc, gram) tf, then the doc rollup) - the q80 shape;
    the second agg reuses the first's hash partitioning, so one real
    shuffle, keyed on doc_id, never on raw text alone."""
    from .dedup import _shingles

    docs = t_split(spark, sf_dir, "documents")
    sh = docs.select("doc_id", F.explode(_shingles()).alias("s"))
    g = sh.groupBy("doc_id", "s").agg(
        F.count("*").alias("tf"), F.length(F.first("s")).alias("chars")
    )
    dup_chars = F.sum(
        F.when(F.col("tf") >= 2, F.col("tf") * F.col("chars")).otherwise(0)
    )
    all_chars = F.sum(F.col("tf") * F.col("chars"))
    return g.groupBy("doc_id").agg(
        F.sum("tf").cast("long").alias("n_ngrams"),
        F.round(dup_chars.cast("double") / all_chars, 4).alias(
            "dup_char_frac"
        ),
    )


# ---------------------------------------------------------------------------
# q214: corpus-percentile quality gate with per-source survival report
# ---------------------------------------------------------------------------

#: quality score = floor(1000 * distinct-token ratio): an integer, so
#: the exact percentile interpolates between integers - bit-identical
#: across engines (cf. registry.py's rounding notes).
_GATE_PCT = 0.75


@query(
    "q214_quality_percentile_gate",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, source,
             CAST({_SCORE_SQL} AS BIGINT) AS score
      FROM documents
    ),
    cut AS (
      SELECT quantile_cont(CAST(score AS DOUBLE), {_GATE_PCT}) AS cutoff
      FROM s
    )
    SELECT s.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN s.score > cut.cutoff THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           ROUND(CAST(SUM(CASE WHEN s.score > cut.cutoff THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 4) AS keep_rate
    FROM s, cut
    GROUP BY s.source
    """,
)
def q214_quality_percentile_gate(spark, sf_dir):
    """Corpus-relative quality gate: documents must beat the corpus's
    exact 75% quality percentile (quality = distinct-token
    ratio, integerized to milli-units so the percentile is engine-exact),
    reported as per-source survival rates - the "keep the best quartile,
    see which domains die" audit run before committing a filter
    threshold.

    Scale: the cutoff is ONE exact-percentile aggregate broadcast back
    (1-row build side, the adjudicated q165/q171 shape); scoring is a
    codegen map stage and the report a ~|sources|-key aggregate. The
    exact percentile itself is Spark's `percentile` aggregate -
    single-pass, mergeable partials."""
    docs = t(spark, sf_dir, "documents")
    s = docs.select("doc_id", "source", _int_score().alias("score"))
    cut = s.agg(
        F.percentile(F.col("score").cast("double"), _GATE_PCT).alias(
            "cutoff"
        )
    )
    kept = F.sum(
        F.when(F.col("score") > F.col("cutoff"), 1).otherwise(0)
    )
    return s.crossJoin(F.broadcast(cut)).groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        kept.cast("long").alias("n_kept"),
        F.round(kept.cast("double") / F.count("*"), 4).alias("keep_rate"),
    )


# ---------------------------------------------------------------------------
# q215: containment verification over LSH candidates (Broder containment)
# ---------------------------------------------------------------------------

from .dedup import _LSH_CANDS_SQL, _SHINGLES_SQL  # noqa: E402


@query(
    "q215_containment_verify",
    oracle=_LSH_CANDS_SQL
    + f""",
    sh2 AS (
      SELECT doc_id, list_distinct({_SHINGLES_SQL}) AS sset FROM documents
      WHERE doc_id IN (SELECT doc_a FROM cands UNION SELECT doc_b FROM cands)
    )
    SELECT c.doc_a, c.doc_b,
           ROUND(CAST(len(list_intersect(a.sset, b.sset)) AS DOUBLE)
                 / len(a.sset), 4) AS containment_a_in_b,
           ROUND(CAST(len(list_intersect(a.sset, b.sset)) AS DOUBLE)
                 / len(b.sset), 4) AS containment_b_in_a
    FROM cands c
    JOIN sh2 a ON c.doc_a = a.doc_id
    JOIN sh2 b ON c.doc_b = b.doc_id
    """,
)
def q215_containment_verify(spark, sf_dir):
    """Asymmetric CONTAINMENT |A n B| / |A| for q43's LSH candidate
    pairs, both directions per pair - Broder's containment coefficient,
    the signal that separates "B quotes most of A" (high c_ab, low
    c_ba) from symmetric near-duplication (both high). Jaccard (q46)
    misses subset-duplicates: a tweet embedded in an article has tiny
    Jaccard but containment ~1.

    Scale: identical shape to q46 - the pair list is LSH-bounded, the
    shingle sets ride two doc_id-keyed joins pruned by a semi-join, and
    the set expressions run once per surviving pair."""
    from .dedup import _shingles, q43_lsh_candidate_pairs

    cands = q43_lsh_candidate_pairs(spark, sf_dir)
    docs = t(spark, sf_dir, "documents")
    members = (
        cands.select(F.col("doc_a").alias("doc_id"))
        .union(cands.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sh = docs.join(members, "doc_id", "left_semi").select(
        "doc_id", F.array_distinct(_shingles()).alias("sset")
    )
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sset").alias("sa"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sset").alias("sb"))
    inter = F.size(F.array_intersect(F.col("sa"), F.col("sb")))
    return (
        cands.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(inter.cast("double") / F.size(F.col("sa")), 4).alias(
                "containment_a_in_b"
            ),
            F.round(inter.cast("double") / F.size(F.col("sb")), 4).alias(
                "containment_b_in_a"
            ),
        )
    )


# ---------------------------------------------------------------------------
# q216: language-ID confusion matrix (filter-quality evaluation)
# ---------------------------------------------------------------------------


from .registry import ORACLE as _ORACLE  # noqa: E402


@query(
    "q216_langid_confusion",
    # composes q32's registered oracle text (textops imports before
    # datapipe in plans/__init__, so the entry exists at import time).
    oracle=f"""
    WITH pred AS ({_ORACLE["q32_lang_id"]}),
    m AS (
      SELECT labeled_lang, detected_lang, COUNT(*) AS n
      FROM pred GROUP BY 1, 2
    )
    SELECT labeled_lang, detected_lang, CAST(n AS BIGINT) AS n,
           ROUND(CAST(n AS DOUBLE)
                 / SUM(n) OVER (PARTITION BY labeled_lang), 4) AS share
    FROM m
    """,
)
def q216_langid_confusion(spark, sf_dir):
    """Confusion matrix of the q32 language detector against the
    labeled ``lang`` column: (labeled, detected, count) plus the
    per-cell share of the labeled language's documents - the evaluation
    every classifier-based corpus filter needs before its output drives
    q207's mixture weights.

    Scale: q32's detector is a pure map stage; the matrix is a
    (|langs|^2)-key aggregate with map-side partials, and the
    per-labeled-language share reuses the same tiny frame (a window
    over a BOUNDED aggregate - |langs|^2 rows - the adjudicated
    q103-class exception)."""
    from .textops import q32_lang_id

    pred = q32_lang_id(spark, sf_dir)
    m = pred.groupBy("labeled_lang", "detected_lang").agg(
        F.count("*").alias("n")
    )
    w = Window.partitionBy("labeled_lang")
    return m.select(
        "labeled_lang",
        "detected_lang",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("n") / F.sum("n").over(w), 4).alias("share"),
    )


# ---------------------------------------------------------------------------
# q218: n-gram novelty score (memorization-risk / boilerplate inverse)
# ---------------------------------------------------------------------------

from .dedup import _H64_SQL  # noqa: E402


@query(
    "q218_ngram_novelty",
    oracle=f"""
    WITH sh AS (
      SELECT DISTINCT doc_id, {_H64_SQL.format(x="s")} AS h
      FROM (SELECT doc_id, unnest({_SHINGLES_SQL}) AS s FROM documents)
    ),
    freq AS (SELECT h, COUNT(*) AS n_docs FROM sh GROUP BY h)
    SELECT sh.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN freq.n_docs = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unique,
           ROUND(CAST(SUM(CASE WHEN freq.n_docs = 1 THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 4) AS novelty
    FROM sh JOIN freq USING (h)
    GROUP BY sh.doc_id
    """,
)
def q218_ngram_novelty(spark, sf_dir):
    """Per-document n-gram NOVELTY: the fraction of a document's
    distinct word-3-gram shingles that occur in NO other document.
    Low novelty = the text is assembled from corpus-common phrasing
    (boilerplate, templates, near-copies that survived doc-level
    dedup); high novelty = genuinely fresh text. The inverse signal of
    q87's contamination rate, applied corpus-wide - used to prioritize
    what to keep when a token budget forces corpus subsetting.

    Scale: one shingle explode (hashes only cross the shuffle), one
    vocabulary-bounded frequency aggregate with map-side partials, one
    hash equi-join back, one doc_id aggregate - the q87 shape without
    the split filter, linear end to end."""
    from .dedup import _h64, _shingles

    docs = t_split(spark, sf_dir, "documents")
    # persisted: the frequency aggregate AND the join-back both consume
    # it - without persist the dominant explode+md5 stage runs twice.
    sh = transient_persist(
        docs.select(
            "doc_id", F.explode(F.array_distinct(_shingles())).alias("s")
        ).select("doc_id", _h64(F.col("s")).alias("h"))
    )
    freq = sh.groupBy("h").agg(F.count("*").alias("n_docs"))
    uniq = F.sum(F.when(F.col("n_docs") == 1, 1).otherwise(0))
    return (
        sh.join(freq, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            uniq.cast("long").alias("n_unique"),
            F.round(uniq.cast("double") / F.count("*"), 4).alias("novelty"),
        )
    )


# ---------------------------------------------------------------------------
# q219: incremental LSH dedup (new batch probed against the standing index)
# ---------------------------------------------------------------------------

#: minimum signature-agreement fraction for a probe hit to count as a
#: duplicate of an indexed document.
_INC_AGREE_T = 0.5

from .dedup import LSH_BUCKET_CAP as _LSH_CAP  # noqa: E402
from .dedup import MINHASH_P as _MH_P  # noqa: E402
from .dedup import _MINHASH_PERM_SQL  # noqa: E402


@query(
    "q219_incremental_lsh_dedup",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, unnest({_SHINGLES_SQL}) AS s FROM documents
    ),
    hx AS (
      SELECT doc_id, {_H64_SQL.format(x="s")} % {_MH_P} AS x FROM sh
    ),
    k AS (
      SELECT doc_id, x, unnest(range(0, 8)) AS perm FROM hx
    ),
    sig AS (
      SELECT doc_id, perm, MIN({_MINHASH_PERM_SQL}) AS sig
      FROM k GROUP BY doc_id, perm
    ),
    banded AS (
      SELECT doc_id, perm // 2 AS band,
             md5(string_agg(CAST(sig AS VARCHAR), '_' ORDER BY perm))
               AS band_key
      FROM sig GROUP BY doc_id, perm // 2
    ),
    bsz AS (
      SELECT band, band_key, COUNT(*) AS bn
      FROM banded GROUP BY band, band_key
    ),
    cands AS (
      SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS old_id
      FROM banded n
      JOIN bsz ON bsz.band = n.band AND bsz.band_key = n.band_key
             AND bsz.bn <= {_LSH_CAP}
      JOIN banded o
        ON n.band = o.band AND n.band_key = o.band_key
      WHERE n.doc_id % 10 = 0 AND o.doc_id % 10 <> 0
    ),
    agree AS (
      SELECT c.new_id, c.old_id,
             SUM(CASE WHEN sn.sig = so.sig THEN 1 ELSE 0 END) / 8.0
               AS agree_frac
      FROM cands c
      JOIN sig sn ON sn.doc_id = c.new_id
      JOIN sig so ON so.doc_id = c.old_id AND sn.perm = so.perm
      GROUP BY c.new_id, c.old_id
      HAVING SUM(CASE WHEN sn.sig = so.sig THEN 1 ELSE 0 END) / 8.0
             >= {_INC_AGREE_T}
    ),
    best AS (
      SELECT new_id, old_id, agree_frac,
             ROW_NUMBER() OVER (
               PARTITION BY new_id
               ORDER BY agree_frac DESC, old_id
             ) AS rk
      FROM agree
    )
    SELECT d.doc_id,
           best.old_id IS NOT NULL AS is_dup,
           best.old_id AS match_id,
           ROUND(best.agree_frac, 4) AS match_agree
    FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 0) d
    LEFT JOIN best ON best.new_id = d.doc_id AND best.rk = 1
    """,
)
def q219_incremental_lsh_dedup(spark, sf_dir):
    """INCREMENTAL near-dup admission: a new crawl batch (doc_id % 10
    = 0, ~10%) is probed against the standing LSH index of the already
    -admitted corpus (the other 90%) - new documents band-join ONLY
    against the index, candidate hits are verified by MinHash signature
    agreement (>= 50%), and each new document reports
    whether it duplicates an indexed one and which. This is the shape a
    production corpus actually runs daily: the index is a materialized
    table maintained across batches, and admission cost scales with the
    BATCH, not the corpus (no new x new or old x old pairs are ever
    formed).

    Scale: signatures come from the session's persisted signature stage
    (K longs/doc); the probe is an equi-join on (band, band_key) whose
    left side is batch-sized; verification joins K-long arrays on the
    bounded candidate list; the best-match pick is a window PARTITIONED
    by new_id. One small shuffle end to end beyond the standing index
    scan."""
    from .dedup import MINHASH_K, cached_minhash_sigs, safe_band_keys

    sig = cached_minhash_sigs(spark, sf_dir)
    # hot-bucket guard shared with q43: over-cap buckets never enter
    # the probe join (see dedup.LSH_BUCKET_CAP).
    keys = safe_band_keys(spark, sf_dir)
    new_keys = keys.filter(F.col("doc_id") % 10 == 0)
    old_keys = keys.filter(F.col("doc_id") % 10 != 0)
    cands = (
        new_keys.alias("n")
        .join(
            old_keys.alias("o"),
            (F.col("n.band") == F.col("o.band"))
            & (F.col("n.band_key") == F.col("o.band_key")),
        )
        .select(
            F.col("n.doc_id").alias("new_id"),
            F.col("o.doc_id").alias("old_id"),
        )
        .distinct()
    )
    sn = sig.select(F.col("doc_id").alias("new_id"), F.col("sigs").alias("sig_n"))
    so = sig.select(F.col("doc_id").alias("old_id"), F.col("sigs").alias("sig_o"))
    agree = sum(
        F.when(F.col("sig_n")[k] == F.col("sig_o")[k], 1).otherwise(0)
        for k in range(MINHASH_K)
    ) / float(MINHASH_K)
    verified = (
        cands.join(sn, "new_id")
        .join(so, "old_id")
        .select("new_id", "old_id", agree.alias("agree_frac"))
        .filter(F.col("agree_frac") >= _INC_AGREE_T)
    )
    w = Window.partitionBy("new_id").orderBy(
        F.desc("agree_frac"), F.asc("old_id")
    )
    best = (
        verified.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .drop("rk")
    )
    batch = t(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 10 == 0
    ).select("doc_id")
    return batch.join(
        best, batch["doc_id"] == best["new_id"], "left"
    ).select(
        "doc_id",
        F.col("old_id").isNotNull().alias("is_dup"),
        F.col("old_id").alias("match_id"),
        F.round("agree_frac", 4).alias("match_agree"),
    )


# ---------------------------------------------------------------------------
# q220: corpus assembly under a document budget (quota allocation + pick)
# ---------------------------------------------------------------------------

#: total documents the assembled corpus may keep.
_ASSEMBLY_N = 100


@query(
    "q220_corpus_assembly",
    oracle=f"""
    WITH cells AS (
      SELECT source, lang, COUNT(*) AS cnt, sqrt(COUNT(*)) AS w
      FROM documents GROUP BY source, lang
    ),
    shares AS (
      -- share rounded to 6dp: both engines sum the sqrt weights in
      -- different orders (~1e-13 relative noise); rounding makes the
      -- floor/remainder branches below engine-identical.
      SELECT source, lang, cnt,
             ROUND(w * {_ASSEMBLY_N} / SUM(w) OVER (), 6) AS share
      FROM cells
    ),
    fl AS (
      SELECT source, lang, cnt, CAST(floor(share) AS BIGINT) AS base,
             share - floor(share) AS rem
      FROM shares
    ),
    ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (ORDER BY rem DESC, source, lang) AS rrk,
             {_ASSEMBLY_N} - SUM(base) OVER () AS leftover
      FROM fl
    ),
    quotas AS (
      SELECT source, lang, cnt,
             LEAST(base + CASE WHEN rrk <= leftover THEN 1 ELSE 0 END,
                   cnt) AS quota
      FROM ranked
    ),
    picks AS (
      SELECT d.doc_id, d.source, d.lang,
             ROW_NUMBER() OVER (
               PARTITION BY d.source, d.lang
               ORDER BY {_h60_sql("CAST(doc_id AS VARCHAR)")}, doc_id
             ) AS cell_rank
      FROM documents d
    )
    SELECT p.doc_id, p.source, p.lang, CAST(p.cell_rank AS BIGINT)
             AS cell_rank,
           CAST(q.quota AS BIGINT) AS cell_quota
    FROM picks p JOIN quotas q USING (source, lang)
    WHERE p.cell_rank <= q.quota
    """,
)
def q220_corpus_assembly(spark, sf_dir):
    """End-to-end corpus ASSEMBLY under a document budget: (source,
    lang) cells get sqrt-weighted target shares (the q207 temperature
    family at T=2), shares become exact integer quotas by
    largest-remainder apportionment (the q102 allocation pattern, so
    quotas sum to the budget when supply allows), quotas are capped at
    cell supply, and each cell's winners are picked by deterministic
    hash rank (the q82 reproducible-sample pattern). Output: the
    admitted documents with their cell rank and the cell's quota - the
    one operator a "give me an N-doc balanced corpus" request actually
    runs.

    Scale: the quota plan lives entirely on the BOUNDED cell aggregate
    (|sources| x |langs| rows - global windows over it are the
    adjudicated q103-class exception, broadcast back to the fact);
    the per-cell pick is a window PARTITIONED by cell. One fact
    shuffle (the cell hash) end to end."""
    docs = t(spark, sf_dir, "documents")
    cells = docs.groupBy("source", "lang").agg(
        F.count("*").alias("cnt")
    ).withColumn("w", F.sqrt(F.col("cnt")))
    wall = Window.partitionBy()
    # rounded to 6dp so the floor/remainder branches agree with the
    # oracle despite engine-order float summation (see oracle comment).
    shares = cells.withColumn(
        "share",
        F.round(F.col("w") * _ASSEMBLY_N / F.sum("w").over(wall), 6),
    )
    fl = shares.select(
        "source",
        "lang",
        "cnt",
        F.floor("share").cast("long").alias("base"),
        (F.col("share") - F.floor("share")).alias("rem"),
    )
    ranked = fl.withColumn(
        "rrk",
        F.row_number().over(
            Window.orderBy(F.desc("rem"), F.asc("source"), F.asc("lang"))
        ),
    ).withColumn("leftover", F.lit(_ASSEMBLY_N) - F.sum("base").over(wall))
    quotas = ranked.select(
        "source",
        "lang",
        F.least(
            F.col("base")
            + F.when(F.col("rrk") <= F.col("leftover"), 1).otherwise(0),
            F.col("cnt"),
        ).alias("quota"),
    )
    wcell = Window.partitionBy("source", "lang").orderBy(
        _h60(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    picks = docs.select(
        "doc_id",
        "source",
        "lang",
        F.row_number().over(wcell).cast("long").alias("cell_rank"),
    )
    return picks.join(F.broadcast(quotas), ["source", "lang"]).filter(
        F.col("cell_rank") <= F.col("quota")
    ).select(
        "doc_id",
        "source",
        "lang",
        "cell_rank",
        F.col("quota").cast("long").alias("cell_quota"),
    )


# ---------------------------------------------------------------------------
# q222: shared-prefix boilerplate detection (template/navigation text)
# ---------------------------------------------------------------------------

#: tokens in the leading prefix and the minimum number of documents
#: that must share it (within one source) to call it boilerplate.
_PREFIX_N = 2
_PREFIX_MIN_DOCS = 2


@query(
    "q222_boilerplate_prefixes",
    oracle=f"""
    WITH p AS (
      SELECT doc_id, source,
             {_h60_sql(f"array_to_string(list_slice({_TOKENS_SQL}, 1, {_PREFIX_N}), ' ')")}
               AS prefix_h
      FROM documents
      WHERE len({_TOKENS_SQL}) >= {_PREFIX_N}
    ),
    g AS (
      SELECT source, prefix_h, COUNT(*) AS n_sharing
      FROM p GROUP BY source, prefix_h
      HAVING COUNT(*) >= {_PREFIX_MIN_DOCS}
    )
    SELECT p.doc_id, p.source, p.prefix_h,
           CAST(g.n_sharing AS BIGINT) AS n_sharing
    FROM p JOIN g USING (source, prefix_h)
    """,
)
def q222_boilerplate_prefixes(spark, sf_dir):
    """Shared-prefix boilerplate audit: documents from the same source
    opening with an identical 2-token prefix (hashed) are
    template suspects - scraped navigation headers, legal banners, and
    feed intros all present exactly this signature, and C4-style
    cleaning strips them before tokenization. Flags every document in a
    prefix group of >= 2.

    Scale: prefix hashing is a pure map stage (a 2-token slice, never
    the whole text), the group census is a (source, prefix)-keyed
    aggregate with map-side partials, and the join back is on the same
    key - one shuffle, hash-only payloads."""
    docs = t(spark, sf_dir, "documents")
    toks = _tokens()
    p = docs.filter(F.size(toks) >= _PREFIX_N).select(
        "doc_id",
        "source",
        _h60(
            F.concat_ws(" ", *[toks[i] for i in range(_PREFIX_N)])
        ).alias("prefix_h"),
    )
    g = (
        p.groupBy("source", "prefix_h")
        .agg(F.count("*").alias("n_sharing"))
        .filter(F.col("n_sharing") >= _PREFIX_MIN_DOCS)
    )
    return p.join(g, ["source", "prefix_h"]).select(
        "doc_id",
        "source",
        "prefix_h",
        F.col("n_sharing").cast("long").alias("n_sharing"),
    )


# ---------------------------------------------------------------------------
# q226: DSIR-style importance weights (hashed-feature log-likelihood ratio)
# ---------------------------------------------------------------------------

#: hashed-feature space size and the target-domain predicate (English
#: documents stand in for "looks like the quality reference corpus").
_DSIR_B = 1024
_DSIR_TARGET_LANG = "en"


@query(
    "q226_dsir_importance",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang,
             {_h60_sql("term")} % {_DSIR_B} AS b
      FROM (SELECT doc_id, lang, unnest({_TOKENS_SQL}) AS term
            FROM documents)
    ),
    stats AS (
      SELECT b, COUNT(*) AS cr,
             SUM(CASE WHEN lang = '{_DSIR_TARGET_LANG}' THEN 1 ELSE 0 END)
               AS ct
      FROM tok GROUP BY b
    ),
    tot AS (
      SELECT b, cr, ct,
             SUM(cr) OVER () AS nr, SUM(ct) OVER () AS nt
      FROM stats
    ),
    llr AS (
      SELECT tok.doc_id,
             ln((tot.ct + 1.0) / (tot.nt + {_DSIR_B}))
             - ln((tot.cr + 1.0) / (tot.nr + {_DSIR_B})) AS r
      FROM tok JOIN tot USING (b)
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           ROUND(AVG(r), 4) AS avg_llr
    FROM llr GROUP BY doc_id
    """,
)
def q226_dsir_importance(spark, sf_dir):
    """DSIR-style importance weighting (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): score
    every document by the average hashed-unigram log-likelihood ratio
    between a TARGET distribution (here the 'en'
    subset standing in for the quality reference) and the RAW corpus,
    with add-one smoothing over 1024 hash buckets. High scores
    mean "this raw document looks like the target domain" - the
    resampling weight modern corpus curation actually uses upstream of
    every quality filter.

    Scale: one token explode (bucket ids only cross the shuffle), a
    1024-row feature-count aggregate with map-side partials whose
    corpus totals are windows over that BOUNDED frame, broadcast back
    onto the token stream, one doc aggregate. Linear, two shuffles,
    no text movement."""
    docs = t_split(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "lang", F.explode(_tokens()).alias("term")
    ).select(
        "doc_id",
        "lang",
        F.pmod(_h60(F.col("term")), F.lit(_DSIR_B)).alias("b"),
    )
    stats = tok.groupBy("b").agg(
        F.count("*").alias("cr"),
        F.sum(
            F.when(F.col("lang") == _DSIR_TARGET_LANG, 1).otherwise(0)
        ).alias("ct"),
    )
    wall = Window.partitionBy()
    tot = stats.select(
        "b",
        "cr",
        "ct",
        F.sum("cr").over(wall).alias("nr"),
        F.sum("ct").over(wall).alias("nt"),
    )
    r = F.log((F.col("ct") + 1.0) / (F.col("nt") + _DSIR_B)) - F.log(
        (F.col("cr") + 1.0) / (F.col("nr") + _DSIR_B)
    )
    return (
        tok.join(F.broadcast(tot), "b")
        .select("doc_id", r.alias("r"))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.round(F.avg("r"), 4).alias("avg_llr"),
        )
    )


# ---------------------------------------------------------------------------
# q227: BPE merge step (the tokenizer-training inner loop, distributed)
# ---------------------------------------------------------------------------

#: how many top adjacent pairs the merge-candidate report returns.
_BPE_TOP = 20


@query(
    "q227_bpe_merge_step",
    oracle=f"""
    WITH tok AS (SELECT {_TOKENS_SQL} AS tk FROM documents),
    pairs AS (
      SELECT tk[r.i] || ' ' || tk[r.i + 1] AS pair
      FROM tok, LATERAL unnest(range(1, len(tk))) r(i)
      WHERE len(tk) >= 2
    )
    SELECT pair, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM pairs GROUP BY pair
    ORDER BY cnt DESC, pair
    LIMIT {_BPE_TOP}
    """,
)
def q227_bpe_merge_step(spark, sf_dir):
    """ONE BPE merge step over the corpus: count every adjacent token
    pair and return the top 20 merge candidates - the inner
    loop of byte-pair-encoding tokenizer training, which at corpus
    scale is exactly this distributed job run per merge round. (Real
    BPE re-tokenizes between rounds; each round is this same
    count-and-argmax shape.)

    Scale: pair extraction is two shifted slices zipped in codegen (the
    q42 shingle trick at width 2), the census is a vocabulary^2-bounded
    aggregate with map-side partials - Zipf makes the head tiny - and
    the top-20 is TakeOrderedAndProject with a total
    tie-break."""
    docs = t_split(spark, sf_dir, "documents")
    toks = _tokens()
    n = F.size(toks) - 1
    z = F.arrays_zip(F.slice(toks, 1, n), F.slice(toks, 2, n))
    pair = F.transform(z, lambda g: F.concat_ws(" ", g["0"], g["1"]))
    pairs = docs.filter(F.size(toks) >= 2).select(
        F.explode(pair).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(_BPE_TOP)
    )


# ---------------------------------------------------------------------------
# q228: cross-lingual near-duplicates (translation contamination)
# ---------------------------------------------------------------------------


@query(
    "q228_crosslingual_neardup",
    oracle="""
    WITH b AS (
      SELECT vec_id, embedding,
             (CASE WHEN embedding[2] > 0 THEN 1 ELSE 0 END) +
             (CASE WHEN embedding[18] > 0 THEN 2 ELSE 0 END) +
             (CASE WHEN embedding[34] > 0 THEN 4 ELSE 0 END) +
             (CASE WHEN embedding[50] > 0 THEN 8 ELSE 0 END) AS bucket
      FROM embeddings
    ),
    p AS (
      SELECT x.vec_id AS doc_a, y.vec_id AS doc_b,
             list_sum(list_transform(range(1, 65),
               i -> CAST(x.embedding[i] AS DOUBLE) *
                    CAST(y.embedding[i] AS DOUBLE))) AS dp
      FROM b x JOIN b y
        ON x.bucket = y.bucket AND x.vec_id < y.vec_id
    )
    SELECT p.doc_a, p.doc_b, da.lang AS lang_a, db.lang AS lang_b,
           ROUND(p.dp, 6) AS cos_sim
    FROM p
    JOIN documents da ON p.doc_a = da.doc_id
    JOIN documents db ON p.doc_b = db.doc_id
    WHERE p.dp >= 0.4 AND da.lang <> db.lang
    """,
)
def q228_crosslingual_neardup(spark, sf_dir):
    """CROSS-LINGUAL near-duplicates: q47's embedding-cosine pairs
    restricted to documents in DIFFERENT languages - the
    translation-contamination detector. Text-hash dedup (q40-q46) is
    blind to translations by construction; only the embedding space
    sees that a French document is the same content as its English
    source, and multilingual training corpora dedup exactly this way
    so benchmark translations don't leak.

    Scale: reuses q47's sign-LSH bucket join (never all-pairs); the
    language attribution is two broadcast-friendly joins on doc_id
    against the slim (id, lang) projection. Same cost envelope as q47
    plus two dimension joins."""
    from .dedup import q47_embedding_neardup

    pairs = q47_embedding_neardup(spark, sf_dir)
    langs = t(spark, sf_dir, "documents").select("doc_id", "lang")
    la = langs.select(
        F.col("doc_id").alias("vec_a"), F.col("lang").alias("lang_a")
    )
    lb = langs.select(
        F.col("doc_id").alias("vec_b"), F.col("lang").alias("lang_b")
    )
    return (
        pairs.join(la, "vec_a")
        .join(lb, "vec_b")
        .filter(F.col("lang_a") != F.col("lang_b"))
        .select(
            F.col("vec_a").alias("doc_a"),
            F.col("vec_b").alias("doc_b"),
            "lang_a",
            "lang_b",
            "cos_sim",
        )
    )


# ---------------------------------------------------------------------------
# q229: per-source length-distribution divergence (corpus monitoring)
# ---------------------------------------------------------------------------

#: length-bucket width (chars) and cap: documents land in buckets
#: 0..9, the last absorbing everything >= 900 chars.
_KL_BUCKET_CHARS = 100
_KL_MAX_BUCKET = 9


@query(
    "q229_source_length_kl",
    oracle=f"""
    WITH g AS (
      SELECT source,
             LEAST(n_chars // {_KL_BUCKET_CHARS}, {_KL_MAX_BUCKET}) AS b,
             COUNT(*) AS cnt
      FROM documents GROUP BY source, b
    ),
    w AS (
      SELECT source, b, cnt,
             SUM(cnt) OVER (PARTITION BY source) AS ns,
             SUM(cnt) OVER (PARTITION BY b) AS cb,
             SUM(cnt) OVER () AS n
      FROM g
    )
    SELECT source, CAST(MAX(ns) AS BIGINT) AS n_docs,
           ROUND(SUM((cnt * 1.0 / ns)
                     * ln((cnt * 1.0 / ns) / (cb * 1.0 / n))), 4) AS kl
    FROM w GROUP BY source
    """,
)
def q229_source_length_kl(spark, sf_dir):
    """Per-source length-distribution DIVERGENCE: KL(source || corpus)
    over 10 document-length buckets - the corpus
    monitoring dial that catches a source whose scrape broke (suddenly
    all stubs) or that spams one template length, before those skews
    reach the training mix. KL needs no reference labels: the corpus
    itself is the baseline.

    Scale: ONE (source x bucket)-keyed aggregate (bounded by
    |sources| x 10) holds everything; the three
    marginals are windows over that bounded frame and the final rollup
    is per-source. The fact table is scanned once, shuffled once on
    the composite key."""
    docs = t(spark, sf_dir, "documents")
    b = F.least(
        F.floor(F.col("n_chars") / _KL_BUCKET_CHARS),
        F.lit(_KL_MAX_BUCKET),
    )
    g = docs.groupBy("source", b.alias("b")).agg(F.count("*").alias("cnt"))
    w = g.select(
        "source",
        "b",
        "cnt",
        F.sum("cnt").over(Window.partitionBy("source")).alias("ns"),
        F.sum("cnt").over(Window.partitionBy("b")).alias("cb"),
        F.sum("cnt").over(Window.partitionBy()).alias("n"),
    )
    term = (F.col("cnt") / F.col("ns")) * F.log(
        (F.col("cnt") / F.col("ns")) / (F.col("cb") / F.col("n"))
    )
    return w.groupBy("source").agg(
        F.max("ns").cast("long").alias("n_docs"),
        F.round(F.sum(term), 4).alias("kl"),
    )


# ---------------------------------------------------------------------------
# q230: greedy token-budget fill (priority-ordered corpus truncation)
# ---------------------------------------------------------------------------

#: token budget the assembled training slice may not exceed.
_FILL_BUDGET = 15_000


@query(
    "q230_token_budget_fill",
    oracle=f"""
    WITH s AS (
      SELECT doc_id,
             CAST({_SCORE_SQL} AS BIGINT) AS score,
             CAST(len({_TOKENS_SQL}) AS BIGINT) AS n_tokens
      FROM documents
      -- a textless partial record contributes no trainable tokens
      -- and has no quality score to rank by: excluded from the fill
      -- on both engines (r13 partial-records census)
      WHERE text IS NOT NULL
    ),
    c AS (
      SELECT doc_id, score, n_tokens,
             SUM(n_tokens) OVER (
               ORDER BY score DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum_tokens
      FROM s
    )
    SELECT doc_id, score, n_tokens,
           CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM c WHERE cum_tokens <= {_FILL_BUDGET}
    """,
)
def q230_token_budget_fill(spark, sf_dir):
    """Greedy TOKEN-BUDGET fill: rank the corpus by quality priority
    (distinct-token ratio, integerized to milli-units for an
    engine-exact order) and admit documents in rank order until the
    running token total would exceed 15000 - the "give me the
    best N-token training slice" operator that turns every upstream
    score (q84/q214/q226) into an actual corpus cut.

    Scale: the running total over the quality order comes from
    :func:`plans.common.global_cumsum` - ONE range exchange on the
    priority key, per-partition partials, broadcast offsets - never a
    single-partition window, so the plan holds when the corpus is
    billions of documents. The budget predicate is a map-stage filter
    on the distributed prefix sum."""
    docs = t(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    toks = _tokens()
    s = docs.select(
        "doc_id",
        _int_score().alias("score"),
        F.size(toks).cast("long").alias("n_tokens"),
    )
    from .common import global_cumsum

    c, _total, _sums = global_cumsum(
        s,
        [F.desc("score"), F.asc("doc_id")],
        sums=[("n_tokens", "cum_tokens")],
    )
    return c.filter(F.col("cum_tokens") <= _FILL_BUDGET).select(
        "doc_id", "score", "n_tokens", "cum_tokens"
    )


# ---------------------------------------------------------------------------
# q231: quality-score vs near-dup calibration (cross-signal audit)
# ---------------------------------------------------------------------------

from .dedup import _LSH_CANDS_SQL as _CANDS_SQL  # noqa: E402


@query(
    "q231_quality_dup_calibration",
    oracle=_CANDS_SQL
    + f"""
    , s AS (
      SELECT doc_id,
             CAST({_SCORE_SQL} AS BIGINT) AS score
      FROM documents
    ),
    d AS (
      SELECT doc_id FROM (
        SELECT doc_a AS doc_id FROM cands
        UNION SELECT doc_b AS doc_id FROM cands
      )
    ),
    t AS (
      SELECT s.doc_id, s.score,
             CASE WHEN d.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_dup,
             NTILE(10) OVER (ORDER BY s.score, s.doc_id) AS decile
      FROM s LEFT JOIN d ON s.doc_id = d.doc_id
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(is_dup) AS BIGINT) AS n_dup,
           ROUND(CAST(SUM(is_dup) AS DOUBLE) / COUNT(*), 4) AS dup_rate
    FROM t GROUP BY decile
    """,
)
def q231_quality_dup_calibration(spark, sf_dir):
    """CALIBRATION of the quality score against an independent ground
    signal: bucket the corpus into quality deciles and report each
    decile's near-duplicate rate (membership in any q43 LSH candidate
    pair). If the score is informative, duplication concentrates in
    the low deciles - the sanity check a filtering threshold should
    pass before it deletes terabytes. The same report shape serves any
    (score, outcome) pair.

    Scale: deciles come from :func:`plans.common.global_ntile` (range
    exchange + exact NTILE arithmetic, no single-partition window);
    the dup flag is an UNHINTED left join against the LSH pair
    membership list - that list grows linearly with corpus duplication
    (billions of ids at 100 TB on a dirty crawl), so AQE decides
    broadcast-vs-shuffle at runtime instead of a forced broadcast that
    would OOM at scale; the report is a 10-key aggregate."""
    from .common import global_ntile
    from .dedup import q43_lsh_candidate_pairs

    docs = t(spark, sf_dir, "documents")
    s = docs.select("doc_id", _int_score().alias("score"))
    pairs = q43_lsh_candidate_pairs(spark, sf_dir)
    members = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .union(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
        .withColumn("is_dup", F.lit(1))
    )
    flagged = s.join(members, "doc_id", "left").select(
        "doc_id",
        "score",
        F.coalesce("is_dup", F.lit(0)).alias("is_dup"),
    )
    binned = global_ntile(
        flagged, [F.asc("score"), F.asc("doc_id")], 10, "decile"
    )
    return binned.groupBy("decile").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("is_dup").cast("long").alias("n_dup"),
        F.round(F.sum("is_dup") / F.count("*"), 4).alias("dup_rate"),
    )


# ---------------------------------------------------------------------------
# q236: k-anonymity audit over quasi-identifiers (privacy governance)
# ---------------------------------------------------------------------------

#: minimum group size for a quasi-identifier combination to be
#: considered safe, and the length-bucket width that coarsens n_chars
#: into a quasi-identifier.
_K_ANON = 5
_K_LEN_BUCKET = 200


@query(
    "q236_k_anonymity",
    oracle=f"""
    WITH q AS (
      SELECT doc_id, source, lang,
             (n_chars // {_K_LEN_BUCKET}) * {_K_LEN_BUCKET} AS len_bucket
      FROM documents
    ),
    g AS (
      SELECT source, lang, len_bucket, COUNT(*) AS group_size
      FROM q GROUP BY source, lang, len_bucket
    )
    SELECT q.doc_id, q.source, q.lang,
           CAST(q.len_bucket AS BIGINT) AS len_bucket,
           CAST(g.group_size AS BIGINT) AS group_size
    FROM q JOIN g USING (source, lang, len_bucket)
    WHERE g.group_size < {_K_ANON}
    """,
)
def q236_k_anonymity(spark, sf_dir):
    """K-ANONYMITY audit: treat (source, lang, length-bucket) as the
    quasi-identifier tuple and flag every document whose combination
    is shared by fewer than k=5 documents - the rows a
    re-identification attack could single out, and the suppression /
    generalization work-list a privacy review acts on before release.
    Complements q81 (direct-identifier redaction) and q234 (erasure):
    PII scrubbing does not help when the METADATA combination itself
    is identifying.

    Scale: one aggregate on the quasi-identifier key (map-side
    partials), one join back on the same key - a single shuffle; the
    flagged side is by definition the SMALL groups, so the output is
    bounded by k x |rare combinations|. Generalization ladders (widen
    the bucket, drop a column) re-run the same plan with a coarser
    key."""
    docs = t(spark, sf_dir, "documents")
    q = docs.select(
        "doc_id",
        "source",
        "lang",
        (F.expr(f"n_chars DIV {_K_LEN_BUCKET}") * _K_LEN_BUCKET).alias(
            "len_bucket"
        ),
    )
    g = (
        q.groupBy("source", "lang", "len_bucket")
        .agg(F.count("*").alias("group_size"))
        .filter(F.col("group_size") < _K_ANON)
    )
    return q.join(g, ["source", "lang", "len_bucket"]).select(
        "doc_id",
        "source",
        "lang",
        F.col("len_bucket").cast("long").alias("len_bucket"),
        F.col("group_size").cast("long").alias("group_size"),
    )


# ---------------------------------------------------------------------------
# q241: corpus datasheet (one-row dataset card)
# ---------------------------------------------------------------------------

from .dedup import _LSH_CANDS_SQL as _CANDS_FOR_CARD  # noqa: E402


@query(
    "q241_corpus_datasheet",
    oracle=_CANDS_FOR_CARD
    + f"""
    , base AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
             CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
             ROUND(AVG(len({_TOKENS_SQL})), 2) AS mean_tokens,
             ROUND(1.0 - COUNT(DISTINCT md5(text)) * 1.0 / COUNT(*), 4)
               AS exact_dup_rate
      FROM documents
    ),
    nd AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS neardup_pairs,
             CAST(COUNT(DISTINCT doc_a) + COUNT(DISTINCT doc_b) AS BIGINT)
               AS neardup_doc_mentions
      FROM cands
    ),
    top AS (
      SELECT lang AS top_lang FROM documents
      GROUP BY lang ORDER BY COUNT(*) DESC, lang LIMIT 1
    )
    SELECT base.*, nd.neardup_pairs, top.top_lang
    FROM base, nd, top
    """,
)
def q241_corpus_datasheet(spark, sf_dir):
    """One-row corpus DATASHEET (the "dataset card" summary block):
    document/source/language counts, mean token length, exact-duplicate
    rate, LSH near-duplicate pair count, and the dominant language -
    the at-a-glance numbers every corpus release ships ("Datasheets
    for Datasets", Gebru et al.), produced by composing the suite's
    shared stages rather than bespoke scans.

    Scale: one pass over documents for the base aggregates (COUNT
    DISTINCT source/lang are tiny domains; the md5 distinct is the
    q40 digest), the near-dup count reads the SESSION-PERSISTED q43
    pair table (zero recompute when the suite has run it), and the
    top-language pick is a TakeOrdered over a |langs|-row aggregate.
    Everything collapses to 1-row frames crossed at the end - the
    bounded-broadcast shape."""
    from .dedup import q43_lsh_candidate_pairs

    docs = t(spark, sf_dir, "documents")
    base = docs.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.round(F.avg(F.size(_tokens())), 2).alias("mean_tokens"),
        F.round(
            1.0 - F.countDistinct(F.md5("text")) / F.count("*"), 4
        ).alias("exact_dup_rate"),
    )
    nd = q43_lsh_candidate_pairs(spark, sf_dir).agg(
        F.count("*").cast("long").alias("neardup_pairs")
    )
    top = (
        docs.groupBy("lang")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.asc("lang"))
        .limit(1)
        .select(F.col("lang").alias("top_lang"))
    )
    return base.crossJoin(F.broadcast(nd)).crossJoin(F.broadcast(top))


# ---------------------------------------------------------------------------
# q242: exact quantile normalization across sources (batch-effect fix)
# ---------------------------------------------------------------------------


@query(
    "q242_quantile_normalization",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, source,
             CAST({_SCORE_SQL} AS BIGINT) AS score
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, source, score,
             -- NULLS FIRST: a missing score sorts below every real
             -- score on BOTH engines (Spark windows/range exchange
             -- are asc_nulls_first; DuckDB defaults NULLS LAST) -
             -- r13 partial-records census
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY score NULLS FIRST, doc_id) AS r,
             COUNT(*) OVER (PARTITION BY source) AS ns
      FROM s
    ),
    corpus AS (
      SELECT score AS corpus_score,
             ROW_NUMBER() OVER (
               ORDER BY score NULLS FIRST, doc_id) AS g
      FROM s
    ),
    tot AS (SELECT COUNT(*) AS n FROM s)
    SELECT ranked.doc_id, ranked.source, ranked.score,
           corpus.corpus_score AS norm_score
    FROM ranked, tot
    JOIN corpus ON corpus.g = (ranked.r * tot.n + ranked.ns - 1) // ranked.ns
    """,
)
def q242_quantile_normalization(spark, sf_dir):
    """Exact QUANTILE NORMALIZATION of the quality score across
    sources (the batch-effect correction genomics normalizes arrays
    with, applied to per-domain score drift): each document's
    within-source rank is mapped to the corpus score at the same
    relative position - after which every source has an identical
    score distribution and one global threshold means the same thing
    everywhere. Integer index arithmetic (ceil via (r*N + ns-1) DIV
    ns) keeps both engines bit-identical.

    Scale: the within-source rank is a window PARTITIONED by source;
    the corpus order statistic comes from :func:`plans.common.
    global_rn` (range exchange + pure-JVM ordinals - never a
    single-partition window); the mapping is one equi-join on the
    computed corpus index. Two exchanges over the fact, both keyed."""
    from .common import global_rn

    docs = t(spark, sf_dir, "documents")
    s = docs.select("doc_id", "source", _int_score().alias("score"))
    ws = Window.partitionBy("source").orderBy("score", "doc_id")
    ranked = s.select(
        "doc_id",
        "source",
        "score",
        F.row_number().over(ws).alias("r"),
        F.count("*").over(Window.partitionBy("source")).alias("ns"),
    )
    corpus, n_total = global_rn(s, ["score", "doc_id"], rn_col="g")
    corpus = corpus.select(
        F.col("score").alias("corpus_score"), "g"
    )
    idx = F.expr(f"(r * {n_total} + ns - 1) DIV ns")
    return (
        ranked.withColumn("g", idx)
        .join(corpus, "g")
        .select("doc_id", "source", "score", F.col("corpus_score").alias("norm_score"))
    )


# ---------------------------------------------------------------------------
# q244: population stability index (PSI) per source, first vs second half
# ---------------------------------------------------------------------------

#: smoothing pseudo-count per bucket (add-one over the 10 length
#: buckets keeps empty cells finite in both engines).
_PSI_BUCKETS = 10


@query(
    "q244_psi_drift",
    oracle=f"""
    WITH h AS (
      SELECT source,
             LEAST(n_chars // {_KL_BUCKET_CHARS}, {_KL_MAX_BUCKET}) AS b,
             CASE WHEN doc_id % 2 = 0 THEN 'ref' ELSE 'cur' END AS half
      FROM documents
      -- the length histogram's domain is rows WITH a length; a NULL
      -- source remains a real 'unknown' stratum (r13 census)
      WHERE n_chars IS NOT NULL
    ),
    g AS (
      SELECT source, b, half, COUNT(*) AS cnt FROM h GROUP BY 1, 2, 3
    ),
    spine AS (
      SELECT DISTINCT source, r.b FROM g,
             LATERAL unnest(range(0, {_PSI_BUCKETS})) r(b)
    ),
    filled AS (
      SELECT spine.source, spine.b,
             COALESCE(r.cnt, 0) AS ref_cnt, COALESCE(c.cnt, 0) AS cur_cnt
      FROM spine
      -- IS NOT DISTINCT FROM: the NULL-source stratum's counts must
      -- attach to its spine rows, not be silently zero-filled
      LEFT JOIN g r ON r.source IS NOT DISTINCT FROM spine.source
                   AND r.b = spine.b AND r.half = 'ref'
      LEFT JOIN g c ON c.source IS NOT DISTINCT FROM spine.source
                   AND c.b = spine.b AND c.half = 'cur'
    ),
    -- per-source totals via a WINDOW, not a USING-join: the NULL
    -- source stratum is real and USING(source) would drop it (r13
    -- partial-records census: 17 of 18 strata survived)
    f2 AS (
      SELECT source, b, ref_cnt, cur_cnt,
             SUM(ref_cnt) OVER (PARTITION BY source) AS nr,
             SUM(cur_cnt) OVER (PARTITION BY source) AS nc
      FROM filled
    )
    SELECT f.source,
           CAST(f.nr AS BIGINT) AS n_ref, CAST(f.nc AS BIGINT) AS n_cur,
           ROUND(SUM(
             ((f.cur_cnt + 1.0) / (f.nc + {_PSI_BUCKETS})
              - (f.ref_cnt + 1.0) / (f.nr + {_PSI_BUCKETS}))
             * ln(((f.cur_cnt + 1.0) / (f.nc + {_PSI_BUCKETS}))
                  / ((f.ref_cnt + 1.0) / (f.nr + {_PSI_BUCKETS})))
           ), 4) AS psi
    FROM f2 f
    GROUP BY f.source, f.nr, f.nc
    """,
)
def q244_psi_drift(spark, sf_dir):
    """POPULATION STABILITY INDEX per source: the length distribution
    of each source's even-doc_id half ("reference snapshot") compared
    to its odd half ("current snapshot") over the q229 length buckets,
    with add-one smoothing so empty cells stay finite - PSI is the
    drift metric model-risk teams alarm on (>0.25 = investigate), and
    completes the drift toolkit next to KL (q229, distribution vs
    corpus) and KS (q200, two-sample exact).

    Scale: one (source, bucket, half) aggregate, a generated
    10-bucket spine per source (bounded explode) to
    zero-fill missing cells, per-source totals as a second tiny
    aggregate - the fact is scanned once."""
    docs = t(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull()
    )
    b = F.least(
        F.floor(F.col("n_chars") / _KL_BUCKET_CHARS),
        F.lit(_KL_MAX_BUCKET),
    )
    half = F.when(F.col("doc_id") % 2 == 0, "ref").otherwise("cur")
    g = docs.groupBy(
        "source", b.alias("b"), half.alias("half")
    ).agg(F.count("*").alias("cnt"))
    spine = (
        g.select("source")
        .distinct()
        .select(
            "source",
            F.explode(
                F.sequence(F.lit(0), F.lit(_PSI_BUCKETS - 1))
            ).alias("b0"),
        )
        .select("source", F.col("b0").cast("long").alias("b"))
    )
    r = g.filter(F.col("half") == "ref").select(
        "source", "b", F.col("cnt").alias("ref_cnt")
    )
    c = g.filter(F.col("half") == "cur").select(
        "source", "b", F.col("cnt").alias("cur_cnt")
    )
    # eqNullSafe on source: the NULL-source stratum's counts must
    # attach to its spine rows (mirrors the oracle's IS NOT DISTINCT
    # FROM; a bare equi-join zero-filled them on both engines)
    r = r.select(
        F.col("source").alias("_rs"), F.col("b").alias("_rb"), "ref_cnt"
    )
    c = c.select(
        F.col("source").alias("_cs"), F.col("b").alias("_cb"), "cur_cnt"
    )
    filled = (
        spine.join(
            r,
            spine["source"].eqNullSafe(F.col("_rs"))
            & (spine["b"] == F.col("_rb")),
            "left",
        )
        .join(
            c,
            spine["source"].eqNullSafe(F.col("_cs"))
            & (spine["b"] == F.col("_cb")),
            "left",
        )
        .select(
            "source",
            "b",
            F.coalesce("ref_cnt", F.lit(0)).alias("ref_cnt"),
            F.coalesce("cur_cnt", F.lit(0)).alias("cur_cnt"),
        )
    )
    wsrc = Window.partitionBy("source")
    f2 = filled.select(
        "source",
        "ref_cnt",
        "cur_cnt",
        F.sum("ref_cnt").over(wsrc).alias("nr"),
        F.sum("cur_cnt").over(wsrc).alias("nc"),
    )
    pr = (F.col("ref_cnt") + 1.0) / (F.col("nr") + _PSI_BUCKETS)
    pc = (F.col("cur_cnt") + 1.0) / (F.col("nc") + _PSI_BUCKETS)
    term = (pc - pr) * F.log(pc / pr)
    return f2.groupBy("source", "nr", "nc").agg(
        F.round(F.sum(term), 4).alias("psi")
    ).select(
        "source",
        F.col("nr").cast("long").alias("n_ref"),
        F.col("nc").cast("long").alias("n_cur"),
        "psi",
    )


# ---------------------------------------------------------------------------
# q252: consistent-hash shard assignment (resharding stability)
# ---------------------------------------------------------------------------

#: shard counts before/after the scale-out, and virtual nodes per
#: shard on the hash ring.
_CH_BEFORE = 4
_CH_AFTER = 5
_CH_VNODES = 16


def _ring_sql(n_shards: int) -> str:
    """Ring CTE: every (shard, vnode) hashed to a position."""
    return f"""
      SELECT s.i AS shard, {_h60_sql(
          "'shard#' || CAST(s.i AS VARCHAR) || '#' || CAST(v.j AS VARCHAR)"
      )} AS pos
      FROM range(0, {n_shards}) s(i), range(0, {_CH_VNODES}) v(j)
    """


@query(
    "q252_consistent_hash_shards",
    oracle=f"""
    WITH ring_a AS ({_ring_sql(_CH_BEFORE)}),
    ring_b AS ({_ring_sql(_CH_AFTER)}),
    d AS (
      SELECT doc_id, {_h60_sql("CAST(doc_id AS VARCHAR)")} AS h
      FROM documents
    ),
    assign_a AS (
      SELECT d.doc_id,
             (SELECT r.shard FROM ring_a r
              ORDER BY CASE WHEN r.pos >= d.h THEN r.pos - d.h
                            ELSE r.pos + 1152921504606846976 - d.h END,
                       r.shard
              LIMIT 1) AS shard_a
      FROM d
    ),
    assign_b AS (
      SELECT d.doc_id,
             (SELECT r.shard FROM ring_b r
              ORDER BY CASE WHEN r.pos >= d.h THEN r.pos - d.h
                            ELSE r.pos + 1152921504606846976 - d.h END,
                       r.shard
              LIMIT 1) AS shard_b
      FROM d
    )
    SELECT a.shard_a AS shard_before, b.shard_b AS shard_after,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           BOOL_OR(a.shard_a <> b.shard_b) AS moved
    FROM assign_a a JOIN assign_b b USING (doc_id)
    GROUP BY 1, 2
    """,
)
def q252_consistent_hash_shards(spark, sf_dir):
    """CONSISTENT-HASH shard assignment and its resharding stability:
    documents placed on a 16-vnode hash ring with
    4 shards and again with 5, reporting the
    (before, after) transition matrix - the property that makes
    consistent hashing the resharding strategy (only ~1/5
    of keys move when a shard joins, vs ~all keys under plain modulo;
    compare q79's mod-hash split, which is the right tool only when
    the shard count never changes).

    Scale: both rings fold to CONSTANT array/map literals (a
    per-element CASE-struct formulation defeated whole-stage codegen
    and cost ~5 s of interpreted evaluation at sf0.1); the clockwise
    successor of h is "smallest ring position >= h, else the ring
    minimum (wrap)" - one filter + array_min over a folded literal
    array and a literal-map lookup pos -> shard. One scan, zero
    shuffles before the final matrix aggregate."""
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", _h60(F.col("doc_id").cast("string")).alias("h")
    )

    def assign(n_shards: int, out: str):
        # equal clockwise distance <=> equal ring position, and the
        # oracle breaks distance ties by smaller shard - so dedup
        # duplicate positions driver-side keeping the smaller shard.
        by_pos: dict[int, int] = {}
        for s in range(n_shards):
            for v in range(_CH_VNODES):
                pos = int(
                    __import__("hashlib")
                    .md5(f"shard#{s}#{v}".encode())
                    .hexdigest()[:15],
                    16,
                )
                if pos not in by_pos or s < by_pos[pos]:
                    by_pos[pos] = s
        positions = sorted(by_pos)
        succ_pos = F.coalesce(
            F.array_min(F.filter(F.lit(positions), lambda p: p >= F.col("h"))),
            F.lit(positions[0]),
        )
        owner = F.map_from_arrays(
            F.lit(positions), F.lit([by_pos[p] for p in positions])
        )
        return F.element_at(owner, succ_pos).alias(out)

    assigned = docs.select(
        "doc_id",
        assign(_CH_BEFORE, "shard_before"),
        assign(_CH_AFTER, "shard_after"),
    )
    return assigned.groupBy("shard_before", "shard_after").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.max(
            F.col("shard_before") != F.col("shard_after")
        ).alias("moved"),
    )


# ---------------------------------------------------------------------------
# q253: exponential time-decay aggregate (recency-weighted features)
# ---------------------------------------------------------------------------

#: decay time constant tau: one day of event time.
_DECAY_TAU_US = 86_400_000_000


@query(
    "q253_time_decay_features",
    oracle=f"""
    WITH mx AS (SELECT MAX(epoch_us(ts)) AS t_ref FROM events)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value * exp(-CAST(mx.t_ref - epoch_us(ts) AS DOUBLE)
                                  / {_DECAY_TAU_US})), 4)
             AS decayed_value,
           ROUND(SUM(exp(-CAST(mx.t_ref - epoch_us(ts) AS DOUBLE)
                          / {_DECAY_TAU_US})), 4) AS decayed_count
    FROM events, mx
    GROUP BY user_id
    """,
)
def q253_time_decay_features(spark, sf_dir):
    """EXPONENTIALLY TIME-DECAYED aggregates per user: value and count
    weighted by exp(-age/tau) with tau = 1 day, anchored at the
    corpus max event time - the recency-weighted feature every
    ranking/recommendation feature store maintains ("recent activity
    matters more"), and the closed-form alternative to windowed
    recompute: tomorrow's value is today's times a constant decay plus
    the new events, so incremental maintenance is one multiply-add per
    partial aggregate.

    Scale: the anchor is a 1-row broadcast aggregate; the decay weight
    is a per-row codegen expression; the rollup is an ordinary
    per-user hash aggregate with map-side partials. One scan, one
    shuffle."""
    ev = t(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts_us").alias("t_ref"))
    w = F.exp(
        -(F.col("t_ref") - F.col("ts_us")).cast("double") / _DECAY_TAU_US
    )
    return (
        ev.crossJoin(F.broadcast(mx))
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum(F.col("value") * w), 4).alias("decayed_value"),
            F.round(F.sum(w), 4).alias("decayed_count"),
        )
    )


# ---------------------------------------------------------------------------
# q255: train/test near-duplicate leakage audit (split-crossing pairs)
# ---------------------------------------------------------------------------


@query(
    "q255_split_leakage",
    oracle=_CANDS_FOR_CARD
    + f"""
    , split AS (
      SELECT doc_id,
             CASE WHEN {_h60_sql("CAST(doc_id AS VARCHAR)")} % 100 < 80
                  THEN 'train'
                  WHEN {_h60_sql("CAST(doc_id AS VARCHAR)")} % 100 < 90
                  THEN 'validation' ELSE 'test' END AS part
      FROM documents
    )
    SELECT sa.part AS part_a, sb.part AS part_b,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           sa.part <> sb.part AS is_leak
    FROM cands c
    JOIN split sa ON c.doc_a = sa.doc_id
    JOIN split sb ON c.doc_b = sb.doc_id
    GROUP BY sa.part, sb.part
    """,
)
def q255_split_leakage(spark, sf_dir):
    """SPLIT-LEAKAGE audit at the NEAR-DUPLICATE level: every LSH
    candidate pair (q43) classified by which q79 splits its two
    documents landed in - a train/test pair is an eval leak even when
    no exact n-gram overlap (q87) exists, because the near-duplicate
    carries the answer. The cross-split cells of this matrix are the
    pairs a leakage-safe split must re-seat (assign whole q78 clusters
    to one split, never documents).

    Scale: the pair list is the session-persisted q43 stage; split
    labels are a pure hash map-stage; two broadcast-friendly id joins
    and a 9-cell aggregate."""
    from .dedup import q43_lsh_candidate_pairs

    pairs = q43_lsh_candidate_pairs(spark, sf_dir)
    bucket = F.pmod(_h60(F.col("doc_id").cast("string")), F.lit(100))
    split = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(bucket < 80, "train")
        .when(bucket < 90, "validation")
        .otherwise("test")
        .alias("part"),
    )
    sa = split.select(
        F.col("doc_id").alias("doc_a"), F.col("part").alias("part_a")
    )
    sb = split.select(
        F.col("doc_id").alias("doc_b"), F.col("part").alias("part_b")
    )
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .groupBy("part_a", "part_b")
        .agg(F.count("*").cast("long").alias("n_pairs"))
        .select(
            "part_a",
            "part_b",
            "n_pairs",
            (F.col("part_a") != F.col("part_b")).alias("is_leak"),
        )
    )


# ---------------------------------------------------------------------------
# q256: mergeable HLL sketches (per-shard sketch -> lossless union)
# ---------------------------------------------------------------------------


@query(
    "q256_hll_sketch_union",
    oracle="""
    SELECT event_type AS scope,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS ndv_exact,
           TRUE AS sketch_within_10pct
    FROM events GROUP BY event_type
    UNION ALL
    SELECT 'ALL' AS scope,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS ndv_exact,
           TRUE AS sketch_within_10pct
    FROM events
    """,
)
def q256_hll_sketch_union(spark, sf_dir):
    """MERGEABLE distinct-count sketches: per-source HLL sketches of
    the user population (``hll_sketch_agg``), unioned losslessly into
    a corpus-wide estimate (``hll_union_agg``) - the two-level
    aggregation every federated/incremental NDV pipeline runs: shards
    sketch locally, only kilobyte sketches travel, the union is exact
    over sketches (same lgK), and yesterday's sketch plus today's is
    this same union. The q74 approx-NDV row reported one sketch per
    group; this is the MERGE half that makes sketches a scale
    primitive rather than a point estimate.

    Output: per-source rows plus one 'ALL' row whose estimate comes
    from the union of the per-source sketches - NOT from re-scanning
    the facts. The sketch binaries are engine-specific, so the oracle
    bridge (cf. q74) emits the EXACT distinct count alongside a
    tolerance verdict derived from the sketch estimate: the sketch
    and the union stay in the value-checked path while the engines
    only have to agree on exact counts and a generous boolean. The
    exact twin exists only for the bridge; the stronger merge law
    (union == direct whole-corpus sketch) stays pytest-pinned in
    tests/test_new_ops_invariants.py."""
    ev = t(spark, sf_dir, "events")
    # per-"source" shard: partition the stream by event_type
    per = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count_distinct("user_id").alias("ndv_exact"),
    )
    ok = (
        F.abs(F.hll_sketch_estimate(F.col("sk")) - F.col("ndv_exact"))
        <= 0.1 * F.col("ndv_exact")
    )
    per_est = per.select(
        F.col("event_type").alias("scope"),
        F.col("ndv_exact").cast("long").alias("ndv_exact"),
        ok.alias("sketch_within_10pct"),
    )
    union_est = (
        per.agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("_est"),
        )
        .crossJoin(
            F.broadcast(
                ev.agg(
                    F.count_distinct("user_id").alias("ndv_exact")
                )
            )
        )
        .select(
            F.lit("ALL").alias("scope"),
            F.col("ndv_exact").cast("long").alias("ndv_exact"),
            (
                F.abs(F.col("_est") - F.col("ndv_exact"))
                <= 0.1 * F.col("ndv_exact")
            ).alias("sketch_within_10pct"),
        )
    )
    return per_est.unionByName(union_est)


# ---------------------------------------------------------------------------
# q263: seed-document expansion (bounded-hop near-dup graph traversal)
# ---------------------------------------------------------------------------

#: the seed set (the "leaked documents" under investigation) and the
#: traversal depth over the near-dup candidate graph.
_SEED_MAX_ID = 10
_EXPAND_HOPS = 2


@query(
    "q263_seed_expansion",
    oracle=_CANDS_FOR_CARD
    + f"""
    , edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM cands
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM cands
    ),
    h0 AS (
      SELECT doc_id, 0 AS hop FROM documents
      WHERE doc_id < {_SEED_MAX_ID}
    ),
    h1 AS (
      SELECT e.dst AS doc_id, 1 AS hop
      FROM h0 JOIN edges e ON e.src = h0.doc_id
      WHERE e.dst NOT IN (SELECT doc_id FROM h0)
    ),
    h2 AS (
      SELECT e.dst AS doc_id, 2 AS hop
      FROM h1 JOIN edges e ON e.src = h1.doc_id
      WHERE e.dst NOT IN (SELECT doc_id FROM h0)
        AND e.dst NOT IN (SELECT doc_id FROM h1)
    ),
    reach AS (
      SELECT doc_id, MIN(hop) AS hop FROM (
        SELECT * FROM h0 UNION ALL SELECT * FROM h1
        UNION ALL SELECT * FROM h2
      ) GROUP BY doc_id
    )
    SELECT doc_id, CAST(hop AS BIGINT) AS hop FROM reach
    """,
)
def q263_seed_expansion(spark, sf_dir):
    """SEED EXPANSION over the near-dup graph: starting from a seed
    set (doc_id < 10, standing in for "this document was
    found in an eval set / takedown request"), walk the q43 candidate
    graph 2 hops and return every reached document with
    its minimum hop distance - the incident-response query ("find all
    copies and near-copies of THESE") that a full q78 connected-
    components run over-answers at far higher cost.

    Scale: each hop is one equi-join of the CURRENT frontier (small by
    construction) against the session-persisted edge list, with an
    anti-join to drop already-visited ids - frontier-bounded work per
    hop, the textbook bounded-BFS shape. Fixed hop count means fixed
    plan depth: no driver-side fixed-point loop needed (q78 owns the
    unbounded-closure case)."""
    from .dedup import q43_lsh_candidate_pairs

    pairs = q43_lsh_candidate_pairs(spark, sf_dir)
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        pairs.select(
            F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
        )
    )
    docs = t(spark, sf_dir, "documents")
    frontier = docs.filter(F.col("doc_id") < _SEED_MAX_ID).select(
        "doc_id", F.lit(0).alias("hop")
    )
    visited = frontier
    for hop in range(1, _EXPAND_HOPS + 1):
        nxt = (
            frontier.join(edges, frontier["doc_id"] == edges["src"])
            .select(F.col("dst").alias("doc_id"))
            .distinct()
            .join(visited.select("doc_id"), "doc_id", "left_anti")
            .select("doc_id", F.lit(hop).alias("hop"))
        )
        visited = visited.unionByName(nxt)
        frontier = nxt
    return visited.groupBy("doc_id").agg(
        F.min("hop").cast("long").alias("hop")
    )


# ---------------------------------------------------------------------------
# q264: functional-dependency discovery (data profiling)
# ---------------------------------------------------------------------------


@query(
    "q264_fd_discovery",
    oracle=f"""
    WITH cand AS (
      SELECT 'source' AS lhs, 'lang' AS rhs,
             source AS x, lang AS y FROM documents
      UNION ALL
      SELECT 'lang', 'source', lang, source FROM documents
      UNION ALL
      SELECT 'source', 'len_bucket', source,
             CAST(LEAST(n_chars // {_KL_BUCKET_CHARS},
                        {_KL_MAX_BUCKET}) AS VARCHAR)
      FROM documents
    ),
    g AS (
      SELECT lhs, rhs, x, COUNT(DISTINCT y) AS ndv_y, COUNT(*) AS n
      FROM cand GROUP BY lhs, rhs, x
    )
    SELECT lhs, rhs,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN ndv_y > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violating_groups,
           CAST(SUM(CASE WHEN ndv_y > 1 THEN n ELSE 0 END) AS BIGINT)
             AS n_violating_rows,
           SUM(CASE WHEN ndv_y > 1 THEN 1 ELSE 0 END) = 0 AS holds
    FROM g GROUP BY lhs, rhs
    """,
)
def q264_fd_discovery(spark, sf_dir):
    """FUNCTIONAL-DEPENDENCY discovery: for candidate dependencies
    X -> Y (source->lang, lang->source, source->length-bucket), count
    the X-groups where more than one Y value appears - the profiling
    primitive behind key inference, normalization advice, and "is this
    column derivable" checks (the FD-miners' verification step, run
    here on an explicit candidate list the way TANE/HyFD verify their
    lattice nodes).

    Scale: the candidate relations union into ONE tall frame so all
    dependencies verify in a single pass - one (lhs, rhs, x)-keyed
    aggregate with map-side distinct partials, then a tiny per-pair
    rollup. Adding candidates adds rows, not stages."""
    docs = t(spark, sf_dir, "documents")
    lb = F.least(
        F.floor(F.col("n_chars") / _KL_BUCKET_CHARS),
        F.lit(_KL_MAX_BUCKET),
    ).cast("string")
    cand = (
        docs.select(
            F.lit("source").alias("lhs"),
            F.lit("lang").alias("rhs"),
            F.col("source").alias("x"),
            F.col("lang").alias("y"),
        )
        .unionByName(
            docs.select(
                F.lit("lang").alias("lhs"),
                F.lit("source").alias("rhs"),
                F.col("lang").alias("x"),
                F.col("source").alias("y"),
            )
        )
        .unionByName(
            docs.select(
                F.lit("source").alias("lhs"),
                F.lit("len_bucket").alias("rhs"),
                F.col("source").alias("x"),
                lb.alias("y"),
            )
        )
    )
    g = cand.groupBy("lhs", "rhs", "x").agg(
        F.countDistinct("y").alias("ndv_y"), F.count("*").alias("n")
    )
    viol = F.sum(F.when(F.col("ndv_y") > 1, 1).otherwise(0))
    return g.groupBy("lhs", "rhs").agg(
        F.count("*").cast("long").alias("n_groups"),
        viol.cast("long").alias("n_violating_groups"),
        F.sum(F.when(F.col("ndv_y") > 1, F.col("n")).otherwise(0))
        .cast("long")
        .alias("n_violating_rows"),
        (viol == 0).alias("holds"),
    )


# ---------------------------------------------------------------------------
# q266: dedup-system agreement (MinHash-LSH vs SimHash P/R/F1)
# ---------------------------------------------------------------------------

from .dedup import _HAM_T as _Q266_HAM_T  # noqa: E402
from .dedup import _SIMHASH_BANDS as _Q266_BANDS  # noqa: E402
from .dedup import _SIMHASH_CTES_SQL as _Q266_SIM_SQL  # noqa: E402


@query(
    "q266_dedup_agreement",
    oracle=_CANDS_FOR_CARD
    + f"""
    , {_Q266_SIM_SQL.strip().lstrip()}
    , sbands AS (
      SELECT doc_id, simhash, j AS bi,
             (simhash // CAST(pow(2, 8 * j) AS BIGINT)) % 256 AS bv
      FROM sim, (SELECT unnest(range(0, {_Q266_BANDS})) AS j)
    ),
    ref AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sbands a JOIN sbands b
        ON a.bi = b.bi AND a.bv = b.bv AND a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= {_Q266_HAM_T}
    ),
    tp AS (
      SELECT COUNT(*) AS n FROM cands c
      WHERE EXISTS (SELECT 1 FROM ref r
                    WHERE r.doc_a = c.doc_a AND r.doc_b = c.doc_b)
    ),
    np AS (SELECT COUNT(*) AS n FROM cands),
    nt AS (SELECT COUNT(*) AS n FROM ref)
    SELECT CAST(np.n AS BIGINT) AS n_minhash_pairs,
           CAST(nt.n AS BIGINT) AS n_simhash_pairs,
           CAST(tp.n AS BIGINT) AS n_agree,
           CASE WHEN np.n > 0
                THEN ROUND(tp.n * 1.0 / np.n, 4) END
             AS precision_vs_simhash,
           CASE WHEN nt.n > 0
                THEN ROUND(tp.n * 1.0 / nt.n, 4) END
             AS recall_of_simhash,
           CASE WHEN np.n + nt.n > 0
                THEN ROUND(2.0 * tp.n / (np.n + nt.n), 4) END AS f1
    FROM tp, np, nt
    """,
)
def q266_dedup_agreement(spark, sf_dir):
    """DEDUP-system AGREEMENT: the MinHash-LSH candidate pairs (q43)
    scored as a classifier against the INDEPENDENT SimHash detector
    (q85, hamming <= 3) - pairwise precision/recall/F1 between two
    systems built on different sketches of the same documents. With no
    labeled truth, cross-system agreement is how production dedup
    configs are compared: high agreement means the cheap knob
    (either one) suffices; divergence localizes which near-dup class
    each sketch family misses.

    Scale: both pair lists are session-persisted LSH outputs; the
    agreement count is one left-semi join of pair lists; the metric
    row collapses three 1-row frames. Nothing fact-wide recomputes."""
    from .dedup import (
        q43_lsh_candidate_pairs,
        q85_simhash_hamming_pairs,
    )

    cands = q43_lsh_candidate_pairs(spark, sf_dir).select(
        "doc_a", "doc_b"
    )
    ref = q85_simhash_hamming_pairs(spark, sf_dir).select(
        "doc_a", "doc_b"
    )
    tp = cands.join(ref, ["doc_a", "doc_b"], "left_semi").agg(
        F.count("*").alias("tp")
    )
    np_ = cands.agg(F.count("*").alias("np"))
    nt = ref.agg(F.count("*").alias("nt"))
    j = tp.crossJoin(F.broadcast(np_)).crossJoin(F.broadcast(nt))
    return j.select(
        F.col("np").cast("long").alias("n_minhash_pairs"),
        F.col("nt").cast("long").alias("n_simhash_pairs"),
        F.col("tp").cast("long").alias("n_agree"),
        # guards literal-identical to the oracle's CASE predicates
        # (q421 guard-parity rule; r11 empty-corpus census): on a
        # degenerate input with zero candidate pairs Spark's ANSI
        # division errors where DuckDB NULLs - both now NULL.
        F.when(
            F.col("np") > 0, F.round(F.col("tp") / F.col("np"), 4)
        ).alias("precision_vs_simhash"),
        F.when(
            F.col("nt") > 0, F.round(F.col("tp") / F.col("nt"), 4)
        ).alias("recall_of_simhash"),
        F.when(
            F.col("np") + F.col("nt") > 0,
            F.round(2.0 * F.col("tp") / (F.col("np") + F.col("nt")), 4),
        ).alias("f1"),
    )


# ---------------------------------------------------------------------------
# q267: distinctive terms per source (informative-Dirichlet log-odds)
# ---------------------------------------------------------------------------

#: Dirichlet prior mass per term and the report size per source.
_LO_ALPHA = 0.5
_LO_TOP = 5


@query(
    "q267_distinctive_terms",
    oracle=f"""
    WITH tok AS (
      SELECT source, unnest({_TOKENS_SQL}) AS term FROM documents
    ),
    st AS (
      SELECT source, term, COUNT(*) AS y_si FROM tok GROUP BY 1, 2
    ),
    tt AS (SELECT term, COUNT(*) AS y_i FROM tok GROUP BY 1),
    ns AS (SELECT source, COUNT(*) AS n_s FROM tok GROUP BY 1),
    tot AS (SELECT COUNT(*) AS n, COUNT(DISTINCT term) AS v FROM tok),
    z AS (
      SELECT st.source, st.term,
             (ln((st.y_si + {_LO_ALPHA})
                 / (ns.n_s + {_LO_ALPHA} * tot.v - st.y_si - {_LO_ALPHA}))
              - ln((tt.y_i + {_LO_ALPHA})
                   / (tot.n + {_LO_ALPHA} * tot.v - tt.y_i - {_LO_ALPHA})))
             / sqrt(1.0 / (st.y_si + {_LO_ALPHA})
                    + 1.0 / (tt.y_i + {_LO_ALPHA})) AS zscore
      FROM st
      JOIN tt USING (term)
      JOIN ns USING (source), tot
    ),
    ranked AS (
      SELECT source, term, ROUND(zscore, 4) AS z,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY ROUND(zscore, 4) DESC, term
             ) AS rk
      FROM z
    )
    SELECT source, term, z, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= {_LO_TOP}
    """,
)
def q267_distinctive_terms(spark, sf_dir):
    """DISTINCTIVE terms per source by informative-Dirichlet log-odds
    z-score (Monroe, Colaresi & Quinn's "Fightin' Words") - the
    principled "what vocabulary sets this domain apart" report that
    raw TF-IDF (q77) distorts for rare terms: the Dirichlet prior
    shrinks low-count estimates and the variance term turns the
    log-odds delta into a comparable z. Top 5 per source,
    z rounded before ranking so both engines pick identical terms.

    Scale: two token aggregates (per-(source, term) and per-term,
    map-side combined), two tiny marginals broadcast back, one window
    PARTITIONED by source for the top-k. The token explode is the
    only fact-sized stage and it feeds both aggregates in one
    shuffle round."""
    from .textops import cached_source_term_tf

    # the session-shared (source, term, tf) stage; every marginal
    # below folds over the VOCABULARY-sized table instead of re-
    # exploding corpus tokens (identical integer counts either way)
    st = cached_source_term_tf(spark, sf_dir).withColumnRenamed(
        "tf", "y_si"
    )
    tt = st.groupBy("term").agg(F.sum("y_si").alias("y_i"))
    ns = st.groupBy("source").agg(F.sum("y_si").alias("n_s"))
    tot = st.agg(
        F.sum("y_si").alias("n"), F.countDistinct("term").alias("v")
    )
    a = _LO_ALPHA
    joined = (
        st.join(tt, "term")
        .join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(tot))
    )
    delta = F.log(
        (F.col("y_si") + a)
        / (F.col("n_s") + a * F.col("v") - F.col("y_si") - a)
    ) - F.log(
        (F.col("y_i") + a)
        / (F.col("n") + a * F.col("v") - F.col("y_i") - a)
    )
    var = 1.0 / (F.col("y_si") + a) + 1.0 / (F.col("y_i") + a)
    z = F.round(delta / F.sqrt(var), 4)
    w = Window.partitionBy("source").orderBy(F.desc("z"), F.asc("term"))
    return (
        joined.select("source", "term", z.alias("z"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _LO_TOP)
        .select("source", "term", "z", F.col("rk").cast("long").alias("rk"))
    )


# ---------------------------------------------------------------------------
# q268: leakage-safe splits (whole near-dup clusters assigned together)
# ---------------------------------------------------------------------------


@query(
    "q268_leakage_safe_split",
    oracle=_CANDS_FOR_CARD.replace("WITH sh", "WITH RECURSIVE sh", 1)
    + f"""
    , edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM cands
      UNION
      SELECT doc_b AS src, doc_a AS dst FROM cands
    ),
    reach AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ),
    clusters AS (
      SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
      FROM reach GROUP BY src
    ),
    assigned AS (
      SELECT d.doc_id,
             COALESCE(c.cluster_id, d.doc_id) AS cluster_id
      FROM documents d LEFT JOIN clusters c USING (doc_id)
    )
    SELECT doc_id, CAST(cluster_id AS BIGINT) AS cluster_id,
           CASE WHEN {_h60_sql("CAST(cluster_id AS VARCHAR)")} % 100 < 80
                THEN 'train'
                WHEN {_h60_sql("CAST(cluster_id AS VARCHAR)")} % 100 < 90
                THEN 'validation' ELSE 'test' END AS part
    FROM assigned
    """,
)
def q268_leakage_safe_split(spark, sf_dir):
    """LEAKAGE-SAFE train/validation/test assignment: the q79 hash
    split re-keyed on the NEAR-DUP CLUSTER id (q78's connected
    components; singleton documents are their own cluster), so a
    cluster's members always land in the SAME split and the
    cross-split near-dup pairs q255 diagnoses cannot exist by
    construction - the repair loop closed: q43 finds pairs, q78
    clusters them, q255 measures the leak, this operator eliminates
    it while preserving q79's reproducible hash-split contract.

    Scale: the cluster map is the session-persisted q78 stage (pairs
    are LSH-bounded); the left join back to documents is id-keyed;
    the split is a pure map on the cluster id. One joined scan."""
    from .dedup import q78_dedup_clusters

    clusters = q78_dedup_clusters(spark, sf_dir)
    docs = t(spark, sf_dir, "documents").select("doc_id")
    assigned = docs.join(clusters, "doc_id", "left").select(
        "doc_id",
        F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
    )
    bucket = F.pmod(
        _h60(F.col("cluster_id").cast("string")), F.lit(100)
    )
    return assigned.select(
        "doc_id",
        F.col("cluster_id").cast("long").alias("cluster_id"),
        F.when(bucket < 80, "train")
        .when(bucket < 90, "validation")
        .otherwise("test")
        .alias("part"),
    )


# ---------------------------------------------------------------------------
# q269: greedy coverage-maximizing selection (set-cover corpus picks)
# ---------------------------------------------------------------------------

#: how many documents the greedy coverage selector picks.
_COVER_K = 3


@query(
    "q269_greedy_coverage",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, list_distinct({_SHINGLES_SQL}) AS sset
      FROM documents
      WHERE len({_SHINGLES_SQL}) > 0
    ),
    p1 AS (
      SELECT doc_id, sset, len(sset) AS gain FROM sh
      ORDER BY len(sset) DESC, doc_id LIMIT 1
    ),
    p2 AS (
      SELECT s.doc_id, list_concat(p1.sset, s.sset) AS cum,
             len(list_distinct(list_concat(p1.sset, s.sset)))
               - len(p1.sset) AS gain
      FROM sh s, p1 WHERE s.doc_id <> p1.doc_id
      ORDER BY gain DESC, s.doc_id LIMIT 1
    ),
    p3 AS (
      SELECT s.doc_id,
             len(list_distinct(list_concat(p2.cum, s.sset)))
               - len(list_distinct(p2.cum)) AS gain
      FROM sh s, p1, p2
      WHERE s.doc_id <> p1.doc_id AND s.doc_id <> p2.doc_id
      ORDER BY gain DESC, s.doc_id LIMIT 1
    )
    SELECT 1 AS pick, p1.doc_id, CAST(p1.gain AS BIGINT) AS marginal_gain
    FROM p1
    UNION ALL
    SELECT 2, p2.doc_id, CAST(p2.gain AS BIGINT) FROM p2
    UNION ALL
    SELECT 3, p3.doc_id, CAST(p3.gain AS BIGINT) FROM p3
    """,
)
def q269_greedy_coverage(spark, sf_dir):
    """GREEDY set-cover selection: pick 3 documents that
    maximize cumulative distinct-shingle coverage, each pick the
    argmax of MARGINAL gain given everything already chosen (ties to
    the smaller doc_id) - the classic (1 - 1/e)-approximate
    facility-location selection used to build maximally-diverse
    calibration/eval subsets ("cover the most n-grams with k docs").

    Scale: each round is one distributed aggregate - per-doc marginal
    gain = size(array_except(doc shingles, covered set)) with the
    covered set carried as a BROADCAST one-row DataFrame (it grows by
    at most one doc's shingles per round, bounded by k x
    max-doc-shingles), then a 1-row TakeOrdered argmax. k rounds = k
    scans. The covered set rides the broadcast DATA path, never the
    query plan: a plan literal (F.array of lits) would re-compile and
    re-ship a growing expression tree every round, while the
    broadcast relation keeps plan size constant for any k. The oracle
    unrolls the same greedy chain as 3 chained CTEs - no
    iteration is hidden from verification."""
    from .dedup import _shingles

    docs = t_split(spark, sf_dir, "documents")
    sh = transient_persist(
        docs.select(
            "doc_id", F.array_distinct(_shingles()).alias("sset")
        ).filter(F.size("sset") > 0)
    )
    spark_ = sh.sparkSession
    picks = []
    covered: set[str] = set()
    chosen: list[int] = []
    for rnd in range(1, _COVER_K + 1):
        cand = sh
        for c in chosen:
            cand = cand.filter(F.col("doc_id") != c)
        if covered:
            cov_df = spark_.createDataFrame(
                [(sorted(covered),)], "cov: array<string>"
            )
            cand = cand.crossJoin(F.broadcast(cov_df))
            gain = F.size(F.array_except("sset", "cov"))
        else:
            gain = F.size("sset")
        rows = (
            cand.select("doc_id", "sset", gain.alias("gain"))
            .orderBy(F.desc("gain"), F.asc("doc_id"))
            .limit(1)
            .collect()
        )
        if not rows:
            # fewer than k candidate docs (degenerate corpus): the
            # oracle's p{rnd}.. CTEs are empty from here on and its
            # UNION ALL simply contributes no rows - stop picking.
            break
        best = rows[0]
        picks.append((rnd, best["doc_id"], int(best["gain"])))
        chosen.append(best["doc_id"])
        covered |= set(best["sset"])
    return spark_.createDataFrame(
        picks, "pick int, doc_id long, marginal_gain long"
    )


# ---------------------------------------------------------------------------
# q296: l-diversity audit (the sensitive-attribute side of q236)
# ---------------------------------------------------------------------------

#: minimum distinct sensitive values required per quasi-identifier
#: group, and the sensitive attribute's bucket width (quality-score
#: deciles in milli-units).
_L_DIVERSE = 3
_SENS_BUCKET = 100


@query(
    "q296_l_diversity",
    oracle=f"""
    WITH q AS (
      SELECT doc_id, source, lang,
             (n_chars // {_K_LEN_BUCKET}) * {_K_LEN_BUCKET} AS len_bucket,
             {_SCORE_SQL} // {_SENS_BUCKET} AS sens
      FROM documents
      -- privacy metrics run over complete quasi-identifier tuples:
      -- listwise deletion of partial records (r13 census)
      WHERE text IS NOT NULL AND n_chars IS NOT NULL
    ),
    g AS (
      SELECT source, lang, len_bucket,
             CAST(COUNT(*) AS BIGINT) AS group_size,
             CAST(COUNT(DISTINCT sens) AS BIGINT) AS l_distinct
      FROM q GROUP BY 1, 2, 3
    )
    SELECT source, lang, CAST(len_bucket AS BIGINT) AS len_bucket,
           group_size, l_distinct
    FROM g
    WHERE l_distinct < {_L_DIVERSE}
    """,
)
def q296_l_diversity(spark, sf_dir):
    """L-DIVERSITY audit (Machanavajjhala et al. 2007): for every
    quasi-identifier group (q236's source x lang x length-bucket),
    count DISTINCT sensitive values (quality-score deciles) and flag
    groups below l=3 - the attack k-anonymity misses: a
    group can be comfortably large yet leak the sensitive attribute
    outright when every member shares one value (homogeneity attack).
    Together q236/q296 are the release-gate pair run before
    publishing grouped corpus statistics.

    Scale: one hash aggregate with a distinct-count per group
    (partial-aggregated two-phase distinct), bounded output =
    offending groups only. Integer everything."""
    from .textops import _SCORE_SPARK_SQL

    docs = t(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("n_chars").isNotNull()
    )  # complete quasi-identifier tuples only (r13 census)
    q = docs.select(
        "source",
        "lang",
        (F.expr(f"n_chars DIV {_K_LEN_BUCKET}") * _K_LEN_BUCKET).alias(
            "len_bucket"
        ),
        F.expr(f"({_SCORE_SPARK_SQL}) DIV {_SENS_BUCKET}").alias("sens"),
    )
    g = q.groupBy("source", "lang", "len_bucket").agg(
        F.count("*").cast("long").alias("group_size"),
        F.countDistinct("sens").cast("long").alias("l_distinct"),
    )
    return g.filter(F.col("l_distinct") < _L_DIVERSE).select(
        "source",
        "lang",
        F.col("len_bucket").cast("long").alias("len_bucket"),
        "group_size",
        "l_distinct",
    )


# ---------------------------------------------------------------------------
# q300: full BPE tokenizer-TRAINING loop (q227 iterated to a merge table)
# ---------------------------------------------------------------------------

#: merge rounds the training loop runs. Production trains to a vocab
#: target (e.g. 32k merges); the loop below is round-count-agnostic -
#: each round is the same distributed job.
_BPE_ROUNDS = 10


def _bpe_chain(m: int) -> str:
    """Unrolled DuckDB twin of the m-round BPE training loop: the
    q269/q284 technique - no iteration hidden from verification, each
    round a MATERIALIZED CTE (DuckDB inlines CTEs by default and the
    chain re-expands exponentially otherwise). Returns the CTE BODY
    (caller prepends WITH and appends its final select), exposing
    ``b1..b{m}`` (the per-round argmax merges) and ``w{m}`` (the word
    table after all merges, keyed by the original word ``w``). A round
    whose pair census is empty (vocabulary fully merged) yields an
    empty ``b{{i}}``; ``w{{i}}`` LEFT JOINs it so the word table
    carries forward unchanged - matching the Spark loop's early break
    (once no word has two symbols, no later round can either).

    Representation shared with the Spark side: a word's symbol
    sequence is one string, symbols joined by TWO spaces with a single
    leading/trailing space (" a  b  c "). Merging pair (l, r) is then
    plain left-to-right ``replace(' l  r ', ' lr ')``: the pattern
    consumes one of the two boundary spaces on each side and the
    replacement re-emits it, so adjacent occurrences ("a a a a" with
    merge a+a) stay mergeable in one pass - both engines' replace()
    resumes after the replacement, giving identical greedy semantics.
    """
    parts = [
        f"""w0 AS MATERIALIZED (
      SELECT w,
             ' ' || COALESCE(array_to_string(
               list_transform(range(1, length(w) + 1), i -> w[i]),
               '  '), '') || ' ' AS spaced,
             CAST(cnt AS BIGINT) AS freq
      FROM (SELECT w, COUNT(*) AS cnt
            FROM (SELECT unnest({_TOKENS_SQL}) AS w FROM documents)
            GROUP BY w)
    )"""
    ]
    for i in range(1, m + 1):
        parts.append(
            f"""
    p{i} AS MATERIALIZED (
      SELECT s[r.i] || ' ' || s[r.i + 1] AS pair, SUM(freq) AS cnt
      FROM (SELECT string_split(trim(spaced), '  ') AS s, freq
            FROM w{i - 1}) t,
           LATERAL unnest(range(1, len(s))) r(i)
      WHERE len(s) >= 2
      GROUP BY 1
    ),
    b{i} AS MATERIALIZED (
      SELECT CAST({i} AS BIGINT) AS merge_rank, pair,
             CAST(cnt AS BIGINT) AS cnt
      FROM p{i} ORDER BY cnt DESC, pair LIMIT 1
    ),
    w{i} AS MATERIALIZED (
      SELECT w.w,
             CASE WHEN b.pair IS NULL THEN w.spaced
                  ELSE replace(w.spaced,
                               ' ' || replace(b.pair, ' ', '  ') || ' ',
                               ' ' || replace(b.pair, ' ', '') || ' ')
             END AS spaced,
             w.freq
      FROM w{i - 1} w LEFT JOIN b{i} b ON TRUE
    )"""
        )
    return ",".join(parts)


def _bpe_oracle(m: int) -> str:
    final = "\n    UNION ALL ".join(
        f"SELECT merge_rank, pair, cnt FROM b{i}" for i in range(1, m + 1)
    )
    return f"WITH {_bpe_chain(m)}\n    {final}"


#: trained merge lists cached per (applicationId, sf_dir) - the
#: driver-side analogue of plans/common.shared_stage for a Python
#: value: q300 ships the merge table, q301 applies it; without the
#: cache each consumer re-runs the {_BPE_ROUNDS}-round loop.
_BPE_CACHE: dict[tuple[str, str], list[tuple[int, str, int]]] = {}


def _bpe_train(spark, sf_dir) -> list[tuple[int, str, int]]:
    """Run the BPE training loop; returns [(rank, "l r", cnt), ...].
    See :func:`q300_bpe_train_loop` for the algorithm and scale notes.
    """
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _BPE_CACHE.get(key)
    if cached is not None:
        return cached
    docs = t_split(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(_tokens()).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("freq"))
        .select(
            F.concat(
                F.lit(" "),
                F.array_join(F.split("w", ""), "  "),
                F.lit(" "),
            ).alias("spaced"),
            "freq",
        )
    )
    tbl = words.localCheckpoint()
    merges: list[tuple[int, str, int]] = []
    for rank in range(1, _BPE_ROUNDS + 1):
        syms = F.split(F.trim(F.col("spaced")), "  ")
        n = F.size(syms) - 1
        z = F.arrays_zip(F.slice(syms, 1, n), F.slice(syms, 2, n))
        pair = F.transform(z, lambda g: F.concat_ws(" ", g["0"], g["1"]))
        top = (
            tbl.filter(F.size(syms) >= 2)
            .select(F.explode(pair).alias("pair"), "freq")
            .groupBy("pair")
            .agg(F.sum("freq").cast("long").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not top:
            break  # every word fully merged: vocabulary saturated
        best, cnt = top[0]["pair"], int(top[0]["cnt"])
        merges.append((rank, best, cnt))
        left, right = best.split(" ")
        tbl = tbl.withColumn(
            "spaced",
            F.replace(
                F.col("spaced"),
                F.lit(f" {left}  {right} "),
                F.lit(f" {left}{right} "),
            ),
        )
        # Lineage cut every 4th round, not every round: each merge adds
        # one narrow projection (no shuffle), so a <=4-replace chain is
        # free to recompute, while materializing the table 10x costs
        # more than it saves. A 32k-merge production run keeps the same
        # cadence arithmetic - plans stay O(cadence), never O(rounds).
        if rank % 4 == 0:
            tbl = tbl.localCheckpoint()
    _BPE_CACHE[key] = merges
    return merges


@query("q300_bpe_train_loop", oracle=_bpe_oracle(_BPE_ROUNDS))
def q300_bpe_train_loop(spark, sf_dir):
    """FULL BPE tokenizer training over the corpus: 10
    merge rounds, each round counting every adjacent symbol pair
    (weighted by word frequency), merging the argmax pair corpus-wide,
    and re-tokenizing - the loop that turns q227's single merge STEP
    into the merge TABLE a tokenizer ships (Sennrich et al. 2016). The
    result is (merge_rank, pair, cnt): the ranked merge list plus each
    merge's support at selection time.

    Key scale property (the trick every real BPE trainer uses): the
    loop runs over the WORD-FREQUENCY table, not the corpus. One
    corpus-wide explode+groupBy builds (word, freq); every round after
    that is an aggregate over |vocab| rows - at 100 TB the corpus is
    ~10^11 words but the vocab is ~10^8, a 1000x reduction before the
    iteration starts, and each round's pair census is Zipf-bounded.

    Driver state is one (pair, cnt) row per round (the q177/q269
    bounded-argmax pattern); the word table is localCheckpoint-ed
    every 4th round, so plan depth stays O(cadence) instead of
    O(rounds) (a 32k-merge production run keeps the same cadence
    arithmetic). Merge application is a
    literal string replace on the double-space symbol encoding (no
    regex, no Python) - see :func:`_bpe_chain` for why the encoding
    makes left-to-right replace() exactly the greedy BPE re-tokenize
    in both engines.
    """
    merges = _bpe_train(spark, sf_dir)
    return spark.createDataFrame(
        merges, "merge_rank bigint, pair string, cnt bigint"
    )


# ---------------------------------------------------------------------------
# q301: tokenizer fertility/compression evaluation (applies q300's merges)
# ---------------------------------------------------------------------------


@query(
    "q301_tokenizer_fertility",
    oracle=f"""
    WITH {_bpe_chain(_BPE_ROUNDS)},
    census AS (
      SELECT source, w, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (SELECT source, unnest({_TOKENS_SQL}) AS w FROM documents)
      GROUP BY source, w
    ),
    tok AS (
      SELECT w,
             CAST(len(string_split(trim(spaced), '  ')) AS BIGINT)
               AS n_tok,
             CAST(length(w) AS BIGINT) AS n_chr
      FROM w{_BPE_ROUNDS}
    )
    SELECT census.source,
           CAST(SUM(cnt) AS BIGINT) AS n_words,
           CAST(SUM(cnt * n_tok) AS BIGINT) AS n_tokens,
           CAST(SUM(cnt * n_chr) AS BIGINT) AS n_chars,
           ROUND(CAST(SUM(cnt * n_tok) AS DOUBLE) / SUM(cnt), 6)
             AS fertility,
           ROUND(CAST(SUM(cnt * n_chr) AS DOUBLE) / SUM(cnt * n_tok), 6)
             AS chars_per_token
    FROM census JOIN tok USING (w)
    GROUP BY census.source
    """,
)
def q301_tokenizer_fertility(spark, sf_dir):
    """Tokenizer EVALUATION: apply the merge table q300 trained and
    measure, per source, fertility (tokens per word) and compression
    (characters per token) - the two numbers a tokenizer is judged by
    before it ships (a fertility regression on one language/source is
    the classic symptom of a train-corpus mixture bug).

    Scale: the learned merges are a driver-side constant (10 rows;
    32k in production - still constant w.r.t. the corpus), applied as
    a chain of literal replaces over the DISTINCT-word frame, never
    the corpus: one corpus-wide explode builds the (source, word,
    cnt) census, the merge chain runs over |vocab| rows, and the
    final join is census x vocab on the word key (unhinted - vocab is
    sublinear but data-derived, AQE decides). All sums are exact
    integers; the two ratios are single IEEE divisions, identical
    cross-engine.
    """
    merges = _bpe_train(spark, sf_dir)
    docs = t_split(spark, sf_dir, "documents")
    census = (
        docs.select("source", F.explode(_tokens()).alias("w"))
        .groupBy("source", "w")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    spaced = F.concat(
        F.lit(" "), F.array_join(F.split("w", ""), "  "), F.lit(" ")
    )
    for _, pair, _ in merges:
        left, right = pair.split(" ")
        spaced = F.replace(
            spaced, F.lit(f" {left}  {right} "), F.lit(f" {left}{right} ")
        )
    tok = census.select("w").distinct().select(
        "w",
        F.size(F.split(F.trim(spaced), "  ")).cast("long").alias("n_tok"),
        F.length("w").cast("long").alias("n_chr"),
    )
    return (
        census.join(tok, "w")
        .groupBy("source")
        .agg(
            F.sum("cnt").cast("long").alias("n_words"),
            F.sum(F.col("cnt") * F.col("n_tok")).cast("long").alias(
                "n_tokens"
            ),
            F.sum(F.col("cnt") * F.col("n_chr")).cast("long").alias(
                "n_chars"
            ),
        )
        .select(
            "source",
            "n_words",
            "n_tokens",
            "n_chars",
            F.round(
                F.col("n_tokens").cast("double") / F.col("n_words"), 6
            ).alias("fertility"),
            F.round(
                F.col("n_chars").cast("double") / F.col("n_tokens"), 6
            ).alias("chars_per_token"),
        )
    )


# ---------------------------------------------------------------------------
# q302: Count-Min sketch term-frequency estimation (mergeable sketch)
# ---------------------------------------------------------------------------

#: sketch geometry: _CMS_D independent hash rows x _CMS_W buckets.
#: Tiny on purpose so collisions actually occur at test SF and the
#: overestimate column exercises the estimate-vs-exact comparison.
_CMS_D = 4
_CMS_W = 64
#: how many head terms the point-query report covers.
_CMS_TOPK = 15

_CMS_ROWS_SQL = "[" + ", ".join(str(j) for j in range(_CMS_D)) + "]"


@query(
    "q302_count_min_sketch",
    oracle=f"""
    WITH census AS (
      SELECT w AS term, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (SELECT unnest({_TOKENS_SQL}) AS w FROM documents)
      GROUP BY w
    ),
    cells AS (
      SELECT r.j,
             {_h60_sql("CAST(r.j AS VARCHAR) || ':' || term")} % {_CMS_W}
               AS b,
             CAST(SUM(cnt) AS BIGINT) AS cell
      FROM census, LATERAL unnest({_CMS_ROWS_SQL}) r(j)
      GROUP BY 1, 2
    ),
    topk AS (
      SELECT term, cnt FROM census
      ORDER BY cnt DESC, term LIMIT {_CMS_TOPK}
    ),
    probes AS (
      SELECT term, cnt, r.j,
             {_h60_sql("CAST(r.j AS VARCHAR) || ':' || term")} % {_CMS_W}
               AS b
      FROM topk, LATERAL unnest({_CMS_ROWS_SQL}) r(j)
    )
    SELECT p.term,
           p.cnt AS exact_cnt,
           CAST(MIN(c.cell) AS BIGINT) AS cms_estimate,
           CAST(MIN(c.cell) - p.cnt AS BIGINT) AS overestimate
    FROM probes p JOIN cells c ON p.j = c.j AND p.b = c.b
    GROUP BY p.term, p.cnt
    """,
)
def q302_count_min_sketch(spark, sf_dir):
    """COUNT-MIN SKETCH frequency estimation: build a 4 x
    64 CMS over corpus term occurrences, then point-query the
    top 15 head terms and report estimate vs exact - the
    mergeable fixed-size sketch every streaming frequency monitor
    ships (Cormode & Muthukrishnan 2005), complementing q151's
    Misra-Gries (candidate SET) with per-key COUNT estimates whose
    error is one-sided (estimate >= exact, the overestimate column).

    Scale: the sketch is built from the term CENSUS, not the raw
    occurrence stream - one corpus explode+groupBy (the same partial-
    aggregated shuffle every term query here pays), then the 4
    hash rows explode only |vocab| rows and collapse to 4 x
    64 = 256 cells. On a cluster the cells frame
    IS the sketch: constant-size, mergeable across shards by cell-wise
    sum (the groupBy does exactly that merge). Point queries join two
    aggregate-derived bounded frames (15 x 4 probes
    against 256 cells) - AQE broadcasts. Hashes are the
    suite's cross-engine md5-60bit; all counts integer-exact.
    """
    docs = t_split(spark, sf_dir, "documents")
    census = (
        docs.select(F.explode(_tokens()).alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("cnt"))
    )

    def bucket(j):
        return (
            _h60(F.concat(F.lit(f"{j}:"), F.col("term"))) % _CMS_W
        ).alias("b")

    rows = F.explode(
        F.array(
            *[
                F.struct(F.lit(j).alias("j"), bucket(j))
                for j in range(_CMS_D)
            ]
        )
    ).alias("jb")
    cells = (
        census.select(rows, "cnt")
        .groupBy(F.col("jb.j").alias("j"), F.col("jb.b").alias("b"))
        .agg(F.sum("cnt").cast("long").alias("cell"))
    )
    topk = census.orderBy(F.desc("cnt"), F.asc("term")).limit(_CMS_TOPK)
    probes = topk.select("term", "cnt", rows).select(
        "term", "cnt", F.col("jb.j").alias("j"), F.col("jb.b").alias("b")
    )
    return (
        probes.join(cells, ["j", "b"])
        .groupBy("term", "cnt")
        .agg(F.min("cell").cast("long").alias("cms_estimate"))
        .select(
            "term",
            F.col("cnt").alias("exact_cnt"),
            "cms_estimate",
            (F.col("cms_estimate") - F.col("cnt"))
            .cast("long")
            .alias("overestimate"),
        )
    )


# ---------------------------------------------------------------------------
# q313: differentially-private release histogram (seeded Laplace)
# ---------------------------------------------------------------------------

#: epsilon for the per-source count release; sensitivity 1 (one
#: document moves one count), so the Laplace scale b = 1/epsilon.
_DP_EPS = 1.0
#: seeded-uniform resolution (inverse-CDF input grid).
_DP_RES = 1_000_000_000


@query(
    "q313_dp_histogram",
    oracle=f"""
    WITH h AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS true_n
      FROM documents GROUP BY source
    ),
    u AS (
      SELECT source, true_n,
             ({_h60_sql_ns("'dp:' || source")} % {_DP_RES} + 0.5)
               / {_DP_RES}.0 AS u
      FROM h
    )
    SELECT source, true_n,
           ROUND((CASE WHEN u >= 0.5 THEN -1.0 ELSE 1.0 END)
                 * (1.0 / {_DP_EPS})
                 * LN(1.0 - 2.0 * ABS(u - 0.5)), 6) AS noise,
           ROUND(true_n + (CASE WHEN u >= 0.5 THEN -1.0 ELSE 1.0 END)
                 * (1.0 / {_DP_EPS})
                 * LN(1.0 - 2.0 * ABS(u - 0.5)), 6) AS released_n
    FROM u
    """,
)
def q313_dp_histogram(spark, sf_dir):
    """Differentially-private RELEASE histogram: per-source document
    counts plus Laplace(1/epsilon) noise via inverse-CDF transform -
    the release mechanism behind every DP data datasheet
    (sensitivity 1, epsilon 1.0), completing the governance
    family (k-anonymity q236, l-diversity q296, erasure q234) with the
    publishable-counts side. DETERMINISM CAVEAT (by design, for the
    oracle): the uniform draw is the md5-60bit hash of the group key,
    so the release is reproducible and cross-engine checkable; a
    production release swaps in a real entropy source - everything
    else (scan shape, inverse CDF, clamped rounding) is unchanged.

    Scale: one groupBy(source) aggregate; the noise is a map-stage
    expression on the |sources|-row result. The inverse-CDF arithmetic
    is written identically on both engines (one LN per row under a 6dp
    round)."""
    h = t(spark, sf_dir, "documents").groupBy("source").agg(
        F.count("*").cast("long").alias("true_n")
    )
    u = (
        (_h60(F.concat(F.lit("dp:"), F.col("source"))) % _DP_RES) + 0.5
    ) / float(_DP_RES)
    sign = F.when(u >= 0.5, F.lit(-1.0)).otherwise(F.lit(1.0))
    noise = sign * (1.0 / _DP_EPS) * F.log(1.0 - 2.0 * F.abs(u - 0.5))
    return h.select(
        "source",
        "true_n",
        F.round(noise, 6).alias("noise"),
        F.round(F.col("true_n") + noise, 6).alias("released_n"),
    )


# ---------------------------------------------------------------------------
# q323: mergeable bottom-k sample sketch -> approximate quantiles
# ---------------------------------------------------------------------------

#: sketch size. Bottom-k BY A FIXED HASH is the mergeable uniform
#: sample: min-k of a union equals min-k of the per-partition min-ks,
#: so shards/streams combine associatively with O(k) state - unlike
#: reservoir sampling, which needs coordinated randomness to merge.
_BK_K = 256


@query(
    "q323_bottomk_sample_quantiles",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, n_chars AS v,
             {_h60_sql("CAST(doc_id AS VARCHAR)")} AS u
      FROM documents
      -- listwise: quantiles are over observed lengths (r13 census)
      WHERE n_chars IS NOT NULL
    ),
    samp AS (
      SELECT v FROM s ORDER BY u, doc_id LIMIT {_BK_K}
    ),
    kf AS (SELECT COUNT(*) AS k_eff FROM samp),
    r AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS rn FROM samp),
    est AS (
      SELECT
        MIN(CASE WHEN rn = CAST(ceil(0.25 * k_eff) AS BIGINT)
            THEN v END) AS e25,
        MIN(CASE WHEN rn = CAST(ceil(0.50 * k_eff) AS BIGINT)
            THEN v END) AS e50,
        MIN(CASE WHEN rn = CAST(ceil(0.75 * k_eff) AS BIGINT)
            THEN v END) AS e75
      FROM r, kf
    ),
    ex AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
             quantile_disc(n_chars, 0.25) AS x25,
             quantile_disc(n_chars, 0.50) AS x50,
             quantile_disc(n_chars, 0.75) AS x75
      FROM documents
    )
    SELECT ex.n_total, CAST(kf.k_eff AS BIGINT) AS k,
           CAST(est.e25 AS BIGINT) AS est_p25,
           CAST(est.e50 AS BIGINT) AS est_p50,
           CAST(est.e75 AS BIGINT) AS est_p75,
           CAST(ex.x25 AS BIGINT) AS exact_p25,
           CAST(ex.x50 AS BIGINT) AS exact_p50,
           CAST(ex.x75 AS BIGINT) AS exact_p75
    FROM est, ex, kf
    """,
)
def q323_bottomk_sample_quantiles(spark, sf_dir):
    """MERGEABLE BOTTOM-K SAMPLE SKETCH for approximate quantiles:
    keep the 256 rows with the smallest fixed content hash - a
    uniform sample that MERGES associatively (min-k of a union = min-k
    of per-shard min-ks), the property reservoir sampling lacks and
    the reason bottom-k/KMV sketches back distributed quantile and
    distinct-count estimation (Bar-Yossef et al. 2002; the
    quantile-sketch sibling of q256's HLL and q302's CMS, with the
    same merge-law pytest discipline). Reports sample-estimated vs
    exact discrete quartiles of document length side by side, so the
    sketch error is the query's own output.

    Exactness: the hash is the md5-60bit bridge, the sample is a
    deterministic top-k under (u, doc_id) total order, estimates are
    rank-selected OBSERVED values (integers), and the exact side is
    percentile_disc - every output column is a BIGINT, nothing
    floats.

    Scale: the sample is TakeOrderedAndProject (256 rows per
    partition -> 256 global, constant memory); the rank window
    runs on the 256-row bounded frame (adjudicated); exact
    quartiles are per-group sorts the 100 TB deployment would swap
    for approx_percentile with the same API shape (q149's note)."""
    s = t(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull()  # observed lengths (r13)
    ).select(
        "doc_id",
        F.col("n_chars").alias("v"),
        _h60(F.col("doc_id").cast("string")).alias("u"),
    )
    samp = s.orderBy("u", "doc_id").limit(_BK_K).select("v")
    kf = samp.agg(F.count("*").alias("k_eff"))
    r = samp.withColumn(
        "rn", F.row_number().over(Window.orderBy("v")).cast("long")
    )
    est = r.crossJoin(F.broadcast(kf)).agg(
        F.min(
            F.when(
                F.col("rn")
                == F.ceil(0.25 * F.col("k_eff")).cast("long"),
                F.col("v"),
            )
        ).alias("e25"),
        F.min(
            F.when(
                F.col("rn")
                == F.ceil(0.50 * F.col("k_eff")).cast("long"),
                F.col("v"),
            )
        ).alias("e50"),
        F.min(
            F.when(
                F.col("rn")
                == F.ceil(0.75 * F.col("k_eff")).cast("long"),
                F.col("v"),
            )
        ).alias("e75"),
    )
    ex = t(spark, sf_dir, "documents").agg(
        F.count("*").cast("long").alias("n_total"),
        F.expr(
            "percentile_disc(0.25) WITHIN GROUP (ORDER BY n_chars)"
        ).alias("x25"),
        F.expr(
            "percentile_disc(0.50) WITHIN GROUP (ORDER BY n_chars)"
        ).alias("x50"),
        F.expr(
            "percentile_disc(0.75) WITHIN GROUP (ORDER BY n_chars)"
        ).alias("x75"),
    )
    return (
        est.crossJoin(F.broadcast(ex))
        .crossJoin(F.broadcast(kf))
        .select(
            "n_total",
            F.col("k_eff").cast("long").alias("k"),
            F.col("e25").cast("long").alias("est_p25"),
            F.col("e50").cast("long").alias("est_p50"),
            F.col("e75").cast("long").alias("est_p75"),
            F.col("x25").cast("long").alias("exact_p25"),
            F.col("x50").cast("long").alias("exact_p50"),
            F.col("x75").cast("long").alias("exact_p75"),
        )
    )


# ---------------------------------------------------------------------------
# q332: t-closeness audit (ordered EMD per quasi-identifier group)
# ---------------------------------------------------------------------------

#: t-closeness release threshold: groups whose sensitive-attribute
#: distribution sits farther than this (ordered EMD) from the corpus
#: distribution are flagged.
_T_CLOSE_MILLI = 200


@query(
    "q332_t_closeness",
    oracle=f"""
    WITH q AS (
      SELECT source, lang,
             (n_chars // {_K_LEN_BUCKET}) * {_K_LEN_BUCKET}
               AS len_bucket,
             {_SCORE_SQL} // {_SENS_BUCKET} AS sens
      FROM documents
      -- privacy metrics run over complete quasi-identifier tuples:
      -- listwise deletion of partial records (r13 census)
      WHERE text IS NOT NULL AND n_chars IS NOT NULL
    ),
    gc AS (
      SELECT source, lang, len_bucket, sens,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM q GROUP BY 1, 2, 3, 4
    ),
    grp AS (
      SELECT source, lang, len_bucket,
             CAST(SUM(c) AS BIGINT) AS n_g
      FROM gc GROUP BY 1, 2, 3
    ),
    bkt AS (
      SELECT sens, CAST(SUM(c) AS BIGINT) AS g_k
      FROM gc GROUP BY sens
    ),
    tot AS (
      SELECT CAST(SUM(g_k) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS m
      FROM bkt
    ),
    grid AS (
      SELECT grp.source, grp.lang, grp.len_bucket, grp.n_g,
             bkt.sens, bkt.g_k, tot.n, tot.m,
             COALESCE(gc.c, 0) AS c
      FROM grp CROSS JOIN bkt CROSS JOIN tot
      LEFT JOIN gc ON gc.source = grp.source AND gc.lang = grp.lang
                  AND gc.len_bucket = grp.len_bucket
                  AND gc.sens = bkt.sens
    ),
    cum AS (
      SELECT source, lang, len_bucket, n_g, n, m,
             CAST(SUM(c * n - g_k * n_g) OVER (
               PARTITION BY source, lang, len_bucket
               ORDER BY sens
             ) AS BIGINT) AS e
      FROM grid
    )
    SELECT source, lang, CAST(len_bucket AS BIGINT) AS len_bucket,
           MAX(n_g) AS group_size,
           ROUND(CAST(SUM(ABS(e)) AS DOUBLE)
                 / (MAX(n_g) * MAX(n) * (MAX(m) - 1)), 6) AS emd,
           CAST(CASE WHEN ROUND(CAST(SUM(ABS(e)) AS DOUBLE)
                     / (MAX(n_g) * MAX(n) * (MAX(m) - 1)), 6)
                     > {_T_CLOSE_MILLI} / 1000.0
                THEN 1 ELSE 0 END AS BIGINT) AS t_violation
    FROM cum
    GROUP BY source, lang, len_bucket
    """,
)
def q332_t_closeness(spark, sf_dir):
    """T-CLOSENESS audit (Li, Li & Venkatasubramanian 2007), the
    third leg of the release-gate tripod: q236 checks groups are big
    enough (k-anonymity), q296 checks the sensitive attribute varies
    (l-diversity), and this checks the group's sensitive-value
    DISTRIBUTION stays close to the corpus's - the skewness attack
    both miss: a large, 3-diverse group whose quality scores are
    nearly all in the top decile still tells an attacker which
    members are high-quality. Distance is the ordered-attribute
    Earth Mover's Distance: EMD = sum_k |cumsum_k(p - q)| / (m-1)
    over the score-decile buckets; groups past t=200
    milli-units are flagged.

    Exactness: the cumulative difference is kept INTEGRAL by scaling
    to the common denominator n_g*N - each cell contributes
    c_gk*N - g_k*n_g (exact bigint, |e| <= n_g*N) - so the window
    cumsum and the |.| sum are exact regardless of aggregation
    order; ONE double division at the end, identical expression
    string both engines, and the violation flag compares the ROUNDED
    value so it cannot straddle a rounding edge.

    Scale: one hash aggregate over the corpus (QI x decile cells),
    then everything is aggregate-bounded: the QI-group frame times
    the <=11-row decile frame is a bounded grid (adjudicated NLJ
    over aggregate frames), the cumsum window is PARTITIONED by
    group, and the final aggregate returns |groups| rows."""
    from .textops import _SCORE_SPARK_SQL

    q = t(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("n_chars").isNotNull()
    ).select(
        "source",
        "lang",
        (F.expr(f"n_chars DIV {_K_LEN_BUCKET}") * _K_LEN_BUCKET).alias(
            "len_bucket"
        ),
        F.expr(f"({_SCORE_SPARK_SQL}) DIV {_SENS_BUCKET}").alias("sens"),
    )
    gc = transient_persist(
        q.groupBy("source", "lang", "len_bucket", "sens").agg(
            F.count("*").cast("long").alias("c")
        )
    )
    grp = gc.groupBy("source", "lang", "len_bucket").agg(
        F.sum("c").cast("long").alias("n_g")
    )
    bkt = gc.groupBy("sens").agg(F.sum("c").cast("long").alias("g_k"))
    tot = bkt.agg(
        F.sum("g_k").cast("long").alias("n"),
        F.count("*").cast("long").alias("m"),
    )
    grid = (
        grp.crossJoin(F.broadcast(bkt))
        .crossJoin(F.broadcast(tot))
        .join(
            gc.withColumnRenamed("c", "c_obs"),
            ["source", "lang", "len_bucket", "sens"],
            "left",
        )
        .select(
            "source",
            "lang",
            "len_bucket",
            "n_g",
            "sens",
            "g_k",
            "n",
            "m",
            F.coalesce(F.col("c_obs"), F.lit(0)).alias("c"),
        )
    )
    wg = (
        Window.partitionBy("source", "lang", "len_bucket")
        .orderBy("sens")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grid.select(
        "source",
        "lang",
        "len_bucket",
        "n_g",
        "n",
        "m",
        F.sum(
            F.col("c") * F.col("n") - F.col("g_k") * F.col("n_g")
        ).over(wg).cast("long").alias("e"),
    )
    emd = F.round(
        F.sum(F.abs(F.col("e"))).cast("double")
        / F.nullif(
            (F.max("n_g") * F.max("n") * (F.max("m") - 1)).cast("double"),
            F.lit(0.0),
        ),
        6,
    )
    return cum.groupBy("source", "lang", "len_bucket").agg(
        F.max("n_g").alias("group_size"),
        emd.alias("emd"),
        F.when(emd > _T_CLOSE_MILLI / 1000.0, 1)
        .otherwise(0)
        .cast("long")
        .alias("t_violation"),
    ).select(
        "source",
        "lang",
        F.col("len_bucket").cast("long").alias("len_bucket"),
        "group_size",
        "emd",
        "t_violation",
    )


# ---------------------------------------------------------------------------
# q342: order-independent dataset digest (reproducibility fingerprint)
# ---------------------------------------------------------------------------

#: digest modulus: folding each row hash to 31 bits before the sum
#: keeps SUM < 2^63 through ~4e9 rows per group; two salted digests
#: push the collision/anticommutation failure odds to ~2^-62
_DIG_MOD = 2_147_483_647


@query(
    "q342_dataset_digest",
    oracle=f"""
    WITH rowsig AS (
      SELECT source,
             CAST(doc_id AS VARCHAR) || '|' ||
               COALESCE(md5(text), '~NULL~') || '|' ||
               COALESCE(lang, '~NULL~') || '|' ||
               COALESCE(CAST(n_chars AS VARCHAR), '~NULL~') AS canon
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM({_h60_sql_ns("'d1|' || canon")} % {_DIG_MOD})
                AS BIGINT) % {_DIG_MOD} AS digest1,
           CAST(SUM({_h60_sql_ns("'d2|' || canon")} % {_DIG_MOD})
                AS BIGINT) % {_DIG_MOD} AS digest2
    FROM rowsig GROUP BY source
    """,
)
def q342_dataset_digest(spark, sf_dir):
    """ORDER-INDEPENDENT DATASET DIGEST per source: each row is
    canonicalized (id | content-md5 | lang | length), hashed with two
    salts, folded to 31 bits, and SUMMED modulo 2^31-1 — a
    commutative checksum that is identical no matter how the table is
    partitioned, shuffled, or re-ordered. This is the reproducibility
    primitive a 100 TB pipeline pins in its run manifest: "did this
    rebuild produce byte-identical content?" is one cheap scan and an
    equality check on (n_rows, digest1, digest2) per partition, with
    no sort and no single-reducer bottleneck (the anti-pattern:
    md5(string_agg(...)) needs a global ORDER BY). Two independent
    salts guard the additive construction against coordinated
    collisions.

    Exactness: pure bigint — the 60-bit md5 bridge hash (identical on
    both engines by the registry's conv/hex-cast equivalence), an
    integer mod, an integer sum bounded by n * 2^31 < 2^63, and a
    final mod. No float, no order sensitivity, by construction.

    Scale: one scan, map-side-combined hash aggregate on source;
    digest state per group is two bigints. At 100 TB this is the
    cheapest possible full-content audit - and the same expression
    works per-file or per-partition for incremental Merkle-style
    roll-ups."""
    # NULL fields are REPRESENTED with an explicit sentinel, never
    # skipped or propagated: concat_ws silently drops NULL args (so a
    # NULL lang would alias a different record shape) and bare ||
    # nulls the whole canon (so a NULL-text row would vanish from the
    # digest) - a content checksum must do neither (r13
    # partial-records census).
    canon = F.concat_ws(
        "|",
        F.col("doc_id").cast("string"),
        F.coalesce(F.md5(F.col("text")), F.lit("~NULL~")),
        F.coalesce(F.col("lang"), F.lit("~NULL~")),
        F.coalesce(F.col("n_chars").cast("string"), F.lit("~NULL~")),
    )
    d = t(spark, sf_dir, "documents").select("source", canon.alias("canon"))
    return d.groupBy("source").agg(
        F.count("*").cast("long").alias("n_rows"),
        (
            F.sum(_h60(F.concat(F.lit("d1|"), F.col("canon"))) % _DIG_MOD)
            .cast("long")
            % _DIG_MOD
        ).alias("digest1"),
        (
            F.sum(_h60(F.concat(F.lit("d2|"), F.col("canon"))) % _DIG_MOD)
            .cast("long")
            % _DIG_MOD
        ).alias("digest2"),
    )


# ---------------------------------------------------------------------------
# q348: data-constrained epoch-repeat budget allocation
# ---------------------------------------------------------------------------

#: maximum useful repeat epochs (diminishing returns beyond ~4 epochs
#: per Muennighoff et al. 2023); per-epoch value decays dyadically
_EP_MAX = 4


@query(
    "q348_epoch_allocation",
    oracle=f"""
    WITH st AS (
      SELECT source, CAST(SUM(len({_TOKENS_SQL})) AS BIGINT) AS toks
      FROM documents GROUP BY source
    ),
    b AS (SELECT CAST(SUM(toks) AS BIGINT) * 2 AS budget FROM st),
    cand AS (
      SELECT st.source, st.toks, e.epoch,
             (st.toks * 1000) // (CAST(1 AS BIGINT)
                << CAST(e.epoch - 1 AS INTEGER)) AS value_m
      FROM st, (SELECT unnest(range(1, {_EP_MAX} + 1)) AS epoch) e
    ),
    ranked AS (
      SELECT *,
             CAST(SUM(toks) OVER (ORDER BY epoch, toks DESC, source
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum
      FROM cand
    ),
    taken AS (
      SELECT r.source, r.toks, r.epoch, r.value_m, r.cum, b.budget,
             CASE WHEN r.cum <= b.budget THEN r.toks
                  WHEN r.cum - r.toks < b.budget
                    THEN b.budget - (r.cum - r.toks)
                  ELSE 0 END AS got
      FROM ranked r, b
    )
    SELECT source, MAX(toks) AS tokens,
           CAST(SUM(CASE WHEN got = toks THEN 1 ELSE 0 END) AS BIGINT)
             AS epochs_full,
           CAST(SUM(CASE WHEN got > 0 AND got < toks THEN got
                         ELSE 0 END) AS BIGINT) AS partial_tokens,
           CAST(SUM(got) AS BIGINT) AS repeat_tokens,
           CAST(SUM((got * value_m) // toks) AS BIGINT)
             AS effective_value_m
    FROM taken GROUP BY source
    """,
)
def q348_epoch_allocation(spark, sf_dir):
    """DATA-CONSTRAINED EPOCH ALLOCATION (Muennighoff et al. 2023,
    "Scaling Data-Constrained Language Models"): given a token budget
    of 2x the deduplicated corpus, decide how many REPEAT EPOCHS each
    source gets when the value of epoch e decays dyadically
    (value ~ 2^-(e-1), zero past 4) - the budgeting step
    between q293's effective-yield audit and q230's fill plan, for
    the regime where there is NOT enough unique data and repetition
    is the knob.

    The greedy-by-marginal-value schedule is provably epoch-ordered
    (all epoch-1 slices dominate every epoch-2 slice, etc.), so the
    whole optimization collapses to ONE cumulative-sum sweep over the
    (source x epoch) candidate grid in (epoch, tokens DESC, source)
    order, with the budget boundary splitting one candidate into a
    partial epoch - no iteration, no driver state.

    Exactness: token counts, dyadic epoch values ((toks*1000) >>
    (e-1)), the cumulative sweep, and the pro-rated partial value
    ((got*value)/toks by integer division) are all bigint -
    order-independent by construction.

    Scale: one token-count aggregate per source (map-side combined)
    is the only corpus-sized stage; the grid is |sources| x 4
    rows and its window is an adjudicated bounded-aggregate sweep."""
    st = (
        t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.sum(F.size(_tokens())).cast("long").alias("toks"))
    )
    st = transient_persist(st)
    b = st.agg((F.sum("toks") * 2).cast("long").alias("budget"))
    epochs = spark.range(1, _EP_MAX + 1).select(
        F.col("id").cast("long").alias("epoch")
    )
    cand = st.crossJoin(F.broadcast(epochs)).select(
        "source",
        "toks",
        "epoch",
        F.expr(
            "(toks * 1000) DIV SHIFTLEFT(CAST(1 AS LONG),"
            " CAST(epoch - 1 AS INT))"
        ).alias("value_m"),
    )
    w = Window.orderBy(
        "epoch", F.desc("toks"), "source"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = cand.select(
        "*", F.sum("toks").over(w).cast("long").alias("cum")
    )
    taken = ranked.crossJoin(F.broadcast(b)).select(
        "source",
        "toks",
        "value_m",
        F.when(F.col("cum") <= F.col("budget"), F.col("toks"))
        .when(
            F.col("cum") - F.col("toks") < F.col("budget"),
            F.col("budget") - (F.col("cum") - F.col("toks")),
        )
        .otherwise(0)
        .alias("got"),
    )
    return taken.groupBy("source").agg(
        F.max("toks").alias("tokens"),
        F.sum(F.when(F.col("got") == F.col("toks"), 1).otherwise(0))
        .cast("long")
        .alias("epochs_full"),
        F.sum(
            F.when(
                (F.col("got") > 0) & (F.col("got") < F.col("toks")),
                F.col("got"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("partial_tokens"),
        F.sum("got").cast("long").alias("repeat_tokens"),
        F.sum(F.expr("(got * value_m) DIV toks"))
        .cast("long")
        .alias("effective_value_m"),
    )


# ---------------------------------------------------------------------------
# q371: Count-Sketch (signed, median estimate) vs exact frequencies
# ---------------------------------------------------------------------------

_CSK_D = 3
_CSK_W = 64
_CSK_TOPK = 15
_CSK_ROWS_SQL = "[" + ", ".join(str(j) for j in range(_CSK_D)) + "]"


@query(
    "q371_count_sketch",
    oracle=f"""
    WITH census AS MATERIALIZED (
      SELECT w AS term, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (SELECT unnest({_TOKENS_SQL}) AS w FROM documents)
      GROUP BY w
    ),
    hashed AS MATERIALIZED (
      SELECT term, cnt, r.j,
             {_h60_sql("CAST(r.j AS VARCHAR) || ':' || term")} % {_CSK_W}
               AS b,
             CASE WHEN {_h60_sql("'s' || CAST(r.j AS VARCHAR) || ':' || term")}
                       % 2 = 0 THEN 1 ELSE -1 END AS sgn
      FROM census, LATERAL unnest({_CSK_ROWS_SQL}) r(j)
    ),
    cells AS MATERIALIZED (
      SELECT j, b, CAST(SUM(sgn * cnt) AS BIGINT) AS cell
      FROM hashed GROUP BY j, b
    ),
    topk AS MATERIALIZED (
      SELECT term, cnt FROM census
      ORDER BY cnt DESC, term LIMIT {_CSK_TOPK}
    ),
    est AS (
      SELECT t.term, t.cnt,
             h.sgn * c.cell AS e
      FROM topk t
      JOIN hashed h ON h.term = t.term
      JOIN cells c ON c.j = h.j AND c.b = h.b
    )
    SELECT term, CAST(ANY_VALUE(cnt) AS BIGINT) AS exact_cnt,
           CAST(list_sort(list(e))[{(_CSK_D + 1) // 2}] AS BIGINT)
             AS est_median,
           CAST(list_sort(list(e))[{(_CSK_D + 1) // 2}] AS BIGINT)
             - CAST(ANY_VALUE(cnt) AS BIGINT) AS err
    FROM est GROUP BY term
    """,
)
def q371_count_sketch(spark, sf_dir):
    """COUNT-SKETCH frequency estimation (Charikar-Chen-Farach-Colton
    2002): a 3 x 64 SIGNED sketch whose per-row estimate
    is sign(t,j) * cell(j, b(t,j)) and whose point estimate is the
    MEDIAN across rows - the two-sided-error companion to q302's
    Count-Min (whose collisions only ever INFLATE): random signs make
    colliding mass cancel in expectation, so Count-Sketch also
    estimates the non-head accurately and underpins every
    feature-hashing trick (q344 is its one-row special case).

    Exactness: both hash families are the cross-engine md5-60bit
    device; cells are bigint signed sums (order-free); the median of
    3 integers is an array-sort pick. err is two-sided by
    design - pinned (vs CMS's one-sided) in pytest.

    Scale: the sketch builds from the term CENSUS (one corpus
    explode+groupBy), expands |vocab| x 3 rows, and collapses
    to 192 mergeable cells - shard sketches merge by
    cell-wise sum exactly like q302/q256. Point queries join the
    top-15 frame against the cells by (row, bucket)."""
    docs = t(spark, sf_dir, "documents")
    census = (
        docs.select(F.explode(_tokens()).alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    rows_arr = F.array(*[F.lit(j) for j in range(_CSK_D)])
    hashed = transient_persist(
        census.select(
            "term",
            "cnt",
            F.explode(rows_arr).alias("j"),
        ).select(
            "term",
            "cnt",
            "j",
            (
                _h60(
                    F.concat_ws(
                        "", F.concat(F.col("j").cast("string"), F.lit(":"), F.col("term"))
                    )
                )
                % _CSK_W
            ).alias("b"),
            F.when(
                _h60(
                    F.concat(
                        F.lit("s"),
                        F.col("j").cast("string"),
                        F.lit(":"),
                        F.col("term"),
                    )
                )
                % 2
                == 0,
                1,
            )
            .otherwise(-1)
            .alias("sgn"),
        )
    )
    cells = hashed.groupBy("j", "b").agg(
        F.sum(F.col("sgn") * F.col("cnt")).cast("long").alias("cell")
    )
    topk = (
        census.orderBy(F.col("cnt").desc(), "term")
        .limit(_CSK_TOPK)
        .select("term", "cnt")
    )
    est = (
        topk.join(hashed.select("term", "j", "b", "sgn"), "term")
        .join(cells, ["j", "b"])
        .select("term", "cnt", (F.col("sgn") * F.col("cell")).alias("e"))
    )
    mid = (_CSK_D + 1) // 2  # 1-based middle for odd D
    return est.groupBy("term").agg(
        F.first("cnt").cast("long").alias("exact_cnt"),
        F.element_at(F.sort_array(F.collect_list("e")), mid)
        .cast("long")
        .alias("est_median"),
        (
            F.element_at(F.sort_array(F.collect_list("e")), mid)
            - F.first("cnt")
        )
        .cast("long")
        .alias("err"),
    )
