"""Training-data preparation suite over ``documents`` - the operators a
large-scale LLM data pipeline runs between raw crawl and tokenizer:
deterministic splits, repetition/quality filters, PII redaction,
stratified sampling, corpus n-gram stats.

All plans are native column expressions plus at most one explode and
one hash aggregate - map-side combinable, no Python in the hot path,
and every shuffle is keyed on doc_id or a token (never on full text).
At 100 TB each of these runs as a scan + one shuffle, and the
regex/hash work rides whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from .common import t, t_split, transient_persist
from .registry import query
from .textops import (
    _SCORE_SPARK_SQL,
    _SCORE_SQL,
    _STOPWORDS,
    _TOKENS_SQL,
    _tokens,
)

#: cross-engine 60-bit hash bridge (plans/registry.py): Spark
#: conv(substr(md5(x),1,15),16,10) == DuckDB CAST('0x'||substr(md5(x),1,15) AS BIGINT)


def _h60(col):
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _h60_sql(expr: str) -> str:
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


def _h60_sql_ns(expr: str) -> str:
    """NULL-propagating spelling of :func:`_h60_sql`. DuckDB's
    ``concat()`` SKIPS NULL arguments, so ``concat('0x', NULL)`` is
    the string ``'0x'`` - a conversion error under the CAST (or a
    phantom zero key) - while Spark's concat/F.conv return NULL.
    ``||`` propagates NULL identically on both engines. Use this
    whenever the hashed expression's domain includes NULL (the r13
    partial-records census: q33/q181/q313/q342 hash nullable
    text/source/canon). The concat spelling stays in the ~65 oracles
    hashing non-null keys - identical semantics there, and respelling
    the shared fragment would churn every consumer's oracle_hash for
    no behavioral difference."""
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


# ---------------------------------------------------------------------------
# q79: deterministic train/validation/test hash split
# ---------------------------------------------------------------------------


@query(
    "q79_hash_split",
    oracle=f"""
    WITH b AS (
      SELECT doc_id,
             {_h60_sql("CAST(doc_id AS VARCHAR)")} % 100 AS bucket
      FROM documents
    )
    SELECT doc_id, bucket,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'validation'
                ELSE 'test' END AS split
    FROM b
    """,
)
def q79_hash_split(spark, sf_dir):
    """Deterministic 80/10/10 train/validation/test assignment by
    hashing the stable doc_id into 100 buckets. Hash-based (not
    random()) so the split is reproducible across runs, engines and
    re-partitioning - the property a training pipeline actually needs.
    Pure map stage: no shuffle, no state, trivially 100 TB-safe."""
    docs = t(spark, sf_dir, "documents")
    bucket = F.pmod(_h60(F.col("doc_id").cast("string")), F.lit(100))
    return docs.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < 80, "train")
        .when(bucket < 90, "validation")
        .otherwise("test")
        .alias("split"),
    )


# ---------------------------------------------------------------------------
# q80: repetition ratios (Gopher-style quality signals)
# ---------------------------------------------------------------------------


@query(
    "q80_repetition_ratio",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKENS_SQL}) AS term FROM documents
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
    )
    SELECT doc_id,
           CAST(SUM(tf) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(MAX(tf) AS BIGINT) AS top_tf,
           ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(tf), 4) AS distinct_ratio,
           ROUND(CAST(MAX(tf) AS DOUBLE) / SUM(tf), 4) AS top_token_frac
    FROM tf GROUP BY doc_id
    """,
)
def q80_repetition_ratio(spark, sf_dir):
    """Word-level repetition signals (the Gopher/MassiveText repetition
    rules): distinct-token ratio and most-frequent-token fraction per
    document. Low distinct_ratio or high top_token_frac flags boiler-
    plate and degenerate pages before they reach the tokenizer.

    Plan: explode once, two stacked hash aggregates both keyed on
    doc_id (the second reuses the first's partitioning - no extra
    shuffle). Per-token tf never leaves the executor un-combined."""
    docs = t(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(_tokens()).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    return (
        tf.groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.count("*").cast("long").alias("n_distinct"),
            F.max("tf").cast("long").alias("top_tf"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_distinct",
            "top_tf",
            F.round(F.col("n_distinct") / F.col("n_tokens"), 4).alias(
                "distinct_ratio"
            ),
            F.round(F.col("top_tf") / F.col("n_tokens"), 4).alias(
                "top_token_frac"
            ),
        )
    )


# ---------------------------------------------------------------------------
# q81: PII detection + redaction
# ---------------------------------------------------------------------------

#: The synthetic corpus is clean word soup, so PII is injected
#: deterministically (doc_id-derived email + phone appended to the
#: text) IDENTICALLY on both engines; the operator under test is the
#: regex detect/redact pass, which is exactly what runs on real data.
_EMAIL_RE = "[a-z0-9.]+@[a-z0-9.]+\\.[a-z]+"
_PHONE_RE = "\\+1-555-[0-9]{4}"


@query(
    "q81_pii_redaction",
    oracle=f"""
    WITH raw AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or +1-555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS s
      FROM documents
    ),
    red AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(s, '{_EMAIL_RE}')) AS BIGINT)
               AS n_emails,
             CAST(len(regexp_extract_all(s, '{_PHONE_RE}')) AS BIGINT)
               AS n_phones,
             regexp_replace(regexp_replace(s, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                            '{_PHONE_RE}', '<PHONE>', 'g') AS redacted
      FROM raw
    )
    SELECT doc_id, n_emails, n_phones, md5(redacted) AS redacted_fp
    FROM red
    """,
)
def q81_pii_redaction(spark, sf_dir):
    """PII scrubbing: count and mask email/phone matches. Emits a
    fingerprint of the redacted text (not the text itself) so the
    oracle compares full redaction output without shipping documents
    through the driver. Map-only: regex runs in codegen, no shuffle."""
    docs = t(spark, sf_dir, "documents")
    s = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad(F.pmod(F.col("doc_id"), F.lit(10000)).cast("string"), 4, "0"),
    )
    raw = docs.select("doc_id", s.alias("s"))
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("s"), _EMAIL_RE, "<EMAIL>"),
        _PHONE_RE,
        "<PHONE>",
    )
    return raw.select(
        "doc_id",
        F.regexp_count(F.col("s"), F.lit(_EMAIL_RE)).cast("long").alias(
            "n_emails"
        ),
        F.regexp_count(F.col("s"), F.lit(_PHONE_RE)).cast("long").alias(
            "n_phones"
        ),
        F.md5(redacted).alias("redacted_fp"),
    )


# ---------------------------------------------------------------------------
# q82: stratified deterministic sampling
# ---------------------------------------------------------------------------

#: sample fraction 1/10 kept as an exact integer ratio: the stratum
#: quota ceil(n/10) is computed as (n + 9) DIV 10 on BOTH engines, so
#: no float ceil(0.1 * n) can round a hair above an exact multiple of
#: ten on one engine build and not the other (the q230 tie class).
_SAMPLE_DEN = 10


@query(
    "q82_stratified_sample",
    oracle=f"""
    WITH r AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY {_h60_sql("CAST(doc_id AS VARCHAR)")}, doc_id
             ) AS rk,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM documents
    )
    SELECT doc_id, lang, CAST(rk AS BIGINT) AS rk
    FROM r WHERE rk <= (n + {_SAMPLE_DEN - 1}) // {_SAMPLE_DEN}
    """,
)
def q82_stratified_sample(spark, sf_dir):
    """Stratified 10% sample with equal representation per ``lang``
    stratum: rank documents inside each stratum by a doc_id hash
    (deterministic, engine-independent shuffle order) and keep the
    first ceil(frac*n). Unlike df.sample(), re-runs and engine swaps
    select the SAME rows - required for reproducible eval sets.

    Plan: one shuffle on lang (the window), no global sort. Skewed
    strata (one dominant language) would salt the rank the same way
    q67 salts its group-by."""
    docs = t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        _h60(F.col("doc_id").cast("string")), "doc_id"
    )
    wn = Window.partitionBy("lang")
    return (
        docs.select(
            "doc_id",
            "lang",
            F.row_number().over(w).alias("rk"),
            F.count("*").over(wn).alias("n"),
        )
        .filter(F.col("rk") <= F.expr(f"(n + {_SAMPLE_DEN - 1}) DIV {_SAMPLE_DEN}"))
        .select("doc_id", "lang", F.col("rk").cast("long").alias("rk"))
    )


# ---------------------------------------------------------------------------
# q83: corpus-level top bigrams
# ---------------------------------------------------------------------------


@query(
    "q83_top_bigrams",
    oracle=f"""
    WITH base AS (SELECT {_TOKENS_SQL} AS toks FROM documents),
    bg AS (
      SELECT unnest(list_transform(
               list_zip(list_slice(toks, 1, len(toks) - 1),
                        list_slice(toks, 2, len(toks))),
               z -> z[1] || ' ' || z[2])) AS bigram
      FROM base
    )
    SELECT bigram, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM bg GROUP BY bigram
    ORDER BY cnt DESC, bigram LIMIT 20
    """,
)
def q83_top_bigrams(spark, sf_dir):
    """Corpus-wide top-20 word bigrams - the n-gram frequency profile
    used for contamination checks and tokenizer diagnostics.

    Plan: bigrams come from zipping the token array against itself
    shifted by one (two slices, trivial-lambda zip_with - cheap enough
    for the interpreted HOF path since the body is a single concat),
    then explode + hash aggregate with map-side combine, then a 20-row
    TakeOrderedAndProject. The only shuffle carries (bigram, partial
    count) pairs."""
    docs = t(spark, sf_dir, "documents")
    bigrams = F.expr(
        "zip_with(slice(toks, 1, greatest(size(toks)-1, 0)),"
        "         slice(toks, 2, greatest(size(toks)-1, 0)),"
        "         (a, b) -> concat(a, ' ', b))"
    )
    return (
        docs.select(_tokens().alias("toks"))
        .select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").cast("long").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "bigram")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q84: composite quality filter (C4/Gopher-style keep/drop decision)
# ---------------------------------------------------------------------------

_STOPWORDS_SQL = "('the','a','of','and','to','in','is','it','for','on')"
_MIN_TOKENS, _MAX_TOKENS = 20, 80
_MIN_DISTINCT_RATIO = 0.4
_MIN_STOPWORD_RATIO = 0.02


@query(
    "q84_quality_filter",
    oracle=f"""
    WITH x AS (
      SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents
    ),
    f AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
             CAST(len(list_filter(toks, t -> t IN {_STOPWORDS_SQL}))
                  AS BIGINT) AS n_stop
      FROM x
    ),
    flags AS (
      SELECT doc_id, n_tokens,
             (n_tokens BETWEEN {_MIN_TOKENS} AND {_MAX_TOKENS}) AS pass_len,
             (CAST(n_distinct AS DOUBLE) / n_tokens
                >= {_MIN_DISTINCT_RATIO}) AS pass_rep,
             (CAST(n_stop AS DOUBLE) / n_tokens
                >= {_MIN_STOPWORD_RATIO}) AS pass_stop
      FROM f
    )
    -- a NULL-text record gets DECIDED, not NULL-flagged: a cleaning
    -- pass cannot keep a document with no text (r13 partial-records
    -- census; also keeps the flag columns non-null booleans)
    SELECT doc_id, n_tokens,
           COALESCE(pass_len, FALSE) AS pass_len,
           COALESCE(pass_rep, FALSE) AS pass_rep,
           COALESCE(pass_stop, FALSE) AS pass_stop,
           COALESCE(pass_len AND pass_rep AND pass_stop, FALSE) AS kept
    FROM flags
    """,
)
def q84_quality_filter(spark, sf_dir):
    """The keep/drop decision a C4/Gopher-style cleaning pass makes,
    with per-rule flags retained for filter-rate telemetry: length
    window, distinct-token ratio (repetition), minimum stopword ratio
    (natural-language-ness). Thresholds are corpus-calibrated constants;
    the operator's value is the auditable flag vector, not the numbers.

    Map-only: the token array is computed once per row and all three
    rules read it in the same projection - no explode, no shuffle."""
    docs = t(spark, sf_dir, "documents")
    toks = _tokens()
    f = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.size(F.filter(toks, lambda c: c.isin("the", "a", "of", "and", "to",
                                               "in", "is", "it", "for", "on")))
        .cast("long")
        .alias("n_stop"),
    )
    pass_len = F.col("n_tokens").between(_MIN_TOKENS, _MAX_TOKENS)
    pass_rep = (
        F.col("n_distinct") / F.col("n_tokens") >= _MIN_DISTINCT_RATIO
    )
    pass_stop = (
        F.col("n_stop") / F.col("n_tokens") >= _MIN_STOPWORD_RATIO
    )
    # COALESCE(flag, FALSE): a NULL-text record is DECIDED (dropped),
    # mirroring the oracle (r13 partial-records census)
    return f.select(
        "doc_id",
        "n_tokens",
        F.coalesce(pass_len, F.lit(False)).alias("pass_len"),
        F.coalesce(pass_rep, F.lit(False)).alias("pass_rep"),
        F.coalesce(pass_stop, F.lit(False)).alias("pass_stop"),
        F.coalesce(
            pass_len & pass_rep & pass_stop, F.lit(False)
        ).alias("kept"),
    )


# ---------------------------------------------------------------------------
# q86: sequence packing (concat-then-chunk)
# ---------------------------------------------------------------------------

#: fixed training sequence length (tokens per chunk).
_SEQ_LEN = 512
#: independent packing streams; at cluster scale each shard packs its
#: own token stream so no global ordering/shuffle is ever required.
_PACK_SHARDS = 8


@query(
    "q86_sequence_packing",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id,
             len({_TOKENS_SQL}) AS n_tokens,
             {_h60_sql("CAST(doc_id AS VARCHAR)")} % {_PACK_SHARDS} AS shard
      FROM documents
    ),
    c AS (
      SELECT doc_id, shard, n_tokens,
             CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id)
                  AS BIGINT) AS cum
      FROM tk
    ),
    s AS (SELECT doc_id, shard, cum - n_tokens AS st, cum FROM c),
    e AS (
      SELECT doc_id, shard, st, cum,
             unnest(range(st // {_SEQ_LEN}, (cum - 1) // {_SEQ_LEN} + 1))
               AS chunk_id
      FROM s
    )
    SELECT CAST(shard AS BIGINT) AS shard, doc_id,
           CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(greatest(st, chunk_id * {_SEQ_LEN})
                - chunk_id * {_SEQ_LEN} AS BIGINT) AS tok_start,
           CAST(least(cum, (chunk_id + 1) * {_SEQ_LEN})
                - chunk_id * {_SEQ_LEN} AS BIGINT) AS tok_end
    FROM e
    """,
)
def q86_sequence_packing(spark, sf_dir):
    """GPT-style sequence packing: concatenate each shard's token
    stream in doc_id order and slice it into fixed ``_SEQ_LEN`` chunks,
    emitting one row per (document, chunk) overlap with the in-chunk
    token offsets. This is the concat-then-chunk packing used for
    pretraining batches (documents straddle chunk boundaries; nothing
    is padded or dropped).

    Scale shape: hash-sharded packing streams - the cumulative sum is
    a window per shard (one shuffle on shard), never a global order.
    The boundary-straddle fan-out uses sequence() + explode, bounded by
    doc length / seq_len + 1 rows per document."""
    docs = t(spark, sf_dir, "documents")
    shard = F.pmod(_h60(F.col("doc_id").cast("string")), F.lit(_PACK_SHARDS))
    tk = docs.select(
        "doc_id",
        F.size(_tokens()).cast("long").alias("n_tokens"),
        shard.alias("shard"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s = tk.select(
        "doc_id",
        "shard",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("st"),
        F.sum("n_tokens").over(w).alias("cum"),
    )
    e = s.select(
        "doc_id",
        "shard",
        "st",
        "cum",
        F.explode(
            F.sequence(
                F.expr(f"st DIV {_SEQ_LEN}"),
                F.expr(f"(cum - 1) DIV {_SEQ_LEN}"),
            )
        ).alias("chunk_id"),
    )
    lo = F.col("chunk_id") * _SEQ_LEN
    return e.select(
        F.col("shard").cast("long").alias("shard"),
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        (F.greatest(F.col("st"), lo) - lo).cast("long").alias("tok_start"),
        (F.least(F.col("cum"), lo + _SEQ_LEN) - lo)
        .cast("long")
        .alias("tok_end"),
    )


# ---------------------------------------------------------------------------
# q87: train/test contamination check (shared-shingle overlap)
# ---------------------------------------------------------------------------


@query(
    "q87_contamination_check",
    oracle=f"""
    WITH split AS (
      SELECT doc_id, text,
             {_h60_sql("CAST(doc_id AS VARCHAR)")} % 100 AS bucket
      FROM documents
    ),
    sh AS (
      SELECT doc_id, bucket,
             {_h60_sql("sh_list")} AS h
      FROM (SELECT doc_id, bucket,
                   unnest(list_distinct(
                     list_transform(
                       range(1, greatest(len({_TOKENS_SQL}) - 2, 0) + 1),
                       i -> array_to_string(
                              list_slice({_TOKENS_SQL}, i, i + 2), ' '))))
                     AS sh_list
            FROM split)
    ),
    train AS (SELECT DISTINCT h FROM sh WHERE bucket < 80),
    test AS (SELECT doc_id, h FROM sh WHERE bucket >= 90)
    SELECT test.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(COUNT(train.h) AS BIGINT) AS n_overlap,
           ROUND(CAST(COUNT(train.h) AS DOUBLE) / COUNT(*), 4)
             AS contamination_rate
    FROM test LEFT JOIN train ON test.h = train.h
    GROUP BY test.doc_id
    """,
)
def q87_contamination_check(spark, sf_dir):
    """Benchmark-contamination audit: for every held-out (test-split)
    document, the fraction of its distinct word-3-gram shingles that
    also appear anywhere in the train split. High overlap means the
    eval document leaks into training data - the standard n-gram
    decontamination signal (as used for GPT-3/C4 dataset audits).

    Plan: shingles explode ONCE - the split predicate (q79's hash
    buckets) is applied to doc_ids BEFORE the explode so the val split
    (buckets 80-89) is never shingled at all, and the exploded hash
    frame is persisted so the train and test branches share one
    physical pass instead of re-running the dominant explode+md5 stage
    per branch (measured 7.0 s -> ~4 s at sf0.1). What persists is
    3 longs per distinct shingle occurrence - no text. The train side
    then collapses to DISTINCT shingle hashes (bounded by corpus
    vocabulary, shuffled once), and the audit is a left equi-join on
    the 60-bit shingle hash + one doc_id aggregate. No text ever
    crosses the shuffle - only hashes."""
    from .dedup import _h64, _shingles

    docs = t_split(spark, sf_dir, "documents")
    bucket = F.pmod(_h60(F.col("doc_id").cast("string")), F.lit(100))
    sh = transient_persist(
        docs.withColumn("bucket", bucket)
        .filter((F.col("bucket") < 80) | (F.col("bucket") >= 90))
        .select(
            "doc_id",
            "bucket",
            F.explode(F.array_distinct(_shingles())).alias("s"),
        )
        .select("doc_id", "bucket", _h64(F.col("s")).alias("h"))
    )
    train = sh.filter(F.col("bucket") < 80).select("h").distinct()
    test = sh.filter(F.col("bucket") >= 90).select("doc_id", "h")
    joined = test.join(
        train.select(F.col("h").alias("th")),
        test["h"] == F.col("th"),
        "left",
    )
    return joined.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_shingles"),
        F.count("th").cast("long").alias("n_overlap"),
        F.round(F.count("th") / F.count("*"), 4).alias("contamination_rate"),
    )


# ---------------------------------------------------------------------------
# q104: unigram LM scoring (corpus-statistics perplexity proxy)
# ---------------------------------------------------------------------------


@query(
    "q104_unigram_lm_score",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKENS_SQL}) AS term FROM documents
    ),
    vocab AS (SELECT term, COUNT(*) AS tf FROM tok GROUP BY term),
    tot AS (SELECT SUM(tf) AS total FROM vocab)
    SELECT tok.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           ROUND(AVG(-ln(CAST(vocab.tf AS DOUBLE) / tot.total)), 6)
             AS avg_nll
    FROM tok JOIN vocab USING (term), tot
    GROUP BY tok.doc_id
    """,
)
def q104_unigram_lm_score(spark, sf_dir):
    """Unigram language-model scoring: train token frequencies over the
    corpus, then score every document by its average negative
    log-probability - the cheap perplexity proxy used to rank crawl
    text against a reference corpus before training.

    Scale: two passes over the exploded tokens - the vocab build
    (map-side-combined count) and a token->frequency join. Token
    frequency is Zipfian, so the join side is hot-key skewed at 100 TB;
    the deploy mitigation is broadcasting the head of the vocabulary
    (it is tiny and covers most mass) and shuffle-joining only the
    tail - same two-phase split as q67's salted aggregation. Here the
    full vocab rides one ordinary join; AQE's skew-join split handles
    the head. The corpus token total is a 1-row ``agg(sum)`` broadcast
    back over the vocabulary - NOT a ``Window.partitionBy()`` sum,
    which would move the entire (Zipf-unbounded) vocabulary through a
    single-partition exchange (VERDICT r5 item 4)."""
    docs = t(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(_tokens()).alias("term"))
    vocab = tok.groupBy("term").agg(F.count("*").alias("tf"))
    total = vocab.agg(F.sum("tf").alias("total"))
    vocab = vocab.crossJoin(F.broadcast(total))
    nll = -F.log(F.col("tf").cast("double") / F.col("total"))
    return (
        tok.join(vocab, "term")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg(nll), 6).alias("avg_nll"),
        )
    )


# ---------------------------------------------------------------------------
# q105: deterministic weighted sampling (A-ES / exponential jitter)
# ---------------------------------------------------------------------------

_SAMPLE_K = 50


@query(
    "q105_weighted_sample",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             -ln(({_h60_sql("CAST(doc_id AS VARCHAR)")} + 1)
                 / 1152921504606846976.0) / NULLIF(n_chars, 0) AS k
      FROM documents
    )
    SELECT doc_id, CAST(n_chars AS BIGINT) AS weight, ROUND(k, 9) AS sort_key
    FROM keyed
    ORDER BY k NULLS LAST, doc_id LIMIT {_SAMPLE_K}
    """,
)
def q105_weighted_sample(spark, sf_dir):
    """Deterministic weighted sampling without replacement
    (Efraimidis-Spirakis via exponential jitter): each document draws
    u = hash(doc_id)/2^60 and sorts by -ln(u)/weight; the smallest K
    keys are a weighted sample where P(selected) tracks ``n_chars``.
    Deterministic - the "randomness" is the md5 bridge hash, identical
    in both engines - so the sample is reproducible run to run, which
    is what a training-data pipeline needs for auditability.

    Scale: a pure map stage (hash + ln per row) followed by
    TakeOrderedAndProject - top-K merges per partition, no global
    sort, no shuffle of the data itself."""
    docs = t(spark, sf_dir, "documents")
    u = (_h60(F.col("doc_id").cast("string")) + 1) / F.lit(
        float(1 << 60)
    )
    # NULLIF + NULLS LAST: a zero-weight (empty) document has an
    # undefined exponential-jitter key and must never displace a
    # positive-weight row from the sample; Spark's ASC default is
    # NULLS FIRST vs DuckDB's NULLS LAST, so the order is pinned
    # explicitly on both engines (r12 adversarial-text census).
    k = (-F.log(u)) / F.expr("NULLIF(n_chars, 0)")
    return (
        docs.select(
            "doc_id",
            F.col("n_chars").cast("long").alias("weight"),
            F.round(k, 9).alias("sort_key"),
            k.alias("_k"),
        )
        .orderBy(F.col("_k").asc_nulls_last(), "doc_id")
        .limit(_SAMPLE_K)
        .drop("_k")
    )


# ---------------------------------------------------------------------------
# q116: corpus drift audit (chi-square independence of source x lang)
# ---------------------------------------------------------------------------


@query(
    "q116_lang_source_drift",
    oracle="""
    WITH o AS (
      SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS obs
      FROM documents GROUP BY 1, 2
    ),
    -- margins via windows, not USING-joins: a NULL source/lang is a
    -- real contingency category (the "unknown" bucket every drift
    -- audit must keep) and an equi-join would drop its cells (r13
    -- partial-records census: 11 of 26 cells survived)
    m AS (
      SELECT source, lang, obs,
             SUM(obs) OVER (PARTITION BY source) AS rn,
             SUM(obs) OVER (PARTITION BY lang) AS cn,
             SUM(obs) OVER () AS n
      FROM o
    )
    SELECT source, lang, obs,
           ROUND(rn * cn / CAST(n AS DOUBLE), 6) AS expected,
           ROUND(POW(obs - rn * cn / CAST(n AS DOUBLE), 2)
                 / (rn * cn / CAST(n AS DOUBLE)), 6) AS chi2_term
    FROM m
    """,
)
def q116_lang_source_drift(spark, sf_dir):
    """Corpus composition audit: chi-square contribution of every
    (source, language) cell against the independence expectation - the
    drift detector that flags "this crawl source's language mix shifted"
    before the shift poisons a training run. Cells with large
    ``chi2_term`` are the anomalies; the full statistic is the sum.

    Scale: ONE aggregation over the fact table to the contingency cells
    (bounded by |sources| x |langs|), then all margins via windows over
    those cells - the fact table is never touched again, and the
    windows run over a table small enough to broadcast."""
    docs = t(spark, sf_dir, "documents")
    o = docs.groupBy("source", "lang").agg(F.count("*").alias("obs"))
    o = (
        o.withColumn("rn", F.sum("obs").over(Window.partitionBy("source")))
        .withColumn("cn", F.sum("obs").over(Window.partitionBy("lang")))
        .withColumn("n", F.sum("obs").over(Window.partitionBy()))
    )
    expected = F.col("rn") * F.col("cn") / F.col("n").cast("double")
    return o.select(
        "source",
        "lang",
        "obs",
        F.round(expected, 6).alias("expected"),
        F.round(
            F.pow(F.col("obs") - expected, 2) / expected, 6
        ).alias("chi2_term"),
    )


#: Misra-Gries counter budget per partition sketch (q151); the heavy
#: hitter threshold is total_tokens / _HH_K.
_HH_K = 50


@query(
    "q151_heavy_hitters",
    oracle=f"""
    WITH tok AS (
      SELECT unnest({{tokens}}) AS token FROM documents
    ), tot AS (
      SELECT COUNT(*) AS n FROM tok
    )
    SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM tok GROUP BY token
    HAVING COUNT(*) > (SELECT n FROM tot) / {_HH_K}.0
    """.format(tokens="string_split_regex(trim(lower(text)), '\\s+')"),
)
def q151_heavy_hitters(spark, sf_dir):
    """Exact corpus heavy hitters (tokens with frequency > n/K) found
    with bounded memory: per-partition Misra-Gries sketches generate a
    candidate superset, and one exact recount over the candidates
    yields the precise answer - the sketch-then-verify shape (same as
    the q141 bloom join) that computes frequent items at 100 TB
    without ever holding the full token histogram per task.

    Phase 1 is an Arrow-batched ``mapInPandas`` keeping at most K
    counters per partition (MG guarantees every true heavy hitter
    survives decrements - Misra & Gries 1982); phase 2 broadcasts the
    tiny candidate set, semi-joins the token stream against it, and
    recounts exactly. A plain groupBy(token) would shuffle the whole
    vocabulary; here the shuffle carries only candidate tokens. The
    driver never sees raw data - candidates stay a DataFrame."""
    docs = t_split(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+")
        ).alias("token")
    )

    k = _HH_K

    def mg_sketch(batches):
        # self-contained closure: cloudpickle ships it whole; no
        # module-global references (workers may not import the package)
        import pandas as pd

        counters: dict[str, int] = {}
        for pdf in batches:
            for tkn in pdf["token"]:
                if tkn in counters:
                    counters[tkn] += 1
                elif len(counters) < k:
                    counters[tkn] = 1
                else:
                    dead = [c for c in counters if counters[c] == 1]
                    for c in counters:
                        counters[c] -= 1
                    for c in dead:
                        del counters[c]
        yield pd.DataFrame({"token": list(counters.keys())})

    candidates = tok.mapInPandas(mg_sketch, "token string").distinct()
    total = tok.count()
    return (
        tok.join(F.broadcast(candidates), "token", "left_semi")
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") > F.lit(total) / F.lit(float(k)))
    )


# ---------------------------------------------------------------------------
# q180/q181: corpus boilerplate removal and mixture weighting
# ---------------------------------------------------------------------------

#: fixed-width token chunks standing in for "lines" (the synthetic
#: corpus has no newline structure); a chunk repeated across >= _BP_K
#: distinct docs is boilerplate (CCNet-style line dedup).
_CHUNK_W = 3
_BP_K = 3

#: Spark-SQL twin of textops._TOKENS_SQL (same tokenization, Spark
#: split syntax) for use inside F.expr strings.
_SPARK_TOKS = "split(trim(lower(text)), '\\\\s+')"

_CHUNKS_SQL = f"""
    toks AS (
      SELECT doc_id, {_TOKENS_SQL} AS tk FROM documents
    ),
    chunks AS (
      SELECT doc_id,
             array_to_string(
               list_slice(tk, i * {_CHUNK_W} + 1,
                          i * {_CHUNK_W} + {_CHUNK_W}), ' ') AS chunk
      FROM toks,
           unnest(range(0, (len(tk) + {_CHUNK_W - 1}) // {_CHUNK_W}))
             r(i)
    ),
    freq AS (
      SELECT chunk, COUNT(DISTINCT doc_id) AS nd FROM chunks
      GROUP BY chunk
    )
"""


@query(
    "q180_line_dedup",
    oracle="WITH "
    + _CHUNKS_SQL
    + f"""
    SELECT c.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN f.nd >= {_BP_K} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_boilerplate,
           ROUND(SUM(CASE WHEN f.nd < {_BP_K} THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 4) AS kept_ratio
    FROM chunks c JOIN freq f USING (chunk)
    GROUP BY c.doc_id
    """,
)
def q180_line_dedup(spark, sf_dir):
    """CCNet-style line-level dedup audit: segment every document into
    fixed-width token chunks (the corpus' stand-in for lines), count
    how many distinct documents each chunk appears in, and report per
    document how much of it is corpus-boilerplate (chunk shared by >=
    3 docs) vs kept. The actual filter step is this plan plus one
    array_join of the kept chunks - the audit IS the expensive part.

    Scale: the chunk relation is linear in corpus tokens and is
    persisted once (both the frequency pass and the join-back consume
    it - without the persist the scan + tokenize + chunk transform
    runs twice). The shuffle key is xxhash64(chunk), never the chunk
    TEXT: the output carries only per-doc aggregates, so the Spark
    side is free to narrow its shuffle to 8 bytes/chunk
    (collision-safe for counting at these cardinalities) while the
    DuckDB twin keeps counting by text - both sides produce identical
    doc-level numbers."""
    docs = t(spark, sf_dir, "documents")
    chunks = transient_persist(
        docs.select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, CAST((size({_SPARK_TOKS}) "
                    f"+ {_CHUNK_W - 1}) DIV {_CHUNK_W} AS INT) - 1), "
                    f"i -> array_join(slice({_SPARK_TOKS}, "
                    f"i * {_CHUNK_W} + 1, {_CHUNK_W}), ' '))"
                )
            ).alias("chunk_text"),
        ).select("doc_id", F.xxhash64("chunk_text").alias("chunk"))
    )
    freq = chunks.groupBy("chunk").agg(
        F.count_distinct("doc_id").alias("nd")
    )
    return (
        chunks.join(freq, "chunk")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum((F.col("nd") >= _BP_K).cast("long")).alias(
                "n_boilerplate"
            ),
            F.round(
                F.sum((F.col("nd") < _BP_K).cast("long"))
                / F.count("*").cast("double"),
                4,
            ).alias("kept_ratio"),
        )
    )


@query(
    "q181_mixture_weights",
    oracle=f"""
    WITH counts AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
      GROUP BY source
    ),
    tw AS (
      SELECT source, n_docs,
             1.0 + ({_h60_sql_ns("source")} % 5) AS raw_w
      FROM counts
    ),
    norm AS (
      SELECT source, n_docs,
             raw_w / SUM(raw_w) OVER () AS target_share,
             SUM(n_docs) OVER () AS total
      FROM tw
    )
    SELECT source, n_docs,
           ROUND(target_share, 6) AS target_share,
           ROUND(LEAST(1.0, target_share * total / n_docs), 6)
             AS accept_rate,
           CAST(ROUND(LEAST(1.0, target_share * total / n_docs)
                      * n_docs, 0) AS BIGINT) AS expected_kept
    FROM norm
    """,
)
def q181_mixture_weights(spark, sf_dir):
    """Training-mixture weighting: given a target share per source
    (deterministic weights standing in for the curated mixture a data
    team hands down), compute each source's downsampling acceptance
    rate and expected surviving docs - the planning step before a
    weighted-sample job (q105 executes the sampling side).

    Scale: one aggregate over the corpus (source cardinality is tiny),
    then window normalization over the per-source table - everything
    after the first shuffle is effectively free; the rates are then
    broadcast into the actual sampling pass."""
    docs = t(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    raw_w = (
        F.lit(1.0) + (_h60(F.col("source")) % 5).cast("double")
    ).alias("raw_w")
    w_all = Window.partitionBy()
    norm = counts.select("source", "n_docs", raw_w).select(
        "source",
        "n_docs",
        (F.col("raw_w") / F.sum("raw_w").over(w_all)).alias(
            "target_share"
        ),
        F.sum("n_docs").over(w_all).alias("total"),
    )
    rate = F.least(
        F.lit(1.0),
        F.col("target_share") * F.col("total") / F.col("n_docs"),
    )
    return norm.select(
        "source",
        "n_docs",
        F.round("target_share", 6).alias("target_share"),
        F.round(rate, 6).alias("accept_rate"),
        F.round(rate * F.col("n_docs"), 0)
        .cast("long")
        .alias("expected_kept"),
    )


# ---------------------------------------------------------------------------
# q281: bigram-LM perplexity terciles (CCNet-style quality triage)
# ---------------------------------------------------------------------------

#: DuckDB bigram list for a token array ``toks`` (q83's zip motif).
_BIGRAMS_SQL = (
    "list_transform("
    "list_zip(list_slice(toks, 1, len(toks) - 1),"
    "         list_slice(toks, 2, len(toks))),"
    " z -> z[1] || ' ' || z[2])"
)


@query(
    "q281_lm_perplexity_buckets",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, source, {_TOKENS_SQL} AS toks FROM documents
    ),
    db AS (
      SELECT doc_id, source, unnest({_BIGRAMS_SQL}) AS bigram FROM base
    ),
    bg AS (SELECT bigram, COUNT(*) AS c2 FROM db GROUP BY 1),
    ctx AS (
      SELECT string_split(bigram, ' ')[1] AS w1, SUM(c2) AS c1
      FROM bg GROUP BY 1
    ),
    v AS (
      SELECT COUNT(DISTINCT term) AS vocab
      FROM (SELECT unnest(toks) AS term FROM base)
    ),
    scored AS (
      SELECT db.doc_id, db.source,
             ROUND(AVG(-ln((bg.c2 + 1.0) / (ctx.c1 + v.vocab))), 6)
               AS avg_nll
      FROM db
      JOIN bg USING (bigram)
      JOIN ctx ON string_split(db.bigram, ' ')[1] = ctx.w1,
      v
      GROUP BY 1, 2
    ),
    bucketed AS (
      SELECT source,
             NTILE(3) OVER (ORDER BY avg_nll, doc_id) AS bucket
      FROM scored
    )
    SELECT source, CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM bucketed
    GROUP BY 1, 2
    """,
)
def q281_lm_perplexity_buckets(spark, sf_dir):
    """CCNet-STYLE perplexity triage (Wenzek et al. 2020): score every
    document with a corpus-trained bigram language model (add-one
    smoothing, P(w2|w1) = (C(w1 w2)+1)/(C(w1)+V)), then split the
    corpus into head/middle/tail TERCILES of average negative
    log-likelihood and report each source's composition - the triage
    CCNet runs with a KenLM 5-gram before keeping only the
    low-perplexity head for training. Counts, contexts, and V are all
    integers, so the smoothed probability is the identical float
    expression in both engines.

    Scale: bigram and context counts are explode + map-side-combined
    hash aggregates partitioned by n-gram key; scoring joins each
    document's bigram instances against those tables ON the n-gram key
    (never broadcastable at corpus scale, and never needs to be); the
    per-doc fold shuffles (doc_id, partial sums); the tercile split is
    the two-pass range-partitioned global_ntile, not a
    single-partition window."""
    from .common import global_ntile

    base = t_split(spark, sf_dir, "documents").select(
        "doc_id", "source", _tokens().alias("toks")
    )
    bigrams = F.expr(
        "zip_with(slice(toks, 1, greatest(size(toks)-1, 0)),"
        "         slice(toks, 2, greatest(size(toks)-1, 0)),"
        "         (a, b) -> concat(a, ' ', b))"
    )
    db = transient_persist(
        base.select("doc_id", "source", F.explode(bigrams).alias("bigram"))
    )
    bg = db.groupBy("bigram").agg(F.count("*").alias("c2"))
    ctx = bg.groupBy(
        F.split(F.col("bigram"), " ").getItem(0).alias("w1")
    ).agg(F.sum("c2").alias("c1"))
    vocab = base.select(F.explode("toks").alias("term")).agg(
        F.countDistinct("term").alias("vocab")
    )
    nll = -F.log(
        (F.col("c2") + 1.0) / (F.col("c1") + F.col("vocab"))
    )
    # The smoothed NLL is a property of the bigram TYPE, so it is
    # assembled on the type-sized tables first (bg JOIN ctx is a
    # vocabulary-bounded shuffle) and the corpus-sized instance table
    # joins ONCE on the n-gram key (optimization r14, guide sections
    # 2.3/2.4). The old plan shuffled every scored instance twice -
    # once onto bg, then AGAIN on the derived w1 key carrying c2 -
    # before the per-doc fold; the instance table now moves through
    # exactly two exchanges (type join, doc fold). Same per-instance
    # NLL values, same per-doc multiset, same 6dp-rounded average.
    typ = (
        bg.select(
            "bigram",
            F.split(F.col("bigram"), " ").getItem(0).alias("w1"),
            "c2",
        )
        .join(ctx, "w1")
        .crossJoin(F.broadcast(vocab))
        .select("bigram", nll.alias("nll"))
    )
    scored = (
        db.join(typ, "bigram")
        .groupBy("doc_id", "source")
        .agg(F.round(F.avg("nll"), 6).alias("avg_nll"))
    )
    bucketed = global_ntile(
        scored, [F.asc("avg_nll"), F.asc("doc_id")], 3, "bucket"
    )
    return bucketed.groupBy(
        "source", F.col("bucket").cast("long").alias("bucket")
    ).agg(F.count("*").cast("long").alias("n_docs"))


# ---------------------------------------------------------------------------
# q285: Cohen's kappa between the two quality gates
# ---------------------------------------------------------------------------

#: q214's gate parameters, re-stated here so the two raters are frozen
#: even if the source queries evolve.
_KAPPA_PCT = 0.75


@query(
    "q285_gate_agreement_kappa",
    oracle=f"""
    WITH x AS (
      SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents
    ),
    a AS (
      SELECT doc_id,
             (len(toks) BETWEEN {_MIN_TOKENS} AND {_MAX_TOKENS}
              AND CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
                    >= {_MIN_DISTINCT_RATIO}
              AND CAST(len(list_filter(toks, t -> t IN {_STOPWORDS_SQL}))
                       AS DOUBLE) / len(toks)
                    >= {_MIN_STOPWORD_RATIO}) AS keep_a
      FROM x
    ),
    s AS (
      SELECT doc_id,
             CAST({_SCORE_SQL} AS BIGINT) AS score
      FROM documents
    ),
    cut AS (
      SELECT quantile_cont(CAST(score AS DOUBLE), {_KAPPA_PCT}) AS cutoff
      FROM s
    ),
    b AS (SELECT s.doc_id, (s.score > cut.cutoff) AS keep_b FROM s, cut),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN keep_a AND keep_b THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_both,
             CAST(SUM(CASE WHEN keep_a AND NOT keep_b THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_only_a,
             CAST(SUM(CASE WHEN NOT keep_a AND keep_b THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_only_b,
             CAST(SUM(CASE WHEN NOT keep_a AND NOT keep_b THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_neither
      FROM a JOIN b USING (doc_id)
    )
    SELECT n, n_both, n_only_a, n_only_b, n_neither,
           ROUND(CAST(n_both + n_neither AS DOUBLE) / n, 6) AS po,
           ROUND((CAST(n_both + n_only_a AS DOUBLE) * (n_both + n_only_b)
                  + CAST(n_only_b + n_neither AS DOUBLE)
                    * (n_only_a + n_neither))
                 / (CAST(n AS DOUBLE) * n), 6) AS pe,
           ROUND((CAST(n_both + n_neither AS DOUBLE) / n
                  - (CAST(n_both + n_only_a AS DOUBLE) * (n_both + n_only_b)
                     + CAST(n_only_b + n_neither AS DOUBLE)
                       * (n_only_a + n_neither))
                    / (CAST(n AS DOUBLE) * n))
                 / (1.0
                    - (CAST(n_both + n_only_a AS DOUBLE) * (n_both + n_only_b)
                       + CAST(n_only_b + n_neither AS DOUBLE)
                         * (n_only_a + n_neither))
                      / (CAST(n AS DOUBLE) * n)), 6) AS kappa
    FROM m
    """,
)
def q285_gate_agreement_kappa(spark, sf_dir):
    """COHEN'S KAPPA between the suite's two independent quality
    raters: the C4/Gopher rule gate (q84's keep decision) and the
    corpus-relative percentile gate (q214's score > p75%
    cutoff) - chance-corrected agreement, the metric annotation/eval
    ops reports where raw percent-agreement misleads (two gates that
    both keep 90% agree 81% by luck alone). Complements q266, which
    scores the dedup systems' agreement as precision/recall/F1.

    Scale: both raters are map-stage predicates over one documents
    scan (the percentile cutoff is a 1-row mergeable aggregate
    broadcast back); the contingency table is a single 4-counter
    aggregate, and kappa is driver-free arithmetic on its one row.
    Counts are integers, so po/pe/kappa are identical float
    expressions in both engines."""
    from .textops import _int_score

    docs = t(spark, sf_dir, "documents")
    toks = _tokens()
    a = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.size(F.filter(toks, lambda c: c.isin(*_STOPWORDS)))
        .cast("long")
        .alias("n_stop"),
        _int_score().alias("score"),
    )
    keep_a = (
        F.col("n_tokens").between(_MIN_TOKENS, _MAX_TOKENS)
        & (F.col("n_distinct") / F.col("n_tokens") >= _MIN_DISTINCT_RATIO)
        & (F.col("n_stop") / F.col("n_tokens") >= _MIN_STOPWORD_RATIO)
    )
    cut = a.agg(
        F.percentile(F.col("score").cast("double"), _KAPPA_PCT).alias(
            "cutoff"
        )
    )
    flags = a.crossJoin(F.broadcast(cut)).select(
        keep_a.alias("keep_a"), (F.col("score") > F.col("cutoff")).alias("keep_b")
    )
    m = flags.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("keep_a") & F.col("keep_b"), 1).otherwise(0))
        .cast("long")
        .alias("n_both"),
        F.sum(F.when(F.col("keep_a") & ~F.col("keep_b"), 1).otherwise(0))
        .cast("long")
        .alias("n_only_a"),
        F.sum(F.when(~F.col("keep_a") & F.col("keep_b"), 1).otherwise(0))
        .cast("long")
        .alias("n_only_b"),
        F.sum(F.when(~F.col("keep_a") & ~F.col("keep_b"), 1).otherwise(0))
        .cast("long")
        .alias("n_neither"),
    )
    po = (F.col("n_both") + F.col("n_neither")).cast("double") / F.col("n")
    pe = (
        (F.col("n_both") + F.col("n_only_a")).cast("double")
        * (F.col("n_both") + F.col("n_only_b"))
        + (F.col("n_only_b") + F.col("n_neither")).cast("double")
        * (F.col("n_only_a") + F.col("n_neither"))
    ) / (F.col("n").cast("double") * F.col("n"))
    return m.select(
        "n",
        "n_both",
        "n_only_a",
        "n_only_b",
        "n_neither",
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.round((po - pe) / (1.0 - pe), 6).alias("kappa"),
    )


# ---------------------------------------------------------------------------
# q290: max-sequence-length truncation sweep
# ---------------------------------------------------------------------------

#: candidate context lengths swept (tokens); the suite's documents run
#: ~20-80 whitespace tokens, so the grid brackets the distribution.
_TRUNC_LENS = (16, 32, 64, 128)


@query(
    "q290_truncation_sweep",
    oracle=f"""
    WITH dl AS (
      SELECT doc_id, CAST(len({_TOKENS_SQL}) AS BIGINT) AS n FROM documents
    ),
    lens(max_len) AS (VALUES {", ".join(f"({n})" for n in _TRUNC_LENS)})
    SELECT CAST(lens.max_len AS BIGINT) AS max_len,
           CAST(SUM(CASE WHEN dl.n > lens.max_len THEN 1 ELSE 0 END)
                AS BIGINT) AS n_truncated,
           CAST(SUM(LEAST(dl.n, lens.max_len)) AS BIGINT) AS tokens_kept,
           CAST(SUM(GREATEST(dl.n - lens.max_len, 0)) AS BIGINT)
             AS tokens_lost,
           ROUND(CAST(SUM(GREATEST(dl.n - lens.max_len, 0)) AS DOUBLE)
                 / SUM(dl.n), 6) AS loss_share,
           ROUND(CAST(SUM(LEAST(dl.n, lens.max_len)) AS DOUBLE)
                 / (COUNT(*) * lens.max_len), 6) AS fill_ratio
    FROM dl CROSS JOIN lens
    GROUP BY lens.max_len
    """,
)
def q290_truncation_sweep(spark, sf_dir):
    """MAX-SEQUENCE-LENGTH sweep: for each candidate context length,
    how many documents truncate, how many tokens survive vs fall off,
    the corpus token-loss share, and the context fill ratio if each
    doc occupied one sequence - the two-sided waste curve (short
    max_len loses tail tokens, long max_len pads air) that picks a
    training max_seq_len BEFORE committing to tokenize-and-pack
    (q86's packing then works within the chosen budget).

    Scale: per-doc length is one map stage; the sweep is a cross join
    against a {len(_TRUNC_LENS)}-row literal frame (bounded broadcast
    multiplication, the q175 coverage-targets shape) folding into a
    {len(_TRUNC_LENS)}-row aggregate. Integer-exact throughout; the
    two ratios are single divisions."""
    dl = t_split(spark, sf_dir, "documents").select(
        F.size(_tokens()).cast("long").alias("n")
    )
    lens = spark.createDataFrame(
        [(n,) for n in _TRUNC_LENS], "max_len long"
    )
    j = dl.crossJoin(F.broadcast(lens))
    kept = F.sum(F.least(F.col("n"), F.col("max_len")))
    lost = F.sum(F.greatest(F.col("n") - F.col("max_len"), F.lit(0)))
    return j.groupBy("max_len").agg(
        F.sum(F.when(F.col("n") > F.col("max_len"), 1).otherwise(0))
        .cast("long")
        .alias("n_truncated"),
        kept.cast("long").alias("tokens_kept"),
        lost.cast("long").alias("tokens_lost"),
        F.round(lost.cast("double") / F.sum("n"), 6).alias("loss_share"),
        F.round(
            kept.cast("double") / (F.count("*") * F.col("max_len")), 6
        ).alias("fill_ratio"),
    )


# ---------------------------------------------------------------------------
# q292: cross-source LM transfer matrix
# ---------------------------------------------------------------------------


@query(
    "q292_source_transfer_matrix",
    oracle=f"""
    WITH tt AS (
      SELECT source, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM (SELECT source, unnest({_TOKENS_SQL}) AS term FROM documents)
      GROUP BY 1, 2
    ),
    totals AS (SELECT source, SUM(tf) AS n FROM tt GROUP BY 1),
    v AS (SELECT COUNT(DISTINCT term) AS vocab FROM tt),
    matched AS (
      SELECT e.source AS src_eval, tr.source AS src_train,
             SUM(e.tf * ln(CAST(tr.tf + 1 AS DOUBLE))) AS m
      FROM tt e JOIN tt tr USING (term)
      GROUP BY 1, 2
    )
    SELECT m.src_eval, m.src_train,
           ROUND(ln(CAST(t_tr.n + v.vocab AS DOUBLE))
                 - m.m / t_ev.n, 4) AS cross_entropy
    FROM matched m
    JOIN totals t_ev ON t_ev.source = m.src_eval
    JOIN totals t_tr ON t_tr.source = m.src_train, v
    """,
)
def q292_source_transfer_matrix(spark, sf_dir):
    """CROSS-SOURCE LM TRANSFER MATRIX: train an add-one-smoothed
    unigram LM on each source, evaluate every source's cross-entropy
    under every other source's LM - the |S| x |S| "train on A, how
    surprised is B" map that data-mixing work reads to find redundant
    sources (low off-diagonal), islands (high everywhere), and
    transfer direction before committing mixture weights (the matrix
    view of what q226's DSIR scores pointwise). Add-one smoothing
    folds algebraically to matched terms only:
    H(e,t) = ln(N_t + V) - (1/N_e) * sum_matched tf_e * ln(tf_t + 1),
    so unseen-term handling costs NOTHING - no full vocab x source
    cross join, just the natural term-keyed equi-join.

    Scale: the per-(source, term) table is one explode + hash
    aggregate; the transfer sum is a self-join ON TERM whose output is
    bounded by |S|^2 per term (source count is bounded at any corpus
    size, the classic bounded-dimension fan-out); totals and V are
    broadcast frames. Integer tf/N/V make the per-term contribution
    the identical float expression cross-engine."""
    from .textops import cached_source_term_tf

    tt = cached_source_term_tf(spark, sf_dir)
    totals = tt.groupBy("source").agg(F.sum("tf").alias("n"))
    v = tt.agg(F.countDistinct("term").alias("vocab"))
    e = tt.select(
        F.col("source").alias("src_eval"),
        "term",
        F.col("tf").alias("tf_e"),
    )
    tr = tt.select(
        F.col("source").alias("src_train"),
        "term",
        F.col("tf").alias("tf_t"),
    )
    matched = (
        e.join(tr, "term")
        .groupBy("src_eval", "src_train")
        .agg(
            F.sum(
                F.col("tf_e")
                * F.log((F.col("tf_t") + 1).cast("double"))
            ).alias("m")
        )
    )
    t_ev = totals.select(
        F.col("source").alias("src_eval"), F.col("n").alias("n_e")
    )
    t_tr = totals.select(
        F.col("source").alias("src_train"), F.col("n").alias("n_t")
    )
    return (
        matched.join(F.broadcast(t_ev), "src_eval")
        .join(F.broadcast(t_tr), "src_train")
        .crossJoin(F.broadcast(v))
        .select(
            "src_eval",
            "src_train",
            F.round(
                F.log((F.col("n_t") + F.col("vocab")).cast("double"))
                - F.col("m") / F.col("n_e"),
                4,
            ).alias("cross_entropy"),
        )
    )


# ---------------------------------------------------------------------------
# q307: Pearson correlation matrix of per-doc quality signals, by source
# ---------------------------------------------------------------------------


@query(
    "q307_signal_correlations",
    oracle=f"""
    WITH sig AS (
      SELECT source,
             CAST(n_chars AS BIGINT) AS x,
             CAST(len({_TOKENS_SQL}) AS BIGINT) AS y,
             CAST({_SCORE_SQL} AS BIGINT) AS z
      FROM documents
    ),
    m AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(z) AS BIGINT) AS sz,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy,
             CAST(SUM(z * z) AS BIGINT) AS szz,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * z) AS BIGINT) AS sxz,
             CAST(SUM(y * z) AS BIGINT) AS syz
      FROM sig GROUP BY source
    )
    SELECT source, n AS n_docs,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE) /
                 (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
                  sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
             AS r_chars_tokens,
           ROUND(CAST(n * sxz - sx * sz AS DOUBLE) /
                 (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
                  sqrt(CAST(n * szz - sz * sz AS DOUBLE))), 6)
             AS r_chars_score,
           ROUND(CAST(n * syz - sy * sz AS DOUBLE) /
                 (sqrt(CAST(n * syy - sy * sy AS DOUBLE)) *
                  sqrt(CAST(n * szz - sz * sz AS DOUBLE))), 6)
             AS r_tokens_score
    FROM m
    """,
)
def q307_signal_correlations(spark, sf_dir):
    """PEARSON correlation matrix of the three per-document quality
    signals (char length, token count, milli-unit quality score), per
    source - the signal-redundancy audit run before combining quality
    signals into one filter (two signals correlating at 0.98 means the
    "ensemble" is really one signal, the classic quality-gate design
    error).

    Scale: one scan, one groupBy(source) computing all ten moment sums
    (n, three sums, three squares, three cross products) in a single
    partial-aggregated pass - no second scan, no join, |sources| rows
    out. Every moment is EXACT integer arithmetic (the signals are
    ints; squares/cross-products fit long comfortably at any SF that
    fits a bigint row count), and the correlation formula is written
    operation-for-operation identically on both engines, so the
    doubles agree bit-for-bit before the 6dp round.

    Relation to q140 (SQL2003 regr_*/corr aggregates): q140 exercises
    the ENGINE's built-in regression aggregates (float-summed,
    engine-order-dependent internals); this query derives the same
    statistics from integer moments so the cross-engine comparison is
    exact by construction - the technique to reach for when a metric
    must be reproducible bit-for-bit across engines/runs."""
    sig = t(spark, sf_dir, "documents").select(
        "source",
        F.col("n_chars").cast("long").alias("x"),
        F.size(_tokens()).cast("long").alias("y"),
        F.expr(_SCORE_SPARK_SQL).cast("long").alias("z"),
    )
    m = sig.groupBy("source").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum("z").cast("long").alias("sz"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("z") * F.col("z")).cast("long").alias("szz"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("z")).cast("long").alias("sxz"),
        F.sum(F.col("y") * F.col("z")).cast("long").alias("syz"),
    )

    def corr(spq, sp, sq, spp, sqq):
        num = (F.col("n") * F.col(spq) - F.col(sp) * F.col(sq)).cast(
            "double"
        )
        vp = (F.col("n") * F.col(spp) - F.col(sp) * F.col(sp)).cast(
            "double"
        )
        vq = (F.col("n") * F.col(sqq) - F.col(sq) * F.col(sq)).cast(
            "double"
        )
        return F.round(
        num / F.nullif(F.sqrt(vp) * F.sqrt(vq), F.lit(0.0)), 6
    )

    return m.select(
        "source",
        F.col("n").alias("n_docs"),
        corr("sxy", "sx", "sy", "sxx", "syy").alias("r_chars_tokens"),
        corr("sxz", "sx", "sz", "sxx", "szz").alias("r_chars_score"),
        corr("syz", "sy", "sz", "syy", "szz").alias("r_tokens_score"),
    )


# ---------------------------------------------------------------------------
# q308: per-source OLS fit of quality score on token count
# ---------------------------------------------------------------------------


@query(
    "q308_ols_score_on_tokens",
    oracle=f"""
    WITH sig AS (
      SELECT source,
             CAST(len({_TOKENS_SQL}) AS BIGINT) AS x,
             CAST({_SCORE_SQL} AS BIGINT) AS y
      FROM documents
    ),
    m AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy,
             CAST(SUM(x * y) AS BIGINT) AS sxy
      FROM sig GROUP BY source
    )
    SELECT source, n AS n_docs,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE) /
                 CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope,
           ROUND((CAST(sy AS DOUBLE) -
                  (CAST(n * sxy - sx * sy AS DOUBLE) /
                   CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
                 / CAST(n AS DOUBLE), 6) AS intercept,
           ROUND((CAST(n * sxy - sx * sy AS DOUBLE) *
                  CAST(n * sxy - sx * sy AS DOUBLE)) /
                 (CAST(n * sxx - sx * sx AS DOUBLE) *
                  CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r_squared
    FROM m
    """,
)
def q308_ols_score_on_tokens(spark, sf_dir):
    """Per-source ORDINARY LEAST SQUARES fit of the quality score on
    token count (slope, intercept, R^2) - the length-bias calibration
    every quality classifier needs: if score is mostly a linear
    function of length, a "quality" filter is silently a length
    filter, and the residual (score - fit) is the de-biased signal.

    Scale: identical shape to q307 - one scan, one groupBy(source)
    producing the six moment sums in a single pass, closed-form OLS
    from the moments (the textbook distributed-regression trick: no
    iteration, no second pass). Moments are exact integers; the
    closed-form arithmetic is written identically on both engines
    (squared numerator computed in DOUBLE - it overflows int64 by
    design - everything else exact until the final divisions).
    Same relation to q140's built-in regr_* aggregates as q307:
    integer-moment OLS is the bit-reproducible variant."""
    sig = t(spark, sf_dir, "documents").select(
        "source",
        F.size(_tokens()).cast("long").alias("x"),
        F.expr(_SCORE_SPARK_SQL).cast("long").alias("y"),
    )
    m = sig.groupBy("source").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    vx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    vy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    slope = num / F.nullif(vx, F.lit(0.0))
    return m.select(
        "source",
        F.col("n").alias("n_docs"),
        F.round(slope, 6).alias("slope"),
        F.round(
            (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
            / F.col("n").cast("double"),
            6,
        ).alias("intercept"),
        F.round(
            (num * num) / F.nullif(vx * vy, F.lit(0.0)), 6
        ).alias("r_squared"),
    )


# ---------------------------------------------------------------------------
# q312: sequence-length bucketing (padding-efficiency planning)
# ---------------------------------------------------------------------------

#: bucket count for the length-bucketed batching plan.
_LB_BUCKETS = 8


@query(
    "q312_length_bucketing",
    oracle=f"""
    WITH lens AS (
      SELECT doc_id, CAST(len({_TOKENS_SQL}) AS BIGINT) AS n_tok
      FROM documents
      -- listwise: a textless record has no length to bucket (r13)
      WHERE text IS NOT NULL
    ),
    b AS (
      SELECT doc_id, n_tok,
             CAST(NTILE({_LB_BUCKETS})
                  OVER (ORDER BY n_tok, doc_id) AS BIGINT) AS bucket
      FROM lens
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(n_tok) AS BIGINT) AS min_len,
           CAST(MAX(n_tok) AS BIGINT) AS max_len,
           CAST(SUM(n_tok) AS BIGINT) AS sum_len,
           CAST(COUNT(*) * MAX(n_tok) - SUM(n_tok) AS BIGINT)
             AS padding_tokens,
           ROUND(CAST(COUNT(*) * MAX(n_tok) - SUM(n_tok) AS DOUBLE)
                 / (COUNT(*) * MAX(n_tok)), 6) AS padding_pct
    FROM b GROUP BY bucket
    """,
)
def q312_length_bucketing(spark, sf_dir):
    """SEQUENCE-LENGTH BUCKETING plan: split documents into
    8 equal-count buckets by token length (exact global
    NTILE) and report each bucket's padding overhead if batches pad to
    the bucket max - the batching-efficiency study run before training
    (the alternative to q86's concat-and-chunk packing: bucketing
    preserves document boundaries at the cost of the padding measured
    here; the padding_pct column IS the decision input).

    Scale: lengths are a map-stage projection; the global NTILE is
    :func:`plans.common.global_ntile` (range exchange + exact bucket
    arithmetic, no single-partition window - the q104-class fix); the
    report is a 8-key aggregate with exact integer
    arithmetic throughout (one IEEE division per bucket before the
    round)."""
    from .common import global_ntile

    lens = t(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()  # listwise (r13 census)
    ).select(
        "doc_id", F.size(_tokens()).cast("long").alias("n_tok")
    )
    b = global_ntile(
        lens, [F.col("n_tok"), F.col("doc_id")], _LB_BUCKETS, "bucket"
    )
    return (
        b.groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("n_tok").cast("long").alias("min_len"),
            F.max("n_tok").cast("long").alias("max_len"),
            F.sum("n_tok").cast("long").alias("sum_len"),
        )
        .select(
            "bucket",
            "n_docs",
            "min_len",
            "max_len",
            "sum_len",
            (F.col("n_docs") * F.col("max_len") - F.col("sum_len"))
            .cast("long")
            .alias("padding_tokens"),
            F.round(
                (
                    F.col("n_docs") * F.col("max_len") - F.col("sum_len")
                ).cast("double")
                / (F.col("n_docs") * F.col("max_len")),
                6,
            ).alias("padding_pct"),
        )
    )


# ---------------------------------------------------------------------------
# q314: Poisson-bootstrap confidence intervals for per-source quality
# ---------------------------------------------------------------------------

#: bootstrap replicates and the CI rank picks (2.5%/97.5% of B=100 by
#: sorted position with a deterministic tie-break).
_BOOT_B = 100
_BOOT_LO = 3
_BOOT_HI = 98

#: cumulative Poisson(1) pmf for k = 0..6 (k = 7 catches the tail).
#: IDENTICAL literals on both engines - decimal parse gives the same
#: nearest double everywhere.
_POIS_CUM = (
    "0.36787944117144233",
    "0.7357588823428847",
    "0.9196986029286058",
    "0.9810118431238463",
    "0.9963401531726563",
    "0.9994058151824183",
    "0.999916758850712",
)

#: identical u arithmetic, engine-specific spellings (Spark SQL has no
#: bare VARCHAR; conv() is its hex-to-bigint bridge).
_BOOT_U_SQL = (
    "("
    + "CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || ':' || "
    "CAST(b AS VARCHAR)), 1, 15)) AS BIGINT)"
    + " % 1000000000 + 0.5) / 1000000000.0"
)
#: Spark twin of _BOOT_U_SQL via the module's _h60 bridge (one place
#: owns the 60-bit hash spelling; review finding r7).
def _boot_u_spark():
    return (
        _h60(
            F.concat(
                F.col("doc_id").cast("string"),
                F.lit(":"),
                F.col("b").cast("string"),
            )
        )
        % 1_000_000_000
        + 0.5
    ) / 1_000_000_000.0

_BOOT_W_SQL = "CASE " + " ".join(
    f"WHEN u < {c} THEN {k}" for k, c in enumerate(_POIS_CUM)
) + " ELSE 7 END"


@query(
    "q314_poisson_bootstrap",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, source, CAST({_SCORE_SQL} AS BIGINT) AS score
      FROM documents
    ),
    r AS (
      SELECT source, score,
             {_BOOT_U_SQL} AS u, b
      FROM (SELECT doc_id, source, score, r.b
            FROM s, LATERAL unnest(range(1, {_BOOT_B} + 1)) r(b))
    ),
    m AS (
      SELECT source, b,
             CAST(SUM(({_BOOT_W_SQL}) * score) AS DOUBLE)
               / SUM({_BOOT_W_SQL}) AS mean_b
      FROM r GROUP BY source, b
      HAVING SUM({_BOOT_W_SQL}) > 0
    ),
    rk AS (
      SELECT source, mean_b,
             ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY mean_b, b
             ) AS rn
      FROM m
    ),
    ci AS (
      SELECT source,
             MIN(CASE WHEN rn = {_BOOT_LO} THEN mean_b END) AS lo,
             MIN(CASE WHEN rn = {_BOOT_HI} THEN mean_b END) AS hi
      FROM rk GROUP BY source
    ),
    pt AS (
      SELECT source, CAST(SUM(score) AS DOUBLE) / COUNT(*) AS point
      FROM s GROUP BY source
    )
    SELECT pt.source,
           ROUND(pt.point, 6) AS mean_score,
           ROUND(ci.lo, 6) AS ci_lo,
           ROUND(ci.hi, 6) AS ci_hi
    FROM pt JOIN ci ON pt.source = ci.source
    """,
)
def q314_poisson_bootstrap(spark, sf_dir):
    """POISSON-BOOTSTRAP 95% confidence intervals for each source's
    mean quality score: 100 replicates where every document's
    weight in replicate b is an independent-ish Poisson(1) draw - the
    ONLY bootstrap that works at cluster scale, because it needs no
    global resample (each row computes its own weight in the map
    stage; Chamandy et al., Google 2012). The CI is the sorted
    replicate means at positions 3/98 of 100
    with a deterministic tie-break.

    Determinism/exactness: the draw is the md5-60bit hash of
    (doc_id, b) pushed through the exact cumulative-pmf ladder
    (identical decimal literals both engines), the score is INTEGER
    milli-units, so every replicate mean is a ratio of exact integers
    - the whole bootstrap is bit-identical cross-engine before the
    final 6dp round.

    Scale: the replicate explode is the bootstrap's inherent x100
    cost, generated in-map (sequence + explode, no join); the census
    is one (source, b)-keyed partial aggregate; ranking is a
    per-source window over 100 rows. Nothing global, nothing
    quadratic."""
    s = t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.expr(_SCORE_SPARK_SQL).cast("long").alias("score"),
    )
    r = (
        s.select(
            "doc_id",
            "source",
            "score",
            F.explode(
                F.sequence(F.lit(1), F.lit(_BOOT_B))
            ).alias("b"),
        )
        .withColumn("u", _boot_u_spark())
        .withColumn("w", F.expr(_BOOT_W_SQL))
    )
    # HAVING sum(w) > 0: a replicate whose every document drew weight 0
    # is an empty resample - dropped identically on both engines (NULL
    # means would otherwise sort differently: Spark NULLS FIRST asc vs
    # DuckDB last, shifting the rank-picked CI rows).
    m = (
        r.groupBy("source", "b")
        .agg(
            F.sum(F.col("w") * F.col("score")).cast("double").alias("sw"),
            F.sum("w").alias("ww"),
        )
        .filter(F.col("ww") > 0)
        .select(
            "source", "b", (F.col("sw") / F.col("ww")).alias("mean_b")
        )
    )
    rk = m.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("source").orderBy("mean_b", "b")
        ),
    )
    ci = rk.groupBy("source").agg(
        F.min(F.when(F.col("rn") == _BOOT_LO, F.col("mean_b"))).alias("lo"),
        F.min(F.when(F.col("rn") == _BOOT_HI, F.col("mean_b"))).alias("hi"),
    )
    pt = s.groupBy("source").agg(
        (F.sum("score").cast("double") / F.count("*")).alias("point")
    )
    return pt.join(ci, "source").select(
        "source",
        F.round("point", 6).alias("mean_score"),
        F.round("lo", 6).alias("ci_lo"),
        F.round("hi", 6).alias("ci_hi"),
    )


# ---------------------------------------------------------------------------
# q328: weighted sampling without replacement (Efraimidis-Spirakis)
# ---------------------------------------------------------------------------

#: sample size for the weighted draw.
_WS_K = 64

#: modulus folding the 60-bit hash into an EXACTLY-representable
#: double range: h % 2^52 fits the 52-bit mantissa, so u =
#: (h % 2^52 + 0.5) / 2^52 is computed bit-identically on both
#: engines (no rounding in the +0.5 or the power-of-two divide) and
#: lies strictly inside (0, 1) - LN(u) is always finite.
_WS_MOD = 2**52


@query(
    "q328_weighted_sample",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, source,
             GREATEST(CAST({_SCORE_SQL} AS BIGINT), 1) AS weight,
             ({_h60_sql("concat('ws:', CAST(doc_id AS VARCHAR))")}
              % {_WS_MOD} + 0.5) / {_WS_MOD}.0 AS u
      FROM documents
    ),
    keyed AS (
      SELECT doc_id, source, weight,
             ln(u) / weight AS k
      FROM w
    )
    SELECT doc_id, source, weight, ROUND(k, 6) AS sample_key
    FROM keyed
    ORDER BY k DESC, doc_id
    LIMIT {_WS_K}
    """,
)
def q328_weighted_sample(spark, sf_dir):
    """WEIGHTED SAMPLING WITHOUT REPLACEMENT by the one-pass
    exponential-key method (Efraimidis & Spirakis 2006): each
    document draws u ~ U(0,1) from its content hash and keeps key
    ln(u)/w (the log of u^(1/w)); the 64 LARGEST keys are
    exactly a weighted draw without replacement - the distributed
    sampling primitive behind quality-weighted corpus subsampling,
    where plain reservoir sampling cannot honor weights and
    per-partition reservoirs cannot merge.

    Exactness: u is built from the md5-60bit hash folded into the
    52-bit mantissa range, so (h % 2^52 + 0.5) / 2^52 involves ZERO
    floating-point rounding on either engine and never hits 0 or 1.
    LN is the one transcendental (both engines evaluate the same
    double, agreeing to <=1 ulp); keys are md5-spread across ~16
    orders of magnitude, so a cross-engine ORDER flip would need two
    keys within ~2^-52 relative distance - probability ~ n*k*2^-52,
    vanishing (same adjudication as q313's LN noise). The tie-break
    on doc_id makes equal keys deterministic anyway.

    Scale: orderBy+limit plans as TakeOrderedAndProject - each
    partition keeps its local top-64, the driver merges
    |partitions|*64 rows; no shuffle of the corpus, no window.
    This is the textbook distributed top-k reduction of A-ES (the
    q323 bottom-k shape with a weight-skewed key)."""
    w = t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.greatest(
            F.expr(_SCORE_SPARK_SQL).cast("long"), F.lit(1)
        ).alias("weight"),
        (
            (
                _h60(F.concat(F.lit("ws:"), F.col("doc_id").cast("string")))
                % _WS_MOD
                + 0.5
            )
            / float(_WS_MOD)
        ).alias("u"),
    )
    keyed = w.select(
        "doc_id",
        "source",
        "weight",
        (F.log(F.col("u")) / F.col("weight")).alias("k"),
    )
    return (
        keyed.orderBy(F.col("k").desc(), "doc_id")
        .limit(_WS_K)
        .select(
            "doc_id",
            "source",
            "weight",
            F.round("k", 6).alias("sample_key"),
        )
    )


# ---------------------------------------------------------------------------
# q329: decision-stump split search by weighted Gini impurity
# ---------------------------------------------------------------------------

#: length-bucket width for candidate thresholds: n_chars spans a few
#: hundred values, so DIV 32 yields ~18 candidate split points -
#: value-domain-bounded, never corpus-sized.
_GINI_BW = 32


@query(
    "q329_gini_stump_split",
    oracle=f"""
    WITH lab AS (
      SELECT CAST(n_chars AS BIGINT) // {_GINI_BW} AS b,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents
      -- a record with no length has no bucket to split on (r13
      -- partial-records census)
      WHERE n_chars IS NOT NULL
    ),
    bk AS (
      SELECT b, CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(y) AS BIGINT) AS pos
      FROM lab GROUP BY b
    ),
    cum AS (
      SELECT b,
             CAST(SUM(cnt) OVER (ORDER BY b) AS BIGINT) AS nl,
             CAST(SUM(pos) OVER (ORDER BY b) AS BIGINT) AS pl
      FROM bk
    ),
    tot AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS n,
             CAST(SUM(pos) AS BIGINT) AS p
      FROM bk
    ),
    sweep AS (
      SELECT (b + 1) * {_GINI_BW} AS threshold_chars,
             nl AS n_left, pl AS pos_left,
             tot.n - nl AS n_right, tot.p - pl AS pos_right,
             ROUND((
               (CAST(nl AS DOUBLE)
                - CAST(pl * pl + (nl - pl) * (nl - pl) AS DOUBLE) / nl)
               + (CAST(tot.n - nl AS DOUBLE)
                  - CAST((tot.p - pl) * (tot.p - pl)
                         + ((tot.n - nl) - (tot.p - pl))
                           * ((tot.n - nl) - (tot.p - pl))
                    AS DOUBLE) / (tot.n - nl))
             ) / tot.n, 6) AS gini
      FROM cum, tot
      WHERE tot.n - nl > 0
    ),
    best AS (SELECT MIN(gini) AS g FROM sweep)
    SELECT sweep.*,
           CAST(CASE WHEN sweep.gini = best.g THEN 1 ELSE 0 END
                AS BIGINT) AS is_best
    FROM sweep, best
    """,
)
def q329_gini_stump_split(spark, sf_dir):
    """DECISION-STUMP SPLIT SEARCH: sweep every candidate threshold
    on document length and score the split by weighted Gini impurity
    against the lang='en' label - the single tree-node computation at
    the heart of every distributed tree learner (and the quality-gate
    design tool: "does length alone separate English?" is answered by
    the best split's impurity drop). The whole sweep is returned with
    the argmin flagged, so the query is its own audit.

    Exactness: class counts per bucket are integers; the weighted
    Gini n_L*G_L + n_R*G_R expands to n_L - (p_L^2 + (n_L-p_L)^2)/n_L
    with every square an exact integer (< 2^53 through ~9e7 rows per
    side; past that the ratio-first double form (p/n)^2 takes over
    with the identical-expression-string guarantee), divided once by
    N at the end - written operation-for-operation identically on
    both engines, rounded to 6dp, then argmin-flagged by EQUALITY ON
    THE ROUNDED value so the flag can never straddle a rounding edge.

    Scale: one scan -> groupBy(length-bucket) hash aggregate (~18
    rows at any SF - the bucket domain is the VALUE range, not the
    corpus); the cumulative window runs on that bounded aggregate
    (adjudicated global window, the q295 CDF pattern) and the argmin
    crossJoin multiplies a 1-row frame (adjudicated NLJ)."""
    lab = t(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull()  # no length, no bucket (r13)
    ).select(
        F.expr(
            f"CAST(n_chars AS LONG) DIV {_GINI_BW}"
        ).alias("b"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    bk = lab.groupBy("b").agg(
        F.count("*").cast("long").alias("cnt"),
        F.sum("y").cast("long").alias("pos"),
    )
    wcum = Window.orderBy("b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = bk.select(
        "b",
        F.sum("cnt").over(wcum).cast("long").alias("nl"),
        F.sum("pos").over(wcum).cast("long").alias("pl"),
    )
    tot = bk.agg(
        F.sum("cnt").cast("long").alias("n"),
        F.sum("pos").cast("long").alias("p"),
    )
    nl, pl = F.col("nl"), F.col("pl")
    nr = F.col("n") - nl
    pr = F.col("p") - pl
    gini = F.round(
        (
            (
                nl.cast("double")
                - (pl * pl + (nl - pl) * (nl - pl)).cast("double") / nl
            )
            + (
                nr.cast("double")
                - (pr * pr + (nr - pr) * (nr - pr)).cast("double") / nr
            )
        )
        / F.col("n"),
        6,
    )
    sweep = transient_persist(
        cum.crossJoin(F.broadcast(tot))
        .filter(nr > 0)
        .select(
            ((F.col("b") + 1) * _GINI_BW).cast("long").alias(
                "threshold_chars"
            ),
            nl.alias("n_left"),
            pl.alias("pos_left"),
            nr.cast("long").alias("n_right"),
            pr.cast("long").alias("pos_right"),
            gini.alias("gini"),
        )
    )
    best = sweep.agg(F.min("gini").alias("g"))
    return sweep.crossJoin(F.broadcast(best)).select(
        "threshold_chars",
        "n_left",
        "pos_left",
        "n_right",
        "pos_right",
        "gini",
        F.when(F.col("gini") == F.col("g"), 1)
        .otherwise(0)
        .cast("long")
        .alias("is_best"),
    )


# ---------------------------------------------------------------------------
# q331: leakage-free K-fold target encoding of the source category
# ---------------------------------------------------------------------------

#: fold count and smoothing pseudo-count for the encoder.
_TE_FOLDS = 5
_TE_M = 20


@query(
    "q331_target_encoding",
    oracle=f"""
    WITH lab AS (
      SELECT source,
             {_h60_sql("concat('te:', CAST(doc_id AS VARCHAR))")}
               % {_TE_FOLDS} AS fold,
             CAST({_SCORE_SQL} AS BIGINT) AS y
      FROM documents
    ),
    cf AS (
      SELECT source, fold, CAST(COUNT(*) AS BIGINT) AS n_cf,
             CAST(SUM(y) AS BIGINT) AS s_cf
      FROM lab GROUP BY source, fold
    ),
    c AS (
      SELECT source, CAST(SUM(n_cf) AS BIGINT) AS n_c,
             CAST(SUM(s_cf) AS BIGINT) AS s_c
      FROM cf GROUP BY source
    ),
    tot AS (
      SELECT CAST(SUM(n_c) AS BIGINT) AS n,
             CAST(SUM(s_c) AS BIGINT) AS s
      FROM c
    )
    SELECT cf.source, CAST(cf.fold AS BIGINT) AS fold,
           cf.n_cf AS n_in_fold,
           c.n_c - cf.n_cf AS n_out_fold,
           CASE WHEN c.n_c - cf.n_cf > 0
                THEN ROUND(CAST(c.s_c - cf.s_cf AS DOUBLE)
                           / (c.n_c - cf.n_cf), 6) END AS enc_raw,
           ROUND((CAST(c.s_c - cf.s_cf AS DOUBLE)
                  + {_TE_M} * (CAST(tot.s AS DOUBLE) / tot.n))
                 / ((c.n_c - cf.n_cf) + {_TE_M}), 6) AS enc_smoothed
    FROM cf JOIN c USING (source), tot
    """,
)
def q331_target_encoding(spark, sf_dir):
    """LEAKAGE-FREE K-FOLD TARGET ENCODING of the ``source``
    category against the milli-unit quality score: the encoding a
    row receives is the mean target of its category computed WITHOUT
    the row's own fold - the out-of-fold discipline that separates a
    usable categorical feature from a leaked one (a category's
    within-fold mean memorizes the fold's labels; downstream models
    trained on it overfit invisibly). The m=20 smoothed variant
    shrinks sparse folds toward the global prior, the standard
    high-cardinality guard.

    Exactness: fold assignment is the deterministic md5 bridge mod
    5; leave-fold-out sums are BIGINT subtractions of two
    exact integer aggregates (no per-row recomputation, no float
    sums); both divisions are the identical expression string on
    both engines, rounded once. The raw encoding NULLs (identical
    CASE guard) when a category lives entirely in one fold.

    Scale: two hash aggregates - (source, fold) then its rollup to
    (source) - and one equi-join between them (|sources| x
    5 rows vs |sources| rows: AQE broadcasts the smaller
    side unhinted); the global prior is a 1-row frame (adjudicated
    NLJ). The heavy work is ONE map-side-combinable pass over the
    corpus; per-row encoding at apply time is a broadcast-join
    lookup, never a shuffle of the facts."""
    lab = t(spark, sf_dir, "documents").select(
        "source",
        (
            _h60(F.concat(F.lit("te:"), F.col("doc_id").cast("string")))
            % _TE_FOLDS
        ).alias("fold"),
        F.expr(_SCORE_SPARK_SQL).cast("long").alias("y"),
    )
    cf = lab.groupBy("source", "fold").agg(
        F.count("*").cast("long").alias("n_cf"),
        F.sum("y").cast("long").alias("s_cf"),
    )
    c = cf.groupBy("source").agg(
        F.sum("n_cf").cast("long").alias("n_c"),
        F.sum("s_cf").cast("long").alias("s_c"),
    )
    tot = c.agg(
        F.sum("n_c").cast("long").alias("n"),
        F.sum("s_c").cast("long").alias("s"),
    )
    n_out = F.col("n_c") - F.col("n_cf")
    s_out = F.col("s_c") - F.col("s_cf")
    prior = F.col("s").cast("double") / F.col("n")
    return (
        cf.join(c, "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.col("fold").cast("long").alias("fold"),
            F.col("n_cf").alias("n_in_fold"),
            n_out.alias("n_out_fold"),
            F.when(
                n_out > 0,
                F.round(s_out.cast("double") / n_out, 6),
            ).alias("enc_raw"),
            F.round(
                (s_out.cast("double") + _TE_M * prior)
                / (n_out + _TE_M),
                6,
            ).alias("enc_smoothed"),
        )
    )


# ---------------------------------------------------------------------------
# q344: feature-hashing (hashing-trick) collision audit
# ---------------------------------------------------------------------------

#: hashed feature-space width; the synthetic lexicon is ~31 terms, so
#: 2^4 buckets gives load factor ~2 - the same collision regime a
#: 2^18-bucket space has against a real 500k-term vocabulary
_FH_B = 16


@query(
    "q344_feature_hash_audit",
    oracle=f"""
    WITH tf AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS freq
      FROM (SELECT unnest({_TOKENS_SQL}) AS term FROM documents)
      GROUP BY term
    ),
    hashed AS (
      SELECT term, freq,
             {_h60_sql("'fh|' || term")} % {_FH_B} AS bucket,
             CASE WHEN {_h60_sql("'sg|' || term")} % 2 = 0
                  THEN 1 ELSE -1 END AS sign
      FROM tf
    ),
    bk AS (
      SELECT bucket,
             CAST(COUNT(*) AS BIGINT) AS n_terms,
             CAST(SUM(freq) AS BIGINT) AS mass,
             ABS(CAST(SUM(sign * freq) AS BIGINT)) AS abs_net
      FROM hashed GROUP BY bucket
    ),
    tot AS (
      SELECT CAST(SUM(n_terms) AS BIGINT) AS v,
             CAST(COUNT(*) AS BIGINT) AS buckets_used,
             CAST(SUM(mass) AS BIGINT) AS total_mass,
             CAST(SUM(CASE WHEN n_terms > 1 THEN mass ELSE 0 END)
                  AS BIGINT) AS collided_mass
      FROM bk
    )
    SELECT bk.n_terms AS terms_in_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(SUM(bk.mass) AS BIGINT) AS mass,
           CAST(SUM(bk.abs_net) AS BIGINT) AS surviving_mass,
           (1000 * (tot.v - tot.buckets_used)) // tot.v
             AS collision_milli,
           (1000 * tot.collided_mass) // tot.total_mass
             AS collided_mass_milli
    FROM bk, tot
    GROUP BY bk.n_terms, tot.v, tot.buckets_used, tot.total_mass,
             tot.collided_mass
    ORDER BY terms_in_bucket
    """,
)
def q344_feature_hash_audit(spark, sf_dir):
    """FEATURE-HASHING (hashing-trick) COLLISION AUDIT: project the
    vocabulary into a 16-bucket signed hashed feature space
    (Weinberger et al. 2009 - the trick behind every fixed-width
    bag-of-words featurizer that cannot afford a vocabulary dict at
    100 TB) and report, per bucket-occupancy class, how many buckets
    hold k terms, the token mass they carry, and the SIGNED mass that
    survives cancellation - plus the corpus-level collision rate and
    the share of token mass sitting in collided buckets. This is the
    design audit run before committing to a hashed width B: if
    collided_mass_milli is high, double B.

    Exactness: everything is an integer - the 60-bit md5 bridge hash,
    modular bucket/sign assignment, token-frequency sums, and
    milli-rates by integer division. Order-independent by
    construction.

    Scale: one token explode -> vocabulary-bounded term-frequency
    aggregate; hashing is a map over the VOCAB frame (never the
    corpus); the occupancy histogram is a 16-row aggregate and
    the totals ride a broadcast NLJ (adjudicated)."""
    tf = (
        t(spark, sf_dir, "documents")
        .select(F.explode(_tokens()).alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    hashed = tf.select(
        "freq",
        (_h60(F.concat(F.lit("fh|"), F.col("term"))) % _FH_B).alias("bucket"),
        F.when(
            _h60(F.concat(F.lit("sg|"), F.col("term"))) % 2 == 0, 1
        )
        .otherwise(-1)
        .alias("sign"),
    )
    bk = hashed.groupBy("bucket").agg(
        F.count("*").cast("long").alias("n_terms"),
        F.sum("freq").cast("long").alias("mass"),
        F.abs(F.sum(F.col("sign") * F.col("freq")).cast("long")).alias(
            "abs_net"
        ),
    )
    tot = bk.agg(
        F.sum("n_terms").cast("long").alias("v"),
        F.count("*").cast("long").alias("buckets_used"),
        F.sum("mass").cast("long").alias("total_mass"),
        F.sum(F.when(F.col("n_terms") > 1, F.col("mass")).otherwise(0))
        .cast("long")
        .alias("collided_mass"),
    )
    return (
        bk.crossJoin(F.broadcast(tot))
        .groupBy(
            F.col("n_terms").alias("terms_in_bucket"),
            "v",
            "buckets_used",
            "total_mass",
            "collided_mass",
        )
        .agg(
            F.count("*").cast("long").alias("n_buckets"),
            F.sum("mass").cast("long").alias("mass"),
            F.sum("abs_net").cast("long").alias("surviving_mass"),
        )
        .select(
            "terms_in_bucket",
            "n_buckets",
            "mass",
            "surviving_mass",
            F.expr("(1000 * (v - buckets_used)) DIV v").alias(
                "collision_milli"
            ),
            F.expr("(1000 * collided_mass) DIV total_mass").alias(
                "collided_mass_milli"
            ),
        )
        .orderBy("terms_in_bucket")
    )


# ---------------------------------------------------------------------------
# q365: optimal 1-D k-segmentation of the length distribution (exact DP)
# ---------------------------------------------------------------------------

_SEG_K = 4


def _seg_cost(hi: str, lo: str, div: str) -> str:
    """1000x-scaled within-segment SSE between prefix rows ``lo`` and
    ``hi``: (S2)*1000 - (S1^2*1000) div W, with the division TRUNCATED
    identically by Spark DIV and DuckDB // - not mathematically exact
    SSE, but an exactly-defined integer objective both engines
    minimize bit-identically (W >= 1 always: segments are non-empty
    index ranges)."""
    return (
        f"(({hi}.p2 - {lo}.p2) * 1000"
        f" - (({hi}.p1 - {lo}.p1) * ({hi}.p1 - {lo}.p1) * 1000)"
        f" {div} ({hi}.p0 - {lo}.p0))"
    )


def _seg_oracle() -> str:
    head = f"""
    WITH vals AS MATERIALIZED (
      SELECT CAST(n_chars AS BIGINT) AS x,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM documents
      -- listwise: segmentation is over OBSERVED lengths (r13 census;
      -- a NULL value row would also collide with the DP's i=0
      -- sentinel row)
      WHERE n_chars IS NOT NULL GROUP BY n_chars
    ),
    ps AS MATERIALIZED (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY x) AS BIGINT) AS i, x,
             CAST(SUM(cnt) OVER (ORDER BY x) AS BIGINT) AS p0,
             CAST(SUM(cnt * x) OVER (ORDER BY x) AS BIGINT) AS p1,
             CAST(SUM(cnt * x * x) OVER (ORDER BY x) AS BIGINT) AS p2
      FROM vals
      UNION ALL
      SELECT 0, NULL, 0, 0, 0
    ),
    dp1 AS MATERIALIZED (
      SELECT v.i AS v, CAST(0 AS BIGINT) AS s,
             {_seg_cost("v", "z", "//")} AS cost
      FROM ps v, (SELECT * FROM ps WHERE i = 0) z
      WHERE v.i >= 1
    )"""
    parts = [head]
    for j in range(2, _SEG_K + 1):
        parts.append(
            f"""
    dp{j} AS MATERIALIZED (
      SELECT v, s, cost FROM (
        SELECT vp.i AS v, p.v AS s,
               p.cost + {_seg_cost("vp", "sp", "//")} AS cost,
               ROW_NUMBER() OVER (
                 PARTITION BY vp.i
                 ORDER BY p.cost + {_seg_cost("vp", "sp", "//")}, p.v
               ) AS rn
        FROM dp{j - 1} p
        JOIN ps sp ON sp.i = p.v
        JOIN ps vp ON vp.i > p.v
      ) WHERE rn = 1
    )"""
        )
    return (
        ",".join(parts)
        + f"""
    , vmax AS MATERIALIZED (SELECT MAX(i) AS vv FROM ps),
    b3 AS MATERIALIZED (
      SELECT d.s FROM dp{_SEG_K} d, vmax WHERE d.v = vmax.vv
    ),
    b2 AS MATERIALIZED (
      SELECT d.s FROM dp{_SEG_K - 1} d, b3 WHERE d.v = b3.s
    ),
    b1 AS MATERIALIZED (
      SELECT d.s FROM dp{_SEG_K - 2} d, b2 WHERE d.v = b2.s
    ),
    bounds AS MATERIALIZED (
      SELECT CAST(1 AS BIGINT) AS seg_id, CAST(0 AS BIGINT) AS lo_i,
             b1.s AS hi_i FROM b1
      UNION ALL SELECT 2, b1.s, b2.s FROM b1, b2
      UNION ALL SELECT 3, b2.s, b3.s FROM b2, b3
      UNION ALL SELECT 4, b3.s, vmax.vv FROM b3, vmax
    )
    SELECT b.seg_id, lo1.x AS lo_x, hi.x AS hi_x,
           hi.p0 - lop.p0 AS n_docs,
           {_seg_cost("hi", "lop", "//")} AS cost_scaled
    FROM bounds b
    JOIN ps hi ON hi.i = b.hi_i
    JOIN ps lop ON lop.i = b.lo_i
    JOIN ps lo1 ON lo1.i = b.lo_i + 1
    """
    )


@query("q365_optimal_1d_segmentation", oracle=_seg_oracle())
def q365_optimal_1d_segmentation(spark, sf_dir):
    """OPTIMAL 1-D k-SEGMENTATION of the document-length distribution
    (the exact-DP counterpart of Ckmeans.1d.dp / optimal equal-
    variance binning): split the sorted n_chars value domain into
    4 contiguous segments minimizing total within-segment SSE
    - the principled version of the ad-hoc length buckets q312/q290
    use, and the discretizer a feature pipeline wants when quantile
    bins straddle modes. Output: per-segment [lo_x, hi_x], mass, and
    cost; ties in the DP break on the SMALLER split index, so the
    segmentation is unique on both engines.

    Exactness: the value-domain prefix sums (count, sum, sum-of-
    squares) are bigint; the cost is the 1000x-scaled SSE with an
    engine-matched truncating division (:func:`_seg_cost`) - an
    exactly-defined integer objective, so argmins cannot diverge.

    Scale: the corpus collapses to the VALUE-DOMAIN aggregate first
    (<= |distinct lengths| rows - the q287/q318 bounded class); the
    DP's O(V^2) split enumeration and its windows run entirely on
    that bounded frame (adjudicated BNLJ/global-window classes), and
    backtracking joins three 1-row frames. Fact-sized work: one
    groupBy(n_chars)."""
    docs = t(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull()  # observed lengths only (r13)
    )
    vals = docs.groupBy(F.col("n_chars").cast("long").alias("x")).agg(
        F.count("*").cast("long").alias("cnt")
    )
    w = Window.orderBy("x")
    ps_rows = vals.select(
        F.row_number().over(w).cast("long").alias("i"),
        "x",
        F.sum("cnt").over(w).cast("long").alias("p0"),
        F.sum(F.col("cnt") * F.col("x")).over(w).cast("long").alias("p1"),
        F.sum(F.col("cnt") * F.col("x") * F.col("x"))
        .over(w)
        .cast("long")
        .alias("p2"),
    )
    zero = spark.range(1).select(
        F.lit(0).cast("long").alias("i"),
        F.lit(None).cast("long").alias("x"),
        F.lit(0).cast("long").alias("p0"),
        F.lit(0).cast("long").alias("p1"),
        F.lit(0).cast("long").alias("p2"),
    )
    ps = transient_persist(ps_rows.unionByName(zero).coalesce(1))

    def pref(alias):
        return ps.select(
            F.col("i").alias(f"{alias}_i"),
            F.col("x").alias(f"{alias}_x"),
            F.col("p0").alias(f"{alias}_p0"),
            F.col("p1").alias(f"{alias}_p1"),
            F.col("p2").alias(f"{alias}_p2"),
        )

    def cost(hi, lo):
        return F.expr(
            f"(({hi}_p2 - {lo}_p2) * 1000"
            f" - (({hi}_p1 - {lo}_p1) * ({hi}_p1 - {lo}_p1) * 1000)"
            f" DIV ({hi}_p0 - {lo}_p0))"
        )

    # dp[j] maps segment-count j to its (end-index v, best split s,
    # best cost) table; every level is kept for the backtracking pass.
    dps = {}
    dp = (
        pref("v")
        .filter(F.col("v_i") >= 1)
        .crossJoin(F.broadcast(pref("z").filter(F.col("z_i") == 0)))
        .select(
            F.col("v_i").alias("v"),
            F.lit(0).cast("long").alias("s"),
            cost("v", "z").alias("cost"),
        )
    )
    dps[1] = transient_persist(dp.coalesce(1))
    for j in range(2, _SEG_K + 1):
        cand = (
            dps[j - 1]
            .join(pref("sp"), dps[j - 1].v == F.col("sp_i"))
            .join(pref("vp"), F.col("vp_i") > F.col("sp_i"))
            .select(
                F.col("vp_i").alias("nv"),
                F.col("v").alias("ns"),
                (F.col("cost") + cost("vp", "sp")).alias("ncost"),
            )
        )
        wr = Window.partitionBy("nv").orderBy("ncost", "ns")
        dps[j] = transient_persist(
            cand.withColumn("rn", F.row_number().over(wr))
            .filter(F.col("rn") == 1)
            .select(
                F.col("nv").alias("v"),
                F.col("ns").alias("s"),
                F.col("ncost").alias("cost"),
            )
            .coalesce(1)
        )
    vmax = ps.agg(F.max("i").alias("vv"))
    b3 = (
        dps[_SEG_K]
        .join(F.broadcast(vmax), dps[_SEG_K].v == F.col("vv"))
        .limit(1)
        .select(F.col("s").alias("b3"))
    )
    b2 = (
        dps[_SEG_K - 1]
        .join(F.broadcast(b3), dps[_SEG_K - 1].v == F.col("b3"))
        .limit(1)
        .select(F.col("s").alias("b2"))
    )
    b1 = (
        dps[_SEG_K - 2]
        .join(F.broadcast(b2), dps[_SEG_K - 2].v == F.col("b2"))
        .limit(1)
        .select(F.col("s").alias("b1"))
    )
    bounds = (
        b1.crossJoin(F.broadcast(b2))
        .crossJoin(F.broadcast(b3))
        .crossJoin(F.broadcast(vmax))
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit(1).cast("long").alias("seg_id"),
                        F.lit(0).cast("long").alias("lo_i"),
                        F.col("b1").alias("hi_i"),
                    ),
                    F.struct(
                        F.lit(2).cast("long").alias("seg_id"),
                        F.col("b1").alias("lo_i"),
                        F.col("b2").alias("hi_i"),
                    ),
                    F.struct(
                        F.lit(3).cast("long").alias("seg_id"),
                        F.col("b2").alias("lo_i"),
                        F.col("b3").alias("hi_i"),
                    ),
                    F.struct(
                        F.lit(4).cast("long").alias("seg_id"),
                        F.col("b3").alias("lo_i"),
                        F.col("vv").alias("hi_i"),
                    ),
                )
            ).alias("b")
        )
        .select(
            "b.seg_id",
            F.col("b.lo_i").alias("b_lo"),
            F.col("b.hi_i").alias("b_hi"),
        )
    )
    return (
        bounds.join(pref("hi"), F.col("b_hi") == F.col("hi_i"))
        .join(pref("lop"), F.col("b_lo") == F.col("lop_i"))
        .join(pref("lo1"), F.col("b_lo") + 1 == F.col("lo1_i"))
        .select(
            "seg_id",
            F.col("lo1_x").alias("lo_x"),
            F.col("hi_x").alias("hi_x"),
            (F.col("hi_p0") - F.col("lop_p0")).alias("n_docs"),
            cost("hi", "lop").alias("cost_scaled"),
        )
    )


# ---------------------------------------------------------------------------
# q369: Shapley attribution of the cleaning gates' removals
# ---------------------------------------------------------------------------


@query(
    "q369_gate_shapley",
    oracle=f"""
    WITH f AS (
      SELECT CAST(len({_TOKENS_SQL}) AS BIGINT) AS nt,
             CAST(len(list_distinct({_TOKENS_SQL})) AS BIGINT) AS nd,
             CAST(len(list_filter({_TOKENS_SQL},
                                  t -> t IN {_STOPWORDS_SQL})) AS BIGINT)
               AS ns
      FROM documents
    ),
    g AS (
      SELECT (nt BETWEEN {_MIN_TOKENS} AND {_MAX_TOKENS}) AS ga,
             (5 * nd >= 2 * nt) AS gb,
             (50 * ns >= nt) AS gc
      FROM f
    ),
    v AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS v0,
             CAST(SUM(CASE WHEN ga THEN 1 ELSE 0 END) AS BIGINT) AS va,
             CAST(SUM(CASE WHEN gb THEN 1 ELSE 0 END) AS BIGINT) AS vb,
             CAST(SUM(CASE WHEN gc THEN 1 ELSE 0 END) AS BIGINT) AS vc,
             CAST(SUM(CASE WHEN ga AND gb THEN 1 ELSE 0 END) AS BIGINT)
               AS vab,
             CAST(SUM(CASE WHEN ga AND gc THEN 1 ELSE 0 END) AS BIGINT)
               AS vac,
             CAST(SUM(CASE WHEN gb AND gc THEN 1 ELSE 0 END) AS BIGINT)
               AS vbc,
             CAST(SUM(CASE WHEN ga AND gb AND gc THEN 1 ELSE 0 END)
                  AS BIGINT) AS vabc
      FROM g
    )
    SELECT u.gate, u.v_alone, u.phi_sixths,
           (1000 * u.phi_sixths) // 6 AS phi_milli
    FROM v, UNNEST([
      {{'gate': 'len', 'v_alone': v.va,
        'phi_sixths': 2*(v.va - v.v0) + (v.vab - v.vb) + (v.vac - v.vc)
                      + 2*(v.vabc - v.vbc)}},
      {{'gate': 'repetition', 'v_alone': v.vb,
        'phi_sixths': 2*(v.vb - v.v0) + (v.vab - v.va) + (v.vbc - v.vc)
                      + 2*(v.vabc - v.vac)}},
      {{'gate': 'stopword', 'v_alone': v.vc,
        'phi_sixths': 2*(v.vc - v.v0) + (v.vac - v.va) + (v.vbc - v.vb)
                      + 2*(v.vabc - v.vab)}}
    ]) AS t(u)
    """,
)
def q369_gate_shapley(spark, sf_dir):
    """SHAPLEY ATTRIBUTION of the cleaning pipeline's document
    removals across its three gates (length window, repetition,
    stopword - q84's rule family with EXACT integer thresholds):
    phi_g = the average marginal change in kept-document count when
    gate g joins a random coalition of the others. Unlike the naive
    "docs only this gate rejects" number, Shapley values are the
    unique attribution satisfying efficiency - they sum EXACTLY to
    total removals - so overlapping gates split shared removals
    fairly instead of double-counting (the question a data-quality
    postmortem actually asks: which rule is doing the work?).

    Exactness: with n = 3 gates the Shapley weights are sixths, so
    6*phi is a pure bigint combination of the EIGHT coalition counts
    v(S), all computed in ONE conditional aggregate; phi_milli floors
    via the engines' shared truncating division. Efficiency
    (sum(6*phi) = 6*(v(N) - v(empty))) is pinned by a pytest.

    Scale: one map stage (token-array projection), one 8-cell global
    aggregate, a 3-row literal expansion. The corpus is read once
    regardless of coalition count (2^n conditional sums share the
    scan; n here is the GATE count, never data-sized)."""
    docs = t(spark, sf_dir, "documents")
    toks = _tokens()
    f = docs.select(
        F.size(toks).cast("long").alias("nt"),
        F.size(F.array_distinct(toks)).cast("long").alias("nd"),
        F.size(
            F.filter(
                toks,
                lambda c: c.isin(
                    "the", "a", "of", "and", "to", "in", "is", "it",
                    "for", "on",
                ),
            )
        )
        .cast("long")
        .alias("ns"),
    )
    g = f.select(
        F.col("nt").between(_MIN_TOKENS, _MAX_TOKENS).alias("ga"),
        (5 * F.col("nd") >= 2 * F.col("nt")).alias("gb"),
        (50 * F.col("ns") >= F.col("nt")).alias("gc"),
    )

    def cnt(cond, name):
        # when/otherwise, not cond.cast(int): a coalition count must
        # DECIDE - a NULL-text doc (NULL gate booleans) is kept by no
        # gate coalition, exactly the oracle's CASE ... ELSE 0; a
        # NULL cast would poison every v(S) sum (r14 all-NULL census)
        return (
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(name)
        )

    v = g.agg(
        F.count("*").cast("long").alias("v0"),
        cnt(F.col("ga"), "va"),
        cnt(F.col("gb"), "vb"),
        cnt(F.col("gc"), "vc"),
        cnt(F.col("ga") & F.col("gb"), "vab"),
        cnt(F.col("ga") & F.col("gc"), "vac"),
        cnt(F.col("gb") & F.col("gc"), "vbc"),
        cnt(F.col("ga") & F.col("gb") & F.col("gc"), "vabc"),
    )
    phi = {
        "len": "2*(va - v0) + (vab - vb) + (vac - vc) + 2*(vabc - vbc)",
        "repetition": "2*(vb - v0) + (vab - va) + (vbc - vc)"
        " + 2*(vabc - vac)",
        "stopword": "2*(vc - v0) + (vac - va) + (vbc - vb)"
        " + 2*(vabc - vab)",
    }
    alone = {"len": "va", "repetition": "vb", "stopword": "vc"}
    return v.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(gate).alias("gate"),
                        F.col(alone[gate]).alias("v_alone"),
                        F.expr(expr).cast("long").alias("phi_sixths"),
                    )
                    for gate, expr in phi.items()
                ]
            )
        ).alias("u")
    ).select(
        "u.gate",
        "u.v_alone",
        "u.phi_sixths",
        F.expr("(1000 * u.phi_sixths) DIV 6").alias("phi_milli"),
    )
