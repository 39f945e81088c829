"""Statistical-inference suite over ``documents`` — the model-fitting
and hypothesis-testing operators a training-data pipeline runs on top
of its quality signals: smoothed language-model estimation, two-sample
rank tests, an in-engine trained quality classifier, isotonic
calibration of a score against an outcome, and ranked-retrieval
average precision.

Exactness discipline (the suite's integer-first rules, see
plans/registry.py): every cross-engine sum is either an exact integer
count or a micro-unit-FLOORed integer, so partial-aggregation order
can never flip a digit; scalar double arithmetic (ratios, sqrt, the
rational sigmoid) is written as the IDENTICAL expression string on
both engines, which IEEE 754 makes bit-identical; rounding happens
once, at the very end.

Scale discipline: every query is scan → hash-aggregate → joins among
aggregate-bounded frames. The only iterative op (q319) keeps O(1)
driver state (3 coefficients) and scans the data once per step — the
q177/q306/q315 bounded-driver-loop pattern.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from .common import (
    EPOCH_DAY_SQL,
    EVENTS_EPOCH_US,
    US_PER_DAY,
    degenerate_frame,
    global_cumsum,
    global_rn,
    t,
    transient_persist,
)
from .dedup import _LSH_CANDS_SQL, q43_lsh_candidate_pairs
from .mlprep import _h60, _h60_sql
from .registry import query
from .textops import (
    _SCORE_SPARK_SQL,
    _SCORE_SQL,
    _TOKENS_SQL,
    _int_score,
    _tokens,
)

#: shared near-dup outcome label for the score-evaluation family
#: (q287 AUC / q320 isotonic / q321 AP): a document is a POSITIVE if
#: it appears in any LSH candidate pair - the same membership set on
#: both engines via the shared q43 stage / _LSH_CANDS_SQL prefix.
_MEMBERS_SQL = """,
    members AS (
      SELECT DISTINCT doc_id FROM (
        SELECT doc_a AS doc_id FROM cands
        UNION ALL SELECT doc_b FROM cands
      )
    )"""


def _neardup_labeled(spark, sf_dir):
    """(doc_id, score, y) with y = LSH near-dup membership - the
    Spark twin of ``_LSH_CANDS_SQL + _MEMBERS_SQL`` left-joined onto
    ``documents``."""
    cands = q43_lsh_candidate_pairs(spark, sf_dir)
    members = (
        cands.select(F.col("doc_a").alias("doc_id"))
        .union(cands.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    return (
        t(spark, sf_dir, "documents")
        .join(members.withColumn("hit", F.lit(1)), "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_chars").cast("long").alias("n_chars"),
            F.expr(_SCORE_SPARK_SQL).cast("long").alias("score"),
            F.when(F.col("hit").isNotNull(), 1).otherwise(0).alias("y"),
        )
    )

# ---------------------------------------------------------------------------
# q317: interpolated Kneser-Ney bigram probabilities
# ---------------------------------------------------------------------------

#: absolute discount (Chen & Goodman 1999's fixed-D variant). 0.75 is
#: exactly representable, so the discounted numerator stays a clean
#: quarter-integer on both engines.
_KN_D = "0.75"
_KN_TOPN = 30

#: identical arithmetic string on both engines: discounted bigram MLE
#: interpolated with the continuation-probability unigram backoff.
#: c12/c1 are integer counts; n1f = N1+(w1 ·) distinct continuations
#: of w1, n1r = N1+(· w2) distinct histories of w2, nb = N1+(· ·)
#: total distinct bigrams.
_KN_PROB = (
    f"GREATEST(CAST(c12 AS DOUBLE) - {_KN_D}, 0.0) / CAST(c1 AS DOUBLE)"
    f" + {_KN_D} * CAST(n1f AS DOUBLE) / CAST(c1 AS DOUBLE)"
    f" * (CAST(n1r AS DOUBLE) / CAST(nb AS DOUBLE))"
)


@query(
    "q317_kneser_ney_bigrams",
    oracle=f"""
    WITH base AS (SELECT {_TOKENS_SQL} AS toks FROM documents),
    bg AS (
      SELECT unnest(list_transform(
               list_zip(list_slice(toks, 1, len(toks) - 1),
                        list_slice(toks, 2, len(toks))),
               z -> z[1] || ' ' || z[2])) AS bigram
      FROM base
    ),
    c AS (
      SELECT string_split(bigram, ' ')[1] AS w1,
             string_split(bigram, ' ')[2] AS w2,
             COUNT(*) AS c12
      FROM bg GROUP BY 1, 2
    ),
    lhs AS (SELECT w1, SUM(c12) AS c1, COUNT(*) AS n1f FROM c GROUP BY w1),
    cont AS (SELECT w2, COUNT(*) AS n1r FROM c GROUP BY w2),
    tot AS (SELECT COUNT(*) AS nb FROM c)
    SELECT c.w1, c.w2, CAST(c.c12 AS BIGINT) AS cnt,
           ROUND({_KN_PROB}, 6) AS kn_prob
    FROM c JOIN lhs USING (w1) JOIN cont USING (w2) CROSS JOIN tot
    ORDER BY cnt DESC, w1, w2 LIMIT {_KN_TOPN}
    """,
)
def q317_kneser_ney_bigrams(spark, sf_dir):
    """Interpolated KNESER-NEY bigram probabilities (fixed discount
    D=0.75) for the corpus's top-30 bigrams — the smoothing
    every production n-gram LM (KenLM-style perplexity filters) uses,
    and the missing sibling of q281's add-one bigram LM and q288's
    Good-Turing mass: the backoff weight is mass *freed by
    discounting*, and the unigram backoff is the CONTINUATION count
    (how many distinct histories precede w2), not raw frequency.

    Exactness: all four statistics (c12, c1, N1+ forward/reverse, nb)
    are exact integer counts; the probability is ONE identical
    expression string on both engines (IEEE-deterministic), rounded
    6dp once.

    Scale: bigram explode → hash aggregate (map-side combined); the
    three smoothing statistics are further aggregates OF that
    aggregate, joined back on w1/w2 — vocabulary-bounded, never
    fact-sized. The 1-row nb frame rides a broadcast NLJ (adjudicated
    allowlist). Top-N is a TakeOrderedAndProject."""
    docs = t(spark, sf_dir, "documents")
    bigrams = F.expr(
        "zip_with(slice(toks, 1, greatest(size(toks)-1, 0)),"
        "         slice(toks, 2, greatest(size(toks)-1, 0)),"
        "         (a, b) -> concat(a, ' ', b))"
    )
    c = (
        docs.select(_tokens().alias("toks"))
        .select(F.explode(bigrams).alias("bigram"))
        .select(
            F.split(F.col("bigram"), " ").getItem(0).alias("w1"),
            F.split(F.col("bigram"), " ").getItem(1).alias("w2"),
        )
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c12"))
    )
    lhs = c.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count("*").alias("n1f")
    )
    cont = c.groupBy("w2").agg(F.count("*").alias("n1r"))
    tot = c.agg(F.count("*").alias("nb"))
    return (
        c.join(lhs, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.col("c12").cast("long").alias("cnt"),
            F.round(F.expr(_KN_PROB), 6).alias("kn_prob"),
        )
        .orderBy(F.col("cnt").desc(), "w1", "w2")
        .limit(_KN_TOPN)
    )


# ---------------------------------------------------------------------------
# q318: Mann-Whitney U rank test between two sources
# ---------------------------------------------------------------------------

_MWU_A, _MWU_B = "src0", "src1"

#: identical z-statistic string on both engines. u2_0 = 2*U_A (exact
#: integer), mu2 = 2*mu = n0*n1; the tie-corrected variance is the
#: standard normal approximation (Lehmann, Nonparametrics):
#: sigma^2 = n0*n1/12 * ((N+1) - T/(N*(N-1))), T = sum(t^3 - t).
#: z = (U - mu)/sigma = (u2_0 - mu2) / (2*sigma). sqrt is correctly
#: rounded per IEEE 754 on both JVMs and libm, so the whole scalar
#: expression is bit-identical given identical integer inputs.
_MWU_Z = (  # noqa: E501 - NULLIF-wrapped (r11 totality)
    """(CAST(u2_0 AS DOUBLE) - CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE)) / NULLIF((2.0 * SQRT(CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE) / 12.0 * ((CAST(nn AS DOUBLE) + 1.0)    - CAST(tt AS DOUBLE)      / NULLIF((CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0)), 0)))), 0)"""
)


@query(
    "q318_mann_whitney_u",
    oracle=f"""
    WITH x AS (
      SELECT n_chars AS v,
             CASE WHEN source = '{_MWU_A}' THEN 1 ELSE 0 END AS g0,
             CASE WHEN source = '{_MWU_B}' THEN 1 ELSE 0 END AS g1
      FROM documents WHERE source IN ('{_MWU_A}', '{_MWU_B}')
        -- rank tests use LISTWISE DELETION: a missing observation
        -- has no rank (r13 partial-records census)
        AND n_chars IS NOT NULL
    ),
    pv AS (
      SELECT v, SUM(g0) AS c0, SUM(g1) AS c1, COUNT(*) AS ct
      FROM x GROUP BY v
    ),
    rk AS (
      SELECT c0, c1, ct,
             SUM(ct) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - ct
               AS below
      FROM pv
    ),
    s AS (
      SELECT CAST(SUM(c0) AS BIGINT) AS n0,
             CAST(SUM(c1) AS BIGINT) AS n1,
             CAST(SUM(c0) + SUM(c1) AS BIGINT) AS nn,
             CAST(SUM(c0 * (2 * below + ct + 1)) AS BIGINT) AS r2_0,
             CAST(SUM(ct * ct * ct - ct) AS BIGINT) AS tt
      FROM rk
    ),
    u AS (
      SELECT n0, n1, nn, tt,
             r2_0 - n0 * (n0 + 1) AS u2_0
      FROM s
    )
    SELECT n0 AS n_{_MWU_A}, n1 AS n_{_MWU_B},
           CAST(u2_0 AS BIGINT) AS u_times2,
           ROUND({_MWU_Z}, 6) AS z
    FROM u
    """,
)
def q318_mann_whitney_u(spark, sf_dir):
    """MANN-WHITNEY U test: do 'src0' and 'src1' draw their
    document lengths from the same distribution? The rank-based
    two-sample test that needs no normality assumption — the robust
    sibling of q200's KS distance and q295's Wasserstein drift, and
    the standard readout when comparing a new crawl source against an
    incumbent. Ties get average ranks with the textbook variance
    correction.

    Exactness: average ranks are half-integers, so the query carries
    2*rank-sum and 2*U as EXACT BIGINTs end-to-end; the z-score is one
    identical expression string on both engines (IEEE sqrt is
    correctly rounded everywhere), rounded 6dp once.

    Scale: rank sums over ties need no per-row global sort — group by
    the VALUE first (hash aggregate, map-side combined), then a
    window over the distinct-length aggregate (domain-bounded,
    ~hundreds of rows; adjudicated global_window allowlist), then a
    1-row reduce. The fact table is scanned once, shuffled once on
    the length key."""
    x = (
        t(spark, sf_dir, "documents")
        .filter(
            F.col("source").isin(_MWU_A, _MWU_B)
            & F.col("n_chars").isNotNull()
        )
        .select(
            F.col("n_chars").alias("v"),
            F.when(F.col("source") == _MWU_A, 1).otherwise(0).alias("g0"),
            F.when(F.col("source") == _MWU_B, 1).otherwise(0).alias("g1"),
        )
    )
    pv = x.groupBy("v").agg(
        F.sum("g0").alias("c0"),
        F.sum("g1").alias("c1"),
        F.count("*").alias("ct"),
    )
    w = (
        Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rk = pv.select(
        "c0",
        "c1",
        "ct",
        (F.sum("ct").over(w) - F.col("ct")).alias("below"),
    )
    s = rk.agg(
        F.sum("c0").cast("long").alias("n0"),
        F.sum("c1").cast("long").alias("n1"),
        (F.sum("c0") + F.sum("c1")).cast("long").alias("nn"),
        F.sum(
            F.col("c0") * (2 * F.col("below") + F.col("ct") + 1)
        ).cast("long").alias("r2_0"),
        F.sum(
            F.col("ct") * F.col("ct") * F.col("ct") - F.col("ct")
        ).cast("long").alias("tt"),
    )
    u = s.select(
        "n0",
        "n1",
        "nn",
        "tt",
        (F.col("r2_0") - F.col("n0") * (F.col("n0") + 1)).alias("u2_0"),
    )
    return u.select(
        F.col("n0").alias(f"n_{_MWU_A}"),
        F.col("n1").alias(f"n_{_MWU_B}"),
        F.col("u2_0").cast("long").alias("u_times2"),
        F.round(F.expr(_MWU_Z), 6).alias("z"),
    )


# ---------------------------------------------------------------------------
# q319: logistic-regression quality classifier via in-engine gradient descent
# ---------------------------------------------------------------------------

_LR_RATE = 0.5
_LR_STEPS = 5

#: rational sigmoid s(z) = 0.5 + z / (2*(1+|z|)) — the
#: "fast sigmoid" (Elliott 1993). Chosen over exp() DELIBERATELY:
#: add/mul/div/abs are all IEEE-exactly-specified, so per-row
#: activations are bit-identical across engines, where libm exp vs
#: Java Math.exp may differ in the last ulp and would cascade through
#: the training iterations.
_SIG = "(0.5 + z / (2.0 * (1.0 + ABS(z))))"

#: per-row features: x1 = chars in hecto-chars, x2 = distinct-token
#: ratio (the milli-unit quality score); label = "is English".
#: LISTWISE FEATURE DELETION (r14 all-NULL census): a record with a
#: missing feature (NULL text => NULL n_chars and NULL score) cannot
#: contribute a gradient - a real filter-model trainer drops it, and
#: silently letting SUM skip its NULL contribution while COUNT(*)
#: still divides by it would train on a phantom denominator. The
#: label stays DECISIVE (NULL lang = not-English), the r13 doctrine.
_LR_FEAT_SQL = f"""
      SELECT CAST(n_chars AS DOUBLE) / 100.0 AS x1,
             CAST({_SCORE_SQL} AS DOUBLE) / 1000.0 AS x2,
             CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
      FROM documents
      WHERE text IS NOT NULL AND n_chars IS NOT NULL
"""


def _lr_oracle() -> str:
    """Unrolled CTE chain: one gradient CTE + one weight CTE per step
    (the q269/q284 unrolling technique). Gradients are micro-unit
    FLOORed integers, so DuckDB's sequential sum and Spark's partial
    aggregation agree exactly."""
    parts = [
        f"WITH f AS ({_LR_FEAT_SQL}),",
        "n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM f),",
        "w0 AS (SELECT 0.0 AS b, 0.0 AS w1, 0.0 AS w2),",
    ]
    prev = "w0"
    for i in range(1, _LR_STEPS + 1):
        parts.append(
            f"g{i} AS (SELECT "
            "SUM(CAST(FLOOR(r * 1000000.0) AS BIGINT)) AS gb, "
            "SUM(CAST(FLOOR(r * x1 * 1000000.0) AS BIGINT)) AS g1, "
            "SUM(CAST(FLOOR(r * x2 * 1000000.0) AS BIGINT)) AS g2 "
            f"FROM (SELECT {_SIG} - y AS r, x1, x2 FROM "
            f"(SELECT {prev}.b + {prev}.w1 * x1 + {prev}.w2 * x2 AS z,"
            f" x1, x2, y FROM f, {prev}))),"
        )
        parts.append(
            f"w{i} AS (SELECT "
            f"{prev}.b - {_LR_RATE} * (CAST(g{i}.gb AS DOUBLE) / 1000000.0 / n.n) AS b, "
            f"{prev}.w1 - {_LR_RATE} * (CAST(g{i}.g1 AS DOUBLE) / 1000000.0 / n.n) AS w1, "
            f"{prev}.w2 - {_LR_RATE} * (CAST(g{i}.g2 AS DOUBLE) / 1000000.0 / n.n) AS w2 "
            f"FROM {prev}, g{i}, n),"
        )
        prev = f"w{i}"
    parts.append(
        "acc AS (SELECT CAST(SUM(CASE WHEN "
        f"(CASE WHEN {_SIG} >= 0.5 THEN 1.0 ELSE 0.0 END) = y "
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_correct FROM "
        f"(SELECT {prev}.b + {prev}.w1 * x1 + {prev}.w2 * x2 AS z, y "
        f"FROM f, {prev}))"
    )
    parts.append(
        f"SELECT ROUND({prev}.b, 6) AS w_intercept, "
        f"ROUND({prev}.w1, 6) AS w_hectochars, "
        f"ROUND({prev}.w2, 6) AS w_distinct_ratio, "
        "CAST(n.n AS BIGINT) AS n_docs, acc.n_correct "
        f"FROM {prev}, n, acc"
    )
    return "\n".join(parts)


@query("q319_logreg_quality_gd", oracle=_lr_oracle())
def q319_logreg_quality_gd(spark, sf_dir):
    """Train a LOGISTIC-REGRESSION language classifier IN-ENGINE by
    full-batch gradient descent (5 steps, lr=0.5):
    predict "is English" from (document length, distinct-token ratio).
    This is the train-a-filter-model loop a data pipeline runs to
    replace hand-tuned quality thresholds (fastText-style filters),
    expressed the Spark way: the MODEL is 3 driver-held scalars, the
    GRADIENT is one map-side-combined aggregate per step, and the data
    never moves — the q177/q306/q315 bounded-driver-loop pattern.

    Exactness by construction: activations use the rational "fast
    sigmoid" 0.5 + z/(2(1+|z|)) (Elliott 1993) — pure IEEE-exact
    add/mul/div/abs, no libm exp whose last ulp differs across
    engines — and per-row gradient contributions are FLOORed to
    micro-unit BIGINTs before summation, so aggregation order cannot
    change the total. The oracle unrolls the identical 5
    steps as a CTE chain. Final report: weights (6dp), corpus size,
    and integer-exact training accuracy.

    Scale: per step one scan + one 1-row aggregate collect; driver
    state O(features). 100 TB cost = 5 scans, no shuffle at
    all (the aggregate is a global reduce of 3 longs)."""
    feat = (
        t(spark, sf_dir, "documents")
        # listwise feature deletion, stated identically in the
        # oracle's WHERE (see _LR_FEAT_SQL): a missing-feature record
        # trains nothing; the decisive label policy is unchanged
        .filter(F.col("text").isNotNull() & F.col("n_chars").isNotNull())
        .select(
            (F.col("n_chars").cast("double") / 100.0).alias("x1"),
            (F.expr(_SCORE_SPARK_SQL).cast("double") / 1000.0).alias("x2"),
            F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
        )
        .persist()
    )
    n = float(feat.count())
    if n == 0:
        # degenerate corpus: every gradient SUM is NULL and the 1/n
        # update undefined; the oracle's unrolled CTE chain carries
        # the NULLs into an all-NULL readout row with n_docs=0 (SQL
        # aggregate-over-empty) - mirror that row.
        feat.unpersist()
        return degenerate_frame(
            spark,
            "w_intercept double, w_hectochars double, "
            "w_distinct_ratio double, n_docs bigint, n_correct bigint",
            [(None, None, None, 0, None)],
        )
    b, w1, w2 = 0.0, 0.0, 0.0
    for _ in range(_LR_STEPS):
        g = (
            feat.select(
                F.expr(f"({b} + {w1} * x1 + {w2} * x2)").alias("z"),
                "x1",
                "x2",
                "y",
            )
            .select(
                (F.expr(_SIG) - F.col("y")).alias("r"), "x1", "x2"
            )
            .agg(
                F.sum(
                    F.floor(F.col("r") * 1000000.0).cast("long")
                ).alias("gb"),
                F.sum(
                    F.floor(F.col("r") * F.col("x1") * 1000000.0).cast(
                        "long"
                    )
                ).alias("g1"),
                F.sum(
                    F.floor(F.col("r") * F.col("x2") * 1000000.0).cast(
                        "long"
                    )
                ).alias("g2"),
            )
            .collect()[0]
        )
        b = b - _LR_RATE * (g["gb"] / 1000000.0 / n)
        w1 = w1 - _LR_RATE * (g["g1"] / 1000000.0 / n)
        w2 = w2 - _LR_RATE * (g["g2"] / 1000000.0 / n)
    acc = (
        feat.select(
            F.expr(f"({b} + {w1} * x1 + {w2} * x2)").alias("z"), "y"
        )
        .select(
            F.when(
                F.when(F.expr(_SIG) >= 0.5, 1.0).otherwise(0.0)
                == F.col("y"),
                1,
            )
            .otherwise(0)
            .alias("ok")
        )
        .agg(F.sum("ok").cast("long").alias("n_correct"))
        .collect()[0]["n_correct"]
    )
    feat.unpersist()
    out = spark.createDataFrame(
        [(b, w1, w2, int(n), int(acc))],
        "b double, w1 double, w2 double, n_docs bigint, n_correct bigint",
    )
    return out.select(
        F.round("b", 6).alias("w_intercept"),
        F.round("w1", 6).alias("w_hectochars"),
        F.round("w2", 6).alias("w_distinct_ratio"),
        "n_docs",
        "n_correct",
    )


# ---------------------------------------------------------------------------
# q320: isotonic calibration of the quality score against the dup outcome
# ---------------------------------------------------------------------------


@query(
    "q320_isotonic_calibration",
    oracle=_LSH_CANDS_SQL + _MEMBERS_SQL + f""",
    fl AS (
      SELECT CAST({_SCORE_SQL} AS BIGINT) // 100 AS bin,
             CASE WHEN m.doc_id IS NOT NULL THEN 1 ELSE 0 END AS y
      FROM documents d LEFT JOIN members m USING (doc_id)
    ),
    b AS (
      SELECT bin, COUNT(*) AS cnt, SUM(y) AS pos FROM fl GROUP BY bin
    ),
    p AS (
      SELECT bin, cnt, pos,
             SUM(cnt) OVER (ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ccnt,
             SUM(pos) OVER (ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cpos
      FROM b
    ),
    inner_min AS (
      SELECT i.bin AS ib, j.bin AS jb,
             MIN(CAST(k.cpos - j.cpos + j.pos AS DOUBLE)
                 / CAST(k.ccnt - j.ccnt + j.cnt AS DOUBLE)) AS minmean
      FROM p i JOIN p j ON j.bin <= i.bin
               JOIN p k ON k.bin >= i.bin
      GROUP BY i.bin, j.bin
    ),
    fit AS (
      SELECT ib AS bin, MAX(minmean) AS fitted FROM inner_min GROUP BY ib
    )
    SELECT b.bin, CAST(b.cnt AS BIGINT) AS cnt,
           ROUND(CAST(b.pos AS DOUBLE) / CAST(b.cnt AS DOUBLE), 6)
             AS raw_rate,
           ROUND(fit.fitted, 6) AS fitted_rate
    FROM b JOIN fit USING (bin)
    ORDER BY bin
    """,
)
def q320_isotonic_calibration(spark, sf_dir):
    """ISOTONIC REGRESSION calibrating the milli-unit quality score
    against the LSH near-dup outcome (q287's label): per score-decile
    bin, the raw dup rate and the monotone least-squares fit — the
    calibration step that turns an arbitrary quality score into a
    usable probability (Zadrozny & Elkan 2002). q287 answers "does
    the score rank dups correctly AT ALL?" (threshold-free AUC); this
    answers "what dup PROBABILITY does each score decile imply?" —
    the number a keep/drop policy actually thresholds on.

    Spark-first trick: instead of the sequential PAVA pool-adjacent
    loop, use the CLOSED-FORM minimax characterization
    ``fit(i) = max_{{j<=i}} min_{{k>=i}} mean(y[j..k])`` — with bin
    prefix sums, every interval mean is a ratio of two integer
    deltas, so the whole fit is three set-based self-joins on an
    ~11-row aggregate (theta-join NLJs on a bounded frame; adjudicated
    allowlist). No iteration, no driver state, and the interval means
    are identical doubles on both engines (one division of exact
    integers), so min/max pick identical values.

    Scale: the corpus-sized work is the shared LSH candidate stage +
    one label semi-join + one 11-row aggregate; the cubic minimax
    enumeration touches ~10^3 aggregate rows regardless of corpus
    size."""
    fl = _neardup_labeled(spark, sf_dir).select(
        F.expr("score DIV 100").alias("bin"), "y"
    )
    b = fl.groupBy("bin").agg(
        F.count("*").alias("cnt"), F.sum("y").alias("pos")
    )
    w = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    p = b.select(
        "bin",
        "cnt",
        "pos",
        F.sum("cnt").over(w).alias("ccnt"),
        F.sum("pos").over(w).alias("cpos"),
    ).persist()
    i, j, k = p.alias("i"), p.alias("j"), p.alias("k")
    # broadcast the ~11-row aggregate sides: the theta-joins become
    # broadcast NLJs (bounded build, adjudicated) instead of the
    # CartesianProduct Spark would otherwise plan for non-equi joins.
    inner_min = (
        i.join(F.broadcast(j), F.col("j.bin") <= F.col("i.bin"))
        .join(F.broadcast(k), F.col("k.bin") >= F.col("i.bin"))
        .groupBy(F.col("i.bin").alias("ib"), F.col("j.bin").alias("jb"))
        .agg(
            F.min(
                (F.col("k.cpos") - F.col("j.cpos") + F.col("j.pos")).cast(
                    "double"
                )
                / (F.col("k.ccnt") - F.col("j.ccnt") + F.col("j.cnt")).cast(
                    "double"
                )
            ).alias("minmean")
        )
    )
    fit = inner_min.groupBy(F.col("ib").alias("bin")).agg(
        F.max("minmean").alias("fitted")
    )
    return (
        b.join(fit, "bin")
        .select(
            "bin",
            F.col("cnt").cast("long").alias("cnt"),
            F.round(
                F.col("pos").cast("double") / F.col("cnt").cast("double"), 6
            ).alias("raw_rate"),
            F.round("fitted", 6).alias("fitted_rate"),
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# q321: average precision of the quality score as a dup-detector
# ---------------------------------------------------------------------------


@query(
    "q321_average_precision",
    oracle=_LSH_CANDS_SQL + _MEMBERS_SQL + f""",
    fl AS (
      SELECT d.doc_id, CAST({_SCORE_SQL} AS BIGINT) AS score,
             CASE WHEN m.doc_id IS NOT NULL THEN 1 ELSE 0 END AS y
      FROM documents d LEFT JOIN members m USING (doc_id)
    ),
    rk AS (
      SELECT y,
             ROW_NUMBER() OVER (ORDER BY score, doc_id) AS rn,
             SUM(y) OVER (ORDER BY score, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cpos
      FROM fl
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(y) AS BIGINT) AS n_pos,
           ROUND(CAST(SUM(CASE WHEN y = 1 THEN
                   CAST(FLOOR(CAST(cpos AS DOUBLE) / CAST(rn AS DOUBLE)
                              * 1000000000.0) AS BIGINT)
                 ELSE 0 END) AS DOUBLE)
                 / 1000000000.0 / CAST(SUM(y) AS DOUBLE), 6) AS ap
    FROM rk
    """,
)
def q321_average_precision(spark, sf_dir):
    """AVERAGE PRECISION of "low quality score predicts near-dup"
    (q287's LSH-membership label): rank documents most-suspicious
    first (score ASC — low distinct-token ratio first), then average
    the precision at every positive. AP is the PR-curve area the
    dedup literature reports alongside q287's ROC-AUC; ROC-AUC is
    prevalence-blind, AP is the one that moves when positives are
    rare — which is exactly the duplicated-document regime. AP near
    the positive base rate is the null reading; above it, the score
    carries dedup signal.

    Exactness: each positive's precision cpos/rn is quantized to
    nano-unit BIGINTs BEFORE summation (FLOOR of one IEEE division of
    exact integers — identical on both engines), so the sum is
    order-independent; one final divide + 6dp round.

    Scale: the global (score ASC, doc_id) rank + running positive
    count use the two-pass range-partitioned prefix primitive
    (``global_cumsum`` — no single-partition window anywhere); the
    rest is one global reduce to a single row, plus the shared LSH
    label stage."""
    fl = _neardup_labeled(spark, sf_dir)
    rk, _total, _sums = global_cumsum(
        fl,
        [F.asc("score"), F.asc("doc_id")],
        sums=[("y", "cpos")],
        rn_col="rn",
    )
    return rk.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("y").cast("long").alias("n_pos"),
        F.round(
            F.sum(
                F.when(
                    F.col("y") == 1,
                    F.floor(
                        F.col("cpos").cast("double")
                        / F.col("rn").cast("double")
                        * 1000000000.0
                    ).cast("long"),
                ).otherwise(F.lit(0))
            ).cast("double")
            / 1000000000.0
            / F.nullif(F.sum("y").cast("double"), F.lit(0.0)),
            6,
        ).alias("ap"),
    )


# ---------------------------------------------------------------------------
# q325: greedy decoding from the corpus bigram LM
# ---------------------------------------------------------------------------

#: decode length (including the seed token). Greedy argmax is the
#: deterministic decode; each step's pick is pinned by (count DESC,
#: token ASC).
_DEC_STEPS = 12


def _decode_oracle() -> str:
    """Unrolled greedy walk: one MATERIALIZED CTE per step (the
    q269/q284 unrolling technique - DuckDB would otherwise inline the
    chain exponentially)."""
    head = f"""
    WITH base AS (SELECT {_TOKENS_SQL} AS toks FROM documents),
    bg AS MATERIALIZED (
      SELECT string_split(b.bigram, ' ')[1] AS w1,
             string_split(b.bigram, ' ')[2] AS w2,
             COUNT(*) AS cnt
      FROM (
        SELECT unnest(list_transform(
                 list_zip(list_slice(toks, 1, len(toks) - 1),
                          list_slice(toks, 2, len(toks))),
                 z -> z[1] || ' ' || z[2])) AS bigram
        FROM base
      ) b GROUP BY 1, 2
    ),
    uni AS MATERIALIZED (
      SELECT unnest(toks) AS w FROM base
    ),
    s1 AS MATERIALIZED (
      SELECT w AS tok, COUNT(*) AS cnt FROM uni
      GROUP BY w ORDER BY cnt DESC, w LIMIT 1
    )"""
    parts = [head]
    for i in range(2, _DEC_STEPS + 1):
        parts.append(
            f"""
    s{i} AS MATERIALIZED (
      SELECT w2 AS tok, cnt FROM bg
      WHERE w1 = (SELECT tok FROM s{i - 1})
      ORDER BY cnt DESC, w2 LIMIT 1
    )"""
        )
    final = "\n    UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS step, tok, CAST(cnt AS BIGINT)"
        f" AS cnt FROM s{i}"
        for i in range(1, _DEC_STEPS + 1)
    )
    return ",".join(parts) + "\n    " + final


@query("q325_greedy_lm_decode", oracle=_decode_oracle())
def q325_greedy_lm_decode(spark, sf_dir):
    """GREEDY DECODING from the corpus bigram LM: seed with the
    most-frequent unigram, then 12-1 times emit the
    argmax-count continuation of the previous token - the
    deterministic inference pass over the same n-gram statistics
    q317 smooths and q281 scores with, closing the LM lifecycle
    (estimate -> smooth -> evaluate -> GENERATE) inside the engine.
    Ties pin to the lexicographically-smallest token, so the decoded
    sequence is unique.

    Spark-first: the walk is ONE LAZY PLAN, not a driver loop. The
    greedy TRANSITION TABLE - per history, its argmax continuation
    via min_by over a (-cnt, w2) struct (the q306 hash-argmax idiom)
    - is computed ONCE as a vocabulary-bounded aggregate of the
    bigram census and persisted; each of the 12-1 steps is
    then a constant-cost lookup join of the previous 1-row frame
    (broadcast) against that cached table, not a re-aggregation of
    the census (the first cut re-aggregated per step: 5.6s -> this
    shape ~1s warm). The corpus is scanned once. All-integer
    outputs: nothing to round.

    A dead-end token (no outgoing bigram) truncates the sequence
    identically on both engines (empty argmax -> empty step frame)."""
    docs = t(spark, sf_dir, "documents")
    bigrams = F.expr(
        "zip_with(slice(toks, 1, greatest(size(toks)-1, 0)),"
        "         slice(toks, 2, greatest(size(toks)-1, 0)),"
        "         (a, b) -> concat(a, ' ', b))"
    )
    toks = docs.select(_tokens().alias("toks"))
    bg = (
        toks.select(F.explode(bigrams).alias("bigram"))
        .select(
            F.split(F.col("bigram"), " ").getItem(0).alias("w1"),
            F.split(F.col("bigram"), " ").getItem(1).alias("w2"),
        )
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("cnt"))
    )
    # the greedy transition function: w1 -> its (cnt DESC, w2 ASC)
    # argmax continuation, via min_by over a (-cnt, w2) struct that
    # carries the count along. One vocabulary-bounded aggregate.
    trans = transient_persist(
        bg.groupBy("w1").agg(
            F.min_by(
                F.struct(F.col("w2").alias("tok"), F.col("cnt")),
                F.struct(-F.col("cnt"), F.col("w2")),
            ).alias("s")
        ).select(
            "w1",
            F.col("s.tok").alias("tok"),
            F.col("s.cnt").alias("cnt"),
        )
        # hash-bucketed by w1: bigram TYPES grow near-linearly with
        # corpus tokens (Heaps), so a 1-partition cache would funnel
        # a data-proportional frame through one task at 100x scale
        # (VERDICT r7 item 2). Each per-step lookup filter scans the
        # cached buckets in parallel instead.
        .repartition("w1")
    )
    seed = (
        toks.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "w")
        .limit(1)
        .first()
    )
    if seed is None:  # degenerate corpus: oracle's s1 CTE is empty too
        return degenerate_frame(spark, "step bigint, tok string, cnt bigint")
    decoded: list[tuple[int, str, int]] = [
        (1, seed["w"], int(seed["cnt"]))
    ]
    prev = seed["w"]
    # the walk itself: O(1) driver state (the current token), one
    # constant-cost filter on the CACHED transition table per step -
    # the q177 per-iteration-job pattern. A lazy chained-join version
    # measured 3.9s warm (each step's broadcast re-derived its whole
    # lineage); this shape is the same 11 tiny jobs without the
    # quadratic recompute.
    for i in range(2, _DEC_STEPS + 1):
        hit = trans.filter(F.col("w1") == F.lit(prev)).first()
        if hit is None:  # dead end: truncate, matching the oracle
            break
        decoded.append((i, hit["tok"], int(hit["cnt"])))
        prev = hit["tok"]
    trans.unpersist()
    return spark.createDataFrame(
        decoded, "step long, tok string, cnt long"
    )


# ---------------------------------------------------------------------------
# q326: Spearman rank correlation of quality signals, per source
# ---------------------------------------------------------------------------


@query(
    "q326_spearman_rank_corr",
    oracle=f"""
    WITH sig AS (
      SELECT source,
             CAST(n_chars AS BIGINT) AS x,
             CAST({_SCORE_SQL} AS BIGINT) AS y
      FROM documents
    ),
    rk AS (
      SELECT source,
             2 * RANK() OVER (PARTITION BY source ORDER BY x)
               + COUNT(*) OVER (PARTITION BY source, x) - 1 AS rx,
             2 * RANK() OVER (PARTITION BY source ORDER BY y)
               + COUNT(*) OVER (PARTITION BY source, y) - 1 AS ry
      FROM sig
    ),
    m AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(rx) AS BIGINT) AS sx,
             CAST(SUM(ry) AS BIGINT) AS sy,
             CAST(SUM(rx * rx) AS BIGINT) AS sxx,
             CAST(SUM(ry * ry) AS BIGINT) AS syy,
             CAST(SUM(rx * ry) AS BIGINT) AS sxy
      FROM rk GROUP BY source
    )
    SELECT source, n AS n_docs,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE) /
                 (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
                  sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
             AS rho_spearman
    FROM m
    """,
)
def q326_spearman_rank_corr(spark, sf_dir):
    """SPEARMAN rank correlation between char length and the
    milli-unit quality score, per source - the monotone-association
    audit that catches what q307's Pearson misses: a signal pair can
    be strongly monotonically related (one is a saturating function
    of the other) while linearly correlating near zero, and a quality
    ensemble should not double-count two signals that RANK documents
    identically.

    Exactness: ties get the textbook AVERAGE rank, kept integral by
    DOUBLING it - a tie block at min-rank r of size c has average
    rank r + (c-1)/2, so 2*avg = 2*RANK() + COUNT(tie block) - 1 is
    an exact integer (scaling both rank vectors by 2 leaves the
    correlation unchanged). All six moments are exact BIGINT sums
    (DuckDB's HUGEINT sums are cast back down, the q230 lesson);
    the correlation formula is the identical expression string on
    both engines, and every product stays far below 2^53 at suite
    scale (per-source n ~ thousands; at 100 TB per-source moments
    would move to DECIMAL(38) or the mean-centered double form).

    Scale: rank windows are PARTITIONED BY source (parallel across
    the corpus, q318's tie-rank discipline without its global
    frame), then one hash-aggregate computes all moments in a single
    partial-aggregated pass; |sources| rows out, no joins."""
    sig = t(spark, sf_dir, "documents").select(
        "source",
        F.col("n_chars").cast("long").alias("x"),
        F.expr(_SCORE_SPARK_SQL).cast("long").alias("y"),
    )
    rk = sig.select(
        "source",
        (
            2 * F.rank().over(Window.partitionBy("source").orderBy("x"))
            + F.count("*").over(Window.partitionBy("source", "x"))
            - 1
        ).cast("long").alias("rx"),
        (
            2 * F.rank().over(Window.partitionBy("source").orderBy("y"))
            + F.count("*").over(Window.partitionBy("source", "y"))
            - 1
        ).cast("long").alias("ry"),
    )
    m = rk.groupBy("source").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("rx").cast("long").alias("sx"),
        F.sum("ry").cast("long").alias("sy"),
        F.sum(F.col("rx") * F.col("rx")).cast("long").alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).cast("long").alias("syy"),
        F.sum(F.col("rx") * F.col("ry")).cast("long").alias("sxy"),
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
    return m.select(
        "source",
        F.col("n").alias("n_docs"),
        F.round(
            num / F.nullif(F.sqrt(vx) * F.sqrt(vy), F.lit(0.0)), 6
        ).alias(
            "rho_spearman"
        ),
    )


# ---------------------------------------------------------------------------
# q327: Kendall tau-b between daily order count and daily revenue
# ---------------------------------------------------------------------------


@query(
    "q327_kendall_tau_daily",
    oracle="""
    WITH d AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS x,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS y
      FROM orders WHERE year(o_orderdate) = 1995
      GROUP BY 1
    ),
    p AS (
      SELECT
        CAST(SUM(CASE WHEN (a.x < b.x AND a.y < b.y)
                        OR (a.x > b.x AND a.y > b.y)
                 THEN 1 ELSE 0 END) AS BIGINT) AS conc,
        CAST(SUM(CASE WHEN (a.x < b.x AND a.y > b.y)
                        OR (a.x > b.x AND a.y < b.y)
                 THEN 1 ELSE 0 END) AS BIGINT) AS disc,
        CAST(SUM(CASE WHEN a.x = b.x AND a.y <> b.y
                 THEN 1 ELSE 0 END) AS BIGINT) AS tx,
        CAST(SUM(CASE WHEN a.y = b.y AND a.x <> b.x
                 THEN 1 ELSE 0 END) AS BIGINT) AS ty,
        CAST(SUM(CASE WHEN a.x = b.x AND a.y = b.y
                 THEN 1 ELSE 0 END) AS BIGINT) AS tb
      FROM d a JOIN d b ON a.day < b.day
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d)
    SELECT nn.n AS n_days, p.conc AS concordant, p.disc AS discordant,
           p.tx AS ties_x, p.ty AS ties_y, p.tb AS ties_both,
           ROUND(CAST(p.conc - p.disc AS DOUBLE) /
                 NULLIF(sqrt(CAST(nn.n * (nn.n - 1) / 2 - (p.tx + p.tb)
                      AS DOUBLE) *
                      CAST(nn.n * (nn.n - 1) / 2 - (p.ty + p.tb)
                      AS DOUBLE)), 0), 6) AS tau_b
    FROM p, nn
    """,
)
def q327_kendall_tau_daily(spark, sf_dir):
    """KENDALL tau-b rank association between the 1995 daily order
    count and daily revenue - the concordant-pair statistic that
    complements q326: Spearman correlates rank POSITIONS (sensitive
    to how far apart discordances land), tau measures the PROBABILITY
    a random day pair agrees in direction, with the tau-b tie
    correction making it exact on a discrete series where equal-count
    days are common.

    Exactness: the series collapses to integer (count, revenue-cents)
    per day - cents via per-row round(price*100) BEFORE the sum, so
    the aggregate is an exact BIGINT sum in both engines regardless
    of partial-aggregation order (never a float sum). Concordant /
    discordant / tie counts are integer pair counts; tau-b's
    denominator products (~(66k)^2 ~ 4.4e9) are exact doubles, and
    the formula is the identical expression string on both engines.

    Scale: the ONLY fact-sized work is the groupBy(day) aggregate -
    the pair stage is a self-join of the 365-row CALENDAR-bounded
    daily frame (66k comparisons, constant in data volume: 100 TB of
    orders still collapses to |days| rows first). The non-equi pair
    join broadcasts the explicitly-bounded aggregate side
    (adjudicated BNLJ, the q323 bounded-frame discipline); an
    O(n log n) merge-sort tau exists but is pointless below millions
    of DAYS."""
    d = transient_persist(
        t(spark, sf_dir, "orders")
        .filter(F.year("o_orderdate") == 1995)
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.count("*").cast("long").alias("x"),
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("long")
            ).cast("long").alias("y"),
        )
    )
    a = d.select(
        F.col("day").alias("day_a"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
    )
    b = d.select(
        F.col("day").alias("day_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
    )
    p = (
        a.join(F.broadcast(b), F.col("day_a") < F.col("day_b"))
        .agg(
            F.sum(
                F.when(
                    ((F.col("xa") < F.col("xb")) & (F.col("ya") < F.col("yb")))
                    | ((F.col("xa") > F.col("xb")) & (F.col("ya") > F.col("yb"))),
                    1,
                ).otherwise(0)
            ).cast("long").alias("conc"),
            F.sum(
                F.when(
                    ((F.col("xa") < F.col("xb")) & (F.col("ya") > F.col("yb")))
                    | ((F.col("xa") > F.col("xb")) & (F.col("ya") < F.col("yb"))),
                    1,
                ).otherwise(0)
            ).cast("long").alias("disc"),
            F.sum(
                F.when(
                    (F.col("xa") == F.col("xb"))
                    & (F.col("ya") != F.col("yb")),
                    1,
                ).otherwise(0)
            ).cast("long").alias("tx"),
            F.sum(
                F.when(
                    (F.col("ya") == F.col("yb"))
                    & (F.col("xa") != F.col("xb")),
                    1,
                ).otherwise(0)
            ).cast("long").alias("ty"),
            F.sum(
                F.when(
                    (F.col("xa") == F.col("xb"))
                    & (F.col("ya") == F.col("yb")),
                    1,
                ).otherwise(0)
            ).cast("long").alias("tb"),
        )
    )
    nn = d.agg(F.count("*").cast("long").alias("n"))
    n0 = (F.col("n") * (F.col("n") - 1) / 2).cast("long")
    return (
        p.crossJoin(F.broadcast(nn))
        .select(
            F.col("n").alias("n_days"),
            F.col("conc").alias("concordant"),
            F.col("disc").alias("discordant"),
            F.col("tx").alias("ties_x"),
            F.col("ty").alias("ties_y"),
            F.col("tb").alias("ties_both"),
            F.round(
                (F.col("conc") - F.col("disc")).cast("double")
                / F.nullif(
                    F.sqrt(
                        (n0 - (F.col("tx") + F.col("tb"))).cast("double")
                        * (n0 - (F.col("ty") + F.col("tb"))).cast("double")
                    ),
                    F.lit(0.0),
                ),
                6,
            ).alias("tau_b"),
        )
    )


# ---------------------------------------------------------------------------
# q330: delete-a-group jackknife for the corpus mean document length
# ---------------------------------------------------------------------------


@query(
    "q330_jackknife_group_mean",
    oracle="""
    WITH g AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_i,
             CAST(SUM(n_chars) AS BIGINT) AS s_i
      FROM documents GROUP BY source
    ),
    tot AS (
      SELECT CAST(SUM(n_i) AS BIGINT) AS n,
             CAST(SUM(s_i) AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM g
    ),
    loo AS (
      SELECT g.source, g.n_i,
             ((tot.s - g.s_i) * 1000000) // (tot.n - g.n_i)
               AS theta_u,
             tot.n AS n, tot.s AS s, tot.k AS k
      FROM g, tot
    ),
    mu AS (
      SELECT CAST(SUM(theta_u) AS BIGINT) // MAX(k) AS mean_u,
             CAST(SUM(theta_u) AS BIGINT) AS sum_u
      FROM loo
    ),
    dev AS (
      SELECT CAST(SUM((theta_u - mu.mean_u) * (theta_u - mu.mean_u))
                  AS BIGINT) AS ss
      FROM loo, mu
    )
    SELECT loo.source, loo.n_i AS n_docs,
           ROUND(theta_u / 1000000.0, 6) AS loo_mean,
           ROUND(CAST(loo.s AS DOUBLE) / loo.n, 6) AS corpus_mean,
           ROUND(sqrt(CAST((loo.k - 1) * dev.ss AS DOUBLE) / loo.k)
                 / 1000000.0, 6) AS jackknife_se
    FROM loo, mu, dev
    """,
)
def q330_jackknife_group_mean(spark, sf_dir):
    """DELETE-A-GROUP JACKKNIFE standard error for the corpus mean
    document length, leaving out one SOURCE at a time - the
    resampling design that respects the corpus's real sampling unit:
    documents within a source are correlated (one crawl, one domain),
    so q314's per-row Poisson bootstrap understates the variance of
    any source-clustered statistic. Dropping whole groups is the
    grouped-data complement (Efron & Tibshirani ch. 11; the
    delete-a-group variant is how large survey pipelines estimate
    design-based variance).

    Exactness: each leave-one-out mean is quantized to micro-units by
    INTEGER division - ((S - s_i) * 1e6) // (N - n_i) is pure bigint
    arithmetic, no float anywhere in the estimate. The variance is
    computed from mean-CENTERED integer deviations (theta_u -
    mean_u), keeping every product below 2^53 where the raw
    sum-of-squares form would overflow bigint at ~5e8-micro-unit
    means; the final sqrt/divide is the identical expression string
    on both engines (the q319 micro-unit discipline).

    Scale: one groupBy(source) over the corpus, then every subsequent
    frame is |sources|-row or 1-row - the three crossJoins multiply
    against 1-row aggregates (adjudicated NLJ). The jackknife needs
    NO second data pass: (S - s_i)/(N - n_i) derives all k leave-out
    estimates from the single sufficient-statistics frame."""
    g = t(spark, sf_dir, "documents").groupBy("source").agg(
        F.count("*").cast("long").alias("n_i"),
        F.sum("n_chars").cast("long").alias("s_i"),
    )
    tot = g.agg(
        F.sum("n_i").cast("long").alias("n"),
        F.sum("s_i").cast("long").alias("s"),
        F.count("*").cast("long").alias("k"),
    )
    loo = transient_persist(
        g.crossJoin(F.broadcast(tot)).select(
            "source",
            "n_i",
            F.expr(
                "((s - s_i) * 1000000) DIV NULLIF(n - n_i, 0)"
            ).alias("theta_u"),
            "n",
            "s",
            "k",
        )
    )
    mu = loo.agg(
        F.expr("CAST(SUM(theta_u) AS LONG) DIV MAX(k)").alias("mean_u")
    )
    dev = (
        loo.crossJoin(F.broadcast(mu))
        .agg(
            F.sum(
                (F.col("theta_u") - F.col("mean_u"))
                * (F.col("theta_u") - F.col("mean_u"))
            ).cast("long").alias("ss")
        )
    )
    return (
        loo.crossJoin(F.broadcast(dev))
        .select(
            "source",
            F.col("n_i").alias("n_docs"),
            F.round(F.col("theta_u") / 1000000.0, 6).alias("loo_mean"),
            F.round(F.col("s").cast("double") / F.col("n"), 6).alias(
                "corpus_mean"
            ),
            F.round(
                F.sqrt(
                    ((F.col("k") - 1) * F.col("ss")).cast("double")
                    / F.col("k")
                )
                / 1000000.0,
                6,
            ).alias("jackknife_se"),
        )
    )


# ---------------------------------------------------------------------------
# q337: multinomial Naive Bayes language classifier (train + apply)
# ---------------------------------------------------------------------------

#: micro-log quantum shared by weights and prior: every log-prob is
#: FLOOR-quantized to integer micro-units BEFORE any sum, so the
#: per-document score is pure bigint arithmetic (order-independent by
#: construction) and the only cross-engine float exposure is the
#: adjudicated FLOOR(LN(...)*1e6) boundary class (q313/q328).
_NB_Q = "1000000"


@query(
    "q337_naive_bayes_lang",
    oracle=f"""
    WITH split AS (
      SELECT doc_id, text, source,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
             {_h60_sql("CAST(doc_id AS VARCHAR)")} % 100 AS bucket
      FROM documents
    ),
    tr AS (SELECT * FROM split WHERE bucket < 80),
    te AS (SELECT * FROM split WHERE bucket >= 90),
    trtc AS (
      SELECT term, y, COUNT(*) AS c
      FROM (SELECT y, unnest({_TOKENS_SQL}) AS term FROM tr)
      GROUP BY term, y
    ),
    model AS (
      SELECT term,
             CAST(SUM(CASE WHEN y = 1 THEN c ELSE 0 END) AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN y = 0 THEN c ELSE 0 END) AS BIGINT) AS c0
      FROM trtc GROUP BY term
    ),
    stats AS (
      SELECT CAST(SUM(c1) AS BIGINT) AS n1tok,
             CAST(SUM(c0) AS BIGINT) AS n0tok,
             CAST(COUNT(*) AS BIGINT) AS v
      FROM model
    ),
    prior AS (
      SELECT CAST(FLOOR(LN(CASE WHEN SUM(y) > 0 AND SUM(1 - y) > 0
                           THEN CAST(SUM(y) AS DOUBLE) / SUM(1 - y) END)
                        * {_NB_Q}) AS BIGINT) AS prior_u
      FROM tr
    ),
    wts AS (
      SELECT term,
             CAST(FLOOR(LN(CAST(c1 + 1 AS DOUBLE) / (n1tok + v))
                        * {_NB_Q}) AS BIGINT)
             - CAST(FLOOR(LN(CAST(c0 + 1 AS DOUBLE) / (n0tok + v))
                          * {_NB_Q}) AS BIGINT) AS delta_u
      FROM model, stats
    ),
    tetc AS (
      SELECT doc_id, term, COUNT(*) AS n
      FROM (SELECT doc_id, unnest({_TOKENS_SQL}) AS term FROM te)
      GROUP BY doc_id, term
    ),
    contrib AS (
      SELECT tetc.doc_id,
             CAST(SUM(tetc.n * wts.delta_u) AS BIGINT) AS dot_u
      FROM tetc JOIN wts USING (term)
      GROUP BY tetc.doc_id
    ),
    pred AS (
      SELECT te.source, te.y,
             CASE WHEN prior.prior_u + COALESCE(contrib.dot_u, 0) > 0
                  THEN 1 ELSE 0 END AS yhat
      FROM te LEFT JOIN contrib USING (doc_id) CROSS JOIN prior
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           CAST(SUM(CASE WHEN y = 1 AND yhat = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS tp,
           CAST(SUM(CASE WHEN y = 0 AND yhat = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS fp,
           CAST(SUM(CASE WHEN y = 1 AND yhat = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS fn,
           CAST(SUM(CASE WHEN y = 0 AND yhat = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS tn,
           (1000 * CAST(SUM(CASE WHEN y = yhat THEN 1 ELSE 0 END)
                        AS BIGINT)) // COUNT(*) AS acc_milli
    FROM pred GROUP BY source
    """,
)
def q337_naive_bayes_lang(spark, sf_dir):
    """MULTINOMIAL NAIVE BAYES trained and applied entirely in-engine:
    fit a Laplace-smoothed bag-of-words classifier for lang='en' on
    the q79 hash-split train fold (buckets 0-79), score the held-out
    test fold (buckets 90-99), and report the per-source confusion
    matrix — the fastText-style model-based quality/language gate
    every corpus pipeline runs where heuristics (q32's n-gram
    lang-id, q84's rule gate) stop being enough, here as pure
    DataFrame algebra instead of an external model server.

    Exactness: every log-probability is FLOOR-quantized to integer
    micro-units BEFORE any summation, so a document's score is
    ``prior_u + SUM(count * delta_u)`` — bigint arithmetic whose
    value is independent of Spark's partial-aggregation order. The
    only float exposure is the adjudicated FLOOR(LN)*1e6 boundary
    class (q313): LN's argument is a ratio of exact integers, so both
    engines floor the same double except within ~1 ulp of a quantum
    edge. The decision threshold (score > 0) then compares exact
    integers.

    Scale: train pass = token explode → (term, class) hash aggregate;
    the MODEL is vocabulary-bounded (never corpus-sized) and the
    smoothing statistics are 1-row aggregates riding broadcast NLJs
    (adjudicated). Apply pass = test-fold explode → (doc, term) hash
    aggregate → term-keyed equi-join against the model (AQE
    broadcasts it when small, shuffles when not — no forced hint) →
    per-doc hash aggregate. No windows, no iteration, no driver
    state; at 100 TB the model is a table both folds stream against.
    """
    docs = t(spark, sf_dir, "documents")
    split = docs.select(
        "doc_id",
        "text",
        "source",
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        (_h60(F.col("doc_id").cast("string")) % 100).alias("bucket"),
    )
    tr = split.filter(F.col("bucket") < 80)
    te = split.filter(F.col("bucket") >= 90)
    trtc = (
        tr.select("y", F.explode(_tokens()).alias("term"))
        .groupBy("term", "y")
        .agg(F.count("*").alias("c"))
    )
    model = trtc.groupBy("term").agg(
        F.sum(F.when(F.col("y") == 1, F.col("c")).otherwise(0))
        .cast("long")
        .alias("c1"),
        F.sum(F.when(F.col("y") == 0, F.col("c")).otherwise(0))
        .cast("long")
        .alias("c0"),
    )
    stats = model.agg(
        F.sum("c1").cast("long").alias("n1tok"),
        F.sum("c0").cast("long").alias("n0tok"),
        F.count("*").cast("long").alias("v"),
    )
    prior = tr.agg(
        F.expr(
            f"CAST(FLOOR(LN(CASE WHEN SUM(y) > 0 AND SUM(1 - y) > 0"
            f" THEN CAST(SUM(y) AS DOUBLE) / SUM(1 - y) END)"
            f" * {_NB_Q}) AS LONG)"
        ).alias("prior_u")
    )
    wts = model.crossJoin(F.broadcast(stats)).select(
        "term",
        (
            F.expr(
                f"CAST(FLOOR(LN(CAST(c1 + 1 AS DOUBLE) / (n1tok + v))"
                f" * {_NB_Q}) AS LONG)"
            )
            - F.expr(
                f"CAST(FLOOR(LN(CAST(c0 + 1 AS DOUBLE) / (n0tok + v))"
                f" * {_NB_Q}) AS LONG)"
            )
        ).alias("delta_u"),
    )
    tetc = (
        te.select("doc_id", F.explode(_tokens()).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("n"))
    )
    contrib = (
        tetc.join(wts, "term")
        .groupBy("doc_id")
        .agg(F.sum(F.col("n") * F.col("delta_u")).cast("long").alias("dot_u"))
    )
    pred = (
        te.join(contrib, "doc_id", "left")
        .crossJoin(F.broadcast(prior))
        .select(
            "source",
            "y",
            F.when(
                F.col("prior_u") + F.coalesce(F.col("dot_u"), F.lit(0)) > 0,
                1,
            )
            .otherwise(0)
            .alias("yhat"),
        )
    )
    return pred.groupBy("source").agg(
        F.count("*").cast("long").alias("n_test"),
        F.sum(F.when((F.col("y") == 1) & (F.col("yhat") == 1), 1).otherwise(0))
        .cast("long")
        .alias("tp"),
        F.sum(F.when((F.col("y") == 0) & (F.col("yhat") == 1), 1).otherwise(0))
        .cast("long")
        .alias("fp"),
        F.sum(F.when((F.col("y") == 1) & (F.col("yhat") == 0), 1).otherwise(0))
        .cast("long")
        .alias("fn"),
        F.sum(F.when((F.col("y") == 0) & (F.col("yhat") == 0), 1).otherwise(0))
        .cast("long")
        .alias("tn"),
        F.expr(
            "(1000 * CAST(SUM(CASE WHEN y = yhat THEN 1 ELSE 0 END)"
            " AS LONG)) DIV COUNT(*)"
        ).alias("acc_milli"),
    )


# ---------------------------------------------------------------------------
# q338: Brier score + expected calibration error of the quality score
# ---------------------------------------------------------------------------


@query(
    "q338_brier_ece_calibration",
    oracle=_LSH_CANDS_SQL + _MEMBERS_SQL + f""",
    fl AS (
      SELECT CAST({_SCORE_SQL} AS BIGINT) AS s,
             CASE WHEN m.doc_id IS NOT NULL THEN 1 ELSE 0 END AS y
      FROM documents d LEFT JOIN members m USING (doc_id)
    ),
    b AS (
      SELECT s // 100 AS bin,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS pos,
             CAST(SUM(s) AS BIGINT) AS sum_s
      FROM fl GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS nn,
             (1000000 * CAST(SUM(ABS(1000 * pos - sum_s)) AS BIGINT))
               // (1000 * CAST(SUM(n) AS BIGINT)) AS ece_micro
      FROM b
    ),
    br AS (
      SELECT CAST(SUM((s - 1000 * y) * (s - 1000 * y)) AS BIGINT)
               // COUNT(*) AS brier_micro
      FROM fl
    )
    SELECT b.bin, b.n, b.pos,
           sum_s // n AS conf_milli,
           (1000 * pos) // n AS rate_milli,
           tot.ece_micro, br.brier_micro
    FROM b, tot, br
    ORDER BY b.bin
    """,
)
def q338_brier_ece_calibration(spark, sf_dir):
    """BRIER SCORE + EXPECTED CALIBRATION ERROR of the milli-unit
    quality score read as a near-dup probability — the reliability
    audit that complements q287 (threshold-free ranking power) and
    q320 (the monotone recalibration itself): ECE says how far the
    raw score is from being a probability BEFORE recalibrating, and
    the Brier score is the proper scoring rule a gate comparison
    should optimize (Murphy 1973 decomposition's calibration term is
    exactly the per-bin |rate - confidence| mass this query surfaces).

    Exactness — no float anywhere: with the milli-unit score s and
    binary y, ``n_b * |acc_b - conf_b| = |1000*pos_b - sum_s_b| / 1000``
    exactly, so ``ece_micro = (1e6 * SUM|1000*pos_b - sum_s_b|) DIV
    (1000*N)`` and ``brier_micro = SUM((s - 1000y)^2) DIV N`` are pure
    bigint folds — order-independent by construction, no quantization
    drift class at all (stronger than the FLOOR(LN) queries). Products
    stay under 2^63 through ~10^9 documents.

    Scale: the corpus-sized work is the shared LSH candidate stage
    (amortized across the q287/q320/q321/q338 family) + one label
    left-join + one ~11-row hash aggregate; ECE/Brier are 1-row folds
    riding broadcast NLJs (adjudicated)."""
    fl = _neardup_labeled(spark, sf_dir).select(F.col("score").alias("s"), "y")
    b = fl.groupBy(F.expr("s DIV 100").alias("bin")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("pos"),
        F.sum("s").cast("long").alias("sum_s"),
    )
    tot = b.agg(
        F.expr(
            "(1000000 * CAST(SUM(ABS(1000 * pos - sum_s)) AS LONG))"
            " DIV (1000 * CAST(SUM(n) AS LONG))"
        ).alias("ece_micro")
    )
    br = fl.agg(
        F.expr(
            "CAST(SUM((s - 1000 * y) * (s - 1000 * y)) AS LONG)"
            " DIV COUNT(*)"
        ).alias("brier_micro")
    )
    return (
        b.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(br))
        .select(
            "bin",
            "n",
            "pos",
            F.expr("sum_s DIV n").alias("conf_milli"),
            F.expr("(1000 * pos) DIV n").alias("rate_milli"),
            "ece_micro",
            "brier_micro",
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# q339: AdaBoost decision-stump training loop (3 rounds, integer weights)
# ---------------------------------------------------------------------------

#: boosting rounds; driver state is one stump + two integers per round
_ADA_ROUNDS = 3
#: feature-1 bucket width (n_chars DIV 64: value-domain-bounded sweep)
_ADA_BW = 64
#: multiplicative update cap: ratio (1-e)/e is stored in micro-units
#: and clamped so the bigint product w * ratio_u stays < 2^63 under
#: the renorm invariant below (standard AdaBoost alpha clamp)
_ADA_RCAP = 10_000_000
#: renorm target: when SUM(w) exceeds ~1e10 the weights are floor-
#: divided back, bounding any single w by ~2e10 and hence
#: w * ratio_u < 2e17 regardless of corpus size
_ADA_NORM = 100_000_000_000 // 10


def _ada_feat_sql(alias: str, p: str) -> str:
    """stump prediction in SQL: pol * (+1 if f <= thr else -1)"""
    return (
        f"{p}.pol * (CASE WHEN (CASE WHEN {p}.feat = 1 THEN {alias}.f1"
        f" ELSE {alias}.f2 END) <= {p}.thr THEN 1 ELSE -1 END)"
    )


def _ada_oracle() -> str:
    from .textops import _SCORE_SQL

    parts = [
        f"""
    WITH d0 AS MATERIALIZED (
      SELECT doc_id,
             CAST(n_chars AS BIGINT) // {_ADA_BW} AS f1,
             CAST({_SCORE_SQL} AS BIGINT) // 100 AS f2,
             CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y,
             CAST(1000000 AS BIGINT) AS w
      FROM documents
      -- training rows require non-null features: a partial scrape
      -- record (NULL text/n_chars) has no length bucket or quality
      -- decile to split on, and a NULL thr bucket would otherwise
      -- ride engine-specific NULL ordering through the cumulative
      -- window and the argmin (r13 partial-records census)
      WHERE text IS NOT NULL AND n_chars IS NOT NULL
    )"""
    ]
    for r in range(1, _ADA_ROUNDS + 1):
        d = f"d{r - 1}"
        parts.append(
            f"""
    tot{r} AS MATERIALIZED (
      SELECT CAST(SUM(CASE WHEN y = 1 THEN w ELSE 0 END) AS BIGINT)
               AS tpos,
             CAST(SUM(w) AS BIGINT) AS tw
      FROM {d}
    ),
    bk{r} AS MATERIALIZED (
      SELECT feat, thr,
             CAST(SUM(CASE WHEN y = 1 THEN w ELSE 0 END) AS BIGINT)
               AS wpos,
             CAST(SUM(CASE WHEN y = -1 THEN w ELSE 0 END) AS BIGINT)
               AS wneg
      FROM (SELECT 1 AS feat, f1 AS thr, y, w FROM {d}
            UNION ALL
            SELECT 2 AS feat, f2 AS thr, y, w FROM {d})
      GROUP BY feat, thr
    ),
    cum{r} AS MATERIALIZED (
      SELECT feat, thr,
             SUM(wneg) OVER (PARTITION BY feat ORDER BY thr
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cneg,
             SUM(wpos) OVER (PARTITION BY feat ORDER BY thr
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cpos
      FROM bk{r}
    ),
    best{r} AS MATERIALIZED (
      SELECT feat, thr, pol, err, tw FROM (
        SELECT c.feat, c.thr, 1 AS pol,
               c.cneg + (t.tpos - c.cpos) AS err, t.tw
        FROM cum{r} c, tot{r} t
        UNION ALL
        SELECT c.feat, c.thr, -1 AS pol,
               t.tw - (c.cneg + (t.tpos - c.cpos)) AS err, t.tw
        FROM cum{r} c, tot{r} t)
      ORDER BY err, feat, thr, pol LIMIT 1
    ),
    par{r} AS MATERIALIZED (
      SELECT feat, thr, pol, err, tw,
             LEAST(((tw - err) * 1000000) // GREATEST(err, 1),
                   {_ADA_RCAP}) AS ratio_u,
             CAST(FLOOR(LN(CAST(tw - err AS DOUBLE) / GREATEST(err, 1))
                        * 500000) AS BIGINT) AS alpha_u
      FROM best{r}
    ),
    up{r} AS MATERIALIZED (
      SELECT d.doc_id, d.f1, d.f2, d.y,
             CASE WHEN {_ada_feat_sql("d", "p")} <> d.y
                  THEN (d.w * p.ratio_u) // 1000000 ELSE d.w END AS w
      FROM {d} d, par{r} p
    ),
    sc{r} AS MATERIALIZED (
      SELECT GREATEST(CAST(SUM(w) AS BIGINT) // {_ADA_NORM}, 1) AS s
      FROM up{r}
    ),
    d{r} AS MATERIALIZED (
      SELECT doc_id, f1, f2, y, CAST(w // sc{r}.s AS BIGINT) AS w
      FROM up{r}, sc{r}
    )"""
        )
    votes = " + ".join(
        f"p{r}.alpha_u * ({_ada_feat_sql('d', f'p{r}')})"
        for r in range(1, _ADA_ROUNDS + 1)
    )
    pjoin = ", ".join(f"par{r} p{r}" for r in range(1, _ADA_ROUNDS + 1))
    rows = "\n      UNION ALL\n".join(
        f"      SELECT {r} AS round, feat, thr, pol, err AS err_w,"
        f" tw AS tot_w, ratio_u, alpha_u FROM par{r}"
        for r in range(1, _ADA_ROUNDS + 1)
    )
    return (
        ",".join(parts)
        + f""",
    ens AS MATERIALIZED (
      SELECT d.y, {votes} AS vote
      FROM d0 d, {pjoin}
    ),
    err_ens AS MATERIALIZED (
      SELECT CAST(SUM(CASE WHEN (CASE WHEN vote > 0 THEN 1 ELSE -1 END)
                           <> y THEN 1 ELSE 0 END) AS BIGINT) AS wrong,
             CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM ens
    )
    SELECT CAST(s.round AS BIGINT) AS round,
           CAST(s.feat AS BIGINT) AS feat,
           CAST(s.thr AS BIGINT) AS thr,
           CAST(s.pol AS BIGINT) AS pol,
           CAST(s.err_w AS BIGINT) AS err_w,
           CAST(s.tot_w AS BIGINT) AS tot_w,
           CAST(s.ratio_u AS BIGINT) AS ratio_u,
           CAST(s.alpha_u AS BIGINT) AS alpha_u,
           e.wrong AS ensemble_wrong, e.n_docs
    FROM (
{rows}
    ) s, err_ens e
    ORDER BY round
    """
    )


@query("q339_adaboost_stumps", oracle=_ada_oracle())
def q339_adaboost_stumps(spark, sf_dir):
    """ADABOOST with decision stumps, trained fully in-engine: 3
    rounds of weighted-error stump search over two document features
    (length bucket f1 = n_chars DIV 64, quality decile f2 = score DIV
    100) against the lang='en' label, with the classic exponential
    reweighting — the boosting loop behind every "weak rules into a
    strong quality gate" pipeline (and the direct upgrade of q329's
    single Gini stump to an ensemble).

    Exactness — Freund & Schapire's multiplicative update done in
    PURE BIGINT: sample weights live in micro-units; the update
    factor (1-e)/e is the exact integer ratio (tw-err)/err quantized
    by integer division to ratio_u (clamped at 10000000) and
    applied as ``w*ratio_u DIV 1e6``; renormalization floor-divides
    by ``SUM(w) DIV 10000000000`` once the mass passes ~1e10, keeping
    every product < 2^63 at ANY corpus size. Weighted errors are
    bigint sums (order-independent); the argmin stump is picked by a
    total order (err, feat, thr, pol), so round state is bit-exact
    cross-engine. alpha_u = FLOOR(LN((tw-err)/err)*5e5) is driver-
    computed from the SAME two integers both engines hold (the
    adjudicated FLOOR(LN) class, q313/q337).

    Scale — the q177/q306/q315 bounded-driver-loop discipline: each
    round is one scan of the weighted corpus into a (feature, bucket)
    hash aggregate whose size is the VALUE domain (~50 rows), a
    cumulative window over that bounded frame, a 1-row argmin collect
    (driver holds 5 integers), and a map-only reweight with literal
    stump parameters; transient persists cut the lineage each round.
    The oracle is the unrolled MATERIALIZED-CTE chain of the same
    algebra."""
    docs = t(spark, sf_dir, "documents")
    # non-null features only, mirroring the oracle's d0 filter: a
    # partial record has nothing for a stump to split on, and the
    # driver's int(best["thr"]) must never see a NULL bucket (r13
    # partial-records census).
    d = docs.filter(
        F.col("text").isNotNull() & F.col("n_chars").isNotNull()
    ).select(
        "doc_id",
        F.expr(f"CAST(n_chars AS LONG) DIV {_ADA_BW}").alias("f1"),
        (F.expr(_SCORE_SPARK_SQL).cast("long") / F.lit(100))
        .cast("long")
        .alias("f2"),
        F.when(F.col("lang") == "en", 1).otherwise(-1).alias("y"),
        F.lit(1000000).cast("long").alias("w"),
    )
    d = transient_persist(d)
    import math

    stumps = []
    for _r in range(_ADA_ROUNDS):
        unpiv = d.select(
            F.lit(1).alias("feat"), F.col("f1").alias("thr"), "y", "w"
        ).unionByName(
            d.select(F.lit(2).alias("feat"), F.col("f2").alias("thr"), "y", "w")
        )
        bk = unpiv.groupBy("feat", "thr").agg(
            F.sum(F.when(F.col("y") == 1, F.col("w")).otherwise(0))
            .cast("long")
            .alias("wpos"),
            F.sum(F.when(F.col("y") == -1, F.col("w")).otherwise(0))
            .cast("long")
            .alias("wneg"),
        )
        wcum = (
            Window.partitionBy("feat")
            .orderBy("thr")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cum = bk.select(
            "feat",
            "thr",
            F.sum("wneg").over(wcum).alias("cneg"),
            F.sum("wpos").over(wcum).alias("cpos"),
        )
        # (r14 note: deriving tpos/tw from a persisted bk instead of
        # this d-scan was tried and measured ~0.3 s SLOWER solo - the
        # per-round persist machinery on a ~50-row frame costs more
        # than one scan of the cached weighted corpus. Left as-is.)
        tot = d.agg(
            F.sum(F.when(F.col("y") == 1, F.col("w")).otherwise(0))
            .cast("long")
            .alias("tpos"),
            F.sum("w").cast("long").alias("tw"),
        )
        cand = cum.crossJoin(F.broadcast(tot))
        err_pos = F.col("cneg") + (F.col("tpos") - F.col("cpos"))
        both = cand.select(
            "feat", "thr", F.lit(1).alias("pol"), err_pos.alias("err"), "tw"
        ).unionByName(
            cand.select(
                "feat",
                "thr",
                F.lit(-1).alias("pol"),
                (F.col("tw") - err_pos).alias("err"),
                "tw",
            )
        )
        argmin = both.orderBy("err", "feat", "thr", "pol").limit(1).collect()
        if not argmin:
            # degenerate corpus: no (feat, thr) buckets exist, so no
            # stump can be fit; the oracle's per-round CTEs are empty
            # and its UNION ALL readout has no rows - mirror that.
            return degenerate_frame(
                spark,
                "round bigint, feat bigint, thr bigint, pol bigint, "
                "err_w bigint, tot_w bigint, ratio_u bigint, "
                "alpha_u bigint, ensemble_wrong bigint, n_docs bigint",
            )
        best = argmin[0]
        feat, thr, pol = int(best["feat"]), int(best["thr"]), int(best["pol"])
        err, tw = int(best["err"]), int(best["tw"])
        ratio_u = min(((tw - err) * 1000000) // max(err, 1), _ADA_RCAP)
        alpha_u = math.floor(
            math.log(float(tw - err) / max(err, 1)) * 500000
        )
        stumps.append((feat, thr, pol, err, tw, ratio_u, alpha_u))
        fcol = F.col("f1") if feat == 1 else F.col("f2")
        pred = F.lit(pol) * F.when(fcol <= thr, 1).otherwise(-1)
        up = d.select(
            "doc_id",
            "f1",
            "f2",
            "y",
            F.when(
                pred != F.col("y"),
                F.expr(f"(w * {ratio_u}) DIV 1000000"),
            )
            .otherwise(F.col("w"))
            .alias("w"),
        )
        up = transient_persist(up)
        scale = max(
            int(up.agg(F.sum("w").cast("long")).collect()[0][0]) // _ADA_NORM,
            1,
        )
        d = transient_persist(
            up.select(
                "doc_id", "f1", "f2", "y", F.expr(f"w DIV {scale}").alias("w")
            )
        )
    vote = None
    for feat, thr, pol, _e, _t, _ru, alpha_u in stumps:
        fcol = F.col("f1") if feat == 1 else F.col("f2")
        h = F.lit(pol) * F.when(fcol <= thr, 1).otherwise(-1)
        term = F.lit(alpha_u) * h
        vote = term if vote is None else vote + term
    # the ensemble readout evaluates over the SAME non-null-feature
    # population the stumps were trained on (mirrors the oracle's d0).
    # Reweighting never touches f1/f2/y, so the final persisted d IS
    # that population - reusing it saves a full docs re-scan and a
    # second tokenization of the quality score (optimization r14,
    # guide section 2.4).
    d0 = d.select("f1", "f2", "y")
    err_ens = d0.select(vote.alias("vote"), "y").agg(
        F.sum(
            F.when(
                F.when(F.col("vote") > 0, 1).otherwise(-1) != F.col("y"), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("ensemble_wrong"),
        F.count("*").cast("long").alias("n_docs"),
    )
    rows = spark.createDataFrame(
        [
            (r + 1, s[0], s[1], s[2], s[3], s[4], s[5], s[6])
            for r, s in enumerate(stumps)
        ],
        "round long, feat long, thr long, pol long, err_w long,"
        " tot_w long, ratio_u long, alpha_u long",
    )
    return rows.crossJoin(F.broadcast(err_ens)).orderBy("round")


# ---------------------------------------------------------------------------
# q354: difference-in-differences readout on purchase value
# ---------------------------------------------------------------------------

#: period split: Jan 16 00:00 (micros) - mid-span of the events month.
_DID_SPLIT_US = 1_704_067_200_000_000 + 15 * 86_400_000_000


@query(
    "q354_did_readout",
    oracle=f"""
    WITH p AS (
      SELECT user_id,
             (CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                   AS BIGINT) % 2 = 0) AS treated,
             (epoch_us(ts) >= {_DID_SPLIT_US}) AS post,
             CAST(value AS DECIMAL(20,6)) AS v
      FROM events
      WHERE event_type = 'purchase'
    ),
    cell AS (
      SELECT treated, post,
             CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST((2 * CAST(SUM(v) * 1000000 AS BIGINT) + COUNT(*))
                  // (2 * COUNT(*)) AS BIGINT) AS avg_micro
      FROM p GROUP BY treated, post
    )
    SELECT tpre.cnt AS n_treat_pre, tpost.cnt AS n_treat_post,
           cpre.cnt AS n_ctrl_pre, cpost.cnt AS n_ctrl_post,
           tpre.avg_micro AS treat_pre_micro,
           tpost.avg_micro AS treat_post_micro,
           cpre.avg_micro AS ctrl_pre_micro,
           cpost.avg_micro AS ctrl_post_micro,
           (tpost.avg_micro - tpre.avg_micro)
             - (cpost.avg_micro - cpre.avg_micro) AS did_micro
    FROM (SELECT * FROM cell WHERE treated AND NOT post) tpre,
         (SELECT * FROM cell WHERE treated AND post) tpost,
         (SELECT * FROM cell WHERE NOT treated AND NOT post) cpre,
         (SELECT * FROM cell WHERE NOT treated AND post) cpost
    """,
)
def q354_did_readout(spark, sf_dir):
    """DIFFERENCE-IN-DIFFERENCES readout: the 2x2 (cohort x period)
    table of average purchase value and the DiD estimate
    (treat_post - treat_pre) - (ctrl_post - ctrl_pre). Cohort = the
    deterministic unit-hash assignment on user_id (the q79 split
    device, cross-engine md5 parity - any observational cohort
    predicate slots into the same plan); periods split at mid-month.
    The quasi-experimental companion to q310's CUPED readout: CUPED
    removes pre-period variance from a randomized readout, DiD removes
    level differences across NON-randomized cohorts.

    Exactness: cell sums ride DECIMAL(20,6) (exact, order-free); each
    cell average is half-up integer-rounded micro-units via
    ``(2*sum + cnt) DIV (2*cnt)`` (the q174 device - no cross-engine
    ROUND-on-double tie exposure), so the DiD contrast is pure bigint.

    Scale: cohort membership is a semi-join on user_id (broadcastable
    when the cohort is small, AQE decides); the fact scan aggregates
    once into FOUR cells; the 2x2 pivot is a crossJoin of four 1-row
    frames (bounded-frame class). Nothing here is larger than the
    purchase slice of one scan."""
    ev = t(spark, sf_dir, "events")
    treated = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        % 2
        == 0
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        treated.alias("treated"),
        (F.col("ts_us") >= _DID_SPLIT_US).alias("post"),
        F.col("value").cast("decimal(20,6)").alias("v"),
    )
    cell = p.groupBy("treated", "post").agg(
        F.count("*").cast("long").alias("cnt"),
        F.expr(
            "CAST((2 * CAST(SUM(v) * 1000000 AS BIGINT) + COUNT(*))"
            " DIV (2 * COUNT(*)) AS BIGINT)"
        ).alias("avg_micro"),
    )

    def pick(tr, po, cn, an):
        return (
            cell.filter((F.col("treated") == tr) & (F.col("post") == po))
            .select(F.col("cnt").alias(cn), F.col("avg_micro").alias(an))
        )

    tpre = pick(True, False, "n_treat_pre", "treat_pre_micro")
    tpost = pick(True, True, "n_treat_post", "treat_post_micro")
    cpre = pick(False, False, "n_ctrl_pre", "ctrl_pre_micro")
    cpost = pick(False, True, "n_ctrl_post", "ctrl_post_micro")
    return (
        tpre.crossJoin(F.broadcast(tpost))
        .crossJoin(F.broadcast(cpre))
        .crossJoin(F.broadcast(cpost))
        .select(
            "n_treat_pre",
            "n_treat_post",
            "n_ctrl_pre",
            "n_ctrl_post",
            "treat_pre_micro",
            "treat_post_micro",
            "ctrl_pre_micro",
            "ctrl_post_micro",
            (
                (F.col("treat_post_micro") - F.col("treat_pre_micro"))
                - (F.col("ctrl_post_micro") - F.col("ctrl_pre_micro"))
            ).alias("did_micro"),
        )
    )


# ---------------------------------------------------------------------------
# q355: Simpson's-paradox audit - pooled vs per-group regression slope
# ---------------------------------------------------------------------------


@query(
    "q355_simpsons_slope_audit",
    oracle=f"""
    WITH x AS (
      SELECT event_type,
             CAST((epoch_us(ts) % 86400000000) // 3600000000 AS BIGINT)
               AS hr,
             CAST(value AS DECIMAL(20,6)) AS v
      FROM events
    ),
    g AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(hr) AS BIGINT) AS sx,
             CAST(SUM(hr * hr) AS BIGINT) AS sxx,
             SUM(v) AS sy,
             SUM(hr * v) AS sxy
      FROM x GROUP BY event_type
    ),
    pool AS (
      SELECT CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(sx) AS BIGINT) AS sx,
             CAST(SUM(sxx) AS BIGINT) AS sxx, SUM(sy) AS sy,
             SUM(sxy) AS sxy
      FROM g
    ),
    sl AS (
      SELECT g.event_type, g.n,
             ROUND(CAST(g.n * g.sxy - g.sx * g.sy AS DOUBLE)
                   / (g.n * g.sxx - g.sx * g.sx), 6) AS group_slope,
             ROUND(CAST(p.n * p.sxy - p.sx * p.sy AS DOUBLE)
                   / (p.n * p.sxx - p.sx * p.sx), 6) AS pooled_slope
      FROM g, pool p
    )
    SELECT event_type, n, group_slope, pooled_slope,
           (CASE WHEN group_slope > 0 THEN 1
                 WHEN group_slope < 0 THEN -1 ELSE 0 END)
           <> (CASE WHEN pooled_slope > 0 THEN 1
                    WHEN pooled_slope < 0 THEN -1 ELSE 0 END) AS reversed
    FROM sl
    """,
)
def q355_simpsons_slope_audit(spark, sf_dir):
    """SIMPSON'S-PARADOX AUDIT: the OLS slope of event value on
    hour-of-day, fitted POOLED and WITHIN each event_type, with a
    ``reversed`` flag where the within-group trend contradicts the
    pooled one - the aggregation-bias check any metrics layer should
    run before reporting a pooled trend (a composition shift across
    groups can manufacture or invert it).

    Exactness: the sufficient statistics are exact - integer hr
    moments (bigint) and DECIMAL(20,6) value moments, all
    order-independent; the pooled moments are SUMS of the group
    moments (one pass, algebraically identical to a pooled refit).
    Each slope is ONE double division of exact quantities, rounded
    once at 6dp - the identical-expression IEEE class.

    Scale: one groupBy(event_type) over the scan; the pooled frame is
    a 1-row fold of the |groups|-row aggregate crossed back
    (bounded-frame class). No second scan for the pooled fit."""
    ev = t(spark, sf_dir, "events")
    x = ev.select(
        "event_type",
        F.expr("CAST((ts_us % 86400000000) DIV 3600000000 AS LONG)").alias(
            "hr"
        ),
        F.col("value").cast("decimal(20,6)").alias("v"),
    )
    g = x.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("hr").cast("long").alias("sx"),
        F.sum(F.col("hr") * F.col("hr")).cast("long").alias("sxx"),
        F.sum("v").alias("sy"),
        F.sum(F.col("hr") * F.col("v")).alias("sxy"),
    )
    pool = g.agg(
        F.sum("n").cast("long").alias("pn"),
        F.sum("sx").cast("long").alias("psx"),
        F.sum("sxx").cast("long").alias("psxx"),
        F.sum("sy").alias("psy"),
        F.sum("sxy").alias("psxy"),
    )
    sl = g.crossJoin(F.broadcast(pool)).select(
        "event_type",
        "n",
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                "double"
            )
            / F.nullif(
                F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"),
                F.lit(0),
            ),
            6,
        ).alias("group_slope"),
        F.round(
            (F.col("pn") * F.col("psxy") - F.col("psx") * F.col("psy")).cast(
                "double"
            )
            / F.nullif(
                F.col("pn") * F.col("psxx")
                - F.col("psx") * F.col("psx"),
                F.lit(0),
            ),
            6,
        ).alias("pooled_slope"),
    )
    sgn = lambda c: F.when(c > 0, 1).when(c < 0, -1).otherwise(0)  # noqa: E731
    return sl.select(
        "event_type",
        "n",
        "group_slope",
        "pooled_slope",
        (sgn(F.col("group_slope")) != sgn(F.col("pooled_slope"))).alias(
            "reversed"
        ),
    )


# ---------------------------------------------------------------------------
# q356: split conformal prediction - exact-integer coverage audit
# ---------------------------------------------------------------------------

#: nominal coverage 90%: the conformal rank is
#: ceil(0.9 * (n_cal + 1)), computed below in PURE INTEGERS as
#: (9 * (n_cal + 1) + 9) DIV 10 - no float ever touches the rank.
_CONF_NUM, _CONF_DEN = 9, 10


@query(
    "q356_conformal_coverage",
    oracle=f"""
    WITH x AS (
      SELECT doc_id,
             {_h60_sql("CAST(doc_id AS VARCHAR)")} % 10 AS b,
             CAST(len({_TOKENS_SQL}) AS BIGINT) AS xt,
             CAST(n_chars AS BIGINT) AS y
      FROM documents
      -- listwise deletion: the regression and its calibration scores
      -- are defined over complete (x, y) pairs (r13 census)
      WHERE text IS NOT NULL AND n_chars IS NOT NULL
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(xt) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(xt * xt) AS BIGINT) AS sxx,
             CAST(SUM(xt * y) AS BIGINT) AS sxy
      FROM x WHERE b < 6
    ),
    coef AS (
      SELECT n AS n_train,
             n * sxx - sx * sx AS dd,
             n * sxy - sx * sy AS nb,
             sy * sxx - sx * sxy AS na
      FROM m
    ),
    cal AS (
      SELECT x.doc_id,
             ABS(x.y * c.dd - (c.na + c.nb * x.xt)) AS a
      FROM x, coef c WHERE x.b IN (6, 7)
    ),
    calr AS (
      SELECT a, ROW_NUMBER() OVER (ORDER BY a, doc_id) AS rn FROM cal
    ),
    nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cal FROM cal),
    qh AS (
      SELECT calr.a AS qhat, nc.n_cal,
             LEAST(({_CONF_NUM} * (nc.n_cal + 1) + {_CONF_DEN} - 1)
                   // {_CONF_DEN}, nc.n_cal) AS k
      FROM calr, nc
      WHERE calr.rn = LEAST(({_CONF_NUM} * (nc.n_cal + 1) + {_CONF_DEN} - 1)
                            // {_CONF_DEN}, nc.n_cal)
    ),
    tst AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
             CAST(SUM(CASE WHEN ABS(x.y * c.dd - (c.na + c.nb * x.xt))
                                <= q.qhat THEN 1 ELSE 0 END) AS BIGINT)
               AS n_covered
      FROM x, coef c, qh q WHERE x.b >= 8
    )
    SELECT c.n_train, q.n_cal, q.k, q.qhat AS qhat_scaled,
           t.n_test, t.n_covered,
           ROUND(CAST(t.n_covered AS DOUBLE) / t.n_test, 6) AS coverage
    FROM coef c, qh q, tst t
    """,
)
def q356_conformal_coverage(spark, sf_dir):
    """SPLIT CONFORMAL PREDICTION coverage audit (Vovk et al.; the
    distribution-free eval layer for any in-engine regressor): fit
    n_chars ~ n_tokens by OLS on the TRAIN hash-split, take the
    ceil(0.9*(n_cal+1))-th smallest absolute calibration residual as
    the conformal half-width, and report EMPIRICAL coverage of
    prediction intervals on the held-out TEST split - the finite-
    sample >= 90% guarantee, measured rather than assumed.

    Exactness - the DENOMINATOR-CLEARED residual trick: with integer
    moments, slope = nb/dd and intercept = na/dd are rationals with
    the SAME denominator dd = n*Sxx - Sx^2 > 0, so
    |y - yhat| * dd = |y*dd - (na + nb*x)| is PURE BIGINT - residuals,
    their order statistics, the conformal rank ((9(n+1)+9) DIV 10, no
    float ceil), and the coverage count are all exact; the single
    division happens in the final 6dp coverage ratio. No engine can
    disagree on any intermediate.

    Scale: the train fold is one aggregate (5 moments); cal residuals
    are a map stage; the order statistic uses the two-pass
    range-partitioned global rank (:func:`..common.global_rn` - no
    single-partition window); test coverage is one filtered count with
    the 1-row (coef, qhat) frames broadcast. The q202 exact-quantile
    shape applied to conformal calibration."""
    docs = t(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("n_chars").isNotNull()
    )
    x = docs.select(
        "doc_id",
        (_h60(F.col("doc_id").cast("string")) % 10).alias("b"),
        F.size(_tokens()).cast("long").alias("xt"),
        F.col("n_chars").cast("long").alias("y"),
    )
    m = x.filter(F.col("b") < 6).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("xt").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("xt") * F.col("xt")).cast("long").alias("sxx"),
        F.sum(F.col("xt") * F.col("y")).cast("long").alias("sxy"),
    )
    coef = m.select(
        F.col("n").alias("n_train"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).alias("dd"),
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias("nb"),
        (F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")).alias("na"),
    )
    resid = F.abs(
        F.col("y") * F.col("dd") - (F.col("na") + F.col("nb") * F.col("xt"))
    )
    cal = (
        x.filter(F.col("b").isin(6, 7))
        .crossJoin(F.broadcast(coef))
        .select("doc_id", resid.alias("a"))
    )
    ranked, n_cal = global_rn(cal, ["a", "doc_id"], rn_col="_rn")
    k = min(
        (_CONF_NUM * (n_cal + 1) + _CONF_DEN - 1) // _CONF_DEN, n_cal
    )
    # limit(1) is a no-op (rn == k is unique) that PROVES the 1-row
    # bound structurally, so the broadcast passes the boundedness
    # detector without an allowlist entry.
    qh = (
        ranked.filter(F.col("_rn") == k)
        .limit(1)
        .select(
            F.col("a").alias("qhat"),
            F.lit(n_cal).cast("long").alias("n_cal"),
            F.lit(k).cast("long").alias("k"),
        )
    )
    tst = (
        x.filter(F.col("b") >= 8)
        .crossJoin(F.broadcast(coef))
        .crossJoin(F.broadcast(qh))
        .agg(
            F.count("*").cast("long").alias("n_test"),
            F.sum((resid <= F.col("qhat")).cast("int"))
            .cast("long")
            .alias("n_covered"),
        )
    )
    return (
        coef.select("n_train")
        .crossJoin(F.broadcast(qh))
        .crossJoin(F.broadcast(tst))
        .select(
            "n_train",
            "n_cal",
            "k",
            F.col("qhat").alias("qhat_scaled"),
            "n_test",
            "n_covered",
            F.round(
                F.col("n_covered").cast("double") / F.col("n_test"), 6
            ).alias("coverage"),
        )
    )


# ---------------------------------------------------------------------------
# q359: Viterbi decode (2-state HMM, integer max-sum) over user sessions
# ---------------------------------------------------------------------------

#: integer max-sum HMM scores (one source of truth for BOTH engines'
#: CASE expressions): state 0 = ENGAGED, state 1 = IDLE. Stay bonus
#: +1, switch penalty -2. Log-prob-shaped integers, not floats: the
#: whole DP is bigint, so no cross-engine exposure exists.
_VIT_EMIT = (
    {"click": 2, "purchase": 3, "view": 1, "signup": 0, "error": -2},
    {"view": 0, "error": 2, "signup": 1, "click": -1, "purchase": -3},
)
_VIT_STAY, _VIT_SWITCH = 1, -2
_VIT_MAXLEN = 12


def _vit_case(state: int, x: str, long_suffix: str) -> str:
    """Emission CASE expression for one state; the ELSE mirrors the
    state's rarest score so unseen event types are not silently 0."""
    emit = _VIT_EMIT[state]
    whens = " ".join(
        f"WHEN '{k}' THEN {v}{long_suffix}" for k, v in emit.items()
    )
    default = min(emit.values())
    return f"CASE {x} {whens} ELSE {default}{long_suffix} END"


def _vit_oracle() -> str:
    e0 = lambda x: _vit_case(0, x, "")  # noqa: E731
    e1 = lambda x: _vit_case(1, x, "")  # noqa: E731
    return f"""
    WITH RECURSIVE seq AS MATERIALIZED (
      SELECT user_id, event_type AS et,
             CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                  ORDER BY epoch_us(ts), event_id) AS BIGINT) AS pos
      FROM events
      QUALIFY pos <= {_VIT_MAXLEN}
    ),
    nn AS MATERIALIZED (
      SELECT user_id AS uid, MAX(pos) AS n FROM seq GROUP BY user_id
    ),
    v AS (
      SELECT user_id, pos,
             CAST({e0("et")} AS BIGINT) AS d0,
             CAST({e1("et")} AS BIGINT) AS d1
      FROM seq WHERE pos = 1
      UNION ALL
      SELECT s.user_id, s.pos,
             {e0("s.et")} + GREATEST(v.d0 + {_VIT_STAY},
                                     v.d1 + {_VIT_SWITCH}) AS d0,
             {e1("s.et")} + GREATEST(v.d0 + {_VIT_SWITCH},
                                     v.d1 + {_VIT_STAY}) AS d1
      FROM v JOIN seq s ON s.user_id = v.user_id AND s.pos = v.pos + 1
    )
    SELECT v.user_id, nn.n AS n_obs, GREATEST(v.d0, v.d1) AS score,
           CAST(CASE WHEN v.d0 >= v.d1 THEN 0 ELSE 1 END AS BIGINT)
             AS final_state
    FROM v JOIN nn ON nn.uid = v.user_id AND v.pos = nn.n
    """


@query("q359_viterbi_sessions", oracle=_vit_oracle())
def q359_viterbi_sessions(spark, sf_dir):
    """VITERBI DECODE of a 2-state HMM (ENGAGED/IDLE) over each user's
    first 12 events: the max-sum DP score of the most
    likely hidden-state path and its final state - the sequential-
    inference operator behind session-intent labeling, and the
    engine's demonstration that a SEQUENTIAL per-key DP needs no
    Python and no driver loop: the recursion folds INSIDE a row.

    Plan shape: events shuffle ONCE on user_id (window row-number cap
    at 12), collect_list + array_sort(struct(pos, et))
    builds each user's bounded observation array, and the Viterbi
    recursion delta_t(s) = emit(s, x_t) + max_s'(delta(s') +
    trans(s', s)) runs as a single ``aggregate`` higher-order fold
    over that array - interpreted, but over <= 12 elements
    per row, vectorization-irrelevant. The oracle unrolls the same DP
    as a recursive CTE; emission/transition scores come from ONE
    Python table (no twin-drift).

    Exactness: all-integer max-sum (argmax tie -> state 0, identical
    CASE on both engines). Scale: per-user state is 2 bigints however
    long the corpus; the cap bounds the fold; one exchange total."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.row_number().over(w).alias("pos"),
    ).filter(F.col("pos") <= _VIT_MAXLEN)
    arr = seq.groupBy("user_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct("pos", F.col("event_type").alias("et"))
                )
            ),
            lambda s: s["et"],
        ).alias("ets")
    )
    e0 = lambda x: _vit_case(0, x, "L")  # noqa: E731
    e1 = lambda x: _vit_case(1, x, "L")  # noqa: E731
    fold = f"""
    aggregate(
      slice(ets, 2, size(ets) - 1),
      named_struct('d0', {e0("element_at(ets, 1)")},
                   'd1', {e1("element_at(ets, 1)")}),
      (acc, x) -> named_struct(
        'd0', {e0("x")} + GREATEST(acc.d0 + {_VIT_STAY}L,
                                   acc.d1 + {_VIT_SWITCH}L),
        'd1', {e1("x")} + GREATEST(acc.d0 + {_VIT_SWITCH}L,
                                   acc.d1 + {_VIT_STAY}L))
    )
    """
    return arr.select(
        "user_id",
        F.size("ets").cast("long").alias("n_obs"),
        F.expr(fold).alias("_v"),
    ).select(
        "user_id",
        "n_obs",
        F.greatest("_v.d0", "_v.d1").alias("score"),
        F.when(F.col("_v.d0") >= F.col("_v.d1"), 0)
        .otherwise(1)
        .cast("long")
        .alias("final_state"),
    )


# ---------------------------------------------------------------------------
# q361: beam-search decode (width 2) from the corpus bigram LM
# ---------------------------------------------------------------------------

_BEAM_W = 2
_BEAM_STEPS = 8


def _beam_oracle() -> str:
    """Unrolled beam levels, one MATERIALIZED CTE per step (the q325
    device); scores are exact integer ppm, so the beam order is
    deterministic on both engines."""
    head = f"""
    WITH base AS (SELECT {_TOKENS_SQL} AS toks FROM documents),
    bg AS MATERIALIZED (
      SELECT string_split(b.bigram, ' ')[1] AS w1,
             string_split(b.bigram, ' ')[2] AS w2,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (
        SELECT unnest(list_transform(
                 list_zip(list_slice(toks, 1, len(toks) - 1),
                          list_slice(toks, 2, len(toks))),
                 z -> z[1] || ' ' || z[2])) AS bigram
        FROM base
      ) b GROUP BY 1, 2
    ),
    pp AS MATERIALIZED (
      SELECT bg.w1, bg.w2,
             (1000000 * bg.cnt) // tt.tot AS p_ppm
      FROM bg JOIN (SELECT w1, SUM(cnt) AS tot FROM bg GROUP BY w1) tt
        ON tt.w1 = bg.w1
    ),
    uni AS MATERIALIZED (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS tot
      FROM (SELECT unnest(toks) AS w FROM base) GROUP BY w
    ),
    b1 AS MATERIALIZED (
      SELECT w AS seq, w AS last, (1000000 * cnt) // tot AS score
      FROM uni ORDER BY score DESC, w LIMIT {_BEAM_W}
    )"""
    parts = [head]
    for i in range(2, _BEAM_STEPS + 1):
        parts.append(
            f"""
    b{i} AS MATERIALIZED (
      SELECT b.seq || ' ' || g.w2 AS seq, g.w2 AS last,
             b.score + g.p_ppm AS score
      FROM b{i - 1} b JOIN pp g ON g.w1 = b.last
      ORDER BY score DESC, seq LIMIT {_BEAM_W}
    )"""
        )
    final = "\n    UNION ALL ".join(
        f"""SELECT CAST({i} AS BIGINT) AS step,
           CAST(ROW_NUMBER() OVER (ORDER BY score DESC, seq) AS BIGINT)
             AS rank, seq, CAST(score AS BIGINT) AS score_ppm
        FROM b{i}"""
        for i in range(1, _BEAM_STEPS + 1)
    )
    return ",".join(parts) + "\n    " + final


@query("q361_beam_search_decode", oracle=_beam_oracle())
def q361_beam_search_decode(spark, sf_dir):
    """BEAM-SEARCH DECODING (width 2, 8 levels)
    from the corpus bigram LM - the non-greedy generalization of
    q325: at every level the 2 best partial sequences expand
    through ALL their continuations and only the top-2
    (score DESC, sequence ASC) survive, which recovers sequences a
    greedy walk forfeits by committing to the single local argmax.

    Exactness - the INTEGER-SCORE surrogate: hypotheses are ranked by
    the SUM of exact ppm transition weights (1e6*cnt DIV row_total)
    rather than the float log-prob sum, so scores are bigint, beam
    ties resolve lexicographically, and both engines keep an
    IDENTICAL beam at every level (a float beam could diverge at the
    cut once and never re-converge - the one operator where a 1-ulp
    difference is not self-correcting but amplifying).

    Scale: the bigram census is computed once and shrunk to the
    per-w1 top-W transition cache (r14; provably sufficient for a
    width-W beam), checkpointed so the level plans scan an RDD; all 8
    levels chain LAZILY (each a branching-factor-bounded join + exact
    top-2) into ONE materializing action - no per-level driver
    round-trips (r15; was 9 actions/24 jobs). The oracle unrolls the
    same levels as MATERIALIZED CTEs."""
    docs = t(spark, sf_dir, "documents")
    bigrams = F.expr(
        "zip_with(slice(toks, 1, greatest(size(toks)-1, 0)),"
        "         slice(toks, 2, greatest(size(toks)-1, 0)),"
        "         (a, b) -> concat(a, ' ', b))"
    )
    toks = docs.select(_tokens().alias("toks"))
    bg = (
        toks.select(F.explode(bigrams).alias("bigram"))
        .select(
            F.split(F.col("bigram"), " ").getItem(0).alias("w1"),
            F.split(F.col("bigram"), " ").getItem(1).alias("w2"),
        )
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    tot = bg.groupBy("w1").agg(F.sum("cnt").alias("tot"))
    # Only the per-w1 TOP-_BEAM_W transitions can ever survive a
    # level's cut (optimization r14, guide section 2.3): within one
    # hypothesis the candidate order (score DESC, seq ASC) is exactly
    # (p_ppm DESC, w2 ASC) - the prefix is constant - so a hypothesis'
    # 3rd-best continuation always has >= 2 candidates ahead of it in
    # the GLOBAL order too and can never enter a width-2 beam. The
    # persisted transition cache is therefore the per-w1 top-2 frame
    # (2 rows per distinct w1), not the full bigram table: the 7
    # per-level probe scans each read ~2|vocab| rows instead of the
    # corpus-proportional bigram census. The ranking window's
    # partitionBy(w1) exchange replaces the old explicit
    # repartition("w1") - still hash-distributed, never coalesce(1)
    # (bigram types are corpus-proportional, VERDICT r7 item 2).
    w1rank = Window.partitionBy("w1").orderBy(
        F.col("p_ppm").desc(), "w2"
    )
    # localCheckpoint (not persist): the 8 beam levels below are ONE
    # lazy plan referencing this cache 7 times, and a persisted frame
    # embeds its FULL build lineage per reference (the q416 class) -
    # the checkpointed RDD scan keeps every level's subtree constant-
    # size. Eager: one census job up front.
    pp = (
        bg.join(tot, "w1")
        .select(
            "w1",
            "w2",
            F.expr("(1000000 * cnt) DIV tot").alias("p_ppm"),
        )
        .withColumn("_rk", F.row_number().over(w1rank))
        .filter(F.col("_rk") <= _BEAM_W)
        .drop("_rk")
        .localCheckpoint(eager=True)
    )
    uni = toks.select(F.explode("toks").alias("w")).groupBy("w").agg(
        F.count("*").cast("long").alias("cnt")
    )
    n_tok = uni.agg(F.sum("cnt").alias("tot"))
    # The whole 8-level beam is ONE LAZY PLAN ending in a single
    # action (optimization r15, guide section 1.2/2.4): the r14 shape
    # collected each level's 2-row beam to the driver and re-planned a
    # createDataFrame+join probe per level - 9 driver actions, 24
    # jobs, 22 collect stages and 5.4 s of between-job driver gap in
    # the profile. Here each level is a lazy top-2 (orderBy desc,
    # limit) over the previous level joined to the checkpointed top-W
    # transition cache; (score DESC, seq) is a TOTAL order (seq is
    # unique within a level's candidates), so the limit-2 frames are
    # the exact beams the collected loop held, level for level, and
    # the single materializing action executes every level in one job
    # chain. Driver state is zero rows now; at 100 TB each level is
    # still one vocab-bounded probe of the cache.
    beam = (
        uni.crossJoin(F.broadcast(n_tok))
        .select(
            F.col("w").alias("seq"),
            F.col("w").alias("last"),
            F.expr("(1000000 * cnt) DIV tot").alias("score"),
        )
        .orderBy(F.col("score").desc(), "seq")
        .limit(_BEAM_W)
    )
    levels = [beam.select(F.lit(1).cast("long").alias("step"), "seq", "score")]
    for step in range(2, _BEAM_STEPS + 1):
        beam = (
            beam.join(pp, beam.last == pp.w1)
            .select(
                F.concat_ws(" ", "seq", "w2").alias("seq"),
                F.col("w2").alias("last"),
                (F.col("score") + F.col("p_ppm")).alias("score"),
            )
            .orderBy(F.col("score").desc(), "seq")
            .limit(_BEAM_W)
        )
        levels.append(
            beam.select(
                F.lit(step).cast("long").alias("step"), "seq", "score"
            )
        )
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    rank_w = Window.partitionBy("step").orderBy(
        F.col("score").desc(), "seq"
    )
    return out.select(
        "step",
        F.row_number().over(rank_w).cast("long").alias("rank"),
        "seq",
        F.col("score").cast("long").alias("score_ppm"),
    ).select("step", "rank", "seq", "score_ppm")


# ---------------------------------------------------------------------------
# q363: quantile treatment effects (exact per-cohort deciles)
# ---------------------------------------------------------------------------

_COHORT_SQL = (
    "(CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15))"
    " AS BIGINT) % 2 = 0)"
)


def _cohort_spark():
    return (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
        ).cast("long")
        % 2
        == 0
    )


@query(
    "q363_quantile_treatment_effect",
    oracle=f"""
    WITH p AS (
      SELECT {_COHORT_SQL} AS treated,
             CAST(ROUND(value * 1000000) AS BIGINT) AS v
      FROM events WHERE event_type = 'purchase'
    ),
    g AS (
      SELECT treated, v, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM p GROUP BY treated, v
    ),
    c AS (
      SELECT treated, v,
             SUM(cnt) OVER (PARTITION BY treated ORDER BY v) AS cum,
             SUM(cnt) OVER (PARTITION BY treated) AS n
      FROM g
    ),
    ks AS (SELECT UNNEST(range(1, 10)) AS k),
    q AS (
      SELECT c.treated, ks.k, MIN(c.v) AS qv
      FROM c JOIN ks ON c.cum >= (ks.k * c.n + 9) // 10
      GROUP BY c.treated, ks.k
    )
    SELECT tq.k AS decile,
           tq.qv AS treat_q_micro,
           cq.qv AS ctrl_q_micro,
           tq.qv - cq.qv AS qte_micro
    FROM (SELECT k, qv FROM q WHERE treated) tq
    JOIN (SELECT k, qv FROM q WHERE NOT treated) cq ON cq.k = tq.k
    """,
)
def q363_quantile_treatment_effect(spark, sf_dir):
    """QUANTILE TREATMENT EFFECTS: the per-decile difference of the
    two cohorts' EXACT purchase-value quantiles - where q354's DiD
    reads one mean, the QTE curve shows WHERE the distribution moved
    (a lift concentrated in the top decile and a uniform shift have
    the same mean effect and opposite product meaning). Cohorts are
    the q354 deterministic unit-hash assignment.

    Exactness: values land on the micro lattice by one per-row
    ROUND(value*1e6) (identical IEEE multiply both engines); deciles
    are ORDER STATISTICS - min v with cumcount >= ceil(k*n/10), the
    ceil in pure integers ((k*n+9) DIV 10) - so every output is
    bigint. percentile_disc semantics, derived rather than called,
    because Spark's percentile() interpolates.

    Scale: one groupBy on (cohort, micro-value) - the VALUE-DOMAIN
    aggregate (bounded by price granularity, the q287/q318 class) -
    then a cumsum window PARTITIONED by cohort over that bounded
    frame and a 9-row decile-grid join. No global sort of raw rows,
    no per-row window."""
    ev = t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        _cohort_spark().alias("treated"),
        F.round(F.col("value") * 1_000_000).cast("long").alias("v"),
    )
    g = p.groupBy("treated", "v").agg(F.count("*").cast("long").alias("cnt"))
    wc = Window.partitionBy("treated").orderBy("v")
    wn = Window.partitionBy("treated")
    c = g.select(
        "treated",
        "v",
        F.sum("cnt").over(wc).alias("cum"),
        F.sum("cnt").over(wn).alias("n"),
    )
    ks = spark.range(1, 10).select(F.col("id").alias("k"))
    q = (
        c.crossJoin(F.broadcast(ks))
        .filter(F.col("cum") >= F.expr("(k * n + 9) DIV 10"))
        .groupBy("treated", "k")
        .agg(F.min("v").alias("qv"))
    )
    tq = q.filter(F.col("treated")).select(
        F.col("k").alias("decile"), F.col("qv").alias("treat_q_micro")
    )
    cq = q.filter(~F.col("treated")).select(
        F.col("k").alias("decile"), F.col("qv").alias("ctrl_q_micro")
    )
    return tq.join(cq, "decile").select(
        "decile",
        "treat_q_micro",
        "ctrl_q_micro",
        (F.col("treat_q_micro") - F.col("ctrl_q_micro")).alias("qte_micro"),
    )


# ---------------------------------------------------------------------------
# q364: hash-seeded permutation (sign-flip) test on the cohort contrast
# ---------------------------------------------------------------------------

_PERM_B = 64


@query(
    "q364_permutation_test",
    oracle=f"""
    WITH ux AS (
      SELECT user_id,
             {_COHORT_SQL} AS treated,
             CAST(SUM(CAST(value AS DECIMAL(20,6))) * 1000000 AS BIGINT)
               AS x
      FROM events WHERE event_type = 'purchase'
        -- the test's observations are recorded purchase values;
        -- listwise deletion of missing ones (r13 census)
        AND value IS NOT NULL
      GROUP BY user_id
    ),
    obs AS (
      SELECT CAST(SUM(CASE WHEN treated THEN x ELSE -x END) AS BIGINT)
               AS t_obs
      FROM ux
    ),
    b AS (SELECT UNNEST(range(0, {_PERM_B})) AS bi),
    perm AS (
      SELECT b.bi,
             CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5(
                        CAST(ux.user_id AS VARCHAR) || '|' ||
                        CAST(b.bi AS VARCHAR)), 1, 15)) AS BIGINT) % 2 = 0
                       THEN ux.x ELSE -ux.x END) AS BIGINT) AS t_b
      FROM ux, b GROUP BY b.bi
    )
    SELECT obs.t_obs AS t_obs_micro,
           CAST({_PERM_B} AS BIGINT) AS n_perms,
           CAST(SUM(CASE WHEN ABS(perm.t_b) >= ABS(obs.t_obs)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
           ROUND((1.0 + SUM(CASE WHEN ABS(perm.t_b) >= ABS(obs.t_obs)
                                 THEN 1 ELSE 0 END))
                 / (1 + {_PERM_B}), 6) AS p_value
    FROM perm, obs
    GROUP BY obs.t_obs
    """,
)
def q364_permutation_test(spark, sf_dir):
    """PERMUTATION TEST of the cohort contrast in per-user purchase
    totals, with HASH-SEEDED sign flips standing in for random
    relabelings: pseudo-assignment b relabels user u by the parity of
    md5(u || '|' || b) - deterministic, reproducible, shuffle-order-
    free, and cross-engine identical, which is how a distributed
    engine does randomization inference without a random number in
    sight. p = (1 + #extreme) / (B + 1), the standard add-one
    permutation p-value (Phipson & Smyth 2010).

    Exactness: per-user totals ride DECIMAL(20,6) to micro bigints;
    every statistic T_b is a bigint sum of signed integers
    (order-independent); the only float is the final 6dp p-value.

    Scale: per-user totals are one groupBy(user); the 64
    pseudo-assignments expand via a 64-row constant grid
    crossed into that aggregate (each user's row is hashed 64
    times map-side, combining before the B-row shuffle). B scales the
    work linearly and is independent of corpus size."""
    ev = t(spark, sf_dir, "events")
    ux = (
        ev.filter(
            (F.col("event_type") == "purchase")
            & F.col("value").isNotNull()  # listwise (r13 census)
        )
        .groupBy("user_id")
        .agg(
            (F.sum(F.col("value").cast("decimal(20,6)")) * 1_000_000)
            .cast("long")
            .alias("x")
        )
        .select("user_id", _cohort_spark().alias("treated"), "x")
    )
    obs = ux.agg(
        F.sum(
            F.when(F.col("treated"), F.col("x")).otherwise(-F.col("x"))
        )
        .cast("long")
        .alias("t_obs")
    )
    bgrid = spark.range(_PERM_B).select(F.col("id").alias("bi"))
    flip = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.col("user_id").cast("string"),
                        F.col("bi").cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 2
        == 0
    )
    perm = (
        ux.crossJoin(F.broadcast(bgrid))
        .groupBy("bi")
        .agg(
            F.sum(F.when(flip, F.col("x")).otherwise(-F.col("x")))
            .cast("long")
            .alias("t_b")
        )
    )
    return (
        perm.crossJoin(F.broadcast(obs))
        .groupBy("t_obs")
        .agg(
            F.sum(
                (F.abs(F.col("t_b")) >= F.abs(F.col("t_obs"))).cast("int")
            )
            .cast("long")
            .alias("n_extreme")
        )
        .select(
            F.col("t_obs").alias("t_obs_micro"),
            F.lit(_PERM_B).cast("long").alias("n_perms"),
            "n_extreme",
            F.round(
                (1.0 + F.col("n_extreme")) / (1 + _PERM_B), 6
            ).alias("p_value"),
        )
    )


# ---------------------------------------------------------------------------
# q366: precision/recall curve of the quality score as a dup predictor
# ---------------------------------------------------------------------------


@query(
    "q366_pr_curve",
    oracle=_LSH_CANDS_SQL + _MEMBERS_SQL + f""",
    scored AS (
      SELECT d.doc_id, {_SCORE_SQL} AS score,
             (m.doc_id IS NOT NULL) AS is_dup
      FROM documents d LEFT JOIN members m USING (doc_id)
      -- a PR threshold IS a score: unscoreable (textless) records
      -- have no threshold row (r13 census; NULL ordering in the
      -- cumulative windows diverged between the engines)
      WHERE d.text IS NOT NULL
    ),
    grp AS (
      SELECT score,
             CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS pos,
             CAST(SUM(CASE WHEN is_dup THEN 0 ELSE 1 END) AS BIGINT) AS neg
      FROM scored GROUP BY score
    ),
    tot AS (
      SELECT CAST(SUM(pos) AS BIGINT) AS p FROM grp
    ),
    cum AS (
      SELECT score,
             CAST(SUM(pos) OVER (ORDER BY score) AS BIGINT) AS tp,
             CAST(SUM(neg) OVER (ORDER BY score) AS BIGINT) AS fp
      FROM grp
    )
    SELECT cum.score AS thr, cum.tp, cum.fp, tot.p - cum.tp AS fn,
           ROUND(CAST(cum.tp AS DOUBLE) / (cum.tp + cum.fp), 6)
             AS precision_,
           ROUND(CAST(cum.tp AS DOUBLE) / tot.p, 6) AS recall_,
           ROUND(CAST(2 * cum.tp AS DOUBLE)
                 / (2 * cum.tp + cum.fp + (tot.p - cum.tp)), 6) AS f1
    FROM cum, tot
    """,
)
def q366_pr_curve(spark, sf_dir):
    """PRECISION/RECALL CURVE of the milli-unit quality score as a
    near-dup predictor (predict DUP when score <= threshold), swept
    over every OBSERVED score value - the operating-point companion to
    q287's threshold-free AUC and q321's AP: this is the table you
    read to actually pick a production gate. F1 is computed in the
    2TP/(2TP+FP+FN) form so it needs no intermediate rounding.

    Exactness: TP/FP/FN are cumulative bigint counts over the score-
    GROUP aggregate; the three ratios round once at 6dp from exact
    integers (single-division IEEE class).

    Scale: scoring is a map stage; the sweep is a cumsum window over
    the SCORE-DOMAIN aggregate (<= 1001 milli values - the q287/q318
    bounded class), with the 1-row positives total crossed back. The
    only corpus-sized shuffles are the label semi-join and the score
    groupBy."""
    labeled = _neardup_labeled(spark, sf_dir).filter(
        F.col("text").isNotNull()  # unscoreable records have no threshold
    )
    grp = labeled.groupBy("score").agg(
        F.sum("y").cast("long").alias("pos"),
        F.sum(1 - F.col("y")).cast("long").alias("neg"),
    )
    tot = grp.agg(F.sum("pos").cast("long").alias("p"))
    w = Window.orderBy("score").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = grp.select(
        "score",
        F.sum("pos").over(w).cast("long").alias("tp"),
        F.sum("neg").over(w).cast("long").alias("fp"),
    )
    return cum.crossJoin(F.broadcast(tot)).select(
        F.col("score").alias("thr"),
        "tp",
        "fp",
        (F.col("p") - F.col("tp")).alias("fn"),
        F.round(
            F.col("tp").cast("double") / (F.col("tp") + F.col("fp")), 6
        ).alias("precision_"),
        F.round(
            F.col("tp").cast("double")
            / F.nullif(F.col("p").cast("double"), F.lit(0.0)),
            6,
        ).alias("recall_"),
        F.round(
            (2 * F.col("tp")).cast("double")
            / F.nullif(
                (
                    2 * F.col("tp") + F.col("fp")
                    + (F.col("p") - F.col("tp"))
                ).cast("double"),
                F.lit(0.0),
            ),
            6,
        ).alias("f1"),
    )


# ---------------------------------------------------------------------------
# q367: McNemar's test between two quality gates
# ---------------------------------------------------------------------------

#: the two paired binary gates: A = distinct-token-ratio (repetition)
#: gate at 500 milli, B = stopword-ratio (natural-language-ness) gate
#: at 100 milli - q84's rule family, pinned to integer thresholds.
_MCN_A_MILLI = 500
_MCN_B_MILLI = 100
_MCN_STOPS = (
    "('the','a','of','and','to','in','is','it','for','on')"
)


@query(
    "q367_mcnemar_gates",
    oracle=f"""
    WITH x AS (
      SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents
    ),
    g AS (
      SELECT ((1000 * len(list_distinct(toks))) // len(toks)
               >= {_MCN_A_MILLI}) AS pa,
             ((1000 * len(list_filter(toks, t -> t IN {_MCN_STOPS})))
               // len(toks) >= {_MCN_B_MILLI}) AS pb
      FROM x
    ),
    cells AS (
      SELECT CAST(SUM(CASE WHEN pa AND pb THEN 1 ELSE 0 END) AS BIGINT)
               AS a,
             CAST(SUM(CASE WHEN pa AND NOT pb THEN 1 ELSE 0 END) AS BIGINT)
               AS b,
             CAST(SUM(CASE WHEN NOT pa AND pb THEN 1 ELSE 0 END) AS BIGINT)
               AS c,
             CAST(SUM(CASE WHEN NOT pa AND NOT pb THEN 1 ELSE 0 END)
                  AS BIGINT) AS d
      FROM g
    )
    SELECT a, b, c, d,
           ROUND(CAST(a + d AS DOUBLE) / NULLIF(a + b + c + d, 0), 6)
             AS agree_rate,
           ROUND(CASE WHEN b + c = 0 THEN 0.0
                      ELSE CAST((ABS(b - c) - 1) * (ABS(b - c) - 1)
                                AS DOUBLE) / (b + c) END, 6) AS mcnemar_chi2
    FROM cells
    """,
)
def q367_mcnemar_gates(spark, sf_dir):
    """McNEMAR'S TEST between two paired quality gates (repetition
    gate vs stopword gate) on the same documents: the 2x2 agreement
    cells and the continuity-corrected statistic (|b-c|-1)^2/(b+c)
    over the DISCORDANT pairs only - the right test for "do the two
    gates disagree systematically, and in which direction", where
    q285's kappa only scores overall agreement. b >> c means the
    stopword gate is strictly more permissive - a mixture-shift
    warning before swapping gates in a cleaning pipeline.

    Exactness: both gates are integer milli-threshold comparisons
    (DIV), the cells are bigint counts, and the statistic is one
    division of exact integers rounded at 6dp.

    Scale: map-only gate evaluation (one token-array projection per
    row, no explode), one 4-cell global aggregate. Nothing else.

    NULL policy (r14 all-NULL census): a NULL-text document is
    unevaluable by EITHER gate and is LISTWISE-DELETED from the
    agreement table - it lands in NO cell (when/otherwise per cell,
    exactly the oracle's CASE ... ELSE 0, which nulls-out of every
    WHEN), so a+b+c+d counts evaluable docs only; counting
    unevaluable docs as concordant "fail/fail" would inflate
    agreement. NULLIF guards the agree_rate on the
    zero-evaluable-doc corpus (NULL on both engines)."""
    docs = t(spark, sf_dir, "documents")
    g = docs.select(
        (
            F.expr(
                "(1000 * size(array_distinct(split(trim(lower(text)),"
                " '\\\\s+')))) DIV size(split(trim(lower(text)), '\\\\s+'))"
            )
            >= _MCN_A_MILLI
        ).alias("pa"),
        (
            F.expr(
                "(1000 * size(filter(split(trim(lower(text)), '\\\\s+'),"
                " t -> t IN ('the','a','of','and','to','in','is','it',"
                "'for','on')))) DIV size(split(trim(lower(text)), '\\\\s+'))"
            )
            >= _MCN_B_MILLI
        ).alias("pb"),
    )
    cells = g.agg(
        F.sum(F.when(F.col("pa") & F.col("pb"), 1).otherwise(0))
        .cast("long")
        .alias("a"),
        F.sum(F.when(F.col("pa") & ~F.col("pb"), 1).otherwise(0))
        .cast("long")
        .alias("b"),
        F.sum(F.when(~F.col("pa") & F.col("pb"), 1).otherwise(0))
        .cast("long")
        .alias("c"),
        F.sum(F.when(~F.col("pa") & ~F.col("pb"), 1).otherwise(0))
        .cast("long")
        .alias("d"),
    )
    return cells.select(
        "a",
        "b",
        "c",
        "d",
        F.round(
            (F.col("a") + F.col("d")).cast("double")
            / F.nullif(
                F.col("a") + F.col("b") + F.col("c") + F.col("d"),
                F.lit(0),
            ),
            6,
        ).alias("agree_rate"),
        F.round(
            F.when(F.col("b") + F.col("c") == 0, F.lit(0.0)).otherwise(
                (
                    (F.abs(F.col("b") - F.col("c")) - 1)
                    * (F.abs(F.col("b") - F.col("c")) - 1)
                ).cast("double")
                / (F.col("b") + F.col("c"))
            ),
            6,
        ).alias("mcnemar_chi2"),
    )


# ---------------------------------------------------------------------------
# q372: per-source gate-fail rate with Wilson score interval
# ---------------------------------------------------------------------------

#: z for the 95% two-sided interval, as a fixed literal so both
#: engines compute the IDENTICAL expression (no inverse-normal call).
_WILSON_Z = "1.959963985"


@query(
    "q372_wilson_ci_by_source",
    oracle=f"""
    WITH g AS (
      SELECT source,
             CASE WHEN (1000 * len(list_distinct({_TOKENS_SQL})))
                       // len({_TOKENS_SQL}) < 500
                  THEN 1 ELSE 0 END AS fails
      FROM documents
      -- only evaluable (textful) records enter the gate's trials
      -- (r13 partial-records census)
      WHERE text IS NOT NULL
    ),
    c AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(fails) AS BIGINT) AS k
      FROM g GROUP BY source
    )
    SELECT source, n, k,
           ROUND(CAST(k AS DOUBLE) / n, 6) AS fail_rate,
           ROUND((CAST(k AS DOUBLE) / n + {_WILSON_Z}*{_WILSON_Z}/(2*n)
                  - {_WILSON_Z} * SQRT((CAST(k AS DOUBLE)/n)
                        * (1.0 - CAST(k AS DOUBLE)/n) / n
                        + {_WILSON_Z}*{_WILSON_Z}/(4.0*n*n)))
                 / (1.0 + {_WILSON_Z}*{_WILSON_Z}/n), 6) AS wilson_lo,
           ROUND((CAST(k AS DOUBLE) / n + {_WILSON_Z}*{_WILSON_Z}/(2*n)
                  + {_WILSON_Z} * SQRT((CAST(k AS DOUBLE)/n)
                        * (1.0 - CAST(k AS DOUBLE)/n) / n
                        + {_WILSON_Z}*{_WILSON_Z}/(4.0*n*n)))
                 / (1.0 + {_WILSON_Z}*{_WILSON_Z}/n), 6) AS wilson_hi
    FROM c
    """,
)
def q372_wilson_ci_by_source(spark, sf_dir):
    """WILSON SCORE INTERVAL (95%) on each source's repetition-gate
    fail rate - the uncertainty-aware version of the raw rates every
    per-source dashboard reports: for a source with 20 documents, a
    15% fail rate means almost nothing, and the Wilson bounds (which
    stay inside [0,1] and behave at k=0/k=n, unlike the Wald
    interval) say exactly how little. The go/no-go question "is this
    source's fail rate provably above tau?" reads directly off
    wilson_lo.

    Exactness: (n, k) are exact bigints; the interval is ONE
    identical expression string over them on both engines - z is a
    fixed literal, SQRT is IEEE-correctly-rounded, and the 6dp round
    absorbs the last-ulp class (the q286/q343 adjudicated pattern).

    Scale: a map-stage gate + one groupBy(source). |sources| output
    rows."""
    docs = t(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()  # evaluable trials only (r13)
    )
    fails = (
        F.expr(
            "(1000 * size(array_distinct(split(trim(lower(text)),"
            " '\\\\s+')))) DIV size(split(trim(lower(text)), '\\\\s+'))"
        )
        < 500
    ).cast("int")
    c = docs.select("source", fails.alias("fails")).groupBy("source").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("fails").cast("long").alias("k"),
    )
    z = _WILSON_Z
    lo = F.expr(
        f"ROUND((CAST(k AS DOUBLE) / n + {z}*{z}/(2*n)"
        f" - {z} * SQRT((CAST(k AS DOUBLE)/n)"
        f" * (1.0 - CAST(k AS DOUBLE)/n) / n"
        f" + {z}*{z}/(4.0*n*n)))"
        f" / (1.0 + {z}*{z}/n), 6)"
    )
    hi = F.expr(
        f"ROUND((CAST(k AS DOUBLE) / n + {z}*{z}/(2*n)"
        f" + {z} * SQRT((CAST(k AS DOUBLE)/n)"
        f" * (1.0 - CAST(k AS DOUBLE)/n) / n"
        f" + {z}*{z}/(4.0*n*n)))"
        f" / (1.0 + {z}*{z}/n), 6)"
    )
    return c.select(
        "source",
        "n",
        "k",
        F.round(F.col("k").cast("double") / F.col("n"), 6).alias(
            "fail_rate"
        ),
        lo.alias("wilson_lo"),
        hi.alias("wilson_hi"),
    )


# ---------------------------------------------------------------------------
# q373: k-fold cross-validated MAE via fold-complement moments
# ---------------------------------------------------------------------------

_CV_K = 5


@query(
    "q373_kfold_cv_mae",
    oracle=f"""
    WITH x AS (
      SELECT doc_id,
             {_h60_sql("CAST(doc_id AS VARCHAR)")} % {_CV_K} AS fold,
             CAST(len({_TOKENS_SQL}) AS BIGINT) AS xt,
             CAST(n_chars AS BIGINT) AS y
      FROM documents
    ),
    fm AS (
      SELECT fold, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(xt) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(xt * xt) AS BIGINT) AS sxx,
             CAST(SUM(xt * y) AS BIGINT) AS sxy
      FROM x GROUP BY fold
    ),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(sx) AS BIGINT) AS sx,
             CAST(SUM(sy) AS BIGINT) AS sy,
             CAST(SUM(sxx) AS BIGINT) AS sxx,
             CAST(SUM(sxy) AS BIGINT) AS sxy
      FROM fm
    ),
    coef AS (
      SELECT fm.fold,
             tot.n - fm.n AS n_train,
             (tot.n - fm.n) * (tot.sxx - fm.sxx)
               - (tot.sx - fm.sx) * (tot.sx - fm.sx) AS dd,
             (tot.n - fm.n) * (tot.sxy - fm.sxy)
               - (tot.sx - fm.sx) * (tot.sy - fm.sy) AS nb,
             (tot.sy - fm.sy) * (tot.sxx - fm.sxx)
               - (tot.sx - fm.sx) * (tot.sxy - fm.sxy) AS na
      FROM fm, tot
    ),
    ev AS (
      SELECT x.fold,
             CAST(COUNT(*) AS BIGINT) AS n_test,
             CAST(SUM(ABS(x.y * c.dd - (c.na + c.nb * x.xt))) AS BIGINT)
               AS sae,
             CAST(ANY_VALUE(c.dd) AS BIGINT) AS dd,
             CAST(ANY_VALUE(c.n_train) AS BIGINT) AS n_train
      FROM x JOIN coef c ON c.fold = x.fold
      GROUP BY x.fold
    )
    SELECT fold, n_train, n_test,
           (1000 * (sae // n_test)) // dd AS mae_milli
    FROM ev
    """,
)
def q373_kfold_cv_mae(spark, sf_dir):
    """5-FOLD CROSS-VALIDATED MAE of the OLS predictor
    (n_chars ~ n_tokens), computed the way a 100 TB deployment must:
    the corpus is scanned ONCE into per-fold moment vectors, and each
    fold's TRAINING moments are the algebraic complement
    (totals - fold) - k models for the price of one aggregation, no
    k-pass retraining (the q174 partial-merge device applied to model
    fitting). Out-of-fold evaluation is the leakage-safe default the
    split-audit family (q255/q268/q331) exists to enforce.

    Exactness: per-fold OLS uses the q356 denominator-cleared bigint
    residuals |y*dd - (na + nb*x)|; the milli-MAE divides by n_test
    then dd in two floor steps (both engines' shared truncating
    division; intermediate magnitudes stay under 2^63 by dividing
    before rescaling). Everything is bigint end to end.

    Scale: one groupBy(fold) for moments (5 x 5 cells), a
    broadcast join of the 5-row coefficient frame back onto the
    scan, one groupBy(fold) fold. Two passes total, independent of
    k."""
    docs = t(spark, sf_dir, "documents")
    x = docs.select(
        "doc_id",
        (_h60(F.col("doc_id").cast("string")) % _CV_K).alias("fold"),
        F.size(_tokens()).cast("long").alias("xt"),
        F.col("n_chars").cast("long").alias("y"),
    )
    fm = x.groupBy("fold").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("xt").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("xt") * F.col("xt")).cast("long").alias("sxx"),
        F.sum(F.col("xt") * F.col("y")).cast("long").alias("sxy"),
    )
    tot = fm.agg(
        F.sum("n").cast("long").alias("tn"),
        F.sum("sx").cast("long").alias("tsx"),
        F.sum("sy").cast("long").alias("tsy"),
        F.sum("sxx").cast("long").alias("tsxx"),
        F.sum("sxy").cast("long").alias("tsxy"),
    )
    coef = fm.crossJoin(F.broadcast(tot)).select(
        "fold",
        (F.col("tn") - F.col("n")).alias("n_train"),
        (
            (F.col("tn") - F.col("n")) * (F.col("tsxx") - F.col("sxx"))
            - (F.col("tsx") - F.col("sx")) * (F.col("tsx") - F.col("sx"))
        ).alias("dd"),
        (
            (F.col("tn") - F.col("n")) * (F.col("tsxy") - F.col("sxy"))
            - (F.col("tsx") - F.col("sx")) * (F.col("tsy") - F.col("sy"))
        ).alias("nb"),
        (
            (F.col("tsy") - F.col("sy")) * (F.col("tsxx") - F.col("sxx"))
            - (F.col("tsx") - F.col("sx")) * (F.col("tsxy") - F.col("sxy"))
        ).alias("na"),
    )
    ev = (
        x.join(F.broadcast(coef), "fold")
        .groupBy("fold")
        .agg(
            F.count("*").cast("long").alias("n_test"),
            F.sum(
                F.abs(
                    F.col("y") * F.col("dd")
                    - (F.col("na") + F.col("nb") * F.col("xt"))
                )
            )
            .cast("long")
            .alias("sae"),
            F.first("dd").alias("dd"),
            F.first("n_train").cast("long").alias("n_train"),
        )
    )
    return ev.select(
        "fold",
        "n_train",
        "n_test",
        F.expr(
            "(1000 * (sae DIV NULLIF(n_test, 0))) DIV NULLIF(dd, 0)"
        ).alias("mae_milli"),
    )


# ---------------------------------------------------------------------------
# q375: entropy rate of the event-type Markov chain
# ---------------------------------------------------------------------------


@query(
    "q375_markov_entropy_rate",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type AS cur,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ) AS nxt
      FROM events
    ),
    tc AS (
      SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS c
      -- a NULL event type is an unobserved state: transitions with
      -- EITHER endpoint missing are dropped (r13 census; the USING
      -- join also silently dropped NULL-cur cells on one engine)
      FROM seq WHERE nxt IS NOT NULL AND cur IS NOT NULL
      GROUP BY cur, nxt
    ),
    rowt AS (
      SELECT cur, CAST(SUM(c) AS BIGINT) AS rt FROM tc GROUP BY cur
    ),
    contrib AS (
      SELECT tc.cur, tc.nxt, tc.c, rowt.rt,
             tc.c * CAST(FLOOR(LN(CAST(rowt.rt AS DOUBLE) / tc.c)
                               * 1000000) AS BIGINT) AS h_micro
      FROM tc JOIN rowt USING (cur)
    ),
    nt AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM tc)
    SELECT CAST((SELECT SUM(h_micro) FROM contrib) // nt.n AS BIGINT)
             AS entropy_rate_micro_nats,
           nt.n AS n_transitions,
           CAST((SELECT COUNT(*) FROM tc) AS BIGINT) AS n_cells
    FROM nt
    """,
)
def q375_markov_entropy_rate(spark, sf_dir):
    """ENTROPY RATE of the empirical event-type Markov chain:
    H = -sum_ij pi_i P_ij ln P_ij, estimated as
    (1/N) * sum_ij c_ij * ln(rowtotal_i / c_ij) over the transition
    census - the predictability ceiling of user behavior (how many
    nats any next-event model, q94's chain included, can possibly
    save) and the sequence-level companion to q108's per-user
    marginal entropy. Low rate = sessions are near-deterministic and
    next-event prediction is easy; the maximum, ln(5) nats, means the
    chain carries no signal.

    Exactness: transition counts are bigint; each cell's ln(rt/c) is
    micro-FLOORed (the q337/q374 adjudicated LN class - exact integer
    ratio in, 25-cell evaluation count), after which the weighted sum
    and the final DIV are pure integer arithmetic.

    Scale: one window shuffle on user_id for the LEAD pairs, one
    groupBy over the |types|^2-bounded census; everything after is
    arithmetic on <= 25 rows."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull() & F.col("cur").isNotNull())
    tc = seq.groupBy("cur", "nxt").agg(F.count("*").cast("long").alias("c"))
    rowt = tc.groupBy("cur").agg(F.sum("c").cast("long").alias("rt"))
    contrib = tc.join(rowt, "cur").select(
        "c",
        (
            F.col("c")
            * F.floor(
                F.log(F.col("rt").cast("double") / F.col("c")) * 1_000_000
            ).cast("long")
        ).alias("h_micro"),
    )
    return contrib.agg(
        F.sum("h_micro").alias("hsum"),
        F.sum("c").cast("long").alias("n_transitions"),
        F.count("*").cast("long").alias("n_cells"),
    ).select(
        F.expr("hsum DIV n_transitions")
        .cast("long")
        .alias("entropy_rate_micro_nats"),
        "n_transitions",
        "n_cells",
    )


# ---------------------------------------------------------------------------
# q390: Cochran's Q across the three cleaning gates
# ---------------------------------------------------------------------------


@query(
    "q390_cochrans_q",
    oracle=f"""
    WITH f AS (
      SELECT CAST(len({_TOKENS_SQL}) AS BIGINT) AS nt,
             CAST(len(list_distinct({_TOKENS_SQL})) AS BIGINT) AS nd,
             CAST(len(list_filter({_TOKENS_SQL},
                   t -> t IN ('the','a','of','and','to','in','is','it',
                              'for','on'))) AS BIGINT) AS ns
      FROM documents
    ),
    g AS (
      SELECT CASE WHEN nt BETWEEN 20 AND 80 THEN 1 ELSE 0 END AS ga,
             CASE WHEN 5 * nd >= 2 * nt THEN 1 ELSE 0 END AS gb,
             CASE WHEN 50 * ns >= nt THEN 1 ELSE 0 END AS gc
      FROM f
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(ga) AS BIGINT) AS g1,
             CAST(SUM(gb) AS BIGINT) AS g2,
             CAST(SUM(gc) AS BIGINT) AS g3,
             CAST(SUM(ga + gb + gc) AS BIGINT) AS sl,
             CAST(SUM((ga + gb + gc) * (ga + gb + gc)) AS BIGINT) AS sl2
      FROM g
    )
    SELECT n, g1 AS pass_len, g2 AS pass_rep, g3 AS pass_stop,
           ROUND(CAST(2 * (3 * (g1*g1 + g2*g2 + g3*g3)
                           - (g1 + g2 + g3) * (g1 + g2 + g3)) AS DOUBLE)
                 / NULLIF(3 * sl - sl2, 0), 6) AS cochrans_q
    FROM agg
    """,
)
def q390_cochrans_q(spark, sf_dir):
    """COCHRAN'S Q TEST across the THREE cleaning gates on the same
    documents: Q = (k-1) * [k*sum(G_j^2) - (sum G_j)^2] /
    [k*sum(L_i) - sum(L_i^2)] with k = 3, G_j the per-gate pass
    totals and L_i the per-document pass counts - the k-gate
    generalization of q367's McNemar (which it reduces to at k = 2):
    "do the three gates have the same pass rate, accounting for the
    fact that they judge the SAME documents?" Large Q (vs chi^2, 2
    df) says the gates filter systematically different slices - the
    pipeline-design fact q369's Shapley then quantifies.

    Exactness: gate indicators, per-gate totals, and per-doc pass
    counts (0..3) are exact integers; Q is ONE division of bigint
    combinations rounded at 6dp.

    Scale: one map-stage token projection, one 6-cell global
    aggregate. Adding gates grows the aggregate width, never the
    scan count."""
    docs = t(spark, sf_dir, "documents")
    f = docs.select(
        F.expr(
            "size(split(trim(lower(text)), '\\\\s+'))"
        ).cast("long").alias("nt"),
        F.expr(
            "size(array_distinct(split(trim(lower(text)), '\\\\s+')))"
        ).cast("long").alias("nd"),
        F.expr(
            "size(filter(split(trim(lower(text)), '\\\\s+'),"
            " t -> t IN ('the','a','of','and','to','in','is','it',"
            "'for','on')))"
        ).cast("long").alias("ns"),
    )
    # a gate DECIDES: a NULL-text doc fails each gate (when/otherwise
    # = the oracle's CASE ... ELSE 0), never NULL-poisons the sums
    # (r14 all-NULL census; the r13 partial-records doctrine)
    g = f.select(
        F.when(F.col("nt").between(20, 80), 1).otherwise(0).alias("ga"),
        F.when(5 * F.col("nd") >= 2 * F.col("nt"), 1)
        .otherwise(0)
        .alias("gb"),
        F.when(50 * F.col("ns") >= F.col("nt"), 1)
        .otherwise(0)
        .alias("gc"),
    )
    agg = g.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("ga").cast("long").alias("g1"),
        F.sum("gb").cast("long").alias("g2"),
        F.sum("gc").cast("long").alias("g3"),
        F.sum(F.col("ga") + F.col("gb") + F.col("gc"))
        .cast("long")
        .alias("sl"),
        F.sum(
            (F.col("ga") + F.col("gb") + F.col("gc"))
            * (F.col("ga") + F.col("gb") + F.col("gc"))
        )
        .cast("long")
        .alias("sl2"),
    )
    return agg.select(
        "n",
        F.col("g1").alias("pass_len"),
        F.col("g2").alias("pass_rep"),
        F.col("g3").alias("pass_stop"),
        F.round(
            (
                2
                * (
                    3
                    * (
                        F.col("g1") * F.col("g1")
                        + F.col("g2") * F.col("g2")
                        + F.col("g3") * F.col("g3")
                    )
                    - (F.col("g1") + F.col("g2") + F.col("g3"))
                    * (F.col("g1") + F.col("g2") + F.col("g3"))
                )
            ).cast("double")
            / F.nullif(
                (3 * F.col("sl") - F.col("sl2")).cast("double"),
                F.lit(0.0),
            ),
            6,
        ).alias("cochrans_q"),
    )


# ---------------------------------------------------------------------------
# q391: Matthews correlation coefficient of the quality gate
# ---------------------------------------------------------------------------

_MCC_THR = 500


@query(
    "q391_mcc_gate",
    oracle=_LSH_CANDS_SQL + _MEMBERS_SQL + f""",
    scored AS (
      SELECT ({_SCORE_SQL} <= {_MCC_THR}) AS pred_dup,
             (m.doc_id IS NOT NULL) AS is_dup
      FROM documents d LEFT JOIN members m USING (doc_id)
    ),
    cm AS (
      SELECT CAST(SUM(CASE WHEN pred_dup AND is_dup THEN 1 ELSE 0 END)
                  AS BIGINT) AS tp,
             CAST(SUM(CASE WHEN pred_dup AND NOT is_dup THEN 1 ELSE 0 END)
                  AS BIGINT) AS fp,
             CAST(SUM(CASE WHEN NOT pred_dup AND is_dup THEN 1 ELSE 0 END)
                  AS BIGINT) AS fn,
             CAST(SUM(CASE WHEN NOT pred_dup AND NOT is_dup THEN 1
                      ELSE 0 END) AS BIGINT) AS tn
      FROM scored
    )
    SELECT tp, fp, fn, tn,
           ROUND(CAST(tp * tn - fp * fn AS DOUBLE)
                 / NULLIF(SQRT(CAST((tp + fp) AS DOUBLE) * (tp + fn)
                               * (tn + fp) * (tn + fn)), 0), 6) AS mcc
    FROM cm
    """,
)
def q391_mcc_gate(spark, sf_dir):
    """MATTHEWS CORRELATION COEFFICIENT of the milli-500
    quality gate as a near-dup predictor: the single-threshold
    confusion matrix and its chance-corrected correlation - the
    class-imbalance-proof summary (accuracy and F1 both flatter a
    gate on an imbalanced label; MCC ~ 0 exposes it) completing the
    gate-evaluation family: q287 AUC (threshold-free), q366 PR sweep
    (all thresholds), MCC (the deployed threshold).

    Exactness: the four cells are exact bigints; MCC is one identical
    expression (products up to ~1e13 exact in doubles, one
    correctly-rounded SQRT, one divide) rounded at 6dp.

    Scale: the label semi-join + a 4-cell aggregate; nothing else."""
    labeled = _neardup_labeled(spark, sf_dir)
    s = labeled.select(
        (F.col("score") <= _MCC_THR).alias("pred_dup"),
        (F.col("y") == 1).alias("is_dup"),
    )
    # per-cell when/otherwise (= the oracle's CASE ... ELSE 0): a
    # NULL-score doc (no text) is unevaluable by the gate and lands
    # in NO cell - listwise deletion from the confusion matrix, not
    # a NULL that poisons a cell sum (r14 all-NULL census)
    cm = s.agg(
        F.sum(F.when(F.col("pred_dup") & F.col("is_dup"), 1).otherwise(0))
        .cast("long")
        .alias("tp"),
        F.sum(
            F.when(F.col("pred_dup") & ~F.col("is_dup"), 1).otherwise(0)
        )
        .cast("long")
        .alias("fp"),
        F.sum(
            F.when(~F.col("pred_dup") & F.col("is_dup"), 1).otherwise(0)
        )
        .cast("long")
        .alias("fn"),
        F.sum(
            F.when(~F.col("pred_dup") & ~F.col("is_dup"), 1).otherwise(0)
        )
        .cast("long")
        .alias("tn"),
    )
    return cm.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(
            (F.col("tp") * F.col("tn") - F.col("fp") * F.col("fn")).cast(
                "double"
            )
            / F.nullif(
                F.sqrt(
                    (F.col("tp") + F.col("fp")).cast("double")
                    * (F.col("tp") + F.col("fn"))
                    * (F.col("tn") + F.col("fp"))
                    * (F.col("tn") + F.col("fn"))
                ),
                F.lit(0.0),
            ),
            6,
        ).alias("mcc"),
    )


# ---------------------------------------------------------------------------
# q393: Friedman test - do event types keep the same daily rank order?
# ---------------------------------------------------------------------------


def _densify_blocks(daily0):
    """Complete the (day x type) block design: cross the distinct
    days with the distinct types and zero-fill absent cells, so every
    day ranks exactly k types and every type spans exactly n days.
    Without this, a type with zero events on one day silently shrinks
    that day's rank span and desyncs per-type n_days (ADVICE r7).
    Both sides of the cross join are bounded aggregates (calendar x
    |types|), never fact-sized. Factored out so the incomplete-block
    behavior is unit-testable on a synthetic frame."""
    days = daily0.select("d").distinct()
    tys = daily0.select("ty").distinct()
    return (
        days.crossJoin(F.broadcast(tys))
        .join(daily0, ["d", "ty"], "left")
        .select("d", "ty", F.coalesce(F.col("y"), F.lit(0)).alias("y"))
    )


@query(
    "q393_friedman_test",
    oracle=f"""
    WITH daily0 AS (
      SELECT {EPOCH_DAY_SQL} AS d,
             event_type AS ty, CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    daily AS (
      -- DENSIFIED complete block: a type with zero events on a day
      -- still occupies a rank cell (y = 0); without this, an absent
      -- (day, type) cell silently shrinks that day's rank span and
      -- desyncs per-type n_days (ADVICE r7, medium).
      SELECT days.d, tys.ty, COALESCE(daily0.y, 0) AS y
      FROM (SELECT DISTINCT d FROM daily0) days
      CROSS JOIN (SELECT DISTINCT ty FROM daily0) tys
      LEFT JOIN daily0 USING (d, ty)
    ),
    ranked AS (
      SELECT a.d, a.ty,
             CAST(2 * SUM(CASE WHEN b.y < a.y THEN 1 ELSE 0 END)
                  + SUM(CASE WHEN b.y = a.y THEN 1 ELSE 0 END) + 1
                  AS BIGINT) AS r2
      FROM daily a JOIN daily b ON b.d = a.d
      GROUP BY a.d, a.ty, a.y
    ),
    sums AS (
      SELECT ty, CAST(SUM(r2) AS BIGINT) AS rank_sum_x2,
             CAST(COUNT(*) AS BIGINT) AS n_days
      FROM ranked GROUP BY ty
    ),
    stat AS (
      -- densification makes n_days uniform BY CONSTRUCTION; MIN is
      -- deterministic (ANY_VALUE was order-dependent) and the
      -- MIN = MAX guard turns any future incompleteness into a loud
      -- NULL statistic instead of a silently wrong one.
      SELECT CAST(CASE WHEN MIN(n_days) = MAX(n_days)
                       THEN MIN(n_days) END AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(rank_sum_x2 * rank_sum_x2) AS BIGINT) AS sr2
      FROM sums
    )
    SELECT s.ty AS event_type, s.rank_sum_x2,
           (1000 * s.rank_sum_x2) // (2 * s.n_days) AS mean_rank_milli,
           ROUND(3.0 * st.sr2 / (st.n * st.k * (st.k + 1))
                 - 3.0 * st.n * (st.k + 1), 6) AS friedman_chi2
    FROM sums s, stat st
    """,
)
def q393_friedman_test(spark, sf_dir):
    """FRIEDMAN TEST over the (day x event-type) count table: rank
    the k = 5 types WITHIN each day (midranks for ties, carried as
    exact DOUBLED integers) and test whether the rank sums differ -
    the ordinal sibling of q390's Cochran Q (binary outcomes) and the
    repeated-measures answer to "is the traffic mix stable day to
    day, or do types genuinely trade places?" With doubled midranks,
    chi2 = 3*sum(R2_j^2)/(n*k*(k+1)) - 3n(k+1) (the classic
    12/(nk(k+1)) form after R = R2/2).

    Exactness: the (day x type) grid is DENSIFIED first (absent cells
    rank as y = 0), so the block design is complete by construction
    and n_days is uniform - guarded by a MIN = MAX check that nulls
    the statistic loudly if it ever is not. Midranks come from the
    within-day 5x5 self-join (2*#smaller + #tied + 1 - exact,
    order-free); rank sums and their squares are bigint; the
    statistic is one identical float expression rounded at 6dp; mean
    ranks report as floor-milli. The UNCORRECTED Friedman form is
    intentional: the standard tie-correction divisor
    1 - sum(t^3-t)/(nk(k^2-1)) is omitted, which makes the statistic
    CONSERVATIVE under ties (integer daily counts tie rarely but can)
    - a deliberate, documented choice, not an oversight (ADVICE r7).

    Scale: the fact collapses to the calendar x k aggregate; the
    rank self-join is k^2 rows per day on that bounded frame
    (adjudicated-BNLJ class); everything else is k-row arithmetic."""
    ev = t(spark, sf_dir, "events")
    daily0 = ev.groupBy(
        F.floor(
            (F.col("ts_us") - F.lit(EVENTS_EPOCH_US)) / F.lit(US_PER_DAY)
        ).alias("d"),
        F.col("event_type").alias("ty"),
    ).agg(F.count("*").cast("long").alias("y"))
    daily = transient_persist(_densify_blocks(daily0))
    b = daily.select(
        F.col("d").alias("d2"), F.col("y").alias("yb")
    )
    ranked = (
        daily.join(F.broadcast(b), daily.d == b.d2)
        .groupBy("d", "ty", "y")
        .agg(
            (
                2 * F.sum((F.col("yb") < F.col("y")).cast("int"))
                + F.sum((F.col("yb") == F.col("y")).cast("int"))
                + 1
            )
            .cast("long")
            .alias("r2")
        )
    )
    sums = ranked.groupBy("ty").agg(
        F.sum("r2").cast("long").alias("rank_sum_x2"),
        F.count("*").cast("long").alias("n_days"),
    )
    stat = sums.agg(
        # densified blocks make n_days uniform by construction; the
        # MIN = MAX guard fails LOUDLY (NULL chi2) if that ever
        # breaks, instead of a nondeterministic first() silently
        # picking one of several values (ADVICE r7, medium).
        F.when(F.min("n_days") == F.max("n_days"), F.min("n_days"))
        .cast("long")
        .alias("n"),
        F.count("*").cast("long").alias("k"),
        F.sum(F.col("rank_sum_x2") * F.col("rank_sum_x2"))
        .cast("long")
        .alias("sr2"),
    )
    return sums.crossJoin(F.broadcast(stat)).select(
        F.col("ty").alias("event_type"),
        "rank_sum_x2",
        F.expr("(1000 * rank_sum_x2) DIV (2 * n_days)").alias(
            "mean_rank_milli"
        ),
        F.round(
            3.0 * F.col("sr2") / (F.col("n") * F.col("k") * (F.col("k") + 1))
            - 3.0 * F.col("n") * (F.col("k") + 1),
            6,
        ).alias("friedman_chi2"),
    )


# ---------------------------------------------------------------------------
# q394: Kruskal-Wallis H - do the k sources share a length distribution?
# ---------------------------------------------------------------------------

#: micro-quantization scale for the sum of R2^2/n terms: small enough
#: that R2_g^2 * _KW_M stays far below 2^63 at bench SFs (sf0.1:
#: (2.5e6)^2 * 1e3 ~ 6e15), large enough that the k-term truncation
#: error (<= k/_KW_M) is orders below the 6dp output rounding.
_KW_M = 1000

#: identical scalar-statistic strings for both engines (the q318 z
#: pattern): H from doubled rank sums (R = R2/2 folds the 1/4 into
#: 12 -> 3), then the textbook tie-correction divisor. The {_KW_M}
#: de-quantization factor is INTERPOLATED, not hardcoded, so bumping
#: _KW_M keeps the statistic and its quantized input (the sq term at
#: the two call sites below) in lockstep - a hardcoded 1000.0 here
#: would desync identically on both engines and the oracle twin could
#: never see it (ADVICE r11; the repo's own q430 shared-formula class).
_KW_H = (  # noqa: E501 - NULLIF-wrapped (r11 totality)
    f"""(3.0 * CAST(sq AS DOUBLE) / NULLIF(({float(_KW_M)} * CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) + 1.0)), 0) - 3.0 * (CAST(nn AS DOUBLE) + 1.0))"""
)
_KW_HC = (  # noqa: E501 - NULLIF-wrapped (r11 totality)
    f"""((3.0 * CAST(sq AS DOUBLE) / NULLIF(({float(_KW_M)} * CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) + 1.0)), 0) - 3.0 * (CAST(nn AS DOUBLE) + 1.0)) / NULLIF((1.0 - CAST(tt AS DOUBLE) / NULLIF((CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE) - CAST(nn AS DOUBLE)), 0)), 0))"""
)


@query(
    "q394_kruskal_wallis",
    oracle=f"""
    WITH x AS (
      SELECT source AS g, CAST(n_chars AS BIGINT) AS v FROM documents
      -- listwise deletion: missing lengths have no rank (r13 census)
      WHERE n_chars IS NOT NULL
    ),
    pv AS (
      SELECT v, CAST(COUNT(*) AS BIGINT) AS ct FROM x GROUP BY v
    ),
    rk AS (
      SELECT v, ct,
             SUM(ct) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - ct
               AS below
      FROM pv
    ),
    gv AS (
      SELECT g, v, CAST(COUNT(*) AS BIGINT) AS c FROM x GROUP BY g, v
    ),
    gr AS (
      SELECT gv.g,
             CAST(SUM(gv.c) AS BIGINT) AS n_g,
             CAST(SUM(gv.c * (2 * rk.below + rk.ct + 1)) AS BIGINT)
               AS r2_g
      FROM gv JOIN rk USING (v) GROUP BY gv.g
    ),
    s AS (
      SELECT CAST(SUM(n_g) AS BIGINT) AS nn,
             CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM((r2_g * r2_g * {_KW_M}) // n_g) AS BIGINT) AS sq
      FROM gr
    ),
    tie AS (
      SELECT CAST(SUM(ct * ct * ct - ct) AS BIGINT) AS tt FROM pv
    )
    SELECT gr.g AS source,
           gr.n_g AS n_docs,
           (1000 * gr.r2_g) // (2 * gr.n_g) AS mean_rank_milli,
           ROUND({_KW_H}, 6) AS h,
           ROUND({_KW_HC}, 6) AS h_tie_corrected
    FROM gr, s, tie
    """,
)
def q394_kruskal_wallis(spark, sf_dir):
    """KRUSKAL-WALLIS H test across ALL k sources at once: the
    k-group generalization of q318's two-sample Mann-Whitney - "does
    ANY crawler draw document lengths from a different distribution?"
    is one omnibus question, not k^2 pairwise ones, and this is the
    standard rank-based answer when normality is off the table.
    Reports per-source mean ranks (floor-milli) plus the shared H and
    its tie-corrected form H / (1 - sum(t^3-t)/(N^3-N)).

    Exactness: the q318 doubled-midrank device - per-(source, value)
    counts join the global tie table, so R2_g = sum c * (2*below +
    ct + 1) is exact bigint; the k-term sum of R2_g^2/n_g is carried
    as (R2^2 * 1000) DIV n_g bigints (order-independent by
    construction; truncation <= k/1000, orders below the 6dp
    rounding); H is one identical expression string both engines.

    Scale: two hash aggregates on the fact (by value, by
    group x value), a window over the VALUE-DOMAIN aggregate
    (adjudicated global_window class), and k-row joins. The fact is
    scanned once.

    Reference: SURVEY.md section 2.5 aggregation family; the
    inference-layer sibling of q393 (Friedman, blocked ordinal)."""
    x = t(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull()
    ).select(
        F.col("source").alias("g"), F.col("n_chars").cast("long").alias("v")
    )
    pv = x.groupBy("v").agg(F.count("*").cast("long").alias("ct"))
    w = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    rk = pv.select(
        "v", "ct", (F.sum("ct").over(w) - F.col("ct")).alias("below")
    )
    gv = x.groupBy("g", "v").agg(F.count("*").cast("long").alias("c"))
    gr = transient_persist(
        gv.join(rk, "v")
        .groupBy("g")
        .agg(
            F.sum("c").cast("long").alias("n_g"),
            F.sum(
                F.col("c") * (2 * F.col("below") + F.col("ct") + 1)
            )
            .cast("long")
            .alias("r2_g"),
        )
    )
    s = gr.agg(
        F.sum("n_g").cast("long").alias("nn"),
        F.count("*").cast("long").alias("k"),
        F.sum(
            F.expr(f"(r2_g * r2_g * {_KW_M}) DIV n_g")
        )
        .cast("long")
        .alias("sq"),
    )
    tie = pv.agg(
        F.sum(F.col("ct") * F.col("ct") * F.col("ct") - F.col("ct"))
        .cast("long")
        .alias("tt")
    )
    return (
        gr.crossJoin(F.broadcast(s))
        .crossJoin(F.broadcast(tie))
        .select(
            F.col("g").alias("source"),
            F.col("n_g").alias("n_docs"),
            F.expr("(1000 * r2_g) DIV (2 * n_g)").alias("mean_rank_milli"),
            F.round(F.expr(_KW_H), 6).alias("h"),
            F.round(F.expr(_KW_HC), 6).alias("h_tie_corrected"),
        )
    )


# ---------------------------------------------------------------------------
# q395: one-way ANOVA F + eta-squared of the quality score by source
# ---------------------------------------------------------------------------

#: milli-quantization for the between-group sum of S_g^2/n_g terms
#: (sf0.1 headroom: (2.5e5)^2 * 1e3 ~ 6e13 << 2^63).
_AOV_M = 1000

_AOV_F = (  # noqa: E501 - NULLIF-wrapped (r11 totality)
    """((CAST(ssb_q AS DOUBLE) / NULLIF((CAST(k AS DOUBLE) - 1.0), 0)) / NULLIF((CAST(ssw_q AS DOUBLE) / NULLIF((CAST(nn AS DOUBLE) - CAST(k AS DOUBLE)), 0)), 0))"""
)
_AOV_ETA = (  # noqa: E501 - NULLIF-wrapped (r11 totality)
    """(CAST(ssb_q AS DOUBLE) / NULLIF((CAST(ssb_q AS DOUBLE) + CAST(ssw_q AS DOUBLE)), 0))"""
)


@query(
    "q395_anova_score_by_source",
    oracle=f"""
    WITH x AS (
      SELECT source AS g, CAST({_SCORE_SQL} AS BIGINT) AS v
      FROM documents
    ),
    gm AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n_g,
             CAST(SUM(v) AS BIGINT) AS s_g
      FROM x GROUP BY g
    ),
    tot AS (
      SELECT CAST(SUM(n_g) AS BIGINT) AS nn,
             CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(s_g) AS BIGINT) AS s,
             CAST(SUM((s_g * s_g * {_AOV_M}) // n_g) AS BIGINT) AS bsum
      FROM gm
    ),
    q AS (
      SELECT CAST(SUM(v * v) AS BIGINT) AS qq FROM x
    ),
    stat AS (
      SELECT nn, k,
             bsum - (s * s * {_AOV_M}) // nn AS ssb_q,
             {_AOV_M} * qq - bsum AS ssw_q
      FROM tot, q
    )
    SELECT gm.g AS source, gm.n_g AS n_docs,
           gm.s_g // gm.n_g AS mean_score_milli,
           ROUND({_AOV_F}, 6) AS f_stat,
           ROUND({_AOV_ETA}, 6) AS eta_sq
    FROM gm, stat
    """,
)
def q395_anova_score_by_source(spark, sf_dir):
    """ONE-WAY ANOVA of the milli-unit quality score across the k
    sources: the classic variance decomposition F = MSB/MSW plus
    eta-squared (SSB/SST) as the effect size - the parametric
    counterpart to q394's rank-based omnibus, and the first statistic
    a corpus owner reads when deciding whether "source" explains
    quality variance or the mixture is homogeneous.

    Exactness: scores are exact milli bigints (((1000 * len(list_distinct(string_split_regex(trim(lower(text)), '\\s+')))) // len(string_split_regex(trim(lower(text)), '\\s+'))) - integer
    DIV, never a float); group moments (n, sum, sum-of-squares) are
    bigint; the between-group sum of S_g^2/n_g is carried as
    (S^2 * 1000) DIV n bigints so SSB_q = bsum - grand and
    SSW_q = 1000*Q - bsum are EXACT INTEGERS on both engines
    (order-independent folds); F and eta^2 are one identical
    expression string each, rounded once.

    Scale: one hash aggregate by source (k rows), one global
    sum-of-squares, k-row arithmetic after - pure map+combine, no
    window, no join on the fact."""
    x = t(spark, sf_dir, "documents").select(
        F.col("source").alias("g"), _int_score().alias("v")
    )
    gm = transient_persist(
        x.groupBy("g").agg(
            F.count("*").cast("long").alias("n_g"),
            F.sum("v").cast("long").alias("s_g"),
        )
    )
    tot = gm.agg(
        F.sum("n_g").cast("long").alias("nn"),
        F.count("*").cast("long").alias("k"),
        F.sum("s_g").cast("long").alias("s"),
        F.sum(F.expr(f"(s_g * s_g * {_AOV_M}) DIV n_g"))
        .cast("long")
        .alias("bsum"),
    )
    q = x.agg(F.sum(F.col("v") * F.col("v")).cast("long").alias("qq"))
    stat = (
        tot.crossJoin(F.broadcast(q))
        .select(
            "nn",
            "k",
            F.expr(f"bsum - (s * s * {_AOV_M}) DIV nn").alias("ssb_q"),
            F.expr(f"{_AOV_M} * qq - bsum").alias("ssw_q"),
        )
    )
    return gm.crossJoin(F.broadcast(stat)).select(
        F.col("g").alias("source"),
        F.col("n_g").alias("n_docs"),
        F.expr("s_g DIV n_g").alias("mean_score_milli"),
        F.round(F.expr(_AOV_F), 6).alias("f_stat"),
        F.round(F.expr(_AOV_ETA), 6).alias("eta_sq"),
    )


# ---------------------------------------------------------------------------
# q396: Brown-Forsythe variance-homogeneity test (lengths by source)
# ---------------------------------------------------------------------------


@query(
    "q396_brown_forsythe",
    oracle=f"""
    WITH x AS (
      SELECT source AS g, CAST(n_chars AS BIGINT) AS v FROM documents
    ),
    gv AS (
      SELECT g, v, CAST(COUNT(*) AS BIGINT) AS c FROM x GROUP BY g, v
    ),
    gn AS (
      SELECT g, CAST(SUM(c) AS BIGINT) AS n_g FROM gv GROUP BY g
    ),
    gw AS (
      SELECT g, v, c,
             SUM(c) OVER (PARTITION BY g ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM gv
    ),
    med AS (
      SELECT gw.g, MIN(gw.v) AS med
      FROM gw JOIN gn USING (g)
      WHERE gw.cum >= (gn.n_g + 1) // 2
      GROUP BY gw.g
    ),
    z AS (
      SELECT x.g, ABS(x.v - med.med) AS zv
      FROM x JOIN med USING (g)
    ),
    gm AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n_g,
             CAST(SUM(zv) AS BIGINT) AS s_g
      FROM z GROUP BY g
    ),
    tot AS (
      SELECT CAST(SUM(n_g) AS BIGINT) AS nn,
             CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(s_g) AS BIGINT) AS s,
             CAST(SUM((s_g * s_g * {_AOV_M}) // n_g) AS BIGINT) AS bsum
      FROM gm
    ),
    q AS (
      SELECT CAST(SUM(zv * zv) AS BIGINT) AS qq FROM z
    ),
    stat AS (
      SELECT nn, k,
             bsum - (s * s * {_AOV_M}) // nn AS ssb_q,
             {_AOV_M} * qq - bsum AS ssw_q
      FROM tot, q
    )
    SELECT gm.g AS source, gm.n_g AS n_docs,
           med.med AS median_chars,
           (1000 * gm.s_g) // gm.n_g AS mean_absdev_milli,
           ROUND({_AOV_F}, 6) AS w_stat
    FROM gm JOIN med ON med.g = gm.g, stat
    """,
)
def q396_brown_forsythe(spark, sf_dir):
    """BROWN-FORSYTHE test (Levene with group MEDIANS) for variance
    homogeneity of document lengths across sources: "two crawlers can
    share a mean length and still differ wildly in spread" - the
    dispersion sibling of q394/q395's location tests, and the check
    that validates the equal-variance assumption q395's F quietly
    makes. Per-source medians are the LOWER median (first value whose
    within-group cumulative count reaches (n+1) DIV 2) so the center
    is an EXACT INTEGER on both engines - the reason this implements
    Brown-Forsythe rather than mean-centered Levene, whose rational
    centers would float-ize every deviation.

    Exactness: |v - med| is bigint; the ANOVA-on-z decomposition
    reuses the q395 (S^2 * 1000) DIV n device, so SSB/SSW are
    exact integers and W is one identical expression string.

    Scale: per-group value-domain aggregate + a PARTITIONED window
    (per-source, never global), one broadcast of the k-row median
    table back onto the fact, then pure map+combine moments."""
    x = t(spark, sf_dir, "documents").select(
        F.col("source").alias("g"), F.col("n_chars").cast("long").alias("v")
    )
    gv = x.groupBy("g", "v").agg(F.count("*").cast("long").alias("c"))
    gn = gv.groupBy("g").agg(F.sum("c").cast("long").alias("n_g"))
    w = Window.partitionBy("g").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    gw = gv.select("g", "v", F.sum("c").over(w).alias("cum"))
    med = (
        gw.join(gn, "g")
        .filter(F.col("cum") >= F.expr("(n_g + 1) DIV 2"))
        .groupBy("g")
        .agg(F.min("v").alias("med"))
    )
    z = x.join(F.broadcast(med), "g").select(
        "g", F.abs(F.col("v") - F.col("med")).alias("zv")
    )
    gm = transient_persist(
        z.groupBy("g").agg(
            F.count("*").cast("long").alias("n_g"),
            F.sum("zv").cast("long").alias("s_g"),
        )
    )
    tot = gm.agg(
        F.sum("n_g").cast("long").alias("nn"),
        F.count("*").cast("long").alias("k"),
        F.sum("s_g").cast("long").alias("s"),
        F.sum(F.expr(f"(s_g * s_g * {_AOV_M}) DIV n_g"))
        .cast("long")
        .alias("bsum"),
    )
    q = z.agg(F.sum(F.col("zv") * F.col("zv")).cast("long").alias("qq"))
    stat = tot.crossJoin(F.broadcast(q)).select(
        "nn",
        "k",
        F.expr(f"bsum - (s * s * {_AOV_M}) DIV nn").alias("ssb_q"),
        F.expr(f"{_AOV_M} * qq - bsum").alias("ssw_q"),
    )
    return (
        gm.join(F.broadcast(med), "g")
        .crossJoin(F.broadcast(stat))
        .select(
            F.col("g").alias("source"),
            F.col("n_g").alias("n_docs"),
            F.col("med").alias("median_chars"),
            F.expr("(1000 * s_g) DIV n_g").alias("mean_absdev_milli"),
            F.round(F.expr(_AOV_F), 6).alias("w_stat"),
        )
    )


# ---------------------------------------------------------------------------
# q398: Fleiss' kappa across three independent quality gates
# ---------------------------------------------------------------------------

#: the three binary "raters": a length gate, a lexical-diversity gate,
#: and LSH near-dup membership (the q287 label). Thresholds sit near
#: the corpus medians at every SF (probed), so neither marginal is
#: degenerate.
_FK_LEN = 300
_FK_SCORE = 460

#: NULLIF on (1 - Pe): when every rater agrees on every document
#: (the r14 all-NULL census corpus - all three gates decide "fail"
#: on every NULL-text doc, so b = 0 and Pe = 1) chance agreement is
#: total and kappa is 0/0-undefined; both engines state NULL. In
#: contract the thresholds sit near corpus medians, so Pe < 1.
_FK_KAPPA = (
    "((CAST(a AS DOUBLE) / (6.0 * CAST(nn AS DOUBLE))"
    " - (CAST(b AS DOUBLE) * b + (3.0 * nn - b) * (3.0 * nn - b))"
    "   / (9.0 * CAST(nn AS DOUBLE) * nn))"
    " / NULLIF(1.0"
    " - (CAST(b AS DOUBLE) * b + (3.0 * nn - b) * (3.0 * nn - b))"
    "   / (9.0 * CAST(nn AS DOUBLE) * nn), 0))"
)


@query(
    "q398_fleiss_kappa_gates",
    oracle=_LSH_CANDS_SQL + _MEMBERS_SQL + f""",
    rated AS (
      SELECT (CASE WHEN d.n_chars >= {_FK_LEN} THEN 1 ELSE 0 END
              + CASE WHEN {_SCORE_SQL} >= {_FK_SCORE} THEN 1 ELSE 0 END
              + CASE WHEN m.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS xi
      FROM documents d LEFT JOIN members m USING (doc_id)
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS nn,
             CAST(SUM(xi) AS BIGINT) AS b,
             CAST(SUM(xi * (xi - 1) + (3 - xi) * (2 - xi)) AS BIGINT)
               AS a
      FROM rated
    )
    SELECT nn AS n_docs,
           b AS n_positive_ratings,
           ROUND(CAST(a AS DOUBLE) / (6.0 * CAST(nn AS DOUBLE)), 6)
             AS p_bar,
           ROUND({_FK_KAPPA}, 6) AS fleiss_kappa
    FROM s
    """,
)
def q398_fleiss_kappa_gates(spark, sf_dir):
    """FLEISS' KAPPA agreement among THREE binary quality raters -
    the length gate (n_chars >= 300), the lexical-diversity
    gate (milli score >= 460), and LSH near-dup membership:
    the m-rater generalization of q285's pairwise Cohen kappa. Near
    zero means the gates fire on essentially unrelated document sets
    (each adds real filtering signal); high kappa means the pipeline
    pays three gate evaluations for one gate's worth of information.

    Exactness: per-doc positive-rating counts x in {0..3}; the
    agreement numerator A = sum x(x-1) + (3-x)(2-x) and marginal
    B = sum x are EXACT BIGINT folds; P-bar = A/6N, the chance
    agreement Pe = (B^2 + (3N-B)^2)/(9N^2), and kappa are one
    identical expression string from those two integers - nothing to
    reorder, nothing to accumulate in float.

    Scale: the q43 candidate stage (bucketed, capped) + one label
    left-join + a 2-integer fold. One fact scan beyond the shared
    LSH stage."""
    labeled = _neardup_labeled(spark, sf_dir)
    # when(cond, 1).otherwise(0), not cond.cast(int): a rater must
    # DECIDE - a missing length/score rates "fail" exactly like the
    # oracle's CASE ... ELSE 0, while a NULL cast would poison xi and
    # the pairwise-agreement sum (r13 partial-records census)
    rated = labeled.select(
        (
            F.when(F.col("n_chars") >= _FK_LEN, 1).otherwise(0)
            + F.when(F.col("score") >= _FK_SCORE, 1).otherwise(0)
            + F.col("y")
        ).alias("xi")
    )
    s = rated.agg(
        F.count("*").cast("long").alias("nn"),
        F.sum("xi").cast("long").alias("b"),
        F.sum(
            F.col("xi") * (F.col("xi") - 1)
            + (3 - F.col("xi")) * (2 - F.col("xi"))
        )
        .cast("long")
        .alias("a"),
    )
    return s.select(
        F.col("nn").alias("n_docs"),
        F.col("b").alias("n_positive_ratings"),
        F.round(
            F.col("a").cast("double") / (6.0 * F.col("nn").cast("double")),
            6,
        ).alias("p_bar"),
        F.round(F.expr(_FK_KAPPA), 6).alias("fleiss_kappa"),
    )


# ---------------------------------------------------------------------------
# q399: Page's trend test - monotone ordering of event-type intensity
# ---------------------------------------------------------------------------

#: identical z-statistic string (normal approximation; Page 1963):
#: E[L] = n*k*(k+1)^2/4, Var[L] = n*k^2*(k+1)*(k^2-1)/144, carried
#: with the DOUBLED L (l2 = 2L) so the input is an exact bigint.
_PAGE_Z = (  # noqa: E501 - NULLIF-wrapped (r11 totality)
    """((CAST(l2 AS DOUBLE) / 2.0 - CAST(n AS DOUBLE) * k * (k + 1.0) * (k + 1.0) / 4.0) / NULLIF(SQRT(CAST(n AS DOUBLE) * k * k * (k + 1.0) * (k * k - 1.0) / 144.0), 0))"""
)


@query(
    "q399_page_trend_test",
    oracle=f"""
    WITH daily0 AS (
      SELECT {EPOCH_DAY_SQL} AS d,
             event_type AS ty, CAST(COUNT(*) AS BIGINT) AS y
      FROM events
      -- the test's treatments are the OBSERVED types: an unattributed
      -- event (NULL type) belongs to no treatment column, and the
      -- USING(ty) grid join would zero-fill it anyway while the
      -- hypothesized-order ROW_NUMBER diverges on NULL placement
      -- (r13 partial-records census)
      WHERE event_type IS NOT NULL GROUP BY 1, 2
    ),
    daily AS (
      SELECT days.d, tys.ty, COALESCE(daily0.y, 0) AS y
      FROM (SELECT DISTINCT d FROM daily0) days
      CROSS JOIN (SELECT DISTINCT ty FROM daily0) tys
      LEFT JOIN daily0 USING (d, ty)
    ),
    ranked AS (
      SELECT a.d, a.ty,
             CAST(2 * SUM(CASE WHEN b.y < a.y THEN 1 ELSE 0 END)
                  + SUM(CASE WHEN b.y = a.y THEN 1 ELSE 0 END) + 1
                  AS BIGINT) AS r2
      FROM daily a JOIN daily b ON b.d = a.d
      GROUP BY a.d, a.ty, a.y
    ),
    sums AS (
      SELECT ty, CAST(SUM(r2) AS BIGINT) AS rank_sum_x2,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(ROW_NUMBER() OVER (ORDER BY ty) AS BIGINT) AS j
      FROM ranked GROUP BY ty
    ),
    stat AS (
      SELECT CAST(CASE WHEN MIN(n_days) = MAX(n_days)
                       THEN MIN(n_days) END AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(j * rank_sum_x2) AS BIGINT) AS l2
      FROM sums
    )
    SELECT s.ty AS event_type, s.j AS hyp_order, s.rank_sum_x2,
           st.l2 AS page_l_x2,
           ROUND({_PAGE_Z}, 6) AS page_z
    FROM sums s, stat st
    """,
)
def q399_page_trend_test(spark, sf_dir):
    """PAGE'S TREND TEST on the densified (day x event-type) count
    table: where q393's Friedman asks "do the k types differ at all
    in daily rank?", Page's L asks the SHARPER ordered question - do
    daily ranks increase monotonically along a hypothesized type
    ordering? L = sum_j j * R_j concentrates its power on that
    alternative. The hypothesis order here is the fixed alphabetical
    type order (deterministic; in practice the analyst supplies the
    domain ordering - the machinery is order-agnostic).

    Exactness: reuses the q393 devices end-to-end - densified
    complete blocks (:func:`_densify_blocks`), doubled within-day
    midranks from the k^2 self-join, bigint rank sums - so
    L2 = 2L = sum j * R2_j is an exact bigint and the normal-
    approximation z (E[L] = nk(k+1)^2/4, Var[L] = nk^2(k+1)(k^2-1)/
    144) is one identical expression string, rounded once.

    Scale: identical to q393 - fact collapses to the calendar x k
    aggregate; the rank stage is k^2 per day on that bounded frame;
    the j-assignment window touches k rows."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()  # observed treatments only
    )
    daily0 = ev.groupBy(
        F.floor(
            (F.col("ts_us") - F.lit(EVENTS_EPOCH_US)) / F.lit(US_PER_DAY)
        ).alias("d"),
        F.col("event_type").alias("ty"),
    ).agg(F.count("*").cast("long").alias("y"))
    daily = transient_persist(_densify_blocks(daily0))
    b = daily.select(F.col("d").alias("d2"), F.col("y").alias("yb"))
    ranked = (
        daily.join(F.broadcast(b), daily.d == b.d2)
        .groupBy("d", "ty", "y")
        .agg(
            (
                2 * F.sum((F.col("yb") < F.col("y")).cast("int"))
                + F.sum((F.col("yb") == F.col("y")).cast("int"))
                + 1
            )
            .cast("long")
            .alias("r2")
        )
    )
    sums = ranked.groupBy("ty").agg(
        F.sum("r2").cast("long").alias("rank_sum_x2"),
        F.count("*").cast("long").alias("n_days"),
    ).withColumn(
        "j", F.row_number().over(Window.orderBy("ty")).cast("long")
    )
    stat = sums.agg(
        F.when(F.min("n_days") == F.max("n_days"), F.min("n_days"))
        .cast("long")
        .alias("n"),
        F.count("*").cast("long").alias("k"),
        F.sum(F.col("j") * F.col("rank_sum_x2")).cast("long").alias("l2"),
    )
    return sums.crossJoin(F.broadcast(stat)).select(
        F.col("ty").alias("event_type"),
        F.col("j").alias("hyp_order"),
        "rank_sum_x2",
        F.col("l2").alias("page_l_x2"),
        F.round(F.expr(_PAGE_Z), 6).alias("page_z"),
    )
