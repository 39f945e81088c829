"""Round-8 statistical-test suite — the trend/change-point/effect-size
tests a corpus-operations team runs on its daily telemetry and its
quality signals, completing the inference family (q318/q390-q402):
Mann-Kendall monotone trend, Pettitt change-point, Welch's t,
Cliff's delta, Mood's median test, Durbin-Watson autocorrelation of
OLS residuals, lagged cross-correlation, market concentration (HHI),
and Grubbs' max-deviation outlier.

Exactness discipline (the suite's integer-first rules, see
plans/registry.py): every cross-engine fold is an exact integer /
decimal(38,0) sum or a micro-quantized bigint of a per-cell double
both engines computed identically; scalar double arithmetic (z, t,
DW ratios) is the IDENTICAL expression string on both engines (IEEE
754 + correctly-rounded SQRT make it bit-identical); rounding happens
once, at the end. No libm LN/EXP anywhere in a comparison path — the
Pettitt p-value is reported in exact -ln form (ADVICE r7: libm is not
correctly rounded across engines).

Scale discipline: every query collapses the fact table to a
CALENDAR-bounded daily aggregate or a value census before any pair
enumeration (the q327/q318 adjudicated classes); windows run on those
bounded frames only. No operator here touches more than one fact
scan.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from .common import (
    EPOCH_DAY_SQL,
    EVENTS_EPOCH_US,
    US_PER_DAY,
    degenerate_frame,
    t,
    transient_persist,
)
from .registry import query

# ---------------------------------------------------------------------------
# shared daily-series scaffolding (the q377/q392/q402 calendar aggregate)
# ---------------------------------------------------------------------------

_DAILY_SQL = f"""
      SELECT {EPOCH_DAY_SQL} AS d,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1
"""


def _daily(spark, sf_dir):
    """(d, y): per-day event counts — the calendar-bounded aggregate
    every series test in this module runs on."""
    return (
        t(spark, sf_dir, "events")
        .groupBy(
            F.floor(
                (F.col("ts_us") - F.lit(EVENTS_EPOCH_US))
                / F.lit(US_PER_DAY)
            ).alias("d")
        )
        .agg(F.count("*").cast("long").alias("y"))
    )


# ---------------------------------------------------------------------------
# q403: Mann-Kendall monotone-trend test on daily volume
# ---------------------------------------------------------------------------

#: shared z expression: the +/-1 continuity correction and the
#: tie-corrected variance VarS = v18/18, one identical string both
#: engines (SQRT is correctly rounded; everything under it is bigint).
_MK_Z = (  # noqa: E501 - NULLIF-wrapped (r11 totality)
    """(CASE WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1.0) / NULLIF(SQRT(CAST(v18 AS DOUBLE) / 18.0), 0) WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1.0) / NULLIF(SQRT(CAST(v18 AS DOUBLE) / 18.0), 0) ELSE 0.0 END)"""
)


@query(
    "q403_mann_kendall",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    p AS (
      SELECT CAST(SUM(CASE WHEN b.y > a.y THEN 1
                           WHEN b.y < a.y THEN -1 ELSE 0 END)
                  AS BIGINT) AS s
      FROM daily a JOIN daily b ON b.d > a.d
    ),
    tie AS (
      SELECT CAST(COALESCE(SUM(ct * (ct - 1) * (2 * ct + 5)), 0)
                  AS BIGINT) AS tsum
      FROM (SELECT CAST(COUNT(*) AS BIGINT) AS ct FROM daily GROUP BY y)
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily),
    f AS (
      SELECT n, s,
             n * (n - 1) * (2 * n + 5) - tsum AS v18
      FROM p, tie, nn
    )
    SELECT n AS n_days, s AS s_stat, v18 AS var_s_x18,
           ROUND({_MK_Z}, 6) AS z_score
    FROM f
    """,
)
def q403_mann_kendall(spark, sf_dir):
    """MANN-KENDALL monotone-trend test on daily event volume: S =
    sum over day pairs i<j of sign(y_j - y_i), with the textbook
    tie-corrected variance and +/-1 continuity correction — the
    SIGNIFICANCE companion to q377's Theil-Sen slope (Sen estimates
    HOW steep, Mann-Kendall answers IS there a trend at all), the
    standard pairing in every monitoring stack because neither
    assumes normality.

    Exactness: S and the tie term sum(t(t-1)(2t+5)) are exact bigints
    (signs of bigint differences); VarS*18 = n(n-1)(2n+5) - tie is one
    bigint; z is ONE identical expression string (correctly-rounded
    SQRT), rounded 6dp once.

    Scale: the fact collapses to the CALENDAR-bounded daily aggregate
    before the pair stage; the |days|^2/2 self-join is the
    q327/q377 adjudicated-BNLJ class (grows with days, never with
    data volume). One fact scan, one groupBy(day)."""
    daily = transient_persist(_daily(spark, sf_dir))
    b = daily.select(F.col("d").alias("db"), F.col("y").alias("yb"))
    s = (
        daily.join(F.broadcast(b), F.col("db") > F.col("d"))
        .agg(
            F.sum(
                F.when(F.col("yb") > F.col("y"), 1)
                .when(F.col("yb") < F.col("y"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s")
        )
    )
    tie = (
        daily.groupBy("y")
        .agg(F.count("*").cast("long").alias("ct"))
        .agg(
            F.coalesce(
                F.sum(
                    F.col("ct") * (F.col("ct") - 1) * (2 * F.col("ct") + 5)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("tsum")
        )
    )
    nn = daily.agg(F.count("*").cast("long").alias("n"))
    f = (
        s.crossJoin(F.broadcast(tie))
        .crossJoin(F.broadcast(nn))
        .select(
            "n",
            "s",
            (
                F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
                - F.col("tsum")
            ).alias("v18"),
        )
    )
    return f.select(
        F.col("n").alias("n_days"),
        F.col("s").alias("s_stat"),
        F.col("v18").alias("var_s_x18"),
        F.round(F.expr(_MK_Z), 6).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# q404: Pettitt rank-based change-point test on daily volume
# ---------------------------------------------------------------------------


@query(
    "q404_pettitt_changepoint",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    v AS (
      SELECT a.d,
             CAST(SUM(CASE WHEN a.y > b.y THEN 1
                           WHEN a.y < b.y THEN -1 ELSE 0 END)
                  AS BIGINT) AS vk
      FROM daily a CROSS JOIN daily b GROUP BY a.d
    ),
    u AS (
      SELECT d,
             CAST(SUM(vk) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS BIGINT) AS uk
      FROM v
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(MAX(d) AS BIGINT) AS dmax FROM daily),
    pick AS (
      SELECT u.d, ABS(u.uk) AS k
      FROM u, nn WHERE u.d < nn.dmax
      ORDER BY ABS(u.uk) DESC, u.d ASC LIMIT 1
    )
    SELECT nn.n AS n_days, pick.d AS change_day, pick.k AS k_stat,
           (6000000 * pick.k * pick.k)
             // (nn.n * nn.n * nn.n + nn.n * nn.n)
             AS neg_ln_p_micro
    FROM pick, nn
    """,
)
def q404_pettitt_changepoint(spark, sf_dir):
    """PETTITT rank-based change-point test: U_k = sum_{i<=k, j>k}
    sign(y_i - y_j); the split day maximizing |U_k| is the most
    likely mean-shift point, with approximate significance p ~
    2*exp(-6K^2/(n^3+n^2)) — the nonparametric sibling of q260's
    CUSUM (which assumes the pre/post means matter; Pettitt only
    uses ranks, so a single monster day can't fake a regime change).

    The p-value is reported as -ln(p/2) in EXACT integer micro-nats
    (6e6*K^2 DIV (n^3+n^2)) rather than through libm EXP, which is
    not correctly rounded and therefore not cross-engine
    bit-identical (ADVICE r7 on the LN family) — the monitoring
    consumer thresholds on the exact integer instead.

    Exactness: U_k via the recurrence U_k - U_{k-1} = sum_j
    sign(y_k - y_j) — one |days|^2 census join and one cumulative
    window over the bounded daily frame; everything bigint; argmax
    tie-breaks to the earliest day in both engines.

    Scale: same q327-class bounded pair stage as q403; the window and
    argmax run on the |days|-row frame."""
    daily = transient_persist(_daily(spark, sf_dir))
    b = daily.select(F.col("d").alias("db"), F.col("y").alias("yb"))
    v = (
        daily.crossJoin(F.broadcast(b))
        .groupBy("d")
        .agg(
            F.sum(
                F.when(F.col("y") > F.col("yb"), 1)
                .when(F.col("y") < F.col("yb"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("vk")
        )
    )
    w = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    u = v.select("d", F.sum("vk").over(w).cast("long").alias("uk"))
    nn = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.max("d").cast("long").alias("dmax"),
    )
    pick = (
        u.crossJoin(F.broadcast(nn))
        .filter(F.col("d") < F.col("dmax"))
        .select("d", F.abs(F.col("uk")).alias("k"), "n")
        .orderBy(F.col("k").desc(), F.col("d").asc())
        .limit(1)
    )
    return pick.select(
        F.col("n").alias("n_days"),
        F.col("d").alias("change_day"),
        F.col("k").alias("k_stat"),
        F.expr(
            "(6000000 * k * k) DIV (n * n * n + n * n)"
        ).alias("neg_ln_p_micro"),
    )


# ---------------------------------------------------------------------------
# q405: Welch's t-test + Cohen's d between two crawl sources
# ---------------------------------------------------------------------------

_WT_A, _WT_B = "src0", "src1"

#: sample variances from integer moments, then Welch t, the
#: Welch-Satterthwaite df, and pooled-sd Cohen's d — one identical
#: expression family on both engines (pure double ratio chains over
#: bigints; SQRT correctly rounded).
_WT_V0 = (  # noqa: E501 - NULLIF-wrapped (r11 totality)
    """((CAST(q0 AS DOUBLE) - CAST(s0 AS DOUBLE) * s0 / NULLIF(n0, 0)) / NULLIF((CAST(n0 AS DOUBLE) - 1.0), 0))"""
)
_WT_V1 = (  # noqa: E501 - NULLIF-wrapped (r11 totality)
    """((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / NULLIF(n1, 0)) / NULLIF((CAST(n1 AS DOUBLE) - 1.0), 0))"""
)
_WT_T = (  # noqa: E501 - NULLIF-wrapped (r11 totality)
    """((CAST(s0 AS DOUBLE) / NULLIF(n0, 0) - CAST(s1 AS DOUBLE) / NULLIF(n1, 0)) / NULLIF(SQRT(((CAST(q0 AS DOUBLE) - CAST(s0 AS DOUBLE) * s0 / NULLIF(n0, 0)) / NULLIF((CAST(n0 AS DOUBLE) - 1.0), 0)) / NULLIF(n0, 0) + ((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / NULLIF(n1, 0)) / NULLIF((CAST(n1 AS DOUBLE) - 1.0), 0)) / NULLIF(n1, 0)), 0))"""
)
_WT_DF = (  # noqa: E501 - NULLIF-wrapped (r11 totality)
    """((((CAST(q0 AS DOUBLE) - CAST(s0 AS DOUBLE) * s0 / NULLIF(n0, 0)) / NULLIF((CAST(n0 AS DOUBLE) - 1.0), 0)) / NULLIF(n0, 0) + ((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / NULLIF(n1, 0)) / NULLIF((CAST(n1 AS DOUBLE) - 1.0), 0)) / NULLIF(n1, 0)) * (((CAST(q0 AS DOUBLE) - CAST(s0 AS DOUBLE) * s0 / NULLIF(n0, 0)) / NULLIF((CAST(n0 AS DOUBLE) - 1.0), 0)) / NULLIF(n0, 0) + ((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / NULLIF(n1, 0)) / NULLIF((CAST(n1 AS DOUBLE) - 1.0), 0)) / NULLIF(n1, 0)) / NULLIF(((((CAST(q0 AS DOUBLE) - CAST(s0 AS DOUBLE) * s0 / NULLIF(n0, 0)) / NULLIF((CAST(n0 AS DOUBLE) - 1.0), 0)) / NULLIF(n0, 0)) * (((CAST(q0 AS DOUBLE) - CAST(s0 AS DOUBLE) * s0 / NULLIF(n0, 0)) / NULLIF((CAST(n0 AS DOUBLE) - 1.0), 0)) / NULLIF(n0, 0)) / NULLIF((CAST(n0 AS DOUBLE) - 1.0), 0) + (((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / NULLIF(n1, 0)) / NULLIF((CAST(n1 AS DOUBLE) - 1.0), 0)) / NULLIF(n1, 0)) * (((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / NULLIF(n1, 0)) / NULLIF((CAST(n1 AS DOUBLE) - 1.0), 0)) / NULLIF(n1, 0)) / NULLIF((CAST(n1 AS DOUBLE) - 1.0), 0)), 0))"""
)
_WT_D = (  # noqa: E501 - NULLIF-wrapped (r11 totality)
    """((CAST(s0 AS DOUBLE) / NULLIF(n0, 0) - CAST(s1 AS DOUBLE) / NULLIF(n1, 0)) / NULLIF(SQRT(((CAST(n0 AS DOUBLE) - 1.0) * ((CAST(q0 AS DOUBLE) - CAST(s0 AS DOUBLE) * s0 / NULLIF(n0, 0)) / NULLIF((CAST(n0 AS DOUBLE) - 1.0), 0)) + (CAST(n1 AS DOUBLE) - 1.0) * ((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / NULLIF(n1, 0)) / NULLIF((CAST(n1 AS DOUBLE) - 1.0), 0))) / NULLIF((CAST(n0 AS DOUBLE) + n1 - 2.0), 0)), 0))"""
)


@query(
    "q405_welch_ttest",
    oracle=f"""
    WITH m AS (
      SELECT
        CAST(SUM(CASE WHEN source = '{_WT_A}' THEN 1 ELSE 0 END)
             AS BIGINT) AS n0,
        CAST(SUM(CASE WHEN source = '{_WT_A}' THEN n_chars ELSE 0 END)
             AS BIGINT) AS s0,
        CAST(SUM(CASE WHEN source = '{_WT_A}'
                 THEN n_chars * n_chars ELSE 0 END) AS BIGINT) AS q0,
        CAST(SUM(CASE WHEN source = '{_WT_B}' THEN 1 ELSE 0 END)
             AS BIGINT) AS n1,
        CAST(SUM(CASE WHEN source = '{_WT_B}' THEN n_chars ELSE 0 END)
             AS BIGINT) AS s1,
        CAST(SUM(CASE WHEN source = '{_WT_B}'
                 THEN n_chars * n_chars ELSE 0 END) AS BIGINT) AS q1
      FROM documents WHERE source IN ('{_WT_A}', '{_WT_B}')
        -- listwise deletion (r13 partial-records census)
        AND n_chars IS NOT NULL
    )
    SELECT n0, n1,
           (1000 * s0) // n0 AS mean0_milli,
           (1000 * s1) // n1 AS mean1_milli,
           ROUND({_WT_T}, 6) AS t_welch,
           ROUND({_WT_DF}, 4) AS df_welch,
           ROUND({_WT_D}, 6) AS cohens_d
    FROM m
    """,
)
def q405_welch_ttest(spark, sf_dir):
    """WELCH'S T-TEST between 'src0' and 'src1' document
    lengths — the unequal-variance two-sample test (the parametric
    partner of q318's Mann-Whitney: MW asks "same distribution?",
    Welch asks "same MEAN?" without the classic-t's equal-variance
    trap), plus the Welch-Satterthwaite effective df and pooled-sd
    Cohen's d so the readout carries an effect SIZE, not just a
    score.

    Exactness: the six moments (n, sum, sum-of-squares per group) are
    exact bigints from one conditional-aggregate scan; t, df, and d
    are ONE identical expression family over them (IEEE doubles +
    correctly-rounded SQRT), each rounded once.

    Scale: single scan, single 6-cell partial-aggregated reduce — no
    join, no shuffle beyond the 1-row aggregate."""
    m = (
        t(spark, sf_dir, "documents")
        .filter(
            F.col("source").isin(_WT_A, _WT_B)
            # listwise deletion, mirrors the oracle (r13 census)
            & F.col("n_chars").isNotNull()
        )
        .agg(
            F.sum(
                F.when(F.col("source") == _WT_A, 1).otherwise(0)
            ).cast("long").alias("n0"),
            F.sum(
                F.when(F.col("source") == _WT_A, F.col("n_chars"))
                .otherwise(0)
            ).cast("long").alias("s0"),
            F.sum(
                F.when(
                    F.col("source") == _WT_A,
                    F.col("n_chars") * F.col("n_chars"),
                ).otherwise(0)
            ).cast("long").alias("q0"),
            F.sum(
                F.when(F.col("source") == _WT_B, 1).otherwise(0)
            ).cast("long").alias("n1"),
            F.sum(
                F.when(F.col("source") == _WT_B, F.col("n_chars"))
                .otherwise(0)
            ).cast("long").alias("s1"),
            F.sum(
                F.when(
                    F.col("source") == _WT_B,
                    F.col("n_chars") * F.col("n_chars"),
                ).otherwise(0)
            ).cast("long").alias("q1"),
        )
    )
    return m.select(
        "n0",
        "n1",
        F.expr("(1000 * s0) DIV NULLIF(n0, 0)").alias("mean0_milli"),
        F.expr("(1000 * s1) DIV NULLIF(n1, 0)").alias("mean1_milli"),
        F.round(F.expr(_WT_T), 6).alias("t_welch"),
        F.round(F.expr(_WT_DF), 4).alias("df_welch"),
        F.round(F.expr(_WT_D), 6).alias("cohens_d"),
    )


# ---------------------------------------------------------------------------
# q406: Cliff's delta ordinal effect size between the same two sources
# ---------------------------------------------------------------------------

#: Romano et al. magnitude bands on |delta|, decided by exact integer
#: cross-multiplication (1000*|gt-lt| vs band*n0*n1) — no float
#: comparison anywhere near the label boundary.
_CD_MAG = (
    "(CASE WHEN 1000 * ABS(gt - lt) < 147 * n0 * n1 THEN 'negligible'"
    " WHEN 1000 * ABS(gt - lt) < 330 * n0 * n1 THEN 'small'"
    " WHEN 1000 * ABS(gt - lt) < 474 * n0 * n1 THEN 'medium'"
    " ELSE 'large' END)"
)


@query(
    "q406_cliffs_delta",
    oracle=f"""
    WITH x AS (
      SELECT CAST(n_chars AS BIGINT) AS v,
             CAST(CASE WHEN source = '{_WT_A}' THEN 1 ELSE 0 END
                  AS BIGINT) AS g0,
             CAST(CASE WHEN source = '{_WT_B}' THEN 1 ELSE 0 END
                  AS BIGINT) AS g1
      FROM documents WHERE source IN ('{_WT_A}', '{_WT_B}')
        -- listwise deletion (r13 partial-records census)
        AND n_chars IS NOT NULL
    ),
    pv AS (
      SELECT v, CAST(SUM(g0) AS BIGINT) AS c0,
             CAST(SUM(g1) AS BIGINT) AS c1
      FROM x GROUP BY v
    ),
    rk AS (
      SELECT c0, c1,
             CAST(SUM(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) - c1 AS BIGINT) AS below1,
             CAST((SELECT SUM(c1) FROM pv)
               - SUM(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                 PRECEDING AND CURRENT ROW) AS BIGINT) AS above1
      FROM pv
    ),
    s AS (
      SELECT CAST((SELECT SUM(c0) FROM pv) AS BIGINT) AS n0,
             CAST((SELECT SUM(c1) FROM pv) AS BIGINT) AS n1,
             CAST(SUM(c0 * below1) AS BIGINT) AS gt,
             CAST(SUM(c0 * above1) AS BIGINT) AS lt
      FROM rk
    )
    SELECT n0, n1, gt AS gt_pairs, lt AS lt_pairs,
           ROUND((CAST(gt AS DOUBLE) - lt)
                 / (CAST(n0 AS DOUBLE) * n1), 6) AS cliffs_delta,
           {_CD_MAG} AS magnitude
    FROM s
    """,
)
def q406_cliffs_delta(spark, sf_dir):
    """CLIFF'S DELTA between 'src0' and 'src1' document
    lengths: P(X0 > X1) - P(X0 < X1) — the ordinal effect size that
    q318's Mann-Whitney z deliberately doesn't report (a z-score
    grows with n; delta answers "how OFTEN is a source-0 doc longer",
    which is what a sampling-policy decision actually needs), with
    the Romano magnitude band decided by exact integer
    cross-multiplication.

    Exactness: the value census (per-length counts per group) makes
    gt = sum c0(v)*#{{v1 < v}} and lt exact bigints via ONE cumulative
    window over the domain-bounded census; delta is one double ratio
    rounded 6dp; the band label compares integers only.

    Scale: groupBy(value) hash census (map-side combined), one
    window over the ~|distinct lengths| census rows (domain-bounded,
    the q318 adjudicated class), 1-row reduce."""
    x = (
        t(spark, sf_dir, "documents")
        .filter(
            F.col("source").isin(_WT_A, _WT_B)
            # listwise deletion, mirrors the oracle (r13 census)
            & F.col("n_chars").isNotNull()
        )
        .select(
            F.col("n_chars").cast("long").alias("v"),
            F.when(F.col("source") == _WT_A, 1).otherwise(0).alias("g0"),
            F.when(F.col("source") == _WT_B, 1).otherwise(0).alias("g1"),
        )
    )
    pv = x.groupBy("v").agg(
        F.sum("g0").cast("long").alias("c0"),
        F.sum("g1").cast("long").alias("c1"),
    )
    w = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wn = Window.partitionBy()
    rk = pv.select(
        "c0",
        "c1",
        (F.sum("c1").over(w) - F.col("c1")).cast("long").alias("below1"),
        (F.sum("c1").over(wn) - F.sum("c1").over(w))
        .cast("long")
        .alias("above1"),
        F.sum("c0").over(wn).cast("long").alias("n0"),
        F.sum("c1").over(wn).cast("long").alias("n1"),
    )
    s = rk.agg(
        F.first("n0").alias("n0"),
        F.first("n1").alias("n1"),
        F.sum(F.col("c0") * F.col("below1")).cast("long").alias("gt"),
        F.sum(F.col("c0") * F.col("above1")).cast("long").alias("lt"),
    )
    return s.select(
        "n0",
        "n1",
        F.col("gt").alias("gt_pairs"),
        F.col("lt").alias("lt_pairs"),
        F.round(
            (F.col("gt").cast("double") - F.col("lt"))
            / F.nullif(
                F.col("n0").cast("double") * F.col("n1"), F.lit(0.0)
            ),
            6,
        ).alias("cliffs_delta"),
        F.expr(_CD_MAG).alias("magnitude"),
    )


# ---------------------------------------------------------------------------
# q407: Mood's median test across ALL sources
# ---------------------------------------------------------------------------


@query(
    "q407_moods_median",
    oracle="""
    WITH pv AS (
      SELECT CAST(n_chars AS BIGINT) AS v,
             CAST(COUNT(*) AS BIGINT) AS ct
      FROM documents WHERE n_chars IS NOT NULL GROUP BY 1
    ),
    med AS (
      SELECT v AS m FROM (
        SELECT v, SUM(ct) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
          PRECEDING AND CURRENT ROW) AS cum,
          (SELECT SUM(ct) FROM pv) AS n
        FROM pv
      ) WHERE cum >= (n + 1) // 2
      ORDER BY v LIMIT 1
    ),
    cell AS (
      SELECT source,
             CAST(SUM(CASE WHEN n_chars > med.m THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_above,
             CAST(SUM(CASE WHEN n_chars <= med.m THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_le
      FROM documents, med
      WHERE n_chars IS NOT NULL GROUP BY source
    ),
    marg AS (
      SELECT CAST(SUM(n_above) AS BIGINT) AS ca,
             CAST(SUM(n_le) AS BIGINT) AS cl,
             CAST(SUM(n_above + n_le) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM cell
    ),
    contrib AS (
      SELECT CAST(ROUND(
               (n_above - CAST(n_above + n_le AS DOUBLE) * ca / n)
               * (n_above - CAST(n_above + n_le AS DOUBLE) * ca / n)
               / (CAST(n_above + n_le AS DOUBLE) * ca / n) * 1000000)
               AS BIGINT)
           + CAST(ROUND(
               (n_le - CAST(n_above + n_le AS DOUBLE) * cl / n)
               * (n_le - CAST(n_above + n_le AS DOUBLE) * cl / n)
               / (CAST(n_above + n_le AS DOUBLE) * cl / n) * 1000000)
               AS BIGINT) AS xm
      FROM cell, marg
    ),
    stat AS (
      SELECT marg.k - 1 AS dof,
             ROUND(SUM(contrib.xm) / 1000000.0, 4) AS chi2
      FROM contrib, marg GROUP BY marg.k
    )
    SELECT cell.source, med.m AS grand_median,
           cell.n_above, cell.n_le, stat.dof, stat.chi2
    FROM cell, med, stat
    """,
)
def q407_moods_median(spark, sf_dir):
    """MOOD'S MEDIAN TEST across ALL k crawl sources: split every
    document at the GRAND median length, then chi-square the k x 2
    above/at-or-below contingency — the blunt-but-assumption-free
    k-sample location screen (Kruskal-Wallis q394 is more powerful
    but rank-sensitive to tails; Mood's only asks "which side of the
    median", so heavy-tailed sources can't dominate). Ties sit in
    the at-or-below row on both engines by the same rule.

    Exactness: the grand median is an exact order statistic over the
    value census (rank (N+1) DIV 2); cells and marginals are exact
    bigints; each cell's (O-E)^2/E is the identical double both
    engines compute, micro-quantized to bigint before the fold
    (the q286 device), so the sum is order-independent by
    construction.

    Scale: one census groupBy(value), one groupBy(source) over the
    fact scan, then k-row algebra; the census window is
    domain-bounded (q318 adjudicated class)."""
    docs = t(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull()  # listwise deletion (r13 census)
    )
    pv = docs.groupBy(F.col("n_chars").cast("long").alias("v")).agg(
        F.count("*").cast("long").alias("ct")
    )
    w = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wn = Window.partitionBy()
    med = (
        pv.select(
            "v",
            F.sum("ct").over(w).alias("cum"),
            F.sum("ct").over(wn).alias("n"),
        )
        .filter(F.col("cum") >= F.expr("(n + 1) DIV 2"))
        .orderBy("v")
        .limit(1)
        .select(F.col("v").alias("m"))
    )
    cell = transient_persist(
        docs.crossJoin(F.broadcast(med))
        .groupBy("source")
        .agg(
            F.sum((F.col("n_chars") > F.col("m")).cast("int"))
            .cast("long")
            .alias("n_above"),
            F.sum((F.col("n_chars") <= F.col("m")).cast("int"))
            .cast("long")
            .alias("n_le"),
            F.first("m").alias("m"),
        )
    )
    marg = cell.agg(
        F.sum("n_above").cast("long").alias("ca"),
        F.sum("n_le").cast("long").alias("cl"),
        F.sum(F.col("n_above") + F.col("n_le")).cast("long").alias("n"),
        F.count("*").cast("long").alias("k"),
    )
    contrib = cell.crossJoin(F.broadcast(marg)).select(
        (
            F.round(
                (
                    F.col("n_above")
                    - (F.col("n_above") + F.col("n_le")).cast("double")
                    * F.col("ca")
                    / F.col("n")
                )
                * (
                    F.col("n_above")
                    - (F.col("n_above") + F.col("n_le")).cast("double")
                    * F.col("ca")
                    / F.col("n")
                )
                / F.nullif(
                    (F.col("n_above") + F.col("n_le")).cast("double")
                    * F.col("ca")
                    / F.col("n"),
                    F.lit(0.0),
                )
                * 1_000_000
            ).cast("long")
            + F.round(
                (
                    F.col("n_le")
                    - (F.col("n_above") + F.col("n_le")).cast("double")
                    * F.col("cl")
                    / F.col("n")
                )
                * (
                    F.col("n_le")
                    - (F.col("n_above") + F.col("n_le")).cast("double")
                    * F.col("cl")
                    / F.col("n")
                )
                / F.nullif(
                    (F.col("n_above") + F.col("n_le")).cast("double")
                    * F.col("cl")
                    / F.col("n"),
                    F.lit(0.0),
                )
                * 1_000_000
            ).cast("long")
        ).alias("xm")
    )
    stat = (
        contrib.agg(F.sum("xm").alias("xm"))
        .crossJoin(F.broadcast(marg.select("k")))
        .select(
            (F.col("k") - 1).alias("dof"),
            F.round(F.col("xm") / 1_000_000.0, 4).alias("chi2"),
        )
    )
    return cell.crossJoin(F.broadcast(stat)).select(
        "source",
        F.col("m").alias("grand_median"),
        "n_above",
        "n_le",
        "dof",
        "chi2",
    )


# ---------------------------------------------------------------------------
# q408: Durbin-Watson statistic on the daily OLS residuals
# ---------------------------------------------------------------------------


@query(
    "q408_durbin_watson",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(d) AS BIGINT) AS st,
             CAST(SUM(d * d) AS BIGINT) AS st2,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(d * y) AS BIGINT) AS sty
      FROM daily
    ),
    c AS (
      SELECT n, n * sty - st * sy AS a, n * st2 - st * st AS dd,
             (n * st2 - st * st) * sy - (n * sty - st * sy) * st AS b0
      FROM m
    ),
    e AS (
      SELECT daily.d,
             CAST(c.n * c.dd * daily.y - c.b0 - c.n * c.a * daily.d
                  AS DECIMAL(38, 0)) AS en
      FROM daily, c
    ),
    l AS (
      SELECT en, LAG(en) OVER (ORDER BY d) AS ep FROM e
    ),
    f AS (
      SELECT CAST(SUM(CASE WHEN ep IS NULL THEN CAST(0 AS DECIMAL(38, 0))
                  ELSE (en - ep) * (en - ep) END) AS DECIMAL(38, 0))
               AS num,
             CAST(SUM(en * en) AS DECIMAL(38, 0)) AS den
      FROM l
    )
    SELECT c.n AS n_days,
           ROUND(CAST(f.num AS DOUBLE) / CAST(f.den AS DOUBLE), 6)
             AS dw_stat,
           ROUND(1.0 - CAST(f.num AS DOUBLE)
                 / CAST(f.den AS DOUBLE) / 2.0, 6) AS rho_approx
    FROM f, c
    """,
)
def q408_durbin_watson(spark, sf_dir):
    """DURBIN-WATSON autocorrelation test on the residuals of the
    daily-volume OLS trend: DW = sum (e_t - e_{t-1})^2 / sum e_t^2 —
    "after removing the linear trend, are adjacent days still
    correlated?" The regression-diagnostic sibling of q336's raw ACF
    (ACF on the SERIES confounds trend with persistence; DW asks the
    question on DETRENDED residuals, which is what decides whether
    q346/q357's forecast intervals are honest). rho ~ 1 - DW/2 is the
    implied AR(1) coefficient.

    Exactness: residuals are scaled by the integer denominator n*D
    (D = n*St2 - St^2), making e~_t = n*D*y_t - B0 - n*A*t an EXACT
    integer; squares exceed bigint so both engines fold them in
    DECIMAL(38,0) (exact, order-free); DW is one double division
    rounded 6dp.

    Scale: the fact collapses to the calendar-bounded daily frame;
    the lag window runs on those |days| rows (adjudicated class);
    DECIMAL(38,0) headroom holds to ~1e8 events/day (1e31 of 1e38
    used at that volume)."""
    daily = transient_persist(_daily(spark, sf_dir))
    m = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("d").cast("long").alias("st"),
        F.sum(F.col("d") * F.col("d")).cast("long").alias("st2"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("d") * F.col("y")).cast("long").alias("sty"),
    )
    c = m.select(
        "n",
        (F.col("n") * F.col("sty") - F.col("st") * F.col("sy")).alias("a"),
        (F.col("n") * F.col("st2") - F.col("st") * F.col("st")).alias(
            "dd"
        ),
        (
            (F.col("n") * F.col("st2") - F.col("st") * F.col("st"))
            * F.col("sy")
            - (F.col("n") * F.col("sty") - F.col("st") * F.col("sy"))
            * F.col("st")
        ).alias("b0"),
    )
    e = daily.crossJoin(F.broadcast(c)).select(
        "d",
        "n",
        (
            F.col("n") * F.col("dd") * F.col("y")
            - F.col("b0")
            - F.col("n") * F.col("a") * F.col("d")
        )
        .cast("decimal(38,0)")
        .alias("en"),
    )
    wl = Window.orderBy("d")
    le = e.select(
        "n", "en", F.lag("en").over(wl).alias("ep")
    )
    f = le.agg(
        F.first("n").alias("n"),
        F.sum(
            F.when(
                F.col("ep").isNull(),
                F.lit(0).cast("decimal(38,0)"),
            ).otherwise(
                (F.col("en") - F.col("ep")) * (F.col("en") - F.col("ep"))
            )
        ).alias("num"),
        F.sum(F.col("en") * F.col("en")).alias("den"),
    )
    return f.select(
        # COALESCE: F.first over the residual stream is NULL on an
        # empty calendar where the oracle's c.n is the COUNT 0 (r11
        # empty-corpus census, NULL-vs-0 class); identical otherwise.
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_days"),
        F.round(
            F.col("num").cast("double")
            / F.nullif(F.col("den").cast("double"), F.lit(0.0)),
            6,
        ).alias("dw_stat"),
        F.round(
            1.0
            - F.col("num").cast("double")
            / F.nullif(F.col("den").cast("double"), F.lit(0.0))
            / 2.0,
            6,
        ).alias("rho_approx"),
    )


# ---------------------------------------------------------------------------
# q409: lagged cross-correlation between daily volume and daily reach
# ---------------------------------------------------------------------------

#: CCF depth: lags 0..5 (a business week of lead/lag structure).
_CCF_MAXLAG = 5

#: sample CCF r_L = sum_matched (y_t - ybar)(u_{t+L} - ubar) /
#: sqrt(sum(y - ybar)^2 * sum(u - ubar)^2), assembled from n-cleared
#: integers: cl = sum (n*y - Sy)(n*u' - Su) over matched pairs
#: (decimal-folded), vy = n*Qy - Sy^2, vu = n*Qu - Su^2 — one
#: identical expression string both engines.
_CCF_R = (  # noqa: E501 - NULLIF-wrapped (r11 totality)
    """(CAST(cl AS DOUBLE) / NULLIF((CAST(n AS DOUBLE) * SQRT(CAST(vy AS DOUBLE) * CAST(vu AS DOUBLE))), 0))"""
)


@query(
    "q409_ccf_volume_reach",
    oracle=f"""
    WITH daily AS (
      SELECT {EPOCH_DAY_SQL} AS d,
             CAST(COUNT(*) AS BIGINT) AS y,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS u
      FROM events GROUP BY 1
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(u) AS BIGINT) AS su,
             CAST(SUM(y * y) AS BIGINT) AS qy,
             CAST(SUM(u * u) AS BIGINT) AS qu
      FROM daily
    ),
    pairs AS (
      SELECT r.lag_d,
             CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(CAST((m.n * a.y - m.sy) AS DECIMAL(38, 0))
                      * (m.n * b.u - m.su)) AS DECIMAL(38, 0)) AS cl
      FROM range(0, {_CCF_MAXLAG + 1}) r(lag_d)
      JOIN daily a ON TRUE
      JOIN daily b ON b.d = a.d + r.lag_d
      CROSS JOIN m
      GROUP BY r.lag_d
    )
    SELECT pairs.lag_d, pairs.n_pairs,
           ROUND({_CCF_R.replace('cl', 'pairs.cl')
                        .replace(' n ', ' m.n ')
                        .replace('vy', '(m.n * m.qy - m.sy * m.sy)')
                        .replace('vu', '(m.n * m.qu - m.su * m.su)')},
                 6) AS ccf
    FROM pairs, m
    ORDER BY pairs.lag_d
    """,
)
def q409_ccf_volume_reach(spark, sf_dir):
    """LAGGED CROSS-CORRELATION between daily event VOLUME and daily
    unique-user REACH at lags 0..5: does a volume spike
    lead a reach spike (new users arriving) or lag it (existing users
    deepening)? The lead/lag structure q307's same-day correlation
    matrix cannot see, and the readout that decides which series is
    the leading indicator for capacity planning.

    Exactness: per-day (count, distinct users) are exact bigints; the
    n-cleared centered products (n*y - Sy)(n*u' - Su) fold in
    DECIMAL(38,0) (exact, order-free; bigint would overflow past
    ~3e9 events/day); vy/vu are bigints; r_L is ONE identical
    expression per lag, rounded 6dp.

    Scale: the fact collapses to the CALENDAR-bounded daily frame;
    the lag join is the q336-class banded self-join of that bounded
    aggregate (6 x |days| pairs), never fact-sized."""
    daily = transient_persist(
        t(spark, sf_dir, "events")
        .groupBy(
            F.floor(
                (F.col("ts_us") - F.lit(EVENTS_EPOCH_US))
                / F.lit(US_PER_DAY)
            ).alias("d")
        )
        .agg(
            F.count("*").cast("long").alias("y"),
            F.countDistinct("user_id").cast("long").alias("u"),
        )
    )
    m = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("sy"),
        F.sum("u").cast("long").alias("su"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("qy"),
        F.sum(F.col("u") * F.col("u")).cast("long").alias("qu"),
    )
    lags = spark.range(0, _CCF_MAXLAG + 1).select(
        F.col("id").cast("long").alias("lag_d")
    )
    b = daily.select(F.col("d").alias("db"), F.col("u").alias("ub"))
    pairs = (
        daily.crossJoin(F.broadcast(lags))
        .join(
            F.broadcast(b),
            F.col("db") == F.col("d") + F.col("lag_d"),
        )
        .crossJoin(F.broadcast(m))
        .groupBy("lag_d")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.sum(
                (F.col("n") * F.col("y") - F.col("sy"))
                .cast("decimal(38,0)")
                * (F.col("n") * F.col("ub") - F.col("su"))
            )
            .cast("decimal(38,0)")
            .alias("cl"),
        )
    )
    return (
        pairs.crossJoin(F.broadcast(m))
        .select(
            "lag_d",
            "n_pairs",
            F.round(
                F.col("cl").cast("double")
                / F.nullif(
                    F.col("n").cast("double")
                    * F.sqrt(
                        (
                            F.col("n") * F.col("qy")
                            - F.col("sy") * F.col("sy")
                        ).cast("double")
                        * (
                            F.col("n") * F.col("qu")
                            - F.col("su") * F.col("su")
                        ).cast("double")
                    ),
                    F.lit(0.0),
                ),
                6,
            ).alias("ccf"),
        )
        .orderBy("lag_d")
    )


# ---------------------------------------------------------------------------
# q410: Herfindahl-Hirschman supplier concentration per nation
# ---------------------------------------------------------------------------


@query(
    "q410_hhi_concentration",
    oracle="""
    WITH r AS (
      SELECT s.s_nationkey,
             l.l_suppkey,
             CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                                 * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2
    ),
    agg AS (
      SELECT s_nationkey,
             CAST(COUNT(*) AS BIGINT) AS n_suppliers,
             CAST(SUM(cents) AS BIGINT) AS total_cents,
             CAST(SUM(CAST(cents AS DECIMAL(38, 0)) * cents)
                  AS DECIMAL(38, 0)) AS sq,
             CAST(MAX(cents) AS BIGINT) AS top_cents
      FROM r GROUP BY 1
    )
    SELECT n.n_name AS nation, agg.n_suppliers,
           agg.total_cents,
           ROUND(CAST(agg.sq AS DOUBLE)
                 / (CAST(agg.total_cents AS DOUBLE)
                    * agg.total_cents), 6) AS hhi,
           (1000 * agg.top_cents) // agg.total_cents AS top_share_milli
    FROM agg JOIN nation n ON agg.s_nationkey = n.n_nationkey
    ORDER BY nation
    """,
)
def q410_hhi_concentration(spark, sf_dir):
    """HERFINDAHL-HIRSCHMAN INDEX of supplier revenue concentration
    within each nation: HHI = sum of squared revenue shares — the
    market-concentration scan a supply-chain (or crawl-source
    diversity) review runs; HHI > 0.25 is the classic
    "highly concentrated" line. Reports supplier count, total cents,
    HHI, and the top supplier's milli-share per nation.

    Exactness: revenue quantizes per ROW to cents (the q102/q152
    device — ROUND(x*100) of the identical double both engines
    computed), so every sum is bigint; the squared-cents fold runs in
    DECIMAL(38,0) (cents^2 passes bigint range at ~ sf10); HHI is one
    double ratio rounded 6dp; top share is integer milli.

    Scale: lineitem aggregates by (nation, supplier) in one
    map-side-combined pass (the supplier dimension join is
    stats-broadcast, not hinted); the HHI fold is |nations| x
    |suppliers-per-nation| rows, dimension-bounded."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
        )
        .cast("long")
        .alias("cents"),
    )
    sup = t(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    r = (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .groupBy("s_nationkey", "l_suppkey")
        .agg(F.sum("cents").cast("long").alias("cents"))
    )
    agg = r.groupBy("s_nationkey").agg(
        F.count("*").cast("long").alias("n_suppliers"),
        F.sum("cents").cast("long").alias("total_cents"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents"))
        .cast("decimal(38,0)")
        .alias("sq"),
        F.max("cents").cast("long").alias("top_cents"),
    )
    nat = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        agg.join(nat, agg.s_nationkey == nat.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            "n_suppliers",
            "total_cents",
            F.round(
                F.col("sq").cast("double")
                / (
                    F.col("total_cents").cast("double")
                    * F.col("total_cents")
                ),
                6,
            ).alias("hhi"),
            F.expr("(1000 * top_cents) DIV total_cents").alias(
                "top_share_milli"
            ),
        )
        .orderBy("nation")
    )


# ---------------------------------------------------------------------------
# q411: Grubbs' max-deviation outlier test on daily volume
# ---------------------------------------------------------------------------

#: G = max|y - ybar| / s from n-cleared integers: m = max|n*y - Sy|,
#: vy = n*Qy - Sy^2, s^2 = vy / (n(n-1)) — identical string both
#: engines (correctly-rounded SQRT over bigints).
_GRUBBS_G = (  # noqa: E501 - NULLIF-wrapped (r11 totality)
    """((CAST(m AS DOUBLE) / NULLIF(n, 0)) / NULLIF(SQRT(CAST(vy AS DOUBLE) / NULLIF((CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)), 0)), 0))"""
)


@query(
    "q411_grubbs_outlier",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    mo AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(y * y) AS BIGINT) AS qy
      FROM daily
    ),
    dev AS (
      SELECT daily.d, daily.y,
             ABS(mo.n * daily.y - mo.sy) AS a
      FROM daily, mo
    ),
    pick AS (
      SELECT d, y, a FROM dev ORDER BY a DESC, d ASC LIMIT 1
    )
    SELECT mo.n AS n_days, pick.d AS peak_day, pick.y AS peak_count,
           ROUND({_GRUBBS_G.replace(' m ', ' pick.a ')
                           .replace('(m ', '(pick.a ')
                           .replace(' n)', ' mo.n)')
                           .replace(' n ', ' mo.n ')
                           .replace('vy', '(mo.n * mo.qy - mo.sy * mo.sy)')},
                 6) AS g_stat
    FROM pick, mo
    """,
)
def q411_grubbs_outlier(spark, sf_dir):
    """GRUBBS' TEST statistic for the single most deviant day:
    G = max|y - ybar| / s — "is the worst day a statistical outlier
    or just the tail of normal variation?", the one-outlier
    formalization of q96's z-score scan (q96 lists every |z| > 3 row;
    Grubbs names THE extreme day and its studentized deviation, the
    input to an n-aware critical-value lookup).

    Exactness: the argmax runs on |n*y - Sy| (exact bigint,
    tie-broken to the earliest day identically in both engines); G is
    one identical expression over bigints (correctly-rounded SQRT),
    rounded 6dp.

    Scale: fact collapses to the calendar-bounded daily frame; the
    argmax is a 1-row TakeOrdered over it."""
    daily = transient_persist(_daily(spark, sf_dir))
    mo = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("qy"),
    )
    dev = daily.crossJoin(F.broadcast(mo)).select(
        "d",
        "y",
        "n",
        "sy",
        "qy",
        F.abs(F.col("n") * F.col("y") - F.col("sy")).alias("a"),
    )
    pick = dev.orderBy(F.col("a").desc(), F.col("d").asc()).limit(1)
    return pick.select(
        F.col("n").alias("n_days"),
        F.col("d").alias("peak_day"),
        F.col("y").alias("peak_count"),
        F.round(
            (F.col("a").cast("double") / F.col("n"))
            / F.nullif(
                F.sqrt(
                    (F.col("n") * F.col("qy") - F.col("sy") * F.col("sy"))
                    .cast("double")
                    / F.nullif(
                        F.col("n").cast("double")
                        * (F.col("n").cast("double") - 1.0),
                        F.lit(0.0),
                    )
                ),
                F.lit(0.0),
            ),
            6,
        ).alias("g_stat"),
    )


# ---------------------------------------------------------------------------
# q412: Cochran-Mantel-Haenszel test of gate association across sources
# ---------------------------------------------------------------------------

#: continuity-corrected CMH chi2 and the Mantel-Haenszel pooled odds
#: ratio, from micro-quantized per-stratum terms (exact bigint sums).
_CMH_CHI2 = (  # noqa: E501 - NULLIF-wrapped (r11 totality)
    """((ABS(CAST(dev_micro AS DOUBLE) / 1000000.0) - 0.5) * (ABS(CAST(dev_micro AS DOUBLE) / 1000000.0) - 0.5) / NULLIF((CAST(var_micro AS DOUBLE) / 1000000.0), 0))"""
)
_CMH_OR = (  # noqa: E501 - NULLIF-wrapped (r11 totality)
    """(CAST(ad_micro AS DOUBLE) / NULLIF(CAST(bc_micro AS DOUBLE), 0))"""
)


@query(
    "q412_cmh_gate_association",
    oracle=f"""
    WITH f AS (
      SELECT source,
             CAST(len({{tok}}) AS BIGINT) AS nt,
             CAST(len(list_distinct({{tok}})) AS BIGINT) AS nd
      FROM documents
      -- an ungateable (textless) record is outside both gates'
      -- domains: listwise deletion (r13 partial-records census)
      WHERE text IS NOT NULL
    ),
    g AS (
      SELECT source,
             CASE WHEN nt BETWEEN 20 AND 80 THEN 1 ELSE 0 END AS ga,
             CASE WHEN 5 * nd >= 2 * nt THEN 1 ELSE 0 END AS gb
      FROM f
    ),
    cell AS (
      SELECT source,
             CAST(SUM(ga * gb) AS BIGINT) AS a,
             CAST(SUM(ga * (1 - gb)) AS BIGINT) AS b,
             CAST(SUM((1 - ga) * gb) AS BIGINT) AS c,
             CAST(SUM((1 - ga) * (1 - gb)) AS BIGINT) AS d
      FROM g GROUP BY source
    ),
    terms AS (
      SELECT
        CAST(ROUND((a - CAST(a + b AS DOUBLE) * (a + c)
                    / (a + b + c + d)) * 1000000) AS BIGINT) AS dev_m,
        CAST(ROUND(CAST(a + b AS DOUBLE) * (c + d) * (a + c) * (b + d)
                   / (CAST(a + b + c + d AS DOUBLE)
                      * (a + b + c + d) * (a + b + c + d - 1))
                   * 1000000) AS BIGINT) AS var_m,
        CAST(ROUND(CAST(a AS DOUBLE) * d / (a + b + c + d) * 1000000)
             AS BIGINT) AS ad_m,
        CAST(ROUND(CAST(b AS DOUBLE) * c / (a + b + c + d) * 1000000)
             AS BIGINT) AS bc_m
      FROM cell
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
             CAST(SUM(dev_m) AS BIGINT) AS dev_micro,
             CAST(SUM(var_m) AS BIGINT) AS var_micro,
             CAST(SUM(ad_m) AS BIGINT) AS ad_micro,
             CAST(SUM(bc_m) AS BIGINT) AS bc_micro
      FROM terms
    )
    SELECT n_strata,
           ROUND({_CMH_CHI2}, 4) AS chi2_cmh,
           ROUND({_CMH_OR}, 6) AS or_mh
    FROM s
    """.replace("{tok}", "string_split_regex(trim(lower(text)), '\\s+')"),
)
def q412_cmh_gate_association(spark, sf_dir):
    """COCHRAN-MANTEL-HAENSZEL test: are the LENGTH gate and the
    REPETITION gate (q390's ga/gb) associated AFTER controlling for
    source? Each source is a stratum with its own 2x2 gate table; CMH
    pools the per-stratum deviations (a - E[a]) and variances, so a
    confounded marginal association (long docs cluster in repetitive
    sources) can't fake a within-source one — the categorical
    Simpson's-paradox guard, sibling of q355's slope version. Also
    reports the Mantel-Haenszel pooled odds ratio.

    Exactness: per-stratum cells are exact bigints; each stratum's
    E, V, ad/N, bc/N are the identical doubles both engines compute,
    micro-quantized to bigint BEFORE the cross-strata fold (the q286
    device), so sums are order-independent by construction; the
    continuity-corrected chi2 and OR are one shared expression each.

    Scale: one token-projection scan, one groupBy(source) — k
    strata rows of algebra after the aggregate."""
    docs = t(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()  # listwise deletion (r13 census)
    )
    f = docs.select(
        "source",
        F.expr("size(split(trim(lower(text)), '\\\\s+'))")
        .cast("long")
        .alias("nt"),
        F.expr("size(array_distinct(split(trim(lower(text)), '\\\\s+')))")
        .cast("long")
        .alias("nd"),
    )
    g = f.select(
        "source",
        F.col("nt").between(20, 80).cast("int").alias("ga"),
        (5 * F.col("nd") >= 2 * F.col("nt")).cast("int").alias("gb"),
    )
    cell = g.groupBy("source").agg(
        F.sum(F.col("ga") * F.col("gb")).cast("long").alias("a"),
        F.sum(F.col("ga") * (1 - F.col("gb"))).cast("long").alias("b"),
        F.sum((1 - F.col("ga")) * F.col("gb")).cast("long").alias("c"),
        F.sum((1 - F.col("ga")) * (1 - F.col("gb")))
        .cast("long")
        .alias("d"),
    )
    nn = (
        F.col("a") + F.col("b") + F.col("c") + F.col("d")
    )
    terms = cell.select(
        F.round(
            (
                F.col("a")
                - (F.col("a") + F.col("b")).cast("double")
                * (F.col("a") + F.col("c"))
                / F.nullif(nn.cast("double"), F.lit(0.0))
            )
            * 1_000_000
        )
        .cast("long")
        .alias("dev_m"),
        F.round(
            (F.col("a") + F.col("b")).cast("double")
            * (F.col("c") + F.col("d"))
            * (F.col("a") + F.col("c"))
            * (F.col("b") + F.col("d"))
            / F.nullif(
                nn.cast("double") * nn * (nn - 1), F.lit(0.0)
            )
            * 1_000_000
        )
        .cast("long")
        .alias("var_m"),
        F.round(
            F.col("a").cast("double") * F.col("d")
            / F.nullif(nn.cast("double"), F.lit(0.0)) * 1_000_000
        )
        .cast("long")
        .alias("ad_m"),
        F.round(
            F.col("b").cast("double") * F.col("c")
            / F.nullif(nn.cast("double"), F.lit(0.0)) * 1_000_000
        )
        .cast("long")
        .alias("bc_m"),
    )
    s = terms.agg(
        F.count("*").cast("long").alias("n_strata"),
        F.sum("dev_m").cast("long").alias("dev_micro"),
        F.sum("var_m").cast("long").alias("var_micro"),
        F.sum("ad_m").cast("long").alias("ad_micro"),
        F.sum("bc_m").cast("long").alias("bc_micro"),
    )
    return s.select(
        "n_strata",
        F.round(F.expr(_CMH_CHI2), 4).alias("chi2_cmh"),
        F.round(F.expr(_CMH_OR), 6).alias("or_mh"),
    )


# ---------------------------------------------------------------------------
# q413: A/A-calibrated log-rank test on time-to-first-purchase
# ---------------------------------------------------------------------------

#: chi2 = (O1 - E1)^2 / V from the exact event count and the
#: micro-quantized expectation/variance sums — one identical string.
_LR_CHI2 = (  # noqa: E501 - NULLIF-wrapped (r11 totality)
    """((CAST(o1 AS DOUBLE) - CAST(e1_micro AS DOUBLE) / 1000000.0) * (CAST(o1 AS DOUBLE) - CAST(e1_micro AS DOUBLE) / 1000000.0) / NULLIF((CAST(v_micro AS DOUBLE) / 1000000.0), 0))"""
)


@query(
    "q413_logrank_conversion",
    oracle=f"""
    WITH u AS (
      SELECT user_id, CAST(user_id % 2 AS BIGINT) AS g,
             MIN((epoch_us(ts) - {EVENTS_EPOCH_US}) // {US_PER_DAY})
               AS first_day,
             MAX((epoch_us(ts) - {EVENTS_EPOCH_US}) // {US_PER_DAY})
               AS last_day,
             MIN(CASE WHEN event_type = 'purchase' THEN
               (epoch_us(ts) - {EVENTS_EPOCH_US}) // {US_PER_DAY}
               END) AS purch_day
      FROM events GROUP BY 1
    ),
    obs AS (
      SELECT COALESCE(purch_day, last_day) - first_day AS t,
             CASE WHEN purch_day IS NOT NULL THEN 1 ELSE 0 END AS ev,
             g
      FROM u
    ),
    per_t AS (
      SELECT t,
             CAST(SUM(g * ev) AS BIGINT) AS d1,
             CAST(SUM((1 - g) * ev) AS BIGINT) AS d0,
             CAST(SUM(g * (1 - ev)) AS BIGINT) AS c1,
             CAST(SUM((1 - g) * (1 - ev)) AS BIGINT) AS c0
      FROM obs GROUP BY t
    ),
    tot AS (
      SELECT CAST(SUM(d1 + c1) AS BIGINT) AS n1,
             CAST(SUM(d0 + c0) AS BIGINT) AS n0
      FROM per_t
    ),
    risk AS (
      SELECT t, d1, d0,
             tot.n1 - COALESCE(SUM(d1 + c1) OVER (ORDER BY t ROWS
               BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS r1,
             tot.n1 + tot.n0 - COALESCE(SUM(d1 + d0 + c1 + c0) OVER
               (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND
                1 PRECEDING), 0) AS r
      FROM per_t, tot
    ),
    terms AS (
      SELECT CAST(SUM(d1) AS BIGINT) AS o1,
             CAST(SUM(CASE WHEN r > 0 AND d1 + d0 > 0 THEN
               CAST(ROUND(CAST(d1 + d0 AS DOUBLE) * r1 / r * 1000000)
                    AS BIGINT) ELSE 0 END) AS BIGINT) AS e1_micro,
             CAST(SUM(CASE WHEN r > 1 AND d1 + d0 > 0 THEN
               CAST(ROUND(CAST(d1 + d0 AS DOUBLE) * (CAST(r1 AS DOUBLE)
                    / r) * (1.0 - CAST(r1 AS DOUBLE) / r)
                    * (r - d1 - d0) / (r - 1) * 1000000)
                    AS BIGINT) ELSE 0 END) AS BIGINT) AS v_micro
      FROM risk
    )
    SELECT tot.n1 AS n_odd, tot.n0 AS n_even,
           terms.o1 AS conversions_odd,
           ROUND({_LR_CHI2}, 4) AS chi2_logrank
    FROM terms, tot
    """,
)
def q413_logrank_conversion(spark, sf_dir):
    """LOG-RANK TEST on time-to-first-purchase between the two halves
    of a deterministic parity A/A split — the survival-curve
    significance test q258's Kaplan-Meier was missing, run first as
    an A/A CALIBRATION (the split is user_id % 2, so the true effect
    is zero and the chi2 should be unremarkable; an instrument that
    flags its own A/A is broken — the q364 permutation-test
    discipline, survival edition). Users with no purchase are
    CENSORED at their last observed day: they leave the risk set
    without counting as conversions, which is exactly what a naive
    mean-time-to-convert gets wrong.

    Exactness: per-duration cells, prefix-window at-risk counts, and
    O1 are exact bigints; each duration's E and V terms are the
    identical doubles both engines compute, micro-quantized BEFORE
    the fold (q286 device); chi2 is one shared string rounded 4dp.

    Scale: one per-user aggregate over the fact; everything after
    lives on the |distinct durations|-row frame (calendar-bounded;
    the q258 adjudicated window class)."""
    ev = t(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.expr(
            f"MIN((ts_us - {EVENTS_EPOCH_US})) DIV {US_PER_DAY}"
        ).alias("first_day"),
        F.expr(
            f"MAX((ts_us - {EVENTS_EPOCH_US})) DIV {US_PER_DAY}"
        ).alias("last_day"),
        F.expr(
            f"MIN(CASE WHEN event_type = 'purchase' THEN"
            f" (ts_us - {EVENTS_EPOCH_US}) DIV {US_PER_DAY} END)"
        ).alias("purch_day"),
    ).withColumn("g", (F.col("user_id") % 2).cast("long"))
    obs = u.select(
        (
            F.coalesce(F.col("purch_day"), F.col("last_day"))
            - F.col("first_day")
        ).alias("t"),
        F.col("purch_day").isNotNull().cast("int").alias("ev"),
        "g",
    )
    per_t = obs.groupBy("t").agg(
        F.sum(F.col("g") * F.col("ev")).cast("long").alias("d1"),
        F.sum((1 - F.col("g")) * F.col("ev")).cast("long").alias("d0"),
        F.sum(F.col("g") * (1 - F.col("ev"))).cast("long").alias("c1"),
        F.sum((1 - F.col("g")) * (1 - F.col("ev")))
        .cast("long")
        .alias("c0"),
    )
    tot = per_t.agg(
        F.sum(F.col("d1") + F.col("c1")).cast("long").alias("n1"),
        F.sum(F.col("d0") + F.col("c0")).cast("long").alias("n0"),
    )
    wp = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    risk = per_t.crossJoin(F.broadcast(tot)).select(
        "t",
        "d1",
        "d0",
        (
            F.col("n1")
            - F.coalesce(
                F.sum(F.col("d1") + F.col("c1")).over(wp), F.lit(0)
            )
        ).alias("r1"),
        (
            F.col("n1")
            + F.col("n0")
            - F.coalesce(
                F.sum(
                    F.col("d1") + F.col("d0") + F.col("c1") + F.col("c0")
                ).over(wp),
                F.lit(0),
            )
        ).alias("r"),
    )
    dt = F.col("d1") + F.col("d0")
    terms = risk.agg(
        F.sum("d1").cast("long").alias("o1"),
        F.sum(
            F.when(
                (F.col("r") > 0) & (dt > 0),
                F.round(
                    dt.cast("double")
                    * F.col("r1")
                    / F.col("r")
                    * 1_000_000
                ).cast("long"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("e1_micro"),
        F.sum(
            F.when(
                (F.col("r") > 1) & (dt > 0),
                F.round(
                    dt.cast("double")
                    * (F.col("r1").cast("double") / F.col("r"))
                    * (1.0 - F.col("r1").cast("double") / F.col("r"))
                    * (F.col("r") - dt)
                    / (F.col("r") - 1)
                    * 1_000_000
                ).cast("long"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("v_micro"),
    )
    return terms.crossJoin(F.broadcast(tot)).select(
        F.col("n1").alias("n_odd"),
        F.col("n0").alias("n_even"),
        F.col("o1").alias("conversions_odd"),
        F.round(F.expr(_LR_CHI2), 4).alias("chi2_logrank"),
    )


# ---------------------------------------------------------------------------
# q414: Jensen-Shannon divergence between two sources' token mixes
# ---------------------------------------------------------------------------

#: JSD in nats from the two micro-floored KL sums; the bits version
#: divides by the ln(2) literal — identical constants both engines.
_JSD = (  # noqa: E501 - NULLIF-wrapped (r11 totality)
    """((CAST(sa AS DOUBLE) / NULLIF(na, 0) + CAST(sb AS DOUBLE) / NULLIF(nb, 0)) / 2000000.0)"""
)


@query(
    "q414_jsd_token_mix",
    oracle=f"""
    WITH tk AS (
      SELECT source, u.tok
      FROM documents,
           UNNEST(string_split_regex(trim(lower(text)), '\\s+'))
             AS u(tok)
      WHERE source IN ('{_WT_A}', '{_WT_B}')
    ),
    c AS (
      SELECT tok,
             CAST(SUM(CASE WHEN source = '{_WT_A}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS ca,
             CAST(SUM(CASE WHEN source = '{_WT_B}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS cb
      FROM tk GROUP BY tok
    ),
    n AS (
      SELECT CAST(SUM(ca) AS BIGINT) AS na,
             CAST(SUM(cb) AS BIGINT) AS nb,
             CAST(COUNT(*) AS BIGINT) AS vocab
      FROM c
    ),
    s AS (
      SELECT
        CAST(SUM(CASE WHEN ca > 0 THEN ca *
          CAST(FLOOR(LN(2.0 * ca * n.nb
                        / (CAST(ca AS DOUBLE) * n.nb + cb * n.na))
                     * 1000000) AS BIGINT) ELSE 0 END) AS BIGINT) AS sa,
        CAST(SUM(CASE WHEN cb > 0 THEN cb *
          CAST(FLOOR(LN(2.0 * cb * n.na
                        / (CAST(cb AS DOUBLE) * n.na + ca * n.nb))
                     * 1000000) AS BIGINT) ELSE 0 END) AS BIGINT) AS sb
      FROM c, n
    )
    SELECT n.na AS n_tokens_a, n.nb AS n_tokens_b, n.vocab,
           ROUND({_JSD.replace('na', 'n.na').replace('nb', 'n.nb')
                      .replace('sa', 's.sa').replace('sb', 's.sb')},
                 6) AS jsd_nats
    FROM s, n
    """,
)
def q414_jsd_token_mix(spark, sf_dir):
    """JENSEN-SHANNON DIVERGENCE between the unigram token
    distributions of 'src0' and 'src1': JSD = (KL(P||M) +
    KL(Q||M))/2 with M the midpoint mixture — the SYMMETRIC, always-
    finite distributional distance the drift family was missing
    (q229's KL needs smoothing hacks when a token is one-sided; JSD's
    midpoint makes every term finite by construction), and the
    standard corpus-pair distance in data-mixture work. 0 = identical
    mixes, ln(2) = disjoint vocabularies.

    Exactness: per-token counts and totals are exact bigints; each
    present token contributes c * FLOOR(LN(2*c*N'/(c*N' + c'*N))*1e6)
    — LN of a ratio of exact integers, the q375/q337 adjudicated
    floored-LN class whose libm bit-identity is pinned by
    tests/test_ln_bit_identity.py; the two KL sums are bigint folds,
    and the final JSD is one shared expression rounded 6dp.

    Scale: one token explode (map-side), one groupBy(token) census,
    one 2-cell reduce — vocabulary-bounded algebra after the census,
    no joins beyond the 1-row totals frame."""
    tk = (
        t(spark, sf_dir, "documents")
        .filter(F.col("source").isin(_WT_A, _WT_B))
        .select(
            "source",
            F.explode(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+")
            ).alias("tok"),
        )
    )
    c = tk.groupBy("tok").agg(
        F.sum(F.when(F.col("source") == _WT_A, 1).otherwise(0))
        .cast("long")
        .alias("ca"),
        F.sum(F.when(F.col("source") == _WT_B, 1).otherwise(0))
        .cast("long")
        .alias("cb"),
    )
    n = c.agg(
        F.sum("ca").cast("long").alias("na"),
        F.sum("cb").cast("long").alias("nb"),
        F.count("*").cast("long").alias("vocab"),
    )
    s = c.crossJoin(F.broadcast(n)).agg(
        F.sum(
            F.when(
                F.col("ca") > 0,
                F.col("ca")
                * F.floor(
                    F.log(
                        2.0
                        * F.col("ca")
                        * F.col("nb")
                        / F.nullif(
                            F.col("ca").cast("double") * F.col("nb")
                            + F.col("cb") * F.col("na"),
                            F.lit(0.0),
                        )
                    )
                    * 1_000_000
                ).cast("long"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("sa"),
        F.sum(
            F.when(
                F.col("cb") > 0,
                F.col("cb")
                * F.floor(
                    F.log(
                        2.0
                        * F.col("cb")
                        * F.col("na")
                        / F.nullif(
                            F.col("cb").cast("double") * F.col("na")
                            + F.col("ca") * F.col("nb"),
                            F.lit(0.0),
                        )
                    )
                    * 1_000_000
                ).cast("long"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("sb"),
    )
    return s.crossJoin(F.broadcast(n)).select(
        F.col("na").alias("n_tokens_a"),
        F.col("nb").alias("n_tokens_b"),
        "vocab",
        F.round(
            (
                F.col("sa").cast("double")
                / F.nullif(F.col("na").cast("double"), F.lit(0.0))
                + F.col("sb").cast("double")
                / F.nullif(F.col("nb").cast("double"), F.lit(0.0))
            )
            / 2_000_000.0,
            6,
        ).alias("jsd_nats"),
    )


# ---------------------------------------------------------------------------
# q415: Neyman-optimal stratified sample allocation by language
# ---------------------------------------------------------------------------

#: total sample slots to allocate across the language strata.
_NEY_TOTAL = 10_000

#: per-stratum Neyman weight w_h = n_h * S_h (S_h = sample stddev of
#: doc length) — the identical double both engines compute from the
#: three bigint moments, micro-quantized before any cross-stratum
#: arithmetic.
_NEY_W = (  # noqa: E501 - NULLIF-wrapped (r11 totality)
    """(CAST(n AS DOUBLE) * SQRT((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / NULLIF(n, 0)) / NULLIF((CAST(n AS DOUBLE) - 1.0), 0)))"""
)


@query(
    "q415_neyman_allocation",
    oracle=f"""
    WITH m AS (
      SELECT lang,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(n_chars) AS BIGINT) AS s,
             CAST(SUM(n_chars * n_chars) AS BIGINT) AS q
      FROM documents GROUP BY lang
    ),
    w AS (
      SELECT lang, n,
             CAST(ROUND({_NEY_W} * 1000000) AS BIGINT) AS w_micro
      FROM m
    ),
    tot AS (SELECT CAST(SUM(w_micro) AS BIGINT) AS wt,
                   CAST(SUM(n) AS BIGINT) AS n_docs FROM w),
    base AS (
      SELECT w.lang, w.n, w.w_micro,
             ({_NEY_TOTAL} * w.w_micro) // NULLIF(tot.wt, 0) AS fl,
             ({_NEY_TOTAL} * w.w_micro) % NULLIF(tot.wt, 0) AS rem
      FROM w, tot
    ),
    lv AS (
      SELECT {_NEY_TOTAL} - CAST(SUM(fl) AS BIGINT) AS leftover
      FROM base
    ),
    rk AS (
      SELECT lang, n, w_micro, fl,
             ROW_NUMBER() OVER (ORDER BY rem DESC, lang ASC) AS rn
      FROM base
    )
    SELECT rk.lang, rk.n AS n_docs, rk.w_micro AS weight_micro,
           rk.w_micro // (rk.n * 1000) AS sd_milli,
           CAST(rk.fl + CASE WHEN rk.rn <= lv.leftover THEN 1 ELSE 0
                END AS BIGINT) AS alloc
    FROM rk, lv
    ORDER BY lang
    """,
)
def q415_neyman_allocation(spark, sf_dir):
    """NEYMAN-OPTIMAL ALLOCATION of a 10000-doc evaluation
    sample across the language strata: n_h proportional to n_h * S_h,
    so variable strata get proportionally MORE slots than uniform
    ones — the variance-minimizing refinement of q82's proportional
    stratified sample (proportional allocation is optimal only when
    every stratum has the same spread; Neyman is the textbook fix),
    closed by largest-remainder rounding so the allocations sum to
    EXACTLY the budget (the q102 cent-reconciliation device).

    Exactness: per-stratum moments are exact bigints; w_h = n_h*S_h
    is the identical double both engines compute (correctly-rounded
    SQRT), micro-quantized to bigint BEFORE any cross-stratum use;
    floor shares, remainders, the remainder rank (tie-broken by
    lang), and the final +1 top-up are pure integers.

    Scale: one scan, one groupBy(lang); everything after is k-row
    algebra (the bounded-aggregate window class)."""
    m = t(spark, sf_dir, "documents").groupBy("lang").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("n_chars").cast("long").alias("s"),
        F.sum(F.col("n_chars") * F.col("n_chars"))
        .cast("long")
        .alias("q"),
    )
    w = m.select(
        "lang",
        "n",
        F.round(F.expr(_NEY_W) * 1_000_000).cast("long").alias(
            "w_micro"
        ),
    )
    tot = w.agg(
        F.sum("w_micro").cast("long").alias("wt"),
        F.sum("n").cast("long").alias("n_docs_total"),
    )
    base = w.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n",
        "w_micro",
        F.expr(f"({_NEY_TOTAL} * w_micro) DIV NULLIF(wt, 0)").alias("fl"),
        F.expr(f"({_NEY_TOTAL} * w_micro) % NULLIF(wt, 0)").alias("rem"),
    )
    lv = base.agg(
        (F.lit(_NEY_TOTAL) - F.sum("fl")).cast("long").alias("leftover")
    )
    rk = base.select(
        "lang",
        "n",
        "w_micro",
        "fl",
        F.row_number()
        .over(Window.orderBy(F.col("rem").desc(), F.col("lang").asc()))
        .alias("rn"),
    )
    return (
        rk.crossJoin(F.broadcast(lv))
        .select(
            "lang",
            F.col("n").alias("n_docs"),
            F.col("w_micro").alias("weight_micro"),
            F.expr("w_micro DIV (n * 1000)").alias("sd_milli"),
            (
                F.col("fl")
                + F.when(F.col("rn") <= F.col("leftover"), 1).otherwise(0)
            )
            .cast("long")
            .alias("alloc"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# q416: transitivity audit of the verified near-duplicate relation
# ---------------------------------------------------------------------------

#: verified-Jaccard edge threshold (on q46's 4dp-rounded similarity).
_TR_THRESHOLD = 0.5


def _tr_edges(spark, sf_dir):
    """Canonical (lo, hi) near-dup edges: q46's LSH-verified pairs at
    jaccard >= 0.5 (``_TR_THRESHOLD``), deduplicated.

    ``localCheckpoint`` (house lineage cut, graph.py:15) matters here:
    consumers self-join this frame 3-5 ways (wedge enumeration,
    adjacency union, closure probe), and a plain persist() leaves the
    full q46->q43->q42 lineage embedded in EVERY branch - the analyzed
    plan tree reached ~24 MB and each action burned 2-4 s of pure
    driver-side plan processing on a 256-row relation (r9 measurement).
    The checkpoint truncates the plan to the materialized blocks; the
    edge list is LSH-bounded, so recompute-on-executor-loss is a
    non-issue at any scale.

    Memoized through ``shared_stage`` (ADVICE r9): q416, q421 and
    q440 all consume this frame, and an unmemoized eager checkpoint
    would re-materialize the identical edge list three times per
    session while retaining every copy's blocks for the session
    lifetime (``release_transients`` cannot unpersist checkpoint
    blocks). One checkpoint per (applicationId, sf_dir) instead."""
    from .common import shared_stage
    from .dedup import q46_lsh_verified_jaccard

    def build():
        v = q46_lsh_verified_jaccard(spark, sf_dir).filter(
            F.col("jaccard") >= _TR_THRESHOLD
        )
        return (
            v.select(
                F.least("doc_a", "doc_b").alias("lo"),
                F.greatest("doc_a", "doc_b").alias("hi"),
            )
            .distinct()
            .localCheckpoint(eager=True)
        )

    return shared_stage(spark, sf_dir, "tr_edges", build)


@query(
    "q416_neardup_transitivity",
    oracle=None,  # assembled below from the q46 oracle CTEs
)
def q416_neardup_transitivity(spark, sf_dir):
    """TRANSITIVITY AUDIT of the verified near-duplicate relation:
    of all wedges (x-y, y-z both edges at jaccard >=
    0.5, ``_TR_THRESHOLD``), what fraction closes (x-z also an edge)? The
    go/no-go check before q78's connected-components COLLAPSE step:
    closure ~1 means clusters are cliques and keeping one canonical
    doc per component loses nothing; low closure means components
    chain together dissimilar documents and a component-wide collapse
    over-deletes (the classic MinHash-dedup failure mode at scale).

    Exactness: edges are q46's verified pairs (4dp-rounded jaccard
    identical in both engines) thresholded and canonicalized
    (lo < hi); wedge enumeration is an equi-join of the adjacency
    list with itself on the shared endpoint; closure is a join back
    to the edge set. All counts exact; the rate is integer milli.

    Scale: every join is keyed on doc ids of the EDGE LIST, whose
    size LSH banding already bounds (q43's capped buckets) - pair
    work is |edges|-bounded, never corpus-quadratic; the wedge
    fan-out is sum of deg^2 over near-dup clusters, bounded by the
    verified-cluster sizes the collapse would touch anyway."""
    # shared_stage-memoized + checkpointed already; re-registering it
    # as a transient would let release_transients() unpersist a frame
    # the session cache still hands out (ADVICE r9).
    e = _tr_edges(spark, sf_dir)
    adj = e.select(
        F.col("lo").alias("x"), F.col("hi").alias("y")
    ).union(e.select(F.col("hi").alias("x"), F.col("lo").alias("y")))
    a1 = adj.select(F.col("y").alias("mid"), F.col("x").alias("x1"))
    a2 = adj.select(F.col("y").alias("mid2"), F.col("x").alias("x2"))
    wedges = a1.join(
        a2, (F.col("mid") == F.col("mid2")) & (F.col("x1") < F.col("x2"))
    ).select("x1", "x2")
    # One lazy plan instead of three driver actions (r8 bench showed
    # the triple count() structure - not the shared LSH build - was
    # what billed ~6 s of stage-scheduling overhead to this query even
    # with every fixture warm): closure is a left join against the
    # DISTINCT edge list (no multiplicity change), folded with the
    # wedge count in a single aggregate, then the 1-row edge count is
    # broadcast-crossed in (house scalar-merge shape).
    flagged = wedges.join(
        F.broadcast(
            e.select(
                F.col("lo").alias("x1"),
                F.col("hi").alias("x2"),
                F.lit(1).alias("closed_flag"),
            )
        ),
        ["x1", "x2"],
        "left",
    )
    stats = flagged.agg(
        F.count(F.lit(1)).alias("n_wedges"),
        F.coalesce(F.sum("closed_flag"), F.lit(0))
        .cast("long")
        .alias("n_closed"),
    )
    ne = e.agg(F.count(F.lit(1)).alias("n_edges"))
    return ne.crossJoin(F.broadcast(stats)).select(
        "n_edges",
        "n_wedges",
        "n_closed",
        F.when(
            F.col("n_wedges") > 0,
            F.expr("(1000 * n_closed) DIV n_wedges"),
        ).alias("closure_milli"),
    )


from .dedup import _LSH_CANDS_SQL, _SHINGLES_SQL  # noqa: E402

ORACLE_Q416 = _LSH_CANDS_SQL + f""",
    sh2 AS (
      SELECT doc_id, list_distinct({_SHINGLES_SQL}) AS sset FROM documents
      WHERE doc_id IN (SELECT doc_a FROM cands UNION SELECT doc_b FROM cands)
    ),
    verified AS (
      SELECT c.doc_a, c.doc_b,
             ROUND(
               CAST(len(list_intersect(a.sset, b.sset)) AS DOUBLE) /
               len(list_distinct(list_concat(a.sset, b.sset))), 4
             ) AS jaccard
      FROM cands c
      JOIN sh2 a ON c.doc_a = a.doc_id
      JOIN sh2 b ON c.doc_b = b.doc_id
    ),
    e AS (
      SELECT DISTINCT LEAST(doc_a, doc_b) AS lo,
             GREATEST(doc_a, doc_b) AS hi
      FROM verified WHERE jaccard >= {_TR_THRESHOLD}
    ),
    adj AS (
      SELECT lo AS x, hi AS y FROM e
      UNION ALL SELECT hi AS x, lo AS y FROM e
    ),
    wedge AS (
      SELECT a1.x AS x1, a2.x AS x2
      FROM adj a1 JOIN adj a2 ON a1.y = a2.y AND a1.x < a2.x
    ),
    cnt AS (
      SELECT CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
             CAST(COUNT(*) AS BIGINT) AS n_wedges,
             CAST(COALESCE(SUM(CASE WHEN EXISTS (
               SELECT 1 FROM e WHERE e.lo = wedge.x1 AND e.hi = wedge.x2
             ) THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_closed
      FROM wedge
    )
    SELECT n_edges, n_wedges, n_closed,
           CASE WHEN n_wedges > 0 THEN (1000 * n_closed) // n_wedges
                END AS closure_milli
    FROM cnt
    """

from .registry import ORACLE as _ORACLE_REG  # noqa: E402

_ORACLE_REG["q416_neardup_transitivity"] = ORACLE_Q416


# ---------------------------------------------------------------------------
# q417: seasonal (weekday-stratified) Mann-Kendall trend test
# ---------------------------------------------------------------------------


@query(
    "q417_seasonal_mann_kendall",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    wd AS (SELECT d, d % 7 AS s, y FROM daily),
    p AS (
      SELECT CAST(SUM(CASE WHEN b.y > a.y THEN 1
                           WHEN b.y < a.y THEN -1 ELSE 0 END)
                  AS BIGINT) AS s_stat
      FROM wd a JOIN wd b ON b.s = a.s AND b.d > a.d
    ),
    grp AS (
      SELECT s, CAST(COUNT(*) AS BIGINT) AS n FROM wd GROUP BY s
    ),
    tie AS (
      SELECT CAST(COALESCE(SUM(ct * (ct - 1) * (2 * ct + 5)), 0)
                  AS BIGINT) AS tsum
      FROM (SELECT CAST(COUNT(*) AS BIGINT) AS ct FROM wd
            GROUP BY s, y)
    ),
    v AS (
      SELECT CAST(SUM(n * (n - 1) * (2 * n + 5)) AS BIGINT) AS vraw,
             CAST(COUNT(*) AS BIGINT) AS n_seasons
      FROM grp
    ),
    f AS (
      SELECT p.s_stat AS s, v.vraw - tie.tsum AS v18, v.n_seasons
      FROM p, tie, v
    )
    SELECT n_seasons, s AS s_stat, v18 AS var_s_x18,
           ROUND({_MK_Z}, 6) AS z_score
    FROM f
    """,
)
def q417_seasonal_mann_kendall(spark, sf_dir):
    """SEASONAL MANN-KENDALL trend test: q403's S statistic computed
    WITHIN each weekday stratum and pooled — the variant that q128's
    weekday seasonality demands, because plain MK reads a strong
    weekly cycle as noise (or worse, as trend when the window length
    isn't a multiple of 7). Only same-weekday day pairs are compared,
    so the weekly cycle cancels out of the statistic entirely; the
    pooled variance is the sum of per-stratum tie-corrected
    variances (Hirsch-Slack, independent-seasons form).

    Exactness: same devices as q403 — bigint S over the
    weekday-banded pair set, per-(weekday, value) tie census,
    pooled v18 bigint, one shared z string (continuity-corrected),
    rounded 6dp.

    Scale: pair enumeration is the q403 calendar-bounded class
    restricted further by the weekday equi-key (|days|^2/14 pairs);
    one fact scan, one groupBy(day)."""
    daily = transient_persist(
        _daily(spark, sf_dir).select(
            "d", (F.col("d") % 7).alias("s"), "y"
        )
    )
    b = daily.select(
        F.col("d").alias("db"), F.col("s").alias("sb"),
        F.col("y").alias("yb"),
    )
    p = (
        daily.join(
            F.broadcast(b),
            (F.col("sb") == F.col("s")) & (F.col("db") > F.col("d")),
        )
        .agg(
            F.sum(
                F.when(F.col("yb") > F.col("y"), 1)
                .when(F.col("yb") < F.col("y"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s_stat")
        )
    )
    grp = daily.groupBy("s").agg(F.count("*").cast("long").alias("n"))
    tie = (
        daily.groupBy("s", "y")
        .agg(F.count("*").cast("long").alias("ct"))
        .agg(
            F.coalesce(
                F.sum(
                    F.col("ct") * (F.col("ct") - 1) * (2 * F.col("ct") + 5)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("tsum")
        )
    )
    v = grp.agg(
        F.sum(F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5))
        .cast("long")
        .alias("vraw"),
        F.count("*").cast("long").alias("n_seasons"),
    )
    f = (
        p.crossJoin(F.broadcast(tie))
        .crossJoin(F.broadcast(v))
        .select(
            F.col("s_stat").alias("s"),
            (F.col("vraw") - F.col("tsum")).alias("v18"),
            "n_seasons",
        )
    )
    return f.select(
        "n_seasons",
        F.col("s").alias("s_stat"),
        F.col("v18").alias("var_s_x18"),
        F.round(F.expr(_MK_Z), 6).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# q418: turning-point randomness test on the daily series
# ---------------------------------------------------------------------------

#: z = (T - mu) / sigma with mu = 2(n-2)/3, sigma^2 = (16n - 29)/90 —
#: one identical string over the exact turning-point count. The
#: n >= 2 guard keeps sigma^2 positive: on a degenerate <=1-day frame
#: DuckDB ERRORS on SQRT(negative) where Spark yields NaN (r11
#: empty-corpus census) - with the shared CASE both engines NULL.
_TP_Z = (  # noqa: E501 - NULLIF-wrapped (r11 totality)
    """(CASE WHEN n >= 2 THEN ((CAST(tp AS DOUBLE) - 2.0 * (CAST(n AS DOUBLE) - 2.0) / 3.0) / NULLIF(SQRT((16.0 * CAST(n AS DOUBLE) - 29.0) / 90.0), 0)) END)"""
)


@query(
    "q418_turning_point_test",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    lagd AS (
      SELECT y,
             LAG(y) OVER (ORDER BY d) AS yp,
             LEAD(y) OVER (ORDER BY d) AS yn
      FROM daily
    ),
    s AS (
      SELECT CAST(SUM(CASE WHEN yp IS NOT NULL AND yn IS NOT NULL
                   AND ((y > yp AND y > yn) OR (y < yp AND y < yn))
                   THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM lagd
    )
    SELECT n AS n_days, tp AS n_turning_points,
           ROUND(2.0 * (CAST(n AS DOUBLE) - 2.0) / 3.0, 6)
             AS expected_tp,
           ROUND({_TP_Z}, 6) AS z_score
    FROM s
    """,
)
def q418_turning_point_test(spark, sf_dir):
    """TURNING-POINT TEST on daily volume: count days that are a
    strict local max or min of their +/-1-day neighborhood and
    compare to the 2(n-2)/3 expectation under randomness — the
    oscillation-sensitive randomness screen that complements q392's
    runs test (runs sees level-stickiness; turning points see
    alternation: too FEW turning points means momentum/trend, too
    MANY means a sawtooth like over-correction or a batching
    artifact).

    Exactness: the turning-point count is an exact integer from one
    LAG/LEAD window over the calendar-bounded daily frame (plateau
    days — equal to a neighbor — are not turning points, identically
    in both engines); z is one shared string, rounded 6dp.

    Scale: fact collapses to the daily aggregate; one window over
    |days| rows (adjudicated class); 1-row reduce."""
    daily = _daily(spark, sf_dir)
    wd = Window.orderBy("d")
    lagd = daily.select(
        "y",
        F.lag("y").over(wd).alias("yp"),
        F.lead("y").over(wd).alias("yn"),
    )
    s = lagd.agg(
        F.sum(
            F.when(
                F.col("yp").isNotNull()
                & F.col("yn").isNotNull()
                & (
                    ((F.col("y") > F.col("yp")) & (F.col("y") > F.col("yn")))
                    | ((F.col("y") < F.col("yp")) & (F.col("y") < F.col("yn")))
                ),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("tp"),
        F.count("*").cast("long").alias("n"),
    )
    return s.select(
        F.col("n").alias("n_days"),
        F.col("tp").alias("n_turning_points"),
        F.round(
            2.0 * (F.col("n").cast("double") - 2.0) / 3.0, 6
        ).alias("expected_tp"),
        F.round(F.expr(_TP_Z), 6).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# q419: Bartels rank von Neumann ratio (rank-based serial correlation)
# ---------------------------------------------------------------------------

#: RVN = sum (R_t - R_{t+1})^2 / (sum (R_t - Rbar)^2 / n) with
#: doubled midranks: numerator and the n-cleared denominator are
#: exact bigints (the x4 scale cancels in the ratio); the final
#: expression is written operation-for-operation identically on both
#: engines.


@query(
    "q419_bartels_rvn",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    pv AS (
      SELECT y, CAST(COUNT(*) AS BIGINT) AS ct FROM daily GROUP BY y
    ),
    rk AS (
      SELECT y,
             SUM(ct) OVER (ORDER BY y ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) - ct AS below, ct
      FROM pv
    ),
    r2 AS (
      SELECT daily.d,
             CAST(2 * rk.below + rk.ct + 1 AS BIGINT) AS r2
      FROM daily JOIN rk USING (y)
    ),
    l AS (
      SELECT r2, LEAD(r2) OVER (ORDER BY d) AS rn2 FROM r2
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(r2) AS BIGINT) AS sr2
      FROM r2
    ),
    nm AS (
      SELECT CAST(SUM(CASE WHEN rn2 IS NULL THEN 0
                  ELSE (r2 - rn2) * (r2 - rn2) END)
                  AS BIGINT) AS num
      FROM l
    ),
    dn AS (
      SELECT CAST(SUM((m.n * r2.r2 - m.sr2)
                      * (m.n * r2.r2 - m.sr2)) AS BIGINT) AS den
      FROM r2, m
    )
    SELECT m.n AS n_days, nm.num AS num_x4, dn.den AS den_x4n2,
           ROUND(CAST(nm.num AS DOUBLE)
                 / (CAST(dn.den AS DOUBLE) / m.n)
                 * CAST(m.n AS DOUBLE), 6) AS rvn
    FROM nm, dn, m
    """,
)
def q419_bartels_rvn(spark, sf_dir):
    """BARTELS' RANK VON NEUMANN RATIO on daily volume: the
    rank-based serial-correlation test — q408's Durbin-Watson asks
    the question on OLS residual VALUES (outlier-sensitive), Bartels
    asks it on RANKS, so one monster day can't fake persistence. RVN
    near 2 = serially independent; << 2 = positive persistence;
    >> 2 = alternation. Ties take midranks.

    Exactness: doubled midranks (2R integers) via the q318 value
    census; the successive-difference numerator and the n-cleared
    centered denominator are exact bigints (the x4 scale cancels in
    the ratio after multiplying back by n); RVN is one shared
    expression rounded 6dp.

    Scale: census groupBy(value) + two windows over the
    calendar-bounded daily frame (adjudicated class); 1-row reduce."""
    daily = _daily(spark, sf_dir)
    pv = daily.groupBy("y").agg(F.count("*").cast("long").alias("ct"))
    w = Window.orderBy("y").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    rk = pv.select(
        "y", (F.sum("ct").over(w) - F.col("ct")).alias("below"), "ct"
    )
    r2 = daily.join(rk, "y").select(
        "d",
        (2 * F.col("below") + F.col("ct") + 1).cast("long").alias("r2"),
    )
    r2 = transient_persist(r2)
    wd = Window.orderBy("d")
    led = r2.select(
        "r2", F.lead("r2").over(wd).alias("rn2")
    )
    m = r2.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("r2").cast("long").alias("sr2"),
    )
    num = led.agg(
        F.sum(
            F.when(F.col("rn2").isNull(), 0).otherwise(
                (F.col("r2") - F.col("rn2")) * (F.col("r2") - F.col("rn2"))
            )
        )
        .cast("long")
        .alias("num")
    )
    den = (
        r2.crossJoin(F.broadcast(m))
        .agg(
            F.sum(
                (F.col("n") * F.col("r2") - F.col("sr2"))
                * (F.col("n") * F.col("r2") - F.col("sr2"))
            )
            .cast("long")
            .alias("den")
        )
    )
    return (
        num.crossJoin(F.broadcast(den))
        .crossJoin(F.broadcast(m))
        .select(
            F.col("n").alias("n_days"),
            F.col("num").alias("num_x4"),
            F.col("den").alias("den_x4n2"),
            F.round(
                F.col("num").cast("double")
                / F.nullif(
                    F.col("den").cast("double") / F.col("n"), F.lit(0.0)
                )
                * F.col("n").cast("double"),
                6,
            ).alias("rvn"),
        )
    )


# ---------------------------------------------------------------------------
# q420: Wilcoxon signed-rank test, week-over-week daily volume
# ---------------------------------------------------------------------------

#: z from doubled quantities: W2 = 2*W+, E[W2] = n(n+1)/2,
#: Var[W2]*12 = 2n(n+1)(2n+1) - tie term — one identical string.
_WSR_Z = (  # noqa: E501 - NULLIF-wrapped (r11 totality)
    """((CAST(w2 AS DOUBLE) - CAST(n AS DOUBLE) * (n + 1) / 2.0) / NULLIF(SQRT(CAST(v12 AS DOUBLE) / 12.0), 0))"""
)


@query(
    "q420_wilcoxon_signed_rank",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    d7 AS (
      SELECT a.d, a.y - b.y AS diff
      FROM daily a JOIN daily b ON a.d = b.d + 7
    ),
    nz AS (SELECT ABS(diff) AS av, CASE WHEN diff > 0 THEN 1 ELSE 0
             END AS pos FROM d7 WHERE diff <> 0),
    pv AS (
      SELECT av, CAST(COUNT(*) AS BIGINT) AS ct,
             CAST(SUM(pos) AS BIGINT) AS cp
      FROM nz GROUP BY av
    ),
    rk AS (
      SELECT av, ct, cp,
             SUM(ct) OVER (ORDER BY av ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) - ct AS below
      FROM pv
    ),
    s AS (
      SELECT CAST(SUM(ct) AS BIGINT) AS n,
             CAST(SUM(cp * (2 * below + ct + 1)) AS BIGINT) AS w2,
             CAST(SUM(ct * ct * ct - ct) AS BIGINT) AS tt
      FROM rk
    ),
    f AS (
      SELECT n, w2,
             2 * n * (n + 1) * (2 * n + 1) - tt AS v12
      FROM s
    )
    SELECT n AS n_pairs, w2 AS w_plus_x2,
           ROUND({_WSR_Z}, 6) AS z_score
    FROM f
    """,
)
def q420_wilcoxon_signed_rank(spark, sf_dir):
    """WILCOXON SIGNED-RANK test of week-over-week daily volume:
    pair every day with the same weekday one week earlier, rank the
    nonzero |differences| (midranks for ties), and test whether
    positive shifts out-rank negative ones — the PAIRED
    nonparametric location test the family was missing (q318's
    Mann-Whitney compares two independent samples; here each pair
    shares a weekday, so the weekly cycle is differenced out by
    construction — the paired sibling of q417's seasonal MK).
    Zero differences drop, per the textbook procedure.

    Exactness: week-lag differences are exact bigints from the
    calendar-bounded pair join; doubled midranks via the q318 value
    census make W+ x2 an exact bigint; the tie-corrected variance x12
    is one bigint; z is one shared string rounded 6dp (no continuity
    correction — documented, both engines identical).

    Scale: the pair join and census windows all live on
    calendar-bounded frames (q327/q318 adjudicated classes); one
    fact scan."""
    daily = transient_persist(_daily(spark, sf_dir))
    b = daily.select(F.col("d").alias("db"), F.col("y").alias("yb"))
    d7 = daily.join(
        F.broadcast(b), F.col("d") == F.col("db") + 7
    ).select((F.col("y") - F.col("yb")).alias("diff"))
    nz = d7.filter(F.col("diff") != 0).select(
        F.abs(F.col("diff")).alias("av"),
        F.when(F.col("diff") > 0, 1).otherwise(0).alias("pos"),
    )
    pv = nz.groupBy("av").agg(
        F.count("*").cast("long").alias("ct"),
        F.sum("pos").cast("long").alias("cp"),
    )
    w = Window.orderBy("av").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    rk = pv.select(
        "ct", "cp", (F.sum("ct").over(w) - F.col("ct")).alias("below")
    )
    s = rk.agg(
        F.sum("ct").cast("long").alias("n"),
        F.sum(F.col("cp") * (2 * F.col("below") + F.col("ct") + 1))
        .cast("long")
        .alias("w2"),
        F.sum(F.col("ct") * F.col("ct") * F.col("ct") - F.col("ct"))
        .cast("long")
        .alias("tt"),
    )
    f = s.select(
        "n",
        "w2",
        (
            2 * F.col("n") * (F.col("n") + 1) * (2 * F.col("n") + 1)
            - F.col("tt")
        ).alias("v12"),
    )
    return f.select(
        F.col("n").alias("n_pairs"),
        F.col("w2").alias("w_plus_x2"),
        F.round(F.expr(_WSR_Z), 6).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# q421: Chapman capture-recapture estimate of the near-dup population
# ---------------------------------------------------------------------------


@query(
    "q421_dedup_capture_recapture",
    oracle=None,  # assembled below (shares q46/q85 CTE chains)
)
def q421_dedup_capture_recapture(spark, sf_dir):
    """CAPTURE-RECAPTURE estimate of the TRUE near-duplicate pair
    population from two independent detectors: MinHash-LSH-verified
    pairs (jaccard >= 0.5, ``_TR_THRESHOLD``) as the first capture, SimHash
    hamming pairs (q85) as the second; Chapman's bias-corrected
    estimator N^ = (M+1)(C+1)/(R+1) - 1 turns their overlap into an
    estimate of how many near-dup pairs BOTH sketches missed — the
    question q266's agreement F1 cannot answer (agreement says how
    similar the detectors are, not how complete). Standard ecology
    estimator, standard dedup-audit trick.

    Exactness: capture counts and the overlap are exact bigints on
    both engines (both pair lists are deterministic oracle-checked
    operators); the estimator and its milli forms are integer DIV
    arithmetic.

    Scale: both pair lists are the session-persisted LSH outputs
    (bucket-capped, candidates-only); the overlap is one equi-join
    on the pair key. Nothing here touches the corpus again."""
    from .dedup import q85_simhash_hamming_pairs

    a = _tr_edges(spark, sf_dir)  # localCheckpointed: lineage-free
    bb = transient_persist(
        q85_simhash_hamming_pairs(spark, sf_dir)
        .select(
            F.least("doc_a", "doc_b").alias("lo"),
            F.greatest("doc_a", "doc_b").alias("hi"),
        )
        .distinct()
    )
    # One lazy plan instead of three driver count() actions (the q416
    # r9 lesson: per-action plan processing dominated these bounded
    # scalar queries); the three 1-row aggregates broadcast-cross into
    # the Chapman arithmetic as integer exprs (DIV = trunc, matching
    # the Python // both counts being nonnegative).
    ca = a.agg(F.count(F.lit(1)).alias("m_lsh"))
    cb = bb.agg(F.count(F.lit(1)).alias("m_simhash"))
    cr = (
        a.join(bb, ["lo", "hi"], "left_semi")
        .agg(F.count(F.lit(1)).alias("r_both"))
    )
    return (
        ca.crossJoin(F.broadcast(cb))
        .crossJoin(F.broadcast(cr))
        .select(
            "m_lsh",
            "m_simhash",
            "r_both",
            F.expr(
                "(1000 * (m_lsh + 1) * (m_simhash + 1)) DIV (r_both + 1)"
                " - 1000"
            ).alias("chapman_milli"),
        )
        .select(
            "*",
            # literally the oracle's CASE WHEN chapman_milli > 0
            # (ADVICE r9): != 0 was equivalent only via the
            # nonnegativity argument (r_both <= min(m_lsh, m_simhash));
            # the twins should share the identical predicate.
            F.when(
                F.col("chapman_milli") > 0,
                F.expr(
                    "(1000000 * (m_lsh + m_simhash - r_both))"
                    " DIV chapman_milli"
                ),
            ).alias("union_coverage_milli"),
        )
    )


ORACLE_Q421 = _LSH_CANDS_SQL + f""",
    sh2 AS (
      SELECT doc_id, list_distinct({_SHINGLES_SQL}) AS sset FROM documents
      WHERE doc_id IN (SELECT doc_a FROM cands UNION SELECT doc_b FROM cands)
    ),
    verified AS (
      SELECT c.doc_a, c.doc_b,
             ROUND(
               CAST(len(list_intersect(a.sset, b.sset)) AS DOUBLE) /
               len(list_distinct(list_concat(a.sset, b.sset))), 4
             ) AS jaccard
      FROM cands c
      JOIN sh2 a ON c.doc_a = a.doc_id
      JOIN sh2 b ON c.doc_b = b.doc_id
    ),
    ea AS (
      SELECT DISTINCT LEAST(doc_a, doc_b) AS lo,
             GREATEST(doc_a, doc_b) AS hi
      FROM verified WHERE jaccard >= {_TR_THRESHOLD}
    ),
    __SIMHASH__,
    sbands AS (
      SELECT doc_id, simhash, j AS bi,
             (simhash // CAST(pow(2, 8 * j) AS BIGINT)) % 256 AS bv
      FROM sim, (SELECT unnest(range(0, __BANDS__)) AS j)
    ),
    spairs AS (
      SELECT DISTINCT a.doc_id AS lo, b.doc_id AS hi,
             a.simhash AS sa, b.simhash AS sb
      FROM sbands a JOIN sbands b
        ON a.bi = b.bi AND a.bv = b.bv AND a.doc_id < b.doc_id
    ),
    eb AS (
      SELECT DISTINCT lo, hi FROM spairs
      WHERE bit_count(xor(sa, sb)) <= __HAMT__
    ),
    cnt AS (
      SELECT CAST((SELECT COUNT(*) FROM ea) AS BIGINT) AS ma,
             CAST((SELECT COUNT(*) FROM eb) AS BIGINT) AS mb,
             CAST((SELECT COUNT(*) FROM ea
                   WHERE EXISTS (SELECT 1 FROM eb
                     WHERE eb.lo = ea.lo AND eb.hi = ea.hi))
                  AS BIGINT) AS r
    )
    SELECT ma AS m_lsh, mb AS m_simhash, r AS r_both,
           (1000 * (ma + 1) * (mb + 1)) // (r + 1) - 1000
             AS chapman_milli,
           CASE WHEN (1000 * (ma + 1) * (mb + 1)) // (r + 1) - 1000 > 0
                THEN (1000000 * (ma + mb - r))
                     // ((1000 * (ma + 1) * (mb + 1)) // (r + 1) - 1000)
                END AS union_coverage_milli
    FROM cnt
    """

from .dedup import _SIMHASH_BANDS, _SIMHASH_CTES_SQL, _HAM_T  # noqa: E402

ORACLE_Q421 = (
    ORACLE_Q421.replace("__SIMHASH__", _SIMHASH_CTES_SQL)
    .replace("__BANDS__", str(_SIMHASH_BANDS))
    .replace("__HAMT__", str(_HAM_T))
)
_ORACLE_REG["q421_dedup_capture_recapture"] = ORACLE_Q421


# ---------------------------------------------------------------------------
# q422: within-source (partial) correlation of length vs quality
# ---------------------------------------------------------------------------

from .textops import _SCORE_SPARK_SQL, _SCORE_SQL  # noqa: E402

#: marginal and pooled-within correlation from exact bigint moments —
#: identical expression strings both engines; the balanced-design
#: guard (min group size = max) NULLs every output LOUDLY if the
#: per-source doc counts ever diverge (the q393 discipline).
_PC_RW = (  # noqa: E501 - NULLIF-wrapped (r11 totality)
    """(CAST(sxyw AS DOUBLE) / NULLIF(SQRT(CAST(sxxw AS DOUBLE) * CAST(syyw AS DOUBLE)), 0))"""
)
_PC_RM = (  # noqa: E501 - NULLIF-wrapped (r11 totality)
    """((CAST(nn AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) / NULLIF(SQRT((CAST(nn AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) * (CAST(nn AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 0))"""
)


@query(
    "q422_within_source_correlation",
    oracle=f"""
    WITH x AS (
      SELECT source, CAST(n_chars AS BIGINT) AS xv,
             CAST({_SCORE_SQL} AS BIGINT) AS yv
      FROM documents
    ),
    g AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(xv) AS BIGINT) AS sxg,
             CAST(SUM(yv) AS BIGINT) AS syg,
             CAST(SUM(xv * yv) AS BIGINT) AS sxyg,
             CAST(SUM(xv * xv) AS BIGINT) AS sxxg,
             CAST(SUM(yv * yv) AS BIGINT) AS syyg
      FROM x GROUP BY source
    ),
    w AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CASE WHEN MIN(m) = MAX(m) THEN MIN(m) END AS m,
             CAST(SUM(m * sxyg - sxg * syg) AS BIGINT) AS sxyw,
             CAST(SUM(m * sxxg - sxg * sxg) AS BIGINT) AS sxxw,
             CAST(SUM(m * syyg - syg * syg) AS BIGINT) AS syyw,
             CAST(SUM(sxg) AS BIGINT) AS sx,
             CAST(SUM(syg) AS BIGINT) AS sy,
             CAST(SUM(sxyg) AS BIGINT) AS sxy,
             CAST(SUM(sxxg) AS BIGINT) AS sxx,
             CAST(SUM(syyg) AS BIGINT) AS syy,
             CAST(SUM(m) AS BIGINT) AS nn
      FROM g
    )
    SELECT k AS k_sources, m AS m_per_source,
           ROUND({_PC_RM}, 6) AS r_marginal,
           ROUND({_PC_RW}, 6) AS r_within
    FROM w
    """,
)
def q422_within_source_correlation(spark, sf_dir):
    """WITHIN-SOURCE (source-partialled) correlation between document
    length and the milli-unit quality score, next to the MARGINAL
    correlation — "does length predict quality, or do long-doc
    SOURCES just have high-score sources?" The continuous
    Simpson's-paradox guard completing the family (q355 audits
    slopes, q412 audits categorical gates; this is the correlation
    version every feature-selection pass should run before shipping
    length as a quality feature). A large marginal-vs-within gap
    localizes the confound to the source mixture.

    Exactness: per-source moments are exact bigints; the balanced
    design makes every within-group centered sum m*Sxy_g - Sx_g*Sy_g
    an exact bigint with a COMMON scale that cancels in the ratio
    (guarded: m reports NULL if group sizes ever diverge — the q393
    min=max discipline); both correlations are shared expression
    strings rounded 6dp.

    Scale: one scan, one groupBy(source), k-row algebra."""
    x = t(spark, sf_dir, "documents").select(
        "source",
        F.col("n_chars").cast("long").alias("xv"),
        F.expr(_SCORE_SPARK_SQL).cast("long").alias("yv"),
    )
    g = x.groupBy("source").agg(
        F.count("*").cast("long").alias("m"),
        F.sum("xv").cast("long").alias("sxg"),
        F.sum("yv").cast("long").alias("syg"),
        F.sum(F.col("xv") * F.col("yv")).cast("long").alias("sxyg"),
        F.sum(F.col("xv") * F.col("xv")).cast("long").alias("sxxg"),
        F.sum(F.col("yv") * F.col("yv")).cast("long").alias("syyg"),
    )
    w = g.agg(
        F.count("*").cast("long").alias("k"),
        F.when(F.min("m") == F.max("m"), F.min("m")).alias("m"),
        F.sum(F.col("m") * F.col("sxyg") - F.col("sxg") * F.col("syg"))
        .cast("long")
        .alias("sxyw"),
        F.sum(F.col("m") * F.col("sxxg") - F.col("sxg") * F.col("sxg"))
        .cast("long")
        .alias("sxxw"),
        F.sum(F.col("m") * F.col("syyg") - F.col("syg") * F.col("syg"))
        .cast("long")
        .alias("syyw"),
        F.sum("sxg").cast("long").alias("sx"),
        F.sum("syg").cast("long").alias("sy"),
        F.sum("sxyg").cast("long").alias("sxy"),
        F.sum("sxxg").cast("long").alias("sxx"),
        F.sum("syyg").cast("long").alias("syy"),
        F.sum("m").cast("long").alias("nn"),
    )
    return w.select(
        F.col("k").alias("k_sources"),
        F.col("m").alias("m_per_source"),
        F.round(F.expr(_PC_RM), 6).alias("r_marginal"),
        F.round(F.expr(_PC_RW), 6).alias("r_within"),
    )


# ---------------------------------------------------------------------------
# q423: intraclass correlation ICC(1) of quality score within sources
# ---------------------------------------------------------------------------

#: balanced one-way ICC(1) from exact integer sums A = sum_g S_g^2,
#: T = sum y, Q = sum y^2: MSB = (A/m - T^2/(km))/(k-1),
#: MSW = (Q - A/m)/(k(m-1)), ICC = (MSB-MSW)/(MSB+(m-1)MSW).
_ICC_MSB = (  # noqa: E501 - NULLIF-wrapped (r11 totality)
    """((CAST(a AS DOUBLE) / NULLIF(m, 0) - CAST(tt AS DOUBLE) * tt / NULLIF((k * m), 0)) / NULLIF((CAST(k AS DOUBLE) - 1.0), 0))"""
)
_ICC_MSW = (  # noqa: E501 - NULLIF-wrapped (r11 totality)
    """((CAST(q AS DOUBLE) - CAST(a AS DOUBLE) / NULLIF(m, 0)) / NULLIF((CAST(k AS DOUBLE) * (CAST(m AS DOUBLE) - 1.0)), 0))"""
)
_ICC_1 = (  # noqa: E501 - NULLIF-wrapped (r11 totality)
    """((((CAST(a AS DOUBLE) / NULLIF(m, 0) - CAST(tt AS DOUBLE) * tt / NULLIF((k * m), 0)) / NULLIF((CAST(k AS DOUBLE) - 1.0), 0)) - ((CAST(q AS DOUBLE) - CAST(a AS DOUBLE) / NULLIF(m, 0)) / NULLIF((CAST(k AS DOUBLE) * (CAST(m AS DOUBLE) - 1.0)), 0))) / NULLIF((((CAST(a AS DOUBLE) / NULLIF(m, 0) - CAST(tt AS DOUBLE) * tt / NULLIF((k * m), 0)) / NULLIF((CAST(k AS DOUBLE) - 1.0), 0)) + (CAST(m AS DOUBLE) - 1.0) * ((CAST(q AS DOUBLE) - CAST(a AS DOUBLE) / NULLIF(m, 0)) / NULLIF((CAST(k AS DOUBLE) * (CAST(m AS DOUBLE) - 1.0)), 0))), 0))"""
)


@query(
    "q423_icc_score_by_source",
    oracle=f"""
    WITH x AS (
      SELECT source, CAST({_SCORE_SQL} AS BIGINT) AS yv
      FROM documents
    ),
    g AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(yv) AS BIGINT) AS sg
      FROM x GROUP BY source
    ),
    st AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CASE WHEN MIN(m) = MAX(m) THEN MIN(m) END AS m,
             CAST(SUM(sg * sg) AS BIGINT) AS a
      FROM g
    ),
    q2 AS (
      SELECT CAST(SUM(yv) AS BIGINT) AS tt,
             CAST(SUM(yv * yv) AS BIGINT) AS q
      FROM x
    ),
    f AS (SELECT st.k, st.m, st.a, q2.tt, q2.q FROM st, q2)
    SELECT k AS k_sources, m AS m_per_source,
           ROUND({_ICC_MSB}, 6) AS ms_between,
           ROUND({_ICC_MSW}, 6) AS ms_within,
           ROUND({_ICC_1}, 6) AS icc1
    FROM f
    """,
)
def q423_icc_score_by_source(spark, sf_dir):
    """INTRACLASS CORRELATION ICC(1) of the quality score within
    sources: what fraction of score variance is BETWEEN-source
    (crawler identity) rather than document-level? The design-effect
    number behind every sampling decision on this corpus: ICC near 0
    means source is irrelevant and q82's simple stratification
    suffices; high ICC means per-source quotas and q415's Neyman
    weights actually matter (effective sample size shrinks by
    1 + (m-1)*ICC). The variance-decomposition sibling of q395's
    ANOVA (same sums, different normalization, different question:
    effect EXISTENCE there, variance SHARE here).

    Exactness: A = sum of squared per-source score sums, T, and Q are
    exact bigints; the balanced-design guard NULLs the output if
    group sizes diverge (q393 discipline); MSB/MSW/ICC are shared
    expression strings rounded 6dp.

    Scale: one scan, one groupBy(source), 1-row algebra."""
    x = t(spark, sf_dir, "documents").select(
        "source", F.expr(_SCORE_SPARK_SQL).cast("long").alias("yv")
    )
    g = x.groupBy("source").agg(
        F.count("*").cast("long").alias("m"),
        F.sum("yv").cast("long").alias("sg"),
    )
    s = g.agg(
        F.count("*").cast("long").alias("k"),
        F.when(F.min("m") == F.max("m"), F.min("m")).alias("m"),
        F.sum(F.col("sg") * F.col("sg")).cast("long").alias("a"),
    )
    q2 = x.agg(
        F.sum("yv").cast("long").alias("tt"),
        F.sum(F.col("yv") * F.col("yv")).cast("long").alias("q"),
    )
    f = s.crossJoin(F.broadcast(q2))
    return f.select(
        F.col("k").alias("k_sources"),
        F.col("m").alias("m_per_source"),
        F.round(F.expr(_ICC_MSB), 6).alias("ms_between"),
        F.round(F.expr(_ICC_MSW), 6).alias("ms_within"),
        F.round(F.expr(_ICC_1), 6).alias("icc1"),
    )


# ---------------------------------------------------------------------------
# q424: lexical frequency spectrum per source (Yule's K, Sichel, hapax)
# ---------------------------------------------------------------------------

#: Yule's characteristic K = 1e4 * (sum m^2 V(m) - N) / N^2 — the
#: repeat-rate constant; one identical string over exact bigints.
_YULE_K = (  # noqa: E501 - NULLIF-wrapped (r11 totality)
    """(10000.0 * (CAST(sm2 AS DOUBLE) - nt) / NULLIF((CAST(nt AS DOUBLE) * nt), 0))"""
)


@query(
    "q424_lexical_spectrum",
    oracle=f"""
    WITH tk AS (
      SELECT source, u.tok
      FROM documents,
           UNNEST(string_split_regex(trim(lower(text)), '\\s+'))
             AS u(tok)
    ),
    freq AS (
      SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS m
      FROM tk GROUP BY source, tok
    ),
    spec AS (
      SELECT source,
             CAST(SUM(m) AS BIGINT) AS nt,
             CAST(COUNT(*) AS BIGINT) AS v,
             CAST(SUM(CASE WHEN m = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS v1,
             CAST(SUM(CASE WHEN m = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS v2,
             CAST(SUM(m * m) AS BIGINT) AS sm2
      FROM freq GROUP BY source
    )
    SELECT source, nt AS n_tokens, v AS vocab,
           (1000 * v1) // v AS hapax_milli,
           (1000 * v2) // v AS sichel_milli,
           ROUND({_YULE_K}, 4) AS yule_k
    FROM spec ORDER BY source
    """,
)
def q424_lexical_spectrum(spark, sf_dir):
    """LEXICAL FREQUENCY SPECTRUM per source: vocabulary size, hapax
    legomena share V(1)/V, Sichel's dis-legomena proportion V(2)/V,
    and Yule's characteristic K (the length-invariant repeat-rate) —
    the classical lexicostatistics panel a corpus intake runs beside
    q280's Zipf audit: a source whose K is far above its peers is
    template-generated (few types doing all the work); a hapax share
    collapsing round-over-round means the crawler started re-fetching
    the same pages.

    Exactness: the frequency spectrum (per-source type counts by
    occurrence class) is exact bigints from one token census; hapax
    and Sichel shares are integer milli; K is one shared expression
    over bigints, rounded 4dp.

    Scale: one explode + two hash aggregates (token census then
    spectrum), both map-side combinable; |sources| rows out."""
    tk = t(spark, sf_dir, "documents").select(
        "source",
        F.explode(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+")
        ).alias("tok"),
    )
    freq = tk.groupBy("source", "tok").agg(
        F.count("*").cast("long").alias("m")
    )
    spec = freq.groupBy("source").agg(
        F.sum("m").cast("long").alias("nt"),
        F.count("*").cast("long").alias("v"),
        F.sum(F.when(F.col("m") == 1, 1).otherwise(0))
        .cast("long")
        .alias("v1"),
        F.sum(F.when(F.col("m") == 2, 1).otherwise(0))
        .cast("long")
        .alias("v2"),
        F.sum(F.col("m") * F.col("m")).cast("long").alias("sm2"),
    )
    return spec.select(
        "source",
        F.col("nt").alias("n_tokens"),
        F.col("v").alias("vocab"),
        F.expr("(1000 * v1) DIV v").alias("hapax_milli"),
        F.expr("(1000 * v2) DIV v").alias("sichel_milli"),
        F.round(F.expr(_YULE_K), 4).alias("yule_k"),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# q425: Ansari-Bradley dispersion test + Lepage location-scale statistic
# ---------------------------------------------------------------------------

#: Mann-Whitney z from doubled quantities (q318's tie-corrected form):
#: VarU2 = n0*n1*((N^3 - N) - tie)/(3N(N-1)).
_AB_ZMW = (  # noqa: E501 - NULLIF-wrapped (r11 totality)
    """((CAST(u2 AS DOUBLE) - CAST(n0 AS DOUBLE) * n1) / NULLIF(SQRT(CAST(n0 AS DOUBLE) * n1 * ((CAST(nn AS DOUBLE) * nn * nn - nn) - tt) / NULLIF((3.0 * CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0)), 0)), 0))"""
)
#: Ansari-Bradley z by simple-random-sampling moments of the
#: tie-averaged scores: E[T0] = n0*ST/N, Var = n0*n1*(N*Ssq - ST^2)
#: / (N^2 (N-1)) with T0/Ssq carried as micro-quantized bigints.
_AB_ZAB = (  # noqa: E501 - NULLIF-wrapped (r11 totality)
    """((CAST(t0m AS DOUBLE) / 1000000.0 - CAST(n0 AS DOUBLE) * st / NULLIF(nn, 0)) / NULLIF(SQRT(CAST(n0 AS DOUBLE) * n1 * (CAST(nn AS DOUBLE) * (CAST(sqm AS DOUBLE) / 1000000.0) - CAST(st AS DOUBLE) * st) / NULLIF((CAST(nn AS DOUBLE) * nn * (CAST(nn AS DOUBLE) - 1.0)), 0)), 0))"""
)
_AB_LEPAGE = f"(({_AB_ZMW}) * ({_AB_ZMW}) + ({_AB_ZAB}) * ({_AB_ZAB}))"


@query(
    "q425_ansari_bradley_lepage",
    oracle=f"""
    WITH x AS (
      SELECT CAST(n_chars AS BIGINT) AS v,
             CAST(CASE WHEN source = '{_WT_A}' THEN 1 ELSE 0 END
                  AS BIGINT) AS g0,
             CAST(CASE WHEN source = '{_WT_B}' THEN 1 ELSE 0 END
                  AS BIGINT) AS g1
      FROM documents WHERE source IN ('{_WT_A}', '{_WT_B}')
        -- listwise deletion (r13 partial-records census)
        AND n_chars IS NOT NULL
    ),
    pv AS (
      SELECT v, CAST(SUM(g0) AS BIGINT) AS c0,
             CAST(SUM(g1) AS BIGINT) AS c1,
             CAST(COUNT(*) AS BIGINT) AS ct
      FROM x GROUP BY v
    ),
    nn0 AS (
      SELECT CAST(SUM(c0) AS BIGINT) AS n0,
             CAST(SUM(c1) AS BIGINT) AS n1,
             CAST(SUM(ct) AS BIGINT) AS nn,
             CAST(SUM(ct * ct * ct - ct) AS BIGINT) AS tt
      FROM pv
    ),
    rk AS (
      SELECT c0, c1, ct,
             SUM(ct) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) - ct AS below
      FROM pv
    ),
    sc AS (
      SELECT c0, c1, ct, below,
             below + 1 AS a, below + ct AS b,
             (nn0.nn + 1) // 2 AS m, nn0.nn AS nn
      FROM rk, nn0
    ),
    sv AS (
      SELECT c0, ct,
             CASE WHEN LEAST(b, m) >= a THEN
               (LEAST(b, m) * (LEAST(b, m) + 1) - (a - 1) * a) // 2
               ELSE 0 END
             + CASE WHEN b >= GREATEST(a, m + 1) THEN
               (nn + 1) * (b - GREATEST(a, m + 1) + 1)
               - (b * (b + 1) - (GREATEST(a, m + 1) - 1)
                  * GREATEST(a, m + 1)) // 2
               ELSE 0 END AS s,
             2 * below + ct + 1 AS r2u
      FROM sc
    ),
    agg AS (
      SELECT
        CAST(SUM(c0 * r2u) AS BIGINT)
          - (SELECT n0 * (n0 + 1) FROM nn0) AS u2,
        CAST(SUM(s) AS BIGINT) AS st,
        CAST(SUM(CAST(ROUND(1000000.0 * c0 * s / ct) AS BIGINT))
             AS BIGINT) AS t0m,
        CAST(SUM(CAST(ROUND(1000000.0 * s * s / ct) AS BIGINT))
             AS BIGINT) AS sqm
      FROM sv
    ),
    f AS (
      SELECT agg.u2, agg.st, agg.t0m, agg.sqm,
             nn0.n0, nn0.n1, nn0.nn, nn0.tt
      FROM agg, nn0
    )
    SELECT n0, n1,
           ROUND({_AB_ZMW}, 6) AS z_location,
           ROUND({_AB_ZAB}, 6) AS z_dispersion,
           ROUND({_AB_LEPAGE}, 4) AS lepage
    FROM f
    """,
)
def q425_ansari_bradley_lepage(spark, sf_dir):
    """ANSARI-BRADLEY dispersion test + LEPAGE joint statistic
    between 'src0' and 'src1' document lengths: AB scores rank
    from BOTH ends inward (min(rank, N+1-rank), tie-averaged), so its
    z detects a SPREAD difference; combined with q318's location z,
    Lepage L = z_loc^2 + z_disp^2 is the omnibus "same location AND
    same scale?" readout (~chi2, 2 df) — the two-sample counterpart
    of running q405's Welch next to q396's Brown-Forsythe, but fully
    rank-based. A crawler whose lengths have the right median and
    twice the spread passes MW and fails here.

    Exactness: AB block score sums are CLOSED-FORM integer series
    over the value census (positions a..b split at the midpoint);
    tie-averaged group totals and score second moments carry as
    micro-quantized bigints (q286 device); both z's and Lepage are
    shared expression strings over them, rounded once.

    Scale: one census groupBy(value), one domain-bounded cumulative
    window (q318 class), 1-row reduce."""
    x = (
        t(spark, sf_dir, "documents")
        .filter(
            F.col("source").isin(_WT_A, _WT_B)
            # listwise deletion, mirrors the oracle (r13 census)
            & F.col("n_chars").isNotNull()
        )
        .select(
            F.col("n_chars").cast("long").alias("v"),
            F.when(F.col("source") == _WT_A, 1).otherwise(0).alias("g0"),
            F.when(F.col("source") == _WT_B, 1).otherwise(0).alias("g1"),
        )
    )
    pv = x.groupBy("v").agg(
        F.sum("g0").cast("long").alias("c0"),
        F.sum("g1").cast("long").alias("c1"),
        F.count("*").cast("long").alias("ct"),
    )
    nn0 = pv.agg(
        F.sum("c0").cast("long").alias("n0"),
        F.sum("c1").cast("long").alias("n1"),
        F.sum("ct").cast("long").alias("nn"),
        F.sum(F.col("ct") * F.col("ct") * F.col("ct") - F.col("ct"))
        .cast("long")
        .alias("tt"),
    )
    w = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    rk = pv.select(
        "c0",
        "c1",
        "ct",
        (F.sum("ct").over(w) - F.col("ct")).alias("below"),
    )
    sc = rk.crossJoin(F.broadcast(nn0)).select(
        "c0",
        "ct",
        "below",
        (F.col("below") + 1).alias("a"),
        (F.col("below") + F.col("ct")).alias("b"),
        F.expr("(nn + 1) DIV 2").alias("m"),
        "nn",
    )
    sv = sc.select(
        "c0",
        "ct",
        (
            F.when(
                F.least("b", "m") >= F.col("a"),
                F.expr(
                    "(LEAST(b, m) * (LEAST(b, m) + 1) - (a - 1) * a)"
                    " DIV 2"
                ),
            ).otherwise(0)
            + F.when(
                F.col("b") >= F.greatest(F.col("a"), F.col("m") + 1),
                F.expr(
                    "(nn + 1) * (b - GREATEST(a, m + 1) + 1)"
                    " - (b * (b + 1) - (GREATEST(a, m + 1) - 1)"
                    " * GREATEST(a, m + 1)) DIV 2"
                ),
            ).otherwise(0)
        ).alias("s"),
        (2 * F.col("below") + F.col("ct") + 1).alias("r2u"),
    )
    agg = sv.agg(
        F.sum(F.col("c0") * F.col("r2u")).cast("long").alias("r2sum"),
        F.sum("s").cast("long").alias("st"),
        F.sum(
            F.round(
                1_000_000.0 * F.col("c0") * F.col("s") / F.col("ct")
            ).cast("long")
        )
        .cast("long")
        .alias("t0m"),
        F.sum(
            F.round(
                1_000_000.0 * F.col("s") * F.col("s") / F.col("ct")
            ).cast("long")
        )
        .cast("long")
        .alias("sqm"),
    )
    f = agg.crossJoin(F.broadcast(nn0)).select(
        (F.col("r2sum") - F.col("n0") * (F.col("n0") + 1)).alias("u2"),
        "st",
        "t0m",
        "sqm",
        "n0",
        "n1",
        "nn",
        "tt",
    )
    return f.select(
        "n0",
        "n1",
        F.round(F.expr(_AB_ZMW), 6).alias("z_location"),
        F.round(F.expr(_AB_ZAB), 6).alias("z_dispersion"),
        F.round(F.expr(_AB_LEPAGE), 4).alias("lepage"),
    )


# ---------------------------------------------------------------------------
# q426: Cook's distance — most influential days of the daily OLS trend
# ---------------------------------------------------------------------------

#: leverage h_t = 1/n + (n*d - st)^2 / (n * D) and Cook's distance
#: D_t = En^2 * h * (n-2) / (2 * den * (1-h)^2), where En = n*D*e_t
#: and den = sum En^2 — every input an exact integer/decimal, the
#: whole chain one identical expression family.
_CK_H = (  # noqa: E501 - NULLIF-wrapped (r11 totality)
    """(1.0 / NULLIF(n, 0) + (CAST(n AS DOUBLE) * d - st) * (CAST(n AS DOUBLE) * d - st) / NULLIF((CAST(n AS DOUBLE) * dd), 0))"""
)
_CK_D = (  # noqa: E501 - NULLIF-wrapped (r11 totality)
    """(CAST(en AS DOUBLE) * CAST(en AS DOUBLE) * (1.0 / NULLIF(n, 0) + (CAST(n AS DOUBLE) * d - st) * (CAST(n AS DOUBLE) * d - st) / NULLIF((CAST(n AS DOUBLE) * dd), 0)) * (CAST(n AS DOUBLE) - 2.0) / NULLIF((2.0 * CAST(den AS DOUBLE) * (1.0 - (1.0 / NULLIF(n, 0) + (CAST(n AS DOUBLE) * d - st) * (CAST(n AS DOUBLE) * d - st) / NULLIF((CAST(n AS DOUBLE) * dd), 0))) * (1.0 - (1.0 / NULLIF(n, 0) + (CAST(n AS DOUBLE) * d - st) * (CAST(n AS DOUBLE) * d - st) / NULLIF((CAST(n AS DOUBLE) * dd), 0)))), 0))"""
)


@query(
    "q426_cooks_distance_days",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(d) AS BIGINT) AS st,
             CAST(SUM(d * d) AS BIGINT) AS st2,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(d * y) AS BIGINT) AS sty
      FROM daily
    ),
    c AS (
      SELECT n, st, n * sty - st * sy AS a, n * st2 - st * st AS dd,
             (n * st2 - st * st) * sy - (n * sty - st * sy) * st AS b0
      FROM m
    ),
    e AS (
      SELECT daily.d, daily.y, c.n, c.st, c.dd,
             CAST(c.n * c.dd * daily.y - c.b0 - c.n * c.a * daily.d
                  AS DECIMAL(38, 0)) AS en
      FROM daily, c
    ),
    dn AS (
      SELECT CAST(SUM(en * en) AS DECIMAL(38, 0)) AS den FROM e
    )
    SELECT e.d AS day_idx, e.y AS day_count,
           ROUND({_CK_H.replace(' n ', ' e.n ').replace('/ n', '/ e.n')
                       .replace('(n ', '(e.n ')
                       .replace(' d ', ' e.d ')
                       .replace('- st', '- e.st')
                       .replace('* dd', '* e.dd')}, 6) AS leverage,
           ROUND({_CK_D.replace(' n ', ' e.n ').replace('/ n', '/ e.n')
                       .replace('(n ', '(e.n ')
                       .replace(' d ', ' e.d ')
                       .replace('- st', '- e.st')
                       .replace('* dd', '* e.dd')
                       .replace('(en', '(e.en')
                       .replace(' den', ' dn.den')}, 6) AS cook_d
    FROM e, dn
    ORDER BY cook_d DESC, day_idx ASC LIMIT 3
    """,
)
def q426_cooks_distance_days(spark, sf_dir):
    """COOK'S DISTANCE influence diagnostics on the daily OLS trend:
    which THREE days, if dropped, would move the fitted volume trend
    the most? Combines leverage (calendar position — endpoints of the
    window pull hardest) with residual size into the standard
    delete-one influence measure — the diagnostic that tells a
    capacity planner whether q377/q403's trend call hangs on one
    anomalous day (and names it; q411's Grubbs names the biggest
    RESIDUAL, which at low leverage may be harmless).

    Exactness: residuals are the q408 denominator-cleared integers
    (En = n*D*e_t, DECIMAL(38,0) squares); leverage and Cook's D are
    one identical expression family over exact integers; the top-3 is
    deterministic (tie-break by day).

    Scale: fact collapses to the calendar-bounded daily frame; the
    influence sweep is |days| rows of arithmetic + one TakeOrdered."""
    daily = transient_persist(_daily(spark, sf_dir))
    m = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("d").cast("long").alias("st"),
        F.sum(F.col("d") * F.col("d")).cast("long").alias("st2"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("d") * F.col("y")).cast("long").alias("sty"),
    )
    c = m.select(
        "n",
        "st",
        (F.col("n") * F.col("sty") - F.col("st") * F.col("sy")).alias("a"),
        (F.col("n") * F.col("st2") - F.col("st") * F.col("st")).alias(
            "dd"
        ),
        (
            (F.col("n") * F.col("st2") - F.col("st") * F.col("st"))
            * F.col("sy")
            - (F.col("n") * F.col("sty") - F.col("st") * F.col("sy"))
            * F.col("st")
        ).alias("b0"),
    )
    e = daily.crossJoin(F.broadcast(c)).select(
        "d",
        "y",
        "n",
        "st",
        "dd",
        (
            F.col("n") * F.col("dd") * F.col("y")
            - F.col("b0")
            - F.col("n") * F.col("a") * F.col("d")
        )
        .cast("decimal(38,0)")
        .alias("en"),
    )
    dn = e.agg(
        F.sum(F.col("en") * F.col("en"))
        .cast("decimal(38,0)")
        .alias("den")
    )
    return (
        e.crossJoin(F.broadcast(dn))
        .select(
            F.col("d").alias("day_idx"),
            F.col("y").alias("day_count"),
            F.round(F.expr(_CK_H), 6).alias("leverage"),
            F.round(F.expr(_CK_D), 6).alias("cook_d"),
        )
        .orderBy(F.col("cook_d").desc(), F.col("day_idx").asc())
        .limit(3)
    )


# ---------------------------------------------------------------------------
# q427: Matryoshka prefix-dimension recall of brute-force top-k
# ---------------------------------------------------------------------------

from .vectors import DIM, QUERY_VEC_ID, TOP_K, _dot, _qlit_sql, _query_vec  # noqa: E402

#: prefix dimensionalities swept (Matryoshka-style truncation).
_MRL_DIMS = (8, 16, 32)


@query(
    "q427_matryoshka_prefix_recall",
    oracle=f"""
    WITH q AS (
      SELECT embedding AS qe FROM embeddings
      WHERE vec_id = {QUERY_VEC_ID}
    ),
    full_top AS (
      SELECT e.vec_id
      FROM embeddings e, q, LATERAL (
        SELECT SUM(CAST(e.embedding[r.i] AS DOUBLE)
                   * CAST(q.qe[r.i] AS DOUBLE)) AS dp
        FROM range(1, {DIM} + 1) r(i)
      )
      ORDER BY ROUND(dp, 6) DESC, e.vec_id LIMIT {TOP_K}
    ),
    """ + ",\n    ".join(
        f"""pt{p} AS (
      SELECT e.vec_id
      FROM embeddings e, q, LATERAL (
        SELECT SUM(CAST(e.embedding[r.i] AS DOUBLE)
                   * CAST(q.qe[r.i] AS DOUBLE)) AS dp
        FROM range(1, {p} + 1) r(i)
      )
      ORDER BY ROUND(dp, 6) DESC, e.vec_id LIMIT {TOP_K}
    )"""
        for p in _MRL_DIMS
    ) + """
    """ + "UNION ALL".join(
        f"""
    SELECT CAST({p} AS BIGINT) AS prefix_dim,
           CAST((SELECT COUNT(*) FROM pt{p}
                 WHERE vec_id IN (SELECT vec_id FROM full_top))
                AS BIGINT) AS overlap_at_k,
           (1000 * (SELECT COUNT(*) FROM pt{p}
                    WHERE vec_id IN (SELECT vec_id FROM full_top)))
             // {TOP_K} AS recall_milli
    """
        for p in _MRL_DIMS
    ),
)
def q427_matryoshka_prefix_recall(spark, sf_dir):
    """MATRYOSHKA TRUNCATION SWEEP: recall@10 of brute-force
    search using only the FIRST 8/16/32 of 64 embedding dimensions
    against the full-dimension top-10 — the measurement behind
    every "store the prefix, rerank with the tail" serving design
    (MRL embeddings, and the dimension-side sibling of q156's
    scalar-quantization rerank: q156 cuts PRECISION per dim, this
    cuts the NUMBER of dims; q334 bounds pairwise distortion, this
    measures end-task recall). Low prefix recall says these
    embeddings were not trained matryoshka-style and the cheap
    prefix index would silently miss.

    Exactness: every candidate list orders by ROUND(dot, 6) with
    vec_id tie-break (the q50 determinism device); overlap counts
    are exact integers; recall is integer milli.

    Scale: one scan per prefix (a real deployment scans once and
    slices), each a codegen dot + TakeOrdered — no shuffle beyond
    the top-k reduce; the overlap join is 10x10."""
    qv = _query_vec(spark, sf_dir)
    if qv is None:
        # degenerate corpus: both candidate lists are empty, but the
        # oracle's per-prefix COUNT aggregates still emit one row per
        # swept prefix with overlap 0 (aggregate-over-empty) - mirror
        # that 3-row readout.
        return degenerate_frame(
            spark,
            "prefix_dim bigint, overlap_at_k bigint, recall_milli bigint",
            [(p, 0, 0) for p in _MRL_DIMS],
        )
    emb = t(spark, sf_dir, "embeddings")
    full_top = (
        emb.select(
            "vec_id",
            F.round(_dot("embedding", _qlit_sql(qv)), 6).alias("dp"),
        )
        .orderBy(F.desc("dp"), F.asc("vec_id"))
        .limit(TOP_K)
        .select("vec_id")
    )
    outs = []
    for p in _MRL_DIMS:
        pt = (
            emb.select(
                "vec_id",
                F.round(
                    _dot("embedding", _qlit_sql(qv), dim=p), 6
                ).alias("dp"),
            )
            .orderBy(F.desc("dp"), F.asc("vec_id"))
            .limit(TOP_K)
            .select("vec_id")
        )
        outs.append(
            pt.join(full_top, "vec_id", "left_semi").agg(
                F.lit(p).cast("long").alias("prefix_dim"),
                F.count("*").cast("long").alias("overlap_at_k"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res.select(
        "prefix_dim",
        "overlap_at_k",
        F.expr(f"(1000 * overlap_at_k) DIV {TOP_K}").alias(
            "recall_milli"
        ),
    ).orderBy("prefix_dim")


# ---------------------------------------------------------------------------
# q428: bipartite rich-club density of the user-item click graph
# ---------------------------------------------------------------------------

#: degree thresholds swept: a node is "rich" if its degree EXCEEDS k.
_RC_KS = (1, 2, 3)


@query(
    "q428_rich_club_density",
    oracle=f"""
    WITH e AS (
      SELECT DISTINCT user_id AS u,
             CAST(props ->> 'k' AS BIGINT) AS it
      FROM events WHERE event_type = 'click'
    ),
    du AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS dg FROM e GROUP BY u),
    di AS (SELECT it, CAST(COUNT(*) AS BIGINT) AS dg FROM e GROUP BY it),
    ks AS (SELECT unnest(ARRAY{list(_RC_KS)}) AS k),
    rich AS (
      SELECT ks.k,
             (SELECT COUNT(*) FROM du WHERE du.dg > ks.k) AS n_users,
             (SELECT COUNT(*) FROM di WHERE di.dg > ks.k) AS n_items,
             (SELECT COUNT(*) FROM e
              JOIN du ON e.u = du.u JOIN di ON e.it = di.it
              WHERE du.dg > ks.k AND di.dg > ks.k) AS n_edges
      FROM ks
    )
    SELECT k AS degree_floor,
           CAST(n_users AS BIGINT) AS n_rich_users,
           CAST(n_items AS BIGINT) AS n_rich_items,
           CAST(n_edges AS BIGINT) AS n_rich_edges,
           CASE WHEN n_users * n_items > 0
                THEN (1000 * n_edges) // (n_users * n_items)
                END AS density_milli
    FROM rich ORDER BY k
    """,
)
def q428_rich_club_density(spark, sf_dir):
    """BIPARTITE RICH-CLUB DENSITY of the user-item click graph: for
    degree floors k = (1, 2, 3), take the users and items whose degree
    EXCEEDS k and measure how densely they interconnect (realized
    rich-rich edges over possible rich-user x rich-item pairs) — the
    threshold-sweep refinement of q383's one-number assortativity: a
    density that RISES with k is a rich-club core (hubs click hubs,
    so hub-capping reshapes the graph), flat-or-falling means heavy
    users spread over niche items and degree-targeted interventions
    won't concentrate. Same edge list, same item-id namespace as
    q177/q379/q383.

    Exactness: degrees, rich-node counts, and rich-edge counts are
    exact integers (edge list is DISTINCT pairs); density is integer
    milli with a NULL guard on an empty club.

    Scale: degrees are one groupBy each side of the edge list; the
    rich-edge count joins the edge list to the two degree tables on
    its own keys (edge-linear, the q383 shape); the k sweep reuses
    the persisted degree frames."""
    ev = t(spark, sf_dir, "events")
    e = transient_persist(
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("u"),
            F.get_json_object("props", "$.k").cast("long").alias("it"),
        )
        .distinct()
    )
    du = transient_persist(
        e.groupBy("u").agg(F.count("*").cast("long").alias("dgu"))
    )
    di = transient_persist(
        e.groupBy("it").agg(F.count("*").cast("long").alias("dgi"))
    )
    ej = (
        e.join(du, "u").join(di, "it").select("dgu", "dgi")
    )
    # the whole k-sweep folds into THREE conditional aggregates - one
    # per frame - instead of 9 count() actions (optimization r14,
    # guide section 2.4): the old loop re-executed the e JOIN du JOIN
    # di subtree once per k. count(when(cond, TRUE)) counts matching
    # rows exactly like filter().count(), 0 on an empty frame.
    def sweep(frame, cond):
        row = frame.agg(
            *[
                F.count(F.when(cond(k), F.lit(True)))
                .cast("long")
                .alias(f"c{k}")
                for k in _RC_KS
            ]
        ).first()
        return {k: int(row[f"c{k}"]) for k in _RC_KS}

    nus = sweep(du, lambda k: F.col("dgu") > k)
    nis = sweep(di, lambda k: F.col("dgi") > k)
    nes = sweep(ej, lambda k: (F.col("dgu") > k) & (F.col("dgi") > k))
    outs = []
    for k in _RC_KS:
        nu, ni, ne = nus[k], nis[k], nes[k]
        outs.append((k, nu, ni, ne,
                     (1000 * ne) // (nu * ni) if nu * ni else None))
    return spark.createDataFrame(
        outs,
        "degree_floor long, n_rich_users long, n_rich_items long,"
        " n_rich_edges long, density_milli long",
    )


# ---------------------------------------------------------------------------
# q429: Page-Hinkley drift trace on daily volume
# ---------------------------------------------------------------------------


@query(
    "q429_page_hinkley",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    seq AS (
      SELECT d, y,
             SUM(y) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS cum,
             ROW_NUMBER() OVER (ORDER BY d) AS s
      FROM daily
    ),
    term AS (
      SELECT d,
             CAST(ROUND((y - CAST(cum AS DOUBLE) / s) * 1000000)
                  AS BIGINT) AS tm
      FROM seq
    ),
    ph AS (
      SELECT d,
             SUM(tm) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS pht
      FROM term
    ),
    exc AS (
      SELECT d,
             pht - MIN(pht) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS ex
      FROM ph
    ),
    pick AS (
      SELECT d, ex FROM exc ORDER BY ex DESC, d ASC LIMIT 1
    ),
    nn AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS sy
      FROM daily
    )
    SELECT nn.n AS n_days, pick.d AS peak_day,
           CAST(pick.ex AS BIGINT) AS ph_stat_micro,
           CAST((pick.ex * nn.n) // (1000 * nn.sy) AS BIGINT)
             AS ph_over_mean_milli
    FROM pick, nn
    """,
)
def q429_page_hinkley(spark, sf_dir):
    """PAGE-HINKLEY drift trace on daily volume: the sequential
    upward-shift detector every streaming-quality monitor ships —
    accumulate deviations from the RUNNING mean, track the running
    minimum, and the max excess PH_t - min PH is the alarm statistic
    (large = the recent level sits above everything the past
    justified). The online sibling of q260's retrospective CUSUM and
    q404's Pettitt: those pick the best split in hindsight; PH is the
    quantity you'd actually threshold in-flight, evaluated here over
    the same calendar frame. Reported raw (micro) and normalized by
    the mean daily volume so the alarm threshold is scale-free.

    Exactness: running sums/counts are exact bigints; each day's
    deviation from the running mean is the identical double both
    engines compute, micro-quantized BEFORE the path cumsum (q286
    device); the argmax tie-breaks to the earliest day.

    Scale: everything after the daily aggregate is three windows
    over the |days|-row frame (adjudicated class)."""
    daily = transient_persist(_daily(spark, sf_dir))
    wcum = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    seq = daily.select(
        "d",
        "y",
        F.sum("y").over(wcum).alias("cum"),
        F.row_number().over(Window.orderBy("d")).alias("s"),
    )
    term = seq.select(
        "d",
        F.round(
            (F.col("y") - F.col("cum").cast("double") / F.col("s"))
            * 1_000_000
        )
        .cast("long")
        .alias("tm"),
    )
    ph = term.select("d", F.sum("tm").over(wcum).alias("pht"))
    exc = ph.select(
        "d", (F.col("pht") - F.min("pht").over(wcum)).alias("ex")
    )
    pick = exc.orderBy(F.col("ex").desc(), F.col("d").asc()).limit(1)
    nn = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("sy"),
    )
    return pick.crossJoin(F.broadcast(nn)).select(
        F.col("n").alias("n_days"),
        F.col("d").alias("peak_day"),
        F.col("ex").cast("long").alias("ph_stat_micro"),
        F.expr("(ex * n) DIV (1000 * sy)").alias("ph_over_mean_milli"),
    )


# ---------------------------------------------------------------------------
# q430: James-Stein (positive-part) shrinkage of per-source mean scores
# ---------------------------------------------------------------------------

#: B = 1 - (k-3) * (MSW/m) / sum((ybar_g - ybar)^2), assembled from
#: the q423 integer sums: sum sq dev of group means =
#: (k*A - T^2) / (k*m^2); MSW = (Q - A/m) / (k(m-1)).
#: B = 1 - (k-3)(MSW/m) / sum_g (ybar_g - grand)^2. The deviation sum
#: clears to (k*a - tt^2)/(k*m^2): sum ybar_g^2 - k*grand^2 with
#: grand = tt/(km). (r9 bug fix, caught by the brute-force reference
#: test: the original string divided tt^2 by k, i.e. subtracted
#: grand^2 instead of k*grand^2, inflating the denominator ~k-fold
#: and reporting B ~ 1 (no shrinkage) on noise-dominated data where
#: its own sibling q423 measures ICC ~ 0. Both engines shared the
#: string, so the oracle twin agreed with the wrong math - exactly
#: the q393-Friedman bug class VERDICT r8 item 2 flagged.)
_JS_B = (  # noqa: E501 - NULLIF-wrapped (r11 totality)
    """(1.0 - (CAST(k AS DOUBLE) - 3.0) * ((CAST(q AS DOUBLE) - CAST(a AS DOUBLE) / NULLIF(m, 0)) / NULLIF((CAST(k AS DOUBLE) * (CAST(m AS DOUBLE) - 1.0)), 0) / NULLIF(m, 0)) / NULLIF(((CAST(k AS DOUBLE) * a - CAST(tt AS DOUBLE) * tt) / NULLIF((CAST(k AS DOUBLE) * m * m), 0)), 0))"""
)
_JS_BPLUS = f"(CASE WHEN {_JS_B} > 0.0 THEN {_JS_B} ELSE 0.0 END)"


@query(
    "q430_james_stein_shrinkage",
    oracle=f"""
    WITH x AS (
      SELECT source, CAST({_SCORE_SQL} AS BIGINT) AS yv
      FROM documents
    ),
    g AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS mg,
             CAST(SUM(yv) AS BIGINT) AS sg
      FROM x GROUP BY source
    ),
    st AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CASE WHEN MIN(mg) = MAX(mg) THEN MIN(mg) END AS m,
             CAST(SUM(sg * sg) AS BIGINT) AS a,
             CAST(SUM(sg) AS BIGINT) AS tt
      FROM g
    ),
    q2 AS (SELECT CAST(SUM(yv * yv) AS BIGINT) AS q FROM x),
    f AS (SELECT st.k, st.m, st.a, st.tt, q2.q FROM st, q2)
    SELECT g.source,
           (1000 * g.sg) // f.m AS raw_mean_milli,
           ROUND({_JS_BPLUS}, 6) AS b_plus,
           CAST(ROUND(1000.0 * (CAST(f.tt AS DOUBLE) / (f.k * f.m)
                + {_JS_BPLUS} * (CAST(g.sg AS DOUBLE) / f.m
                  - CAST(f.tt AS DOUBLE) / (f.k * f.m))))
                AS BIGINT) AS shrunk_mean_milli
    FROM g, f
    ORDER BY g.source
    """,
)
def q430_james_stein_shrinkage(spark, sf_dir):
    """JAMES-STEIN (positive-part) SHRINKAGE of the per-source mean
    quality scores toward the grand mean — the estimator that
    DOMINATES the raw per-source means whenever k >= 4: sources are
    small samples, so their raw means overdisperse, and ranking
    crawlers by them flags the unlucky rather than the bad. The
    shrinkage factor B = 1 - (k-3)(MSW/m)/sum((ybar_g - ybar)^2)
    spends exactly the q423 ICC information: high between-source
    variance => B near 1 (trust the raw means), noise-dominated =>
    B near 0 (pool everything).

    Exactness: the same exact bigint sums as q423 (A, T, Q, balanced
    m with the min=max NULL guard); B and the shrunk means are one
    shared expression family; raw means are integer milli, shrunk
    means are ROUND(identical double) milli.

    Scale: one scan, one groupBy(source), k-row broadcast algebra."""
    x = t(spark, sf_dir, "documents").select(
        "source", F.expr(_SCORE_SPARK_SQL).cast("long").alias("yv")
    )
    g = x.groupBy("source").agg(
        F.count("*").cast("long").alias("m_g"),
        F.sum("yv").cast("long").alias("sg"),
    )
    st = g.agg(
        F.count("*").cast("long").alias("k"),
        F.when(F.min("m_g") == F.max("m_g"), F.min("m_g")).alias("m"),
        F.sum(F.col("sg") * F.col("sg")).cast("long").alias("a"),
        F.sum("sg").cast("long").alias("tt"),
    )
    q2 = x.agg(
        F.sum(F.col("yv") * F.col("yv")).cast("long").alias("q")
    )
    f = st.crossJoin(F.broadcast(q2))
    return (
        g.crossJoin(F.broadcast(f))
        .select(
            "source",
            F.expr("(1000 * sg) DIV m").alias("raw_mean_milli"),
            F.round(F.expr(_JS_BPLUS), 6).alias("b_plus"),
            F.round(
                1000.0
                * (
                    F.col("tt").cast("double") / (F.col("k") * F.col("m"))
                    + F.expr(_JS_BPLUS)
                    * (
                        F.col("sg").cast("double") / F.col("m")
                        - F.col("tt").cast("double")
                        / (F.col("k") * F.col("m"))
                    )
                )
            )
            .cast("long")
            .alias("shrunk_mean_milli"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q431: SPRT sequential monitor of the daily error rate
# ---------------------------------------------------------------------------

#: H0: error share p0 = 0.2 vs H1: p1 = 0.25; the per-observation
#: log-likelihood ratios are LITERAL doubles (ln(p1/p0), ln(q1/q0))
#: written to full precision in BOTH engines — no libm call on data.
_SPRT_L1 = "0.22314355131420976"  # ln(0.25 / 0.20)
_SPRT_L2 = "-0.06453852113757118"  # ln(0.75 / 0.80)
#: Wald boundaries for alpha = beta = 0.05: +/- ln(0.95/0.05).
_SPRT_A_MICRO = 2_944_439  # round(ln(19) * 1e6)


@query(
    "q431_sprt_error_monitor",
    oracle=f"""
    WITH daily AS (
      SELECT {EPOCH_DAY_SQL} AS d,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0
                  END) AS BIGINT) AS e
      FROM events GROUP BY 1
    ),
    term AS (
      SELECT d,
             CAST(ROUND((e * {_SPRT_L1} + (n - e) * {_SPRT_L2})
                        * 1000000) AS BIGINT) AS tm
      FROM daily
    ),
    llr AS (
      SELECT d,
             SUM(tm) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS c
      FROM term
    ),
    cross_d AS (
      SELECT MIN(CASE WHEN c >= {_SPRT_A_MICRO} THEN d END) AS d_hi,
             MIN(CASE WHEN c <= -{_SPRT_A_MICRO} THEN d END) AS d_lo
      FROM llr
    ),
    fin AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(MAX(c) AS BIGINT) AS llr_max_micro,
             (SELECT CAST(c AS BIGINT) FROM llr
              ORDER BY d DESC LIMIT 1) AS llr_final_micro
      FROM llr
    )
    SELECT fin.n_days, fin.llr_final_micro, fin.llr_max_micro,
           CASE
             WHEN cross_d.d_hi IS NOT NULL
                  AND (cross_d.d_lo IS NULL
                       OR cross_d.d_hi <= cross_d.d_lo)
               THEN 'accept_h1'
             WHEN cross_d.d_lo IS NOT NULL THEN 'accept_h0'
             ELSE 'continue' END AS decision,
           CASE
             WHEN cross_d.d_hi IS NOT NULL
                  AND (cross_d.d_lo IS NULL
                       OR cross_d.d_hi <= cross_d.d_lo)
               THEN cross_d.d_hi
             WHEN cross_d.d_lo IS NOT NULL THEN cross_d.d_lo
             END AS decision_day
    FROM fin, cross_d
    """,
)
def q431_sprt_error_monitor(spark, sf_dir):
    """WALD'S SPRT monitoring the daily error-event share: H0 p=0.20
    vs H1 p=0.25 at alpha = beta = 0.05, fed one day at a time in
    calendar order — the SEQUENTIAL test that stops as soon as the
    evidence crosses a Wald boundary instead of fixing n in advance
    (the q372 Wilson interval is the batch answer; this is what an
    alerting pipeline actually runs). Reports the decision, the
    boundary-crossing day, and the final/max LLR path values.

    Exactness: per-day error/total counts are exact bigints; the
    log-likelihood-ratio increments use LITERAL full-precision
    doubles (no libm call on data — the constants are spelled
    identically on both engines), micro-quantized per day before the
    path cumsum; crossing detection is integer comparison with
    first-crossing-wins tie handling spelled identically.

    Scale: one fact scan to the daily aggregate; one window over
    |days| rows (adjudicated class); 1-row reduce."""
    ev = t(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            F.floor(
                (F.col("ts_us") - F.lit(EVENTS_EPOCH_US))
                / F.lit(US_PER_DAY)
            ).alias("d")
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(
                F.when(F.col("event_type") == "error", 1).otherwise(0)
            )
            .cast("long")
            .alias("e"),
        )
    )
    term = daily.select(
        "d",
        F.round(
            (
                F.col("e") * F.expr(_SPRT_L1)
                + (F.col("n") - F.col("e")) * F.expr(_SPRT_L2)
            )
            * 1_000_000
        )
        .cast("long")
        .alias("tm"),
    )
    wcum = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    llr = transient_persist(
        term.select("d", F.sum("tm").over(wcum).alias("c"))
    )
    cross = llr.agg(
        F.min(
            F.when(F.col("c") >= _SPRT_A_MICRO, F.col("d"))
        ).alias("d_hi"),
        F.min(
            F.when(F.col("c") <= -_SPRT_A_MICRO, F.col("d"))
        ).alias("d_lo"),
    )
    # 1-row AGGREGATE (max_by), not orderBy.limit(1): the limit frame
    # is EMPTY on an empty calendar and its crossJoin erased the
    # readout row where the oracle's scalar subquery yields NULL (r11
    # empty-corpus census); max_by over d-unique rows is the same
    # "c at the last day" and stays a 1-row frame on any input.
    last = llr.agg(
        F.expr("max_by(c, d)").cast("long").alias("llr_final_micro")
    )
    fin = llr.agg(
        F.count("*").cast("long").alias("n_days"),
        F.max("c").cast("long").alias("llr_max_micro"),
    )
    return (
        fin.crossJoin(F.broadcast(last))
        .crossJoin(F.broadcast(cross))
        .select(
            "n_days",
            "llr_final_micro",
            "llr_max_micro",
            F.expr(
                "CASE WHEN d_hi IS NOT NULL AND (d_lo IS NULL OR"
                " d_hi <= d_lo) THEN 'accept_h1'"
                " WHEN d_lo IS NOT NULL THEN 'accept_h0'"
                " ELSE 'continue' END"
            ).alias("decision"),
            F.expr(
                "CASE WHEN d_hi IS NOT NULL AND (d_lo IS NULL OR"
                " d_hi <= d_lo) THEN d_hi"
                " WHEN d_lo IS NOT NULL THEN d_lo END"
            ).cast("long").alias("decision_day"),
        )
    )


# ---------------------------------------------------------------------------
# q432: Kendall's W — do the sources agree on the weekday profile?
# ---------------------------------------------------------------------------


@query(
    "q432_kendalls_w_weekday",
    oracle=f"""
    WITH cw0 AS (
      SELECT CAST(user_id % 20 AS BIGINT) AS judge,
             ({EPOCH_DAY_SQL}) % 7
               AS wd,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    cw AS (
      SELECT g.judge, g.wd, COALESCE(c.y, 0) AS y
      FROM (SELECT j.judge, w.wd
            FROM (SELECT DISTINCT judge FROM cw0) j,
                 (SELECT DISTINCT wd FROM cw0) w) g
      LEFT JOIN cw0 c ON g.judge = c.judge AND g.wd = c.wd
    ),
    rk AS (
      SELECT a.judge, a.wd,
             CAST(2 * SUM(CASE WHEN b.y < a.y THEN 1 ELSE 0 END)
                  + SUM(CASE WHEN b.y = a.y THEN 1 ELSE 0 END) + 1
                  AS BIGINT) AS r2
      FROM cw a JOIN cw b ON a.judge = b.judge
      GROUP BY a.judge, a.wd
    ),
    ties AS (
      SELECT CAST(SUM(tc * tc * tc - tc) AS BIGINT) AS tt
      FROM (SELECT judge, y, CAST(COUNT(*) AS BIGINT) AS tc
            FROM cw GROUP BY judge, y)
    ),
    col AS (
      SELECT wd, CAST(SUM(r2) AS BIGINT) AS r2j FROM rk GROUP BY wd
    ),
    km AS (
      SELECT CAST(COUNT(DISTINCT judge) AS BIGINT) AS k,
             CAST(COUNT(DISTINCT wd) AS BIGINT) AS n
      FROM cw
    ),
    dev AS (
      SELECT CAST(SUM((col.r2j - km.k * (km.n + 1))
                      * (col.r2j - km.k * (km.n + 1))) AS BIGINT)
               AS d4
      FROM col, km
    )
    SELECT km.k AS k_judges, km.n AS n_weekdays,
           ROUND(3.0 * dev.d4
                 / (CAST(km.k AS DOUBLE) * km.k
                    * (CAST(km.n AS DOUBLE) * km.n * km.n - km.n)
                    - CAST(km.k AS DOUBLE) * ties.tt), 6) AS w,
           ROUND(CAST(km.k AS DOUBLE) * (km.n - 1) * 3.0 * dev.d4
                 / (CAST(km.k AS DOUBLE) * km.k
                    * (CAST(km.n AS DOUBLE) * km.n * km.n - km.n)
                    - CAST(km.k AS DOUBLE) * ties.tt), 4)
             AS chi2_equiv
    FROM km, dev, ties
    """,
)
def q432_kendalls_w_weekday(spark, sf_dir):
    """KENDALL'S W coefficient of concordance: do the 20 user cohorts
    (user_id % 20 as independent "judges") RANK the seven weekdays
    the same way by activity? W = 1 means every cohort has the same
    weekday profile shape (q128's seasonality is population-wide);
    W ~ 0 means the weekly cycle is an aggregation artifact of
    heterogeneous cohorts — the multi-judge generalization of q327's
    two-series Kendall tau, with the tie-corrected denominator, and
    the effect-size companion of q393's Friedman (chi2_equiv =
    k(n-1)W is the same statistic).

    Exactness: within-judge doubled midranks via the q393 k^2
    self-join on the (judge, weekday) aggregate; column rank sums,
    the squared-deviation sum (x4 scale cancels), and the tie term
    are exact bigints; W is one shared expression rounded 6dp.

    Scale: one fact scan to the 140-row (judge, weekday) aggregate;
    everything after is bounded algebra (q393 adjudicated class).

    Sparse-design guard (ADVICE r8): a (judge, weekday) cell with no
    events is a ZERO-ACTIVITY observation, not missing data — before
    ranking, the observed judges x weekdays grid is densified with
    y = 0, so every judge ranks the same n weekdays and the global
    k/n match the per-judge rank sums. Without this, a sparse SF
    silently mixes judges with different n and W is statistically
    wrong."""
    cw0 = (
        t(spark, sf_dir, "events")
        .groupBy(
            (F.col("user_id") % 20).cast("long").alias("judge"),
            (
                F.floor(
                    (F.col("ts_us") - F.lit(EVENTS_EPOCH_US))
                    / F.lit(US_PER_DAY)
                )
                % 7
            ).alias("wd"),
        )
        .agg(F.count("*").cast("long").alias("y"))
    )
    grid = (
        cw0.select("judge")
        .distinct()
        .crossJoin(F.broadcast(cw0.select("wd").distinct()))
    )
    cw = transient_persist(
        grid.join(cw0, ["judge", "wd"], "left").select(
            "judge",
            "wd",
            F.coalesce("y", F.lit(0)).cast("long").alias("y"),
        )
    )
    b = cw.select(
        F.col("judge").alias("jb"), F.col("y").alias("yb")
    )
    rk = (
        cw.join(F.broadcast(b), F.col("jb") == F.col("judge"))
        .groupBy("judge", "wd")
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
    ties = (
        cw.groupBy("judge", "y")
        .agg(F.count("*").cast("long").alias("tc"))
        .agg(
            F.sum(F.col("tc") * F.col("tc") * F.col("tc") - F.col("tc"))
            .cast("long")
            .alias("tt")
        )
    )
    col = rk.groupBy("wd").agg(F.sum("r2").cast("long").alias("r2j"))
    km = cw.agg(
        F.countDistinct("judge").cast("long").alias("k"),
        F.countDistinct("wd").cast("long").alias("n"),
    )
    dev = col.crossJoin(F.broadcast(km)).agg(
        F.sum(
            (F.col("r2j") - F.col("k") * (F.col("n") + 1))
            * (F.col("r2j") - F.col("k") * (F.col("n") + 1))
        )
        .cast("long")
        .alias("d4")
    )
    denom = (
        F.col("k").cast("double")
        * F.col("k")
        * (
            F.col("n").cast("double") * F.col("n") * F.col("n")
            - F.col("n")
        )
        - F.col("k").cast("double") * F.col("tt")
    )
    return (
        km.crossJoin(F.broadcast(dev))
        .crossJoin(F.broadcast(ties))
        .select(
            F.col("k").alias("k_judges"),
            F.col("n").alias("n_weekdays"),
            F.round(
                3.0 * F.col("d4") / F.nullif(denom, F.lit(0.0)), 6
            ).alias("w"),
            F.round(
                F.col("k").cast("double")
                * (F.col("n") - 1)
                * 3.0
                * F.col("d4")
                / F.nullif(denom, F.lit(0.0)),
                4,
            ).alias("chi2_equiv"),
        )
    )


# ---------------------------------------------------------------------------
# q433: Cronbach's alpha of the three cleaning gates
# ---------------------------------------------------------------------------

#: alpha = k/(k-1) * (1 - sum item variances / total variance), all
#: n^2-cleared: binary item variance * n^2 = n*G - G^2; total
#: variance * n^2 = n*SL2 - SL^2 — one identical string.
_CRON_A = (  # noqa: E501 - NULLIF-wrapped (r11 totality)
    """(1.5 * (1.0 - (CAST(n AS DOUBLE) * (g1 + g2 + g3) - (CAST(g1 AS DOUBLE) * g1 + CAST(g2 AS DOUBLE) * g2 + CAST(g3 AS DOUBLE) * g3)) / NULLIF((CAST(n AS DOUBLE) * sl2 - CAST(sl AS DOUBLE) * sl), 0)))"""
)


@query(
    "q433_cronbach_alpha_gates",
    oracle=f"""
    WITH f AS (
      SELECT CAST(len({{tok}}) AS BIGINT) AS nt,
             CAST(len(list_distinct({{tok}})) AS BIGINT) AS nd,
             CAST(len(list_filter({{tok}},
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
             CAST(SUM((ga + gb + gc) * (ga + gb + gc)) AS BIGINT)
               AS sl2
      FROM g
    )
    SELECT n, g1 AS pass_len, g2 AS pass_rep, g3 AS pass_stop,
           ROUND({_CRON_A}, 6) AS cronbach_alpha
    FROM agg
    """.replace("{tok}", "string_split_regex(trim(lower(text)), '\\s+')"),
)
def q433_cronbach_alpha_gates(spark, sf_dir):
    """CRONBACH'S ALPHA of the three cleaning gates treated as a
    3-item quality scale: do the gates measure ONE underlying
    "document quality" construct (alpha high — a composite pass-count
    score is meaningful) or three unrelated things (alpha ~ 0 or
    negative — combining them into one score averages apples and
    oranges)? The internal-consistency companion of q390's Cochran Q
    (Q asks if pass RATES differ; alpha asks if the gates
    co-vary) and q398's Fleiss kappa (chance-corrected agreement vs
    variance-ratio consistency — the two standard, different
    answers).

    Exactness: the same six exact bigint gate sums as q390 (binary
    items make item variances n*G - G^2 exactly); alpha is one
    shared expression rounded 6dp.

    Scale: one token-projection scan, one 6-cell aggregate."""
    docs = t(spark, sf_dir, "documents")
    f = docs.select(
        F.expr("size(split(trim(lower(text)), '\\\\s+'))")
        .cast("long")
        .alias("nt"),
        F.expr("size(array_distinct(split(trim(lower(text)), '\\\\s+')))")
        .cast("long")
        .alias("nd"),
        F.expr(
            "size(filter(split(trim(lower(text)), '\\\\s+'),"
            " t -> t IN ('the','a','of','and','to','in','is','it',"
            "'for','on')))"
        )
        .cast("long")
        .alias("ns"),
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
        F.round(F.expr(_CRON_A), 6).alias("cronbach_alpha"),
    )


# ---------------------------------------------------------------------------
# q434: Goodman-Kruskal gamma + Somers' D, length bucket vs score bucket
# ---------------------------------------------------------------------------

#: fixed-width ordinal buckets: deterministic, no data-driven
#: quantiles to desync the engines.
_GK_LEN_W = 100  # n_chars DIV 100
_GK_SCORE_W = 250  # milli-score DIV 250 (0..4)


@query(
    "q434_gamma_somers_d",
    oracle=f"""
    WITH x AS (
      SELECT CAST(n_chars // {_GK_LEN_W} AS BIGINT) AS xb,
             CAST({_SCORE_SQL} // {_GK_SCORE_W} AS BIGINT) AS yb
      FROM documents
    ),
    cells AS (
      SELECT xb, yb, CAST(COUNT(*) AS BIGINT) AS c
      FROM x GROUP BY xb, yb
    ),
    pairs AS (
      SELECT
        CAST(SUM(CASE WHEN b.xb > a.xb AND b.yb > a.yb
                 THEN a.c * b.c ELSE 0 END) AS BIGINT) AS conc,
        CAST(SUM(CASE WHEN b.xb > a.xb AND b.yb < a.yb
                 THEN a.c * b.c ELSE 0 END) AS BIGINT) AS disc,
        CAST(SUM(CASE WHEN b.xb > a.xb AND b.yb = a.yb
                 THEN a.c * b.c ELSE 0 END) AS BIGINT) AS ty
      FROM cells a CROSS JOIN cells b
    )
    SELECT conc AS concordant, disc AS discordant, ty AS tied_y_only,
           ROUND((CAST(conc AS DOUBLE) - disc)
                 / (CAST(conc AS DOUBLE) + disc), 6) AS gamma,
           ROUND((CAST(conc AS DOUBLE) - disc)
                 / (CAST(conc AS DOUBLE) + disc + ty), 6)
             AS somers_d_yx
    FROM pairs
    """,
)
def q434_gamma_somers_d(spark, sf_dir):
    """GOODMAN-KRUSKAL GAMMA and SOMERS' D between the ordinal
    length bucket (n_chars DIV 100, ``_GK_LEN_W``) and the ordinal quality
    bucket (milli-score DIV 250, ``_GK_SCORE_W``): the tie-aware ordinal
    association pair — gamma ignores ties entirely (association
    among the pairs that actually order), Somers' D_yx charges the
    y-ties against the predictor, which is what a "does length
    PREDICT quality band" claim must pay. The ordinal bridge between
    q326's Spearman (full ranks) and q286's chi2 (order-blind
    categories); the marginal companion of q422's within-source
    screen.

    Exactness: the bucket grid is a bounded contingency census;
    concordant/discordant/tied pair counts are exact bigint products
    over the |cells|^2 grid join (cells, not rows — corpus-size-
    independent); gamma and D are shared expressions rounded 6dp.

    Scale: one scan to the bucket census; the grid self-join is
    aggregate-bounded (q286 class)."""
    x = t(spark, sf_dir, "documents").select(
        (F.col("n_chars") / _GK_LEN_W).cast("long").alias("xb"),
        F.expr(f"({_SCORE_SPARK_SQL}) DIV {_GK_SCORE_W}")
        .cast("long")
        .alias("yb"),
    )
    cells = x.groupBy("xb", "yb").agg(
        F.count("*").cast("long").alias("c")
    )
    b = cells.select(
        F.col("xb").alias("xb2"),
        F.col("yb").alias("yb2"),
        F.col("c").alias("c2"),
    )
    pairs = cells.crossJoin(F.broadcast(b)).agg(
        F.sum(
            F.when(
                (F.col("xb2") > F.col("xb")) & (F.col("yb2") > F.col("yb")),
                F.col("c") * F.col("c2"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("conc"),
        F.sum(
            F.when(
                (F.col("xb2") > F.col("xb")) & (F.col("yb2") < F.col("yb")),
                F.col("c") * F.col("c2"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("disc"),
        F.sum(
            F.when(
                (F.col("xb2") > F.col("xb")) & (F.col("yb2") == F.col("yb")),
                F.col("c") * F.col("c2"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("ty"),
    )
    return pairs.select(
        F.col("conc").alias("concordant"),
        F.col("disc").alias("discordant"),
        F.col("ty").alias("tied_y_only"),
        F.round(
            (F.col("conc").cast("double") - F.col("disc"))
            / F.nullif(
                F.col("conc").cast("double") + F.col("disc"), F.lit(0.0)
            ),
            6,
        ).alias("gamma"),
        F.round(
            (F.col("conc").cast("double") - F.col("disc"))
            / F.nullif(
                F.col("conc").cast("double")
                + F.col("disc")
                + F.col("ty"),
                F.lit(0.0),
            ),
            6,
        ).alias("somers_d_yx"),
    )


# ---------------------------------------------------------------------------
# q435: Theil's uncertainty coefficient U(lang | source)
# ---------------------------------------------------------------------------


@query(
    "q435_theils_u_lang_source",
    oracle="""
    WITH cells AS (
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS c
      FROM documents GROUP BY 1, 2
    ),
    nn AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cells),
    lm AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS cl
           FROM cells GROUP BY lang),
    hl AS (
      SELECT CAST(SUM(cl * CAST(FLOOR(LN(CAST(nn.n AS DOUBLE) / cl)
                  * 1000000) AS BIGINT)) AS BIGINT) AS hx
      FROM lm, nn
    ),
    sm AS (SELECT source, CAST(SUM(c) AS BIGINT) AS cs
           FROM cells GROUP BY source),
    hcond AS (
      SELECT CAST(SUM(cells.c * CAST(FLOOR(LN(CAST(sm.cs AS DOUBLE)
                  / cells.c) * 1000000) AS BIGINT)) AS BIGINT) AS hxy
      FROM cells JOIN sm USING (source)
    )
    SELECT nn.n AS n_docs,
           CAST(hl.hx AS BIGINT) AS h_lang_micro_n,
           CAST(hcond.hxy AS BIGINT) AS h_lang_given_source_micro_n,
           ROUND((CAST(hl.hx AS DOUBLE) - hcond.hxy)
                 / CAST(hl.hx AS DOUBLE), 6) AS theils_u
    FROM hl, hcond, nn
    """,
)
def q435_theils_u_lang_source(spark, sf_dir):
    """THEIL'S UNCERTAINTY COEFFICIENT U(lang | source): what
    fraction of language entropy does knowing the source remove? The
    DIRECTIONAL categorical association the symmetric pair (q286
    chi2/Cramer's V) cannot express — U(lang|source) near 1 says
    sources are language-pure (route per-language pipelines by
    source and skip langid), while U(source|lang) stays low when
    each language spans many sources. Entropy sibling of q116's
    drift readout.

    Exactness: marginal and conditional entropy sums carry as
    c * FLOOR(LN(total/c) * 1e6) bigints — LN of exact-integer
    ratios over the bounded contingency cells, the q375/q414
    adjudicated floored-LN class (pinned by
    tests/test_ln_bit_identity.py); U is one shared double ratio
    rounded 6dp.

    Scale: one scan to the |langs| x |sources| census; cell-bounded
    algebra after."""
    cells = transient_persist(
        t(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count("*").cast("long").alias("c"))
    )
    nn = cells.agg(F.sum("c").cast("long").alias("n"))
    lm = cells.groupBy("lang").agg(F.sum("c").cast("long").alias("cl"))
    hl = lm.crossJoin(F.broadcast(nn)).agg(
        F.sum(
            F.col("cl")
            * F.floor(
                F.log(F.col("n").cast("double") / F.col("cl"))
                * 1_000_000
            ).cast("long")
        )
        .cast("long")
        .alias("hx")
    )
    sm = cells.groupBy("source").agg(
        F.sum("c").cast("long").alias("cs")
    )
    hcond = (
        cells.join(sm, "source")
        .agg(
            F.sum(
                F.col("c")
                * F.floor(
                    F.log(F.col("cs").cast("double") / F.col("c"))
                    * 1_000_000
                ).cast("long")
            )
            .cast("long")
            .alias("hxy")
        )
    )
    return (
        hl.crossJoin(F.broadcast(hcond))
        .crossJoin(F.broadcast(nn))
        .select(
            F.col("n").alias("n_docs"),
            F.col("hx").alias("h_lang_micro_n"),
            F.col("hxy").alias("h_lang_given_source_micro_n"),
            F.round(
                (F.col("hx").cast("double") - F.col("hxy"))
                / F.nullif(F.col("hx").cast("double"), F.lit(0.0)),
                6,
            ).alias("theils_u"),
        )
    )


# ---------------------------------------------------------------------------
# q436: post-hoc pairwise studentized mean gaps (Tukey-HSD statistic)
# ---------------------------------------------------------------------------


@query(
    "q436_tukey_pairwise_gaps",
    oracle=f"""
    WITH x AS (
      SELECT source, CAST({_SCORE_SQL} AS BIGINT) AS yv
      FROM documents
    ),
    g AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS mg,
             CAST(SUM(yv) AS BIGINT) AS sg
      FROM x GROUP BY source
    ),
    st AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CASE WHEN MIN(mg) = MAX(mg) THEN MIN(mg) END AS m,
             CAST(SUM(sg * sg) AS BIGINT) AS a
      FROM g
    ),
    q2 AS (SELECT CAST(SUM(yv * yv) AS BIGINT) AS q FROM x),
    pr AS (
      SELECT ga.source AS src_a, gb.source AS src_b,
             ga.sg AS sa, gb.sg AS sb, st.k, st.m, st.a, q2.q
      FROM g ga JOIN g gb ON ga.source < gb.source, st, q2
    )
    SELECT src_a, src_b,
           (1000 * (sa - sb)) // m AS mean_diff_milli,
           ROUND(ABS(CAST(sa AS DOUBLE) - sb) / m
                 / SQRT(((CAST(q AS DOUBLE) - CAST(a AS DOUBLE) / m)
                         / (CAST(k AS DOUBLE)
                            * (CAST(m AS DOUBLE) - 1.0))) / m), 6)
             AS q_stat
    FROM pr
    ORDER BY q_stat DESC, src_a ASC, src_b ASC
    LIMIT 10
    """,
)
def q436_tukey_pairwise_gaps(spark, sf_dir):
    """POST-HOC PAIRWISE GAPS after q395's ANOVA: for every source
    pair, the Tukey-HSD studentized-range statistic |ybar_i - ybar_j|
    / sqrt(MSW/m) — ANOVA says "SOME source differs"; this names
    WHICH pairs, on the scale the studentized-range critical values
    expect. Top-10 most separated pairs, deterministic tie-break —
    the action list a crawler-quality review actually works through.

    Exactness: per-source sums and the pooled MSW inputs (A, Q, k,
    balanced m with the min=max NULL guard) are exact bigints; mean
    gaps are integer milli; the q statistic is one shared expression
    rounded 6dp; ordering ties break on source names.

    Scale: the pair frame is the k^2/2 self-join of the |sources|-row
    aggregate (q97/q330 bounded class); one scan total."""
    x = t(spark, sf_dir, "documents").select(
        "source", F.expr(_SCORE_SPARK_SQL).cast("long").alias("yv")
    )
    g = transient_persist(
        x.groupBy("source").agg(
            F.count("*").cast("long").alias("mg"),
            F.sum("yv").cast("long").alias("sg"),
        )
    )
    st = g.agg(
        F.count("*").cast("long").alias("k"),
        F.when(F.min("mg") == F.max("mg"), F.min("mg")).alias("m"),
        F.sum(F.col("sg") * F.col("sg")).cast("long").alias("a"),
    )
    q2 = x.agg(F.sum(F.col("yv") * F.col("yv")).cast("long").alias("q"))
    gb = g.select(
        F.col("source").alias("src_b"), F.col("sg").alias("sb")
    )
    pr = (
        g.select(F.col("source").alias("src_a"), F.col("sg").alias("sa"))
        .join(F.broadcast(gb), F.col("src_a") < F.col("src_b"))
        .crossJoin(F.broadcast(st))
        .crossJoin(F.broadcast(q2))
    )
    msw_per_mean = (
        (F.col("q").cast("double") - F.col("a").cast("double") / F.col("m"))
        / (F.col("k").cast("double") * (F.col("m").cast("double") - 1.0))
    ) / F.col("m")
    return (
        pr.select(
            "src_a",
            "src_b",
            F.expr("(1000 * (sa - sb)) DIV m").alias("mean_diff_milli"),
            F.round(
                F.abs(F.col("sa").cast("double") - F.col("sb"))
                / F.col("m")
                / F.sqrt(msw_per_mean),
                6,
            ).alias("q_stat"),
        )
        .orderBy(
            F.col("q_stat").desc(), F.col("src_a").asc(),
            F.col("src_b").asc(),
        )
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q437: Chow structural-break test at the window midpoint
# ---------------------------------------------------------------------------

#: break day: first day of the second half of the 30-day window.
_CHOW_BREAK = 15

#: per-segment SSE from the q408 device: SSE = den / (n*D)^2 with
#: den = sum (n*D*e_t)^2 folded in DECIMAL(38,0); the F statistic is
#: one identical expression over the three segment frames.
_CHOW_SSE = (  # noqa: E501 - NULLIF-wrapped (r11 totality)
    """(CAST({d} AS DOUBLE) / NULLIF(((CAST({n} AS DOUBLE) * {dd}) * (CAST({n} AS DOUBLE) * {dd})), 0))"""
)
_CHOW_F = (
    "((("
    + _CHOW_SSE.format(d="den_p", n="n_p", dd="dd_p")
    + " - "
    + _CHOW_SSE.format(d="den_1", n="n_1", dd="dd_1")
    + " - "
    + _CHOW_SSE.format(d="den_2", n="n_2", dd="dd_2")
    + ") / 2.0) / (("
    + _CHOW_SSE.format(d="den_1", n="n_1", dd="dd_1")
    + " + "
    + _CHOW_SSE.format(d="den_2", n="n_2", dd="dd_2")
    + ") / NULLIF(CAST(n_p AS DOUBLE) - 4.0, 0)))"
)

#: one segment's OLS-SSE CTE block (DuckDB side), parameterized by a
#: day predicate; the Spark side builds the same frames with the
#: q408 helpers.
_CHOW_SEG_SQL = """
    m{tag} AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(d) AS BIGINT) AS st,
             CAST(SUM(d * d) AS BIGINT) AS st2,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(d * y) AS BIGINT) AS sty
      FROM daily WHERE {pred}
    ),
    c{tag} AS (
      SELECT n, n * sty - st * sy AS a, n * st2 - st * st AS dd,
             (n * st2 - st * st) * sy - (n * sty - st * sy) * st AS b0
      FROM m{tag}
    ),
    e{tag} AS (
      SELECT CAST(c{tag}.n * c{tag}.dd * daily.y - c{tag}.b0
                  - c{tag}.n * c{tag}.a * daily.d
             AS DECIMAL(38, 0)) AS en
      FROM daily, c{tag} WHERE {pred}
    ),
    f{tag} AS (
      SELECT CAST(SUM(en * en) AS DECIMAL(38, 0)) AS den FROM e{tag}
    )"""


@query(
    "q437_chow_break_test",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    {_CHOW_SEG_SQL.format(tag="p", pred="TRUE")},
    {_CHOW_SEG_SQL.format(tag="1", pred=f"d < {_CHOW_BREAK}")},
    {_CHOW_SEG_SQL.format(tag="2", pred=f"d >= {_CHOW_BREAK}")},
    z AS (
      SELECT mp.n AS n_p, cp.dd AS dd_p, fp.den AS den_p,
             m1.n AS n_1, c1.dd AS dd_1, f1.den AS den_1,
             m2.n AS n_2, c2.dd AS dd_2, f2.den AS den_2
      FROM mp, cp, fp, m1, c1, f1, m2, c2, f2
    )
    SELECT n_p AS n_days, n_1 AS n_before, n_2 AS n_after,
           ROUND({_CHOW_F}, 6) AS chow_f
    FROM z
    """,
)
def q437_chow_break_test(spark, sf_dir):
    """CHOW STRUCTURAL-BREAK TEST of the daily volume trend at the
    window midpoint (day 15, ``_CHOW_BREAK``): does fitting SEPARATE OLS
    lines to the two halves beat one pooled line by more than chance
    (F with 2 and n-4 df)? The model-comparison complement of q404's
    Pettitt (Pettitt finds WHERE a level shift most likely sits;
    Chow asks whether a SPECIFIED break — a deploy date, a crawler
    config change — actually changed the trend LINE, slope included).

    Exactness: each segment's SSE uses the q408 device — residuals
    cleared to integers by the segment's own n*D, squares folded in
    DECIMAL(38,0) — and the F statistic rescales each SSE by its own
    (n*D)^2 inside ONE shared expression; nothing crosses engines
    except exact integers/decimals and that single expression.

    Scale: three passes over the |days|-row calendar aggregate
    (persisted once); 1-row algebra."""
    daily = transient_persist(_daily(spark, sf_dir))

    def seg(pred):
        dd = daily.filter(pred) if pred is not None else daily
        m = dd.agg(
            F.count("*").cast("long").alias("n"),
            F.sum("d").cast("long").alias("st"),
            F.sum(F.col("d") * F.col("d")).cast("long").alias("st2"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("d") * F.col("y")).cast("long").alias("sty"),
        )
        c = m.select(
            "n",
            "st",
            (F.col("n") * F.col("sty") - F.col("st") * F.col("sy"))
            .alias("a"),
            (F.col("n") * F.col("st2") - F.col("st") * F.col("st"))
            .alias("dd"),
            (
                (F.col("n") * F.col("st2") - F.col("st") * F.col("st"))
                * F.col("sy")
                - (F.col("n") * F.col("sty") - F.col("st") * F.col("sy"))
                * F.col("st")
            ).alias("b0"),
        )
        e = dd.crossJoin(F.broadcast(c)).select(
            F.col("n"),
            F.col("dd").alias("ddv"),
            (
                F.col("n") * F.col("dd") * F.col("y")
                - F.col("b0")
                - F.col("n") * F.col("a") * F.col("d")
            )
            .cast("decimal(38,0)")
            .alias("en"),
        )
        return e.agg(
            F.first("n").alias("n"),
            F.first("ddv").alias("dd"),
            F.sum(F.col("en") * F.col("en"))
            .cast("decimal(38,0)")
            .alias("den"),
        )

    fp = seg(None).select(
        F.col("n").alias("n_p"),
        F.col("dd").alias("dd_p"),
        F.col("den").alias("den_p"),
    )
    f1 = seg(F.col("d") < _CHOW_BREAK).select(
        F.col("n").alias("n_1"),
        F.col("dd").alias("dd_1"),
        F.col("den").alias("den_1"),
    )
    f2 = seg(F.col("d") >= _CHOW_BREAK).select(
        F.col("n").alias("n_2"),
        F.col("dd").alias("dd_2"),
        F.col("den").alias("den_2"),
    )
    z = fp.crossJoin(F.broadcast(f1)).crossJoin(F.broadcast(f2))
    return z.select(
        # COALESCE: F.first over an empty segment's residual stream is
        # NULL where the oracle's COUNT is 0 (r11 empty-corpus census,
        # NULL-vs-0 class - same fix as q408); identical otherwise.
        F.coalesce(F.col("n_p"), F.lit(0)).cast("long").alias("n_days"),
        F.coalesce(F.col("n_1"), F.lit(0)).cast("long").alias("n_before"),
        F.coalesce(F.col("n_2"), F.lit(0)).cast("long").alias("n_after"),
        F.round(F.expr(_CHOW_F), 6).alias("chow_f"),
    )


# ---------------------------------------------------------------------------
# q438: Cochran-Armitage trend test — gate pass rate vs length bucket
# ---------------------------------------------------------------------------

#: CA trend z: T = sum w_i (p_i1 * n_i0 - p_i0 * n_i1)-style linear
#: contrast; the standard form: T = sum s_i (r_i - n_i * R / N),
#: Var = (R/N)(1-R/N) * (sum n_i s_i^2 - (sum n_i s_i)^2 / N), with
#: s_i the ordinal bucket score — all from exact bigints, N^2-cleared
#: inside one shared expression.
_CA_Z = (  # noqa: E501 - NULLIF-wrapped (r11 totality)
    """((CAST(t1 AS DOUBLE) - CAST(t2 AS DOUBLE) / NULLIF(nn, 0)) / NULLIF(SQRT(CAST(r AS DOUBLE) * (nn - r) / NULLIF(nn, 0) / NULLIF(nn, 0) * (CAST(w2 AS DOUBLE) - CAST(w1 AS DOUBLE) * w1 / NULLIF(nn, 0))), 0))"""
)


@query(
    "q438_cochran_armitage_trend",
    oracle=f"""
    WITH x AS (
      SELECT CAST(n_chars // {_GK_LEN_W} AS BIGINT) AS s,
             CAST(CASE WHEN len(string_split_regex(trim(lower(text)),
                  '\\s+')) BETWEEN 20 AND 80 THEN 1 ELSE 0 END
                  AS BIGINT) AS y
      FROM documents
    ),
    g AS (
      SELECT s, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS r
      FROM x GROUP BY s
    ),
    m AS (
      SELECT CAST(SUM(n) AS BIGINT) AS nn,
             CAST(SUM(r) AS BIGINT) AS r,
             CAST(SUM(s * r) AS BIGINT) AS t1,
             CAST(SUM(s * n) AS BIGINT) AS w1,
             CAST(SUM(s * s * n) AS BIGINT) AS w2,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM g
    ),
    f AS (
      SELECT nn, r, t1, w1, w2, k,
             r * w1 AS t2x, t1 * nn AS t1x
      FROM m
    )
    SELECT k AS n_buckets, nn AS n_docs, r AS n_pass,
           ROUND((CAST(t1x AS DOUBLE) - t2x)
                 / nn
                 / SQRT(CAST(r AS DOUBLE) * (nn - r) / nn / nn
                        * (CAST(w2 AS DOUBLE)
                           - CAST(w1 AS DOUBLE) * w1 / nn)), 6)
             AS z_trend
    FROM f
    """,
)
def q438_cochran_armitage_trend(spark, sf_dir):
    """COCHRAN-ARMITAGE TREND TEST: does the LENGTH gate's pass rate
    trend MONOTONICALLY across ordered character-length buckets
    (n_chars DIV 100, ``_GK_LEN_W``, as the ordinal dose)? The binary-outcome
    counterpart of q399's Page test, and strictly sharper than
    feeding the same table to q286-style chi2 — chi2 spends its power
    on ANY deviation, CA concentrates it on the ordered alternative a
    "longer docs pass less" hypothesis actually makes.

    Exactness: per-bucket (n_i, r_i) and the score moments (sum s*r,
    sum s*n, sum s^2*n) are exact bigints; the z statistic clears
    denominators inside one shared expression (T*N - R*W1 over the
    N-scaled variance), rounded 6dp.

    Scale: one scan, one groupBy(bucket) — the contingency census is
    bounded by the length domain, never corpus-sized."""
    x = t(spark, sf_dir, "documents").select(
        (F.col("n_chars") / _GK_LEN_W).cast("long").alias("s"),
        F.expr(
            "CASE WHEN size(split(trim(lower(text)), '\\\\s+'))"
            " BETWEEN 20 AND 80 THEN 1 ELSE 0 END"
        )
        .cast("long")
        .alias("y"),
    )
    g = x.groupBy("s").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("r"),
    )
    m = g.agg(
        F.sum("n").cast("long").alias("nn"),
        F.sum("r").cast("long").alias("r"),
        F.sum(F.col("s") * F.col("r")).cast("long").alias("t1"),
        F.sum(F.col("s") * F.col("n")).cast("long").alias("w1"),
        F.sum(F.col("s") * F.col("s") * F.col("n"))
        .cast("long")
        .alias("w2"),
        F.count("*").cast("long").alias("k"),
    )
    f = m.select(
        "nn",
        "r",
        "t1",
        "w1",
        "w2",
        "k",
        (F.col("r") * F.col("w1")).alias("t2x"),
        (F.col("t1") * F.col("nn")).alias("t1x"),
    )
    return f.select(
        F.col("k").alias("n_buckets"),
        F.col("nn").alias("n_docs"),
        F.col("r").alias("n_pass"),
        F.round(
            (F.col("t1x").cast("double") - F.col("t2x"))
            / F.col("nn")
            / F.nullif(
                F.sqrt(
                    F.col("r").cast("double")
                    * (F.col("nn") - F.col("r"))
                    / F.col("nn")
                    / F.col("nn")
                    * (
                        F.col("w2").cast("double")
                        - F.col("w1").cast("double")
                        * F.col("w1")
                        / F.col("nn")
                    )
                ),
                F.lit(0.0),
            ),
            6,
        ).alias("z_trend"),
    )


# ---------------------------------------------------------------------------
# q439: Brunner-Munzel test (heteroscedastic rank-based two-sample)
# ---------------------------------------------------------------------------

#: scipy-form statistic from doubled midranks: with T_g = sum of
#: combined doubled midranks in group g, the mean-rank difference is
#: (T_1/n1 - T_0/n0)/2; S_g^2 * 4 * n_g * (n_g - 1) = n_g * sum c*D2^2
#: - (sum c*D2)^2 with D2 = combined - within doubled midranks;
#: W = n0*n1*(Rbar1 - Rbar0) / (N * sqrt(n0*S0^2 + n1*S1^2)).
_BM_W = (  # noqa: E501 - NULLIF-wrapped (r11 totality)
    """((CAST(n0 AS DOUBLE) * n1 * (CAST(t1 AS DOUBLE) / NULLIF(n1, 0) - CAST(t0 AS DOUBLE) / NULLIF(n0, 0)) / 2.0) / NULLIF(((CAST(n0 AS DOUBLE) + n1) * SQRT(CAST(n0 AS DOUBLE) * ((CAST(n0 AS DOUBLE) * q0 - CAST(l0 AS DOUBLE) * l0) / NULLIF((4.0 * CAST(n0 AS DOUBLE) * (CAST(n0 AS DOUBLE) - 1.0)), 0)) + CAST(n1 AS DOUBLE) * ((CAST(n1 AS DOUBLE) * q1 - CAST(l1 AS DOUBLE) * l1) / NULLIF((4.0 * CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0)), 0)))), 0))"""
)
_BM_PHAT = (  # noqa: E501 - NULLIF-wrapped (r11 totality)
    """((CAST(t1 AS DOUBLE) / NULLIF(n1, 0) / 2.0 - (CAST(n1 AS DOUBLE) + 1.0) / 2.0) / NULLIF(CAST(n0 AS DOUBLE), 0))"""
)


@query(
    "q439_brunner_munzel",
    oracle=f"""
    WITH x AS (
      SELECT CAST(n_chars AS BIGINT) AS v,
             CAST(CASE WHEN source = '{_WT_A}' THEN 0 ELSE 1 END
                  AS BIGINT) AS g
      FROM documents WHERE source IN ('{_WT_A}', '{_WT_B}')
        -- listwise deletion (r13 partial-records census)
        AND n_chars IS NOT NULL
    ),
    pv AS (
      SELECT v,
             CAST(SUM(1 - g) AS BIGINT) AS c0,
             CAST(SUM(g) AS BIGINT) AS c1,
             CAST(COUNT(*) AS BIGINT) AS ct
      FROM x GROUP BY v
    ),
    rk AS (
      SELECT v, c0, c1, ct,
             2 * (SUM(ct) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) - ct) + ct + 1 AS r2,
             2 * (SUM(c0) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) - c0) + c0 + 1 AS r2w0,
             2 * (SUM(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) - c1) + c1 + 1 AS r2w1
      FROM pv
    ),
    s AS (
      SELECT CAST(SUM(c0) AS BIGINT) AS n0,
             CAST(SUM(c1) AS BIGINT) AS n1,
             CAST(SUM(c0 * r2) AS BIGINT) AS t0,
             CAST(SUM(c1 * r2) AS BIGINT) AS t1,
             CAST(SUM(c0 * (r2 - r2w0)) AS BIGINT) AS l0,
             CAST(SUM(c1 * (r2 - r2w1)) AS BIGINT) AS l1,
             CAST(SUM(c0 * (r2 - r2w0) * (r2 - r2w0)) AS BIGINT)
               AS q0,
             CAST(SUM(c1 * (r2 - r2w1) * (r2 - r2w1)) AS BIGINT)
               AS q1
      FROM rk
    )
    SELECT n0, n1,
           ROUND({_BM_PHAT}, 6) AS p_hat,
           ROUND({_BM_W}, 6) AS w_bm
    FROM s
    """,
)
def q439_brunner_munzel(spark, sf_dir):
    """BRUNNER-MUNZEL TEST between 'src0' and 'src1' document
    lengths: the modern replacement for Mann-Whitney when the two
    sources may differ in SHAPE as well as location — q318's MW
    variance assumes exchangeability under H0, which q425's Lepage
    can reject; BM estimates each group's rank variance separately,
    so its H0 is exactly "P(X0 < X1) + P(=)/2 = 1/2" with no
    equal-shape assumption. Reports the relative-effect estimate
    p_hat and the studentized W (t-distributed, Satterthwaite df).

    Exactness: combined AND within-group doubled midranks come from
    the same value census (three cumulative windows, domain-bounded);
    the placement differences D = R - R_within are exact integers per
    census cell, so each group's rank variance clears to n_g * sum
    c*D^2 - (sum c*D)^2 bigints; p_hat and W are shared expression
    strings rounded 6dp.

    Scale: one census groupBy(value), domain-bounded windows (q318
    adjudicated class), 1-row reduce."""
    x = (
        t(spark, sf_dir, "documents")
        .filter(
            F.col("source").isin(_WT_A, _WT_B)
            # listwise deletion, mirrors the oracle (r13 census)
            & F.col("n_chars").isNotNull()
        )
        .select(
            F.col("n_chars").cast("long").alias("v"),
            F.when(F.col("source") == _WT_A, 0).otherwise(1).alias("g"),
        )
    )
    pv = x.groupBy("v").agg(
        F.sum(1 - F.col("g")).cast("long").alias("c0"),
        F.sum("g").cast("long").alias("c1"),
        F.count("*").cast("long").alias("ct"),
    )
    w = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    rk = pv.select(
        "c0",
        "c1",
        (2 * (F.sum("ct").over(w) - F.col("ct")) + F.col("ct") + 1)
        .alias("r2"),
        (2 * (F.sum("c0").over(w) - F.col("c0")) + F.col("c0") + 1)
        .alias("r2w0"),
        (2 * (F.sum("c1").over(w) - F.col("c1")) + F.col("c1") + 1)
        .alias("r2w1"),
    )
    s = rk.agg(
        F.sum("c0").cast("long").alias("n0"),
        F.sum("c1").cast("long").alias("n1"),
        F.sum(F.col("c0") * F.col("r2")).cast("long").alias("t0"),
        F.sum(F.col("c1") * F.col("r2")).cast("long").alias("t1"),
        F.sum(F.col("c0") * (F.col("r2") - F.col("r2w0")))
        .cast("long")
        .alias("l0"),
        F.sum(F.col("c1") * (F.col("r2") - F.col("r2w1")))
        .cast("long")
        .alias("l1"),
        F.sum(
            F.col("c0")
            * (F.col("r2") - F.col("r2w0"))
            * (F.col("r2") - F.col("r2w0"))
        )
        .cast("long")
        .alias("q0"),
        F.sum(
            F.col("c1")
            * (F.col("r2") - F.col("r2w1"))
            * (F.col("r2") - F.col("r2w1"))
        )
        .cast("long")
        .alias("q1"),
    )
    return s.select(
        "n0",
        "n1",
        F.round(F.expr(_BM_PHAT), 6).alias("p_hat"),
        F.round(F.expr(_BM_W), 6).alias("w_bm"),
    )
