"""Advanced analytics suite: window-function breadth, statistical
aggregates, grouping sets, histograms, and skew-mitigation (salted)
operators.

The reference has no window functions or statistical aggregates
(SURVEY.md section 2.5/2.7: "none in the reference"); these are the
engine-side extensions its data model implies, plus the skew patterns a
100 TB deployment needs.  Every query here is a pure DataFrame/SQL plan
(whole-stage codegen, no Python on the executor path) with a DuckDB
oracle twin.

Scale notes are per-query; the common theme is that window functions
shuffle once on the partition key and sort within partitions, and the
salted variants (q67/q68) show the two-phase shape that keeps a hot key
from pinning a single reducer.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from .common import (
    EPOCH_DAY_SQL,
    fdiv_sql,
    EVENTS_EPOCH_US,
    US_PER_DAY,
    degenerate_frame,
    global_cumsum,
    global_lead,
    global_ntile,
    global_rn,
    t,
    transient_persist,
)
from .registry import query

# ---------------------------------------------------------------------------
# Window-function breadth
# ---------------------------------------------------------------------------


@query(
    "q57_event_deltas",
    oracle="""
    SELECT event_id,
           user_id,
           epoch_us(ts) AS ts_us,
           epoch_us(ts) - LAG(epoch_us(ts))
             OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) AS prev_gap_us
    FROM events
    """,
)
def q57_event_deltas(spark, sf_dir):
    """LAG: per-user inter-event gap (NULL for each user's first event).

    One shuffle on ``user_id`` + an in-partition sort; no join, no
    second shuffle.  At 100 TB the plan is unchanged - per-user history
    colocates under the hash partitioning and AQE coalesces small
    post-shuffle partitions."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us")
    return ev.select(
        "event_id",
        "user_id",
        "ts_us",
        (F.col("ts_us") - F.lag("ts_us").over(w)).alias("prev_gap_us"),
    )


@query(
    "q58_ntile_quartiles",
    oracle="""
    WITH q AS (
      SELECT o_totalprice,
             NTILE(4) OVER (
               ORDER BY o_totalprice NULLS FIRST, o_orderkey)
               AS quartile
      FROM orders
    )
    SELECT quartile,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           ROUND(MIN(o_totalprice), 2) AS lo,
           ROUND(MAX(o_totalprice), 2) AS hi
    FROM q GROUP BY quartile
    """,
)
def q58_ntile_quartiles(spark, sf_dir):
    """NTILE quartiles over order value (tie-broken by key so the
    bucket assignment is deterministic in both engines).

    Distributed form: no single-partition WindowExec.  The global
    NTILE is computed by :func:`plans.common.global_ntile` - one range
    exchange on (value, key), pure-JVM in-partition ordinals,
    driver-folded partition offsets, and the exact SQL NTILE bucket
    formula on the global row number.  Every stage is fully parallel,
    so the plan survives a 100x scale-up (the old ``Window.orderBy``
    form serialized the whole table onto one task)."""
    orders = t(spark, sf_dir, "orders").select("o_totalprice", "o_orderkey")
    return (
        global_ntile(orders, ["o_totalprice", "o_orderkey"], 4, "quartile")
        .groupBy("quartile")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


@query(
    "q59_moving_avg",
    oracle="""
    SELECT event_id, user_id, epoch_us(ts) AS ts_us,
           ROUND(AVG(value) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts)
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS mov_avg
    FROM events
    """,
)
def q59_moving_avg(spark, sf_dir):
    """Sliding-frame aggregate: 3-event moving average per user
    (ROWS BETWEEN 2 PRECEDING AND CURRENT ROW).

    Same single-shuffle shape as q57; the bounded ROWS frame streams in
    one pass over the sorted partition (no per-row rescan)."""
    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rowsBetween(-2, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts_us",
        F.round(F.avg("value").over(w), 6).alias("mov_avg"),
    )


# ---------------------------------------------------------------------------
# Statistical aggregates / grouping sets / histogram
# ---------------------------------------------------------------------------


#: corr computed as an explicit guarded ratio - IDENTICAL string on
#: both engines - because Spark's native corr divides by the stddev
#: product inside the aggregate, which ANSI-errors on a zero-variance
#: group (the r12 constant-value-corpus census; DuckDB's corr NULLs).
#: covar_samp/(sd*sd) equals corr mathematically and agreed with both
#: engines' native corr at 6dp on every real fixture when swapped in.
_CORR_USER = (  # noqa: E501 - NULLIF-wrapped (r12 totality)
    """(covar_samp(value, CAST(user_id AS DOUBLE)) / NULLIF(stddev_samp(value) * stddev_samp(CAST(user_id AS DOUBLE)), 0))"""
)


@query(
    "q64_stats_suite",
    oracle=f"""
    SELECT event_type,
           ROUND(stddev_samp(value), 6) AS sd_value,
           ROUND(var_samp(value), 6) AS var_value,
           ROUND({_CORR_USER}, 6) AS corr_user,
           ROUND(covar_samp(value, CAST(user_id AS DOUBLE)), 6) AS covar_user
    FROM events GROUP BY event_type
    """,
)
def q64_stats_suite(spark, sf_dir):
    """Statistical aggregates: sample stddev/variance, Pearson
    correlation, sample covariance per event type.

    All four are algebraic (mergeable moment sketches), so Spark
    computes them with map-side partial aggregation - one small shuffle
    of per-group moment tuples regardless of input size."""
    ev = t(spark, sf_dir, "events")
    u = F.col("user_id").cast("double")
    return ev.groupBy("event_type").agg(
        F.round(F.stddev_samp("value"), 6).alias("sd_value"),
        F.round(F.var_samp("value"), 6).alias("var_value"),
        F.round(F.expr(_CORR_USER), 6).alias("corr_user"),
        F.round(F.covar_samp(F.col("value"), u), 6).alias("covar_user"),
    )


@query(
    "q65_grouping_sets",
    oracle="""
    SELECT r_name, n_name,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           ROUND(SUM(c_acctbal), 2) AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())
    HAVING COUNT(*) > 0
    """,
)
def q65_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS (finer control than q26's ROLLUP / q38's
    CUBE): per-(region, nation), per-region, and grand-total rows in one
    pass.

    Spark plans this as a single Expand + hash aggregate - the input is
    scanned once and replicated only into the requested 3 sets (vs 4 for
    a full CUBE).  Dims broadcast; one shuffle on the grouping columns.
    The oracle's HAVING COUNT(*) > 0 pins empty-in/empty-out on both
    engines (the q26 rollup-on-empty class; no-op on real data)."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    joined = c.join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    ).join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    joined.createOrReplaceTempView("q65_joined")
    return spark.sql(
        """
        SELECT r_name, n_name,
               COUNT(*) AS cnt,
               ROUND(SUM(c_acctbal), 2) AS total_acctbal
        FROM q65_joined
        GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())
        """
    )


@query(
    "q66_value_histogram",
    oracle="""
    SELECT CAST(ROUND(value * 100) AS BIGINT) // 2500 AS bucket,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           ROUND(SUM(value), 2) AS total
    FROM events GROUP BY bucket
    """,
)
def q66_value_histogram(spark, sf_dir):
    """Fixed-width histogram over ``value`` (25-unit buckets).

    The bucket id is PURE-INTEGER on both engines (2-decimal value ->
    exact cents, then integer division; value >= 0 so trunc == floor)
    - no float floor at a bucket boundary can diverge across engine
    builds (the q174/q230 tie class).

    CONTRACT (adjudicated, ADVICE r5): the cents trick is equivalent
    to floor(value/25) ONLY because ``events.value`` is non-negative
    and exactly 2-decimal (fixture generator invariant, pinned by
    tests/test_analytics_invariants.py). Spark ``DIV`` truncates
    toward zero while DuckDB ``//`` floors, so a NEGATIVE value would
    silently bucket differently cross-engine, and finer-than-cent
    precision would shift rows at bucket boundaries - if the data
    contract ever loosens, switch both sides to an explicit
    floor-of-integer form.

    The bucket id is a plain projected expression, so this is an
    ordinary hash aggregate with map-side combine: the shuffle carries
    at most n_buckets rows per task no matter how large the scan."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.select(
            F.expr(
                "CAST(ROUND(value * 100) AS BIGINT) DIV 2500"
            ).alias("bucket"),
            "value",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("value"), 2).alias("total"),
        )
    )


# ---------------------------------------------------------------------------
# Skew mitigation: salted two-phase aggregation and salted join
# ---------------------------------------------------------------------------

_SALT = 8


@query(
    "q67_salted_agg",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           ROUND(SUM(value), 2) AS total_value,
           ROUND(MAX(value), 2) AS max_value
    FROM events GROUP BY user_id
    """,
)
def q67_salted_agg(spark, sf_dir):
    """Two-phase salted aggregation: phase 1 groups on
    ``(user_id, salt)`` so a hot user's rows spread across ``_SALT``
    reducers, phase 2 recombines the partials per user.

    Result is identical to a plain GROUP BY (the oracle) because count,
    sum, and max are associative.  On uniform data this costs one extra
    (tiny) shuffle; on skewed data it is the difference between one
    straggler task owning the hot key and ``_SALT``-way parallelism.
    AQE's skew handling covers sort-merge *joins*, not aggregations -
    this pattern is still the manual fix for hot-key group-bys."""
    ev = t(spark, sf_dir, "events")
    partial = (
        ev.withColumn("salt", F.pmod(F.hash("event_id"), F.lit(_SALT)))
        .groupBy("user_id", "salt")
        .agg(
            F.count("*").alias("p_cnt"),
            F.sum("value").alias("p_sum"),
            F.max("value").alias("p_max"),
        )
    )
    return partial.groupBy("user_id").agg(
        F.sum("p_cnt").alias("cnt"),
        F.round(F.sum("p_sum"), 2).alias("total_value"),
        F.round(F.max("p_max"), 2).alias("max_value"),
    )


@query(
    "q68_salted_join",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    """,
)
def q68_salted_join(spark, sf_dir):
    """Salted fact-dim join: the dim side is replicated ``_SALT`` ways
    (explode over salt values) and the fact side tags each row with a
    uniform salt, so the join key becomes ``(key, salt)`` and a hot key's
    rows land on ``_SALT`` different reducers instead of one.

    Equivalent to the plain equi-join (oracle) - replication x uniform
    tag pairs every fact row with exactly one dim copy.  This is the
    shuffle-join skew fix for when the dim is too big to broadcast but
    small enough to replicate ``_SALT``-fold; with a broadcastable dim
    (as at this SF) salting is unnecessary and AQE would just broadcast.
    The plan is forced to shuffle-join here so the salted shape is the
    one actually exercised and benched."""
    ev = t(spark, sf_dir, "events")
    cust = t(spark, sf_dir, "customer")
    salted_dim = cust.select(
        "c_custkey",
        "c_mktsegment",
        F.explode(F.array(*[F.lit(i) for i in range(_SALT)])).alias("salt"),
    )
    salted_fact = ev.select(
        "user_id",
        "value",
        F.pmod(F.hash("event_id"), F.lit(_SALT)).alias("salt"),
    )
    joined = salted_fact.hint("shuffle_hash").join(
        salted_dim,
        (salted_fact.user_id == salted_dim.c_custkey)
        & (salted_fact.salt == salted_dim.salt),
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


# ---------------------------------------------------------------------------
# BPE-ish tokenization (the regex flavor of q30's whitespace counter)
# ---------------------------------------------------------------------------

_BPE_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


@query(
    "q69_bpe_tokens",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(lower(text), '{_BPE_RE}')) AS BIGINT)
             AS n_bpe_tokens,
           CAST(len(regexp_extract_all(lower(text), '[0-9]+')) AS BIGINT)
             AS n_number_runs
    FROM documents
    """,
)
def q69_bpe_tokens(spark, sf_dir):
    """BPE-ish regex tokenization: alpha runs, digit runs, and isolated
    symbols as separate tokens (the pre-tokenizer split BPE vocabularies
    are trained over), vs q30's plain whitespace count.

    Pure codegen map stage - ``regexp_extract_all`` + ``size``, no
    shuffle at all."""
    docs = t(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(low, F.lit(_BPE_RE), F.lit(0)))
        .cast("long")
        .alias("n_bpe_tokens"),
        F.size(F.regexp_extract_all(low, F.lit("[0-9]+"), F.lit(0)))
        .cast("long")
        .alias("n_number_runs"),
    )


# ---------------------------------------------------------------------------
# Semi-structured (JSON), distinct counting, unpivot
# ---------------------------------------------------------------------------


@query(
    "q72_json_extract",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS k_total,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS k_max
    FROM events GROUP BY event_type
    """,
)
def q72_json_extract(spark, sf_dir):
    """JSON path extraction from the ``props`` payload column with
    schema-on-read (``from_json`` into a typed struct), then aggregate.

    ``from_json`` parses once per row into a struct that downstream
    expressions field-access for free - preferable at scale to repeated
    ``get_json_object`` calls, each of which re-parses the string."""
    ev = t(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type",
        F.from_json(F.col("props"), "k BIGINT").getField("k").alias("k"),
    )
    return parsed.groupBy("event_type").agg(
        F.sum("k").alias("k_total"), F.max("k").alias("k_max")
    )


@query(
    "q73_distinct_users",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY event_type
    """,
)
def q73_distinct_users(spark, sf_dir):
    """Exact distinct counting per group (COUNT DISTINCT + plain COUNT
    in one aggregate - Spark plans the two-phase Expand distinct).

    Exact NDV shuffles the distinct (group, user) pairs; q74 is the
    HLL sketch form whose shuffle is O(groups), the 100 TB default."""
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


@query(
    "q74_approx_ndv",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users_exact,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           TRUE AS approx_within_10pct
    FROM events GROUP BY event_type
    """,
)
def q74_approx_ndv(spark, sf_dir):
    """Approximate distinct counting (HyperLogLog++, 2% target rsd):
    the scale path for NDV - partial sketches merge map-side and the
    shuffle carries one sketch per group instead of every distinct
    pair.

    The HLL estimate itself is engine-specific (differs from DuckDB's
    sketch), so the oracle bridge emits the EXACT distinct count plus
    a tolerance verdict derived from the estimate - the sketch stays
    in the value-checked path (a broken HLL flips the boolean) without
    asking two engines to agree on sketch internals. The exact-distinct
    twin exists ONLY for this bridge; the production form is the
    sketch alone - that is the whole point of HLL at 100 TB."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.02).alias("_approx"),
            F.count_distinct("user_id").alias("n_users_exact"),
            F.count("*").alias("n_events"),
        )
        .select(
            "event_type",
            F.col("n_users_exact").cast("long").alias("n_users_exact"),
            F.col("n_events").cast("long").alias("n_events"),
            (
                F.abs(F.col("_approx") - F.col("n_users_exact"))
                <= 0.1 * F.col("n_users_exact")
            ).alias("approx_within_10pct"),
        )
    )


@query(
    "q75_unpivot_roundtrip",
    oracle="""
    SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM events GROUP BY user_id, event_type
    """,
)
def q75_unpivot_roundtrip(spark, sf_dir):
    """Pivot then unpivot (melt) back to long form; dropping the NULL
    cells of the pivot grid makes the round trip equal the plain
    GROUP BY (the oracle). Exercises Spark's native ``unpivot``
    operator - constant-folded Expand, no shuffle beyond the pivot's."""
    ev = t(spark, sf_dir, "events")
    # A NULL event_type is a real GROUP BY group in the oracle, but a
    # pivot COLUMN cannot be named NULL and unpivot's variable column
    # yields column-NAME strings - so NULL is sentinel-encoded through
    # the round trip and decoded after (r13 partial-records census:
    # sorted() over a types list containing None crashed the driver,
    # and an unencoded pivot would have emitted the STRING 'null').
    # In contract event_type is never NULL and the sentinel is inert.
    _NULL_ET = "~NULL~"
    enc = ev.withColumn(
        "_et", F.coalesce(F.col("event_type"), F.lit(_NULL_ET))
    )
    types = [r[0] for r in enc.select("_et").distinct().collect()]
    if not types:
        # degenerate corpus: the pivot grid's value columns are
        # data-derived and none exist; unpivot over zero value columns
        # is unrepresentable, and the oracle's GROUP BY is empty -
        # return the same 0-row frame with the static output schema.
        return degenerate_frame(
            spark, "user_id bigint, event_type string, cnt bigint"
        )
    wide = (
        enc.groupBy("user_id")
        .pivot("_et", types)
        .agg(F.count(F.lit(1)))
    )
    long = wide.unpivot(
        ids=["user_id"],
        values=sorted(types),
        variableColumnName="event_type",
        valueColumnName="cnt",
    )
    return long.filter(F.col("cnt").isNotNull()).select(
        "user_id",
        F.when(F.col("event_type") == _NULL_ET, F.lit(None)).otherwise(
            F.col("event_type")
        ).alias("event_type"),
        F.col("cnt").cast("long").alias("cnt"),
    )


# ---------------------------------------------------------------------------
# Calendar spine, subquery decorrelation, ratio-to-report, cohorts
# ---------------------------------------------------------------------------


@query(
    "q90_date_spine_gapfill",
    oracle="""
    WITH bounds AS (
      SELECT MIN(CAST(o_orderdate AS DATE)) AS lo,
             MAX(CAST(o_orderdate AS DATE)) AS hi
      FROM orders
    ),
    spine AS (
      SELECT CAST(unnest(range((SELECT lo FROM bounds),
                               (SELECT hi FROM bounds) + INTERVAL 1 DAY,
                               INTERVAL 1 DAY)) AS DATE) AS day
    ),
    daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n
      FROM orders GROUP BY 1
    )
    SELECT s.day, CAST(COALESCE(d.n, 0) AS BIGINT) AS n_orders
    FROM spine s LEFT JOIN daily d USING (day)
    """,
)
def q90_date_spine_gapfill(spark, sf_dir):
    """Calendar-spine gap fill: generate every day between the first and
    last order date (``sequence`` + ``explode`` off a 1-row bounds
    aggregate) and left-join daily order counts, zero-filling silent
    days - the canonical time-series densification op.

    Scale: the spine's size is bounded by the *date range*, not the row
    count (a 100 TB fact table still spans only ~10^4 days), so the
    per-day aggregate - one map-side-combined shuffle - dominates and
    the spine<-daily join is a broadcast. Catalyst folds the bounds agg
    into a 1-row plan; no driver-side collect."""
    days = t(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("date").alias("day")
    )
    daily = days.groupBy("day").agg(F.count("*").alias("n"))
    spine = (
        days.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
        .select(F.explode(F.sequence("lo", "hi")).alias("day"))
    )
    return spine.join(F.broadcast(daily), "day", "left").select(
        "day", F.coalesce("n", F.lit(0)).cast("long").alias("n_orders")
    )


@query(
    "q91_above_customer_avg",
    oracle="""
    WITH a AS (
      SELECT o_orderkey, o_custkey, o_totalprice,
             AVG(o_totalprice) OVER (PARTITION BY o_custkey) AS cust_avg
      FROM orders
    )
    SELECT o_orderkey, o_custkey,
           ROUND(o_totalprice, 2) AS price,
           CAST(FLOOR(cust_avg) AS BIGINT) AS cust_avg_unit
    FROM a WHERE o_totalprice > 1.3 * cust_avg
    """,
)
def q91_above_customer_avg(spark, sf_dir):
    """Correlated scalar subquery, decorrelated: orders priced >1.3x
    their own customer's average. The naive SQL re-runs the subquery
    per row; the engine form is a per-key window AVG - ONE shuffle on
    ``o_custkey``, no join, no second pass over the fact table.

    Scale: identical plan at 100 TB (hash-partition by customer, stream
    each partition once); a groupBy+join decorrelation would add a
    second shuffle for nothing.

    The emitted average is FLOORed to whole units, not ROUNDed to
    cents: both engines hold bit-identical avg doubles, but their ROUND
    implementations disagree at the half-cent boundary (Spark rounds
    the exact decimal HALF_UP; DuckDB multiplies by 100 in floating
    point first), and an AVG lands on that boundary often enough to
    flip a 5k-row result. FLOOR has no multiply and an integer-wide
    boundary."""
    w = Window.partitionBy("o_custkey")
    orders = t(spark, sf_dir, "orders")
    return (
        orders.withColumn("cust_avg", F.avg("o_totalprice").over(w))
        .filter(F.col("o_totalprice") > 1.3 * F.col("cust_avg"))
        .select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 2).alias("price"),
            F.floor("cust_avg").cast("long").alias("cust_avg_unit"),
        )
    )


@query(
    "q92_priority_revenue_share",
    oracle="""
    WITH g AS (
      SELECT o_orderpriority, SUM(o_totalprice) AS rev FROM orders
      GROUP BY 1
    )
    SELECT o_orderpriority,
           ROUND(rev, 0) AS rev,
           -- NULLIF: shares of a grand total that NETS TO ZERO are
           -- undefined (r14 sign-cancellation census), NULL on both
           -- engines; in contract total revenue > 0
           ROUND(rev / NULLIF(SUM(rev) OVER (), 0), 6) AS share
    FROM g
    """,
)
def q92_priority_revenue_share(spark, sf_dir):
    """Ratio-to-report: each order priority's revenue as a fraction of
    the grand total, via an unpartitioned window SUM *over the
    aggregate* (5 rows), never over the fact table.

    Scale: the only heavy op is the map-side-combined groupBy; the
    global window touches one row per group. Putting the window over
    the raw table instead would force a single-partition sort of the
    whole fact table - the classic ratio-to-report trap."""
    g = (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    w = Window.partitionBy()
    return g.select(
        "o_orderpriority",
        F.round("rev", 0).alias("rev"),
        F.round(
            F.col("rev") / F.nullif(F.sum("rev").over(w), F.lit(0.0)), 6
        ).alias("share"),
    )


@query(
    "q93_cohort_retention",
    oracle=f"""
    WITH e AS (
      SELECT user_id,
             {fdiv_sql(f'epoch_us(ts) - {EVENTS_EPOCH_US}', 604800000000)} AS week
      FROM events
    ),
    first AS (
      SELECT user_id, MIN(week) AS cohort_week FROM e GROUP BY user_id
    ),
    act AS (SELECT DISTINCT user_id, week FROM e)
    SELECT f.cohort_week, a.week,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
    FROM act a JOIN first f USING (user_id)
    GROUP BY f.cohort_week, a.week
    """,
)
def q93_cohort_retention(spark, sf_dir):
    """Cohort retention matrix: users bucketed by first-seen week, then
    distinct-user counts per (cohort_week, active_week) cell - the
    product-analytics staple behind every retention curve.

    Scale: three shuffles, each on a shrinking keyspace - (user, week)
    distinct, the min-week groupBy (both partial-aggregated map-side),
    then the cells. The act<-first join co-partitions on ``user_id``
    with the groupBy before it, so AQE reuses the exchange; the final
    cell count is over |users| rows, not |events|."""
    week = F.floor(
        (F.col("ts_us") - F.lit(EVENTS_EPOCH_US)) / F.lit(604_800_000_000)
    ).alias("week")
    e = t(spark, sf_dir, "events").select("user_id", week)
    first = e.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    act = e.distinct()
    return (
        act.join(first, "user_id")
        .groupBy("cohort_week", "week")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


@query(
    "q94_markov_transitions",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ) AS next_type
      FROM events
    ),
    p AS (
      SELECT event_type, next_type, COUNT(*) AS n FROM s
      WHERE next_type IS NOT NULL GROUP BY 1, 2
    )
    SELECT event_type, next_type, CAST(n AS BIGINT) AS n,
           ROUND(n / SUM(n) OVER (PARTITION BY event_type), 6) AS p
    FROM p
    """,
)
def q94_markov_transitions(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    sequences: LEAD pairs up consecutive event types, then counts and
    row-normalizes into transition probabilities.

    Scale: one shuffle on ``user_id`` for the sequence window (ordered
    by time with ``event_id`` as the deterministic tie-break), one
    map-side-combined count over a |types|^2-bounded keyspace, and the
    normalizing window runs over that tiny aggregate - never the fact
    table."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    pairs = (
        ev.select(
            "user_id",
            "event_type",
            F.lead("event_type").over(w).alias("next_type"),
        )
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count("*").alias("n"))
    )
    wt = Window.partitionBy("event_type")
    return pairs.select(
        "event_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(wt), 6).alias("p"),
    )


@query(
    "q95_argmax_per_group",
    oracle="""
    WITH r AS (
      SELECT user_id, event_id, event_type, value,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY value DESC, event_id DESC
             ) AS rn
      FROM events
    )
    SELECT user_id,
           event_id AS top_event_id,
           event_type AS top_event_type,
           ROUND(value, 6) AS top_value
    FROM r WHERE rn = 1
    """,
)
def q95_argmax_per_group(spark, sf_dir):
    """ARGMAX aggregation: each user's highest-value event via
    ``max_by`` with a (value, event_id) struct ordering key - ties on
    value break deterministically by event_id, so both engines select
    the same witness row.

    Scale: a single map-side-combinable aggregate - max_by carries one
    candidate row per group through the shuffle, vs the window
    row_number() formulation that must sort every partition. This is
    the preferred top-1-per-group plan; use the window form only when
    k > 1."""
    ev = t(spark, sf_dir, "events")
    ordk = F.struct(F.col("value"), F.col("event_id"))
    return ev.groupBy("user_id").agg(
        F.max_by("event_id", ordk).alias("top_event_id"),
        F.max_by("event_type", ordk).alias("top_event_type"),
        F.round(F.max("value"), 6).alias("top_value"),
    )


@query(
    "q96_zscore_outliers",
    oracle="""
    WITH s AS (
      SELECT event_id, user_id, value,
             AVG(value)        OVER (PARTITION BY user_id) AS mu,
             STDDEV_SAMP(value) OVER (PARTITION BY user_id) AS sigma
      FROM events
    )
    SELECT event_id, user_id, ROUND(value, 6) AS value,
           ROUND((value - mu) / sigma, 4) AS z
    FROM s WHERE sigma > 0 AND ABS(value - mu) > 2.5 * sigma
    """,
)
def q96_zscore_outliers(spark, sf_dir):
    """Per-user z-score outlier detection: events whose value deviates
    more than 2.5 sigma from that user's own mean - the standard
    population-relative anomaly filter.

    Scale: one shuffle on ``user_id``; mean and stddev come from the
    same window pass, and the comparison stays in codegen. The
    predicate is on the raw doubles (identical bit patterns in both
    engines for same-order aggregation over these group sizes); only
    the *emitted* z is rounded."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    return (
        ev.select(
            "event_id",
            "user_id",
            "value",
            F.avg("value").over(w).alias("mu"),
            F.stddev_samp("value").over(w).alias("sigma"),
        )
        .filter(
            (F.col("sigma") > 0)
            & (F.abs(F.col("value") - F.col("mu")) > 2.5 * F.col("sigma"))
        )
        .select(
            "event_id",
            "user_id",
            F.round("value", 6).alias("value"),
            F.round((F.col("value") - F.col("mu")) / F.col("sigma"), 4).alias(
                "z"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Dominance, exact money allocation, surrogate keys
# ---------------------------------------------------------------------------


@query(
    "q101_pareto_frontier",
    oracle="""
    WITH p AS (
      SELECT p_partkey, p_brand, p_size,
             CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_cents
      FROM part
    ),
    m AS (
      SELECT p_partkey, p_brand, p_size, price_cents,
             MAX(p_size) OVER (
               PARTITION BY p_brand ORDER BY price_cents
               RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS best_cheaper,
             MAX(p_size) OVER (
               PARTITION BY p_brand, price_cents
             ) AS best_same_price
      FROM p
    )
    SELECT p_partkey, p_brand, p_size, price_cents
    FROM m
    WHERE (best_cheaper IS NULL OR best_cheaper < p_size)
      AND p_size = best_same_price
    """,
)
def q101_pareto_frontier(spark, sf_dir):
    """Pareto frontier per brand: parts not dominated by any same-brand
    part that is cheaper-or-equal AND at-least-as-large (one strict).
    Dominance collapses to two window maxima - the running max size
    over *strictly cheaper* rows (a value-based RANGE frame on integer
    cents) and the max size at the same price - so the O(n^2)
    pairwise test becomes one sort per brand.

    Scale: partitioned by brand, so the sort is per-group, not global;
    for an unpartitioned frontier at 100 TB the same operator runs per
    partition and the tiny per-partition frontiers are re-frontiered
    once (frontier(union of frontiers) == frontier(all))."""
    p = t(spark, sf_dir, "part").select(
        "p_partkey",
        "p_brand",
        "p_size",
        F.round(F.col("p_retailprice") * 100)
        .cast("long")
        .alias("price_cents"),
    )
    w_cheaper = (
        Window.partitionBy("p_brand")
        .orderBy("price_cents")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_same = Window.partitionBy("p_brand", "price_cents")
    m = p.select(
        "*",
        F.max("p_size").over(w_cheaper).alias("best_cheaper"),
        F.max("p_size").over(w_same).alias("best_same_price"),
    )
    return m.filter(
        (F.col("best_cheaper").isNull() | (F.col("best_cheaper") < F.col("p_size")))
        & (F.col("p_size") == F.col("best_same_price"))
    ).select("p_partkey", "p_brand", "p_size", "price_cents")


@query(
    "q102_exact_allocation",
    oracle="""
    WITH li AS (
      SELECT l_orderkey, l_linenumber,
             CAST(l_quantity AS BIGINT) AS qty,
             SUM(CAST(l_quantity AS BIGINT))
               OVER (PARTITION BY l_orderkey) AS sum_q
      FROM lineitem
    ),
    j AS (
      -- NULLIF: an order whose quantities NET TO ZERO has no
      -- proportional allocation (r14 sign-cancellation census);
      -- DuckDB's silent NULL-on-div-0 and Spark's ANSI error are
      -- replaced by the SAME stated NULL on both engines
      SELECT l_orderkey, l_linenumber,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS total_cents,
             (CAST(ROUND(o_totalprice * 100) AS BIGINT) * qty)
               // NULLIF(sum_q, 0) AS base_cents,
             (CAST(ROUND(o_totalprice * 100) AS BIGINT) * qty)
               % NULLIF(sum_q, 0) AS rem
      FROM li JOIN orders ON l_orderkey = o_orderkey
    ),
    r AS (
      SELECT l_orderkey, l_linenumber, total_cents, base_cents,
             ROW_NUMBER() OVER (
               PARTITION BY l_orderkey ORDER BY rem DESC, l_linenumber
             ) AS rk,
             total_cents - SUM(base_cents) OVER (PARTITION BY l_orderkey)
               AS leftover
      FROM j
    )
    SELECT l_orderkey, l_linenumber,
           CAST(base_cents + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS alloc_cents
    FROM r
    """,
)
def q102_exact_allocation(spark, sf_dir):
    """Exact money allocation: split each order's total (in integer
    cents) across its lineitems proportional to quantity, using
    largest-remainder rounding so the per-order cent sum reconciles
    EXACTLY - the ETL op behind revenue attribution, where naive
    per-row rounding leaks cents.

    Scale: orders joins lineitem on the same key every window uses, so
    the shuffle is paid once and the two window passes (sum_q/leftover,
    remainder rank) reuse the partitioning. All arithmetic on integer
    cents except the shares themselves; the remainder rank tie-breaks
    by linenumber, so allocation is deterministic. The share split is
    PURE INTEGER on both engines (cents * qty DIV/%% sum_q - quantities
    are whole-valued, everything positive so trunc == floor, and the
    integer remainder orders identically to the fractional remainder
    within an order since the denominator is constant per order)."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("long").alias("qty"),
    )
    o = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("total_cents"),
    )
    wk = Window.partitionBy("l_orderkey")
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .withColumn("sum_q", F.sum("qty").over(wk))
        # NULLIF(sum_q, 0): zero-NET-quantity orders (r14
        # sign-cancellation census) have no proportional share -
        # allocation is NULL on both engines, stated identically in
        # the oracle's j CTE; a no-op in contract (sum_q > 0)
        .withColumn(
            "base_cents",
            F.expr("(total_cents * qty) DIV NULLIF(sum_q, 0)"),
        )
        .withColumn("rem", F.expr("(total_cents * qty) % NULLIF(sum_q, 0)"))
    )
    r = j.select(
        "l_orderkey",
        "l_linenumber",
        "total_cents",
        "base_cents",
        F.row_number()
        .over(wk.orderBy(F.desc("rem"), F.asc("l_linenumber")))
        .alias("rk"),
        (F.col("total_cents") - F.sum("base_cents").over(wk)).alias("leftover"),
    )
    return r.select(
        "l_orderkey",
        "l_linenumber",
        (
            F.col("base_cents")
            + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
        ).alias("alloc_cents"),
    )


@query(
    "q103_surrogate_keys",
    oracle="""
    SELECT p_partkey,
           -- NULLS FIRST matches Spark's asc default in the dimension
           -- row_number (r13 partial-records census)
           CAST(DENSE_RANK() OVER (
             ORDER BY p_brand NULLS FIRST, p_type NULLS FIRST
           ) AS BIGINT) AS brand_type_sk
    FROM part
    """,
)
def q103_surrogate_keys(spark, sf_dir):
    """Surrogate-key assignment: dense integer ids for the distinct
    (brand, type) dimension combinations, mapped back onto every part.
    The engine form never runs a window over the fact table (the
    oracle's DENSE_RANK is the *spec*, not the plan): distinct the
    dimension - dimension-sized, tiny - row_number it, broadcast the
    mapping back. At 100 TB the fact side stays a map stage; the only
    global sort is over the dimension values."""
    p = t(spark, sf_dir, "part")
    dim = (
        p.select("p_brand", "p_type")
        .distinct()
        .select(
            "*",
            F.row_number()
            .over(Window.orderBy("p_brand", "p_type"))
            .cast("long")
            .alias("brand_type_sk"),
        )
    )
    # null-safe join keys: a NULL brand/type combination is a real
    # dimension value with its own surrogate key, and a bare equi-join
    # would drop its fact rows (r13 partial-records census: 11 of 32
    # parts survived).
    return p.join(
        F.broadcast(dim.select(
            F.col("p_brand").alias("_b"),
            F.col("p_type").alias("_t"),
            "brand_type_sk",
        )),
        p["p_brand"].eqNullSafe(F.col("_b"))
        & p["p_type"].eqNullSafe(F.col("_t")),
    ).select("p_partkey", "brand_type_sk")


@query(
    "q108_user_entropy",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    tot AS (
      SELECT user_id, CAST(SUM(n) AS BIGINT) AS tn FROM c GROUP BY 1
    )
    SELECT c.user_id,
           tot.tn AS n_events,
           ROUND(-SUM((CAST(n AS DOUBLE) / tn)
                      * ln(CAST(n AS DOUBLE) / tn) / ln(2)), 6)
             AS entropy_bits
    FROM c JOIN tot USING (user_id)
    GROUP BY c.user_id, tot.tn
    """,
)
def q108_user_entropy(spark, sf_dir):
    """Shannon entropy of each user's event-type mix (bits): the
    behavioral-diversity metric - 0 for single-type users, log2(5) for
    a uniform mix.

    Scale: one shuffle to the (user, type) counts - bounded by
    |users| x |types| - then a per-user window total and a second tiny
    aggregate over at most |types| rows per user. The fact table is
    touched once."""
    ev = t(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    wu = Window.partitionBy("user_id")
    c = c.withColumn("tn", F.sum("n").over(wu))
    p = F.col("n").cast("double") / F.col("tn")
    term = p * F.log(p) / F.log(F.lit(2.0))
    return c.groupBy("user_id", F.col("tn").alias("n_events")).agg(
        F.round(-F.sum(term), 6).alias("entropy_bits")
    )


@query(
    "q109_median_abs_deviation",
    oracle="""
    WITH m AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY 1
    ),
    d AS (
      SELECT e.event_type, abs(e.value - m.med) AS ad
      FROM events e JOIN m USING (event_type)
    )
    SELECT d.event_type,
           ROUND((SELECT med FROM m WHERE m.event_type = d.event_type), 6)
             AS median_value,
           ROUND(quantile_cont(ad, 0.5), 6) AS mad
    FROM d GROUP BY d.event_type
    """,
)
def q109_median_abs_deviation(spark, sf_dir):
    """Median absolute deviation per event type - the robust dispersion
    measure (outlier-insensitive, unlike q64's stddev; pairs with
    q96's z-scores as the robust-z alternative).

    Scale: two exact-percentile aggregations with a 5-row broadcast
    join between them; the fact table is scanned twice (once per
    median pass), which is inherent to MAD's nested median. The 100 TB
    swap-in is approx_percentile for both passes (mergeable sketches,
    single-scan-each), identical plan shape."""
    ev = t(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("med")
    )
    d = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("ad"),
    )
    return d.groupBy("event_type").agg(
        F.round(F.first("med"), 6).alias("median_value"),
        F.round(F.percentile("ad", 0.5), 6).alias("mad"),
    )


@query(
    "q110_rank_distributions",
    oracle="""
    SELECT event_id, event_type, ROUND(value, 6) AS value,
           -- NULLS FIRST: Spark windows sort asc_nulls_first, DuckDB
           -- defaults NULLS LAST (r13 partial-records census)
           ROUND(PERCENT_RANK() OVER (
             PARTITION BY event_type
             ORDER BY value NULLS FIRST, event_id), 6) AS pr,
           ROUND(CUME_DIST() OVER (
             PARTITION BY event_type
             ORDER BY value NULLS FIRST, event_id), 6) AS cd
    FROM events
    """,
)
def q110_rank_distributions(spark, sf_dir):
    """PERCENT_RANK + CUME_DIST per event type (deterministic event_id
    tie-break): the remaining members of the ranking-window family next
    to q20 row_number / q58 ntile / q95 argmax.

    Scale: one shuffle on the partition key, one in-partition sort,
    both functions computed in the same Window operator pass."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return ev.select(
        "event_id",
        "event_type",
        F.round("value", 6).alias("value"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


@query(
    "q111_conditional_aggs",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
             AS n_purchase,
           CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT)
             AS n_error,
           ROUND(SUM(value) FILTER (WHERE event_type = 'purchase'), 2)
             AS purchase_value,
           ROUND(AVG(value) FILTER (WHERE event_type = 'view'), 6)
             AS avg_view
    FROM events GROUP BY user_id
    """,
)
def q111_conditional_aggs(spark, sf_dir):
    """Conditional aggregation (SQL FILTER clause): several
    differently-filtered aggregates in ONE pass - the sparse
    alternative to q27's pivot when only a few cells matter.

    Scale: a single map-side-combined hash aggregate; each FILTER is a
    codegen branch inside the aggregate, not a separate scan or join.
    Absent groups yield NULL (sum/avg) or 0 (count) identically in
    both engines."""
    ev = t(spark, sf_dir, "events")
    is_p = F.col("event_type") == "purchase"
    return ev.groupBy("user_id").agg(
        F.count(F.when(is_p, 1)).alias("n_purchase"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("n_error"),
        F.round(F.sum(F.when(is_p, F.col("value"))), 2).alias(
            "purchase_value"
        ),
        F.round(
            F.avg(F.when(F.col("event_type") == "view", F.col("value"))), 6
        ).alias("avg_view"),
    )


@query(
    "q113_quarterly_revenue",
    oracle="""
    SELECT CAST(date_trunc('quarter', o_orderdate) AS DATE) AS qtr_start,
           CAST(EXTRACT(QUARTER FROM o_orderdate) AS BIGINT) AS q_of_year,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 0) AS revenue
    FROM orders GROUP BY 1, 2
    """,
)
def q113_quarterly_revenue(spark, sf_dir):
    """Calendar-function rollup: revenue per quarter via
    ``date_trunc('quarter')`` + ``quarter()`` - the date-dimension
    breadth check (both engines agree on quarter boundaries without a
    calendar table).

    Scale: the quarter key is a projected expression, so this is an
    ordinary map-side-combined aggregate over a ~|years|x4 keyspace."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy(
        F.date_trunc("quarter", F.col("o_orderdate"))
        .cast("date")
        .alias("qtr_start"),
        F.quarter("o_orderdate").cast("long").alias("q_of_year"),
    ).agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 0).alias("revenue"),
    )


@query(
    "q117_zorder_key",
    oracle="""
    WITH b AS (
      SELECT l_orderkey, l_linenumber,
             l_partkey % 65536 AS px, l_suppkey % 65536 AS sx
      FROM lineitem
    )
    SELECT l_orderkey, l_linenumber,
           CAST((
             (((px >> 15) & 1) << 31)
             | (((sx >> 15) & 1) << 30)
             | (((px >> 14) & 1) << 29)
             | (((sx >> 14) & 1) << 28)
             | (((px >> 13) & 1) << 27)
             | (((sx >> 13) & 1) << 26)
             | (((px >> 12) & 1) << 25)
             | (((sx >> 12) & 1) << 24)
             | (((px >> 11) & 1) << 23)
             | (((sx >> 11) & 1) << 22)
             | (((px >> 10) & 1) << 21)
             | (((sx >> 10) & 1) << 20)
             | (((px >> 9) & 1) << 19)
             | (((sx >> 9) & 1) << 18)
             | (((px >> 8) & 1) << 17)
             | (((sx >> 8) & 1) << 16)
             | (((px >> 7) & 1) << 15)
             | (((sx >> 7) & 1) << 14)
             | (((px >> 6) & 1) << 13)
             | (((sx >> 6) & 1) << 12)
             | (((px >> 5) & 1) << 11)
             | (((sx >> 5) & 1) << 10)
             | (((px >> 4) & 1) << 9)
             | (((sx >> 4) & 1) << 8)
             | (((px >> 3) & 1) << 7)
             | (((sx >> 3) & 1) << 6)
             | (((px >> 2) & 1) << 5)
             | (((sx >> 2) & 1) << 4)
             | (((px >> 1) & 1) << 3)
             | (((sx >> 1) & 1) << 2)
             | (((px >> 0) & 1) << 1)
             | (((sx >> 0) & 1) << 0)
           ) AS BIGINT) AS zkey
    FROM b
    """,
)
def q117_zorder_key(spark, sf_dir):
    """Z-order (Morton) interleave key over (partkey, suppkey): the
    multi-dimensional clustering key behind Delta/Iceberg OPTIMIZE
    ZORDER. Sorting the table by ``zkey`` before writing co-locates
    rows close in BOTH dimensions into the same row groups, so
    min/max footer stats prune scans filtered on either column - the
    layout half of the pushdown story (cf. star.py's predicate twins).

    Scale: pure bit arithmetic in one codegen projection; the key is
    computed rowwise with no shuffle (the subsequent repartitionByRange
    on zkey - not part of the checkable query - is the one shuffle any
    re-layout pays)."""
    li = t(spark, sf_dir, "lineitem")
    px = (F.col("l_partkey") % 65536).cast("long")
    sx = (F.col("l_suppkey") % 65536).cast("long")
    z = F.lit(0).cast("long")
    for i in range(15, -1, -1):
        z = (
            z.bitwiseOR(
                F.shiftleft(F.shiftright(px, i).bitwiseAND(F.lit(1)), 2 * i + 1)
            ).bitwiseOR(
                F.shiftleft(F.shiftright(sx, i).bitwiseAND(F.lit(1)), 2 * i)
            )
        )
    return li.select("l_orderkey", "l_linenumber", z.alias("zkey"))


@query(
    "q118_equidepth_histogram",
    oracle="""
    WITH cuts AS (
      SELECT quantile_cont(o_totalprice, 0.25) AS c1,
             quantile_cont(o_totalprice, 0.50) AS c2,
             quantile_cont(o_totalprice, 0.75) AS c3
      FROM orders
    )
    SELECT CASE WHEN o_totalprice <= c1 THEN 0
                WHEN o_totalprice <= c2 THEN 1
                WHEN o_totalprice <= c3 THEN 2
                ELSE 3 END AS bucket,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           ROUND(MIN(o_totalprice), 2) AS lo,
           ROUND(MAX(o_totalprice), 2) AS hi
    FROM orders, cuts
    GROUP BY 1
    """,
)
def q118_equidepth_histogram(spark, sf_dir):
    """Equi-DEPTH histogram (quartile cutpoints -> bucket counts), the
    partner of q66's equi-width: first pass computes exact quantile
    cutpoints, second pass buckets every row against the broadcast
    1-row cutpoint frame - the two-phase shape that avoids q58's
    global NTILE sort entirely.

    Scale: pass 1 is an aggregate (the 100 TB swap-in is
    approx_percentile - mergeable, single scan); pass 2 is a broadcast
    join + codegen CASE - a map stage. Compare q58: same output
    semantics, no global sort."""
    o = t(spark, sf_dir, "orders")
    cuts = o.agg(
        F.percentile("o_totalprice", 0.25).alias("c1"),
        F.percentile("o_totalprice", 0.50).alias("c2"),
        F.percentile("o_totalprice", 0.75).alias("c3"),
    )
    bucket = (
        F.when(F.col("o_totalprice") <= F.col("c1"), 0)
        .when(F.col("o_totalprice") <= F.col("c2"), 1)
        .when(F.col("o_totalprice") <= F.col("c3"), 2)
        .otherwise(3)
    )
    return (
        o.crossJoin(F.broadcast(cuts))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


@query(
    "q119_quality_profile",
    oracle="""
    SELECT 'orders' AS tbl,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT) AS null_custkey,
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS ndv_status,
           CAST(COUNT(*) FILTER (WHERE o_totalprice <= 0) AS BIGINT)
             AS nonpositive_price,
           CAST(COUNT(*) FILTER (
             WHERE o_orderdate < TIMESTAMP '1990-01-01 00:00:00'
                OR o_orderdate > TIMESTAMP '2030-01-01 00:00:00') AS BIGINT)
             AS out_of_range_date,
           CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
             AS dup_keys
    FROM orders
    """,
)
def q119_quality_profile(spark, sf_dir):
    """Single-pass data-quality profile of a table: row count, null
    counts, NDV, domain violations (non-positive money, out-of-range
    dates), and key-uniqueness - the checks a pipeline gate runs
    before promoting a load (Deequ/Great-Expectations style), as ONE
    aggregate.

    Scale: every metric is algebraic or a distinct-count, computed in
    one scan + one shuffle; at 100 TB the two exact COUNT DISTINCTs
    swap to approx_count_distinct (q74) and the whole profile stays
    single-pass."""
    o = t(spark, sf_dir, "orders")
    return o.agg(
        F.lit("orders").alias("tbl"),
        F.count("*").alias("n_rows"),
        (F.count("*") - F.count("o_custkey")).alias("null_custkey"),
        F.count_distinct("o_orderstatus").alias("ndv_status"),
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).alias(
            "nonpositive_price"
        ),
        F.count(
            F.when(
                (F.col("o_orderdate") < F.lit("1990-01-01 00:00:00").cast("timestamp_ntz"))
                | (F.col("o_orderdate") > F.lit("2030-01-01 00:00:00").cast("timestamp_ntz")),
                1,
            )
        ).alias("out_of_range_date"),
        (F.count("*") - F.count_distinct("o_orderkey")).alias("dup_keys"),
    )


@query(
    "q120_topk_with_ties",
    oracle="""
    WITH r AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             DENSE_RANK() OVER (
               PARTITION BY o_custkey
               ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT) DESC
             ) AS rnk
      FROM orders
    )
    SELECT o_custkey, o_orderkey,
           ROUND(o_totalprice, 2) AS price,
           CAST(rnk AS BIGINT) AS rnk
    FROM r WHERE rnk <= 3
    """,
)
def q120_topk_with_ties(spark, sf_dir):
    """Top-3-per-group WITH ties (DENSE_RANK <= k): the
    ties-included complement of q20's row_number top-1 and q95's
    argmax - ranking on integer cents so tie groups are exact, not
    float-accidental.

    Scale: one shuffle + per-group sort; rank filters push into the
    Window via Spark's WindowGroupLimit (each partition stops
    after the k-th distinct rank instead of ranking all rows)."""
    o = t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    w = Window.partitionBy("o_custkey").orderBy(F.desc(cents))
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("price"),
            F.dense_rank().over(w).cast("long").alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
    )


@query(
    "q128_weekday_seasonality",
    oracle="""
    WITH d AS (
      SELECT event_type,
             CAST(EXTRACT(ISODOW FROM ts) AS BIGINT) AS iso_dow
      FROM events
    ),
    c AS (
      SELECT event_type, iso_dow, CAST(COUNT(*) AS BIGINT) AS n
      FROM d GROUP BY 1, 2
    )
    SELECT event_type, iso_dow, n,
           ROUND(n / (SUM(n) OVER (PARTITION BY event_type) / 7.0), 4)
             AS seasonality
    FROM c
    """,
)
def q128_weekday_seasonality(spark, sf_dir):
    """Weekday seasonality index per event type: each ISO weekday's
    event count relative to that type's uniform-week expectation
    (1.0 = flat; >1 = overrepresented day). ISO day-of-week
    (Mon=1..Sun=7) is the cross-engine-stable numbering - Spark's
    ``dayofweek`` starts Sunday=1, so the engine uses ``weekday()+1``
    (Mon=0-based) to match EXTRACT(ISODOW).

    Scale: one map-side-combined aggregate to a |types| x 7 grid; the
    normalizing window runs over that grid."""
    ev = t(spark, sf_dir, "events")
    iso_dow = (F.weekday(F.timestamp_micros(F.col("ts_us"))) + 1).cast(
        "long"
    )
    c = ev.groupBy(
        "event_type", iso_dow.alias("iso_dow")
    ).agg(F.count("*").alias("n"))
    wt = Window.partitionBy("event_type")
    return c.select(
        "event_type",
        "iso_dow",
        "n",
        F.round(F.col("n") / (F.sum("n").over(wt) / 7.0), 4).alias(
            "seasonality"
        ),
    )


@query(
    "q136_key_gap_audit",
    oracle="""
    WITH k AS (
      SELECT o_orderkey AS key,
             LEAD(o_orderkey) OVER (ORDER BY o_orderkey) AS next_key
      FROM orders
      WHERE o_orderkey % 97 <> 0
        AND o_orderkey NOT BETWEEN 1000 AND 1009
    )
    SELECT key + 1 AS gap_start,
           next_key - 1 AS gap_end,
           CAST(next_key - key - 1 AS BIGINT) AS n_missing
    FROM k WHERE next_key - key > 1
    """,
)
def q136_key_gap_audit(spark, sf_dir):
    """Sequence-gap audit: ranges of missing keys in a supposedly-dense
    id sequence (LEAD over the sorted keys; any step > 1 is a gap) -
    the load-completeness check that catches dropped batches and
    failed partitions after an ingest. The audited load is the orders
    table with a deterministic damage pattern (every 97th key plus the
    1000-1009 block removed - a simulated row-loss bug and one dropped
    batch), so the audit provably finds both gap shapes.

    Distributed form: gaps are a total-order property, but the LEAD
    never runs on one task - :func:`plans.common.global_lead` range
    partitions on the key, takes in-partition successors from a
    map-only Arrow pass, and patches each partition's tail row from
    the broadcast-sized set of next-partition head rows.  Exactly the
    'compare only the range fringes across partitions' plan the audit
    needs at 100 TB."""
    o = (
        t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderkey") % 97 != 0)
            & ~F.col("o_orderkey").between(1000, 1009)
        )
        .select(F.col("o_orderkey").alias("key"))
    )
    k = global_lead(o, ["key"], ["key"], k=1).withColumnRenamed(
        "_lead1_key", "next_key"
    )
    return k.filter(F.col("next_key") - F.col("key") > 1).select(
        (F.col("key") + 1).alias("gap_start"),
        (F.col("next_key") - 1).alias("gap_end"),
        (F.col("next_key") - F.col("key") - 1).alias("n_missing"),
    )


@query(
    "q137_mom_revenue_growth",
    oracle="""
    WITH m AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             SUM(o_totalprice) AS rev
      FROM orders GROUP BY 1
    )
    SELECT month,
           ROUND(rev, 0) AS revenue,
           -- NULLIF: growth relative to a ZERO-revenue month is
           -- undefined (r14 sign-cancellation census - refunds can
           -- net a month to exactly 0), stated NULL on both engines
           ROUND(rev / NULLIF(LAG(rev) OVER (ORDER BY month), 0) - 1, 4)
             AS mom_growth
    FROM m
    """,
)
def q137_mom_revenue_growth(spark, sf_dir):
    """Month-over-month revenue growth: LAG over the MONTHLY aggregate,
    never over the fact table - the period-comparison shape every
    reporting layer needs (the first month's growth is NULL, not 0).

    Scale: the heavy op is the map-side-combined monthly rollup; the
    growth window runs over |months| rows on a single post-aggregation
    partition, which is exactly where a tiny unpartitioned window is
    correct (cf. q92)."""
    o = t(spark, sf_dir, "orders")
    m = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias(
            "month"
        )
    ).agg(F.sum("o_totalprice").alias("rev"))
    w = Window.orderBy("month")
    return m.select(
        "month",
        F.round("rev", 0).alias("revenue"),
        # NULLIF parity with the oracle: a zero-revenue prior month
        # (sign-cancellation census) yields NULL growth, not an ANSI
        # divide-by-zero; no-op in contract (monthly revenue > 0)
        F.round(
            F.col("rev") / F.nullif(F.lag("rev").over(w), F.lit(0.0)) - 1,
            4,
        ).alias("mom_growth"),
    )


@query(
    "q139_bitmap_distinct",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS ndv_users
    FROM events GROUP BY event_type
    """,
)
def q139_bitmap_distinct(spark, sf_dir):
    """Exact distinct users per event type via Spark 4 bitmap
    aggregates instead of COUNT(DISTINCT).

    COUNT(DISTINCT) plans an Expand (one duplicated row per distinct
    spec) and carries every raw key through the shuffle; the bitmap
    form carries one <=4 KB bitmap per (group, 32k-id bucket) - partial
    bitmaps OR together map-side, so shuffle bytes scale with the
    *range* of ids per bucket, not the row count. At 100 TB this is the
    difference between shuffling 10^12 keys and shuffling compressed
    bitmap chunks (the roaring-bitmap trick, exact - unlike HLL).
    Two-level: bucket by id DIV 32768, bitmap positions within the
    bucket, then SUM per-bucket cardinalities per group."""
    ev = t(spark, sf_dir, "events")
    per_bucket = (
        ev.selectExpr(
            "event_type",
            "bitmap_bucket_number(user_id) AS bkt",
            "bitmap_bit_position(user_id) AS pos",
        )
        .groupBy("event_type", "bkt")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
    )
    return per_bucket.groupBy("event_type").agg(
        F.sum(F.expr("bitmap_count(bm)")).alias("ndv_users")
    )


@query(
    "q140_regr_stats",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(regr_slope(o_totalprice,
                 datediff('day', DATE '1992-01-01', o_orderdate)), 6)
             AS slope,
           ROUND(regr_intercept(o_totalprice,
                 datediff('day', DATE '1992-01-01', o_orderdate)), 4)
             AS intercept,
           ROUND(regr_r2(o_totalprice,
                 datediff('day', DATE '1992-01-01', o_orderdate)), 6)
             AS r2,
           ROUND(covar_samp(o_totalprice,
                   datediff('day', DATE '1992-01-01', o_orderdate))
                 / NULLIF(stddev_samp(o_totalprice) *
                   stddev_samp(datediff('day', DATE '1992-01-01',
                                        o_orderdate)), 0), 6)
             AS corr_xy
    FROM orders GROUP BY o_orderpriority
    """,
)
def q140_regr_stats(spark, sf_dir):
    """Per-priority OLS trend of order value over time via the SQL2003
    regression aggregates (regr_slope/intercept/r2 + corr) - closed-form
    single-pass linear fits, no ML library and no iteration.

    Scale: each regr_* is an algebraic aggregate (sums of x, y, xy, x2,
    y2 + count), so the whole fit is ONE map-side-combinable groupBy -
    the same shuffle cost as a COUNT. This is the 100 TB way to fit
    millions of per-group trend lines."""
    o = t(spark, sf_dir, "orders")
    x = F.datediff(F.col("o_orderdate"), F.lit("1992-01-01"))
    y = F.col("o_totalprice")
    return o.select(F.col("o_orderpriority"), x.alias("x"), y.alias("y")).groupBy(
        "o_orderpriority"
    ).agg(
        F.count("*").alias("n"),
        F.round(F.expr("regr_slope(y, x)"), 6).alias("slope"),
        F.round(F.expr("regr_intercept(y, x)"), 4).alias("intercept"),
        F.round(F.expr("regr_r2(y, x)"), 6).alias("r2"),
        # explicit guarded ratio, not native corr: Spark's corr
        # ANSI-errors on a zero-variance group (regr_* NULL cleanly;
        # corr is the one regression aggregate that divides inside) -
        # the r12 constant-value-corpus census class, same device as
        # q64's _CORR_USER.
        F.round(
            F.expr(
                "covar_samp(y, x)"
                " / NULLIF(stddev_samp(y) * stddev_samp(x), 0)"
            ),
            6,
        ).alias("corr_xy"),
    )


@query(
    "q143_winsorized_mean",
    oracle="""
    WITH b AS (
      SELECT o_orderpriority,
             quantile_cont(o_totalprice, 0.05) AS lo,
             quantile_cont(o_totalprice, 0.95) AS hi
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(FLOOR(AVG(o_totalprice)) AS BIGINT) AS raw_mean,
           CAST(FLOOR(AVG(LEAST(GREATEST(o_totalprice, lo), hi)))
                AS BIGINT) AS win_mean
    FROM orders o JOIN b USING (o_orderpriority)
    GROUP BY o.o_orderpriority
    """,
)
def q143_winsorized_mean(spark, sf_dir):
    """Winsorized mean per priority class: order values clamped to the
    group's [P05, P95] before averaging - the robust-mean treatment
    that stops a handful of whale orders from moving a KPI.

    Two aggregates: exact per-group percentiles first (tiny result, one
    row per group), broadcast back onto the fact for the clamp, then a
    plain map-side-combinable AVG. At 100 TB the percentile pass swaps
    to approx_percentile (t-digest, mergeable) and the plan shape is
    unchanged. Means are FLOORed to whole units: engines sum doubles in
    different orders, and floor's 1-unit granularity absorbs the ~1e-10
    relative difference (ROUND at .xx5 boundaries does not)."""
    o = t(spark, sf_dir, "orders").select("o_orderpriority", "o_totalprice")
    bounds = o.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.05)").alias("lo"),
        F.expr("percentile(o_totalprice, 0.95)").alias("hi"),
    )
    clamped = o.join(F.broadcast(bounds), "o_orderpriority").select(
        "o_orderpriority",
        "o_totalprice",
        F.least(F.greatest(F.col("o_totalprice"), F.col("lo")), F.col("hi")).alias(
            "w"
        ),
    )
    return clamped.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.floor(F.avg("o_totalprice")).alias("raw_mean"),
        F.floor(F.avg("w")).alias("win_mean"),
    )


@query(
    "q147_quarantine_split",
    oracle="""
    WITH v AS (
      SELECT event_id,
             CASE WHEN value > 300 THEN 1 ELSE 0 END AS bad_value,
             CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS bad_type,
             CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT)
                       > 90 THEN 1 ELSE 0 END AS bad_props
      FROM events
    )
    SELECT event_id,
           CASE WHEN bad_value + bad_type + bad_props = 0
                THEN 'ok' ELSE 'quarantine' END AS disposition,
           concat_ws(',',
             CASE WHEN bad_value = 1 THEN 'VALUE_RANGE' END,
             CASE WHEN bad_type  = 1 THEN 'ERROR_TYPE' END,
             CASE WHEN bad_props = 1 THEN 'PROPS_RANGE' END) AS reasons
    FROM v
    """,
)
def q147_quarantine_split(spark, sf_dir):
    """Validation / dead-letter routing: every event is checked against
    the ingest ruleset (value range, type allowlist, payload bounds)
    and tagged ok/quarantine with the full list of violated rule codes
    - the split an ETL pipeline writes to its quarantine table so bad
    rows are preserved and explainable, never silently dropped.

    One codegen map pass, zero shuffle: each rule is a boolean column,
    disposition is their disjunction, and the reason list is a
    concat_ws over the rule tags (empty string == clean). At 100 TB
    this runs at scan speed and the downstream writer partitions by
    ``disposition``."""
    ev = t(spark, sf_dir, "events")
    bad_value = F.col("value") > 300
    bad_type = F.col("event_type") == "error"
    bad_props = (
        F.from_json(F.col("props"), "k BIGINT").getField("k") > 90
    )
    # when(cond, 1).otherwise(0), NOT cond.cast(int): a NULL rule
    # input (missing value/type/props on a partial record) is not a
    # range violation - the oracle's CASE falls to ELSE 0, while a
    # NULL cast would poison the sum and quarantine every partial row
    # (r13 partial-records census).
    n_bad = (
        F.when(bad_value, 1).otherwise(0)
        + F.when(bad_type, 1).otherwise(0)
        + F.when(bad_props, 1).otherwise(0)
    )
    return ev.select(
        "event_id",
        F.when(n_bad == 0, F.lit("ok")).otherwise(F.lit("quarantine")).alias(
            "disposition"
        ),
        F.concat_ws(
            ",",
            F.when(bad_value, F.lit("VALUE_RANGE")),
            F.when(bad_type, F.lit("ERROR_TYPE")),
            F.when(bad_props, F.lit("PROPS_RANGE")),
        ).alias("reasons"),
    )


@query(
    "q148_benford_audit",
    oracle="""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT)
                              AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM orders WHERE o_totalprice >= 1
    )
    SELECT digit,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(COUNT(*) AS DOUBLE)
                 / (SELECT COUNT(*) FROM d), 6) AS obs_share,
           ROUND(log10(1 + 1.0 / digit), 6) AS benford_share
    FROM d GROUP BY digit
    """,
)
def q148_benford_audit(spark, sf_dir):
    """Benford's-law first-digit audit over order values: observed
    leading-digit shares vs the log10(1+1/d) expectation - the
    classic fabricated-data / broken-feed smell test an ingest
    pipeline runs as a data-quality canary.

    The leading digit comes from the integer part's decimal string
    (FLOOR then cast), not from log10 arithmetic, whose float rounding
    misclassifies exact powers of ten. Two tiny aggregates (9-row
    digit histogram + scalar total, joined by Catalyst as a scalar
    subquery) - map-side combinable, shuffle carries 9 rows."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    d = o.select(
        F.substring(
            F.floor("o_totalprice").cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("digit")
    )
    total = d.count()
    return d.groupBy("digit").agg(
        F.count("*").alias("n"),
        F.round(F.count("*") / F.lit(float(total)), 6).alias("obs_share"),
        F.round(F.log10(1 + 1.0 / F.col("digit")), 6).alias("benford_share"),
    )


@query(
    "q149_percentile_disc",
    oracle="""
    SELECT event_type,
           ROUND(quantile_disc(value, 0.25), 6) AS p25,
           ROUND(quantile_disc(value, 0.50), 6) AS p50,
           ROUND(quantile_disc(value, 0.75), 6) AS p75,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
)
def q149_percentile_disc(spark, sf_dir):
    """Discrete (non-interpolated) percentiles per group:
    PERCENTILE_DISC returns an actual observed value - required when
    the metric must be a real latency/price that occurred, not a
    synthetic midpoint (the q39 percentile is the interpolated CONT
    flavor; both engines agree on the lower-bound tie rule).

    Exact disc percentiles sort per group; the 100 TB swap is the same
    as q39's (approx_percentile t-digest) with identical API shape."""
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(
            F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY value)"), 6
        ).alias("p25"),
        F.round(
            F.expr("percentile_disc(0.50) WITHIN GROUP (ORDER BY value)"), 6
        ).alias("p50"),
        F.round(
            F.expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY value)"), 6
        ).alias("p75"),
        F.count("*").alias("n"),
    )


@query(
    "q153_cumulative_distinct",
    oracle=f"""
    WITH f AS (
      SELECT user_id,
             MIN(epoch_us(ts) // {86_400_000_000}) AS first_day
      FROM events GROUP BY user_id
    ), d AS (
      SELECT first_day AS day_idx,
             CAST(COUNT(*) AS BIGINT) AS new_users
      FROM f GROUP BY first_day
    )
    SELECT day_idx, new_users,
           CAST(SUM(new_users) OVER (
             ORDER BY day_idx
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cum_users
    FROM d
    """,
)
def q153_cumulative_distinct(spark, sf_dir):
    """Cumulative distinct users by day - the 'total unique customers
    to date' growth curve. The naive formulation (COUNT(DISTINCT) over
    an expanding window) re-deduplicates the entire history per day,
    O(days x users); the scale-safe decomposition is first-touch
    attribution: a user contributes exactly once, on their first day,
    so cumulative distinct == running SUM of per-day first-seen
    counts.

    Two map-side-combinable aggregates + one window over the tiny
    day-level series. At 100 TB the heavy groupBy(user) shuffles once
    and everything after is metadata-sized."""
    ev = t(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.expr("MIN(ts_us DIV 86400000000)").alias("first_day")
    )
    d = first.groupBy(F.col("first_day").alias("day_idx")).agg(
        F.count("*").alias("new_users")
    )
    w = Window.orderBy("day_idx").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return d.select(
        "day_idx", "new_users", F.sum("new_users").over(w).alias("cum_users")
    )


@query(
    "q154_peak_concurrency",
    oracle=f"""
    WITH pts AS (
      SELECT epoch_us(ts) AS t, 1 AS delta FROM events
      UNION ALL
      SELECT epoch_us(ts) + 300000000 AS t, -1 AS delta FROM events
    ), sweep AS (
      SELECT t, delta,
             SUM(delta) OVER (
               ORDER BY t, delta
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS live
      FROM pts
    )
    SELECT CAST(t // {86_400_000_000} AS BIGINT) AS day_idx,
           CAST(MAX(live) AS BIGINT) AS peak_live
    FROM sweep GROUP BY 1
    """,
)
def q154_peak_concurrency(spark, sf_dir):
    """Peak concurrency per day: how many 5-minute activity intervals
    are simultaneously open - the capacity-planning sweep behind 'max
    concurrent sessions/streams/connections'.

    Classic sweep-line as dataflow: every interval emits +1 at its
    start and -1 at its end, one global running sum ordered by
    (time, delta) gives the live count at every boundary ([start, end)
    semantics: the -1 sorts first at equal timestamps), and a per-day
    MAX collapses the sweep.

    Distributed form: the running sum is
    :func:`plans.common.global_cumsum` - a range exchange on
    (t, delta), per-partition partial sums from a map-only Arrow pass,
    and driver-folded partition offsets - i.e. the 'shard by coarse
    time range + prefix-offset pass' plan spelled out, with no
    single-partition WindowExec anywhere.  Equal (t, delta) points
    colocate by the range-partitioner contract, so the ROWS-frame
    prefix is exact under duplicates."""
    ev = t(spark, sf_dir, "events").select("ts_us")
    pts = ev.select(
        F.col("ts_us").alias("t"), F.lit(1).alias("delta")
    ).unionAll(
        ev.select(
            (F.col("ts_us") + F.lit(300_000_000)).alias("t"),
            F.lit(-1).alias("delta"),
        )
    )
    sweep, _, _ = global_cumsum(
        pts, ["t", "delta"], sums=[("delta", "live")]
    )
    return sweep.groupBy(
        F.expr("t DIV 86400000000").alias("day_idx")
    ).agg(F.max("live").alias("peak_live"))


@query(
    "q155_weighted_median",
    oracle="""
    WITH w AS (
      SELECT o.o_orderpriority, o.o_orderkey, o.o_totalprice,
             CAST(COUNT(*) AS BIGINT) AS wt
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderpriority, o.o_orderkey, o.o_totalprice
    ), c AS (
      SELECT o_orderpriority, o_totalprice, wt,
             SUM(wt) OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_totalprice, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum,
             SUM(wt) OVER (PARTITION BY o_orderpriority) AS total
      FROM w
    ), hit AS (
      SELECT o_orderpriority, o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_totalprice, cum
             ) AS rk
      FROM c WHERE 2 * cum >= total
    )
    SELECT o_orderpriority,
           ROUND(o_totalprice, 2) AS weighted_median
    FROM hit WHERE rk = 1
    """,
)
def q155_weighted_median(spark, sf_dir):
    """Weighted median order value per priority, weighted by lineitem
    count - the 'median dollar-weighted by volume' statistic no engine
    ships as a built-in. The first order value whose cumulative weight
    reaches half the group total is the answer; ordering carries the
    order key so equal values cross the threshold at a deterministic
    row in both engines.

    One join+count for weights, one window per group for the
    cumulative, one group-limit pick. At 100 TB the weight aggregate
    combines map-side and the window shuffles once on the group key -
    same shape as every percentile in the suite."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    wts = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority", "o_orderkey", "o_totalprice")
        .agg(F.count("*").alias("wt"))
    )
    wcum = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wtot = Window.partitionBy("o_orderpriority")
    c = wts.select(
        "o_orderpriority",
        "o_totalprice",
        F.sum("wt").over(wcum).alias("cum"),
        F.sum("wt").over(wtot).alias("total"),
    ).filter(2 * F.col("cum") >= F.col("total"))
    pick = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "cum")
    return (
        c.withColumn("rk", F.row_number().over(pick))
        .filter(F.col("rk") == 1)
        .select(
            "o_orderpriority",
            F.round("o_totalprice", 2).alias("weighted_median"),
        )
    )


@query(
    "q160_rfm_segmentation",
    oracle="""
    WITH base AS (
      SELECT o_custkey AS custkey,
             MAX(CAST(o_orderdate AS DATE)) AS last_day,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             ROUND(SUM(o_totalprice), 0) AS monetary
      FROM orders GROUP BY o_custkey
    )
    SELECT custkey, frequency, monetary,
           CAST(NTILE(5) OVER (ORDER BY last_day DESC, custkey)
                AS BIGINT) AS r_score,
           CAST(NTILE(5) OVER (ORDER BY frequency DESC, custkey)
                AS BIGINT) AS f_score,
           CAST(NTILE(5) OVER (ORDER BY monetary DESC, custkey)
                AS BIGINT) AS m_score,
           concat(
             NTILE(5) OVER (ORDER BY last_day DESC, custkey), '-',
             NTILE(5) OVER (ORDER BY frequency DESC, custkey), '-',
             NTILE(5) OVER (ORDER BY monetary DESC, custkey)
           ) AS segment
    FROM base
    """,
)
def q160_rfm_segmentation(spark, sf_dir):
    """RFM customer segmentation: recency / frequency / monetary
    quintiles (1 = best) and the concatenated segment label ('1-1-1' =
    champions) - the marketing-analytics workhorse.

    One aggregate over orders, then three global NTILEs over the
    customer-level result via :func:`plans.common.global_ntile` -
    each is a range exchange + pure-JVM ordinal numbering + the
    exact NTILE formula, never a single-partition WindowExec, so the
    plan holds for billions of customers.  Ties carry custkey so
    quintile boundaries are deterministic in both engines.  The base
    aggregate is persisted so the three ranking passes (and their
    per-partition stats jobs) scan it once."""
    o = t(spark, sf_dir, "orders")
    base = transient_persist(
        o.groupBy(F.col("o_custkey").alias("custkey")).agg(
            F.max(F.col("o_orderdate").cast("date")).alias("last_day"),
            F.count("*").alias("frequency"),
            F.round(F.sum("o_totalprice"), 0).alias("monetary"),
        )
    )
    # each pass's output feeds the next pass's range exchange, which
    # executes its input twice (boundary sampling + the exchange);
    # persisting between passes keeps that to one Arrow pass each.
    d = transient_persist(global_ntile(
        base, [F.desc("last_day"), F.asc("custkey")], 5, "r_score"
    ))
    d = transient_persist(global_ntile(
        d, [F.desc("frequency"), F.asc("custkey")], 5, "f_score"
    ))
    d = global_ntile(
        d, [F.desc("monetary"), F.asc("custkey")], 5, "m_score"
    )
    return d.select(
        "custkey",
        "frequency",
        "monetary",
        "r_score",
        "f_score",
        "m_score",
        F.concat_ws("-", "r_score", "f_score", "m_score").alias("segment"),
    )


# ---------------------------------------------------------------------------
# q172/q174: time-RANGE window frames and incremental aggregate merge
# ---------------------------------------------------------------------------


@query(
    "q172_time_range_moving_avg",
    oracle="""
    SELECT event_id, user_id, epoch_us(ts) AS ts_us,
           ROUND(AVG(value) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
           ), 4) AS hourly_avg,
           CAST(COUNT(*) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_in_window
    FROM events
    """,
)
def q172_time_range_moving_avg(spark, sf_dir):
    """Time-based RANGE window frame: each event's trailing-one-hour
    average over an IRREGULAR event series - the frame is bounded by
    event-time distance, not row count (q59's ROWS frame is the
    row-count twin). Peers at the same timestamp enter the frame
    together in both engines, which is what makes the result
    well-defined under ties.

    Scale: one shuffle on user_id + an in-partition sort on ts_us;
    Spark evaluates the sliding RANGE frame incrementally (two
    pointers over the sorted run), never materializing per-row frame
    copies. The frame bound is integer micros on ts_us, so the
    semantics are tz-free and exact."""
    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts_us",
        F.round(F.avg("value").over(w), 4).alias("hourly_avg"),
        F.count("*").over(w).alias("n_in_window"),
    )


@query(
    "q174_partial_agg_merge",
    oracle=f"""
    -- exact-decimal sums + INTEGER half-up rounding for the average:
    -- the engines' ROUND() disagree on exact .5 ties over doubles
    -- (caught by the sf0.001 sweep: avg 38.37875 -> 38.3788 Spark
    -- HALF_UP vs 38.3787 DuckDB), so the avg is reported in exact
    -- micro-units via (2a + c) DIV (2c), pure integer arithmetic.
    SELECT {EPOCH_DAY_SQL} AS day_idx,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE), 2)
             AS total_value,
           CAST((2 * CAST(SUM(CAST(value AS DECIMAL(20,6))) * 1000000
                          AS BIGINT) + COUNT(*))
                // (2 * COUNT(*)) AS BIGINT) AS avg_value_micro
    FROM events GROUP BY day_idx, event_type
    """,
)
def q174_partial_agg_merge(spark, sf_dir):
    """Incremental materialized-view maintenance: the daily rollup is
    produced by MERGING two independently-computed partial aggregates
    (history: ts < anchor; delta: ts >= anchor) instead of
    re-aggregating the raw history - sum the counts, sum the sums,
    and derive AVG from the merged pair (never average averages). The
    oracle is the full recompute, pinning the algebraic-merge
    equivalence.

    Scale: THE incremental pattern for a 100 TB fact with a daily
    arrival slice - history partials are a compact table keyed by
    (day, type) that is never rebuilt; each batch aggregates only its
    delta and merges in O(|partials|). The merge is a union + one
    re-aggregation of two already-aggregated inputs (kilobytes), and
    both partials push their time-slice predicate into the scan."""
    ev = t(spark, sf_dir, "events")
    day_idx = F.floor(
        (F.col("ts_us") - F.lit(EVENTS_EPOCH_US)) / F.lit(86_400_000_000)
    ).alias("day_idx")

    # value sums ride DECIMAL(20,6): exact and order-independent, so
    # the merged total and the full recompute agree to the BIT in both
    # engines (a double sum's order noise once landed an avg exactly
    # on a 4dp rounding boundary - caught by the sf0.001 sweep).
    def partial(df):
        return df.groupBy(day_idx, "event_type").agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("value").cast("decimal(20,6)")).alias("sv"),
        )

    from ..sources.star import ANCHOR_US

    history = partial(ev.filter(F.col("ts_us") < ANCHOR_US))
    delta = partial(ev.filter(F.col("ts_us") >= ANCHOR_US))
    return (
        history.unionByName(delta)
        .groupBy("day_idx", "event_type")
        .agg(
            F.sum("cnt").alias("cnt"),
            F.round(F.sum("sv").cast("double"), 2).alias("total_value"),
            (F.sum("sv") * 1_000_000).cast("long").alias("_sm"),
        )
        .withColumn(
            "avg_value_micro",
            F.expr("(2 * _sm + cnt) DIV (2 * cnt)").cast("long"),
        )
        .drop("_sm")
    )


@query(
    "q183_since_last_purchase",
    oracle="""
    WITH ev AS (
      SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts), event_id) AS rn
      FROM events
    )
    SELECT event_id, user_id, ts_us,
           CAST(rn - COALESCE(LAST_VALUE(
             CASE WHEN event_type = 'purchase' THEN rn END IGNORE NULLS
           ) OVER (PARTITION BY user_id ORDER BY rn
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), rn)
             AS BIGINT) AS events_since_purchase,
           ts_us - LAST_VALUE(
             CASE WHEN event_type = 'purchase' THEN ts_us END IGNORE NULLS
           ) OVER (PARTITION BY user_id ORDER BY rn
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS us_since_purchase
    FROM ev
    """,
)
def q183_since_last_purchase(spark, sf_dir):
    """Carry-forward window (LAST_VALUE ... IGNORE NULLS): for every
    event, how many events and how much time since the user's most
    recent purchase - purchases themselves read 0, pre-first-purchase
    rows read NULL time (nothing to measure against) and a 0 count by
    the COALESCE-to-self convention. The carry-forward idiom is the
    standard way to propagate the 'last seen marker' down an ordered
    partition without a self-join.

    Scale: one shuffle on user_id, one in-partition sort shared by the
    row-numbering and both carry-forward frames (Spark plans all three
    in a single Window node); the frame is running (unbounded
    preceding), so evaluation is a constant-state sweep, never a
    per-row re-scan."""
    ev = t(spark, sf_dir, "events")
    w_rn = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    rn = ev.select(
        "event_id",
        "user_id",
        "ts_us",
        "event_type",
        F.row_number().over(w_rn).alias("rn"),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_prn = F.last(
        F.when(F.col("event_type") == "purchase", F.col("rn")),
        ignorenulls=True,
    ).over(w_run)
    last_pts = F.last(
        F.when(F.col("event_type") == "purchase", F.col("ts_us")),
        ignorenulls=True,
    ).over(w_run)
    return rn.select(
        "event_id",
        "user_id",
        "ts_us",
        (F.col("rn") - F.coalesce(last_prn, F.col("rn")))
        .cast("long")
        .alias("events_since_purchase"),
        (F.col("ts_us") - last_pts).alias("us_since_purchase"),
    )


@query(
    "q186_longest_streak",
    oracle=f"""
    WITH days AS (
      SELECT DISTINCT user_id,
             {EPOCH_DAY_SQL} AS day_idx
      FROM events
    ),
    grp AS (
      SELECT user_id, day_idx,
             day_idx - ROW_NUMBER() OVER (PARTITION BY user_id
                                          ORDER BY day_idx) AS anchor
      FROM days
    ),
    streaks AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS len,
             MIN(day_idx) AS start_day
      FROM grp GROUP BY user_id, anchor
    )
    SELECT user_id,
           MAX(len) AS longest_streak,
           CAST(ARG_MIN(start_day, -len * 100000 + start_day) AS BIGINT)
             AS streak_start_day,
           CAST(COUNT(*) AS BIGINT) AS n_streaks
    FROM streaks GROUP BY user_id
    """,
)
def q186_longest_streak(spark, sf_dir):
    """Longest consecutive-day activity streak per user - the classic
    gaps-and-islands on CALENDAR days: distinct active days, then
    ``day - row_number`` is constant within a consecutive run, so one
    group-by collapses each run. Tie on equal-length streaks resolves
    to the earliest start via a UNIQUE arg_min key (-len scaled plus
    start_day): a bare -len key leaves the choice among equal-length
    streaks engine-dependent - caught by the oracle on first run.

    Scale: the distinct (user, day) projection collapses the fact
    first (the only wide shuffle); the row_number and both
    aggregations share the user_id partitioning. No self-join, no
    sequence explode - the O(rows) island trick is exactly what
    replaces the naive 'join each day to the next' quadratic form."""
    ev = t(spark, sf_dir, "events")
    days = ev.select(
        "user_id",
        F.floor(
            (F.col("ts_us") - F.lit(EVENTS_EPOCH_US))
            / F.lit(86_400_000_000)
        ).alias("day_idx"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day_idx")
    grp = days.withColumn(
        "anchor", F.col("day_idx") - F.row_number().over(w)
    )
    streaks = grp.groupBy("user_id", "anchor").agg(
        F.count("*").alias("len"), F.min("day_idx").alias("start_day")
    )
    return streaks.groupBy("user_id").agg(
        F.max("len").alias("longest_streak"),
        F.min_by(
            "start_day",
            (-F.col("len")) * F.lit(100_000) + F.col("start_day"),
        )
        .cast("long")
        .alias("streak_start_day"),
        F.count("*").alias("n_streaks"),
    )


@query(
    "q187_cooccurrence_lift",
    oracle=f"""
    WITH baskets AS (
      SELECT DISTINCT user_id,
             {EPOCH_DAY_SQL} AS day_idx,
             event_type
      FROM events
    ),
    n_baskets AS (
      SELECT COUNT(DISTINCT (user_id, day_idx)) AS nb FROM baskets
    ),
    singles AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM baskets GROUP BY event_type
    ),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(COUNT(*) AS BIGINT) AS n_ab
      FROM baskets a
      JOIN baskets b ON a.user_id = b.user_id AND a.day_idx = b.day_idx
                    AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT p.type_a, p.type_b, p.n_ab,
           ROUND(p.n_ab / CAST(nb.nb AS DOUBLE), 6) AS support,
           ROUND(p.n_ab / CAST(sa.n AS DOUBLE), 6) AS confidence_a_b,
           ROUND(p.n_ab * nb.nb / (CAST(sa.n AS DOUBLE) * sb.n), 4)
             AS lift
    FROM pairs p, n_baskets nb
    JOIN singles sa ON sa.event_type = p.type_a
    JOIN singles sb ON sb.event_type = p.type_b
    """,
)
def q187_cooccurrence_lift(spark, sf_dir):
    """Market-basket co-occurrence: support / confidence / lift for
    every event-type pair sharing a (user, day) basket - the
    association-rules primitives behind 'users who X also Y'.

    Scale: baskets collapse to DISTINCT (user, day, type) first, so
    the pair self-join fans out at most |types| rows per basket - the
    blow-up is bounded by the TYPE vocabulary (9 here), never by raw
    event volume; the canonical a<b orientation halves it. Singles
    and the basket count are broadcast scalars against the tiny pair
    table. For an unbounded item vocabulary this becomes the FP-growth
    candidate-pruning pipeline; for a bounded one, this exact form IS
    the scale answer."""
    ev = t(spark, sf_dir, "events")
    day = F.floor(
        (F.col("ts_us") - F.lit(EVENTS_EPOCH_US)) / F.lit(86_400_000_000)
    ).alias("day_idx")
    baskets = ev.select("user_id", day, "event_type").distinct()
    nb = baskets.select("user_id", "day_idx").distinct().count()
    singles = baskets.groupBy("event_type").agg(F.count("*").alias("n"))
    a = baskets.select(
        "user_id", "day_idx", F.col("event_type").alias("type_a")
    )
    b = baskets.select(
        "user_id", "day_idx", F.col("event_type").alias("type_b")
    )
    pairs = (
        a.join(b, ["user_id", "day_idx"])
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_ab"))
    )
    sa = F.broadcast(
        singles.select(
            F.col("event_type").alias("type_a"), F.col("n").alias("na")
        )
    )
    sb = F.broadcast(
        singles.select(
            F.col("event_type").alias("type_b"), F.col("n").alias("nb_")
        )
    )
    return (
        pairs.join(sa, "type_a")
        .join(sb, "type_b")
        .select(
            "type_a",
            "type_b",
            "n_ab",
            F.round(F.col("n_ab") / F.lit(float(nb)), 6).alias("support"),
            F.round(
                F.col("n_ab") / F.col("na").cast("double"), 6
            ).alias("confidence_a_b"),
            F.round(
                F.col("n_ab")
                * F.lit(nb)
                / (F.col("na").cast("double") * F.col("nb_")),
                4,
            ).alias("lift"),
        )
    )


@query(
    "q199_union_by_name",
    oracle="""
    WITH a AS (
      SELECT o_orderkey, o_totalprice, o_orderpriority
      FROM orders WHERE o_orderkey % 2 = 0
    ),
    b AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 2 = 1
    ),
    u AS (
      SELECT o_orderkey, o_totalprice, o_orderpriority, NULL AS o_orderstatus
      FROM a
      UNION ALL BY NAME
      SELECT * FROM b
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(o_orderpriority) AS BIGINT) AS with_priority,
           CAST(COUNT(o_orderstatus) AS BIGINT) AS with_status,
           ROUND(SUM(o_totalprice), 0) AS total
    FROM u
    """,
)
def q199_union_by_name(spark, sf_dir):
    """Schema-drift union: two extracts of the same table with
    DIFFERENT column sets combined by NAME with null-fill
    (unionByName(allowMissingColumns=True)) - the append that happens
    every time a pipeline version adds a column and history must
    still union with today. Positional UNION would silently misalign
    (priority under status); by-name with null-fill is the safe
    contract, and the null counts per origin prove the fill.

    Scale: the union is a zero-cost plan node (no shuffle - both
    children just project to the widened schema); the single
    aggregate is one pass."""
    o = t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    b = o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    u = a.unionByName(b, allowMissingColumns=True)
    return u.agg(
        F.count("*").alias("n_rows"),
        F.count("o_orderpriority").alias("with_priority"),
        F.count("o_orderstatus").alias("with_status"),
        F.round(F.sum("o_totalprice"), 0).alias("total"),
    )


@query(
    "q200_ks_drift",
    oracle="""
    WITH tagged AS (
      SELECT n_chars,
             CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS t0,
             CASE WHEN source = 'src1' THEN 1 ELSE 0 END AS t1
      FROM documents WHERE source IN ('src0', 'src1')
    ),
    tot AS (
      SELECT SUM(t0) AS n0, SUM(t1) AS n1 FROM tagged
    ),
    cdf AS (
      SELECT n_chars,
             SUM(t0) OVER (ORDER BY n_chars) AS c0,
             SUM(t1) OVER (ORDER BY n_chars) AS c1
      FROM tagged
    )
    SELECT (SELECT CASE WHEN tot.n0 > 0 AND tot.n1 > 0
                   THEN ROUND(MAX(ABS(c0 / CAST(n0 AS DOUBLE)
                                      - c1 / CAST(n1 AS DOUBLE))), 6)
                   END
            FROM cdf, tot GROUP BY tot.n0, tot.n1) AS ks_stat,
           (SELECT CAST(COALESCE(SUM(t0), 0) AS BIGINT) FROM tagged)
             AS n_src0,
           (SELECT CAST(COALESCE(SUM(t1), 0) AS BIGINT) FROM tagged)
             AS n_src1
    """,
)
def q200_ks_drift(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov statistic between two sources'
    document-length distributions - the numeric drift detector next
    to q116's categorical chi-square: D = max |F_src0(x) - F_src1(x)|
    over the pooled sample, computed exactly via running per-tag
    counts on one global sort (ties collapse correctly because the
    running sums are evaluated per ORDER-BY peer group - RANGE frame
    semantics - in both engines).

    Distributed form: the CDF difference only changes at distinct
    n_chars values, so the fact rows first collapse to per-value tag
    counts (one map-side-combined shuffle), and the running CDF runs
    over the DISTINCT-VALUE relation via
    :func:`plans.common.global_cumsum` - range exchange + map-only
    Arrow prefix + driver-folded offsets, no single-partition
    WindowExec.  A ROWS prefix over unique keys IS the RANGE-frame
    (peer-group) semantics of the oracle; the grand totals come back
    as plan-time literals, replacing the old 1-row broadcast join."""
    docs = t(spark, sf_dir, "documents").filter(
        F.col("source").isin("src0", "src1")
    )
    per_key = docs.groupBy("n_chars").agg(
        F.sum((F.col("source") == "src0").cast("long")).alias("kt0"),
        F.sum((F.col("source") == "src1").cast("long")).alias("kt1"),
    )
    cdf, _, tot = global_cumsum(
        per_key, ["n_chars"], sums=[("kt0", "c0"), ("kt1", "c1")]
    )
    n0, n1 = tot["c0"], tot["c1"]
    # degenerate-input totality (r11 empty-corpus census): with either
    # source empty the statistic is undefined - NULL on both engines
    # (the oracle's CASE WHEN n0 > 0 AND n1 > 0) instead of an ANSI
    # division error here / a NULL-vs-0 desync on the counts; the
    # totals are plan-time driver constants, so the guard folds away
    # entirely on real data.
    if n0 > 0 and n1 > 0:
        ks = F.round(
            F.max(
                F.abs(
                    F.col("c0") / F.lit(float(n0))
                    - F.col("c1") / F.lit(float(n1))
                )
            ),
            6,
        )
    else:
        ks = F.max(F.lit(None).cast("double"))
    return cdf.agg(
        ks.alias("ks_stat"),
        F.lit(n0).cast("long").alias("n_src0"),
        F.lit(n1).cast("long").alias("n_src1"),
    )


# ---------------------------------------------------------------------------
# q201-q203: the distributed total-order family (global rank statistics
# with no single-partition WindowExec - all built on plans/common.py's
# range-partitioned two-pass primitives)
# ---------------------------------------------------------------------------


@query(
    "q201_global_percent_rank",
    oracle="""
    SELECT o_orderkey,
           -- NULLS FIRST pins the engines' shared total order: Spark's
           -- range exchange sorts asc_nulls_first, DuckDB windows
           -- default NULLS LAST (r13 partial-records census)
           ROUND(PERCENT_RANK() OVER (
             ORDER BY o_totalprice NULLS FIRST, o_orderkey), 6) AS pct_rank
    FROM orders
    """,
)
def q201_global_percent_rank(spark, sf_dir):
    """Exact global PERCENT_RANK over every order - the 'where does
    this row sit in the whole distribution' statistic feature stores
    emit per entity. PERCENT_RANK(rn) = (rn - 1) / (T - 1) with a
    unique tie-break, so the global row number from
    :func:`plans.common.global_rn` (range exchange + JVM ordinal ids +
    broadcast offsets - no Python stage at all) and the plan-time
    total T are all it needs; no row ever visits a single-partition
    window."""
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    d, total = global_rn(o, ["o_totalprice", "o_orderkey"], rn_col="_rn")
    denom = float(max(total - 1, 1))
    return d.select(
        "o_orderkey",
        F.round((F.col("_rn") - 1) / F.lit(denom), 6).alias("pct_rank"),
    )


@query(
    "q202_exact_global_median",
    oracle="""
    SELECT ROUND(MEDIAN(o_totalprice), 2) AS median_price,
           CAST(COUNT(o_totalprice) AS BIGINT) AS n_orders
    FROM orders
    """,
)
def q202_exact_global_median(spark, sf_dir):
    """EXACT global median (not approxQuantile): with the global row
    number in hand, the median is just the middle row(s) - rn in
    {floor((T+1)/2), floor(T/2)+1}, averaged when T is even, which is
    DuckDB's MEDIAN interpolation exactly. The heavy lifting is the
    one range exchange; the middle-row filter is a map stage. The
    same shape generalizes to any exact quantile set (rn thresholds
    are plan-time arithmetic on T)."""
    # the median's population is the NON-NULL values (DuckDB's MEDIAN
    # aggregate ignores NULLs; counting NULL rows into the middle-row
    # arithmetic would shift the median - r13 partial-records census);
    # n_orders reports that population, COUNT(o_totalprice) on both.
    o = t(spark, sf_dir, "orders").select("o_totalprice", "o_orderkey")
    o = o.filter(F.col("o_totalprice").isNotNull())
    d, total = global_rn(o, ["o_totalprice", "o_orderkey"], rn_col="_rn")
    lo, hi = (total + 1) // 2, total // 2 + 1
    return d.filter(F.col("_rn").isin(lo, hi)).agg(
        F.round(F.avg("o_totalprice"), 2).alias("median_price"),
        F.lit(total).cast("long").alias("n_orders"),
    )


@query(
    "q203_global_cume_dist",
    oracle="""
    SELECT o_orderkey,
           ROUND(CUME_DIST() OVER (
             ORDER BY o_totalprice NULLS FIRST), 6) AS cd
    FROM orders
    """,
)
def q203_global_cume_dist(spark, sf_dir):
    """Exact global CUME_DIST (share of rows with value <= mine, peer
    groups collapsing together): per-VALUE counts first (one
    map-side-combined shuffle), the running total over the
    distinct-value relation via :func:`plans.common.global_cumsum`
    (a ROWS prefix over unique keys IS the RANGE/peer semantics), and
    a join back onto the fact rows - the q200 decomposition
    generalized to a per-row output. The join key is the value itself,
    so ties inherit their peer group's cumulative count exactly."""
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    per_val = o.groupBy("o_totalprice").agg(F.count("*").alias("cnt"))
    cdf, _, totals = global_cumsum(
        per_val, ["o_totalprice"], sums=[("cnt", "cum")]
    )
    n_rows = float(totals["cum"])
    # eqNullSafe: a NULL price is a real peer group (first under the
    # pinned NULLS FIRST order); a bare equi-join would drop its rows
    # (r13 partial-records census: 22 of 32 rows survived).
    c = cdf.select(F.col("o_totalprice").alias("_v"), "cum")
    return o.join(c, o["o_totalprice"].eqNullSafe(c["_v"])).select(
        "o_orderkey",
        F.round(F.col("cum") / F.lit(n_rows), 6).alias("cd"),
    )


# ---------------------------------------------------------------------------
# q254: seasonal-baseline anomaly detection (weekday-adjusted z-scores)
# ---------------------------------------------------------------------------


@query(
    "q254_seasonal_anomaly",
    oracle=f"""
    WITH daily AS (
      -- dow from epoch-day arithmetic ((day + 3) % 7, 0 = Monday):
      -- engine- and timezone-independent, unlike the engines'
      -- dayofweek() which disagree on numbering
      SELECT epoch_us(ts) // {US_PER_DAY} AS day_idx,
             (epoch_us(ts) // {US_PER_DAY} + 3) % 7 AS dow,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    base AS (
      SELECT dow, AVG(n) AS mu, stddev_pop(n) AS sd FROM daily GROUP BY dow
    )
    SELECT CAST(d.day_idx AS BIGINT) AS day_idx,
           CAST(d.dow AS BIGINT) AS dow,
           CAST(d.n AS BIGINT) AS n,
           ROUND((d.n - b.mu) / b.sd, 4) AS z
    FROM daily d JOIN base b USING (dow)
    WHERE b.sd > 0 AND abs(ROUND((d.n - b.mu) / b.sd, 4)) > 1.5
    """,
)
def q254_seasonal_anomaly(spark, sf_dir):
    """SEASONAL-baseline anomaly detection on the event firehose:
    daily volumes compared not to a flat mean but to the SAME
    WEEKDAY's distribution (Mondays vs Mondays), flagging days whose
    weekday-adjusted |z| exceeds 1.5 - the monitoring rule that stops
    every weekend from paging the on-call. Composes q128's
    day-of-week seasonality with q96's z-score shape into the
    operational detector both exist to feed; z is rounded before
    thresholding so both engines flag identical days, and the weekday
    index is epoch-day arithmetic ((day+3) %% 7, 0 = Monday) because
    the engines' dayofweek() numberings disagree.

    Scale: the daily rollup is a |days|-key aggregate with map-side
    partials; the weekday baseline is a 7-row broadcast; the flag is
    a map stage. One fact scan, one shuffle."""
    ev = t(spark, sf_dir, "events")
    day_idx = F.expr(f"ts_us DIV {US_PER_DAY}")
    daily = ev.groupBy(
        day_idx.alias("day_idx"),
        ((day_idx + 3) % 7).alias("dow"),
    ).agg(F.count("*").alias("n"))
    base = daily.groupBy("dow").agg(
        F.avg("n").alias("mu"), F.stddev_pop("n").alias("sd")
    )
    z = F.round((F.col("n") - F.col("mu")) / F.col("sd"), 4)
    return (
        daily.join(F.broadcast(base), "dow")
        .filter((F.col("sd") > 0) & (F.abs(z) > 1.5))
        .select(
            F.col("day_idx").cast("long").alias("day_idx"),
            F.col("dow").cast("long").alias("dow"),
            F.col("n").cast("long").alias("n"),
            z.alias("z"),
        )
    )


# ---------------------------------------------------------------------------
# q259: seasonal-naive forecast backtest (per-type MAE)
# ---------------------------------------------------------------------------


@query(
    "q259_seasonal_naive_backtest",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // {US_PER_DAY} AS day_idx,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    joined AS (
      SELECT a.event_type, a.day_idx, a.n AS actual, b.n AS predicted
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND b.day_idx = a.day_idx - 7
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days_scored,
           ROUND(AVG(abs(actual - predicted)), 4) AS mae,
           ROUND(AVG(abs(actual - predicted) * 1.0 / actual), 4)
             AS mape
    FROM joined GROUP BY event_type
    """,
)
def q259_seasonal_naive_backtest(spark, sf_dir):
    """FORECAST-baseline backtest: the seasonal-naive predictor
    ("tomorrow looks like the same weekday last week") scored per
    event type with MAE/MAPE over every day that has a 7-day-ago
    reference - the baseline every real forecasting model must beat
    before it earns its complexity, and the shape of all backtests:
    join the series to its lag, aggregate the errors.

    Scale: the daily rollup is a (|types| x |days|)-key aggregate with
    map-side partials; the lag join is an equi-join on (type,
    day - 7) within that bounded frame. The fact is scanned once."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.expr(f"ts_us DIV {US_PER_DAY}").alias("day_idx"),
    ).agg(F.count("*").alias("n"))
    a = daily.select(
        "event_type", "day_idx", F.col("n").alias("actual")
    )
    b = daily.select(
        "event_type",
        (F.col("day_idx") + 7).alias("day_idx"),
        F.col("n").alias("predicted"),
    )
    j = a.join(b, ["event_type", "day_idx"])
    err = F.abs(F.col("actual") - F.col("predicted"))
    return j.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_days_scored"),
        F.round(F.avg(err), 4).alias("mae"),
        F.round(F.avg(err / F.col("actual")), 4).alias("mape"),
    )


# ---------------------------------------------------------------------------
# q260: CUSUM changepoint detection on the daily series
# ---------------------------------------------------------------------------


@query(
    "q260_cusum_changepoint",
    oracle=f"""
    WITH daily AS (
      SELECT epoch_us(ts) // {US_PER_DAY} AS day_idx, COUNT(*) AS n
      FROM events GROUP BY 1
    ),
    mu AS (SELECT AVG(n) AS mean_n FROM daily),
    cs AS (
      SELECT d.day_idx, d.n,
             SUM(d.n - mu.mean_n) OVER (
               ORDER BY d.day_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cusum
      FROM daily d, mu
    )
    -- + 0 normalizes IEEE negative zero (a final cusum of exactly
    -- -0.0 vs +0.0 breaks cross-engine row sorting; sf0.001 sweep)
    SELECT CAST(day_idx AS BIGINT) AS day_idx,
           CAST(n AS BIGINT) AS n,
           ROUND(cusum, 4) + 0 AS cusum,
           abs(ROUND(cusum, 4)) = (SELECT MAX(abs(ROUND(cusum, 4)))
                                   FROM cs) AS is_changepoint
    FROM cs
    """,
)
def q260_cusum_changepoint(spark, sf_dir):
    """CUSUM CHANGEPOINT detection on the daily event volume: the
    running sum of deviations from the series mean peaks (in absolute
    value) at the most likely level-shift point - the classic
    offline changepoint locator, reported with the full CUSUM path so
    the analyst sees the shift, not just the argmax. Rounded before
    the argmax comparison so both engines flag identical days.

    Scale: the series lives on the BOUNDED per-day aggregate; the mean
    is a 1-row broadcast, the running sum a window over the bounded
    frame (adjudicated q153-class), and the argmax a second tiny
    aggregate joined back as a literal-free comparison."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.expr(f"ts_us DIV {US_PER_DAY}").alias("day_idx")
    ).agg(F.count("*").alias("n"))
    mu = daily.agg(F.avg("n").alias("mean_n"))
    w = Window.orderBy("day_idx").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cs = (
        daily.crossJoin(F.broadcast(mu))
        .withColumn(
            "cusum",
            # + 0.0 folds IEEE -0.0 to +0.0 (bit-identical engines)
            F.round(
                F.sum(F.col("n") - F.col("mean_n")).over(w), 4
            )
            + F.lit(0.0),
        )
    )
    peak = cs.agg(F.max(F.abs(F.col("cusum"))).alias("peak"))
    return (
        cs.crossJoin(F.broadcast(peak))
        .select(
            F.col("day_idx").cast("long").alias("day_idx"),
            F.col("n").cast("long").alias("n"),
            "cusum",
            (F.abs(F.col("cusum")) == F.col("peak")).alias(
                "is_changepoint"
            ),
        )
    )


# ---------------------------------------------------------------------------
# q310: CUPED-adjusted A/B experiment readout
# ---------------------------------------------------------------------------


@query(
    "q310_cuped_ab_readout",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, epoch_us(ts) AS ts_us, value FROM events
    ),
    bounds AS (SELECT MIN(ts_us) AS mn, MAX(ts_us) AS mx FROM ev),
    u AS (
      SELECT user_id,
             SUM(CASE WHEN ts_us < (mn + mx) // 2
                      THEN value ELSE 0.0 END) AS x,
             SUM(CASE WHEN ts_us >= (mn + mx) // 2
                      THEN value ELSE 0.0 END) AS y,
             MAX(CASE WHEN ts_us >= (mn + mx) // 2
                      THEN 1 ELSE 0 END) AS has_post
      FROM ev, bounds GROUP BY user_id
    ),
    p AS (
      SELECT CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) % 2 AS arm_id, x, y
      FROM u WHERE has_post = 1
    ),
    g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(x * y) AS sxy
      FROM p
    ),
    a AS (
      SELECT arm_id, CAST(COUNT(*) AS BIGINT) AS n_users,
             SUM(x) AS asx, SUM(y) AS asy
      FROM p GROUP BY arm_id
    )
    SELECT CASE WHEN arm_id = 0 THEN 'A' ELSE 'B' END AS arm,
           n_users,
           ROUND(asy / n_users, 6) AS mean_post,
           ROUND(asy / n_users
                 - ((g.n * g.sxy - g.sx * g.sy)
                    / (g.n * g.sxx - g.sx * g.sx))
                   * (asx / n_users - g.sx / g.n), 6) AS mean_cuped
    FROM a, g
    """,
)
def q310_cuped_ab_readout(spark, sf_dir):
    """CUPED-adjusted A/B readout (Deng et al. 2013): users hash-split
    into two arms, per-arm post-period mean of ``value`` reported raw
    AND adjusted by the pre-period covariate - y_adj = y - theta *
    (x - mean(x)) with theta = cov(x, y)/var(x) - the
    variance-reduction every mature experimentation platform applies
    before reading a metric. Pre/post split at the integer midpoint of
    the event time range (exact bigint arithmetic); arm = the suite's
    md5-60bit user hash mod 2 (the q79 deterministic-split pattern).

    Scale: one scan -> per-user pre/post sums (one groupBy, both
    periods in the same pass via conditional aggregation), then the
    pooled moments (1-row) and per-arm sums (2-row) are aggregates of
    the user frame; the only unbounded shuffle is the user groupBy.
    The 1-row bounds/moments frames ride broadcast nested-loop joins
    (aggregate-derived, the adjudicated q104 shape). theta and the
    adjusted means are computed in identical operation order on both
    engines from the per-user sums (which carry the suite's
    adjudicated ~1e-15 summation-order tolerance under a 6dp round).
    """
    from .mlprep import _h60

    ev = t(spark, sf_dir, "events").select("user_id", "ts_us", "value")
    bounds = ev.agg(F.min("ts_us").alias("mn"), F.max("ts_us").alias("mx"))
    mid = F.expr("(mn + mx) DIV 2")
    u = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("ts_us") < mid, F.col("value")).otherwise(0.0)
            ).alias("x"),
            F.sum(
                F.when(F.col("ts_us") >= mid, F.col("value")).otherwise(0.0)
            ).alias("y"),
            F.max(
                F.when(F.col("ts_us") >= mid, F.lit(1)).otherwise(0)
            ).alias("has_post"),
        )
    )
    p = u.filter(F.col("has_post") == 1).select(
        (_h60(F.col("user_id").cast("string")) % 2).alias("arm_id"),
        "x",
        "y",
    )
    g = p.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    a = p.groupBy("arm_id").agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("x").alias("asx"),
        F.sum("y").alias("asy"),
    )
    theta = (
        F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    ) / F.nullif(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
            "double"
        ),
        F.lit(0.0),
    )
    return (
        a.crossJoin(F.broadcast(g))
        .select(
            F.when(F.col("arm_id") == 0, "A").otherwise("B").alias("arm"),
            "n_users",
            F.round(F.col("asy") / F.col("n_users"), 6).alias("mean_post"),
            F.round(
                F.col("asy") / F.col("n_users")
                - theta
                * (
                    F.col("asx") / F.col("n_users")
                    - F.col("sx") / F.col("n")
                ),
                6,
            ).alias("mean_cuped"),
        )
    )


# ---------------------------------------------------------------------------
# q335: classical period-7 seasonal decomposition of the daily series
# ---------------------------------------------------------------------------


@query(
    "q335_seasonal_decomposition",
    oracle=f"""
    WITH daily AS (
      SELECT {EPOCH_DAY_SQL}
               AS day_idx,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    tr AS (
      SELECT day_idx, y, day_idx % 7 AS phase,
             CAST(SUM(y) OVER w7 AS BIGINT) AS trend7,
             CAST(COUNT(*) OVER w7 AS BIGINT) AS cnt7
      FROM daily
      WINDOW w7 AS (ORDER BY day_idx
                    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    det AS (
      SELECT *, CASE WHEN cnt7 = 7 THEN 7 * y - trend7 END AS det7
      FROM tr
    ),
    seas AS (
      SELECT phase,
             CAST(SUM(det7) AS BIGINT) AS s_num,
             CAST(7 * COUNT(det7) AS BIGINT) AS s_den
      FROM det GROUP BY phase
    )
    SELECT d.day_idx, d.y, CAST(d.phase AS BIGINT) AS phase,
           CASE WHEN d.cnt7 = 7
                THEN ROUND(CAST(d.trend7 AS DOUBLE) / 7.0, 6)
           END AS trend,
           ROUND(CAST(s.s_num AS DOUBLE) / s.s_den, 6) AS seasonal,
           CASE WHEN d.cnt7 = 7
                THEN ROUND(CAST(d.y AS DOUBLE)
                           - CAST(d.trend7 AS DOUBLE) / 7.0
                           - CAST(s.s_num AS DOUBLE) / s.s_den, 6)
           END AS residual
    FROM det d JOIN seas s ON d.phase = s.phase
    """,
)
def q335_seasonal_decomposition(spark, sf_dir):
    """CLASSICAL additive seasonal decomposition (period 7) of the
    daily event-count series: trend = centered 7-day moving average,
    seasonal = mean detrended value per weekly phase, residual = the
    rest - the y = T + S + R readout behind every ingest-volume
    anomaly monitor (q260's CUSUM flags WHERE a shift happened; this
    separates WHAT is weekly rhythm from what is genuine drift, so
    the monitor does not page on Sundays).

    Exactness: the moving average is carried as the INTEGER 7-day sum
    (trend7) and the detrended series as 7*y - trend7 - both exact
    bigints, so the per-phase seasonal means are exact integer
    rationals (s_num/s_den); every double division is an identical
    expression string rounded once, and edge days (incomplete 7-day
    windows) NULL out via the same cnt7 guard on both engines. The
    weekly phase is day_idx % 7 - pure integer arithmetic on the
    tz-free epoch-microsecond day index (q29's discipline), immune
    to engine dayofweek conventions.

    Scale: the fact scan collapses to the CALENDAR-bounded daily
    aggregate first (the q260/q327 shape); the 7-day window and the
    7-row phase join run on that bounded frame (adjudicated global
    window; equi-join a broadcastable 7-row aggregate)."""
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(
            F.floor(
                (F.col("ts_us") - F.lit(EVENTS_EPOCH_US))
                / F.lit(US_PER_DAY)
            ).alias("day_idx")
        )
        .agg(F.count("*").cast("long").alias("y"))
    )
    w7 = Window.orderBy("day_idx").rowsBetween(-3, 3)
    det = transient_persist(
        daily.select(
            "day_idx",
            "y",
            (F.col("day_idx") % 7).alias("phase"),
            F.sum("y").over(w7).cast("long").alias("trend7"),
            F.count("*").over(w7).cast("long").alias("cnt7"),
        ).withColumn(
            "det7",
            F.when(
                F.col("cnt7") == 7, 7 * F.col("y") - F.col("trend7")
            ),
        )
    )
    seas = det.groupBy("phase").agg(
        F.sum("det7").cast("long").alias("s_num"),
        (7 * F.count("det7")).cast("long").alias("s_den"),
    )
    trend = F.col("trend7").cast("double") / 7.0
    seasonal = F.col("s_num").cast("double") / F.col("s_den")
    return det.join(seas, "phase").select(
        "day_idx",
        "y",
        F.col("phase").cast("long").alias("phase"),
        F.when(F.col("cnt7") == 7, F.round(trend, 6)).alias("trend"),
        F.round(seasonal, 6).alias("seasonal"),
        F.when(
            F.col("cnt7") == 7,
            F.round(
                F.col("y").cast("double") - trend - seasonal, 6
            ),
        ).alias("residual"),
    )


# ---------------------------------------------------------------------------
# q336: autocorrelation function (lags 1..10) of the daily event series
# ---------------------------------------------------------------------------


@query(
    "q336_daily_autocorrelation",
    oracle=f"""
    WITH daily AS (
      SELECT {EPOCH_DAY_SQL}
               AS day_idx,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS s,
             CAST(SUM(y * y) AS BIGINT) AS ss
      FROM daily
    ),
    pairs AS (
      SELECT b.day_idx - a.day_idx AS lag_k,
             CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(a.y * b.y) AS BIGINT) AS p,
             CAST(SUM(a.y + b.y) AS BIGINT) AS tsum
      FROM daily a JOIN daily b
        ON b.day_idx - a.day_idx BETWEEN 1 AND 10
      GROUP BY 1
    )
    SELECT pairs.lag_k, pairs.n_pairs,
           ROUND(CAST(tot.n * tot.n * pairs.p
                      - tot.n * tot.s * pairs.tsum
                      + pairs.n_pairs * tot.s * tot.s AS DOUBLE)
                 / CAST(tot.n * tot.n * tot.ss
                        - tot.n * tot.s * tot.s AS DOUBLE),
                 6) AS acf
    FROM pairs, tot
    """,
)
def q336_daily_autocorrelation(spark, sf_dir):
    """SAMPLE AUTOCORRELATION FUNCTION of the daily event-count
    series at lags 1..10 - the memory-structure diagnostic that
    complements q335's decomposition: a spike at lag 7 confirms the
    weekly rhythm q335 removes, while significant low-lag mass after
    seasonal adjustment says the ingest monitor (q260) needs a
    drift-aware null, not an i.i.d. one.

    Exactness: the demeaned pair products are carried as the
    n^2-SCALED integer identity
    n^2*sum((y_i - s/n)(y_j - s/n)) = n^2*P - n*s*T + m*s^2, so
    numerator and denominator are exact BIGINTs (all magnitudes far
    below 2^53 at suite scale: n ~ 30 days, s ~ |events|); the single
    double division is the identical expression string on both
    engines, rounded once. Lags come from day-index DIFFERENCES, so
    calendar gaps cannot silently shift the series.

    Scale: the fact scan collapses to the CALENDAR-bounded daily
    aggregate first (the q260/q327/q335 shape); the lag pair stage is
    a non-equi self-join of that ~|days|-row frame (explicitly
    broadcast, constant in data volume - the q327 adjudicated-BNLJ
    discipline) and the 1-row moments frame is cross-joined
    broadcast."""
    daily = transient_persist(
        t(spark, sf_dir, "events")
        .groupBy(
            F.floor(
                (F.col("ts_us") - F.lit(EVENTS_EPOCH_US))
                / F.lit(US_PER_DAY)
            ).alias("day_idx")
        )
        .agg(F.count("*").cast("long").alias("y"))
    )
    tot = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("ss"),
    )
    a = daily.select(
        F.col("day_idx").alias("day_a"), F.col("y").alias("ya")
    )
    b = daily.select(
        F.col("day_idx").alias("day_b"), F.col("y").alias("yb")
    )
    pairs = (
        a.join(
            F.broadcast(b),
            (F.col("day_b") - F.col("day_a")).between(1, 10),
        )
        .groupBy((F.col("day_b") - F.col("day_a")).alias("lag_k"))
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.sum(F.col("ya") * F.col("yb")).cast("long").alias("p"),
            F.sum(F.col("ya") + F.col("yb")).cast("long").alias("tsum"),
        )
    )
    return pairs.crossJoin(F.broadcast(tot)).select(
        "lag_k",
        "n_pairs",
        F.round(
            (
                F.col("n") * F.col("n") * F.col("p")
                - F.col("n") * F.col("s") * F.col("tsum")
                + F.col("n_pairs") * F.col("s") * F.col("s")
            ).cast("double")
            / (
                F.col("n") * F.col("n") * F.col("ss")
                - F.col("n") * F.col("s") * F.col("s")
            ).cast("double"),
            6,
        ).alias("acf"),
    )


# ---------------------------------------------------------------------------
# q346: exact-dyadic simple exponential smoothing of the daily series
# ---------------------------------------------------------------------------

#: smoothing lag cap: contributions beyond 2^-40 are identically zero
#: at micro-unit resolution anyway, so the truncation changes nothing
#: numerically while bounding the join fan-in at any calendar span
_SES_MAXLAG = 40


@query(
    "q346_ses_forecast",
    oracle=f"""
    WITH daily AS (
      SELECT {EPOCH_DAY_SQL} AS day_idx,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    d0 AS (SELECT MIN(day_idx) AS dmin FROM daily),
    contrib AS (
      SELECT tgt.day_idx,
             CAST(SUM((src.y * 1000000)
                      // (CAST(1 AS BIGINT) << CAST(
                            tgt.day_idx - src.day_idx + 1 AS INTEGER)))
                  AS BIGINT) AS s_sum
      FROM daily tgt
      JOIN daily src
        ON src.day_idx <= tgt.day_idx
       AND src.day_idx > tgt.day_idx - {_SES_MAXLAG}, d0
      WHERE src.day_idx > d0.dmin
      GROUP BY tgt.day_idx
    ),
    init AS (
      SELECT d.day_idx,
             CASE WHEN d.day_idx - d0.dmin < {_SES_MAXLAG}
                  THEN (f.y * 1000000)
                       // (CAST(1 AS BIGINT) << CAST(
                             d.day_idx - d0.dmin AS INTEGER))
                  ELSE 0 END AS s_init
      FROM daily d, d0, daily f
      WHERE f.day_idx = d0.dmin
    ),
    ses AS (
      SELECT i.day_idx,
             COALESCE(c.s_sum, 0) + i.s_init AS ses_micro
      FROM init i LEFT JOIN contrib c ON c.day_idx = i.day_idx
    ),
    scored AS (
      SELECT d.day_idx, d.y, s.ses_micro,
             ABS(d.y * 1000000 - lag_s.ses_micro) AS err_micro
      FROM daily d
      JOIN ses s ON s.day_idx = d.day_idx
      LEFT JOIN ses lag_s ON lag_s.day_idx = d.day_idx - 1
    ),
    mae AS (
      SELECT CAST(SUM(err_micro) AS BIGINT) // COUNT(err_micro)
               AS mae_micro
      FROM scored WHERE err_micro IS NOT NULL
    )
    SELECT s.day_idx, s.y, s.ses_micro, s.err_micro, mae.mae_micro
    FROM scored s, mae
    ORDER BY s.day_idx
    """,
)
def q346_ses_forecast(spark, sf_dir):
    """SIMPLE EXPONENTIAL SMOOTHING (alpha = 1/2) of the daily event
    series with one-step-ahead forecast error - the level-tracking
    baseline behind every ops dashboard's "expected volume" line and
    the anomaly denominator q254/q260 compare against. SES's
    recursion s_t = y_t/2 + s_{t-1}/2 unrolls to the closed form
    s_t = sum_k y_{t-k}/2^(k+1) + y_0/2^(t-t0), so no sequential
    scan is needed: the whole fit is one bounded self-join.

    Exactness - the DYADIC trick: alpha = 1/2 makes every term
    ``(y * 1e6) >> (k+1)`` an exact integer floor; the sum is bigint
    (order-independent), and the 40-lag truncation drops
    only terms that integer-shift to zero at micro resolution anyway.
    Unlike float SES, two engines (or two partitionings) can NEVER
    disagree - the q341 pure-bigint discipline applied to a time
    series.

    Scale: the daily frame is CALENDAR-bounded (one row per day); the
    lag self-join is a banded non-equi join on that bounded aggregate
    (the q327/q336 adjudicated-BNLJ discipline) with fan-in capped at
    40; MAE is a 1-row fold. The fact-sized work is one
    groupBy(day)."""
    daily = transient_persist(
        t(spark, sf_dir, "events")
        .groupBy(
            F.floor(
                (F.col("ts_us") - F.lit(EVENTS_EPOCH_US)) / F.lit(US_PER_DAY)
            ).alias("day_idx")
        )
        .agg(F.count("*").cast("long").alias("y"))
    )
    d0 = daily.agg(F.min("day_idx").alias("dmin"))
    tgt = daily.select(F.col("day_idx").alias("t_day"))
    src = daily.select(F.col("day_idx").alias("s_day"), F.col("y").alias("sy"))
    contrib = (
        tgt.join(
            F.broadcast(src),
            (F.col("s_day") <= F.col("t_day"))
            & (F.col("s_day") > F.col("t_day") - _SES_MAXLAG),
        )
        .crossJoin(F.broadcast(d0))
        .filter(F.col("s_day") > F.col("dmin"))
        .groupBy("t_day")
        .agg(
            F.sum(
                F.expr(
                    "(sy * 1000000) DIV SHIFTLEFT(CAST(1 AS LONG),"
                    " CAST(t_day - s_day + 1 AS INT))"
                )
            )
            .cast("long")
            .alias("s_sum")
        )
    )
    first = daily.crossJoin(F.broadcast(d0)).filter(
        F.col("day_idx") == F.col("dmin")
    ).select(F.col("y").alias("fy"), "dmin")
    init = (
        daily.crossJoin(F.broadcast(first))
        .select(
            "day_idx",
            F.when(
                F.col("day_idx") - F.col("dmin") < _SES_MAXLAG,
                F.expr(
                    "(fy * 1000000) DIV SHIFTLEFT(CAST(1 AS LONG),"
                    " CAST(day_idx - dmin AS INT))"
                ),
            )
            .otherwise(0)
            .alias("s_init"),
        )
    )
    ses = transient_persist(
        init.join(contrib, init.day_idx == contrib.t_day, "left")
        .select(
            "day_idx",
            (F.coalesce("s_sum", F.lit(0)) + F.col("s_init"))
            .cast("long")
            .alias("ses_micro"),
        )
    )
    lagged = ses.select(
        (F.col("day_idx") + 1).alias("day_idx"),
        F.col("ses_micro").alias("prev_ses"),
    )
    scored = (
        daily.join(ses, "day_idx")
        .join(lagged, "day_idx", "left")
        .select(
            "day_idx",
            "y",
            "ses_micro",
            F.abs(F.col("y") * 1000000 - F.col("prev_ses"))
            .cast("long")
            .alias("err_micro"),
        )
    )
    mae = scored.filter(F.col("err_micro").isNotNull()).agg(
        F.expr(
            "CAST(SUM(err_micro) AS LONG) DIV COUNT(err_micro)"
        ).alias("mae_micro")
    )
    return (
        scored.crossJoin(F.broadcast(mae))
        .select("day_idx", "y", "ses_micro", "err_micro", "mae_micro")
        .orderBy("day_idx")
    )


# ---------------------------------------------------------------------------
# q351: zone-map pruning audit over key-range chunks of lineitem
# ---------------------------------------------------------------------------

#: zone size in orderkeys: one "chunk" of the physical layout. Parquet
#: row groups / Delta file stats play this role in production; keying
#: zones by l_orderkey range models the common ingest-ordered layout.
_ZONE_ORDERKEYS = 512

#: the audit's predicate grid: half-year ship-date cutoffs spanning the
#: table's 1995-2001 range (a fixed calendar grid, not data-derived, so
#: the frame is constant-folded on both engines).
_ZONE_CUTOFFS = [
    f"{y}-{m:02d}-01" for y in range(1995, 2002) for m in (1, 7)
]


@query(
    "q351_zone_map_pruning",
    oracle=f"""
    WITH ch AS (
      SELECT l_orderkey // {_ZONE_ORDERKEYS} AS chunk,
             CAST(COUNT(*) AS BIGINT) AS cnt,
             MAX(CAST(l_shipdate AS DATE)) AS max_ship
      FROM lineitem GROUP BY 1
    ),
    cuts AS (
      SELECT UNNEST([{", ".join(f"DATE '{c}'" for c in _ZONE_CUTOFFS)}])
        AS cutoff
    )
    SELECT cuts.cutoff,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN ch.max_ship < cuts.cutoff THEN 1 ELSE 0 END)
                AS BIGINT) AS n_pruned,
           CAST(SUM(CASE WHEN ch.max_ship < cuts.cutoff THEN ch.cnt
                         ELSE 0 END) AS BIGINT) AS rows_skipped,
           CAST(SUM(CASE WHEN ch.max_ship < cuts.cutoff THEN 0
                         ELSE ch.cnt END) AS BIGINT) AS rows_scanned,
           ROUND(CAST(SUM(CASE WHEN ch.max_ship < cuts.cutoff THEN ch.cnt
                               ELSE 0 END) AS DOUBLE)
                 / SUM(ch.cnt), 6) AS prune_frac
    FROM ch, cuts
    GROUP BY cuts.cutoff
    """,
)
def q351_zone_map_pruning(spark, sf_dir):
    """ZONE-MAP PRUNING AUDIT: how much of the table would per-chunk
    min/max statistics let a scan skip for the predicate
    ``l_shipdate >= cutoff``, across a calendar grid of cutoffs. This
    is the planning-time question behind every data-layout decision
    (parquet row-group stats, Delta/Iceberg file skipping, the q117
    z-order key): a chunk whose ``max_ship < cutoff`` is provably
    predicate-free and never leaves the metadata layer. Chunks are
    512-orderkey ranges - the ingest-ordered layout - so
    the audit also REVEALS the date-vs-orderkey correlation: high
    prune fractions mean time-correlated keys, low ones mean a
    z-order/sort would pay for itself.

    Exactness: counts are bigint; dates compare tz-free as DATE on
    both engines; the one ratio rounds at 6dp.

    Scale: the fact-sized work is ONE groupBy(chunk) with map-side
    combine emitting (cnt, max_ship) per chunk - exactly the metadata
    a real table format already maintains, i.e. at 100 TB this query
    reads statistics, not data. The cutoff grid is a
    14-literal constant frame broadcast against the
    chunk aggregate; the final rollup groups by cutoff over
    |chunks| x |cuts| bounded rows."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    ch = li.groupBy(
        F.expr(f"l_orderkey DIV {_ZONE_ORDERKEYS}").alias("chunk")
    ).agg(
        F.count("*").cast("long").alias("cnt"),
        F.max(F.to_date("l_shipdate")).alias("max_ship"),
    )
    cuts = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(c).cast("date") for c in _ZONE_CUTOFFS])
        ).alias("cutoff")
    )
    pruned = F.col("max_ship") < F.col("cutoff")
    return (
        ch.crossJoin(F.broadcast(cuts))
        .groupBy("cutoff")
        .agg(
            F.count("*").cast("long").alias("n_chunks"),
            F.sum(F.when(pruned, 1).otherwise(0))
            .cast("long")
            .alias("n_pruned"),
            F.sum(F.when(pruned, F.col("cnt")).otherwise(0))
            .cast("long")
            .alias("rows_skipped"),
            F.sum(F.when(pruned, F.lit(0)).otherwise(F.col("cnt")))
            .cast("long")
            .alias("rows_scanned"),
            F.round(
                F.sum(F.when(pruned, F.col("cnt")).otherwise(0)).cast(
                    "double"
                )
                / F.sum("cnt"),
                6,
            ).alias("prune_frac"),
        )
    )


# ---------------------------------------------------------------------------
# q357: Holt linear-trend smoothing of the daily series (exact integer)
# ---------------------------------------------------------------------------


def _tdiv(a: int, b: int) -> int:
    """Truncate-toward-zero integer division - BOTH engines' integer
    division semantics (Spark ``DIV``, DuckDB ``//``: probe -3 -> -1),
    unlike Python's floor ``//`` (-3 -> -2). The Holt trend state goes
    negative, so the driver recursion must match the engines."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


@query(
    "q357_holt_trend_forecast",
    oracle=f"""
    WITH RECURSIVE daily AS (
      SELECT {EPOCH_DAY_SQL} AS day_idx,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    idx AS (
      SELECT day_idx, y,
             CAST(ROW_NUMBER() OVER (ORDER BY day_idx) AS BIGINT) AS tstep
      FROM daily
    ),
    holt AS (
      SELECT i1.tstep, i1.day_idx, i1.y,
             i1.y * 1000000 AS l_micro,
             COALESCE((i2.y - i1.y) * 1000000, 0) AS b_micro,
             CAST(NULL AS BIGINT) AS err_micro
      FROM idx i1 LEFT JOIN idx i2 ON i2.tstep = 2
      WHERE i1.tstep = 1
      UNION ALL
      SELECT i.tstep, i.day_idx, i.y,
             (i.y * 1000000) // 2 + (h.l_micro + h.b_micro) // 2
               AS l_micro,
             ((i.y * 1000000) // 2 + (h.l_micro + h.b_micro) // 2
              - h.l_micro) // 2 + h.b_micro // 2 AS b_micro,
             ABS(i.y * 1000000 - (h.l_micro + h.b_micro)) AS err_micro
      FROM holt h JOIN idx i ON i.tstep = h.tstep + 1
    )
    SELECT day_idx, y, l_micro, b_micro, err_micro FROM holt
    """,
)
def q357_holt_trend_forecast(spark, sf_dir):
    """HOLT LINEAR-TREND exponential smoothing (alpha = beta = 1/2) of
    the daily event series with one-step-ahead forecast error - the
    trend-following upgrade of q346's SES: SES lags a ramping series
    by a constant, Holt's explicit trend state closes that gap, and
    |y - (l + b)| is the anomaly residual a volume monitor pages on.

        l_t = y_t/2 + (l_{{t-1}} + b_{{t-1}})/2
        b_t = (l_t - l_{{t-1}})/2 + b_{{t-1}}/2

    Exactness: unlike SES, Holt's recursion has no dyadic closed form
    (coefficients are binomial tails, not pure 2^-k), so the recursion
    is run LITERALLY, in integer micro-units with truncate-toward-zero
    halving - Spark DIV and DuckDB // share that semantics (probed:
    -3 -> -1), and the driver loop mirrors it via :func:`_tdiv`
    (Python's floor // would diverge on the negative trend states).
    Every state is a bigint; engines cannot disagree.

    Scale: the fact-sized work is ONE groupBy(day); the recursion runs
    on the CALENDAR-bounded daily aggregate (|days| rows at ANY data
    volume - the q177/q319 bounded-driver-state class: a year of
    100 TB/day is still 365 rows) and ships back as a literal frame.
    The oracle is the same recursion as a recursive CTE."""
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(
            F.floor(
                (F.col("ts_us") - F.lit(EVENTS_EPOCH_US)) / F.lit(US_PER_DAY)
            ).alias("day_idx")
        )
        .agg(F.count("*").cast("long").alias("y"))
    )
    rows = sorted(
        ((r["day_idx"], r["y"]) for r in daily.collect()),
    )
    out = []
    l = b = None
    for i, (day_idx, y) in enumerate(rows):
        if i == 0:
            l = y * 1_000_000
            b = (rows[1][1] - y) * 1_000_000 if len(rows) > 1 else 0
            out.append((day_idx, y, l, b, None))
            continue
        err = abs(y * 1_000_000 - (l + b))
        l_new = _tdiv(y * 1_000_000, 2) + _tdiv(l + b, 2)
        b_new = _tdiv(l_new - l, 2) + _tdiv(b, 2)
        l, b = l_new, b_new
        out.append((day_idx, y, l, b, err))
    return spark.createDataFrame(
        out, "day_idx long, y long, l_micro long, b_micro long, err_micro long"
    )


# ---------------------------------------------------------------------------
# q368: overdispersion audit of the daily event-count series
# ---------------------------------------------------------------------------


@query(
    "q368_overdispersion_audit",
    oracle=f"""
    WITH daily AS (
      SELECT event_type,
             {EPOCH_DAY_SQL} AS day_idx,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(y) AS BIGINT) AS total,
           CAST((1000 * SUM(y)) // COUNT(*) AS BIGINT) AS mean_milli,
           ROUND(CAST(COUNT(*) * SUM(y * y) - SUM(y) * SUM(y) AS DOUBLE)
                 / (COUNT(*) * SUM(y)), 6) AS dispersion_index
    FROM daily GROUP BY event_type
    """,
)
def q368_overdispersion_audit(spark, sf_dir):
    """OVERDISPERSION AUDIT of daily event counts per type: the
    variance-to-mean (Fisher dispersion) index - 1 for a Poisson
    arrival process, > 1 for bursty/clumped traffic - computed as
    (D*Sum(y^2) - Sum(y)^2) / (D*Sum(y)), which is exactly
    population-variance/mean without ever forming either. This is the
    distributional-assumption check behind every count-based alert
    threshold (q254/q260 implicitly assume near-Poisson noise; this
    query says whether that's true per stream).

    Exactness: all moments are bigint (the q336 n^2-scaled-moment
    device); the index is one division of exact integers rounded at
    6dp, and the mean is reported in floor milli-units.

    Scale: one groupBy((type, day)) with map-side combine - the
    calendar x type bounded aggregate - then a |types|-row fold. The
    fact is touched once."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.floor(
            (F.col("ts_us") - F.lit(EVENTS_EPOCH_US)) / F.lit(US_PER_DAY)
        ).alias("day_idx"),
    ).agg(F.count("*").cast("long").alias("y"))
    n = F.count("*")
    s = F.sum("y")
    s2 = F.sum(F.col("y") * F.col("y"))
    return daily.groupBy("event_type").agg(
        n.cast("long").alias("n_days"),
        s.cast("long").alias("total"),
        F.expr("(1000 * SUM(y)) DIV COUNT(*)").cast("long").alias(
            "mean_milli"
        ),
        F.round(
            (n * s2 - s * s).cast("double") / (n * s), 6
        ).alias("dispersion_index"),
    )


# ---------------------------------------------------------------------------
# q377: Theil-Sen robust trend of the daily event series
# ---------------------------------------------------------------------------


@query(
    "q377_theil_sen_trend",
    oracle=f"""
    WITH daily AS (
      SELECT {EPOCH_DAY_SQL} AS d,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    slopes AS (
      SELECT (1000 * (b.y - a.y)) // (b.d - a.d) AS s_milli
      FROM daily a JOIN daily b ON b.d > a.d
    ),
    r AS (
      SELECT s_milli,
             ROW_NUMBER() OVER (ORDER BY s_milli) AS rn,
             COUNT(*) OVER () AS n
      FROM slopes
    )
    SELECT CAST(ANY_VALUE(n) AS BIGINT) AS n_pairs,
           CAST((SUM(CASE WHEN rn = (n + 1) // 2 THEN s_milli ELSE 0 END)
                 + SUM(CASE WHEN rn = n // 2 + 1 THEN s_milli ELSE 0 END))
                // 2 AS BIGINT) AS sen_slope_milli
    FROM r
    """,
)
def q377_theil_sen_trend(spark, sf_dir):
    """THEIL-SEN ROBUST TREND of daily event volume: the median of
    all pairwise day-to-day slopes - the estimator that shrugs off
    the outlier days that wreck the OLS trend (up to ~29% arbitrary
    corruption), i.e. the slope a volume-capacity forecast should
    trust when q368 reports overdispersion. Median of an even count
    averages the two middle values (floor-milli arithmetic).

    Exactness: slopes are milli-floored integer rationals via the
    engines' shared truncating division (negative slopes truncate
    identically); the median is an exact order statistic over the
    bounded slope multiset; the final half-sum floors once.

    Scale: the pair enumeration is a banded self-join of the
    CALENDAR-bounded daily aggregate (|days|^2/2 rows - the
    q327/q336 adjudicated-BNLJ class, bounded at any corpus size);
    the median runs on that bounded frame. Fact-sized work: one
    groupBy(day)."""
    daily = t(spark, sf_dir, "events").groupBy(
        F.floor(
            (F.col("ts_us") - F.lit(EVENTS_EPOCH_US)) / F.lit(US_PER_DAY)
        ).alias("d")
    ).agg(F.count("*").cast("long").alias("y"))
    a = daily.select(F.col("d").alias("da"), F.col("y").alias("ya"))
    b = daily.select(F.col("d").alias("db"), F.col("y").alias("yb"))
    slopes = (
        a.join(F.broadcast(b), F.col("db") > F.col("da"))
        .select(
            F.expr("(1000 * (yb - ya)) DIV (db - da)").alias("s_milli")
        )
    )
    w = Window.orderBy("s_milli")
    r = slopes.select(
        "s_milli",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )
    return r.agg(
        F.first("n").cast("long").alias("n_pairs"),
        F.expr(
            "CAST((SUM(CASE WHEN rn = (n + 1) DIV 2 THEN s_milli ELSE 0 END)"
            " + SUM(CASE WHEN rn = n DIV 2 + 1 THEN s_milli ELSE 0 END))"
            " DIV 2 AS BIGINT)"
        ).alias("sen_slope_milli"),
    )


# ---------------------------------------------------------------------------
# q378: day-over-day top-k churn (trending-set stability)
# ---------------------------------------------------------------------------

_CHURN_K = 5


@query(
    "q378_topk_churn",
    oracle=f"""
    WITH dk AS (
      SELECT {EPOCH_DAY_SQL} AS d,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS item,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
    ),
    topk AS (
      SELECT d, item FROM (
        SELECT d, item,
               ROW_NUMBER() OVER (
                 PARTITION BY d ORDER BY cnt DESC, item) AS rn
        FROM dk
      ) WHERE rn <= {_CHURN_K}
    ),
    common AS (
      SELECT cur.d, CAST(COUNT(*) AS BIGINT) AS n_common
      FROM topk cur JOIN topk prv
        ON prv.d = cur.d - 1 AND prv.item = cur.item
      GROUP BY cur.d
    ),
    days AS (SELECT DISTINCT d FROM topk WHERE d > (SELECT MIN(d) FROM topk))
    SELECT days.d AS day_idx,
           CAST(COALESCE(common.n_common, 0) AS BIGINT) AS n_common,
           ROUND(CAST(COALESCE(common.n_common, 0) AS DOUBLE)
                 / (2 * {_CHURN_K} - COALESCE(common.n_common, 0)), 6)
             AS jaccard
    FROM days LEFT JOIN common ON common.d = days.d
    """,
)
def q378_topk_churn(spark, sf_dir):
    """DAY-OVER-DAY TOP-5 CHURN of the hottest item ids (the
    ``props.k`` payload): for each day, how much of yesterday's
    trending set survives - n_common and the Jaccard
    c / (2k - c). The stability audit behind any "trending" feature
    and behind cache/precompute sizing: Jaccard near 1 says the hot
    set is static (cache it), near 0 says recompute daily. Ties at
    the k-th slot break on the smaller item id, so both engines pick
    the identical set.

    Exactness: counts are bigint; the Jaccard is one exact-integer
    division rounded at 6dp.

    Scale: one groupBy((day, item)) with map-side combine, a
    PARTITIONED top-k window (bounded by the item domain per day),
    and a self-join of the k-per-day frame on (day-1, item) -
    calendar x k rows. Fact touched once."""
    ev = t(spark, sf_dir, "events")
    dk = ev.groupBy(
        F.floor(
            (F.col("ts_us") - F.lit(EVENTS_EPOCH_US)) / F.lit(US_PER_DAY)
        ).alias("d"),
        F.get_json_object("props", "$.k").cast("long").alias("item"),
    ).agg(F.count("*").cast("long").alias("cnt"))
    w = Window.partitionBy("d").orderBy(F.col("cnt").desc(), "item")
    topk = transient_persist(
        dk.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _CHURN_K)
        .select("d", "item")
    )
    prv = topk.select((F.col("d") + 1).alias("d"), "item")
    common = (
        topk.join(prv, ["d", "item"])
        .groupBy("d")
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    dmin = topk.agg(F.min("d").alias("dmin"))
    days = (
        topk.select("d")
        .distinct()
        .crossJoin(F.broadcast(dmin))
        .filter(F.col("d") > F.col("dmin"))
        .select("d")
    )
    return days.join(common, "d", "left").select(
        F.col("d").alias("day_idx"),
        F.coalesce("n_common", F.lit(0)).cast("long").alias("n_common"),
        F.round(
            F.coalesce("n_common", F.lit(0)).cast("double")
            / (2 * _CHURN_K - F.coalesce("n_common", F.lit(0))),
            6,
        ).alias("jaccard"),
    )


# ---------------------------------------------------------------------------
# q380: additive Holt-Winters (period 7) of the daily series
# ---------------------------------------------------------------------------

_HW_P = 7


@query(
    "q380_holt_winters",
    oracle=f"""
    WITH RECURSIVE daily AS (
      SELECT {EPOCH_DAY_SQL} AS day_idx,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    idx AS (
      SELECT day_idx, y,
             CAST(ROW_NUMBER() OVER (ORDER BY day_idx) AS BIGINT) AS tstep
      FROM daily
    ),
    init_l AS (
      SELECT CAST(SUM(y) * 1000000 // {_HW_P} AS BIGINT) AS l0
      FROM idx WHERE tstep <= {_HW_P}
    ),
    init_s AS (
      SELECT list(i.y * 1000000 - il.l0 ORDER BY i.tstep) AS s0
      FROM idx i, init_l il WHERE i.tstep <= {_HW_P}
    ),
    hw AS (
      SELECT i.tstep, i.day_idx, i.y,
             il.l0 AS l_micro, CAST(0 AS BIGINT) AS b_micro,
             s.s0 AS seas,
             CAST(NULL AS BIGINT) AS err_micro
      FROM idx i, init_l il, init_s s WHERE i.tstep = {_HW_P}
      UNION ALL
      SELECT i.tstep, i.day_idx, i.y,
             (i.y * 1000000 - h.seas[1]) // 2
               + (h.l_micro + h.b_micro) // 2 AS l_micro,
             (((i.y * 1000000 - h.seas[1]) // 2
               + (h.l_micro + h.b_micro) // 2) - h.l_micro) // 2
               + h.b_micro // 2 AS b_micro,
             list_append(
               h.seas[2:{_HW_P}],
               (i.y * 1000000
                - ((i.y * 1000000 - h.seas[1]) // 2
                   + (h.l_micro + h.b_micro) // 2)) // 2
                 + h.seas[1] // 2) AS seas,
             ABS(i.y * 1000000
                 - (h.l_micro + h.b_micro + h.seas[1])) AS err_micro
      FROM hw h JOIN idx i ON i.tstep = h.tstep + 1
    )
    SELECT day_idx, y, l_micro, b_micro,
           seas[{_HW_P}] AS season_micro, err_micro
    FROM hw WHERE tstep >= {_HW_P}
    """,
)
def q380_holt_winters(spark, sf_dir):
    """ADDITIVE HOLT-WINTERS (level + trend + period-7
    seasonality, alpha = beta = gamma = 1/2) of the daily event
    series - the third member of the exponential-smoothing family
    (SES q346, Holt q357) and the one that fits real ops traffic:
    q335's decomposition showed the weekly cycle; HW tracks it
    adaptively, and |y - (l + b + s)| is the deseasonalized anomaly
    residual. Warm-up: level = mean of the first week (floor micro),
    trend = 0, seasonals = first-week deviations; smoothing starts at
    step 7 + 1.

        l_t = (y_t - s_(t-p))/2 + (l_(t-1) + b_(t-1))/2
        b_t = (l_t - l_(t-1))/2 + b_(t-1)/2
        s_t = (y_t - l_t)/2 + s_(t-p)/2

    Exactness: the recursion runs literally in integer micro-units
    with the engines' shared truncating division (the q357
    discipline); the seasonal state is a rolling 7-slot integer
    vector, carried as a LIST in the recursive-CTE oracle and as a
    Python deque in the driver loop. Engines cannot disagree.

    Scale: the fact-sized work is ONE groupBy(day); the recursion
    runs on the CALENDAR-bounded daily aggregate (7+2 bigints
    of state - the q177/q357 bounded-driver class) and ships back as
    a literal frame."""
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(
            F.floor(
                (F.col("ts_us") - F.lit(EVENTS_EPOCH_US)) / F.lit(US_PER_DAY)
            ).alias("day_idx")
        )
        .agg(F.count("*").cast("long").alias("y"))
    )
    rows = sorted((r["day_idx"], r["y"]) for r in daily.collect())
    p = _HW_P

    def tdiv(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    out = []
    if len(rows) >= p:
        l = tdiv(sum(y for _, y in rows[:p]) * 1_000_000, p)
        b = 0
        seas = [y * 1_000_000 - l for _, y in rows[:p]]
        out.append((rows[p - 1][0], rows[p - 1][1], l, b, seas[-1], None))
        for day_idx, y in rows[p:]:
            sp = seas.pop(0)
            err = abs(y * 1_000_000 - (l + b + sp))
            l_new = tdiv(y * 1_000_000 - sp, 2) + tdiv(l + b, 2)
            b_new = tdiv(l_new - l, 2) + tdiv(b, 2)
            s_new = tdiv(y * 1_000_000 - l_new, 2) + tdiv(sp, 2)
            seas.append(s_new)
            l, b = l_new, b_new
            out.append((day_idx, y, l, b, s_new, err))
    return spark.createDataFrame(
        out,
        "day_idx long, y long, l_micro long, b_micro long,"
        " season_micro long, err_micro long",
    )


# ---------------------------------------------------------------------------
# q384: Haar wavelet energy decomposition of the daily series
# ---------------------------------------------------------------------------

#: dyadic span: days 0..31 (5 levels), absent days count 0 events.
_HAAR_SPAN = 32
_HAAR_LEVELS = 5


@query(
    "q384_haar_energy",
    oracle=f"""
    WITH daily AS (
      SELECT {EPOCH_DAY_SQL} AS d,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events
      WHERE {EPOCH_DAY_SQL}
            BETWEEN 0 AND {_HAAR_SPAN - 1}
      GROUP BY 1
    ),
    lv AS (SELECT UNNEST(range(1, {_HAAR_LEVELS + 1})) AS level),
    coeffs AS (
      SELECT lv.level,
             daily.d // (1 << lv.level) AS block,
             CAST(SUM(CASE WHEN (daily.d % (1 << lv.level))
                                < (1 << (lv.level - 1))
                           THEN daily.y ELSE -daily.y END) AS BIGINT) AS c
      FROM daily, lv
      GROUP BY 1, 2
    )
    SELECT level,
           CAST(COUNT(*) AS BIGINT) AS n_blocks,
           CAST(SUM(c * c) AS BIGINT) AS energy,
           CAST(MAX(ABS(c)) AS BIGINT) AS max_abs_coeff
    FROM coeffs GROUP BY level
    """,
)
def q384_haar_energy(spark, sf_dir):
    """UNNORMALIZED HAAR WAVELET energy decomposition of the daily
    event series (levels 1..5 over the dyadic
    32-day span): the level-l detail coefficient of each
    2^l-day block is (first-half sum) - (second-half sum), so
    per-level ENERGY localizes variation by time scale - level 1
    energy = day-to-day jitter, level 3 = intra-week shifts
    (q335/q380's seasonality shows up here), level 5 = the
    month-halves trend. The multiresolution screen a capacity planner
    runs before choosing which smoother (q346/q357/q380) fits.

    Exactness: with the unnormalized Haar basis every coefficient is
    a +/-1-signed integer sum of daily counts - no division, no
    sqrt(2) normalization (per-level energies are comparable WITHIN a
    level; the docstring is the contract) - so coefficients, energies
    and maxima are pure bigint.

    Scale: one groupBy(day) collapses the fact; the coefficient
    relation is the calendar-bounded daily aggregate crossed with a
    5-row level grid (bounded-frame class) and
    re-grouped - 32 x 5 rows, constant at any
    corpus size."""
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(
            F.floor(
                (F.col("ts_us") - F.lit(EVENTS_EPOCH_US)) / F.lit(US_PER_DAY)
            ).alias("d")
        )
        .agg(F.count("*").cast("long").alias("y"))
        .filter(F.col("d").between(0, _HAAR_SPAN - 1))
    )
    lv = spark.range(1, _HAAR_LEVELS + 1).select(F.col("id").alias("level"))
    coeffs = (
        daily.crossJoin(F.broadcast(lv))
        .groupBy(
            "level",
            F.expr("d DIV (1 << CAST(level AS INT))").alias("block"),
        )
        .agg(
            F.sum(
                F.when(
                    F.expr(
                        "(d % (1 << CAST(level AS INT)))"
                        " < (1 << (CAST(level AS INT) - 1))"
                    ),
                    F.col("y"),
                ).otherwise(-F.col("y"))
            )
            .cast("long")
            .alias("c")
        )
    )
    return coeffs.groupBy("level").agg(
        F.count("*").cast("long").alias("n_blocks"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("energy"),
        F.max(F.abs("c")).cast("long").alias("max_abs_coeff"),
    )


# ---------------------------------------------------------------------------
# q392: Wald-Wolfowitz runs test on the daily series
# ---------------------------------------------------------------------------


@query(
    "q392_runs_test",
    oracle=f"""
    WITH daily AS (
      SELECT {EPOCH_DAY_SQL} AS d,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    med AS (
      SELECT y AS m FROM (
        SELECT y, ROW_NUMBER() OVER (ORDER BY y, d) AS rn,
               COUNT(*) OVER () AS n
        FROM daily
      ) WHERE rn = (n + 1) // 2
    ),
    signs AS (
      SELECT d, CASE WHEN daily.y > med.m THEN 1 ELSE 0 END AS s
      FROM daily, med
    ),
    runs AS (
      SELECT s,
             CASE WHEN LAG(s) OVER (ORDER BY d) IS NULL
                       OR LAG(s) OVER (ORDER BY d) <> s
                  THEN 1 ELSE 0 END AS is_start
      FROM signs
    ),
    agg AS (
      SELECT CAST(SUM(is_start) AS BIGINT) AS r,
             CAST(SUM(s) AS BIGINT) AS n1,
             CAST(SUM(1 - s) AS BIGINT) AS n2
      FROM runs
    )
    SELECT r AS n_runs, n1 AS n_above, n2 AS n_below,
           ROUND(1.0 + 2.0 * n1 * n2 / (n1 + n2), 6) AS expected_runs,
           ROUND((r - (1.0 + 2.0 * n1 * n2 / (n1 + n2)))
                 / SQRT(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                        / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1))), 6)
             AS z_score
    FROM agg
    """,
)
def q392_runs_test(spark, sf_dir):
    """WALD-WOLFOWITZ RUNS TEST of the daily event series against its
    median: count the runs of consecutive above/below-median days and
    compare with the exchangeability expectation 1 + 2*n1*n2/n -
    too FEW runs (z << 0) means trending/sticky days (q377's slope or
    q380's seasonality is real structure), too MANY means
    oscillation. The randomness sanity check that decides whether the
    time-series operators upstream have anything to model; days equal
    to the median count as "below" on both engines alike.

    Exactness: the median is an exact order statistic
    (rank (n+1) DIV 2 over the calendar-bounded aggregate), runs and
    category counts are exact integers via one LAG window; the
    z-score is one identical expression over them (correctly-rounded
    SQRT), rounded at 6dp.

    Scale: the fact collapses to the per-day aggregate; the rank and
    LAG windows run on that bounded frame (adjudicated
    bounded-aggregate global windows)."""
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(
            F.floor(
                (F.col("ts_us") - F.lit(EVENTS_EPOCH_US)) / F.lit(US_PER_DAY)
            ).alias("d")
        )
        .agg(F.count("*").cast("long").alias("y"))
    )
    wr = Window.orderBy("y", "d")
    wn = Window.partitionBy()
    med = (
        daily.select(
            "y",
            F.row_number().over(wr).alias("rn"),
            F.count("*").over(wn).alias("n"),
        )
        .filter(F.col("rn") == F.expr("(n + 1) DIV 2"))
        .limit(1)
        .select(F.col("y").alias("m"))
    )
    signs = daily.crossJoin(F.broadcast(med)).select(
        "d", (F.col("y") > F.col("m")).cast("int").alias("s")
    )
    wd = Window.orderBy("d")
    runs = signs.select(
        "s",
        F.when(
            F.lag("s").over(wd).isNull()
            | (F.lag("s").over(wd) != F.col("s")),
            1,
        )
        .otherwise(0)
        .alias("is_start"),
    )
    agg = runs.agg(
        F.sum("is_start").cast("long").alias("r"),
        F.sum("s").cast("long").alias("n1"),
        F.sum(1 - F.col("s")).cast("long").alias("n2"),
    )
    return agg.select(
        F.col("r").alias("n_runs"),
        F.col("n1").alias("n_above"),
        F.col("n2").alias("n_below"),
        F.round(
            1.0 + 2.0 * F.col("n1") * F.col("n2") / (F.col("n1") + F.col("n2")),
            6,
        ).alias("expected_runs"),
        F.round(
            (
                F.col("r")
                - (
                    1.0
                    + 2.0
                    * F.col("n1")
                    * F.col("n2")
                    / (F.col("n1") + F.col("n2"))
                )
            )
            / F.nullif(
                F.sqrt(
                    2.0
                    * F.col("n1")
                    * F.col("n2")
                    * (
                        2.0 * F.col("n1") * F.col("n2")
                        - F.col("n1")
                        - F.col("n2")
                    )
                    / F.nullif(
                        (F.col("n1") + F.col("n2"))
                        * (F.col("n1") + F.col("n2"))
                        * (F.col("n1") + F.col("n2") - 1),
                        F.lit(0),
                    )
                ),
                F.lit(0.0),
            ),
            6,
        ).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# q402: Ljung-Box portmanteau test on the daily event series
# ---------------------------------------------------------------------------

#: portmanteau depth: the same 1..10 lag band q336 reports.
_LB_LAGS = 10

#: Q = n(n+2) * sum_k r_k^2/(n-k), assembled from micro-quantized
#: autocorrelations: per-lag term (rk_micro^2) DIV (n - k) summed as
#: bigint (order-free), then one identical double expression.
_LB_Q = (
    "(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0)"
    " * CAST(qsum AS DOUBLE) / 1000000000000.0)"
)


@query(
    "q402_ljung_box",
    oracle=f"""
    WITH daily AS (
      SELECT {EPOCH_DAY_SQL}
               AS day_idx,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS s,
             CAST(SUM(y * y) AS BIGINT) AS ss
      FROM daily
    ),
    pairs AS (
      SELECT b.day_idx - a.day_idx AS lag_k,
             CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(a.y * b.y) AS BIGINT) AS p,
             CAST(SUM(a.y + b.y) AS BIGINT) AS tsum
      FROM daily a JOIN daily b
        ON b.day_idx - a.day_idx BETWEEN 1 AND {_LB_LAGS}
      GROUP BY 1
    ),
    rk AS (
      SELECT pairs.lag_k, pairs.n_pairs,
             ((tot.n * tot.n * pairs.p
               - tot.n * tot.s * pairs.tsum
               + pairs.n_pairs * tot.s * tot.s) * 1000000)
             // (tot.n * tot.n * tot.ss - tot.n * tot.s * tot.s)
               AS rk_micro,
             tot.n AS n
      FROM pairs, tot
    ),
    q AS (
      SELECT CAST(SUM((rk_micro * rk_micro) // (n - lag_k)) AS BIGINT)
               AS qsum
      FROM rk
    )
    SELECT rk.lag_k, rk.n_pairs, CAST(rk.rk_micro AS BIGINT) AS rk_micro,
           ROUND({_LB_Q}, 6) AS lb_q,
           CAST({_LB_LAGS} AS BIGINT) AS dof
    FROM rk, q
    """,
)
def q402_ljung_box(spark, sf_dir):
    """LJUNG-BOX PORTMANTEAU test over lags 1..10 of the
    daily event-count series: q336 reports the per-lag ACF values;
    this collapses them into the single omnibus Q = n(n+2) sum
    r_k^2/(n-k) that answers "is there ANY serial structure left?" -
    the standard residual-whiteness check run after q335's seasonal
    decomposition or q346/q357's smoothing fits, and the
    drift-monitor null-picker (i.i.d. vs drift-aware) for q260.

    Exactness: per-lag autocorrelations reuse q336's n^2-scaled
    integer identity and quantize to MICRO-UNIT bigints via one
    truncating division ((numer * 1e6) DIV denom - both engines
    truncate toward zero); the portmanteau fold is then
    (rk_micro^2) DIV (n - k) summed as bigint (order-independent by
    construction); Q is one identical expression string, rounded
    once.

    Scale: identical to q336 - the fact collapses to the CALENDAR-
    bounded daily aggregate, the lag stage is a broadcast non-equi
    self-join of that ~|days|-row frame (q327 adjudicated-BNLJ
    class), and everything after is 10-row arithmetic."""
    daily = transient_persist(
        t(spark, sf_dir, "events")
        .groupBy(
            F.floor(
                (F.col("ts_us") - F.lit(EVENTS_EPOCH_US))
                / F.lit(US_PER_DAY)
            ).alias("day_idx")
        )
        .agg(F.count("*").cast("long").alias("y"))
    )
    tot = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("ss"),
    )
    a = daily.select(
        F.col("day_idx").alias("day_a"), F.col("y").alias("ya")
    )
    b = daily.select(
        F.col("day_idx").alias("day_b"), F.col("y").alias("yb")
    )
    pairs = (
        a.join(
            F.broadcast(b),
            (F.col("day_b") - F.col("day_a")).between(1, _LB_LAGS),
        )
        .groupBy((F.col("day_b") - F.col("day_a")).alias("lag_k"))
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.sum(F.col("ya") * F.col("yb")).cast("long").alias("p"),
            F.sum(F.col("ya") + F.col("yb")).cast("long").alias("tsum"),
        )
    )
    rk = transient_persist(
        pairs.crossJoin(F.broadcast(tot)).select(
            "lag_k",
            "n_pairs",
            F.expr(
                "((n * n * p - n * s * tsum + n_pairs * s * s)"
                " * 1000000) DIV (n * n * ss - n * s * s)"
            ).alias("rk_micro"),
            "n",
        )
    )
    q = rk.groupBy("n").agg(
        F.sum(F.expr("(rk_micro * rk_micro) DIV (n - lag_k)"))
        .cast("long")
        .alias("qsum")
    )
    return rk.crossJoin(F.broadcast(q.select("qsum"))).select(
        "lag_k",
        "n_pairs",
        F.col("rk_micro").cast("long").alias("rk_micro"),
        F.round(F.expr(_LB_Q), 6).alias("lb_q"),
        F.lit(_LB_LAGS).cast("long").alias("dof"),
    )


# ---------------------------------------------------------------------------
# q401: banded interval-overlap self-join of user activity sessions
# ---------------------------------------------------------------------------

#: session timeout; the active interval is [first_event, last_event +
#: timeout) - the standard "session plus its idle tail" convention,
#: which also keeps single-event sessions full-width instead of
#: degenerate points.
_IVJ_GAP_US = 30 * 60 * 1_000_000
_IVJ_TOPK = 15


@query(
    "q401_session_overlap_join",
    oracle=f"""
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS t FROM events
    ),
    lagged AS (
      SELECT user_id, t,
             CASE WHEN LAG(t) OVER w IS NULL
                  OR t - LAG(t) OVER w > {_IVJ_GAP_US} THEN 1
                  ELSE 0 END AS brk
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY t)
    ),
    sess AS (
      SELECT user_id, t,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM lagged
    ),
    iv AS (
      SELECT user_id, sid,
             CAST(MIN(t) AS BIGINT) AS s0,
             CAST(MAX(t) + {_IVJ_GAP_US} AS BIGINT) AS s1
      FROM sess GROUP BY 1, 2
    ),
    a AS (
      SELECT user_id, sid, s0, s1, d AS day_idx
      FROM iv,
           UNNEST(generate_series((s0 - {EVENTS_EPOCH_US}) // {US_PER_DAY},
                                  (s1 - {EVENTS_EPOCH_US}) // {US_PER_DAY}))
             AS u(d)
    ),
    b AS (
      SELECT user_id, sid, s0, s1,
             (s0 - {EVENTS_EPOCH_US}) // {US_PER_DAY} AS day_idx
      FROM iv
    ),
    pairs AS (
      SELECT a.user_id AS user_a, b.user_id AS user_b,
             LEAST(a.s1, b.s1) - b.s0 AS ov_us
      FROM a JOIN b USING (day_idx)
      WHERE a.user_id != b.user_id
        AND b.s0 < a.s1
        AND (b.s0 > a.s0 OR (b.s0 = a.s0 AND b.user_id > a.user_id))
    )
    SELECT CAST(user_a AS BIGINT) AS user_a,
           CAST(user_b AS BIGINT) AS user_b,
           CAST(COUNT(*) AS BIGINT) AS n_overlaps,
           CAST(SUM(ov_us) AS BIGINT) AS overlap_us
    FROM pairs
    GROUP BY 1, 2
    ORDER BY n_overlaps DESC, user_a, user_b
    LIMIT {_IVJ_TOPK}
    """,
)
def q401_session_overlap_join(spark, sf_dir):
    """BANDED INTERVAL-OVERLAP SELF-JOIN: which user pairs are active
    in overlapping sessions, and for how long? Sessions are 30-min-
    gap sessionized activity intervals [first, last + timeout); the
    overlap join is the general-purpose interval primitive behind
    co-presence analytics, contention detection, and ad-attribution
    windows - the PAIR-producing sibling of q154's peak-concurrency
    counter and q56's point-in-range join.

    The scale device is the DAY-BAND + LATER-START canonicalization:
    side A explodes each interval to the day buckets it spans
    (sequence(start_day, end_day) - fan-out bounded by interval
    length / 1 day), side B keys by START day only, and the match
    requires b.s0 in [a.s0, a.s1) with ties broken by user id - so
    every overlapping pair is found EXACTLY ONCE (the later starter's
    start day is always inside the earlier session's span), with no
    all-pairs stage and no double counting. At 100 TB the join is a
    plain shuffle equi-join on (day) with per-day partitions.

    Exactness: all interval arithmetic is epoch-micro bigint; overlap
    duration LEAST(a.s1, b.s1) - b.s0 is integer; counts/sums are
    integer folds; top-15 orders by (count DESC, user_a,
    user_b) - fully deterministic."""
    ev = t(spark, sf_dir, "events").select(
        "user_id", F.col("ts_us").alias("t")
    )
    wu = Window.partitionBy("user_id").orderBy("t")
    lagged = ev.select(
        "user_id",
        "t",
        F.when(
            F.lag("t").over(wu).isNull()
            | ((F.col("t") - F.lag("t").over(wu)) > _IVJ_GAP_US),
            1,
        )
        .otherwise(0)
        .alias("brk"),
    )
    sess = lagged.select(
        "user_id",
        "t",
        F.sum("brk")
        .over(
            wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .alias("sid"),
    )
    iv = transient_persist(
        sess.groupBy("user_id", "sid").agg(
            F.min("t").cast("long").alias("s0"),
            (F.max("t") + F.lit(_IVJ_GAP_US)).cast("long").alias("s1"),
        )
    )
    a = iv.select(
        F.col("user_id").alias("ua"),
        F.col("s0").alias("a0"),
        F.col("s1").alias("a1"),
        F.explode(
            F.sequence(
                F.expr(f"(s0 - {EVENTS_EPOCH_US}) DIV {US_PER_DAY}"),
                F.expr(f"(s1 - {EVENTS_EPOCH_US}) DIV {US_PER_DAY}"),
            )
        ).alias("day_idx"),
    )
    b = iv.select(
        F.col("user_id").alias("ub"),
        F.col("s0").alias("b0"),
        F.col("s1").alias("b1"),
        F.expr(f"(s0 - {EVENTS_EPOCH_US}) DIV {US_PER_DAY}").alias(
            "day_idx"
        ),
    )
    pairs = (
        a.join(b, "day_idx")
        .filter(
            (F.col("ua") != F.col("ub"))
            & (F.col("b0") < F.col("a1"))
            & (
                (F.col("b0") > F.col("a0"))
                | ((F.col("b0") == F.col("a0")) & (F.col("ub") > F.col("ua")))
            )
        )
        .select(
            F.col("ua").alias("user_a"),
            F.col("ub").alias("user_b"),
            (F.least("a1", "b1") - F.col("b0")).alias("ov_us"),
        )
    )
    return (
        pairs.groupBy("user_a", "user_b")
        .agg(
            F.count("*").cast("long").alias("n_overlaps"),
            F.sum("ov_us").cast("long").alias("overlap_us"),
        )
        .select(
            F.col("user_a").cast("long").alias("user_a"),
            F.col("user_b").cast("long").alias("user_b"),
            "n_overlaps",
            "overlap_us",
        )
        .orderBy(F.desc("n_overlaps"), "user_a", "user_b")
        .limit(_IVJ_TOPK)
    )
