"""Temporal join operators Spark lacks as built-ins - as-of join and
range join - expressed as scale-safe compositions of existing DataFrame
ops (the brief's preferred strategy (a); no Pandas UDF needed).

As-of join: the naive formulation (equi-join on key + inequality on
time + argmax) explodes to |left_per_key| x |right_per_key| intermediate
pairs before the aggregate prunes them - a skew bomb at 100 TB. The
classic scale-safe plan used here is union + window:

  1. tag both inputs and union them (no join at all),
  2. one window per key ordered by (time, tag) carries the most recent
     right-side row forward,
  3. keep left rows, read the carried value.

Cost: ONE shuffle of |left|+|right| rows (the window's hash partition
by key) - linear, skew-tolerant (AQE splits a hot key's sort, and no
pair blowup exists to begin with).

Range join: equi-bucketize time (bucket width == range width), explode
the probe side to its 3 adjacent buckets, equi-join on (key, bucket),
then exact-filter |dt| <= width. Pair count is bounded by rows per
(key, bucket) - never a full inequality cross join (which Spark plans
as BroadcastNestedLoopJoin).

DuckDB has native ASOF JOIN, which is the oracle for q55.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from .common import (
    ANCHOR_US,
    EPOCH_DAY_SQL,
    EVENTS_EPOCH_US,
    US_PER_DAY,
    fdiv_sql,
    t,
)
from .registry import query

#: range-join window half-width: 6 hours in microseconds.
RANGE_US = 6 * 3600 * 1_000_000


@query(
    "q55_asof_join",
    oracle="""
    SELECT l.event_id,
           l.user_id,
           epoch_us(l.ts) AS ts_us,
           r.event_id AS prior_event_id,
           epoch_us(r.ts) AS prior_ts_us,
           ROUND(r.value, 6) AS prior_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') l
    ASOF JOIN (SELECT * FROM events WHERE event_type <> 'purchase') r
      ON l.user_id = r.user_id AND epoch_us(l.ts) >= epoch_us(r.ts)
    """,
)
def q55_asof_join(spark, sf_dir):
    """As-of (backward) join: each purchase matched to the same user's
    most recent earlier non-purchase event. Union + per-key window -
    one linear shuffle, no pair explosion; the oracle is DuckDB's
    native ASOF JOIN."""
    ev = t(spark, sf_dir, "events")
    right = ev.filter(F.col("event_type") != "purchase").select(
        "user_id",
        "ts_us",
        F.lit(0).alias("tag"),
        F.col("event_id").alias("r_event_id"),
        F.col("value").alias("r_value"),
        F.lit(None).cast("long").alias("l_event_id"),
    )
    left = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts_us",
        F.lit(1).alias("tag"),
        F.lit(None).cast("long").alias("r_event_id"),
        F.lit(None).cast("double").alias("r_value"),
        F.col("event_id").alias("l_event_id"),
    )
    # tag orders right rows before left rows at equal ts: "at or before"
    # semantics (inclusive), matching ASOF JOIN's >=.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = right.unionByName(left).select(
        "user_id",
        "ts_us",
        "tag",
        "l_event_id",
        F.last(
            F.when(
                F.col("tag") == 0,
                F.struct("ts_us", "r_event_id", "r_value"),
            ),
            ignorenulls=True,
        )
        .over(w)
        .alias("prior"),
    )
    return (
        carried.filter((F.col("tag") == 1) & F.col("prior").isNotNull())
        .select(
            F.col("l_event_id").alias("event_id"),
            "user_id",
            "ts_us",
            F.col("prior.r_event_id").alias("prior_event_id"),
            F.col("prior.ts_us").alias("prior_ts_us"),
            F.round("prior.r_value", 6).alias("prior_value"),
        )
    )


@query(
    "q56_range_join",
    oracle=f"""
    SELECT l.event_id,
           l.user_id,
           CAST(COUNT(r.event_id) AS BIGINT) AS nearby_events
    FROM (SELECT * FROM events WHERE event_type = 'purchase') l
    LEFT JOIN (SELECT * FROM events WHERE event_type <> 'purchase') r
      ON l.user_id = r.user_id
     AND abs(epoch_us(l.ts) - epoch_us(r.ts)) <= {RANGE_US}
    GROUP BY l.event_id, l.user_id
    """,
)
def q56_range_join(spark, sf_dir):
    """Range join: for each purchase, how many other events the same
    user produced within +-6 hours. Bucketized: probe side explodes to
    its 3 adjacent 6h buckets, equi-join on (user, bucket), exact
    |dt| filter after - pair count bounded per bucket, and the plan is
    a hash join, never BroadcastNestedLoopJoin."""
    ev = t(spark, sf_dir, "events")
    bucket = (F.col("ts_us") / F.lit(RANGE_US)).cast("long")
    right = ev.filter(F.col("event_type") != "purchase").select(
        "user_id",
        bucket.alias("bucket"),
        F.col("ts_us").alias("r_ts_us"),
        F.col("event_id").alias("r_event_id"),
    )
    left = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            "ts_us",
            F.explode(
                F.array(bucket - 1, bucket, bucket + 1)
            ).alias("bucket"),
        )
    )
    joined = left.join(right, ["user_id", "bucket"], "left")
    # count-if rather than filter-then-count: a purchase whose bucket
    # neighbors all fail the exact |dt| test must still appear with 0.
    within = F.when(
        F.abs(F.col("ts_us") - F.col("r_ts_us")) <= F.lit(RANGE_US),
        F.col("r_event_id"),
    )
    return joined.groupBy("event_id", "user_id").agg(
        F.count(within).alias("nearby_events")
    )


@query(
    "q38_event_cube",
    oracle=f"""
    SELECT event_type,
           {fdiv_sql('epoch_us(ts) - 1704067200000000', 604800000000)} AS week_idx,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY CUBE (event_type,
                   {fdiv_sql('epoch_us(ts) - 1704067200000000', 604800000000)})
    HAVING COUNT(*) > 0
    """,
)
def q38_event_cube(spark, sf_dir):
    """CUBE aggregation (all 4 grouping combinations of event_type x
    week) - completes the grouping-sets family next to q26's ROLLUP.
    Spark expands the cube before the hash aggregate; partial
    aggregation still applies per grouping set. The oracle's HAVING
    COUNT(*) > 0 pins empty-in/empty-out on both engines (the q26
    rollup-on-empty class; no-op on real data)."""
    ev = t(spark, sf_dir, "events")
    week = F.floor(
        (F.col("ts_us") - F.lit(1_704_067_200_000_000))
        / F.lit(604_800_000_000)
    ).alias("week_idx")
    return ev.cube(F.col("event_type"), week).agg(
        F.count("*").alias("cnt"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@query(
    "q39_value_quantiles",
    oracle="""
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5), 6) AS median_value,
           ROUND(quantile_cont(value, 0.9), 6) AS p90_value,
           ROUND(MIN(value), 6) AS min_value,
           ROUND(MAX(value), 6) AS max_value
    FROM events GROUP BY event_type
    """,
)
def q39_value_quantiles(spark, sf_dir):
    """Exact interpolated percentiles per group (Spark ``percentile`` ==
    DuckDB ``quantile_cont``, verified bit-equal after rounding). Exact
    percentile sorts per group; the 100 TB path swaps in
    ``approx_percentile`` (t-digest, mergeable map-side) at the cost of
    oracle exactness - the API shape is identical."""
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", 0.5), 6).alias("median_value"),
        F.round(F.percentile("value", 0.9), 6).alias("p90_value"),
        F.round(F.min("value"), 6).alias("min_value"),
        F.round(F.max("value"), 6).alias("max_value"),
    )


@query(
    "q70_session_window",
    oracle="""
    WITH x AS (
      SELECT user_id, epoch_us(ts) AS ts_us,
             LAG(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts)
             ) AS prev_us
      FROM events
    ),
    flagged AS (
      SELECT user_id, ts_us,
             SUM(CASE WHEN prev_us IS NULL
                        OR ts_us - prev_us > 1800000000
                      THEN 1 ELSE 0 END) OVER (
               PARTITION BY user_id ORDER BY ts_us
               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM x
    )
    SELECT user_id,
           MIN(ts_us) AS session_start_us,
           MAX(ts_us) + 1800000000 AS session_end_us,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM flagged GROUP BY user_id, session_id
    """,
)
def q70_session_window(spark, sf_dir):
    """Native ``session_window`` sessionization (30-min gap): Spark's
    built-in session operator, vs q28's hand-rolled gaps-and-islands.
    The oracle derives identical sessions via lag + running-sum islands;
    Spark's session end == last event + gap, matching ``MAX(ts)+gap``.

    Same single-shuffle scale shape as a window function, and this form
    carries to Structured Streaming unchanged (session_window +
    watermark = streaming sessionization with state eviction)."""
    from ..sources.star import with_event_time

    ev = with_event_time(t(spark, sf_dir, "events"))
    sw = F.session_window(F.col("event_time"), "30 minutes")
    return (
        ev.groupBy("user_id", sw.alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# q88: SCD Type-2 history build (gaps-and-islands over a change stream)
# ---------------------------------------------------------------------------


@query(
    "q88_scd2_history",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
      FROM events
    ),
    rn AS (
      SELECT user_id, event_type, ts_us,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts_us, event_id)
             - ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts_us, event_id) AS island
      FROM ev
    ),
    runs AS (
      SELECT user_id, event_type, island,
             MIN(ts_us) AS valid_from_us,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM rn GROUP BY user_id, event_type, island
    )
    SELECT user_id, event_type,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY valid_from_us, event_type,
                                            island) AS BIGINT)
             AS version,
           valid_from_us,
           LEAD(valid_from_us) OVER (PARTITION BY user_id
                                     ORDER BY valid_from_us, event_type,
                                              island) AS valid_to_us,
           (LEAD(valid_from_us) OVER (PARTITION BY user_id
                                      ORDER BY valid_from_us, event_type,
                                               island) IS NULL)
             AS is_current,
           n_events
    FROM runs
    """,
)
def q88_scd2_history(spark, sf_dir):
    """Slowly-changing-dimension Type-2 build from a change stream:
    collapse each user's consecutive same-type events into runs
    (gaps-and-islands via the row_number difference trick), then emit
    one versioned row per run with [valid_from, valid_to) ranges -
    valid_to NULL on the open current row. This is the CDC -> dimension
    -history operator every warehouse ETL needs; the reference's
    update-in-place jobs table (SURVEY section 2.6 C8) is the Type-1
    special case of this.

    Plan: two windows and one aggregate, ALL partitioned by user_id -
    a single shuffle end to end, and AQE coalesces the window stages.
    No self-join: the island trick replaces the quadratic
    previous-row-lookup formulation.

    The version/lead window orders by (valid_from_us, event_type,
    island) - a TOTAL order (island values are unique per (user,
    type) by the gaps-and-islands invariant, engine-identical given
    the (ts_us, event_id) base order). In contract valid_from is
    unique per user and the extra keys are a no-op; the r13 extreme
    census proved two runs CAN tie on valid_from (same-microsecond
    events of different types), where the bare ordering left version
    assignment engine-dependent."""
    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts_us", "event_id"
    )
    w_all = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    w_type = Window.partitionBy("user_id", "event_type").orderBy(
        "ts_us", "event_id"
    )
    rn = ev.select(
        "user_id",
        "event_type",
        "ts_us",
        (F.row_number().over(w_all) - F.row_number().over(w_type)).alias(
            "island"
        ),
    )
    runs = rn.groupBy("user_id", "event_type", "island").agg(
        F.min("ts_us").alias("valid_from_us"),
        F.count("*").cast("long").alias("n_events"),
    )
    w_runs = Window.partitionBy("user_id").orderBy(
        "valid_from_us", "event_type", "island"
    )
    valid_to = F.lead("valid_from_us").over(w_runs)
    return runs.select(
        "user_id",
        "event_type",
        F.row_number().over(w_runs).cast("long").alias("version"),
        "valid_from_us",
        valid_to.alias("valid_to_us"),
        valid_to.isNull().alias("is_current"),
        "n_events",
    )


# ---------------------------------------------------------------------------
# q89: ordered funnel conversion (view -> click -> purchase)
# ---------------------------------------------------------------------------


@query(
    "q89_funnel_conversion",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
    ),
    v AS (
      SELECT user_id, MIN(ts_us) AS t_view
      FROM ev WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts_us) AS t_click
      FROM ev e JOIN v ON e.user_id = v.user_id AND e.ts_us > v.t_view
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts_us) AS t_purchase
      FROM ev e JOIN c ON e.user_id = c.user_id AND e.ts_us > c.t_click
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
           (c.t_click IS NOT NULL) AS reached_click,
           (p.t_purchase IS NOT NULL) AS reached_purchase
    FROM v LEFT JOIN c ON v.user_id = c.user_id
           LEFT JOIN p ON v.user_id = p.user_id
    """,
)
def q89_funnel_conversion(spark, sf_dir):
    """Ordered three-stage funnel: the first view, the first click
    STRICTLY AFTER that view, and the first purchase strictly after
    that click, per user - the sequential-dependency funnel (a click
    before the first view does not count). Product-analytics staple
    the reference's SQL suite gestures at with its per-status counts.

    Plan: each stage is filter -> partial-agg -> equi-join, every
    shuffle keyed on user_id so one Exchange partitioning is reused
    through all three stages and the two assembling left joins; stage
    inputs shrink monotonically (click stage only scans users who
    viewed). No windows over the raw stream and no self-join on
    events."""
    ev = t(spark, sf_dir, "events").select("user_id", "event_type", "ts_us")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts_us") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts_us") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t_purchase"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "t_view",
            "t_click",
            "t_purchase",
            F.col("t_click").isNotNull().alias("reached_click"),
            F.col("t_purchase").isNotNull().alias("reached_purchase"),
        )
    )


@query(
    "q98_rolling_active_users",
    oracle=f"""
    WITH act AS (
      SELECT DISTINCT user_id,
             {EPOCH_DAY_SQL} AS day
      FROM events
    ),
    bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM act),
    spine AS (
      SELECT unnest(range((SELECT lo FROM bounds),
                          (SELECT hi FROM bounds) + 1)) AS day
    ),
    exp AS (SELECT user_id, day + r.d AS day FROM act, range(0, 7) r(d))
    SELECT s.day, CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS active_7d
    FROM spine s LEFT JOIN exp e ON e.day = s.day
    GROUP BY s.day
    """,
)
def q98_rolling_active_users(spark, sf_dir):
    """Rolling 7-day active users per day (the DAU/WAU family):
    each (user, active-day) pair is replicated to the 7 days it keeps
    the user "active" for (``sequence`` + ``explode``), turning the
    sliding-range count-distinct - which no window frame can express
    over DISTINCT - into a plain equi-group-by.

    Scale: the explode is a bounded x7 fan-out of the *deduplicated*
    (user, day) set, not the raw events; both shuffles (the distinct,
    the day rollup) partial-aggregate map-side. This replicate-to-
    buckets trick is the same shape as the q56 range join - a range
    predicate traded for a constant fan-out equi-key."""
    ev = t(spark, sf_dir, "events")
    day = F.floor(
        (F.col("ts_us") - F.lit(EVENTS_EPOCH_US)) / F.lit(US_PER_DAY)
    ).alias("day")
    act = ev.select("user_id", day).distinct()
    spine = (
        act.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
        .select(F.explode(F.sequence("lo", "hi")).alias("day"))
    )
    exp = act.select(
        "user_id",
        F.explode(F.sequence(F.col("day"), F.col("day") + F.lit(6))).alias(
            "day"
        ),
    )
    roll = exp.groupBy("day").agg(
        F.count_distinct("user_id").alias("active_7d")
    )
    return spine.join(roll, "day", "left").select(
        "day", F.coalesce("active_7d", F.lit(0)).cast("long").alias("active_7d")
    )


@query(
    "q100_cdc_apply",
    oracle="""
    WITH r AS (
      SELECT user_id, event_id, event_type, value, epoch_us(ts) AS ts_us,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC
             ) AS rn
      FROM events
    )
    SELECT user_id, event_type AS last_type,
           ROUND(value, 6) AS last_value,
           ts_us AS last_ts_us
    FROM r WHERE rn = 1 AND event_type <> 'error'
    """,
)
def q100_cdc_apply(spark, sf_dir):
    """CDC changelog apply, latest-wins with tombstones: collapse the
    event stream to each key's most recent change (deterministic
    (ts, event_id) ordering) and drop keys whose final change is a
    tombstone ('error' here) - the MERGE/upsert semantics a mutable
    sink applies, computed as a pure batch query.

    Scale: ONE map-side-combinable max_by aggregation - the shuffle
    carries a single candidate row per key, vs the window/row_number
    formulation that sorts every partition. On a real lakehouse sink
    this exact plan feeds ``MERGE INTO`` as its source."""
    ev = t(spark, sf_dir, "events")
    ordk = F.struct(F.col("ts_us"), F.col("event_id"))
    latest = ev.groupBy("user_id").agg(
        F.max_by("event_type", ordk).alias("last_type"),
        F.round(F.max_by("value", ordk), 6).alias("last_value"),
        F.max_by("ts_us", ordk).alias("last_ts_us"),
    )
    return latest.filter(F.col("last_type") != "error")


#: epoch chunk width for the two-phase balance walk (weekly).
_BAL_CHUNK_US = 7 * 86_400_000_000


def _balance_deltas(spark, sf_dir):
    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts_us", "event_type", "value"
    )
    delta = (
        F.when(F.col("event_type") == "purchase", F.col("value"))
        .when(F.col("event_type") == "error", -F.col("value"))
        .otherwise(F.lit(0.0))
        .cast("double")
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts_us",
        delta.alias("delta"),
        F.expr(f"ts_us DIV {_BAL_CHUNK_US}").alias("chunk"),
    )


def q124_unchunked_reference(spark, sf_dir):
    """The direct per-key sequential recurrence (whole history as one
    Arrow group) - kept as the validation twin for q124's chunked
    plan; NOT registered (it is the shape that breaks on a hot key
    whose history exceeds a worker batch)."""
    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts_us", "event_type", "value"
    )

    def walk(pdf):
        pdf = pdf.sort_values(["ts_us", "event_id"])
        bal, out = 0.0, []
        for etype, val in zip(pdf["event_type"], pdf["value"]):
            if etype == "purchase":
                bal += float(val)
            elif etype == "error":
                bal -= float(val)
            if bal < 0.0:
                bal = 0.0
            out.append(bal)
        pdf = pdf.assign(balance=[round(b, 6) for b in out])
        return pdf[["user_id", "event_id", "balance"]]

    return ev.groupBy("user_id").applyInPandas(
        walk, "user_id long, event_id long, balance double"
    )


@query(
    "q124_capped_running_balance",
    oracle="""
    WITH RECURSIVE base AS (
      SELECT user_id, event_id,
             CASE WHEN event_type = 'purchase' THEN value
                  WHEN event_type = 'error' THEN -value
                  ELSE 0 END AS delta,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ) AS rn
      FROM events
    ),
    walk AS (
      SELECT user_id, event_id, rn, GREATEST(0, delta) AS bal
      FROM base WHERE rn = 1
      UNION ALL
      SELECT b.user_id, b.event_id, b.rn, GREATEST(0, w.bal + b.delta)
      FROM walk w JOIN base b ON b.user_id = w.user_id AND b.rn = w.rn + 1
    )
    SELECT user_id, event_id, ROUND(bal, 6) AS balance FROM walk
    """,
)
def q124_capped_running_balance(spark, sf_dir):
    """Floor-capped running balance per user (credits from purchases,
    debits from errors, balance can never go below zero): LOOKS like a
    non-linear scan no window can express - max(0, prev + delta)
    depends on the clamped previous value - but the reflected-walk
    identity closes it:

        balance_i = max(0, prefix_i - min(0, min_{j<=i} prefix_j))

    (a zero-floor walk equals the free walk minus its running minimum
    below zero). That makes the whole query TWO stacked per-user
    window passes - cumulative SUM, then cumulative MIN of that sum -
    plain JVM whole-stage-codegen, one shuffle on user_id, no Python
    anywhere. The oracle is the genuine sequential recursion (DuckDB
    recursive CTE stepping rn -> rn+1), so the hash match proves the
    identity.

    For recurrences with NO such closed form, the epoch-chunked
    two-phase template lives right above
    (:func:`q124_chunked_reference`: per-chunk max-plus summaries,
    per-user carry over summaries, parallel per-chunk walks) and is
    pinned equal to this form and to the single-group sequential walk
    in ``tests/test_new_ops_invariants.py``."""
    d = _balance_deltas(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pre = d.withColumn("prefix", F.sum("delta").over(w)).withColumn(
        "runmin", F.min("prefix").over(w)
    )
    balance = F.greatest(
        F.lit(0.0), F.col("prefix") - F.least(F.lit(0.0), F.col("runmin"))
    )
    return pre.select(
        "user_id", "event_id", F.round(balance, 6).alias("balance")
    )


def q124_chunked_reference(spark, sf_dir):
    """Epoch-CHUNKED two-phase walk - the template for per-key
    recurrences with carried state when no closed form exists (and the
    proof that a hot key's history never has to fit one worker batch).
    The clamp recurrence composes: a run of deltas collapses to
    (S = sum, M = max(0, max suffix-sum)) with
    ``b_out = max(M, b_in + S)`` - a max-plus monoid:

      1. per (user, weekly chunk): S and M from a PARTITIONED window
         (prefix sums; max suffix-sum == S - min prefix) - pure SQL;
      2. per user over its CHUNK SUMMARIES (|chunks| rows, tiny): one
         sequential carry loop emits each chunk's opening balance
         (``applyInPandas`` with carried state);
      3. per (user, chunk) with the opening balance joined back: the
         exact clamped walk over just that chunk's rows - all chunks
         run in PARALLEL.

    Not the registered q124 plan (the closed form above is pure-JVM
    and per-group Python overhead dominates at |users| x |weeks|
    group counts); kept as the tested carried-state template."""
    d = _balance_deltas(spark, sf_dir)

    wuc = Window.partitionBy("user_id", "chunk").orderBy(
        "ts_us", "event_id"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pre = d.withColumn("prefix", F.sum("delta").over(wuc))
    summaries = pre.groupBy("user_id", "chunk").agg(
        F.sum("delta").alias("S"),
        F.least(F.lit(0.0), F.min("prefix")).alias("minp"),
    ).withColumn(
        "M", F.greatest(F.lit(0.0), F.col("S") - F.col("minp"))
    )

    def carry(pdf):
        pdf = pdf.sort_values("chunk")
        b, opens = 0.0, []
        for s, m in zip(pdf["S"], pdf["M"]):
            opens.append(b)
            b = max(m, b + s)
        return pdf.assign(b_in=opens)[["user_id", "chunk", "b_in"]]

    opening = summaries.groupBy("user_id").applyInPandas(
        carry, "user_id long, chunk long, b_in double"
    )

    def walk_chunk(pdf):
        pdf = pdf.sort_values(["ts_us", "event_id"])
        bal, out = float(pdf["b_in"].iloc[0]), []
        for dv in pdf["delta"]:
            bal += float(dv)
            if bal < 0.0:
                bal = 0.0
            out.append(bal)
        pdf = pdf.assign(balance=[round(b, 6) for b in out])
        return pdf[["user_id", "event_id", "balance"]]

    return (
        d.join(opening, ["user_id", "chunk"])
        .groupBy("user_id", "chunk")
        .applyInPandas(
            walk_chunk, "user_id long, event_id long, balance double"
        )
    )


@query(
    "q127_abandoned_sessions",
    oracle="""
    WITH x AS (
      SELECT user_id, event_type, epoch_us(ts) AS ts_us,
             LAG(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts)
             ) AS prev_us
      FROM events
    ),
    flagged AS (
      SELECT user_id, event_type, ts_us,
             SUM(CASE WHEN prev_us IS NULL
                        OR ts_us - prev_us > 1800000000
                      THEN 1 ELSE 0 END) OVER (
               PARTITION BY user_id ORDER BY ts_us
               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM x
    ),
    sess AS (
      SELECT user_id, session_id,
             MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
               AS has_view,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS has_purchase
      FROM flagged GROUP BY user_id, session_id
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN has_view = 1 AND has_purchase = 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_abandoned,
           ROUND(SUM(CASE WHEN has_view = 1 AND has_purchase = 0
                     THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 4) AS abandon_rate
    FROM sess GROUP BY user_id
    """,
)
def q127_abandoned_sessions(spark, sf_dir):
    """Session abandonment: per user, the fraction of 30-min-gap
    sessions that contain a view but never convert to a purchase - the
    funnel-health metric q89 (strict-order funnel) and q70 (session
    boundaries) compose into.

    Scale: native ``session_window`` + two nested aggregates, all
    partitioned on ``user_id`` - the session assignment and both
    rollups reuse ONE hash partitioning (no second shuffle; AQE
    coalesces)."""
    from ..sources.star import with_event_time

    ev = with_event_time(t(spark, sf_dir, "events"))
    sw = F.session_window(F.col("event_time"), "30 minutes")
    sess = ev.groupBy("user_id", sw.alias("w")).agg(
        F.max(
            F.when(F.col("event_type") == "view", 1).otherwise(0)
        ).alias("has_view"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("has_purchase"),
    )
    abandoned = (F.col("has_view") == 1) & (F.col("has_purchase") == 0)
    return sess.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.sum(F.when(abandoned, 1).otherwise(0)).cast("long").alias(
            "n_abandoned"
        ),
        F.round(
            F.sum(F.when(abandoned, 1).otherwise(0))
            / F.count("*").cast("double"),
            4,
        ).alias("abandon_rate"),
    )


@query(
    "q134_time_weighted_avg",
    oracle="""
    WITH x AS (
      SELECT user_id, value, epoch_us(ts) AS ts_us,
             LEAD(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ) - epoch_us(ts) AS dt_us
      FROM events
    )
    SELECT user_id,
           ROUND(SUM(value * dt_us) / NULLIF(SUM(dt_us), 0), 6)
             AS twa_value,
           CAST(COUNT(dt_us) AS BIGINT) AS n_intervals
    FROM x WHERE dt_us IS NOT NULL
    GROUP BY user_id
    """,
)
def q134_time_weighted_avg(spark, sf_dir):
    """Time-weighted average of an irregularly-sampled signal: each
    observation holds until the next one, so its weight is the holding
    duration (LEAD - current) - the correct mean for sensor/price
    series where a plain AVG over-weights bursts.

    Scale: one shuffle on ``user_id`` shared by the LEAD window and
    the final aggregate (exchange reuse); weights are computed
    in-partition, the weighted sum map-side-combines."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    x = ev.select(
        "user_id",
        "value",
        (F.lead("ts_us").over(w) - F.col("ts_us")).alias("dt_us"),
    ).filter(F.col("dt_us").isNotNull())
    return x.groupBy("user_id").agg(
        # NULLIF guard: a user whose events all share one timestamp
        # (the r12 constant-value-corpus census) has SUM(dt_us) = 0 -
        # undefined holding-time mean, NULL on both engines.
        F.round(
            F.sum(F.col("value") * F.col("dt_us"))
            / F.expr("NULLIF(SUM(dt_us), 0)"),
            6,
        ).alias("twa_value"),
        F.count("dt_us").alias("n_intervals"),
    )


@query(
    "q135_ohlc_bars",
    oracle=f"""
    WITH x AS (
      SELECT user_id, value,
             {EPOCH_DAY_SQL} AS day_idx,
             ROW_NUMBER() OVER (
               PARTITION BY user_id,
                 {EPOCH_DAY_SQL}
               ORDER BY epoch_us(ts), event_id) AS rn_f,
             ROW_NUMBER() OVER (
               PARTITION BY user_id,
                 {EPOCH_DAY_SQL}
               ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn_l
      FROM events
    )
    SELECT user_id, day_idx,
           ROUND(MAX(CASE WHEN rn_f = 1 THEN value END), 6) AS open,
           ROUND(MAX(value), 6) AS high,
           ROUND(MIN(value), 6) AS low,
           ROUND(MAX(CASE WHEN rn_l = 1 THEN value END), 6) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_ticks
    FROM x GROUP BY 1, 2
    """,
)
def q135_ohlc_bars(spark, sf_dir):
    """OHLC bars: per user per day, the first (open), max (high), min
    (low), and last (close) observed value - the time-series
    downsampling rollup behind every candlestick chart and feature
    window, built from min_by/max_by with a deterministic
    (time, event_id) ordering key.

    Scale: ONE map-side-combinable aggregate - argmin/argmax carry a
    single candidate through the shuffle, so this beats the
    window-based first/last formulation (which must sort every
    partition) at any size."""
    ev = t(spark, sf_dir, "events")
    day = F.floor(
        (F.col("ts_us") - F.lit(EVENTS_EPOCH_US)) / F.lit(US_PER_DAY)
    ).alias("day_idx")
    ordk = F.struct(F.col("ts_us"), F.col("event_id"))
    return ev.groupBy("user_id", day).agg(
        F.round(F.min_by("value", ordk), 6).alias("open"),
        F.round(F.max("value"), 6).alias("high"),
        F.round(F.min("value"), 6).alias("low"),
        F.round(F.max_by("value", ordk), 6).alias("close"),
        F.count("*").alias("n_ticks"),
    )


@query(
    "q138_interval_coalesce",
    oracle="""
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS ts_us,
             epoch_us(ts) + 300000000 AS end_us
      FROM events
    ), m AS (
      SELECT user_id, ts_us, end_us,
             MAX(end_us) OVER (
               PARTITION BY user_id ORDER BY ts_us
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS prev_end
      FROM e
    ), b AS (
      SELECT user_id, ts_us, end_us,
             CASE WHEN prev_end IS NULL OR ts_us > prev_end
                  THEN 1 ELSE 0 END AS brk
      FROM m
    ), i AS (
      SELECT user_id, ts_us, end_us,
             SUM(brk) OVER (
               PARTITION BY user_id ORDER BY ts_us
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS island
      FROM b
    )
    SELECT user_id,
           CAST(island AS BIGINT) AS interval_seq,
           MIN(ts_us) AS start_us,
           MAX(end_us) AS end_us,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM i GROUP BY 1, 2
    """,
)
def q138_interval_coalesce(spark, sf_dir):
    """Interval coalescing: merge each user's overlapping activity
    intervals ([ts, ts+5min) per event) into maximal disjoint spans -
    the union-of-intervals primitive behind uptime/SLA math, ad-break
    stitching, and DVR watch-span dedup.

    Gaps-and-islands via a running MAX of interval end: a new island
    starts exactly where an event's start exceeds every prior end.
    Scale: ONE shuffle (hash by ``user_id``) + an in-partition sort
    feeds both windows and the final per-island aggregate; no join, no
    pair expansion, and island numbering restarts per user so the
    output is deterministic under any tie order (equal starts always
    land in the same island)."""
    ev = t(spark, sf_dir, "events").select(
        "user_id", "ts_us", (F.col("ts_us") + F.lit(300_000_000)).alias("end_us")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us")
    prev_end = F.max("end_us").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    brk = F.when(
        prev_end.isNull() | (F.col("ts_us") > prev_end), F.lit(1)
    ).otherwise(F.lit(0))
    island = F.sum(brk).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.withColumn("island", island)
        .groupBy("user_id", F.col("island").alias("interval_seq"))
        .agg(
            F.min("ts_us").alias("start_us"),
            F.max("end_us").alias("end_us"),
            F.count("*").alias("n_events"),
        )
    )


@query(
    "q144_last_touch_attribution",
    oracle="""
    WITH u AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
             CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS tag,
             CASE WHEN event_type = 'click' THEN event_id END AS c_id,
             CASE WHEN event_type = 'click' THEN epoch_us(ts) END AS c_ts
      FROM events WHERE event_type IN ('click', 'purchase')
    ), w AS (
      SELECT *,
             last_value(c_id IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts_us, tag, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS lc_id,
             last_value(c_ts IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts_us, tag, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS lc_ts
      FROM u
    )
    SELECT event_id AS purchase_id,
           user_id,
           ts_us AS purchase_ts_us,
           CASE WHEN lc_ts IS NOT NULL
                 AND ts_us - lc_ts <= 604800000000
                THEN lc_id END AS click_id,
           (lc_ts IS NOT NULL AND ts_us - lc_ts <= 604800000000)
             AS attributed
    FROM w WHERE event_type = 'purchase'
    """,
)
def q144_last_touch_attribution(spark, sf_dir):
    """Last-touch attribution: each purchase is credited to the user's
    most recent click within a 7-day lookback (clicks at the same
    instant count - the tag column sorts clicks before purchases).

    Same union+window shape as the as-of join (q55): no
    purchase x click pair blowup, ONE shuffle on ``user_id``, and the
    carried last-click columns come from ``last(..., ignorenulls)``
    over the merged, time-ordered stream. The lookback filter is a
    plain projection afterwards. At 100 TB this is the attribution
    plan that survives a hot user (AQE splits the sort, no join
    explosion exists)."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    u = ev.select(
        "user_id",
        "event_id",
        "event_type",
        "ts_us",
        F.when(F.col("event_type") == "click", 0).otherwise(1).alias("tag"),
        F.when(F.col("event_type") == "click", F.col("event_id")).alias("c_id"),
        F.when(F.col("event_type") == "click", F.col("ts_us")).alias("c_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "tag", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "*",
        F.last("c_id", ignorenulls=True).over(w).alias("lc_id"),
        F.last("c_ts", ignorenulls=True).over(w).alias("lc_ts"),
    )
    lookback_ok = F.col("lc_ts").isNotNull() & (
        F.col("ts_us") - F.col("lc_ts") <= F.lit(7 * 86_400_000_000)
    )
    return carried.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts_us").alias("purchase_ts_us"),
        F.when(lookback_ok, F.col("lc_id")).alias("click_id"),
        lookback_ok.alias("attributed"),
    )


@query(
    "q161_time_to_convert",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(epoch_us(ts)) AS first_view_us
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ), p AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) AS first_purchase_us
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'purchase'
        AND epoch_us(e.ts) >= v.first_view_us
      GROUP BY e.user_id
    )
    SELECT v.user_id, v.first_view_us,
           p.first_purchase_us,
           p.first_purchase_us - v.first_view_us AS convert_us
    FROM v LEFT JOIN p ON p.user_id = v.user_id
    """,
)
def q161_time_to_convert(spark, sf_dir):
    """Time-to-convert: per user, the gap between the first view and
    the first purchase at-or-after it (NULL = never converted) - the
    product-analytics latency metric behind activation dashboards.

    Two map-side-combinable aggregates joined on ``user_id``: first
    views, then first qualifying purchases (the >= bound keeps
    purchases that precede any view from counting as conversions).
    Both shuffles hash the same key, so AQE plans the second join
    shuffle-free at scale."""
    ev = t(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("first_view_us"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts_us") >= F.col("first_view_us"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("first_purchase_us"))
    )
    return v.join(p, "user_id", "left").select(
        "user_id",
        "first_view_us",
        "first_purchase_us",
        (F.col("first_purchase_us") - F.col("first_view_us")).alias(
            "convert_us"
        ),
    )


@query(
    "q179_scd2_asof_snapshot",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
      FROM events
    ),
    rn AS (
      SELECT user_id, event_type, ts_us,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts_us, event_id)
             - ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts_us, event_id) AS island
      FROM ev
    ),
    runs AS (
      SELECT user_id, event_type, island,
             MIN(ts_us) AS valid_from_us
      FROM rn GROUP BY user_id, event_type, island
    ),
    hist AS (
      SELECT user_id, event_type,
             CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY valid_from_us) AS BIGINT)
               AS version,
             valid_from_us,
             LEAD(valid_from_us) OVER (PARTITION BY user_id
                                       ORDER BY valid_from_us)
               AS valid_to_us
      FROM runs
    )
    SELECT user_id, event_type AS state_asof, version, valid_from_us
    FROM hist
    WHERE valid_from_us <= {ANCHOR_US}
      AND (valid_to_us IS NULL OR valid_to_us > {ANCHOR_US})
    """,
)
def q179_scd2_asof_snapshot(spark, sf_dir):
    """Point-in-time (AS OF) reconstruction over the SCD2 history: the
    version of every user's state whose validity interval contains the
    anchor timestamp - the time-travel read a warehouse runs against a
    type-2 dimension ("what did we believe about each user on Jan
    15?"). Exactly one row per user active before the anchor, by the
    intervals' half-open disjointness (pinned in
    tests/test_new_ops_invariants-style checks for q88).

    Scale: the history build is q88's gaps-and-islands pass (one
    user_id shuffle); the AS OF filter is a predicate on the
    materialized history, and on a real deployment the history table
    is stored partitioned/z-ordered on (valid_from, valid_to) so the
    snapshot reads only overlapping files. Looking up a dim state at
    EACH FACT's event time (rather than one global anchor) is the same
    history joined through q56's bucketized range-join shape."""
    hist = q88_scd2_history(spark, sf_dir)
    return hist.filter(
        (F.col("valid_from_us") <= F.lit(ANCHOR_US))
        & (
            F.col("valid_to_us").isNull()
            | (F.col("valid_to_us") > F.lit(ANCHOR_US))
        )
    ).select(
        "user_id",
        F.col("event_type").alias("state_asof"),
        "version",
        "valid_from_us",
    )


@query(
    "q198_top_session_paths",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
      FROM events
    ),
    g AS (
      SELECT user_id, event_type, ts_us, event_id,
             CASE WHEN LAG(ts_us) OVER (PARTITION BY user_id
                                        ORDER BY ts_us, event_id)
                       IS NULL
                    OR ts_us - LAG(ts_us) OVER (PARTITION BY user_id
                                                ORDER BY ts_us, event_id)
                       > 1800000000
                  THEN 1 ELSE 0 END AS brk
      FROM ev
    ),
    s AS (
      SELECT user_id, event_type, ts_us, event_id,
             SUM(brk) OVER (PARTITION BY user_id
                            ORDER BY ts_us, event_id
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM g
    ),
    paths AS (
      SELECT user_id, sid,
             string_agg(event_type, '>' ORDER BY ts_us, event_id)
               AS path
      FROM s GROUP BY user_id, sid
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path
    LIMIT 20
    """,
)
def q198_top_session_paths(spark, sf_dir):
    """Clickstream path analysis: the most common full event-type
    sequences per 30-minute session - sessionize (gaps-and-islands on
    the inactivity gap), render each session's ORDERED path string,
    count identical paths corpus-wide, top 20.

    Scale: sessionization + path rendering share one user_id shuffle
    and one in-partition sort; the ordered concatenation is
    array_sort over collect_list of (ts, id, type) structs (struct
    order = sort key order, deterministic - same device as q112's
    ordered string agg, NOT a nondeterministic collect_list). The
    path-frequency count shuffles path strings (bounded by session
    count), and top-k is TakeOrderedAndProject. Long sessions are the
    skew risk: a runaway session's path string grows unboundedly, so
    a production variant caps events per session (the reference data
    maxes out far below any limit)."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap = F.col("ts_us") - F.lag("ts_us").over(w)
    g = ev.select(
        "user_id",
        "event_type",
        "ts_us",
        "event_id",
        F.when(
            gap.isNull() | (gap > 1_800_000_000), 1
        ).otherwise(0).alias("brk"),
    )
    s = g.withColumn(
        "sid",
        F.sum("brk").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    paths = (
        s.groupBy("user_id", "sid")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct("ts_us", "event_id", "event_type")
                )
            ).alias("seq")
        )
        .select(
            # string_agg parity: both engines SKIP NULL types inside a
            # path, and a session whose every type is NULL has a NULL
            # path, not '' - array_join ignores null elements but
            # joins an all-ignored array to the empty string (r13
            # partial-records census). In contract event_type is a
            # non-empty word, so NULLIF cannot fire on a real path.
            F.nullif(
                F.array_join(
                    F.expr("transform(seq, x -> x.event_type)"), ">"
                ),
                F.lit(""),
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q233: sequence-pattern match (CEP / MATCH_RECOGNIZE-lite)
# ---------------------------------------------------------------------------

#: pattern horizon: the purchase must follow the click within this many
#: microseconds.
_CEP_HORIZON_US = 600_000_000  # 10 minutes


@query(
    "q233_pattern_click_purchase",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_type, epoch_us(ts) AS tu, event_id FROM events
    ),
    clicks AS (SELECT * FROM e WHERE event_type = 'click'),
    pur AS (SELECT * FROM e WHERE event_type = 'purchase'),
    err AS (SELECT * FROM e WHERE event_type = 'error')
    SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
           p.tu - c.tu AS latency_us
    FROM clicks c
    JOIN LATERAL (
      SELECT tu, event_id FROM pur
      WHERE pur.user_id = c.user_id
        AND (pur.tu, pur.event_id) > (c.tu, c.event_id)
        AND pur.tu <= c.tu + {_CEP_HORIZON_US}
      ORDER BY tu, event_id LIMIT 1
    ) p ON TRUE
    WHERE NOT EXISTS (
      SELECT 1 FROM err
      WHERE err.user_id = c.user_id
        AND (err.tu, err.event_id) > (c.tu, c.event_id)
        AND err.tu < p.tu
    )
    """,
)
def q233_pattern_click_purchase(spark, sf_dir):
    """Sequence-PATTERN match (the MATCH_RECOGNIZE / CEP shape Spark
    has no native operator for): per user, every click followed by a
    purchase within 10 minutes with NO error event in between - the
    conversion-with-clean-path detector, matched on the FIRST
    qualifying purchase (event-id tie-break) so each click yields at
    most one row.

    Plan - NO self-join: one pass over the per-user event order with
    two conditional frame minima (``ROWS BETWEEN 1 FOLLOWING AND
    UNBOUNDED FOLLOWING``): the earliest following purchase rides a
    struct MIN (lexicographic (ts, id) = "first, tie-broken"), the
    earliest following error a plain MIN. A click matches iff its next
    purchase lands inside the horizon and precedes its next error.
    Single hash exchange on user_id; the oracle states the same
    pattern as LATERAL + NOT EXISTS, so the two engines reach the
    result by independent shapes."""
    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts_us", "event_id"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    np_struct = F.min(
        F.when(
            F.col("event_type") == "purchase",
            F.struct("ts_us", "event_id"),
        )
    ).over(w)
    ne_ts = F.min(
        F.when(F.col("event_type") == "error", F.col("ts_us"))
    ).over(w)
    flagged = ev.select(
        "user_id",
        "event_type",
        "ts_us",
        "event_id",
        np_struct.alias("np"),
        ne_ts.alias("ne"),
    ).filter(F.col("event_type") == "click")
    return (
        flagged.filter(
            F.col("np").isNotNull()
            & (F.col("np.ts_us") <= F.col("ts_us") + _CEP_HORIZON_US)
            & (F.col("ne").isNull() | (F.col("ne") >= F.col("np.ts_us")))
        )
        .select(
            "user_id",
            F.col("event_id").alias("click_id"),
            F.col("np.event_id").alias("purchase_id"),
            (F.col("np.ts_us") - F.col("ts_us")).alias("latency_us"),
        )
    )


# ---------------------------------------------------------------------------
# q235: late-data restatement (partition-scoped incremental recompute)
# ---------------------------------------------------------------------------


@query(
    "q235_late_data_restatement",
    oracle=f"""
    WITH ontime AS (
      SELECT (epoch_us(ts) // {US_PER_DAY}) * {US_PER_DAY} AS day_us,
             event_type, COUNT(*) AS n
      FROM events WHERE event_id % 50 <> 0
      GROUP BY 1, 2
    ),
    late AS (
      SELECT (epoch_us(ts) // {US_PER_DAY}) * {US_PER_DAY} AS day_us,
             event_type, COUNT(*) AS n
      FROM events WHERE event_id % 50 = 0
      GROUP BY 1, 2
    )
    SELECT late.day_us, late.event_type,
           CAST(COALESCE(ontime.n, 0) AS BIGINT) AS old_n,
           CAST(late.n AS BIGINT) AS late_n,
           CAST(COALESCE(ontime.n, 0) + late.n AS BIGINT) AS new_n
    FROM late LEFT JOIN ontime USING (day_us, event_type)
    """,
)
def q235_late_data_restatement(spark, sf_dir):
    """LATE-DATA restatement: a late-arriving batch (event_id % 50 == 0
    standing in for rows that missed their day's run) is folded into
    the already-finalized daily aggregate - and ONLY the (day, type)
    groups the late rows touch are restated, each reported with its
    old, late-delta and corrected value. This is the incremental
    alternative to "recompute the whole mart because yesterday's file
    arrived today", and the audit trail a restatement pipeline emits.

    Scale: the late batch is tiny by construction, so its aggregate
    broadcasts; joining it against the finalized mart touches only
    matching group keys, and on a day-partitioned mart the join keys
    prune the scan to the affected partitions (dynamic partition
    pruning - the restated days, nothing else). The fact table is
    never rescanned beyond those partitions; partial aggregates merge
    by addition (the q174 merge-law demonstrated per group)."""
    ev = t(spark, sf_dir, "events")
    # integer DIV (not float /): both engines truncate in integer
    # space, so exact-midnight timestamps can never flip a day bucket.
    day = F.expr(f"ts_us DIV {US_PER_DAY}") * US_PER_DAY
    ontime = (
        ev.filter(F.col("event_id") % 50 != 0)
        .groupBy(day.alias("day_us"), "event_type")
        .agg(F.count("*").alias("old_n"))
    )
    late = (
        ev.filter(F.col("event_id") % 50 == 0)
        .groupBy(day.alias("day_us"), "event_type")
        .agg(F.count("*").alias("late_n"))
    )
    return (
        late.join(ontime, ["day_us", "event_type"], "left")
        .select(
            "day_us",
            "event_type",
            F.coalesce("old_n", F.lit(0)).cast("long").alias("old_n"),
            F.col("late_n").cast("long").alias("late_n"),
            (F.coalesce("old_n", F.lit(0)) + F.col("late_n"))
            .cast("long")
            .alias("new_n"),
        )
    )


# ---------------------------------------------------------------------------
# q238: three-stage CEP funnel (view -> click -> purchase, staged windows)
# ---------------------------------------------------------------------------

#: stage horizons: the click must follow the view within one day;
#: the purchase follows the click within q233's 10-minute horizon.
_CEP_VIEW_HORIZON_US = 86_400_000_000


@query(
    "q238_pattern_three_stage",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_type, epoch_us(ts) AS tu, event_id FROM events
    ),
    clicks AS (SELECT * FROM e WHERE event_type = 'click'),
    pur AS (SELECT * FROM e WHERE event_type = 'purchase'),
    err AS (SELECT * FROM e WHERE event_type = 'error'),
    views AS (SELECT * FROM e WHERE event_type = 'view'),
    mclick AS (
      SELECT c.user_id, c.event_id AS click_id, c.tu AS c_tu,
             p.event_id AS purchase_id, p.tu AS p_tu
      FROM clicks c
      JOIN LATERAL (
        SELECT tu, event_id FROM pur
        WHERE pur.user_id = c.user_id
          AND (pur.tu, pur.event_id) > (c.tu, c.event_id)
          AND pur.tu <= c.tu + {_CEP_HORIZON_US}
        ORDER BY tu, event_id LIMIT 1
      ) p ON TRUE
      WHERE NOT EXISTS (
        SELECT 1 FROM err
        WHERE err.user_id = c.user_id
          AND (err.tu, err.event_id) > (c.tu, c.event_id)
          AND err.tu < p.tu
      )
    )
    SELECT v.user_id, v.event_id AS view_id, m.click_id, m.purchase_id,
           m.p_tu - v.tu AS total_latency_us
    FROM views v
    JOIN LATERAL (
      SELECT click_id, purchase_id, p_tu FROM mclick
      WHERE mclick.user_id = v.user_id
        AND (mclick.c_tu, mclick.click_id) > (v.tu, v.event_id)
        AND mclick.c_tu <= v.tu + {_CEP_VIEW_HORIZON_US}
      ORDER BY c_tu, click_id LIMIT 1
    ) m ON TRUE
    """,
)
def q238_pattern_three_stage(spark, sf_dir):
    """THREE-stage sequence pattern: view -> first error-free
    click-to-purchase conversion starting within one day of the
    view - q233's two-stage CEP primitive COMPOSED: stage one computes
    the matched clicks (conditional frame minima, one user_id
    exchange), stage two unions views with those matched clicks and
    runs the SAME conditional-lookahead window over the combined
    per-user order. Arbitrary-depth patterns chain the identical move,
    each stage one window pass - never a growing join tree.

    Scale: two hash exchanges on user_id total (one per stage);
    intermediate width is one struct column per stage. The oracle
    reaches the same rows through nested LATERAL + NOT EXISTS -
    independent shapes, same semantics."""
    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts_us", "event_id"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    np_struct = F.min(
        F.when(
            F.col("event_type") == "purchase",
            F.struct("ts_us", "event_id"),
        )
    ).over(w)
    ne_ts = F.min(
        F.when(F.col("event_type") == "error", F.col("ts_us"))
    ).over(w)
    mclick = (
        ev.select(
            "user_id",
            "event_type",
            "ts_us",
            "event_id",
            np_struct.alias("np"),
            ne_ts.alias("ne"),
        )
        .filter(
            (F.col("event_type") == "click")
            & F.col("np").isNotNull()
            & (F.col("np.ts_us") <= F.col("ts_us") + _CEP_HORIZON_US)
            & (F.col("ne").isNull() | (F.col("ne") >= F.col("np.ts_us")))
        )
        .select(
            "user_id",
            F.col("ts_us").alias("c_ts"),
            F.col("event_id").alias("click_id"),
            F.col("np.event_id").alias("purchase_id"),
            F.col("np.ts_us").alias("p_ts"),
        )
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts_us").alias("o_ts"),
        F.col("event_id").alias("o_id"),
        F.lit("view").alias("tag"),
        F.lit(None).cast("long").alias("click_id"),
        F.lit(None).cast("long").alias("purchase_id"),
        F.lit(None).cast("long").alias("p_ts"),
    )
    mtag = mclick.select(
        "user_id",
        F.col("c_ts").alias("o_ts"),
        F.col("click_id").alias("o_id"),
        F.lit("mclick").alias("tag"),
        "click_id",
        "purchase_id",
        "p_ts",
    )
    combined = views.unionByName(mtag)
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("o_ts", "o_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    nm = F.min(
        F.when(
            F.col("tag") == "mclick",
            F.struct(
                F.col("o_ts").alias("c_ts"),
                "click_id",
                "purchase_id",
                "p_ts",
            ),
        )
    ).over(w2)
    return (
        combined.select("user_id", "o_ts", "o_id", "tag", nm.alias("nm"))
        .filter(
            (F.col("tag") == "view")
            & F.col("nm").isNotNull()
            & (F.col("nm.c_ts") <= F.col("o_ts") + _CEP_VIEW_HORIZON_US)
        )
        .select(
            "user_id",
            F.col("o_id").alias("view_id"),
            F.col("nm.click_id").alias("click_id"),
            F.col("nm.purchase_id").alias("purchase_id"),
            (F.col("nm.p_ts") - F.col("o_ts")).alias("total_latency_us"),
        )
    )


# ---------------------------------------------------------------------------
# q239: nearest as-of join with tolerance (completes the as-of matrix)
# ---------------------------------------------------------------------------

#: tolerance for the nearest-event match: one hour.
_NEAREST_TOL_US = 3_600_000_000


@query(
    "q239_asof_nearest",
    oracle=f"""
    WITH l AS (
      SELECT event_id, user_id, epoch_us(ts) AS tu FROM events
      WHERE event_type = 'purchase'
    ),
    r AS (
      SELECT event_id, user_id, epoch_us(ts) AS tu FROM events
      WHERE event_type <> 'purchase'
    )
    SELECT l.event_id, l.user_id, l.tu AS ts_us,
           n.event_id AS nearest_event_id,
           n.dt AS dt_us
    FROM l
    JOIN LATERAL (
      SELECT r.event_id, abs(l.tu - r.tu) AS dt
      FROM r
      WHERE r.user_id = l.user_id
        AND abs(l.tu - r.tu) <= {_NEAREST_TOL_US}
      ORDER BY abs(l.tu - r.tu),
               (r.tu > l.tu),
               CASE WHEN r.tu <= l.tu THEN -r.event_id ELSE r.event_id END
      LIMIT 1
    ) n ON TRUE
    """,
)
def q239_asof_nearest(spark, sf_dir):
    """NEAREST as-of join with tolerance - the third direction of the
    as-of matrix (backward: q55; the forward case is this plan's
    lookahead half alone): each purchase matched to the same user's
    closest other event within +-1 h, preferring the earlier side on
    exact distance ties. The sensor-fusion / trade-quote alignment
    shape pandas calls ``merge_asof(direction='nearest')`` and Spark
    has no operator for.

    Plan: q55's union trick extended with a SECOND conditional frame -
    one carry-forward window (latest right at-or-before, struct max by
    (ts, id)) and one lookahead window (earliest right after, struct
    min over the following frame) over the SAME per-user order, then a
    pure map-stage arbitration picks the nearer side. Still exactly
    ONE hash exchange of |left|+|right| rows; no pair explosion at any
    skew. The oracle reaches the same rows via LATERAL argmin."""
    ev = t(spark, sf_dir, "events")
    right = ev.filter(F.col("event_type") != "purchase").select(
        "user_id",
        "ts_us",
        F.lit(0).alias("tag"),
        F.col("event_id").alias("r_event_id"),
        F.lit(None).cast("long").alias("l_event_id"),
    )
    left = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts_us",
        F.lit(1).alias("tag"),
        F.lit(None).cast("long").alias("r_event_id"),
        F.col("event_id").alias("l_event_id"),
    )
    u = right.unionByName(left)
    order = [F.col("ts_us"), F.col("tag"), F.col("r_event_id")]
    w_prior = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    prior = F.last(
        F.when(F.col("tag") == 0, F.struct("ts_us", "r_event_id")),
        ignorenulls=True,
    ).over(w_prior)
    nxt = F.min(
        F.when(F.col("tag") == 0, F.struct("ts_us", "r_event_id"))
    ).over(w_next)
    c = (
        u.select(
            "user_id",
            "ts_us",
            "tag",
            "l_event_id",
            prior.alias("prior"),
            nxt.alias("nxt"),
        )
        .filter(F.col("tag") == 1)
    )
    dt_prior = F.when(
        F.col("prior").isNotNull(), F.col("ts_us") - F.col("prior.ts_us")
    )
    dt_next = F.when(
        F.col("nxt").isNotNull(), F.col("nxt.ts_us") - F.col("ts_us")
    )
    pick_prior = F.col("prior").isNotNull() & (
        F.col("nxt").isNull() | (dt_prior <= dt_next)
    )
    nearest_id = F.when(pick_prior, F.col("prior.r_event_id")).otherwise(
        F.col("nxt.r_event_id")
    )
    dt = F.when(pick_prior, dt_prior).otherwise(dt_next)
    return (
        c.filter(F.col("prior").isNotNull() | F.col("nxt").isNotNull())
        .select(
            F.col("l_event_id").alias("event_id"),
            "user_id",
            "ts_us",
            nearest_id.alias("nearest_event_id"),
            dt.alias("dt_us"),
        )
        .filter(F.col("dt_us") <= _NEAREST_TOL_US)
    )


# ---------------------------------------------------------------------------
# q240: interval-overlap join (bucketized, no inequality cross join)
# ---------------------------------------------------------------------------

#: half-width of the error-centered disruption window: 30 minutes.
_OVL_HALF_US = 1_800_000_000


@query(
    "q240_interval_overlap_join",
    oracle=f"""
    WITH a AS (
      SELECT user_id,
             epoch_us(ts) // {US_PER_DAY} AS day_idx,
             MIN(epoch_us(ts)) AS a_start,
             MAX(epoch_us(ts)) AS a_end
      FROM events WHERE event_type = 'click'
      GROUP BY 1, 2
    ),
    b AS (
      SELECT event_id AS error_id, user_id,
             epoch_us(ts) - {_OVL_HALF_US} AS b_start,
             epoch_us(ts) + {_OVL_HALF_US} AS b_end
      FROM events WHERE event_type = 'error'
    )
    SELECT a.user_id, CAST(a.day_idx AS BIGINT) AS day_idx,
           a.a_start, a.a_end, b.error_id,
           LEAST(a.a_end, b.b_end) - GREATEST(a.a_start, b.b_start)
             AS overlap_us
    FROM a JOIN b
      ON a.user_id = b.user_id
     AND a.a_start <= b.b_end AND b.b_start <= a.a_end
    """,
)
def q240_interval_overlap_join(spark, sf_dir):
    """INTERVAL-OVERLAP join: each user's daily click-activity span
    [first, last] joined to every +-30 min window around the same
    user's error events that OVERLAPS it (reporting the overlap
    length) - "which outage windows intersected the user's active
    session" , the temporal-join shape warehouses write as
    ``a.start <= b.end AND b.start <= a.end`` and engines nest-loop
    unless told better.

    Plan - never an inequality cross join: activity spans live inside
    one calendar day by construction, so the error windows (<= 1 h
    wide) are EXPLODED to the <= 2 day buckets they touch and the join
    is an equi-join on (user, day) with the exact overlap predicate as
    a post-filter. Pair count is bounded per (user, day); the general
    recipe (bucket by a width >= min interval length, replicate the
    narrower side) is q56's range-join pattern lifted to two interval
    sets."""
    ev = t(spark, sf_dir, "events")
    day = F.expr(f"ts_us DIV {US_PER_DAY}")
    a = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", day.alias("day_idx"))
        .agg(
            F.min("ts_us").alias("a_start"),
            F.max("ts_us").alias("a_end"),
        )
    )
    b = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        (F.col("ts_us") - _OVL_HALF_US).alias("b_start"),
        (F.col("ts_us") + _OVL_HALF_US).alias("b_end"),
    )
    b_days = b.select(
        "error_id",
        "user_id",
        "b_start",
        "b_end",
        F.explode(
            F.array_distinct(
                F.array(
                    F.expr(f"b_start DIV {US_PER_DAY}"),
                    F.expr(f"b_end DIV {US_PER_DAY}"),
                )
            )
        ).alias("day_idx"),
    )
    return (
        a.join(b_days, ["user_id", "day_idx"])
        .filter(
            (F.col("a_start") <= F.col("b_end"))
            & (F.col("b_start") <= F.col("a_end"))
        )
        .select(
            "user_id",
            F.col("day_idx").cast("long").alias("day_idx"),
            "a_start",
            "a_end",
            "error_id",
            (
                F.least("a_end", "b_end") - F.greatest("a_start", "b_start")
            ).alias("overlap_us"),
        )
    )


# ---------------------------------------------------------------------------
# q258: Kaplan-Meier survival curve (user lifetime with censoring)
# ---------------------------------------------------------------------------


@query(
    "q258_survival_curve",
    oracle=f"""
    WITH mx AS (
      SELECT MAX(epoch_us(ts)) // {US_PER_DAY} AS max_day FROM events
    ),
    u AS (
      SELECT user_id,
             MIN(epoch_us(ts)) // {US_PER_DAY} AS first_day,
             MAX(epoch_us(ts)) // {US_PER_DAY} AS last_day
      FROM events GROUP BY user_id
    ),
    obs AS (
      SELECT u.last_day - u.first_day AS t_days,
             u.last_day < mx.max_day AS churned
      FROM u, mx
    ),
    per_t AS (
      SELECT t_days,
             SUM(CASE WHEN churned THEN 1 ELSE 0 END) AS d,
             SUM(CASE WHEN churned THEN 0 ELSE 1 END) AS c
      FROM obs GROUP BY t_days
    ),
    km1 AS (
      SELECT t_days, d, c,
             (SELECT COUNT(*) FROM obs) -
               COALESCE(SUM(d + c) OVER (
                 ORDER BY t_days
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_risk
      FROM per_t
    ),
    km AS (
      SELECT t_days, d, c, n_risk,
             SUM(CASE WHEN d < n_risk
                      THEN ln(1.0 - d * 1.0 / n_risk) END)
               OVER (ORDER BY t_days
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS logS,
             MAX(CASE WHEN d >= n_risk THEN 1 ELSE 0 END)
               OVER (ORDER BY t_days
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS dead
      FROM km1
    )
    SELECT CAST(t_days AS BIGINT) AS t_days,
           CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS n_churn,
           CAST(c AS BIGINT) AS n_censored,
           CASE WHEN dead = 1 THEN 0.0
                ELSE ROUND(exp(logS), 4) END AS survival
    FROM km
    """,
)
def q258_survival_curve(spark, sf_dir):
    """KAPLAN-MEIER survival curve over user lifetimes: per user the
    observed span (first to last event day), users still active on the
    corpus's final day treated as CENSORED (their true lifetime is
    only known to exceed the observation), and the product-limit
    estimator S(t) = prod(1 - d_t/n_t) over churn days - survival
    analysis done honestly on truncated observation windows, which a
    naive "average lifetime" silently gets wrong by counting the
    censored as churned.

    Scale: one per-user aggregate over the fact, then everything lives
    on the BOUNDED per-day frame (|observed days| rows): the at-risk
    and log-survival running sums are windows over that frame (the
    adjudicated q153-class bounded-aggregate exception), and the
    product becomes exp-of-cumulative-log so both engines accumulate
    in the identical order."""
    ev = t(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.expr(f"MIN(ts_us) DIV {US_PER_DAY}").alias("first_day"),
        F.expr(f"MAX(ts_us) DIV {US_PER_DAY}").alias("last_day"),
    )
    mx = ev.agg(
        F.expr(f"MAX(ts_us) DIV {US_PER_DAY}").alias("max_day")
    )
    obs = u.crossJoin(F.broadcast(mx)).select(
        (F.col("last_day") - F.col("first_day")).alias("t_days"),
        (F.col("last_day") < F.col("max_day")).alias("churned"),
    )
    per_t = obs.groupBy("t_days").agg(
        F.sum(F.when(F.col("churned"), 1).otherwise(0)).alias("d"),
        F.sum(F.when(F.col("churned"), 0).otherwise(1)).alias("c"),
    )
    total = obs.count()  # bounded driver scalar (one aggregate)
    w_prev = (
        Window.orderBy("t_days")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_cum = Window.orderBy("t_days").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    n_risk = F.lit(total) - F.coalesce(
        F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0)
    )
    # d == n_risk (a churn day that exhausts the risk set) is a legal
    # KM input whose term is ln(0): DuckDB raises on ln(0) and Spark's
    # F.log returns NULL which SUM silently skips - both wrong. Guard
    # the term (NULL out the dead row) and pin survival to exactly 0
    # from the first such day onward, on BOTH engines.
    km = (
        per_t.withColumn("n_risk", n_risk)
        .withColumn(
            "logS",
            F.sum(
                F.when(
                    F.col("d") < F.col("n_risk"),
                    F.log(1.0 - F.col("d") / F.col("n_risk")),
                )
            ).over(w_cum),
        )
        .withColumn(
            "dead",
            F.max(
                (F.col("d") >= F.col("n_risk")).cast("int")
            ).over(w_cum),
        )
    )
    return km.select(
        F.col("t_days").cast("long").alias("t_days"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").cast("long").alias("n_churn"),
        F.col("c").cast("long").alias("n_censored"),
        F.when(F.col("dead") == 1, F.lit(0.0))
        .otherwise(F.round(F.exp("logS"), 4))
        .alias("survival"),
    )


# ---------------------------------------------------------------------------
# q353: U-shaped (position-based) multi-touch attribution
# ---------------------------------------------------------------------------

#: attribution lookback, micros (7 days - the q144 convention).
_MTA_LOOKBACK_US = 7 * 86_400_000_000

#: one conversion's credit in micro-units (1.0 == 10_000_000): first
#: and last touch take 40% each, the middle touches split 20%.
_MTA_TOTAL = 10_000_000
_MTA_END = 4_000_000
_MTA_MID_POOL = 2_000_000


@query(
    "q353_u_shaped_attribution",
    oracle=f"""
    WITH u AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS tag,
             CASE WHEN event_type = 'purchase' THEN event_id END AS p_id,
             CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END AS p_ts
      FROM events WHERE event_type IN ('click', 'view', 'purchase')
    ),
    w AS (
      SELECT *,
             last_value(p_id IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts_us DESC, tag DESC,
                                             event_id DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS conv_id,
             last_value(p_ts IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts_us DESC, tag DESC,
                                             event_id DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS conv_ts
      FROM u
    ),
    touches AS (
      SELECT event_id, event_type, conv_id,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY conv_id ORDER BY ts_us, event_id) AS BIGINT)
               AS pos,
             CAST(COUNT(*) OVER (PARTITION BY conv_id) AS BIGINT) AS n
      FROM w
      WHERE event_type IN ('click', 'view')
        AND conv_id IS NOT NULL
        AND conv_ts - ts_us <= {_MTA_LOOKBACK_US}
        AND conv_ts >= ts_us
    ),
    credited AS (
      SELECT event_type,
             CASE
               WHEN n = 1 THEN {_MTA_TOTAL}
               WHEN n = 2 THEN {_MTA_TOTAL // 2}
               WHEN pos = 1 OR pos = n THEN {_MTA_END}
               ELSE {_MTA_MID_POOL} // (n - 2)
                    + CASE WHEN pos - 1 <= {_MTA_MID_POOL} % (n - 2)
                           THEN 1 ELSE 0 END
             END AS credit_micro
      FROM touches
    ),
    bych AS (
      SELECT event_type AS channel,
             CAST(COUNT(*) AS BIGINT) AS n_touches,
             CAST(SUM(credit_micro) AS BIGINT) AS credit_micro
      FROM credited GROUP BY event_type
    ),
    tot AS (SELECT CAST(SUM(credit_micro) AS BIGINT) AS t FROM bych)
    SELECT b.channel, b.n_touches, b.credit_micro,
           ROUND(CAST(b.credit_micro AS DOUBLE) / tot.t, 6) AS credit_share
    FROM bych b, tot
    """,
)
def q353_u_shaped_attribution(spark, sf_dir):
    """U-SHAPED (position-based) multi-touch attribution: every
    purchase's credit is split 40/20/40 across the user's touchpoint
    path (clicks + views since the previous purchase, within a 7-day
    lookback) - first touch 40%, last touch 40%, middles share 20%.
    The multi-touch generalization of q144's last-touch rule.

    Touch-to-conversion assignment is the q144/q55 union+window shape
    run in REVERSE time order: the carried ``last(ignorenulls)`` over
    the DESC stream gives each touch the NEXT purchase of that user
    (same-instant purchases count, via the tag sort), so paths never
    overlap and no touch x purchase join exists.

    Exactness: credit is INTEGER micro-units; the 20% middle pool
    divides by floor with the remainder handed to the earliest
    middles one micro each (deterministic in both engines), so every
    path sums to exactly 10000000 and the channel rollup is a
    bigint sum - no float until the final 6dp share.

    Scale: two partitioned windows (user_id, then conv_id - both
    corpus-keyed, no global sort), one groupBy(channel), and a 1-row
    total frame crossed back (bounded-frame class). A hot user is one
    window partition - AQE-splittable, no join explosion anywhere."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view", "purchase")
    )
    is_p = F.col("event_type") == "purchase"
    u = ev.select(
        "user_id",
        "event_id",
        "event_type",
        "ts_us",
        is_p.cast("int").alias("tag"),
        F.when(is_p, F.col("event_id")).alias("p_id"),
        F.when(is_p, F.col("ts_us")).alias("p_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            F.col("ts_us").desc(), F.col("tag").desc(), F.col("event_id").desc()
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "*",
        F.last("p_id", ignorenulls=True).over(w).alias("conv_id"),
        F.last("p_ts", ignorenulls=True).over(w).alias("conv_ts"),
    )
    touches = carried.filter(
        F.col("event_type").isin("click", "view")
        & F.col("conv_id").isNotNull()
        & (F.col("conv_ts") - F.col("ts_us") <= _MTA_LOOKBACK_US)
        & (F.col("conv_ts") >= F.col("ts_us"))
    )
    wp = Window.partitionBy("conv_id").orderBy("ts_us", "event_id")
    wn = Window.partitionBy("conv_id")
    pos_n = touches.select(
        "event_type",
        F.row_number().over(wp).cast("long").alias("pos"),
        F.count("*").over(wn).cast("long").alias("n"),
    )
    credit = (
        F.when(F.col("n") == 1, F.lit(_MTA_TOTAL))
        .when(F.col("n") == 2, F.lit(_MTA_TOTAL // 2))
        .when(
            (F.col("pos") == 1) | (F.col("pos") == F.col("n")),
            F.lit(_MTA_END),
        )
        .otherwise(
            F.expr(
                f"{_MTA_MID_POOL} DIV (n - 2)"
                f" + CASE WHEN pos - 1 <= {_MTA_MID_POOL} % (n - 2)"
                f" THEN 1 ELSE 0 END"
            )
        )
    )
    bych = (
        pos_n.select(
            F.col("event_type").alias("channel"),
            credit.cast("long").alias("credit_micro"),
        )
        .groupBy("channel")
        .agg(
            F.count("*").cast("long").alias("n_touches"),
            F.sum("credit_micro").cast("long").alias("credit_micro"),
        )
    )
    tot = bych.agg(F.sum("credit_micro").cast("long").alias("t"))
    return bych.crossJoin(F.broadcast(tot)).select(
        "channel",
        "n_touches",
        "credit_micro",
        F.round(F.col("credit_micro").cast("double") / F.col("t"), 6).alias(
            "credit_share"
        ),
    )


# ---------------------------------------------------------------------------
# q385: session-gap sensitivity sweep
# ---------------------------------------------------------------------------

#: candidate inactivity gaps, micros: 15 min / 30 min / 60 min.
_GAP_SWEEP_US = (900_000_000, 1_800_000_000, 3_600_000_000)


@query(
    "q385_session_gap_sweep",
    oracle=f"""
    WITH g AS (
      SELECT user_id, epoch_us(ts) AS ts_us,
             LAG(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ) AS prev_us
      FROM events
    ),
    gaps AS (
      SELECT UNNEST([{", ".join(str(x) for x in _GAP_SWEEP_US)}]) AS gap_us
    ),
    marks AS (
      SELECT gaps.gap_us,
             CASE WHEN g.prev_us IS NULL
                       OR g.ts_us - g.prev_us > gaps.gap_us
                  THEN 1 ELSE 0 END AS is_start
      FROM g, gaps
    )
    SELECT gap_us,
           CAST(SUM(is_start) AS BIGINT) AS n_sessions,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST((1000 * COUNT(*)) // SUM(is_start) AS BIGINT)
             AS events_per_session_milli
    FROM marks GROUP BY gap_us
    """,
)
def q385_session_gap_sweep(spark, sf_dir):
    """SESSION-GAP SENSITIVITY SWEEP: session counts under 15/30/60-
    minute inactivity thresholds in ONE pass - the calibration table
    behind every sessionization constant (q28/q70 pin one gap; this
    query shows how much the metric moves if that constant is wrong,
    the elbow in n_sessions vs gap being the natural choice). Session
    count = number of session STARTS (prev gap exceeds the
    threshold), which needs no per-gap window: one LAG per user
    suffices for every threshold.

    Exactness: timestamps are epoch-micros bigints, starts are
    integer marks, the mean session length is floor-milli - all
    exact.

    Scale: ONE user-partitioned window (the expensive shuffle+sort,
    paid once), then the gap grid multiplies rows 3x in a map stage
    and collapses by gap - sweeping k thresholds costs k map
    duplicates, not k windows."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    g = ev.select(
        "ts_us", F.lag("ts_us").over(w).alias("prev_us")
    )
    gaps = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(x).cast("long") for x in _GAP_SWEEP_US])
        ).alias("gap_us")
    )
    marks = g.crossJoin(F.broadcast(gaps)).select(
        "gap_us",
        F.when(
            F.col("prev_us").isNull()
            | (F.col("ts_us") - F.col("prev_us") > F.col("gap_us")),
            1,
        )
        .otherwise(0)
        .alias("is_start"),
    )
    return marks.groupBy("gap_us").agg(
        F.sum("is_start").cast("long").alias("n_sessions"),
        F.count("*").cast("long").alias("n_events"),
        F.expr("(1000 * COUNT(*)) DIV SUM(is_start)")
        .cast("long")
        .alias("events_per_session_milli"),
    )
