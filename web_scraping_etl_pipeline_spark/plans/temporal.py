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

from .common import t
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
           (epoch_us(ts) - 1704067200000000) // 604800000000 AS week_idx,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY CUBE (event_type,
                   (epoch_us(ts) - 1704067200000000) // 604800000000)
    """,
)
def q38_event_cube(spark, sf_dir):
    """CUBE aggregation (all 4 grouping combinations of event_type x
    week) - completes the grouping-sets family next to q26's ROLLUP.
    Spark expands the cube before the hash aggregate; partial
    aggregation still applies per grouping set."""
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
