"""Reference-parity query suite (script.sql Q1-Q5 + the C1-C8 scalar
vocabulary), recast onto the driver star schema per FIXTURES.md's
mapping: ``events`` plays ``staging_table``/``jobs_table`` (ts ~
posted/due date, value ~ salary), ``part``/``orders`` donate the raw
strings the scalar functions parse.

Determinism notes: the reference's NOW() (script.sql:54) becomes the
fixed ANCHOR_US instant; event time is epoch micros (see
plans/registry.py for the cross-engine rules).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions import (
    clean_salary_bounds_from,
    clean_title,
    parse_relative_seconds,
    render_remaining_time,
    salary_mean,
    salary_tokens,
)
from .common import ANCHOR_US, HORIZON_US, t
from .registry import query

# ---------------------------------------------------------------------------
# Q1 - deadline-horizon filter + C8 remaining-time render
# (script.sql:51-54 'deadline within the next 20 days' + :13-49)
# ---------------------------------------------------------------------------


@query(
    "q01_deadline_horizon",
    oracle=f"""
    SELECT event_id, event_type, value, epoch_us(ts) AS ts_us,
           CASE
             WHEN (epoch_us(ts) - {ANCHOR_US}) // 1000000 <= 0
               THEN 'Đã hết thời gian ứng tuyển'
             WHEN (epoch_us(ts) - {ANCHOR_US}) // 1000000 < 60
               THEN 'Còn ' || CAST((epoch_us(ts) - {ANCHOR_US}) // 1000000 AS VARCHAR) || ' giây để ứng tuyển'
             WHEN (epoch_us(ts) - {ANCHOR_US}) // 1000000 < 3600
               THEN 'Còn ' || CAST((epoch_us(ts) - {ANCHOR_US}) // 60000000 AS VARCHAR) || ' phút để ứng tuyển'
             WHEN (epoch_us(ts) - {ANCHOR_US}) // 1000000 < 86400
               THEN 'Còn ' || CAST((epoch_us(ts) - {ANCHOR_US}) // 3600000000 AS VARCHAR) || ' giờ để ứng tuyển'
             ELSE 'Còn ' || CAST((epoch_us(ts) - {ANCHOR_US}) // 86400000000 AS VARCHAR) || ' ngày để ứng tuyển'
           END AS remaining_time
    FROM events
    WHERE epoch_us(ts) <= {HORIZON_US}
    """,
)
def q01_deadline_horizon(spark, sf_dir):
    """F2 interval predicate + C8 render: rows 'due' within 20 days of
    the anchor, with the localized remaining-time string (the reference
    projects remaining_time in this query, script.sql:52)."""
    from ..sources.star import ts_us_le

    ev = t(spark, sf_dir, "events")
    return ev.filter(ts_us_le(ev, HORIZON_US)).select(
        "event_id",
        "event_type",
        "value",
        "ts_us",
        render_remaining_time(F.col("ts_us"), F.lit(ANCHOR_US)).alias(
            "remaining_time"
        ),
    )


# ---------------------------------------------------------------------------
# Q2 - numeric comparison (script.sql:56-59 'salary > 15')
# ---------------------------------------------------------------------------


@query(
    "q02_min_value",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events WHERE value > 150.0
    """,
)
def q02_min_value(spark, sf_dir):
    """F3: the 'salary > 15 million VND' predicate on events.value."""
    return (
        t(spark, sf_dir, "events")
        .filter(F.col("value") > 150.0)
        .select("event_id", "user_id", "event_type", "value")
    )


# ---------------------------------------------------------------------------
# Q3 - most recent first (script.sql:61-64)
# ---------------------------------------------------------------------------


@query(
    "q03_recent_first",
    oracle="""
    SELECT event_id, event_type, epoch_us(ts) AS ts_us
    FROM events ORDER BY ts_us DESC
    """,
)
def q03_recent_first(spark, sf_dir):
    """O1 full sort DESC by event time."""
    return (
        t(spark, sf_dir, "events")
        .select("event_id", "event_type", "ts_us")
        .orderBy(F.desc("ts_us"))
    )


# ---------------------------------------------------------------------------
# Q4 - filtered COUNT(*) with LIKE (script.sql:66-69)
# ---------------------------------------------------------------------------


@query(
    "q04_contains_count",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS cnt
    FROM documents WHERE text LIKE '%filter%'
    """,
)
def q04_contains_count(spark, sf_dir):
    """A1+F4: COUNT(*) under a substring predicate (the reference's
    job_location LIKE '%Hồ Chí Minh%')."""
    return (
        t(spark, sf_dir, "documents")
        .filter(F.col("text").contains("filter"))
        .agg(F.count("*").alias("cnt"))
    )


# ---------------------------------------------------------------------------
# Q5 - top-k (script.sql:71-76 'top 10 highest-paying in HCMC')
# ---------------------------------------------------------------------------


@query(
    "q05_top_paying",
    oracle="""
    SELECT event_id, user_id, value
    FROM events WHERE event_type = 'purchase'
    ORDER BY value DESC, event_id LIMIT 10
    """,
)
def q05_top_paying(spark, sf_dir):
    """O2 top-k: filter + ORDER BY value DESC LIMIT 10 (Spark plans
    TakeOrderedAndProject - no full sort/shuffle). event_id tie-break
    keeps the selected set deterministic across engines."""
    return (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "value")
        .orderBy(F.desc("value"), F.asc("event_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# A2 - watermark max / F1 - incremental filter
# ---------------------------------------------------------------------------


@query(
    "q06_watermark_bounds",
    oracle="""
    SELECT CAST(MIN(epoch_us(ts)) AS BIGINT) AS min_ts_us,
           CAST(MAX(epoch_us(ts)) AS BIGINT) AS max_ts_us,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM events
    """,
)
def q06_watermark_bounds(spark, sf_dir):
    """A2: the scalar max that advances the high-watermark
    (topcv_pipeline.py:195-196), plus min/count telemetry (A4)."""
    return t(spark, sf_dir, "events").agg(
        F.min("ts_us").alias("min_ts_us"),
        F.max("ts_us").alias("max_ts_us"),
        F.count("*").alias("cnt"),
    )


@query(
    "q07_incremental_newer",
    oracle=f"""
    SELECT event_id, epoch_us(ts) AS ts_us, value
    FROM events WHERE epoch_us(ts) > {ANCHOR_US}
    """,
)
def q07_incremental_newer(spark, sf_dir):
    """F1: rows strictly newer than the watermark; the predicate carries
    a raw-ts twin so it pushes into the parquet scan and row groups
    wholly below the watermark are skipped (the reference string-appends
    the filter to its SQL, topcv_pipeline.py:122-126)."""
    from ..sources.star import ts_us_gt

    ev = t(spark, sf_dir, "events")
    return ev.filter(ts_us_gt(ev, ANCHOR_US)).select(
        "event_id", "ts_us", "value"
    )


# ---------------------------------------------------------------------------
# C6/C7 - sentinel NULLing and cast+round (script.sql:1-10)
# ---------------------------------------------------------------------------


@query(
    "q08_sentinel_null",
    oracle="""
    SELECT event_id,
           CASE WHEN event_type = 'error' THEN NULL ELSE value END AS value_cleaned
    FROM events
    """,
)
def q08_sentinel_null(spark, sf_dir):
    """C6: sentinel -> NULL rewrite (UPDATE ... SET salary = NULL WHERE
    salary = 'Thỏa thuận') as a projection, 'error' standing in for the
    sentinel on this substrate."""
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.when(F.col("event_type") == "error", F.lit(None).cast("double"))
        .otherwise(F.col("value"))
        .alias("value_cleaned"),
    )


@query(
    "q09_cast_round",
    oracle="""
    SELECT event_id, CAST(ROUND(value) AS BIGINT) AS value_rounded
    FROM events
    """,
)
def q09_cast_round(spark, sf_dir):
    """C7: salary::numeric + ROUND as one typed expression (script.sql:6-10)."""
    from ..functions import salary_rounded

    ev = t(spark, sf_dir, "events")
    return ev.select(
        "event_id", salary_rounded(F.col("value")).alias("value_rounded")
    )


# ---------------------------------------------------------------------------
# C8 standalone - full bucket coverage via synthesized deadlines
# ---------------------------------------------------------------------------

_Q10_DIFF = "(event_id % 4000000 - 2000000)"


@query(
    "q10_remaining_buckets",
    oracle=f"""
    WITH d AS (
      SELECT event_id, {ANCHOR_US} + {_Q10_DIFF} * 1000000 AS due_us
      FROM events
    )
    SELECT event_id,
           CASE
             WHEN (due_us - {ANCHOR_US}) // 1000000 <= 0
               THEN 'Đã hết thời gian ứng tuyển'
             WHEN (due_us - {ANCHOR_US}) // 1000000 < 60
               THEN 'Còn ' || CAST((due_us - {ANCHOR_US}) // 1000000 AS VARCHAR) || ' giây để ứng tuyển'
             WHEN (due_us - {ANCHOR_US}) // 1000000 < 3600
               THEN 'Còn ' || CAST((due_us - {ANCHOR_US}) // 60000000 AS VARCHAR) || ' phút để ứng tuyển'
             WHEN (due_us - {ANCHOR_US}) // 1000000 < 86400
               THEN 'Còn ' || CAST((due_us - {ANCHOR_US}) // 3600000000 AS VARCHAR) || ' giờ để ứng tuyển'
             ELSE 'Còn ' || CAST((due_us - {ANCHOR_US}) // 86400000000 AS VARCHAR) || ' ngày để ứng tuyển'
           END AS remaining_time
    FROM d
    """,
)
def q10_remaining_buckets(spark, sf_dir):
    """C8 across every bucket: synthetic deadlines spread +-23 days
    around the anchor (expired/seconds/minutes/hours/days), exercising
    the whole when-chain the reference's stored procedure encodes in a
    per-row UPDATE loop (script.sql:20-47)."""
    ev = t(spark, sf_dir, "events")
    due_us = (
        F.lit(ANCHOR_US)
        + (F.col("event_id") % 4_000_000 - F.lit(2_000_000)) * F.lit(1_000_000)
    ).alias("due_us")
    return ev.select(
        "event_id",
        render_remaining_time(due_us, F.lit(ANCHOR_US)).alias("remaining_time"),
    )


# ---------------------------------------------------------------------------
# C1 - clean_title on synthesized raw titles
# ---------------------------------------------------------------------------

_TITLE_RE = r"([\w\s./-]+(?:\s*(?:\/|-)\s*[\w\s./-]*)*)"


@query(
    "q11_clean_title",
    oracle=f"""
    WITH raw AS (
      SELECT p_partkey,
             CASE CAST(p_partkey % 3 AS INTEGER)
               WHEN 0 THEN p_name || ' - Up to $2,000'
               WHEN 1 THEN p_name || ' / ' || p_brand
               ELSE p_name
             END AS title
      FROM part
    ),
    m AS (
      SELECT p_partkey, title,
             regexp_extract(title, '{_TITLE_RE}', 1) AS extracted
      FROM raw
    )
    SELECT p_partkey, title,
           -- NULL title -> NULL clean title (C1 on a missing field is
           -- missing). Without the guard DuckDB's split_part(NULL)
           -- returns '' where Spark's returns NULL (r13
           -- partial-records census).
           CASE WHEN title IS NULL THEN NULL
                WHEN extracted = '' THEN trim(title)
                ELSE trim(split_part(trim(extracted), ' - ', 1))
           END AS title_clean
    FROM m
    """,
)
def q11_clean_title(spark, sf_dir):
    """C1 on synthesized titles (part names + trailing junk in the
    shapes the scraper produces). ASCII inputs so the Java (?U) flag and
    RE2 agree; full Unicode behavior is pinned by the golden tests."""
    part = t(spark, sf_dir, "part")
    title = (
        F.when(
            (F.col("p_partkey") % 3).cast("int") == 0,
            F.concat(F.col("p_name"), F.lit(" - Up to $2,000")),
        )
        .when(
            (F.col("p_partkey") % 3).cast("int") == 1,
            F.concat(F.col("p_name"), F.lit(" / "), F.col("p_brand")),
        )
        .otherwise(F.col("p_name"))
        .alias("title")
    )
    raw = part.select("p_partkey", title)
    return raw.select(
        "p_partkey", "title", clean_title(F.col("title")).alias("title_clean")
    )


# ---------------------------------------------------------------------------
# C2/C3 - clean_salary + transform_salary on synthesized raw salaries
# ---------------------------------------------------------------------------

_SAL_NUMS = "regexp_extract_all(s, '[0-9][0-9,]*')"  # leading digit required - mirrors functions/salary.py


@query(
    "q12_clean_salary",
    oracle=f"""
    WITH raw AS (
      SELECT o_orderkey,
             CASE CAST(o_orderkey % 5 AS INTEGER)
               WHEN 0 THEN CAST(o_orderkey % 50 + 1 AS VARCHAR) || ' - ' || CAST(o_orderkey % 50 + 11 AS VARCHAR) || ' triệu'
               WHEN 1 THEN CAST(o_orderkey % 50 + 1 AS VARCHAR) || ' triệu'
               WHEN 2 THEN '1,' || CAST((o_orderkey % 50 + 1) * 10 AS VARCHAR) || ' - 2,' || CAST((o_orderkey % 50 + 11) * 10 AS VARCHAR) || ' USD'
               WHEN 3 THEN '$' || CAST((o_orderkey % 50 + 1) * 10 AS VARCHAR)
               ELSE 'Thỏa thuận'
             END AS salary_text
      FROM orders
    ),
    p AS (
      SELECT o_orderkey, salary_text, lower(trim(salary_text)) AS s FROM raw
    ),
    m AS (
      SELECT o_orderkey, salary_text, s, {_SAL_NUMS} AS nums,
             (contains(s, '-') AND len({_SAL_NUMS}) >= 2) AS is_range,
             (contains(s, 'usd') OR contains(s, '$')) AS is_usd,
             contains(s, 'triệu') AS is_vnd
      FROM p
    ),
    b AS (
      SELECT o_orderkey, salary_text, is_range,
             CASE
               WHEN len(nums) = 0 THEN NULL
               WHEN is_usd THEN CAST(replace(nums[1], ',', '') AS DOUBLE) * (23000.0 / 1000000.0)
               WHEN is_vnd THEN CAST(replace(nums[1], ',', '') AS DOUBLE)
               ELSE NULL
             END AS lo,
             CASE
               WHEN len(nums) = 0 OR NOT (contains(s, '-') AND len(nums) >= 2) THEN NULL
               WHEN is_usd THEN CAST(replace(nums[2], ',', '') AS DOUBLE) * (23000.0 / 1000000.0)
               WHEN is_vnd THEN CAST(replace(nums[2], ',', '') AS DOUBLE)
               ELSE NULL
             END AS hi
      FROM m
    )
    SELECT o_orderkey, salary_text, lo AS salary_lo, hi AS salary_hi,
           CASE WHEN hi IS NOT NULL THEN (lo + hi) / 2 ELSE lo END AS salary_avg
    FROM b
    """,
)
def q12_clean_salary(spark, sf_dir):
    """C2+C3: every clean_salary branch (triệu range/single, USD with
    grouping commas, $-single, sentinel) synthesized deterministically
    from o_orderkey, parsed back to (lo, hi, mean)."""
    orders = t(spark, sf_dir, "orders")
    k1 = (F.col("o_orderkey") % 50 + 1).cast("string")
    k2 = (F.col("o_orderkey") % 50 + 11).cast("string")
    k1u = ((F.col("o_orderkey") % 50 + 1) * 10).cast("string")
    k2u = ((F.col("o_orderkey") % 50 + 11) * 10).cast("string")
    variant = (F.col("o_orderkey") % 5).cast("int")
    salary_text = (
        F.when(variant == 0, F.concat(k1, F.lit(" - "), k2, F.lit(" triệu")))
        .when(variant == 1, F.concat(k1, F.lit(" triệu")))
        .when(
            variant == 2,
            F.concat(F.lit("1,"), k1u, F.lit(" - 2,"), k2u, F.lit(" USD")),
        )
        .when(variant == 3, F.concat(F.lit("$"), k1u))
        .otherwise(F.lit("Thỏa thuận"))
        .alias("salary_text")
    )
    raw = orders.select("o_orderkey", salary_text)
    # Three-stage parse: tokens (the one regex walk) -> bounds (branch
    # logic) -> presentation. Each projection's generated method stays
    # small and JIT-friendly; CollapseProject keeps them split because
    # fusing would duplicate the multiply-referenced non-cheap token
    # expressions. Cold first-run cost drops severalfold vs the fused
    # single-projection form (see functions/salary.py:salary_tokens).
    s, nums = salary_tokens(F.col("salary_text"))
    tokenized = raw.select(
        "o_orderkey", "salary_text", s.alias("s"), nums.alias("nums")
    )
    staged = tokenized.select(
        "o_orderkey",
        "salary_text",
        clean_salary_bounds_from(F.col("s"), F.col("nums")).alias("bounds"),
    )
    b = F.col("bounds")
    return staged.select(
        "o_orderkey",
        "salary_text",
        F.element_at(b, 1).alias("salary_lo"),
        F.when(F.size(b) > 1, F.element_at(b, 2)).alias("salary_hi"),
        salary_mean(b).alias("salary_avg"),
    )


# ---------------------------------------------------------------------------
# C4 - caculate_dates on synthesized Vietnamese relative-time text
# ---------------------------------------------------------------------------


@query(
    "q13_calculate_dates",
    oracle=f"""
    WITH raw AS (
      SELECT event_id,
             'Cập nhật ' || CAST(user_id % 59 + 1 AS VARCHAR) || ' ' ||
             CASE CAST(user_id % 4 AS INTEGER)
               WHEN 0 THEN 'ngày' WHEN 1 THEN 'giờ' WHEN 2 THEN 'phút' ELSE 'giây'
             END || ' trước' AS update_text
      FROM events
    ),
    parsed AS (
      SELECT event_id, update_text,
             COALESCE(
               CAST(NULLIF(regexp_extract(update_text, '(\\d+)\\s*ngày', 1), '') AS BIGINT) * 86400,
               CAST(NULLIF(regexp_extract(update_text, '(\\d+)\\s*giờ', 1), '') AS BIGINT) * 3600,
               CAST(NULLIF(regexp_extract(update_text, '(\\d+)\\s*phút', 1), '') AS BIGINT) * 60,
               CAST(NULLIF(regexp_extract(update_text, '(\\d+)\\s*giây', 1), '') AS BIGINT) * 1
             ) AS seconds
      FROM raw
    )
    SELECT event_id, update_text, seconds,
           {ANCHOR_US} - seconds * 1000000 AS posted_us
    FROM parsed
    """,
)
def q13_calculate_dates(spark, sf_dir):
    """C4: parse 'Cập nhật N <unit> trước' through the unit map and
    anchor-subtract -> posted_date, all unit branches covered."""
    ev = t(spark, sf_dir, "events")
    unit = (
        F.when((F.col("user_id") % 4).cast("int") == 0, F.lit("ngày"))
        .when((F.col("user_id") % 4).cast("int") == 1, F.lit("giờ"))
        .when((F.col("user_id") % 4).cast("int") == 2, F.lit("phút"))
        .otherwise(F.lit("giây"))
    )
    update_text = F.concat(
        F.lit("Cập nhật "),
        (F.col("user_id") % 59 + 1).cast("string"),
        F.lit(" "),
        unit,
        F.lit(" trước"),
    ).alias("update_text")
    raw = ev.select("event_id", update_text)
    seconds = parse_relative_seconds(F.col("update_text")).alias("seconds")
    raw = raw.select("event_id", "update_text", seconds)
    return raw.select(
        "event_id",
        "update_text",
        "seconds",
        (F.lit(ANCHOR_US) - F.col("seconds") * F.lit(1_000_000)).alias(
            "posted_us"
        ),
    )


# ---------------------------------------------------------------------------
# C5 - timezone normalization (localize)
# ---------------------------------------------------------------------------


@query(
    "q36_localize_tz",
    oracle="""
    SELECT event_id,
           epoch_us(ts) AS ts_us,
           strftime(ts + INTERVAL 7 HOUR, '%Y-%m-%d %H:%M:%S') AS local_wall
    FROM events
    """,
)
def q36_localize_tz(spark, sf_dir):
    """C5: render each UTC instant as the reference's Asia/Ho_Chi_Minh
    wall clock (docker-compose.yaml:10, topcv_pipeline.py:137,140).
    Spark side uses the real tz database (from_utc_timestamp via
    functions.dates.localize); the oracle states the zone's fixed UTC+7
    offset (no DST since 1975) so the comparison is session-tz-free.
    Output is a rendered string per the no-raw-TIMESTAMP registry rule.
    """
    from ..functions.dates import localize
    from ..sources.star import with_event_time

    ev = with_event_time(t(spark, sf_dir, "events"))
    return ev.select(
        "event_id",
        "ts_us",
        F.date_format(
            localize(F.col("event_time")), "yyyy-MM-dd HH:mm:ss"
        ).alias("local_wall"),
    )
