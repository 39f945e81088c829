"""C4/C5/C8 date-function tests with an injected clock.

base_time = 2025-06-20T12:00:00+07:00 (FIXTURES.md fixed test clock) =
2025-06-20T05:00:00 UTC.
"""

import datetime as dt

from pyspark.sql import functions as F

from web_scraping_etl_pipeline_spark.functions import (
    due_date,
    parse_relative_seconds,
    posted_date,
    render_remaining_time,
)

BASE = dt.datetime(2025, 6, 20, 5, 0, 0)  # UTC naive
BASE_US = int(BASE.timestamp() * 0) + int(
    (BASE - dt.datetime(1970, 1, 1)).total_seconds() * 1_000_000
)

PARSE_GOLDEN = [
    ("Cập nhật 3 giờ trước", 3 * 3600),
    ("Còn 24 ngày để ứng tuyển", 24 * 86400),
    ("Cập nhật 59 phút trước", 59 * 60),
    ("Còn 30 giây", 30),
    # mixed text: unit-map order means 'ngày' wins (utils.py:48-60)
    ("2 ngày 3 giờ", 2 * 86400),
    ("no time here", None),
]


def test_parse_relative_seconds(spark):
    df = spark.createDataFrame([(t,) for t, _ in PARSE_GOLDEN], ["t"])
    got = [r[0] for r in df.select(parse_relative_seconds(F.col("t"))).collect()]
    assert got == [want for _, want in PARSE_GOLDEN]


def test_posted_due_dates(spark):
    df = spark.createDataFrame(
        [("Cập nhật 3 giờ trước", "Còn 2 ngày để ứng tuyển")], ["u", "d"]
    )
    row = df.select(
        posted_date(F.col("u"), BASE).alias("p"),
        due_date(F.col("d"), BASE).alias("d"),
    ).first()
    assert row["p"] == BASE_US - 3 * 3600 * 1_000_000
    assert row["d"] == BASE_US + 2 * 86400 * 1_000_000


def test_render_remaining_time(spark):
    cases = [
        (-5, "Đã hết thời gian ứng tuyển"),
        (0, "Đã hết thời gian ứng tuyển"),
        (45, "Còn 45 giây để ứng tuyển"),
        (125, "Còn 2 phút để ứng tuyển"),
        (7200, "Còn 2 giờ để ứng tuyển"),
        (3 * 86400 + 5, "Còn 3 ngày để ứng tuyển"),
    ]
    df = spark.createDataFrame([(BASE_US + s * 1_000_000,) for s, _ in cases], "due long")
    got = [
        r[0]
        for r in df.select(
            render_remaining_time(F.col("due"), F.lit(BASE_US))
        ).collect()
    ]
    assert got == [want for _, want in cases]
