"""C2/C3/C6/C7 salary golden tests.

Expected values from executing the reference
(/root/reference/src/utils.py:18-41), with the two documented fixes
(SURVEY.md section 8): B2 - 'triệu' ranges keep the high bound ('10 - 20
triệu' -> [10, 20], where the reference returns (10, 10)); B3 - commas
stripped in every branch ('1,000 triệu' -> [1000.0], where the
reference raises ValueError).
"""

import pytest
from pyspark.sql import functions as F

from web_scraping_etl_pipeline_spark.functions import (
    clean_salary_bounds,
    salary_mean,
    salary_rounded,
    sentinel_to_null,
)

GOLDEN_BOUNDS = [
    ("10 - 20 triệu", [10.0, 20.0]),  # B2 fixed (ref: (10.0, 10.0))
    ("25 triệu", [25.0]),
    ("1,000 - 2,000 USD", [23.0, 46.0]),
    ("$500", [11.5]),
    ("Tới 1,500 USD", [34.5]),
    ("Thỏa thuận", None),  # sentinel -> NULL (C6 at clean time)
    ("  15 TRIỆU  ", [15.0]),
    ("300 - 500 USD", [6.9, 11.5]),
    ("1,000 triệu", [1000.0]),  # B3 fixed (ref: ValueError)
    ("123 đồng", None),  # digits but no currency marker -> ref returns None
    ("Up to 88 USD", [2.024]),
]


def test_clean_salary_bounds_golden(spark):
    df = spark.createDataFrame([(s,) for s, _ in GOLDEN_BOUNDS], ["salary"])
    got = [r[0] for r in df.select(clean_salary_bounds(F.col("salary"))).collect()]
    for (raw, want), g in zip(GOLDEN_BOUNDS, got):
        if want is None:
            assert g is None, raw
        else:
            assert g == pytest.approx(want), raw


def test_salary_mean_and_round(spark):
    df = spark.createDataFrame(
        [([10.0, 20.0],), ([25.0],), (None,)], "bounds array<double>"
    )
    means = [r[0] for r in df.select(salary_mean(F.col("bounds"))).collect()]
    assert means[0] == pytest.approx(15.0)
    assert means[1] == pytest.approx(25.0)
    assert means[2] is None

    df2 = spark.createDataFrame([(15.5,), (14.4,), (None,)], "s double")
    rounded = [r[0] for r in df2.select(salary_rounded(F.col("s"))).collect()]
    assert rounded == [16, 14, None]


def test_sentinel_to_null(spark):
    df = spark.createDataFrame([("Thỏa thuận",), ("20",)], ["s"])
    got = [r[0] for r in df.select(sentinel_to_null(F.col("s"))).collect()]
    assert got == [None, "20"]
