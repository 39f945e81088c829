"""Property-based tests (hypothesis) - SURVEY.md section 5 item 4.

Strategy note: each hypothesis example normally runs in isolation, but
a Spark job per example would take minutes; instead each test takes ONE
generated batch of strings (hypothesis still shrinks the batch on
failure) and runs a single small Spark job over it. The properties are
exactly the ones the survey commits to:

- ``clean_salary_bounds`` never throws on arbitrary text and yields
  NULL or an array of 1-2 positive-or-zero doubles for digit-bearing
  branches;
- ``due_date``/``posted_date`` round-trip: moving base_time by the
  parsed seconds reproduces the other endpoint;
- the state-file watermark only advances (monotonic under arbitrary
  update sequences).
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from web_scraping_etl_pipeline_spark.functions import (
    clean_salary_bounds,
    due_date,
    parse_relative_seconds,
    posted_date,
)

#: text that exercises every salary branch boundary: digits, commas,
#: ranges, currency markers, Vietnamese units, junk.
_salary_alphabet = st.sampled_from(
    list("0123456789,- $usdtriệuUSDThỏa thuận lên đến tới x.")
)
_salary_text = st.text(alphabet=_salary_alphabet, min_size=0, max_size=30)

_rel_alphabet = st.sampled_from(list("0123456789 ngàygiờphútgiâyCòn x"))
_rel_text = st.text(alphabet=_rel_alphabet, min_size=0, max_size=20)


_slow_ok = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@_slow_ok
@given(st.lists(_salary_text, min_size=1, max_size=60))
def test_clean_salary_never_throws_and_bounds_shape(spark, texts):
    df = spark.createDataFrame(
        [(t,) for t in texts], "salary string"
    ).select(clean_salary_bounds(F.col("salary")).alias("b"))
    rows = df.select(
        F.size("b").alias("n"),
        F.exists("b", lambda x: x.isNull() | (x < 0)).alias("bad"),
    ).collect()
    for r in rows:
        # NULL (size -1 with legacy sizeOfNull=false -> None) or 1-2
        # non-negative doubles; never empty, never negative elements.
        if r.n is not None and r.n >= 0:
            assert r.n in (1, 2)
            assert r.bad is False


@_slow_ok
@given(
    st.lists(_rel_text, min_size=1, max_size=60),
    st.integers(
        min_value=1_500_000_000_000_000, max_value=1_900_000_000_000_000
    ),
)
def test_dates_round_trip(spark, texts, base_us):
    """due = base + secs, posted = base - secs; so due + posted must
    equal 2*base whenever the text parses, and both are NULL when it
    does not."""
    df = spark.createDataFrame([(t,) for t in texts], "txt string").select(
        parse_relative_seconds(F.col("txt")).alias("secs"),
        due_date(F.col("txt"), base_us).alias("due"),
        posted_date(F.col("txt"), base_us).alias("posted"),
    )
    for r in df.collect():
        if r.secs is None:
            assert r.due is None and r.posted is None
        else:
            assert r.due - base_us == base_us - r.posted
            assert r.due - base_us == r.secs * 1_000_000


@_slow_ok
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.integers(min_value=0, max_value=10**15),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_watermark_monotone(tmp_path_factory, candidates):
    """Applying an arbitrary sequence of candidate watermarks (None =
    empty batch) through the state sink only ever advances the stored
    value, and empty batches leave it untouched."""
    from web_scraping_etl_pipeline_spark.sources import state as state_mod

    path = str(tmp_path_factory.mktemp("wm") / "state.json")
    epoch = dt.datetime(1970, 1, 1)
    seen_max = None
    for c in candidates:
        ts = None if c is None else epoch + dt.timedelta(microseconds=c)
        state_mod.advance_watermark(path, ts)
        if ts is not None:
            seen_max = ts if seen_max is None else max(seen_max, ts)
        assert state_mod.read_last_processed_time(path) == seen_max


# ---------------------------------------------------------------------------
# Distributed total-order helpers (plans/common.py): for ARBITRARY
# integer multisets (duplicates, negatives, skew) and arbitrary
# partition counts, the two-pass forms must equal Spark's own
# single-partition window evaluation.
# ---------------------------------------------------------------------------


@_slow_ok
@given(
    st.lists(
        st.integers(min_value=-50, max_value=50), min_size=1, max_size=120
    ),
    st.integers(min_value=1, max_value=11),
)
def test_global_cumsum_property(spark, vals, nparts):
    from pyspark.sql import Window

    from web_scraping_etl_pipeline_spark.plans.common import global_cumsum

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "idx long, v long"
    )
    got, total, totals = global_cumsum(
        df, ["v", "idx"], sums=[("v", "cum")], rn_col="rn",
        npartitions=nparts,
    )
    w = Window.orderBy("v", "idx")
    want = df.select(
        "idx",
        F.row_number().over(w).cast("long").alias("rn"),
        F.sum("v")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum"),
    )
    g = sorted(tuple(r) for r in got.select("idx", "rn", "cum").collect())
    e = sorted(tuple(r) for r in want.collect())
    assert g == e
    assert total == len(vals)
    assert totals["cum"] == sum(vals)


@_slow_ok
@given(
    st.lists(
        st.integers(min_value=-9, max_value=9), min_size=1, max_size=80
    ),
    st.integers(min_value=1, max_value=9),
    st.integers(min_value=1, max_value=3),
)
def test_global_lead_property(spark, vals, nparts, k):
    from pyspark.sql import Window

    from web_scraping_etl_pipeline_spark.plans.common import global_lead

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "idx long, v long"
    )
    got = global_lead(df, ["v", "idx"], ["idx"], k=k, npartitions=nparts)
    w = Window.orderBy("v", "idx")
    want = df.select(
        "idx",
        *[
            F.lead("idx", j).over(w).alias(f"_lead{j}_idx")
            for j in range(1, k + 1)
        ],
    )
    cols = ["idx"] + [f"_lead{j}_idx" for j in range(1, k + 1)]
    g = sorted(tuple(r) for r in got.select(*cols).collect())
    e = sorted(tuple(r) for r in want.collect())
    assert g == e
