"""Invariant tests for the q172-q175 batch (RANGE frames, geo grid
join, partial-agg merge, vocab coverage).

The DuckDB oracle pins value equality; these pin the guarantees a
value diff cannot express: frame membership, pair uniqueness/recall
framing, algebraic-merge equivalence against a direct single-pass
aggregate, and coverage monotonicity.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR, SF_DIR_T2
from web_scraping_etl_pipeline_spark.plans.analytics import (
    q172_time_range_moving_avg,
    q174_partial_agg_merge,
)
from web_scraping_etl_pipeline_spark.plans.geo import q173_geo_grid_join
from web_scraping_etl_pipeline_spark.plans.textops import (
    q175_vocab_coverage,
)


def test_range_frame_contains_self(spark):
    """Every event's trailing-hour frame includes at least itself, and
    a singleton frame's average is the row's own value."""
    out = q172_time_range_moving_avg(spark, SF_DIR).cache()
    assert out.filter(F.col("n_in_window") < 1).count() == 0
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", F.round("value", 4).alias("own")
    )
    singletons = out.filter(F.col("n_in_window") == 1).join(
        ev, "event_id"
    )
    assert (
        singletons.filter(F.col("hourly_avg") != F.col("own")).count()
        == 0
    )


def test_geo_pairs_unique_canonical_and_bounded(spark):
    """Each qualifying pair appears exactly once, in canonical
    (user_a < user_b) order, with distance within the threshold.
    Runs at sf0.01: the sf0.001 slice has only 15 users spread over a
    ~10x10-degree box, which legitimately yields zero close pairs."""
    out = q173_geo_grid_join(spark, SF_DIR_T2).cache()
    n = out.count()
    assert n == out.select("user_a", "user_b").distinct().count()
    assert out.filter(F.col("user_a") >= F.col("user_b")).count() == 0
    assert out.filter(F.col("dist_km") > 25.0).count() == 0
    assert n > 0  # non-degenerate at sf0.01


def test_partial_merge_equals_direct_aggregate(spark):
    """The history+delta merge must reproduce the direct single-pass
    rollup bit-for-bit (counts exactly; sums to the same rounding)."""
    merged = q174_partial_agg_merge(spark, SF_DIR)
    from web_scraping_etl_pipeline_spark.plans.common import (
        EVENTS_EPOCH_US,
        t,
    )

    ev = t(spark, SF_DIR, "events")
    day_idx = F.floor(
        (F.col("ts_us") - F.lit(EVENTS_EPOCH_US)) / F.lit(86_400_000_000)
    ).alias("day_idx")
    # the direct pass mirrors q174's exact-decimal contract: decimal
    # sums (order-independent) and the integer half-up micro-unit avg.
    direct = (
        ev.groupBy(day_idx, "event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("value").cast("decimal(20,6)")).alias("_sv"),
        )
        .select(
            "day_idx",
            "event_type",
            "cnt",
            F.round(F.col("_sv").cast("double"), 2).alias("total_value"),
            F.expr(
                "(2 * CAST(_sv * 1000000 AS BIGINT) + cnt) DIV (2 * cnt)"
            )
            .cast("long")
            .alias("avg_value_micro"),
        )
    )
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_vocab_coverage_monotone(spark):
    """Higher coverage targets need same-or-larger vocabularies, and
    every achieved share meets its target."""
    rows = sorted(
        q175_vocab_coverage(spark, SF_DIR).collect(),
        key=lambda r: r.target,
    )
    assert len(rows) == 4
    sizes = [r.vocab_size for r in rows]
    assert sizes == sorted(sizes)
    for r in rows:
        assert r.covered_share >= r.target
