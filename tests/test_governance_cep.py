"""Invariant gates for the round-4 CEP / governance / restatement
operators (q233-q236). Exact values are the DuckDB oracle's job; these
pin the semantic contracts the oracle states only implicitly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR_T2


def test_cep_matches_respect_order_and_horizon(spark):
    """Every match: purchase strictly after the click, within the
    horizon, and the click/purchase ids refer to real events of the
    right types."""
    from web_scraping_etl_pipeline_spark.plans.common import t
    from web_scraping_etl_pipeline_spark.plans.temporal import (
        _CEP_HORIZON_US,
        q233_pattern_click_purchase,
    )

    out = q233_pattern_click_purchase(spark, SF_DIR_T2).cache()
    assert out.count() > 0
    assert out.filter(
        (F.col("latency_us") <= 0)
        | (F.col("latency_us") > _CEP_HORIZON_US)
    ).count() == 0
    ev = t(spark, SF_DIR_T2, "events").select("event_id", "event_type")
    bad_click = out.join(
        ev, out["click_id"] == ev["event_id"]
    ).filter(F.col("event_type") != "click")
    bad_pur = out.join(
        ev, out["purchase_id"] == ev["event_id"]
    ).filter(F.col("event_type") != "purchase")
    assert bad_click.count() == 0
    assert bad_pur.count() == 0
    # one row per click at most
    assert (
        out.groupBy("click_id").count().filter(F.col("count") > 1).count()
        == 0
    )


def test_erasure_cascade_counts_are_consistent(spark):
    """The audit's three rows recount exactly against independent
    direct counts (the anti-join deletion would remove precisely these
    rows)."""
    from web_scraping_etl_pipeline_spark.plans.common import t
    from web_scraping_etl_pipeline_spark.plans.relational import (
        _ERASE_MOD,
        q234_erasure_cascade_audit,
    )

    out = {
        r["table_name"]: r["n_rows"]
        for r in q234_erasure_cascade_audit(spark, SF_DIR_T2).collect()
    }
    assert set(out) == {"customer", "orders", "lineitem"}
    cust = t(spark, SF_DIR_T2, "customer").filter(
        F.col("c_custkey") % _ERASE_MOD == 0
    )
    assert out["customer"] == cust.count()
    orders = t(spark, SF_DIR_T2, "orders").join(
        cust.select("c_custkey"),
        F.col("o_custkey") == F.col("c_custkey"),
        "left_semi",
    )
    assert out["orders"] == orders.count()
    li = t(spark, SF_DIR_T2, "lineitem").join(
        orders.select("o_orderkey"),
        F.col("l_orderkey") == F.col("o_orderkey"),
        "left_semi",
    )
    assert out["lineitem"] == li.count()


def test_restatement_merges_to_full_recompute(spark):
    """Restated groups must equal the full-recompute aggregate for
    those groups - the partial-aggregate merge law q174 demonstrates,
    here checked on the late-data path."""
    from web_scraping_etl_pipeline_spark.plans.common import (
        US_PER_DAY,
        t,
    )
    from web_scraping_etl_pipeline_spark.plans.temporal import (
        q235_late_data_restatement,
    )

    out = q235_late_data_restatement(spark, SF_DIR_T2).cache()
    assert out.filter(
        F.col("new_n") != F.col("old_n") + F.col("late_n")
    ).count() == 0
    ev = t(spark, SF_DIR_T2, "events")
    full = ev.groupBy(
        (F.expr(f"ts_us DIV {US_PER_DAY}") * US_PER_DAY).alias("day_us"),
        "event_type",
    ).agg(F.count("*").alias("n_full"))
    j = out.join(full, ["day_us", "event_type"])
    assert j.count() == out.count()
    assert j.filter(F.col("new_n") != F.col("n_full")).count() == 0


def test_k_anonymity_flags_exactly_small_groups(spark):
    """Every flagged doc's quasi-identifier group really is smaller
    than k, and no group of size >= k leaks into the output."""
    from web_scraping_etl_pipeline_spark.plans.datapipe import (
        _K_ANON,
        q236_k_anonymity,
    )

    out = q236_k_anonymity(spark, SF_DIR_T2).cache()
    assert out.filter(
        (F.col("group_size") < 1) | (F.col("group_size") >= _K_ANON)
    ).count() == 0
    recount = out.groupBy("source", "lang", "len_bucket").agg(
        F.count("*").alias("n"), F.max("group_size").alias("gs")
    )
    assert recount.filter(F.col("n") != F.col("gs")).count() == 0
