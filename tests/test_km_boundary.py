"""Kaplan-Meier d == n_risk boundary (ADVICE r4, medium).

A churn day that exhausts the risk set is a perfectly normal KM input
whose per-day term is ln(0): DuckDB raises on ln(0) and Spark's
F.log(0) yields NULL which SUM silently skips, so an unguarded plan
reports survival > 0 where the true estimate is 0. The synthetic
corpus never triggers it; this fixture does, and pins BOTH engines to
the guarded survival == 0 branch.
"""

from __future__ import annotations

import datetime

import duckdb

from web_scraping_etl_pipeline_spark.plans import ORACLE, QUERIES

#: user lifetimes: A churns after 10 days, B churns after 10 days,
#: C (attaining the corpus max day) is censored at t = 5. Processing
#: order is t=5 (c=1, n_risk=3) then t=10 (d=2, n_risk=2 -> d == n_risk).
_EVENTS = [
    # (event_id, user_id, day)
    (1, 1, 0),
    (2, 1, 10),
    (3, 2, 5),
    (4, 2, 15),
    (5, 3, 15),
    (6, 3, 20),
]


def _write_events(path: str) -> None:
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE ev (event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type VARCHAR, value DOUBLE, props VARCHAR)"
    )
    epoch = datetime.datetime(2024, 1, 1)
    for eid, uid, day in _EVENTS:
        con.execute(
            "INSERT INTO ev VALUES (?, ?, ?, 'view', 1.0, '{}')",
            [eid, epoch + datetime.timedelta(days=day), uid],
        )
    con.execute(f"COPY ev TO '{path}' (FORMAT PARQUET)")
    con.close()


def test_km_survival_zero_when_risk_set_exhausts(spark, tmp_path):
    _write_events(str(tmp_path / "events.parquet"))

    srows = {
        r["t_days"]: r.asDict()
        for r in QUERIES["q258_survival_curve"](spark, str(tmp_path)).collect()
    }

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    # the unguarded oracle raised here (ln(0)); the guarded one must run
    drows = {r[0]: r for r in con.execute(ORACLE["q258_survival_curve"]).fetchall()}
    con.close()

    assert set(srows) == {5, 10} == set(drows)
    # censored-only day: survival unchanged at 1.0
    assert srows[5]["survival"] == 1.0 == drows[5][4]
    # exhausted risk set: survival exactly 0 on both engines
    assert srows[10]["n_churn"] == 2 == srows[10]["n_risk"]
    assert srows[10]["survival"] == 0.0 == drows[10][4]
