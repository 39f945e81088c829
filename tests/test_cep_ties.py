"""CEP same-microsecond tie semantics (ADVICE r4, low).

Spark's lookahead frame follows the (ts_us, event_id) order, so a
purchase/error in the SAME microsecond as the click (higher event_id)
counts as following; the oracles now state the identical lexicographic
bound ((tu, event_id) > (c.tu, c.event_id)) instead of strict tu.
This fixture pins a same-microsecond click->purchase and a
same-microsecond blocking error on both engines.
"""

from __future__ import annotations

import datetime

import duckdb

from web_scraping_etl_pipeline_spark.plans import ORACLE, QUERIES

_T0 = datetime.datetime(2024, 1, 1, 12, 0, 0)

#: (event_id, user_id, event_type, microsecond offset from _T0)
_EVENTS = [
    # user 1: click and purchase in the SAME microsecond -> match, latency 0
    (1, 1, "click", 0),
    (2, 1, "purchase", 0),
    # user 2: click, then error and purchase; error strictly earlier -> blocked
    (3, 2, "click", 0),
    (4, 2, "error", 5),
    (5, 2, "purchase", 10),
    # user 3: click, error in the same microsecond as the purchase -> NOT
    # blocked (strict err.tu < p.tu on both engines)
    (6, 3, "click", 0),
    (7, 3, "error", 10),
    (8, 3, "purchase", 10),
]


def _write_events(path: str) -> None:
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE ev (event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type VARCHAR, value DOUBLE, props VARCHAR)"
    )
    for eid, uid, etype, us in _EVENTS:
        con.execute(
            "INSERT INTO ev VALUES (?, ?, ?, ?, 1.0, '{}')",
            [eid, _T0 + datetime.timedelta(microseconds=us), uid, etype],
        )
    con.execute(f"COPY ev TO '{path}' (FORMAT PARQUET)")
    con.close()


def test_cep_same_microsecond_ties_match_on_both_engines(spark, tmp_path):
    _write_events(str(tmp_path / "events.parquet"))

    srows = sorted(
        tuple(r)
        for r in QUERIES["q233_pattern_click_purchase"](
            spark, str(tmp_path)
        ).collect()
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    drows = sorted(
        tuple(r)
        for r in con.execute(
            ORACLE["q233_pattern_click_purchase"]
        ).fetchall()
    )
    con.close()

    # user 1 matches at latency 0; user 2 blocked; user 3 matches
    assert srows == [(1, 1, 2, 0), (3, 6, 8, 10)]
    assert srows == drows
