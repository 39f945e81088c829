"""Watermark-eviction boundary pins (ADVICE r4, low — extended).

The streaming oracles encode EMPIRICALLY-pinned eviction rules, and
nearly all synthetic event timestamps are sub-millisecond, so the
exact boundary semantics are live at every sweep. These fixtures
synthesize rows exactly AT each boundary so a Spark minor-version
change to inclusivity fails loudly here instead of silently flipping
a future driver sweep. Rules pinned (all confirmed by probing Spark
4.1 directly):

- stream-stream join eviction (q223/q232): state times are kept at
  CEIL-ms; a row evicts (and null-pads) iff ceil_ms(ts) < wm_ms,
  i.e. ts_us <= wm_us - 1000 — NOT the naive ts_us < wm_us.
- chained join->window (q262): the join's output watermark lags the
  global one by the join interval span (1 h); the day finalizes iff
  day_end + 1h + 1ms <= wm.
- native session_window (q212): INCLUSIVE — session_end_us <=
  floor_ms(wm).
- applyInPandasWithState event-time timer (q265): STRICT — the timer
  (floor-ms of session end) fires only when wm_ms is strictly
  greater.

Each assertion also runs the DuckDB oracle so the two sides are
pinned to each other, not just to hard-coded rows.
"""

from __future__ import annotations

import datetime

import duckdb

from web_scraping_etl_pipeline_spark.plans import ORACLE, QUERIES

_T0 = datetime.datetime(2024, 1, 1)
_H = 3_600_000_000
_DAY = 86_400_000_000
_GAP = 1_800_000_000


def _write_events(path, rows):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE ev (event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type VARCHAR, value DOUBLE, props VARCHAR)"
    )
    for eid, uid, etype, us in rows:
        con.execute(
            "INSERT INTO ev VALUES (?, ?, ?, ?, 1.0, '{}')",
            [eid, _T0 + datetime.timedelta(microseconds=us), uid, etype],
        )
    con.execute(f"COPY ev TO '{path}' (FORMAT PARQUET)")
    con.close()


def _both(spark, tmp_path, qname, rows):
    _write_events(str(tmp_path / "events.parquet"), rows)
    srows = sorted(
        tuple(r) for r in QUERIES[qname](spark, str(tmp_path)).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    drows = sorted(tuple(r) for r in con.execute(ORACLE[qname]).fetchall())
    con.close()
    assert srows == drows, f"{qname}: spark={srows} oracle={drows}"
    return srows


def test_join_eviction_is_ceil_ms_strict(spark, tmp_path):
    wm = 10_000_000  # min-of-sources watermark: 10s, ms-floored
    rows = [
        (1, 10, "click", wm + 500),  # slower side sets the watermark
        (2, 1, "purchase", wm - 1000),  # ceil-ms 9999 < 10000 -> emit
        (3, 2, "purchase", wm - 999),  # ceil-ms 10000 -> withheld
        (4, 3, "purchase", wm),  # exactly AT wm -> withheld
        (5, 4, "purchase", 20_000_000),  # max purchase, above wm
    ]
    got = _both(spark, tmp_path, "q223_stream_stream_left_outer", rows)
    epoch = int(_T0.replace(tzinfo=datetime.timezone.utc).timestamp()) * 1_000_000
    assert got == [(2, 1, epoch + wm - 1000, None, None)]


def test_full_outer_click_side_boundary(spark, tmp_path):
    wm = 2 * _H
    rows = [
        (1, 10, "click", wm + 500),  # sets wm
        (2, 11, "purchase", 3 * _H),  # max purchase
        (3, 1, "click", wm - _H - 1000),  # at the click boundary -> emit
        (4, 2, "click", wm - _H - 1),  # inside the open ms -> withheld
        (5, 3, "click", wm - _H),  # exactly wm - 1h -> withheld
    ]
    got = _both(spark, tmp_path, "q232_stream_stream_full_outer", rows)
    unmatched_clicks = sorted(r[2] for r in got if r[0] is None)
    assert unmatched_clicks == [3]


def test_chained_window_lags_by_join_interval(spark, tmp_path):
    # matched pair in day 0; wm exactly day_end + 1h -> withheld;
    # re-run with +1ms -> emitted.
    base = [
        (1, 1, "click", 1_000_000),
        (2, 1, "purchase", 2_000_000),
        (4, 11, "purchase", 30 * _DAY),
    ]
    rows = base + [(3, 10, "click", _DAY + _H + 500)]
    assert _both(spark, tmp_path, "q262_stream_join_then_window", rows) == []
    rows = base + [(3, 10, "click", _DAY + _H + 1000 + 500)]
    assert _both(spark, tmp_path, "q262_stream_join_then_window", rows) == [
        (1704067200000000, 1)
    ]


def test_session_window_inclusive_vs_timer_strict(spark, tmp_path):
    # ms-ALIGNED session end (last event at 1s exactly): with the
    # corpus max exactly AT the session end, the native session_window
    # emits (inclusive end <= floor-ms wm) while the event-time timer
    # does NOT fire (needs wm_ms strictly greater than the timer ms).
    send = _GAP + 1_000_000
    rows = [
        (1, 1, "view", 0),
        (2, 1, "view", 1_000_000),
        (3, 10, "view", send),
    ]
    got212 = _both(spark, tmp_path, "q212_stream_session_finalized", rows)
    assert [r[0] for r in got212] == [1]
    got265 = _both(
        spark, tmp_path, "q265_stateful_timeout_sessions", rows
    )
    assert got265 == []
    # one ms later the timer fires too
    rows[2] = (3, 10, "view", send + 1000)
    got265b = _both(
        spark, tmp_path, "q265_stateful_timeout_sessions", rows
    )
    assert [r[0] for r in got265b] == [1]
    # sub-ms session end: the timer is the FLOOR-ms of the end, so a
    # watermark one ms past that floor fires even though the exact-us
    # end has not been reached - pinned so the floor stays explicit.
    rows = [
        (1, 1, "view", 0),
        (2, 1, "view", 1_000_500),
        (3, 10, "view", _GAP + 1_000_500 + 500),
    ]
    got265c = _both(
        spark, tmp_path, "q265_stateful_timeout_sessions", rows
    )
    assert [r[0] for r in got265c] == [1]
