"""Independent replay references, round 10 batch AD: the STREAMING
events family, part 1 (VERDICT r9's shared-formula mandate extended to
the non-math queries - the streaming DuckDB twins state each query's
EMISSION RULE in SQL, so a wrong rule derived once would pass both
engines; each test here re-derives the rule from scratch in pure
Python over the raw parquet and pins the Spark streaming drain
against it).

q34 stateless pass-through, q35 tumbling-daily finalization, q37
stateful user profiles, q71 sliding-window finalization, q115
stream-stream interval join (per-user O(p*c) loop), q145 streaming
dedup key set, q176 stream-static enrichment join, q212
session-window finalization (gap merge + watermark withholding).

All replays work from epoch-microsecond integers read straight off
the parquet (pyarrow cast, no engine SQL in the expected path).
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR

US_PER_DAY = 86_400_000_000
US_PER_HOUR = 3_600_000_000
GAP_US = 1_800_000_000  # 30-minute session gap


def _q(spark, name):
    from __spark_entry__ import queries

    return queries()[name](spark, SF_DIR)


def _events():
    """[(event_id, ts_us, user_id, event_type, value)] from raw parquet."""
    import pyarrow as pa

    t = pq.read_table(
        f"{SF_DIR}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )
    ts_us = t.column("ts").cast(pa.int64()).to_pylist()
    return list(
        zip(
            t.column("event_id").to_pylist(),
            ts_us,
            t.column("user_id").to_pylist(),
            t.column("event_type").to_pylist(),
            t.column("value").to_pylist(),
        )
    )


@pytest.fixture(scope="module")
def events():
    return _events()


# ---------------------------------------------------------------------------
# q34: stateless streaming filter+project
# ---------------------------------------------------------------------------


def test_q34_passthrough_emits_each_qualifying_row_once(spark, events):
    rows = _q(spark, "q34_stream_passthrough").collect()
    got = {int(r["event_id"]): r for r in rows}
    exp = {eid: (ts, et, v) for eid, ts, _, et, v in events if v > 90}
    assert set(got) == set(exp)
    assert len(rows) == len(got)  # exactly-once: no duplicate emission
    for eid, (ts, et, v) in exp.items():
        r = got[eid]
        assert int(r["ts_us"]) == ts and r["event_type"] == et
        assert r["value"] == pytest.approx(round(v, 6), abs=1e-9)


# ---------------------------------------------------------------------------
# q35: tumbling daily windows, append-mode finalization
# ---------------------------------------------------------------------------


def test_q35_daily_finalization_withholds_open_window(spark, events):
    max_ts = max(ts for _, ts, _, _, _ in events)
    exp: dict[tuple[int, str], int] = {}
    for _, ts, _, et, _ in events:
        day_us = (ts // US_PER_DAY) * US_PER_DAY
        if day_us + US_PER_DAY <= max_ts:  # append emits end <= watermark
            exp[(day_us, et)] = exp.get((day_us, et), 0) + 1
    got = {
        (int(r["day_us"]), r["event_type"]): int(r["n"])
        for r in _q(spark, "q35_stream_daily_finalized").collect()
    }
    assert got == exp
    # the still-open max day must have been withheld
    open_day = (max_ts // US_PER_DAY) * US_PER_DAY
    assert all(d != open_day for d, _ in got)


# ---------------------------------------------------------------------------
# q37: applyInPandasWithState user profiles (final snapshot = batch agg)
# ---------------------------------------------------------------------------


def test_q37_profiles_match_per_user_fold(spark, events):
    exp: dict[int, list] = {}
    for _, ts, uid, _, v in events:
        s = exp.setdefault(uid, [0, 0.0, 0])
        s[0] += 1
        s[1] += v
        s[2] = max(s[2], ts)
    got = {
        int(r["user_id"]): r
        for r in _q(spark, "q37_stateful_user_profiles").collect()
    }
    assert set(got) == set(exp)
    for uid, (n, tot, last) in exp.items():
        r = got[uid]
        assert int(r["n_events"]) == n and int(r["last_ts_us"]) == last
        assert r["total_value"] == pytest.approx(tot, abs=0.011)


# ---------------------------------------------------------------------------
# q71: sliding 2-day/1-day windows, finalized set
# ---------------------------------------------------------------------------


def test_q71_sliding_windows_each_event_in_two_finalized_or_not(
    spark, events
):
    max_ts = max(ts for _, ts, _, _, _ in events)
    exp: dict[tuple[int, str], int] = {}
    for _, ts, _, et, _ in events:
        d0 = (ts // US_PER_DAY) * US_PER_DAY
        for start in (d0, d0 - US_PER_DAY):  # event lands in 2 windows
            if start + 2 * US_PER_DAY <= max_ts:
                exp[(start, et)] = exp.get((start, et), 0) + 1
    got = {
        (int(r["win_start_us"]), r["event_type"]): int(r["n"])
        for r in _q(spark, "q71_stream_sliding_finalized").collect()
    }
    assert got == exp


# ---------------------------------------------------------------------------
# q115: inner stream-stream interval join
# ---------------------------------------------------------------------------


def _interval_pairs(events):
    """{(purchase_id, click_id)} with click in [purchase-1h, purchase],
    same user - the brute-force per-user double loop."""
    by_user: dict[int, dict[str, list]] = {}
    for eid, ts, uid, et, _ in events:
        if et in ("purchase", "click"):
            by_user.setdefault(uid, {"purchase": [], "click": []})[
                et
            ].append((eid, ts))
    pairs = {}
    for sides in by_user.values():
        for pid, pts in sides["purchase"]:
            for cid, cts in sides["click"]:
                if pts - US_PER_HOUR <= cts <= pts:
                    pairs[(pid, cid)] = (pts, cts)
    return pairs


def test_q115_inner_join_equals_brute_force_pairs(spark, events):
    exp = _interval_pairs(events)
    rows = _q(spark, "q115_stream_stream_join").collect()
    got = {
        (int(r["purchase_id"]), int(r["click_id"])): (
            int(r["purchase_us"]),
            int(r["click_us"]),
        )
        for r in rows
    }
    assert len(rows) == len(got)  # no duplicate match emission
    assert got == exp


# ---------------------------------------------------------------------------
# q145: dropDuplicatesWithinWatermark key set
# ---------------------------------------------------------------------------


def test_q145_dedup_emits_distinct_key_set(spark, events):
    exp = {(uid, et, ts // US_PER_DAY) for _, ts, uid, et, _ in events}
    rows = _q(spark, "q145_stream_dedup").collect()
    got = [
        (int(r["user_id"]), r["event_type"], int(r["day_idx"]))
        for r in rows
    ]
    assert len(got) == len(set(got))  # each key exactly once
    assert set(got) == exp


# ---------------------------------------------------------------------------
# q176: stream-static enrichment join
# ---------------------------------------------------------------------------


def test_q176_static_enrichment_matches_dict_lookup(spark, events):
    cust = pq.read_table(
        f"{SF_DIR}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    seg = dict(
        zip(
            cust.column("c_custkey").to_pylist(),
            cust.column("c_mktsegment").to_pylist(),
        )
    )
    exp = {
        eid: (uid, seg[uid], v)
        for eid, _, uid, _, v in events
        if v > 50 and uid in seg
    }
    rows = _q(spark, "q176_stream_static_join").collect()
    got = {int(r["event_id"]): r for r in rows}
    assert len(rows) == len(got) and set(got) == set(exp)
    for eid, (uid, s, v) in exp.items():
        r = got[eid]
        assert int(r["user_id"]) == uid and r["c_mktsegment"] == s
        assert r["value"] == pytest.approx(round(v, 6), abs=1e-9)


# ---------------------------------------------------------------------------
# q212: session_window finalization (gap merge, ms-floored watermark)
# ---------------------------------------------------------------------------


def _sessions(events):
    """Per-user gap sessions: [(user, start_us, end_us, n)] with
    end = last event + gap; split when the gap STRICTLY exceeds 30 min."""
    by_user: dict[int, list[int]] = {}
    for _, ts, uid, _, _ in events:
        by_user.setdefault(uid, []).append(ts)
    out = []
    for uid, tss in by_user.items():
        tss.sort()
        start, last, n = tss[0], tss[0], 1
        for ts in tss[1:]:
            if ts - last > GAP_US:
                out.append((uid, start, last + GAP_US, n))
                start, n = ts, 0
            last = ts
            n += 1
        out.append((uid, start, last + GAP_US, n))
    return out


def test_q212_sessions_finalized_below_ms_floored_watermark(spark, events):
    max_ts = max(ts for _, ts, _, _, _ in events)
    wm = (max_ts // 1000) * 1000  # watermark held at ms precision
    exp = {
        (uid, start, end): n
        for uid, start, end, n in _sessions(events)
        if end <= wm  # inclusive boundary (native session_window)
    }
    got = {
        (
            int(r["user_id"]),
            int(r["session_start_us"]),
            int(r["session_end_us"]),
        ): int(r["n_events"])
        for r in _q(spark, "q212_stream_session_finalized").collect()
    }
    assert got == exp
    # every user's LAST session (the open one) must be withheld
    last_by_user: dict[int, int] = {}
    for uid, _, end, _ in _sessions(events):
        last_by_user[uid] = max(last_by_user.get(uid, 0), end)
    for (uid, _, end), _n in got.items():
        assert not (end == last_by_user[uid] and end > wm)
