"""Independent brute-force references, round 10 batch Q: the
temporal/sessionization family - hand-rolled window semantics
(as-of carry-forward, gaps-and-islands, sweep lines, funnels) that
both engines express with the same window formulas.

q28 gap sessionization, q55 as-of backward join, q56 bucketized
range join, q89 strictly-ordered funnel, q98 rolling 7-day actives,
q138 interval coalescing, q144 last-touch attribution, q153
cumulative distinct users, q154 sweep-line peak concurrency, q186
longest calendar streak. Pure-Python recomputation from raw parquet
at sf0.001, as in batches A-P.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import SF_DIR

US_PER_DAY = 86_400_000_000
EPOCH = 1_704_067_200_000_000


def _q(spark, name):
    from __spark_entry__ import queries

    return queries()[name](spark, SF_DIR)


def _events():
    con = duckdb.connect()
    return con.execute(
        f"SELECT event_id, epoch_us(ts) AS us, user_id, event_type, value"
        f" FROM read_parquet('{SF_DIR}/events.parquet')"
    ).df()


def _per_user(ev):
    seqs: dict[int, list[tuple[int, int, str, float]]] = {}
    for eid, us, uid, et, v in zip(
        ev["event_id"], ev["us"], ev["user_id"], ev["event_type"],
        ev["value"],
    ):
        seqs.setdefault(int(uid), []).append(
            (int(us), int(eid), et, float(v))
        )
    for evs in seqs.values():
        evs.sort(key=lambda t: (t[0], t[1]))
    return seqs


# ---------------------------------------------------------------------------
# q28 gap sessionization
# ---------------------------------------------------------------------------


def test_q28_sessions_match_gap_walk(spark):
    rows = {
        r["user_id"]: int(r["n_sessions"])
        for r in _q(spark, "q28_user_sessions").collect()
    }
    seqs = _per_user(_events())
    for uid, evs in seqs.items():
        n = 0
        prev = None
        for us, _, _, _ in evs:
            if prev is None or us - prev > 1_800_000_000:
                n += 1
            prev = us
        assert rows[uid] == n


# ---------------------------------------------------------------------------
# q55 as-of backward join
# ---------------------------------------------------------------------------


def test_q55_asof_matches_backward_scan(spark):
    rows = {
        int(r["event_id"]): r for r in _q(spark, "q55_asof_join").collect()
    }
    seqs = _per_user(_events())
    expected = {}
    for uid, evs in seqs.items():
        # right rows (non-purchase) sort BEFORE left rows at equal ts
        stream = sorted(
            evs, key=lambda t: (t[0], 0 if t[2] != "purchase" else 1, t[1])
        )
        prior = None
        for us, eid, et, v in stream:
            if et != "purchase":
                prior = (us, eid, v)
            elif prior is not None:
                expected[eid] = (uid, us, prior)
    assert set(rows) == set(expected)
    for eid, (uid, us, (pts, pid, pv)) in expected.items():
        row = rows[eid]
        assert (row["user_id"], row["ts_us"]) == (uid, us)
        assert row["prior_event_id"] == pid
        assert row["prior_ts_us"] == pts
        assert row["prior_value"] == pytest.approx(round(pv, 6), abs=1e-9)


# ---------------------------------------------------------------------------
# q56 bucketized range join
# ---------------------------------------------------------------------------


def test_q56_range_join_matches_window_count(spark):
    rows = {
        int(r["event_id"]): r for r in _q(spark, "q56_range_join").collect()
    }
    seqs = _per_user(_events())
    RANGE = 6 * 3600 * 1_000_000
    expected = {}
    for uid, evs in seqs.items():
        others = [(us, eid) for us, eid, et, _ in evs if et != "purchase"]
        for us, eid, et, _ in evs:
            if et != "purchase":
                continue
            n = sum(1 for ous, _ in others if abs(us - ous) <= RANGE)
            expected[eid] = (uid, n)
    assert set(rows) == set(expected)
    for eid, (uid, n) in expected.items():
        assert rows[eid]["user_id"] == uid
        assert rows[eid]["nearby_events"] == n


# ---------------------------------------------------------------------------
# q89 strictly-ordered funnel
# ---------------------------------------------------------------------------


def test_q89_funnel_matches_sequential_mins(spark):
    rows = {
        r["user_id"]: r
        for r in _q(spark, "q89_funnel_conversion").collect()
    }
    seqs = _per_user(_events())
    expected = {}
    for uid, evs in seqs.items():
        views = [us for us, _, et, _ in evs if et == "view"]
        if not views:
            continue
        t_view = min(views)
        clicks = [
            us for us, _, et, _ in evs if et == "click" and us > t_view
        ]
        t_click = min(clicks) if clicks else None
        t_purchase = None
        if t_click is not None:
            purchases = [
                us for us, _, et, _ in evs
                if et == "purchase" and us > t_click
            ]
            t_purchase = min(purchases) if purchases else None
        expected[uid] = (t_view, t_click, t_purchase)
    assert set(rows) == set(expected)
    for uid, (tv, tc, tp) in expected.items():
        row = rows[uid]
        assert row["t_view"] == tv
        assert row["t_click"] == tc
        assert row["t_purchase"] == tp
        assert bool(row["reached_click"]) == (tc is not None)
        assert bool(row["reached_purchase"]) == (tp is not None)


# ---------------------------------------------------------------------------
# q98 rolling 7-day actives
# ---------------------------------------------------------------------------


def test_q98_rolling_actives_match_set_windows(spark):
    rows = {
        int(r["day"]): int(r["active_7d"])
        for r in _q(spark, "q98_rolling_active_users").collect()
    }
    ev = _events()
    act: set[tuple[int, int]] = set()
    for us, uid in zip(ev["us"], ev["user_id"]):
        act.add((int(uid), (int(us) - EPOCH) // US_PER_DAY))
    days = sorted({d for _, d in act})
    assert set(rows) == set(range(min(days), max(days) + 1))
    for day in rows:
        users = {
            u for u, d in act if day - 6 <= d <= day
        }
        assert rows[day] == len(users)


# ---------------------------------------------------------------------------
# q138 interval coalescing
# ---------------------------------------------------------------------------


def test_q138_coalesce_matches_union_of_intervals(spark):
    rows = {}
    for r in _q(spark, "q138_interval_coalesce").collect():
        rows[(r["user_id"], int(r["interval_seq"]))] = (
            int(r["start_us"]), int(r["end_us"]), int(r["n_events"]),
        )
    seqs = _per_user(_events())
    ref = {}
    for uid, evs in seqs.items():
        seq = 0
        cur_start = cur_end = None
        n = 0
        # sorted by ts; merge [ts, ts+5min) spans
        for us, _, _, _ in sorted(evs):
            if cur_end is None or us > cur_end:
                if cur_end is not None:
                    ref[(uid, seq)] = (cur_start, cur_end, n)
                seq += 1
                cur_start, cur_end, n = us, us + 300_000_000, 1
            else:
                cur_end = max(cur_end, us + 300_000_000)
                n += 1
        if cur_end is not None:
            ref[(uid, seq)] = (cur_start, cur_end, n)
    assert rows == ref


# ---------------------------------------------------------------------------
# q144 last-touch attribution
# ---------------------------------------------------------------------------


def test_q144_last_touch_matches_carry_forward(spark):
    rows = {
        int(r["purchase_id"]): r
        for r in _q(spark, "q144_last_touch_attribution").collect()
    }
    seqs = _per_user(_events())
    LOOK = 7 * US_PER_DAY
    expected = {}
    for uid, evs in seqs.items():
        stream = sorted(
            (
                (us, 0 if et == "click" else 1, eid, et)
                for us, eid, et, _ in evs
                if et in ("click", "purchase")
            ),
        )
        last_click = None
        for us, _, eid, et in stream:
            if et == "click":
                last_click = (us, eid)
            else:
                ok = last_click is not None and us - last_click[0] <= LOOK
                expected[eid] = (
                    uid, us, last_click[1] if ok else None, ok,
                )
    assert set(rows) == set(expected)
    for pid, (uid, us, cid, ok) in expected.items():
        row = rows[pid]
        assert (row["user_id"], row["purchase_ts_us"]) == (uid, us)
        assert row["click_id"] == cid
        assert bool(row["attributed"]) == ok


# ---------------------------------------------------------------------------
# q153 cumulative distinct users
# ---------------------------------------------------------------------------


def test_q153_cumulative_distinct_matches_first_touch(spark):
    rows = {
        int(r["day_idx"]): r
        for r in _q(spark, "q153_cumulative_distinct").collect()
    }
    ev = _events()
    first: dict[int, int] = {}
    for us, uid in zip(ev["us"], ev["user_id"]):
        d = int(us) // US_PER_DAY
        uid = int(uid)
        if uid not in first or d < first[uid]:
            first[uid] = d
    per_day: dict[int, int] = {}
    for d in first.values():
        per_day[d] = per_day.get(d, 0) + 1
    cum = 0
    assert set(rows) == set(per_day)
    for d in sorted(per_day):
        cum += per_day[d]
        assert rows[d]["new_users"] == per_day[d]
        assert rows[d]["cum_users"] == cum


# ---------------------------------------------------------------------------
# q154 sweep-line peak concurrency
# ---------------------------------------------------------------------------


def test_q154_peak_matches_sweep_line(spark):
    rows = {
        int(r["day_idx"]): int(r["peak_live"])
        for r in _q(spark, "q154_peak_concurrency").collect()
    }
    ev = _events()
    pts = []
    for us in ev["us"]:
        pts.append((int(us), 1))
        pts.append((int(us) + 300_000_000, -1))
    pts.sort()  # (t, delta): -1 sorts before +1 at equal t
    live = 0
    peak: dict[int, int] = {}
    for t, d in pts:
        live += d
        day = t // US_PER_DAY
        peak[day] = max(peak.get(day, -10**9), live)
    assert rows == peak


# ---------------------------------------------------------------------------
# q186 longest calendar streak
# ---------------------------------------------------------------------------


def test_q186_streaks_match_islands(spark):
    rows = {
        r["user_id"]: r
        for r in _q(spark, "q186_longest_streak").collect()
    }
    ev = _events()
    act: dict[int, set[int]] = {}
    for us, uid in zip(ev["us"], ev["user_id"]):
        act.setdefault(int(uid), set()).add(
            (int(us) - EPOCH) // US_PER_DAY
        )
    assert set(rows) == set(act)
    for uid, days in act.items():
        ds = sorted(days)
        streaks = []
        start = prev = ds[0]
        for d in ds[1:]:
            if d == prev + 1:
                prev = d
            else:
                streaks.append((prev - start + 1, start))
                start = prev = d
        streaks.append((prev - start + 1, start))
        longest = max(ln for ln, _ in streaks)
        # earliest start among equal-length longest streaks
        s_start = min(st for ln, st in streaks if ln == longest)
        row = rows[uid]
        assert row["longest_streak"] == longest
        assert row["streak_start_day"] == s_start
        assert row["n_streaks"] == len(streaks)
