"""Independent brute-force references, round 10 batch S: the
distributed total-order primitives (pinning global_rn/global_cumsum/
global_ntile against literal sorted lists) and the remaining
window/interval operators.

q57 lag deltas, q58 exact NTILE quartiles, q59 3-row moving average,
q93 cohort retention, q172 trailing-hour RANGE frame, q201 global
percent_rank, q202 exact global median, q203 global cume_dist, q239
nearest as-of with tolerance, q240 interval-overlap join, q401
session-overlap top pairs. Pure-Python recomputation from raw
parquet at sf0.001, as in batches A-R.
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


def _orders():
    con = duckdb.connect()
    return con.execute(
        f"SELECT o_orderkey, o_totalprice"
        f" FROM read_parquet('{SF_DIR}/orders.parquet')"
    ).df()


# ---------------------------------------------------------------------------
# q57 lag deltas
# ---------------------------------------------------------------------------


def test_q57_deltas_match_sequence_walk(spark):
    rows = {
        int(r["event_id"]): r["prev_gap_us"]
        for r in _q(spark, "q57_event_deltas").collect()
    }
    seqs = _per_user(_events())
    for uid, evs in seqs.items():
        prev = None
        for us, eid, _, _ in evs:
            gap = None if prev is None else us - prev
            assert rows[eid] == gap, (uid, eid)
            prev = us


# ---------------------------------------------------------------------------
# q58 exact NTILE quartiles
# ---------------------------------------------------------------------------


def test_q58_quartiles_match_sql_ntile(spark):
    rows = {
        int(r["quartile"]): r
        for r in _q(spark, "q58_ntile_quartiles").collect()
    }
    o = _orders()
    ranked = sorted(
        (float(p), int(k)) for k, p in zip(o["o_orderkey"], o["o_totalprice"])
    )
    total, nb = len(ranked), 4
    q, r = divmod(total, nb)
    buckets: dict[int, list[float]] = {}
    for rn1, (p, _) in enumerate(ranked, start=1):
        cut = r * (q + 1)
        b = (rn1 - 1) // (q + 1) + 1 if rn1 <= cut \
            else (rn1 - cut - 1) // q + r + 1
        buckets.setdefault(b, []).append(p)
    assert set(rows) == set(buckets)
    for b, vs in buckets.items():
        row = rows[b]
        assert row["cnt"] == len(vs)
        assert row["lo"] == pytest.approx(round(min(vs), 2), abs=1e-9)
        assert row["hi"] == pytest.approx(round(max(vs), 2), abs=1e-9)


# ---------------------------------------------------------------------------
# q59 3-row moving average
# ---------------------------------------------------------------------------


def test_q59_moving_avg_matches_rows_frame(spark):
    rows = {
        int(r["event_id"]): r["mov_avg"]
        for r in _q(spark, "q59_moving_avg").collect()
    }
    seqs = _per_user(_events())
    for uid, evs in seqs.items():
        vals = [v for _, _, _, v in evs]
        for i, (_, eid, _, _) in enumerate(evs):
            window = vals[max(0, i - 2): i + 1]
            assert rows[eid] == pytest.approx(
                sum(window) / len(window), abs=1e-4
            ), (uid, eid)


# ---------------------------------------------------------------------------
# q93 cohort retention
# ---------------------------------------------------------------------------


def test_q93_retention_matches_cohort_census(spark):
    rows = {
        (int(r["cohort_week"]), int(r["week"])): int(r["n_users"])
        for r in _q(spark, "q93_cohort_retention").collect()
    }
    ev = _events()
    act: set[tuple[int, int]] = set()
    for us, uid in zip(ev["us"], ev["user_id"]):
        act.add((int(uid), (int(us) - EPOCH) // 604_800_000_000))
    first: dict[int, int] = {}
    for uid, wk in act:
        if uid not in first or wk < first[uid]:
            first[uid] = wk
    cells: dict[tuple[int, int], set] = {}
    for uid, wk in act:
        cells.setdefault((first[uid], wk), set()).add(uid)
    assert rows == {k: len(us) for k, us in cells.items()}


# ---------------------------------------------------------------------------
# q172 trailing-hour RANGE frame
# ---------------------------------------------------------------------------


def test_q172_range_frame_matches_two_pointer_scan(spark):
    rows = {
        int(r["event_id"]): r
        for r in _q(spark, "q172_time_range_moving_avg").collect()
    }
    seqs = _per_user(_events())
    HOUR = 3_600_000_000
    for uid, evs in seqs.items():
        for us, eid, _, _ in evs:
            frame = [
                v for ous, _, _, v in evs if us - HOUR <= ous <= us
            ]
            row = rows[eid]
            assert row["n_in_window"] == len(frame)
            assert row["hourly_avg"] == pytest.approx(
                sum(frame) / len(frame), abs=1e-3
            )


# ---------------------------------------------------------------------------
# q201 / q202 / q203 global order statistics
# ---------------------------------------------------------------------------


def test_q201_percent_rank_matches_sorted_list(spark):
    rows = {
        int(r["o_orderkey"]): r["pct_rank"]
        for r in _q(spark, "q201_global_percent_rank").collect()
    }
    o = _orders()
    ranked = sorted(
        (float(p), int(k)) for k, p in zip(o["o_orderkey"], o["o_totalprice"])
    )
    n = len(ranked)
    for rn0, (_, k) in enumerate(ranked):
        assert rows[k] == pytest.approx(rn0 / (n - 1), abs=1.1e-6)


def test_q202_global_median_matches_middle_rows(spark):
    row = _q(spark, "q202_exact_global_median").collect()[0]
    o = _orders()
    vals = sorted(float(p) for p in o["o_totalprice"])
    n = len(vals)
    if n % 2 == 1:
        med = vals[n // 2]
    else:
        med = (vals[n // 2 - 1] + vals[n // 2]) / 2
    assert row["n_orders"] == n
    assert row["median_price"] == pytest.approx(round(med, 2), abs=1e-9)


def test_q203_cume_dist_matches_peer_groups(spark):
    rows = {
        int(r["o_orderkey"]): r["cd"]
        for r in _q(spark, "q203_global_cume_dist").collect()
    }
    o = _orders()
    vals = sorted(float(p) for p in o["o_totalprice"])
    n = len(vals)
    import bisect

    for k, p in zip(o["o_orderkey"], o["o_totalprice"]):
        le = bisect.bisect_right(vals, float(p))
        assert rows[int(k)] == pytest.approx(le / n, abs=1.1e-6)


# ---------------------------------------------------------------------------
# q239 nearest as-of with tolerance
# ---------------------------------------------------------------------------


def test_q239_nearest_asof_matches_bidirectional_scan(spark):
    rows = {
        int(r["event_id"]): r
        for r in _q(spark, "q239_asof_nearest").collect()
    }
    seqs = _per_user(_events())
    TOL = 3_600_000_000
    expected = {}
    for uid, evs in seqs.items():
        rights = sorted(
            (us, eid) for us, eid, et, _ in evs if et != "purchase"
        )
        for us, eid, et, _ in evs:
            if et != "purchase":
                continue
            prior = max(
                ((rus, rid) for rus, rid in rights if rus <= us),
                default=None,
            )
            nxt = min(
                ((rus, rid) for rus, rid in rights if rus > us),
                default=None,
            )
            if prior is None and nxt is None:
                continue
            dtp = None if prior is None else us - prior[0]
            dtn = None if nxt is None else nxt[0] - us
            if prior is not None and (nxt is None or dtp <= dtn):
                pick, dt = prior[1], dtp
            else:
                pick, dt = nxt[1], dtn
            if dt <= TOL:
                expected[eid] = (uid, us, pick, dt)
    assert set(rows) == set(expected)
    for eid, (uid, us, pick, dt) in expected.items():
        row = rows[eid]
        assert (row["user_id"], row["ts_us"]) == (uid, us)
        assert row["nearest_event_id"] == pick
        assert row["dt_us"] == dt


# ---------------------------------------------------------------------------
# q240 interval-overlap join
# ---------------------------------------------------------------------------


def test_q240_overlap_join_matches_interval_scan(spark):
    rows = {}
    for r in _q(spark, "q240_interval_overlap_join").collect():
        key = (r["user_id"], int(r["day_idx"]), int(r["error_id"]))
        rows[key] = (
            int(r["a_start"]), int(r["a_end"]), int(r["overlap_us"]),
        )
    seqs = _per_user(_events())
    HALF = 1_800_000_000
    ref = {}
    for uid, evs in seqs.items():
        by_day: dict[int, list[int]] = {}
        for us, _, et, _ in evs:
            if et == "click":
                by_day.setdefault(us // US_PER_DAY, []).append(us)
        envs = {
            d: (min(ts), max(ts)) for d, ts in by_day.items()
        }
        for us, eid, et, _ in evs:
            if et != "error":
                continue
            b0, b1 = us - HALF, us + HALF
            for d in {b0 // US_PER_DAY, b1 // US_PER_DAY}:
                if d not in envs:
                    continue
                a0, a1 = envs[d]
                if a0 <= b1 and b0 <= a1:
                    ref[(uid, d, eid)] = (
                        a0, a1, min(a1, b1) - max(a0, b0),
                    )
    assert rows == ref


# ---------------------------------------------------------------------------
# q401 session-overlap top pairs
# ---------------------------------------------------------------------------


def test_q401_session_overlaps_match_pair_scan(spark):
    got = [
        (int(r["user_a"]), int(r["user_b"]), int(r["n_overlaps"]),
         int(r["overlap_us"]))
        for r in _q(spark, "q401_session_overlap_join").collect()
    ]
    seqs = _per_user(_events())
    GAP = 30 * 60 * 1_000_000
    sessions: list[tuple[int, int, int]] = []  # (user, s0, s1)
    for uid, evs in seqs.items():
        prev = None
        s0 = None
        for us, _, _, _ in evs:
            if prev is None or us - prev > GAP:
                if s0 is not None:
                    sessions.append((uid, s0, prev + GAP))
                s0 = us
            prev = us
        sessions.append((uid, s0, prev + GAP))
    agg: dict[tuple[int, int], list[int]] = {}
    for ua, a0, a1 in sessions:
        for ub, b0, b1 in sessions:
            if ua == ub:
                continue
            later = b0 > a0 or (b0 == a0 and ub > ua)
            if later and b0 < a1:
                cell = agg.setdefault((ua, ub), [0, 0])
                cell[0] += 1
                cell[1] += min(a1, b1) - b0
    ranked = sorted(
        ((k[0], k[1], v[0], v[1]) for k, v in agg.items()),
        key=lambda t: (-t[2], t[0], t[1]),
    )[:15]
    assert got == ranked
