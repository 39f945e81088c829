"""Independent brute-force references, round 10 batch R: CDC/SCD2
versioning, the clamped-walk identity, CEP pattern matching, and
session-path analytics.

q88 SCD2 history build, q100 latest-wins CDC apply, q124 floor-capped
running balance (the genuine sequential recursion vs the
reflected-walk identity), q127 session-window abandonment, q135 OHLC
bars, q161 time-to-convert, q179 AS-OF snapshot, q198 top session
paths, q233 click->purchase CEP with error veto. Pure-Python
recomputation from raw parquet at sf0.001, as in batches A-Q.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import SF_DIR

US_PER_DAY = 86_400_000_000
EPOCH = 1_704_067_200_000_000
ANCHOR_US = 1_705_276_800_000_000


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


def _scd2_history(seqs):
    """user -> [(event_type, version, valid_from, valid_to|None,
    n_events)] built by literal run collapsing."""
    out: dict[int, list] = {}
    for uid, evs in seqs.items():
        runs = []
        for us, _, et, _ in evs:
            if runs and runs[-1][0] == et:
                runs[-1][2] += 1
            else:
                runs.append([et, us, 1])
        hist = []
        for i, (et, vf, n) in enumerate(runs):
            vt = runs[i + 1][1] if i + 1 < len(runs) else None
            hist.append((et, i + 1, vf, vt, n))
        out[uid] = hist
    return out


# ---------------------------------------------------------------------------
# q88 SCD2 history
# ---------------------------------------------------------------------------


def test_q88_scd2_matches_run_collapsing(spark):
    rows = {}
    for r in _q(spark, "q88_scd2_history").collect():
        rows[(r["user_id"], int(r["version"]))] = (
            r["event_type"], int(r["valid_from_us"]),
            None if r["valid_to_us"] is None else int(r["valid_to_us"]),
        )
    hist = _scd2_history(_per_user(_events()))
    ref = {}
    for uid, runs in hist.items():
        for et, ver, vf, vt, _ in runs:
            ref[(uid, ver)] = (et, vf, vt)
    assert rows == ref


# ---------------------------------------------------------------------------
# q100 latest-wins CDC apply
# ---------------------------------------------------------------------------


def test_q100_cdc_matches_latest_wins(spark):
    rows = {
        r["user_id"]: r for r in _q(spark, "q100_cdc_apply").collect()
    }
    seqs = _per_user(_events())
    expected = {}
    for uid, evs in seqs.items():
        us, eid, et, v = evs[-1]  # max by (ts, event_id)
        if et != "error":
            expected[uid] = (et, round(v, 6), us)
    assert set(rows) == set(expected)
    for uid, (et, v, us) in expected.items():
        row = rows[uid]
        assert row["last_type"] == et
        assert row["last_value"] == pytest.approx(v, abs=1e-9)
        assert row["last_ts_us"] == us


# ---------------------------------------------------------------------------
# q124 floor-capped running balance (genuine sequential recursion)
# ---------------------------------------------------------------------------


def test_q124_capped_balance_matches_sequential_recursion(spark):
    rows = {
        int(r["event_id"]): r["balance"]
        for r in _q(spark, "q124_capped_running_balance").collect()
    }
    seqs = _per_user(_events())
    for uid, evs in seqs.items():
        bal = 0.0
        for us, eid, et, v in evs:
            delta = v if et == "purchase" else (-v if et == "error" else 0.0)
            bal = max(0.0, bal + delta)
            assert rows[eid] == pytest.approx(bal, abs=1e-4), (uid, eid)


# ---------------------------------------------------------------------------
# q127 session-window abandonment
# ---------------------------------------------------------------------------


def test_q127_abandonment_matches_session_census(spark):
    rows = {
        r["user_id"]: r
        for r in _q(spark, "q127_abandoned_sessions").collect()
    }
    seqs = _per_user(_events())
    GAP = 1_800_000_000
    for uid, evs in seqs.items():
        sessions = []
        cur_end = None
        for us, _, et, _ in evs:
            # Spark session_window: merge while ts < window end
            if cur_end is None or us >= cur_end:
                sessions.append({et})
            else:
                sessions[-1].add(et)
            cur_end = max(cur_end or 0, us + GAP)
        n = len(sessions)
        ab = sum(
            1 for s in sessions if "view" in s and "purchase" not in s
        )
        row = rows[uid]
        assert row["n_sessions"] == n
        assert row["n_abandoned"] == ab
        assert row["abandon_rate"] == pytest.approx(ab / n, abs=1e-3)


# ---------------------------------------------------------------------------
# q135 OHLC bars
# ---------------------------------------------------------------------------


def test_q135_ohlc_matches_per_day_extremes(spark):
    rows = {
        (r["user_id"], int(r["day_idx"])): r
        for r in _q(spark, "q135_ohlc_bars").collect()
    }
    seqs = _per_user(_events())
    ref = {}
    for uid, evs in seqs.items():
        per_day: dict[int, list] = {}
        for us, eid, _, v in evs:
            d = (us - EPOCH) // US_PER_DAY
            per_day.setdefault(d, []).append((us, eid, v))
        for d, items in per_day.items():
            items.sort(key=lambda t: (t[0], t[1]))
            vals = [v for _, _, v in items]
            ref[(uid, d)] = (
                items[0][2], max(vals), min(vals), items[-1][2], len(items)
            )
    assert set(rows) == set(ref)
    for key, (o, h, lo, c, n) in ref.items():
        row = rows[key]
        assert row["open"] == pytest.approx(round(o, 6), abs=1e-9)
        assert row["high"] == pytest.approx(round(h, 6), abs=1e-9)
        assert row["low"] == pytest.approx(round(lo, 6), abs=1e-9)
        assert row["close"] == pytest.approx(round(c, 6), abs=1e-9)
        assert row["n_ticks"] == n


# ---------------------------------------------------------------------------
# q161 time-to-convert
# ---------------------------------------------------------------------------


def test_q161_time_to_convert_matches_first_pair(spark):
    rows = {
        r["user_id"]: r for r in _q(spark, "q161_time_to_convert").collect()
    }
    seqs = _per_user(_events())
    expected = {}
    for uid, evs in seqs.items():
        views = [us for us, _, et, _ in evs if et == "view"]
        if not views:
            continue
        fv = min(views)
        purchases = [
            us for us, _, et, _ in evs if et == "purchase" and us >= fv
        ]
        fp = min(purchases) if purchases else None
        expected[uid] = (fv, fp)
    assert set(rows) == set(expected)
    for uid, (fv, fp) in expected.items():
        row = rows[uid]
        assert row["first_view_us"] == fv
        assert row["first_purchase_us"] == fp
        assert row["convert_us"] == (None if fp is None else fp - fv)


# ---------------------------------------------------------------------------
# q179 AS-OF snapshot
# ---------------------------------------------------------------------------


def test_q179_asof_snapshot_matches_interval_lookup(spark):
    rows = {
        r["user_id"]: r
        for r in _q(spark, "q179_scd2_asof_snapshot").collect()
    }
    hist = _scd2_history(_per_user(_events()))
    expected = {}
    for uid, runs in hist.items():
        for et, ver, vf, vt, _ in runs:
            if vf <= ANCHOR_US and (vt is None or vt > ANCHOR_US):
                expected[uid] = (et, ver, vf)
    assert set(rows) == set(expected)
    for uid, (et, ver, vf) in expected.items():
        row = rows[uid]
        assert row["state_asof"] == et
        assert row["version"] == ver
        assert row["valid_from_us"] == vf


# ---------------------------------------------------------------------------
# q198 top session paths
# ---------------------------------------------------------------------------


def test_q198_paths_match_session_render(spark):
    got = [
        (r["path"], int(r["n_sessions"]))
        for r in _q(spark, "q198_top_session_paths").collect()
    ]
    seqs = _per_user(_events())
    cnt: dict[str, int] = {}
    for uid, evs in seqs.items():
        prev = None
        cur: list[str] = []
        for us, _, et, _ in evs:
            if prev is not None and us - prev <= 1_800_000_000:
                cur.append(et)
            else:
                if cur:
                    p = ">".join(cur)
                    cnt[p] = cnt.get(p, 0) + 1
                cur = [et]
            prev = us
        if cur:
            p = ">".join(cur)
            cnt[p] = cnt.get(p, 0) + 1
    ref = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert got == ref


# ---------------------------------------------------------------------------
# q233 click->purchase CEP with error veto
# ---------------------------------------------------------------------------


def test_q233_cep_matches_pattern_scan(spark):
    rows = {
        int(r["click_id"]): r
        for r in _q(spark, "q233_pattern_click_purchase").collect()
    }
    seqs = _per_user(_events())
    HORIZON = 600_000_000
    expected = {}
    for uid, evs in seqs.items():
        for i, (us, eid, et, _) in enumerate(evs):
            if et != "click":
                continue
            following = evs[i + 1:]
            purchases = [
                (pus, peid) for pus, peid, pet, _ in following
                if pet == "purchase"
            ]
            errors = [eus for eus, _, eet, _ in following if eet == "error"]
            if not purchases:
                continue
            np_ts, np_id = min(purchases)
            if np_ts > us + HORIZON:
                continue
            if errors and min(errors) < np_ts:
                continue
            expected[eid] = (uid, np_id, np_ts - us)
    assert set(rows) == set(expected)
    for cid, (uid, pid, lat) in expected.items():
        row = rows[cid]
        assert row["user_id"] == uid
        assert row["purchase_id"] == pid
        assert row["latency_us"] == lat
