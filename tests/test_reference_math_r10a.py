"""Independent brute-force references, round 10 batch A (VERDICT r9
item 2): the highest-risk uncovered statistical operators whose DuckDB
twins share the Spark formula, so a green oracle row proves engine
agreement but not correct math (the q430 James-Stein bug class).

Each test recomputes the statistic from the raw parquet with a
deliberately NAIVE pure-Python algorithm (dict loops, sorted lists,
math.log) and pins the Spark result against it at sf0.001.

Batch A: q148 Benford, q155 weighted median, q174 partial-agg merge,
q200 KS, q229 KL, q244 PSI, q253 exponential decay, q260 CUSUM,
q108 Shannon entropy, q140 OLS regression aggregates.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from tests.conftest import SF_DIR


def _pdf(table: str, cols: str = "*"):
    con = duckdb.connect()
    return con.execute(
        f"SELECT {cols} FROM read_parquet('{SF_DIR}/{table}.parquet')"
    ).df()


def _q(spark, name):
    from __spark_entry__ import queries

    return queries()[name](spark, SF_DIR)


def _tdiv(a: int, b: int) -> int:
    """Truncating integer division (Spark DIV / DuckDB // semantics)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


US_PER_DAY = 86_400_000_000
EVENTS_EPOCH_US = 1_704_067_200_000_000


def _events_us():
    con = duckdb.connect()
    return con.execute(
        f"SELECT event_id, epoch_us(ts) AS us, user_id, event_type, value"
        f" FROM read_parquet('{SF_DIR}/events.parquet')"
    ).df()


# ---------------------------------------------------------------------------
# q148 Benford first-digit audit
# ---------------------------------------------------------------------------


def test_q148_benford_matches_digit_census(spark):
    rows = {r["digit"]: r for r in _q(spark, "q148_benford_audit").collect()}
    prices = [float(p) for p in _pdf("orders", "o_totalprice")["o_totalprice"]]
    kept = [p for p in prices if p >= 1]
    counts: dict[int, int] = {}
    for p in kept:
        d = int(str(int(math.floor(p)))[0])
        counts[d] = counts.get(d, 0) + 1
    assert set(rows) == set(counts)
    total = len(kept)
    for d, n in counts.items():
        row = rows[d]
        assert row["n"] == n
        assert row["obs_share"] == pytest.approx(n / total, abs=1.1e-6)
        assert row["benford_share"] == pytest.approx(
            math.log10(1 + 1.0 / d), abs=1.1e-6
        )


# ---------------------------------------------------------------------------
# q155 weighted median (weight = lineitem count)
# ---------------------------------------------------------------------------


def test_q155_weighted_median_matches_cumulative_walk(spark):
    rows = {
        r["o_orderpriority"]: r["weighted_median"]
        for r in _q(spark, "q155_weighted_median").collect()
    }
    o = _pdf("orders", "o_orderkey, o_orderpriority, o_totalprice")
    li = _pdf("lineitem", "l_orderkey")
    wt: dict[int, int] = {}
    for k in li["l_orderkey"]:
        wt[int(k)] = wt.get(int(k), 0) + 1
    groups: dict[str, list[tuple[float, int, int]]] = {}
    for k, pri, price in zip(
        o["o_orderkey"], o["o_orderpriority"], o["o_totalprice"]
    ):
        w = wt.get(int(k), 0)
        if w:  # inner join: zero-lineitem orders carry no weight rows
            groups.setdefault(pri, []).append((float(price), int(k), w))
    assert set(rows) == set(groups)
    for pri, items in groups.items():
        items.sort(key=lambda t: (t[0], t[1]))
        total = sum(w for _, _, w in items)
        cum = 0
        # first (price, cum) with 2*cum >= total, ordered by (price, cum)
        hits = []
        for price, _, w in items:
            cum += w
            if 2 * cum >= total:
                hits.append((price, cum))
        med = min(hits)[0]
        assert rows[pri] == pytest.approx(round(med, 2), abs=1e-9)


# ---------------------------------------------------------------------------
# q174 partial-aggregate merge == full recompute
# ---------------------------------------------------------------------------


def test_q174_partial_agg_merge_matches_full_recompute(spark):
    from decimal import Decimal

    rows = {
        (r["day_idx"], r["event_type"]): r
        for r in _q(spark, "q174_partial_agg_merge").collect()
    }
    ev = _events_us()
    agg: dict[tuple[int, str], list] = {}
    for us, et, v in zip(ev["us"], ev["event_type"], ev["value"]):
        day = (int(us) - EVENTS_EPOCH_US) // US_PER_DAY
        cell = agg.setdefault((day, et), [0, Decimal(0)])
        cell[0] += 1
        # DECIMAL(20,6) cast of a double = its shortest-repr decimal
        # (values are 2dp); exact, order-free accumulation.
        cell[1] += Decimal(str(v))
    assert set(rows) == set(agg)
    for key, (cnt, sv) in agg.items():
        row = rows[key]
        assert row["cnt"] == cnt
        assert row["total_value"] == pytest.approx(float(sv), abs=5.1e-3)
        sm = int(sv.scaleb(6))
        assert row["avg_value_micro"] == _tdiv(2 * sm + cnt, 2 * cnt)


# ---------------------------------------------------------------------------
# q200 two-sample Kolmogorov-Smirnov
# ---------------------------------------------------------------------------


def test_q200_ks_matches_pooled_cdf_walk(spark):
    row = _q(spark, "q200_ks_drift").collect()[0]
    docs = _pdf("documents", "source, n_chars")
    s0 = sorted(
        int(n) for s, n in zip(docs["source"], docs["n_chars"]) if s == "src0"
    )
    s1 = sorted(
        int(n) for s, n in zip(docs["source"], docs["n_chars"]) if s == "src1"
    )
    n0, n1 = len(s0), len(s1)
    d = 0.0
    for x in sorted(set(s0) | set(s1)):
        c0 = sum(1 for v in s0 if v <= x)
        c1 = sum(1 for v in s1 if v <= x)
        d = max(d, abs(c0 / n0 - c1 / n1))
    assert row["n_src0"] == n0
    assert row["n_src1"] == n1
    assert row["ks_stat"] == pytest.approx(d, abs=1.1e-6)


# ---------------------------------------------------------------------------
# q229 KL(source || corpus) over length buckets
# ---------------------------------------------------------------------------


def test_q229_kl_matches_bucket_histogram(spark):
    rows = {
        r["source"]: r for r in _q(spark, "q229_source_length_kl").collect()
    }
    docs = _pdf("documents", "source, n_chars")
    cnt: dict[tuple[str, int], int] = {}
    for s, n in zip(docs["source"], docs["n_chars"]):
        b = min(int(n) // 100, 9)
        cnt[(s, b)] = cnt.get((s, b), 0) + 1
    n_total = len(docs)
    bucket_tot = {}
    for (s, b), c in cnt.items():
        bucket_tot[b] = bucket_tot.get(b, 0) + c
    src_tot = {}
    for (s, b), c in cnt.items():
        src_tot[s] = src_tot.get(s, 0) + c
    for s in src_tot:
        kl = sum(
            (c / src_tot[s])
            * math.log((c / src_tot[s]) / (bucket_tot[b] / n_total))
            for (ss, b), c in cnt.items()
            if ss == s
        )
        assert rows[s]["n_docs"] == src_tot[s]
        assert rows[s]["kl"] == pytest.approx(kl, abs=1e-3)


# ---------------------------------------------------------------------------
# q244 PSI (even/odd doc_id halves, add-one smoothing, 10 buckets)
# ---------------------------------------------------------------------------


def test_q244_psi_matches_smoothed_histogram(spark):
    rows = {r["source"]: r for r in _q(spark, "q244_psi_drift").collect()}
    docs = _pdf("documents", "doc_id, source, n_chars")
    ref: dict[tuple[str, int], int] = {}
    cur: dict[tuple[str, int], int] = {}
    sources = set()
    for i, s, n in zip(docs["doc_id"], docs["source"], docs["n_chars"]):
        b = min(int(n) // 100, 9)
        sources.add(s)
        side = ref if int(i) % 2 == 0 else cur
        side[(s, b)] = side.get((s, b), 0) + 1
    for s in sources:
        nr = sum(c for (ss, _), c in ref.items() if ss == s)
        nc = sum(c for (ss, _), c in cur.items() if ss == s)
        psi = 0.0
        for b in range(10):
            pr = (ref.get((s, b), 0) + 1.0) / (nr + 10)
            pc = (cur.get((s, b), 0) + 1.0) / (nc + 10)
            psi += (pc - pr) * math.log(pc / pr)
        row = rows[s]
        assert row["n_ref"] == nr
        assert row["n_cur"] == nc
        assert row["psi"] == pytest.approx(psi, abs=1e-3)


# ---------------------------------------------------------------------------
# q253 exponential time-decay features (tau = 1 day)
# ---------------------------------------------------------------------------


def test_q253_decay_matches_per_event_weights(spark):
    rows = {
        r["user_id"]: r
        for r in _q(spark, "q253_time_decay_features").collect()
    }
    ev = _events_us()
    t_ref = max(int(u) for u in ev["us"])
    acc: dict[int, list] = {}
    for us, uid, v in zip(ev["us"], ev["user_id"], ev["value"]):
        w = math.exp(-(t_ref - int(us)) / US_PER_DAY)
        cell = acc.setdefault(int(uid), [0, 0.0, 0.0])
        cell[0] += 1
        cell[1] += float(v) * w
        cell[2] += w
    assert set(rows) == set(acc)
    for uid, (n, dv, dc) in acc.items():
        row = rows[uid]
        assert row["n_events"] == n
        assert row["decayed_value"] == pytest.approx(dv, abs=1e-3)
        assert row["decayed_count"] == pytest.approx(dc, abs=1e-3)


# ---------------------------------------------------------------------------
# q260 CUSUM changepoint on daily volume
# ---------------------------------------------------------------------------


def test_q260_cusum_matches_running_deviation_sum(spark):
    rows = {
        r["day_idx"]: r
        for r in _q(spark, "q260_cusum_changepoint").collect()
    }
    ev = _events_us()
    daily: dict[int, int] = {}
    for us in ev["us"]:
        d = int(us) // US_PER_DAY
        daily[d] = daily.get(d, 0) + 1
    mean = sum(daily.values()) / len(daily)
    cs = 0.0
    ref = {}
    for d in sorted(daily):
        cs += daily[d] - mean
        ref[d] = round(cs, 4)
    peak = max(abs(v) for v in ref.values())
    assert set(rows) == set(ref)
    for d, v in ref.items():
        row = rows[d]
        assert row["n"] == daily[d]
        assert row["cusum"] == pytest.approx(v, abs=1e-3)
        assert bool(row["is_changepoint"]) == (
            pytest.approx(peak, abs=1e-3) == abs(v)
        )


# ---------------------------------------------------------------------------
# q108 Shannon entropy of each user's event-type mix
# ---------------------------------------------------------------------------


def test_q108_entropy_matches_count_census(spark):
    rows = {
        r["user_id"]: r for r in _q(spark, "q108_user_entropy").collect()
    }
    ev = _events_us()
    cnt: dict[tuple[int, str], int] = {}
    for uid, et in zip(ev["user_id"], ev["event_type"]):
        cnt[(int(uid), et)] = cnt.get((int(uid), et), 0) + 1
    per_user: dict[int, list[int]] = {}
    for (uid, _), c in cnt.items():
        per_user.setdefault(uid, []).append(c)
    assert set(rows) == set(per_user)
    for uid, cs in per_user.items():
        tn = sum(cs)
        h = -sum((c / tn) * math.log2(c / tn) for c in cs)
        row = rows[uid]
        assert row["n_events"] == tn
        assert row["entropy_bits"] == pytest.approx(h, abs=1e-5)


# ---------------------------------------------------------------------------
# q140 SQL2003 regression aggregates (slope/intercept/r2/corr)
# ---------------------------------------------------------------------------


def test_q140_regr_stats_match_textbook_moments(spark):
    import datetime

    rows = {
        r["o_orderpriority"]: r for r in _q(spark, "q140_regr_stats").collect()
    }
    o = _pdf("orders", "o_orderpriority, o_orderdate, o_totalprice")
    base = datetime.date(1992, 1, 1)
    groups: dict[str, list[tuple[float, float]]] = {}
    for pri, dt, price in zip(
        o["o_orderpriority"], o["o_orderdate"], o["o_totalprice"]
    ):
        d = dt.date() if hasattr(dt, "date") else dt
        groups.setdefault(pri, []).append(
            (float((d - base).days), float(price))
        )
    assert set(rows) == set(groups)
    for pri, pts in groups.items():
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxx = sum(x * x for x, _ in pts)
        syy = sum(y * y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        intercept = sy / n - slope * sx / n
        corr = (n * sxy - sx * sy) / math.sqrt(
            (n * sxx - sx * sx) * (n * syy - sy * sy)
        )
        row = rows[pri]
        assert row["n"] == n
        assert row["slope"] == pytest.approx(slope, abs=1e-4)
        assert row["intercept"] == pytest.approx(intercept, rel=1e-6)
        assert row["r2"] == pytest.approx(corr * corr, abs=1e-5)
        assert row["corr_xy"] == pytest.approx(corr, abs=1e-5)
