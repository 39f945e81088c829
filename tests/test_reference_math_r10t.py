"""Independent brute-force references, round 10 batch T: statistical
aggregates, histograms, gap audits, and basket lift.

q64 moment-aggregate suite (textbook sample stddev/var/corr/cov),
q66 cent-exact histogram, q90 calendar gap fill, q95 argmax
witnesses, q96 per-user z outliers, q120 dense-rank top-k with ties,
q128 ISO-weekday seasonality, q136 key-gap audit, q137 MoM growth,
q187 basket co-occurrence lift. Pure-Python recomputation from raw
parquet at sf0.001, as in batches A-S.
"""

from __future__ import annotations

import datetime
import math

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


def _orders():
    con = duckdb.connect()
    return con.execute(
        f"SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice"
        f" FROM read_parquet('{SF_DIR}/orders.parquet')"
    ).df()


# ---------------------------------------------------------------------------
# q64 moment-aggregate suite
# ---------------------------------------------------------------------------


def test_q64_stats_match_textbook_moments(spark):
    rows = {
        r["event_type"]: r for r in _q(spark, "q64_stats_suite").collect()
    }
    ev = _events()
    groups: dict[str, list[tuple[float, float]]] = {}
    for et, v, uid in zip(ev["event_type"], ev["value"], ev["user_id"]):
        groups.setdefault(et, []).append((float(v), float(uid)))
    for et, pts in groups.items():
        n = len(pts)
        mv = sum(v for v, _ in pts) / n
        mu = sum(u for _, u in pts) / n
        var = sum((v - mv) ** 2 for v, _ in pts) / (n - 1)
        cov = sum((v - mv) * (u - mu) for v, u in pts) / (n - 1)
        varu = sum((u - mu) ** 2 for _, u in pts) / (n - 1)
        corr = cov / math.sqrt(var * varu)
        row = rows[et]
        assert row["sd_value"] == pytest.approx(math.sqrt(var), abs=1e-4)
        assert row["var_value"] == pytest.approx(var, abs=1e-3)
        assert row["corr_user"] == pytest.approx(corr, abs=1e-4)
        assert row["covar_user"] == pytest.approx(cov, abs=1e-2)


# ---------------------------------------------------------------------------
# q66 cent-exact histogram
# ---------------------------------------------------------------------------


def test_q66_histogram_matches_cent_buckets(spark):
    rows = {
        int(r["bucket"]): r
        for r in _q(spark, "q66_value_histogram").collect()
    }
    ev = _events()
    from decimal import Decimal

    buckets: dict[int, int] = {}
    for v in ev["value"]:
        cents = int(Decimal(str(v)).scaleb(2))
        b = cents // 2500
        buckets[b] = buckets.get(b, 0) + 1
    assert set(rows) == set(buckets)
    for b, n in buckets.items():
        assert rows[b]["cnt"] == n


# ---------------------------------------------------------------------------
# q90 calendar gap fill
# ---------------------------------------------------------------------------


def test_q90_gapfill_matches_spine(spark):
    rows = {
        r["day"]: int(r["n_orders"])
        for r in _q(spark, "q90_date_spine_gapfill").collect()
    }
    o = _orders()
    daily: dict[datetime.date, int] = {}
    for d in o["o_orderdate"]:
        d = d.date() if hasattr(d, "date") else d
        daily[d] = daily.get(d, 0) + 1
    lo, hi = min(daily), max(daily)
    expected = {}
    d = lo
    while d <= hi:
        expected[d] = daily.get(d, 0)
        d += datetime.timedelta(days=1)
    got = {
        (k.date() if hasattr(k, "date") else k): v for k, v in rows.items()
    }
    assert got == expected
    assert any(v == 0 for v in expected.values()) or len(expected) == len(
        daily
    )


# ---------------------------------------------------------------------------
# q95 argmax witnesses
# ---------------------------------------------------------------------------


def test_q95_argmax_matches_witness_scan(spark):
    rows = {
        r["user_id"]: r
        for r in _q(spark, "q95_argmax_per_group").collect()
    }
    ev = _events()
    best: dict[int, tuple[float, int, str]] = {}
    for eid, uid, et, v in zip(
        ev["event_id"], ev["user_id"], ev["event_type"], ev["value"]
    ):
        key = (float(v), int(eid))
        cur = best.get(int(uid))
        if cur is None or key > (cur[0], cur[1]):
            best[int(uid)] = (float(v), int(eid), et)
    assert set(rows) == set(best)
    for uid, (v, eid, et) in best.items():
        row = rows[uid]
        assert row["top_event_id"] == eid
        assert row["top_event_type"] == et
        assert row["top_value"] == pytest.approx(round(v, 6), abs=1e-9)


# ---------------------------------------------------------------------------
# q96 per-user z outliers
# ---------------------------------------------------------------------------


def test_q96_zscores_match_per_user_moments(spark):
    rows = {
        int(r["event_id"]): r
        for r in _q(spark, "q96_zscore_outliers").collect()
    }
    ev = _events()
    groups: dict[int, list[tuple[int, float]]] = {}
    for eid, uid, v in zip(ev["event_id"], ev["user_id"], ev["value"]):
        groups.setdefault(int(uid), []).append((int(eid), float(v)))
    expected = {}
    for uid, pts in groups.items():
        n = len(pts)
        if n < 2:
            continue
        mu = sum(v for _, v in pts) / n
        sd = math.sqrt(sum((v - mu) ** 2 for _, v in pts) / (n - 1))
        if sd <= 0:
            continue
        for eid, v in pts:
            if abs(v - mu) > 2.5 * sd:
                expected[eid] = (uid, v, (v - mu) / sd)
    assert set(rows) == set(expected)
    for eid, (uid, v, z) in expected.items():
        row = rows[eid]
        assert row["user_id"] == uid
        assert row["value"] == pytest.approx(round(v, 6), abs=1e-9)
        assert row["z"] == pytest.approx(z, abs=1e-3)


# ---------------------------------------------------------------------------
# q120 dense-rank top-k with ties
# ---------------------------------------------------------------------------


def test_q120_topk_ties_match_dense_rank(spark):
    rows = {}
    for r in _q(spark, "q120_topk_with_ties").collect():
        rows[int(r["o_orderkey"])] = (r["o_custkey"], int(r["rnk"]))
    o = _orders()
    from decimal import Decimal

    per: dict[int, list[tuple[int, int]]] = {}
    for ok, ck, p in zip(o["o_orderkey"], o["o_custkey"], o["o_totalprice"]):
        cents = int(Decimal(str(p)).scaleb(2))
        per.setdefault(int(ck), []).append((cents, int(ok)))
    expected = {}
    for ck, items in per.items():
        distinct = sorted({c for c, _ in items}, reverse=True)
        rank_of = {c: i + 1 for i, c in enumerate(distinct[:3])}
        for c, ok in items:
            if c in rank_of:
                expected[ok] = (ck, rank_of[c])
    assert rows == expected


# ---------------------------------------------------------------------------
# q128 ISO-weekday seasonality
# ---------------------------------------------------------------------------


def test_q128_seasonality_matches_isodow_census(spark):
    rows = {
        (r["event_type"], int(r["iso_dow"])): r
        for r in _q(spark, "q128_weekday_seasonality").collect()
    }
    ev = _events()
    cnt: dict[tuple[str, int], int] = {}
    tot: dict[str, int] = {}
    for us, et in zip(ev["us"], ev["event_type"]):
        dt = datetime.datetime.fromtimestamp(
            int(us) / 1e6, tz=datetime.timezone.utc
        )
        dow = dt.isoweekday()
        cnt[(et, dow)] = cnt.get((et, dow), 0) + 1
        tot[et] = tot.get(et, 0) + 1
    assert set(rows) == set(cnt)
    for (et, dow), n in cnt.items():
        row = rows[(et, dow)]
        assert row["n"] == n
        assert row["seasonality"] == pytest.approx(
            n / (tot[et] / 7.0), abs=1e-3
        )


# ---------------------------------------------------------------------------
# q136 key-gap audit
# ---------------------------------------------------------------------------


def test_q136_gap_audit_matches_sequence_scan(spark):
    rows = {
        int(r["gap_start"]): (int(r["gap_end"]), int(r["n_missing"]))
        for r in _q(spark, "q136_key_gap_audit").collect()
    }
    o = _orders()
    keys = sorted(
        int(k) for k in o["o_orderkey"]
        if int(k) % 97 != 0 and not (1000 <= int(k) <= 1009)
    )
    expected = {}
    for a, b in zip(keys, keys[1:]):
        if b - a > 1:
            expected[a + 1] = (b - 1, b - a - 1)
    assert rows == expected
    assert len(expected) > 0  # the seeded damage must be found


# ---------------------------------------------------------------------------
# q137 MoM revenue growth
# ---------------------------------------------------------------------------


def test_q137_mom_growth_matches_month_census(spark):
    rows = {}
    for r in _q(spark, "q137_mom_revenue_growth").collect():
        k = r["month"]
        rows[k.date() if hasattr(k, "date") else k] = (
            r["revenue"], r["mom_growth"],
        )
    o = _orders()
    monthly: dict[datetime.date, float] = {}
    for d, p in zip(o["o_orderdate"], o["o_totalprice"]):
        d = d.date() if hasattr(d, "date") else d
        m = d.replace(day=1)
        monthly[m] = monthly.get(m, 0.0) + float(p)
    months = sorted(monthly)
    assert set(rows) == set(months)
    prev = None
    for m in months:
        rev, growth = rows[m]
        assert rev == pytest.approx(monthly[m], abs=1.0)
        if prev is None:
            assert growth is None
        else:
            assert growth == pytest.approx(
                monthly[m] / monthly[prev] - 1, abs=1e-3
            )
        prev = m


# ---------------------------------------------------------------------------
# q187 basket co-occurrence lift
# ---------------------------------------------------------------------------


def test_q187_lift_matches_basket_census(spark):
    rows = {
        (r["type_a"], r["type_b"]): r
        for r in _q(spark, "q187_cooccurrence_lift").collect()
    }
    ev = _events()
    baskets: dict[tuple[int, int], set] = {}
    for us, uid, et in zip(ev["us"], ev["user_id"], ev["event_type"]):
        d = (int(us) - EPOCH) // US_PER_DAY
        baskets.setdefault((int(uid), d), set()).add(et)
    nb = len(baskets)
    singles: dict[str, int] = {}
    pairs: dict[tuple[str, str], int] = {}
    for types in baskets.values():
        for t1 in types:
            singles[t1] = singles.get(t1, 0) + 1
        ts = sorted(types)
        for i in range(len(ts)):
            for j in range(i + 1, len(ts)):
                pairs[(ts[i], ts[j])] = pairs.get((ts[i], ts[j]), 0) + 1
    assert set(rows) == set(pairs)
    for key, n_ab in pairs.items():
        row = rows[key]
        na, nb_ = singles[key[0]], singles[key[1]]
        assert row["n_ab"] == n_ab
        assert row["support"] == pytest.approx(n_ab / nb, abs=1e-5)
        assert row["confidence_a_b"] == pytest.approx(n_ab / na, abs=1e-5)
        assert row["lift"] == pytest.approx(
            n_ab * nb / (na * nb_), abs=1e-3
        )
