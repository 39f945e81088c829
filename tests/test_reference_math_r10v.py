"""Independent brute-force references, round 10 batch V: quantiles,
sketch bridges, pivot round trips, decorrelated subqueries, snapshot
diffs, null-safe joins, RFM scoring, and line-level dedup.

q39 interpolated group quantiles, q74 approx-NDV bridge, q75
pivot/unpivot round trip, q91 above-customer-average decorrelation,
q92 ratio-to-report, q110 per-group percent_rank/cume_dist, q114
EXCEPT ALL snapshot diff, q129 null-safe join, q149 discrete
percentiles, q160 RFM triple-NTILE segmentation, q180 line-level
boilerplate dedup, q183 events/time since last purchase. Pure-Python
recomputation from raw parquet at sf0.001, as in batches A-U.
"""

from __future__ import annotations

import math
from decimal import Decimal

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


def _events():
    con = duckdb.connect()
    return con.execute(
        f"SELECT event_id, epoch_us(ts) AS us, user_id, event_type, value"
        f" FROM read_parquet('{SF_DIR}/events.parquet')"
    ).df()


def _quantile_cont(s, q):
    h = (len(s) - 1) * q
    lo = math.floor(h)
    if lo + 1 >= len(s):
        return s[lo]
    return s[lo] + (h - lo) * (s[lo + 1] - s[lo])


def _toks(text):
    import re

    return re.split(r"\s+", str(text).strip().lower())


# ---------------------------------------------------------------------------
# q39 interpolated group quantiles
# ---------------------------------------------------------------------------


def test_q39_quantiles_match_interpolation(spark):
    rows = {
        r["event_type"]: r
        for r in _q(spark, "q39_value_quantiles").collect()
    }
    ev = _events()
    groups: dict[str, list[float]] = {}
    for et, v in zip(ev["event_type"], ev["value"]):
        groups.setdefault(et, []).append(float(v))
    for et, vs in groups.items():
        s = sorted(vs)
        row = rows[et]
        assert row["median_value"] == pytest.approx(
            _quantile_cont(s, 0.5), abs=1e-4
        )
        assert row["p90_value"] == pytest.approx(
            _quantile_cont(s, 0.9), abs=1e-4
        )
        assert row["min_value"] == pytest.approx(s[0], abs=1e-9)
        assert row["max_value"] == pytest.approx(s[-1], abs=1e-9)


# ---------------------------------------------------------------------------
# q74 approx-NDV bridge
# ---------------------------------------------------------------------------


def test_q74_ndv_bridge_matches_exact_census(spark):
    rows = {
        r["event_type"]: r for r in _q(spark, "q74_approx_ndv").collect()
    }
    ev = _events()
    users: dict[str, set] = {}
    n_ev: dict[str, int] = {}
    for et, uid in zip(ev["event_type"], ev["user_id"]):
        users.setdefault(et, set()).add(int(uid))
        n_ev[et] = n_ev.get(et, 0) + 1
    assert set(rows) == set(users)
    for et in users:
        row = rows[et]
        assert row["n_users_exact"] == len(users[et])
        assert row["n_events"] == n_ev[et]
        assert bool(row["approx_within_10pct"])


# ---------------------------------------------------------------------------
# q75 pivot/unpivot round trip
# ---------------------------------------------------------------------------


def test_q75_roundtrip_matches_group_by(spark):
    rows = {
        (r["user_id"], r["event_type"]): int(r["cnt"])
        for r in _q(spark, "q75_unpivot_roundtrip").collect()
    }
    ev = _events()
    cnt: dict[tuple[int, str], int] = {}
    for uid, et in zip(ev["user_id"], ev["event_type"]):
        cnt[(int(uid), et)] = cnt.get((int(uid), et), 0) + 1
    assert rows == cnt


# ---------------------------------------------------------------------------
# q91 above-customer-average
# ---------------------------------------------------------------------------


def test_q91_above_avg_matches_per_customer_means(spark):
    rows = {
        int(r["o_orderkey"]): r
        for r in _q(spark, "q91_above_customer_avg").collect()
    }
    o = _pdf("orders", "o_orderkey, o_custkey, o_totalprice")
    per: dict[int, list[tuple[int, float]]] = {}
    for ok, ck, p in zip(o["o_orderkey"], o["o_custkey"], o["o_totalprice"]):
        per.setdefault(int(ck), []).append((int(ok), float(p)))
    expected = {}
    for ck, items in per.items():
        avg = sum(p for _, p in items) / len(items)
        for ok, p in items:
            if p > 1.3 * avg:
                expected[ok] = (ck, p, math.floor(avg))
    assert set(rows) == set(expected)
    for ok, (ck, p, au) in expected.items():
        row = rows[ok]
        assert row["o_custkey"] == ck
        assert row["price"] == pytest.approx(round(p, 2), abs=1e-9)
        assert row["cust_avg_unit"] == au


# ---------------------------------------------------------------------------
# q92 ratio-to-report
# ---------------------------------------------------------------------------


def test_q92_shares_match_priority_census(spark):
    rows = {
        r["o_orderpriority"]: r
        for r in _q(spark, "q92_priority_revenue_share").collect()
    }
    o = _pdf("orders", "o_orderpriority, o_totalprice")
    rev: dict[str, float] = {}
    for pri, p in zip(o["o_orderpriority"], o["o_totalprice"]):
        rev[pri] = rev.get(pri, 0.0) + float(p)
    total = sum(rev.values())
    assert set(rows) == set(rev)
    for pri, v in rev.items():
        row = rows[pri]
        assert row["rev"] == pytest.approx(v, abs=1.0)
        assert row["share"] == pytest.approx(v / total, abs=1e-5)


# ---------------------------------------------------------------------------
# q110 per-group percent_rank / cume_dist
# ---------------------------------------------------------------------------


def test_q110_rank_distributions_match_sorted_groups(spark):
    rows = {
        int(r["event_id"]): r
        for r in _q(spark, "q110_rank_distributions").collect()
    }
    ev = _events()
    groups: dict[str, list[tuple[float, int]]] = {}
    for eid, et, v in zip(ev["event_id"], ev["event_type"], ev["value"]):
        groups.setdefault(et, []).append((float(v), int(eid)))
    for et, items in groups.items():
        items.sort()
        n = len(items)
        for i, (v, eid) in enumerate(items):
            row = rows[eid]
            assert row["pr"] == pytest.approx(
                i / (n - 1) if n > 1 else 0.0, abs=1.1e-6
            )
            assert row["cd"] == pytest.approx((i + 1) / n, abs=1.1e-6)


# ---------------------------------------------------------------------------
# q114 EXCEPT ALL snapshot diff
# ---------------------------------------------------------------------------


def test_q114_snapshot_diff_matches_seeded_damage(spark):
    got = sorted(
        (r["side"], int(r["o_orderkey"]), r["o_orderstatus"], int(r["cents"]))
        for r in _q(spark, "q114_snapshot_diff").collect()
    )
    o = _pdf("orders", "o_orderkey, o_orderstatus, o_totalprice")
    from collections import Counter

    a, b = Counter(), Counter()
    for ok, st, p in zip(o["o_orderkey"], o["o_orderstatus"], o["o_totalprice"]):
        ok = int(ok)
        cents = int(Decimal(str(p)).scaleb(2))
        a[(ok, st, cents)] += 1
        st_b = "X" if ok % 97 == 0 else st
        cents_b = cents + (1 if ok % 101 == 0 else 0)
        b[(ok, st_b, cents_b)] += 1
    expected = []
    for k, n in (a - b).items():
        expected.extend([("only_a", k[0], k[1], k[2])] * n)
    for k, n in (b - a).items():
        expected.extend([("only_b", k[0], k[1], k[2])] * n)
    assert got == sorted(expected)
    assert len(expected) > 0


# ---------------------------------------------------------------------------
# q129 null-safe join
# ---------------------------------------------------------------------------


def test_q129_null_safe_join_matches_key_census(spark):
    rows = {
        r["join_key"]: r
        for r in _q(spark, "q129_null_safe_join").collect()
    }
    o = _pdf("orders", "o_orderstatus")
    cnt: dict[str, int] = {}
    for st in o["o_orderstatus"]:
        k = "<null>" if st == "O" else st
        cnt[k] = cnt.get(k, 0) + 1
    assert set(rows) == set(cnt)
    for k, n in cnt.items():
        # each left row matches exactly its own key group (null-safe)
        assert rows[k]["n_rows"] == n
        assert rows[k]["n_side"] == n


# ---------------------------------------------------------------------------
# q149 discrete percentiles
# ---------------------------------------------------------------------------


def test_q149_percentile_disc_matches_order_statistics(spark):
    rows = {
        r["event_type"]: r
        for r in _q(spark, "q149_percentile_disc").collect()
    }
    ev = _events()
    groups: dict[str, list[float]] = {}
    for et, v in zip(ev["event_type"], ev["value"]):
        groups.setdefault(et, []).append(float(v))
    for et, vs in groups.items():
        s = sorted(vs)
        n = len(s)

        def disc(q):
            return s[math.ceil(q * n) - 1]

        row = rows[et]
        assert row["n"] == n
        assert row["p25"] == pytest.approx(disc(0.25), abs=1e-9)
        assert row["p50"] == pytest.approx(disc(0.50), abs=1e-9)
        assert row["p75"] == pytest.approx(disc(0.75), abs=1e-9)


# ---------------------------------------------------------------------------
# q160 RFM triple-NTILE segmentation
# ---------------------------------------------------------------------------


def _ntile(items, nb):
    """items pre-sorted; returns bucket per position (SQL NTILE)."""
    total = len(items)
    q, r = divmod(total, nb)
    out = []
    for rn1 in range(1, total + 1):
        cut = r * (q + 1)
        out.append(
            (rn1 - 1) // (q + 1) + 1 if rn1 <= cut
            else (rn1 - cut - 1) // q + r + 1
        )
    return out


def test_q160_rfm_matches_triple_ntile(spark):
    rows = {
        int(r["custkey"]): r
        for r in _q(spark, "q160_rfm_segmentation").collect()
    }
    o = _pdf("orders", "o_custkey, o_orderdate, o_totalprice")
    base: dict[int, list] = {}
    for ck, d, p in zip(o["o_custkey"], o["o_orderdate"], o["o_totalprice"]):
        d = d.date() if hasattr(d, "date") else d
        cell = base.setdefault(int(ck), [d, 0, 0.0])
        cell[0] = max(cell[0], d)
        cell[1] += 1
        cell[2] += float(p)
    recs = [
        (ck, last, freq, round(mon)) for ck, (last, freq, mon) in base.items()
    ]

    def scores(key):
        ordered = sorted(recs, key=key)
        buckets = _ntile(ordered, 5)
        return {r[0]: b for r, b in zip(ordered, buckets)}

    r_s = scores(lambda t: (_neg_date(t[1]), t[0]))
    f_s = scores(lambda t: (-t[2], t[0]))
    m_s = scores(lambda t: (-t[3], t[0]))
    assert set(rows) == set(base)
    for ck, last, freq, mon in recs:
        row = rows[ck]
        assert row["frequency"] == freq
        assert row["monetary"] == pytest.approx(mon, abs=1.0)
        assert row["r_score"] == r_s[ck]
        assert row["f_score"] == f_s[ck]
        assert row["m_score"] == m_s[ck]
        assert row["segment"] == f"{r_s[ck]}-{f_s[ck]}-{m_s[ck]}"


def _neg_date(d):
    import datetime

    return (datetime.date(3000, 1, 1) - d).days


# ---------------------------------------------------------------------------
# q180 line-level boilerplate dedup
# ---------------------------------------------------------------------------


def test_q180_line_dedup_matches_chunk_census(spark):
    rows = {
        r["doc_id"]: r for r in _q(spark, "q180_line_dedup").collect()
    }
    docs = _pdf("documents", "doc_id, text")
    doc_chunks: dict[int, list[str]] = {}
    nd: dict[str, set] = {}
    for did, text in zip(docs["doc_id"], docs["text"]):
        tk = _toks(text)
        n_chunks = (len(tk) + 2) // 3
        chunks = [
            " ".join(tk[i * 3: i * 3 + 3]) for i in range(n_chunks)
        ]
        doc_chunks[int(did)] = chunks
        for c in chunks:
            nd.setdefault(c, set()).add(int(did))
    assert set(rows) == set(doc_chunks)
    for did, chunks in doc_chunks.items():
        bp = sum(1 for c in chunks if len(nd[c]) >= 3)
        row = rows[did]
        assert row["n_chunks"] == len(chunks)
        assert row["n_boilerplate"] == bp
        assert row["kept_ratio"] == pytest.approx(
            (len(chunks) - bp) / len(chunks), abs=1e-3
        )


# ---------------------------------------------------------------------------
# q183 events/time since last purchase
# ---------------------------------------------------------------------------


def test_q183_since_purchase_matches_carry_forward(spark):
    rows = {
        int(r["event_id"]): r
        for r in _q(spark, "q183_since_last_purchase").collect()
    }
    ev = _events()
    seqs: dict[int, list[tuple[int, int, str]]] = {}
    for eid, us, uid, et in zip(
        ev["event_id"], ev["us"], ev["user_id"], ev["event_type"]
    ):
        seqs.setdefault(int(uid), []).append((int(us), int(eid), et))
    for uid, evs in seqs.items():
        evs.sort(key=lambda t: (t[0], t[1]))
        last_rn = last_ts = None
        for rn1, (us, eid, et) in enumerate(evs, start=1):
            if et == "purchase":
                last_rn, last_ts = rn1, us
            row = rows[eid]
            if last_rn is None:
                assert row["events_since_purchase"] == 0
                assert row["us_since_purchase"] is None
            else:
                assert row["events_since_purchase"] == rn1 - last_rn
                assert row["us_since_purchase"] == us - last_ts
