"""Independent brute-force references, round 10 batch AA: the final
batch-query stragglers - cube/grouping grids, JSON extraction,
seven-way join trees, DECIMAL-exact money, haversine geo joins, and
schema-drift unions.

q38 CUBE grid, q72 JSON path aggregate, q73 exact distinct, q97
nation-pair trade volume (TPC-H Q7), q103 surrogate keys, q111
FILTER aggregates, q113 quarterly rollup, q119 one-pass quality
profile, q130 late-shipment rate, q146 market share (TPC-H Q8),
q150 DECIMAL-exact revenue, q173 haversine grid join (all-pairs
reference proves grid recall = 1), q182 full-outer YoY
reconciliation, q199 union-by-name schema drift.
"""

from __future__ import annotations

import datetime
import hashlib
import json
import math
from decimal import Decimal

import duckdb
import pytest

from tests.conftest import SF_DIR

EPOCH = 1_704_067_200_000_000


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
        f"SELECT event_id, epoch_us(ts) AS us, user_id, event_type,"
        f" value, props FROM read_parquet('{SF_DIR}/events.parquet')"
    ).df()


def test_q38_cube_matches_four_grids(spark):
    rows = {}
    for r in _q(spark, "q38_event_cube").collect():
        key = (
            r["event_type"],
            None if r["week_idx"] is None else int(r["week_idx"]),
        )
        rows[key] = (int(r["cnt"]), r["total_value"])
    ev = _events()
    fine: dict[tuple, list] = {}
    for us, et, v in zip(ev["us"], ev["event_type"], ev["value"]):
        wk = (int(us) - EPOCH) // 604_800_000_000
        cell = fine.setdefault((et, wk), [0, 0.0])
        cell[0] += 1
        cell[1] += float(v)
    cube: dict[tuple, list] = {}
    for (et, wk), (n, tv) in fine.items():
        for key in ((et, wk), (et, None), (None, wk), (None, None)):
            cell = cube.setdefault(key, [0, 0.0])
            cell[0] += n
            cell[1] += tv
    assert set(rows) == set(cube)
    for key, (n, tv) in cube.items():
        assert rows[key][0] == n
        assert rows[key][1] == pytest.approx(tv, abs=1e-1)


def test_q72_q73_q111_event_aggregates_match(spark):
    ev = _events()
    # q72 JSON k per type
    k_tot: dict[str, int] = {}
    k_max: dict[str, int] = {}
    for et, props in zip(ev["event_type"], ev["props"]):
        k = json.loads(props).get("k")
        if k is None:
            continue
        k_tot[et] = k_tot.get(et, 0) + int(k)
        k_max[et] = max(k_max.get(et, -(10 ** 18)), int(k))
    rows72 = {
        r["event_type"]: r for r in _q(spark, "q72_json_extract").collect()
    }
    for et in k_tot:
        assert rows72[et]["k_total"] == k_tot[et]
        assert rows72[et]["k_max"] == k_max[et]
    # q73 exact distinct
    users: dict[str, set] = {}
    n_ev: dict[str, int] = {}
    for et, uid in zip(ev["event_type"], ev["user_id"]):
        users.setdefault(et, set()).add(int(uid))
        n_ev[et] = n_ev.get(et, 0) + 1
    rows73 = {
        r["event_type"]: r for r in _q(spark, "q73_distinct_users").collect()
    }
    for et in users:
        assert rows73[et]["n_users"] == len(users[et])
        assert rows73[et]["n_events"] == n_ev[et]
    # q111 FILTER aggregates per user
    agg: dict[int, dict] = {}
    for uid, et, v in zip(ev["user_id"], ev["event_type"], ev["value"]):
        cell = agg.setdefault(
            int(uid),
            {"np": 0, "ne": 0, "pv": 0.0, "vv": [], },
        )
        if et == "purchase":
            cell["np"] += 1
            cell["pv"] += float(v)
        elif et == "error":
            cell["ne"] += 1
        elif et == "view":
            cell["vv"].append(float(v))
    rows111 = {
        r["user_id"]: r for r in _q(spark, "q111_conditional_aggs").collect()
    }
    assert set(rows111) == set(agg)
    for uid, cell in agg.items():
        row = rows111[uid]
        assert row["n_purchase"] == cell["np"]
        assert row["n_error"] == cell["ne"]
        if cell["np"]:
            assert row["purchase_value"] == pytest.approx(
                cell["pv"], abs=1e-2
            )
        else:
            assert row["purchase_value"] is None
        if cell["vv"]:
            assert row["avg_view"] == pytest.approx(
                sum(cell["vv"]) / len(cell["vv"]), abs=1e-4
            )
        else:
            assert row["avg_view"] is None


def test_q97_nation_pair_volume_matches(spark):
    got = {
        (r["supp_nation"], r["cust_nation"], int(r["ship_year"])): r
        for r in _q(spark, "q97_nation_pair_volume").collect()
    }
    li = _pdf(
        "lineitem",
        "l_orderkey, l_suppkey, l_extendedprice, l_discount, l_shipdate",
    )
    s = _pdf("supplier", "s_suppkey, s_nationkey")
    o = _pdf("orders", "o_orderkey, o_custkey")
    c = _pdf("customer", "c_custkey, c_nationkey")
    n = _pdf("nation", "n_nationkey, n_name")
    snat = {int(k): int(v) for k, v in zip(s["s_suppkey"], s["s_nationkey"])}
    ocust = {int(k): int(v) for k, v in zip(o["o_orderkey"], o["o_custkey"])}
    cnat = {int(k): int(v) for k, v in zip(c["c_custkey"], c["c_nationkey"])}
    nname = {int(k): v for k, v in zip(n["n_nationkey"], n["n_name"])}
    agg: dict[tuple, list] = {}
    for ok, sk, ep, d, sd in zip(
        li["l_orderkey"], li["l_suppkey"], li["l_extendedprice"],
        li["l_discount"], li["l_shipdate"],
    ):
        sn = snat[int(sk)]
        cn = cnat[ocust[int(ok)]]
        if sn == cn:
            continue
        key = (nname[sn], nname[cn], sd.year)
        cell = agg.setdefault(key, [0.0, 0])
        cell[0] += float(ep) * (1 - float(d))
        cell[1] += 1
    assert set(got) == set(agg)
    for key, (vol, cnt) in agg.items():
        assert got[key]["volume"] == pytest.approx(vol, abs=1.0)
        assert got[key]["n_lineitems"] == cnt


def test_q103_surrogate_keys_match_dense_rank(spark):
    rows = {
        int(r["p_partkey"]): int(r["brand_type_sk"])
        for r in _q(spark, "q103_surrogate_keys").collect()
    }
    p = _pdf("part", "p_partkey, p_brand, p_type")
    combos = sorted({(b, tp) for b, tp in zip(p["p_brand"], p["p_type"])})
    sk = {c: i + 1 for i, c in enumerate(combos)}
    for k, b, tp in zip(p["p_partkey"], p["p_brand"], p["p_type"]):
        assert rows[int(k)] == sk[(b, tp)]


def test_q113_quarterly_revenue_matches(spark):
    rows = {}
    for r in _q(spark, "q113_quarterly_revenue").collect():
        k = r["qtr_start"]
        rows[(k.date() if hasattr(k, "date") else k, int(r["q_of_year"]))] = r
    o = _pdf("orders", "o_orderdate, o_totalprice")
    agg: dict[tuple, list] = {}
    for d, p in zip(o["o_orderdate"], o["o_totalprice"]):
        d = d.date() if hasattr(d, "date") else d
        q = (d.month - 1) // 3 + 1
        qs = datetime.date(d.year, 3 * (q - 1) + 1, 1)
        cell = agg.setdefault((qs, q), [0, 0.0])
        cell[0] += 1
        cell[1] += float(p)
    assert set(rows) == set(agg)
    for key, (n, rev) in agg.items():
        assert rows[key]["n_orders"] == n
        assert rows[key]["revenue"] == pytest.approx(rev, abs=1.0)


def test_q119_quality_profile_matches(spark):
    row = _q(spark, "q119_quality_profile").collect()[0]
    o = _pdf("orders", "o_orderkey, o_custkey, o_orderstatus,"
                       " o_totalprice, o_orderdate")
    lo = datetime.datetime(1990, 1, 1)
    hi = datetime.datetime(2030, 1, 1)
    assert row["tbl"] == "orders"
    assert row["n_rows"] == len(o)
    assert row["null_custkey"] == int(o["o_custkey"].isna().sum())
    assert row["ndv_status"] == len(set(o["o_orderstatus"]))
    assert row["nonpositive_price"] == sum(
        1 for p in o["o_totalprice"] if float(p) <= 0
    )
    assert row["out_of_range_date"] == sum(
        1 for d in o["o_orderdate"] if d < lo or d > hi
    )
    assert row["dup_keys"] == len(o) - len(set(o["o_orderkey"]))


def test_q130_late_rate_matches(spark):
    rows = {}
    for r in _q(spark, "q130_late_shipments").collect():
        k = r["order_month"]
        rows[k.date() if hasattr(k, "date") else k] = r
    li = _pdf("lineitem", "l_orderkey, l_shipdate")
    o = _pdf("orders", "o_orderkey, o_orderdate")
    odate = {int(k): d for k, d in zip(o["o_orderkey"], o["o_orderdate"])}
    agg: dict[datetime.date, list] = {}
    for ok, sd in zip(li["l_orderkey"], li["l_shipdate"]):
        od = odate.get(int(ok))
        if od is None:
            continue
        m = (od.date() if hasattr(od, "date") else od).replace(day=1)
        cell = agg.setdefault(m, [0, 0])
        cell[0] += 1
        if sd > od + datetime.timedelta(days=90):
            cell[1] += 1
    assert set(rows) == set(agg)
    for m, (n, late) in agg.items():
        row = rows[m]
        assert row["n_lineitems"] == n
        assert row["n_late"] == late
        assert row["late_rate"] == pytest.approx(late / n, abs=1e-3)


def test_q146_market_share_matches(spark):
    got = {
        int(r["yr"]): r for r in _q(spark, "q146_market_share").collect()
    }
    li = _pdf(
        "lineitem",
        "l_orderkey, l_partkey, l_suppkey, l_extendedprice, l_discount",
    )
    p = _pdf("part", "p_partkey, p_type")
    s = _pdf("supplier", "s_suppkey, s_nationkey")
    o = _pdf("orders", "o_orderkey, o_custkey, o_orderdate")
    c = _pdf("customer", "c_custkey, c_nationkey")
    n = _pdf("nation", "n_nationkey, n_name, n_regionkey")
    r = _pdf("region", "r_regionkey, r_name")
    promo = {int(k) for k, tp in zip(p["p_partkey"], p["p_type"])
             if tp == "PROMO"}
    snat = {int(k): int(v) for k, v in zip(s["s_suppkey"], s["s_nationkey"])}
    nmeta = {
        int(k): (nm, int(rk))
        for k, nm, rk in zip(n["n_nationkey"], n["n_name"], n["n_regionkey"])
    }
    asia = {
        int(k) for k, nm in zip(r["r_regionkey"], r["r_name"])
        if nm == "ASIA"
    }
    ometa = {
        int(k): (int(ck), d.year)
        for k, ck, d in zip(o["o_orderkey"], o["o_custkey"], o["o_orderdate"])
    }
    cnat = {int(k): int(v) for k, v in zip(c["c_custkey"], c["c_nationkey"])}
    agg: dict[int, list] = {}
    for ok, pk, sk, ep, dc in zip(
        li["l_orderkey"], li["l_partkey"], li["l_suppkey"],
        li["l_extendedprice"], li["l_discount"],
    ):
        if int(pk) not in promo:
            continue
        ck, yr = ometa[int(ok)]
        cn_name, cn_reg = nmeta[cnat[ck]]
        if cn_reg not in asia:
            continue
        vol = float(ep) * (1 - float(dc))
        sn_name, _ = nmeta[snat[int(sk)]]
        cell = agg.setdefault(yr, [0, 0.0, 0.0])
        cell[0] += 1
        cell[1] += vol
        if sn_name == "NATION_2":
            cell[2] += vol
    assert set(got) == set(agg)
    for yr, (cnt, tot, n2) in agg.items():
        assert got[yr]["n_items"] == cnt
        assert got[yr]["mkt_share"] == pytest.approx(n2 / tot, abs=1e-5)


def test_q150_decimal_revenue_matches_exact_strings(spark):
    rows = {
        r["l_returnflag"]: r
        for r in _q(spark, "q150_decimal_revenue").collect()
    }
    li = _pdf("lineitem", "l_returnflag, l_extendedprice, l_discount")
    agg: dict[str, list] = {}
    for rf, ep, d in zip(
        li["l_returnflag"], li["l_extendedprice"], li["l_discount"]
    ):
        cell = agg.setdefault(rf, [Decimal(0), 0])
        cell[0] += Decimal(str(ep)).quantize(Decimal("0.01")) * (
            Decimal(1) - Decimal(str(d)).quantize(Decimal("0.01"))
        )
        cell[1] += 1
    assert set(rows) == set(agg)
    for rf, (rev, n) in agg.items():
        row = rows[rf]
        assert row["n_items"] == n
        assert Decimal(row["revenue"]) == rev.quantize(Decimal("0.0001"))


def test_q173_geo_join_matches_all_pairs_haversine(spark):
    got = {
        (int(r["user_a"]), int(r["user_b"])): r["dist_km"]
        for r in _q(spark, "q173_geo_grid_join").collect()
    }
    ev = _events()
    users = sorted({int(u) for u in ev["user_id"]})
    R = 6371.0088

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    pts = {}
    for u in users:
        h = h60(str(u))
        pts[u] = (
            40.0 + (h % 1_000_000) / 100_000.0,
            -5.0 + ((h // 1_000_000) % 1_000_000) / 100_000.0,
        )
    expected = {}
    for i, a in enumerate(users):
        for b in users[i + 1:]:
            la, lo = pts[a]
            lb, lb2 = pts[b]
            d = 2 * R * math.asin(math.sqrt(
                math.sin(math.radians(lb - la) / 2) ** 2
                + math.cos(math.radians(la)) * math.cos(math.radians(lb))
                * math.sin(math.radians(lb2 - lo) / 2) ** 2
            ))
            if d <= 25.0:
                expected[(a, b)] = d
    assert set(got) == set(expected)
    for k, d in expected.items():
        assert got[k] == pytest.approx(d, abs=1e-2)


def test_q182_yoy_reconciliation_matches(spark):
    rows = {
        int(r["c_custkey"]): r
        for r in _q(spark, "q182_yoy_reconciliation").collect()
    }
    o = _pdf("orders", "o_custkey, o_orderdate, o_totalprice")
    y97: dict[int, float] = {}
    y98: dict[int, float] = {}
    for ck, d, p in zip(o["o_custkey"], o["o_orderdate"], o["o_totalprice"]):
        if datetime.datetime(1997, 1, 1) <= d < datetime.datetime(1998, 1, 1):
            y97[int(ck)] = y97.get(int(ck), 0.0) + float(p)
        elif datetime.datetime(1998, 1, 1) <= d < datetime.datetime(1999, 1, 1):
            y98[int(ck)] = y98.get(int(ck), 0.0) + float(p)
    allk = set(y97) | set(y98)
    assert set(rows) == allk
    for ck in allk:
        row = rows[ck]
        a, b = y97.get(ck), y98.get(ck)
        presence = "both" if a is not None and b is not None else (
            "only_1997" if a is not None else "only_1998"
        )
        assert row["presence"] == presence
        assert row["spend_1997"] == pytest.approx(a or 0.0, abs=1.0)
        assert row["spend_1998"] == pytest.approx(b or 0.0, abs=1.0)
        assert row["yoy_delta"] == pytest.approx(
            (b or 0.0) - (a or 0.0), abs=1.0
        )


def test_q199_union_by_name_matches(spark):
    row = _q(spark, "q199_union_by_name").collect()[0]
    o = _pdf("orders", "o_orderkey, o_totalprice, o_orderpriority,"
                       " o_orderstatus")
    n_even = sum(1 for k in o["o_orderkey"] if int(k) % 2 == 0)
    n_odd = len(o) - n_even
    total = sum(float(p) for p in o["o_totalprice"])
    assert row["n_rows"] == len(o)
    assert row["with_priority"] == n_even
    assert row["with_status"] == n_odd
    assert row["total"] == pytest.approx(total, abs=1.0)
