"""Independent brute-force references, round 10 batch W: the TPC-H
base family (q14-q27, q29) re-summed row by row in pure Python -
DuckDB is already an independent engine for these SQL shapes, so
this batch is the third, formula-free check of the suite's
relational foundation.

q14 pricing summary, q15-q17 dimension-join rollups, q18 semi join,
q19 anti join, q20 latest-per-key, q21 running sum, q22-q24 set ops,
q25 distinct pairs, q26 ROLLUP, q27 conditional pivot, q29 daily
tumbling counts.
"""

from __future__ import annotations

import datetime

import duckdb
import pytest

from tests.conftest import SF_DIR

US_PER_DAY = 86_400_000_000
EPOCH = 1_704_067_200_000_000


def _pdf(table: str, cols: str = "*"):
    con = duckdb.connect()
    return con.execute(
        f"SELECT {cols} FROM read_parquet('{SF_DIR}/{table}.parquet')"
    ).df()


def _q(spark, name):
    from __spark_entry__ import queries

    return queries()[name](spark, SF_DIR)


def test_q14_pricing_summary_matches_row_sums(spark):
    rows = {
        (r["l_returnflag"], r["l_linestatus"]): r
        for r in _q(spark, "q14_pricing_summary").collect()
    }
    li = _pdf(
        "lineitem",
        "l_returnflag, l_linestatus, l_quantity, l_extendedprice,"
        " l_discount, l_tax, l_shipdate",
    )
    cut = datetime.datetime(2000, 12, 1)
    agg: dict[tuple, list[float]] = {}
    for rf, ls, q, ep, d, tax, sd in zip(
        li["l_returnflag"], li["l_linestatus"], li["l_quantity"],
        li["l_extendedprice"], li["l_discount"], li["l_tax"],
        li["l_shipdate"],
    ):
        if sd > cut:
            continue
        c = agg.setdefault((rf, ls), [0.0] * 7 + [0])
        dp = float(ep) * (1 - float(d))
        c[0] += float(q)
        c[1] += float(ep)
        c[2] += dp
        c[3] += dp * (1 + float(tax))
        c[4] += float(q)
        c[5] += float(ep)
        c[6] += float(d)
        c[7] += 1
    assert set(rows) == set(agg)
    for key, c in agg.items():
        row = rows[key]
        n = c[7]
        assert row["sum_qty"] == pytest.approx(c[0], abs=0.2)
        assert row["sum_base_price"] == pytest.approx(c[1], abs=1.0)
        assert row["sum_disc_price"] == pytest.approx(c[2], abs=1.0)
        assert row["sum_charge"] == pytest.approx(c[3], abs=1.0)
        assert row["avg_qty"] == pytest.approx(c[4] / n, abs=1e-3)
        assert row["avg_price"] == pytest.approx(c[5] / n, abs=1e-1)
        assert row["avg_disc"] == pytest.approx(c[6] / n, abs=1e-3)
        assert row["count_order"] == n


def test_q15_q16_q17_dimension_rollups_match(spark):
    c = _pdf("customer", "c_custkey, c_nationkey, c_acctbal, c_mktsegment")
    n = _pdf("nation", "n_nationkey, n_name, n_regionkey")
    r = _pdf("region", "r_regionkey, r_name")
    nat = {
        int(k): (nm, int(rk))
        for k, nm, rk in zip(n["n_nationkey"], n["n_name"], n["n_regionkey"])
    }
    reg = {int(k): nm for k, nm in zip(r["r_regionkey"], r["r_name"])}

    # q15: customers per region
    agg15: dict[str, list[float]] = {}
    for nk, bal in zip(c["c_nationkey"], c["c_acctbal"]):
        rn = reg[nat[int(nk)][1]]
        cell = agg15.setdefault(rn, [0, 0.0])
        cell[0] += 1
        cell[1] += float(bal)
    rows15 = {
        x["r_name"]: x for x in _q(spark, "q15_customers_by_region").collect()
    }
    assert set(rows15) == set(agg15)
    for rn, (cnt, bal) in agg15.items():
        assert rows15[rn]["n_customers"] == cnt
        assert rows15[rn]["avg_acctbal"] == pytest.approx(
            bal / cnt, abs=1e-1
        )

    # q16: revenue per market segment
    o = _pdf("orders", "o_orderkey, o_custkey, o_totalprice, o_orderdate")
    seg = {
        int(k): s for k, s in zip(c["c_custkey"], c["c_mktsegment"])
    }
    agg16: dict[str, list[float]] = {}
    for ck, p in zip(o["o_custkey"], o["o_totalprice"]):
        cell = agg16.setdefault(seg[int(ck)], [0, 0.0])
        cell[0] += 1
        cell[1] += float(p)
    rows16 = {
        x["c_mktsegment"]: x
        for x in _q(spark, "q16_segment_revenue").collect()
    }
    assert set(rows16) == set(agg16)
    for s, (cnt, rev) in agg16.items():
        assert rows16[s]["n_orders"] == cnt
        assert rows16[s]["revenue"] == pytest.approx(rev, abs=1.0)

    # q17: ASIA nation revenue from 1996 on
    li = _pdf("lineitem", "l_orderkey, l_extendedprice, l_discount")
    cust_nat = {int(k): int(nk) for k, nk in zip(c["c_custkey"], c["c_nationkey"])}
    cut = datetime.datetime(1996, 1, 1)
    order_ok = {
        int(k): int(ck)
        for k, ck, d in zip(o["o_orderkey"], o["o_custkey"], o["o_orderdate"])
        if d >= cut
    }
    agg17: dict[str, list[float]] = {}
    for ok, ep, d in zip(li["l_orderkey"], li["l_extendedprice"], li["l_discount"]):
        ck = order_ok.get(int(ok))
        if ck is None:
            continue
        nm, rk = nat[cust_nat[ck]]
        if reg[rk] != "ASIA":
            continue
        cell = agg17.setdefault(nm, [0.0, 0])
        cell[0] += float(ep) * (1 - float(d))
        cell[1] += 1
    rows17 = {
        x["n_name"]: x for x in _q(spark, "q17_nation_revenue").collect()
    }
    assert set(rows17) == set(agg17)
    for nm, (rev, cnt) in agg17.items():
        assert rows17[nm]["revenue"] == pytest.approx(rev, abs=1.0)
        assert rows17[nm]["n_lineitems"] == cnt


def test_q18_q19_semi_anti_joins_match(spark):
    c = _pdf("customer", "c_custkey, c_name, c_mktsegment")
    o = _pdf("orders", "o_custkey, o_totalprice")
    big = {
        int(k) for k, p in zip(o["o_custkey"], o["o_totalprice"])
        if float(p) > 400000
    }
    any_order = {int(k) for k in o["o_custkey"]}
    rows18 = {
        int(r["c_custkey"]): r["c_name"]
        for r in _q(spark, "q18_big_spenders").collect()
    }
    assert rows18 == {
        int(k): nm
        for k, nm in zip(c["c_custkey"], c["c_name"])
        if int(k) in big
    }
    rows19 = {
        int(r["c_custkey"]): r["c_mktsegment"]
        for r in _q(spark, "q19_customers_without_orders").collect()
    }
    assert rows19 == {
        int(k): s
        for k, s in zip(c["c_custkey"], c["c_mktsegment"])
        if int(k) not in any_order
    }


def test_q20_latest_order_matches_witness(spark):
    rows = {
        r["o_custkey"]: r
        for r in _q(spark, "q20_latest_order_per_customer").collect()
    }
    o = _pdf("orders", "o_orderkey, o_custkey, o_orderdate, o_totalprice")
    best: dict[int, tuple] = {}
    for ok, ck, d, p in zip(
        o["o_orderkey"], o["o_custkey"], o["o_orderdate"], o["o_totalprice"]
    ):
        key = (d, int(ok))
        cur = best.get(int(ck))
        if cur is None or key > cur[0]:
            best[int(ck)] = (key, int(ok), d, float(p))
    assert set(rows) == set(best)
    for ck, (_, ok, d, p) in best.items():
        row = rows[ck]
        assert row["o_orderkey"] == ok
        got = row["last_order_date"]
        got = got.date() if hasattr(got, "date") else got
        assert got == (d.date() if hasattr(d, "date") else d)
        assert row["o_totalprice"] == pytest.approx(p, abs=1e-6)


def test_q21_running_sum_matches_sequence_walk(spark):
    rows = {
        int(r["event_id"]): r["running_value"]
        for r in _q(spark, "q21_running_user_value").collect()
    }
    con = duckdb.connect()
    ev = con.execute(
        f"SELECT event_id, epoch_us(ts) AS us, user_id, value"
        f" FROM read_parquet('{SF_DIR}/events.parquet')"
    ).df()
    seqs: dict[int, list] = {}
    for eid, us, uid, v in zip(
        ev["event_id"], ev["us"], ev["user_id"], ev["value"]
    ):
        seqs.setdefault(int(uid), []).append((int(us), int(eid), float(v)))
    for uid, evs in seqs.items():
        evs.sort()
        run = 0.0
        for _, eid, v in evs:
            run += v
            assert rows[eid] == pytest.approx(run, abs=1e-3)


def test_q22_q23_q24_set_ops_match(spark):
    c = _pdf("customer", "c_custkey, c_mktsegment")
    o = _pdf("orders", "o_custkey, o_totalprice")
    building = {
        int(k) for k, s in zip(c["c_custkey"], c["c_mktsegment"])
        if s == "BUILDING"
    }
    over400 = {
        int(k) for k, p in zip(o["o_custkey"], o["o_totalprice"])
        if float(p) > 400000
    }
    over300 = {
        int(k) for k, p in zip(o["o_custkey"], o["o_totalprice"])
        if float(p) > 300000
    }
    got22 = {int(r["custkey"]) for r in _q(spark, "q22_set_union").collect()}
    assert got22 == building | over400
    got23 = {
        int(r["custkey"]) for r in _q(spark, "q23_set_intersect").collect()
    }
    assert got23 == building & over300
    got24 = {
        int(r["custkey"]) for r in _q(spark, "q24_set_except").collect()
    }
    assert got24 == building - over300


def test_q25_q26_q27_q29_shapes_match(spark):
    # q25 distinct pairs
    con = duckdb.connect()
    ev = con.execute(
        f"SELECT event_id, epoch_us(ts) AS us, user_id, event_type, value"
        f" FROM read_parquet('{SF_DIR}/events.parquet')"
    ).df()
    got25 = {
        (int(r["user_id"]), r["event_type"])
        for r in _q(spark, "q25_distinct_pairs").collect()
    }
    assert got25 == {
        (int(u), et) for u, et in zip(ev["user_id"], ev["event_type"])
    }

    # q26 ROLLUP over region/nation
    c = _pdf("customer", "c_custkey, c_nationkey")
    n = _pdf("nation", "n_nationkey, n_name, n_regionkey")
    r = _pdf("region", "r_regionkey, r_name")
    nat = {
        int(k): (nm, int(rk))
        for k, nm, rk in zip(n["n_nationkey"], n["n_name"], n["n_regionkey"])
    }
    reg = {int(k): nm for k, nm in zip(r["r_regionkey"], r["r_name"])}
    fine: dict[tuple, int] = {}
    for nk in c["c_nationkey"]:
        nm, rk = nat[int(nk)]
        fine[(reg[rk], nm)] = fine.get((reg[rk], nm), 0) + 1
    rollup: dict[tuple, int] = dict(fine)
    for (rn, _), cnt in fine.items():
        rollup[(rn, None)] = rollup.get((rn, None), 0) + cnt
    rollup[(None, None)] = sum(fine.values())
    got26 = {
        (x["r_name"], x["n_name"]): int(x["n_customers"])
        for x in _q(spark, "q26_region_nation_rollup").collect()
    }
    assert got26 == rollup

    # q27 conditional pivot
    agg27: dict[int, list] = {}
    for u, et, v in zip(ev["user_id"], ev["event_type"], ev["value"]):
        cell = agg27.setdefault(int(u), {"purchase_value": 0.0})
        cell[et] = cell.get(et, 0) + 1
        if et == "purchase":
            cell["purchase_value"] += float(v)
    rows27 = {
        int(x["user_id"]): x
        for x in _q(spark, "q27_user_event_pivot").collect()
    }
    assert set(rows27) == set(agg27)
    for u, cell in agg27.items():
        row = rows27[u]
        for et in ("click", "view", "purchase", "signup", "error"):
            assert row[f"{et}_cnt"] == cell.get(et, 0)
        assert row["purchase_value"] == pytest.approx(
            cell["purchase_value"], abs=1e-2
        )

    # q29 daily tumbling counts
    agg29: dict[tuple, list] = {}
    for us, et, v in zip(ev["us"], ev["event_type"], ev["value"]):
        d = (int(us) - EPOCH) // US_PER_DAY
        cell = agg29.setdefault((d, et), [0, 0.0])
        cell[0] += 1
        cell[1] += float(v)
    rows29 = {
        (int(x["day_idx"]), x["event_type"]): x
        for x in _q(spark, "q29_daily_type_counts").collect()
    }
    assert set(rows29) == set(agg29)
    for key, (cnt, tv) in agg29.items():
        assert rows29[key]["cnt"] == cnt
        assert rows29[key]["total_value"] == pytest.approx(tv, abs=1e-2)
