"""Independent brute-force references, round 10 batch Z: the
remaining classic TPC-H query shapes (Q3/Q4/Q6/Q9/Q10/Q14/Q17/Q18/
Q19) as literal Python scans, completing the third-check sweep of
the relational suite.

q188 shipping priority, q189 EXISTS priority check, q190 pure-scan
forecast revenue, q191 five-way profit tree, q192 returned-items
top-20, q193 promo share, q194 large-volume customers, q195
OR-of-conjunctions predicate, q196 small-quantity revenue.
"""

from __future__ import annotations

import datetime

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


def _epoch_us(dt) -> int:
    return int(
        dt.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000
    )


def test_q188_shipping_priority_matches(spark):
    got = [
        (int(r["l_orderkey"]), r["revenue"], int(r["orderdate_us"]),
         r["o_orderpriority"])
        for r in _q(spark, "q188_shipping_priority").collect()
    ]
    c = _pdf("customer", "c_custkey, c_mktsegment")
    o = _pdf("orders", "o_orderkey, o_custkey, o_orderdate, o_orderpriority")
    li = _pdf("lineitem", "l_orderkey, l_extendedprice, l_discount, l_shipdate")
    building = {
        int(k) for k, s in zip(c["c_custkey"], c["c_mktsegment"])
        if s == "BUILDING"
    }
    cut = datetime.datetime(1998, 3, 15)
    ordmeta = {
        int(k): (d, p)
        for k, ck, d, p in zip(
            o["o_orderkey"], o["o_custkey"], o["o_orderdate"],
            o["o_orderpriority"],
        )
        if int(ck) in building and d < cut
    }
    rev: dict[int, float] = {}
    for ok, ep, dc, sd in zip(
        li["l_orderkey"], li["l_extendedprice"], li["l_discount"],
        li["l_shipdate"],
    ):
        if int(ok) in ordmeta and sd > cut:
            rev[int(ok)] = rev.get(int(ok), 0.0) + float(ep) * (1 - float(dc))
    ranked = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [g[0] for g in got] == [k for k, _ in ranked]
    for (ok, r_rev, od_us, pri), (k, v) in zip(got, ranked):
        assert r_rev == pytest.approx(v, abs=1.0)
        d, p = ordmeta[k]
        assert od_us == _epoch_us(d)
        assert pri == p


def test_q189_exists_priority_check_matches(spark):
    got = {
        r["o_orderpriority"]: int(r["order_count"])
        for r in _q(spark, "q189_priority_check").collect()
    }
    o = _pdf("orders", "o_orderkey, o_orderdate, o_orderpriority")
    li = _pdf("lineitem", "l_orderkey, l_shipdate")
    lo = datetime.datetime(1997, 1, 1)
    hi = datetime.datetime(1997, 4, 1)
    window = {
        int(k): (d, p)
        for k, d, p in zip(
            o["o_orderkey"], o["o_orderdate"], o["o_orderpriority"]
        )
        if lo <= d < hi
    }
    late = set()
    for ok, sd in zip(li["l_orderkey"], li["l_shipdate"]):
        ok = int(ok)
        if ok in window and sd > window[ok][0] + datetime.timedelta(days=60):
            late.add(ok)
    cnt: dict[str, int] = {}
    for ok in late:
        p = window[ok][1]
        cnt[p] = cnt.get(p, 0) + 1
    assert got == cnt


def test_q190_scan_aggregate_matches(spark):
    row = _q(spark, "q190_forecast_revenue").collect()[0]
    li = _pdf(
        "lineitem", "l_extendedprice, l_discount, l_quantity, l_shipdate"
    )
    lo = datetime.datetime(1997, 1, 1)
    hi = datetime.datetime(1998, 1, 1)
    rev = 0.0
    n = 0
    for ep, d, q, sd in zip(
        li["l_extendedprice"], li["l_discount"], li["l_quantity"],
        li["l_shipdate"],
    ):
        if lo <= sd < hi and 0.05 <= float(d) <= 0.07 and float(q) < 24:
            rev += float(ep) * float(d)
            n += 1
    assert row["n_lines"] == n
    assert row["revenue"] == pytest.approx(rev, abs=1.0)


def test_q191_profit_tree_matches(spark):
    got = {
        (r["nation"], int(r["o_year"])): r["profit"]
        for r in _q(spark, "q191_product_profit").collect()
    }
    li = _pdf(
        "lineitem",
        "l_orderkey, l_partkey, l_suppkey, l_extendedprice, l_discount,"
        " l_quantity",
    )
    p = _pdf("part", "p_partkey, p_name, p_retailprice")
    s = _pdf("supplier", "s_suppkey, s_nationkey")
    o = _pdf("orders", "o_orderkey, o_orderdate")
    n = _pdf("nation", "n_nationkey, n_name")
    ring = {
        int(k): float(rp)
        for k, nm, rp in zip(p["p_partkey"], p["p_name"], p["p_retailprice"])
        if "ring" in str(nm)
    }
    snat = {int(k): int(nk) for k, nk in zip(s["s_suppkey"], s["s_nationkey"])}
    oyear = {int(k): d.year for k, d in zip(o["o_orderkey"], o["o_orderdate"])}
    nname = {int(k): nm for k, nm in zip(n["n_nationkey"], n["n_name"])}
    agg: dict[tuple, float] = {}
    for ok, pk, sk, ep, dc, q in zip(
        li["l_orderkey"], li["l_partkey"], li["l_suppkey"],
        li["l_extendedprice"], li["l_discount"], li["l_quantity"],
    ):
        pk = int(pk)
        if pk not in ring:
            continue
        key = (nname[snat[int(sk)]], oyear[int(ok)])
        profit = float(ep) * (1 - float(dc)) - 0.5 * ring[pk] * float(q)
        agg[key] = agg.get(key, 0.0) + profit
    assert set(got) == set(agg)
    for key, v in agg.items():
        assert got[key] == pytest.approx(v, abs=1.0)


def test_q192_returned_items_matches(spark):
    got = [
        (int(r["c_custkey"]), r["c_name"], r["n_name"], r["revenue"])
        for r in _q(spark, "q192_returned_items").collect()
    ]
    c = _pdf("customer", "c_custkey, c_name, c_nationkey")
    o = _pdf("orders", "o_orderkey, o_custkey, o_orderdate")
    li = _pdf(
        "lineitem", "l_orderkey, l_extendedprice, l_discount, l_returnflag"
    )
    n = _pdf("nation", "n_nationkey, n_name")
    lo = datetime.datetime(1997, 7, 1)
    hi = datetime.datetime(1997, 10, 1)
    ordcust = {
        int(k): int(ck)
        for k, ck, d in zip(o["o_orderkey"], o["o_custkey"], o["o_orderdate"])
        if lo <= d < hi
    }
    rev: dict[int, float] = {}
    for ok, ep, dc, rf in zip(
        li["l_orderkey"], li["l_extendedprice"], li["l_discount"],
        li["l_returnflag"],
    ):
        ck = ordcust.get(int(ok))
        if ck is not None and rf == "R":
            rev[ck] = rev.get(ck, 0.0) + float(ep) * (1 - float(dc))
    meta = {
        int(k): (nm, int(nk))
        for k, nm, nk in zip(c["c_custkey"], c["c_name"], c["c_nationkey"])
    }
    nname = {int(k): nm for k, nm in zip(n["n_nationkey"], n["n_name"])}
    ranked = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [g[0] for g in got] == [k for k, _ in ranked]
    for (ck, nm, natn, r_rev), (k, v) in zip(got, ranked):
        assert nm == meta[k][0]
        assert natn == nname[meta[k][1]]
        assert r_rev == pytest.approx(v, abs=1.0)


def test_q193_promo_share_matches(spark):
    row = _q(spark, "q193_promo_share").collect()[0]
    li = _pdf("lineitem", "l_partkey, l_extendedprice, l_discount, l_shipdate")
    p = _pdf("part", "p_partkey, p_type")
    promo = {
        int(k) for k, tp in zip(p["p_partkey"], p["p_type"])
        if tp == "PROMO"
    }
    lo = datetime.datetime(1997, 9, 1)
    hi = datetime.datetime(1997, 10, 1)
    num = den = 0.0
    n = 0
    for pk, ep, dc, sd in zip(
        li["l_partkey"], li["l_extendedprice"], li["l_discount"],
        li["l_shipdate"],
    ):
        if lo <= sd < hi:
            v = float(ep) * (1 - float(dc))
            den += v
            if int(pk) in promo:
                num += v
            n += 1
    assert row["n_lines"] == n
    assert row["promo_revenue_pct"] == pytest.approx(
        100.0 * num / den, abs=1e-3
    )


def test_q194_large_volume_customers_match(spark):
    got = {
        int(r["o_orderkey"]): r
        for r in _q(spark, "q194_large_volume_customers").collect()
    }
    li = _pdf("lineitem", "l_orderkey, l_quantity")
    o = _pdf("orders", "o_orderkey, o_custkey, o_orderdate, o_totalprice")
    c = _pdf("customer", "c_custkey, c_name")
    qty: dict[int, float] = {}
    for ok, q in zip(li["l_orderkey"], li["l_quantity"]):
        qty[int(ok)] = qty.get(int(ok), 0.0) + float(q)
    names = {int(k): nm for k, nm in zip(c["c_custkey"], c["c_name"])}
    expected = {}
    for ok, ck, d, p in zip(
        o["o_orderkey"], o["o_custkey"], o["o_orderdate"], o["o_totalprice"]
    ):
        ok = int(ok)
        if qty.get(ok, 0.0) > 230:
            expected[ok] = (int(ck), names[int(ck)], _epoch_us(d),
                            float(p), qty[ok])
    assert set(got) == set(expected)
    for ok, (ck, nm, dus, p, q) in expected.items():
        row = got[ok]
        assert row["c_custkey"] == ck
        assert row["c_name"] == nm
        assert row["orderdate_us"] == dus
        assert row["o_totalprice"] == pytest.approx(round(p, 2), abs=1e-9)
        assert row["total_qty"] == pytest.approx(q, abs=0.2)


def test_q195_or_dnf_predicate_matches(spark):
    row = _q(spark, "q195_disjunctive_predicate").collect()[0]
    li = _pdf("lineitem", "l_partkey, l_extendedprice, l_discount, l_quantity")
    p = _pdf("part", "p_partkey, p_brand, p_size")
    meta = {
        int(k): (b, int(sz))
        for k, b, sz in zip(p["p_partkey"], p["p_brand"], p["p_size"])
    }
    rev = 0.0
    n = 0
    for pk, ep, dc, q in zip(
        li["l_partkey"], li["l_extendedprice"], li["l_discount"],
        li["l_quantity"],
    ):
        b, sz = meta[int(pk)]
        q = float(q)
        hit = (
            (b == "Brand#12" and 1 <= sz <= 15 and 1 <= q <= 11)
            or (b == "Brand#23" and 1 <= sz <= 25 and 10 <= q <= 20)
            or (b == "Brand#34" and 1 <= sz <= 35 and 20 <= q <= 30)
        )
        if hit:
            rev += float(ep) * (1 - float(dc))
            n += 1
    assert row["n_lines"] == n
    assert row["revenue"] == pytest.approx(rev, abs=1.0)


def test_q196_small_quantity_revenue_matches(spark):
    row = _q(spark, "q196_small_quantity_revenue").collect()[0]
    li = _pdf("lineitem", "l_partkey, l_extendedprice, l_quantity")
    sums: dict[int, list[float]] = {}
    for pk, q in zip(li["l_partkey"], li["l_quantity"]):
        cell = sums.setdefault(int(pk), [0.0, 0])
        cell[0] += float(q)
        cell[1] += 1
    half_avg = {k: 0.5 * s / n for k, (s, n) in sums.items()}
    rev = 0.0
    n = 0
    for pk, ep, q in zip(
        li["l_partkey"], li["l_extendedprice"], li["l_quantity"]
    ):
        if float(q) < half_avg[int(pk)]:
            rev += float(ep)
            n += 1
    assert row["n_lines"] == n
    assert row["avg_yearly"] == pytest.approx(rev / 7.0, abs=1.0)
