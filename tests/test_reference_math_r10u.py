"""Independent brute-force references, round 10 batch U: the
semantically-subtle relational operators - dominance frontiers,
exact money apportionment, bloom-accelerated semi joins, relational
division, validation routing, and hierarchy shares.

q101 Pareto frontier (literal O(n^2) dominance scan vs the window
decomposition), q102 largest-remainder cent allocation (with the
sums-to-total invariant), q107 relational division, q112 ordered
string agg, q141 bloom semi join (the bloom is perf-only; the
reference is the exact semi join), q147 quarantine routing, q162
integrity audit, q163 percent-of-parent shares. Pure-Python
recomputation from raw parquet at sf0.001, as in batches A-T.
"""

from __future__ import annotations

import json
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


# ---------------------------------------------------------------------------
# q101 Pareto frontier (O(n^2) dominance reference)
# ---------------------------------------------------------------------------


def test_q101_frontier_matches_pairwise_dominance(spark):
    rows = {
        int(r["p_partkey"]): r
        for r in _q(spark, "q101_pareto_frontier").collect()
    }
    p = _pdf("part", "p_partkey, p_brand, p_size, p_retailprice")
    by_brand: dict[str, list[tuple[int, int, int]]] = {}
    for k, b, s, pr in zip(
        p["p_partkey"], p["p_brand"], p["p_size"], p["p_retailprice"]
    ):
        cents = int(Decimal(str(pr)).scaleb(2))
        by_brand.setdefault(b, []).append((int(k), int(s), cents))
    expected = {}
    for b, items in by_brand.items():
        for k, s, c in items:
            dominated = any(
                (c2 <= c and s2 >= s and (c2 < c or s2 > s))
                for k2, s2, c2 in items
                if k2 != k
            )
            if not dominated:
                expected[k] = (b, s, c)
    assert set(rows) == set(expected)
    for k, (b, s, c) in expected.items():
        row = rows[k]
        assert (row["p_brand"], row["p_size"], row["price_cents"]) == (
            b, s, c,
        )


# ---------------------------------------------------------------------------
# q102 largest-remainder cent allocation
# ---------------------------------------------------------------------------


def test_q102_allocation_matches_largest_remainder(spark):
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic
    # lineitem, so compare sorted MULTISETS of output rows; ties
    # between duplicate rows swap identical allocations.
    got = sorted(
        (int(r["l_orderkey"]), int(r["l_linenumber"]), int(r["alloc_cents"]))
        for r in _q(spark, "q102_exact_allocation").collect()
    )
    li = _pdf("lineitem", "l_orderkey, l_linenumber, l_quantity")
    o = _pdf("orders", "o_orderkey, o_totalprice")
    total_cents = {
        int(k): int(Decimal(str(p)).scaleb(2))
        for k, p in zip(o["o_orderkey"], o["o_totalprice"])
    }
    per_order: dict[int, list[tuple[int, int]]] = {}
    for ok, ln, q in zip(
        li["l_orderkey"], li["l_linenumber"], li["l_quantity"]
    ):
        per_order.setdefault(int(ok), []).append((int(ln), int(q)))
    expected = []
    for ok, lines in per_order.items():
        if ok not in total_cents:
            continue
        tc = total_cents[ok]
        sum_q = sum(q for _, q in lines)
        rows_ = [
            (ln, (tc * q) // sum_q, (tc * q) % sum_q) for ln, q in lines
        ]
        leftover = tc - sum(b for _, b, _ in rows_)
        order = sorted(
            range(len(rows_)), key=lambda i: (-rows_[i][2], rows_[i][0])
        )
        alloc = [b for _, b, _ in rows_]
        for rk, i in enumerate(order, start=1):
            if rk <= leftover:
                alloc[i] += 1
        for (ln, _, _), a in zip(rows_, alloc):
            expected.append((ok, ln, a))
        # the apportionment invariant: allocations sum to the total
        assert sum(alloc) == tc
    assert got == sorted(expected)


# ---------------------------------------------------------------------------
# q107 relational division
# ---------------------------------------------------------------------------


def test_q107_division_matches_for_all_scan(spark):
    rows = {
        int(r["c_custkey"]): r["c_name"]
        for r in _q(spark, "q107_relational_division").collect()
    }
    o = _pdf("orders", "o_custkey, o_orderpriority")
    c = _pdf("customer", "c_custkey, c_name")
    per: dict[int, set] = {}
    all_pri = set()
    for ck, pri in zip(o["o_custkey"], o["o_orderpriority"]):
        per.setdefault(int(ck), set()).add(pri)
        all_pri.add(pri)
    names = {int(k): n for k, n in zip(c["c_custkey"], c["c_name"])}
    expected = {
        ck: names[ck]
        for ck, pris in per.items()
        if pris == all_pri and ck in names
    }
    assert rows == expected
    assert len(expected) > 0


# ---------------------------------------------------------------------------
# q112 ordered string agg
# ---------------------------------------------------------------------------


def test_q112_listagg_matches_sorted_join(spark):
    rows = {
        r["r_name"]: r
        for r in _q(spark, "q112_ordered_string_agg").collect()
    }
    n = _pdf("nation", "n_name, n_regionkey")
    r = _pdf("region", "r_regionkey, r_name")
    rname = {int(k): nm for k, nm in zip(r["r_regionkey"], r["r_name"])}
    per: dict[str, list[str]] = {}
    for nm, rk in zip(n["n_name"], n["n_regionkey"]):
        per.setdefault(rname[int(rk)], []).append(nm)
    assert set(rows) == set(per)
    for rn, nations in per.items():
        assert rows[rn]["nations"] == ",".join(sorted(nations))
        assert rows[rn]["n_nations"] == len(nations)


# ---------------------------------------------------------------------------
# q141 bloom semi join (exact semantics)
# ---------------------------------------------------------------------------


def test_q141_bloom_join_matches_exact_semi_join(spark):
    rows = {
        r["l_returnflag"]: r
        for r in _q(spark, "q141_bloom_semi_join").collect()
    }
    o = _pdf("orders", "o_orderkey, o_orderpriority")
    urgent = {
        int(k)
        for k, p in zip(o["o_orderkey"], o["o_orderpriority"])
        if p == "1-URGENT"
    }
    li = _pdf(
        "lineitem", "l_orderkey, l_returnflag, l_extendedprice, l_discount"
    )
    agg: dict[str, list[float]] = {}
    for ok, rf, ep, d in zip(
        li["l_orderkey"], li["l_returnflag"], li["l_extendedprice"],
        li["l_discount"],
    ):
        if int(ok) not in urgent:
            continue
        cell = agg.setdefault(rf, [0, 0.0])
        cell[0] += 1
        cell[1] += float(ep) * (1 - float(d))
    assert set(rows) == set(agg)
    for rf, (n, rev) in agg.items():
        row = rows[rf]
        assert row["n_items"] == n
        assert row["revenue"] == pytest.approx(rev, abs=1.0)


# ---------------------------------------------------------------------------
# q147 quarantine routing
# ---------------------------------------------------------------------------


def test_q147_quarantine_matches_rule_scan(spark):
    rows = {
        int(r["event_id"]): r
        for r in _q(spark, "q147_quarantine_split").collect()
    }
    con = duckdb.connect()
    ev = con.execute(
        f"SELECT event_id, event_type, value, props"
        f" FROM read_parquet('{SF_DIR}/events.parquet')"
    ).df()
    for eid, et, v, props in zip(
        ev["event_id"], ev["event_type"], ev["value"], ev["props"]
    ):
        bad_v = float(v) > 300
        bad_t = et == "error"
        k = json.loads(props).get("k")
        bad_p = k is not None and k > 90
        reasons = ",".join(
            tag
            for flag, tag in (
                (bad_v, "VALUE_RANGE"),
                (bad_t, "ERROR_TYPE"),
                (bad_p, "PROPS_RANGE"),
            )
            if flag
        )
        row = rows[int(eid)]
        assert row["disposition"] == (
            "ok" if not (bad_v or bad_t or bad_p) else "quarantine"
        )
        assert row["reasons"] == reasons


# ---------------------------------------------------------------------------
# q162 integrity audit
# ---------------------------------------------------------------------------


def test_q162_integrity_matches_key_census(spark):
    row = _q(spark, "q162_integrity_audit").collect()[0]
    o = _pdf("orders", "o_orderkey, o_orderstatus")
    li = _pdf("lineitem", "l_orderkey, l_linestatus")
    per: dict[int, list[int]] = {}
    for ok, ls in zip(li["l_orderkey"], li["l_linestatus"]):
        cell = per.setdefault(int(ok), [0, 0])
        cell[0] += 1
        if ls == "O":
            cell[1] += 1
    no_items = sum(1 for k in o["o_orderkey"] if int(k) not in per)
    fin_open = sum(
        1
        for k, st in zip(o["o_orderkey"], o["o_orderstatus"])
        if st == "F" and per.get(int(k), [0, 0])[1] > 0
    )
    open_no_open = sum(
        1
        for k, st in zip(o["o_orderkey"], o["o_orderstatus"])
        if st == "O"
        and int(k) in per
        and per[int(k)][1] == 0
        and per[int(k)][0] > 0
    )
    assert row["orders_without_items"] == no_items
    assert row["finished_with_open_items"] == fin_open
    assert row["open_without_open_items"] == open_no_open
    assert row["orders_checked"] == len(o)


# ---------------------------------------------------------------------------
# q163 percent-of-parent shares
# ---------------------------------------------------------------------------


def test_q163_shares_match_hierarchy_census(spark):
    rows = {
        (r["r_name"], r["n_name"]): r
        for r in _q(spark, "q163_percent_of_parent").collect()
    }
    o = _pdf("orders", "o_custkey, o_totalprice")
    c = _pdf("customer", "c_custkey, c_nationkey")
    n = _pdf("nation", "n_nationkey, n_name, n_regionkey")
    r = _pdf("region", "r_regionkey, r_name")
    nat = {
        int(k): (nm, int(rk))
        for k, nm, rk in zip(
            n["n_nationkey"], n["n_name"], n["n_regionkey"]
        )
    }
    reg = {int(k): nm for k, nm in zip(r["r_regionkey"], r["r_name"])}
    cust = {
        int(k): int(nk) for k, nk in zip(c["c_custkey"], c["c_nationkey"])
    }
    rev: dict[tuple[str, str], float] = {}
    for ck, p in zip(o["o_custkey"], o["o_totalprice"]):
        nk = cust[int(ck)]
        nm, rk = nat[nk]
        key = (reg[rk], nm)
        rev[key] = rev.get(key, 0.0) + float(p)
    total = sum(rev.values())
    reg_tot: dict[str, float] = {}
    for (rn, _), v in rev.items():
        reg_tot[rn] = reg_tot.get(rn, 0.0) + v
    assert set(rows) == set(rev)
    for key, v in rev.items():
        row = rows[key]
        assert row["revenue"] == math.floor(v) or abs(
            row["revenue"] - math.floor(v)
        ) <= 1  # float-sum order at the floor boundary
        assert row["share_of_region"] == pytest.approx(
            v / reg_tot[key[0]], abs=1e-5
        )
        assert row["region_share_of_total"] == pytest.approx(
            reg_tot[key[0]] / total, abs=1e-5
        )
