"""Independent brute-force references, round 10 batch AB: the last
checkable stragglers - salting equivalences, session windows, UDTF
expansion, entity-resolution pruning, CEP composition, governance
cascades, and storage-layout arithmetic.

q65 GROUPING SETS, q67 salted aggregation (== plain GROUP BY), q68
salted join (== plain equi-join), q70 session windows, q126 chunk
UDTF, q131 sorted-neighborhood pairs, q142 prefix-filter similarity
join (all-pairs threshold reference), q234 erasure cascade, q235
late-data restatement, q238 three-stage CEP, q248 VARIANT
extraction, q251 collation distincts, q316 LATERAL top-k, q351
zone-map pruning arithmetic.
"""

from __future__ import annotations

import datetime
import json
import re

import duckdb
import pytest

from tests.conftest import SF_DIR

US_PER_DAY = 86_400_000_000


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


def _toks(text):
    return re.split(r"\s+", str(text).strip().lower())


def _lev(a: str, b: str) -> int:
    if a == b:
        return 0
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, start=1):
        cur = [i]
        for j, cb in enumerate(b, start=1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (0 if ca == cb else 1)))
        prev = cur
    return prev[-1]


def test_q65_grouping_sets_match(spark):
    rows = {}
    for r in _q(spark, "q65_grouping_sets").collect():
        rows[(r["r_name"], r["n_name"])] = (
            int(r["cnt"]), r["total_acctbal"],
        )
    c = _pdf("customer", "c_nationkey, c_acctbal")
    n = _pdf("nation", "n_nationkey, n_name, n_regionkey")
    reg = _pdf("region", "r_regionkey, r_name")
    nmeta = {
        int(k): (nm, int(rk))
        for k, nm, rk in zip(n["n_nationkey"], n["n_name"], n["n_regionkey"])
    }
    rname = {int(k): nm for k, nm in zip(reg["r_regionkey"], reg["r_name"])}
    fine: dict[tuple, list] = {}
    for nk, bal in zip(c["c_nationkey"], c["c_acctbal"]):
        nm, rk = nmeta[int(nk)]
        cell = fine.setdefault((rname[rk], nm), [0, 0.0])
        cell[0] += 1
        cell[1] += float(bal)
    grids: dict[tuple, list] = {}
    for (rn, nm), (cnt, bal) in fine.items():
        for key in ((rn, nm), (rn, None), (None, None)):
            cell = grids.setdefault(key, [0, 0.0])
            cell[0] += cnt
            cell[1] += bal
    assert set(rows) == set(grids)
    for key, (cnt, bal) in grids.items():
        assert rows[key][0] == cnt
        assert rows[key][1] == pytest.approx(bal, abs=1e-1)


def test_q67_q68_salting_equals_plain_forms(spark):
    ev = _events()
    rows67 = {
        r["user_id"]: r for r in _q(spark, "q67_salted_agg").collect()
    }
    agg: dict[int, list] = {}
    for uid, v in zip(ev["user_id"], ev["value"]):
        cell = agg.setdefault(int(uid), [0, 0.0, -1e18])
        cell[0] += 1
        cell[1] += float(v)
        cell[2] = max(cell[2], float(v))
    assert set(rows67) == set(agg)
    for uid, (n, tv, mx) in agg.items():
        row = rows67[uid]
        assert row["cnt"] == n
        assert row["total_value"] == pytest.approx(tv, abs=1e-2)
        assert row["max_value"] == pytest.approx(mx, abs=1e-9)
    c = _pdf("customer", "c_custkey, c_mktsegment")
    seg = {int(k): s for k, s in zip(c["c_custkey"], c["c_mktsegment"])}
    agg68: dict[str, list] = {}
    for uid, v in zip(ev["user_id"], ev["value"]):
        s = seg.get(int(uid))
        if s is None:
            continue
        cell = agg68.setdefault(s, [0, 0.0])
        cell[0] += 1
        cell[1] += float(v)
    rows68 = {
        r["c_mktsegment"]: r for r in _q(spark, "q68_salted_join").collect()
    }
    assert set(rows68) == set(agg68)
    for s, (n, tv) in agg68.items():
        assert rows68[s]["n_events"] == n
        assert rows68[s]["total_value"] == pytest.approx(tv, abs=1e-2)


def test_q70_session_window_matches_gap_walk(spark):
    got = sorted(
        (r["user_id"], int(r["session_start_us"]),
         int(r["session_end_us"]), int(r["n_events"]))
        for r in _q(spark, "q70_session_window").collect()
    )
    ev = _events()
    seqs: dict[int, list[int]] = {}
    for uid, us in zip(ev["user_id"], ev["us"]):
        seqs.setdefault(int(uid), []).append(int(us))
    ref = []
    GAP = 1_800_000_000
    for uid, uss in seqs.items():
        uss.sort()
        start = prev = uss[0]
        n = 1
        for us in uss[1:]:
            if us - prev > GAP:
                ref.append((uid, start, prev + GAP, n))
                start, n = us, 0
            n += 1
            prev = us
        ref.append((uid, start, prev + GAP, n))
    assert got == sorted(ref)


def test_q126_chunk_udtf_matches_arithmetic(spark):
    got = sorted(
        (int(r["doc_id"]), int(r["chunk_idx"]), int(r["n_words"]))
        for r in _q(spark, "q126_chunk_udtf").collect()
    )
    docs = _pdf("documents", "doc_id, text")
    ref = []
    for did, text in zip(docs["doc_id"], docs["text"]):
        n = len(_toks(text))
        for i in range((n + 9) // 10):
            ref.append((int(did), i, min(10, n - i * 10)))
    assert got == sorted(ref)


def test_q131_snm_matches_window_scan(spark):
    got = {
        (int(r["part_a"]), int(r["part_b"])): int(r["edit_dist"])
        for r in _q(spark, "q131_sorted_neighborhood").collect()
    }
    p = _pdf("part", "p_partkey, p_name")
    ranked = sorted(
        (str(nm), int(k)) for k, nm in zip(p["p_partkey"], p["p_name"])
    )
    ref = {}
    for i, (na, ka) in enumerate(ranked):
        for j in (i + 1, i + 2):
            if j >= len(ranked):
                continue
            nb, kb = ranked[j]
            if na == nb:
                continue
            d = _lev(na, nb)
            if d <= 4:
                ref[(ka, kb)] = d
    assert got == ref


def test_q142_prefix_filter_matches_all_pairs_threshold(spark):
    got = {
        (int(r["doc_a"]), int(r["doc_b"])): r["jaccard"]
        for r in _q(spark, "q142_prefix_filter_join").collect()
    }
    docs = _pdf("documents", "doc_id, text")
    ssets = {}
    for did, text in zip(docs["doc_id"], docs["text"]):
        if int(did) >= 2000:
            continue
        tk = _toks(text)
        if len(tk) < 3:
            continue
        grams = frozenset(
            " ".join(tk[i: i + 3]) for i in range(len(tk) - 2)
        )
        if grams:
            ssets[int(did)] = grams
    ids = sorted(ssets)
    ref = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            j = len(ssets[a] & ssets[b]) / len(ssets[a] | ssets[b])
            if j >= 3 / 5:
                ref[(a, b)] = round(j, 4)
    assert set(got) == set(ref)
    for k, v in ref.items():
        assert got[k] == pytest.approx(v, abs=1e-9)
    assert len(ref) > 0


def test_q234_erasure_cascade_matches_fk_walk(spark):
    rows = {
        r["table_name"]: int(r["n_rows"])
        for r in _q(spark, "q234_erasure_cascade_audit").collect()
    }
    c = _pdf("customer", "c_custkey")
    o = _pdf("orders", "o_orderkey, o_custkey")
    li = _pdf("lineitem", "l_orderkey")
    del_cust = {int(k) for k in c["c_custkey"] if int(k) % 97 == 0}
    del_orders = {
        int(k) for k, ck in zip(o["o_orderkey"], o["o_custkey"])
        if int(ck) in del_cust
    }
    del_lines = sum(1 for k in li["l_orderkey"] if int(k) in del_orders)
    assert rows == {
        "customer": len(del_cust),
        "orders": len(del_orders),
        "lineitem": del_lines,
    }


def test_q235_restatement_matches_late_fold(spark):
    rows = {
        (int(r["day_us"]), r["event_type"]): r
        for r in _q(spark, "q235_late_data_restatement").collect()
    }
    ev = _events()
    ontime: dict[tuple, int] = {}
    late: dict[tuple, int] = {}
    for eid, us, et in zip(ev["event_id"], ev["us"], ev["event_type"]):
        key = ((int(us) // US_PER_DAY) * US_PER_DAY, et)
        side = late if int(eid) % 50 == 0 else ontime
        side[key] = side.get(key, 0) + 1
    assert set(rows) == set(late)
    for key, ln in late.items():
        row = rows[key]
        old = ontime.get(key, 0)
        assert row["old_n"] == old
        assert row["late_n"] == ln
        assert row["new_n"] == old + ln


def test_q238_three_stage_cep_matches_pattern_scan(spark):
    rows = {
        int(r["view_id"]): r
        for r in _q(spark, "q238_pattern_three_stage").collect()
    }
    ev = _events()
    seqs: dict[int, list] = {}
    for eid, us, uid, et in zip(
        ev["event_id"], ev["us"], ev["user_id"], ev["event_type"]
    ):
        seqs.setdefault(int(uid), []).append((int(us), int(eid), et))
    H_CP = 600_000_000
    H_VC = 86_400_000_000
    expected = {}
    for uid, evs in seqs.items():
        evs.sort()
        clicks = [(u, e) for u, e, t_ in evs if t_ == "click"]
        purchases = [(u, e) for u, e, t_ in evs if t_ == "purchase"]
        errors = [(u, e) for u, e, t_ in evs if t_ == "error"]
        mclick = {}
        for cu, ce in clicks:
            cand = [
                (pu, pe) for pu, pe in purchases
                if (pu, pe) > (cu, ce) and pu <= cu + H_CP
            ]
            if not cand:
                continue
            pu, pe = min(cand)
            veto = any(
                (eu, ee) > (cu, ce) and eu < pu for eu, ee in errors
            )
            if not veto:
                mclick[(cu, ce)] = (pe, pu)
        for vu, ve, vt in evs:
            if vt != "view":
                continue
            cand = [
                (cu, ce) for cu, ce in mclick
                if (cu, ce) > (vu, ve) and cu <= vu + H_VC
            ]
            if not cand:
                continue
            cu, ce = min(cand)
            pe, pu = mclick[(cu, ce)]
            expected[ve] = (uid, ce, pe, pu - vu)
    assert set(rows) == set(expected)
    for ve, (uid, ce, pe, lat) in expected.items():
        row = rows[ve]
        assert row["user_id"] == uid
        assert row["click_id"] == ce
        assert row["purchase_id"] == pe
        assert row["total_latency_us"] == lat


def test_q248_variant_matches_json_census(spark):
    rows = {
        r["event_type"]: r
        for r in _q(spark, "q248_variant_extraction").collect()
    }
    ev = _events()
    agg: dict[str, list] = {}
    for et, props in zip(ev["event_type"], ev["props"]):
        k = json.loads(props).get("k")
        cell = agg.setdefault(et, [0, 0, -(10 ** 18), 0])
        cell[0] += 1
        if k is not None:
            cell[1] += int(k)
            cell[2] = max(cell[2], int(k))
            if int(k) > 50:
                cell[3] += 1
    assert set(rows) == set(agg)
    for et, (n, ks, km, nh) in agg.items():
        row = rows[et]
        assert row["n"] == n
        assert row["k_sum"] == ks
        assert row["k_max"] == km
        assert row["n_high"] == nh


def test_q251_collation_distincts_match(spark):
    rows = {
        r["source"]: r
        for r in _q(spark, "q251_collation_distinct").collect()
    }
    docs = _pdf("documents", "source, text")
    per: dict[str, list[str]] = {}
    for s, text in zip(docs["source"], docs["text"]):
        tk = _toks(text)[:2]
        pre = " ".join(tk)
        initcap = " ".join(w[:1].upper() + w[1:] for w in tk)
        per.setdefault(s, []).extend([pre, initcap])
    assert set(rows) == set(per)
    for s, variants in per.items():
        row = rows[s]
        assert row["n_variants"] == len(variants)
        assert row["n_binary_distinct"] == len(set(variants))
        assert row["n_lcase_distinct"] == len(
            {v.lower() for v in variants}
        )


def test_q316_lateral_topk_matches_per_key_slice(spark):
    got = sorted(
        (int(r["c_custkey"]), int(r["o_orderkey"]))
        for r in _q(spark, "q316_lateral_topk_per_key").collect()
    )
    c = _pdf("customer", "c_custkey, c_acctbal")
    o = _pdf("orders", "o_orderkey, o_custkey, o_totalprice")
    rich = {
        int(k) for k, b in zip(c["c_custkey"], c["c_acctbal"])
        if float(b) > 9000
    }
    per: dict[int, list] = {}
    for ok, ck, p in zip(o["o_orderkey"], o["o_custkey"], o["o_totalprice"]):
        if int(ck) in rich:
            per.setdefault(int(ck), []).append((-float(p), int(ok)))
    ref = []
    for ck, items in per.items():
        items.sort()
        for _, ok in items[:2]:
            ref.append((ck, ok))
    assert got == sorted(ref)


def test_q351_zone_maps_match_chunk_stats(spark):
    rows = {}
    for r in _q(spark, "q351_zone_map_pruning").collect():
        k = r["cutoff"]
        rows[k.date() if hasattr(k, "date") else k] = r
    li = _pdf("lineitem", "l_orderkey, l_shipdate")
    chunks: dict[int, list] = {}
    for ok, sd in zip(li["l_orderkey"], li["l_shipdate"]):
        ch = int(ok) // 512
        d = sd.date() if hasattr(sd, "date") else sd
        cell = chunks.setdefault(ch, [0, d])
        cell[0] += 1
        cell[1] = max(cell[1], d)
    cutoffs = [
        datetime.date(y, m, 1) for y in range(1995, 2002) for m in (1, 7)
    ]
    assert set(rows) == set(cutoffs)
    total = sum(c for c, _ in chunks.values())
    for cut in cutoffs:
        pruned = [c for c, mx in chunks.values() if mx < cut]
        row = rows[cut]
        assert row["n_chunks"] == len(chunks)
        assert row["n_pruned"] == len(pruned)
        assert row["rows_skipped"] == sum(pruned)
        assert row["rows_scanned"] == total - sum(pruned)
        assert row["prune_frac"] == pytest.approx(
            sum(pruned) / total, abs=1.1e-6
        )
