"""Fourth batch of independent brute-force references: q390, q391,
q393 (the round-7 bug class itself), q409, q410, q415, q422, q426,
q429, q430, q431. Independent-math coverage: 41 operators."""

from __future__ import annotations

import math
import re
import statistics

import duckdb
import pytest

from tests.conftest import SF_DIR
from tests.test_reference_math_r9 import (
    _daily_counts,
    _midranks,
    _pdf,
    _q,
    _tdiv,
)
from tests.test_reference_math_r9c import _milli_score


# ---------------------------------------------------------------------------
# q390 Cochran's Q over the three gates
# ---------------------------------------------------------------------------


def test_q390_cochrans_q_matches_direct_counts(spark):
    from tests.test_reference_math_r9b import _gates

    row = _q(spark, "q390_cochrans_q").collect()[0]
    docs = _pdf("documents", "text")
    items = [_gates(t) for t in docs["text"]]
    k = 3
    gj = [sum(x[j] for x in items) for j in range(k)]
    li = [sum(x) for x in items]
    q_stat = (
        (k - 1)
        * (k * sum(g * g for g in gj) - sum(gj) ** 2)
        / (k * sum(li) - sum(v * v for v in li))
    )
    assert row["n"] == len(items)
    assert [row["pass_len"], row["pass_rep"], row["pass_stop"]] == gj
    assert row["cochrans_q"] == pytest.approx(q_stat, abs=1e-4)


# ---------------------------------------------------------------------------
# q391 MCC of the quality gate as near-dup predictor
# ---------------------------------------------------------------------------


def test_q391_mcc_matches_direct_confusion(spark):
    from __spark_entry__ import queries

    row = _q(spark, "q391_mcc_gate").collect()[0]
    cands = queries()["q43_lsh_candidate_pairs"](spark, SF_DIR).collect()
    members = {r["doc_a"] for r in cands} | {r["doc_b"] for r in cands}
    docs = _pdf("documents", "doc_id, text")
    tp = fp = fn = tn = 0
    for did, text in zip(docs["doc_id"], docs["text"]):
        pred = _milli_score(text) <= 500
        dup = int(did) in members
        if pred and dup:
            tp += 1
        elif pred:
            fp += 1
        elif dup:
            fn += 1
        else:
            tn += 1
    mcc = (tp * tn - fp * fn) / math.sqrt(
        (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    )
    assert (row["tp"], row["fp"], row["fn"], row["tn"]) == (tp, fp, fn, tn)
    assert row["mcc"] == pytest.approx(mcc, abs=1e-5)


# ---------------------------------------------------------------------------
# q393 Friedman over densified (day x event-type) blocks
# ---------------------------------------------------------------------------


def _day_type_cells():
    from web_scraping_etl_pipeline_spark.plans.common import (
        EVENTS_EPOCH_US,
        US_PER_DAY,
    )

    con = duckdb.connect()
    ev = con.execute(
        f"SELECT event_type, epoch_us(ts) AS us FROM "
        f"read_parquet('{SF_DIR}/events.parquet')"
    ).df()
    cells: dict[tuple[int, str], int] = {}
    for et, us in zip(ev["event_type"], ev["us"]):
        d = (int(us) - EVENTS_EPOCH_US) // US_PER_DAY
        cells[(d, et)] = cells.get((d, et), 0) + 1
    return cells


def test_q393_friedman_matches_block_midranks(spark):
    rows = {
        r["event_type"]: r for r in _q(spark, "q393_friedman_test").collect()
    }
    cells = _day_type_cells()
    days = sorted({d for d, _ in cells})
    types = sorted({t for _, t in cells})
    n, k = len(days), len(types)
    rank_sum = {t: 0.0 for t in types}
    for d in days:
        ys = [cells.get((d, t), 0) for t in types]  # densified
        ranks = _midranks(ys)
        for t, y in zip(types, ys):
            rank_sum[t] += ranks[y]
    chi2 = 12.0 * sum(r * r for r in rank_sum.values()) / (
        n * k * (k + 1)
    ) - 3.0 * n * (k + 1)
    for t in types:
        row = rows[t]
        r2 = round(2 * rank_sum[t])
        assert row["rank_sum_x2"] == r2
        assert row["mean_rank_milli"] == _tdiv(1000 * r2, 2 * n)
        assert row["friedman_chi2"] == pytest.approx(chi2, abs=1e-4)


# ---------------------------------------------------------------------------
# q409 lagged CCF volume vs unique-user reach
# ---------------------------------------------------------------------------


def test_q409_ccf_matches_direct_correlation(spark):
    from web_scraping_etl_pipeline_spark.plans.common import (
        EVENTS_EPOCH_US,
        US_PER_DAY,
    )

    rows = {r["lag_d"]: r for r in _q(spark, "q409_ccf_volume_reach").collect()}
    con = duckdb.connect()
    ev = con.execute(
        f"SELECT user_id, epoch_us(ts) AS us FROM "
        f"read_parquet('{SF_DIR}/events.parquet')"
    ).df()
    vol: dict[int, int] = {}
    users: dict[int, set] = {}
    for uid, us in zip(ev["user_id"], ev["us"]):
        d = (int(us) - EVENTS_EPOCH_US) // US_PER_DAY
        vol[d] = vol.get(d, 0) + 1
        users.setdefault(d, set()).add(int(uid))
    days = sorted(vol)
    y = {d: vol[d] for d in days}
    u = {d: len(users[d]) for d in days}
    ybar = statistics.fmean(y.values())
    ubar = statistics.fmean(u.values())
    vy = sum((v - ybar) ** 2 for v in y.values())
    vu = sum((v - ubar) ** 2 for v in u.values())
    for lag in range(6):
        matched = [(d, d + lag) for d in days if d + lag in y]
        r = sum(
            (y[a] - ybar) * (u[b] - ubar) for a, b in matched
        ) / math.sqrt(vy * vu)
        row = rows[lag]
        assert row["n_pairs"] == len(matched)
        assert row["ccf"] == pytest.approx(r, abs=1e-5)


# ---------------------------------------------------------------------------
# q410 HHI supplier-revenue concentration per nation
# ---------------------------------------------------------------------------


def test_q410_hhi_matches_direct_shares(spark):
    rows = {r["nation"]: r for r in _q(spark, "q410_hhi_concentration").collect()}
    con = duckdb.connect()
    li = con.execute(
        f"SELECT l_suppkey, l_extendedprice, l_discount FROM "
        f"read_parquet('{SF_DIR}/lineitem.parquet')"
    ).df()
    sup = con.execute(
        f"SELECT s_suppkey, s_nationkey FROM "
        f"read_parquet('{SF_DIR}/supplier.parquet')"
    ).df()
    nat = con.execute(
        f"SELECT n_nationkey, n_name FROM "
        f"read_parquet('{SF_DIR}/nation.parquet')"
    ).df()
    s2n = dict(zip(sup["s_suppkey"], sup["s_nationkey"]))
    n2name = dict(zip(nat["n_nationkey"], nat["n_name"]))
    cents: dict[tuple[str, int], int] = {}
    for sk, ep, dc in zip(
        li["l_suppkey"], li["l_extendedprice"], li["l_discount"]
    ):
        nation = n2name[s2n[int(sk)]]
        c = math.floor(float(ep) * (1 - float(dc)) * 100 + 0.5)
        cents[(nation, int(sk))] = cents.get((nation, int(sk)), 0) + c
    for nation in {k[0] for k in cents}:
        sup_cents = [v for (nm, _), v in cents.items() if nm == nation]
        total = sum(sup_cents)
        hhi = sum((c / total) ** 2 for c in sup_cents)
        row = rows[nation]
        assert row["n_suppliers"] == len(sup_cents)
        assert row["total_cents"] == total
        assert row["hhi"] == pytest.approx(hhi, abs=1e-5)
        assert row["top_share_milli"] == _tdiv(1000 * max(sup_cents), total)


# ---------------------------------------------------------------------------
# q415 Neyman allocation with largest-remainder reconciliation
# ---------------------------------------------------------------------------


def test_q415_neyman_matches_direct_allocation(spark):
    rows = {r["lang"]: r for r in _q(spark, "q415_neyman_allocation").collect()}
    docs = _pdf("documents", "lang, n_chars")
    groups: dict[str, list[int]] = {}
    for g, v in zip(docs["lang"], docs["n_chars"]):
        groups.setdefault(g, []).append(int(v))
    total = 10_000
    w_micro = {}
    for g, vs in groups.items():
        s = statistics.stdev(vs)
        w_micro[g] = round(len(vs) * s * 1_000_000)
    wt = sum(w_micro.values())
    base = {g: (total * w_micro[g]) // wt for g in groups}
    rem = {g: (total * w_micro[g]) % wt for g in groups}
    leftover = total - sum(base.values())
    topped = sorted(groups, key=lambda g: (-rem[g], g))[:leftover]
    for g, vs in groups.items():
        row = rows[g]
        assert row["n_docs"] == len(vs)
        assert abs(row["weight_micro"] - w_micro[g]) <= 1
        assert row["sd_milli"] == pytest.approx(
            statistics.stdev(vs) * 1000, abs=1
        )
        assert row["alloc"] == base[g] + (1 if g in topped else 0)
    assert sum(r["alloc"] for r in rows.values()) == total


# ---------------------------------------------------------------------------
# q422 marginal vs pooled-within correlation
# ---------------------------------------------------------------------------


def test_q422_within_correlation_matches_direct_pooling(spark):
    row = _q(spark, "q422_within_source_correlation").collect()[0]
    docs = _pdf("documents", "source, n_chars, text")
    groups: dict[str, list[tuple[int, int]]] = {}
    for g, nc, text in zip(docs["source"], docs["n_chars"], docs["text"]):
        groups.setdefault(g, []).append((int(nc), _milli_score(text)))
    allp = [p for ps in groups.values() for p in ps]
    n = len(allp)
    xbar = statistics.fmean(x for x, _ in allp)
    ybar = statistics.fmean(y for _, y in allp)
    sxy = sum((x - xbar) * (y - ybar) for x, y in allp)
    sxx = sum((x - xbar) ** 2 for x, _ in allp)
    syy = sum((y - ybar) ** 2 for _, y in allp)
    r_marg = sxy / math.sqrt(sxx * syy)
    wxy = wxx = wyy = 0.0
    for ps in groups.values():
        gx = statistics.fmean(x for x, _ in ps)
        gy = statistics.fmean(y for _, y in ps)
        wxy += sum((x - gx) * (y - gy) for x, y in ps)
        wxx += sum((x - gx) ** 2 for x, _ in ps)
        wyy += sum((y - gy) ** 2 for _, y in ps)
    r_within = wxy / math.sqrt(wxx * wyy)
    assert row["k_sources"] == len(groups)
    assert row["r_marginal"] == pytest.approx(r_marg, abs=1e-5)
    assert row["r_within"] == pytest.approx(r_within, abs=1e-5)


# ---------------------------------------------------------------------------
# q426 Cook's distance top-3 days
# ---------------------------------------------------------------------------


def test_q426_cooks_distance_matches_float_ols(spark):
    got = [
        (r["day_idx"], r["day_count"], r["leverage"], r["cook_d"])
        for r in _q(spark, "q426_cooks_distance_days").collect()
    ]
    days = _daily_counts()
    pts = [(d, days[d]) for d in sorted(days)]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sxx = sum(x * x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    alpha = (sy - beta * sx) / n
    e = {x: y - alpha - beta * x for x, y in pts}
    sse = sum(v * v for v in e.values())
    s2 = sse / (n - 2)
    xbar = sx / n
    sxx_c = sxx - n * xbar * xbar
    cooks = []
    for x, y in pts:
        h = 1.0 / n + (x - xbar) ** 2 / sxx_c
        d_stat = e[x] ** 2 / (2 * s2) * h / (1 - h) ** 2
        cooks.append((x, y, h, d_stat))
    cooks.sort(key=lambda c: (-c[3], c[0]))
    assert len(got) == 3
    for (x, y, h, d_stat), (gx, gy, gh, gd) in zip(cooks[:3], got):
        assert (x, y) == (gx, gy)
        assert gh == pytest.approx(h, abs=1e-5)
        assert gd == pytest.approx(d_stat, abs=1e-4)


# ---------------------------------------------------------------------------
# q429 Page-Hinkley drift trace
# ---------------------------------------------------------------------------


def test_q429_page_hinkley_matches_direct_path(spark):
    row = _q(spark, "q429_page_hinkley").collect()[0]
    days = _daily_counts()
    ds = sorted(days)
    cum = 0
    path = 0
    pmin = 0  # running min over the path INCLUDING current
    best = None
    phs = []
    for i, d in enumerate(ds, start=1):
        cum += days[d]
        tm = round((days[d] - cum / i) * 1_000_000)
        path += tm
        phs.append((d, path))
    run_min = None
    for d, p in phs:
        run_min = p if run_min is None else min(run_min, p)
        ex = p - run_min
        key = (-ex, d)
        if best is None or key < best[0]:
            best = (key, d, ex)
    _, peak_day, ph = best
    n, sy = len(ds), sum(days.values())
    assert row["n_days"] == n
    assert row["peak_day"] == peak_day
    assert abs(row["ph_stat_micro"] - ph) <= n  # per-day micro rounding
    assert row["ph_over_mean_milli"] == _tdiv(
        row["ph_stat_micro"] * n, 1000 * sy
    )


# ---------------------------------------------------------------------------
# q430 James-Stein positive-part shrinkage
# ---------------------------------------------------------------------------


def test_q430_james_stein_matches_direct_shrinkage(spark):
    rows = {
        r["source"]: r
        for r in _q(spark, "q430_james_stein_shrinkage").collect()
    }
    docs = _pdf("documents", "source, text")
    groups: dict[str, list[int]] = {}
    for g, text in zip(docs["source"], docs["text"]):
        groups.setdefault(g, []).append(_milli_score(text))
    sizes = {len(v) for v in groups.values()}
    assert len(sizes) == 1
    m = sizes.pop()
    k = len(groups)
    means = {g: statistics.fmean(vs) for g, vs in groups.items()}
    grand = statistics.fmean(v for vs in groups.values() for v in vs)
    msw = sum(
        (v - means[g]) ** 2 for g, vs in groups.items() for v in vs
    ) / (k * (m - 1))
    denom = sum((mu - grand) ** 2 for mu in means.values())
    b = max(0.0, 1.0 - (k - 3) * (msw / m) / denom)
    for g, vs in groups.items():
        row = rows[g]
        assert row["raw_mean_milli"] == _tdiv(1000 * sum(vs), m)
        assert row["b_plus"] == pytest.approx(b, abs=1e-5)
        assert row["shrunk_mean_milli"] == pytest.approx(
            round(1000 * (grand + b * (means[g] - grand))), abs=1
        )


# ---------------------------------------------------------------------------
# q431 Wald SPRT on the daily error share
# ---------------------------------------------------------------------------


def test_q431_sprt_matches_direct_path(spark):
    from web_scraping_etl_pipeline_spark.plans.common import (
        EVENTS_EPOCH_US,
        US_PER_DAY,
    )

    row = _q(spark, "q431_sprt_error_monitor").collect()[0]
    con = duckdb.connect()
    ev = con.execute(
        f"SELECT event_type, epoch_us(ts) AS us FROM "
        f"read_parquet('{SF_DIR}/events.parquet')"
    ).df()
    per_day: dict[int, list[int]] = {}
    for et, us in zip(ev["event_type"], ev["us"]):
        d = (int(us) - EVENTS_EPOCH_US) // US_PER_DAY
        c = per_day.setdefault(d, [0, 0])  # [errors, total]
        c[0] += 1 if et == "error" else 0
        c[1] += 1
    l1 = math.log(0.25 / 0.20)
    l2 = math.log(0.75 / 0.80)
    a_micro = round(math.log((1 - 0.05) / 0.05) * 1_000_000)
    path = 0
    d_hi = d_lo = None
    pmax = None
    for d in sorted(per_day):
        e, t = per_day[d]
        path += round((e * l1 + (t - e) * l2) * 1_000_000)
        pmax = path if pmax is None else max(pmax, path)
        if d_hi is None and path >= a_micro:
            d_hi = d
        if d_lo is None and path <= -a_micro:
            d_lo = d
    if d_hi is not None and (d_lo is None or d_hi <= d_lo):
        decision, decision_day = "accept_h1", d_hi
    elif d_lo is not None:
        decision, decision_day = "accept_h0", d_lo
    else:
        decision, decision_day = "continue", None
    n = len(per_day)
    assert row["n_days"] == n
    assert abs(row["llr_final_micro"] - path) <= n
    assert abs(row["llr_max_micro"] - pmax) <= n
    assert row["decision"] == decision
    assert row["decision_day"] == decision_day
