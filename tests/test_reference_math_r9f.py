"""Sixth batch of independent brute-force references: q310, q321,
q330, q338, q346, q357, q364, q368, q372, q383. Independent-math
coverage: 60 operators."""

from __future__ import annotations

import hashlib
import json
import math
import re
import statistics

import duckdb
import pytest

from tests.conftest import SF_DIR
from tests.test_reference_math_r9 import (
    _daily_counts,
    _pdf,
    _q,
    _tdiv,
)
from tests.test_reference_math_r9c import _milli_score


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _events(cols: str):
    con = duckdb.connect()
    return con.execute(
        f"SELECT {cols} FROM read_parquet('{SF_DIR}/events.parquet')"
    ).df()


# ---------------------------------------------------------------------------
# q310 CUPED-adjusted A/B readout
# ---------------------------------------------------------------------------


def test_q310_cuped_matches_direct_covariate_adjustment(spark):
    rows = {r["arm"]: r for r in _q(spark, "q310_cuped_ab_readout").collect()}
    ev = _events("user_id, epoch_us(ts) AS us, value")
    mn, mx = int(ev["us"].min()), int(ev["us"].max())
    mid = (mn + mx) // 2
    per_user: dict[int, list[float]] = {}
    for uid, us, val in zip(ev["user_id"], ev["us"], ev["value"]):
        u = per_user.setdefault(int(uid), [0.0, 0.0, 0])
        if int(us) < mid:
            u[0] += float(val)
        else:
            u[1] += float(val)
            u[2] = 1
    kept = [(x, y, _h60(str(uid)) % 2) for uid, (x, y, p) in per_user.items() if p]
    n = len(kept)
    sx = sum(x for x, _, _ in kept)
    sy = sum(y for _, y, _ in kept)
    sxx = sum(x * x for x, _, _ in kept)
    sxy = sum(x * y for x, y, _ in kept)
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    for arm_id, arm in ((0, "A"), (1, "B")):
        xs = [(x, y) for x, y, a in kept if a == arm_id]
        na = len(xs)
        mean_post = sum(y for _, y in xs) / na
        mean_cuped = mean_post - theta * (
            sum(x for x, _ in xs) / na - sx / n
        )
        row = rows[arm]
        assert row["n_users"] == na
        assert row["mean_post"] == pytest.approx(mean_post, abs=1e-4)
        assert row["mean_cuped"] == pytest.approx(mean_cuped, abs=1e-4)


# ---------------------------------------------------------------------------
# q321 average precision of the quality score vs near-dup label
# ---------------------------------------------------------------------------


def test_q321_average_precision_matches_ranked_scan(spark):
    from __spark_entry__ import queries

    row = _q(spark, "q321_average_precision").collect()[0]
    cands = queries()["q43_lsh_candidate_pairs"](spark, SF_DIR).collect()
    members = {r["doc_a"] for r in cands} | {r["doc_b"] for r in cands}
    docs = _pdf("documents", "doc_id, text")
    scored = sorted(
        (_milli_score(t), int(d), int(d) in members)
        for d, t in zip(docs["doc_id"], docs["text"])
    )
    cpos = 0
    ap_q = 0
    for rn, (_, _, pos) in enumerate(scored, start=1):
        if pos:
            cpos += 1
            ap_q += math.floor(cpos / rn * 1_000_000_000)
    n_pos = cpos
    assert row["n_docs"] == len(scored)
    assert row["n_pos"] == n_pos
    assert row["ap"] == pytest.approx(ap_q / 1e9 / n_pos, abs=1e-6)


# ---------------------------------------------------------------------------
# q330 delete-a-group jackknife SE
# ---------------------------------------------------------------------------


def test_q330_jackknife_matches_direct_loo(spark):
    rows = {
        r["source"]: r
        for r in _q(spark, "q330_jackknife_group_mean").collect()
    }
    docs = _pdf("documents", "source, n_chars")
    groups: dict[str, list[int]] = {}
    for g, v in zip(docs["source"], docs["n_chars"]):
        groups.setdefault(g, []).append(int(v))
    n = sum(len(v) for v in groups.values())
    s = sum(sum(v) for v in groups.values())
    k = len(groups)
    theta = {
        g: _tdiv((s - sum(vs)) * 1_000_000, n - len(vs))
        for g, vs in groups.items()
    }
    mean_u = _tdiv(sum(theta.values()), k)
    ss = sum((t - mean_u) ** 2 for t in theta.values())
    se = math.sqrt((k - 1) * ss / k) / 1_000_000
    for g, vs in groups.items():
        row = rows[g]
        assert row["n_docs"] == len(vs)
        assert row["loo_mean"] == pytest.approx(theta[g] / 1e6, abs=1e-6)
        assert row["corpus_mean"] == pytest.approx(s / n, abs=1e-6)
        assert row["jackknife_se"] == pytest.approx(se, abs=1e-5)


# ---------------------------------------------------------------------------
# q338 Brier + ECE calibration of the score-as-probability
# ---------------------------------------------------------------------------


def test_q338_brier_ece_matches_direct_bins(spark):
    from __spark_entry__ import queries

    rows = {r["bin"]: r for r in _q(spark, "q338_brier_ece_calibration").collect()}
    cands = queries()["q43_lsh_candidate_pairs"](spark, SF_DIR).collect()
    members = {r["doc_a"] for r in cands} | {r["doc_b"] for r in cands}
    docs = _pdf("documents", "doc_id, text")
    fl = [
        (_milli_score(t), 1 if int(d) in members else 0)
        for d, t in zip(docs["doc_id"], docs["text"])
    ]
    bins: dict[int, list[int]] = {}
    for s_val, y in fl:
        b = bins.setdefault(s_val // 100, [0, 0, 0])  # n, pos, sum_s
        b[0] += 1
        b[1] += y
        b[2] += s_val
    nn = len(fl)
    ece = _tdiv(
        1_000_000 * sum(abs(1000 * p - ss) for _, p, ss in bins.values()),
        1000 * nn,
    )
    brier = _tdiv(sum((s_val - 1000 * y) ** 2 for s_val, y in fl), nn)
    for b, (n, pos, sum_s) in bins.items():
        row = rows[b]
        assert (row["n"], row["pos"]) == (n, pos)
        assert row["conf_milli"] == _tdiv(sum_s, n)
        assert row["rate_milli"] == _tdiv(1000 * pos, n)
        assert row["ece_micro"] == ece
        assert row["brier_micro"] == brier


# ---------------------------------------------------------------------------
# q346 SES (dyadic alpha=1/2, 15-lag truncation)
# ---------------------------------------------------------------------------


def test_q346_ses_matches_direct_dyadic_sum(spark):
    rows = {r["day_idx"]: r for r in _q(spark, "q346_ses_forecast").collect()}
    days = _daily_counts()
    ds = sorted(days)
    dmin = ds[0]
    lag = 40  # _SES_MAXLAG: terms beyond it integer-shift to ~0 micro
    ses = {}
    for t in ds:
        s_val = 0
        for s_day in ds:
            if dmin < s_day <= t and s_day > t - lag:
                s_val += (days[s_day] * 1_000_000) // (
                    1 << (t - s_day + 1)
                )
        if t - dmin < lag:
            s_val += (days[dmin] * 1_000_000) // (1 << (t - dmin))
        ses[t] = s_val
    errs = []
    for t in ds:
        row = rows[t]
        assert row["y"] == days[t]
        assert row["ses_micro"] == ses[t]
        if t - 1 in ses:
            err = abs(days[t] * 1_000_000 - ses[t - 1])
            assert row["err_micro"] == err
            errs.append(err)
        else:
            assert row["err_micro"] is None
    mae = rows[ds[0]]["mae_micro"]
    assert abs(mae - _tdiv(sum(errs), len(errs))) <= 1


# ---------------------------------------------------------------------------
# q357 Holt linear trend (alpha=beta=1/2, integer micro recursion)
# ---------------------------------------------------------------------------


def test_q357_holt_matches_direct_recursion(spark):
    rows = {
        r["day_idx"]: r for r in _q(spark, "q357_holt_trend_forecast").collect()
    }
    days = _daily_counts()
    ds = sorted(days)
    l = days[ds[0]] * 1_000_000
    b = (days[ds[1]] - days[ds[0]]) * 1_000_000
    assert rows[ds[0]]["l_micro"] == l
    assert rows[ds[0]]["b_micro"] == b
    assert rows[ds[0]]["err_micro"] is None
    for t in ds[1:]:
        y = days[t] * 1_000_000
        err = abs(y - (l + b))
        l_new = _tdiv(y, 2) + _tdiv(l + b, 2)
        b_new = _tdiv(l_new - l, 2) + _tdiv(b, 2)
        l, b = l_new, b_new
        row = rows[t]
        assert row["y"] == days[t]
        assert row["l_micro"] == l
        assert row["b_micro"] == b
        assert row["err_micro"] == err


# ---------------------------------------------------------------------------
# q364 hash-seeded permutation test
# ---------------------------------------------------------------------------


def test_q364_permutation_matches_direct_flips(spark):
    row = _q(spark, "q364_permutation_test").collect()[0]
    ev = _events("user_id, event_type, value")
    totals: dict[int, int] = {}
    for uid, et, val in zip(ev["user_id"], ev["event_type"], ev["value"]):
        if et == "purchase":
            totals[int(uid)] = totals.get(int(uid), 0) + round(
                float(val) * 1_000_000
            )
    t_obs = sum(
        x if _h60(str(uid)) % 2 == 0 else -x for uid, x in totals.items()
    )
    n_extreme = 0
    for bi in range(64):
        t_b = sum(
            x if _h60(f"{uid}|{bi}") % 2 == 0 else -x
            for uid, x in totals.items()
        )
        if abs(t_b) >= abs(t_obs):
            n_extreme += 1
    assert row["t_obs_micro"] == t_obs
    assert row["n_perms"] == 64
    assert row["n_extreme"] == n_extreme
    assert row["p_value"] == pytest.approx((1 + n_extreme) / 65, abs=1e-6)


# ---------------------------------------------------------------------------
# q368 overdispersion index per event type
# ---------------------------------------------------------------------------


def test_q368_overdispersion_matches_direct_variance(spark):
    from web_scraping_etl_pipeline_spark.plans.common import (
        EVENTS_EPOCH_US,
        US_PER_DAY,
    )

    rows = {
        r["event_type"]: r
        for r in _q(spark, "q368_overdispersion_audit").collect()
    }
    ev = _events("event_type, epoch_us(ts) AS us")
    cells: dict[tuple[str, int], int] = {}
    all_days = set()
    for et, us in zip(ev["event_type"], ev["us"]):
        d = (int(us) - EVENTS_EPOCH_US) // US_PER_DAY
        all_days.add(d)
        cells[(et, d)] = cells.get((et, d), 0) + 1
    types = {et for et, _ in cells}
    for et in types:
        series = [cells.get((et, d), 0) for d in sorted(all_days)]
        mean = statistics.fmean(series)
        row = rows[et]
        assert row["n_days"] == len(series)
        assert row["total"] == sum(series)
        assert row["mean_milli"] == _tdiv(1000 * sum(series), len(series))
        # try both variance conventions; exactly one should match
        d_samp = statistics.variance(series) / mean
        d_pop = statistics.pvariance(series) / mean
        assert row["dispersion_index"] == pytest.approx(
            d_samp, abs=1e-5
        ) or row["dispersion_index"] == pytest.approx(d_pop, abs=1e-5)


# ---------------------------------------------------------------------------
# q372 Wilson score interval per source
# ---------------------------------------------------------------------------


def test_q372_wilson_matches_direct_interval(spark):
    rows = {r["source"]: r for r in _q(spark, "q372_wilson_ci_by_source").collect()}
    docs = _pdf("documents", "source, text")
    counts: dict[str, list[int]] = {}
    for g, text in zip(docs["source"], docs["text"]):
        c = counts.setdefault(g, [0, 0])
        c[0] += 1
        c[1] += 1 if _milli_score(text) < 500 else 0
    z = 1.959963985
    for g, (n, k) in counts.items():
        p = k / n
        denom = 1 + z * z / n
        center = p + z * z / (2 * n)
        spread = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
        lo = (center - spread) / denom
        hi = (center + spread) / denom
        row = rows[g]
        assert (row["n"], row["k"]) == (n, k)
        assert row["fail_rate"] == pytest.approx(p, abs=1e-6)
        assert row["wilson_lo"] == pytest.approx(lo, abs=1e-5)
        assert row["wilson_hi"] == pytest.approx(hi, abs=1e-5)


# ---------------------------------------------------------------------------
# q383 degree assortativity of the click graph
# ---------------------------------------------------------------------------


def test_q383_assortativity_matches_direct_pearson(spark):
    row = _q(spark, "q383_degree_assortativity").collect()[0]
    ev = _events("user_id, event_type, props")
    edges = set()
    for uid, et, props in zip(ev["user_id"], ev["event_type"], ev["props"]):
        if et != "click":
            continue
        item = int(json.loads(props)["k"]) + 1_000_000
        edges.add((int(uid), item))
    deg: dict[int, int] = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    xs, ys = [], []
    for u, v in edges:
        xs += [deg[u], deg[v]]
        ys += [deg[v], deg[u]]
    n = len(xs)
    sx = sum(xs)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    r = (n * sxy - sx * sx) / (n * sxx - sx * sx)
    assert row["n_edge_ends"] == n
    assert row["degree_sum"] == sx
    assert row["assortativity"] == pytest.approx(r, abs=1e-5)
