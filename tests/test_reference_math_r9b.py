"""Second batch of independent brute-force references (VERDICT r8
item 2, beyond the mandated ten): q402, q404, q408, q419, q425, q433,
q434, q435, q438 recomputed from raw parquet with naive from-scratch
algorithms at sf0.001 (see test_reference_math_r9.py for the method
and tolerance rationale)."""

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


# ---------------------------------------------------------------------------
# q402 Ljung-Box portmanteau (lags 1..10)
# ---------------------------------------------------------------------------


def test_q402_ljung_box_matches_acf_bruteforce(spark):
    rows = {r["lag_k"]: r for r in _q(spark, "q402_ljung_box").collect()}
    days = _daily_counts()
    ys = [days[d] for d in sorted(days)]
    n = len(ys)
    ybar = sum(ys) / n
    den = sum((y - ybar) ** 2 for y in ys)
    q_stat = 0.0
    for k in range(1, 11):
        pairs = [
            (days[d], days[d + k])
            for d in sorted(days)
            if d + k in days
        ]
        rk = sum((a - ybar) * (b - ybar) for a, b in pairs) / den
        row = rows[k]
        assert row["n_pairs"] == len(pairs)
        assert row["dof"] == 10
        # engine carries trunc(rk * 1e6); float vs exact rational can
        # sit either side of the trunc boundary by < 2 micro
        assert abs(row["rk_micro"] - rk * 1_000_000) < 2
        q_stat += rk * rk / (n - k)
    q_stat *= n * (n + 2)
    for row in rows.values():
        assert row["lb_q"] == pytest.approx(q_stat, abs=1e-2)


# ---------------------------------------------------------------------------
# q404 Pettitt change-point
# ---------------------------------------------------------------------------


def test_q404_pettitt_matches_rank_bruteforce(spark):
    row = _q(spark, "q404_pettitt_changepoint").collect()[0]
    days = _daily_counts()
    ds = sorted(days)
    n = len(ds)
    # U_k = sum over i<=k < j of sign(y_i - y_j), k over all but the
    # last day; computed here the O(n^2) way from scratch
    best = None
    for k_idx in range(n - 1):
        u = 0
        for i in range(k_idx + 1):
            for j in range(k_idx + 1, n):
                u += (days[ds[i]] > days[ds[j]]) - (
                    days[ds[i]] < days[ds[j]]
                )
        key = (-abs(u), ds[k_idx])
        if best is None or key < best[0]:
            best = (key, ds[k_idx], abs(u))
    _, change_day, k_stat = best
    assert row["n_days"] == n
    assert row["change_day"] == change_day
    assert row["k_stat"] == k_stat
    assert row["neg_ln_p_micro"] == _tdiv(
        6_000_000 * k_stat * k_stat, n**3 + n**2
    )


# ---------------------------------------------------------------------------
# q408 Durbin-Watson on OLS residuals
# ---------------------------------------------------------------------------


def test_q408_durbin_watson_matches_float_ols(spark):
    row = _q(spark, "q408_durbin_watson").collect()[0]
    days = _daily_counts()
    pts = [(d, days[d]) for d in sorted(days)]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    alpha = (sy - beta * sx) / n
    e = [y - alpha - beta * x for x, y in pts]
    dw = sum((e[t] - e[t - 1]) ** 2 for t in range(1, n)) / sum(
        v * v for v in e
    )
    assert row["n_days"] == n
    assert row["dw_stat"] == pytest.approx(dw, abs=1e-5)
    assert row["rho_approx"] == pytest.approx(1 - dw / 2, abs=1e-5)


# ---------------------------------------------------------------------------
# q419 Bartels rank von Neumann
# ---------------------------------------------------------------------------


def test_q419_bartels_matches_midrank_bruteforce(spark):
    row = _q(spark, "q419_bartels_rvn").collect()[0]
    days = _daily_counts()
    ys = [days[d] for d in sorted(days)]
    ranks = _midranks(ys)
    r = [ranks[y] for y in ys]
    n = len(r)
    rbar = sum(r) / n
    num = sum((r[t] - r[t + 1]) ** 2 for t in range(n - 1))
    den = sum((v - rbar) ** 2 for v in r)
    rvn = num / den  # ~2 under independence (Bartels 1982 eq. 1)
    assert row["n_days"] == n
    # doubled-midrank integers: num_x4 = 4*num, den_x4n2 = 4*n^2*den
    assert row["num_x4"] == round(4 * num)
    assert row["den_x4n2"] == round(4 * n * n * den)
    assert row["rvn"] == pytest.approx(rvn, abs=1e-5)


# ---------------------------------------------------------------------------
# q425 Ansari-Bradley + Lepage
# ---------------------------------------------------------------------------


def test_q425_ansari_bradley_lepage_matches_scores_bruteforce(spark):
    row = _q(spark, "q425_ansari_bradley_lepage").collect()[0]
    docs = _pdf("documents", "source, n_chars")
    g0 = [int(v) for g, v in zip(docs["source"], docs["n_chars"]) if g == "src0"]
    g1 = [int(v) for g, v in zip(docs["source"], docs["n_chars"]) if g == "src1"]
    n0, n1 = len(g0), len(g1)
    nn = n0 + n1
    allv = g0 + g1
    ranks = _midranks(allv)
    # tie-corrected Mann-Whitney z (textbook)
    u = sum(ranks[v] for v in g0) - n0 * (n0 + 1) / 2.0
    cnt = {}
    for v in allv:
        cnt[v] = cnt.get(v, 0) + 1
    tt = sum(c**3 - c for c in cnt.values())
    var_u = n0 * n1 / 12.0 * ((nn**3 - nn - tt) / (nn * (nn - 1)))
    z_loc = (u - n0 * n1 / 2.0) / math.sqrt(var_u)
    # Ansari-Bradley: per-position scores min(pos, N+1-pos), averaged
    # within each tie block, from a plain sort
    s = sorted(allv)
    pos_scores: dict[int, list[int]] = {}
    for i, v in enumerate(s, start=1):
        pos_scores.setdefault(v, []).append(min(i, nn + 1 - i))
    sbar = {v: sum(ps) / len(ps) for v, ps in pos_scores.items()}
    t0 = sum(sbar[v] for v in g0)
    st = sum(sbar[v] for v in allv)
    ssq = sum(sbar[v] ** 2 for v in allv)
    var_t = n0 * n1 * (nn * ssq - st * st) / (nn * nn * (nn - 1))
    z_ab = (t0 - n0 * st / nn) / math.sqrt(var_t)
    assert row["n0"] == n0 and row["n1"] == n1
    assert row["z_location"] == pytest.approx(z_loc, abs=1e-5)
    assert row["z_dispersion"] == pytest.approx(z_ab, abs=1e-5)
    assert row["lepage"] == pytest.approx(
        z_loc**2 + z_ab**2, abs=1e-3
    )


# ---------------------------------------------------------------------------
# q433 Cronbach's alpha of the three gates
# ---------------------------------------------------------------------------

_STOPS = {"the", "a", "of", "and", "to", "in", "is", "it", "for", "on"}


def _gates(text: str):
    toks = re.split(r"\s+", text.strip().lower())
    nt, nd = len(toks), len(set(toks))
    ns = sum(1 for t in toks if t in _STOPS)
    return (
        1 if 20 <= nt <= 80 else 0,
        1 if 5 * nd >= 2 * nt else 0,
        1 if 50 * ns >= nt else 0,
    )


def test_q433_cronbach_matches_item_variances(spark):
    row = _q(spark, "q433_cronbach_alpha_gates").collect()[0]
    docs = _pdf("documents", "text")
    items = [_gates(t) for t in docs["text"]]
    n = len(items)
    ga = [a for a, _, _ in items]
    gb = [b for _, b, _ in items]
    gc = [c for _, _, c in items]
    tot = [a + b + c for a, b, c in items]
    item_var = sum(statistics.pvariance(g) for g in (ga, gb, gc))
    alpha = 1.5 * (1.0 - item_var / statistics.pvariance(tot))
    assert row["n"] == n
    assert row["pass_len"] == sum(ga)
    assert row["pass_rep"] == sum(gb)
    assert row["pass_stop"] == sum(gc)
    assert row["cronbach_alpha"] == pytest.approx(alpha, abs=1e-5)


# ---------------------------------------------------------------------------
# q434 Goodman-Kruskal gamma + Somers' D (O(n^2) pair loop)
# ---------------------------------------------------------------------------


def test_q434_gamma_somers_matches_pair_bruteforce(spark):
    row = _q(spark, "q434_gamma_somers_d").collect()[0]
    docs = _pdf("documents", "n_chars, text")
    pts = []
    for nc, text in zip(docs["n_chars"], docs["text"]):
        toks = re.split(r"\s+", text.strip().lower())
        score = (1000 * len(set(toks))) // len(toks)
        pts.append((int(nc) // 100, score // 250))
    c = d = ty = 0
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            dx = pts[i][0] - pts[j][0]
            dy = pts[i][1] - pts[j][1]
            if dx != 0 and dy != 0:
                if (dx > 0) == (dy > 0):
                    c += 1
                else:
                    d += 1
            elif dx != 0 and dy == 0:
                ty += 1
    assert row["concordant"] == c
    assert row["discordant"] == d
    assert row["tied_y_only"] == ty
    assert row["gamma"] == pytest.approx((c - d) / (c + d), abs=1e-5)
    assert row["somers_d_yx"] == pytest.approx(
        (c - d) / (c + d + ty), abs=1e-5
    )


# ---------------------------------------------------------------------------
# q435 Theil's U(lang | source)
# ---------------------------------------------------------------------------


def test_q435_theils_u_matches_entropy_bruteforce(spark):
    row = _q(spark, "q435_theils_u_lang_source").collect()[0]
    docs = _pdf("documents", "lang, source")
    n = len(docs)
    lang_ct: dict[str, int] = {}
    pair_ct: dict[tuple[str, str], int] = {}
    src_ct: dict[str, int] = {}
    for lang, src in zip(docs["lang"], docs["source"]):
        lang_ct[lang] = lang_ct.get(lang, 0) + 1
        src_ct[src] = src_ct.get(src, 0) + 1
        pair_ct[(lang, src)] = pair_ct.get((lang, src), 0) + 1
    h_lang = -sum(c / n * math.log(c / n) for c in lang_ct.values())
    h_cond = 0.0
    for s, cs in src_ct.items():
        for (lang, src), c in pair_ct.items():
            if src == s:
                h_cond += -(c / n) * math.log(c / cs)
    u = (h_lang - h_cond) / h_lang
    assert row["n_docs"] == n
    assert row["h_lang_micro_n"] == pytest.approx(
        h_lang * n * 1_000_000, abs=n + 1
    )
    assert row["h_lang_given_source_micro_n"] == pytest.approx(
        h_cond * n * 1_000_000, abs=n + 1
    )
    assert row["theils_u"] == pytest.approx(u, abs=1e-4)


# ---------------------------------------------------------------------------
# q438 Cochran-Armitage trend
# ---------------------------------------------------------------------------


def test_q438_cochran_armitage_matches_direct_contrast(spark):
    row = _q(spark, "q438_cochran_armitage_trend").collect()[0]
    docs = _pdf("documents", "n_chars, text")
    buckets: dict[int, list[int]] = {}
    for nc, text in zip(docs["n_chars"], docs["text"]):
        toks = re.split(r"\s+", text.strip().lower())
        nt = len(toks)
        passed = 1 if 20 <= nt <= 80 else 0
        buckets.setdefault(int(nc) // 100, []).append(passed)
    n = sum(len(v) for v in buckets.values())
    r = sum(sum(v) for v in buckets.values())
    t1 = sum(s * sum(v) for s, v in buckets.items())
    w1 = sum(s * len(v) for s, v in buckets.items())
    w2 = sum(s * s * len(v) for s, v in buckets.items())
    num = t1 - r * w1 / n
    var = (r / n) * (1 - r / n) * (w2 - w1 * w1 / n)
    z = num / math.sqrt(var)
    assert row["n_buckets"] == len(buckets)
    assert row["n_docs"] == n
    assert row["n_pass"] == r
    assert row["z_trend"] == pytest.approx(z, abs=1e-5)
