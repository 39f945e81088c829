"""Fifth batch of independent brute-force references: q318, q326,
q327, q336, q375, q377, q392, q400, q424. Independent-math coverage:
50 operators."""

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
# q318 Mann-Whitney U (tie-corrected)
# ---------------------------------------------------------------------------


def test_q318_mann_whitney_matches_midrank_bruteforce(spark):
    row = _q(spark, "q318_mann_whitney_u").collect()[0]
    docs = _pdf("documents", "source, n_chars")
    g0 = [int(v) for g, v in zip(docs["source"], docs["n_chars"]) if g == "src0"]
    g1 = [int(v) for g, v in zip(docs["source"], docs["n_chars"]) if g == "src1"]
    n0, n1 = len(g0), len(g1)
    nn = n0 + n1
    ranks = _midranks(g0 + g1)
    u = sum(ranks[v] for v in g0) - n0 * (n0 + 1) / 2.0
    cnt = {}
    for v in g0 + g1:
        cnt[v] = cnt.get(v, 0) + 1
    tt = sum(c**3 - c for c in cnt.values())
    var_u = n0 * n1 / 12.0 * ((nn**3 - nn - tt) / (nn * (nn - 1)))
    z = (u - n0 * n1 / 2.0) / math.sqrt(var_u)
    assert row["n_src0"] == n0 and row["n_src1"] == n1
    assert row["u_times2"] == round(2 * u)
    assert row["z"] == pytest.approx(z, abs=1e-5)


# ---------------------------------------------------------------------------
# q326 per-source Spearman (Pearson on midranks)
# ---------------------------------------------------------------------------


def test_q326_spearman_matches_rank_pearson(spark):
    rows = {
        r["source"]: r for r in _q(spark, "q326_spearman_rank_corr").collect()
    }
    docs = _pdf("documents", "source, n_chars, text")
    groups: dict[str, list[tuple[int, int]]] = {}
    for g, nc, text in zip(docs["source"], docs["n_chars"], docs["text"]):
        groups.setdefault(g, []).append((int(nc), _milli_score(text)))
    for g, ps in groups.items():
        rx_map = _midranks([x for x, _ in ps])
        ry_map = _midranks([y for _, y in ps])
        rx = [rx_map[x] for x, _ in ps]
        ry = [ry_map[y] for _, y in ps]
        mx, my = statistics.fmean(rx), statistics.fmean(ry)
        num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
        den = math.sqrt(
            sum((a - mx) ** 2 for a in rx) * sum((b - my) ** 2 for b in ry)
        )
        row = rows[g]
        assert row["n_docs"] == len(ps)
        assert row["rho_spearman"] == pytest.approx(num / den, abs=1e-5)


# ---------------------------------------------------------------------------
# q327 Kendall tau-b on the 1995 daily (orders, revenue-cents) series
# ---------------------------------------------------------------------------


def test_q327_kendall_tau_matches_pair_bruteforce(spark):
    row = _q(spark, "q327_kendall_tau_daily").collect()[0]
    con = duckdb.connect()
    o = con.execute(
        f"SELECT CAST(o_orderdate AS DATE) AS day, o_totalprice FROM "
        f"read_parquet('{SF_DIR}/orders.parquet') "
        f"WHERE year(CAST(o_orderdate AS DATE)) = 1995"
    ).df()
    days: dict = {}
    for day, price in zip(o["day"], o["o_totalprice"]):
        x, y = days.get(day, (0, 0))
        days[day] = (x + 1, y + math.floor(float(price) * 100 + 0.5))
    pts = list(days.values())
    n = len(pts)
    c = d = tx = ty = tb = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx = pts[i][0] - pts[j][0]
            dy = pts[i][1] - pts[j][1]
            if dx == 0 and dy == 0:
                tb += 1
            elif dx == 0:
                tx += 1
            elif dy == 0:
                ty += 1
            elif (dx > 0) == (dy > 0):
                c += 1
            else:
                d += 1
    n0 = n * (n - 1) // 2
    tau = (c - d) / math.sqrt((n0 - (tx + tb)) * (n0 - (ty + tb)))
    assert row["n_days"] == n
    assert (row["concordant"], row["discordant"]) == (c, d)
    assert (row["ties_x"], row["ties_y"], row["ties_both"]) == (tx, ty, tb)
    assert row["tau_b"] == pytest.approx(tau, abs=1e-5)


# ---------------------------------------------------------------------------
# q336 daily autocorrelation (lags 1..10)
# ---------------------------------------------------------------------------


def test_q336_acf_matches_direct_products(spark):
    rows = {
        r["lag_k"]: r
        for r in _q(spark, "q336_daily_autocorrelation").collect()
    }
    days = _daily_counts()
    ys = [days[d] for d in sorted(days)]
    ybar = sum(ys) / len(ys)
    den = sum((y - ybar) ** 2 for y in ys)
    for k, row in rows.items():
        pairs = [
            (days[d], days[d + k]) for d in sorted(days) if d + k in days
        ]
        acf = sum((a - ybar) * (b - ybar) for a, b in pairs) / den
        assert row["n_pairs"] == len(pairs)
        assert row["acf"] == pytest.approx(acf, abs=2e-6)


# ---------------------------------------------------------------------------
# q375 Markov entropy rate of the event-type chain
# ---------------------------------------------------------------------------


def test_q375_entropy_rate_matches_direct_census(spark):
    row = _q(spark, "q375_markov_entropy_rate").collect()[0]
    con = duckdb.connect()
    ev = con.execute(
        f"SELECT user_id, event_type, epoch_us(ts) AS us, event_id FROM "
        f"read_parquet('{SF_DIR}/events.parquet') "
        f"ORDER BY user_id, us, event_id"
    ).df()
    trans: dict[tuple[str, str], int] = {}
    prev_user = prev_type = None
    for uid, et in zip(ev["user_id"], ev["event_type"]):
        if prev_user == uid:
            trans[(prev_type, et)] = trans.get((prev_type, et), 0) + 1
        prev_user, prev_type = uid, et
    rowt: dict[str, int] = {}
    for (cur, _), cnt in trans.items():
        rowt[cur] = rowt.get(cur, 0) + cnt
    n = sum(trans.values())
    h_sum = sum(
        cnt * math.floor(math.log(rowt[cur] / cnt) * 1_000_000)
        for (cur, _), cnt in trans.items()
    )
    assert row["n_transitions"] == n
    assert row["n_cells"] == len(trans)
    assert abs(row["entropy_rate_micro_nats"] - _tdiv(h_sum, n)) <= 1


# ---------------------------------------------------------------------------
# q377 Theil-Sen slope (median of floored pairwise slopes)
# ---------------------------------------------------------------------------


def test_q377_theil_sen_matches_direct_median(spark):
    row = _q(spark, "q377_theil_sen_trend").collect()[0]
    days = _daily_counts()
    ds = sorted(days)
    slopes = sorted(
        _tdiv(1000 * (days[b] - days[a]), b - a)
        for i, a in enumerate(ds)
        for b in ds[i + 1:]
    )
    n = len(slopes)
    if n % 2:
        med = slopes[n // 2]
    else:
        med = _tdiv(slopes[n // 2 - 1] + slopes[n // 2], 2)
    assert row["n_pairs"] == n
    assert row["sen_slope_milli"] == med


# ---------------------------------------------------------------------------
# q392 Wald-Wolfowitz runs test vs the lower median
# ---------------------------------------------------------------------------


def test_q392_runs_matches_direct_scan(spark):
    row = _q(spark, "q392_runs_test").collect()[0]
    days = _daily_counts()
    ds = sorted(days)
    ordered = sorted((days[d], d) for d in ds)
    med = ordered[(len(ds) + 1) // 2 - 1][0]  # lower median over (y, d)
    signs = [1 if days[d] > med else 0 for d in ds]  # == med counts below
    n1 = sum(signs)
    n2 = len(signs) - n1
    runs = 1 + sum(
        1 for i in range(1, len(signs)) if signs[i] != signs[i - 1]
    )
    n = n1 + n2
    e_r = 1 + 2 * n1 * n2 / n
    var_r = (
        2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
        / (n * n * (n - 1))
    )
    z = (runs - e_r) / math.sqrt(var_r)
    assert row["n_runs"] == runs
    assert row["n_above"] == n1
    assert row["n_below"] == n2
    assert row["expected_runs"] == pytest.approx(e_r, abs=1e-6)
    assert row["z_score"] == pytest.approx(z, abs=2e-6)


# ---------------------------------------------------------------------------
# q400 readability profile (integer Flesch with documented conventions)
# ---------------------------------------------------------------------------


def test_q400_readability_matches_direct_counts(spark):
    rows = {
        r["source"]: r
        for r in _q(spark, "q400_readability_profile").collect()
    }
    docs = _pdf("documents", "source, text")
    per_src: dict[str, list[tuple[int, int, int]]] = {}
    for g, text in zip(docs["source"], docs["text"]):
        toks = re.split(r"\s+", text.strip().lower())
        w = len(toks)
        y = len(re.findall(r"[aeiouy]+", text.lower()))
        cx = sum(
            1 for tk in toks if len(re.findall(r"[aeiouy]+", tk)) >= 3
        )
        per_src.setdefault(g, []).append((w, y, cx))
    for g, triples in per_src.items():
        fl = []
        for w, y, cx in triples:
            s = (w + 14) // 15  # 15-word pseudo-sentences, ceil
            fl.append(206835 - _tdiv(1015 * w, s) - _tdiv(84600 * y, w))
        sw = sum(w for w, _, _ in triples)
        sy = sum(y for _, y, _ in triples)
        scx = sum(cx for _, _, cx in triples)
        row = rows[g]
        assert row["n_docs"] == len(triples)
        assert row["avg_flesch_milli"] == _tdiv(sum(fl), len(fl))
        assert row["syllables_per_word_milli"] == _tdiv(1000 * sy, sw)
        assert row["complex_share_milli"] == _tdiv(1000 * scx, sw)


# ---------------------------------------------------------------------------
# q424 lexical frequency spectrum (hapax, Sichel, Yule's K)
# ---------------------------------------------------------------------------


def test_q424_spectrum_matches_direct_census(spark):
    rows = {
        r["source"]: r for r in _q(spark, "q424_lexical_spectrum").collect()
    }
    docs = _pdf("documents", "source, text")
    freq: dict[str, dict[str, int]] = {}
    for g, text in zip(docs["source"], docs["text"]):
        f = freq.setdefault(g, {})
        for tk in re.split(r"\s+", text.strip().lower()):
            f[tk] = f.get(tk, 0) + 1
    for g, f in freq.items():
        nt = sum(f.values())
        v = len(f)
        v1 = sum(1 for m in f.values() if m == 1)
        v2 = sum(1 for m in f.values() if m == 2)
        sm2 = sum(m * m for m in f.values())
        yk = 10000.0 * (sm2 - nt) / (nt * nt)
        row = rows[g]
        assert row["n_tokens"] == nt
        assert row["vocab"] == v
        assert row["hapax_milli"] == _tdiv(1000 * v1, v)
        assert row["sichel_milli"] == _tdiv(1000 * v2, v)
        assert row["yule_k"] == pytest.approx(yk, abs=1e-3)
