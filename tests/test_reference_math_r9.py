"""Independent brute-force references for the round-7/8 statistical
operators (VERDICT r8 item 2).

The DuckDB oracle twins share each query's FORMULA, so a green oracle
row proves engine agreement, not correct math (the q393 Friedman bug
class). Each test here recomputes the statistic from the raw parquet
with a deliberately NAIVE, from-scratch algorithm - per-observation
midranks from a sorted list instead of census windows, O(n^2) pair
loops instead of folds, float OLS instead of integer-cleared
residuals - and pins the Spark result against it at sf0.001.

Tolerances: the engines micro-quantize cross-row folds (1e-6 units)
and round outputs at 4-6 dp, so float references compare with
pytest.approx at ~1e-3..1e-5 of the statistic; all COUNT-like columns
compare exactly.
"""

from __future__ import annotations

import math
import re
import statistics

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


def _tdiv(a: int, b: int) -> int:
    """Truncating integer division (Spark DIV / DuckDB // semantics;
    Python's // floors, which differs on negatives)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _midranks(values):
    """value -> average (mid) rank, 1-based, from a plain sort."""
    s = sorted(values)
    first = {}
    for i, v in enumerate(s):
        first.setdefault(v, i + 1)
    count = {}
    for v in s:
        count[v] = count.get(v, 0) + 1
    return {v: first[v] + (count[v] - 1) / 2.0 for v in count}


def _daily_counts():
    """day index -> event count, from raw epoch microseconds."""
    from web_scraping_etl_pipeline_spark.plans.common import (
        EVENTS_EPOCH_US,
        US_PER_DAY,
    )

    con = duckdb.connect()
    us = con.execute(
        f"SELECT epoch_us(ts) AS us FROM "
        f"read_parquet('{SF_DIR}/events.parquet')"
    ).df()["us"]
    days = {}
    for u in us:
        d = (int(u) - EVENTS_EPOCH_US) // US_PER_DAY
        days[d] = days.get(d, 0) + 1
    return days


# ---------------------------------------------------------------------------
# q394 Kruskal-Wallis (tie-corrected H)
# ---------------------------------------------------------------------------


def test_q394_kruskal_wallis_matches_midrank_bruteforce(spark):
    rows = {r["source"]: r for r in _q(spark, "q394_kruskal_wallis").collect()}
    docs = _pdf("documents", "source, n_chars")
    vals = [int(v) for v in docs["n_chars"]]
    ranks = _midranks(vals)
    groups: dict[str, list[int]] = {}
    for g, v in zip(docs["source"], docs["n_chars"]):
        groups.setdefault(g, []).append(int(v))
    n = len(vals)
    h = (
        12.0 / (n * (n + 1))
        * sum(
            sum(ranks[v] for v in vs) ** 2 / len(vs)
            for vs in groups.values()
        )
        - 3.0 * (n + 1)
    )
    cnt = {}
    for v in vals:
        cnt[v] = cnt.get(v, 0) + 1
    tie = sum(c**3 - c for c in cnt.values())
    hc = h / (1.0 - tie / (n**3 - n))
    for g, vs in groups.items():
        row = rows[g]
        assert row["n_docs"] == len(vs)
        # doubled midranks are exact integers -> exact floor milli
        r2 = round(2 * sum(ranks[v] for v in vs))
        assert row["mean_rank_milli"] == _tdiv(1000 * r2, 2 * len(vs))
        # H is shared across rows; k-term DIV quantization <= k/1000
        assert row["h"] == pytest.approx(h, abs=1e-3)
        assert row["h_tie_corrected"] == pytest.approx(hc, abs=1e-3)


# ---------------------------------------------------------------------------
# q403 / q417 Mann-Kendall (plain + seasonal, tie-corrected variance)
# ---------------------------------------------------------------------------


def _mk_stats(series):
    """(S, var18) for one ordered series, O(n^2) pairs + tie census."""
    s = 0
    for i in range(len(series)):
        for j in range(i + 1, len(series)):
            s += (series[j] > series[i]) - (series[j] < series[i])
    cnt = {}
    for y in series:
        cnt[y] = cnt.get(y, 0) + 1
    n = len(series)
    tsum = sum(c * (c - 1) * (2 * c + 5) for c in cnt.values())
    return s, n * (n - 1) * (2 * n + 5) - tsum


def _mk_z(s, var18):
    sd = math.sqrt(var18 / 18.0)
    if s > 0:
        return (s - 1.0) / sd
    if s < 0:
        return (s + 1.0) / sd
    return 0.0


def test_q403_mann_kendall_matches_pairwise_bruteforce(spark):
    row = _q(spark, "q403_mann_kendall").collect()[0]
    days = _daily_counts()
    series = [days[d] for d in sorted(days)]
    s, v18 = _mk_stats(series)
    assert row["n_days"] == len(series)
    assert row["s_stat"] == s
    assert row["var_s_x18"] == v18
    assert row["z_score"] == pytest.approx(_mk_z(s, v18), abs=2e-6)


def test_q417_seasonal_mann_kendall_matches_stratified_bruteforce(spark):
    row = _q(spark, "q417_seasonal_mann_kendall").collect()[0]
    days = _daily_counts()
    s_tot, v_tot, seasons = 0, 0, set()
    for wd in range(7):
        series = [days[d] for d in sorted(days) if d % 7 == wd]
        if not series:
            continue
        seasons.add(wd)
        s, v18 = _mk_stats(series)
        s_tot += s
        v_tot += v18
    assert row["n_seasons"] == len(seasons)
    assert row["s_stat"] == s_tot
    assert row["var_s_x18"] == v_tot
    assert row["z_score"] == pytest.approx(_mk_z(s_tot, v_tot), abs=2e-6)


# ---------------------------------------------------------------------------
# q405 Welch t-test (Welch-Satterthwaite df)
# ---------------------------------------------------------------------------


def test_q405_welch_matches_direct_moments(spark):
    row = _q(spark, "q405_welch_ttest").collect()[0]
    docs = _pdf("documents", "source, n_chars")
    a = [int(v) for g, v in zip(docs["source"], docs["n_chars"]) if g == "src0"]
    b = [int(v) for g, v in zip(docs["source"], docs["n_chars"]) if g == "src1"]
    va, vb = statistics.variance(a), statistics.variance(b)
    ma, mb = statistics.fmean(a), statistics.fmean(b)
    n0, n1 = len(a), len(b)
    se2 = va / n0 + vb / n1
    t = (ma - mb) / math.sqrt(se2)
    df = se2**2 / (
        (va / n0) ** 2 / (n0 - 1) + (vb / n1) ** 2 / (n1 - 1)
    )
    d = (ma - mb) / math.sqrt(
        ((n0 - 1) * va + (n1 - 1) * vb) / (n0 + n1 - 2)
    )
    assert row["n0"] == n0 and row["n1"] == n1
    assert row["mean0_milli"] == _tdiv(1000 * sum(a), n0)
    assert row["mean1_milli"] == _tdiv(1000 * sum(b), n1)
    assert row["t_welch"] == pytest.approx(t, abs=1e-5)
    assert row["df_welch"] == pytest.approx(df, abs=1e-3)
    assert row["cohens_d"] == pytest.approx(d, abs=1e-5)


# ---------------------------------------------------------------------------
# q412 Cochran-Mantel-Haenszel (continuity-corrected chi2 + MH OR)
# ---------------------------------------------------------------------------


def test_q412_cmh_matches_per_stratum_bruteforce(spark):
    row = _q(spark, "q412_cmh_gate_association").collect()[0]
    docs = _pdf("documents", "source, text")
    cells: dict[str, list[int]] = {}
    for src, text in zip(docs["source"], docs["text"]):
        toks = re.split(r"\s+", text.strip().lower())
        nt, nd = len(toks), len(set(toks))
        ga = 1 if 20 <= nt <= 80 else 0
        gb = 1 if 5 * nd >= 2 * nt else 0
        cell = cells.setdefault(src, [0, 0, 0, 0])  # a b c d
        cell[(1 - ga) * 2 + (1 - gb)] += 1
    dev = var = ad = bc = 0.0
    for a, b, c, d in cells.values():
        n = a + b + c + d
        dev += a - (a + b) * (a + c) / n
        var += (a + b) * (c + d) * (a + c) * (b + d) / (n * n * (n - 1))
        ad += a * d / n
        bc += b * c / n
    chi2 = (abs(dev) - 0.5) ** 2 / var
    assert row["n_strata"] == len(cells)
    assert row["chi2_cmh"] == pytest.approx(chi2, abs=2e-3)
    assert row["or_mh"] == pytest.approx(ad / bc, abs=1e-4)


# ---------------------------------------------------------------------------
# q413 log-rank on time-to-first-purchase (A/A parity split)
# ---------------------------------------------------------------------------


def test_q413_logrank_matches_risk_table_bruteforce(spark):
    from web_scraping_etl_pipeline_spark.plans.common import (
        EVENTS_EPOCH_US,
        US_PER_DAY,
    )

    row = _q(spark, "q413_logrank_conversion").collect()[0]
    con = duckdb.connect()
    ev = con.execute(
        f"SELECT user_id, event_type, epoch_us(ts) AS us FROM "
        f"read_parquet('{SF_DIR}/events.parquet')"
    ).df()
    per_user: dict[int, dict] = {}
    for uid, et, us in zip(ev["user_id"], ev["event_type"], ev["us"]):
        d = (int(us) - EVENTS_EPOCH_US) // US_PER_DAY
        u = per_user.setdefault(int(uid), {"f": d, "l": d, "p": None})
        u["f"] = min(u["f"], d)
        u["l"] = max(u["l"], d)
        if et == "purchase" and (u["p"] is None or d < u["p"]):
            u["p"] = d
    obs = []  # (t, event?, group)
    for uid, u in per_user.items():
        end = u["p"] if u["p"] is not None else u["l"]
        obs.append((end - u["f"], u["p"] is not None, uid % 2))
    n1 = sum(1 for _, _, g in obs if g == 1)
    n0 = len(obs) - n1
    o1 = e1 = v = 0.0
    for tt in sorted({t for t, _, _ in obs}):
        r1 = sum(1 for t, _, g in obs if t >= tt and g == 1)
        r = sum(1 for t, _, _ in obs if t >= tt)
        d1 = sum(1 for t, e, g in obs if t == tt and e and g == 1)
        d = sum(1 for t, e, _ in obs if t == tt and e)
        o1 += d1
        if r > 0 and d > 0:
            e1 += d * r1 / r
        if r > 1 and d > 0:
            v += d * (r1 / r) * (1 - r1 / r) * (r - d) / (r - 1)
    assert row["n_odd"] == n1 and row["n_even"] == n0
    assert row["conversions_odd"] == o1
    assert row["chi2_logrank"] == pytest.approx(
        (o1 - e1) ** 2 / v, abs=2e-3
    )


# ---------------------------------------------------------------------------
# q420 Wilcoxon signed-rank (week-lag pairs, textbook variance)
# ---------------------------------------------------------------------------


def test_q420_wilcoxon_matches_textbook_bruteforce(spark):
    row = _q(spark, "q420_wilcoxon_signed_rank").collect()[0]
    days = _daily_counts()
    diffs = [
        days[d] - days[d - 7]
        for d in sorted(days)
        if d - 7 in days and days[d] != days[d - 7]
    ]
    ranks = _midranks([abs(x) for x in diffs])
    w_plus = sum(ranks[abs(x)] for x in diffs if x > 0)
    n = len(diffs)
    cnt = {}
    for x in diffs:
        cnt[abs(x)] = cnt.get(abs(x), 0) + 1
    var = n * (n + 1) * (2 * n + 1) / 24.0 - sum(
        c**3 - c for c in cnt.values()
    ) / 48.0
    z = (w_plus - n * (n + 1) / 4.0) / math.sqrt(var)
    assert row["n_pairs"] == n
    assert row["w_plus_x2"] == round(2 * w_plus)
    assert row["z_score"] == pytest.approx(z, abs=2e-6)


# ---------------------------------------------------------------------------
# q436 Tukey studentized-range gaps (balanced design)
# ---------------------------------------------------------------------------


def _milli_score(text: str) -> int:
    toks = re.split(r"\s+", text.strip().lower())
    return (1000 * len(set(toks))) // len(toks)


def test_q436_tukey_matches_direct_msw(spark):
    got = [
        (r["src_a"], r["src_b"], r["mean_diff_milli"], r["q_stat"])
        for r in _q(spark, "q436_tukey_pairwise_gaps").collect()
    ]
    docs = _pdf("documents", "source, text")
    groups: dict[str, list[int]] = {}
    for g, text in zip(docs["source"], docs["text"]):
        groups.setdefault(g, []).append(_milli_score(text))
    sizes = {len(v) for v in groups.values()}
    assert len(sizes) == 1, "balanced design expected at sf0.001"
    m = sizes.pop()
    k = len(groups)
    # mean square within, straight from per-group sample variances
    msw = sum(statistics.variance(vs) for vs in groups.values()) / k
    pairs = []
    names = sorted(groups)
    for i, ga in enumerate(names):
        for gb in names[i + 1:]:
            sa, sb = sum(groups[ga]), sum(groups[gb])
            q = abs(sa - sb) / m / math.sqrt(msw / m)
            pairs.append((ga, gb, _tdiv(1000 * (sa - sb), m), q))
    pairs.sort(key=lambda p: (-p[3], p[0], p[1]))
    assert len(got) == 10
    for (ga, gb, md, q), (xa, xb, xmd, xq) in zip(pairs[:10], got):
        assert (ga, gb, md) == (xa, xb, xmd)
        assert xq == pytest.approx(q, abs=1e-5)


# ---------------------------------------------------------------------------
# q437 Chow structural-break F (float OLS per segment)
# ---------------------------------------------------------------------------


def _ols_sse(pts):
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    alpha = (sy - beta * sx) / n
    return sum((y - alpha - beta * x) ** 2 for x, y in pts)


def test_q437_chow_matches_float_ols(spark):
    row = _q(spark, "q437_chow_break_test").collect()[0]
    days = _daily_counts()
    pts = [(d, days[d]) for d in sorted(days)]
    p1 = [(d, y) for d, y in pts if d < 15]
    p2 = [(d, y) for d, y in pts if d >= 15]
    sse_p, sse_1, sse_2 = _ols_sse(pts), _ols_sse(p1), _ols_sse(p2)
    f = ((sse_p - sse_1 - sse_2) / 2.0) / (
        (sse_1 + sse_2) / (len(pts) - 4)
    )
    assert row["n_days"] == len(pts)
    assert row["n_before"] == len(p1)
    assert row["n_after"] == len(p2)
    assert row["chow_f"] == pytest.approx(f, rel=1e-6, abs=1e-5)


# ---------------------------------------------------------------------------
# q439 Brunner-Munzel (per-observation midranks, scipy formulation)
# ---------------------------------------------------------------------------


def test_q439_brunner_munzel_matches_placement_bruteforce(spark):
    row = _q(spark, "q439_brunner_munzel").collect()[0]
    docs = _pdf("documents", "source, n_chars")
    g0 = [int(v) for g, v in zip(docs["source"], docs["n_chars"]) if g == "src0"]
    g1 = [int(v) for g, v in zip(docs["source"], docs["n_chars"]) if g == "src1"]
    n0, n1 = len(g0), len(g1)
    rall = _midranks(g0 + g1)
    r0 = _midranks(g0)
    r1 = _midranks(g1)
    pl0 = [rall[v] - r0[v] for v in g0]  # placements
    pl1 = [rall[v] - r1[v] for v in g1]
    m0, m1 = statistics.fmean(pl0), statistics.fmean(pl1)
    s0 = statistics.variance(pl0)
    s1 = statistics.variance(pl1)
    mean_r1 = statistics.fmean(rall[v] for v in g1)
    mean_r0 = statistics.fmean(rall[v] for v in g0)
    p_hat = (mean_r1 - (n1 + 1) / 2.0) / n0
    w = (
        n0 * n1 * (mean_r1 - mean_r0)
        / (n0 + n1)
        / math.sqrt(n0 * s0 + n1 * s1)
    )
    assert row["n0"] == n0 and row["n1"] == n1
    assert row["p_hat"] == pytest.approx(p_hat, abs=1e-5)
    assert row["w_bm"] == pytest.approx(w, abs=1e-5)


# ---------------------------------------------------------------------------
# q380 Holt-Winters (plain float recursion, alpha=beta=gamma=1/2)
# ---------------------------------------------------------------------------


def test_q380_holt_winters_matches_float_recursion(spark):
    rows = {
        r["day_idx"]: r for r in _q(spark, "q380_holt_winters").collect()
    }
    days = _daily_counts()
    idx = sorted(days)
    ys = [days[d] for d in idx]
    p = 7
    # warm-up: engine carries micro-quantized integers with trunc DIV;
    # replicate the warm-up exactly (integers) but run the RECURSION
    # in the same trunc-div integer arithmetic a naive reimplementation
    # of the documented formulas produces - this is an independent
    # implementation of the documented micro-integer recursion, not a
    # copy of the SQL (written from the docstring's formulas).
    l = _tdiv(sum(ys[:p]) * 1_000_000, p)
    seas = [y * 1_000_000 - l for y in ys[:p]]
    b = 0
    for t in range(p, len(ys)):
        y = ys[t] * 1_000_000
        s0 = seas[0]
        l_new = _tdiv(y - s0, 2) + _tdiv(l + b, 2)
        b_new = _tdiv(l_new - l, 2) + _tdiv(b, 2)
        s_new = _tdiv(y - l_new, 2) + _tdiv(s0, 2)
        err = abs(y - (l + b + s0))
        seas = seas[1:] + [s_new]
        l, b = l_new, b_new
        r = rows[idx[t]]
        assert r["y"] == ys[t]
        assert r["l_micro"] == l
        assert r["b_micro"] == b
        assert r["season_micro"] == s_new
        assert r["err_micro"] == err
    # float recursion cross-check: the micro-integer level tracks the
    # exact float HW level to < 1e-4 absolute (accumulated trunc error
    # is bounded by steps * 1 micro-unit)
    lf = sum(ys[:p]) / p
    seasf = [y - lf for y in ys[:p]]
    bf = 0.0
    for t in range(p, len(ys)):
        y = ys[t]
        lf_new = (y - seasf[0]) / 2 + (lf + bf) / 2
        bf_new = (lf_new - lf) / 2 + bf / 2
        seasf = seasf[1:] + [(y - lf_new) / 2 + seasf[0] / 2]
        lf, bf = lf_new, bf_new
    assert rows[idx[-1]]["l_micro"] / 1_000_000 == pytest.approx(
        lf, abs=1e-4
    )


# ---------------------------------------------------------------------------
# q432 Kendall's W (densified design; ADVICE r8 sparse-cell guard)
# ---------------------------------------------------------------------------


def _kendalls_w(cells: dict[tuple[int, int], int]):
    """Brute-force tie-corrected W from a (judge, wd) -> count dict,
    densifying missing cells with y = 0 before ranking."""
    judges = sorted({j for j, _ in cells})
    wds = sorted({w for _, w in cells})
    k, n = len(judges), len(wds)
    col = {w: 0.0 for w in wds}
    tt = 0
    for j in judges:
        ys = [cells.get((j, w), 0) for w in wds]
        ranks = _midranks(ys)
        for w, y in zip(wds, ys):
            col[w] += ranks[y]
        cnt = {}
        for y in ys:
            cnt[y] = cnt.get(y, 0) + 1
        tt += sum(c**3 - c for c in cnt.values())
    s = sum((r - k * (n + 1) / 2.0) ** 2 for r in col.values())
    w_stat = 12.0 * s / (k * k * (n**3 - n) - k * tt)
    return k, n, w_stat, k * (n - 1) * w_stat


def test_q432_kendalls_w_matches_bruteforce(spark):
    from web_scraping_etl_pipeline_spark.plans.common import (
        EVENTS_EPOCH_US,
        US_PER_DAY,
    )

    row = _q(spark, "q432_kendalls_w_weekday").collect()[0]
    con = duckdb.connect()
    ev = con.execute(
        f"SELECT user_id, epoch_us(ts) AS us FROM "
        f"read_parquet('{SF_DIR}/events.parquet')"
    ).df()
    cells: dict[tuple[int, int], int] = {}
    for uid, us in zip(ev["user_id"], ev["us"]):
        j = int(uid) % 20
        wd = (int(us) - EVENTS_EPOCH_US) // US_PER_DAY % 7
        cells[(j, wd)] = cells.get((j, wd), 0) + 1
    k, n, w_stat, chi2 = _kendalls_w(cells)
    assert row["k_judges"] == k and row["n_weekdays"] == n
    assert row["w"] == pytest.approx(w_stat, abs=1e-5)
    assert row["chi2_equiv"] == pytest.approx(chi2, abs=1e-3)


def test_q432_densifies_missing_cells(spark, tmp_path):
    # a judge with ZERO events on one weekday must be ranked as a
    # zero-activity day, not silently dropped (ADVICE r8): build a
    # tiny events table where judge 2 never acts on weekday 6 and pin
    # the engine against the densified brute force.
    import datetime

    base = datetime.datetime(2024, 1, 1)  # day 0 == weekday stratum 0
    rows = []
    for j in (0, 1, 2):
        for wd in range(7):
            if j == 2 and wd == 6:
                continue
            for _ in range((j + 2) * (wd + 1) % 5 + 1):
                rows.append((j, base + datetime.timedelta(days=wd)))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    out = _q_on(spark, "q432_kendalls_w_weekday", str(tmp_path))
    row = out.collect()[0]
    cells: dict[tuple[int, int], int] = {}
    for j, ts in rows:
        wd = (ts - base).days % 7
        cells[(j, wd)] = cells.get((j, wd), 0) + 1
    assert (2, 6) not in cells  # the sparse cell really is absent
    k, n, w_stat, chi2 = _kendalls_w(cells)
    assert row["k_judges"] == k == 3
    assert row["n_weekdays"] == n == 7
    assert row["w"] == pytest.approx(w_stat, abs=1e-5)
    assert row["chi2_equiv"] == pytest.approx(chi2, abs=1e-3)


def _q_on(spark, name, sf_dir):
    from __spark_entry__ import queries

    return queries()[name](spark, sf_dir)
