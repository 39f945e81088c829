"""Third batch of independent brute-force references: q395, q396,
q398, q399, q407, q411, q414, q418, q423 (see test_reference_math_r9.py
for the method). Total independent-math coverage: 30 operators."""

from __future__ import annotations

import math
import re
import statistics

import pytest

from tests.conftest import SF_DIR
from tests.test_reference_math_r9 import (
    _daily_counts,
    _midranks,
    _pdf,
    _q,
    _tdiv,
)


def _milli_score(text: str) -> int:
    toks = re.split(r"\s+", text.strip().lower())
    return (1000 * len(set(toks))) // len(toks)


# ---------------------------------------------------------------------------
# q395 one-way ANOVA + eta^2 on the milli quality score
# ---------------------------------------------------------------------------


def test_q395_anova_matches_direct_decomposition(spark):
    rows = {
        r["source"]: r
        for r in _q(spark, "q395_anova_score_by_source").collect()
    }
    docs = _pdf("documents", "source, text")
    groups: dict[str, list[int]] = {}
    for g, text in zip(docs["source"], docs["text"]):
        groups.setdefault(g, []).append(_milli_score(text))
    allv = [v for vs in groups.values() for v in vs]
    n, k = len(allv), len(groups)
    grand = statistics.fmean(allv)
    ssb = sum(
        len(vs) * (statistics.fmean(vs) - grand) ** 2
        for vs in groups.values()
    )
    sst = sum((v - grand) ** 2 for v in allv)
    ssw = sst - ssb
    f = (ssb / (k - 1)) / (ssw / (n - k))
    for g, vs in groups.items():
        row = rows[g]
        assert row["n_docs"] == len(vs)
        # scores are already milli units: mean is sum DIV n
        assert row["mean_score_milli"] == _tdiv(sum(vs), len(vs))
        assert row["f_stat"] == pytest.approx(f, abs=1e-4)
        assert row["eta_sq"] == pytest.approx(ssb / sst, abs=1e-5)


# ---------------------------------------------------------------------------
# q396 Brown-Forsythe (lower-median-centered Levene)
# ---------------------------------------------------------------------------


def test_q396_brown_forsythe_matches_direct_anova_on_z(spark):
    rows = {
        r["source"]: r for r in _q(spark, "q396_brown_forsythe").collect()
    }
    docs = _pdf("documents", "source, n_chars")
    groups: dict[str, list[int]] = {}
    for g, v in zip(docs["source"], docs["n_chars"]):
        groups.setdefault(g, []).append(int(v))
    zgroups: dict[str, list[int]] = {}
    for g, vs in groups.items():
        s = sorted(vs)
        med = s[(len(s) + 1) // 2 - 1]  # lower median, exact integer
        assert rows[g]["median_chars"] == med
        zgroups[g] = [abs(v - med) for v in vs]
    allz = [z for zs in zgroups.values() for z in zs]
    n, k = len(allz), len(zgroups)
    grand = statistics.fmean(allz)
    ssb = sum(
        len(zs) * (statistics.fmean(zs) - grand) ** 2
        for zs in zgroups.values()
    )
    ssw = sum((z - grand) ** 2 for z in allz) - ssb
    w = (ssb / (k - 1)) / (ssw / (n - k))
    for g, zs in zgroups.items():
        row = rows[g]
        assert row["n_docs"] == len(zs)
        assert row["mean_absdev_milli"] == _tdiv(1000 * sum(zs), len(zs))
        assert row["w_stat"] == pytest.approx(w, abs=1e-4)


# ---------------------------------------------------------------------------
# q398 Fleiss kappa of the three gates
# ---------------------------------------------------------------------------


def test_q398_fleiss_kappa_matches_direct_counts(spark):
    from __spark_entry__ import queries

    row = _q(spark, "q398_fleiss_kappa_gates").collect()[0]
    cands = queries()["q43_lsh_candidate_pairs"](spark, SF_DIR).collect()
    members = {r["doc_a"] for r in cands} | {r["doc_b"] for r in cands}
    docs = _pdf("documents", "doc_id, n_chars, text")
    xs = []
    for did, nc, text in zip(docs["doc_id"], docs["n_chars"], docs["text"]):
        x = (
            (1 if int(nc) >= 300 else 0)
            + (1 if _milli_score(text) >= 460 else 0)
            + (1 if int(did) in members else 0)
        )
        xs.append(x)
    n = len(xs)
    b = sum(xs)
    # per-doc pairwise agreement among 3 raters: agree pairs =
    # C(x,2) + C(3-x,2); P_i = that / C(3,2); P-bar = mean
    a = sum(x * (x - 1) + (3 - x) * (2 - x) for x in xs)
    p_bar = a / (6 * n)
    p1 = b / (3 * n)
    pe = p1 * p1 + (1 - p1) * (1 - p1)
    kappa = (p_bar - pe) / (1 - pe)
    assert row["n_docs"] == n
    assert row["n_positive_ratings"] == b
    assert row["p_bar"] == pytest.approx(p_bar, abs=1e-6)
    assert row["fleiss_kappa"] == pytest.approx(kappa, abs=1e-5)


# ---------------------------------------------------------------------------
# q399 Page trend test over the densified day x event-type blocks
# ---------------------------------------------------------------------------


def test_q399_page_trend_matches_block_midranks(spark):
    from web_scraping_etl_pipeline_spark.plans.common import (
        EVENTS_EPOCH_US,
        US_PER_DAY,
    )
    import duckdb

    rows = {
        r["event_type"]: r
        for r in _q(spark, "q399_page_trend_test").collect()
    }
    con = duckdb.connect()
    ev = con.execute(
        f"SELECT event_type, epoch_us(ts) AS us FROM "
        f"read_parquet('{SF_DIR}/events.parquet')"
    ).df()
    cells: dict[tuple[int, str], int] = {}
    for et, us in zip(ev["event_type"], ev["us"]):
        d = (int(us) - EVENTS_EPOCH_US) // US_PER_DAY
        cells[(d, et)] = cells.get((d, et), 0) + 1
    days = sorted({d for d, _ in cells})
    types = sorted({t for _, t in cells})
    n, k = len(days), len(types)
    rank_sum = {t: 0.0 for t in types}
    for d in days:
        ys = [cells.get((d, t), 0) for t in types]  # densified blocks
        ranks = _midranks(ys)
        for t, y in zip(types, ys):
            rank_sum[t] += ranks[y]
    l_stat = sum(
        (j + 1) * rank_sum[t] for j, t in enumerate(types)
    )
    e_l = n * k * (k + 1) ** 2 / 4.0
    var_l = n * k * k * (k + 1) * (k * k - 1) / 144.0
    z = (l_stat - e_l) / math.sqrt(var_l)
    for j, t in enumerate(types):
        row = rows[t]
        assert row["hyp_order"] == j + 1
        assert row["rank_sum_x2"] == round(2 * rank_sum[t])
        assert row["page_l_x2"] == round(2 * l_stat)
        assert row["page_z"] == pytest.approx(z, abs=2e-6)


# ---------------------------------------------------------------------------
# q407 Mood's median test
# ---------------------------------------------------------------------------


def test_q407_moods_median_matches_direct_contingency(spark):
    rows = {r["source"]: r for r in _q(spark, "q407_moods_median").collect()}
    docs = _pdf("documents", "source, n_chars")
    vals = sorted(int(v) for v in docs["n_chars"])
    n = len(vals)
    med = vals[(n + 1) // 2 - 1]  # lower median
    cells: dict[str, list[int]] = {}
    for g, v in zip(docs["source"], docs["n_chars"]):
        ab = cells.setdefault(g, [0, 0])  # [above, at-or-below]
        ab[0 if int(v) > med else 1] += 1
    k = len(cells)
    tot_above = sum(a for a, _ in cells.values())
    chi2 = 0.0
    for a, le in cells.values():
        m = a + le
        ea = m * tot_above / n
        el = m * (n - tot_above) / n
        chi2 += (a - ea) ** 2 / ea + (le - el) ** 2 / el
    for g, (a, le) in cells.items():
        row = rows[g]
        assert row["grand_median"] == med
        assert row["n_above"] == a
        assert row["n_le"] == le
        assert row["dof"] == k - 1
        assert row["chi2"] == pytest.approx(chi2, abs=2e-2)


# ---------------------------------------------------------------------------
# q411 Grubbs' test for the most deviant day
# ---------------------------------------------------------------------------


def test_q411_grubbs_matches_direct_deviation(spark):
    row = _q(spark, "q411_grubbs_outlier").collect()[0]
    days = _daily_counts()
    ys = [days[d] for d in sorted(days)]
    ybar = statistics.fmean(ys)
    s = statistics.stdev(ys)  # sample std, ddof=1
    peak_day = min(
        sorted(days), key=lambda d: (-abs(days[d] - ybar), d)
    )
    g = abs(days[peak_day] - ybar) / s
    assert row["n_days"] == len(ys)
    assert row["peak_day"] == peak_day
    assert row["peak_count"] == days[peak_day]
    assert row["g_stat"] == pytest.approx(g, abs=1e-5)


# ---------------------------------------------------------------------------
# q414 Jensen-Shannon divergence between src0/src1 token mixes
# ---------------------------------------------------------------------------


def test_q414_jsd_matches_direct_mixture(spark):
    row = _q(spark, "q414_jsd_token_mix").collect()[0]
    docs = _pdf("documents", "source, text")
    ca: dict[str, int] = {}
    cb: dict[str, int] = {}
    for g, text in zip(docs["source"], docs["text"]):
        if g not in ("src0", "src1"):
            continue
        target = ca if g == "src0" else cb
        for tk in re.split(r"\s+", text.strip().lower()):
            target[tk] = target.get(tk, 0) + 1
    na, nb = sum(ca.values()), sum(cb.values())
    vocab = set(ca) | set(cb)
    jsd = 0.0
    for tk in vocab:
        p = ca.get(tk, 0) / na
        q = cb.get(tk, 0) / nb
        m = (p + q) / 2
        if p:
            jsd += 0.5 * p * math.log(p / m)
        if q:
            jsd += 0.5 * q * math.log(q / m)
    assert row["n_tokens_a"] == na
    assert row["n_tokens_b"] == nb
    assert row["vocab"] == len(vocab)
    assert row["jsd_nats"] == pytest.approx(jsd, abs=1e-4)


# ---------------------------------------------------------------------------
# q418 turning-point test
# ---------------------------------------------------------------------------


def test_q418_turning_points_match_direct_scan(spark):
    row = _q(spark, "q418_turning_point_test").collect()[0]
    days = _daily_counts()
    ys = [days[d] for d in sorted(days)]
    n = len(ys)
    tp = sum(
        1
        for t in range(1, n - 1)
        if (ys[t] > ys[t - 1] and ys[t] > ys[t + 1])
        or (ys[t] < ys[t - 1] and ys[t] < ys[t + 1])
    )
    mu = 2 * (n - 2) / 3.0
    z = (tp - mu) / math.sqrt((16 * n - 29) / 90.0)
    assert row["n_days"] == n
    assert row["n_turning_points"] == tp
    assert row["expected_tp"] == pytest.approx(mu, abs=1e-6)
    assert row["z_score"] == pytest.approx(z, abs=2e-6)


# ---------------------------------------------------------------------------
# q423 ICC(1) of the quality score within sources
# ---------------------------------------------------------------------------


def test_q423_icc_matches_direct_mean_squares(spark):
    row = _q(spark, "q423_icc_score_by_source").collect()[0]
    docs = _pdf("documents", "source, text")
    groups: dict[str, list[int]] = {}
    for g, text in zip(docs["source"], docs["text"]):
        groups.setdefault(g, []).append(_milli_score(text))
    sizes = {len(v) for v in groups.values()}
    assert len(sizes) == 1, "balanced design expected at sf0.001"
    m = sizes.pop()
    k = len(groups)
    allv = [v for vs in groups.values() for v in vs]
    grand = statistics.fmean(allv)
    ssb = sum(
        m * (statistics.fmean(vs) - grand) ** 2 for vs in groups.values()
    )
    ssw = sum(
        (v - statistics.fmean(vs)) ** 2
        for vs in groups.values()
        for v in vs
    )
    msb = ssb / (k - 1)
    msw = ssw / (k * (m - 1))
    icc = (msb - msw) / (msb + (m - 1) * msw)
    assert row["k_sources"] == k
    assert row["m_per_source"] == m
    assert row["ms_between"] == pytest.approx(msb, abs=1e-3)
    assert row["ms_within"] == pytest.approx(msw, abs=1e-3)
    assert row["icc1"] == pytest.approx(icc, abs=1e-5)
