"""Ninth batch of independent brute-force references: q313, q317,
q328, q329, q331, q335, q367, q369. Independent-math coverage: 85
operators."""

from __future__ import annotations

import hashlib
import math
import re

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


# ---------------------------------------------------------------------------
# q313 deterministic-Laplace DP histogram
# ---------------------------------------------------------------------------


def test_q313_dp_histogram_matches_direct_inverse_cdf(spark):
    rows = {r["source"]: r for r in _q(spark, "q313_dp_histogram").collect()}
    docs = _pdf("documents", "source")
    counts: dict[str, int] = {}
    for g in docs["source"]:
        counts[g] = counts.get(g, 0) + 1
    for g, n in counts.items():
        u = (_h60(f"dp:{g}") % 1_000_000_000 + 0.5) / 1e9
        sign = -1.0 if u >= 0.5 else 1.0
        noise = sign * math.log(1.0 - 2.0 * abs(u - 0.5))
        row = rows[g]
        assert row["true_n"] == n
        assert row["noise"] == pytest.approx(noise, abs=1e-6)
        assert row["released_n"] == pytest.approx(n + noise, abs=1e-6)


# ---------------------------------------------------------------------------
# q317 interpolated Kneser-Ney bigrams
# ---------------------------------------------------------------------------


def test_q317_kneser_ney_matches_direct_counts(spark):
    got = {
        (r["w1"], r["w2"]): (r["cnt"], r["kn_prob"])
        for r in _q(spark, "q317_kneser_ney_bigrams").collect()
    }
    docs = _pdf("documents", "text")
    c12: dict[tuple[str, str], int] = {}
    for text in docs["text"]:
        toks = re.split(r"\s+", text.strip().lower())
        for a, b in zip(toks, toks[1:]):
            c12[(a, b)] = c12.get((a, b), 0) + 1
    c1: dict[str, int] = {}
    n1f: dict[str, int] = {}
    n1r: dict[str, int] = {}
    for (a, b), c in c12.items():
        c1[a] = c1.get(a, 0) + c
        n1f[a] = n1f.get(a, 0) + 1
        n1r[b] = n1r.get(b, 0) + 1
    nb = len(c12)
    top = sorted(c12, key=lambda k: (-c12[k], k[0], k[1]))[:30]
    assert set(got) == set(top)
    for a, b in top:
        d = 0.75
        p = max(c12[(a, b)] - d, 0.0) / c1[a] + d * n1f[a] / c1[a] * (
            n1r[b] / nb
        )
        cnt, prob = got[(a, b)]
        assert cnt == c12[(a, b)]
        assert prob == pytest.approx(p, abs=1e-5)


# ---------------------------------------------------------------------------
# q328 Efraimidis-Spirakis weighted sample
# ---------------------------------------------------------------------------


def test_q328_weighted_sample_matches_direct_keys(spark):
    got = [
        (r["doc_id"], r["source"], r["weight"], r["sample_key"])
        for r in _q(spark, "q328_weighted_sample").collect()
    ]
    docs = _pdf("documents", "doc_id, source, text")
    keyed = []
    for did, g, text in zip(docs["doc_id"], docs["source"], docs["text"]):
        w = max(_milli_score(text), 1)
        u = (_h60(f"ws:{int(did)}") % (1 << 52) + 0.5) / float(1 << 52)
        keyed.append((int(did), g, w, math.log(u) / w))
    keyed.sort(key=lambda r: (-r[3], r[0]))
    top = keyed[:64]
    assert [(d, g, w) for d, g, w, _ in top] == [
        (d, g, w) for d, g, w, _ in got
    ]
    for (_, _, _, k), (_, _, _, gk) in zip(top, got):
        assert gk == pytest.approx(k, abs=1e-5)


# ---------------------------------------------------------------------------
# q329 Gini stump sweep
# ---------------------------------------------------------------------------


def test_q329_gini_stump_matches_direct_sweep(spark):
    rows = {
        r["threshold_chars"]: r
        for r in _q(spark, "q329_gini_stump_split").collect()
    }
    docs = _pdf("documents", "n_chars, lang")
    bk: dict[int, list[int]] = {}
    for nc, lang in zip(docs["n_chars"], docs["lang"]):
        b = int(nc) // 32
        c = bk.setdefault(b, [0, 0])
        c[0] += 1
        c[1] += 1 if lang == "en" else 0
    n = sum(c for c, _ in bk.values())
    p = sum(q for _, q in bk.values())
    nl = pl = 0
    sweep = {}
    for b in sorted(bk):
        nl += bk[b][0]
        pl += bk[b][1]
        nr, pr = n - nl, p - pl
        if nr <= 0:
            continue
        gini = round(
            (
                (nl - (pl * pl + (nl - pl) ** 2) / nl)
                + (nr - (pr * pr + (nr - pr) ** 2) / nr)
            )
            / n,
            6,
        )
        sweep[(b + 1) * 32] = (nl, pl, nr, pr, gini)
    best = min(g for _, _, _, _, g in sweep.values())
    assert set(rows) == set(sweep)
    for thr, (nl, pl, nr, pr, gini) in sweep.items():
        row = rows[thr]
        assert (row["n_left"], row["pos_left"]) == (nl, pl)
        assert (row["n_right"], row["pos_right"]) == (nr, pr)
        assert row["gini"] == pytest.approx(gini, abs=2e-6)
        assert row["is_best"] == (1 if gini == best else 0)


# ---------------------------------------------------------------------------
# q331 leave-fold-out target encoding
# ---------------------------------------------------------------------------


def test_q331_target_encoding_matches_direct_loo(spark):
    rows = {
        (r["source"], r["fold"]): r
        for r in _q(spark, "q331_target_encoding").collect()
    }
    docs = _pdf("documents", "doc_id, source, text")
    cells: dict[tuple[str, int], list[int]] = {}
    tot_n = 0
    tot_s = 0
    for did, g, text in zip(docs["doc_id"], docs["source"], docs["text"]):
        fold = _h60(f"te:{int(did)}") % 5
        y = _milli_score(text)
        c = cells.setdefault((g, fold), [0, 0])
        c[0] += 1
        c[1] += y
        tot_n += 1
        tot_s += y
    prior = tot_s / tot_n
    src_tot: dict[str, list[int]] = {}
    for (g, _), (nf, sf_) in cells.items():
        c = src_tot.setdefault(g, [0, 0])
        c[0] += nf
        c[1] += sf_
    for (g, fold), (nf, sf_) in cells.items():
        n_out = src_tot[g][0] - nf
        s_out = src_tot[g][1] - sf_
        row = rows[(g, fold)]
        assert row["n_in_fold"] == nf
        assert row["n_out_fold"] == n_out
        if n_out > 0:
            assert row["enc_raw"] == pytest.approx(s_out / n_out, abs=1e-5)
        else:
            assert row["enc_raw"] is None
        assert row["enc_smoothed"] == pytest.approx(
            (s_out + 20 * prior) / (n_out + 20), abs=1e-5
        )


# ---------------------------------------------------------------------------
# q335 classical period-7 seasonal decomposition
# ---------------------------------------------------------------------------


def test_q335_decomposition_matches_direct_ma(spark):
    rows = {
        r["day_idx"]: r
        for r in _q(spark, "q335_seasonal_decomposition").collect()
    }
    days = _daily_counts()
    ds = sorted(days)
    det: dict[int, int] = {}
    trend: dict[int, float] = {}
    for d in ds:
        win = [days[x] for x in ds if d - 3 <= x <= d + 3]
        if len(win) == 7:
            trend[d] = sum(win) / 7.0
            det[d] = 7 * days[d] - sum(win)
    snum: dict[int, int] = {}
    sden: dict[int, int] = {}
    for d, v in det.items():
        ph = d % 7
        snum[ph] = snum.get(ph, 0) + v
        sden[ph] = sden.get(ph, 0) + 7
    for d in ds:
        row = rows[d]
        ph = d % 7
        seasonal = snum[ph] / sden[ph]
        assert row["phase"] == ph
        assert row["seasonal"] == pytest.approx(seasonal, abs=1e-5)
        if d in trend:
            assert row["trend"] == pytest.approx(trend[d], abs=1e-5)
            assert row["residual"] == pytest.approx(
                days[d] - trend[d] - seasonal, abs=1e-5
            )
        else:
            assert row["trend"] is None
            assert row["residual"] is None


# ---------------------------------------------------------------------------
# q367 McNemar between the repetition and stopword gates
# ---------------------------------------------------------------------------

_STOPS = {"the", "a", "of", "and", "to", "in", "is", "it", "for", "on"}


def test_q367_mcnemar_matches_direct_cells(spark):
    row = _q(spark, "q367_mcnemar_gates").collect()[0]
    docs = _pdf("documents", "text")
    a = b = c = d = 0
    for text in docs["text"]:
        toks = re.split(r"\s+", text.strip().lower())
        nt = len(toks)
        pa = (1000 * len(set(toks))) // nt >= 500
        ns = sum(1 for t in toks if t in _STOPS)
        pb = (1000 * ns) // nt >= 100
        if pa and pb:
            a += 1
        elif pa:
            b += 1
        elif pb:
            c += 1
        else:
            d += 1
    n = a + b + c + d
    chi2 = (abs(b - c) - 1) ** 2 / (b + c)
    assert (row["a"], row["b"], row["c"], row["d"]) == (a, b, c, d)
    assert row["agree_rate"] == pytest.approx((a + d) / n, abs=1e-6)
    assert row["mcnemar_chi2"] == pytest.approx(chi2, abs=1e-5)


# ---------------------------------------------------------------------------
# q369 Shapley attribution over gate coalitions (first principles)
# ---------------------------------------------------------------------------


def test_q369_shapley_matches_ordering_enumeration(spark):
    from itertools import permutations

    rows = {r["gate"]: r for r in _q(spark, "q369_gate_shapley").collect()}
    docs = _pdf("documents", "text")
    gates = []
    for text in docs["text"]:
        toks = re.split(r"\s+", text.strip().lower())
        nt, nd = len(toks), len(set(toks))
        ns = sum(1 for t in toks if t in _STOPS)
        gates.append(
            (
                20 <= nt <= 80,
                5 * nd >= 2 * nt,
                50 * ns >= nt,
            )
        )

    def v(subset):  # docs passing ALL gates in subset (v(empty)=all)
        return sum(
            1 for g in gates if all(g[i] for i in subset)
        )

    names = {0: "len", 1: "repetition", 2: "stopword"}
    phi6 = {0: 0, 1: 0, 2: 0}
    for order in permutations(range(3)):
        s: set[int] = set()
        prev = v(s)
        for g in order:
            s = s | {g}
            cur = v(s)
            phi6[g] += cur - prev
            prev = cur
    for i, name in names.items():
        row = rows[name]
        assert row["v_alone"] == v({i})
        assert row["phi_sixths"] == phi6[i]
        assert row["phi_milli"] == _tdiv(1000 * phi6[i], 6)
    # efficiency: contributions sum to v(N) - v(empty)
    assert sum(phi6.values()) == 6 * (v({0, 1, 2}) - v(set()))
