"""Seventh batch of independent brute-force references: q352, q355,
q365 (exact DP), q373, q376, q384, q385, q386, q387.
Independent-math coverage: 69 operators."""

from __future__ import annotations

import hashlib
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


def _events(cols: str, order: str = ""):
    con = duckdb.connect()
    return con.execute(
        f"SELECT {cols} FROM read_parquet('{SF_DIR}/events.parquet')"
        + (f" ORDER BY {order}" if order else "")
    ).df()


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------------------
# q352 token Gini per source (rank-weighted Lorenz identity)
# ---------------------------------------------------------------------------


def test_q352_gini_matches_rank_weighted_sum(spark):
    rows = {
        r["source"]: r
        for r in _q(spark, "q352_token_gini_by_source").collect()
    }
    docs = _pdf("documents", "source, text")
    groups: dict[str, list[int]] = {}
    for g, text in zip(docs["source"], docs["text"]):
        groups.setdefault(g, []).append(
            len(re.split(r"\s+", text.strip().lower()))
        )
    for g, toks in groups.items():
        xs = sorted(toks)
        n, s = len(xs), sum(xs)
        gini = (
            2 * sum((i + 1) * x for i, x in enumerate(xs)) - (n + 1) * s
        ) / (n * s)
        row = rows[g]
        assert row["n_docs"] == n
        assert row["total_tokens"] == s
        assert row["gini"] == pytest.approx(gini, abs=1e-5)


# ---------------------------------------------------------------------------
# q355 Simpson's slope audit (pooled vs within-type OLS slope)
# ---------------------------------------------------------------------------


def test_q355_simpson_slopes_match_direct_ols(spark):
    rows = {
        r["event_type"]: r
        for r in _q(spark, "q355_simpsons_slope_audit").collect()
    }
    ev = _events("event_type, epoch_us(ts) AS us, value")
    pts: dict[str, list[tuple[int, float]]] = {}
    for et, us, val in zip(ev["event_type"], ev["us"], ev["value"]):
        hr = (int(us) % 86_400_000_000) // 3_600_000_000
        pts.setdefault(et, []).append((hr, float(val)))
    allp = [p for ps in pts.values() for p in ps]

    def slope(ps):
        n = len(ps)
        sx = sum(x for x, _ in ps)
        sy = sum(y for _, y in ps)
        sxx = sum(x * x for x, _ in ps)
        sxy = sum(x * y for x, y in ps)
        return (n * sxy - sx * sy) / (n * sxx - sx * sx)

    pooled = slope(allp)
    for et, ps in pts.items():
        row = rows[et]
        gs = slope(ps)
        assert row["n"] == len(ps)
        assert row["group_slope"] == pytest.approx(gs, abs=1e-4)
        assert row["pooled_slope"] == pytest.approx(pooled, abs=1e-4)
        assert row["reversed"] == ((gs > 0) != (pooled > 0))


# ---------------------------------------------------------------------------
# q365 optimal 1-D k-segmentation (exact DP on the integer objective)
# ---------------------------------------------------------------------------


def test_q365_segmentation_matches_direct_dp(spark):
    got = sorted(
        (
            r["seg_id"], r["lo_x"], r["hi_x"], r["n_docs"],
            r["cost_scaled"],
        )
        for r in _q(spark, "q365_optimal_1d_segmentation").collect()
    )
    docs = _pdf("documents", "n_chars")
    cnt: dict[int, int] = {}
    for v in docs["n_chars"]:
        cnt[int(v)] = cnt.get(int(v), 0) + 1
    xs = sorted(cnt)
    v = len(xs)
    p0 = [0] * (v + 1)
    p1 = [0] * (v + 1)
    p2 = [0] * (v + 1)
    for i, x in enumerate(xs, start=1):
        p0[i] = p0[i - 1] + cnt[x]
        p1[i] = p1[i - 1] + cnt[x] * x
        p2[i] = p2[i - 1] + cnt[x] * x * x

    def cost(lo, hi):  # prefix indices, lo exclusive
        w = p0[hi] - p0[lo]
        return (p2[hi] - p2[lo]) * 1000 - _tdiv(
            (p1[hi] - p1[lo]) ** 2 * 1000, w
        )

    k = 4
    inf = float("inf")
    dp = [[inf] * (v + 1) for _ in range(k + 1)]
    arg = [[None] * (v + 1) for _ in range(k + 1)]
    dp[0][0] = 0
    for s in range(1, k + 1):
        for i in range(s, v + 1):
            best = None
            for j in range(s - 1, i):
                if dp[s - 1][j] == inf:
                    continue
                c = dp[s - 1][j] + cost(j, i)
                if best is None or c < best[0]:  # ties keep SMALLER j
                    best = (c, j)
            if best:
                dp[s][i], arg[s][i] = best
    # backtrack
    cuts = [v]
    i = v
    for s in range(k, 0, -1):
        i = arg[s][i]
        cuts.append(i)
    cuts.reverse()
    segs = []
    for sid in range(1, k + 1):
        lo, hi = cuts[sid - 1], cuts[sid]
        segs.append(
            (
                sid,
                xs[lo],  # first value index lo+1 -> xs[lo]
                xs[hi - 1],
                p0[hi] - p0[lo],
                cost(lo, hi),
            )
        )
    assert got == sorted(segs)


# ---------------------------------------------------------------------------
# q373 k-fold CV MAE via complement moments
# ---------------------------------------------------------------------------


def test_q373_kfold_matches_direct_complement_fit(spark):
    rows = {r["fold"]: r for r in _q(spark, "q373_kfold_cv_mae").collect()}
    docs = _pdf("documents", "doc_id, n_chars, text")
    pts = []
    for did, nc, text in zip(docs["doc_id"], docs["n_chars"], docs["text"]):
        fold = _h60(str(int(did))) % 5
        xt = len(re.split(r"\s+", text.strip().lower()))
        pts.append((fold, xt, int(nc)))
    for fold in range(5):
        tr = [(x, y) for f, x, y in pts if f != fold]
        te = [(x, y) for f, x, y in pts if f == fold]
        n = len(tr)
        sx = sum(x for x, _ in tr)
        sy = sum(y for _, y in tr)
        sxx = sum(x * x for x, _ in tr)
        sxy = sum(x * y for x, y in tr)
        dd = n * sxx - sx * sx
        nb = n * sxy - sx * sy
        na = sy * sxx - sx * sxy
        sae = sum(abs(y * dd - (na + nb * x)) for x, y in te)
        row = rows[fold]
        assert row["n_train"] == n
        assert row["n_test"] == len(te)
        assert row["mae_milli"] == _tdiv(
            1000 * _tdiv(sae, len(te)), dd
        )


# ---------------------------------------------------------------------------
# q376 Newman modularity of the label partition on the kNN graph
# ---------------------------------------------------------------------------


def test_q376_modularity_matches_direct_counts(spark):
    from __spark_entry__ import queries

    rows = {
        r["label"]: r for r in _q(spark, "q376_label_modularity").collect()
    }
    edges = queries()["q158_knn_graph"](spark, SF_DIR).collect()
    und = {
        (min(r["src"], r["dst"]), max(r["src"], r["dst"])) for r in edges
    }
    emb = _pdf("embeddings", "vec_id, label")
    lab = {int(v): int(l) for v, l in zip(emb["vec_id"], emb["label"])}
    m = len(und)
    deg: dict[int, int] = {}
    e_within: dict[int, int] = {}
    for u, v in und:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
        if lab[u] == lab[v]:
            e_within[lab[u]] = e_within.get(lab[u], 0) + 1
    d_c: dict[int, int] = {}
    n_nodes: dict[int, int] = {}
    for node, label in lab.items():
        d_c[label] = d_c.get(label, 0) + deg.get(node, 0)
        n_nodes[label] = n_nodes.get(label, 0) + 1
    for label, row in rows.items():
        assert row["n_nodes"] == n_nodes[label]
        assert row["e_within"] == e_within.get(label, 0)
        assert row["degree_sum"] == d_c[label]
        q = e_within.get(label, 0) / m - (d_c[label] / (2 * m)) ** 2
        assert row["q_contrib"] == pytest.approx(q, abs=1e-5)


# ---------------------------------------------------------------------------
# q384 unnormalized Haar energies over the 32-day span
# ---------------------------------------------------------------------------


def test_q384_haar_matches_direct_coefficients(spark):
    rows = {r["level"]: r for r in _q(spark, "q384_haar_energy").collect()}
    days = _daily_counts()
    span = {d: y for d, y in days.items() if 0 <= d <= 31}
    for level in range(1, 6):
        size = 1 << level
        half = size >> 1
        blocks: dict[int, int] = {}
        for d, y in span.items():
            b = d // size
            blocks[b] = blocks.get(b, 0) + (
                y if d % size < half else -y
            )
        row = rows[level]
        assert row["n_blocks"] == len(blocks)
        assert row["energy"] == sum(c * c for c in blocks.values())
        assert row["max_abs_coeff"] == max(abs(c) for c in blocks.values())


# ---------------------------------------------------------------------------
# q385 session-gap sensitivity sweep
# ---------------------------------------------------------------------------


def test_q385_gap_sweep_matches_direct_scan(spark):
    rows = {r["gap_us"]: r for r in _q(spark, "q385_session_gap_sweep").collect()}
    ev = _events(
        "user_id, epoch_us(ts) AS us, event_id", "user_id, us, event_id"
    )
    for gap in (900_000_000, 1_800_000_000, 3_600_000_000):
        starts = 0
        n_events = 0
        prev_user = prev_us = None
        for uid, us in zip(ev["user_id"], ev["us"]):
            n_events += 1
            if prev_user != uid or int(us) - prev_us > gap:
                starts += 1
            prev_user, prev_us = uid, int(us)
        row = rows[gap]
        assert row["n_sessions"] == starts
        assert row["n_events"] == n_events
        assert row["events_per_session_milli"] == _tdiv(
            1000 * n_events, starts
        )


# ---------------------------------------------------------------------------
# q386 simplified silhouette (squared) on the embedding micro-lattice
# ---------------------------------------------------------------------------


def _lattice_points():
    emb = _pdf("embeddings", "vec_id, label, embedding")
    pts = []
    for vid, label, vec in zip(emb["vec_id"], emb["label"], emb["embedding"]):
        qi = [math.floor(float(x) * 1_000_000) for x in vec]
        pts.append((int(vid), int(label), qi))
    return pts


def test_q386_silhouette_matches_direct_moments(spark):
    rows = {
        r["label"]: r for r in _q(spark, "q386_silhouette_sq").collect()
    }
    pts = _lattice_points()
    mom: dict[int, list] = {}
    for _, label, qi in pts:
        m = mom.setdefault(label, [0, [0] * len(qi), 0])
        m[0] += 1
        for i, v in enumerate(qi):
            m[1][i] += v
        m[2] += sum(v * v for v in qi)
    per_label: dict[int, list[int]] = {}
    for _, own, qi in pts:
        x2 = sum(v * v for v in qi)
        a2 = b2 = None
        for c, (n_c, s_c, q_c) in mom.items():
            dot = sum(p * q for p, q in zip(qi, s_c))
            num = n_c * x2 - 2 * dot + q_c
            if c == own:
                a2 = None if n_c == 1 else _tdiv(num, n_c - 1)
            else:
                d2 = _tdiv(num, n_c)
                b2 = d2 if b2 is None else min(b2, d2)
        s = 0 if a2 is None else _tdiv(1000 * (b2 - a2), max(a2, b2))
        per_label.setdefault(own, []).append(s)
    for label, ss in per_label.items():
        row = rows[label]
        assert row["n_points"] == len(ss)
        assert row["avg_silhouette_milli"] == _tdiv(sum(ss), len(ss))


# ---------------------------------------------------------------------------
# q387 Calinski-Harabasz of the label partition
# ---------------------------------------------------------------------------


def test_q387_calinski_harabasz_matches_direct_moments(spark):
    row = _q(spark, "q387_calinski_harabasz").collect()[0]
    pts = _lattice_points()
    mom: dict[int, list] = {}
    for _, label, qi in pts:
        m = mom.setdefault(label, [0, [0] * len(qi), 0])
        m[0] += 1
        for i, v in enumerate(qi):
            m[1][i] += v
        m[2] += sum(v * v for v in qi)
    n = sum(m[0] for m in mom.values())
    k = len(mom)
    q_all = sum(m[2] for m in mom.values())
    cluster_term = sum(
        _tdiv(sum(s * s for s in m[1]), m[0]) for m in mom.values()
    )
    g = [0] * 64
    for m in mom.values():
        for i, s in enumerate(m[1]):
            g[i] += s
    grand_term = _tdiv(sum(v * v for v in g), n)
    w_ssq = q_all - cluster_term
    b_ssq = cluster_term - grand_term
    ch = (b_ssq / (k - 1)) / (w_ssq / (n - k))
    assert row["n_points"] == n
    assert row["n_clusters"] == k
    assert row["w_ssq"] == w_ssq
    assert row["b_ssq"] == b_ssq
    assert row["ch_index"] == pytest.approx(ch, abs=1e-5)
