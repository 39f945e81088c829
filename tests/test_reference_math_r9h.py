"""Eighth batch of independent brute-force references: q344, q345,
q358, q362, q379, q381, q388, q389. Independent-math coverage: 77
operators."""

from __future__ import annotations

import hashlib
import math
import re

import duckdb
import pytest

from tests.conftest import SF_DIR
from tests.test_reference_math_r9 import _pdf, _q, _tdiv
from tests.test_reference_math_r9g import _lattice_points


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _doc_tokens():
    docs = _pdf("documents", "doc_id, text")
    return {
        int(d): re.split(r"\s+", t.strip().lower())
        for d, t in zip(docs["doc_id"], docs["text"])
    }


# ---------------------------------------------------------------------------
# q344 feature-hashing collision audit
# ---------------------------------------------------------------------------


def test_q344_feature_hash_matches_direct_buckets(spark):
    rows = {
        r["terms_in_bucket"]: r
        for r in _q(spark, "q344_feature_hash_audit").collect()
    }
    tf: dict[str, int] = {}
    for toks in _doc_tokens().values():
        for tk in toks:
            tf[tk] = tf.get(tk, 0) + 1
    buckets: dict[int, list[int]] = {}
    for term, freq in tf.items():
        b = _h60(f"fh|{term}") % 16
        sign = 1 if _h60(f"sg|{term}") % 2 == 0 else -1
        x = buckets.setdefault(b, [0, 0, 0])  # n_terms, mass, net
        x[0] += 1
        x[1] += freq
        x[2] += sign * freq
    v = sum(x[0] for x in buckets.values())
    used = len(buckets)
    total_mass = sum(x[1] for x in buckets.values())
    collided = sum(x[1] for x in buckets.values() if x[0] > 1)
    by_card: dict[int, list[int]] = {}
    for n_terms, mass, net in buckets.values():
        c = by_card.setdefault(n_terms, [0, 0, 0])
        c[0] += 1
        c[1] += mass
        c[2] += abs(net)
    for card, (nb, mass, surv) in by_card.items():
        row = rows[card]
        assert row["n_buckets"] == nb
        assert row["mass"] == mass
        assert row["surviving_mass"] == surv
        assert row["collision_milli"] == _tdiv(1000 * (v - used), v)
        assert row["collided_mass_milli"] == _tdiv(
            1000 * collided, total_mass
        )


# ---------------------------------------------------------------------------
# q345 Gries' DP dispersion for the top-30 terms
# ---------------------------------------------------------------------------


def test_q345_dispersion_matches_direct_deviations(spark):
    rows = {r["term"]: r for r in _q(spark, "q345_term_dispersion").collect()}
    docs = _pdf("documents", "source, text")
    st: dict[tuple[str, str], int] = {}
    for g, text in zip(docs["source"], docs["text"]):
        for tk in re.split(r"\s+", text.strip().lower()):
            st[(g, tk)] = st.get((g, tk), 0) + 1
    srcs: dict[str, int] = {}
    terms: dict[str, int] = {}
    for (g, tk), c in st.items():
        srcs[g] = srcs.get(g, 0) + c
        terms[tk] = terms.get(tk, 0) + c
    tt = sum(srcs.values())
    top = sorted(terms, key=lambda t: (-terms[t], t))[:30]
    assert set(rows) == set(top)
    for term in top:
        ci = terms[term]
        dev = sum(
            abs(st.get((g, term), 0) * tt - ts * ci)
            for g, ts in srcs.items()
        )
        assert rows[term]["freq"] == ci
        assert rows[term]["dp_micro"] == _tdiv(1_000_000 * dev, 2 * ci * tt)


# ---------------------------------------------------------------------------
# q358 a-priori triples + q381 association rules
# ---------------------------------------------------------------------------


def _apriori():
    toks = _doc_tokens()
    n_docs = len(toks)
    doc_sets = {d: set(ts) for d, ts in toks.items()}
    df: dict[str, int] = {}
    for s in doc_sets.values():
        for tk in s:
            df[tk] = df.get(tk, 0) + 1
    vocab = set(sorted(df, key=lambda t: (-df[t], t))[:25])
    sets = {d: sorted(s & vocab) for d, s in doc_sets.items()}
    minsup = (57 * n_docs) // 100
    sup1: dict[str, int] = {}
    sup2: dict[tuple[str, str], int] = {}
    sup3: dict[tuple[str, str, str], int] = {}
    for s in sets.values():
        for i, t1 in enumerate(s):
            sup1[t1] = sup1.get(t1, 0) + 1
            for j in range(i + 1, len(s)):
                sup2[(t1, s[j])] = sup2.get((t1, s[j]), 0) + 1
    fp = {p for p, c in sup2.items() if c >= minsup}
    for s in sets.values():
        for i, t1 in enumerate(s):
            for j in range(i + 1, len(s)):
                if (t1, s[j]) not in fp:
                    continue
                for k in range(j + 1, len(s)):
                    if (t1, s[k]) in fp and (s[j], s[k]) in fp:
                        key = (t1, s[j], s[k])
                        sup3[key] = sup3.get(key, 0) + 1
    tri = {k: c for k, c in sup3.items() if c >= minsup}
    return n_docs, sup1, sup2, tri


def test_q358_apriori_matches_direct_enumeration(spark):
    got = {
        (r["t1"], r["t2"], r["t3"]): (r["support"], r["support_frac"])
        for r in _q(spark, "q358_apriori_triples").collect()
    }
    n_docs, _, _, tri = _apriori()
    assert set(got) == set(tri)
    for k, c in tri.items():
        sup, frac = got[k]
        assert sup == c
        assert frac == pytest.approx(c / n_docs, abs=1e-6)


def test_q381_rules_match_direct_rotations(spark):
    got = {
        (r["ant1"], r["ant2"], r["cons"]): (
            r["sup_abc"], r["confidence"], r["lift"],
        )
        for r in _q(spark, "q381_association_rules").collect()
    }
    n_docs, sup1, sup2, tri = _apriori()
    expected = {}
    for (t1, t2, t3), c in tri.items():
        for ant, cons in (
            ((t1, t2), t3), ((t1, t3), t2), ((t2, t3), t1),
        ):
            sa = sup2[ant]
            if 100 * c >= 87 * sa:
                expected[(ant[0], ant[1], cons)] = (
                    c, c / sa, c * n_docs / (sa * sup1[cons]),
                )
    assert set(got) == set(expected)
    for k, (c, conf, lift) in expected.items():
        gc, gconf, glift = got[k]
        assert gc == c
        assert gconf == pytest.approx(conf, abs=1e-6)
        assert glift == pytest.approx(lift, abs=1e-5)


# ---------------------------------------------------------------------------
# q362 greedy k-center (farthest-first traversal)
# ---------------------------------------------------------------------------


def test_q362_kcenter_matches_direct_greedy(spark):
    got = [
        (r["step"], r["center_id"], r["radius_sq"])
        for r in sorted(
            _q(spark, "q362_kcenter_coreset").collect(),
            key=lambda r: r["step"],
        )
    ]
    pts = {vid: qi for vid, _, qi in _lattice_points()}
    first = min(pts)
    out = [(1, first, None)]
    md = {
        vid: sum((p - q) ** 2 for p, q in zip(qi, pts[first]))
        for vid, qi in pts.items()
    }
    for step in range(2, 9):
        far = min(md, key=lambda v: (-md[v], v))
        out.append((step, far, md[far]))
        fq = pts[far]
        for vid, qi in pts.items():
            d = sum((p - q) ** 2 for p, q in zip(qi, fq))
            if d < md[vid]:
                md[vid] = d
    assert got == out


# ---------------------------------------------------------------------------
# q379 integer HITS (4 rounds, max-normalized)
# ---------------------------------------------------------------------------


def test_q379_hits_matches_direct_recursion(spark):
    import json

    rows = _q(spark, "q379_hits_hubs_authorities").collect()
    got = {
        (r["kind"], r["rank"]): (r["node_id"], r["score_micro"])
        for r in rows
    }
    con = duckdb.connect()
    ev = con.execute(
        f"SELECT user_id, event_type, props FROM "
        f"read_parquet('{SF_DIR}/events.parquet')"
    ).df()
    edges = set()
    for uid, et, props in zip(ev["user_id"], ev["event_type"], ev["props"]):
        if et == "click":
            edges.add((int(uid), int(json.loads(props)["k"])))
    h = {u: 1_000_000 for u, _ in edges}
    a = {}
    for _ in range(4):
        araw: dict[int, int] = {}
        for u, i in edges:
            araw[i] = araw.get(i, 0) + h[u]
        amax = max(araw.values())
        a = {i: (x * 1_000_000) // amax for i, x in araw.items()}
        hraw: dict[int, int] = {}
        for u, i in edges:
            hraw[u] = hraw.get(u, 0) + a[i]
        hmax = max(hraw.values())
        h = {u: (x * 1_000_000) // hmax for u, x in hraw.items()}
    top_a = sorted(a.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    top_h = sorted(h.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    for rank, (node, score) in enumerate(top_a, start=1):
        assert got[("authority", rank)] == (node, score)
    for rank, (node, score) in enumerate(top_h, start=1):
        assert got[("hub", rank)] == (node, score)


# ---------------------------------------------------------------------------
# q388 Davies-Bouldin (squared variant, integer milli)
# ---------------------------------------------------------------------------


def test_q388_davies_bouldin_matches_direct_moments(spark):
    row = _q(spark, "q388_davies_bouldin").collect()[0]
    pts = _lattice_points()
    mom: dict[int, list] = {}
    for _, label, qi in pts:
        m = mom.setdefault(label, [0, [0] * len(qi), 0])
        m[0] += 1
        for i, v in enumerate(qi):
            m[1][i] += v
        m[2] += sum(v * v for v in qi)
    cstat = {}
    for label, (n_c, s_c, q_c) in mom.items():
        cent = [_tdiv(s, n_c) for s in s_c]
        s2 = _tdiv(n_c * q_c - sum(s * s for s in s_c), n_c * n_c)
        cstat[label] = (cent, s2)
    worst = {}
    for i, (ci, si) in cstat.items():
        best = None
        for j, (cj, sj) in cstat.items():
            if i == j:
                continue
            d2 = sum((p - q) ** 2 for p, q in zip(ci, cj))
            r = _tdiv(1000 * (si + sj), d2)
            best = r if best is None else max(best, r)
        worst[i] = best
    k = len(worst)
    assert row["n_clusters"] == k
    assert row["db_milli"] == _tdiv(sum(worst.values()), k)
    assert row["max_pair_milli"] == max(worst.values())


# ---------------------------------------------------------------------------
# q389 purity + NMI of the 1-D quantizer vs labels
# ---------------------------------------------------------------------------


def test_q389_agreement_matches_direct_contingency(spark):
    row = _q(spark, "q389_cluster_agreement").collect()[0]
    emb = _pdf("embeddings", "label, embedding")
    cells: dict[tuple[int, int], int] = {}
    for label, vec in zip(emb["label"], emb["embedding"]):
        pred = _tdiv(math.floor(float(vec[0]) * 1_000_000), 200_000)
        cells[(int(label), pred)] = cells.get((int(label), pred), 0) + 1
    n = sum(cells.values())
    preds = {p for _, p in cells}
    truths = {t for t, _ in cells}
    hits = sum(
        max(c for (t, pp), c in cells.items() if pp == p) for p in preds
    )
    rt = {t: sum(c for (tt2, _), c in cells.items() if tt2 == t) for t in truths}
    ct = {p: sum(c for (_, pp), c in cells.items() if pp == p) for p in preds}
    mi = sum(
        c / n * math.log(c * n / (rt[t] * ct[p]))
        for (t, p), c in cells.items()
    )
    ht = -sum(c / n * math.log(c / n) for c in rt.values())
    hp = -sum(c / n * math.log(c / n) for c in ct.values())
    nmi = 2 * mi / (ht + hp)
    assert row["n_points"] == n
    assert row["n_pred_bins"] == len(preds)
    assert row["purity"] == pytest.approx(hits / n, abs=1e-6)
    assert row["nmi"] == pytest.approx(nmi, abs=1e-4)
