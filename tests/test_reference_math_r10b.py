"""Independent brute-force references, round 10 batch B: the
iterative / hand-derived-identity operators (VERDICT r9 item 2's
"hand-derived recursions/identities first" directive).

q177 PageRank (3-round synchronous recursion), q258 Kaplan-Meier
product-limit estimator, q288 Good-Turing unseen mass, q306 Lloyd
k-means (3 rounds, 7dp-resynced centroids), q382 Local Outlier Factor
(algebraic reachability-sum rearrangement), q421 Chapman
capture-recapture estimator.

Every reference is a from-scratch pure-Python recomputation (dict
loops, sorted lists) against raw parquet at sf0.001. q421's reference
is FORMULA-level: its capture counts are the oracle-checked q46/q85
pair lists (independently referenced via q43's existing test), and
what this test pins is the published Chapman estimator
N^ = (M+1)(C+1)/(R+1) - 1 recomputed from those counts with Python
integers - exactly the shared-formula risk the mandate names.
"""

from __future__ import annotations

import math
import re

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
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


US_PER_DAY = 86_400_000_000


# ---------------------------------------------------------------------------
# q177 PageRank over the nation trade graph
# ---------------------------------------------------------------------------


def test_q177_pagerank_matches_synchronous_recursion(spark):
    rows = {
        r["node"]: r["pagerank"] for r in _q(spark, "q177_pagerank").collect()
    }
    li = _pdf("lineitem", "l_orderkey, l_suppkey, l_extendedprice, l_discount")
    sup = {
        int(k): int(n)
        for k, n in zip(*_pdf("supplier", "s_suppkey, s_nationkey")
                        .to_dict("list").values())
    }
    orders = {
        int(k): int(c)
        for k, c in zip(*_pdf("orders", "o_orderkey, o_custkey")
                        .to_dict("list").values())
    }
    cust = {
        int(k): int(n)
        for k, n in zip(*_pdf("customer", "c_custkey, c_nationkey")
                        .to_dict("list").values())
    }
    nation = {
        int(k): str(n)
        for k, n in zip(*_pdf("nation", "n_nationkey, n_name")
                        .to_dict("list").values())
    }
    edges: dict[tuple[str, str], float] = {}
    for ok, sk, price, disc in zip(
        li["l_orderkey"], li["l_suppkey"], li["l_extendedprice"],
        li["l_discount"],
    ):
        src = nation[sup[int(sk)]]
        dst = nation[cust[orders[int(ok)]]]
        if src == dst:
            continue
        edges[(src, dst)] = edges.get((src, dst), 0.0) + float(price) * (
            1 - float(disc)
        )
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    outw: dict[str, float] = {}
    for (s, _), w in edges.items():
        outw[s] = outw.get(s, 0.0) + w
    pr = {v: 1.0 / n for v in nodes}
    for _ in range(3):
        nxt = {v: 0.15 / n for v in nodes}
        for (s, d), w in edges.items():
            nxt[d] += 0.85 * pr[s] * w / outw[s]
        pr = nxt
    assert set(rows) == set(nodes)
    for v in nodes:
        assert rows[v] == pytest.approx(pr[v], abs=1e-5)


# ---------------------------------------------------------------------------
# q258 Kaplan-Meier product-limit survival curve
# ---------------------------------------------------------------------------


def test_q258_survival_matches_product_limit(spark):
    rows = {
        r["t_days"]: r for r in _q(spark, "q258_survival_curve").collect()
    }
    con = duckdb.connect()
    us = con.execute(
        f"SELECT user_id, epoch_us(ts) AS us"
        f" FROM read_parquet('{SF_DIR}/events.parquet')"
    ).df()
    span: dict[int, list[int]] = {}
    for uid, u in zip(us["user_id"], us["us"]):
        day = int(u) // US_PER_DAY
        cell = span.setdefault(int(uid), [day, day])
        cell[0] = min(cell[0], day)
        cell[1] = max(cell[1], day)
    max_day = max(hi for _, hi in span.values())
    per_t: dict[int, list[int]] = {}
    for lo, hi in span.values():
        t = hi - lo
        cell = per_t.setdefault(t, [0, 0])
        if hi < max_day:
            cell[0] += 1  # churned
        else:
            cell[1] += 1  # censored
    total = len(span)
    at_risk = total
    surv = 1.0
    dead = False
    assert set(rows) == set(per_t)
    for t in sorted(per_t):
        d, c = per_t[t]
        row = rows[t]
        assert row["n_risk"] == at_risk
        assert row["n_churn"] == d
        assert row["n_censored"] == c
        if d >= at_risk:
            dead = True
        if not dead:
            surv *= 1.0 - d / at_risk
            assert row["survival"] == pytest.approx(surv, abs=1e-3)
        else:
            assert row["survival"] == 0.0
        at_risk -= d + c


# ---------------------------------------------------------------------------
# q288 Good-Turing frequency-of-frequencies
# ---------------------------------------------------------------------------


def test_q288_good_turing_matches_token_census(spark):
    rows = {
        r["source"]: r for r in _q(spark, "q288_good_turing_mass").collect()
    }
    docs = _pdf("documents", "source, text")
    tf: dict[tuple[str, str], int] = {}
    for s, text in zip(docs["source"], docs["text"]):
        for tok in re.split(r"\s+", str(text).strip().lower()):
            tf[(s, tok)] = tf.get((s, tok), 0) + 1
    stats: dict[str, list[int]] = {}
    for (s, _), f in tf.items():
        cell = stats.setdefault(s, [0, 0, 0, 0])  # ntok, vocab, n1, n2
        cell[0] += f
        cell[1] += 1
        if f == 1:
            cell[2] += 1
        elif f == 2:
            cell[3] += 1
    assert set(rows) == set(stats)
    for s, (ntok, vocab, n1, n2) in stats.items():
        row = rows[s]
        assert row["n_tokens"] == ntok
        assert row["vocab"] == vocab
        assert row["n1"] == n1
        assert row["n2"] == n2
        assert row["gt_unseen_mass"] == pytest.approx(n1 / ntok, abs=1.1e-6)
        assert row["hapax_share"] == pytest.approx(n1 / vocab, abs=1.1e-6)


# ---------------------------------------------------------------------------
# q306 Lloyd k-means (k=4, 3 rounds, 7dp-resynced centroids)
# ---------------------------------------------------------------------------


def test_q306_kmeans_matches_sequential_lloyd(spark):
    out = _q(spark, "q306_kmeans_lloyd").collect()
    vecs = {}
    emb = _pdf("embeddings", "vec_id, embedding")
    for vid, e in zip(emb["vec_id"], emb["embedding"]):
        vecs[int(vid)] = [float(x) for x in e]
    k = 4
    ctr = {c: vecs[c][:] for c in range(k)}
    assign = {}
    for _ in range(3):
        assign = {}
        for vid, x in vecs.items():
            best = None
            for c in sorted(ctr):
                d = 0.0
                for a, b in zip(x, ctr[c]):
                    d += (a - b) * (a - b)
                if best is None or (d, c) < best:
                    best = (d, c)
            assign[vid] = best[1]
        nxt = {}
        for c in sorted(ctr):
            members = [vecs[v] for v, cc in assign.items() if cc == c]
            nxt[c] = [
                round(sum(m[i] for m in members) / len(members), 7)
                for i in range(len(vecs[0]))
            ]
        ctr = nxt
    sizes: dict[int, int] = {}
    for c in assign.values():
        sizes[c] = sizes.get(c, 0) + 1
    for row in out:
        c, d = int(row["cluster"]), int(row["dim"])
        assert row["n_members"] == sizes[c]
        assert row["centroid"] == pytest.approx(ctr[c][d - 1], abs=2e-7)
    assert len(out) == k * len(vecs[0])


# ---------------------------------------------------------------------------
# q382 Local Outlier Factor (k=3, sign-LSH buckets, integer lattice)
# ---------------------------------------------------------------------------


def test_q382_lof_matches_reachability_bruteforce(spark):
    out = _q(spark, "q382_lof_outliers").collect()
    emb = _pdf("embeddings", "vec_id, embedding")
    lsh_dims = (1, 17, 33, 49)  # 1-based, mirrors plans/vectors.LSH_DIMS
    pts = {}
    for vid, e in zip(emb["vec_id"], emb["embedding"]):
        x = [float(v) for v in e]
        qi = [math.floor(v * 1_000_000) for v in x]
        bucket = sum(
            (1 << i) for i, d in enumerate(lsh_dims) if x[d - 1] > 0.0
        )
        pts[int(vid)] = (qi, bucket)
    by_bucket: dict[int, list[int]] = {}
    for vid, (_, b) in pts.items():
        by_bucket.setdefault(b, []).append(vid)
    k = 3
    knn: dict[int, list[tuple[int, int]]] = {}  # p -> [(d2, o)] (<= k)
    kdist: dict[int, int] = {}
    for b, ids in by_bucket.items():
        for p in ids:
            cand = []
            for o in ids:
                if o == p:
                    continue
                qa, qb = pts[p][0], pts[o][0]
                d2 = sum((a - c) * (a - c) for a, c in zip(qa, qb))
                cand.append((d2, o))
            cand.sort()
            knn[p] = cand[:k]
            if len(cand) >= k:
                kdist[p] = cand[k - 1][0]
    sreach: dict[int, int] = {}
    for p, nbrs in knn.items():
        # inner join semantics: only neighbors that HAVE a k-distance
        # contribute, and p appears only if at least one term exists
        terms = [max(kdist[o], d2) for d2, o in nbrs if o in kdist]
        if terms:
            sreach[p] = sum(terms)
    lof = {}
    for p, nbrs in knn.items():
        if p not in sreach:
            continue
        s = [1.0 / sreach[o] for _, o in nbrs if o in sreach]
        if not s:
            continue
        lof[p] = round(sum(s) * sreach[p] / (k * k), 6)
    top = sorted(lof.items(), key=lambda t: (-t[1], t[0]))[:10]
    assert [r["vec_id"] for r in out] == [p for p, _ in top]
    for row, (p, val) in zip(out, top):
        assert row["sreach"] == sreach[p]
        assert row["lof"] == pytest.approx(val, abs=1e-5)


# ---------------------------------------------------------------------------
# q421 Chapman capture-recapture (formula-level reference)
# ---------------------------------------------------------------------------


def test_q421_chapman_matches_published_estimator(spark):
    row = _q(spark, "q421_dedup_capture_recapture").collect()[0]
    m, c, r = int(row["m_lsh"]), int(row["m_simhash"]), int(row["r_both"])
    # sanity: the overlap cannot exceed either capture
    assert 0 <= r <= min(m, c)
    chapman_milli = _tdiv(1000 * (m + 1) * (c + 1), r + 1) - 1000
    assert row["chapman_milli"] == chapman_milli
    if chapman_milli > 0:
        assert row["union_coverage_milli"] == _tdiv(
            1_000_000 * (m + c - r), chapman_milli
        )
    else:
        assert row["union_coverage_milli"] is None
