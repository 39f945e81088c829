"""Independent brute-force references, round 10 batch J: the vector
search family.

q50 brute-force cosine top-k, q51 sign-LSH bucket ANN, q52 L2 norms,
q53 label centroids, q54 IVF with nprobe=2, q99 k-means assignment,
q123 int8 scalar quantization, q156 quantized-coarse + exact rerank,
q157 deterministic random projection, q184 multi-probe Hamming-1 ANN.
All dot products re-summed in index order from raw parquet at
sf0.001, as in batches A-I.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from tests.conftest import SF_DIR

LSH_DIMS = (1, 17, 33, 49)
TOP_K = 10


def _q(spark, name):
    from __spark_entry__ import queries

    return queries()[name](spark, SF_DIR)


def _vecs():
    con = duckdb.connect()
    emb = con.execute(
        f"SELECT vec_id, label, embedding"
        f" FROM read_parquet('{SF_DIR}/embeddings.parquet')"
    ).df()
    vecs, labels = {}, {}
    for v, lb, e in zip(emb["vec_id"], emb["label"], emb["embedding"]):
        vecs[int(v)] = [float(x) for x in e]
        labels[int(v)] = int(lb)
    return vecs, labels


def _dot(a, b):
    dp = 0.0
    for x, y in zip(a, b):
        dp += x * y
    return dp


def _bucket(x):
    return sum((1 << i) for i, d in enumerate(LSH_DIMS) if x[d - 1] > 0.0)


def _topk(scored, k=TOP_K):
    """scored: list of (rounded_sim, vec_id); top-k by (sim desc, id)."""
    return sorted(scored, key=lambda t: (-t[0], t[1]))[:k]


# ---------------------------------------------------------------------------
# q50 brute-force cosine top-k
# ---------------------------------------------------------------------------


def test_q50_cosine_topk_matches_bruteforce(spark):
    got = [
        (r["cos_sim"], int(r["vec_id"]))
        for r in _q(spark, "q50_cosine_topk").collect()
    ]
    vecs, _ = _vecs()
    qv = vecs[0]
    ref = _topk([(round(_dot(x, qv), 6), v) for v, x in vecs.items()])
    assert [v for _, v in got] == [v for _, v in ref]
    for (gs, _), (rs, _) in zip(got, ref):
        assert gs == pytest.approx(rs, abs=1e-5)


# ---------------------------------------------------------------------------
# q51 sign-LSH bucket ANN
# ---------------------------------------------------------------------------


def test_q51_lsh_ann_matches_bucket_scan(spark):
    got = [int(r["vec_id"]) for r in _q(spark, "q51_ann_lsh_topk").collect()]
    vecs, _ = _vecs()
    qv = vecs[0]
    qb = _bucket(qv)
    cand = [(round(_dot(x, qv), 6), v) for v, x in vecs.items()
            if _bucket(x) == qb]
    assert got == [v for _, v in _topk(cand)]


# ---------------------------------------------------------------------------
# q52 L2 norms
# ---------------------------------------------------------------------------


def test_q52_norms_match(spark):
    rows = {
        int(r["vec_id"]): r for r in _q(spark, "q52_vector_norms").collect()
    }
    vecs, _ = _vecs()
    assert set(rows) == set(vecs)
    for v, x in vecs.items():
        assert rows[v]["dim"] == 64
        assert rows[v]["l2_norm"] == pytest.approx(
            math.sqrt(_dot(x, x)), abs=1e-5
        )


# ---------------------------------------------------------------------------
# q53 label centroids
# ---------------------------------------------------------------------------


def _centroids(vecs, labels):
    by_label: dict[int, list] = {}
    for v, x in vecs.items():
        by_label.setdefault(labels[v], []).append(x)
    return {
        lb: [sum(m[d] for m in ms) / len(ms) for d in range(64)]
        for lb, ms in by_label.items()
    }


def test_q53_centroids_match_means(spark):
    rows = {
        (int(r["label"]), int(r["dim"])): r["centroid"]
        for r in _q(spark, "q53_label_centroids").collect()
    }
    vecs, labels = _vecs()
    cents = _centroids(vecs, labels)
    assert len(rows) == len(cents) * 64
    for lb, c in cents.items():
        for d in range(64):
            assert rows[(lb, d)] == pytest.approx(c[d], abs=1e-5)


# ---------------------------------------------------------------------------
# q54 IVF nprobe=2
# ---------------------------------------------------------------------------


def test_q54_ivf_matches_probed_lists(spark):
    got = [int(r["vec_id"]) for r in _q(spark, "q54_ivf_topk").collect()]
    vecs, labels = _vecs()
    qv = vecs[0]
    cents = _centroids(vecs, labels)
    probed = sorted(
        cents, key=lambda lb: (-_dot(cents[lb], qv), lb)
    )[:2]
    cand = [
        (round(_dot(x, qv), 6), v)
        for v, x in vecs.items()
        if labels[v] in probed
    ]
    assert got == [v for _, v in _topk(cand)]


# ---------------------------------------------------------------------------
# q99 k-means assignment step
# ---------------------------------------------------------------------------


def test_q99_assignment_matches_argmax(spark):
    rows = {
        int(r["vec_id"]): r for r in _q(spark, "q99_kmeans_assign").collect()
    }
    vecs, labels = _vecs()
    cents = _centroids(vecs, labels)
    for v, x in vecs.items():
        scored = [(_dot(x, cents[lb]), lb) for lb in sorted(cents)]
        dp, best = max(scored)
        row = rows[v]
        assert row["nearest_label"] == best
        assert row["cos_sim"] == pytest.approx(dp, abs=1e-4)


# ---------------------------------------------------------------------------
# q123 int8 scalar quantization
# ---------------------------------------------------------------------------


def test_q123_quantization_matches_grid(spark):
    rows = {
        (int(r["vec_id"]), int(r["dim"])): int(r["code"])
        for r in _q(spark, "q123_embedding_quantization").collect()
    }
    vecs, _ = _vecs()
    lo = [min(x[d] for x in vecs.values()) for d in range(64)]
    hi = [max(x[d] for x in vecs.values()) for d in range(64)]
    for v, x in vecs.items():
        for d in range(64):
            if hi[d] == lo[d]:
                code = 0
            else:
                code = min(
                    math.floor(255.0 * (x[d] - lo[d]) / (hi[d] - lo[d])),
                    255,
                ) - 128
            assert rows[(v, d)] == code


# ---------------------------------------------------------------------------
# q156 quantized coarse + exact rerank
# ---------------------------------------------------------------------------


def test_q156_rerank_matches_two_tier_search(spark):
    got = [
        (int(r["vec_id"]), r["approx_sim"], r["cos_sim"])
        for r in _q(spark, "q156_quantized_rerank").collect()
    ]
    vecs, _ = _vecs()
    lo = [min(x[d] for x in vecs.values()) for d in range(64)]
    hi = [max(x[d] for x in vecs.values()) for d in range(64)]

    def deq(v):
        out = []
        for d in range(64):
            if hi[d] == lo[d]:
                code = 0
            else:
                code = min(
                    math.floor(255.0 * (vecs[v][d] - lo[d])
                               / (hi[d] - lo[d])),
                    255,
                ) - 128
            out.append(lo[d] + (code + 128) / 255.0 * (hi[d] - lo[d]))
        return out

    dq = {v: deq(v) for v in vecs}
    qdq = dq[0]
    approx = {v: round(_dot(x, qdq), 6) for v, x in dq.items()}
    pool = sorted(approx, key=lambda v: (-approx[v], v))[:50]
    qv = vecs[0]
    exact = [(round(_dot(vecs[v], qv), 6), v) for v in pool]
    ref = _topk(exact)
    assert [v for v, _, _ in got] == [v for _, v in ref]
    for (v, ga, gc), (rs, rv) in zip(got, ref):
        assert ga == pytest.approx(approx[v], abs=1e-4)
        assert gc == pytest.approx(rs, abs=1e-5)


# ---------------------------------------------------------------------------
# q157 deterministic random projection
# ---------------------------------------------------------------------------


def test_q157_projection_matches_integer_matrix(spark):
    rows = {
        int(r["vec_id"]): r
        for r in _q(spark, "q157_random_projection").collect()
    }
    vecs, _ = _vecs()
    for v, x in vecs.items():
        row = rows[v]
        for j in range(8):
            p = 0.0
            for i in range(64):
                p += x[i] * (((i * 31 + j * 17) % 7) - 3)
            assert row[f"p{j}"] == pytest.approx(p, abs=1e-4)


# ---------------------------------------------------------------------------
# q184 multi-probe Hamming-1 ANN
# ---------------------------------------------------------------------------


def test_q184_multiprobe_matches_probe_set(spark):
    got = [
        int(r["vec_id"]) for r in _q(spark, "q184_multiprobe_ann").collect()
    ]
    vecs, _ = _vecs()
    qv = vecs[0]
    qb = _bucket(qv)
    probes = {qb} | {qb ^ (1 << i) for i in range(4)}
    cand = [
        (round(_dot(x, qv), 6), v)
        for v, x in vecs.items()
        if _bucket(x) in probes
    ]
    assert got == [v for _, v in _topk(cand)]
