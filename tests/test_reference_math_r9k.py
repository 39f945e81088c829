"""Eleventh batch of independent brute-force references: q302, q371,
q334 (sketches + random projection, all hash-deterministic).
Independent-math coverage: 95 operators."""

from __future__ import annotations

import hashlib
import math

import pytest

from tests.conftest import SF_DIR
from tests.test_reference_math_r9 import _pdf, _q
from tests.test_reference_math_r9j import _doc_tokens


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _census():
    cnt: dict[str, int] = {}
    for ts in _doc_tokens().values():
        for tk in ts:
            cnt[tk] = cnt.get(tk, 0) + 1
    return cnt


# ---------------------------------------------------------------------------
# q302 count-min sketch point queries
# ---------------------------------------------------------------------------


def test_q302_cms_matches_direct_cells(spark):
    rows = {r["term"]: r for r in _q(spark, "q302_count_min_sketch").collect()}
    census = _census()
    cells: dict[tuple[int, int], int] = {}
    for term, c in census.items():
        for j in range(4):
            b = _h60(f"{j}:{term}") % 64
            cells[(j, b)] = cells.get((j, b), 0) + c
    top = sorted(census, key=lambda t: (-census[t], t))[:15]
    assert set(rows) == set(top)
    for term in top:
        est = min(
            cells[(j, _h60(f"{j}:{term}") % 64)] for j in range(4)
        )
        row = rows[term]
        assert row["exact_cnt"] == census[term]
        assert row["cms_estimate"] == est
        assert row["overestimate"] == est - census[term]
        assert est >= census[term]  # CMS error is one-sided


# ---------------------------------------------------------------------------
# q371 count sketch (signed, median-of-rows)
# ---------------------------------------------------------------------------


def test_q371_count_sketch_matches_direct_cells(spark):
    rows = {r["term"]: r for r in _q(spark, "q371_count_sketch").collect()}
    census = _census()
    cells: dict[tuple[int, int], int] = {}
    sgn = {}
    for term, c in census.items():
        for j in range(3):
            b = _h60(f"{j}:{term}") % 64
            s = 1 if _h60(f"s{j}:{term}") % 2 == 0 else -1
            sgn[(j, term)] = (b, s)
            cells[(j, b)] = cells.get((j, b), 0) + s * c
    top = sorted(census, key=lambda t: (-census[t], t))[:15]
    assert set(rows) == set(top)
    for term in top:
        ests = sorted(
            sgn[(j, term)][1] * cells[(j, sgn[(j, term)][0])]
            for j in range(3)
        )
        est = ests[1]  # median of 3
        row = rows[term]
        assert row["exact_cnt"] == census[term]
        assert row["est_median"] == est
        assert row["err"] == est - census[term]


# ---------------------------------------------------------------------------
# q334 Johnson-Lindenstrauss distortion over the probe sample
# ---------------------------------------------------------------------------


def test_q334_jl_matches_direct_projection(spark):
    rows = {
        (r["vec_a"], r["vec_b"]): r
        for r in _q(spark, "q334_jl_projection_distortion").collect()
    }
    emb = _pdf("embeddings", "vec_id, embedding")
    pts = {
        int(v): [math.floor(float(x) * 1_000_000) for x in e]
        for v, e in zip(emb["vec_id"], emb["embedding"])
        if int(v) < 32
    }
    dim = len(next(iter(pts.values())))
    r = {
        (d, j): 1 if _h60(f"jl:{d}:{j}") % 2 == 0 else -1
        for d in range(dim)
        for j in range(16)
    }
    y = {
        v: [sum(q[d] * r[(d, j)] for d in range(dim)) for j in range(16)]
        for v, q in pts.items()
    }
    ids = sorted(pts)
    n_pairs = 0
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            orig = sum((pa - pb) ** 2 for pa, pb in zip(pts[a], pts[b]))
            proj = sum((ya - yb) ** 2 for ya, yb in zip(y[a], y[b]))
            row = rows[(a, b)]
            n_pairs += 1
            assert row["orig_sq"] == orig
            assert row["proj_sq"] == proj
            if orig > 0:
                ratio = round(proj / 16 / orig, 6)
                assert row["distortion"] == pytest.approx(ratio, abs=2e-6)
                assert row["within_half"] == (
                    1 if 0.5 <= ratio <= 1.5 else 0
                )
            else:
                assert row["distortion"] is None
    assert len(rows) == n_pairs
