"""Thirteenth batch of independent brute-force references: the two
hardest iterative recursions — q300 (BPE training loop) and q303
(power-iteration PCA). Independent-math coverage: 102 operators."""

from __future__ import annotations

import math
import re

import pytest

from tests.conftest import SF_DIR
from tests.test_reference_math_r9 import _pdf, _q


# ---------------------------------------------------------------------------
# q300 BPE training loop (10 merges, classic Sennrich algorithm)
# ---------------------------------------------------------------------------


def test_q300_bpe_matches_direct_merge_loop(spark):
    got = [
        (r["merge_rank"], r["pair"], r["cnt"])
        for r in sorted(
            _q(spark, "q300_bpe_train_loop").collect(),
            key=lambda r: r["merge_rank"],
        )
    ]
    docs = _pdf("documents", "text")
    freq: dict[str, int] = {}
    for text in docs["text"]:
        for w in re.split(r"\s+", text.strip().lower()):
            freq[w] = freq.get(w, 0) + 1
    syms = {w: list(w) for w in freq}
    merges = []
    for rank in range(1, 11):
        counts: dict[tuple[str, str], int] = {}
        for w, f in freq.items():
            s = syms[w]
            for a, b in zip(s, s[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], f"{p[0]} {p[1]}"))
        merges.append((rank, f"{best[0]} {best[1]}", counts[best]))
        l, r = best
        for w, s in syms.items():
            out = []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    assert got == merges


# ---------------------------------------------------------------------------
# q303 power-iteration top principal direction (X^T X, 6 rounds)
# ---------------------------------------------------------------------------


def test_q303_power_iteration_matches_direct_recursion(spark):
    rows = {
        r["dim"]: r for r in _q(spark, "q303_power_iteration_pca").collect()
    }
    emb = _pdf("embeddings", "embedding")
    x = [[float(v) for v in vec] for vec in emb["embedding"]]
    dim = len(x[0])
    v = [0.125] * dim
    u = v
    for _ in range(6):
        u = [0.0] * dim
        for row in x:
            s = sum(a * b for a, b in zip(row, v))
            for d in range(dim):
                u[d] += s * row[d]
        norm = math.sqrt(sum(a * a for a in u))
        v = [a / norm for a in u]
    lam = math.sqrt(sum(a * a for a in u))
    assert rows[1]["eigenvalue"] == pytest.approx(lam, abs=2e-3)
    for d in range(1, dim + 1):
        assert rows[d]["loading"] == pytest.approx(v[d - 1], abs=1e-4)
