"""Fifteenth reference batch: q320 (minimax isotonic fit), q322
(content-defined chunking), q350 (blocking-quality scorecard).
Independent-math coverage: 109 operators."""

from __future__ import annotations

import hashlib
import re

import pytest

from tests.conftest import SF_DIR
from tests.test_reference_math_r9 import _pdf, _q
from tests.test_reference_math_r9c import _milli_score


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------------------
# q320 isotonic calibration via the minimax characterization
# ---------------------------------------------------------------------------


def test_q320_isotonic_matches_direct_minimax(spark):
    from __spark_entry__ import queries

    rows = {r["bin"]: r for r in _q(spark, "q320_isotonic_calibration").collect()}
    cands = queries()["q43_lsh_candidate_pairs"](spark, SF_DIR).collect()
    members = {r["doc_a"] for r in cands} | {r["doc_b"] for r in cands}
    docs = _pdf("documents", "doc_id, text")
    bins: dict[int, list[int]] = {}
    for d, t in zip(docs["doc_id"], docs["text"]):
        b = _milli_score(t) // 100
        c = bins.setdefault(b, [0, 0])
        c[0] += 1
        c[1] += 1 if int(d) in members else 0
    keys = sorted(bins)
    for i in keys:
        # fit(i) = max_{j<=i} min_{k>=i} pooled mean over bins j..k
        fit = max(
            min(
                sum(bins[b][1] for b in keys if j <= b <= k)
                / sum(bins[b][0] for b in keys if j <= b <= k)
                for k in keys
                if k >= i
            )
            for j in keys
            if j <= i
        )
        row = rows[i]
        assert row["cnt"] == bins[i][0]
        assert row["raw_rate"] == pytest.approx(
            bins[i][1] / bins[i][0], abs=1e-6
        )
        assert row["fitted_rate"] == pytest.approx(fit, abs=1e-5)
    # monotonicity of the fit itself
    fits = [rows[i]["fitted_rate"] for i in keys]
    assert fits == sorted(fits)


# ---------------------------------------------------------------------------
# q322 content-defined chunking dedup
# ---------------------------------------------------------------------------


def test_q322_cdc_matches_direct_chunking(spark):
    rows = {
        r["source"]: r
        for r in _q(spark, "q322_content_defined_chunks").collect()
    }
    docs = _pdf("documents", "doc_id, source, text")
    inst = []  # (source, chunk content key)
    for g, text in zip(docs["source"], docs["text"]):
        toks = re.split(r"\s+", text.strip().lower())
        chunks: dict[int, list[str]] = {}
        cid = 0
        for tok in toks:
            if _h60(tok) % 16 == 0:
                cid += 1
            chunks.setdefault(cid, []).append(tok)
        for c in chunks.values():
            inst.append(
                (g, hashlib.md5(" ".join(c).encode()).hexdigest())
            )
    census: dict[str, int] = {}
    for _, ck in inst:
        census[ck] = census.get(ck, 0) + 1
    per_src: dict[str, list[int]] = {}
    for g, ck in inst:
        c = per_src.setdefault(g, [0, 0])
        c[0] += 1
        c[1] += 1 if census[ck] > 1 else 0
    for g, (n, dup) in per_src.items():
        row = rows[g]
        assert row["n_chunks"] == n
        assert row["n_dup_chunks"] == dup
        assert row["dup_rate"] == pytest.approx(dup / n, abs=1e-6)


# ---------------------------------------------------------------------------
# q350 blocking-quality scorecard
# ---------------------------------------------------------------------------


def test_q350_blocking_matches_direct_truth(spark):
    from __spark_entry__ import queries

    row = _q(spark, "q350_blocking_quality").collect()[0]
    cands = {
        (r["doc_a"], r["doc_b"])
        for r in queries()["q43_lsh_candidate_pairs"](spark, SF_DIR).collect()
    }
    docs = _pdf("documents", "doc_id, text")
    groups: dict[str, list[int]] = {}
    for d, text in zip(docs["doc_id"], docs["text"]):
        h = hashlib.md5(
            re.sub(r"\s+", " ", text.strip().lower()).encode()
        ).hexdigest()
        groups.setdefault(h, []).append(int(d))
    truth = set()
    for ids in groups.values():
        if 2 <= len(ids) <= 64:
            ids.sort()
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    truth.add((ids[i], ids[j]))
    n = len(docs)
    total = n * (n - 1) // 2
    caught = len(truth & cands)
    assert row["n_docs"] == n
    assert row["total_pairs"] == total
    assert row["n_cands"] == len(cands)
    assert row["n_true_pairs"] == len(truth)
    assert row["n_caught"] == caught
    assert row["reduction_ratio"] == pytest.approx(
        1 - len(cands) / total, abs=1e-6
    )
    expected_pc = 1.0 if not truth else caught / len(truth)
    assert row["pairs_completeness"] == pytest.approx(expected_pc, abs=1e-6)
