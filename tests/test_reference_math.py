"""Independent brute-force references for the round-6 statistical
operators.

The DuckDB oracle twins share each query's FORMULA, so they verify
engine agreement, not the math itself. These tests recompute the
statistic from raw parquet with a deliberately different, naive
algorithm (pairwise AUC instead of rank sums; integral-grid W1
instead of the CDF-gap fold; greedy-over-dicts MMR instead of the
DataFrame loop) and pin the Spark results against it at sf0.001.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from tests.conftest import SF_DIR


def _pdf(table: str):
    con = duckdb.connect()
    return con.execute(
        f"SELECT * FROM read_parquet('{SF_DIR}/{table}.parquet')"
    ).df()


def _toks(text: str) -> list[str]:
    return text.strip().lower().split()


def test_auc_matches_pairwise_bruteforce(spark):
    from __spark_entry__ import queries

    qs = queries()
    row = qs["q287_quality_dup_auc"](spark, SF_DIR).collect()[0]

    # labels: docs appearing in any LSH candidate pair, taken from the
    # same (separately oracle-checked) pair query
    cands = qs["q43_lsh_candidate_pairs"](spark, SF_DIR).collect()
    members = {r["doc_a"] for r in cands} | {r["doc_b"] for r in cands}

    docs = _pdf("documents")
    scored = []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        t = _toks(text)
        score = (1000 * len(set(t))) // len(t)
        scored.append((int(doc_id), score, int(doc_id) in members))

    pos = [s for _, s, d in scored if d]
    neg = [s for _, s, d in scored if not d]
    assert row["n_dup"] == len(pos)
    assert row["n_clean"] == len(neg)
    # O(P*N) Mann-Whitney with half credit for ties
    wins = sum(
        1.0 if p > n else (0.5 if p == n else 0.0)
        for p in pos
        for n in neg
    )
    assert row["auc"] == pytest.approx(
        wins / (len(pos) * len(neg)), abs=1e-6
    )


def test_w1_matches_integral_grid(spark):
    from __spark_entry__ import queries

    out = {
        r["source"]: r["w1_tokens"]
        for r in queries()["q295_wasserstein_length_drift"](
            spark, SF_DIR
        ).collect()
    }
    docs = _pdf("documents")
    lens: dict[str, list[int]] = {}
    allv: list[int] = []
    for src, text in zip(docs["source"], docs["text"]):
        v = len(_toks(text))
        lens.setdefault(src, []).append(v)
        allv.append(v)

    lo, hi = min(allv), max(allv)
    n_all = len(allv)
    for src, vs in lens.items():
        # W1 = integral of |F_src - F_corpus| over the integer line -
        # evaluated pointwise on every integer, no CDF-gap folding
        w1 = 0.0
        for x in range(lo, hi):
            fs = sum(1 for v in vs if v <= x) / len(vs)
            fc = sum(1 for v in allv if v <= x) / n_all
            w1 += abs(fs - fc)
        assert out[src] == pytest.approx(w1, abs=1e-5), src


def test_mmr_matches_greedy_bruteforce(spark):
    from __spark_entry__ import queries
    from web_scraping_etl_pipeline_spark.plans.retrieval import (
        _MMR_K,
        _MMR_POOL,
    )

    got = [
        (r["rk"], r["doc_id"])
        for r in queries()["q284_mmr_rerank"](spark, SF_DIR)
        .orderBy("rk")
        .collect()
    ]

    emb = _pdf("embeddings")
    vecs = {
        int(v): [float(x) for x in e]
        for v, e in zip(emb["vec_id"], emb["embedding"])
    }
    qv = vecs[0]

    def dot(a, b):
        return sum(x * y for x, y in zip(a, b))

    rel = {v: round(dot(e, qv), 6) for v, e in vecs.items()}
    pool = sorted(rel, key=lambda v: (-rel[v], v))[:_MMR_POOL]
    sims = {
        (a, b): round(dot(vecs[a], vecs[b]), 6)
        for a in pool
        for b in pool
        if a != b
    }
    sel: list[int] = []
    for _ in range(_MMR_K):
        best = None
        for d in pool:
            if d in sel:
                continue
            if not sel:
                score = round(0.5 * rel[d], 6)
            else:
                score = round(
                    0.5 * rel[d] - 0.5 * max(sims[(d, s)] for s in sel),
                    6,
                )
            key = (-score, d)
            if best is None or key < best[0]:
                best = (key, d)
        sel.append(best[1])
    assert [d for _, d in got] == sel


def test_chi2_matches_direct_contingency(spark):
    from __spark_entry__ import queries

    row = queries()["q286_lang_source_chi2"](spark, SF_DIR).collect()[0]
    docs = _pdf("documents")
    cells: dict[tuple[str, str], int] = {}
    for lang, src in zip(docs["lang"], docs["source"]):
        cells[(lang, src)] = cells.get((lang, src), 0) + 1
    langs = sorted({k[0] for k in cells})
    srcs = sorted({k[1] for k in cells})
    n = sum(cells.values())
    rt = {l: sum(v for (a, _), v in cells.items() if a == l) for l in langs}
    ct = {s: sum(v for (_, b), v in cells.items() if b == s) for s in srcs}
    chi2 = 0.0
    for l in langs:
        for s in srcs:
            e = rt[l] * ct[s] / n
            o = cells.get((l, s), 0)
            chi2 += (o - e) ** 2 / e
    assert row["n_docs"] == n
    assert row["dof"] == (len(langs) - 1) * (len(srcs) - 1)
    assert row["chi2"] == pytest.approx(chi2, abs=1e-2)
    assert row["cramers_v"] == pytest.approx(
        math.sqrt(chi2 / (n * min(len(langs) - 1, len(srcs) - 1))),
        abs=1e-4,
    )


def test_kappa_matches_direct_contingency(spark):
    from __spark_entry__ import queries

    row = queries()["q285_gate_agreement_kappa"](spark, SF_DIR).collect()[0]
    n = row["n"]
    po = (row["n_both"] + row["n_neither"]) / n
    pe = (
        (row["n_both"] + row["n_only_a"]) * (row["n_both"] + row["n_only_b"])
        + (row["n_only_b"] + row["n_neither"])
        * (row["n_only_a"] + row["n_neither"])
    ) / (n * n)
    assert row["po"] == pytest.approx(po, abs=1e-6)
    assert row["pe"] == pytest.approx(pe, abs=1e-6)
    assert row["kappa"] == pytest.approx((po - pe) / (1 - pe), abs=1e-6)
    # and the counts themselves partition the corpus
    assert (
        row["n_both"] + row["n_only_a"] + row["n_only_b"] + row["n_neither"]
        == n
    )
