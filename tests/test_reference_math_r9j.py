"""Tenth batch of independent brute-force references: q279, q280,
q305, q366, q370, q374, q378. Independent-math coverage: 92
operators."""

from __future__ import annotations

import json
import math
import re
import statistics

import duckdb
import pytest

from tests.conftest import SF_DIR
from tests.test_reference_math_r9 import _pdf, _q, _tdiv
from tests.test_reference_math_r9c import _milli_score

_QTERMS = ("spark", "join", "merge", "window")


def _doc_tokens():
    docs = _pdf("documents", "doc_id, text")
    return {
        int(d): re.split(r"\s+", t.strip().lower())
        for d, t in zip(docs["doc_id"], docs["text"])
    }


# ---------------------------------------------------------------------------
# q279 Okapi BM25 top-20
# ---------------------------------------------------------------------------


def test_q279_bm25_matches_direct_scoring(spark):
    got = [
        (r["doc_id"], r["n_terms"], r["bm25"])
        for r in _q(spark, "q279_bm25_topk").collect()
    ]
    toks = _doc_tokens()
    n = len(toks)
    avgdl = statistics.fmean(len(t) for t in toks.values())
    df = {q: sum(1 for t in toks.values() if q in t) for q in _QTERMS}
    k1, b = 1.2, 0.75
    scored = []
    for d, ts in toks.items():
        dl = len(ts)
        contribs = []
        for q in _QTERMS:
            tf = ts.count(q)
            if tf == 0:
                continue
            idf = math.log((n - df[q] + 0.5) / (df[q] + 0.5) + 1.0)
            contribs.append(
                round(
                    idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)),
                    6,
                )
            )
        if contribs:
            scored.append((d, len(contribs), round(sum(contribs), 6)))
    scored.sort(key=lambda r: (-r[2], r[0]))
    top = scored[:20]
    assert [(d, nt) for d, nt, _ in top] == [(d, nt) for d, nt, _ in got]
    for (_, _, s), (_, _, gs) in zip(top, got):
        assert gs == pytest.approx(s, abs=2e-6)


# ---------------------------------------------------------------------------
# q280 Zipf slope / r2 + Heaps observables per source
# ---------------------------------------------------------------------------


def test_q280_zipf_matches_direct_regression(spark):
    rows = {
        r["source"]: r for r in _q(spark, "q280_zipf_source_audit").collect()
    }
    docs = _pdf("documents", "source, text")
    tf: dict[tuple[str, str], int] = {}
    for g, text in zip(docs["source"], docs["text"]):
        for tk in re.split(r"\s+", text.strip().lower()):
            tf[(g, tk)] = tf.get((g, tk), 0) + 1
    per_src: dict[str, list[tuple[str, int]]] = {}
    for (g, tk), c in tf.items():
        per_src.setdefault(g, []).append((tk, c))
    for g, terms in per_src.items():
        n_tokens = sum(c for _, c in terms)
        vocab = len(terms)
        ranked = sorted(terms, key=lambda t: (-t[1], t[0]))[:100]
        xs = [math.log(r) for r in range(1, len(ranked) + 1)]
        ys = [math.log(c) for _, c in ranked]
        mx, my = statistics.fmean(xs), statistics.fmean(ys)
        sxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
        sxx = sum((x - mx) ** 2 for x in xs)
        syy = sum((y - my) ** 2 for y in ys)
        slope = sxy / sxx
        r2 = sxy * sxy / (sxx * syy)
        row = rows[g]
        assert row["n_tokens"] == n_tokens
        assert row["vocab"] == vocab
        assert row["ttr"] == pytest.approx(vocab / n_tokens, abs=1e-6)
        assert row["zipf_slope"] == pytest.approx(slope, abs=1e-3)
        assert row["zipf_r2"] == pytest.approx(r2, abs=1e-3)


# ---------------------------------------------------------------------------
# q305 PMI collocations
# ---------------------------------------------------------------------------


def test_q305_pmi_matches_direct_censuses(spark):
    got = [
        (r["pair"], r["pair_cnt"], r["pmi"])
        for r in _q(spark, "q305_pmi_collocations").collect()
    ]
    toks = _doc_tokens()
    uni: dict[str, int] = {}
    pair: dict[tuple[str, str], int] = {}
    np_ = 0
    for ts in toks.values():
        for tk in ts:
            uni[tk] = uni.get(tk, 0) + 1
        if len(ts) >= 2:
            np_ += len(ts) - 1
            for a, b in zip(ts, ts[1:]):
                pair[(a, b)] = pair.get((a, b), 0) + 1
    nu = sum(uni.values())
    cand = []
    for (a, b), cp in pair.items():
        if cp < 5:
            continue
        pmi = round(
            math.log((cp / np_) / ((uni[a] / nu) * (uni[b] / nu))), 6
        )
        cand.append((f"{a} {b}", cp, pmi))
    cand.sort(key=lambda r: (-r[2], r[0]))
    assert got == cand[:20]


# ---------------------------------------------------------------------------
# q366 PR curve over observed score thresholds
# ---------------------------------------------------------------------------


def test_q366_pr_curve_matches_direct_sweep(spark):
    from __spark_entry__ import queries

    rows = {r["thr"]: r for r in _q(spark, "q366_pr_curve").collect()}
    cands = queries()["q43_lsh_candidate_pairs"](spark, SF_DIR).collect()
    members = {r["doc_a"] for r in cands} | {r["doc_b"] for r in cands}
    docs = _pdf("documents", "doc_id, text")
    fl = [
        (_milli_score(t), 1 if int(d) in members else 0)
        for d, t in zip(docs["doc_id"], docs["text"])
    ]
    p = sum(y for _, y in fl)
    for thr in {s for s, _ in fl}:
        tp = sum(1 for s, y in fl if s <= thr and y)
        fp = sum(1 for s, y in fl if s <= thr and not y)
        fn = p - tp
        row = rows[thr]
        assert (row["tp"], row["fp"], row["fn"]) == (tp, fp, fn)
        assert row["precision_"] == pytest.approx(tp / (tp + fp), abs=1e-6)
        assert row["recall_"] == pytest.approx(tp / p, abs=1e-6)
        assert row["f1"] == pytest.approx(
            2 * tp / (2 * tp + fp + fn), abs=1e-6
        )


# ---------------------------------------------------------------------------
# q370 join-cardinality estimator audit
# ---------------------------------------------------------------------------


def test_q370_cardinality_audit_matches_direct_counts(spark):
    rows = {
        r["join_pair"]: r
        for r in _q(spark, "q370_join_cardinality_audit").collect()
    }
    con = duckdb.connect()
    for t1, t2, k1, k2 in (
        ("orders", "lineitem", "o_orderkey", "l_orderkey"),
        ("customer", "orders", "c_custkey", "o_custkey"),
        ("part", "lineitem", "p_partkey", "l_partkey"),
        ("supplier", "lineitem", "s_suppkey", "l_suppkey"),
    ):
        n1, ndv1 = con.execute(
            f"SELECT COUNT(*), COUNT(DISTINCT {k1}) FROM "
            f"read_parquet('{SF_DIR}/{t1}.parquet')"
        ).fetchone()
        n2, ndv2 = con.execute(
            f"SELECT COUNT(*), COUNT(DISTINCT {k2}) FROM "
            f"read_parquet('{SF_DIR}/{t2}.parquet')"
        ).fetchone()
        actual = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{SF_DIR}/{t1}.parquet') a "
            f"JOIN read_parquet('{SF_DIR}/{t2}.parquet') b "
            f"ON a.{k1} = b.{k2}"
        ).fetchone()[0]
        est = _tdiv(n1 * n2, max(ndv1, ndv2))
        row = rows[f"{t1}*{t2}"]
        assert (row["n_left"], row["n_right"]) == (n1, n2)
        assert (row["ndv_left"], row["ndv_right"]) == (ndv1, ndv2)
        assert row["actual_rows"] == actual
        assert row["est_rows"] == est
        assert row["q_error"] == pytest.approx(
            max(est / actual, actual / est), abs=1e-3
        )


# ---------------------------------------------------------------------------
# q374 TF-IDF cosine top-10 with integer micro idf
# ---------------------------------------------------------------------------


def test_q374_tfidf_cosine_matches_direct_postings(spark):
    got = [
        (r["doc_id"], r["n_terms"], r["dot_scaled"], r["cosine"])
        for r in _q(spark, "q374_tfidf_cosine_topk").collect()
    ]
    toks = _doc_tokens()
    n = len(toks)
    tf: dict[int, dict[str, int]] = {}
    df: dict[str, int] = {}
    for d, ts in toks.items():
        m: dict[str, int] = {}
        for tk in ts:
            m[tk] = m.get(tk, 0) + 1
        tf[d] = m
        for tk in m:
            df[tk] = df.get(tk, 0) + 1
    idf = {
        tk: math.floor(math.log(n / c) * 1_000_000) for tk, c in df.items()
    }
    qn2 = sum(idf[q] ** 2 for q in _QTERMS if q in idf)
    scored = []
    for d, m in tf.items():
        dn2 = sum((c * idf[tk]) ** 2 for tk, c in m.items())
        dp = sum(
            m[q] * idf[q] * idf[q] for q in _QTERMS if q in m
        )
        nt = sum(1 for q in _QTERMS if q in m)
        if nt:
            scored.append(
                (
                    d,
                    nt,
                    dp,
                    round(dp / (math.sqrt(qn2) * math.sqrt(dn2)), 6),
                )
            )
    scored.sort(key=lambda r: (-r[3], r[0]))
    assert got == scored[:10]


# ---------------------------------------------------------------------------
# q378 day-over-day top-5 churn
# ---------------------------------------------------------------------------


def test_q378_topk_churn_matches_direct_sets(spark):
    from web_scraping_etl_pipeline_spark.plans.common import (
        EVENTS_EPOCH_US,
        US_PER_DAY,
    )

    rows = {r["day_idx"]: r for r in _q(spark, "q378_topk_churn").collect()}
    con = duckdb.connect()
    ev = con.execute(
        f"SELECT epoch_us(ts) AS us, props FROM "
        f"read_parquet('{SF_DIR}/events.parquet')"
    ).df()
    cnt: dict[tuple[int, int], int] = {}
    for us, props in zip(ev["us"], ev["props"]):
        item = json.loads(props).get("k")
        assert item is not None, "every event carries props.k"
        d = (int(us) - EVENTS_EPOCH_US) // US_PER_DAY
        cnt[(d, int(item))] = cnt.get((d, int(item)), 0) + 1
    days = sorted({d for d, _ in cnt})
    topk = {}
    for d in days:
        items = [(i, c) for (dd, i), c in cnt.items() if dd == d]
        items.sort(key=lambda r: (-r[1], r[0]))
        topk[d] = {i for i, _ in items[:5]}
    for d in days[1:]:
        c = len(topk[d] & topk[d - 1])
        row = rows[d]
        assert row["n_common"] == c
        assert row["jaccard"] == pytest.approx(c / (10 - c), abs=1e-6)
