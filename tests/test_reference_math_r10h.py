"""Independent brute-force references, round 10 batch H: the quality
gates, corpus caps/budget, and the privacy release-gate tripod.

q84 composite quality filter, q87 train/test n-gram contamination,
q204 per-source caps, q213 duplicated-n-gram char fraction, q214
corpus-percentile gate, q230 greedy token-budget fill, q236
k-anonymity, q296 l-diversity, q332 t-closeness (integral EMD).
Pure-Python recomputation from raw parquet at sf0.001, as in batches
A-G.
"""

from __future__ import annotations

import hashlib
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


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _toks(text: str) -> list[str]:
    return re.split(r"\s+", str(text).strip().lower())


def _grams(tk: list[str]) -> list[str]:
    if len(tk) < 3:
        return []
    return [" ".join(tk[i: i + 3]) for i in range(len(tk) - 2)]


def _score(tk: list[str]) -> int:
    return (1000 * len(set(tk))) // len(tk)


# ---------------------------------------------------------------------------
# q84 composite quality filter
# ---------------------------------------------------------------------------

_STOPS = {"the", "a", "of", "and", "to", "in", "is", "it", "for", "on"}


def test_q84_quality_filter_matches_rule_flags(spark):
    rows = {
        r["doc_id"]: r for r in _q(spark, "q84_quality_filter").collect()
    }
    docs = _pdf("documents", "doc_id, text")
    assert set(rows) == {int(d) for d in docs["doc_id"]}
    for did, text in zip(docs["doc_id"], docs["text"]):
        tk = _toks(text)
        n, nd = len(tk), len(set(tk))
        ns = sum(1 for t in tk if t in _STOPS)
        p_len = 20 <= n <= 80
        p_rep = nd / n >= 0.4
        p_stop = ns / n >= 0.02
        row = rows[int(did)]
        assert row["n_tokens"] == n
        assert bool(row["pass_len"]) == p_len
        assert bool(row["pass_rep"]) == p_rep
        assert bool(row["pass_stop"]) == p_stop
        assert bool(row["kept"]) == (p_len and p_rep and p_stop)


# ---------------------------------------------------------------------------
# q87 n-gram contamination
# ---------------------------------------------------------------------------


def test_q87_contamination_matches_shingle_overlap(spark):
    rows = {
        r["doc_id"]: r
        for r in _q(spark, "q87_contamination_check").collect()
    }
    docs = _pdf("documents", "doc_id, text")
    train_sh: set[str] = set()
    test_docs: dict[int, set[str]] = {}
    for did, text in zip(docs["doc_id"], docs["text"]):
        b = _h60(str(int(did))) % 100
        grams = set(_grams(_toks(text)))
        if b < 80:
            train_sh |= grams
        elif b >= 90 and grams:
            test_docs[int(did)] = grams
    assert set(rows) == set(test_docs)
    for did, grams in test_docs.items():
        ov = sum(1 for g in grams if g in train_sh)
        row = rows[did]
        assert row["n_shingles"] == len(grams)
        assert row["n_overlap"] == ov
        assert row["contamination_rate"] == pytest.approx(
            ov / len(grams), abs=1e-3
        )


# ---------------------------------------------------------------------------
# q204 per-source caps
# ---------------------------------------------------------------------------


def test_q204_source_caps_match_per_source_ranking(spark):
    rows = {
        r["doc_id"]: r for r in _q(spark, "q204_source_caps").collect()
    }
    docs = _pdf("documents", "doc_id, source, n_chars")
    per: dict[str, list[tuple[int, int]]] = {}
    for did, s, nc in zip(docs["doc_id"], docs["source"], docs["n_chars"]):
        per.setdefault(s, []).append((int(did), int(nc)))
    expected = {}
    for s, items in per.items():
        items.sort(key=lambda t: (-t[1], t[0]))
        for rk, (did, nc) in enumerate(items[:20], start=1):
            expected[did] = (s, nc, rk)
    assert set(rows) == set(expected)
    for did, (s, nc, rk) in expected.items():
        row = rows[did]
        assert (row["source"], row["n_chars"], row["rk"]) == (s, nc, rk)


# ---------------------------------------------------------------------------
# q213 duplicated-n-gram char fraction
# ---------------------------------------------------------------------------


def test_q213_dup_ngram_fraction_matches_census(spark):
    rows = {
        r["doc_id"]: r
        for r in _q(spark, "q213_dup_ngram_char_fraction").collect()
    }
    docs = _pdf("documents", "doc_id, text")
    expected = {}
    for did, text in zip(docs["doc_id"], docs["text"]):
        grams = _grams(_toks(text))
        if not grams:
            continue
        tf: dict[str, int] = {}
        for g in grams:
            tf[g] = tf.get(g, 0) + 1
        dup_chars = sum(
            c * len(g) for g, c in tf.items() if c >= 2
        )
        all_chars = sum(c * len(g) for g, c in tf.items())
        expected[int(did)] = (len(grams), round(dup_chars / all_chars, 4))
    assert set(rows) == set(expected)
    for did, (n, frac) in expected.items():
        row = rows[did]
        assert row["n_ngrams"] == n
        assert row["dup_char_frac"] == pytest.approx(frac, abs=1e-3)


# ---------------------------------------------------------------------------
# q214 corpus-percentile quality gate
# ---------------------------------------------------------------------------


def test_q214_percentile_gate_matches_survival_census(spark):
    rows = {
        r["source"]: r
        for r in _q(spark, "q214_quality_percentile_gate").collect()
    }
    docs = _pdf("documents", "source, text")
    scored = [
        (s, _score(_toks(text)))
        for s, text in zip(docs["source"], docs["text"])
    ]
    vals = sorted(float(sc) for _, sc in scored)
    h = (len(vals) - 1) * 0.75
    lo = math.floor(h)
    cutoff = vals[lo] + (h - lo) * (vals[min(lo + 1, len(vals) - 1)] - vals[lo])
    agg: dict[str, list[int]] = {}
    for s, sc in scored:
        cell = agg.setdefault(s, [0, 0])
        cell[0] += 1
        if sc > cutoff:
            cell[1] += 1
    assert set(rows) == set(agg)
    for s, (nd, nk) in agg.items():
        row = rows[s]
        assert row["n_docs"] == nd
        assert row["n_kept"] == nk
        assert row["keep_rate"] == pytest.approx(nk / nd, abs=1e-3)


# ---------------------------------------------------------------------------
# q230 greedy token-budget fill
# ---------------------------------------------------------------------------


def test_q230_budget_fill_matches_priority_walk(spark):
    rows = {
        r["doc_id"]: r for r in _q(spark, "q230_token_budget_fill").collect()
    }
    docs = _pdf("documents", "doc_id, text")
    recs = []
    for did, text in zip(docs["doc_id"], docs["text"]):
        tk = _toks(text)
        recs.append((int(did), _score(tk), len(tk)))
    recs.sort(key=lambda t: (-t[1], t[0]))
    cum = 0
    expected = {}
    for did, sc, nt in recs:
        cum += nt
        if cum > 15_000:
            break
        expected[did] = (sc, nt, cum)
    assert set(rows) == set(expected)
    for did, (sc, nt, cm) in expected.items():
        row = rows[did]
        assert (row["score"], row["n_tokens"], row["cum_tokens"]) == (
            sc, nt, cm,
        )


# ---------------------------------------------------------------------------
# q236 / q296 / q332: the privacy release-gate tripod
# ---------------------------------------------------------------------------


def _qi_rows():
    docs = _pdf("documents", "doc_id, source, lang, n_chars, text")
    out = []
    for did, s, lg, nc, text in zip(
        docs["doc_id"], docs["source"], docs["lang"], docs["n_chars"],
        docs["text"],
    ):
        lb = (int(nc) // 200) * 200
        sens = _score(_toks(text)) // 100
        out.append((int(did), s, lg, lb, sens))
    return out


def test_q236_k_anonymity_matches_group_census(spark):
    rows = {
        r["doc_id"]: r for r in _q(spark, "q236_k_anonymity").collect()
    }
    recs = _qi_rows()
    size: dict[tuple, int] = {}
    for _, s, lg, lb, _ in recs:
        size[(s, lg, lb)] = size.get((s, lg, lb), 0) + 1
    flagged = {
        did: (s, lg, lb, size[(s, lg, lb)])
        for did, s, lg, lb, _ in recs
        if size[(s, lg, lb)] < 5
    }
    assert set(rows) == set(flagged)
    for did, (s, lg, lb, gs) in flagged.items():
        row = rows[did]
        assert (row["source"], row["lang"], row["len_bucket"]) == (s, lg, lb)
        assert row["group_size"] == gs


def test_q296_l_diversity_matches_distinct_census(spark):
    rows = {
        (r["source"], r["lang"], r["len_bucket"]): r
        for r in _q(spark, "q296_l_diversity").collect()
    }
    recs = _qi_rows()
    groups: dict[tuple, list] = {}
    for _, s, lg, lb, sens in recs:
        cell = groups.setdefault((s, lg, lb), [0, set()])
        cell[0] += 1
        cell[1].add(sens)
    flagged = {
        k: (n, len(ss)) for k, (n, ss) in groups.items() if len(ss) < 3
    }
    assert set(rows) == set(flagged)
    for k, (n, ld) in flagged.items():
        assert rows[k]["group_size"] == n
        assert rows[k]["l_distinct"] == ld


def test_q332_t_closeness_matches_integral_emd(spark):
    rows = {
        (r["source"], r["lang"], r["len_bucket"]): r
        for r in _q(spark, "q332_t_closeness").collect()
    }
    recs = _qi_rows()
    gc: dict[tuple, dict[int, int]] = {}
    bkt: dict[int, int] = {}
    for _, s, lg, lb, sens in recs:
        gc.setdefault((s, lg, lb), {})[sens] = (
            gc.setdefault((s, lg, lb), {}).get(sens, 0) + 1
        )
        bkt[sens] = bkt.get(sens, 0) + 1
    n = sum(bkt.values())
    m = len(bkt)
    sens_sorted = sorted(bkt)
    assert set(rows) == set(gc)
    for k, cells in gc.items():
        n_g = sum(cells.values())
        e = 0
        total_abs = 0
        for sv in sens_sorted:
            e += cells.get(sv, 0) * n - bkt[sv] * n_g
            total_abs += abs(e)
        emd = round(total_abs / (n_g * n * (m - 1)), 6)
        row = rows[k]
        assert row["group_size"] == n_g
        assert row["emd"] == pytest.approx(emd, abs=1e-5)
        assert row["t_violation"] == (1 if emd > 0.2 else 0)
