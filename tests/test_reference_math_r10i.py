"""Independent brute-force references, round 10 batch I: the text-ops
foundation layer and deterministic samplers.

q30 token counts, q31 quality features, q32 stopword-argmax lang ID,
q33 content fingerprints, q76 winnowing fingerprints, q80 repetition
ratios, q82 stratified hash sample, q83 corpus top bigrams, q105
Efraimidis-Spirakis weighted sample, q175 vocabulary coverage curve.
Pure-Python recomputation from raw parquet at sf0.001, as in batches
A-H.
"""

from __future__ import annotations

import hashlib
import math
import re

import duckdb
import pytest

from tests.conftest import SF_DIR
from tests.test_reference_math_r10d import _detect


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


_STOPS = ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")


# ---------------------------------------------------------------------------
# q30 token counts
# ---------------------------------------------------------------------------


def test_q30_token_counts_match(spark):
    rows = {
        r["doc_id"]: r for r in _q(spark, "q30_token_count").collect()
    }
    docs = _pdf("documents", "doc_id, text, n_chars")
    for did, text, nc in zip(docs["doc_id"], docs["text"], docs["n_chars"]):
        row = rows[int(did)]
        assert row["n_tokens"] == len(_toks(text))
        assert row["n_chars"] == int(nc)


# ---------------------------------------------------------------------------
# q31 quality features
# ---------------------------------------------------------------------------


def test_q31_quality_features_match(spark):
    rows = {
        r["doc_id"]: r for r in _q(spark, "q31_quality_score").collect()
    }
    docs = _pdf("documents", "doc_id, text, n_chars")
    stops = set(_STOPS)
    for did, text, nc in zip(docs["doc_id"], docs["text"], docs["n_chars"]):
        tk = _toks(text)
        s = str(text).strip().lower()
        n_stop = sum(1 for t in tk if t in stops)
        n_punct = sum(1 for ch in s if ch in ".,!?;:")
        row = rows[int(did)]
        assert row["n_tokens"] == len(tk)
        assert row["n_stopwords"] == n_stop
        assert row["n_punct"] == n_punct
        assert row["stopword_ratio"] == pytest.approx(
            n_stop / len(tk), abs=1e-3
        )
        assert row["punct_ratio"] == pytest.approx(
            n_punct / int(nc), abs=1e-3
        )
        assert row["avg_token_span"] == pytest.approx(
            int(nc) / len(tk), abs=1e-3
        )


# ---------------------------------------------------------------------------
# q32 stopword-argmax language ID
# ---------------------------------------------------------------------------


def test_q32_lang_id_matches_reimplemented_detector(spark):
    rows = {
        r["doc_id"]: r for r in _q(spark, "q32_lang_id").collect()
    }
    docs = _pdf("documents", "doc_id, lang, text")
    for did, lang, text in zip(docs["doc_id"], docs["lang"], docs["text"]):
        row = rows[int(did)]
        assert row["labeled_lang"] == lang
        assert row["detected_lang"] == _detect(_toks(text))


# ---------------------------------------------------------------------------
# q33 content fingerprints
# ---------------------------------------------------------------------------


def test_q33_fingerprints_match_normalized_md5(spark):
    rows = {
        r["doc_id"]: r for r in _q(spark, "q33_fingerprint").collect()
    }
    docs = _pdf("documents", "doc_id, text")
    for did, text in zip(docs["doc_id"], docs["text"]):
        norm = re.sub(r"\s+", " ", str(text).strip().lower())
        fp = hashlib.md5(norm.encode()).hexdigest()
        row = rows[int(did)]
        assert row["fp"] == fp
        assert row["fp64"] == int(fp[:15], 16)


# ---------------------------------------------------------------------------
# q76 winnowing fingerprints
# ---------------------------------------------------------------------------


def test_q76_winnowing_matches_window_minima(spark):
    rows = set()
    for r in _q(spark, "q76_winnowing_fingerprints").collect():
        rows.add((int(r["doc_id"]), int(r["fp"])))
    docs = _pdf("documents", "doc_id, text")
    ref = set()
    W = 4
    for did, text in zip(docs["doc_id"], docs["text"]):
        tk = _toks(text)
        if len(tk) < 3:
            continue
        hs = [
            _h60(" ".join(tk[i: i + 3])) for i in range(len(tk) - 2)
        ]
        for pos in range(W, len(hs) + 1):  # 1-based, window [pos-W+1, pos]
            ref.add((int(did), min(hs[pos - W: pos])))
    assert rows == ref
    assert len(ref) > 0


# ---------------------------------------------------------------------------
# q80 repetition ratios
# ---------------------------------------------------------------------------


def test_q80_repetition_matches_tf_census(spark):
    rows = {
        r["doc_id"]: r for r in _q(spark, "q80_repetition_ratio").collect()
    }
    docs = _pdf("documents", "doc_id, text")
    for did, text in zip(docs["doc_id"], docs["text"]):
        tf: dict[str, int] = {}
        for t in _toks(text):
            tf[t] = tf.get(t, 0) + 1
        n = sum(tf.values())
        row = rows[int(did)]
        assert row["n_tokens"] == n
        assert row["n_distinct"] == len(tf)
        assert row["top_tf"] == max(tf.values())
        assert row["distinct_ratio"] == pytest.approx(
            len(tf) / n, abs=1e-3
        )
        assert row["top_token_frac"] == pytest.approx(
            max(tf.values()) / n, abs=1e-3
        )


# ---------------------------------------------------------------------------
# q82 stratified hash sample
# ---------------------------------------------------------------------------


def test_q82_stratified_sample_matches_hash_ranking(spark):
    rows = {
        r["doc_id"]: r
        for r in _q(spark, "q82_stratified_sample").collect()
    }
    docs = _pdf("documents", "doc_id, lang")
    per: dict[str, list[tuple[int, int]]] = {}
    for did, lg in zip(docs["doc_id"], docs["lang"]):
        did = int(did)
        per.setdefault(lg, []).append((_h60(str(did)), did))
    expected = {}
    for lg, items in per.items():
        items.sort()
        keep = (len(items) + 9) // 10
        for rk, (_, did) in enumerate(items[:keep], start=1):
            expected[did] = (lg, rk)
    assert set(rows) == set(expected)
    for did, (lg, rk) in expected.items():
        assert (rows[did]["lang"], rows[did]["rk"]) == (lg, rk)


# ---------------------------------------------------------------------------
# q83 corpus top bigrams
# ---------------------------------------------------------------------------


def test_q83_top_bigrams_match_census(spark):
    got = [
        (r["bigram"], int(r["cnt"]))
        for r in _q(spark, "q83_top_bigrams").collect()
    ]
    docs = _pdf("documents", "text")
    cnt: dict[str, int] = {}
    for text in docs["text"]:
        tk = _toks(text)
        for a, b in zip(tk, tk[1:]):
            g = f"{a} {b}"
            cnt[g] = cnt.get(g, 0) + 1
    ref = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert got == ref


# ---------------------------------------------------------------------------
# q105 Efraimidis-Spirakis weighted sample
# ---------------------------------------------------------------------------


def test_q105_weighted_sample_matches_jitter_keys(spark):
    got = [
        (r["doc_id"], r["weight"], r["sort_key"])
        for r in _q(spark, "q105_weighted_sample").collect()
    ]
    docs = _pdf("documents", "doc_id, n_chars")
    keyed = []
    for did, nc in zip(docs["doc_id"], docs["n_chars"]):
        did, w = int(did), int(nc)
        u = (_h60(str(did)) + 1) / float(1 << 60)
        keyed.append((-math.log(u) / w, did, w))
    keyed.sort()
    ref = keyed[:50]
    assert [(d, w) for _, d, w in ref] == [(d, w) for d, w, _ in got]
    for (k, _, _), (_, _, sk) in zip(ref, got):
        assert sk == pytest.approx(round(k, 9), abs=1e-8)


# ---------------------------------------------------------------------------
# q175 vocabulary coverage curve
# ---------------------------------------------------------------------------


def test_q175_vocab_coverage_matches_cumulative_census(spark):
    rows = {
        round(r["target"], 2): r
        for r in _q(spark, "q175_vocab_coverage").collect()
    }
    docs = _pdf("documents", "text")
    tf: dict[str, int] = {}
    for text in docs["text"]:
        for t in _toks(text):
            tf[t] = tf.get(t, 0) + 1
    ranked = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(tf.values())
    cums = []
    c = 0
    for _, n in ranked:
        c += n
        cums.append(c)
    for target in (0.50, 0.75, 0.90, 0.95):
        need = target * total
        rnk = next(i + 1 for i, c in enumerate(cums) if c >= need)
        row = rows[target]
        assert row["vocab_size"] == rnk
        assert row["covered_share"] == pytest.approx(
            cums[rnk - 1] / total, abs=1.1e-6
        )
