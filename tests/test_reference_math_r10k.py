"""Independent brute-force references, round 10 batch K: the
entity-resolution verifiers (hand-rolled Levenshtein DP vs the
engines' built-ins) and the retrieval-evaluation family.

q106 blocked fuzzy match, q152 golden-record survivorship, q282
candidate edit-distance verify, q221 ANN recall@k, q224 per-dimension
z outliers, q225 reciprocal-rank fusion, q257 nDCG@10, q299
hard-negative mining, q304 positional phrase search, q309 source
vocabulary overlap. Pure-Python recomputation from raw parquet at
sf0.001, as in batches A-J.
"""

from __future__ import annotations

import math
import re

import duckdb
import pytest

from tests.conftest import SF_DIR
from tests.test_reference_math_r10f import _python_lsh_pairs


def _pdf(table: str, cols: str = "*"):
    con = duckdb.connect()
    return con.execute(
        f"SELECT {cols} FROM read_parquet('{SF_DIR}/{table}.parquet')"
    ).df()


def _q(spark, name):
    from __spark_entry__ import queries

    return queries()[name](spark, SF_DIR)


def _toks(text: str) -> list[str]:
    return re.split(r"\s+", str(text).strip().lower())


def _lev(a: str, b: str) -> int:
    """Plain O(len^2) Wagner-Fischer DP - the from-scratch reference
    for both engines' built-in levenshtein()."""
    if a == b:
        return 0
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, start=1):
        cur = [i]
        for j, cb in enumerate(b, start=1):
            cur.append(min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (0 if ca == cb else 1),
            ))
        prev = cur
    return prev[-1]


def _vecs():
    con = duckdb.connect()
    emb = con.execute(
        f"SELECT vec_id, embedding"
        f" FROM read_parquet('{SF_DIR}/embeddings.parquet')"
    ).df()
    return {
        int(v): [float(x) for x in e]
        for v, e in zip(emb["vec_id"], emb["embedding"])
    }


def _dot(a, b):
    dp = 0.0
    for x, y in zip(a, b):
        dp += x * y
    return dp


def _bucket(x):
    return sum(
        (1 << i) for i, d in enumerate((1, 17, 33, 49)) if x[d - 1] > 0.0
    )


# ---------------------------------------------------------------------------
# q106 blocked fuzzy match
# ---------------------------------------------------------------------------


def test_q106_fuzzy_match_matches_dp_levenshtein(spark):
    rows = {
        (int(r["part_a"]), int(r["part_b"])): int(r["edit_dist"])
        for r in _q(spark, "q106_fuzzy_name_match").collect()
    }
    p = _pdf("part", "p_partkey, p_brand, p_name")
    blocks: dict[str, list[tuple[int, str]]] = {}
    for k, br, nm in zip(p["p_partkey"], p["p_brand"], p["p_name"]):
        blocks.setdefault(br, []).append((int(k), str(nm)))
    ref = {}
    for items in blocks.values():
        items.sort()
        for i in range(len(items)):
            for j in range(i + 1, len(items)):
                (ka, na), (kb, nb) = items[i], items[j]
                if na == nb:
                    continue
                d = _lev(na, nb)
                if d <= 4:
                    ref[(ka, kb)] = d
    assert rows == ref
    assert len(ref) > 0


# ---------------------------------------------------------------------------
# q152 golden-record survivorship
# ---------------------------------------------------------------------------


def test_q152_golden_record_matches_survivorship_rules(spark):
    pairs, _ = _python_lsh_pairs()
    rows = {
        int(r["cluster_id"]): r
        for r in _q(spark, "q152_golden_record").collect()
    }
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    docs = _pdf("documents", "doc_id, source, lang, n_chars")
    meta = {
        int(d): (s, lg, int(nc))
        for d, s, lg, nc in zip(
            docs["doc_id"], docs["source"], docs["lang"], docs["n_chars"]
        )
    }
    clusters: dict[int, list[int]] = {}
    for x in parent:
        clusters.setdefault(find(x), []).append(x)
    assert set(rows) == set(clusters)
    for cid, members in clusters.items():
        srcs: dict[str, int] = {}
        langs = set()
        for d in members:
            s, lg, _ = meta[d]
            srcs[s] = srcs.get(s, 0) + 1
            langs.add(lg)
        best = min(srcs, key=lambda s: (-srcs[s], s))
        row = rows[cid]
        assert row["n_members"] == len(members)
        assert row["max_chars"] == max(meta[d][2] for d in members)
        assert row["total_chars"] == sum(meta[d][2] for d in members)
        assert row["langs"] == ",".join(sorted(langs))
        assert row["best_source"] == best


# ---------------------------------------------------------------------------
# q282 candidate edit-distance verify
# ---------------------------------------------------------------------------


def test_q282_edit_verify_matches_dp(spark):
    pairs, _ = _python_lsh_pairs()
    rows = {
        (int(r["doc_a"]), int(r["doc_b"])): r
        for r in _q(spark, "q282_edit_distance_verify").collect()
    }
    docs = _pdf("documents", "doc_id, text")
    text = {int(d): str(t) for d, t in zip(docs["doc_id"], docs["text"])}
    assert set(rows) == pairs
    for a, b in pairs:
        d = _lev(text[a], text[b])
        row = rows[(a, b)]
        assert row["edit_dist"] == d
        assert row["edit_sim"] == pytest.approx(
            1.0 - d / max(len(text[a]), len(text[b])), abs=1e-3
        )


# ---------------------------------------------------------------------------
# q221 ANN recall@k
# ---------------------------------------------------------------------------


def test_q221_recall_matches_exact_vs_bucket(spark):
    rows = {
        int(r["query_id"]): r for r in _q(spark, "q221_ann_recall").collect()
    }
    vecs = _vecs()
    assert set(rows) == set(range(10))
    for qid in range(10):
        qv = vecs[qid]
        scored = sorted(
            ((round(_dot(x, qv), 6), v) for v, x in vecs.items()),
            key=lambda t: (-t[0], t[1]),
        )
        exact = {v for _, v in scored[:10]}
        qb = _bucket(qv)
        in_bucket = sorted(
            (
                (round(_dot(x, qv), 6), v)
                for v, x in vecs.items()
                if _bucket(x) == qb
            ),
            key=lambda t: (-t[0], t[1]),
        )
        ann = {v for _, v in in_bucket[:10]}
        row = rows[qid]
        assert row["n_ann"] == len(ann)
        assert row["n_hit"] == len(ann & exact)
        assert row["recall_at_k"] == pytest.approx(
            len(ann & exact) / 10, abs=1e-3
        )


# ---------------------------------------------------------------------------
# q224 per-dimension z outliers
# ---------------------------------------------------------------------------


def test_q224_outliers_match_zscore_census(spark):
    rows = {
        int(r["vec_id"]): r
        for r in _q(spark, "q224_embedding_outliers").collect()
    }
    vecs = _vecs()
    n = len(vecs)
    mu = [sum(x[d] for x in vecs.values()) / n for d in range(64)]
    sd = [
        math.sqrt(sum((x[d] - mu[d]) ** 2 for x in vecs.values()) / n)
        for d in range(64)
    ]
    expected = {}
    for v, x in vecs.items():
        zs = [round(abs(x[d] - mu[d]) / sd[d], 4) for d in range(64)]
        over = sum(1 for z in zs if z > 3.0)
        if over >= 1:
            expected[v] = (over, max(zs))
    assert set(rows) == set(expected)
    for v, (over, mz) in expected.items():
        assert rows[v]["n_dims_over"] == over
        assert rows[v]["max_z"] == pytest.approx(mz, abs=1e-3)


# ---------------------------------------------------------------------------
# q225 / q257: RRF fusion and its nDCG
# ---------------------------------------------------------------------------


def _rrf_reference():
    docs = _pdf("documents", "doc_id, text")
    terms = {"spark", "join", "merge", "window"}
    lex_scored = sorted(
        (
            (-len(set(_toks(t)) & terms), int(d))
            for d, t in zip(docs["doc_id"], docs["text"])
        ),
    )[:50]
    lex_rank = {d: i + 1 for i, (_, d) in enumerate(lex_scored)}
    vecs = _vecs()
    qv = vecs[0]
    vec_scored = sorted(
        ((-round(_dot(x, qv), 6), v) for v, x in vecs.items()),
    )[:50]
    vec_rank = {v: i + 1 for i, (_, v) in enumerate(vec_scored)}
    fused = {}
    for d in set(lex_rank) | set(vec_rank):
        s = 0.0
        if d in lex_rank:
            s += 1.0 / (60 + lex_rank[d])
        if d in vec_rank:
            s += 1.0 / (60 + vec_rank[d])
        fused[d] = round(s, 6)
    top = sorted(fused, key=lambda d: (-fused[d], d))[:10]
    return top, fused, lex_rank, vec_rank, vecs, qv


def test_q225_rrf_matches_fusion(spark):
    got = [
        (int(r["doc_id"]), r["rrf_score"])
        for r in _q(spark, "q225_hybrid_rrf").collect()
    ]
    top, fused, _, _, _, _ = _rrf_reference()
    assert [d for d, _ in got] == top
    for d, s in got:
        assert s == pytest.approx(fused[d], abs=1e-5)


def test_q257_ndcg_matches_graded_relevance(spark):
    row = _q(spark, "q257_ndcg_eval").collect()[0]
    top, _, _, _, vecs, qv = _rrf_reference()
    scored = sorted(
        ((round(_dot(x, qv), 6), v) for v, x in vecs.items()),
        key=lambda t: (-t[0], t[1]),
    )
    exact_rank = {v: i + 1 for i, (_, v) in enumerate(scored)}
    dcg = 0.0
    for pos, d in enumerate(top, start=1):
        rel = max(0, 11 - exact_rank[d])
        dcg += rel / math.log2(pos + 1)
    idcg = sum((11 - i) / math.log2(i + 1) for i in range(1, 11))
    assert row["dcg"] == pytest.approx(dcg, abs=1e-4)
    assert row["idcg"] == pytest.approx(idcg, abs=1e-4)
    assert row["ndcg"] == pytest.approx(dcg / idcg, abs=1e-4)


# ---------------------------------------------------------------------------
# q299 hard-negative mining
# ---------------------------------------------------------------------------


def test_q299_hard_negatives_match_rank_slice(spark):
    rows = {
        (int(r["query_id"]), int(r["vec_id"])): r
        for r in _q(spark, "q299_hard_negative_mining").collect()
    }
    vecs = _vecs()
    expected = {}
    for qid in range(10):
        qv = vecs[qid]
        scored = sorted(
            (
                (round(_dot(x, qv), 6), v)
                for v, x in vecs.items()
                if v != qid
            ),
            key=lambda t: (-t[0], t[1]),
        )
        floor_dp = min(dp for dp, _ in scored[:3])
        for i, (dp, v) in enumerate(scored[3:8], start=1):
            expected[(qid, v)] = (i, dp, round(floor_dp - dp, 6))
    assert set(rows) == set(expected)
    for key, (nr, dp, mg) in expected.items():
        row = rows[key]
        assert row["neg_rank"] == nr
        assert row["neg_sim"] == pytest.approx(dp, abs=1e-5)
        assert row["margin"] == pytest.approx(mg, abs=1e-5)


# ---------------------------------------------------------------------------
# q304 positional phrase search
# ---------------------------------------------------------------------------


def test_q304_phrase_search_matches_positional_walk(spark):
    rows = {
        r["doc_id"]: r for r in _q(spark, "q304_phrase_search").collect()
    }
    docs = _pdf("documents", "doc_id, source, text")
    cnt: dict[str, int] = {}
    toks = {}
    for did, s, text in zip(docs["doc_id"], docs["source"], docs["text"]):
        tk = _toks(text)
        toks[int(did)] = (s, tk)
        for a, b in zip(tk, tk[1:]):
            g = f"{a} {b}"
            cnt[g] = cnt.get(g, 0) + 1
    phrase = min(cnt, key=lambda g: (-cnt[g], g))
    w1, w2 = phrase.split(" ")
    expected = {}
    for did, (s, tk) in toks.items():
        hits = sum(
            1 for a, b in zip(tk, tk[1:]) if a == w1 and b == w2
        )
        if hits:
            expected[did] = (s, hits)
    assert set(rows) == set(expected)
    for did, (s, hits) in expected.items():
        row = rows[did]
        assert row["source"] == s
        assert row["phrase"] == phrase
        assert row["n_hits"] == hits


# ---------------------------------------------------------------------------
# q309 source vocabulary overlap
# ---------------------------------------------------------------------------


def test_q309_vocab_overlap_matches_set_jaccard(spark):
    rows = {
        (r["src_a"], r["src_b"]): r
        for r in _q(spark, "q309_source_vocab_overlap").collect()
    }
    docs = _pdf("documents", "source, text")
    vocab: dict[str, set] = {}
    for s, text in zip(docs["source"], docs["text"]):
        vocab.setdefault(s, set()).update(_toks(text))
    srcs = sorted(vocab)
    for i in range(len(srcs)):
        for j in range(i + 1, len(srcs)):
            a, b = srcs[i], srcs[j]
            inter = len(vocab[a] & vocab[b])
            row = rows[(a, b)]
            assert row["n_common"] == inter
            assert row["vocab_a"] == len(vocab[a])
            assert row["vocab_b"] == len(vocab[b])
