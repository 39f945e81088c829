"""Independent brute-force references, round 10 batch O: the exact
dedup base layer, signature presentation, and the cross-detector
audits riding the batch-F Python LSH pipeline.

q40 exact digest dedup, q41 normalized dedup, q42 MinHash signature
presentation, q44 same-source Jaccard sample, q132 hot-key skew
report, q227 BPE merge-step top pairs, q255 split-leakage matrix,
q266 MinHash-vs-SimHash agreement, q269 greedy set cover, q283 RBO
rank agreement (femto-integer weights), q294 sorted-suffix LCP
spans, q416 wedge-closure transitivity, q440 near-dup split leakage,
q441 dedup token budget. Pure-Python recomputation from raw parquet
at sf0.001, as in batches A-N.
"""

from __future__ import annotations

import hashlib
import math
import re

import duckdb
import pytest

from tests.conftest import SF_DIR
from tests.test_reference_math_r10f import _python_lsh_pairs
from tests.test_reference_math_r10g import _simhash


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


def _tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


@pytest.fixture(scope="module")
def lsh_ref():
    return _python_lsh_pairs()


def _verified_edges(ssets, pairs):
    """Canonical (lo, hi) edges at 4dp-rounded jaccard >= 0.5 - the
    q46-derived relation under q416/q440."""
    edges = set()
    for a, b in pairs:
        sa, sb = ssets[a], ssets[b]
        if round(len(sa & sb) / len(sa | sb), 4) >= 0.5:
            edges.add((min(a, b), max(a, b)))
    return edges


# ---------------------------------------------------------------------------
# q40 / q41 exact dedup
# ---------------------------------------------------------------------------


def test_q40_exact_dedup_matches_digest_census(spark):
    rows = {
        r["content_hash"]: r for r in _q(spark, "q40_dedup_exact").collect()
    }
    docs = _pdf("documents", "doc_id, text")
    agg: dict[str, list[int]] = {}
    for did, text in zip(docs["doc_id"], docs["text"]):
        h = hashlib.md5(str(text).encode()).hexdigest()
        cell = agg.setdefault(h, [int(did), 0])
        cell[0] = min(cell[0], int(did))
        cell[1] += 1
    assert set(rows) == set(agg)
    for h, (keep, copies) in agg.items():
        assert rows[h]["keep_id"] == keep
        assert rows[h]["copies"] == copies


def test_q41_normalized_dedup_matches_census(spark):
    rows = {
        r["content_hash"]: r
        for r in _q(spark, "q41_dedup_normalized").collect()
    }
    docs = _pdf("documents", "doc_id, text")
    agg: dict[str, list[int]] = {}
    for did, text in zip(docs["doc_id"], docs["text"]):
        norm = re.sub(r"\s+", " ", str(text).strip().lower())
        h = hashlib.md5(norm.encode()).hexdigest()
        cell = agg.setdefault(h, [int(did), 0])
        cell[0] = min(cell[0], int(did))
        cell[1] += 1
    assert set(rows) == set(agg)
    for h, (keep, copies) in agg.items():
        assert rows[h]["keep_id"] == keep
        assert rows[h]["copies"] == copies


# ---------------------------------------------------------------------------
# q42 MinHash signature presentation
# ---------------------------------------------------------------------------


def test_q42_signatures_match_python_permutations(spark):
    rows = {
        (int(r["doc_id"]), int(r["perm"])): int(r["sig"])
        for r in _q(spark, "q42_minhash_signatures").collect()
    }
    docs = _pdf("documents", "doc_id, text")
    P = 2_147_483_647
    ref = {}
    for did, text in zip(docs["doc_id"], docs["text"]):
        tk = _toks(text)
        if len(tk) < 3:
            continue
        grams = [" ".join(tk[i: i + 3]) for i in range(len(tk) - 2)]
        xs = [_h60(g) % P for g in grams]
        for p in range(8):
            ref[(int(did), p)] = min(
                ((2 * p + 1) * x + (1000003 * p + 12345)) % P for x in xs
            )
    assert rows == ref


# ---------------------------------------------------------------------------
# q44 same-source Jaccard sample
# ---------------------------------------------------------------------------


def test_q44_jaccard_sample_matches_set_arithmetic(spark, lsh_ref):
    _, ssets = lsh_ref
    rows = {
        (int(r["doc_a"]), int(r["doc_b"])): r["jaccard"]
        for r in _q(spark, "q44_ngram_jaccard_sample").collect()
    }
    docs = _pdf("documents", "doc_id, source")
    src = {int(d): s for d, s in zip(docs["doc_id"], docs["source"])}
    sampled = sorted(d for d in src if d % 5 == 0)
    ref = {}
    for i in range(len(sampled)):
        for j in range(i + 1, len(sampled)):
            a, b = sampled[i], sampled[j]
            if src[a] != src[b]:
                continue
            sa, sb = ssets[a], ssets[b]
            ref[(a, b)] = round(len(sa & sb) / len(sa | sb), 4)
    assert set(rows) == set(ref)
    for key, v in ref.items():
        assert rows[key] == pytest.approx(v, abs=1e-9)


# ---------------------------------------------------------------------------
# q132 hot-key skew report
# ---------------------------------------------------------------------------


def test_q132_skew_report_matches_key_census(spark):
    rows = {
        int(r["key"]): r for r in _q(spark, "q132_skew_report").collect()
    }
    o = _pdf("orders", "o_custkey")
    cnt: dict[int, int] = {}
    for k in o["o_custkey"]:
        cnt[int(k)] = cnt.get(int(k), 0) + 1
    mean = sum(cnt.values()) / len(cnt)
    flagged = {k: n for k, n in cnt.items() if n > 1.5 * mean}
    assert set(rows) == set(flagged)
    for k, n in flagged.items():
        assert rows[k]["n"] == n
        assert rows[k]["x_mean"] == pytest.approx(n / mean, abs=1e-3)


# ---------------------------------------------------------------------------
# q227 BPE merge-step top pairs
# ---------------------------------------------------------------------------


def test_q227_merge_candidates_match_pair_census(spark):
    got = [
        (r["pair"], int(r["cnt"]))
        for r in _q(spark, "q227_bpe_merge_step").collect()
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
# q255 split-leakage matrix
# ---------------------------------------------------------------------------


def test_q255_split_matrix_matches_hash_parts(spark, lsh_ref):
    pairs, _ = lsh_ref
    rows = {
        (r["part_a"], r["part_b"]): r
        for r in _q(spark, "q255_split_leakage").collect()
    }

    def part(d):
        b = _h60(str(d)) % 100
        return "train" if b < 80 else ("validation" if b < 90 else "test")

    cells: dict[tuple[str, str], int] = {}
    for a, b in pairs:
        key = (part(a), part(b))
        cells[key] = cells.get(key, 0) + 1
    assert set(rows) == set(cells)
    for key, n in cells.items():
        assert rows[key]["n_pairs"] == n
        assert bool(rows[key]["is_leak"]) == (key[0] != key[1])


# ---------------------------------------------------------------------------
# q266 MinHash-vs-SimHash agreement
# ---------------------------------------------------------------------------


def test_q266_agreement_matches_cross_detector_sets(spark, lsh_ref):
    pairs, _ = lsh_ref
    row = _q(spark, "q266_dedup_agreement").collect()[0]
    docs = _pdf("documents", "doc_id, text")
    sim = {
        int(d): _simhash(_toks(t))
        for d, t in zip(docs["doc_id"], docs["text"])
    }
    buckets: dict[tuple[int, int], list[int]] = {}
    for did, sh in sim.items():
        for j in range(4):
            buckets.setdefault((j, (sh >> (8 * j)) & 255), []).append(did)
    simhash_pairs = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for k in range(i + 1, len(ids)):
                a, b = ids[i], ids[k]
                if bin(sim[a] ^ sim[b]).count("1") <= 3:
                    simhash_pairs.add((a, b))
    tp = len(pairs & simhash_pairs)
    assert row["n_minhash_pairs"] == len(pairs)
    assert row["n_simhash_pairs"] == len(simhash_pairs)
    assert row["n_agree"] == tp
    assert row["precision_vs_simhash"] == pytest.approx(
        tp / len(pairs), abs=1e-3
    )
    assert row["recall_of_simhash"] == pytest.approx(
        tp / len(simhash_pairs), abs=1e-3
    )
    assert row["f1"] == pytest.approx(
        2 * tp / (len(pairs) + len(simhash_pairs)), abs=1e-3
    )


# ---------------------------------------------------------------------------
# q269 greedy set cover
# ---------------------------------------------------------------------------


def test_q269_greedy_cover_matches_sequential_picks(spark, lsh_ref):
    _, ssets = lsh_ref
    got = [
        (int(r["pick"]), int(r["doc_id"]), int(r["marginal_gain"]))
        for r in _q(spark, "q269_greedy_coverage").orderBy("pick").collect()
    ]
    live = {d: g for d, g in ssets.items() if g}
    covered: set = set()
    chosen: list[int] = []
    ref = []
    for rnd in range(1, 4):
        best = None
        for d in sorted(live):
            if d in chosen:
                continue
            gain = len(live[d] - covered)
            if best is None or (-gain, d) < (-best[1], best[0]):
                best = (d, gain)
        ref.append((rnd, best[0], best[1]))
        chosen.append(best[0])
        covered |= live[best[0]]
    assert got == ref


# ---------------------------------------------------------------------------
# q283 RBO rank agreement
# ---------------------------------------------------------------------------


def test_q283_rbo_matches_femto_weight_fold(spark):
    row = _q(spark, "q283_rank_agreement_rbo").collect()[0]
    docs = _pdf("documents", "doc_id, text")
    terms = {"spark", "join", "merge", "window"}
    lex_pool = sorted(
        (
            (-len(set(_toks(t)) & terms), int(d))
            for d, t in zip(docs["doc_id"], docs["text"])
        )
    )[:50]
    lex_rank = {d: i + 1 for i, (_, d) in enumerate(lex_pool)}
    con = duckdb.connect()
    emb = con.execute(
        f"SELECT vec_id, embedding"
        f" FROM read_parquet('{SF_DIR}/embeddings.parquet')"
    ).df()
    vecs = {
        int(v): [float(x) for x in e]
        for v, e in zip(emb["vec_id"], emb["embedding"])
    }
    qv = vecs[0]

    def dot(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += x * y
        return s

    vec_pool = sorted(
        ((-round(dot(x, qv), 6), v) for v, x in vecs.items())
    )[:50]
    vec_rank = {v: i + 1 for i, (_, v) in enumerate(vec_pool)}
    both = {
        d: (lex_rank[d], vec_rank[d]) for d in set(lex_rank) & set(vec_rank)
    }
    total = 0
    for d in range(1, 51):
        wtf = round(0.1 * 0.9 ** (d - 1) * 1_000_000_000_000_000)
        hits = sum(1 for rl, rv in both.values() if rl <= d and rv <= d)
        total += (wtf * hits) // d
    assert row["depth"] == 50
    assert row["n_common"] == len(both)
    assert row["rbo_trunc"] == pytest.approx(
        total / 1e15, abs=1e-5
    )


# ---------------------------------------------------------------------------
# q294 sorted-suffix LCP spans
# ---------------------------------------------------------------------------


def test_q294_lcp_spans_match_sorted_suffix_walk(spark):
    rows = {
        (int(r["doc_a"]), int(r["doc_b"])): r
        for r in _q(spark, "q294_suffix_lcp_spans").collect()
    }
    docs = _pdf("documents", "doc_id, text")
    sufs = []
    for did, text in zip(docs["doc_id"], docs["text"]):
        tk = _toks(text)
        for i in range(len(tk)):
            sufs.append((" ".join(tk[i: i + 12]), int(did), i + 1))
    sufs.sort()
    agg: dict[tuple[int, int], list[int]] = {}
    for (s1, d1, _), (s2, d2, _) in zip(sufs, sufs[1:]):
        if d1 == d2:
            continue
        t1, t2 = s1.split(" "), s2.split(" ")
        lcp = 0
        for a, b in zip(t1, t2):
            if a != b:
                break
            lcp += 1
        if lcp < 6:
            continue
        key = (min(d1, d2), max(d1, d2))
        cell = agg.setdefault(key, [0, 0])
        cell[0] += 1
        cell[1] = max(cell[1], lcp)
    assert set(rows) == set(agg)
    for key, (n, mx) in agg.items():
        assert rows[key]["n_sites"] == n
        assert rows[key]["max_lcp"] == mx


# ---------------------------------------------------------------------------
# q416 wedge-closure transitivity
# ---------------------------------------------------------------------------


def test_q416_transitivity_matches_wedge_enumeration(spark, lsh_ref):
    pairs, ssets = lsh_ref
    edges = _verified_edges(ssets, pairs)
    row = _q(spark, "q416_neardup_transitivity").collect()[0]
    adj: dict[int, set[int]] = {}
    for lo, hi in edges:
        adj.setdefault(lo, set()).add(hi)
        adj.setdefault(hi, set()).add(lo)
    n_wedges = n_closed = 0
    for mid, nbrs in adj.items():
        ns = sorted(nbrs)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                n_wedges += 1
                if (ns[i], ns[j]) in edges:
                    n_closed += 1
    assert row["n_edges"] == len(edges)
    assert row["n_wedges"] == n_wedges
    assert row["n_closed"] == n_closed
    if n_wedges:
        assert row["closure_milli"] == _tdiv(1000 * n_closed, n_wedges)


# ---------------------------------------------------------------------------
# q440 near-dup split leakage
# ---------------------------------------------------------------------------


def test_q440_split_leakage_matches_edge_census(spark, lsh_ref):
    pairs, ssets = lsh_ref
    edges = _verified_edges(ssets, pairs)
    row = _q(spark, "q440_neardup_split_leakage").collect()[0]
    n_cross = sum(
        1 for lo, hi in edges if (lo % 10 == 9) != (hi % 10 == 9)
    )
    docs = _pdf("documents", "doc_id")
    n_docs = len(docs)
    n_val = sum(1 for d in docs["doc_id"] if int(d) % 10 == 9)
    assert row["n_pairs"] == len(edges)
    assert row["n_cross"] == n_cross
    if edges:
        assert row["leak_milli"] == _tdiv(1000 * n_cross, len(edges))
    assert row["n_docs"] == n_docs
    assert row["n_val"] == n_val
    assert row["expected_milli"] == _tdiv(
        1000 * 2 * n_val * (n_docs - n_val), n_docs * (n_docs - 1)
    )


# ---------------------------------------------------------------------------
# q441 dedup token budget
# ---------------------------------------------------------------------------


def test_q441_token_budget_matches_keeper_census(spark):
    rows = {
        r["source"]: r for r in _q(spark, "q441_dedup_token_budget").collect()
    }
    docs = _pdf("documents", "doc_id, source, text")
    keep: dict[str, int] = {}
    recs = []
    for did, s, text in zip(docs["doc_id"], docs["source"], docs["text"]):
        did = int(did)
        h = hashlib.md5(str(text).encode()).hexdigest()
        recs.append((did, s, len(_toks(text)), h))
        if h not in keep or did < keep[h]:
            keep[h] = did
    agg: dict[str, list[int]] = {}
    for did, s, ntok, h in recs:
        cell = agg.setdefault(s, [0, 0, 0, 0])
        cell[0] += 1
        cell[2] += ntok
        if did == keep[h]:
            cell[1] += 1
            cell[3] += ntok
    assert set(rows) == set(agg)
    for s, (nd, nk, tt, tk) in agg.items():
        row = rows[s]
        assert row["n_docs"] == nd
        assert row["n_kept"] == nk
        assert row["tokens_total"] == tt
        assert row["tokens_kept"] == tk
        assert row["savings_milli"] == _tdiv(1000 * (tt - tk), tt)
