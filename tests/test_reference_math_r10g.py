"""Independent brute-force references, round 10 batch G: the SimHash
pipeline end-to-end, the near-dup CLUSTER family over the
batch-F Python LSH reference, and the embedding near-dup bucket join.

q45 SimHash fingerprints (32 bit-votes from md5-prefix token hashes),
q85 byte-banded hamming pairs, q46 LSH-verified exact Jaccard, q78
connected components (union-find vs the engine's min-label
propagation), q121 per-source near-dup rates, q122 MinHash agreement
estimates (from the batch-F Python signatures), q133 canonical-doc
picks, q47 sign-LSH embedding near-dup pairs.
"""

from __future__ import annotations

import hashlib
import math
import re

import duckdb
import pytest

from tests.conftest import SF_DIR
from tests.test_reference_math_r10f import (
    MINHASH_K,
    MINHASH_P,
    _python_lsh_pairs,
)


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


@pytest.fixture(scope="module")
def lsh_ref():
    return _python_lsh_pairs()


# ---------------------------------------------------------------------------
# q45 SimHash fingerprints
# ---------------------------------------------------------------------------


def _simhash(tokens: list[str]) -> int:
    votes = [0] * 32
    for tk in tokens:
        th = int(hashlib.md5(tk.encode()).hexdigest()[:8], 16)
        for j in range(32):
            votes[j] += 1 if (th >> j) & 1 else -1
    return sum(1 << j for j in range(32) if votes[j] > 0)


def test_q45_simhash_matches_bit_vote_census(spark):
    rows = {
        r["doc_id"]: r["simhash"] for r in _q(spark, "q45_simhash").collect()
    }
    docs = _pdf("documents", "doc_id, text")
    ref = {
        int(did): _simhash(_toks(text))
        for did, text in zip(docs["doc_id"], docs["text"])
    }
    assert rows == ref


# ---------------------------------------------------------------------------
# q85 byte-banded hamming pairs
# ---------------------------------------------------------------------------


def test_q85_hamming_pairs_match_byte_banding(spark):
    rows = {
        (int(r["doc_a"]), int(r["doc_b"])): int(r["hamming"])
        for r in _q(spark, "q85_simhash_hamming_pairs").collect()
    }
    docs = _pdf("documents", "doc_id, text")
    sim = {
        int(did): _simhash(_toks(text))
        for did, text in zip(docs["doc_id"], docs["text"])
    }
    buckets: dict[tuple[int, int], list[int]] = {}
    for did, sh in sim.items():
        for j in range(4):
            buckets.setdefault((j, (sh >> (8 * j)) & 255, ), []).append(did)
    ref = {}
    for ids in buckets.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for k in range(i + 1, len(ids)):
                a, b = ids[i], ids[k]
                h = bin(sim[a] ^ sim[b]).count("1")
                if h <= 3:  # _HAM_T verify threshold
                    ref[(a, b)] = h
    assert rows == ref


# ---------------------------------------------------------------------------
# q46 LSH-verified exact Jaccard
# ---------------------------------------------------------------------------


def test_q46_verified_jaccard_matches_set_arithmetic(spark, lsh_ref):
    pairs, ssets = lsh_ref
    rows = {
        (int(r["doc_a"]), int(r["doc_b"])): r["jaccard"]
        for r in _q(spark, "q46_lsh_verified_jaccard").collect()
    }
    assert set(rows) == pairs
    for a, b in pairs:
        sa, sb = ssets[a], ssets[b]
        j = len(sa & sb) / len(sa | sb)
        assert rows[(a, b)] == pytest.approx(round(j, 4), abs=1e-9)


# ---------------------------------------------------------------------------
# q78 connected components (union-find reference)
# ---------------------------------------------------------------------------


def test_q78_clusters_match_union_find(spark, lsh_ref):
    pairs, _ = lsh_ref
    rows = {
        int(r["doc_id"]): int(r["cluster_id"])
        for r in _q(spark, "q78_dedup_clusters").collect()
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
    ref = {x: find(x) for x in parent}
    assert rows == ref
    assert len(ref) > 0


# ---------------------------------------------------------------------------
# q121 near-dup rate by source
# ---------------------------------------------------------------------------


def test_q121_neardup_rate_matches_flag_census(spark, lsh_ref):
    pairs, _ = lsh_ref
    flagged = {d for p in pairs for d in p}
    rows = {
        r["source"]: r
        for r in _q(spark, "q121_neardup_rate_by_source").collect()
    }
    docs = _pdf("documents", "doc_id, source")
    agg: dict[str, list[int]] = {}
    for did, s in zip(docs["doc_id"], docs["source"]):
        cell = agg.setdefault(s, [0, 0])
        cell[0] += 1
        if int(did) in flagged:
            cell[1] += 1
    assert set(rows) == set(agg)
    for s, (nd, ndup) in agg.items():
        row = rows[s]
        assert row["n_docs"] == nd
        assert row["n_neardup"] == ndup
        assert row["neardup_rate"] == pytest.approx(ndup / nd, abs=1e-3)


# ---------------------------------------------------------------------------
# q122 MinHash agreement estimate
# ---------------------------------------------------------------------------


def test_q122_minhash_estimate_matches_python_signatures(spark, lsh_ref):
    pairs, _ = lsh_ref
    rows = {
        (int(r["doc_a"]), int(r["doc_b"])): r["est_jaccard"]
        for r in _q(spark, "q122_minhash_sim_estimate").collect()
    }
    docs = _pdf("documents", "doc_id, text")

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    sigs: dict[int, list[int]] = {}
    for did, text in zip(docs["doc_id"], docs["text"]):
        tk = _toks(text)
        if len(tk) < 3:
            continue
        grams = [" ".join(tk[i: i + 3]) for i in range(len(tk) - 2)]
        xs = [h60(g) % MINHASH_P for g in grams]
        sigs[int(did)] = [
            min(((2 * p + 1) * x + (1000003 * p + 12345)) % MINHASH_P
                for x in xs)
            for p in range(MINHASH_K)
        ]
    assert set(rows) == pairs
    for a, b in pairs:
        agree = sum(
            1 for x, y in zip(sigs[a], sigs[b]) if x == y
        )
        assert rows[(a, b)] == pytest.approx(
            round(agree / MINHASH_K, 4), abs=1e-9
        )


# ---------------------------------------------------------------------------
# q133 canonical-doc picks
# ---------------------------------------------------------------------------


def test_q133_canonical_matches_longest_then_smallest(spark, lsh_ref):
    pairs, _ = lsh_ref
    rows = {
        int(r["cluster_id"]): r
        for r in _q(spark, "q133_canonical_docs").collect()
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
    docs = _pdf("documents", "doc_id, n_chars")
    nchars = {int(d): int(n) for d, n in zip(docs["doc_id"], docs["n_chars"])}
    clusters: dict[int, list[int]] = {}
    for x in parent:
        clusters.setdefault(find(x), []).append(x)
    assert set(rows) == set(clusters)
    for cid, members in clusters.items():
        # longest doc wins, ties to the SMALLEST id
        canon = max(members, key=lambda d: (nchars[d], -d))
        row = rows[cid]
        assert row["canonical_doc"] == canon
        assert row["n_chars"] == max(nchars[d] for d in members)
        assert row["n_members"] == len(members)


# ---------------------------------------------------------------------------
# q47 sign-LSH embedding near-dup pairs
# ---------------------------------------------------------------------------


def test_q47_embedding_neardup_matches_bucket_join(spark):
    rows = {
        (int(r["vec_a"]), int(r["vec_b"])): r["cos_sim"]
        for r in _q(spark, "q47_embedding_neardup").collect()
    }
    emb = _pdf("embeddings", "vec_id, embedding")
    vecs = {
        int(v): [float(x) for x in e]
        for v, e in zip(emb["vec_id"], emb["embedding"])
    }
    buckets: dict[int, list[int]] = {}
    for vid, x in vecs.items():
        b = sum(
            (1 << i) for i, d in enumerate((2, 18, 34, 50)) if x[d - 1] > 0.0
        )
        buckets.setdefault(b, []).append(vid)
    ref = {}
    for ids in buckets.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for k in range(i + 1, len(ids)):
                a, b = ids[i], ids[k]
                dp = 0.0
                for p, q in zip(vecs[a], vecs[b]):
                    dp += p * q
                if dp >= 0.4:
                    ref[(a, b)] = round(dp, 6)
    assert set(rows) == set(ref)
    for key, v in ref.items():
        assert rows[key] == pytest.approx(v, abs=1e-5)
