"""Independent brute-force references, round 10 batch F: the MinHash
-> LSH-banding -> bucket-cap -> candidate-pair pipeline recomputed
END-TO-END in pure Python, plus the dedup-yield, containment, novelty
and corpus-profiling operators that consume it.

The q43 pipeline reference is the anchor: earlier tests used q43's
OUTPUT as an input (oracle-checked, but the MinHash math itself was
only engine-vs-engine). Here the affine permutation family
h_p(x) = ((2p+1) x + (1000003 p + 12345)) mod 2^31-1 over md5-60bit
shingle hashes, the 4x2 banding, the md5 band keys, and the
64-member hot-bucket cap are all re-derived from the documented
design and executed over raw parquet; the Spark pair list must match
the Python pair SET exactly.

Also: q151 exact heavy hitters, q215 containment coefficients, q218
n-gram novelty, q222 boilerplate prefixes, q256 HLL exact-NDV bridge,
q264 FD discovery, q281 bigram-perplexity terciles, q292 cross-source
LM transfer matrix, q293 effective token yield.
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


def _shingles(tk: list[str]) -> list[str]:
    if len(tk) < 3:
        return []
    return [" ".join(tk[i: i + 3]) for i in range(len(tk) - 2)]


MINHASH_K, MINHASH_P = 8, 2_147_483_647
LSH_BANDS, LSH_ROWS, BUCKET_CAP = 4, 2, 64


def _python_lsh_pairs() -> tuple[set, dict]:
    """(candidate pair set, doc_id -> distinct shingle set) rebuilt
    from scratch: signatures, band keys, hot-bucket cap, pair join."""
    docs = _pdf("documents", "doc_id, text")
    sigs: dict[int, list[int]] = {}
    ssets: dict[int, frozenset] = {}
    for did, text in zip(docs["doc_id"], docs["text"]):
        tk = _toks(text)
        grams = _shingles(tk)
        ssets[int(did)] = frozenset(grams)
        if not grams:
            continue  # no shingle rows -> no signature row
        xs = [_h60(g) % MINHASH_P for g in grams]
        sigs[int(did)] = [
            min(((2 * p + 1) * x + (1000003 * p + 12345)) % MINHASH_P
                for x in xs)
            for p in range(MINHASH_K)
        ]
    buckets: dict[tuple[int, str], list[int]] = {}
    for did, sg in sigs.items():
        for band in range(LSH_BANDS):
            key = hashlib.md5(
                "_".join(
                    str(sg[band * LSH_ROWS + r]) for r in range(LSH_ROWS)
                ).encode()
            ).hexdigest()
            buckets.setdefault((band, key), []).append(did)
    pairs = set()
    for ids in buckets.values():
        if len(ids) > BUCKET_CAP:
            continue  # hot-bucket guard drops the whole bucket
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))
    return pairs, ssets


@pytest.fixture(scope="module")
def lsh_ref():
    return _python_lsh_pairs()


# ---------------------------------------------------------------------------
# q43 candidate pairs: full pipeline parity
# ---------------------------------------------------------------------------


def test_q43_lsh_pipeline_matches_python_end_to_end(spark, lsh_ref):
    pairs, _ = lsh_ref
    got = {
        (int(r["doc_a"]), int(r["doc_b"]))
        for r in _q(spark, "q43_lsh_candidate_pairs").collect()
    }
    assert got == pairs
    assert len(pairs) > 0  # non-vacuous: the corpus has near-dups


# ---------------------------------------------------------------------------
# q215 containment coefficients over the candidate pairs
# ---------------------------------------------------------------------------


def test_q215_containment_matches_set_arithmetic(spark, lsh_ref):
    pairs, ssets = lsh_ref
    rows = {
        (int(r["doc_a"]), int(r["doc_b"])): r
        for r in _q(spark, "q215_containment_verify").collect()
    }
    assert set(rows) == pairs
    for a, b in pairs:
        sa, sb = ssets[a], ssets[b]
        inter = len(sa & sb)
        row = rows[(a, b)]
        assert row["containment_a_in_b"] == pytest.approx(
            inter / len(sa), abs=1e-3
        )
        assert row["containment_b_in_a"] == pytest.approx(
            inter / len(sb), abs=1e-3
        )


# ---------------------------------------------------------------------------
# q293 effective token yield (exact dedup + near-dup drop policy)
# ---------------------------------------------------------------------------


def test_q293_token_yield_matches_drop_policy(spark, lsh_ref):
    pairs, _ = lsh_ref
    nd_drop = {b for _, b in pairs}
    rows = {
        r["source"]: r
        for r in _q(spark, "q293_effective_token_yield").collect()
    }
    docs = _pdf("documents", "doc_id, source, text")
    min_per_digest: dict[str, int] = {}
    recs = []
    for did, s, text in zip(docs["doc_id"], docs["source"], docs["text"]):
        digest = hashlib.md5(str(text).encode()).hexdigest()
        did = int(did)
        recs.append((did, s, len(_toks(text)), digest))
        if digest not in min_per_digest or did < min_per_digest[digest]:
            min_per_digest[digest] = did
    agg: dict[str, list[int]] = {}
    for did, s, ntok, digest in recs:
        keep_exact = did == min_per_digest[digest]
        keep_final = keep_exact and did not in nd_drop
        cell = agg.setdefault(s, [0, 0, 0, 0])
        cell[0] += 1
        cell[1] += ntok
        if keep_exact:
            cell[2] += ntok
        if keep_final:
            cell[3] += ntok
    assert set(rows) == set(agg)
    for s, (nd, raw, exact, final) in agg.items():
        row = rows[s]
        assert row["n_docs"] == nd
        assert row["tokens_raw"] == raw
        assert row["tokens_exact"] == exact
        assert row["tokens_final"] == final
        assert row["yield_rate"] == pytest.approx(final / raw, abs=1e-3)


# ---------------------------------------------------------------------------
# q218 n-gram novelty
# ---------------------------------------------------------------------------


def test_q218_novelty_matches_shingle_census(spark, lsh_ref):
    _, ssets = lsh_ref
    rows = {
        r["doc_id"]: r for r in _q(spark, "q218_ngram_novelty").collect()
    }
    freq: dict[str, int] = {}
    for grams in ssets.values():
        for g in grams:
            freq[g] = freq.get(g, 0) + 1
    expected = {d for d, grams in ssets.items() if grams}
    assert set(rows) == expected
    for did in expected:
        grams = ssets[did]
        uniq = sum(1 for g in grams if freq[g] == 1)
        row = rows[did]
        assert row["n_shingles"] == len(grams)
        assert row["n_unique"] == uniq
        assert row["novelty"] == pytest.approx(
            uniq / len(grams), abs=1e-3
        )


# ---------------------------------------------------------------------------
# q151 exact heavy hitters (freq > n/K)
# ---------------------------------------------------------------------------


def test_q151_heavy_hitters_match_exact_census(spark):
    rows = {
        r["token"]: r["cnt"]
        for r in _q(spark, "q151_heavy_hitters").collect()
    }
    docs = _pdf("documents", "text")
    tf: dict[str, int] = {}
    for text in docs["text"]:
        for t in _toks(text):
            tf[t] = tf.get(t, 0) + 1
    total = sum(tf.values())
    hh = {t: c for t, c in tf.items() if c > total / 50}
    assert rows == hh
    assert len(hh) > 0  # non-vacuous on this Zipfian corpus


# ---------------------------------------------------------------------------
# q256 HLL union bridge: exact NDV columns
# ---------------------------------------------------------------------------


def test_q256_hll_bridge_matches_exact_ndv(spark):
    rows = {
        r["scope"]: r for r in _q(spark, "q256_hll_sketch_union").collect()
    }
    ev = _pdf("events", "user_id, event_type")
    per: dict[str, set] = {}
    allu = set()
    for uid, et in zip(ev["user_id"], ev["event_type"]):
        per.setdefault(et, set()).add(int(uid))
        allu.add(int(uid))
    assert set(rows) == set(per) | {"ALL"}
    for et, us in per.items():
        assert rows[et]["ndv_exact"] == len(us)
        assert bool(rows[et]["sketch_within_10pct"])
    assert rows["ALL"]["ndv_exact"] == len(allu)
    assert bool(rows["ALL"]["sketch_within_10pct"])


# ---------------------------------------------------------------------------
# q264 functional-dependency discovery
# ---------------------------------------------------------------------------


def test_q264_fd_discovery_matches_group_census(spark):
    rows = {
        (r["lhs"], r["rhs"]): r
        for r in _q(spark, "q264_fd_discovery").collect()
    }
    docs = _pdf("documents", "source, lang, n_chars")
    cands = {
        ("source", "lang"): lambda s, lg, b: (s, lg),
        ("lang", "source"): lambda s, lg, b: (lg, s),
        ("source", "len_bucket"): lambda s, lg, b: (s, b),
    }
    assert set(rows) == set(cands)
    for key, fn in cands.items():
        groups: dict[str, list] = {}
        for s, lg, nc in zip(docs["source"], docs["lang"], docs["n_chars"]):
            b = str(min(int(nc) // 100, 9))
            x, y = fn(s, lg, b)
            cell = groups.setdefault(x, [set(), 0])
            cell[0].add(y)
            cell[1] += 1
        n_viol = sum(1 for ys, _ in groups.values() if len(ys) > 1)
        row = rows[key]
        assert row["n_groups"] == len(groups)
        assert row["n_violating_groups"] == n_viol


# ---------------------------------------------------------------------------
# q222 boilerplate prefixes
# ---------------------------------------------------------------------------


def test_q222_prefixes_match_hash_groups(spark):
    rows = {
        r["doc_id"]: r
        for r in _q(spark, "q222_boilerplate_prefixes").collect()
    }
    docs = _pdf("documents", "doc_id, source, text")
    pref: dict[int, tuple[str, int]] = {}
    groups: dict[tuple[str, int], int] = {}
    for did, s, text in zip(docs["doc_id"], docs["source"], docs["text"]):
        tk = _toks(text)
        if len(tk) < 2:
            continue
        h = _h60(" ".join(tk[:2]))
        pref[int(did)] = (s, h)
        groups[(s, h)] = groups.get((s, h), 0) + 1
    flagged = {
        did: (s, h, groups[(s, h)])
        for did, (s, h) in pref.items()
        if groups[(s, h)] >= 2
    }
    assert set(rows) == set(flagged)
    for did, (s, h, n) in flagged.items():
        row = rows[did]
        assert row["source"] == s
        assert row["prefix_h"] == h
        assert row["n_sharing"] == n


# ---------------------------------------------------------------------------
# q281 bigram-perplexity terciles
# ---------------------------------------------------------------------------


def test_q281_perplexity_terciles_match_bigram_lm(spark):
    rows = {
        (r["source"], r["bucket"]): r["n_docs"]
        for r in _q(spark, "q281_lm_perplexity_buckets").collect()
    }
    docs = _pdf("documents", "doc_id, source, text")
    c2: dict[str, int] = {}
    c1: dict[str, int] = {}
    vocab = set()
    doc_bi: dict[int, tuple[str, list[str]]] = {}
    for did, s, text in zip(docs["doc_id"], docs["source"], docs["text"]):
        tk = _toks(text)
        vocab.update(tk)
        bi = [f"{a} {b}" for a, b in zip(tk, tk[1:])]
        if bi:
            doc_bi[int(did)] = (s, bi)
        for g in bi:
            c2[g] = c2.get(g, 0) + 1
            c1[g.split(" ")[0]] = c1.get(g.split(" ")[0], 0) + 1
    v = len(vocab)
    scored = []
    for did, (s, bi) in doc_bi.items():
        nll = [
            -math.log((c2[g] + 1.0) / (c1[g.split(" ")[0]] + v))
            for g in bi
        ]
        scored.append((round(sum(nll) / len(nll), 6), did, s))
    scored.sort()
    n, nb = len(scored), 3
    q, r = divmod(n, nb)
    cells: dict[tuple[str, int], int] = {}
    for rn1, (_, _, s) in enumerate(scored, start=1):
        cut = r * (q + 1)
        b = (rn1 - 1) // (q + 1) + 1 if rn1 <= cut \
            else (rn1 - cut - 1) // q + r + 1
        cells[(s, b)] = cells.get((s, b), 0) + 1
    assert rows == cells


# ---------------------------------------------------------------------------
# q292 cross-source LM transfer matrix
# ---------------------------------------------------------------------------


def test_q292_transfer_matrix_matches_folded_smoothing(spark):
    rows = {
        (r["src_eval"], r["src_train"]): r["cross_entropy"]
        for r in _q(spark, "q292_source_transfer_matrix").collect()
    }
    docs = _pdf("documents", "source, text")
    tf: dict[tuple[str, str], int] = {}
    for s, text in zip(docs["source"], docs["text"]):
        for t in _toks(text):
            tf[(s, t)] = tf.get((s, t), 0) + 1
    totals: dict[str, int] = {}
    for (s, _), c in tf.items():
        totals[s] = totals.get(s, 0) + c
    v = len({t for _, t in tf})
    by_term: dict[str, list[tuple[str, int]]] = {}
    for (s, t), c in tf.items():
        by_term.setdefault(t, []).append((s, c))
    m: dict[tuple[str, str], float] = {}
    for t, entries in by_term.items():
        for se, ce in entries:
            for st, ct in entries:
                m[(se, st)] = m.get((se, st), 0.0) + ce * math.log(ct + 1)
    assert set(rows) == set(m)
    for (se, st), mm in m.items():
        h = math.log(totals[st] + v) - mm / totals[se]
        assert rows[(se, st)] == pytest.approx(h, abs=1e-3)
