"""Independent brute-force references, round 10 batch L: the
incremental/streaming-adjacent dedup machinery and corpus-planning
leftovers.

q205 fixed-window duplicated substring spans, q211 serpentine
balanced shards, q219 incremental LSH admission against a standing
index, q241 one-row corpus datasheet, q252 consistent-hash ring
resharding, q263 bounded-BFS seed expansion, q268 leakage-safe
cluster split, q270 hot-bucket ledger (plus a non-vacuous check that
the guard's input really has no over-cap bucket on this corpus),
q290 truncation sweep. Pure-Python recomputation from raw parquet at
sf0.001, as in batches A-K.
"""

from __future__ import annotations

import hashlib
import math
import re

import duckdb
import pytest

from tests.conftest import SF_DIR
from tests.test_reference_math_r10f import (
    BUCKET_CAP,
    LSH_BANDS,
    LSH_ROWS,
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


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _toks(text: str) -> list[str]:
    return re.split(r"\s+", str(text).strip().lower())


def _band_keys_capped():
    """(doc_id, band, band_key) with the 64-member hot-bucket cap
    applied, plus the per-doc MinHash signatures - the q219 probe
    inputs, recomputed from scratch like batch F's pair pipeline."""
    docs = _pdf("documents", "doc_id, text")
    sigs: dict[int, list[int]] = {}
    for did, text in zip(docs["doc_id"], docs["text"]):
        tk = _toks(text)
        if len(tk) < 3:
            continue
        grams = [" ".join(tk[i: i + 3]) for i in range(len(tk) - 2)]
        xs = [_h60(g) % MINHASH_P for g in grams]
        sigs[int(did)] = [
            min(((2 * p + 1) * x + (1000003 * p + 12345)) % MINHASH_P
                for x in xs)
            for p in range(MINHASH_K)
        ]
    raw: dict[tuple[int, str], list[int]] = {}
    for did, sg in sigs.items():
        for band in range(LSH_BANDS):
            key = hashlib.md5(
                "_".join(
                    str(sg[band * LSH_ROWS + r]) for r in range(LSH_ROWS)
                ).encode()
            ).hexdigest()
            raw.setdefault((band, key), []).append(did)
    capped = {
        bk: ids for bk, ids in raw.items() if len(ids) <= BUCKET_CAP
    }
    return sigs, raw, capped


# ---------------------------------------------------------------------------
# q205 duplicated substring spans
# ---------------------------------------------------------------------------


def test_q205_substring_spans_match_window_census(spark):
    rows = {}
    for r in _q(spark, "q205_substring_dup_spans").collect():
        rows[(int(r["doc_id"]), int(r["span_start"]))] = int(r["n_docs"])
    docs = _pdf("documents", "doc_id, text")
    W, STRIDE = 8, 4
    wins: list[tuple[int, int, int]] = []
    by_hash: dict[int, set[int]] = {}
    for did, text in zip(docs["doc_id"], docs["text"]):
        tk = _toks(text)
        for pos in range(1, len(tk) - (W - 1) + 1, STRIDE):
            h = _h60(" ".join(tk[pos - 1: pos - 1 + W]))
            wins.append((int(did), pos, h))
            by_hash.setdefault(h, set()).add(int(did))
    ref = {
        (did, pos): len(by_hash[h])
        for did, pos, h in wins
        if len(by_hash[h]) >= 2
    }
    assert rows == ref
    assert len(ref) > 0


# ---------------------------------------------------------------------------
# q211 serpentine balanced shards
# ---------------------------------------------------------------------------


def test_q211_snake_shards_match_global_ranking(spark):
    rows = {
        int(r["shard"]): r
        for r in _q(spark, "q211_balanced_token_shards").collect()
    }
    docs = _pdf("documents", "doc_id, text")
    lens = sorted(
        ((-len(_toks(t)), int(d)) for d, t in zip(docs["doc_id"], docs["text"]))
    )
    agg: dict[int, list[int]] = {}
    for rn0, (neg_n, _) in enumerate(lens):
        blk, off = divmod(rn0, 8)
        shard = off if blk % 2 == 0 else 7 - off
        cell = agg.setdefault(shard, [0, 0])
        cell[0] += 1
        cell[1] += -neg_n
    assert set(rows) == set(agg)
    for shard, (nd, tok) in agg.items():
        assert rows[shard]["n_docs"] == nd
        assert rows[shard]["tok_total"] == tok
    # serpentine guarantee: shard token totals within one max-doc
    totals = [tok for _, tok in agg.values()]
    max_doc = max(-n for n, _ in lens)
    assert max(totals) - min(totals) <= max_doc


# ---------------------------------------------------------------------------
# q219 incremental LSH admission
# ---------------------------------------------------------------------------


def test_q219_incremental_admission_matches_probe(spark):
    rows = {
        int(r["doc_id"]): r
        for r in _q(spark, "q219_incremental_lsh_dedup").collect()
    }
    sigs, _, capped = _band_keys_capped()
    cand: set[tuple[int, int]] = set()
    for ids in capped.values():
        new = [d for d in ids if d % 10 == 0]
        old = [d for d in ids if d % 10 != 0]
        for a in new:
            for b in old:
                cand.add((a, b))
    best: dict[int, tuple[float, int]] = {}
    for a, b in cand:
        agree = sum(1 for x, y in zip(sigs[a], sigs[b]) if x == y) / 8.0
        if agree < 0.5:
            continue
        cur = best.get(a)
        if cur is None or (-agree, b) < (-cur[0], cur[1]):
            best[a] = (agree, b)
    docs = _pdf("documents", "doc_id")
    batch = {int(d) for d in docs["doc_id"] if int(d) % 10 == 0}
    assert set(rows) == batch
    for did in batch:
        row = rows[did]
        if did in best:
            agree, old = best[did]
            assert bool(row["is_dup"])
            assert row["match_id"] == old
            assert row["match_agree"] == pytest.approx(
                round(agree, 4), abs=1e-9
            )
        else:
            assert not bool(row["is_dup"])
            assert row["match_id"] is None
    assert len(best) > 0  # non-vacuous: the batch contains near-dups


# ---------------------------------------------------------------------------
# q241 corpus datasheet
# ---------------------------------------------------------------------------


def test_q241_datasheet_matches_composed_stats(spark):
    pairs, _ = _python_lsh_pairs()
    row = _q(spark, "q241_corpus_datasheet").collect()[0]
    docs = _pdf("documents", "doc_id, source, lang, text")
    n = len(docs)
    digests = {
        hashlib.md5(str(t).encode()).hexdigest() for t in docs["text"]
    }
    mean_tokens = sum(len(_toks(t)) for t in docs["text"]) / n
    langs: dict[str, int] = {}
    for lg in docs["lang"]:
        langs[lg] = langs.get(lg, 0) + 1
    top_lang = min(langs, key=lambda lg: (-langs[lg], lg))
    assert row["n_docs"] == n
    assert row["n_sources"] == len(set(docs["source"]))
    assert row["n_langs"] == len(langs)
    assert row["mean_tokens"] == pytest.approx(mean_tokens, abs=1e-1)
    assert row["exact_dup_rate"] == pytest.approx(
        1.0 - len(digests) / n, abs=1e-3
    )
    assert row["neardup_pairs"] == len(pairs)
    assert row["top_lang"] == top_lang


# ---------------------------------------------------------------------------
# q252 consistent-hash resharding
# ---------------------------------------------------------------------------


def _ring_assign(h: int, n_shards: int) -> int:
    by_pos: dict[int, int] = {}
    for s in range(n_shards):
        for v in range(16):
            pos = _h60(f"shard#{s}#{v}")
            if pos not in by_pos or s < by_pos[pos]:
                by_pos[pos] = s
    positions = sorted(by_pos)
    for p in positions:
        if p >= h:
            return by_pos[p]
    return by_pos[positions[0]]


def test_q252_ring_transition_matches_clockwise_walk(spark):
    rows = {
        (int(r["shard_before"]), int(r["shard_after"])): r
        for r in _q(spark, "q252_consistent_hash_shards").collect()
    }
    docs = _pdf("documents", "doc_id")
    cells: dict[tuple[int, int], int] = {}
    moved_total = n = 0
    for did in docs["doc_id"]:
        h = _h60(str(int(did)))
        b, a = _ring_assign(h, 4), _ring_assign(h, 5)
        cells[(b, a)] = cells.get((b, a), 0) + 1
        n += 1
        if b != a:
            moved_total += 1
    assert set(rows) == set(cells)
    for key, c in cells.items():
        assert rows[key]["n_docs"] == c
        assert bool(rows[key]["moved"]) == (key[0] != key[1])
    # the consistent-hashing claim itself: far fewer than all keys move
    assert moved_total < 0.5 * n


# ---------------------------------------------------------------------------
# q263 bounded-BFS seed expansion
# ---------------------------------------------------------------------------


def test_q263_seed_expansion_matches_bfs(spark):
    pairs, _ = _python_lsh_pairs()
    rows = {
        int(r["doc_id"]): int(r["hop"])
        for r in _q(spark, "q263_seed_expansion").collect()
    }
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    docs = _pdf("documents", "doc_id")
    seeds = {int(d) for d in docs["doc_id"] if int(d) < 10}
    hop = {d: 0 for d in seeds}
    frontier = set(seeds)
    for h in (1, 2):
        nxt = set()
        for d in frontier:
            for nb in adj.get(d, ()):
                if nb not in hop:
                    nxt.add(nb)
        for d in nxt:
            hop[d] = h
        frontier = nxt
    assert rows == hop


# ---------------------------------------------------------------------------
# q268 leakage-safe cluster split
# ---------------------------------------------------------------------------


def test_q268_cluster_split_matches_and_is_leak_free(spark):
    pairs, _ = _python_lsh_pairs()
    rows = {
        int(r["doc_id"]): r
        for r in _q(spark, "q268_leakage_safe_split").collect()
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
    docs = _pdf("documents", "doc_id")
    for d in docs["doc_id"]:
        did = int(d)
        cid = find(did) if did in parent else did
        b = _h60(str(cid)) % 100
        part = "train" if b < 80 else ("validation" if b < 90 else "test")
        row = rows[did]
        assert row["cluster_id"] == cid
        assert row["part"] == part
    # the construction guarantee: no candidate pair crosses splits
    for a, b in pairs:
        assert rows[a]["part"] == rows[b]["part"]


# ---------------------------------------------------------------------------
# q270 hot-bucket ledger
# ---------------------------------------------------------------------------


def test_q270_hot_buckets_match_uncapped_census(spark):
    got = {
        (int(r["band"]), r["band_key"]): int(r["n_members"])
        for r in _q(spark, "q270_lsh_hot_buckets").collect()
    }
    _, raw, _ = _band_keys_capped()
    ref = {
        bk: len(ids) for bk, ids in raw.items() if len(ids) > BUCKET_CAP
    }
    assert got == ref
    # non-vacuity of the EMPTY result: the census itself is real -
    # buckets exist and the largest is far below the cap
    assert len(raw) > 0
    assert max(len(ids) for ids in raw.values()) <= BUCKET_CAP


# ---------------------------------------------------------------------------
# q290 truncation sweep
# ---------------------------------------------------------------------------


def test_q290_truncation_sweep_matches_piecewise_sums(spark):
    rows = {
        int(r["max_len"]): r
        for r in _q(spark, "q290_truncation_sweep").collect()
    }
    docs = _pdf("documents", "text")
    lens = [len(_toks(t)) for t in docs["text"]]
    total = sum(lens)
    for ml in (16, 32, 64, 128):
        kept = sum(min(n, ml) for n in lens)
        lost = sum(max(n - ml, 0) for n in lens)
        row = rows[ml]
        assert row["n_truncated"] == sum(1 for n in lens if n > ml)
        assert row["tokens_kept"] == kept
        assert row["tokens_lost"] == lost
        assert row["loss_share"] == pytest.approx(
            lost / total, abs=1.1e-6
        )
        assert row["fill_ratio"] == pytest.approx(
            kept / (len(lens) * ml), abs=1.1e-6
        )
