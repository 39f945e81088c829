"""Independent brute-force references, round 10 batch M: the semantic
dedup composition chain, corpus assembly, and bit-level keys.

q209 SemDeDup in-cluster pairwise marks, q220 corpus assembly
(sqrt-weighted largest-remainder quotas + hash picks), q228
cross-lingual near-dups, q231 quality-vs-duplication calibration
(exact global NTILE), q298 the end-to-end corpus plan (gate -> exact
dedup -> near-dup drop -> temperature mixture), q69 BPE-ish regex
tokens, q117 Morton Z-order interleave (re-derived bit by bit).
Pure-Python recomputation from raw parquet at sf0.001, as in batches
A-L.
"""

from __future__ import annotations

import hashlib
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


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _toks(text: str) -> list[str]:
    return re.split(r"\s+", str(text).strip().lower())


def _vecs():
    con = duckdb.connect()
    emb = con.execute(
        f"SELECT vec_id, label, embedding"
        f" FROM read_parquet('{SF_DIR}/embeddings.parquet')"
    ).df()
    vecs, labels = {}, {}
    for v, lb, e in zip(emb["vec_id"], emb["label"], emb["embedding"]):
        vecs[int(v)] = [float(x) for x in e]
        labels[int(v)] = int(lb)
    return vecs, labels


def _dot(a, b):
    dp = 0.0
    for x, y in zip(a, b):
        dp += x * y
    return dp


def _assignment(vecs, labels):
    """q99's k-means assignment step (re-derived; its own reference is
    batch J's test)."""
    by_label: dict[int, list] = {}
    for v, x in vecs.items():
        by_label.setdefault(labels[v], []).append(x)
    cents = {
        lb: [sum(m[d] for m in ms) / len(ms) for d in range(64)]
        for lb, ms in by_label.items()
    }
    out = {}
    for v, x in vecs.items():
        out[v] = max(
            ((_dot(x, cents[lb]), lb) for lb in sorted(cents))
        )[1]
    return out


# ---------------------------------------------------------------------------
# q209 SemDeDup
# ---------------------------------------------------------------------------


def test_q209_semdedup_matches_in_cluster_pairs(spark):
    rows = {
        int(r["vec_id"]): r
        for r in _q(spark, "q209_semantic_cluster_dedup").collect()
    }
    vecs, labels = _vecs()
    assign = _assignment(vecs, labels)
    by_cluster: dict[int, list[int]] = {}
    for v, c in assign.items():
        by_cluster.setdefault(c, []).append(v)
    expected = {}
    for c, ids in by_cluster.items():
        ids = sorted(ids)
        for j, b in enumerate(ids):
            sims = [
                _dot(vecs[a], vecs[b]) for a in ids[:j]
                if _dot(vecs[a], vecs[b]) >= 0.4
            ]
            if sims:
                expected[b] = (c, len(sims), round(max(sims), 6))
    assert set(rows) == set(expected)
    for b, (c, n, mx) in expected.items():
        row = rows[b]
        assert row["cluster"] == c
        assert row["n_better"] == n
        assert row["max_sim"] == pytest.approx(mx, abs=1e-5)


# ---------------------------------------------------------------------------
# q220 corpus assembly
# ---------------------------------------------------------------------------


def test_q220_assembly_matches_quota_apportionment(spark):
    rows = {
        r["doc_id"]: r for r in _q(spark, "q220_corpus_assembly").collect()
    }
    docs = _pdf("documents", "doc_id, source, lang")
    cells: dict[tuple[str, str], list[int]] = {}
    for did, s, lg in zip(docs["doc_id"], docs["source"], docs["lang"]):
        cells.setdefault((s, lg), []).append(int(did))
    w = {k: math.sqrt(len(ids)) for k, ids in cells.items()}
    wsum = sum(w.values())
    share = {k: round(ww * 100 / wsum, 6) for k, ww in w.items()}
    base = {k: math.floor(sh) for k, sh in share.items()}
    rem = {k: share[k] - base[k] for k in share}
    order = sorted(share, key=lambda k: (-rem[k], k[0], k[1]))
    leftover = 100 - sum(base.values())
    quota = {}
    for i, k in enumerate(order, start=1):
        q = base[k] + (1 if i <= leftover else 0)
        quota[k] = min(q, len(cells[k]))
    expected = {}
    for k, ids in cells.items():
        ranked = sorted(ids, key=lambda d: (_h60(str(d)), d))
        for rk, did in enumerate(ranked, start=1):
            if rk <= quota[k]:
                expected[did] = (k[0], k[1], rk, quota[k])
    assert set(rows) == set(expected)
    for did, (s, lg, rk, q) in expected.items():
        row = rows[did]
        assert (row["source"], row["lang"]) == (s, lg)
        assert row["cell_rank"] == rk
        assert row["cell_quota"] == q


# ---------------------------------------------------------------------------
# q228 cross-lingual near-dups
# ---------------------------------------------------------------------------


def test_q228_crosslingual_matches_filtered_bucket_join(spark):
    rows = {
        (int(r["doc_a"]), int(r["doc_b"])): r
        for r in _q(spark, "q228_crosslingual_neardup").collect()
    }
    vecs, _ = _vecs()
    docs = _pdf("documents", "doc_id, lang")
    lang = {int(d): lg for d, lg in zip(docs["doc_id"], docs["lang"])}
    buckets: dict[int, list[int]] = {}
    for vid, x in vecs.items():
        b = sum(
            (1 << i) for i, d in enumerate((2, 18, 34, 50)) if x[d - 1] > 0.0
        )
        buckets.setdefault(b, []).append(vid)
    expected = {}
    for ids in buckets.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a, b = ids[i], ids[j]
                dp = _dot(vecs[a], vecs[b])
                if dp >= 0.4 and lang[a] != lang[b]:
                    expected[(a, b)] = (lang[a], lang[b], round(dp, 6))
    assert set(rows) == set(expected)
    for key, (la, lb, cs) in expected.items():
        row = rows[key]
        assert (row["lang_a"], row["lang_b"]) == (la, lb)
        assert row["cos_sim"] == pytest.approx(cs, abs=1e-5)


# ---------------------------------------------------------------------------
# q231 quality-vs-duplication calibration
# ---------------------------------------------------------------------------


def test_q231_calibration_matches_decile_census(spark):
    pairs, _ = _python_lsh_pairs()
    flagged = {d for p in pairs for d in p}
    rows = {
        int(r["decile"]): r
        for r in _q(spark, "q231_quality_dup_calibration").collect()
    }
    docs = _pdf("documents", "doc_id, text")
    recs = sorted(
        (
            (1000 * len(set(_toks(t)))) // len(_toks(t)),
            int(d),
        )
        for d, t in zip(docs["doc_id"], docs["text"])
    )
    total, nb = len(recs), 10
    q, r = divmod(total, nb)
    cells: dict[int, list[int]] = {}
    for rn1, (_, did) in enumerate(recs, start=1):
        cut = r * (q + 1)
        b = (rn1 - 1) // (q + 1) + 1 if rn1 <= cut \
            else (rn1 - cut - 1) // q + r + 1
        cell = cells.setdefault(b, [0, 0])
        cell[0] += 1
        if did in flagged:
            cell[1] += 1
    assert set(rows) == set(cells)
    for b, (nd, ndup) in cells.items():
        row = rows[b]
        assert row["n_docs"] == nd
        assert row["n_dup"] == ndup
        assert row["dup_rate"] == pytest.approx(ndup / nd, abs=1e-3)


# ---------------------------------------------------------------------------
# q298 the corpus plan (gate + dedup + mixture composed)
# ---------------------------------------------------------------------------

_STOPS = ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")


def test_q298_corpus_plan_matches_composed_pipeline(spark):
    pairs, _ = _python_lsh_pairs()
    nd_drop = {b for _, b in pairs}
    rows = {
        r["source"]: r for r in _q(spark, "q298_corpus_plan").collect()
    }
    docs = _pdf("documents", "doc_id, source, text")
    min_per_digest: dict[str, int] = {}
    recs = []
    stops = set(_STOPS)
    for did, s, text in zip(docs["doc_id"], docs["source"], docs["text"]):
        did = int(did)
        tk = _toks(text)
        digest = hashlib.md5(str(text).encode()).hexdigest()
        keep_q = (
            20 <= len(tk) <= 80
            and len(set(tk)) / len(tk) >= 0.4
            and sum(1 for t in tk if t in stops) / len(tk) >= 0.02
        )
        recs.append((did, s, len(tk), digest, keep_q))
        if digest not in min_per_digest or did < min_per_digest[digest]:
            min_per_digest[digest] = did
    g: dict[str, list[int]] = {}
    for did, s, ntok, digest, keep_q in recs:
        if keep_q and did == min_per_digest[digest] and did not in nd_drop:
            cell = g.setdefault(s, [0, 0])
            cell[0] += 1
            cell[1] += ntok
    ct = sum(tok for _, tok in g.values())
    uw = {s: (tok / ct) ** 0.5 for s, (_, tok) in g.items()}
    zs = sum(uw.values())
    assert set(rows) == set(g)
    for s, (nd, tok) in g.items():
        row = rows[s]
        assert row["n_docs"] == nd
        assert row["clean_tok"] == tok
        w = uw[s] / zs
        assert row["weight"] == pytest.approx(w, abs=1.1e-6)
        assert row["planned_tok"] == math.floor(w * ct * 0.5 + 0.5)


# ---------------------------------------------------------------------------
# q69 BPE-ish regex tokens
# ---------------------------------------------------------------------------


def test_q69_bpe_tokens_match_regex_census(spark):
    rows = {
        r["doc_id"]: r for r in _q(spark, "q69_bpe_tokens").collect()
    }
    docs = _pdf("documents", "doc_id, text")
    for did, text in zip(docs["doc_id"], docs["text"]):
        low = str(text).lower()
        row = rows[int(did)]
        assert row["n_bpe_tokens"] == len(
            re.findall(r"[a-z]+|[0-9]+|[^a-z0-9\s]", low)
        )
        assert row["n_number_runs"] == len(re.findall(r"[0-9]+", low))


# ---------------------------------------------------------------------------
# q117 Morton Z-order key
# ---------------------------------------------------------------------------


def test_q117_zorder_matches_bit_interleave(spark):
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic
    # lineitem, so compare sorted multisets of full output rows.
    got = sorted(
        (int(r["l_orderkey"]), int(r["l_linenumber"]), int(r["zkey"]))
        for r in _q(spark, "q117_zorder_key").collect()
    )
    li = _pdf("lineitem", "l_orderkey, l_linenumber, l_partkey, l_suppkey")
    ref = []
    for ok, ln, pk, sk in zip(
        li["l_orderkey"], li["l_linenumber"], li["l_partkey"], li["l_suppkey"]
    ):
        px, sx = int(pk) % 65536, int(sk) % 65536
        z = 0
        for i in range(16):
            z |= ((px >> i) & 1) << (2 * i + 1)
            z |= ((sx >> i) & 1) << (2 * i)
        ref.append((int(ok), int(ln), z))
    assert got == sorted(ref)
