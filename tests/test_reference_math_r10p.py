"""Independent brute-force references, round 10 batch P: TF-IDF,
splits, packing, bitmap NDV, hierarchies, and sampling estimators.

q77 TF-IDF top terms, q79 hash split, q81 PII redaction (regex
re-run + fingerprint), q86 sequence packing (concat-then-chunk
offsets), q139 bitmap exact NDV, q178 triangle count, q197 subtree
rollup (direct recursion vs the engine's fixed-point loop), q208
dimension-wise embedding stats, q261 source-centroid similarity map,
q274 native recursive CTE ancestors, q308 per-source OLS, q323
bottom-k sample quantiles vs exact. Pure-Python recomputation from
raw parquet at sf0.001, as in batches A-O.
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


# ---------------------------------------------------------------------------
# q77 TF-IDF top terms
# ---------------------------------------------------------------------------


def test_q77_tfidf_matches_census(spark):
    rows = {
        (r["doc_id"], int(r["rk"])): r
        for r in _q(spark, "q77_tfidf_topterms").collect()
    }
    docs = _pdf("documents", "doc_id, text")
    tf: dict[tuple[int, str], int] = {}
    df: dict[str, set] = {}
    for did, text in zip(docs["doc_id"], docs["text"]):
        for t in _toks(text):
            tf[(int(did), t)] = tf.get((int(did), t), 0) + 1
            df.setdefault(t, set()).add(int(did))
    n = len(docs)
    per_doc: dict[int, list[tuple[float, str]]] = {}
    for (did, t), c in tf.items():
        score = c * math.log(n / len(df[t]))
        per_doc.setdefault(did, []).append((-score, t))
    for did, items in per_doc.items():
        items.sort()
        for rk, (neg, t) in enumerate(items[:3], start=1):
            row = rows[(did, rk)]
            assert row["term"] == t
            assert row["tfidf"] == pytest.approx(-neg, abs=1e-4)


# ---------------------------------------------------------------------------
# q79 hash split
# ---------------------------------------------------------------------------


def test_q79_hash_split_matches_bucket_map(spark):
    rows = {
        r["doc_id"]: r for r in _q(spark, "q79_hash_split").collect()
    }
    docs = _pdf("documents", "doc_id")
    for did in docs["doc_id"]:
        did = int(did)
        b = _h60(str(did)) % 100
        row = rows[did]
        assert row["bucket"] == b
        assert row["split"] == (
            "train" if b < 80 else ("validation" if b < 90 else "test")
        )


# ---------------------------------------------------------------------------
# q81 PII redaction
# ---------------------------------------------------------------------------


def test_q81_pii_redaction_matches_regex_rerun(spark):
    rows = {
        r["doc_id"]: r for r in _q(spark, "q81_pii_redaction").collect()
    }
    docs = _pdf("documents", "doc_id, text")
    email = re.compile(r"[a-z0-9.]+@[a-z0-9.]+\.[a-z]+")
    phone = re.compile(r"\+1-555-[0-9]{4}")
    for did, text in zip(docs["doc_id"], docs["text"]):
        did = int(did)
        s = (
            f"{text} contact user{did}@example.com or "
            f"+1-555-{did % 10000:04d}"
        )
        red = phone.sub("<PHONE>", email.sub("<EMAIL>", s))
        row = rows[did]
        assert row["n_emails"] == len(email.findall(s))
        assert row["n_phones"] == len(phone.findall(s))
        assert row["redacted_fp"] == hashlib.md5(red.encode()).hexdigest()


# ---------------------------------------------------------------------------
# q86 sequence packing
# ---------------------------------------------------------------------------


def test_q86_packing_matches_concat_then_chunk(spark):
    rows = {}
    for r in _q(spark, "q86_sequence_packing").collect():
        rows[(int(r["shard"]), int(r["doc_id"]), int(r["chunk_id"]))] = (
            int(r["tok_start"]), int(r["tok_end"]),
        )
    docs = _pdf("documents", "doc_id, text")
    shards: dict[int, list[tuple[int, int]]] = {}
    for did, text in zip(docs["doc_id"], docs["text"]):
        did = int(did)
        shards.setdefault(_h60(str(did)) % 8, []).append(
            (did, len(_toks(text)))
        )
    SEQ = 512
    ref = {}
    for sh, items in shards.items():
        items.sort()
        cum = 0
        for did, n in items:
            st, cum = cum, cum + n
            for chunk in range(st // SEQ, (cum - 1) // SEQ + 1):
                lo = chunk * SEQ
                ref[(sh, did, chunk)] = (
                    max(st, lo) - lo, min(cum, lo + SEQ) - lo,
                )
    assert rows == ref


# ---------------------------------------------------------------------------
# q139 bitmap exact NDV
# ---------------------------------------------------------------------------


def test_q139_bitmap_ndv_matches_exact_distinct(spark):
    rows = {
        r["event_type"]: int(r["ndv_users"])
        for r in _q(spark, "q139_bitmap_distinct").collect()
    }
    con = duckdb.connect()
    ev = con.execute(
        f"SELECT event_type, user_id"
        f" FROM read_parquet('{SF_DIR}/events.parquet')"
    ).df()
    per: dict[str, set] = {}
    for et, uid in zip(ev["event_type"], ev["user_id"]):
        per.setdefault(et, set()).add(int(uid))
    assert rows == {et: len(us) for et, us in per.items()}


# ---------------------------------------------------------------------------
# q178 triangle count on the trade graph
# ---------------------------------------------------------------------------


def test_q178_triangles_match_ordered_enumeration(spark):
    row = _q(spark, "q178_triangle_count").collect()[0]
    li = _pdf("lineitem", "l_orderkey, l_suppkey")
    sup = {
        int(k): int(n)
        for k, n in zip(*_pdf("supplier", "s_suppkey, s_nationkey")
                        .to_dict("list").values())
    }
    orders = {
        int(k): int(c)
        for k, c in zip(*_pdf("orders", "o_orderkey, o_custkey")
                        .to_dict("list").values())
    }
    cust = {
        int(k): int(n)
        for k, n in zip(*_pdf("customer", "c_custkey, c_nationkey")
                        .to_dict("list").values())
    }
    nation = {
        int(k): str(n)
        for k, n in zip(*_pdf("nation", "n_nationkey, n_name")
                        .to_dict("list").values())
    }
    und = set()
    for ok, sk in zip(li["l_orderkey"], li["l_suppkey"]):
        src = nation[sup[int(sk)]]
        dst = nation[cust[orders[int(ok)]]]
        if src != dst:
            und.add((min(src, dst), max(src, dst)))
    tri = 0
    for a, b in und:
        for b2, c in und:
            if b2 == b and (a, c) in und:
                tri += 1
    assert row["n_triangles"] == tri
    assert tri > 0


# ---------------------------------------------------------------------------
# q197 subtree rollup
# ---------------------------------------------------------------------------


def test_q197_subtree_rollup_matches_direct_recursion(spark):
    rows = {
        int(r["p_partkey"]): r
        for r in _q(spark, "q197_subtree_rollup").collect()
    }
    p = _pdf("part", "p_partkey, p_retailprice")
    own = {int(k): float(v) for k, v in zip(p["p_partkey"], p["p_retailprice"])}
    children: dict[int, list[int]] = {}
    for k in own:
        if k > 0:
            children.setdefault((k - 1) // 4, []).append(k)
    import sys

    sys.setrecursionlimit(100_000)
    memo: dict[int, tuple[float, int]] = {}

    def sub(k):
        if k in memo:
            return memo[k]
        v, s = own[k], 1
        for c in children.get(k, ()):
            cv, cs = sub(c)
            v += cv
            s += cs
        memo[k] = (v, s)
        return memo[k]

    assert set(rows) == set(own)
    for k in own:
        v, s = sub(k)
        row = rows[k]
        assert row["subtree_size"] == s
        assert row["subtree_value"] == pytest.approx(v, abs=2e-2)


# ---------------------------------------------------------------------------
# q208 dimension-wise embedding stats
# ---------------------------------------------------------------------------


def test_q208_dimwise_stats_match_moment_census(spark):
    rows = {
        int(r["dim"]): r
        for r in _q(spark, "q208_dimwise_embedding_stats").collect()
    }
    con = duckdb.connect()
    emb = con.execute(
        f"SELECT embedding FROM read_parquet('{SF_DIR}/embeddings.parquet')"
    ).df()
    vecs = [[float(x) for x in e] for e in emb["embedding"]]
    n = len(vecs)
    for d in range(64):
        vals = [v[d] for v in vecs]
        mu = sum(vals) / n
        sd = math.sqrt(sum((x - mu) ** 2 for x in vals) / n)
        row = rows[d]
        assert row["n"] == n
        assert row["mean"] == pytest.approx(mu, abs=1e-4)
        assert row["sd"] == pytest.approx(sd, abs=1e-4)
        assert row["lo"] == pytest.approx(min(vals), abs=1e-9)
        assert row["hi"] == pytest.approx(max(vals), abs=1e-9)


# ---------------------------------------------------------------------------
# q261 source-centroid similarity map
# ---------------------------------------------------------------------------


def test_q261_source_map_matches_centroid_cosines(spark):
    rows = {
        (r["source_a"], r["source_b"]): r["cos_sim"]
        for r in _q(spark, "q261_source_similarity_map").collect()
    }
    docs = _pdf("documents", "doc_id, source")
    con = duckdb.connect()
    emb = con.execute(
        f"SELECT vec_id, embedding"
        f" FROM read_parquet('{SF_DIR}/embeddings.parquet')"
    ).df()
    vecs = {
        int(v): [float(x) for x in e]
        for v, e in zip(emb["vec_id"], emb["embedding"])
    }
    per: dict[str, list] = {}
    for did, s in zip(docs["doc_id"], docs["source"]):
        if int(did) in vecs:
            per.setdefault(s, []).append(vecs[int(did)])
    cents = {
        s: [sum(v[d] for v in vs) / len(vs) for d in range(64)]
        for s, vs in per.items()
    }
    norms = {
        s: math.sqrt(sum(x * x for x in c)) for s, c in cents.items()
    }
    srcs = sorted(cents)
    for i in range(len(srcs)):
        for j in range(i + 1, len(srcs)):
            a, b = srcs[i], srcs[j]
            dp = sum(x * y for x, y in zip(cents[a], cents[b]))
            assert rows[(a, b)] == pytest.approx(
                dp / (norms[a] * norms[b]), abs=1e-3
            )


# ---------------------------------------------------------------------------
# q274 native recursive CTE
# ---------------------------------------------------------------------------


def test_q274_recursion_matches_arithmetic_walk(spark):
    rows = {
        int(r["p_partkey"]): r
        for r in _q(spark, "q274_recursive_ancestors").collect()
    }
    p = _pdf("part", "p_partkey")
    for k in p["p_partkey"]:
        k = int(k)
        cur, depth = k, 0
        while (cur - 1) // 4 > 0:
            cur = (cur - 1) // 4
            depth += 1
        row = rows[k]
        assert row["root_key"] == cur
        assert row["depth"] == depth


# ---------------------------------------------------------------------------
# q308 per-source OLS of score on tokens
# ---------------------------------------------------------------------------


def test_q308_ols_matches_integer_moments(spark):
    rows = {
        r["source"]: r
        for r in _q(spark, "q308_ols_score_on_tokens").collect()
    }
    docs = _pdf("documents", "source, text")
    pts: dict[str, list[tuple[int, int]]] = {}
    for s, text in zip(docs["source"], docs["text"]):
        tk = _toks(text)
        pts.setdefault(s, []).append(
            (len(tk), (1000 * len(set(tk))) // len(tk))
        )
    for s, xy in pts.items():
        n = len(xy)
        sx = sum(x for x, _ in xy)
        sy = sum(y for _, y in xy)
        sxx = sum(x * x for x, _ in xy)
        syy = sum(y * y for _, y in xy)
        sxy = sum(x * y for x, y in xy)
        num = n * sxy - sx * sy
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        slope = num / vx
        row = rows[s]
        assert row["n_docs"] == n
        assert row["slope"] == pytest.approx(slope, abs=1e-4)
        assert row["intercept"] == pytest.approx(
            (sy - slope * sx) / n, abs=1e-3
        )
        assert row["r_squared"] == pytest.approx(
            (num * num) / (vx * vy), abs=1e-4
        )


# ---------------------------------------------------------------------------
# q323 bottom-k sample quantiles
# ---------------------------------------------------------------------------


def test_q323_bottomk_quantiles_match_hash_sample(spark):
    row = _q(spark, "q323_bottomk_sample_quantiles").collect()[0]
    docs = _pdf("documents", "doc_id, n_chars")
    keyed = sorted(
        (_h60(str(int(d))), int(d), int(n))
        for d, n in zip(docs["doc_id"], docs["n_chars"])
    )
    samp = sorted(v for _, _, v in keyed[:256])
    k = len(samp)

    def est(q):
        return samp[math.ceil(q * k) - 1]

    allv = sorted(int(n) for n in docs["n_chars"])
    n_total = len(allv)

    def disc(q):
        # percentile_disc: smallest value with cume_dist >= q
        return allv[math.ceil(q * n_total) - 1]

    assert row["n_total"] == n_total
    assert row["k"] == k
    assert row["est_p25"] == est(0.25)
    assert row["est_p50"] == est(0.50)
    assert row["est_p75"] == est(0.75)
    assert row["exact_p25"] == disc(0.25)
    assert row["exact_p50"] == disc(0.50)
    assert row["exact_p75"] == disc(0.75)
