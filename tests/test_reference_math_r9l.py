"""Twelfth batch of independent brute-force references: q297
(Fellegi-Sunter), q324 (LSH S-curve sweep), q342 (order-independent
digest), q348 (epoch allocation), q333 (negative-sampling table).
Independent-math coverage: 100 operators."""

from __future__ import annotations

import hashlib
import math
import re

import duckdb
import pytest

from tests.conftest import SF_DIR
from tests.test_reference_math_r9 import _pdf, _q, _tdiv


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------------------
# q297 Fellegi-Sunter linkage weights
# ---------------------------------------------------------------------------


def test_q297_fellegi_sunter_matches_direct_weights(spark):
    rows = {
        r["weight_bucket"]: r
        for r in _q(spark, "q297_fellegi_sunter_weights").collect()
    }
    con = duckdb.connect()
    part = con.execute(
        f"SELECT p_partkey, p_name, p_brand, p_type, p_size FROM "
        f"read_parquet('{SF_DIR}/part.parquet')"
    ).df()
    n = len(part)
    fields = ("p_brand", "p_type", "p_size")
    u = {}
    for f in fields:
        cnt: dict = {}
        for v in part[f]:
            cnt[v] = cnt.get(v, 0) + 1
        u[f] = sum(c * c for c in cnt.values()) / (n * n)
    recs = []
    for pk, name, brand, typ, size in zip(
        part["p_partkey"], part["p_name"], part["p_brand"],
        part["p_type"], part["p_size"],
    ):
        blk = " ".join(str(name).split(" ")[:2])
        recs.append((int(pk), blk, (brand, typ, size)))
    blocks: dict[str, list] = {}
    for pk, blk, vals in recs:
        blocks.setdefault(blk, []).append((pk, vals))
    buckets: dict[int, list[int]] = {}
    m = 0.9
    for members in blocks.values():
        members.sort()
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                w = 0.0
                agree = 0
                for f, va, vb in zip(
                    fields, members[i][1], members[j][1]
                ):
                    if va == vb:
                        w += math.log(m / u[f])
                        agree += 1
                    else:
                        w += math.log((1 - m) / (1 - u[f]))
                b = buckets.setdefault(int(round(w, 0)), [0, 0])
                b[0] += 1
                b[1] += agree
    assert set(rows) == set(buckets)
    for wb, (np_, ag) in buckets.items():
        row = rows[wb]
        assert row["n_pairs"] == np_
        assert row["avg_fields_agree"] == pytest.approx(
            ag / np_, abs=1e-4
        )


# ---------------------------------------------------------------------------
# q324 LSH (bands, rows) S-curve sweep
# ---------------------------------------------------------------------------


def _shingle_set(text: str) -> frozenset:
    toks = re.split(r"\s+", text.strip().lower())
    return frozenset(
        " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
    )


def test_q324_sweep_matches_direct_s_curve(spark):
    rows = {
        (r["bands"], r["rows_per_band"]): r
        for r in _q(spark, "q324_lsh_parameter_sweep").collect()
    }
    docs = _pdf("documents", "doc_id, source, text")
    sample = [
        (int(d), g, _shingle_set(t))
        for d, g, t in zip(docs["doc_id"], docs["source"], docs["text"])
        if int(d) % 5 == 0
    ]
    pairs = []
    for i in range(len(sample)):
        for j in range(i + 1, len(sample)):
            a, b = sample[i], sample[j]
            if a[1] != b[1]:
                continue
            inter = len(a[2] & b[2])
            union = len(a[2] | b[2])
            pairs.append(inter / union)
    n_pairs = len(pairs)
    n_hi = sum(1 for s in pairs if s >= 0.5)
    for bands, rpb in ((32, 4), (16, 8), (8, 16), (4, 32)):
        caught = load = 0
        for s in pairs:
            # the engines' exact squaring ladder: s^r then (1-s^r)^b,
            # both powers of two
            sr = s
            e = 1
            while e < rpb:
                sr = sr * sr
                e *= 2
            t_ = 1.0 - sr
            e = 1
            while e < bands:
                t_ = t_ * t_
                e *= 2
            p = 1.0 - t_
            q = math.floor(p * 1_000_000_000)
            if s >= 0.5:
                caught += q
            else:
                load += q
        row = rows[(bands, rpb)]
        assert row["n_pairs"] == n_pairs
        assert row["n_above_thresh"] == n_hi
        assert row["exp_caught"] == pytest.approx(
            caught / 1e9, abs=1e-3
        )
        assert row["exp_false_cands"] == pytest.approx(
            load / 1e9, abs=1e-3
        )


# ---------------------------------------------------------------------------
# q342 order-independent dataset digest
# ---------------------------------------------------------------------------


def test_q342_digest_matches_direct_fold(spark):
    rows = {r["source"]: r for r in _q(spark, "q342_dataset_digest").collect()}
    docs = _pdf("documents", "doc_id, source, text, lang, n_chars")
    mod = 2_147_483_647
    acc: dict[str, list[int]] = {}
    for did, g, text, lang, nc in zip(
        docs["doc_id"], docs["source"], docs["text"], docs["lang"],
        docs["n_chars"],
    ):
        canon = "|".join(
            [
                str(int(did)),
                hashlib.md5(text.encode()).hexdigest(),
                lang,
                str(int(nc)),
            ]
        )
        a = acc.setdefault(g, [0, 0, 0])
        a[0] += 1
        a[1] += _h60("d1|" + canon) % mod
        a[2] += _h60("d2|" + canon) % mod
    for g, (nr, d1, d2) in acc.items():
        row = rows[g]
        assert row["n_rows"] == nr
        assert row["digest1"] == d1 % mod
        assert row["digest2"] == d2 % mod


# ---------------------------------------------------------------------------
# q348 data-constrained epoch allocation
# ---------------------------------------------------------------------------


def test_q348_epoch_allocation_matches_direct_greedy(spark):
    rows = {r["source"]: r for r in _q(spark, "q348_epoch_allocation").collect()}
    docs = _pdf("documents", "source, text")
    toks: dict[str, int] = {}
    for g, text in zip(docs["source"], docs["text"]):
        toks[g] = toks.get(g, 0) + len(re.split(r"\s+", text.strip().lower()))
    budget = 2 * sum(toks.values())
    cand = sorted(
        (
            (epoch, -t, g, t, _tdiv(t * 1000, 1 << (epoch - 1)))
            for g, t in toks.items()
            for epoch in range(1, 5)
        )
    )
    cum = 0
    acc: dict[str, list[int]] = {g: [0, 0, 0, 0] for g in toks}
    # [epochs_full, partial_tokens, repeat_tokens, effective_value_m]
    for epoch, _, g, t, value_m in cand:
        cum += t
        if cum <= budget:
            got = t
        elif cum - t < budget:
            got = budget - (cum - t)
        else:
            got = 0
        a = acc[g]
        if got == t:
            a[0] += 1
        elif got > 0:
            a[1] += got
        a[2] += got
        a[3] += _tdiv(got * value_m, t)
    for g, (full, part, rep, val) in acc.items():
        row = rows[g]
        assert row["tokens"] == toks[g]
        assert row["epochs_full"] == full
        assert row["partial_tokens"] == part
        assert row["repeat_tokens"] == rep
        assert row["effective_value_m"] == val


# ---------------------------------------------------------------------------
# q333 unigram^0.75 negative-sampling table
# ---------------------------------------------------------------------------


def test_q333_negative_sampling_matches_direct_table(spark):
    rows = {r["rank"]: r for r in _q(spark, "q333_negative_sampling_table").collect()}
    docs = _pdf("documents", "text")
    cnt: dict[str, int] = {}
    for text in docs["text"]:
        for tk in re.split(r"\s+", text.strip().lower()):
            cnt[tk] = cnt.get(tk, 0) + 1
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:256]
    w = [
        (term, f, math.floor(math.sqrt(f) * math.sqrt(math.sqrt(f)) * 1e6))
        for term, f in top
    ]
    z = sum(x for _, _, x in w)
    cum = 0
    for rank, (term, f, wu) in enumerate(w, start=1):
        cum += wu
        row = rows[rank]
        assert row["term"] == term
        assert row["freq"] == f
        assert row["prob"] == pytest.approx(wu / z, abs=1e-6)
        assert row["cum_prob"] == pytest.approx(cum / z, abs=1e-6)
