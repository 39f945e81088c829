"""Independent brute-force references, round 10 batch C: a further
sweep of the uncovered shared-formula statistical/metric operators
(continuing VERDICT r9 item 2 beyond its >= 130 Done-criterion).

q109 MAD, q116 chi-square contingency terms, q125 geometric mean,
q134 time-weighted average, q143 winsorized mean, q226 DSIR
importance weights, q242 exact quantile normalization, q291
character entropy, q307 integer-moment Pearson correlations, q337
multinomial naive Bayes (train + apply + confusion), q354
difference-in-differences, q406 Cliff's delta (all-pairs brute
force). Same discipline as batches A/B: naive pure-Python
recomputation from raw parquet at sf0.001.
"""

from __future__ import annotations

import hashlib
import math
import re
from decimal import Decimal

import duckdb
import pytest

from tests.conftest import SF_DIR

US_PER_DAY = 86_400_000_000


def _pdf(table: str, cols: str = "*"):
    con = duckdb.connect()
    return con.execute(
        f"SELECT {cols} FROM read_parquet('{SF_DIR}/{table}.parquet')"
    ).df()


def _q(spark, name):
    from __spark_entry__ import queries

    return queries()[name](spark, SF_DIR)


def _tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _toks(text: str) -> list[str]:
    return re.split(r"\s+", str(text).strip().lower())


def _quantile_cont(sorted_vals: list[float], q: float) -> float:
    """Interpolated (type-7) quantile, the percentile()/quantile_cont
    definition both engines share."""
    h = (len(sorted_vals) - 1) * q
    lo = math.floor(h)
    if lo + 1 >= len(sorted_vals):
        return sorted_vals[lo]
    return sorted_vals[lo] + (h - lo) * (sorted_vals[lo + 1] - sorted_vals[lo])


def _events():
    con = duckdb.connect()
    return con.execute(
        f"SELECT event_id, epoch_us(ts) AS us, user_id, event_type, value"
        f" FROM read_parquet('{SF_DIR}/events.parquet')"
    ).df()


# ---------------------------------------------------------------------------
# q109 median absolute deviation
# ---------------------------------------------------------------------------


def test_q109_mad_matches_nested_median(spark):
    rows = {
        r["event_type"]: r
        for r in _q(spark, "q109_median_abs_deviation").collect()
    }
    ev = _events()
    groups: dict[str, list[float]] = {}
    for et, v in zip(ev["event_type"], ev["value"]):
        groups.setdefault(et, []).append(float(v))
    assert set(rows) == set(groups)
    for et, vs in groups.items():
        med = _quantile_cont(sorted(vs), 0.5)
        mad = _quantile_cont(sorted(abs(v - med) for v in vs), 0.5)
        assert rows[et]["median_value"] == pytest.approx(med, abs=1e-5)
        assert rows[et]["mad"] == pytest.approx(mad, abs=1e-5)


# ---------------------------------------------------------------------------
# q116 chi-square contingency terms
# ---------------------------------------------------------------------------


def test_q116_chi2_terms_match_contingency_census(spark):
    rows = {
        (r["source"], r["lang"]): r
        for r in _q(spark, "q116_lang_source_drift").collect()
    }
    docs = _pdf("documents", "source, lang")
    obs: dict[tuple[str, str], int] = {}
    for s, lg in zip(docs["source"], docs["lang"]):
        obs[(s, lg)] = obs.get((s, lg), 0) + 1
    n = len(docs)
    rn: dict[str, int] = {}
    cn: dict[str, int] = {}
    for (s, lg), c in obs.items():
        rn[s] = rn.get(s, 0) + c
        cn[lg] = cn.get(lg, 0) + c
    assert set(rows) == set(obs)
    for (s, lg), c in obs.items():
        e = rn[s] * cn[lg] / n
        row = rows[(s, lg)]
        assert row["obs"] == c
        assert row["expected"] == pytest.approx(e, abs=1e-5)
        assert row["chi2_term"] == pytest.approx((c - e) ** 2 / e, abs=1e-5)


# ---------------------------------------------------------------------------
# q125 geometric mean (grouped-agg pandas UDAF)
# ---------------------------------------------------------------------------


def test_q125_geomean_matches_log_mean(spark):
    rows = {
        r["event_type"]: r for r in _q(spark, "q125_geomean_udaf").collect()
    }
    ev = _events()
    groups: dict[str, list[float]] = {}
    for et, v in zip(ev["event_type"], ev["value"]):
        if float(v) > 0:
            groups.setdefault(et, []).append(float(v))
    for et, vs in groups.items():
        gm = math.exp(sum(math.log(v) for v in vs) / len(vs))
        assert rows[et]["n_pos"] == len(vs)
        assert rows[et]["geomean_value"] == pytest.approx(gm, rel=1e-6)


# ---------------------------------------------------------------------------
# q134 time-weighted average
# ---------------------------------------------------------------------------


def test_q134_twa_matches_holding_durations(spark):
    rows = {
        r["user_id"]: r
        for r in _q(spark, "q134_time_weighted_avg").collect()
    }
    ev = _events()
    per_user: dict[int, list[tuple[int, int, float]]] = {}
    for eid, us, uid, v in zip(
        ev["event_id"], ev["us"], ev["user_id"], ev["value"]
    ):
        per_user.setdefault(int(uid), []).append(
            (int(us), int(eid), float(v))
        )
    for uid, obs in per_user.items():
        obs.sort(key=lambda t: (t[0], t[1]))
        num = den = 0.0
        n_int = 0
        for (t0, _, v), (t1, _, _) in zip(obs, obs[1:]):
            num += v * (t1 - t0)
            den += t1 - t0
            n_int += 1
        if n_int == 0:
            assert uid not in rows
            continue
        row = rows[uid]
        assert row["n_intervals"] == n_int
        assert row["twa_value"] == pytest.approx(num / den, abs=1e-4)


# ---------------------------------------------------------------------------
# q143 winsorized mean
# ---------------------------------------------------------------------------


def test_q143_winsorized_mean_matches_clamped_average(spark):
    rows = {
        r["o_orderpriority"]: r
        for r in _q(spark, "q143_winsorized_mean").collect()
    }
    o = _pdf("orders", "o_orderpriority, o_totalprice")
    groups: dict[str, list[float]] = {}
    for pri, p in zip(o["o_orderpriority"], o["o_totalprice"]):
        groups.setdefault(pri, []).append(float(p))
    for pri, vs in groups.items():
        s = sorted(vs)
        lo, hi = _quantile_cont(s, 0.05), _quantile_cont(s, 0.95)
        raw = sum(vs) / len(vs)
        win = sum(min(max(v, lo), hi) for v in vs) / len(vs)
        row = rows[pri]
        assert row["n"] == len(vs)
        assert row["raw_mean"] == math.floor(raw)
        assert row["win_mean"] == math.floor(win)


# ---------------------------------------------------------------------------
# q226 DSIR importance weights
# ---------------------------------------------------------------------------


def test_q226_dsir_matches_bucket_llr(spark):
    rows = {
        r["doc_id"]: r for r in _q(spark, "q226_dsir_importance").collect()
    }
    docs = _pdf("documents", "doc_id, lang, text")
    B = 1024
    cr: dict[int, int] = {}
    ct: dict[int, int] = {}
    doc_buckets: dict[int, list[int]] = {}
    for did, lang, text in zip(docs["doc_id"], docs["lang"], docs["text"]):
        bs = [_h60(tok) % B for tok in _toks(text)]
        doc_buckets[int(did)] = bs
        for b in bs:
            cr[b] = cr.get(b, 0) + 1
            if lang == "en":
                ct[b] = ct.get(b, 0) + 1
    nr = sum(cr.values())
    nt = sum(ct.values())
    assert set(rows) == set(doc_buckets)
    for did, bs in doc_buckets.items():
        r = [
            math.log((ct.get(b, 0) + 1.0) / (nt + B))
            - math.log((cr[b] + 1.0) / (nr + B))
            for b in bs
        ]
        row = rows[did]
        assert row["n_tokens"] == len(bs)
        assert row["avg_llr"] == pytest.approx(sum(r) / len(r), abs=1e-3)


# ---------------------------------------------------------------------------
# q242 exact quantile normalization
# ---------------------------------------------------------------------------


def test_q242_quantile_norm_matches_rank_mapping(spark):
    rows = {
        r["doc_id"]: r
        for r in _q(spark, "q242_quantile_normalization").collect()
    }
    docs = _pdf("documents", "doc_id, source, text")
    recs = []
    for did, s, text in zip(docs["doc_id"], docs["source"], docs["text"]):
        tk = _toks(text)
        score = (1000 * len(set(tk))) // len(tk)
        recs.append((int(did), s, score))
    corpus = sorted(recs, key=lambda t: (t[2], t[0]))
    n = len(corpus)
    per_source: dict[str, list[tuple[int, int]]] = {}
    for did, s, score in recs:
        per_source.setdefault(s, []).append((score, did))
    for s, items in per_source.items():
        items.sort()
        ns = len(items)
        for r1, (score, did) in enumerate(items, start=1):
            g = (r1 * n + ns - 1) // ns
            row = rows[did]
            assert row["source"] == s
            assert row["score"] == score
            assert row["norm_score"] == corpus[g - 1][2]


# ---------------------------------------------------------------------------
# q291 character entropy
# ---------------------------------------------------------------------------


def test_q291_char_entropy_matches_char_census(spark):
    rows = {
        r["source"]: r for r in _q(spark, "q291_char_entropy").collect()
    }
    docs = _pdf("documents", "source, text")
    per_source: dict[str, list[float]] = {}
    for s, text in zip(docs["source"], docs["text"]):
        text = str(text)
        if not text:
            continue
        cnt: dict[str, int] = {}
        for ch in text:
            cnt[ch] = cnt.get(ch, 0) + 1
        n = len(text)
        h = math.log2(n) - sum(k * math.log2(k) for k in cnt.values()) / n
        per_source.setdefault(s, []).append(h)
    assert set(rows) == set(per_source)
    for s, hs in per_source.items():
        row = rows[s]
        assert row["n_docs"] == len(hs)
        assert row["avg_entropy"] == pytest.approx(
            sum(hs) / len(hs), abs=1e-3
        )
        assert row["min_entropy"] == pytest.approx(min(hs), abs=1e-3)
        assert row["max_entropy"] == pytest.approx(max(hs), abs=1e-3)


# ---------------------------------------------------------------------------
# q307 integer-moment Pearson correlations
# ---------------------------------------------------------------------------


def test_q307_correlations_match_textbook_pearson(spark):
    rows = {
        r["source"]: r
        for r in _q(spark, "q307_signal_correlations").collect()
    }
    docs = _pdf("documents", "source, n_chars, text")
    triples: dict[str, list[tuple[int, int, int]]] = {}
    for s, nc, text in zip(docs["source"], docs["n_chars"], docs["text"]):
        tk = _toks(text)
        score = (1000 * len(set(tk))) // len(tk)
        triples.setdefault(s, []).append((int(nc), len(tk), score))

    def corr(pts, i, j):
        n = len(pts)
        sp = sum(p[i] for p in pts)
        sq = sum(p[j] for p in pts)
        spq = sum(p[i] * p[j] for p in pts)
        spp = sum(p[i] * p[i] for p in pts)
        sqq = sum(p[j] * p[j] for p in pts)
        return (n * spq - sp * sq) / math.sqrt(
            (n * spp - sp * sp) * (n * sqq - sq * sq)
        )

    assert set(rows) == set(triples)
    for s, pts in triples.items():
        row = rows[s]
        assert row["n_docs"] == len(pts)
        assert row["r_chars_tokens"] == pytest.approx(
            corr(pts, 0, 1), abs=1e-5
        )
        assert row["r_chars_score"] == pytest.approx(
            corr(pts, 0, 2), abs=1e-5
        )
        assert row["r_tokens_score"] == pytest.approx(
            corr(pts, 1, 2), abs=1e-5
        )


# ---------------------------------------------------------------------------
# q337 multinomial naive Bayes (integer-quantized log-probs)
# ---------------------------------------------------------------------------


def test_q337_naive_bayes_matches_from_scratch_classifier(spark):
    rows = {
        r["source"]: r for r in _q(spark, "q337_naive_bayes_lang").collect()
    }
    docs = _pdf("documents", "doc_id, source, lang, text")
    Q = 1_000_000
    train, test = [], []
    for did, s, lang, text in zip(
        docs["doc_id"], docs["source"], docs["lang"], docs["text"]
    ):
        b = _h60(str(int(did))) % 100
        rec = (s, 1 if lang == "en" else 0, _toks(text))
        if b < 80:
            train.append(rec)
        elif b >= 90:
            test.append(rec)
    c1: dict[str, int] = {}
    c0: dict[str, int] = {}
    for _, y, tk in train:
        for tok in tk:
            (c1 if y == 1 else c0)[tok] = (c1 if y == 1 else c0).get(
                tok, 0
            ) + 1
    vocab = set(c1) | set(c0)
    n1tok = sum(c1.values())
    n0tok = sum(c0.values())
    v = len(vocab)
    ntr1 = sum(y for _, y, _ in train)
    ntr0 = len(train) - ntr1
    prior_u = math.floor(math.log(ntr1 / ntr0) * Q)
    delta = {
        t: math.floor(math.log((c1.get(t, 0) + 1) / (n1tok + v)) * Q)
        - math.floor(math.log((c0.get(t, 0) + 1) / (n0tok + v)) * Q)
        for t in vocab
    }
    conf: dict[str, list[int]] = {}  # tp, fp, fn, tn, n
    for s, y, tk in test:
        dot = sum(delta[t] for t in tk if t in delta)
        yhat = 1 if prior_u + dot > 0 else 0
        cell = conf.setdefault(s, [0, 0, 0, 0, 0])
        cell[4] += 1
        if y == 1 and yhat == 1:
            cell[0] += 1
        elif y == 0 and yhat == 1:
            cell[1] += 1
        elif y == 1 and yhat == 0:
            cell[2] += 1
        else:
            cell[3] += 1
    assert set(rows) == set(conf)
    for s, (tp, fp, fn, tn, n) in conf.items():
        row = rows[s]
        assert (row["tp"], row["fp"], row["fn"], row["tn"]) == (
            tp, fp, fn, tn,
        )
        assert row["n_test"] == n
        assert row["acc_milli"] == _tdiv(1000 * (tp + tn), n)


# ---------------------------------------------------------------------------
# q354 difference-in-differences
# ---------------------------------------------------------------------------


def test_q354_did_matches_four_cell_contrast(spark):
    row = _q(spark, "q354_did_readout").collect()[0]
    ev = _events()
    split_us = 1_704_067_200_000_000 + 15 * US_PER_DAY
    cells: dict[tuple[bool, bool], list] = {}
    for us, uid, et, v in zip(
        ev["us"], ev["user_id"], ev["event_type"], ev["value"]
    ):
        if et != "purchase":
            continue
        treated = _h60(str(int(uid))) % 2 == 0
        post = int(us) >= split_us
        cell = cells.setdefault((treated, post), [0, Decimal(0)])
        cell[0] += 1
        cell[1] += Decimal(str(v))

    def avg_micro(key):
        cnt, sv = cells[key]
        return _tdiv(2 * int(sv.scaleb(6)) + cnt, 2 * cnt)

    assert row["n_treat_pre"] == cells[(True, False)][0]
    assert row["n_treat_post"] == cells[(True, True)][0]
    assert row["n_ctrl_pre"] == cells[(False, False)][0]
    assert row["n_ctrl_post"] == cells[(False, True)][0]
    tpre, tpost = avg_micro((True, False)), avg_micro((True, True))
    cpre, cpost = avg_micro((False, False)), avg_micro((False, True))
    assert row["treat_pre_micro"] == tpre
    assert row["treat_post_micro"] == tpost
    assert row["ctrl_pre_micro"] == cpre
    assert row["ctrl_post_micro"] == cpost
    assert row["did_micro"] == (tpost - tpre) - (cpost - cpre)


# ---------------------------------------------------------------------------
# q406 Cliff's delta (all-pairs brute force)
# ---------------------------------------------------------------------------


def test_q406_cliffs_delta_matches_all_pairs(spark):
    row = _q(spark, "q406_cliffs_delta").collect()[0]
    docs = _pdf("documents", "source, n_chars")
    v0 = [
        int(n) for s, n in zip(docs["source"], docs["n_chars"]) if s == "src0"
    ]
    v1 = [
        int(n) for s, n in zip(docs["source"], docs["n_chars"]) if s == "src1"
    ]
    gt = sum(1 for a in v0 for b in v1 if a > b)
    lt = sum(1 for a in v0 for b in v1 if a < b)
    n0, n1 = len(v0), len(v1)
    assert (row["n0"], row["n1"]) == (n0, n1)
    assert (row["gt_pairs"], row["lt_pairs"]) == (gt, lt)
    delta = (gt - lt) / (n0 * n1)
    assert row["cliffs_delta"] == pytest.approx(delta, abs=1.1e-6)
    d = abs(gt - lt)
    if 1000 * d < 147 * n0 * n1:
        mag = "negligible"
    elif 1000 * d < 330 * n0 * n1:
        mag = "small"
    elif 1000 * d < 474 * n0 * n1:
        mag = "medium"
    else:
        mag = "large"
    assert row["magnitude"] == mag
