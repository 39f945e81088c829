"""Independent brute-force references, round 10 batch E: corpus-mix,
LM-scoring, and design-sweep formulas.

q94 Markov transition matrix, q104 unigram-LM NLL scoring, q118
equi-depth histogram, q181 mixture acceptance rates, q207
temperature-scaled mixture weights, q259 seasonal-naive backtest,
q267 Monroe-Colaresi-Quinn log-odds z (the "Fightin' Words" formula),
q289 pairwise-cosine isotropy identity, q324 LSH S-curve sweep
(exact IEEE squaring-ladder reproduction). Pure-Python recomputation
from raw parquet at sf0.001, as in batches A-D.
"""

from __future__ import annotations

import hashlib
import math
import re

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


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _toks(text: str) -> list[str]:
    return re.split(r"\s+", str(text).strip().lower())


def _events():
    con = duckdb.connect()
    return con.execute(
        f"SELECT event_id, epoch_us(ts) AS us, user_id, event_type, value"
        f" FROM read_parquet('{SF_DIR}/events.parquet')"
    ).df()


# ---------------------------------------------------------------------------
# q94 Markov transition matrix
# ---------------------------------------------------------------------------


def test_q94_markov_matches_sequence_pairs(spark):
    rows = {
        (r["event_type"], r["next_type"]): r
        for r in _q(spark, "q94_markov_transitions").collect()
    }
    ev = _events()
    seqs: dict[int, list[tuple[int, int, str]]] = {}
    for eid, us, uid, et in zip(
        ev["event_id"], ev["us"], ev["user_id"], ev["event_type"]
    ):
        seqs.setdefault(int(uid), []).append((int(us), int(eid), et))
    cnt: dict[tuple[str, str], int] = {}
    for evs in seqs.values():
        evs.sort(key=lambda t: (t[0], t[1]))
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            cnt[(a, b)] = cnt.get((a, b), 0) + 1
    row_tot: dict[str, int] = {}
    for (a, _), c in cnt.items():
        row_tot[a] = row_tot.get(a, 0) + c
    assert set(rows) == set(cnt)
    for key, c in cnt.items():
        assert rows[key]["n"] == c
        assert rows[key]["p"] == pytest.approx(
            c / row_tot[key[0]], abs=1.1e-6
        )


# ---------------------------------------------------------------------------
# q104 unigram LM scoring
# ---------------------------------------------------------------------------


def test_q104_unigram_nll_matches_vocab_census(spark):
    rows = {
        r["doc_id"]: r for r in _q(spark, "q104_unigram_lm_score").collect()
    }
    docs = _pdf("documents", "doc_id, text")
    tf: dict[str, int] = {}
    doc_toks: dict[int, list[str]] = {}
    for did, text in zip(docs["doc_id"], docs["text"]):
        tk = _toks(text)
        doc_toks[int(did)] = tk
        for t in tk:
            tf[t] = tf.get(t, 0) + 1
    total = sum(tf.values())
    assert set(rows) == set(doc_toks)
    for did, tk in doc_toks.items():
        nll = [-math.log(tf[t] / total) for t in tk]
        row = rows[did]
        assert row["n_tokens"] == len(tk)
        assert row["avg_nll"] == pytest.approx(
            sum(nll) / len(nll), abs=1e-5
        )


# ---------------------------------------------------------------------------
# q118 equi-depth histogram
# ---------------------------------------------------------------------------


def _quantile_cont(s: list[float], q: float) -> float:
    h = (len(s) - 1) * q
    lo = math.floor(h)
    if lo + 1 >= len(s):
        return s[lo]
    return s[lo] + (h - lo) * (s[lo + 1] - s[lo])


def test_q118_equidepth_matches_cutpoint_walk(spark):
    rows = {
        r["bucket"]: r
        for r in _q(spark, "q118_equidepth_histogram").collect()
    }
    prices = sorted(
        float(p) for p in _pdf("orders", "o_totalprice")["o_totalprice"]
    )
    c1 = _quantile_cont(prices, 0.25)
    c2 = _quantile_cont(prices, 0.50)
    c3 = _quantile_cont(prices, 0.75)
    buckets: dict[int, list[float]] = {}
    for p in prices:
        b = 0 if p <= c1 else (1 if p <= c2 else (2 if p <= c3 else 3))
        buckets.setdefault(b, []).append(p)
    assert set(rows) == set(buckets)
    for b, vs in buckets.items():
        row = rows[b]
        assert row["cnt"] == len(vs)
        assert row["lo"] == pytest.approx(round(min(vs), 2), abs=1e-9)
        assert row["hi"] == pytest.approx(round(max(vs), 2), abs=1e-9)


# ---------------------------------------------------------------------------
# q181 mixture acceptance rates
# ---------------------------------------------------------------------------


def test_q181_mixture_matches_hash_weights(spark):
    rows = {
        r["source"]: r for r in _q(spark, "q181_mixture_weights").collect()
    }
    docs = _pdf("documents", "source")
    n: dict[str, int] = {}
    for s in docs["source"]:
        n[s] = n.get(s, 0) + 1
    raw = {s: 1.0 + (_h60(s) % 5) for s in n}
    wsum = sum(raw.values())
    total = sum(n.values())
    assert set(rows) == set(n)
    for s in n:
        share = raw[s] / wsum
        rate = min(1.0, share * total / n[s])
        row = rows[s]
        assert row["n_docs"] == n[s]
        assert row["target_share"] == pytest.approx(share, abs=1.1e-6)
        assert row["accept_rate"] == pytest.approx(rate, abs=1.1e-6)
        assert row["expected_kept"] == math.floor(rate * n[s] + 0.5)


# ---------------------------------------------------------------------------
# q207 temperature-scaled mixture weights
# ---------------------------------------------------------------------------


def test_q207_temperature_mixture_matches_sqrt_sampling(spark):
    rows = {
        r["lang"]: r
        for r in _q(spark, "q207_temperature_mixture").collect()
    }
    docs = _pdf("documents", "lang, text")
    agg: dict[str, list[int]] = {}
    for lang, text in zip(docs["lang"], docs["text"]):
        cell = agg.setdefault(lang, [0, 0])
        cell[0] += 1
        cell[1] += len(_toks(text))
    corpus_tok = sum(t for _, t in agg.values())
    uw = {g: (t / corpus_tok) ** 0.5 for g, (_, t) in agg.items()}
    z = sum(uw.values())
    assert set(rows) == set(agg)
    for g, (nd, t) in agg.items():
        w = uw[g] / z
        row = rows[g]
        assert row["n_docs"] == nd
        assert row["tok_total"] == t
        assert row["weight"] == pytest.approx(w, abs=1.1e-6)
        assert row["expected_docs"] == math.floor(w * 100_000 + 0.5)


# ---------------------------------------------------------------------------
# q259 seasonal-naive backtest
# ---------------------------------------------------------------------------


def test_q259_backtest_matches_lag7_join(spark):
    rows = {
        r["event_type"]: r
        for r in _q(spark, "q259_seasonal_naive_backtest").collect()
    }
    ev = _events()
    daily: dict[tuple[str, int], int] = {}
    for us, et in zip(ev["us"], ev["event_type"]):
        d = int(us) // US_PER_DAY
        daily[(et, d)] = daily.get((et, d), 0) + 1
    errs: dict[str, list[tuple[int, int]]] = {}
    for (et, d), actual in daily.items():
        pred = daily.get((et, d - 7))
        if pred is not None:
            errs.setdefault(et, []).append((actual, pred))
    assert set(rows) == set(errs)
    for et, pairs in errs.items():
        mae = sum(abs(a - p) for a, p in pairs) / len(pairs)
        mape = sum(abs(a - p) / a for a, p in pairs) / len(pairs)
        row = rows[et]
        assert row["n_days_scored"] == len(pairs)
        assert row["mae"] == pytest.approx(mae, abs=1e-3)
        assert row["mape"] == pytest.approx(mape, abs=1e-3)


# ---------------------------------------------------------------------------
# q267 Monroe-Colaresi-Quinn log-odds z ("Fightin' Words")
# ---------------------------------------------------------------------------


def test_q267_log_odds_z_matches_published_formula(spark):
    out = _q(spark, "q267_distinctive_terms").collect()
    docs = _pdf("documents", "source, text")
    y: dict[tuple[str, str], int] = {}
    for s, text in zip(docs["source"], docs["text"]):
        for t in _toks(text):
            y[(s, t)] = y.get((s, t), 0) + 1
    y_i: dict[str, int] = {}
    n_s: dict[str, int] = {}
    for (s, t), c in y.items():
        y_i[t] = y_i.get(t, 0) + c
        n_s[s] = n_s.get(s, 0) + c
    n = sum(n_s.values())
    v = len(y_i)
    a = 0.5
    z: dict[tuple[str, str], float] = {}
    for (s, t), c in y.items():
        delta = math.log(
            (c + a) / (n_s[s] + a * v - c - a)
        ) - math.log((y_i[t] + a) / (n + a * v - y_i[t] - a))
        var = 1.0 / (c + a) + 1.0 / (y_i[t] + a)
        z[(s, t)] = round(delta / math.sqrt(var), 4)
    top: dict[str, list[tuple[str, float]]] = {}
    for s in n_s:
        ranked = sorted(
            ((t, zz) for (ss, t), zz in z.items() if ss == s),
            key=lambda kv: (-kv[1], kv[0]),
        )[:5]
        top[s] = ranked
    for row in out:
        s, rk = row["source"], int(row["rk"])
        t_ref, z_ref = top[s][rk - 1]
        assert row["term"] == t_ref
        assert row["z"] == pytest.approx(z_ref, abs=1e-3)


# ---------------------------------------------------------------------------
# q289 pairwise-cosine isotropy identity
# ---------------------------------------------------------------------------


def test_q289_isotropy_matches_pair_identity(spark):
    rows = {
        r["label"]: r
        for r in _q(spark, "q289_embedding_isotropy").collect()
    }
    emb = _pdf("embeddings", "label, embedding")
    by_label: dict[int, list[list[float]]] = {}
    for lb, e in zip(emb["label"], emb["embedding"]):
        by_label.setdefault(int(lb), []).append([float(x) for x in e])
    for lb, vs in by_label.items():
        n = len(vs)
        dim = len(vs[0])
        ssum = [sum(v[d] for v in vs) for d in range(dim)]
        ssum2 = sum(x * x for x in ssum)
        sumsq = sum(sum(x * x for x in v) for v in vs)
        # cross-check the identity against a literal O(n^2) pair loop
        pair_dot = 0.0
        for i in range(n):
            for j in range(n):
                if i != j:
                    pair_dot += sum(
                        a * b for a, b in zip(vs[i], vs[j])
                    )
        assert pair_dot == pytest.approx(ssum2 - sumsq, rel=1e-9)
        row = rows[lb]
        assert row["n"] == n
        assert row["mean_norm"] == pytest.approx(
            math.sqrt(ssum2) / n, abs=1e-3
        )
        assert row["avg_pair_cos"] == pytest.approx(
            (ssum2 - sumsq) / (n * (n - 1)), abs=1e-3
        )


# ---------------------------------------------------------------------------
# q324 LSH S-curve parameter sweep
# ---------------------------------------------------------------------------


def test_q324_s_curve_matches_squaring_ladder(spark):
    rows = {
        r["bands"]: r
        for r in _q(spark, "q324_lsh_parameter_sweep").collect()
    }
    docs = _pdf("documents", "doc_id, source, text")
    sh: list[tuple[int, str, frozenset]] = []
    for did, s, text in zip(docs["doc_id"], docs["source"], docs["text"]):
        if int(did) % 5 != 0:
            continue
        tk = _toks(text)
        grams = frozenset(
            " ".join(tk[i: i + 3]) for i in range(len(tk) - 2)
        ) if len(tk) >= 3 else frozenset()
        sh.append((int(did), s, grams))
    sims = []
    for i in range(len(sh)):
        for j in range(len(sh)):
            a, b = sh[i], sh[j]
            if a[1] == b[1] and a[0] < b[0]:
                inter = len(a[2] & b[2])
                union = len(a[2] | b[2])
                sims.append(float(inter) / union)
    configs = ((32, 4), (16, 8), (8, 16), (4, 32))
    caught = {c: 0 for c in configs}
    load = {c: 0 for c in configs}
    n_hi = 0
    for s in sims:
        hi = s >= 0.5
        if hi:
            n_hi += 1
        # exact IEEE squaring ladders, same operation order as the
        # engines' shared column chain
        pw = {1: s}
        for e in (2, 4, 8, 16, 32):
            pw[e] = pw[e // 2] * pw[e // 2]
        for b, r in configs:
            t = 1.0 - pw[r]
            e = 1
            while e < b:
                t = t * t
                e *= 2
            p = 1.0 - t
            q = math.floor(p * 1_000_000_000.0)
            if hi:
                caught[(b, r)] += q
            else:
                load[(b, r)] += q
    for b, r in configs:
        row = rows[b]
        assert row["rows_per_band"] == r
        assert row["n_pairs"] == len(sims)
        assert row["n_above_thresh"] == n_hi
        assert row["exp_caught"] == pytest.approx(
            caught[(b, r)] / 1e9, abs=1e-3
        )
        assert row["exp_false_cands"] == pytest.approx(
            load[(b, r)] / 1e9, abs=1e-3
        )
