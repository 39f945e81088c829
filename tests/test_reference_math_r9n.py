"""Fourteenth batch of independent brute-force references: q315
(Bradley-Terry MM), q319 (logreg GD), q341 (integer TextRank), q359
(Viterbi DP). Independent-math coverage: 106 operators."""

from __future__ import annotations

import math
import re

import duckdb
import pytest

from tests.conftest import SF_DIR
from tests.test_reference_math_r9 import _pdf, _q
from tests.test_reference_math_r9c import _milli_score


# ---------------------------------------------------------------------------
# q315 Bradley-Terry source strengths (MM algorithm, 4 rounds)
# ---------------------------------------------------------------------------


def test_q315_bradley_terry_matches_direct_mm(spark):
    from __spark_entry__ import queries

    rows = {
        r["source"]: r
        for r in _q(spark, "q315_bradley_terry_sources").collect()
    }
    cands = queries()["q43_lsh_candidate_pairs"](spark, SF_DIR).collect()
    docs = _pdf("documents", "doc_id, source, text")
    info = {
        int(d): (g, _milli_score(t))
        for d, g, t in zip(docs["doc_id"], docs["source"], docs["text"])
    }
    cells: dict[tuple[str, str], list[int]] = {}
    for r in cands:
        (sa, ya), (sb, yb) = info[r["doc_a"]], info[r["doc_b"]]
        if sa == sb or ya == yb:
            continue
        winner, loser = (sa, sb) if ya > yb else (sb, sa)
        cw = cells.setdefault((winner, loser), [0, 0])
        cw[0] += 1
        cw[1] += 1
        cl = cells.setdefault((loser, winner), [0, 0])
        cl[1] += 1
    srcs = sorted({i for i, _ in cells})
    wins = {s: sum(w for (i, _), (w, _) in cells.items() if i == s) for s in srcs}
    duels = {s: sum(n for (i, _), (_, n) in cells.items() if i == s) for s in srcs}
    p = {s: 0.05 for s in srcs}
    for _ in range(4):
        praw = {}
        for s in srcs:
            denom = 0.0
            for (i, j), (_, n) in sorted(cells.items()):
                if i == s:
                    denom += n / (p[i] + p[j])
            praw[s] = wins[s] / denom
        tot = 0.0
        for s in srcs:
            tot += praw[s]
        p = {s: round(praw[s] / tot, 10) for s in srcs}
    assert set(rows) == set(srcs)
    for s in srcs:
        row = rows[s]
        assert row["n_wins"] == wins[s]
        assert row["n_duels"] == duels[s]
        assert row["bt_strength"] == pytest.approx(p[s], abs=1e-6)


# ---------------------------------------------------------------------------
# q319 full-batch logistic regression (5 GD steps, rational sigmoid)
# ---------------------------------------------------------------------------


def test_q319_logreg_matches_direct_gd(spark):
    row = _q(spark, "q319_logreg_quality_gd").collect()[0]
    docs = _pdf("documents", "n_chars, lang, text")
    feats = []
    for nc, lang, text in zip(docs["n_chars"], docs["lang"], docs["text"]):
        feats.append(
            (
                int(nc) / 100.0,
                _milli_score(text) / 1000.0,
                1.0 if lang == "en" else 0.0,
            )
        )
    n = float(len(feats))

    def sig(z):
        return 0.5 + z / (2.0 * (1.0 + abs(z)))

    b = w1 = w2 = 0.0
    for _ in range(5):
        gb = g1 = g2 = 0
        for x1, x2, y in feats:
            r = sig(b + w1 * x1 + w2 * x2) - y
            gb += math.floor(r * 1_000_000.0)
            g1 += math.floor(r * x1 * 1_000_000.0)
            g2 += math.floor(r * x2 * 1_000_000.0)
        b -= 0.5 * (gb / 1e6 / n)
        w1 -= 0.5 * (g1 / 1e6 / n)
        w2 -= 0.5 * (g2 / 1e6 / n)
    correct = sum(
        1
        for x1, x2, y in feats
        if (1.0 if sig(b + w1 * x1 + w2 * x2) >= 0.5 else 0.0) == y
    )
    assert row["n_docs"] == int(n)
    assert row["n_correct"] == correct
    assert row["w_intercept"] == pytest.approx(b, abs=1e-6)
    assert row["w_hectochars"] == pytest.approx(w1, abs=1e-6)
    assert row["w_distinct_ratio"] == pytest.approx(w2, abs=1e-6)


# ---------------------------------------------------------------------------
# q341 integer TextRank (4 rounds, floored per-edge shares)
# ---------------------------------------------------------------------------


def test_q341_textrank_matches_direct_iteration(spark):
    got = [
        (r["term"], r["rank_micro"], r["freq"])
        for r in _q(spark, "q341_textrank_keywords").collect()
    ]
    docs = _pdf("documents", "text")
    adj: dict[tuple[str, str], int] = {}
    freq: dict[str, int] = {}
    for text in docs["text"]:
        toks = re.split(r"\s+", text.strip().lower())
        for tk in toks:
            freq[tk] = freq.get(tk, 0) + 1
        for a, b in zip(toks, toks[1:]):
            if a == b:
                continue
            adj[(a, b)] = adj.get((a, b), 0) + 1
            adj[(b, a)] = adj.get((b, a), 0) + 1
    wd: dict[str, int] = {}
    for (a, _), w in adj.items():
        wd[a] = wd.get(a, 0) + w
    s = {node: 1_000_000 for node in wd}
    for _ in range(4):
        inc: dict[str, int] = {}
        for (a, b), w in adj.items():
            inc[b] = inc.get(b, 0) + (w * s[a]) // wd[a]
        s = {node: 150_000 + (17 * v) // 20 for node, v in inc.items()}
    ranked = sorted(s.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert got == [(t, r, freq[t]) for t, r in ranked]


# ---------------------------------------------------------------------------
# q359 Viterbi 2-state max-sum DP per user
# ---------------------------------------------------------------------------

_EMIT = (
    {"click": 2, "purchase": 3, "view": 1, "signup": 0, "error": -2},
    {"view": 0, "error": 2, "signup": 1, "click": -1, "purchase": -3},
)


def test_q359_viterbi_matches_direct_dp(spark):
    rows = {r["user_id"]: r for r in _q(spark, "q359_viterbi_sessions").collect()}
    con = duckdb.connect()
    ev = con.execute(
        f"SELECT user_id, event_type FROM "
        f"read_parquet('{SF_DIR}/events.parquet') "
        f"ORDER BY user_id, epoch_us(ts), event_id"
    ).df()
    seqs: dict[int, list[str]] = {}
    for uid, et in zip(ev["user_id"], ev["event_type"]):
        s = seqs.setdefault(int(uid), [])
        if len(s) < 12:
            s.append(et)

    def emit(state, x):
        return _EMIT[state].get(x, min(_EMIT[state].values()))

    for uid, s in seqs.items():
        d0, d1 = emit(0, s[0]), emit(1, s[0])
        for x in s[1:]:
            d0, d1 = (
                emit(0, x) + max(d0 + 1, d1 - 2),
                emit(1, x) + max(d0 - 2, d1 + 1),
            )
        row = rows[uid]
        assert row["n_obs"] == len(s)
        assert row["score"] == max(d0, d1)
        assert row["final_state"] == (0 if d0 >= d1 else 1)
