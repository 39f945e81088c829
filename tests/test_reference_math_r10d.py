"""Independent brute-force references, round 10 batch D: attribution,
conformal calibration, causal readouts, bootstrap CIs, and the
remaining retrieval/graph sweeps.

q210 tokenizer fertility, q216 lang-ID confusion (detector
re-implemented from the marker spec), q254 weekday-seasonal anomaly,
q312 exact-NTILE length bucketing, q314 Poisson-bootstrap CIs (full
hash-ladder recompute), q353 U-shaped multi-touch attribution (path
walk re-derived from the carry-forward semantics), q356 split
conformal coverage (denominator-cleared residuals), q363 quantile
treatment effects, q427 Matryoshka prefix recall, q428 bipartite
rich-club density. Pure-Python recomputation from raw parquet at
sf0.001, as in batches A-C.
"""

from __future__ import annotations

import hashlib
import json
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


def _tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _toks(text: str) -> list[str]:
    return re.split(r"\s+", str(text).strip().lower())


def _events():
    con = duckdb.connect()
    return con.execute(
        f"SELECT event_id, epoch_us(ts) AS us, user_id, event_type,"
        f" value, props FROM read_parquet('{SF_DIR}/events.parquet')"
    ).df()


# ---------------------------------------------------------------------------
# q210 tokenizer fertility
# ---------------------------------------------------------------------------


def test_q210_fertility_matches_regex_census(spark):
    rows = {
        r["lang"]: r for r in _q(spark, "q210_tokenizer_fertility").collect()
    }
    docs = _pdf("documents", "lang, text, n_chars")
    agg: dict[str, list[int]] = {}
    for lang, text, nc in zip(docs["lang"], docs["text"], docs["n_chars"]):
        low = str(text).lower()
        bpe = len(re.findall(r"[a-z]+|[0-9]+|[^a-z0-9\s]", low))
        ws = len(_toks(text))
        cell = agg.setdefault(lang, [0, 0, 0, 0])
        cell[0] += 1
        cell[1] += bpe
        cell[2] += ws
        cell[3] += int(nc)
    assert set(rows) == set(agg)
    for lang, (nd, bpe, ws, nchars) in agg.items():
        row = rows[lang]
        assert row["n_docs"] == nd
        assert row["bpe_tokens"] == bpe
        assert row["ws_tokens"] == ws
        assert row["fertility"] == pytest.approx(bpe / ws, abs=1e-3)
        assert row["tokens_per_100_chars"] == pytest.approx(
            100.0 * bpe / nchars, abs=1e-3
        )


# ---------------------------------------------------------------------------
# q216 language-ID confusion matrix (detector re-implemented)
# ---------------------------------------------------------------------------

_MARKERS = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "est"),
    "es": ("el", "la", "de", "los", "es"),
    "zh": ("的", "是", "在", "了", "和"),
}


def _detect(tokens: list[str]) -> str:
    s = {
        lang: sum(1 for t in tokens if t in set(ms))
        for lang, ms in _MARKERS.items()
    }
    # fixed tie order en > de > fr > es > zh (argmax cascade)
    if s["en"] >= s["de"] and s["en"] >= s["fr"] and s["en"] >= s["es"] \
            and s["en"] >= s["zh"]:
        return "en"
    if s["de"] >= s["fr"] and s["de"] >= s["es"] and s["de"] >= s["zh"]:
        return "de"
    if s["fr"] >= s["es"] and s["fr"] >= s["zh"]:
        return "fr"
    if s["es"] >= s["zh"]:
        return "es"
    return "zh"


def test_q216_confusion_matches_reimplemented_detector(spark):
    rows = {
        (r["labeled_lang"], r["detected_lang"]): r
        for r in _q(spark, "q216_langid_confusion").collect()
    }
    docs = _pdf("documents", "lang, text")
    cnt: dict[tuple[str, str], int] = {}
    per_label: dict[str, int] = {}
    for lang, text in zip(docs["lang"], docs["text"]):
        det = _detect(_toks(text))
        cnt[(lang, det)] = cnt.get((lang, det), 0) + 1
        per_label[lang] = per_label.get(lang, 0) + 1
    assert set(rows) == set(cnt)
    for key, n in cnt.items():
        row = rows[key]
        assert row["n"] == n
        assert row["share"] == pytest.approx(
            n / per_label[key[0]], abs=1e-3
        )


# ---------------------------------------------------------------------------
# q254 weekday-seasonal anomaly detection
# ---------------------------------------------------------------------------


def test_q254_seasonal_anomaly_matches_weekday_zscores(spark):
    rows = {
        r["day_idx"]: r for r in _q(spark, "q254_seasonal_anomaly").collect()
    }
    ev = _events()
    daily: dict[int, int] = {}
    for us in ev["us"]:
        d = int(us) // US_PER_DAY
        daily[d] = daily.get(d, 0) + 1
    by_dow: dict[int, list[int]] = {}
    for d, n in daily.items():
        by_dow.setdefault((d + 3) % 7, []).append(n)
    flagged = {}
    for d, n in daily.items():
        ns = by_dow[(d + 3) % 7]
        mu = sum(ns) / len(ns)
        sd = math.sqrt(sum((x - mu) ** 2 for x in ns) / len(ns))
        if sd > 0:
            z = round((n - mu) / sd, 4)
            if abs(z) > 1.5:
                flagged[d] = (n, (d + 3) % 7, z)
    assert set(rows) == set(flagged)
    for d, (n, dow, z) in flagged.items():
        row = rows[d]
        assert row["n"] == n
        assert row["dow"] == dow
        assert row["z"] == pytest.approx(z, abs=1e-3)


# ---------------------------------------------------------------------------
# q312 exact-NTILE sequence-length bucketing
# ---------------------------------------------------------------------------


def test_q312_length_buckets_match_sql_ntile_spec(spark):
    rows = {
        r["bucket"]: r for r in _q(spark, "q312_length_bucketing").collect()
    }
    docs = _pdf("documents", "doc_id, text")
    lens = sorted(
        (len(_toks(text)), int(did))
        for did, text in zip(docs["doc_id"], docs["text"])
    )
    total, nb = len(lens), 8
    q, r = divmod(total, nb)
    buckets: dict[int, list[int]] = {}
    for rn1, (ntok, _) in enumerate(lens, start=1):
        cut = r * (q + 1)
        if rn1 <= cut:
            b = (rn1 - 1) // (q + 1) + 1
        else:
            b = (rn1 - cut - 1) // q + r + 1
        buckets.setdefault(b, []).append(ntok)
    assert set(rows) == set(buckets)
    for b, ts in buckets.items():
        row = rows[b]
        pad = len(ts) * max(ts) - sum(ts)
        assert row["n_docs"] == len(ts)
        assert row["min_len"] == min(ts)
        assert row["max_len"] == max(ts)
        assert row["sum_len"] == sum(ts)
        assert row["padding_tokens"] == pad
        assert row["padding_pct"] == pytest.approx(
            pad / (len(ts) * max(ts)), abs=1.1e-6
        )


# ---------------------------------------------------------------------------
# q314 Poisson-bootstrap confidence intervals
# ---------------------------------------------------------------------------

_POIS_CUM = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238463,
    0.9963401531726563,
    0.9994058151824183,
    0.999916758850712,
)


def test_q314_bootstrap_matches_hash_ladder(spark):
    rows = {
        r["source"]: r for r in _q(spark, "q314_poisson_bootstrap").collect()
    }
    docs = _pdf("documents", "doc_id, source, text")
    recs = []
    for did, s, text in zip(docs["doc_id"], docs["source"], docs["text"]):
        tk = _toks(text)
        recs.append((int(did), s, (1000 * len(set(tk))) // len(tk)))
    B = 100
    sums: dict[tuple[str, int], list[int]] = {}
    for did, s, score in recs:
        for b in range(1, B + 1):
            u = (_h60(f"{did}:{b}") % 1_000_000_000 + 0.5) / 1e9
            w = 7
            for k, c in enumerate(_POIS_CUM):
                if u < c:
                    w = k
                    break
            cell = sums.setdefault((s, b), [0, 0])
            cell[0] += w * score
            cell[1] += w
    means: dict[str, list[tuple[float, int]]] = {}
    for (s, b), (sw, ww) in sums.items():
        if ww > 0:
            means.setdefault(s, []).append((sw / ww, b))
    points: dict[str, list[int]] = {}
    for _, s, score in recs:
        points.setdefault(s, []).append(score)
    assert set(rows) == set(points)
    for s, ms in means.items():
        ms.sort()
        row = rows[s]
        pts = points[s]
        assert row["mean_score"] == pytest.approx(
            sum(pts) / len(pts), abs=1e-5
        )
        assert row["ci_lo"] == pytest.approx(ms[3 - 1][0], abs=1e-5)
        assert row["ci_hi"] == pytest.approx(ms[98 - 1][0], abs=1e-5)


# ---------------------------------------------------------------------------
# q353 U-shaped multi-touch attribution
# ---------------------------------------------------------------------------


def test_q353_u_shaped_matches_path_walk(spark):
    rows = {
        r["channel"]: r
        for r in _q(spark, "q353_u_shaped_attribution").collect()
    }
    ev = _events()
    per_user: dict[int, list[tuple[int, int, str]]] = {}
    for eid, us, uid, et in zip(
        ev["event_id"], ev["us"], ev["user_id"], ev["event_type"]
    ):
        if et in ("click", "view", "purchase"):
            per_user.setdefault(int(uid), []).append(
                (int(us), int(eid), et)
            )
    paths: dict[int, list[tuple[int, int, str]]] = {}
    look = 7 * US_PER_DAY
    for uid, evs in per_user.items():
        purchases = sorted(
            (ts, eid) for ts, eid, et in evs if et == "purchase"
        )
        for ts, eid, et in evs:
            if et == "purchase":
                continue
            # carry-forward over the DESC (ts, tag, event_id) stream ==
            # the purchase with minimal (ts_p, eid_p) and ts_p >= ts
            conv = next(
                ((pt, pe) for pt, pe in purchases if pt >= ts), None
            )
            if conv is None or conv[0] - ts > look:
                continue
            paths.setdefault(conv[1], []).append((ts, eid, et))
    TOTAL, END, MID = 10_000_000, 4_000_000, 2_000_000
    agg: dict[str, list[int]] = {}
    for touches in paths.values():
        touches.sort(key=lambda t: (t[0], t[1]))
        n = len(touches)
        for pos, (_, _, et) in enumerate(touches, start=1):
            if n == 1:
                c = TOTAL
            elif n == 2:
                c = TOTAL // 2
            elif pos in (1, n):
                c = END
            else:
                c = MID // (n - 2) + (1 if pos - 1 <= MID % (n - 2) else 0)
            cell = agg.setdefault(et, [0, 0])
            cell[0] += 1
            cell[1] += c
    tot = sum(c for _, c in agg.values())
    assert set(rows) == set(agg)
    for ch, (nt, cm) in agg.items():
        row = rows[ch]
        assert row["n_touches"] == nt
        assert row["credit_micro"] == cm
        assert row["credit_share"] == pytest.approx(cm / tot, abs=1.1e-6)


# ---------------------------------------------------------------------------
# q356 split conformal coverage
# ---------------------------------------------------------------------------


def test_q356_conformal_matches_integer_residual_pipeline(spark):
    row = _q(spark, "q356_conformal_coverage").collect()[0]
    docs = _pdf("documents", "doc_id, n_chars, text")
    folds: dict[int, list[tuple[int, int, int]]] = {}
    for did, nc, text in zip(docs["doc_id"], docs["n_chars"], docs["text"]):
        b = _h60(str(int(did))) % 10
        folds.setdefault(
            0 if b < 6 else (1 if b in (6, 7) else 2), []
        ).append((int(did), len(_toks(text)), int(nc)))
    train, cal, test = folds[0], folds[1], folds[2]
    n = len(train)
    sx = sum(x for _, x, _ in train)
    sy = sum(y for _, _, y in train)
    sxx = sum(x * x for _, x, _ in train)
    sxy = sum(x * y for _, x, y in train)
    dd = n * sxx - sx * sx
    nb = n * sxy - sx * sy
    na = sy * sxx - sx * sxy
    resids = sorted(
        (abs(y * dd - (na + nb * x)), did) for did, x, y in cal
    )
    n_cal = len(resids)
    k = min((9 * (n_cal + 1) + 9) // 10, n_cal)
    qhat = resids[k - 1][0]
    covered = sum(
        1 for _, x, y in test if abs(y * dd - (na + nb * x)) <= qhat
    )
    assert row["n_train"] == n
    assert row["n_cal"] == n_cal
    assert row["k"] == k
    assert row["qhat_scaled"] == qhat
    assert row["n_test"] == len(test)
    assert row["n_covered"] == covered
    assert row["coverage"] == pytest.approx(
        covered / len(test), abs=1.1e-6
    )


# ---------------------------------------------------------------------------
# q363 quantile treatment effects
# ---------------------------------------------------------------------------


def test_q363_qte_matches_order_statistics(spark):
    from decimal import Decimal

    rows = {
        r["decile"]: r
        for r in _q(spark, "q363_quantile_treatment_effect").collect()
    }
    ev = _events()
    vals: dict[bool, list[int]] = {True: [], False: []}
    for uid, et, v in zip(ev["user_id"], ev["event_type"], ev["value"]):
        if et != "purchase":
            continue
        treated = _h60(str(int(uid))) % 2 == 0
        vals[treated].append(int(Decimal(str(v)).scaleb(6)))
    q: dict[tuple[bool, int], int] = {}
    for tr, vs in vals.items():
        vs.sort()
        nn = len(vs)
        for k in range(1, 10):
            thr = (k * nn + 9) // 10
            q[(tr, k)] = vs[thr - 1]
    for k in range(1, 10):
        row = rows[k]
        assert row["treat_q_micro"] == q[(True, k)]
        assert row["ctrl_q_micro"] == q[(False, k)]
        assert row["qte_micro"] == q[(True, k)] - q[(False, k)]


# ---------------------------------------------------------------------------
# q427 Matryoshka prefix recall
# ---------------------------------------------------------------------------


def test_q427_prefix_recall_matches_bruteforce_topk(spark):
    rows = {
        r["prefix_dim"]: r
        for r in _q(spark, "q427_matryoshka_prefix_recall").collect()
    }
    emb = _pdf("embeddings", "vec_id, embedding")
    vecs = {
        int(v): [float(x) for x in e]
        for v, e in zip(emb["vec_id"], emb["embedding"])
    }
    qv = vecs[0]

    def topk(dim):
        scored = []
        for vid, x in vecs.items():
            dp = 0.0
            for a, b in zip(x[:dim], qv[:dim]):
                dp += a * b
            scored.append((-round(dp, 6), vid))
        scored.sort()
        return {vid for _, vid in scored[:10]}

    full = topk(64)
    for p in (8, 16, 32):
        overlap = len(topk(p) & full)
        row = rows[p]
        assert row["overlap_at_k"] == overlap
        assert row["recall_milli"] == _tdiv(1000 * overlap, 10)


# ---------------------------------------------------------------------------
# q428 bipartite rich-club density
# ---------------------------------------------------------------------------


def test_q428_rich_club_matches_degree_census(spark):
    rows = {
        r["degree_floor"]: r
        for r in _q(spark, "q428_rich_club_density").collect()
    }
    ev = _events()
    edges = set()
    for uid, et, props in zip(ev["user_id"], ev["event_type"], ev["props"]):
        if et == "click":
            edges.add((int(uid), int(json.loads(props)["k"])))
    du: dict[int, int] = {}
    di: dict[int, int] = {}
    for u, it in edges:
        du[u] = du.get(u, 0) + 1
        di[it] = di.get(it, 0) + 1
    for k in (1, 2, 3):
        ru = {u for u, d in du.items() if d > k}
        ri = {i for i, d in di.items() if d > k}
        ne = sum(1 for u, it in edges if u in ru and it in ri)
        row = rows[k]
        assert row["n_rich_users"] == len(ru)
        assert row["n_rich_items"] == len(ri)
        assert row["n_rich_edges"] == ne
        if ru and ri:
            assert row["density_milli"] == (1000 * ne) // (
                len(ru) * len(ri)
            )
        else:
            assert row["density_milli"] is None
