"""Independent replay references, round 10 batch AE: the STREAMING
family, part 2 - the queries whose oracles encode EMPIRICALLY-PINNED
eviction/emission boundaries (q223/q232's ceil-ms eviction, q262's
chained-watermark delay, q265's strict timer firing). Each boundary
is re-derived here from first principles in pure Python so a
mis-derived rule shared by the Spark code and its DuckDB twin cannot
survive: the replay builds the FULL match set and then applies the
documented state-machine rule step by step.

q223 left-outer stream-stream join, q232 full-outer (asymmetric
eviction), q237 update-mode upsert final state, q262 join->window
chained watermark, q265 timer sessions (strict ms boundary), q217
per-source admission quota, q206 streaming LSH near-dup screen vs a
from-scratch MinHash/band index.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR
from tests.test_reference_math_r10ad import (
    GAP_US,
    US_PER_DAY,
    US_PER_HOUR,
    _events,
    _interval_pairs,
    _sessions,
)

SOURCE_QUOTA = 25  # docs admitted per source (docs_stream.SOURCE_QUOTA)


def _q(spark, name):
    from __spark_entry__ import queries

    return queries()[name](spark, SF_DIR)


@pytest.fixture(scope="module")
def events():
    return _events()


def _sides(events):
    """({purchase_id: (user, ts)}, {click_id: (user, ts)}, watermark_ms):
    the global watermark is min over the two watermarked sources' max
    event times, floored to millisecond precision."""
    p = {eid: (uid, ts) for eid, ts, uid, et, _ in events if et == "purchase"}
    c = {eid: (uid, ts) for eid, ts, uid, et, _ in events if et == "click"}
    wm = (min(max(ts for _, ts in p.values()),
              max(ts for _, ts in c.values())) // 1000) * 1000
    return p, c, wm


# ---------------------------------------------------------------------------
# q223: left-outer - unmatched purchases flush at the eviction boundary
# ---------------------------------------------------------------------------


def test_q223_left_outer_matches_plus_evicted_unmatched(spark, events):
    p, c, wm = _sides(events)
    matched = _interval_pairs(events)  # brute-force inner matches
    matched_p = {pid for pid, _ in matched}
    exp = {
        (pid, cid, p[pid][0], p[pid][1], c[cid][1])
        for pid, cid in matched
    }
    for pid, (uid, pts) in p.items():
        # state rows evict when ceil-ms(ts) < watermark-ms, i.e.
        # ts <= wm - 1000; only EVICTED unmatched purchases null-flush
        if pid not in matched_p and pts <= wm - 1000:
            exp.add((pid, None, uid, pts, None))
    got = {
        (
            int(r["purchase_id"]),
            None if r["click_id"] is None else int(r["click_id"]),
            int(r["user_id"]),
            int(r["purchase_us"]),
            None if r["click_us"] is None else int(r["click_us"]),
        )
        for r in _q(spark, "q223_stream_stream_left_outer").collect()
    }
    assert got == exp


# ---------------------------------------------------------------------------
# q232: full-outer - asymmetric eviction boundaries
# ---------------------------------------------------------------------------


def test_q232_full_outer_asymmetric_eviction(spark, events):
    p, c, wm = _sides(events)
    matched = _interval_pairs(events)
    matched_p = {pid for pid, _ in matched}
    matched_c = {cid for _, cid in matched}
    exp = {
        (pid, p[pid][1], cid, c[cid][1], p[pid][0])
        for pid, cid in matched
    }
    for pid, (uid, pts) in p.items():
        if pid not in matched_p and pts <= wm - 1000:
            exp.add((pid, pts, None, None, uid))
    for cid, (uid, cts) in c.items():
        # a click can still match purchases up to 1h after it, so its
        # state lives an extra interval width before the null flush
        if cid not in matched_c and cts <= wm - US_PER_HOUR - 1000:
            exp.add((None, None, cid, cts, uid))
    got = {
        (
            None if r["purchase_id"] is None else int(r["purchase_id"]),
            None if r["purchase_us"] is None else int(r["purchase_us"]),
            None if r["click_id"] is None else int(r["click_id"]),
            None if r["click_us"] is None else int(r["click_us"]),
            int(r["user_id"]),
        )
        for r in _q(spark, "q232_stream_stream_full_outer").collect()
    }
    assert got == exp


# ---------------------------------------------------------------------------
# q237: update-mode + keyed upsert -> final sink state = full aggregate
# ---------------------------------------------------------------------------


def test_q237_upsert_final_state_equals_full_fold(spark, events):
    exp: dict[tuple[int, str], list] = {}
    for _, ts, _, et, v in events:
        day_us = (ts // US_PER_DAY) * US_PER_DAY
        s = exp.setdefault((day_us, et), [0, 0.0])
        s[0] += 1
        s[1] += v
    got = {
        (int(r["day_us"]), r["event_type"]): r
        for r in _q(spark, "q237_stream_update_upsert").collect()
    }
    assert set(got) == set(exp)  # keyed MERGE left exactly one row/key
    for key, (n, tot) in exp.items():
        assert int(got[key]["n"]) == n
        assert got[key]["total_value"] == pytest.approx(tot, abs=0.011)


# ---------------------------------------------------------------------------
# q262: interval join -> daily window, chained watermark delay
# ---------------------------------------------------------------------------


def test_q262_chained_watermark_delays_by_interval_span(spark, events):
    p, c, wm = _sides(events)
    counts: dict[int, int] = {}
    for pid, _cid in _interval_pairs(events):
        day_us = (p[pid][1] // US_PER_DAY) * US_PER_DAY
        counts[day_us] = counts.get(day_us, 0) + 1
    # the join's output watermark lags the global one by the 1h span;
    # the window finalizes at the same ceil-ms boundary as eviction
    exp = {
        d: n
        for d, n in counts.items()
        if d + US_PER_DAY + US_PER_HOUR + 1000 <= wm
    }
    got = {
        int(r["day_us"]): int(r["n_attributed"])
        for r in _q(spark, "q262_stream_join_then_window").collect()
    }
    assert got == exp


# ---------------------------------------------------------------------------
# q265: event-time timer sessions - strict floor-ms < floor-ms firing
# ---------------------------------------------------------------------------


def test_q265_timer_boundary_is_strict_unlike_q212(spark, events):
    max_ts = max(ts for _, ts, _, _, _ in events)
    exp = {
        (uid, start, end): n
        for uid, start, end, n in _sessions(events)
        # timer armed at floor-ms(end), fires when watermark-ms is
        # STRICTLY greater (vs q212's inclusive <=)
        if end // 1000 < max_ts // 1000
    }
    got = {
        (
            int(r["user_id"]),
            int(r["session_start_us"]),
            int(r["session_end_us"]),
        ): int(r["n_events"])
        for r in _q(spark, "q265_stateful_timeout_sessions").collect()
    }
    assert got == exp


# ---------------------------------------------------------------------------
# q217: per-source admission quota
# ---------------------------------------------------------------------------


def test_q217_quota_admits_first_k_per_source_in_doc_order(spark):
    docs = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "source"]
    )
    by_source: dict[str, list[int]] = {}
    for did, src in zip(
        docs.column("doc_id").to_pylist(), docs.column("source").to_pylist()
    ):
        by_source.setdefault(src, []).append(did)
    exp = {}
    for src, ids in by_source.items():
        for rank, did in enumerate(sorted(ids)[:SOURCE_QUOTA], start=1):
            exp[did] = (src, rank)
    got = {
        int(r["doc_id"]): (r["source"], int(r["admit_rank"]))
        for r in _q(spark, "q217_stream_source_quota").collect()
    }
    assert got == exp


# ---------------------------------------------------------------------------
# q206: streaming LSH near-dup screen vs from-scratch band index
# ---------------------------------------------------------------------------


def test_q206_stream_collisions_match_python_band_index(spark):
    # reuse batch F's from-scratch MinHash machinery (tokens, shingles,
    # md5-prefix base hash, affine permutations) - built here WITHOUT
    # the hot-bucket cap, which q206 does not apply
    from tests.test_reference_math_r10f import (
        LSH_BANDS,
        LSH_ROWS,
        MINHASH_K,
        MINHASH_P,
        _h60,
        _shingles,
        _toks,
    )
    import hashlib

    docs = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    )
    bands: dict[int, list[tuple[int, str]]] = {}
    bucket_of: dict[int, int] = {}
    for did, text in zip(
        docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()
    ):
        bucket_of[did] = _h60(str(did)) % 100  # q79 hash split
        grams = set(_shingles(_toks(text)))
        if not grams:
            continue
        xs = [_h60(g) % MINHASH_P for g in grams]
        sig = [
            min(((2 * p + 1) * x + (1000003 * p + 12345)) % MINHASH_P
                for x in xs)
            for p in range(MINHASH_K)
        ]
        bands[did] = [
            (
                b,
                hashlib.md5(
                    "_".join(
                        str(sig[b * LSH_ROWS + r]) for r in range(LSH_ROWS)
                    ).encode()
                ).hexdigest(),
            )
            for b in range(LSH_BANDS)
        ]
    index: dict[tuple[int, str], list[int]] = {}
    for did, bks in bands.items():
        if bucket_of[did] < 80:  # train split = standing index
            for bk in bks:
                index.setdefault(bk, []).append(did)
    exp = set()
    for did, bks in bands.items():
        if bucket_of[did] >= 90:  # test split = "today's crawl"
            for band, key in bks:
                for idx_doc in index.get((band, key), ()):
                    exp.add((did, idx_doc, band))
    rows = _q(spark, "q206_stream_lsh_neardup").collect()
    got = [
        (int(r["new_doc_id"]), int(r["index_doc_id"]), int(r["band"]))
        for r in rows
    ]
    assert len(got) == len(set(got))  # exactly-once per collision
    assert set(got) == exp
