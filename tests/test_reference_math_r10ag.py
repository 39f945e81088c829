"""Independent replay references, round 10 batch AG: the PROTOCOL and
PIPELINE-PROBE family - the last registered queries without a
from-scratch reference. These exercise entry surfaces (SQL text, pipe
syntax, Python DataSource read/write/stream, SQL UDFs, session
variables, try_-parsing) and the end-to-end batch pipeline; their
oracles restate the same arithmetic in DuckDB SQL, so each test here
recomputes the expected rows in plain Python (dicts, loops, the
floor(x*100 + 0.5) cent lattice both engines apply to doubles since
the r11 tie-class hardening) and pins the Spark result.

q245 SQL-text top-terms, q246/q247 custom source arithmetic, q250
pipe-syntax aggregate, q273 two-phase-commit sink slice, q275
try_cast parse matrix, q276 SQL UDF + lateral units, q277 session
variables, q271/q272 pipeline silver contents, q278 stored-proc
refresh re-render.
"""

from __future__ import annotations

import re

import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR

ANCHOR_US = 1_705_276_800_000_000  # sources/star.ANCHOR_US
US_PER_DAY = 86_400_000_000
US_PER_HOUR = 3_600_000_000


def _q(spark, name):
    from __spark_entry__ import queries

    return queries()[name](spark, SF_DIR)


def _cents(v: float) -> int:
    """FLOOR(value*100 + 0.5) as both engines compute it since the
    round-11 tie-class hardening (q273/q276): two IEEE ops on the
    shared input double, then floor - no tie semantics involved.
    (The pre-r11 form was engine ROUND, i.e. HALF_UP via
    BigDecimal(double); it diverged from DuckDB on exactly-.5 cent
    doubles, which the sf0.1 sweep surfaced.)"""
    import math

    return int(math.floor(v * 100 + 0.5))


def _events():
    t = pq.read_table(
        f"{SF_DIR}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )
    import pyarrow as pa

    return list(
        zip(
            t.column("event_id").to_pylist(),
            t.column("ts").cast(pa.int64()).to_pylist(),
            t.column("user_id").to_pylist(),
            t.column("event_type").to_pylist(),
            t.column("value").to_pylist(),
        )
    )


# ---------------------------------------------------------------------------
# q245: SQL-text entry - top-3 terms per source
# ---------------------------------------------------------------------------


def test_q245_sql_text_top_terms_match_python_rank(spark):
    docs = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["source", "text"]
    )
    counts: dict[str, dict[str, int]] = {}
    for src, text in zip(
        docs.column("source").to_pylist(), docs.column("text").to_pylist()
    ):
        for term in re.split(r"\s+", str(text).strip().lower()):
            d = counts.setdefault(src, {})
            d[term] = d.get(term, 0) + 1
    exp = set()
    for src, d in counts.items():
        ranked = sorted(d.items(), key=lambda kv: (-kv[1], kv[0]))
        for rk, (term, n) in enumerate(ranked[:3], start=1):
            exp.add((src, term, n, rk))
    got = {
        (r["source"], r["term"], int(r["n"]), int(r["rk"]))
        for r in _q(spark, "q245_sql_text_entry").collect()
    }
    assert got == exp


# ---------------------------------------------------------------------------
# q246/q247: custom Python DataSource arithmetic
# ---------------------------------------------------------------------------


def _pyds_expected(lo: int, hi: int):
    agg: dict[int, list[int]] = {}
    for i in range(lo, hi):
        val = (i * 2654435761) % 1000
        s = agg.setdefault(val % 10, [0, 0])
        s[0] += 1
        s[1] += i
    return {b: (n, tot) for b, (n, tot) in agg.items()}


def test_q246_datasource_scan_matches_arithmetic(spark):
    exp = _pyds_expected(50_000, 100_000)  # id >= N/2 filter
    got = {
        int(r["val_bucket"]): (int(r["n"]), int(r["id_sum"]))
        for r in _q(spark, "q246_python_datasource").collect()
    }
    assert got == exp


def test_q247_stream_source_drain_matches_arithmetic(spark):
    exp = _pyds_expected(0, 5_000)
    got = {
        int(r["val_bucket"]): (int(r["n"]), int(r["id_sum"]))
        for r in _q(spark, "q247_python_stream_source").collect()
    }
    assert got == exp


# ---------------------------------------------------------------------------
# q250: pipe-syntax aggregate
# ---------------------------------------------------------------------------


def test_q250_pipe_syntax_matches_python_fold(spark):
    docs = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["source", "lang", "n_chars"]
    )
    agg: dict[str, list[int]] = {}
    for src, lang, nc in zip(
        docs.column("source").to_pylist(),
        docs.column("lang").to_pylist(),
        docs.column("n_chars").to_pylist(),
    ):
        if lang == "en":
            s = agg.setdefault(src, [0, 0])
            s[0] += 1
            s[1] += nc
    exp = {s: (n, tot) for s, (n, tot) in agg.items() if n >= 5}
    got = {
        r["source"]: (int(r["n_docs"]), int(r["chars_total"]))
        for r in _q(spark, "q250_sql_pipe_syntax").collect()
    }
    assert got == exp


# ---------------------------------------------------------------------------
# q273: two-phase-commit sink slice
# ---------------------------------------------------------------------------


def test_q273_sink_roundtrip_preserves_exact_slice(spark):
    exp = {
        eid: (uid, _cents(v))
        for eid, _, uid, _, v in _events()
        if eid % 100 == 0
    }
    rows = _q(spark, "q273_python_datasource_write").collect()
    got = {
        int(r["event_id"]): (int(r["user_id"]), int(r["value_cents"]))
        for r in rows
    }
    assert len(rows) == len(got)  # no double-committed part
    assert got == exp


# ---------------------------------------------------------------------------
# q275: try_cast parse matrix
# ---------------------------------------------------------------------------


def test_q275_parse_matrix_matches_rule_by_rule_replay(spark):
    part = pq.read_table(f"{SF_DIR}/part.parquet", columns=["p_partkey"])
    agg: dict[int, dict] = {}
    for k in part.column("p_partkey").to_pylist():
        v = k % 6
        # i: try_cast to BIGINT - trimmed integer strings only,
        # 20-digit overflow -> NULL
        i = k if v in (0, 1) else None
        # d: try_cast to DOUBLE - any float-parseable string
        d = {
            0: float(k),
            1: float(k),
            2: k + 0.5,
            3: None,
            4: None,
            5: 1e20,
        }[v]
        q_null = (k % 3) == 0  # try_divide(100, 0) -> NULL
        s = agg.setdefault(
            v,
            {"n": 0, "n_int": 0, "sum_int": 0, "n_dbl": 0, "sum_dbl": 0.0,
             "n_div_null": 0},
        )
        s["n"] += 1
        if i is not None:
            s["n_int"] += 1
            s["sum_int"] += i
        if d is not None:
            s["n_dbl"] += 1
            s["sum_dbl"] += d
        if q_null:
            s["n_div_null"] += 1
    got = {
        int(r["variant"]): r
        for r in _q(spark, "q275_try_safe_parsing").collect()
    }
    assert set(got) == set(agg)
    for v, s in agg.items():
        r = got[v]
        assert (
            int(r["n"]),
            int(r["n_int"]),
            int(r["sum_int"]),
            int(r["n_dbl"]),
            int(r["n_div_null"]),
        ) == (s["n"], s["n_int"], s["sum_int"], s["n_dbl"], s["n_div_null"])
        if s["n_dbl"]:
            assert r["sum_dbl"] == pytest.approx(s["sum_dbl"], rel=1e-12)
        else:
            assert r["sum_dbl"] is None


# ---------------------------------------------------------------------------
# q276: SQL UDF + lateral unit expansion
# ---------------------------------------------------------------------------


def test_q276_sql_udfs_match_clamp_and_unit_math(spark):
    agg: dict[str, list] = {}
    for eid, _, _, et, v in _events():
        s = agg.setdefault(et, [set(), 0.0, 0])
        s[0].add(eid)
        s[1] += min(max(v, 10.0), 400.0)
        # started 100-unit blocks OF THE WINSORIZED value, min 1 per
        # event (r11: zero-cent events occupy one unit so the lateral
        # stays total; r13: clamp-first bounds the lateral at <= 4
        # rows - the raw-value fan-out was linear in an unbounded
        # column and overflowed INT on the extreme census)
        s[2] += max(1, (_cents(min(max(v, 10.0), 400.0)) + 9999) // 10000)
    got = {
        r["event_type"]: r for r in _q(spark, "q276_sql_udfs").collect()
    }
    assert set(got) == set(agg)
    for et, (ids, wins, units) in agg.items():
        r = got[et]
        assert int(r["n_events"]) == len(ids)
        assert int(r["n_units"]) == units
        assert r["sum_winsorized"] == pytest.approx(wins, abs=0.011)


# ---------------------------------------------------------------------------
# q277: session variables
# ---------------------------------------------------------------------------


def test_q277_session_variables_fold_to_plain_predicate(spark):
    agg: dict[str, list] = {}
    for _, ts, _, et, v in _events():
        if v > 95.0 and ts % 7 == 3:
            s = agg.setdefault(et, [0, 0.0])
            s[0] += 1
            s[1] += v
    got = {
        r["event_type"]: r
        for r in _q(spark, "q277_session_variables").collect()
    }
    assert set(got) == set(agg)
    for et, (n, tot) in agg.items():
        assert int(got[et]["n_over"]) == n
        assert got[et]["sum_over"] == pytest.approx(tot, abs=0.011)


# ---------------------------------------------------------------------------
# q271/q272/q278: pipeline probes - expected silver built in Python
# ---------------------------------------------------------------------------


def _expected_silver():
    part = pq.read_table(
        f"{SF_DIR}/part.parquet",
        columns=["p_partkey", "p_name", "p_brand", "p_type"],
    )
    exp = {}
    for k, name, brand, ptype in zip(
        part.column("p_partkey").to_pylist(),
        part.column("p_name").to_pylist(),
        part.column("p_brand").to_pylist(),
        part.column("p_type").to_pylist(),
    ):
        if k % 10 != 0:
            continue
        salary = (
            ((k % 50 + 1) + (k % 50 + 11)) / 2.0 if k % 2 == 0 else None
        )
        exp[f"https://jobs/{k}"] = (
            str(name).strip(),
            salary,
            brand,
            ANCHOR_US - (k % 100 + 1) * US_PER_HOUR,
            ptype,
            f"Còn {k % 20 + 1} ngày để ứng tuyển",
            ANCHOR_US + (k % 20 + 1) * US_PER_DAY,
        )
    return exp


@pytest.mark.parametrize(
    "qname", ["q271_pipeline_silver", "q272_pipeline_silver_bucketed"]
)
def test_q271_q272_silver_matches_python_build(spark, qname):
    exp = _expected_silver()
    rows = _q(spark, qname).collect()
    got = {r["job_link"]: r for r in rows}
    assert len(rows) == len(got)  # replay batch deduped: one row/link
    assert set(got) == set(exp)
    for link, (nm, sal, brand, posted, loc, rem, due) in exp.items():
        r = got[link]
        assert r["job_name"] == nm and r["company_name"] == brand
        assert int(r["posted_us"]) == posted and int(r["due_us"]) == due
        assert r["job_location"] == loc and r["remaining_time"] == rem
        if sal is None:
            assert r["salary"] is None
        else:
            assert r["salary"] == pytest.approx(sal, abs=1e-9)


def test_q278_refresh_rerenders_every_bucket(spark):
    now_us = ANCHOR_US + 10 * US_PER_DAY + 3 * US_PER_HOUR
    exp = {}
    for link, (_, _, _, _, _, _, due) in _expected_silver().items():
        diff_s = (due - now_us) // 1_000_000
        if diff_s <= 0:
            rem = "Đã hết thời gian ứng tuyển"
        elif diff_s < 60:
            rem = f"Còn {diff_s} giây để ứng tuyển"
        elif diff_s < 3600:
            rem = f"Còn {diff_s // 60} phút để ứng tuyển"
        elif diff_s < 86400:
            rem = f"Còn {diff_s // 3600} giờ để ứng tuyển"
        else:
            rem = f"Còn {diff_s // 86400} ngày để ứng tuyển"
        exp[link] = rem
    got = {
        r["job_link"]: r["remaining_time"]
        for r in _q(spark, "q278_remaining_time_refresh").collect()
    }
    assert got == exp
    # the 10d3h clock advance must have moved EVERY row off its
    # write-time 'X ngày' render for days 1-11
    assert any(v == "Đã hết thời gian ứng tuyển" for v in got.values())
    assert any("giờ" in v for v in got.values())
