"""Degenerate-corpus totality ledgers (round 11): empty AND 1-row.

The r11 empty-corpus census ran every registered query AND its oracle
on a 0-row star schema (``tools/empty_fixture.py`` +
``tools/oracle_check.py --json DEGENERATE_SWEEP.json <empty_dir>``)
and found 34 divergences; 16 were fixed (guard-parity CASEs for ANSI
divisions, COALESCE for NULL-vs-0 count desyncs, HAVING COUNT(*) > 0
for the rollup-grand-total-on-empty engine difference, typed empty
frames for the pipeline probes' empty-scrape-day path). The remaining
18 are ops whose DEFINITION needs data - driver-loop plans that
collect bounded state at construction (query vectors, centroids,
vocabulary, greedy seeds) or schemas derived from data (unpivot value
columns) - and are LEDGERED here with their reason class, the
no-silent-caps pattern: every registered query must either be green
in the committed empty sweep or carry an explicit row below.
"""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CUR = os.path.join(REPO, "DEGENERATE_SWEEP.json")
ONE = os.path.join(REPO, "DEGENERATE_SWEEP_1ROW.json")

#: query -> reason class, for queries whose DEFINITION needs data.
#: EMPTY SINCE ROUND 12 (VERDICT r11 item 3): the 18 r11 entries -
#: construction-collect driver loops (query vectors, centroids,
#: vocabulary, greedy seeds) and q75's data-derived unpivot columns -
#: now carry construction-time degenerate early-outs that return the
#: ORACLE's own empty-input output (usually the 0-row typed frame,
#: for the five aggregate-readout oracles the literal all-NULL/zero
#: readout row the SQL aggregate-over-empty emits). The registry is
#: 436/436 total on the empty corpus; keep this dict for any future
#: operator the early-out device genuinely cannot cover.
EXPECTED_NONEMPTY: dict[str, str] = {}


#: 1-ROW-corpus ledger (the second census depth). EMPTY SINCE ROUND
#: 12: q177 (no edges from one event -> 0-row early-out like the
#: oracle), q269/q284 (greedy loops now STOP when candidates exhaust,
#: matching the oracle's empty tail CTEs) were the last three.
EXPECTED_NONEMPTY_1ROW: dict[str, str] = {}


def _load(path=None):
    with open(path or CUR) as fh:
        return json.load(fh)


def test_empty_sweep_exists_and_covers_registry():
    assert os.path.exists(CUR), (
        "DEGENERATE_SWEEP.json missing - python tools/empty_fixture.py "
        "/tmp/sf_empty && python tools/oracle_check.py --json "
        "DEGENERATE_SWEEP.json /tmp/sf_empty"
    )
    from web_scraping_etl_pipeline_spark.plans import QUERIES

    records = _load()
    with open(os.path.join(REPO, "SKIPPED.json")) as fh:
        gated = {
            v.get("name")
            for v in json.load(fh).values()
            if isinstance(v, dict) and v.get("env_condition")
        }
    missing = sorted(set(QUERIES) - set(records) - gated)
    assert missing == [], (
        f"{len(missing)} registered queries missing from the empty "
        f"sweep, e.g. {missing[:5]} (subset oracle_check runs merge)"
    )


def test_every_query_total_on_empty_or_ledgered():
    records = _load()
    bad = {}
    for name, rec in records.items():
        if name in EXPECTED_NONEMPTY:
            continue
        if not isinstance(rec, dict):
            bad[name] = rec
            continue
        err = rec.get("err")
        if err and "rows-only" in str(err):
            if rec.get("rows_match") is not True:
                bad[name] = rec
            continue
        if not (
            rec.get("rows_match") is True
            and rec.get("schema_match") is True
            and rec.get("values_match") is True
            and not err
        ):
            bad[name] = {"err": str(err)[:120]}
    assert bad == {}, (
        f"{len(bad)} queries diverge on an EMPTY corpus without a "
        f"ledger row: {dict(list(bad.items())[:5])}"
    )


def test_ledger_rows_are_not_stale():
    """A ledgered query that has become total should leave the ledger
    (rows here must actually FAIL the empty sweep)."""
    records = _load()
    stale = sorted(
        n
        for n in EXPECTED_NONEMPTY
        if n in records
        and isinstance(records[n], dict)
        and records[n].get("values_match") is True
    )
    assert stale == [], (
        f"ledger rows {stale} now pass the empty sweep - remove them"
    )


def test_one_row_sweep_exists_and_is_total_or_ledgered():
    """Same contract as the empty sweep, one depth further: every
    registered query must be green on a 1-ROW-per-table fixture
    (`python tools/empty_fixture.py /tmp/sf_one <template> 1` then
    oracle_check --json DEGENERATE_SWEEP_1ROW.json) or carry an
    explicit EXPECTED_NONEMPTY_1ROW row. The r11 census started at
    383/436 here; 50 divergences (49 of them one class - Spark ANSI
    division erroring where DuckDB NULLs when an n=1 input zeroes a
    variance/df/denominator) were fixed with NULLIF guard parity."""
    from web_scraping_etl_pipeline_spark.plans import QUERIES

    assert os.path.exists(ONE)
    records = _load(ONE)
    with open(os.path.join(REPO, "SKIPPED.json")) as fh:
        gated = {
            v.get("name")
            for v in json.load(fh).values()
            if isinstance(v, dict) and v.get("env_condition")
        }
    missing = sorted(set(QUERIES) - set(records) - gated)
    assert missing == []
    bad = {}
    for name, rec in records.items():
        if name in EXPECTED_NONEMPTY_1ROW:
            continue
        err = rec.get("err")
        if err and "rows-only" in str(err):
            if rec.get("rows_match") is not True:
                bad[name] = rec
            continue
        if not (
            rec.get("rows_match") is True
            and rec.get("schema_match") is True
            and rec.get("values_match") is True
            and not err
        ):
            bad[name] = {"err": str(err)[:120]}
    assert bad == {}, (
        f"{len(bad)} queries diverge on a 1-ROW corpus without a "
        f"ledger row: {dict(list(bad.items())[:5])}"
    )
    stale = sorted(
        n
        for n in EXPECTED_NONEMPTY_1ROW
        if n in records and records[n].get("values_match") is True
    )
    assert stale == []


def test_degenerate_sweep_rows_are_fresh():
    """Same freshness discipline as the correctness artifacts
    (VERDICT r11 item 2): every row in BOTH degenerate sweeps must
    carry the HEAD body/oracle fingerprints, so a rewritten query
    cannot coast on a stale green totality row."""
    from tools.invariance_check import body_hash, oracle_hash
    from web_scraping_etl_pipeline_spark.plans import QUERIES

    for path in (CUR, ONE):
        records = _load(path)
        stale = sorted(
            n
            for n, rec in records.items()
            if n in QUERIES
            and isinstance(rec, dict)
            and (
                rec.get("body_hash") != body_hash(n)
                or rec.get("oracle_hash") != oracle_hash(n)
            )
        )
        assert stale == [], (
            f"{os.path.basename(path)}: {len(stale)} rows predate a "
            f"rewrite, e.g. {stale[:5]} - re-run tools/oracle_check.py "
            f"--json {os.path.basename(path)} <fixture_dir> <names>"
        )
