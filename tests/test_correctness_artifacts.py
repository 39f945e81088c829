"""Tri-SF correctness artifact pins (round 11).

The in-repo oracle sweeps are the engine's widest exactness signal:
every registered query compared value-exact against its DuckDB twin
at THREE scale factors - sf0.001 (CORRECTNESS_SF0001.json), sf0.01
(CORRECTNESS_FULL.json, the driver-gate SF), and - new in round 11 -
sf0.1 (CORRECTNESS_SF01.json, the BENCH SF, so the numbers the perf
story quotes come from plans proven exact at that very scale). These
pins make the artifacts load-bearing: each must exist, cover the
whole registry (minus env-gated registrations), and contain zero red
rows. Registering a query without re-running the sweeps (subset
`--json` runs MERGE, so per-row refresh is cheap) fails here the same
way the invariance and plan-shape pins fail.
"""

from __future__ import annotations

import os

import pytest

from tests.conftest import (
    REPO_ROOT as REPO,
    env_gated_names as _env_gated,
    load_artifact as _load,
)

ARTIFACTS = {
    "CORRECTNESS_SF0001.json": "sf0.001",
    "CORRECTNESS_FULL.json": "sf0.01",
    "CORRECTNESS_SF01.json": "sf0.1",
}


@pytest.mark.parametrize("artifact,sf", sorted(ARTIFACTS.items()))
def test_sweep_covers_registry(artifact, sf):
    from web_scraping_etl_pipeline_spark.plans import QUERIES

    assert os.path.exists(os.path.join(REPO, artifact)), (
        f"{artifact} missing - run `python tools/oracle_check.py "
        f"--json {artifact} /root/testdata/{sf}`"
    )
    records = _load(artifact)
    missing = sorted(set(QUERIES) - set(records) - _env_gated())
    assert missing == [], (
        f"{artifact} stale: {len(missing)} registered queries missing, "
        f"e.g. {missing[:5]} - subset oracle_check runs merge per-row"
    )


@pytest.mark.parametrize("artifact", sorted(ARTIFACTS))
def test_sweep_has_no_red_rows(artifact):
    records = _load(artifact)
    bad = {}
    for name, rec in records.items():
        if not isinstance(rec, dict):
            bad[name] = rec
            continue
        err = rec.get("err")
        if err and "rows-only" in str(err):
            # streaming/non-SQL ops: the weaker rows-only record
            if rec.get("rows_match") is not True:
                bad[name] = rec
            continue
        if not (
            rec.get("rows_match") is True
            and rec.get("schema_match") is True
            and rec.get("values_match") is True
            and not err
        ):
            bad[name] = rec
    assert bad == {}, (
        f"{artifact}: {len(bad)} non-green rows, e.g. "
        f"{dict(list(bad.items())[:3])}"
    )


def test_rows_scale_with_sf():
    """Cross-artifact sanity: the sweeps really ran at different SFs -
    for a supermajority of shared oracle-checked queries the sf0.1 row
    count is >= the sf0.001 row count (row counts are monotone in data
    volume for almost every registered shape; a wholesale copy of one
    artifact into another would fail this)."""
    small = _load("CORRECTNESS_SF0001.json")
    big = _load("CORRECTNESS_SF01.json")
    shared = [
        n
        for n, rec in small.items()
        if n in big
        and isinstance(rec.get("spark_rows"), int)
        and isinstance(big[n].get("spark_rows"), int)
    ]
    assert len(shared) >= 400
    ge = sum(1 for n in shared if big[n]["spark_rows"] >= small[n]["spark_rows"])
    identical = sum(
        1 for n in shared if big[n]["spark_rows"] == small[n]["spark_rows"]
    )
    assert ge >= 0.9 * len(shared)
    # and they are not byte-copies of each other: plenty of queries
    # must differ in row count across a 100x data spread
    assert identical <= 0.8 * len(shared)


@pytest.mark.parametrize("artifact", sorted(ARTIFACTS))
def test_sweep_rows_are_fresh(artifact):
    """A rewritten query (or a rewritten ORACLE twin - it lives in the
    @query decorator, which body_hash strips) keeps its artifact row,
    but the recorded fingerprints no longer match HEAD. Recompute both
    hashes for every row so a stale green sweep row can never coast
    (VERDICT r11 item 2; the same pin INVARIANCE/PLANSHAPE gained in
    r11). Subset re-runs merge per-row:
    `python tools/oracle_check.py --json <artifact> <sf_dir> <names>`.
    """
    from tools.invariance_check import body_hash, oracle_hash
    from web_scraping_etl_pipeline_spark.plans import QUERIES

    records = _load(artifact)
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
        f"{artifact}: {len(stale)} rows predate a rewrite, e.g. "
        f"{stale[:5]} - re-run tools/oracle_check.py for those names"
    )


def test_sweep_freshness_pin_is_not_vacuous(monkeypatch):
    """Deliberate-rewrite rehearsal (VERDICT r11 item 2's Done
    criterion): perturbing a shared formula constant OR an oracle
    string must make the freshness comparison flag the consumer row -
    i.e. the pin actually fires on the r11 shared-formula class."""
    from tools.invariance_check import body_hash, oracle_hash
    from web_scraping_etl_pipeline_spark.plans import ORACLE, stattests

    records = _load("CORRECTNESS_FULL.json")
    name = "q01_deadline_horizon"
    assert records[name]["oracle_hash"] == oracle_hash(name)
    monkeypatch.setitem(ORACLE, name, ORACLE[name] + " -- rewrite")
    assert records[name]["oracle_hash"] != oracle_hash(name)
    monkeypatch.undo()

    # find a stattests query that actually reads the shared _MK_Z string
    from tools.invariance_check import _normalized_node
    from web_scraping_etl_pipeline_spark.plans import QUERIES

    consumer = next(
        n for n, fn in QUERIES.items()
        if fn.__module__.endswith("stattests")
        and "_MK_Z" in _normalized_node(fn)[1]
    )
    assert records[consumer]["body_hash"] == body_hash(consumer)
    monkeypatch.setattr(stattests, "_MK_Z", stattests._MK_Z + " ")
    assert records[consumer]["body_hash"] != body_hash(consumer)
