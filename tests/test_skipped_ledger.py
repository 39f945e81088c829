"""SKIPPED.json pins every registry id gap (VERDICT r8 item 5).

Before this ledger, q249's env-gated absence and the q48/q49/q311/q397
numbering gaps were invisible to artifact consumers - nothing
machine-readable explained why CORRECTNESS_FULL.json never mentions
them. These tests make silent de-registration loud: removing a query
(or introducing a new id gap) without a ledger row fails CI, and a
ledger row for an id that IS registered is flagged as stale.
"""

from __future__ import annotations

import json
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def ledger() -> dict:
    with open(os.path.join(REPO, "SKIPPED.json")) as fh:
        return json.load(fh)


@pytest.fixture(scope="module")
def registered_ids() -> set[int]:
    from web_scraping_etl_pipeline_spark.plans import QUERIES

    return {
        int(m.group(1))
        for n in QUERIES
        if (m := re.match(r"q(\d+)", n))
    }


def test_every_id_gap_has_a_ledger_row(ledger, registered_ids):
    gaps = [
        i for i in range(1, max(registered_ids) + 1)
        if i not in registered_ids
    ]
    missing = [i for i in gaps if f"q{i}" not in ledger]
    assert missing == [], (
        f"ids {missing} are neither registered nor explained in "
        "SKIPPED.json - a query was removed (or an id skipped) without "
        "recording why"
    )


def test_no_stale_ledger_rows(ledger, registered_ids):
    # env-gated rows (q249) MAY be registered in richer environments;
    # unconditional rows must stay unregistered.
    stale = [
        k for k, v in ledger.items()
        if k.startswith("q") and v.get("env_condition") is None
        and int(k[1:]) in registered_ids
    ]
    assert stale == [], f"ledger rows {stale} are registered again"


def test_every_row_carries_a_reason(ledger):
    for k, v in ledger.items():
        if not k.startswith("q"):
            continue
        assert isinstance(v.get("reason"), str) and len(v["reason"]) > 10, k
        assert "env_condition" in v, k


def test_env_gate_matches_environment(ledger):
    # the q249 row's condition must agree with reality: if protobuf IS
    # importable the query must be registered (and vice versa).
    from web_scraping_etl_pipeline_spark.plans import QUERIES

    try:
        from google.protobuf import descriptor  # noqa: F401

        have = True
    except Exception:
        have = False
    registered = "q249_transform_with_state" in QUERIES
    assert registered == have, (
        "q249 registration disagrees with the google.protobuf gate "
        f"(importable={have}, registered={registered})"
    )
