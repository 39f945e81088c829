"""Driver-contract gates for __spark_entry__.py: the ordering policy
the correctness gate samples from must stay deterministic, pinned, and
fully oracle-backed.
"""

from __future__ import annotations

import importlib
import sys

sys.path.insert(0, "/root/repo")

entry_mod = importlib.import_module("__spark_entry__")


def test_pinned_core_leads_the_gate():
    q = list(entry_mod.queries())
    assert q[: len(entry_mod.PINNED_CORE)] == entry_mod.PINNED_CORE
    assert q[0] == entry_mod.FLAGSHIP


def test_gate_order_is_deterministic_and_complete():
    a = list(entry_mod.queries())
    b = list(entry_mod.queries())
    assert a == b
    from web_scraping_etl_pipeline_spark.plans import QUERIES

    assert set(a) == set(QUERIES)
    assert len(a) == len(QUERIES)


def test_gated_prefix_is_oracle_backed():
    """Every query in the 50-slot gate window must have a DuckDB twin
    (rows-only entries like q74 may exist in the registry, but the
    deterministic schedule should never waste a gated slot on one
    without the stronger check unless it is its scheduled turn)."""
    q = list(entry_mod.queries())[: entry_mod.GATE_SLOTS]
    oracles = entry_mod.oracle_sql()
    missing = [n for n in q if n not in oracles]
    # since round 5 every query carries an oracle (the former
    # rows-only sketch rows q74/q256 now use exact-count bridges);
    # anything missing an oracle is a registration bug.
    assert missing == [], missing


def test_oracle_keys_match_queries():
    q = set(entry_mod.queries())
    o = set(entry_mod.oracle_sql())
    assert o <= q
    assert q - o == set()  # full oracle coverage since round 5


def test_rotation_covers_every_query_within_bounded_period(monkeypatch):
    # VERDICT r4 item 3: with ~36 free slots over the rotating tail,
    # the driver checks a given extension query every ~period rounds.
    # Pin that the rotation (a) keeps the pinned core inside the
    # 50-slot window at EVERY round, and (b) cycles the full registry
    # through the window within ceil(len(rest)/free) rounds - so a
    # future registry insertion can't silently starve a query of
    # driver checks.
    from web_scraping_etl_pipeline_spark.plans import QUERIES

    names = list(QUERIES)
    pinned = [n for n in entry_mod.PINNED_CORE if n in names]
    rest = sorted(n for n in names if n not in entry_mod.PINNED_CORE)
    free = max(entry_mod.GATE_SLOTS - len(pinned), 1)
    period = -(-len(rest) // free)  # ceil

    # neutralize the failure fast-track for the pure-rotation math
    monkeypatch.setattr(entry_mod, "_last_round_failures", lambda: [])
    seen: set[str] = set()
    for rnd in range(period):
        monkeypatch.setattr(entry_mod, "_round_number", lambda r=rnd: r)
        window = entry_mod._gate_order(names)[: entry_mod.GATE_SLOTS]
        assert window[: len(pinned)] == pinned, f"core left window at round {rnd}"
        seen.update(window)
    assert seen == set(names), (
        f"rotation period {period} misses {sorted(set(names) - seen)[:5]}..."
    )


def test_rotation_advances_between_rounds(monkeypatch):
    # consecutive rounds must present different tails (the rotation
    # actually rotates), with deterministic order inside one round.
    names = list(entry_mod.QUERIES)
    monkeypatch.setattr(entry_mod, "_round_number", lambda: 3)
    w3 = entry_mod._gate_order(names)
    w3b = entry_mod._gate_order(names)
    assert w3 == w3b
    monkeypatch.setattr(entry_mod, "_round_number", lambda: 4)
    w4 = entry_mod._gate_order(names)
    assert w3[: entry_mod.GATE_SLOTS] != w4[: entry_mod.GATE_SLOTS]


def test_last_round_failures_fast_tracked(monkeypatch):
    # a red row in the previous round's driver artifact must appear in
    # THIS round's 50-slot window, right after the pinned core.
    names = list(entry_mod.QUERIES)
    victim = "q230_token_budget_fill"
    monkeypatch.setattr(
        entry_mod, "_last_round_failures", lambda: [victim]
    )
    window = entry_mod._gate_order(names)[: entry_mod.GATE_SLOTS]
    pinned = [n for n in entry_mod.PINNED_CORE if n in names]
    assert window[len(pinned)] == victim


def test_failure_parser_reads_r04_artifact():
    # the real r4 artifact contains exactly one red row (q230's
    # cross-engine hash); the parser must find it and nothing else,
    # and treat rows-only records as green. Pinned to the r4 file
    # explicitly so the test survives later rounds' artifacts.
    import os

    art = os.path.join(
        os.path.dirname(os.path.abspath(entry_mod.__file__)),
        "CORRECTNESS_r04.json",
    )
    fails = entry_mod._last_round_failures(art)
    assert fails == ["q230_token_budget_fill"]
