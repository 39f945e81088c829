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


def test_schedule_covers_every_query_within_bounded_period(monkeypatch):
    # Least-recently-checked-first scheduling: simulate the driver
    # loop (each round's 50-slot window lands in an artifact, which
    # updates the last-checked map) and pin that (a) the pinned core
    # stays inside the window at EVERY round and (b) the full registry
    # cycles through within ceil(len(rest)/free) rounds - a registry
    # insertion can't silently starve a query of driver checks.
    from web_scraping_etl_pipeline_spark.plans import QUERIES

    names = list(QUERIES)
    pinned = [n for n in entry_mod.PINNED_CORE if n in names]
    rest = sorted(n for n in names if n not in entry_mod.PINNED_CORE)
    free = max(entry_mod.GATE_SLOTS - len(pinned), 1)
    period = -(-len(rest) // free)  # ceil

    # neutralize the failure fast-track + refresh for pure-schedule math
    monkeypatch.setattr(entry_mod, "_last_round_failures", lambda: [])
    monkeypatch.setattr(entry_mod, "REFRESH_QUEUE", {})
    checked: dict[str, int] = {}
    monkeypatch.setattr(
        entry_mod, "_last_checked_round", lambda: dict(checked)
    )
    seen: set[str] = set()
    for rnd in range(1, period + 1):
        window = entry_mod._gate_order(names)[: entry_mod.GATE_SLOTS]
        assert window[: len(pinned)] == pinned, f"core left window at round {rnd}"
        seen.update(window)
        for name in window:  # the driver records the window it ran
            checked[name] = rnd
    assert seen == set(names), (
        f"schedule period {period} misses {sorted(set(names) - seen)[:5]}..."
    )


def test_never_checked_queries_lead_the_tail(monkeypatch):
    # A query absent from every driver artifact must outrank one
    # already checked, regardless of name order.
    names = list(entry_mod.QUERIES)
    monkeypatch.setattr(entry_mod, "_last_round_failures", lambda: [])
    monkeypatch.setattr(entry_mod, "REFRESH_QUEUE", {})
    tail = [n for n in sorted(names) if n not in entry_mod.PINNED_CORE]
    # mark everything checked except one late-alphabet victim
    victim = tail[-1]
    monkeypatch.setattr(
        entry_mod,
        "_last_checked_round",
        lambda: {n: 1 for n in tail if n != victim},
    )
    order = entry_mod._gate_order(names)
    pinned = [n for n in entry_mod.PINNED_CORE if n in names]
    assert order[len(pinned)] == victim


def test_never_checked_ties_break_newest_first(monkeypatch):
    # VERDICT r7 item 1 has two halves: (a) the q300-q393 cohort the
    # verdict's Done-criterion names is FAST-TRACKED (ascending id)
    # right after the parity core while any of it remains
    # never-checked; (b) among all OTHER equally-stale queries the
    # NEWEST addition (highest numeric qid) drains first, so a
    # freshly-landed operator reaches the driver gate the next round
    # instead of queueing behind older never-checked names.
    names = list(entry_mod.QUERIES)
    monkeypatch.setattr(entry_mod, "_last_round_failures", lambda: [])
    monkeypatch.setattr(entry_mod, "REFRESH_QUEUE", {})
    monkeypatch.setattr(entry_mod, "_last_checked_round", dict)
    order = entry_mod._gate_order(names)
    pinned = [n for n in entry_mod.PINNED_CORE if n in names]
    import re

    lo, hi = entry_mod.FAST_TRACK_RANGE
    tail_ids = [
        int(re.match(r"q(\d+)", n).group(1))
        for n in order[len(pinned):]
    ]
    cohort = [i for i in tail_ids if lo <= i <= hi]
    rest = [i for i in tail_ids if not (lo <= i <= hi)]
    # cohort first, in ascending registration order...
    assert tail_ids[: len(cohort)] == cohort == sorted(cohort)
    # ...then everything else newest-first
    assert tail_ids[len(cohort):] == rest
    assert rest == sorted(rest, reverse=True)


def test_fast_track_self_deactivates(monkeypatch):
    # once every cohort member has a driver row, the fast-track list
    # is empty and the general policy resumes by itself.
    import re

    names = list(entry_mod.QUERIES)
    lo, hi = entry_mod.FAST_TRACK_RANGE

    def qid(n):
        return int(re.match(r"q(\d+)", n).group(1))

    checked = {n: 8 for n in names if lo <= qid(n) <= hi}
    monkeypatch.setattr(entry_mod, "_last_round_failures", lambda: [])
    monkeypatch.setattr(entry_mod, "REFRESH_QUEUE", {})
    monkeypatch.setattr(
        entry_mod, "_last_checked_round", lambda: dict(checked)
    )
    order = entry_mod._gate_order(names)
    pinned = [n for n in entry_mod.PINNED_CORE if n in names]
    head = order[len(pinned): len(pinned) + 10]
    # with the cohort checked, never-checked newest-first leads again
    assert all(qid(n) > hi or qid(n) < lo for n in head)
    hids = [qid(n) for n in head]
    assert hids == sorted(hids, reverse=True)


def test_schedule_advances_between_rounds(monkeypatch):
    # after a round's artifact lands, the window must move on to the
    # next least-recently-checked block (deterministic within a round).
    names = list(entry_mod.QUERIES)
    monkeypatch.setattr(entry_mod, "_last_round_failures", lambda: [])
    checked: dict[str, int] = {}
    monkeypatch.setattr(
        entry_mod, "_last_checked_round", lambda: dict(checked)
    )
    w1 = entry_mod._gate_order(names)
    assert w1 == entry_mod._gate_order(names)
    for name in w1[: entry_mod.GATE_SLOTS]:
        checked[name] = 1
    w2 = entry_mod._gate_order(names)
    assert w1[: entry_mod.GATE_SLOTS] != w2[: entry_mod.GATE_SLOTS]


def test_artifact_round_sort_is_numeric(tmp_path, monkeypatch):
    # ADVICE r5: sorted(glob(...)) puts r100 before r99; the artifact
    # listing must sort by the numeric round.
    import json

    for rnd in (9, 10, 100, 99):
        (tmp_path / f"CORRECTNESS_r{rnd:02d}.json").write_text(
            json.dumps({f"marker_r{rnd}": {"hash_match": True}})
        )
    monkeypatch.setattr(
        entry_mod.os.path, "dirname", lambda _p: str(tmp_path)
    )
    arts = entry_mod._correctness_artifacts()
    assert [r for r, _ in arts] == [9, 10, 99, 100]


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


def test_refresh_entries_slot_after_pinned_when_stale(monkeypatch):
    # VERDICT r9 item 6: entries whose driver row is at or before
    # their per-entry rewrite cutoff consume the (capped) pre-cohort
    # budget right after the pinned core, oldest-cutoff first; the
    # overflow queues directly behind the cohort instead of starving
    # the >= MIN_COHORT_SLOTS mandate.
    names = list(entry_mod.QUERIES)
    monkeypatch.setattr(entry_mod, "_last_round_failures", lambda: [])
    monkeypatch.setattr(
        entry_mod,
        "_last_checked_round",
        lambda: {
            n: cutoff for n, cutoff in entry_mod.REFRESH_QUEUE.items()
        },
    )
    order = entry_mod._gate_order(names)
    pinned = [n for n in entry_mod.PINNED_CORE if n in names]
    np = len(pinned)
    expected = [
        n for n, _ in sorted(
            entry_mod.REFRESH_QUEUE.items(), key=lambda kv: (kv[1], kv[0])
        )
        if n in names
    ]
    budget = max(
        0,
        entry_mod.GATE_SLOTS - np - entry_mod.MIN_COHORT_SLOTS,
    )
    # pre-cohort slice holds the first `budget` entries...
    assert order[np: np + budget] == expected[:budget]
    # ...and every remaining entry still appears before the general
    # LRU tail (i.e. directly after the never-checked cohort).
    import re

    lo, hi = entry_mod.FAST_TRACK_RANGE
    checked = entry_mod._last_checked_round()

    def qid(n):
        m = re.match(r"q(\d+)", n)
        return int(m.group(1)) if m else 0

    cohort_len = len([
        n for n in names
        if n not in entry_mod.PINNED_CORE and n not in expected
        and n not in checked and lo <= qid(n) <= hi
    ])
    overflow = expected[budget:]
    start = np + budget + cohort_len
    assert order[start: start + len(overflow)] == overflow


def test_refresh_self_deactivates_after_post_rewrite_row(monkeypatch):
    # once a driver row NEWER than the rewrite exists the refresh entry
    # leaves the pre-cohort slot for good.
    names = list(entry_mod.QUERIES)
    monkeypatch.setattr(entry_mod, "_last_round_failures", lambda: [])
    monkeypatch.setattr(
        entry_mod,
        "_last_checked_round",
        lambda: {
            n: cutoff + 1
            for n, cutoff in entry_mod.REFRESH_QUEUE.items()
        },
    )
    order = entry_mod._gate_order(names)
    pinned = [n for n in entry_mod.PINNED_CORE if n in names]
    head = order[len(pinned): len(pinned) + len(entry_mod.REFRESH_QUEUE)]
    assert not set(head) & set(entry_mod.REFRESH_QUEUE)


def test_cohort_keeps_min_slots_under_retry_pressure(monkeypatch):
    # ADVICE r8: many retries must not starve the fast-track cohort
    # below MIN_COHORT_SLOTS; the overflow runs AFTER the cohort.
    import re

    names = list(entry_mod.QUERIES)
    lo, hi = entry_mod.FAST_TRACK_RANGE

    def qid(n):
        m = re.match(r"q(\d+)", n)
        return int(m.group(1)) if m else 0

    fake_retries = [
        n for n in sorted(names)
        if n not in entry_mod.PINNED_CORE and qid(n) < lo
    ][:6]
    monkeypatch.setattr(
        entry_mod, "_last_round_failures", lambda: list(fake_retries)
    )
    monkeypatch.setattr(entry_mod, "_last_checked_round", dict)
    window = entry_mod._gate_order(names)[: entry_mod.GATE_SLOTS]
    in_cohort = [n for n in window if lo <= qid(n) <= hi]
    assert len(in_cohort) >= entry_mod.MIN_COHORT_SLOTS
    # every retry still appears in the full order (never dropped)
    order = entry_mod._gate_order(names)
    assert all(r in order for r in fake_retries)


def test_restamp_fastpath_is_disjoint_and_witnessed():
    """VERDICT r13 item 3: the oracle-restamp fast-path. Pins:

    - fast-path names hold NO refresh seat (disjoint from
      REFRESH_QUEUE - the whole point is no gate seat);
    - every fast-path name has an existing driver row (the prior row
      is the Spark-side witness the policy relies on; a never-checked
      name has no witness and may not take the fast-path);
    - every fast-path name is a registered query with an oracle (the
      HEAD sweeps re-prove the restamped oracle each round).
    """
    fp = entry_mod.ORACLE_RESTAMP_FASTPATH
    assert fp, "fast-path list unexpectedly empty"
    assert not set(fp) & set(entry_mod.REFRESH_QUEUE)
    assert not set(fp) & set(entry_mod.PINNED_CORE)
    checked = entry_mod._last_checked_round()
    from web_scraping_etl_pipeline_spark.plans import ORACLE, QUERIES

    for name in fp:
        assert name in checked, f"{name}: no driver row - not eligible"
        assert name in QUERIES and name in ORACLE


def test_restamp_fastpath_bodies_unchanged_since_witness():
    """The mechanical qualification itself (tools/restamp_audit.py):
    each fast-path name's normalized body AST at HEAD equals the one
    at its last-driver-row round commit. Run as a subprocess so a
    broken git state fails loudly rather than skipping."""
    import subprocess

    proc = subprocess.run(
        [sys.executable, "tools/restamp_audit.py"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        check=False,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
