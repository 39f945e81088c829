"""Pin the 436/436 independent-reference invariant (round 10).

Every registered query must be exercised by at least one
``tests/test_reference_math*.py`` file - the from-scratch replay
suite that is independent of the DuckDB oracle twins (the q430
James-Stein catch is why: both engines can share a wrong formula).
A future round that registers a new query without also adding an
independent reference fails here, the same way SKIPPED.json pins
registry id gaps.

The scan counts QUOTED registered-name usages only - ``"qNNN_`` /
``'qNNN_`` as they appear at real call sites (``_q(spark,
"q123_foo")``, ``QUERIES["q123_foo"]``) - so a comment or docstring
cross-reference (bare ``q79`` prose) can no longer satisfy the
ledger vacuously (ADVICE r10 items 1-2; the old scan accepted any
textual qNNN token and capped ids at three digits). The per-query
tests themselves enforce that the mention is a real assertion, and
the non-vacuity check below keeps the scan honest.
"""

from __future__ import annotations

import glob
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _referenced_ids() -> set[int]:
    ids: set[int] = set()
    for path in glob.glob(
        os.path.join(REPO, "tests", "test_reference_math*.py")
    ):
        with open(path, encoding="utf-8") as fh:
            # quoted-name call sites only; \d+ (not \d{1,3}) so a
            # future q1000 is not silently counted as q100
            for m in re.finditer(r"""["']q(\d+)_""", fh.read()):
                ids.add(int(m.group(1)))
    return ids


def _env_gated_ids() -> set[int]:
    """Ids whose registration depends on the environment (SKIPPED.json
    rows with an env_condition, e.g. q249 behind google.protobuf):
    exempt from the ledger so a richer environment that auto-registers
    them does not fail coverage retroactively."""
    with open(os.path.join(REPO, "SKIPPED.json"), encoding="utf-8") as fh:
        import json

        ledger = json.load(fh)
    return {
        int(k[1:])
        for k, v in ledger.items()
        if k.startswith("q") and isinstance(v, dict)
        and v.get("env_condition")
    }


def test_every_registered_query_has_an_independent_reference():
    import sys

    sys.path.insert(0, REPO)
    from web_scraping_etl_pipeline_spark.plans import QUERIES

    covered = _referenced_ids() | _env_gated_ids()
    missing = sorted(
        name
        for name in QUERIES
        if int(re.match(r"q(\d+)", name).group(1)) not in covered
    )
    assert missing == [], (
        f"{len(missing)} registered queries have no independent "
        f"reference in tests/test_reference_math*.py: {missing[:10]} - "
        "add a from-scratch replay batch before registering"
    )


def test_reference_scan_is_not_vacuous():
    """The textual scan must actually be reading the batch files: a
    glob/regex regression that returns nothing would make the ledger
    pass trivially."""
    ids = _referenced_ids()
    assert len(ids) >= 400
    # spot anchors across the families: parity core, stats, streaming,
    # media, protocol
    for anchor in (1, 430, 212, 159, 277):
        assert anchor in ids
