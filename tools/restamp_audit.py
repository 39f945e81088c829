"""Mechanical qualification audit for the oracle-restamp fast-path.

Policy (``__spark_entry__.py`` ORACLE_RESTAMP_FASTPATH, VERDICT r13
item 3): an entry may skip the refresh-queue gate seat ONLY if the
query's Spark plan is byte-identical to the one its existing driver
row already verified - i.e. only the ORACLE text moved. This script
re-proves that qualification from git history, no judgment involved:
for every fast-path name it extracts the query function's normalized
body AST (decorators and all docstrings stripped - the body_hash
normalization of tools/invariance_check.py, minus the transitive
helper fold) at HEAD and at the round commit of the name's last
driver row, and fails loudly on any difference.

Shared-helper drift is NOT covered here (a function-local AST cannot
see it); it is covered by the HEAD tri-SF sweeps, whose rows pin the
TRANSITIVE body_hash and fail tests/test_correctness_artifacts.py on
any staleness.

Run: python tools/restamp_audit.py   (exit 0 = all qualified)
"""

from __future__ import annotations

import ast
import os
import subprocess
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from __spark_entry__ import (  # noqa: E402
    ORACLE_RESTAMP_FASTPATH,
    _last_checked_round,
)

#: round -> the "round N: verdict/advice/correctness/bench" commit the
#: driver stamped at that round's close; a query's round-N driver row
#: was computed from this tree.
ROUND_COMMITS = {
    8: "8a6f3a2",
    9: "c52481f",
    10: "f4d5b5a",
    11: "0667198",
    12: "f990a53",
    13: "ba28d54",
}

PLAN_MODULES = (
    "stattests", "analytics", "inference", "temporal", "relational",
    "datapipe", "textops", "vectors", "mlprep", "dedup", "core",
    "common", "graphs",
)


def _strip_docstrings(node: ast.AST) -> None:
    for n in ast.walk(node):
        if isinstance(
            n, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
        ) and (
            n.body
            and isinstance(n.body[0], ast.Expr)
            and isinstance(n.body[0].value, ast.Constant)
            and isinstance(n.body[0].value.value, str)
        ):
            n.body = n.body[1:]


def _bodies(rev: str, names: set[str]) -> dict[str, str]:
    """name -> normalized ast.dump of the query function at ``rev``,
    scanning every plans module that exists at that revision."""
    out: dict[str, str] = {}
    for mod in PLAN_MODULES:
        path = f"web_scraping_etl_pipeline_spark/plans/{mod}.py"
        proc = subprocess.run(
            ["git", "show", f"{rev}:{path}"],
            capture_output=True,
            text=True,
            check=False,
        )
        if proc.returncode != 0:
            continue  # module absent at that revision
        for node in ast.parse(proc.stdout).body:
            if isinstance(node, ast.FunctionDef) and node.name in names:
                node.decorator_list = []
                _strip_docstrings(node)
                out[node.name] = ast.dump(node)
    return out


def main() -> int:
    names = set(ORACLE_RESTAMP_FASTPATH)
    checked = _last_checked_round()
    head = _bodies("HEAD", names)
    failures: list[str] = []
    for name in sorted(names):
        rnd = checked.get(name)
        if rnd is None:
            failures.append(
                f"{name}: NO driver row exists - a never-checked query "
                "has no prior witness and cannot take the fast-path"
            )
            continue
        rev = ROUND_COMMITS.get(rnd)
        if rev is None:
            failures.append(
                f"{name}: last driver row is round {rnd}, not in "
                "ROUND_COMMITS - add the round commit"
            )
            continue
        old = _bodies(rev, {name})
        if name not in head:
            failures.append(f"{name}: not found at HEAD")
        elif name not in old:
            failures.append(f"{name}: not found at {rev} (round {rnd})")
        elif head[name] != old[name]:
            failures.append(
                f"{name}: body AST CHANGED since its round-{rnd} driver "
                f"row ({rev}) - this is a semantic rewrite; it must hold "
                "a REFRESH_QUEUE seat, not the fast-path"
            )
    if failures:
        print("RESTAMP FAST-PATH AUDIT: FAIL")
        for f in failures:
            print(" -", f)
        return 1
    print(
        f"RESTAMP FAST-PATH AUDIT: ok - {len(names)} entries, every "
        "body AST identical to its last-driver-row round commit"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
