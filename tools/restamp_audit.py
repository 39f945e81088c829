"""Mechanical qualification audit for the oracle-restamp fast-path.

Policy (``__spark_entry__.py`` ORACLE_RESTAMP_FASTPATH, VERDICT r13
item 3): an entry may skip the refresh-queue gate seat ONLY if the
query's Spark plan is byte-identical to the one its existing driver
row already verified - i.e. only the ORACLE text moved. This script
re-proves that qualification from git history, no judgment involved:
for every fast-path name it extracts the query function's normalized
body AST (decorators and all docstrings stripped - the body_hash
normalization of tools/invariance_check.py, minus the transitive
helper fold) from the WORKING TREE and from the round commit of the
name's last driver row, and fails loudly on any difference (working
tree, not HEAD: an uncommitted body edit must fail at the edit, not
one commit later - code-review r14).

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

def _plan_module_paths() -> list[str]:
    """Every plans module path, enumerated from the WORKING TREE (so
    a module added later is scanned automatically and a typo'd name
    cannot silently blind the audit - code-review r14)."""
    import glob  # noqa: PLC0415

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return sorted(
        os.path.relpath(p, root)
        for p in glob.glob(
            os.path.join(
                root, "web_scraping_etl_pipeline_spark", "plans", "*.py"
            )
        )
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


def _bodies(rev: str | None, names: set[str]) -> dict[str, str]:
    """name -> normalized ast.dump of the query function at ``rev``
    (a git revision), or in the WORKING TREE when rev is None - the
    audit must judge the code as it IS, not as last committed, so an
    uncommitted Spark-body edit fails at the edit, not one commit
    later (code-review r14)."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out: dict[str, str] = {}
    for path in _plan_module_paths():
        if rev is None:
            with open(os.path.join(root, path)) as fh:
                src = fh.read()
        else:
            proc = subprocess.run(
                ["git", "show", f"{rev}:{path}"],
                capture_output=True,
                text=True,
                check=False,
                cwd=root,
            )
            if proc.returncode != 0:
                continue  # module absent at that revision
            src = proc.stdout
        for node in ast.parse(src).body:
            if isinstance(node, ast.FunctionDef) and node.name in names:
                node.decorator_list = []
                _strip_docstrings(node)
                out[node.name] = ast.dump(node)
    return out


def main() -> int:
    names = set(ORACLE_RESTAMP_FASTPATH)
    checked = _last_checked_round()
    head = _bodies(None, names)  # working tree, not last commit
    failures: list[str] = []
    # group by witness revision: one git-show pass per round commit
    # instead of one per name (code-review r14 - the audit runs
    # inside pytest on every suite run)
    by_rev: dict[str, set[str]] = {}
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
        by_rev.setdefault(rev, set()).add(name)
    for rev, rev_names in sorted(by_rev.items()):
        old = _bodies(rev, rev_names)
        for name in sorted(rev_names):
            rnd = checked[name]
            if name not in head:
                failures.append(f"{name}: not found in the working tree")
            elif name not in old:
                failures.append(
                    f"{name}: not found at {rev} (round {rnd})"
                )
            elif head[name] != old[name]:
                failures.append(
                    f"{name}: body AST CHANGED since its round-{rnd} "
                    f"driver row ({rev}) - this is a semantic rewrite; "
                    "it must hold a REFRESH_QUEUE seat, not the "
                    "fast-path"
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
