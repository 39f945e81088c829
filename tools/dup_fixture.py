"""Build the ALL-DUPLICATES degenerate fixtures (round 12, VERDICT r11
item 4) - the census layer the 0-row and 1-row corpora cannot reach:

- mode ``dup``: every table is its template's FIRST ROW replicated n
  times, byte-identical. Stresses the paths where EVERY pair is a
  dedup candidate (LSH bucket fan-out and its cap, pair joins,
  component collapse), key-join fan-out (n x n), and ROUND/ordering
  ties from identical values.
- mode ``const``: the template's first n rows with every NON-KEY
  column overwritten by the first row's value (key-ish columns -
  ``*key``/``*id``/``l_linenumber`` - keep their real values).
  Stresses zero-variance-with-n>1 statistics (the 1-row census only
  reached n<=1 degenerate moments) and identical-value ties under
  DISTINCT keys, without the join fan-out masking them.

    python tools/dup_fixture.py dup   /tmp/sf_dup   [template] [n]
    python tools/dup_fixture.py const /tmp/sf_const [template] [n]
    python tools/oracle_check.py --json DEGENERATE_SWEEP_DUP.json /tmp/sf_dup
"""

from __future__ import annotations

import glob
import os
import re
import sys

#: replication depth: large enough that pair fan-out (n*(n-1)/2 = 496
#: candidate pairs from one 32-member bucket) and zero-variance
#: moments with real df are exercised, small enough that the n x n
#: key-join fan-out (32x32 per key) keeps the full census fast.
DEFAULT_N = 32

_KEYISH = re.compile(r"(key|id|linenumber)$", re.IGNORECASE)


def build(
    out_dir: str,
    mode: str = "dup",
    template: str = "/root/testdata/sf0.001",
    n: int = DEFAULT_N,
) -> list[str]:
    import duckdb

    if mode not in ("dup", "const"):
        raise ValueError(f"mode must be dup|const, got {mode!r}")
    os.makedirs(out_dir, exist_ok=True)
    written = []
    con = duckdb.connect()
    for path in sorted(glob.glob(os.path.join(template, "*.parquet"))):
        name = os.path.basename(path)
        if mode == "dup":
            # ORDER BY ALL pins the seed row (bare LIMIT is scan-order
            # dependent; a rebuilt fixture must reproduce the committed
            # census - code-review r12)
            sel = (
                f"SELECT t.* FROM (SELECT * FROM read_parquet('{path}') "
                f"ORDER BY ALL LIMIT 1) t, range({int(n)})"
            )
        else:
            cols = [
                r[0]
                for r in con.execute(
                    f"DESCRIBE SELECT * FROM read_parquet('{path}')"
                ).fetchall()
            ]
            exprs = ", ".join(
                f'"{c}"'
                if _KEYISH.search(c)
                else (
                    f'(SELECT "{c}" FROM (SELECT * FROM '
                    f"read_parquet('{path}') ORDER BY ALL LIMIT 1))"
                    f' AS "{c}"'
                )
                for c in cols
            )
            sel = (
                f"SELECT {exprs} FROM read_parquet('{path}') "
                f"ORDER BY ALL LIMIT {int(n)}"
            )
        con.execute(
            f"COPY ({sel}) TO '{os.path.join(out_dir, name)}'"
            " (FORMAT PARQUET)"
        )
        written.append(name)
    con.close()
    return written


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "dup"
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/sf_{mode}"
    tpl = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.001"
    n = int(sys.argv[4]) if len(sys.argv) > 4 else DEFAULT_N
    print(
        f"wrote {len(build(out, mode, tpl, n))} {mode}({n}) tables to {out}"
    )
