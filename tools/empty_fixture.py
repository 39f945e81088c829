"""Build an n-row star-schema fixture directory (every table, correct
schema, LIMIT n rows) - the degenerate inputs for the totality sweeps
(DEGENERATE_SWEEP.json at n=0, DEGENERATE_SWEEP_1ROW.json at n=1):

    python tools/empty_fixture.py /tmp/sf_empty [template_sf_dir] [n]
    python tools/oracle_check.py --json DEGENERATE_SWEEP.json /tmp/sf_empty

The template dir (default /root/testdata/sf0.001) supplies the
schemas; only `LIMIT n` (default 0) of each table is read.
"""

from __future__ import annotations

import glob
import os
import sys


def build(
    out_dir: str,
    template: str = "/root/testdata/sf0.001",
    n: int = 0,
) -> list[str]:
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    written = []
    for path in sorted(glob.glob(os.path.join(template, "*.parquet"))):
        name = os.path.basename(path)
        duckdb.sql(
            f"COPY (SELECT * FROM read_parquet('{path}') LIMIT {int(n)}) "
            f"TO '{os.path.join(out_dir, name)}' (FORMAT PARQUET)"
        )
        written.append(name)
    return written


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf_empty"
    tpl = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    print(f"wrote {len(build(out, tpl, n))} {n}-row tables to {out}")
