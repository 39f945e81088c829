"""Build a 0-row star-schema fixture directory (every table, correct
schema, zero rows) - the degenerate input for the empty-corpus
totality sweep (DEGENERATE_SWEEP.json):

    python tools/empty_fixture.py /tmp/sf_empty [template_sf_dir]
    python tools/oracle_check.py --json DEGENERATE_SWEEP.json /tmp/sf_empty

The template dir (default /root/testdata/sf0.001) supplies the
schemas; only `LIMIT 0` of each table is read.
"""

from __future__ import annotations

import glob
import os
import sys


def build(out_dir: str, template: str = "/root/testdata/sf0.001") -> list[str]:
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    written = []
    for path in sorted(glob.glob(os.path.join(template, "*.parquet"))):
        name = os.path.basename(path)
        duckdb.sql(
            f"COPY (SELECT * FROM read_parquet('{path}') LIMIT 0) "
            f"TO '{os.path.join(out_dir, name)}' (FORMAT PARQUET)"
        )
        written.append(name)
    return written


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf_empty"
    tpl = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    print(f"wrote {len(build(out, tpl))} empty tables to {out}")
