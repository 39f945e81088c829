"""Local mimic of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given sf dir, then compares:

- row count
- column names (sorted)
- values: columns sorted by name, rows sorted, exact equality
  (NaN==NaN, None==None); floats compared exactly because both sides
  are expected to round identically - any mismatch prints the first
  differing rows.

Stricter than a hash: shows *where* a mismatch is.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

from web_scraping_etl_pipeline_spark.plans import ORACLE, QUERIES
from web_scraping_etl_pipeline_spark.schemas import STAR_TABLES
from web_scraping_etl_pipeline_spark.session import get_spark


def duck_connection(sf_dir: str):
    con = duckdb.connect()
    for name in STAR_TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def normalize(value):
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        return value
    return value


def frame_to_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(normalize(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((v is None, str(type(v)), str(v)) for v in t))
    return [cols[i] for i in order], out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or sorted(QUERIES)
    spark = get_spark(app_name="oracle-check")
    con = duck_connection(sf_dir)
    failures = []
    for name in names:
        start = time.time()
        try:
            sdf = QUERIES[name](spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {exc}")
            continue
        if name not in ORACLE:
            print(f"SKIP {name}: no oracle (rows-only) rows={len(srows)}")
            continue
        try:
            res = con.execute(ORACLE[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {exc}")
            continue
        sc, sr = frame_to_rows(scols, srows)
        dc, dr = frame_to_rows(dcols, drows)
        status = "ok"
        if sc != dc:
            status = f"COLUMN MISMATCH spark={sc} duck={dc}"
        elif len(sr) != len(dr):
            status = f"ROWCOUNT MISMATCH spark={len(sr)} duck={len(dr)}"
        elif sr != dr:
            bad = next(
                (i, a, b) for i, (a, b) in enumerate(zip(sr, dr)) if a != b
            )
            status = f"VALUE MISMATCH at sorted-row {bad[0]}:\n  spark={bad[1]}\n  duck ={bad[2]}"
        took = time.time() - start
        tag = "PASS" if status == "ok" else "FAIL"
        if tag == "FAIL":
            failures.append(name)
        print(f"{tag} {name} rows={len(sr)} ({took:.1f}s)" + (
            "" if status == "ok" else f"\n  {status}"
        ))
    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
