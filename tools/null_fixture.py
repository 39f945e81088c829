"""Build the PARTIAL-RECORDS degenerate fixture (round 13, the seventh
census layer): the first 32 pinned template rows of every table with
NULLs cycled through the OPTIONAL columns - the "scraper emitted an
incomplete record" corpus, which is squarely in an ETL engine's
contract (the reference's own C6 semantics map a sentinel salary to
NULL; a failed extraction yields a NULL text / value / label the
pipeline must survive, not crash on).

Scope - what may be NULL and what may not:

- NULLABLE: free-text and content columns (documents.text + its
  DERIVED n_chars - the contract ties them, so NULL text => NULL
  n_chars), categorical dimensions (lang, source, event_type, props,
  c_mktsegment, o_orderpriority, l_returnflag, l_linestatus, p_brand,
  p_type, names), numeric measures (events.value, acctbals,
  quantities, prices, discounts, taxes, p_size), embeddings.label
  (weak labels go missing in the wild).
- NEVER NULL: every key / join column (a keyless record is
  garbage-in, rejected upstream), timestamps (a scraped record always
  carries its scrape time; NULL event time would also make the
  streaming-vs-batch comparison definitionally divergent - the
  extreme layer already owns the watermark class), and
  embeddings.embedding (a NULL vector is not a vector; the vector
  family's contract is row-per-embedding).

Null placement is deterministic: column c of row r is NULL when
(r + OFFSET[c]) % every == 0. At the default every=3, ~1/3 of each
optional column is NULL, NULL rows differ per column (a row keeps
SOME fields - partial, not empty), and every table retains non-null
rows for every column.

every=1 is the EIGHTH census layer (round 14, the totality endpoint
of the partial-records ramp): EVERY optional value NULL while every
key/timestamp survives. This is the corpus the other layers cannot
reach - the 0-row census has no groups at all and the 1/3-NULL
census leaves every aggregate some values, but here every GROUP
EXISTS (keys are real) while every measure aggregated over it is an
all-NULL column: SUM/AVG/MIN/MAX return NULL per group (not zero,
not absent), COUNT(col) is 0 with COUNT(*) = n, listwise deletion
drops every record while the frames stay non-empty, and those NULL
aggregates then flow into downstream joins / windows / sorts /
divisions. Known cross-engine traps live exactly here (string_agg
all-NULL -> NULL vs array_join -> ''; pandas .sum() over all-NaN ->
0.0 vs SQL SUM -> NULL).

    python tools/null_fixture.py /tmp/sf_null [template] [n]
    python tools/null_fixture.py /tmp/sf_allnull [template] [n] 1
    python tools/oracle_check.py --json DEGENERATE_SWEEP_NULL.json /tmp/sf_null
    python tools/oracle_check.py --json DEGENERATE_SWEEP_ALLNULL.json /tmp/sf_allnull
"""

from __future__ import annotations

import glob
import os
import sys

#: table -> optional (nullable) columns, in schema order. Keys,
#: timestamps and the embedding vector are deliberately absent.
OPTIONAL = {
    "customer.parquet": ["c_name", "c_acctbal", "c_mktsegment"],
    "documents.parquet": ["text", "lang", "source"],
    "embeddings.parquet": ["label"],
    "events.parquet": ["event_type", "value", "props"],
    "lineitem.parquet": [
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus",
    ],
    "nation.parquet": [],  # n_name is a graph node identity (a key)
    "orders.parquet": ["o_orderstatus", "o_totalprice", "o_orderpriority"],
    "part.parquet": ["p_name", "p_brand", "p_type", "p_size",
                     "p_retailprice"],
    "region.parquet": [],  # r_name keys region filters
    "supplier.parquet": ["s_name", "s_acctbal"],
}

ORDER_KEY = {
    "documents.parquet": "doc_id",
    "embeddings.parquet": "vec_id",
    "events.parquet": "event_id",
    "orders.parquet": "o_orderkey",
    "customer.parquet": "c_custkey",
    "supplier.parquet": "s_suppkey",
    "part.parquet": "p_partkey",
    "nation.parquet": "n_nationkey",
    "region.parquet": "r_regionkey",
    "lineitem.parquet": "l_orderkey, l_linenumber",
}


def build(
    out_dir: str,
    template: str = "/root/testdata/sf0.001",
    n: int = 32,
    every: int = 3,
) -> list[str]:
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    written = []
    con = duckdb.connect()
    for path in sorted(glob.glob(os.path.join(template, "*.parquet"))):
        name = os.path.basename(path)
        base = f"""
        SELECT *, ROW_NUMBER() OVER (ORDER BY {ORDER_KEY[name]}) - 1 AS _rn
        FROM read_parquet('{path}')
        QUALIFY _rn < {int(n)}
        """
        opt = OPTIONAL.get(name, [])
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{path}')"
            ).fetchall()
        ]
        exprs = []
        for c in cols:
            if name == "documents.parquet" and c == "n_chars":
                # derived: the n_chars = length(text) contract holds
                # through the nulling (text's offset is its index in
                # OPTIONAL, i.e. 0)
                exprs.append(
                    f"CASE WHEN (_rn + 0) % {int(every)} = 0 THEN NULL"
                    " ELSE n_chars END AS n_chars"
                )
            elif c in opt:
                off = opt.index(c)
                exprs.append(
                    f"CASE WHEN (_rn + {off}) % {int(every)} = 0 THEN"
                    f" NULL ELSE {c} END AS {c}"
                )
            else:
                exprs.append(c)
        sel = f"WITH src AS ({base}) SELECT {', '.join(exprs)} FROM src"
        con.execute(
            f"COPY ({sel}) TO '{os.path.join(out_dir, name)}'"
            " (FORMAT PARQUET)"
        )
        written.append(name)
    con.close()
    return written


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf_null"
    tpl = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    every = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    print(f"wrote {len(build(out, tpl, n, every))} tables to {out}")
