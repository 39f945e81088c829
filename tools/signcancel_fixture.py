"""Build the SIGN-CANCELLATION degenerate fixture (round 14, the
NINTH census layer - the builder-shortlist "mixed-sign" corpus):
the first 32 pinned template rows of every table with every numeric
MEASURE column overwritten by an alternating +-M pattern (same exact
magnitude, sign by row parity), keys / timestamps / categoricals /
strings left in contract.

What this reaches that no earlier layer does: **aggregates that are
EXACTLY ZERO from nonzero inputs**. The const census produced zero
VARIANCE with a nonzero mean; the extreme census produced boundary
magnitudes; the empty census produced no rows at all. Here every
even-cardinality group has SUM(x) == 0 and AVG(x) == 0 while n > 0
and variance > 0 - the refunds-cancel-sales corpus a revenue
pipeline genuinely sees (returns, chargebacks, corrections are
negative measures over the SAME keys). Division guards written for
"empty or all-zero" denominators (NULLIF on counts, on variances)
do not fire here: the hot paths are

- shares x / SUM(x) with a zero total (market share over netted
  revenue),
- coefficient-of-variation / mean-normalizations (sd / AVG with
  AVG == 0, the mirror of the const census's sd == 0),
- LN / SQRT / power of a zero or NEGATIVE aggregate (log-revenue,
  geometric-mean pipelines),
- weighted means whose WEIGHT sums cancel (zero total weight from
  nonzero weights),
- sign-sensitive folds (ABS-before-vs-after-sum, truncate-vs-floor
  on a negative running sum - the r13 fdiv class at the AGGREGATE
  level).

The magnitude is one exact INTEGER-VALUED double (2.0) so every
partial sum is IEEE-exact and cancellation is bit-perfect regardless
of aggregation order - a zero that depends on fold order would make
the corpus itself flaky - AND casts to integer types agree across
engines. 2.5 was tried and rejected: CAST(2.5 AS BIGINT) ROUNDS in
DuckDB but TRUNCATES in Spark (the adjudicated q387 class), which
would bury the cancellation signal under unrelated per-value
definitional divergences that the extreme-numerics layer owns.
p_size (int32) uses +-4, everything else +-2.0.

Sign placement is BY ROW PARITY of the pinned row number, so the
32-row global sum of every overwritten column is exactly 0, and any
even-balanced group nets to 0; odd groups keep a +-M residue
(both cases are wanted - the residue exercises the negative-sum
paths, the balance the zero-sum paths).

    python tools/signcancel_fixture.py /tmp/sf_signcancel [template] [n]
    python tools/oracle_check.py --json DEGENERATE_SWEEP_SIGNCANCEL.json /tmp/sf_signcancel
"""

from __future__ import annotations

import glob
import os
import sys

#: exact magnitude for double/decimal measures (binary-exact, and an
#: integer VALUE so DuckDB's rounding cast and Spark's truncating
#: cast agree - see the module docstring).
M = "2.0"
#: exact magnitude for integer measures.
MI = "4"

#: table -> measure columns to overwrite with the +-M pattern.
#: Keys, timestamps, strings, categoricals, embeddings and derived
#: text stats stay in contract (documents/embeddings keep their
#: template values entirely - the text/vector families own their own
#: degenerate layers; n_chars must stay == length(text)).
MEASURES: dict[str, dict[str, str]] = {
    "customer.parquet": {"c_acctbal": M},
    "events.parquet": {"value": M},
    "lineitem.parquet": {
        "l_quantity": M,
        "l_extendedprice": M,
        "l_discount": M,
        "l_tax": M,
    },
    "orders.parquet": {"o_totalprice": M},
    "part.parquet": {"p_retailprice": M, "p_size": MI},
    "supplier.parquet": {"s_acctbal": M},
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
        meas = MEASURES.get(name, {})
        described = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{path}')"
        ).fetchall()
        exprs = []
        for c, ctype, *_ in described:
            if c in meas:
                mag = meas[c]
                # type-preserving overwrite: cast the +-M literal
                # back to the column's declared type (from DESCRIBE)
                # so parquet schemas - and therefore Spark/DuckDB
                # type derivations - match the real corpus exactly
                exprs.append(
                    f"CAST(CASE WHEN _rn % 2 = 0 THEN {mag}"
                    f" ELSE -{mag} END AS {ctype}) AS {c}"
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
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf_signcancel"
    tpl = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    print(f"wrote {len(build(out, tpl, n))} tables to {out}")
