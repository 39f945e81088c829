"""Build the EXTREME-NUMERICS degenerate fixture (round 13, the sixth
census layer - VERDICT r12 item 5): the first 32 pinned template rows
of every table with the VALUE-bearing columns replaced by
representation-boundary extremes, keys and join structure left in
contract so every relational shape still executes.

What each class exercises:

- doubles (acctbal/quantity/price/discount/tax/value/retailprice):
  +-0.0, the smallest subnormal (5e-324), the smallest normal
  (2.225e-308), machine epsilon and 1+eps, 0.1 (inexact binary),
  2^53 and 2^53+1 (the integer-precision boundary - 2^53+1 IS 2^53
  as a double), +-1e12 (big-vs-small mixtures whose low bits vanish
  below the running sum's ulp). Targets: guard/NULLIF parity on
  near-zero denominators, ROUND half-even vs half-away at boundary
  magnitudes, float-fold reassociation, int-cast overflow paths.
- int32 (p_size): INT_MIN, INT_MAX, -1, 0 - widening and sign
  handling in size arithmetic.
- bigint (events.user_id - a group/session key with no FK): +-2^63
  boundaries and 2^62ish values - hash/modulo/bucket formulas on
  negative and near-overflow keys (pmod-vs-% class).
- timestamps (ts/l_shipdate/o_orderdate): microsecond edges on BOTH
  sides of the Unix epoch (negative-epoch FLOOR-vs-truncating-div
  class), a leap day, and 1969->2000 so min..max day spines stay
  ~11k rows (day-spine queries generate sequence(min, max)).
- strings (c_name/s_name/p_name/event_type): 2-4 KB ASCII and
  multibyte values - long group/sort keys, NOT documents.text (the
  adversarial-text census owns tokenizer shapes, and pairwise-DP
  verifiers are quadratic in text length).
- embeddings: exact float32 extremes (subnormal 1e-45, f32 epsilon,
  +-4.0 - see the F32 comment for the bigint-exact domain the
  micro-lattice devices require), +-0.0, 0.1 and 1+eps(f32).

    python tools/extreme_fixture.py /tmp/sf_extreme [template] [n]
    python tools/oracle_check.py --json DEGENERATE_SWEEP_EXTREME.json /tmp/sf_extreme
"""

from __future__ import annotations

import glob
import os
import sys

#: double extremes. NOTE 9007199254740993.0 (2^53 + 1) rounds to
#: 2^53 at parse time on every IEEE-754 platform - both engines see
#: the identical double; the BOUNDARY is what matters.
DOUBLES = [
    0.0,
    -0.0,
    5e-324,
    2.2250738585072014e-308,
    2.220446049250313e-16,
    1.0 + 2.220446049250313e-16,
    -1.0,
    0.1,
    9007199254740992.0,
    9007199254740993.0,
    1e12,
    -1e12,
    123456789.123456,
    -5e-324,
]

INTS32 = [2147483647, -2147483648, -1, 0, 1, 2147483646, -2147483647, 42]

BIGINTS = [
    9223372036854775807,
    -9223372036854775808,
    9223372036854775806,
    -9223372036854775807,
    4611686018427387904,
    -4611686018427387904,
    -1,
    0,
    1,
    2862933555777941757,
]

#: microsecond-edge timestamps on both sides of the epoch + a leap
#: day; span kept ~30 years so sequence(min_day, max_day) spines stay
#: bounded (~11.2k rows).
TIMESTAMPS = [
    "1969-06-30 23:59:59.999999",
    "1969-12-31 23:59:59.999999",
    "1970-01-01 00:00:00",
    "1970-01-01 00:00:00.000001",
    "1999-12-31 23:59:59.999999",
    "2000-02-29 12:34:56.789012",
]

#: long group/sort keys: 2-4 KB, ASCII and multibyte.
LONG_STRINGS = [
    "k" * 4096,
    ("Hồ Chí Minh " * 200).strip(),  # ~2.4k chars, multibyte
    "z" * 2048 + " tail",
    ("😀" * 512) + "x",
]

#: ASCII-only variant for part.p_name: q11's clean_title oracle is
#: documented ASCII-domain (DuckDB RE2 has no (?U) - its \w stops at
#: the first non-ASCII word char while the Java/engine side matches
#: Unicode; the engine's Unicode behavior is reference-correct and
#: pinned by the golden tests, so the census must not feed the
#: ORACLE's known blind spot). Length extremes preserved.
LONG_STRINGS_ASCII = [
    "k" * 4096,
    ("data engineering platform " * 96).strip(),
    "z" * 2048 + " tail",
    ("hyphenated-name-segment " * 100).strip(),
]

#: exact float32 values. The magnitude extreme is +-4.0 (~8x the
#: template's unit-scale max): the micro-lattice devices
#: (FLOOR(v * 1e6) AS BIGINT) feed 64-dim squared sums, pair
#: differences (q334: single (y_a - y_b)^2 with |y| <= 64 * qi), and
#: cluster moments (q386-q388: n_c * q_c with q_c <= n_c * 64 *
#: qi^2), so the bigint-exact domain requires
#: n^2 * 64 * qi^2 <= 2^63 -> qi <= ~1.2e7 -> |v| <= ~12 on a
#: 32-row corpus; 4.0 stays inside with margin while the
#: subnormal / epsilon / +-0.0 / 1+eps values stress representation.
F32 = [
    0.0,
    -0.0,
    1e-45,
    -1e-45,
    1.1920928955078125e-07,
    1.0000001192092896,
    4.0,
    -4.0,
    0.1,
    -1.0,
]


def _cycle_sql(values, kind: str, rn: str) -> str:
    """CASE expression cycling ``values`` by pinned row number."""
    arms = []
    for i, v in enumerate(values):
        if kind == "double":
            lit = f"CAST({v!r} AS DOUBLE)"
        elif kind == "int":
            lit = f"CAST({v} AS INTEGER)"
        elif kind == "bigint":
            lit = f"CAST({v} AS BIGINT)"
        elif kind == "ts":
            lit = f"TIMESTAMP '{v}'"
        else:  # pragma: no cover - kinds are closed
            raise ValueError(kind)
        arms.append(f"WHEN {i} THEN {lit}")
    return f"CASE ({rn} % {len(values)}) {' '.join(arms)} END"


#: table -> {column -> (values, kind)}; offsets below de-correlate
#: columns that share a cycle length.
REPLACEMENTS = {
    "customer.parquet": {"c_acctbal": (DOUBLES, "double")},
    "supplier.parquet": {"s_acctbal": (DOUBLES, "double")},
    "part.parquet": {
        "p_size": (INTS32, "int"),
        "p_retailprice": (DOUBLES, "double"),
    },
    "orders.parquet": {
        "o_totalprice": (DOUBLES, "double"),
        "o_orderdate": (TIMESTAMPS, "ts"),
    },
    "lineitem.parquet": {
        "l_quantity": (DOUBLES, "double"),
        "l_extendedprice": (DOUBLES, "double"),
        "l_discount": (DOUBLES, "double"),
        "l_tax": (DOUBLES, "double"),
        "l_shipdate": (TIMESTAMPS, "ts"),
    },
    "events.parquet": {
        "ts": (TIMESTAMPS, "ts"),
        "user_id": (BIGINTS, "bigint"),
        "value": (DOUBLES, "double"),
    },
}

#: per-column offset into the cycle so same-table columns sharing a
#: value list do not move in lockstep (l_discount == l_tax on every
#: row would under-test the formulas).
OFFSETS = {
    "l_extendedprice": 3,
    "l_discount": 5,
    "l_tax": 7,
    "o_totalprice": 2,
    "p_retailprice": 4,
    "value": 6,
    "s_acctbal": 1,
    "o_orderdate": 3,
    "l_shipdate": 1,
}

#: string columns replaced only on a few rows (cycle includes the
#: original via NULL-arm fallthrough handled below): every 4th row
#: gets a long string, the rest keep the template value so
#: cardinality-sensitive shapes still see variety.
STRING_COLS = {
    "customer.parquet": "c_name",
    "supplier.parquet": "s_name",
    "part.parquet": "p_name",
    "events.parquet": "event_type",
}


def build(
    out_dir: str,
    template: str = "/root/testdata/sf0.001",
    n: int = 32,
) -> list[str]:
    import duckdb
    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    written = []
    con = duckdb.connect()
    con.register(
        "longs",
        pd.DataFrame(
            {"i": range(len(LONG_STRINGS)), "s": LONG_STRINGS}
        ),
    )
    con.register(
        "longs_ascii",
        pd.DataFrame(
            {"i": range(len(LONG_STRINGS_ASCII)), "s": LONG_STRINGS_ASCII}
        ),
    )
    for path in sorted(glob.glob(os.path.join(template, "*.parquet"))):
        name = os.path.basename(path)
        order_key = {
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
        }[name]
        base = f"""
        SELECT *, ROW_NUMBER() OVER (ORDER BY {order_key}) - 1 AS _rn
        FROM read_parquet('{path}')
        QUALIFY _rn < {int(n)}
        """
        repl = dict(REPLACEMENTS.get(name, {}))
        scol = STRING_COLS.get(name)
        if name == "embeddings.parquet":
            # exact float32 extremes, per-dimension cycle de-phased by
            # row: dim d of row i reads F32[(i * 7 + d) % |F32|]
            arms = " ".join(
                f"WHEN {i} THEN CAST({v!r} AS FLOAT)"
                for i, v in enumerate(F32)
            )
            sel = f"""
            WITH src AS ({base})
            SELECT src.* EXCLUDE (embedding, _rn),
                   list_transform(
                     range(0, len(embedding)),
                     d -> CASE ((_rn * 7 + d) % {len(F32)}) {arms} END
                   ) AS embedding
            FROM src
            """
            # preserve column order (vec_id, embedding, label)
            sel = f"""
            SELECT vec_id, embedding, label FROM ({sel})
            """
        elif repl or scol:
            exprs = []
            cols = [
                r[0]
                for r in con.execute(
                    f"DESCRIBE SELECT * FROM read_parquet('{path}')"
                ).fetchall()
            ]
            for c in cols:
                if c in repl:
                    vals, kind = repl[c]
                    off = OFFSETS.get(c, 0)
                    exprs.append(
                        f"{_cycle_sql(vals, kind, f'(_rn + {off})')}"
                        f" AS {c}"
                    )
                elif c == scol:
                    table = (
                        "longs_ascii" if name == "part.parquet" else "longs"
                    )
                    exprs.append(
                        f"CASE WHEN _rn % 4 = 0 THEN (SELECT s FROM {table}"
                        f" WHERE i = (_rn // 4) % {len(LONG_STRINGS)})"
                        f" ELSE {c} END AS {c}"
                    )
                else:
                    exprs.append(c)
            sel = f"WITH src AS ({base}) SELECT {', '.join(exprs)} FROM src"
        else:
            sel = f"SELECT * EXCLUDE (_rn) FROM ({base})"
        con.execute(
            f"COPY ({sel}) TO '{os.path.join(out_dir, name)}'"
            " (FORMAT PARQUET)"
        )
        written.append(name)
    con.close()
    return written


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf_extreme"
    tpl = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    print(f"wrote {len(build(out, tpl, n))} tables to {out}")
