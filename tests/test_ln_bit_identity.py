"""Pin the cross-engine LN assumption behind the FLOAT_LINT_ALLOW
LN family (q337/q339/q374/q375/q389 - ADVICE r7, low).

Those oracles adjudicate ``FLOOR(LN(exact-integer ratio) * scale)`` as
safe because Spark's ``java.lang.Math.log`` and DuckDB's libm ``log``
produce the same double for the same input in practice - but neither
is GUARANTEED correctly rounded, so the dual-SF pass is an
environment observation, not a by-construction property. This test
turns that observation into a tested invariant: it sweeps a dense
rational family covering the queries' realistic argument domain
(count ratios p/q) at both floor scales in use, and compares a
POSITION-WEIGHTED bigint checksum of the floored values between the
two engines (weighting catches compensating +1/-1 flips a plain sum
would cancel). A platform/libm change that breaks the assumption
fails HERE, in isolation, pointing straight at the mitigation
(switch the log-weight quantization to the q319
rational-approximation device) instead of surfacing as a mystifying
oracle hash flake.
"""

from __future__ import annotations

import duckdb

N = 300  # p, q in 1..N -> 90k ratios spanning [1/300, 300]
SCALES = (1_000_000, 500_000)  # micro (q337/q374/q375/q389), half-micro (q339)


def _checksum_exprs() -> list[str]:
    # identical SQL text runs on both engines: floor(ln(p/q)*scale)
    # weighted by a position hash (p*N+q mod 9973) - exact bigint.
    return [
        f"SUM(CAST(FLOOR(LN(CAST(p AS DOUBLE) / q) * {s}.0) AS BIGINT)"
        f" * ((p * {N} + q) % 9973)) AS c{s}"
        for s in SCALES
    ]


def test_floored_ln_bit_identity_spark_vs_duckdb(spark):
    sdf = spark.range(1, N + 1).selectExpr("id AS p").crossJoin(
        spark.range(1, N + 1).selectExpr("id AS q")
    )
    srow = sdf.selectExpr(*_checksum_exprs()).first()

    con = duckdb.connect()
    drow = con.execute(
        f"""
        WITH g AS (
          SELECT p.range AS p, q.range AS q
          FROM range(1, {N + 1}) p, range(1, {N + 1}) q
        )
        SELECT {", ".join(_checksum_exprs())} FROM g
        """
    ).fetchone()

    for i, s in enumerate(SCALES):
        assert int(srow[f"c{s}"]) == int(drow[i]), (
            f"floored LN diverged between engines at scale {s}: "
            "the FLOAT_LINT_ALLOW LN family's platform assumption is "
            "void here - switch those oracles to the q319 rational-"
            "approximation device"
        )
