"""Result-type lint over every registered oracle (VERDICT r5 item 3).

The driver's correctness gate fetches DuckDB results pandas-style
(`relation.df()`), which converts HUGEINT / unsigned / DECIMAL output
columns to float64 or object. A Spark BIGINT vs DuckDB HUGEINT column
then hash-desyncs (`12` vs `12.0`) even when every value is identical
- the exact failure that kept q230 red in rounds 4-5 and was latent in
q102. This lint binds each oracle in DuckDB (no execution needed: the
output types come from the bound plan) and fails if any oracle emits a
driver-lossy type, so the class cannot recur silently.

Oracles must CAST: window/whole-column SUM over BIGINT -> HUGEINT in
DuckDB, so any cumulative or grand-total integer column needs an
explicit `CAST(... AS BIGINT)` in the final projection.
"""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.oracle_check import BAD_ORACLE_TYPES, lint_result_types

SF_DIR = os.environ.get("SPARK_GRAFT_LINT_SF", "/root/testdata/sf0.001")


@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"testdata {SF_DIR} not present"
)
def test_no_driver_lossy_oracle_output_types():
    hits = lint_result_types(SF_DIR)
    assert hits == {}, (
        "oracles emit DuckDB types the driver's pandas fetch converts "
        f"lossily (cast them, e.g. CAST(col AS BIGINT)): {hits}"
    )


def test_lint_is_not_vacuous():
    """The lint must actually fire on a synthetic HUGEINT column -
    guards against a regex/type-name drift making it silently pass."""
    con = duckdb.connect()
    rel = con.sql("SELECT CAST(1 AS HUGEINT) AS x, SUM(y) OVER () AS s "
                  "FROM (VALUES (CAST(1 AS BIGINT))) t(y)")
    bad = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if str(t).upper().startswith(BAD_ORACLE_TYPES)
    ]
    assert len(bad) == 2, bad
