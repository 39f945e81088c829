"""Degenerate-input guard pins (VERDICT r10 item 3).

The failure class: an unguarded integer division whose denominator is
only nonzero on realistic corpora. On a degenerate input (<=1
document) Spark's ``DIV`` yields NULL while DuckDB's ``//`` raises -
the twins silently diverge exactly where no driver fixture can reach.
Round 10 closed the two known instances (q440 ``expected_milli`` now
guarded by ``n_docs > 1`` on BOTH engines; q421's coverage guard is
literally the oracle's ``> 0`` predicate). This suite pins the CLASS:
both queries must produce IDENTICAL, error-free results on 0-doc and
1-doc corpora on both engines.

Comparison goes through the same pandas fetch + normalization the
driver gate uses (``tools.oracle_check``), so a NULL-vs-error or a
type-level divergence fails loudly here instead of waiting for a
hostile fixture.
"""

from __future__ import annotations

import duckdb
import pytest

from tools.oracle_check import frame_to_rows, pandas_rows
from web_scraping_etl_pipeline_spark.plans import ORACLE, QUERIES
from web_scraping_etl_pipeline_spark.plans.common import release_transients

#: the two queries VERDICT r10 item 3 names, plus every column that
#: must be NULL (guarded) rather than an error on a <=1-doc corpus.
GUARDED = {
    "q440_neardup_split_leakage": ["leak_milli", "expected_milli"],
    "q421_dedup_capture_recapture": ["union_coverage_milli"],
}


@pytest.fixture(params=[0, 1], ids=["zero-docs", "one-doc"])
def tiny_corpus(request, tmp_path):
    """documents.parquet with 0 or 1 rows - below every denominator
    (n_pairs, n_docs*(n_docs-1), chapman overlap) in the guarded
    expressions."""
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
        "source VARCHAR, n_chars BIGINT)"
    )
    if request.param == 1:
        text = "a single document about distributed query engines"
        con.execute(
            "INSERT INTO d VALUES (9, ?, 'en', 'web', ?)", [text, len(text)]
        )
    con.execute(f"COPY d TO '{tmp_path}/documents.parquet' (FORMAT PARQUET)")
    con.close()
    yield str(tmp_path)
    release_transients()


@pytest.mark.parametrize("name", sorted(GUARDED))
def test_guarded_division_agrees_on_degenerate_corpus(
    spark, tiny_corpus, name
):
    spdf = QUERIES[name](spark, tiny_corpus).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tiny_corpus}/documents.parquet')"
    )
    dpdf = con.execute(ORACLE[name]).df()  # must NOT raise
    con.close()
    sc, sr = frame_to_rows(list(spdf.columns), pandas_rows(spdf))
    dc, dr = frame_to_rows(list(dpdf.columns), pandas_rows(dpdf))
    assert sc == dc
    assert sr == dr
    # and the guard actually fired: the ratio columns are NULL, not 0
    # and not an exception, on both engines identically.
    assert len(sr) == 1
    row = dict(zip(sc, sr[0]))
    # NULL surfaces as None, or as normalized "NaN" when pandas
    # float64-izes a nullable BIGINT column (the r04/q230 class the
    # driver-faithful fetch path exists to expose) - both mean SQL
    # NULL here; anything else means the guard silently vanished.
    for col in GUARDED[name]:
        assert row[col] in (None, "NaN"), (col, row)
