"""q214 percentile-cutoff exactness adjudication (VERDICT r4 item 2).

The quality-gate cutoff is percentile_cont(0.75) over INTEGER scores.
This is float arithmetic, but provably exact: linear interpolation
(1-f)*a + f*b where f in {0, .25, .5, .75} (2-bit binary fractions),
a,b integers < 2^11 - every product and the sum are exactly
representable doubles, so no engine build can round the cutoff
differently, and the score > cutoff comparison is tie-free. This test
pins that reasoning empirically: the two engines' cutoffs and the
full q214 report are bit-identical, including on a corpus engineered
so the percentile index lands on every fractional position.
"""

from __future__ import annotations

import duckdb

from tests.conftest import SF_DIR
from web_scraping_etl_pipeline_spark.plans import ORACLE, QUERIES


def test_q214_report_exact_on_fixture(spark):
    srows = sorted(
        tuple(r) for r in QUERIES["q214_quality_percentile_gate"](
            spark, SF_DIR
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    drows = sorted(
        tuple(r)
        for r in con.execute(
            ORACLE["q214_quality_percentile_gate"]
        ).fetchall()
    )
    con.close()
    assert srows == drows


def test_interpolated_cutoff_is_exact_for_every_phase(spark):
    # n = 4k+2 makes the 0.75 index land at fraction .75; sweep all
    # four fractional phases via n in {5,6,7,8} over small int scores.
    import pyspark.sql.functions as F

    for n in (5, 6, 7, 8):
        scores = [(i, (i * 37) % 1001) for i in range(n)]
        sdf = spark.createDataFrame(scores, "id long, score long")
        cut_spark = sdf.agg(
            F.percentile(F.col("score").cast("double"), 0.75)
        ).first()[0]
        con = duckdb.connect()
        cut_duck = con.execute(
            "SELECT quantile_cont(CAST(score AS DOUBLE), 0.75) FROM "
            "(SELECT UNNEST(?) AS score)",
            [[s for _, s in scores]],
        ).fetchone()[0]
        con.close()
        assert cut_spark == cut_duck, (n, cut_spark, cut_duck)
