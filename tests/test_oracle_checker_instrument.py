"""Hardening pins for the correctness INSTRUMENT itself
(tools/oracle_check.py) - VERDICT r7 item 3: a bug here silently
invalidates every green row in CORRECTNESS_*.json, so the extraction
path and the oracle-parameterization discipline get their own tests.
"""

from __future__ import annotations

import re
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

from tools.oracle_check import (  # noqa: E402
    frame_to_rows,
    normalize,
    pandas_rows,
)


def test_pandas_rows_unboxes_numpy_scalars():
    pdf = pd.DataFrame({"a": np.array([1, 2], dtype=np.int64)})
    rows = pandas_rows(pdf)
    assert rows == [(1,), (2,)]
    assert all(type(v) is int for (v,) in rows)


def test_pandas_rows_survives_arraytype_columns():
    # An ArrayType result column surfaces as np.ndarray cells after
    # toPandas(); .item() on those raises ValueError - the checker
    # must convert via .tolist() instead of crashing (ADVICE r6 /
    # VERDICT r7 item 3).
    pdf = pd.DataFrame(
        {
            "vec": [
                np.array([1.0, 2.0], dtype=np.float64),
                np.array([3.0], dtype=np.float64),
            ],
            "n": np.array([10, 20], dtype=np.int64),
        }
    )
    rows = pandas_rows(pdf)
    assert rows == [([1.0, 2.0], 10), ([3.0], 20)]
    assert all(type(r[0]) is list for r in rows)


def test_arraytype_roundtrip_spark_vs_duck_shape():
    # Throwaway ArrayType round-trip at the comparison layer: a DuckDB
    # LIST column (object cells of np.ndarray/list) and a Spark
    # ArrayType column (object cells of list) must normalize to EQUAL
    # rows when the values match.
    import duckdb

    dpdf = duckdb.sql(
        "SELECT * FROM (VALUES ([1, 2], 'a'), ([3], 'b')) t(vec, k)"
    ).df()
    spark_like = pd.DataFrame(
        {"vec": [[1, 2], [3]], "k": ["a", "b"]}
    )
    dc, dr = frame_to_rows(list(dpdf.columns), pandas_rows(dpdf))
    sc, sr = frame_to_rows(
        list(spark_like.columns), pandas_rows(spark_like)
    )
    assert dc == sc
    assert dr == sr


def test_normalize_folds_negative_zero_and_temporals():
    import datetime

    assert normalize(-0.0) == 0.0
    assert str(normalize(-0.0)) == "0.0"
    assert normalize(datetime.date(2024, 1, 2)) == "2024-01-02T00:00:00"
    assert normalize(None) is None
    assert normalize(float("nan")) == "NaN"


def test_no_hardcoded_query_vector_ids_in_oracles():
    # VERDICT r7 item 3b: every oracle that pins the query vector must
    # interpolate {QUERY_VEC_ID}; a literal `vec_id = 0` in SOURCE
    # silently desyncs from the Spark side if QUERY_VEC_ID changes.
    import glob

    offenders = []
    for path in glob.glob(
        "/root/repo/web_scraping_etl_pipeline_spark/plans/*.py"
    ):
        src = open(path).read()
        for m in re.finditer(r"vec_id\s*=\s*(\d+)", src):
            offenders.append((path, m.group(0)))
    assert offenders == [], offenders
