"""Capture .explain('formatted') for named queries into a directory.

Usage: python tools/capture_plans.py OUT_DIR SUFFIX SF_DIR QUERY...
Writes OUT_DIR/<query>_<SUFFIX>.txt for each query.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from web_scraping_etl_pipeline_spark.plans import QUERIES  # noqa: E402
from web_scraping_etl_pipeline_spark.plans.common import (  # noqa: E402
    release_transients,
)
from web_scraping_etl_pipeline_spark.session import get_spark  # noqa: E402


def main() -> int:
    out_dir, suffix, sf_dir = sys.argv[1:4]
    names = sys.argv[4:]
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="capture-plans")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR constructing plan: {exc}"
        finally:
            release_transients()
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)", file=sys.stderr)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
