from __future__ import annotations

import pytest

from web_scraping_etl_pipeline_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="wsep-tests", master="local[4]", shuffle_partitions=4)
    yield spark
    spark.stop()


SF_DIR = "/root/testdata/sf0.001"
SF_DIR_T2 = "/root/testdata/sf0.01"

# ---------------------------------------------------------------------------
# shared sweep-artifact helpers (code-review r13: three ledger test
# files carried verbatim copies of these; the rows-only special case
# in artifact_green is subtle enough that divergent copies would
# silently apply different green criteria to the same artifacts)
# ---------------------------------------------------------------------------

import json as _json  # noqa: E402
import os as _os  # noqa: E402

REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))


def load_artifact(name_or_path: str) -> dict:
    """Parse a repo-root sweep artifact (absolute paths pass through)."""
    path = (
        name_or_path
        if _os.path.isabs(name_or_path)
        else _os.path.join(REPO_ROOT, name_or_path)
    )
    with open(path) as fh:
        return _json.load(fh)


def env_gated_names() -> set[str]:
    """Registrations gated on an environment condition (SKIPPED.json):
    excluded from every coverage assertion."""
    with open(_os.path.join(REPO_ROOT, "SKIPPED.json")) as fh:
        return {
            v.get("name")
            for v in _json.load(fh).values()
            if isinstance(v, dict) and v.get("env_condition")
        }


def artifact_green(rec: dict) -> bool:
    """One green criterion for every sweep artifact row. Rows-only
    queries (no SQL-expressible oracle) count green on rows_match
    alone; everything else needs rows + schema + values and no
    error."""
    err = rec.get("err")
    if err and "rows-only" in str(err):
        return rec.get("rows_match") is True
    return bool(
        rec.get("rows_match")
        and rec.get("schema_match")
        and rec.get("values_match")
        and not err
    )
