"""Extreme-numerics census pins (round 13, the SIXTH degenerate
layer - VERDICT r12 item 5): DEGENERATE_SWEEP_EXTREME.json sweeps all
436 queries over /tmp/sf_extreme (tools/extreme_fixture.py -
representation-boundary doubles, INT32/INT64 boundaries, microsecond
epoch-edge timestamps on BOTH sides of 1970, 2-4 KB group keys, exact
float32 extremes; keys and join structure in contract).

The layer found and FIXED five real defect classes before this ledger
was written:

- the day/week-bucket floor-vs-truncate divergence (DuckDB ``//``
  truncates toward zero, the Spark twins floor): 34 oracles moved to
  common.fdiv_sql, ~20 red rows -> green;
- q88's under-specified version window (two SCD2 runs CAN tie on
  valid_from_us at equal microseconds - version assignment was
  engine-dependent);
- q164's unguarded price division (ANSI DIVIDE_BY_ZERO vs IEEE inf);
- q276's lateral unit fan-out LINEAR in an unbounded column (INT
  overflow at 9e15, and the only non-scale-safe shape in the query) -
  units now ride the winsorized value, bounding every lateral at <= 4
  rows;
- two fixture-domain scopes (embeddings |v| <= 4 for the bigint-exact
  micro-lattice algebra; ASCII p_name for q11's documented RE2-domain
  oracle).

What remains red is FOUR adjudicated classes, each definitional on
representation-boundary input, none a wrong answer on in-contract
data (all 28 names are green at sf0.001/sf0.01/sf0.1 and on the other
five degenerate corpora).
"""

from __future__ import annotations

import glob
import os

import pytest

from tests.conftest import (
    REPO_ROOT as REPO,
    artifact_green as _green,
    env_gated_names as _env_gated,
    load_artifact as _load,
)

EXTREME = os.path.join(REPO, "DEGENERATE_SWEEP_EXTREME.json")

#: IEEE double folds at catastrophic magnitudes: SUM / AVG /
#: percentile-interpolation / regression moments over mixtures of
#: 2^53-boundary and epsilon-scale values differ between the engines'
#: summation ORDERS by ~1-2 ulp of the running sum (verified per row:
#: every diff is a final-digit wobble at 1e14..1e16 magnitudes, e.g.
#: q14 1801439850948198.2 vs .5, q21 ...991 vs ...990, q109's exactly
#: 1-ulp percentile midpoint). Both engines are IEEE-correct for SOME
#: fold order; no associativity-free formulation exists short of
#: decimal-izing every hot double path. q177 amplifies the same class
#: through share normalization (sum of +-1e24 edge weights feeds a
#: division). In contract the repo-wide posture is the order-fold
#: lint + the partitioning-invariance sweep, both green at real SFs.
FLOAT_FOLD = {
    "q14_pricing_summary",
    "q21_running_user_value",
    "q39_value_quantiles",
    "q64_stats_suite",
    "q65_grouping_sets",
    "q109_median_abs_deviation",
    "q125_geomean_udaf",
    "q140_regr_stats",
    "q172_time_range_moving_avg",
    "q177_pagerank",
    "q197_subtree_rollup",
    "q310_cuped_ab_readout",
}

#: Watermarked streaming operators DROP events that arrive after the
#: watermark has passed their event time; the fixture's 30-year
#: event-time spread exceeds any bounded-state horizon, so whole
#: decades arrive "late" relative to the availableNow processing
#: order and are discarded - the documented contract that makes
#: streaming state bounded at 100 TB - while the batch oracle keeps
#: every row. Which rows survive depends on file/batch arrival order,
#: so these can flip green on a lucky order: green is ALLOWED here
#: (tolerated set, not a strict ledger).
STREAM_ORDER = {
    "q35_stream_daily_finalized",
    "q71_stream_sliding_finalized",
    "q145_stream_dedup",
    "q212_stream_session_finalized",
    "q223_stream_stream_left_outer",
    "q232_stream_stream_full_outer",
    "q265_stateful_timeout_sessions",
}

#: Integer/decimal exactness devices have a STATED input domain
#: (milli/micro scaling into BIGINT, DECIMAL(20,6) value sums,
#: DECIMAL(4,2) TPC-H rates, integer allocation). Out-of-domain
#: magnitudes (2^53-scale values, zero allocation bases) error
#: LOUDLY ON BOTH ENGINES - Spark ANSI arithmetic/cast errors,
#: DuckDB conversion/out-of-range errors - rather than returning
#: wrong data. test_fail_fast_is_parity proves the oracle side
#: rejects too (oracle_check short-circuits on the Spark error, so
#: the artifact row alone cannot show it).
FAIL_FAST_PARITY = {
    "q102_exact_allocation",
    "q150_decimal_revenue",
    "q174_partial_agg_merge",
    "q354_did_readout",
    "q355_simpsons_slope_audit",
    "q363_quantile_treatment_effect",
    "q364_permutation_test",
    "q410_hhi_concentration",
}

#: 1969 Asia/Ho_Chi_Minh: the JVM's tzdata renders +08:00 (Saigon
#: kept +08 until 1975) where DuckDB's ICU build renders +07:00 -
#: a timezone-DATABASE disagreement for pre-1975 instants, not a
#: computation bug; both engines agree from the epoch the reference
#: pipeline actually operates in.
TZ_HISTORY = {"q36_localize_tz"}

LEDGER = FLOAT_FOLD | STREAM_ORDER | FAIL_FAST_PARITY | TZ_HISTORY


def test_extreme_sweep_covers_registry():
    from web_scraping_etl_pipeline_spark.plans import QUERIES

    assert os.path.exists(EXTREME), (
        "DEGENERATE_SWEEP_EXTREME.json missing - python tools/"
        "extreme_fixture.py /tmp/sf_extreme && python tools/"
        "oracle_check.py --json DEGENERATE_SWEEP_EXTREME.json "
        "/tmp/sf_extreme"
    )
    records = _load(EXTREME)
    missing = sorted(set(QUERIES) - set(records) - _env_gated())
    assert missing == [], f"{len(missing)} missing, e.g. {missing[:5]}"


def test_extreme_corpus_green_or_ledgered():
    bad = {
        n: str(r.get("err"))[:100]
        for n, r in _load(EXTREME).items()
        if n not in LEDGER and not _green(r)
    }
    assert bad == {}, (
        f"{len(bad)} extreme-corpus divergences outside the ledger: "
        f"{bad}"
    )


def test_extreme_ledger_rows_are_not_stale():
    """A ledgered query that now agrees even on boundary input should
    leave the ledger - except the STREAM_ORDER set, whose outcome is
    arrival-order-dependent by design (green is allowed there)."""
    records = _load(EXTREME)
    strict = LEDGER - STREAM_ORDER
    stale = sorted(
        n for n in strict if n in records and _green(records[n])
    )
    assert stale == [], f"ledger rows {stale} now pass - remove them"


def test_extreme_sweep_rows_are_fresh():
    from tools.invariance_check import body_hash, oracle_hash
    from web_scraping_etl_pipeline_spark.plans import QUERIES

    stale = sorted(
        n
        for n, rec in _load(EXTREME).items()
        if n in QUERIES
        and (
            rec.get("body_hash") != body_hash(n)
            or rec.get("oracle_hash") != oracle_hash(n)
        )
    )
    assert stale == [], (
        f"DEGENERATE_SWEEP_EXTREME.json: {len(stale)} rows predate a "
        f"rewrite, e.g. {stale[:5]}"
    )


def test_ledgered_names_green_on_real_corpora():
    """The ledger is boundary-only: every ledgered name must be GREEN
    in all three real-SF sweeps (a ledger row must never paper over
    an in-contract divergence)."""
    for art in (
        "CORRECTNESS_SF0001.json",
        "CORRECTNESS_FULL.json",
        "CORRECTNESS_SF01.json",
    ):
        records = _load(os.path.join(REPO, art))
        bad = sorted(
            n for n in LEDGER if n in records and not _green(records[n])
        )
        assert bad == [], f"{art}: ledgered names red in contract: {bad}"


@pytest.fixture(scope="module")
def extreme_dir(tmp_path_factory):
    """The pinned extreme fixture, rebuilt deterministically."""
    out = str(tmp_path_factory.mktemp("sf_extreme"))
    from tools.extreme_fixture import build

    build(out)
    return out


def test_fail_fast_is_parity(extreme_dir):
    """Non-vacuity for the FAIL_FAST_PARITY class: the DuckDB twin
    must REJECT the boundary input too (the artifact row only shows
    the Spark error because oracle_check short-circuits). A parity
    row whose oracle silently succeeds would be a REAL divergence
    hiding in the ledger."""
    import duckdb

    from web_scraping_etl_pipeline_spark.plans import ORACLE

    con = duckdb.connect()
    con.execute("SET memory_limit='8GB'")
    for p in glob.glob(os.path.join(extreme_dir, "*.parquet")):
        t = os.path.basename(p).replace(".parquet", "")
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
        )
    not_rejecting = []
    for n in sorted(FAIL_FAST_PARITY):
        try:
            con.execute(ORACLE[n]).fetchall()
            not_rejecting.append(n)
        except Exception:  # noqa: BLE001 - rejection IS the assertion
            pass
    con.close()
    assert not_rejecting == [], (
        f"oracles that ACCEPT the boundary input {not_rejecting} - "
        "these are real divergences, not fail-fast parity; move them "
        "out of the ledger and fix them"
    )
