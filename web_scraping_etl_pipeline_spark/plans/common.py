"""Shared helpers for the query suites."""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.star import ANCHOR_US, EVENTS_EPOCH_US, US_PER_DAY, load_table

__all__ = [
    "ANCHOR_US",
    "EVENTS_EPOCH_US",
    "US_PER_DAY",
    "t",
    "t_split",
    "HORIZON_US",
    "fdiv_sql",
    "EPOCH_DAY_SQL",
    "shared_stage",
    "global_rn",
    "global_cumsum",
    "global_ntile",
    "global_lead",
]

#: Q1's deadline horizon: NOW() + INTERVAL '20 DAYS' (script.sql:54 -
#: the code says 20; the comment says 10; SURVEY.md section 8 B7 keeps the code).
HORIZON_US = ANCHOR_US + 20 * US_PER_DAY


def fdiv_sql(num: str, den: int) -> str:
    """DuckDB SQL for exact integer FLOOR division.

    DuckDB's ``//`` truncates toward zero while Spark's
    ``F.floor(a / b)`` floors, so ``(epoch_us(ts) - epoch) //
    us_per_day`` style day bucketing diverges by one bucket for every
    NEGATIVE dividend (pre-epoch timestamps) - and truncation also
    makes bucket 0 two units wide. In contract (events >= 2024-01-01
    = EVENTS_EPOCH_US) the dividend is non-negative and the two agree;
    the r13 extreme-numerics census proved the boundary divergence on
    1969-2000 fixtures. Subtracting the sign-safe remainder first
    makes the ``//`` exact with no float round-trip:
    ``x - ((x % d) + d) % d`` is the largest multiple of d <= x.

    Dividend domain: (INT64_MIN + den, INT64_MAX]. For a dividend
    within ``den`` of INT64_MIN that is not an exact multiple, the
    intermediate ``floor(x/d)*d`` underflows bigint and DuckDB raises
    Out of Range while the Spark floor twin succeeds - a
    fail-vs-succeed parity break (code-review r13). Every current
    call site is an epoch-shifted microsecond timestamp (|x| <~ 1e16,
    9 orders inside the boundary)."""
    return (
        f"(({num}) - ((({num}) % {den}) + {den}) % {den}) // {den}"
    )


#: the canonical event-day index both engines floor identically:
#: floor((epoch_us(ts) - EVENTS_EPOCH_US) / US_PER_DAY).
EPOCH_DAY_SQL = fdiv_sql(f"epoch_us(ts) - {EVENTS_EPOCH_US}", US_PER_DAY)


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def t_split(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Like :func:`t`, but explicitly split to full parallelism for
    consumers whose FIRST stage does heavy per-row work (shingle
    explode + K hashes, simhash votes, per-pair edit distance).

    Rationale: the map stage before the first shuffle runs at the
    scan's partitioning. On a cluster that is thousands of row-group
    splits, but the local test parquet is a single row group, so the
    expensive map work serializes onto ONE core (measured 13s -> 2s on
    the sf0.1 minhash build). The round-robin repartition costs one
    tiny shuffle of the raw rows and is partitioning-neutral at scale
    (a real deployment's scan already has the parallelism and the
    optimizer's AQE handles the rest)."""
    return t(spark, sf_dir, name).repartition(
        spark.sparkContext.defaultParallelism
    )


#: session-scoped materialized intermediates, keyed by
#: (applicationId, sf_dir, stage name).
_STAGE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def shared_stage(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    build: Callable[[], DataFrame],
) -> DataFrame:
    """A persisted intermediate shared across queries in one session -
    the local analogue of materializing a signatures/pairs table on a
    cluster.

    Several dedup queries share the same expensive upstream (MinHash
    signatures, LSH candidate pairs, connected-component labels);
    without reuse the suite re-runs that dominant stage per consumer
    (5x for the LSH pipeline). On a 100 TB deployment these stages are
    written once as tables and every downstream job scans them; in one
    SparkSession ``persist()`` plays that role. Entries are small by
    construction - K longs per doc, pair lists bounded by LSH output -
    so no eviction is needed; keying by applicationId isolates a
    driver-owned session from ours."""
    key = (spark.sparkContext.applicationId, sf_dir, name)
    df = _STAGE_CACHE.get(key)
    if df is None:
        df = build().persist()
        _STAGE_CACHE[key] = df
    return df


# ---------------------------------------------------------------------------
# Distributed total-order primitives (no single-partition WindowExec)
# ---------------------------------------------------------------------------
#
# ``Window.orderBy(...)`` with no partitionBy moves the FULL relation to
# one task (Spark logs ``WindowExec: No Partition Defined``) - correct,
# but the classic 100 TB serialization point.  The three helpers below
# are the standard two-pass range-partitioned rewrite:
#
#   1. ``repartitionByRange`` on the order key (equal keys colocate,
#      blocks are contiguous in the total order) + in-partition sort;
#      the result is persisted so both passes see identical boundaries.
#   2. one tiny job aggregates per-partition row counts / sums
#      (<= npartitions rows, collected driver-side - bounded by the
#      partition count, like the suite's other adjudicated collects)
#      and a Python scan turns them into exclusive prefix offsets.
#   3. a MAP-ONLY Arrow pass (``mapInPandas`` with carried state
#      across batches) emits each row's local prefix plus its
#      partition's offset.  No second shuffle, no join, no
#      single-partition stage; the per-row work is vectorized numpy.
#
# Every pass is embarrassingly parallel, so the plan survives a 100x
# scale-up: the only data motion is the one range exchange that the
# total order inherently requires.


def _order_cols(order_cols: Sequence) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in order_cols]


#: transient per-query persisted intermediates (the helpers' ranged
#: stages). Unlike shared_stage entries these are never reused across
#: queries, so a long suite run should release them between queries -
#: in an 8 GB local JVM dozens of lingering fact-sized cache entries
#: turn into storage-pool eviction churn and GC pauses billed to
#: innocent later queries. bench.py / tools call release_transients().
_TRANSIENT_PERSISTS: list[DataFrame] = []


def release_transients() -> int:
    """Unpersist every helper-stage cache entry registered since the
    last call; returns how many were released. Safe mid-session: a
    consumer re-executing after release just recomputes the lineage
    (same deterministic range boundaries)."""
    n = len(_TRANSIENT_PERSISTS)
    for df in _TRANSIENT_PERSISTS:
        try:
            df.unpersist(blocking=False)
        except Exception:  # session already stopped
            pass
    _TRANSIENT_PERSISTS.clear()
    return n


def degenerate_frame(spark: SparkSession, ddl: str, rows=()) -> DataFrame:
    """Typed literal frame for DEGENERATE-CORPUS early-outs (round 12,
    VERDICT r11 item 3): a construction-collect operator (driver-loop
    plans seeded from collected query vectors / centroids / vocabulary
    / greedy picks) is DEFINED on non-empty input; when the collect
    comes back empty the operator returns its oracle's own
    degenerate-input output - usually the 0-row frame, occasionally a
    literal readout row (the SQL aggregate-over-empty row) - instead
    of crashing plan construction. ``ddl`` must equal the real plan's
    output schema; tests/test_degenerate_guards.py pins each user's
    declared DDL against the schema the non-degenerate plan actually
    produces, so the early-out can never drift from the real query."""
    return spark.createDataFrame(list(rows), ddl)


def transient_persist(df: DataFrame) -> DataFrame:
    """persist() registered for :func:`release_transients` - for
    within-one-query multi-consumer stages (e.g. q160's base aggregate
    feeding three ranking passes)."""
    d = df.persist()
    _TRANSIENT_PERSISTS.append(d)
    return d


def _ranged(df: DataFrame, order_cols: Sequence, npartitions: int | None):
    n = npartitions or df.sparkSession.sparkContext.defaultParallelism
    cols = _order_cols(order_cols)
    d = (
        df.repartitionByRange(n, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    _TRANSIENT_PERSISTS.append(d)
    return d


def global_rn(
    df: DataFrame,
    order_cols: Sequence,
    rn_col: str = "_rn",
    npartitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Global 1-based row number over a total order, PURE JVM - no
    Python stage, no second exchange, no single-partition window.

    After the range exchange + in-partition sort,
    ``monotonically_increasing_id`` assigns ids in row order within
    each partition (documented layout: partition id in the upper bits,
    consecutive record number in the lower 33). The per-partition
    stats job - needed for the prefix offsets anyway - VERIFIES
    consecutiveness (max - min == count - 1 per partition) and the
    whole row number collapses to ``_mid + adjust[pid] + 1``, a
    map-stage add after a broadcast join on the partition id. If a
    future engine breaks the layout, the check fails over to the
    Arrow carried-state path (:func:`global_cumsum`), same results.

    Returns ``(frame, total_rows)``.
    """
    n = npartitions or df.sparkSession.sparkContext.defaultParallelism
    cols = _order_cols(order_cols)
    d = (
        df.repartitionByRange(n, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_mid", F.monotonically_increasing_id())
        .persist()
    )
    _TRANSIENT_PERSISTS.append(d)
    stats = {
        r["_pid"]: r
        for r in d.groupBy("_pid")
        .agg(
            F.count(F.lit(1)).alias("_cnt"),
            F.min("_mid").alias("_lo"),
            F.max("_mid").alias("_hi"),
        )
        .collect()
    }
    if any(
        s["_hi"] - s["_lo"] != s["_cnt"] - 1 for s in stats.values()
    ):  # pragma: no cover - engine layout change
        out, total, _ = global_cumsum(
            df, order_cols, rn_col=rn_col, npartitions=npartitions
        )
        return out, total
    run = 0
    adj = []
    for pid in sorted(stats):
        adj.append((pid, run - stats[pid]["_lo"]))
        run += stats[pid]["_cnt"]
    spark = df.sparkSession
    adj_df = spark.createDataFrame(adj, "_pid int, _adj long")
    out = (
        d.join(F.broadcast(adj_df), "_pid")
        .withColumn(rn_col, F.col("_mid") + F.col("_adj") + 1)
        .drop("_pid", "_mid", "_adj")
    )
    return out, run


def global_cumsum(
    df: DataFrame,
    order_cols: Sequence,
    sums: Sequence[tuple[str, str]] = (),
    rn_col: str | None = None,
    npartitions: int | None = None,
) -> tuple[DataFrame, int, dict[str, int]]:
    """ROWS-frame global running sums and/or a global 1-based row
    number over a total order, without an unpartitioned WindowExec.

    The per-row stage is a WINDOW PARTITIONED BY the range-partition
    id - fully parallel, pure JVM codegen. It costs one extra hash
    exchange on the partition id (each contiguous block moves as a
    unit), which measured FASTER than an Arrow carried-state pass at
    every size past the fixed overhead (40M rows local[32]: 13.5 s
    JVM vs 23.4 s Arrow vs 24.5 s single-partition window; see
    PERF.md) - columnar serde over every row costs more than a
    second JVM shuffle.

    ``order_cols``: str or Column sort expressions (``F.desc`` fine);
    they feed ``repartitionByRange`` and the in-partition sort, so a
    deterministic ``rn_col`` needs a total tie-break.  Equal keys land
    in one partition (RangePartitioner contract), so ties never split
    across the offset boundary.
    ``sums``: (source_col, out_col) pairs; sources must be non-null
    numerics.
    Returns ``(frame, total_rows, {out_col: grand_total})`` - the
    grand totals replace ``SUM(x) OVER ()`` scalars as plan-time
    literals.
    """
    from pyspark.sql import Window  # noqa: PLC0415

    d = _ranged(df, order_cols, npartitions)
    aggs = [F.count(F.lit(1)).alias("_cnt")] + [
        F.sum(src).alias(f"_s{i}") for i, (src, _) in enumerate(sums)
    ]
    stats = {r["_pid"]: r for r in d.groupBy("_pid").agg(*aggs).collect()}
    run_cnt = 0
    run_sums = [0] * len(sums)
    off_rows = []
    for pid in sorted(stats):
        off_rows.append((pid, run_cnt, *run_sums))
        run_cnt += stats[pid]["_cnt"]
        for i in range(len(sums)):
            run_sums[i] += stats[pid][f"_s{i}"] or 0
    totals = {out: run_sums[i] for i, (_, out) in enumerate(sums)}

    spark = df.sparkSession
    dtypes = dict(d.dtypes)
    integral = {"tinyint", "smallint", "int", "bigint"}
    off_schema = ", ".join(
        ["_pid int", "_rn_off long"]
        + [
            f"_s_off{i} "
            + ("long" if dtypes[src] in integral else "double")
            for i, (src, _) in enumerate(sums)
        ]
    )
    off_df = spark.createDataFrame(
        [
            (
                p,
                r,
                *[
                    int(s) if dtypes[sums[i][0]] in integral else float(s)
                    for i, s in enumerate(ss)
                ],
            )
            for p, r, *ss in off_rows
        ],
        off_schema,
    )
    cols = _order_cols(order_cols)
    w = Window.partitionBy("_pid").orderBy(*cols)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = d
    if rn_col:
        out = out.withColumn(rn_col, F.row_number().over(w).cast("long"))
    for i, (src, name) in enumerate(sums):
        out = out.withColumn(f"_ps{i}", F.sum(src).over(wsum))
    out = out.join(F.broadcast(off_df), "_pid")
    if rn_col:
        out = out.withColumn(rn_col, F.col(rn_col) + F.col("_rn_off"))
    for i, (src, name) in enumerate(sums):
        summed = F.col(f"_ps{i}") + F.col(f"_s_off{i}")
        if dtypes[src] in integral:
            summed = summed.cast("long")
        out = out.withColumn(name, summed)
    drop = ["_pid", "_rn_off"] + [
        c for i in range(len(sums)) for c in (f"_ps{i}", f"_s_off{i}")
    ]
    return out.drop(*drop), run_cnt, totals


def global_ntile(
    df: DataFrame,
    order_cols: Sequence,
    n_buckets: int,
    out_col: str,
    npartitions: int | None = None,
) -> DataFrame:
    """Exact SQL ``NTILE(n) OVER (ORDER BY ...)`` as a distributed
    plan: global row number via :func:`global_rn` (pure JVM), then the
    NTILE bucket formula with the total row count folded in as
    plan-time literals (first ``total % n`` buckets get the extra row,
    exactly the SQL spec).  Output bucket is BIGINT."""
    d, total = global_rn(
        df, order_cols, rn_col="_gnt_rn", npartitions=npartitions
    )
    q, r = divmod(total, n_buckets)
    if q == 0:
        bucket = F.col("_gnt_rn")
    else:
        cut = r * (q + 1)
        lo = F.expr(f"(_gnt_rn - 1) DIV {q + 1} + 1")
        hi = F.expr(f"(_gnt_rn - {cut} - 1) DIV {q} + {r} + 1")
        bucket = F.when(F.col("_gnt_rn") <= cut, lo).otherwise(hi)
    return d.withColumn(out_col, bucket.cast("long")).drop("_gnt_rn")


def global_lead(
    df: DataFrame,
    order_cols: Sequence,
    lead_cols: Sequence[str],
    k: int = 1,
    npartitions: int | None = None,
) -> DataFrame:
    """``LEAD(col, j) OVER (ORDER BY ...)`` for j in 1..k over a total
    order, distributed: in-partition leads come from a pure-JVM window
    PARTITIONED BY the range-partition id (fully parallel codegen -
    the :func:`global_cumsum` device, which measured faster than the
    Arrow carried-state pass this function used before r14: columnar
    serde over every row costs more than one extra JVM exchange on
    the block id; the Python boundary is gone entirely, guide
    section 4). The <= k tail rows of each partition are patched from
    the next partitions' head rows - a broadcast-sized relation
    (npartitions * k rows) joined back on the exact global row
    number.  Adds ``_lead{j}_{col}`` columns; rows with no global
    successor keep NULL."""
    from pyspark.sql import Window  # noqa: PLC0415

    d = _ranged(df, order_cols, npartitions)
    stats = {
        r["_pid"]: r["_cnt"]
        for r in d.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt")).collect()
    }
    offsets: dict[int, int] = {}
    run = 0
    head_rns: list[int] = []
    for pid in sorted(stats):
        offsets[pid] = run
        head_rns.extend(run + j for j in range(1, min(k, stats[pid]) + 1))
        run += stats[pid]

    leads = list(lead_cols)
    cols = _order_cols(order_cols)
    spark = df.sparkSession
    wp = Window.partitionBy("_pid").orderBy(*cols)
    adj_df = spark.createDataFrame(
        sorted(offsets.items()), "_pid int, _off long"
    )
    keep = [c for c in d.columns if c != "_pid"]
    # row_number + every lead share ONE window spec = one WindowExec.
    res = (
        d.select(
            *keep,
            "_pid",
            F.row_number().over(wp).alias("_prn"),
            *[
                F.lead(c, j).over(wp).alias(f"_lead{j}_{c}")
                for j in range(1, k + 1)
                for c in leads
            ],
        )
        .join(F.broadcast(adj_df), "_pid")
        .select(
            *keep,
            (F.col("_prn").cast("long") + F.col("_off")).alias("_grn"),
            *[
                f"_lead{j}_{c}"
                for j in range(1, k + 1)
                for c in leads
            ],
        )
    )
    if not head_rns:  # empty input: nothing to patch
        return res.drop("_grn")
    # heads stays a LAZY subtree (r14: both a transient_persist of res
    # and an eager bounded collect of the head rows were measured and
    # lost - persist cache machinery and the extra eager job each cost
    # more than re-planning this filter against the cached ranged
    # frame; broadcast-subtree reuse dedupes the per-j builds).
    heads = res.filter(F.col("_grn").isin(head_rns)).select(
        F.col("_grn").alias("_hrn"),
        *[F.col(c).alias(f"_h_{c}") for c in leads],
    )
    out = res
    for j in range(1, k + 1):
        hj = heads.select(
            F.col("_hrn").alias(f"_hrn{j}"),
            *[F.col(f"_h_{c}").alias(f"_h{j}_{c}") for c in leads],
        )
        out = out.join(
            F.broadcast(hj),
            F.col("_grn") + j == F.col(f"_hrn{j}"),
            "left",
        )
        for c in leads:
            out = out.withColumn(
                f"_lead{j}_{c}",
                F.when(
                    F.col(f"_hrn{j}").isNotNull(), F.col(f"_h{j}_{c}")
                ).otherwise(F.col(f"_lead{j}_{c}")),
            )
        out = out.drop(f"_hrn{j}", *[f"_h{j}_{c}" for c in leads])
    return out.drop("_grn")
