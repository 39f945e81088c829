"""Multi-dimensional file layout (Z-order clustering) for data skipping.

The reference stores tens of rows in Postgres and needs no layout
management; at 100 TB, file layout IS the query accelerator: parquet
readers prune whole files from footer min/max stats, and min/max are
only selective if the writer clustered the data. Sorting by one column
helps only that column; interleaving the bits of SEVERAL columns (the
Z-order / Morton curve - the same primitive behind Delta's OPTIMIZE
ZORDER BY and Iceberg's sort orders) keeps every indexed column's
per-file range narrow at once.

Everything is JVM-side column expressions: rank each column into a
2^bits quantile grid (distributed, via ``approxQuantile`` cutpoints
broadcast as a literal CASE ladder), interleave bits with integer
arithmetic, then ``repartitionByRange`` on the key so each output file
covers one compact curve segment. No UDFs, no driver loops over data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["zorder_key", "write_zordered", "file_minmax_stats"]

#: bits per dimension (2 dims x 8 bits = 65536 curve cells; plenty to
#: spread any practical file count while the CASE ladder stays small).
_BITS = 8


def _grid_cell_sql(df: DataFrame, col: str, bits: int) -> str:
    """SQL for quantile-ranking ``col`` into 0..2^bits-1: approxQuantile
    cutpoints folded in as literals, evaluated as a FLAT sum of
    comparisons (cell = number of cutpoints strictly below the value),
    built as ONE expr string - no Py4J per-term construction tax (the
    round-3 lesson), no n-deep CASE ladder. Quantile (not min/max
    linear) gridding makes the cells equi-populated, so skew cannot
    collapse the curve onto a few cells."""
    n = 1 << bits
    cuts = df.stat.approxQuantile(col, [i / n for i in range(1, n)], 0.001)
    terms = " + ".join(
        f"CAST(`{col}` > {c!r} AS BIGINT)" for c in cuts
    )
    return f"({terms})"


def zorder_key(df: DataFrame, cols: list[str], bits: int = _BITS) -> DataFrame:
    """Add a Morton key column ``_zkey`` over ``cols``: quantile-grid
    each column to ``bits`` bits (materialized once as ``_cell{i}``
    projections), then interleave bits dimension-major - pure integer
    shift/mask arithmetic inside whole-stage codegen."""
    d = df
    for i, c in enumerate(cols):
        d = d.withColumn(f"_cell{i}", F.expr(_grid_cell_sql(df, c, bits)))
    ndim = len(cols)
    parts = [
        f"shiftleft(shiftright(_cell{i}, {b}) & 1, {b * ndim + i})"
        for b in range(bits)
        for i in range(ndim)
    ]
    key = " + ".join(parts)
    return d.withColumn("_zkey", F.expr(f"CAST({key} AS BIGINT)")).drop(
        *[f"_cell{i}" for i in range(ndim)]
    )


def write_zordered(
    df: DataFrame,
    cols: list[str],
    out_path: str,
    n_files: int,
    bits: int = _BITS,
) -> None:
    """Cluster ``df`` on the Z-order curve of ``cols`` and write
    ``n_files`` parquet files, each covering one contiguous curve
    segment (repartitionByRange on the key + in-partition sort, so the
    footer min/max of EVERY indexed column is narrow in every file).
    The key is dropped from the output - layout is a storage property,
    not a schema change."""
    keyed = zorder_key(df, cols, bits)
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(out_path)
    )


def file_minmax_stats(spark, path: str, cols: list[str]) -> list[dict]:
    """Per-file min/max of ``cols`` - the exact stats a parquet reader
    prunes on - gathered with one tiny Spark job per file over the
    file list (metadata-sized; used by tests to QUANTIFY skipping)."""
    import glob
    import os

    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        row = (
            spark.read.parquet(f)
            .agg(
                *[F.min(c).alias(f"min_{c}") for c in cols],
                *[F.max(c).alias(f"max_{c}") for c in cols],
                F.count(F.lit(1)).alias("rows"),
            )
            .first()
        )
        out.append({"file": os.path.basename(f), **row.asDict()})
    return out
