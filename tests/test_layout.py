"""Z-order layout (sources/layout.py): quantified data-skipping gate.

The property a Z-ordered layout must deliver: with N files, EVERY
indexed column's per-file min/max range is a small fraction of its
global range, so footer-stats pruning skips most files for selective
predicates on ANY of the indexed columns - which a single-column sort
cannot do for the second column, and a hash/round-robin layout cannot
do for either.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from web_scraping_etl_pipeline_spark.sources.layout import (
    file_minmax_stats,
    write_zordered,
    zorder_key,
)

COLS = ["o_custkey", "o_totalprice"]


def _overlapping(stats, col, lo, hi):
    return [
        s for s in stats if not (s[f"max_{col}"] < lo or s[f"min_{col}"] > hi)
    ]


def test_zorder_layout_prunes_on_both_dimensions(spark, tmp_path):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", *COLS
    )
    zpath = str(tmp_path / "zordered")
    rpath = str(tmp_path / "roundrobin")
    n_files = 16
    write_zordered(orders, COLS, zpath, n_files)
    orders.repartition(n_files).write.mode("overwrite").parquet(rpath)

    zstats = file_minmax_stats(spark, zpath, COLS)
    rstats = file_minmax_stats(spark, rpath, COLS)
    assert len(zstats) == n_files

    # layout is lossless
    zcnt = spark.read.parquet(zpath).count()
    assert zcnt == orders.count()

    agg = orders.agg(
        *[F.min(c).alias(f"lo_{c}") for c in COLS],
        *[F.max(c).alias(f"hi_{c}") for c in COLS],
    ).first()
    for col in COLS:
        glob_range = agg[f"hi_{col}"] - agg[f"lo_{col}"]
        zshare = sum(
            (s[f"max_{col}"] - s[f"min_{col}"]) / glob_range for s in zstats
        ) / len(zstats)
        rshare = sum(
            (s[f"max_{col}"] - s[f"min_{col}"]) / glob_range for s in rstats
        ) / len(rstats)
        # each Z-file covers a curve segment: a small slice of BOTH
        # dimensions; round-robin files span essentially everything.
        assert zshare < 0.55, (col, zshare)
        assert rshare > 0.9, (col, rshare)

    # concrete pruning: a 10%-of-range predicate on EACH dimension must
    # skip at least half the z-ordered files; round-robin skips none.
    for col in COLS:
        lo = agg[f"lo_{col}"]
        width = (agg[f"hi_{col}"] - agg[f"lo_{col}"]) * 0.10
        hit_z = _overlapping(zstats, col, lo, lo + width)
        hit_r = _overlapping(rstats, col, lo, lo + width)
        assert len(hit_z) <= n_files // 2, (col, len(hit_z))
        assert len(hit_r) == n_files, col


def test_zorder_key_is_deterministic_and_bounded(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(*COLS)
    k1 = sorted(
        r["_zkey"] for r in zorder_key(orders, COLS, bits=4).collect()
    )
    k2 = sorted(
        r["_zkey"] for r in zorder_key(orders, COLS, bits=4).collect()
    )
    assert k1 == k2
    assert 0 <= k1[0] and k1[-1] < (1 << 8)  # 2 dims x 4 bits
