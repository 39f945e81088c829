"""Python DataSource WRITER (q273's sink): two-phase commit contract.

The sink's executor tasks write task-unique part files and the driver
commit publishes a manifest; readers must trust ONLY the manifest -
an orphan part (failed/zombie task, concurrent writer debris) in the
same directory must be invisible.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from web_scraping_etl_pipeline_spark.sources.pyds import register_sink


def test_manifest_names_exactly_the_committed_parts(spark, tmp_path):
    register_sink(spark)
    sink = str(tmp_path / "sink")
    df = spark.range(100).select(
        F.col("id"), (F.col("id") * 7).alias("v")
    ).repartition(4)
    df.write.format("wsep_jsonl_sink").option("path", sink).mode(
        "append"
    ).save()

    manifest = json.load(open(os.path.join(sink, "_MANIFEST.json")))
    assert manifest["rows"] == 100
    parts = [f for f in os.listdir(sink) if f.endswith(".jsonl")]
    assert sorted(parts) == manifest["files"]

    # plant an orphan part (a failed task's debris); a manifest-driven
    # read must not see its rows
    with open(os.path.join(sink, "part-99999-orphan.jsonl"), "w") as fh:
        fh.write('{"id": 424242, "v": 1}\n')
    files = [os.path.join(sink, f) for f in manifest["files"]]
    back = spark.read.schema("id long, v long").json(files)
    assert back.count() == 100
    assert back.filter(F.col("id") == 424242).count() == 0
    got = sorted((r["id"], r["v"]) for r in back.collect())
    assert got == [(i, i * 7) for i in range(100)]


def test_append_merges_manifest_and_overwrite_retires_parts(
    spark, tmp_path
):
    """ADVICE r5: a second append must EXTEND the manifest (not hide
    the first batch), and an overwrite must retire the previously
    committed parts."""
    register_sink(spark)
    sink = str(tmp_path / "sink2")

    def write(lo, hi, mode):
        spark.range(lo, hi).select(
            F.col("id"), (F.col("id") * 7).alias("v")
        ).repartition(2).write.format("wsep_jsonl_sink").option(
            "path", sink
        ).mode(mode).save()

    def manifest():
        return json.load(open(os.path.join(sink, "_MANIFEST.json")))

    write(0, 50, "append")
    first_files = set(manifest()["files"])
    write(50, 100, "append")
    m = manifest()
    assert m["rows"] == 100
    assert first_files < set(m["files"])  # batch 1 still visible
    back = spark.read.schema("id long, v long").json(
        [os.path.join(sink, f) for f in m["files"]]
    )
    assert sorted(r["id"] for r in back.collect()) == list(range(100))

    write(200, 210, "overwrite")
    m2 = manifest()
    assert m2["rows"] == 10
    assert not (set(m2["files"]) & set(m["files"]))
    for old in m["files"]:  # retired parts physically removed
        assert not os.path.exists(os.path.join(sink, old))
