"""Custom Python DataSource (Spark 4 DataSource API): a deterministic
partitioned range source, registered as ``wsep_range``.

This pins the LAST entry-surface flavor the engine exposes: besides
file sources (parquet/csv/json), JDBC, streaming file sources and SQL
text, Spark 4 lets a pure-Python class participate in scan PLANNING -
``partitions()`` decides the parallelism (each InputPartition becomes
one Spark task) and ``read(partition)`` produces that split's rows on
an executor. The production use is wrapping internal services/APIs
(a crawl frontier, a feature store, a model registry) as first-class
scannable tables; here the source is a seeded arithmetic sequence so
the DuckDB oracle can state its exact contents.

Scale note: the generator yields per-partition slices independently -
N partitions = N parallel tasks, no driver materialization. The val
column is a Knuth multiplicative hash of the id, so downstream
aggregations exercise real (deterministic) value distribution.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

#: Knuth's multiplicative constant - val = (id * KNUTH) % MOD.
KNUTH = 2654435761
MOD = 1000


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class RangeReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("parts", 4))

    def partitions(self):
        step = max(1, -(-self.n // self.parts))
        return [
            _RangePartition(lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition):
        for i in range(partition.start, partition.end):
            yield (i, (i * KNUTH) % MOD)


class WsepRangeDataSource(DataSource):
    @classmethod
    def name(cls):
        return "wsep_range"

    def schema(self):
        return "id long, val long"

    def reader(self, schema):
        return RangeReader(self.options)


_REGISTERED: set[str] = set()


def register(spark) -> None:
    """Idempotent per-session registration."""
    app = spark.sparkContext.applicationId
    if app not in _REGISTERED:
        spark.dataSource.register(WsepRangeDataSource)
        _REGISTERED.add(app)


# ---------------------------------------------------------------------------
# streaming flavor: a Python streaming source with explicit offsets
# ---------------------------------------------------------------------------

from pyspark.sql.datasource import SimpleDataSourceStreamReader  # noqa: E402

#: default rows emitted per micro-batch by the streaming range
#: source; overridable via the ``batch`` option (the pytest uses a
#: small batch to exercise multi-run offset resume).
STREAM_BATCH = 5000


class RangeStreamReader(SimpleDataSourceStreamReader):
    """Offset-tracked streaming reads: ``initialOffset`` starts the
    cursor, each ``read(start)`` returns (rows, nextOffset) for one
    micro-batch, and ``readBetweenOffsets`` replays a committed span
    deterministically on recovery - the exactly-once contract a
    custom source must honor, in its smallest honest form."""

    def __init__(self, options):
        self.n = int(options.get("n", 5000))
        self.batch = int(options.get("batch", STREAM_BATCH))

    def initialOffset(self):
        return {"pos": 0}

    def read(self, start):
        lo = start["pos"]
        hi = min(lo + self.batch, self.n)
        rows = [(i, (i * KNUTH) % MOD) for i in range(lo, hi)]
        # the API contract wants an ITERATOR of tuples, not a list
        return iter(rows), {"pos": hi}

    def readBetweenOffsets(self, start, end):
        return iter(
            [
                (i, (i * KNUTH) % MOD)
                for i in range(start["pos"], end["pos"])
            ]
        )


class WsepRangeStreamDataSource(DataSource):
    @classmethod
    def name(cls):
        return "wsep_range_stream"

    def schema(self):
        return "id long, val long"

    def simpleStreamReader(self, schema):
        return RangeStreamReader(self.options)


def register_stream(spark) -> None:
    app = spark.sparkContext.applicationId
    key = f"stream:{app}"
    if key not in _REGISTERED:
        spark.dataSource.register(WsepRangeStreamDataSource)
        _REGISTERED.add(key)


# ---------------------------------------------------------------------------
# writer flavor: a Python data SINK with two-phase commit
# ---------------------------------------------------------------------------

from pyspark.sql.datasource import (  # noqa: E402
    DataSourceWriter,
    WriterCommitMessage,
)


class _PartFile(WriterCommitMessage):
    def __init__(self, name: str, rows: int):
        self.name = name
        self.rows = rows


class JsonlSinkWriter(DataSourceWriter):
    """Executor-side writer: each task streams its partition to a
    task-unique JSON-lines part file and returns the file name as its
    commit message; the DRIVER's ``commit`` then writes a manifest
    naming exactly the committed parts. Readers trust only the
    manifest, so a failed/zombie task's orphan file is invisible -
    the same two-phase rename-free commit protocol cloud-native
    tables use, in its smallest honest Python form."""

    def __init__(self, options, overwrite: bool = False):
        self.path = options.get("path")
        self.overwrite = overwrite
        if not self.path:
            raise ValueError("wsep_jsonl_sink requires a 'path' option")

    def write(self, iterator):
        import json as _json
        import os as _os
        import uuid as _uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        name = f"part-{pid:05d}-{_uuid.uuid4().hex}.jsonl"
        _os.makedirs(self.path, exist_ok=True)
        n = 0
        with open(_os.path.join(self.path, name), "w") as fh:
            for row in iterator:
                fh.write(_json.dumps(row.asDict()) + "\n")
                n += 1
        return _PartFile(name, n)

    def commit(self, messages):
        """Driver-side commit: publish the manifest. ``append`` MERGES
        with a pre-existing manifest (prior committed parts stay
        visible - a second save() must not silently hide them from
        manifest-driven readers); ``overwrite`` retires the previously
        committed parts and starts a fresh manifest."""
        import json as _json
        import os as _os

        mpath = _os.path.join(self.path, "_MANIFEST.json")
        prior = {"files": [], "rows": 0}
        if _os.path.exists(mpath):
            try:
                with open(mpath) as fh:
                    prior = _json.load(fh)
            except (OSError, ValueError):
                # unreadable prior manifest: treat the dir as fresh
                # (its parts were never trustworthy to readers anyway)
                prior = {"files": [], "rows": 0}
        retired: list[str] = []
        if self.overwrite:
            # publish FIRST, delete after: removing retired parts
            # before the atomic manifest swap leaves a crash window
            # where the surviving (old) manifest names deleted files -
            # breaking the "readers trust only the manifest" contract.
            retired = list(prior.get("files", []))
            prior = {"files": [], "rows": 0}
        manifest = {
            "files": sorted(
                set(prior.get("files", []))
                | {m.name for m in messages if m}
            ),
            "rows": prior.get("rows", 0)
            + sum(m.rows for m in messages if m),
        }
        tmp = mpath + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(_json.dumps(manifest))
        _os.replace(tmp, mpath)  # readers never see a torn manifest
        for name in retired:  # garbage-collect AFTER the publish
            if name in manifest["files"]:
                continue  # same-named fresh part: do not delete it
            try:
                _os.remove(_os.path.join(self.path, name))
            except OSError:
                pass

    def abort(self, messages):
        import os as _os

        for m in messages:
            if m is not None:
                try:
                    _os.remove(_os.path.join(self.path, m.name))
                except OSError:
                    pass


class WsepJsonlSinkDataSource(DataSource):
    @classmethod
    def name(cls):
        return "wsep_jsonl_sink"

    def writer(self, schema, overwrite):
        return JsonlSinkWriter(self.options, overwrite)


def register_sink(spark) -> None:
    app = spark.sparkContext.applicationId
    key = f"sink:{app}"
    if key not in _REGISTERED:
        spark.dataSource.register(WsepJsonlSinkDataSource)
        _REGISTERED.add(key)
