"""User-defined function surface: the two Python extension API classes
the rest of the engine deliberately avoids (SURVEY.md section 2.8 keeps
C1-C8 as native Column expressions) - demonstrated once each, with
oracles, for the cases where they are the RIGHT tool:

- a grouped-aggregate ``pandas_udf`` (UDAF): an aggregate Spark lacks
  natively, computed per group over an Arrow batch;
- a ``udtf`` (UDTF): one input row -> many output rows with imperative
  row logic, lateral-joined in SQL.

Both stay off the hot path of every other query; they exist so a user
migrating custom aggregates/table functions has a worked, tested
pattern for each API class.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from .common import t
from .registry import query


@query(
    "q125_geomean_udaf",
    oracle="""
    SELECT event_type,
           ROUND(EXP(AVG(LN(CASE WHEN value > 0 THEN value END))), 6)
             AS geomean_value,
           CAST(COUNT(*) FILTER (WHERE value > 0) AS BIGINT) AS n_pos
    FROM events GROUP BY event_type
    """,
)
def q125_geomean_udaf(spark, sf_dir):
    """Custom aggregate (grouped-agg ``pandas_udf``): geometric mean of
    ``value`` per event type. Spark has no geometric-mean aggregate;
    the UDAF receives each group's values as ONE Arrow-backed pandas
    Series (vectorized numpy body, no per-row Python).

    Scale: grouped-agg pandas UDFs hash-shuffle rows to their group
    like any aggregate but skip map-side partial aggregation (the UDF
    is a black box to Catalyst) - fine for bounded groups; an
    algebraic rewrite (exp of AVG of ln, which IS map-side combinable,
    exactly the oracle's form) is the 100 TB path when the aggregate
    decomposes. That trade - flexibility vs combinability - is the
    point this query documents."""

    @pandas_udf("double")
    def geomean(v: pd.Series) -> float:
        import numpy as np

        # guard LN's domain on BOTH sides identically (r11 tri-SF
        # catch: sf0.1 has value=0 rows, and DuckDB evaluates LN's
        # argument before the aggregate FILTER applies, erroring on 0
        # - the oracle now NULLs non-positives via CASE instead, and
        # an all-nonpositive group is NULL here, not NaN, to match
        # AVG-over-empty)
        pos = v[v > 0]
        if len(pos) == 0:
            return None
        return float(np.exp(np.log(pos).mean()))

    # Spark refuses to mix grouped-agg pandas UDFs with JVM aggregates
    # in one agg() (INVALID_PANDAS_UDF_PLACEMENT), so the companion
    # count is a pandas aggregate too.
    @pandas_udf("long")
    def n_pos(v: pd.Series) -> int:
        return int((v > 0).sum())

    ev = t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(geomean("value"), 6).alias("geomean_value"),
        n_pos("value").alias("n_pos"),
    )


#: chunk width for the UDTF (words per emitted row).
CHUNK_W = 10


@udtf(returnType="doc_id: bigint, chunk_idx: bigint, n_words: bigint")
class ChunkWords:
    """UDTF: split a document into fixed-width word chunks, one output
    row per chunk - the table-function shape (1 row in, N rows out,
    imperative body) that ``explode`` can't express when the expansion
    logic doesn't fit an array expression."""

    def eval(self, doc_id, text):  # noqa: D102 - contract method
        import re

        # NULL text yields NO chunk rows, mirroring the oracle's NULL
        # propagation exactly (trim(NULL) -> NULL tokens -> NULL n ->
        # range(0, NULL) unnests to nothing). A partial scrape record
        # must flow through, not crash the Python worker (r13
        # partial-records census: .strip() on None).
        if text is None:
            return
        # strip(" "), not strip(): SQL trim() removes SPACES only on
        # both engines, while Python's bare strip() removes all
        # whitespace - a tab/newline-edged document tokenizes
        # differently (one phantom empty token) under the two
        # semantics (r12 adversarial-text census). Space-only strip
        # matches the oracle's trim() exactly and is identical on
        # every real fixture.
        toks = re.split(r"\s+", text.strip(" ").lower())
        n = len(toks)
        for i in range((n + CHUNK_W - 1) // CHUNK_W):
            yield doc_id, i, min(CHUNK_W, n - i * CHUNK_W)


@query(
    "q126_chunk_udtf",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id,
             len(string_split_regex(trim(lower(text)), '\\s+')) AS n
      FROM documents
    ),
    ex AS (
      SELECT doc_id, n,
             unnest(range(0, (n + {CHUNK_W - 1}) // {CHUNK_W})) AS i
      FROM tk
    )
    SELECT doc_id,
           CAST(i AS BIGINT) AS chunk_idx,
           CAST(LEAST({CHUNK_W}, n - i * {CHUNK_W}) AS BIGINT) AS n_words
    FROM ex
    """,
)
def q126_chunk_udtf(spark, sf_dir):
    """Python UDTF through a LATERAL join: every document expands to
    its word-chunk rows (cf. q86's declarative packing - same domain,
    but exercising the ``@udtf`` API class end-to-end: registration,
    SQL lateral invocation, typed multi-row yield).

    The oracle recomputes chunk indexes and widths set-theoretically
    (LEAST of width and remainder), so the UDTF's imperative yield is
    value-checked, not just counted.

    Scale: UDTFs evaluate per input partition with Arrow transfer like
    any Python stage - map-only here, no shuffle; the lateral join is
    local generation, not a join exchange."""
    spark.udtf.register("wsep_chunk_words", ChunkWords)
    t(spark, sf_dir, "documents").createOrReplaceTempView("q126_docs")
    return spark.sql(
        "SELECT c.doc_id, c.chunk_idx, c.n_words "
        "FROM q126_docs d, LATERAL wsep_chunk_words(d.doc_id, d.text) c"
    )


# ---------------------------------------------------------------------------
# q243: mapInArrow byte-level scan (the fourth Python-eval flavor)
# ---------------------------------------------------------------------------


@query(
    "q243_arrow_byte_scan",
    oracle="""
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           CAST(length(text) - length(regexp_replace(lower(text),
                '[aeiou]', '', 'g')) AS BIGINT) AS n_vowels
    FROM documents
    """,
)
def q243_arrow_byte_scan(spark, sf_dir):
    """``mapInArrow`` scan - the fourth and lowest-level Python-eval
    flavor next to the suite's grouped-agg pandas_udf (q125), UDTF
    (q126) and mapInPandas (q60): the function receives raw
    ``pyarrow.RecordBatch``es with NO pandas conversion, the right
    tool when the per-batch work is pure columnar array math and the
    pandas layer would only add copies. Computes UTF-8 byte length
    and vowel counts via vectorized numpy over the Arrow buffers.

    Scale: map-only (zero shuffle), Arrow-batched both directions;
    per-batch cost is two vectorized passes over the strings. A
    production variant points the same shape at tokenizers or
    encoders that speak Arrow natively."""
    import numpy as np  # noqa: PLC0415
    import pyarrow as pa  # noqa: PLC0415

    from .common import t  # noqa: PLC0415

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")

    def scan(batches):
        for batch in batches:
            doc_id = batch.column("doc_id")
            text = batch.column("text")
            # bytes: cast utf8 -> binary, measure buffer lengths
            n_bytes = pa.compute.binary_length(
                text.cast(pa.binary())
            )
            low = np.asarray(
                pa.compute.utf8_lower(text).to_pandas(), dtype=object
            )
            # NULL text stays NULL: numpy's astype(str) would render
            # None as the literal "None" and count its two vowels
            # (r13 partial-records census) - mask first, re-null after.
            null_mask = np.array([x is None for x in low], dtype=bool)
            safe = np.where(null_mask, "", low).astype(str)
            n_vowels = np.zeros(len(low), dtype=np.int64)
            for v in "aeiou":
                n_vowels += np.char.count(safe, v)
            yield pa.RecordBatch.from_arrays(
                [
                    doc_id,
                    n_bytes.cast(pa.int64()),
                    pa.array(
                        [
                            None if m else int(c)
                            for m, c in zip(null_mask, n_vowels)
                        ],
                        type=pa.int64(),
                    ),
                ],
                names=["doc_id", "n_bytes", "n_vowels"],
            )

    return docs.mapInArrow(
        scan, schema="doc_id long, n_bytes long, n_vowels long"
    )


# ---------------------------------------------------------------------------
# q245: SQL-text entry point (spark.sql + temp view + LATERAL VIEW)
# ---------------------------------------------------------------------------


@query(
    "q245_sql_text_entry",
    oracle="""
    WITH tok AS (
      SELECT d.source, t.term
      FROM documents d,
           LATERAL unnest(string_split_regex(trim(lower(d.text)), '\\s+'))
             AS t(term)
    ),
    counts AS (
      SELECT source, term, COUNT(*) AS n FROM tok GROUP BY source, term
    ),
    ranked AS (
      SELECT source, term, n,
             RANK() OVER (PARTITION BY source ORDER BY n DESC, term) AS rk
      FROM counts
    )
    SELECT source, term, CAST(n AS BIGINT) AS n, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 3
    """,
)
def q245_sql_text_entry(spark, sf_dir):
    """Pure SQL-TEXT execution path: the whole query - LATERAL VIEW
    explode tokenization, grouped counts, ranked top-3 terms per
    source - submitted as one ``spark.sql`` statement over a
    registered temp view. Everything else in the suite builds plans
    through the DataFrame API; this pins the other half of the entry
    surface (the reference's ad-hoc `script.sql` workflow,
    /root/reference/script.sql:51-76) and proves the engine's SQL
    dialect covers generator expressions, window ranks and CTEs in
    text form. Catalyst compiles both APIs to the same plans, so the
    scale story is unchanged.

    The view name is session-scoped; registration is idempotent
    (createOrReplaceTempView)."""
    from .common import t  # noqa: PLC0415

    t(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents_q245"
    )
    return spark.sql(
        r"""
        WITH tok AS (
          SELECT source, term
          FROM documents_q245
          LATERAL VIEW explode(split(trim(lower(text)), '\\s+')) x AS term
        ),
        counts AS (
          SELECT source, term, COUNT(*) AS n FROM tok GROUP BY source, term
        ),
        ranked AS (
          SELECT source, term, n,
                 RANK() OVER (PARTITION BY source ORDER BY n DESC, term)
                   AS rk
          FROM counts
        )
        SELECT source, term, CAST(n AS BIGINT) AS n, CAST(rk AS BIGINT) AS rk
        FROM ranked WHERE rk <= 3
        """
    )


# ---------------------------------------------------------------------------
# q246: custom Python DataSource scan (Spark 4 DataSource API)
# ---------------------------------------------------------------------------

#: scan size and parallelism for the custom-source demonstration.
_PYDS_N = 100_000
_PYDS_PARTS = 8


@query(
    "q246_python_datasource",
    oracle=f"""
    SELECT (val % 10) AS val_bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(id) AS BIGINT) AS id_sum
    FROM (
      SELECT r.i AS id, (r.i * 2654435761) % 1000 AS val
      FROM range(0, {_PYDS_N}) r(i)
    )
    WHERE id >= {_PYDS_N // 2}
    GROUP BY 1
    """,
)
def q246_python_datasource(spark, sf_dir):
    """Scan through a CUSTOM PYTHON DATA SOURCE (Spark 4's DataSource
    API, `sources/pyds.py`): the source plans its own InputPartitions
    (8 parallel tasks), each executor-side ``read()``
    yields its slice, and the result flows into ordinary Catalyst
    operators (filter + grouped aggregate) like any table. This is the
    entry surface for wrapping non-file systems (crawl frontiers,
    feature stores, internal APIs) as scannable tables without JVM
    code; the source here is a seeded arithmetic sequence precisely so
    the DuckDB oracle can replicate it exactly.

    Scale: partition count is the parallelism dial; rows materialize
    only executor-side per split. The filter/aggregate above the scan
    are ordinary JVM operators - only row production is Python
    (Arrow-batched by the API)."""
    from ..sources.pyds import register  # noqa: PLC0415

    register(spark)
    df = (
        spark.read.format("wsep_range")
        .option("n", _PYDS_N)
        .option("parts", _PYDS_PARTS)
        .load()
    )
    return (
        df.filter(F.col("id") >= _PYDS_N // 2)
        .groupBy((F.col("val") % 10).alias("val_bucket"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("id").cast("long").alias("id_sum"),
        )
    )


# ---------------------------------------------------------------------------
# q247: custom Python STREAMING data source (offset-tracked micro-batches)
# ---------------------------------------------------------------------------

_PYDS_STREAM_N = 5000


@query(
    "q247_python_stream_source",
    oracle=f"""
    SELECT (val % 10) AS val_bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(id) AS BIGINT) AS id_sum
    FROM (
      SELECT r.i AS id, (r.i * 2654435761) % 1000 AS val
      FROM range(0, {_PYDS_STREAM_N}) r(i)
    )
    GROUP BY 1
    """,
)
def q247_python_stream_source(spark, sf_dir):
    """CUSTOM PYTHON STREAMING SOURCE (`sources/pyds.py`): a pure-
    Python reader that owns its own OFFSETS - ``initialOffset`` ->
    ``read(start) -> (iterator, next)`` per micro-batch, with
    ``readBetweenOffsets`` replaying committed spans on recovery (the
    exactly-once recovery contract). One ``availableNow`` drain pulls
    the full 5000-row deterministic sequence into a
    parquet sink (the oracle states its exact contents); the
    MULTI-RUN offset-resume behavior - repeated drains against one
    checkpoint, each advancing the cursor, no duplicates - is pinned
    by ``tests/test_python_datasource.py`` with a small batch size.
    This completes the entry-surface matrix: batch + streaming,
    file + JDBC + SQL text + custom Python.

    Scale: the offset protocol is the same one Kafka/Kinesis sources
    speak; the ``batch`` option bounds per-trigger memory and the
    aggregate downstream is ordinary Catalyst."""
    from ..sources.pyds import register_stream  # noqa: PLC0415
    from ..streaming.events_stream import _run_to_sink  # noqa: PLC0415

    register_stream(spark)
    s = (
        spark.readStream.format("wsep_range_stream")
        .option("n", _PYDS_STREAM_N)
        .load()
    )
    sunk = _run_to_sink(s, spark, "q247")
    return sunk.groupBy((F.col("val") % 10).alias("val_bucket")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("id").cast("long").alias("id_sum"),
    )


# ---------------------------------------------------------------------------
# q248: VARIANT semi-structured extraction (Spark 4 open variant type)
# ---------------------------------------------------------------------------


@query(
    "q248_variant_extraction",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS k_sum,
           CAST(MAX(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS k_max,
           CAST(SUM(CASE WHEN CAST(props->>'$.k' AS BIGINT) > 50
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_high
    FROM events GROUP BY event_type
    """,
)
def q248_variant_extraction(spark, sf_dir):
    """Semi-structured extraction through Spark 4's open VARIANT type:
    ``parse_json`` ingests the raw JSON payload once into the binary
    variant encoding, ``try_variant_get`` pulls typed paths lazily -
    the schema-on-read path that replaces per-query ``from_json``
    (q72) when payload schemas drift: parse once, store VARIANT,
    extract any path later without re-parsing, malformed values
    yielding NULL instead of failing the scan.

    Scale: parse + extract are per-row codegen'd expressions; the
    variant binary form is columnar-storable (the parquet variant
    spec), so at 100 TB the parse happens ONCE at ingest and every
    downstream extraction reads the binary encoding. The aggregate
    above is an ordinary |event_types|-key hash agg."""
    from .common import t  # noqa: PLC0415

    ev = t(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("k").cast("long").alias("k_sum"),
            F.max("k").cast("long").alias("k_max"),
            F.sum(F.when(F.col("k") > 50, 1).otherwise(0))
            .cast("long")
            .alias("n_high"),
        )
    )


# ---------------------------------------------------------------------------
# q250: SQL pipe syntax (Spark 4 |> operators)
# ---------------------------------------------------------------------------


@query(
    "q250_sql_pipe_syntax",
    oracle="""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS chars_total
    FROM documents
    WHERE lang = 'en'
    GROUP BY source
    HAVING COUNT(*) >= 5
    """,
)
def q250_sql_pipe_syntax(spark, sf_dir):
    """SQL PIPE syntax (Spark 4's ``|>`` operators, the linear query
    notation from Google's "SQL Has Problems" pipe-syntax proposal):
    the same filter -> aggregate -> having chain q's classic form
    writes inside-out, expressed top-to-bottom. Dialect-surface
    completeness next to q245's classic SQL text; Catalyst parses both
    to identical plans, so semantics and scale are unchanged - which
    the classic-form oracle verifies."""
    from .common import t  # noqa: PLC0415

    t(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents_q250"
    )
    return spark.sql(
        """
        FROM documents_q250
        |> WHERE lang = 'en'
        |> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n_docs,
                     CAST(SUM(n_chars) AS BIGINT) AS chars_total
           GROUP BY source
        |> WHERE n_docs >= 5
        |> SELECT source, n_docs, chars_total
        """
    )


# ---------------------------------------------------------------------------
# q251: collation-aware distinct (Spark 4 collated strings)
# ---------------------------------------------------------------------------


@query(
    "q251_collation_distinct",
    oracle=f"""
    WITH v AS (
      SELECT source, unnest([pre, initcap_pre]) AS variant
      FROM (
        SELECT source,
               array_to_string(list_slice({{toks}}, 1, 2), ' ') AS pre,
               -- DuckDB initcap-equivalent for 'word word' strings
               array_to_string(list_transform(
                 list_slice({{toks}}, 1, 2),
                 w -> upper(w[1]) || w[2:]), ' ') AS initcap_pre
        FROM documents
        -- a textless record has no collation variants (r13 census)
        WHERE text IS NOT NULL
      )
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_variants,
           CAST(COUNT(DISTINCT variant) AS BIGINT) AS n_binary_distinct,
           CAST(COUNT(DISTINCT lower(variant)) AS BIGINT)
             AS n_lcase_distinct
    FROM v GROUP BY source
    """.format(toks="string_split_regex(trim(lower(text)), '\\s+')"),
)
def q251_collation_distinct(spark, sf_dir):
    """COLLATED string semantics (Spark 4 collations): each document
    contributes its 2-token prefix in original and Initcap casing, and
    the per-source distinct count is taken twice - under UTF8_BINARY
    (case variants count separately) and under UTF8_LCASE via
    ``collate`` (case variants COLLAPSE, inside the ordinary
    COUNT DISTINCT operator, no lower() rewrite). Collation-aware
    comparison is what dedup/grouping over user-generated text needs
    without normalizing columns away; the oracle states the LCASE side
    as DuckDB's lower() equivalence.

    Scale: collation participates in hash/compare inside codegen -
    same aggregate plan, different comparator; no extra pass."""
    from .common import t  # noqa: PLC0415

    docs = t(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()  # textless: no variants (r13)
    )
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    pre = F.concat_ws(" ", F.slice(toks, 1, 2))
    v = docs.select(
        "source",
        F.explode(F.array(pre, F.initcap(pre))).alias("variant"),
    )
    return v.groupBy("source").agg(
        F.count("*").cast("long").alias("n_variants"),
        F.countDistinct("variant").cast("long").alias("n_binary_distinct"),
        F.countDistinct(F.collate(F.col("variant"), "UTF8_LCASE"))
        .cast("long")
        .alias("n_lcase_distinct"),
    )


# ---------------------------------------------------------------------------
# q273: custom Python DataSource WRITER (two-phase-commit sink)
# ---------------------------------------------------------------------------


@query(
    "q273_python_datasource_write",
    oracle="""
    SELECT event_id, user_id,
           CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS value_cents
    FROM events WHERE event_id % 100 = 0
    """,
)
def q273_python_datasource_write(spark, sf_dir):
    """WRITE through a custom Python data sink (the writer half of
    Spark 4's DataSource API - q246 covered the reader): each task
    streams its partition to a task-unique JSON-lines part and
    returns a commit message; the driver's ``commit`` publishes a
    manifest naming exactly the committed parts, so orphan files from
    failed tasks are never visible to readers (two-phase commit, the
    contract every cloud-native table format honors). The sink's
    production role is pushing curated slices to systems without JVM
    connectors - labeling queues, eval services, feature stores.

    The probe writes a deterministic 1-in-100 events slice (integer
    cents - no float ever serialized), reads back ONLY what the
    manifest names, and returns it; the oracle states the slice
    directly, so a dropped row, a double-committed part, or a
    phantom orphan file all surface as a value mismatch.

    Scale: the write is map-only (one Python task per partition,
    streaming iteration - no driver materialization); manifest size
    is one line per task. The sink writes through the local
    filesystem here (single-JVM test box); a cluster deployment
    points ``path`` at shared/object storage (fsspec URI) - the
    protocol (task part + driver manifest) is exactly what makes
    that swap safe, since visibility is decided by the manifest
    write alone."""
    import json as _json
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    from ..sources.pyds import register_sink  # noqa: PLC0415

    register_sink(spark)
    scratch = _tempfile.mkdtemp(prefix="wsep-q273-")
    try:
        slice_df = (
            t(spark, sf_dir, "events")
            .filter(F.col("event_id") % 100 == 0)
            .select(
                "event_id",
                "user_id",
                # floor(x*100 + 0.5), not ROUND: same r11 tie-class
                # hardening as q276 (identical input double -> the
                # floored cent is bit-identical on both engines)
                F.floor(F.col("value") * 100 + 0.5)
                .cast("long")
                .alias("value_cents"),
            )
        )
        (
            slice_df.write.format("wsep_jsonl_sink")
            .option("path", scratch)
            .mode("append")
            .save()
        )
        with open(_os.path.join(scratch, "_MANIFEST.json")) as fh:
            manifest = _json.load(fh)
        files = [_os.path.join(scratch, f) for f in manifest["files"]]
        out = spark.read.schema(
            "event_id long, user_id long, value_cents long"
        ).json(files)
        rows = out.collect()
        assert len(rows) == manifest["rows"]
        return spark.createDataFrame(rows, out.schema)
    finally:
        _shutil.rmtree(scratch, ignore_errors=True)


# ---------------------------------------------------------------------------
# q275: ANSI-safe dirty-data parsing (try_cast / try_divide)
# ---------------------------------------------------------------------------


@query(
    "q275_try_safe_parsing",
    oracle="""
    WITH raw AS (
      SELECT p_partkey,
             CAST(p_partkey % 6 AS BIGINT) AS variant,
             CASE CAST(p_partkey % 6 AS INTEGER)
               WHEN 0 THEN CAST(p_partkey AS VARCHAR)
               WHEN 1 THEN '  ' || CAST(p_partkey AS VARCHAR)
               WHEN 2 THEN CAST(p_partkey AS VARCHAR) || '.5'
               WHEN 3 THEN 'n/a'
               WHEN 4 THEN ''
               ELSE '99999999999999999999'
             END AS s
      FROM part
    ),
    parsed AS (
      SELECT variant,
             -- Spark's try_cast to BIGINT rejects decimal strings;
             -- DuckDB's TRY_CAST would ROUND them (42.5 -> 43), so
             -- the oracle states Spark's stricter semantics with a
             -- regex guard (overflow still handled by TRY_CAST).
             CASE WHEN trim(s) SIMILAR TO '[+-]?[0-9]+'
                  THEN TRY_CAST(trim(s) AS BIGINT) END AS i,
             TRY_CAST(s AS DOUBLE) AS d,
             100 / CAST(NULLIF(p_partkey % 3, 0) AS DOUBLE) AS q
      FROM raw
    )
    SELECT variant,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(i) AS BIGINT) AS n_int,
           CAST(COALESCE(SUM(i), 0) AS BIGINT) AS sum_int,
           CAST(COUNT(d) AS BIGINT) AS n_dbl,
           SUM(d) AS sum_dbl,
           CAST(COUNT(*) - COUNT(q) AS BIGINT) AS n_div_null
    FROM parsed GROUP BY variant
    """,
)
def q275_try_safe_parsing(spark, sf_dir):
    """ANSI-safe dirty-data parsing: Spark 4 runs in ANSI mode where a
    bad cast or a division by zero RAISES; the ``try_`` family
    (try_cast / try_divide) is how a cleaning pipeline expresses
    "parse what parses, NULL the rest" without abandoning ANSI
    safety everywhere else. Synthesized dirt covers every failure
    class: clean ints, padded ints (both engines trim), decimal
    strings (Spark's try_cast to BIGINT REJECTS these where DuckDB's
    would round - the oracle pins Spark's stricter reading with a
    regex guard), garbage, empties, and 20-digit overflow (NULL on
    both).

    sum_dbl is exact cross-engine: every parsed value is an integer
    or integer+0.5, so all partial sums are exactly representable
    and addition order cannot matter.

    Scale: a pure map stage + 6-key aggregate; try_cast compiles to
    the same codegen cast with a null-on-error flag - safety here is
    free, unlike the catch-per-row UDF it replaces."""
    part = t(spark, sf_dir, "part")
    v = (F.col("p_partkey") % 6).cast("int")
    ks = F.col("p_partkey").cast("string")
    s = (
        F.when(v == 0, ks)
        .when(v == 1, F.concat(F.lit("  "), ks))
        .when(v == 2, F.concat(ks, F.lit(".5")))
        .when(v == 3, F.lit("n/a"))
        .when(v == 4, F.lit(""))
        .otherwise(F.lit("99999999999999999999"))
    )
    parsed = part.select(
        (F.col("p_partkey") % 6).cast("long").alias("variant"),
        s.alias("s"),
        F.expr("try_divide(100, p_partkey % 3)").alias("q"),
    ).select(
        "variant",
        F.expr("try_cast(s AS BIGINT)").alias("i"),
        F.expr("try_cast(s AS DOUBLE)").alias("d"),
        "q",
    )
    return parsed.groupBy("variant").agg(
        F.count("*").cast("long").alias("n"),
        F.count("i").cast("long").alias("n_int"),
        F.coalesce(F.sum("i"), F.lit(0)).cast("long").alias("sum_int"),
        F.count("d").cast("long").alias("n_dbl"),
        F.sum("d").alias("sum_dbl"),
        (F.count("*") - F.count("q")).cast("long").alias("n_div_null"),
    )


# ---------------------------------------------------------------------------
# q276: SQL-defined functions (CREATE FUNCTION ... RETURN, Spark 4)
# ---------------------------------------------------------------------------


@query(
    "q276_sql_udfs",
    oracle="""
    WITH u AS (
      SELECT event_type,
             LEAST(GREATEST(value, 10.0), 400.0) AS clamped,
             GREATEST((CAST(FLOOR(LEAST(GREATEST(value, 10.0), 400.0)
                                  * 100 + 0.5) AS BIGINT) + 9999)
                      // 10000, 1) AS n_units
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(clamped), 2) AS sum_winsorized,
           CAST(SUM(n_units) AS BIGINT) AS n_units
    FROM u GROUP BY event_type
    """,
)
def q276_sql_udfs(spark, sf_dir):
    """SQL-DEFINED functions (Spark 4's ``CREATE FUNCTION ... RETURN``)
    - the reference's Postgres stored-procedure idiom
    (/root/reference/src/create_table.py's remaining-time procedure)
    has a genuine Spark-native analogue now: a scalar SQL UDF
    (winsorizing clamp) and a SQL TABLE function (value -> one row
    per started 100-unit block, lateral-joined), both defined in pure
    SQL, catalog-registered, and inlined by Catalyst into the calling
    plan - unlike a Python UDF there is NO language boundary at
    execution time. The oracle states the same expressions inline,
    so the function-resolution path itself is what gets value-checked.

    The block count is pure integer ((cents + 9999) DIV 10000) per
    the engine's float-boundary rule (tools/oracle_check.py --lint).
    Cents are FLOOR(value*100 + 0.5), not ROUND(value*100):
    preemptive hardening against the ROUND-tie class the r11 tri-SF
    sweep caught LIVE in q164 (a derived-ratio tie; no raw cent tie
    exists in any current fixture - probed at all three SFs) -
    multiply-add-floor on the identical input double is bit-identical
    on both engines and keeps the same half-up-for-positives meaning.
    The ACTUAL r11 sf0.1 catch here was the block count: Spark's
    ``sequence(1, 0)`` yields the DESCENDING [1, 0] (step defaults to
    -1), so each of sf0.1's six zero-cent events emitted two phantom
    unit rows through the lateral where DuckDB's SUM added 0. Fixed
    with GREATEST(..., 1) - every event occupies at least one unit -
    so the sequence bound is always ascending and the lateral is
    total (no event drops out of the inner join, so n_events and the
    winsorized sum keep covering every row on both engines).

    r13 extreme-census catch: units are computed from the CLAMPED
    value, not the raw one. The raw-value fan-out was LINEAR IN value
    - a 9e15 outlier meant 9e11 exploded unit rows and a bigint->INT
    cast overflow - while clamp-first bounds every lateral at <= 4
    rows BY CONSTRUCTION, the only scale-safe shape for an unbounded
    column. The clamp is inlined at the lateral call site because
    Spark rejects a SQL scalar UDF inside a SQLTableFunction argument
    (UNSUPPORTED_SQL_UDF_USAGE); wsep_clamp still resolves through
    the catalog in sum_winsorized.

    Scale: both functions dissolve into codegen expressions at plan
    time; the lateral expansion is local row generation. Cost is the
    one 6-key aggregate."""
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION wsep_clamp("
        "x DOUBLE, lo DOUBLE, hi DOUBLE) RETURNS DOUBLE "
        "RETURN least(greatest(x, lo), hi)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION wsep_unit_rows(v DOUBLE) "
        "RETURNS TABLE(unit INT) RETURN SELECT explode(sequence(1, "
        "CAST(GREATEST((CAST(FLOOR(v * 100 + 0.5) AS BIGINT) + 9999)"
        " DIV 10000, 1) AS INT)))"
    )
    t(spark, sf_dir, "events").createOrReplaceTempView("q276_events")
    return spark.sql(
        """
        SELECT e.event_type,
               CAST(COUNT(DISTINCT e.event_id) AS BIGINT) AS n_events,
               ROUND(SUM(CASE WHEN u.unit = 1
                         THEN wsep_clamp(e.value, 10.0, 400.0) END), 2)
                 AS sum_winsorized,
               CAST(COUNT(*) AS BIGINT) AS n_units
        FROM q276_events e,
             LATERAL wsep_unit_rows(
               least(greatest(e.value, 10.0), 400.0)) u
        GROUP BY e.event_type
        """
    )


# ---------------------------------------------------------------------------
# q277: session variables + modern SQL sugar (DECLARE VARIABLE, GROUP BY ALL)
# ---------------------------------------------------------------------------


@query(
    "q277_session_variables",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_over,
           ROUND(SUM(value), 2) AS sum_over
    FROM events
    WHERE value > 95.0 AND epoch_us(ts) % 7 = 3
    GROUP BY ALL
    """,
)
def q277_session_variables(spark, sf_dir):
    """SESSION VARIABLES (Spark 4 ``DECLARE VARIABLE`` / ``SET VAR``)
    parameterizing an analytics query, plus ``GROUP BY ALL`` - the
    parameterized-dashboard idiom: the threshold and a sampling
    residue live in typed session state instead of string-formatted
    SQL (no injection surface, plan cache reusable across values),
    and the grouping clause tracks the select list automatically.
    DuckDB's oracle inlines the same constants; both engines support
    GROUP BY ALL natively.

    Scale: variables fold to literals at plan time - the predicate
    reaches the parquet scan exactly as a hand-written constant
    would; nothing about the physical plan knows variables exist."""
    spark.sql(
        "DECLARE OR REPLACE VARIABLE wsep_value_thr DOUBLE DEFAULT 0.0"
    )
    spark.sql("DECLARE OR REPLACE VARIABLE wsep_residue BIGINT DEFAULT 0")
    spark.sql("SET VAR wsep_value_thr = 95.0")
    spark.sql("SET VAR wsep_residue = 3")
    t(spark, sf_dir, "events").createOrReplaceTempView("q277_events")
    return spark.sql(
        """
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_over,
               ROUND(SUM(value), 2) AS sum_over
        FROM q277_events
        WHERE value > wsep_value_thr AND ts_us % 7 = wsep_residue
        GROUP BY ALL
        """
    )


# ---------------------------------------------------------------------------
# q316: LATERAL correlated subquery (decorrelated to a window by Catalyst)
# ---------------------------------------------------------------------------


@query(
    "q316_lateral_topk_per_key",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           o.o_orderkey, o.o_totalprice
    FROM customer c,
         LATERAL (SELECT o_orderkey, o_totalprice
                  FROM orders
                  WHERE o_custkey = c.c_custkey
                  ORDER BY o_totalprice DESC, o_orderkey
                  LIMIT 2) o
    WHERE c.c_acctbal > 9000
    """,
)
def q316_lateral_topk_per_key(spark, sf_dir):
    """LATERAL correlated subquery in SQL text: each rich customer's
    two most expensive orders via a correlated ORDER BY ... LIMIT in
    the FROM clause - the SQL:1999 lateral-join surface (DuckDB/
    Postgres idiom) that Spark 4 accepts natively. Completes the
    entry-surface matrix next to q245 (LATERAL VIEW explode), q250
    (pipe syntax) and q276 (SQL-defined functions): a user porting
    lateral-join SQL runs it unchanged.

    Scale: the naive reading is a per-row subquery (one orders probe
    per customer - death at 100 TB); Catalyst's DecorrelateInnerQuery
    + RewriteLateralSubquery rewrite it to a JOIN + per-key
    WindowGroupLimit partial top-k, the same plan the handwritten
    window top-k (q204 family) produces - pinned by the plan audit
    (no BroadcastNestedLoopJoin, no cartesian). The customer filter
    prunes before the join on both engines."""
    from .common import t  # noqa: PLC0415

    t(spark, sf_dir, "customer").createOrReplaceTempView("customer_q316")
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_q316")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name,
               o.o_orderkey, o.o_totalprice
        FROM customer_q316 c,
             LATERAL (SELECT o_orderkey, o_totalprice
                      FROM orders_q316
                      WHERE o_custkey = c.c_custkey
                      ORDER BY o_totalprice DESC, o_orderkey
                      LIMIT 2) o
        WHERE c.c_acctbal > 9000
        """
    )
