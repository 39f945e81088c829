"""Media suite: binary payload columns + Pandas-UDF decode stages.

Data contract
-------------
``media_table`` derives a deterministic media table from ``documents``
(the container has no real image/audio files): each document becomes a
media row whose ``payload`` is a binary blob with a parseable ASCII
header followed by the document body::

    WSEP1;w=<width>;h=<height>;t=<media_type>;<body bytes...>

Width/height/type are pure functions of ``doc_id``, so the DuckDB
oracle can recompute everything the decoder extracts - the decode
*plumbing* (mapInPandas over Arrow batches, explicit output schema,
partition-preserving map stage) is exercised for real, while the codec
itself is a deterministic fake. A production deployment swaps
``_parse_header`` for a real codec (see :func:`decode_image_real`) and
nothing else changes: same schema, same batch shape, same plan.

Scale design: decode is a *map-only* stage - no shuffle, no driver
data. ``mapInPandas`` streams Arrow batches through Python once;
downstream filters/joins stay JVM-side. At 100 TB the payload column
dominates I/O, so every query below prunes it immediately after decode
(``ReadSchema`` keeps payload out of scans that only need metadata).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..plans.common import t
from ..plans.registry import query

#: header magic + deterministic dimension formulas (shared with oracles).
MAGIC = "WSEP1"
W_MUL, W_MOD, W_MIN = 37, 1857, 64
H_MUL, H_MOD, H_MIN = 53, 1017, 64
TYPES = ("image", "audio", "video")
MIMES = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}

DECODED = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("body_bytes", T.LongType()),
    ]
)

FRAMES = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_ms", T.LongType()),
    ]
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> media rows (media_id, payload, media_type, mime,
    n_bytes, meta). Payload built JVM-side (no UDF on the encode path).

    A NULL text yields NO media row: there is no payload to ingest,
    and letting the NULL propagate would hand the Pandas-UDF decoders
    a None where the schema says binary (r13 partial-records census:
    'cannot convert NoneType object to bytes' in every media query).
    The ingestion boundary is where partial records drop, exactly as
    a real media pipeline rejects an empty blob at landing."""
    docs = t(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    did = F.col("doc_id")
    width = (did * W_MUL) % W_MOD + W_MIN
    height = (did * H_MUL) % H_MOD + H_MIN
    mtype = F.element_at(F.array(*[F.lit(x) for x in TYPES]), (did % 3 + 1).cast("int"))
    header = F.concat(
        F.lit(MAGIC + ";w="), width, F.lit(";h="), height,
        F.lit(";t="), mtype, F.lit(";"),
    )
    payload = F.encode(F.concat(header, F.col("text")), "UTF-8")
    mime = F.element_at(
        F.create_map(*[F.lit(x) for kv in MIMES.items() for x in kv]), mtype
    )
    return docs.select(
        did.alias("media_id"),
        payload.alias("payload"),
        mtype.alias("media_type"),
        mime.alias("mime"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.create_map(
            F.lit("source"), F.col("source"), F.lit("lang"), F.col("lang")
        ).alias("meta"),
    )


def _parse_header(payload: bytes) -> tuple[int, int, str, int]:
    """The deterministic fake codec: parse the ASCII header."""
    magic, w, h, mt, body = payload.split(b";", 4)
    assert magic == MAGIC.encode(), "corrupt media payload"
    return int(w[2:]), int(h[2:]), mt[2:].decode(), len(body)


def decode_image_real(payload: bytes) -> tuple[int, int, str, int]:
    """Real-codec hook: decode an actual image payload with Pillow.

    Returns the same tuple shape as :func:`_parse_header`
    ``(width, height, media_type, body_bytes)`` so a deployment swaps
    it into :func:`decode_media`'s closure without touching schema or
    plan shape. Guarded by an optional import: the test container
    ships no imaging library, so the pytest that exercises this
    (tests/test_multimodal.py::test_real_codec_decodes_png) skips
    unless Pillow is installed.
    """
    try:
        import PIL.Image  # noqa: PLC0415
    except ImportError as exc:
        raise NotImplementedError(
            "real image decode needs an imaging library (e.g. Pillow); "
            "this environment uses the deterministic header codec instead"
        ) from exc
    import io  # noqa: PLC0415

    with PIL.Image.open(io.BytesIO(payload)) as img:
        return img.width, img.height, "image", len(payload)


def decode_media_real(media: DataFrame) -> DataFrame:
    """The deploy-grade twin of :func:`decode_media`: same mapInPandas
    batch shape and DECODED schema, but each payload goes through the
    REAL codec (:func:`decode_image_real`). Corrupt payloads are
    skipped (0 rows emitted), which is why the decode stage is
    mapInPandas and not a 1:1 scalar UDF. Requires Pillow on the
    executors; not registered as a query in this container."""

    def batches(it: Iterator) -> Iterator:
        import io  # noqa: PLC0415

        import PIL.Image  # noqa: PLC0415

        for pdf in it:
            rows: dict[str, list] = {
                "media_id": [], "width": [], "height": [],
                "media_type": [], "body_bytes": [],
            }
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                try:
                    with PIL.Image.open(io.BytesIO(bytes(p))) as img:
                        w, h = img.width, img.height
                except Exception:  # corrupt payload: skip, don't fail
                    continue
                rows["media_id"].append(mid)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["media_type"].append("image")
                rows["body_bytes"].append(len(bytes(p)))
            import pandas as pd  # noqa: PLC0415

            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "media_type",
                    "body_bytes",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(batches, DECODED)


def decode_media(media: DataFrame) -> DataFrame:
    """Arrow-batched decode: binary payload -> typed metadata.

    ``mapInPandas`` so a real codec can emit 0..n rows per input
    (corrupt-skip, multi-page) - the general decode batch shape, not a
    1:1 scalar UDF.
    """

    magic = MAGIC.encode()

    # NOTE: the parse logic is inlined (not a call to the module-level
    # _parse_header) so cloudpickle ships the closure BY VALUE - Python
    # workers must not need this package importable on their own path.
    # Parallelism note: this Python-bound stage runs one worker per
    # input partition. A multi-split table (the 100 TB case) fans out
    # from the scan itself; a single small parquet split stays on one
    # worker, which measured FASTER here than forcing a repartition
    # (payloads are small; the shuffle + extra Arrow batching cost more
    # than the serial decode). Callers with big single-file inputs
    # should repartition upstream.
    def batches(it: Iterator) -> Iterator:
        for pdf in it:
            out = pdf[["media_id"]].copy()
            cols: dict[str, list] = {
                "width": [], "height": [], "media_type": [], "body_bytes": []
            }
            for p in pdf["payload"]:
                m, w, h, mt, body = bytes(p).split(b";", 4)
                assert m == magic, "corrupt media payload"
                cols["width"].append(int(w[2:]))
                cols["height"].append(int(h[2:]))
                cols["media_type"].append(mt[2:].decode())
                cols["body_bytes"].append(len(body))
            for k, v in cols.items():
                out[k] = v
            yield out

    return media.select("media_id", "payload").mapInPandas(batches, DECODED)


def sample_frames(media: DataFrame, fps_ms: int = 500) -> DataFrame:
    """Frame sampling for video payloads: one row per sampled frame.

    Frame count is header-deterministic (height % 7 + 1 fake "duration");
    a real pipeline replaces the count with the container's stream
    metadata. Emitting a *variable* number of rows per input is exactly
    what ``mapInPandas`` allows and a scalar pandas_udf does not.
    """

    # self-contained closure (value-pickled; see decode_media NOTE).
    def batches(it: Iterator) -> Iterator:
        rows: dict[str, list] = {"media_id": [], "frame_idx": [], "frame_ms": []}
        for pdf in it:
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                _, _, h, mt, _ = bytes(payload).split(b";", 4)
                if mt[2:] != b"video":
                    continue
                for i in range(int(h[2:]) % 7 + 1):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["frame_ms"].append(i * fps_ms)
        import pandas as pd

        yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_ms"])

    return media.select("media_id", "payload").mapInPandas(batches, FRAMES)


# ---------------------------------------------------------------------------
# oracle-checked queries (q60+)
# ---------------------------------------------------------------------------

_DIMS_SQL = f"""
      SELECT doc_id AS media_id,
             (doc_id * {W_MUL}) % {W_MOD} + {W_MIN} AS width,
             (doc_id * {H_MUL}) % {H_MOD} + {H_MIN} AS height,
             ['image','audio','video'][CAST(doc_id % 3 AS INTEGER) + 1]
               AS media_type,
             octet_length(encode(text)) AS body_bytes
      FROM documents
      WHERE text IS NOT NULL
"""


@query(
    "q60_media_decode",
    oracle=f"""
    SELECT media_id, CAST(width AS BIGINT) AS width,
           CAST(height AS BIGINT) AS height, media_type,
           CAST(body_bytes AS BIGINT) AS body_bytes
    FROM ({_DIMS_SQL})
    """,
)
def q60_media_decode(spark, sf_dir):
    """Decode dimensions/type from the binary payload via mapInPandas;
    the oracle recomputes the header formulas relationally."""
    return decode_media(media_table(spark, sf_dir))


@query(
    "q61_media_aspect_filter",
    oracle=f"""
    SELECT media_id, CAST(width AS BIGINT) AS width,
           CAST(height AS BIGINT) AS height,
           ROUND(CAST(width AS DOUBLE) / height, 4) AS aspect
    FROM ({_DIMS_SQL})
    WHERE media_type = 'image'
      AND CAST(width AS DOUBLE) / height BETWEEN 0.75 AND 1.8
    """,
)
def q61_media_aspect_filter(spark, sf_dir):
    """Typical curation filter: keep images with a sane aspect ratio.
    Decode once (Python), then filter JVM-side on the typed columns."""
    d = decode_media(media_table(spark, sf_dir))
    aspect = F.col("width").cast("double") / F.col("height")
    return (
        d.filter(
            (F.col("media_type") == "image") & aspect.between(0.75, 1.8)
        )
        .select(
            "media_id", "width", "height", F.round(aspect, 4).alias("aspect")
        )
    )


@query(
    "q62_media_embedding_join",
    oracle=f"""
    SELECT d.media_id, d.media_type, e.label,
           ROUND(sqrt(list_sum(list_transform(e.embedding,
                                              x -> CAST(x AS DOUBLE) *
                                                   CAST(x AS DOUBLE)))), 4)
             AS emb_norm
    FROM ({_DIMS_SQL}) d JOIN embeddings e ON d.media_id = e.vec_id
    WHERE d.media_type <> 'audio'
    """,
)
def q62_media_embedding_join(spark, sf_dir):
    """Join decoded media metadata to the embedding table (caption/
    visual-embedding association) - decoded dims (Python stage) flow
    into a JVM-side equi-join + vector-norm expression."""
    d = decode_media(media_table(spark, sf_dir)).filter(
        F.col("media_type") != "audio"
    )
    emb = t(spark, sf_dir, "embeddings")
    # unrolled codegen dot (see plans/vectors._dot) - the aggregate-fold
    # form ran this projection interpreted.
    from ..plans.vectors import _dot

    norm = F.sqrt(_dot("embedding", "embedding"))
    return d.join(emb, d["media_id"] == emb["vec_id"]).select(
        "media_id", "media_type", "label", F.round(norm, 4).alias("emb_norm")
    )


@query(
    "q63_media_frame_sample",
    oracle=f"""
    WITH f AS (
      SELECT media_id, unnest(range(0, height % 7 + 1)) AS i
      FROM ({_DIMS_SQL}) WHERE media_type = 'video'
    )
    SELECT media_id, CAST(i AS BIGINT) AS frame_idx,
           CAST(i * 500 AS BIGINT) AS frame_ms
    FROM f
    """,
)
def q63_media_frame_sample(spark, sf_dir):
    """Frame sampling: variable rows-per-input through mapInPandas (the
    UDTF-shaped decode path); oracle uses a lateral series join."""
    return sample_frames(media_table(spark, sf_dir))


#: perceptual-hash width (48 bits: clear of the int64 sign bit, and
#: SUM of distinct powers of two == bitwise OR, so both engines can
#: build the hash with plain integer arithmetic).
PHASH_BITS = 48


@query(
    "q159_media_phash_dedup",
    oracle=f"""
    WITH ph AS (
      SELECT doc_id AS media_id,
             -- BYTE parity, not character parity: the Spark side
             -- hashes the payload's UTF-8 BODY BYTES, and on
             -- multi-byte text (the reference's own Vietnamese
             -- diacritics - r12 adversarial-text census) byte count
             -- and byte values differ from codepoints. hex(encode())
             -- exposes byte k's low nibble at hex position 2k+2;
             -- parity of the byte = parity of its low nibble.
             -- Identical to the old ord(substr(text,...)) formula on
             -- ASCII corpora (byte == codepoint there).
             (SELECT CAST(SUM(
                 CASE WHEN substr(hex(encode(d.text)),
                        2 * ((j.j * 7) % octet_length(encode(d.text)))
                          + 2, 1)
                      IN ('1', '3', '5', '7', '9', 'B', 'D', 'F')
                 THEN CAST(pow(2, j.j) AS BIGINT) ELSE 0 END
               ) AS BIGINT)
              FROM range(0, {PHASH_BITS}) j(j)) AS phash
      FROM documents d WHERE octet_length(encode(d.text)) > 0
    )
    SELECT phash,
           CAST(COUNT(*) AS BIGINT) AS n_media,
           CAST(MIN(media_id) AS BIGINT) AS keep_id
    FROM ph GROUP BY phash
    """,
)
def q159_media_phash_dedup(spark, sf_dir):
    """Perceptual-hash dedup over the binary media payloads: an
    Arrow-batched Pandas UDF decodes each payload's body and distills a
    PHASH_BITS (48)-bit content signature (bit j samples the parity of a
    deterministic body byte); identical signatures collapse in one
    groupBy - the image-dedup shape (pHash/aHash) where byte-identical
    files (q40's digest dedup) is too strict but full similarity search
    is too expensive.

    The pHash here samples the fake codec's body (cf. module
    docstring); a deployment swaps the sampling loop for a real DCT
    pHash over decoded pixels - schema, batch shape, and the relational
    stage are unchanged. Scale: decode+hash is map-only over binary
    columns (PHASH_BITS (48) byte probes per payload, no pixel buffer kept),
    and the shuffle carries 8-byte signatures."""
    media = media_table(spark, sf_dir)

    n_bits = PHASH_BITS

    def phash(batches: Iterator) -> Iterator:
        # self-contained closure (value-pickled; see decode_media NOTE)
        import pandas as pd

        for pdf in batches:
            ids, hashes = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                body = bytes(payload).split(b";", 4)[4]
                if not body:
                    continue
                n = len(body)
                h = 0
                for j in range(n_bits):
                    h |= (body[(j * 7) % n] & 1) << j
                ids.append(mid)
                hashes.append(h)
            yield pd.DataFrame({"media_id": ids, "phash": hashes})

    sig = media.select("media_id", "payload").mapInPandas(
        phash, "media_id long, phash long"
    )
    return sig.groupBy("phash").agg(
        F.count("*").alias("n_media"),
        F.min("media_id").alias("keep_id"),
    )


RESIZED = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("new_width", T.LongType()),
        T.StructField("new_height", T.LongType()),
        T.StructField("resized", T.BooleanType()),
        T.StructField("out_bytes", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resize_media(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Arrow-batched resize: fit each payload within ``max_side`` on its
    longer edge, aspect-preserving, never upscaling - emitting the
    REWRITTEN payload (new header + body) alongside the new typed
    dimensions, i.e. the full decode -> transform -> re-encode loop a
    real image pipeline runs, with the codec faked by the header
    format (a deployment swaps in Pillow inside the same batch
    function; schema, batching, and plan shape stay identical).

    The scaling math is all-integer (``new_w = w * max_side DIV
    max(w, h)``), so the relational oracle reproduces it exactly."""

    magic = MAGIC.encode()

    def batches(it: Iterator) -> Iterator:
        for pdf in it:
            rows: dict[str, list] = {
                "media_id": [], "new_width": [], "new_height": [],
                "resized": [], "out_bytes": [], "payload": [],
            }
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                m, w, h, mt, body = bytes(p).split(b";", 4)
                assert m == magic, "corrupt media payload"
                w, h = int(w[2:]), int(h[2:])
                long_side = max(w, h)
                if long_side > max_side:
                    nw = w * max_side // long_side
                    nh = h * max_side // long_side
                    did_resize = True
                else:
                    nw, nh = w, h
                    did_resize = False
                out = (
                    f"{MAGIC};w={nw};h={nh};t={mt[2:].decode()};"
                ).encode() + body
                rows["media_id"].append(mid)
                rows["new_width"].append(nw)
                rows["new_height"].append(nh)
                rows["resized"].append(did_resize)
                rows["out_bytes"].append(len(out))
                rows["payload"].append(out)
            import pandas as pd

            yield pd.DataFrame(rows)

    return media.select("media_id", "payload").mapInPandas(batches, RESIZED)


@query(
    "q185_media_resize",
    oracle=f"""
    WITH dims AS ({_DIMS_SQL}),
    scaled AS (
      SELECT media_id, width, height, media_type, body_bytes,
             CASE WHEN greatest(width, height) > 256
                  THEN width * 256 // greatest(width, height)
                  ELSE width END AS new_width,
             CASE WHEN greatest(width, height) > 256
                  THEN height * 256 // greatest(width, height)
                  ELSE height END AS new_height,
             greatest(width, height) > 256 AS resized
      FROM dims
    )
    SELECT media_id, CAST(new_width AS BIGINT) AS new_width,
           CAST(new_height AS BIGINT) AS new_height, resized,
           CAST(octet_length(encode(
                  '{MAGIC};w=' || new_width || ';h=' || new_height
                  || ';t=' || media_type || ';'))
                + body_bytes AS BIGINT) AS out_bytes
    FROM scaled
    """,
)
def q185_media_resize(spark, sf_dir):
    """Resize-to-budget over the media table (fit 256px, aspect
    preserved, no upscale) through the real mapInPandas re-encode
    path; the oracle reproduces the integer scaling and the rewritten
    payload's byte length relationally, so the check covers the
    Python codec loop end to end (dimensions AND serialized size).

    Scale: decode/resize/re-encode is embarrassingly parallel over
    payload partitions - the Arrow batch transfer is the only
    overhead, and the JVM never inspects the binary column."""
    out = resize_media(media_table(spark, sf_dir))
    return out.select(
        "media_id", "new_width", "new_height", "resized", "out_bytes"
    )
