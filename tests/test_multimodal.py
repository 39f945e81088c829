"""Multimodal plumbing: payload construction, mapInPandas decode batch
shape, frame sampling, and the real-codec stub gate."""

import pytest
from pyspark.sql import functions as F

from web_scraping_etl_pipeline_spark.multimodal.media import (
    decode_image_real,
    decode_media,
    media_table,
    sample_frames,
)

SF_DIR = "/root/testdata/sf0.001"


def test_payload_roundtrip(spark):
    media = media_table(spark, SF_DIR)
    row = media.orderBy("media_id").first()
    assert isinstance(row["payload"], (bytes, bytearray))
    assert bytes(row["payload"]).startswith(b"WSEP1;w=")
    assert row["n_bytes"] == len(row["payload"])
    assert row["mime"].split("/")[0] == row["media_type"]
    assert set(row["meta"]) == {"source", "lang"}


def test_decode_matches_header(spark):
    media = media_table(spark, SF_DIR)
    decoded = {r["media_id"]: r for r in decode_media(media).collect()}
    for r in media.select("media_id", "payload", "media_type").limit(20).collect():
        d = decoded[r["media_id"]]
        header = bytes(r["payload"]).split(b";", 4)
        assert d["width"] == int(header[1][2:])
        assert d["height"] == int(header[2][2:])
        assert d["media_type"] == r["media_type"]


def test_frame_sampling_video_only(spark):
    media = media_table(spark, SF_DIR)
    frames = sample_frames(media)
    per_media = {
        r["media_id"]: r["n"]
        for r in frames.groupBy("media_id").count().withColumnRenamed("count", "n").collect()
    }
    videos = {
        r["media_id"]: r["height"]
        for r in decode_media(media).filter("media_type = 'video'").collect()
    }
    assert set(per_media) == set(videos)
    for mid, h in videos.items():
        assert per_media[mid] == h % 7 + 1
    ts = frames.filter("media_id = %d" % next(iter(videos))).orderBy("frame_idx")
    assert [r["frame_ms"] for r in ts.collect()] == [
        500 * i for i in range(len(ts.collect()))
    ]


def test_real_codec_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        decode_image_real(b"\x89PNG...")


def test_resize_preserves_aspect_and_roundtrips(spark):
    """Resized payloads must (a) fit the 256px budget without
    upscaling, (b) preserve aspect ratio within integer-floor
    tolerance, and (c) remain decodable by the standard decoder with
    the NEW dimensions."""
    from web_scraping_etl_pipeline_spark.multimodal.media import (
        decode_media,
        media_table,
        resize_media,
    )

    media = media_table(spark, SF_DIR)
    out = resize_media(media, max_side=256).cache()
    assert out.filter(
        (F.col("new_width") > 256) | (F.col("new_height") > 256)
    ).count() == 0
    orig = decode_media(media).select(
        "media_id", "width", "height"
    )
    j = out.join(orig, "media_id")
    # no upscale: resized rows shrank, un-resized kept exact dims
    assert j.filter(
        (~F.col("resized"))
        & (
            (F.col("new_width") != F.col("width"))
            | (F.col("new_height") != F.col("height"))
        )
    ).count() == 0
    assert j.filter(
        F.col("resized")
        & (
            (F.col("new_width") > F.col("width"))
            | (F.col("new_height") > F.col("height"))
        )
    ).count() == 0
    # aspect preserved to integer floor: |nw*h - nh*w| <= max(w, h)
    bad_aspect = j.filter(
        F.abs(
            F.col("new_width") * F.col("height")
            - F.col("new_height") * F.col("width")
        )
        > F.greatest("width", "height")
    )
    assert bad_aspect.count() == 0
    # re-decode the rewritten payload: decoder sees the new dims
    redecoded = decode_media(
        out.select("media_id", "payload")
    ).select(
        F.col("media_id").alias("rid"),
        F.col("width").alias("rw"),
        F.col("height").alias("rh"),
    )
    rj = out.join(redecoded, out.media_id == F.col("rid"))
    assert rj.filter(
        (F.col("new_width") != F.col("rw"))
        | (F.col("new_height") != F.col("rh"))
    ).count() == 0


def test_real_codec_decodes_png(spark):
    """Exercised only where an imaging library exists: round-trip real
    PNG bytes through the deploy-grade decode path and check the
    decoded dimensions. Skips in the shipped container (no Pillow)."""
    pytest.importorskip("PIL")
    import io

    import PIL.Image

    from web_scraping_etl_pipeline_spark.multimodal.media import (
        decode_image_real,
        decode_media_real,
    )

    def png(w, h):
        buf = io.BytesIO()
        PIL.Image.new("RGB", (w, h)).save(buf, format="PNG")
        return buf.getvalue()

    assert decode_image_real(png(12, 34))[:2] == (12, 34)

    rows = [(1, png(8, 9)), (2, png(20, 10)), (3, b"not an image")]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {
        r["media_id"]: (r["width"], r["height"])
        for r in decode_media_real(media).collect()
    }
    assert out == {1: (8, 9), 2: (20, 10)}  # corrupt row 3 skipped
