"""Independent replay references, round 10 batch AF: the MULTIMODAL
family. The media queries run a deterministic header codec through
real mapInPandas/mapInArrow plumbing, and their DuckDB twins restate
the header FORMULAS relationally - a formula error made once would
pass both. Each test here re-encodes the payload from the raw
documents table in pure Python (bytes, not SQL), re-parses it with an
independent parser, and pins the Spark result.

q60 decode, q61 aspect filter, q62 embedding join, q63 frame
sampling, q159 perceptual-hash dedup, q185 integer resize +
re-encoded byte size, q243 mapInArrow byte/vowel scan.
"""

from __future__ import annotations

import math

import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR

# header formulas (multimodal/media.py:37-41)
MAGIC = "WSEP1"
W_MUL, W_MOD, W_MIN = 37, 1857, 64
H_MUL, H_MOD, H_MIN = 53, 1017, 64
TYPES = ("image", "audio", "video")
PHASH_BITS = 48
MAX_SIDE = 256


def _q(spark, name):
    from __spark_entry__ import queries

    return queries()[name](spark, SF_DIR)


def _docs():
    t = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    )
    return list(
        zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist())
    )


def _payload(doc_id: int, text: str) -> bytes:
    """Re-encode the media payload exactly as media_table does, but in
    pure Python bytes (the engine builds it with JVM concat/encode)."""
    w = (doc_id * W_MUL) % W_MOD + W_MIN
    h = (doc_id * H_MUL) % H_MOD + H_MIN
    mt = TYPES[doc_id % 3]
    return f"{MAGIC};w={w};h={h};t={mt};".encode() + text.encode("utf-8")


def _parse(payload: bytes):
    """Independent parser: split on the first 4 ';' separators."""
    magic, w, h, mt, body = payload.split(b";", 4)
    assert magic == MAGIC.encode()
    return int(w[2:]), int(h[2:]), mt[2:].decode(), body


@pytest.fixture(scope="module")
def decoded():
    """doc_id -> (width, height, media_type, body bytes) via the
    encode->parse round trip."""
    return {
        did: _parse(_payload(did, text)) for did, text in _docs()
    }


# ---------------------------------------------------------------------------
# q60: decode
# ---------------------------------------------------------------------------


def test_q60_decode_matches_round_trip(spark, decoded):
    got = {
        int(r["media_id"]): (
            int(r["width"]),
            int(r["height"]),
            r["media_type"],
            int(r["body_bytes"]),
        )
        for r in _q(spark, "q60_media_decode").collect()
    }
    exp = {
        did: (w, h, mt, len(body))
        for did, (w, h, mt, body) in decoded.items()
    }
    assert got == exp


# ---------------------------------------------------------------------------
# q61: aspect-ratio curation filter
# ---------------------------------------------------------------------------


def test_q61_aspect_filter_keeps_sane_images(spark, decoded):
    exp = {}
    for did, (w, h, mt, _) in decoded.items():
        if mt == "image" and 0.75 <= w / h <= 1.8:
            exp[did] = (w, h, w / h)
    got = {
        int(r["media_id"]): r
        for r in _q(spark, "q61_media_aspect_filter").collect()
    }
    assert set(got) == set(exp)
    for did, (w, h, aspect) in exp.items():
        r = got[did]
        assert int(r["width"]) == w and int(r["height"]) == h
        assert r["aspect"] == pytest.approx(aspect, abs=5.1e-5)


# ---------------------------------------------------------------------------
# q62: decoded media -> embedding join, L2 norm
# ---------------------------------------------------------------------------


def test_q62_embedding_join_matches_python_norms(spark, decoded):
    emb = pq.read_table(
        f"{SF_DIR}/embeddings.parquet",
        columns=["vec_id", "embedding", "label"],
    )
    vecs = {
        vid: (v, lbl)
        for vid, v, lbl in zip(
            emb.column("vec_id").to_pylist(),
            emb.column("embedding").to_pylist(),
            emb.column("label").to_pylist(),
        )
    }
    exp = {}
    for did, (_, _, mt, _) in decoded.items():
        if mt != "audio" and did in vecs:
            v, lbl = vecs[did]
            exp[did] = (mt, lbl, math.sqrt(sum(float(x) ** 2 for x in v)))
    got = {
        int(r["media_id"]): r
        for r in _q(spark, "q62_media_embedding_join").collect()
    }
    assert set(got) == set(exp)
    for did, (mt, lbl, norm) in exp.items():
        r = got[did]
        assert r["media_type"] == mt and int(r["label"]) == lbl
        assert r["emb_norm"] == pytest.approx(norm, abs=5.1e-5)


# ---------------------------------------------------------------------------
# q63: frame sampling (variable rows per video)
# ---------------------------------------------------------------------------


def test_q63_frame_sample_expands_videos_only(spark, decoded):
    exp = set()
    for did, (_, h, mt, _) in decoded.items():
        if mt == "video":
            for i in range(h % 7 + 1):
                exp.add((did, i, i * 500))
    rows = _q(spark, "q63_media_frame_sample").collect()
    got = [
        (int(r["media_id"]), int(r["frame_idx"]), int(r["frame_ms"]))
        for r in rows
    ]
    assert len(got) == len(set(got))
    assert set(got) == exp


# ---------------------------------------------------------------------------
# q159: perceptual-hash dedup
# ---------------------------------------------------------------------------


def test_q159_phash_groups_match_bit_probe_loop(spark, decoded):
    groups: dict[int, list[int]] = {}
    for did, (_, _, _, body) in decoded.items():
        if not body:
            continue
        n = len(body)
        ph = 0
        for j in range(PHASH_BITS):
            ph |= (body[(j * 7) % n] & 1) << j
        groups.setdefault(ph, []).append(did)
    exp = {
        ph: (len(ids), min(ids)) for ph, ids in groups.items()
    }
    got = {
        int(r["phash"]): (int(r["n_media"]), int(r["keep_id"]))
        for r in _q(spark, "q159_media_phash_dedup").collect()
    }
    assert got == exp


# ---------------------------------------------------------------------------
# q185: resize-to-budget (integer scaling + re-encoded size)
# ---------------------------------------------------------------------------


def test_q185_resize_math_and_reencoded_bytes(spark, decoded):
    exp = {}
    for did, (w, h, mt, body) in decoded.items():
        long_side = max(w, h)
        if long_side > MAX_SIDE:
            nw, nh, rz = (
                w * MAX_SIDE // long_side,
                h * MAX_SIDE // long_side,
                True,
            )
        else:
            nw, nh, rz = w, h, False
        out = f"{MAGIC};w={nw};h={nh};t={mt};".encode() + body
        exp[did] = (nw, nh, rz, len(out))
    got = {
        int(r["media_id"]): (
            int(r["new_width"]),
            int(r["new_height"]),
            bool(r["resized"]),
            int(r["out_bytes"]),
        )
        for r in _q(spark, "q185_media_resize").collect()
    }
    assert got == exp
    # never upscale, always fit the budget
    for nw, nh, _, _ in got.values():
        assert max(nw, nh) <= max(MAX_SIDE, 1857 + 64)
        if max(nw, nh) > MAX_SIDE:
            pytest.fail("resized payload exceeds the side budget")


# ---------------------------------------------------------------------------
# q243: mapInArrow byte/vowel scan
# ---------------------------------------------------------------------------


def test_q243_arrow_scan_matches_python_byte_count(spark):
    exp = {
        did: (
            len(text.encode("utf-8")),
            sum(text.lower().count(v) for v in "aeiou"),
        )
        for did, text in _docs()
    }
    got = {
        int(r["doc_id"]): (int(r["n_bytes"]), int(r["n_vowels"]))
        for r in _q(spark, "q243_arrow_byte_scan").collect()
    }
    assert got == exp
