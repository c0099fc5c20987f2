"""Multimodal plumbing tests (SURVEY.md §2 C12)."""

from __future__ import annotations

import pytest

import mapreduceimplementation_spark as eng
from mapreduceimplementation_spark.operators.multimodal import _decode_media

eng.load_all_operators()


def test_decode_stub_parses_bytes():
    meta = _decode_media(b"image:AB rest of payload")
    assert meta["kind"] == "image"
    assert meta["width"] == ord("A") * 4 and meta["height"] == ord("B") * 4
    assert meta["size_chars"] == len("image:AB rest of payload")
    audio = _decode_media(b"audio:xyz")
    assert audio["duration_ms"] == len("audio:xyz") * 10
    assert audio["width"] is None


def test_decode_is_encoding_independent():
    """Character arithmetic: a non-ASCII payload yields the same metadata
    the SQL oracle (which counts characters/code points) computes —
    multi-byte UTF-8 must not skew sizes or checksums."""
    payload = "image:éé café".encode("utf-8")
    meta = _decode_media(payload)
    content = "image:éé café"
    assert meta["size_chars"] == len(content)  # chars, not len(payload) bytes
    assert meta["checksum"] == sum(ord(c) for c in content[:16]) % 997
    assert meta["width"] == ord("é") * 4  # code point 233, not a UTF-8 byte
    # 1-char image body: height index past the end -> 0 (DuckDB ascii(''))
    assert _decode_media(b"image:X")["height"] == 0


def test_decode_refuses_real_containers():
    """Real container formats must fail loudly, not silently mis-decode."""
    with pytest.raises(NotImplementedError):
        _decode_media(b"\x89PNG\r\n\x1a\n....")
    with pytest.raises(NotImplementedError):
        _decode_media(b"RIFF....WAVE")


def test_multimodal_meta_kinds_partition(spark, sf_dir):
    out = eng.QUERIES["multimodal_meta"](spark, sf_dir).toPandas()
    assert set(out["kind"]) == {"image", "audio", "video"}
    img = out[out["kind"] == "image"]
    assert img["width"].notna().all() and img["duration_ms"].isna().all()
    aud = out[out["kind"] == "audio"]
    assert aud["duration_ms"].notna().all() and aud["width"].isna().all()


def test_framesample_stub_chunks_and_strides():
    """Frames are 100-char chunks of the decoded content, sampled every
    5th, with checksum/thumb dims derived from the frame characters."""
    from mapreduceimplementation_spark.operators.multimodal import _sample_frames

    body = "".join(chr(65 + (i % 26)) for i in range(994))  # content = 1000 chars
    frames = _sample_frames(b"video:" + body.encode())
    assert [f["frame_idx"] for f in frames] == [0, 5]
    f0 = frames[0]
    content = "video:" + body
    frame0 = content[:100]
    assert f0["frame_checksum"] == sum(ord(c) for c in frame0[:16]) % 997
    assert f0["thumb_w"] == ord(frame0[0]) % 64 + 1
    # short payloads (< one frame) produce no rows
    assert _sample_frames(b"video:tiny") == []


def test_framesample_refuses_real_containers():
    from mapreduceimplementation_spark.operators.multimodal import _sample_frames

    with pytest.raises(NotImplementedError):
        _sample_frames(b"\x00\x00\x00\x18ftypmp42....")


def test_framesample_matches_oracle(spark, sf_dir, duck):
    from tests.conftest import assert_same_result

    df = eng.QUERIES["multimodal_framesample"](spark, sf_dir)
    assert_same_result(df, duck, eng.ORACLES["multimodal_framesample"])


def test_real_codec_branch_with_pil():
    """C12 real-codec path: when PIL is installed the PNG fixture decodes
    to its true pixel dimensions (skipped where PIL is absent — the
    refusal test below covers that environment)."""
    import pytest

    from mapreduceimplementation_spark.operators import multimodal as mm

    if mm._PILImage is None:
        pytest.skip("PIL not installed in this environment")
    payload = open("tests/fixtures/tiny.png", "rb").read()
    meta = mm._decode_media(payload)
    assert (meta["kind"], meta["width"], meta["height"]) == ("image", 3, 2)
    assert meta["size_chars"] == len(payload)
    assert meta["checksum"] == sum(payload[:16]) % 997


def test_real_codec_refuses_without_pil():
    """Without PIL, a real container payload must refuse loudly — never
    silently mis-decode (the stub's honesty contract)."""
    import pytest

    from mapreduceimplementation_spark.operators import multimodal as mm

    if mm._PILImage is not None:
        pytest.skip("PIL installed: the decode test above covers this payload")
    payload = open("tests/fixtures/tiny.png", "rb").read()
    assert payload.startswith(b"\x89PNG")
    with pytest.raises(NotImplementedError):
        mm._decode_media(payload)


# ---------------------------------------------------------------------------
# C80 multimodal_phash_dedup


def test_phash_dedup_groups_consistent_with_meta(spark, sf_dir):
    """C80 invariants: fingerprints equal C12's checksum per doc, groups
    never mix kinds, exactly one survivor per (kind, phash) bucket, and
    candidate-dup buckets exist at sf0.001 (birthday collisions in the
    997-bucket space)."""
    rows = eng.QUERIES["multimodal_phash_dedup"](spark, sf_dir).collect()
    meta = {
        r["doc_id"]: (r["kind"], r["checksum"])
        for r in eng.QUERIES["multimodal_meta"](spark, sf_dir).collect()
    }
    assert {r["doc_id"] for r in rows} == set(meta)
    groups = {}
    for r in rows:
        assert (r["kind"], r["phash"]) == meta[r["doc_id"]]
        groups.setdefault((r["kind"], r["phash"]), []).append(r)
    assert any(len(g) > 1 for g in groups.values())
    for (kind, _), grp in groups.items():
        survivors = [r for r in grp if not r["is_candidate_dup"]]
        assert len(survivors) == 1
        assert survivors[0]["doc_id"] == min(r["doc_id"] for r in grp)
        assert all(r["canonical_id"] == survivors[0]["doc_id"] for r in grp)
        assert all(r["group_size"] == len(grp) for r in grp)
