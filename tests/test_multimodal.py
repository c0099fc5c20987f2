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
    assert meta["size_bytes"] == len(b"image:AB rest of payload")
    audio = _decode_media(b"audio:xyz")
    assert audio["duration_ms"] == len(b"audio:xyz") * 10
    assert audio["width"] is None


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
