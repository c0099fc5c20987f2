"""KV-plan tests (SURVEY.md §2 B10–B12)."""

from __future__ import annotations

import mapreduceimplementation_spark as eng

eng.load_all_operators()


def test_hrw_minimal_movement(spark, sf_dir):
    """The shardctrler guarantee: when groups Leave, ONLY their shards
    move — every other shard's rendezvous argmax is untouched — and no
    shard remains on a departed group."""
    out = eng.QUERIES["shard_rebalance_hrw"](spark, sf_dir).toPandas()
    assert len(out) == 64
    moved = out[out["moved"]]
    stayed = out[~out["moved"]]
    assert (moved["gid_full"] % 5 == 3).all()  # only leavers' shards move
    assert (stayed["gid_full"] == stayed["gid_alive"]).all()
    assert (out["gid_alive"] % 5 != 3).all()  # nothing lands on a leaver
    # balance sanity: surviving groups each hold a bounded share
    counts = out["gid_alive"].value_counts()
    assert counts.max() <= 3 * max(1, 64 // counts.size)


def test_wordcount_text_equals_parquet_path(spark, sf_dir):
    """Whole-file ingestion must produce byte-identical wordcounts to the
    parquet path (reference golden check across input formats)."""
    a = sorted(map(tuple, eng.QUERIES["mr_wordcount"](spark, sf_dir).collect()))
    b = sorted(map(tuple, eng.QUERIES["mr_wordcount_text"](spark, sf_dir).collect()))
    assert a == b
