"""Golden-output parity against the reference's OWN committed test data:
run our operators over the reference's pg-*.txt corpus and compare with
the mr-out-* files its MapReduce run produced (the reference's
test-mr.sh gate: 'wc output equals sequential golden').

Reference anchors: src/mrapps/wc.go (Map splits on !unicode.IsLetter,
Reduce counts), src/mr/worker.go (mr-out-N '%v %v' sink contract).
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from mapreduceimplementation_spark.sources.text import read_text_dir, write_mr_out

_REF_MAIN = "/root/reference/src/main"
_HAVE_REF = bool(glob.glob(os.path.join(_REF_MAIN, "pg-*.txt"))) and bool(
    glob.glob(os.path.join(_REF_MAIN, "mr-out-[0-9]"))
)


def _golden_counts() -> dict[str, int]:
    out: dict[str, int] = {}
    for fn in glob.glob(os.path.join(_REF_MAIN, "mr-out-[0-9]")):
        with open(fn) as f:
            for line in f:
                line = line.rstrip("\n")
                if not line:
                    continue
                word, cnt = line.rsplit(" ", 1)
                assert word not in out, f"duplicate golden key {word!r}"
                out[word] = int(cnt)
    return out


@pytest.mark.skipif(not _HAVE_REF, reason="reference corpus/golden not present")
def test_wordcount_matches_reference_golden(spark):
    """wc.go parity on the reference's own corpus: split contents on
    !unicode.IsLetter ([^\\p{L}]+), count per word (case-sensitive), and
    the (word, count) set must equal the union of the committed
    mr-out-0..9 files exactly."""
    docs = read_text_dir(spark, os.path.join(_REF_MAIN, "pg-*.txt"))
    counts = (
        docs.select(F.explode(F.split("text", r"[^\p{L}]+")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .count()
    )
    ours = {(r["word"], r["count"]) for r in counts.collect()}
    golden = set(_golden_counts().items())
    assert ours == golden, (
        f"missing={list(golden - ours)[:5]} extra={list(ours - golden)[:5]}"
    )


@pytest.mark.skipif(not _HAVE_REF, reason="reference corpus/golden not present")
def test_mr_out_sink_contract(spark, tmp_path):
    """write_mr_out produces exactly n_reduce part files whose union of
    'key value' lines equals the input, each file sorted by key
    (worker.go's mr-out-N contract)."""
    docs = read_text_dir(spark, os.path.join(_REF_MAIN, "pg-*.txt"))
    counts = (
        docs.select(F.explode(F.split("text", r"[^\p{L}]+")).alias("key"))
        .where(F.col("key") != "")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("value"))
    )
    out = str(tmp_path / "mr-out")
    write_mr_out(counts, out, n_reduce=10)

    parts = sorted(glob.glob(os.path.join(out, "part-*")))
    assert len(parts) == 10
    seen: dict[str, int] = {}
    for fn in parts:
        with open(fn) as f:
            keys = []
            for line in f:
                word, cnt = line.rstrip("\n").rsplit(" ", 1)
                keys.append(word)
                seen[word] = int(cnt)
            assert keys == sorted(keys), f"{fn} not sorted by key"
    assert seen == _golden_counts()


# ---------------------------------------------------------------------------
# A10. Intermediate shuffle-format parity: the reference's committed
# mr-out-<map>-<reduce>.json files (worker.go's json.Encoder per KeyValue,
# bucket = ihash(key) & 0x7fffffff % NReduce)

_HAVE_INTERMEDIATE = bool(
    glob.glob(os.path.join(_REF_MAIN, "mr-out-[0-9]-[0-9].json"))
)


def _intermediate_rows():
    """(map_task, reduce_bucket, key, value) from every committed
    intermediate file."""
    import json as _json

    rows = []
    for fn in sorted(glob.glob(os.path.join(_REF_MAIN, "mr-out-*-*.json"))):
        base = os.path.basename(fn)[len("mr-out-"):-len(".json")]
        m, r = (int(x) for x in base.split("-"))
        with open(fn) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                kv = _json.loads(line)
                rows.append((m, r, kv["Key"], kv["Value"]))
    return rows


@pytest.mark.skipif(not _HAVE_INTERMEDIATE, reason="no committed intermediates")
def test_intermediate_buckets_follow_ihash():
    """Every key in the reference's committed intermediate files sits in
    exactly the reduce bucket ihash(key) % NReduce prescribes — pinning
    OUR ihash implementation to the reference's actual shuffle artifacts
    (not just to the algorithm's description)."""
    from mapreduceimplementation_spark.functions.hashing import py_fnv1a32

    rows = _intermediate_rows()
    assert rows, "no intermediate rows parsed"
    n_reduce = max(r for _, r, _, _ in rows) + 1
    assert n_reduce == 10
    for _, r, key, _ in rows:
        assert (py_fnv1a32(key) & 0x7FFFFFFF) % n_reduce == r, key


@pytest.mark.skipif(not _HAVE_INTERMEDIATE, reason="no committed intermediates")
def test_spark_ihash_reproduces_reference_buckets(spark):
    """The SQL fnv1a32 fold reproduces the reference's bucket for every
    distinct key in the committed intermediates — our engine could write
    byte-compatible shuffle files for this job."""
    from pyspark.sql import functions as F

    from mapreduceimplementation_spark.functions.hashing import fnv1a32

    rows = _intermediate_rows()
    pairs = sorted({(k, r) for _, r, k, _ in rows})
    df = spark.createDataFrame(pairs, "key string, bucket int")
    got = df.select(
        "key",
        "bucket",
        (fnv1a32("key").bitwiseAND(F.lit(0x7FFFFFFF)) % 10).alias("ours"),
    )
    assert got.where(F.col("bucket") != F.col("ours")).count() == 0


@pytest.mark.skipif(not _HAVE_INTERMEDIATE, reason="no committed intermediates")
def test_reduce_over_intermediates_equals_golden():
    """Replaying wc.go's Reduce (count per key) over the committed
    intermediate files must reproduce the committed FINAL mr-out-N
    outputs exactly — the shuffle+reduce contract end-to-end on the
    reference's own artifacts."""
    from collections import Counter

    rows = _intermediate_rows()
    counts = Counter(k for _, _, k, _ in rows)
    assert all(v == "1" for _, _, _, v in rows)  # wc.go Map emits "1"
    assert dict(counts) == _golden_counts()


@pytest.mark.skipif(not _HAVE_REF, reason="reference corpus not present")
def test_write_mr_intermediate_roundtrip(spark, tmp_path):
    """Write-side dual of A10: our map output written through
    write_mr_intermediate lands every key in the reference's ihash
    bucket (so a reference reducer could consume it), and replaying
    Reduce over our files equals the committed golden counts."""
    import json as _json

    from mapreduceimplementation_spark.functions.hashing import py_fnv1a32
    from mapreduceimplementation_spark.functions.text import word_tokens
    from mapreduceimplementation_spark.sources.text import (
        read_text_dir,
        write_mr_intermediate,
    )

    docs = read_text_dir(spark, os.path.join(_REF_MAIN, "pg-*.txt"))
    kv = word_tokens(docs).select(
        F.col("word").alias("key"), F.lit("1").alias("value")
    )
    out = str(tmp_path / "intermediate")
    write_mr_intermediate(kv, out, n_reduce=10)

    from collections import Counter

    counts: Counter = Counter()
    for fn in glob.glob(os.path.join(out, "r=*", "*.json")):
        r = int(os.path.basename(os.path.dirname(fn)).split("=")[1])
        with open(fn) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                rec = _json.loads(line)
                assert set(rec) == {"Key", "Value"}
                assert (py_fnv1a32(rec["Key"]) & 0x7FFFFFFF) % 10 == r
                assert rec["Value"] == "1"
                counts[rec["Key"]] += 1
    assert dict(counts) == _golden_counts()
