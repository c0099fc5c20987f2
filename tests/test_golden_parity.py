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
