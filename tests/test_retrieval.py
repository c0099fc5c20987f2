"""C56 bm25_topk — ranking sanity on a hand corpus."""

from __future__ import annotations

import tempfile

import mapreduceimplementation_spark as eng

eng.load_all_operators()


def test_bm25_ranks_exact_copy_first(spark):
    """For a probe doc, an exact copy outranks partial overlaps, more
    shared terms outrank fewer, the probe never retrieves itself, and
    probes sharing no terms retrieve nothing."""
    rows = [
        (1, "alpha beta gamma delta"),          # probe
        (2, "epsilon zeta eta theta"),          # probe, no candidates
        (3, "iota kappa lam mu"),               # probe, no candidates
        (4, "nu xi omicron pi"),                # probe, no candidates
        (5, "alpha beta gamma delta"),          # exact copy of probe 1
        (6, "alpha beta fillera fillerb"),      # 2 shared terms
        (7, "alpha fillerc fillerd fillere"),   # 1 shared term
        (8, "lone lone lone lone"),             # shares nothing
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        out = eng.QUERIES["bm25_topk"](spark, d).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["q_id"], []).append(r)
    # probe 1: copy > 2-shared > 1-shared, nothing else
    got1 = [r["doc_id"] for r in sorted(by_q[1], key=lambda r: r["rnk"])]
    assert got1 == [5, 6, 7]
    # scores strictly decrease down the ranking (no tie ambiguity here)
    s1 = [r["score_micro"] for r in sorted(by_q[1], key=lambda r: r["rnk"])]
    assert s1 == sorted(s1, reverse=True) and len(set(s1)) == 3
    # no probe retrieves itself
    assert all(r["q_id"] != r["doc_id"] for r in out)
    # probes 2-4 share no terms with any other doc -> no rows
    assert set(by_q) == {1}
