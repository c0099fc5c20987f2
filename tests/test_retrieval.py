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


def test_hybrid_search_rrf_fusion_properties(spark, sf_dir, duck):
    """C61: oracle parity, ranks 1..k dense per probe, rrf_micro exactly
    reproducible from the carried per-modality ranks, ordering monotone in
    rrf_micro, probes never retrieve themselves, and a doc carried by both
    modalities beats the pure-tail single-modality score it would have had
    alone."""
    import math

    from tests.conftest import assert_same_result

    from mapreduceimplementation_spark.operators.retrieval import _RRF_K

    df = eng.QUERIES["hybrid_search_rrf"](spark, sf_dir)
    assert_same_result(df, duck, eng.ORACLES["hybrid_search_rrf"])
    out = df.toPandas()
    assert (out["q_id"] != out["doc_id"]).all()
    for _, g in out.groupby("q_id"):
        g = g.sort_values("rnk")
        assert list(g["rnk"]) == list(range(1, len(g) + 1))
        assert (g["rrf_micro"].diff().dropna() <= 0).all()
    # rrf_micro is exactly the floored fixed-order sum of the rank terms
    for _, r in out.iterrows():
        lex = 0.0 if r["lex_rank"] is None or math.isnan(r["lex_rank"]) else 1.0 / (
            _RRF_K + float(r["lex_rank"])
        )
        sem = 0.0 if r["sem_rank"] is None or math.isnan(r["sem_rank"]) else 1.0 / (
            _RRF_K + float(r["sem_rank"])
        )
        assert r["rrf_micro"] == math.floor((lex + sem) * 1e9), dict(r)
    # at least one fused row exists that both modalities retrieved
    both = out.dropna(subset=["lex_rank", "sem_rank"])
    assert len(both) > 0
