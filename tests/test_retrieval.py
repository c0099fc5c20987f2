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


# ---------------------------------------------------------------------------
# C78 phrase_search


def test_phrase_search_hand_corpus(spark):
    """Hand corpus pinning positional semantics: multiple occurrences in
    one doc counted with the right first position, a doc with the words
    present but NOT consecutive must not match, and an overlapping
    self-repeating phrase counts each start."""
    import tempfile

    from mapreduceimplementation_spark.operators.retrieval import (
        _PHR_AT,
    )

    pad = " ".join(f"pad{i}" for i in range(_PHR_AT - 1))
    # donor doc 1: phrase at positions 10-12 is "alpha beta gamma"
    donor = pad + " alpha beta gamma tail1 alpha beta gamma"
    hit = "alpha beta gamma starts this document"
    scrambled = "alpha beta delta gamma beta alpha"  # words, not consecutive
    rows = [
        (1, donor),
        (2, hit),
        (3, scrambled),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        out = {
            (r["phrase_id"], r["doc_id"]): r
            for r in eng.QUERIES["phrase_search"](spark, d).collect()
        }
    # only doc 1 is long enough to donate; its phrase is "alpha beta gamma"
    assert set(out) == {(1, 1), (1, 2)}
    assert out[(1, 1)]["phrase"] == "alpha beta gamma"
    assert out[(1, 1)]["n_occurrences"] == 2 and out[(1, 1)]["first_pos"] == _PHR_AT
    assert out[(1, 1)]["is_self"]
    assert out[(1, 2)]["n_occurrences"] == 1 and out[(1, 2)]["first_pos"] == 1
    assert not out[(1, 2)]["is_self"]


def test_phrase_search_probe_self_match(spark, sf_dir):
    """Every probe phrase must match its donor doc at exactly _PHR_AT
    (query-by-example guarantee), and every reported occurrence must be
    verifiable against the raw word array."""
    from mapreduceimplementation_spark.functions.text import word_array
    from mapreduceimplementation_spark.operators.retrieval import (
        _PHR_AT,
        _PHR_LEN,
        _PHR_PROBES,
    )
    from mapreduceimplementation_spark.sources.tables import load_table

    rows = eng.QUERIES["phrase_search"](spark, sf_dir).collect()
    selfs = [r for r in rows if r["is_self"]]
    assert len(selfs) == _PHR_PROBES
    assert all(r["first_pos"] <= _PHR_AT for r in selfs)
    arrs = {
        r["doc_id"]: r["ws"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", word_array("text").alias("ws"))
        .collect()
    }
    for r in rows:
        words = r["phrase"].split(" ")
        ws = arrs[r["doc_id"]]
        s = r["first_pos"] - 1
        assert ws[s : s + _PHR_LEN] == words
        n = sum(
            1
            for i in range(len(ws) - _PHR_LEN + 1)
            if ws[i : i + _PHR_LEN] == words
        )
        assert n == r["n_occurrences"]
