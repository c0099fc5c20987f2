"""Plan-shape gates for the text-metrics operators (SURVEY.md §5 item 5)."""

from __future__ import annotations

import mapreduceimplementation_spark as eng

eng.load_all_operators()


def test_doc_fingerprint_has_no_exchange(spark, sf_dir):
    """The k-min sketch is row-local: a 100TB-safe plan has zero shuffles."""
    df = eng.QUERIES["doc_fingerprint"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_scan_speed_metrics_have_no_exchange(spark, sf_dir):
    """token_count / quality_score / lang_id are pure projections."""
    for name in ("token_count", "quality_score", "lang_id"):
        df = eng.QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"{name}: {plan}"


def test_tfidf_top_terms_properties(spark, sf_dir):
    """C17: dense ranks 1..k per doc, tfidf non-increasing within a doc,
    and a word appearing in every document scores ~0 (idf = ln(N/N))."""
    out = eng.QUERIES["tfidf_top_terms"](spark, sf_dir).toPandas()
    assert len(out) > 0
    for _, grp in out.groupby("doc_id"):
        g = grp.sort_values("rank")
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        assert (g["tfidf"].diff().dropna() <= 1e-9).all()
    n_docs = out["doc_id"].nunique()
    ubiquitous = out[out["df"] == n_docs]
    assert (ubiquitous["tfidf"].abs() <= 1e-9).all()


def test_cms_never_undercounts(spark, sf_dir, duck):
    """C25: the count-min estimate is >= the exact count for every
    reported key (collisions only inflate), exactly 10 keys are reported,
    and the sketch matches the DuckDB oracle cell-for-cell."""
    import mapreduceimplementation_spark as eng
    from tests.conftest import assert_same_result

    df = eng.QUERIES["heavy_hitters_cms"](spark, sf_dir)
    assert_same_result(df, duck, eng.ORACLES["heavy_hitters_cms"])
    out = df.toPandas()
    assert len(out) == 10
    assert (out["cms_n"] >= out["exact_n"]).all()


def test_quality_repetition_matches_oracle(spark, sf_dir, duck):
    from tests.conftest import assert_same_result

    df = eng.QUERIES["quality_repetition"](spark, sf_dir)
    assert_same_result(df, duck, eng.ORACLES["quality_repetition"])


def test_quality_repetition_hand_case(spark, sf_dir):
    """C31 on a hand-computed doc: 'a a a b' -> words=4, top word 3/4,
    top bigram 'a a' 2/3, trigrams {'a a a','a a b'} all unique -> dup 0;
    and a short doc exercises the backward-sequence guard."""
    import pandas as pd

    from mapreduceimplementation_spark.operators.textmetrics import (
        quality_repetition,
    )

    docs = spark.createDataFrame(
        [(1, "a a a b"), (2, "x"), (3, "r r r r r r")], ["doc_id", "text"]
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        out = (
            quality_repetition(spark, d)
            .toPandas()
            .set_index("doc_id")
            .sort_index()
        )
    assert out.loc[1, "n_words"] == 4
    assert out.loc[1, "top_word_frac"] == 0.75
    assert out.loc[1, "top_bigram_frac"] == round(2 / 3, 6)
    assert out.loc[1, "dup_trigram_frac"] == 0.0
    assert not out.loc[1, "keep"]
    # single word: no bigrams/trigrams -> fractions 0, top word 1.0
    assert out.loc[2, "n_words"] == 1
    assert out.loc[2, "top_word_frac"] == 1.0
    assert out.loc[2, "top_bigram_frac"] == 0.0
    # pure repetition: every trigram 'r r r' duplicated -> dup frac 1.0
    assert out.loc[3, "dup_trigram_frac"] == 1.0
    assert not out.loc[3, "keep"]
    assert isinstance(out, pd.DataFrame)


def test_quality_repetition_two_exchanges(spark, sf_dir):
    """The design is exactly two shuffles: (doc_id,n,gram) counting and the
    doc_id rollup — a third would mean the gram relation is re-shuffled."""
    df = eng.QUERIES["quality_repetition"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_ex = plan.count("Exchange hashpartitioning")
    assert n_ex == 2, f"expected 2 hash exchanges, saw {n_ex}:\n{plan}"
    assert "CartesianProduct" not in plan


def test_feature_hash_vectors_oracle_and_shape(spark, sf_dir, duck):
    """C34: oracle match + zero-exchange plan + per-row invariant
    (vector components sum to n_tokens — hashing never drops a token)."""
    from tests.conftest import assert_same_result

    df = eng.QUERIES["feature_hash_vectors"](spark, sf_dir)
    assert_same_result(df, duck, eng.ORACLES["feature_hash_vectors"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    out = df.toPandas()
    assert len(out) > 0
    for _, r in out.iterrows():
        parts = [int(x) for x in r["vec"].split(",")]
        assert len(parts) == 32
        assert sum(parts) == r["n_tokens"]


# ---------------------------------------------------------------------------
# C37. corpus_zipf_slope


def test_zipf_matches_oracle(spark, sf_dir, duck):
    from tests.conftest import assert_same_result

    df = eng.QUERIES["corpus_zipf_slope"](spark, sf_dir)
    assert_same_result(df, duck, eng.ORACLES["corpus_zipf_slope"])


def test_zipf_slope_is_negative_and_topk_bounded(spark, sf_dir):
    """Rank-frequency fits slope < 0 by construction (counts are
    non-increasing in rank) and the fit width never exceeds the declared
    top-N."""
    out = eng.QUERIES["corpus_zipf_slope"](spark, sf_dir).toPandas()
    assert len(out) == 1
    assert out.loc[0, "slope"] < 0
    assert 0 < out.loc[0, "n_words"] <= 100


def test_zipf_topk_is_take_ordered(spark, sf_dir):
    from tests.conftest import formatted_plan

    plan = formatted_plan(eng.QUERIES["corpus_zipf_slope"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


# ---------------------------------------------------------------------------
# C38. corpus_ngram_lm_counts


def test_lm_counts_matches_oracle(spark, sf_dir, duck):
    from tests.conftest import assert_same_result

    df = eng.QUERIES["corpus_ngram_lm_counts"](spark, sf_dir)
    assert_same_result(df, duck, eng.ORACLES["corpus_ngram_lm_counts"])


def test_lm_counts_semantics(spark, sf_dir):
    """Survivors respect the cutoff; fractions are true probabilities of
    the UNPRUNED total (per order they sum to <= 1, and unigram mass
    dominates pruned mass on natural-ish text); orders 1..3 present."""
    out = eng.QUERIES["corpus_ngram_lm_counts"](spark, sf_dir).toPandas()
    assert set(out["n"]) == {1, 2, 3}
    assert (out["c"] >= 5).all()
    for _, grp in out.groupby("n"):
        assert grp["frac"].sum() <= 1.0 + 1e-6
    uni = out[out["n"] == 1]
    assert uni["frac"].sum() > 0.9  # tiny vocab: almost nothing pruned
