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
