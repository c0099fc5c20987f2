"""Empty-input totality gate: a 100 TB pipeline's operators run inside
orchestration that cannot special-case 'the upstream filter matched
nothing' — every representative operator must return an EMPTY (or
correctly-degenerate) result on empty tables, never throw.

The fixture clones the sf0.001 schemas into zero-row parquet files.
"""

from __future__ import annotations

import os

import pytest

import mapreduceimplementation_spark as eng

eng.load_all_operators()

# one representative per plan family; iterative/seeded ops (kmeans & its
# dependents) and streaming are excluded by design — their contracts
# require a non-empty model/seed set, which the registry documents
_EMPTY_TOTAL = [
    "mr_wordcount",          # scan-explode-agg
    "mr_file_lengths",       # per-file agg
    "q1_pricing_summary",    # scan agg
    "q3_shipping_priority",  # join + top-k
    "q6_forecast_revenue",   # one-row agg (coalesced)
    "q13_customer_distribution",  # outer join + double agg
    "events_minutely",       # time rollup
    "events_sessionize",     # window chain
    "events_value_histogram",  # fixed bins
    "events_trailing_window",  # RANGE window
    "events_exact_median",   # distributed-rank order statistic (one row)
    "events_median_by_type",  # grouped order statistic (empty groups)
    "dedup_exact",           # hash window
    "dedup_minhash_lsh",     # LSH banding
    "token_count",           # row-local text
    "corpus_split",          # hash stamp
    "feature_hash_vectors",  # zero-shuffle fold
    "kv_apply_log",          # log replay
    "corpus_chunk_overlap",  # row-local fanout (r5)
    "sample_uniform_k",      # TakeOrdered top-k (r5)
    "pii_scrub",             # row-local regexp (r5)
    "ngram_duplication",     # shingle-window + rollup (r5)
    "boilerplate_source_matrix",  # in-bucket pair expansion (r5)
    "bpe_pair_counts",       # bounded-key partial agg (r5)
    "lock_grant_audit",      # per-lock LAG replay (r5)
    "minhash_recall_audit",  # dual shingle-pass audit rollup (r5)
    "kv_append_linearizability",  # cluster/epoch/block audit (r6)
    "raft_election_safety",  # bounded-grid vote rollup (r6)
    "raft_log_matching",     # per-server LAG + per-idx rollup (r6)
    "events_hll_users",      # register agg + exact-audit join (r6)
    "events_quantile_sketch",  # bounded hist + rank probe join (r6)
    "events_incident_join",  # islands + bucket equi-join (r6)
    "corpus_sample_weighted",  # TakeOrdered ES-key top-k (r6)
    "events_hll_merge_audit",  # global sketch rollup (r6)
    "dedup_prefix_filter",   # df-rank windows + bucket pairs (r6)
    # r5 TPC-H additions over synthesized partsupp / dates: with an empty
    # supplier table synth_partsupp's hash % s_cnt edge (s_cnt = 0) must
    # yield an EMPTY partsupp, never NULL-suppkey rows (r6, per ADVICE)
    "q2_min_cost_supplier",
    "q11_important_stock",
    "q16_parts_supplier_relationship",
    "q20_potential_promotion",
    "q12_shipping_modes",
    "q21_waiting_suppliers",
    # r6-end additions: row-local scans, the PQ/IVF-PQ broadcast-codebook
    # family (empty corpus -> empty codebook -> empty codes, never a
    # fabricated row), and the two-pipeline fusion
    "winnowing_fingerprint",
    "corpus_entropy",
    "embedding_pq",
    "ann_ivfpq",
    "hybrid_search_rrf",
    "bm25_topk",
    "events_scd2_dimension",
    # lake/KV maintenance family (r6 continuation): single-exchange
    # conditional aggs and a lag-window replay — all total on empty
    "kv_client_dedup",
    "table_merge_upsert",
    "table_snapshot_diff",
    "events_audience_overlap",
    "events_transition_matrix",
    # r6 continuation: the row-local Gopher rule matrix and the two-pass
    # DSIR scorer (empty corpus -> empty bucket model -> empty scores;
    # the one-row mean aggregate must not fabricate a row)
    "quality_gopher_rules",
    "dsir_importance",
    "quality_c4_rules",
    "embedding_hard_negatives",
    "embedding_matryoshka_eval",
    "events_funnel_attribution",
    "corpus_semantic_decontaminate",
    "events_ab_test_metrics",
    "events_session_paths",
    "tokenizer_fertility",
    "quality_ccnet_buckets",
    # r8: the generic linearizability engine (empty history -> zero
    # blocks/links; the pointer-doubling loop must exit on its isEmpty
    # check, never iterate or fabricate a verdict row)
    "lock_linearizability",
]

_ONE_ROW_ON_EMPTY = {
    "q6_forecast_revenue",
    "q1_pricing_summary",
    "events_exact_median",  # ungrouped: one (n=0, median NULL) summary row
    "events_hll_merge_audit",  # ungrouped sketch: one all-NULL audit row
}


@pytest.fixture(scope="module")
def empty_sf_dir(spark, sf_dir, tmp_path_factory):
    from mapreduceimplementation_spark.sources.tables import TABLES, load_table

    d = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        df = load_table(spark, sf_dir, t)
        df.limit(0).write.mode("overwrite").parquet(str(d / f"{t}.parquet"))
    return str(d)


@pytest.mark.parametrize("name", _EMPTY_TOTAL)
def test_total_on_empty_input(spark, empty_sf_dir, name):
    out = eng.QUERIES[name](spark, empty_sf_dir)
    rows = out.collect()
    if name in _ONE_ROW_ON_EMPTY:
        # global aggregates legitimately emit their single summary row
        assert len(rows) <= 1
    else:
        assert rows == [], f"{name} fabricated rows from empty input: {rows[:3]}"


def test_partsupp_empty_supplier_nonempty_part(spark, sf_dir, tmp_path):
    """The s_cnt = 0 edge specifically: with a NON-empty part table and
    an EMPTY supplier table, synth_partsupp's hash %% s_cnt expression is
    reachable and must yield an EMPTY partsupp — never NULL-ps_suppkey
    rows (the all-tables-empty fixture above can't exercise this: an
    empty part empties the candidate set before the modulo runs)."""
    from pyspark.sql import functions as F

    from mapreduceimplementation_spark.plans.tpch import synth_partsupp
    from mapreduceimplementation_spark.sources.tables import load_table

    d = tmp_path / "half_empty"
    d.mkdir()
    load_table(spark, sf_dir, "part").write.parquet(str(d / "part.parquet"))
    load_table(spark, sf_dir, "supplier").limit(0).write.parquet(
        str(d / "supplier.parquet")
    )
    ps = synth_partsupp(spark, str(d))
    assert ps.count() == 0
    # and the guard is what does it: without the filter the candidate
    # relation is non-empty, so NULLs would have to appear downstream
    assert ps.where(F.col("ps_suppkey").isNull()).count() == 0
