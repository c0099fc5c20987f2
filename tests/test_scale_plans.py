"""Scale-stress plan gate (round 6): physical-plan fingerprints must not
flip when the fact tables grow 10x.

PLAN_BASELINE.json pins plans at sf0.001; broadcast decisions are
file-size-driven, so a strategy that silently degrades as data grows (a
broadcast build side crossing the threshold into SortMergeJoin, a new
exchange appearing) is invisible to that gate.  This one inflates the
sf0.001 facts 10x (tools/scale_stress.build_inflated: re-salted unique
ids, consistent orders<->lineitem keys, fixed dims) and requires a
representative query per plan family to produce the SAME strategy-level
fingerprint at both sizes.  Dims stay bounded under real growth, so
their broadcasts MUST survive — a flip here is a genuine scale bug, not
a legitimate size adaptation.

The full-scale measured evidence (sf0.1 -> 10x, wall times + fingerprints
for the whole bench headline) is the committed SCALE_r06.json artifact,
produced by `python tools/scale_stress.py`.
"""

from __future__ import annotations

import os

import pytest

import mapreduceimplementation_spark as eng

eng.load_all_operators()

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/testdata/sf0.001"),
    reason="driver testdata not present",
)

# one representative per plan family: scan-agg, multi-join star,
# decorrelated EXISTS, window chain, as-of merge, in-bucket pair
# expansion, LSH banding, uniform-key dedup window, text one-pass,
# outer-join distribution, salted join, partsupp synthesis
_SCALE_PLAN_QUERIES = [
    "q1_pricing_summary",
    "q8_market_share",
    "q21_waiting_suppliers",
    "q13_customer_distribution",
    "q2_min_cost_supplier",
    "events_sessionize",
    "events_asof_join",
    "basket_pairs",
    "dedup_minhash_lsh",
    "dedup_exact",
    "corpus_prep",
    "ngram_duplication",
    "join_skewed_salted",
    "mr_wordcount",
    # r6 mid-round families: bounded-register sketch agg, interval
    # bucket-join (its member-minute broadcast must survive growth),
    # prefix-filtered pair expansion, ES top-k sampling
    "events_hll_users",
    "events_incident_join",
    "dedup_prefix_filter",
    "corpus_sample_weighted",
    # r6 late families: duplicated-span windows, incremental band
    # broadcast (the batch-side broadcast must survive growth), BM25
    # postings + probe broadcast, one-exchange snapshot array replay,
    # row-local readability scan
    "dedup_substring_spans",
    "dedup_incremental",
    "bm25_topk",
    "raft_snapshot_audit",
    "corpus_readability",
    # end-of-round-6 families: row-local winnowing/entropy scans must stay
    # exchange-free at 10x; PQ's one-row codebook and RRF's probe-side
    # broadcasts must survive growth (the data side must never flip to the
    # build side)
    "winnowing_fingerprint",
    "corpus_entropy",
    "embedding_pq",
    "hybrid_search_rrf",
    "ann_ivfpq",
    "events_scd2_dimension",
    # r6 continuation: the Gopher matrix must stay a zero-exchange scan
    # at 10x; DSIR's 512-row model must stay the broadcast build side
    # (the word stream flipping to build would be the scale killer)
    "quality_gopher_rules",
    "dsir_importance",
    "quality_c4_rules",
    # probe-broadcast triplet mining / truncation audit: the corpus
    # stream must never become the build side as it grows
    "embedding_hard_negatives",
    "embedding_matryoshka_eval",
    # the user_id self-join must stay an equi-join (never flip to a
    # nested-loop range join) as the fact grows
    "events_funnel_attribution",
    # benchmark-broadcast decon and the joinless A/B rollup
    "corpus_semantic_decontaminate",
    "events_ab_test_metrics",
    # the session-path rollup reuses the one user_id exchange; its total
    # must stay a 1-row broadcast and the top-k a TakeOrdered
    "events_session_paths",
    "tokenizer_fertility",
    # the CCNet cut rides distributed_rank's range exchange — growth
    # must not add stages or degrade the broadcast offsets
    "quality_ccnet_buckets",
]


@pytest.fixture(scope="module")
def inflated_dir(spark, sf_dir, tmp_path_factory):
    from tools.scale_stress import build_inflated

    out = str(tmp_path_factory.mktemp("scale10") / "x10")
    return build_inflated(spark, sf_dir, 10, out)


@pytest.mark.parametrize("name", _SCALE_PLAN_QUERIES)
def test_plan_fingerprint_stable_at_10x(spark, sf_dir, inflated_dir, name):
    from tools.plan_audit import plan_counts

    base = plan_counts(eng.QUERIES[name](spark, sf_dir))
    big = plan_counts(eng.QUERIES[name](spark, inflated_dir))
    # The contract as data GROWS is DIRECTIONAL — degradation fails,
    # improvement passes: no cartesian ever; shuffle-side joins
    # (SortMerge/ShuffledHash) and bounded nested-loop broadcasts must
    # not INCREASE (a broadcast degrading to SMJ is the flip this gate
    # exists for; the reverse — size stats promoting a borderline SMJ to
    # broadcast — is fine); scan count identical; no NEW exchanges
    # (exchanges may drop: session.spread() adds its repartition only
    # when the input has too few partitions, and the bigger dataset
    # clears that guard on its own).
    msg = f"{name}: plan degraded under 10x growth (sf0.001 {base} vs 10x {big})"
    assert big["cartesian"] == 0 and base["cartesian"] == 0, msg
    assert big["scans"] == base["scans"], msg
    assert big["smj"] + big["shj"] <= base["smj"] + base["shj"], msg
    assert big["bnlj"] <= base["bnlj"], msg
    assert big["exchanges"] <= base["exchanges"], msg
