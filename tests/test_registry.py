"""Registry gate: every operator SURVEY.md §2 marks implemented must be
registered in QUERIES (and, unless rows-only, in ORACLES).  This test exists
because round 1 shipped four finished operators as dead code — an import
missing from operators/__init__.py made them invisible to the driver.
"""

from __future__ import annotations

import mapreduceimplementation_spark as eng

eng.load_all_operators()

# SURVEY.md §2 inventory, minus test-only deliverables (A7).  Grows with each
# round; "done" in SURVEY requires membership here AND a green CORRECTNESS row.
INVENTORY = [
    # A. MapReduce core
    "mr_wordcount",
    "mr_inverted_index",
    "mr_grep",
    "mr_file_lengths",
    "mr_distributed_sort",
    "mr_generic_wc",
    # B. Relational analytics
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "top_customers_per_nation",
    "part_type_share",
    "order_priority_count",
    "events_minutely",
    "events_sessionize",
    "events_json_props",
    "kv_apply_log",
    "shard_rebalance",
    # C. LLM-data-pipeline
    "token_count",
    "quality_score",
    "lang_id",
    "doc_fingerprint",
]

#: registered queries that intentionally have no SQL oracle (rows-only gate)
ROWS_ONLY = frozenset()


def test_inventory_registered():
    missing = [k for k in INVENTORY if k not in eng.QUERIES]
    assert not missing, f"SURVEY-inventoried operators missing from QUERIES: {missing}"


def test_inventory_has_oracles():
    missing = [
        k for k in INVENTORY if k not in ROWS_ONLY and k not in eng.ORACLES
    ]
    assert not missing, f"operators without a DuckDB oracle: {missing}"


def test_no_unknown_rows_only():
    assert ROWS_ONLY <= set(eng.QUERIES)
