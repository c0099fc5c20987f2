"""Generic-engine combiner tests (SURVEY.md §2 A6, MapReduce paper §4.3)."""

from __future__ import annotations

import mapreduceimplementation_spark as eng
from mapreduceimplementation_spark.operators.mapreduce import (
    map_reduce,
    map_stage,
    wc_map,
)
from mapreduceimplementation_spark.sources.tables import load_table

eng.load_all_operators()


def _sum_app(_key: str, values: list[str]) -> str:
    """Summing wordcount (the paper's combiner-safe formulation)."""
    return str(sum(int(v) for v in values))


def test_combiner_preserves_output(spark, sf_dir):
    """wc-with-combiner == native wordcount == wc-without-combiner."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    combined = {
        (r["key"], r["value"])
        for r in map_reduce(
            docs, wc_map, _sum_app,
            key_col="doc_id", value_col="text", combine_fn=_sum_app,
        ).collect()
    }
    native = {
        (r["word"], str(r["cnt"]))
        for r in eng.QUERIES["mr_wordcount"](spark, sf_dir).collect()
    }
    assert combined == native


def test_combiner_shrinks_shuffle_volume(spark, sf_dir):
    """Rows entering the exchange must collapse to (distinct keys per map
    partition), far below the raw exploded pair count."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    raw = map_stage(docs, wc_map, key_col="doc_id", value_col="text").count()
    combined = map_stage(
        docs, wc_map, key_col="doc_id", value_col="text", combine_fn=_sum_app
    ).count()
    assert combined < raw / 10, (combined, raw)
