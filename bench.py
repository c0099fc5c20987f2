"""Headline benchmark: run flagship queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]; print ONE JSON line.

Each query is forced end-to-end by summing crc32(to_json(struct(*))) over
every output row — all columns are materialized, so Catalyst cannot prune
computed columns out of the timing (a plain count() would skip e.g.
mr_grep.n_hits entirely).  Headline queries that are not registered are
reported in the JSON's "skipped" list, never silently dropped.

Protocol and round-over-round numbers: BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "mr_wordcount",
    "mr_inverted_index",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "basket_pairs",
    "dedup_minhash_lsh",
    "ann_topk",
    "knn_graph",
    "events_sessionize",
    "events_asof_join",
    "corpus_prep",
    "streaming_windowed_counts",
    "streaming_stream_join",
    # both sessionize streaming paths, timed side by side: the native
    # session_window JVM-state path should beat the applyInPandasWithState
    # Python-state path (BASELINE.md tracks the pair)
    "streaming_sessionize",
    "streaming_sessionize_native",
    "kmeans_embed",
    # round-4 additions: semantic dedup (kmeans-blocked pair expansion),
    # gram-repetition filters (two-exchange text shape), and the
    # foreachBatch-upserted streaming materialized view
    "dedup_semantic",
    "quality_repetition",
    "streaming_incremental_rollup",
    # late-round-4 family representatives: the widest TPC-H star join,
    # the n-gram LM counting job, and kNN-graph triangle counting
    "q8_market_share",
    "corpus_ngram_lm_counts",
    "knn_triangles",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F
    from mapreduceimplementation_spark.session import get_spark

    spark = get_spark("mri-spark-bench")
    qs = entrymod.queries()

    # warm up the JVM + parquet footer caches once, outside timing
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    timings: dict[str, float] = {}
    skipped = [name for name in HEADLINE if name not in qs]
    for name in HEADLINE:
        if name not in qs:
            continue
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.crc32(F.encode(F.to_json(F.struct(*df.columns)), "UTF-8"))).alias(
                "crc"
            ),
        ).collect()[0]
        timings[name] = round(time.time() - t0, 3)
        print(
            f"# {name}: {row['n']} rows (crc {row['crc']}) in {timings[name]}s",
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 3)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    # Host-noise indicator: wordcount is untouched since round 1 and ran
    # 1.58 s in BASELINE's quiet reference window at sf0.1.  Same-code
    # totals on this shared box ranged 38-129 s in a single day, so the
    # canary ratio is the honest lens on any absolute number here
    # (BASELINE.md, variance note).
    canary_quiet = 1.58
    wc = timings.get("mr_wordcount")
    host_factor = (
        round(wc / canary_quiet, 2) if wc and float(sf or 0) == 0.1 else None
    )
    print(
        json.dumps(
            {
                "metric": "headline_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "skipped": skipped,
                "sf": float(sf) if sf else None,
                "host_factor_vs_quiet_canary": host_factor,
            }
        )
    )


if __name__ == "__main__":
    main()
