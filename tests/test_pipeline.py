"""Tests for B13 events_asof_join and C14 corpus_prep (SURVEY.md §2)."""

from __future__ import annotations

import contextlib
import io
from datetime import datetime

import mapreduceimplementation_spark as eng
from tests.conftest import assert_same_result

eng.load_all_operators()


def _plan(df) -> str:
    from tests.conftest import formatted_plan

    return formatted_plan(df)


def test_asof_join_matches_oracle(spark, sf_dir, duck):
    df = eng.QUERIES["events_asof_join"](spark, sf_dir)
    assert_same_result(df, duck, eng.ORACLES["events_asof_join"])


def test_asof_join_semantics_inline(spark):
    """Known tiny timeline: strictly-prior click wins, purchases with no
    prior click are dropped (inner as-of), latest of several clicks wins."""
    rows = [
        # (event_id, user_id, ts, event_type, value)
        (1, 7, datetime(2024, 1, 1, 10, 0, 0), "purchase", 5.0),  # no prior click
        (2, 7, datetime(2024, 1, 1, 10, 1, 0), "click", 0.0),
        (3, 7, datetime(2024, 1, 1, 10, 2, 0), "click", 0.0),
        (4, 7, datetime(2024, 1, 1, 10, 3, 0), "purchase", 9.0),  # matches click 3
        (5, 8, datetime(2024, 1, 1, 10, 0, 0), "click", 0.0),
        (6, 8, datetime(2024, 1, 1, 10, 0, 30), "view", 0.0),  # filtered out
        (7, 8, datetime(2024, 1, 1, 10, 5, 0), "purchase", 2.0),  # matches click 5
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )
    df.createOrReplaceTempView("_asof_inline")

    import mapreduceimplementation_spark.plans.events as ev_mod
    from unittest import mock

    with mock.patch.object(
        ev_mod, "load_table", lambda spark, sf_dir, name: spark.table("_asof_inline")
    ):
        out = {
            r["event_id"]: (r["click_event_id"], r["micros_since_click"])
            for r in eng.QUERIES["events_asof_join"](spark, "ignored").collect()
        }
    assert out == {4: (3, 60_000_000), 7: (5, 300_000_000)}


def test_asof_join_plan_shape(spark, sf_dir):
    """The as-of join is a window merge: exactly ONE exchange (user_id),
    and the event_type filter reaches the parquet scan."""
    plan = _plan(eng.QUERIES["events_asof_join"](spark, sf_dir))
    assert plan.count(") Exchange") == 1, plan
    assert "PushedFilters" in plan and "event_type" in plan.split("PushedFilters", 1)[1].split("\n", 1)[0], plan


def test_corpus_prep_matches_oracle(spark, sf_dir, duck):
    df = eng.QUERIES["corpus_prep"](spark, sf_dir)
    assert_same_result(df, duck, eng.ORACLES["corpus_prep"])


def test_corpus_prep_consistent_with_standalone_ops(spark, sf_dir):
    """The composite must agree with the single operators it chains:
    survivor scores/langs pass the filters per quality_score/lang_id,
    token counts equal token_count's, and group sizes account for every
    kept row exactly once."""
    prep = eng.QUERIES["corpus_prep"](spark, sf_dir).toPandas()
    quality = (
        eng.QUERIES["quality_score"](spark, sf_dir).toPandas().set_index("doc_id")
    )
    lang = eng.QUERIES["lang_id"](spark, sf_dir).toPandas().set_index("doc_id")
    tokens = eng.QUERIES["token_count"](spark, sf_dir).toPandas().set_index("doc_id")

    assert len(prep) > 0
    for _, row in prep.iterrows():
        doc = row["doc_id"]
        assert quality.loc[doc, "score"] >= 0.45
        assert lang.loc[doc, "pred_lang"] == "en"
        assert row["score"] == quality.loc[doc, "score"]
        assert row["n_bpe_tokens"] == tokens.loc[doc, "n_bpe_tokens"]

    n_kept = int(
        ((quality["score"] >= 0.45) & (lang["pred_lang"] == "en")).sum()
    )
    assert int(prep["group_size"].sum()) == n_kept


def test_corpus_prep_single_shuffle(spark, sf_dir):
    """One scan, one exchange: all metrics are row-local; only the dedup
    window shuffles (on the uniform text_hash key)."""
    plan = _plan(eng.QUERIES["corpus_prep"](spark, sf_dir))
    assert plan.count(") Exchange") == 1, plan
    assert plan.count(") Scan parquet") == 1, plan


def test_corpus_prep_regexes_evaluated_once(spark, sf_dir):
    """The r4 pushdown fence: the score/lang filter must NOT be inlined
    into the scan stage (that re-evaluates the whole regex tree per row in
    the filter AND the projection — BASELINE.md's named corpus_prep
    lever).  The scan's data filters stay regex-free; the metrics
    projection is the only place regexes appear."""
    from pyspark.sql import functions as F  # noqa: F401

    df = eng.QUERIES["corpus_prep"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = plan[plan.index("FileScan") :]
    datafilters = scan.split("DataFilters: [", 1)
    if len(datafilters) > 1:
        assert "regexp" not in datafilters[1].split("]", 1)[0], scan[:2000]


def test_events_minutely_orc_equals_parquet_twin(spark, sf_dir):
    """B31 format parity: the ORC read must be value-identical to the
    parquet read (typed-columnar round-trip incl. µs timestamps)."""
    a = sorted(
        map(repr, eng.QUERIES["events_minutely"](spark, sf_dir).collect())
    )
    b = sorted(
        map(repr, eng.QUERIES["events_minutely_orc"](spark, sf_dir).collect())
    )
    assert a == b


def test_events_minutely_json_equals_parquet_twin(spark, sf_dir):
    """B14 format parity: the JSON-lines read must be value-identical to
    the parquet read, so both plans produce the same rows."""
    a = sorted(
        map(repr, eng.QUERIES["events_minutely"](spark, sf_dir).collect())
    )
    b = sorted(
        map(repr, eng.QUERIES["events_minutely_json"](spark, sf_dir).collect())
    )
    assert a == b


def test_corpus_split_fractions_and_subset_stability(spark, sf_dir):
    """C16: all three splits materialize at roughly 80/10/10, and a doc's
    split is a pure function of its id — recomputing over any SUBSET of
    the corpus assigns identical splits (growth/shrink never moves docs,
    the eval-contamination guard)."""
    from pyspark.sql import functions as F

    from mapreduceimplementation_spark.functions.hashing import hash64
    from mapreduceimplementation_spark.sources.tables import load_table

    out = eng.QUERIES["corpus_split"](spark, sf_dir).toPandas()
    fr = out["split"].value_counts(normalize=True)
    assert set(fr.index) == {"train", "val", "test"}
    assert 0.70 <= fr["train"] <= 0.90
    assert out["bucket"].between(0, 99).all()

    # subset invariance: RECOMPUTE the bucket over a genuinely filtered
    # corpus (a different plan) — every overlapping doc must land in the
    # same bucket, i.e. membership is a pure function of doc_id
    sub = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 2 == 0)
        .select(
            "doc_id",
            (hash64(F.concat(F.lit("split-"), F.col("doc_id").cast("string"))) % 100)
            .alias("bucket"),
        )
        .toPandas()
        .set_index("doc_id")["bucket"]
    )
    full = out.set_index("doc_id")["bucket"]
    assert len(sub) > 0
    assert (sub == full.loc[sub.index]).all()


def test_events_value_percentiles_ordering(spark, sf_dir):
    """B17: percentiles are ordered and counts cover the table."""
    out = eng.QUERIES["events_value_percentiles"](spark, sf_dir).toPandas()
    assert (out["p50"] <= out["p90"]).all() and (out["p90"] <= out["p99"]).all()
    from mapreduceimplementation_spark.sources.tables import load_table

    assert out["n"].sum() == load_table(spark, sf_dir, "events").count()


def test_approx_percentile_within_exact_envelope(spark, sf_dir):
    """B17's scale story: at 100 TB the operator swaps to approx_percentile
    — verify the approximation actually lands near the exact baseline so
    the swap is safe (p50/p90 within 5% relative error at accuracy=10k)."""
    from pyspark.sql import functions as F

    from mapreduceimplementation_spark.sources.tables import load_table

    exact = (
        eng.QUERIES["events_value_percentiles"](spark, sf_dir)
        .toPandas()
        .set_index("event_type")
    )
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    approx = (
        ev.groupBy("event_type")
        .agg(
            F.percentile_approx("value", 0.5, 10000).alias("a50"),
            F.percentile_approx("value", 0.9, 10000).alias("a90"),
        )
        .toPandas()
        .set_index("event_type")
    )
    for et in exact.index:
        assert abs(approx.loc[et, "a50"] - exact.loc[et, "p50"]) <= 0.05 * abs(
            exact.loc[et, "p50"]
        )
        assert abs(approx.loc[et, "a90"] - exact.loc[et, "p90"]) <= 0.05 * abs(
            exact.loc[et, "p90"]
        )


def test_running_total_final_prefix_equals_group_sum(spark, sf_dir):
    """B18: each user's last prefix equals the order-independent dsum of
    their values, and prefixes are per-user monotone in seq coverage."""
    from pyspark.sql import functions as F

    from mapreduceimplementation_spark.functions.stable import dsum
    from mapreduceimplementation_spark.sources.tables import load_table

    out = eng.QUERIES["events_running_total"](spark, sf_dir).toPandas()
    last = out.loc[out.groupby("user_id")["seq"].idxmax()].set_index("user_id")
    totals = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(dsum("value").alias("t"))
        .toPandas()
        .set_index("user_id")["t"]
    )
    for uid, row in last.iterrows():
        assert abs(row["running_total"] - totals[uid]) < 1e-6
    counts = out.groupby("user_id")["seq"].agg(["max", "size"])
    assert (counts["max"] == counts["size"]).all()


def test_events_minutely_csv_equals_parquet_twin(spark, sf_dir):
    """B21 format parity: the CSV read must be value-identical to the
    parquet read (quote/escape handling, µs timestamps, double repr)."""
    a = sorted(map(repr, eng.QUERIES["events_minutely"](spark, sf_dir).collect()))
    b = sorted(map(repr, eng.QUERIES["events_minutely_csv"](spark, sf_dir).collect()))
    assert a == b


def test_rollup_levels_are_consistent(spark, sf_dir):
    """B20: subtotals must equal the sum of their cells, the grand total
    the sum of the subtotals."""
    out = eng.QUERIES["events_rollup"](spark, sf_dir).toPandas()
    cells = out[out["day"].notna() & out["event_type"].notna()]
    day_subs = out[out["day"].notna() & out["event_type"].isna()]
    grand = out[out["day"].isna() & out["event_type"].isna()]
    assert len(grand) == 1
    assert int(grand["n_events"].iloc[0]) == int(cells["n_events"].sum())
    by_day = cells.groupby("day")["n_events"].sum()
    for _, r in day_subs.iterrows():
        assert int(r["n_events"]) == int(by_day[r["day"]])


def test_approx_count_distinct_within_exact_envelope(spark, sf_dir):
    """B7's scale story: a 100 TB feed swaps countDistinct(user_id) for
    approx_count_distinct (HLL++, mergeable, bounded memory) — verify the
    sketch lands within 5% of the exact per-type distinct-user counts at
    rsd=0.02 so the swap is safe."""
    from pyspark.sql import functions as F

    from mapreduceimplementation_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    both = (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact"),
            F.approx_count_distinct("user_id", 0.02).alias("approx"),
        )
        .toPandas()
    )
    assert len(both) > 0
    for _, r in both.iterrows():
        assert abs(r["approx"] - r["exact"]) <= 0.05 * r["exact"], dict(r)


def test_source_mix_weights_normalized(spark, sf_dir, duck):
    """C23: weights are a probability distribution (sum ~= 1 up to final
    rounding), monotone in token count, and match the DuckDB oracle."""
    from tests.conftest import assert_same_result

    df = eng.QUERIES["source_mix_weights"](spark, sf_dir)
    assert_same_result(df, duck, eng.ORACLES["source_mix_weights"])

    out = df.toPandas().sort_values("n_tokens")
    assert abs(out["weight"].sum() - 1.0) < 1e-4
    assert out["weight"].is_monotonic_increasing
    assert (out["weight"] > 0).all()


def test_corpus_decontaminate_semantics(spark, sf_dir, duck):
    """C27: flagged docs are never eval docs, overlap counts are sane
    (0 < n_shared <= n_shingles), and a brute-force Python recheck of one
    flagged doc confirms it really shares an n-gram with the eval set."""
    import re

    from mapreduceimplementation_spark.operators.pipeline import (
        _DECON_EVAL_MOD,
        _DECON_N,
    )
    from mapreduceimplementation_spark.sources.tables import load_table
    from tests.conftest import assert_same_result

    df = eng.QUERIES["corpus_decontaminate"](spark, sf_dir)
    assert_same_result(df, duck, eng.ORACLES["corpus_decontaminate"])

    out = df.toPandas()
    assert len(out) > 0
    assert (out["doc_id"] % _DECON_EVAL_MOD != 0).all()
    assert ((out["n_shared"] > 0) & (out["n_shared"] <= out["n_shingles"])).all()

    def shingles(text):
        ws = [w for w in re.split(r"[^A-Za-z]+", text) if w]
        return {
            " ".join(ws[i : i + _DECON_N])
            for i in range(len(ws) - _DECON_N + 1)
        }

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").toPandas()
    ev_sh = set()
    for _, r in docs[docs["doc_id"] % _DECON_EVAL_MOD == 0].iterrows():
        if r["text"]:
            ev_sh |= shingles(r["text"])
    flagged = int(out.iloc[0]["doc_id"])
    text = docs.set_index("doc_id").loc[flagged, "text"]
    shared = shingles(text) & ev_sh
    assert len(shared) == int(out.iloc[0]["n_shared"])


def test_corpus_pack_sequences_invariants(spark, sf_dir, duck):
    """C29: within each bucket, the hash-ordered docs tile the token
    stream with no gaps or overlaps (each doc starts exactly where the
    previous ended), offsets stay inside the budget, and seq_ids are the
    cumulative-sum chunks they claim to be."""
    from mapreduceimplementation_spark.functions.hashing import py_hash64
    from mapreduceimplementation_spark.operators.pipeline import (
        _PACK_BUCKETS,
        _PACK_BUDGET,
    )
    from tests.conftest import assert_same_result

    df = eng.QUERIES["corpus_pack_sequences"](spark, sf_dir)
    assert_same_result(df, duck, eng.ORACLES["corpus_pack_sequences"])

    out = df.toPandas()
    assert out["offset_tokens"].between(0, _PACK_BUDGET - 1).all()
    out["h"] = out["doc_id"].map(lambda d: py_hash64(f"pack-{d}"))
    assert (out["bucket"] == out["h"] % _PACK_BUCKETS).all()
    for bucket, g in out.groupby("bucket"):
        g = g.sort_values(["h", "doc_id"])
        start = 0
        for _, r in g.iterrows():
            assert r["seq_id"] == (bucket << 40) + start // _PACK_BUDGET
            assert r["offset_tokens"] == start % _PACK_BUDGET
            start += r["n_tokens"]


def test_bloom_membership_matches_oracle(spark, sf_dir, duck):
    from tests.conftest import assert_same_result

    df = eng.QUERIES["bloom_membership"](spark, sf_dir)
    assert_same_result(df, duck, eng.ORACLES["bloom_membership"])


def test_bloom_membership_properties(spark, sf_dir):
    """C33: the Bloom contract — zero false negatives (every blocklist
    doc is a hit), one row per corpus doc, and the fp rate stays inside
    the (1-e^(-kn/m))^k envelope with slack for hash variance."""
    import math

    from mapreduceimplementation_spark.operators.pipeline import (
        _BLOOM_K,
        _BLOOM_M,
    )

    out = eng.QUERIES["bloom_membership"](spark, sf_dir).toPandas()
    n_docs = out["doc_id"].nunique()
    assert len(out) == n_docs
    blocked = out[out["in_blocklist"]]
    assert len(blocked) > 0
    assert blocked["bloom_hit"].all(), "false negative: impossible for a Bloom filter"
    clean = out[~out["in_blocklist"]]
    fp = clean["bloom_hit"].mean()
    n = len(blocked)
    expected = (1 - math.exp(-_BLOOM_K * n / _BLOOM_M)) ** _BLOOM_K
    assert fp <= max(4 * expected, 0.02), (fp, expected, n)


def test_bloom_probe_is_broadcast(spark, sf_dir):
    """The bit array must reach the probe as a one-row broadcast — the
    corpus is never shuffled for membership."""
    df = eng.QUERIES["bloom_membership"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_dsir_importance_brute_force(spark):
    """C64: on a hand corpus, every per-doc DSIR score equals an
    independent Python re-derivation of the paper's estimator — hashed
    unigram buckets, add-1-smoothed target/raw log-likelihood ratio
    quantized to 9dp decimal, exact decimal per-doc sum — and the
    selection flag matches the corpus-mean cut."""
    import math
    import os
    import re
    import tempfile
    from collections import Counter
    from decimal import Decimal

    import pytest

    from mapreduceimplementation_spark.functions.hashing import py_hash64
    from mapreduceimplementation_spark.operators.pipeline import (
        _DSIR_B,
        _DSIR_TARGET_LANG,
        dsir_importance,
    )

    texts = {
        1: ("en", "the quick brown fox jumps over the lazy dog again and again"),
        2: ("en", "data selection via importance resampling picks target like text"),
        3: ("de", "der schnelle braune fuchs springt wieder und wieder"),
        4: ("de", "daten auswahl nach wichtigkeit gewichtet den korpus"),
        5: ("en", "the target distribution is formal english text the paper says"),
        6: ("fr", "le renard brun rapide saute encore et encore"),
        7: ("en", "importance weights favor documents that look like the target"),
        8: ("de", "noch ein deutsches dokument ohne englische woerter"),
    }

    def words(t):
        return [w for w in re.split(r"[^a-z]+", t.lower()) if w]

    def bucket(w):
        return py_hash64("dsir-" + w) % _DSIR_B

    cr, ct = Counter(), Counter()
    for _, (lang, t) in texts.items():
        for w in words(t):
            b = bucket(w)
            cr[b] += 1
            if lang == _DSIR_TARGET_LANG:
                ct[b] += 1
    nr, nt = sum(cr.values()), sum(ct.values())

    def half_away9(q):
        scaled = q * 1e9
        r = -math.floor(-scaled + 0.5) if scaled < 0 else math.floor(scaled + 0.5)
        return Decimal(r) / Decimal(10**9)

    llr = {
        b: half_away9(
            math.log(
                ((ct[b] + 1.0) * (nr + _DSIR_B))
                / ((cr[b] + 1.0) * (nt + _DSIR_B))
            )
        )
        for b in cr
    }

    expect = {}
    for doc_id, (lang, t) in texts.items():
        ws = words(t)
        raw = sum((llr[bucket(w)] for w in ws), Decimal(0))
        expect[doc_id] = (lang, len(ws), raw)
    mean = float(sum((r for _, _, r in expect.values()), Decimal(0))) / len(expect)

    rows = [(d, lang, t) for d, (lang, t) in sorted(texts.items())]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        out = dsir_importance(spark, d).toPandas().set_index("doc_id")

    assert sorted(out.index) == sorted(texts)
    n_sel = 0
    for doc_id, (lang, n_words, raw) in expect.items():
        row = out.loc[doc_id]
        assert row["lang"] == lang
        assert row["n_words"] == n_words
        assert row["dsir_score"] == pytest.approx(float(raw), abs=1e-9)
        # the fixture must not sit on the mean boundary
        assert abs(float(raw) - mean) > 1e-6, (doc_id, raw, mean)
        assert bool(row["selected"]) == (float(raw) > mean), doc_id
        n_sel += bool(row["selected"])
    # target-language docs must skew selected: the estimator's whole point
    sel_langs = [expect[d][0] for d in expect if bool(out.loc[d, "selected"])]
    uns_langs = [expect[d][0] for d in expect if not bool(out.loc[d, "selected"])]
    assert 0 < n_sel < len(expect)
    en_sel = sel_langs.count("en") / len(sel_langs)
    en_uns = uns_langs.count("en") / len(uns_langs)
    assert en_sel > en_uns, (sel_langs, uns_langs)


def test_dsir_model_is_broadcast(spark, sf_dir):
    """C64 scale shape (checkpoint=False exposes the full lineage the
    production localCheckpoints truncate): the 512-row log-ratio table
    reaches the scoring pass as the BUILD side of a BroadcastHashJoin,
    the one-row totals/mean joins are broadcast NLJ, and nothing flips
    to sort-merge or cartesian — the corpus word stream is never the
    build side of anything."""
    from mapreduceimplementation_spark.operators.pipeline import dsir_importance

    df = dsir_importance(spark, sf_dir, checkpoint=False)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 1, plan
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "ShuffledHashJoin" not in plan, plan


def test_quality_classifier_python_twin(spark):
    """C71: on a hand corpus, the distributed fixed-point trainer's final
    per-doc scores equal a pure-Python integer re-derivation of the whole
    run — ppm featurization, integer mean-centering, 6 hard-sigmoid
    gradient steps with the exact round() semantics — bit for bit."""
    import os
    import tempfile

    from mapreduceimplementation_spark.functions.hashing import py_hash64
    from mapreduceimplementation_spark.operators.pipeline import (
        _QC_DIM,
        _QC_ITERS,
        _QC_SCALE,
        quality_classifier,
    )

    # stop-dense docs (label True) vs stop-sparse (False), one empty-ish
    texts = {
        1: "the quick fox and a dog saw the cat in a box by the door",
        2: "data pipeline shuffles rows across partitions for aggregation",
        3: "a man and the woman took a walk by the sea in the morning",
        4: "vector quantization codebooks compress embeddings efficiently",
        5: "the a the a the a filler stop words dominate this one",
        6: "broadcast joins avoid shuffling small dimension tables entirely",
        7: "a tale of the river and the hill and a quiet the valley",
        8: "catalyst optimizer prunes columns and pushes predicates down",
        9: "the engine scans a parquet file and the rows stream onward",
        10: "executors spill sorted runs when aggregation state exceeds memory",
    }

    def rnd(x):
        # round-half-away-from-zero (both engines' round() on DOUBLE)
        import math

        return -math.floor(-x + 0.5) if x < 0 else math.floor(x + 0.5)

    X, Y, ids = [], [], []
    for doc_id in sorted(texts):
        ws = [w for w in texts[doc_id].split(" ") if w]
        n = len(ws)
        cnt = [0] * _QC_DIM
        for w in ws:
            cnt[py_hash64(w, salt="qc-") % _QC_DIM] += 1
        X.append([rnd(_QC_SCALE * c / n) for c in cnt] + [1000000])
        nstop = sum(1 for w in ws if w in ("the", "a"))
        Y.append(1000000 if 10 * nstop >= n else 0)
        ids.append(doc_id)
    ndim = _QC_DIM + 1
    nd = len(X)
    mu = [rnd(sum(x[j] for x in X) * 1.0 / nd) for j in range(_QC_DIM)] + [0]
    Xc = [[x[j] - mu[j] for j in range(ndim)] for x in X]

    def forward(w, x):
        z = rnd(sum(a * b for a, b in zip(w, x)) / 1e6)
        return min(1000000, max(0, 500000 + rnd(z / 4.0)))

    w = [0] * ndim
    for _ in range(_QC_ITERS):
        ps = [forward(w, x) for x in Xc]
        g = [
            sum((y - p) * x[j] for x, y, p in zip(Xc, Y, ps))
            for j in range(ndim)
        ]
        w = [w[j] + rnd(8.0 * g[j] / (1e6 * nd)) for j in range(ndim)]
    expect = {i: forward(w, x) for i, x in zip(ids, Xc)}

    # both labels present, or the fixture tests nothing
    assert 0 < sum(1 for y in Y if y) < len(Y)

    rows = [(d, texts[d]) for d in sorted(texts)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        out = quality_classifier(spark, d).toPandas().set_index("doc_id")

    assert sorted(out.index) == ids
    for i, doc_id in enumerate(ids):
        row = out.loc[doc_id]
        assert int(row["p_micro"]) == expect[doc_id], (
            doc_id,
            int(row["p_micro"]),
            expect[doc_id],
        )
        assert bool(row["label"]) == (Y[i] == 1000000)
        assert bool(row["pred"]) == (expect[doc_id] >= 500000)
        assert bool(row["correct"]) == (
            (Y[i] == 1000000) == (expect[doc_id] >= 500000)
        )


def test_quality_classifier_learns(spark, sf_dir):
    """C71: on the synthetic corpus the trained model must BEAT the
    majority-class base rate with a non-degenerate prediction mix —
    the regression guard against the all-False local optimum that
    uncentered features converge to."""
    out = eng.QUERIES["quality_classifier"](spark, sf_dir).toPandas()
    base = max(out["label"].mean(), 1.0 - out["label"].mean())
    acc = out["correct"].mean()
    assert acc > base, (acc, base)
    assert 0 < out["pred"].sum() < len(out), out["pred"].sum()


def test_corpus_e2e_pipeline_attrition_invariants(spark, sf_dir, duck):
    """C73: stage counts are monotone non-increasing through the doc
    stages, every stage cuts something on the synthetic corpus, packing
    conserves the sampled tokens exactly, and the result matches the
    composed DuckDB oracle."""
    df = eng.QUERIES["corpus_e2e_pipeline"](spark, sf_dir)
    assert_same_result(df, duck, eng.ORACLES["corpus_e2e_pipeline"])
    rows = {r["stage"]: r for r in df.collect()}
    assert [rows[i]["name"] for i in range(6)] == [
        "raw", "screened", "deduped", "decontaminated", "sampled", "packed",
    ]
    for i in range(1, 5):
        assert rows[i]["n_units"] <= rows[i - 1]["n_units"]
        assert rows[i]["n_tokens"] <= rows[i - 1]["n_tokens"]
    # the synthetic corpus exercises every stage (nothing is a no-op)
    assert rows[1]["n_units"] < rows[0]["n_units"]
    assert rows[3]["n_units"] < rows[2]["n_units"]
    assert rows[4]["n_units"] < rows[3]["n_units"]
    # packing re-chunks but never drops tokens
    assert rows[5]["n_tokens"] == rows[4]["n_tokens"]
    assert rows[5]["n_units"] <= max(rows[4]["n_units"], 1)


def test_corpus_e2e_pipeline_single_corpus_scan(spark, sf_dir):
    """C73's composition contract: the corpus text is materialized ONCE —
    the production plan (checkpoint=True) contains ZERO parquet scans
    (every stage reads the checkpointed base), and the un-checkpointed
    lineage shows how many times the stages WOULD re-derive the scan
    (> 1), which is exactly what the checkpoint is buying."""
    from mapreduceimplementation_spark.operators.pipeline import (
        corpus_e2e_pipeline,
    )

    prod = corpus_e2e_pipeline(spark, sf_dir, checkpoint=True)
    plan = prod._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" not in plan, plan
    assert "CartesianProduct" not in plan, plan

    raw = corpus_e2e_pipeline(spark, sf_dir, checkpoint=False)
    rawplan = raw._jdf.queryExecution().executedPlan().toString()
    assert rawplan.count("Scan parquet") > 1


# ---------------------------------------------------------------------------
# C77 corpus_shuffle_shards


def test_shuffle_shards_manifest_invariants(spark, sf_dir):
    """Loader-manifest contract: shards partition the corpus, positions are
    contiguous 1..n per shard, start_offset is the exact prefix sum of
    preceding docs' n_chars, and shards are contiguous key ranges (the
    property that makes the physical write a range partition, not a
    global sort)."""
    from mapreduceimplementation_spark.functions.hashing import py_hash64

    rows = eng.QUERIES["corpus_shuffle_shards"](spark, sf_dir).collect()
    shards = {}
    for r in rows:
        shards.setdefault(r["shard"], []).append(r)
    assert len(shards) == 16 and sum(len(v) for v in shards.values()) == len(rows)
    key = lambda r: py_hash64(f"shuf-{r['doc_id']}")
    maxmin = []
    for s, grp in shards.items():
        grp.sort(key=lambda r: r["pos_in_shard"])
        assert [r["pos_in_shard"] for r in grp] == list(range(1, len(grp) + 1))
        off = 0
        for r in grp:
            assert r["start_offset"] == off
            off += r["n_chars"]
        ks = [key(r) for r in grp]
        assert ks == sorted(ks)  # pos order IS key order
        assert all(k >> 56 == s for k in ks)
        maxmin.append((s, min(ks), max(ks)))
    maxmin.sort()
    for (s1, _, hi), (s2, lo, _) in zip(maxmin, maxmin[1:]):
        assert hi < lo  # contiguous, disjoint key ranges


def test_shuffle_shards_rerun_and_growth_stable(spark, sf_dir):
    """Appending a doc must not move any existing doc's shard or relative
    order (pure-function permutation): recompute on a corpus minus one
    doc and check survivors keep their shard and key order."""
    import tempfile

    from pyspark.sql import functions as F

    from mapreduceimplementation_spark.sources.tables import load_table

    full = {r["doc_id"]: r for r in
            eng.QUERIES["corpus_shuffle_shards"](spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents")
    victim = min(full)
    with tempfile.TemporaryDirectory() as d:
        docs.where(F.col("doc_id") != victim).write.mode("overwrite").parquet(
            f"{d}/documents.parquet"
        )
        sub = {r["doc_id"]: r for r in
               eng.QUERIES["corpus_shuffle_shards"](spark, d).collect()}
    assert set(sub) == set(full) - {victim}
    for did, r in sub.items():
        assert r["shard"] == full[did]["shard"]
    # relative order within each shard is preserved
    for s in {r["shard"] for r in sub.values()}:
        order_sub = [d_ for d_, r in sorted(sub.items(), key=lambda kv: kv[1]["pos_in_shard"]) if r["shard"] == s]
        order_full = [d_ for d_, r in sorted(full.items(), key=lambda kv: kv[1]["pos_in_shard"])
                      if r["shard"] == s and d_ != victim]
        assert order_sub == order_full


# ---------------------------------------------------------------------------
# C79 source_kl_divergence


def test_source_kl_matches_python_twin(spark, sf_dir):
    """Brute-force Python twin: recompute each source's smoothed
    hashed-unigram KL with the same 12dp per-bucket quantization — the
    decimal fold must make Spark's result exactly equal (1e-12 slack for
    the final double cast only), and every KL must be non-negative
    (Gibbs) with at least one source measurably off the mix."""
    import math
    import re
    from decimal import Decimal, ROUND_HALF_UP

    from mapreduceimplementation_spark.functions.hashing import py_hash64
    from mapreduceimplementation_spark.operators.pipeline import _KL_B, _KL_DP
    from mapreduceimplementation_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("source", "text").collect()
    sb, ns, cb = {}, {}, {}
    for r in docs:
        if r["text"] is None:
            continue
        for w in re.split("[^a-z]+", r["text"].lower()):
            if not w:
                continue
            b = py_hash64("dsir-" + w) % _KL_B
            sb[(r["source"], b)] = sb.get((r["source"], b), 0) + 1
            ns[r["source"]] = ns.get(r["source"], 0) + 1
            cb[b] = cb.get(b, 0) + 1
    n = sum(cb.values())
    grain = Decimal(1).scaleb(-_KL_DP)
    want = {}
    for s, nt in ns.items():
        acc = Decimal(0)
        for b in range(_KL_B):
            p = (sb.get((s, b), 0) + 1.0) / (nt + float(_KL_B))
            q = (cb.get(b, 0) + 1.0) / (n + float(_KL_B))
            acc += Decimal(p * math.log(p / q)).quantize(
                grain, rounding=ROUND_HALF_UP
            )
        want[s] = (nt, float(acc))
    got = {
        r["source"]: (r["n_tokens"], r["kl_nats"])
        for r in eng.QUERIES["source_kl_divergence"](spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for s in want:
        assert got[s][0] == want[s][0]
        assert abs(got[s][1] - want[s][1]) < 1e-12, (s, got[s], want[s])
        assert got[s][1] >= 0.0
    assert max(v[1] for v in got.values()) > 0.001
