"""Tests for the analytics/corpus operators (SURVEY.md §2): B23 funnel,
B24 retention, B25 basket pairs, B26 anomaly z-scores, B27 TPC-H Q18,
C19 term vectors, C20 stratified sampling — oracle parity, invariants,
and seeded-random Python-model cross-checks."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

import mapreduceimplementation_spark as eng
from tests.conftest import assert_same_result

eng.load_all_operators()


# ---------------------------------------------------------------------------
# B23 events_funnel


def test_funnel_matches_oracle(spark, sf_dir, duck):
    df = eng.QUERIES["events_funnel"](spark, sf_dir)
    assert_same_result(df, duck, eng.ORACLES["events_funnel"])


def test_funnel_is_monotone(spark, sf_dir):
    """Each stage requires the previous one, so counts never increase."""
    rows = {
        r["stage"]: r["n_users"]
        for r in eng.QUERIES["events_funnel"](spark, sf_dir).collect()
    }
    assert set(rows) == {"1_view", "2_click", "3_purchase"}
    assert rows["1_view"] >= rows["2_click"] >= rows["3_purchase"]
    assert rows["1_view"] > 0


def test_funnel_ordering_semantics_inline(spark):
    """Ordering matters: a click BEFORE the first view does not advance the
    funnel, a click after it does; ties (same ts) do not count (strict >)."""
    t = datetime
    rows = [
        # user 1: full ordered funnel
        (1, 1, t(2024, 1, 1, 10, 0), "view", 0.0),
        (2, 1, t(2024, 1, 1, 10, 1), "click", 0.0),
        (3, 1, t(2024, 1, 1, 10, 2), "purchase", 0.0),
        # user 2: click precedes view -> stalls at view
        (4, 2, t(2024, 1, 1, 10, 0), "click", 0.0),
        (5, 2, t(2024, 1, 1, 10, 1), "view", 0.0),
        (6, 2, t(2024, 1, 1, 10, 2), "purchase", 0.0),
        # user 3: click at the SAME instant as view -> strict > rejects it
        (7, 3, t(2024, 1, 1, 10, 0), "view", 0.0),
        (8, 3, t(2024, 1, 1, 10, 0), "click", 0.0),
        # user 4: never views
        (9, 4, t(2024, 1, 1, 10, 0), "purchase", 0.0),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string, value double",
    )
    df.createOrReplaceTempView("_funnel_inline")

    from unittest import mock

    import mapreduceimplementation_spark.plans.events as ev_mod

    with mock.patch.object(
        ev_mod, "load_table", lambda spark, sf_dir, name: spark.table("_funnel_inline")
    ):
        out = {
            r["stage"]: r["n_users"]
            for r in eng.QUERIES["events_funnel"](spark, "ignored").collect()
        }
    assert out == {"1_view": 3, "2_click": 1, "3_purchase": 1}


def test_funnel_plan_single_events_scan(spark, sf_dir):
    """The chained-window formulation reads events ONCE — a join-per-stage
    funnel would scan and shuffle the table once per stage."""
    from tests.conftest import formatted_plan

    plan = formatted_plan(eng.QUERIES["events_funnel"](spark, sf_dir))
    # one "Location:" line per scan node in the detail section
    assert plan.count("Location:") == 1, plan
    # and the three stage minima share ONE user_id exchange (the only other
    # exchange is the tiny single-partition final count)
    assert plan.count("hashpartitioning(user_id") == 1, plan


# ---------------------------------------------------------------------------
# C19 top_terms_per_source


def test_top_terms_matches_oracle(spark, sf_dir, duck):
    df = eng.QUERIES["top_terms_per_source"](spark, sf_dir)
    assert_same_result(df, duck, eng.ORACLES["top_terms_per_source"])


def test_top_terms_k_per_source(spark, sf_dir):
    import collections

    rows = eng.QUERIES["top_terms_per_source"](spark, sf_dir).collect()
    per_source = collections.Counter(r["source"] for r in rows)
    assert per_source and all(n <= 5 for n in per_source.values())
    for r in rows:
        assert 1 <= r["rank"] <= 5


# ---------------------------------------------------------------------------
# C20 corpus_sample_stratified


def test_sample_matches_oracle(spark, sf_dir, duck):
    df = eng.QUERIES["corpus_sample_stratified"](spark, sf_dir)
    assert_same_result(df, duck, eng.ORACLES["corpus_sample_stratified"])


def test_sample_is_deterministic_and_stratified(spark, sf_dir):
    """Re-running yields the identical doc set (pure function of doc_id),
    every kept row respects its language's rate bound, and the kept
    fraction of each language is in a loose band around its rate."""
    from mapreduceimplementation_spark.operators.pipeline import _SAMPLE_RATES

    q = eng.QUERIES["corpus_sample_stratified"]
    a = {r["doc_id"]: (r["lang"], r["bucket"]) for r in q(spark, sf_dir).collect()}
    b = {r["doc_id"]: (r["lang"], r["bucket"]) for r in q(spark, sf_dir).collect()}
    assert a == b and a
    for lang, bucket in a.values():
        assert bucket < _SAMPLE_RATES[lang]

    from mapreduceimplementation_spark.sources.tables import load_table

    totals = {
        r["lang"]: r["n"]
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    import collections

    kept = collections.Counter(lang for lang, _ in a.values())
    for lang, rate in _SAMPLE_RATES.items():
        if totals.get(lang, 0) >= 50:
            frac = kept[lang] / totals[lang]
            assert abs(frac - rate / 100) < 0.25, (lang, frac, rate)


def test_sample_membership_is_pure_function(spark, sf_dir):
    """Growth stability reduces to: membership is a pure function of
    (doc_id, lang) via the portable hash — recompute every decision with
    the Python hash64 twin and require exact agreement.  (A cross-sf
    subset check is not valid on this testdata: each scale factor draws
    document langs independently, so the same doc_id can legitimately be
    in one sf's sample and out of another's.)"""
    from mapreduceimplementation_spark.functions.hashing import py_hash64
    from mapreduceimplementation_spark.operators.pipeline import _SAMPLE_RATES
    from mapreduceimplementation_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang").collect()
    expected = {
        r["doc_id"]
        for r in docs
        if py_hash64(f"sample-{r['doc_id']}") % 100 < _SAMPLE_RATES.get(r["lang"], 0)
    }
    got = {
        r["doc_id"]
        for r in eng.QUERIES["corpus_sample_stratified"](spark, sf_dir).collect()
    }
    assert got == expected and got


# ---------------------------------------------------------------------------
# B24 events_retention


def test_retention_matches_oracle(spark, sf_dir, duck):
    df = eng.QUERIES["events_retention"](spark, sf_dir)
    assert_same_result(df, duck, eng.ORACLES["events_retention"])


def test_retention_invariants(spark, sf_dir):
    """Offset-0 cell equals the cohort's size (every cohorted user is by
    definition active on their first day), no negative offsets, no cell
    exceeds its cohort's day-0 count, and cohort sizes sum to the
    distinct-user total."""
    from mapreduceimplementation_spark.sources.tables import load_table

    out = eng.QUERIES["events_retention"](spark, sf_dir).toPandas()
    assert (out["day_offset"] >= 0).all()
    day0 = out[out["day_offset"] == 0].set_index("cohort_day")["n_users"]
    for cohort, grp in out.groupby("cohort_day"):
        assert (grp["n_users"] <= day0[cohort]).all()
    n_users = (
        load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    assert day0.sum() == n_users


# ---------------------------------------------------------------------------
# B25 basket_pairs


def test_basket_pairs_matches_oracle(spark, sf_dir, duck):
    df = eng.QUERIES["basket_pairs"](spark, sf_dir)
    assert_same_result(df, duck, eng.ORACLES["basket_pairs"])


def test_basket_pairs_shape(spark, sf_dir):
    """Pairs are canonical (a < b), counts descending, at most 20 rows,
    and the top pair's count is verifiable by brute force."""
    out = eng.QUERIES["basket_pairs"](spark, sf_dir).toPandas()
    assert 0 < len(out) <= 20
    assert (out["part_a"] < out["part_b"]).all()
    assert out["n_orders"].is_monotonic_decreasing

    from mapreduceimplementation_spark.sources.tables import load_table

    top = out.iloc[0]
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    orders_a = {
        r["l_orderkey"]
        for r in li.where(f"l_partkey = {top['part_a']}").collect()
    }
    orders_b = {
        r["l_orderkey"]
        for r in li.where(f"l_partkey = {top['part_b']}").collect()
    }
    assert len(orders_a & orders_b) == top["n_orders"]


# ---------------------------------------------------------------------------
# B26 events_anomaly


def test_anomaly_matches_oracle(spark, sf_dir, duck):
    df = eng.QUERIES["events_anomaly"](spark, sf_dir)
    assert_same_result(df, duck, eng.ORACLES["events_anomaly"])


def test_anomaly_zscores_standardized(spark, sf_dir):
    """Per type: z-scores average to ~0 with population variance ~1 (the
    definition of standardization, up to final rounding), and every
    (day, type) daily cell appears exactly once."""
    out = eng.QUERIES["events_anomaly"](spark, sf_dir).toPandas()
    assert len(out) > 0
    assert not out.duplicated(["day", "event_type"]).any()
    for _, grp in out.groupby("event_type"):
        assert abs(grp["z"].mean()) < 1e-3
        assert abs(grp["z"].pow(2).mean() - 1.0) < 1e-2


def test_anomaly_plan_single_events_scan(spark, sf_dir):
    """B26 reads events ONCE: per-type stats are window sums over the
    aggregated daily cells, not a second aggregation branch."""
    from tests.conftest import formatted_plan

    plan = formatted_plan(eng.QUERIES["events_anomaly"](spark, sf_dir))
    assert plan.count("Location:") == 1, plan


def test_mix_weights_plan_no_second_tokenize(spark, sf_dir):
    """C23's normalizer fan-out reads the checkpointed rollup: the final
    plan contains no parquet scan at all (the single corpus scan ran
    inside the eager checkpoint) and exactly one regexp-count projection
    would have fed it."""
    from tests.conftest import formatted_plan

    plan = formatted_plan(eng.QUERIES["source_mix_weights"](spark, sf_dir))
    assert plan.count("Location:") == 0, plan
    assert "Scan ExistingRDD" in plan, plan


# ---------------------------------------------------------------------------
# B27 q18_large_orders


def test_q18_matches_oracle(spark, sf_dir, duck):
    df = eng.QUERIES["q18_large_orders"](spark, sf_dir)
    assert_same_result(df, duck, eng.ORACLES["q18_large_orders"])


def test_q18_threshold_and_order(spark, sf_dir):
    out = eng.QUERIES["q18_large_orders"](spark, sf_dir).toPandas()
    assert 0 < len(out) <= 20
    assert (out["sum_qty"] > 250).all()
    assert out["o_totalprice"].is_monotonic_decreasing


# ---------------------------------------------------------------------------
# randomized Python-model cross-checks (seeded): catches a semantic
# misreading that the Spark query and its SQL oracle might share


def _random_events(seed: int, n: int = 300, n_users: int = 12):
    import random
    from datetime import timedelta

    rng = random.Random(seed)
    types = ["view", "click", "purchase", "signup", "error"]
    base = datetime(2024, 1, 1)
    return [
        (
            i,
            rng.randrange(n_users),
            base + timedelta(seconds=rng.randrange(40 * 86400)),
            rng.choice(types),
            0.0,
        )
        for i in range(n)
    ]


def _with_inline_events(spark, rows, fn):
    from unittest import mock

    import mapreduceimplementation_spark.plans.events as ev_mod

    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string, value double",
    )
    df.createOrReplaceTempView("_model_inline")
    with mock.patch.object(
        ev_mod, "load_table", lambda spark, sf_dir, name: spark.table("_model_inline")
    ):
        return fn()


def test_funnel_matches_python_model_on_random_events(spark):
    rows = _random_events(seed=7)
    out = _with_inline_events(
        spark,
        rows,
        lambda: {
            r["stage"]: r["n_users"]
            for r in eng.QUERIES["events_funnel"](spark, "ignored").collect()
        },
    )

    by_user: dict = {}
    for _, uid, ts, et, _v in rows:
        by_user.setdefault(uid, []).append((ts, et))
    n_view = n_click = n_purchase = 0
    for evs in by_user.values():
        t_view = min((t for t, e in evs if e == "view"), default=None)
        if t_view is None:
            continue
        n_view += 1
        t_click = min(
            (t for t, e in evs if e == "click" and t > t_view), default=None
        )
        if t_click is None:
            continue
        n_click += 1
        if any(e == "purchase" and t > t_click for t, e in evs):
            n_purchase += 1
    assert out == {
        "1_view": n_view,
        "2_click": n_click,
        "3_purchase": n_purchase,
    }


def test_retention_matches_python_model_on_random_events(spark):
    rows = _random_events(seed=11)
    out = _with_inline_events(
        spark,
        rows,
        lambda: {
            (r["cohort_day"], r["day_offset"]): r["n_users"]
            for r in eng.QUERIES["events_retention"](spark, "ignored").collect()
        },
    )

    days: dict = {}
    for _, uid, ts, _et, _v in rows:
        days.setdefault(uid, set()).add(ts.replace(hour=0, minute=0, second=0))
    model: dict = {}
    for uds in days.values():
        cohort = min(uds)
        for d in uds:
            key = (cohort, (d - cohort).days)
            model[key] = model.get(key, 0) + 1
    assert out == model


# ---------------------------------------------------------------------------
# B28 events_minutely_incremental


def test_incremental_rollup_matches_oracle(spark, sf_dir, duck):
    df = eng.QUERIES["events_minutely_incremental"](spark, sf_dir)
    assert_same_result(df, duck, eng.ORACLES["events_minutely_incremental"])


def test_incremental_rollup_merges_straddled_window(spark):
    """A window with events on BOTH sides of the cut must come out as one
    merged row with the combined count and the exact decimal-merged sum —
    proven on inline events placed around the cut (the sf0.001 fixture's
    cut minute may legitimately be empty)."""
    from unittest import mock

    import mapreduceimplementation_spark.plans.events as ev_mod
    from mapreduceimplementation_spark.plans.events import _INC_CUT

    cut = datetime.strptime(_INC_CUT, "%Y-%m-%d %H:%M:%S")
    rows = [
        # same minute, either side of the mid-minute cut
        (1, 1, cut.replace(second=5), "click", 0.1),
        (2, 2, cut.replace(second=45), "click", 0.2),
        # base-only and delta-only minutes
        (3, 1, cut.replace(hour=1, second=0), "view", 1.5),
        (4, 2, cut.replace(hour=23, second=0), "view", 2.5),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string, value double",
    )
    df.createOrReplaceTempView("_inc_inline")
    with mock.patch.object(
        ev_mod, "load_table", lambda spark, sf_dir, name: spark.table("_inc_inline")
    ):
        out = {
            (r["minute"].strftime("%H:%M"), r["event_type"]): (
                r["n_events"],
                round(r["total_value"], 6),
            )
            for r in eng.QUERIES["events_minutely_incremental"](
                spark, "ignored"
            ).collect()
        }
    assert out == {
        ("12:30", "click"): (2, 0.3),  # merged across the cut
        ("01:30", "view"): (1, 1.5),
        ("23:30", "view"): (1, 2.5),
    }


def test_incremental_rollup_equals_full(spark, sf_dir):
    """On the fixture, the incremental result equals B7's full rollup on
    the shared columns."""
    inc = {
        (r["minute"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in eng.QUERIES["events_minutely_incremental"](spark, sf_dir).collect()
    }
    full = {
        (r["minute"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in eng.QUERIES["events_minutely"](spark, sf_dir).collect()
    }
    assert inc == full


def test_quality_lm_score_matches_python_model(spark, sf_dir, duck):
    """C28 against a from-scratch Python model: rebuild the sampled
    trigram stats and recompute one doc's mean log-prob with the same
    9-dp quantization — must match to the rounded digit.  Plus
    invariants: every score is negative (log-probs), every doc with >= 3
    chars scores, and OOV-free docs score above the penalty floor."""
    import math
    from decimal import Decimal

    from mapreduceimplementation_spark.operators.textmetrics import (
        _LM_SAMPLE_MOD,
    )
    from mapreduceimplementation_spark.sources.tables import load_table
    from tests.conftest import assert_same_result

    df = eng.QUERIES["quality_lm_score"](spark, sf_dir)
    assert_same_result(df, duck, eng.ORACLES["quality_lm_score"])
    out = df.toPandas().set_index("doc_id")
    assert (out["lm_score"] < 0).all()

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").toPandas()
    eligible = docs[docs["text"].map(lambda t: t is not None and len(t) >= 3)]
    assert set(out.index) == set(eligible["doc_id"])

    def tgs(t):
        lt = t.lower()
        return [lt[i : i + 3] for i in range(len(lt) - 2)]

    freq = {}
    for _, r in eligible[eligible["doc_id"] % _LM_SAMPLE_MOD == 0].iterrows():
        for tg in tgs(r["text"]):
            freq[tg] = freq.get(tg, 0) + 1
    n = sum(freq.values())
    pen = Decimal(str(round(math.log(0.5 / n), 9)))
    doc = eligible.iloc[0]
    lps = [
        Decimal(str(round(math.log(freq[tg] / n), 9))) if tg in freq else pen
        for tg in tgs(doc["text"])
    ]
    expect = round(float(sum(lps)) / len(lps), 6)
    assert out.loc[doc["doc_id"], "lm_score"] == expect
    assert out.loc[doc["doc_id"], "n_trigrams"] == len(lps)


# ---------------------------------------------------------------------------
# C41 corpus_chunk_overlap


def test_chunk_overlap_invariants(spark, sf_dir):
    from mapreduceimplementation_spark.operators.pipeline import (
        _CHUNK_STRIDE,
        _CHUNK_WORDS,
    )

    out = eng.QUERIES["corpus_chunk_overlap"](spark, sf_dir).toPandas()
    assert (out["start_word"] == out["chunk_id"] * _CHUNK_STRIDE).all()
    assert (out["n_chunk_words"] > 0).all()
    assert (out["n_chunk_words"] <= _CHUNK_WORDS).all()
    # every chunk except a doc's last is full-width
    last = out.groupby("doc_id")["chunk_id"].transform("max")
    assert (out.loc[out["chunk_id"] < last, "n_chunk_words"] == _CHUNK_WORDS).all()
    # chunk text has exactly n_chunk_words words
    assert (
        out["chunk_text"].str.split().str.len() == out["n_chunk_words"]
    ).all()


def test_chunk_overlap_window_algebra(spark):
    """Consecutive chunks overlap by width-stride words; a doc of exactly
    width words yields ONE chunk; width+1 words yields two, the second
    short."""
    from mapreduceimplementation_spark.operators.pipeline import (
        _CHUNK_STRIDE,
        _CHUNK_WORDS,
    )
    import tempfile

    w_exact = " ".join(f"w{i}" for i in range(_CHUNK_WORDS))
    w_plus = " ".join(f"p{i}" for i in range(_CHUNK_WORDS + 1))
    df = spark.createDataFrame(
        [(1, w_exact), (2, w_plus)], "doc_id long, text string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        out = eng.QUERIES["corpus_chunk_overlap"](spark, d).toPandas()
    one = out[out["doc_id"] == 1]
    two = out[out["doc_id"] == 2].sort_values("chunk_id")
    assert len(one) == 1 and one.iloc[0]["n_chunk_words"] == _CHUNK_WORDS
    assert len(two) == 2
    assert two.iloc[1]["start_word"] == _CHUNK_STRIDE
    assert two.iloc[1]["n_chunk_words"] == _CHUNK_WORDS + 1 - _CHUNK_STRIDE
    # the overlap: chunk 1's tail words reappear at chunk 2's head
    c0 = two.iloc[0]["chunk_text"].split()
    c1 = two.iloc[1]["chunk_text"].split()
    assert c0[_CHUNK_STRIDE:] == c1[: _CHUNK_WORDS - _CHUNK_STRIDE]


# ---------------------------------------------------------------------------
# C42 sample_uniform_k


def test_uniform_k_is_the_k_smallest_hashes(spark, sf_dir):
    from mapreduceimplementation_spark.functions.hashing import py_hash64
    from mapreduceimplementation_spark.operators.pipeline import _UNIFORM_K
    from mapreduceimplementation_spark.sources.tables import load_table

    out = eng.QUERIES["sample_uniform_k"](spark, sf_dir).toPandas()
    ids = [
        r["doc_id"]
        for r in load_table(spark, sf_dir, "documents").select("doc_id").collect()
    ]
    want = sorted(ids, key=lambda d: (py_hash64(f"usamp-{d}"), d))[:_UNIFORM_K]
    assert len(out) == _UNIFORM_K
    assert set(out["doc_id"]) == set(want)
    # reservoir property: the sample over a GROWN corpus differs from the
    # old sample only by displacement from the top — i.e. old sample minus
    # new sample ⊆ hashes above the new threshold
    thresh = out["rank_hash"].max()
    assert all(py_hash64(f"usamp-{d}") >= thresh for d in set(ids) - set(out["doc_id"]))


# ---------------------------------------------------------------------------
# C43 pii_scrub


def test_pii_scrub_detects_injected_only(spark, sf_dir):
    out = eng.QUERIES["pii_scrub"](spark, sf_dir).toPandas()
    inj = out[out["pii_injected"]]
    clean = out[~out["pii_injected"]]
    assert len(inj) > 0 and len(clean) > 0
    # the injected contact line carries exactly one of each PII class
    assert (inj["n_emails"] == 1).all()
    assert (inj["n_phones"] == 1).all()
    assert (inj["n_ips"] == 1).all()
    # the letters-only corpus has no organic PII
    assert (clean[["n_emails", "n_phones", "n_ips"]] == 0).all().all()


def test_pii_scrub_redaction_order(spark):
    """Phones are redacted before IPs are counted, so a dotted quad inside
    a phone-free text counts once and a phone never double-counts; the
    scrubbed text replaces ALL occurrences."""
    import hashlib
    import tempfile

    from mapreduceimplementation_spark.functions.hashing import py_hash64
    from mapreduceimplementation_spark.operators.textmetrics import (
        _PII_EVERY,
    )

    # Compute a non-injected doc_id from the operator's own hash split so
    # the test can never pass vacuously: if _PII_EVERY or the salt ever
    # changes, this recomputes (and the assertion below re-verifies).
    doc_id = next(
        i for i in range(1, 100) if py_hash64(f"pii-{i}") % _PII_EVERY != 0
    )
    txt = "mail me at a@b.io or a@b.io call 555-123-4567 host 10.0.0.1"
    df = spark.createDataFrame([(doc_id, txt)], "doc_id long, text string")
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        out = eng.QUERIES["pii_scrub"](spark, d).toPandas()
    r = out.iloc[0]
    assert not r["pii_injected"], "chosen doc_id must be non-injected"
    assert r["n_emails"] == 2 and r["n_phones"] == 1 and r["n_ips"] == 1
    scrub = "mail me at <EMAIL> or <EMAIL> call <PHONE> host <IP>"
    assert r["scrubbed_hash"] == hashlib.md5(scrub.encode()).hexdigest()


# ---------------------------------------------------------------------------
# C44 ngram_duplication


def test_ngram_duplication_hand_corpus(spark):
    import tempfile

    shared = "alpha beta gamma delta epsilon"  # one shared 5-gram
    d1 = shared + " one two three four five"
    d2 = shared + " six seven eight nine ten"
    d3 = "red orange yellow green blue indigo"
    df = spark.createDataFrame(
        [(1, d1), (2, d2), (3, d3)], "doc_id long, text string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        out = {
            r["doc_id"]: r.asDict()
            for r in eng.QUERIES["ngram_duplication"](spark, d).collect()
        }
    # docs 1/2: 6 shingles each (10 words), exactly 1 duplicated
    assert out[1]["n_shingles"] == 6 and out[1]["n_dup_shingles"] == 1
    assert out[2]["n_shingles"] == 6 and out[2]["n_dup_shingles"] == 1
    # doc 3: 2 shingles, none shared
    assert out[3]["n_shingles"] == 2 and out[3]["n_dup_shingles"] == 0
    assert out[3]["dup_frac"] == 0.0


def test_ngram_duplication_bounds(spark, sf_dir):
    out = eng.QUERIES["ngram_duplication"](spark, sf_dir).toPandas()
    assert (out["n_dup_shingles"] <= out["n_shingles"]).all()
    assert ((out["dup_frac"] >= 0) & (out["dup_frac"] <= 1)).all()


# ---------------------------------------------------------------------------
# C46 bpe_pair_counts


def test_bpe_pair_counts_hand_corpus(spark):
    import tempfile

    df = spark.createDataFrame(
        [(1, "aaab aaab Zq"), (2, "ab")], "doc_id long, text string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        out = {
            r["pair"]: r["cnt"]
            for r in eng.QUERIES["bpe_pair_counts"](spark, d).collect()
        }
    # "aaab" x2 -> pairs aa,aa,ab per token; "zq" (lowercased) -> zq;
    # "ab" -> ab; single-letter runs contribute nothing
    assert out == {"aa": 4, "ab": 3, "zq": 1}


def test_bpe_pair_counts_order(spark, sf_dir):
    rows = eng.QUERIES["bpe_pair_counts"](spark, sf_dir).collect()
    cnts = [r["cnt"] for r in rows]
    assert cnts == sorted(cnts, reverse=True)
    assert all(len(r["pair"]) == 2 for r in rows)


# ---------------------------------------------------------------------------
# C50 corpus_sample_weighted


def test_weighted_sample_is_top_k_es_keys(spark, sf_dir):
    """The drawn set and its order equal an independent pure-Python A-ES
    computation (ln((h+1)/2^60)/n_chars, k largest) — the differential
    that pins the SQL draw to the algorithm."""
    import math

    from mapreduceimplementation_spark.functions.hashing import py_hash64
    from mapreduceimplementation_spark.operators.pipeline import _WSAMP_K
    from mapreduceimplementation_spark.sources.tables import load_table

    out = eng.QUERIES["corpus_sample_weighted"](spark, sf_dir).toPandas()
    rows = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "n_chars")
        .collect()
    )
    keys = {
        r["doc_id"]: math.log((py_hash64(f"wsamp-{r['doc_id']}") + 1) / 2**60)
        / r["n_chars"]
        for r in rows
        if r["n_chars"] and r["n_chars"] > 0
    }
    want = sorted(keys, key=lambda d: (-keys[d], d))[:_WSAMP_K]
    got = list(out.sort_values("sample_pos")["doc_id"])
    assert got == want
    assert list(out.sort_values("sample_pos")["sample_pos"]) == list(
        range(1, _WSAMP_K + 1)
    )


def test_weighted_sample_prefers_heavy_docs(spark, tmp_path):
    """Weight sensitivity: with one doc a million times heavier than 999
    peers, it must be drawn first; zero-weight docs are never drawn."""
    import pandas as pd

    from mapreduceimplementation_spark.operators.pipeline import (
        corpus_sample_weighted,
    )

    d = tmp_path / "sf"
    d.mkdir()
    pdf = pd.DataFrame(
        {
            "doc_id": range(1000),
            "text": ["x"] * 1000,
            "lang": ["en"] * 1000,
            "source": ["s"] * 1000,
            "n_chars": [10] * 999 + [10_000_000],
        }
    )
    pdf.loc[0, "n_chars"] = 0  # excluded: weight must be positive
    spark.createDataFrame(pdf).write.parquet(str(d / "documents.parquet"))
    out = corpus_sample_weighted(spark, str(d)).toPandas()
    assert out[out["sample_pos"] == 1]["doc_id"].iloc[0] == 999
    assert 0 not in set(out["doc_id"])


# ---------------------------------------------------------------------------
# C72 bpe_train


def _sennrich_bpe(word_freqs: dict[str, int], steps: int):
    """Reference BPE trainer (Sennrich et al. 2016 learn_bpe): vocab as
    symbol tuples, get_stats counts adjacent pairs, merge applied greedily
    left-to-right.  Tie-break (cnt DESC, left, right) like the operator."""
    vocab = {
        tuple(list(w) + ["_"]): f for w, f in word_freqs.items()
    }
    merges = []
    for step in range(1, steps + 1):
        stats: dict[tuple[str, str], int] = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] = (
                    stats.get((syms[i], syms[i + 1]), 0) + f
                )
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (l, r), cnt = best
        merges.append((step, l, r, l + r, cnt))
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def test_bpe_train_matches_sennrich_reference(spark):
    """C72: the distributed merge table equals the reference algorithm's
    on a hand corpus that exercises self-overlap ('aaaa' -> (a,a) merges
    left-to-right) and merged-symbol chaining ((er) then (er,_))."""
    import tempfile
    from collections import Counter

    texts = {
        1: "lower lower lowest newer newer newer wider wide wide",
        2: "aaaa aaaa aab low low low new new era era",
        3: "the the the thee thee there where were her her hers",
    }
    wf = Counter()
    for t in texts.values():
        for w in t.split():
            wf[w] += 1
    expect = _sennrich_bpe(dict(wf), 8)

    df = spark.createDataFrame(
        sorted(texts.items()), "doc_id long, text string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/documents.parquet")
        rows = (
            eng.QUERIES["bpe_train"](spark, d)
            .orderBy("step")
            .collect()
        )
    got = [
        (r["step"], r["left"], r["right"], r["merged"], r["cnt"]) for r in rows
    ]
    assert got == expect, (got, expect)


def test_bpe_train_merge_table_shape(spark, sf_dir):
    """C72 invariants on the real corpus: one row per step, counts are
    positive, and every later merge's symbols are buildable from earlier
    merges or single characters (the well-formedness of a merge table)."""
    rows = eng.QUERIES["bpe_train"](spark, sf_dir).orderBy("step").collect()
    assert [r["step"] for r in rows] == list(range(1, len(rows) + 1))
    known = set("abcdefghijklmnopqrstuvwxyz_")
    for r in rows:
        assert r["cnt"] > 0
        assert r["left"] in known or all(c in known for c in r["left"])
        assert r["merged"] == r["left"] + r["right"]
        known.add(r["merged"])


def test_bpe_tokenize_matches_reference_encoder(spark):
    """C74: per-doc BPE token counts equal applying the reference
    algorithm's merge list (the _sennrich_bpe twin) word by word."""
    import tempfile
    from collections import Counter

    texts = {
        1: "lower lower lowest newer newer newer wider wide wide",
        2: "aaaa aaaa aab low low low new new era era",
        3: "the the the thee thee there where were her her hers",
    }
    wf = Counter()
    for t in texts.values():
        for w in t.split():
            wf[w] += 1
    merges = _sennrich_bpe(dict(wf), 8)

    def encode(word):
        syms = list(word) + ["_"]
        for _, l, r, _, _ in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    expect = {
        d: (
            len(t.split()),
            sum(encode(w) for w in t.split()),
        )
        for d, t in texts.items()
    }
    df = spark.createDataFrame(
        sorted(texts.items()), "doc_id long, text string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/documents.parquet")
        rows = {
            r["doc_id"]: r
            for r in eng.QUERIES["bpe_tokenize"](spark, d).collect()
        }
    for doc_id, (n_words, n_bpe) in expect.items():
        assert rows[doc_id]["n_words"] == n_words
        assert rows[doc_id]["n_bpe_tokens"] == n_bpe, doc_id
        assert (
            rows[doc_id]["fertility_ppm"]
            == n_bpe * 1_000_000 // n_words
        )


def test_bpe_tokenize_fertility_bounds(spark, sf_dir):
    """C74 invariants on the real corpus: every word contributes at least
    one token, fertility is consistent with the counts, and 8 merges
    strictly compress vs the character baseline somewhere."""
    rows = eng.QUERIES["bpe_tokenize"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_bpe_tokens"] >= r["n_words"]
        assert r["fertility_ppm"] == r["n_bpe_tokens"] * 1_000_000 // r["n_words"]


def test_quality_classifier_eval_confusion_consistency(spark, sf_dir):
    """C75: per split, the confusion cells partition the docs, the split
    sizes cover the whole featurized corpus in ~80/10/10, and accuracy
    is exactly the integer-ppm of (tp+tn)/n."""
    rows = {r["split"]: r for r in
            eng.QUERIES["quality_classifier_eval"](spark, sf_dir).collect()}
    assert set(rows) == {"train", "val", "test"}
    total = sum(r["n_docs"] for r in rows.values())
    base = eng.QUERIES["quality_classifier"](spark, sf_dir).count()
    assert total == base
    for r in rows.values():
        assert r["tp"] + r["fp"] + r["fn"] + r["tn"] == r["n_docs"]
        assert r["accuracy_ppm"] == (r["tp"] + r["tn"]) * 1_000_000 // r["n_docs"]
    assert rows["train"]["n_docs"] > rows["val"]["n_docs"]
    assert rows["train"]["n_docs"] > rows["test"]["n_docs"]
