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


def _py_hll_estimate(values) -> int:
    """Independent pure-Python HLL-256 over the same portable hash — the
    differential that pins the SQL estimator (C49) to the textbook
    algorithm, not to itself."""
    import math

    from mapreduceimplementation_spark.functions.hashing import py_hash64

    m = 256
    regs: dict[int, int] = {}
    for v in values:
        h = py_hash64("hll-" + str(v))
        b, w = h % m, h // m
        if w == 0:
            rho = 53
        else:
            rho = 1
            while w % 2 == 0:
                w //= 2
                rho += 1
        regs[b] = max(regs.get(b, 0), rho)
    z = m - len(regs)
    s = sum(2 ** (53 - r) for r in regs.values())
    alpha_mm = (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0
    raw = alpha_mm * float(2**53) / float(s + z * 2**53)
    e = 256.0 * math.log(256.0 / z) if (raw <= 640.0 and z > 0) else raw
    return int(math.floor(e + 0.5))


def test_hll_users_matches_oracle_and_python(spark, sf_dir, duck):
    """C49: full-value oracle parity, plus every per-group estimate equals
    an independent pure-Python HLL over the exact distinct-user sets (so
    the SQL register/estimator math is pinned to the algorithm); the
    observed error sits inside the 3-sigma band everywhere."""
    from tests.conftest import assert_same_result

    df = eng.QUERIES["events_hll_users"](spark, sf_dir)
    assert_same_result(df, duck, eng.ORACLES["events_hll_users"])
    out = df.toPandas().set_index("event_type")
    users = duck.execute(
        "SELECT event_type, list(DISTINCT user_id) FROM events GROUP BY 1"
    ).fetchall()
    assert len(users) > 0
    for etype, uids in users:
        assert out.loc[etype, "est_users"] == _py_hll_estimate(uids), etype
    assert out["within_3sigma"].all()


def test_hll_branches_cover_both_estimators(spark):
    """The small-range (linear counting) branch and the raw-HLL branch are
    BOTH exercised and both track the Python twin: 20 distinct keys land
    in linear counting (raw <= 2.5m with empty registers), 5000 distinct
    keys clear it into the raw harmonic-mean estimate."""
    import pandas as pd

    from mapreduceimplementation_spark.operators.textmetrics import (
        events_hll_users,
    )

    for n, branch in ((20, "linear-counting"), (5000, "raw-hll")):
        pdf = pd.DataFrame(
            {
                "event_type": ["t"] * n,
                "user_id": list(range(n)),
                # load_table normalizes events.ts, so the fixture needs one
                "ts": pd.to_datetime("2024-01-01"),
            }
        )
        src = spark.createDataFrame(pdf)
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            src.write.parquet(f"{d}/events.parquet")
            row = events_hll_users(spark, d).collect()[0]
        expect = _py_hll_estimate(range(n))
        assert row["est_users"] == expect, (branch, row, expect)
        assert row["exact_users"] == n


def test_hll_merge_audit_invariant_holds(spark, sf_dir, duck):
    """C51: oracle parity, the merge-invariance verdict is TRUE (max is
    associative — per-day sketches merge losslessly), and the merged
    estimate string-matches the direct one."""
    from tests.conftest import assert_same_result

    df = eng.QUERIES["events_hll_merge_audit"](spark, sf_dir)
    assert_same_result(df, duck, eng.ORACLES["events_hll_merge_audit"])
    row = df.collect()[0]
    assert row["merge_invariant"]
    assert row["est_users"] == row["est_merged_users"]
    assert row["within_3sigma"]
    assert row["n_days"] > 1  # multi-day feed: the merge is non-trivial


def test_winnowing_fingerprint_no_exchange(spark, sf_dir):
    """C58: the whole winnowing selection is row-local — the ONLY
    allowed exchange is spread()'s round-robin local-parallelism guard
    (a no-op on a real cluster); no key exchange may ever appear, since
    that would mean the selection stopped being per-document."""
    df = eng.QUERIES["winnowing_fingerprint"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning" not in plan, plan
    assert "rangepartitioning" not in plan, plan
    assert plan.count("Exchange") <= 1, plan  # just the spread guard
    if "Exchange" in plan:
        assert "roundrobin" in plan.lower(), plan


def test_winnowing_fingerprint_hand_case(spark):
    """C58 against a pure-Python winnow of the same corpus: identical
    selected (pos, hash) sets, and the coverage guarantee — every window
    of w consecutive k-grams contains at least one selected position."""
    import os
    import tempfile

    from mapreduceimplementation_spark.functions.hashing import py_hash64
    from mapreduceimplementation_spark.operators.textmetrics import (
        _WIN_K,
        _WIN_W,
        winnowing_fingerprint,
    )

    texts = {
        1: "the quick brown fox jumps over the lazy dog and runs away fast",
        2: "abababababababababababab",  # heavy k-gram repetition -> hash ties
        3: "short",  # below k+w-1: must be excluded
        4: "x" * (_WIN_K + _WIN_W - 1),  # exactly one window, all-equal hashes
    }
    docs = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        out = winnowing_fingerprint(spark, d).toPandas().set_index("doc_id")

    def brute(text):
        n = len(text) - _WIN_K + 1
        hs = [py_hash64(text[i : i + _WIN_K]) for i in range(n)]
        picks = set()
        for t in range(n - _WIN_W + 1):
            w = hs[t : t + _WIN_W]
            m = min(w)
            # rightmost occurrence of the min
            p = t + max(j for j, h in enumerate(w) if h == m)
            picks.add(p)
        return hs, sorted(picks)

    assert 3 not in out.index
    for doc_id in (1, 2, 4):
        hs, picks = brute(texts[doc_id])
        row = out.loc[doc_id]
        assert row["n_kgrams"] == len(hs)
        expect_fp = ",".join(f"{p + 1}:{hs[p]}" for p in picks)
        assert row["winnow_fp"] == expect_fp
        assert row["n_selected"] == len(picks)
        # coverage guarantee
        sel = set(picks)
        for t in range(len(hs) - _WIN_W + 1):
            assert sel & set(range(t, t + _WIN_W)), (doc_id, t)


def test_corpus_entropy_no_exchange_and_hand_case(spark, sf_dir):
    """C59: row-local plan; exact entropy on hand-mixed docs."""
    import math
    import os
    import tempfile

    from mapreduceimplementation_spark.operators.textmetrics import corpus_entropy

    df = eng.QUERIES["corpus_entropy"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan

    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "aA1 ."), (3, "0000000000")], ["doc_id", "text"]
    )
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        out = corpus_entropy(spark, d).toPandas().set_index("doc_id")
    # single-class docs: entropy 0, flagged
    assert out.loc[1, "class_entropy"] == 0.0 and bool(out.loc[1, "low_entropy"])
    assert out.loc[3, "class_entropy"] == 0.0 and bool(out.loc[3, "low_entropy"])
    # uniform over 5 classes: ln(5)
    assert out.loc[2, "class_entropy"] == round(math.log(5), 6)
    assert not bool(out.loc[2, "low_entropy"])
    assert (
        out.loc[2, ["c_lower", "c_upper", "c_digit", "c_space", "c_other"]] == 1
    ).all()


def test_quality_gopher_rules_zero_exchange_and_brute_force(spark, sf_dir):
    """C63: the rule matrix is a row-local scan (zero exchanges), and on
    hand-crafted docs — including the newline/bullet/ellipsis shapes the
    synthetic corpus can't exercise — every emitted column equals an
    independent Python re-implementation of the published Gopher rules."""
    import os
    import re
    import tempfile

    from mapreduceimplementation_spark.operators.textmetrics import (
        _GOPHER_MAX_WORDS,
        _GOPHER_MIN_STOPS,
        _GOPHER_MIN_WORDS,
        _GOPHER_STOPS,
        quality_gopher_rules,
    )

    df = eng.QUERIES["quality_gopher_rules"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan

    clean = ("the data needs to be part of and that have with quality " * 8).strip()
    texts = {
        1: clean,                                  # passes every rule
        2: ("lorem ipsum dolor " * 30).strip(),    # no stop words
        3: "- the one\n- of two\n* three\n- four\n-five",  # all-bullet lines
        4: "see more...\nread more...\nthe end is near...",     # ellipsis-heavy
        5: "#### #### #### the of and that",       # symbol-heavy
        6: "a b c d e " * 20 + "the of",           # mean word len < 3
        7: "the of and " + "1234 5678 " * 20,      # low alpha-token fraction
        8: "the of and that have",                 # under min word count
        9: "",                                     # empty text row
    }

    def brute(text):
        n_words = len(re.findall(r"[A-Za-z]+", text))
        n_letters = len(re.sub(r"[^A-Za-z]", "", text))
        n_sym = len(re.findall(r"#|\.\.\.", text))
        lines_all = text.split("\n")
        n_lines = sum(1 for x in lines_all if x != "")
        n_ell = sum(1 for x in lines_all if x.endswith("..."))
        n_bullet = sum(
            1 for x in lines_all if x.startswith("-") or x.startswith("*")
        )
        toks = text.split(" ")
        n_tokens = sum(1 for t in toks if t != "")
        n_alpha = sum(1 for t in toks if re.search(r"[A-Za-z]", t))
        n_stops = sum(
            1
            for w in _GOPHER_STOPS
            if re.search(r"\b" + w + r"\b", text.lower())
        )
        rules = {
            "rule_word_count": _GOPHER_MIN_WORDS <= n_words <= _GOPHER_MAX_WORDS,
            "rule_mean_word_len": (
                n_words > 0
                and 3 * n_words <= n_letters <= 10 * n_words
            ),
            "rule_symbol_ratio": 10 * n_sym <= n_words,
            "rule_ellipsis_lines": 10 * n_ell <= 3 * n_lines,
            "rule_bullet_lines": 10 * n_bullet <= 9 * n_lines,
            "rule_alpha_words": 5 * n_alpha >= 4 * n_tokens,
            "rule_stop_words": n_stops >= _GOPHER_MIN_STOPS,
        }
        rules["passes_gopher"] = all(rules.values())
        return n_words, n_stops, rules

    docs = spark.createDataFrame(
        sorted(texts.items()), "doc_id long, text string"
    )
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        out = quality_gopher_rules(spark, d).toPandas().set_index("doc_id")

    assert sorted(out.index) == sorted(texts)
    for doc_id, text in texts.items():
        n_words, n_stops, rules = brute(text)
        row = out.loc[doc_id]
        assert row["n_words"] == n_words, doc_id
        assert row["n_stops"] == n_stops, doc_id
        for col, want in rules.items():
            assert bool(row[col]) == want, (doc_id, col, text[:40])
    # the fixture must actually exercise each rejection rule at least once
    assert not out["passes_gopher"].all()
    assert bool(out.loc[1, "passes_gopher"])
    for col in (
        "rule_word_count",
        "rule_mean_word_len",
        "rule_symbol_ratio",
        "rule_ellipsis_lines",
        "rule_bullet_lines",
        "rule_alpha_words",
        "rule_stop_words",
    ):
        assert not out[col].all(), f"{col} never rejected by the fixture"


def test_quality_c4_rules_zero_exchange_and_brute_force(spark, sf_dir):
    """C65: zero-exchange scan; on crafted multi-line pages every column
    equals an independent Python re-implementation of the published C4
    line- and page-level rules."""
    import os
    import re
    import tempfile

    from mapreduceimplementation_spark.operators.textmetrics import (
        _C4_BADWORDS,
        _C4_MIN_LINE_WORDS,
        _C4_MIN_SENTENCES,
        quality_c4_rules,
    )

    df = eng.QUERIES["quality_c4_rules"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan

    texts = {
        1: "This page is fine and clean.\nIt has several proper sentences!"
           "\nEach line ends with punctuation.\nThree words minimum here."
           "\nAnd one more sentence to clear the bar.",
        2: "short line\nno punctuation here\nstill none",      # nothing kept
        3: "Enable javascript to view this page.\n"            # js line dropped
           "A real sentence stays right here.\n"
           "Another real sentence stays too!\n"
           "Sentences three and four stay? Yes. Five stays.",
        4: "Lorem ipsum dolor sit amet, consectetur adipiscing elit."
           "\nMore filler text follows here. And here. And here. Done.",
        5: "A config snippet { key: value } breaks the page rule."
           "\nOtherwise these sentences all look fine. Truly fine."
           " Quite fine. Very fine.",
        6: "Win big at the casino tonight friends!\nCome play. Stay long."
           " Bet more. Win less.",
        7: 'A quoted line ends properly."\nOnly two. sentences though.',
        8: "One two.\nOk fine.\nTiny!",                        # <3 words/line
        9: "",
    }

    def brute(text):
        lines_all = text.split("\n")
        n_lines = sum(1 for x in lines_all if x != "")

        def keep(x):
            t = x.rstrip()
            words = sum(1 for w in x.split(" ") if w != "")
            return (
                t.endswith((".", "!", "?", '"'))
                and words >= _C4_MIN_LINE_WORDS
                and "javascript" not in x.lower()
            )

        kept = [x for x in lines_all if keep(x)]
        n_sentences = len(re.findall(r"[.!?]", "\n".join(kept)))
        has_lorem = "lorem ipsum" in text.lower()
        has_brace = "{" in text
        has_bad = any(
            re.search(r"\b" + w + r"\b", text.lower()) for w in _C4_BADWORDS
        )
        kept_ppm = 0 if n_lines == 0 else (1000000 * len(kept)) // n_lines
        return {
            "n_lines": n_lines,
            "n_kept_lines": len(kept),
            "n_sentences": n_sentences,
            "kept_ppm": kept_ppm,
            "rule_min_sentences": n_sentences >= _C4_MIN_SENTENCES,
            "rule_no_lorem": not has_lorem,
            "rule_no_brace": not has_brace,
            "rule_no_badwords": not has_bad,
            "passes_c4": (
                len(kept) >= 1
                and n_sentences >= _C4_MIN_SENTENCES
                and not has_lorem
                and not has_brace
                and not has_bad
            ),
        }

    docs = spark.createDataFrame(
        sorted(texts.items()), "doc_id long, text string"
    )
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        out = quality_c4_rules(spark, d).toPandas().set_index("doc_id")

    assert sorted(out.index) == sorted(texts)
    for doc_id, text in texts.items():
        want = brute(text)
        row = out.loc[doc_id]
        for col, v in want.items():
            got = bool(row[col]) if isinstance(v, bool) else row[col]
            assert got == v, (doc_id, col, got, v)
    # the fixture exercises each page rule and both keep/reject outcomes
    assert bool(out.loc[1, "passes_c4"])
    for col in (
        "rule_min_sentences",
        "rule_no_lorem",
        "rule_no_brace",
        "rule_no_badwords",
    ):
        assert not out[col].all(), f"{col} never rejected by the fixture"
    assert (out["n_kept_lines"] < out["n_lines"]).any()


def test_tokenizer_fertility_matches_token_count_rollup(spark, sf_dir, duck):
    """C69: oracle match, and the rollup is EXACTLY the per-doc C2
    token_count summed by language — the shared-definition invariant
    (one tokenizer definition across operators)."""
    from tests.conftest import assert_same_result
    from mapreduceimplementation_spark.sources.tables import load_table

    df = eng.QUERIES["tokenizer_fertility"](spark, sf_dir)
    assert_same_result(df, duck, eng.ORACLES["tokenizer_fertility"])

    out = df.toPandas().set_index("lang")
    tc = eng.QUERIES["token_count"](spark, sf_dir).toPandas()
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang").toPandas()
    merged = tc.merge(docs, on="doc_id")
    agg = merged.groupby("lang").agg(
        n=("doc_id", "count"),
        words=("n_ws_tokens", "sum"),
        toks=("n_bpe_tokens", "sum"),
        chars=("n_chars_actual", "sum"),
    )
    assert sorted(out.index) == sorted(agg.index)
    for lang, r in agg.iterrows():
        row = out.loc[lang]
        assert row["n_docs"] == r["n"]
        assert row["total_words"] == r["words"]
        assert row["total_tokens"] == r["toks"]
        assert row["total_chars"] == r["chars"]
        assert row["fertility_ppm"] == (r["toks"] * 1000000) // r["words"]
        assert row["chars_per_token_ppm"] == (r["chars"] * 1000000) // r["toks"]
    # fertility >= 1: the BPE-ish regex never merges across whitespace,
    # so every whitespace token yields at least one subword token
    assert (out["fertility_ppm"] >= 1000000).all()

    from tools.plan_audit import plan_counts

    # fingerprint a FRESH plan: a post-execution AdaptiveSparkPlan's
    # explain prints final+initial sections and double-counts nodes
    c = plan_counts(eng.QUERIES["tokenizer_fertility"](spark, sf_dir))
    assert c["exchanges"] == 1 and c["smj"] + c["bhj"] + c["bnlj"] == 0, c


def test_ccnet_buckets_cuts_and_rank(spark, sf_dir, duck):
    """C70: oracle match; exact integer tercile sizes; ranks are a
    permutation of 1..N consistent with (lm_score DESC, doc_id); score
    order never inverts across bucket boundaries; and the rank comes
    from the distributed machinery, not a single-partition window over
    the corpus (no empty-partition-spec row_number in the plan)."""
    from tests.conftest import assert_same_result

    df = eng.QUERIES["quality_ccnet_buckets"](spark, sf_dir)
    assert_same_result(df, duck, eng.ORACLES["quality_ccnet_buckets"])

    out = df.toPandas().sort_values("rank").reset_index(drop=True)
    n = len(out)
    assert list(out["rank"]) == list(range(1, n + 1))
    order = out[["lm_score", "doc_id"]].values.tolist()
    assert order == sorted(order, key=lambda t: (-t[0], t[1]))
    sizes = out["bucket"].value_counts().to_dict()
    assert sizes.get("head", 0) == n // 3
    assert sizes.get("middle", 0) == (2 * n) // 3 - n // 3
    assert sizes.get("tail", 0) == n - (2 * n) // 3
    h = out[out["bucket"] == "head"]["lm_score"]
    m = out[out["bucket"] == "middle"]["lm_score"]
    t = out[out["bucket"] == "tail"]["lm_score"]
    assert h.min() >= m.max() and m.min() >= t.max()

    from tests.conftest import formatted_plan

    plan = formatted_plan(eng.QUERIES["quality_ccnet_buckets"](spark, sf_dir))
    for line in plan.splitlines():
        low = line.lower()
        if "row_number" in low and "windowspecdefinition(lm_score" in low.replace(" ", ""):
            raise AssertionError(f"corpus-wide single-partition window: {line}")
    assert "CartesianProduct" not in plan


# r10: the Arrow-kernel quality_repetition must agree bit-for-bit with
# the two-exchange expression form it replaced


def test_quality_repetition_kernel_matches_expression(spark, sf_dir):
    import pandas as pd

    from mapreduceimplementation_spark.operators import textmetrics as tm

    got = (
        tm.quality_repetition(spark, sf_dir)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        tm._quality_repetition_expr(spark, sf_dir)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=True)


def test_quality_repetition_kernel_zero_exchange(spark, sf_dir):
    """The kernel form shuffles nothing: per-doc gram stats are row-local
    (the point of the r10 rewrite — the old form shuffled every gram)."""
    import io
    from contextlib import redirect_stdout

    from mapreduceimplementation_spark.operators import textmetrics as tm

    buf = io.StringIO()
    with redirect_stdout(buf):
        tm.quality_repetition(spark, sf_dir).explain("formatted")
    plan = buf.getvalue()
    assert plan.count("Exchange hashpartitioning") == 0, plan
