"""Property-based engine-parity fuzz (hypothesis): generate small random
documents corpora — empty strings, whitespace runs, punctuation, digits,
repeated texts — write them as parquet, and require the Spark plan and
its registered DuckDB oracle to agree EXACTLY, the same check the driver
runs but over adversarial inputs instead of the fixed testdata.

Scope: the pure-documents text operators (their oracles read only the
documents table, so a two-column corpus exercises the full semantics;
lang/source columns are generated where the oracle touches them).
Alphabet is ASCII (letters/digits/punct/space): both engines tokenize
ASCII classes identically, while unicode CASING is a known cross-engine
divergence (ICU vs JDK lower()) that the operators avoid by contract.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import mapreduceimplementation_spark as eng

eng.load_all_operators()

_ALPHABET = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
    "0123456789"
    " .,!?@-_%+:/()'"
)

_text = st.text(alphabet=_ALPHABET, min_size=0, max_size=120)

# rows: (doc_id, text, lang, source, n_chars) — the full documents schema,
# with duplicate texts made likely so dedup/df paths see collisions
_corpus = st.lists(
    st.tuples(
        _text,
        st.sampled_from(["en", "de", "zh"]),
        st.sampled_from(["srcA", "srcB", "srcC"]),
    ),
    min_size=1,
    max_size=12,
).map(
    lambda rows: [
        (i, t if i % 3 != 2 or not rows else rows[0][0], lang, src)
        for i, (t, lang, src) in enumerate(rows)
    ]
)

#: operators whose oracle reads only the documents table and whose output
#: is deterministic for ANY corpus (no top-k over ties, no corpus-size
#: assumptions).  bpe_pair_counts is excluded: its LIMIT-50 frontier is
#: deterministic (total order) but duckdb/pandas float column inference
#: on empty results differs; covered by its own hand-corpus test.
_FUZZ_QUERIES = [
    "token_count",
    "pii_scrub",
    "ngram_duplication",
    "dedup_substring_spans",
    "corpus_chunk_overlap",
    "dedup_paragraphs",
    "boilerplate_source_matrix",
    "corpus_split",
    "doc_fingerprint",
    "dedup_exact",
    "quality_score",
    "corpus_readability",
    "lang_id",
    "corpus_sample_stratified",
    # r6 end additions: winnowing's rightmost-tie rule under heavy k-gram
    # repetition, and the entropy screen's disjoint-class accounting on
    # digit/punct/space-only degenerate docs
    "winnowing_fingerprint",
    "corpus_entropy",
    # r6 continuation: the Gopher integer cross-multiplication verdicts
    # (random newline/bullet/ellipsis shapes hit the line rules the
    # parquet corpus can't), and DSIR's quantized-llr decimal sums under
    # random lang mixes including the no-target-docs degenerate case
    "quality_gopher_rules",
    "dsir_importance",
    # C4's line-retention lambda (terminal punct + min words + js) and
    # the empty-kept-text coalesce under random newline-heavy docs
    "quality_c4_rules",
    # C69: shared-tokenizer rollup incl. zero-word/zero-token denominators
    "tokenizer_fertility",
    # C70: the full C28 decimal-ln chain + distributed-rank tercile cut
    # under random corpora (short docs drop, sample may be empty)
    "quality_ccnet_buckets",
    # r7: the fixed-point trainer's round()/clamp boundaries under random
    # label mixes incl. the all-one-class and empty-featurization cases,
    # and the split-restricted variant (empty train split degenerates to
    # zero-gradient weights — both engines must agree).  bpe_train /
    # bpe_tokenize are excluded like bpe_pair_counts: an all-punctuation
    # corpus yields an EMPTY merge table and duckdb/pandas dtype inference
    # on empty frames differs; their Sennrich-twin hand tests cover the
    # algorithm.  corpus_e2e_pipeline: the full composed chain — stage
    # relations may empty out (NULL token sums) and every downstream stage
    # must degrade identically on both engines.
    "quality_classifier",
    "quality_classifier_eval",
    "corpus_e2e_pipeline",
]


@pytest.fixture(scope="module")
def fuzz_dir():
    d = tempfile.mkdtemp(prefix="fuzz_docs_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _write_corpus(spark, d, rows):
    df = spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, t, lang, src in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    path = os.path.join(d, "documents.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    return path


@pytest.mark.parametrize("name", _FUZZ_QUERIES)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_corpus)
def test_oracle_parity_on_random_corpus(spark, fuzz_dir, name, rows):
    from tests.conftest import assert_same_result

    path = _write_corpus(spark, fuzz_dir, rows)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    try:
        assert_same_result(
            eng.QUERIES[name](spark, fuzz_dir), con, eng.ORACLES[name]
        )
    finally:
        con.close()


# ---------------------------------------------------------------------------
# events-table fuzz: time/rollup/order-statistic operators

_EVENT_TYPES = ["view", "click", "purchase"]

# (seconds offset, user, type index, cents value): timestamps at whole
# seconds within a 2-hour band (minute boundaries get exercised), few
# users so sessions/medians see per-key collisions, money-grain values so
# decimal-exactness is tested without manufactured float pathology
_events = st.lists(
    st.tuples(
        st.integers(0, 7200),
        st.integers(1, 4),
        st.integers(0, 2),
        st.integers(-99999, 99999),
    ),
    min_size=1,
    max_size=25,
)

_EVENTS_FUZZ = [
    "events_minutely",
    "events_running_total",
    "events_exact_median",
    "events_median_by_type",
    "events_type_pivot",
    # B69: run collapse + interval close under random repeat patterns
    "events_scd2_dimension",
    # B75: U-shaped weights under random touch counts/ties; same-second
    # touches force the (ts, event_id) tie-break through both engines
    "events_funnel_attribution",
    # B76: hash-arm totality + micro/ppm arithmetic on random values
    # (including negatives, which exercise the signed half-away floor)
    "events_ab_test_metrics",
    # B77: step order under same-second ties, 8-step truncation, and the
    # (count DESC, path) frontier under random session shapes
    "events_session_paths",
    # B79: hash-derived persistence trace under tiny random event-id sets —
    # sparse cell grids (missing epochs/indexes) must audit identically
    "raft_persistence_audit",
]


def _write_events(spark, d, rows):
    from datetime import datetime, timedelta

    base = datetime(2024, 3, 1, 12, 0, 0)
    data = [
        (
            i,
            base + timedelta(seconds=sec),
            user,
            _EVENT_TYPES[ti],
            cents / 100.0,
            "{}",
        )
        for i, (sec, user, ti, cents) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    path = os.path.join(d, "events.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    return path


@pytest.mark.parametrize("name", _EVENTS_FUZZ)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_events)
def test_events_oracle_parity_on_random_streams(spark, fuzz_dir, name, rows):
    from tests.conftest import assert_same_result

    path = _write_events(spark, fuzz_dir, rows)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    try:
        assert_same_result(
            eng.QUERIES[name](spark, fuzz_dir), con, eng.ORACLES[name]
        )
    finally:
        con.close()


# ---------------------------------------------------------------------------
# TPC-H fuzz: date-boundary + decimal-rounding parity on the relational
# family.  Random orders/lineitem straddle every date bound the queries
# declare (timestamps are sampled as offsets around the literal boundary
# instants, so >=-vs-> and half-open edges get hit), money-grain decimals
# exercise the exact-sum discipline, orphan keys exercise join edges, and
# customers with no orders exercise the Q13 outer-join zero bucket.  The
# bounded dims (customer/part/supplier/nation/region) are the sf0.001
# tables copied verbatim.

_TPCH_FUZZ = [
    "q1_pricing_summary",
    "q6_forecast_revenue",
    "q4_order_priority",
    "q12_shipping_modes",
    "q14_promo_revenue",
    "q13_customer_distribution",
    "q10_returned_items",
]

# every date literal the fuzzed queries compare against
_BOUNDS = [
    "1995-01-01", "1995-10-01", "1996-01-01", "1996-04-01",
    "1996-09-01", "1996-10-01", "1997-01-01", "1998-06-01",
]

_ts = st.tuples(
    st.integers(0, len(_BOUNDS) - 1),
    st.integers(-2 * 86400, 2 * 86400),  # +/- 2 days around the boundary
)

# lineitem: (orderkey, partkey, suppkey, qty, price_cents, disc_pct,
#            tax_pct, flag_i, status_i, shipdate)
_li_rows = st.lists(
    st.tuples(
        st.integers(1, 8),
        st.integers(0, 220),   # beyond the part range: orphan facts
        st.integers(0, 12),
        st.integers(1, 50),
        st.integers(100, 9999999),
        st.integers(0, 10),
        st.integers(0, 8),
        st.integers(0, 2),
        st.integers(0, 1),
        _ts,
    ),
    min_size=1,
    max_size=20,
)

# orders: (orderkey, custkey, status_i, total_cents, orderdate, prio_i)
_ord_rows = st.lists(
    st.tuples(
        st.integers(1, 8),
        st.integers(0, 160),
        st.integers(0, 2),
        st.integers(100, 99999999),
        _ts,
        st.integers(0, 4),
    ),
    min_size=1,
    max_size=8,
    unique_by=lambda r: r[0],
)

_PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


@pytest.fixture(scope="module")
def tpch_fuzz_dir(spark, sf_dir):
    d = tempfile.mkdtemp(prefix="fuzz_tpch_")
    from mapreduceimplementation_spark.sources.tables import load_table

    for t in ["customer", "part", "supplier", "nation", "region"]:
        load_table(spark, sf_dir, t).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(d, f"{t}.parquet"))
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _fuzz_ts(spec):
    from datetime import datetime, timedelta

    bi, sec = spec
    y, m, dd = map(int, _BOUNDS[bi].split("-"))
    return datetime(y, m, dd) + timedelta(seconds=sec)


def _write_tpch(spark, d, li, orders):
    li_data = [
        (
            ok, pk, sk, i + 1, float(q), pc / 100.0, dp / 100.0, tp / 100.0,
            "RAN"[fi], "OF"[si], _fuzz_ts(ts),
        )
        for i, (ok, pk, sk, q, pc, dp, tp, fi, si, ts) in enumerate(li)
    ]
    spark.createDataFrame(
        li_data,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "lineitem.parquet")
    )
    o_data = [
        (ok, ck, "OFP"[si], tc / 100.0, _fuzz_ts(ts), _PRIOS[pi])
        for (ok, ck, si, tc, ts, pi) in orders
    ]
    spark.createDataFrame(
        o_data,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "orders.parquet")
    )


@pytest.mark.parametrize("name", _TPCH_FUZZ)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(li=_li_rows, orders=_ord_rows)
def test_tpch_oracle_parity_on_random_facts(
    spark, tpch_fuzz_dir, name, li, orders
):
    from tests.conftest import assert_same_result

    _write_tpch(spark, tpch_fuzz_dir, li, orders)
    con = duckdb.connect()
    for t in [
        "lineitem", "orders", "customer", "part",
        "supplier", "nation", "region",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(tpch_fuzz_dir, t)}.parquet/*.parquet')"
        )
    try:
        assert_same_result(
            eng.QUERIES[name](spark, tpch_fuzz_dir), con, eng.ORACLES[name]
        )
    finally:
        con.close()


# ---------------------------------------------------------------------------
# embeddings-table fuzz: the float-parity family (normalize / quantize /
# PQ / exact and IVF-PQ ANN).  Duplicate vectors are injected on purpose:
# exact-equal cosines and equal PQ codeword distances force both engines
# through the pinned tie-breaks (neighbor_id, smallest codeword k), and
# duplicated SEEDS make the codebook itself contain identical codewords.

_DIM = 64

_vec_values = st.lists(
    st.floats(
        min_value=-2.0,
        max_value=2.0,
        allow_nan=False,
        allow_infinity=False,
        width=32,
    ),
    min_size=_DIM,
    max_size=_DIM,
)

_vec_corpus = st.lists(_vec_values, min_size=9, max_size=20).map(
    lambda vs: [
        # every 3rd vector is an exact copy of vector 0 (tie pressure);
        # element 0 is forced away from 0 so no vector has zero norm
        (
            i,
            [
                (0.5 if abs(x) < 0.125 else x) if j == 0 else x
                for j, x in enumerate(vs[0] if i % 3 == 2 else v)
            ],
            i % 4,
        )
        for i, v in enumerate(vs)
    ]
)

_VEC_FUZZ_QUERIES = [
    "embed_normalize",
    "embedding_quantize",
    "embedding_pq",
    "ann_topk",
    "ann_ivfpq",
    # C66/C67: injected duplicate vectors force the rank tie-breaks in
    # triplet mining and in every truncated-depth top-k simultaneously
    "embedding_hard_negatives",
    "embedding_matryoshka_eval",
    # C68: nearest-benchmark argmax under duplicate-vector cosine ties
    "corpus_semantic_decontaminate",
]


def _write_vectors(spark, d, rows):
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    path = os.path.join(d, "embeddings.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    return path


@pytest.mark.parametrize("name", _VEC_FUZZ_QUERIES)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        # a 9-vector x 64-dim float corpus is the smallest meaningful
        # example by construction (dim is the engine contract), and with
        # an unlucky seed generation "overruns" that budget too — both
        # size complaints are inherent here, not a strategy smell
        HealthCheck.large_base_example,
        HealthCheck.data_too_large,
    ],
)
@given(rows=_vec_corpus)
def test_vector_oracle_parity_on_random_embeddings(spark, fuzz_dir, name, rows):
    from tests.conftest import assert_same_result

    path = _write_vectors(spark, fuzz_dir, rows)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    try:
        assert_same_result(
            eng.QUERIES[name](spark, fuzz_dir), con, eng.ORACLES[name]
        )
    finally:
        con.close()
