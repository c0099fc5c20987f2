from __future__ import annotations

import mapreduceimplementation_spark as eng
from tests.conftest import assert_same_result

eng.load_all_operators()


def test_wordcount_matches_oracle(spark, sf_dir, duck):
    df = eng.QUERIES["mr_wordcount"](spark, sf_dir)
    assert_same_result(df, duck, eng.ORACLES["mr_wordcount"])


def test_wordcount_partial_agg_plan(spark, sf_dir):
    """Map-side combine must be present (the MapReduce-paper combiner)."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        eng.QUERIES["mr_wordcount"](spark, sf_dir).explain("formatted")
    plan = buf.getvalue()
    assert "partial_count" in plan, plan


def test_inverted_index_matches_oracle(spark, sf_dir, duck):
    df = eng.QUERIES["mr_inverted_index"](spark, sf_dir)
    assert_same_result(df, duck, eng.ORACLES["mr_inverted_index"])


def test_grep_matches_oracle(spark, sf_dir, duck):
    df = eng.QUERIES["mr_grep"](spark, sf_dir)
    assert_same_result(df, duck, eng.ORACLES["mr_grep"])


def test_grep_is_parameterized(spark, sf_dir, duck):
    """The grep API takes any pattern (the registered query is just one
    instantiation) — run a second pattern and check it against the same
    oracle shape re-parameterized."""
    from mapreduceimplementation_spark.operators.mrcore import grep
    from mapreduceimplementation_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    df = grep(docs, "data[a-z]*")
    assert_same_result(
        df,
        duck,
        r"""
        SELECT doc_id, source,
               CAST(length(regexp_extract_all(text, 'data[a-z]*')) AS BIGINT)
                   AS n_hits
        FROM documents
        WHERE regexp_matches(text, 'data[a-z]*')
        """,
    )


def test_file_lengths_matches_oracle(spark, sf_dir, duck):
    df = eng.QUERIES["mr_file_lengths"](spark, sf_dir)
    assert_same_result(df, duck, eng.ORACLES["mr_file_lengths"])


def test_distributed_sort_matches_oracle(spark, sf_dir, duck):
    df = eng.QUERIES["mr_distributed_sort"](spark, sf_dir)
    assert_same_result(df, duck, eng.ORACLES["mr_distributed_sort"])


def test_generic_engine_wc_parity(spark, sf_dir):
    """Generic Arrow-batched engine output == native DataFrame plan output
    (the reference's test-mr.sh 'same as sequential golden' gate)."""
    native = {
        (r["word"], str(r["cnt"]))
        for r in eng.QUERIES["mr_wordcount"](spark, sf_dir).collect()
    }
    generic = {
        (r["key"], r["value"])
        for r in eng.QUERIES["mr_generic_wc"](spark, sf_dir).collect()
    }
    assert native == generic


def test_generic_engine_indexer_parity(spark, sf_dir):
    from pyspark.sql import functions as F

    from mapreduceimplementation_spark.operators.mapreduce import (
        indexer_map,
        indexer_reduce,
        map_reduce,
    )
    from mapreduceimplementation_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    def norm(count: int, docs_csv: str):
        # reference indexer.go sorts doc names lexicographically; the native
        # plan sorts typed bigints numerically — compare as sets
        return int(count), frozenset(docs_csv.split(","))

    generic = {
        (r["key"], norm(*r["value"].split(" ", 1)))
        for r in map_reduce(
            docs, indexer_map, indexer_reduce, key_col="doc_id", value_col="text"
        ).collect()
    }
    native = {
        (r["word"], norm(r["df"], r["docs"]))
        for r in eng.QUERIES["mr_inverted_index"](spark, sf_dir)
        .select("word", "df", "docs")
        .collect()
    }
    assert native == generic


def test_determinism_under_repartition(spark, sf_dir):
    """Output independent of task layout (reference jobcount/crash tests:
    re-execution must not change visible output)."""
    from mapreduceimplementation_spark.functions.text import word_tokens
    from mapreduceimplementation_spark.sources.tables import load_table
    import pyspark.sql.functions as F

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    a = (
        word_tokens(docs.repartition(1))
        .groupBy("word")
        .count()
        .collect()
    )
    b = (
        word_tokens(docs.repartition(7))
        .groupBy("word")
        .count()
        .collect()
    )
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def _plan(df) -> str:
    from tests.conftest import formatted_plan

    return formatted_plan(df)


def test_distributed_sort_no_global_window(spark, sf_dir):
    """TeraSort ranking must never move all rows to one partition: the
    pid-stamping stage has a range exchange, and the full query has NO
    SinglePartition exchange feeding a window."""
    from pyspark.sql import functions as F

    from mapreduceimplementation_spark.operators.mrcore import _pid_stamped
    from mapreduceimplementation_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    order = [F.col("n_chars").desc(), F.col("doc_id").asc()]
    stage_plan = _plan(_pid_stamped(docs, order))
    assert "rangepartitioning" in stage_plan.lower(), stage_plan
    plan = _plan(eng.QUERIES["mr_distributed_sort"](spark, sf_dir))
    assert "SinglePartition" not in plan, plan


def test_distributed_sort_rank_is_permutation(spark, sf_dir):
    """Ranks must be exactly 1..N regardless of shuffle-partition count —
    guards the pid-consistency fix (ADVICE: the two branches reading the
    checkpointed pid assignment can never desynchronize)."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for parts in ("3", "8", "17"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            out = eng.QUERIES["mr_distributed_sort"](spark, sf_dir).collect()
            ranks = sorted(r["rank"] for r in out)
            assert ranks == list(range(1, len(out) + 1)), parts
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_q3_topk_is_take_ordered(spark, sf_dir):
    """Top-k compiles to TakeOrderedAndProject (per-partition heaps + k-row
    driver merge), not a global-window row_number."""
    plan = _plan(eng.QUERIES["q3_shipping_priority"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan


def test_map_work_is_parallel(spark, sf_dir):
    """mtiming.go analog: map-side work actually spreads over tasks —
    multiple partitions contribute tokens (the platform-parallelism
    property test-mr.sh checks with worker timestamps)."""
    from mapreduceimplementation_spark.functions.text import word_tokens
    from mapreduceimplementation_spark.sources.tables import load_table
    import pyspark.sql.functions as F

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").repartition(4)
    per_pid = (
        word_tokens(docs)
        .groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .collect()
    )
    assert len(per_pid) >= 2, "map work ran on a single task"
    assert sum(r["count"] for r in per_pid) > 0


def test_distributed_rank_rejects_reserved_columns(spark):
    from pyspark.sql import functions as F

    from mapreduceimplementation_spark.operators.mrcore import distributed_rank

    df = spark.createDataFrame([(1, 2)], "rank int, x int")
    try:
        distributed_rank(df, [F.col("x")])
    except ValueError as e:
        assert "rank" in str(e)
    else:
        raise AssertionError("expected ValueError on reserved column")


def test_distributed_ntile_matches_sql_ntile(spark):
    """distributed_ntile must equal the built-in ntile() window on an
    uneven division (T=25, n=10: buckets of 3,3,3,3,3,2,2,2,2,2) and on
    the T < n edge (each row its own bucket)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from mapreduceimplementation_spark.operators.mrcore import distributed_ntile

    df = spark.range(25).select(F.col("id").cast("int").alias("x"))
    ours = {
        (r["x"], r["bucket"])
        for r in distributed_ntile(df, [F.col("x")], 10).collect()
    }
    ref = {
        (r["x"], r["b"])
        for r in df.select(
            "x", F.ntile(10).over(Window.orderBy("x")).alias("b")
        ).collect()
    }
    assert ours == ref
    small = spark.range(3).select(F.col("id").cast("int").alias("x"))
    tiny = {
        (r["x"], r["bucket"])
        for r in distributed_ntile(small, [F.col("x")], 10).collect()
    }
    assert tiny == {(0, 1), (1, 2), (2, 3)}
