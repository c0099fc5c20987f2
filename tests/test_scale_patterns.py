"""Scale-pattern demonstrations (SURVEY.md §4): salting for skewed joins
and bucketing for co-located (exchange-free) joins.

These are the two knobs the engine reaches for when AQE alone is not
enough at 100 TB: salting splits a hot join key across S shuffle
partitions; bucketing pre-partitions both join sides at write time so
the join needs NO exchange at read time.  Each demo asserts BOTH the
mechanism (plan shape / partition spread) and that results are identical
to the naive formulation — a technique that changes answers is not an
optimization.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F


def _plan(df) -> str:
    from tests.conftest import formatted_plan

    return formatted_plan(df)


_SALT = 8


def test_salted_join_equals_plain_join(spark):
    """Hot-key join: 50%% of fact rows share one key.  Salted formulation:
    fact side gets salt = pmod(hash(unique col), S); dim side explodes to
    S replicas; join on (key, salt).  Must produce exactly the plain
    join's rows."""
    n = 10_000
    fact = spark.range(n).select(
        F.col("id").alias("row_id"),
        # half the rows hit key 0, the rest spread over 1..99
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.pmod(F.col("id"), F.lit(99)) + 1)
        .alias("k"),
        (F.col("id") * 3).alias("payload"),
    )
    dim = spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )

    plain = fact.join(dim, "k").select("row_id", "k", "payload", "name")

    salted_fact = fact.withColumn("salt", F.pmod(F.hash("row_id"), F.lit(_SALT)))
    salted_dim = dim.withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(_SALT)]))
    )
    salted = salted_fact.join(salted_dim, ["k", "salt"]).select(
        "row_id", "k", "payload", "name"
    )

    a = sorted(map(repr, plain.collect()))
    b = sorted(map(repr, salted.collect()))
    assert a == b and len(a) == n


def test_salted_key_actually_spreads(spark):
    """The hot key's rows must land in >1 shuffle partition after salting
    (the whole point: no single reducer owns the hot key)."""
    n = 10_000
    fact = spark.range(n).select(
        F.col("id").alias("row_id"), F.lit(0).alias("k")
    ).withColumn("salt", F.pmod(F.hash("row_id"), F.lit(_SALT)))
    parts = (
        fact.repartition(8, "k", "salt")
        .select(F.spark_partition_id().alias("pid"))
        .distinct()
        .count()
    )
    assert parts > 1, "salting failed to spread the hot key"
    unsalted = (
        fact.repartition(8, "k")
        .select(F.spark_partition_id().alias("pid"))
        .distinct()
        .count()
    )
    assert unsalted == 1, "control: unsalted hot key should land in one partition"


def test_bucketed_join_has_no_exchange(spark):
    """Bucketed co-located join: both sides written bucketed by the join
    key → SortMergeJoin with ZERO Exchange in the plan.  This is the
    write-once/join-many pattern for 100 TB fact tables; the same two
    tables joined unbucketed need two exchanges.  (Tables go to the
    session's default spark-warehouse dir — warehouse.dir is a static
    conf — and are dropped, managed-table files included, on exit.)"""
    spark.sql("CREATE DATABASE IF NOT EXISTS bdemo")
    left = spark.range(5_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(5_000).select(
        F.col("id").alias("k"), (F.col("id") * 5).alias("b")
    )
    left.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("bdemo.lft")
    right.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("bdemo.rgt")

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a sort-merge path so the exchange-elision is what's tested
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("bdemo.lft").join(spark.table("bdemo.rgt"), "k")
        plan = _plan(joined)
        assert ") Exchange" not in plan, plan
        assert joined.count() == 5_000

        unbucketed = left.join(right, "k")
        assert _plan(unbucketed).count(") Exchange") == 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bdemo.lft")
        spark.sql("DROP TABLE IF EXISTS bdemo.rgt")
        spark.sql("DROP DATABASE IF EXISTS bdemo")
