"""Batch KV semantics (SURVEY.md §2 B10–B11) — the data model of the
reference's kvraft/shardkv/shardctrler labs, re-expressed as set-oriented
plans.

The reference applies a linearized log of Get/Put/Append ops to a sharded
string KV store (reference: src/kvraft/server.go op application,
src/shardctrler/server.go rebalancing).  Batch-analytics twin: given an
ordered op log, compute the final state — Put resets a key, Append
concatenates — and compute the shard→group assignment deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mapreduceimplementation_spark.registry import register
from mapreduceimplementation_spark.session import tune
from mapreduceimplementation_spark.sources.tables import load_table

N_SHARDS = 64


@register(
    "kv_apply_log",
    oracle="""
    WITH ops AS (
        SELECT user_id AS key,
               CASE WHEN event_type = 'signup' THEN 'put' ELSE 'append' END AS op,
               CAST(CAST(ROUND(value * 100, 0) AS BIGINT) AS VARCHAR) AS sval,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq
        FROM events
    ), cut AS (
        SELECT key, op, sval, seq,
               max(CASE WHEN op = 'put' THEN seq ELSE 0 END)
                   OVER (PARTITION BY key) AS last_put
        FROM ops
    )
    SELECT key,
           string_agg(sval, ';' ORDER BY seq) AS value,
           count(*) AS n_ops
    FROM cut
    WHERE seq >= last_put
    GROUP BY key
    """,
)
def kv_apply_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final KV state after replaying an op log (kvraft Put/Append
    semantics): events are the log, user_id the key, 'signup' a Put (reset)
    and everything else an Append.  Set-oriented: find each key's last Put
    with a max-window, drop earlier ops, order-preserving string_agg — one
    shuffle on key, no iteration, which is how you replay a 100 TB log."""
    tune(spark)
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id", "value")
    sval = F.round(F.col("value") * 100, 0).cast("long").cast("string")
    ops = ev.select(
        F.col("user_id").alias("key"),
        F.when(F.col("event_type") == "signup", "put").otherwise("append").alias("op"),
        sval.alias("sval"),
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("seq"),
    )
    cut = ops.withColumn(
        "last_put",
        F.max(F.when(F.col("op") == "put", F.col("seq")).otherwise(0)).over(
            Window.partitionBy("key")
        ),
    ).where(F.col("seq") >= F.col("last_put"))
    agg = cut.groupBy("key").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seq", "sval"))),
                lambda s: s["sval"],
            ),
            ";",
        ).alias("value"),
        F.count(F.lit(1)).alias("n_ops"),
    )
    return agg


@register(
    "shard_rebalance",
    oracle=f"""
    SELECT shard, n_nationkey AS gid, n_name AS group_name
    FROM (SELECT unnest(range(0, {N_SHARDS})) AS shard)
    JOIN nation ON n_nationkey = shard % (SELECT count(*) FROM nation)
    """,
)
def shard_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """shardctrler-style deterministic shard→group assignment: N_SHARDS
    shards spread round-robin over the sorted group list, so any two
    controllers compute the identical config (the property the reference's
    Raft-replicated ctrler guarantees by consensus, achieved here by
    determinism)."""
    tune(spark)
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n_groups = nation.count()  # bounded dim (25) — a metadata-scale count
    shards = spark.range(N_SHARDS).select(F.col("id").alias("shard"))
    return shards.join(
        F.broadcast(nation), F.col("n_nationkey") == F.col("shard") % n_groups
    ).select("shard", F.col("n_nationkey").alias("gid"), F.col("n_name").alias("group_name"))
