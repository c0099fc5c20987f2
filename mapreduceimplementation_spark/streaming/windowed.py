"""D1: tumbling-window streaming counts (Structured Streaming).

The batch plan B7 (plans/events.py events_minutely) re-run as a stream:
file readStream → event-time tumbling window + watermark → memory sink,
driven to completion with trigger(availableNow).  In production the same
query runs unmodified against a Kafka/file source with a real trigger —
availableNow is Spark's official backfill/batch-replay mode, so this IS
the deployment plan, not a test harness.

Streaming aggregation restrictions: count(DISTINCT) is unsupported in
streaming, so unlike B7 this emits (n_events, total_value) only.  The sum
uses the same decimal-exact dsum as batch, so results are bit-stable
across microbatch boundaries and cluster sizes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mapreduceimplementation_spark.functions.stable import dsum, sql_dsum
from mapreduceimplementation_spark.registry import register
from mapreduceimplementation_spark.session import tune

_SINK = "d1_windowed_counts_sink"


def _stop_query(spark: SparkSession, name: str) -> None:
    for q in spark.streams.active:
        if q.name == name:
            q.stop()


def _size_stream_state(spark: SparkSession, cap: int = 8) -> None:
    """Cap shuffle partitions for a streaming query.

    Every stateful streaming partition owns state-store instances (a
    stream-stream join keeps FOUR per partition) with per-commit file
    overhead, so partition count should track stateful-key volume, not
    scan width — 32 batch partitions means 128 join state stores doing
    tiny commits.  Batch queries re-tune() to the full width on entry, so
    the cap never leaks past the streaming op."""
    cur = int(spark.conf.get("spark.sql.shuffle.partitions"))
    spark.conf.set("spark.sql.shuffle.partitions", str(min(cur, cap)))


#: per-path schema cache — the probe read lists and foots the file; doing
#: it once per path instead of per call saves a job on every stream setup
_SCHEMA_CACHE: dict[str, object] = {}


def _events_stream(spark: SparkSession, path: str, **options) -> DataFrame:
    """events as a file stream with the same nanos→micros ts handling as
    the batch loader (sources/tables.py load_table).

    nanosAsLong is a session-wide conf (same one load_table sets, and it
    must stay set while the stream executes, so it is deliberately not
    restored): every parquet read of this testdata needs it, and all of
    this repo's reads go through load_table/_events_stream which handle
    the long→timestamp fixup."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if path not in _SCHEMA_CACHE:
        _SCHEMA_CACHE[path] = spark.read.parquet(path).schema  # ts = long nanos
    schema = _SCHEMA_CACHE[path]
    if os.path.isfile(path):
        # the file-stream source accepts directories and globs but not bare
        # file paths; a single-char class makes an exact-match glob
        path = f"{path[:-1]}[{path[-1]}]"
    reader = spark.readStream.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    raw = reader.parquet(path)
    if isinstance(raw.schema["ts"].dataType, T.LongType):
        # testdata writes TIMESTAMP(NANOS), surfaced as long under the
        # nanosAsLong conf; plain micro-resolution files need no rewrite
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(raw.schema["ts"].dataType, T.TimestampNTZType):
        # watermarks require TIMESTAMP; session tz is UTC so this is lossless
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


@register(
    "streaming_windowed_counts",
    oracle=f"""
    SELECT date_trunc('minute', ts) AS minute,
           event_type,
           count(*) AS n_events,
           {sql_dsum('value')} AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def streaming_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-minute tumbling windowed counts with a 1-minute watermark.

    complete output mode + availableNow: every window (including the ones
    still inside the watermark at end-of-input) is present in the sink, so
    the result equals the batch aggregation exactly — the correctness gate
    a streaming re-platform needs before switching traffic.
    """
    tune(spark)
    _size_stream_state(spark)
    _stop_query(spark, _SINK)
    ev = _events_stream(spark, os.path.join(sf_dir, "events.parquet"))
    agg = (
        ev.withWatermark("ts", "1 minute")
        .groupBy(F.window("ts", "1 minute").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("minute"), "event_type", "n_events", "total_value"
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(_SINK)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(_SINK)


_JSON_SINK = "d5_windowed_counts_json_sink"


@register(
    "streaming_windowed_counts_json",
    oracle=f"""
    SELECT date_trunc('minute', ts) AS minute,
           event_type,
           count(*) AS n_events,
           {sql_dsum('value')} AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def streaming_windowed_counts_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1's windowed aggregation fed by a JSON-lines FILE STREAM — the
    production drop-folder ingestion path (collectors append .jsonl
    shards; the stream discovers and drains them).  Completes the
    streaming x format matrix cell: the same query, watermark and sink
    semantics as D1, with the source swapped to the materialized .jsonl
    twin of the events table — so its oracle is IDENTICAL to D1's, and a
    green row proves the JSON streaming ingest is value-exact end to end
    (µs timestamps and doubles included).

    Same scale rules as the batch JSON reader (sources/jsonl.py):
    explicit schema (inference on a stream is a full re-list + read per
    trigger), explicit timestampFormat, FAILFAST.  maxFilesPerTrigger
    bounds each microbatch: 3 triggers drain the 8 shards, exercising
    multi-batch accumulation in the sink."""
    from mapreduceimplementation_spark.sources.jsonl import (
        _TS_FMT,
        EVENTS_SCHEMA,
        materialize_events_jsonl,
    )

    tune(spark)
    _size_stream_state(spark)
    _stop_query(spark, _JSON_SINK)
    d = materialize_events_jsonl(sf_dir)
    ev = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("timestampFormat", _TS_FMT)
        .option("mode", "FAILFAST")
        .option("maxFilesPerTrigger", "3")
        .json(os.path.join(d, "events-*.jsonl"))
    )
    agg = (
        ev.withWatermark("ts", "1 minute")
        .groupBy(F.window("ts", "1 minute").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("minute"), "event_type", "n_events", "total_value"
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(_JSON_SINK)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(_JSON_SINK)


_TOPK_SINK = "d11_topk_sink"
_TOPK_K = 3


@register(
    "streaming_topk",
    oracle=f"""
    WITH c AS (
        SELECT date_trunc('minute', ts) AS minute, event_type,
               count(*) AS n_events
        FROM events GROUP BY 1, 2
    )
    SELECT minute, event_type, n_events, rnk FROM (
        SELECT minute, event_type, n_events,
               CAST(row_number() OVER (
                   PARTITION BY minute
                   ORDER BY n_events DESC, event_type) AS BIGINT) AS rnk
        FROM c
    ) WHERE rnk <= {_TOPK_K}
    """,
)
def streaming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D11: per-window top-{_TOPK_K} event types — the streaming
    leaderboard (trending-now) shape.  The STREAM maintains only the
    windowed counts (the same bounded windows × types state as D1);
    the rank is a batch window over the sink's dim-sized result, because
    a per-window top-k cannot be finalized while the window can still
    receive data — ranking at read time is how a production dashboard
    queries such a sink (the Kappa-architecture serving-layer split).

    complete mode + availableNow ⇒ equals the batch top-k exactly
    (ties broken by event_type: a total order, so the frontier is
    deterministic across engines and partitionings)."""
    tune(spark)
    _size_stream_state(spark)
    _stop_query(spark, _TOPK_SINK)
    ev = _events_stream(spark, os.path.join(sf_dir, "events.parquet"))
    agg = (
        ev.withWatermark("ts", "1 minute")
        .groupBy(F.window("ts", "1 minute").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("win.start").alias("minute"), "event_type", "n_events")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(_TOPK_SINK)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    from pyspark.sql.window import Window

    w = Window.partitionBy("minute").orderBy(
        F.col("n_events").desc(), "event_type"
    )
    return (
        spark.table(_TOPK_SINK)
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= _TOPK_K)
    )
