"""Structured Streaming tests (SURVEY.md §2 D1–D2).

The driver's oracle gate already hash-checks both operators at sf0.01;
these tests cover what the single-file gate can't: multi-microbatch state
carry-over in the stateful sessionizer.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import mapreduceimplementation_spark as eng
from mapreduceimplementation_spark.sources.tables import load_table
from mapreduceimplementation_spark.streaming.sessionize import run_sessionize_stream

eng.load_all_operators()


def _rows(df):
    return sorted(
        (
            int(r["user_id"]),
            int(r["session_id"]),
            int(r["n_events"]),
            r["session_start"],
            r["session_end"],
            round(float(r["total_value"]), 6),
        )
        for r in df.collect()
    )


def test_streaming_windowed_equals_batch(spark, sf_dir):
    """D1 complete-mode availableNow result == the batch aggregation."""
    from pyspark.sql import functions as F

    from mapreduceimplementation_spark.functions.stable import dsum

    stream = eng.QUERIES["streaming_windowed_counts"](spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    batch = ev.groupBy(
        F.date_trunc("minute", "ts").alias("minute"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("total_value"))
    a = sorted(map(tuple, stream.collect()))
    b = sorted(map(tuple, batch.collect()))
    assert a == b


def test_sessionize_state_survives_microbatches(spark, sf_dir, tmp_path):
    """Split events into 3 files, stream them one file per microbatch:
    sessions spanning batch boundaries must be stitched by GroupState and
    the reconciled output must equal the batch twin exactly."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    pdf = ev.toPandas().sort_values(["ts", "event_id"])
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    d = tmp_path / "events_stream"
    d.mkdir()
    k = len(pdf) // 3
    for i, chunk in enumerate((pdf[:k], pdf[k : 2 * k], pdf[2 * k :])):
        p = str(d / f"part-{i:02d}.parquet")
        pq.write_table(pa.Table.from_pandas(chunk, preserve_index=False), p)
        os.utime(p, (1_000_000_000 + i * 100, 1_000_000_000 + i * 100))

    out = run_sessionize_stream(
        spark, str(d), sink="d2_multibatch_sink", maxFilesPerTrigger=1
    )
    # the raw sink must contain provisional re-emits (proves >1 microbatch
    # actually fed state carry-over, not one big batch)
    raw_n = spark.table("d2_multibatch_sink").count()
    final = _rows(out)
    assert raw_n > len(final)

    batch = eng.QUERIES["events_sessionize"](spark, sf_dir)
    assert final == _rows(batch)
