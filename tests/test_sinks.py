"""Partitioned-sink tests: layout, round-trip, and the pruning gate."""

from __future__ import annotations

import contextlib
import io
import os

from pyspark.sql import functions as F

from mapreduceimplementation_spark.sources.sinks import (
    read_partitioned,
    write_partitioned,
)
from mapreduceimplementation_spark.sources.tables import load_table


def _plan(df) -> str:
    from tests.conftest import formatted_plan

    return formatted_plan(df)


def test_partitioned_write_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    out = str(tmp_path / "events_by_type")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    write_partitioned(ev, out, "event_type")

    # hive layout: one directory per partition value
    dirs = sorted(d for d in os.listdir(out) if d.startswith("event_type="))
    types = sorted(
        r["event_type"] for r in ev.select("event_type").distinct().collect()
    )
    assert dirs == [f"event_type={t}" for t in types]

    # round-trip equality (partition col round-trips through the dir name)
    back = read_partitioned(spark, out).select(*ev.columns)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, ev.collect()))

    # the pruning gate: a partition-column filter must be a PartitionFilter
    # on the scan (pruned before I/O), not a row-level PushedFilter
    filtered = read_partitioned(spark, out).where(F.col("event_type") == "click")
    plan = _plan(filtered)
    assert "PartitionFilters" in plan
    seg = plan[plan.index("PartitionFilters") :].splitlines()[0]
    assert "event_type" in seg
    n_click = ev.where(F.col("event_type") == "click").count()
    assert filtered.count() == n_click


def test_partitioned_write_requires_columns(spark, sf_dir, tmp_path):
    import pytest

    ev = load_table(spark, sf_dir, "events")
    with pytest.raises(ValueError):
        write_partitioned(ev, str(tmp_path / "x"))


def test_compact_bounds_file_count_and_size(spark, sf_dir, tmp_path):
    """Compaction of a many-partition frame yields ceil(n/target) files,
    none exceeding the per-file record cap, with all rows intact."""
    import glob

    from mapreduceimplementation_spark.sources.sinks import compact

    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id")
        .repartition(64)  # simulate small-files accretion: 64 tiny parts
    )
    n = ev.count()
    target = 2500
    out = str(tmp_path / "compacted")
    compact(ev, out, target)

    files = glob.glob(out + "/part-*.parquet")
    expected = max(1, -(-n // target))
    assert len(files) == expected, (len(files), expected)

    back = spark.read.parquet(out)
    assert back.count() == n
    import pyarrow.parquet as pq

    for f in files:
        assert pq.read_metadata(f).num_rows <= target
