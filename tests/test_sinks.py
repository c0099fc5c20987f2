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


def test_sorted_write_enables_row_group_skipping(spark, sf_dir, tmp_path):
    """Sort-on-write data-skipping exhibit: the same events written
    range-sorted by ts vs hash-shuffled must (a) answer a time-range
    query identically and (b) differ in SKIPPABILITY — the sorted
    layout's parquet row-group [min, max] ts statistics let a 5%% range
    predicate prune most row groups at the footer, while the shuffled
    layout's row groups all straddle the full range and none can be
    skipped.  The stats checked here are exactly what Spark's parquet
    pushdown consults, so the assertion pins the I/O behavior without
    timing anything."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from mapreduceimplementation_spark.sources.sinks import write_sorted
    from mapreduceimplementation_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    sorted_p = str(tmp_path / "ev_sorted")
    shuffled_p = str(tmp_path / "ev_shuffled")
    write_sorted(ev, sorted_p, "ts", n_files=8)
    # the shuffled twin must use the same int64 timestamp encoding, or
    # the comparison measures INT96's missing stats rather than layout
    spark.conf.set(
        "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
    )
    try:
        ev.repartition(8).write.mode("overwrite").parquet(shuffled_p)
    finally:
        spark.conf.unset("spark.sql.parquet.outputTimestampType")

    lo_ts, hi_ts = ev.agg(F.min("ts"), F.max("ts")).first()
    q_lo = lo_ts + (hi_ts - lo_ts) * 45 // 100
    q_hi = lo_ts + (hi_ts - lo_ts) * 50 // 100

    def touched_row_groups(path):
        touched = total = 0
        for f in sorted(glob.glob(f"{path}/*.parquet")):
            pf = pq.ParquetFile(f)
            ti = pf.schema_arrow.get_field_index("ts")
            for i in range(pf.metadata.num_row_groups):
                st = pf.metadata.row_group(i).column(ti).statistics
                total += 1
                # stats deserialize tz-aware (UTC); session is UTC too
                mn = st.min.replace(tzinfo=None)
                mx = st.max.replace(tzinfo=None)
                if mn <= q_hi and mx >= q_lo:
                    touched += 1
        return touched, total

    s_touch, s_total = touched_row_groups(sorted_p)
    h_touch, h_total = touched_row_groups(shuffled_p)
    # identical answers
    pred = (F.col("ts") >= F.lit(q_lo)) & (F.col("ts") < F.lit(q_hi))
    a = sorted(map(repr, spark.read.parquet(sorted_p).where(pred).collect()))
    b = sorted(map(repr, spark.read.parquet(shuffled_p).where(pred).collect()))
    assert a == b and len(a) > 0
    # the shuffled layout cannot skip anything: every row group straddles
    # the whole time range; the sorted layout prunes most of them
    assert h_touch == h_total >= 8
    assert s_touch < h_touch
    assert s_touch <= max(1, s_total // 4), (s_touch, s_total)


def test_zorder_write_prunes_both_dimensions(spark, sf_dir, tmp_path):
    """Z-order data-skipping exhibit: events written Morton-clustered on
    (user_id, ts) vs range-sorted on ts alone.  The ts-sorted layout is
    unbeatable on time ranges but prunes NOTHING for a user-range
    predicate (every file spans all users); the Z layout must prune row
    groups for a user range AND for a time range — sqrt-ish locality on
    each dimension from one layout.  Row bytes and query answers are
    identical in both layouts; only the footer statistics differ, and
    those stats are exactly what Spark's parquet pushdown consults."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from mapreduceimplementation_spark.sources.sinks import (
        write_sorted,
        write_zordered,
    )
    from mapreduceimplementation_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    z_p = str(tmp_path / "ev_z")
    lin_p = str(tmp_path / "ev_lin")
    write_zordered(ev, z_p, ("user_id", "ts"), n_files=16)
    write_sorted(ev, lin_p, "ts", n_files=16)

    u_lo, u_hi, t_lo, t_hi = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("ts"), F.max("ts")
    ).first()
    # a 10% slice of each dimension, placed inside the first quadrant so
    # curve-cell boundaries cannot straddle it
    uq = (u_lo + (u_hi - u_lo) * 5 // 100, u_lo + (u_hi - u_lo) * 15 // 100)
    tq = (
        t_lo + (t_hi - t_lo) * 5 // 100,
        t_lo + (t_hi - t_lo) * 15 // 100,
    )

    def touched(path, col, lo, hi):
        hit = total = 0
        for f in sorted(glob.glob(f"{path}/*.parquet")):
            pf = pq.ParquetFile(f)
            ti = pf.schema_arrow.get_field_index(col)
            for i in range(pf.metadata.num_row_groups):
                st = pf.metadata.row_group(i).column(ti).statistics
                total += 1
                mn, mx = st.min, st.max
                if hasattr(mn, "replace"):
                    mn = mn.replace(tzinfo=None)
                    mx = mx.replace(tzinfo=None)
                if mn <= hi and mx >= lo:
                    hit += 1
        return hit, total

    zu, zt_total = touched(z_p, "user_id", *uq)
    zt, _ = touched(z_p, "ts", *tq)
    lu, l_total = touched(lin_p, "user_id", *uq)
    lt, _ = touched(lin_p, "ts", *tq)

    # linear-by-ts: great on ts, blind on user_id
    assert lu == l_total
    assert lt <= l_total // 4
    # z-order: prunes BOTH dimensions (neither as tight as a dedicated
    # sort, both far better than nothing)
    assert zu <= zt_total // 2, (zu, zt_total)
    assert zt <= zt_total // 2, (zt, zt_total)

    # identical answers from identical bytes, any layout
    for lo_hi, col in ((uq, "user_id"), (tq, "ts")):
        a = (
            spark.read.parquet(z_p)
            .where(F.col(col).between(*lo_hi))
            .agg(F.count(F.lit(1)), F.sum("event_id"))
            .first()
        )
        b = (
            spark.read.parquet(lin_p)
            .where(F.col(col).between(*lo_hi))
            .agg(F.count(F.lit(1)), F.sum("event_id"))
            .first()
        )
        assert tuple(a) == tuple(b)


def test_compact_files_merges_without_shuffle(spark, sf_dir, tmp_path):
    """Small-files compaction: 64 tiny files coalesce into few target-size
    files with identical rows, and the rewrite plan contains NO Exchange
    (coalesce is a narrow dependency — each byte moves once)."""
    from pyspark.sql import functions as F

    from mapreduceimplementation_spark.sources.sinks import compact_files
    from mapreduceimplementation_spark.sources.tables import load_table

    import glob

    ev = load_table(spark, sf_dir, "events")
    small_p = str(tmp_path / "small")
    ev.repartition(64).write.parquet(small_p)
    assert len(glob.glob(f"{small_p}/*.parquet")) == 64

    out_p = str(tmp_path / "compacted")
    n = compact_files(spark, small_p, out_p, target_bytes=64 << 20)
    n_files = len(glob.glob(f"{out_p}/*.parquet"))
    assert n_files <= n < 64

    crc = lambda p: tuple(
        spark.read.parquet(p)
        .agg(
            F.count(F.lit(1)),
            F.sum(F.crc32(F.encode(F.to_json(F.struct("event_id", "value")), "UTF-8"))),
        )
        .first()
    )
    assert crc(out_p) == crc(small_p)

    # the compaction plan itself must be shuffle-free
    plan = (
        spark.read.parquet(small_p)
        .coalesce(n)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_bucketed_write_joins_without_shuffle(spark, sf_dir, tmp_path):
    """write_bucketed: orders and lineitem bucketed on their join keys with
    the same bucket count sort-merge-join with ZERO Exchange (the shuffle
    was paid once at write time), the plan reads both sides 'Bucketed: true',
    and the join result is row-identical to the plain-parquet join."""
    from mapreduceimplementation_spark.sources.sinks import (
        read_bucketed,
        write_bucketed,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed(
        orders, "t_orders_b", 8, "o_orderkey", path=str(tmp_path / "orders_b")
    )
    write_bucketed(
        lineitem, "t_lineitem_b", 8, "l_orderkey", path=str(tmp_path / "lineitem_b")
    )
    try:
        ob, lb = read_bucketed(spark, "t_orders_b"), read_bucketed(spark, "t_lineitem_b")
        old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = ob.join(
                lb, ob["o_orderkey"] == lb["l_orderkey"]
            ).select("o_orderkey", "l_quantity", "o_totalprice", "l_extendedprice")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            assert "SortMergeJoin" in plan, plan
            assert plan.count("Bucketed: true") == 2, plan
            # the unbucketed twin shuffles both sides
            plain = orders.join(
                lineitem, orders["o_orderkey"] == lineitem["l_orderkey"]
            ).select("o_orderkey", "l_quantity", "o_totalprice", "l_extendedprice")
            plain_plan = plain._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" in plain_plan, plain_plan
            # identical rows
            assert joined.exceptAll(plain).count() == 0
            assert plain.exceptAll(joined).count() == 0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_compaction_plan_roundtrip_executes(spark, tmp_path):
    """VERDICT r7 item 5: B82's compaction PLAN tied to EXECUTION.
    Materialize the plan's manifest as a physical small-file lake (one
    parquet file per (day, event_type) ingestion cell — exactly the
    synthetic manifest's grain), execute the plan with the
    compact_files machinery (keep files copied untouched, each compact
    group coalesced into ONE file), then verify the rewritten lake
    matches the plan: per-day output file count = keeps + groups, per
    group the merged file holds exactly the union of its members' rows
    (count AND event-id identity), and the whole lake is row-identical
    to the source."""
    import collections
    import pathlib
    import shutil

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    import mapreduceimplementation_spark as eng
    from mapreduceimplementation_spark.sources.sinks import compact_files

    eng.load_all_operators()
    sf = "/root/testdata/sf0.01"
    plan = eng.QUERIES["table_compaction_plan"](spark, sf).collect()
    assert any(r["action"] == "keep" for r in plan)
    multi = collections.Counter(
        (r["day"], r["out_group"]) for r in plan if r["action"] == "compact"
    )
    assert any(c > 1 for c in multi.values())  # real multi-file groups

    # physical lake at the manifest grain
    ev = (
        load_table(spark, sf, "events")
        .select("event_id", "ts", "event_type")
        .toPandas()
    )
    ev["day"] = ev["ts"].dt.floor("D")
    lake = pathlib.Path(tmp_path) / "lake"
    cell_ids: dict[tuple, set] = {}
    for (day, etype), cell in ev.groupby(["day", "event_type"]):
        d = lake / day.strftime("%Y-%m-%d")
        d.mkdir(parents=True, exist_ok=True)
        pq.write_table(
            pa.Table.from_pandas(cell[["event_id"]], preserve_index=False),
            d / f"{etype}.parquet",
        )
        cell_ids[(day.strftime("%Y-%m-%d"), etype)] = set(cell["event_id"])

    # every manifest cell must exist physically and vice versa
    plan_cells = {
        (r["day"].strftime("%Y-%m-%d"), r["event_type"]) for r in plan
    }
    assert plan_cells == set(cell_ids)

    # execute the plan
    out = pathlib.Path(tmp_path) / "compacted"
    groups: dict[tuple, list] = collections.defaultdict(list)
    n_keep = 0
    for r in plan:
        day = r["day"].strftime("%Y-%m-%d")
        src = lake / day / f"{r['event_type']}.parquet"
        if r["action"] == "keep":
            dst = out / day
            dst.mkdir(parents=True, exist_ok=True)
            shutil.copy(src, dst / src.name)  # untouched: not rewritten
            n_keep += 1
        else:
            groups[(day, r["out_group"])].append(r)
    for (day, g), members in groups.items():
        stage = pathlib.Path(tmp_path) / "stage" / day / str(g)
        stage.mkdir(parents=True, exist_ok=True)
        for r in members:
            shutil.copy(
                lake / day / f"{r['event_type']}.parquet",
                stage / f"{r['event_type']}.parquet",
            )
        gout = out / day / f"group_{g}"
        # one group -> ONE target-size output file
        n = compact_files(spark, str(stage), str(gout), target_bytes=1 << 40)
        assert n == 1

    # verify: per-day file count = keeps + groups
    per_day_expected = collections.Counter()
    for r in plan:
        if r["action"] == "keep":
            per_day_expected[r["day"].strftime("%Y-%m-%d")] += 1
    for (day, g) in groups:
        per_day_expected[day] += 1
    for day, expected in per_day_expected.items():
        found = [
            p
            for p in (out / day).rglob("*.parquet")
            if not p.name.startswith("_")
        ]
        assert len(found) == expected, (day, len(found), expected)

    # verify: each group file is exactly the union of its members
    for (day, g), members in groups.items():
        got = set(
            pd.concat(
                [
                    pq.read_table(p).to_pandas()
                    for p in (out / day / f"group_{g}").glob("*.parquet")
                ]
            )["event_id"]
        )
        want = set().union(
            *(cell_ids[(day, r["event_type"])] for r in members)
        )
        assert got == want, (day, g)
        assert len(got) == sum(r["n_rows"] for r in members)

    # verify: the rewritten lake is row-identical to the source
    all_out = set(
        pd.concat(
            [pq.read_table(p).to_pandas() for p in out.rglob("*.parquet")]
        )["event_id"]
    )
    assert all_out == set(ev["event_id"])
