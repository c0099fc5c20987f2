"""Lake-maintenance semantics (SURVEY.md §2 B71–B72): MERGE upsert and
snapshot-diff verdicts pinned on crafted fixtures where every branch is
forced — insert / update / carry / delete for the MERGE, and all four
diff verdicts plus the per-column change mask for the reconciliation.
The oracle gate certifies parity with the naive full-outer-join
statement; these tests pin the SEMANTICS on rows chosen by hand.
"""

from __future__ import annotations

import datetime as dt

import pytest

import mapreduceimplementation_spark as eng

eng.load_all_operators()

_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def _write_events(spark, tmp_path, rows, name):
    d = str(tmp_path / name)
    spark.createDataFrame(rows, _SCHEMA).write.parquet(d + "/events.parquet")
    return d


def _ts(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


def test_merge_upsert_branches(spark, tmp_path):
    """One user per MERGE branch: carried (base only), inserted (change
    only), updated (both), deleted-on-match, deleted-unmatched (never
    inserted)."""
    rows = [
        # u1: base only -> carried
        (1, _ts(2), 1, "view", 1.25, "{}"),
        (2, _ts(3), 1, "click", 2.00, "{}"),
        # u2: changes only -> inserted
        (3, _ts(20), 2, "purchase", 4.50, "{}"),
        # u3: both -> updated (change wins status, totals add)
        (4, _ts(4), 3, "signup", 1.00, "{}"),
        (5, _ts(22), 3, "view", 0.25, "{}"),
        # u4: both, change feed ends in error -> deleted
        (6, _ts(5), 4, "click", 3.00, "{}"),
        (7, _ts(21), 4, "purchase", 1.75, "{}"),
        (8, _ts(23), 4, "error", 0.50, "{}"),
        # u5: changes only, ending in error -> never appears
        (9, _ts(25), 5, "error", 9.25, "{}"),
    ]
    d = _write_events(spark, tmp_path, rows, "merge_fixture")
    got = {
        r["user_id"]: r
        for r in eng.QUERIES["table_merge_upsert"](spark, d).collect()
    }
    assert set(got) == {1, 2, 3}
    assert got[1]["row_status"] == "carried"
    assert got[1]["status"] == "click" and got[1]["total_cents"] == 325
    assert got[2]["row_status"] == "inserted"
    assert got[2]["status"] == "purchase" and got[2]["total_cents"] == 450
    assert got[3]["row_status"] == "updated"
    assert got[3]["status"] == "view"  # change side wins
    assert got[3]["total_cents"] == 125 and got[3]["n_events"] == 2
    assert got[3]["last_ts"] == _ts(22)


def test_snapshot_diff_verdicts_and_mask(spark, tmp_path):
    """All four verdicts forced: removed (old window only), added (new
    only), unchanged (identical rows in the overlap), changed (extra
    out-of-overlap rows flip count/cents/status) — and the change mask
    names exactly the differing columns."""
    rows = [
        # u1: only days 1-10 -> removed
        (1, _ts(5), 1, "view", 1.25, "{}"),
        # u2: only days 21-30 -> added
        (2, _ts(25), 2, "click", 2.50, "{}"),
        # u3: only overlap days 11-20 -> unchanged
        (3, _ts(15), 3, "purchase", 3.00, "{}"),
        # u4: overlap + day 5 + day 25 -> changed, all three columns
        (4, _ts(15), 4, "view", 1.00, "{}"),
        (5, _ts(5), 4, "view", 2.00, "{}"),
        (6, _ts(25), 4, "signup", 4.00, "{}"),
        (9, _ts(26), 4, "signup", 0.50, "{}"),
        # u5: day 5 and day 25 rows with SAME count/cents/status
        #     -> changed must NOT fire (mask empty, verdict unchanged)
        (7, _ts(5), 5, "click", 1.50, "{}"),
        (8, _ts(25), 5, "click", 1.50, "{}"),
    ]
    d = _write_events(spark, tmp_path, rows, "diff_fixture")
    got = {
        r["user_id"]: r
        for r in eng.QUERIES["table_snapshot_diff"](spark, d).collect()
    }
    assert got[1]["diff_status"] == "removed" and got[1]["new_n"] is None
    assert got[2]["diff_status"] == "added" and got[2]["old_n"] is None
    assert got[3]["diff_status"] == "unchanged" and got[3]["changed_cols"] == ""
    assert got[4]["diff_status"] == "changed"
    assert got[4]["changed_cols"] == "n_events,total_cents,status"
    assert got[5]["diff_status"] == "unchanged" and got[5]["changed_cols"] == ""


@pytest.mark.parametrize("name", ["table_merge_upsert", "table_snapshot_diff"])
def test_lake_ops_single_exchange(spark, sf_dir, name):
    """The whole point of the rewrite: the oracle's full outer join is
    TWO scans + a join; the shipped plan must be ONE scan and ONE
    exchange (slice-conditional aggregation)."""
    df = eng.QUERIES[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan, plan


# ---------------------------------------------------------------------------
# B82 table_compaction_plan


def test_compaction_plan_invariants(spark):
    """B82 packing contract at sf0.01 (both actions occur there): keeps
    are exactly the at-or-over-target files and stay ungrouped; compact
    groups never straddle a partition, are numbered contiguously from 0
    within it, straddle target by at most their last file, and group
    rollups equal the member sums."""
    from mapreduceimplementation_spark.plans.lake import _CMP_TARGET

    rows = eng.QUERIES["table_compaction_plan"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    keeps = [r for r in rows if r["action"] == "keep"]
    comps = [r for r in rows if r["action"] == "compact"]
    assert keeps and comps
    for r in keeps:
        assert r["file_bytes"] >= _CMP_TARGET and r["out_group"] == -1
    groups = {}
    for r in comps:
        assert r["file_bytes"] < _CMP_TARGET and r["out_group"] >= 0
        groups.setdefault((r["day"], r["out_group"]), []).append(r)
    assert any(len(g) > 1 for g in groups.values())
    days = {}
    for (day, gid), members in groups.items():
        days.setdefault(day, set()).add(gid)
        total = sum(m["file_bytes"] for m in members)
        assert all(m["group_bytes"] == total for m in members)
        assert all(m["group_files"] == len(members) for m in members)
        # overflow bounded by one member file
        assert total < _CMP_TARGET + max(m["file_bytes"] for m in members)
    for day, gids in days.items():
        assert gids == set(range(len(gids)))  # contiguous from 0
        # packing order: groups are filled in event_type order — every
        # file in group g precedes every file of g+1 alphabetically
        order = sorted(
            (r["event_type"], r["out_group"]) for r in comps if r["day"] == day
        )
        gseq = [g for _, g in order]
        assert gseq == sorted(gseq)
