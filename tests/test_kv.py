"""KV-plan tests (SURVEY.md §2 B10–B12, B15)."""

from __future__ import annotations

import hashlib

import mapreduceimplementation_spark as eng

eng.load_all_operators()


def _py_hash64(s: str) -> int:
    """Pure-Python twin of functions.hashing.hash64 (first 15 md5 hex chars)."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_hrw_minimal_movement(spark, sf_dir):
    """The shardctrler guarantee: when groups Leave, ONLY their shards
    move — every other shard's rendezvous argmax is untouched — and no
    shard remains on a departed group."""
    out = eng.QUERIES["shard_rebalance_hrw"](spark, sf_dir).toPandas()
    assert len(out) == 64
    moved = out[out["moved"]]
    stayed = out[~out["moved"]]
    assert (moved["gid_full"] % 5 == 3).all()  # only leavers' shards move
    assert (stayed["gid_full"] == stayed["gid_alive"]).all()
    assert (out["gid_alive"] % 5 != 3).all()  # nothing lands on a leaver
    # balance sanity: surviving groups each hold a bounded share
    counts = out["gid_alive"].value_counts()
    assert counts.max() <= 3 * max(1, 64 // counts.size)


def test_wordcount_text_equals_parquet_path(spark, sf_dir):
    """Whole-file ingestion must produce byte-identical wordcounts to the
    parquet path (reference golden check across input formats)."""
    a = sorted(map(tuple, eng.QUERIES["mr_wordcount"](spark, sf_dir).collect()))
    b = sorted(map(tuple, eng.QUERIES["mr_wordcount_text"](spark, sf_dir).collect()))
    assert a == b


def test_log_compact_snapshot_plus_tail_equals_full_replay(spark, sf_dir):
    """B16, the Raft snapshot invariant: replaying the tail ops onto the
    snapshot state must reproduce the full-log replay (kv_apply_log)."""
    comp = eng.QUERIES["kv_log_compact"](spark, sf_dir).toPandas().set_index("key")
    full = eng.QUERIES["kv_apply_log"](spark, sf_dir).toPandas().set_index("key")
    assert set(comp.index) == set(full.index)
    for key, r in comp.iterrows():
        if r["tail_has_put"]:
            recon = r["tail_value"]  # a tail Put resets state: snapshot dies
        elif r["snapshot_value"] and r["tail_value"]:
            recon = r["snapshot_value"] + ";" + r["tail_value"]
        else:
            recon = r["snapshot_value"] or r["tail_value"]
        assert recon == r["final_value"], key
        assert r["final_value"] == full.loc[key, "value"], key
        assert r["cutoff"] >= 0 and r["n_tail"] >= 1


def test_raft_commit_matches_pure_python_model(spark, sf_dir):
    """B15 against a from-scratch Python model: recompute shard counts and
    peer matchIndexes with hashlib directly and check the majority-commit
    rule (3rd-largest of 5) shard by shard."""
    from collections import Counter

    from mapreduceimplementation_spark.plans.kv import N_PEERS, N_RAFT_SHARDS
    from mapreduceimplementation_spark.sources.tables import load_table

    out = {
        int(r["shard"]): (int(r["log_len"]), int(r["commit_idx"]), int(r["n_uncommitted"]))
        for r in eng.QUERIES["raft_committed_prefix"](spark, sf_dir).collect()
    }

    user_ids = [
        int(r["user_id"])
        for r in load_table(spark, sf_dir, "events").select("user_id").collect()
    ]
    lens = Counter(_py_hash64(f"shard-{u}") % N_RAFT_SHARDS for u in user_ids)
    assert set(out) == set(lens)
    for shard, log_len in lens.items():
        match = sorted(
            (1 + _py_hash64(f"raft-{shard}-{p}") % log_len for p in range(N_PEERS)),
            reverse=True,
        )
        commit = match[2]  # majority (3 of 5) ack point
        assert out[shard] == (log_len, commit, log_len - commit)
        assert 1 <= commit <= log_len


def test_config_log_replay_semantics(spark, sf_dir):
    """B29 shardctrler config history: config 0 is all-shards->gid0; every
    later config covers all 10 shards with alive owners; Move pins the
    exact shard and moves nothing else; Join/Leave move the minimum
    (joiner-stolen / leaver-owned + cleared-pin shards only); Query(num)
    is reproducible (historical configs immutable)."""
    from mapreduceimplementation_spark.plans.kv import (
        _CTRL_LAST_CFG,
        N_CTRL_SHARDS,
    )

    out = eng.QUERIES["config_log_replay"](spark, sf_dir).toPandas()
    assert len(out) == (_CTRL_LAST_CFG + 1) * N_CTRL_SHARDS

    cfg = {
        num: g.set_index("shard")[["gid", "pinned"]].sort_index()
        for num, g in out.groupby("num")
    }
    # config 0: the invalid group owns everything (common.go: Config #0)
    assert (cfg[0]["gid"] == 0).all() and not cfg[0]["pinned"].any()

    # op log shape mirrored from the plan (kv.py _CTRL op table)
    join_at = {g + 1: g for g in range(25)}
    leave_at = {30 + (g - 3) // 5: g for g in range(25) if g % 5 == 3}
    move_at = {}
    for s in range(N_CTRL_SHARDS):
        if s % 3 == 0:
            move_at[26 + s // 3] = (s, 5 * (s % 5) + s % 3)
        elif s % 3 == 1:
            move_at[35 + s // 3] = (s, 5 * (s % 5) + s % 3)

    alive = set()
    for num in range(1, _CTRL_LAST_CFG + 1):
        if num in join_at:
            alive.add(join_at[num])
        elif num in leave_at:
            alive.discard(leave_at[num])
        cur, prev = cfg[num], cfg[num - 1]
        assert sorted(cur.index) == list(range(N_CTRL_SHARDS))
        # every owner is alive (pins always target living groups)
        assert set(cur["gid"]) <= alive
        changed = cur.index[cur["gid"] != prev["gid"]]
        if num in move_at:
            s, g = move_at[num]
            assert cur.loc[s, "gid"] == g and cur.loc[s, "pinned"]
            assert set(changed) <= {s}  # nothing else moved
        elif num in join_at and num > 1:
            # a Join steals only the shards whose HRW argmax is the joiner
            assert (cur.loc[changed, "gid"] == join_at[num]).all()
        elif num in leave_at:
            # only the leaver's shards and cleared pins may move
            was_pinned = prev.index[prev["pinned"]]
            leaver_owned = prev.index[prev["gid"] == leave_at[num]]
            assert set(changed) <= set(was_pinned) | set(leaver_owned)
            assert leave_at[num] not in set(cur["gid"])

    # the final config carries exactly the surviving pin wave {1,4,7}
    last = cfg[_CTRL_LAST_CFG]
    assert set(last.index[last["pinned"]]) == {1, 4, 7}

    # Query(num) reproducibility: a second run returns identical history
    again = eng.QUERIES["config_log_replay"](spark, sf_dir).toPandas()
    a = out.sort_values(["num", "shard"]).reset_index(drop=True)
    b = again.sort_values(["num", "shard"]).reset_index(drop=True)
    assert a.equals(b)


def test_migration_diff_invariants(spark, sf_dir):
    """B30 lab-4B invariants: (1) a key appears for config N iff its
    shard's owner changed at N — non-moving shards' data is untouched;
    (2) per shard the (from_gid, to_gid) hops chain without gaps from
    the initial owner gid 0 (custody is never teleported); (3) every
    moving shard carries its complete key set each hop, with the exact
    kv_apply_log values (the InstallShard payload is the full state)."""
    import pandas as pd

    from mapreduceimplementation_spark.plans.kv import N_CTRL_SHARDS

    mig = eng.QUERIES["shardkv_migration_diff"](spark, sf_dir).toPandas()
    cfg = eng.QUERIES["config_log_replay"](spark, sf_dir).toPandas()
    state = eng.QUERIES["kv_apply_log"](spark, sf_dir).toPandas()
    state["shard"] = state["key"].map(
        lambda k: _py_hash64(f"shard-{k}") % N_CTRL_SHARDS
    )
    keys_of = state.groupby("shard")["key"].apply(set).to_dict()
    val_of = state.set_index("key")["value"].to_dict()

    owner = {
        (r["num"], r["shard"]): r["gid"] for _, r in cfg.iterrows()
    }
    # (1) + (3): per (num, shard) the migration rows are exactly the
    # shard's full key set when the owner changed, absent otherwise
    mg = mig.groupby(["num", "shard"])
    seen = set(mg.groups)
    for num in sorted(cfg["num"].unique()):
        if num == 0:
            continue
        for s in range(N_CTRL_SHARDS):
            moved = owner[(num, s)] != owner[(num - 1, s)]
            has_keys = bool(keys_of.get(s))
            if moved and has_keys:
                g = mg.get_group((num, s))
                assert set(g["key"]) == keys_of[s], (num, s)
                assert (g["from_gid"] == owner[(num - 1, s)]).all()
                assert (g["to_gid"] == owner[(num, s)]).all()
                assert (g["value"] == g["key"].map(val_of)).all()
            else:
                # non-moving (or keyless) shards emit NO migration rows
                assert (num, s) not in seen, (num, s)

    # (2) custody chain: consecutive hops of a shard link exactly
    hops = (
        mig[["num", "shard", "from_gid", "to_gid"]]
        .drop_duplicates()
        .sort_values("num")
    )
    for s, g in hops.groupby("shard"):
        prev_to = 0  # config 0: the invalid group owns everything
        for _, r in g.iterrows():
            assert r["from_gid"] == prev_to, (s, r["num"])
            prev_to = r["to_gid"]


def test_replay_config_log_api_custom_log(spark):
    """B29's parameterized API on a hand-built log the registered query
    can't exercise: Move overridden by a later Move of the same shard,
    Move targeting a NEVER-JOINED group ignored, and a Leave clearing
    pins while removing the leaver from every assignment."""
    from mapreduceimplementation_spark.plans.kv import replay_config_log

    # idx: 1 Join(1), 2 Join(2), 3 Move(0,2), 4 Move(0,1) overrides,
    #      5 Move(3,7) -> gid 7 never joined: ignored,
    #      6 Leave(2) -> pins cleared, only group 1 remains
    ops_join = spark.createDataFrame([(1, 1), (2, 2)], "gid long, idx long")
    ops_leave = spark.createDataFrame([(2, 6)], "gid long, idx long")
    ops_move = spark.createDataFrame(
        [(0, 2, 3), (0, 1, 4), (3, 7, 5)], "shard long, gid long, idx long"
    )
    out = replay_config_log(ops_join, ops_leave, ops_move, n_shards=4)
    cfg = {
        num: g.set_index("shard")[["gid", "pinned"]].sort_index()
        for num, g in out.toPandas().groupby("num")
    }
    assert set(cfg) == set(range(7))
    assert (cfg[0]["gid"] == 0).all()
    # HRW over {1,2} from config 2 until the leave
    base12 = dict(cfg[2]["gid"])
    assert set(base12.values()) <= {1, 2}
    # Move(0,2) pins shard 0 at config 3; Move(0,1) overrides at 4
    assert cfg[3].loc[0, "gid"] == 2 and cfg[3]["pinned"][0]
    assert cfg[4].loc[0, "gid"] == 1 and cfg[4]["pinned"][0]
    # Move(3,7): target never joined -> ignored, shard 3 keeps HRW owner
    assert cfg[5].loc[3, "gid"] == base12[3] and not cfg[5]["pinned"][3]
    # shard 0's pin survives (no membership change at 5)
    assert cfg[5].loc[0, "gid"] == 1 and cfg[5]["pinned"][0]
    # Leave(2): pins cleared, everything lands on the only group left
    assert (cfg[6]["gid"] == 1).all() and not cfg[6]["pinned"].any()


# ---------------------------------------------------------------------------
# B51 linearizability audit: known-violating and known-clean histories


def _audit(spark, rows):
    """rows: (key, kind, val, inv, ret, opid) -> {key: row} of verdicts."""
    from mapreduceimplementation_spark.plans.kv import linearizability_audit

    df = spark.createDataFrame(
        [tuple(map(int, (r[0],))) + (r[1],) + tuple(map(int, r[2:])) for r in rows],
        "key long, kind string, val long, inv long, ret long, opid long",
    )
    return {r["key"]: r.asDict() for r in linearizability_audit(df).collect()}


def test_linearizability_flags_future_read(spark):
    out = _audit(
        spark,
        [
            (1, "put", 1, 100, 200, 10),
            (1, "get", 1, 10, 20, 11),  # returns a write that starts later
        ],
    )
    v = out[1]
    assert v["n_future"] == 1 and not v["linearizable"]
    assert v["n_stale"] == 0 and v["n_reorder"] == 0 and v["n_unknown"] == 0


def test_linearizability_flags_stale_read(spark):
    out = _audit(
        spark,
        [
            (1, "put", 1, 0, 10, 10),
            (1, "put", 2, 20, 30, 11),  # definitively overwrites val=1
            (1, "get", 1, 50, 60, 12),  # ...yet this read still sees val=1
        ],
    )
    v = out[1]
    assert v["n_stale"] == 1 and not v["linearizable"]
    assert v["n_future"] == 0 and v["n_unknown"] == 0


def test_linearizability_flags_read_reorder(spark):
    # w2 overlaps the reads (ret=65) so neither read is STALE, but the
    # non-overlapping read pair observes (new, old) — the inversion rule
    out = _audit(
        spark,
        [
            (1, "put", 1, 0, 10, 10),
            (1, "put", 2, 20, 65, 11),
            (1, "get", 2, 40, 50, 12),  # sees the newer write...
            (1, "get", 1, 60, 70, 13),  # ...then a later read sees the older
        ],
    )
    v = out[1]
    assert v["n_reorder"] == 1 and not v["linearizable"]
    assert v["n_stale"] == 0 and v["n_future"] == 0


def test_linearizability_flags_unknown_value(spark):
    out = _audit(
        spark,
        [
            (1, "put", 1, 0, 10, 10),
            (1, "get", 99, 20, 30, 11),  # value never written
        ],
    )
    v = out[1]
    assert v["n_unknown"] == 1 and not v["linearizable"]


def test_linearizability_clean_concurrent_history(spark):
    # overlapping writes: a read may observe either order; initial-value
    # reads before any write are fine; per-key isolation (key 2 violates,
    # key 1 must stay green — porcupine's partition decomposition).
    # NOTE (r5): put(2) must OVERLAP get(1) — with put(2) returning
    # before get(1) began, key 1's history is a genuine write-order
    # cycle (see test_linearizability_flags_write_order_cycle, which
    # pins that exact history as a violation); the original round-3
    # version of this test wrongly asserted it linearizable.
    out = _audit(
        spark,
        [
            (1, "get", -1, 0, 5, 9),  # initial value, before any write
            (1, "put", 1, 10, 40, 10),
            (1, "put", 2, 20, 45, 11),  # overlaps put(1) AND get(1)
            (1, "get", 1, 35, 50, 12),  # concurrent with both puts: legal
            (1, "get", 2, 60, 70, 13),  # latest definitive value
            (2, "put", 5, 0, 10, 20),
            (2, "get", -1, 50, 60, 21),  # initial AFTER a definitive write
        ],
    )
    assert out[1]["linearizable"] and out[1]["n_cycle"] == 0
    assert out[1]["n_ops"] == 5 and out[1]["n_puts"] == 2 and out[1]["n_gets"] == 3
    v2 = out[2]
    # reading the initial value after val=5 was definitively written is a
    # stale read of the initial state (and therefore also a crossing of
    # the initial cluster with val=5's cluster)
    assert v2["n_stale"] == 1 and not v2["linearizable"]
    assert v2["n_cycle"] >= 1


def test_linearizability_flags_write_order_cycle(spark):
    """The completeness gap the r5 brute-force differential exposed: two
    overlapping writes whose reads force OPPOSITE write orders.  put(2)
    finishes before get(1) begins, so put(2) < get(1) in real time ⇒
    put(2) must precede put(1) (else it would sit between put(1) and its
    read); but get(2) runs after everything ⇒ put(2) must FOLLOW put(1).
    No read pair is comparable and no write sits inside a read's match
    window, so stale and reorder both stay 0 — only the cluster-crossing
    rule catches it."""
    out = _audit(
        spark,
        [
            (1, "put", 1, 10, 40, 10),
            (1, "put", 2, 20, 30, 11),  # returns before get(1) starts
            (1, "get", 1, 35, 50, 12),
            (1, "get", 2, 60, 70, 13),
        ],
    )
    v = out[1]
    assert v["n_cycle"] >= 1 and not v["linearizable"]
    assert v["n_stale"] == 0 and v["n_reorder"] == 0
    assert v["n_future"] == 0 and v["n_unknown"] == 0


def test_linearizability_flags_interlocked_write_pair(spark):
    """Second witness (fuzz case): each write returns before the OTHER
    write's read begins — the two clusters cross with no stale/reorder
    signature."""
    out = _audit(
        spark,
        [
            (1, "put", 10, 5, 9, 10),
            (1, "get", 10, 7, 13, 11),
            (1, "put", 11, 4, 6, 12),  # ends before get(10) starts
            (1, "get", 11, 10, 16, 13),  # starts after put(10) ends
        ],
    )
    v = out[1]
    assert v["n_cycle"] >= 1 and not v["linearizable"]
    assert v["n_stale"] == 0 and v["n_reorder"] == 0


def test_linearizability_matches_bruteforce_on_random_histories(spark):
    """Differential gate: the audit's verdict must equal a brute-force
    all-linearizations search on seeded random histories (unique write
    values, ops <= 5 per key so the factorial search stays trivial).
    This is the completeness/soundness certificate for the rule set."""
    import itertools
    import random

    def brute(ops):
        n = len(ops)
        for perm in itertools.permutations(range(n)):
            pos = {p: i for i, p in enumerate(perm)}
            if any(
                ops[a][3] < ops[b][2] and pos[a] > pos[b]
                for a in range(n)
                for b in range(n)
                if a != b
            ):
                continue
            cur = -1
            good = True
            for idx in perm:
                k, v, inv, ret = ops[idx]
                if k == "put":
                    cur = v
                elif v != cur:
                    good = False
                    break
            if good:
                return True
        return False

    rng = random.Random(20260814)
    cases = []
    for _ in range(120):
        n = rng.randint(2, 5)
        ops, wvals = [], []
        for _ in range(n):
            inv = rng.randint(0, 12)
            ret = inv + rng.randint(1, 6)
            if rng.random() < 0.5 or not wvals:
                v = len(wvals) + 10
                wvals.append(v)
                ops.append(("put", v, inv, ret))
            else:
                ops.append(("get", rng.choice(wvals + [-1]), inv, ret))
        cases.append(ops)

    rows = [
        (k, kind, val, inv, ret, i)
        for k, ops in enumerate(cases)
        for i, (kind, val, inv, ret) in enumerate(ops)
    ]
    from mapreduceimplementation_spark.plans.kv import linearizability_audit

    df = spark.createDataFrame(
        rows, "key long, kind string, val long, inv long, ret long, opid long"
    )
    got = {r["key"]: r["linearizable"] for r in linearizability_audit(df).collect()}
    bad = [
        (k, brute(ops), got[k]) for k, ops in enumerate(cases) if brute(ops) != got[k]
    ]
    assert not bad, f"audit disagrees with brute force: {bad[:5]}"


def test_linearizability_registered_query_mix(spark, sf_dir):
    """The derived-history query must emit a genuine mix of verdicts (the
    1/17 second-latest injection) and zero future/unknown flags (the
    derivation can't produce those classes)."""
    import pandas as pd

    out = eng.QUERIES["kv_linearizability_audit"](spark, sf_dir).toPandas()
    assert (out["n_future"] == 0).all() and (out["n_unknown"] == 0).all()
    assert out["linearizable"].any() and (~out["linearizable"]).any()
    assert (
        out["linearizable"]
        == (
            out[
                ["n_unknown", "n_future", "n_stale", "n_reorder", "n_cycle"]
            ].sum(axis=1)
            == 0
        )
    ).all()


# ---------------------------------------------------------------------------
# B59 lock_grant_audit: serial lock-service spec replay on observed grants


def _lock_audit(spark, rows):
    """rows: (lock, op, granted, ts, opid) -> {lock: row} of verdicts."""
    from mapreduceimplementation_spark.plans.kv import audit_lock_grants

    df = spark.createDataFrame(
        rows, "lock string, op string, granted boolean, ts long, opid long"
    )
    return {r["lock"]: r.asDict() for r in audit_lock_grants(df).collect()}


def test_lock_audit_clean_serial_history(spark):
    # grant/deny bits exactly as one serial server would answer:
    # Lock granted on free, denied on held; Unlock granted on held,
    # denied on free; first op sees a free lock.
    out = _lock_audit(
        spark,
        [
            ("a", "lock", True, 0, 1),
            ("a", "lock", False, 10, 2),  # already held -> denied
            ("a", "unlock", True, 20, 3),
            ("a", "unlock", False, 30, 4),  # already free -> denied
            ("a", "lock", True, 40, 5),
        ],
    )
    v = out["a"]
    assert v["verdict"] == "ok" and v["n_violations"] == 0
    assert v["n_ops"] == 5 and v["n_lock_ops"] == 3 and v["n_granted"] == 3


def test_lock_audit_denied_attempt_still_transitions_state(spark):
    # After a DENIED Lock the lock is held (the denial proves it was);
    # a following Unlock must therefore be granted by the spec.
    out = _lock_audit(
        spark,
        [
            ("a", "lock", True, 0, 1),
            ("a", "lock", False, 10, 2),
            ("a", "unlock", True, 20, 3),  # held (per the denial) -> grant
        ],
    )
    assert out["a"]["verdict"] == "ok"


def test_lock_audit_flags_failover_lost_state(spark):
    # The classic primary/backup bug: state lost at failover, so a Lock
    # on a held lock is wrongly granted. Per-lock isolation: lock "b"
    # with a clean history stays green.
    out = _lock_audit(
        spark,
        [
            ("a", "lock", True, 0, 1),
            ("a", "lock", True, 10, 2),  # spec says deny (held) -> flagged
            ("a", "unlock", True, 20, 3),
            ("b", "lock", True, 0, 4),
            ("b", "unlock", True, 10, 5),
        ],
    )
    assert out["a"]["verdict"] == "VIOLATION" and out["a"]["n_violations"] == 1
    assert out["b"]["verdict"] == "ok" and out["b"]["n_violations"] == 0


def test_lock_audit_registered_query_mix(spark, sf_dir):
    """The derived-history query injects a 1/29 fault: both verdicts must
    occur, and n_violations must equal the observed-vs-spec diff exactly
    (every flagged row is a true fault by construction)."""
    out = eng.QUERIES["lock_grant_audit"](spark, sf_dir).toPandas()
    assert (out["verdict"] == "VIOLATION").any()
    assert (out["verdict"] == "ok").any()
    assert ((out["n_violations"] > 0) == (out["verdict"] == "VIOLATION")).all()
    assert (out["n_lock_ops"] <= out["n_ops"]).all()


# ---------------------------------------------------------------------------
# B60 view_change_audit: viewservice succession rules on a view-change log


def _view_audit(spark, rows):
    """rows: (viewnum, primary, backup, acked) -> {viewnum: row}."""
    from mapreduceimplementation_spark.plans.kv import audit_view_log

    df = spark.createDataFrame(
        rows, "viewnum long, primary string, backup string, acked boolean"
    )
    return {r["viewnum"]: r.asDict() for r in audit_view_log(df).collect()}


def test_view_audit_clean_successions(spark):
    # v1 vacuous; v2 promotes v1's backup (crash failover); v3 keeps the
    # primary and swaps the backup — both legal.
    out = _view_audit(
        spark,
        [
            (1, "s1", "s2", True),
            (2, "s2", "s3", True),
            (3, "s2", "s4", True),
        ],
    )
    assert all(v["verdict"] == "ok" for v in out.values())


def test_view_audit_flags_bad_succession(spark):
    # v2's primary came from nowhere: state cannot have flowed to it.
    out = _view_audit(
        spark,
        [
            (1, "s1", "s2", True),
            (2, "s9", "s1", True),
        ],
    )
    assert out[2]["verdict"] == "BAD_SUCCESSION" and not out[2]["ok_succession"]
    assert out[1]["verdict"] == "ok"


def test_view_audit_flags_unacked_supersession(spark):
    # v2 was never acked by its primary, so moving to v3 is illegal —
    # even though v3's succession (promote v2's backup) is fine.
    out = _view_audit(
        spark,
        [
            (1, "s1", "s2", True),
            (2, "s2", "s3", False),
            (3, "s3", "s1", True),
        ],
    )
    assert out[3]["verdict"] == "UNACKED_CHANGE"
    assert out[3]["ok_succession"] and not out[3]["ok_ack"]
    # succession beats ack in verdict naming when both fail
    out2 = _view_audit(
        spark,
        [
            (1, "s1", "s2", False),
            (2, "s9", "s1", True),
        ],
    )
    assert out2[2]["verdict"] == "BAD_SUCCESSION"


def test_view_audit_registered_query_mix(spark, sf_dir):
    """Derived log: both fault classes genuinely occur and 'ok' dominates."""
    out = eng.QUERIES["view_change_audit"](spark, sf_dir).toPandas()
    counts = out["verdict"].value_counts()
    assert counts.get("BAD_SUCCESSION", 0) > 0
    assert counts.get("UNACKED_CHANGE", 0) > 0
    assert counts.get("ok", 0) > counts.drop("ok").sum()


# ---------------------------------------------------------------------------
# B62 kv_append_linearizability — concatenation-valued registers


def _ap_audit(spark, rows):
    """rows: (key, kind, val_str, inv, ret, opid) -> {key: verdict row}."""
    from mapreduceimplementation_spark.plans.kv import (
        append_linearizability_audit,
    )

    df = spark.createDataFrame(
        rows, "key long, kind string, val string, inv long, ret long, opid long"
    )
    return {
        r["key"]: r.asDict()
        for r in append_linearizability_audit(df).collect()
    }


def test_append_lin_clean_history(spark):
    out = _ap_audit(
        spark,
        [
            (1, "put", "10", 0, 5, 10),
            (1, "append", "11", 10, 15, 11),
            (1, "get", "10|11", 20, 25, 12),
            (1, "get", "10", 2, 30, 13),  # overlaps everything: legal
        ],
    )
    v = out[1]
    assert v["linearizable"]
    assert v["n_ops"] == 4 and v["n_puts"] == 1 and v["n_appends"] == 1


def test_append_lin_flags_order_conflict(spark):
    """Two reads observing OPPOSITE append orders can never both hold —
    observed prefixes must form one chain per epoch."""
    out = _ap_audit(
        spark,
        [
            (1, "put", "10", 0, 2, 10),
            (1, "append", "11", 4, 6, 11),
            (1, "append", "12", 4, 7, 12),
            (1, "get", "10|11|12", 10, 12, 13),
            (1, "get", "10|12|11", 10, 13, 14),
        ],
    )
    v = out[1]
    assert v["n_conflict"] > 0 and not v["linearizable"]


def test_append_lin_flags_unobserved_append_before_initial_read(spark):
    """A free (unobserved) append that truly precedes a read of the
    initial state cannot be erased (no put exists) — the free block
    crosses the pinned-first initial epoch."""
    out = _ap_audit(
        spark,
        [
            (1, "append", "11", 0, 5, 11),
            (1, "get", "-1", 10, 15, 12),
        ],
    )
    v = out[1]
    assert v["n_cross"] >= 1 and not v["linearizable"]
    assert v["n_unknown"] == 0 and v["n_conflict"] == 0


def test_append_lin_free_append_erased_by_put_is_legal(spark):
    """The same free append IS legal when a later put resets the state
    before the read — free blocks slot between epoch blocks."""
    out = _ap_audit(
        spark,
        [
            (1, "append", "11", 0, 5, 11),
            (1, "put", "12", 6, 8, 12),
            (1, "get", "12", 10, 15, 13),
        ],
    )
    assert out[1]["linearizable"]


def test_append_lin_flags_chain_inversion(spark):
    """A read of the pre-append state AFTER another read already
    observed the append (and both follow the append in real time):
    the epoch's fixed prefix order is contradicted by time."""
    out = _ap_audit(
        spark,
        [
            (1, "put", "10", 0, 2, 10),
            (1, "append", "11", 4, 6, 11),
            (1, "get", "10|11", 7, 8, 12),
            (1, "get", "10", 10, 12, 13),
        ],
    )
    v = out[1]
    assert v["n_chain"] >= 1 and not v["linearizable"]


def test_append_lin_flags_unknown_tokens(spark):
    out = _ap_audit(
        spark,
        [
            (1, "put", "10", 0, 2, 10),
            (1, "get", "77", 5, 8, 11),        # no such put
            (1, "get", "10|88", 9, 12, 12),    # no such append
        ],
    )
    v = out[1]
    assert v["n_unknown"] == 2 and not v["linearizable"]


def _brute_append_linearizable(ops):
    """Brute-force all-linearizations KvModel search (kv.go:40 Step:
    Get == state, Put replaces, Append concatenates), memoized on
    (remaining ops, state).  ops: (kind, val, inv, ret); mutation val is
    its own token, get val the observed state string."""
    n = len(ops)
    memo = {}

    def rec(remaining, state):
        if not remaining:
            return True
        key = (remaining, state)
        if key in memo:
            return memo[key]
        ok = False
        for i in remaining:
            # i may linearize next iff nothing remaining truly precedes it
            if any(j != i and ops[j][3] < ops[i][2] for j in remaining):
                continue
            kind, val = ops[i][0], ops[i][1]
            if kind == "put":
                ns = (val,)
            elif kind == "append":
                ns = state + (val,)
            else:
                if "|".join(state) != val:
                    continue
                ns = state
            if rec(remaining - {i}, ns):
                ok = True
                break
        memo[key] = ok
        return ok

    return rec(frozenset(range(n)), ("-1",))


def test_append_lin_matches_bruteforce_on_random_histories(spark):
    """Differential gate for the Put/Append/Get rule set: verdicts must
    equal the brute-force KvModel search on seeded random histories.
    Reads take their values from a random (real-time-IGNORING)
    serialization and are then corrupted (drop-last / swap / unknown),
    so both verdicts and every rule class occur; brute force is the
    ground truth."""
    import random

    rng = random.Random(20260814)
    cases = []
    for ci in range(140):
        n = rng.randint(3, 8)
        ops = []
        mid = ci * 1000 + 10
        for i in range(n):
            inv = rng.randint(0, 14)
            ret = inv + rng.randint(1, 7)
            r = rng.random()
            kind = "put" if r < 0.3 else ("append" if r < 0.6 else "get")
            if kind == "get":
                ops.append([kind, None, inv, ret, ci * 1000 + 500 + i])
            else:
                ops.append([kind, str(mid), inv, ret, mid])
                mid += 1
        order = list(range(n))
        rng.shuffle(order)
        state, seen = ("-1",), {}
        for idx in order:
            kind, v = ops[idx][0], ops[idx][1]
            if kind == "put":
                state = (v,)
            elif kind == "append":
                state = state + (v,)
            else:
                seen[idx] = "|".join(state)
        for i, o in enumerate(ops):
            if o[0] != "get":
                continue
            toks = seen[i].split("|")
            r = rng.random()
            if r < 0.18 and len(toks) >= 2:
                toks = toks[:-1]
            elif r < 0.30 and len(toks) >= 3:
                toks[-1], toks[-2] = toks[-2], toks[-1]
            elif r < 0.36:
                toks = ["999999"]
            o[1] = "|".join(toks)
        cases.append(ops)

    rows = [
        (ci, kind, val, inv, ret, opid)
        for ci, ops in enumerate(cases)
        for (kind, val, inv, ret, opid) in ops
    ]
    from mapreduceimplementation_spark.plans.kv import (
        append_linearizability_audit,
    )

    df = spark.createDataFrame(
        rows, "key long, kind string, val string, inv long, ret long, opid long"
    )
    got = {
        r["key"]: r["linearizable"]
        for r in append_linearizability_audit(df).collect()
    }
    bad = []
    for ci, ops in enumerate(cases):
        want = _brute_append_linearizable(
            [tuple(o[:4]) for o in ops]
        )
        if want != got[ci]:
            bad.append((ci, want, got[ci], ops))
    assert not bad, f"append audit disagrees with brute force: {bad[:3]}"


def test_append_lin_registered_query_mix(spark, sf_dir):
    """The derived-history query must emit a genuine verdict mix and
    zero unknown/future flags (the derivation cannot produce those)."""
    out = eng.QUERIES["kv_append_linearizability"](spark, sf_dir).toPandas()
    assert (out["n_unknown"] == 0).all() and (out["n_future"] == 0).all()
    assert out["linearizable"].any() and (~out["linearizable"]).any()
    flagsum = out[
        ["n_unknown", "n_conflict", "n_future", "n_chain", "n_cross"]
    ].sum(axis=1)
    assert (out["linearizable"] == (flagsum == 0)).all()


# ---------------------------------------------------------------------------
# B63/B64 raft safety-property trace audits


def test_election_audit_flags_double_vote_majorities(spark):
    """Two leaders in one term require a double-voter: voters 0/1/2 grant
    candidate A, voters 2/3/4 grant candidate B — voter 2 granted both,
    and both candidates reach the 3-of-5 majority (the checkOneLeader
    fatal, config.go:432)."""
    from mapreduceimplementation_spark.plans.kv import audit_election_votes

    rows = [(7, v, "A", True) for v in (0, 1, 2)] + [
        (7, v, "B", True) for v in (2, 3, 4)
    ]
    df = spark.createDataFrame(
        rows, "term long, voter long, candidate string, granted boolean"
    )
    out = {r["term"]: r.asDict() for r in audit_election_votes(df).collect()}
    v = out[7]
    assert v["n_leaders"] == 2 and not v["election_safe"]
    assert v["n_double_voters"] == 1


def test_election_audit_clean_and_denied_votes(spark):
    """A denied vote grants nothing: candidate B's third 'vote' is
    denied, so only A leads and the term is safe; RPC retries
    (duplicate grants) count once."""
    from mapreduceimplementation_spark.plans.kv import audit_election_votes

    rows = (
        [(1, v, "A", True) for v in (0, 1, 2)]
        + [(1, 0, "A", True)]            # retry duplicate
        + [(1, v, "B", True) for v in (3, 4)]
        + [(1, 2, "B", False)]           # denied: no double-vote, no majority
    )
    df = spark.createDataFrame(
        rows, "term long, voter long, candidate string, granted boolean"
    )
    v = audit_election_votes(df).collect()[0].asDict()
    assert v["n_leaders"] == 1 and v["election_safe"]
    assert v["n_double_voters"] == 0 and v["n_voters"] == 5


def test_election_registered_query_mix(spark, sf_dir):
    out = eng.QUERIES["raft_election_safety"](spark, sf_dir).toPandas()
    assert out["election_safe"].any() and (~out["election_safe"]).any()
    assert (out["election_safe"] == (out["n_leaders"] <= 1)).all()


def test_apply_log_audit_flags_divergence_and_gaps(spark):
    """checkLogs semantics (config.go:140): index 2 committed with two
    different values -> conflict; server 1 applies index 4 without ever
    applying 3 -> out-of-order; replays are benign."""
    from mapreduceimplementation_spark.plans.kv import audit_apply_log

    rows = [
        (0, 1, 100), (0, 2, 200), (0, 3, 300),
        (1, 1, 100), (1, 2, 201),            # divergent value at idx 2
        (1, 4, 400),                          # idx 3 never applied: gap
        (0, 1, 100),                          # replay, benign
    ]
    df = spark.createDataFrame(rows, "server long, idx long, value long")
    out = {r["idx"]: r.asDict() for r in audit_apply_log(df).collect()}
    assert out[1]["matching_ok"] and out[1]["n_servers"] == 2
    assert out[2]["value_conflict"] and not out[2]["matching_ok"]
    assert out[4]["n_missing_prev"] == 1 and not out[4]["matching_ok"]
    assert out[3]["matching_ok"]


def test_apply_log_registered_query_mix(spark, sf_dir):
    out = eng.QUERIES["raft_log_matching"](spark, sf_dir).toPandas()
    assert out["matching_ok"].any() and (~out["matching_ok"]).any()
    assert out["value_conflict"].any()
    assert (
        out["matching_ok"]
        == ((out["n_values"] <= 1) & (out["n_missing_prev"] == 0))
    ).all()


def test_leader_completeness_audit_hand_trace(spark):
    """Raft §5.4.3: entry 1 committed in term 0; term 2's leader missing
    it -> violation.  Entry 2 committed in term 1, present in every
    later-term observation -> complete.  Observations at or before the
    commit term are out of audit scope; probe retries are benign."""
    from mapreduceimplementation_spark.plans.kv import (
        audit_leader_completeness,
    )

    obs = spark.createDataFrame(
        [
            (0, 1, True),   # commit-term observation: out of scope
            (1, 1, True),
            (2, 1, False),  # later-term leader lost a committed entry
            (2, 1, False),  # probe retry, benign
            (1, 2, True),
            (2, 2, True),
            (2, 9, False),  # idx 9 never committed: out of scope
        ],
        "term long, idx long, present boolean",
    )
    commits = spark.createDataFrame(
        [(1, 0), (2, 1)], "idx long, commit_term long"
    )
    out = {
        r["idx"]: r.asDict()
        for r in audit_leader_completeness(obs, commits).collect()
    }
    assert set(out) == {1, 2}
    assert not out[1]["leader_complete"]
    assert out[1]["n_missing"] == 1 and out[1]["n_later_terms"] == 2
    assert out[2]["leader_complete"] and out[2]["n_missing"] == 0


def test_leader_completeness_registered_query_mix(spark, sf_dir):
    """The derived trace must exercise both verdicts, commit terms must
    precede every audited observation term, and the commit schedule must
    assign each committed idx exactly one term."""
    from mapreduceimplementation_spark.plans.kv import derive_raft_commits

    out = eng.QUERIES["raft_leader_completeness"](spark, sf_dir).toPandas()
    assert out["leader_complete"].any() and (~out["leader_complete"]).any()
    assert (out["n_missing"] <= out["n_later_terms"]).all()
    assert (
        out["leader_complete"] == (out["n_missing"] == 0)
    ).all()
    cmt = derive_raft_commits(spark).toPandas()
    assert cmt["idx"].is_unique
    assert len(out) <= len(cmt)


# ---------------------------------------------------------------------------
# B68 raft_snapshot_audit


def test_snapshot_audit_injection_mix_and_compact_invariant(spark, sf_dir):
    """Verdicts match the per-(key, follower) hash cells exactly; corrupt
    reports carry the junk suffix; and follower 1's snapshot (cutoff
    n*2 div 4 == n div 2) must equal B16's compaction snapshot_value for
    every clean report — two independent operators, one state."""
    from mapreduceimplementation_spark.functions.hashing import py_hash64
    from mapreduceimplementation_spark.plans.kv import _SNAP_FAULT_EVERY

    out = eng.QUERIES["raft_snapshot_audit"](spark, sf_dir).collect()
    assert {r["verdict"] for r in out} == {"ok", "state_mismatch"}
    for r in out:
        inj = py_hash64(f"snap-{r['key']}-{r['follower']}") % _SNAP_FAULT_EVERY == 0
        assert (r["verdict"] == "state_mismatch") == inj
        assert r["reported_value"].endswith(";666") == inj or (
            inj and r["reported_value"] == ";666"
        )
    compact = {
        r["key"]: r["snapshot_value"]
        for r in eng.QUERIES["kv_log_compact"](spark, sf_dir).collect()
    }
    f1 = [r for r in out if r["follower"] == 1 and r["verdict"] == "ok"]
    assert f1
    for r in f1:
        assert r["reported_value"] == compact[r["key"]]


# ---------------------------------------------------------------------------
# B70: kv_client_dedup — at-most-once duplicate-request audit


def _dedup_replay(rows):
    """Pure-Python twin of kv_client_dedup's semantics: rows are
    (user_id, event_id, event_type, value) in (ts, event_id) order per
    user.  Returns {user_id: (value, n_attempts, n_applied, n_dups,
    n_conflicts)}."""
    from collections import defaultdict

    from mapreduceimplementation_spark.functions.hashing import py_hash64

    by_user = defaultdict(list)
    for uid, eid, etype, val in rows:
        by_user[uid].append((eid, etype, val))
    out = {}
    for uid, evs in by_user.items():
        applied, n_dups, n_conf = [], 0, 0
        prev_retry, prev_op = None, None
        for i, (eid, etype, val) in enumerate(evs, start=1):
            op = "put" if etype == "signup" else "append"
            sval = str(int(round(val * 100)))
            retry = i > 1 and py_hash64(f"retry-{eid}") % 4 == 0
            is_dup = retry and prev_retry is False
            if is_dup:
                n_dups += 1
                if op != prev_op:
                    n_conf += 1
            else:
                applied.append((i, op, sval))
            prev_retry, prev_op = retry, op
        last_put = max((a for a, op, _ in applied if op == "put"), default=0)
        value = ";".join(s for a, _, s in applied if a >= last_put)
        out[uid] = (value, len(evs), len(applied), n_dups, n_conf)
    return out


def test_client_dedup_matches_hand_replay(spark, tmp_path):
    """Differential: the one-exchange window-chain audit must equal a
    sequential per-client replay (the shape a real kvraft server runs:
    one lastSeq per client, first attempt wins)."""
    import datetime as dt

    import mapreduceimplementation_spark as eng

    base = dt.datetime(2024, 1, 1)
    rows = []
    # 6 clients x 40 attempts: plenty of hash-flagged retries of both
    # matching and divergent ops
    for uid in range(6):
        for i in range(40):
            eid = uid * 1000 + i
            etype = ["signup", "click", "view", "purchase", "error"][
                (uid + i) % 5
            ]
            rows.append(
                (
                    eid,
                    base + dt.timedelta(minutes=i, seconds=uid),
                    uid,
                    etype,
                    (eid % 37) / 4.0,  # exact in binary: *100 is exact
                    "{}",
                )
            )
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    d = str(tmp_path / "dedup_events")
    df.write.parquet(d + "/events.parquet")
    got = {
        r["key"]: (
            r["value"],
            r["n_attempts"],
            r["n_applied"],
            r["n_dups"],
            r["n_conflicts"],
        )
        for r in eng.QUERIES["kv_client_dedup"](spark, d).collect()
    }
    want = _dedup_replay(
        [(uid, eid, etype, val) for eid, ts, uid, etype, val, _ in rows]
    )
    assert got == want
    # the injection must actually fire, both ways
    assert sum(v[3] for v in want.values()) > 0
    assert sum(v[4] for v in want.values()) > 0


def test_client_dedup_counts_consistent(spark, sf_dir):
    """On the registered corpus: attempts = applied + dups per client,
    conflicts <= dups, and duplicates exist (hash-cell injection is
    scale-stable, so this holds at every SF)."""
    import mapreduceimplementation_spark as eng

    rows = eng.QUERIES["kv_client_dedup"](spark, sf_dir).collect()
    assert rows
    assert all(r["n_attempts"] == r["n_applied"] + r["n_dups"] for r in rows)
    assert all(r["n_conflicts"] <= r["n_dups"] for r in rows)
    assert sum(r["n_dups"] for r in rows) > 0


# ---------------------------------------------------------------------------
# B78 shardkv_gc_audit


def test_shard_gc_audit_hand_trace(spark):
    """B78: a hand config history with one handoff whose source keeps
    reporting (violation), one clean handoff, a RE-ACQUISITION (the old
    owner reports while owning again — NOT a violation), and retry
    duplicates (benign)."""
    from mapreduceimplementation_spark.plans.kv import audit_shard_gc

    # shard 0: g1 -> g2 at num 2 (g1 leaks at 2 and 3); shard 1: g1 -> g2
    # at num 2, clean; shard 2: g1 -> g2 at num 2 then BACK at num 3 — g1
    # reporting at 3 is ownership, not a leak.
    cfg = spark.createDataFrame(
        [
            (1, 0, 1), (1, 1, 1), (1, 2, 1),
            (2, 0, 2), (2, 1, 2), (2, 2, 2),
            (3, 0, 2), (3, 1, 2), (3, 2, 1),
        ],
        "num long, shard long, gid long",
    )
    diff = spark.createDataFrame(
        [(2, 0, 1, 2), (2, 1, 1, 2), (2, 2, 1, 2), (3, 2, 2, 1)],
        "num long, shard long, from_gid long, to_gid long",
    )
    reports = spark.createDataFrame(
        # owners (compliant)
        [(1, 1, 0), (1, 1, 1), (1, 1, 2),
         (2, 2, 0), (2, 2, 1), (2, 2, 2),
         (3, 2, 0), (3, 2, 1), (3, 1, 2),
         # g1 leaks shard 0 at configs 2 and 3 (+ a retry duplicate)
         (2, 1, 0), (3, 1, 0), (3, 1, 0)],
        "num long, gid long, shard long",
    )
    out = {
        (r["num"], r["shard"], r["from_gid"]): (r["n_leak_cfgs"], r["gc_clean"])
        for r in audit_shard_gc(reports, cfg, diff).collect()
    }
    assert out[(2, 0, 1)] == (2, False)   # leaked at num 2 and 3, dup ignored
    assert out[(2, 1, 1)] == (0, True)    # clean handoff
    assert out[(2, 2, 1)] == (0, True)    # re-acquired at 3: not a leak
    assert out[(3, 2, 2)] == (0, True)    # g2's handoff back is clean


def test_shard_gc_registered_query_mix(spark, sf_dir):
    """B78 registered query: the injected leak cells make both verdicts
    occur, every handoff appears exactly once, and dirty handoffs leak
    for at most the injection horizon."""
    from mapreduceimplementation_spark.plans.kv import _GC_LEAK_SPAN

    rows = eng.QUERIES["shardkv_gc_audit"](spark, sf_dir).collect()
    keys = [(r["num"], r["shard"]) for r in rows]
    assert len(keys) == len(set(keys))
    verdicts = {r["gc_clean"] for r in rows}
    assert verdicts == {True, False}, verdicts
    for r in rows:
        assert 0 <= r["n_leak_cfgs"] <= _GC_LEAK_SPAN


# ---------------------------------------------------------------------------
# B79 raft_persistence_audit


def test_raft_persistence_audit_hand_trace(spark):
    """B79: a hand trace with (a) a clean peer whose term only grows,
    whose vote is stable, and whose one log overwrite is contiguous;
    (b) a term-regressing restart; (c) a re-vote within one term; (d) a
    resurrected overwritten entry (Figure 8's forbidden history); and a
    legitimate overwrite that must NOT count as resurrection."""
    from mapreduceimplementation_spark.plans.kv import audit_raft_persistence

    rows = [
        # peer 0 (clean): terms 1,2 across epochs 0,1; vote stable;
        # entry at idx 0 overwritten a->b contiguously (a: e0, b: e1)
        (0, 0, 1, 3, 0, 100), (0, 1, 2, 3, 0, 101), (0, 1, 2, 3, 1, 200),
        # peer 1: term REGRESSES across restart (epoch 0 max=5, epoch 1 min=4)
        (1, 0, 5, 2, 0, 300), (1, 1, 4, 2, 0, 300),
        # peer 2: re-votes in term 7 (voted 1 then 3)
        (2, 0, 7, 1, 0, 400), (2, 1, 7, 3, 0, 400),
        # peer 3: resurrection at idx 5 (id 500 at e0, 501 at e1, 500 at e2)
        (3, 0, 1, 0, 5, 500), (3, 1, 2, 0, 5, 501), (3, 2, 3, 0, 5, 500),
    ]
    trace = spark.createDataFrame(
        rows,
        "peer long, epoch long, term long, voted_for long,"
        " idx long, entry_id long",
    )
    out = {r["peer"]: r for r in audit_raft_persistence(trace).collect()}
    assert out[0]["persist_ok"] and out[0]["n_term_regressions"] == 0
    assert out[0]["n_revote_terms"] == 0 and out[0]["n_resurrect_indexes"] == 0
    assert out[1]["n_term_regressions"] == 1 and not out[1]["persist_ok"]
    assert out[2]["n_revote_terms"] == 1 and not out[2]["persist_ok"]
    assert out[3]["n_resurrect_indexes"] == 1 and not out[3]["persist_ok"]
    # the clean overwrite on peer 0 did not read as a resurrection
    assert out[0]["n_resurrect_indexes"] == 0


def test_raft_persistence_registered_query_mix(spark, sf_dir):
    """B79 registered query: faulty-peer gating yields BOTH verdicts, all
    three violation classes occur somewhere, and every peer reports all
    epochs (the derivation covers the grid)."""
    rows = eng.QUERIES["raft_persistence_audit"](spark, sf_dir).collect()
    assert {r["persist_ok"] for r in rows} == {True, False}
    assert sum(r["n_term_regressions"] for r in rows) > 0
    assert sum(r["n_revote_terms"] for r in rows) > 0
    assert sum(r["n_resurrect_indexes"] for r in rows) > 0
    for r in rows:
        if r["persist_ok"]:
            assert (
                r["n_term_regressions"]
                == r["n_revote_terms"]
                == r["n_resurrect_indexes"]
                == 0
            )


# ---------------------------------------------------------------------------
# B80 shardkv_availability_audit


def test_shard_availability_audit_hand_trace(spark):
    """B80: a hand trace with (a) an unaffected shard serving straight
    through (ok), (b) an unaffected shard that stalls (Challenge2Unaffected
    violation), (c) a moved shard served exactly from its install on (ok —
    the PARTIAL-progress behavior), (d) a moved shard answered before its
    install (premature), (e) a moved shard that never serves after the
    install (blocked)."""
    from mapreduceimplementation_spark.plans.kv import audit_shard_availability

    # configs 1 and 2; shards 0 (unmoved ok), 1 (unmoved stall),
    # 2 (moved ok), 3 (moved premature), 4 (moved blocked)
    cfg = spark.createDataFrame(
        [(1, s, 1) for s in range(5)]
        + [(2, 0, 1), (2, 1, 1), (2, 2, 2), (2, 3, 2), (2, 4, 2)],
        "num long, shard long, gid long",
    )
    installs = spark.createDataFrame(
        [(2, 2, 100), (2, 3, 100), (2, 4, 100)],
        "num long, shard long, install_t long",
    )
    ops = spark.createDataFrame(
        [
            (2, 0, 10, True), (2, 0, 500, True),           # unaffected ok
            (2, 1, 10, False), (2, 1, 500, True),          # stall at t=10
            (2, 2, 50, False), (2, 2, 100, True), (2, 2, 900, True),  # partial ok
            (2, 3, 50, True),                              # premature serve
            (2, 4, 100, False), (2, 4, 900, False),        # blocked
        ],
        "num long, shard long, t long, served boolean",
    )
    out = {
        (r["num"], r["shard"]): r
        for r in audit_shard_availability(ops, cfg, installs).collect()
    }
    assert out[(2, 0)]["available_ok"] and not out[(2, 0)]["moved"]
    assert out[(2, 1)]["n_stalls"] == 1 and not out[(2, 1)]["available_ok"]
    r2 = out[(2, 2)]
    assert r2["moved"] and r2["available_ok"]
    assert r2["n_premature"] == 0 and r2["n_blocked"] == 0
    assert out[(2, 3)]["n_premature"] == 1 and not out[(2, 3)]["available_ok"]
    assert out[(2, 4)]["n_blocked"] == 2 and not out[(2, 4)]["available_ok"]


def test_shard_availability_registered_query_mix(spark, sf_dir):
    """B80 registered query: all three violation classes occur, both
    verdicts occur on both moved and unmoved cells, and violations stay
    in their lane (stalls only on unmoved, premature/blocked only on
    moved)."""
    rows = eng.QUERIES["shardkv_availability_audit"](spark, sf_dir).collect()
    assert sum(r["n_stalls"] for r in rows) > 0
    assert sum(r["n_premature"] for r in rows) > 0
    assert sum(r["n_blocked"] for r in rows) > 0
    for r in rows:
        if r["moved"]:
            assert r["n_stalls"] == 0
        else:
            assert r["n_premature"] == 0 and r["n_blocked"] == 0
    verdicts = {(r["moved"], r["available_ok"]) for r in rows}
    assert len(verdicts) == 4, verdicts


# ---------------------------------------------------------------------------
# B81 kv_session_guarantees


def test_session_guarantees_hand_trace(spark):
    """Hand trace pinning all four read classes on one key: a fresh read,
    a stale-but-legal read (session never saw newer), an RYW violation
    (session's own write skipped), and an MR violation (session read
    newer earlier).  trace columns: (session, key, ts, event_id,
    is_write, obs, wver)."""
    from datetime import datetime

    from mapreduceimplementation_spark.plans.kv import (
        audit_session_guarantees,
    )

    t = lambda s: datetime(2024, 1, 1, 0, 0, s)
    rows = [
        # key 7's write history: v1 by session A (id 1), v2 by B (id 2)
        (1, 7, t(1), 10, 1, 1, 1),   # A writes v1
        (2, 7, t(2), 20, 1, 2, 2),   # B writes v2
        (3, 7, t(3), 30, 0, 2, 2),   # C reads v2 -> fresh
        (3, 7, t(4), 31, 0, 1, 2),   # C reads v1 after v2 -> MR violation
        (1, 7, t(5), 12, 0, 0, 2),   # A reads v0, own write was v1 -> RYW
        (4, 7, t(6), 40, 0, 1, 2),   # D reads v1, no prior session sight -> legal stale
    ]
    trace = spark.createDataFrame(
        rows,
        "session long, key long, ts timestamp, event_id long, "
        "is_write int, obs long, wver long",
    )
    out = {r["opid"]: r for r in audit_session_guarantees(trace).collect()}
    assert set(out) == {30, 31, 12, 40}
    assert out[30]["ryw_ok"] and out[30]["mr_ok"] and not out[30]["is_stale"]
    assert out[31]["ryw_ok"] and not out[31]["mr_ok"]  # read_floor 2 > obs 1
    assert out[31]["read_floor"] == 2
    assert not out[12]["ryw_ok"] and out[12]["own_write_floor"] == 1
    assert out[12]["mr_ok"]  # A never read before
    assert out[40]["ryw_ok"] and out[40]["mr_ok"] and out[40]["is_stale"]


def test_session_guarantees_multi_key_session(spark):
    """ADVICE r7 regression pin: the floor windows partition by
    (session, key), so a session touching MULTIPLE keys never compares
    a read on key A against a floor established on key B.  Session 1
    writes v5 on key 1 (high per-key version), then reads key 2 at its
    true latest v1 — under a session-only floor window the key-1 write
    floor (5) would bleed into key 2 and flag a bogus RYW violation."""
    from datetime import datetime

    from mapreduceimplementation_spark.plans.kv import (
        audit_session_guarantees,
    )

    t = lambda s: datetime(2024, 1, 1, 0, 0, s)
    rows = [
        (1, 1, t(1), 10, 1, 5, 5),   # S1 writes key1 -> key1 at v5
        (1, 2, t(2), 11, 0, 1, 1),   # S1 reads key2 latest v1: fresh
        (1, 1, t(3), 12, 0, 5, 5),   # S1 re-reads key1 v5: fresh
        (1, 2, t(4), 13, 0, 0, 1),   # S1 reads key2 v0 after seeing v1: MR
    ]
    trace = spark.createDataFrame(
        rows,
        "session long, key long, ts timestamp, event_id long, "
        "is_write int, obs long, wver long",
    )
    out = {r["opid"]: r for r in audit_session_guarantees(trace).collect()}
    assert set(out) == {11, 12, 13}
    # the key-2 read must NOT inherit key 1's write floor of 5
    assert out[11]["own_write_floor"] == 0 and out[11]["read_floor"] == 0
    assert out[11]["ryw_ok"] and out[11]["mr_ok"] and not out[11]["is_stale"]
    assert out[12]["ryw_ok"] and out[12]["own_write_floor"] == 5
    # true MR violation stays caught per-key: key2 floor is 1, obs 0
    assert out[13]["read_floor"] == 1 and not out[13]["mr_ok"]


def test_session_guarantees_registered_query_mix(spark):
    """B81 registered query: every read class occurs on the derived trace,
    violations imply staleness, and non-injected reads are never stale
    (the injection is the only staleness source).  Pinned to sf0.01: the
    legal-stale class (stale read in a session that never saw newer)
    needs multi-event sessions, which the ~600-event sf0.001 trace is
    too sparse to produce (measured: 0 legal-stale there, 107 at
    sf0.01)."""
    rows = eng.QUERIES["kv_session_guarantees"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    fresh = [r for r in rows if not r["is_stale"]]
    legal_stale = [r for r in rows if r["is_stale"] and r["ryw_ok"] and r["mr_ok"]]
    ryw = [r for r in rows if not r["ryw_ok"]]
    mr = [r for r in rows if not r["mr_ok"]]
    assert fresh and legal_stale and ryw and mr
    for r in rows:
        if not (r["ryw_ok"] and r["mr_ok"]):
            assert r["is_stale"]  # violations only via observed staleness
        assert r["obs_version"] <= r["latest_version"]
        assert r["own_write_floor"] <= r["latest_version"]
