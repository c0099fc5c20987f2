"""B85/B86 generic linearizability engine: brute-force differentials for
the token-lock AND config-epoch models, RegisterModel-vs-B51 pinning,
rule-isolating hand traces, chain-router path parity (r9), the registered
queries' verdict mixes, and the oracle-closure cost budget pin."""

from __future__ import annotations

import itertools
import random

import mapreduceimplementation_spark as eng
from mapreduceimplementation_spark.plans.linz import (
    LockTokenModel,
    RegisterModel,
    audit_linearizability,
    derive_lock_token_history,
)

eng.load_all_operators()

_HIST_SCHEMA = (
    "key long, opid long, inv long, ret long, obs string, prod string"
)


def _brute(ops, init):
    """All-linearizations search for ANY unique-value observation model:
    schedule order must respect real time (a returns before b invokes
    => a first), an op applies only when the current state equals its
    obs, and a producing op replaces the state.  Exponential — test
    sizes only (the porcupine-search ground truth); ``init`` is the
    model's initial-state literal."""
    n = len(ops)
    for perm in itertools.permutations(range(n)):
        pos = {p: i for i, p in enumerate(perm)}
        if any(
            ops[a][2] < ops[b][1] and pos[a] > pos[b]
            for a in range(n)
            for b in range(n)
            if a != b
        ):
            continue
        cur = init
        good = True
        for idx in perm:
            _, _, _, obs, prod = ops[idx]
            if obs != cur:
                good = False
                break
            if prod is not None:
                cur = prod
        if good:
            return True
    return False


def _brute_lock(ops):
    return _brute(ops, "F:-1")


def test_lock_model_matches_bruteforce_on_random_histories(spark):
    """Differential gate for the generic engine on the lock model:
    seeded random concurrent token-lock histories (ops <= 6), generated
    from a real-time-consistent ground linearization then corrupted
    with stale/junk token swaps (the derivation's fault classes); the
    engine's per-key verdict must equal the brute-force search on every
    case.  All cases run as ONE batched engine invocation (per-key
    decomposition)."""
    rng = random.Random(20260816)
    cases = []
    for _ in range(150):
        n = rng.randint(2, 6)
        iv = []
        for i in range(n):
            inv = rng.randint(0, 12)
            iv.append((i, inv, inv + rng.randint(1, 6)))
        # random real-time-consistent ground order
        remaining = list(iv)
        order = []
        while remaining:
            cands = [
                o
                for o in remaining
                if not any(p[2] < o[1] for p in remaining if p is not o)
            ]
            pick = rng.choice(cands)
            remaining.remove(pick)
            order.append(pick)
        # simulate the token machine along the ground order
        state = "F:-1"
        by_kind = {"F": ["-1"], "H": []}
        ops = {}
        for opid, inv, ret in order:
            kind = rng.choice(["lock", "unlock"])
            granted = (kind == "lock") == state.startswith("F")
            obs = state
            prod = None
            if granted:
                prod = ("H:" if kind == "lock" else "F:") + str(opid)
                by_kind[prod[0]].append(str(opid))
                state = prod
            ops[opid] = [opid, inv, ret, obs, prod]
        # corrupt: same-kind stale or junk token swaps
        if rng.random() < 0.6:
            for opid in rng.sample(sorted(ops), rng.randint(1, 2)):
                o = ops[opid]
                k = o[3][0]
                if rng.random() < 0.5 and len(by_kind[k]) > 1:
                    o[3] = k + ":" + rng.choice(by_kind[k])
                else:
                    o[3] = f"{k}:{-opid - 7}"
        cases.append([tuple(ops[i]) for i in sorted(ops)])

    rows = [
        (k, opid, inv, ret, obs, prod)
        for k, ops in enumerate(cases)
        for opid, inv, ret, obs, prod in ops
    ]
    df = spark.createDataFrame(rows, _HIST_SCHEMA)
    got = {
        r["key"]: r["linearizable"]
        for r in audit_linearizability(df, LockTokenModel).collect()
    }
    bad = [
        (k, _brute_lock(ops), got[k])
        for k, ops in enumerate(cases)
        if _brute_lock(ops) != got[k]
    ]
    assert not bad, f"engine disagrees with brute force: {bad[:5]}"


def test_register_model_matches_b51_audit(spark):
    """Genericity proof: the engine under RegisterModel must reproduce
    B51's per-key verdict exactly on the derived Get/Put history (B51's
    stale/reorder columns are named special cases of crossings — its
    own docstring notes unknown+future+cycle decides)."""
    from mapreduceimplementation_spark.plans.kv import (
        derive_kv_history,
        linearizability_audit,
    )

    hist = derive_kv_history(spark, "/root/testdata/sf0.001").localCheckpoint()
    b51 = {
        r["key"]: r["linearizable"]
        for r in linearizability_audit(hist).collect()
    }
    genr = {
        r["key"]: r["linearizable"]
        for r in audit_linearizability(hist, RegisterModel).collect()
    }
    assert genr == b51 and len(b51) > 0
    assert not all(b51.values()) and any(b51.values())  # real mix


def test_lock_engine_hand_traces(spark):
    """One key per rule class, each pinned:
    k0 clean sequential grant chain; k1 unknown (junk token); k2
    conflict (one free state consumed by two grants); k3 future (a
    denied op observes a state produced only later); k4 the 2-hop
    chain contradiction crossing-freedom alone cannot see (all blocks
    normal, yet a descendant returns before a forced ancestor
    invokes)."""
    rows = [
        # k0: lock A [0,1] -> unlock B [2,3] -> lock C [4,5]: clean
        (0, 1, 0, 1, "F:-1", "H:1"),
        (0, 2, 2, 3, "H:1", "F:2"),
        (0, 3, 4, 5, "F:2", "H:3"),
        # k1: granted lock observes a never-granted token
        (1, 1, 0, 1, "F:-99", "H:1"),
        # k2: two granted locks both consume the initial free state
        (2, 1, 0, 1, "F:-1", "H:1"),
        (2, 2, 2, 3, "F:-1", "H:2"),
        # k3: denied op observes H:9 before its producer even invokes
        (3, 1, 0, 1, "H:9", None),
        (3, 9, 100, 110, "F:-1", "H:9"),
        # k4: blind producer starts the chain (engine is model-agnostic)
        # A=[100,200] prod 'A'; B=[0,300] obs A prod B; C=[1,2] obs B:
        # C returns before A invokes yet must serialize after it
        (4, 1, 100, 200, None, "A"),
        (4, 2, 0, 300, "A", "B"),
        (4, 3, 1, 2, "B", "C"),
    ]
    df = spark.createDataFrame(rows, _HIST_SCHEMA)
    out = {
        r["key"]: r
        for r in audit_linearizability(df, LockTokenModel).collect()
    }
    assert out[0]["linearizable"] and out[0]["n_states"] == 4
    assert out[1]["n_unknown"] == 1 and not out[1]["linearizable"]
    assert out[2]["n_conflict"] == 1 and not out[2]["linearizable"]
    assert out[3]["n_future"] == 1 and not out[3]["linearizable"]
    k4 = out[4]
    assert k4["n_cross"] == 0  # every block is normal: cross is blind here
    assert k4["n_chain"] >= 1 and not k4["linearizable"]
    # and the brute force agrees with each verdict
    by_key = {}
    for k, opid, inv, ret, obs, prod in rows:
        by_key.setdefault(k, []).append((opid, inv, ret, obs, prod))
    for k, ops in by_key.items():
        if k == 4:
            continue  # blind producer: outside the lock machine's states
        assert _brute_lock(ops) == out[k]["linearizable"], k


def test_lock_engine_detects_consumption_cycle(spark):
    """Adversarial: consumption edges forming a cycle (A consumed to
    make B, B consumed to make A) are a logical contradiction the
    pointer-doubling cap converts into chain flags instead of looping
    forever."""
    rows = [
        (0, 1, 0, 10, "B", "A"),
        (0, 2, 0, 10, "A", "B"),
    ]
    df = spark.createDataFrame(rows, _HIST_SCHEMA)
    out = audit_linearizability(df, LockTokenModel).collect()[0]
    assert out["n_chain"] >= 1 and not out["linearizable"]


def test_chain_counts_blocks_once_under_dup_parents(spark):
    """r8 self-review pin: a state produced by TWO ops observing
    different parents carries two rows through the pointer-doubling
    loop; n_chain must still count the violating BLOCK once (the
    oracle's chainv groups by (key, val)), alongside the dup flag."""
    rows = [
        (0, 1, 0, 1, None, "A"),
        (0, 2, 2, 3, None, "B"),
        (0, 3, 4, 5, "A", "C"),   # C produced twice, from different
        (0, 4, 6, 7, "B", "C"),   # parents -> 2 links for child C
        (0, 5, 0, 1, "C", None),  # early reader makes x(C)=1 < anc y
    ]
    df = spark.createDataFrame(rows, _HIST_SCHEMA)
    out = audit_linearizability(df, LockTokenModel).collect()[0]
    assert out["n_dup"] == 1
    assert out["n_chain"] == 1, out  # block C flagged ONCE, not per-link
    assert not out["linearizable"]


def test_chain_flags_blocks_downstream_of_cycle(spark):
    """r8 self-review pin: not just cycle MEMBERS — any block whose
    consumption chain reaches a cycle has no serial order; the cap-
    exhausted pointer set flags all of them.  Engine-only semantics by
    contract: the registered derivation is provably acyclic, so the
    oracle's recursive closure states the acyclic case only (see the
    oracle's scope note) and THIS pin is the cycle rule's certificate."""
    rows = [
        (0, 1, 0, 10, "B", "A"),
        (0, 2, 0, 10, "A", "B"),
        (0, 3, 0, 10, "A", "C"),  # C hangs off the A<->B cycle
    ]
    df = spark.createDataFrame(rows, _HIST_SCHEMA)
    out = audit_linearizability(df, LockTokenModel).collect()[0]
    assert out["n_chain"] == 3, out  # A, B, and downstream C
    assert not out["linearizable"]


def test_chain_router_paths_agree(spark, monkeypatch):
    """r9 router pin: the scalar index-array fold, the multi-pointer
    index-array fold, and the distributed doubling loop are the SAME
    recurrence — on identical histories the full per-key rows (all six
    rule counters, not just the verdict) must be bit-identical whichever
    path the router picks.  Forces the distributed path by zeroing the
    array-size threshold, and the multi-pointer path by appending keys
    with genuinely two-parent states (dup producers observing different
    parents); covers clean chains, stale/junk faults, a consumption
    cycle, and a block hanging downstream of one."""
    import mapreduceimplementation_spark.plans.linz as linz

    rng = random.Random(20260816 + 9)
    rows = [
        # cycle + downstream block (the cap-exhausted live flag)
        (900, 1, 0, 10, "B", "A"),
        (900, 2, 0, 10, "A", "B"),
        (900, 3, 0, 10, "A", "C"),
    ]
    # two-parent keys: state C produced twice from DIFFERENT parents
    # (the fork shape), one with an early reader, one without
    dup_rows = [
        (901, 1, 0, 1, None, "A"),
        (901, 2, 2, 3, None, "B"),
        (901, 3, 4, 5, "A", "C"),
        (901, 4, 6, 7, "B", "C"),
        (901, 5, 0, 1, "C", None),
        (902, 1, 0, 1, None, "A"),
        (902, 2, 2, 3, None, "B"),
        (902, 3, 4, 5, "A", "C"),
        (902, 4, 6, 7, "B", "C"),
        (902, 5, 8, 9, "C", "D"),
        (902, 6, 0, 1, "D", None),
    ]
    for k in range(30):
        t = 0
        state = "F:-1"
        toks = {"F": ["-1"], "H": []}
        for opid in range(1, rng.randint(3, 7)):
            inv = t + rng.randint(0, 3)
            ret = inv + rng.randint(1, 5)
            t = inv + 1
            kind = rng.choice(["lock", "unlock"])
            granted = (kind == "lock") == state.startswith("F")
            obs = state
            prod = None
            if granted:
                prod = ("H:" if kind == "lock" else "F:") + str(opid)
                toks[prod[0]].append(str(opid))
                state = prod
            if rng.random() < 0.3:
                kk = obs[0]
                obs = (
                    kk + ":" + rng.choice(toks[kk])
                    if rng.random() < 0.5
                    else f"{kk}:{-opid - 7}"
                )
            rows.append((k, opid, inv, ret, obs, prod))
    df = spark.createDataFrame(rows, _HIST_SCHEMA).localCheckpoint()
    df_dup = spark.createDataFrame(
        rows + dup_rows, _HIST_SCHEMA
    ).localCheckpoint()

    def rowmap(out):
        return {r["key"]: tuple(r) for r in out.collect()}

    # single-parent dataset: default = scalar fold
    fast = rowmap(audit_linearizability(df, LockTokenModel))
    # two-parent dataset: default = multi-pointer fold
    fast_dup = rowmap(audit_linearizability(df_dup, LockTokenModel))
    monkeypatch.setattr(linz, "_LINZ_ARRAY_MAX_PER_KEY", 0)
    slow = rowmap(audit_linearizability(df, LockTokenModel))
    slow_dup = rowmap(audit_linearizability(df_dup, LockTokenModel))
    assert fast == slow and len(fast) == 31
    assert fast_dup == slow_dup and len(fast_dup) == 33
    # and the shared keys are untouched by the dataset extension
    assert {k: fast_dup[k] for k in fast} == fast


def test_lock_linearizability_registered_mix(spark):
    """Registered B85 query at sf0.01: a genuine verdict mix — the
    hash-exempt clean locks all pass (the derivation's invoke-order
    serialization is real-time-consistent, so a fault-free lock MUST
    audit clean: engine soundness on real traces), injected locks
    produce every structural violation class."""
    from mapreduceimplementation_spark.functions.hashing import py_hash64

    rows = eng.QUERIES["lock_linearizability"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert len(rows) == 50
    clean = [r for r in rows if r["linearizable"]]
    assert clean and len(clean) < len(rows)
    tot = {
        c: sum(r[c] for r in rows)
        for c in ("n_unknown", "n_conflict", "n_chain", "n_cross")
    }
    assert all(v > 0 for v in tot.values()), tot
    for r in rows:
        exempt = py_hash64(str(r["key"]), salt="llz-clean") % 4 == 0
        if exempt:
            assert r["linearizable"], r
        viol = (
            r["n_unknown"]
            + r["n_dup"]
            + r["n_conflict"]
            + r["n_future"]
            + r["n_chain"]
            + r["n_cross"]
        )
        assert r["linearizable"] == (viol == 0)


def test_config_model_matches_bruteforce_on_random_histories(spark):
    """Differential gate for the engine's THIRD model (B86, VERDICT r8
    item 5): seeded random concurrent shardctrler config histories
    (ops <= 6) — serial epoch replay corrupted with fork / stale / junk
    epoch observations (the registered derivation's fault classes); the
    engine's per-key verdict must equal the brute-force search on every
    case.  One batched engine invocation."""
    from mapreduceimplementation_spark.plans.linz import ConfigEpochModel

    rng = random.Random(20260816 + 86)
    cases = []
    for _ in range(120):
        n = rng.randint(2, 6)
        iv = []
        for i in range(n):
            inv = rng.randint(0, 12)
            iv.append((i, inv, inv + rng.randint(1, 6)))
        remaining = list(iv)
        order = []
        while remaining:
            cands = [
                o
                for o in remaining
                if not any(p[2] < o[1] for p in remaining if p is not o)
            ]
            pick = rng.choice(cands)
            remaining.remove(pick)
            order.append(pick)
        num = 0
        ops = {}
        for opid, inv, ret in order:
            reconf = rng.random() < 0.5
            obs = f"C:{num}"
            prod = None
            if reconf:
                num += 1
                prod = f"C:{num}"
            ops[opid] = [opid, inv, ret, obs, prod]
        # corrupt: fork (re-produce the previous epoch), stale, junk
        if rng.random() < 0.6:
            for opid in rng.sample(sorted(ops), rng.randint(1, 2)):
                o = ops[opid]
                roll = rng.random()
                if roll < 0.34 and o[4] is not None and o[4] != "C:1":
                    cur = int(o[4][2:])
                    o[4] = f"C:{cur - 1}"
                    o[3] = f"C:{cur - 2}"
                elif roll < 0.67 and o[3] != "C:0":
                    o[3] = f"C:{int(o[3][2:]) - 1}"
                else:
                    o[3] = f"C:{-opid - 7}"
        cases.append([tuple(ops[i]) for i in sorted(ops)])

    rows = [
        (k, opid, inv, ret, obs, prod)
        for k, ops in enumerate(cases)
        for opid, inv, ret, obs, prod in ops
    ]
    df = spark.createDataFrame(rows, _HIST_SCHEMA)
    got = {
        r["key"]: r["linearizable"]
        for r in audit_linearizability(df, ConfigEpochModel).collect()
    }
    bad = [
        (k, _brute(ops, "C:0"), got[k])
        for k, ops in enumerate(cases)
        if _brute(ops, "C:0") != got[k]
    ]
    assert not bad, f"engine disagrees with brute force: {bad[:5]}"


def test_ctrl_linearizability_registered_mix(spark):
    """Registered B86 query at sf0.01: clean (hash-exempt) controller
    groups must audit linearizable — the serial epoch replay is
    real-time-consistent by construction (engine soundness) — and the
    injected fork/stale/junk faults must produce a genuine violation
    mix including dup + conflict (forks), which the lock model cannot
    generate."""
    from mapreduceimplementation_spark.functions.hashing import py_hash64

    rows = eng.QUERIES["ctrl_linearizability"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert len(rows) == 40
    clean = [r for r in rows if r["linearizable"]]
    assert clean and len(clean) < len(rows)
    tot = {
        c: sum(r[c] for r in rows)
        for c in ("n_unknown", "n_dup", "n_conflict", "n_chain")
    }
    assert all(v > 0 for v in tot.values()), tot
    for r in rows:
        exempt = py_hash64(str(r["key"]), salt="ctl-clean") % 4 == 0
        if exempt:
            assert r["linearizable"], r
        viol = (
            r["n_unknown"]
            + r["n_dup"]
            + r["n_conflict"]
            + r["n_future"]
            + r["n_chain"]
            + r["n_cross"]
        )
        assert r["linearizable"] == (viol == 0)


def test_oracle_closure_cost_stays_inside_budget(spark):
    """VERDICT r8 item 7: the certification oracle's recursive ancestor
    closure is O(sum chain-depth^2) BY DESIGN; pin both registered
    derivations' chain-size distributions at sf0.01 so a parameter
    change (_LLZ_* / _CTL_*) cannot silently push the sf0.1 gate past
    the driver's timeout.  Consumer count per key upper-bounds chain
    depth (every chain link is a producing op that also observes).
    Budgets calibrated r9: lock measured (118, 485,800) and ctrl
    (93, 162,294); closure work scales ~100x from sf0.01 to sf0.1
    (rows x10 => per-key depth x10 => depth^2 x100), and the lock
    budget's 100x ~ 60M closure rows certified in ~9 min — the
    accepted ceiling."""
    from pyspark.sql import functions as F

    from mapreduceimplementation_spark.plans.linz import (
        derive_ctrl_config_history,
        derive_lock_token_history,
    )

    budgets = {
        "lock": (derive_lock_token_history, 150, 600_000),
        "ctrl": (derive_ctrl_config_history, 120, 250_000),
    }
    for name, (derive, max_depth, max_sum2) in budgets.items():
        hist = derive(spark, "/root/testdata/sf0.01")
        cons = (
            hist.where(F.col("prod").isNotNull() & F.col("obs").isNotNull())
            .groupBy("key")
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(
                F.max("c").alias("maxd"),
                F.sum(F.col("c") * F.col("c")).alias("sum2"),
            )
            .collect()[0]
        )
        assert cons["maxd"] <= max_depth, (name, cons)
        assert cons["sum2"] <= max_sum2, (name, cons)


def test_certification_wall_derived_from_committed_timing_law(spark):
    """VERDICT r9 item 6: turn the sf0.1 certification wall into a FAST
    test.  The committed law (ORACLE_r09_sf0.1.txt vs the r9-measured
    sf0.01 closure masses): closure work scales ~100x from sf0.01 to
    sf0.1, and the WORST committed certification window processed
    closure rows at ~64k/s (lock: 485,800 x 100 rows in 756.5 s) and
    ~35k/s (ctrl: 162,294 x 100 in 452.6 s — the ctrl closure carries a
    heavier per-row recursive CTE constant).  Two assertions per
    derivation, both computed from the CURRENT sf0.01 derivation in
    seconds of projected sf0.1 wall:

    1. the measured closure mass projects under the ~900 s accepted
       routine ceiling (lock's worst committed run, rounded up), so a
       _LLZ_*/_CTL_* parameter change that would push the 7-minute
       certification past it fails HERE in seconds;
    2. the hand-pinned sum2 budgets in the companion test themselves
       project under a 1200 s hard wall — the budget can never admit a
       configuration the certification gate cannot finish.
    """
    from pyspark.sql import functions as F

    from mapreduceimplementation_spark.plans.linz import (
        derive_ctrl_config_history,
        derive_lock_token_history,
    )

    # worst committed closure-row rates (rows/sec), ORACLE_r09_sf0.1.txt
    law = {
        "lock": (derive_lock_token_history, 64_000, 600_000),
        "ctrl": (derive_ctrl_config_history, 35_000, 250_000),
    }
    scale_factor = 100  # sf0.01 -> sf0.1: rows x10 => depth^2 x100
    routine_wall_s = 900
    hard_wall_s = 1200
    for name, (derive, rate, budget_sum2) in law.items():
        hist = derive(spark, "/root/testdata/sf0.01")
        sum2 = (
            hist.where(F.col("prod").isNotNull() & F.col("obs").isNotNull())
            .groupBy("key")
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(F.sum(F.col("c") * F.col("c")).alias("sum2"))
            .collect()[0]["sum2"]
        )
        projected_s = sum2 * scale_factor / rate
        assert projected_s <= routine_wall_s, (
            f"{name}: sf0.01 closure mass {sum2} projects to "
            f"{projected_s:.0f}s at sf0.1 under the committed "
            f"{rate}-rows/s law — past the {routine_wall_s}s routine "
            "certification ceiling; shrink the derivation parameters"
        )
        budget_projected_s = budget_sum2 * scale_factor / rate
        assert budget_projected_s <= hard_wall_s, (
            f"{name}: the sum2 budget {budget_sum2} itself projects to "
            f"{budget_projected_s:.0f}s — tighten the budget or the law"
        )
