"""B85. Generic linearizability-audit engine + the token-lock model.

The reference's porcupine checker is MODEL-GENERIC (src/porcupine/model.go:1
defines Init/Step/Partition, checker.go:1 searches linearizations for ANY
model; the labs instantiate the KV register at src/models/kv.go:17).  Rounds
1-7 shipped the register audit (B51, plans/kv.py linearizability_audit) and
the Put/Append/Get KvModel (B62, append_linearizability_audit), but each as
a bespoke rule set — there was no "bring your own model" API.  This module
factors the shared machinery into one:

    audit_linearizability(history, model) -> per-key verdict DataFrame

over OBSERVATION HISTORIES — (key, opid, inv, ret, obs, prod) where every
state value is globally unique per key (porcupine's unique-value regime, the
one under which the polynomial rules are exact) and each op atomically
observes state ``obs`` (null = blind) and produces state ``prod`` (null =
read-only / denied).  The engine decides linearizability with six generic
rules, all per-key, none pair-expanding:

- unknown:  an observed state was never produced and is not initial;
- dup:      a state produced by more than one op;
- conflict: a state CONSUMED (observed by a producing op) more than once —
            states are unique, so at most one successor may transform one;
- future:   an observer returns before the state's producer invokes;
- chain:    the consumption edges force block order p -> c; real time must
            not contradict any forced ancestor (min-ret(c) >= max-inv over
            every chain ancestor), checked by pointer-doubling propagation
            (O(log chain) rounds over the state-count-sized link table);
- cross:    two blocks mutually precede each other — ``cluster_crossings``
            (plans/kv.py), the B51/B62 lex-orientation detector, shared
            verbatim.

Models shipped:
- ``RegisterModel`` — B51's Get/Put register re-expressed as observations
  (puts are blind producers); the differential pytest pins its verdicts to
  ``linearizability_audit``'s per key, proving the engine generalizes the
  existing audit rather than forking it.
- ``LockTokenModel`` — the lock service (reference src/main/lockc.go
  Lock/Unlock grant bools, src/main/lockd.go primary/backup daemon) as a
  2-state machine with FENCING TOKENS (the Chubby sequence-number
  discipline): held(g) is identified by the granting Lock's opid, free(u)
  by the releasing Unlock's, so states are unique and the generic rules
  are exact.  B59 audits the SERIAL grant spec; this audits the
  CONCURRENT history — the check the lab's failover tests actually imply.

Registered query: ``lock_linearizability`` over a derived concurrent
Lock/Unlock trace (B59's op recipe plus B51's latency spread), with stale
fencing-token injections (1/{stale}) and junk tokens (1/{junk}) so the
output is a genuine verdict mix.  The DuckDB oracle replays the identical
derivation, then states cross as the literal quadratic EXISTS and chain as
a literal RECURSIVE ancestor closure — obviously-correct-by-inspection SQL
certifying the windowed/doubling formulations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mapreduceimplementation_spark.functions.hashing import hash64, sql_hash64
from mapreduceimplementation_spark.plans.kv import (
    _LIN_DUR_BASE,
    _LIN_DUR_MOD,
    _LIN_XMIN,
    cluster_crossings,
)
from mapreduceimplementation_spark.registry import register
from mapreduceimplementation_spark.session import tune
from mapreduceimplementation_spark.sources.tables import load_table

_LLZ_LOCKS = 50  # clients share locks 50-to-1: sessions interleave
_LLZ_STALE_EVERY = 19  # 1/19 ops observe the second-latest same-kind token
_LLZ_JUNK_EVERY = 67  # 1/67 ops observe a token no op ever granted


class RegisterModel:
    """B51's unique-value Get/Put register as an observation model:
    puts are BLIND producers (a register write observes nothing — write
    order is free, exactly why B51's deciding rule is the crossing),
    gets observe 'V:<val>' ('V:-1' = the initial value).  No consumption
    edges exist, so conflict/chain are vacuous and the engine reduces to
    unknown + future + cross — B51's verdict-deciding subset (its
    docstring: n_cycle with unknown/future decides; stale/reorder are
    named special cases of crossings)."""

    @staticmethod
    def to_observations(history: DataFrame) -> DataFrame:
        val = F.concat(F.lit("V:"), F.col("val").cast("string"))
        return history.select(
            "key",
            "opid",
            "inv",
            "ret",
            F.when(F.col("kind") == "get", val).alias("obs"),
            F.when(F.col("kind") == "put", val).alias("prod"),
        )

    @staticmethod
    def is_initial(val: Column) -> Column:
        return val == "V:-1"


class LockTokenModel:
    """The lock service as a 2-state token machine: states 'F:<tok>'
    (free; tok = the releasing Unlock's opid, -1 initial) and 'H:<tok>'
    (held; tok = the granting Lock's opid).  A granted Lock observes the
    current free state and produces its held state; a granted Unlock
    observes the current held state and produces its free state; denied
    ops observe without producing.  Unique tokens make every state value
    unique, so the generic rules are the exact check."""

    @staticmethod
    def to_observations(history: DataFrame) -> DataFrame:
        return history.select("key", "opid", "inv", "ret", "obs", "prod")

    @staticmethod
    def is_initial(val: Column) -> Column:
        return val == "F:-1"


def audit_linearizability(history: DataFrame, model) -> DataFrame:
    """Generic per-key linearizability audit (see module docstring).

    ``history``: the model's raw history; ``model.to_observations`` maps
    it to (key, opid, inv, ret, obs, prod) with per-key-unique state
    values; ``model.is_initial`` marks observable pre-history states.
    Emits one row per key: (key, n_ops, n_states, n_unknown, n_dup,
    n_conflict, n_future, n_chain, n_cross, linearizable).

    Scale shape (porcupine's per-key decomposition throughout): state
    matching is one equi-join on (key, state); conflict/dup are
    groupBys on state cells; cross is two windows over the block-count
    relation (cluster_crossings); chain is O(log chain-length) pointer-
    doubling rounds over the state-count link table, each ONE self-join
    — never an op-pair expansion, and a hot key costs what porcupine's
    own per-key search would."""
    H = model.to_observations(history).localCheckpoint(eager=False)
    P = H.where(F.col("prod").isNotNull()).select(
        "key",
        F.col("prod").alias("val"),
        F.col("inv").alias("p_inv"),
        F.col("ret").alias("p_ret"),
        F.col("opid").alias("p_opid"),
        F.col("obs").alias("p_obs"),
    )
    O = H.where(F.col("obs").isNotNull()).select(
        "key",
        F.col("obs").alias("val"),
        F.col("inv").alias("o_inv"),
        F.col("ret").alias("o_ret"),
    )
    # rule: dup — a state produced twice (min-opid producer pins the
    # block deterministically for the remaining rules)
    states = (
        P.groupBy("key", "val")
        .agg(
            F.min("p_inv").alias("p_inv"),
            F.min("p_ret").alias("p_ret"),
            F.count(F.lit(1)).alias("n_prod"),
        )
        .localCheckpoint(eager=False)
    )
    dup_agg = (
        states.where(F.col("n_prod") > 1)
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n_dup"))
    )
    om = O.join(
        states.select("key", "val", "p_inv"), ["key", "val"], "left"
    ).select(
        "key",
        "val",
        "o_inv",
        "o_ret",
        "p_inv",
        model.is_initial(F.col("val")).alias("is_init"),
    )
    flags = om.groupBy("key").agg(
        F.sum(
            F.when(F.col("p_inv").isNull() & ~F.col("is_init"), 1).otherwise(0)
        ).alias("n_unknown"),
        F.sum(
            F.when(
                F.col("p_inv").isNotNull() & (F.col("o_ret") < F.col("p_inv")),
                1,
            ).otherwise(0)
        ).alias("n_future"),
    )
    valid_obs = om.where(F.col("p_inv").isNotNull() | F.col("is_init"))
    # rule: conflict — a unique state consumed by >1 producing op
    consumers = P.where(F.col("p_obs").isNotNull()).select(
        "key", F.col("p_obs").alias("val"), F.col("val").alias("child"),
        "p_opid",
    )
    valid_states = states.select("key", "val").unionByName(
        valid_obs.where(F.col("is_init")).select("key", "val").distinct()
    ).distinct().localCheckpoint(eager=False)
    vcons = consumers.join(valid_states, ["key", "val"]).localCheckpoint(
        eager=False
    )
    conflict_agg = (
        vcons.groupBy("key", "val")
        .agg(F.countDistinct("p_opid").alias("c"))
        .where(F.col("c") > 1)
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n_conflict"))
    )
    # blocks: producer + valid observers per state; initial states have
    # observers only and are pinned before all time
    members = states.select(
        "key", "val", F.col("p_ret").alias("r"), F.col("p_inv").alias("i")
    ).unionByName(
        valid_obs.select(
            "key", "val", F.col("o_ret").alias("r"), F.col("o_inv").alias("i")
        )
    )
    blocks = (
        members.groupBy("key", "val")
        .agg(F.min("r").alias("x0"), F.max("i").alias("y"))
        .select(
            "key",
            "val",
            F.when(model.is_initial(F.col("val")), F.lit(_LIN_XMIN))
            .otherwise(F.col("x0"))
            .alias("x"),
            "y",
        )
        .localCheckpoint(eager=True)
    )
    nstates = blocks.groupBy("key").agg(F.count(F.lit(1)).alias("n_states"))
    cross_agg = (
        cluster_crossings(blocks, id_col="val")
        .groupBy("key")
        .agg(F.sum(F.when(F.col("crossed"), 1).otherwise(0)).alias("n_cross"))
    )
    # rule: chain — pointer-doubling propagation of max ancestor y along
    # consumption edges; flag block c when min-ret(c) < that max (some
    # c-op returned before an op of a forced-earlier block invoked)
    links = (
        vcons.select("key", "child", F.col("val").alias("parent"))
        .distinct()
        .join(
            blocks.select(
                "key", F.col("val").alias("parent"), F.col("y").alias("acc")
            ),
            ["key", "parent"],
        )
        .select("key", "child", F.col("parent").alias("ptr"), "acc")
        .localCheckpoint(eager=True)
    )
    n_links = links.count()
    cap = max(1, (int(n_links).bit_length()) + 2)
    t = links
    cycled = None
    for _ in range(cap):
        active = t.where(F.col("ptr").isNotNull())
        if active.isEmpty():
            break
        other = t.select(
            "key",
            F.col("child").alias("ptr"),
            F.col("ptr").alias("nptr"),
            F.col("acc").alias("nacc"),
        )
        t = (
            t.join(other, ["key", "ptr"], "left")
            .select(
                "key",
                "child",
                F.col("nptr").alias("ptr"),
                F.greatest(
                    "acc", F.coalesce("nacc", F.lit(_LIN_XMIN))
                ).alias("acc"),
            )
            .localCheckpoint(eager=True)
        )
    else:
        # cap exhausted with live pointers: the consumption edges form a
        # cycle — a logical contradiction; flag every still-live child
        cycled = t.where(F.col("ptr").isNotNull()).select("key", "child")
    chain_v = (
        blocks.join(
            t.select("key", F.col("child").alias("val"), "acc"),
            ["key", "val"],
        )
        .where(F.col("x") < F.col("acc"))
        .select("key", "val")
    )
    if cycled is not None:
        chain_v = chain_v.unionByName(
            cycled.select("key", F.col("child").alias("val"))
        )
    # distinct ALWAYS, not just on the cycle path (r8 self-review): a
    # state produced by two ops observing different parents (n_dup > 0)
    # carries 2+ rows per child through the doubling loop, and without
    # the dedup the same block would count twice — the oracle's chainv
    # groups by (key, val), i.e. counts BLOCKS
    chain_agg = chain_v.distinct().groupBy("key").agg(
        F.count(F.lit(1)).alias("n_chain")
    )
    ops = history.groupBy("key").agg(F.count(F.lit(1)).alias("n_ops"))
    out = (
        ops.join(nstates, "key", "left")
        .join(flags, "key", "left")
        .join(dup_agg, "key", "left")
        .join(conflict_agg, "key", "left")
        .join(chain_agg, "key", "left")
        .join(cross_agg, "key", "left")
        .select(
            "key",
            "n_ops",
            F.coalesce("n_states", F.lit(0)).alias("n_states"),
            F.coalesce("n_unknown", F.lit(0)).alias("n_unknown"),
            F.coalesce("n_dup", F.lit(0)).alias("n_dup"),
            F.coalesce("n_conflict", F.lit(0)).alias("n_conflict"),
            F.coalesce("n_future", F.lit(0)).alias("n_future"),
            F.coalesce("n_chain", F.lit(0)).alias("n_chain"),
            F.coalesce("n_cross", F.lit(0)).alias("n_cross"),
        )
    )
    return out.withColumn(
        "linearizable",
        (
            F.col("n_unknown")
            + F.col("n_dup")
            + F.col("n_conflict")
            + F.col("n_future")
            + F.col("n_chain")
            + F.col("n_cross")
        )
        == 0,
    )


def derive_lock_token_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic CONCURRENT lock-service history with fencing tokens
    from events — B59's op recipe (lock = client bucket, kind from the
    'lkop' hash) plus B51's latency spread so intervals overlap.  The
    true reply per op comes from the serial replay in (inv, opid) order
    (the invoke-order linearization, always real-time-consistent), then
    1/{stale} observations are swapped to the SECOND-latest same-kind
    token (the lost-state failover bug: a backup answering with a stale
    holder) and 1/{junk} to a never-granted token.

    Output: (key, opid, inv, ret, kind, granted, obs, prod) —
    ``LockTokenModel``'s contract (obs/prod state strings)."""
    tune(spark)
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    eid = F.col("event_id").cast("string")
    base = ev.select(
        (F.col("user_id") % _LLZ_LOCKS).alias("key"),
        F.col("event_id").alias("opid"),
        F.unix_micros("ts").alias("inv"),
        (
            F.unix_micros("ts")
            + _LIN_DUR_BASE
            + hash64(eid, salt="llz-dur") % _LIN_DUR_MOD
        ).alias("ret"),
        F.when(hash64(eid, salt="lkop") % 2 == 0, "lock")
        .otherwise("unlock")
        .alias("kind"),
    )
    w = Window.partitionBy("key").orderBy("inv", "opid")
    w_prev = w.rowsBetween(Window.unboundedPreceding, -1)
    prev_kind = F.coalesce(F.lag("kind").over(w), F.lit("unlock"))
    g1 = base.select(
        "*",
        F.when(F.col("kind") == "lock", prev_kind == "unlock")
        .otherwise(prev_kind == "lock")
        .alias("granted"),
    )
    gl = F.when((F.col("kind") == "lock") & F.col("granted"), F.col("opid"))
    gu = F.when((F.col("kind") == "unlock") & F.col("granted"), F.col("opid"))
    g2 = g1.select(
        "*",
        F.last(gl, ignorenulls=True).over(w_prev).alias("lastH0"),
        F.last(gu, ignorenulls=True).over(w_prev).alias("lastF0"),
    )
    # second-latest tokens via the B51 staging trick: each granted op
    # carries the token it replaced; the latest such carry before op i
    # is the second-latest token at i
    h_prev = F.when(
        (F.col("kind") == "lock") & F.col("granted"), F.col("lastH0")
    )
    f_prev = F.when(
        (F.col("kind") == "unlock") & F.col("granted"),
        F.coalesce(F.col("lastF0"), F.lit(-1)),
    )
    g3 = g2.select(
        "*",
        F.last(h_prev, ignorenulls=True).over(w_prev).alias("h2"),
        F.last(f_prev, ignorenulls=True).over(w_prev).alias("f2"),
    )
    lastH = F.col("lastH0")
    lastF = F.coalesce(F.col("lastF0"), F.lit(-1))
    obs_kind = F.when(
        (F.col("kind") == "lock") == F.col("granted"), F.lit("F")
    ).otherwise(F.lit("H"))
    true_tok = F.when(obs_kind == "F", lastF).otherwise(lastH)
    # scale-stable verdict mix (the B63 lesson): a hash-chosen 1/4 of
    # LOCKS is exempt from injection entirely, so clean verdicts exist
    # at every scale factor instead of vanishing as per-op faults
    # accumulate with history length
    clean = hash64(F.col("key").cast("string"), salt="llz-clean") % 4 == 0
    junk = ~clean & (
        hash64(F.col("opid").cast("string"), salt="llz-junk")
        % _LLZ_JUNK_EVERY
        == 0
    )
    stale = ~clean & (
        hash64(F.col("opid").cast("string"), salt="llz-st")
        % _LLZ_STALE_EVERY
        == 0
    )
    alt_tok = F.when(obs_kind == "F", F.col("f2")).otherwise(F.col("h2"))
    obs_tok = (
        F.when(junk, -F.col("opid") - 7)
        .when(stale & alt_tok.isNotNull(), alt_tok)
        .otherwise(true_tok)
    )
    prod = F.when(
        F.col("granted"),
        F.concat(
            F.when(F.col("kind") == "lock", F.lit("H:")).otherwise(F.lit("F:")),
            F.col("opid").cast("string"),
        ),
    )
    return g3.select(
        "key",
        "opid",
        "inv",
        "ret",
        "kind",
        "granted",
        F.concat(obs_kind, F.lit(":"), obs_tok.cast("string")).alias("obs"),
        prod.alias("prod"),
    )


_LLZ_H_DUR = sql_hash64("'llz-dur' || CAST(event_id AS VARCHAR)")
_LLZ_H_OP = sql_hash64("'lkop' || CAST(event_id AS VARCHAR)")
_LLZ_H_JUNK = sql_hash64("'llz-junk' || CAST(opid AS VARCHAR)")
_LLZ_H_ST = sql_hash64("'llz-st' || CAST(opid AS VARCHAR)")

_LLZ_HISTORY_SQL = f"""
    base AS (
        SELECT user_id % {_LLZ_LOCKS} AS key,
               event_id AS opid,
               CAST(epoch_us(ts) AS BIGINT) AS inv,
               CAST(epoch_us(ts) AS BIGINT) + {_LIN_DUR_BASE}
                   + ({_LLZ_H_DUR} % {_LIN_DUR_MOD}) AS ret,
               CASE WHEN {_LLZ_H_OP} % 2 = 0 THEN 'lock' ELSE 'unlock' END
                   AS kind
        FROM events
    ),
    g1 AS (
        SELECT *,
               CASE WHEN kind = 'lock'
                    THEN COALESCE(LAG(kind) OVER w, 'unlock') = 'unlock'
                    ELSE COALESCE(LAG(kind) OVER w, 'unlock') = 'lock'
               END AS granted
        FROM base
        WINDOW w AS (PARTITION BY key ORDER BY inv, opid)
    ),
    g2 AS (
        SELECT *,
               last_value(CASE WHEN kind = 'lock' AND granted THEN opid END
                          IGNORE NULLS) OVER wp AS lastH0,
               last_value(CASE WHEN kind = 'unlock' AND granted THEN opid END
                          IGNORE NULLS) OVER wp AS lastF0
        FROM g1
        WINDOW wp AS (PARTITION BY key ORDER BY inv, opid
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    g3 AS (
        SELECT *,
               last_value(CASE WHEN kind = 'lock' AND granted THEN lastH0 END
                          IGNORE NULLS) OVER wp AS h2,
               last_value(CASE WHEN kind = 'unlock' AND granted
                               THEN COALESCE(lastF0, -1) END
                          IGNORE NULLS) OVER wp AS f2
        FROM g2
        WINDOW wp AS (PARTITION BY key ORDER BY inv, opid
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    hist AS (
        SELECT key, opid, inv, ret, kind, granted,
               ok || ':' || CAST(
                   CASE WHEN NOT clean
                             AND ({_LLZ_H_JUNK} % {_LLZ_JUNK_EVERY}) = 0
                            THEN -opid - 7
                        WHEN NOT clean
                             AND ({_LLZ_H_ST} % {_LLZ_STALE_EVERY}) = 0
                             AND alt IS NOT NULL THEN alt
                        ELSE tru END AS VARCHAR) AS obs,
               CASE WHEN granted THEN
                   (CASE WHEN kind = 'lock' THEN 'H:' ELSE 'F:' END)
                       || CAST(opid AS VARCHAR)
               END AS prod
        FROM (
            SELECT *,
                   CASE WHEN (kind = 'lock') = granted THEN 'F' ELSE 'H' END
                       AS ok,
                   CASE WHEN (kind = 'lock') = granted
                        THEN COALESCE(lastF0, -1) ELSE lastH0 END AS tru,
                   CASE WHEN (kind = 'lock') = granted THEN f2 ELSE h2 END
                       AS alt,
                   ({sql_hash64("'llz-clean' || CAST(key AS VARCHAR)")}
                        % 4) = 0 AS clean
            FROM g3
        )
    )
"""


@register(
    "lock_linearizability",
    oracle=f"""
    WITH {_LLZ_HISTORY_SQL},
    prods AS (
        SELECT key, prod AS val, inv AS p_inv, ret AS p_ret, opid AS p_opid,
               obs AS p_obs
        FROM hist WHERE prod IS NOT NULL
    ),
    states AS (
        SELECT key, val, MIN(p_inv) AS p_inv, MIN(p_ret) AS p_ret,
               COUNT(*) AS n_prod
        FROM prods GROUP BY key, val
    ),
    om AS (
        SELECT h.key, h.obs AS val, h.inv AS o_inv, h.ret AS o_ret,
               s.p_inv, (h.obs = 'F:-1') AS is_init
        FROM hist h
        LEFT JOIN states s ON s.key = h.key AND s.val = h.obs
        WHERE h.obs IS NOT NULL
    ),
    valid_states AS (
        SELECT key, val FROM states
        UNION
        SELECT DISTINCT key, val FROM om WHERE is_init
    ),
    vcons AS (
        SELECT p.key, p.p_obs AS val, p.val AS child, p.p_opid
        FROM prods p
        JOIN valid_states v ON v.key = p.key AND v.val = p.p_obs
        WHERE p.p_obs IS NOT NULL
    ),
    blocks AS (
        SELECT key, val,
               CASE WHEN val = 'F:-1' THEN CAST({_LIN_XMIN} AS BIGINT)
                    ELSE MIN(r) END AS x,
               MAX(i) AS y
        FROM (
            SELECT key, val, p_ret AS r, p_inv AS i FROM states
            UNION ALL
            SELECT key, val, o_ret AS r, o_inv AS i FROM om
            WHERE p_inv IS NOT NULL OR is_init
        ) GROUP BY key, val
    ),
    anc AS (
        -- literal RECURSIVE ancestor closure of the consumption chain:
        -- the windowed pointer-doubling twin must flag exactly the
        -- blocks whose min-ret precedes some forced ancestor's max-inv.
        -- Scope note (r8 self-review): this restatement assumes an
        -- ACYCLIC consumption graph, which derive_lock_token_history
        -- guarantees (observed tokens strictly precede their observers
        -- in serial order).  The engine additionally flags cyclic
        -- graphs (cap-exhausted live pointers) — that rule is pinned
        -- by tests/test_linz.py hand traces, not oracle-stated, so the
        -- closure runs ONCE here instead of tripling the 10M-row
        -- recursion at sf0.1 for inputs it can never receive.
        WITH RECURSIVE a(key, child, anc) AS (
            SELECT DISTINCT key, child, val FROM vcons
            UNION
            SELECT a.key, a.child, v.val
            FROM a JOIN (SELECT DISTINCT key, child, val FROM vcons) v
              ON v.key = a.key AND v.child = a.anc
        )
        SELECT * FROM a
    ),
    chainv AS (
        -- one row per violating BLOCK (GROUP BY key, val) — the
        -- engine's chain_v is distinct-counted to the same grain
        SELECT c.key, c.val
        FROM blocks c
        JOIN anc a ON a.key = c.key AND a.child = c.val
        JOIN blocks p ON p.key = a.key AND p.val = a.anc
        GROUP BY c.key, c.val
        HAVING MIN(c.x) < MAX(p.y)
    ),
    chain_agg AS (
        SELECT key, CAST(COUNT(*) AS BIGINT) AS n_chain
        FROM chainv GROUP BY key
    ),
    crossv AS (
        SELECT a.key, CAST(COUNT(*) AS BIGINT) AS n_cross
        FROM blocks a
        WHERE EXISTS (
            SELECT 1 FROM blocks b
            WHERE b.key = a.key
              AND (b.x < a.x OR (b.x = a.x AND b.val < a.val))
              AND b.x < a.y AND a.x < b.y)
        GROUP BY a.key
    ),
    flag_agg AS (
        SELECT key,
               CAST(SUM(CASE WHEN p_inv IS NULL AND NOT is_init
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_unknown,
               CAST(SUM(CASE WHEN p_inv IS NOT NULL AND o_ret < p_inv
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_future
        FROM om GROUP BY key
    ),
    dup_agg AS (
        SELECT key, CAST(COUNT(*) AS BIGINT) AS n_dup
        FROM states WHERE n_prod > 1 GROUP BY key
    ),
    conflict_agg AS (
        SELECT key, CAST(COUNT(*) AS BIGINT) AS n_conflict
        FROM (
            SELECT key, val FROM vcons
            GROUP BY key, val HAVING COUNT(DISTINCT p_opid) > 1
        ) GROUP BY key
    ),
    nstates AS (
        SELECT key, CAST(COUNT(*) AS BIGINT) AS n_states
        FROM blocks GROUP BY key
    ),
    ops AS (
        SELECT key, CAST(COUNT(*) AS BIGINT) AS n_ops FROM hist GROUP BY key
    )
    SELECT o.key, o.n_ops,
           COALESCE(ns.n_states, 0) AS n_states,
           COALESCE(f.n_unknown, 0) AS n_unknown,
           COALESCE(d.n_dup, 0) AS n_dup,
           COALESCE(c.n_conflict, 0) AS n_conflict,
           COALESCE(f.n_future, 0) AS n_future,
           COALESCE(ch.n_chain, 0) AS n_chain,
           COALESCE(x.n_cross, 0) AS n_cross,
           (COALESCE(f.n_unknown, 0) + COALESCE(d.n_dup, 0)
            + COALESCE(c.n_conflict, 0) + COALESCE(f.n_future, 0)
            + COALESCE(ch.n_chain, 0) + COALESCE(x.n_cross, 0)) = 0
               AS linearizable
    FROM ops o
    LEFT JOIN nstates ns USING (key)
    LEFT JOIN flag_agg f USING (key)
    LEFT JOIN dup_agg d USING (key)
    LEFT JOIN conflict_agg c USING (key)
    LEFT JOIN chain_agg ch USING (key)
    LEFT JOIN crossv x USING (key)
    """,
)
def lock_linearizability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-lock linearizability verdicts for a concurrent fencing-token
    Lock/Unlock history (B85) — the generic porcupine-style audit API
    (``audit_linearizability``) instantiated on its second model, the
    lock service as a 2-state token machine (``LockTokenModel``; the
    first, ``RegisterModel``, is differentially pinned to B51's audit).
    See ``derive_lock_token_history`` for the trace and the injected
    stale-token / junk-token faults that make the verdict a genuine mix.

    The DuckDB oracle replays the identical derivation, then states the
    crossing rule as the literal quadratic EXISTS and the chain rule as
    a literal RECURSIVE ancestor closure — so a green hash certifies
    both the windowed crossing detector AND the pointer-doubling chain
    propagation against their textbook definitions.  The closure is
    O(Σ chain-depth²) rows BY DESIGN (the obviously-correct
    restatement, like B51's quadratic EXISTS): ~5 min at sf0.1 is a
    certification cost, not a serving cost — the Spark side stays
    O(states · log chain)."""
    tune(spark)
    return audit_linearizability(
        derive_lock_token_history(spark, sf_dir), LockTokenModel
    )
