"""Driver contract for the spark-graft builder (PySpark target).

Thin view over ``mapreduceimplementation_spark``'s registry: every operator
module self-registers its (spark, sf_dir) -> DataFrame callable and, where
SQL-expressible, a DuckDB oracle (see SURVEY.md §2 for the inventory).

Certification rotation: the driver's correctness gate checks the first ~50
entries of ``queries()`` in dict-iteration order (observed: CORRECTNESS_r03
holds exactly registry positions 0-49).  With >50 registered queries, a
fixed order would leave the tail permanently uncertified, so ``queries()``
orders the surface in three buckets (VERDICT r7 item 8):

1. never-driver-certified queries (a new operator must certify first);
2. queries whose DEFINING MODULE changed (git) since the round that last
   certified them — a code change must not hide behind the round-robin
   for 3 rounds while the window cycles the untouched tail;
3. everything else, oldest certification first (the original rotation).

Buckets 2 and 3 are each ordered oldest-certified-first, so even when a
wide refactor overflows bucket 2 past the ~50-slot window, the overflow
drains in oldest-first order over subsequent rounds.  Change detection
compares the module's last git commit time (plus any uncommitted edits)
against the commit that ADDED the certifying CORRECTNESS_r{N}.json; any
git failure degrades to the plain recency rotation (policy documented in
BASELINE.md).
"""

from __future__ import annotations

import inspect
import json
import re
import subprocess
import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

import mapreduceimplementation_spark as eng

eng.load_all_operators()

_REPO = Path(__file__).resolve().parent


def _last_certified_round() -> dict[str, int]:
    """Map query name -> latest round with a PASSING driver CORRECTNESS
    row.  A failed row (err set, or any match flag false) must NOT count
    as certification — counting it would rotate a failing query to the
    back of the window exactly when it most needs re-checking."""
    last: dict[str, int] = {}
    for p in sorted(_REPO.glob("CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict) or row.get("err") is not None:
                continue
            flags = [
                row[k]
                for k in ("rows_match", "schema_match", "hash_match")
                if k in row
            ]
            if flags and all(flags):
                last[name] = max(rnd, last.get(name, 0))
    return last


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args],
        cwd=_REPO,
        capture_output=True,
        text=True,
        timeout=30,
        check=True,
    ).stdout.strip()


def _changed_since_cert(last: dict[str, int]) -> frozenset[str]:
    """Names whose defining module changed in any commit AFTER the commit
    that added their certifying CORRECTNESS file (plus anything with
    uncommitted edits).  ANCESTRY-based, not timestamp-based (ADVICE r8:
    commit times are not monotonic with history order under rebase /
    cherry-pick / clock skew — ``git log <cert_commit>..HEAD -- <module>``
    is the question actually being asked).  Empty set on any git failure
    — the rotation then degrades to plain recency, never breaks, and
    says so on stderr instead of hiding the feature loss."""
    try:
        dirty = set()
        for line in _git("status", "--porcelain").splitlines():
            if not line.strip():
                continue
            path = line[3:]
            # rename/copy lines read 'R  old -> new': the NEW path is
            # the one a module resolves to (r8 self-review — without
            # this, an uncommitted renamed module never reached the
            # changed bucket); git also quotes special-char paths
            if " -> " in path:
                path = path.split(" -> ", 1)[1]
            dirty.add(path.strip().strip('"'))
        mod_rel = {
            name: str(
                Path(inspect.getfile(eng.QUERIES[name])).resolve().relative_to(
                    _REPO
                )
            )
            for name in eng.QUERIES
        }
        rels = sorted(set(mod_rel.values()))
        cert_commit: dict[int, str] = {}
        since: dict[int, frozenset[str]] = {}
        changed = set()
        for name, rnd in last.items():
            if name not in mod_rel:
                continue
            rel = mod_rel[name]
            if rel in dirty:
                changed.add(name)
                continue
            if rnd not in cert_commit:
                cert_commit[rnd] = _git(
                    "log",
                    "--diff-filter=A",
                    "-1",
                    "--format=%H",
                    "--",
                    f"CORRECTNESS_r{rnd:02d}.json",
                )
            commit = cert_commit[rnd]
            if not commit:
                continue  # cert file never committed: nothing to compare
            if rnd not in since:
                # ONE ancestry sweep per certifying round: every module
                # file touched by any commit after the cert landed
                out = _git(
                    "log",
                    "--format=",
                    "--name-only",
                    f"{commit}..HEAD",
                    "--",
                    *rels,
                )
                since[rnd] = frozenset(
                    ln.strip().strip('"')
                    for ln in out.splitlines()
                    if ln.strip()
                )
            if rel in since[rnd]:
                changed.add(name)
        return frozenset(changed)
    except Exception as exc:
        print(
            "__spark_entry__: rotation change-detection degraded to plain "
            f"recency ({type(exc).__name__}: {exc})",
            file=sys.stderr,
        )
        return frozenset()


def _order(
    names: list[str], last: dict[str, int], changed: frozenset[str]
) -> list[str]:
    """The pure rotation policy (pytest-pinned): bucket 0 = never
    certified, bucket 1 = changed since certification, bucket 2 = rest;
    buckets 1-2 oldest-certified first; stable within ties (registry
    module-load order)."""

    def key(n: str):
        rnd = last.get(n, -1)
        if rnd < 0:
            return (0, rnd)
        return (1 if n in changed else 2, rnd)

    return sorted(names, key=key)


_ROTATION_CACHE: tuple[tuple, list[str]] | None = None


def _rotation_cache_key() -> tuple:
    """Invalidation key (ADVICE r8): the set of CORRECTNESS files and
    their mtimes plus the registered-name count — a long-lived driver
    that writes a new round's file (or registers more queries) gets a
    fresh rotation instead of a process-lifetime stale one."""
    certs = tuple(
        sorted(
            (p.name, p.stat().st_mtime_ns)
            for p in _REPO.glob("CORRECTNESS_r*.json")
        )
    )
    return (certs, len(eng.QUERIES))


def _reset_rotation_cache() -> None:
    """Deliberate invalidation hook for tests and multi-round drivers."""
    global _ROTATION_CACHE
    _ROTATION_CACHE = None


def _rotation_order() -> list[str]:
    """Registry keys in certification-priority order (see module doc).
    Memoized on a CORRECTNESS-mtime key: queries() and oracle_sql() both
    call this in one driver run, and the git sweep (~20 subprocesses)
    cannot change between them — but a new round's cert file landing in
    the same process invalidates the memo (ADVICE r8)."""
    global _ROTATION_CACHE
    key = _rotation_cache_key()
    if _ROTATION_CACHE is None or _ROTATION_CACHE[0] != key:
        last = _last_certified_round()
        _ROTATION_CACHE = (
            key,
            _order(list(eng.QUERIES), last, _changed_since_cert(last)),
        )
    return _ROTATION_CACHE[1]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: reference-parity word count (wc.go) on sf0.001."""
    return eng.QUERIES["mr_wordcount"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: eng.QUERIES[name] for name in _rotation_order()}


def oracle_sql() -> dict[str, str]:
    return {
        name: eng.ORACLES[name] for name in _rotation_order() if name in eng.ORACLES
    }
