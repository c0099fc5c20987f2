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
    """Names whose defining module's last git change postdates the commit
    that added their certifying CORRECTNESS file (plus anything with
    uncommitted edits).  Empty set on any git failure — the rotation
    then degrades to plain recency, never breaks."""
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
        cert_time: dict[int, int] = {}
        file_time: dict[str, int] = {}
        changed = set()
        for name in eng.QUERIES:
            rnd = last.get(name)
            if rnd is None:
                continue  # never certified: already bucket 0
            src = inspect.getfile(eng.QUERIES[name])
            rel = str(Path(src).resolve().relative_to(_REPO))
            if rel in dirty:
                changed.add(name)
                continue
            if rel not in file_time:
                out = _git("log", "-1", "--format=%ct", "--", rel)
                file_time[rel] = int(out) if out else 0
            if rnd not in cert_time:
                out = _git(
                    "log",
                    "--diff-filter=A",
                    "-1",
                    "--format=%ct",
                    "--",
                    f"CORRECTNESS_r{rnd:02d}.json",
                )
                cert_time[rnd] = int(out) if out else 0
            if file_time[rel] > cert_time[rnd] > 0:
                changed.add(name)
        return frozenset(changed)
    except Exception:
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


_ROTATION_CACHE: list[str] | None = None


def _rotation_order() -> list[str]:
    """Registry keys in certification-priority order (see module doc).
    Memoized per process: queries() and oracle_sql() both call this in
    one driver run, and the git sweep (~20 subprocesses) cannot change
    between them."""
    global _ROTATION_CACHE
    if _ROTATION_CACHE is None:
        last = _last_certified_round()
        _ROTATION_CACHE = _order(
            list(eng.QUERIES), last, _changed_since_cert(last)
        )
    return _ROTATION_CACHE


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: reference-parity word count (wc.go) on sf0.001."""
    return eng.QUERIES["mr_wordcount"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: eng.QUERIES[name] for name in _rotation_order()}


def oracle_sql() -> dict[str, str]:
    return {
        name: eng.ORACLES[name] for name in _rotation_order() if name in eng.ORACLES
    }
