"""Whole-surface physical-plan audit: one summary line per registered query.

For every batch query (streaming sinks are skipped — building their plan
executes the stream) this prints scan count, exchange count, join
strategies, and whether a CartesianProduct appears — the table SURVEY §6's
plan review is based on.  Run after plan-affecting changes; the pytest
plan gates pin the load-bearing shapes, this tool is for eyeballing the
rest.

Usage: python tools/plan_audit.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import mapreduceimplementation_spark as eng
    from mapreduceimplementation_spark.session import get_spark

    eng.load_all_operators()
    spark = get_spark("plan-audit")

    print(f"{'query':34} {'scans':>5} {'exch':>4} {'bhj':>3} {'bnlj':>4} {'smj':>3} cartesian")
    bad = []
    for name in sorted(eng.QUERIES):
        if only and name not in only:
            continue
        if name.startswith("streaming_"):
            print(f"{name:34}  (skipped: streaming)")
            continue
        df = eng.QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        p = buf.getvalue()
        scans = len(re.findall(r"^Location:", p, re.M)) or p.count("Location:")
        cart = "YES" if "CartesianProduct" in p else "-"
        if cart == "YES":
            bad.append(name)
        print(
            f"{name:34} {scans:>5} {p.count('Exchange '):>4}"
            f" {p.count('BroadcastHashJoin'):>3}"
            f" {p.count('BroadcastNestedLoopJoin'):>4}"
            f" {p.count('SortMergeJoin'):>3} {cart:>9}"
        )
    if bad:
        print(f"\nCARTESIAN PRODUCTS: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
