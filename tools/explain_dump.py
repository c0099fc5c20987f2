"""Dump `.explain("formatted")` for registered batch queries to files.

Usage:
  python tools/explain_dump.py <out_dir> <suffix> [name ...]

Writes <out_dir>/<name>_<suffix>.txt for each requested batch query
(streaming_* callables EXECUTE their stream when called, so they are
skipped unless explicitly named).  With no names, dumps every batch
query.  SPARK_GRAFT_SF_DIR picks the data directory (default sf0.1 —
plan capture is planning-only; building the DataFrame may still run
the small driver-side jobs some operators do, e.g. trained models).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    out_dir = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:]

    import __spark_entry__ as entrymod
    from mapreduceimplementation_spark.session import get_spark

    spark = get_spark("explain-dump")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    qs = entrymod.queries()
    todo = names or [n for n in qs if not n.startswith("streaming_")]
    os.makedirs(out_dir, exist_ok=True)
    failures = 0
    for name in todo:
        if name not in qs:
            print(f"?? {name}: not registered", file=sys.stderr)
            failures += 1
            continue
        if not names and name.startswith("streaming_"):
            continue
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(out_dir, f"{name}_{suffix}.txt")
            with open(path, "w") as fh:
                fh.write(buf.getvalue())
            print(f"ok {name} -> {path}")
        except Exception as exc:
            failures += 1
            print(f"FAIL {name}: {type(exc).__name__}: {exc}", file=sys.stderr)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
