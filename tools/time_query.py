"""Isolated per-query timing: noop-sink wall (guide §1.4) next to the
bench's crc-sum action, N reps each, per-query minima.

Usage:
  python tools/time_query.py [-n reps] name [name ...]

SPARK_GRAFT_SF_DIR picks the data dir (default sf0.1).  The noop sink
computes every column of every row and discards it — the computation
floor; the crc action is bench.py's exact timed action (to_json+crc32+agg)
so the two columns separate "the query" from "the bench's forcing cost".
Streaming queries execute their stream inside the callable, so for them
both columns time the same full run.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    args = sys.argv[1:]
    reps = 3
    if args and args[0] == "-n":
        reps = int(args[1])
        args = args[2:]
    names = args

    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F
    from mapreduceimplementation_spark.session import get_spark

    spark = get_spark("time-query")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # same warm-up as bench.py so rep-1 numbers are comparable
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    qs = entrymod.queries()
    for name in names:
        if name not in qs:
            print(f"?? {name}: not registered", file=sys.stderr)
            continue
        noop_best = crc_best = float("inf")
        for rep in range(reps):
            spark.sparkContext.setJobDescription(f"{name} noop rep{rep}")
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            noop = time.time() - t0
            spark.sparkContext.setJobDescription(f"{name} crc rep{rep}")
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.crc32(F.encode(F.to_json(F.struct(*df.columns)), "UTF-8"))
                ).alias("crc"),
            ).collect()
            crc = time.time() - t0
            spark.sparkContext.setJobDescription(None)
            noop_best = min(noop_best, noop)
            crc_best = min(crc_best, crc)
            print(
                f"  {name} rep{rep}: noop {noop:.3f}s crc {crc:.3f}s",
                file=sys.stderr,
            )
        print(f"{name}: noop_min {noop_best:.3f}s crc_min {crc_best:.3f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
