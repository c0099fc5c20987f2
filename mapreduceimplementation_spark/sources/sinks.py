"""Output sinks — the write-side scale discipline.

The reference's only sink is ``mr-out-N`` text part-files (worker.go,
implemented in sources/text.py write_mr_out).  A modern analytics engine
additionally needs partitioned columnar output: data laid out so the NEXT
job's scans prune at the directory level.  At 100 TB, writing
``.../event_type=click/date=2024-01-07/part-*.parquet`` is what turns a
downstream full scan into a handful of file reads — partition pruning is
decided at write time, not read time.

Rules encoded here (and asserted by tests/test_sinks.py):

- partition columns must be low-cardinality (a bounded dim or a date
  bucket) — partitioning by a high-cardinality key creates one directory
  per value and kills the filesystem;
- the in-file sort by the partition columns keeps each task writing few
  open files at once (maxRecordsPerFile-style memory discipline);
- a read-back with a partition-column filter must show PartitionFilters
  (not PushedFilters) in the scan — pruning happens before I/O.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (re-export convenience)


def write_partitioned(
    df: DataFrame, path: str, *partition_cols: str, mode: str = "overwrite"
) -> None:
    """Write ``df`` as hive-partitioned parquet under ``path``.

    sortWithinPartitions on the partition columns means each write task
    holds ONE open file per (its own) partition-value run instead of one
    per distinct value — the difference between bounded and unbounded
    writer memory on a 1000-file task."""
    if not partition_cols:
        raise ValueError("write_partitioned requires at least one partition column")
    (
        df.sortWithinPartitions(*partition_cols)
        .write.mode(mode)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read back a hive-partitioned dataset (partition columns recovered
    from directory names)."""
    return spark.read.parquet(path)


def compact(
    df: DataFrame,
    path: str,
    target_rows_per_file: int,
    *,
    mode: str = "overwrite",
) -> None:
    """Rewrite ``df`` as parquet with bounded, roughly-uniform file sizes —
    the small-files compaction job every long-lived 100 TB table needs
    (streaming ingestion and fine-grained partitioning both accrete
    thousands of KB-sized files; scans then pay per-file open/footer cost
    that dwarfs the I/O).

    Two dials, both required for bounded output:

    - ``repartition(ceil(n / target))`` sets the number of write tasks —
      a round-robin exchange, so files come out uniform even when the
      input partitioning was skewed;
    - ``maxRecordsPerFile`` caps any single file as a backstop (a task
      can still receive more rows than target when the input count
      estimate is off — the cap turns that into an extra file, not a
      giant one).

    Row-count is the proxy for size here because it is exactly
    computable; production compactors aim at bytes
    (spark.sql.files.maxRecordsPerFile + target file size on the table
    format's side).
    """
    n = df.count()
    n_files = max(1, -(-n // target_rows_per_file))
    (
        df.repartition(n_files)
        .write.mode(mode)
        .option("maxRecordsPerFile", target_rows_per_file)
        .parquet(path)
    )
