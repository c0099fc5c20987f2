"""Raw text-corpus source — the reference's ingestion path.

The reference coordinator reads whole ``pg-*.txt`` files and hands
(filename, contents) to Map (reference: src/mr/coordinator.go, worker.go).
Spark equivalent: ``wholetext`` text source, one row per file, fully
distributed and split-pruned by the scheduler.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_text_dir(spark: SparkSession, path_glob: str) -> DataFrame:
    """(doc_id=file path, text=file contents) rows for a glob of text files."""
    return (
        spark.read.format("text")
        .option("wholetext", "true")
        .load(path_glob)
        .select(
            F.input_file_name().alias("doc_id"),
            F.col("value").alias("text"),
        )
    )
