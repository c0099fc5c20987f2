"""Raw text-corpus source — the reference's ingestion path.

The reference coordinator reads whole ``pg-*.txt`` files and hands
(filename, contents) to Map (reference: src/mr/coordinator.go, worker.go).
Spark equivalent: ``wholetext`` text source, one row per file, fully
distributed and split-pruned by the scheduler.
"""

from __future__ import annotations

import os
import tempfile

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


def materialize_text_corpus(sf_dir: str) -> str:
    """One .txt file per document row — the reference's pg-*.txt layout.

    The driver testdata ships documents as parquet only; the reference's
    ingestion surface is whole text files.  This materializes them once
    (driver-side, marker-guarded) into a deterministic temp dir so the
    wholetext read path can be exercised and oracle-checked.  This is test
    fixture preparation, not part of the measured operator — a production
    corpus already IS files."""
    name = os.path.basename(sf_dir.rstrip("/")) or "sf"
    d = os.path.join(tempfile.gettempdir(), f"mri_spark_textcorpus_{name}")
    marker = os.path.join(d, "_SUCCESS")
    if os.path.exists(marker):
        return d
    import pyarrow.parquet as pq

    os.makedirs(d, exist_ok=True)
    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        if text is None:
            continue
        with open(os.path.join(d, f"doc-{doc_id:08d}.txt"), "w") as f:
            f.write(text)
    with open(marker, "w"):
        pass
    return d
