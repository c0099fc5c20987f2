"""Driver contract for the spark-graft builder (PySpark target).

Thin view over ``mapreduceimplementation_spark``'s registry: every operator
module self-registers its (spark, sf_dir) -> DataFrame callable and, where
SQL-expressible, a DuckDB oracle (see SURVEY.md §2 for the inventory).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import mapreduceimplementation_spark as eng

eng.load_all_operators()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: reference-parity word count (wc.go) on sf0.001."""
    return eng.QUERIES["mr_wordcount"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(eng.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(eng.ORACLES)
