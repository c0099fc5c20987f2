"""Operator modules — importing this package registers all queries."""

from mapreduceimplementation_spark.operators import (  # noqa: F401
    dedup,
    mrcore,
    mapreduce,
    multimodal,
    pipeline,
    retrieval,
    textmetrics,
    vectors,
)
