"""Structured Streaming operators (SURVEY.md §2 D1–D7)."""

from mapreduceimplementation_spark.streaming import (  # noqa: F401
    dedupe,
    enrich,
    incremental,
    joins,
    sessionize,
    windowed,
)
