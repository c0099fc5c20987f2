"""Structured Streaming operators (SURVEY.md §2 D1–D4)."""

from mapreduceimplementation_spark.streaming import (  # noqa: F401
    dedupe,
    joins,
    sessionize,
    windowed,
)
