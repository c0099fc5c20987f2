"""Structured Streaming operators (SURVEY.md §2 D1–D2)."""

from mapreduceimplementation_spark.streaming import (  # noqa: F401
    sessionize,
    windowed,
)
