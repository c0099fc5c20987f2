"""Relational / event analytics plans (SURVEY.md §2 B*)."""

from mapreduceimplementation_spark.plans import (  # noqa: F401
    events,
    kv,
    lake,
    linz,
    tpch,
)
