"""Relational / event analytics plans (SURVEY.md §2 B*)."""

from mapreduceimplementation_spark.plans import events, kv, lake, tpch  # noqa: F401
