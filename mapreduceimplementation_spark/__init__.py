"""PySpark-native analytics engine with the data-processing capabilities of
Nancyp1997/MapReduceImplementation (MIT 6.824 MapReduce lab + KV labs),
re-expressed Spark-first, plus LLM-data-pipeline operators.

See SURVEY.md for the operator inventory and architecture notes.
"""

from mapreduceimplementation_spark.registry import ORACLES, QUERIES, register


def load_all_operators() -> None:
    """Import every operator module so registry decorators run."""
    # Imports are side-effecting (they populate QUERIES/ORACLES).
    from mapreduceimplementation_spark import operators, plans, streaming  # noqa: F401


__all__ = ["QUERIES", "ORACLES", "register", "load_all_operators"]
