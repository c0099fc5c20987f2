"""Bit-stable float aggregation.

Double sums depend on reduction order, which on a cluster depends on
partitioning and scheduling — so a re-run (or the reference, or an oracle)
can disagree in the last ulps.  We sum as exact DECIMAL (per-row double →
decimal cast is order-independent), then cast the exact result back to
double.  Identical results at 1 partition or 10 000 — and in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DEC = "decimal(27,6)"


def dsum(col: Column | str) -> Column:
    """Order-independent sum of a double column (exact decimal internally)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_DEC)).cast("double")


def davg(col: Column | str, digits: int = 6) -> Column:
    """Order-independent mean, rounded to `digits` decimals."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(
        F.sum(c.cast(_DEC)).cast("double") / F.count(c), digits
    )


def sql_dsum(expr: str) -> str:
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(27,6))) AS DOUBLE)"


def sql_davg(expr: str, digits: int = 6) -> str:
    return (
        f"ROUND(CAST(SUM(CAST(({expr}) AS DECIMAL(27,6))) AS DOUBLE)"
        f" / COUNT({expr}), {digits})"
    )
