"""Vector math over array<float|double> columns — zip_with/aggregate,
JVM-side, no UDF.  Cast to double first so results are reproducible and
match a double-precision oracle."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _dbl(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(_dbl(a), _dbl(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(_dbl(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def round6(q: Column) -> Column:
    """6-digit half-AWAY rounding via floor(|q|*1e6 + 0.5)/1e6 — the
    engine-exact replacement for round(q, 6): Spark HALF_UP and DuckDB
    half-even diverge on exact half boundaries (the embedding_outliers
    incident; one flaky embed_normalize fuzz hit), while floor of
    bit-equal doubles cannot.  Off-boundary the value is the identical
    double (floor yields the exact integer, the /1e6 quotient is the
    correctly-rounded nearest double — same as engine round's result)."""
    scaled = q * 1000000.0
    return (
        F.when(scaled < 0, -F.floor(-scaled + F.lit(0.5))).otherwise(
            F.floor(scaled + F.lit(0.5))
        )
        / 1000000.0
    )


def sql_round6(expr: str) -> str:
    """DuckDB twin of ``round6`` — the same floor formula, stated once."""
    return (
        f"(CASE WHEN ({expr}) * 1000000.0 < 0 "
        f"THEN -floor(-(({expr}) * 1000000.0) + 0.5) "
        f"ELSE floor(({expr}) * 1000000.0 + 0.5) END / 1000000.0)"
    )
