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


# round6/sql_round6 live in functions.stable (bit-stable float discipline);
# re-exported here for the vector operators that consume them.
from mapreduceimplementation_spark.functions.stable import round6, sql_round6  # noqa: E402,F401
