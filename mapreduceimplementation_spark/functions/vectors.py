"""Vector math over array<float|double> columns — zip_with/aggregate,
JVM-side, no UDF.  Cast to double first so results are reproducible and
match a double-precision oracle."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _dbl(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column | str, b: Column | str, dim: int | None = None) -> Column:
    """<a, b> as the exact left-fold sum 0.0 + a1*b1 + a2*b2 + ...

    With ``dim`` (a statically-known vector width) the fold is UNROLLED
    into a whole-stage-codegen add chain performing the IDENTICAL IEEE
    op sequence (same order, same 0.0 seed), so values are bit-equal;
    element_at past the end yields NULL, matching the oracle's
    range(1, dim+1) indexing.

    MEASURED GUIDANCE (r10 A/B at sf0.1): unrolling is a WIN only for
    small widths (the 17-term classifier dot cut its query 2x); at
    dim=64 the optimizer + per-stage codegen cost of the ~200-node tree
    made knn_graph/dedup_semantic ~2x SLOWER end-to-end.  Leave 64-dim
    call sites on the default fold."""
    if dim is not None:
        ac, bc = _dbl(a), _dbl(b)
        acc = F.lit(0.0)
        for j in range(1, dim + 1):
            acc = acc + F.element_at(ac, j) * F.element_at(bc, j)
        return acc
    return F.aggregate(
        F.zip_with(_dbl(a), _dbl(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str, dim: int | None = None) -> Column:
    """sqrt of the exact left-fold 0.0 + x1*x1 + ... (see dot on why
    ``dim`` unrolls the fold into codegen arithmetic)."""
    if dim is not None:
        ac = _dbl(a)
        acc = F.lit(0.0)
        for j in range(1, dim + 1):
            x = F.element_at(ac, j)
            acc = acc + x * x
        return F.sqrt(acc)
    return F.sqrt(
        F.aggregate(_dbl(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column | str, b: Column | str, dim: int | None = None) -> Column:
    return dot(a, b, dim) / (l2_norm(a, dim) * l2_norm(b, dim))


# round6/sql_round6 live in functions.stable (bit-stable float discipline);
# re-exported here for the vector operators that consume them.
from mapreduceimplementation_spark.functions.stable import round6, sql_round6  # noqa: E402,F401
