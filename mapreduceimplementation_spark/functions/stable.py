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
    """Order-independent mean, half-away-floored to `digits` decimals
    (see round6: engine round() double-rounding diverges cross-engine)."""
    c = F.col(col) if isinstance(col, str) else col
    scale = float(10**digits)
    q = F.sum(c.cast(_DEC)).cast("double") / F.count(c)
    scaled = q * scale
    return (
        F.when(scaled < 0, -F.floor(-scaled + F.lit(0.5))).otherwise(
            F.floor(scaled + F.lit(0.5))
        )
        / scale
    )


def sql_dsum(expr: str) -> str:
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(27,6))) AS DOUBLE)"


def sql_davg(expr: str, digits: int = 6) -> str:
    scale = float(10**digits)
    q = (
        f"CAST(SUM(CAST(({expr}) AS DECIMAL(27,6))) AS DOUBLE)"
        f" / COUNT({expr})"
    )
    return (
        f"(CASE WHEN ({q}) * {scale} < 0 "
        f"THEN -floor(-(({q}) * {scale}) + 0.5) "
        f"ELSE floor(({q}) * {scale} + 0.5) END / {scale})"
    )


def round6(q: Column) -> Column:
    """6-digit half-AWAY rounding via floor(|q|*1e6 + 0.5)/1e6 — the
    engine-exact replacement for round(q, 6).

    Why engine round() is unsafe cross-engine: Spark rounds the EXACT
    decimal expansion of the double (BigDecimal HALF_UP) while DuckDB
    multiplies by 1e6 in doubles first — a double-rounding divergence.
    Measured: 532981/640 → Spark 832.782812, DuckDB 832.782813 (the
    exact decimal is just under the half; the double product lands
    exactly ON it).  Plausible count-ratio inputs hit this at ~1e-6
    rate — a certainty over a 100 TB corpus (the embedding_outliers
    incident was this class).  floor(|q·1e6| + 0.5) is computed in
    identical double ops on both engines, so it CANNOT diverge; the
    final /1e6 is a correctly-rounded quotient, bit-equal either side.
    Off-boundary the value equals engine round()'s result, so adopting
    it preserves every previously-certified hash."""
    return half_away(q, 6)


def sql_round6(expr: str) -> str:
    """DuckDB twin of ``round6`` — the same floor formula, stated once."""
    return sql_half_away(expr, 6)


def half_away(q: Column, digits: int) -> Column:
    """floor-based half-away rounding at 10^-digits grain (see round6)."""
    scale = float(10**digits)
    scaled = q * F.lit(scale)
    return (
        F.when(scaled < 0, -F.floor(-scaled + F.lit(0.5))).otherwise(
            F.floor(scaled + F.lit(0.5))
        )
        / F.lit(scale)
    )


def py_half_away(q: float, digits: int) -> float:
    """Pure-Python twin of ``half_away`` for Arrow-kernel operators —
    Python floats ARE IEEE doubles and math.floor is the same floor, so
    the op sequence (one product, one conditional floor, one division by
    an exact power of ten) is bit-identical to the Column form.  ONE
    definition per engine: a drifted kernel copy would move rounding
    frontiers."""
    import math

    scale = float(10**digits)
    scaled = q * scale
    if scaled < 0:
        v = -math.floor(-scaled + 0.5)
    else:
        v = math.floor(scaled + 0.5)
    return v / scale


def sql_half_away(expr: str, digits: int) -> str:
    """DuckDB twin of ``half_away`` — identical double ops, stated once."""
    scale = float(10**digits)
    return (
        f"(CASE WHEN ({expr}) * {scale} < 0 "
        f"THEN -floor(-(({expr}) * {scale}) + 0.5) "
        f"ELSE floor(({expr}) * {scale} + 0.5) END / {scale})"
    )
