"""Cross-engine deterministic numeric helpers.

Double summation is order-dependent, and Spark (partial aggregation over
N partitions) and DuckDB (single-node vectorized) sum in different
orders. For oracle-checked aggregates we therefore sum in DECIMAL —
exact in both engines — and only convert back to double at the end.
The source doubles in the testdata are 2-decimal money values, so a
decimal(18,2) cast is lossless.

Rounding policy: round() may be applied to DECIMAL values (exact,
identical in both engines) but NEVER to doubles — Spark rounds doubles
via exact BigDecimal expansion while DuckDB rounds via float math, and
they disagree on .5-boundary values even for bitwise-identical inputs
(observed on quality_score). Deterministic doubles are emitted raw.

At 100 TB this costs nothing extra: decimal sum is still a map-side
partial aggregate; the cast happens inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(18,2)"
FINE = "decimal(18,6)"


def dsum(col: Column | str, alias: str, scale: int = 2, cast: str = MONEY) -> Column:
    """Exact decimal sum of a money-valued double, rounded + returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(cast)), scale).cast("double").alias(alias)


def dsum_sql(expr: str, alias: str, scale: int = 2, cast: str = MONEY) -> str:
    return f"cast(round(sum(cast({expr} as {cast})), {scale}) as double) as {alias}"


def davg(col: Column | str, alias: str, cast: str = MONEY) -> Column:
    """avg as exact-decimal-sum / count, divided in double — the division
    is a single IEEE op on identical inputs, so the result is bitwise
    identical with davg_sql. NO final round: round(double, n) itself
    differs between engines at .5 boundaries (observed empirically), so
    deterministic doubles are emitted raw."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(cast)).cast("double") / F.count(c)).alias(alias)


def davg_sql(expr: str, alias: str, cast: str = MONEY) -> str:
    return f"cast(sum(cast({expr} as {cast})) as double) / count({expr}) as {alias}"
