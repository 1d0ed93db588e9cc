"""Exact (order-independent) cross-engine numeric aggregates.

Floating-point SUM/AVG depend on accumulation order, which differs between
Spark (partial aggregation across shuffle partitions) and any single-node
oracle. To make differential testing bit-exact WITHOUT weakening the check
to "approximately equal", every floating aggregate in the oracle-checked
query suite routes through fixed-point decimals:

    double --cast--> decimal(27, s)   (deterministic round-to-nearest: a
                                       double is never exactly on a decimal
                                       tie point, so HALF_UP vs HALF_EVEN
                                       cannot diverge)
    decimal sum                        (exact, associative, order-free)
    --cast--> double                   (deterministic)

The same construction is expressible in ANSI SQL, so DuckDB computes the
identical bits. This mirrors how production warehouses aggregate money
columns; decimal(27+10,4) has ~23 integer digits of headroom, enough for
sums over 100 TB of rows.

Numeric contract: inputs are FIXED-POINT data (money/measure values
exactly representable at scale <= 4), which is what every oracle-checked
column in the suite carries. For arbitrary doubles, the double->decimal
rounding PATH differs between engines — Spark rounds the shortest decimal
string representation (Java ``BigDecimal.valueOf``) while DuckDB rounds
the binary value scaled by 10^s — so a double lying within half an ulp of
a decimal tie point (e.g. 3435974.5858500004) can legally round to
different scale-4 decimals. Fixed-point inputs are never in that band:
both paths recover the exact stored value.

AVG is decimal-sum divided by COUNT in double: one deterministic IEEE
division on identical inputs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SCALE = 4


def dec(col: Column, scale: int = SCALE) -> Column:
    """Cast to the engine's fixed-point type for exact accumulation."""
    return col.cast(f"decimal(27,{scale})")


def dsum(col: Column, alias: str, scale: int = SCALE) -> Column:
    """Exact SUM of a floating column, returned as double."""
    return F.sum(dec(col, scale)).cast("double").alias(alias)


def davg(col: Column, alias: str, scale: int = SCALE) -> Column:
    """Exact-AVG: decimal sum / count, one double division."""
    return (F.sum(dec(col, scale)).cast("double") / F.count(col)).alias(alias)


def sql_dsum(expr: str, alias: str, scale: int = SCALE) -> str:
    """DuckDB twin of :func:`dsum`."""
    return (f"CAST(SUM(CAST(({expr}) AS DECIMAL(27,{scale}))) AS DOUBLE)"
            f" AS {alias}")


def sql_davg(expr: str, alias: str, scale: int = SCALE) -> str:
    """DuckDB twin of :func:`davg`."""
    return (f"CAST(SUM(CAST(({expr}) AS DECIMAL(27,{scale}))) AS DOUBLE)"
            f" / COUNT({expr}) AS {alias}")
