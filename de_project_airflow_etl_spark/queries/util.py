"""Determinism helpers shared by query implementations.

Double-precision SUM/AVG results depend on accumulation order, which
differs between Spark's partial+final hash aggregate and DuckDB's
scan-order aggregate. The testdata's monetary columns carry at most two
decimal digits (FIXTURES.md), so scaling them to exact int64 cents makes
the aggregate exact AND keeps the hot loop in whole-stage-codegen long
arithmetic (a DECIMAL(30+) accumulator would fall back to per-row
BigDecimal). Casting the exact integer result back to DOUBLE is
deterministic on both engines (sums stay far below 2^63; DuckDB
accumulates BIGINT into HUGEINT, Spark into BIGINT — both exact).
Oracles use the same construction.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column | str, alias: str) -> Column:
    """Order-insensitive exact SUM over a monetary double column."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(cents(c)).cast("double") / F.lit(100)).alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Deterministic AVG: exact cents sum, then one double division."""
    c = F.col(col) if isinstance(col, str) else col
    return ((F.sum(cents(c)).cast("double") / F.lit(100)) / F.count(c)).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM({sql_cents(expr)}) AS DOUBLE) / 100 AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return (f"CAST(SUM({sql_cents(expr)}) AS DOUBLE) / 100"
            f" / COUNT({expr}) AS {alias}")


# Multi-factor products (e.g. price * (1-discount) * (1+tax)) overflow
# DECIMAL(38) and would be rounded engine-specifically. Instead scale the
# 2-decimal inputs to exact BIGINTs, do all arithmetic in int64 (exact,
# order-insensitive), and divide once at the end.

def cents(col: Column | str) -> Column:
    """price -> integer cents (exact for 2-decimal data)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


def sql_cents(expr: str) -> str:
    return f"CAST(ROUND({expr} * 100) AS BIGINT)"
