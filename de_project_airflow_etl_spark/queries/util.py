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


# ---------------------------------------------------- distributed rank

RANK_BUCKETS = 32        # level-1 value-range buckets
RANK_OVERSIZE = 4        # re-split buckets holding > OVERSIZE * n/K rows


def global_row_number(df, value_col: str, tiebreak: str, out: str,
                      descending: bool = False, adaptive: bool = True):
    """Exact global ROW_NUMBER() OVER (ORDER BY value [DESC], tiebreak)
    with no unpartitioned window — adaptive two-level value-range
    bucketing:

    1. Equal-width buckets over [min, max] of the (monotone) sort
       position, so every row in bucket b sorts before every row in
       b+1 under the requested direction.
    2. Long-tailed distributions defeat equal width (most rows land in
       one bucket), so any bucket holding more than OVERSIZE * n/K
       rows is re-split: by value range within the bucket's own
       [min, max] span when it spans more than one distinct value, or
       by TIEBREAK range when it is a point mass — all its rows share
       one value, so within-bucket order is tiebreak-only and a
       tiebreak split preserves the total order exactly.
    3. Per-(b1, b2) counts prefix-sum into broadcast offsets (the only
       unpartitioned window, <= K^2 rows); global rank = offset +
       row_number over the (b1, b2)-partitioned window.

    The worst residual task after one re-split holds ~n/K^2 rows times
    the tail factor within one sub-range; pathological inputs needing
    deeper recursion would nest the same step. ``adaptive=False``
    skips the re-split pass (one fewer full-data aggregate) for axes
    the caller KNOWS are bounded-range and roughly spread (e.g.
    document length); long-tailed or point-mass-prone axes (spend,
    frequency) must keep it. Preconditions: value
    and tiebreak are non-null numerics (engines disagree on NULL
    placement in ORDER BY anyway) and tiebreak is unique per row.
    Bucketing only needs monotonicity, not cross-engine exactness —
    correctness rests on the within-bucket sort over the true columns.
    """
    from pyspark.sql import Window

    K = RANK_BUCKETS
    v = F.col(value_col).cast("double")
    t = F.col(tiebreak).cast("double")
    stats = df.agg(F.min(v).alias("__mn"), F.max(v).alias("__mx"),
                   F.count(F.lit(1)).alias("__n"))

    def _bucket(pos, lo, hi):
        span = hi - lo + F.lit(1.0)
        return (F.least(F.lit(K - 1), F.floor((pos - lo) * K / span))
                 .cast("int"))

    pos1 = (F.col("__mx") - v) if descending else v
    lo1 = F.lit(0.0) if descending else F.col("__mn")
    hi1 = (F.col("__mx") - F.col("__mn")) if descending else F.col("__mx")
    bucketed = (df.crossJoin(F.broadcast(stats))
                  .withColumn("__b1", _bucket(pos1, lo1, hi1)))
    if not adaptive:
        split = bucketed.withColumn("__b2", F.lit(0))
    else:
        bucketed = bucketed.localCheckpoint(eager=False)  # 3 consumers
        bstats = (bucketed.groupBy("__b1")
                          .agg(F.count(F.lit(1)).alias("__bn"),
                               F.min(v).alias("__bvmn"),
                               F.max(v).alias("__bvmx"),
                               F.min(t).alias("__btmn"),
                               F.max(t).alias("__btmx")))
        # level-2 split: value-range inside the bucket's own span, or
        # tiebreak-range for a point-mass bucket; small buckets stay
        # whole
        pos2v = (F.col("__bvmx") - v) if descending else v
        lo2v = F.lit(0.0) if descending else F.col("__bvmn")
        hi2v = ((F.col("__bvmx") - F.col("__bvmn")) if descending
                else F.col("__bvmx"))
        b2 = (F.when(F.col("__bn") * K <= F.col("__n") * RANK_OVERSIZE,
                     F.lit(0))
               .when(F.col("__bvmn") < F.col("__bvmx"),
                     _bucket(pos2v, lo2v, hi2v))
               .otherwise(_bucket(t, F.col("__btmn"), F.col("__btmx"))))
        split = (bucketed.join(F.broadcast(bstats), "__b1")
                         .withColumn("__b2", b2))

    counts = split.groupBy("__b1", "__b2").agg(F.count(F.lit(1)).alias("__c"))
    offsets = (counts.withColumn(
                   "__off",
                   F.coalesce(
                       F.sum("__c").over(
                           Window.orderBy("__b1", "__b2")
                                 .rowsBetween(Window.unboundedPreceding, -1)),
                       F.lit(0)))
                     .select("__b1", "__b2", "__off"))
    order = [F.desc(value_col) if descending else F.asc(value_col),
             F.asc(tiebreak)]
    local = Window.partitionBy("__b1", "__b2").orderBy(*order)
    drops = ["__b1", "__b2", "__off", "__mn", "__mx", "__n"]
    if adaptive:
        drops += ["__bn", "__bvmn", "__bvmx", "__btmn", "__btmx"]
    return (split.join(F.broadcast(offsets), ["__b1", "__b2"])
                 .withColumn(out, F.row_number().over(local) + F.col("__off"))
                 .drop(*drops))
