"""Round-8 staged queries: time-series diagnostics over the daily
revenue rollup, distribution statistics, text-richness metrics and
graded retrieval evaluation (see staged/__init__.py for the
window-arithmetic rationale).

Same contract as registered queries: ``(spark, sf_dir) -> DataFrame``
plus an exact DuckDB oracle, identical column aliases on both sides,
exact-integer / fixed-point arithmetic for anything accumulated, a
100 TB plan story per docstring, no ``rand()``, no ``.collect()``.

Cross-engine determinism rules this bank leans on (measured this
round, 20k-value probe): IEEE sqrt is CORRECTLY ROUNDED and therefore
bit-identical between the JVM and DuckDB, but ln/log2/exp are NOT
(0.9-38 % of integer inputs differ in the last ulp). So every
statistic here is built from +-*/ and sqrt only — Hellinger distance
instead of a KL/PSI drift score, explicit ``m2 * sqrt(m2)`` instead
of ``pow(m2, 1.5)`` for the skewness denominator, and NDCG's
``1/log2(rank+1)`` discounts precomputed ONCE in Python and inlined
as identical double literals into both engines.

Sequential folds over DAY-ORDERED arrays extend round-7b's sorted-
fold idiom: both engines build the same day-ascending array (Spark
``array_sort(collect_list(struct(day, v)))``; DuckDB ``list(v ORDER
BY day)``) and fold it left-to-right from an explicit seed, so sums
of per-day double terms (residual products, central-moment powers)
are bit-identical. The arrays are CALENDAR-BOUNDED — never data-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from de_project_airflow_etl_spark.staged import staged_query
from de_project_airflow_etl_spark.tables import load

_CENTS = "CAST(ROUND(value * 100) AS BIGINT)"


def _wide(col: str) -> str:
    """Wide exact integer -> double through the decimal string (the
    established route when magnitudes can pass 2^53)."""
    return f"CAST(CAST({col} AS STRING) AS DOUBLE)"


# Daily close/volume via deterministic (ts, event_id) row order — the
# daily_ohlc_bars convention (queries/features.py): event_id breaks
# timestamp ties so retries agree.
_SQL_DAILY_OHLC = f"""
        e AS (
          SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, ts, event_id,
                 {_CENTS} AS c
          FROM events
        ),
        r AS (
          SELECT *,
                 row_number() OVER (PARTITION BY day
                                    ORDER BY ts, event_id) AS rn_o,
                 row_number() OVER (PARTITION BY day
                                    ORDER BY ts DESC, event_id DESC)
                   AS rn_c
          FROM e
        ),
        ohlc AS (
          SELECT day,
                 MAX(CASE WHEN rn_o = 1 THEN c END) AS open_c,
                 CAST(MAX(c) AS BIGINT) AS high_c,
                 CAST(MIN(c) AS BIGINT) AS low_c,
                 MAX(CASE WHEN rn_c = 1 THEN c END) AS close_c,
                 CAST(COUNT(*) AS BIGINT) AS volume
          FROM r GROUP BY day
        )"""


def _spark_daily_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC bars as ONE map-side-combinable aggregate: min_by /
    max_by over the (ts, event_id) struct replaces the oracle's
    row_number windows, so no window ever touches raw rows — the
    stronger 100 TB shape (partial aggregation per map task, one
    exchange on day)."""
    e = load(spark, sf_dir, "events").selectExpr(
        "CAST(CAST(ts AS DATE) AS STRING) AS day", "ts", "event_id",
        f"{_CENTS} AS c")
    return e.groupBy("day").agg(
        F.expr("min_by(c, struct(ts, event_id))").alias("open_c"),
        F.max("c").alias("high_c"),
        F.min("c").alias("low_c"),
        F.expr("max_by(c, struct(ts, event_id))").alias("close_c"),
        F.count(F.lit(1)).alias("volume"))


# ------------------------------------- ATR(14) over daily value bars

ATR_W = 14

_TR = ("GREATEST(high_c - low_c, ABS(high_c - prev_close),"
       " ABS(low_c - prev_close))")


@staged_query(
    "atr_daily_value_range",
    oracle=f"""
        WITH {_SQL_DAILY_OHLC},
        l AS (
          SELECT day, high_c, low_c, close_c,
                 lag(close_c) OVER (ORDER BY day) AS prev_close
          FROM ohlc
        ),
        tr AS (
          SELECT day, CAST({_TR} AS BIGINT) AS tr_cents
          FROM l WHERE prev_close IS NOT NULL
        ),
        w AS (
          SELECT day, tr_cents,
                 CAST(COUNT(*) OVER win AS BIGINT) AS n,
                 SUM(CAST(tr_cents AS DECIMAL(38,0))) OVER win AS s
          FROM tr
          WINDOW win AS (ORDER BY day
            ROWS BETWEEN {ATR_W - 1} PRECEDING AND CURRENT ROW)
        )
        SELECT day, tr_cents,
               {_wide('s')} / {ATR_W} / 100 AS atr
        FROM w WHERE n = {ATR_W}
    """,
    doc="Average True Range (Wilder's SMA variant, 14-day) over the "
        "daily value bars: true range folds the overnight gap into "
        "the volatility estimate via the previous close, the reading "
        "every band/breakout monitor (Keltner, chandelier exits) "
        "derives from. True ranges are exact integer cents; the "
        "rolling sum rides DECIMAL(38,0); the single division to "
        "dollars happens at emit. Complete windows only. Plan: daily "
        "bars come from ONE map-side-combinable min_by/max_by "
        "aggregate (no window touches raw rows, unlike the oracle's "
        "row_number form); the lag and trailing-sum windows run over "
        "the calendar-bounded daily table.",
    tags=("staged", "timeseries",),
)
def atr_daily_value_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    ohlc = _spark_daily_ohlc(spark, sf_dir)
    lagw = Window.orderBy("day")
    lagged = ohlc.select(
        "day", "high_c", "low_c", "close_c",
        F.lag("close_c").over(lagw).alias("prev_close"))
    tr = (lagged.filter(F.col("prev_close").isNotNull())
                .selectExpr("day", f"CAST({_TR} AS BIGINT) AS tr_cents"))
    win = (Window.orderBy("day")
                 .rowsBetween(-(ATR_W - 1), Window.currentRow))
    w = tr.select(
        "day", "tr_cents",
        F.count(F.lit(1)).over(win).cast("long").alias("n"),
        F.sum(F.col("tr_cents").cast("decimal(38,0)")).over(win)
         .alias("s"))
    return (w.filter(F.col("n") == ATR_W)
             .selectExpr("day", "tr_cents",
                         f"{_wide('s')} / {ATR_W} / 100 AS atr"))


# ----------------------------- stochastic oscillator on daily closes

STOCH_W = 14

# 100*(close-lo) stays integral (exact); ONE double division after.
# (A 100.0 literal parses as DECIMAL in both engines, and their
# decimal division scales differ in the last ulp — measured.)
_PCT_K = (f"CASE WHEN hi{STOCH_W} = lo{STOCH_W} THEN CAST(NULL AS DOUBLE)"
          f" ELSE CAST(100 * (close_c - lo{STOCH_W}) AS DOUBLE)"
          f" / (hi{STOCH_W} - lo{STOCH_W}) END")


@staged_query(
    "stochastic_oscillator_daily",
    oracle=f"""
        WITH {_SQL_DAILY_OHLC},
        w AS (
          SELECT day, close_c,
                 CAST(COUNT(*) OVER win AS BIGINT) AS n,
                 CAST(MAX(high_c) OVER win AS BIGINT) AS hi{STOCH_W},
                 CAST(MIN(low_c) OVER win AS BIGINT) AS lo{STOCH_W}
          FROM ohlc
          WINDOW win AS (ORDER BY day
            ROWS BETWEEN {STOCH_W - 1} PRECEDING AND CURRENT ROW)
        ),
        k AS (
          SELECT day, {_PCT_K} AS pct_k
          FROM w WHERE n = {STOCH_W}
        ),
        d AS (
          SELECT day, pct_k,
                 lag(pct_k, 1) OVER (ORDER BY day) AS k1,
                 lag(pct_k, 2) OVER (ORDER BY day) AS k2
          FROM k
        )
        SELECT day, pct_k,
               ((pct_k + k1) + k2) / 3 AS pct_d
        FROM d WHERE k2 IS NOT NULL
    """,
    doc="Stochastic oscillator %K/%D over daily closes: %K locates "
        "the close inside the trailing 14-day high-low envelope "
        "(integer cents; one double division), %D smooths it with an "
        "explicit 3-term mean written as ((k + lag1) + lag2)/3 — a "
        "FIXED left-to-right association both engines evaluate "
        "identically, deliberately NOT a windowed SUM over doubles "
        "(DuckDB may combine window aggregates via segment tree, not "
        "sequentially — the round-7b running-sum caveat). Plan: one "
        "min_by/max_by daily aggregate, then lag/extrema frame "
        "windows over the calendar-bounded daily table.",
    tags=("staged", "timeseries",),
)
def stochastic_oscillator_daily(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    ohlc = _spark_daily_ohlc(spark, sf_dir)
    win = (Window.orderBy("day")
                 .rowsBetween(-(STOCH_W - 1), Window.currentRow))
    w = ohlc.select(
        "day", "close_c",
        F.count(F.lit(1)).over(win).cast("long").alias("n"),
        F.max("high_c").over(win).cast("long").alias(f"hi{STOCH_W}"),
        F.min("low_c").over(win).cast("long").alias(f"lo{STOCH_W}"))
    k = (w.filter(F.col("n") == STOCH_W)
          .selectExpr("day", f"{_PCT_K} AS pct_k"))
    lagw = Window.orderBy("day")
    d = k.select("day", "pct_k",
                 F.lag("pct_k", 1).over(lagw).alias("k1"),
                 F.lag("pct_k", 2).over(lagw).alias("k2"))
    return (d.filter(F.col("k2").isNotNull())
             .selectExpr("day", "pct_k",
                         "((pct_k + k1) + k2) / 3 AS pct_d"))


# ------------------------------- on-balance volume over daily closes


@staged_query(
    "obv_daily_value_flow",
    oracle=f"""
        WITH {_SQL_DAILY_OHLC},
        l AS (
          SELECT day, close_c, volume,
                 lag(close_c) OVER (ORDER BY day) AS prev_close
          FROM ohlc
        ),
        d AS (
          SELECT day, volume,
                 CAST(CASE WHEN close_c > prev_close THEN 1
                           WHEN close_c < prev_close THEN -1
                           ELSE 0 END AS BIGINT) AS direction
          FROM l WHERE prev_close IS NOT NULL
        )
        SELECT day, direction, volume,
               CAST(SUM(direction * volume) OVER (ORDER BY day
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS obv
        FROM d
    """,
    doc="On-balance volume over the daily bars: each day's event "
        "count flows in or out with the sign of the close-to-close "
        "move, and the running total is the classic volume-confirms-"
        "trend indicator. The running window sum is INTEGER, so it "
        "is order-independent and safe cross-engine (the running-sum "
        "caveat only bites double accumulators). Plan: one "
        "map-side-combinable daily aggregate, then lag + running-sum "
        "windows over the calendar-bounded daily table.",
    tags=("staged", "timeseries",),
)
def obv_daily_value_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    ohlc = _spark_daily_ohlc(spark, sf_dir)
    lagw = Window.orderBy("day")
    lagged = ohlc.select(
        "day", "close_c", "volume",
        F.lag("close_c").over(lagw).alias("prev_close"))
    d = (lagged.filter(F.col("prev_close").isNotNull())
               .selectExpr(
                   "day", "volume",
                   "CAST(CASE WHEN close_c > prev_close THEN 1"
                   " WHEN close_c < prev_close THEN -1"
                   " ELSE 0 END AS BIGINT) AS direction"))
    runw = (Window.orderBy("day")
                  .rowsBetween(Window.unboundedPreceding,
                               Window.currentRow))
    return d.select(
        "day", "direction", "volume",
        F.sum(F.col("direction") * F.col("volume")).over(runw)
         .cast("long").alias("obv"))


# -------------------------- Mann-Kendall trend test on daily revenue

# Shared fragments over the day-sorted daily-revenue cents array `a`
# (n = cardinality). S = sum over i<j of sign(a[j] - a[i]) — pure
# integers, order-free. Spark and DuckDB spell the nested pair
# emission with their own lambda syntax below.
_MK_VAR = ("( {nn} * ({nn} - 1.0) * (2.0 * {nn} + 5.0) - {ties} ) / 18.0")
_MK_Z = ("CASE WHEN s_stat > 0 THEN (s_stat - 1.0) / SQRT(var_s) "
         "WHEN s_stat < 0 THEN (s_stat + 1.0) / SQRT(var_s) "
         "ELSE 0.0 END")


@staged_query(
    "mann_kendall_daily_trend",
    oracle=f"""
        WITH d AS (
          SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
                 CAST(SUM({_CENTS}) AS BIGINT) AS cents
          FROM events GROUP BY 1
        ),
        arr AS (
          SELECT list(cents ORDER BY day) AS a,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM d
        ),
        s AS (
          SELECT n,
                 CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                   flatten(list_transform(generate_series(1, n - 1),
                     i -> list_transform(generate_series(i + 1, n),
                       j -> CAST(CASE WHEN a[j] > a[i] THEN 1
                                 WHEN a[j] < a[i] THEN -1
                                 ELSE 0 END AS BIGINT))))),
                   (acc, v) -> acc + v) AS BIGINT) AS s_stat
          FROM arr
        ),
        t AS (
          SELECT COALESCE(CAST(SUM(cnt * (cnt - 1) * (2 * cnt + 5))
                   AS DOUBLE), 0.0) AS ties
          FROM (SELECT COUNT(*) AS cnt FROM d GROUP BY cents)
          WHERE cnt > 1
        )
        SELECT n_days, s_stat, var_s, {_MK_Z} AS z_stat
        FROM (SELECT n AS n_days, s_stat,
                {_MK_VAR.format(nn="CAST(n AS DOUBLE)", ties="ties")}
                  AS var_s
              FROM s, t)
    """,
    doc="Mann-Kendall nonparametric trend test on daily revenue: S "
        "counts concordant-minus-discordant day pairs (monotone "
        "trend evidence without a linearity assumption — the "
        "hypothesis-test companion to the Theil-Sen slope already in "
        "the registry), with the tie-corrected variance and the "
        "continuity-corrected Z. The day count is calendar-bounded, "
        "so the O(n^2) pair sweep runs INSIDE one row's array lambda "
        "(the frequent_item_pairs in-array idiom) — all integers, "
        "order-free — never as a self-join. Z's sqrt is IEEE-exact "
        "cross-engine. Plan: one map-side-combinable daily rollup; "
        "everything after is a 1-row fold.",
    tags=("staged", "timeseries", "statistics"),
)
def mann_kendall_daily_trend(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    d = (load(spark, sf_dir, "events")
         .selectExpr("CAST(CAST(ts AS DATE) AS STRING) AS day",
                     f"{_CENTS} AS c")
         .groupBy("day").agg(F.sum("c").cast("long").alias("cents")))
    arr = d.agg(
        F.expr("transform(array_sort(collect_list(struct(day, cents))),"
               " x -> x.cents)").alias("a"),
        F.count(F.lit(1)).cast("long").alias("n"))
    # tie counts need their own value-grouped aggregate (a map-side
    # combinable GROUP BY cents over the bounded daily table)
    ties = (d.groupBy("cents").agg(F.count(F.lit(1)).alias("cnt"))
             .filter(F.col("cnt") > 1)
             .agg(F.expr("COALESCE(CAST(SUM(cnt * (cnt - 1)"
                         " * (2 * cnt + 5)) AS DOUBLE), 0.0)")
                   .alias("ties")))
    s = arr.selectExpr(
        "n",
        "CAST(aggregate(flatten(transform(sequence(1, CAST(n AS INT) - 1),"
        " i -> transform(sequence(i + 1, CAST(n AS INT)),"
        " j -> CAST(CASE WHEN element_at(a, j) > element_at(a, i)"
        " THEN 1 WHEN element_at(a, j) < element_at(a, i) THEN -1"
        " ELSE 0 END AS BIGINT)))),"
        " CAST(0 AS BIGINT), (acc, v) -> acc + v) AS BIGINT)"
        " AS s_stat")
    var_expr = _MK_VAR.format(nn="CAST(n AS DOUBLE)", ties="ties")
    return (s.crossJoin(F.broadcast(ties))
             .selectExpr("n AS n_days", "s_stat",
                         f"{var_expr} AS var_s")
             .selectExpr("n_days", "s_stat", "var_s",
                         f"{_MK_Z} AS z_stat"))


# -------------------- Durbin-Watson on linear-trend residuals


@staged_query(
    "durbin_watson_trend_residuals",
    oracle=f"""
        WITH d AS (
          SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
                 CAST(SUM({_CENTS}) AS BIGINT) AS cents
          FROM events GROUP BY 1
        ),
        arr AS (
          SELECT list(cents ORDER BY day) AS a,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM d
        ),
        sums AS (
          SELECT n, a,
                 list_reduce(list_prepend(CAST(0 AS HUGEINT),
                   list_transform(generate_series(1, n),
                     i -> CAST(i AS HUGEINT) * a[i])),
                   (acc, v) -> acc + v) AS sxy,
                 list_reduce(list_prepend(CAST(0 AS HUGEINT),
                   list_transform(generate_series(1, n),
                     i -> CAST(a[i] AS HUGEINT))),
                   (acc, v) -> acc + v) AS sy
          FROM arr
        ),
        fit AS (
          SELECT n, a,
                 (CAST(n AS DOUBLE) * {_wide('sxy')}
                  - (CAST(n AS DOUBLE) * (n + 1.0) / 2.0)
                    * {_wide('sy')})
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                    * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - 1.0)
                    / 12.0) AS bhat,
                 {_wide('sy')} AS syd
          FROM sums
        ),
        res AS (
          SELECT n, bhat,
                 (syd / n) - bhat * ((n + 1.0) / 2.0) AS ahat,
                 list_transform(generate_series(1, n),
                   i -> CAST(a[i] AS DOUBLE)
                        - ((syd / n) - bhat * ((n + 1.0) / 2.0)
                           + bhat * i)) AS r
          FROM fit
        )
        SELECT n AS n_days,
               bhat / 100 AS slope_per_day,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(generate_series(2, CAST(n AS INTEGER)),
                   i -> (r[i] - r[i-1]) * (r[i] - r[i-1]))),
                 (acc, v) -> acc + v)
               / list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(generate_series(1, CAST(n AS INTEGER)),
                   i -> r[i] * r[i])),
                 (acc, v) -> acc + v) AS dw_stat
        FROM res
    """,
    doc="Durbin-Watson autocorrelation test on the residuals of the "
        "OLS linear trend over daily revenue — 'is yesterday's "
        "forecast miss informative about today's', the standard "
        "lag-1 residual diagnostic behind every trend-model health "
        "check. The x axis is the dense day index, so Sx and Sxx "
        "collapse to closed forms n(n+1)/2 and n(n+1)(2n+1)/6 (their "
        "difference n^2(n^2-1)/12 is the slope denominator); Sxy and "
        "Sy accumulate EXACTLY (Spark DECIMAL(38,0) fold / DuckDB "
        "HUGEINT fold — identical digits either way, then one wide "
        "cast). Residuals and the DW ratio fold over the day-ordered "
        "array left-to-right from a 0.0 seed in BOTH engines — "
        "bit-identical doubles with no transcendentals. Plan: one "
        "map-side-combinable daily rollup; everything after is 1-row "
        "array math over the calendar-bounded series.",
    tags=("staged", "timeseries", "statistics"),
)
def durbin_watson_trend_residuals(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    d = (load(spark, sf_dir, "events")
         .selectExpr("CAST(CAST(ts AS DATE) AS STRING) AS day",
                     f"{_CENTS} AS c")
         .groupBy("day").agg(F.sum("c").cast("long").alias("cents")))
    arr = d.agg(
        F.expr("transform(array_sort(collect_list(struct(day, cents))),"
               " x -> x.cents)").alias("a"),
        F.count(F.lit(1)).cast("long").alias("n"))
    sums = arr.selectExpr(
        "n", "a",
        "aggregate(transform(sequence(1, CAST(n AS INT)),"
        " i -> CAST(i AS DECIMAL(38,0)) * element_at(a, i)),"
        " CAST(0 AS DECIMAL(38,0)), (acc, v) -> acc + v) AS sxy",
        "aggregate(transform(sequence(1, CAST(n AS INT)),"
        " i -> CAST(element_at(a, i) AS DECIMAL(38,0))),"
        " CAST(0 AS DECIMAL(38,0)), (acc, v) -> acc + v) AS sy")
    fit = sums.selectExpr(
        "n", "a",
        f"(CAST(n AS DOUBLE) * {_wide('sxy')}"
        f" - (CAST(n AS DOUBLE) * (n + 1.0) / 2.0) * {_wide('sy')})"
        f" / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)"
        f" * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - 1.0) / 12.0)"
        f" AS bhat",
        f"{_wide('sy')} AS syd")
    res = fit.selectExpr(
        "n", "bhat",
        "transform(sequence(1, CAST(n AS INT)),"
        " i -> CAST(element_at(a, i) AS DOUBLE)"
        " - ((syd / n) - bhat * ((n + 1.0) / 2.0) + bhat * i)) AS r")
    return res.selectExpr(
        "n AS n_days",
        "bhat / 100 AS slope_per_day",
        "aggregate(transform(sequence(2, CAST(n AS INT)),"
        " i -> (element_at(r, i) - element_at(r, i - 1))"
        " * (element_at(r, i) - element_at(r, i - 1))),"
        " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        " / aggregate(transform(sequence(1, CAST(n AS INT)),"
        " i -> element_at(r, i) * element_at(r, i)),"
        " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) AS dw_stat")


# ---------------------- Jarque-Bera normality test on daily revenue


@staged_query(
    "jarque_bera_daily_revenue",
    oracle=f"""
        WITH d AS (
          SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
                 CAST(SUM({_CENTS}) AS BIGINT) AS cents
          FROM events GROUP BY 1
        ),
        arr AS (
          SELECT list(cents ORDER BY day) AS a,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(CAST(cents AS HUGEINT)) AS s
          FROM d
        ),
        mom AS (
          SELECT n,
                 {_wide('s')} / n AS mu,
                 list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(a, v -> (v - {_wide('s')} / n)
                     * (v - {_wide('s')} / n))),
                   (acc, v) -> acc + v) / n AS m2,
                 list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(a, v -> (v - {_wide('s')} / n)
                     * (v - {_wide('s')} / n)
                     * (v - {_wide('s')} / n))),
                   (acc, v) -> acc + v) / n AS m3,
                 list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(a, v -> ((v - {_wide('s')} / n)
                     * (v - {_wide('s')} / n))
                     * ((v - {_wide('s')} / n)
                     * (v - {_wide('s')} / n)))),
                   (acc, v) -> acc + v) / n AS m4
          FROM arr
        )
        SELECT n AS n_days,
               mu / 100 AS mean_revenue,
               m3 / (m2 * SQRT(m2)) AS skewness,
               m4 / (m2 * m2) AS kurtosis,
               n / 6.0 * ((m3 / (m2 * SQRT(m2)))
                          * (m3 / (m2 * SQRT(m2)))
                 + (m4 / (m2 * m2) - 3.0) * (m4 / (m2 * m2) - 3.0)
                   / 4.0) AS jb_stat
        FROM mom
    """,
    doc="Jarque-Bera normality test on daily revenue: population "
        "skewness and kurtosis from central moments, combined into "
        "the JB statistic — the distributional-health check a "
        "forecasting pipeline runs before trusting Gaussian "
        "prediction intervals. Deliberately NOT Spark's skewness()/"
        "kurtosis() builtins: their partial-aggregation merge order "
        "is nondeterministic over doubles, so both engines instead "
        "fold (v - mu)^k terms over the SAME day-ordered array from "
        "a 0.0 seed — bit-identical, with mu itself one wide-exact "
        "division. The skewness denominator is written m2*sqrt(m2), "
        "not pow(m2, 1.5): sqrt is correctly rounded cross-engine, "
        "pow is not guaranteed. Plan: one map-side-combinable daily "
        "rollup; the moment math is 1-row array folds over the "
        "calendar-bounded series.",
    tags=("staged", "timeseries", "statistics"),
)
def jarque_bera_daily_revenue(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    d = (load(spark, sf_dir, "events")
         .selectExpr("CAST(CAST(ts AS DATE) AS STRING) AS day",
                     f"{_CENTS} AS c")
         .groupBy("day").agg(F.sum("c").cast("long").alias("cents")))
    arr = d.agg(
        F.expr("transform(array_sort(collect_list(struct(day, cents))),"
               " x -> x.cents)").alias("a"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("s"))
    mu = f"{_wide('s')} / n"
    mom = arr.selectExpr(
        "n",
        f"{mu} AS mu",
        f"aggregate(transform(a, v -> (v - {mu}) * (v - {mu})),"
        f" CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) / n AS m2",
        f"aggregate(transform(a, v -> (v - {mu}) * (v - {mu})"
        f" * (v - {mu})),"
        f" CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) / n AS m3",
        f"aggregate(transform(a, v -> ((v - {mu}) * (v - {mu}))"
        f" * ((v - {mu}) * (v - {mu}))),"
        f" CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) / n AS m4")
    return mom.selectExpr(
        "n AS n_days",
        "mu / 100 AS mean_revenue",
        "m3 / (m2 * SQRT(m2)) AS skewness",
        "m4 / (m2 * m2) AS kurtosis",
        "n / 6.0 * ((m3 / (m2 * SQRT(m2))) * (m3 / (m2 * SQRT(m2)))"
        " + (m4 / (m2 * m2) - 3.0) * (m4 / (m2 * m2) - 3.0) / 4.0)"
        " AS jb_stat")
