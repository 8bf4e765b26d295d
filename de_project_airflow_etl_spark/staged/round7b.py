"""Round-7 staged queries, second bank: classifier/retrieval
evaluation and hypothesis-test statistics (see staged/__init__.py for
the window-arithmetic rationale).

Same contract as registered queries: ``(spark, sf_dir) -> DataFrame``
plus an exact DuckDB oracle, identical column aliases on both sides,
exact-integer / fixed-point arithmetic for anything accumulated, a
100 TB plan story per docstring, no ``rand()``, no ``.collect()``.

New determinism idiom introduced here (and reused below): a
**deterministic double reduction**. Double addition is not
associative, so a SUM over double terms is engine-order-dependent —
the reason the promoted bank avoids summed transcendentals outright
(language_diversity_by_source chose Simpson over Shannon). When a
statistic genuinely needs a sum of K per-group DOUBLE terms (ANOVA's
sum of squared group means, chi-square's cell contributions) and K is
bounded (fixed-cardinality grouping keys), both engines fold the
SORTED term array sequentially from an explicit 0.0 seed:

  Spark : aggregate(array_sort(collect_list(t)), CAST(0.0 AS DOUBLE),
                    (acc, v) -> acc + v)
  DuckDB: list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                      list_sort(list(t))), (acc, v) -> acc + v)

Identical value order + identical association order = bit-identical
IEEE result. The collect_list is over a BOUNDED group count (never
data-sized rows), so the array stays O(|groups|) at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from de_project_airflow_etl_spark.staged import staged_query
from de_project_airflow_etl_spark.tables import load

# wide exact integer (DECIMAL(38,0)) -> double through the decimal
# string, the established route when magnitudes can pass 2^53
# (language_diversity_by_source precedent).
def _wide(col: str) -> str:
    return f"CAST(CAST({col} AS STRING) AS DOUBLE)"


def _fold_spark(terms_col: str) -> str:
    return (f"aggregate(array_sort({terms_col}), CAST(0.0 AS DOUBLE), "
            f"(acc, v) -> acc + v)")


def _fold_sql(term_expr: str) -> str:
    return (f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_sort(list({term_expr}))), (acc, v) -> acc + v)")


_CENTS = "CAST(ROUND(value * 100) AS BIGINT)"


# ----------------------------------------- ROC-AUC of value vs purchase

# Rank-based AUC with tie handling (average ranks), computed without a
# global rank: group by the exact integer score (cents), cumulate the
# negative counts below each score, and combine
#   AUC = sum_v pos_v * (neg_below_v + neg_v / 2) / (n_pos * n_neg).
# Doubling the numerator keeps everything integral until one division.
_AUC = (f"{_wide('num2')} / "
        f"{_wide('CAST(2 * n_pos AS DECIMAL(38,0)) * n_neg')}")


@staged_query(
    "roc_auc_purchase_value",
    oracle=f"""
        WITH g AS (
          SELECT {_CENTS} AS v,
                 CAST(SUM(CASE WHEN event_type = 'purchase'
                          THEN 1 ELSE 0 END) AS BIGINT) AS pos_v,
                 CAST(SUM(CASE WHEN event_type = 'purchase'
                          THEN 0 ELSE 1 END) AS BIGINT) AS neg_v
          FROM events GROUP BY 1
        ),
        c AS (
          SELECT pos_v, neg_v,
                 COALESCE(SUM(neg_v) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS neg_lt
          FROM g
        ),
        t AS (
          SELECT CAST(SUM(pos_v) AS BIGINT) AS n_pos,
                 CAST(SUM(neg_v) AS BIGINT) AS n_neg,
                 SUM(CAST(pos_v AS DECIMAL(38,0))
                     * (2 * neg_lt + neg_v)) AS num2
          FROM c
        )
        SELECT n_pos, n_neg, {_AUC} AS auc FROM t
    """,
    doc="Area under the ROC curve for 'event value predicts purchase' "
        "— the standard threshold-free classifier-evaluation metric a "
        "training pipeline tracks for every quality/heuristic score. "
        "Rank-based (Mann-Whitney) formulation with exact tie "
        "handling, but WITHOUT a global rank: scores are exact "
        "integer cents with a bounded value range, so a group-by on "
        "the score plus one cumulative count over the <=49k-row "
        "score-distribution table replaces the data-sized sort "
        "(the global_row_number lesson). The doubled numerator "
        "pos_v*(2*neg_below+neg_v) accumulates in DECIMAL(38,0) "
        "(products pass 2^63 at corpus scale) and the single "
        "division rides the decimal-string->double route. Plan: one "
        "map-side-combinable aggregate on the fact table, one window "
        "+ final aggregate over the bounded score table.",
    tags=("staged", "evaluation", "statistics"),
)
def roc_auc_purchase_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").selectExpr(
        f"{_CENTS} AS v",
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_pos")
    g = (e.groupBy("v")
          .agg(F.sum("is_pos").cast("long").alias("pos_v"),
               F.sum(F.lit(1) - F.col("is_pos")).cast("long")
                .alias("neg_v")))
    w = (Window.orderBy("v")
               .rowsBetween(Window.unboundedPreceding, -1))
    c = g.select(
        "pos_v", "neg_v",
        F.coalesce(F.sum("neg_v").over(w), F.lit(0)).alias("neg_lt"))
    t = c.agg(
        F.sum("pos_v").cast("long").alias("n_pos"),
        F.sum("neg_v").cast("long").alias("n_neg"),
        F.sum(F.col("pos_v").cast("decimal(38,0)")
              * (2 * F.col("neg_lt") + F.col("neg_v"))).alias("num2"))
    return t.selectExpr("n_pos", "n_neg", f"{_AUC} AS auc")


# ------------------------------------- Welch's t-test: weekend effect

# Shared double fragments over exact aggregates. Means/variances in
# cents and cents^2; the cents scale cancels inside t, and the means
# are reported in dollars. Sums of cents and cents^2 both ride
# DECIMAL(38,0) (the sum-of-squares passed 2^63 at sf0.1 once before;
# tests/test_overflow.py covers the shared route).
_MEAN_W = f"{_wide('s_w')} / n_w"
_MEAN_D = f"{_wide('s_d')} / n_d"
_VAR_W = (f"({_wide('q_w')} - {_wide('s_w')} * {_wide('s_w')} / n_w)"
          f" / (n_w - 1)")
_VAR_D = (f"({_wide('q_d')} - {_wide('s_d')} * {_wide('s_d')} / n_d)"
          f" / (n_d - 1)")
_SE2 = "(var_w / n_w + var_d / n_d)"
_T = f"(mean_w_c - mean_d_c) / SQRT({_SE2})"
_WELCH_DF = (f"({_SE2} * {_SE2}) / "
             f"((var_w / n_w) * (var_w / n_w) / (n_w - 1)"
             f" + (var_d / n_d) * (var_d / n_d) / (n_d - 1))")


@staged_query(
    "welch_t_test_weekend_value",
    oracle=f"""
        WITH b AS (
          SELECT CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END
                   AS wknd,
                 {_CENTS} AS c
          FROM events
        ),
        a AS (
          SELECT CAST(SUM(wknd) AS BIGINT) AS n_w,
                 SUM(CASE WHEN wknd = 1 THEN CAST(c AS DECIMAL(38,0))
                     ELSE 0 END) AS s_w,
                 SUM(CASE WHEN wknd = 1
                     THEN CAST(c AS DECIMAL(38,0)) * c
                     ELSE 0 END) AS q_w,
                 CAST(SUM(1 - wknd) AS BIGINT) AS n_d,
                 SUM(CASE WHEN wknd = 0 THEN CAST(c AS DECIMAL(38,0))
                     ELSE 0 END) AS s_d,
                 SUM(CASE WHEN wknd = 0
                     THEN CAST(c AS DECIMAL(38,0)) * c
                     ELSE 0 END) AS q_d
          FROM b
        ),
        m AS (
          SELECT n_w, n_d,
                 {_MEAN_W} AS mean_w_c, {_MEAN_D} AS mean_d_c,
                 {_VAR_W} AS var_w, {_VAR_D} AS var_d
          FROM a
        )
        SELECT n_w AS n_weekend, n_d AS n_weekday,
               mean_w_c / 100 AS mean_weekend,
               mean_d_c / 100 AS mean_weekday,
               {_T} AS t_stat,
               {_WELCH_DF} AS welch_df
        FROM m
    """,
    doc="Welch's unequal-variance t-test for 'do weekend events carry "
        "different values than weekday events' — the two-sample mean "
        "test (with the Welch-Satterthwaite degrees of freedom) that "
        "complements the rank-based Mann-Whitney and two-proportion "
        "z-test already in the bank. All moments (n, sum cents, sum "
        "cents^2) accumulate exactly in BIGINT/DECIMAL(38,0) in ONE "
        "map-side-combinable pass over the fact table with no "
        "grouping key at all; every double op afterwards is a shared "
        "SQL fragment on identical operands (divisions + one IEEE "
        "sqrt), so the statistic is bit-identical across engines. "
        "dayofweek parity: DuckDB dayofweek is 0=Sunday; Spark "
        "dayofweek is 1=Sunday, shifted by -1. Plan: a single "
        "partial+final aggregate producing one row — nothing "
        "data-sized past the scan at 100 TB.",
    tags=("staged", "statistics",),
)
def welch_t_test_weekend_value(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    b = load(spark, sf_dir, "events").selectExpr(
        "CASE WHEN (dayofweek(ts) - 1) IN (0, 6) THEN 1 ELSE 0 END"
        " AS wknd",
        f"{_CENTS} AS c")
    a = b.agg(
        F.expr("CAST(SUM(wknd) AS BIGINT)").alias("n_w"),
        F.expr("SUM(CASE WHEN wknd = 1 THEN CAST(c AS DECIMAL(38,0))"
               " ELSE 0 END)").alias("s_w"),
        F.expr("SUM(CASE WHEN wknd = 1"
               " THEN CAST(c AS DECIMAL(38,0)) * c ELSE 0 END)")
         .alias("q_w"),
        F.expr("CAST(SUM(1 - wknd) AS BIGINT)").alias("n_d"),
        F.expr("SUM(CASE WHEN wknd = 0 THEN CAST(c AS DECIMAL(38,0))"
               " ELSE 0 END)").alias("s_d"),
        F.expr("SUM(CASE WHEN wknd = 0"
               " THEN CAST(c AS DECIMAL(38,0)) * c ELSE 0 END)")
         .alias("q_d"))
    m = a.selectExpr(
        "n_w", "n_d",
        f"{_MEAN_W} AS mean_w_c", f"{_MEAN_D} AS mean_d_c",
        f"{_VAR_W} AS var_w", f"{_VAR_D} AS var_d")
    return m.selectExpr(
        "n_w AS n_weekend", "n_d AS n_weekday",
        "mean_w_c / 100 AS mean_weekend",
        "mean_d_c / 100 AS mean_weekday",
        f"{_T} AS t_stat",
        f"{_WELCH_DF} AS welch_df")


# ------------------------------------------ one-way ANOVA across types

# F = (SSB / (k-1)) / (SSW / (N-k)) with
#   A   = sum_g s_g^2 / n_g          (the only double-summed term)
#   SSB = A - S^2 / N,  SSW = Q - A
# A is a sum of K=|event_types| DOUBLE terms -> deterministic fold.
_ANOVA_FINAL = """
        SELECT k_groups, n_total,
               (a_sum - {S2N}) AS ss_between,
               ({Q} - a_sum) AS ss_within,
               CAST(k_groups - 1 AS BIGINT) AS df_between,
               CAST(n_total - k_groups AS BIGINT) AS df_within,
               ((a_sum - {S2N}) / (k_groups - 1))
                 / (({Q} - a_sum) / (n_total - k_groups)) AS f_stat
"""


def _anova_final(dialect_fold_done: str) -> str:
    return _ANOVA_FINAL.format(
        S2N=f"{_wide('s_tot')} * {_wide('s_tot')} / n_total",
        Q=_wide("q_tot")) + dialect_fold_done


@staged_query(
    "anova_event_type_value",
    oracle=f"""
        WITH g AS (
          SELECT event_type,
                 CAST(COUNT(*) AS BIGINT) AS n_g,
                 SUM(CAST({_CENTS} AS DECIMAL(38,0))) AS s_g,
                 SUM(CAST({_CENTS} AS DECIMAL(38,0)) * {_CENTS})
                   AS q_g
          FROM events GROUP BY event_type
        ),
        p AS (
          SELECT n_g, s_g, q_g,
                 {_wide('s_g')} * {_wide('s_g')} / n_g AS a_g
          FROM g
        ),
        t AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS k_groups,
                 CAST(SUM(n_g) AS BIGINT) AS n_total,
                 SUM(s_g) AS s_tot, SUM(q_g) AS q_tot,
                 {_fold_sql('a_g')} AS a_sum
          FROM p
        )
        {_anova_final("FROM t")}
    """,
    doc="One-way ANOVA F-statistic for value across the five event "
        "types — 'does the mean differ across more than two groups', "
        "the k-sample generalization of the Welch/Mann-Whitney pair "
        "tests in this bank. Group moments are exact "
        "(BIGINT/DECIMAL(38,0)); the between-group sum of squares "
        "needs sum_g s_g^2/n_g, a sum of K per-group DOUBLES, which "
        "both engines fold over the SORTED term array from a 0.0 "
        "seed (module-head idiom) — bit-identical association order, "
        "and the collect_list is over the fixed-cardinality "
        "event-type groups, never raw rows. Plan: one "
        "map-side-combinable aggregate on the fact table, then a "
        "5-row regroup; a single row out.",
    tags=("staged", "statistics",),
)
def anova_event_type_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = load(spark, sf_dir, "events").groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_g"),
        F.expr(f"SUM(CAST({_CENTS} AS DECIMAL(38,0)))").alias("s_g"),
        F.expr(f"SUM(CAST({_CENTS} AS DECIMAL(38,0)) * {_CENTS})")
         .alias("q_g"))
    p = g.selectExpr(
        "n_g", "s_g", "q_g",
        f"{_wide('s_g')} * {_wide('s_g')} / n_g AS a_g")
    t = p.agg(
        F.count(F.lit(1)).cast("long").alias("k_groups"),
        F.sum("n_g").cast("long").alias("n_total"),
        F.sum("s_g").alias("s_tot"),
        F.sum("q_g").alias("q_tot"),
        F.collect_list("a_g").alias("a_list"))
    folded = t.selectExpr(
        "k_groups", "n_total", "s_tot", "q_tot",
        f"{_fold_spark('a_list')} AS a_sum")
    folded.createOrReplaceTempView("anova_folded")
    return spark.sql(_anova_final("FROM anova_folded"))


# --------------------------- Cramér's V: event type vs day of week

_CELL_CONTRIB = ("(CAST(o AS DOUBLE) - CAST(rt * ct AS DOUBLE) / gt)"
                 " * (CAST(o AS DOUBLE) - CAST(rt * ct AS DOUBLE) / gt)"
                 " / (CAST(rt * ct AS DOUBLE) / gt)")
_V_FINAL = ("SQRT(chi2 / (CAST(n_total AS DOUBLE)"
            " * (CAST(LEAST(n_rows, n_cols) AS DOUBLE) - 1)))")


@staged_query(
    "cramers_v_event_dow",
    oracle=f"""
        WITH cells AS (
          SELECT event_type,
                 CAST(dayofweek(ts) AS BIGINT) AS dow,
                 CAST(COUNT(*) AS BIGINT) AS o
          FROM events GROUP BY 1, 2
        ),
        m AS (
          SELECT o,
                 SUM(o) OVER (PARTITION BY event_type) AS rt,
                 SUM(o) OVER (PARTITION BY dow) AS ct,
                 SUM(o) OVER () AS gt,
                 COUNT(DISTINCT event_type) OVER () AS n_rows,
                 COUNT(DISTINCT dow) OVER () AS n_cols
          FROM cells
        ),
        t AS (
          SELECT CAST(MAX(gt) AS BIGINT) AS n_total,
                 CAST(MAX(n_rows) AS BIGINT) AS n_rows,
                 CAST(MAX(n_cols) AS BIGINT) AS n_cols,
                 {_fold_sql(_CELL_CONTRIB)} AS chi2
          FROM m
        )
        SELECT n_total, n_rows, n_cols,
               CAST((n_rows - 1) * (n_cols - 1) AS BIGINT) AS dof,
               chi2, {_V_FINAL} AS cramers_v
        FROM t
    """,
    doc="Chi-square test of independence between event type and day "
        "of week, reported as the single (chi2, Cramér's V) statistic "
        "pair — the bounded-[0,1] association strength a feature-"
        "selection pass ranks categorical columns by. Complements "
        "chi_square_event_drift, which emits per-cell contributions "
        "but (deliberately) no total: the total is a sum of per-cell "
        "DOUBLES, impossible to verify bit-exactly under engine-"
        "specific accumulation order — solved here with the sorted-"
        "fold reduction over the 35-cell contingency table (module-"
        "head idiom). Expected counts are exact-integer products "
        "divided once; V's sqrt is IEEE-exact. dayofweek parity: "
        "DuckDB 0=Sunday, Spark shifted by -1. Plan: one aggregate "
        "over the fact table, windows over the 35-row cell table, "
        "one row out.",
    tags=("staged", "statistics",),
)
def cramers_v_event_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    cells = (load(spark, sf_dir, "events")
             .selectExpr("event_type",
                         "CAST(dayofweek(ts) - 1 AS BIGINT) AS dow")
             .groupBy("event_type", "dow")
             .agg(F.count(F.lit(1)).alias("o")))
    m = cells.select(
        "o",
        F.sum("o").over(Window.partitionBy("event_type")).alias("rt"),
        F.sum("o").over(Window.partitionBy("dow")).alias("ct"),
        F.sum("o").over(Window.partitionBy()).alias("gt"),
        F.size(F.collect_set("event_type").over(Window.partitionBy()))
         .cast("long").alias("n_rows"),
        F.size(F.collect_set("dow").over(Window.partitionBy()))
         .cast("long").alias("n_cols"))
    t = m.agg(
        F.max("gt").cast("long").alias("n_total"),
        F.max("n_rows").cast("long").alias("n_rows"),
        F.max("n_cols").cast("long").alias("n_cols"),
        F.collect_list(F.expr(_CELL_CONTRIB)).alias("contribs"))
    return (t.selectExpr(
                "n_total", "n_rows", "n_cols",
                f"{_fold_spark('contribs')} AS chi2")
             .selectExpr(
                "n_total", "n_rows", "n_cols",
                "CAST((n_rows - 1) * (n_cols - 1) AS BIGINT) AS dof",
                "chi2", f"{_V_FINAL} AS cramers_v"))
