"""Round-13 staged queries: privacy / governance audits for a
training-data pipeline — k-anonymity and l-diversity over a
quasi-identifier grid, and the L1/L-inf sensitivity audit that
calibrates differential-privacy noise for the corpus aggregates.

Same contract and determinism rules as staged/round8.py. The
quasi-identifier here is (event_type, weekday, value decile-band) —
coarse enough to be meaningful, deterministic by construction
(fixed-threshold bands, no quantiles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from de_project_airflow_etl_spark.staged import staged_query
from de_project_airflow_etl_spark.staged.round8 import _CENTS, _wide
from de_project_airflow_etl_spark.tables import load

# deterministic fixed-threshold value band (cents // 5000, capped):
# the brier/hellinger binning discipline — no engine quantiles.
_QI_BAND = "LEAST(CAST(9 AS BIGINT), CAST(c {div} 5000 AS BIGINT))"
_QI_DOW_SQL = "dayofweek(ts)"
_QI_DOW_SPARK = "(dayofweek(ts) - 1)"


@staged_query(
    "k_anonymity_audit",
    oracle=f"""
        WITH r AS (
          SELECT event_type, {_QI_DOW_SQL} AS dow,
                 {_QI_BAND.format(div='//')} AS band
          FROM (SELECT event_type, ts, {_CENTS} AS c FROM events)
        ),
        cells AS (
          SELECT event_type, dow, band,
                 CAST(COUNT(*) AS BIGINT) AS k
          FROM r GROUP BY 1, 2, 3
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
               CAST(SUM(k) AS BIGINT) AS n_rows,
               CAST(MIN(k) AS BIGINT) AS min_k,
               CAST(SUM(CASE WHEN k < 5 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_cells_under_5,
               CAST(SUM(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT)
                 AS n_rows_under_5,
               CAST(SUM(CASE WHEN k < 5 THEN k ELSE 0 END) AS DOUBLE)
                 / SUM(k) AS frac_rows_under_5
        FROM cells
    """,
    doc="k-anonymity audit over the (event_type, weekday, value-band) "
        "quasi-identifier: the smallest equivalence class and the "
        "row mass sitting in classes below k = 5 — the re-"
        "identification exposure number a privacy review of a "
        "training-data release starts from (a row in a size-1 cell "
        "is unique on its quasi-identifiers). Bands are fixed "
        "thresholds (deterministic, no quantiles); counts are exact "
        "integers with one final division. Plan: ONE map-side-"
        "combinable cell aggregate over the fact table, then "
        "cell-count math — the grid is bounded by "
        "|types| x 7 x 10.",
    tags=("staged", "governance", "quality"),
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load(spark, sf_dir, "events").selectExpr(
        "event_type", f"{_QI_DOW_SPARK} AS dow",
        _QI_BAND.format(div="DIV").replace("c ", f"({_CENTS}) ")
        + " AS band")
    cells = (r.groupBy("event_type", "dow", "band")
              .agg(F.count(F.lit(1)).cast("long").alias("k")))
    return cells.agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.sum("k").cast("long").alias("n_rows"),
        F.min("k").cast("long").alias("min_k"),
        F.sum(F.when(F.col("k") < 5, 1).otherwise(0)).cast("long")
         .alias("n_cells_under_5"),
        F.sum(F.when(F.col("k") < 5, F.col("k")).otherwise(0))
         .cast("long").alias("n_rows_under_5"),
        (F.sum(F.when(F.col("k") < 5, F.col("k")).otherwise(0))
          .cast("double")
         / F.sum("k")).alias("frac_rows_under_5"))


@staged_query(
    "l_diversity_audit",
    oracle=f"""
        WITH r AS (
          SELECT event_type, {_QI_DOW_SQL} AS dow,
                 {_QI_BAND.format(div='//')} AS band,
                 user_id
          FROM (SELECT event_type, ts, user_id, {_CENTS} AS c
                FROM events)
        ),
        cells AS (
          SELECT event_type, dow, band,
                 CAST(COUNT(*) AS BIGINT) AS k,
                 CAST(COUNT(DISTINCT user_id) AS BIGINT) AS l
          FROM r GROUP BY 1, 2, 3
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
               CAST(MIN(l) AS BIGINT) AS min_l,
               CAST(SUM(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_cells_under_l3,
               CAST(SUM(CASE WHEN l < 3 THEN k ELSE 0 END) AS BIGINT)
                 AS n_rows_under_l3,
               CAST(SUM(CASE WHEN l = 1 THEN k ELSE 0 END) AS BIGINT)
                 AS n_rows_single_subject
        FROM cells
    """,
    doc="l-diversity audit over the same quasi-identifier grid: per "
        "equivalence class, how many DISTINCT subjects (users) stand "
        "behind the rows — k-anonymity's complement, because a cell "
        "of 100 rows all from ONE user protects nobody (homogeneity "
        "attack). Reports the minimum l, the mass below l = 3 and "
        "the single-subject row count — the governance triage "
        "numbers. Exact integer counts; the distinct rides the "
        "standard two-phase expand. Plan: one cell aggregate with a "
        "distinct over the bounded grid, then cell-count math.",
    tags=("staged", "governance", "quality"),
)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load(spark, sf_dir, "events").selectExpr(
        "event_type", f"{_QI_DOW_SPARK} AS dow",
        _QI_BAND.format(div="DIV").replace("c ", f"({_CENTS}) ")
        + " AS band", "user_id")
    cells = (r.groupBy("event_type", "dow", "band")
              .agg(F.count(F.lit(1)).cast("long").alias("k"),
                   F.countDistinct("user_id").cast("long").alias("l")))
    return cells.agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.min("l").cast("long").alias("min_l"),
        F.sum(F.when(F.col("l") < 3, 1).otherwise(0)).cast("long")
         .alias("n_cells_under_l3"),
        F.sum(F.when(F.col("l") < 3, F.col("k")).otherwise(0))
         .cast("long").alias("n_rows_under_l3"),
        F.sum(F.when(F.col("l") == 1, F.col("k")).otherwise(0))
         .cast("long").alias("n_rows_single_subject"))


@staged_query(
    "dp_sensitivity_audit",
    oracle=f"""
        WITH per_user AS (
          SELECT user_id,
                 CAST(COUNT(*) AS BIGINT) AS n_rows,
                 CAST(SUM({_CENTS}) AS BIGINT) AS cents,
                 CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT)
                   AS n_days
          FROM events GROUP BY user_id
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(MAX(n_rows) AS BIGINT) AS linf_count_sensitivity,
               CAST(MAX(cents) AS BIGINT) AS linf_sum_sensitivity_c,
               CAST(MAX(n_days) AS BIGINT) AS linf_day_sensitivity,
               {_wide('SUM(CAST(cents AS DECIMAL(38,0)))')}
                 / COUNT(*) / 100 AS mean_user_total,
               CAST(MAX(cents) AS DOUBLE)
                 / {_wide('SUM(CAST(cents AS DECIMAL(38,0)))')}
                 AS max_user_share
        FROM per_user
    """,
    doc="Differential-privacy sensitivity audit: the maximum any "
        "single user contributes to the corpus aggregates — row "
        "count, revenue sum, active days — which IS the L-infinity "
        "sensitivity that calibrates DP noise (sigma scales with "
        "max contribution / epsilon) and the contribution-bounding "
        "clip threshold a private release would enforce first. "
        "max_user_share flags whether one subject dominates an "
        "aggregate outright. Exact integers, two final divisions. "
        "Plan: ONE map-side-combinable per-user aggregate, 1-row "
        "math — the audit costs one pass regardless of scale.",
    tags=("staged", "governance", "statistics"),
)
def dp_sensitivity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_user = (load(spark, sf_dir, "events")
                .selectExpr("user_id", "ts", f"{_CENTS} AS c")
                .groupBy("user_id")
                .agg(F.count(F.lit(1)).cast("long").alias("n_rows"),
                     F.sum("c").cast("long").alias("cents"),
                     F.countDistinct(F.to_date("ts")).cast("long")
                      .alias("n_days")))
    return per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.max("n_rows").cast("long").alias("linf_count_sensitivity"),
        F.max("cents").cast("long").alias("linf_sum_sensitivity_c"),
        F.max("n_days").cast("long").alias("linf_day_sensitivity"),
        F.expr(f"{_wide('SUM(CAST(cents AS DECIMAL(38,0)))')}"
               " / COUNT(*) / 100").alias("mean_user_total"),
        F.expr(f"CAST(MAX(cents) AS DOUBLE)"
               f" / {_wide('SUM(CAST(cents AS DECIMAL(38,0)))')}"
               " AS max_user_share").alias("max_user_share"))
