"""Round-26 staged bank: two inference completions — offline
off-policy evaluation (IPS and SNIPS value estimates of a
deterministic target policy replayed over the md5-randomized logged
arms; the counterfactual "what would the other policy have earned"
readout that closes the experimentation family), and Krippendorff's
alpha for the three document-quality raters (the chance-corrected
agreement coefficient that, unlike the registered Fleiss/Cohen
kappas, derives its expected disagreement from the pooled value
distribution and generalizes to missing data — here the complete
3-rater binary case, an exact rational).

Same contract as every staged query: DuckDB oracle on the same
parquet, identical aliases, exact-integer accumulation with DECIMAL
widening for products, one final division to DOUBLE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from de_project_airflow_etl_spark.staged import staged_query
from de_project_airflow_etl_spark.tables import load

# logged arm: the repo-wide md5-nibble 50/50 assignment (the
# log_rank/SRM/CUPED arms) — first hex nibble < '8' -> arm 1
_ARM_SQL = ("CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1)"
            " < '8' THEN 1 ELSE 0 END")
_ARM_SPARK = ("CASE WHEN substring(md5(CAST(user_id AS STRING)), 1, 1)"
              " < '8' THEN 1 ELSE 0 END")


@staged_query(
    "ips_offpolicy_value",
    oracle=f"""
        WITH u AS (
          SELECT user_id,
                 MAX({_ARM_SQL}) AS logged_arm,
                 CASE WHEN MIN(CAST(ts AS DATE)) IS NOT NULL
                      AND dayofweek(MIN(CAST(ts AS DATE))) IN (0, 6)
                      THEN 1 ELSE 0 END AS target_arm,
                 CAST(SUM(CASE WHEN event_type = 'purchase'
                          THEN CAST(ROUND(value * 100) AS BIGINT)
                          ELSE 0 END) AS BIGINT) AS reward_cents
          FROM events GROUP BY user_id
        ),
        agg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
                 CAST(SUM(CASE WHEN logged_arm = target_arm
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
                 CAST(SUM(CASE WHEN logged_arm = target_arm
                          THEN reward_cents ELSE 0 END) AS BIGINT)
                   AS matched_cents,
                 CAST(SUM(reward_cents) AS BIGINT) AS logged_cents
          FROM u
        )
        SELECT n_users, n_matched,
               CAST(CAST(2 * matched_cents AS DECIMAL(38,0)) AS DOUBLE)
                 / n_users / 100 AS v_ips,
               CASE WHEN n_matched > 0 THEN
                 CAST(CAST(matched_cents AS DECIMAL(38,0)) AS DOUBLE)
                   / n_matched / 100 ELSE 0.0 END AS v_snips,
               CAST(CAST(logged_cents AS DECIMAL(38,0)) AS DOUBLE)
                 / n_users / 100 AS v_logged
        FROM agg
    """,
    doc="Offline off-policy evaluation: the value a DETERMINISTIC "
        "target policy (arm 1 for users whose first event falls on a "
        "weekend, arm 0 otherwise) would have earned, estimated from "
        "the logged md5-nibble 50/50 randomization without running "
        "the experiment — inverse-propensity scoring "
        "V_IPS = mean(match * reward / 0.5) with the known constant "
        "propensity 1/2, plus the self-normalized SNIPS variant "
        "(mean reward over matched users — lower variance, small "
        "bias) and the logged-policy average for reference. Rewards "
        "are exact purchase cents; every accumulation is BIGINT with "
        "DECIMAL widening, divisions last. This is the counterfactual "
        "readout that closes the experimentation family "
        "(SRM -> CUPED -> DiD -> sequential -> power -> replay "
        "evaluation). Plan: one user-grain hash aggregate (the only "
        "corpus-scale exchange, keyed by user_id) folded into one "
        "4-cell scalar panel — map-side combinable throughout, no "
        "windows, no joins.",
    tags=("staged", "experimentation", "evaluation"),
)
def ips_offpolicy_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = (load(spark, sf_dir, "events")
         .groupBy("user_id")
         .agg(F.expr(f"MAX({_ARM_SPARK})").alias("logged_arm"),
              F.expr("CASE WHEN dayofweek(MIN(CAST(ts AS DATE)))"
                     " IN (1, 7) THEN 1 ELSE 0 END").alias("target_arm"),
              F.expr("CAST(SUM(CASE WHEN event_type = 'purchase'"
                     " THEN CAST(ROUND(value * 100) AS BIGINT)"
                     " ELSE 0 END) AS BIGINT)").alias("reward_cents")))
    agg = u.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum(F.when(F.col("logged_arm") == F.col("target_arm"), 1)
               .otherwise(0)).cast("long").alias("n_matched"),
        F.sum(F.when(F.col("logged_arm") == F.col("target_arm"),
                     F.col("reward_cents")).otherwise(0))
         .cast("long").alias("matched_cents"),
        F.sum("reward_cents").cast("long").alias("logged_cents"))
    return agg.selectExpr(
        "n_users", "n_matched",
        "CAST(CAST(2 * matched_cents AS DECIMAL(38,0)) AS DOUBLE)"
        " / n_users / 100 AS v_ips",
        "CASE WHEN n_matched > 0 THEN"
        " CAST(CAST(matched_cents AS DECIMAL(38,0)) AS DOUBLE)"
        " / n_matched / 100 ELSE 0.0D END AS v_snips",
        "CAST(CAST(logged_cents AS DECIMAL(38,0)) AS DOUBLE)"
        " / n_users / 100 AS v_logged")


# ---------------------------------------------------------------------
# Krippendorff's alpha (nominal, binary, 3 raters, complete data).
#
# With m = 3 raters, n units, pos_u = positive votes on unit u,
# P = sum pos_u, N = 3n pairable values:
#   D_o = (1/N) * sum_u pos_u * (3 - pos_u)          (per-unit pairs
#         disagreeing, normalized by m - 1 = 2, times the 2 ordered
#         orientations -> the factors cancel)
#   D_e = 2 * P * (N - P) / (N * (N - 1))
#   alpha = 1 - D_o / D_e
#         = 1 - (3P - sum pos_u^2) * (N - 1) / (2 * P * (N - P))
# — an exact rational of n, P and sum pos^2 (the same sufficient
# statistics as the registered Fleiss kappa, different chance model:
# alpha's D_e uses N - 1, the finite-sample pooled-pairs correction).

_RATERS_SQL = (
    "CASE WHEN contains(text, 'data') THEN 1 ELSE 0 END",
    "CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END",
    "CASE WHEN contains(text, '.') THEN 1 ELSE 0 END",
)


@staged_query(
    "krippendorff_alpha_quality_rules",
    oracle=f"""
        WITH r AS (
          SELECT ({_RATERS_SQL[0]}) + ({_RATERS_SQL[1]})
                 + ({_RATERS_SQL[2]}) AS pos
          FROM documents
        ),
        s AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(pos) AS BIGINT) AS p,
                 CAST(SUM(pos * pos) AS BIGINT) AS p2
          FROM r
        )
        SELECT n_docs, p AS total_pos,
               1 - CAST(CAST(CAST(3 * p - p2 AS DECIMAL(38,0))
                             * (3 * n_docs - 1) AS STRING) AS DOUBLE)
                 / CAST(CAST(CAST(2 AS DECIMAL(38,0)) * p
                             * (3 * n_docs - p) AS STRING) AS DOUBLE)
                 AS krippendorff_alpha
        FROM s
    """,
    doc="Krippendorff's alpha (nominal, complete 3-rater binary data) "
        "over the shared deterministic quality raters — the agreement "
        "coefficient whose expected disagreement comes from the "
        "POOLED value distribution with the N-1 finite-sample "
        "correction, closing the inter-rater family next to Cohen's "
        "kappa (2 raters), Fleiss' kappa (panel, infinite-sample "
        "chance model) and Cochran's Q (marginal homogeneity). For "
        "m=3, k=2 it reduces to an exact rational of n, sum(pos) and "
        "sum(pos^2): alpha = 1 - (3P - sum pos^2)(N-1) / (2P(N-P)), "
        "N = 3n — integer products in DECIMAL(38,0), the "
        "correctly-rounded string-route cast, ONE final division. "
        "Plan: one corpus pass to a 3-integer scalar panel; "
        "map-side combinable, zero joins, zero windows.",
    tags=("staged", "statistics", "quality"),
)
def krippendorff_alpha_quality_rules(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    pos = (load(spark, sf_dir, "documents")
           .selectExpr(f"({_RATERS_SQL[0]}) + ({_RATERS_SQL[1]})"
                       f" + ({_RATERS_SQL[2]}) AS pos"))
    s = pos.agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum("pos").cast("long").alias("p"),
                F.expr("CAST(SUM(pos * pos) AS BIGINT)").alias("p2"))
    return s.selectExpr(
        "n_docs", "p AS total_pos",
        "1 - CAST(CAST(CAST(3 * p - p2 AS DECIMAL(38,0))"
        " * (3 * n_docs - 1) AS STRING) AS DOUBLE)"
        " / CAST(CAST(CAST(2 AS DECIMAL(38,0)) * p"
        " * (3 * n_docs - p) AS STRING) AS DOUBLE)"
        " AS krippendorff_alpha")
