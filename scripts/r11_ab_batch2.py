"""Interleaved warm A/B: r10 (HEAD) shapes vs the r11 shapes for
survival_retention_curve, isotonic_daily_revenue_fit,
shapley_channel_attribution and market_basket_rules — one session,
alternating rounds, best-of-N, equality asserted once per query.

Usage: python scripts/r11_ab_batch2.py [rounds] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from de_project_airflow_etl_spark.queries.attribution import (
    _CH_BITS_SPARK, _CHANNELS, _L30, _SHAP_W, _CENTS, _popcount, _wide,
)
from de_project_airflow_etl_spark.queries.mining import (
    KM_CENSOR_DAYS, RULE_MIN_SUPPORT,
)
from de_project_airflow_etl_spark.registry import all_queries
from de_project_airflow_etl_spark.session import get_spark
from de_project_airflow_etl_spark.tables import load

REG = all_queries()


def old_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
         .cast("long").alias("d"))
    u = e.groupBy("user_id").agg(F.min("d").alias("first_d"),
                                 F.max("d").alias("last_d"))
    bounds = u.agg(F.max("last_d").alias("corpus_end"))
    life = (u.crossJoin(F.broadcast(bounds))
             .select((F.col("last_d") - F.col("first_d") + 1).alias("t"),
                     F.when(F.col("corpus_end") - F.col("last_d")
                            < KM_CENSOR_DAYS, 1).otherwise(0)
                      .alias("censored")))
    grouped = (life.groupBy("t")
               .agg(F.count(F.lit(1)).alias("n_t"),
                    F.sum(1 - F.col("censored")).alias("d_churned")))
    w_desc = (Window.orderBy(F.desc("t"))
              .rowsBetween(Window.unboundedPreceding, 0))
    risk = grouped.select(
        F.col("t").alias("t_days"),
        F.sum("n_t").over(w_desc).cast("long").alias("n_at_risk"),
        F.col("d_churned").cast("long").alias("d_churned"))
    terms = risk.withColumn(
        "term",
        F.lit(1.0) - F.col("d_churned").cast("double")
        / F.col("n_at_risk").cast("double"))
    arr = terms.agg(F.expr(
        "array_sort(collect_list(struct(t_days, term)))").alias("a"))
    return (terms.crossJoin(F.broadcast(arr))
                 .select("t_days", "n_at_risk", "d_churned",
                         F.expr("aggregate(filter(a, x -> x.t_days <= "
                                "t_days), CAST(1.0 AS DOUBLE), "
                                "(acc, x) -> acc * x.term)")
                          .alias("survival")))


def old_isotonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (load(spark, sf_dir, "events")
             .filter(F.col("event_type") == "purchase")
             .selectExpr("CAST(CAST(ts AS DATE) AS STRING) AS day",
                         f"{_CENTS} AS c")
             .groupBy("day")
             .agg(F.expr("CAST(SUM(c) AS BIGINT)").alias("y"))
             .localCheckpoint())
    w = Window.orderBy("day")
    idx = daily.select(
        "day", "y",
        F.row_number().over(w).cast("long").alias("i"),
        F.sum("y").over(w.rowsBetween(Window.unboundedPreceding, 0))
         .cast("decimal(38,0)").alias("pref")).localCheckpoint()
    base = (idx.selectExpr("i AS k", "pref")
               .unionAll(spark.range(1).selectExpr(
                   "CAST(0 AS BIGINT) AS k",
                   "CAST(0 AS DECIMAL(38,0)) AS pref")))
    lo = base.selectExpr("k AS lo_k", "pref AS lo_pref")
    hi = base.selectExpr("k AS hi_k", "pref AS hi_pref")
    m = (lo.join(hi, F.expr("lo_k < hi_k"))
           .selectExpr("lo_k + 1 AS j", "hi_k AS k",
                       f"(hi_pref - lo_pref) * ({_L30} div (hi_k - lo_k))"
                       " AS ms"))
    inner_min = (m.join(idx.selectExpr("i AS d"),
                        F.expr("j <= d AND d <= k"))
                  .groupBy("j", "d").agg(F.min("ms").alias("mn")))
    fit = inner_min.groupBy("d").agg(F.max("mn").alias("fit_scaled"))
    return (fit.join(idx, fit.d == idx.i)
               .selectExpr("day", "y AS daily_cents",
                           f"{_wide('fit_scaled')} / {_L30} AS fit_cents"))


def old_shapley(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    fp = (ev.filter(F.col("event_type") == "purchase")
            .groupBy("user_id").agg(F.min("ts").alias("fpts")))
    masks = (fp.join(ev.select("user_id", "ts", "event_type")
                       .withColumnRenamed("ts", "ets"),
                     on="user_id", how="left")
               .selectExpr(
                   "user_id",
                   "CASE WHEN ets < fpts AND event_type <> 'purchase' "
                   f"THEN {_CH_BITS_SPARK} END AS bit")
               .groupBy("user_id")
               .agg(F.expr("COALESCE(bit_or(bit), 0)").alias("mask")))
    mc = (masks.groupBy("mask")
               .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
               .localCheckpoint())
    subsets = spark.range(16).selectExpr("CAST(id AS INT) AS s")
    v = (subsets.join(mc, F.expr("(mask & s) = mask"), "left")
                .groupBy("s")
                .agg(F.expr("CAST(COALESCE(SUM(cnt), 0) AS BIGINT)")
                      .alias("v"))
                .localCheckpoint())
    ch = spark.createDataFrame(_CHANNELS, ["channel", "bit"])
    v0 = v.select(F.col("s"), F.col("v").alias("v0"))
    v1 = v.select(F.col("s").alias("s1"), F.col("v").alias("v1"))
    terms = (ch.join(v0, F.expr("(s & bit) = 0"))
               .join(v1, F.expr("s1 = (s | bit)"))
               .selectExpr("channel", f"({_popcount('s')}) AS pc",
                           "v1 - v0 AS delta"))
    return (terms.groupBy("channel")
                 .agg(F.expr(f"CAST(SUM(({_SHAP_W}) * delta) AS BIGINT)")
                       .alias("phi_x24"),
                      F.expr(f"CAST(SUM(({_SHAP_W}) * delta) AS DOUBLE)"
                             " / 24").alias("phi_conversions")))


def old_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    sets = (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
              .groupBy("l_orderkey")
              .agg(F.sort_array(F.collect_set("p_brand")).alias("bs"))
              .localCheckpoint())
    n_orders = sets.agg(F.count(F.lit(1)).alias("n_all"))
    item = (sets.select(F.explode("bs").alias("p_brand"))
            .groupBy("p_brand")
            .agg(F.count(F.lit(1)).alias("item_count"))
            .localCheckpoint())
    pair = (sets.select(F.explode(F.expr(
                "flatten(transform(bs, x -> "
                "transform(filter(bs, y -> y <> x), "
                "y -> struct(x AS antecedent, y AS consequent))))"))
                .alias("p"))
            .select("p.antecedent", "p.consequent")
            .groupBy("antecedent", "consequent")
            .agg(F.count(F.lit(1)).alias("support"))
            .filter(F.col("support") >= RULE_MIN_SUPPORT))
    ia = item.select(F.col("p_brand").alias("antecedent"),
                     F.col("item_count").alias("n_antecedent"))
    ic = item.select(F.col("p_brand").alias("consequent"),
                     F.col("item_count").alias("n_consequent"))
    return (pair.join(F.broadcast(ia), "antecedent")
                .join(F.broadcast(ic), "consequent")
                .crossJoin(F.broadcast(n_orders))
                .select("antecedent", "consequent", "support",
                        "n_antecedent", "n_consequent",
                        (F.col("support").cast("double")
                         / F.col("n_antecedent").cast("double"))
                            .alias("confidence"),
                        ((F.col("support") * F.col("n_all")).cast("double")
                         / (F.col("n_antecedent") * F.col("n_consequent"))
                         .cast("double")).alias("lift")))


PAIRS = {
    "survival_retention_curve": (
        old_survival, REG["survival_retention_curve"].fn),
    "isotonic_daily_revenue_fit": (
        old_isotonic, REG["isotonic_daily_revenue_fit"].fn),
    "shapley_channel_attribution": (
        old_shapley, REG["shapley_channel_attribution"].fn),
    "market_basket_rules": (
        old_basket, REG["market_basket_rules"].fn),
}


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    names = sys.argv[2:] or list(PAIRS)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r11-ab-batch2")

    for name in names:
        old, new = PAIRS[name]
        spark.catalog.clearCache()
        o_rows = sorted(map(tuple, old(spark, sf_dir).collect()))
        spark.catalog.clearCache()
        n_rows = sorted(map(tuple, new(spark, sf_dir).collect()))
        same = o_rows == n_rows
        print(f"{name}: rows_equal={same} n={len(n_rows)}", flush=True)
        assert same, f"{name} rows differ!"
        best = {"old": float("inf"), "new": float("inf")}
        for r in range(rounds):
            for label, fn in (("old", old), ("new", new)):
                spark.catalog.clearCache()
                spark.sparkContext.setJobDescription(f"{name}:{label}:r{r}")
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite").save()
                dt = time.perf_counter() - t0
                best[label] = min(best[label], dt)
                print(f"  round {r} {label}: {dt:.3f}s", flush=True)
        print(f"{name} BEST old={best['old']:.3f} new={best['new']:.3f}",
              flush=True)


if __name__ == "__main__":
    main()
