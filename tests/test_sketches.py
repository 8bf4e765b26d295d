"""Sketch-rollup accuracy: the HLL store-and-merge path must agree
with the exact distinct count within HLL++'s error envelope."""

from __future__ import annotations

from pyspark.sql import functions as F

from de_project_airflow_etl_spark.queries.flagship import (
    weekly_users_hll_rollup,
)
from de_project_airflow_etl_spark.tables import load


def test_hll_rollup_within_tolerance(spark, sf_dir):
    approx = {r["week"]: r["approx_users"]
              for r in weekly_users_hll_rollup(spark, sf_dir).collect()}
    ev = load(spark, sf_dir, "events")
    exact = {r["week"]: r["exact_users"]
             for r in (ev.select(F.weekofyear(F.to_date("ts")).alias("week"),
                                 "user_id")
                         .distinct()
                         .groupBy("week")
                         .agg(F.count(F.lit(1)).alias("exact_users"))
                         .collect())}
    assert set(approx) == set(exact)
    for week, est in approx.items():
        assert abs(est - exact[week]) <= max(1, 0.05 * exact[week]), (
            week, est, exact[week])
