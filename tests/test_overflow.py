"""Accumulator-width regression tests: the moment/revenue sums must
survive magnitudes past 2^63 (ANSI mode turns a silent wrap into a
query abort — outlier_zscore_orders crashed at sf0.1 exactly this way
in round 5, because sum(cents^2) over 3e4 rows/group crossed int64
while the sf0.01 correctness scale stayed just under). These tests
push synthetic data PAST the boundary so the width of every
scale-critical accumulation is exercised directly, not inferred from
testdata magnitudes."""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

# 200 rows x (6e7 cents)^2 = 7.2e20 — an int64 sum aborts, a
# DECIMAL(38,0) sum is exact.
BIG_CENTS = 60_000_000
N_ROWS = 200


@pytest.fixture(scope="module")
def big_orders(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("overflow")
    (spark.range(N_ROWS)
     .selectExpr("id AS o_orderkey", "id % 3 AS o_custkey",
                 "'1-URGENT' AS o_orderstatus",
                 f"CAST({BIG_CENTS} / 100.0 AS DOUBLE) AS o_totalprice",
                 "timestamp'1995-01-01' AS o_orderdate",
                 "'1-URGENT' AS o_orderpriority")
     .write.mode("overwrite").parquet(f"{tmp}/orders.parquet"))
    return str(tmp)


def test_zscore_moment_sums_survive_past_int64(spark, big_orders):
    from de_project_airflow_etl_spark.queries.aggregates_ext import (
        outlier_zscore_orders,
    )
    # sum of squares = 200 * (6e7)^2 = 7.2e20 > 2^63: the query must
    # run (constant values -> sd == 0 -> empty outlier set is fine;
    # the point is it does not abort)
    outlier_zscore_orders(spark, big_orders).collect()


def test_revenue_accumulation_survives_past_int64(spark):
    """The shared TPC-H revenue construction: per-row product fits
    int64, the SUM must not — verified against exact Decimal."""
    from de_project_airflow_etl_spark.queries.tpch import _rev_sum
    df = spark.range(N_ROWS).selectExpr(
        f"CAST({BIG_CENTS * 1000} / 100.0 AS DOUBLE) AS l_extendedprice",
        "CAST(0.05 AS DOUBLE) AS l_discount")
    got = df.agg(_rev_sum()).first()["revenue"]
    exact = (Decimal(N_ROWS) * Decimal(BIG_CENTS * 1000)
             * Decimal(100 - 5)) / Decimal(10_000)
    assert got == pytest.approx(float(exact), rel=0, abs=0)


def test_regression_moments_survive_past_int64(spark, tmp_path):
    from de_project_airflow_etl_spark.queries.aggregates_ext import (
        regression_aggregates,
    )
    (spark.range(N_ROWS)
     .selectExpr("'A' AS l_returnflag",
                 # vary x so the slope denominator is nonzero; per-row
                 # cents ~6e7 keep each product int64-safe while the
                 # accumulated moments cross 2^63
                 f"CAST(({BIG_CENTS} + id * 1000) / 100.0 AS DOUBLE)"
                 " AS l_quantity",
                 f"CAST(({BIG_CENTS} + id * 2000) / 100.0 AS DOUBLE)"
                 " AS l_extendedprice")
     .write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet"))
    rows = regression_aggregates(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    assert rows[0]["slope"] == pytest.approx(2.0)  # y grows 2x per x
