"""Scale-shaped check for the distributed NTILE used by
rfm_customer_segments: _global_ntile must agree with the engine's
NTILE window EXACTLY (same tile for every row) while never sorting
the whole relation in one task — its only unpartitioned object is
the <=32-row bucket-offset table. 200k rows with heavy value ties
exercise the tie-break path across bucket boundaries; k choices
cover n % k == 0, n % k > 0, and n < k."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from de_project_airflow_etl_spark.queries.aggregates_ext import _global_ntile

N = 200_000


@pytest.fixture()
def skewed(spark):
    # value = id % 1000 -> 200 ties per value; unique tiebreak = id
    return spark.range(N).selectExpr(
        "id AS k", "CAST(pmod(id, 1000) AS DOUBLE) AS v").localCheckpoint()


@pytest.mark.parametrize("tiles,desc", [(4, False), (4, True), (7, False)])
def test_global_ntile_matches_engine_ntile_at_200k(spark, skewed,
                                                   tiles, desc):
    order = [F.desc("v") if desc else F.asc("v"), F.asc("k")]
    want = skewed.select(
        "k", F.ntile(tiles).over(Window.orderBy(*order)).alias("t"))
    got = _global_ntile(skewed, "v", "k", tiles, "t",
                        descending=desc).select("k", "t")
    diff = want.join(got, "k").filter(want["t"] != got["t"]).count()
    assert diff == 0


def test_global_ntile_fewer_rows_than_tiles(spark):
    df = spark.range(5).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    got = {r["k"]: r["t"]
           for r in _global_ntile(df, "v", "k", 8, "t").collect()}
    # NTILE with n < k assigns tile == rank
    assert got == {i: i + 1 for i in range(5)}


@pytest.fixture()
def longtail(spark):
    """200k rows with the two distributions that defeat naive
    equal-width bucketing: a point mass (60% of rows share one value)
    and an exponential tail (a few rows reach ~2^20 while the median
    is tiny) — the review-identified degenerate cases for the
    adaptive re-split."""
    return spark.range(N).selectExpr(
        "id AS k",
        """CAST(CASE WHEN pmod(id, 10) < 6 THEN 42.0
                     ELSE pow(2.0, pmod(id, 20) + 1) END AS DOUBLE) AS v"""
    ).localCheckpoint()


@pytest.mark.parametrize("desc", [False, True])
def test_global_ntile_handles_longtail_and_point_mass(spark, longtail,
                                                      desc):
    order = [F.desc("v") if desc else F.asc("v"), F.asc("k")]
    want = longtail.select(
        "k", F.ntile(4).over(Window.orderBy(*order)).alias("t"))
    got = _global_ntile(longtail, "v", "k", 4, "t",
                        descending=desc).select("k", "t")
    assert want.join(got, "k").filter(want["t"] != got["t"]).count() == 0


def test_global_rank_splits_oversized_buckets(spark, longtail):
    """The adaptive re-split must actually spread the point-mass rows:
    no (b1, b2) bucket may hold more than ~n/4 rows after splitting
    (the 60% point mass would otherwise sit in one task)."""
    from de_project_airflow_etl_spark.queries.util import (
        RANK_BUCKETS, global_row_number,
    )
    ranked = global_row_number(longtail, "v", "k", "r")
    # reconstruct the physical partition load via the rank layout:
    # consecutive ranks share a bucket, so the largest gap-free run
    # per (value, tiebreak) ordering bounded check is equivalent to
    # checking the max rows any single window task processed. The
    # helper exposes no bucket column, so assert through the plan:
    # every row_number window partitions by the split keys.
    from de_project_airflow_etl_spark.plans.inspect import formatted_plan
    plan = formatted_plan(ranked)
    import re
    specs = re.findall(r"row_number\(\) windowspecdefinition\((\w+)#\d+",
                       plan)
    assert specs and all(s == "__bk" for s in specs), plan
    # and correctness of the rank itself on this distribution
    import pyspark.sql.functions as SF
    want = longtail.select(
        "k", SF.row_number().over(
            Window.orderBy(SF.asc("v"), SF.asc("k"))).alias("r"))
    got = ranked.select("k", "r")
    assert want.join(got, "k").filter(want["r"] != got["r"]).count() == 0


def test_adaptive_rank_exact_at_500k_longtail(spark):
    """The adaptive two-level path at volume: 500k rows, 70% point
    mass + exponential tail, exact row_number agreement with the
    engine's global window (which the test can afford; production
    can't)."""
    big = spark.range(500_000).selectExpr(
        "id AS k",
        """CAST(CASE WHEN pmod(id, 10) < 7 THEN 7.0
                     ELSE pow(2.0, pmod(id, 24) + 1) END AS DOUBLE) AS v"""
    ).localCheckpoint()
    from de_project_airflow_etl_spark.queries.util import global_row_number
    got = global_row_number(big, "v", "k", "r", descending=True)
    want = big.select(
        "k", F.row_number().over(
            Window.orderBy(F.desc("v"), F.asc("k"))).alias("r"))
    assert want.join(got.select("k", "r").withColumnRenamed("r", "g"),
                     "k").filter(F.col("r") != F.col("g")).count() == 0


def test_adaptive_rank_levels_zero_inflated_spike(spark):
    """The degenerate case one re-split can't fix: a 60% spike at one
    value INSIDE a wide continuous span (zero-inflated metrics are the
    real-world shape). Level 2 isolates the spike into a narrow
    sub-bucket, level 3's point-mass rule splits it by tiebreak — the
    refinement loop must leave NO bucket above its oversize bound, and
    the ranks must still be exact."""
    from de_project_airflow_etl_spark.queries.util import (
        RANK_BUCKETS, RANK_OVERSIZE, global_row_number,
    )
    n = 200_000
    df = spark.range(n).selectExpr(
        "id AS k",
        # 60% exactly 0.0, the rest spread over [1, 2^20]
        """CAST(CASE WHEN pmod(id, 10) < 6 THEN 0.0
                     ELSE 1.0 + pmod(hash(id), 1048576) END AS DOUBLE)
           AS v""").localCheckpoint()
    got = global_row_number(df, "v", "k", "r", _keep_key=True)
    worst = got.groupBy("__bk").count().agg(F.max("count")).first()[0]
    assert worst * RANK_BUCKETS <= n * RANK_OVERSIZE, worst
    want = df.select(
        "k", F.row_number().over(
            Window.orderBy(F.asc("v"), F.asc("k"))).alias("r"))
    assert want.join(got.select("k", "r").withColumnRenamed("r", "g"),
                     "k").filter(F.col("r") != F.col("g")).count() == 0


# r11 test tiering: multi-minute sweep/scale/property module —
# excluded from the default (driver-budget) run; run with
# -m "slow or not slow" for the full signal (see pytest.ini).
pytestmark = pytest.mark.slow
