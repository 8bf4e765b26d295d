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
