"""Flagship query — the reference's entire analytics layer, generalized.

The reference serves exactly one query (daily COUNT(DISTINCT id) per
partition day, /root/reference/src/sql/query/daily_launch_events.sql:1-5,
SURVEY.md §2.4 A1-A3). On the driver testdata the direct analog runs on
the ``events`` table: group by event day, count distinct actors.

Scale note: COUNT(DISTINCT) over a day-grouped table is a classic
two-phase Catalyst expansion (partial distinct per partition, final
merge). At 100 TB the exact form stays correct; ``approx_count_distinct``
(HLL++) is registered separately for the sketch path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from de_project_airflow_etl_spark.registry import query
from de_project_airflow_etl_spark.tables import load


@query(
    "daily_events",
    oracle="""
        SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS event_date,
               COUNT(DISTINCT user_id) AS user_count,
               COUNT(*) AS event_count
        FROM events
        GROUP BY 1
    """,
    doc="Reference flagship analog (SURVEY §2.4 A1-A3): daily "
        "count-distinct over the events stream table.",
    tags=("aggregate", "flagship"),
)
def daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    # date -> timestamp so both engines materialize the same pandas
    # dtype (DuckDB's DATE arrives as datetime64 through Arrow anyway).
    return (
        ev.groupBy(F.to_date("ts").cast("timestamp").alias("event_date"))
          .agg(F.countDistinct("user_id").alias("user_count"),
               F.count(F.lit(1)).alias("event_count"))
    )


@query(
    "daily_events_skew_resistant",
    oracle="""
        SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS event_date,
               COUNT(DISTINCT user_id) AS user_count,
               COUNT(*) AS event_count
        FROM events
        GROUP BY 1
    """,
    doc="Skew-resistant exact distinct: pre-aggregate on (day, user) so "
        "the distinct work spreads over the full (day, user) key space, "
        "then count per day — identical result to daily_events (same "
        "oracle), but a hot day never lands on a single reducer. This "
        "is the manual form of what AQE skew-join splitting does for "
        "joins, applied to COUNT(DISTINCT) at 100 TB.",
    tags=("aggregate", "flagship", "skew"),
)
def daily_events_skew_resistant(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    per_user = (
        ev.groupBy(F.to_date("ts").cast("timestamp").alias("event_date"),
                   "user_id")
          .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        per_user.groupBy("event_date")
                .agg(F.count(F.lit(1)).alias("user_count"),
                     F.sum("cnt").alias("event_count"))
    )


@query(
    "daily_events_approx",
    oracle=None,  # HLL++ sketch is engine-specific; rows-only check.
    doc="100 TB-scale variant of the flagship: approx_count_distinct "
        "(HyperLogLog++) replaces the exact two-phase distinct.",
    tags=("aggregate", "sketch"),
)
def daily_events_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.to_date("ts").alias("event_date"))
          .agg(F.approx_count_distinct("user_id", 0.01).alias("user_count_approx"))
    )


@query(
    "daily_users_bitmap_exact",
    oracle="""
        SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS event_date,
               COUNT(DISTINCT user_id) AS user_count
        FROM events
        GROUP BY 1
    """,
    doc="Exact distinct via Spark 4 bitmap aggregates: user_id maps to "
        "a (bucket, bit) position, bitmap_construct_agg ORs the bits "
        "per (day, bucket), bitmap_count + SUM merges buckets per day. "
        "Identical result to COUNT(DISTINCT) (same oracle), but the "
        "partial state is a fixed-width bitmap instead of a hash set "
        "of user_ids — mergeable, bounded-memory partials are how "
        "warehouses keep exact distinct feasible on 100 TB fact "
        "tables, and the bucketed layout spreads one day over many "
        "reducers like the skew-resistant variant.",
    tags=("aggregate", "flagship", "bitmap"),
)
def daily_users_bitmap_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    per_bucket = (
        ev.groupBy(F.to_date("ts").cast("timestamp").alias("event_date"),
                   F.expr("bitmap_bucket_number(user_id)").alias("bkt"))
          .agg(F.expr("bitmap_count(bitmap_construct_agg("
                      "bitmap_bit_position(user_id)))").alias("part_count"))
    )
    return (per_bucket.groupBy("event_date")
                      .agg(F.sum("part_count").alias("user_count")))


@query(
    "weekly_users_hll_rollup",
    oracle=None,  # HLL sketch binaries are engine-specific; rows-only
                  # check here, 5%-tolerance test in tests/test_sketches.py.
    doc="Sketch store-and-merge: daily HLL sketches of user_id "
        "(hll_sketch_agg) re-aggregated to weekly uniques with "
        "hll_union_agg + hll_sketch_estimate — no second pass over raw "
        "events. This is the 100 TB pattern the _approx variant only "
        "hints at: persist tiny mergeable sketches per partition/day, "
        "answer any coarser-grained distinct-count rollup from the "
        "sketches alone.",
    tags=("aggregate", "sketch", "hll"),
)
def weekly_users_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = (ev.groupBy(F.to_date("ts").alias("event_date"))
               .agg(F.hll_sketch_agg("user_id").alias("sk")))
    return (daily.groupBy(F.weekofyear("event_date").alias("week"))
                 .agg(F.hll_sketch_estimate(F.hll_union_agg("sk"))
                       .alias("approx_users")))
