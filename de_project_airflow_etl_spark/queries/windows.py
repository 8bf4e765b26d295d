"""Window functions: ranking, offsets, running frames, tumbling time
windows.

Extension surface (reference has none, SURVEY.md §2.7). Determinism:
every window ORDER BY ends in a unique key so rank/lag/frame results
are stable across engines; running sums of doubles go through exact
int64/decimal arithmetic (util.py rationale).

Scale note: a window partitioned by a key shuffles once on that key and
sorts within partitions — same cost class as a groupBy. Unpartitioned
windows (global rank) serialize to one task and are avoided.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from de_project_airflow_etl_spark.registry import query
from de_project_airflow_etl_spark.tables import load
from de_project_airflow_etl_spark.queries.util import cents


@query(
    "window_top3_orders_per_customer",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice, rn
        FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders
        )
        WHERE rn <= 3
    """,
    doc="Per-group top-k via ROW_NUMBER — the scalable alternative to a "
        "global sort when k is small.",
    tags=("window", "topk"),
)
def window_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
         .filter(F.col("rn") <= 3)
         .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@query(
    "window_rank_customers_in_nation",
    oracle="""
        SELECT c_nationkey, c_custkey, c_acctbal,
               RANK()       OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS bal_rank,
               DENSE_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS bal_dense_rank,
               NTILE(4)     OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS bal_quartile
        FROM customer
    """,
    doc="RANK / DENSE_RANK / NTILE in one window pass.",
    tags=("window", "rank"),
)
def window_rank_customers_in_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    return c.select(
        "c_nationkey", "c_custkey", "c_acctbal",
        F.rank().over(w).alias("bal_rank"),
        F.dense_rank().over(w).alias("bal_dense_rank"),
        F.ntile(4).over(w).alias("bal_quartile"),
    )


@query(
    "window_order_gaps",
    oracle="""
        SELECT o_custkey, o_orderkey, o_orderdate,
               LAG(o_orderdate)  OVER w AS prev_orderdate,
               LEAD(o_orderdate) OVER w AS next_orderdate,
               DATE_DIFF('day',
                         CAST(LAG(o_orderdate) OVER w AS DATE),
                         CAST(o_orderdate AS DATE)) AS days_since_prev
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc="LAG/LEAD offsets + date arithmetic: days between consecutive "
        "orders of a customer.",
    tags=("window", "offset"),
)
def window_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return o.select(
        "o_custkey", "o_orderkey", "o_orderdate",
        prev.alias("prev_orderdate"),
        F.lead("o_orderdate").over(w).alias("next_orderdate"),
        F.datediff(F.to_date("o_orderdate"), F.to_date(prev)).alias("days_since_prev"),
    )


@query(
    "window_running_revenue",
    oracle="""
        SELECT l_suppkey, l_orderkey, l_linenumber,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) OVER (
                   PARTITION BY l_suppkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) / 100 AS running_revenue
        FROM lineitem
        WHERE l_suppkey <= 10
    """,
    doc="Running (cumulative) sum per supplier with an explicit ROWS "
        "frame; exact int64 cents keep the prefix sums engine-identical.",
    tags=("window", "frame"),
)
def window_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 10)
    w = (Window.partitionBy("l_suppkey")
               .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return li.select(
        "l_suppkey", "l_orderkey", "l_linenumber",
        (F.sum(cents("l_extendedprice")).over(w).cast("double") / 100)
            .alias("running_revenue"),
    )


@query(
    "window_share_of_nation",
    oracle="""
        SELECT c_custkey, c_nationkey,
               CAST(CAST(ROUND(c_acctbal * 100) AS BIGINT) AS DOUBLE) /
               CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT))
                    OVER (PARTITION BY c_nationkey) AS DOUBLE) AS balance_share
        FROM customer
        WHERE c_acctbal > 0
    """,
    doc="Ratio-to-group via an unordered (whole-partition) window frame.",
    tags=("window", "frame"),
)
def window_share_of_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    w = Window.partitionBy("c_nationkey")
    bal_c = cents("c_acctbal")
    return c.select(
        "c_custkey", "c_nationkey",
        (bal_c.cast("double") / F.sum(bal_c).over(w).cast("double"))
            .alias("balance_share"),
    )


@query(
    "window_distribution_functions",
    oracle="""
        SELECT c_custkey, c_mktsegment,
               PERCENT_RANK() OVER w AS pct_rank,
               CUME_DIST() OVER w AS cume,
               NTILE(4) OVER w AS quartile,
               NTH_VALUE(c_custkey, 2) OVER (
                 PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS second_richest
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment
                     ORDER BY c_acctbal DESC, c_custkey)
    """,
    doc="Distribution window functions: percent_rank / cume_dist / "
        "ntile / nth_value per market segment (unique ORDER BY keeps "
        "every value deterministic).",
    tags=("window",),
)
def window_distribution_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), "c_custkey")
    w_frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return c.select(
        "c_custkey", "c_mktsegment",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.ntile(4).over(w).alias("quartile"),
        F.nth_value("c_custkey", 2).over(w_frame).alias("second_richest"),
    )


@query(
    "window_tumbling_events",
    oracle="""
        SELECT time_bucket(INTERVAL 6 HOURS, ts) AS window_start,
               event_type,
               COUNT(*) AS event_count,
               COUNT(DISTINCT user_id) AS user_count
        FROM events
        GROUP BY 1, 2
    """,
    doc="Tumbling time-window aggregation (batch form of the Structured "
        "Streaming windowed agg in streaming/ingest.py).",
    tags=("window", "time"),
)
def window_tumbling_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
          .agg(F.count(F.lit(1)).alias("event_count"),
               F.countDistinct("user_id").alias("user_count"))
          .select(F.col("w.start").alias("window_start"), "event_type",
                  "event_count", "user_count")
    )


@query(
    "window_sliding_events",
    oracle="""
        -- a 6h window sliding every 3h: each event lands in exactly 2
        -- windows, starting at bucket3h(ts) and bucket3h(ts) - 3h
        WITH w AS (
          SELECT event_type,
                 unnest([time_bucket(INTERVAL 3 HOURS, ts),
                         time_bucket(INTERVAL 3 HOURS, ts)
                           - INTERVAL 3 HOURS]) AS window_start
          FROM events
        )
        SELECT window_start, event_type, COUNT(*) AS event_count
        FROM w
        GROUP BY 1, 2
    """,
    doc="Sliding (hopping) time windows: window(6h, slide 3h) expands "
        "each row into its 2 overlapping windows before the hash agg — "
        "Spark's Expand + partial-agg plan keeps the blow-up map-side.",
    tags=("window", "time"),
)
def window_sliding_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "6 hours", "3 hours").alias("w"),
                   "event_type")
          .agg(F.count(F.lit(1)).alias("event_count"))
          .select(F.col("w.start").alias("window_start"), "event_type",
                  "event_count")
    )


@query(
    "window_trailing_90d_revenue",
    oracle="""
        SELECT o_custkey, o_orderkey,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER (
                 PARTITION BY o_custkey
                 ORDER BY epoch_us(o_orderdate)
                 RANGE BETWEEN 7776000000000 PRECEDING AND CURRENT ROW)
                 AS DOUBLE) / 100 AS trailing_90d_revenue
        FROM orders
    """,
    doc="RANGE frame over event time: per-customer trailing-90-day "
        "revenue (7776000000000 us = 90 days), ordered by epoch "
        "microseconds so Spark's numeric rangeBetween and DuckDB's "
        "RANGE INTERVAL agree exactly. Unlike a ROWS frame, the bound "
        "is a time distance — the standard trailing-window metric "
        "shape. One shuffle on the partition key; exact int64-cents "
        "sum inside the frame.",
    tags=("window", "range-frame"),
)
def window_trailing_90d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders")
    return spark.sql("""
        SELECT o_custkey, o_orderkey,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER (
                 PARTITION BY o_custkey
                 ORDER BY unix_micros(CAST(o_orderdate AS TIMESTAMP))
                 RANGE BETWEEN 7776000000000 PRECEDING AND CURRENT ROW)
                 AS DOUBLE) / 100 AS trailing_90d_revenue
        FROM orders
    """)
