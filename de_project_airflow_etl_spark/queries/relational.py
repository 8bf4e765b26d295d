"""Core relational operators: scan/filter/project/aggregate/sort/limit.

Generalizes the reference's single GROUP-BY/COUNT-DISTINCT query layer
(SURVEY.md §2.3-2.4, T1-T5/A1-A3) to the full aggregate surface.
Every query is declarative DataFrame API — Catalyst pushes filters and
projections into the parquet scan (verified in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from de_project_airflow_etl_spark.registry import query
from de_project_airflow_etl_spark.tables import load
from de_project_airflow_etl_spark.queries.util import (
    cents, davg, dsum, sql_cents, sql_davg, sql_dsum,
)


@query(
    "pricing_summary",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               {sql_dsum('l_quantity', 'sum_qty')},
               {sql_dsum('l_extendedprice', 'sum_base_price')},
               CAST(SUM({sql_cents('l_extendedprice')} * (100 - {sql_cents('l_discount')})) AS DOUBLE) / 1e4 AS sum_disc_price,
               CAST(SUM({sql_cents('l_extendedprice')} * (100 - {sql_cents('l_discount')}) * (100 + {sql_cents('l_tax')})) AS DOUBLE) / 1e6 AS sum_charge,
               {sql_davg('l_quantity', 'avg_qty')},
               {sql_davg('l_extendedprice', 'avg_price')},
               {sql_davg('l_discount', 'avg_disc')},
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-style pricing summary: multi-aggregate hash agg with "
        "exact (decimal/int64) money arithmetic.",
    tags=("aggregate",),
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    price_c, disc_c, tax_c = cents("l_extendedprice"), cents("l_discount"), cents("l_tax")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
              dsum("l_quantity", "sum_qty"),
              dsum("l_extendedprice", "sum_base_price"),
              # products fit int64 per row; accumulate in DECIMAL(38,0)
              # so a 100x row count cannot cross 2^63 (ANSI would abort;
              # DuckDB side is already HUGEINT and needs no change)
              (F.sum((price_c * (100 - disc_c)).cast("decimal(38,0)"))
                .cast("double") / F.lit(1e4)).alias("sum_disc_price"),
              (F.sum((price_c * (100 - disc_c) * (100 + tax_c))
                     .cast("decimal(38,0)"))
                .cast("double") / F.lit(1e6)).alias("sum_charge"),
              davg("l_quantity", "avg_qty"),
              davg("l_extendedprice", "avg_price"),
              davg("l_discount", "avg_disc"),
              F.count(F.lit(1)).alias("count_order"),
          )
    )


@query(
    "filter_project",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount > 0.05
          AND l_returnflag = 'R'
    """,
    doc="Predicate + projection pushed into the parquet scan "
        "(SURVEY §2.3 T2/T5; PushedFilters verified in test_plans).",
    tags=("scan",),
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
                  & (F.col("l_discount") > 0.05)
                  & (F.col("l_returnflag") == "R"))
          .select("l_orderkey", "l_linenumber", "l_quantity")
    )


@query(
    "topk_orders",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 25
    """,
    doc="Top-k: Spark plans TakeOrderedAndProject (per-partition heap + "
        "driver merge) — no global sort at scale. Tie-broken on the key "
        "for determinism.",
    tags=("sort", "limit"),
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
         .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
         .limit(25)
    )


@query(
    "distinct_values",
    oracle="SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
    doc="DISTINCT = hash aggregate on all columns.",
    tags=("aggregate",),
)
def distinct_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "orders").select("o_orderstatus", "o_orderpriority").distinct()


@query(
    "group_having",
    oracle=f"""
        SELECT o_custkey,
               COUNT(*) AS order_count,
               {sql_dsum('o_totalprice', 'total_spent')}
        FROM orders
        GROUP BY o_custkey
        HAVING COUNT(*) >= 12
    """,
    doc="GROUP BY + HAVING (post-aggregation filter).",
    tags=("aggregate",),
)
def group_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
         .agg(F.count(F.lit(1)).alias("order_count"),
              dsum("o_totalprice", "total_spent"))
         .filter(F.col("order_count") >= 12)
    )


@query(
    "agg_minmax",
    oracle="""
        SELECT p_brand,
               MIN(p_retailprice) AS min_price,
               MAX(p_retailprice) AS max_price,
               MIN(p_size) AS min_size,
               MAX(p_size) AS max_size,
               COUNT(DISTINCT p_type) AS type_count
        FROM part
        GROUP BY p_brand
    """,
    doc="MIN/MAX/COUNT DISTINCT per group (order-insensitive aggregates, "
        "no float-sum hazard).",
    tags=("aggregate",),
)
def agg_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return (
        p.groupBy("p_brand")
         .agg(F.min("p_retailprice").alias("min_price"),
              F.max("p_retailprice").alias("max_price"),
              F.min("p_size").alias("min_size"),
              F.max("p_size").alias("max_size"),
              F.countDistinct("p_type").alias("type_count"))
    )


@query(
    "conditional_agg",
    oracle="""
        SELECT l_returnflag,
               COUNT(*) FILTER (WHERE l_quantity > 25) AS big_lines,
               COUNT(*) FILTER (WHERE l_quantity <= 25) AS small_lines,
               CAST(SUM(CASE WHEN l_discount >= 0.05
                             THEN CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                             ELSE 0 END) AS DOUBLE) / 100 AS discounted_revenue
        FROM lineitem
        GROUP BY l_returnflag
    """,
    doc="Conditional aggregation (CASE/FILTER inside agg) — the portable "
        "form of PIVOT.",
    tags=("aggregate",),
)
def conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
          .agg(
              F.count(F.when(F.col("l_quantity") > 25, 1)).alias("big_lines"),
              F.count(F.when(F.col("l_quantity") <= 25, 1)).alias("small_lines"),
              (F.sum(F.when(F.col("l_discount") >= 0.05, cents("l_extendedprice"))
                      .otherwise(F.lit(0))).cast("double") / 100).alias("discounted_revenue"),
          )
    )


@query(
    "stats_aggregates",
    oracle="""
        WITH c AS (
          SELECT l_returnflag,
                 CAST(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                      AS DECIMAL(19,0)) AS p,
                 CAST(CAST(ROUND(l_quantity * 100) AS BIGINT)
                      AS DECIMAL(19,0)) AS q
          FROM lineitem
        )
        SELECT l_returnflag,
               COUNT(*) AS n,
               (CAST(SUM(p * p) AS DOUBLE) / COUNT(*)
                - (CAST(SUM(p) AS DOUBLE) / COUNT(*))
                  * (CAST(SUM(p) AS DOUBLE) / COUNT(*))) / 1e4 AS var_pop_price,
               (CAST(SUM(p * q) AS DOUBLE) / COUNT(*)
                - (CAST(SUM(p) AS DOUBLE) / COUNT(*))
                  * (CAST(SUM(q) AS DOUBLE) / COUNT(*))) / 1e4 AS covar_pop_price_qty
        FROM c
        GROUP BY l_returnflag
    """,
    doc="Statistical aggregates (population variance / covariance) via "
        "the exact-moments formula: cents scaled to DECIMAL(19,0) so "
        "the squared-term sums are exact at ANY row count (int64 "
        "sum-of-squares would overflow ~1e12 cents^2-rows; decimal "
        "headroom is 1e38 on both engines), then one engine-identical "
        "double expression at the end — the built-in var_pop/covar_pop "
        "use order-dependent streaming updates that never hash-match "
        "across engines. Same one-shuffle partial-aggregate plan.",
    tags=("aggregate", "stats"),
)
def stats_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = cents("l_extendedprice").cast("decimal(19,0)")
    q = cents("l_quantity").cast("decimal(19,0)")
    n = F.count(F.lit(1))
    sp, sq = F.sum(p).cast("double"), F.sum(q).cast("double")
    spp, spq = F.sum(p * p).cast("double"), F.sum(p * q).cast("double")
    return (
        li.groupBy("l_returnflag")
          .agg(n.alias("n"),
               ((spp / n - (sp / n) * (sp / n)) / F.lit(1e4))
                   .alias("var_pop_price"),
               ((spq / n - (sp / n) * (sq / n)) / F.lit(1e4))
                   .alias("covar_pop_price_qty"))
    )


@query(
    "minmax_by_aggregates",
    oracle="""
        SELECT o_orderpriority,
               max_by(o_orderkey, o_totalprice) AS biggest_order,
               min_by(o_orderkey, o_totalprice) AS smallest_order,
               CAST(MAX(o_totalprice * 100) AS BIGINT) AS max_price_cents
        FROM orders
        GROUP BY o_orderpriority
    """,
    doc="Argmax/argmin aggregates (max_by/min_by): the single-pass "
        "answer to 'which row holds the extreme' — replaces the "
        "self-join-on-MAX anti-pattern with one hash aggregate. "
        "o_totalprice is unique per priority group in the testdata, so "
        "the chosen keys are deterministic.",
    tags=("aggregate",),
)
def minmax_by_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
         .agg(F.max_by("o_orderkey", "o_totalprice").alias("biggest_order"),
              F.min_by("o_orderkey", "o_totalprice").alias("smallest_order"),
              F.max(cents("o_totalprice")).alias("max_price_cents"))
    )


@query(
    "array_agg_top_balances",
    oracle="""
        WITH ranked AS (
          SELECT n_name, c_custkey,
                 ROW_NUMBER() OVER (PARTITION BY n_name
                                    ORDER BY c_acctbal DESC, c_custkey) AS rn
          FROM customer JOIN nation ON c_nationkey = n_nationkey
        )
        SELECT n_name,
               array_to_string(list(c_custkey ORDER BY rn), ',') AS top3_customers
        FROM ranked
        WHERE rn <= 3
        GROUP BY n_name
    """,
    doc="Ordered array_agg: top-3 customer keys per nation collected "
        "into an ordered list (rank first, then collect). Output is a "
        "joined string because pandas renders Spark and DuckDB arrays "
        "differently; the order inside the string is the point.",
    tags=("aggregate", "array"),
)
def array_agg_top_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    ranked = (c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
               .withColumn("rn", F.row_number().over(w))
               .filter(F.col("rn") <= 3))
    return (
        ranked.groupBy("n_name")
              .agg(F.concat_ws(",", F.transform(
                       F.array_sort(F.collect_list(F.struct("rn", "c_custkey"))),
                       lambda s: s["c_custkey"].cast("string")))
                    .alias("top3_customers"))
    )


@query(
    "hash_sampled_pricing",
    oracle="""
        SELECT l_returnflag,
               COUNT(*) AS sample_rows,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                    AS DOUBLE) / 100 AS sample_revenue
        FROM lineitem
        WHERE substr(md5(CAST(l_orderkey AS VARCHAR) || '-'
                         || CAST(l_linenumber AS VARCHAR)), 1, 1) = '0'
        GROUP BY l_returnflag
    """,
    doc="Deterministic 1/16 hash sample: rows whose md5(primary key) "
        "starts with '0'. Unlike TABLESAMPLE/rand(), the sample is "
        "identical on every engine, every run, and every retry — the "
        "exploration/debugging workhorse at 100 TB, and the filter "
        "evaluates inside the scan (no shuffle, no sort, no state).",
    tags=("scan", "sample"),
)
def hash_sampled_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    bucket = F.substring(
        F.md5(F.concat_ws("-", F.col("l_orderkey").cast("string"),
                          F.col("l_linenumber").cast("string"))
               .cast("binary")), 1, 1)
    return (
        li.filter(bucket == "0")
          .groupBy("l_returnflag")
          .agg(F.count(F.lit(1)).alias("sample_rows"),
               (F.sum(cents("l_extendedprice")).cast("double") / F.lit(100))
                   .alias("sample_revenue"))
    )
