"""Join operators: inner/left/full/semi/anti/cross/non-equi, multiway.

The reference has no joins (SURVEY.md §2.7); this module is the §7.2
generalized surface. Scale notes per query:

* Dimension tables (region/nation/customer/supplier/part) are broadcast
  — ``F.broadcast`` hints make it explicit; at 100 TB the fact side
  (lineitem/orders) never shuffles for those joins.
* Fact-fact joins (lineitem x orders) shuffle on the join key; AQE
  handles skew (skewJoin enabled in the session factory).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from de_project_airflow_etl_spark.registry import query
from de_project_airflow_etl_spark.tables import load
from de_project_airflow_etl_spark.queries.util import cents, dsum, sql_dsum


@query(
    "join_segment_revenue",
    oracle=f"""
        SELECT c.c_mktsegment,
               COUNT(DISTINCT o.o_orderkey) AS order_count,
               {sql_dsum('o.o_totalprice', 'segment_revenue')}
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
    """,
    doc="Inner join fact->broadcast dim, then aggregate. Customer is "
        "broadcast so orders never shuffles for the join.",
    tags=("join", "broadcast"),
)
def join_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "inner")
         .groupBy("c_mktsegment")
         .agg(F.countDistinct("o_orderkey").alias("order_count"),
              dsum("o_totalprice", "segment_revenue"))
    )


@query(
    "join_multiway_region_revenue",
    oracle="""
        SELECT r.r_name AS region_name, n.n_name AS nation_name,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))) AS DOUBLE) / 1e4
                   AS revenue
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey  = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name, n.n_name
    """,
    doc="TPC-H Q5-style 5-way join: one fact-fact shuffle join "
        "(lineitem x orders) then broadcast dims up the snowflake.",
    tags=("join", "multiway"),
)
def join_multiway_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    revenue = cents("l_extendedprice") * (100 - cents("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
          .join(F.broadcast(c), o.o_custkey == c.c_custkey)
          .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
          .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
          .groupBy(F.col("r_name").alias("region_name"),
                   F.col("n_name").alias("nation_name"))
          .agg((F.sum(revenue).cast("double") / F.lit(1e4)).alias("revenue"))
    )


@query(
    "join_left_order_counts",
    oracle="""
        SELECT c.c_custkey, c.c_name,
               COUNT(o.o_orderkey) AS order_count
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey, c.c_name
    """,
    doc="Left outer join preserving customers with zero orders "
        "(COUNT(col) skips the nulls the outer side introduces).",
    tags=("join", "outer"),
)
def join_left_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
         .groupBy("c_custkey", "c_name")
         .agg(F.count("o_orderkey").alias("order_count"))
    )


@query(
    "join_semi_active_customers",
    oracle="""
        SELECT c_custkey, c_name, c_acctbal
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 300000)
    """,
    doc="Left-semi join (EXISTS): customers with at least one large "
        "order; no row multiplication, probe side streamed.",
    tags=("join", "semi"),
)
def join_semi_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
         .select("c_custkey", "c_name", "c_acctbal")
    )


@query(
    "join_anti_dormant_customers",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey)
    """,
    doc="Left-anti join (NOT EXISTS): customers with no orders at all.",
    tags=("join", "anti"),
)
def join_anti_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
         .select("c_custkey", "c_name")
    )


@query(
    "join_full_outer_nation_balance",
    oracle="""
        WITH cust AS (
          SELECT c_nationkey AS nationkey, COUNT(*) AS customer_count
          FROM customer GROUP BY c_nationkey
        ), supp AS (
          SELECT s_nationkey AS nationkey, COUNT(*) AS supplier_count
          FROM supplier GROUP BY s_nationkey
        )
        SELECT COALESCE(cust.nationkey, supp.nationkey) AS nationkey,
               COALESCE(customer_count, 0) AS customer_count,
               COALESCE(supplier_count, 0) AS supplier_count
        FROM cust FULL OUTER JOIN supp ON cust.nationkey = supp.nationkey
    """,
    doc="Full outer join of two aggregates with COALESCE key merge.",
    tags=("join", "outer"),
)
def join_full_outer_nation_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (load(spark, sf_dir, "customer")
         .groupBy(F.col("c_nationkey").alias("nationkey"))
         .agg(F.count(F.lit(1)).alias("customer_count")))
    s = (load(spark, sf_dir, "supplier")
         .groupBy(F.col("s_nationkey").alias("nationkey"))
         .agg(F.count(F.lit(1)).alias("supplier_count")))
    return (
        c.join(s, "nationkey", "full_outer")
         .select(
             F.col("nationkey"),
             F.coalesce("customer_count", F.lit(0)).alias("customer_count"),
             F.coalesce("supplier_count", F.lit(0)).alias("supplier_count"))
    )


@query(
    "join_cross_region_pairs",
    oracle="""
        SELECT a.r_name AS region_a, b.r_name AS region_b
        FROM region a CROSS JOIN region b
        WHERE a.r_regionkey < b.r_regionkey
    """,
    doc="Cross join (tiny x tiny only — a guarded operator at scale).",
    tags=("join", "cross"),
)
def join_cross_region_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load(spark, sf_dir, "region")
    a = r.select(F.col("r_regionkey").alias("key_a"), F.col("r_name").alias("region_a"))
    b = r.select(F.col("r_regionkey").alias("key_b"), F.col("r_name").alias("region_b"))
    return (
        a.crossJoin(b)
         .filter(F.col("key_a") < F.col("key_b"))
         .select("region_a", "region_b")
    )


@query(
    "join_range_price_bands",
    oracle="""
        WITH bands(band, lo, hi) AS (
          VALUES ('budget', 0.0, 1200.0),
                 ('mid', 1200.0, 1800.0),
                 ('premium', 1800.0, 1e18)
        )
        SELECT b.band, COUNT(*) AS part_count,
               MIN(p.p_retailprice) AS min_price,
               MAX(p.p_retailprice) AS max_price
        FROM part p JOIN bands b
          ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
        GROUP BY b.band
    """,
    doc="Non-equi (range) join against a tiny in-line band table — "
        "Spark plans BroadcastNestedLoopJoin; the band side must be "
        "broadcast at scale.",
    tags=("join", "range"),
)
def join_range_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("budget", 0.0, 1200.0), ("mid", 1200.0, 1800.0), ("premium", 1800.0, 1e18)],
        "band string, lo double, hi double")
    return (
        p.join(F.broadcast(bands),
               (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi))
         .groupBy("band")
         .agg(F.count(F.lit(1)).alias("part_count"),
              F.min("p_retailprice").alias("min_price"),
              F.max("p_retailprice").alias("max_price"))
    )


@query(
    "join_null_safe_nation_pairs",
    oracle="""
        WITH n AS (
          SELECT n_nationkey, NULLIF(n_regionkey, 2) AS k FROM nation
        )
        SELECT a.n_nationkey AS nation_a, b.n_nationkey AS nation_b
        FROM n a JOIN n b
          ON a.k IS NOT DISTINCT FROM b.k
         AND a.n_nationkey < b.n_nationkey
    """,
    doc="Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys "
        "match each other — still hash-partitionable (NULLs co-locate "
        "on one key), unlike a NULL-tolerant OR-condition join which "
        "would degrade to a nested loop.",
    tags=("join", "null"),
)
def join_null_safe_nation_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = (load(spark, sf_dir, "nation")
         .select("n_nationkey",
                 F.nullif(F.col("n_regionkey"), F.lit(2)).alias("k")))
    a, b = n.alias("a"), n.alias("b")
    return (
        a.join(b, F.col("a.k").eqNullSafe(F.col("b.k"))
                  & (F.col("a.n_nationkey") < F.col("b.n_nationkey")))
         .select(F.col("a.n_nationkey").alias("nation_a"),
                 F.col("b.n_nationkey").alias("nation_b"))
    )
