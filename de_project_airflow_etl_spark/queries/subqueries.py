"""Subquery forms: scalar, IN, correlated EXISTS, derived tables.

Extension surface (SURVEY.md §7.2). Catalyst decorrelates these into
joins (RewritePredicateSubquery) — scalar subqueries become broadcast
scalar values, IN/EXISTS become semi joins — so each form is
shuffle-optimal at scale, not a per-row re-execution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from de_project_airflow_etl_spark.registry import query
from de_project_airflow_etl_spark.tables import load

_AVG_BAL_SQL = """
  CAST(SUM(CAST(c_acctbal AS DECIMAL(30,4))) AS DOUBLE) / COUNT(c_acctbal)
"""


@query(
    "scalar_subquery_above_avg",
    oracle=f"""
        SELECT c_custkey, c_name, c_acctbal
        FROM customer
        WHERE c_acctbal > (SELECT {_AVG_BAL_SQL} FROM customer)
    """,
    doc="Scalar subquery: customers above the global average balance "
        "(exact decimal average so both engines compare the same value).",
    tags=("subquery", "scalar"),
)
def scalar_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    c.createOrReplaceTempView("customer")
    return spark.sql(f"""
        SELECT c_custkey, c_name, c_acctbal
        FROM customer
        WHERE c_acctbal > (SELECT {_AVG_BAL_SQL} FROM customer)
    """)


@query(
    "in_subquery_building_orders",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer
                            WHERE c_mktsegment = 'BUILDING')
    """,
    doc="IN subquery — Catalyst rewrites to a left-semi join with the "
        "filtered (broadcastable) customer set.",
    tags=("subquery", "semi"),
)
def in_subquery_building_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    o.createOrReplaceTempView("orders")
    c.createOrReplaceTempView("customer")
    return spark.sql("""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer
                            WHERE c_mktsegment = 'BUILDING')
    """)


@query(
    "correlated_exists_recent_buyers",
    oracle="""
        SELECT c_custkey, c_mktsegment
        FROM customer c
        WHERE EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
            AND o.o_totalprice > 200000
        )
    """,
    doc="Correlated EXISTS with extra predicates — decorrelated into a "
        "semi join on the filtered orders.",
    tags=("subquery", "exists"),
)
def correlated_exists_recent_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    c.createOrReplaceTempView("customer")
    o.createOrReplaceTempView("orders")
    return spark.sql("""
        SELECT c_custkey, c_mktsegment
        FROM customer c
        WHERE EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
            AND o.o_totalprice > 200000
        )
    """)


@query(
    "derived_table_top_nations",
    oracle="""
        SELECT n.n_name AS nation_name, t.customer_count
        FROM (
          SELECT c_nationkey, COUNT(*) AS customer_count
          FROM customer
          GROUP BY c_nationkey
        ) t
        JOIN nation n ON t.c_nationkey = n.n_nationkey
        WHERE t.customer_count > 50
    """,
    doc="Derived table (inline aggregate) joined back to a dimension.",
    tags=("subquery", "derived"),
)
def derived_table_top_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    t = (c.groupBy("c_nationkey")
          .agg(F.count(F.lit(1)).alias("customer_count"))
          .filter(F.col("customer_count") > 50))
    return (
        t.join(F.broadcast(n), t.c_nationkey == n.n_nationkey)
         .select(F.col("n_name").alias("nation_name"), "customer_count")
    )


@query(
    "lateral_top_orders_per_nation",
    oracle="""
        SELECT n.n_name AS nation_name, t.o_orderkey, t.o_totalprice
        FROM nation n
        JOIN LATERAL (
          SELECT o.o_orderkey, o.o_totalprice
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY o.o_totalprice DESC, o.o_orderkey
          LIMIT 2
        ) t ON TRUE
    """,
    doc="LATERAL join with a correlated ORDER BY ... LIMIT inner query: "
        "the top-2 orders per nation. Catalyst decorrelates the "
        "per-row LIMIT into a single rank-window over the joined "
        "relation (DecorrelateInnerQuery) — one shuffle on the "
        "correlation key, not a re-executed subquery per outer row, "
        "so it scales like the equivalent window query at 100 TB.",
    tags=("subquery", "lateral"),
)
def lateral_top_orders_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("nation", "customer", "orders"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql("""
        SELECT n.n_name AS nation_name, t.o_orderkey, t.o_totalprice
        FROM nation n
        JOIN LATERAL (
          SELECT o.o_orderkey, o.o_totalprice
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY o.o_totalprice DESC, o.o_orderkey
          LIMIT 2
        ) t
    """)
