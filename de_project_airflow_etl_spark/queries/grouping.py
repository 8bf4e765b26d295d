"""Multi-dimensional aggregation: ROLLUP / CUBE / GROUPING SETS / pivot.

Extension surface (reference has none, SURVEY.md §2.7). All forms plan
as a single Expand + hash-aggregate in Spark — one shuffle regardless
of the number of grouping sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from de_project_airflow_etl_spark.registry import query
from de_project_airflow_etl_spark.tables import load
from de_project_airflow_etl_spark.queries.util import dsum, sql_dsum


@query(
    "rollup_quantity",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               {sql_dsum('l_quantity', 'sum_qty')},
               COUNT(*) AS line_count
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP: hierarchical subtotals (flag, flag+status, grand total).",
    tags=("grouping",),
)
def rollup_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
          .agg(dsum("l_quantity", "sum_qty"),
               F.count(F.lit(1)).alias("line_count"))
    )


@query(
    "cube_order_priority",
    oracle=f"""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS order_count,
               {sql_dsum('o_totalprice', 'total_price')}
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE: all 2^n grouping-set combinations in one Expand pass.",
    tags=("grouping",),
)
def cube_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
         .agg(F.count(F.lit(1)).alias("order_count"),
              dsum("o_totalprice", "total_price"))
    )


@query(
    "grouping_sets_flags",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
               CAST(GROUPING(l_linestatus) AS INT) AS g_status,
               COUNT(*) AS line_count
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    doc="Explicit GROUPING SETS with GROUPING() null-vs-subtotal "
        "disambiguation.",
    tags=("grouping",),
)
def grouping_sets_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
               CAST(GROUPING(l_linestatus) AS INT) AS g_status,
               COUNT(*) AS line_count
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """)


@query(
    "pivot_status_by_segment",
    oracle="""
        SELECT c_mktsegment,
               COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS status_f,
               COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS status_o,
               COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS status_p
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c_mktsegment
    """,
    doc="PIVOT (wide conditional aggregation): order-status counts per "
        "market segment. Spark's .pivot with explicit values avoids the "
        "extra distinct-values job at scale.",
    tags=("grouping", "pivot"),
)
def pivot_status_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
         .groupBy("c_mktsegment")
         .pivot("o_orderstatus", ["F", "O", "P"])
         .agg(F.count(F.lit(1)))
         .select(F.col("c_mktsegment"),
                 F.coalesce("F", F.lit(0)).alias("status_f"),
                 F.coalesce("O", F.lit(0)).alias("status_o"),
                 F.coalesce("P", F.lit(0)).alias("status_p"))
    )


@query(
    "unpivot_nation_metrics",
    oracle="""
        WITH a AS (
          SELECT c_nationkey,
                 CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
                   AS bal_cents,
                 COUNT(*) AS n_customers
          FROM customer
          GROUP BY c_nationkey
        )
        SELECT c_nationkey, 'bal_cents' AS metric, bal_cents AS value FROM a
        UNION ALL
        SELECT c_nationkey, 'n_customers' AS metric, n_customers AS value FROM a
    """,
    doc="UNPIVOT (wide -> long melt): per-nation metric columns melted "
        "into (nation, metric, value) rows — the inverse of pivot, and "
        "the shape feature stores / metric lakes ingest. Spark's "
        ".unpivot is a zero-shuffle Expand over the aggregated rows "
        "(the only shuffle is the aggregation itself); the oracle "
        "spells it as the equivalent UNION ALL. Values are exact int64 "
        "cents so both engines agree bit-for-bit.",
    tags=("grouping", "unpivot"),
)
def unpivot_nation_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    agg = (
        c.groupBy("c_nationkey")
         .agg(F.sum(F.round(F.col("c_acctbal") * 100).cast("long"))
               .alias("bal_cents"),
              F.count(F.lit(1)).alias("n_customers"))
    )
    return agg.unpivot(["c_nationkey"], ["bal_cents", "n_customers"],
                       "metric", "value")
