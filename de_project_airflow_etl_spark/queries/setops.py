"""Set operations: UNION ALL / UNION DISTINCT / INTERSECT / EXCEPT.

Extension surface (reference has none, SURVEY.md §2.7). UNION ALL is a
zero-shuffle concatenation; the DISTINCT variants add one hash-agg
shuffle; INTERSECT/EXCEPT plan as semi/anti joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from de_project_airflow_etl_spark.registry import query
from de_project_airflow_etl_spark.tables import load


def _parties(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    c = (load(spark, sf_dir, "customer")
         .select(F.lit("customer").alias("party_type"),
                 F.col("c_nationkey").alias("nationkey"),
                 F.col("c_acctbal").alias("acctbal")))
    s = (load(spark, sf_dir, "supplier")
         .select(F.lit("supplier").alias("party_type"),
                 F.col("s_nationkey").alias("nationkey"),
                 F.col("s_acctbal").alias("acctbal")))
    return c, s


_PARTIES_SQL = """
  cust AS (SELECT 'customer' AS party_type, c_nationkey AS nationkey, c_acctbal AS acctbal FROM customer),
  supp AS (SELECT 'supplier' AS party_type, s_nationkey AS nationkey, s_acctbal AS acctbal FROM supplier)
"""


@query(
    "union_all_parties",
    oracle=f"""
        WITH {_PARTIES_SQL}
        SELECT party_type, nationkey, COUNT(*) AS party_count
        FROM (SELECT * FROM cust UNION ALL SELECT * FROM supp)
        GROUP BY party_type, nationkey
    """,
    doc="UNION ALL of schema-aligned projections, then aggregate.",
    tags=("setop",),
)
def union_all_parties(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, s = _parties(spark, sf_dir)
    return (
        c.unionByName(s)
         .groupBy("party_type", "nationkey")
         .agg(F.count(F.lit(1)).alias("party_count"))
    )


@query(
    "union_distinct_nations",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="UNION DISTINCT: concatenation + dedup shuffle.",
    tags=("setop",),
)
def union_distinct_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@query(
    "intersect_nations",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="INTERSECT (distinct semantics) — planned as a left-semi join.",
    tags=("setop",),
)
def intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "except_nations",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="EXCEPT (distinct semantics) — planned as a left-anti join.",
    tags=("setop",),
)
def except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


@query(
    "intersect_all_nations",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT ALL
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="INTERSECT ALL (bag semantics: min of the two multiplicities) — "
        "Catalyst rewrites to a counted join, no distinct collapse.",
    tags=("setop",),
)
def intersect_all_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersectAll(s)


@query(
    "except_all_nations",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT ALL
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="EXCEPT ALL (bag semantics: multiplicity difference).",
    tags=("setop",),
)
def except_all_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.exceptAll(s)
