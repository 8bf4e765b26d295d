"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``de_project_airflow_etl_spark`` (registry.py);
this module just adapts the registry to the driver's interface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from de_project_airflow_etl_spark.registry import all_queries

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (reference's daily count-distinct, SURVEY §2.4)
    on the sf0.001 events table."""
    from de_project_airflow_etl_spark.queries.flagship import daily_events
    return daily_events(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2/§7."""
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for the
    genuinely non-SQL-expressible ops — driver runs rows-only checks)."""
    return {name: q.oracle for name, q in all_queries().items()
            if q.oracle is not None}
