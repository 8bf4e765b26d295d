"""Plan assertions used by tests (and by humans via .explain).

These read the formatted physical plan string — the same text
``df.explain("formatted")`` prints — and check the scale-critical
properties: filters reached the parquet scan, projections pruned the
read schema, small sides broadcast, no cartesian products sneak in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted")


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if `fragment` appears in a scan's PushedFilters list."""
    plan = formatted_plan(df)
    return any("PushedFilters" in line and fragment in line
               for line in plan.splitlines())


def scan_read_schema(df: DataFrame) -> list[str]:
    """ReadSchema lines of every file scan in the plan."""
    return [line.strip() for line in formatted_plan(df).splitlines()
            if "ReadSchema" in line]


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or \
           "BroadcastNestedLoopJoin" in formatted_plan(df)


def has_partition_filter(df: DataFrame, fragment: str) -> bool:
    plan = formatted_plan(df)
    return any("PartitionFilters" in line and fragment in line
               for line in plan.splitlines())
