"""Query registry: one named entry per implemented operator.

Every operator from SURVEY.md §2 (and the §7 generalized surface) is
registered here as a ``Query``: a Spark callable ``(spark, sf_dir) ->
DataFrame`` plus, where SQL-expressible, the ANSI-SQL oracle string the
driver runs through DuckDB on the same parquet tables.

Determinism contract (the driver hashes values order-insensitively but
exactly):

* Alias every computed column identically in the Spark plan and the
  oracle SQL.
* Monetary/double aggregations go through DECIMAL so partial-aggregation
  order cannot perturb the result; final values are cast back to DOUBLE
  (exact decimal -> nearest double is deterministic on both engines).
* Timestamps are cast to DATE explicitly on both sides when grouping by
  day (testdata ships timestamps, FIXTURES.md §3).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None, doc: str = "",
          tags: tuple[str, ...] = ()) -> Callable[[QueryFn], QueryFn]:
    """Decorator registering a query implementation."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle,
                                doc=doc or (fn.__doc__ or ""), tags=tags)
        return fn

    return wrap


def all_queries() -> dict[str, Query]:
    """Import every query module and return the registry.

    Import order == registration order == the order the driver walks
    ``queries()``.  The driver's per-round correctness run can truncate
    (round 1 stopped after 50 entries), so the families that most need a
    driver oracle row — the LLM-pipeline operators, streaming, and
    timeseries — register FIRST, ahead of the long-green relational
    families.
    """
    # Imports deferred so `import registry` never costs a Spark session.
    from de_project_airflow_etl_spark.operators import (  # noqa: F401
        dedup, similarity, text, multimodal, corpus, skew, udtf_ops,
    )
    from de_project_airflow_etl_spark.streaming import (  # noqa: F401
        ingest, stateful, upsert,
    )
    from de_project_airflow_etl_spark.queries import (  # noqa: F401
        timeseries, scalar, subqueries, grouping,
        flagship, etl, aggregates_ext, relational, joins, windows, setops,
    )
    return dict(_REGISTRY)
