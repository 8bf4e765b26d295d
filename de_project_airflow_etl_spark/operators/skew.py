"""Skew-mitigation utilities: key salting for joins and aggregations.

AQE's skew-join splitting (enabled in session.py) handles most join
skew at runtime, but two cases still need explicit salting at 100 TB:

* aggregations where one key holds a disproportionate share of rows
  (AQE cannot split a hash-aggregate group), and
* joins against engines/plans where AQE is unavailable or the skew is
  in the build of a single reducer's sort.

Both helpers are deterministic (salt = hash of a high-cardinality
column, never rand()) so re-runs and retries are stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_column(unique_col: str, n_salts: int) -> Column:
    """Deterministic salt in [0, n_salts): hash of a high-cardinality
    column (retry-stable, unlike rand())."""
    return F.pmod(F.hash(F.col(unique_col)), F.lit(n_salts))


def salted_agg(df: DataFrame, key: str, unique_col: str,
               aggs: list[tuple[str, str]], n_salts: int = 16) -> DataFrame:
    """Two-phase aggregation over a skewed key: partial aggregate on
    (key, salt) — spreading a hot key over n_salts reducers — then
    final merge on key. ``aggs`` is a list of (column,
    'sum'|'count'|'min'|'max') pairs (the re-aggregable functions;
    avg = sum+count composed by the caller)."""
    partial_exprs, final_exprs = [], []
    for col, fn in aggs:
        partial_name = f"__p_{fn}_{col}"
        if fn == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(partial_name))
            final_exprs.append(F.sum(partial_name).alias(f"count_{col}"))
        elif fn in ("sum", "min", "max"):
            partial_exprs.append(getattr(F, fn)(col).alias(partial_name))
            final_exprs.append(
                getattr(F, fn if fn != "sum" else "sum")(partial_name)
                .alias(f"{fn}_{col}"))
        else:
            raise ValueError(f"non-reaggregable function {fn!r}")
    return (
        df.withColumn("__salt", salt_column(unique_col, n_salts))
          .groupBy(key, "__salt")
          .agg(*partial_exprs)
          .groupBy(key)
          .agg(*final_exprs)
    )


def salted_join(skewed: DataFrame, dim: DataFrame, key: str,
                unique_col: str, n_salts: int = 16) -> DataFrame:
    """Skew-spread equi-join: the skewed side gets a deterministic salt,
    the (smaller) other side is replicated n_salts times, and the join
    key becomes (key, salt) — a hot key's rows land on n_salts reducers
    instead of one. Row-for-row equivalent to ``skewed.join(dim, key)``."""
    salted = skewed.withColumn("__salt", salt_column(unique_col, n_salts))
    replicated = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    return salted.join(replicated, [key, "__salt"]).drop("__salt")


from pyspark.sql import SparkSession  # noqa: E402

from de_project_airflow_etl_spark.registry import query  # noqa: E402
from de_project_airflow_etl_spark.tables import load  # noqa: E402


@query(
    "salted_event_counts",
    oracle="""
        SELECT event_type,
               COUNT(*) AS count_event_id,
               MAX(event_id) AS max_event_id
        FROM events
        GROUP BY event_type
    """,
    doc="Skew-salted aggregation in the driver-facing surface: "
        "salted_agg spreads each event_type over 16 deterministic salt "
        "partials before the final merge — identical result to the "
        "plain GROUP BY (same oracle), but a hot key occupies 16 "
        "reducers. The manual counterpart of AQE's skew-join splitting, "
        "for aggregations where AQE cannot help.",
    tags=("aggregate", "skew"),
)
def salted_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return salted_agg(ev, "event_type", "event_id",
                      [("event_id", "count"), ("event_id", "max")],
                      n_salts=16)


@query(
    "salted_segment_join_revenue",
    oracle="""
        SELECT c.c_mktsegment AS segment,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                    AS DOUBLE) / 100 AS revenue
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1
    """,
    doc="Skew-spread fact-dim equi-join in the driver-facing surface: "
        "the orders side gets a deterministic 16-way salt (hash of "
        "o_orderkey, retry-stable), the customer side is replicated "
        "per salt, and the join key becomes (custkey, salt) — a hot "
        "customer's orders land on 16 reducers instead of one. "
        "Row-for-row equivalent to the plain join (same oracle as a "
        "plain join+agg). This is the manual fallback when AQE skew "
        "splitting can't see the skew (e.g. the skewed side is an "
        "exchange-free scan or the join is inside a stream).",
    tags=("join", "skew"),
)
def salted_segment_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de_project_airflow_etl_spark.queries.util import dsum
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey",
                                                  "o_totalprice")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = salted_join(
        orders, cust.withColumnRenamed("c_custkey", "o_custkey"),
        key="o_custkey", unique_col="o_orderkey", n_salts=16)
    return (joined.groupBy(F.col("c_mktsegment").alias("segment"))
                  .agg(F.count(F.lit(1)).alias("n_orders"),
                       dsum("o_totalprice", "revenue")))


@query(
    "key_skew_profile",
    oracle="""
        WITH k AS (
          SELECT user_id % 97 AS key_bucket, COUNT(*) AS n_rows
          FROM events GROUP BY 1
        ), t AS (SELECT SUM(n_rows) AS total, COUNT(*) AS n_keys FROM k)
        SELECT k.key_bucket,
               k.n_rows,
               CAST(k.n_rows AS DOUBLE) / t.total AS row_share,
               CAST(k.n_rows AS DOUBLE) * t.n_keys / t.total
                 AS skew_factor,
               CAST(GREATEST(1, (k.n_rows * 32 + t.total - 1) // t.total)
                    AS BIGINT) AS recommended_salts
        FROM k CROSS JOIN t
    """,
    doc="Shuffle-skew reconnaissance: per-key row counts, share of "
        "total, skew factor (observed/uniform ratio), and the salt "
        "fan-out a 32-way reducer stage would need to level that key "
        "(ceil of the key's share of 32 reducers, exact integer math). "
        "This is the profiling pass you run BEFORE picking n_salts for "
        "salted_agg/salted_join or trusting AQE's skew split: output "
        "is one row per key (bounded by key cardinality; at billions "
        "of keys you'd top-N it after the aggregate), computed with "
        "one map-side-combinable aggregate plus a broadcast one-row "
        "totals join — no window, no second shuffle of the fact table. "
        "Keys here are user_id mod 97 hash buckets, the same bucketing "
        "a shuffle planner sees.",
    tags=("skew", "profiling", "aggregate"),
)
def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    # key-cardinality relation, materialized once: the totals side
    # derives from it, so the fact table is scanned exactly once
    # (plan-gated in tests/test_plans.py)
    k = (ev.select((F.col("user_id") % 97).alias("key_bucket"))
           .groupBy("key_bucket")
           .agg(F.count(F.lit(1)).alias("n_rows"))
           .localCheckpoint(eager=False))
    t = k.agg(F.sum("n_rows").alias("total"),
              F.count(F.lit(1)).alias("n_keys"))
    return (
        k.crossJoin(F.broadcast(t))
         .select(
             "key_bucket", "n_rows",
             (F.col("n_rows").cast("double") / F.col("total"))
                 .alias("row_share"),
             (F.col("n_rows").cast("double") * F.col("n_keys")
              / F.col("total")).alias("skew_factor"),
             F.greatest(
                 F.lit(1).cast("long"),
                 F.expr("(n_rows * 32 + total - 1) DIV total"))
              .alias("recommended_salts"))
    )
