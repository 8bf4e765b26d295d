"""The canonical TPC-H decision-support suite (Q3-Q22), adapted to the
testdata's reduced schemas (TESTDATA.md: no partsupp table; lineitem
lacks commit/receipt dates and shipmode; part lacks container/mfgr;
customer lacks phone). Each query preserves the ORIGINAL's defining
plan shape — the thing a user of the reference's Trino layer would
run — with predicates re-based onto the available columns:

* Q4/Q12/Q21 lateness: l_shipdate vs o_orderdate (+ grace) replaces
  commit/receipt-date arithmetic.
* Q9 profit: p_retailprice * quantity stands in for ps_supplycost.
* Q11 part value: lineitem revenue per part stands in for
  ps_supplycost * ps_availqty.
* Q16 "complaint" suppliers: s_acctbal < 0 replaces the comment LIKE.
* Q22 country code: c_nationkey replaces substring(c_phone).

Spark-first: every query is declarative DataFrame API — dimension
joins broadcast, EXISTS/NOT EXISTS become left-semi/left-anti joins,
correlated scalar subqueries become aggregate-then-broadcast-join,
top-k ORDER BY ... LIMIT plans as TakeOrderedAndProject. Monetary
aggregation uses the exact integer-cents construction from util.py so
results are bit-identical to the DuckDB oracles regardless of
accumulation order (multi-line ORDER BY keys are made total with key
columns so LIMIT queries are deterministic too).

Reference parity: the reference serves exactly this class of
warehouse query through Trino over the Hive catalog
(/root/reference/src/sql/query/daily_launch_events.sql is its one
example); this module is the full decision-support surface a Trino
user would expect from the replacement engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from de_project_airflow_etl_spark.registry import query
from de_project_airflow_etl_spark.tables import load
from de_project_airflow_etl_spark.queries.util import (
    cents, davg, dsum, sql_cents, sql_davg, sql_dsum,
)

# exact revenue: SUM(price_cents * (100 - disc_cents)) / 1e4 — the
# pricing_summary construction, shared by most of the suite
_SQL_REV = (f"CAST(SUM({sql_cents('l_extendedprice')}"
            f" * (100 - {sql_cents('l_discount')})) AS DOUBLE) / 1e4")


def _rev_sum(alias: str = "revenue") -> F.Column:
    # per-row product fits int64 (~1e11); the ACCUMULATION widens to
    # DECIMAL(38,0) — a long sum crosses 2^63 around sf30 and ANSI
    # mode would abort the query (the outlier_zscore_orders lesson).
    # The DuckDB oracle needs no change: SUM(BIGINT) is HUGEINT, and
    # below 2^63 both wide types convert to double exactly alike.
    return (F.sum((cents("l_extendedprice")
                   * (100 - cents("l_discount"))).cast("decimal(38,0)"))
             .cast("double") / F.lit(1e4)).alias(alias)


def _ts(s: str) -> F.Column:
    return F.lit(s).cast("timestamp")


# --------------------------------------------------------------- Q3

@query(
    "tpch_q3_shipping_priority",
    oracle=f"""
        SELECT l.l_orderkey, {_SQL_REV} AS revenue,
               o.o_orderdate, o.o_orderpriority
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-01-01'
          AND l.l_shipdate > TIMESTAMP '1998-01-01'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
        LIMIT 10
    """,
    doc="TPC-H Q3 (shipping priority): top-10 unshipped BUILDING "
        "orders by open revenue. Customer dim broadcasts; the "
        "orders-lineitem join shuffles on orderkey; final top-10 is "
        "TakeOrderedAndProject (no global sort materialization).",
    tags=("tpch", "join", "topk"),
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < _ts("1998-01-01"))
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > _ts("1998-01-01"))
    return (li.join(o, li.l_orderkey == o.o_orderkey)
              .join(F.broadcast(c), o.o_custkey == c.c_custkey)
              .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
              .agg(_rev_sum())
              .select("l_orderkey", "revenue", "o_orderdate",
                      "o_orderpriority")
              .orderBy(F.col("revenue").desc(), "o_orderdate",
                       "l_orderkey")
              .limit(10))


# --------------------------------------------------------------- Q4

@query(
    "tpch_q4_order_priority",
    oracle="""
        SELECT o.o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1997-07-01'
          AND o.o_orderdate < TIMESTAMP '1997-10-01'
          AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        GROUP BY o.o_orderpriority
    """,
    doc="TPC-H Q4 (order priority checking): orders in a quarter with "
        "at least one slow line (shipped >60 days after order date — "
        "the commit/receipt lateness re-based on available columns), "
        "counted per priority. EXISTS plans as a left-semi join on "
        "orderkey — no row duplication before the count.",
    tags=("tpch", "exists", "aggregate"),
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-07-01"))
        & (F.col("o_orderdate") < _ts("1997-10-01")))
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li, (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi")
    return (late.groupBy("o_orderpriority")
                .agg(F.count(F.lit(1)).alias("order_count")))


# --------------------------------------------------------------- Q5

@query(
    "tpch_q5_local_supplier_volume",
    oracle=f"""
        SELECT n.n_name, {_SQL_REV} AS revenue
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
                       AND s.s_nationkey = c.c_nationkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n.n_name
    """,
    doc="TPC-H Q5 (local supplier volume): revenue from orders where "
        "the supplier and customer share an ASIA nation. The "
        "customer/supplier/nation/region dims broadcast; only the "
        "orders-lineitem fact-fact join shuffles.",
    tags=("tpch", "join", "aggregate"),
)
def tpch_q5_local_supplier_volume(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_nations = (n.join(F.broadcast(r),
                           n.n_regionkey == r.r_regionkey)
                     .select("n_nationkey", "n_name"))
    c = (load(spark, sf_dir, "customer")
         .join(F.broadcast(asia_nations),
               F.col("c_nationkey") == F.col("n_nationkey"))
         .select("c_custkey", "c_nationkey", "n_name"))
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1997-01-01")))
    li = load(spark, sf_dir, "lineitem")
    return (li.join(o, li.l_orderkey == o.o_orderkey)
              .join(F.broadcast(c), o.o_custkey == c.c_custkey)
              .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey)
                    & (s.s_nationkey == c.c_nationkey))
              .groupBy("n_name")
              .agg(_rev_sum()))


# --------------------------------------------------------------- Q6

@query(
    "tpch_q6_forecast_revenue",
    oracle=f"""
        SELECT CAST(SUM({sql_cents('l_extendedprice')}
                        * {sql_cents('l_discount')}) AS DOUBLE) / 1e4
               AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    doc="TPC-H Q6 (forecasting revenue change): pure scan-aggregate "
        "with every predicate pushed into the parquet scan — the "
        "query that measures raw scan bandwidth at 100 TB.",
    tags=("tpch", "scan", "aggregate"),
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (li.filter((F.col("l_shipdate") >= _ts("1997-01-01"))
                      & (F.col("l_shipdate") < _ts("1998-01-01"))
                      & (F.col("l_discount") >= 0.05)
                      & (F.col("l_discount") <= 0.07)
                      & (F.col("l_quantity") < 24))
              .agg((F.sum((cents("l_extendedprice")
                           * cents("l_discount")).cast("decimal(38,0)"))
                     .cast("double") / F.lit(1e4)).alias("revenue")))


# --------------------------------------------------------------- Q7

@query(
    "tpch_q7_volume_shipping",
    oracle=f"""
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS l_year,
               {_SQL_REV} AS revenue
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation sn ON sn.n_nationkey = s.s_nationkey
        JOIN nation cn ON cn.n_nationkey = c.c_nationkey
        WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
            OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q7 (volume shipping): bilateral trade volume between "
        "two nations per ship year. Both nation sides broadcast; the "
        "disjunctive nation-pair predicate is applied after the "
        "joins, exactly as the original.",
    tags=("tpch", "join", "aggregate"),
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    s = (load(spark, sf_dir, "supplier")
         .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
         .select("s_suppkey", F.col("n_name").alias("supp_nation")))
    c = (load(spark, sf_dir, "customer")
         .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
         .select("c_custkey", F.col("n_name").alias("cust_nation")))
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01")))
    pair = ((F.col("supp_nation") == "NATION_1")
            & (F.col("cust_nation") == "NATION_2")) | \
           ((F.col("supp_nation") == "NATION_2")
            & (F.col("cust_nation") == "NATION_1"))
    return (li.join(o, li.l_orderkey == o.o_orderkey)
              .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
              .join(F.broadcast(c), o.o_custkey == c.c_custkey)
              .filter(pair)
              .groupBy("supp_nation", "cust_nation",
                       F.year("l_shipdate").cast("long").alias("l_year"))
              .agg(_rev_sum()))


# --------------------------------------------------------------- Q8

@query(
    "tpch_q8_market_share",
    oracle=f"""
        WITH vol AS (
          SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT)
                   AS o_year,
                 {sql_cents('l.l_extendedprice')}
                   * (100 - {sql_cents('l.l_discount')}) AS volume_c,
                 sn.n_name AS supp_nation
          FROM part p
          JOIN lineitem l ON p.p_partkey = l.l_partkey
          JOIN supplier s ON s.s_suppkey = l.l_suppkey
          JOIN orders o ON o.o_orderkey = l.l_orderkey
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN nation cn ON cn.n_nationkey = c.c_nationkey
          JOIN region r ON r.r_regionkey = cn.n_regionkey
          JOIN nation sn ON sn.n_nationkey = s.s_nationkey
          WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
            AND o.o_orderdate >= TIMESTAMP '1996-01-01'
            AND o.o_orderdate < TIMESTAMP '1998-01-01'
        )
        SELECT o_year,
               CAST(SUM(CASE WHEN supp_nation = 'NATION_1'
                             THEN volume_c ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(volume_c) AS DOUBLE) AS mkt_share
        FROM vol GROUP BY o_year
    """,
    doc="TPC-H Q8 (national market share): NATION_1's share of PROMO "
        "part revenue sold into ASIA, per order year. The share is a "
        "ratio of two exact integer-cent sums — one double division "
        "at the end, so partial-aggregation order cannot move it.",
    tags=("tpch", "join", "aggregate"),
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia = (n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
             .select(F.col("n_nationkey").alias("cnk")))
    c = (load(spark, sf_dir, "customer")
         .join(F.broadcast(asia), F.col("c_nationkey") == F.col("cnk"))
         .select("c_custkey"))
    sn = n.select("n_nationkey", F.col("n_name").alias("supp_nation"))
    s = (load(spark, sf_dir, "supplier")
         .join(F.broadcast(sn), F.col("s_nationkey") == F.col("n_nationkey"))
         .select("s_suppkey", "supp_nation"))
    p = load(spark, sf_dir, "part").filter(
        F.col("p_type") == "PROMO").select("p_partkey")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01")))
    li = load(spark, sf_dir, "lineitem")
    vol_c = (cents("l_extendedprice")
             * (100 - cents("l_discount"))).cast("decimal(38,0)")
    return (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
              .join(o, li.l_orderkey == o.o_orderkey)
              .join(F.broadcast(c), o.o_custkey == c.c_custkey)
              .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
              .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
              .agg((F.sum(F.when(F.col("supp_nation") == "NATION_1",
                                 vol_c).otherwise(F.lit(0)))
                     .cast("double")
                    / F.sum(vol_c).cast("double")).alias("mkt_share")))


# --------------------------------------------------------------- Q9

@query(
    "tpch_q9_product_profit",
    oracle=f"""
        SELECT n.n_name AS nation,
               CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT)
                 AS o_year,
               CAST(SUM({sql_cents('l.l_extendedprice')}
                        * (100 - {sql_cents('l.l_discount')})
                        - {sql_cents('p.p_retailprice')}
                          * CAST(ROUND(l.l_quantity) AS BIGINT) * 100)
                    AS DOUBLE) / 1e4 AS profit
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE p.p_type = 'ECONOMY'
        GROUP BY 1, 2
    """,
    doc="TPC-H Q9 (product type profit): profit on ECONOMY parts per "
        "supplier nation and year, with p_retailprice * quantity "
        "standing in for the missing ps_supplycost. All profit "
        "arithmetic in exact integer cents (quantity is integral in "
        "the testdata, FIXTURES.md).",
    tags=("tpch", "join", "aggregate"),
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(
        F.col("p_type") == "ECONOMY").select("p_partkey", "p_retailprice")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    s = (load(spark, sf_dir, "supplier")
         .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
         .select("s_suppkey", F.col("n_name").alias("nation")))
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem")
    profit_c = (cents("l_extendedprice") * (100 - cents("l_discount"))
                - cents("p_retailprice")
                  * F.round(F.col("l_quantity")).cast("long") * 100)
    return (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
              .join(o, li.l_orderkey == o.o_orderkey)
              .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
              .groupBy("nation",
                       F.year("o_orderdate").cast("long").alias("o_year"))
              .agg((F.sum(profit_c).cast("double") / F.lit(1e4))
                   .alias("profit")))


# -------------------------------------------------------------- Q10

@query(
    "tpch_q10_returned_items",
    oracle=f"""
        SELECT c.c_custkey, c.c_name, {_SQL_REV} AS revenue,
               c.c_acctbal, n.n_name, c.c_mktsegment
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        WHERE o.o_orderdate >= TIMESTAMP '1997-10-01'
          AND o.o_orderdate < TIMESTAMP '1998-01-01'
          AND l.l_returnflag = 'R'
        GROUP BY 1, 2, 4, 5, 6
        ORDER BY revenue DESC, c.c_custkey
        LIMIT 20
    """,
    doc="TPC-H Q10 (returned item reporting): top-20 customers by "
        "lost revenue on returned lines in a quarter. Customer and "
        "nation dims broadcast; top-20 is TakeOrderedAndProject with "
        "a total (revenue, custkey) order.",
    tags=("tpch", "join", "topk"),
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    c = (load(spark, sf_dir, "customer")
         .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
         .select("c_custkey", "c_name", "c_acctbal", "n_name",
                 "c_mktsegment"))
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-10-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01")))
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R")
    return (li.join(o, li.l_orderkey == o.o_orderkey)
              .join(F.broadcast(c), o.o_custkey == c.c_custkey)
              .groupBy("c_custkey", "c_name", "c_acctbal", "n_name",
                       "c_mktsegment")
              .agg(_rev_sum())
              .select("c_custkey", "c_name", "revenue", "c_acctbal",
                      "n_name", "c_mktsegment")
              .orderBy(F.col("revenue").desc(), "c_custkey")
              .limit(20))


# -------------------------------------------------------------- Q11

@query(
    "tpch_q11_important_parts",
    oracle=f"""
        WITH part_value AS (
          SELECT l_partkey,
                 SUM({sql_cents('l_extendedprice')}
                     * (100 - {sql_cents('l_discount')})) AS iv
          FROM lineitem GROUP BY l_partkey
        )
        SELECT l_partkey, CAST(iv AS DOUBLE) / 1e4 AS value
        FROM part_value
        WHERE CAST(iv AS DECIMAL(38,0)) * 10000 >
              (SELECT SUM(CAST(iv AS DECIMAL(38,0))) * 8 FROM part_value)
    """,
    doc="TPC-H Q11 (important stock): parts whose lineitem revenue "
        "exceeds a fraction of the corpus total (revenue stands in "
        "for the missing ps_supplycost*availqty). The scalar "
        "threshold is a one-row broadcast against the reused "
        "per-part aggregate — the aggregate is computed once. The "
        "value > 0.0008 * total comparison is done entirely on the "
        "exact integer revenue units (iv * 10^4 > total_iv * 8, in "
        "DECIMAL(38,0) so it cannot overflow at any SF): summing the "
        "per-part DOUBLEs for the threshold would make the cut "
        "accumulation-order dependent and the borderline parts "
        "engine-dependent.",
    tags=("tpch", "subquery", "aggregate"),
)
def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    pv = (li.groupBy("l_partkey")
            .agg(F.sum(cents("l_extendedprice")
                       * (100 - cents("l_discount"))).alias("iv"))
            .localCheckpoint(eager=False))  # reuse, don't recompute
    thresh = pv.agg(F.sum(F.col("iv").cast("decimal(38,0)")).alias("ti"))
    return (pv.crossJoin(F.broadcast(thresh))
              .filter(F.col("iv").cast("decimal(38,0)") * 10000
                      > F.col("ti") * 8)
              .select("l_partkey",
                      (F.col("iv").cast("double") / F.lit(1e4))
                      .alias("value")))


# -------------------------------------------------------------- Q12

@query(
    "tpch_q12_late_lines_by_status",
    oracle="""
        SELECT l.l_linestatus,
               CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o.o_orderpriority NOT IN
                             ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
          AND l.l_shipdate >= TIMESTAMP '1997-01-01'
          AND l.l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY 1
    """,
    doc="TPC-H Q12 (shipping modes / priority): late lines (shipped "
        ">90 days after order — lateness re-based from the missing "
        "commit/receipt dates; l_linestatus re-bases the missing "
        "shipmode) counted by order-priority class. The CASE-sum "
        "pivot rides one fact-fact join.",
    tags=("tpch", "join", "aggregate"),
)
def tpch_q12_late_lines_by_status(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01")))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (li.join(o, (li.l_orderkey == o.o_orderkey)
                    & (li.l_shipdate > o.o_orderdate
                       + F.expr("INTERVAL 90 DAYS")))
              .groupBy("l_linestatus")
              .agg(F.sum(F.when(high, 1).otherwise(0))
                    .alias("high_line_count"),
                   F.sum(F.when(~high, 1).otherwise(0))
                    .alias("low_line_count")))


# -------------------------------------------------------------- Q13

@query(
    "tpch_q13_customer_distribution",
    oracle="""
        SELECT c_count, COUNT(*) AS custdist
        FROM (
          SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
          FROM customer c
          LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                            AND o.o_orderpriority <> '1-URGENT'
          GROUP BY c.c_custkey
        )
        GROUP BY c_count
    """,
    doc="TPC-H Q13 (customer distribution): order-count histogram "
        "over ALL customers including zero-order ones — the LEFT "
        "join with the filter in the JOIN condition (not WHERE) is "
        "the defining feature; two chained aggregations, the second "
        "over #customers rows.",
    tags=("tpch", "join", "aggregate"),
)
def tpch_q13_customer_distribution(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT")
    per_cust = (c.join(o, c.c_custkey == o.o_custkey, "left")
                 .groupBy(c.c_custkey)
                 .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
                    .agg(F.count(F.lit(1)).alias("custdist")))


# -------------------------------------------------------------- Q14

@query(
    "tpch_q14_promo_effect",
    oracle=f"""
        SELECT 100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                 THEN {sql_cents('l.l_extendedprice')}
                      * (100 - {sql_cents('l.l_discount')})
                 ELSE 0 END) AS DOUBLE)
               / CAST(SUM({sql_cents('l.l_extendedprice')}
                      * (100 - {sql_cents('l.l_discount')})) AS DOUBLE)
               AS promo_revenue_pct
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
          AND l.l_shipdate < TIMESTAMP '1997-10-01'
    """,
    doc="TPC-H Q14 (promotion effect): PROMO share of one month's "
        "revenue. Part dim broadcasts into the scan; the percentage "
        "is a ratio of exact cent sums with one double division.",
    tags=("tpch", "join", "aggregate"),
)
def tpch_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-09-01"))
        & (F.col("l_shipdate") < _ts("1997-10-01")))
    vol_c = (cents("l_extendedprice")
             * (100 - cents("l_discount"))).cast("decimal(38,0)")
    return (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
              .agg((F.lit(100.0)
                    * F.sum(F.when(F.col("p_type") == "PROMO", vol_c)
                             .otherwise(F.lit(0))).cast("double")
                    / F.sum(vol_c).cast("double"))
                   .alias("promo_revenue_pct")))


# -------------------------------------------------------------- Q15

@query(
    "tpch_q15_top_supplier",
    oracle=f"""
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no, {_SQL_REV} AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate < TIMESTAMP '1997-04-01'
          GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, r.total_revenue
        FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    doc="TPC-H Q15 (top supplier): supplier(s) achieving the maximum "
        "quarterly revenue — the view + scalar-max-subquery shape. "
        "The revenue aggregate is computed once (checkpointed) and "
        "the max is a one-row broadcast; exact cents make revenue "
        "equality well-defined across engines.",
    tags=("tpch", "subquery", "aggregate"),
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1997-04-01")))
    rev = (li.groupBy(F.col("l_suppkey").alias("supplier_no"))
             .agg(_rev_sum("total_revenue"))
             .localCheckpoint(eager=False))
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (rev.crossJoin(F.broadcast(mx))
               .filter(F.col("total_revenue") == F.col("mx"))
               .join(F.broadcast(s),
                     F.col("supplier_no") == F.col("s_suppkey"))
               .select("s_suppkey", "s_name", "total_revenue"))


# -------------------------------------------------------------- Q16

@query(
    "tpch_q16_part_supplier_counts",
    oracle="""
        SELECT p.p_brand, p.p_type, p.p_size,
               COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand <> 'Brand#2'
          AND p.p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
          AND l.l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q16 (parts/supplier relationship): distinct supplier "
        "counts per (brand, type, size) — lineitem links stand in "
        "for the missing partsupp, and negative-balance suppliers "
        "stand in for the comment-LIKE complaint filter. NOT IN "
        "plans as a broadcast left-anti join (the supplier exclusion "
        "list is provably non-null).",
    tags=("tpch", "join", "distinct"),
)
def tpch_q16_part_supplier_counts(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#2")
        & F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45))
    bad = load(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0).select("s_suppkey")
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (li.join(F.broadcast(bad),
                    li.l_suppkey == bad.s_suppkey, "left_anti")
              .join(F.broadcast(p), li.l_partkey == p.p_partkey)
              .groupBy("p_brand", "p_type", "p_size")
              .agg(F.count_distinct("l_suppkey").alias("supplier_cnt")))


# -------------------------------------------------------------- Q17

@query(
    "tpch_q17_small_quantity_revenue",
    oracle=f"""
        WITH avg_qty AS (
          SELECT l_partkey,
                 CAST(SUM({sql_cents('l_quantity')}) AS DOUBLE)
                   / 100 / COUNT(*) AS aq
          FROM lineitem GROUP BY l_partkey
        )
        SELECT CAST(SUM({sql_cents('l.l_extendedprice')}) AS DOUBLE)
               / 100 / 7.0 AS avg_yearly
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN avg_qty a ON a.l_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#15'
          AND l.l_quantity < 0.2 * a.aq
    """,
    doc="TPC-H Q17 (small-quantity-order revenue): revenue lost to "
        "orders below 20% of a part's average quantity. The "
        "correlated scalar subquery becomes a per-part aggregate "
        "joined back (broadcast — #parts rows); the average is an "
        "exact cents-sum with one double division so the 0.2*avg "
        "comparison is bit-identical on both engines.",
    tags=("tpch", "subquery", "aggregate"),
)
def tpch_q17_small_quantity_revenue(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    avg_qty = (li.groupBy(F.col("l_partkey").alias("ap"))
                 .agg((F.sum(cents("l_quantity")).cast("double")
                       / F.lit(100) / F.count(F.lit(1))).alias("aq")))
    p = load(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#15").select("p_partkey")
    return (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
              .join(F.broadcast(avg_qty), li.l_partkey == F.col("ap"))
              .filter(F.col("l_quantity") < 0.2 * F.col("aq"))
              .agg((F.sum(cents("l_extendedprice")).cast("double")
                    / F.lit(100) / F.lit(7.0)).alias("avg_yearly")))


# -------------------------------------------------------------- Q18

@query(
    "tpch_q18_large_volume_customers",
    oracle=f"""
        SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
               o.o_totalprice, {sql_dsum('l.l_quantity', 'total_qty')}
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderkey IN (
          SELECT l_orderkey FROM lineitem
          GROUP BY l_orderkey HAVING SUM(l_quantity) > 300)
        GROUP BY 1, 2, 3, 4, 5
    """,
    doc="TPC-H Q18 (large volume customers): orders whose total "
        "quantity exceeds 300 with their customers. The IN-subquery "
        "is a groupBy-HAVING then a semi join on orderkey; quantity "
        "sums in exact cents.",
    tags=("tpch", "subquery", "join"),
)
def tpch_q18_large_volume_customers(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    big = (li.groupBy("l_orderkey")
             .agg(F.sum("l_quantity").alias("q"))
             .filter(F.col("q") > 300)
             .select(F.col("l_orderkey").alias("big_ok")))
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = load(spark, sf_dir, "orders")
    return (li.join(big, li.l_orderkey == F.col("big_ok"), "left_semi")
              .join(o, li.l_orderkey == o.o_orderkey)
              .join(F.broadcast(c), o.o_custkey == c.c_custkey)
              .groupBy("c_name", "c_custkey", "o_orderkey",
                       "o_orderdate", "o_totalprice")
              .agg(dsum("l_quantity", "total_qty")))


# -------------------------------------------------------------- Q19

@query(
    "tpch_q19_disjunctive_revenue",
    oracle=f"""
        SELECT {_SQL_REV} AS revenue
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
               AND l.l_quantity BETWEEN 1 AND 11)
           OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
               AND l.l_quantity BETWEEN 10 AND 20)
           OR (p.p_brand = 'Brand#15' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 (discounted revenue): the disjunction-of-"
        "conjunctions predicate spanning both join sides — the "
        "optimizer must still extract the p_partkey equi-join and "
        "evaluate the OR as a post-join filter rather than falling "
        "back to a cartesian product (plan-gated).",
    tags=("tpch", "join", "aggregate"),
)
def tpch_q19_disjunctive_revenue(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = load(spark, sf_dir, "lineitem")
    cond = (((F.col("p_brand") == "Brand#12")
             & F.col("p_size").between(1, 5)
             & F.col("l_quantity").between(1, 11))
            | ((F.col("p_brand") == "Brand#23")
               & F.col("p_size").between(1, 10)
               & F.col("l_quantity").between(10, 20))
            | ((F.col("p_brand") == "Brand#15")
               & F.col("p_size").between(1, 15)
               & F.col("l_quantity").between(20, 30)))
    return (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
              .filter(cond)
              .agg(_rev_sum()))


# -------------------------------------------------------------- Q20

@query(
    "tpch_q20_promo_part_suppliers",
    oracle="""
        SELECT s.s_suppkey, s.s_name, s.s_nationkey
        FROM supplier s
        WHERE s.s_suppkey IN (
          SELECT l.l_suppkey
          FROM lineitem l
          JOIN part p ON p.p_partkey = l.l_partkey
          WHERE p.p_type = 'PROMO'
            AND l.l_shipdate >= TIMESTAMP '1997-01-01'
            AND l.l_shipdate < TIMESTAMP '1998-01-01'
          GROUP BY l.l_suppkey, l.l_partkey
          HAVING SUM(l.l_quantity) > 50)
    """,
    doc="TPC-H Q20 (potential part promotion): suppliers who moved "
        ">50 units of some PROMO part in 1997 — the nested "
        "IN-with-aggregate chain (lineitem totals stand in for the "
        "missing partsupp availqty rule). Plans as aggregate -> "
        "distinct suppkeys -> semi join.",
    tags=("tpch", "subquery", "join"),
)
def tpch_q20_promo_part_suppliers(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(
        F.col("p_type") == "PROMO").select("p_partkey")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01")))
    movers = (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
                .groupBy("l_suppkey", "l_partkey")
                .agg(F.sum("l_quantity").alias("q"))
                .filter(F.col("q") > 50)
                .select("l_suppkey"))
    s = load(spark, sf_dir, "supplier")
    return (s.join(movers, s.s_suppkey == movers.l_suppkey, "left_semi")
             .select("s_suppkey", "s_name", "s_nationkey"))


# -------------------------------------------------------------- Q21

@query(
    "tpch_q21_waiting_suppliers",
    oracle="""
        WITH late AS (
          SELECT DISTINCT l.l_suppkey, l.l_orderkey
          FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
          WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
        )
        SELECT s.s_name, COUNT(*) AS numwait
        FROM late t
        JOIN supplier s ON s.s_suppkey = t.l_suppkey
        WHERE EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = t.l_orderkey
              AND l2.l_suppkey <> t.l_suppkey)
          AND NOT EXISTS (
            SELECT 1 FROM late l3
            WHERE l3.l_orderkey = t.l_orderkey
              AND l3.l_suppkey <> t.l_suppkey)
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name
        LIMIT 25
    """,
    doc="TPC-H Q21 (suppliers who kept orders waiting): suppliers "
        "solely responsible for lateness on multi-supplier orders "
        "(late = shipped >90 days after order date, re-based from "
        "the missing commit/receipt dates). The EXISTS / NOT EXISTS "
        "pair becomes a semi join against other-supplier lines and "
        "an anti join against other-supplier LATE lines, both equi "
        "on orderkey, so the planner sizes each side: locally the "
        "semi builds a broadcast, at cluster scale it becomes a "
        "sort-merge join co-partitioned with the anti's exchange. "
        "The textbook per-order countDistinct rewrites (two "
        "aggregates, or one Expand-based multi-distinct) were "
        "measured 1.6x and 2.3x SLOWER at sf0.1 — Expand triples "
        "the fact rows before the exchange — and shuffle the same "
        "order of bytes, so the join form stays.",
    tags=("tpch", "exists", "join", "topk"),
)
def tpch_q21_waiting_suppliers(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey",
                                                "l_shipdate")
    late = (li.join(o, (li.l_orderkey == o.o_orderkey)
                    & (li.l_shipdate > o.o_orderdate
                       + F.expr("INTERVAL 90 DAYS")))
              .select("l_orderkey", "l_suppkey").distinct()
              .localCheckpoint(eager=False))  # used three times below
    other = (li.select(F.col("l_orderkey").alias("ok2"),
                       F.col("l_suppkey").alias("sk2")))
    other_late = (late.select(F.col("l_orderkey").alias("ok3"),
                              F.col("l_suppkey").alias("sk3")))
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    t = (late
         .join(other, (F.col("l_orderkey") == F.col("ok2"))
               & (F.col("l_suppkey") != F.col("sk2")), "left_semi")
         .join(other_late, (F.col("l_orderkey") == F.col("ok3"))
               & (F.col("l_suppkey") != F.col("sk3")), "left_anti"))
    return (t.join(F.broadcast(s), t.l_suppkey == s.s_suppkey)
             .groupBy("s_name")
             .agg(F.count(F.lit(1)).alias("numwait"))
             .orderBy(F.col("numwait").desc(), "s_name")
             .limit(25))


# -------------------------------------------------------------- Q22

@query(
    "tpch_q22_dormant_balances",
    oracle=f"""
        WITH avg_bal AS (
          SELECT CAST(SUM({sql_cents('c_acctbal')}) AS DOUBLE)
                   / 100 / COUNT(*) AS ab
          FROM customer WHERE c_acctbal > 0.0
        )
        SELECT c.c_nationkey AS cntrycode, COUNT(*) AS numcust,
               {sql_dsum('c.c_acctbal', 'totacctbal')}
        FROM customer c, avg_bal
        WHERE c.c_acctbal > avg_bal.ab
          AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate >= TIMESTAMP '1999-01-01')
        GROUP BY c.c_nationkey
    """,
    doc="TPC-H Q22 (global sales opportunity): above-average-balance "
        "customers with no recent orders, grouped by country "
        "(c_nationkey re-bases the missing phone country code; "
        "dormant-since-1999 re-bases no-orders-at-all so the result "
        "is non-empty on this data). Scalar avg broadcasts; NOT "
        "EXISTS is an anti join on custkey.",
    tags=("tpch", "exists", "aggregate"),
)
def tpch_q22_dormant_balances(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    avg_bal = (c.filter(F.col("c_acctbal") > 0.0)
                .agg((F.sum(cents("c_acctbal")).cast("double")
                      / F.lit(100) / F.count(F.lit(1))).alias("ab")))
    recent = (load(spark, sf_dir, "orders")
              .filter(F.col("o_orderdate") >= _ts("1999-01-01"))
              .select("o_custkey"))
    return (c.crossJoin(F.broadcast(avg_bal))
             .filter(F.col("c_acctbal") > F.col("ab"))
             .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
             .groupBy(F.col("c_nationkey").alias("cntrycode"))
             .agg(F.count(F.lit(1)).alias("numcust"),
                  dsum("c_acctbal", "totacctbal")))
