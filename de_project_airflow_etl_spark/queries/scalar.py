"""Scalar function surface: string, date/time, math, JSON, null
handling, arrays.

Generalizes the reference's T3/T4 expressions (rename, timestamp->date
cast, SURVEY.md §2.3). All JVM-side built-ins — these stay inside
whole-stage codegen; no Python executes per row.

Portability: only functions with engine-identical semantics are used in
oracle-checked queries (no transcendentals — libm results differ in the
last ULP between the JVM and DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from de_project_airflow_etl_spark.registry import query
from de_project_airflow_etl_spark.tables import load


@query(
    "string_functions",
    oracle="""
        SELECT p_partkey,
               UPPER(p_brand) AS brand_upper,
               LOWER(p_type) AS type_lower,
               LENGTH(p_name) AS name_len,
               SUBSTR(p_name, 1, 8) AS name_prefix,
               CONCAT(p_brand, ':', p_type) AS brand_type,
               REPLACE(p_type, ' ', '_') AS type_slug,
               TRIM(p_name) AS name_trimmed
        FROM part
        WHERE p_partkey <= 500
    """,
    doc="Core string functions (SURVEY §2.3 T2/T3 generalized).",
    tags=("scalar", "string"),
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_slug"),
        F.trim("p_name").alias("name_trimmed"),
    )


@query(
    "like_regexp_filter",
    oracle="""
        SELECT p_partkey, p_name, p_type,
               regexp_extract(p_type, '([A-Z]+)$', 1) AS type_last_word
        FROM part
        WHERE p_name LIKE '%gold%' OR regexp_matches(p_type, 'BRASS|COPPER')
    """,
    doc="LIKE and regexp predicates + regexp_extract projection.",
    tags=("scalar", "string"),
)
def like_regexp_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_name").like("%gold%") | F.col("p_type").rlike("BRASS|COPPER"))
         .select("p_partkey", "p_name", "p_type",
                 F.regexp_extract("p_type", r"([A-Z]+)$", 1).alias("type_last_word"))
    )


@query(
    "date_functions",
    oracle="""
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
               CAST(EXTRACT(month FROM o_orderdate) AS INT) AS order_month,
               CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS order_quarter,
               date_trunc('month', o_orderdate) AS month_start,
               COUNT(*) AS order_count
        FROM orders
        GROUP BY 1, 2, 3, 4
    """,
    doc="Date part extraction + truncation (SURVEY §2.3 T4 generalized).",
    tags=("scalar", "date"),
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
            F.quarter("o_orderdate").alias("order_quarter"),
            F.date_trunc("month", "o_orderdate").alias("month_start"))
         .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "math_functions",
    oracle="""
        SELECT c_custkey,
               ABS(c_acctbal) AS abs_bal,
               CAST(CEIL(c_acctbal) AS BIGINT) AS ceil_bal,
               CAST(FLOOR(c_acctbal) AS BIGINT) AS floor_bal,
               ROUND(c_acctbal, 1) AS round_bal,
               SQRT(ABS(c_acctbal)) AS sqrt_bal,
               CAST(c_custkey % 7 AS BIGINT) AS mod_bucket,
               GREATEST(c_acctbal, 0.0) AS pos_bal,
               LEAST(c_acctbal, 0.0) AS neg_bal
        FROM customer
        WHERE c_custkey <= 400
    """,
    doc="Math scalar functions (IEEE-deterministic subset: abs/ceil/"
        "floor/round/sqrt/mod/greatest/least — no libm transcendentals).",
    tags=("scalar", "math"),
)
def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 400)
    return c.select(
        "c_custkey",
        F.abs("c_acctbal").alias("abs_bal"),
        F.ceil("c_acctbal").alias("ceil_bal"),
        F.floor("c_acctbal").alias("floor_bal"),
        F.round("c_acctbal", 1).alias("round_bal"),
        F.sqrt(F.abs("c_acctbal")).alias("sqrt_bal"),
        (F.col("c_custkey") % 7).alias("mod_bucket"),
        F.greatest("c_acctbal", F.lit(0.0)).alias("pos_bal"),
        F.least("c_acctbal", F.lit(0.0)).alias("neg_bal"),
    )


@query(
    "json_extraction",
    oracle="""
        SELECT event_type,
               COUNT(*) AS event_count,
               MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
               MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        FROM events
        GROUP BY event_type
    """,
    doc="Semi-structured JSON column: parse props, extract and "
        "aggregate a typed field (reference's nested-JSON capability, "
        "SURVEY §2.3 T1, as a column-level op).",
    tags=("scalar", "json"),
)
def json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.groupBy("event_type")
          .agg(F.count(F.lit(1)).alias("event_count"),
               F.min(k).alias("min_k"),
               F.max(k).alias("max_k"),
               F.sum(k).alias("sum_k"))
    )


@query(
    "null_handling",
    oracle="""
        SELECT event_id,
               COALESCE(NULLIF(event_type, 'error'), 'ok') AS type_or_ok,
               CASE WHEN value > 50 THEN 'high'
                    WHEN value > 10 THEN 'mid'
                    ELSE 'low' END AS value_band,
               (event_type = 'purchase') AS is_purchase
        FROM events
        WHERE event_id <= 2000
    """,
    doc="NULLIF/COALESCE/CASE/boolean projection.",
    tags=("scalar", "null"),
)
def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") <= 2000)
    return ev.select(
        "event_id",
        F.coalesce(F.nullif(F.col("event_type"), F.lit("error")), F.lit("ok"))
            .alias("type_or_ok"),
        F.when(F.col("value") > 50, "high")
         .when(F.col("value") > 10, "mid")
         .otherwise("low").alias("value_band"),
        (F.col("event_type") == "purchase").alias("is_purchase"),
    )


@query(
    "array_functions",
    oracle="""
        SELECT vec_id,
               len(embedding) AS dim,
               CAST(embedding[1] AS DOUBLE) AS first_component,
               CAST(list_min(embedding) AS DOUBLE) AS min_component,
               CAST(list_max(embedding) AS DOUBLE) AS max_component
        FROM embeddings
        WHERE vec_id < 200
    """,
    doc="Array column ops on the embedding vectors: size, indexing, "
        "element min/max (exact float comparisons — no accumulation).",
    tags=("scalar", "array"),
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_component"),
        F.array_min("embedding").cast("double").alias("min_component"),
        F.array_max("embedding").cast("double").alias("max_component"),
    )


@query(
    "map_functions",
    oracle="""
        WITH c AS (
          SELECT user_id, event_type, COUNT(*) AS cnt
          FROM events GROUP BY 1, 2
        )
        SELECT user_id,
               COUNT(*) AS n_types,
               string_agg(event_type || ':' || cnt, ';' ORDER BY event_type)
                 AS type_counts,
               MAX(CASE WHEN event_type = 'click' THEN cnt END) AS click_count
        FROM c GROUP BY user_id
    """,
    doc="MapType surface: per-user event_type->count built with "
        "map_from_entries over sorted entries, read back via "
        "map_entries / size / element_at. Output is stringified "
        "entry-lists so the map content is portably comparable (pandas "
        "renders Spark maps and DuckDB maps differently).",
    tags=("scalar", "map"),
)
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    counts = (ev.groupBy("user_id", "event_type")
                .agg(F.count(F.lit(1)).alias("cnt")))
    m = (counts.groupBy("user_id")
               .agg(F.map_from_entries(
                       F.array_sort(F.collect_list(
                           F.struct("event_type", "cnt"))))
                     .alias("m")))
    entry_str = F.transform(
        F.map_entries("m"),
        lambda e: F.concat_ws(":", e["key"], e["value"].cast("string")))
    return m.select(
        "user_id",
        F.size("m").alias("n_types"),
        F.concat_ws(";", entry_str).alias("type_counts"),
        F.element_at(F.col("m"), F.lit("click")).alias("click_count"),
    )


@query(
    "variant_json_events",
    oracle="""
        SELECT event_type,
               CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT))
                    AS BIGINT) AS sum_k,
               COUNT(CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT) > 50
                          THEN 1 END) AS n_high
        FROM events
        GROUP BY event_type
    """,
    doc="VARIANT type (Spark 4): parse_json once into a variant column, "
        "then typed path extraction with try_variant_get — the "
        "schema-on-read path for semi-structured columns, replacing "
        "per-access get_json_object string re-parsing. Integer "
        "aggregation keeps it engine-exact.",
    tags=("scalar", "json", "variant"),
)
def variant_json_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    v = ev.select("event_type", F.parse_json("props").alias("v"))
    k = F.try_variant_get("v", "$.k", "long")
    return (
        v.select("event_type", k.alias("k"))
         .groupBy("event_type")
         .agg(F.sum("k").alias("sum_k"),
              F.count(F.when(F.col("k") > 50, 1)).alias("n_high"))
    )


@query(
    "interval_arithmetic",
    oracle="""
        SELECT o_orderkey,
               -- 45 DAY, not 90: DuckDB normalizes intervals at 30
               -- days/month, so INTERVAL 90 DAY compares equal to
               -- INTERVAL 3 MONTH and its expression CSE collapses the
               -- two additions into one (calendar-wrong) result.
               o_orderdate + INTERVAL 45 DAY AS due_date,
               o_orderdate + INTERVAL 3 MONTH AS review_date,
               CAST(date_diff('day', o_orderdate,
                              TIMESTAMP '2000-01-01 00:00:00') AS INT)
                 AS days_to_y2k
        FROM orders
        WHERE o_orderkey < 1000
    """,
    doc="Calendar interval arithmetic: day and month addition (both "
        "engines clamp month-ends identically) and day-difference "
        "against a fixed timestamp.",
    tags=("scalar", "date", "interval"),
)
def interval_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    return o.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 45 DAY")).alias("due_date"),
        (F.col("o_orderdate") + F.expr("INTERVAL 3 MONTH")).alias("review_date"),
        F.datediff(F.lit("2000-01-01").cast("timestamp"),
                   F.col("o_orderdate")).alias("days_to_y2k"),
    )


@query(
    "sql_udf_discounted_charge",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CAST(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
                    * (100 + CAST(ROUND(l_tax * 100) AS BIGINT))
                    AS DOUBLE) / 1e6 AS charge
        FROM lineitem
        WHERE l_orderkey < 200
    """,
    doc="SQL scalar UDF surface (Spark 4 CREATE TEMPORARY FUNCTION "
        "... RETURN expr): the catalog-registered function body is "
        "inlined by the analyzer, so calling it costs the same as "
        "writing the expression — whole-stage codegen, no Python, no "
        "serialization boundary. The oracle inlines the identical "
        "exact-cents expression.",
    tags=("scalar", "udf", "catalog"),
)
def sql_udf_discounted_charge(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("sql_udf_lineitem")
    spark.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION charge_of(
            price DOUBLE, disc DOUBLE, tax DOUBLE)
        RETURNS DOUBLE
        RETURN CAST(CAST(ROUND(price * 100) AS BIGINT)
                    * (100 - CAST(ROUND(disc * 100) AS BIGINT))
                    * (100 + CAST(ROUND(tax * 100) AS BIGINT))
                    AS DOUBLE) / 1e6
    """)
    return spark.sql("""
        SELECT l_orderkey, l_linenumber,
               charge_of(l_extendedprice, l_discount, l_tax) AS charge
        FROM sql_udf_lineitem
        WHERE l_orderkey < 200
    """)
