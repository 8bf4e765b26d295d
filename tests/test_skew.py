"""Salting utilities: result-equivalence with the unsalted forms on a
deliberately skewed dataset, and the spread property (a hot key
occupies n_salts groups in the partial phase)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from de_project_airflow_etl_spark.operators.skew import (
    salt_column, salted_agg, salted_join,
)


@pytest.fixture(scope="module")
def skewed_df(spark):
    """90% of rows share key 'hot'."""
    return spark.range(2000).select(
        F.col("id"),
        F.when(F.col("id") % 10 != 0, "hot")
         .otherwise(F.concat(F.lit("k"), F.col("id") % 7)).alias("key"),
        (F.col("id") % 100).cast("double").alias("val"),
    )


def test_salted_agg_matches_plain(spark, skewed_df):
    plain = {(r["key"], r["sum_val"], r["count_val"], r["max_val"]) for r in
             skewed_df.groupBy("key")
                      .agg(F.sum("val").alias("sum_val"),
                           F.count(F.lit(1)).alias("count_val"),
                           F.max("val").alias("max_val")).collect()}
    salted = {(r["key"], r["sum_val"], r["count_val"], r["max_val"]) for r in
              salted_agg(skewed_df, "key", "id",
                         [("val", "sum"), ("val", "count"), ("val", "max")],
                         n_salts=8).collect()}
    assert salted == plain


def test_salt_spreads_hot_key(spark, skewed_df):
    groups = (skewed_df.withColumn("s", salt_column("id", 8))
                       .filter(F.col("key") == "hot")
                       .select("s").distinct().count())
    assert groups == 8  # the hot key now occupies 8 partial groups


def test_salted_join_matches_plain(spark, skewed_df):
    dim = spark.createDataFrame(
        [("hot", "HOT"), ("k0", "A"), ("k1", "B"), ("k2", "C")],
        "key string, attr string")
    plain = sorted((r["id"], r["attr"]) for r in
                   skewed_df.join(dim, "key").collect())
    salted = sorted((r["id"], r["attr"]) for r in
                    salted_join(skewed_df, dim, "key", "id", 8).collect())
    assert salted == plain
