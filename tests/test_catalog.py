"""Catalog & lake-maintenance tests (D1-D3 generalized): external
table lifecycle, partition sync after out-of-band writes, retention,
and small-file compaction."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from de_project_airflow_etl_spark import catalog


@pytest.fixture()
def lake(spark, tmp_path):
    """A day-partitioned parquet lake written by path (not by table) —
    the reference's layout, where the catalog lags the filesystem."""
    path = str(tmp_path / "lake")
    df = spark.createDataFrame(
        [(i, f"2024-12-{1 + i % 3:02d}") for i in range(30)],
        "id bigint, day string")
    df.write.partitionBy("day").parquet(path)
    return path


def test_external_table_sees_synced_partitions(spark, lake):
    catalog.create_external_table(
        spark, "cat_t1", lake, "id BIGINT", "day STRING")
    assert spark.table("cat_t1").count() == 30
    assert len(catalog.partitions(spark, "cat_t1")) == 3
    rows = {r["day"]: r["cnt"] for r in
            spark.table("cat_t1").groupBy("day")
                 .agg(F.count("*").alias("cnt")).collect()}
    assert rows == {"2024-12-01": 10, "2024-12-02": 10, "2024-12-03": 10}


def test_out_of_band_partition_needs_sync(spark, lake):
    catalog.create_external_table(
        spark, "cat_t2", lake, "id BIGINT", "day STRING")
    # a writer that bypasses the catalog (the reference's pandas path)
    extra = spark.createDataFrame([(99, "2024-12-04")], "id bigint, day string")
    extra.write.mode("append").partitionBy("day").parquet(lake)
    assert spark.table("cat_t2").filter(F.col("day") == "2024-12-04").count() == 0
    catalog.sync_partitions(spark, "cat_t2")
    assert spark.table("cat_t2").filter(F.col("day") == "2024-12-04").count() == 1


def test_describe_shows_partition_spec(spark, lake):
    catalog.create_external_table(
        spark, "cat_t3", lake, "id BIGINT", "day STRING")
    desc = catalog.describe(spark, "cat_t3").collect()
    cols = {r["col_name"] for r in desc}
    assert {"id", "day", "# Partition Information"} <= cols


def test_retention_drops_old_partitions(spark, lake):
    catalog.create_external_table(
        spark, "cat_t4", lake, "id BIGINT", "day STRING")
    dropped = catalog.drop_partitions_before(
        spark, "cat_t4", "day", "2024-12-03")
    assert sorted(dropped) == ["day=2024-12-01", "day=2024-12-02"]
    assert catalog.partitions(spark, "cat_t4") == ["day=2024-12-03"]
    assert spark.table("cat_t4").count() == 10
    # metadata-only: the files are still on disk (external semantics)
    assert glob.glob(os.path.join(lake, "day=2024-12-01", "*.parquet"))


def test_compaction_preserves_rows_and_reduces_files(spark, lake):
    # fragment one partition with many small appends
    for i in range(5):
        (spark.createDataFrame([(100 + i, "2024-12-01")], "id bigint, day string")
              .write.mode("append").partitionBy("day").parquet(lake))
    part_dir = os.path.join(lake, "day=2024-12-01")
    before_files = glob.glob(os.path.join(part_dir, "*.parquet"))
    assert len(before_files) > 3
    before_rows = sorted(
        r["id"] for r in spark.read.parquet(lake)
        .filter(F.col("day") == "2024-12-01").collect())

    catalog.compact_partition(spark, lake, "day", "2024-12-01")

    after_files = glob.glob(os.path.join(part_dir, "*.parquet"))
    assert len(after_files) == 1, after_files
    after_rows = sorted(
        r["id"] for r in spark.read.parquet(lake)
        .filter(F.col("day") == "2024-12-01").collect())
    assert after_rows == before_rows
    # untouched partitions keep their rows
    assert spark.read.parquet(lake).filter(
        F.col("day") == "2024-12-02").count() == 10


def test_analyze_table_collects_stats(spark, sf_dir, tmp_path):
    """ANALYZE TABLE must land row-count statistics in the catalog —
    the input the cost-based optimizer sizes joins with."""
    from de_project_airflow_etl_spark import catalog as cat
    from de_project_airflow_etl_spark.tables import load

    path = str(tmp_path / "orders_tbl")
    load(spark, sf_dir, "orders").write.mode("overwrite").parquet(path)
    name = "analyze_stats_t1"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.sql(f"CREATE TABLE {name} USING PARQUET LOCATION '{path}'")
    cat.analyze_table(spark, name, columns=("o_custkey", "o_totalprice"))
    stats = cat.table_stats(spark, name)
    assert "Statistics" in stats, stats
    assert "rows" in stats["Statistics"], stats
    # column-level NDV visible via DESCRIBE EXTENDED <table> <col>
    col = spark.sql(
        f"DESCRIBE TABLE EXTENDED {name} o_custkey").collect()
    info = {r["info_name"]: r["info_value"] for r in col}
    assert info.get("distinct_count") not in (None, "NULL"), info
