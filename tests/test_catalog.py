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


HIVE_SCENARIO = r"""
import os, sys, tempfile
base = tempfile.mkdtemp(prefix="hive_e2e_")
os.chdir(base)  # derby writes derby.log to cwd
from de_project_airflow_etl_spark.session import get_hive_spark
from de_project_airflow_etl_spark.pipeline.launch_etl import LaunchPipeline
from de_project_airflow_etl_spark.pipeline.fixtures import launch_day_payload
from de_project_airflow_etl_spark import catalog

spark = get_hive_spark(os.path.join(base, "meta"))
assert spark.conf.get("spark.sql.catalogImplementation") == "hive"

# D2: USE schema against the metastore
spark.sql("CREATE DATABASE IF NOT EXISTS lakehouse")
spark.sql("USE lakehouse")

# full pipeline through the hive catalog: ingest->transform->publish,
# external table DDL with column comments, MSCK partition sync
p = LaunchPipeline(spark, os.path.join(base, "lake"),
                   table_name="launch_events")
p.run("2024-12-01", lambda d: launch_day_payload(d, 5))
p.run("2024-12-02", lambda d: launch_day_payload(d, 4))
p.register_table()
counts = {r["net"].isoformat(): r["event_count"]
          for r in p.daily_launch_events().collect()}
assert counts == {"2024-12-01": 5, "2024-12-02": 4}, counts

# metastore records the column COMMENTs (reference DDL parity)
desc = {r["col_name"]: r["comment"]
        for r in catalog.describe(spark, "launch_events").collect()
        if r["comment"]}
assert desc.get("id") == "Unique identifier for the event", desc
assert desc.get("license") == "License information", desc

# out-of-band partition + MSCK through the metastore
p.run("2024-12-03", lambda d: launch_day_payload(d, 3))
p.sync_partitions()
assert len(catalog.partitions(spark, "launch_events")) == 3

# re-run an interval AFTER registration: dynamic overwrite must
# replace one partition and the metastore table must see fresh data
p.run("2024-12-02", lambda d: launch_day_payload(d, 4))
counts = {r["net"].isoformat(): r["event_count"]
          for r in p.daily_launch_events().collect()}
assert counts == {"2024-12-01": 5, "2024-12-02": 4, "2024-12-03": 3}

# External LOCATION as an explicit filesystem URI (file://...), the
# sandbox analog of the reference's s3a://lake/... locations
# (trino/catalog/hive.properties + metastore-site.xml fs.s3a keys):
# the metastore must store and resolve the URI form, and MSCK must
# discover partitions through the Hadoop FileSystem for that scheme —
# the exact code path a MinIO deployment exercises with s3a URIs.
spark.sql(f'''
    CREATE TABLE launch_events_uri (
      id STRING, url STRING, name STRING, status STRING,
      image_url STRING, license STRING
    )
    USING PARQUET
    PARTITIONED BY (net DATE)
    LOCATION 'file://{os.path.join(base, "lake", "reports", "launch")}'
''')
spark.sql("MSCK REPAIR TABLE launch_events_uri")
uri_counts = {r["net"].isoformat(): r["n"]
              for r in spark.sql(
                  "SELECT net, COUNT(DISTINCT id) AS n "
                  "FROM launch_events_uri GROUP BY net").collect()}
assert uri_counts == counts, (uri_counts, counts)
loc = [r["data_type"] for r in
       spark.sql("DESCRIBE FORMATTED launch_events_uri").collect()
       if r["col_name"] == "Location"]
assert loc and loc[0].startswith("file:"), loc
print("HIVE_E2E_OK")
"""


def test_hive_metastore_catalog_end_to_end():
    """The reference resolves every table through a Hive metastore;
    run the whole pipeline + DDL + MSCK against Spark's Hive catalog
    (embedded derby). Subprocess because catalogImplementation is
    fixed at first-session creation per JVM."""
    import subprocess
    import sys

    res = subprocess.run(
        [sys.executable, "-c", HIVE_SCENARIO],
        capture_output=True, text=True, timeout=300,
        env={**os.environ, "PYTHONPATH": os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))},
    )
    if "java.sql.SQLException" in res.stderr and "Derby" in res.stderr:
        pytest.skip(f"derby metastore unusable in this container: "
                    f"{res.stderr[-500:]}")
    assert res.returncode == 0, res.stderr[-3000:]
    assert "HIVE_E2E_OK" in res.stdout


def test_object_store_profile_wires_s3a_confs(monkeypatch):
    """The session factory must translate a MinIO-style profile into
    the fs.s3a.* confs the reference's stack sets (metastore-site.xml
    fs.s3a keys / hive.properties endpoint + path-style access). Conf
    assertion only — no live object store in this container."""
    from de_project_airflow_etl_spark.session import (
        _apply_object_store_profile,
    )

    class FakeBuilder:
        def __init__(self):
            self.confs = {}

        def config(self, k, v):
            self.confs[k] = v
            return self

    monkeypatch.setenv("SPARK_GRAFT_S3_ENDPOINT", "http://minio:9000")
    monkeypatch.setenv("SPARK_GRAFT_S3_ACCESS_KEY", "minio_access_key")
    monkeypatch.setenv("SPARK_GRAFT_S3_SECRET_KEY", "minio_secret_key")
    b = _apply_object_store_profile(FakeBuilder())
    assert b.confs["spark.hadoop.fs.s3a.endpoint"] == "http://minio:9000"
    assert b.confs["spark.hadoop.fs.s3a.access.key"] == "minio_access_key"
    assert b.confs["spark.hadoop.fs.s3a.secret.key"] == "minio_secret_key"
    assert b.confs["spark.hadoop.fs.s3a.path.style.access"] == "true"
    assert b.confs["spark.hadoop.fs.s3a.committer.name"] == "directory"

    monkeypatch.delenv("SPARK_GRAFT_S3_ENDPOINT")
    plain = _apply_object_store_profile(FakeBuilder())
    assert plain.confs == {}  # no profile -> untouched builder


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
