"""Python Data Source API tests: the launch_library REST source (S1
scale path) — per-day partition fan-out, nested raw schema, null
struct tolerance, and agreement with the pipeline's fixture payloads."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from de_project_airflow_etl_spark.pipeline.fixtures import launch_day_payload
from de_project_airflow_etl_spark.sources.launch_library import (
    LaunchLibraryDataSource, LaunchLibraryReader,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(LaunchLibraryDataSource)


def test_single_day_read(spark):
    df = (spark.read.format("launch_library")
               .option("start", "2024-12-01").load())
    rows = df.collect()
    # fixture: n=5 records + 1 duplicate-id record
    assert len(rows) == 6
    assert df.schema["status"].dataType.typeName() == "struct"
    # nested paths resolve natively (SURVEY §1.4: no json_normalize)
    flat = df.select("id", F.col("status.name").alias("status"),
                     F.col("image.license.name").alias("license"))
    assert flat.filter(F.col("license").isNull()).count() > 0


def test_interval_fans_out_one_partition_per_day(spark):
    df = (spark.read.format("launch_library")
               .option("start", "2024-12-01")
               .option("end", "2024-12-04").load())
    assert df.rdd.getNumPartitions() == 3  # half-open [start, end)
    days = [r[0] for r in
            df.select(F.substring("net", 1, 10)).distinct().collect()]
    assert sorted(days) == ["2024-12-01", "2024-12-02", "2024-12-03"]


def test_agrees_with_fixture_payload(spark):
    day, n = "2025-01-15", 4
    df = (spark.read.format("launch_library")
               .option("start", day).option("fixture_n", str(n)).load())
    expected = launch_day_payload(day, n)["results"]
    got = {r["id"] for r in df.collect()}
    assert got == {r["id"] for r in expected}


def test_missing_start_option_fails(spark):
    with pytest.raises(Exception, match="start"):
        spark.read.format("launch_library").load().collect()


def test_http_fetcher_is_gated():
    reader = LaunchLibraryReader({"start": "2024-12-01", "fetcher": "http"})
    part = reader.partitions()[0]
    try:
        import requests  # noqa: F401
        pytest.skip("requests present; offline gate not exercisable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="requests"):
        list(reader.read(part))
