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
    from de_project_airflow_etl_spark.sources.launch_library import (
        register_launch_source,
    )
    register_launch_source(spark)


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


def test_streaming_source_advances_day_offsets(spark, tmp_path):
    """The streaming reader drains one day per micro-batch, stops
    producing at the exclusive end offset, and replays deterministically
    (exactly-once via readBetweenOffsets on restart)."""
    import time

    df = (spark.readStream.format("launch_library")
               .option("start", "2024-12-01")
               .option("end", "2024-12-04").load())
    q = (df.writeStream.format("memory").queryName("ll_days")
           .option("checkpointLocation", str(tmp_path / "ckpt"))
           .outputMode("append")
           .trigger(processingTime="50 milliseconds").start())
    try:
        # 3 days x (n=5 records + 1 dup) = 18 rows, then the source is
        # caught up and keeps returning empty batches
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.table("ll_days").count() >= 18:
                break
            time.sleep(0.2)
        rows = spark.table("ll_days").collect()
    finally:
        q.stop()
    assert len(rows) == 18
    days = sorted({r["net"][:10] for r in rows})
    assert days == ["2024-12-01", "2024-12-02", "2024-12-03"]


def test_jsonl_sink_two_phase_commit(spark, sf_dir, tmp_path):
    """The Python Data Source writer must stage-then-commit: all rows
    land in part files, _SUCCESS carries an accurate manifest, and no
    staging residue survives."""
    import json
    import os

    from de_project_airflow_etl_spark.sources.launch_library import (
        LaunchLibraryDataSource,
    )
    from de_project_airflow_etl_spark.tables import load

    from de_project_airflow_etl_spark.sources.launch_library import (
        register_launch_source,
    )
    register_launch_source(spark)
    out = str(tmp_path / "jsonl_sink")
    os.makedirs(out, exist_ok=True)
    src = load(spark, sf_dir, "nation")
    (src.repartition(4).write.format("launch_library")
        .option("path", out).mode("append").save())

    manifest = json.load(open(os.path.join(out, "_SUCCESS")))
    assert manifest["total_rows"] == src.count()
    assert not os.path.exists(os.path.join(out, "_staging"))

    back = spark.read.schema(src.schema).json(f"{out}/part-*.jsonl")
    assert sorted(r["n_name"] for r in back.collect()) \
        == sorted(r["n_name"] for r in src.collect())

    # overwrite mode replaces prior part files instead of appending
    (src.limit(5).repartition(1).write.format("launch_library")
        .option("path", out).mode("overwrite").save())
    manifest2 = json.load(open(os.path.join(out, "_SUCCESS")))
    assert manifest2["total_rows"] == 5
    assert spark.read.schema(src.schema).json(f"{out}/part-*.jsonl").count() == 5

    # append mode must NOT clobber previously committed part files:
    # indices continue past the existing ones and the manifest covers
    # both commits.
    (src.limit(3).repartition(2).write.format("launch_library")
        .option("path", out).mode("append").save())
    manifest3 = json.load(open(os.path.join(out, "_SUCCESS")))
    assert manifest3["total_rows"] == 8
    assert spark.read.schema(src.schema).json(f"{out}/part-*.jsonl").count() == 8
    names = sorted(e["file"] for e in manifest3["files"])
    assert len(names) == len(set(names)) == 3  # 1 from overwrite + 2 appended


# ------------------- Spark 4.1 filter pushdown: day-partition pruning


def test_reader_pushdown_prunes_day_partitions():
    """pushFilters on the ISO `net` string must tighten the day range
    partitions() generates — whole API calls skipped at the source —
    while returning every filter as a residual (Spark re-applies
    them, so pruning can never change results)."""
    from pyspark.sql.datasource import (
        EqualTo, GreaterThanOrEqual, LessThan, StringStartsWith,
    )

    from de_project_airflow_etl_spark.sources.launch_library import (
        LaunchLibraryReader,
    )
    r = LaunchLibraryReader({"start": "2024-12-01", "end": "2024-12-08"})
    assert len(r.partitions()) == 7
    filters = [GreaterThanOrEqual(("net",), "2024-12-03T00:00:00Z"),
               LessThan(("net",), "2024-12-05T12:00:00Z"),
               StringStartsWith(("name",), "Mission")]
    residual = r.pushFilters(filters)
    assert list(residual) == filters  # all residual, by reference
    days = [p.day for p in r.partitions()]
    assert days == ["2024-12-03", "2024-12-04", "2024-12-05"]

    r2 = LaunchLibraryReader({"start": "2024-12-01",
                              "end": "2024-12-08"})
    r2.pushFilters([EqualTo(("net",), "2024-12-04T07:13:00Z")])
    assert [p.day for p in r2.partitions()] == ["2024-12-04"]


def test_reader_pushdown_end_to_end_equals_unpruned(spark):
    """The pruned scan must return exactly the rows the unpruned scan
    plus a post-filter returns (fixture fetcher, 3 days x 4 rows)."""
    from de_project_airflow_etl_spark.sources.launch_library import (
        register_launch_source,
    )
    register_launch_source(spark)
    base = (spark.read.format("launch_library")
                 .option("start", "2024-12-01")
                 .option("end", "2024-12-04")
                 .option("fixture_n", "4").load())
    pushed = base.filter("net >= '2024-12-02T00:00:00Z'")
    expect = sorted(
        (r["id"], r["net"]) for r in base.collect()
        if r["net"] >= "2024-12-02T00:00:00Z")
    got = sorted((r["id"], r["net"]) for r in pushed.collect())
    assert got == expect
    # two of the three days survive the bound
    assert {net[:10] for _, net in got} == {"2024-12-02", "2024-12-03"}
