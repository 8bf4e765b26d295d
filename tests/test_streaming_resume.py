"""Checkpoint stop/resume for the stateful windowed aggregation: the
query is drained with availableNow, STOPPED, given a second batch of
later files, and restarted from the SAME checkpoint into the SAME
parquet sink. The contract under test is exactly-once across restarts:
every window the final watermark has closed appears in the sink exactly
once (no re-emission of run-1 state after resume), with counts equal to
the batch aggregation over all input — the file-source offset log plus
the state store doing their jobs together.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from de_project_airflow_etl_spark.streaming.ingest import windowed_counts

BASE_US = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC


def _events(spark, lo, hi, day_offset):
    return spark.range(lo, hi).selectExpr(
        "id AS event_id",
        f"timestamp_micros(CAST({BASE_US} + {day_offset} * 86400000000"
        " + (id % 1000) * 60000000 AS BIGINT)) AS ts",
        "pmod(id, 50) AS user_id",
        "element_at(array('click','view','purchase'),"
        " 1 + CAST(pmod(id, 3) AS INT)) AS event_type",
        "CAST(id AS DOUBLE) AS value",
        "'{}' AS props",
    )


def _drain(spark, src, sink, ckpt):
    schema = spark.read.parquet(src).schema
    stream = (spark.readStream.schema(schema).format("parquet").load(src)
                   .withWatermark("ts", "1 hour"))
    q = (windowed_counts(stream)
         .writeStream.format("parquet")
         .option("path", sink).option("checkpointLocation", ckpt)
         .outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination(180)


def test_windowed_agg_resumes_exactly_once(spark, tmp_path):
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    batch_a = _events(spark, 0, 5_000, day_offset=0)
    batch_a.write.mode("append").parquet(src)
    _drain(spark, src, sink, ckpt)

    # second batch arrives a day later: its watermark closes every
    # run-1 window, so those must now be in the sink exactly once
    batch_b = _events(spark, 5_000, 8_000, day_offset=1)
    batch_b.write.mode("append").parquet(src)
    _drain(spark, src, sink, ckpt)

    got = spark.read.schema(
        "window_start timestamp, event_type string, event_count long"
    ).parquet(sink)
    # no window/type pair may appear twice (re-emitted state = a
    # broken resume)
    dupes = (got.groupBy("window_start", "event_type").count()
                .filter(F.col("count") > 1).count())
    assert dupes == 0

    all_events = _events(spark, 0, 5_000, 0).unionAll(
        _events(spark, 5_000, 8_000, 1))
    want = windowed_counts(all_events)
    # every closed window (everything from batch A — batch B's
    # watermark passed them) must match the batch aggregation exactly
    day2 = F.lit(BASE_US // 1_000_000 + 86_400).cast("timestamp")
    want_closed = want.filter(F.col("window_start") < day2)
    got_closed = got.filter(F.col("window_start") < day2)
    assert got_closed.count() == want_closed.count()
    assert want_closed.exceptAll(got_closed).isEmpty()
    assert got_closed.exceptAll(want_closed).isEmpty()
