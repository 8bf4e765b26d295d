"""Watermark + late-data semantics: a checkpointed file-source stream
processed in two availableNow runs.

Run 1 seeds the aggregation state and advances the watermark (append
mode emits nothing yet: emission uses the *previous* batch's
watermark). Run 2 delivers a late row behind the watermark plus a
fresh row: the late row must be dropped before the stateful
aggregation, and the windows finalized by run 1's watermark are
emitted WITHOUT the late contribution — exactly the bounded-state
contract that makes streaming aggregation feasible at 100 TB.
"""

from __future__ import annotations

import os
from datetime import datetime

from pyspark.sql import functions as F


def _write_events(spark, path: str, rows: list[tuple[str, str]]) -> None:
    df = spark.createDataFrame(
        [(datetime.fromisoformat(ts), key) for ts, key in rows],
        "ts timestamp, key string")
    df.coalesce(1).write.mode("append").parquet(path)


def _run_stream(spark, src: str, ckpt: str, out: str):
    """One availableNow run appending finalized windows to a parquet
    sink (memory sink cannot recover from a checkpoint); returns the
    sink's cumulative contents."""
    stream = (spark.readStream.schema("ts timestamp, key string")
                   .parquet(src)
                   .withWatermark("ts", "30 minutes"))
    agg = (stream.groupBy(F.window("ts", "30 minutes").alias("w"), "key")
                 .agg(F.count(F.lit(1)).alias("n"))
                 .select(F.col("w.start").alias("window_start"), "key", "n"))
    q = (agg.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.read.schema("window_start timestamp, key string, n bigint").parquet(out)


def test_late_rows_behind_watermark_are_dropped(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    os.makedirs(src)

    # run 1: two rows in the 10:00 window, one at 12:00 (advances the
    # watermark to 11:30 at end of batch)
    _write_events(spark, src, [
        ("2024-01-01 10:05:00", "a"),
        ("2024-01-01 10:10:00", "a"),
        ("2024-01-01 12:00:00", "a"),
    ])
    out1 = {(str(r["window_start"]), r["key"]): r["n"]
            for r in _run_stream(spark, src, ckpt, out).collect()}
    # availableNow runs a closing no-data batch: the end-of-run
    # watermark (12:00 - 30m = 11:30) finalizes the 10:00 window with
    # run-1's two rows and evicts its state; the 12:00 window stays open
    assert out1 == {("2024-01-01 10:00:00", "a"): 2}

    # run 2: one LATE row behind the 11:30 watermark + one fresh row
    _write_events(spark, src, [
        ("2024-01-01 10:20:00", "a"),   # late: window end 10:30 < 11:30
        ("2024-01-01 13:30:00", "a"),   # advances watermark to 13:00
    ])
    cumulative = {(str(r["window_start"]), r["key"]): r["n"]
                  for r in _run_stream(spark, src, ckpt, out).collect()}

    # the late row was dropped before the aggregation: the finalized
    # 10:00 window keeps run-1's count (never re-emitted or updated),
    # and the only newly finalized window is 12:00 with run-1's row
    assert cumulative == {
        ("2024-01-01 10:00:00", "a"): 2,
        ("2024-01-01 12:00:00", "a"): 1,
    }


def test_outer_null_emission_follows_watermark_delay(spark, tmp_path):
    """Stream-stream LEFT OUTER eviction rule, proven by shifting ONLY
    the watermark delay over identical data: purchase #3 (11:00, no
    click) gets its null row at delay=1s (watermark 11:59:59 passes
    it) but NOT at delay=3h (watermark 09:00 does not) — so the
    emission is driven by the eviction rule, not by the data. The
    12:00 purchase sits above even the 1s watermark and must be
    withheld at both delays."""
    from datetime import datetime as dt

    from de_project_airflow_etl_spark.streaming.stateful import (
        stream_stream_left_join_plan,
    )

    rows = [
        (1, dt.fromisoformat("2024-01-01 10:00:00"), 1, "click"),
        (2, dt.fromisoformat("2024-01-01 10:30:00"), 1, "purchase"),
        (3, dt.fromisoformat("2024-01-01 11:00:00"), 2, "purchase"),
        (4, dt.fromisoformat("2024-01-01 12:00:00"), 9, "click"),
        (5, dt.fromisoformat("2024-01-01 12:00:00"), 8, "purchase"),
    ]
    # the file-source narrows to the literal file name events.parquet
    # (pathGlobFilter), so write ONE parquet file, not a Spark dir
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = str(tmp_path / "sf")
    os.makedirs(src)
    pdf = pd.DataFrame({
        "event_id": [i for i, *_ in rows],
        "ts": [ts for _, ts, *_ in rows],
        "user_id": [u for _, _, u, _ in rows],
        "event_type": [et for *_, et in rows],
        "value": [1.0] * len(rows),
        "props": ["{}"] * len(rows),
    })
    pq.write_table(pa.Table.from_pandas(pdf), f"{src}/events.parquet")

    def run(delay: str) -> dict[int, object]:
        df = stream_stream_left_join_plan(spark, src, delay)
        return {r["event_id"]: r["gap_us"] for r in df.collect()}

    tight = run("1 second")
    # matched purchase always emits; unmatched 11:00 purchase emits
    # null once the 11:59:59 watermark passes it; 12:00 withheld
    assert tight == {2: 30 * 60 * 1_000_000, 3: None}

    loose = run("3 hours")
    # same data, larger delay: the watermark (09:00) passes nothing,
    # so ONLY the matched row appears — no nulls
    assert loose == {2: 30 * 60 * 1_000_000}
