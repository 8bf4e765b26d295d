"""Structured Streaming: file-source ingest + windowed aggregation.

The reference's incremental daily batch (SURVEY.md §2.6 O1-O3) maps to
a Spark file-source stream with an ``availableNow`` trigger: each run
drains whatever new files landed, exactly once, checkpointed — the
streaming-native version of "re-runnable per-interval processing".

``streaming_windowed_counts`` runs the stream to completion inside the
call and returns the materialized result, so it is oracle-checkable
against the same batch SQL (tumbling 6h windows == DuckDB
``time_bucket``) — the streaming engine must agree with the batch
engine on the same input.
"""

from __future__ import annotations

import os
import uuid
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from de_project_airflow_etl_spark.registry import query
from de_project_airflow_etl_spark.tables import load

# Stateful streaming queries carry one state-store instance per shuffle
# partition per stateful operator (a stream-stream join carries four).
# Unlike batch shuffles, these are NOT free to over-provision: every
# store pays open/snapshot/commit per micro-batch. So streaming sizes
# shuffle partitions to expected STATE VOLUME, not core count — small
# local fixtures run 8; a 100 TB stream raises this (it is baked into
# the checkpoint at first start, so production picks it deliberately).
STREAM_SHUFFLE_PARTITIONS = int(
    os.environ.get("SPARK_GRAFT_STREAM_PARTITIONS", "8"))


@contextmanager
def stream_shuffle_sizing(spark: SparkSession):
    """Temporarily size shuffle partitions for stateful streaming;
    restores the batch setting afterwards."""
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    spark.conf.set(key, str(STREAM_SHUFFLE_PARTITIONS))
    try:
        yield
    finally:
        spark.conf.set(key, prev)


def windowed_counts(events: DataFrame) -> DataFrame:
    """The aggregation shared by the batch and streaming paths."""
    return (
        events.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
              .agg(F.count(F.lit(1)).alias("event_count"))
              .select(F.col("w.start").alias("window_start"),
                      "event_type", "event_count")
    )


def read_event_stream(spark: SparkSession, sf_dir: str,
                      with_watermark: str | None = "1 day") -> DataFrame:
    """File-source stream over the events parquet. Schema must be
    explicit for streaming reads (no inference at run time)."""
    path = f"{sf_dir}/events.parquet"
    # defensive for driver-supplied sessions (see tables.load): the
    # NANOS timestamp is unreadable without this runtime-settable conf
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema  # file schema
    # File-source streams take a directory; pathGlobFilter narrows it to
    # the events table only.
    stream = (spark.readStream.schema(schema)
                   .format("parquet")
                   .option("pathGlobFilter", "events.parquet")
                   .load(sf_dir))
    # One normalizer for batch AND stream: the stream side must agree
    # with the batch side on the event-time type or the batch/stream-
    # agreement oracles drift (and a second inline copy of the logic
    # would, eventually).
    from de_project_airflow_etl_spark.tables import _normalize_event_ts
    stream = _normalize_event_ts(spark, stream)
    if with_watermark:
        stream = stream.withWatermark("ts", with_watermark)
    return stream


def run_available_now(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the stream with Trigger.AvailableNow into a memory sink and
    return the materialized aggregate."""
    sink = f"stream_windowed_{uuid.uuid4().hex[:8]}"
    stream = read_event_stream(spark, sf_dir, with_watermark=None)
    with stream_shuffle_sizing(spark):
        q = (
            windowed_counts(stream)
            .writeStream
            .format("memory")
            .queryName(sink)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(sink)


@query(
    "streaming_windowed_counts",
    oracle="""
        SELECT time_bucket(INTERVAL 6 HOURS, ts) AS window_start,
               event_type,
               COUNT(*) AS event_count
        FROM events
        GROUP BY 1, 2
    """,
    doc="Structured Streaming tumbling-window aggregation, drained with "
        "Trigger.AvailableNow into a memory sink — checked against the "
        "batch oracle (stream/batch agreement).",
    tags=("streaming", "window"),
)
def streaming_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_available_now(spark, sf_dir)


ROCKSDB_PROVIDER = ("org.apache.spark.sql.execution.streaming.state."
                    "RocksDBStateStoreProvider")


@query(
    "streaming_windowed_counts_rocksdb",
    oracle="""
        SELECT time_bucket(INTERVAL 6 HOURS, ts) AS window_start,
               event_type,
               COUNT(*) AS event_count
        FROM events
        GROUP BY 1, 2
    """,
    doc="The same streaming tumbling-window aggregation with the "
        "RocksDB state store provider (rocksdbjni ships with Spark). "
        "The default HDFS-backed provider keeps all state keys on the "
        "executor heap; RocksDB spills state to local SSD with "
        "changelog checkpointing, which is what makes million-key "
        "windowed state (100 TB event streams) feasible. Same oracle "
        "as the default-provider query — the state backend must not "
        "change results.",
    tags=("streaming", "window", "rocksdb"),
)
def streaming_windowed_counts_rocksdb(spark: SparkSession,
                                      sf_dir: str) -> DataFrame:
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = None
    try:
        prev = spark.conf.get(key)
    except Exception:
        pass
    spark.conf.set(key, ROCKSDB_PROVIDER)
    try:
        # run_available_now fully drains the stream before returning, so
        # the provider conf is live for the whole query lifetime.
        return run_available_now(spark, sf_dir)
    finally:
        if prev:
            spark.conf.set(key, prev)
        else:
            spark.conf.unset(key)


@query(
    "streaming_observed_ingest_metrics",
    oracle="""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_negative_values,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                    AS DOUBLE) / 100 AS sum_value,
               epoch_us(MAX(ts)) AS max_ts_us
        FROM events
    """,
    doc="Streaming observability: the same Observation-API DQ metrics "
        "as observed_ingest_metrics, attached to a STREAM — metrics "
        "ride each micro-batch and surface through "
        "StreamingQueryProgress.observedMetrics, summed across data "
        "batches. Freshness is carried as unix_micros (a BIGINT) "
        "because progress serialization truncates timestamp metrics "
        "to seconds — a real integration gotcha this oracle locks in. "
        "This is how a 100 TB streaming ingest emits volume/validity/"
        "freshness telemetry per batch with zero extra passes.",
    tags=("streaming", "quality", "observe"),
)
def streaming_observed_ingest_metrics(spark: SparkSession,
                                      sf_dir: str) -> DataFrame:
    import uuid as _uuid

    from pyspark.sql import types as T

    from de_project_airflow_etl_spark.operators.quality import (
        dq_observation_metrics,
    )

    stream = read_event_stream(spark, sf_dir, with_watermark=None)
    observed = stream.observe(
        f"ingest_dq_{_uuid.uuid4().hex[:8]}",
        *dq_observation_metrics(),
        F.unix_micros(F.max("ts")).alias("max_ts_us"))
    sink = f"stream_obs_{_uuid.uuid4().hex[:8]}"
    # recentProgress is a ring buffer (spark.sql.streaming.
    # numRecentProgressUpdates, default 100): if availableNow ever
    # splits the source into more micro-batches than that (more files,
    # lower maxFilesPerTrigger), the earliest batches' observed
    # metrics would silently drop and the sums undercount. Raise it
    # for this run — deterministic, unlike a StreamingQueryListener
    # whose events are delivered async and may lag awaitTermination.
    progress_key = "spark.sql.streaming.numRecentProgressUpdates"
    prev_progress = spark.conf.get(progress_key, None)
    spark.conf.set(progress_key, "100000")
    try:
        with stream_shuffle_sizing(spark):
            q = (observed.groupBy("event_type")
                         .agg(F.count(F.lit(1)).alias("n"))
                         .writeStream.format("memory").queryName(sink)
                         .outputMode("complete")
                         .trigger(availableNow=True).start())
            q.awaitTermination()
    finally:
        if prev_progress is None:
            spark.conf.unset(progress_key)
        else:
            spark.conf.set(progress_key, prev_progress)
    # cross-batch accumulation in exact integer cents — dividing once
    # at the end instead of summing per-batch doubles keeps the result
    # bit-equal to the oracle's SUM(cents)/100 under ANY batching
    totals = {"n_rows": 0, "n_negative_values": 0, "sum_value_cents": 0,
              "max_ts_us": None}
    for progress in q.recentProgress:
        for metrics in (progress.observedMetrics or {}).values():
            totals["n_rows"] += metrics["n_rows"]
            totals["n_negative_values"] += metrics["n_negative_values"]
            totals["sum_value_cents"] += metrics["sum_value_cents"]
            ts = metrics["max_ts_us"]
            if totals["max_ts_us"] is None or (ts is not None
                                               and ts > totals["max_ts_us"]):
                totals["max_ts_us"] = ts
    schema = T.StructType([
        T.StructField("n_rows", T.LongType()),
        T.StructField("n_negative_values", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("max_ts_us", T.LongType()),
    ])
    return spark.createDataFrame(
        [(totals["n_rows"], totals["n_negative_values"],
          totals["sum_value_cents"] / 100, totals["max_ts_us"])], schema)


@query(
    "streaming_dedup_within_watermark",
    oracle="""
        SELECT DISTINCT event_type,
               CAST(CAST(ts AS DATE) AS VARCHAR) AS day
        FROM events
    """,
    doc="Streaming deduplication via dropDuplicatesWithinWatermark: "
        "keep the first event per (event_type, day) key, with state "
        "for a key evictable once the watermark passes its event time "
        "— the engine-native streaming dedup operator (bounded state, "
        "unlike dropDuplicates whose state grows forever) that "
        "completes the dedup family's streaming story: the batch side "
        "dedups a corpus, this dedups the ingest stream before it "
        "lands. Drained with Trigger.AvailableNow into a memory sink "
        "and checked against the batch DISTINCT oracle "
        "(stream/batch agreement; the whole table arrives within one "
        "batch here, so the within-watermark guarantee is exact). "
        "State scales with live keys inside the watermark horizon — "
        "here |event_types| x |days in flight|, at 100 TB whatever "
        "key the dedup contract names — and the RocksDB provider "
        "(exercised by streaming_windowed_counts_rocksdb) moves that "
        "state off-heap when it outgrows memory.",
    tags=("streaming", "dedup"),
)
def streaming_dedup_within_watermark(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    sink = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    stream = read_event_stream(spark, sf_dir, with_watermark="1 day")
    deduped = (stream
               .withColumn("day", F.to_date("ts").cast("string"))
               .dropDuplicatesWithinWatermark(["event_type", "day"])
               .select("event_type", "day"))
    with stream_shuffle_sizing(spark):
        q = (deduped.writeStream
             .format("memory")
             .queryName(sink)
             .outputMode("append")
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()
    return spark.table(sink)
