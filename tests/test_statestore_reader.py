"""Spark 4 state-store reader: a streaming checkpoint's operator state
is itself a queryable DataFrame (`spark.read.format("statestore")`),
the ops surface for debugging stateful pipelines without replaying
them. The state read back must equal the batch recomputation, across
incremental availableNow runs against one checkpoint."""

from __future__ import annotations

from pyspark.sql import functions as F


def _run_counts(spark, src, cp, name):
    schema = "event_type string, value double"
    q = (spark.readStream.schema(schema).parquet(src)
              .groupBy("event_type")
              .agg(F.count(F.lit(1)).alias("n"))
              .writeStream.outputMode("complete").format("memory")
              .queryName(name)
              .option("checkpointLocation", cp)
              .trigger(availableNow=True).start())
    done = q.awaitTermination(120)
    if not done:
        q.stop()  # don't leak a live stream into the shared session
    assert done, "stream did not finish"


def test_statestore_reader_matches_batch_counts(spark, tmp_path):
    src = str(tmp_path / "src")
    cp = str(tmp_path / "cp")
    events = (spark.read.parquet(
                  "/root/testdata/sf0.01/events.parquet")
                   .select("event_type", F.col("value")))
    events.limit(2000).write.parquet(src)
    _run_counts(spark, src, cp, "ss_counts_b1")

    state = (spark.read.format("statestore").load(cp)
                  .select(F.col("key.event_type").alias("event_type"),
                          F.col("value.count").alias("n")))
    batch = {r["event_type"]: r["n"] for r in
             spark.read.parquet(src).groupBy("event_type")
                  .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert {r["event_type"]: r["n"] for r in state.collect()} == batch

    # incremental second batch against the SAME checkpoint (new
    # part-files appended into the watched dir): the state must
    # advance to the cumulative counts
    events.limit(3000).write.mode("append").parquet(src)
    _run_counts(spark, src, cp, "ss_counts_b2")
    state2 = {r["event_type"]: r["n"] for r in
              spark.read.format("statestore").load(cp)
                   .select(F.col("key.event_type").alias("event_type"),
                           F.col("value.count").alias("n")).collect()}
    batch2 = {r["event_type"]: r["n"] for r in
              spark.read.parquet(src).groupBy("event_type")
                   .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert state2 == batch2
    assert sum(state2.values()) > sum(batch.values())

    # the metadata surface names the stateful operator and its layout
    meta = spark.read.format("state-metadata").load(cp).collect()
    assert meta and meta[0]["operatorName"] == "stateStoreSave"
    assert meta[0]["numPartitions"] == int(
        spark.conf.get("spark.sql.shuffle.partitions"))
