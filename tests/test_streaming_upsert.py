"""foreachBatch streaming MERGE: stream/batch agreement plus
idempotent re-run (checkpoint replay must not double-count)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from de_project_airflow_etl_spark.streaming.upsert import (
    run_streaming_upsert,
)
from de_project_airflow_etl_spark.tables import load


def _batch_truth(spark, sf_dir):
    return (load(spark, sf_dir, "events")
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("event_count"),
                 F.max(F.unix_micros("ts")).alias("last_seen_us")))


def test_streaming_upsert_matches_batch_and_is_idempotent(
        spark, sf_dir, tmp_path):
    state_dir = str(tmp_path / "state")
    got = {r["user_id"]: (r["event_count"], r["last_seen_us"])
           for r in run_streaming_upsert(spark, sf_dir, state_dir).collect()}
    want = {r["user_id"]: (r["event_count"], r["last_seen_us"])
            for r in _batch_truth(spark, sf_dir).collect()}
    assert got == want

    # replaying the drained stream from the same checkpoint must not
    # change the state (no new files -> no batches; marker files gate
    # any re-delivered batch).
    again = {r["user_id"]: (r["event_count"], r["last_seen_us"])
             for r in run_streaming_upsert(spark, sf_dir, state_dir).collect()}
    assert again == want

    # the applied-batch markers ride inside the swapped state table
    # (atomic with the merge result) and the idempotency gate engaged
    markers = [n for n in os.listdir(os.path.join(state_dir, "current"))
               if n.startswith("_batch-")]
    assert markers


def test_crash_between_merge_and_old_marker_scheme_replays_cleanly(
        spark, sf_dir, tmp_path):
    """A batch whose merge committed carries its own marker — simulating
    the old failure (marker written separately, lost in a crash) is now
    impossible: removing the marker means removing the merged table."""
    from de_project_airflow_etl_spark.streaming.upsert import _applied_ids
    state_dir = str(tmp_path / "state")
    run_streaming_upsert(spark, sf_dir, state_dir)
    cur = os.path.join(state_dir, "current")
    ids = _applied_ids(cur)
    assert ids  # every applied batch is recorded in-table


def test_crash_between_swap_renames_recovers_pre_batch_state(
        spark, sf_dir, tmp_path):
    """Simulate the window between the two swap renames (current moved
    to current.old, replacement not yet in place): recovery must
    restore current — with its markers — from current.old, and a
    subsequent run over the same checkpoint must still equal the batch
    truth. (In a real mid-batch crash the engine also re-delivers the
    uncommitted batch, whose marker is absent from the restored state,
    so it re-merges cleanly.)"""
    state_dir = str(tmp_path / "state")
    run_streaming_upsert(spark, sf_dir, state_dir)
    cur = os.path.join(state_dir, "current")

    # simulate the window: current renamed away, second rename never ran
    os.rename(cur, cur + ".old")
    from de_project_airflow_etl_spark.streaming.upsert import _applied_ids
    ids = _applied_ids(cur)  # triggers recovery
    assert os.path.isdir(cur) and not os.path.isdir(cur + ".old")
    assert ids  # pre-batch markers restored with the table

    want = {r["user_id"]: (r["event_count"], r["last_seen_us"])
            for r in _batch_truth(spark, sf_dir).collect()}
    got = {r["user_id"]: (r["event_count"], r["last_seen_us"])
           for r in run_streaming_upsert(spark, sf_dir, state_dir).collect()}
    assert got == want


def test_stale_current_old_does_not_break_next_swap(
        spark, sf_dir, tmp_path):
    """A crash after the second rename but before the rmtree leaves a
    non-empty current.old; the next merge's swap must clear it instead
    of dying with ENOTEMPTY on os.rename."""
    import shutil

    from de_project_airflow_etl_spark.streaming.upsert import _merge_batch
    state_dir = str(tmp_path / "state")
    run_streaming_upsert(spark, sf_dir, state_dir)
    cur = os.path.join(state_dir, "current")
    shutil.copytree(cur, cur + ".old")  # the stale leftover

    extra = spark.createDataFrame(
        [(999_999, 1, 1)], "user_id bigint, event_count bigint, "
                           "last_seen_us bigint")
    _merge_batch(state_dir, extra, batch_id=10_000)  # must not raise
    assert not os.path.isdir(cur + ".old")
    got = spark.read.parquet(cur).filter(F.col("user_id") == 999_999)
    assert got.count() == 1
