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
