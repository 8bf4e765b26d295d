"""Scale-shaped stress for the streaming path: 1M synthetic events
(100x the sf0.01 event count, ~180k distinct window/type state keys'
worth of traffic across 30 days) generated DISTRIBUTED, drained
through the registry's availableNow windowed aggregation, and compared
row-for-row against the batch aggregation of the same input — the
stream/batch agreement contract at volume, through the real
checkpointed file-source path.
"""

from __future__ import annotations

import pytest

from de_project_airflow_etl_spark.streaming.ingest import (
    streaming_windowed_counts, windowed_counts,
)
from de_project_airflow_etl_spark.tables import load

N_EVENTS = 1_000_000


@pytest.fixture()
def big_events(spark, tmp_path):
    ev = spark.range(N_EVENTS).selectExpr(
        "id AS event_id",
        # spread over 30 days with hash-jittered seconds
        "timestamp_micros(CAST(1704067200000000 + "
        "(id % 2592000) * 1000000 + pmod(hash(id), 1000000) AS BIGINT))"
        " AS ts",
        "pmod(hash(id * 7), 1000) AS user_id",
        "element_at(array('click','view','purchase','signup','error'), "
        "1 + CAST(pmod(hash(id * 13), 5) AS INT)) AS event_type",
        "CAST(pmod(hash(id * 17), 10000) AS DOUBLE) / 100.0 AS value",
        "'{}' AS props",
    )
    # testdata ships each table as ONE file named <table>.parquet (and
    # read_event_stream's pathGlobFilter expects exactly that), so
    # stage the synthetic table the same way
    import glob
    import shutil
    staging = str(tmp_path / "staging")
    ev.coalesce(1).write.mode("overwrite").parquet(staging)
    part = glob.glob(f"{staging}/part-*.parquet")[0]
    shutil.move(part, str(tmp_path / "events.parquet"))
    shutil.rmtree(staging)
    return str(tmp_path)


def test_streaming_agrees_with_batch_on_1m_events(spark, big_events):
    streamed = sorted(
        map(tuple, streaming_windowed_counts(spark, big_events).collect()))
    batch = sorted(
        map(tuple,
            windowed_counts(load(spark, big_events, "events")).collect()))
    assert streamed == batch
    assert len(batch) > 100          # real state-key spread
    assert sum(r[-1] for r in batch) == N_EVENTS


# r11 test tiering: multi-minute sweep/scale/property module —
# excluded from the default (driver-budget) run; run with
# -m "slow or not slow" for the full signal (see pytest.ini).
pytestmark = pytest.mark.slow
