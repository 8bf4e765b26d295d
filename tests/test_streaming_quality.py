"""Unified batch/stream semantics for the curation surface: the SAME
quality plan applied through Structured Streaming must produce exactly
the batch operator's rows. This is the property that lets one codebase
serve both the backfill (batch over the lake) and the live ingest
(stream over arriving shards): the stateless quality maps are
watermark-free, so streaming them is `readStream` + the identical
plan-builder + an `availableNow` drain.
"""

from __future__ import annotations

import pytest

from de_project_airflow_etl_spark.operators.quality import (
    blocklist_plan, repetition_stats_plan,
)
from de_project_airflow_etl_spark.tables import load


def _drain(spark, sdf, name: str):
    q = (sdf.writeStream.format("memory").queryName(name)
            .outputMode("append")
            .trigger(availableNow=True).start())
    q.awaitTermination(120)
    return spark.table(name)


@pytest.mark.parametrize("plan_fn,qname", [
    (repetition_stats_plan, "stream_repetition"),
    (blocklist_plan, "stream_blocklist"),
])
def test_stateless_quality_plans_agree_batch_vs_stream(
        spark, sf_dir, plan_fn, qname, tmp_path):
    docs = load(spark, sf_dir, "documents")
    batch = sorted(map(tuple, plan_fn(docs).collect()))
    # stage as a directory-shaped shard drop (the streaming source
    # tails a directory, the lake layout a live ingest would use)
    shard_dir = str(tmp_path / "docs_shards")
    docs.write.mode("overwrite").parquet(shard_dir)
    stream_src = (spark.readStream.schema(docs.schema)
                       .parquet(shard_dir))
    streamed = sorted(map(tuple, _drain(spark, plan_fn(stream_src),
                                        qname).collect()))
    assert streamed == batch
    assert len(batch) > 0
