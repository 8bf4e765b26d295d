"""The tracked-persist lifecycle: every query-pinned cache must be
releasable WITHOUT spark.catalog.clearCache() (which would also nuke
caches a host application manages) — the explicit release hook for
long-lived sessions composing many queries (VERDICT r6 watch item on
bm25_term_scores' persist())."""

from __future__ import annotations

from de_project_airflow_etl_spark.queries import util
from de_project_airflow_etl_spark.registry import all_queries


def test_release_tracked_caches_frees_query_pins(spark, sf_dir):
    util.release_tracked_caches()  # start from a clean slate
    q = all_queries()["bm25_term_scores"]
    assert q.fn(spark, sf_dir).limit(1).count() == 1
    assert util._TRACKED_CACHES, "bm25 should have pinned a cache"
    released = util.release_tracked_caches()
    assert released >= 1
    assert not util._TRACKED_CACHES


def test_release_is_idempotent_and_safe_when_empty():
    assert util.release_tracked_caches() == 0
