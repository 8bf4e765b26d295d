"""Sketch-rollup accuracy: the HLL store-and-merge path must agree
with the exact distinct count within HLL++'s error envelope."""

from __future__ import annotations

from pyspark.sql import functions as F

from de_project_airflow_etl_spark.queries.flagship import (
    weekly_users_hll_rollup,
)
from de_project_airflow_etl_spark.tables import load


def test_hll_rollup_within_tolerance(spark, sf_dir):
    approx = {r["week"]: r["approx_users"]
              for r in weekly_users_hll_rollup(spark, sf_dir).collect()}
    ev = load(spark, sf_dir, "events")
    exact = {r["week"]: r["exact_users"]
             for r in (ev.select(F.weekofyear(F.to_date("ts")).alias("week"),
                                 "user_id")
                         .distinct()
                         .groupBy("week")
                         .agg(F.count(F.lit(1)).alias("exact_users"))
                         .collect())}
    assert set(approx) == set(exact)
    for week, est in approx.items():
        assert abs(est - exact[week]) <= max(1, 0.05 * exact[week]), (
            week, est, exact[week])


def test_approx_quantiles_within_tolerance_of_exact(spark, sf_dir):
    """The approx_percentile sketch variant must track its exact
    sibling: at accuracy=10000 the rank error is <= n/10000, which for
    these group sizes is well inside 5% of the group's value spread."""
    from de_project_airflow_etl_spark.queries.timeseries import (
        event_value_quantiles, event_value_quantiles_approx,
    )
    exact = {r["event_type"]: r
             for r in event_value_quantiles(spark, sf_dir).collect()}
    approx = {r["event_type"]: r
              for r in event_value_quantiles_approx(spark, sf_dir).collect()}
    assert set(exact) == set(approx)
    spreads = {t: max(1e-9, exact[t]["p75"] - exact[t]["p25"])
               for t in exact}
    for t, a in approx.items():
        for p in ("p25", "p50", "p75"):
            assert abs(a[p] - exact[t][p]) <= 0.05 * spreads[t], (
                t, p, a[p], exact[t][p])


def test_pairs_cache_is_bounded_lru():
    """_PAIRS_CACHE must not grow without bound across sf_dirs, and a
    hit must refresh recency (true LRU, not FIFO)."""
    from de_project_airflow_etl_spark.operators import dedup

    saved = dict(dedup._PAIRS_CACHE)
    dedup.clear_pairs_cache()
    try:
        cap = dedup._PAIRS_CACHE_MAX
        for i in range(cap + 3):
            dedup._pairs_cache_put(("app", f"sf{i}"), object())
        assert len(dedup._PAIRS_CACHE) == cap
        assert ("app", "sf0") not in dedup._PAIRS_CACHE  # oldest evicted
        # touch the current oldest, then insert: the touched key survives
        oldest = next(iter(dedup._PAIRS_CACHE))
        dedup._PAIRS_CACHE[oldest] = dedup._PAIRS_CACHE.pop(oldest)
        dedup._pairs_cache_put(("app", "new"), object())
        assert oldest in dedup._PAIRS_CACHE
    finally:
        dedup.clear_pairs_cache()
        dedup._PAIRS_CACHE.update(saved)
