"""Scan-budget plan gates for the round-6 duplicated-subtree sweep.

A registry-wide audit found multi-consumer intermediates re-executing
per reference (no ReusedExchange once aliasing breaks canonical
equality), so several queries re-scanned the same table 4-10x — and
the PCA power iteration's update-twice loop grew lineage
exponentially. The aggregate-sized intermediates are now
localCheckpoint-materialized; these gates pin each final plan's
parquet-scan count so a refactor can't silently reintroduce the
re-scans. (Data-sized streams stay re-derived on purpose — the
measured-loss notes live next to the code.)
"""

from __future__ import annotations

import pytest

import de_project_airflow_etl_spark.registry as reg

# query -> max "Scan parquet" nodes allowed in the FINAL plan
# (checkpointed subtrees execute once, before the final plan)
SCAN_BUDGETS = {
    "theil_sen_daily_trend": 0,       # was 10: daily + pairs both bounded
    "embedding_pca_power_iter": 2,    # was 10: exponential v lineage
    "market_basket_rules": 0,         # was 8: baskets + item supports
    "label_separation_scores": 2,     # was 7: moment + centroid tables
    "funnel_conversion_latency": 0,   # was 6: c_ts carried, histogram ckpt
    # was 6, then 2 (cutoff + verified pairs checkpointed). The cutoff
    # is now extracted as driver-side metadata so the batch boundary
    # is a LITERAL predicate: doc_id pushes to the parquet scans and
    # no BroadcastNestedLoopJoin remains. 4 = the 2 real doc scans
    # (both boundary-pruned now) + 2 doc_id-only bloom-builder scans
    # Spark's InjectRuntimeFilter adds to pre-filter the pairs side —
    # thin, pushed-down, and map-side profitable at scale.
    "incremental_dedup_new_docs": 4,
    # the two below keep their data-sized streams re-derived on
    # purpose (measured loss to materialize); the budget pins the
    # CURRENT shape so it can't silently worsen
    "containment_dup_pairs": 5,
    "dedup_ngram_jaccard": 4,         # was 8: per-doc counts checkpointed
}


@pytest.mark.parametrize("name", sorted(SCAN_BUDGETS))
def test_final_plan_scan_budget(spark, sf_dir, name):
    df = reg.all_queries()[name].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_scans = plan.count("Scan parquet")
    assert n_scans <= SCAN_BUDGETS[name], (
        f"{name}: {n_scans} parquet scans in the final plan (budget "
        f"{SCAN_BUDGETS[name]}) — a multi-consumer intermediate lost "
        f"its checkpoint")
