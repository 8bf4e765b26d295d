"""Targeted gates for the round-12 staged bank (experimentation /
operations analytics) — scan budgets, window shape evidence, and
consistency invariants including the Little's-law identity.

The blanket oracle-match / non-empty / BNLJ gates in
tests/test_staged_pen.py already parametrize over ALL staged queries.
"""

from __future__ import annotations

import pytest

from de_project_airflow_etl_spark.plans.inspect import _walk_jplan
from de_project_airflow_etl_spark.registry import all_queries

REG = all_queries()

SCAN_BUDGETS_R12 = {
    "sample_ratio_mismatch_check": 1,
    "cuped_adjusted_lift": 1,            # per-user table ckpt'd; d0 scan
    "littles_law_sessions": 1,           # session table ckpt'd; horizon
    "crostons_intermittent_demand": 2,   # lineitem + broadcast part dim
    "burrows_delta_sources": 0,          # (source, term) counts ckpt'd
}


@pytest.mark.parametrize("name", sorted(SCAN_BUDGETS_R12))
def test_r12_final_plan_scan_budget(spark, sf_dir, name):
    df = REG[name].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_scans = plan.count("Scan parquet")
    assert n_scans <= SCAN_BUDGETS_R12[name], (
        f"{name}: {n_scans} parquet scans (budget "
        f"{SCAN_BUDGETS_R12[name]}) — a bounded multi-consumer "
        f"intermediate lost its checkpoint")


def _window_nodes(df):
    jplan = df._jdf.queryExecution().sparkPlan()
    return [n for n in _walk_jplan(jplan)
            if n.getClass().getSimpleName().startswith("WindowExec")]


def test_r12_littles_law_windows_partition_by_user(spark, sf_dir):
    """The sessionization windows must partition by user_id — a
    grows-with-data key, never an unpartitioned sweep over raw
    rows (windows live inside the checkpointed session build, so
    assert on that subplan, not the final plan)."""
    from de_project_airflow_etl_spark.tables import load
    from pyspark.sql import Window, functions as F
    e = load(spark, sf_dir, "events").selectExpr(
        "user_id", "unix_micros(ts) AS t")
    m = e.select("user_id", F.expr(
        "CASE WHEN LAG(t) OVER (PARTITION BY user_id ORDER BY t)"
        " IS NULL THEN 1 ELSE 0 END").alias("x"))
    for wnode in _window_nodes(m):
        spec = wnode.toString()
        assert "user_id" in spec.split("windowspecdefinition")[-1][:80]


@pytest.mark.parametrize("name", ["crostons_intermittent_demand"])
def test_r12_fold_windows_consume_aggregates(spark, sf_dir, name):
    df = REG[name].fn(spark, sf_dir)
    for wnode in _window_nodes(df):
        sub = list(_walk_jplan(wnode.children().apply(0)))
        names = [ch.getClass().getSimpleName() for ch in sub]
        assert any("Aggregate" in n for n in names) or not any(
            "FileSourceScan" in n for n in names), name


# ------------------------------------------------ invariants


def test_r12_srm_consistent(spark, sf_dir):
    row = REG["sample_ratio_mismatch_check"].fn(
        spark, sf_dir).collect()[0]
    assert row.n_a > 0 and row.n_b > 0
    assert row.chi2_stat >= 0.0


def test_r12_cuped_consistent(spark, sf_dir):
    rows = REG["cuped_adjusted_lift"].fn(spark, sf_dir).collect()
    assert {r.arm for r in rows} == {"A", "B"}
    thetas = {r.theta for r in rows}
    assert len(thetas) == 1  # pooled theta identical across arms
    for r in rows:
        assert r.n_users > 0
        assert r.mean_y >= 0.0 and r.mean_x >= 0.0


def test_r12_littles_law_identity(spark, sf_dir):
    """L = lambda * W must hold EXACTLY up to float rounding — it is
    the integral identity the query's docstring claims."""
    row = REG["littles_law_sessions"].fn(spark, sf_dir).collect()[0]
    lam_per_us = row.lambda_per_hour / 3_600_000_000
    w_us = row.w_mean_s * 1_000_000
    assert abs(lam_per_us * w_us - row.l_avg_concurrent) <= 1e-9 * max(
        1.0, row.l_avg_concurrent)
    assert row.n_sessions > 0
    assert row.total_dur_us >= 0


def test_r12_croston_consistent(spark, sf_dir):
    row = REG["crostons_intermittent_demand"].fn(
        spark, sf_dir).collect()[0]
    assert row.n_demand_days >= 1
    assert 0 <= row.z_size <= row.total_qty
    assert row.p_interval >= 0
    if row.demand_per_day is not None:
        assert row.demand_per_day >= 0.0


def test_r12_burrows_delta_consistent(spark, sf_dir):
    rows = REG["burrows_delta_sources"].fn(spark, sf_dir).collect()
    # 20 sources -> 190 unordered pairs
    n_sources = len({r.source_a for r in rows}
                    | {r.source_b for r in rows})
    assert len(rows) == n_sources * (n_sources - 1) // 2
    for r in rows:
        assert r.source_a < r.source_b
        assert r.delta >= 0.0
