"""Targeted gates for the round-10c staged bank (pooled-EDF panel,
decomposition strength, Grubbs, winsorized mean, partial correlation)
— plan-shape evidence plus range invariants.

The blanket oracle-match / non-empty / BNLJ gates in
tests/test_staged_pen.py already parametrize over ALL staged queries.
"""

from __future__ import annotations

import pytest

from de_project_airflow_etl_spark.plans.inspect import _walk_jplan
from de_project_airflow_etl_spark.registry import all_queries

REG = all_queries()

SCAN_BUDGETS_R10C = {
    "edf_two_sample_panel_weekend": 0,  # cents cells checkpointed
    "seasonal_strength_weekly": 1,
    "grubbs_max_deviation_daily": 0,   # daily table checkpointed
    "winsorized_mean_value": 0,        # cents cells checkpointed
    "partial_corr_revenue_count_dow": 1,
}


@pytest.fixture(autouse=True)
def _release_caches(spark):
    yield
    spark.catalog.clearCache()


@pytest.mark.parametrize("name", sorted(SCAN_BUDGETS_R10C))
def test_r10c_final_plan_scan_budget(spark, sf_dir, name):
    df = REG[name].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_scans = plan.count("Scan parquet")
    assert n_scans <= SCAN_BUDGETS_R10C[name], (
        f"{name}: {n_scans} parquet scans (budget "
        f"{SCAN_BUDGETS_R10C[name]})")


def _window_nodes(df):
    jplan = df._jdf.queryExecution().sparkPlan()
    return [n for n in _walk_jplan(jplan)
            if n.getClass().getSimpleName().startswith("WindowExec")]


# The in-array queries must plan with zero window nodes; the two
# cell-cumulation queries window only over post-aggregate cell tables
# (covered by the registry-wide audit once promoted; here we pin the
# window COUNT so a refactor can't sneak a raw-row window in).
@pytest.mark.parametrize("name", [
    "seasonal_strength_weekly", "grubbs_max_deviation_daily",
    "partial_corr_revenue_count_dow",
])
def test_r10c_no_window_nodes(spark, sf_dir, name):
    assert not _window_nodes(REG[name].fn(spark, sf_dir)), name


@pytest.mark.parametrize("name, max_wins", [
    ("edf_two_sample_panel_weekend", 1),
    ("winsorized_mean_value", 2),
])
def test_r10c_cell_windows_bounded(spark, sf_dir, name, max_wins):
    wins = _window_nodes(REG[name].fn(spark, sf_dir))
    assert len(wins) <= max_wins, name


# ------------------------------------------------ range invariants


def test_edf_panel_bounds(spark, sf_dir):
    row = REG["edf_two_sample_panel_weekend"].fn(
        spark, sf_dir).collect()[0]
    assert 0.0 <= row["d_plus"] <= 1.0
    assert 0.0 <= row["d_minus"] <= 1.0
    assert row["ks_d"] == max(row["d_plus"], row["d_minus"])
    assert abs(row["kuiper_v"] - (row["d_plus"] + row["d_minus"])) < 1e-15
    assert row["ad_stat"] >= 0.0


def test_seasonal_strength_bounds(spark, sf_dir):
    row = REG["seasonal_strength_weekly"].fn(
        spark, sf_dir).collect()[0]
    assert 0.0 <= row["seasonal_strength"] <= 1.0
    assert row["var_detrended"] >= row["var_remainder"] >= 0.0 or (
        row["seasonal_strength"] == 0.0)


def test_grubbs_positive(spark, sf_dir):
    row = REG["grubbs_max_deviation_daily"].fn(
        spark, sf_dir).collect()[0]
    assert row["g_stat"] > 0.0
    # G is bounded by (n-1)/sqrt(n)
    assert row["g_stat"] <= (row["n_days"] - 1) / row["n_days"] ** 0.5


def test_winsorized_mean_between_bounds(spark, sf_dir):
    row = REG["winsorized_mean_value"].fn(spark, sf_dir).collect()[0]
    assert row["p05_cents"] <= row["p95_cents"]
    assert (row["p05_cents"] / 100.0 <= row["winsorized_mean"]
            <= row["p95_cents"] / 100.0)
    assert row["winsorized_mean"] > 0.0


def test_partial_corr_bounds(spark, sf_dir):
    row = REG["partial_corr_revenue_count_dow"].fn(
        spark, sf_dir).collect()[0]
    assert -1.0 <= row["partial_corr"] <= 1.0
    assert row["sxx_w"] > 0.0 and row["syy_w"] > 0.0
