"""Targeted gates for the round-14 staged bank (operating-point /
lift evaluation, actuarial survival, contingency residuals,
reliability, corpus/embedding panels) — plan shapes plus range
invariants.

The blanket oracle-match / non-empty / BNLJ gates in
tests/test_staged_pen.py already parametrize over ALL staged queries.
"""

from __future__ import annotations

import pytest

from de_project_airflow_etl_spark.plans.inspect import _walk_jplan
from de_project_airflow_etl_spark.registry import all_queries

REG = all_queries()

SCAN_BUDGETS_R14 = {
    "youden_j_optimal_threshold": 0,    # cents cells checkpointed
    "decile_lift_table": 0,             # (cents, p) cells checkpointed
    "actuarial_life_table": 0,          # interval cells checkpointed
    "haberman_adjusted_residuals": 0,   # 35-cell table checkpointed
    "cronbachs_alpha_quality_rules": 1,
    "vocab_coverage_curve": 0,          # vocab tf table checkpointed
    "cross_source_ngram_overlap": 0,    # gram set checkpointed
    # r11: the data-sized quantized-explode checkpoint was REMOVED
    # (measured-loss materialization class) — qq now rides the single
    # 64-group dim aggregate and n is a column-pruned count, so the
    # final plan legitimately holds exactly 2 parquet scans (the one
    # heavy explode pass + the count-only scan); 3+ would mean the
    # explode re-executes for a second consumer again
    "embedding_isotropy_panel": 2,
}


@pytest.fixture(autouse=True)
def _release_caches(spark):
    yield
    spark.catalog.clearCache()


@pytest.mark.parametrize("name", sorted(SCAN_BUDGETS_R14))
def test_r14_final_plan_scan_budget(spark, sf_dir, name):
    df = REG[name].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_scans = plan.count("Scan parquet")
    assert n_scans <= SCAN_BUDGETS_R14[name], (
        f"{name}: {n_scans} parquet scans (budget "
        f"{SCAN_BUDGETS_R14[name]})")


def _window_nodes(df):
    jplan = df._jdf.queryExecution().sparkPlan()
    return [n for n in _walk_jplan(jplan)
            if n.getClass().getSimpleName().startswith("WindowExec")]


@pytest.mark.parametrize("name", [
    "cronbachs_alpha_quality_rules", "haberman_adjusted_residuals",
    "cross_source_ngram_overlap", "embedding_isotropy_panel",
])
def test_r14_no_window_nodes(spark, sf_dir, name):
    assert not _window_nodes(REG[name].fn(spark, sf_dir)), name


# ------------------------------------------------ range invariants


def test_youden_point_consistency(spark, sf_dir):
    row = REG["youden_j_optimal_threshold"].fn(
        spark, sf_dir).collect()[0]
    assert 0.0 <= row["sensitivity"] <= 1.0
    assert 0.0 <= row["specificity"] <= 1.0
    assert abs(row["j_stat"] - (row["sensitivity"]
               + row["specificity"] - 1.0)) < 1e-12
    assert row["j_stat"] >= 0.0  # J at the optimum beats chance


def test_decile_lift_partitions_and_gains(spark, sf_dir):
    rows = sorted(REG["decile_lift_table"].fn(
        spark, sf_dir).collect(), key=lambda r: r["decile"])
    assert [r["decile"] for r in rows] == list(range(1, 11))
    n = sum(r["n_events"] for r in rows)
    # deciles partition the population with near-equal sizes
    assert max(r["n_events"] for r in rows) - min(
        r["n_events"] for r in rows) <= 1
    assert rows[-1]["cum_gain"] == pytest.approx(1.0, abs=1e-12)
    gains = [r["cum_gain"] for r in rows]
    assert gains == sorted(gains)
    assert all(r["lift"] >= 0.0 for r in rows)
    assert n == sum(r["n_events"] for r in rows)


def test_actuarial_life_table_monotone_survival(spark, sf_dir):
    rows = sorted(REG["actuarial_life_table"].fn(
        spark, sf_dir).collect(), key=lambda r: r["interval_idx"])
    assert rows, "at least one interval"
    s_prev, n_prev = 1.0, None
    for r in rows:
        assert 0.0 <= r["cond_q"] <= 1.0
        assert r["surv_s"] <= s_prev + 1e-12
        s_prev = r["surv_s"]
        if n_prev is not None:
            assert r["n_enter"] <= n_prev
        n_prev = r["n_enter"]


def test_haberman_residuals_cover_the_table(spark, sf_dir):
    rows = REG["haberman_adjusted_residuals"].fn(
        spark, sf_dir).collect()
    assert len(rows) == 35  # 7 dows x 5 event types
    assert sum(r["o"] for r in rows) == pytest.approx(
        sum(r["expected"] for r in rows), rel=1e-9)


def test_cronbach_alpha_bounds(spark, sf_dir):
    row = REG["cronbachs_alpha_quality_rules"].fn(
        spark, sf_dir).collect()[0]
    # alpha <= 1 always; can be negative, but the ratio is positive
    assert row["cronbach_alpha"] <= 1.0
    assert row["item_to_total_var_ratio"] > 0.0


def test_vocab_coverage_monotone(spark, sf_dir):
    row = REG["vocab_coverage_curve"].fn(spark, sf_dir).collect()[0]
    assert 1 <= row["k50"] <= row["k90"] <= row["k95"] <= row["k99"] \
        <= row["vocab_size"]


def test_cross_source_overlap_symmetric_pairs(spark, sf_dir):
    rows = REG["cross_source_ngram_overlap"].fn(
        spark, sf_dir).collect()
    for r in rows:
        assert r["source_a"] < r["source_b"]  # unordered, canonical
        assert 0.0 <= r["containment"] <= 1.0
        assert r["n_shared"] <= min(r["n_grams_a"], r["n_grams_b"])


def test_isotropy_bounds(spark, sf_dir):
    row = REG["embedding_isotropy_panel"].fn(
        spark, sf_dir).collect()[0]
    assert -1.0 <= row["mean_pairwise_cosine"] <= 1.0
    # quantized normalized vectors have squared norm ~ 1
    assert row["mean_sq_norm_q"] == pytest.approx(1.0, abs=1e-3)
