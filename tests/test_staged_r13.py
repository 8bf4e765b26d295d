"""Targeted gates for the round-13 staged bank (privacy/governance
audits). The blanket oracle-match / non-empty / BNLJ gates in
tests/test_staged_r7.py already parametrize over ALL staged queries.
"""

from __future__ import annotations

import pytest

from de_project_airflow_etl_spark.staged import STAGED

SCAN_BUDGETS_R13 = {
    "k_anonymity_audit": 1,
    "l_diversity_audit": 1,
    "dp_sensitivity_audit": 1,
}


@pytest.mark.parametrize("name", sorted(SCAN_BUDGETS_R13))
def test_r13_final_plan_scan_budget(spark, sf_dir, name):
    df = STAGED[name].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") <= SCAN_BUDGETS_R13[name], name


def test_r13_k_anonymity_consistent(spark, sf_dir):
    row = STAGED["k_anonymity_audit"].fn(spark, sf_dir).collect()[0]
    assert row.min_k >= 1
    assert row.n_cells_under_5 <= row.n_cells
    assert row.n_rows_under_5 <= row.n_rows
    assert 0.0 <= row.frac_rows_under_5 <= 1.0
    # the grid is bounded: |types| x 7 weekdays x 10 bands
    assert row.n_cells <= 5 * 7 * 10


def test_r13_l_diversity_consistent(spark, sf_dir):
    row = STAGED["l_diversity_audit"].fn(spark, sf_dir).collect()[0]
    assert row.min_l >= 1
    assert row.n_rows_single_subject <= row.n_rows_under_l3 or (
        row.min_l >= 3)


def test_r13_dp_sensitivity_consistent(spark, sf_dir):
    row = STAGED["dp_sensitivity_audit"].fn(spark, sf_dir).collect()[0]
    assert row.n_users > 0
    assert row.linf_count_sensitivity >= 1
    assert row.linf_day_sensitivity >= 1
    assert 0.0 < row.max_user_share <= 1.0
    # max >= mean always
    assert row.linf_sum_sensitivity_c / 100 >= row.mean_user_total - 1e-9
