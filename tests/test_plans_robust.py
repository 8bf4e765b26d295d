"""Physical-plan gates for the round-7 new-surface bank
(queries/robust.py + the streaming dedup in streaming/ingest.py):
no cartesian products, nested-loop joins only with documented
calendar-/vocabulary-bounded builds, statistics windows sitting above
aggregates, sequential folds collapsed to one projection, and the
Markov iteration's lineage truncated. Oracle equality rides the
registry-wide tests/test_correctness.py sweep."""

from __future__ import annotations

import pytest

from de_project_airflow_etl_spark.plans.inspect import (
    bnlj_builds_are_scalar, formatted_plan, _walk_jplan,
)
from de_project_airflow_etl_spark.registry import all_queries

R7N_BANK = {n: q for n, q in all_queries().items()
            if q.fn.__module__
            == "de_project_airflow_etl_spark.queries.robust"}


@pytest.fixture(autouse=True)
def _release_caches(spark):
    yield
    spark.catalog.clearCache()


def test_bank_is_complete():
    assert len(R7N_BANK) == 7, sorted(R7N_BANK)


# ------------------------------------------------- blanket join gate

# BNLJ builds the scalar/limit detector cannot classify but whose
# boundedness is a documented design property, not an accident:
_JUSTIFIED_BNLJ_BUILDS = {
    # weekend x weekday day-pair join over the calendar-bounded daily
    # rollup (<= 366^2/4 pairs at any corpus size) plus the
    # median-row broadcast — the theil_sen day-pair precedent
    "hodges_lehmann_weekend_shift",
    # day-pair self-join (b.x <> a.x) over the daily rollup, plus the
    # one-row median filters broadcast back over calendar-bounded
    # relations — same precedent
    "siegel_repeated_medians_trend",
    # scenario panel x transition matrix: both vocabulary-bounded
    # ((|types|+1) x (|types|+2)^2 rows) by construction, and the
    # one-row full-chain probability broadcast is a filter the
    # detector cannot classify as scalar
    "markov_removal_effect_attribution",
}


@pytest.mark.parametrize("name", sorted(R7N_BANK))
def test_plans_have_no_unbounded_nested_loops(spark, sf_dir, name):
    df = R7N_BANK[name].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, name
    if name in _JUSTIFIED_BNLJ_BUILDS:
        return
    offenders = bnlj_builds_are_scalar(df)
    assert not offenders, f"{name}: non-scalar BNLJ builds: {offenders}"


# ----------------------------------------- window-hazard structure


def _window_nodes(df):
    jplan = df._jdf.queryExecution().sparkPlan()
    return [n for n in _walk_jplan(jplan)
            if n.getClass().getSimpleName().startswith("WindowExec")]


def _windows_sit_above_aggregates(df) -> None:
    windows = _window_nodes(df)
    assert windows, "expected a WindowExec"
    for wnode in windows:
        sub = list(_walk_jplan(wnode.children().apply(0)))
        assert any("Aggregate" in ch.getClass().getSimpleName()
                   for ch in sub), "window consumes un-aggregated rows"


def test_pr_auc_windows_sit_above_aggregates(spark, sf_dir):
    """The unpartitioned cumulative window is only legal because its
    input is the bounded score-cell table: every WindowExec subtree
    must contain an Aggregate (the global_row_number lesson)."""
    _windows_sit_above_aggregates(
        R7N_BANK["pr_auc_purchase_value"].fn(spark, sf_dir))


@pytest.mark.parametrize("name", ["hodges_lehmann_weekend_shift",
                                  "siegel_repeated_medians_trend"])
def test_median_windows_consume_checkpointed_rollup(spark, sf_dir, name):
    """The unpartitioned median-rank windows consume the
    localCheckpoint-ed calendar-bounded daily rollup — the checkpoint
    hides the Aggregate root from the subtree walk (the round-6-late
    gate-visibility lesson), so the provable property is that no
    window subtree touches a raw parquet scan."""
    df = R7N_BANK[name].fn(spark, sf_dir)
    windows = _window_nodes(df)
    assert windows, "expected a WindowExec"
    for wnode in windows:
        sub = wnode.children().apply(0).toString()
        assert "Scan parquet" not in sub, (name, sub[:800])


def test_single_pass_statistics_have_no_joins_or_windows(spark, sf_dir):
    """MCC and Cohen's d are one map-side-combinable aggregate over
    the scan: no joins, no windows anywhere."""
    for name in ("matthews_corr_quality_rules", "cohens_d_weekend_value"):
        df = R7N_BANK[name].fn(spark, sf_dir)
        jplan = df._jdf.queryExecution().sparkPlan()
        names = [n.getClass().getSimpleName() for n in _walk_jplan(jplan)]
        assert not any("Join" in n for n in names), (name, names)
        assert not any(n.startswith("WindowExec") for n in names), (
            name, names)


def test_ewma_is_single_projection_fold(spark, sf_dir):
    """The EWMA fold must stay ONE generator projection above the
    daily rollup (the CollapseProject re-evaluation lesson): exactly
    one aggregate() call in the executed plan."""
    df = R7N_BANK["ewma_control_chart_daily"].fn(spark, sf_dir)
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert executed.count("aggregate(") == 1, executed[:2000]


def test_markov_iteration_lineage_is_truncated(spark, sf_dir):
    """After 12 fixed-point iterations the FINAL plan must consume
    checkpointed bounded relations only — zero parquet scans (the
    pca_power_iter exponential-lineage lesson)."""
    df = R7N_BANK["markov_removal_effect_attribution"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 0, plan[:2000]


def test_markov_attribution_shares_sum_to_one(spark, sf_dir):
    rows = (R7N_BANK["markov_removal_effect_attribution"]
            .fn(spark, sf_dir).collect())
    assert rows
    total = sum(r["attribution_share"] for r in rows)
    assert abs(total - 1.0) < 1e-9
    for r in rows:
        # removal can only ever LOWER conversion (monotone under edge
        # removal, preserved by truncating fixed point)
        assert 0 <= r["conv_e12_removed"] <= r["conv_e12_full"]


def test_streaming_dedup_matches_batch_distinct(spark, sf_dir, duck):
    """Stream/batch agreement for dropDuplicatesWithinWatermark (also
    covered by the registry sweep; pinned here so the streaming file
    keeps a dedicated gate)."""
    from tests.harness import compare
    q = all_queries()["streaming_dedup_within_watermark"]
    problems = compare(q.fn(spark, sf_dir),
                       duck.execute(q.oracle).fetchdf(), q.name)
    assert not problems, "\n".join(problems)
