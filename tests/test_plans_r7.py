"""Physical-plan gates for the round-7 promoted bank
(queries/surfaces_r7.py + queries/evaluation.py): no cartesian
products, nested-loop joins only with documented-bounded broadcast
builds, statistics windows confined to post-aggregate inputs, and
scans pruned to the columns the query consumes. Correct results with
a wrong plan fail here. Oracle equality rides the registry-wide
tests/test_correctness.py sweep.

The query-specific gates carried over verbatim from the staged-era
tests (tests/test_staged_r7.py, promoted in round 7)."""

from __future__ import annotations

import re

import pytest

from de_project_airflow_etl_spark.plans.inspect import (
    bnlj_builds_are_scalar, formatted_plan, has_broadcast_join,
    scan_read_schema, _walk_jplan,
)
from de_project_airflow_etl_spark.registry import all_queries

# the round-7 bank: everything registered by the two promoted modules
R7_BANK = {n: q for n, q in all_queries().items()
           if q.fn.__module__ in
           ("de_project_airflow_etl_spark.queries.surfaces_r7",
            "de_project_airflow_etl_spark.queries.evaluation")}


@pytest.fixture(autouse=True)
def _release_caches(spark):
    yield
    spark.catalog.clearCache()


def test_bank_is_complete():
    assert len(R7_BANK) == 36, sorted(R7_BANK)


# ------------------------------------------------- blanket join gate

# BNLJ builds the scalar/limit detector cannot classify but whose
# boundedness is a documented design property, not an accident:
_JUSTIFIED_BNLJ_BUILDS = {
    # broadcasts the fixed ~4% anchor id-slice onto the corpus with an
    # id-inequality predicate — the documented 'broadcast the query
    # set, never shuffle the corpus' shape (same as
    # negative_sampling_pairs in the round-6 bank)
    "contrastive_triplet_mining",
    # broadcasts the FIXED 20-vector evaluation panel onto one corpus
    # scan with a self-exclusion inequality — same shape, and the
    # panel is constant-size by construction (vec_id < 500 gate)
    "map_retrieval_eval",
}


@pytest.mark.parametrize("name", sorted(R7_BANK))
def test_plans_have_no_unbounded_nested_loops(spark, sf_dir, name):
    df = R7_BANK[name].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, name
    if name in _JUSTIFIED_BNLJ_BUILDS:
        return
    offenders = bnlj_builds_are_scalar(df)
    assert not offenders, f"{name}: non-scalar BNLJ builds: {offenders}"


# ------------------------------- targeted plan shapes (first half)


def test_macd_is_single_projection_fold(spark, sf_dir):
    """The MACD fold must stay ONE generator projection above the
    daily rollup (the CollapseProject re-evaluation lesson): exactly
    one aggregate() call in the executed plan."""
    df = R7_BANK["macd_daily_revenue"].fn(spark, sf_dir)
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert executed.count("aggregate(") == 1, executed[:2000]


def test_triplet_mining_has_no_window_and_no_candidate_arrays(spark,
                                                              sf_dir):
    """Hardest-pos/neg selection must be max_by/min_by single-value
    aggregation: no rank window, no collect_list of per-anchor
    candidate arrays in the plan."""
    plan = formatted_plan(
        R7_BANK["contrastive_triplet_mining"].fn(spark, sf_dir))
    assert "WindowExec" not in plan and "Window (" not in plan.replace(
        "WindowGroupLimit", ""), "rank window crept in"
    assert "collect_list" not in plan, "per-anchor candidate arrays"


def test_method_agreement_shuffles_hashes_not_text(spark, sf_dir):
    """The three per-key count exchanges must key on md5 hashes: after
    the keyed projection no exchange may carry the text column. r11:
    the counts are COUNT(*) OVER (PARTITION BY k_i) windows (the
    partition keys grow with data, so this is not the fixed-key
    hazard) instead of groupBy + join-back — the plan must hold
    exactly ONE documents scan (the old shape re-parsed text 4x)."""
    df = R7_BANK["dedup_method_agreement"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "text" not in m.group(1), m.group(0)
    n_scans = len(re.findall(r"\(\d+\) Scan parquet", plan))
    assert n_scans == 1, f"expected 1 documents scan, saw {n_scans}"


def test_cohort_triangle_broadcasts_sizes(spark, sf_dir):
    assert has_broadcast_join(
        R7_BANK["weekly_cohort_triangle"].fn(spark, sf_dir))


def test_session_histogram_windows_are_user_partitioned(spark, sf_dir):
    """The sessionize window must partition by user_id — never a
    global ordering of the event stream."""
    df = R7_BANK["session_duration_log2_histogram"].fn(spark, sf_dir)
    jplan = df._jdf.queryExecution().sparkPlan()
    windows = [n for n in _walk_jplan(jplan)
               if n.getClass().getSimpleName().startswith("WindowExec")]
    assert windows
    for wnode in windows:
        assert "user_id" in wnode.simpleString(25), wnode.simpleString(25)


def test_quality_vote_is_zero_shuffle_scan(spark, sf_dir):
    """Per-doc flags are array lambdas in codegen; the only exchange
    is the |sources|-cell aggregate."""
    plan = formatted_plan(R7_BANK["quality_ensemble_vote"].fn(spark, sf_dir))
    assert plan.count("Exchange") <= 2, plan[:1500]
    schemas = scan_read_schema(
        R7_BANK["quality_ensemble_vote"].fn(spark, sf_dir))
    assert schemas and all("doc_id" not in s for s in schemas), schemas
