"""Physical-plan gates for the round-6 surface bank
(queries/surfaces_r6.py): the two analytics-shaped queries must keep
their bounded-window / pruned-scan shapes, and nothing in the bank may
plan an unbounded nested loop."""

from __future__ import annotations

import pytest

from de_project_airflow_etl_spark.plans.inspect import (
    bnlj_builds_are_scalar, formatted_plan, scan_read_schema, _walk_jplan,
)
from de_project_airflow_etl_spark.registry import all_queries

SURFACE_BANK = {n: q for n, q in all_queries().items()
                if q.fn.__module__
                == "de_project_airflow_etl_spark.queries.surfaces_r6"}


@pytest.fixture(autouse=True)
def _release_caches(spark):
    yield
    spark.catalog.clearCache()


def test_surface_bank_is_registered():
    assert len(SURFACE_BANK) == 7, sorted(SURFACE_BANK)


@pytest.mark.parametrize("name", sorted(SURFACE_BANK))
def test_surface_plans_have_no_unbounded_nested_loops(spark, sf_dir,
                                                      name):
    df = SURFACE_BANK[name].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, name
    offenders = bnlj_builds_are_scalar(df)
    assert not offenders, f"{name}: non-scalar BNLJ builds: {offenders}"


def test_dim_variance_window_sits_above_dim_aggregate(spark, sf_dir):
    """The rank window is only legal unpartitioned because its input is
    the 64-row per-dimension aggregate: every WindowExec's subtree must
    contain an Aggregate."""
    df = SURFACE_BANK["embedding_dim_variance_rank"].fn(spark, sf_dir)
    jplan = df._jdf.queryExecution().sparkPlan()
    windows = [n for n in _walk_jplan(jplan)
               if n.getClass().getSimpleName().startswith("WindowExec")]
    assert windows, "expected a rank WindowExec"
    for wnode in windows:
        sub = list(_walk_jplan(wnode.children().apply(0)))
        assert any("Aggregate" in ch.getClass().getSimpleName()
                   for ch in sub), "rank window consumes raw rows"


def test_shard_plan_windows_are_block_hierarchical(spark, sf_dir):
    """The distributed prefix sum: exactly one window may run over the
    block-level relation (which must sit above the block aggregate);
    the doc-level window must be partitioned by (source, blk) — its
    partitions are bounded by the block size, never raw-corpus-sized."""
    df = SURFACE_BANK["token_budget_shard_plan"].fn(spark, sf_dir)
    jplan = df._jdf.queryExecution().sparkPlan()
    windows = [n for n in _walk_jplan(jplan)
               if n.getClass().getSimpleName().startswith("WindowExec")]
    assert len(windows) == 2, [w.nodeName() for w in windows]
    descs = [w.simpleString(30) for w in windows]
    # one window partitioned by (source, blk) — the bounded intra-block
    # cumsum; the other over the 64x-reduced block relation
    intra = [d for d in descs if "blk" in d and "doc_id" in d]
    assert intra, descs
    # the doc-level scan feeding it prunes to the consumed columns
    schemas = scan_read_schema(df)
    assert schemas
    for line in schemas:
        assert "text" in line or "doc_id" in line, line
        assert "lang" not in line, f"documents scan not pruned: {line}"


def test_xml_roundtrip_scan_prunes_orders(spark, sf_dir):
    df = SURFACE_BANK["xml_order_roundtrip"].fn(spark, sf_dir)
    for line in scan_read_schema(df):
        assert "o_comment" not in line and "o_custkey" not in line, (
            f"orders scan not pruned: {line}")
