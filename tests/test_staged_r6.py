"""Round-6 staged queries: exact-value verification vs DuckDB through
the same harness the registry uses, ahead of their promotion into the
driver-facing registry (see de_project_airflow_etl_spark/staged/__init__.py
for the window-arithmetic rationale)."""

from __future__ import annotations

import pytest

from de_project_airflow_etl_spark.staged import STAGED
from tests.harness import compare


@pytest.fixture(autouse=True)
def _release_staged_caches(spark):
    yield
    spark.catalog.clearCache()


@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_query_matches_oracle(name, spark, sf_dir, duck):
    q = STAGED[name]
    assert q.oracle is not None, f"{name}: staged queries must ship oracles"
    problems = compare(q.fn(spark, sf_dir),
                       duck.execute(q.oracle).fetchdf(), name)
    assert not problems, "\n".join(problems)


def test_staged_names_do_not_collide_with_registry():
    from de_project_airflow_etl_spark.registry import all_queries
    clash = set(STAGED) & set(all_queries())
    assert not clash, f"staged names already registered: {sorted(clash)}"


def test_staged_results_nonempty(spark, sf_dir):
    for name, q in sorted(STAGED.items()):
        df = q.fn(spark, sf_dir)
        assert df.columns, f"{name}: empty schema"
        assert df.limit(1).count() == 1, f"{name}: empty result at {sf_dir}"
