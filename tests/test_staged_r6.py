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


# ------------------------------ BPE merge overlap-resolution property

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_prop = settings(max_examples=10, deadline=None,
                 suppress_health_check=[HealthCheck.function_scoped_fixture])


def _py_bpe_one_merge(toks):
    """Reference single BPE merge: most frequent adjacent pair
    (LEAD-style overlapping counts; ties lexicographic), applied
    greedily left-to-right non-overlapping."""
    from collections import Counter
    pairs = Counter(zip(toks, toks[1:]))
    if not pairs:
        return toks, 0
    (t1, t2), _ = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
    out, i, merges = [], 0, 0
    while i < len(toks):
        if i + 1 < len(toks) and toks[i] == t1 and toks[i + 1] == t2:
            out.append(f"{t1}_{t2}")
            merges += 1
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return out, merges


@given(toks=st.lists(st.sampled_from(["a", "b", "c"]),
                     min_size=2, max_size=20))
@_prop
def test_bpe_merge_matches_greedy_reference(spark, tmp_path_factory, toks):
    """For ANY sequence over a tiny alphabet — including the 'a a a a'
    overlap chains the islands logic exists for — the merged output
    must equal the greedy left-to-right reference."""
    import hashlib
    tmp = tmp_path_factory.mktemp("bpe")
    text = " ".join(toks)
    (spark.createDataFrame(
        [(0, text, "en", "s", len(text))],
        "doc_id long, text string, lang string, source string,"
        " n_chars long")
     .write.mode("overwrite").parquet(f"{tmp}/documents.parquet"))
    from de_project_airflow_etl_spark.staged.round6 import bpe_merge_apply
    row = bpe_merge_apply(spark, str(tmp)).collect()[0]
    expect, merges = _py_bpe_one_merge(toks)
    assert row["n_before"] == len(toks)
    assert row["n_merges"] == merges
    assert row["n_after"] == len(expect)
    assert row["merged_md5"] == hashlib.md5(
        " ".join(expect).encode()).hexdigest()
