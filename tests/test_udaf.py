"""Property tests for the grouped pandas UDAF family: each aggregate
must equal a brute-force pure-python computation over the expanded
multiset, for ANY weighted value set — the trim/streak/quantile edge
cases (boundary weights, ties, single elements) live here, not in the
fixed testdata."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

prop = settings(max_examples=10, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture])

weighted = st.lists(
    st.tuples(st.integers(min_value=-1000, max_value=1000),   # value
              st.integers(min_value=1, max_value=7)),         # weight
    min_size=1, max_size=20)


def _expand(pairs):
    out = []
    for v, w in pairs:
        out.extend([v] * w)
    return sorted(out)


def _run_udaf(spark, udaf, pairs):
    df = spark.createDataFrame(
        [("g", v, w) for v, w in pairs], "g string, v long, w long")
    # mirror the registry queries: pre-aggregate (v -> sum w) first
    pre = df.groupBy("g", "v").agg(F.sum("w").alias("w"))
    return pre.groupBy("g").agg(udaf("v", "w").alias("out")).first()["out"]


@given(pairs=weighted)
@prop
def test_weighted_lower_median_matches_expanded(spark, pairs):
    from de_project_airflow_etl_spark.operators.udaf import (
        _weighted_lower_median,
    )
    exp = _expand(pairs)
    assert (_run_udaf(spark, _weighted_lower_median, pairs)
            == exp[(len(exp) - 1) // 2])


@given(pairs=weighted)
@prop
def test_trimmed_sum_matches_expanded(spark, pairs):
    from de_project_airflow_etl_spark.operators.udaf import _trimmed_sum
    exp = _expand(pairs)
    k = len(exp) // 10
    expected = sum(exp[k:len(exp) - k])
    assert _run_udaf(spark, _trimmed_sum, pairs) == expected


@given(pairs=weighted)
@prop
def test_quartiles_and_tukey_match_expanded(spark, pairs):
    from de_project_airflow_etl_spark.operators.udaf import (
        _q1_disc, _q3_disc, _tukey_outlier_count,
    )
    exp = _expand(pairs)
    n = len(exp)
    q1, q3 = exp[(n - 1) // 4], exp[(3 * (n - 1)) // 4]
    out = sum(1 for v in exp
              if 2 * v < 5 * q1 - 3 * q3 or 2 * v > 5 * q3 - 3 * q1)
    assert _run_udaf(spark, _q1_disc, pairs) == q1
    assert _run_udaf(spark, _q3_disc, pairs) == q3
    assert _run_udaf(spark, _tukey_outlier_count, pairs) == out


@given(days=st.lists(st.integers(min_value=0, max_value=60),
                     min_size=1, max_size=30))
@prop
def test_longest_run_matches_reference(spark, days):
    from de_project_airflow_etl_spark.operators.udaf import _longest_run
    df = spark.createDataFrame([("g", d) for d in days], "g string, d long")
    got = (df.distinct().groupBy("g")
             .agg(_longest_run("d").alias("s")).first()["s"])
    uniq = sorted(set(days))
    best = cur = 1
    for a, b in zip(uniq, uniq[1:]):
        cur = cur + 1 if b == a + 1 else 1
        best = max(best, cur)
    assert got == best


def test_modal_string_tie_breaks_lexicographically(spark):
    from de_project_airflow_etl_spark.operators.udaf import _modal_string
    df = spark.createDataFrame(
        [("g", "zeta", 3), ("g", "beta", 3), ("g", "alpha", 2)],
        "g string, v string, w long")
    got = (df.groupBy("g")
             .agg(_modal_string("v", "w").alias("m")).first()["m"])
    assert got == "beta"  # 3-way count tie between beta/zeta -> smallest
