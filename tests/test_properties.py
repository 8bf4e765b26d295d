"""Property-based tests (hypothesis): invariants that hold for ANY
input, not just the fixed testdata — gap-sessionization laws, exact
cents aggregation, and rolling-hash agreement with a reference
implementation.

Each property runs a real (tiny) Spark job per example, so example
counts are deliberately small and deadlines disabled.
"""

from __future__ import annotations

from datetime import datetime, timedelta
from decimal import Decimal

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

GAP_US = 30 * 60 * 1_000_000
BASE = datetime(2024, 1, 1)

prop = settings(max_examples=12, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture])


@given(offsets=st.lists(
    st.integers(min_value=0, max_value=6 * 3600), min_size=1, max_size=40,
    unique=True))
@prop
def test_session_window_partitions_events_by_gap(spark, offsets):
    """session_window(30m) must (a) keep every event, (b) never split
    a <gap pair, (c) never join a >=gap pair."""
    ts = sorted(BASE + timedelta(seconds=o) for o in offsets)
    df = spark.createDataFrame([(t,) for t in ts], "ts timestamp")
    sessions = (
        df.groupBy(F.session_window("ts", "30 minutes").alias("w"))
          .agg(F.count(F.lit(1)).alias("n"),
               F.min("ts").alias("start"), F.max("ts").alias("end"))
          .orderBy("start")
          .collect()
    )
    assert sum(r["n"] for r in sessions) == len(ts)          # (a)
    # reference sessionization: split where gap >= 30 min
    expected = 1
    for a, b in zip(ts, ts[1:]):
        if (b - a) >= timedelta(minutes=30):
            expected += 1
    assert len(sessions) == expected                          # (b)+(c)
    for prev, nxt in zip(sessions, sessions[1:]):
        assert nxt["start"] - prev["end"] >= timedelta(minutes=30)


@given(vals=st.lists(
    st.integers(min_value=-10_000_00, max_value=10_000_00),  # cents
    min_size=1, max_size=50))
@prop
def test_cents_sum_is_exact(spark, vals):
    """dsum over 2-decimal doubles equals exact Decimal arithmetic for
    any accumulation order (the determinism contract of util.cents)."""
    from de_project_airflow_etl_spark.queries.util import dsum
    doubles = [c / 100.0 for c in vals]
    df = spark.createDataFrame([(v,) for v in doubles], "x double")
    got = df.agg(dsum("x", "s")).first()["s"]
    expected = float(sum(Decimal(c) for c in vals) / 100)
    assert got == expected  # bit-exact, not approximate


@given(words=st.lists(
    st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=126),
            min_size=1, max_size=6),
    min_size=4, max_size=12))
@prop
def test_rolling_hash_matches_reference(spark, words):
    """The SQL rolling hash must equal a straight python Rabin-Karp."""
    from de_project_airflow_etl_spark.operators.text import RH_BASE, RH_MOD
    text = " ".join(words)
    df = spark.createDataFrame([(text,)], "text string")
    got = df.select(F.expr(
        f"aggregate(transform(split(text, ''), c -> ascii(c)),"
        f" cast(0 as bigint),"
        f" (acc, x) -> (acc * {RH_BASE} + x) % {RH_MOD})").alias("h")
    ).first()["h"]
    expected = 0
    for ch in text:
        expected = (expected * RH_BASE + ord(ch)) % RH_MOD
    assert got == expected
