"""Planted-ground-truth stress tests for the change/trend detector
family: synthetic event streams with a KNOWN level shift or a known
per-weekday monotone trend, asserting each detector fires exactly
where construction says it must (the planted-pair style of
tests/test_dedup_scale.py applied to time-series operators)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from de_project_airflow_etl_spark.registry import all_queries
from de_project_airflow_etl_spark.staged import STAGED

# registry + pen lookup: survives promotions moving a detector between
# the two (the names under test are promotion candidates by design)
Q = {**all_queries(), **STAGED}


def _write_events(spark, path, daily_cents):
    """One event per day with the given value (cents)."""
    base = datetime(2024, 1, 1)
    rows = [(i, base + timedelta(days=i), 1, "click", c / 100.0, "{}")
            for i, c in enumerate(daily_cents)]
    (spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
              " event_type string, value double, props string")
     .write.mode("overwrite").parquet(f"{path}/events.parquet"))


@pytest.fixture(scope="module")
def shift_dir(spark, tmp_path_factory):
    """60 days: 100.00/day, then 300.00/day from day 30 — a planted
    3x level shift at a known date."""
    tmp = tmp_path_factory.mktemp("shift")
    _write_events(spark, str(tmp),
                  [10_000] * 30 + [30_000] * 30)
    return str(tmp)


@pytest.fixture(scope="module")
def seasonal_trend_dir(spark, tmp_path_factory):
    """70 days: value = 100 + 2*day dollars, plus a +50 boost on one
    weekday — strictly increasing WITHIN every weekday, but not
    monotone day-over-day (the boost day drops the next day)."""
    tmp = tmp_path_factory.mktemp("strend")
    cents = [10_000 + 200 * d + (5_000 if d % 7 == 5 else 0)
             for d in range(70)]
    _write_events(spark, str(tmp), cents)
    return str(tmp)


def test_page_hinkley_alarms_after_the_planted_shift(spark, shift_dir):
    rows = sorted(Q["page_hinkley_drift_daily"]
                  .fn(spark, shift_dir).collect(),
                  key=lambda r: r["day"])
    alarms = [i for i, r in enumerate(rows) if r["alarm"] == 1]
    assert alarms, "a 3x level shift must trip the PH alarm"
    assert min(alarms) >= 30, "no alarm may fire before the shift"
    assert min(alarms) <= 40, "the alarm must fire within 10 days"
    # once drifted, the gap keeps growing: the alarm stays on
    assert all(rows[i]["alarm"] == 1 for i in range(min(alarms),
                                                    len(rows)))


@pytest.fixture(scope="module")
def burst_dir(spark, tmp_path_factory):
    """70 days: 100.00/day with a late 4x burst for the last 15 —
    ASYMMETRIC by design: the pooled 3-sigma band (the chart computes
    its limits from the whole series) sits near the majority level,
    so the burst-level EWMA must leave it while a symmetric 50/50
    shift never could (offset = sigma < 1.134*sigma halfwidth)."""
    tmp = tmp_path_factory.mktemp("burst")
    _write_events(spark, str(tmp), [10_000] * 55 + [40_000] * 15)
    return str(tmp)


def test_ewma_chart_signals_on_the_planted_burst(spark, burst_dir):
    from de_project_airflow_etl_spark.registry import all_queries
    rows = sorted(all_queries()["ewma_control_chart_daily"]
                  .fn(spark, burst_dir).collect(),
                  key=lambda r: r["day"])
    sigs = [i for i, r in enumerate(rows) if r["signal"] == 1]
    assert sigs, "the 4x burst must leave the 3-sigma EWMA band"
    assert min(sigs) >= 55, "no signal may fire before the burst"
    assert rows[-1]["signal"] == 1, "the converged burst level signals"


def test_seasonal_mk_sees_the_within_weekday_trend(spark,
                                                   seasonal_trend_dir):
    r = (Q["seasonal_mann_kendall_dow"]
         .fn(spark, seasonal_trend_dir).collect()[0])
    # strictly increasing within every weekday: S is the maximum
    # possible = 7 * C(10, 2) (70 days = 10 per weekday)
    assert r["s_total"] == 7 * (10 * 9) // 2
    assert r["z_stat"] > 3


def test_siegel_recovers_the_planted_slope(spark, seasonal_trend_dir):
    from de_project_airflow_etl_spark.registry import all_queries
    r = (all_queries()["siegel_repeated_medians_trend"]
         .fn(spark, seasonal_trend_dir).collect()[0])
    # 6/7 of days carry no boost; each unboosted day's median
    # pairwise slope is exactly the planted 200 cents/day, and the
    # median of per-day medians is therefore exact
    assert r["slope_cents_per_day"] == pytest.approx(200.0, abs=1e-9)


def test_holt_winters_learns_the_planted_weekly_pattern(
        spark, seasonal_trend_dir):
    rows = sorted(Q["holt_winters_additive_weekly"]
                  .fn(spark, seasonal_trend_dir).collect(),
                  key=lambda r: r["day"])
    # after the halving recurrences converge, one-step forecasts land
    # within a few cents of actuals EVEN ON the boosted weekday (the
    # seasonal slot absorbs it; a non-seasonal smoother would miss by
    # ~the 5000-cent boost)
    tail = rows[-14:]
    for r in tail:
        assert abs(r["forecast_c"] - r["cents"]) <= 300, (
            r["day"], r["forecast_c"], r["cents"])
