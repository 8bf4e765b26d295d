"""Planted-ground-truth stress tests for the round-9c/10c statistics:
synthetic event streams whose construction FORCES a known exact value
(zero statistic under planted symmetry/independence, unit association
under planted monotonicity, exact winsorized means, exact funnel
counts) — the planted-pair style of tests/test_dedup_scale.py and
tests/test_drift_detectors.py applied to the inference operators."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from de_project_airflow_etl_spark.registry import all_queries
from de_project_airflow_etl_spark.staged import STAGED

Q = {**all_queries(), **STAGED}

_BASE = datetime(2024, 1, 1)  # a Monday


def _write(spark, path, rows):
    """rows: (event_id, day_offset, sec_offset, user_id, type, cents)"""
    data = [(eid, _BASE + timedelta(days=d, seconds=s), uid, et,
             c / 100.0, "{}")
            for eid, d, s, uid, et, c in rows]
    (spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long,"
              " event_type string, value double, props string")
     .write.mode("overwrite").parquet(f"{path}/events.parquet"))


# ---------------------------------------------------------------- funnel


def test_funnel_counts_exactly_match_construction(spark,
                                                  tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("funnel"))
    rows = []
    eid = 0

    def ev(d, uid, et):
        nonlocal eid
        eid += 1
        rows.append((eid, d, eid, uid, et, 1000))

    # u1: full ordered funnel
    ev(0, 1, "signup"); ev(1, 1, "view"); ev(2, 1, "click")
    ev(3, 1, "purchase")
    # u2: signup then purchase but never view/click: stops at step 1
    ev(0, 2, "signup"); ev(1, 2, "purchase")
    # u3: view BEFORE signup: first-view precedes first-signup,
    # so step 2 is never reached
    ev(0, 3, "view"); ev(1, 3, "signup"); ev(2, 3, "click")
    ev(3, 3, "purchase")
    # u4: no signup at all
    ev(0, 4, "click"); ev(1, 4, "purchase")
    _write(spark, tmp, rows)
    r = Q["funnel_conversion_steps"].fn(spark, tmp).collect()[0]
    assert r["n_users"] == 4
    assert r["n_signup"] == 3
    assert r["n_view_after"] == 1
    assert r["n_click_after"] == 1
    assert r["n_purchase_after"] == 1
    assert r["conv_view"] == pytest.approx(1 / 3)


def test_funnel_same_microsecond_breaks_tie_by_event_id(
        spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("funnel_tie"))
    # signup and view in the SAME microsecond: the packed key falls
    # back to event_id order, so view (higher id) is strictly after
    _write(spark, tmp, [(1, 0, 0, 1, "signup", 1000),
                        (2, 0, 0, 1, "view", 1000)])
    r = Q["funnel_conversion_steps"].fn(spark, tmp).collect()[0]
    assert r["n_signup"] == 1 and r["n_view_after"] == 1


# ---------------------------------------------------------------- bowker


def test_bowker_zero_under_planted_symmetry(spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("bowker_sym"))
    rows = []
    eid = 0
    # every user walks click -> view -> click: one click->view and
    # one view->click transition each — perfectly symmetric
    for uid in range(1, 21):
        for k, et in enumerate(("click", "view", "click")):
            eid += 1
            rows.append((eid, 0, uid * 10 + k, uid, et, 1000))
    _write(spark, tmp, rows)
    r = Q["bowker_symmetry_event_transitions"].fn(
        spark, tmp).collect()[0]
    assert r["n_transitions"] == 40
    assert r["bowker_stat"] == 0.0  # exact integer symmetry


def test_bowker_equals_n_under_one_directional_flow(
        spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("bowker_dir"))
    rows = []
    eid = 0
    # every user walks click -> view exactly once: all 15 transitions
    # one-directional, so B = (15-0)^2/15 = 15
    for uid in range(1, 16):
        for k, et in enumerate(("click", "view")):
            eid += 1
            rows.append((eid, 0, uid * 10 + k, uid, et, 1000))
    _write(spark, tmp, rows)
    r = Q["bowker_symmetry_event_transitions"].fn(
        spark, tmp).collect()[0]
    assert r["bowker_stat"] == 15.0


# ------------------------------------------------------ cochran-armitage


def test_cochran_armitage_zero_under_planted_flat_rate(
        spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("ca_flat"))
    rows = []
    eid = 0
    # days 0-6 cover all weekdays; every day 10 events, 2 purchases:
    # identical rate at every score -> T_num is exactly zero
    for d in range(7):
        for k in range(10):
            eid += 1
            rows.append((eid, d, k, 1 + eid,
                         "purchase" if k < 2 else "click", 1000))
    _write(spark, tmp, rows)
    r = Q["cochran_armitage_dow_trend"].fn(spark, tmp).collect()[0]
    assert r["t_num"] == 0.0
    assert r["z_stat"] == 0.0


# ------------------------------------------------------------- ordinal


def test_ordinal_association_perfect_monotone_is_one(
        spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("ordinal"))
    # Mon..Thu (dow 1..4) carry strictly increasing value bands
    # (<10, <50, <200, >=200 dollars): zero discordant, zero x-only /
    # y-only ties -> gamma = somers = tau_b = 1 exactly
    band_cents = [500, 2000, 10000, 50000]
    rows = [(d * 10 + k, d, k, 1 + d * 10 + k, "click", band_cents[d])
            for d in range(4) for k in range(5)]
    _write(spark, tmp, rows)
    r = Q["ordinal_association_dow_band"].fn(spark, tmp).collect()[0]
    assert r["gamma"] == 1.0
    assert r["somers_d_yx"] == 1.0
    assert r["somers_d_xy"] == 1.0
    assert r["tau_b"] == 1.0


# ------------------------------------------------------------------ cmh


def test_cmh_zero_under_planted_conditional_independence(
        spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("cmh_ind"))
    rows = []
    eid = 0

    def block(day, n, n_purch):
        nonlocal eid
        for k in range(n):
            eid += 1
            rows.append((eid, day, k, eid,
                         "purchase" if k < n_purch else "click", 1000))

    # stratum 0 (Jan 1-7): purchase rate 1/2 on weekend AND weekday
    block(5, 4, 2)    # Sat Jan 6: 4 weekend events, 2 purchases
    block(2, 8, 4)    # Wed Jan 3: 8 weekday events, 4 purchases
    # stratum 1 (Jan 8-14): rate 1/4 on both arms
    block(12, 4, 1)   # Sat Jan 13
    block(9, 8, 2)    # Wed Jan 10
    _write(spark, tmp, rows)
    r = Q["cmh_weekend_purchase_weeks"].fn(spark, tmp).collect()[0]
    assert r["cmh_stat"] == 0.0   # a_k == E_k exactly per stratum
    assert r["or_mh"] == 1.0      # ad/n == bc/n exactly per stratum


# ---------------------------------------------------------- time series


def test_ljung_box_alternating_series_has_negative_acf1(
        spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("lb_alt"))
    rows = [(d + 1, d, 0, 1, "click", 30000 if d % 2 else 10000)
            for d in range(30)]
    _write(spark, tmp, rows)
    r = Q["ljung_box_daily_revenue"].fn(spark, tmp).collect()[0]
    assert r["acf_1"] < -0.9
    assert r["acf_2"] > 0.8
    assert r["lb_q_stat"] > 30.0


def test_ccf_detects_planted_one_day_lead(spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("ccf_lead"))
    # revenue_t = 1000 * count_{t-1} exactly: count cycle in divisors
    # of 1000 so per-event cents stay integers
    counts = [2, 4, 5, 8, 10, 4, 2, 5, 10, 8] * 3
    rows = []
    eid = 0
    for d in range(1, 30):
        n_prev, n = counts[d - 1], counts[d]
        cents = 1000 * n_prev // n
        for k in range(n):
            eid += 1
            rows.append((eid, d, k, 1 + k, "click", cents))
    _write(spark, tmp, rows)
    r = Q["cross_correlation_revenue_count"].fn(
        spark, tmp).collect()[0]
    # x_t tracks y_{t-1}: the +1 lag dominates every other lag
    assert r["ccf_1"] > 0.9
    for c in ("ccf_m3", "ccf_m2", "ccf_m1", "ccf_0", "ccf_2", "ccf_3"):
        assert r["ccf_1"] > r[c] + 0.3


def test_smape_exactly_zero_on_planted_weekly_period(
        spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("smape_per"))
    week = [10000, 20000, 15000, 30000, 25000, 40000, 12000]
    rows = [(d + 1, d, 0, 1, "click", week[d % 7]) for d in range(28)]
    _write(spark, tmp, rows)
    r = Q["smape_daily_forecasts"].fn(spark, tmp).collect()[0]
    assert r["smape"] == 0.0
    assert r["mape"] == 0.0
    assert r["rmse_cents"] == 0.0


def test_seasonal_strength_high_on_planted_weekly_pattern(
        spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("season"))
    week = [10000, 20000, 15000, 30000, 25000, 40000, 12000]
    rows = [(d + 1, d, 0, 1, "click", week[d % 7] + 10 * d)
            for d in range(42)]
    _write(spark, tmp, rows)
    r = Q["seasonal_strength_weekly"].fn(spark, tmp).collect()[0]
    assert r["seasonal_strength"] > 0.95


def test_grubbs_finds_the_planted_spike_day(spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("grubbs"))
    cents = [10000] * 30
    cents[17] = 90000
    rows = [(d + 1, d, 0, 1, "click", cents[d]) for d in range(30)]
    _write(spark, tmp, rows)
    r = Q["grubbs_max_deviation_daily"].fn(spark, tmp).collect()[0]
    assert r["peak_day"] == "2024-01-18"
    assert r["g_stat"] > 5.0


# ----------------------------------------------------- value statistics


def test_winsorized_mean_ignores_planted_tail_spikes(
        spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("winsor"))
    rows = [(k + 1, 0, k, k + 1, "click", 1000) for k in range(100)]
    rows += [(101, 1, 0, 101, "click", 1000000),
             (102, 1, 1, 102, "click", 1000000)]
    _write(spark, tmp, rows)
    r = Q["winsorized_mean_value"].fn(spark, tmp).collect()[0]
    assert r["p95_cents"] == 1000   # 97th of 102 order stat
    assert r["winsorized_mean"] == 10.0   # spikes clamped to 10.00
    assert r["raw_mean"] > 200.0


def test_benford_mad_exact_under_all_ones(spark, tmp_path_factory):
    import math
    tmp = str(tmp_path_factory.mktemp("benford1"))
    rows = [(k + 1, 0, k, k + 1, "click", 1999) for k in range(50)]
    _write(spark, tmp, rows)
    r = Q["benford_first_digit_value"].fn(spark, tmp).collect()[0]
    p1 = math.log10(2.0)
    assert r["mad_stat"] == pytest.approx(2 * (1 - p1) / 9, abs=1e-12)
    assert r["chi2_stat"] > 10.0


def test_edf_panel_zero_on_identical_multisets_one_on_disjoint(
        spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("edf"))
    rows = []
    eid = 0
    # weekend (Sat Jan 6) and weekday (Wed Jan 3) get the IDENTICAL
    # value multiset -> every EDF distance is exactly zero
    for day in (5, 2):
        for k, c in enumerate([1000, 2000, 2000, 5000, 9000]):
            eid += 1
            rows.append((eid, day, k, eid, "click", c))
    _write(spark, tmp, rows)
    r = Q["edf_two_sample_panel_weekend"].fn(spark, tmp).collect()[0]
    assert r["d_plus"] == 0.0 and r["d_minus"] == 0.0
    assert r["ks_d"] == 0.0 and r["kuiper_v"] == 0.0
    assert r["ad_stat"] == 0.0

    tmp2 = str(tmp_path_factory.mktemp("edf_disjoint"))
    rows = []
    eid = 0
    for k in range(5):
        eid += 1
        rows.append((eid, 5, k, eid, "click", 1000 + k))   # weekend low
    for k in range(5):
        eid += 1
        rows.append((eid, 2, k, eid, "click", 90000 + k))  # weekday high
    _write(spark, tmp2, rows)
    r = Q["edf_two_sample_panel_weekend"].fn(
        spark, tmp2).collect()[0]
    assert r["ks_d"] == 1.0   # disjoint supports separate completely


def test_partial_corr_one_under_planted_within_dow_linearity(
        spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("pcorr"))
    rows = []
    eid = 0
    # 28 days, 4 per weekday; daily total = 100*count + 1000*dow
    # exactly (per-event cents integer by construction): within every
    # dow, revenue is an exact linear function of count
    count_cycle = [1, 2, 4, 5]
    for d in range(28):
        dow = (d + 1) % 7  # Jan 1 2024 is Monday -> dow 1 in oracle
        n = count_cycle[d // 7]
        cents = (100 * n + 1000 * dow) // n
        assert cents * n == 100 * n + 1000 * dow
        for k in range(n):
            eid += 1
            rows.append((eid, d, k, eid, "click", cents))
    _write(spark, tmp, rows)
    r = Q["partial_corr_revenue_count_dow"].fn(
        spark, tmp).collect()[0]
    assert r["partial_corr"] == pytest.approx(1.0, abs=1e-12)
