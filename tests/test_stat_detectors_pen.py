"""Planted-ground-truth invariants for the OLDER pen banks
(round9b/11b/12b, staged in round 7): constructions that force exact
zero/unit statistics — mirrored A/B arms null the log-rank test,
identical raters max out Fleiss' kappa, constant distributions zero
the inequality indices, and a planted uplift is recovered by DiD to
the cent. The md5-nibble arm assignment is honored by CHOOSING user
ids whose computed arm is known (arm = md5(str(uid))[0] < '8')."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from de_project_airflow_etl_spark.registry import all_queries
from de_project_airflow_etl_spark.staged import STAGED

Q = {**all_queries(), **STAGED}

_BASE = datetime(2024, 1, 1)
# verified against hashlib.md5: first hex nibble < '8' (treated arm)
_TREATED = [6, 9, 11, 17, 18, 19, 21, 23, 24, 26]
_CONTROL = [1, 2, 3, 4, 5, 7, 8, 10, 12, 13]


def _write_events(spark, path, rows):
    """rows: (event_id, day_offset, sec_offset, user_id, type, cents)"""
    data = [(eid, _BASE + timedelta(days=d, seconds=s), uid, et,
             c / 100.0, "{}")
            for eid, d, s, uid, et, c in rows]
    (spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long,"
              " event_type string, value double, props string")
     .write.mode("overwrite").parquet(f"{path}/events.parquet"))


def _write_docs(spark, path, rows):
    data = [(i, t, "en", "web", len(t)) for i, t in rows]
    (spark.createDataFrame(
        data, "doc_id long, text string, lang string, source string,"
              " n_chars long")
     .write.mode("overwrite").parquet(f"{path}/documents.parquet"))


def test_log_rank_zero_on_mirrored_arms(spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("lr0"))
    rows, eid = [], 0
    # identical lifetime multisets per arm: for each pattern, ONE
    # treated and ONE control user — so at every event time the
    # at-risk and death counts split exactly in half and o1 == e1
    patterns = [
        (0, 3),    # first event day 0, first purchase day 3
        (0, 7),
        (1, 10),
        (2, None),  # never purchases: censored at last day
        (0, None),
    ]
    for arm_users in (_TREATED, _CONTROL):
        for k, (d0, conv) in enumerate(patterns):
            uid = arm_users[k]
            eid += 1
            rows.append((eid, d0, 0, uid, "click", 1000))
            if conv is not None:
                eid += 1
                rows.append((eid, conv, 0, uid, "purchase", 1000))
            else:
                eid += 1
                rows.append((eid, 15, 0, uid, "click", 1000))
    _write_events(spark, tmp, rows)
    r = Q["log_rank_test_ab_arms"].fn(spark, tmp).collect()[0]
    assert r["n_arm_a"] == 5 and r["n_arm_b"] == 5
    assert r["o1"] == pytest.approx(r["e1"], abs=1e-12)
    assert r["z_stat"] == pytest.approx(0.0, abs=1e-12)
    assert r["chi2_stat"] == pytest.approx(0.0, abs=1e-12)


def test_did_recovers_planted_uplift_to_the_cent(
        spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("did"))
    rows, eid = [], 0
    # pre (day 5, before the 2024-01-16 cutoff): $10.00 everywhere;
    # post (day 20): control stays $10.00, treated averages $12.50
    # (alternating 12.40/12.60 so within-cell variance > 0 and the
    # standard error stays finite)
    for uid in _TREATED + _CONTROL:
        eid += 1
        rows.append((eid, 5, uid, uid, "purchase", 1000))
    for i, uid in enumerate(_TREATED):
        eid += 1
        rows.append((eid, 20, uid, uid, "purchase",
                     1240 if i % 2 else 1260))
    for uid in _CONTROL:
        eid += 1
        rows.append((eid, 20, uid, uid, "purchase", 1000))
    _write_events(spark, tmp, rows)
    r = Q["difference_in_differences_arms"].fn(
        spark, tmp).collect()[0]
    assert r["did_cents"] == pytest.approx(250.0, abs=1e-9)
    assert r["did_dollars"] == pytest.approx(2.5, abs=1e-11)
    assert r["se_cents"] > 0.0


def test_fleiss_kappa_one_for_unanimous_raters(spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("fk1"))
    good = "data " * 50 + "."   # satisfies all three rules
    bad = "x y z"                # satisfies none
    _write_docs(spark, tmp,
                [(i, good if i % 2 else bad) for i in range(30)])
    r = Q["fleiss_kappa_quality_rules"].fn(spark, tmp).collect()[0]
    assert r["fleiss_kappa"] == pytest.approx(1.0, abs=1e-12)


def test_hoover_zero_on_equal_daily_revenue(spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("hoover0"))
    rows = [(d + 1, d, 0, 1, "purchase", 10000) for d in range(20)]
    _write_events(spark, tmp, rows)
    r = Q["hoover_index_daily_revenue"].fn(spark, tmp).collect()[0]
    assert r["hoover_index"] == 0.0


def test_gini_mean_difference_zero_on_constant_values(
        spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("gmd0"))
    rows = [(k + 1, 0, k, k + 1, "click", 2500) for k in range(50)]
    _write_events(spark, tmp, rows)
    r = Q["gini_mean_difference_value"].fn(spark, tmp).collect()[0]
    assert r["gmd"] == 0.0
    assert r["gini"] == 0.0
    assert r["mean_value"] == pytest.approx(25.0)


def test_srm_zero_on_balanced_and_exact_on_planted_imbalance(
        spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("srm"))
    rows = [(k + 1, 0, k, uid, "click", 1000)
            for k, uid in enumerate(_TREATED + _CONTROL)]
    _write_events(spark, tmp, rows)
    r = Q["sample_ratio_mismatch_check"].fn(spark, tmp).collect()[0]
    assert {r["n_a"], r["n_b"]} == {10}
    assert r["chi2_stat"] == 0.0

    tmp2 = str(tmp_path_factory.mktemp("srm_skew"))
    skewed = _TREATED + _CONTROL[:5]     # 10 vs 5
    rows = [(k + 1, 0, k, uid, "click", 1000)
            for k, uid in enumerate(skewed)]
    _write_events(spark, tmp2, rows)
    r = Q["sample_ratio_mismatch_check"].fn(
        spark, tmp2).collect()[0]
    assert sorted([r["n_a"], r["n_b"]]) == [5, 10]
    assert r["chi2_stat"] == pytest.approx(25.0 / 15.0, abs=1e-12)


def test_littles_law_on_planted_fixed_duration_sessions(
        spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("ll"))
    rows, eid = [], 0
    # ten users, one session each of EXACTLY 600 s (well under the
    # 30-minute gap), staggered an hour apart
    for k in range(10):
        eid += 1
        rows.append((eid, 0, k * 3600, k + 1, "click", 1000))
        eid += 1
        rows.append((eid, 0, k * 3600 + 600, k + 1, "click", 1000))
    _write_events(spark, tmp, rows)
    r = Q["littles_law_sessions"].fn(spark, tmp).collect()[0]
    assert r["n_sessions"] == 10
    assert r["w_mean_s"] == pytest.approx(600.0, abs=1e-9)
    assert r["total_dur_us"] == 10 * 600 * 1_000_000
