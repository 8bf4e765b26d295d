"""Invariant / property tests for the promoted round-7 evaluation
bank (queries/evaluation.py) — the
mathematical guarantees each statistic must satisfy regardless of
data, plus a direct cross-engine validation of the deterministic
double-reduction idiom the bank's promotion depends on.

Runs at sf0.001 (the invariants are scale-free; the oracle equality
itself is covered by the registry-wide tests/test_correctness.py)."""

from __future__ import annotations

import hashlib
import struct

import pandas as pd

from de_project_airflow_etl_spark.registry import all_queries

R7B_BANK = {n: q for n, q in all_queries().items()
            if q.fn.__module__
            == "de_project_airflow_etl_spark.queries.evaluation"}

SF_SMALL = "/root/testdata/sf0.001"


def _one_row(spark, name, sf=SF_SMALL):
    rows = R7B_BANK[name].fn(spark, sf).collect()
    assert len(rows) == 1, f"{name}: expected one row"
    return rows[0]


# ------------------------------ the fold idiom, validated directly


def test_fold_idiom_is_bit_identical_across_engines(spark, duck):
    """aggregate(array_sort(xs), 0.0D, +) on Spark must equal
    list_reduce(list_prepend(0.0, list_sort(xs)), +) on DuckDB for
    adversarial double arrays (mixed magnitudes and signs, where
    association order changes the result) — the exact contract the
    ANOVA / Cramér's V / cosine reductions stand on. Arrays are
    md5-derived so the test is deterministic."""
    def doubles(i: int, n: int) -> list[float]:
        out = []
        for j in range(n):
            h = hashlib.md5(f"fold|{i}|{j}".encode()).digest()
            mant = struct.unpack("<Q", h[:8])[0] / float(1 << 64)
            mag = 10.0 ** ((j % 13) - 6)
            sign = -1.0 if h[8] % 2 else 1.0
            out.append(sign * mant * mag)
        return out

    rows = [(i, doubles(i, 3 + i % 40)) for i in range(200)]
    pdf = pd.DataFrame(rows, columns=["id", "xs"])
    sdf = spark.createDataFrame(pdf)
    got_spark = {
        r["id"]: r["s"]
        for r in sdf.selectExpr(
            "id",
            "aggregate(array_sort(xs), CAST(0.0 AS DOUBLE),"
            " (acc, v) -> acc + v) AS s").collect()}
    duck.register("fold_pdf", pdf)
    got_duck = {
        int(i): s
        for i, s in duck.execute(
            "SELECT id, list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
            " list_sort(xs)), (acc, v) -> acc + v) FROM fold_pdf"
        ).fetchall()}
    assert got_spark == got_duck  # bit-exact dict equality on floats


# --------------------------------------------- statistic invariants


def test_auc_is_a_probability(spark):
    r = _one_row(spark, "roc_auc_purchase_value")
    assert 0.0 <= r["auc"] <= 1.0
    assert r["n_pos"] > 0 and r["n_neg"] > 0


def test_anova_components_are_nonnegative(spark):
    r = _one_row(spark, "anova_event_type_value")
    assert r["ss_between"] >= 0.0
    assert r["ss_within"] >= 0.0
    assert r["f_stat"] >= 0.0
    assert r["df_between"] == r["k_groups"] - 1
    assert r["df_within"] == r["n_total"] - r["k_groups"]


def test_cramers_v_is_bounded(spark):
    r = _one_row(spark, "cramers_v_event_dow")
    assert r["chi2"] >= 0.0
    assert 0.0 <= r["cramers_v"] <= 1.0
    assert r["dof"] == (r["n_rows"] - 1) * (r["n_cols"] - 1)


def test_theta_sketch_is_exact_when_unsaturated(spark):
    """At sf0.001 every per-type user set (~15) is below k=64, so
    theta stays at the full hash space and the 'estimates' must equal
    the exact truths — the sketch's exactness-below-capacity
    guarantee, which also pins the estimator plumbing end to end."""
    r = _one_row(spark, "theta_sketch_user_overlap")
    assert r["true_click"] < r["k_cap"], "fixture outgrew the test"
    assert r["est_click"] == float(r["true_click"])
    assert r["est_purchase"] == float(r["true_purchase"])
    assert r["est_union"] == float(r["true_union"])
    assert r["est_inter"] == float(r["true_inter"])


def test_theta_sketch_respects_set_algebra(spark):
    """Union and intersection estimates share ONE common theta, so
    their retained-count ordering survives the division: inter <=
    union always; every estimate is nonnegative. (Bounds MIXING the
    per-set thetas with the common theta are deliberately not
    asserted — they do not hold universally for bottom-k sketches.)"""
    for sf in (SF_SMALL, "/root/testdata/sf0.01"):
        r = _one_row(spark, "theta_sketch_user_overlap", sf)
        assert 0.0 <= r["est_inter"] <= r["est_union"]
        assert r["est_click"] >= 0.0 and r["est_purchase"] >= 0.0
        assert r["true_inter"] <= min(r["true_click"],
                                      r["true_purchase"])
        assert r["true_union"] + r["true_inter"] == (
            r["true_click"] + r["true_purchase"])


def test_map_is_bounded_by_precision_sanity(spark):
    r = _one_row(spark, "map_retrieval_eval")
    assert 0.0 <= r["map_at_k"] <= 1.0
    assert 0.0 <= r["precision_at_k"] <= 1.0
    assert r["n_queries"] == 20


def test_wilson_interval_contains_the_point_estimate(spark):
    for row in R7B_BANK["wilson_ci_weekend_share"].fn(
            spark, SF_SMALL).collect():
        assert 0.0 <= row["ci_low"] <= row["p_hat"] <= row["ci_high"] \
            <= 1.0


def test_bollinger_bands_bracket_the_sma(spark):
    rows = R7B_BANK["bollinger_daily_revenue"].fn(spark, SF_SMALL).collect()
    assert rows, "no complete windows"
    for row in rows:
        assert row["lower_band"] <= row["sma"] <= row["upper_band"]
        assert row["sd"] >= 0.0


def test_drawdown_is_bounded(spark):
    r = _one_row(spark, "max_drawdown_daily_revenue")
    assert r["max_drawdown"] >= 0.0
    assert 0.0 <= r["max_drawdown_frac"] <= 1.0
    assert r["final_cum_revenue"] > 0.0


def test_kappa_and_mcnemar_are_bounded(spark):
    k = _one_row(spark, "cohens_kappa_quality_rules")
    assert -1.0 <= k["kappa"] <= 1.0
    assert 0.0 <= k["po"] <= 1.0 and 0.0 <= k["pe"] <= 1.0
    assert (k["n_both"] + k["n_only_a"] + k["n_only_b"]
            + k["n_neither"]) == k["n_docs"]
    m = _one_row(spark, "mcnemar_test_rules")
    assert m["mcnemar_chi2"] >= 0.0
    assert m["mcnemar_chi2_cc"] >= 0.0
    # same contingency table underneath
    assert m["n_only_a"] == k["n_only_a"]
    assert m["n_only_b"] == k["n_only_b"]


def test_tv_distance_is_a_bounded_metric(spark):
    for row in R7B_BANK["source_unigram_tv_distance"].fn(
            spark, SF_SMALL).collect():
        assert 0.0 <= row["tv_distance"] <= 1.0
        assert 0.0 < row["corpus_coverage"] <= 1.0


def test_attribution_conserves_purchase_value(spark):
    """U-shaped credits must sum to the attributed purchases' value,
    short only the middle-split integer-division remainders — bounded
    by one micro-cent per touch row."""
    from pyspark.sql import functions as F

    from de_project_airflow_etl_spark.tables import load
    rows = R7B_BANK["position_attribution_revenue"].fn(
        spark, SF_SMALL).collect()
    attributed = sum(r["attributed_revenue"] for r in rows)
    n_touches = sum(r["n_touches"] for r in rows)
    # total value of purchases that HAVE at least one touch: rebuild
    # the purchase-touch pairing the query documents
    e = load(spark, SF_SMALL, "events")
    p = (e.filter(F.col("event_type") == "purchase")
          .selectExpr("event_id AS pid", "user_id AS puid",
                      "ts AS pts",
                      "CAST(ROUND(value * 100) AS BIGINT) AS c"))
    with_touch = (p.join(
        e, (F.col("user_id") == F.col("puid"))
        & (F.col("ts") < F.col("pts"))
        & (F.col("ts") >= F.expr("pts - INTERVAL 7 DAY"))
        & (F.col("event_id") != F.col("pid")), "leftsemi"))
    total = with_touch.agg(F.sum("c")).collect()[0][0] / 100.0
    shortfall = total - attributed
    assert 0.0 <= shortfall <= n_touches * 1e-6 / 100 + 1e-9, (
        total, attributed, n_touches)


def test_mase_components_are_nonnegative(spark):
    r = _one_row(spark, "seasonal_naive_mase")
    assert r["mae_seasonal"] >= 0.0
    assert r["mae_naive1"] >= 0.0
    assert r["mase"] >= 0.0


def test_audio_chunks_tile_the_payload(spark):
    """Chunk grids must cover every payload byte exactly: per doc,
    chunk 0 starts at 0, starts advance by the hop, the last chunk
    reaches the end, and full chunks carry the window size."""
    from de_project_airflow_etl_spark.queries.evaluation import (
        CHUNK_BYTES, CHUNK_HOP)
    rows = R7B_BANK["multimodal_audio_chunk_windows"].fn(
        spark, SF_SMALL).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert by_doc
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_idx"])
        for i, c in enumerate(chunks):
            assert c["chunk_idx"] == i
            assert c["start_byte"] == i * CHUNK_HOP
            assert 1 <= c["n_bytes"] <= CHUNK_BYTES
        end = chunks[-1]["start_byte"] + chunks[-1]["n_bytes"]
        assert chunks[-1]["n_bytes"] < CHUNK_BYTES or \
            end >= chunks[-1]["start_byte"] + CHUNK_BYTES
        # every chunk except possibly the tail is either full-size or
        # clipped by the payload end reached within one hop
        for c in chunks[:-1]:
            assert c["n_bytes"] == CHUNK_BYTES or \
                c["start_byte"] + c["n_bytes"] == end


import pytest  # noqa: E402  (tier mark below)

# r11 test tiering: multi-minute sweep/scale/property module —
# excluded from the default (driver-budget) run; run with
# -m "slow or not slow" for the full signal (see pytest.ini).
pytestmark = pytest.mark.slow
