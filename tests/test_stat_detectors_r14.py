"""Planted-ground-truth stress tests for the round-13b/14 staged
operators: synthetic tables whose construction forces a KNOWN exact
answer (perfectly separable thresholds, top-decile-only response,
single-interval conversion, identical raters, a missing calendar day,
identical embedding directions, a planted shared 5-gram)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from de_project_airflow_etl_spark.registry import all_queries

REG = all_queries()

_BASE = datetime(2024, 1, 1)


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
    """rows: (doc_id, text, source)"""
    data = [(i, t, "en", s, len(t)) for i, t, s in rows]
    (spark.createDataFrame(
        data, "doc_id long, text string, lang string, source string,"
              " n_chars long")
     .write.mode("overwrite").parquet(f"{path}/documents.parquet"))


def _write_embeddings(spark, path, rows):
    """rows: (vec_id, embedding list[float], label)"""
    (spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
     .write.mode("overwrite").parquet(f"{path}/embeddings.parquet"))


# ------------------------------------------------- calendar gap fill


def test_calendar_spine_flags_the_planted_missing_day(
        spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("gapday"))
    # days 0..6 except day 3 — the spine must reinsert it as a gap
    rows = [(d + 1, d, 0, 1, "purchase", 1000)
            for d in range(7) if d != 3]
    _write_events(spark, tmp, rows)
    out = sorted(REG["calendar_spine_gap_fill"].fn(
        spark, tmp).collect(), key=lambda r: r["day"])
    assert len(out) == 7
    gap = [r for r in out if r["is_gap"] == 1]
    assert [r["day"] for r in gap] == ["2024-01-04"]
    assert gap[0]["n_events"] == 0 and gap[0]["purchase_cents"] == 0


# ---------------------------------------------------------- youden


def test_youden_finds_the_planted_separable_threshold(
        spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("youden"))
    rows = [(k + 1, 0, k, k + 1, "purchase", 5000 + k)
            for k in range(20)]
    rows += [(k + 100, 1, k, k + 100, "click", 1000 + k)
             for k in range(30)]
    _write_events(spark, tmp, rows)
    r = REG["youden_j_optimal_threshold"].fn(spark, tmp).collect()[0]
    # perfectly separable: every threshold in (1029, 5000] achieves
    # J = 1; the exact-tie rule picks the LOWEST such threshold, which
    # is the smallest positive score
    assert r["j_stat"] == 1.0
    assert r["sensitivity"] == 1.0 and r["specificity"] == 1.0
    assert r["threshold_cents"] == 5000


def test_decile_lift_concentrates_on_planted_top_decile(
        spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("lift"))
    # 100 events: the 10 highest-value are the only purchases
    rows = [(k + 1, 0, k, k + 1, "purchase", 100000 + k)
            for k in range(10)]
    rows += [(k + 50, 1, k, k + 50, "click", 1000 + k)
             for k in range(90)]
    _write_events(spark, tmp, rows)
    out = sorted(REG["decile_lift_table"].fn(spark, tmp).collect(),
                 key=lambda r: r["decile"])
    assert out[0]["n_events"] == 10 and out[0]["n_purchases"] == 10
    assert out[0]["lift"] == pytest.approx(10.0)
    assert out[0]["cum_gain"] == pytest.approx(1.0)
    assert all(r["n_purchases"] == 0 for r in out[1:])


# --------------------------------------------------------- actuarial


def test_actuarial_single_interval_conversion(spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("life1"))
    # every user converts on their first day: one interval, q = 1,
    # survival 0 (2d/(2n - 0) with d = n)
    rows = []
    for uid in range(1, 11):
        rows.append((uid * 2 - 1, 0, uid, uid, "signup", 1000))
        rows.append((uid * 2, 0, uid + 100, uid, "purchase", 1000))
    _write_events(spark, tmp, rows)
    out = REG["actuarial_life_table"].fn(spark, tmp).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_enter"] == 10 and r["n_events"] == 10
    assert r["n_censored"] == 0
    assert r["cond_q"] == 1.0 and r["surv_s"] == 0.0


# ---------------------------------------------------------- cronbach


def test_cronbach_alpha_exactly_one_for_identical_raters(
        spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("alpha1"))
    # make all three raters agree on every doc: docs either satisfy
    # ALL rules (contain 'data', >= 200 chars, contain '.') or NONE
    good = "data " * 50 + "."           # data yes, long, has '.'
    bad = "x y z"                        # none of the three
    docs = [(i, good if i % 2 else bad, "web") for i in range(40)]
    _write_docs(spark, tmp, docs)
    r = REG["cronbachs_alpha_quality_rules"].fn(
        spark, tmp).collect()[0]
    # x1 = x2 = x3 per doc -> var_total = 9 var_item, ratio = 1/3,
    # alpha = 1.5 * (1 - 1/3) = 1 exactly (integer arithmetic)
    assert r["item_to_total_var_ratio"] == pytest.approx(1 / 3)
    assert r["cronbach_alpha"] == 1.0


# ----------------------------------------------------- vocab coverage


def test_vocab_coverage_on_planted_skew(spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("vocab"))
    # 'the' is 90 of 100 tokens; ten distinct rare words fill the rest
    text = " ".join(["the"] * 90 + [f"w{i}" for i in range(10)])
    _write_docs(spark, tmp, [(1, text, "web")])
    r = REG["vocab_coverage_curve"].fn(spark, tmp).collect()[0]
    assert r["vocab_size"] == 11 and r["n_tokens"] == 100
    assert r["k50"] == 1 and r["k90"] == 1
    assert r["k95"] == 6    # 90 + 5 rare words = 95
    assert r["k99"] == 10   # 90 + 9 rare words = 99


# --------------------------------------------------- cross-source


def test_cross_source_overlap_counts_the_planted_shared_gram(
        spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("xsource"))
    shared = "alpha beta gamma delta epsilon"          # ONE 5-gram
    docs = [(1, shared, "a"),
            (2, shared + " zeta", "b"),               # shares gram 1
            (3, "one two three four five six", "b")]  # b-only grams
    _write_docs(spark, tmp, docs)
    rows = REG["cross_source_ngram_overlap"].fn(spark, tmp).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["source_a"], r["source_b"]) == ("a", "b")
    assert r["n_shared"] == 1 and r["n_grams_a"] == 1
    # source b: doc2 has 2 grams, doc3 has 2 grams, all distinct
    assert r["n_grams_b"] == 4
    assert r["containment"] == 1.0   # 1 / min(1, 4)


# ------------------------------------------------------- isotropy


def test_isotropy_one_for_identical_directions(spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("iso1"))
    v = [3.0, 4.0, 0.0, 0.0]
    _write_embeddings(spark, tmp,
                      [(i, [x * (i + 1) for x in v], 0)
                       for i in range(20)])
    r = REG["embedding_isotropy_panel"].fn(spark, tmp).collect()[0]
    # all vectors share one direction: every pairwise cosine is 1
    assert r["mean_pairwise_cosine"] == pytest.approx(1.0, abs=1e-6)


def test_isotropy_zero_for_orthogonal_balanced_set(
        spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("iso0"))
    # equal counts along +x, -x, +y, -y: pairwise cosines cancel
    dirs = [[1.0, 0.0], [-1.0, 0.0], [0.0, 1.0], [0.0, -1.0]]
    _write_embeddings(spark, tmp,
                      [(i, dirs[i % 4], 0) for i in range(40)])
    r = REG["embedding_isotropy_panel"].fn(spark, tmp).collect()[0]
    # sum vector is exactly zero -> mean pairwise cosine = -n/(n(n-1))
    assert r["mean_pairwise_cosine"] == pytest.approx(
        -1.0 / 39, abs=1e-9)
