"""Planted-ground-truth semantics for the exact-substring span dedup
and the temperature-resampled language mixture: tiny hand-built corpora
where the right answer is enumerable by hand, plus a 100k-doc scale
case on the shared planted corpus from test_dedup_scale."""

from __future__ import annotations

import math

from de_project_airflow_etl_spark.operators.curation import (
    TEMP_BUDGET, TEMP_SCALE, temperature_sampled_language_mix,
)
from de_project_airflow_etl_spark.operators.dedup import (
    SPAN_W, exact_substring_dup_spans,
)


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string")
    (df.selectExpr("doc_id", "text", "lang", "source",
                   "length(text) AS n_chars")
       .write.mode("overwrite")
       .parquet(str(tmp_path / "documents.parquet")))
    return str(tmp_path)


def test_span_counts_on_planted_shared_window(spark, tmp_path):
    """A and B share exactly one 8-token window (A's prefix == B's
    suffix); C is all-unique. 10-token docs have 3 windows each."""
    shared = " ".join(f"w{i}" for i in range(SPAN_W))
    rows = [
        (0, shared + " a1 a2", "en", "s"),
        (1, "b1 b2 " + shared, "en", "s"),
        (2, " ".join(f"c{i}" for i in range(10)), "en", "s"),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    got = {r["doc_id"]: (r["n_windows"], r["n_dup_windows"])
           for r in exact_substring_dup_spans(spark, sf).collect()}
    assert got == {0: (3, 1), 1: (3, 1), 2: (3, 0)}


def test_span_scale_planted_duplicates(spark, tmp_path):
    """On the 100k planted corpus (every 1000th doc an exact copy of
    its predecessor, 20 tokens each), exactly the 198 docs in planted
    pairs have duplicated windows — and ALL 13 of their windows are
    duplicated. The 50-token vocab makes an accidental cross-doc
    8-gram collision essentially impossible (50^-8 per pair)."""
    from tests.test_dedup_scale import N_DOCS, PLANT_EVERY, VOCAB

    docs = spark.range(N_DOCS).selectExpr(
        "id AS doc_id",
        f"CASE WHEN id % {PLANT_EVERY} = 0 AND id > 0 "
        f"THEN id - 1 ELSE id END AS seed",
    ).selectExpr(
        "doc_id",
        f"concat_ws(' ', transform(sequence(0, 19), j -> "
        f"element_at(split('{VOCAB}', ' '), "
        f"1 + pmod(hash(seed * 31 + j), 50)))) AS text",
        "'en' AS lang", "'synth' AS source",
    ).selectExpr("doc_id", "text", "lang", "source",
                 "length(text) AS n_chars")
    docs.write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet"))

    res = exact_substring_dup_spans(spark, str(tmp_path))
    n_dup_docs = res.filter("n_dup_windows > 0")
    rows = n_dup_docs.collect()
    planted_ids = set()
    for i in range(PLANT_EVERY, N_DOCS, PLANT_EVERY):
        planted_ids |= {i - 1, i}
    assert {r["doc_id"] for r in rows} == planted_ids
    per_doc_windows = 20 - SPAN_W + 1
    assert all(r["n_windows"] == per_doc_windows
               and r["n_dup_windows"] == per_doc_windows for r in rows)
    assert res.count() == N_DOCS


def test_temperature_mix_targets_and_flattening(spark, sf_dir):
    """Per-language draw counts equal the integer-exact targets, and
    alpha=0.5 flattening holds: the sampling RATE (target/n) strictly
    favors lower-resource languages."""
    counts = {r["lang"]: r["n"] for r in
              spark.read.parquet(f"{sf_dir}/documents.parquet")
                   .groupBy("lang").agg({"*": "count"})
                   .withColumnRenamed("count(1)", "n").collect()}
    wgt = {l: math.floor(math.sqrt(n * TEMP_SCALE))
           for l, n in counts.items()}
    tw = sum(wgt.values())
    target = {l: (TEMP_BUDGET * w) // tw for l, w in wgt.items()}

    got = {r["lang"]: r["n"] for r in
           temperature_sampled_language_mix(spark, sf_dir)
           .groupBy("lang").agg({"*": "count"})
           .withColumnRenamed("count(1)", "n").collect()}
    assert got == {l: t for l, t in target.items() if t > 0}

    rates = sorted((counts[l], target[l] / counts[l]) for l in counts)
    for (n_lo, r_lo), (n_hi, r_hi) in zip(rates, rates[1:]):
        if n_lo < n_hi:
            assert r_lo >= r_hi, rates


def test_temperature_mix_scale_1m_rows(spark, tmp_path):
    """1M docs across 5 languages with a 100:1 resource imbalance:
    per-language draw counts must equal the integer-exact targets
    (computed independently in Python), and the alpha=0.5 flattening
    must upweight the rarest language's sampling rate by ~10x the
    dominant language's (sqrt of the 100x ratio). Exercises the
    WindowGroupLimit rank path at 200x the bench corpus."""
    sizes = {"en": 500_000, "de": 250_000, "fr": 200_000,
             "es": 45_000, "zh": 5_000}
    offsets, acc = {}, 0
    for lang, n in sizes.items():
        offsets[lang] = acc
        acc += n
    cases = " ".join(
        f"WHEN id < {offsets[lang] + n} THEN '{lang}'"
        for lang, n in sizes.items())
    docs = spark.range(1_000_000).selectExpr(
        "id AS doc_id",
        f"CASE {cases} END AS lang",
        "'t' AS text", "'synth' AS source", "1 AS n_chars")
    docs.write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet"))

    got = {r["lang"]: r["n"] for r in
           temperature_sampled_language_mix(spark, str(tmp_path))
           .groupBy("lang").agg({"*": "count"})
           .withColumnRenamed("count(1)", "n").collect()}
    wgt = {l: math.floor(math.sqrt(n * TEMP_SCALE))
           for l, n in sizes.items()}
    tw = sum(wgt.values())
    target = {l: (TEMP_BUDGET * w) // tw for l, w in wgt.items()}
    assert got == {l: t for l, t in target.items() if t > 0}
    rate = {l: target[l] / sizes[l] for l in sizes}
    assert rate["zh"] > 9 * rate["en"]
