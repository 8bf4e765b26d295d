"""End-to-end corpus-curation pipeline: the operators composed the way
a training-data run uses them — quality gate -> normalization -> exact
dedup -> mixture sampling -> packing -> partitioned shard write — with
the output re-read from disk and checked against the per-stage
operators. This is the integration surface: each stage is individually
oracle-verified; here we prove the COMPOSITION is lossless, ordered,
and layout-correct (the properties a downstream training job relies
on).

Scale shape of the composition: stages 1-3 are stateless maps + one
hash-agg; sampling is a broadcast-threshold filter; packing is one
window per shard key; the write partitions by (lang, shard) so a
trainer reads one directory per data-parallel rank. No stage shuffles
the corpus more than once, and nothing collects to the driver.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from de_project_airflow_etl_spark.operators.curation import (
    mixture_weighted_sample,
)
from de_project_airflow_etl_spark.operators.quality import (
    blocklist_plan, repetition_stats_plan,
)
from de_project_airflow_etl_spark.tables import load

N_SHARDS = 4


def _curated(spark, sf_dir):
    """quality gate -> collapse -> exact dedup -> mixture sample."""
    docs = load(spark, sf_dir, "documents")
    keep_rep = repetition_stats_plan(docs).filter("keep").select("doc_id")
    keep_block = blocklist_plan(docs).filter("keep").select("doc_id")
    gated = docs.join(keep_rep, "doc_id").join(keep_block, "doc_id")
    cleaned = gated.select(
        "doc_id", "lang", "source",
        F.expr("concat_ws(' ', filter(split(text, ' '), "
               "(x, i) -> i = 0 OR NOT (x <=> element_at("
               "split(text, ' '), i))))").alias("text"))
    # exact dedup on the CLEANED text (collapse first, then hash)
    deduped = (cleaned
               .withColumn("content_hash",
                           F.md5(F.col("text").cast("binary")))
               .withColumn("rn", F.row_number().over(
                   Window.partitionBy("content_hash").orderBy("doc_id")))
               .filter("rn = 1").drop("rn", "content_hash"))
    sampled_ids = mixture_weighted_sample(spark, sf_dir).select("doc_id")
    return deduped.join(sampled_ids, "doc_id")


def test_curation_pipeline_composes_and_writes_shards(spark, sf_dir,
                                                      tmp_path):
    out = str(tmp_path / "curated")
    curated = _curated(spark, sf_dir).withColumn(
        "shard", (F.crc32(F.col("doc_id").cast("string"))
                  % N_SHARDS).cast("int"))
    (curated.repartition("lang", "shard")
            .write.partitionBy("lang", "shard")
            .mode("overwrite").parquet(out))

    back = spark.read.parquet(out)
    # 1. lossless: re-read rows == computed rows (ids and text)
    a = sorted((r["doc_id"], r["text"]) for r in curated.collect())
    b = sorted((r["doc_id"], r["text"]) for r in back.collect())
    assert a == b and a
    # 2. stage containment: curated ids passed every gate
    docs = load(spark, sf_dir, "documents")
    rep_keep = {r["doc_id"] for r in
                repetition_stats_plan(docs).filter("keep").collect()}
    blk_keep = {r["doc_id"] for r in
                blocklist_plan(docs).filter("keep").collect()}
    mix_keep = {r["doc_id"] for r in
                mixture_weighted_sample(spark, sf_dir).collect()}
    ids = {i for i, _ in a}
    assert ids <= rep_keep & blk_keep & mix_keep
    # 3. cleaned text is run-free and dedup kept one doc per cleaned text
    texts = [t for _, t in a]
    for t in texts:
        toks = t.split(" ")
        assert all(x != y for x, y in zip(toks, toks[1:]))
    assert len(set(texts)) == len(texts)
    # 4. layout: one directory per (lang, shard), partition pruning works
    pruned = back.filter((F.col("lang") == "en") & (F.col("shard") == 0))
    assert 0 < pruned.count() < len(a)


def test_curation_pipeline_is_rerun_stable(spark, sf_dir, tmp_path):
    """Determinism end-to-end: two independent runs of the composed
    pipeline produce identical shard assignments and bytes-identical
    text — the re-run safety a backfill depends on."""
    rows = lambda: sorted(  # noqa: E731
        (r["doc_id"], r["lang"], r["text"]) for r in
        _curated(spark, sf_dir).collect())
    assert rows() == rows()


# ------------------------------------------- exact-k sampler at 1M

def test_reservoir_sample_exact_k_at_1m_rows(spark, tmp_path):
    """1M documents across 5 sources: the sampler must return EXACTLY
    k=20 rows per source, and exactly the 20 lowest-md5 doc_ids of
    each source (computed independently in Python) — the per-group
    heap the WindowGroupLimit plan maintains, verified at volume."""
    import hashlib

    docs = spark.range(1_000_000).selectExpr(
        "id AS doc_id", "'x' AS text", "'en' AS lang",
        "concat('s', pmod(id, 5)) AS source", "1 AS n_chars")
    out = str(tmp_path / "documents.parquet")
    docs.write.mode("overwrite").parquet(out)

    from de_project_airflow_etl_spark.operators.curation import (
        reservoir_sample_per_group,
    )
    got = reservoir_sample_per_group(spark, str(tmp_path)).collect()
    by_source = {}
    for r in got:
        by_source.setdefault(r["source"], []).append(
            (r["sample_rank"], r["doc_id"]))
    assert set(by_source) == {f"s{i}" for i in range(5)}
    assert all(len(v) == 20 for v in by_source.values())

    # independent expectation: per source, the 20 ids with the
    # smallest (md5(str(id)), id) key
    want = {}
    for i in range(1_000_000):
        s = f"s{i % 5}"
        want.setdefault(s, []).append(
            (hashlib.md5(str(i).encode()).hexdigest(), i))
    for s, pairs in want.items():
        expect = [i for _, i in sorted(pairs)[:20]]
        gotten = [d for _, d in sorted(by_source[s])]
        assert gotten == expect, s
