"""Stage profile of the r11 fused corpus_release_manifest: time each
cumulative prefix of the funnel with a noop sink (guide §1.4), labeled
jobs, warm best-of-3. Each prefix is rebuilt fresh so checkpoints do
not leak between measurements.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from de_project_airflow_etl_spark.operators.dedup import (
    _lsh_verified, clear_pairs_cache,
)
from de_project_airflow_etl_spark.session import get_spark
from de_project_airflow_etl_spark.tables import load

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("r11-profile-manifest")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def build(stage: str):
    from de_project_airflow_etl_spark.operators.corpus_stats import (
        _GRAMS_EXPR, BOILER_FRAC_DEN, BOILER_FRAC_NUM, BOILER_MIN_DF,
        GRAM_N,
    )
    from de_project_airflow_etl_spark.operators.curation import (
        EVAL_MOD, NGRAM_N, _ngram_hashes,
    )
    from de_project_airflow_etl_spark.operators.quality import (
        MAX_TOP_FRAC, MIN_DISTINCT_RATIO,
    )
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    ratio = (F.size(F.array_distinct(toks)).cast("double")
             / F.size(toks).cast("double"))
    top_frac = (F.expr("CAST(array_max(transform(array_distinct("
                       "split(text, ' ')), w -> size(filter("
                       "split(text, ' '), x -> x = w)))) AS DOUBLE)")
                / F.size(toks).cast("double"))
    base = (docs.select(
                "doc_id", "lang",
                F.md5(F.col("text").cast("binary")).alias("h"),
                F.size(toks).alias("n_tokens"),
                ((ratio >= F.lit(MIN_DISTINCT_RATIO))
                 & (top_frac <= F.lit(MAX_TOP_FRAC))).alias("f_rep"))
                .localCheckpoint(eager=False))
    if stage == "1_base":
        return base
    exploded = docs.select("doc_id",
                           F.explode(F.expr(
                               f"transform({_GRAMS_EXPR},"
                               f" g -> xxhash64(g))")).alias("gram")
                           ).localCheckpoint(eager=False)
    uniq_ids = (base.groupBy("h")
                    .agg(F.min("doc_id").alias("doc_id"))
                    .select("doc_id"))
    boiler = (exploded.join(uniq_ids, "doc_id", "left_semi")
                      .groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
                      .filter(F.col("df") >= BOILER_MIN_DF).select("gram"))
    boiler_keep = (exploded.join(boiler.withColumn("b", F.lit(1)),
                                 "gram", "left")
                   .groupBy("doc_id")
                   .agg(F.count(F.lit(1)).alias("n_grams"),
                        F.sum(F.coalesce("b", F.lit(0))).alias("n_boiler"))
                   .filter(F.col("n_boiler") * BOILER_FRAC_DEN
                           < F.col("n_grams") * BOILER_FRAC_NUM)
                   .select("doc_id").withColumn("f_boil", F.lit(1)))
    if stage == "2_boiler":
        return boiler_keep
    grams = (docs.select("doc_id", toks.alias("toks"))
                 .filter(F.size("toks") >= NGRAM_N)
                 .select("doc_id", F.explode(_ngram_hashes()).alias("gh"))
                 .localCheckpoint(eager=False))
    eval_g = (grams.filter(F.col("doc_id") % EVAL_MOD == 0)
                   .select("gh").distinct())
    contaminated = (grams.filter(F.col("doc_id") % EVAL_MOD != 0)
                         .join(F.broadcast(eval_g), "gh")
                         .select("doc_id").distinct()
                         .withColumn("contam", F.lit(1)))
    if stage == "3_contam":
        return contaminated
    flagged = (base.join(boiler_keep, "doc_id", "left")
                   .join(contaminated, "doc_id", "left")
                   .select(
                       "doc_id", "lang", "h", "n_tokens", "f_rep",
                       (F.col("f_boil").isNotNull()
                        | (F.col("n_tokens") < GRAM_N)).alias("f_boil"),
                       ((F.col("doc_id") % EVAL_MOD != 0)
                        & F.col("contam").isNull()).alias("f_dec")))
    s3_docs = flagged.filter("f_rep AND f_boil AND f_dec")
    keep_ids = (s3_docs.groupBy("h")
                       .agg(F.min("doc_id").alias("doc_id"))
                       .select("doc_id").withColumn("k", F.lit(1)))
    flagged = (flagged.join(keep_ids, "doc_id", "left")
                      .select("doc_id", "lang", "n_tokens", "f_rep",
                              "f_boil", "f_dec",
                              F.col("k").isNotNull().alias("f_exact"))
                      .localCheckpoint(eager=False))
    if stage == "4_exact":
        return flagged
    if stage == "5_pairs":
        return _lsh_verified(spark, sf_dir)
    s4_ids = (flagged.filter("f_rep AND f_boil AND f_dec AND f_exact")
                     .select("doc_id"))
    dup_b = (_lsh_verified(spark, sf_dir)
             .join(s4_ids.withColumnRenamed("doc_id", "doc_a"),
                   "doc_a", "left_semi")
             .select(F.col("doc_b").alias("doc_id")).distinct()
             .withColumn("is_dup_b", F.lit(1)))
    flagged = (flagged.join(dup_b, "doc_id", "left")
                      .select("doc_id", "lang", "n_tokens", "f_rep",
                              "f_boil", "f_dec", "f_exact",
                              F.col("is_dup_b").isNull().alias("f_near"))
                      .localCheckpoint(eager=False))
    if stage == "6_near":
        return flagged
    from de_project_airflow_etl_spark.operators.corpus import _stage_rollup
    return _stage_rollup(flagged)


STAGES = ("1_base", "2_boiler", "3_contam", "4_exact", "5_pairs",
          "6_near", "7_full")

for s in STAGES:
    noop(build(s))  # warm
    spark.catalog.clearCache(); clear_pairs_cache()
best = {}
for r in range(3):
    for s in STAGES:
        spark.catalog.clearCache(); clear_pairs_cache()
        spark.sparkContext.setJobDescription(f"manifest-prefix:{s}")
        t0 = time.perf_counter()
        noop(build(s))
        best[s] = min(best.get(s, 9e9), time.perf_counter() - t0)
print({k: round(v, 3) for k, v in best.items()})
