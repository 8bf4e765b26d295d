"""Interleaved warm A/B probe: r10 (HEAD) corpus_release_manifest
_release_flags vs the r11 fused-base-pass variant, in ONE session so
host drift hits both (the recorded like-for-like rule).

Usage: python scripts/r11_ab_manifest.py [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from de_project_airflow_etl_spark.operators.corpus import (
    _release_flags as new_release_flags,
    _stage_rollup,
)
from de_project_airflow_etl_spark.operators.dedup import clear_pairs_cache
from de_project_airflow_etl_spark.session import get_spark
from de_project_airflow_etl_spark.tables import load


def old_release_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verbatim copy of the HEAD (r10) _release_flags."""
    from de_project_airflow_etl_spark.operators.corpus_stats import (
        _GRAMS_EXPR, BOILER_FRAC_DEN, BOILER_FRAC_NUM, BOILER_MIN_DF,
    )
    from de_project_airflow_etl_spark.operators.curation import (
        EVAL_MOD, NGRAM_N, _ngram_hashes,
    )
    from de_project_airflow_etl_spark.operators.dedup import _lsh_verified
    from de_project_airflow_etl_spark.operators.quality import (
        repetition_stats_plan,
    )

    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")

    rep_keep = (repetition_stats_plan(docs).filter("keep")
                .select("doc_id").withColumn("f_rep", F.lit(1)))

    exploded = docs.select("doc_id",
                           F.explode(F.expr(
                               f"transform({_GRAMS_EXPR},"
                               f" g -> xxhash64(g))")).alias("gram")
                           ).localCheckpoint(eager=False)
    uniq_ids = (docs.groupBy(F.md5(F.col("text").cast("binary"))
                             .alias("h"))
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
    no_grams = (docs.filter(F.size(toks) < 5)
                    .select("doc_id").withColumn("f_boil", F.lit(1)))
    boiler_keep = boiler_keep.unionAll(no_grams)

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

    flagged = (docs.select("doc_id", "lang",
                           F.md5(F.col("text").cast("binary")).alias("h"),
                           F.size(toks).alias("n_tokens"))
                   .join(rep_keep, "doc_id", "left")
                   .join(boiler_keep, "doc_id", "left")
                   .join(contaminated, "doc_id", "left")
                   .select(
                       "doc_id", "lang", "h", "n_tokens",
                       F.col("f_rep").isNotNull().alias("f_rep"),
                       F.col("f_boil").isNotNull().alias("f_boil"),
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
    return flagged


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r11-ab-manifest")
    variants = {
        "old": lambda: _stage_rollup(old_release_flags(spark, sf_dir)),
        "new": lambda: _stage_rollup(new_release_flags(spark, sf_dir)),
    }
    # warm both once
    for name, fn in variants.items():
        spark.catalog.clearCache(); clear_pairs_cache()
        fn().count()
    best = {k: float("inf") for k in variants}
    for r in range(rounds):
        for name, fn in variants.items():
            spark.catalog.clearCache(); clear_pairs_cache()
            spark.sparkContext.setJobDescription(f"manifest:{name}:r{r}")
            t0 = time.perf_counter()
            fn().count()
            dt = time.perf_counter() - t0
            best[name] = min(best[name], dt)
            print(f"round {r} {name}: {dt:.3f}s", flush=True)
    print({k: round(v, 3) for k, v in best.items()})


if __name__ == "__main__":
    main()
