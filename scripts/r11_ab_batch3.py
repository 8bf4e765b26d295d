"""Interleaved warm A/B: r10 (HEAD) vs r11 shapes for
ann_recall_audit (fused window) and embedding_isotropy_panel
(single-pass dim aggregate, no data-sized checkpoint).

Usage: python scripts/r11_ab_batch3.py [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from de_project_airflow_etl_spark.operators.similarity import (
    RECALL_K, RECALL_QUERY_MOD, _bucket, cosine,
)
from de_project_airflow_etl_spark.queries.operating_points import (
    _Q_SCALE, _wide,
)
from de_project_airflow_etl_spark.registry import all_queries
from de_project_airflow_etl_spark.session import get_spark
from de_project_airflow_etl_spark.tables import load

REG = all_queries()


def old_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    q = (e.filter(F.col("vec_id") % RECALL_QUERY_MOD == 0)
          .select(F.col("vec_id").alias("qid"),
                  F.col("embedding").alias("qv"))
          .withColumn("qbucket", _bucket("qv")))
    scored = (e.withColumn("bucket", _bucket("embedding"))
               .crossJoin(F.broadcast(q))
               .filter(F.col("vec_id") != F.col("qid"))
               .select("qid", "vec_id",
                       cosine("embedding", "qv").alias("sim"),
                       (F.col("bucket") == F.col("qbucket"))
                           .cast("int").alias("in_bucket")))
    we = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
    wb = (Window.partitionBy("qid", "in_bucket")
                .orderBy(F.desc("sim"), F.asc("vec_id")))
    ranked = (scored.withColumn("rk_exact", F.row_number().over(we))
                    .withColumn("rk_bucket", F.row_number().over(wb)))
    hit = ((F.col("rk_exact") <= RECALL_K) & (F.col("in_bucket") == 1)
           & (F.col("rk_bucket") <= RECALL_K)).cast("int")
    return (ranked.groupBy("qid")
                  .agg(F.sum((F.col("rk_exact") <= RECALL_K).cast("int"))
                        .alias("n_exact"),
                       F.sum(((F.col("in_bucket") == 1)
                              & (F.col("rk_bucket") <= RECALL_K))
                             .cast("int")).alias("n_approx"),
                       F.sum(hit).alias("n_hits"),
                       (F.sum(hit).cast("double")
                        / F.lit(float(RECALL_K))).alias("recall")))


def old_isotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    norm = ("SQRT(aggregate(transform(sequence(1, size(embedding)),"
            " k -> CAST(element_at(embedding, k) AS DOUBLE)"
            " * CAST(element_at(embedding, k) AS DOUBLE)),"
            " CAST(0.0 AS DOUBLE), (a, v) -> a + v))")
    q = (load(spark, sf_dir, "embeddings")
         .selectExpr("vec_id", f"{norm} AS nrm", "embedding")
         .select("vec_id", "nrm",
                 F.posexplode("embedding").alias("d0", "v"))
         .selectExpr("vec_id", "d0 + 1 AS d",
                     f"CAST(ROUND(CAST(v AS DOUBLE) / nrm"
                     f" * {_Q_SCALE}) AS BIGINT) AS qv")
         .localCheckpoint())
    dims = q.groupBy("d").agg(F.sum("qv").cast("long").alias("s_d"))
    ss = dims.agg(F.expr("SUM(CAST(s_d AS DECIMAL(38,0)) * s_d)")
                   .alias("ss"))
    qq = q.agg(F.expr("SUM(CAST(qv AS DECIMAL(38,0)) * qv)")
                .alias("qq"))
    n = (q.select("vec_id").distinct()
          .agg(F.count(F.lit(1)).cast("long").alias("n")))
    return (ss.crossJoin(F.broadcast(qq)).crossJoin(F.broadcast(n))
            .selectExpr(
                "n AS n_vectors",
                f"({_wide('ss')} - {_wide('qq')})"
                f" / ({_wide('CAST(n AS DECIMAL(38,0)) * (n - 1)')}"
                f" * {_Q_SCALE}.0 * {_Q_SCALE}) AS mean_pairwise_cosine",
                f"{_wide('qq')} / (CAST(n AS DOUBLE)"
                f" * {_Q_SCALE}.0 * {_Q_SCALE}) AS mean_sq_norm_q"))


PAIRS = {
    "ann_recall_audit": (old_recall, REG["ann_recall_audit"].fn),
    "embedding_isotropy_panel": (
        old_isotropy, REG["embedding_isotropy_panel"].fn),
}


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r11-ab-batch3")
    for name, (old, new) in PAIRS.items():
        spark.catalog.clearCache()
        o_rows = sorted(map(tuple, old(spark, sf_dir).collect()))
        spark.catalog.clearCache()
        n_rows = sorted(map(tuple, new(spark, sf_dir).collect()))
        same = o_rows == n_rows
        print(f"{name}: rows_equal={same} n={len(n_rows)}", flush=True)
        assert same, f"{name} rows differ! {o_rows[:2]} vs {n_rows[:2]}"
        best = {"old": float("inf"), "new": float("inf")}
        for r in range(rounds):
            for label, fn in (("old", old), ("new", new)):
                spark.catalog.clearCache()
                spark.sparkContext.setJobDescription(f"{name}:{label}:r{r}")
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite").save()
                dt = time.perf_counter() - t0
                best[label] = min(best[label], dt)
                print(f"  round {r} {label}: {dt:.3f}s", flush=True)
        print(f"{name} BEST old={best['old']:.3f} new={best['new']:.3f}",
              flush=True)


if __name__ == "__main__":
    main()
