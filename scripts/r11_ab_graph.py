"""Interleaved warm A/B: r10 (HEAD) shapes vs the r11 batched/lazy-
checkpoint shapes for dedup_clusters, kcore_dup_graph,
harmonic_centrality_dup_graph and revenue_pareto_curve — one session,
alternating rounds, best-of-N (the recorded like-for-like rule).

Usage: python scripts/r11_ab_graph.py [rounds] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from de_project_airflow_etl_spark.operators.dedup import (
    CC_MAX_ITERS, _large_star, _lsh_verified, _small_star,
    clear_pairs_cache,
)
from de_project_airflow_etl_spark.registry import all_queries
from de_project_airflow_etl_spark.session import get_spark
from de_project_airflow_etl_spark.tables import load

REG = all_queries()


# ------------------------- verbatim r10 (HEAD) implementations


def old_cc(pairs: DataFrame, max_iters: int = CC_MAX_ITERS) -> DataFrame:
    nodes = (pairs.select(F.col("doc_a").alias("doc_id"))
                  .union(pairs.select("doc_b"))
                  .distinct()
                  .localCheckpoint())
    edges = (pairs.select(F.col("doc_b").alias("u"),
                          F.col("doc_a").alias("v"))
                  .distinct()
                  .localCheckpoint())
    converged = False
    prev_stats = edges.agg(F.count(F.lit(1)), F.sum("u"),
                           F.sum("v")).collect()[0]
    for _ in range(max_iters):
        new_edges = _small_star(_large_star(edges)).localCheckpoint(
            eager=False)
        stats = new_edges.agg(F.count(F.lit(1)), F.sum("u"),
                              F.sum("v")).collect()[0]
        if stats == prev_stats and new_edges.exceptAll(edges).isEmpty():
            edges = new_edges
            converged = True
            break
        edges, prev_stats = new_edges, stats
    if not converged:
        raise RuntimeError("no convergence")
    return (nodes.join(edges, nodes.doc_id == edges.u, "left")
                 .select("doc_id",
                         F.coalesce("v", "doc_id").alias("component_id")))


def old_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _lsh_verified(spark, sf_dir).select("doc_a", "doc_b")
    return old_cc(pairs)


def old_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de_project_airflow_etl_spark.queries.features import (
        KCORE_K, KCORE_ROUNDS,
    )
    pairs = _lsh_verified(spark, sf_dir).select("doc_a", "doc_b")
    edges = (pairs.select(F.col("doc_a").alias("src"),
                          F.col("doc_b").alias("dst"))
                  .union(pairs.select(F.col("doc_b").alias("src"),
                                      F.col("doc_a").alias("dst")))
                  .localCheckpoint())
    for _ in range(KCORE_ROUNDS):
        keep = (edges.groupBy("src")
                     .agg(F.count(F.lit(1)).alias("d"))
                     .filter(F.col("d") >= KCORE_K)
                     .select("src"))
        edges = (edges.join(keep, "src")
                      .join(keep.withColumnRenamed("src", "dst"), "dst")
                      .select("src", "dst")
                      .localCheckpoint())
    return (edges.groupBy(F.col("src").alias("doc_id"))
                 .agg(F.count(F.lit(1)).alias("core_degree")))


def old_harmonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de_project_airflow_etl_spark.queries.attribution import (
        _HC_RADIUS, _HC_TOP,
    )
    pairs = _lsh_verified(spark, sf_dir).select("doc_a", "doc_b")
    sym = (pairs.selectExpr("doc_a AS src", "doc_b AS dst")
                .union(pairs.selectExpr("doc_b AS src", "doc_a AS dst"))
                .distinct()
                .localCheckpoint())
    levels = [sym.withColumn("d", F.lit(1))]
    frontier = sym
    visited = sym
    for depth in range(2, _HC_RADIUS + 1):
        hop = (frontier.join(sym.selectExpr("src AS mid", "dst AS nxt"),
                             frontier.dst == F.col("mid"))
                       .selectExpr("src", "nxt AS dst")
                       .filter("src <> dst")
                       .distinct())
        frontier = (hop.join(visited, ["src", "dst"], "left_anti")
                       .localCheckpoint())
        visited = visited.union(frontier).localCheckpoint()
        levels.append(frontier.withColumn("d", F.lit(depth)))
    alldist = levels[0]
    for lv in levels[1:]:
        alldist = alldist.unionAll(lv)
    hc = (alldist.groupBy("src")
          .agg(F.count(F.lit(1)).cast("long").alias("reachable_4"),
               F.expr("CAST(SUM(12 div d) AS BIGINT)")
                .alias("harmonic_x12")))
    return (hc.selectExpr("src AS doc_id", "reachable_4", "harmonic_x12",
                          "CAST(harmonic_x12 AS DOUBLE) / 12 AS harmonic")
              .orderBy(F.desc("harmonic_x12"), "doc_id")
              .limit(_HC_TOP))


def old_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de_project_airflow_etl_spark.queries.analytics import _O_CENTS
    from de_project_airflow_etl_spark.queries.util import global_row_number
    cust = (load(spark, sf_dir, "orders")
            .groupBy("o_custkey")
            .agg(F.sum(F.expr(_O_CENTS)).alias("cents")))
    ranked = global_row_number(cust, "cents", "o_custkey", "rk",
                               descending=True, adaptive=True)
    n = cust.agg(F.count(F.lit(1)).alias("n"))
    dec = (ranked.crossJoin(F.broadcast(n))
                 .withColumn("decile",
                             F.expr("((rk - 1) * 10) div n + 1"))
                 .groupBy("decile")
                 .agg(F.count(F.lit(1)).alias("n_customers"),
                      F.sum("cents").alias("revenue_cents")))
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.rowsBetween(Window.unboundedPreceding,
                            Window.unboundedFollowing)
    return dec.select(
        "decile", "n_customers", "revenue_cents",
        F.sum("revenue_cents").over(wc).alias("cum_revenue_cents"),
        (F.sum("revenue_cents").over(wc).cast("double")
         / F.sum("revenue_cents").over(wt).cast("double"))
            .alias("cum_revenue_share"))


PAIRS = {
    "dedup_clusters": (old_dedup_clusters, REG["dedup_clusters"].fn),
    "kcore_dup_graph": (old_kcore, REG["kcore_dup_graph"].fn),
    "harmonic_centrality_dup_graph": (
        old_harmonic, REG["harmonic_centrality_dup_graph"].fn),
    "revenue_pareto_curve": (old_pareto, REG["revenue_pareto_curve"].fn),
}


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    names = sys.argv[2:] or list(PAIRS)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r11-ab-graph")

    def run(fn):
        spark.catalog.clearCache(); clear_pairs_cache()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for name in names:
        old, new = PAIRS[name]
        # equality spot check once per query (old vs new rows)
        spark.catalog.clearCache(); clear_pairs_cache()
        o_rows = sorted(map(tuple, old(spark, sf_dir).collect()))
        spark.catalog.clearCache(); clear_pairs_cache()
        n_rows = sorted(map(tuple, new(spark, sf_dir).collect()))
        same = o_rows == n_rows
        print(f"{name}: rows_equal={same} n={len(n_rows)}", flush=True)
        assert same, f"{name} rows differ!"
        best = {"old": float("inf"), "new": float("inf")}
        for r in range(rounds):
            for label, fn in (("old", old), ("new", new)):
                spark.sparkContext.setJobDescription(f"{name}:{label}:r{r}")
                dt = run(fn)
                best[label] = min(best[label], dt)
                print(f"  round {r} {label}: {dt:.3f}s", flush=True)
        print(f"{name} BEST old={best['old']:.3f} new={best['new']:.3f}",
              flush=True)


if __name__ == "__main__":
    main()
