"""Plan/value gates for the round-10 OPTIMIZATION rewrites, pinning
the shapes the optimization claims so they cannot silently regress:

* recursive_dup_reachability is a single aggregate (no recursion
  machinery, no window, no join, one exchange);
* markov's 12 iterations live in ONE fold (final plan scan-free is
  already gated in test_plans_robust.py; here: no per-iteration join
  chain — the bounded fold appears exactly once);
* dbscan's components run as the bounded in-row fold (no join rounds
  after the dense-cell build beyond the label join-back);
* lof's all-pairs join is salted (join keys include the salt, so the
  key space is 16 * LOF_SALT, not 16);
* the binary-digest LSH pipeline produces the identical verified
  pairs as the hex form (exact set equality at the test sf).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from de_project_airflow_etl_spark.registry import all_queries

REG = all_queries()


def _final_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_reachability_is_one_aggregate(spark, sf_dir):
    df = REG["recursive_dup_reachability"].fn(spark, sf_dir)
    plan = _final_plan(df)
    for node in ("UnionLoop", "WindowExec", "Join", "CartesianProduct"):
        assert node not in plan, (node, plan[:1500])
    assert plan.count("Exchange") <= 1, plan[:1500]


def test_markov_single_fold(spark, sf_dir):
    # The per-scenario fold is materialized behind the result
    # checkpoint (the final plan shows only the fin/eff/te joins —
    # the round-6-late gate-visibility rule), so assert two things:
    # the FINAL plan carries no 12-iteration join chain and no scans,
    # and the PRE-checkpoint shape (rebuilt from the module pieces the
    # way the query builds it) contains exactly ONE sequence(1, 12)
    # runtime fold.
    df = REG["markov_removal_effect_attribution"].fn(spark, sf_dir)
    plan = _final_plan(df)
    assert plan.count("Scan parquet") == 0
    # the duplicated fin/eff branches plan a handful of bounded joins;
    # a regression back to per-iteration joins would add 12+ more
    assert plan.count("Join") <= 8, plan[:2000]
    import inspect

    from de_project_airflow_etl_spark.queries import robust
    src = inspect.getsource(robust.markov_removal_effect_attribution)
    # exactly ONE bounded fold (ADVICE r10: strict count, no vacuous
    # or-fallback — a reintroduced per-iteration join chain alongside
    # the fold must fail here)
    assert src.count("aggregate(sequence(1, {MRA_ITERS})") == 1, src


def test_dbscan_fold_replaces_star_rounds(spark, sf_dir):
    df = REG["dbscan_grid_embedding_clusters"].fn(spark, sf_dir)
    plan = _final_plan(df)
    # one label join-back onto the dense-cell table; the former star
    # loop planned several join/aggregate rounds per run
    assert plan.count("Join") <= 2, plan[:2000]
    assert "WindowExec" not in plan


def test_lof_salt_derivation_is_scale_adaptive():
    # r11: the salt derives from the session's defaultParallelism
    # (guide §2 scale-adaptive partitioning) — unsalted on local[32]
    # (32 // 16 // 2 = 1, the measured-faster local shape), engaged
    # automatically at cluster parallelism, env override respected.
    from types import SimpleNamespace

    from de_project_airflow_etl_spark.queries import mining

    def fake(parallelism):
        return SimpleNamespace(sparkContext=SimpleNamespace(
            defaultParallelism=parallelism))

    assert mining._lof_salt(fake(32)) == 1      # local[32]
    assert mining._lof_salt(fake(8)) == 1       # driver's low-core run
    assert mining._lof_salt(fake(1024)) == 32   # real cluster engages
    import os
    os.environ["SPARK_GRAFT_LOF_SALT"] = "4"
    try:
        assert mining._lof_salt(fake(32)) == 4  # override both ways
        assert mining._lof_salt(fake(1024)) == 4
    finally:
        del os.environ["SPARK_GRAFT_LOF_SALT"]


def test_lof_salted_equals_unsalted(spark, sf_dir):
    # ADVICE r10 (medium): the salted-join branch must be machine-
    # checked equal to the unsalted default, not argued in a comment —
    # a bug there would change LOF results only at cluster scale.
    # Force salt=4 via the env override, compare row-for-row.
    import inspect
    import os

    from de_project_airflow_etl_spark.queries import mining
    src = inspect.getsource(mining._lof_pairs)
    assert "xxhash64" in src and "lof_salt" in src
    assert "rand()" not in src

    base = sorted(map(tuple,
                      mining.lof_bucket_outliers(spark, sf_dir).collect()))
    assert base
    os.environ["SPARK_GRAFT_LOF_SALT"] = "4"
    try:
        # the knn eager checkpoint hides the join from the query's
        # FINAL plan (round-6-late gate-visibility rule), so gate the
        # factored pairs relation: the salted plan must actually join
        # on the salt keys
        plan = (mining._lof_pairs(spark, sf_dir)
                ._jdf.queryExecution().executedPlan().toString())
        assert "psalt" in plan and "osalt" in plan, plan[:2000]
        salted = sorted(map(tuple,
                            mining.lof_bucket_outliers(spark, sf_dir)
                                  .collect()))
    finally:
        del os.environ["SPARK_GRAFT_LOF_SALT"]
    assert salted == base


def test_lsh_binary_equals_hex_pairs(spark, sf_dir):
    """The binary-digest pipeline must emit the identical verified
    pair set (and jaccards) as the hex pipeline — the hex<->binary
    bijection argument, machine-checked."""
    from de_project_airflow_etl_spark.operators import dedup as D
    from de_project_airflow_etl_spark.queries.util import tracked_persist
    hex_dg = tracked_persist(
        D._shingled(spark, sf_dir).select("doc_id", "hs"))
    bin_dg = tracked_persist(
        D._shingled(spark, sf_dir).select(
            "doc_id", F.expr("transform(hs, h -> unhex(h))").alias("hs")))
    try:
        hex_rows = sorted(map(tuple, D._lsh_pairs_plan(hex_dg)
                              .collect()))
        bin_rows = sorted(map(tuple, D._lsh_pairs_plan(bin_dg, binary=True)
                              .collect()))
    finally:
        hex_dg.unpersist()
        bin_dg.unpersist()
    assert hex_rows == bin_rows
    assert hex_rows  # non-empty at every test sf
