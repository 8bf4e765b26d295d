"""Round-30 staged bank: two ranking-comparison completions — rank-
biased overlap (RBO) between the cosine and L2 top-50 retrieval
rankings (the top-weighted list-similarity measure; the registered
kendall_tau_rankings treats every pair equally, RBO weights depth d
by p^(d-1) the way a user scans results), and rank-biased precision
(RBP) of label-match retrieval over the fixed anchor panel (the
user-persistence retrieval metric: P@k assumes the user reads
exactly k results, RBP models geometric stopping — reported at two
persistence levels).

Both are EXACT by construction, with no pow()/log() engine calls:
p = 1/2 (and 3/4) makes every weight a dyadic rational — RBP terms
are scaled INTEGERS (3^(rn-1) * 4^(k-rn) fixed point), and RBO depth
terms are single IEEE divisions of exactly-computed integers, folded
sorted from a 0.0 seed. Definitions follow Webber, Moffat & Zobel
2010 (RBO, truncated prefix form) and Moffat & Zobel 2008 (RBP) —
no external code.

Same contract as every staged query (see staged/__init__.py):
``(spark, sf_dir) -> DataFrame`` plus an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from de_project_airflow_etl_spark.queries.features import (
    _COS_SQL,
    _L2_SQL,
    RRF_QUERY_ID,
    RRF_TOPK,
    _ranked_lists,
)
from de_project_airflow_etl_spark.staged import staged_query
from de_project_airflow_etl_spark.tables import load

# The oracle-side twin of features._ranked_lists — the same CTE chain
# the registered rrf_fusion_search oracle uses (cosine desc / L2 asc
# top-50 with vec_id tie-break).
_SQL_RANKED = f"""
        q AS (SELECT embedding AS qv FROM embeddings
              WHERE vec_id = {RRF_QUERY_ID}),
        m AS (
          SELECT vec_id,
                 {_COS_SQL} AS cosv,
                 {_L2_SQL} AS l2sq
          FROM embeddings CROSS JOIN q
          WHERE vec_id <> {RRF_QUERY_ID}
        ),
        ra AS (
          SELECT vec_id, r FROM (
            SELECT vec_id, CAST(row_number() OVER
                   (ORDER BY cosv DESC, vec_id) AS BIGINT) AS r FROM m)
          WHERE r <= {RRF_TOPK}
        ),
        rb AS (
          SELECT vec_id, r FROM (
            SELECT vec_id, CAST(row_number() OVER
                   (ORDER BY l2sq, vec_id) AS BIGINT) AS r FROM m)
          WHERE r <= {RRF_TOPK}
        )"""

# ------------------------------------------------------------- RBO


@staged_query(
    "rbo_ranking_overlap",
    oracle=f"""
        WITH {_SQL_RANKED},
        common AS (
          SELECT GREATEST(ra.r, rb.r) AS md
          FROM ra JOIN rb ON ra.vec_id = rb.vec_id
        ),
        depths AS (
          SELECT CAST(unnest(generate_series(1, {RRF_TOPK}))
                      AS BIGINT) AS d
        ),
        a_d AS (
          SELECT d.d,
                 CAST((SELECT COUNT(*) FROM common c WHERE c.md <= d.d)
                      AS BIGINT) AS a
          FROM depths d
        )
        SELECT CAST({RRF_TOPK} AS BIGINT) AS k,
               (SELECT CAST(a AS DOUBLE) / {RRF_TOPK} FROM a_d
                WHERE d = {RRF_TOPK}) AS agreement_at_k,
               0.5 * list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_sort(list(CAST(a AS DOUBLE)
                   / (CAST(d AS DOUBLE)
                      * CAST(CAST(1 AS BIGINT) << d AS DOUBLE))))),
                 (acc, v) -> acc + v) AS rbo_p05
        FROM a_d
    """,
    doc="Rank-biased overlap (p = 1/2, truncated prefix form) "
        "between the cosine and L2 top-50 rankings of the shared "
        "probe query: RBO = (1-p) * sum_d p^(d-1) * |A_d n B_d| / d "
        "— the TOP-WEIGHTED agreement measure, where the registered "
        "kendall_tau_rankings weights a swap at rank 49 the same as "
        "one at rank 1. A doc with ranks (r1, r2) enters the prefix "
        "intersection at depth max(r1, r2), so A_d is one cumulative "
        "count over a 50-row depth panel; each depth term "
        "A_d / (d * 2^d) divides two exactly-computed integers "
        "(2^d via bit shift — no pow(), which is not correctly "
        "rounded cross-engine) and the <= 50 terms fold sorted from "
        "0.0. Plan: rides the shared materialized (vec_id, cosv, "
        "l2sq) scoring (broadcast probe, TakeOrdered top-k, no "
        "corpus shuffle); everything after is 50-row panel math.",
    tags=("staged", "similarity", "evaluation"),
)
def rbo_ranking_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ra, rb = _ranked_lists(spark, sf_dir)
    common = (ra.join(rb, "vec_id")
              .select(F.greatest("r1", "r2").alias("md")))
    depths = spark.range(1, RRF_TOPK + 1).select(
        F.col("id").cast("long").alias("d"))
    md_cnt = common.groupBy("md").agg(
        F.count(F.lit(1)).cast("long").alias("c"))
    cum = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    a_d = (depths.join(md_cnt, depths.d == md_cnt.md, "left")
           .select("d", F.coalesce("c", F.lit(0)).alias("c"))
           .select("d", F.sum("c").over(cum).cast("long").alias("a")))
    term = ("CAST(a AS DOUBLE) / (CAST(d AS DOUBLE)"
            " * CAST(shiftleft(CAST(1 AS BIGINT), CAST(d AS INT))"
            " AS DOUBLE))")
    return a_d.agg(
        F.lit(RRF_TOPK).cast("long").alias("k"),
        F.expr(f"CAST(MAX(CASE WHEN d = {RRF_TOPK} THEN a END)"
               f" AS DOUBLE) / {RRF_TOPK}").alias("agreement_at_k"),
        F.expr("CAST(0.5 AS DOUBLE) * aggregate(array_sort("
               f"collect_list({term})), CAST(0.0 AS DOUBLE),"
               " (acc, v) -> acc + v)").alias("rbo_p05"))


# ------------------------------------------------------------- RBP

RBP_ANCHOR_STEP = 25   # the map_retrieval_eval panel: 20 anchors
RBP_K = 10             # evaluation depth

_COS_ORACLE = (
    "("
    "list_reduce(list_prepend(0.0, list_transform("
    "generate_series(1, len(e.embedding)),"
    " i -> CAST(e.embedding[i] AS DOUBLE)"
    " * CAST(a.qv[i] AS DOUBLE))), (acc, v) -> acc + v)"
    " / (SQRT(list_reduce(list_prepend(0.0, list_transform("
    "generate_series(1, len(e.embedding)),"
    " i -> CAST(e.embedding[i] AS DOUBLE)"
    " * CAST(e.embedding[i] AS DOUBLE))), (acc, v) -> acc + v))"
    " * SQRT(list_reduce(list_prepend(0.0, list_transform("
    "generate_series(1, len(a.qv)),"
    " i -> CAST(a.qv[i] AS DOUBLE)"
    " * CAST(a.qv[i] AS DOUBLE))), (acc, v) -> acc + v))))")


@staged_query(
    "rbp_retrieval_eval",
    oracle=f"""
        WITH anchors AS (
          SELECT vec_id AS qid, label AS q_label, embedding AS qv
          FROM embeddings
          WHERE vec_id % {RBP_ANCHOR_STEP} = 0 AND vec_id < 500
        ),
        scored AS (
          SELECT a.qid, e.vec_id,
                 CASE WHEN e.label = a.q_label THEN 1 ELSE 0 END
                   AS rel,
                 {_COS_ORACLE} AS cosv
          FROM embeddings e CROSS JOIN anchors a
          WHERE e.vec_id <> a.qid
        ),
        ranked AS (
          SELECT qid, rel,
                 CAST(ROW_NUMBER() OVER (PARTITION BY qid
                   ORDER BY cosv DESC, vec_id) AS BIGINT) AS rn
          FROM scored
        ),
        per_q AS (
          SELECT qid,
                 CAST(SUM(rel * (CAST(1 AS BIGINT)
                      << ({RBP_K} - rn))) AS BIGINT) AS fp50,
                 CAST(SUM(rel * CAST(3 AS BIGINT) ** (rn - 1)
                      * CAST(4 AS BIGINT) ** ({RBP_K} - rn))
                      AS BIGINT) AS fp75,
                 CAST(SUM(rel) AS BIGINT) AS hits
          FROM ranked WHERE rn <= {RBP_K}
          GROUP BY qid
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
               CAST({RBP_K} AS BIGINT) AS k_eval,
               CAST(SUM(hits) AS DOUBLE)
                 / (COUNT(*) * {RBP_K}) AS precision_at_k,
               CAST(SUM(fp50) AS DOUBLE)
                 / (COUNT(*) * (CAST(1 AS BIGINT) << {RBP_K}))
                 AS rbp_p50,
               CAST(SUM(fp75) AS DOUBLE)
                 / (COUNT(*) * CAST(4 AS BIGINT) ** {RBP_K})
                 AS rbp_p75
        FROM per_q
    """,
    doc="Rank-biased precision of brute-force cosine retrieval "
        "against label-match relevance over the fixed 20-anchor "
        "panel (the map_retrieval_eval setup): RBP = (1-p) * "
        "sum_rel p^(rank-1) models a user who inspects each next "
        "result with persistence p — reported at p=1/2 (impatient) "
        "and p=3/4 (thorough) beside plain P@10. Both RBP sums are "
        "EXACT fixed-point integers (weights (1-p)p^(rn-1) scaled "
        "by 2^k resp. 4^k give rel * 2^(k-rn) and rel * 3^(rn-1) * "
        "4^(k-rn) — bit shifts and small powers, never a double "
        "pow()), accumulated in BIGINT across the panel and divided "
        "ONCE. Truncation at rank k is the documented evaluated-"
        "prefix form. Plan: the anchor panel broadcasts onto one "
        "corpus scan; the rank<=k filter rides WindowGroupLimit "
        "partial pushdown (per-anchor bounded forwarding — the "
        "bounded-key-window hazard solved engine-natively); "
        "everything after is <= 20-row panel math.",
    tags=("staged", "similarity", "evaluation"),
)
def rbp_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de_project_airflow_etl_spark.operators.similarity import cosine
    e = load(spark, sf_dir, "embeddings")
    anchors = (e.filter(f"vec_id % {RBP_ANCHOR_STEP} = 0"
                        " AND vec_id < 500")
               .select(F.col("vec_id").alias("qid"),
                       F.col("label").alias("q_label"),
                       F.col("embedding").alias("qv")))
    scored = (e.crossJoin(F.broadcast(anchors))
              .where("vec_id <> qid")
              .select("qid",
                      F.expr("CASE WHEN label = q_label THEN 1 ELSE 0"
                             " END").alias("rel"),
                      cosine("embedding", "qv").alias("cosv"),
                      "vec_id"))
    w = Window.partitionBy("qid").orderBy(F.desc("cosv"), "vec_id")
    ranked = (scored
              .select("qid", "rel",
                      F.row_number().over(w).cast("long").alias("rn"))
              .where(f"rn <= {RBP_K}"))
    per_q = ranked.groupBy("qid").agg(
        F.expr(f"CAST(SUM(rel * shiftleft(CAST(1 AS BIGINT),"
               f" CAST({RBP_K} - rn AS INT))) AS BIGINT)")
         .alias("fp50"),
        F.expr(f"CAST(SUM(rel * CAST(pow(3, rn - 1) AS BIGINT)"
               f" * CAST(pow(4, {RBP_K} - rn) AS BIGINT)) AS BIGINT)")
         .alias("fp75"),
        F.sum("rel").cast("long").alias("hits"))
    return per_q.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.lit(RBP_K).cast("long").alias("k_eval"),
        F.expr(f"CAST(SUM(hits) AS DOUBLE) / (COUNT(*) * {RBP_K})")
         .alias("precision_at_k"),
        F.expr(f"CAST(SUM(fp50) AS DOUBLE) / (COUNT(*)"
               f" * shiftleft(CAST(1 AS BIGINT), {RBP_K}))")
         .alias("rbp_p50"),
        F.expr(f"CAST(SUM(fp75) AS DOUBLE) / (COUNT(*)"
               f" * CAST(pow(4, {RBP_K}) AS BIGINT))")
         .alias("rbp_p75"))
