"""Similarity search over the ``embeddings`` table
(``array<float>``, 64-dim).

Spark-first design:

* Dot products / norms are higher-order array expressions
  (``zip_with`` + ``aggregate``) — JVM-side, no Python. The fold is
  left-to-right, which makes the double accumulation bit-identical to
  the DuckDB oracle's ``list_reduce`` fold (both start at +0.0 and add
  in index order), so cosine values hash-match exactly.
* Brute-force top-k broadcasts the (tiny) query vector and plans
  TakeOrderedAndProject — per-partition heaps, no global sort. This is
  the O(n) baseline.
* The scale path is sign-LSH bucketing: an 8-bit hyperplane sketch
  (signs of the leading components) becomes the bucket key, the search
  touches one bucket — at 100 TB the bucket is a partition-prunable
  key, and the candidate set shrinks ~256x before any arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from de_project_airflow_etl_spark.registry import query
from de_project_airflow_etl_spark.tables import load

QUERY_VEC_ID = 0   # deterministic "query point": vector with vec_id=0
LSH_BITS = 8       # sign-LSH sketch width


def dot(a: str, b: str) -> Column:
    """Sequential-fold dot product (bit-deterministic, see module doc)."""
    return F.expr(
        f"aggregate(zip_with({a}, {b},"
        f" (x, y) -> cast(x as double) * cast(y as double)),"
        f" 0D, (acc, v) -> acc + v)")


def sql_dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(0.0, list_transform("
        f"generate_series(1, len({a})),"
        f" i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))),"
        f" (acc, v) -> acc + v)")


def cosine(a: str, b: str) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def sql_cosine(a: str, b: str) -> str:
    return f"{sql_dot(a, b)} / (SQRT({sql_dot(a, a)}) * SQRT({sql_dot(b, b)}))"


@query(
    "embedding_norms",
    oracle=f"""
        SELECT vec_id, label,
               SQRT({sql_dot('embedding', 'embedding')}) AS l2_norm
        FROM embeddings
    """,
    doc="L2 norms via the deterministic fold — the building block every "
        "similarity op shares.",
    tags=("similarity",),
)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    return e.select("vec_id", "label",
                    F.sqrt(dot("embedding", "embedding")).alias("l2_norm"))


@query(
    "knn_brute_force",
    oracle=f"""
        WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID})
        SELECT e.vec_id, e.label,
               {sql_cosine('e.embedding', 'q.qv')} AS cosine_sim
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> {QUERY_VEC_ID}
        ORDER BY cosine_sim DESC, e.vec_id
        LIMIT 10
    """,
    doc="Brute-force cosine top-10 for a fixed query vector: broadcast "
        "the 1-row query side, TakeOrderedAndProject for the top-k.",
    tags=("similarity", "knn"),
)
def knn_brute_force(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    q = (e.filter(F.col("vec_id") == QUERY_VEC_ID)
          .select(F.col("embedding").alias("qv")))
    return (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
         .crossJoin(F.broadcast(q))
         .select("vec_id", "label", cosine("embedding", "qv").alias("cosine_sim"))
         .orderBy(F.col("cosine_sim").desc(), "vec_id")
         .limit(10)
    )


def _bucket(col: str) -> Column:
    """Sign-LSH sketch: bit i set iff component i+1 > 0."""
    return F.expr(
        f"aggregate(sequence(1, {LSH_BITS}), 0,"
        f" (acc, i) -> acc + IF(element_at({col}, i) > 0,"
        f" shiftleft(1, i - 1), 0))")


def _sql_bucket(col: str) -> str:
    return (
        f"list_reduce(list_prepend(0, list_transform("
        f"generate_series(1, {LSH_BITS}),"
        f" i -> CASE WHEN {col}[i] > 0.0 THEN (1 << (i - 1)) ELSE 0 END)),"
        f" (acc, v) -> acc + v)")


@query(
    "ann_lsh_buckets",
    oracle=f"""
        SELECT {_sql_bucket('embedding')} AS bucket,
               COUNT(*) AS vec_count,
               MIN(vec_id) AS min_vec_id
        FROM embeddings
        GROUP BY 1
    """,
    doc="Sign-LSH bucket histogram — validates the hyperplane sketch "
        "that partitions the ANN index.",
    tags=("similarity", "lsh"),
)
def ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    return (
        e.groupBy(_bucket("embedding").alias("bucket"))
         .agg(F.count(F.lit(1)).alias("vec_count"),
              F.min("vec_id").alias("min_vec_id"))
    )


@query(
    "ann_lsh_search",
    oracle=f"""
        WITH b AS (
          SELECT vec_id, label, embedding,
                 {_sql_bucket('embedding')} AS bucket
          FROM embeddings
        ), q AS (SELECT embedding AS qv, bucket AS qbucket FROM b WHERE vec_id = {QUERY_VEC_ID})
        SELECT b.vec_id, b.label,
               {sql_cosine('b.embedding', 'q.qv')} AS cosine_sim
        FROM b CROSS JOIN q
        WHERE b.bucket = q.qbucket AND b.vec_id <> {QUERY_VEC_ID}
        ORDER BY cosine_sim DESC, b.vec_id
        LIMIT 5
    """,
    doc="ANN search: prune to the query's LSH bucket (equi-predicate -> "
        "partition pruning at scale), then exact cosine re-rank of the "
        "~n/256 survivors.",
    tags=("similarity", "lsh", "knn"),
)
def ann_lsh_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").withColumn("bucket", _bucket("embedding"))
    q = (e.filter(F.col("vec_id") == QUERY_VEC_ID)
          .select(F.col("embedding").alias("qv"), F.col("bucket").alias("qbucket")))
    return (
        e.crossJoin(F.broadcast(q))
         .filter((F.col("bucket") == F.col("qbucket"))
                 & (F.col("vec_id") != QUERY_VEC_ID))
         .select("vec_id", "label", cosine("embedding", "qv").alias("cosine_sim"))
         .orderBy(F.col("cosine_sim").desc(), "vec_id")
         .limit(5)
    )


_KNN_ORACLE = f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID})
    SELECT e.vec_id, e.label,
           {sql_cosine('e.embedding', 'q.qv')} AS cosine_sim
    FROM embeddings e CROSS JOIN q
    WHERE e.vec_id <> {QUERY_VEC_ID}
    ORDER BY cosine_sim DESC, e.vec_id
    LIMIT 10
"""


@query(
    "knn_pandas_udf",
    oracle=_KNN_ORACLE,
    doc="Arrow-vectorized kNN: the same brute-force search as "
        "knn_brute_force, but scoring happens in a mapInPandas worker "
        "with numpy (cumsum keeps the accumulation order identical to "
        "the JVM fold, so the two implementations AND the oracle agree "
        "bit-for-bit). Demonstrates the Pandas-UDF escape hatch for "
        "vector math the built-ins can't express — same plan shape, "
        "Arrow batches instead of codegen.",
    tags=("similarity", "knn", "pandas-udf"),
)
def knn_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    e = load(spark, sf_dir, "embeddings")
    qv = np.asarray(
        e.filter(F.col("vec_id") == QUERY_VEC_ID).first()["embedding"],
        dtype=np.float64)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # cumsum = strictly sequential accumulation -> bit-identical to
        # the zip_with/aggregate fold and the DuckDB list_reduce oracle
        # (np.dot's pairwise/SIMD summation would NOT match).
        q_norm = float(np.sqrt(np.cumsum(qv * qv)[-1]))
        for pdf in batches:
            mat = np.stack([np.asarray(v, dtype=np.float64)
                            for v in pdf["embedding"]])
            dots = np.cumsum(mat * qv, axis=1)[:, -1]
            norms = np.sqrt(np.cumsum(mat * mat, axis=1)[:, -1])
            yield pd.DataFrame({
                "vec_id": pdf["vec_id"].values,
                "label": pdf["label"].values,
                "cosine_sim": dots / (norms * q_norm),
            })

    return (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
         .select("vec_id", "label", "embedding")
         .mapInPandas(score, "vec_id long, label int, cosine_sim double")
         .orderBy(F.col("cosine_sim").desc(), "vec_id")
         .limit(10)
    )


_SQL_IVF_CELLS = f"""
  seeds AS (
    -- deterministic coarse centroids: the lowest-vec_id vector of each
    -- label (k-means would converge these; seeds keep the oracle exact)
    SELECT label AS cell, embedding AS centroid
    FROM embeddings e
    WHERE vec_id = (SELECT MIN(vec_id) FROM embeddings s WHERE s.label = e.label)
  ),
  assigned AS (
    -- coarse quantizer: every vector -> its nearest centroid's cell
    SELECT vec_id, label, embedding, cell FROM (
      SELECT e.vec_id, e.label, e.embedding, s.cell,
             ROW_NUMBER() OVER (
               PARTITION BY e.vec_id
               ORDER BY {sql_cosine('e.embedding', 's.centroid')} DESC, s.cell
             ) AS rnk
      FROM embeddings e CROSS JOIN seeds s
    ) WHERE rnk = 1
  )
"""


def _seed_centroids(e: DataFrame) -> DataFrame:
    """Deterministic coarse centroids: the lowest-vec_id vector of each
    label -> (cell, centroid)."""
    from pyspark.sql import Window
    w_seed = Window.partitionBy("label").orderBy("vec_id")
    return (e.withColumn("rn", F.row_number().over(w_seed))
             .filter(F.col("rn") == 1)
             .select(F.col("label").alias("cell"),
                     F.col("embedding").alias("centroid")))


# per-centroid cosine structs, evaluated per row with higher-order
# functions: struct ordering over (sim, negcell) realizes the
# (sim DESC, cell ASC) tiebreak the oracle's ROW_NUMBER spells.
# cosine keeps the oracle's exact expression tree
# dot / (sqrt(dot(e,e)) * sqrt(dot(c,c))), so values — and therefore
# any argmax/ordering over them — are bit-identical to the window
# formulation.
def _cell_sim_structs(col: str = "embedding") -> str:
    return f"""
    transform(cents, c -> struct(
      aggregate(zip_with({col}, c.centroid,
                  (x, y) -> cast(x as double) * cast(y as double)),
                0D, (acc, v) -> acc + v)
      / (sqrt(aggregate(zip_with({col}, {col},
                 (x, y) -> cast(x as double) * cast(y as double)),
               0D, (acc, v) -> acc + v))
         * sqrt(aggregate(zip_with(c.centroid, c.centroid,
                  (x, y) -> cast(x as double) * cast(y as double)),
                0D, (acc, v) -> acc + v))) AS sim,
      -c.cell AS negcell))
"""


_BEST_CELL = f"array_max({_cell_sim_structs()})"


def _collect_cents(centroids: DataFrame) -> DataFrame:
    """Collapse the (tiny) centroid table to ONE array-of-structs row,
    ready to broadcast. Build it once per query so the seeds subplan
    isn't re-executed for every assignment site."""
    return centroids.agg(
        F.collect_list(F.struct("cell", "centroid")).alias("cents"))


def _assign_cells(df: DataFrame, centroids: DataFrame,
                  *, collected: bool = False) -> DataFrame:
    """Coarse quantization as a ZERO-SHUFFLE map: broadcast the one-row
    centroid array and pick the argmax-cosine cell per vector with
    array_max — no exchange, no per-vector window sort. The previous
    formulation window-ranked a vectors-x-centroids cross join, which
    shuffled the whole corpus by vec_id twice; this one touches each
    row exactly once, which is the difference between an O(corpus) map
    and an O(corpus) shuffle at 100 TB."""
    cents = centroids if collected else _collect_cents(centroids)
    return (df.crossJoin(F.broadcast(cents))
              .withColumn("cell", -F.expr(_BEST_CELL)["negcell"])
              .drop("cents"))


@query(
    "ann_ivf_search",
    oracle=f"""
        WITH {_SQL_IVF_CELLS},
        q AS (SELECT embedding AS qv, cell AS qcell
              FROM assigned WHERE vec_id = {QUERY_VEC_ID})
        SELECT a.vec_id, a.label, a.cell,
               {sql_cosine('a.embedding', 'q.qv')} AS cosine_sim
        FROM assigned a CROSS JOIN q
        WHERE a.cell = q.qcell AND a.vec_id <> {QUERY_VEC_ID}
        ORDER BY cosine_sim DESC, a.vec_id
        LIMIT 5
    """,
    doc="IVF (inverted-file) ANN: a small set of coarse centroids is "
        "broadcast, every vector is assigned to its nearest centroid's "
        "cell (the inverted list), and the search probes only the "
        "query's cell before the exact re-rank. At 100 TB the cell id "
        "is the storage partition key, so a probe is a partition-pruned "
        "scan of ~n/k vectors; centroids come from a k-means fit (see "
        "ann_ivf_kmeans_fit; seed vectors here keep the oracle exact). "
        "Assignment is the zero-shuffle broadcast argmax map "
        "(_assign_cells), bit-identical to the oracle's window argmax.",
    tags=("similarity", "ivf", "knn"),
)
def ann_ivf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    # one-row centroid array, localCheckpointed so the seeds window
    # subplan runs ONCE even though two assignment sites broadcast it.
    cents = _collect_cents(_seed_centroids(e)).localCheckpoint()
    # the query row is quantized on its own, so the full-corpus
    # assignment below is referenced exactly ONCE in the plan.
    q = (_assign_cells(e.filter(F.col("vec_id") == QUERY_VEC_ID), cents,
                       collected=True)
         .select(F.col("embedding").alias("qv"), F.col("cell").alias("qcell")))
    assigned = _assign_cells(e, cents, collected=True)
    return (
        assigned.crossJoin(F.broadcast(q))
                .filter((F.col("cell") == F.col("qcell"))
                        & (F.col("vec_id") != QUERY_VEC_ID))
                .select("vec_id", "label", "cell",
                        cosine("embedding", "qv").alias("cosine_sim"))
                .orderBy(F.col("cosine_sim").desc(), "vec_id")
                .limit(5)
    )


NPROBE = 3  # cells probed by the multi-probe IVF search


@query(
    "ann_ivf_multiprobe",
    oracle=f"""
        WITH {_SQL_IVF_CELLS},
        q AS (SELECT embedding AS qv FROM embeddings
              WHERE vec_id = {QUERY_VEC_ID}),
        probed AS (
          SELECT s.cell FROM seeds s CROSS JOIN q
          ORDER BY {sql_cosine('s.centroid', 'q.qv')} DESC, s.cell
          LIMIT {NPROBE}
        )
        SELECT a.vec_id, a.label, a.cell,
               {sql_cosine('a.embedding', 'q.qv')} AS cosine_sim
        FROM assigned a CROSS JOIN q
        WHERE a.cell IN (SELECT cell FROM probed)
          AND a.vec_id <> {QUERY_VEC_ID}
        ORDER BY cosine_sim DESC, a.vec_id
        LIMIT 10
    """,
    doc="Multi-probe IVF ANN: probe the union of the query's NPROBE "
        "nearest cells instead of just one — the standard recall "
        "lever for IVF at scale (a query near a cell boundary misses "
        "true neighbors that quantized into the adjacent cell; "
        "probing 3 cells recovers them at 3x the probe cost, still "
        "~n*nprobe/k vectors). The probe list is computed on the "
        "broadcast one-row centroid array (sort_array over the same "
        "bit-exact sim structs the assignment argmax uses), so cell "
        "selection adds zero shuffle; the candidate filter is "
        "cell IN (probe list) — partition-prunable when cell is the "
        "storage partition key.",
    tags=("similarity", "ivf", "knn"),
)
def ann_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    cents = _collect_cents(_seed_centroids(e)).localCheckpoint()
    # probe cells: rank centroids by cosine to the query on the
    # one-row array — sort_array DESC over (sim, negcell) structs is
    # (sim DESC, cell ASC), matching the oracle's ORDER BY exactly
    probe_expr = (f"slice(transform(sort_array({_cell_sim_structs('qv')},"
                  f" false), s -> -s.negcell), 1, {NPROBE})")
    q = (e.filter(F.col("vec_id") == QUERY_VEC_ID)
          .select(F.col("embedding").alias("qv"))
          .crossJoin(F.broadcast(cents))
          .select("qv", F.expr(probe_expr).alias("probe_cells")))
    assigned = _assign_cells(e, cents, collected=True)
    return (
        assigned.crossJoin(F.broadcast(q))
                .filter(F.expr("array_contains(probe_cells, cell)")
                        & (F.col("vec_id") != QUERY_VEC_ID))
                .select("vec_id", "label", "cell",
                        cosine("embedding", "qv").alias("cosine_sim"))
                .orderBy(F.col("cosine_sim").desc(), "vec_id")
                .limit(10)
    )


KMEANS_ITERS = 3
KMEANS_SCALE = 1000  # fixed-point quantization scale (see below)
EMB_DIM = 64         # embeddings table dimension (TESTDATA.md)

# Fixed-point Lloyd's, exactly reproducible across engines.  The r2
# version used double AVG means, whose accumulation order differs
# between Spark partial aggregation and any oracle — so it could only
# carry a rows-only check.  This version makes every step exact:
#
# * Quantize: e_i = FLOOR(double(v) * 1000) as BIGINT — identical
#   IEEE multiply + floor in Spark and DuckDB.  K-means on the
#   quantized vectors is still k-means, just on data both engines
#   agree on bit-for-bit.
# * Update: integer addition is associative, so the per-(cell, dim)
#   BIGINT SUM is exact and order-insensitive; the new component is
#   (1000 * sum) DIV count — truncating integer division, which Spark
#   DIV and DuckDB // both implement.  Renormalizing to ~scale·10^3
#   keeps magnitudes corpus-size-independent (|c_i| <= 530'000
#   whatever n is), so nothing ever approaches 2^53.
# * Assignment: cosine is scale-invariant, so the score is
#   int_dot(e, c) / sqrt(int_dot(c, c)) — both operands are exact
#   integers < 2^53, their DOUBLE casts are exact, and IEEE divide /
#   sqrt are correctly rounded in both engines => bit-identical
#   scores, therefore an identical argmax (ties broken by cell ASC).

_QUANT = ("transform(embedding, v -> "
          "CAST(FLOOR(CAST(v AS DOUBLE) * 1000.0D) AS BIGINT))")


def _idot(a: str, b: str) -> Column:
    """Exact BIGINT dot product (associative — no fold-order issues)."""
    return F.expr(f"aggregate(zip_with({a}, {b}, (x, y) -> x * y),"
                  f" 0L, (acc, v) -> acc + v)")


def _sql_idot(a: str, b: str) -> str:
    return (f"list_aggregate(list_transform(generate_series(1, {EMB_DIM}),"
            f" i -> {a}[i] * {b}[i]), 'sum')")


# argmax over the integer-centroid list: score = idot(e,c)/sqrt(idot(c,c))
_INT_BEST_CELL = """
    array_max(transform(cents, c -> struct(
      CAST(aggregate(zip_with(ei, c.centroid, (x, y) -> x * y),
                     0L, (acc, v) -> acc + v) AS DOUBLE)
      / sqrt(CAST(aggregate(zip_with(c.centroid, c.centroid, (x, y) -> x * y),
                            0L, (acc, v) -> acc + v) AS DOUBLE)) AS sim,
      -c.cell AS negcell)))
"""


def _assign_cells_int(e: DataFrame, cents: DataFrame) -> DataFrame:
    """Zero-shuffle broadcast argmax over integer centroids (same plan
    shape as _assign_cells: one-row centroid array, per-row array_max)."""
    return (e.crossJoin(F.broadcast(cents))
              .withColumn("cell", -F.expr(_INT_BEST_CELL)["negcell"])
              .drop("cents"))


def _sql_kmeans_score(e: str, c: str) -> str:
    return (f"CAST({_sql_idot(e + '.ei', c + '.centroid')} AS DOUBLE)"
            f" / SQRT(CAST({_sql_idot(c + '.centroid', c + '.centroid')}"
            f" AS DOUBLE))")


def _sql_kmeans_round(n: int, cents_prev: str) -> str:
    """One unrolled Lloyd's round: assign (window argmax) + update
    (exact integer mean at fixed point)."""
    return f"""
  a{n} AS (
    SELECT vec_id, ei, cell FROM (
      SELECT e.vec_id, e.ei, c.cell,
             ROW_NUMBER() OVER (
               PARTITION BY e.vec_id
               ORDER BY {_sql_kmeans_score('e', 'c')} DESC, c.cell
             ) AS rnk
      FROM eint e CROSS JOIN {cents_prev} c
    ) WHERE rnk = 1
  ),
  c{n} AS (
    SELECT cell, list(comp ORDER BY pos) AS centroid FROM (
      SELECT cell, t.i AS pos,
             CAST(({KMEANS_SCALE} * SUM(a.ei[t.i])) // COUNT(*) AS BIGINT)
               AS comp
      FROM a{n} a CROSS JOIN range(1, {EMB_DIM + 1}) t(i)
      GROUP BY cell, t.i
    ) GROUP BY cell
  )"""


_KMEANS_ORACLE = f"""
    WITH eint AS (
      SELECT vec_id, label,
             list_transform(embedding,
               v -> CAST(FLOOR(CAST(v AS DOUBLE) * 1000.0) AS BIGINT)) AS ei
      FROM embeddings
    ),
    c0 AS (
      SELECT label AS cell, ei AS centroid
      FROM eint e
      WHERE vec_id = (SELECT MIN(vec_id) FROM eint s WHERE s.label = e.label)
    ),{_sql_kmeans_round(1, 'c0')},{_sql_kmeans_round(2, 'c1')},{_sql_kmeans_round(3, 'c2')},
    afinal AS (
      SELECT cell FROM (
        SELECT e.vec_id, c.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_sql_kmeans_score('e', 'c')} DESC, c.cell
               ) AS rnk
        FROM eint e CROSS JOIN c{KMEANS_ITERS} c
      ) WHERE rnk = 1
    )
    SELECT f.cell,
           f.n_vectors,
           SQRT(CAST({_sql_idot('c.centroid', 'c.centroid')} AS DOUBLE))
             AS centroid_norm,
           CAST(list_aggregate(c.centroid, 'sum') AS BIGINT)
             AS centroid_checksum
    FROM (SELECT cell, COUNT(*) AS n_vectors FROM afinal GROUP BY cell) f
    JOIN c{KMEANS_ITERS} c USING (cell)
"""


@query(
    "ann_ivf_kmeans_fit",
    oracle=_KMEANS_ORACLE,
    doc="Lloyd's k-means refinement of the IVF coarse centroids "
        "(3 rounds, seeded from the deterministic per-label seeds), in "
        "exact fixed-point arithmetic so the iterative fit is fully "
        "value-verified against an unrolled-SQL oracle (the "
        "pagerank_dup_graph technique: quantize once, then only "
        "associative integer sums + truncating integer division + "
        "pointwise IEEE ops — every intermediate is bit-identical "
        "across engines). Assignment is the zero-shuffle broadcast "
        "argmax map shared with ann_ivf_search; the update step is the "
        "relational mean — posexplode then SUM/COUNT per (cell, dim) — "
        "whose map-side partial aggregation reduces each partition to "
        "k x d rows before the shuffle, so a round costs one "
        "O(k*d*partitions) exchange regardless of corpus size. Output "
        "is the fitted cell populations + centroid norms/checksums.",
    tags=("similarity", "ivf", "kmeans", "iterative"),
)
def ann_ivf_kmeans_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", F.expr(_QUANT).alias("ei"))
    from pyspark.sql import Window
    w_seed = Window.partitionBy("label").orderBy("vec_id")
    cents_tbl = (emb.withColumn("rn", F.row_number().over(w_seed))
                    .filter(F.col("rn") == 1)
                    .select(F.col("label").alias("cell"),
                            F.expr(_QUANT).alias("centroid")))
    cents = _collect_cents(cents_tbl).localCheckpoint()
    for _ in range(KMEANS_ITERS):
        assigned = _assign_cells_int(e, cents)
        cents_tbl = (
            assigned.select("cell", F.posexplode("ei").alias("pos", "v"))
                    .groupBy("cell", "pos")
                    .agg(F.sum("v").alias("s"),
                         F.count(F.lit(1)).alias("cnt"))
                    .withColumn(
                        "comp",
                        F.expr(f"({KMEANS_SCALE} * s) DIV cnt"))
                    .groupBy("cell")
                    .agg(F.expr("transform(array_sort(collect_list("
                                "struct(pos, comp))), x -> x.comp)")
                          .alias("centroid")))
        cents = _collect_cents(cents_tbl).localCheckpoint()
    final = _assign_cells_int(e, cents)
    counts = final.groupBy("cell").agg(F.count(F.lit(1)).alias("n_vectors"))
    stats = cents_tbl.select(
        "cell",
        F.sqrt(_idot("centroid", "centroid").cast("double"))
         .alias("centroid_norm"),
        F.expr("aggregate(centroid, 0L, (acc, v) -> acc + v)")
         .alias("centroid_checksum"))
    return (counts.join(stats, "cell")
                  .select("cell", "n_vectors", "centroid_norm",
                          "centroid_checksum"))


@query(
    "knn_per_label",
    oracle=f"""
        WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
        scored AS (
          SELECT e.vec_id, e.label,
                 {sql_cosine('e.embedding', 'q.qv')} AS cosine_sim
          FROM embeddings e CROSS JOIN q
          WHERE e.vec_id <> {QUERY_VEC_ID}
        )
        SELECT label, vec_id, cosine_sim, rn
        FROM (
          SELECT label, vec_id, cosine_sim,
                 ROW_NUMBER() OVER (PARTITION BY label
                                    ORDER BY cosine_sim DESC, vec_id) AS rn
          FROM scored
        )
        WHERE rn <= 3
    """,
    doc="IVF-style partitioned search: top-3 neighbors within every "
        "coarse cell (label), via one window pass over the scored set.",
    tags=("similarity", "knn", "window"),
)
def knn_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    e = load(spark, sf_dir, "embeddings")
    q = (e.filter(F.col("vec_id") == QUERY_VEC_ID)
          .select(F.col("embedding").alias("qv")))
    scored = (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
         .crossJoin(F.broadcast(q))
         .select("label", "vec_id", cosine("embedding", "qv").alias("cosine_sim"))
    )
    w = Window.partitionBy("label").orderBy(F.col("cosine_sim").desc(), "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
              .filter(F.col("rn") <= 3)
              .select("label", "vec_id", "cosine_sim", "rn")
    )


# ------------------------------------------------ int8 quantization


@query(
    "embedding_int8_quantize",
    oracle="""
        WITH scaled AS (
          SELECT vec_id, embedding,
                 list_max(list_transform(embedding,
                   x -> abs(CAST(x AS DOUBLE)))) AS max_abs
          FROM embeddings
        ), coded AS (
          SELECT vec_id, max_abs,
                 CASE WHEN max_abs = 0
                      THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
                      ELSE list_transform(embedding, x ->
                        CAST(FLOOR(CAST(x AS DOUBLE) * (127.0 / max_abs))
                             AS BIGINT))
                 END AS codes
          FROM scaled
        )
        SELECT vec_id, max_abs,
               CAST(len(codes) AS BIGINT) AS n_dims,
               list_reduce(list_prepend(CAST(0 AS BIGINT), codes),
                           (acc, x) -> acc + x) AS code_sum,
               md5(array_to_string(codes, '|')) AS code_md5
        FROM coded
    """,
    doc="Symmetric int8 quantization of the embedding column (per-"
        "vector max-abs scale, floor rounding): the compression step "
        "that shrinks an ANN corpus 4x before indexing. Deterministic "
        "across engines because scale = 127.0/max_abs and x*scale are "
        "single IEEE operations on identical operands and FLOOR is "
        "exact; verified via the code vector's md5 and integer sum. "
        "A stateless per-row map — no shuffle; at 100 TB this runs "
        "inside the scan stage and writes a 4x-smaller column.",
    tags=("similarity", "quantization",),
)
def embedding_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    scaled = e.select(
        "vec_id", "embedding",
        F.expr("array_max(transform(embedding, "
               "x -> abs(CAST(x AS DOUBLE))))").alias("max_abs"))
    coded = scaled.select(
        "vec_id", "max_abs",
        F.expr("CASE WHEN max_abs = 0 "
               "THEN transform(embedding, x -> CAST(0 AS BIGINT)) "
               "ELSE transform(embedding, x -> "
               "CAST(FLOOR(CAST(x AS DOUBLE) * (127.0D / max_abs)) "
               "AS BIGINT)) END").alias("codes"))
    return coded.select(
        "vec_id", "max_abs",
        F.expr("CAST(size(codes) AS BIGINT)").alias("n_dims"),
        F.expr("aggregate(codes, CAST(0 AS BIGINT), (acc, x) -> acc + x)")
         .alias("code_sum"),
        F.expr("md5(concat_ws('|', transform(codes, "
               "x -> CAST(x AS STRING))))").alias("code_md5"))


# ------------------------------------- PCA direction (power iteration)

PCA_SCALE = 1000   # fixed-point quantization scale (floor(v * 1000))
PCA_ITERS = 3      # unrolled power-iteration rounds


def _sql_pca_iter(prev: str, out: str) -> str:
    """One unrolled power-iteration round in DuckDB SQL: integer
    mat-vec against the Gram CTE, then max-abs renormalization back to
    ~PCA_SCALE via truncating integer division (DuckDB ``//`` and
    Spark ``div`` both truncate toward zero, verified for negatives)."""
    return f"""
        r_{out} AS (
          SELECT g.i AS j, SUM(g.g * v.val) AS raw
          FROM gram g JOIN v_{prev} v ON g.j = v.j GROUP BY 1
        ),
        m_{out} AS (
          SELECT (GREATEST(MAX(ABS(raw)), 1) // {PCA_SCALE}) + 1 AS d
          FROM r_{out}
        ),
        v_{out} AS (
          SELECT j, raw // d AS val FROM r_{out}, m_{out}
        )
    """


@query(
    "embedding_pca_power_iter",
    oracle=f"""
        WITH quant AS (
          SELECT vec_id,
                 generate_subscripts(embedding, 1) AS i,
                 CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE)
                            * {PCA_SCALE}) AS BIGINT) AS q
          FROM embeddings
        ),
        gram AS (
          SELECT a.i AS i, b.i AS j, SUM(a.q * b.q) AS g
          FROM quant a JOIN quant b USING (vec_id) GROUP BY 1, 2
        ),
        v_0 AS (
          SELECT DISTINCT i AS j, CAST({PCA_SCALE} AS BIGINT) AS val
          FROM quant
        ),
        {",".join(_sql_pca_iter(str(k), str(k + 1)) for k in range(PCA_ITERS))},
        proj AS (
          SELECT q.vec_id, CAST(SUM(q.q * v.val) AS BIGINT) AS proj
          FROM quant q JOIN v_{PCA_ITERS} v ON q.i = v.j GROUP BY 1
        )
        SELECT p.vec_id, e.label, p.proj
        FROM proj p JOIN embeddings e ON e.vec_id = p.vec_id
    """,
    doc="Dominant principal direction of the embedding cloud "
        "(uncentered PCA / top right-singular vector) by power "
        "iteration made EXACTLY cross-engine-verifiable with the "
        "pagerank/k-means fixed-point technique: quantize components "
        "to integers (floor(v*1000)), accumulate the 64x64 Gram "
        "matrix in exact BIGINT sums (order-insensitive), run "
        "unrolled integer mat-vec rounds renormalized by max-abs "
        "truncating division, and project every vector onto the "
        "result as an exact integer dot product. Scale shape: the "
        "corpus contributes through ONE self-join-free pass per "
        "vector pair-of-dims (d^2 explode with map-side combine into "
        "4096 groups — shuffle volume is O(d^2 x partitions), not "
        "O(n)); the iteration itself runs on the 4096-row Gram "
        "relation, and the final projection is a broadcast of the "
        "64-row direction onto the corpus. Ref: standard power "
        "iteration; reference has no PCA — this extends the "
        "similarity family for embedding triage (outlier/direction "
        "audits before ANN indexing).",
    tags=("similarity", "pca", "iterative"),
)
def embedding_pca_power_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    quant = e.select(
        "vec_id",
        F.posexplode(F.col("embedding")).alias("i0", "v"),
    ).select(
        "vec_id",
        (F.col("i0") + 1).alias("i"),
        F.floor(F.col("v").cast("double") * PCA_SCALE).cast("long").alias("q"),
    )
    a, b = quant.alias("a"), quant.alias("b")
    # d^2 rows per vector stream into a 4096-group hash aggregate —
    # partial aggregation keeps the exchange at O(d^2) per task.
    # localCheckpoint: the corpus pass runs ONCE; the 3 iteration
    # rounds and the projection reuse the materialized 4096-row Gram.
    gram = (a.join(b, "vec_id")
             .groupBy(F.col("a.i").alias("i"), F.col("b.i").alias("j"))
             .agg(F.sum(F.col("a.q") * F.col("b.q")).alias("g"))
             .localCheckpoint())
    v = (quant.select(F.col("i").alias("j")).distinct()
              .withColumn("val", F.lit(PCA_SCALE).cast("long")))
    for _ in range(PCA_ITERS):
        raw = (gram.join(v, "j")
                   .groupBy(F.col("i").alias("j2"))
                   .agg(F.sum(F.col("g") * F.col("val")).alias("raw"))
                   .withColumnRenamed("j2", "j"))
        m = raw.agg((F.expr(f"greatest(max(abs(raw)), 1) div {PCA_SCALE}")
                     + F.lit(1)).alias("d"))
        # raw is consumed twice (normalizer + update), so an
        # un-materialized v DOUBLES its lineage every round —
        # exponential plan growth (8 re-scans of the corpus from 3
        # rounds, observed). Checkpoint the 64-row direction per
        # round; the iteration then runs purely on the materialized
        # Gram (the recursive-CTE re-evaluation lesson, DataFrame
        # edition).
        v = (raw.crossJoin(F.broadcast(m))
                .select("j", F.expr("raw div d").alias("val"))
                .localCheckpoint())
    proj = (quant.join(F.broadcast(v), quant.i == v.j)
                 .groupBy("vec_id")
                 .agg(F.sum(F.col("q") * F.col("val")).alias("proj")))
    return proj.join(e.select("vec_id", "label"), "vec_id")


def _rank_normalize_components(spark: SparkSession, sf_dir: str):
    """Shared core of the rank-normalization family: the embeddings
    relation plus the exploded (vec_id, dim i, rank-1 numerator,
    n-1 denominator) relation. percent_rank is exactly
    (rank-1)/(n-1) on both engines, so the integer pair IS the exact
    normalized value in rational form."""
    from pyspark.sql import Window as W
    e = load(spark, sf_dir, "embeddings")
    comp = (e.select("vec_id", F.posexplode("embedding").alias("i0", "v0"))
             .select("vec_id", (F.col("i0") + 1).alias("i"),
                     F.col("v0").cast("double").alias("v")))
    w = W.partitionBy("i").orderBy("v")
    ranked = comp.select(
        "vec_id", "i",
        (F.rank().over(w) - F.lit(1)).cast("long").alias("num"),
        (F.count(F.lit(1)).over(
            W.partitionBy("i")) - F.lit(1)).cast("long").alias("denom"))
    return e, ranked


def embedding_rank_normalize_arrays(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """Array-returning rank-normalization API: per-vector
    ``normalized`` (array<double> of percent_rank values in dimension
    order). The registered driver-facing variant
    (``embedding_rank_normalize``) ships the exact integer rank
    numerators as a space-joined string instead, because the
    verification harness canonicalizes rows through pandas, which
    cannot hash list cells (CORRECTNESS_r04) — and double->string
    formatting differs across engines while long->string does not."""
    e, ranked = _rank_normalize_components(spark, sf_dir)
    pr = ranked.withColumn(
        "pr", F.col("num").cast("double") / F.col("denom").cast("double"))
    return (pr.groupBy("vec_id")
              .agg(F.transform(
                      F.array_sort(F.collect_list(F.struct("i", "pr"))),
                      lambda s: s["pr"]).alias("normalized"))
              .join(e.select("vec_id", "label"), "vec_id")
              .select("vec_id", "label", "normalized"))


@query(
    "embedding_rank_normalize",
    oracle="""
        WITH comp AS (
          SELECT vec_id,
                 generate_subscripts(embedding, 1) AS i,
                 CAST(unnest(embedding) AS DOUBLE) AS v
          FROM embeddings
        ),
        ranked AS (
          SELECT vec_id, i,
                 CAST(rank() OVER (PARTITION BY i ORDER BY v) - 1
                      AS BIGINT) AS num,
                 CAST(COUNT(*) OVER (PARTITION BY i) - 1
                      AS BIGINT) AS denom
          FROM comp
        )
        SELECT r.vec_id, ANY_VALUE(e.label) AS label,
               array_to_string(list(r.num ORDER BY r.i),
                               ' ') AS rank_nums,
               MAX(r.denom) AS denom
        FROM ranked r JOIN embeddings e USING (vec_id)
        GROUP BY r.vec_id
    """,
    doc="Per-dimension rank (quantile) normalization of the embedding "
        "matrix — the distribution-free rescaling used before "
        "mixing embedding sources with different scales. Exact "
        "percent_rank is (rank-1)/(n-1); the driver-facing output "
        "ships that ratio in EXACT rational form — per-dimension "
        "rank-1 numerators space-joined into ``rank_nums`` plus the "
        "shared ``denom`` — so the hash canonicalizer sees lossless "
        "integer text, never doubles or list cells "
        "(``embedding_rank_normalize_arrays`` is the array<double> "
        "API). Shape: explode to (dim, value), ONE hash exchange "
        "into 64 dim-partitions (equal-sized by construction — no "
        "skew), per-partition sort for exact ranks, then regroup per "
        "vector with position-sorted re-aggregation. The dim-partitioned "
        "window is the definitional form; the SCALE path is the "
        "value-range-bucketed twin (staged "
        "``embedding_rank_normalize_bucketed``: bounded 64 x 1024 "
        "offset cells + per-bucket row_number, no fixed-key window "
        "over data) — both plans, one exact answer.",
    tags=("similarity", "normalize", "window"),
)
def embedding_rank_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e, ranked = _rank_normalize_components(spark, sf_dir)
    return (ranked.groupBy("vec_id")
                  .agg(F.array_join(
                          F.transform(
                              F.array_sort(
                                  F.collect_list(F.struct("i", "num"))),
                              lambda s: s["num"].cast("string")),
                          " ").alias("rank_nums"),
                       F.max("denom").alias("denom"))
                  .join(e.select("vec_id", "label"), "vec_id")
                  .select("vec_id", "label", "rank_nums", "denom"))


@query(
    "knn_arrow_native",
    oracle=_KNN_ORACLE,
    doc="Arrow-native kNN via mapInArrow: the same brute-force search "
        "as knn_brute_force/knn_pandas_udf, but the worker consumes "
        "pyarrow RecordBatches directly — no pandas materialization "
        "between Arrow transport and numpy math, the lowest-overhead "
        "Python escape hatch Spark offers. Scoring uses cumsum "
        "(strictly sequential accumulation) so the values are "
        "bit-identical to the JVM zip_with/aggregate fold, the pandas "
        "variant, AND the DuckDB list_reduce oracle — three "
        "implementations, one exact answer.",
    tags=("similarity", "knn", "arrow"),
)
def knn_arrow_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import numpy as np
    import pyarrow as pa

    e = load(spark, sf_dir, "embeddings")
    qv = np.asarray(
        e.filter(F.col("vec_id") == QUERY_VEC_ID).first()["embedding"],
        dtype=np.float64)

    def score(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        q_norm = float(np.sqrt(np.cumsum(qv * qv)[-1]))
        for batch in batches:
            emb = batch.column("embedding")
            # FixedSizeList/List of float -> (n, d) float64 matrix.
            # flatten(), not .values: .values returns the raw child
            # buffer IGNORING the array's offset, which silently
            # shifts every row if a sliced batch ever arrives.
            flat = np.asarray(emb.flatten(), dtype=np.float64)
            mat = flat.reshape(len(batch), -1)
            dots = np.cumsum(mat * qv, axis=1)[:, -1]
            norms = np.sqrt(np.cumsum(mat * mat, axis=1)[:, -1])
            yield pa.RecordBatch.from_arrays(
                [batch.column("vec_id"), batch.column("label"),
                 pa.array(dots / (norms * q_norm), type=pa.float64())],
                names=["vec_id", "label", "cosine_sim"])

    return (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
         .select("vec_id", "label", "embedding")
         .mapInArrow(score, "vec_id long, label int, cosine_sim double")
         .orderBy(F.col("cosine_sim").desc(), "vec_id")
         .limit(10)
    )


# ------------------------------------------------------------ SemDedup

SEMDEDUP_TAU = 0.35  # within-cluster cosine above which a pair is a near-dup

# Exact-arithmetic SemDedup (Abbas et al. 2023, arXiv:2303.09540):
# cluster the embeddings with k-means so the quadratic pairwise-cosine
# step only ever runs WITHIN a cluster, then inside each cluster drop,
# from every near-duplicate pair, the member closer to the centroid —
# keeping the "outlier" preserves corpus diversity, which is the
# paper's keep rule. The published pipeline is exactly this shape
# (cluster -> within-cluster pairwise -> keep-one); clusters bound the
# n^2 term, which is what makes semantic dedup tractable at 100 TB.
#
# Verification strategy: the same fixed-point trick as
# ann_ivf_kmeans_fit — quantize once to BIGINT, assignment argmax and
# pair cosines become exact-integer dots passed through pointwise IEEE
# ops, so Spark and the unrolled-SQL oracle agree bit-for-bit and the
# whole operator (assignment + pair generation + keep rule) is
# hash-verified, not approximated.

_SEMDEDUP_ORACLE = f"""
    WITH eint AS (
      SELECT vec_id,
             list_transform(embedding,
               v -> CAST(FLOOR(CAST(v AS DOUBLE) * 1000.0) AS BIGINT)) AS ei
      FROM embeddings
    ),
    c0 AS (
      SELECT e.label AS cell, ei AS centroid
      FROM (SELECT label, ei, vec_id,
                   ROW_NUMBER() OVER (PARTITION BY label
                                      ORDER BY vec_id) AS rn
            FROM eint JOIN embeddings USING (vec_id)) e
      WHERE rn = 1
    ),
    assigned AS (
      SELECT vec_id, ei, cell,
             sc / SQRT(CAST({_sql_idot('ei', 'ei')} AS DOUBLE))
               AS centroid_sim
      FROM (
        SELECT e.vec_id, e.ei, c.cell,
               {_sql_kmeans_score('e', 'c')} AS sc,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_sql_kmeans_score('e', 'c')} DESC, c.cell
               ) AS rnk
        FROM eint e CROSS JOIN c0 c
      ) WHERE rnk = 1
    ),
    normed AS (
      SELECT vec_id, ei, cell, centroid_sim,
             SQRT(CAST({_sql_idot('ei', 'ei')} AS DOUBLE)) AS inorm
      FROM assigned
    ),
    dropped AS (
      SELECT DISTINCT x.cell,
             CASE WHEN x.centroid_sim > y.centroid_sim THEN x.vec_id
                  WHEN y.centroid_sim > x.centroid_sim THEN y.vec_id
                  ELSE y.vec_id END AS drop_id
      FROM normed x JOIN normed y
        ON x.cell = y.cell AND x.vec_id < y.vec_id
      WHERE CAST({_sql_idot('x.ei', 'y.ei')} AS DOUBLE)
            / (x.inorm * y.inorm) >= {SEMDEDUP_TAU}
    )
    SELECT a.cell,
           COUNT(*) AS n_vectors,
           CAST(COALESCE(MAX(d.n_dropped), 0) AS BIGINT) AS n_dropped,
           CAST(COUNT(*) - COALESCE(MAX(d.n_dropped), 0) AS BIGINT)
             AS n_kept
    FROM assigned a
    LEFT JOIN (SELECT cell, COUNT(*) AS n_dropped
               FROM dropped GROUP BY cell) d
      ON a.cell = d.cell
    GROUP BY a.cell
"""


@query(
    "semdedup_embedding_clusters",
    oracle=_SEMDEDUP_ORACLE,
    doc="SemDedup (cluster-blocked semantic dedup, arXiv:2303.09540): "
        "k-means cells bound the pairwise-cosine step to within-cluster "
        "pairs; each near-dup pair (cosine >= 0.35) drops its "
        "closer-to-centroid member, keeping the diversity outlier. "
        "Assignment is the zero-shuffle broadcast argmax shared with "
        "ann_ivf_search; the within-cell self-join is an equi-join on "
        "the cell id — the quadratic term is bounded by the largest "
        "cluster, which at 100 TB is controlled by raising k (the "
        "paper runs k ~ sqrt(n)). Whole operator runs in exact "
        "fixed-point arithmetic, hash-verified against an unrolled-SQL "
        "oracle. Output: per-cell population / dropped / kept counts.",
    tags=("dedup", "embedding", "semdedup", "kmeans"),
)
def semdedup_embedding_clusters(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", "label", F.expr(_QUANT).alias("ei"))
    from pyspark.sql import Window
    w_seed = Window.partitionBy("label").orderBy("vec_id")
    cents_tbl = (e.withColumn("rn", F.row_number().over(w_seed))
                   .filter(F.col("rn") == 1)
                   .select(F.col("label").alias("cell"),
                           F.col("ei").alias("centroid")))
    cents = _collect_cents(cents_tbl).localCheckpoint()
    # centroid_sim is the true cosine to the assigned centroid: the
    # argmax score (dot/|c|) divided once more by |e| — the SAME
    # division order as the oracle so the doubles are bit-identical.
    assigned = (
        e.crossJoin(F.broadcast(cents))
         .withColumn("best", F.expr(_INT_BEST_CELL))
         .select(
             "vec_id", "ei",
             (-F.col("best.negcell")).alias("cell"),
             F.sqrt(_idot("ei", "ei").cast("double")).alias("inorm"),
             F.col("best.sim").alias("sc"))
         .withColumn("centroid_sim", F.col("sc") / F.col("inorm"))
         # lazy cut: the corpus-sized assignment computes ONCE at the
         # first action and is shared by all consumers (pairs x2 +
         # summary) — eager=True here would run the full argmax job at
         # plan-construction time (gen_plans, plan gates, every bench
         # build) and pin the blocks before any action needs them.
         .localCheckpoint(eager=False))
    a = assigned.select(F.col("vec_id").alias("vid_a"), "cell",
                        F.col("ei").alias("ei_a"),
                        F.col("inorm").alias("inorm_a"),
                        F.col("centroid_sim").alias("csim_a"))
    b = assigned.select(F.col("vec_id").alias("vid_b"), "cell",
                        F.col("ei").alias("ei_b"),
                        F.col("inorm").alias("inorm_b"),
                        F.col("centroid_sim").alias("csim_b"))
    pairs = (
        a.join(b, "cell")
         .filter(F.col("vid_a") < F.col("vid_b"))
         .withColumn("pair_sim",
                     _idot("ei_a", "ei_b").cast("double")
                     / (F.col("inorm_a") * F.col("inorm_b")))
         .filter(F.col("pair_sim") >= F.lit(SEMDEDUP_TAU)))
    dropped = (
        pairs.select(
            "cell",
            F.when(F.col("csim_a") > F.col("csim_b"), F.col("vid_a"))
             .when(F.col("csim_b") > F.col("csim_a"), F.col("vid_b"))
             .otherwise(F.col("vid_b")).alias("drop_id"))
        .distinct()
        .groupBy("cell").agg(F.count(F.lit(1)).alias("n_dropped")))
    return (
        assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("n_vectors"))
                .join(dropped, "cell", "left")
                .select("cell", "n_vectors",
                        F.coalesce("n_dropped", F.lit(0)).alias("n_dropped"),
                        (F.col("n_vectors")
                         - F.coalesce("n_dropped", F.lit(0))).alias("n_kept"))
    )


# ---------------------------------- product quantization (PQ) ADC search

PQ_M = 4        # subspaces (64-dim -> 4 x 16-dim subvectors)
PQ_SUB = 16     # dimensions per subspace
PQ_K = 16       # codebook size per subspace: seeds are the subvectors
                # of vec_id 0..15 (deterministic; a trained codebook
                # would Lloyd's-iterate these, cf. ann_ivf_kmeans_fit)


def _sq_expr(a: str, b: str) -> str:
    """Sequential-fold squared L2 distance (bit-deterministic)."""
    return (f"aggregate(zip_with({a}, {b}, (x, y) ->"
            f" (cast(x as double) - cast(y as double))"
            f" * (cast(x as double) - cast(y as double))),"
            f" 0D, (acc, v) -> acc + v)")


def _sql_sq(a: str, b: str) -> str:
    return (f"list_reduce(list_prepend(0.0, list_transform("
            f"generate_series(1, len({a})),"
            f" i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))"
            f" * (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)))),"
            f" (acc, v) -> acc + v)")


def _pq_sub(col: str, m: int) -> str:
    """The m-th (1-based) 16-dim subvector slice expression."""
    return f"slice({col}, {(m - 1) * PQ_SUB + 1}, {PQ_SUB})"


_PQ_ORACLE = f"""
    WITH m_axis AS (
      SELECT unnest(generate_series(1, {PQ_M})) AS m
    ), seeds AS (
      SELECT s.vec_id AS code, m.m,
             s.embedding[(m.m - 1) * {PQ_SUB} + 1 : m.m * {PQ_SUB}]
               AS cent
      FROM embeddings s, m_axis m WHERE s.vec_id < {PQ_K}
    ), sub AS (
      SELECT e.vec_id, e.label, m.m,
             e.embedding[(m.m - 1) * {PQ_SUB} + 1 : m.m * {PQ_SUB}]
               AS sv
      FROM embeddings e, m_axis m
    ), codes AS (
      -- per (vector, subspace): nearest codebook entry, earliest code
      -- on an exact tie (matches the Spark fold's strict <)
      SELECT vec_id, label, m, code FROM (
        SELECT sub.vec_id, sub.label, sub.m, seeds.code,
               ROW_NUMBER() OVER (
                 PARTITION BY sub.vec_id, sub.m
                 ORDER BY {_sql_sq('sub.sv', 'seeds.cent')}, seeds.code
               ) AS rnk
        FROM sub JOIN seeds USING (m)
      ) WHERE rnk = 1
    ), qtab AS (
      -- the query's distance table: query subvector -> each codebook
      -- entry, the table ADC sums over
      SELECT seeds.m, seeds.code, {_sql_sq('q.sv', 'seeds.cent')} AS d
      FROM (SELECT m, sv FROM sub WHERE vec_id = {QUERY_VEC_ID}) q
      JOIN seeds USING (m)
    )
    SELECT vec_id, label, adc_dist FROM (
      SELECT c.vec_id, MAX(c.label) AS label,
             -- m-ordered sequential sum == the Spark 4-term sum
             list_reduce(list_prepend(0.0,
               list(q.d ORDER BY c.m)), (acc, v) -> acc + v)
               AS adc_dist
      FROM codes c JOIN qtab q USING (m, code)
      WHERE c.vec_id <> {QUERY_VEC_ID}
      GROUP BY c.vec_id
    ) ORDER BY adc_dist, vec_id LIMIT 10
"""


@query(
    "ann_pq_adc_search",
    oracle=_PQ_ORACLE,
    doc="Product-quantization ANN with asymmetric distance computation "
        "(Jegou, Douze, Schmid, 'Product Quantization for Nearest "
        "Neighbor Search', TPAMI 2011): each 64-dim vector is encoded "
        f"as {PQ_M} codebook ids ({PQ_M} bytes vs 256 -- the memory "
        "compression that lets a 100 TB corpus's index live in RAM), "
        "and the query scores candidates as the sum of its "
        "per-subspace distances to each CODE's centroid, never to the "
        "raw vector. Codebooks here are deterministic seeds (the "
        f"subvectors of vec_id 0..{PQ_K - 1}; a production fit runs "
        "Lloyd's per subspace exactly as ann_ivf_kmeans_fit does). "
        "Plan shape: the 16x4 codebook collapses to ONE broadcast row; "
        "encode + table-lookup + ADC sum are pure expressions over a "
        "single corpus scan and the top-k is TakeOrderedAndProject -- "
        "zero shuffle, like ann_ivf_search. Every distance is a "
        "sequential double fold so Spark and DuckDB agree "
        "bit-for-bit; argmin ties keep the earliest code on both "
        "engines.",
    tags=("similarity", "ann", "pq"),
)
def ann_pq_adc_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    seeds = (e.filter(F.col("vec_id") < PQ_K)
              .groupBy()
              .agg(F.sort_array(F.collect_list(
                   F.struct("vec_id", "embedding"))).alias("seeds")))
    qrow = (e.filter(F.col("vec_id") == QUERY_VEC_ID)
             .select(F.col("embedding").alias("qv")))

    scored = (e.filter(F.col("vec_id") != QUERY_VEC_ID)
               .crossJoin(F.broadcast(seeds))
               .crossJoin(F.broadcast(qrow)))
    adc_terms = []
    for m in range(1, PQ_M + 1):
        sub_v = _pq_sub("embedding", m)
        sub_c = _pq_sub("s.embedding", m)
        # each (seed, subspace) distance is computed exactly ONCE
        # (zip_with materializes the 16 scored structs), then one fold
        # picks the argmin; strict < keeps the EARLIEST position on
        # ties. The code is the seed's 1-based array POSITION, not its
        # vec_id: seeds are sorted by vec_id, so position is a
        # monotone relabeling of the oracle's vec_id codes (same
        # argmin, same centroid) with no hidden contiguity contract —
        # a seed set with gaps still looks up the right centroid.
        code = (f"aggregate("
                f"zip_with(seeds, sequence(1, size(seeds)), (s, i) ->"
                f" named_struct('d', {_sq_expr(sub_v, sub_c)},"
                f" 'i', i)),"
                f" named_struct('d', cast('Infinity' as double),"
                f" 'i', -1),"
                f" (acc, x) -> CASE WHEN x.d < acc.d"
                f" THEN x ELSE acc END,"
                f" acc -> acc.i)")
        # ADC term: query subvector -> the chosen code's centroid
        cent = f"element_at(seeds, ({code})).embedding"
        adc_terms.append(
            f"({_sq_expr(_pq_sub('qv', m), _pq_sub(cent, m))})")
    adc = " + ".join(adc_terms)  # fixed m order: deterministic sum
    return (scored.select("vec_id", "label",
                          F.expr(adc).alias("adc_dist"))
                  .orderBy("adc_dist", "vec_id").limit(10))


# ------------------------------------------------ ANN recall audit

RECALL_K = 10
RECALL_QUERY_MOD = 100   # deterministic query set: vec_id % 100 == 0


@query(
    "ann_recall_audit",
    oracle=f"""
        WITH q AS (
          SELECT vec_id AS qid, embedding AS qv,
                 {_sql_bucket('embedding')} AS qbucket
          FROM embeddings WHERE vec_id % {RECALL_QUERY_MOD} = 0
        ),
        scored AS (
          SELECT q.qid, e.vec_id,
                 {sql_cosine('e.embedding', 'q.qv')} AS sim,
                 CASE WHEN {_sql_bucket('e.embedding')} = q.qbucket
                      THEN 1 ELSE 0 END AS in_bucket
          FROM embeddings e CROSS JOIN q
          WHERE e.vec_id <> q.qid
        ),
        ranked AS (
          SELECT qid, in_bucket,
                 ROW_NUMBER() OVER (PARTITION BY qid
                                    ORDER BY sim DESC, vec_id)
                   AS rk_exact,
                 ROW_NUMBER() OVER (PARTITION BY qid, in_bucket
                                    ORDER BY sim DESC, vec_id)
                   AS rk_bucket
          FROM scored
        )
        SELECT qid,
               CAST(SUM(CASE WHEN rk_exact <= {RECALL_K}
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
               CAST(SUM(CASE WHEN in_bucket = 1
                              AND rk_bucket <= {RECALL_K}
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_approx,
               CAST(SUM(CASE WHEN rk_exact <= {RECALL_K}
                              AND in_bucket = 1
                              AND rk_bucket <= {RECALL_K}
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
               CAST(SUM(CASE WHEN rk_exact <= {RECALL_K}
                              AND in_bucket = 1
                              AND rk_bucket <= {RECALL_K}
                             THEN 1 ELSE 0 END) AS DOUBLE)
                 / {RECALL_K}.0 AS recall
        FROM ranked GROUP BY qid
    """,
    doc="Recall@k audit of the sign-LSH index against exact brute "
        "force, batched over a deterministic query set (vec_id % 100) "
        "— the evaluation harness that turns ANN from 'fast' into "
        "'measurably good enough'. SINGLE-PASS shape: one broadcast "
        "of the tiny query set scores every (vector, query) pair "
        "once, then TWO rank windows over the same relation — exact "
        "rank per query, bucket-restricted rank per (query, "
        "in-bucket) — and the intersection count is a plain "
        "conditional aggregate, because both top-k sets are subsets "
        "of the same rows. No self-join, no recomputation of the "
        "fold-heavy scoring subtree (the naive two-branch + join "
        "formulation doubled the 64-flop-per-pair scoring AND added "
        "a SortMergeJoin; the per-query sort this buys instead costs "
        "log-factor compares, strictly cheaper). Scale bound: the "
        "scored relation is |queries| x corpus, so the audit's query "
        "sample — not the corpus — is the knob that sizes the one "
        "exchange.",
    tags=("similarity", "knn", "lsh", "evaluation"),
)
def ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
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
    # ONE window spec for both ranks (r11, guide §2.4): the bucket
    # rank among in-bucket rows equals the RUNNING SUM of in_bucket
    # over the same (qid, sim DESC, vec_id) order, so the former
    # second window (partitioned by qid+in_bucket — a second full
    # exchange + sort of the n x |q| pair stream) folds into the same
    # WindowExec; plan shows 1 Exchange/Sort for the window stage
    # instead of 2.
    we = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
    ranked = (scored.withColumn("rk_exact", F.row_number().over(we))
                    .withColumn("rk_bucket",
                                F.sum("in_bucket").over(
                                    we.rowsBetween(
                                        Window.unboundedPreceding, 0))))
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


# ----------------------------------- centroid assignment confidence

# the exact fixed-point centroid construction lives with
# embedding_label_centroids (queries/analytics.py); its scale constant
# is the contract both the oracle and the Spark plan share
from de_project_airflow_etl_spark.queries.analytics import CENT_SCALE  # noqa: E402


@query(
    "centroid_assignment_margin",
    oracle=f"""
        WITH d AS (
          SELECT label, i AS dim,
                 CAST(FLOOR(CAST(embedding[i] AS DOUBLE)
                            * {CENT_SCALE}.0) AS BIGINT) AS v
          FROM embeddings,
               UNNEST(generate_series(1, len(embedding))) AS s(i)
        ),
        n AS (
          SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs
          FROM embeddings GROUP BY label
        ),
        g AS (
          SELECT label, dim, SUM(v) AS s FROM d GROUP BY label, dim
        ),
        c AS (
          SELECT g.label AS clabel, g.dim,
                 CAST(g.s AS DOUBLE)
                   / ({CENT_SCALE}.0 * CAST(n.n_vecs AS DOUBLE)) AS cv
          FROM g JOIN n USING (label)
        ),
        dist AS (
          SELECT e.vec_id, e.label, c.clabel,
                 list_reduce(
                   list_prepend(CAST(0 AS DOUBLE),
                     list((CAST(e.embedding[c.dim] AS DOUBLE) - c.cv)
                          * (CAST(e.embedding[c.dim] AS DOUBLE) - c.cv)
                          ORDER BY c.dim)),
                   (acc, x) -> acc + x) AS d2
          FROM embeddings e CROSS JOIN c
          GROUP BY e.vec_id, e.label, c.clabel, e.embedding
        )
        SELECT vec_id, ANY_VALUE(label) AS label,
               (list(clabel ORDER BY d2, clabel))[1] AS best_label,
               (list(d2 ORDER BY d2, clabel))[1] AS best_dist,
               (list(clabel ORDER BY d2, clabel))[2] AS second_label,
               (list(d2 ORDER BY d2, clabel))[2]
                 - (list(d2 ORDER BY d2, clabel))[1] AS margin
        FROM dist GROUP BY vec_id
    """,
    doc="Cluster-assignment confidence: squared distance from every "
        "vector to its nearest and second-nearest label centroid, and "
        "the margin between them — the semdedup/active-learning "
        "confidence signal (small margin = ambiguous assignment). "
        "Centroids reuse the exact fixed-point construction of "
        "embedding_label_centroids (integer partial sums, one final "
        "division), so both engines hold bit-identical centroids; "
        "distances fold (x-c)^2 in dimension order with the knn "
        "discipline, and the margin subtracts two such identical "
        "doubles. Plan: the |labels| x dims centroid relation "
        "broadcasts onto the vectors; best/second selection is ONE "
        "sorted-array aggregation over the |labels|-bounded candidate "
        "list per vector (min-by semantics on (d2, label) structs) — "
        "no rank window, no self-join, the centroid subtree built "
        "exactly once.",
    tags=("similarity", "clustering", "evaluation"),
)
def centroid_assignment_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de_project_airflow_etl_spark.queries.analytics import (
        embedding_label_centroids_arrays,
    )
    e = load(spark, sf_dir, "embeddings")
    cent = (embedding_label_centroids_arrays(spark, sf_dir)
            .select(F.col("label").alias("clabel"), "centroid"))
    dist = (e.crossJoin(F.broadcast(cent))
             .select("vec_id", "label", "clabel",
                     F.expr(
                         "aggregate(zip_with(embedding, centroid, "
                         "(x, c) -> (CAST(x AS DOUBLE) - c) "
                         "* (CAST(x AS DOUBLE) - c)), "
                         "CAST(0 AS DOUBLE), (acc, v) -> acc + v)")
                      .alias("d2")))
    top2 = (dist.groupBy("vec_id")
                .agg(F.any_value("label").alias("label"),
                     F.slice(F.array_sort(
                         F.collect_list(F.struct("d2", "clabel"))),
                         1, 2).alias("t2")))
    return top2.select(
        "vec_id", "label",
        F.element_at("t2", 1)["clabel"].alias("best_label"),
        F.element_at("t2", 1)["d2"].alias("best_dist"),
        F.element_at("t2", 2)["clabel"].alias("second_label"),
        (F.element_at("t2", 2)["d2"] - F.element_at("t2", 1)["d2"])
            .alias("margin"))
