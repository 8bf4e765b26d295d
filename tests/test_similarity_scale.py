"""Scale-shaped stress for the similarity family: 100k synthetic
64-dim embeddings generated DISTRIBUTED, with an exact copy of the
query vector planted deep in the corpus. Both the O(n) brute-force
baseline and the sign-LSH bucketed path must rank the planted vector
first at cosine exactly 1.0 — the bucketed search because an identical
vector necessarily lands in the query's own bucket (the recall
guarantee the sketch gives for exact matches), 200x fewer candidates
notwithstanding.
"""

from __future__ import annotations

import pytest

from de_project_airflow_etl_spark.operators import similarity

N_VECS = 100_000
PLANTED_ID = 77_777  # exact copy of the query vector (vec_id 0)


@pytest.fixture()
def planted_embeddings(spark, tmp_path):
    vecs = spark.range(N_VECS).selectExpr(
        "id AS vec_id",
        f"CASE WHEN id = {PLANTED_ID} THEN 0 ELSE id END AS seed",
        "CAST(pmod(id, 10) AS INT) AS label",
    ).selectExpr(
        "vec_id", "label",
        "transform(sequence(0, 63), j -> "
        "CAST((pmod(hash(seed * 67 + j), 2001) - 1000) / 1000.0 AS FLOAT))"
        " AS embedding",
    ).select("vec_id", "embedding", "label")
    out = str(tmp_path / "embeddings.parquet")
    vecs.write.mode("overwrite").parquet(out)
    return str(tmp_path)


def test_planted_twin_tops_brute_force_and_lsh(spark, planted_embeddings):
    brute = similarity.knn_brute_force(spark, planted_embeddings).collect()
    assert brute[0]["vec_id"] == PLANTED_ID
    assert brute[0]["cosine_sim"] == 1.0
    # every other score is strictly below 1 (hash-random directions)
    assert all(r["cosine_sim"] < 1.0 for r in brute[1:])

    lsh = similarity.ann_lsh_search(spark, planted_embeddings).collect()
    assert lsh and lsh[0]["vec_id"] == PLANTED_ID
    assert lsh[0]["cosine_sim"] == 1.0


def test_ann_recall_vs_brute_force_at_100k(spark, planted_embeddings):
    """Explicit recall@k of every ANN path against the exact
    brute-force top-k at 100k vectors (data is hash-deterministic, so
    these recalls are fixed numbers, measured and pinned):

    * IVF single-probe: recall@5 = 1.0 here — the query's true
      neighbors all quantize into its own cell at this corpus;
    * IVF multi-probe (nprobe=3): recall@10 >= 0.9 (measured 1.0) —
      the recall lever the 100 TB deployment would turn;
    * sign-LSH: the planted twin is ALWAYS recalled (identical vector
      -> identical bucket, the sketch's hard guarantee); ambient
      recall@5 is bucket-limited (measured 0.2) and asserted only as
      twin-first + nonzero, since a 256-bucket prune that keeps exact
      matches is the documented trade."""
    brute = [r["vec_id"]
             for r in similarity.knn_brute_force(spark, planted_embeddings)
             .collect()]
    assert brute[0] == PLANTED_ID

    mp = [r["vec_id"]
          for r in similarity.ann_ivf_multiprobe(spark, planted_embeddings)
          .collect()]
    assert mp[0] == PLANTED_ID
    assert len(set(brute) & set(mp)) / 10 >= 0.9

    ivf = [r["vec_id"]
           for r in similarity.ann_ivf_search(spark, planted_embeddings)
           .collect()]
    assert ivf[0] == PLANTED_ID
    ivf_recall = len(set(brute[:5]) & set(ivf)) / 5
    assert ivf_recall >= 0.8, ivf_recall
    # multi-probe can only widen the candidate set -> recall must not
    # drop vs single-probe on the shared top-5
    assert len(set(brute[:5]) & set(mp)) / 5 >= ivf_recall

    lsh = [r["vec_id"]
           for r in similarity.ann_lsh_search(spark, planted_embeddings)
           .collect()]
    assert lsh[0] == PLANTED_ID
    assert len(set(brute[:5]) & set(lsh)) >= 1


N_PCA = 160_000   # above the pre-fix overflow bound (~1.4e5 vectors)
PCA_DIM = 64


def test_pca_power_iter_exact_at_160k_vectors(spark, tmp_path):
    """Unit-scale synthetic embeddings at 160k vectors: the ORIGINAL
    renormalization (raw * 1000 before the divide) would overflow
    int64 here and raise under ANSI; the divisor form must run AND
    stay exactly equal to a numpy fixed-point replica of the same
    integer algorithm (sign-corrected truncating division — numpy //
    floors, Spark div truncates)."""
    import numpy as np

    docs = spark.range(N_PCA).selectExpr(
        "id AS vec_id",
        f"transform(sequence(0, {PCA_DIM - 1}), j -> "
        f"  CAST((pmod(hash(id * 97 + j), 2001) - 1000) / 1000.0"
        f"       AS FLOAT)) AS embedding",
        "CAST(pmod(id, 4) AS INT) AS label",
    )
    out = str(tmp_path)
    docs.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")

    from de_project_airflow_etl_spark.operators.similarity import (
        PCA_ITERS, PCA_SCALE, embedding_pca_power_iter,
    )
    got = (embedding_pca_power_iter(spark, out)
           .orderBy("vec_id").toPandas())
    assert len(got) == N_PCA

    # numpy replica of the exact integer algorithm
    emb = (docs.selectExpr(
               "vec_id",
               f"transform(embedding, v -> CAST(FLOOR(CAST(v AS DOUBLE)"
               f" * {PCA_SCALE}) AS BIGINT)) AS q")
               .orderBy("vec_id").toPandas())
    q = np.stack(emb["q"].to_numpy()).astype(np.int64)
    gram = q.T @ q                                   # exact in int64
    v = np.full(PCA_DIM, PCA_SCALE, dtype=np.int64)

    def trunc_div(a: np.ndarray, d: int) -> np.ndarray:
        return np.sign(a) * (np.abs(a) // d)         # Spark div semantics

    for _ in range(PCA_ITERS):
        raw = gram @ v
        d = int(max(np.max(np.abs(raw)), 1)) // PCA_SCALE + 1
        v = trunc_div(raw, d)
    proj = q @ v
    assert np.array_equal(got["proj"].to_numpy(), proj)


# ----------------------------------------------------------- SemDedup

SEM_N = 4_000
SEM_TWINS = ((7, 2_777), (19, 3_191))  # (original, planted exact copy)


@pytest.fixture()
def semdedup_embeddings(spark, tmp_path):
    """4k hash-deterministic vectors with two exact-copy twins
    planted far from their originals."""
    case = " ".join(f"WHEN id = {copy} THEN {orig}"
                    for orig, copy in SEM_TWINS)
    vecs = spark.range(SEM_N).selectExpr(
        "id AS vec_id",
        f"CASE {case} ELSE id END AS seed",
        "CAST(pmod(id, 10) AS INT) AS label",
    ).selectExpr(
        "vec_id", "label",
        "transform(sequence(0, 63), j -> "
        "CAST((pmod(hash(seed * 67 + j), 2001) - 1000) / 1000.0 AS FLOAT))"
        " AS embedding",
    ).select("vec_id", "embedding", "label")
    out = str(tmp_path / "embeddings.parquet")
    vecs.write.mode("overwrite").parquet(out)
    return str(tmp_path)


def test_semdedup_drops_planted_twins_at_4k(spark, semdedup_embeddings):
    """Each planted exact copy shares its original's cell (identical
    vector -> identical argmax) and forms a cosine-1.0 pair, so
    SemDedup must drop at least one member per twin; population
    arithmetic must balance exactly. The within-cell pairwise step
    runs ~n^2/k comparisons — the quadratic term the clustering
    exists to bound (k scales as sqrt(n) in production)."""
    rows = (similarity.semdedup_embedding_clusters(spark,
                                                   semdedup_embeddings)
            .collect())
    assert sum(r["n_vectors"] for r in rows) == SEM_N
    assert all(r["n_kept"] + r["n_dropped"] == r["n_vectors"] for r in rows)
    assert sum(r["n_dropped"] for r in rows) >= len(SEM_TWINS)


def test_pq_adc_planted_twin_scores_minimum_at_100k(spark,
                                                 planted_embeddings):
    """The planted exact copy of the query scores the structural
    MINIMUM of the ADC function: its codes equal the query's own
    codes, so its distance is sum_m d(q_m, centroid(code_m(q))) — the
    smallest value ANY code assignment can produce. The robust
    assertion is therefore membership in the top-k AT the minimum
    score (another vector whose subvectors all quantize to the
    query's cells ties at the same value and may out-sort the twin on
    vec_id — a tie, not a miss). Runs the zero-shuffle expression
    path at 20x the bench corpus."""
    rows = similarity.ann_pq_adc_search(spark,
                                        planted_embeddings).collect()
    assert rows
    by_id = {r["vec_id"]: r["adc_dist"] for r in rows}
    assert PLANTED_ID in by_id
    assert by_id[PLANTED_ID] == rows[0]["adc_dist"]  # ties the minimum


# r11 test tiering: multi-minute sweep/scale/property module —
# excluded from the default (driver-budget) run; run with
# -m "slow or not slow" for the full signal (see pytest.ini).
pytestmark = pytest.mark.slow
