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
