"""Scale-shaped stress for the MinHash-LSH dedup path: 100k synthetic
documents generated DISTRIBUTED (spark.range + hash-derived tokens, no
driver-side data), with planted exact near-duplicates. The banded-LSH
pipeline must recover exactly the planted pairs — no false positives
survive the Jaccard verify, no planted pair is missed — at 20x the
sf0.1 corpus size, on the same code path the registry query uses.
"""

from __future__ import annotations

import pytest

from de_project_airflow_etl_spark.operators import dedup

N_DOCS = 100_000
PLANT_EVERY = 1_000
VOCAB = " ".join(f"tok{k}" for k in range(50))


@pytest.fixture()
def planted_corpus(spark, tmp_path):
    """doc i gets 20 tokens derived from murmur hashes of a seed; every
    1000th doc reuses the previous doc's seed -> an exact duplicate."""
    docs = spark.range(N_DOCS).selectExpr(
        "id AS doc_id",
        f"CASE WHEN id % {PLANT_EVERY} = 0 AND id > 0 "
        f"THEN id - 1 ELSE id END AS seed",
    ).selectExpr(
        "doc_id",
        f"concat_ws(' ', transform(sequence(0, 19), j -> "
        f"element_at(split('{VOCAB}', ' '), "
        f"1 + pmod(hash(seed * 31 + j), 50)))) AS text",
        "'en' AS lang", "'synth' AS source",
    ).selectExpr("doc_id", "text", "lang", "source",
                 "length(text) AS n_chars")
    out = str(tmp_path / "documents.parquet")
    docs.write.mode("overwrite").parquet(out)
    yield str(tmp_path)
    dedup.clear_pairs_cache()


def test_lsh_recovers_exactly_the_planted_pairs(spark, planted_corpus):
    rows = dedup.dedup_minhash_lsh(spark, planted_corpus).collect()
    found = {(r["doc_a"], r["doc_b"]) for r in rows}
    planted = {(i - 1, i)
               for i in range(PLANT_EVERY, N_DOCS, PLANT_EVERY)}
    assert found == planted
    # planted docs are exact copies -> Jaccard exactly 1.0
    assert all(r["jaccard"] == 1.0 for r in rows)
    # and cluster resolution labels each pair with its min doc_id
    labels = {r["doc_id"]: r["component_id"]
              for r in dedup.dedup_clusters(spark, planted_corpus).collect()}
    assert len(labels) == 2 * len(planted)
    for a, b in planted:
        assert labels[a] == labels[b] == a
