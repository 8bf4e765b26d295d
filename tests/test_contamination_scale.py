"""Scale-shaped stress for contamination checking: 100k documents with
globally unique tokens (zero chance trigram collisions) except a
planted leak — every eval doc's full text is copied into its corpus
neighbor. The inverted-index join must report exactly the planted
(corpus, eval) pairs, each sharing exactly its 18 trigrams: no false
positives at 200x the sf0.01 corpus, no misses, same code path as the
registry query.
"""

from __future__ import annotations

import pytest

from de_project_airflow_etl_spark.operators.curation import (
    EVAL_MOD, contamination_check,
)

N_DOCS = 100_000
N_TOKENS = 20


@pytest.fixture()
def leaked_corpus(spark, tmp_path):
    """Tokens are unique per (seed, position), so two docs share a
    trigram iff they share a seed; corpus doc e+1 reuses eval doc e's
    seed -> the planted leak."""
    docs = spark.range(N_DOCS).selectExpr(
        "id AS doc_id",
        f"CASE WHEN id > 0 AND (id - 1) % {EVAL_MOD} = 0 "
        f"THEN id - 1 ELSE id END AS seed",
    ).selectExpr(
        "doc_id",
        f"concat_ws(' ', transform(sequence(0, {N_TOKENS - 1}), "
        f"j -> concat('t', seed, '_', j))) AS text",
        "'en' AS lang", "'synth' AS source",
    ).selectExpr("doc_id", "text", "lang", "source",
                 "length(text) AS n_chars")
    out = str(tmp_path / "documents.parquet")
    docs.write.mode("overwrite").parquet(out)
    return str(tmp_path)


def test_contamination_finds_exactly_the_planted_leaks(spark,
                                                       leaked_corpus):
    rows = contamination_check(spark, leaked_corpus).collect()
    found = {(r["doc_id"], r["eval_doc_id"]) for r in rows}
    planted = {(e + 1, e) for e in range(0, N_DOCS - 1, EVAL_MOD)}
    assert found == planted
    # full-text copies share all 18 distinct trigrams, nothing more
    assert {r["n_shared_ngrams"] for r in rows} == {N_TOKENS - 2}


# r11 test tiering: multi-minute sweep/scale/property module —
# excluded from the default (driver-budget) run; run with
# -m "slow or not slow" for the full signal (see pytest.ini).
pytestmark = pytest.mark.slow
