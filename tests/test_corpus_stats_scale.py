"""Scale-shaped stress for the round-3 corpus-stats operators, on the
same pattern as test_dedup_scale: synthetic corpora generated
DISTRIBUTED (spark.range + hash-derived content, no driver-side data)
with planted ground truth the operator must recover exactly.

* curriculum_global_rank over 1M rows: the produced ranking must be a
  permutation of 1..N whose every adjacent pair respects the
  (n_chars DESC, doc_id ASC) curriculum order — verified with a
  rank->rank+1 self-join, not a driver-side sort.
* boilerplate_ngram_stats over 100k docs: planted boilerplate class
  (identical text, all grams cross-doc) must be flagged wholesale;
  hash-unique class must produce zero flags.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

N_RANK = 1_000_000
N_BOILER_DOCS = 100_000
BOILER_EVERY = 10   # every 10th doc is the shared boilerplate text


def test_curriculum_rank_is_exact_total_order_at_1m(spark, tmp_path):
    docs = spark.range(N_RANK).selectExpr(
        "id AS doc_id",
        # pseudo-random lengths with heavy ties (only 1000 distinct
        # values) so the doc_id tiebreak path is exercised hard
        "pmod(hash(id), 1000) + 100 AS n_chars",
        "'x' AS text", "'en' AS lang", "'synth' AS source",
    )
    out = str(tmp_path)
    docs.write.mode("overwrite").parquet(f"{out}/documents.parquet")

    from de_project_airflow_etl_spark.operators.corpus_stats import (
        curriculum_global_rank,
    )
    ranked = curriculum_global_rank(spark, out).localCheckpoint()

    perm = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("global_rank").alias("mn"),
        F.max("global_rank").alias("mx"),
        F.countDistinct("global_rank").alias("nd")).first()
    assert (perm["n"], perm["mn"], perm["mx"], perm["nd"]) == (
        N_RANK, 1, N_RANK, N_RANK)

    nxt = ranked.select((F.col("global_rank") - 1).alias("global_rank"),
                        F.col("n_chars").alias("nc2"),
                        F.col("doc_id").alias("id2"))
    violations = (
        ranked.join(nxt, "global_rank")
              .filter(~((F.col("n_chars") > F.col("nc2"))
                        | ((F.col("n_chars") == F.col("nc2"))
                           & (F.col("doc_id") < F.col("id2")))))
              .count())
    assert violations == 0


@pytest.mark.parametrize("n_docs", [N_BOILER_DOCS])
def test_boilerplate_flags_exactly_the_planted_class(spark, tmp_path,
                                                     n_docs):
    # 500-token vocabulary -> 5-gram space 500^5 ~ 3e13, so gram
    # collisions between hash-unique docs are ~absent; boilerplate
    # docs all carry ONE identical 10-token text (a single distinct
    # gram, present in every boiler doc) and must be flagged to a doc.
    docs = spark.range(n_docs).selectExpr(
        "id AS doc_id",
        f"CASE WHEN id % {BOILER_EVERY} = 0 THEN "
        f"  concat_ws(' ', transform(sequence(0, 9), j -> 'shared'))"
        f" ELSE "
        f"  concat_ws(' ', transform(sequence(0, 19), j -> "
        f"    concat('tok', pmod(hash(id * 131 + j), 500))))"
        f" END AS text",
        "'en' AS lang",
        f"CASE WHEN id % {BOILER_EVERY} = 0 THEN 'boiler' "
        f"ELSE 'clean' END AS source",
    ).selectExpr("doc_id", "text", "lang", "source",
                 "length(text) AS n_chars")
    out = str(tmp_path)
    docs.write.mode("overwrite").parquet(f"{out}/documents.parquet")

    from de_project_airflow_etl_spark.operators.corpus_stats import (
        boilerplate_ngram_stats,
    )
    stats = {r["source"]: r
             for r in boilerplate_ngram_stats(spark, out).collect()}
    n_boiler_docs = len(range(0, n_docs, BOILER_EVERY))
    assert stats["boiler"]["n_docs"] == n_boiler_docs
    # identical text -> every gram appears in all boiler docs -> every
    # boiler doc is 100% boilerplate grams -> all flagged
    assert stats["boiler"]["n_flagged"] == n_boiler_docs
    assert (stats["boiler"]["sum_boiler_grams"]
            == stats["boiler"]["sum_grams"])
    # hash-unique docs: a doc would need >= 4 of its 16 grams shared
    # with another doc to be flagged — probability ~0 at this vocab
    assert stats["clean"]["n_flagged"] == 0


# r11 test tiering: multi-minute sweep/scale/property module —
# excluded from the default (driver-budget) run; run with
# -m "slow or not slow" for the full signal (see pytest.ini).
pytestmark = pytest.mark.slow
