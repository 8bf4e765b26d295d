"""Capstone composition: an end-to-end LLM training-corpus prep
pipeline built ENTIRELY from this engine's registered operators —
quality gate -> exact dedup -> per-language token budget.

This is the shape a 100 TB data pipeline actually runs: each stage is
one of the already-verified operators (text_quality_score's gates,
dedup_exact's keep-lowest-id policy, text_token_stats' counting), and
the whole composition stays declarative — Catalyst fuses the quality
filter into the scan, the dedup is one hash shuffle, the budget
aggregate is map-side partial. The oracle recomputes the identical
cascade in SQL, so the *composition* (not just each piece) is
hash-verified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from de_project_airflow_etl_spark.registry import query
from de_project_airflow_etl_spark.tables import load

MIN_QUALITY = 60  # same scoring as text_quality_score


@query(
    "llm_corpus_prep",
    oracle="""
        WITH scored AS (
          SELECT doc_id, lang, text,
                 len(string_split(text, ' ')) AS n_tokens,
                 (CASE WHEN len(string_split(text, ' ')) BETWEEN 20 AND 1000
                       THEN 40 ELSE 0 END
                  + CASE WHEN LENGTH(text) >= 100 THEN 30 ELSE 0 END
                  + CAST(ROUND(30.0 * len(list_distinct(string_split(text, ' ')))
                               / len(string_split(text, ' '))) AS INT))
                   AS quality_score
          FROM documents
        ),
        quality AS (
          SELECT * FROM scored WHERE quality_score >= 60
        ),
        deduped AS (
          SELECT md5(text) AS content_hash,
                 MIN(doc_id) AS keep_doc_id,
                 MAX(lang) AS lang,            -- identical text => identical lang
                 MAX(n_tokens) AS n_tokens,
                 COUNT(*) AS n_copies
          FROM quality
          GROUP BY md5(text)
        )
        SELECT lang,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               CAST(SUM(n_copies - 1) AS BIGINT) AS n_dups_removed
        FROM deduped
        GROUP BY lang
    """,
    doc="Composite corpus-prep pipeline: quality gate (score >= 60) -> "
        "exact dedup (content hash, keep lowest doc_id) -> per-language "
        "token budget. Verifies that the engine's operators COMPOSE "
        "correctly under one optimizer pass, not just in isolation.",
    tags=("corpus", "dedup", "text", "composite"),
)
def llm_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    score = (
        F.when(n_tokens.between(20, 1000), 40).otherwise(0)
        + F.when(F.length("text") >= 100, 30).otherwise(0)
        + F.round(F.lit(30.0) * n_distinct / n_tokens).cast("int")
    )
    quality = (
        d.select("doc_id", "lang", "text", n_tokens.alias("n_tokens"),
                 score.alias("quality_score"))
         .filter(F.col("quality_score") >= MIN_QUALITY)
    )
    deduped = (
        quality.groupBy(F.md5(F.col("text").cast("binary")).alias("content_hash"))
               .agg(F.min("doc_id").alias("keep_doc_id"),
                    F.max("lang").alias("lang"),
                    F.max("n_tokens").alias("n_tokens"),
                    F.count(F.lit(1)).alias("n_copies"))
    )
    return (
        deduped.groupBy("lang")
               .agg(F.count(F.lit(1)).alias("n_docs"),
                    F.sum("n_tokens").alias("total_tokens"),
                    F.sum(F.col("n_copies") - 1).alias("n_dups_removed"))
    )
