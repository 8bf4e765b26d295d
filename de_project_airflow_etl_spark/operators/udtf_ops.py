"""Python UDTF surface (Spark 4 user-defined table functions).

A UDTF is the row→table escape hatch the reference's pandas code never
needed but a generalized engine must offer: one input row expands to
N output rows with full Python logic, usable from SQL via LATERAL.

``split_sentences`` is deliberately SQL-expressible (split on '. ') so
the UDTF execution path itself — registration, lateral join, row
fan-out, schema — is oracle-verified; real deployments swap in a
proper sentence segmenter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

from de_project_airflow_etl_spark.registry import query
from de_project_airflow_etl_spark.tables import register_views


@udtf(returnType="sentence_idx int, sentence string, n_words int")
class SplitSentences:
    """doc text -> one row per '. '-separated sentence."""

    def eval(self, text: str):
        if text is None:
            return
        for i, s in enumerate(text.split(". ")):
            yield i, s, len(s.split(" "))


@query(
    "udtf_split_sentences",
    oracle="""
        WITH s AS (
          SELECT doc_id,
                 unnest(string_split(text, '. ')) AS sentence,
                 generate_subscripts(string_split(text, '. '), 1) - 1
                   AS sentence_idx
          FROM documents
        )
        SELECT doc_id, sentence_idx, sentence,
               len(string_split(sentence, ' ')) AS n_words
        FROM s
    """,
    doc="Python UDTF (Spark 4): per-document sentence fan-out through a "
        "LATERAL table function. The splitter is SQL-expressible on "
        "purpose so the UDTF plumbing (registration, lateral join, "
        "multi-row yield, schema) is oracle-checked; swap in a real "
        "segmenter for production.",
    tags=("udtf", "text"),
)
def udtf_split_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.udtf.register("split_sentences", SplitSentences)
    register_views(spark, sf_dir, ("documents",))
    return spark.sql("""
        SELECT d.doc_id, s.sentence_idx, s.sentence, s.n_words
        FROM documents d,
             LATERAL split_sentences(d.text) s
    """)
