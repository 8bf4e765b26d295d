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


@query(
    "udtf_user_gap_stats",
    oracle="""
        WITH gaps AS (
          SELECT user_id,
                 epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts) AS gap
          FROM events
        )
        SELECT user_id,
               COUNT(*) AS n_events,
               COALESCE(MAX(gap), 0) AS max_gap_us
        FROM gaps
        GROUP BY user_id
    """,
    doc="Polymorphic Python UDTF over a TABLE argument with "
        "PARTITION BY/ORDER BY (Spark 4): each partition (one user's "
        "ordered events) streams through eval(), terminate() emits the "
        "per-user summary — the escape hatch for per-group logic a "
        "window can't express, with the engine handling the shuffle "
        "and ordering. Gap arithmetic uses exact timedelta floor "
        "division (no float microseconds), so the result hash-matches "
        "the relational LAG-window oracle — the Python path is held to "
        "the same exactness bar as the built-ins.",
    tags=("udtf", "timeseries"),
)
def udtf_user_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datetime import timedelta

    @udtf(returnType="user_id bigint, n_events int, max_gap_us bigint")
    class GapStats:
        def __init__(self) -> None:
            self.user = None
            self.ts = []

        def eval(self, row) -> None:
            self.user = row["user_id"]
            self.ts.append(row["ts"])

        def terminate(self):
            if self.user is None:
                return
            ts = sorted(self.ts)
            us = timedelta(microseconds=1)
            gaps = [(b - a) // us for a, b in zip(ts, ts[1:])]
            yield self.user, len(ts), max(gaps) if gaps else 0

    spark.udtf.register("gap_stats", GapStats)
    register_views(spark, sf_dir, ("events",))
    return spark.sql("""
        SELECT * FROM gap_stats(TABLE(SELECT user_id, ts FROM events)
                                PARTITION BY user_id ORDER BY ts)
    """)


# ------------------- UDTF with analyze(): schema computed per call


@query(
    "udtf_props_dynamic_schema",
    oracle="""
        WITH typed AS (
          SELECT event_type,
                 CASE WHEN json_type(json_extract(props, '$.k'))
                        IN ('BIGINT', 'UBIGINT')
                      THEN TRY_CAST(json_extract(props, '$.k')
                                    AS BIGINT) END AS v_k,
                 CASE WHEN json_type(json_extract(props, '$.missing'))
                        IN ('BIGINT', 'UBIGINT')
                      THEN TRY_CAST(json_extract(props, '$.missing')
                                    AS BIGINT) END AS v_missing
          FROM events
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(v_k) AS BIGINT) AS sum_k,
               CAST(SUM(CASE WHEN v_missing IS NULL THEN 1 ELSE 0
                 END) AS BIGINT) AS n_missing
        FROM typed
        GROUP BY event_type
    """,
    doc="Polymorphic Python UDTF with a static analyze() (Spark 4): "
        "the OUTPUT SCHEMA is computed per call site from the "
        "constant keys argument — parse_props(props, 'k,missing') "
        "binds one BIGINT column per requested JSON key at analysis "
        "time, the table-function analog of from_json with a "
        "call-provided schema. The query requests one key present in "
        "every row and one absent (its column is all NULL), then "
        "aggregates — so the driver hash pins registration, the "
        "AnalyzeResult schema, per-row JSON extraction AND null "
        "semantics against a relational json_extract oracle. Plan: "
        "the UDTF runs in the scan's project (ArrowEvalPython "
        "batches); the aggregate above it is map-side combinable.",
    tags=("udtf", "sql-surface", "text"),
)
def udtf_props_dynamic_schema(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import AnalyzeArgument, AnalyzeResult
    from pyspark.sql.types import LongType, StructType

    @udtf
    class ParseProps:
        """JSON props + constant key list -> one typed column per
        key; schema decided by analyze() from the literal argument."""

        @staticmethod
        def analyze(props: AnalyzeArgument,
                    keys: AnalyzeArgument) -> AnalyzeResult:
            if not keys.isConstantExpression:
                raise ValueError("keys must be a constant string")
            schema = StructType()
            for k in str(keys.value).split(","):
                schema = schema.add(f"v_{k.strip()}", LongType())
            return AnalyzeResult(schema=schema)

        def eval(self, props: str, keys: str):
            import json
            try:
                d = json.loads(props) if props is not None else {}
            except ValueError:
                d = {}
            out = []
            for k in keys.split(","):
                v = d.get(k.strip())
                # exact integers only: JSON floats/booleans/strings map
                # to NULL, matching the oracle's json_type gate
                # (BIGINT/UBIGINT only) — a plain CAST would crash
                # DuckDB on 'true' and round '1.5' (ADVICE r7)
                out.append(v if isinstance(v, int)
                           and not isinstance(v, bool) else None)
            yield tuple(out)

    spark.udtf.register("parse_props", ParseProps)
    register_views(spark, sf_dir, ("events",))
    return spark.sql("""
        SELECT e.event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(p.v_k) AS BIGINT) AS sum_k,
               CAST(SUM(CASE WHEN p.v_missing IS NULL THEN 1 ELSE 0
                 END) AS BIGINT) AS n_missing
        FROM events e,
             LATERAL parse_props(e.props, 'k,missing') p
        GROUP BY e.event_type
    """)
