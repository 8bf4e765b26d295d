"""Document-quality operators in the Gopher/C4 filtering tradition:
per-document repetition statistics, repeated-token normalization, and
BPE-style pair-frequency mining.

These complement ``operators/text.py`` (token stats, language ID,
quality score) with the *repetition* family of filters — the rules a
pretraining pipeline runs to drop boilerplate-heavy and degenerate
documents (Rae et al., "Scaling Language Models: ... Gopher", §A.2
publishes the canonical rule set; this module re-expresses the shape
of those rules over the ``documents`` table).

Scale design: every per-document statistic here is a pure expression
over the row's own token array — no explode, no shuffle, whole-stage
codegen end-to-end. That is deliberate: the naive formulation
(explode tokens, groupBy (doc, token), max count) costs two shuffles
of the full corpus; the lambda formulation costs zero because each
document's token list is small and bounded (a context-window-sized
text column), so O(tokens x distinct) per row beats O(corpus) network
exchange at 100 TB. The only shuffled operator in this module is the
corpus-wide pair count, which is a classic map-side-combinable
aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from de_project_airflow_etl_spark.registry import query
from de_project_airflow_etl_spark.tables import load

# --------------------------------------------- repetition statistics

# Rule thresholds, Gopher-style: drop documents whose vocabulary is
# too narrow (distinct ratio) or dominated by one token (top fraction).
MIN_DISTINCT_RATIO = 0.55
MAX_TOP_FRAC = 0.12


@query(
    "gopher_repetition_stats",
    oracle=f"""
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ), stats AS (
          SELECT doc_id,
                 len(t) AS n_tokens,
                 len(list_distinct(t)) AS n_distinct,
                 list_max(list_transform(list_distinct(t),
                   w -> len(list_filter(t, x -> x = w)))) AS top_token_count
          FROM toks
        )
        SELECT doc_id,
               CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(n_distinct AS BIGINT) AS n_distinct,
               CAST(top_token_count AS BIGINT) AS top_token_count,
               n_distinct / n_tokens AS distinct_ratio,
               top_token_count / n_tokens AS top_frac,
               (n_distinct / n_tokens >= {MIN_DISTINCT_RATIO}
                AND top_token_count / n_tokens <= {MAX_TOP_FRAC}) AS keep
        FROM stats
    """,
    doc="Gopher-style repetition filter: per-document distinct-token "
        "ratio and most-frequent-token fraction, plus the keep/drop "
        "verdict. Computed entirely as array-lambda expressions over "
        "each row's own token list — zero shuffles, zero explodes; "
        "O(tokens x distinct) per row in whole-stage codegen, vs the "
        "naive explode+groupBy formulation's two corpus-wide "
        "exchanges. The ratios are single IEEE divisions of the same "
        "integer operands on both engines, hence bit-identical.",
    tags=("quality", "repetition", "filter"),
)
def gopher_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    stats = d.select(
        "doc_id",
        F.expr("split(text, ' ')").alias("t"),
    ).select(
        "doc_id",
        F.expr("CAST(size(t) AS BIGINT)").alias("n_tokens"),
        F.expr("CAST(size(array_distinct(t)) AS BIGINT)").alias("n_distinct"),
        F.expr("CAST(array_max(transform(array_distinct(t), "
               "w -> size(filter(t, x -> x = w)))) AS BIGINT)")
         .alias("top_token_count"),
    )
    ratio = F.expr("CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE)")
    top = F.expr("CAST(top_token_count AS DOUBLE) / CAST(n_tokens AS DOUBLE)")
    return stats.select(
        "doc_id", "n_tokens", "n_distinct", "top_token_count",
        ratio.alias("distinct_ratio"),
        top.alias("top_frac"),
        ((ratio >= F.lit(MIN_DISTINCT_RATIO))
         & (top <= F.lit(MAX_TOP_FRAC))).alias("keep"))


# ------------------------------------------ repeated-token collapse


@query(
    "collapse_repeated_tokens",
    oracle="""
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ), cleaned AS (
          SELECT doc_id, t,
                 list_filter(t, (x, i) -> i = 1 OR x <> t[i-1]) AS c
          FROM toks
        )
        SELECT doc_id,
               CAST(len(t) AS BIGINT) AS n_tokens,
               CAST(len(c) AS BIGINT) AS n_after,
               md5(array_to_string(c, ' ')) AS clean_md5
        FROM cleaned
    """,
    doc="Crawl-text normalization: collapse runs of consecutive "
        "identical tokens ('the the the' -> 'the'), the standard "
        "pre-dedup cleanup for scraped text. An index-aware array "
        "lambda (keep token i iff i == 0 or it differs from token "
        "i-1) — a stateless per-row map with no shuffle; the cleaned "
        "text is verified by md5 so the whole transformed string, not "
        "just its length, is the correctness surface.",
    tags=("quality", "normalize",),
)
def collapse_repeated_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.expr("split(text, ' ')").alias("t"))
         .select(
             "doc_id",
             F.expr("CAST(size(t) AS BIGINT)").alias("n_tokens"),
             F.expr("filter(t, (x, i) -> i = 0 OR NOT (x <=> element_at(t, i)))")
              .alias("c"))
         .select(
             "doc_id", "n_tokens",
             F.expr("CAST(size(c) AS BIGINT)").alias("n_after"),
             F.expr("md5(concat_ws(' ', c))").alias("clean_md5")))


# --------------------------------------------- BPE pair-frequency

TOP_PAIRS = 20


@query(
    "bpe_pair_counts",
    oracle=f"""
        WITH words AS (
          SELECT UNNEST(string_split(text, ' ')) AS w FROM documents
        ), pairs AS (
          SELECT UNNEST(list_transform(
                   generate_series(1, length(w) - 1),
                   i -> substring(w, i, 2))) AS pair
          FROM words WHERE length(w) >= 2
        )
        SELECT pair, COUNT(*) AS n_occurrences
        FROM pairs
        GROUP BY pair
        ORDER BY n_occurrences DESC, pair
        LIMIT {TOP_PAIRS}
    """,
    doc="BPE-style pair mining: the corpus-wide frequency of every "
        "adjacent character pair inside words, top-20 — the statistic "
        "the first merge step of byte-pair-encoding tokenizer "
        "training computes. Map-side-combinable count over exploded "
        "pairs (partial aggregation absorbs the explosion before the "
        "exchange), then a global top-k via TakeOrderedAndProject — "
        "no full sort. Deterministic under the (count DESC, pair) "
        "total order.",
    tags=("quality", "tokenizer", "bpe"),
)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    words = d.select(F.explode(F.split("text", " ")).alias("w"))
    pairs = (words.filter(F.length("w") >= 2)
                  .select(F.explode(F.expr(
                      "transform(sequence(1, length(w) - 1), "
                      "i -> substring(w, i, 2))")).alias("pair")))
    return (pairs.groupBy("pair")
                 .agg(F.count(F.lit(1)).alias("n_occurrences"))
                 .orderBy(F.desc("n_occurrences"), "pair")
                 .limit(TOP_PAIRS))
