"""Text analysis over the ``documents`` table: token stats, quality
scoring, language ID (stopword heuristic), fingerprinting.

Everything is expression-level (split / higher-order functions / md5)
— whole-stage-codegen'd, no Python per row, embarrassingly parallel at
100 TB (pure map, zero shuffles except final aggregates).

Determinism: token arithmetic is integer; ratios are a single double
division (IEEE-identical on both engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from de_project_airflow_etl_spark.registry import query
from de_project_airflow_etl_spark.tables import fan_out, load

# Tiny deterministic stopword lists per language for the heuristic
# language scorer. The point is the *operator shape* (vocabulary-overlap
# scoring), not linguistic accuracy.
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "on"),
    "es": ("el", "la", "de", "y", "en", "es", "un", "una"),
    "fr": ("le", "la", "de", "et", "en", "est", "un", "une"),
    "de": ("der", "die", "das", "und", "in", "ist", "ein", "eine"),
}


def _tokens(col: str = "text") -> Column:
    return F.split(F.col(col), " ")


def _sql_in_list(words: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in words)


@query(
    "text_token_stats",
    oracle="""
        SELECT doc_id,
               LENGTH(text) AS n_chars,
               len(string_split(text, ' ')) AS n_tokens,
               len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
               CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                 / len(string_split(text, ' ')) AS distinct_ratio,
               CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
                 / len(string_split(text, ' ')) AS avg_token_len
        FROM documents
    """,
    doc="Token counting + lexical-diversity stats (whitespace tokenizer).",
    tags=("text",),
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = _tokens()
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        n_tokens.alias("n_tokens"),
        n_distinct.alias("n_distinct_tokens"),
        (n_distinct.cast("double") / n_tokens).alias("distinct_ratio"),
        (F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double")
         / n_tokens).alias("avg_token_len"),
    )


@query(
    "text_quality_score",
    oracle="""
        WITH t AS (
          SELECT doc_id, lang,
                 len(string_split(text, ' ')) AS n_tokens,
                 len(list_distinct(string_split(text, ' '))) AS n_distinct,
                 LENGTH(text) AS n_chars
          FROM documents
        )
        SELECT doc_id, lang, n_tokens,
               (CASE WHEN n_tokens BETWEEN 20 AND 1000 THEN 40 ELSE 0 END
                + CASE WHEN n_chars >= 100 THEN 30 ELSE 0 END
                + CAST(ROUND(30.0 * n_distinct / n_tokens) AS INT)) AS quality_score
        FROM t
    """,
    doc="Heuristic quality score: length gates + lexical diversity "
        "(integer-valued, engine-portable).",
    tags=("text",),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = _tokens()
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    n_chars = F.length("text")
    score = (
        F.when(n_tokens.between(20, 1000), 40).otherwise(0)
        + F.when(n_chars >= 100, 30).otherwise(0)
        + F.round(F.lit(30.0) * n_distinct / n_tokens).cast("int")
    )
    return d.select("doc_id", "lang", n_tokens.alias("n_tokens"),
                    score.alias("quality_score"))


def _stopword_hits(toks: Column, words: tuple[str, ...]) -> Column:
    lit_arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(lit_arr, t)))


@query(
    "text_lang_id",
    oracle=f"""
        WITH t AS (
          SELECT doc_id, lang,
                 string_split(text, ' ') AS toks,
                 len(string_split(text, ' ')) AS n_tokens
          FROM documents
        ), scored AS (
          SELECT doc_id, lang, n_tokens,
                 len(list_filter(toks, x -> x IN ({_sql_in_list(STOPWORDS['en'])}))) AS hits_en,
                 len(list_filter(toks, x -> x IN ({_sql_in_list(STOPWORDS['es'])}))) AS hits_es,
                 len(list_filter(toks, x -> x IN ({_sql_in_list(STOPWORDS['fr'])}))) AS hits_fr,
                 len(list_filter(toks, x -> x IN ({_sql_in_list(STOPWORDS['de'])}))) AS hits_de
          FROM t
        )
        SELECT doc_id, lang,
               CASE GREATEST(hits_en, hits_es, hits_fr, hits_de)
                 WHEN 0 THEN 'unknown'
                 WHEN hits_en THEN 'en'
                 WHEN hits_es THEN 'es'
                 WHEN hits_fr THEN 'fr'
                 ELSE 'de' END AS predicted_lang,
               CAST(GREATEST(hits_en, hits_es, hits_fr, hits_de) AS DOUBLE)
                 / n_tokens AS stopword_ratio
        FROM scored
    """,
    doc="Language ID via stopword-overlap scoring (argmax with a fixed "
        "precedence order for ties).",
    tags=("text", "langid"),
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = _tokens()
    hits = {lang: _stopword_hits(toks, words) for lang, words in STOPWORDS.items()}
    best = F.greatest(*hits.values())
    pred = (
        F.when(best == 0, "unknown")
         .when(best == hits["en"], "en")
         .when(best == hits["es"], "es")
         .when(best == hits["fr"], "fr")
         .otherwise("de")
    )
    return d.select(
        "doc_id", "lang",
        pred.alias("predicted_lang"),
        (best.cast("double") / F.size(toks)).alias("stopword_ratio"),
    )


# BPE-style pre-tokenization: letter runs / digit runs / punctuation
# runs (ASCII classes only, so Java regex and RE2 agree byte-for-byte).
BPE_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]+"


@query(
    "text_regex_tokens",
    oracle=f"""
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_ws_tokens,
               len(regexp_extract_all(text, '{BPE_PATTERN}')) AS n_bpe_tokens,
               CAST(len(regexp_extract_all(text, '{BPE_PATTERN}')) AS DOUBLE)
                 / len(string_split(text, ' ')) AS bpe_per_word
        FROM documents
    """,
    doc="BPE-style pre-tokenization (letter/digit/punctuation runs) vs "
        "whitespace tokens — the token-count estimator an LLM data "
        "pipeline budgets with. Pure regexp_extract_all, codegen'd, "
        "zero shuffles.",
    tags=("text", "tokenize"),
)
def text_regex_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    n_ws = F.size(_tokens())
    n_bpe = F.size(F.regexp_extract_all("text", F.lit(BPE_PATTERN), F.lit(0)))
    return d.select(
        "doc_id",
        n_ws.alias("n_ws_tokens"),
        n_bpe.alias("n_bpe_tokens"),
        (n_bpe.cast("double") / n_ws).alias("bpe_per_word"),
    )


# Polynomial (Rabin-Karp) rolling-hash parameters — int64-safe:
# acc < P < 2^30, so acc*B + ascii < 2^36.
RH_BASE = 31
RH_MOD = 1_000_000_007
RH_WINDOW = 4  # tokens per k-gram for the winnowed fingerprint


@query(
    "text_rolling_hash",
    oracle=f"""
        WITH t AS (
          SELECT doc_id, text, string_split(text, ' ') AS toks
          FROM documents
        )
        SELECT doc_id,
               list_reduce(
                 list_prepend(CAST(0 AS BIGINT),
                              list_transform(string_split(text, ''), c -> ascii(c))),
                 (acc, x) -> (acc * {RH_BASE} + x) % {RH_MOD}) AS doc_hash,
               list_min(list_transform(
                 generate_series(1, len(toks) - {RH_WINDOW - 1}),
                 i -> list_reduce(
                        list_prepend(CAST(0 AS BIGINT),
                                     list_transform(
                                       string_split(array_to_string(toks[i:i+{RH_WINDOW - 1}], ' '), ''),
                                       c -> ascii(c))),
                        (acc, x) -> (acc * {RH_BASE} + x) % {RH_MOD})))
                 AS winnowed_min_hash
        FROM t
        WHERE len(toks) >= {RH_WINDOW}
    """,
    doc="Rolling-hash fingerprinting: a Rabin-Karp polynomial hash of "
        "the whole document plus the minimum k-gram hash (winnowing's "
        "min-sampling step) over 4-token windows. Integer arithmetic "
        "mod 1e9+7 — bit-identical across engines; at 100 TB this is "
        "the cheap candidate key a dedup cascade blocks on.",
    tags=("text", "fingerprint", "rolling-hash"),
)
def text_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(load(spark, sf_dir, "documents"), spark)
    doc_hash = F.expr(
        f"aggregate(transform(split(text, ''), c -> ascii(c)),"
        f" cast(0 as bigint),"
        f" (acc, x) -> (acc * {RH_BASE} + x) % {RH_MOD})")
    win_hash = F.expr(
        f"array_min(transform("
        f" sequence(1, size(toks) - {RH_WINDOW - 1}),"
        f" i -> aggregate("
        f"   transform(split(concat_ws(' ', slice(toks, i, {RH_WINDOW})), ''),"
        f"             c -> ascii(c)),"
        f"   cast(0 as bigint),"
        f"   (acc, x) -> (acc * {RH_BASE} + x) % {RH_MOD})))")
    return (
        d.withColumn("toks", _tokens())
         .filter(F.size("toks") >= RH_WINDOW)
         .select("doc_id",
                 doc_hash.alias("doc_hash"),
                 win_hash.alias("winnowed_min_hash"))
    )


@query(
    "text_tfidf_top_terms",
    oracle="""
        WITH toks AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS term
          FROM documents
        ),
        tf AS (
          SELECT doc_id, term, COUNT(*) AS tf
          FROM toks GROUP BY doc_id, term
        ),
        df AS (
          SELECT term, COUNT(*) AS df FROM tf GROUP BY term
        ),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
          SELECT t.doc_id, t.term, t.tf, d.df,
                 CAST(t.tf AS DOUBLE) * (SELECT n_docs FROM n) / d.df AS tfidf
          FROM tf t JOIN df d ON t.term = d.term
        )
        SELECT doc_id, term, tf, df, tfidf
        FROM (
          SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY doc_id
                   ORDER BY tfidf DESC, term) AS rn
          FROM scored
        )
        WHERE rn <= 3
    """,
    doc="TF-IDF term weighting, top-3 most characteristic terms per "
        "document. The document-frequency side is one global aggregate "
        "over the (doc, term) relation — at 100 TB this is the classic "
        "two-pass map-reduce: per-doc term counts (map-side combine), "
        "then a broadcast-joinable term->df table (vocabulary << "
        "corpus). The score keeps the raw N/df ratio instead of "
        "log(N/df): monotonically equivalent for ranking, and exact "
        "IEEE arithmetic on both engines (libm log differs at ulp "
        "level across engines). Deterministic tiebreak on term.",
    tags=("text", "tfidf"),
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(_tokens()).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df, "term")
          .crossJoin(F.broadcast(n_docs))
          .select("doc_id", "term", "tf", "df",
                  (F.col("tf").cast("double") * F.col("n_docs") / F.col("df"))
                   .alias("tfidf"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
              .filter(F.col("rn") <= 3)
              .select("doc_id", "term", "tf", "df", "tfidf")
    )


@query(
    "text_fingerprint",
    oracle="""
        SELECT doc_id,
               md5(text) AS exact_md5,
               md5(array_to_string(
                     list_sort(list_distinct(string_split(text, ' '))),
                     ' ')) AS shuffle_invariant_fingerprint
        FROM documents
    """,
    doc="Document fingerprinting: exact md5 + an order-invariant "
        "fingerprint (sorted distinct token set) that survives token "
        "shuffling — the cheap first stage of a dedup cascade.",
    tags=("text", "fingerprint"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = _tokens()
    return d.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("exact_md5"),
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks))).cast("binary"))
            .alias("shuffle_invariant_fingerprint"),
    )


# ----------------------------------------------------------- bigrams

TOP_BIGRAMS = 25


@query(
    "text_bigram_counts",
    oracle=f"""
        WITH toks AS (
          SELECT string_split(text, ' ') AS t FROM documents
        ),
        grams AS (
          SELECT UNNEST(list_transform(generate_series(1, len(t) - 1),
                                       i -> t[i] || ' ' || t[i + 1])) AS bigram
          FROM toks
        )
        SELECT bigram, COUNT(*) AS cnt
        FROM grams
        GROUP BY bigram
        ORDER BY cnt DESC, bigram
        LIMIT {TOP_BIGRAMS}
    """,
    doc="Corpus bigram counts (top-25, tie-broken on the bigram for "
        "determinism) — the n-gram language-model building block. "
        "Bigrams come from zip_with over two shifted slices of the "
        "token array (pure expression, whole-stage codegen); the "
        "count+top-k is a hash aggregate feeding TakeOrderedAndProject "
        "— per-partition heaps, no global sort, so the reduce side "
        "moves k rows per partition regardless of corpus size.",
    tags=("text", "ngram", "aggregate"),
)
def text_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    grams = docs.select(
        F.explode(F.expr(
            "zip_with(slice(split(text, ' '), 1, size(split(text, ' ')) - 1),"
            "         slice(split(text, ' '), 2, size(split(text, ' ')) - 1),"
            "         (a, b) -> concat(a, ' ', b))"
        )).alias("bigram"))
    return (grams.groupBy("bigram")
                 .agg(F.count(F.lit(1)).alias("cnt"))
                 .orderBy(F.col("cnt").desc(), F.col("bigram"))
                 .limit(TOP_BIGRAMS))


@query(
    "redact_pii_documents",
    oracle="""
        SELECT doc_id,
               regexp_replace(text, '[0-9]+', '#', 'g') AS redacted,
               CAST(len(regexp_extract_all(text, '[0-9]+')) AS INT)
                 AS n_redactions
        FROM documents
        WHERE doc_id < 500
    """,
    doc="PII scrubbing pass for a training corpus: numeric spans "
        "(account numbers, phone digits, ids) are redacted with a "
        "regex both engines implement identically, and the redaction "
        "count per document is kept for the audit trail. Pure "
        "expression-level map — zero shuffle, whole-stage codegen; "
        "at 100 TB this runs at scan bandwidth. Real deployments "
        "swap in the full PII pattern set (emails, SSNs, addresses) "
        "— the plan shape is identical.",
    tags=("text", "quality", "redaction"),
)
def redact_pii_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    return d.select(
        "doc_id",
        F.regexp_replace("text", "[0-9]+", "#").alias("redacted"),
        F.size(F.expr("regexp_extract_all(text, '[0-9]+')"))
         .alias("n_redactions"))


# --------------------------------------------- lang-id evaluation


def _lang_id_oracle() -> str:
    """The registered text_lang_id oracle, reused verbatim as a CTE so
    the confusion matrix audits EXACTLY the classifier the registry
    ships (one source of truth for the stopword heuristic)."""
    from de_project_airflow_etl_spark.registry import _REGISTRY
    return _REGISTRY["text_lang_id"].oracle


@query(
    "lang_id_confusion_matrix",
    oracle=f"""
        WITH pred AS ({_lang_id_oracle()}),
        m AS (
          SELECT lang, predicted_lang,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM pred GROUP BY lang, predicted_lang
        ),
        t AS (
          SELECT lang, CAST(SUM(n) AS BIGINT) AS n_true FROM m
          GROUP BY lang
        )
        SELECT m.lang, m.predicted_lang, m.n, t.n_true,
               CAST(m.n AS DOUBLE) / CAST(t.n_true AS DOUBLE)
                 AS row_share
        FROM m JOIN t USING (lang)
    """,
    doc="Confusion matrix of the shipped stopword language classifier "
        "against the labeled lang column — the evaluation-harness "
        "query that turns text_lang_id from a transform into a "
        "measured model. Reuses the registered classifier (same "
        "function on the Spark side, same oracle SQL as a CTE on the "
        "DuckDB side) so the audit can never drift from what it "
        "audits. The matrix is bounded by |languages|^2; row_share "
        "divides identical exact longs.",
    tags=("text", "langid", "evaluation"),
)
def lang_id_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    pred = text_lang_id(spark, sf_dir)
    m = (pred.groupBy("lang", "predicted_lang")
             .agg(F.count(F.lit(1)).alias("n")))
    t = m.groupBy("lang").agg(F.sum("n").alias("n_true"))
    return (m.join(F.broadcast(t), "lang")
             .select("lang", "predicted_lang", "n", "n_true",
                     (F.col("n").cast("double")
                      / F.col("n_true").cast("double")).alias("row_share")))
