"""Corpus-level statistics operators: cross-document boilerplate
detection, vocabulary / out-of-vocabulary analysis, and scalable
global ordering for curriculum schedules.

These are the corpus-WIDE counterparts of ``operators/quality.py``
(whose statistics are per-document expressions): each operator here
needs one or two corpus-scale aggregation passes, and the point of
the implementation is that those passes stay linear — an inverted
index (gram -> doc frequency) or a top-k vocabulary, never a
document x document comparison.

* ``boilerplate_ngram_stats`` — the C4/RefinedWeb boilerplate rule
  re-expressed at n-gram granularity (the synthetic corpus has no
  line structure): a 5-gram occurring in >=2 distinct documents is
  boilerplate; documents dominated by such grams get flagged. Shape:
  explode distinct grams, one doc-frequency hash aggregate, one
  broadcast-able join back — O(total grams), map-side combinable.
* ``vocab_oov_stats`` — top-k vocabulary by global token frequency
  (TakeOrderedAndProject, never a full sort), then per-document OOV
  rates via a broadcast left join of the exploded tokens against the
  k-row vocabulary.
* ``curriculum_global_rank`` — a TOTAL ordering of the corpus (for
  curriculum/length-bucketed training schedules) without the naive
  single-partition global window: range-repartition on the sort key,
  count rows per range, prefix-sum the (tiny) per-partition counts,
  and add the broadcast offset to each range's local row_number.
  Work per partition is local; the only global object is the
  #partitions-row offset table.

Determinism: flags use integer cross-multiplication (``n_boiler * 5
>= n_grams`` for a 0.2 threshold) instead of double division, and
vocabulary tie-breaks are pinned by (count DESC, token ASC), so the
DuckDB oracles match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from de_project_airflow_etl_spark.registry import query
from de_project_airflow_etl_spark.tables import load

# ------------------------------------------------- boilerplate grams

GRAM_N = 5          # n-gram width
BOILER_MIN_DF = 2   # grams in >= this many docs are boilerplate
# flag a doc when boilerplate grams are >= 1/5 of its distinct grams
BOILER_FRAC_NUM, BOILER_FRAC_DEN = 1, 5

# Distinct 5-grams per document, as an expression (no UDF): guard the
# sequence bound because Spark's sequence(1, n) DESCENDS when n < 1.
_GRAMS_EXPR = f"""
    CASE WHEN size(split(text, ' ')) >= {GRAM_N}
         THEN array_distinct(transform(
                sequence(1, size(split(text, ' ')) - {GRAM_N - 1}),
                i -> array_join(slice(split(text, ' '), i, {GRAM_N}), ' ')))
         ELSE array() END
"""

_SQL_GRAMS = f"""
    docs_g AS (
      SELECT doc_id, source,
             list_distinct(list_transform(
               range(1, len(string_split(text, ' ')) - {GRAM_N - 2}),
               i -> array_to_string(
                      list_slice(string_split(text, ' '), i, i + {GRAM_N - 1}),
                      ' '))) AS grams
      FROM documents
    ),
    exploded AS (
      SELECT doc_id, source, unnest(grams) AS gram FROM docs_g
    ),
    boiler AS (
      SELECT gram FROM exploded GROUP BY gram
      HAVING COUNT(*) >= {BOILER_MIN_DF}
    )
"""


@query(
    "boilerplate_ngram_stats",
    oracle=f"""
        WITH {_SQL_GRAMS},
        per_doc AS (
          SELECT e.doc_id, e.source,
                 COUNT(*) AS n_grams,
                 SUM(CASE WHEN b.gram IS NULL THEN 0 ELSE 1 END) AS n_boiler
          FROM exploded e LEFT JOIN boiler b USING (gram)
          GROUP BY 1, 2
        )
        SELECT source,
               COUNT(*) AS n_docs,
               CAST(SUM(n_grams) AS BIGINT) AS sum_grams,
               CAST(SUM(n_boiler) AS BIGINT) AS sum_boiler_grams,
               CAST(SUM(CASE WHEN n_boiler * {BOILER_FRAC_DEN}
                             >= n_grams * {BOILER_FRAC_NUM}
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
        FROM per_doc
        GROUP BY source
    """,
    doc="C4/RefinedWeb-style cross-document boilerplate detection at "
        "5-gram granularity: grams present in >=2 distinct documents "
        "are boilerplate; documents where they make up >=20% of "
        "distinct grams are flagged, reported per source. One "
        "doc-frequency hash aggregate over the exploded gram inverted "
        "index + one equi-join back — linear in total grams, never "
        "doc x doc. Triage caveat: the Spark side counts grams by "
        "xxhash64 code (8-byte shuffle keys) while the oracle counts "
        "exact strings — a 64-bit hash collision would merge two "
        "grams' doc counts and surface as an oracle mismatch HERE, "
        "not as a code bug (none exist at test scales; expected only "
        "near ~10^10 distinct grams).",
    tags=("curation", "boilerplate", "dedup"),
)
def boilerplate_ngram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    # The gram explode feeds BOTH the doc-frequency aggregate and
    # the per-doc probe side, so it executes twice. Deliberate:
    # materializing it (localCheckpoint) measured ~50% SLOWER at
    # bench scale — the explode is cheap codegen while the
    # checkpoint pays serialize+store+read of the widened relation.
    # At 100 TB the tokenized/gram relation would be a persisted
    # lake table shared by all corpus statistics, not an in-job
    # checkpoint.
    # Grams are xxhash64-coded at the explode (r10 optimization, the
    # corpus_release_manifest / C4 hashed-n-gram trick): the gate only
    # needs gram EQUALITY (df counting + join-back), so the two
    # exchanges move 8-byte longs instead of ~30-byte 5-gram strings.
    # A 64-bit collision would merge two grams' doc counts; at
    # testdata scale none exist (the string-gram oracle stays exact),
    # and at 10^11 distinct grams the expected handful perturbs a
    # boilerplate FRACTION threshold, not an exact id set.
    exploded = docs.select("doc_id", "source",
                           F.explode(F.expr(
                               f"transform({_GRAMS_EXPR},"
                               f" g -> xxhash64(g))")).alias("gram"))
    # Doc frequency per gram; grams were already distinct-ed per doc,
    # so COUNT(*) == COUNT(DISTINCT doc_id) without the distinct pass.
    boiler = (exploded.groupBy("gram")
                      .agg(F.count(F.lit(1)).alias("df"))
                      .filter(F.col("df") >= BOILER_MIN_DF)
                      .select("gram"))
    per_doc = (exploded
               # boilerplate grams are a small fraction of the gram
               # space; the join stays an equi-join on gram either way
               # and AQE picks broadcast when boiler fits.
               .join(boiler.withColumn("is_boiler", F.lit(1)),
                     "gram", "left")
               .groupBy("doc_id", "source")
               .agg(F.count(F.lit(1)).alias("n_grams"),
                    F.sum(F.coalesce("is_boiler", F.lit(0))).alias("n_boiler")))
    return (per_doc.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_grams").alias("sum_grams"),
                 F.sum("n_boiler").alias("sum_boiler_grams"),
                 F.sum(F.when(F.col("n_boiler") * BOILER_FRAC_DEN
                              >= F.col("n_grams") * BOILER_FRAC_NUM, 1)
                        .otherwise(0)).alias("n_flagged")))


# ------------------------------------------------------- vocab / OOV

VOCAB_K = 20          # vocabulary size (top tokens by corpus frequency)
HIGH_OOV_NUM, HIGH_OOV_DEN = 1, 2   # "high OOV" = oov rate >= 1/2


@query(
    "vocab_oov_stats",
    oracle=f"""
        WITH toks AS (
          SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
          FROM documents
        ),
        vocab AS (
          SELECT tok FROM toks GROUP BY tok
          ORDER BY COUNT(*) DESC, tok LIMIT {VOCAB_K}
        ),
        per_doc AS (
          SELECT t.doc_id, t.lang,
                 COUNT(*) AS n_tok,
                 SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS n_oov
          FROM toks t LEFT JOIN vocab v USING (tok)
          GROUP BY 1, 2
        )
        SELECT lang,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS sum_tokens,
               CAST(SUM(n_oov) AS BIGINT) AS sum_oov,
               CAST(SUM(CASE WHEN n_oov * {HIGH_OOV_DEN}
                             >= n_tok * {HIGH_OOV_NUM}
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_high_oov
        FROM per_doc
        GROUP BY lang
    """,
    doc="Top-20 corpus vocabulary by global token frequency (ties "
        "pinned by token; TakeOrderedAndProject, no full sort), then "
        "per-document out-of-vocabulary rates via a broadcast left "
        "join of exploded tokens against the 20-row vocabulary — the "
        "coverage check run before committing to a tokenizer vocab.",
    tags=("curation", "vocab", "text"),
)
def vocab_oov_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    # referenced by the vocabulary count AND the per-doc probe;
    # recompute beats materialization here (see the note in
    # boilerplate_ngram_stats)
    toks = docs.select("doc_id", "lang",
                       F.explode(F.split("text", " ")).alias("tok"))
    vocab = (toks.groupBy("tok")
                 .agg(F.count(F.lit(1)).alias("c"))
                 .orderBy(F.desc("c"), F.asc("tok"))
                 .limit(VOCAB_K)
                 .select("tok"))
    per_doc = (toks.join(F.broadcast(vocab.withColumn("in_vocab", F.lit(1))),
                         "tok", "left")
                   .groupBy("doc_id", "lang")
                   .agg(F.count(F.lit(1)).alias("n_tok"),
                        F.sum(F.when(F.col("in_vocab").isNull(), 1)
                               .otherwise(0)).alias("n_oov")))
    return (per_doc.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tok").alias("sum_tokens"),
                 F.sum("n_oov").alias("sum_oov"),
                 F.sum(F.when(F.col("n_oov") * HIGH_OOV_DEN
                              >= F.col("n_tok") * HIGH_OOV_NUM, 1)
                        .otherwise(0)).alias("n_high_oov")))


# ------------------------------------------- global curriculum rank


@query(
    "curriculum_global_rank",
    oracle="""
        SELECT doc_id, n_chars,
               ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id)
                 AS global_rank
        FROM documents
    """,
    doc="Total corpus ordering (longest documents first — a "
        "length-curriculum schedule) computed scalably: bucket rows "
        "by VALUE range on the sort key (a deterministic pure "
        "function of the row — unlike repartitionByRange, whose "
        "sampled boundaries can differ between re-executions of the "
        "same subtree), count rows per bucket, prefix-sum the tiny "
        "per-bucket counts, and add the broadcast offset to each "
        "bucket's local row_number. The naive row_number() OVER "
        "(ORDER BY ...) funnels the whole corpus through one "
        "partition; here every full-data exchange is hash(bucket)-"
        "partitioned and the only single-partition object is the "
        "bounded offset table. Long-tailed or point-mass length "
        "distributions get an adaptive second-level re-split "
        "(shared helper: queries/util.py::global_row_number) so no "
        "bucket's sort task degenerates to the whole corpus.",
    tags=("curation", "ordering", "scale"),
)
def curriculum_global_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Shared distributed-rank core (queries/util.py::global_row_number):
    # value-range buckets + broadcast prefix-sum offsets + per-bucket
    # row_number, with the adaptive oversize re-split for long-tailed /
    # point-mass value distributions. One implementation serves this
    # query and the RFM distributed ntile.
    from de_project_airflow_etl_spark.queries.util import global_row_number
    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    # adaptive=False: document length is a bounded-range, roughly
    # spread axis, so the single-level bucketing suffices and the
    # re-split pass (one extra full-data aggregate) is skipped; the
    # adaptive variant is what the RFM long-tailed axes use.
    return (global_row_number(docs, "n_chars", "doc_id", "global_rank",
                              descending=True, adaptive=False)
            .select("doc_id", "n_chars", "global_rank"))


# ------------------------------------------------- token id encoding


def tokenize_to_ids_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-returning tokenize API: per-document ``token_ids``
    (array<long>, token order preserved) plus token/OOV counts. The
    registered driver-facing variant (``tokenize_to_ids``) serializes
    the id sequence to a space-joined string because the verification
    harness canonicalizes rows through pandas, which cannot hash list
    cells (CORRECTNESS_r04); this function is the shape a pipeline
    composes with (e.g. ``pack_sequences`` consumes id arrays)."""
    docs = load(spark, sf_dir, "documents")
    # recompute-over-materialize: see boilerplate_ngram_stats note
    toks = docs.select("doc_id",
                       F.posexplode(F.split("text", " "))
                        .alias("pos", "tok"))
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    # rank only the K surviving rows: TakeOrdered bounds the input, so
    # the single-partition row_number window sees 20 rows, not the
    # (possibly millions-entry) distinct-token space.
    vocab = (counts.orderBy(F.desc("c"), F.asc("tok")).limit(VOCAB_K)
                   .withColumn("tok_id",
                               F.row_number().over(
                                   Window.orderBy(F.desc("c"), F.asc("tok")))
                                .cast("long"))
                   .select("tok", "tok_id"))
    ids = (toks.join(F.broadcast(vocab), "tok", "left")
               .withColumn("tid", F.coalesce("tok_id", F.lit(0)).cast("long")))
    return (ids.groupBy("doc_id")
               .agg(F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "tid"))),
                        lambda s: s["tid"]).alias("token_ids"),
                    F.count(F.lit(1)).alias("n_tokens"),
                    F.sum(F.when(F.col("tok_id").isNull(), 1)
                           .otherwise(0)).alias("n_oov")))


@query(
    "tokenize_to_ids",
    oracle=f"""
        WITH toks AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                 generate_subscripts(string_split(text, ' '), 1) AS pos
          FROM documents
        ),
        counts AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
        vocab AS (
          SELECT tok, ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS tok_id
          FROM counts ORDER BY c DESC, tok LIMIT {VOCAB_K}
        )
        SELECT t.doc_id,
               array_to_string(list(COALESCE(v.tok_id, 0) ORDER BY t.pos),
                               ' ') AS token_ids_str,
               COUNT(*) AS n_tokens,
               CAST(SUM(CASE WHEN v.tok_id IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_oov
        FROM toks t LEFT JOIN vocab v USING (tok)
        GROUP BY t.doc_id
    """,
    doc="Vocabulary-id encoding (the tokenize step a training pipeline "
        "runs after committing to a vocab): token ids are frequency "
        "ranks over the top-20 vocabulary (ties pinned by token), OOV "
        "maps to id 0, and per-document id sequences preserve token "
        "order via position-sorted re-aggregation. The vocabulary is "
        "TakeOrderedAndProject + a 20-row window (never a corpus-wide "
        "rank), then broadcast onto the exploded tokens; the only "
        "corpus-scale exchange is the per-document regroup. Driver "
        "contract: the id sequence ships as a space-joined STRING "
        "(ids are exact longs, so the text form is lossless and "
        "hash-canonicalizable); ``tokenize_to_ids_arrays`` is the "
        "array-typed API the pipeline composes with.",
    tags=("curation", "tokenize", "vocab"),
)
def tokenize_to_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    arr = tokenize_to_ids_arrays(spark, sf_dir)
    # array_join over longs needs an explicit element cast (concat_ws /
    # array_join accept only string arrays); the join itself is a
    # zero-shuffle projection on top of the regrouped relation.
    return arr.select(
        "doc_id",
        F.array_join(
            F.transform("token_ids", lambda x: x.cast("string")),
            " ").alias("token_ids_str"),
        "n_tokens", "n_oov")


# ------------------------------------------------ source scorecard


@query(
    "source_quality_scorecard",
    oracle=f"""
        WITH rep AS (
          SELECT doc_id, source,
                 len(string_split(text, ' ')) AS n_tokens,
                 len(list_distinct(string_split(text, ' '))) AS n_distinct,
                 (len(list_distinct(string_split(text, ' ')))
                    / len(string_split(text, ' ')) >= 0.55
                  AND list_max(list_transform(
                        list_distinct(string_split(text, ' ')),
                        w -> len(list_filter(string_split(text, ' '),
                                             x -> x = w))))
                      / len(string_split(text, ' ')) <= 0.12) AS keep
          FROM documents
        ),
        {_SQL_GRAMS},
        per_doc_b AS (
          SELECT e.doc_id, COUNT(*) AS n_grams,
                 SUM(CASE WHEN b.gram IS NULL THEN 0 ELSE 1 END) AS n_boiler
          FROM exploded e LEFT JOIN boiler b USING (gram)
          GROUP BY 1
        ),
        toks AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok
          FROM documents
        ),
        vocab AS (
          SELECT tok FROM toks GROUP BY tok
          ORDER BY COUNT(*) DESC, tok LIMIT {VOCAB_K}
        ),
        oov AS (
          SELECT t.doc_id,
                 SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS n_oov
          FROM toks t LEFT JOIN vocab v USING (tok)
          GROUP BY 1
        )
        SELECT r.source,
               COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN r.keep THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_repetition_keep,
               CAST(SUM(r.n_tokens) AS BIGINT) AS sum_tokens,
               CAST(SUM(r.n_distinct) AS BIGINT) AS sum_distinct_tokens,
               CAST(SUM(COALESCE(pb.n_boiler, 0)) AS BIGINT)
                 AS sum_boiler_grams,
               CAST(SUM(COALESCE(pb.n_grams, 0)) AS BIGINT) AS sum_grams,
               CAST(SUM(o.n_oov) AS BIGINT) AS sum_oov
        FROM rep r
        LEFT JOIN per_doc_b pb USING (doc_id)
        JOIN oov o USING (doc_id)
        GROUP BY r.source
    """,
    doc="Per-source quality scorecard — the report a curation team "
        "reads to decide which sources to keep, composing three "
        "already-verified per-document relations in one pass each: "
        "repetition keep-rate (gopher thresholds), boilerplate gram "
        "fractions (cross-doc df inverted index), and OOV sums "
        "against the top-20 vocabulary. All integer sums, so the "
        "per-source rollup is exact; rates are left to the reader "
        "(ratios of exact integers) rather than averaged doubles.",
    tags=("curation", "quality", "report"),
)
def source_quality_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de_project_airflow_etl_spark.operators.quality import (
        repetition_stats_plan,
    )
    docs = load(spark, sf_dir, "documents")
    rep = (repetition_stats_plan(docs)
           .join(docs.select("doc_id", "source"), "doc_id")
           .select("doc_id", "source", "n_tokens", "n_distinct", "keep"))
    exploded = docs.select("doc_id",
                           F.explode(F.expr(_GRAMS_EXPR)).alias("gram"))
    # NOTE (round 6): checkpointing boiler+vocab here regressed the
    # sf0.1 bench 4.8x — the eager keep-list materializations cost
    # more than the two extra linear document passes they save, and
    # the gram keep-list is gram-vocabulary-sized (expensive to store
    # at scale). The re-derive-per-reference shape is deliberate.
    boiler = (exploded.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
                      .filter(F.col("df") >= BOILER_MIN_DF).select("gram"))
    per_doc_b = (exploded.join(boiler.withColumn("b", F.lit(1)),
                               "gram", "left")
                 .groupBy("doc_id")
                 .agg(F.count(F.lit(1)).alias("n_grams"),
                      F.sum(F.coalesce("b", F.lit(0))).alias("n_boiler")))
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    vocab = (toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
                 .orderBy(F.desc("c"), F.asc("tok")).limit(VOCAB_K)
                 .select("tok"))
    oov = (toks.join(F.broadcast(vocab.withColumn("v", F.lit(1))),
                     "tok", "left")
               .groupBy("doc_id")
               .agg(F.sum(F.when(F.col("v").isNull(), 1).otherwise(0))
                     .alias("n_oov")))
    return (rep.join(per_doc_b, "doc_id", "left")
               .join(oov, "doc_id")
               .groupBy("source")
               .agg(F.count(F.lit(1)).alias("n_docs"),
                    F.sum(F.when(F.col("keep"), 1).otherwise(0))
                     .alias("n_repetition_keep"),
                    F.sum("n_tokens").alias("sum_tokens"),
                    F.sum("n_distinct").alias("sum_distinct_tokens"),
                    F.sum(F.coalesce("n_boiler", F.lit(0)))
                     .alias("sum_boiler_grams"),
                    F.sum(F.coalesce("n_grams", F.lit(0)))
                     .alias("sum_grams"),
                    F.sum("n_oov").alias("sum_oov")))


# --------------------------------------- language-mix diversity


@query(
    "language_diversity_by_source",
    oracle="""
        WITH c AS (
          SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
          FROM documents GROUP BY source, lang
        )
        SELECT source,
               CAST(SUM(n) AS BIGINT) AS n_docs,
               CAST(COUNT(*) AS BIGINT) AS n_langs,
               CAST(SUM(CAST(n AS HUGEINT) * n) AS BIGINT) AS sum_sq,
               1.0 - CAST(CAST(SUM(CAST(n AS HUGEINT) * n) AS VARCHAR)
                          AS DOUBLE)
                   / CAST(CAST(CAST(SUM(n) AS HUGEINT) * SUM(n)
                               AS VARCHAR) AS DOUBLE) AS simpson_index,
               CAST(CAST(CAST(SUM(n) AS HUGEINT) * SUM(n) AS VARCHAR)
                    AS DOUBLE)
                 / CAST(CAST(SUM(CAST(n AS HUGEINT) * n) AS VARCHAR)
                        AS DOUBLE)
                   AS effective_langs
        FROM c GROUP BY source
    """,
    doc="Language-mix diversity per source: the Gini-Simpson index "
        "1 - sum(p_i^2) and the effective number of languages "
        "1/sum(p_i^2) (inverse Simpson) — the mixture-health metrics "
        "a multilingual curation pipeline tracks per source. Simpson "
        "is chosen over Shannon entropy DELIBERATELY: it is a "
        "rational function of the counts, so sum_sq accumulates as "
        "exact longs and the two final divisions see identical "
        "operands on both engines — whereas ln() is a transcendental "
        "whose JVM (Math.log) and libm implementations disagree in "
        "the last ulp (measured at sf0.1), making entropy "
        "unverifiable bit-exactly. One (source, lang) aggregate, one "
        "bounded regroup; shuffle volume is |sources| x |langs|.",
    tags=("corpus", "diversity", "mixture"),
)
def language_diversity_by_source(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    c = (d.groupBy("source", "lang")
          .agg(F.count(F.lit(1)).alias("n")))
    # counts can be corpus-sized at scale: BOTH quadratic terms —
    # sum(n^2) and n_docs^2 — go through DECIMAL(38,0), and wide-int
    # -> double rides the CAST(CAST(x AS STRING) AS DOUBLE) route
    # (exact decimal string, identical nearest-double parse on both
    # engines) so nothing ANSI-aborts past 2^63.
    sq_dec = "CAST(CAST(sum_sq_dec AS STRING) AS DOUBLE)"
    nd_dec = ("CAST(CAST(CAST(n_docs AS DECIMAL(38,0)) * n_docs "
              "AS STRING) AS DOUBLE)")
    return (c.groupBy("source")
             .agg(F.sum("n").alias("n_docs"),
                  F.count(F.lit(1)).alias("n_langs"),
                  F.sum((F.col("n").cast("decimal(38,0)") * F.col("n")))
                   .alias("sum_sq_dec"))
             .select("source", "n_docs", "n_langs",
                     F.col("sum_sq_dec").cast("long").alias("sum_sq"),
                     F.expr(f"1.0 - {sq_dec} / {nd_dec}")
                      .alias("simpson_index"),
                     F.expr(f"{nd_dec} / {sq_dec}")
                      .alias("effective_langs")))
