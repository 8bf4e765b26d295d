"""Corpus curation operators for a large-scale training-data pipeline:
deterministic splits/sampling, context-window packing, benchmark
contamination checks, dataset profiling, and layout/EWMA utilities.

These extend the LLM-pipeline surface (dedup/text/similarity/corpus
modules) with the remaining operations a pretraining data pipeline
runs at 100 TB. Every operator is deterministic and oracle-checked:

* Randomness is replaced by content hashes (md5 of the key) — the
  standard trick for reproducible splits/samples across engines and
  re-runs: lexicographic comparison on fixed-width lowercase hex is
  numeric comparison, so a threshold string encodes a sampling rate
  exactly, with no RNG and no engine-specific ``rand()``.
* Sequential semantics (packing offsets, EWMA) are expressed as
  window cumulative sums / ordered folds whose operation order is
  pinned, so doubles and integers match the oracle bit-for-bit
  (EWMA uses alpha = 0.5: multiplying by 0.5 is exact in binary
  floating point, leaving the one rounding per step to the addition,
  which both engines perform in the same order).

Scale design: hash split/sample are stateless per-row maps (no
shuffle); packing is a per-source window (shuffle on source, the
shard key a real pipeline would already partition by); contamination
is an inverted-index equi-join on n-gram hashes (never corpus x eval
cross product); profiling is one aggregation pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from de_project_airflow_etl_spark.registry import query
from de_project_airflow_etl_spark.tables import load

# ------------------------------------------------------ hash splits


def _hex_threshold(rate: float) -> str:
    """8-hex-digit threshold encoding ``rate`` exactly: a doc is kept
    iff the first 8 hex chars of md5(key) compare below it."""
    return format(int(rate * 16 ** 8), "08x")


_TRAIN_THR = _hex_threshold(0.8)   # 'cccccccc'
_VAL_THR = _hex_threshold(0.9)     # 'e6666666'

_SPLIT_EXPR = f"""
    CASE WHEN substring(md5(CAST(doc_id AS STRING)), 1, 8) < '{_TRAIN_THR}'
         THEN 'train'
         WHEN substring(md5(CAST(doc_id AS STRING)), 1, 8) < '{_VAL_THR}'
         THEN 'val'
         ELSE 'test' END
"""

_SQL_SPLIT_EXPR = f"""
    CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '{_TRAIN_THR}'
         THEN 'train'
         WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '{_VAL_THR}'
         THEN 'val'
         ELSE 'test' END
"""


@query(
    "corpus_hash_split",
    oracle=f"""
        SELECT {_SQL_SPLIT_EXPR} AS split, lang,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM documents
        GROUP BY 1, 2
    """,
    doc="Deterministic 80/10/10 train/val/test split by md5(doc_id) "
        "hex threshold — reproducible across engines, re-runs, and "
        "cluster sizes; a stateless per-row map with no shuffle until "
        "the reporting aggregate. The per-(split, lang) histogram is "
        "the verification surface.",
    tags=("curation", "split", "hash"),
)
def corpus_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return (d.withColumn("split", F.expr(_SPLIT_EXPR))
             .groupBy("split", "lang")
             .agg(F.count(F.lit(1)).alias("n_docs"),
                  F.sum("n_chars").alias("sum_chars")))


# ------------------------------------------------ stratified sampling

# Per-stratum rate derived from the source name (even-numbered sources
# keep 1/2, odd keep 1/4) — stands in for a real pipeline's per-source
# quality weights.
_EVEN_THR = _hex_threshold(0.5)
_ODD_THR = _hex_threshold(0.25)

_RATE_THR_EXPR = f"""
    CASE WHEN CAST(substring(source, 4, 10) AS BIGINT) % 2 = 0
         THEN '{_EVEN_THR}' ELSE '{_ODD_THR}' END
"""


@query(
    "corpus_stratified_sample",
    oracle=f"""
        SELECT doc_id, source, lang
        FROM documents
        WHERE substring(md5('sample|' || CAST(doc_id AS VARCHAR)), 1, 8)
              < CASE WHEN CAST(substring(source, 4, 10) AS BIGINT) % 2 = 0
                     THEN '{_EVEN_THR}' ELSE '{_ODD_THR}' END
    """,
    doc="Stratified sampling with per-source rates via salted-hash "
        "thresholds ('sample|' salt decorrelates from the train/test "
        "split hash). Stateless filter — no shuffle, no RNG; the exact "
        "sampled id set is the verification surface.",
    tags=("curation", "sampling", "hash"),
)
def corpus_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    keep = (F.expr("substring(md5(concat('sample|', CAST(doc_id AS STRING)"
                   ")), 1, 8)")
            < F.expr(_RATE_THR_EXPR))
    return d.filter(keep).select("doc_id", "source", "lang")


# ------------------------------------------------- sequence packing

PACK_BUDGET = 128  # context-window token budget


PACK_ID_SPAN = 4096  # doc_ids per prefix-sum bucket


@query(
    "pack_sequences",
    oracle=f"""
        WITH toks AS (
          SELECT doc_id, source,
                 len(string_split(text, ' ')) AS n_tokens
          FROM documents
        ), offs AS (
          SELECT doc_id, source, n_tokens,
                 SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                     ROWS UNBOUNDED PRECEDING) AS cum
          FROM toks
        )
        SELECT doc_id, source, n_tokens,
               CAST(cum - n_tokens AS BIGINT) AS start_offset,
               CAST((cum - n_tokens) // {PACK_BUDGET} AS BIGINT) AS first_bin,
               CAST((cum - 1) // {PACK_BUDGET} AS BIGINT) AS last_bin
        FROM offs
    """,
    doc="Context-window packing: concatenate each source shard's "
        "documents in doc_id order and cut at fixed token budgets "
        "(the standard pretraining packing layout). Every document "
        "gets its global token offset and the bin range it spans. "
        "Round-7 re-plan: the offsets come from a two-phase bucketed "
        "prefix sum — per-(source, doc_id-range) partial sums "
        "aggregate map-side, a bounded window prefix-sums the bucket "
        "totals, and the data-sized window partitions by (source, "
        "bucket) so no partition outgrows the id span (the previous "
        "single per-source running window was a corpus-sized "
        "partition at 100 TB); integer arithmetic end-to-end.",
    tags=("curation", "packing", "window"),
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-7 re-plan: the per-source running token offset was ONE
    # window partitioned by the fixed-cardinality source key — a
    # corpus-sized partition at 100 TB. Two-phase bucketed prefix sum
    # instead (the global_row_number economics): per-(source, doc_id-
    # range bucket) partial sums aggregate map-side, a tiny window
    # prefix-sums them (bounded cells), and the data-sized window
    # partitions by (source, bucket) — bucket count grows with data,
    # each partition holds <= PACK_ID_SPAN docs.
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "source",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        F.expr(f"doc_id DIV {PACK_ID_SPAN}").alias("bkt"))
    partials = (toks.groupBy("source", "bkt")
                    .agg(F.sum("n_tokens").alias("bkt_tokens")))
    wp = (Window.partitionBy("source").orderBy("bkt")
                .rowsBetween(Window.unboundedPreceding, -1))
    prefix = partials.select(
        "source", "bkt",
        F.coalesce(F.sum("bkt_tokens").over(wp), F.lit(0))
         .alias("bkt_offset"))
    wb = (Window.partitionBy("source", "bkt").orderBy("doc_id")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    offs = (toks.join(prefix, ["source", "bkt"])
                .withColumn("cum", F.col("bkt_offset")
                            + F.sum("n_tokens").over(wb)))
    return offs.select(
        "doc_id", "source", "n_tokens",
        (F.col("cum") - F.col("n_tokens")).alias("start_offset"),
        F.expr(f"(cum - n_tokens) DIV {PACK_BUDGET}").alias("first_bin"),
        F.expr(f"(cum - 1) DIV {PACK_BUDGET}").alias("last_bin"))


# -------------------------------------------- contamination checking

NGRAM_N = 3
EVAL_MOD = 97  # doc_id % 97 == 0 -> held-out benchmark set


def _ngram_hashes() -> F.Column:
    """Distinct md5 hashes of word 3-grams over a pre-split ``toks``
    column (split once per row, not once per n-gram site; fixed-width
    hash -> an equi-join key, so at 100 TB the 16-byte digest, not the
    raw n-gram string, is what ships through the exchange)."""
    return F.expr(f"""
        array_distinct(transform(
          sequence(1, size(toks) - {NGRAM_N - 1}),
          i -> md5(concat_ws(' ', slice(toks, i, {NGRAM_N})))))
    """)


_SQL_NGRAMS = f"""
    list_distinct(list_transform(
      generate_series(1, len(string_split(text, ' ')) - {NGRAM_N - 1}),
      i -> md5(array_to_string(
             list_slice(string_split(text, ' '), i, i + {NGRAM_N - 1}),
             ' '))))
"""


@query(
    "contamination_check",
    oracle=f"""
        WITH grams AS (
          SELECT doc_id, UNNEST({_SQL_NGRAMS}) AS gh
          FROM documents
          WHERE len(string_split(text, ' ')) >= {NGRAM_N}
        ),
        eval_grams AS (
          SELECT doc_id AS eval_doc_id, gh FROM grams
          WHERE doc_id % {EVAL_MOD} = 0
        ),
        corpus_grams AS (
          SELECT doc_id, gh FROM grams WHERE doc_id % {EVAL_MOD} <> 0
        )
        SELECT c.doc_id, e.eval_doc_id,
               COUNT(*) AS n_shared_ngrams
        FROM corpus_grams c JOIN eval_grams e USING (gh)
        GROUP BY c.doc_id, e.eval_doc_id
    """,
    doc="Benchmark-contamination check: flag training documents "
        "sharing any word 3-gram with the held-out eval set "
        "(doc_id % 97 == 0 stands in for the benchmark). An "
        "inverted-index equi-join on n-gram hashes — the eval side is "
        "tiny and broadcast, so at 100 TB this is one map-side join "
        "over the corpus, never a corpus x eval cross product.",
    tags=("curation", "contamination", "join"),
)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (load(spark, sf_dir, "documents")
         .select("doc_id", F.split("text", " ").alias("toks"))
         .filter(F.size("toks") >= NGRAM_N))
    grams = d.select("doc_id", F.explode(_ngram_hashes()).alias("gh"))
    eval_g = (grams.filter(F.col("doc_id") % EVAL_MOD == 0)
                   .withColumnRenamed("doc_id", "eval_doc_id"))
    corpus_g = grams.filter(F.col("doc_id") % EVAL_MOD != 0)
    return (corpus_g.join(F.broadcast(eval_g), "gh")
                    .groupBy("doc_id", "eval_doc_id")
                    .agg(F.count(F.lit(1)).alias("n_shared_ngrams")))


# ------------------------------------------------------- profiling


@query(
    "profile_documents",
    oracle="""
        SELECT 'n_rows' AS metric, COUNT(*) AS value FROM documents
        UNION ALL
        SELECT 'n_null_text', COUNT(*) - COUNT(text) FROM documents
        UNION ALL
        SELECT 'n_distinct_lang', COUNT(DISTINCT lang) FROM documents
        UNION ALL
        SELECT 'n_distinct_source', COUNT(DISTINCT source) FROM documents
        UNION ALL
        SELECT 'min_chars', MIN(n_chars) FROM documents
        UNION ALL
        SELECT 'max_chars', MAX(n_chars) FROM documents
        UNION ALL
        SELECT 'total_chars', CAST(SUM(n_chars) AS BIGINT) FROM documents
    """,
    doc="Dataset profiling in ONE aggregation pass (the oracle's "
        "7-way UNION ALL is the naive formulation; the Spark plan "
        "computes all metrics in a single scan + partial agg, then "
        "unpivots with stack). The narrow (metric, value) shape is "
        "what a data-quality monitor ingests.",
    tags=("curation", "profiling",),
)
def profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    agg = d.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count("text")).alias("n_null_text"),
        F.countDistinct("lang").alias("n_distinct_lang"),
        F.countDistinct("source").alias("n_distinct_source"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.sum("n_chars").alias("total_chars"))
    return agg.selectExpr("""
        stack(7,
          'n_rows', n_rows,
          'n_null_text', n_null_text,
          'n_distinct_lang', n_distinct_lang,
          'n_distinct_source', n_distinct_source,
          'min_chars', min_chars,
          'max_chars', max_chars,
          'total_chars', total_chars) AS (metric, value)
    """)


# ----------------------------------------------------------- EWMA


@query(
    "ewma_user_values",
    oracle="""
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               list_reduce(list(value ORDER BY ts, event_id),
                           (acc, x) -> 0.5 * acc + 0.5 * x) AS ewma_value
        FROM events
        GROUP BY user_id
    """,
    doc="Per-user EWMA of event value (alpha = 0.5), an ordered "
        "sequential fold: sort each user's events once, then reduce. "
        "alpha = 0.5 makes both multiplications exact in binary FP, "
        "so the only rounding per step is the addition — performed in "
        "the same order by both engines -> bit-identical. Per-user "
        "state is bounded, so at 100 TB this is one shuffle on "
        "user_id and a linear in-partition pass.",
    tags=("curation", "timeseries", "ewma"),
)
def ewma_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
          .agg(F.count(F.lit(1)).alias("n_events"),
               F.expr("array_sort(collect_list(struct("
                      "unix_micros(ts) AS t, event_id AS e, value AS v)))")
                .alias("seq"))
          .select(
              "user_id", "n_events",
              F.expr("aggregate(slice(seq, 2, size(seq) - 1), seq[0].v,"
                     " (acc, s) -> 0.5D * acc + 0.5D * s.v)")
               .alias("ewma_value")))


# ------------------------------------------------------ z-order layout


def _interleave(a: str, b: str) -> str:
    """16-bit Morton code: bit i of a -> bit 2i, bit i of b -> bit
    2i+1. Pure shifts/masks — identical in both engines."""
    return (f"aggregate(sequence(0, 7), 0L, (acc, i) -> acc"
            f" + shiftleft(shiftright({a}, i) & 1, 2 * i)"
            f" + shiftleft(shiftright({b}, i) & 1, 2 * i + 1))")


_SQL_INTERLEAVE = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT),"
    " list_transform(generate_series(0, 7), i ->"
    " CAST((((a >> i) & 1) << (2 * i)) + (((b >> i) & 1) << (2 * i + 1))"
    " AS BIGINT))), (acc, v) -> acc + v)")


@query(
    "zorder_locality_events",
    oracle=f"""
        WITH dims AS (
          SELECT ((user_id % 256) + 256) % 256 AS a,
                 ((CAST(FLOOR(value) AS BIGINT) % 256) + 256) % 256 AS b
          FROM events
        )
        SELECT {_SQL_INTERLEAVE} // 256 AS ztile,
               COUNT(*) AS n_events,
               MIN(a) AS min_user_bucket, MAX(a) AS max_user_bucket,
               MIN(b) AS min_value_bucket, MAX(b) AS max_value_bucket
        FROM dims
        GROUP BY 1
    """,
    doc="Z-order (Morton) clustering key over two dimensions "
        "(user bucket x value bucket) + per-tile extents. Sorting "
        "files by ztile before writing gives min/max pruning on BOTH "
        "dimensions at 100 TB (each 256-code tile covers a 16x16 "
        "rectangle, so the per-tile extents the query reports are "
        "exactly the file-skipping statistics a reader would use). "
        "Bit arithmetic end-to-end — engine-exact.",
    tags=("curation", "layout", "zorder"),
)
def zorder_locality_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    dims = ev.select(
        F.expr("((user_id % 256) + 256) % 256").alias("a"),
        F.expr("((CAST(FLOOR(value) AS BIGINT) % 256) + 256) % 256")
         .alias("b"))
    return (dims.select(F.expr(_interleave("a", "b")).alias("z"),
                        "a", "b")
                .groupBy(F.expr("z DIV 256").alias("ztile"))
                .agg(F.count(F.lit(1)).alias("n_events"),
                     F.min("a").alias("min_user_bucket"),
                     F.max("a").alias("max_user_bucket"),
                     F.min("b").alias("min_value_bucket"),
                     F.max("b").alias("max_value_bucket")))


# ------------------------------------------- training-order shuffle

N_SHARDS = 8


@query(
    "corpus_shuffle_shards",
    oracle=f"""
        WITH keyed AS (
          SELECT doc_id,
                 md5('shuffle|' || CAST(doc_id AS VARCHAR)) AS ok
          FROM documents
        ), sharded AS (
          SELECT doc_id, ok,
                 (ascii(substring(ok, 1, 1))
                  - CASE WHEN ascii(substring(ok, 1, 1)) >= 97
                         THEN 87 ELSE 48 END) // 2 AS shard
          FROM keyed
        )
        SELECT doc_id, CAST(shard AS INT) AS shard,
               ROW_NUMBER() OVER (PARTITION BY shard
                                  ORDER BY ok, doc_id) AS pos_in_shard
        FROM sharded
    """,
    doc="Deterministic training-order shuffle: every document gets a "
        "pseudo-random but reproducible (epoch-stable) position — "
        "shard = first hex nibble of the salted md5 (8 shards), "
        "position = rank of the hash within the shard. No RNG, no "
        "global sort: the only ordering work is a per-shard window, "
        "so at 100 TB each shard's order materializes in parallel and "
        "a training job streams shard files sequentially.",
    tags=("curation", "shuffle", "hash"),
)
def corpus_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        F.expr("md5(concat('shuffle|', CAST(doc_id AS STRING)))").alias("ok"))
    hexv = ("(ascii(substring(ok, 1, 1)) - CASE WHEN "
            "ascii(substring(ok, 1, 1)) >= 97 THEN 87 ELSE 48 END)")
    sharded = keyed.withColumn("shard",
                               F.expr(f"CAST({hexv} DIV 2 AS INT)"))
    w = Window.partitionBy("shard").orderBy("ok", "doc_id")
    return sharded.select("doc_id", "shard",
                          F.row_number().over(w).alias("pos_in_shard"))


# -------------------------------------------- event stream cleaning

# events within 30min of the previous same-(user, type) event count as
# repeats — sized so the filter actually fires on the testdata's event
# density (~91 drops at sf0.01); a click pipeline would use ~1s
DUP_WINDOW_US = 1_800_000_000


@query(
    "dedup_consecutive_events",
    oracle=f"""
        WITH lagged AS (
          SELECT event_id, user_id, event_type, ts,
                 epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts, event_id) AS gap_us
          FROM events
        )
        SELECT event_id, user_id, event_type, ts
        FROM lagged
        WHERE gap_us IS NULL OR gap_us > {DUP_WINDOW_US}
    """,
    doc="Event-level near-duplicate removal (double-click / bot-retry "
        "filtering): drop an event arriving within the repeat window "
        "of the previous event of the same (user, type). Declarative "
        "LAG formulation — "
        "one shuffle on the user key, no stateful pass; the batch "
        "sibling of streaming_dedup_events' watermarked "
        "dropDuplicates. (LAG compares to the previous RAW event, not "
        "the previous KEPT one — the standard relational semantic; "
        "the chained-burst variant is the stateful streaming op.)",
    tags=("curation", "dedup", "window", "events"),
)
def dedup_consecutive_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    return (ev.withColumn("gap_us", gap)
              .filter(F.col("gap_us").isNull()
                      | (F.col("gap_us") > DUP_WINDOW_US))
              .select("event_id", "user_id", "event_type", "ts"))


# ------------------------------------------- weighted mixture sampling

# Per-language mixture weights in tenths (sum 10): the target share of
# the training budget each language should receive, regardless of its
# natural share of the corpus.
_MIX_WEIGHTS = {"en": 4, "es": 2, "fr": 2, "de": 1, "zh": 1}
# Total budget = half the corpus (in characters): every language is
# genuinely downsampled, at a rate proportional to weight/share.
_BUDGET_DENOM = 2

_W_CASE = ("CASE lang " + " ".join(
    f"WHEN '{k}' THEN {v}" for k, v in _MIX_WEIGHTS.items()) + " ELSE 0 END")

# hex32: the first 8 hex chars of a salted md5 as a BIGINT in
# [0, 2^32) — a uniform deterministic per-doc draw.
_HEX32_SPARK = (
    "aggregate(sequence(1, 8), CAST(0 AS BIGINT), (acc, i) -> acc * 16 + "
    "(ascii(substring(h, i, 1)) - CASE WHEN substring(h, i, 1) >= 'a' "
    "THEN 87 ELSE 48 END))")
_HEX32_SQL = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(generate_series(1, 8), i -> "
    "CAST(ascii(substring(h, i, 1)) - CASE WHEN substring(h, i, 1) >= 'a' "
    "THEN 87 ELSE 48 END AS BIGINT))), (acc, x) -> acc * 16 + x)")


@query(
    "mixture_weighted_sample",
    oracle=f"""
        WITH tot AS (
          SELECT CAST(SUM(n_chars) AS BIGINT) AS tot_chars FROM documents
        ), lang_tot AS (
          SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS lang_chars
          FROM documents GROUP BY lang
        ), thr AS (
          SELECT lang,
                 (({_W_CASE}) * tot_chars * 4294967296)
                   // ({10 * _BUDGET_DENOM} * lang_chars) AS thr
          FROM lang_tot, tot
        ), drawn AS (
          SELECT doc_id, lang, n_chars,
                 md5('mix|' || CAST(doc_id AS VARCHAR)) AS h
          FROM documents
        )
        SELECT d.doc_id, d.lang, d.n_chars
        FROM drawn d JOIN thr USING (lang)
        WHERE {_HEX32_SQL} < thr.thr
    """,
    doc="Weighted mixture sampling: downsample each language to a "
        "target share of the training budget (weights 4/2/2/1/1 "
        "tenths over half the corpus), the data-mixing step of "
        "pretraining-corpus assembly. The per-language keep rate "
        "budget/share is encoded as an exact integer threshold "
        "(rate * 2^32, truncating division — Spark DIV == DuckDB //) "
        "against a salted-md5 32-bit draw, so the sampled id set is "
        "reproducible bit-for-bit with no RNG. Plan shape: two tiny "
        "aggregates (corpus total, per-language totals) produce a "
        "5-row threshold table that broadcast-joins onto the corpus "
        "scan — one map-side join, no corpus shuffle. At 100 TB "
        "promote the BIGINT threshold arithmetic to DECIMAL(38,0) "
        "(total_chars * 2^32 approaches 2^63 near ~2 PB of text).",
    tags=("curation", "sampling", "mixture"),
)
def mixture_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    tot = d.agg(F.sum("n_chars").cast("bigint").alias("tot_chars"))
    lang_tot = (d.groupBy("lang")
                 .agg(F.sum("n_chars").cast("bigint").alias("lang_chars")))
    thr = (lang_tot.crossJoin(F.broadcast(tot))
                   .select("lang",
                           F.expr(f"(({_W_CASE}) * tot_chars * 4294967296L)"
                                  f" DIV ({10 * _BUDGET_DENOM} * lang_chars)")
                            .alias("thr")))
    drawn = d.select(
        "doc_id", "lang", "n_chars",
        F.expr("md5(concat('mix|', CAST(doc_id AS STRING)))").alias("h"))
    return (drawn.join(F.broadcast(thr), "lang")
                 .filter(F.expr(_HEX32_SPARK) < F.col("thr"))
                 .select("doc_id", "lang", "n_chars"))


# ------------------------------------------------ sliding-window chunking

CHUNK_TOKENS = 32
CHUNK_STRIDE = 24


@query(
    "doc_chunk_windows",
    oracle=f"""
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS t,
                 len(string_split(text, ' ')) AS n
          FROM documents
        ), counted AS (
          SELECT doc_id, t, n,
                 1 + CASE WHEN n > {CHUNK_TOKENS}
                          THEN (n - {CHUNK_TOKENS} + {CHUNK_STRIDE} - 1)
                               // {CHUNK_STRIDE}
                          ELSE 0 END AS n_chunks
          FROM toks
        ), chunks AS (
          SELECT doc_id, t, n,
                 UNNEST(generate_series(0, n_chunks - 1)) AS chunk_idx
          FROM counted
        )
        SELECT doc_id,
               CAST(chunk_idx AS BIGINT) AS chunk_idx,
               CAST(chunk_idx * {CHUNK_STRIDE} + 1 AS BIGINT) AS start_tok,
               CAST(LEAST({CHUNK_TOKENS},
                          n - chunk_idx * {CHUNK_STRIDE}) AS BIGINT)
                 AS chunk_len,
               md5(array_to_string(
                 list_slice(t, chunk_idx * {CHUNK_STRIDE} + 1,
                            chunk_idx * {CHUNK_STRIDE}
                            + LEAST({CHUNK_TOKENS},
                                    n - chunk_idx * {CHUNK_STRIDE})),
                 ' ')) AS chunk_md5
        FROM chunks
    """,
    doc="Sliding-window chunking (32-token windows, stride 24 — 8 "
        "tokens of overlap), the RAG / long-document segmentation "
        "layout. Each document expands to its chunk table with global "
        "token offsets and an md5 of the chunk text as the "
        "verification surface. A per-row explode of a small computed "
        "sequence — no shuffle at all; at 100 TB the expansion factor "
        "is bounded by doc length / stride and the explode is "
        "absorbed into the scan stage.",
    tags=("curation", "chunking",),
)
def doc_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.split("text", " ").alias("t"),
        F.size(F.split("text", " ")).alias("n"))
    counted = toks.withColumn(
        "n_chunks",
        F.expr(f"1 + CASE WHEN n > {CHUNK_TOKENS} THEN "
               f"(n - {CHUNK_TOKENS} + {CHUNK_STRIDE} - 1) DIV {CHUNK_STRIDE} "
               f"ELSE 0 END"))
    chunks = counted.select(
        "doc_id", "t", "n",
        F.explode(F.expr("sequence(0, n_chunks - 1)")).alias("chunk_idx"))
    return chunks.select(
        "doc_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.expr(f"CAST(chunk_idx * {CHUNK_STRIDE} + 1 AS BIGINT)")
         .alias("start_tok"),
        F.expr(f"CAST(LEAST({CHUNK_TOKENS}, n - chunk_idx * {CHUNK_STRIDE})"
               f" AS BIGINT)").alias("chunk_len"),
        F.expr(f"md5(concat_ws(' ', slice(t, chunk_idx * {CHUNK_STRIDE} + 1,"
               f" LEAST({CHUNK_TOKENS}, n - chunk_idx * {CHUNK_STRIDE}))))")
         .alias("chunk_md5"))


# ---------------------------------------------------- per-source caps

SOURCE_CAP = 15


@query(
    "source_cap_docs",
    oracle=f"""
        WITH ranked AS (
          SELECT doc_id, source,
                 ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5('cap|' || CAST(doc_id AS VARCHAR)), doc_id)
                   AS rank_in_source
          FROM documents
        )
        SELECT doc_id, source, CAST(rank_in_source AS BIGINT) AS rank_in_source
        FROM ranked
        WHERE rank_in_source <= {SOURCE_CAP}
    """,
    doc="Per-source document cap (keep at most 15 per source, chosen "
        "by salted-hash order — a uniform reproducible draw, not "
        "first-N bias): the per-domain cap CommonCrawl-style "
        "pipelines apply so no single site dominates the corpus. One "
        "window per source key; at 100 TB a hot domain concentrates "
        "on one partition, so production would pre-filter with a "
        "per-source approximate count and only rank sources over the "
        "cap — the semantics verified here are the exact rule.",
    tags=("curation", "sampling", "cap"),
)
def source_cap_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    w = (Window.partitionBy("source")
               .orderBy(F.expr("md5(concat('cap|', CAST(doc_id AS STRING)))"),
                        "doc_id"))
    return (d.select("doc_id", "source",
                     F.row_number().over(w).cast("bigint")
                      .alias("rank_in_source"))
             .filter(F.col("rank_in_source") <= SOURCE_CAP))


# ------------------------------------------------ exact-N eval holdout

HOLDOUT_N = 50


@query(
    "eval_holdout_sample",
    oracle=f"""
        SELECT doc_id, lang, source
        FROM documents
        ORDER BY md5('eval|' || CAST(doc_id AS VARCHAR)), doc_id
        LIMIT {HOLDOUT_N}
    """,
    doc="Exact-N evaluation holdout: draw exactly 50 documents by "
        "salted-hash order — the fixed-size eval-set draw (rate-based "
        "hash sampling can't hit an exact count; hash-ordered top-N "
        "can, and stays reproducible and growth-stable: a doc only "
        "leaves the holdout when a smaller-hashed doc arrives). Plans "
        "as TakeOrderedAndProject — per-partition top-50 heaps merged "
        "on the driver, no global sort, no full shuffle at 100 TB.",
    tags=("curation", "sampling", "holdout"),
)
def eval_holdout_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return (d.select("doc_id", "lang", "source",
                     F.expr("md5(concat('eval|', CAST(doc_id AS STRING)))")
                      .alias("h"))
             .orderBy("h", "doc_id")
             .limit(HOLDOUT_N)
             .select("doc_id", "lang", "source"))


# -------------------------------------- temporal split + leakage check

SPLIT_CUTOFF = "2024-01-22"
STRADDLE_GAP_US = 86_400_000_000  # < 24h across the cutoff = leakage risk


@query(
    "temporal_split_leakage",
    oracle=f"""
        WITH split AS (
          SELECT user_id, ts,
                 ts < TIMESTAMP '{SPLIT_CUTOFF}' AS is_train
          FROM events
        ), per_user AS (
          SELECT user_id,
                 CAST(SUM(CASE WHEN is_train THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_train,
                 CAST(SUM(CASE WHEN is_train THEN 0 ELSE 1 END) AS BIGINT)
                   AS n_test,
                 MAX(CASE WHEN is_train THEN ts END) AS last_train_ts,
                 MIN(CASE WHEN NOT is_train THEN ts END) AS first_test_ts
          FROM split
          GROUP BY user_id
        )
        SELECT user_id, n_train, n_test, last_train_ts, first_test_ts,
               (n_train > 0 AND n_test > 0 AND
                epoch_us(first_test_ts) - epoch_us(last_train_ts)
                  < {STRADDLE_GAP_US}) AS straddle_risk
        FROM per_user
    """,
    doc="Temporal train/test split (cutoff 2024-01-22) with a leakage "
        "audit: per user, the event counts on each side plus a "
        "straddle-risk flag — true when the user's last train event "
        "and first test event are under a day apart, i.e. one "
        "behavioral session crosses the cutoff and test labels leak "
        "into training features. One shuffle on user_id; conditional "
        "aggregates, exact int64 microsecond arithmetic.",
    tags=("curation", "split", "leakage"),
)
def temporal_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    is_train = F.col("ts") < F.lit(SPLIT_CUTOFF).cast("timestamp")
    per_user = (
        ev.select("user_id", "ts", is_train.alias("is_train"))
          .groupBy("user_id")
          .agg(F.sum(F.when(F.col("is_train"), 1).otherwise(0))
                .cast("bigint").alias("n_train"),
               F.sum(F.when(F.col("is_train"), 0).otherwise(1))
                .cast("bigint").alias("n_test"),
               F.max(F.when(F.col("is_train"), F.col("ts")))
                .alias("last_train_ts"),
               F.min(F.when(~F.col("is_train"), F.col("ts")))
                .alias("first_test_ts")))
    gap = (F.unix_micros("first_test_ts") - F.unix_micros("last_train_ts"))
    return per_user.withColumn(
        "straddle_risk",
        (F.col("n_train") > 0) & (F.col("n_test") > 0)
        & (gap < STRADDLE_GAP_US))


# ------------------------------------------- event-transition matrix


@query(
    "user_event_transitions",
    oracle="""
        WITH seq AS (
          SELECT user_id, event_type,
                 LEAD(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS next_type
          FROM events
        )
        SELECT event_type, next_type, COUNT(*) AS n_transitions
        FROM seq
        WHERE next_type IS NOT NULL
        GROUP BY event_type, next_type
    """,
    doc="First-order behavioral transition matrix: for every user's "
        "time-ordered event sequence, count (event_type -> next "
        "event_type) transitions — the sufficient statistic for "
        "Markov behavior models and the sequence-corpus sanity check "
        "before next-event-prediction training. One shuffle on "
        "user_id for the LEAD window, then a 25-cell "
        "map-side-combinable count.",
    tags=("curation", "sequences", "window"),
)
def user_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select("user_id", "event_type",
                    F.lead("event_type").over(w).alias("next_type"))
    return (seq.filter(F.col("next_type").isNotNull())
               .groupBy("event_type", "next_type")
               .agg(F.count(F.lit(1)).alias("n_transitions")))


# ------------------------------------------------- feature binning

N_BINS = 10


@query(
    "value_decile_bins",
    oracle=f"""
        WITH binned AS (
          SELECT event_type, value,
                 NTILE({N_BINS}) OVER (PARTITION BY event_type
                                       ORDER BY value, event_id) AS decile
          FROM events
        )
        SELECT event_type, decile,
               COUNT(*) AS n_events,
               MIN(value) AS lo, MAX(value) AS hi
        FROM binned
        GROUP BY event_type, decile
    """,
    doc="Equal-frequency feature binning: per-type value deciles, "
        "reported as per-bin boundaries — the discretization table a "
        "feature pipeline persists. Round-7 re-plan: NTILE over "
        "(event_type)-partitioned raw rows was the documented "
        "fixed-cardinality-window hazard (each type's sort is "
        "corpus/|types| rows in one task at 100 TB); the bin COUNTS "
        "and VALUE boundaries are tie-order-free (every row in a "
        "(type, value) cell shares the value), so they derive exactly "
        "from the cumulated cell table: each cell's global-rank span "
        "[cum-cnt+1, cum] is exploded onto the <= N_BINS deciles it "
        "overlaps with NTILE's exact integer tile arithmetic (first "
        "n mod k tiles take ceil(n/k) rows). One map-side-combinable "
        "cell aggregate over the scan; windows and the <= k-way "
        "fan-out run over the value-range-bounded cell table.",
    tags=("curation", "binning", "window"),
)
def value_decile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    cells = (ev.groupBy("event_type", "value")
               .agg(F.count(F.lit(1)).cast("long").alias("cnt")))
    wt = Window.partitionBy("event_type")
    c1 = (cells.withColumn(
              "cum", F.sum("cnt").over(
                  wt.orderBy("value").rowsBetween(
                      Window.unboundedPreceding, Window.currentRow)))
               .withColumn("n", F.sum("cnt").over(wt)))
    # NTILE(k) over n rows: the first n % k tiles hold n DIV k + 1
    # rows, the rest n DIV k — tile-of-rank and rank-bounds below are
    # its exact integer inverse (all operands non-negative).
    k = N_BINS
    tile = ("CASE WHEN {r} <= (n % {k}) * (n DIV {k} + 1)"
            " THEN ({r} + n DIV {k}) DIV (n DIV {k} + 1)"
            " ELSE (n % {k}) + ({r} - (n % {k}) * (n DIV {k} + 1)"
            " + n DIV {k} - 1) DIV (n DIV {k}) END")
    spans = c1.selectExpr(
        "event_type", "value", "cnt", "n",
        "cum - cnt + 1 AS r0", "cum AS r1",
        tile.format(r="(cum - cnt + 1)", k=k) + " AS d0",
        tile.format(r="cum", k=k) + " AS d1")
    exploded = spans.selectExpr(
        "event_type", "value", "n", "r0", "r1",
        "explode(sequence(d0, d1)) AS decile")
    bounds = exploded.selectExpr(
        "event_type", "value", "r0", "r1",
        "CAST(decile AS INT) AS decile",
        f"(decile - 1) * (n DIV {k}) + LEAST(decile - 1, n % {k}) + 1"
        " AS lb",
        f"decile * (n DIV {k}) + LEAST(decile, n % {k}) AS ub")
    return (bounds.groupBy("event_type", "decile")
                  .agg(F.sum(F.expr("LEAST(r1, ub) - GREATEST(r0, lb)"
                                    " + 1")).alias("n_events"),
                       F.min("value").alias("lo"),
                       F.max("value").alias("hi")))


@query(
    "reservoir_sample_per_group",
    oracle="""
        SELECT source, doc_id, sample_rank FROM (
          SELECT source, doc_id,
                 ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                 ) AS sample_rank
          FROM documents
        ) WHERE sample_rank <= 20
    """,
    doc="Exact-k per-group uniform sample — the deterministic "
        "distributed analog of per-group reservoir sampling: rank each "
        "group by md5(doc_id) (a uniform, retry-stable permutation — "
        "never rand(), which breaks task retries and re-runs) and keep "
        "the first k=20. Unlike the Bernoulli-threshold samplers "
        "(corpus_stratified_sample), this guarantees EXACTLY "
        "min(k, group size) rows per group. Plan: one hash "
        "repartition by group + per-partition sort with the rank "
        "filter pushed into the window (TopK per group, no global "
        "sort); at 100 TB the per-group sort is bounded because "
        "Spark's WindowGroupLimit pushes the k-limit below the sort.",
    tags=("curation", "sampling", "window"),
)
def reservoir_sample_per_group(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    w = (Window.partitionBy("source")
               .orderBy(F.expr("md5(CAST(doc_id AS STRING))"), "doc_id"))
    return (docs.select("source", "doc_id",
                        F.row_number().over(w).alias("sample_rank"))
                .filter(F.col("sample_rank") <= 20))


# ------------------------------- temperature-resampled language mixture

TEMP_SCALE = 1_000_000  # integer scale under the sqrt so the floored
                        # weight keeps ~3 significant digits
TEMP_BUDGET = 200       # documents drawn into the mixed training set


@query(
    "temperature_sampled_language_mix",
    oracle=f"""
        WITH lang_n AS (
          SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang
        ), w AS (
          SELECT lang,
                 CAST(FLOOR(SQRT(n_docs * {TEMP_SCALE})) AS BIGINT)
                   AS wgt
          FROM lang_n
        ), tgt AS (
          SELECT lang, ({TEMP_BUDGET} * wgt)
                         // (SELECT SUM(wgt) FROM w) AS target
          FROM w
        ), ranked AS (
          SELECT doc_id, lang,
                 ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY md5('temp|' || CAST(doc_id AS VARCHAR)),
                            doc_id) AS rnk
          FROM documents
        )
        SELECT r.doc_id, r.lang, CAST(r.rnk AS BIGINT) AS rnk
        FROM ranked r JOIN tgt USING (lang)
        WHERE r.rnk <= tgt.target
    """,
    doc="Temperature-resampled multilingual mixture (the alpha-scaled "
        "language sampling of mT5/XLM-R, arXiv:2010.11934: draw "
        "probability proportional to n_l^alpha flattens the language "
        "distribution so low-resource languages are upweighted). "
        "alpha = 0.5 exactly, because sqrt is correctly rounded in "
        "IEEE-754 — FLOOR(SQRT(n*10^6)) is the same integer on every "
        "engine, so weights, integer-division targets, and the drawn "
        "id set are all bit-reproducible with no RNG (draw order is "
        "salted-md5, as in the other deterministic samplers). Plan "
        "shape: two tiny aggregates build a per-language target "
        "table; the per-language rank prunes to rank <= "
        f"{TEMP_BUDGET} (a constant bound, so Spark runs it as a "
        "WindowGroupLimit per-partition heap, never a full per-"
        "language sort) before the broadcast target join applies the "
        "exact data-dependent cutoff.",
    tags=("curation", "sampling", "mixture", "llm"),
)
def temperature_sampled_language_mix(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    wgt = (d.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .select("lang",
                    F.floor(F.sqrt(F.col("n_docs") * TEMP_SCALE))
                     .cast("bigint").alias("wgt")))
    tot = wgt.agg(F.sum("wgt").alias("tw"))
    tgt = (wgt.crossJoin(F.broadcast(tot))
              .select("lang",
                      F.expr(f"({TEMP_BUDGET} * wgt) DIV tw")
                       .alias("target")))
    win = (Window.partitionBy("lang")
                 .orderBy(F.expr("md5(concat('temp|',"
                                 " CAST(doc_id AS STRING)))"), "doc_id"))
    ranked = (d.select("doc_id", "lang",
                       F.row_number().over(win).cast("bigint")
                        .alias("rnk"))
               # constant bound first: target <= TEMP_BUDGET always,
               # and the adjacent constant filter turns the window
               # into a WindowGroupLimit (per-partition top-k heap)
               .filter(F.col("rnk") <= TEMP_BUDGET))
    return (ranked.join(F.broadcast(tgt), "lang")
                  .filter(F.col("rnk") <= F.col("target"))
                  .select("doc_id", "lang", "rnk"))


# ------------------------------------------------- k-fold assignment

KFOLD_K = 5
# two leading md5 hex chars -> 0..255; mod K. 256 % 5 = 1, so folds are
# uniform to within 1/256 — and, like the split expression above, the
# assignment is a pure function of doc_id: stable across re-runs,
# engines, and corpus growth.
_KFOLD_SPARK = (f"CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 2), "
                f"16, 10) AS BIGINT) % {KFOLD_K}")
_KFOLD_SQL = (f"CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), "
              f"1, 2)) AS BIGINT) % {KFOLD_K}")


@query(
    "stratified_kfold_assignment",
    oracle=f"""
        WITH assigned AS (
          SELECT lang, {_KFOLD_SQL} AS fold, n_chars FROM documents
        ),
        cell AS (
          SELECT lang, fold,
                 CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(n_chars) AS BIGINT) AS sum_chars
          FROM assigned GROUP BY lang, fold
        ),
        stratum AS (
          SELECT lang, CAST(SUM(n_docs) AS BIGINT) AS n_stratum
          FROM cell GROUP BY lang
        )
        SELECT c.lang, c.fold, c.n_docs, c.sum_chars, s.n_stratum,
               CAST(c.n_docs AS DOUBLE) / CAST(s.n_stratum AS DOUBLE)
                 AS fold_share
        FROM cell c JOIN stratum s USING (lang)
    """,
    doc="Deterministic stratified k-fold cross-validation assignment: "
        "fold = md5(doc_id) mod k (hash-stable like the train/val/"
        "test split above — re-runs, engine swaps, and corpus growth "
        "never reshuffle existing documents across folds), reported "
        "as the per-(language-stratum, fold) histogram with fold "
        "shares. A stateless per-row map; the only shuffle is the "
        "bounded reporting aggregate (|langs| x k cells).",
    tags=("curation", "split", "hash"),
)
def stratified_kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    cell = (d.withColumn("fold", F.expr(_KFOLD_SPARK))
             .groupBy("lang", "fold")
             .agg(F.count(F.lit(1)).alias("n_docs"),
                  F.sum("n_chars").alias("sum_chars")))
    stratum = cell.groupBy("lang").agg(F.sum("n_docs").alias("n_stratum"))
    return (cell.join(F.broadcast(stratum), "lang")
                .select("lang", "fold", "n_docs", "sum_chars", "n_stratum",
                        (F.col("n_docs").cast("double")
                         / F.col("n_stratum").cast("double"))
                            .alias("fold_share")))
