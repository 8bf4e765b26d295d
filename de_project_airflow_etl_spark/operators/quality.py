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

from pyspark.sql import DataFrame, SparkSession, Window
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
    return repetition_stats_plan(load(spark, sf_dir, "documents"))


def repetition_stats_plan(docs: DataFrame) -> DataFrame:
    """The repetition-stats projection over any ``documents``-shaped
    relation — batch or streaming (it is stateless, so the same plan
    serves `readStream` ingest unchanged; tests/test_streaming_quality
    asserts batch/stream agreement)."""
    stats = docs.select(
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


# --------------------------------------------------- blocklist filter

# Stand-in for the term blocklists (NSFW, boilerplate markers, machine-
# generated-text signatures) a curation pipeline applies. Tokens chosen
# to actually occur in the synthetic vocabulary.
BLOCKLIST = ("spark", "dup")

_BLOCK_ARRAY_SPARK = "array(" + ", ".join(f"'{w}'" for w in BLOCKLIST) + ")"
_BLOCK_ARRAY_SQL = "[" + ", ".join(f"'{w}'" for w in BLOCKLIST) + "]"


@query(
    "blocklist_filter",
    oracle=f"""
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS t FROM documents
        )
        SELECT doc_id,
               CAST(len(list_filter(t,
                 x -> list_contains({_BLOCK_ARRAY_SQL}, x))) AS BIGINT)
                 AS n_blocked,
               len(list_filter(t,
                 x -> list_contains({_BLOCK_ARRAY_SQL}, x))) = 0 AS keep
        FROM toks
    """,
    doc="Term-blocklist filtering: count blocklisted token occurrences "
        "per document and emit the keep/drop verdict — the shape of "
        "NSFW/boilerplate blocklist passes in crawl curation. The "
        "blocklist is a compile-time array literal folded into the "
        "row expression (a production list of ~10^5 terms would "
        "broadcast a hash set instead); zero shuffles either way.",
    tags=("quality", "blocklist", "filter"),
)
def blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return blocklist_plan(load(spark, sf_dir, "documents"))


def blocklist_plan(docs: DataFrame) -> DataFrame:
    """Blocklist projection over any ``documents``-shaped relation
    (stateless — identical semantics on batch and streaming input)."""
    n_blocked = F.expr(
        f"CAST(size(filter(split(text, ' '), "
        f"x -> array_contains({_BLOCK_ARRAY_SPARK}, x))) AS BIGINT)")
    return docs.select("doc_id", n_blocked.alias("n_blocked")) \
               .withColumn("keep", F.col("n_blocked") == 0)


# ----------------------------------------------- data-quality gate

MIN_DOC_CHARS = 60
_KNOWN_LANGS = "('en', 'es', 'fr', 'de', 'zh')"


@query(
    "dq_expectations",
    oracle=f"""
        SELECT 'null_text' AS rule,
               CAST(COUNT(*) - COUNT(text) AS BIGINT) AS n_violations
        FROM documents
        UNION ALL
        SELECT 'chars_mismatch',
               CAST(SUM(CASE WHEN n_chars <> length(text)
                             THEN 1 ELSE 0 END) AS BIGINT)
        FROM documents
        UNION ALL
        SELECT 'unknown_lang',
               CAST(SUM(CASE WHEN lang NOT IN {_KNOWN_LANGS}
                             THEN 1 ELSE 0 END) AS BIGINT)
        FROM documents
        UNION ALL
        SELECT 'too_short',
               CAST(SUM(CASE WHEN n_chars < {MIN_DOC_CHARS}
                             THEN 1 ELSE 0 END) AS BIGINT)
        FROM documents
        UNION ALL
        SELECT 'dup_doc_id',
               CAST(COUNT(*) - COUNT(DISTINCT doc_id) AS BIGINT)
        FROM documents
    """,
    doc="Deequ-style data-quality gate: declarative expectations "
        "(non-null text, n_chars consistent with the text itself, "
        "language in the known set, minimum length, doc_id unique) "
        "evaluated as ONE aggregation pass — every rule is a "
        "conditional count sharing the same scan, vs the oracle's "
        "naive 5-way UNION ALL. The (rule, n_violations) report is "
        "what a pipeline health check ingests; a real deployment "
        "fails the run when any count exceeds its tolerance.",
    tags=("quality", "dq", "profiling"),
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    agg = d.agg(
        (F.count(F.lit(1)) - F.count("text")).alias("null_text"),
        F.sum(F.expr("CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END"))
         .alias("chars_mismatch"),
        F.sum(F.expr(f"CASE WHEN lang NOT IN {_KNOWN_LANGS} "
                     f"THEN 1 ELSE 0 END")).alias("unknown_lang"),
        F.sum(F.expr(f"CASE WHEN n_chars < {MIN_DOC_CHARS} "
                     f"THEN 1 ELSE 0 END")).alias("too_short"),
        (F.count(F.lit(1)) - F.countDistinct("doc_id")).alias("dup_doc_id"))
    return agg.selectExpr("""
        stack(5,
          'null_text', null_text,
          'chars_mismatch', chars_mismatch,
          'unknown_lang', unknown_lang,
          'too_short', too_short,
          'dup_doc_id', dup_doc_id) AS (rule, n_violations)
    """)


# ------------------------------------------------- numeric masking


@query(
    "mask_numeric_props",
    oracle="""
        SELECT event_id,
               regexp_replace(props, '[0-9]+', '#', 'g') AS masked_props,
               CAST(length(props) -
                    length(regexp_replace(props, '[0-9]', '', 'g'))
                 AS BIGINT) AS n_digits
        FROM events
    """,
    doc="Numeric-token masking over the event payload column — the "
        "redaction shape of PII scrubbing (account numbers, phone "
        "fragments) before payloads enter a training corpus: every "
        "digit run collapses to '#', with the per-row digit count as "
        "the audit metric. A stateless regexp projection (simple "
        "character-class patterns behave identically in Java and RE2 "
        "regex engines); no shuffle, runs inside the scan stage.",
    tags=("quality", "masking", "regexp"),
)
def mask_numeric_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.regexp_replace("props", "[0-9]+", "#").alias("masked_props"),
        (F.length("props")
         - F.length(F.regexp_replace("props", "[0-9]", "")))
         .cast("bigint").alias("n_digits"))


# ------------------------------------------- robust outlier gating

# Median/MAD outlier rule: |value - median| > 3 * MAD. Robust to the
# heavy tails that break z-scores (a handful of corrupt feed values
# shifts a mean, not a median) — the standard numeric-column gate in a
# data-quality pass.
MAD_K = 3


@query(
    "mad_outlier_events",
    oracle=f"""
        WITH e AS (
          SELECT event_type,
                 CAST(ROUND(value * 100) AS BIGINT) AS cv
          FROM events
        ),
        med AS (
          SELECT event_type, quantile_cont(cv, 0.5) AS med
          FROM e GROUP BY 1
        ),
        dev AS (
          SELECT e.event_type, e.cv, m.med, ABS(e.cv - m.med) AS adev
          FROM e JOIN med m USING (event_type)
        ),
        mad AS (
          SELECT event_type, quantile_cont(adev, 0.5) AS mad
          FROM dev GROUP BY 1
        )
        SELECT d.event_type,
               COUNT(*) AS n_events,
               ANY_VALUE(d.med) / 100 AS median_value,
               ANY_VALUE(m.mad) / 100 AS mad_value,
               CAST(SUM(CASE WHEN d.adev > {MAD_K} * m.mad
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM dev d JOIN mad m USING (event_type)
        GROUP BY 1
    """,
    doc="Median/MAD robust outlier gate per event type: exact medians "
        "over integer cents (so the even-count midpoint interpolation "
        "is exact in double on both engines — multiples of 0.25 cents "
        "at worst), deviations and the 3xMAD cutoff all in exact "
        "arithmetic. Two sort-based aggregate passes (median is not "
        "map-side combinable) + two broadcast joins of the 5-row "
        "per-type statistics — the second pass is the price of MAD "
        "and is inherent, not a plan artifact.",
    tags=("quality", "outlier", "robust-stats"),
)
def mad_outlier_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-7 re-plan: ONE corpus-scale pass (count per (event_type,
    # exact-cents cell)); medians, MAD, and outlier counts all derive
    # from the value-range-bounded cell table (roc_auc pattern). The
    # previous shape ran percentile() twice over raw rows — an
    # aggregate that BUFFERS every group value in memory, the real
    # 100 TB hazard — and re-scanned events per consumer. Results are
    # bit-identical: the midpoint interpolation runs in 2x/4x integer
    # units (med2 = v_lo + v_hi, mad4 = a2_lo + a2_hi), and
    # double(med2)/200 == percentile(cv,.5)/100 exactly because the
    # halving is dyadic and only the final /100 rounds. The outlier
    # cut 'adev > 3*mad' compares dyadic rationals, so the integer
    # form 2*a2 > 3*mad4 is exact (tests/test_properties.py pins this
    # against pure-python statistics.median for arbitrary values).
    e = (load(spark, sf_dir, "events")
         .select("event_type",
                 F.round(F.col("value") * 100).cast("long").alias("cv")))
    cells = (e.groupBy("event_type", "cv")
              .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
              .localCheckpoint())  # bounded; feeds median + dev passes
    wt = Window.partitionBy("event_type")
    wc = wt.orderBy("cv").rowsBetween(Window.unboundedPreceding,
                                      Window.currentRow)
    c1 = (cells.withColumn("cum", F.sum("cnt").over(wc))
               .withColumn("n", F.sum("cnt").over(wt)))
    med2 = c1.groupBy("event_type").agg(
        F.expr("MIN(CASE WHEN cum >= (n + 1) div 2 THEN cv END)"
               " + MIN(CASE WHEN cum >= n div 2 + 1 THEN cv END)")
         .alias("med2"),
        F.sum("cnt").cast("long").alias("n_events"))
    acells = (cells.join(F.broadcast(med2), "event_type")
                   .select("event_type", "n_events",
                           F.expr("abs(2 * cv - med2)").alias("a2"),
                           "med2", "cnt")
                   .groupBy("event_type", "n_events", "med2", "a2")
                   .agg(F.sum("cnt").cast("long").alias("cnt")))
    # acells feeds MAD + the cut, but recomputing it only re-reads the
    # CHECKPOINTED cells (no corpus scan) — a second eager checkpoint
    # measured slower than the recompute (A/B, round 7)
    a1 = (acells.withColumn(
              "cum", F.sum("cnt").over(wt.orderBy("a2").rowsBetween(
                  Window.unboundedPreceding, Window.currentRow)))
                .withColumn("n", F.sum("cnt").over(wt)))
    mad4 = a1.groupBy("event_type").agg(
        F.expr("MIN(CASE WHEN cum >= (n + 1) div 2 THEN a2 END)"
               " + MIN(CASE WHEN cum >= n div 2 + 1 THEN a2 END)")
         .alias("mad4"))
    return (acells.join(F.broadcast(mad4), "event_type")
                  .groupBy("event_type")
                  .agg(F.first("n_events").alias("n_events"),
                       F.expr("CAST(FIRST(med2) AS DOUBLE) / 200")
                        .alias("median_value"),
                       F.expr("CAST(FIRST(mad4) AS DOUBLE) / 400")
                        .alias("mad_value"),
                       F.sum(F.when(
                           2 * F.col("a2") > MAD_K * F.col("mad4"),
                           F.col("cnt")).otherwise(0))
                        .alias("n_outliers")))


# -------------------------------------- referential integrity audit

_FK_RELATIONS = (
    # (name, child table, child key, parent table, parent key)
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
)


@query(
    "referential_integrity_audit",
    oracle="""
        SELECT 'lineitem->orders' AS relation, COUNT(*) AS n_rows,
               CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_orphans
        FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        UNION ALL
        SELECT 'orders->customer', COUNT(*),
               CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT)
        FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        UNION ALL
        SELECT 'customer->nation', COUNT(*),
               CAST(SUM(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT)
        FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        UNION ALL
        SELECT 'nation->region', COUNT(*),
               CAST(SUM(CASE WHEN r.r_regionkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT)
        FROM nation n LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
    doc="Foreign-key audit across the star schema: for each child-> "
        "parent relation, total child rows and orphans (child keys "
        "with no parent) via a left join + null count — the standard "
        "pre-publish warehouse gate. Each relation is one pass; "
        "parent sides are dimension-sized and broadcast, so the audit "
        "costs a scan per child table and no fact-fact shuffle. At "
        "100 TB the deduped parent keyset can stand in for the "
        "dimension (a semi-join-reduced broadcast).",
    tags=("quality", "integrity", "join"),
)
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = []
    for name, child_t, child_k, parent_t, parent_k in _FK_RELATIONS:
        child = load(spark, sf_dir, child_t).select(child_k)
        parent = (load(spark, sf_dir, parent_t)
                  .select(F.col(parent_k).alias("__pk")).distinct())
        parts.append(
            child.join(F.broadcast(parent),
                       child[child_k] == F.col("__pk"), "left")
                 .agg(F.lit(name).alias("relation"),
                      F.count(F.lit(1)).alias("n_rows"),
                      F.sum(F.when(F.col("__pk").isNull(), 1)
                             .otherwise(0)).alias("n_orphans")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


# ------------------------------------------------ k-anonymity audit

K_ANON = 10          # groups with fewer distinct users are risky
VALUE_BUCKET = 10    # quasi-identifier value coarsening (dollars)


@query(
    "k_anonymity_audit",
    oracle=f"""
        WITH groups AS (
          SELECT event_type,
                 CAST(ts AS DATE) AS day,
                 CAST(FLOOR(value / {VALUE_BUCKET}) AS BIGINT) AS vbucket,
                 COUNT(DISTINCT user_id) AS n_users,
                 COUNT(*) AS n_rows
          FROM events
          GROUP BY 1, 2, 3
        )
        SELECT event_type,
               COUNT(*) AS n_groups,
               MIN(n_users) AS min_group_users,
               CAST(SUM(CASE WHEN n_users < {K_ANON} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_risky_groups,
               CAST(SUM(CASE WHEN n_users < {K_ANON} THEN n_rows ELSE 0 END)
                    AS BIGINT) AS n_risky_rows
        FROM groups
        GROUP BY 1
    """,
    doc="k-anonymity audit over the quasi-identifier (event_type, "
        "day, value bucket): per event type, how many quasi-groups "
        "fall below k=10 distinct users and how many rows sit in "
        "them — the re-identification screen a pipeline runs before "
        "releasing event-level data for training. Two aggregation "
        "levels (group sizes, then risk rollup), both map-side "
        "combinable except the COUNT(DISTINCT user_id), which Spark "
        "plans as the standard two-phase expand-aggregate.",
    tags=("quality", "privacy", "aggregate"),
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    groups = (e.groupBy(
                  "event_type",
                  F.col("ts").cast("date").alias("day"),
                  F.floor(F.col("value") / VALUE_BUCKET).cast("long")
                   .alias("vbucket"))
               .agg(F.countDistinct("user_id").alias("n_users"),
                    F.count(F.lit(1)).alias("n_rows")))
    return (groups.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_groups"),
                 F.min("n_users").alias("min_group_users"),
                 F.sum(F.when(F.col("n_users") < K_ANON, 1)
                        .otherwise(0)).alias("n_risky_groups"),
                 F.sum(F.when(F.col("n_users") < K_ANON,
                              F.col("n_rows")).otherwise(0))
                  .alias("n_risky_rows")))


# ------------------------------------------- observed (piggyback) DQ


def dq_observation_metrics() -> list:
    """The DQ metric expressions shared by the batch and streaming
    observation surfaces (observed_ingest_metrics and
    streaming/ingest.streaming_observed_ingest_metrics) — ONE
    definition so the two can never silently desynchronize. The value
    sum is emitted as exact integer CENTS: per-batch doubles would
    accumulate float error when a caller merges metrics across
    micro-batches; integer cents sum exactly and divide once at the
    end."""
    return [
        F.count(F.lit(1)).alias("n_rows"),
        # coalesce: SUM over a zero-row batch observes NULL, and
        # callers accumulate across batches with +=
        F.coalesce(F.sum(F.when(F.col("value") < 0, 1).otherwise(0)),
                   F.lit(0)).alias("n_negative_values"),
        F.coalesce(F.sum(F.round(F.col("value") * 100).cast("long")),
                   F.lit(0)).alias("sum_value_cents"),
    ]


@query(
    "observed_ingest_metrics",
    oracle="""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_negative_values,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                    AS DOUBLE) / 100 AS sum_value,
               MAX(ts) AS max_ts
        FROM events
    """,
    doc="Spark Observation API: data-quality metrics (row count, "
        "negative-value count, exact-cents value sum, max event time) "
        "collected as a SIDE OBSERVATION of a real pipeline action — "
        "the metrics ride the same scan that computes the pipeline's "
        "own result (here a purchase count), costing zero extra "
        "passes. This is how a 100 TB ingest job gets its freshness/"
        "volume/validity telemetry without doubling its I/O; the "
        "returned 1-row frame is the driver-side metric record a "
        "real pipeline would publish to its metadata store.",
    tags=("quality", "observe", "pipeline"),
)
def observed_ingest_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid as _uuid

    from pyspark.sql import Observation
    from pyspark.sql import types as T

    e = load(spark, sf_dir, "events")
    obs = Observation(f"dq_{_uuid.uuid4().hex[:8]}")
    observed = e.observe(obs, *dq_observation_metrics(),
                         F.max("ts").alias("max_ts"))
    # the observation piggybacks on the pipeline's own action
    observed.filter(F.col("event_type") == "purchase").count()
    m = obs.get
    schema = T.StructType([
        T.StructField("n_rows", T.LongType()),
        T.StructField("n_negative_values", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("max_ts", T.TimestampType()),
    ])
    return spark.createDataFrame(
        [(m["n_rows"], m["n_negative_values"],
          m["sum_value_cents"] / 100, m["max_ts"])], schema)
