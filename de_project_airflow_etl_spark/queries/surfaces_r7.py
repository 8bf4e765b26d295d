"""Round-7 surface bank, first half: cohort/drift analytics, SQL
surfaces (listagg, SQL scripting, recursive CTE, collation), embedding
rank normalization, and dedup-method agreement. Staged during round 6
as ``staged/round7.py``; promoted into the registry in round 7 after
the recorded sf0.01 + sf0.1 staged sweeps ran green.

Contract: ``(spark, sf_dir) -> DataFrame`` plus an exact DuckDB
oracle, identical column aliases on both sides, exact-integer /
fixed-point arithmetic for anything accumulated, a 100 TB plan story
per docstring, no ``rand()``, no ``.collect()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from de_project_airflow_etl_spark.registry import query
from de_project_airflow_etl_spark.tables import load


# ------------------------------------------ weekly cohort triangle

@query(
    "weekly_cohort_triangle",
    oracle="""
        WITH e AS (
          SELECT user_id,
                 CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk
          FROM events
        ),
        first_wk AS (
          SELECT user_id, MIN(wk) AS cohort_week FROM e GROUP BY user_id
        ),
        sizes AS (
          SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_size
          FROM first_wk GROUP BY cohort_week
        ),
        act AS (
          SELECT DISTINCT e.user_id, f.cohort_week,
                 CAST(date_diff('day', f.cohort_week, e.wk) // 7
                      AS BIGINT) AS week_offset
          FROM e JOIN first_wk f USING (user_id)
        ),
        tri AS (
          SELECT cohort_week, week_offset,
                 CAST(COUNT(*) AS BIGINT) AS n_active
          FROM act GROUP BY cohort_week, week_offset
        )
        SELECT t.cohort_week, t.week_offset, t.n_active, s.cohort_size,
               CAST(t.n_active AS DOUBLE) / CAST(s.cohort_size AS DOUBLE)
                 AS retention
        FROM tri t JOIN sizes s USING (cohort_week)
    """,
    doc="The classic cohort-retention triangle at week grain: users "
        "are cohorted by the ISO week of their first event, and each "
        "(cohort_week, week_offset) cell counts the distinct cohort "
        "members active that many weeks later — the matrix every "
        "retention dashboard renders, complementing the monthly "
        "revenue NRR (customer_cohort_nrr) and LTV curves "
        "(user_ltv_cohort_curves) with an activity-based view. Exact "
        "integer counts; the one division happens at the end on "
        "exact operands. Plan: one per-user min aggregate, a hash "
        "join back on user_id, a distinct on calendar-bounded cells, "
        "and a broadcast of the |weeks|-row cohort sizes — shuffle is "
        "user-keyed then cell-keyed, both map-side combinable, linear "
        "at 100 TB.",
    tags=("analytics", "cohort"),
)
def weekly_cohort_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk"))
    first = e.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    sizes = (first.groupBy("cohort_week")
                  .agg(F.count(F.lit(1)).alias("cohort_size")))
    act = (e.join(first, "user_id")
            .select("user_id", "cohort_week",
                    F.expr("CAST(datediff(wk, cohort_week) DIV 7 "
                           "AS BIGINT)").alias("week_offset"))
            .distinct())
    tri = (act.groupBy("cohort_week", "week_offset")
              .agg(F.count(F.lit(1)).alias("n_active")))
    return (tri.join(F.broadcast(sizes), "cohort_week")
               .select("cohort_week", "week_offset", "n_active",
                       "cohort_size",
                       (F.col("n_active").cast("double")
                        / F.col("cohort_size").cast("double"))
                       .alias("retention")))


# --------------------------------- two-proportion conversion drift

_Z_SQL = ("(CAST(x1 AS DOUBLE) / n1 - CAST(x2 AS DOUBLE) / n2)"
          " / SQRT((CAST(x1 + x2 AS DOUBLE) / (n1 + n2))"
          " * (1.0 - CAST(x1 + x2 AS DOUBLE) / (n1 + n2))"
          " * (1.0 / n1 + 1.0 / n2))")


@query(
    "two_proportion_drift_test",
    oracle=f"""
        WITH d AS (
          SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                   AS d,
                 CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                   AS is_conv
          FROM events
        ),
        b AS (SELECT (MIN(d) + MAX(d)) // 2 AS mid FROM d),
        h AS (
          SELECT CAST(SUM(CASE WHEN d.d <= b.mid THEN 1 ELSE 0 END)
                      AS BIGINT) AS n1,
                 CAST(SUM(CASE WHEN d.d <= b.mid THEN is_conv ELSE 0 END)
                      AS BIGINT) AS x1,
                 CAST(SUM(CASE WHEN d.d > b.mid THEN 1 ELSE 0 END)
                      AS BIGINT) AS n2,
                 CAST(SUM(CASE WHEN d.d > b.mid THEN is_conv ELSE 0 END)
                      AS BIGINT) AS x2
          FROM d, b
        )
        SELECT n1, x1, n2, x2,
               CAST(x1 AS DOUBLE) / n1 AS p1,
               CAST(x2 AS DOUBLE) / n2 AS p2,
               {_Z_SQL} AS z_stat,
               ABS({_Z_SQL}) > 1.959963984540054 AS significant_95
        FROM h
    """,
    doc="Two-proportion z-test for conversion drift between the first "
        "and second half of the observation window (split at the "
        "integer midpoint epoch-day, so the split is exact and "
        "data-deterministic): pooled-variance z on purchase rates — "
        "the A/B-test primitive, run as a before/after drift check. "
        "All counts are exact integers; the z formula is the "
        "IDENTICAL text on both engines over exact operands "
        "(division and sqrt are correctly-rounded IEEE ops, so the "
        "doubles match bit-exactly), compared against the two-sided "
        "95% critical value as a literal constant. Plan: one bounds "
        "aggregate broadcast as a one-row relation, then ONE "
        "conditional-sum pass — two scans, zero shuffle beyond two "
        "scalar aggregates, linear at 100 TB.",
    tags=("statistics", "evaluation"),
)
def two_proportion_drift_test(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "events").select(
        F.expr("datediff(CAST(ts AS DATE), DATE '1970-01-01')")
         .cast("long").alias("d"),
        F.expr("CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END")
         .alias("is_conv"))
    b = d.agg(F.expr("(MIN(d) + MAX(d)) DIV 2").alias("mid"))
    h = (d.crossJoin(F.broadcast(b))
          .agg(F.sum(F.expr("CASE WHEN d <= mid THEN 1 ELSE 0 END"))
                .cast("long").alias("n1"),
               F.sum(F.expr("CASE WHEN d <= mid THEN is_conv ELSE 0 END"))
                .cast("long").alias("x1"),
               F.sum(F.expr("CASE WHEN d > mid THEN 1 ELSE 0 END"))
                .cast("long").alias("n2"),
               F.sum(F.expr("CASE WHEN d > mid THEN is_conv ELSE 0 END"))
                .cast("long").alias("x2")))
    return h.select(
        "n1", "x1", "n2", "x2",
        F.expr("CAST(x1 AS DOUBLE) / n1").alias("p1"),
        F.expr("CAST(x2 AS DOUBLE) / n2").alias("p2"),
        F.expr(_Z_SQL).alias("z_stat"),
        F.expr(f"ABS({_Z_SQL}) > 1.959963984540054")
         .alias("significant_95"))


# ------------------------------ session duration dyadic histogram

SESSION_GAP_US = 30 * 60 * 1000000  # 30-minute inactivity gap


@query(
    "session_duration_log2_histogram",
    oracle=f"""
        WITH e AS (
          SELECT user_id, event_id, epoch_us(ts) AS t_us FROM events
        ),
        marks AS (
          SELECT user_id, t_us,
                 CASE WHEN t_us - lag(t_us) OVER
                        (PARTITION BY user_id ORDER BY t_us, event_id)
                      > {SESSION_GAP_US}
                      OR lag(t_us) OVER
                        (PARTITION BY user_id ORDER BY t_us, event_id)
                      IS NULL THEN 1 ELSE 0 END AS new_s
          FROM e
        ),
        sess AS (
          SELECT user_id, t_us,
                 SUM(new_s) OVER (PARTITION BY user_id ORDER BY t_us
                                  ROWS UNBOUNDED PRECEDING) AS sid
          FROM marks
        ),
        durs AS (
          SELECT user_id, sid,
                 (MAX(t_us) - MIN(t_us)) // 1000000 AS dur_s
          FROM sess GROUP BY user_id, sid
        ),
        bucketed AS (
          SELECT CASE WHEN dur_s = 0 THEN 0
                      ELSE CAST(length(printf('%b', dur_s)) AS BIGINT)
                 END AS bucket
          FROM durs
        ),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM bucketed)
        SELECT b.bucket,
               CASE WHEN b.bucket = 0 THEN 0
                    ELSE (CAST(1 AS BIGINT) << (b.bucket - 1)) END
                 AS lo_sec,
               (CAST(1 AS BIGINT) << b.bucket) - 1 AS hi_sec,
               CAST(COUNT(*) AS BIGINT) AS n_sessions,
               CAST(COUNT(*) AS DOUBLE) / CAST(n.n_total AS DOUBLE)
                 AS frac
        FROM bucketed b, n
        GROUP BY b.bucket, n.n_total
    """,
    doc="Dyadic (power-of-two) histogram of session durations: "
        "sessions are 30-minute-gap islands per user, and each "
        "session's duration in whole seconds lands in bucket "
        "floor(log2(d)) + 1 — computed EXACTLY as the bit length of "
        "the integer duration (Spark length(bin(d)) / DuckDB "
        "length(printf('%b', d))), never a floating log whose last "
        "ulp could disagree across libm implementations. Log-scale "
        "duration histograms are the standard engagement report; "
        "dyadic bucket edges make them mergeable across shards. "
        "Plan: the sessionize window is user-partitioned (key "
        "cardinality grows with data), the histogram aggregate is "
        "~60 buckets — zero unbounded windows, one user-keyed "
        "exchange at 100 TB.",
    tags=("analytics", "sessionization"),
)
def session_duration_log2_histogram(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_id", F.expr("unix_micros(ts)").alias("t_us"))
    lagw = ("lag(t_us) OVER (PARTITION BY user_id "
            "ORDER BY t_us, event_id)")
    marks = e.withColumn(
        "new_s", F.expr(f"CASE WHEN t_us - {lagw} > {SESSION_GAP_US} "
                        f"OR {lagw} IS NULL THEN 1 ELSE 0 END"))
    wo = (Window.partitionBy("user_id").orderBy("t_us")
          .rowsBetween(Window.unboundedPreceding, 0))
    sess = marks.withColumn("sid", F.sum("new_s").over(wo))
    durs = (sess.groupBy("user_id", "sid")
                .agg(F.expr("(MAX(t_us) - MIN(t_us)) DIV 1000000")
                      .alias("dur_s")))
    bucketed = durs.select(
        F.expr("CASE WHEN dur_s = 0 THEN 0 "
               "ELSE CAST(length(bin(dur_s)) AS BIGINT) END")
         .alias("bucket"))
    n = bucketed.agg(F.count(F.lit(1)).alias("n_total"))
    hist = (bucketed.groupBy("bucket")
                    .agg(F.count(F.lit(1)).alias("n_sessions")))
    return (hist.crossJoin(F.broadcast(n))
                .select("bucket",
                        F.expr("CASE WHEN bucket = 0 THEN 0 "
                               "ELSE shiftleft(CAST(1 AS BIGINT), "
                               "CAST(bucket AS INT) - 1) END")
                         .alias("lo_sec"),
                        F.expr("shiftleft(CAST(1 AS BIGINT), "
                               "CAST(bucket AS INT)) - 1")
                         .alias("hi_sec"),
                        "n_sessions",
                        (F.col("n_sessions").cast("double")
                         / F.col("n_total").cast("double"))
                        .alias("frac")))


# ------------------------------------ quality ensemble majority vote

QV_LEN_LO = 30      # n_chars window the length signal accepts
QV_LEN_HI = 5000
QV_DISTINCT_MIN = 0.55   # distinct-token ratio floor (repetition)
QV_MAXTOK_MAX = 0.12     # max single-token frequency ceiling


@query(
    "quality_ensemble_vote",
    oracle=f"""
        WITH per_doc AS (
          SELECT source,
                 CASE WHEN n_chars BETWEEN {QV_LEN_LO} AND {QV_LEN_HI}
                      THEN 1 ELSE 0 END AS f_len,
                 CASE WHEN len(list_distinct(string_split(text, ' ')))
                        * 100
                      >= len(string_split(text, ' ')) * {QV_DISTINCT_MIN}
                        * 100
                      THEN 1 ELSE 0 END AS f_distinct,
                 CASE WHEN list_max(list_transform(
                        list_distinct(string_split(text, ' ')),
                        w -> len(list_filter(string_split(text, ' '),
                                             x -> x = w)))) * 10000
                      <= len(string_split(text, ' ')) * {QV_MAXTOK_MAX}
                        * 10000
                      THEN 1 ELSE 0 END AS f_maxtok
          FROM documents
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(f_len) AS BIGINT) AS n_len_ok,
               CAST(SUM(f_distinct) AS BIGINT) AS n_distinct_ok,
               CAST(SUM(f_maxtok) AS BIGINT) AS n_maxtok_ok,
               CAST(SUM(CASE WHEN f_len + f_distinct + f_maxtok >= 2
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_vote_pass,
               CAST(SUM(CASE WHEN f_len + f_distinct + f_maxtok >= 2
                        THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
                 AS vote_pass_rate
        FROM per_doc GROUP BY source
    """,
    doc="Majority-vote quality ensemble: three independent cheap "
        "signals per document — length window, distinct-token ratio, "
        "max-single-token frequency — and a doc passes when >= 2 "
        "agree; per-source pass rates for each signal and the vote. "
        "Ensembling thresholded signals is the standard way curation "
        "pipelines damp any one heuristic's false positives. The "
        "ratio thresholds are evaluated as INTEGER cross- "
        "multiplications (n_distinct * 100 >= n_tokens * 55-style), "
        "so no threshold comparison ever touches a float. Plan: one "
        "scan, per-doc array lambdas inside codegen, one |sources|- "
        "cell aggregate — zero data-sized shuffle at 100 TB.",
    tags=("quality", "curation"),
)
def quality_ensemble_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = "split(text, ' ')"
    per = d.select(
        "source",
        F.expr(f"CASE WHEN n_chars BETWEEN {QV_LEN_LO} AND {QV_LEN_HI} "
               f"THEN 1 ELSE 0 END").alias("f_len"),
        F.expr(f"CASE WHEN size(array_distinct({toks})) * 100 "
               f">= size({toks}) * {QV_DISTINCT_MIN} * 100 "
               f"THEN 1 ELSE 0 END").alias("f_distinct"),
        F.expr(f"CASE WHEN array_max(transform(array_distinct({toks}), "
               f"w -> size(filter({toks}, x -> x = w)))) * 10000 "
               f"<= size({toks}) * {QV_MAXTOK_MAX} * 10000 "
               f"THEN 1 ELSE 0 END").alias("f_maxtok"))
    return (per.groupBy("source")
               .agg(F.count(F.lit(1)).alias("n_docs"),
                    F.sum("f_len").cast("long").alias("n_len_ok"),
                    F.sum("f_distinct").cast("long")
                     .alias("n_distinct_ok"),
                    F.sum("f_maxtok").cast("long").alias("n_maxtok_ok"),
                    F.sum(F.expr("CASE WHEN f_len + f_distinct + f_maxtok"
                                 " >= 2 THEN 1 ELSE 0 END"))
                     .cast("long").alias("n_vote_pass"))
               .withColumn("vote_pass_rate",
                           F.col("n_vote_pass").cast("double")
                           / F.col("n_docs").cast("double")))


# --------------------------------------- listagg ordered rollup

@query(
    "listagg_status_timeline",
    oracle="""
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               string_agg(DISTINCT o_orderstatus, ',' ORDER BY
                          o_orderstatus) AS statuses,
               CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT)
                 AS n_statuses
        FROM orders
        GROUP BY o_orderpriority
    """,
    doc="The SQL:2023 LISTAGG surface (new in Spark 4): per order "
        "priority, the distinct order statuses concatenated in "
        "deterministic sorted order via listagg(...) WITHIN GROUP "
        "(ORDER BY ...) — the ordered string aggregation DuckDB "
        "spells string_agg(... ORDER BY ...). The WITHIN GROUP "
        "ordering is what makes the value hashable: an unordered "
        "listagg would be partial-aggregation-order dependent. The "
        "input is pre-DISTINCTed in its own step (Spark 4.1's "
        "listagg(DISTINCT ...) hits a ClassCastException when "
        "rewritten next to another distinct aggregate — "
        "withNewChildrenInternal drops the SortOrder wrapper), which "
        "is also the scale-correct plan: the distinct relation is "
        "|priorities| x |statuses| bounded before any string "
        "concatenation happens. One scan, two bounded-cell "
        "exchanges at any scale.",
    tags=("relational", "listagg"),
)
def listagg_status_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select("o_orderpriority",
                                             "o_orderstatus")
    o.createOrReplaceTempView("listagg_orders")
    return spark.sql("""
        WITH ds AS (
          SELECT DISTINCT o_orderpriority, o_orderstatus
          FROM listagg_orders
        ),
        agg AS (
          SELECT o_orderpriority,
                 listagg(o_orderstatus, ',')
                   WITHIN GROUP (ORDER BY o_orderstatus) AS statuses,
                 CAST(COUNT(*) AS BIGINT) AS n_statuses
          FROM ds GROUP BY o_orderpriority
        ),
        cnt AS (
          SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
          FROM listagg_orders GROUP BY o_orderpriority
        )
        SELECT c.o_orderpriority, c.n_orders, a.statuses, a.n_statuses
        FROM cnt c JOIN agg a USING (o_orderpriority)
    """)


# ----------------------------------- MACD of daily revenue (cents)

MACD_SCALE = 1000000  # fixed-point scale on integer cents


def _tdivn_spark(x: str, d: int) -> str:
    """Truncate-toward-zero integer division — pinned explicitly
    because Spark `div` truncates while DuckDB `//` floors on
    negatives (MACD and its histogram go negative)."""
    return (f"(CASE WHEN ({x}) < 0 THEN -((-({x})) div {d})"
            f" ELSE ({x}) div {d} END)")


def _tdivn_sql(x: str, d: int) -> str:
    return (f"(CASE WHEN ({x}) < 0 THEN -((-({x})) // {d})"
            f" ELSE ({x}) // {d} END)")


def _macd_steps(tdiv, e12: str, e26: str, e9: str, c: str):
    """The shared recurrence (alpha = 2/(n+1) for n = 12, 26, 9):
    returns (e12', e26', macd, e9', hist) expression strings."""
    s = MACD_SCALE
    e12n = f"({e12} + {tdiv(f'2 * ({c} * {s} - {e12})', 13)})"
    e26n = f"({e26} + {tdiv(f'2 * ({c} * {s} - {e26})', 27)})"
    macd = f"({e12n} - {e26n})"
    e9n = f"({e9} + {tdiv(f'2 * ({macd} - {e9})', 10)})"
    hist = f"({macd} - {e9n})"
    return e12n, e26n, macd, e9n, hist


def _macd_spark_expr() -> str:
    s = MACD_SCALE
    e12n, e26n, macd, e9n, hist = _macd_steps(
        _tdivn_spark, "acc.e12", "acc.e26", "acc.e9", "e.cents")
    init = (
        f"named_struct("
        f"'e12', element_at(arr, 1).cents * {s},"
        f" 'e26', element_at(arr, 1).cents * {s},"
        f" 'e9', CAST(0 AS BIGINT),"
        f" 'rows', array(named_struct("
        f"'day', element_at(arr, 1).day,"
        f" 'cents', element_at(arr, 1).cents,"
        f" 'ema12_fp', element_at(arr, 1).cents * {s},"
        f" 'ema26_fp', element_at(arr, 1).cents * {s},"
        f" 'macd_fp', CAST(0 AS BIGINT),"
        f" 'signal_fp', CAST(0 AS BIGINT),"
        f" 'hist_fp', CAST(0 AS BIGINT))))")
    merge = (
        f"named_struct('e12', {e12n}, 'e26', {e26n}, 'e9', {e9n},"
        f" 'rows', concat(acc.rows, array(named_struct("
        f"'day', e.day, 'cents', e.cents, 'ema12_fp', {e12n},"
        f" 'ema26_fp', {e26n}, 'macd_fp', {macd},"
        f" 'signal_fp', {e9n}, 'hist_fp', {hist}))))")
    return (f"inline(aggregate(slice(arr, 2, size(arr) - 1), {init},"
            f" (acc, e) -> {merge}, acc -> acc.rows))")


def _macd_oracle() -> str:
    s = MACD_SCALE
    e12n, e26n, macd, e9n, hist = _macd_steps(
        _tdivn_sql, "i.ema12_fp", "i.ema26_fp", "i.signal_fp", "q.cents")
    return f"""
        WITH RECURSIVE daily AS (
          SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
                 CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
          FROM events GROUP BY 1
        ),
        seq AS (
          SELECT day, cents,
                 CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t
          FROM daily
        ),
        it AS (
          SELECT t, day, cents,
                 cents * {s} AS ema12_fp,
                 cents * {s} AS ema26_fp,
                 CAST(0 AS BIGINT) AS macd_fp,
                 CAST(0 AS BIGINT) AS signal_fp,
                 CAST(0 AS BIGINT) AS hist_fp
          FROM seq WHERE t = 1
          UNION ALL
          SELECT q.t, q.day, q.cents,
                 {e12n} AS ema12_fp,
                 {e26n} AS ema26_fp,
                 {macd} AS macd_fp,
                 {e9n} AS signal_fp,
                 {hist} AS hist_fp
          FROM it i JOIN seq q ON q.t = i.t + 1
        )
        SELECT day, cents, ema12_fp, ema26_fp, macd_fp, signal_fp,
               hist_fp
        FROM it
    """


@query(
    "macd_daily_revenue",
    oracle=_macd_oracle(),
    doc="MACD(12, 26, 9) of daily event revenue in pure integer "
        "arithmetic: the fast/slow EMAs run the alpha = 2/(n+1) "
        "recurrence on cents scaled by 1e6 with truncate-toward-zero "
        "division (pinned via explicit CASE — Spark `div` truncates, "
        "DuckDB `//` floors, and MACD goes negative), the signal "
        "line is the 9-period EMA of the MACD, and the histogram is "
        "their difference — the momentum indicator pair to "
        "holt_linear_daily_revenue's trend smoother, same fold "
        "discipline. Spark folds the calendar-bounded sorted day "
        "array in ONE sequential aggregate expression (single "
        "projection — the winnowing CollapseProject lesson); the "
        "oracle is a recursive CTE with identical arithmetic. "
        "Corpus-scale work is the one daily rollup; the fold length "
        "is |days|, calendar-bounded. Fixed-point magnitudes: "
        "daily cents x 1e6 fits BIGINT to ~$92B/day.",
    tags=("timeseries",),
)
def macd_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (load(spark, sf_dir, "events")
             .groupBy(F.to_date("ts").cast("string").alias("day"))
             .agg(F.sum(F.expr("CAST(ROUND(value * 100) AS BIGINT)"))
                   .cast("long").alias("cents")))
    one = daily.agg(F.sort_array(
        F.collect_list(F.struct("day", "cents"))).alias("arr"))
    return one.select(F.expr(_macd_spark_expr()))


# ------------------------------- contrastive triplet mining

TRIPLET_ANCHOR_MOD = 25   # deterministic ~4% anchor slice

_L2_PAIR_SQL = (
    "list_reduce(list_prepend(0.0, list_transform("
    "generate_series(1, len(a.embedding)),"
    " i -> (CAST(a.embedding[i] AS DOUBLE)"
    " - CAST(b.embedding[i] AS DOUBLE))"
    " * (CAST(a.embedding[i] AS DOUBLE)"
    " - CAST(b.embedding[i] AS DOUBLE)))),"
    " (acc, v) -> acc + v)")


@query(
    "contrastive_triplet_mining",
    oracle=f"""
        WITH pairs AS (
          SELECT a.vec_id AS anchor_id, a.label AS anchor_label,
                 b.vec_id, b.label,
                 {_L2_PAIR_SQL} AS d2
          FROM embeddings a JOIN embeddings b
            ON b.vec_id <> a.vec_id
          WHERE a.vec_id % {TRIPLET_ANCHOR_MOD} = 0
        ),
        pos AS (
          SELECT anchor_id, anchor_label, vec_id AS pos_id,
                 d2 AS pos_d2
          FROM (SELECT *, row_number() OVER (PARTITION BY anchor_id
                          ORDER BY d2 DESC, vec_id) AS rn
                FROM pairs WHERE label = anchor_label)
          WHERE rn = 1
        ),
        neg AS (
          SELECT anchor_id, vec_id AS neg_id, d2 AS neg_d2
          FROM (SELECT *, row_number() OVER (PARTITION BY anchor_id
                          ORDER BY d2, vec_id) AS rn
                FROM pairs WHERE label <> anchor_label)
          WHERE rn = 1
        )
        SELECT p.anchor_id, p.anchor_label, p.pos_id, p.pos_d2,
               n.neg_id, n.neg_d2, n.neg_d2 - p.pos_d2 AS margin,
               n.neg_d2 - p.pos_d2 > 0 AS satisfied
        FROM pos p JOIN neg n USING (anchor_id)
    """,
    doc="Hard-example triplet mining for contrastive training: for "
        "each anchor in the deterministic ~4% id-slice, the HARDEST "
        "positive (same label, maximum L2^2 — the farthest in-class "
        "example) and the HARDEST negative (other label, minimum "
        "L2^2 — the closest impostor), plus the triplet margin "
        "d(a,n) - d(a,p) and whether it is already satisfied — the "
        "batch-construction step of triplet/InfoNCE pipelines, "
        "sibling to negative_sampling_pairs. Distances fold "
        "(x-y)^2 in dimension order (knn discipline) so both "
        "engines produce bit-identical doubles; argmax/argmin are "
        "max_by/min_by with struct tie-breaks on vec_id — O(1) "
        "aggregation state, NO per-anchor candidate arrays. Plan: "
        "the anchor slice broadcasts onto the corpus (the 'broadcast "
        "the query set, never shuffle the corpus' shape); the "
        "aggregate is map-side combinable per anchor.",
    tags=("similarity", "training"),
)
def contrastive_triplet_mining(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    a = (e.filter(F.col("vec_id") % TRIPLET_ANCHOR_MOD == 0)
          .select(F.col("vec_id").alias("anchor_id"),
                  F.col("label").alias("anchor_label"),
                  F.col("embedding").alias("a_emb")))
    b = e.select("vec_id", "label", F.col("embedding").alias("b_emb"))
    d2 = ("aggregate(zip_with(a_emb, b_emb, (x, y) ->"
          " (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))"
          " * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),"
          " 0D, (acc, v) -> acc + v)")
    pairs = (b.join(F.broadcast(a), F.col("vec_id") != F.col("anchor_id"))
              .select("anchor_id", "anchor_label", "vec_id", "label",
                      F.expr(d2).alias("d2")))
    trip = (pairs.groupBy("anchor_id", "anchor_label")
            .agg(F.expr("max_by(struct(vec_id, d2), "
                        "struct(d2, -vec_id)) "
                        "FILTER (WHERE label = anchor_label)")
                  .alias("pos"),
                 F.expr("min_by(struct(vec_id, d2), "
                        "struct(d2, vec_id)) "
                        "FILTER (WHERE label <> anchor_label)")
                  .alias("neg")))
    return trip.select(
        "anchor_id", "anchor_label",
        F.col("pos.vec_id").alias("pos_id"),
        F.col("pos.d2").alias("pos_d2"),
        F.col("neg.vec_id").alias("neg_id"),
        F.col("neg.d2").alias("neg_d2"),
        (F.col("neg.d2") - F.col("pos.d2")).alias("margin"),
        (F.col("neg.d2") - F.col("pos.d2") > 0).alias("satisfied"))


# ------------------------------- dedup method agreement matrix

_EXACT_KEY_SPARK = "md5(text)"
_EXACT_KEY_SQL = "md5(text)"
# casefold: lowercase + strip non-alphanumerics, token ORDER PRESERVED
_CASEFOLD_KEY_SPARK = (
    "md5(array_join(filter("
    "split(regexp_replace(lower(text), '[^a-z0-9 ]', ''), ' '), "
    "x -> x <> ''), ' '))")
_CASEFOLD_KEY_SQL = (
    "md5(array_to_string(list_filter("
    "string_split(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), "
    "' '), x -> x <> ''), ' '))")
# bag: sorted distinct word set (order-insensitive) — the
# dedup_normalized_text canonical form (operators/dedup.py)
_BAG_KEY_SPARK = (
    "md5(array_join(array_sort(array_distinct(filter("
    "split(regexp_replace(lower(text), '[^a-z0-9 ]', ''), ' '), "
    "x -> x <> ''))), ' '))")
_BAG_KEY_SQL = (
    "md5(array_to_string(list_sort(list_distinct(list_filter("
    "string_split(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), "
    "' '), x -> x <> ''))), ' '))")


@query(
    "dedup_method_agreement",
    oracle=f"""
        WITH keyed AS (
          SELECT doc_id,
                 {_EXACT_KEY_SQL} AS k1,
                 {_CASEFOLD_KEY_SQL} AS k2,
                 {_BAG_KEY_SQL} AS k3
          FROM documents
        ),
        flags AS (
          SELECT doc_id,
                 CASE WHEN COUNT(*) OVER (PARTITION BY k1) > 1
                      THEN 1 ELSE 0 END AS f_exact,
                 CASE WHEN COUNT(*) OVER (PARTITION BY k2) > 1
                      THEN 1 ELSE 0 END AS f_casefold,
                 CASE WHEN COUNT(*) OVER (PARTITION BY k3) > 1
                      THEN 1 ELSE 0 END AS f_bag
          FROM keyed
        )
        SELECT f_exact, f_casefold, f_bag,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(MIN(doc_id) AS BIGINT) AS min_doc,
               CAST(MAX(doc_id) AS BIGINT) AS max_doc
        FROM flags GROUP BY f_exact, f_casefold, f_bag
    """,
    doc="Agreement matrix between three dedup canonicalization "
        "levels — exact bytes, casefold (lowercase + punctuation "
        "stripped, order preserved), and bag-of-words (the "
        "dedup_normalized_text canonical form) — each doc gets a "
        "dup/unique flag per method and the 2^3 cells count how the "
        "methods overlap: the calibration report a curation pipeline "
        "uses to decide HOW aggressive its dedup pass should be "
        "(every casefold dup is a bag dup by construction, so two "
        "cells must be empty — a built-in consistency check the "
        "oracle enforces for free). The Spark side flags via "
        "per-key count aggregates joined back on 16-byte md5 keys "
        "(never a window over data, never text in the shuffle); the "
        "definitional oracle uses count windows. 8-cell output at "
        "any scale.",
    tags=("dedup", "evaluation"),
)
def dedup_method_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(_EXACT_KEY_SPARK).alias("k1"),
        F.expr(_CASEFOLD_KEY_SPARK).alias("k2"),
        F.expr(_BAG_KEY_SPARK).alias("k3"))
    # Per-key dup counts as COUNT(*) OVER (PARTITION BY k_i) instead
    # of groupBy + join-back (r11, guide §2.4): the old shape scanned
    # documents 4x (once per count branch + the join chain base) and
    # sort-merge-joined the full stream three times; the windows keep
    # ONE scan + three exchanges. The partition keys are dup-group
    # keys that GROW with data (near one per doc), so this is NOT the
    # fixed-cardinality window hazard. Interleaved warm A/B at sf0.1:
    # 1.982s -> 0.977s best-of-7, new faster every round; rows
    # identical at sf0.01 + sf0.1, oracle exact at 3 SFs.
    flagged = d
    for i in (1, 2, 3):
        flagged = flagged.withColumn(
            f"c{i}", F.count(F.lit(1)).over(Window.partitionBy(f"k{i}")))
    flags = flagged.select(
        "doc_id",
        F.expr("CASE WHEN c1 > 1 THEN 1 ELSE 0 END").alias("f_exact"),
        F.expr("CASE WHEN c2 > 1 THEN 1 ELSE 0 END").alias("f_casefold"),
        F.expr("CASE WHEN c3 > 1 THEN 1 ELSE 0 END").alias("f_bag"))
    return (flags.groupBy("f_exact", "f_casefold", "f_bag")
                 .agg(F.count(F.lit(1)).alias("n_docs"),
                      F.min("doc_id").alias("min_doc"),
                      F.max("doc_id").alias("max_doc")))


# ----------------------------------- SQL scripting control flow

@query(
    "sql_scripting_rollup",
    oracle="""
        WITH thr AS (
          SELECT CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                      // COUNT(*) AS BIGINT) AS mean_cents
          FROM orders
        )
        SELECT o.o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_above,
               CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS sum_cents,
               ANY_VALUE(t.mean_cents) AS threshold_cents
        FROM orders o, thr t
        WHERE CAST(ROUND(o.o_totalprice * 100) AS BIGINT) > t.mean_cents
        GROUP BY o.o_orderpriority
    """,
    doc="SQL scripting surface (Spark 4 BEGIN...END with DECLARE/SET "
        "session variables): the script computes the corpus mean "
        "order value into a declared BIGINT variable (integer "
        "floor-mean, so the threshold is exact on both engines), "
        "then parameterizes the final rollup with it — the "
        "two-phase 'compute a statistic, then filter by it' pattern "
        "that otherwise needs driver round-trips or scalar "
        "subqueries, expressed as one atomic script. The oracle is "
        "the equivalent scalar-subquery SQL. The variable holds one "
        "scalar (broadcast by the engine); data-sized work is two "
        "scans with map-side-combinable aggregates.",
    tags=("scripting", "relational"),
)
def sql_scripting_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select("o_orderpriority",
                                             "o_totalprice")
    o.createOrReplaceTempView("script_orders")
    return spark.sql("""
        BEGIN
          DECLARE mean_cents BIGINT DEFAULT 0;
          SET mean_cents = (
            SELECT SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                   DIV COUNT(*)
            FROM script_orders);
          SELECT o_orderpriority,
                 CAST(COUNT(*) AS BIGINT) AS n_above,
                 SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                   AS sum_cents,
                 mean_cents AS threshold_cents
          FROM script_orders
          WHERE CAST(ROUND(o_totalprice * 100) AS BIGINT) > mean_cents
          GROUP BY o_orderpriority;
        END
    """)


# ------------------------- recursive reachability over dup chains

REACH_DEPTH_CAP = 50  # guards the engine recursion limit at scale


@query(
    "recursive_dup_reachability",
    oracle=f"""
        WITH RECURSIVE keyed AS (
          SELECT doc_id, {_BAG_KEY_SQL} AS k FROM documents
        ),
        grp AS (
          SELECT doc_id, k,
                 row_number() OVER (PARTITION BY k ORDER BY doc_id)
                   AS rn
          FROM keyed
        ),
        edges AS (
          SELECT a.doc_id AS src, b.doc_id AS dst
          FROM grp a JOIN grp b
            ON a.k = b.k AND b.rn = a.rn + 1
        ),
        roots AS (
          SELECT k, MIN(doc_id) AS root FROM grp GROUP BY k
          HAVING COUNT(*) > 1
        ),
        walk AS (
          SELECT root, root AS doc, 0 AS depth FROM roots
          UNION ALL
          SELECT w.root, e.dst, w.depth + 1
          FROM walk w JOIN edges e ON e.src = w.doc
          WHERE w.depth < {REACH_DEPTH_CAP}
        )
        SELECT CAST(root AS BIGINT) AS root_doc,
               CAST(COUNT(*) AS BIGINT) AS n_reachable,
               CAST(MAX(depth) AS BIGINT) AS max_depth
        FROM walk GROUP BY root
    """,
    doc="Transitive reachability over the dup chains (the oracle "
        "stays the definitional WITH RECURSIVE walk): duplicate "
        "groups under the bag-of-words canonical key are chained "
        "into next-doc edges (rn -> rn+1 inside each group), and "
        "each multi-doc group's keeper root reports reachable-set "
        "size and chain depth, capped at 50 — cross-checkable "
        "against dedup_normalized_text's group sizes (n_reachable "
        "== n_docs, max_depth == n_docs - 1 below the cap). r10 "
        "optimization (guide §8 problem knowledge): the edge set is "
        "a union of DISJOINT PATHS by construction — every node has "
        "exactly one successor (rn+1) — so the depth-capped walk "
        "from the root (rn 1) visits exactly the docs at depths "
        "0..min(n-1, cap): n_reachable = LEAST(n, cap+1), max_depth "
        "= LEAST(n-1, cap). ONE map-side-combinable aggregate "
        "replaces the rank window, the chain self-join, and the "
        "O(chain-length) sequential recursion rounds — which at "
        "100 TB is the difference between one shuffle and an "
        "unbounded number of them. Equivalence to the recursive "
        "oracle is re-proven exactly at every sf.",
    tags=("recursive-cte", "dedup"),
)
def recursive_dup_reachability(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_BAG_KEY_SPARK).alias("k"))
    return (d.groupBy("k")
             .agg(F.min("doc_id").alias("root"),
                  F.count(F.lit(1)).alias("n"))
             .filter(F.col("n") > 1)
             .selectExpr(
                 "CAST(root AS BIGINT) AS root_doc",
                 f"CAST(LEAST(n, {REACH_DEPTH_CAP} + 1) AS BIGINT)"
                 " AS n_reachable",
                 f"CAST(LEAST(n - 1, {REACH_DEPTH_CAP}) AS BIGINT)"
                 " AS max_depth"))


# -------------------- distributed per-dimension rank normalization

RANKB_K = 1024  # value-range buckets per dimension


@query(
    "embedding_rank_normalize_bucketed",
    oracle="""
        WITH comp AS (
          SELECT vec_id,
                 generate_subscripts(embedding, 1) AS i,
                 CAST(unnest(embedding) AS DOUBLE) AS v
          FROM embeddings
        ),
        ranked AS (
          SELECT vec_id, i,
                 CAST(rank() OVER (PARTITION BY i ORDER BY v) - 1
                      AS BIGINT) AS num,
                 CAST(COUNT(*) OVER (PARTITION BY i) - 1
                      AS BIGINT) AS denom
          FROM comp
        )
        SELECT r.vec_id, ANY_VALUE(e.label) AS label,
               array_to_string(list(r.num ORDER BY r.i),
                               ' ') AS rank_nums,
               MAX(r.denom) AS denom
        FROM ranked r JOIN embeddings e USING (vec_id)
        GROUP BY r.vec_id
    """,
    doc="The SCALE-PATH twin of embedding_rank_normalize: identical "
        "output (exact rational per-dim ranks), but no window ever "
        "partitions by the FIXED 64-dim key — at 1e12 vectors a "
        "dim-partition holds 1e12 rows, the same hazard class as "
        "lof_bucket_outliers' bucket window. Plan: value-range "
        "buckets per dim (floor((v - vmin)/w), monotone in v by "
        "construction, so bucket boundaries cannot reorder values), "
        "per-(dim, bucket) counts prefix-summed over the BOUNDED "
        "64 x 1024 cell relation, offsets broadcast back, and "
        "row_number runs per (dim, bucket) partition — each holding "
        "~n/1024 rows per dim, with the curriculum_global_rank "
        "adaptive re-split as the documented escalation for spiky "
        "distributions. rank() tie semantics are restored exactly by "
        "grouping the per-row numbers on (dim, value) and taking the "
        "group minimum (tied values share the first position). The "
        "oracle is the definitional window form — both plans, one "
        "answer.",
    tags=("similarity", "normalize", "scale"),
)
def embedding_rank_normalize_bucketed(spark: SparkSession,
                                      sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    comp = (e.select("vec_id", F.posexplode("embedding").alias("i0", "v0"))
             .select("vec_id", (F.col("i0") + 1).alias("i"),
                     F.col("v0").cast("double").alias("v")))
    bounds = comp.agg(F.min("v").alias("vmin"), F.max("v").alias("vmax"))
    binned = (comp.crossJoin(F.broadcast(bounds))
              .withColumn("b", F.expr(
                  f"CASE WHEN vmax = vmin THEN 0 ELSE "
                  f"least(CAST(floor((v - vmin) / ((vmax - vmin) "
                  f"/ {RANKB_K})) AS INT), {RANKB_K - 1}) END"))
              .select("vec_id", "i", "v", "b"))
    counts = binned.groupBy("i", "b").agg(F.count(F.lit(1)).alias("c"))
    woff = (Window.partitionBy("i").orderBy("b")
            .rowsBetween(Window.unboundedPreceding, -1))
    offs = counts.select(  # <= 64 x 1024 rows: bounded by construction
        "i", "b",
        F.coalesce(F.sum("c").over(woff), F.lit(0)).alias("off"))
    wrn = Window.partitionBy("i", "b").orderBy("v", "vec_id")
    rn = (binned.join(F.broadcast(offs), ["i", "b"])
                .withColumn("rn_dim",
                            (F.col("off")
                             + F.row_number().over(wrn)).cast("long")))
    mn = rn.groupBy("i", "v").agg(F.min("rn_dim").alias("mnr"))
    ranked = (rn.join(mn, ["i", "v"])
                .select("vec_id", "i",
                        (F.col("mnr") - 1).cast("long").alias("num")))
    den = (comp.groupBy("i")
               .agg((F.count(F.lit(1)) - 1).cast("long").alias("denom")))
    return (ranked.join(F.broadcast(den), "i")
                  .groupBy("vec_id")
                  .agg(F.array_join(
                          F.transform(
                              F.array_sort(
                                  F.collect_list(F.struct("i", "num"))),
                              lambda s: s["num"].cast("string")),
                          " ").alias("rank_nums"),
                       F.max("denom").alias("denom"))
                  .join(e.select("vec_id", "label"), "vec_id")
                  .select("vec_id", "label", "rank_nums", "denom"))


# ----------------------------- collation-aware casefold grouping

@query(
    "collation_casefold_group",
    oracle="""
        WITH mixed AS (
          SELECT CASE WHEN doc_id % 3 = 0 THEN upper(lang)
                      WHEN doc_id % 3 = 1
                        THEN upper(substr(lang, 1, 1))
                             || substr(lang, 2)
                      ELSE lang END AS lang_mixed,
                 n_chars, source
          FROM documents
        )
        SELECT lower(lang_mixed) AS lang_folded,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
               CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
        FROM mixed GROUP BY lower(lang_mixed)
    """,
    doc="Collation-aware grouping (Spark 4 COLLATE): language codes "
        "are deterministically re-cased three ways (upper / initcap "
        "/ as-is, keyed on doc_id), then grouped under UTF8_LCASE "
        "collation so the case variants merge WITHOUT rewriting the "
        "key — the engine-level casefold semantics that replace "
        "lower()-wrapping every comparison. The emitted group key is "
        "explicitly lower()ed because a collated group's "
        "representative value is whichever variant a partial "
        "aggregate saw first (partial-order-dependent — exactly the "
        "nondeterminism the output contract bans); the oracle is the "
        "classic lower() GROUP BY. Counts/sums exact; one scan, one "
        "|langs|-cell map-side-combinable exchange at any scale.",
    tags=("relational", "collation"),
)
def collation_casefold_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "lang",
                                                "n_chars", "source")
    d.createOrReplaceTempView("collate_docs")
    return spark.sql("""
        WITH mixed AS (
          SELECT CASE WHEN doc_id % 3 = 0 THEN upper(lang)
                      WHEN doc_id % 3 = 1 THEN initcap(lang)
                      ELSE lang END AS lang_mixed,
                 n_chars, source
          FROM collate_docs
        )
        SELECT lower(lang_mixed COLLATE UTF8_LCASE) AS lang_folded,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               SUM(n_chars) AS sum_chars,
               CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
        FROM mixed
        GROUP BY lang_mixed COLLATE UTF8_LCASE
    """)
