"""Time-series operators over ``events``: as-of join, gap
sessionization, time-hierarchy rollup, exact quantiles.

The reference's only time semantics are daily partitions (SURVEY.md
§1.1); these generalize them to the event-time operations a hypertable
engine offers.

Spark-first design:

* As-of join = union the two tagged sides and take a running
  ``last(..., ignorenulls=True)`` over one (key, time)-ordered window —
  ONE shuffle on the key, linear scan within partitions. Never a range
  cross-join: at 100 TB an inequality theta-join explodes, while this
  plan is the same cost class as a groupBy. (DuckDB's native ASOF JOIN
  is the oracle.)
* Sessionization uses Spark's native ``session_window`` — the same
  operator the streaming engine uses for stateful session aggregation,
  so the batch and streaming paths share semantics: a new session
  starts when the gap since the previous event is >= the 30 min
  timeout.
* Quantiles are computed with identical manual interpolation SQL on
  both engines (sort + row_number + linear interpolation) so the
  doubles match bit-for-bit; the one-liner scale path is
  ``approx_percentile`` (t-digest-style sketch, mergeable map-side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from de_project_airflow_etl_spark.registry import query
from de_project_airflow_etl_spark.tables import load

SESSION_GAP = "30 minutes"
SESSION_GAP_US = 30 * 60 * 1_000_000


# ------------------------------------------------------------- as-of join

@query(
    "asof_join_click_purchase",
    oracle="""
        WITH purchases AS (
          SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
        ),
        clicks AS (
          SELECT user_id, ts AS click_ts FROM events WHERE event_type = 'click'
        )
        SELECT p.event_id, p.user_id, p.ts, c.click_ts,
               epoch_us(p.ts) - epoch_us(c.click_ts) AS gap_us
        FROM purchases p
        ASOF LEFT JOIN clicks c
          ON p.user_id = c.user_id AND p.ts >= c.click_ts
    """,
    doc="As-of join: each purchase paired with the same user's most "
        "recent click at-or-before it. Spark plan = tagged union + one "
        "running last() window — a single shuffle on user_id, linear "
        "within partitions; the range-join formulation DuckDB's ASOF "
        "operator optimizes natively would be a quadratic theta-join "
        "in a naive plan. (user_id, ts) is unique in the testdata, so "
        "the match is deterministic.",
    tags=("timeseries", "asof", "join"),
)
def asof_join_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    clicks = (ev.filter(F.col("event_type") == "click")
                .select("user_id", "ts",
                        F.col("ts").alias("click_ts"),
                        F.lit(None).cast("long").alias("event_id"),
                        F.lit(0).alias("tag")))
    purchases = (ev.filter(F.col("event_type") == "purchase")
                   .select("user_id", "ts",
                           F.lit(None).cast("timestamp").alias("click_ts"),
                           "event_id",
                           F.lit(1).alias("tag")))
    # At equal ts the click row (tag 0) sorts first, realizing the
    # `>=` (at-or-before) bound of the oracle's ASOF condition.
    w = (Window.partitionBy("user_id").orderBy("ts", "tag")
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        clicks.unionByName(purchases)
              .withColumn("click_ts", F.last("click_ts", ignorenulls=True).over(w))
              .filter(F.col("tag") == 1)
              .select("event_id", "user_id", "ts", "click_ts",
                      (F.unix_micros("ts") - F.unix_micros("click_ts"))
                      .alias("gap_us"))
    )


# ---------------------------------------------------------- sessionization

@query(
    "sessionize_events",
    oracle=f"""
        WITH flagged AS (
          SELECT user_id, ts,
                 CASE WHEN LAG(ts) OVER w IS NULL
                        OR epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                           > {SESSION_GAP_US}
                      THEN 1 ELSE 0 END AS is_new
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        numbered AS (
          SELECT user_id, ts,
                 SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sess
          FROM flagged
        )
        SELECT user_id,
               MIN(ts) AS session_start,
               MAX(ts) AS session_end,
               COUNT(*) AS n_events,
               epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us
        FROM numbered
        GROUP BY user_id, sess
    """,
    doc="Gap sessionization (30 min timeout) via Spark's native "
        "session_window — a merging-window aggregate, one shuffle on "
        "(user_id), identical semantics to the streaming stateful "
        "variant. Oracle derives the same sessions with the classic "
        "lag + cumulative-sum rewrite.",
    tags=("timeseries", "session", "window"),
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", SESSION_GAP).alias("w"))
          .agg(F.min("ts").alias("session_start"),
               F.max("ts").alias("session_end"),
               F.count(F.lit(1)).alias("n_events"))
          .select("user_id", "session_start", "session_end", "n_events",
                  (F.unix_micros("session_end") - F.unix_micros("session_start"))
                  .alias("duration_us"))
    )


# ------------------------------------------------- time-hierarchy rollup

@query(
    "events_time_rollup",
    oracle="""
        SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day,
               CASE WHEN GROUPING(date_part('hour', ts)) = 0
                    THEN CAST(date_part('hour', ts) AS INT) END AS hour,
               COUNT(*) AS event_count,
               COUNT(DISTINCT user_id) AS active_users
        FROM events
        GROUP BY ROLLUP (CAST(ts AS DATE), date_part('hour', ts))
        HAVING GROUPING(CAST(ts AS DATE)) = 0
    """,
    doc="Hypertable-style continuous-aggregate rollup: hourly and "
        "daily resolutions in one ROLLUP pass (partial aggregation "
        "map-side, one shuffle). At 100 TB this materializes to a "
        "partitioned table keyed by day — the serving layer for "
        "time-bucketed dashboards.",
    tags=("timeseries", "rollup", "grouping"),
)
def events_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # day kept as midnight TIMESTAMP (not DATE) so the pandas dtype the
    # driver hashes matches the oracle's (DuckDB DATE -> datetime64).
    ev = (load(spark, sf_dir, "events")
          .withColumn("day", F.col("ts").cast("date").cast("timestamp"))
          .withColumn("hour", F.hour("ts")))
    return (
        ev.rollup("day", "hour")
          .agg(F.count(F.lit(1)).alias("event_count"),
               F.countDistinct("user_id").alias("active_users"),
               F.grouping("day").alias("g_day"),
               F.grouping("hour").alias("g_hour"))
          .filter(F.col("g_day") == 0)
          .select("day",
                  F.when(F.col("g_hour") == 0,
                         F.col("hour").cast("int")).alias("hour"),
                  "event_count", "active_users")
    )


# -------------------------------------------------------- exact quantiles

def _quantile_sql(q: str, alias: str) -> str:
    """Manual continuous-quantile interpolation — identical text runs on
    both engines, so the float arithmetic (and thus the hash) matches.
    pos = q*(n-1); value = v[floor(pos)] + frac * (v[floor(pos)+1] - v[floor(pos)]).
    All arithmetic in DOUBLE (both engines use IEEE754 doubles); n is
    constant per group but must appear aggregated, hence MAX(n)."""
    pos = f"(CAST({q} AS DOUBLE) * (MAX(n) - 1))"
    at = "MAX(CASE WHEN rn = CAST(FLOOR(CAST({q} AS DOUBLE) * (n - 1)) AS BIGINT) + {k} THEN value END)"
    lo, hi = at.format(q=q, k=1), at.format(q=q, k=2)
    return f"""
      {lo}
      + ({pos} - FLOOR({pos}))
        * (COALESCE({hi}, {lo}) - {lo})
        AS {alias}
    """


_QUANTILE_BODY = """
    WITH ranked AS (
      SELECT event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    )
    SELECT event_type,
           {p25},
           {p50},
           {p75}
    FROM ranked
    GROUP BY event_type
"""


@query(
    "event_value_quantiles",
    oracle=_QUANTILE_BODY.format(
        p25=_quantile_sql("0.25", "p25"),
        p50=_quantile_sql("0.50", "p50"),
        p75=_quantile_sql("0.75", "p75"),
    ),
    doc="Exact p25/p50/p75 of event value per type — round-7 re-plan: "
        "count per (event_type, exact value) cell in ONE map-side-"
        "combinable aggregate, then rank-select the interpolation "
        "endpoints from the cumulated VALUE-RANGE-BOUNDED cell table "
        "(value at global rank r == smallest cell value whose "
        "cumulative count reaches r; value ties collapse, so the "
        "row_number tiebreak the oracle uses is immaterial). The "
        "previous shape ranked raw rows in windows partitioned only "
        "by the fixed-cardinality event_type — |types| data-sized "
        "sort tasks at 100 TB, the documented window hazard. The "
        "interpolation expression is textually identical to the "
        "oracle's, so the doubles stay bit-identical; "
        "approx_percentile (event_value_quantiles_approx) remains "
        "the sketch variant, with THIS exact form as its error-bound "
        "oracle.",
    tags=("timeseries", "quantile", "window"),
)
def event_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select("event_type", "value")
    cells = (e.groupBy("event_type", "value")
              .agg(F.count(F.lit(1)).cast("long").alias("cnt")))
    wt = Window.partitionBy("event_type")
    c1 = (cells.withColumn(
              "cum", F.sum("cnt").over(
                  wt.orderBy("value").rowsBetween(
                      Window.unboundedPreceding, Window.currentRow)))
               .withColumn("n", F.sum("cnt").over(wt)))
    # value at global rank k (1-based) = MIN value with cum >= k; the
    # frac/position arithmetic is the oracle's expression verbatim
    # (exact-operand IEEE, so any engine evaluates it identically)
    def _cell_q(q: str, alias: str) -> str:
        pos = f"(CAST({q} AS DOUBLE) * (MAX(n) - 1))"
        at = ("MIN(CASE WHEN cum >= CAST(FLOOR(CAST({q} AS DOUBLE)"
              " * (n - 1)) AS BIGINT) + {k} THEN value END)")
        lo, hi = at.format(q=q, k=1), at.format(q=q, k=2)
        return (f"{lo} + ({pos} - FLOOR({pos}))"
                f" * (COALESCE({hi}, {lo}) - {lo}) AS {alias}")
    return c1.groupBy("event_type").agg(
        F.expr(_cell_q("0.25", "p25")),
        F.expr(_cell_q("0.50", "p50")),
        F.expr(_cell_q("0.75", "p75")))


@query(
    "event_value_quantiles_approx",
    oracle=None,  # sketch output is engine-specific by construction
    doc="approx_percentile (mergeable quantile sketch) — the scale "
        "variant of event_value_quantiles: map-side partial sketches, "
        "one tiny shuffle of sketch state, no global sort.",
    tags=("timeseries", "quantile", "approx"),
)
def event_value_quantiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    pct = F.expr("approx_percentile(value, array(0.25D, 0.5D, 0.75D), 10000)")
    return (
        ev.groupBy("event_type")
          .agg(pct.alias("pcts"))
          .select("event_type",
                  F.col("pcts")[0].alias("p25"),
                  F.col("pcts")[1].alias("p50"),
                  F.col("pcts")[2].alias("p75"))
    )


@query(
    "funnel_click_purchase",
    oracle="""
        WITH firsts AS (
          SELECT user_id,
                 MIN(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
                   AS first_click_us,
                 MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
                   AS first_purchase_us
          FROM events
          GROUP BY user_id
        )
        SELECT user_id, first_click_us, first_purchase_us,
               CASE WHEN first_click_us IS NOT NULL
                     AND first_purchase_us IS NOT NULL
                     AND first_purchase_us > first_click_us
                     AND first_purchase_us - first_click_us <= 86400000000
                    THEN 1 ELSE 0 END AS converted_24h
        FROM firsts
        WHERE first_click_us IS NOT NULL
    """,
    doc="Funnel conversion: per user, first click -> first purchase "
        "within 24h. One conditional-MIN aggregate per user (single "
        "shuffle on user_id, map-side combinable) — never a self-join "
        "of the events table against itself. Time arithmetic in exact "
        "epoch microseconds (unix_micros == epoch_us).",
    tags=("timeseries", "funnel"),
)
def funnel_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    first_click = F.min(F.when(F.col("event_type") == "click", us))
    first_purchase = F.min(F.when(F.col("event_type") == "purchase", us))
    f = (ev.groupBy("user_id")
           .agg(first_click.alias("first_click_us"),
                first_purchase.alias("first_purchase_us")))
    converted = (
        F.col("first_click_us").isNotNull()
        & F.col("first_purchase_us").isNotNull()
        & (F.col("first_purchase_us") > F.col("first_click_us"))
        & (F.col("first_purchase_us") - F.col("first_click_us")
           <= 86400000000)
    )
    return (f.filter(F.col("first_click_us").isNotNull())
             .select("user_id", "first_click_us", "first_purchase_us",
                     F.when(converted, 1).otherwise(0).alias("converted_24h")))


@query(
    "cohort_retention",
    oracle="""
        WITH activity AS (
          SELECT DISTINCT user_id, CAST(ts AS DATE) AS active_day
          FROM events
        ),
        cohorts AS (
          SELECT user_id, MIN(active_day) AS cohort_day
          FROM activity GROUP BY user_id
        )
        SELECT CAST(c.cohort_day AS TIMESTAMP) AS cohort_day,
               datediff('day', c.cohort_day, a.active_day) AS day_offset,
               COUNT(*) AS active_users
        FROM activity a JOIN cohorts c ON a.user_id = c.user_id
        GROUP BY 1, 2
    """,
    doc="Cohort retention: users grouped by first-seen day, counted on "
        "each later activity day as (cohort_day, day_offset, "
        "active_users) — the classic retention triangle. Two hash "
        "aggregates plus one equi-join on user_id; the distinct "
        "(user, day) pre-aggregation keeps every later step "
        "per-user-day sized, and at 100 TB cohorts is broadcastable "
        "after the first aggregation collapses users.",
    tags=("timeseries", "cohort"),
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    activity = (ev.select("user_id", F.to_date("ts").alias("active_day"))
                  .distinct())
    cohorts = activity.groupBy("user_id").agg(
        F.min("active_day").alias("cohort_day"))
    return (
        activity.join(cohorts, "user_id")
                .groupBy(F.col("cohort_day").cast("timestamp").alias("cohort_day"),
                         F.datediff("active_day", "cohort_day").alias("day_offset"))
                .agg(F.count(F.lit(1)).alias("active_users"))
    )


# ------------------------------------------------ gap fill + forward fill

# events.value is a full-precision double (not 2-decimal), so exact
# integerization uses FLOOR(value*100) — floor of a double is exact and
# bit-identical on both engines (unlike ROUND, whose half-way rule can
# differ). The sum is then order-insensitive int64.
_VAL_INT = "CAST(FLOOR(value * 100) AS BIGINT)"


@query(
    "gap_fill_forward_fill",
    oracle=f"""
        WITH daily AS (
          SELECT user_id, CAST(ts AS DATE) AS d,
                 SUM({_VAL_INT}) AS rev_c
          FROM events
          GROUP BY user_id, CAST(ts AS DATE)
        ),
        span AS (
          SELECT user_id, MIN(d) AS d0, MAX(d) AS d1 FROM daily GROUP BY user_id
        ),
        spine AS (
          SELECT user_id, CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS d
          FROM span
        )
        SELECT s.user_id, CAST(s.d AS TIMESTAMP) AS day,
               dl.rev_c IS NOT NULL AS observed,
               CAST(last_value(dl.rev_c IGNORE NULLS) OVER (
                      PARTITION BY s.user_id ORDER BY s.d
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS DOUBLE) / 100 AS daily_value
        FROM spine s LEFT JOIN daily dl
          ON dl.user_id = s.user_id AND dl.d = s.d
    """,
    doc="Time-series gap fill: a per-key daily date spine "
        "(sequence+explode — generated distributedly, never a driver "
        "loop) left-joined to observed daily sums, missing days "
        "forward-filled with a running last(ignoreNulls) window. The "
        "spine join and the fill share the same user_id partitioning, "
        "so the whole query is one shuffle on user_id + one window "
        "scan; spine size is O(keys x days), independent of event "
        "count, so it shrinks relative to the data at scale.",
    tags=("timeseries", "gapfill", "window"),
)
def gap_fill_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = (ev.groupBy("user_id", F.col("ts").cast("date").alias("d"))
               .agg(F.sum(F.expr(_VAL_INT)).alias("rev_c")))
    span = daily.groupBy("user_id").agg(F.min("d").alias("d0"),
                                        F.max("d").alias("d1"))
    spine = span.select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("d"))
    w = (Window.partitionBy("user_id").orderBy("d")
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        spine.join(daily, ["user_id", "d"], "left")
             .select("user_id",
                     F.col("d").cast("timestamp").alias("day"),
                     F.col("rev_c").isNotNull().alias("observed"),
                     (F.last("rev_c", ignorenulls=True).over(w)
                       .cast("double") / 100).alias("daily_value"))
    )


# ------------------------------------------------- interval overlap join

OVERLAP_WINDOW_DAYS = 30


@query(
    "interval_overlap_orders",
    oracle=f"""
        SELECT a.o_custkey,
               a.o_orderkey AS key_a, b.o_orderkey AS key_b,
               {OVERLAP_WINDOW_DAYS + 1} - abs(date_diff('day',
                   CAST(a.o_orderdate AS DATE), CAST(b.o_orderdate AS DATE)))
                 AS overlap_days
        FROM orders a JOIN orders b
          ON a.o_custkey = b.o_custkey
         AND a.o_orderkey < b.o_orderkey
         AND abs(date_diff('day', CAST(a.o_orderdate AS DATE),
                           CAST(b.o_orderdate AS DATE))) <= {OVERLAP_WINDOW_DAYS}
    """,
    doc="Interval-overlap self-join: each order spans "
        f"[date, date+{OVERLAP_WINDOW_DAYS}d]; emit overlapping pairs "
        "per customer with the overlap length in days (exact integer "
        "date arithmetic). The equi-key (o_custkey) rides the shuffle "
        "— the inequality is evaluated only within a customer's "
        "bounded order set, so the plan is a plain sort-merge join, "
        "never a cartesian range join; at 100 TB the same shape holds "
        "because pairs-per-key is bounded by orders-per-customer.",
    tags=("timeseries", "join", "interval"),
)
def interval_overlap_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", F.col("o_orderdate").cast("date").alias("d"))
    a = o.alias("a")
    b = o.alias("b")
    dd = F.abs(F.datediff(F.col("a.d"), F.col("b.d")))
    return (
        a.join(b, (F.col("a.o_custkey") == F.col("b.o_custkey"))
                  & (F.col("a.o_orderkey") < F.col("b.o_orderkey"))
                  & (dd <= OVERLAP_WINDOW_DAYS))
         .select(F.col("a.o_custkey").alias("o_custkey"),
                 F.col("a.o_orderkey").alias("key_a"),
                 F.col("b.o_orderkey").alias("key_b"),
                 (F.lit(OVERLAP_WINDOW_DAYS + 1) - dd).alias("overlap_days"))
    )


# ---------------------------------------------- last-touch attribution

@query(
    "last_touch_attribution",
    oracle=f"""
        WITH purchases AS (
          SELECT user_id, ts, {_VAL_INT} AS rev_c
          FROM events WHERE event_type = 'purchase'
        ),
        clicks AS (
          SELECT user_id, ts AS click_ts FROM events WHERE event_type = 'click'
        ),
        attributed AS (
          SELECT p.rev_c, c.click_ts
          FROM purchases p
          ASOF LEFT JOIN clicks c
            ON p.user_id = c.user_id AND p.ts >= c.click_ts
        )
        SELECT CAST(CAST(click_ts AS DATE) AS TIMESTAMP) AS click_day,
               click_ts IS NOT NULL AS attributed,
               COUNT(*) AS n_purchases,
               CAST(SUM(rev_c) AS DOUBLE) / 100 AS attributed_revenue
        FROM attributed
        GROUP BY CAST(CAST(click_ts AS DATE) AS TIMESTAMP),
                 click_ts IS NOT NULL
    """,
    doc="Last-touch revenue attribution: every purchase's value is "
        "credited to the day of the same user's most recent preceding "
        "click (purchases with no prior click fall into an "
        "unattributed bucket). Same single-shuffle as-of mechanics as "
        "asof_join_click_purchase — tagged union + running "
        "last(ignoreNulls) — followed by a tiny day-level rollup; no "
        "range join anywhere, so the plan is linear at any scale.",
    tags=("timeseries", "asof", "attribution"),
)
def last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    clicks = (ev.filter(F.col("event_type") == "click")
                .select("user_id", "ts",
                        F.col("ts").alias("click_ts"),
                        F.lit(None).cast("long").alias("rev_c"),
                        F.lit(0).alias("tag")))
    purchases = (ev.filter(F.col("event_type") == "purchase")
                   .select("user_id", "ts",
                           F.lit(None).cast("timestamp").alias("click_ts"),
                           F.expr(_VAL_INT).alias("rev_c"),
                           F.lit(1).alias("tag")))
    w = (Window.partitionBy("user_id").orderBy("ts", "tag")
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        clicks.unionByName(purchases)
              .withColumn("click_ts",
                          F.last("click_ts", ignorenulls=True).over(w))
              .filter(F.col("tag") == 1)
              .groupBy(F.col("click_ts").cast("date").cast("timestamp")
                        .alias("click_day"),
                       F.col("click_ts").isNotNull().alias("attributed"))
              .agg(F.count(F.lit(1)).alias("n_purchases"),
                   (F.sum("rev_c").cast("double") / 100)
                    .alias("attributed_revenue"))
    )


# --------------------------------------------- recursive date spine

RARE_VALUE_THRESHOLD = 330  # purchases above this are rare (~1%)


@query(
    "recursive_spine_fill",
    oracle=f"""
        WITH RECURSIVE bounds AS (
          -- CAST is load-bearing: DuckDB date_trunc('day', ts) yields
          -- DATE, and a DATE-typed recursive column truncates the
          -- +12h step back to midnight -> infinite recursion.
          SELECT CAST(date_trunc('day', MIN(ts)) AS TIMESTAMP) AS lo,
                 MAX(ts) AS hi
          FROM events
        ),
        spine(bucket, hi) AS (
          SELECT lo, hi FROM bounds
          UNION ALL
          SELECT bucket + INTERVAL 12 HOUR, hi FROM spine
          WHERE bucket + INTERVAL 12 HOUR <= hi
        ),
        rare AS (
          SELECT time_bucket(INTERVAL 12 HOURS, ts) AS bucket,
                 COUNT(*) AS n
          FROM events
          WHERE event_type = 'purchase'
            AND value > {RARE_VALUE_THRESHOLD}
          GROUP BY 1
        )
        SELECT s.bucket, COALESCE(r.n, CAST(0 AS BIGINT)) AS n_rare
        FROM spine s LEFT JOIN rare r USING (bucket)
    """,
    doc="Spark 4 recursive CTE (WITH RECURSIVE, SQL-surface parity "
        "with the DuckDB oracle): generate the complete 12-hour "
        "bucket spine between the corpus' first day and last event "
        "by linear recursion, then left-join sparse rare-event "
        "counts so empty buckets surface as zeros — the dense-"
        "calendar report shape. Linear recursion terminates by "
        "construction (bucket strictly increases toward a fixed "
        "upper bound; depth = #buckets, within Spark's "
        "cteRecursionLevelLimit of 100); the spine is metadata-"
        "sized, so the only corpus-scale work is the one aggregate "
        "over the filtered scan. Complements gap_fill_forward_fill "
        "(sequence()-based spine) by exercising the engine-native "
        "recursive-query surface.",
    tags=("timeseries", "recursive-cte", "spine"),
)
def recursive_spine_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(f"""
        WITH RECURSIVE bounds AS (
          SELECT date_trunc('DAY', MIN(ts)) AS lo, MAX(ts) AS hi
          FROM events
        ),
        spine(bucket, hi) AS (
          SELECT lo, hi FROM bounds
          UNION ALL
          SELECT bucket + INTERVAL 12 HOUR, hi FROM spine
          WHERE bucket + INTERVAL 12 HOUR <= hi
        ),
        rare AS (
          SELECT window(ts, '12 hours').start AS bucket, COUNT(*) AS n
          FROM events
          WHERE event_type = 'purchase'
            AND value > {RARE_VALUE_THRESHOLD}
          GROUP BY 1
        )
        SELECT s.bucket, COALESCE(r.n, CAST(0 AS BIGINT)) AS n_rare
        FROM spine s LEFT JOIN rare r ON s.bucket = r.bucket
    """)


@query(
    "daily_value_quartile_bands",
    oracle="""
        WITH e AS (
          SELECT CAST(ts AS DATE) AS day, event_type,
                 CAST(ROUND(value * 100) AS BIGINT) AS cv
          FROM events
        )
        SELECT day, event_type,
               COUNT(*) AS n_events,
               quantile_cont(cv, 0.25) / 100 AS p25,
               quantile_cont(cv, 0.50) / 100 AS p50,
               quantile_cont(cv, 0.75) / 100 AS p75
        FROM e
        GROUP BY 1, 2
    """,
    doc="Daily value quartile bands per event type — the percentile "
        "trend panel every ops dashboard draws. Exact interpolated "
        "quartiles over integer cents: 0.25/0.5/0.75 are exactly "
        "representable in binary, so pos = p*(n-1), its fractional "
        "part, and the (b-a)*frac interpolation are ALL exact IEEE "
        "operations on both engines regardless of their interpolation "
        "formula — which is precisely why this query uses quartiles "
        "and not p95 (0.95 is inexact and the engines' formulae may "
        "round the last ulp differently). Round-7 re-plan: count per "
        "(day, type, exact-cents) cell in one map-side-combinable "
        "aggregate and rank-select the interpolation endpoints from "
        "the cumulated cell table — percentile() buffered every "
        "group's raw values in a single task (a group is "
        "corpus/(days*types) rows at 100 TB); the cell table is "
        "bounded by calendar x types x value range.",
    tags=("timeseries", "quantile", "aggregate"),
)
def daily_value_quartile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    # day as midnight TIMESTAMP: DuckDB DATE lands in pandas as
    # datetime64, so a Spark DATE would string-render differently
    # (same convention as events_time_rollup).
    e = (load(spark, sf_dir, "events")
         .select(F.col("ts").cast("date").cast("timestamp").alias("day"),
                 "event_type",
                 F.round(F.col("value") * 100).cast("long").alias("cv")))
    cells = (e.groupBy("day", "event_type", "cv")
              .agg(F.count(F.lit(1)).cast("long").alias("cnt")))
    wg = Window.partitionBy("day", "event_type")
    c1 = (cells.withColumn(
              "cum", F.sum("cnt").over(
                  wg.orderBy("cv").rowsBetween(
                      Window.unboundedPreceding, Window.currentRow)))
               .withColumn("n", F.sum("cnt").over(wg)))

    def _cell_q(q: str, alias: str) -> str:
        pos = f"(CAST({q} AS DOUBLE) * (MAX(n) - 1))"
        at = ("MIN(CASE WHEN cum >= CAST(FLOOR(CAST({q} AS DOUBLE)"
              " * (n - 1)) AS BIGINT) + {k} THEN cv END)")
        lo, hi = at.format(q=q, k=1), at.format(q=q, k=2)
        return (f"({lo} + ({pos} - FLOOR({pos}))"
                f" * (COALESCE({hi}, {lo}) - {lo})) / 100 AS {alias}")
    return c1.groupBy("day", "event_type").agg(
        F.max("n").alias("n_events"),
        F.expr(_cell_q("0.25", "p25")),
        F.expr(_cell_q("0.50", "p50")),
        F.expr(_cell_q("0.75", "p75")))


@query(
    "rolling_7d_distinct_users",
    oracle="""
        WITH days AS (
          SELECT DISTINCT CAST(ts AS DATE) AS day FROM events
        ),
        daily AS (
          SELECT CAST(ts AS DATE) AS day, user_id FROM events
        )
        SELECT CAST(d.day AS TIMESTAMP) AS day,
               COUNT(DISTINCT e.user_id) AS wau
        FROM days d JOIN daily e
          ON e.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
        GROUP BY d.day
    """,
    doc="Rolling 7-day distinct users (WAU) per day — EXACT, and "
        "scale-safe with no global window: each distinct (day, user) "
        "pair is exploded into the <=7 window days it contributes to "
        "(sequence(day, day+6)), then a plain "
        "groupBy(window_day).countDistinct(user_id) — Spark's "
        "standard two-phase distinct, fully parallel on the day key. "
        "Row replication is bounded at 7x the distinct pairs; no "
        "task ever holds a per-day user set. Output days are "
        "semi-joined (broadcast, #days rows) to the days actually "
        "present, matching the oracle's days CTE. This is the exact "
        "sibling of weekly_users_hll_rollup: at extreme user "
        "cardinality the HLL sketch rollup (mergeable, fixed-size) "
        "takes over with the same merge shape.",
    tags=("timeseries", "window", "distinct"),
)
def rolling_7d_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (load(spark, sf_dir, "events")
          .select(F.col("ts").cast("date").alias("day"), "user_id"))
    observed_days = ev.select("day").distinct()
    # distinct (day, user) first: map-side partial dedup shrinks the
    # 7x explode input to active-users-per-day, not raw event volume.
    contrib = (ev.distinct()
                 .select(F.explode(
                             F.sequence(F.col("day"),
                                        F.date_add(F.col("day"), 6)))
                          .alias("day"),
                         "user_id"))
    return (contrib
            .join(F.broadcast(observed_days), "day", "left_semi")
            .groupBy("day")
            .agg(F.count_distinct("user_id").alias("wau"))
            .select(F.col("day").cast("timestamp").alias("day"), "wau"))
