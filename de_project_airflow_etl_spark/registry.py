"""Query registry: one named entry per implemented operator.

Every operator from SURVEY.md §2 (and the §7 generalized surface) is
registered here as a ``Query``: a Spark callable ``(spark, sf_dir) ->
DataFrame`` plus, where SQL-expressible, the ANSI-SQL oracle string the
driver runs through DuckDB on the same parquet tables.

Determinism contract (the driver hashes values order-insensitively but
exactly):

* Alias every computed column identically in the Spark plan and the
  oracle SQL.
* Monetary/double aggregations go through DECIMAL so partial-aggregation
  order cannot perturb the result; final values are cast back to DOUBLE
  (exact decimal -> nearest double is deterministic on both engines).
* Timestamps are cast to DATE explicitly on both sides when grouping by
  day (testdata ships timestamps, FIXTURES.md §3).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None, doc: str = "",
          tags: tuple[str, ...] = ()) -> Callable[[QueryFn], QueryFn]:
    """Decorator registering a query implementation."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle,
                                doc=doc or (fn.__doc__ or ""), tags=tags)
        return fn

    return wrap


# The driver's per-round correctness run truncates (~50 rows/round,
# walking ``queries()`` order), so each round hand-plans which 50
# unverified queries fill the window; verified names in this tuple are
# filtered out automatically, so it records the CURRENT round's plan
# (historical rounds' plans live in git history + CORRECTNESS_r*.json).
#
# Round-7 window (36 promoted + new-surface entries, <= ~50): all 294
# round-6 registry entries are driver-verified (CORRECTNESS_r06 landed
# 50/50 green, cumulative 294/294), so the window is free for the 36
# promoted round-6 staged queries (now queries/surfaces_r7.py +
# queries/evaluation.py, VERDICT r6 #1; recorded promotion
# precondition: the full 97-query staged pen swept green at sf0.01 AND
# sf0.1, 2026-08-15) plus any new round-7 surface, which self-promotes
# into the window by registration order.
#
# Truncation is never the only correctness signal: the full registry is
# exercised locally by ``tests/test_correctness.py`` (exact values, all
# queries) and ``scripts/profile_correctness.py`` (hash replica of the
# driver's check) — see those for the complete picture.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # the 12 promoted queries from queries/surfaces_r7.py, in their
    # staged registration order
    "weekly_cohort_triangle", "two_proportion_drift_test",
    "session_duration_log2_histogram", "quality_ensemble_vote",
    "listagg_status_timeline", "macd_daily_revenue",
    "contrastive_triplet_mining", "dedup_method_agreement",
    "sql_scripting_rollup", "recursive_dup_reachability",
    "embedding_rank_normalize_bucketed", "collation_casefold_group",
    # the 24 promoted queries from queries/evaluation.py
    "roc_auc_purchase_value", "welch_t_test_weekend_value",
    "anova_event_type_value", "cramers_v_event_dow",
    "theta_sketch_user_overlap", "map_retrieval_eval",
    "bollinger_daily_revenue", "seasonal_naive_mase",
    "unigram_inverse_prob_by_source", "source_unigram_tv_distance",
    "group_by_all_weekday_mix", "position_attribution_revenue",
    "ols_two_feature_price", "cohens_kappa_quality_rules",
    "param_bound_revenue_floor", "lateral_alias_charge_chain",
    "pivot_multi_agg_segment_status", "try_arithmetic_null_guards",
    "wilson_ci_weekend_share", "unpivot_sql_order_metrics",
    "mcnemar_test_rules", "max_drawdown_daily_revenue",
    "regexp_function_family_stats", "multimodal_audio_chunk_windows",
)


def all_queries() -> dict[str, Query]:
    """Import every query module and return the registry.

    Returned order == the order the driver walks ``queries()``.  The
    driver truncates at ~50 rows/round, so ``_DRIVER_PRIORITY`` (the
    queries still missing a driver CORRECTNESS row) comes first; the
    remainder follows in registration order as re-confirmation of
    already-green queries.
    """
    # Imports deferred so `import registry` never costs a Spark session.
    from de_project_airflow_etl_spark.operators import (  # noqa: F401
        corpus_stats, curation, dedup, quality, similarity, text,
        multimodal, corpus, skew, udtf_ops,
    )
    from de_project_airflow_etl_spark.streaming import (  # noqa: F401
        ingest, stateful, upsert,
    )
    from de_project_airflow_etl_spark.operators import udaf  # noqa: F401
    from de_project_airflow_etl_spark.queries import (  # noqa: F401
        timeseries, scalar, subqueries, grouping,
        flagship, etl, aggregates_ext, relational, joins, windows, setops,
        tpch, analytics, mining, features, surfaces_r6, surfaces_r7,
        evaluation, robust,
    )
    ordered: dict[str, Query] = {}
    verified = _driver_verified()
    # 1. Statically-pinned priority entries that still lack a verified
    #    driver row (the hand-curated plan for the current round).
    for name in _DRIVER_PRIORITY:
        if name in _REGISTRY and name not in verified:
            ordered[name] = _REGISTRY[name]
    # 2. Every other query without a verified row, in registration
    #    order — freshly-added operators self-promote into the window.
    for name, q in _REGISTRY.items():
        if name not in ordered and name not in verified:
            ordered[name] = q
    # 3. Already-verified queries as re-confirmation, registration
    #    order.
    for name, q in _REGISTRY.items():
        if name not in ordered:
            ordered[name] = q
    return ordered


# The recorded driver rounds consulted by ``_driver_verified``,
# PINNED (oldest -> newest, latest wins) rather than globbed: a stale
# or hand-edited CORRECTNESS file in the repo root must not be able to
# silently reorder the verification window. Append each new round's
# file here once its results are adjudicated.
_CORRECTNESS_ROUNDS: tuple[str, ...] = (
    "CORRECTNESS_r01.json",
    "CORRECTNESS_r02.json",
    "CORRECTNESS_r03.json",
    "CORRECTNESS_r04.json",
    "CORRECTNESS_r05.json",
    "CORRECTNESS_r06.json",
    # r07/r08 are listed ahead of adjudication: the files do not exist
    # yet (missing files degrade gracefully), but the moment the driver
    # writes one the rotation self-maintains — latest-round rows win,
    # so any recorded failure demotes its query back into the priority
    # window even if the next session forgets to touch this list.
    "CORRECTNESS_r07.json",
    "CORRECTNESS_r08.json",
)

_DRIVER_VERIFIED_CACHE: set[str] | None = None


def _driver_verified() -> set[str]:
    """Query names that already carry a SATISFIED driver CORRECTNESS
    row in a pinned past round (``_CORRECTNESS_ROUNDS``):
    hash-verified, or rows-only-checked for a query that (still) has
    no oracle.

    The driver truncates its per-round pass at ~50 rows walking
    ``queries()`` order, so ``all_queries`` floats unverified entries
    to the front. Reading the recorded rounds makes that rotation
    self-maintaining: a query whose verification bar rose (e.g. it
    gained an oracle after a rows-only round) automatically counts as
    unverified again. Missing/corrupt files degrade to the static
    ordering. Cached per process — registry contents and the pinned
    round files are fixed for a process lifetime."""
    global _DRIVER_VERIFIED_CACHE
    if _DRIVER_VERIFIED_CACHE is not None:
        return _DRIVER_VERIFIED_CACHE
    import json
    import os
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # Latest round wins per query: a name verified in r1 but recorded
    # FAILING in a later round must demote back into the unverified
    # window, or a regression could hide in the verified tail forever.
    latest: dict[str, dict] = {}

    for path in (os.path.join(root, f) for f in _CORRECTNESS_ROUNDS):
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if isinstance(row, dict) and name in _REGISTRY:
                latest[name] = row
    verified: set[str] = set()
    for name, row in latest.items():
        if row.get("hash_match") is True:
            verified.add(name)
        elif (row.get("err") == "no_oracle"
              and _REGISTRY[name].oracle is None
              and row.get("spark_rows") is not None):
            verified.add(name)
    _DRIVER_VERIFIED_CACHE = verified
    return verified
