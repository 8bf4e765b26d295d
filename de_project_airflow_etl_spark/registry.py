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
# Round-8 window (46 promoted, <= ~50): all 338 round-7 registry
# entries are driver-verified (CORRECTNESS_r07 landed 50/50 green,
# cumulative 338/338), so the whole window is free for the 46
# promoted staged queries (VERDICT r7 #1: round8 -> queries/
# diagnostics.py, round8b -> queries/indicators.py, round8c ->
# queries/surfaces_r8.py, round9 -> queries/surfaces_r9.py; recorded
# promotion precondition: the full 87-query staged pen swept green at
# sf0.01 AND sf0.1, 2026-08-15), leaving ~4 slots for rotation
# re-verifies.
#
# Truncation is never the only correctness signal: the full registry is
# exercised locally by ``tests/test_correctness.py`` (exact values, all
# queries) and ``scripts/profile_correctness.py`` (hash replica of the
# driver's check) — see those for the complete picture.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # the 15 promoted queries from queries/diagnostics.py, in their
    # staged registration order
    "atr_daily_value_range", "stochastic_oscillator_daily",
    "obv_daily_value_flow", "mann_kendall_daily_trend",
    "durbin_watson_trend_residuals", "jarque_bera_daily_revenue",
    "kruskal_wallis_value_by_type", "brown_forsythe_weekend_value",
    "hellinger_weekend_value_drift", "brier_calibration_purchase",
    "cochrans_q_quality_rules", "yules_k_by_source",
    "term_burstiness_vmr", "ndcg_retrieval_eval", "mrr_retrieval_eval",
    # the 13 promoted queries from queries/indicators.py
    "williams_r_daily", "aroon_daily_value", "money_flow_index_daily",
    "donchian_channel_daily", "chande_momentum_daily",
    "accum_dist_daily_flow", "wilcoxon_signed_rank_ampm",
    "sign_test_daily_updown", "mood_median_test_event_type",
    "friedman_dow_value_ranks", "jonckheere_terpstra_value_by_type",
    "per_class_f1_length_rules", "cramer_von_mises_weekend",
    # the 7 promoted queries from queries/surfaces_r8.py
    "zipf_rank_frequency_table", "bowley_skewness_by_type",
    "stack_generator_charge_mix", "offset_window_90m_revenue",
    "hash_bootstrap_mean_ci", "arc_price_elasticity_brand",
    "dim_truncation_recall_audit",
    # the 11 promoted queries from queries/surfaces_r9.py
    "readability_indices_by_source", "resource_allocation_link_pred",
    "theil_u_daily_forecasts", "pages_trend_test_dow",
    "ece_calibration_purchase", "runs_test_daily_updown",
    "filter_clause_weekday_mix", "ild_retrieval_diversity",
    "rescaled_range_daily", "named_window_daily_stats",
    "streaming_stream_stream_full_join",
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
        evaluation, robust, diagnostics, indicators, surfaces_r8,
        surfaces_r9,
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
    "CORRECTNESS_r07.json",
    # r08/r09 are listed ahead of adjudication: the files do not exist
    # yet (missing files degrade gracefully), but the moment the driver
    # writes one the rotation self-maintains — latest-round rows win,
    # so any recorded failure demotes its query back into the priority
    # window even if the next session forgets to touch this list.
    "CORRECTNESS_r08.json",
    "CORRECTNESS_r09.json",
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
