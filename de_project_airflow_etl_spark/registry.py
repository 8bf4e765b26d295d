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
# walking ``queries()`` order).  Rounds 1+2 covered 100/124 queries; the
# 24 below never received a driver row because they sat past the cap in
# both orderings.  They are pinned FIRST so round 3 closes the gap, with
# ``ann_ivf_kmeans_fit`` (newly oracle-verified) alongside them.
#
# Truncation is never the only correctness signal: the full registry is
# exercised locally by ``tests/test_correctness.py`` (exact values, all
# queries) and ``scripts/profile_correctness.py`` (hash replica of the
# driver's check) — see those for the complete picture.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # queries/scalar.py — 10, never driver-tested
    "string_functions", "like_regexp_filter", "date_functions",
    "math_functions", "json_extraction", "null_handling",
    "array_functions", "map_functions", "variant_json_events",
    "interval_arithmetic",
    # queries/subqueries.py — 5, never driver-tested
    "scalar_subquery_above_avg", "in_subquery_building_orders",
    "correlated_exists_recent_buyers", "derived_table_top_nations",
    "lateral_top_orders_per_nation",
    # queries/grouping.py — 5, never driver-tested
    "rollup_quantity", "cube_order_priority", "grouping_sets_flags",
    "pivot_status_by_segment", "unpivot_nation_metrics",
    # set-op ALL variants — never driver-tested
    "intersect_all_nations", "except_all_nations",
    # timeseries tail — never driver-tested
    "interval_overlap_orders", "last_touch_attribution",
    # newly value-verified this round (was rows-only in r2)
    "ann_ivf_kmeans_fit",
    # new in round 3: corpus-curation operators (operators/curation.py)
    # + incremental rollup maintenance (queries/etl.py)
    "corpus_hash_split", "corpus_stratified_sample", "pack_sequences",
    "contamination_check", "profile_documents", "ewma_user_values",
    "zorder_locality_events", "corpus_shuffle_shards",
    "incremental_week_rollup", "dedup_consecutive_events",
    "value_decile_bins",
    # new in round 3, second batch: quality/repetition family
    # (operators/quality.py) + mixture/chunk/cap curation ops +
    # int8 embedding quantization
    "gopher_repetition_stats", "collapse_repeated_tokens",
    "bpe_pair_counts", "mixture_weighted_sample", "doc_chunk_windows",
    "source_cap_docs", "embedding_int8_quantize",
    # third batch: blocklist/DQ-gate/masking + holdout/temporal-split/
    # transition-matrix ops — 49 priority entries total, still within
    # the driver's ~50-row window
    "blocklist_filter", "dq_expectations", "mask_numeric_props",
    "eval_holdout_sample", "temporal_split_leakage",
    "user_event_transitions",
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
    from de_project_airflow_etl_spark.queries import (  # noqa: F401
        timeseries, scalar, subqueries, grouping,
        flagship, etl, aggregates_ext, relational, joins, windows, setops,
        tpch,
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
    # r04/r05 are listed ahead of adjudication: the files do not exist
    # yet (missing files degrade gracefully), but the moment the driver
    # writes one the rotation self-maintains — latest-round rows win,
    # so any recorded failure demotes its query back into the priority
    # window even if the next session forgets to touch this list.
    "CORRECTNESS_r04.json",
    "CORRECTNESS_r05.json",
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
