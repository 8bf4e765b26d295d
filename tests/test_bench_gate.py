"""The perf-regression gate: BENCH_BASELINE.json is the recorded bar
(re-recorded in round 3 under the best-of-2 cold-cache methodology —
see its "note" field); ``python bench.py --gate`` fails when the
headline set regresses. The comparison logic is unit-tested here so
the gate itself stays trustworthy; the full sf0.1 bench run is a
per-round CLI step, not a pytest fixture cost."""

from __future__ import annotations

import json
import os

from bench import HEADLINE, gate_failures

BASELINE = json.load(open(os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "BENCH_BASELINE.json")))


def test_baseline_file_matches_headline_set():
    # every baseline query still exists in the headline set (renames
    # would silently drop coverage from the gate)
    assert set(BASELINE["queries"]) <= set(HEADLINE)
    assert BASELINE["value"] > 0
    assert abs(sum(BASELINE["queries"].values())
               - BASELINE["value"]) < 0.01


def test_gate_passes_at_baseline():
    assert gate_failures(BASELINE["value"], BASELINE["queries"],
                         BASELINE["value"], BASELINE["queries"]) == []


def test_gate_trips_on_total_regression():
    bad_total = BASELINE["value"] * 2.1
    fails = gate_failures(bad_total, BASELINE["queries"],
                          BASELINE["value"], BASELINE["queries"])
    assert any("total" in f for f in fails)


def test_gate_trips_on_single_query_regression():
    timings = dict(BASELINE["queries"])
    timings["pricing_summary"] *= 1.6
    fails = gate_failures(sum(timings.values()), timings,
                          BASELINE["value"], BASELINE["queries"])
    assert any("pricing_summary" in f for f in fails)


def test_gate_ignores_new_queries():
    timings = dict(BASELINE["queries"])
    timings["brand_new_query"] = 99.0
    fails = gate_failures(BASELINE["value"], timings,
                          BASELINE["value"], BASELINE["queries"])
    assert fails == []
