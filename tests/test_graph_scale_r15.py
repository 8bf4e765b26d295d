"""Planted-ground-truth scale stress for the round-15 graph operator:
the truncated-harmonic BFS must produce the closed-form scores on
synthetic graphs whose distances are known analytically — a long
chain (every interior node sees exactly 2 nodes at each distance
1..4) and a star (the hub sees n-1 at distance 1, every leaf sees
the hub at 1 and the other leaves at 2). The chain runs at 60k nodes
so the frontier anti-join path is exercised well past the testdata's
dup-graph size; radius-capping keeps the state linear in edges, so
this is the 100 TB shape in miniature.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from de_project_airflow_etl_spark.queries.attribution import _harmonic_bfs

CHAIN_N = 60_000


def test_harmonic_bfs_on_planted_chain(spark):
    pairs = (spark.range(CHAIN_N - 1)
             .selectExpr("id AS doc_a", "id + 1 AS doc_b"))
    hc = _harmonic_bfs(pairs).localCheckpoint()
    # interior nodes (4 <= i <= n-5): two nodes at each d in 1..4
    # -> reachable 8, hc12 = 2*(12+6+4+3) = 50
    interior = hc.filter((F.col("src") >= 4)
                         & (F.col("src") <= CHAIN_N - 5))
    bad = interior.filter("reachable_4 <> 8 OR harmonic_x12 <> 50")
    assert bad.isEmpty()
    assert interior.count() == CHAIN_N - 8
    # an endpoint sees one node at each d in 1..4
    end = hc.filter("src = 0").collect()[0]
    assert (end.reachable_4, end.harmonic_x12) == (4, 12 + 6 + 4 + 3)
    # node 1: one at d=1 (node 0), one at d=1 (node 2), then one each
    # at d=2,3,4 on the right and nothing further left
    n1 = hc.filter("src = 1").collect()[0]
    assert (n1.reachable_4, n1.harmonic_x12) == (5, 24 + 6 + 4 + 3)


def test_harmonic_bfs_on_planted_star(spark):
    n_leaves = 500
    pairs = (spark.range(1, n_leaves + 1)
             .selectExpr("CAST(0 AS BIGINT) AS doc_a", "id AS doc_b"))
    hc = _harmonic_bfs(pairs).localCheckpoint()
    hub = hc.filter("src = 0").collect()[0]
    assert (hub.reachable_4, hub.harmonic_x12) == (n_leaves,
                                                   12 * n_leaves)
    # each leaf: hub at d=1, the other n-1 leaves at d=2
    leaf_bad = hc.filter("src <> 0").filter(
        f"reachable_4 <> {n_leaves} OR "
        f"harmonic_x12 <> {12 + 6 * (n_leaves - 1)}")
    assert leaf_bad.isEmpty()


def test_harmonic_bfs_triangle_with_tail(spark):
    # triangle 0-1-2 plus tail 2-3-4: hand-computed distances
    edges = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4)]
    pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    hc = {r.src: (r.reachable_4, r.harmonic_x12)
          for r in _harmonic_bfs(pairs).collect()}
    # node0: d1={1,2}, d2={3}, d3={4}  -> 24+6+4 = 34
    # node2: d1={0,1,3}, d2={4}        -> 36+6
    # node4: d1={3}, d2={2}, d3={0,1}  -> 12+6+8
    assert hc[0] == (4, 34)
    assert hc[1] == (4, 34)
    assert hc[2] == (4, 42)
    assert hc[3] == (4, 12 * 2 + 6 * 2)
    assert hc[4] == (4, 26)


import pytest  # noqa: E402  (tier mark below)

# r11 test tiering: multi-minute sweep/scale/property module —
# excluded from the default (driver-budget) run; run with
# -m "slow or not slow" for the full signal (see pytest.ini).
pytestmark = pytest.mark.slow
