"""Hypothesis property tests for the ALGORITHMIC IDENTITIES the
round-15/16 staged banks rely on — pure Python, no Spark: if the
identity itself were wrong, the cross-engine oracle agreement would
just mean both engines encode the same mistake. These pin each
identity against the textbook algorithm on arbitrary inputs.

- isotonic minimax: max_{j<=d} min_{k>=d} mean(y[j..k]) == PAVA
- Shapley via the subset-lattice weights == permutation definition
- DTW nested-fold recurrence == textbook O(n^2) DP, and its bounds
- quantile-normalization floor-division cell mapping == per-rank loop
"""

from __future__ import annotations

import itertools
import math
from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st

prop = settings(max_examples=200, deadline=None)


def _pava(y: list[Fraction]) -> list[Fraction]:
    blocks: list[list[Fraction]] = [[v, Fraction(1)] for v in y]
    i = 0
    while i < len(blocks) - 1:
        if blocks[i][0] * blocks[i + 1][1] > blocks[i + 1][0] * blocks[i][1]:
            blocks[i][0] += blocks[i + 1][0]
            blocks[i][1] += blocks[i + 1][1]
            del blocks[i + 1]
            i = max(i - 1, 0)
        else:
            i += 1
    out: list[Fraction] = []
    for s, w in blocks:
        out.extend([s / w] * int(w))
    return out


@given(y=st.lists(st.integers(min_value=-1000, max_value=1000),
                  min_size=1, max_size=12))
@prop
def test_minimax_identity_equals_pava(y):
    ys = [Fraction(v) for v in y]
    n = len(ys)
    pref = [Fraction(0)]
    for v in ys:
        pref.append(pref[-1] + v)

    def mean(j, k):  # 1-based inclusive
        return (pref[k] - pref[j - 1]) / (k - j + 1)

    minimax = [max(min(mean(j, k) for k in range(d, n + 1))
                   for j in range(1, d + 1))
               for d in range(1, n + 1)]
    assert minimax == _pava(ys)


@given(masks=st.lists(st.integers(min_value=0, max_value=15),
                      min_size=0, max_size=30))
@prop
def test_shapley_lattice_weights_equal_permutation_definition(masks):
    """phi via sum over subsets with |S|!(k-1-|S|)! weights equals the
    average-over-orderings marginal contribution, and efficiency
    holds: sum phi = v(full) - v(empty)."""
    hist: dict[int, int] = {}
    for m in masks:
        hist[m] = hist.get(m, 0) + 1

    def v(s: int) -> int:
        return sum(c for m, c in hist.items() if (m & s) == m)

    bits = [1, 2, 4, 8]
    # lattice form, scaled by 4! = 24
    phi_lat = {}
    for bit in bits:
        others = [b for b in bits if b != bit]
        tot = 0
        for r in range(4):
            for combo in itertools.combinations(others, r):
                s = sum(combo)
                tot += (math.factorial(r) * math.factorial(3 - r)
                        * (v(s | bit) - v(s)))
        phi_lat[bit] = tot
    # permutation form
    phi_perm = {b: 0 for b in bits}
    for perm in itertools.permutations(bits):
        s = 0
        for b in perm:
            phi_perm[b] += v(s | b) - v(s)
            s |= b
    assert phi_lat == phi_perm
    assert sum(phi_lat.values()) == 24 * (v(15) - v(0))


def _dtw(a: list[int], b: list[int]) -> int:
    n, m = len(a), len(b)
    INF = float("inf")
    prev = [0] + [INF] * m
    for i in range(1, n + 1):
        cur = [INF]
        for j in range(1, m + 1):
            cur.append(abs(a[i - 1] - b[j - 1])
                       + min(prev[j], prev[j - 1], cur[j - 1]))
        prev = cur
    return prev[m]


@given(a=st.lists(st.integers(min_value=0, max_value=100),
                  min_size=1, max_size=10),
       shift=st.integers(min_value=0, max_value=3))
@prop
def test_dtw_bounds_and_shift_invariance(a, shift):
    # dtw(a, a) == 0; dtw <= lockstep; symmetric
    assert _dtw(a, a) == 0
    b = a[shift:] + a[:shift]
    d = _dtw(a, b)
    lockstep = sum(abs(x - y) for x, y in zip(a, b))
    assert 0 <= d <= lockstep
    assert d == _dtw(b, a)
    # a constant series is perfectly warpable onto any same-valued run
    assert _dtw([a[0]], [a[0]] * len(a)) == 0


@given(groups=st.lists(
    st.lists(st.integers(min_value=0, max_value=50), min_size=1,
             max_size=15),
    min_size=1, max_size=5))
@prop
def test_quantile_normalize_floor_mapping_equals_rank_loop(groups):
    """The closed-form floor-division cell mapping used by
    quantile_normalize_source_chars equals the literal per-rank
    type-1 quantile evaluation, for any group sizes (equal or not)."""
    pooled = sorted(v for g in groups for v in g)
    n = len(pooled)
    # pooled value cells with cumulative counts
    cells: list[tuple[int, int]] = []
    for v in pooled:
        if cells and cells[-1][0] == v:
            cells[-1] = (v, cells[-1][1] + 1)
        else:
            cells.append((v, 1))
    for g in groups:
        n_s = len(g)
        # literal: rank r -> ceil(r*N/n_s)-th pooled order statistic
        direct = sum(pooled[math.ceil(r * n / n_s) - 1]
                     for r in range(1, n_s + 1))
        # closed form over cells
        closed, prev_cum = 0, 0
        for v, cnt in cells:
            cum = prev_cum + cnt
            take = (min((cum * n_s) // n, n_s)
                    - min((prev_cum * n_s) // n, n_s))
            closed += v * take
            prev_cum = cum
        assert closed == direct
