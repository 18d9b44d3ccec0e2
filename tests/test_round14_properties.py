"""Hypothesis property tests for the round-14 staged algebra — the
MATH the staged rows rely on, checked over random inputs with no
Spark session (the rows themselves carry the Spark-vs-DuckDB oracle
and the fixed-corpus witnesses; these pin the underlying theorems so
a refactor cannot silently weaken them).

- Water-filling closed form (waterfill_budget_allocation): for ANY
  multiset of totals and any budget <= sum, the index-arithmetic
  level (largest feasible i*, L = (B - P_i*) div (n - i*), remainder
  to the first unsaturated) equals the unit-by-unit simulation, sums
  exactly to min(B, total), never exceeds any availability, and is
  max-min fair (unsaturated allocations within 1 of each other).
- Kappa integer-pair identity (cohens_kappa_exact): for ANY label
  pairing, (N·agree − Σ rᵢcᵢ) / (N² − Σ rᵢcᵢ) equals
  (po − pe)/(1 − pe) as exact rationals whenever pe < 1.
"""

from __future__ import annotations

from collections import Counter
from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st


def waterfill_closed_form(totals: dict[str, int], budget: int):
    """The staged row's algebra, replicated in plain Python."""
    items = sorted(totals.items(), key=lambda kv: (kv[1], kv[0]))
    n = len(items)
    pfx = 0
    i_star, p_star = 0, 0
    for rk, (_, t) in enumerate(items, start=1):
        pfx += t
        if pfx + t * (n - rk) <= budget:
            i_star, p_star = rk, pfx
    if n > i_star:
        lvl = (budget - p_star) // (n - i_star)
        rem = (budget - p_star) % (n - i_star)
    else:
        lvl = max(totals.values())
        rem = 0
    unsat = sorted(s for rk, (s, t) in enumerate(items, start=1)
                   if rk > i_star)
    alloc = {}
    for rk, (s, t) in enumerate(items, start=1):
        if rk <= i_star:
            alloc[s] = t
        else:
            alloc[s] = lvl + (1 if unsat.index(s) < rem else 0)
    return alloc, lvl


def waterfill_simulate(totals: dict[str, int], budget: int):
    """The direct definition: raise the common level one unit at a
    time while the budget allows, then +1 the first unsaturated."""
    alloc = {s: 0 for s in totals}
    level = 0
    while True:
        unsat = [s for s in totals if totals[s] > level]
        if not unsat or sum(alloc.values()) + len(unsat) > budget:
            break
        level += 1
        for s in totals:
            alloc[s] = min(totals[s], level)
    rem = budget - sum(alloc.values())
    for s in sorted(s for s in totals if totals[s] > level)[:rem]:
        alloc[s] += 1
    return alloc


@settings(max_examples=300, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=500),
             min_size=1, max_size=12),
    st.integers(min_value=0, max_value=6000),
)
def test_waterfill_closed_form_equals_simulation(tots, budget):
    totals = {f"s{i:02d}": t for i, t in enumerate(tots)}
    budget = min(budget, sum(totals.values()))
    closed, lvl = waterfill_closed_form(totals, budget)
    sim = waterfill_simulate(totals, budget)
    assert closed == sim
    assert sum(closed.values()) == budget
    for s, a in closed.items():
        assert 0 <= a <= totals[s]
    unsat = [a for s, a in closed.items() if a < totals[s]]
    if unsat:
        assert max(unsat) - min(unsat) <= 1
        # no saturated source may sit ABOVE an unsaturated allocation
        # + 1 (max-min fairness: you cannot take from the rich to
        # give the poor without crossing availability)
        for s, a in closed.items():
            if a == totals[s]:
                assert a <= max(unsat) + 1 or a <= lvl + 1


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 2)),
        min_size=1,
        max_size=60,
    )
)
def test_kappa_integer_pair_equals_fraction_form(pairs):
    n = len(pairs)
    agree = sum(1 for a, b in pairs if a == b)
    ra = Counter(a for a, _ in pairs)
    cb = Counter(b for _, b in pairs)
    chance = sum(ra[k] * cb[k] for k in set(ra) | set(cb))
    num = n * agree - chance
    den = n * n - chance
    if den == 0:
        # pe == 1: every pair lands in one (a, b) margin product —
        # kappa undefined; the staged row never divides so it simply
        # carries (num, den) = (0, 0) here. Nothing to check.
        assert num == 0
        return
    po = Fraction(agree, n)
    pe = Fraction(chance, n * n)
    assert Fraction(num, den) == (po - pe) / (1 - pe)


def _hrw_owner(key: int, n: int, mask: int = 36028797018963967):
    import hashlib

    def k(s):
        h = int(
            hashlib.md5(f"{key}#{s}".encode()).hexdigest()[:15], 16
        )
        return (h & mask) * 16 + (15 - s)

    return max(range(n), key=k)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=10**9),
             min_size=1, max_size=40, unique=True),
    st.integers(min_value=1, max_value=14),
)
def test_hrw_minimal_disruption_for_any_growth(keys, n):
    """The rendezvous theorem over arbitrary key sets and shard
    counts: growing n -> n+1, a key either keeps its owner or moves
    to the NEW shard — never between old shards. (The staged row
    grades the 8 -> 9 instance; this pins the general claim the
    packed-key argmax construction rests on.)"""
    for key in keys:
        o1 = _hrw_owner(key, n)
        o2 = _hrw_owner(key, n + 1)
        assert o2 == o1 or o2 == n
