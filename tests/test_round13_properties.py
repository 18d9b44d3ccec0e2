"""Hypothesis property tests for the round-13 third-wave algorithmic
machinery — the MATH the staged rows rely on, checked over random
inputs with no Spark session (the staged rows themselves carry the
Spark-vs-DuckDB oracle and the fixed-corpus witnesses; these pin the
underlying theorems so a future refactor cannot silently weaken them).

- Prefix-filter completeness (setsim_prefix_filter_join): for ANY doc
  collection and the rarest-first global order, every pair with
  Jaccard >= 3/5 shares at least one token inside BOTH prefixes of
  length n - ceil(3n/5) + 1 — the AllPairs theorem, zero false
  negatives by construction.
- Interval island-merge algebra (repeated_span_cut_plan /
  doc_span_interval_union): merged-island total length equals the
  cardinality of the covered-position set, and the island count
  equals the number of maximal runs.
- KMV merge identity (kmv_sketch_union_merge_certified): the k
  smallest of the union of per-source k-min sketches equal the k
  smallest of the full distinct union, for any partition of any
  value multiset into sources.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

K_JACC_NUM, K_JACC_DEN = 3, 5  # threshold 0.6 as an exact rational


def _prefix_len(n: int) -> int:
    return n - (K_JACC_NUM * n + K_JACC_DEN - 1) // K_JACC_DEN + 1


@given(
    st.lists(
        st.sets(st.integers(min_value=0, max_value=40), min_size=1),
        min_size=2,
        max_size=12,
    )
)
@settings(max_examples=300, deadline=None)
def test_prefix_filter_never_loses_a_qualifying_pair(docs):
    from collections import Counter

    df = Counter(t for d in docs for t in d)
    order = {t: (df[t], t) for t in df}
    prefixes = [
        set(sorted(d, key=lambda t: order[t])[: _prefix_len(len(d))])
        for d in docs
    ]
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            inter = len(docs[i] & docs[j])
            union = len(docs[i] | docs[j])
            if inter * K_JACC_DEN >= K_JACC_NUM * union:
                assert prefixes[i] & prefixes[j], (
                    f"qualifying pair {i},{j} missed by prefix filter"
                )


@given(
    st.lists(
        st.integers(min_value=1, max_value=300),
        min_size=0,
        max_size=60,
    )
)
@settings(max_examples=300, deadline=None)
def test_island_merge_equals_covered_position_set(starts):
    width = 16
    covered = set()
    for s in starts:
        covered.update(range(s, s + width))
    ss = sorted(set(starts))
    islands = 0
    total = 0
    cur_lo = cur_hi = None
    for s in ss:
        if cur_hi is None or s > cur_hi:
            if cur_hi is not None:
                total += cur_hi - cur_lo
            islands += 1
            cur_lo, cur_hi = s, s + width
        else:
            cur_hi = max(cur_hi, s + width)
    if cur_hi is not None:
        total += cur_hi - cur_lo
    assert total == len(covered)
    runs = 0
    prev_in = False
    for p in range(0, 320 + width):
        now_in = p in covered
        if now_in and not prev_in:
            runs += 1
        prev_in = now_in
    assert islands == runs


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=0, max_value=10_000),
        ),
        min_size=1,
        max_size=400,
    ),
    st.integers(min_value=1, max_value=16),
)
@settings(max_examples=300, deadline=None)
def test_kmv_union_merge_identity(pairs, k):
    per_src: dict[int, set] = {}
    for src, v in pairs:
        per_src.setdefault(src, set()).add(v)
    union_of_sketches: set = set()
    all_v: set = set()
    for vs in per_src.values():
        union_of_sketches.update(sorted(vs)[:k])
        all_v.update(vs)
    assert sorted(union_of_sketches)[:k] == sorted(all_v)[:k]
