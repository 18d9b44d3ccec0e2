"""Invariant tests for the round-15 slot-filler rows
(plans/round15_queries.py), beyond the value-hash oracle: each result
is re-derived by an INDEPENDENT brute-force twin in plain Python over
the collected slice — a second witness sharing none of the SQL
machinery, the standard every graded cohort carries.
"""

from __future__ import annotations

from collections import Counter

import sparkksqldbbenchmark_spark.plans.round15_queries as r15
from sparkksqldbbenchmark_spark.catalog import load_table
from sparkksqldbbenchmark_spark.plans.registry import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_gk_union_merge_matches_python_walk(spark):
    """The sharded summary, the weighted merge, the median estimate,
    and the exact-rank certificate all re-derived row-by-row in plain
    Python — including the mergeability bound checked against the
    DIRECT exact median rank, not just the query's own arithmetic."""
    K, S = r15._GK_K, r15._GK_SHARDS
    ev = load_table(spark, SF_DIR, "events").select(
        "event_type", "user_id", "value", "event_id"
    ).collect()
    import math

    by_type = {}
    for r in ev:
        by_type.setdefault(r.event_type, []).append(
            (r.user_id % S, math.floor(r.value * 100), r.event_id)
        )
    got = {
        r.event_type: r
        for r in QUERIES["gk_summary_union_merge_certified"](
            spark, SF_DIR
        ).collect()
    }
    assert set(got) == set(by_type)
    for et, rows in by_type.items():
        # per-shard equi-spaced summaries
        summary = []  # (cents, event_id, weight)
        for sh in range(S):
            vals = sorted(
                [(c, eid) for s, c, eid in rows if s == sh]
            )
            for i in range(0, len(vals), K):
                c, eid = vals[i]
                summary.append((c, eid, min(K, len(vals) - i)))
        # weighted merge: first point whose cumweight crosses half
        summary.sort(key=lambda t: (t[0], t[1]))
        tw = sum(w for _, _, w in summary)
        cw = 0
        est = None
        for c, eid, w in summary:
            cw += w
            if 2 * cw >= tw:
                est = c
                break
        n = len(rows)
        below = sum(1 for _, c, _ in rows if c < est)
        ties = sum(1 for _, c, _ in rows if c == est)
        g = got[et]
        assert g.n == n
        assert g.est_cents == est, et
        assert g.below == below and g.ties == ties, et
        # the mergeability theorem, asserted directly: the estimate's
        # exact rank interval [below, below+ties] must intersect
        # n/2 +/- S*K
        assert below <= n / 2 + S * K
        assert below + ties >= n / 2 - S * K
        assert bool(g.within_merge_bound) is True, et


def test_psi_drift_bins_match_counter_walk(spark):
    """The half-split, binning, cross-multiplied ratio flags and
    drifted-mass ordering re-derived with Counters and integer
    arithmetic only."""
    import math

    ev = load_table(spark, SF_DIR, "events").select(
        "event_type", "ts", "value"
    ).collect()
    us = [int(r.ts.timestamp() * 1_000_000) for r in ev]
    t0, t1 = min(us), max(us)
    halfspan = (t1 - t0) // 2
    B = r15._PSI_BINS
    cnt = Counter()
    for r, u in zip(ev, us):
        half = 0 if u - t0 < halfspan else 1
        b = min(B - 1, max(0, math.floor(r.value / 10.0)))
        cnt[(r.event_type, half, b)] += 1
    types = {r.event_type for r in ev}
    got = {
        (r.event_type, r.bin): r
        for r in QUERIES["psi_drift_bins_exact"](spark, SF_DIR).collect()
    }
    assert len(got) == len(types) * B
    for et in types:
        na_tot = sum(cnt[(et, 0, b)] for b in range(B))
        nb_tot = sum(cnt[(et, 1, b)] for b in range(B))
        ranked = sorted(
            range(B),
            key=lambda b: (
                -abs(
                    cnt[(et, 0, b)] * nb_tot - cnt[(et, 1, b)] * na_tot
                ),
                b,
            ),
        )
        for b in range(B):
            n_a, n_b = cnt[(et, 0, b)], cnt[(et, 1, b)]
            g = got[(et, b)]
            assert (g.n_a, g.n_b) == (n_a, n_b), (et, b)
            assert bool(g.ratio_drift) == (
                2 * n_a * nb_tot < n_b * na_tot
                or 2 * n_b * na_tot < n_a * nb_tot
            ), (et, b)
            assert g.mass_diff_x == abs(n_a * nb_tot - n_b * na_tot)
            assert g.drift_rank == ranked.index(b) + 1, (et, b)


def test_psi_empty_bin_flags_drift(spark):
    """A bin populated in exactly one half must flag (the high-PSI
    case the grid materialization exists for) whenever the populated
    side is non-trivial — by construction of the cross-multiplied
    test, n_a=0, n_b>=1 flags iff n_a*nb_tot ... 2*0 < n_b*na_tot,
    i.e. always when the OTHER half has any mass at all."""
    rows = QUERIES["psi_drift_bins_exact"](spark, SF_DIR).collect()
    tot = {}
    for r in rows:
        a, b = tot.get(r.event_type, (0, 0))
        tot[r.event_type] = (a + r.n_a, b + r.n_b)
    for r in rows:
        na_tot, nb_tot = tot[r.event_type]
        if r.n_a == 0 and r.n_b > 0 and na_tot > 0:
            assert bool(r.ratio_drift) is True
        if r.n_b == 0 and r.n_a > 0 and nb_tot > 0:
            assert bool(r.ratio_drift) is True
