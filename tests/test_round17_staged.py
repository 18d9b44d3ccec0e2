"""Second witnesses for the round-17 staged cohort (the round-18
staging area, plans/next_round.py), beyond the value-hash oracle
(tests/test_next_round.py): each operator's result is re-derived by an
INDEPENDENT brute-force twin in plain Python over the collected slice.
(The held-back team_draft_interleave_k6_generated row keeps its witness
in tests/test_round16_staged.py under its original staging name.)
"""

from __future__ import annotations

import hashlib
from collections import Counter

from sparkksqldbbenchmark_spark.catalog import load_table
from sparkksqldbbenchmark_spark.plans.next_round import STAGED

SF_DIR = "/root/testdata/sf0.001"


def _md5int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_good_turing_matches_counter_replay(spark):
    """The frequency-of-frequencies table and both smoothing ratios
    re-derived with collections.Counter and plain integer floor
    division."""
    rows = load_table(spark, SF_DIR, "documents").select(
        "text"
    ).collect()
    counts = Counter()
    for r in rows:
        ws = r.text.split(" ")
        for i in range(len(ws) - 2):
            counts[" ".join(ws[i : i + 3])] += 1
    fof = Counter(counts.values())
    n = sum(counts.values())
    n1 = fof.get(1, 0)
    got = {
        r.r: r
        for r in STAGED["good_turing_frequency_smoothing"](
            spark, SF_DIR
        ).collect()
    }
    assert set(got) == set(fof)
    for r, n_r in fof.items():
        g = got[r]
        n_next = fof.get(r + 1, 0)
        assert g.n_r == n_r, r
        assert g.n_r_next == n_next, r
        assert g.r_star_ppm == (r + 1) * n_next * 1000000 // n_r, r
        assert g.total_tokens == n
        assert g.p_unseen_ppm == n1 * 1000000 // n
    # the fixture corpus must exercise the smoothing non-trivially:
    # a populated next class somewhere and a vacant one somewhere
    assert any(
        fof.get(r + 1, 0) > 0 for r in fof
    ) and any(fof.get(r + 1, 0) == 0 for r in fof)
    assert 0 < n1 < n  # unseen mass is a proper fraction
