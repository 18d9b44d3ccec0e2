"""Oracle verification for the round-7 staging area (plans/next_round.py).

Runs every staged query on Spark and its DuckDB oracle twin over the same
sf0.001 parquet, comparing row count, sorted column names, and the
order-insensitive canonical value hash — the identical procedure
tools/check_correctness.py replicates from the driver. A staged query is
rotation-ready only when it passes here (and at sf0.01/sf0.1 via
CHECK_SF_DIR).
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from check_correctness import TABLES, canon_rows  # noqa: E402

from sparkksqldbbenchmark_spark.plans.next_round import (  # noqa: E402
    STAGED,
    STAGED_ORACLE,
)

SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    yield con
    con.close()


def test_every_staged_query_has_oracle():
    assert set(STAGED) == set(STAGED_ORACLE)
    assert STAGED, "staging area unexpectedly empty"


@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_query_matches_oracle(spark, duck, name):
    sdf = STAGED[name](spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(STAGED_ORACLE[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()

    assert sorted(scols) == sorted(ocols), f"{name}: column names differ"
    assert len(srows) == len(orows), (
        f"{name}: rows {len(srows)} vs oracle {len(orows)}"
    )
    sh, slines = canon_rows(scols, srows)
    oh, olines = canon_rows(ocols, orows)
    if sh != oh:
        diff = [
            f"  spark: {a}\n  duck : {b}"
            for a, b in zip(slines, olines)
            if a != b
        ][:5]
        pytest.fail(f"{name}: value hash mismatch\n" + "\n".join(diff))
    assert len(srows) > 0, f"{name}: empty result"


def test_sessionize_gap_invariant(spark):
    """Within every session, consecutive gaps are ≤ 30 min; across
    session boundaries of the same user the gap is > 30 min — the
    defining gaps-and-islands property, checked independently of the
    value-hash oracle."""
    rows = STAGED["batch_sessionize"](spark, SF_DIR).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user
    for user, sess in by_user.items():
        sess.sort(key=lambda r: r.session_id)
        assert [s.session_id for s in sess] == list(
            range(1, len(sess) + 1)
        ), user
        for a, b in zip(sess, sess[1:]):
            assert a.session_end <= b.session_start, (user, a.session_id)


def test_table_diff_statuses_partition_keyspace(spark):
    """Every key appears exactly once, and the four statuses are
    consistent with old/new NULL-ness."""
    rows = STAGED["table_diff_reconciliation"](spark, SF_DIR).collect()
    keys = [r.key for r in rows]
    assert len(keys) == len(set(keys))
    for r in rows:
        if r.status == "added":
            assert r.old_value is None and r.new_value is not None
        elif r.status == "removed":
            assert r.old_value is not None and r.new_value is None
        elif r.status == "changed":
            assert r.old_value != r.new_value
        else:
            assert r.status == "unchanged" and r.old_value == r.new_value


def test_weighted_sample_rate_scales_with_weight(spark):
    """Selection frequency must increase with weight: among the sampled
    docs, heavier weights are over-represented relative to their corpus
    share (coarse monotonicity — the statistical contract of priority
    sampling — while the exact membership stays pinned by the oracle
    hash)."""
    sample = STAGED["weighted_sample_priority"](spark, SF_DIR).collect()
    by_w: dict[int, int] = {}
    for r in sample:
        by_w[r.weight] = by_w.get(r.weight, 0) + 1
    # corpus shares of weight classes 1..5 are ~equal (doc_id % 5), so
    # sampled counts should be non-trivially increasing from the
    # lightest to the heaviest class in aggregate
    light = by_w.get(1, 0) + by_w.get(2, 0)
    heavy = by_w.get(4, 0) + by_w.get(5, 0)
    assert heavy > light, f"weighted sample not weight-monotone: {by_w}"


def test_setop_multiset_algebra(spark, duck):
    """|INTERSECT ALL| + |EXCEPT ALL| must equal |view multiset| (the
    defining partition of a multiset difference), and the DISTINCT
    forms must be set-projections of the ALL forms."""
    rows = STAGED["setop_suite"](spark, SF_DIR).collect()
    # at tiny SFs some variants are legitimately empty (every view user
    # also clicks → EXCEPT is {}), so default missing ops to []
    by_op: dict[str, list[int]] = {
        k: [] for k in ("intersect_all", "except_all", "intersect", "except")
    }
    for r in rows:
        by_op[r.op].append(r.user_id)
    n_views = duck.execute(
        "SELECT count(*) FROM events WHERE event_type = 'view'"
    ).fetchone()[0]
    assert len(by_op["intersect_all"]) + len(by_op["except_all"]) == n_views
    assert set(by_op["intersect"]) == set(by_op["intersect_all"])
    assert set(by_op["except"]) <= set(by_op["except_all"])
    assert not (set(by_op["intersect"]) & set(by_op["except"]))


def test_bitmap_popcount_equals_distinct_days(spark, duck):
    """bit_count(bitmap) must equal the exact distinct-day count per
    user — the bitmap is lossless within its 63-day scope."""
    rows = STAGED["bitmap_day_activity"](spark, SF_DIR).collect()
    exact = dict(
        duck.execute("""
            WITH b AS (SELECT min(CAST(ts AS DATE)) AS d0 FROM events)
            SELECT user_id, count(DISTINCT CAST(ts AS DATE))
            FROM events, b
            WHERE date_diff('day', b.d0, CAST(ts AS DATE))
                  BETWEEN 0 AND 62
            GROUP BY 1
        """).fetchall()
    )
    assert rows and len(rows) == len(exact)
    for r in rows:
        assert r.active_days == exact[r.user_id], r.user_id
        assert r.first_day <= r.last_day
        # the first/last set bits of the bitmap agree with min/max
        assert (r.bitmap >> r.first_day) & 1
        assert (r.bitmap >> r.last_day) & 1
        assert r.bitmap >> (r.last_day + 1) == 0


def test_ignore_nulls_carry_is_forward_fill(spark):
    """last_value IGNORE NULLS over the running frame must equal a
    hand-rolled forward-fill of the purchase marks per user."""
    rows = STAGED["lag_lead_ignore_nulls"](spark, SF_DIR).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user
    for user, evs in by_user.items():
        evs.sort(key=lambda r: r.event_id)
        carry = None
        for r in evs:
            if r.p_cents is not None:
                carry = r.p_cents
            assert r.carry_cents == carry, (user, r.event_id)


def test_pq_training_reduces_error_and_codes_in_range(spark):
    """Lloyd training must not increase total quantization error vs the
    untrained (seed) codebooks, and codebook utilization stays within
    [1, k] — the monotone-improvement property of k-means."""
    from sparkksqldbbenchmark_spark.llm.pq import pq_quantization_error

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    trained = {
        r.subspace: r
        for r in pq_quantization_error(emb, lloyd_iters=2).collect()
    }
    seeds = {
        r.subspace: r
        for r in pq_quantization_error(emb, lloyd_iters=0).collect()
    }
    assert set(trained) == set(seeds) == set(range(8))
    for s in trained:
        assert 1 <= trained[s].used_centroids <= 8
        assert trained[s].total_err_nano <= seeds[s].total_err_nano, (
            s,
            trained[s].total_err_nano,
            seeds[s].total_err_nano,
        )
