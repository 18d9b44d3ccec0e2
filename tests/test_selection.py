"""Unit tests for operators/selection.ordered_budget_select (the
priority-ordered token-budget cut) and the passage-chunking expression
shape behind plans/curation_queries.passage_dup_stats. Both also carry
driver-graded oracle rows; these tests pin operator semantics on
hand-built frames, including the boundary cases the sf-data oracle may
never hit (exact budget boundary, cross-level ties, short tail chunks).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkksqldbbenchmark_spark.operators.selection import (
    ordered_budget_select,
    quantile_levels,
)


def _frame(spark, rows):
    return spark.createDataFrame(rows, "id long, score double, w long")


def _run(spark, rows, budget, levels=8):
    df = _frame(spark, rows)
    out = ordered_budget_select(
        df,
        level=F.floor((F.lit(1.0) - F.col("score")) * levels).cast("long"),
        order=[F.desc("score"), F.asc("id")],
        weight_col="w",
        budget=budget,
    )
    return {
        r["id"]: (r["cum_before"], r["selected"])
        for r in out.collect()
    }


def _expected(rows, budget):
    ordered = sorted(rows, key=lambda r: (-r[1], r[0]))
    out, acc = {}, 0
    for rid, _, w in ordered:
        out[rid] = (acc, acc < budget)
        acc += w
    return out


def test_budget_select_matches_bruteforce(spark):
    rows = [(i, ((i * 13) % 97) / 97.0, (i * 7) % 50 + 1) for i in range(300)]
    assert _run(spark, rows, budget=2000) == _expected(rows, budget=2000)


def test_budget_boundary_is_exclusive(spark):
    # cum_before == budget exactly → NOT selected; the row before fits
    rows = [(1, 0.9, 100), (2, 0.5, 7), (3, 0.1, 1)]
    got = _run(spark, rows, budget=100)
    assert got[1] == (0, True)
    assert got[2] == (100, False)
    assert got[3] == (107, False)


def test_ties_share_level_and_order_by_id(spark):
    # equal scores must never split across levels or reorder unstably
    rows = [(10, 0.5, 5), (2, 0.5, 5), (7, 0.5, 5), (1, 0.9, 5)]
    got = _run(spark, rows, budget=12)
    assert got == _expected(rows, budget=12)
    # the two selected after the leader are the LOWEST ids among the tie
    assert got[1][1] and got[2][1] and got[7][1] and not got[10][1]


def test_zero_weight_rows_cost_nothing(spark):
    rows = [(1, 0.9, 0), (2, 0.8, 10), (3, 0.7, 0)]
    got = _run(spark, rows, budget=5)
    assert got[1] == (0, True)
    assert got[2] == (0, True)   # zero-weight predecessor adds nothing
    assert got[3] == (10, False)


def test_quantile_levels_match_fixed_grid_output(spark):
    """Level-invariance, end to end: the selection OUTPUT must be
    identical whether levels come from the fixed grid or from
    approx-quantile cuts of the actual score distribution — the
    quantile form only rebalances buckets. Uses a skewed (squared)
    score distribution where a fixed grid would crowd one level."""
    rows = [
        (i, (((i * 13) % 97) / 97.0) ** 2, (i * 7) % 50 + 1)
        for i in range(500)
    ]
    df = _frame(spark, rows)
    kwargs = dict(
        order=[F.desc("score"), F.asc("id")],
        weight_col="w",
        budget=3000,
    )
    fixed = ordered_budget_select(
        df,
        level=F.floor((F.lit(1.0) - F.col("score")) * 8).cast("long"),
        **kwargs,
    )
    quant = ordered_budget_select(
        df, level=quantile_levels(df, "score", n_levels=16), **kwargs
    )
    to_map = lambda d: {  # noqa: E731
        r["id"]: (r["cum_before"], r["selected"]) for r in d.collect()
    }
    got_q = to_map(quant)
    assert got_q == to_map(fixed) == _expected(rows, budget=3000)
    # and the monotonicity contract holds on the actual cuts
    lv = df.select(
        "id", "score", quantile_levels(df, "score", n_levels=16).alias("lv")
    ).collect()
    by_score = sorted(lv, key=lambda r: -r["score"])
    assert all(
        a["lv"] <= b["lv"] for a, b in zip(by_score, by_score[1:])
    )


def test_null_level_rows_sort_last_not_dropped(spark):
    # a NULL level (e.g. null quality score) must neither vanish from the
    # output (the carry join is an inner equi-join — null keys never
    # match) nor jump the queue: it lands in a +inf worst level, after
    # every non-null level has consumed its budget.
    df = spark.createDataFrame(
        [(1, 0.9, 5), (2, None, 5), (3, 0.1, 5)],
        "id long, score double, w long",
    )
    out = ordered_budget_select(
        df,
        level=F.floor((F.lit(1.0) - F.col("score")) * 8).cast("long"),
        order=[F.desc("score"), F.asc("id")],
        weight_col="w",
        budget=11,
    )
    got = {r["id"]: (r["cum_before"], r["selected"]) for r in out.collect()}
    assert set(got) == {1, 2, 3}, "null-level row was dropped"
    assert got[1] == (0, True)
    assert got[3] == (5, True)
    assert got[2] == (10, True)   # last in line, still inside budget
    out2 = ordered_budget_select(
        df,
        level=F.floor((F.lit(1.0) - F.col("score")) * 8).cast("long"),
        order=[F.desc("score"), F.asc("id")],
        weight_col="w",
        budget=10,
    )
    got2 = {r["id"]: r["selected"] for r in out2.collect()}
    assert got2 == {1: True, 3: True, 2: False}


def test_decimal_level_rides_double_path(spark):
    """A decimal-typed level expression must work (it rode the blanket
    double cast before the typed-sentinel rework): same output as the
    double-grid form, and a NULL decimal level still lands last."""
    df = spark.createDataFrame(
        [(1, 0.9, 5), (2, None, 5), (3, 0.1, 5)],
        "id long, score double, w long",
    )
    dec_level = (
        F.floor((F.lit(1.0) - F.col("score")) * 8)
        .cast("decimal(10,2)")
    )
    out = ordered_budget_select(
        df,
        level=dec_level,
        order=[F.desc("score"), F.asc("id")],
        weight_col="w",
        budget=11,
    )
    got = {r["id"]: (r["cum_before"], r["selected"]) for r in out.collect()}
    assert got == {1: (0, True), 3: (5, True), 2: (10, True)}


def test_passage_chunking_covers_all_tokens(spark):
    # the chunk expression used by passage_dup_stats: non-overlapping
    # W-word slices, short tail kept
    w = 4
    df = spark.createDataFrame(
        [(1, "a b c d e f g h i"), (2, "x y"), (3, "p q r s")],
        "doc_id long, text string",
    )
    chunks = df.select(
        "doc_id",
        F.expr(
            f"transform(sequence(0, cast((size(split(text, ' ')) + {w - 1})"
            f" div {w} as int) - 1),"
            f" i -> concat_ws(' ', slice(split(text, ' '), i*{w}+1, {w})))"
        ).alias("chunks"),
    ).collect()
    got = {r["doc_id"]: r["chunks"] for r in chunks}
    assert got[1] == ["a b c d", "e f g h", "i"]
    assert got[2] == ["x y"]
    assert got[3] == ["p q r s"]


def test_budget_select_property_random_corpora(spark):
    """Property: for arbitrary (id, score, weight) corpora — duplicate
    scores (cross-level tie groups), zero weights, non-contiguous ids,
    boundary-grazing budgets — the bucketed prefix sum equals the
    brute-force global cumsum in (score DESC, id) order. Scores are
    drawn from a small grid so level-boundary collisions actually
    happen."""
    from hypothesis import given, settings, strategies as st

    corpus = st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),
            st.sampled_from([0.0, 0.124, 0.125, 0.5, 0.874, 0.875, 1.0]),
            st.integers(min_value=0, max_value=100),
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    )

    @settings(max_examples=6, deadline=None)
    @given(rows=corpus, budget=st.sampled_from([0, 1, 50, 100, 10_000]))
    def check(rows, budget):
        assert _run(spark, rows, budget, levels=8) == _expected(
            rows, budget
        )

    check()
