"""Tests for window_function_suite and embedding_quantization."""

from __future__ import annotations

import math

import numpy as np

from sparkksqldbbenchmark_spark.plans.extended_queries import (
    window_function_suite,
)
from sparkksqldbbenchmark_spark.plans.llm_queries import (
    embedding_quantization,
)

from .conftest import SF_DIR


def test_window_suite_semantics(spark):
    out = window_function_suite(spark, SF_DIR)
    rows = out.orderBy("user_id", "seq").collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    some_user = max(by_user, key=lambda u: len(by_user[u]))
    seq = by_user[some_user]
    assert [r.seq for r in seq] == list(range(1, len(seq) + 1))
    assert seq[0].prev_value is None
    assert seq[-1].next_value is None
    # lag/lead chain consistency: next_value of row i equals value used to
    # produce prev_value of row i+1 — reconstruct values from deltas
    for a, b in zip(seq, seq[1:]):
        # b.prev_value is a's value; a.next_value is b's value
        assert b.value_delta is None or math.isfinite(b.value_delta)
        assert (a.next_value is None) == False  # noqa: E712 — interior rows
    # moving average of the first row is the value itself
    first = seq[0]
    assert first.moving_avg_3 is not None


def test_window_suite_single_window_operator(spark):
    out = window_function_suite(spark, SF_DIR)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # every expression shares one (partition, order) → EXACTLY one Window
    # operator and one shuffle — the property the query demonstrates
    assert plan.count("Window") - plan.count("WindowGroupLimit") == 1, plan
    assert plan.count("Exchange") == 1, plan


def test_quantization_matches_numpy(spark):
    out = embedding_quantization(spark, SF_DIR).orderBy("vec_id")
    got = {r.vec_id: r for r in out.collect()}
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    for row in emb[:50]:
        x = np.array(row.embedding, dtype=np.float64)
        scale = np.abs(x).max() / 127.0
        if scale == 0:
            q = np.zeros_like(x)
        else:
            q = np.clip(np.floor(x / scale + 0.5), -127.0, 127.0)
        r = got[row.vec_id]
        assert r.q_sum == int(q.sum())
        assert r.q_l1 == int(np.abs(q).sum())
        err = math.sqrt(float(((x - q * scale) ** 2).sum()))
        assert abs(r.recon_err - err) < 1e-9
        assert abs(r.scale - scale) < 1e-15
        # int8 range honored
        assert np.all(q <= 127) and np.all(q >= -127)


def test_quantization_error_bounded_by_half_scale(spark):
    """|x - q·scale| ≤ scale/2 per element away from the clamp edge →
    recon_err ≤ sqrt(dim)·scale/2 (loose but structural)."""
    out = embedding_quantization(spark, SF_DIR).collect()
    for r in out:
        dim = 64
        assert r.recon_err <= math.sqrt(dim) * r.scale / 2 + 1e-9


def test_cube_single_pass_plan(spark):
    from sparkksqldbbenchmark_spark.plans.extended_queries import (
        cube_rollup_report,
    )

    df = cube_rollup_report(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # one Expand feeding partial+final aggregation — not N separate aggs
    assert plan.count("Expand") == 1, plan
    assert "HashAggregate" in plan
    # grand-total row present and consistent
    rows = {(r.event_type, r.hour_of_day): r for r in df.collect()}
    total = rows[("ALL", -1)]
    per_type = [v for (t, h), v in rows.items() if h == -1 and t != "ALL"]
    assert total.message_count == sum(v.message_count for v in per_type)


def test_tpch_q10_plan_quality(spark):
    from sparkksqldbbenchmark_spark.plans.extended_queries import (
        tpch_q10_returned_items,
    )

    df = tpch_q10_returned_items(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert df.count() <= 20


def test_interpolate_linear_semantics(spark):
    """operators/interpolation.interpolate_linear: interior gaps are
    time-weighted blends, leading/trailing gaps one-sided, all-null
    partitions stay null, non-null values pass through untouched."""
    from pyspark.sql import functions as F

    from sparkksqldbbenchmark_spark.operators.interpolation import (
        interpolate_linear,
    )

    rows = [
        # key a: null at t=1 sits 1/3 of the way from t=0 (v=10) to
        # t=3 (v=40) → 20.0; leading null at key b backfills; trailing
        # null at key b carries; key c is all-null
        ("a", "2024-01-01 00:00:00", 10.0),
        ("a", "2024-01-01 00:00:01", None),
        ("a", "2024-01-01 00:00:03", 40.0),
        ("b", "2024-01-01 00:00:00", None),
        ("b", "2024-01-01 00:00:01", 5.0),
        ("b", "2024-01-01 00:00:02", None),
        ("c", "2024-01-01 00:00:00", None),
    ]
    df = spark.createDataFrame(
        rows, "k string, ts string, v double"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        (r["k"], str(r["ts"])): r["v_interp"]
        for r in interpolate_linear(df, ["k"], "ts", "v").collect()
    }
    assert out[("a", "2024-01-01 00:00:00")] == 10.0
    assert abs(out[("a", "2024-01-01 00:00:01")] - 20.0) < 1e-12
    assert out[("a", "2024-01-01 00:00:03")] == 40.0
    assert out[("b", "2024-01-01 00:00:00")] == 5.0   # backfill
    assert out[("b", "2024-01-01 00:00:02")] == 5.0   # carry
    assert out[("c", "2024-01-01 00:00:00")] is None  # all-null

    # plan: both windows ride ONE shuffle of the series key
    import contextlib, io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        interpolate_linear(df, ["k"], "ts", "v").explain("simple")
    plan = buf.getvalue()
    assert plan.count("Exchange hashpartitioning") == 1


def test_derived_partsupp_invariants(spark):
    """The derived partsupp view (plans/extended_queries._partsupp_view)
    must be a well-formed relation: suppkeys inside the supplier domain,
    at most 4 distinct suppliers per part, unique (part, supp) pairs,
    and cost/availqty exactly matching the documented formulas (the same
    arithmetic the oracle CTE replays)."""
    from pyspark.sql import functions as F

    from sparkksqldbbenchmark_spark.catalog import load_table
    from sparkksqldbbenchmark_spark.plans.extended_queries import (
        _partsupp_view,
    )
    from tests.conftest import SF_DIR

    ps = _partsupp_view(spark, SF_DIR)
    n_supp = load_table(spark, SF_DIR, "supplier").count()
    rows = ps.collect()
    assert rows
    pairs = {(r["ps_partkey"], r["ps_suppkey"]) for r in rows}
    assert len(pairs) == len(rows), "duplicate (part, supp) pairs"
    per_part = ps.groupBy("ps_partkey").count().agg(F.max("count")).collect()
    assert per_part[0][0] <= 4
    for r in rows[:200]:
        pk, sk = r["ps_partkey"], r["ps_suppkey"]
        assert 0 <= sk < n_supp
        assert r["ps_supplycost"] == ((pk * 31 + sk * 17) % 9000 + 1000) / 100.0
        assert r["ps_availqty"] == (pk * 13 + sk) % 9999 + 1
