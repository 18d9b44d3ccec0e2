"""Property tests for the exact time-series smoothers
(functions/timeseries.py) against brute-force Python references on
hypothesis-generated series."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.integers(min_value=0, max_value=10_000),
        min_size=1,
        max_size=40,
    )
)
def test_dyadic_ema_matches_bruteforce(spark, series):
    from sparkksqldbbenchmark_spark.functions.timeseries import (
        dyadic_ema_weighted,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(series)], "i long, v long"
    )
    w = Window.partitionBy().orderBy("i")
    got = {
        r.i: r.w
        for r in df.select(
            "i", dyadic_ema_weighted("v", w, terms=16).alias("w")
        ).collect()
    }
    for n in range(len(series)):
        want = sum(
            (series[n - i] if n - i >= 0 else 0) * (1 << (15 - i))
            for i in range(16)
        )
        assert got[n] == want, n
        # the double form is exact dyadic
        assert want / 65536.0 == float(want) / 65536.0


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**9),  # ts micros
            st.integers(min_value=0, max_value=10_000),  # value
        ),
        min_size=2,
        max_size=30,
        unique_by=lambda t: t[0],
    )
)
def test_twap_matches_bruteforce(spark, points):
    from sparkksqldbbenchmark_spark.functions.timeseries import (
        time_weighted_avg_agg,
        twap_col,
    )

    points = sorted(points)
    df = spark.createDataFrame(points, "t0 long, v long")
    w = Window.partitionBy().orderBy("t0")
    seg = df.withColumn("t1", F.lead("t0").over(w)).where(
        F.col("t1").isNotNull()
    )
    row = (
        seg.agg(*time_weighted_avg_agg("v", "t0", "t1"))
        .withColumn("twap", twap_col())
        .collect()[0]
    )
    vt = sum(
        v * (points[i + 1][0] - t)
        for i, (t, v) in enumerate(points[:-1])
    )
    tt = points[-1][0] - points[0][0]
    assert row.n_segments == len(points) - 1
    assert row.vt_sum == vt and row.t_sum == tt
    assert row.twap == vt // tt
