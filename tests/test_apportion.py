"""Property tests for largest-remainder apportionment
(operators/apportion.py): exact-total, 0/1 extras, and the Hare-quota
bound, over hypothesis-generated weight tables."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@st.composite
def weight_tables(draw):
    n = draw(st.integers(min_value=1, max_value=12))
    weights = draw(
        st.lists(
            st.integers(min_value=1, max_value=10_000),
            min_size=n,
            max_size=n,
        )
    )
    budget = draw(st.integers(min_value=0, max_value=100_000))
    return weights, budget


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(weight_tables())
def test_apportionment_properties(spark, tbl):
    from sparkksqldbbenchmark_spark.operators.apportion import (
        largest_remainder_quotas,
    )

    weights, budget = tbl
    df = spark.createDataFrame(
        [(f"g{i:03d}", w) for i, w in enumerate(weights)],
        "key string, w long",
    )
    rows = largest_remainder_quotas(df, "key", "w", budget).collect()
    assert len(rows) == len(weights)
    # exact total
    assert sum(r.final_quota for r in rows) == budget
    total = sum(weights)
    for r in rows:
        assert r.extra in (0, 1)
        assert r.final_quota == r.base_quota + r.extra
        # Hare-quota bound: within one unit of the ideal share
        ideal = budget * r.weight / total
        assert abs(r.final_quota - ideal) < 1.0, (r.key, ideal)
    # determinism: same input → same allocation
    again = largest_remainder_quotas(df, "key", "w", budget).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_apportionment_budget_smaller_than_groups(spark):
    """budget < #groups: only the largest-remainder groups get a unit,
    everyone else gets zero — and the sum still lands exactly."""
    from sparkksqldbbenchmark_spark.operators.apportion import (
        largest_remainder_quotas,
    )

    df = spark.createDataFrame(
        [("a", 5), ("b", 3), ("c", 2)], "key string, w long"
    )
    rows = {r.key: r for r in largest_remainder_quotas(
        df, "key", "w", 2
    ).collect()}
    assert sum(r.final_quota for r in rows.values()) == 2
    assert rows["a"].final_quota == 1  # largest share first
    assert all(r.base_quota in (0, 1) for r in rows.values())
