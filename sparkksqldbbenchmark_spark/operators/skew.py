"""Skew mitigation: salting for hot keys (SURVEY §7 / 100 TB design).

AQE's runtime skew-join splitting (on by default, session.py) handles most
skew adaptively; these explicit tools cover the two cases AQE can't:
skewed AGGREGATION keys (AQE only splits join partitions) and pre-planned
replication joins when the hot keys are known.

Both are deterministic (salt = hash of a secondary column, never rand())
so results are reproducible and oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    *,
    salt_col: str,
    buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed grouping keys: phase 1 groups by
    (keys, salt) — the hot key's rows spread over `buckets` reducers —
    phase 2 merges the partials. Correct for any algebraic aggregate;
    sum/count/min/max shown. Output: keys, sum_value, row_count."""
    salt = F.pmod(F.hash(F.col(salt_col)), F.lit(buckets)).alias("__salt")
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(
            F.sum(F.col(value_col).cast("decimal(38,6)")).alias("__psum"),
            F.count(F.lit(1)).alias("__pcnt"),
            F.min(value_col).alias("__pmin"),
            F.max(value_col).alias("__pmax"),
        )
    )
    return partial.groupBy(*keys).agg(
        F.round(F.sum("__psum"), 2).cast("double").alias("sum_value"),
        F.sum("__pcnt").alias("row_count"),
        F.min("__pmin").alias("min_value"),
        F.max("__pmax").alias("max_value"),
    )


def replicated_skew_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    *,
    salt_col: str,
    buckets: int = 16,
) -> DataFrame:
    """Salted equi-join for a known-skewed key when the dim side is too
    big to broadcast whole: the big side gets a deterministic salt, the
    small side is replicated `buckets`× (explode over the salt domain),
    and the join keys on (key, salt) — the hot key's probe rows spread
    over `buckets` tasks. Use broadcast() instead whenever the small side
    fits in memory; this is the fallback between broadcast and AQE."""
    big_salted = big.withColumn(
        "__salt", F.pmod(F.hash(F.col(salt_col)), F.lit(buckets))
    )
    small_rep = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    return big_salted.join(small_rep, on=[key, "__salt"]).drop("__salt")
