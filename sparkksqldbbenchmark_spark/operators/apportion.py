"""Largest-remainder apportionment — split an integer budget across
groups proportionally to their weights with an EXACT total.

The planning half of mixture resampling (the scan-side keep-predicate
half is domain_mixture_resample): floor quotas first, then award the
leftover units to the largest remainders, ties broken by the group key
ascending so the allocation is fully deterministic. Properties (all
hypothesis-tested in tests/test_apportion.py):

  * sum(final_quota) == budget, exactly — the invariant floor-only or
    independent-rounding allocations violate;
  * every extra is 0 or 1;
  * |final_quota - budget·w/Σw| < 1 for every group (quota stays within
    one unit of the ideal share — the defining Hare-quota bound).

Scale shape: one partial-aggregated shuffle if the caller starts from
row grain; everything here operates on the |groups|-row frame (bounded
≪ data), where the single-partition windows are constant-size frames —
the shuffle audit's allowed class. At 100 TB the output is a broadcast
plan: join the quotas back to the corpus and sample per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def largest_remainder_quotas(
    weights: DataFrame,
    key_col: str,
    weight_col: str,
    budget: int,
) -> DataFrame:
    """Apportion ``budget`` integer units across the rows of ``weights``
    proportionally to ``weight_col``.

    Returns (key_col, weight, base_quota, extra, final_quota); weights
    must be positive integers (counts).
    """
    w_all = Window.partitionBy()
    quotas = (
        weights.select(
            F.col(key_col), F.col(weight_col).cast("long").alias("w")
        )
        .withColumn("t", F.sum("w").over(w_all))
        .withColumn("base_quota", F.expr(f"{budget} * w DIV t"))
        .withColumn("remainder", F.expr(f"{budget} * w % t"))
        .withColumn("base_sum", F.sum("base_quota").over(w_all))
        .withColumn(
            "rem_rank",
            F.row_number().over(
                Window.orderBy(F.desc("remainder"), F.asc(key_col))
            ),
        )
        .withColumn("r", F.lit(budget) - F.col("base_sum"))
    )
    extra = F.when(F.col("rem_rank") <= F.col("r"), 1).otherwise(0)
    return quotas.select(
        key_col,
        F.col("w").alias("weight"),
        "base_quota",
        extra.cast("long").alias("extra"),
        (F.col("base_quota") + extra).alias("final_quota"),
    )
