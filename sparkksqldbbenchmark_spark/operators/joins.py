"""Join operators (SURVEY.md §2.3).

J1 multi-way full-outer time join (price_prediction.ipynb cell 14),
J2/J3 small-dimension enrichment joins (dmi/scripts/wind.py:180-209).

Scale stance: enrichment dims (stations/regions/nations) are tiny → always
broadcast (no shuffle of the fact side). The time-series outer join keys on
the bucketed timestamp — uniform, shuffle-friendly; at 100 TB pre-bucket all
series identically so the sort-merge join co-partitions.
"""

from __future__ import annotations

from functools import reduce
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich(
    fact: DataFrame,
    dim: DataFrame,
    on: str | Sequence[str],
    how: str = "left",
) -> DataFrame:
    """Broadcast enrichment join — station-detail matching
    (dmi/scripts/wind.py:180-209) / region→zone lookup
    (region_muncipality.json). Dim is always the broadcast side."""
    return fact.join(F.broadcast(dim), on=on, how=how)


def multiway_outer_time_join(
    dfs: Sequence[DataFrame],
    time_col: str = "datetime",
) -> DataFrame:
    """Fold N time-series into one wide table on the time column with
    full-outer joins — the notebook's `merged.join(..., how='outer')` fold
    (price_prediction.ipynb cell 14). Input frames must already use distinct
    measure-column names (the notebook's rsuffix is handled by aliasing
    upstream)."""
    return reduce(
        lambda left, right: left.join(right, on=time_col, how="full_outer"),
        dfs,
    )


def forward_fill(
    df: DataFrame,
    order_col: str,
    cols: Sequence[str],
    partition_cols: Sequence[str] = (),
    bucket_expr=None,
) -> DataFrame:
    """pandas ffill (price_prediction.ipynb cell 14) — last non-null value
    carried forward along the time axis.

    With ``partition_cols`` the fill runs per partition (one window, fully
    parallel). WITHOUT partition_cols the semantics are a GLOBAL fill, but
    the plan is still distributed: a two-pass chunked fill —

      1. bucket rows by a coarse chunk of ``order_col`` (default: calendar
         day for timestamp/date columns) and ffill WITHIN each bucket in
         parallel;
      2. compute each bucket's last non-null value per column with a
         whole-bucket window frame (shares the fill's exchange — no extra
         shuffle), run the carry-forward over the tiny bucket list
         (|buckets| rows, not |data| rows), and broadcast the per-bucket
         carry-in back to patch null prefixes.

    Identical results to a single global window, no single-reducer sort of
    the full data — SURVEY §7 risk 7. For non-temporal order columns pass
    ``bucket_expr`` (any coarse monotone-in-order_col expression); without
    one the fill degrades to a single explicit partition (fixture-scale
    only)."""
    from pyspark.sql import Window

    if partition_cols:
        w = (
            Window.partitionBy(*partition_cols)
            .orderBy(order_col)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        out = df
        for c in cols:
            out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
        return out

    if bucket_expr is None:
        dtype = dict(df.dtypes).get(order_col, "")
        if dtype.startswith("timestamp") or dtype == "date":
            bucket_expr = F.to_date(F.col(order_col))
        else:
            # no sensible coarse chunk — explicit single partition keeps
            # the plan deterministic (and warning-free) at fixture scale
            bucket_expr = F.lit(0)

    b = "__ff_bucket"
    out = df.withColumn(b, bucket_expr)
    wb = (
        Window.partitionBy(b)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # whole-bucket frame shares wb's exchange+sort — the per-bucket last
    # value costs no extra shuffle, just one more window function
    wfull = (
        Window.partitionBy(b)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    for c in cols:
        out = out.withColumn(
            f"__last_{c}", F.last(c, ignorenulls=True).over(wfull)
        ).withColumn(c, F.last(c, ignorenulls=True).over(wb))

    lasts = (
        out.select(b, *[F.col(f"__last_{c}").alias(c) for c in cols])
        .dropDuplicates([b])
    )
    # carry-in for bucket k = last non-null among buckets < k. This window
    # runs over |buckets| rows (days), not the data — the explicit
    # single-partition spec is intentional and cheap.
    wc = (
        Window.partitionBy(F.lit(0))
        .orderBy(b)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = lasts.select(
        b,
        *[
            F.last(c, ignorenulls=True).over(wc).alias(f"__carry_{c}")
            for c in cols
        ],
    )
    out = out.join(F.broadcast(carry), on=b, how="left")
    for c in cols:
        out = out.withColumn(c, F.coalesce(F.col(c), F.col(f"__carry_{c}")))
    return out.drop(
        b,
        *[f"__carry_{c}" for c in cols],
        *[f"__last_{c}" for c in cols],
    )
