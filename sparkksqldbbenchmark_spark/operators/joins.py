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
      2. read each bucket's last non-null value per column off the filled
         output's final row via an exchange-free max_by groupBy (the fill
         already hash-partitioned by bucket), run the carry-forward over
         the tiny bucket list (|buckets| rows, not |data| rows), and
         broadcast the per-bucket carry-in back to patch null prefixes.

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
    for c in cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(wb))
    # `out` is consumed twice — as the main branch and as the input to
    # the per-bucket lasts/carry below. Without materialization Spark
    # recomputes the entire upstream (source aggregations, the outer-join
    # fold, the fill window) once per consumer; materialize the filled
    # frame so upstream runs once. At cluster scale this is a
    # persist(MEMORY_AND_DISK) of the filled output — the price of the
    # global carry, still strictly cheaper than a 2x recompute.
    out = out.localCheckpoint(eager=True)

    # The running fill makes each bucket's LAST row carry the bucket's
    # last non-null value for every column (null only if the whole bucket
    # is null — which the carry chain below handles). Recover it with a
    # max_by aggregate instead of a second unbounded-following window
    # pass per column: the window output is already hash-partitioned by
    # bucket, so this groupBy needs no exchange, and the full-frame
    # window function per column disappears.
    lasts = out.groupBy(b).agg(
        *[F.max_by(c, order_col).alias(c) for c in cols]
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
    return out.drop(b, *[f"__carry_{c}" for c in cols])
