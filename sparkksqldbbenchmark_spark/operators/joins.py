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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str,
    payload_cols: Sequence[str],
) -> DataFrame:
    """As-of join: for every left row, the latest right row with the same
    key and right.ts <= left.ts (DuckDB/kdb ASOF JOIN semantics; Spark
    has no native operator — north-star custom-op surface).

    Scale-safe formulation — union-tag + last-carry instead of a per-row
    range join: tag right rows 0 and left rows 1, sort each key by
    (ts, tag) so an equal-timestamp right row precedes the left row that
    may match it, and carry the last non-null payload forward with one
    running window. ONE shuffle on the key, no inequality join, no
    broadcast of either side; skew follows the key distribution exactly
    like any groupBy. Right must be unique per (key, ts) for
    deterministic results — pre-aggregate if needed.

    Returns the left rows (original columns) plus the carried
    ``payload_cols``, NULL where no right row precedes."""
    from pyspark.sql import Window

    keys = list(on)
    tag = "__asof_side"
    lcols = [c for c in left.columns]
    tagged_right = right.select(
        *keys,
        F.col(ts_col),
        *[F.col(c) for c in payload_cols],
        F.lit(0).alias(tag),
        *[
            F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
            for c in lcols
            if c not in keys and c != ts_col
        ],
    )
    tagged_left = left.select(
        *keys,
        F.col(ts_col),
        *[
            F.lit(None).cast(dict(right.dtypes)[c]).alias(c)
            for c in payload_cols
        ],
        F.lit(1).alias(tag),
        *[F.col(c) for c in lcols if c not in keys and c != ts_col],
    )
    unioned = tagged_right.unionByName(tagged_left)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col).asc(), F.col(tag).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned
    for c in payload_cols:
        filled = filled.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return filled.where(F.col(tag) == 1).select(*lcols, *payload_cols)


def range_join_points_intervals(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    *,
    bucket_seconds: int = 7 * 24 * 3600,
) -> DataFrame:
    """Range (interval) join: every (point, interval) pair with
    start <= ts < end — no key equality. Spark would plan the naive form
    as a broadcast-nested-loop/cartesian; this is the canonical
    distributed rewrite: quantize the time axis into fixed-width
    buckets, explode each interval into the buckets it covers, equi-join
    points on their single bucket, then apply the exact range predicate.
    Each qualifying pair meets in exactly one bucket (the point's), so
    no dedup is needed. Shuffle cost: |points| + Σ interval-spans/width
    rows on a uniform bucket key. Pick ``bucket_seconds`` near the
    typical interval length — one order of magnitude either way only
    changes the explode factor / candidate ratio, not correctness."""
    pb = points.withColumn(
        "__bucket", F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_seconds)
    )
    ib = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(
                    F.unix_timestamp(F.col(start_col)) / bucket_seconds
                ),
                F.floor(F.unix_timestamp(F.col(end_col)) / bucket_seconds),
            )
        ),
    )
    return (
        pb.join(ib, "__bucket")
        .where(
            (F.col(ts_col) >= F.col(start_col))
            & (F.col(ts_col) < F.col(end_col))
        )
        .drop("__bucket")
    )


def forward_fill(
    df: DataFrame,
    order_col: str,
    cols: Sequence[str],
    partition_cols: Sequence[str] = (),
    bucket_expr=None,
    materialize: bool = True,
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
    # ``materialize=False`` is for callers whose input is ALREADY a tiny
    # materialized frame (e.g. a checkpointed per-bucket aggregate): the
    # 2x recompute of the fill is then cheaper than an extra
    # materialization job, and the checkpoint here would only add a
    # scheduling barrier.
    if materialize:
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
