"""Linear interpolation over time-series gaps — the smoothing
complement to forward-fill (operators/joins.forward_fill): a missing
reading is reconstructed from its nearest non-null neighbors on both
sides, weighted by event-time distance:

    v(t) = v_prev + (v_next - v_prev) * (t - t_prev) / (t_next - t_prev)

Edges keep the one-sided neighbor (leading gap → backfill from the next
reading, trailing gap → carry the previous), matching the common
time-series-database GAPFILL/interpolate semantics.

Scale: two windows over the same (keys, order) partitioning — Catalyst
plans ONE Exchange + one Sort feeding both WindowExecs, so the cost is a
single shuffle on the series key regardless of gap density. The
neighbor lookup rides `last(..., ignorenulls)` / `first(...,
ignorenulls)` over struct(ts, value) so the neighbor's TIMESTAMP travels
with its value — no self-join, no explode. For an unpartitioned global
series, apply the same day-bucket two-pass decomposition documented in
forward_fill.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def interpolate_linear(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Append ``out_col`` (default ``<value_col>_interp``): non-null
    values pass through; nulls are linearly interpolated between the
    nearest non-null neighbors within the key partition, one-sided at
    the edges, null only if the whole partition is null."""
    out_col = out_col or f"{value_col}_interp"
    w_back = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col).asc())
        .rowsBetween(0, Window.unboundedFollowing)
    )
    carry = F.when(
        F.col(value_col).isNotNull(),
        F.struct(F.col(ts_col).alias("t"), F.col(value_col).alias("v")),
    )
    prev = F.last(carry, ignorenulls=True).over(w_back)
    nxt = F.first(carry, ignorenulls=True).over(w_fwd)
    # fraction of the gap covered, in microsecond precision; guarded so
    # an exact-duplicate timestamp pair can't divide by zero
    span = F.unix_micros(nxt["t"]) - F.unix_micros(prev["t"])
    frac = (
        (F.unix_micros(F.col(ts_col)) - F.unix_micros(prev["t"]))
        / span
    )
    interpolated = prev["v"] + (nxt["v"] - prev["v"]) * frac
    filled = (
        F.when(F.col(value_col).isNotNull(), F.col(value_col))
        .when(prev.isNull(), nxt["v"])          # leading gap → backfill
        .when(nxt.isNull(), prev["v"])          # trailing gap → carry
        .when(span == 0, prev["v"])
        .otherwise(interpolated)
    )
    return df.withColumn(out_col, filled)
