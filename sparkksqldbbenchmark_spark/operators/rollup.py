"""Hypertable-style time-hierarchy rollup (north-star custom-op surface;
the reference has tumbling windows only — SURVEY.md §2.9 T1).

The continuous-aggregate idea: compute the FINE level (e.g. hourly) once,
then derive every coarser level (daily, ...) by re-aggregating the fine
AGGREGATE, never the raw data. Correct re-aggregation needs decomposable
state: counts add, and exact DECIMAL sums add order-independently — so the
coarse average (decimal-sum → double ÷ count) is bit-identical to
aggregating the raw rows directly, which is exactly what the DuckDB oracle
does. At 100 TB this is the difference between one pass over the data plus
a pass over |hourly buckets| rows, and one full pass per resolution.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,6)"
_FMT = "yyyy-MM-dd HH:mm:ss"


def _level_select(
    agg: DataFrame, label: str, start: Column, keys: Sequence[str]
) -> DataFrame:
    return agg.select(
        F.lit(label).alias("level"),
        F.date_format(start, _FMT).alias("window_start"),
        *keys,
        F.col("message_count"),
        (F.col("__sum_dec").cast("double") / F.col("__cnt_val")).alias(
            "avg_value"
        ),
    )


def time_rollup(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    keys: Sequence[str],
    *,
    fine: str = "1 hour",
    fine_label: str = "1h",
    coarse: str = "1 day",
    coarse_label: str = "1d",
) -> DataFrame:
    """Two-resolution rollup: (level, window_start, *keys, message_count,
    avg_value) rows for the fine and coarse buckets, the coarse level
    re-aggregated from the fine aggregate's decomposable state
    (count + exact decimal sum + non-null count)."""
    v = F.col(value_col)
    fine_agg = (
        df.groupBy(F.window(ts_col, fine).alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("message_count"),
            F.count(v).alias("__cnt_val"),
            F.sum(v.cast(_DEC)).alias("__sum_dec"),
        )
    )
    coarse_agg = (
        fine_agg.groupBy(
            F.window(F.col("w.start"), coarse).alias("wc"), *keys
        )
        .agg(
            F.sum("message_count").alias("message_count"),
            F.sum("__cnt_val").alias("__cnt_val"),
            F.sum("__sum_dec").alias("__sum_dec"),
        )
    )
    return _level_select(
        fine_agg, fine_label, F.col("w.start"), keys
    ).unionByName(
        _level_select(coarse_agg, coarse_label, F.col("wc.start"), keys)
    )
