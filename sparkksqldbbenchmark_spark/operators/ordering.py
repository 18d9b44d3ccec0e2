"""Sorts / limits / top-k (SURVEY.md §2.6).

`orderBy().limit(k)` compiles to TakeOrderedAndProject — per-partition
top-k then a k-row merge on the driver, no global sort shuffle. That is the
correct plan at any scale for small k.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame


def top_k(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    """Top-k rows (LatencyMonitor.scala:383-391 `sortBy(-latency).take(5)`;
    dmi/scripts/wind.py:300-305 nlargest). Pass a deterministic tie-break
    column (e.g. the row id) in ``order``."""
    return df.orderBy(*order).limit(k)


def argmax_row(df: DataFrame, order: Sequence[Column]) -> DataFrame:
    """Row achieving the extreme value — pandas `df.loc[df[col].idxmax()]`
    (dmi/scripts/wind.py:308-314)."""
    return df.orderBy(*order).limit(1)
