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
) -> DataFrame:
    """pandas ffill (price_prediction.ipynb cell 14) — last non-null value
    carried forward along the time axis.

    With empty ``partition_cols`` this is a single global window (matches
    the notebook exactly; fine at fixture scale). At 100 TB pass a partition
    key (e.g. series id or coarse time bucket) so the window parallelizes —
    SURVEY §7 risk 7."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = df
    for c in cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out
