"""Ordered budget selection: cut a corpus at a global weight budget in
priority order — "take the best documents until the token budget is
spent", the corpus-assembly step that follows scoring and precedes
packing in a training-data pipeline.

Semantics: rows are ordered by a priority (e.g. quality DESC, id ASC for
ties); each row's exclusive running weight (sum of weights of all
strictly-better rows) is computed; a row is selected iff its running
weight is still under the budget — i.e. the greedy prefix of the
priority order that fits.

Scale design — the same distributed prefix sum as operators/packing, but
over a CALLER-SUPPLIED priority order instead of a uniform hash order.
A single global window (ORDER BY priority with no PARTITION BY) drags
the whole corpus through one reducer; instead the caller provides a
``level`` expression that coarsely range-buckets the priority (monotone:
better priority ⇒ numerically smaller-or-equal level, and equal
priorities never split across levels — e.g. ``floor((1-quality)*64)``
for a [0,1] score). Then:

1. per-level exclusive cumsum via an ordinary partitioned window — all
   levels in parallel;
2. per-level totals (|levels| rows, constant) get a single tiny
   prefix-sum window and broadcast back as carries.

One data shuffle + one broadcast of |levels| longs, at any scale. Level
skew only affects balance, never correctness; a production pipeline at
100 TB would derive level cuts from approx quantiles of the priority —
the fixed-grid form here keeps the operator deterministic and
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def quantile_levels(
    df: DataFrame,
    priority_col: str,
    *,
    n_levels: int = 64,
    relative_error: float = 0.001,
) -> Column:
    """Derive the ``level`` expression for :func:`ordered_budget_select`
    from approximate quantiles of the priority column — the production
    form at 100 TB, where a fixed grid over an unknown score
    distribution would put most of the corpus into a handful of levels
    (and the biggest level back onto one reducer). approxQuantile is the
    GK sketch: one pass, driver receives only n_levels−1 doubles.

    Returns level(x) = #cuts ≥ x for DESCENDING priority order (higher
    score ⇒ numerically smaller level; equal scores share a level), so
    the monotonicity contract of ordered_budget_select holds by
    construction — and because the operator's OUTPUT is level-invariant
    for any monotone level, approximation error in the cuts only moves
    bucket BOUNDARIES (balance), never the selection result. NULL
    priorities yield a NULL level, which the operator sends to the
    worst (+inf) bucket."""
    qs = [i / n_levels for i in range(1, n_levels)]
    cuts = df.approxQuantile(priority_col, qs, relative_error)
    cut_arr = F.array(*[F.lit(float(c)) for c in sorted(cuts)])
    # O(n_levels) filter per row; at 64 levels this is noise next to the
    # window aggregation it feeds.
    return F.when(
        F.col(priority_col).isNotNull(),
        F.size(F.filter(cut_arr, lambda c: c >= F.col(priority_col))),
    ).cast("long")


def ordered_budget_select(
    df: DataFrame,
    *,
    level: Column,
    order: list[Column],
    weight_col: str,
    budget: int,
    cum_col: str = "cum_before",
    flag_col: str = "selected",
) -> DataFrame:
    """Append ``cum_col`` (exclusive running weight in priority order)
    and ``flag_col`` (True iff the row fits inside ``budget``).

    ``level`` must be monotone in ``order``: for rows a before b in the
    order, level(a) <= level(b), and order-ties share a level. The
    in-level window re-applies the full ``order`` so the composition is
    exactly the global order.

    A NULL ``level`` (e.g. a null quality score) is coalesced to a
    type-matched worst-priority sentinel (+inf for floating levels, the
    integral max for integer levels — preserving exact integer identity;
    a blanket double cast would merge distinct levels above 2^53) so the
    row sorts last but still flows through the carry join (a null key
    would silently vanish from the inner equi-join) and is only selected
    if budget remains after every non-null level. Non-numeric level
    expressions are rejected loudly: silently funnelling every row into
    one bucket would recreate the single-reducer global window this
    operator exists to avoid.
    """
    b = df.withColumn("__level", level)
    ltype = dict(b.dtypes)["__level"]
    if ltype.startswith("decimal"):
        # coarsening distinct levels is always safe (the operator is
        # level-invariant for any monotone coarsening), so a decimal
        # level rides the double path; only bucket BALANCE could change
        # for decimals beyond double precision, never the result
        b = b.withColumn("__level", F.col("__level").cast("double"))
        ltype = "double"
    if ltype in ("double", "float"):
        sentinel = F.lit(float("inf")).cast(ltype)
    elif ltype in ("tinyint", "smallint", "int", "bigint"):
        bits = {"tinyint": 8, "smallint": 16, "int": 32, "bigint": 64}[ltype]
        sentinel = F.lit(2 ** (bits - 1) - 1).cast(ltype)
    else:
        raise ValueError(
            f"level expression must be numeric (got {ltype}); map it to "
            "a numeric bucket (e.g. a hash or ordinal) first"
        )
    b = b.withColumn("__level", F.coalesce(F.col("__level"), sentinel))
    in_level = (
        Window.partitionBy("__level")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = b.withColumn(
        "__local",
        F.coalesce(F.sum(weight_col).over(in_level), F.lit(0)).cast("long"),
    )
    across = Window.orderBy("__level").rowsBetween(
        Window.unboundedPreceding, -1
    )
    carries = (
        b.groupBy("__level")
        .agg(F.sum(weight_col).alias("__tot"))
        .withColumn(
            "__carry", F.coalesce(F.sum("__tot").over(across), F.lit(0))
        )
        .select("__level", F.col("__carry").cast("long").alias("__carry"))
    )
    out = local.join(F.broadcast(carries), "__level")
    return (
        out.withColumn(cum_col, F.col("__carry") + F.col("__local"))
        .withColumn(flag_col, F.col(cum_col) < F.lit(budget))
        .drop("__level", "__local", "__carry")
    )
