"""Latency-monitor metrics pipeline as one batch DataFrame query.

Re-expresses LatencyMonitor.scala:211-302 declaratively:
validity filter (P4) → latency column → aggregation (A4/A5) with the
reference's exact conventions:
- percentile = sorted[(count*p).toInt] clamped — nearest-rank-ish,
  0-based floor(n·p) index (LatencyMonitor.scala:278-280), NOT
  interpolated;
- std-dev divides by N (population, :286-287);
- top-5 highest-latency windows (:383-391).

The reference collects everything into a driver-side ListBuffer; here the
data never leaves the executors until the final handful of scalars.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# The monitor's validity bounds (LatencyMonitor.scala:217-221)
MAX_LATENCY_MS = 600_000
MIN_TS = "2020-01-01 00:00:00"


def valid_latency_points(
    df: DataFrame,
    *,
    end_ts_col: str = "processing_end_ts",
    start_ts_col: str = "min_producer_ts",
) -> DataFrame:
    """Derive latency_ms and apply the monitor's validity predicate."""
    lat = (F.col(end_ts_col) - F.col(start_ts_col)).alias("latency_ms")
    out = df.withColumn("latency_ms", lat)
    return out.where(
        (F.col("latency_ms") > 0)
        & (F.col("latency_ms") < MAX_LATENCY_MS)
        & (
            F.col(start_ts_col)
            > F.unix_timestamp(F.lit(MIN_TS).cast("timestamp")) * 1000
        )
    )


def nearest_rank_percentiles(
    df: DataFrame, col: str, ps: tuple[float, ...] = (0.5, 0.95, 0.99)
) -> dict[str, float]:
    """The reference's index-based percentiles in one pass: rank every row
    once, pick the floor(n·p) indices (clamped). One sort-shuffle total,
    regardless of how many percentiles are requested."""
    n = F.count(F.lit(1)).over(Window.partitionBy())
    rn = F.row_number().over(Window.partitionBy().orderBy(col))
    ranked = df.select(
        F.col(col), rn.alias("__rn"), n.alias("__n")
    )
    flag = None
    for p in ps:
        c = F.col("__rn") - 1 == F.least(
            F.floor(F.col("__n") * F.lit(p)), F.col("__n") - 1
        )
        flag = c if flag is None else (flag | c)
    rows = ranked.where(flag).collect()
    out: dict[str, float] = {}
    for p in ps:
        for r in rows:
            idx = min(int(r["__n"] * p), r["__n"] - 1)
            if r["__rn"] - 1 == idx:
                out[f"p{str(p).replace('0.', '')}"] = float(r[col])
    return out


@dataclass
class LatencyMetrics:
    sample_count: int
    avg_ms: float
    min_ms: float
    max_ms: float
    stddev_ms: float
    p50_ms: float
    p95_ms: float
    p99_ms: float

    def quality(self) -> dict[str, str]:
        """The monitor's scoring thresholds
        (LatencyMonitor.scala:357-378)."""

        def grade(v: float, excellent: float, good: float) -> str:
            return (
                "excellent" if v < excellent
                else "good" if v < good else "poor"
            )

        return {
            "avg": grade(self.avg_ms, 5_000, 30_000),
            "p99": grade(self.p99_ms, 10_000, 60_000),
            "stddev": grade(self.stddev_ms, 5_000, 15_000),
        }


def calculate_metrics(valid: DataFrame, col: str = "latency_ms") -> LatencyMetrics:
    basic = valid.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(col).alias("avg"),
        F.min(col).alias("mn"),
        F.max(col).alias("mx"),
        F.stddev_pop(col).alias("sd"),
    ).collect()[0]
    pcts = nearest_rank_percentiles(valid, col)
    return LatencyMetrics(
        sample_count=basic["n"],
        avg_ms=float(basic["avg"] or 0.0),
        min_ms=float(basic["mn"] or 0.0),
        max_ms=float(basic["mx"] or 0.0),
        stddev_ms=float(basic["sd"] or 0.0),
        p50_ms=pcts.get("p5", 0.0),
        p95_ms=pcts.get("p95", 0.0),
        p99_ms=pcts.get("p99", 0.0),
    )


def top_latency_windows(valid: DataFrame, k: int = 5) -> DataFrame:
    """O2 — the report's top-5 worst windows
    (LatencyMonitor.scala:383-391)."""
    return valid.orderBy(F.desc("latency_ms")).limit(k)
