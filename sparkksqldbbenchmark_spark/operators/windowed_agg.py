"""Tumbling-window group-aggregation — the reference's core query.

Semantic parity: SparkWeatherConsumer.scala:245-271 (groupBy(window(ts,dur),
metric, stationId, stationName).agg(avg,min,max,count,min(producer_ts)) then
round/stringify projection) and the ksqlDB twin
(ksqldb-consumer/setup-ksqldb-correct.sh:93-142, WINDOW TUMBLING SIZE 1
MINUTES).

Scale notes: this is a single hash aggregation — Catalyst emits
partial_avg/min/max/count before the shuffle, so the shuffle carries one row
per (window × keys) per input partition, not per input row. Grouping keys
include the window struct, so state/partitioning is uniform in event time;
skewed stations are handled by AQE skew-join/partition-split at runtime. The
same builder serves batch and streaming DataFrames (identical logical plan;
streaming adds StateStoreSave in IncrementalExecution).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sparkksqldbbenchmark_spark.functions.stable import stable_avg


def tumbling_window_agg(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    window_duration: str = "1 minute",
    keys: Sequence[str] = ("metric", "stationId", "stationName"),
    value_col: str = "value",
    order_col: str | None = None,
    use_processing_time: bool = False,
    watermark: str | None = None,
    round_dp: int = 2,
) -> DataFrame:
    """window(ts, dur) × keys → avg/min/max/count + min(order_col).

    ``use_processing_time`` mirrors USE_EVENT_TIME=false
    (SparkWeatherConsumer.scala:234-243): windows over current_timestamp().
    ``watermark`` is our deliberate extension over the reference (SURVEY §2.9
    T4 — the reference never bounds state).
    """
    time_col: Column
    if use_processing_time:
        df = df.withColumn("__proc_ts", F.current_timestamp())
        time_col = F.col("__proc_ts")
        ts_name = "__proc_ts"
    else:
        time_col = F.col(ts_col)
        ts_name = ts_col

    if watermark and df.isStreaming:
        df = df.withWatermark(ts_name, watermark)

    aggs = [
        # stable_avg: exact decimal sum → deterministic rounding across
        # partition orders and engines (see functions/stable.py)
        stable_avg(value_col, round_dp).alias("avg_value"),
        F.round(F.min(value_col), round_dp).alias("min_value"),
        F.round(F.max(value_col), round_dp).alias("max_value"),
        F.count(F.lit(1)).alias("message_count"),
    ]
    if order_col is not None:
        aggs.append(F.min(order_col).alias("min_producer_ts"))

    agged = df.groupBy(F.window(time_col, window_duration), *keys).agg(*aggs)
    return agged.select(
        F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        F.date_format("window.end", "yyyy-MM-dd HH:mm:ss").alias("window_end"),
        *keys,
        "avg_value",
        "min_value",
        "max_value",
        "message_count",
        *(["min_producer_ts"] if order_col is not None else []),
    )


def finalize_for_sink(agged: DataFrame) -> DataFrame:
    """Add the processing-end timestamp column the reference attaches before
    the Kafka sink (SparkWeatherConsumer.scala:270: unix_timestamp()*1000 —
    second precision ×1000, preserved for output parity). Excluded from
    golden comparisons (nondeterministic)."""
    return agged.withColumn(
        "processing_end_ts",
        (F.unix_timestamp(F.current_timestamp()) * F.lit(1000)).cast("long"),
    )
