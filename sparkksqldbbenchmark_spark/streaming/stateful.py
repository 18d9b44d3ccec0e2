"""Custom stateful streaming operators beyond the built-in windowed
aggregate (SURVEY.md §2.10 extension surface).

Two shapes:
- streaming_dedup / streaming_dedup_within_watermark: exactly-once-per-key
  emission over an unbounded stream — the streaming form of exact dedup
  (north-star §7). Built on dropDuplicates/dropDuplicatesWithinWatermark
  (state-store backed, watermark-bounded).
- sessionize: session windows with a gap timeout via
  applyInPandasWithState — the canonical "operator Spark's aggregates
  can't express" example (arbitrary per-key state machine). The reference
  has no session windows (SURVEY §2.9 T1: tumbling only); this is the
  documented extension path for custom state.

Scale: state is partitioned by the grouping key (uniform ids), watermark
eviction bounds it; Arrow batches move rows in and out of the Python
state function.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def streaming_dedup(df: DataFrame, keys: list[str]) -> DataFrame:
    """First occurrence per key, unbounded state (reference-parity
    behavior: no watermark, state grows — SURVEY §2.9 T4)."""
    return df.dropDuplicates(keys)


def streaming_dedup_within_watermark(
    df: DataFrame, keys: list[str], ts_col: str, delay: str
) -> DataFrame:
    """Watermark-bounded streaming dedup: duplicates arriving within the
    watermark delay are suppressed, state older than the watermark is
    evicted (the scale-safe variant)."""
    return df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(keys)


SESSION_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("event_count", LongType()),
    ]
)

_STATE_SCHEMA = "start timestamp, end timestamp, count long"


def sessionize(
    df: DataFrame,
    *,
    key_col: str = "key",
    ts_col: str = "ts",
    gap_seconds: int = 30,
) -> DataFrame:
    """Session windows: events for a key belong to one session while gaps
    stay under `gap_seconds`; a closed session emits one row. Uses
    applyInPandasWithState with an event-time timeout so sessions close
    when the watermark passes the gap."""
    import pandas as pd

    def fn(
        key: tuple,
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        if state.hasTimedOut:
            start, end, count = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "key": [key[0]],
                    "session_start": [start],
                    "session_end": [end],
                    "event_count": [count],
                }
            )
            return

        ts_min = None
        ts_max = None
        n = 0
        for pdf in pdfs:
            col = pd.to_datetime(pdf[ts_col])
            lo, hi = col.min(), col.max()
            ts_min = lo if ts_min is None else min(ts_min, lo)
            ts_max = hi if ts_max is None else max(ts_max, hi)
            n += len(pdf)
        if state.exists:
            start, end, count = state.get
            start = min(start, ts_min.to_pydatetime())
            end = max(end, ts_max.to_pydatetime())
            count += n
        else:
            start = ts_min.to_pydatetime()
            end = ts_max.to_pydatetime()
            count = n
        state.update((start, end, count))
        state.setTimeoutTimestamp(
            int(end.timestamp() * 1000) + gap_seconds * 1000
        )
        yield pd.DataFrame(
            {
                "key": pd.Series([], dtype="object"),
                "session_start": pd.Series([], dtype="datetime64[ns]"),
                "session_end": pd.Series([], dtype="datetime64[ns]"),
                "event_count": pd.Series([], dtype="int64"),
            }
        )

    return (
        df.withWatermark(ts_col, f"{gap_seconds} seconds")
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
