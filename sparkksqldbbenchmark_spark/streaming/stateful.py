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
    stay under `gap_seconds`; a closed session emits one row. Incoming
    events are sorted and SPLIT on gap boundaries (including the gap
    between the stored open session and the first new event) — sessions
    closed by an in-batch gap emit immediately; only the trailing open
    session stays in state, closing later via event-time timeout when the
    watermark passes its end + gap. Matches F.session_window semantics.
    """
    import pandas as pd

    def frame(k: str, sessions: list[tuple]) -> "pd.DataFrame":
        return pd.DataFrame(
            {
                "key": pd.Series([k] * len(sessions), dtype="object"),
                "session_start": pd.Series(
                    [s[0] for s in sessions], dtype="datetime64[ns]"
                ),
                "session_end": pd.Series(
                    [s[1] for s in sessions], dtype="datetime64[ns]"
                ),
                "event_count": pd.Series(
                    [s[2] for s in sessions], dtype="int64"
                ),
            }
        )

    def fn(
        key: tuple,
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        if state.hasTimedOut:
            start, end, count = state.get
            state.remove()
            yield frame(key[0], [(start, end, count)])
            return

        parts = [pd.to_datetime(pdf[ts_col]) for pdf in pdfs]
        ts = pd.concat(parts).sort_values().reset_index(drop=True)
        # vectorized gap split: a new group starts where the inter-event
        # gap exceeds gap_seconds
        groups = (ts.diff().dt.total_seconds() > gap_seconds).cumsum()
        agg = ts.groupby(groups).agg(["min", "max", "count"])
        sessions = [
            (
                row["min"].to_pydatetime(),
                row["max"].to_pydatetime(),
                int(row["count"]),
            )
            for _, row in agg.iterrows()
        ]
        if state.exists:
            start, end, count = state.get
            first = sessions[0]
            if (first[0] - end).total_seconds() <= gap_seconds:
                sessions[0] = (
                    min(start, first[0]),
                    max(end, first[1]),
                    count + first[2],
                )
            else:
                sessions.insert(0, (start, end, count))
        closed, tail = sessions[:-1], sessions[-1]
        state.update(tail)
        state.setTimeoutTimestamp(
            int(tail[1].timestamp() * 1000) + gap_seconds * 1000
        )
        yield frame(key[0], closed)

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
