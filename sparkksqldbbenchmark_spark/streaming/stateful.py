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


def session_schema(key_type=StringType()) -> StructType:
    """Output schema for sessionize; the key column keeps the input key's
    type (string test fixtures, bigint user ids, ...)."""
    return StructType(
        [
            StructField("key", key_type),
            StructField("session_start", TimestampType()),
            StructField("session_end", TimestampType()),
            StructField("event_count", LongType()),
        ]
    )


# fixed-string-key shape kept for existing callers/tests
SESSION_SCHEMA = session_schema()

# every open session for the key, as parallel epoch-ms arrays — sessions
# stay here until the watermark passes end + gap, so a late-but-in-
# watermark event can still bridge any two of them
_STATE_SCHEMA = (
    "starts array<bigint>, ends array<bigint>, counts array<bigint>"
)


def sessionize(
    df: DataFrame,
    *,
    key_col: str = "key",
    ts_col: str = "ts",
    gap_seconds: int = 30,
) -> DataFrame:
    """Session windows: events for a key belong to one session while gaps
    stay under `gap_seconds`; a closed session emits one row with
    session_end = last event (add the gap for F.session_window's
    half-open end convention).

    True session_window semantics under out-of-order cross-batch data: a
    session is emitted ONLY once the watermark passes its end + gap — no
    event the watermark still admits could extend or bridge it. Until
    then every gap-split session (not just the trailing one) is held in
    state as parallel arrays, so a late event arriving in a later
    micro-batch can merge two stored sessions. Closable sessions flush
    when the key next sees data or via event-time timeout (armed at the
    earliest open session's end + gap), whichever comes first.

    Scale: state per key is O(open sessions), bounded by the watermark —
    everything older flushes; Arrow moves batches in and out.
    """
    import pandas as pd

    gap_ms = gap_seconds * 1000

    def frame(k: str, sessions: list[tuple]) -> "pd.DataFrame":
        return pd.DataFrame(
            {
                "key": pd.Series([k] * len(sessions), dtype="object"),
                "session_start": pd.Series(
                    pd.to_datetime([s[0] for s in sessions], unit="ms")
                ),
                "session_end": pd.Series(
                    pd.to_datetime([s[1] for s in sessions], unit="ms")
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
        sessions: list[list] = []
        if state.exists:
            starts, ends, counts = state.get
            sessions = [list(t) for t in zip(starts, ends, counts)]

        if not state.hasTimedOut:
            parts = [pd.to_datetime(pdf[ts_col]) for pdf in pdfs]
            if parts:
                ts = pd.concat(parts).sort_values().reset_index(drop=True)
                ms = ts.astype("int64") // 1_000_000  # ns → epoch ms
                # vectorized gap split: a new group starts where the
                # inter-event gap exceeds the session gap
                groups = (ms.diff() > gap_ms).cumsum()
                agg = ms.groupby(groups).agg(["min", "max", "count"])
                sessions.extend(
                    [int(r["min"]), int(r["max"]), int(r["count"])]
                    for _, r in agg.iterrows()
                )

        # merge chainable sessions (start within gap of the previous end)
        sessions.sort()
        merged: list[list] = []
        for s in sessions:
            if merged and s[0] - merged[-1][1] <= gap_ms:
                merged[-1][1] = max(merged[-1][1], s[1])
                merged[-1][2] += s[2]
            else:
                merged.append(s)

        # a session is final once no admissible event can extend it
        wm = state.getCurrentWatermarkMs()
        closed = [s for s in merged if s[1] + gap_ms <= wm]
        still_open = [s for s in merged if s[1] + gap_ms > wm]
        if still_open:
            state.update(
                (
                    [s[0] for s in still_open],
                    [s[1] for s in still_open],
                    [s[2] for s in still_open],
                )
            )
            # earliest possible close; guaranteed > current watermark
            state.setTimeoutTimestamp(
                min(s[1] for s in still_open) + gap_ms
            )
        else:
            state.remove()
        if closed:
            yield frame(key[0], closed)

    return (
        df.withWatermark(ts_col, f"{gap_seconds} seconds")
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=session_schema(
                df.schema[key_col].dataType
            ),
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
