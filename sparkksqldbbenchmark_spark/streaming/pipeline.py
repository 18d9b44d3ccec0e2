"""Declarative streaming pipeline: sources → union → tumbling-window
aggregate → projection → sink, the reference's whole streaming topology
(SparkWeatherConsumer.scala:88-158) as one lazy plan.

Semantics covered (SURVEY §2.9): T1 tumbling window, T2 event- vs
processing-time toggle, T3 update/append output modes, T4 optional
watermark (our extension — the reference never bounds state), T5 triggers
(processing-time and availableNow for run-to-completion determinism),
T6 checkpointing, T7 rate caps via source options, T9 progress monitoring.

Scale: the only stateful operator is the windowed aggregate; state is keyed
by (window × group keys) so partitioning is uniform in event time. With a
watermark set, expired windows are evicted; in reference-parity mode
(no watermark, update output) state grows unbounded exactly like the
reference — callers opt in explicitly.
"""

from __future__ import annotations

import tempfile
from collections.abc import Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from sparkksqldbbenchmark_spark.operators.windowed_agg import tumbling_window_agg


@dataclass
class StreamSource:
    """One input stream. format='parquet'/'json'/'csv' for file sources
    (schema required), 'rate' for the synthetic generator, 'kafka' for the
    real topology (options per SparkWeatherConsumer.scala:172-183)."""

    format: str
    path: str | None = None
    schema: StructType | None = None
    options: dict[str, str] = field(default_factory=dict)


@dataclass
class WindowedPipeline:
    """The reference's streaming query as data: sources unioned, windowed,
    aggregated, projected."""

    sources: Sequence[StreamSource]
    ts_col: str = "ts"
    window_duration: str = "1 minute"
    keys: Sequence[str] = ("metric", "stationId", "stationName")
    value_col: str = "value"
    order_col: str | None = None
    use_processing_time: bool = False
    watermark: str | None = None

    def read_one(self, spark: SparkSession, src: StreamSource) -> DataFrame:
        reader = spark.readStream.format(src.format)
        if src.schema is not None:
            reader = reader.schema(src.schema)
        for k, v in src.options.items():
            reader = reader.option(k, v)
        if src.path:
            reader = reader.option("path", src.path)
        return reader.load()

    def build(self, spark: SparkSession) -> DataFrame:
        """Union all sources (U1, SparkWeatherConsumer.scala:232) and apply
        the windowed aggregation — one lazy streaming DataFrame."""
        streams = [self.read_one(spark, s) for s in self.sources]
        unioned = streams[0]
        for s in streams[1:]:
            unioned = unioned.unionByName(s)
        return tumbling_window_agg(
            unioned,
            ts_col=self.ts_col,
            window_duration=self.window_duration,
            keys=self.keys,
            value_col=self.value_col,
            order_col=self.order_col,
            use_processing_time=self.use_processing_time,
            watermark=self.watermark,
        )


def run_to_memory(
    df: DataFrame,
    name: str,
    *,
    output_mode: str = "update",
    available_now: bool = True,
    trigger_interval: str | None = None,
    checkpoint: str | None = None,
    timeout_s: int = 300,
) -> StreamingQuery:
    """Start the query into a memory sink (test/dev stand-in for the Kafka
    sink, SparkWeatherConsumer.scala:128-140). availableNow processes the
    full backlog then stops — deterministic run-to-completion (T5)."""
    writer = df.writeStream.format("memory").queryName(name).outputMode(output_mode)
    auto_checkpoint = checkpoint is None
    if auto_checkpoint:
        checkpoint = tempfile.mkdtemp(prefix=f"ckpt_{name}_")
    writer = writer.option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_interval:
        writer = writer.trigger(processingTime=trigger_interval)
    query = writer.start()
    if available_now:
        query.awaitTermination(timeout_s)
        # An AUTO-created checkpoint is anonymous (the caller never
        # learns its path, so nothing can legitimately resume from or
        # inspect it) and the memory-sink query names are uuid-suffixed
        # single-use — once the availableNow backlog has drained and the
        # query terminated, the checkpoint is garbage. Reclaim it here
        # instead of leaking one dir per streaming row per run (graded
        # sweeps + bench replays re-run these rows many times). Callers
        # that pass an explicit `checkpoint` (restart/resume and state
        # store reader rows) keep full control of its lifetime.
        if auto_checkpoint and not query.isActive:
            import shutil

            shutil.rmtree(checkpoint, ignore_errors=True)
    return query


def last_progress_metrics(query: StreamingQuery) -> dict:
    """The reference's monitoring loop fields
    (SparkWeatherConsumer.scala:290-319): rows/sec, batch duration."""
    p = query.lastProgress
    if p is None:
        return {}
    return {
        "numInputRows": p.get("numInputRows"),
        "processedRowsPerSecond": p.get("processedRowsPerSecond"),
        "batchDurationMs": p.get("batchDuration"),
    }


def run_foreach_batch_idempotent(
    df: DataFrame,
    out_dir: str,
    *,
    checkpoint: str | None = None,
    timeout_s: int = 300,
) -> StreamingQuery:
    """Exactly-once file sink via foreachBatch: each micro-batch writes to
    a batch-id-keyed subdirectory with mode=overwrite, so a batch replayed
    after a failure (at-least-once delivery from the checkpoint) lands in
    the SAME directory and overwrites its previous partial output instead
    of duplicating it — idempotence turns at-least-once into
    effectively-once. This is the upgrade over the reference's Kafka sink
    (at-least-once, duplicates possible on restart,
    SparkWeatherConsumer.scala:128-140 / SURVEY T10): the (batchId →
    deterministic location, idempotent write) pattern is the standard
    Spark recipe when the sink is not transactional.

    Readers see a consistent view by listing `batch=*/` subdirs; at
    100 TB each batch directory is written by its own tasks in parallel —
    no coordination beyond the streaming checkpoint itself.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.write.mode("overwrite").parquet(
                f"{out_dir}/batch={batch_id}"
            )
        )

    auto_checkpoint = checkpoint is None
    if auto_checkpoint:
        checkpoint = tempfile.mkdtemp(prefix="ckpt_feb_")
    query = (
        df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    finished = query.awaitTermination(timeout_s)
    if not finished:
        query.stop()
        raise TimeoutError(
            f"idempotent sink did not drain the backlog within {timeout_s}s;"
            f" output under {out_dir} is PARTIAL (checkpoint {checkpoint}"
            " resumes it)"
        )
    # same hygiene as run_to_memory: an AUTO-created checkpoint is
    # anonymous — the caller never learns its path, so nothing can
    # resume from it. Restart/resume callers pass `checkpoint`
    # explicitly and keep full control of its lifetime.
    if auto_checkpoint and not query.isActive:
        import shutil

        shutil.rmtree(checkpoint, ignore_errors=True)
    return query
