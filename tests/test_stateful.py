"""Custom stateful streaming operators: streaming dedup (both variants)
and applyInPandasWithState sessionization."""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import functions as F

from sparkksqldbbenchmark_spark.streaming.pipeline import run_to_memory
from sparkksqldbbenchmark_spark.streaming.stateful import (
    sessionize,
    streaming_dedup,
    streaming_dedup_within_watermark,
)


def _stream_fixture(spark, rows, schema):
    d = tempfile.mkdtemp(prefix="stateful_")
    df = spark.createDataFrame(rows, schema)
    if "ts" in df.columns:
        df = df.withColumn("ts", F.to_timestamp("ts"))
    df.coalesce(1).write.mode("overwrite").parquet(d)
    return spark.readStream.schema(
        spark.read.parquet(d).schema
    ).parquet(d)


def test_streaming_dedup(spark):
    rows = [
        ("2024-01-01 00:00:01", "a", 1),
        ("2024-01-01 00:00:02", "a", 2),  # dup key
        ("2024-01-01 00:00:03", "b", 3),
    ]
    stream = _stream_fixture(spark, rows, "ts string, k string, v long")
    name = f"dd_{uuid.uuid4().hex[:8]}"
    q = run_to_memory(streaming_dedup(stream, ["k"]), name,
                      output_mode="append")
    q.stop()
    got = {r["k"] for r in spark.table(name).collect()}
    assert got == {"a", "b"}
    assert spark.table(name).count() == 2


def test_streaming_dedup_within_watermark(spark):
    rows = [
        ("2024-01-01 00:00:01", "a", 1),
        ("2024-01-01 00:00:02", "a", 2),
        ("2024-01-01 00:10:00", "b", 3),  # advances watermark
    ]
    stream = _stream_fixture(spark, rows, "ts string, k string, v long")
    name = f"ddw_{uuid.uuid4().hex[:8]}"
    q = run_to_memory(
        streaming_dedup_within_watermark(stream, ["k"], "ts", "1 minute"),
        name,
        output_mode="append",
    )
    q.stop()
    ks = [r["k"] for r in spark.table(name).collect()]
    assert sorted(ks) == ["a", "b"]


def test_sessionize(spark):
    """Two sessions for key 'u1' separated by a > gap pause; a late
    watermark-driving event closes them."""
    rows = [
        ("2024-01-01 00:00:00", "u1"),
        ("2024-01-01 00:00:10", "u1"),   # same session (gap 10s < 30s)
        ("2024-01-01 00:05:00", "u1"),   # new session after 5 min gap
        ("2024-01-01 01:00:00", "wm"),   # pushes watermark far ahead
    ]
    stream = _stream_fixture(spark, rows, "ts string, key string")
    name = f"sess_{uuid.uuid4().hex[:8]}"
    q = run_to_memory(
        sessionize(stream, gap_seconds=30), name, output_mode="append"
    )
    q.stop()
    sessions = {
        (r["key"], str(r["session_start"]), r["event_count"])
        for r in spark.table(name).collect()
    }
    # Even arriving in one micro-batch, the 5-minute gap splits u1 into
    # two sessions: [00:00:00, 00:00:10] (2 events, closed by the in-batch
    # gap) and [00:05:00] (1 event, closed by event-time timeout).
    u1 = {(s, c) for k, s, c in sessions if k == "u1"}
    assert ("2024-01-01 00:00:00", 2) in u1
    assert ("2024-01-01 00:05:00", 1) in u1
    assert not any(c == 3 for _, c in u1)


def test_sessionize_late_event_bridges_cross_batch(spark):
    """The out-of-order hazard: batch 1 gap-splits u1 into [00:00:00] and
    [00:00:31] (gap=30s); batch 2 delivers a late-but-within-watermark
    event at 00:00:20 that bridges them. Because sessions are held in
    state until the watermark passes end + gap, the result is ONE merged
    session of 3 events — F.session_window semantics — not an eagerly
    emitted fragment plus a remainder."""
    import os
    import time

    d = tempfile.mkdtemp(prefix="stateful_bridge_")

    def write_batch(rows, sub):
        df = spark.createDataFrame(rows, "ts string, key string")
        df = df.withColumn("ts", F.to_timestamp("ts"))
        tmp = os.path.join(d, f"_tmp_{sub}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(
            f for f in os.listdir(tmp) if f.endswith(".parquet")
        )
        os.rename(os.path.join(tmp, part), os.path.join(d, f"{sub}.parquet"))

    write_batch(
        [("2024-01-01 00:00:00", "u1"), ("2024-01-01 00:00:31", "u1")],
        "b1",
    )
    time.sleep(1.1)  # distinct mtimes → deterministic file order
    write_batch(
        [("2024-01-01 00:00:20", "u1"), ("2024-01-01 01:00:00", "wm")],
        "b2",
    )
    schema = spark.read.parquet(d).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    name = f"sess_bridge_{uuid.uuid4().hex[:8]}"
    q = run_to_memory(
        sessionize(stream, gap_seconds=30), name, output_mode="append"
    )
    q.stop()
    u1 = [
        (str(r["session_start"]), str(r["session_end"]), r["event_count"])
        for r in spark.table(name).collect()
        if r["key"] == "u1"
    ]
    assert u1 == [("2024-01-01 00:00:00", "2024-01-01 00:00:31", 3)]


def test_running_totals_transform_with_state(spark):
    """The Spark-4 transformWithStateInPandas path: final per-key state
    must equal the batch groupBy totals (integer cents, so cross-batch
    accumulation order cannot drift the sum).

    The API's worker protocol needs google.protobuf, which this
    container does not ship (and installs are off-limits) — skip with a
    reason there, the same honest gating as the spark-avro JVM path."""
    import pytest

    try:
        import google.protobuf.descriptor  # noqa: F401
    except ImportError:
        pytest.skip(
            "transformWithStateInPandas needs google.protobuf "
            "(absent in this container; operator code import-checked)"
        )
    from sparkksqldbbenchmark_spark.catalog import load_table
    from sparkksqldbbenchmark_spark.streaming.tws import (
        running_totals_tws,
    )
    from tests.conftest import SF_DIR

    batch = load_table(spark, SF_DIR, "events").select(
        "user_id",
        (F.col("value") * 100).cast("long").alias("value_c"),
    )
    d = tempfile.mkdtemp(prefix="tws_")
    batch.write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(batch.schema).parquet(d)

    name = f"tws_{uuid.uuid4().hex[:8]}"
    q = run_to_memory(
        running_totals_tws(stream, key_col="user_id", value_col="value_c"),
        name,
        output_mode="update",
    )
    q.stop()
    # update mode appends one row per (key, touching batch); the final
    # totals are the LAST emission per key
    emitted = spark.table(name)
    from pyspark.sql.window import Window

    final = (
        emitted.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(
                    F.col("event_count").desc()
                )
            ),
        )
        .where(F.col("rn") == 1)
        .select("user_id", "event_count", "total_c")
    )
    want = batch.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("event_count"),
        F.sum("value_c").alias("total_c"),
    )
    got_rows = {tuple(r) for r in final.collect()}
    want_rows = {tuple(r) for r in want.collect()}
    assert got_rows == want_rows
