"""T6 checkpoint recovery, actually exercised: a streaming query is run
to completion, MORE data arrives, and a fresh query object restarted on
the SAME checkpoint must process only the new files — no reprocessing,
no loss — with the idempotent batch-keyed sink (T10) composing into
end-to-end effectively-once across the restart."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from sparkksqldbbenchmark_spark.streaming.pipeline import (
    run_foreach_batch_idempotent,
)


def _write_batch_files(spark, d, ids):
    for i in ids:
        (
            spark.range(i * 100, i * 100 + 10)
            .select(
                F.col("id").alias("event_id"),
                (F.col("id") % 5).alias("key"),
                (F.col("id") * 1.5).alias("value"),
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(d)
        )


@pytest.fixture
def scratch_dirs():
    dirs = [tempfile.mkdtemp(prefix=p) for p in
            ("ckpt_src_", "ckpt_out_", "ckpt_state_")]
    yield dirs
    for d in dirs:
        shutil.rmtree(d, ignore_errors=True)


def test_restart_from_checkpoint_processes_only_new_files(
    spark, scratch_dirs
):
    src, out, ckpt = scratch_dirs

    _write_batch_files(spark, src, [0, 1, 2])
    schema = spark.read.parquet(src).schema

    def start():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        return run_foreach_batch_idempotent(stream, out, checkpoint=ckpt)

    q1 = start()
    q1.awaitTermination(300)
    first = spark.read.parquet(f"{out}/batch=*")
    n_first = first.count()
    assert n_first == 30, "first run must process all three seed files"
    batches_first = {
        d for d in os.listdir(out) if d.startswith("batch=")
    }

    # new data lands while the query is DOWN
    _write_batch_files(spark, src, [3, 4])

    q2 = start()
    q2.awaitTermination(300)
    all_rows = spark.read.parquet(f"{out}/batch=*")
    assert all_rows.count() == 50, (
        "restart must add exactly the 20 new rows - no reprocessing "
        "(duplicates), no loss"
    )
    assert all_rows.select("event_id").distinct().count() == 50
    batches_after = {
        d for d in os.listdir(out) if d.startswith("batch=")
    }
    new_batches = batches_after - batches_first
    assert new_batches, "restart must continue the batch-id sequence"
    # restarted batch ids continue after the first run's (checkpointed
    # offset log), never reusing a committed id with different data
    first_ids = {int(b.split("=")[1]) for b in batches_first}
    new_ids = {int(b.split("=")[1]) for b in new_batches}
    assert min(new_ids) > max(first_ids)


def test_restart_with_no_new_data_is_a_noop(spark, scratch_dirs):
    src, out, ckpt = scratch_dirs
    _write_batch_files(spark, src, [0])
    schema = spark.read.parquet(src).schema

    def start():
        stream = spark.readStream.schema(schema).parquet(src)
        return run_foreach_batch_idempotent(stream, out, checkpoint=ckpt)

    q1 = start()
    q1.awaitTermination(300)
    n1 = spark.read.parquet(f"{out}/batch=*").count()
    q2 = start()
    q2.awaitTermination(300)
    n2 = spark.read.parquet(f"{out}/batch=*").count()
    assert n1 == n2 == 10
