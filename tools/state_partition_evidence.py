"""Evidence run for the streaming state-partition sizing (VERDICT r17
ask #2): a stateful availableNow stream-stream join executed twice —
once pinned to the session's 32 shuffle partitions
(SPARK_GRAFT_STREAM_STATE_PARTS=session), once with the backlog-derived
count (auto) — recording wall time, batch count, the state operator's
reported numShufflePartitions, and a value hash of the output rows
(must be identical: state partition count changes layout, never
values).

Writes plans/r18/streaming_state_partitions_evidence.txt.

Run: python tools/state_partition_evidence.py
"""

from __future__ import annotations

import hashlib
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkksqldbbenchmark_spark.session import SessionConfig, get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def build_fixture(spark) -> tuple[str, str]:
    """Two 4-file parquet backlogs from the events table (same rows both
    sides), so maxFilesPerTrigger=1 yields a 4-batch availableNow run."""
    from sparkksqldbbenchmark_spark.catalog import load_table

    base = tempfile.mkdtemp(prefix="sse_")
    ev = load_table(spark, SF_DIR, "events").select(
        "ts", "user_id", "event_type", "value"
    )
    for side in ("a", "b"):
        ev.repartition(4).write.mode("overwrite").parquet(f"{base}/{side}")
    return f"{base}/a", f"{base}/b"


def run_once(spark, da: str, db: str, label: str) -> dict:
    from pyspark.sql import functions as F

    from sparkksqldbbenchmark_spark.streaming.pipeline import (
        run_to_memory,
    )

    sch = spark.read.parquet(da).schema
    a = (
        spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1")
        .parquet(da)
        .withWatermark("ts", "10 minutes")
        .select(
            F.col("ts").alias("a_ts"),
            F.col("user_id").alias("k"),
            F.col("value").alias("a_val"),
            "event_type",
        )
    )
    b = (
        spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1")
        .parquet(db)
        .withWatermark("ts", "10 minutes")
        .select(
            F.col("ts").alias("b_ts"),
            F.col("user_id").alias("bk"),
            F.col("value").alias("b_val"),
        )
    )
    j = a.join(
        b,
        F.expr(
            "k = bk AND b_ts BETWEEN a_ts - INTERVAL 1 MINUTE"
            " AND a_ts + INTERVAL 1 MINUTE"
        ),
    ).select("k", "event_type", "a_ts", "a_val", "b_val")
    name = f"sse_{label}_{int(time.time() * 1000)}"
    t0 = time.time()
    q = run_to_memory(j, name, output_mode="append", timeout_s=600)
    wall = time.time() - t0
    prog = q.lastProgress or {}
    ops = prog.get("stateOperators") or [{}]
    rows = spark.table(name).collect()
    lines = sorted(
        "|".join(str(v) for v in r) for r in rows
    )
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return {
        "label": label,
        "wall_s": round(wall, 2),
        "batch_id": prog.get("batchId"),
        "numShufflePartitions": ops[0].get("numShufflePartitions"),
        "n_rows": len(rows),
        "value_hash": h,
    }


def main() -> None:
    spark = get_spark(
        SessionConfig(
            app_name="state_partition_evidence",
            aqe=False,
            extra={"spark.ui.showConsoleProgress": "false"},
        )
    )
    spark.sparkContext.setLogLevel("ERROR")
    da, db = build_fixture(spark)

    results = []
    for label, env in (
        ("session32", "session"),
        ("auto", "auto"),
        ("session32_repeat", "session"),
        ("auto_repeat", "auto"),
    ):
        os.environ["SPARK_GRAFT_STREAM_STATE_PARTS"] = env
        results.append(run_once(spark, da, db, label))
        print(results[-1], flush=True)
    os.environ.pop("SPARK_GRAFT_STREAM_STATE_PARTS", None)

    hashes = {r["value_hash"] for r in results}
    rowns = {r["n_rows"] for r in results}
    assert len(hashes) == 1 and len(rowns) == 1, (
        "state partition count must not change values",
        results,
    )

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r18",
        "streaming_state_partitions_evidence.txt",
    )
    with open(out, "w") as f:
        f.write(
            "Stream-stream join, 4-file backlog per side, availableNow\n"
            f"maxFilesPerTrigger=1 (4 batches), events from {SF_DIR}\n"
            "session shuffle partitions = 32; auto derives the state\n"
            "partition count from backlog bytes"
            " (streaming/pipeline.scaled_state_partitions).\n\n"
        )
        for r in results:
            f.write(f"{r}\n")
        f.write(
            "\nIdentical n_rows and value_hash across all runs: the\n"
            "derived count changes state LAYOUT only. The wall delta is\n"
            "the per-partition state-store tax (open + commit + delta\n"
            "file per store per batch) removed on the tiny backlog.\n"
        )
    print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
