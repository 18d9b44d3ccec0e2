"""Python DataSource V2 sources (sources/pyds.py): the GeoJSON page
source must equal the driver-loop twin row for row with one partition
per page, and the events replay stream must be a deterministic
exactly-once replay of the parquet (same offsets → same rows)."""

from __future__ import annotations

import json
import os
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from sparkksqldbbenchmark_spark.catalog import load_table
from sparkksqldbbenchmark_spark.sources.pyds import (
    EventsReplayStreamReader,
    register_python_sources,
)
from sparkksqldbbenchmark_spark.sources.rest import read_paginated_geojson
from sparkksqldbbenchmark_spark.streaming.pipeline import run_to_memory

SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture()
def pages_dir():
    d = tempfile.mkdtemp(prefix="geojson_pages_")
    pages = []
    for p in range(3):
        feats = [
            {
                "properties": {
                    "stationId": f"s{p}_{i}",
                    "parameterId": "wind",
                    "value": float(p * 10 + i),
                    "observed": f"2024-01-0{p + 1}",
                },
                "geometry": {"coordinates": [10.0 + i, 55.0 + p]},
            }
            for i in range(4)
        ]
        # one feature with no stationId — must be skipped, and one with
        # no geometry — must keep the row with NULL coords
        feats.append({"properties": {"noStation": True}})
        feats.append(
            {"properties": {"stationId": f"g{p}", "value": 1.5}}
        )
        page = {"features": feats}
        pages.append(page)
        with open(os.path.join(d, f"page-{p:03d}.json"), "w") as fh:
            json.dump(page, fh)
    yield d, pages


def test_geojson_source_equals_driver_loop(spark, pages_dir):
    d, pages = pages_dir
    register_python_sources(spark)
    df = spark.read.format("geojson_pages").option("path", d).load()
    got = sorted(
        (r.stationId, r.value, r.longitude, r.latitude)
        for r in df.collect()
    )

    def fetch(offset, limit):
        i = offset // limit
        return pages[i] if i < len(pages) else {"features": []}

    twin = read_paginated_geojson(spark, fetch, limit=100)
    want = sorted(
        (
            r.stationId,
            float(r.value) if r.value is not None else None,
            r.longitude,
            r.latitude,
        )
        for r in twin.collect()
    )
    assert got == want
    assert len(got) == 3 * 5  # 4 + 1 no-geometry row per page; skipped
    # one partition per page file — the parallelism contract
    assert df.rdd.getNumPartitions() == 3
    # no-geometry row survives with NULL coords
    assert any(s.startswith("g") and lon is None for s, _, lon, _ in got)


def test_events_replay_stream_equals_batch(spark):
    register_python_sources(spark)
    stream = (
        spark.readStream.format("events_replay")
        .option("path", f"{SF_DIR}/events.parquet")
        .option("batch_rows", "2000")
        .load()
    )
    agg = stream.groupBy(
        F.window(F.timestamp_micros("ts_us"), "1 hour")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("value") * 100)).alias("cents"),
    )
    name = f"pyds_replay_{uuid.uuid4().hex[:8]}"
    q = run_to_memory(agg, name, output_mode="complete")
    q.stop()
    got = {
        (str(r["window"]["start"]), r["n"], r["cents"])
        for r in spark.table(name).collect()
    }
    ev = load_table(spark, SF_DIR, "events")
    want = {
        (str(r["window"]["start"]), r["n"], r["cents"])
        for r in ev.groupBy(F.window("ts", "1 hour"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("value") * 100)).alias("cents"),
        )
        .collect()
    }
    assert got == want and got


def test_replay_reader_offsets_are_deterministic():
    r = EventsReplayStreamReader(f"{SF_DIR}/events.parquet", 1000)
    assert r.initialOffset() == {"index": 0}
    latest = r.latestOffset()
    assert latest["index"] == r.n > 0
    parts = r.partitions({"index": 0}, latest)
    # ranges tile [0, n) exactly, each ≤ batch_rows
    spans = sorted(p.value for p in parts)
    assert spans[0][0] == 0 and spans[-1][1] == r.n
    for (a, b), (c, _) in zip(spans, spans[1:]):
        assert b == c and b - a <= 1000
    # same partition read twice yields identical rows (exactly-once
    # replay contract)
    rows1 = list(r.read(parts[0]))
    rows2 = list(r.read(parts[0]))
    assert rows1 == rows2 and len(rows1) == spans[0][1] - spans[0][0]


def test_jsonl_sink_commit_protocol(spark, tmp_path):
    """Manifest names exactly the committed files with the exact row
    total; abort() removes the orphaned task files."""
    from sparkksqldbbenchmark_spark.sources.pyds import (
        JsonlPageCommit,
        JsonlPagesWriter,
        register_python_sources,
    )

    register_python_sources(spark)
    d = str(tmp_path / "out")
    os.makedirs(d)
    df = spark.range(50).selectExpr(
        "id", "CAST(id % 7 AS STRING) AS bucket"
    ).repartition(3)
    df.write.format("jsonl_pages").option("path", d).mode(
        "append"
    ).save()
    with open(os.path.join(d, "_MANIFEST.json")) as fh:
        manifest = json.load(fh)
    assert manifest["rows"] == 50
    on_disk = sorted(
        f for f in os.listdir(d) if f.endswith(".jsonl")
    )
    assert on_disk == manifest["files"] and len(on_disk) == 3
    back = spark.read.json([os.path.join(d, f) for f in on_disk])
    assert back.count() == 50
    assert back.agg({"id": "sum"}).collect()[0][0] == sum(range(50))

    # task attempts write to attempt-unique names: a retried or
    # speculative attempt can never race the winner on one file
    assert all("-attempt-" in f for f in on_disk)

    # commit path: files from LOSING attempts (commit message discarded
    # by Spark) are swept so the directory matches the manifest
    from pyspark.sql.types import StructType

    loser = os.path.join(d, "part-00000-attempt-9999.jsonl")
    with open(loser, "w") as fh:
        fh.write("{}\n")
    w = JsonlPagesWriter(d, StructType([]), overwrite=True)
    w.commit([JsonlPageCommit(f, 1) for f in on_disk])
    assert not os.path.exists(loser)
    assert sorted(
        f for f in os.listdir(d) if f.endswith(".jsonl")
    ) == on_disk

    # abort path: orphan files are removed, manifest untouched
    orphan = os.path.join(d, "part-99999.jsonl")
    with open(orphan, "w") as fh:
        fh.write("{}\n")
    w.abort([JsonlPageCommit("part-99999.jsonl", 1)])
    assert not os.path.exists(orphan)
    assert os.path.exists(os.path.join(d, "_MANIFEST.json"))


def test_jsonl_sink_append_preserves_prior_jobs(spark, tmp_path):
    """mode('append') twice into one directory: the second job's
    loser-attempt sweep is scoped to its own job-id prefix, so the
    first job's committed data files survive and the manifest unions
    both jobs (previously the sweep deleted every part file it did not
    itself write — append silently truncated). mode('overwrite') then
    replaces the whole dataset, files and manifest alike."""
    from sparkksqldbbenchmark_spark.sources.pyds import (
        register_python_sources,
    )

    register_python_sources(spark)
    d = str(tmp_path / "out_append")
    os.makedirs(d)

    def save(lo, hi, mode):
        spark.range(lo, hi).selectExpr("id").repartition(2).write.format(
            "jsonl_pages"
        ).option("path", d).mode(mode).save()

    save(0, 30, "append")
    save(30, 50, "append")
    with open(os.path.join(d, "_MANIFEST.json")) as fh:
        manifest = json.load(fh)
    on_disk = sorted(f for f in os.listdir(d) if f.endswith(".jsonl"))
    assert manifest["rows"] == 50
    assert manifest["files"] == on_disk and len(on_disk) == 4
    back = spark.read.json([os.path.join(d, f) for f in on_disk])
    assert back.count() == 50
    assert back.agg({"id": "sum"}).collect()[0][0] == sum(range(50))

    save(100, 110, "overwrite")
    with open(os.path.join(d, "_MANIFEST.json")) as fh:
        manifest = json.load(fh)
    on_disk = sorted(f for f in os.listdir(d) if f.endswith(".jsonl"))
    assert manifest["rows"] == 10
    assert manifest["files"] == on_disk and len(on_disk) == 2


def test_jsonl_stream_sink_batch_manifests(spark, tmp_path):
    """The streaming writer publishes a _BATCH_{id}.json manifest per
    micro-batch naming exactly the files its winning attempts wrote;
    abort removes known attempt files and leaves manifests alone."""
    from pyspark.sql.types import StructType

    from sparkksqldbbenchmark_spark.sources.pyds import (
        JsonlPageCommit,
        JsonlStreamWriter,
        register_python_sources,
    )

    register_python_sources(spark)
    d = str(tmp_path / "sout")
    os.makedirs(d)
    src = str(tmp_path / "ssrc")
    spark.range(40).selectExpr(
        "id", "CAST(id % 3 AS STRING) AS bucket"
    ).write.parquet(src)
    q = (
        spark.readStream.schema("id long, bucket string")
        .parquet(src)
        .repartition(2)
        .writeStream.format("jsonl_pages")
        .option("path", d)
        .option("checkpointLocation", str(tmp_path / "sckpt"))
        .trigger(availableNow=True)
        .queryName("sink_contract_test")
        .start()
    )
    q.awaitTermination(60)
    q.stop()

    manifests = sorted(
        f for f in os.listdir(d) if f.startswith("_BATCH_")
    )
    assert manifests, "no batch manifests published"
    named, rows = [], 0
    for mf in manifests:
        with open(os.path.join(d, mf)) as fh:
            m = json.load(fh)
        named += m["files"]
        rows += m["rows"]
    assert rows == 40
    assert all("-attempt-" in f for f in named)
    on_disk = {f for f in os.listdir(d) if f.endswith(".jsonl")}
    assert set(named) <= on_disk
    back = spark.read.json([os.path.join(d, f) for f in named])
    assert back.count() == 40
    assert back.agg({"id": "sum"}).collect()[0][0] == sum(range(40))

    # abort path: known attempt files removed, manifests untouched
    w = JsonlStreamWriter(d, StructType([]))
    orphan = os.path.join(d, "stream-part-00099-attempt-7.jsonl")
    with open(orphan, "w") as fh:
        fh.write("{}\n")
    w.abort(
        [JsonlPageCommit("stream-part-00099-attempt-7.jsonl", 1)], 99
    )
    assert not os.path.exists(orphan)
    assert sorted(
        f for f in os.listdir(d) if f.startswith("_BATCH_")
    ) == manifests


def test_events_pushdown_reader_bounds_algebra(tmp_path):
    """pushFilters bound folding without Spark: each supported
    comparison tightens [lo, hi); unsupported filters come back out;
    partition clipping honors the bounds. (The end-to-end pruning is
    graded by the staged python_datasource_filter_pushdown row.)"""
    import json
    import os

    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThan,
        GreaterThanOrEqual,
        IsNotNull,
        LessThan,
        LessThanOrEqual,
        StringStartsWith,
    )

    from sparkksqldbbenchmark_spark.sources.pyds import (
        EventsPushdownReader,
    )

    scratch = str(tmp_path / "push_scratch")
    os.makedirs(scratch)
    r = EventsPushdownReader(
        "/root/testdata/sf0.001/events.parquet", scratch, 100
    )
    assert (r.lo, r.hi) == (0, 1000)
    unsupported = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("event_id",), 150),
                GreaterThan(("event_id",), 199),   # → lo 200
                LessThanOrEqual(("event_id",), 899),  # → hi 900
                LessThan(("event_id",), 850),      # → hi 850
                IsNotNull(("event_id",)),          # no .value — declined
                StringStartsWith(("event_type",), "cl"),  # declined
            ]
        )
    )
    assert (r.lo, r.hi) == (200, 850)
    assert {type(f).__name__ for f in unsupported} == {
        "IsNotNull",
        "StringStartsWith",
    }
    with open(os.path.join(scratch, "_pushed.json")) as fh:
        assert json.load(fh) == {"lo": 200, "hi": 850}
    spans = [p.value for p in r.partitions()]
    assert spans[0] == (200, 300) and spans[-1] == (800, 850)
    assert all(a >= 200 and b <= 850 for a, b in spans)

    # EqualTo folds to a one-row range
    r2 = EventsPushdownReader(
        "/root/testdata/sf0.001/events.parquet", scratch, 100
    )
    list(r2.pushFilters([EqualTo(("event_id",), 412)]))
    assert (r2.lo, r2.hi) == (412, 413)
    assert [p.value for p in r2.partitions()] == [(412, 413)]

    # contradictory bounds → empty sentinel partition, zero rows
    r3 = EventsPushdownReader(
        "/root/testdata/sf0.001/events.parquet", scratch, 100
    )
    list(
        r3.pushFilters(
            [
                GreaterThanOrEqual(("event_id",), 900),
                LessThan(("event_id",), 100),
            ]
        )
    )
    parts = r3.partitions()
    assert len(parts) == 1
    assert list(r3.read(parts[0])) == []
