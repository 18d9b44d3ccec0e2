"""Range-sorted layout (operators/layout.write_range_sorted): the
written files must carry pairwise-DISJOINT ranges of the sort key in
their parquet footers — the property min/max file skipping follows from
on any engine — and a range scan over the layout must read fewer files
than the total while returning exactly the plain answer."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from sparkksqldbbenchmark_spark.catalog import load_table
from sparkksqldbbenchmark_spark.operators.layout import (
    file_range_stats,
    write_range_sorted,
)
from tests.conftest import SF_DIR


def test_range_sorted_files_are_disjoint_and_scan_skips(spark):
    d = tempfile.mkdtemp(prefix="layout_range_")
    try:
        ev = load_table(spark, SF_DIR, "events").select(
            "event_id", "ts", "value"
        )
        write_range_sorted(ev, d, "event_id", num_files=8)
        stats = file_range_stats(d, "event_id")
        assert len(stats) == 8
        # pairwise disjoint: sorted by min, each file's min > previous max
        ordered = sorted(stats, key=lambda s: s[1])
        for (_, _, prev_max), (_, cur_min, _) in zip(ordered, ordered[1:]):
            assert cur_min > prev_max, ordered
        # a narrow range filter must touch few files and agree with plain
        total = ev.where(F.col("event_id") < 100).agg(
            F.count(F.lit(1)), F.sum("value")
        ).collect()[0]
        got = (
            spark.read.parquet(d)
            .where(F.col("event_id") < 100)
            .agg(F.count(F.lit(1)), F.sum("value"))
            .collect()[0]
        )
        assert tuple(got) == tuple(total)
        lo = ordered[0]
        assert lo[1] == 0 and lo[2] >= 99, (
            "first range file should own the queried prefix"
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_max_records_per_file_splits_keep_disjointness(spark):
    d = tempfile.mkdtemp(prefix="layout_split_")
    try:
        ev = load_table(spark, SF_DIR, "events").select("event_id", "value")
        n = ev.count()
        write_range_sorted(
            ev, d, "event_id", num_files=4, max_records_per_file=n // 16
        )
        stats = file_range_stats(d, "event_id")
        assert len(stats) > 4  # the size cap split partitions into files
        ordered = sorted(stats, key=lambda s: s[1])
        for (_, _, prev_max), (_, cur_min, _) in zip(ordered, ordered[1:]):
            assert cur_min > prev_max
    finally:
        shutil.rmtree(d, ignore_errors=True)
