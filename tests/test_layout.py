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


def _morton_ref(x: int, y: int, bits: int = 8) -> int:
    """Python ground truth for zorder_code's bit interleave."""
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_zorder_code_is_bit_interleave(spark):
    """Morton code ground truth on a handful of hand-computed points."""
    from sparkksqldbbenchmark_spark.operators.layout import zorder_code

    pts = [(0, 0), (1, 0), (0, 1), (3, 5), (255, 0), (0, 255), (170, 85)]
    df = spark.createDataFrame(pts, "x int, y int").withColumn(
        "z", zorder_code(F.col("x"), F.col("y"))
    )
    for r in df.collect():
        assert r.z == _morton_ref(r.x, r.y), (r.x, r.y, r.z)


def test_zorder_layout_skips_on_both_dims(spark):
    """Every file's footer rect is a subset of the plane; a 2-D box must
    skip at least one file on EACH dim's stats, and the filtered answer
    must equal the plain-table answer."""
    from sparkksqldbbenchmark_spark.operators.layout import write_zordered

    d = tempfile.mkdtemp(prefix="layout_zorder_")
    try:
        ev = load_table(spark, SF_DIR, "events").select(
            "event_id", "user_id", "value"
        )
        write_zordered(ev, d, "event_id", "user_id", bits=8, num_files=8)
        xs = {f: (lo, hi) for f, lo, hi in file_range_stats(d, "event_id")}
        ys = {f: (lo, hi) for f, lo, hi in file_range_stats(d, "user_id")}
        assert len(xs) == 8
        xmax = max(hi for _, hi in xs.values())
        ymax = max(hi for _, hi in ys.values())
        x_lo, x_hi = (xmax * 10) // 100, (xmax * 35) // 100
        y_lo, y_hi = (ymax * 10) // 100, (ymax * 35) // 100
        x_skip = [f for f, (lo, hi) in xs.items() if hi < x_lo or lo > x_hi]
        y_skip = [f for f, (lo, hi) in ys.items() if hi < y_lo or lo > y_hi]
        assert x_skip, "no file skippable on dim x: " + repr(xs)
        assert y_skip, "no file skippable on dim y: " + repr(ys)
        box = (
            F.col("event_id").between(x_lo, x_hi)
            & F.col("user_id").between(y_lo, y_hi)
        )
        want = ev.where(box).agg(F.count(F.lit(1)), F.sum("value")).collect()[0]
        got = (
            spark.read.parquet(d)
            .where(box)
            .agg(F.count(F.lit(1)), F.sum("value"))
            .collect()[0]
        )
        assert tuple(got) == tuple(want)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_zorder_code_property_random_points(spark):
    """Hypothesis: the codegen Morton interleave equals the Python bit
    reference on arbitrary in-range points, and is a bijection on the
    [0,256)² grid (distinct points → distinct codes)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from sparkksqldbbenchmark_spark.operators.layout import zorder_code

    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(0, 255), st.integers(0, 255)
            ),
            min_size=1,
            max_size=64,
        )
    )
    def check(pts):
        df = spark.createDataFrame(pts, "x int, y int").withColumn(
            "z", zorder_code(F.col("x"), F.col("y"))
        )
        rows = df.collect()
        codes = {}
        for r in rows:
            assert r.z == _morton_ref(r.x, r.y), (r.x, r.y, r.z)
            prev = codes.setdefault(r.z, (r.x, r.y))
            assert prev == (r.x, r.y), "collision: " + repr(
                (prev, (r.x, r.y))
            )

    check()


def test_zorder_null_dims_named_error_and_row_nulls_pinned(spark, tmp_path):
    """All-NULL dim → ValueError naming the dim (not a bare TypeError);
    per-row NULLs in either dim cluster deterministically into the
    lowest z-range instead of producing NULL sort keys (ADVICE r05)."""
    import pytest

    from sparkksqldbbenchmark_spark.operators.layout import write_zordered

    # dim_y entirely NULL, dim_x populated — must name dim_y
    df = spark.createDataFrame(
        [(i, None) for i in range(10)], "x int, y int"
    )
    with pytest.raises(ValueError, match="'y'"):
        write_zordered(df, str(tmp_path / "z1"), "x", "y")

    # scattered per-row NULLs: the write succeeds with no NULL sort
    # keys, every row survives, and range scans on either dim return
    # exactly what the unclustered data would (NULL-dim rows take
    # bucket 0 on the NULL dim but keep their real bucket on the other
    # dim, so per-file footer stats stay truthful)
    rows = [(i, None if i % 7 == 0 else i * 3) for i in range(200)]
    df2 = spark.createDataFrame(rows, "x int, y int")
    out = str(tmp_path / "z2")
    write_zordered(df2, out, "x", "y", num_files=4)
    back = spark.read.parquet(out)
    assert back.count() == 200
    expect_x = sorted(
        (x, y) for x, y in rows if 50 <= x <= 120
    )
    got_x = sorted(
        (r.x, r.y)
        for r in back.where("x BETWEEN 50 AND 120").collect()
    )
    assert got_x == expect_x
    expect_y = sorted((x, y) for x, y in rows if y is not None and y >= 300)
    got_y = sorted((r.x, r.y) for r in back.where("y >= 300").collect())
    assert got_y == expect_y
