"""Sequence packing for training-data pipelines: deterministic corpus
shuffle + concat-and-chunk assignment of documents to fixed-capacity
context windows ("packs").

Training pipelines shuffle the corpus (deterministically, so a run is
reproducible from its seed), concatenate the documents' tokens in that
order, and cut the stream into fixed-length sequences; a document may
straddle a cut. Per document this operator yields its global token
offset in the shuffled stream, the pack its first token lands in, the
offset inside that pack, and whether it straddles into the next pack.

Scale design — distributed prefix sum, not a global window. A running
sum over a total order expressed as one Spark window (ORDER BY with no
PARTITION BY) moves the whole corpus through a single partition; at
100 TB that is the job. Instead:

1. The shuffle key is the shared 60-bit md5 integer (llm/hashing —
   identical in Spark and the DuckDB oracle), uniform over [0, 2^60).
2. RANGE-bucket the key: ``bucket = key div (2^60 / n_buckets)``.
   Buckets are contiguous slices of the global order (monotone in key),
   so bucket-major + in-bucket order == global order, and uniformity
   keeps bucket sizes balanced with no sampling pass (contrast
   ``repartitionByRange``, which must sample).
3. Per-bucket exclusive cumsum via an ordinary partitioned window — all
   buckets in parallel, one shuffle of the data.
4. Per-bucket totals (``n_buckets`` rows — constant, independent of
   data size) get an exclusive prefix sum in one tiny single-partition
   window, then broadcast-join back as the bucket carry.

Total cost at any scale: one data shuffle + one broadcast of
``n_buckets`` longs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sparkksqldbbenchmark_spark.llm.hashing import spark_md5_int


def pack_offsets(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    capacity: int = 2048,
    seed: str = "pack-v1",
    n_buckets: int = 1024,
) -> DataFrame:
    """Append ``start_offset``, ``pack_id``, ``pack_offset`` and
    ``straddles`` for a concat-and-chunk packing of ``tokens_col`` in
    deterministic-shuffle order (md5 of ``seed:id``, ties broken by id;
    ties always share a bucket, so bucketing never reorders them)."""
    if n_buckets <= 0 or (1 << 60) % n_buckets:
        raise ValueError("n_buckets must divide 2^60 (use a power of two)")
    width = (1 << 60) // n_buckets
    key = spark_md5_int(f"concat('{seed}:', cast({id_col} as string))")
    b = df.withColumn("__key", F.expr(key)).withColumn(
        "__bucket", F.expr(f"__key div {width}")
    )
    in_bucket = (
        Window.partitionBy("__bucket")
        .orderBy(F.col("__key").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = b.withColumn(
        "__local_start",
        F.coalesce(F.sum(tokens_col).over(in_bucket), F.lit(0)).cast("long"),
    )
    # n_buckets rows total: the single-partition window is over a
    # CONSTANT-sized frame, not the data — the standard prefix-sum trick
    across = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    carries = (
        b.groupBy("__bucket")
        .agg(F.sum(tokens_col).alias("__tot"))
        .withColumn(
            "__carry", F.coalesce(F.sum("__tot").over(across), F.lit(0))
        )
        .select("__bucket", F.col("__carry").cast("long").alias("__carry"))
    )
    out = local.join(F.broadcast(carries), "__bucket")
    return (
        out.withColumn(
            "start_offset", (F.col("__carry") + F.col("__local_start"))
        )
        .withColumn("pack_id", F.expr(f"start_offset div {capacity}"))
        .withColumn("pack_offset", F.expr(f"start_offset % {capacity}"))
        .withColumn(
            "straddles",
            (F.col("pack_offset") + F.col(tokens_col)) > F.lit(capacity),
        )
        .drop("__key", "__bucket", "__local_start", "__carry")
    )


def pack_manifest(
    packed: DataFrame,
    *,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    capacity: int = 2048,
) -> DataFrame:
    """The training-loader deliverable: one row per (pack, document
    segment). A document occupying [start_offset, start_offset+n) spans
    packs start_offset div C .. (start_offset+n-1) div C; straddlers
    yield one segment per pack with the in-pack offset and the slice of
    the document's own tokens that lands there. Input is pack_offsets
    output; empty documents (0 tokens) occupy no pack and emit no row.

    Pure codegen explode over a per-doc constant-size sequence (a doc
    spans at most n/C + 1 packs) — no shuffle beyond what pack_offsets
    already did; the manifest is written partitioned by pack range in a
    real pipeline so each trainer shard reads one contiguous slice."""
    end = F.col("start_offset") + F.col(tokens_col)
    return (
        packed.where(F.col(tokens_col) > 0)
        .withColumn("__p", F.explode(F.sequence(
            F.expr(f"start_offset div {capacity}"),
            F.expr(f"(start_offset + {tokens_col} - 1) div {capacity}"),
        )))
        .select(
            F.col("__p").alias("pack_id"),
            F.col(id_col),
            F.greatest(
                F.col("start_offset") - F.col("__p") * capacity, F.lit(0)
            ).cast("long").alias("pack_offset"),
            F.greatest(
                F.col("__p") * capacity - F.col("start_offset"), F.lit(0)
            ).cast("long").alias("doc_slice_start"),
            (
                F.least(end, (F.col("__p") + 1) * capacity)
                - F.greatest(F.col("start_offset"), F.col("__p") * capacity)
            ).cast("long").alias("seg_tokens"),
        )
    )
