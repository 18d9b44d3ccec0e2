"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched Pandas UDFs
(mapInPandas) — the only deliberately-Python path in the engine, because
codec work is per-blob imperative logic DataFrame expressions can't
express.

The container has no image/audio libraries, so the actual codec step is
STUBBED (`decode_blob` raises NotImplementedError; `fake_decode` is the
deterministic stand-in used by tests). Everything Spark-side — schema,
binary handling, Arrow batch shape, partitioning — is real and tested:
swapping `fake_decode` for a PIL/ffmpeg call changes no plan.

Scale notes: mapInPandas streams Arrow batches (no per-row pickling);
blobs never pass through the driver; per-partition batch size is bounded
by spark.sql.execution.arrow.maxRecordsPerBatch. Feature extraction keeps
only small fixed-size vectors, so the shuffle after decode carries
features, not blobs.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", StructType([])),  # placeholder, see below
    ]
)

FEATURE_DIM = 16

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def attach_media_blobs(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize an opaque binary payload + typed metadata from a text
    table — the fixture stand-in for real image/audio bytes. Payload is
    deterministic (md5-derived), metadata is a typed struct, exactly the
    shape a real ingest would carry."""
    return df.select(
        F.col(id_col),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col(id_col) % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.to_binary(F.md5(F.col("text")), F.lit("hex")).alias("payload"),
        F.struct(
            (F.col(id_col) % 640 + 16).cast("int").alias("width"),
            (F.col(id_col) % 480 + 16).cast("int").alias("height"),
            F.lit("synthetic/v1").alias("codec"),
        ).alias("meta"),
    )


def decode_blob(payload: bytes, media_type: str) -> bytes:
    """The real codec hook — intentionally unimplemented in this
    container (no PIL/ffmpeg). Production deployments override this."""
    raise NotImplementedError(
        "codec libraries unavailable in this environment; "
        "use fake_decode for deterministic pipeline testing"
    )


def fake_decode(payload: bytes) -> list[float]:
    """Deterministic stand-in feature extractor: 16-bin byte histogram,
    normalized. Same contract as a real embedding/decode step."""
    if payload is None or len(payload) == 0:
        return [0.0] * FEATURE_DIM
    hist = [0] * FEATURE_DIM
    for b in payload:
        hist[b % FEATURE_DIM] += 1
    total = float(len(payload))
    return [h / total for h in hist]


def extract_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over (doc_id, media_type, payload,
    meta). Arrow-batched; each batch is a pandas DataFrame with a bytes
    column — the real multimodal execution shape."""
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: 0 if p is None else len(p)
                    ),
                    "width": pdf["meta"].map(lambda m: m["width"]),
                    "height": pdf["meta"].map(lambda m: m["height"]),
                    "features": pdf["payload"].map(fake_decode),
                }
            )
            yield out

    return df.mapInPandas(batches, DECODED_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 2) -> DataFrame:
    """Video frame-sampling plumbing: explode a deterministic frame index
    list per video row (a real decoder would emit actual frames). Keeps
    the explode JVM-side; only sampled frames would reach the Python
    decode stage."""
    frames = F.expr(
        f"transform(sequence(0, cast(meta.width % 10 as int)), i -> i)"
    )
    return (
        df.where(F.col("media_type") == "video")
        .withColumn("frame_idx", F.explode(frames))
        .where(F.col("frame_idx") % every_n == 0)
        .select("doc_id", "frame_idx", "payload")
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("orig_width", IntegerType()),
        StructField("orig_height", IntegerType()),
        StructField("new_width", IntegerType()),
        StructField("new_height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("payload_hex", StringType()),
    ]
)


def resize_media(
    df: DataFrame, target_w: int = 128, target_h: int = 128
) -> DataFrame:
    """mapInPandas resize-to-fit: aspect-preserving downscale into a
    target box (never upscale), the standard image-normalization step in
    front of a vision encoder. The geometry (scale = min(tw/w, th/h, 1),
    floor-rounded dims) is the real contract; the pixel work is the
    stubbed codec path, stood in for by deterministically truncating the
    payload to its scaled length (a real deployment swaps the body for
    PIL/ffmpeg — the Arrow batch shape, schema and plan are unchanged).
    Emits hex payloads so the result is engine-comparable."""
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            w = pdf["meta"].map(lambda m: m["width"])
            h = pdf["meta"].map(lambda m: m["height"])
            scale = pd.concat(
                [target_w / w, target_h / h], axis=1
            ).min(axis=1).clip(upper=1.0)
            # NULL payloads stay NULL (n_bytes/payload_hex None) — a null
            # blob is missing data, not a zero-byte image, and the oracle
            # twin's md5(NULL) agrees.
            resized = [
                None if p is None else p[: max(1, int(len(p) * s))]
                for p, s in zip(pdf["payload"], scale)
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "orig_width": w,
                    "orig_height": h,
                    "new_width": (w * scale).astype(int),
                    "new_height": (h * scale).astype(int),
                    "n_bytes": [
                        None if p is None else len(p) for p in resized
                    ],
                    "payload_hex": [
                        None if p is None else p.hex().upper()
                        for p in resized
                    ],
                }
            )

    return df.mapInPandas(batches, RESIZED_SCHEMA)
