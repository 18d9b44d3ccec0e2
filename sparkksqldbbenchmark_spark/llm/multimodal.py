"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched Pandas UDFs
(mapInPandas) — the only deliberately-Python path in the engine, because
codec work is per-blob imperative logic DataFrame expressions can't
express.

The container has no PIL/ffmpeg, but `decode_blob` carries a GENUINE
pure-Python decode for PNG, baseline JPEG and RIFF-PCM WAV
(llm/codecs.py — zlib inflate + full scanline unfiltering / marker walk
+ Huffman + IDCT / RIFF chunk parse); formats beyond those three still
raise NotImplementedError. `fake_decode` remains the deterministic
stand-in for the opaque-payload plumbing queries.
Everything Spark-side — schema, binary handling, Arrow batch shape,
partitioning — is identical between the real and stand-in paths:
swapping in a PIL/ffmpeg call changes no plan.

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
    BinaryType,
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


def decode_blob(payload: bytes, media_type: str) -> dict:
    """The real codec hook. PNG, baseline-JPEG and RIFF-PCM blobs get a
    GENUINE pure-Python decode (llm/codecs.py: chunk walk + zlib inflate
    + scanline unfiltering incl. Paeth / marker walk + Huffman + DPCM +
    dequant + IDCT / RIFF fmt+data parse) — formats with no pure-Python
    decoder available in this container (video containers) still raise
    NotImplementedError; production deployments extend the dispatch with
    ffmpeg.

    Returns a uniform stats dict: codec, width/height (images; None for
    audio), sample_rate (audio; None for images), n_units (pixels×
    channels or samples) and unit_sum (sum of decoded pixel bytes or
    signed sample values)."""
    from sparkksqldbbenchmark_spark.llm import codecs

    if payload is None:
        return {
            "codec": None, "width": None, "height": None,
            "sample_rate": None, "n_units": None, "unit_sum": None,
        }
    if payload.startswith(codecs.PNG_MAGIC):
        w, h, ch, rows = codecs.decode_png(payload)
        return {
            "codec": "png", "width": w, "height": h, "sample_rate": None,
            "n_units": w * h * ch,
            "unit_sum": sum(sum(r) for r in rows),
        }
    if payload.startswith(codecs.JPEG_MAGIC):
        w, h, ch, rows = codecs.decode_jpeg(payload)
        return {
            "codec": "jpeg", "width": w, "height": h, "sample_rate": None,
            "n_units": w * h * ch,
            "unit_sum": sum(sum(r) for r in rows),
        }
    if payload.startswith(codecs.RIFF_MAGIC):
        rate, ch, samples = codecs.decode_wav(payload)
        return {
            "codec": "wav", "width": None, "height": None,
            "sample_rate": rate, "n_units": len(samples),
            "unit_sum": sum(samples),
        }
    raise NotImplementedError(
        f"no pure-Python decoder for media_type={media_type!r} "
        "(payload is not PNG, JPEG or RIFF/WAVE); production deployments "
        "extend decode_blob with ffmpeg"
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


DECODE_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("codec", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_units", LongType()),
        StructField("unit_sum", LongType()),
        StructField("mean_value", DoubleType()),
    ]
)


def _synth_payload(doc_id: int) -> tuple[str, bytes]:
    """Deterministic real-format media for a doc id, cycling all four
    genuine codec paths: id % 4 == 0 → 8-bit grayscale PNG (pixel(x,y)
    = (id + 7x + 13y) mod 256, dims from id residues); == 1 → 16-bit
    PCM WAV (sample(i) = (31·id + 17i) mod 2^16 − 2^15); == 2 →
    baseline grayscale JPEG of block-constant 8×8 tiles (tile(bx,by) =
    (id + 11·bx + 29·by) mod 256); == 3 → baseline 4:2:0 COLOR JPEG of
    block-constant 16×16 RGB tiles. Block-constant content with the
    DC-exact default quant tables round-trips EXACTLY through the lossy
    DCT path — for color the decoded pixels equal the double YCbCr
    conversion of the tile constants (rgb_to_ycbcr ∘ ycbcr_to_rgb,
    deterministic IEEE arithmetic the oracle replays in SQL) — so every
    decoded statistic stays a pure function of the id and oracles can
    recompute it analytically without a decoder."""
    from sparkksqldbbenchmark_spark.llm import codecs

    m = doc_id % 4
    if m == 0:
        w, h = doc_id % 16 + 4, doc_id % 12 + 4
        rows = [
            bytes((doc_id + 7 * x + 13 * y) % 256 for x in range(w))
            for y in range(h)
        ]
        return "image", codecs.encode_png(rows)
    if m == 1:
        n = doc_id % 50 + 10
        samples = [(doc_id * 31 + i * 17) % 65536 - 32768 for i in range(n)]
        return "audio", codecs.encode_wav(samples)
    if m == 2:
        bw, bh = doc_id % 5 + 2, doc_id % 3 + 2
        rows = [
            bytes(
                (doc_id + 11 * (x // 8) + 29 * (y // 8)) % 256
                for x in range(bw * 8)
            )
            for y in range(bh * 8)
        ]
        return "image", codecs.encode_jpeg(rows)
    tw, th = (doc_id % 6) // 2 + 1, (doc_id % 9) // 3 + 1
    rows = [
        bytes(
            v
            for x in range(tw * 16)
            for v in (
                (doc_id + 7 * (x // 16) + 13 * (y // 16)) % 256,
                (doc_id * 3 + 11 * (x // 16) + 5 * (y // 16)) % 256,
                (doc_id * 7 + 17 * (x // 16) + 3 * (y // 16)) % 256,
            )
        )
        for y in range(th * 16)
    ]
    return "image", codecs.encode_jpeg(rows, channels=3)


def synth_media_blobs(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas synthesis of REAL-format blobs (PNG/WAV via
    llm/codecs) — the fixture ingest for the genuine decode path, unlike
    attach_media_blobs whose payloads are opaque md5 bytes."""
    import pandas as pd

    ids = df.select(F.col(id_col).cast("long").alias("doc_id"))

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            made = [_synth_payload(int(d)) for d in pdf["doc_id"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": [m for m, _ in made],
                    "payload": [p for _, p in made],
                }
            )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("media_type", StringType()),
            StructField("payload", BinaryType()),
        ]
    )
    return ids.mapInPandas(batches, schema)


def decode_media_stats(df: DataFrame) -> DataFrame:
    """mapInPandas REAL decode over (doc_id, media_type, payload): every
    blob goes through decode_blob's actual codec path (PNG unfilter /
    RIFF parse), emitting per-blob stats. mean_value is one IEEE
    division of exact integer aggregates — cross-engine deterministic."""
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            stats = [
                decode_blob(p, m)
                for p, m in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "codec": [s["codec"] for s in stats],
                    "width": [s["width"] for s in stats],
                    "height": [s["height"] for s in stats],
                    "sample_rate": [s["sample_rate"] for s in stats],
                    "n_units": [s["n_units"] for s in stats],
                    "unit_sum": [s["unit_sum"] for s in stats],
                    "mean_value": [
                        None
                        if s["n_units"] in (None, 0)
                        else s["unit_sum"] / s["n_units"]
                        for s in stats
                    ],
                }
            )

    return df.mapInPandas(batches, DECODE_STATS_SCHEMA)
