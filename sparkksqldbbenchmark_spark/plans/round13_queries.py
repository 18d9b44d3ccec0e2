"""The round-13 staged cohort, graduated into the driver-graded registry
at round-14 start per docs/ROTATION_R13.md.

42 of the 63 staged rows graduate here (the module-local
``staged_query`` decorator swapped for ``plans.registry.query``,
mechanics as rounds 6-13 — see plans/round6_queries.py ..
round12_queries.py history). The 21 held-back suite siblings
(docs/ROTATION_R13.md holdback priority: rows whose machinery already
carries a graded sibling, plus the judge's override that the twelve
round-12 holdbacks graduate FIRST after waiting two rounds) remain
staged in plans/next_round.py and graduate round 15.

Cohort composition: the twelve round-12 holdbacks graduate first
(XPath scalars, exact mode/median, calendar breadth, inverse-frequency
label weights, datetime constructors, mask/crypto scalars, the
compression-codec write matrix, event-type affinity cosine, Lorenz
concentration deciles, the planted-periodicity detector, the
Aho-Corasick blocklist twin, and the mixture schedule manifest), then
the round-13 stagings: time-series (max drawdown), product analytics
(DAU/MAU stickiness, path trigrams, RFM quintiles via three leveled
global ranks, cohort LTV, equi-depth bounds), sampling certificates
(mergeable bottom-k reservoir, class-balanced undersample, KMV is held
back), evaluation (exact rank-sum AUC, 1-NN LOO accuracy), embeddings
(pairwise-energy sufficient statistics, k-means++ D² derandomized
seeding, IVF cell balance, multi-probe LSH recall@1), dedup depth (LSH
band sweep, bucketed suffix-LCP repeat stats, pointer-jump CC, the
Lee-et-al repeated-span cut plan, the PPJoin exact set-similarity
join), the SCD2 temporal lookup (DuckDB native ASOF oracle), SQL
surface (array_sort comparators, GROUPING_ID bitmask), compliance
(subject access export), scale patterns (bucketed co-located join
audit, the zero-exchange sentence chunker, the first-principles Bloom
pre-filter with measured FPR), and the four never-graded streaming
semantics rows (watermark late-drop, left-outer null emission,
within-watermark dedup re-emission, the left-semi first-match join).

Design notes per query live in the docstrings; every one follows the
repo-wide cross-engine determinism rules (functions/stable.py,
llm/hashing.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkksqldbbenchmark_spark.catalog import load_table
from sparkksqldbbenchmark_spark.plans.registry import query
from sparkksqldbbenchmark_spark.plans.round12_queries import (
    _BLOCKLIST,
    _blocklist_oracle,
)

QueryFn = Callable[[SparkSession, str], DataFrame]



# ===================================================================
# Held back from the round-12 graduation (docs/ROTATION_R12.md):
# graded siblings cover each one's machinery; they graduate round 14.
# ===================================================================


# ----------------------------- xpath scalar function breadth --


@query(
    "xpath_scalar_suite",
    oracle="""
    WITH base AS (
        SELECT event_id, user_id, event_type,
               CAST(floor(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_id % 10 = 0
    )
    SELECT event_type,
           count(*) AS n,
           CAST(sum(cents) AS BIGINT) AS cents_sum,
           CAST(max(event_id) AS BIGINT) AS max_id,
           bool_and(TRUE) AS all_ok,
           CAST(4 * count(*) AS BIGINT) AS n_text_nodes
    FROM base GROUP BY event_type
    """,
)
def xpath_scalar_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The xpath_* scalar family (xpath_string / xpath_long /
    xpath_boolean / xpath array form, attribute and element axes) —
    graded as a ROUND-TRIP: each row renders its columns into an XML
    fragment, every output value is recovered ONLY through xpath
    extraction, and the oracle recomputes the same aggregates from the
    base columns directly. Any extraction defect (axis, attribute,
    text() node, numeric coercion) breaks the value hash. DuckDB has
    no xpath — the identity framing is what makes the surface
    oracle-gradeable at all (same convention as the r8 XML codec row).

    Scale shape: pure per-row scalar work fused into the scan stage
    (WholeStageCodegen, no shuffle before the final rollup); xpath
    compiles per-expression XPath objects JVM-side — no Python. XML
    parse cost dominates (~0.3 ms/row for 5 extractions), so the row
    grades a deterministic 10% id-slice — surface coverage, not a
    recommended hot-path operator; bulk XML belongs in from_xml once
    parsed, not in repeated xpath probes.

    Reference basis: SURVEY §2.8 scalar-function surface extension
    (xml_roundtrip_suite r8 covers the document codec; this grades the
    query-language accessors)."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_id") % 10 == 0
    )
    xml = F.concat(
        F.lit('<e id="'),
        F.col("event_id").cast("string"),
        F.lit('"><u>'),
        F.col("user_id").cast("string"),
        F.lit("</u><t>"),
        F.col("event_type"),
        F.lit("</t><v>"),
        F.floor(F.col("value") * 100).cast("long").cast("string"),
        F.lit("</v><ok>1</ok></e>"),
    )
    extracted = ev.select(xml.alias("x")).select(
        F.expr("xpath_string(x, 'e/t')").alias("event_type"),
        F.expr("xpath_long(x, 'e/v/text()')").alias("cents"),
        F.expr("xpath_long(x, 'e/@id')").alias("ev_id"),
        F.expr("xpath_boolean(x, 'e/ok=1')").alias("ok"),
        F.size(F.expr("xpath(x, 'e/*/text()')")).alias("n_nodes"),
    )
    return extracted.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").cast("long").alias("cents_sum"),
        F.max("ev_id").cast("long").alias("max_id"),
        F.bool_and("ok").alias("all_ok"),
        F.sum("n_nodes").cast("long").alias("n_text_nodes"),
    )


# ----------------------------- mode / median aggregate pair --


@query(
    "mode_median_suite",
    oracle="""
    WITH v AS (
        SELECT event_type,
               CASE WHEN user_id % 4 = 0 THEN 0
                    ELSE user_id % 97 + 1 END AS planted,
               CASE WHEN user_id % 4 = 0 THEN 'hot'
                    ELSE 'u' || CAST(user_id % 97 AS VARCHAR) END
                   AS planted_s,
               CAST(floor(value * 100) AS BIGINT) AS cents
        FROM events
    )
    SELECT event_type,
           count(*) AS n,
           CAST(mode(planted) AS BIGINT) AS mode_val,
           mode(planted_s) AS mode_str,
           CAST(median(cents) AS DOUBLE) AS median_cents,
           CAST(min(cents) AS BIGINT) AS min_cents,
           CAST(max(cents) AS BIGINT) AS max_cents
    FROM v GROUP BY event_type
    """,
)
def mode_median_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mode() and median() — the Spark-3.4+ direct aggregate forms —
    over keys PLANTED so the mode is unique by a wide margin (every
    4th row collapses to one hot value carrying ~25% of the mass; the
    97-value tail holds ~0.8% each), because mode over a tied column
    is an arbitrary pick in both engines and would be ungradeable.
    median interpolates the two middle cents values — exact integers,
    midpoint arithmetic identical IEEE in both engines. (ANSI
    percentile_disc is deliberately NOT graded cross-engine: its
    cume_dist >= p element selection differs from DuckDB's
    quantile_disc lower-interpolation at e.g. n=7, p=0.75 — the
    ansi_percentile_suite row pins the Spark-side semantics instead.)

    Scale shape: mode is a two-level aggregate (count per value, then
    argmax — Spark plans it as such); median is the exact-percentile
    sort-based aggregate per group, input bounded per event_type.

    Reference basis: SURVEY §2.4 aggregate surface (A3 max_by family;
    the r10 weighted_median row grades the weighted form)."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type",
        F.when(F.col("user_id") % 4 == 0, F.lit(0))
        .otherwise(F.col("user_id") % 97 + 1)
        .alias("planted"),
        F.when(F.col("user_id") % 4 == 0, F.lit("hot"))
        .otherwise(
            F.concat(F.lit("u"), (F.col("user_id") % 97).cast("string"))
        )
        .alias("planted_s"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.mode("planted").cast("long").alias("mode_val"),
        F.mode("planted_s").alias("mode_str"),
        F.median("cents").cast("double").alias("median_cents"),
        F.min("cents").cast("long").alias("min_cents"),
        F.max("cents").cast("long").alias("max_cents"),
    )


# ------------------- calendar scalar-function breadth --


@query(
    "calendar_function_suite",
    oracle="""
    WITH d AS (
        SELECT event_type, CAST(ts AS DATE) AS dt FROM events
    )
    SELECT event_type,
           count(*) AS n,
           CAST(sum(dayofmonth(last_day(dt))) AS BIGINT)
               AS last_day_dom_sum,
           CAST(sum(quarter(dt)) AS BIGINT) AS quarter_sum,
           CAST(sum(weekofyear(dt)) AS BIGINT) AS weekofyear_sum,
           CAST(sum(dayofweek(dt) + 1) AS BIGINT) AS dayofweek_sum,
           count(DISTINCT date_trunc('month', dt)) AS n_months,
           strftime(max(dt + INTERVAL 2 MONTH), '%Y-%m-%d')
               AS max_plus_2m
    FROM d GROUP BY event_type
    """,
)
def calendar_function_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar scalar breadth — last_day / quarter / weekofyear (ISO
    in both engines) / dayofweek (Spark counts Sunday=1, DuckDB
    Sunday=0: the oracle carries the +1 shim, pinning the offset
    contract) / month truncation / add_months with its month-end
    clamp (Jan 31 + 1 month = Feb 29 in both engines — probed before
    this row was written). Values fold into per-type integer
    checksums so any drift in any function on any row breaks the
    hash. months_between is deliberately excluded: its fractional
    31-day convention has no DuckDB twin.

    Scale shape: per-row date arithmetic fused into the scan
    (WholeStageCodegen), one 5-group rollup; the DISTINCT month count
    adds a (type, month) dedup bounded by the calendar, not rows.

    Reference basis: SURVEY §2.8 F9-F13 datetime family extension
    (datetime_parse_suite r4, interval_datetime_suite r8,
    calendar_spine_gapfill r9)."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.select("event_type", F.to_date("ts").alias("dt"))
    return d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.dayofmonth(F.last_day("dt")))
        .cast("long")
        .alias("last_day_dom_sum"),
        F.sum(F.quarter("dt")).cast("long").alias("quarter_sum"),
        F.sum(F.weekofyear("dt")).cast("long").alias("weekofyear_sum"),
        F.sum(F.dayofweek("dt")).cast("long").alias("dayofweek_sum"),
        F.count_distinct(F.date_trunc("MM", "dt")).alias("n_months"),
        F.date_format(F.max(F.add_months("dt", 2)), "yyyy-MM-dd")
        .alias("max_plus_2m"),
    )


# ------------------- inverse-frequency class weights --


@query(
    "label_inverse_frequency_weights",
    oracle="""
    WITH c AS (SELECT label, count(*) AS n FROM embeddings GROUP BY 1),
    t AS (SELECT CAST(sum(n) AS BIGINT) AS total,
                 count(*) AS n_labels FROM c)
    SELECT c.label,
           CAST(c.n AS BIGINT) AS n,
           CAST((c.n * 1000000) // t.total AS BIGINT) AS share_e6,
           CAST((t.total * 1000000) // (c.n * t.n_labels) AS BIGINT)
               AS weight_e6
    FROM c CROSS JOIN t
    """,
)
def label_inverse_frequency_weights(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Inverse-frequency CLASS WEIGHTS — the balanced-loss weighting
    (weight_c = N / (n_c * K)) every classifier-head training run
    computes from its label distribution, in exact integers at 1e-6
    grain. A uniformly-distributed label set yields weights near 1e6;
    a skewed one reweights rare classes up — the sampler/loss input.

    Scale shape: one map-combinable label count (K groups) + a 1-row
    total broadcast. Nothing scales with rows but the count.

    Reference basis: LLM-pipeline mixture/sampling family
    (mixture_quota_largest_remainder r8, temperature_mixture_quota
    r8 — this is the per-label loss-side twin)."""
    emb = load_table(spark, sf_dir, "embeddings")
    c = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(
        F.sum("n").cast("long").alias("total"),
        F.count(F.lit(1)).alias("n_labels"),
    )
    return c.crossJoin(F.broadcast(t)).select(
        "label",
        F.col("n").cast("long").alias("n"),
        F.expr("(n * 1000000) DIV total").cast("long").alias("share_e6"),
        F.expr("(total * 1000000) DIV (n * n_labels)")
        .cast("long")
        .alias("weight_e6"),
    )


# ------------------- datetime constructor round-trip --


@query(
    "datetime_constructor_suite",
    oracle="""
    WITH d AS (
        SELECT event_type, ts, CAST(ts AS DATE) AS dt FROM events
    )
    SELECT event_type,
           count(*) AS n,
           bool_and(make_date(CAST(year(dt) AS INT),
                              CAST(month(dt) AS INT),
                              CAST(day(dt) AS INT)) = dt)
               AS date_roundtrip_ok,
           bool_and(make_timestamp(CAST(year(ts) AS INT),
                                   CAST(month(ts) AS INT),
                                   CAST(day(ts) AS INT),
                                   CAST(hour(ts) AS INT),
                                   CAST(minute(ts) AS INT),
                                   CAST(floor(second(ts)) AS DOUBLE))
                    = date_trunc('second', ts)) AS ts_roundtrip_ok,
           strftime(max(make_date(CAST(year(dt) AS INT), 1, 1)),
                    '%Y-%m-%d') AS max_year_start
    FROM d GROUP BY event_type
    """,
)
def datetime_constructor_suite(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """make_date / make_timestamp constructor round-trip — every row's
    timestamp is decomposed into integer parts and REBUILT, and the
    rebuilt value must equal the original (to the second — the
    constructor's sub-second argument conventions differ between
    engines, so the contract is pinned at date_trunc('second')
    grain). The constructor family is how partition columns
    (year/month/day) are folded back into comparable dates at read
    time; a silent off-by-one here corrupts every partition-pruned
    date filter downstream.

    Scale shape: per-row scalar work fused into the scan, one 5-group
    rollup of bool_and flags — any single-row construction defect
    flips a group flag and breaks the value hash.

    Reference basis: SURVEY §2.8 F9-F13 datetime family
    (datetime_parse_suite r4 parses strings; this grades the integer
    constructors)."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.select("event_type", "ts", F.to_date("ts").alias("dt"))
    date_rt = F.make_date(
        F.year("dt"), F.month("dt"), F.dayofmonth("dt")
    ) == F.col("dt")
    ts_rt = F.expr(
        "make_timestamp(year(ts), month(ts), day(ts), hour(ts), "
        "minute(ts), cast(floor(second(ts)) as decimal(8, 6)))"
    ) == F.date_trunc("second", F.col("ts"))
    return d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.bool_and(date_rt).alias("date_roundtrip_ok"),
        F.bool_and(ts_rt).alias("ts_roundtrip_ok"),
        F.date_format(
            F.max(F.make_date(F.year("dt"), F.lit(1), F.lit(1))),
            "yyyy-MM-dd",
        ).alias("max_year_start"),
    )


# ------------------- mask / crypto scalar functions --


@query(
    "mask_crypto_suite",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           count(DISTINCT regexp_replace(regexp_replace(regexp_replace(
               event_type || '-' || CAST(user_id AS VARCHAR),
               '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n',
               'g')) AS n_distinct_masked,
           min(sha256(event_type || '#' ||
                      CAST(user_id % 100 AS VARCHAR)))
               AS min_sha_hex,
           bool_and(TRUE) AS aes_roundtrip_ok,
           bool_and(TRUE) AS mask_hides_digits
    FROM events GROUP BY event_type
    """,
)
def mask_crypto_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mask() + sha2 + AES scalar surface — the column-protection kit
    a PII-handling pipeline leans on: (a) mask() replaces case/digit
    classes, graded against a regexp-triple oracle (identical outputs
    both engines, so the distinct-count of masked identifiers is a
    real cross-engine value); (b) sha2-256 hex digests equal DuckDB's
    sha256 byte-for-byte (graded via per-group min digest);
    (c) aes_encrypt/aes_decrypt ECB round-trip recovers every
    plaintext (DuckDB has no AES — self-certifying boolean, the
    tablesample convention), and mask provably destroys digits
    (the masked string contains none — folded bool).

    Scale shape: per-row scalar work fused into the scan; the
    distinct-masked count is one dedup exchange bounded by the masked
    key space. Hashing/masking at ingest is exactly this shape at
    100 TB — no shuffle until the audit rollup.

    Reference basis: SURVEY §2.8 F21 + PII family (pii_scrub_stats
    r4, luhn_pii_check r9 — this adds the masking/encryption leg)."""
    ev = load_table(spark, sf_dir, "events")
    ident = F.concat(
        F.col("event_type"), F.lit("-"),
        F.col("user_id").cast("string"),
    )
    masked = F.expr(
        "mask(concat(event_type, '-', cast(user_id as string)))"
    )
    sha = F.sha2(
        F.concat(
            F.col("event_type"), F.lit("#"),
            (F.col("user_id") % 100).cast("string"),
        ),
        256,
    )
    key = F.lit("0123456789abcdef")
    rt = (
        F.expr(
            "cast(aes_decrypt(aes_encrypt(concat(event_type, '-', "
            "cast(user_id as string)), '0123456789abcdef', 'ECB'), "
            "'0123456789abcdef', 'ECB') as string)"
        )
        == ident
    )
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(masked).alias("n_distinct_masked"),
        F.min(sha).alias("min_sha_hex"),
        F.bool_and(rt).alias("aes_roundtrip_ok"),
        F.bool_and(~masked.rlike("[0-9]")).alias("mask_hides_digits"),
    )


# ------------------- compression codec matrix --


@query(
    "compression_codec_matrix",
    oracle="""
    WITH agg AS (
        SELECT count(*) AS n,
               CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents_sum
        FROM events
    )
    SELECT c.codec, a.n, a.cents_sum, TRUE AS roundtrip_ok
    FROM (SELECT unnest(['gzip', 'lz4', 'snappy', 'zstd']) AS codec) c
    CROSS JOIN agg a
    """,
)
def compression_codec_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Parquet COMPRESSION-CODEC matrix — the events table written and
    re-read under each production codec (gzip / lz4 / snappy / zstd),
    with the re-read aggregate graded equal to the source for every
    codec: the storage-tier decision harness (zstd for cold data,
    snappy/lz4 for hot) must never be a correctness decision, and a
    codec round-trip defect is precisely the kind of silent corruption
    a 100 TB lake cannot detect after the fact. roundtrip_ok folds the
    count equality into the graded row itself.

    Scale shape: four write+scan passes over the slice (codec choice
    is scan/write work, no extra shuffles); at fleet scale this row's
    shape is the nightly format-canary job, not a hot path.

    Reference basis: SURVEY §2.1 sink/layout family (S13 CSV sink,
    clustered/range/zorder layout rows r5-r11 — this pins the codec
    axis of the same at-rest matrix)."""
    import shutil
    import tempfile

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    src = ev.agg(
        F.count(F.lit(1)).alias("n_src"),
        F.sum("cents").cast("long").alias("cents_src"),
    )
    frames = []
    d_all = tempfile.mkdtemp(prefix="codec_matrix_")
    try:
        for codec in ("gzip", "lz4", "snappy", "zstd"):
            d = f"{d_all}/{codec}"
            ev.write.mode("overwrite").option(
                "compression", codec
            ).parquet(d)
            back = spark.read.parquet(d).agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("cents").cast("long").alias("cents_sum"),
            )
            frames.append(
                back.crossJoin(F.broadcast(src)).select(
                    F.lit(codec).alias("codec"),
                    F.col("n").cast("long"),
                    "cents_sum",
                    (
                        (F.col("n") == F.col("n_src"))
                        & (F.col("cents_sum") == F.col("cents_src"))
                    ).alias("roundtrip_ok"),
                )
            )
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        # materialize the 4-row matrix so the written copies (a full
        # events duplicate per codec) can be reclaimed immediately —
        # sweeps and bench replays re-run graded rows many times
        rows = out.collect()
        res = spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(d_all, ignore_errors=True)
    return res


# ------------------- event-type affinity (cosine by co-users) --


@query(
    "event_type_affinity_cosine",
    oracle="""
    WITH inc AS (
        SELECT DISTINCT event_type, user_id FROM events
    ),
    marg AS (
        SELECT event_type, count(*) AS n FROM inc GROUP BY 1
    ),
    common AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               count(*) AS n_common
        FROM inc a JOIN inc b
            ON a.user_id = b.user_id
           AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT c.type_a, c.type_b,
           CAST(ma.n AS BIGINT) AS n_a,
           CAST(mb.n AS BIGINT) AS n_b,
           CAST(c.n_common AS BIGINT) AS n_common,
           CAST(floor(c.n_common * 1000000.0
                      / sqrt(CAST(ma.n * mb.n AS DOUBLE))) AS BIGINT)
               AS cosine_e6
    FROM common c
    JOIN marg ma ON c.type_a = ma.event_type
    JOIN marg mb ON c.type_b = mb.event_type
    """,
)
def event_type_affinity_cosine(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Item-item AFFINITY — cosine similarity between event types in
    user space (binary incidence vectors: which users touched which
    type), the co-occurrence kernel behind item-based recommenders
    and feature grouping. Exact integer co-user counts; the cosine is
    one IEEE sqrt + division + floor at 1e-6 grain (each op correctly
    rounded, same sequence both engines — the repo's libm rule).

    Scale shape: dedup to (type, user) incidence — the key insight is
    the pair join is over the INCIDENCE (bounded by users x types,
    not events), grouped map-side; marginals broadcast into the
    |types|²-row pair frame. For high-cardinality item spaces the
    same plan keys pairs per user with a per-user item cap (the LSH
    family's bounding discipline).

    Reference basis: dedup/similarity family in user space
    (dedup_cross_source_matrix r7 is the doc-overlap matrix; this is
    the behavioral twin)."""
    ev = load_table(spark, sf_dir, "events")
    inc = ev.select("event_type", "user_id").distinct()
    marg = inc.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    a = inc.select(F.col("event_type").alias("type_a"), "user_id")
    b = inc.select(F.col("event_type").alias("type_b"), "user_id")
    common = (
        a.join(b, "user_id")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        common.join(
            F.broadcast(
                marg.select(
                    F.col("event_type").alias("type_a"),
                    F.col("n").alias("n_a"),
                )
            ),
            "type_a",
        )
        .join(
            F.broadcast(
                marg.select(
                    F.col("event_type").alias("type_b"),
                    F.col("n").alias("n_b"),
                )
            ),
            "type_b",
        )
        .select(
            "type_a",
            "type_b",
            F.col("n_a").cast("long"),
            F.col("n_b").cast("long"),
            F.col("n_common").cast("long"),
            F.floor(
                F.col("n_common")
                * 1000000.0
                / F.sqrt((F.col("n_a") * F.col("n_b")).cast("double"))
            )
            .cast("long")
            .alias("cosine_e6"),
        )
    )


# ------------------- Lorenz concentration deciles --


@query(
    "lorenz_concentration_deciles",
    oracle="""
    WITH per_user AS (
        SELECT event_type, user_id, count(*) AS n
        FROM events GROUP BY 1, 2
    ),
    ranked AS (
        SELECT event_type, n,
               row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY n DESC, user_id) AS rk,
               count(*) OVER (PARTITION BY event_type) AS n_users,
               sum(n) OVER (PARTITION BY event_type) AS total
        FROM per_user
    )
    SELECT event_type,
           CAST(((rk - 1) * 10) // n_users AS BIGINT) AS decile,
           count(*) AS n_users_in_decile,
           CAST(sum(n) AS BIGINT) AS n_events,
           CAST((sum(n) * 1000000) // max(total) AS BIGINT)
               AS share_e6
    FROM ranked GROUP BY 1, 2
    """,
)
def lorenz_concentration_deciles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """LORENZ concentration curve — events per user bucketed into
    activity deciles (heaviest users first) with each decile's exact
    share: the inequality CURVE the Gini row
    (gini_concentration_by_type, r10) summarizes to one number —
    operations reads the curve (does the top decile carry 15% or
    90%?) before deciding on rate limits or bot review. Shares are
    exact integer ratios at 1e-6 grain; decile assignment is integer
    rank arithmetic, ties broken by user id.

    Scale shape: the per-user aggregate bounds everything downstream
    — the ranking window partitions per type over |users| rows (the
    vocab-window discipline), never raw events; the readout is a
    10-row-per-type rollup.

    Reference basis: analytic-statistics family
    (gini_concentration_by_type r10 scalar; this is its curve)."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    w_rk = Window.partitionBy("event_type").orderBy(
        F.desc("n"), F.asc("user_id")
    )
    w_all = Window.partitionBy("event_type")
    ranked = per_user.select(
        "event_type",
        "n",
        F.row_number().over(w_rk).alias("rk"),
        F.count(F.lit(1)).over(w_all).alias("n_users"),
        F.sum("n").over(w_all).alias("total"),
    )
    return ranked.groupBy(
        "event_type",
        F.expr("((rk - 1) * 10) DIV n_users")
        .cast("long")
        .alias("decile"),
    ).agg(
        F.count(F.lit(1)).alias("n_users_in_decile"),
        F.sum("n").cast("long").alias("n_events"),
        F.expr("(sum(n) * 1000000) DIV max(total)")
        .cast("long")
        .alias("share_e6"),
    )


# ------------------- periodicity detector (planted) --


@query(
    "periodicity_detector_planted",
    oracle="""
    WITH probes AS (
        SELECT doc_id, source,
               CASE WHEN doc_id % 10 = 0
                    THEN repeat(substring(text, 1, 24), 4)
                    ELSE substring(text, 1, 96) END AS probe
        FROM documents WHERE length(text) >= 96
    ),
    detected AS (
        SELECT doc_id, source,
               strpos(substring(probe || probe, 2), probe) AS shift_m1
        FROM probes
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN shift_m1 > 0
                          AND shift_m1 < length('x') * 96
                          AND shift_m1 < 96 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_periodic,
           CAST(sum(CASE WHEN doc_id % 10 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_planted
    FROM detected GROUP BY source
    """,
)
def periodicity_detector_planted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PERIODIC-TEXT detector — the classic string-rotation trick: a
    string s is periodic (a whole number >1 of repeats of some block)
    iff s occurs in (s+s) at an offset strictly between 0 and |s|.
    One find over a doubled probe, no loops, fused into the scan —
    the cheap screen for the repetition loops (boilerplate tiling,
    generation run-on) that n-gram repetition ratios
    (text_repetition_ratio r4) score gradually and this test decides
    exactly. Every 10th doc is PLANTED periodic (its 24-char prefix
    tiled 4x) so the detector's recall is itself graded: n_periodic
    must be at least n_planted per source, and the witness asserts
    the planted set is detected exactly.

    Scale shape: per-row string ops in whole-stage codegen over a
    fixed-width 96-char probe (constant memory per row), one
    per-source rollup. No shuffle before the readout.

    Reference basis: LLM-pipeline text-quality family
    (text_repetition_ratio r4, exact_substring_spans r10 — this adds
    the exact whole-string periodicity member)."""
    docs = load_table(spark, sf_dir, "documents").where(
        F.length("text") >= 96
    )
    probe = F.when(
        F.col("doc_id") % 10 == 0,
        F.repeat(F.substring("text", 1, 24), 4),
    ).otherwise(F.substring("text", 1, 96))
    probes = docs.select("doc_id", "source", probe.alias("probe"))
    # locate(probe, probe||probe, 2) - 1 = smallest nonzero rotation
    # shift at which probe matches itself; < |probe| iff periodic
    detected = probes.select(
        "doc_id",
        "source",
        (
            F.expr("locate(probe, concat(probe, probe), 2)") - 1
        ).alias("shift"),
    )
    return detected.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.when(
                (F.col("shift") > 0) & (F.col("shift") < 96), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_periodic"),
        F.sum(F.when(F.col("doc_id") % 10 == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_planted"),
    )


# ------------------- Aho-Corasick blocklist stage (scale path) --


@query(
    "blocklist_aho_corasick_stage", oracle=_blocklist_oracle()
)
def blocklist_aho_corasick_stage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The PRODUCTION-SIZE blocklist path — one Aho-Corasick pass per
    document over all needles simultaneously (llm/blocklist.py:
    goto trie + BFS failure links + suffix-accumulated match counts),
    executed executor-side in Arrow-batched mapInPandas, graded
    against the SAME oracle as the exact SQL twin
    (blocklist_term_scan): the two implementations are pinned equal
    by construction of the round — any drift in either breaks one of
    the two value hashes against the shared oracle. The SQL form
    stops scaling past ~10^2 needles (one codegen expression per
    term); the automaton is linear in text length regardless of term
    count, which is what a 10^4-term safety list needs at 100 TB.

    Scale shape: the automaton builds once per Python worker from
    the (broadcast-size) term list; documents stream through Arrow
    batches with no shuffle before the per-source rollup. The
    Python-stage cost is the deliberate trade against the JVM twin —
    measured, not assumed, by carrying both graded rows.

    Reference basis: LLM-pipeline curation family; the scale-path
    completion blocklist_term_scan's docstring promises."""
    from sparkksqldbbenchmark_spark.llm.blocklist import (
        with_blocklist_hits,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "source", "text"
    )
    scanned = with_blocklist_hits(docs, _BLOCKLIST)
    return scanned.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("hits") >= 5, 1).otherwise(0))
        .cast("long")
        .alias("n_flagged"),
        F.sum("hits").cast("long").alias("total_hits"),
        F.max("hits").cast("long").alias("max_hits"),
    )


# ------------------- mixture schedule manifest --


def _schedule_oracle() -> str:
    from sparkksqldbbenchmark_spark.llm.hashing import sql_md5_int

    keep_hash = sql_md5_int(
        "'ep#' || CAST(s.partial_epoch AS VARCHAR) || '#' || "
        "CAST(d.doc_id AS VARCHAR)"
    )
    return f"""
    WITH per_src AS (
        SELECT source,
               CAST(sum(n_chars) AS BIGINT) AS t,
               CAST(substring(source, 4) AS BIGINT) % 4 + 1 AS w
        FROM documents GROUP BY source
    ),
    plan AS (
        SELECT source, t,
               (w * t) // 2 AS a,
               ((w * t) // 2) // t AS full_epochs,
               ((w * t) // 2) % t AS frac_num
        FROM per_src
    ),
    full_rows AS (
        SELECT p.source, e.e AS epoch,
               (SELECT count(*) FROM documents d
                WHERE d.source = p.source) AS n_docs_kept,
               p.t AS chars_kept
        FROM plan p JOIN (SELECT unnest(range(1, 3)) AS e) e
          ON e.e <= p.full_epochs
    ),
    partials AS (
        SELECT source, full_epochs + 1 AS partial_epoch, t, frac_num
        FROM plan WHERE frac_num > 0
    ),
    partial_rows AS (
        SELECT s.source, s.partial_epoch AS epoch,
               count(*) AS n_docs_kept,
               CAST(sum(d.n_chars) AS BIGINT) AS chars_kept
        FROM partials s JOIN documents d ON d.source = s.source
        WHERE ({keep_hash}) % s.t < s.frac_num
        GROUP BY s.source, s.partial_epoch
    )
    SELECT source, CAST(epoch AS BIGINT) AS epoch,
           n_docs_kept, chars_kept
    FROM full_rows
    UNION ALL
    SELECT source, CAST(epoch AS BIGINT), n_docs_kept, chars_kept
    FROM partial_rows
    """


@query(
    "mixture_schedule_manifest", oracle=_schedule_oracle()
)
def mixture_schedule_manifest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MIXTURE SCHEDULE materialization — expand per-source token
    budgets (w_s/2 epochs of each source's own tokens, w_s the
    planted 1-4 weight, so sources land at 0.5/1.0/1.5/2.0 epochs)
    into the per-epoch manifest a dataloader consumes: whole epochs
    keep every document; the fractional final epoch keeps a
    deterministic hash-thresholded subset (epoch-salted md5 per doc,
    so different partial epochs of the same source draw DIFFERENT
    subsets — repeat diversity, not the same shard again). The
    partial-epoch keep-set is exactly reproducible from (source,
    epoch, doc_id) alone — the property that lets any worker
    recompute its shard without a manifest file. Downstream of
    mixture_epoch_repeat_planner (which chooses budgets; the fixed
    w/2 policy here keeps the two rows independently gradeable).

    Scale shape: one per-source aggregate for totals; whole-epoch
    rows are arithmetic on the 20-row plan frame (never re-scanning
    docs); the single partial-epoch pass is one scan with a
    scan-fused hash predicate. Epochs multiply the PLAN frame, not
    the corpus.

    Reference basis: LLM-pipeline mixture family
    (mixture_epoch_repeat_planner staged, domain_mixture_resample r7,
    deterministic_corpus_shuffle r7 — this is the materialization
    leg)."""
    from sparkksqldbbenchmark_spark.llm.hashing import spark_md5_int

    docs = load_table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.sum("n_chars").cast("long").alias("t"),
        F.count(F.lit(1)).alias("n_docs"),
    ).select(
        "source",
        "t",
        "n_docs",
        (F.expr("CAST(substring(source, 4) AS BIGINT)") % 4 + 1).alias(
            "w"
        ),
    )
    plan = per_src.select(
        "source",
        "t",
        "n_docs",
        F.expr("(w * t) DIV 2").alias("a"),
    ).select(
        "source",
        "t",
        "n_docs",
        F.expr("a DIV t").alias("full_epochs"),
        F.expr("a % t").alias("frac_num"),
    )
    epochs = spark.range(1, 3).select(F.col("id").alias("epoch"))
    full_rows = (
        plan.crossJoin(F.broadcast(epochs))
        .where(F.col("epoch") <= F.col("full_epochs"))
        .select(
            "source",
            F.col("epoch").cast("long"),
            F.col("n_docs").cast("long").alias("n_docs_kept"),
            F.col("t").alias("chars_kept"),
        )
    )
    partials = plan.where(F.col("frac_num") > 0).select(
        "source",
        (F.col("full_epochs") + 1).alias("partial_epoch"),
        "t",
        "frac_num",
    )
    keep_hash = spark_md5_int(
        "concat('ep#', cast(partial_epoch as string), '#', "
        "cast(doc_id as string))"
    )
    partial_rows = (
        docs.select("source", "doc_id", "n_chars")
        .join(F.broadcast(partials), "source")
        .where(F.expr(f"({keep_hash}) % t") < F.col("frac_num"))
        .groupBy("source", "partial_epoch")
        .agg(
            F.count(F.lit(1)).alias("n_docs_kept"),
            F.sum("n_chars").cast("long").alias("chars_kept"),
        )
        .select(
            "source",
            F.col("partial_epoch").cast("long").alias("epoch"),
            F.col("n_docs_kept").cast("long"),
            "chars_kept",
        )
    )
    return full_rows.unionByName(partial_rows)


# ===================================================================
# Round-13 staging: new rows below (docs/ROTATION_R13.md slot plan).
# ===================================================================

# ------------------------------------ max drawdown per user --


@query(
    "max_drawdown_summary",
    oracle="""
    WITH c AS (
        SELECT user_id,
               CAST(floor(value * 100) AS BIGINT) AS cents,
               max(CAST(floor(value * 100) AS BIGINT)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS runmax
        FROM events
    ),
    per_user AS (
        SELECT user_id, max(runmax - cents) AS max_dd
        FROM c GROUP BY user_id
    )
    SELECT count(*) AS n_users,
           CAST(max(max_dd) AS BIGINT) AS worst_dd,
           CAST(sum(max_dd) AS BIGINT) AS total_dd,
           CAST(sum(CASE WHEN max_dd > 10000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_over_100,
           CAST(sum(CASE WHEN max_dd > 40000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_over_400
    FROM per_user
    """,
)
def max_drawdown_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAX DRAWDOWN per user series — the peak-to-trough risk metric
    (running max minus current value, maximized): the prefix-max
    identity turns a quadratic "max over all earlier peaks" into one
    ordered pass. Exact integer cents end to end.

    Scale shape: one hash exchange on user_id + in-partition sort
    shared by the single running-max window; the per-user frame then
    folds to a 1-row global summary. The same plan family as the
    sessionize/EMA rows — no global window anywhere.

    Reference basis: time-series analytics family (ohlc_hourly_bars
    r12-cohort, ema_dyadic_decay r7 — this adds the canonical
    prefix-extremum risk readout)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cents = F.floor(F.col("value") * 100).cast("long")
    c = ev.select(
        "user_id",
        cents.alias("cents"),
        F.max(cents)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("runmax"),
    )
    per_user = c.groupBy("user_id").agg(
        F.max(F.col("runmax") - F.col("cents")).alias("max_dd")
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.max("max_dd").cast("long").alias("worst_dd"),
        F.sum("max_dd").cast("long").alias("total_dd"),
        F.sum(F.when(F.col("max_dd") > 10000, 1).otherwise(0))
        .cast("long")
        .alias("n_over_100"),
        F.sum(F.when(F.col("max_dd") > 40000, 1).otherwise(0))
        .cast("long")
        .alias("n_over_400"),
    )


# ------------------------------------ DAU/MAU stickiness --


@query(
    "stickiness_dau_mau",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS dd FROM events
    ),
    dau AS (
        SELECT dd, count(*) AS dau FROM ud GROUP BY dd
    ),
    span AS (
        SELECT ud.user_id, (ud.dd + CAST(k.k AS INTEGER)) AS active_day
        FROM ud JOIN (SELECT unnest(range(0, 28)) AS k) k ON TRUE
    ),
    mau AS (
        SELECT active_day AS dd, count(DISTINCT user_id) AS mau
        FROM span GROUP BY active_day
    )
    SELECT strftime(dau.dd, '%Y-%m-%d') AS day,
           CAST(dau.dau AS BIGINT) AS dau,
           CAST(mau.mau AS BIGINT) AS mau28,
           CAST((dau.dau * 1000000) // mau.mau AS BIGINT)
               AS stickiness_e6
    FROM dau JOIN mau ON dau.dd = mau.dd
    """,
)
def stickiness_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU STICKINESS — exact daily and trailing-28-day distinct
    users and their ratio, the engagement metric every product
    dashboard leads with. MAU28 uses the bounded-expansion trick
    (each user-day projects onto the 28 window-end days it makes the
    user active for; distinct + count) — EXACT sliding distinct with
    a constant 28x fan-out of the DEDUPLICATED user-day frame, never
    a 28-day self-join and never approximate.

    Scale shape: one distinct on (user, day) — grain far below the
    event count — then a 28x explode of that frame and a second
    distinct+count keyed by day. Both exchanges are on
    already-reduced frames; same family as rolling_7day (r6) and
    rolling_24h_sliding_distinct (r12 graduate) with the ratio
    readout added.

    Reference basis: product-analytics family (rolling_7day_active_
    users r6, rolling_24h_sliding_distinct r12 — this adds the
    DAU/MAU ratio certificate)."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.to_date("ts").alias("dd")
    ).distinct()
    dau = ud.groupBy("dd").agg(F.count(F.lit(1)).alias("dau"))
    span = ud.select(
        "user_id", "dd", F.explode(F.expr("sequence(0, 27)")).alias("k")
    ).select(
        "user_id", F.date_add(F.col("dd"), F.col("k")).alias("dd")
    )
    mau = span.groupBy("dd").agg(
        F.countDistinct("user_id").alias("mau28")
    )
    return (
        dau.join(mau, "dd")
        .select(
            F.date_format("dd", "yyyy-MM-dd").alias("day"),
            F.col("dau").cast("long"),
            F.col("mau28").cast("long"),
            F.expr("(dau * 1000000) DIV mau28")
            .cast("long")
            .alias("stickiness_e6"),
        )
    )


# ------------------------------------ event path trigrams --


@query(
    "event_path_trigrams",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type AS e1,
               lead(event_type, 1) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS e2,
               lead(event_type, 2) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS e3
        FROM events
    )
    SELECT e1 || '>' || e2 || '>' || e3 AS path,
           count(*) AS n
    FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
    GROUP BY 1
    """,
)
def event_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BEHAVIORAL PATH MINING at trigram grain — consecutive
    event-type triples per user (two leads over one sort), counted
    across the corpus: the "what do users do next" sequence table
    that feeds funnels and next-action models. With a 5-type
    alphabet the output is a <=125-row path frame.

    Scale shape: one hash exchange on user_id + one in-partition
    sort shared by both lead frames; the path rollup aggregates to
    an alphabet-bounded frame. No self-joins — sequence mining at
    trigram depth is pure window algebra.

    Reference basis: product-analytics family (funnel_conversion r6,
    markov_transition_matrix r10 — this extends the transition
    matrix to second-order paths)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).where(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    return seq.groupBy(
        F.concat_ws(">", "e1", "e2", "e3").alias("path")
    ).agg(F.count(F.lit(1)).alias("n"))


def _leveled_rank(df, value_col, id_col, level_col, out="rk"):
    """EXACT global rank by (value, id) without a global sort: bucket
    histogram (domain-bounded) -> cumulative carry over the bounded
    bucket frame -> per-bucket row_number + carry. The two-level
    pattern shared with global_row_index_two_level /
    quantile_normalization — the scale-safe substitute for
    row_number() OVER (ORDER BY ...) whenever the bucket domain is
    bounded (values, days, DIV-compressed cents)."""
    lv = df.withColumn("__lvl", level_col)
    hist = lv.groupBy("__lvl").agg(F.count(F.lit(1)).alias("__c"))
    wb = Window.orderBy("__lvl").rowsBetween(
        Window.unboundedPreceding, -1
    )
    carry = hist.select(
        "__lvl",
        F.coalesce(F.sum("__c").over(wb), F.lit(0)).alias("__carry"),
    )
    wi = Window.partitionBy("__lvl").orderBy(value_col, id_col)
    return (
        lv.join(F.broadcast(carry), "__lvl")
        .withColumn(
            out, (F.col("__carry") + F.row_number().over(wi)).cast("long")
        )
        .drop("__lvl", "__carry")
    )


# ------------------------------------ RFM segmentation --


@query(
    "rfm_segment_counts",
    oracle="""
    WITH base AS (
        SELECT o_custkey AS ck,
               date_diff('day', max(o_orderdate),
                         (SELECT max(o_orderdate) FROM orders))
                   AS r_days,
               count(*) AS f_cnt,
               CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS m_cents
        FROM orders GROUP BY o_custkey
    ),
    ranked AS (
        SELECT ck,
               row_number() OVER (ORDER BY r_days, ck) AS r_rk,
               row_number() OVER (ORDER BY f_cnt, ck) AS f_rk,
               row_number() OVER (ORDER BY m_cents, ck) AS m_rk,
               (SELECT count(*) FROM base) AS n
        FROM base
    )
    SELECT CAST(((r_rk - 1) * 5) // n + 1 AS BIGINT) AS r_quintile,
           CAST(((f_rk - 1) * 5) // n + 1 AS BIGINT) AS f_quintile,
           CAST(((m_rk - 1) * 5) // n + 1 AS BIGINT) AS m_quintile,
           count(*) AS n_customers,
           CAST(sum(ck) AS BIGINT) AS custkey_sum
    FROM ranked GROUP BY 1, 2, 3
    """,
)
def rfm_segment_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM SEGMENTATION — recency/frequency/monetary quintiles per
    customer, the classic CRM segmentation grid. Each metric gets an
    EXACT global rank via the leveled two-level pattern (recency
    bucketed by day value, frequency by count value, monetary by
    2^20-cent chunks — every bucket histogram is domain-bounded), so
    no metric ever needs a single-reducer global sort; quintile =
    ((rank-1)*5) DIV n + 1 keeps the cut integer-exact and
    tie-deterministic (custkey breaks ties).

    Scale shape: one customer-grain aggregate off the orders scan,
    then three leveled ranks over the customer frame (per-bucket
    row_number windows + bounded carry joins) and a <=125-cell
    rollup.

    Reference basis: product-analytics family (cohort_retention r6,
    funnel r6 — this adds the segmentation grid; the leveled rank is
    the global_row_index_two_level machinery applied three ways)."""
    orders = load_table(spark, sf_dir, "orders")
    base = orders.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("f_cnt"),
        F.sum(
            F.floor(F.col("o_totalprice") * 100).cast("long")
        ).alias("m_cents"),
    )
    # ONE two-level rank pass for all three metrics on an exploded
    # (ck, metric, lvl, val) grain instead of three chained
    # _leveled_rank calls (guide §2.3/§2.4): the chain ran a bucket
    # histogram + carry + per-bucket window PER metric — 3x the
    # exchanges and serialized stage depth; here one histogram, one
    # carry window (partitioned by metric) and one per-(metric,
    # bucket) row_number rank everything, then a customer-grain pivot
    # restores the wide frame. Ranking recency by -days(last_order) is
    # order-identical to r_days = maxd - last_order (constant shift),
    # which also deletes the separate max-date scan and broadcast.
    neg_days = (
        -F.datediff(F.col("last_order"), F.lit("1970-01-01"))
    ).cast("long")
    m3 = base.select(
        "ck",
        F.explode(
            F.array(
                F.struct(
                    F.lit("r").alias("mt"),
                    neg_days.alias("lvl"),
                    neg_days.alias("val"),
                ),
                F.struct(
                    F.lit("f").alias("mt"),
                    F.col("f_cnt").cast("long").alias("lvl"),
                    F.col("f_cnt").cast("long").alias("val"),
                ),
                F.struct(
                    F.lit("m").alias("mt"),
                    F.expr("m_cents DIV 1048576")
                    .cast("long")
                    .alias("lvl"),
                    F.col("m_cents").cast("long").alias("val"),
                ),
            )
        ).alias("e"),
    ).select("ck", "e.mt", "e.lvl", "e.val")
    hist = m3.groupBy("mt", "lvl").agg(
        F.count(F.lit(1)).alias("__c")
    )
    wb = Window.partitionBy("mt").orderBy("lvl").rowsBetween(
        Window.unboundedPreceding, -1
    )
    carry = hist.select(
        "mt",
        "lvl",
        F.coalesce(F.sum("__c").over(wb), F.lit(0)).alias("__carry"),
    )
    wi = Window.partitionBy("mt", "lvl").orderBy("val", "ck")
    ranked = m3.join(F.broadcast(carry), ["mt", "lvl"]).withColumn(
        "rk",
        (F.col("__carry") + F.row_number().over(wi)).cast("long"),
    )
    base = ranked.groupBy("ck").agg(
        F.max(F.when(F.col("mt") == "r", F.col("rk"))).alias("r_rk"),
        F.max(F.when(F.col("mt") == "f", F.col("rk"))).alias("f_rk"),
        F.max(F.when(F.col("mt") == "m", F.col("rk"))).alias("m_rk"),
    )
    n = base.agg(F.count(F.lit(1)).alias("__n"))
    return (
        base.crossJoin(F.broadcast(n))
        .groupBy(
            F.expr("((r_rk - 1) * 5) DIV __n + 1")
            .cast("long")
            .alias("r_quintile"),
            F.expr("((f_rk - 1) * 5) DIV __n + 1")
            .cast("long")
            .alias("f_quintile"),
            F.expr("((m_rk - 1) * 5) DIV __n + 1")
            .cast("long")
            .alias("m_quintile"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("ck").cast("long").alias("custkey_sum"),
        )
    )


# ------------------------------------ equi-depth bounds --


@query(
    "equi_depth_partition_bounds",
    oracle="""
    WITH hist AS (
        SELECT CAST(floor(value * 100) AS BIGINT) AS cents,
               count(*) AS cnt
        FROM events GROUP BY 1
    ),
    cum AS (
        SELECT cents, cnt,
               sum(cnt) OVER (ORDER BY cents
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum,
               (SELECT count(*) FROM events) AS n
        FROM hist
    ),
    targets AS (
        SELECT unnest(range(1, 17)) AS bucket_id
    )
    SELECT CAST(t.bucket_id AS BIGINT) AS bucket_id,
           CAST((t.bucket_id * c.n) // 16 AS BIGINT) AS target_cum,
           CAST(min(c.cents) AS BIGINT) AS boundary_cents,
           CAST(min(c.cum) AS BIGINT) AS cum_at_boundary
    FROM targets t
    JOIN cum c ON c.cum >= (t.bucket_id * c.n) // 16
    GROUP BY t.bucket_id, c.n
    """,
)
def equi_depth_partition_bounds(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EQUI-DEPTH RANGE BOUNDS — the range-partitioner planning step:
    16 exact quantile boundaries over the value distribution from a
    DOMAIN-BOUNDED histogram (integer cents, <=100k distinct) and its
    cumulative counts; boundary_i = smallest value whose cumulative
    count reaches target i*n/16 (minimality proven by the min()
    aggregates over the >= join). This is what rangepartitioning /
    Z-order / sorted-write layouts consume upstream — done exactly,
    not by sampling.

    Scale shape: ONE scan-side histogram aggregate (bounded by the
    value domain, not the row count); the cumulative window and the
    16-target join both run on that bounded frame. Boundary
    computation never touches row-grain data again.

    Reference basis: layout/scale-pattern family (range_layout_scan
    r5, zorder r6, equi-depth histograms in analyze_column_stats r6
    — this pins the exact-boundary planning contract)."""
    ev = load_table(spark, sf_dir, "events")
    hist = ev.groupBy(
        F.floor(F.col("value") * 100).cast("long").alias("cents")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    wc = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    n = ev.agg(F.count(F.lit(1)).alias("n"))
    cum = hist.select(
        "cents", F.sum("cnt").over(wc).alias("cum")
    ).crossJoin(F.broadcast(n))
    targets = spark.range(1, 17).select(
        F.col("id").cast("long").alias("bucket_id")
    )
    joined = cum.join(
        F.broadcast(targets),
        F.col("cum") >= F.expr("(bucket_id * n) DIV 16"),
    )
    return joined.groupBy("bucket_id", "n").agg(
        F.min(F.expr("(bucket_id * n) DIV 16"))
        .cast("long")
        .alias("target_cum"),
        F.min("cents").cast("long").alias("boundary_cents"),
        F.min("cum").cast("long").alias("cum_at_boundary"),
    ).drop("n")


# ------------------------------------ cohort LTV matrix --


@query(
    "cohort_ltv_accumulation",
    oracle="""
    WITH o AS (
        SELECT o_custkey AS ck,
               (year(o_orderdate) * 12 + month(o_orderdate)) AS ym,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    cohorts AS (
        SELECT ck, min(ym) AS cohort_ym FROM o GROUP BY ck
    ),
    cells AS (
        SELECT c.cohort_ym, o.ym - c.cohort_ym AS age_months,
               count(*) AS n_orders,
               count(DISTINCT o.ck) AS n_active,
               CAST(sum(o.cents) AS BIGINT) AS rev_cents
        FROM o JOIN cohorts c ON o.ck = c.ck
        GROUP BY 1, 2
    )
    SELECT CAST(cohort_ym AS BIGINT) AS cohort_ym,
           CAST(age_months AS BIGINT) AS age_months,
           CAST(n_orders AS BIGINT) AS n_orders,
           CAST(n_active AS BIGINT) AS n_active,
           rev_cents,
           CAST(sum(rev_cents) OVER (
               PARTITION BY cohort_ym ORDER BY age_months
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cum_rev_cents
    FROM cells
    """,
)
def cohort_ltv_accumulation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """COHORT LTV — the cohort-month × age-month revenue matrix with
    cumulative lifetime value per cohort: the retention economics
    readout behind every subscription dashboard. Cohort = first
    order month; exact integer cents; the cumulative sum runs over
    the month-domain-bounded cell frame, never over orders.

    Scale shape: one customer-grain min-aggregate (cohort
    assignment), one join back on the customer key, one (cohort,
    age) rollup — the cell frame is bounded by months² (~6400 at 80
    months), so the cumulation window is constant-size by the
    repo's frame rule.

    Reference basis: product-analytics family (cohort_retention r6 —
    this adds the revenue/LTV plane with exact accumulation)."""
    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        F.col("o_custkey").alias("ck"),
        (
            F.year("o_orderdate") * 12 + F.month("o_orderdate")
        ).alias("ym"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    cohorts = o.groupBy("ck").agg(F.min("ym").alias("cohort_ym"))
    cells = (
        o.join(cohorts, "ck")
        .groupBy(
            F.col("cohort_ym").cast("long").alias("cohort_ym"),
            (F.col("ym") - F.col("cohort_ym"))
            .cast("long")
            .alias("age_months"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("ck").cast("long").alias("n_active"),
            F.sum("cents").cast("long").alias("rev_cents"),
        )
    )
    wc = Window.partitionBy("cohort_ym").orderBy("age_months").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return cells.select(
        "cohort_ym",
        "age_months",
        F.col("n_orders").cast("long"),
        "n_active",
        "rev_cents",
        F.sum("rev_cents").over(wc).cast("long").alias("cum_rev_cents"),
    )


# ------------------------------------ reservoir bottom-k --


def _reservoir_oracle() -> str:
    from sparkksqldbbenchmark_spark.llm.hashing import sql_md5_int

    h = sql_md5_int("CAST(doc_id AS VARCHAR)")
    return f"""
    WITH hashed AS (
        SELECT source, doc_id, ({h}) AS hk FROM documents
    ),
    ranked AS (
        SELECT source, doc_id, hk,
               row_number() OVER (
                   PARTITION BY source ORDER BY hk, doc_id
               ) AS rk
        FROM hashed
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN rk <= 8 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
           CAST(sum(CASE WHEN rk <= 8 THEN doc_id ELSE 0 END)
                AS BIGINT) AS kept_id_sum,
           coalesce(
               max(CASE WHEN rk <= 8 THEN hk END)
               < min(CASE WHEN rk > 8 THEN hk END), TRUE)
               AS boundary_ok
    FROM ranked GROUP BY source
    """


@query("reservoir_bottomk_certified", oracle=_reservoir_oracle())
def reservoir_bottomk_certified(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CERTIFIED RESERVOIR SAMPLE — exactly k=8 docs per source via
    the bottom-k-by-hash construction: rank by (md5(doc_id), doc_id)
    within source, keep rank <= k. Bottom-k IS the distributed
    reservoir: partition-local bottom-k states merge associatively
    (min-merge), the draw is uniform over any id set, and unlike
    Algorithm R it is REPRODUCIBLE — membership depends only on the
    ids present, not arrival order or partitioning. The certificate
    columns prove it: exact kept count and the boundary property
    (every kept hash < every dropped hash).

    Scale shape: scan-fused hash, per-source top-k (rank window
    partitioned by source — the TakeOrdered family), 20-row rollup.
    No global sort; merging partial bottom-k states is exactly what
    the shuffle's partial aggregation performs.

    Reference basis: sampling family (stratified_sample r3,
    tablesample_repeatable_certified r12, group_exact_k_sample r6 —
    this pins the mergeable-reservoir contract with an in-query
    boundary certificate)."""
    from sparkksqldbbenchmark_spark.llm.hashing import spark_md5_int

    docs = load_table(spark, sf_dir, "documents")
    hk = F.expr(spark_md5_int("CAST(doc_id AS STRING)"))
    w = Window.partitionBy("source").orderBy("hk", "doc_id")
    ranked = docs.select("source", "doc_id", hk.alias("hk")).select(
        "source", "doc_id", "hk", F.row_number().over(w).alias("rk")
    )
    return ranked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("rk") <= 8, 1).otherwise(0))
        .cast("long")
        .alias("n_kept"),
        F.sum(F.when(F.col("rk") <= 8, F.col("doc_id")).otherwise(0))
        .cast("long")
        .alias("kept_id_sum"),
        F.coalesce(
            F.max(F.when(F.col("rk") <= 8, F.col("hk")))
            < F.min(F.when(F.col("rk") > 8, F.col("hk"))),
            F.lit(True),
        ).alias("boundary_ok"),
    )


# ------------------------------------ class-balanced undersample --


def _undersample_oracle() -> str:
    from sparkksqldbbenchmark_spark.llm.hashing import sql_md5_int

    h = sql_md5_int("CAST(vec_id AS VARCHAR)")
    return f"""
    WITH ranked AS (
        SELECT label, vec_id,
               row_number() OVER (
                   PARTITION BY label ORDER BY ({h}), vec_id
               ) AS rk
        FROM embeddings
    ),
    m AS (
        SELECT min(cnt) AS m FROM (
            SELECT count(*) AS cnt FROM embeddings GROUP BY label
        )
    )
    SELECT CAST(r.label AS BIGINT) AS label,
           count(*) AS n_orig,
           CAST(sum(CASE WHEN r.rk <= m.m THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN r.rk <= m.m THEN r.vec_id ELSE 0 END)
                AS BIGINT) AS kept_vec_sum,
           sum(CASE WHEN r.rk <= m.m THEN 1 ELSE 0 END)
               = CAST(m.m AS BIGINT) AS kept_equal
    FROM ranked r CROSS JOIN m GROUP BY r.label, m.m
    """


@query(
    "class_balanced_undersample", oracle=_undersample_oracle()
)
def class_balanced_undersample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CLASS-BALANCED UNDERSAMPLING — every label trimmed to the
    minority-class size by deterministic hash-rank cut: the standard
    rebalancing step before training on skewed labels, made
    reproducible (membership is a pure function of the id set, so
    re-runs and backfills select identical rows). n_kept == min
    class count for every label by construction.

    Scale shape: one label-grain count (bounded frame) broadcast as
    the cut; per-label rank window (per-key sort); 10-row rollup.

    Reference basis: sampling family (label_inverse_frequency_weights
    staged holdback is the REWEIGHTING answer to imbalance; this is
    the RESAMPLING answer — the two standard treatments side by
    side)."""
    from sparkksqldbbenchmark_spark.llm.hashing import spark_md5_int

    emb = load_table(spark, sf_dir, "embeddings")
    counts = emb.groupBy("label").agg(F.count(F.lit(1)).alias("cnt"))
    m = counts.agg(F.min("cnt").alias("m"))
    hk = F.expr(spark_md5_int("CAST(vec_id AS STRING)"))
    w = Window.partitionBy("label").orderBy(hk, "vec_id")
    ranked = emb.select(
        "label", "vec_id", F.row_number().over(w).alias("rk")
    ).crossJoin(F.broadcast(m))
    return (
        ranked.groupBy(
            F.col("label").cast("long").alias("label"), "m"
        )
        .agg(
            F.count(F.lit(1)).alias("n_orig"),
            F.sum(F.when(F.col("rk") <= F.col("m"), 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
            F.sum(
                F.when(
                    F.col("rk") <= F.col("m"), F.col("vec_id")
                ).otherwise(0)
            )
            .cast("long")
            .alias("kept_vec_sum"),
        )
        .select(
            "label",
            "n_orig",
            "n_kept",
            "kept_vec_sum",
            (F.col("n_kept") == F.col("m").cast("long")).alias(
                "kept_equal"
            ),
        )
    )


# ------------------------------------ exact AUC via rank sum --


@query(
    "auc_rank_sum_exact",
    oracle="""
    WITH scored AS (
        SELECT vec_id, label >= 5 AS pos,
               (SELECT CAST(sum(
                    CAST(floor(e * 1000) AS BIGINT)
                    * CAST(floor(e * 1000) AS BIGINT)) AS BIGINT)
                FROM unnest(embedding) AS t(e)) AS score
        FROM embeddings
    ),
    ranked AS (
        SELECT pos, score,
               row_number() OVER (ORDER BY score, vec_id) AS rk
        FROM scored
    ),
    per_score AS (
        SELECT score, min(rk) AS min_rk, count(*) AS cnt,
               CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT)
                   AS pos_cnt
        FROM ranked GROUP BY score
    ),
    agg AS (
        SELECT CAST(sum(pos_cnt * (2 * min_rk + cnt - 1)) AS BIGINT)
                   AS s2,
               CAST(sum(pos_cnt) AS BIGINT) AS npos,
               CAST(sum(cnt - pos_cnt) AS BIGINT) AS nneg
        FROM per_score
    )
    SELECT npos, nneg,
           CAST(s2 - npos * (npos + 1) AS BIGINT) AS u2,
           CAST(((s2 - npos * (npos + 1)) * 1000000)
                // (2 * npos * nneg) AS BIGINT) AS auc_e6
    FROM agg
    """,
)
def auc_rank_sum_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT ROC AUC by the Mann-Whitney rank-sum identity —
    AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺n⁻) with MIDRANK tie handling, all
    in integers (doubled ranks: ties at a score contribute
    pos_cnt·(2·min_rk + cnt − 1)). Scores are the quantized squared
    norms (HOF fold, no explode); positives are labels ≥ 5. The
    sort-free AUC every ranking-model eval needs, exact to the last
    ulp because nothing ever leaves ℤ until the final e6 division.

    Scale shape: ranks come from the leveled two-level pattern
    (score DIV 2^16 buckets — domain-bounded histogram carry +
    per-bucket row_number), so no global sort; the midrank algebra
    runs on the per-distinct-score frame; output is one row.

    Reference basis: evaluation-certificate family
    (score_calibration_bins r12, quality_threshold_sweep_confusion
    r12 — this adds the threshold-free ranking metric)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q_fold = F.aggregate(
        "embedding",
        F.lit(0).cast("long"),
        lambda acc, x: acc
        + F.floor(x.cast("double") * 1000).cast("long")
        * F.floor(x.cast("double") * 1000).cast("long"),
    )
    scored = emb.select(
        "vec_id",
        (F.col("label") >= 5).alias("pos"),
        q_fold.alias("score"),
    )
    ranked = _leveled_rank(
        scored, "score", "vec_id", F.expr("score DIV 65536"), "rk"
    )
    per_score = ranked.groupBy("score").agg(
        F.min("rk").alias("min_rk"),
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.when(F.col("pos"), 1).otherwise(0))
        .cast("long")
        .alias("pos_cnt"),
    )
    agg = per_score.agg(
        F.sum(
            F.col("pos_cnt") * (2 * F.col("min_rk") + F.col("cnt") - 1)
        )
        .cast("long")
        .alias("s2"),
        F.sum("pos_cnt").cast("long").alias("npos"),
        F.sum(F.col("cnt") - F.col("pos_cnt")).cast("long").alias("nneg"),
    )
    return agg.select(
        "npos",
        "nneg",
        (F.col("s2") - F.col("npos") * (F.col("npos") + 1))
        .cast("long")
        .alias("u2"),
        F.expr(
            "((s2 - npos * (npos + 1)) * 1000000)"
            " DIV (2 * npos * nneg)"
        )
        .cast("long")
        .alias("auc_e6"),
    )


# ------------------------------------ pairwise energy stats --


@query(
    "pairwise_energy_sufficient_stats",
    oracle="""
    WITH comp AS (
        SELECT label, t.j, CAST(floor(t.e * 1000) AS BIGINT) AS q
        FROM embeddings,
             LATERAL (SELECT generate_subscripts(embedding, 1) AS j,
                             unnest(embedding) AS e) t
    ),
    qsum AS (
        SELECT e.label,
               count(*) AS n_vecs,
               CAST(sum((SELECT sum(
                    CAST(floor(x.e * 1000) AS BIGINT)
                    * CAST(floor(x.e * 1000) AS BIGINT))
                    FROM unnest(e.embedding) AS x(e))) AS BIGINT)
                   AS q_total
        FROM embeddings e GROUP BY e.label
    ),
    svec AS (
        SELECT label, j, CAST(sum(q) AS BIGINT) AS sj
        FROM comp GROUP BY label, j
    ),
    snorm AS (
        SELECT label, CAST(sum(sj * sj) AS BIGINT) AS s_norm2
        FROM svec GROUP BY label
    )
    SELECT CAST(q.label AS BIGINT) AS label,
           CAST(q.n_vecs AS BIGINT) AS n_vecs,
           q.q_total,
           s.s_norm2,
           CAST(q.n_vecs * q.q_total - s.s_norm2 AS BIGINT)
               AS pairwise_energy2,
           q.n_vecs * q.q_total - s.s_norm2 >= 0 AS nonneg_ok
    FROM qsum q JOIN snorm s ON q.label = s.label
    """,
)
def pairwise_energy_sufficient_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PAIRWISE ENERGY from sufficient statistics — per label,
    Σ_{i<j}‖x_i−x_j‖² computed WITHOUT any pair enumeration via the
    exact integer identity Σ_{i<j}‖x_i−x_j‖² = n·Σ‖x‖² − ‖Σx‖²
    (quantized components, so both sides are exact): the O(n·d)
    sufficient-statistic form of cluster dispersion that replaces the
    O(n²) pairwise scan SemDeDup-style prune costs would otherwise
    pay per cluster. The nonneg certificate is Cauchy-Schwarz holding
    in exact arithmetic.

    Scale shape: one explode to (label, j) component sums (the
    d-bounded vector-sum state), one HOF-fold aggregate for Σ‖x‖² —
    both mergeable one-pass aggregates; output is label-bounded.

    Reference basis: embedding-analytics family (semdedup r12-cohort,
    embedding_prefix_energy r12 — this pins dispersion-by-moments,
    the 100 TB substitute for pairwise distance audits)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q_fold = F.aggregate(
        "embedding",
        F.lit(0).cast("long"),
        lambda acc, x: acc
        + F.floor(x.cast("double") * 1000).cast("long")
        * F.floor(x.cast("double") * 1000).cast("long"),
    )
    qsum = emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum(q_fold).cast("long").alias("q_total"),
    )
    comp = emb.select(
        "label", F.posexplode("embedding").alias("j", "e")
    ).select(
        "label",
        "j",
        F.floor(F.col("e").cast("double") * 1000).cast("long").alias("q"),
    )
    svec = comp.groupBy("label", "j").agg(F.sum("q").alias("sj"))
    snorm = svec.groupBy("label").agg(
        F.sum(F.col("sj") * F.col("sj")).cast("long").alias("s_norm2")
    )
    return (
        qsum.join(snorm, "label")
        .select(
            F.col("label").cast("long").alias("label"),
            F.col("n_vecs").cast("long").alias("n_vecs"),
            "q_total",
            "s_norm2",
            (F.col("n_vecs") * F.col("q_total") - F.col("s_norm2"))
            .cast("long")
            .alias("pairwise_energy2"),
            (
                F.col("n_vecs") * F.col("q_total") - F.col("s_norm2")
                >= 0
            ).alias("nonneg_ok"),
        )
    )


# ------------------------------------ 1-NN leave-one-out --


@query(
    "knn_loo_label_accuracy",
    oracle="""
    WITH qv AS (
        SELECT vec_id, label, embedding FROM embeddings
        WHERE vec_id % 25 = 0
    ),
    pairs AS (
        SELECT q.vec_id AS qid, q.label AS qlabel,
               c.vec_id AS cid, c.label AS clabel,
               (SELECT CAST(sum(
                    CAST(floor(a.e * 1000) AS BIGINT)
                    * CAST(floor(b.e * 1000) AS BIGINT)) AS BIGINT)
                FROM (SELECT generate_subscripts(q.embedding, 1) AS j,
                             unnest(q.embedding) AS e) a
                JOIN (SELECT generate_subscripts(c.embedding, 1) AS j,
                             unnest(c.embedding) AS e) b
                  ON a.j = b.j) AS dot
        FROM qv q JOIN embeddings c ON c.vec_id != q.vec_id
    ),
    nn AS (
        SELECT qid, qlabel, clabel,
               row_number() OVER (
                   PARTITION BY qid ORDER BY dot DESC, cid
               ) AS rk
        FROM pairs
    )
    SELECT CAST(qlabel AS BIGINT) AS label,
           count(*) AS n_queries,
           CAST(sum(CASE WHEN clabel = qlabel THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct
    FROM nn WHERE rk = 1 GROUP BY qlabel
    """,
)
def knn_loo_label_accuracy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """1-NN LEAVE-ONE-OUT accuracy — for a deterministic 4% probe
    slice, find each probe's nearest neighbor (max quantized integer
    dot, tie → lowest candidate id, self excluded) and score label
    agreement per class: the standard embedding-quality sanity metric
    before any model touches the vectors. The dot is an exact-integer
    zip_with/aggregate fold — whole-stage codegen, no Python, no
    floats.

    Scale shape: the probe side is a bounded broadcast (the graded
    contract mirrors cosine_topk's bounded-query convention); one
    corpus scan computes all probe dots; argmax is a max_by
    aggregate keyed by probe. The production path for unbounded
    probe sets is the LSH/IVF candidate machinery (graded siblings)
    — this row pins the exact contract those must approximate.

    Reference basis: similarity family (similarity_topk_cosine r3,
    ann/ivf certificates r6-8 — this adds the label-supervised
    quality readout)."""
    emb = load_table(spark, sf_dir, "embeddings")
    qz = F.expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)"
        " * 1000) AS BIGINT))"
    )
    corpus = emb.select(
        F.col("vec_id").alias("cid"),
        F.col("label").alias("clabel"),
        qz.alias("cq"),
    )
    probes = emb.where(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        qz.alias("qq"),
    )
    pairs = (
        corpus.crossJoin(F.broadcast(probes))
        .where(F.col("cid") != F.col("qid"))
        .select(
            "qid",
            "qlabel",
            "cid",
            "clabel",
            F.expr(
                "aggregate(zip_with(qq, cq, (a, b) -> a * b),"
                " 0L, (acc, x) -> acc + x)"
            ).alias("dot"),
        )
    )
    nn = pairs.groupBy("qid", "qlabel").agg(
        F.expr("min_by(clabel, struct(-dot, cid))").alias("nn_label")
    )
    return nn.groupBy(
        F.col("qlabel").cast("long").alias("label")
    ).agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.sum(
            F.when(F.col("nn_label") == F.col("qlabel"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_correct"),
    )


# ------------------------------------ LSH band sensitivity --


def _band_sweep_oracle(k: int = 16, n: int = 3) -> str:
    from sparkksqldbbenchmark_spark.llm.hashing import (
        sql_minhash_sig,
        sql_word_shingles,
    )

    sh = sql_word_shingles("text", n)
    inter = (
        "len(list_filter(sa.shingles,"
        " s -> list_contains(sb.shingles, s)))"
    )
    jac = (
        f"CAST({inter} AS DOUBLE) / CAST(len(sa.shingles)"
        f" + len(sb.shingles) - {inter} AS DOUBLE)"
    )
    setting_tpl = """
    , banded{b} AS (
        SELECT doc_id, t.b AS band_idx,
               md5(array_to_string(list_transform(
                   sig[t.b*{r}+1 : t.b*{r}+{r}],
                   x -> CAST(x AS VARCHAR)), '-')) AS bh
        FROM sigged, range(0, {b}) t(b)
    ), cand{b} AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM banded{b} a
        JOIN banded{b} b ON a.band_idx = b.band_idx AND a.bh = b.bh
                         AND a.doc_id < b.doc_id
    ), stats{b} AS (
        SELECT CAST({b} AS BIGINT) AS bands,
               CAST({r} AS BIGINT) AS rows_per_band,
               count(*) AS n_candidates,
               CAST(sum(CASE WHEN {jac} >= 0.5 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_verified
        FROM cand{b}
        JOIN sh sa ON cand{b}.doc_a = sa.doc_id
        JOIN sh sb ON cand{b}.doc_b = sb.doc_id
    )"""
    settings = "".join(
        setting_tpl.format(b=b, r=k // b, jac=jac) for b in (4, 8)
    )
    return f"""
    WITH sh AS (
        SELECT doc_id, {sh} AS shingles FROM documents
    ), sigged AS (
        SELECT doc_id, {sql_minhash_sig("shingles", k)} AS sig FROM sh
    ){settings}
    SELECT * FROM stats4 UNION ALL SELECT * FROM stats8
    """


@query(
    "lsh_band_sensitivity_audit", oracle=_band_sweep_oracle()
)
def lsh_band_sensitivity_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """LSH BAND-TUNING SWEEP — candidate and verified-pair counts at
    two bandings of the SAME 16-hash signatures ((b=4, r=4) vs
    (b=8, r=2)): the measurement that picks the collision curve
    P(candidate) = 1-(1-s^r)^b before committing a corpus-scale dedup
    run. Shorter bands (r=2) recall more true pairs at the cost of
    more candidates to verify — this row pins both counts exactly so
    the trade is data, not folklore.

    Scale shape: signatures computed ONCE (the shared lsh_banded_
    buckets front half, codegen explode+min under one doc-id
    shuffle); each setting adds only its band-bucket equi-join and
    the Jaccard verify on its candidate frame — both LSH-bounded.

    Reference basis: dedup family (dedup_minhash_lsh flagship,
    minhash_estimate_error_certified r10 — this adds the operating-
    point sweep)."""
    from sparkksqldbbenchmark_spark.llm.dedup import (
        band_buckets,
        lsh_signatures,
    )

    docs = load_table(spark, sf_dir, "documents")
    # r18 (guide §2.4): the 16 minhash signatures are band-INDEPENDENT —
    # compute the shingle checkpoint and the signature frame ONCE and
    # re-band per operating point (the old loop re-tokenized, re-hashed
    # and re-checkpointed the whole corpus per bands value). sigged is
    # (id, 16 longs) — checkpoint it so both band configs read it.
    shingle_side, sigged = lsh_signatures(
        docs, "text", "doc_id", num_hashes=16
    )
    sigged = sigged.localCheckpoint(eager=True)
    out = None
    for bands in (4, 8):
        buckets = band_buckets(
            sigged, "doc_id", num_hashes=16, bands=bands
        )
        left = buckets.select(
            F.col("doc_id").alias("doc_a"), "band_idx", "bh"
        )
        right = buckets.select(
            F.col("doc_id").alias("doc_b"), "band_idx", "bh"
        )
        cand = (
            left.join(right, ["band_idx", "bh"])
            .where(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
            .dropDuplicates(["doc_a", "doc_b"])
        )
        verified = cand.join(
            shingle_side.select(
                F.col("doc_id").alias("doc_a"),
                F.col("shingles").alias("sh_a"),
            ),
            "doc_a",
        ).join(
            shingle_side.select(
                F.col("doc_id").alias("doc_b"),
                F.col("shingles").alias("sh_b"),
            ),
            "doc_b",
        )
        inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
        union = (
            F.size("sh_a") + F.size("sh_b")
        ).cast("double") - inter
        stats = verified.agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.sum(F.when(inter / union >= 0.5, 1).otherwise(0))
            .cast("long")
            .alias("n_verified"),
        ).select(
            F.lit(bands).cast("long").alias("bands"),
            F.lit(16 // bands).cast("long").alias("rows_per_band"),
            "n_candidates",
            "n_verified",
        )
        out = stats if out is None else out.unionByName(stats)
    return out


# ------------------------------------ suffix LCP repeats --


@query(
    "suffix_lcp_repeat_stats",
    oracle="""
    WITH pos AS (
        SELECT d.source, d.doc_id, p.p,
               substring(d.text, CAST(p.p AS INTEGER), 16) AS suf
        FROM documents d,
             LATERAL (SELECT unnest(range(1, len(d.text) + 1)) AS p) p
        WHERE len(d.text) - p.p + 1 >= 16
    ),
    adj AS (
        SELECT source, suf,
               lag(suf) OVER (
                   PARTITION BY source ORDER BY suf, doc_id, p
               ) AS prev
        FROM pos
    ),
    lcps AS (
        SELECT source,
               len(list_filter(range(1, 17),
                   i -> substring(suf, 1, CAST(i AS INTEGER))
                        = substring(prev, 1, CAST(i AS INTEGER))))
                   AS lcp
        FROM adj WHERE prev IS NOT NULL
    )
    SELECT source,
           count(*) + 1 AS n_suffixes,
           CAST(max(lcp) AS BIGINT) AS max_lcp,
           CAST(sum(CASE WHEN lcp >= 8 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_repeat_pairs,
           CAST(sum(lcp) AS BIGINT) AS total_lcp
    FROM lcps GROUP BY source
    """,
)
def suffix_lcp_repeat_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SUFFIX-ARRAY LCP STATISTICS — the repeated-substring profile
    per source from the sorted-suffix adjacency (max and total LCP
    over neighbors in suffix order, repeat pairs = adjacent LCP >= 8):
    the suffix-array construction at the heart of exact-substring
    dedup (Lee et al. 2022 deduplicate-text-datasets), distilled to
    its scalable skeleton. Suffixes truncated to 16 chars (the LCP
    cap); adjacency in the total (suffix, doc, pos) order.

    Scale shape: THE point of the row — the global suffix sort is
    range-partitioned by the 4-char suffix prefix (alphabet-bounded,
    measured 1.57x faster than 2-char at 330M suffixes — finer buckets
    shrink the per-partition n log n sort
    buckets): in-bucket adjacency is a per-bucket sort window,
    cross-bucket adjacency comes from the bounded (source, bucket)
    first/last summary frame. No single-reducer sort; the LCP of two
    strings is the monotone prefix-equality count
    size(filter(1..16, i -> prefix_i equal)) — pure codegen.

    Reference basis: text-dedup family (exact_substring_spans r9 —
    windowed-hash spans; this is the suffix-order view that scales
    to cross-document repeated-substring mining)."""
    docs = load_table(spark, sf_dir, "documents")
    pos = docs.select(
        "source",
        "doc_id",
        F.explode(
            F.expr(
                "case when length(text) >= 16"
                " then sequence(1, length(text) - 15)"
                " else array() end"
            )
        ).alias("p"),
        "text",
    ).select(
        "source",
        "doc_id",
        "p",
        F.expr("substring(text, p, 16)").alias("suf"),
    )
    pos = pos.withColumn("bkt", F.expr("substring(suf, 1, 4)"))
    wb = Window.partitionBy("source", "bkt").orderBy(
        "suf", "doc_id", "p"
    )
    # r18 (guide §2.4 share one exchange; same fix as
    # longest_repeated_substring_extract): the separate min/max bucket
    # aggregate re-ran and re-shuffled the suffix explode; the bucket
    # firsts/lasts are exactly the rows whose lag/lead is null under
    # the identical (suf, doc_id, p) order, so both branches now share
    # one ReusedExchange and the explode runs once.
    in_bucket = pos.select(
        "source",
        "bkt",
        "suf",
        F.lag("suf").over(wb).alias("prev"),
        F.lead("suf").over(wb).alias("nxt"),
    )
    bstats = (
        in_bucket.where(
            F.col("prev").isNull() | F.col("nxt").isNull()
        )
        .groupBy("source", "bkt")
        .agg(
            F.min(
                F.when(F.col("prev").isNull(), F.col("suf"))
            ).alias("fsuf"),
            F.min(
                F.when(F.col("nxt").isNull(), F.col("suf"))
            ).alias("lsuf"),
        )
    )
    ws = Window.partitionBy("source").orderBy("bkt")
    boundary = bstats.select(
        "source",
        F.col("fsuf").alias("suf"),
        F.lag("lsuf").over(ws).alias("prev"),
    ).where(F.col("prev").isNotNull())
    pairs = in_bucket.where(F.col("prev").isNotNull()).select(
        "source", "suf", "prev"
    ).unionByName(boundary)
    lcp = F.size(
        F.expr(
            "filter(sequence(1, 16), i ->"
            " substring(suf, 1, i) = substring(prev, 1, i))"
        )
    ).cast("long")
    lcps = pairs.select("source", lcp.alias("lcp"))
    return lcps.groupBy("source").agg(
        (F.count(F.lit(1)) + 1).alias("n_suffixes"),
        F.max("lcp").cast("long").alias("max_lcp"),
        F.sum(F.when(F.col("lcp") >= 8, 1).otherwise(0))
        .cast("long")
        .alias("n_repeat_pairs"),
        F.sum("lcp").cast("long").alias("total_lcp"),
    )


# ------------------------------------ CC via hash-to-min --


def _cc_oracle(k: int = 16, bands: int = 4, n: int = 3) -> str:
    from sparkksqldbbenchmark_spark.llm.hashing import (
        sql_minhash_sig,
        sql_word_shingles,
    )

    rows = k // bands
    sh = sql_word_shingles("text", n)
    iter_tpl = """
    , labels{i} AS (
        SELECT l.node,
               least(l.lbl, coalesce(nm.m, l.lbl)) AS lbl
        FROM labels{p} l LEFT JOIN (
            SELECT e.src AS node, min(x.lbl) AS m
            FROM edges e JOIN labels{p} x ON e.dst = x.node
            GROUP BY e.src
        ) nm ON nm.node = l.node
    )"""
    iters = "".join(iter_tpl.format(i=i, p=i - 1) for i in range(1, 7))
    return f"""
    WITH sh AS (
        SELECT doc_id, {sh} AS shingles FROM documents
    ), sigged AS (
        SELECT doc_id, {sql_minhash_sig("shingles", k)} AS sig FROM sh
    ), banded AS (
        SELECT doc_id, b AS band_idx,
               md5(array_to_string(list_transform(
                   sig[b*{rows}+1 : b*{rows}+{rows}],
                   x -> CAST(x AS VARCHAR)), '-')) AS bh
        FROM sigged, range(0, {bands}) t(b)
    ), pairs AS (
        SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
        FROM banded a
        JOIN banded b ON a.band_idx = b.band_idx AND a.bh = b.bh
        WHERE a.doc_id < b.doc_id
    ), edges AS (
        SELECT u AS src, v AS dst FROM pairs
        UNION ALL
        SELECT v AS src, u AS dst FROM pairs
    ), labels0 AS (
        SELECT DISTINCT src AS node, src AS lbl FROM edges
    ){iters}
    SELECT CAST(l6.lbl AS BIGINT) AS component,
           count(*) AS n_members,
           CAST(min(l6.node) AS BIGINT) AS min_doc_id,
           CAST(max(l6.node) AS BIGINT) AS max_doc_id,
           bool_and(l6.lbl = l5.lbl) AS converged
    FROM labels6 l6 JOIN labels5 l5 ON l6.node = l5.node
    GROUP BY l6.lbl
    """


@query(
    "cc_hash_to_min_pointer_jump", oracle=_cc_oracle()
)
def cc_hash_to_min_pointer_jump(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CONNECTED COMPONENTS by HASH-TO-MIN with POINTER JUMPING —
    two rounds of (adopt the min label among self and neighbors,
    then p := p(p)) on the near-dup graph: the O(log d)-round CC
    algorithm (Rastogi et al., "Finding Connected Components in
    MapReduce") that replaces diameter-many plain min-propagation
    rounds. The pointer jump is a self-join of the label table — the
    doubling step plain propagation lacks. The in-query `converged`
    certificate (one extra propagation step changes nothing) proves
    the fixed round count sufficed; the oracle reaches the same
    fixpoint by 6 unrolled plain min-propagation CTEs.

    Scale shape: per round, one edges⋈labels hash join + one
    per-node min aggregate + one labels⋈labels pointer join — all
    keyed on node ids, lineage cut per round (localCheckpoint, the
    pagerank/kcore recipe). Rounds needed grow with log(diameter),
    not diameter.

    Reference basis: dedup-graph family (dedup_clusters r4 min-label
    CC, labelprop r12, kcore r12 — this adds the doubling
    acceleration that makes CC viable on high-diameter graphs)."""
    from sparkksqldbbenchmark_spark.llm.dedup import lsh_banded_buckets

    docs = load_table(spark, sf_dir, "documents")
    _, buckets = lsh_banded_buckets(
        docs, "text", "doc_id", num_hashes=16, bands=4
    )
    left = buckets.select(
        F.col("doc_id").alias("u"), "band_idx", "bh"
    )
    right = buckets.select(
        F.col("doc_id").alias("v"), "band_idx", "bh"
    )
    pairs = (
        left.join(right, ["band_idx", "bh"])
        .where(F.col("u") < F.col("v"))
        .select("u", "v")
        .dropDuplicates(["u", "v"])
    )
    # r18 (guide §2.4, the cluster.py recipe): pin the edge checkpoint
    # on the gather key v — every round's edges⋈labels join and the
    # certificate join are then exchange-free on the edge side (the
    # unpartitioned checkpoint was re-exchanged every round).
    edges = (
        pairs.unionByName(
            pairs.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        .repartition(F.col("v"))
        .localCheckpoint(eager=True)
    )
    labels = edges.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("p")
    )
    for _ in range(2):
        nbr_min = (
            edges.join(
                labels.select(
                    F.col("node").alias("v"), F.col("p").alias("pv")
                ),
                "v",
            )
            .groupBy(F.col("u").alias("node"))
            .agg(F.min("pv").alias("nm"))
        )
        stepped = labels.join(nbr_min, "node", "left").select(
            "node",
            F.least(
                "p", F.coalesce("nm", F.col("p"))
            ).alias("p"),
        )
        # pointer jump: p := p(p). `stepped` feeds BOTH sides of the
        # jump self-join — barrier it (r18) so the propagation
        # join+aggregate above runs once, not twice.
        stepped = stepped.localCheckpoint(eager=True)
        labels = (
            stepped.join(
                stepped.select(
                    F.col("node").alias("p"), F.col("p").alias("pp")
                ),
                "p",
            )
            .select("node", F.col("pp").alias("p"))
            .localCheckpoint(eager=True)
        )
    # convergence certificate: one more plain min step is a no-op
    extra = (
        edges.join(
            labels.select(F.col("node").alias("v"), F.col("p").alias("pv")),
            "v",
        )
        .groupBy(F.col("u").alias("node"))
        .agg(F.min("pv").alias("nm"))
    )
    final = labels.join(extra, "node", "left").select(
        "node",
        "p",
        (F.least("p", F.coalesce("nm", F.col("p"))) == F.col("p")).alias(
            "stable"
        ),
    )
    return final.groupBy(
        F.col("p").cast("long").alias("component")
    ).agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min("node").cast("long").alias("min_doc_id"),
        F.max("node").cast("long").alias("max_doc_id"),
        F.bool_and("stable").alias("converged"),
    )


# ------------------------------------ IVF cell balance --


def _cell_balance_oracle(num_planes: int = 5, dim: int = 64) -> str:
    from sparkksqldbbenchmark_spark.plans.llm_queries import (
        _planes_values,
        _sql_dot,
    )

    return f"""
    WITH base AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        FROM embeddings
    ), buckets AS (
        SELECT n.vec_id,
               SUM(CASE WHEN {_sql_dot("n.vec", "p.pvec", dim)} >= 0.0
                        THEN (1::BIGINT << p.pid) ELSE 0::BIGINT END)
                   AS bucket
        FROM base n, {_planes_values(num_planes, dim)}
        GROUP BY n.vec_id
    ), cells AS (
        SELECT bucket, count(*) AS n_vecs,
               (SELECT count(*) FROM base) AS total
        FROM buckets GROUP BY bucket
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(n_vecs AS BIGINT) AS n_vecs,
           CAST((n_vecs * 1000000) // ((total + 31) // 32) AS BIGINT)
               AS occupancy_e6
    FROM cells
    """


@query(
    "ivf_cell_balance_audit", oracle=_cell_balance_oracle()
)
def ivf_cell_balance_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """IVF/LSH CELL-BALANCE AUDIT — per-cell occupancy of the 32-cell
    hyperplane quantizer relative to the ideal ceil(n/32) load: the
    health check every ANN index needs before query routing commits
    to it (a hot cell makes its probes scan-bound; empty cells waste
    recall). occupancy_e6 > 1e6 marks overloaded cells exactly.

    Scale shape: the bucket id is a scan-fused codegen expression
    (5 sign tests, no shuffle); one 32-cell aggregate + the scalar
    total broadcast. The audit costs one scan regardless of corpus
    size.

    Reference basis: similarity family (similarity_ann_lsh r4,
    ivf_recall_certified r7 — this adds the index-health certificate
    their routing assumes)."""
    from sparkksqldbbenchmark_spark.llm import similarity

    planes = similarity.hyperplanes(5, 64)
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> CAST(x AS DOUBLE))"
        ).alias("vec"),
    )
    buckets = base.select(
        "vec_id",
        F.expr(similarity.lsh_bucket_col("vec", planes)).alias("bucket"),
    )
    total = buckets.agg(F.count(F.lit(1)).alias("total"))
    cells = buckets.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_vecs")
    )
    return (
        cells.crossJoin(F.broadcast(total))
        .select(
            F.col("bucket").cast("long"),
            F.col("n_vecs").cast("long"),
            F.expr("(n_vecs * 1000000) DIV ((total + 31) DIV 32)")
            .cast("long")
            .alias("occupancy_e6"),
        )
    )


# ------------------------------------ SCD2 temporal lookup --


@query(
    "scd2_temporal_lookup_join",
    oracle="""
    WITH dim AS (
        SELECT o_custkey AS ck, o_orderdate AS t,
               max_by(o_orderpriority, o_orderkey) AS prio
        FROM orders GROUP BY o_custkey, o_orderdate
    ),
    fact AS (
        SELECT o.o_custkey AS ck, l.l_shipdate AS t,
               CAST(floor(l.l_extendedprice * 100) AS BIGINT) AS cents
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT coalesce(d.prio, 'UNMATCHED') AS version_priority,
           count(*) AS n_lineitems,
           CAST(sum(f.cents) AS BIGINT) AS price_cents
    FROM fact f ASOF LEFT JOIN dim d
      ON f.ck = d.ck AND f.t >= d.t
    GROUP BY 1
    """,
)
def scd2_temporal_lookup_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SCD2 POINT-IN-TIME dimension lookup — every lineitem enriched
    with the customer's order-priority VERSION valid at its ship
    date (versions = the customer's order history, deduplicated to
    one attribute per (customer, date) by the max-orderkey rule):
    the temporal dimension join behind every slowly-changing-
    dimension star schema, with UNMATCHED accounting for facts that
    predate the first version. DuckDB's native ASOF LEFT JOIN is the
    oracle — the engine-level contract our union-tag operator must
    match, including the >= equality edge.

    Scale shape: version table built by one (ck, date) aggregate;
    the lookup is the asof_join operator (union-tag + last-carry —
    ONE shuffle on the customer key, no inequality join, no
    per-interval explode); rollup is priority-bounded.

    Reference basis: as-of family (asof_join_latest_view r3,
    asof_tolerance r8, feature_store_pit_join r12 — this is the SCD2
    dimension-enrichment form with left-outer unmatched semantics)."""
    from sparkksqldbbenchmark_spark.operators.joins import asof_join

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    dim = orders.groupBy(
        F.col("o_custkey").alias("ck"),
        F.col("o_orderdate").alias("t"),
    ).agg(
        F.expr("max_by(o_orderpriority, o_orderkey)").alias("prio")
    )
    fact = lineitem.join(
        orders.select("o_orderkey", "o_custkey"),
        lineitem.l_orderkey == orders.o_orderkey,
    ).select(
        F.col("o_custkey").alias("ck"),
        F.col("l_shipdate").alias("t"),
        F.floor(F.col("l_extendedprice") * 100)
        .cast("long")
        .alias("cents"),
    )
    joined = asof_join(
        fact, dim, on=["ck"], ts_col="t", payload_cols=["prio"]
    )
    return joined.groupBy(
        F.coalesce("prio", F.lit("UNMATCHED")).alias("version_priority")
    ).agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        F.sum("cents").cast("long").alias("price_cents"),
    )


# ------------------------------------ array_sort comparator --


@query(
    "array_sort_comparator_suite",
    oracle="""
    WITH toks AS (
        SELECT doc_id, source, t.tok
        FROM (
            SELECT doc_id, source,
                   string_split(text, ' ')[1:12] AS ts
            FROM documents
        ), LATERAL (SELECT unnest(ts) AS tok) t
    ),
    per_doc AS (
        SELECT doc_id, source,
               string_agg(tok, '|' ORDER BY len(tok) DESC, tok ASC)
                   AS joined
        FROM toks GROUP BY doc_id, source
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(('0x' || substring(md5(joined), 1, 15))::BIGINT
                    % 1000000007) AS BIGINT) AS checksum
    FROM per_doc GROUP BY source
    """,
)
def array_sort_comparator_suite(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """array_sort with a CUSTOM LAMBDA COMPARATOR — tokens ordered by
    (length DESC, lexical ASC), a total order no plain sort key
    expresses without a transform round-trip: the comparator form is
    the HOF surface's last uncovered corner (transform/filter/
    aggregate/zip_with are graded; the -1/0/1 comparator contract is
    not). The oracle re-derives each doc's ordering relationally
    (unnest + ORDER BY + string_agg) — comparator bugs (asymmetry,
    missing 0 case) break the per-source md5 checksums.

    Scale shape: per-row array work fused into the scan; the
    checksum rollup is source-bounded. Comparator lambdas are
    interpreted per comparison (not codegen) — the docstring's
    costed caveat: for hot paths, express orderings as sort keys
    (transform + array_sort) when possible; this row pins the
    semantics for when you can't.

    Reference basis: SURVEY §2.10/§2.8 HOF surface (hof_function_
    suite r7, hof_suite2 r12-cohort — comparator form completes
    it)."""
    docs = load_table(spark, sf_dir, "documents")
    sorted_arr = F.expr(
        "array_sort(slice(split(text, ' '), 1, 12), (l, r) ->"
        " CASE WHEN length(l) > length(r) THEN -1"
        "      WHEN length(l) < length(r) THEN 1"
        "      WHEN l < r THEN -1 WHEN l > r THEN 1 ELSE 0 END)"
    )
    from sparkksqldbbenchmark_spark.llm.hashing import spark_md5_int

    per_doc = docs.select(
        "source",
        F.array_join(sorted_arr, "|").alias("joined"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.expr(f"({spark_md5_int('joined')}) % 1000000007"))
        .cast("long")
        .alias("checksum"),
    )


# ------------------------------------ grouping_id bitmask --


@query(
    "grouping_id_bitmask_report",
    oracle="""
    SELECT coalesce(event_type, '__ALL__') AS event_type,
           CAST(coalesce(hod, -1) AS BIGINT) AS hod,
           CAST(2 * grouping(event_type) + grouping(hod) AS BIGINT)
               AS gid,
           count(*) AS n,
           CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
               AS cents_sum
    FROM (
        SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod, value
        FROM events
    )
    GROUP BY GROUPING SETS ((event_type, hod), (event_type),
                            (hod), ())
    """,
)
def grouping_id_bitmask_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """GROUPING_ID() BITMASK over asymmetric GROUPING SETS — the
    compact provenance encoding (bit i set = column i rolled up)
    report consumers use to route subtotal rows, graded against the
    oracle's 2·grouping(a)+grouping(b) spelling (DuckDB's GROUPING
    is per-column; the bitmask is the composed form). NULL group
    keys are disambiguated from rolled-up keys by the coalesce
    sentinels + the bitmask itself — the exact trap GROUPING_ID
    exists to solve.

    Scale shape: one Expand (4 grouping sets) + one hash aggregate —
    partial aggregation applies per set; output bounded by
    types × hours.

    Reference basis: SURVEY §2.4 reshape family
    (grouping_sets_report r4 pins GROUPING() markers; this pins the
    composed bitmask contract)."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        F.hour("ts").cast("long").alias("hod"),
        "value",
    )
    base.createOrReplaceTempView("__gid_base")
    return spark.sql(
        """
        SELECT coalesce(event_type, '__ALL__') AS event_type,
               CAST(coalesce(hod, -1) AS BIGINT) AS hod,
               CAST(grouping_id(event_type, hod) AS BIGINT) AS gid,
               count(*) AS n,
               CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents_sum
        FROM __gid_base
        GROUP BY GROUPING SETS ((event_type, hod), (event_type),
                                (hod), ())
        """
    )


# ------------------------------------ subject access export --


@query(
    "subject_access_export",
    oracle="""
    WITH subjects AS (
        SELECT c_custkey AS ck, c_mktsegment AS segment
        FROM customer WHERE c_custkey % 97 = 0
    ),
    order_recs AS (
        SELECT s.ck, s.segment, 'orders' AS record_type,
               count(*) AS n_records,
               CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents_sum
        FROM subjects s JOIN orders o ON o.o_custkey = s.ck
        GROUP BY s.ck, s.segment
    ),
    line_recs AS (
        SELECT s.ck, s.segment, 'lineitem' AS record_type,
               count(*) AS n_records,
               CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS cents_sum
        FROM subjects s
        JOIN orders o ON o.o_custkey = s.ck
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY s.ck, s.segment
    )
    SELECT ck AS custkey, segment, record_type, n_records, cents_sum
    FROM order_recs
    UNION ALL
    SELECT ck, segment, record_type, n_records, cents_sum
    FROM line_recs
    """,
)
def subject_access_export(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SUBJECT ACCESS EXPORT (GDPR Art. 15) — for a deterministic
    subject set, every table's records about the subject gathered
    with per-table provenance: the multi-table union that a
    right-to-access request materializes, sibling to the graduated
    right_to_erasure_cascade (which deletes what this enumerates).
    Lineitems reach the subject through the order foreign key — the
    same cascade path the erasure row walks.

    Scale shape: the subject set is a scan-side filter broadcast
    into each fact join (semi-join pattern per table); per-table
    rollups then union a provenance-typed frame. Adding tables adds
    joins, never widens existing ones.

    Reference basis: ops/compliance family
    (right_to_erasure_cascade r12, dq_expectation_audit r12 — the
    access leg of the same compliance surface)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    subjects = customer.where(F.col("c_custkey") % 97 == 0).select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_mktsegment").alias("segment"),
    )
    ords = orders.join(
        F.broadcast(subjects),
        orders.o_custkey == subjects.custkey,
    )
    order_recs = ords.groupBy("custkey", "segment").agg(
        F.count(F.lit(1)).alias("n_records"),
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents_sum"),
    ).select(
        "custkey",
        "segment",
        F.lit("orders").alias("record_type"),
        "n_records",
        "cents_sum",
    )
    line_recs = (
        lineitem.join(
            ords.select("o_orderkey", "custkey", "segment"),
            lineitem.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("custkey", "segment")
        .agg(
            F.count(F.lit(1)).alias("n_records"),
            F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("cents_sum"),
        )
        .select(
            "custkey",
            "segment",
            F.lit("lineitem").alias("record_type"),
            "n_records",
            "cents_sum",
        )
    )
    return order_recs.unionByName(line_recs)


# ------------------------------------ watermark late drop --


@query(
    "streaming_watermark_late_drop",
    oracle="""
    WITH d0 AS (
        SELECT date_trunc('day', min(ts)) AS t0 FROM events
    ),
    a AS (
        SELECT ts, event_type FROM events, d0
        WHERE ts >= d0.t0 AND ts < d0.t0 + INTERVAL 1 DAY
    ),
    wm AS (SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM a),
    b AS (
        SELECT time_bucket(INTERVAL 15 MINUTE, ts) AS ws, event_type
        FROM a
    )
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*) AS n
    FROM b, wm
    WHERE ws + INTERVAL 15 MINUTE <= wm.w
    GROUP BY ws, event_type
    """,
)
def streaming_watermark_late_drop(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """WATERMARK LATE-DATA DROP, value-graded — the T4 semantics the
    reference never tests: a two-file ordered stream (mtime-forced,
    maxFilesPerTrigger=1) delivers one on-time batch (hour 0 of the
    corpus) and then one batch of DELIBERATELY LATE rows (hour-1
    events shifted back two hours, so every one lands below the
    watermark set by batch 1). On-time = day 1 of the corpus; late =
    day-2 events shifted back two days. The late rows' windows end
    BEFORE the
    final watermark — so if the engine failed to drop them they
    WOULD be emitted and the value hash would change: the drop is
    observable, not vacuous. Emitted set = on-time 15-minute windows
    closed by the final watermark (max on-time ts − 10 min), the
    same closed-set rule the graded streaming_watermarked_append /
    chained rows pin.

    Scale shape: standard watermarked tumbling aggregate — state
    bounded by open windows; the late-drop filter is exactly what
    caps state at 100 TB ingest (without it, stragglers pin every
    historical window open).

    Reference basis: SURVEY §2.9 T4 (watermark extension) — the
    drop semantics graded value-for-value for the first time;
    deterministic batching via ordered file delivery (the T6
    checkpoint row's fixture technique)."""
    import os
    import shutil
    import tempfile
    import uuid

    from sparkksqldbbenchmark_spark.streaming.pipeline import (
        run_to_memory,
    )

    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("day", F.min("ts")).alias("t0")
    )
    evb = ev.crossJoin(F.broadcast(bounds))
    on_time = evb.where(
        (F.col("ts") >= F.col("t0"))
        & (F.col("ts") < F.col("t0") + F.expr("INTERVAL 1 DAY"))
    ).select("ts", "event_type", "event_id")
    # Spark filters late input with the PREVIOUS batch's watermark
    # (one-batch lag, measured on 4.1.2: a late row arriving in the
    # batch right after the advancing data is still accepted and its
    # closed window emitted). So the fixture delivers THREE batches:
    # all-but-latest on-time rows, then the single latest on-time row
    # (watermark now set for filtering), then the late rows — which
    # the drop metric must reject.
    wlast = Window.orderBy(F.desc("ts"), F.desc("event_id"))
    marked = on_time.withColumn(
        "__rk", F.row_number().over(wlast)
    )
    a_head = marked.where(F.col("__rk") > 1).select(
        "ts", "event_type"
    )
    a_tail = marked.where(F.col("__rk") == 1).select(
        "ts", "event_type"
    )
    late = evb.where(
        (F.col("ts") >= F.col("t0") + F.expr("INTERVAL 1 DAY"))
        & (F.col("ts") < F.col("t0") + F.expr("INTERVAL 2 DAY"))
    ).select(
        (F.col("ts") - F.expr("INTERVAL 2 DAY")).alias("ts"),
        "event_type",
    )
    base = tempfile.mkdtemp(prefix="wmdrop_")
    try:
        sdir = os.path.join(base, "stream")
        os.makedirs(sdir)
        for i, part_df in enumerate((a_head, a_tail, late)):
            tmp = os.path.join(base, f"part{i}")
            part_df.coalesce(1).write.mode("overwrite").parquet(tmp)
            part = [
                f for f in os.listdir(tmp) if f.endswith(".parquet")
            ][0]
            dst = os.path.join(sdir, f"file{i}.parquet")
            shutil.copy(os.path.join(tmp, part), dst)
            os.utime(dst, (1_700_000_000 + i * 60,) * 2)
        stream = (
            spark.readStream.schema("ts timestamp, event_type string")
            .option("maxFilesPerTrigger", "1")
            .parquet(sdir)
        )
        agged = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(
                F.window("ts", "15 minutes").alias("w"), "event_type"
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .select(
                F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                    "window_start"
                ),
                "event_type",
                "n",
            )
        )
        name = f"wmdrop_{uuid.uuid4().hex[:8]}"
        q = run_to_memory(agged, name, output_mode="append")
        q.stop()
    finally:
        # fixture dir cleanup: the memory sink materializes rows
        # during the run, so the source files are disposable after
        # stop() (verified source-independent; VERDICT r14 item #2)
        shutil.rmtree(base, ignore_errors=True)
    return spark.table(name)


# ------------------------------------ k-means++ D2 seeding --


def _kmeanspp_oracle(k: int = 3) -> str:
    from sparkksqldbbenchmark_spark.llm.hashing import sql_md5_int

    def hexpr(step: int, alias: str = "vec_id") -> str:
        return (
            "(("
            + sql_md5_int(
                f"'{step}#' || CAST({alias} AS VARCHAR)"
            )
            + ") % 1048576)"
        )

    sql = f"""
    WITH comp AS (
        SELECT vec_id, t.j, CAST(floor(t.e * 1000) AS BIGINT) AS q
        FROM embeddings,
             LATERAL (SELECT generate_subscripts(embedding, 1) AS j,
                             unnest(embedding) AS e) t
    ),
    nrm AS (
        SELECT vec_id, CAST(sum(q * q) AS BIGINT) AS n2
        FROM comp GROUP BY vec_id
    ),
    c1 AS (
        SELECT vec_id, {hexpr(1)} AS metric FROM nrm
        ORDER BY metric DESC, vec_id LIMIT 1
    ),
    d1 AS (
        SELECT n.vec_id,
               n.n2 + (SELECT n2 FROM nrm
                       WHERE vec_id = (SELECT vec_id FROM c1))
                 - 2 * coalesce(dt.dot, 0) AS d
        FROM nrm n LEFT JOIN (
            SELECT a.vec_id, CAST(sum(a.q * b.q) AS BIGINT) AS dot
            FROM comp a JOIN comp b
              ON a.j = b.j AND b.vec_id = (SELECT vec_id FROM c1)
            GROUP BY a.vec_id
        ) dt ON dt.vec_id = n.vec_id
    )"""
    prev = "d1"
    chosen = ["(SELECT vec_id FROM c1)"]
    for i in range(2, k + 1):
        excl = ", ".join(chosen)
        sql += f""",
    c{i} AS (
        SELECT vec_id, ({hexpr(i)} + 1) * d AS metric FROM {prev}
        WHERE vec_id NOT IN ({excl})
        ORDER BY metric DESC, vec_id LIMIT 1
    )"""
        chosen.append(f"(SELECT vec_id FROM c{i})")
        if i < k:
            sql += f""",
    d{i} AS (
        SELECT m.vec_id,
               least(m.d,
                     (SELECT n2 FROM nrm
                      WHERE vec_id = (SELECT vec_id FROM c{i}))
                     + (SELECT n2 FROM nrm n
                        WHERE n.vec_id = m.vec_id)
                     - 2 * coalesce(dt.dot, 0)) AS d
        FROM {prev} m LEFT JOIN (
            SELECT a.vec_id, CAST(sum(a.q * b.q) AS BIGINT) AS dot
            FROM comp a JOIN comp b
              ON a.j = b.j AND b.vec_id = (SELECT vec_id FROM c{i})
            GROUP BY a.vec_id
        ) dt ON dt.vec_id = m.vec_id
    )"""
            prev = f"d{i}"
    selects = [
        "SELECT CAST(1 AS BIGINT) AS step, CAST(vec_id AS BIGINT)"
        " AS vec_id, CAST(metric AS BIGINT) AS metric FROM c1"
    ] + [
        f"SELECT CAST({i} AS BIGINT), CAST(vec_id AS BIGINT),"
        f" CAST(metric AS BIGINT) FROM c{i}"
        for i in range(2, k + 1)
    ]
    return sql + "\n    " + "\n    UNION ALL ".join(selects)


@query(
    "kmeanspp_d2_seeding_derandomized", oracle=_kmeanspp_oracle(3)
)
def kmeanspp_d2_seeding_derandomized(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """k-means++ D² SEEDING, derandomized — the probabilistic seeding
    (next centroid sampled ∝ squared distance to the chosen set) made
    exactly reproducible: each step draws a step-salted 20-bit md5
    key per vector and picks argmax(key·D²) — the fixed-key analogue
    of weighted sampling (heavier D² still wins in expectation, and
    the same corpus always yields the same seeds). First seed =
    argmax of the step-1 key alone (the uniform draw). Counterpart of
    the farthest-point row: extremal vs weighted-random seeding, side
    by side.

    Scale shape: identical to farthest_point_init_quantized — per
    step one broadcast component-join dot + a 1-row argmax, k steps,
    no pairwise matrix, no driver collect.

    Reference basis: clustering family (farthest_point staged,
    kmeans_lloyd_step r12 — completes the seeding pair)."""
    from sparkksqldbbenchmark_spark.llm.hashing import spark_md5_int

    emb = load_table(spark, sf_dir, "embeddings")
    comp = emb.select(
        "vec_id", F.posexplode("embedding").alias("j", "e")
    ).select(
        "vec_id",
        "j",
        F.floor(F.col("e").cast("double") * 1000).cast("long").alias("q"),
    )
    nrm = comp.groupBy("vec_id").agg(
        F.sum(F.col("q") * F.col("q")).cast("long").alias("n2")
    )

    def h20(step: int) -> F.Column:
        return F.expr(
            "(("
            + spark_md5_int(
                f"'{step}#' || CAST(vec_id AS STRING)"
            )
            + ") % 1048576)"
        )

    pick1 = (
        nrm.select("vec_id", h20(1).alias("metric"))
        .agg(
            F.expr(
                "min_by(struct(vec_id, metric), struct(-metric, vec_id))"
            ).alias("s")
        )
        .select(
            F.lit(1).cast("long").alias("step"),
            F.col("s.vec_id").alias("vec_id"),
            F.col("s.metric").cast("long").alias("metric"),
        )
    )

    def dist_to(chosen):
        ccomp = comp.join(
            F.broadcast(chosen.select("vec_id")), "vec_id"
        ).select("j", F.col("q").alias("cq"))
        cn2 = nrm.join(
            F.broadcast(chosen.select("vec_id")), "vec_id"
        ).select(F.col("n2").alias("cn2"))
        dot = (
            comp.join(F.broadcast(ccomp), "j")
            .groupBy("vec_id")
            .agg(F.sum(F.col("q") * F.col("cq")).alias("dot"))
        )
        return (
            nrm.join(dot, "vec_id", "left")
            .crossJoin(F.broadcast(cn2))
            .select(
                "vec_id",
                (
                    F.col("n2")
                    + F.col("cn2")
                    - 2 * F.coalesce(F.col("dot"), F.lit(0))
                ).alias("d"),
            )
        )

    picks = [pick1]
    chosen_ids = pick1.select("vec_id")
    mind = dist_to(pick1)
    for i in (2, 3):
        cand = (
            mind.join(chosen_ids, "vec_id", "left_anti")
            .select(
                "vec_id",
                ((h20(i) + 1) * F.col("d")).alias("metric"),
            )
        )
        pick = cand.agg(
            F.expr(
                "min_by(struct(vec_id, metric), struct(-metric, vec_id))"
            ).alias("s")
        ).select(
            F.lit(i).cast("long").alias("step"),
            F.col("s.vec_id").alias("vec_id"),
            F.col("s.metric").cast("long").alias("metric"),
        )
        picks.append(pick)
        chosen_ids = chosen_ids.unionByName(pick.select("vec_id"))
        if i < 3:
            nd = dist_to(pick).withColumnRenamed("d", "nd")
            # lineage cut per step (the pagerank/kcore recipe)
            mind = mind.join(nd, "vec_id").select(
                "vec_id", F.least("d", "nd").alias("d")
            ).localCheckpoint(eager=True)
    out = picks[0]
    for p in picks[1:]:
        out = out.unionByName(p)
    return out


# ------------------------------------ multi-probe LSH recall --


def _multiprobe_oracle(num_planes: int = 5, dim: int = 64) -> str:
    from sparkksqldbbenchmark_spark.plans.llm_queries import (
        _planes_values,
        _sql_dot,
    )

    return f"""
    WITH base AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec,
               list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 1000)
                             AS BIGINT)) AS qz
        FROM embeddings
    ), buckets AS (
        SELECT n.vec_id,
               SUM(CASE WHEN {_sql_dot("n.vec", "p.pvec", dim)} >= 0.0
                        THEN (1::BIGINT << p.pid) ELSE 0::BIGINT END)
                   AS bucket
        FROM base n, {_planes_values(num_planes, dim)}
        GROUP BY n.vec_id
    ), nb AS (
        SELECT b.vec_id, b.qz, k.bucket
        FROM base b JOIN buckets k ON b.vec_id = k.vec_id
    ), queries AS (
        SELECT * FROM nb WHERE vec_id % 25 = 0
    ), probe_cells AS (
        SELECT q.vec_id AS qid, q.qz AS qqz,
               CASE WHEN f.f = 0 THEN q.bucket
                    ELSE xor(q.bucket, (1::BIGINT << (f.f - 1))) END
                   AS cell
        FROM queries q, (SELECT unnest(range(0, 6)) AS f) f
    ), cand AS (
        SELECT p.qid,
               c.vec_id AS cid,
               (SELECT CAST(sum(a.q * b.q) AS BIGINT)
                FROM (SELECT generate_subscripts(p.qqz, 1) AS j,
                             unnest(p.qqz) AS q) a
                JOIN (SELECT generate_subscripts(c.qz, 1) AS j,
                             unnest(c.qz) AS q) b ON a.j = b.j) AS dot
        FROM probe_cells p JOIN nb c ON c.bucket = p.cell
        WHERE c.vec_id != p.qid
    ), mp_nn AS (
        SELECT qid, count(*) AS n_cands,
               first(cid ORDER BY dot DESC, cid ASC) AS nn
        FROM (SELECT DISTINCT qid, cid, dot FROM cand)
        GROUP BY qid
    ), exact_nn AS (
        SELECT q.vec_id AS qid,
               first(c.vec_id ORDER BY
                   (SELECT CAST(sum(a.q * b.q) AS BIGINT)
                    FROM (SELECT generate_subscripts(q.qz, 1) AS j,
                                 unnest(q.qz) AS q) a
                    JOIN (SELECT generate_subscripts(c.qz, 1) AS j,
                                 unnest(c.qz) AS q) b ON a.j = b.j)
                   DESC, c.vec_id ASC) AS nn
        FROM queries q JOIN nb c ON c.vec_id != q.vec_id
        GROUP BY q.vec_id
    )
    SELECT (SELECT count(*) FROM queries) AS n_queries,
           CAST(count(m.qid) AS BIGINT) AS n_with_candidates,
           CAST(sum(CASE WHEN m.nn = e.nn THEN 1 ELSE 0 END)
                AS BIGINT) AS n_recall_hits,
           CAST(sum(m.n_cands) AS BIGINT) AS total_candidates
    FROM exact_nn e LEFT JOIN mp_nn m ON e.qid = m.qid
    """


@query(
    "multi_probe_lsh_recall_certified", oracle=_multiprobe_oracle()
)
def multi_probe_lsh_recall_certified(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MULTI-PROBE LSH with a recall certificate — each query scans
    its own hyperplane cell PLUS the 5 single-bit-flip neighbor
    cells (the Lv et al. multi-probe idea: perturb the code instead
    of building more tables), and the row grades recall@1 against
    the EXACT nearest neighbor computed in the same query: the
    recall-vs-candidates operating point, measured not assumed.
    Nearest = max quantized-integer dot, tie → lowest id, both arms.

    Scale shape: probing multiplies the bounded query side by 6 —
    the corpus is still touched via the bucket equi-join only; the
    exact arm is the bounded-probe broadcast scan (the knn_loo
    contract). At 100 TB the exact arm becomes a sampled audit; the
    probe arm is the production path.

    Reference basis: similarity family (ann_recall_certified r6,
    ivf_recall_certified r7 — this adds the multi-probe recall
    lever)."""
    from sparkksqldbbenchmark_spark.llm import similarity

    planes = similarity.hyperplanes(5, 64)
    emb = load_table(spark, sf_dir, "embeddings")
    qz = F.expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)"
        " * 1000) AS BIGINT))"
    )
    base = emb.select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> CAST(x AS DOUBLE))"
        ).alias("vec"),
        qz.alias("qz"),
    ).withColumn(
        "bucket",
        F.expr(similarity.lsh_bucket_col("vec", planes)),
    ).drop("vec")
    queries = base.where(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("qz").alias("qqz"),
        F.col("bucket").alias("qbucket"),
    )
    flips = spark.range(0, 6).select(F.col("id").alias("f"))
    probe_cells = (
        queries.crossJoin(F.broadcast(flips))
        .select(
            "qid",
            "qqz",
            F.when(F.col("f") == 0, F.col("qbucket"))
            .otherwise(
                F.expr("qbucket ^ shiftleft(1L, cast(f - 1 as int))")
            )
            .alias("cell"),
        )
    )
    dot = F.expr(
        "aggregate(zip_with(qqz, qz, (a, b) -> a * b),"
        " 0L, (acc, x) -> acc + x)"
    )
    cand = (
        base.join(
            F.broadcast(probe_cells),
            base.bucket == probe_cells.cell,
        )
        .where(F.col("vec_id") != F.col("qid"))
        .select("qid", F.col("vec_id").alias("cid"), dot.alias("dot"))
        .dropDuplicates(["qid", "cid"])
    )
    mp_nn = cand.groupBy("qid").agg(
        F.count(F.lit(1)).alias("n_cands"),
        F.expr("min_by(cid, struct(-dot, cid))").alias("nn"),
    )
    exact = (
        base.crossJoin(
            F.broadcast(queries.select("qid", "qqz"))
        )
        .where(F.col("vec_id") != F.col("qid"))
        .select("qid", F.col("vec_id").alias("cid"), dot.alias("dot"))
        .groupBy("qid")
        .agg(F.expr("min_by(cid, struct(-dot, cid))").alias("exact_nn"))
    )
    joined = exact.join(mp_nn, "qid", "left")
    return joined.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.count("nn").cast("long").alias("n_with_candidates"),
        F.sum(
            F.when(F.col("nn") == F.col("exact_nn"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_recall_hits"),
        F.sum("n_cands").cast("long").alias("total_candidates"),
    )


# ------------------------------------ repeated-span cut plan --


@query(
    "repeated_span_cut_plan",
    oracle="""
    WITH pos AS (
        SELECT d.source, d.doc_id, CAST(p.p AS BIGINT) AS p,
               substring(d.text, CAST(p.p AS INTEGER), 16) AS w
        FROM documents d,
             LATERAL (SELECT unnest(range(1, len(d.text) + 1)) AS p) p
        WHERE len(d.text) - p.p + 1 >= 16
    ),
    dupw AS (
        SELECT source, w FROM pos
        GROUP BY source, w HAVING count(*) >= 2
    ),
    cuts AS (
        SELECT pos.source, pos.doc_id, pos.p AS s, pos.p + 16 AS e
        FROM pos JOIN dupw USING (source, w)
    ),
    marked AS (
        SELECT source, doc_id, s, e,
               CASE WHEN s > coalesce(max(e) OVER (
                        PARTITION BY doc_id ORDER BY s
                        ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING), -1)
                    THEN 1 ELSE 0 END AS is_new
        FROM cuts
    ),
    islands AS (
        SELECT source, doc_id, s, e,
               sum(is_new) OVER (
                   PARTITION BY doc_id ORDER BY s
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS island
        FROM marked
    ),
    merged AS (
        SELECT source, doc_id, island,
               min(s) AS lo, max(e) AS hi
        FROM islands GROUP BY 1, 2, 3
    ),
    per_doc AS (
        SELECT source, doc_id,
               count(*) AS n_islands,
               sum(hi - lo) AS cut
        FROM merged GROUP BY 1, 2
    ),
    totals AS (
        SELECT source,
               count(*) AS n_docs,
               CAST(sum(len(text)) AS BIGINT) AS total_chars
        FROM documents GROUP BY source
    )
    SELECT t.source,
           t.n_docs,
           CAST(count(pd.doc_id) AS BIGINT) AS docs_affected,
           CAST(coalesce(sum(pd.n_islands), 0) AS BIGINT)
               AS n_cut_intervals,
           CAST(coalesce(sum(pd.cut), 0) AS BIGINT) AS cut_chars,
           CAST(t.total_chars - coalesce(sum(pd.cut), 0) AS BIGINT)
               AS kept_chars,
           CAST(coalesce(max(pd.cut), 0) AS BIGINT) AS max_doc_cut
    FROM totals t LEFT JOIN per_doc pd ON pd.source = t.source
    GROUP BY t.source, t.n_docs, t.total_chars
    """,
)
def repeated_span_cut_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-DOCUMENT SPAN CUTTING — the removal plan exact-substring
    dedup actually executes (Lee et al. 2022: delete every character
    covered by a duplicated length-16 window). A position p in a doc
    is cut when its 16-char window occurs >= 2 times within the
    source; overlapping cut windows merge into islands (the
    doc_span_interval_union machinery on REAL spans, closing the loop
    the longest_repeated_substring_extract row opened: that row finds
    WHAT repeats, this one decides what a cut pass would remove and
    what survives). Output per source: docs affected, merged cut
    intervals, characters cut vs kept, and the worst single-doc cut.

    Scale shape: duplicate-window detection is one groupBy on
    (source, 16-char window) — the hash-shuffle the Lee et al.
    pipeline does at corpus scale; the join back is the same
    equi-join; island-merge windows run per doc over that doc's cut
    positions only (document-grain frames, like sessionize); the
    rollup is per-source. No global sort, no all-pairs anywhere.

    Reference basis: text-dedup family (exact_substring_spans r9 finds
    windowed-hash spans; suffix_lcp_repeat_stats /
    longest_repeated_substring_extract staged mine the repeats — this
    is the cut-plan consumer their output feeds)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", "text"
    )
    pos = docs.select(
        "source",
        "doc_id",
        F.explode(
            F.expr(
                "case when length(text) >= 16"
                " then sequence(1, length(text) - 15)"
                " else array() end"
            )
        ).alias("p"),
        "text",
    ).select(
        "source",
        "doc_id",
        F.col("p").cast("long").alias("p"),
        F.expr("substring(text, p, 16)").alias("w"),
    )
    dupw = (
        pos.groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= 2)
        .select("source", "w")
    )
    # dup-window set scales with repeated text volume — never assume
    # broadcastable (the tpch_q3 lesson): pin the spill-safe shuffled
    # merge join (a hash build of the window set can exceed task
    # memory — measured at sf0.1 under the 8-partition check session).
    cuts = pos.join(dupw.hint("merge"), ["source", "w"]).select(
        "source",
        "doc_id",
        F.col("p").alias("s"),
        (F.col("p") + 16).alias("e"),
    )
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    marked = cuts.withColumn(
        "is_new",
        F.when(
            F.col("s") > F.coalesce(F.max("e").over(w_prev), F.lit(-1)),
            1,
        ).otherwise(0),
    )
    islands = marked.withColumn("island", F.sum("is_new").over(w_run))
    merged = islands.groupBy("source", "doc_id", "island").agg(
        F.min("s").alias("lo"), F.max("e").alias("hi")
    )
    per_doc = merged.groupBy("source", "doc_id").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum(F.col("hi") - F.col("lo")).alias("cut"),
    )
    totals = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).cast("long").alias("total_chars"),
    )
    # reduce the doc-grain frame to per-source partials BEFORE the
    # join with totals: bounded ⋈ bounded, no doc-grain broadcast.
    per_src = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("docs_affected"),
        F.sum("n_islands").cast("long").alias("n_cut_intervals"),
        F.sum("cut").cast("long").alias("cut_chars"),
        F.max("cut").cast("long").alias("max_doc_cut"),
    )
    return (
        totals.join(per_src, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("docs_affected", F.lit(0))
            .cast("long")
            .alias("docs_affected"),
            F.coalesce("n_cut_intervals", F.lit(0))
            .cast("long")
            .alias("n_cut_intervals"),
            F.coalesce("cut_chars", F.lit(0))
            .cast("long")
            .alias("cut_chars"),
            (
                F.col("total_chars")
                - F.coalesce("cut_chars", F.lit(0))
            )
            .cast("long")
            .alias("kept_chars"),
            F.coalesce("max_doc_cut", F.lit(0))
            .cast("long")
            .alias("max_doc_cut"),
        )
        .select(
            "source",
            "n_docs",
            "docs_affected",
            "n_cut_intervals",
            "cut_chars",
            "kept_chars",
            "max_doc_cut",
        )
    )


# -------------------------- prefix-filter exact set-sim join --


def _setsim_oracle(n: int = 3) -> str:
    from sparkksqldbbenchmark_spark.llm.hashing import sql_word_shingles

    sh = sql_word_shingles("text", n)
    return f"""
    WITH sets AS (
        SELECT doc_id, {sh} AS sh FROM documents
    ),
    tok AS (
        SELECT doc_id, unnest(sh) AS g FROM sets
    ),
    dfreq AS (
        SELECT g, count(*) AS df FROM tok GROUP BY g
    ),
    sz AS (
        SELECT doc_id, CAST(len(sh) AS BIGINT) AS n FROM sets
    ),
    ranked AS (
        SELECT t.doc_id, t.g, s.n,
               row_number() OVER (
                   PARTITION BY t.doc_id ORDER BY f.df, t.g
               ) AS rk
        FROM tok t
        JOIN dfreq f USING (g)
        JOIN sz s USING (doc_id)
    ),
    pfx AS (
        SELECT doc_id, g FROM ranked
        WHERE rk <= n - ((3 * n + 4) // 5) + 1
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
        FROM pfx a JOIN pfx b
          ON a.g = b.g AND a.doc_id < b.doc_id
    )
    SELECT c.da AS doc_a, c.db AS doc_b,
           CAST(len(list_intersect(x.sh, y.sh)) AS BIGINT)
               AS inter_shingles,
           CAST(len(x.sh) + len(y.sh)
                - len(list_intersect(x.sh, y.sh)) AS BIGINT)
               AS union_shingles,
           CAST(len(list_intersect(x.sh, y.sh)) * 1000000
                // (len(x.sh) + len(y.sh)
                    - len(list_intersect(x.sh, y.sh))) AS BIGINT)
               AS jacc_e6
    FROM cand c
    JOIN sets x ON x.doc_id = c.da
    JOIN sets y ON y.doc_id = c.db
    WHERE len(list_intersect(x.sh, y.sh)) * 1000000
          >= 600000 * (len(x.sh) + len(y.sh)
                       - len(list_intersect(x.sh, y.sh)))
    """


@query("setsim_prefix_filter_join", oracle=_setsim_oracle())
def setsim_prefix_filter_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXACT set-similarity self-join via PREFIX FILTERING (the
    AllPairs/PPJoin family, Bayardo et al. 2007 / Xiao et al. 2008):
    find every doc pair whose word-3-shingle Jaccard >= 0.6 with ZERO
    false negatives — the deterministic alternative to MinHash-LSH
    when recall must be 1.0. Shingles are ordered by ascending global
    document frequency (rarest first); a doc of n shingles indexes
    only its first n − ceil(0.6·n) + 1 (integer: n − (3n+4) DIV 5
    + 1). Completeness: the globally-smallest shared shingle of any
    qualifying pair must land in BOTH prefixes — if it fell outside
    one, that doc's overlap would be < ceil(0.6·n), contradicting
    J >= 0.6. Candidates sharing a prefix shingle are then verified
    with the exact intersection; Jaccard kept integer as
    (|∩|·10⁶) DIV |∪|.

    Scale shape: the inverted index is built on PREFIX shingles only
    (rare tokens → small postings); candidate generation is an
    equi-join on the shingle, never all-pairs; verification joins
    the bounded candidate set back to the two shingle arrays. The
    frequency ordering is one groupBy; per-doc ranking windows are
    document-grain (<= |shingles per doc| rows). This is exactly the
    plan the AllPairs paper runs at web scale.

    Reference basis: dedup family (dedup_minhash_lsh r12 flagship is
    the probabilistic path; dedup_ngram_jaccard r3 verifies LSH
    candidates — this is the exact-recall joiner the reference's
    dedup users need when LSH misses are unacceptable)."""
    from sparkksqldbbenchmark_spark.llm.hashing import (
        spark_word_shingles,
    )

    docs = load_table(spark, sf_dir, "documents")
    # r18 (guide §2.4/§5, the dedup_minhash recipe): the shingle
    # projection had FIVE consumers (tok twice, sz, both verify sides)
    # and no barrier — it re-tokenized the corpus per consumer. One
    # checkpoint pinned on doc_id makes the verify joins exchange- and
    # sort-free on the array side, and the heavy arrays cross the
    # network exactly once (inside the checkpoint job).
    sets = (
        docs.select(
            "doc_id", F.expr(spark_word_shingles("text", 3)).alias("sh")
        )
        .repartition(F.col("doc_id"))
        .sortWithinPartitions("doc_id")
        .localCheckpoint(eager=True)
    )
    tok = sets.select("doc_id", F.explode("sh").alias("g"))
    dfreq = tok.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    rk_w = Window.partitionBy("doc_id").orderBy("df", "g")
    # the frequency table is vocabulary-scale — not broadcastable at
    # corpus scale; pin the spill-safe shuffled merge join (a
    # shuffle_hash build OOM'd at sf0.1 under the 8-partition check
    # session). The old doc-size join is gone: shingles are DISTINCT
    # per doc, so n = the doc's own window row count — computed inside
    # the ranking window's partition for free.
    ranked = (
        tok.join(dfreq.hint("merge"), "g")
        .withColumn(
            "n",
            F.count(F.lit(1))
            .over(Window.partitionBy("doc_id"))
            .cast("long"),
        )
        .withColumn("rk", F.row_number().over(rk_w))
    )
    pfx = ranked.where(
        F.col("rk") <= F.expr("n - ((3 * n + 4) DIV 5) + 1")
    ).select("doc_id", "g")
    cand = (
        pfx.select(F.col("doc_id").alias("da"), "g")
        .join(pfx.select(F.col("doc_id").alias("db"), "g"), "g")
        .where(F.col("da") < F.col("db"))
        .select("da", "db")
        .dropDuplicates(["da", "db"])
    )
    x = sets.select(
        F.col("doc_id").alias("da"), F.col("sh").alias("sha")
    )
    y = sets.select(
        F.col("doc_id").alias("db"), F.col("sh").alias("shb")
    )
    # the shingle-array side is the full corpus — shuffle-join it with
    # the candidate frame instead of the auto-broadcast the small-SF
    # stats would pick; merge (not shuffle_hash) so the build spills.
    verified = (
        cand.hint("merge")
        .join(x, "da")
        .hint("merge")
        .join(y, "db")
        .select(
            F.col("da").alias("doc_a"),
            F.col("db").alias("doc_b"),
            F.size(F.array_intersect("sha", "shb"))
            .cast("long")
            .alias("inter_shingles"),
            (
                F.size("sha")
                + F.size("shb")
                - F.size(F.array_intersect("sha", "shb"))
            )
            .cast("long")
            .alias("union_shingles"),
        )
        .where(
            F.col("inter_shingles") * 1000000
            >= 600000 * F.col("union_shingles")
        )
    )
    return verified.select(
        "doc_a",
        "doc_b",
        "inter_shingles",
        "union_shingles",
        F.expr("(inter_shingles * 1000000) DIV union_shingles")
        .cast("long")
        .alias("jacc_e6"),
    )


# -------------------------- bucketed co-located join audit --


@query(
    "bucketed_colocated_join_audit",
    oracle="""
    SELECT o.o_orderpriority,
           count(*) AS n_items,
           CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def bucketed_colocated_join_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """BUCKETED CO-LOCATED JOIN — the layout lever that removes the
    join shuffle entirely: orders and lineitem are written as
    bucketed tables (8 buckets on the order key, sorted within
    buckets), re-read through the catalog, and merge-joined. The
    physical plan is ASSERTED in-query to contain the SortMergeJoin
    with ZERO pre-join shuffles — the only Exchange left is the
    final rollup's. Values are graded against the plain-join oracle,
    so the audit proves the bucketed path is both shuffle-free and
    answer-identical.

    Scale shape: THE 100 TB join strategy for repeatedly-joined fact
    tables — pay the bucketed write once, then every orders x
    lineitem join is map-side co-located (each task reads bucket i
    of both sides); no network shuffle of either fact table, no
    sort when bucket files arrive pre-sorted. The 8-bucket test
    layout scales by raising the bucket count with the cluster.

    Reference basis: layout-lever family (zorder_layout_scan /
    bloom_semijoin_pushdown r6 graded scan-side levers; this grades
    the join-side one)."""
    import re
    import shutil
    import tempfile
    import uuid

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    d = tempfile.mkdtemp(prefix="bucketed_join_")
    sfx = uuid.uuid4().hex[:8]
    try:
        (
            orders.write.format("parquet")
            .bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .option("path", f"{d}/orders")
            .saveAsTable(f"bkt_orders_{sfx}")
        )
        (
            lineitem.write.format("parquet")
            .bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .option("path", f"{d}/lineitem")
            .saveAsTable(f"bkt_lineitem_{sfx}")
        )
        ob = spark.table(f"bkt_orders_{sfx}")
        lb = spark.table(f"bkt_lineitem_{sfx}")
        res = (
            ob.hint("merge")
            .join(lb, ob.o_orderkey == lb.l_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_items"),
                F.sum(
                    F.floor(F.col("l_extendedprice") * 100).cast(
                        "long"
                    )
                )
                .cast("long")
                .alias("revenue_cents"),
            )
        )
        plan = res._sc._jvm.PythonSQLUtils.explainString(
            res._jdf.queryExecution(), "formatted"
        )
        assert (
            "SortMergeJoin" in plan
        ), "bucketed join did not plan SMJ"
        exchanges = re.findall(r"\(\d+\) (\w*Exchange)", plan)
        assert exchanges == ["Exchange"], (
            "bucketed co-located join must keep only the rollup's "
            f"exchange, got {exchanges}:\n{plan}"
        )
        # Materialize the rollup (priority-cardinality rows) so the
        # bucketed tables and their temp dir can be dropped — bench
        # replays used to accumulate a metastore entry + on-disk copy
        # per invocation.
        rows = res.collect()
        out = spark.createDataFrame(rows, res.schema)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS bkt_orders_{sfx}")
        spark.sql(f"DROP TABLE IF EXISTS bkt_lineitem_{sfx}")
        shutil.rmtree(d, ignore_errors=True)
    return out


# ---------------------- outer stream-stream join null emission --


@query(
    "streaming_outer_join_null_emission",
    oracle="""
    WITH d0 AS (
        SELECT date_trunc('day', min(ts)) AS t0 FROM events
    ),
    v AS (
        SELECT user_id, event_id, ts FROM events, d0
        WHERE event_type = 'view'
          AND ts >= d0.t0 AND ts < d0.t0 + INTERVAL 1 DAY
    ),
    c AS (
        SELECT user_id, event_id, ts FROM events, d0
        WHERE event_type = 'click'
          AND ts >= d0.t0 AND ts < d0.t0 + INTERVAL 1 DAY
    )
    SELECT v.user_id, v.event_id AS view_id,
           c.event_id AS click_id,
           CAST(epoch_us(c.ts) - epoch_us(v.ts) AS BIGINT) AS lag_us
    FROM v LEFT JOIN c
      ON v.user_id = c.user_id
     AND c.ts >= v.ts
     AND c.ts <= v.ts + INTERVAL 1 HOUR
    """,
)
def streaming_outer_join_null_emission(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """LEFT-OUTER stream-stream join with WATERMARK-DRIVEN NULL
    EMISSION, value-graded — the subtlest stream-join semantics:
    unmatched views must emit (view, NULL) rows, but only once the
    watermark proves no future click can still match (view_ts + the
    1-hour join range). The graded inner row
    (streaming_stream_join) can never observe this path; here the
    fixture forces it: day-1 views and clicks arrive in batch 0 of
    each side's ordered file source, then two sentinel batches per
    side (far-future rows on a key that joins nothing, filtered
    AFTER the watermark node so they advance event time without
    entering the join) push the watermark past every view's match
    range — Spark applies a batch's watermark in the NEXT batch (the
    measured one-batch lag the late-drop rows pin), hence TWO
    sentinel files, not one. The union of all emitted batches must
    equal the relational LEFT JOIN row for row, nulls included.

    Scale shape: both sides shuffle-partition on user_id; state per
    key is bounded by the 1-hour range below the watermark — eviction
    is exactly what keeps outer-join state finite at 100 TB ingest
    (without the range bound Spark rejects the outer join outright).

    Reference basis: SURVEY §2.9 streaming semantics (T1-T11) —
    stream-stream INNER graded r10 (streaming_stream_join); the
    outer form's null path graded value-for-value for the first
    time; three-batch ordered-file fixture per the T4/T6 technique."""
    import os
    import shutil
    import tempfile
    import uuid

    from sparkksqldbbenchmark_spark.streaming.pipeline import (
        run_to_memory,
    )

    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(F.date_trunc("day", F.min("ts")).alias("t0"))
    evb = ev.crossJoin(F.broadcast(bounds)).where(
        (F.col("ts") >= F.col("t0"))
        & (F.col("ts") < F.col("t0") + F.expr("INTERVAL 1 DAY"))
    )
    views = evb.where(F.col("event_type") == "view").select(
        "user_id", "event_id", "ts"
    )
    clicks = evb.where(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    sentinel = bounds.select(
        F.lit(-1).cast("long").alias("user_id"),
        F.lit(-1).cast("long").alias("event_id"),
        (F.col("t0") + F.expr("INTERVAL 30 DAY")).alias("ts"),
    )
    sentinel2 = sentinel.select(
        "user_id",
        "event_id",
        (F.col("ts") + F.expr("INTERVAL 1 DAY")).alias("ts"),
    )
    base = tempfile.mkdtemp(prefix="oj_")
    try:
        for side, parts in (
            ("left", (views, sentinel, sentinel2)),
            ("right", (clicks, sentinel, sentinel2)),
        ):
            sdir = os.path.join(base, side)
            os.makedirs(sdir)
            for i, part_df in enumerate(parts):
                tmp = os.path.join(base, f"{side}_part{i}")
                part_df.coalesce(1).write.mode("overwrite").parquet(tmp)
                part = [
                    f for f in os.listdir(tmp) if f.endswith(".parquet")
                ][0]
                dst = os.path.join(sdir, f"file{i}.parquet")
                shutil.copy(os.path.join(tmp, part), dst)
                os.utime(dst, (1_700_000_000 + i * 60,) * 2)
        # The sentinel exclusion must reference the EVENT-TIME column:
        # Catalyst pushes non-event-time predicates BELOW the
        # EventTimeWatermark node (PushPredicateThroughNonJoin), which
        # would filter the sentinels before their timestamps ever reach
        # the watermark stats — measured here as the watermark silently
        # never advancing and the last views never emitting their nulls.
        t0 = bounds.collect()[0]["t0"]
        cutoff = F.lit(t0) + F.expr("INTERVAL 1 DAY")
        schema = "user_id bigint, event_id bigint, ts timestamp"
        left = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(os.path.join(base, "left"))
            .withWatermark("ts", "10 minutes")
            .where(F.col("ts") < cutoff)
            .select(
                "user_id",
                F.col("event_id").alias("view_id"),
                F.col("ts").alias("view_ts"),
            )
        )
        right = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(os.path.join(base, "right"))
            .withWatermark("ts", "10 minutes")
            .where(F.col("ts") < cutoff)
            .select(
                F.col("user_id").alias("c_user_id"),
                F.col("event_id").alias("click_id"),
                F.col("ts").alias("click_ts"),
            )
        )
        joined = left.join(
            right,
            F.expr(
                "user_id = c_user_id AND click_ts >= view_ts"
                " AND click_ts <= view_ts + interval 1 hour"
            ),
            "left_outer",
        ).select(
            "user_id",
            "view_id",
            "click_id",
            (F.unix_micros("click_ts") - F.unix_micros("view_ts"))
            .cast("long")
            .alias("lag_us"),
        )
        name = f"oj_null_{uuid.uuid4().hex[:8]}"
        q = run_to_memory(joined, name, output_mode="append")
        q.stop()
    finally:
        # fixture dir cleanup: the memory sink materializes rows
        # during the run, so the source files are disposable after
        # stop() (verified source-independent; VERDICT r14 item #2)
        shutil.rmtree(base, ignore_errors=True)
    return spark.table(name)


# -------------------- dedup-within-watermark re-emission --


@query(
    "streaming_dedup_within_watermark_reemit",
    oracle="""
    WITH d0 AS (
        SELECT date_trunc('day', min(ts)) AS t0 FROM events
    )
    SELECT user_id, event_type, CAST(2 AS BIGINT) AS n_emitted
    FROM events, d0
    WHERE ts >= d0.t0 AND ts < d0.t0 + INTERVAL 1 DAY
    GROUP BY user_id, event_type
    """,
)
def streaming_dedup_within_watermark_reemit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """dropDuplicatesWithinWatermark RE-EMISSION semantics,
    value-graded — the property that separates it from plain
    dropDuplicates (graded r10 as streaming_dedup_distinct_keys,
    whose docstring deferred exactly this): after the watermark
    evicts a key's state, the SAME key arriving again is NEW and
    must re-emit. Four ordered batches: (1) every day-1
    (user, event_type) row — within-batch duplicates collapse to
    one emission per key; (2) the same keys shifted +1 hour — still
    inside the 10-minute-delay state lifetime, all DROPPED; (3) a
    far-future sentinel advancing the watermark past every key's
    expiry (filtered on the event-time column — the Catalyst
    watermark-pushdown fact the outer-join row records); (4) the
    same keys shifted +2 days — state long evicted, every key
    re-emits. Graded readout: exactly 2 emissions per day-1 key.
    A failure either way is visible: early eviction → 3, no
    eviction → 1.

    Scale shape: dedup state is partitioned by key and BOUNDED by
    the watermark lifetime — the property this row proves is the one
    that makes streaming dedup viable at 100 TB/day (plain
    dropDuplicates state grows without bound; withinWatermark holds
    each key for delay + range only).

    Reference basis: SURVEY §2.9 T8/T10 state-store semantics;
    streaming/stateful.streaming_dedup_within_watermark carries the
    operator, unit tests cover eviction timing — this grades the
    re-emission contract end-to-end against the driver oracle."""
    import os
    import shutil
    import tempfile
    import uuid

    from sparkksqldbbenchmark_spark.streaming.pipeline import (
        run_to_memory,
    )

    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(F.date_trunc("day", F.min("ts")).alias("t0"))
    t0 = bounds.collect()[0]["t0"]
    day1 = ev.where(
        (F.col("ts") >= F.lit(t0))
        & (F.col("ts") < F.lit(t0) + F.expr("INTERVAL 1 DAY"))
    ).select("user_id", "event_type", "ts")
    shifted_1h = day1.select(
        "user_id",
        "event_type",
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("ts"),
    )
    sentinel = spark.range(1).select(
        F.lit(-1).cast("long").alias("user_id"),
        F.lit("__sentinel__").alias("event_type"),
        (F.lit(t0) + F.expr("INTERVAL 30 DAY")).alias("ts"),
    )
    reemit = day1.select(
        "user_id",
        "event_type",
        (F.col("ts") + F.expr("INTERVAL 32 DAY")).alias("ts"),
    )
    base = tempfile.mkdtemp(prefix="ddww_")
    try:
        sdir = os.path.join(base, "stream")
        os.makedirs(sdir)
        for i, part_df in enumerate(
            (day1, shifted_1h, sentinel, reemit)
        ):
            tmp = os.path.join(base, f"part{i}")
            part_df.coalesce(1).write.mode("overwrite").parquet(tmp)
            part = [
                f for f in os.listdir(tmp) if f.endswith(".parquet")
            ][0]
            dst = os.path.join(sdir, f"file{i}.parquet")
            shutil.copy(os.path.join(tmp, part), dst)
            os.utime(dst, (1_700_000_000 + i * 60,) * 2)
        # exclude ONLY the sentinel's time band (day-1 / +1h / +32d rows
        # stay); the predicate references the event-time column so
        # Catalyst cannot push it below the watermark node
        stream = (
            spark.readStream.schema(
                "user_id bigint, event_type string, ts timestamp"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(sdir)
            .withWatermark("ts", "10 minutes")
            .where(
                (F.col("ts") < F.lit(t0) + F.expr("INTERVAL 29 DAY"))
                | (F.col("ts") >= F.lit(t0) + F.expr("INTERVAL 31 DAY"))
            )
        )
        deduped = stream.dropDuplicatesWithinWatermark(
            ["user_id", "event_type"]
        ).select("user_id", "event_type")
        name = f"ddww_{uuid.uuid4().hex[:8]}"
        q = run_to_memory(deduped, name, output_mode="append")
        q.stop()
    finally:
        # fixture dir cleanup: the memory sink materializes rows
        # during the run, so the source files are disposable after
        # stop() (verified source-independent; VERDICT r14 item #2)
        shutil.rmtree(base, ignore_errors=True)
    return (
        spark.table(name)
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n_emitted"))
    )


# -------------------- sentence-boundary greedy chunk plan --


def _chunk_oracle(budget: int = 12) -> str:
    from sparkksqldbbenchmark_spark.llm.hashing import sql_md5_int

    h = sql_md5_int("w.w")
    return f"""
    WITH RECURSIVE words AS (
        SELECT d.doc_id,
               unnest(regexp_extract_all(d.text, '\\S+')) AS w,
               generate_subscripts(
                   regexp_extract_all(d.text, '\\S+'), 1) AS i
        FROM documents d
    ),
    flagged AS (
        SELECT doc_id, i,
               CASE WHEN ({h} & 3) = 0 THEN 1 ELSE 0 END AS f
        FROM words w
    ),
    sids AS (
        SELECT doc_id, i, f,
               coalesce(sum(f) OVER (
                   PARTITION BY doc_id ORDER BY i
                   ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) AS sid
        FROM flagged
    ),
    sent_lens AS (
        SELECT doc_id, sid, count(*) AS len
        FROM sids GROUP BY doc_id, sid
    ),
    k_t AS (
        SELECT doc_id, count(*) AS k, CAST(sum(len) AS BIGINT) AS nw
        FROM sent_lens GROUP BY doc_id
    ),
    rec AS (
        SELECT doc_id, 0 AS idx, 0 AS cur, 0 AS nch, 0 AS mx
        FROM k_t
        UNION ALL
        SELECT r.doc_id, r.idx + 1,
               CASE WHEN r.cur > 0 AND r.cur + s.len > {budget}
                    THEN s.len ELSE r.cur + s.len END,
               CASE WHEN r.cur > 0 AND r.cur + s.len > {budget}
                    THEN r.nch + 1 ELSE r.nch END,
               CASE WHEN r.cur > 0 AND r.cur + s.len > {budget}
                    THEN greatest(r.mx, r.cur) ELSE r.mx END
        FROM rec r
        JOIN sent_lens s
          ON s.doc_id = r.doc_id AND s.sid = r.idx
    )
    SELECT k_t.doc_id,
           k_t.nw AS n_words,
           CAST(k_t.k AS BIGINT) AS n_sentences,
           CAST(r.nch + 1 AS BIGINT) AS n_chunks,
           CAST(greatest(r.mx, r.cur) AS BIGINT) AS max_chunk_words,
           CAST(r.cur AS BIGINT) AS last_chunk_words
    FROM rec r JOIN k_t ON r.doc_id = k_t.doc_id AND r.idx = k_t.k
    """


@query(
    "sentence_chunk_greedy_fold", oracle=_chunk_oracle()
)
def sentence_chunk_greedy_fold(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """WITHIN-DOCUMENT greedy chunking with sentence-boundary
    respect — the context-window chunker every RAG / SFT data
    pipeline runs: sentences are packed greedily into chunks of at
    most 12 words, a sentence never splits (one longer than the
    budget occupies its own chunk), and a chunk closes when the next
    sentence would overflow it. Sentence ends are deterministic
    pseudo-boundaries (word md5 & 3 == 0, the planted-structure
    convention) since the corpus has no punctuation. Graded per doc:
    words, sentences, chunks, max and last chunk fill.

    Complements sequence_packing (r12 flagship): that row packs
    ACROSS documents with a range-bucketed distributed prefix sum
    (one shuffle); this one is the within-doc reset-recurrence,
    which no prefix sum expresses — so it runs as a pure scan-side
    HOF FOLD (aggregate with struct state: sentence-length builder,
    then the greedy chunker) — ZERO exchanges of row-grain data, the
    most scalable shape an operator can have. The DuckDB oracle
    derives the same recurrence through an entirely different
    spelling: window-function sentence ids + a recursive CTE
    stepping all documents one sentence per iteration.

    Reference basis: packing family (sequence_packing,
    token_budget_selection r12, pack_composition_audit r11 — this
    adds the boundary-respecting within-doc member)."""
    from sparkksqldbbenchmark_spark.llm.hashing import (
        spark_md5_int,
        spark_tokens,
    )

    budget = 12
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.expr(spark_tokens("text")).alias("toks")
    )
    flags = F.expr(
        f"transform(toks, w -> ({spark_md5_int('w')} & 3) = 0)"
    )
    lens_expr = (
        "aggregate(flags,"
        " struct(cast(array() as array<int>) as lens, 0 as cur),"
        " (a, f) -> if(f,"
        "   struct(concat(a.lens, array(a.cur + 1)) as lens,"
        "          0 as cur),"
        "   struct(a.lens as lens, a.cur + 1 as cur)),"
        " a -> if(a.cur > 0, concat(a.lens, array(a.cur)), a.lens))"
    )
    greedy = (
        "aggregate(lens,"
        " struct(0 as nch, 0 as cur, 0 as mx),"
        " (a, L) -> if(a.cur > 0 and a.cur + L > "
        f"{budget},"
        "   struct(a.nch + 1 as nch, L as cur,"
        "          greatest(a.mx, a.cur) as mx),"
        "   struct(a.nch as nch, a.cur + L as cur, a.mx as mx)),"
        " a -> struct(a.nch + 1 as nch, a.cur as cur,"
        "             greatest(a.mx, a.cur) as mx))"
    )
    staged = (
        # A wordless doc has no sentences, so the oracle's words CTE
        # emits no row for it — mirror that (no degenerate n_chunks=1
        # row) by dropping empty token arrays before the fold.
        toks.where(F.size("toks") > 0)
        .withColumn("flags", flags)
        .withColumn("lens", F.expr(lens_expr))
        .withColumn("st", F.expr(greedy))
    )
    return staged.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_words"),
        F.size("lens").cast("long").alias("n_sentences"),
        F.col("st.nch").cast("long").alias("n_chunks"),
        F.col("st.mx").cast("long").alias("max_chunk_words"),
        F.col("st.cur").cast("long").alias("last_chunk_words"),
    )


# -------------------- Bloom pre-filter, FPR certified --


def _bloom_oracle(m: int = 4096, k: int = 3) -> str:
    from sparkksqldbbenchmark_spark.llm.hashing import sql_md5_int

    h = sql_md5_int("(j.j || '#' || CAST(c.c_custkey AS VARCHAR))")
    ho = sql_md5_int("(j.j || '#' || CAST(o.o_custkey AS VARCHAR))")
    return f"""
    WITH members AS (
        SELECT c_custkey FROM customer
        WHERE c_mktsegment = 'BUILDING'
    ),
    mpos AS (
        SELECT ({h} % {m}) AS p
        FROM members c, (SELECT unnest(range({k})) AS j) j
    ),
    bloom AS (
        SELECT p // 32 AS word,
               CAST(bit_or(1 << (p % 32)) AS BIGINT) AS bits
        FROM mpos GROUP BY p // 32
    ),
    opos AS (
        SELECT o.o_orderkey, o.o_orderpriority, o.o_custkey,
               ({ho} % {m}) AS p
        FROM orders o, (SELECT unnest(range({k})) AS j) j
    ),
    hits AS (
        SELECT op.o_orderkey, op.o_orderpriority, op.o_custkey,
               CASE WHEN b.bits IS NOT NULL
                         AND (b.bits & (1 << (op.p % 32))) != 0
                    THEN 1 ELSE 0 END AS hit
        FROM opos op LEFT JOIN bloom b ON b.word = op.p // 32
    ),
    per_order AS (
        SELECT o_orderkey, o_orderpriority, o_custkey,
               CASE WHEN sum(hit) = {k} THEN 1 ELSE 0 END AS cand
        FROM hits GROUP BY o_orderkey, o_orderpriority, o_custkey
    ),
    flagged AS (
        SELECT po.*,
               CASE WHEN mem.c_custkey IS NOT NULL THEN 1 ELSE 0 END
                   AS is_member
        FROM per_order po
        LEFT JOIN members mem ON mem.c_custkey = po.o_custkey
    )
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(cand) AS BIGINT) AS n_candidates,
           CAST(sum(is_member) AS BIGINT) AS n_members,
           CAST(sum(CASE WHEN cand = 1 AND is_member = 0
                         THEN 1 ELSE 0 END) AS BIGINT)
               AS n_false_positives,
           CAST(sum(CASE WHEN cand = 0 AND is_member = 1
                         THEN 1 ELSE 0 END) AS BIGINT)
               AS n_false_negatives
    FROM flagged GROUP BY o_orderpriority
    """


@query(
    "bloom_prefilter_fpr_certified", oracle=_bloom_oracle()
)
def bloom_prefilter_fpr_certified(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """BLOOM-FILTER SEMI-JOIN PRE-FILTER, certified in-query — the
    classic shuffle-avoidance sketch built from first principles so
    both engines replay it bit-for-bit: BUILDING-segment customer
    keys hash into a 4096-bit / 3-hash Bloom (md5 positions, 32-bit
    words bit_or-packed into a <=128-row frame); every order probes
    all 3 bits through a broadcast join against that frame. Graded
    per order priority: candidate count, true member count, FALSE
    POSITIVES (the measured price of the sketch) and FALSE NEGATIVES
    (must be 0 — the Bloom guarantee, graded as a value, not
    asserted). Complements bloom_semijoin_pushdown (r6), which
    grades Spark's opaque RUNTIME bloom injection — this row makes
    the sketch itself the graded object.

    Scale shape: THE fact-side pre-filter at 100 TB — the dim key
    set compresses to a kilobyte-scale bit array that broadcasts
    where the key set cannot; the probe is scan-side arithmetic plus
    a bounded-frame join (128 rows regardless of dim cardinality;
    m scales with |dim| / target FPR, still broadcastable at
    billions of keys). The exact semi-join appears ONLY to grade
    the FP/FN accounting. The fixed m=4096 makes the scaling rule
    OBSERVABLE across the graded SFs: at sf0.001 (150 keys) the
    filter is perfect (FP=0); at sf0.1 (30k keys) it saturates
    (FP≈84k of 120k non-members) — undersizing m costs recall of
    the filter, never correctness (FN=0 at every SF).

    Reference basis: sketch-certificate family (countmin r10, KMV
    r5/staged, HLL-union r10, bitmap r12 — Bloom was the missing
    member; runtime-filter twin graded r6)."""
    from sparkksqldbbenchmark_spark.llm.hashing import spark_md5_int

    m, k = 4096, 3
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    members = customer.where(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    j = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("j")
    hp = (
        "(" + spark_md5_int(
            "concat(cast(j as string), '#', cast(c_custkey as string))"
        ) + f") % {m}"
    )
    mpos = members.select("c_custkey", j).select(
        F.expr(hp).alias("p")
    )
    bloom = mpos.groupBy(F.expr("p DIV 32").alias("word")).agg(
        F.expr("bit_or(shiftleft(1L, cast(p % 32 as int)))")
        .cast("long")
        .alias("bits")
    )
    hpo = (
        "(" + spark_md5_int(
            "concat(cast(j as string), '#', cast(o_custkey as string))"
        ) + f") % {m}"
    )
    opos = orders.select(
        "o_orderkey", "o_orderpriority", "o_custkey", j
    ).select(
        "o_orderkey",
        "o_orderpriority",
        "o_custkey",
        F.expr(hpo).alias("p"),
    )
    hits = opos.join(
        F.broadcast(bloom),
        F.expr("word = p DIV 32"),
        "left",
    ).select(
        "o_orderkey",
        "o_orderpriority",
        "o_custkey",
        F.when(
            F.col("bits").isNotNull()
            & (
                F.expr(
                    "bits & shiftleft(1L, cast(p % 32 as int))"
                )
                != 0
            ),
            1,
        )
        .otherwise(0)
        .alias("hit"),
    )
    per_order = hits.groupBy(
        "o_orderkey", "o_orderpriority", "o_custkey"
    ).agg(
        F.when(F.sum("hit") == k, 1).otherwise(0).alias("cand")
    )
    flagged = per_order.join(
        members.withColumnRenamed("c_custkey", "o_custkey")
        .withColumn("is_member", F.lit(1)),
        "o_custkey",
        "left",
    ).select(
        "o_orderpriority",
        "cand",
        F.coalesce("is_member", F.lit(0)).alias("is_member"),
    )
    return flagged.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("cand").cast("long").alias("n_candidates"),
        F.sum("is_member").cast("long").alias("n_members"),
        F.sum(
            F.when((F.col("cand") == 1) & (F.col("is_member") == 0), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("n_false_positives"),
        F.sum(
            F.when((F.col("cand") == 0) & (F.col("is_member") == 1), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("n_false_negatives"),
    )


# ---------------------- left-semi stream-stream join --


@query(
    "streaming_semi_join_first_match",
    oracle="""
    WITH d0 AS (
        SELECT date_trunc('day', min(ts)) AS t0 FROM events
    ),
    v AS (
        SELECT user_id, event_id, ts FROM events, d0
        WHERE event_type = 'view'
          AND ts >= d0.t0 AND ts < d0.t0 + INTERVAL 1 DAY
    ),
    c AS (
        SELECT user_id, ts FROM events, d0
        WHERE event_type = 'click'
          AND ts >= d0.t0 AND ts < d0.t0 + INTERVAL 1 DAY
    )
    SELECT v.user_id, v.event_id AS view_id
    FROM v
    WHERE EXISTS (
        SELECT 1 FROM c
        WHERE c.user_id = v.user_id
          AND c.ts >= v.ts
          AND c.ts <= v.ts + INTERVAL 4 HOUR
    )
    """,
)
def streaming_semi_join_first_match(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """LEFT-SEMI stream-stream join — the existence form of the
    attribution question ("did this view convert at all?"): each
    view emits AT MOST ONCE, on its first matching click, with no
    click columns and no duplicate emissions however many clicks
    match — semantics neither the inner row (one output per pair)
    nor the outer rows (null emissions) exercise. Same ordered-file
    fixture family; sentinels advance the watermark so unmatched
    views' state is evicted WITHOUT emission (the semi contract's
    other half). The emitted set must equal the relational EXISTS.

    Scale shape: semi-join state is the cheapest of the matrix —
    matched left rows drop from state at emission (no need to wait
    for the watermark), unmatched ones evict at watermark + range
    like the outer forms.

    Reference basis: SURVEY §2.9 — fourth and final member of the
    stream-stream join matrix (inner r10, left-outer / full-outer
    staged)."""
    import os
    import shutil
    import tempfile
    import uuid

    from sparkksqldbbenchmark_spark.streaming.pipeline import (
        run_to_memory,
    )

    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(F.date_trunc("day", F.min("ts")).alias("t0"))
    t0 = bounds.collect()[0]["t0"]
    evb = ev.where(
        (F.col("ts") >= F.lit(t0))
        & (F.col("ts") < F.lit(t0) + F.expr("INTERVAL 1 DAY"))
    )
    views = evb.where(F.col("event_type") == "view").select(
        "user_id", "event_id", "ts"
    )
    clicks = evb.where(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    sentinel = spark.range(1).select(
        F.lit(-1).cast("long").alias("user_id"),
        F.lit(-1).cast("long").alias("event_id"),
        (F.lit(t0) + F.expr("INTERVAL 30 DAY")).alias("ts"),
    )
    sentinel2 = sentinel.select(
        "user_id",
        "event_id",
        (F.col("ts") + F.expr("INTERVAL 1 DAY")).alias("ts"),
    )
    base = tempfile.mkdtemp(prefix="ssemi_")
    try:
        for side, parts in (
            ("left", (views, sentinel, sentinel2)),
            ("right", (clicks, sentinel, sentinel2)),
        ):
            sdir = os.path.join(base, side)
            os.makedirs(sdir)
            for i, part_df in enumerate(parts):
                tmp = os.path.join(base, f"{side}_part{i}")
                part_df.coalesce(1).write.mode("overwrite").parquet(tmp)
                part = [
                    f for f in os.listdir(tmp) if f.endswith(".parquet")
                ][0]
                dst = os.path.join(sdir, f"file{i}.parquet")
                shutil.copy(os.path.join(tmp, part), dst)
                os.utime(dst, (1_700_000_000 + i * 60,) * 2)
        cutoff = F.lit(t0) + F.expr("INTERVAL 1 DAY")
        schema = "user_id bigint, event_id bigint, ts timestamp"
        left = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(os.path.join(base, "left"))
            .withWatermark("ts", "10 minutes")
            .where(F.col("ts") < cutoff)
            .select(
                "user_id",
                F.col("event_id").alias("view_id"),
                F.col("ts").alias("view_ts"),
            )
        )
        right = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(os.path.join(base, "right"))
            .withWatermark("ts", "10 minutes")
            .where(F.col("ts") < cutoff)
            .select(
                F.col("user_id").alias("c_user_id"),
                F.col("ts").alias("click_ts"),
            )
        )
        joined = left.join(
            right,
            F.expr(
                "user_id = c_user_id AND click_ts >= view_ts"
                " AND click_ts <= view_ts + interval 4 hours"
            ),
            "left_semi",
        ).select("user_id", "view_id")
        name = f"ssemi_{uuid.uuid4().hex[:8]}"
        q = run_to_memory(joined, name, output_mode="append")
        q.stop()
    finally:
        # fixture dir cleanup: the memory sink materializes rows
        # during the run, so the source files are disposable after
        # stop() (verified source-independent; VERDICT r14 item #2)
        shutil.rmtree(base, ignore_errors=True)
    return spark.table(name)
