"""Round-6 graduated queries: the 20 queries staged (and locally
DuckDB-verified at sf0.001/0.01/0.1) during round 5, now registered with
the driver-graded registry per docs/ROTATION_R6.md.

Layout/runtime-filter levers: zorder_layout_scan, bloom_semijoin_pushdown,
analyze_column_stats. Analytics shapes: funnel_conversion, cohort_retention,
rolling_7day_active_users, winsorized_stats, tfidf_top_terms,
nullsafe_join_agg, group_exact_k_sample. Curation/LLM-pipeline:
doc_chunk_stride, domain_mixture_resample, dedup_containment,
dedup_cross_source_matrix, quality_cdf_normalize, ann_recall_certified.
CDC/SCD: scd2_dimension_build, cdc_snapshot_apply, streaming_cdc_latest,
streaming_chained_window_agg.

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
from sparkksqldbbenchmark_spark.functions.stable import (
    sql_stable_avg,
    sql_stable_sum,
    stable_avg,
)
from sparkksqldbbenchmark_spark.llm.hashing import (
    spark_md5_int,
    spark_tokens,
    sql_md5_int,
    sql_minhash_sig,
    sql_tokens,
    sql_word_shingles,
)
from sparkksqldbbenchmark_spark.plans.registry import query

QueryFn = Callable[[SparkSession, str], DataFrame]


# ------------------------------------------------------------- chunking --

_CHUNK_W = 200  # chunk width (chars)
_CHUNK_S = 150  # stride (chars) → 50-char overlap between neighbors

_CHUNK_N = f"cast(ceil(greatest(length(text), 1) / {_CHUNK_S}.0) as int)"


@query(
    "doc_chunk_stride",
    oracle=f"""
    SELECT doc_id,
           CAST(k AS BIGINT) AS chunk_idx,
           CAST(len(substring(text, CAST(k * {_CHUNK_S} + 1 AS INT),
                              {_CHUNK_W})) AS BIGINT) AS chunk_len,
           md5(substring(text, CAST(k * {_CHUNK_S} + 1 AS INT),
               {_CHUNK_W})) AS chunk_hash
    FROM (
        SELECT doc_id, text,
               unnest(range(0, CAST(ceil(greatest(len(text), 1)
                                         / {_CHUNK_S}.0) AS BIGINT))) AS k
        FROM documents
    )
    """,
)
def doc_chunk_stride(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping sliding-window chunking — the standard prep step that
    turns long documents into fixed-width training sequences with stride
    overlap (width 200 chars, stride 150 → 50-char overlap).

    Scale shape: explode(sequence(...)) + substring is a NARROW map-side
    plan — zero shuffles, output rows ∝ input bytes / stride, and the
    substring runs inside whole-stage codegen. At 100 TB this is a pure
    scan→write pipeline; chunk_hash (md5) doubles as the join key for
    downstream chunk-level dedup (passage_dup_stats pattern).
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.explode(F.expr(f"sequence(0, {_CHUNK_N} - 1)")).alias("__k"),
        "text",
    ).select(
        "doc_id",
        F.col("__k").cast("long").alias("chunk_idx"),
        "text",
    ).select(
        "doc_id",
        "chunk_idx",
        F.expr(
            f"cast(length(substring(text, cast(chunk_idx * {_CHUNK_S} + 1 "
            f"as int), {_CHUNK_W})) as bigint)"
        ).alias("chunk_len"),
        F.expr(
            f"md5(substring(text, cast(chunk_idx * {_CHUNK_S} + 1 as int), "
            f"{_CHUNK_W}))"
        ).alias("chunk_hash"),
    )


# ---------------------------------------------------------------- tf-idf --


@query(
    "tfidf_top_terms",
    oracle=f"""
    WITH toks AS (
        SELECT source, unnest({sql_tokens("lower(text)")}) AS term
        FROM documents
    ), tf AS (
        SELECT source, term, count(*) AS tf FROM toks GROUP BY 1, 2
    ), dfreq AS (
        SELECT term, count(*) AS df_sources FROM tf GROUP BY 1
    ), n AS (
        SELECT count(DISTINCT source) AS n_sources FROM documents
    ), scored AS (
        SELECT tf.source, tf.term, tf.tf, dfreq.df_sources,
               tf.tf * (n.n_sources - dfreq.df_sources + 1) AS score,
               row_number() OVER (
                   PARTITION BY tf.source
                   ORDER BY tf.tf * (n.n_sources - dfreq.df_sources + 1)
                            DESC, tf.term
               ) AS rank
        FROM tf JOIN dfreq USING (term) CROSS JOIN n
    )
    SELECT source, term, tf, df_sources, score, CAST(rank AS BIGINT) AS rank
    FROM scored WHERE rank <= 5
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source characteristic terms: top-5 by a rarity-weighted term
    frequency, score = tf × (N − df + 1) with N = #sources and df =
    #sources containing the term.

    The weight is the integer-exact monotone stand-in for tf-idf's
    log(N/df): both rank rare-term-heavy sources identically, but the
    integer form is bit-identical across engines (libm log differs in
    last ulps between implementations, and a 1-ulp difference at a
    rounding boundary would flip a rank). Tie-break on term ASC makes
    row_number deterministic.

    Scale shape: tokenize+explode (narrow) → (source,term) partial-agg
    shuffle → term-keyed df shuffle → tf⋈df join on term → row_number
    windowed per source. The df relation is vocab-sized (heavy-tail
    pruning: WHERE tf > 1 would cap it); the per-source window is the
    top-k pattern ordering.py uses — no global sort.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.explode(F.expr(spark_tokens("lower(text)"))).alias("term"),
    )
    tf = toks.groupBy("source", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df_sources"))
    n = docs.agg(F.countDistinct("source").alias("n_sources"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            F.col("tf") * (F.col("n_sources") - F.col("df_sources") + 1),
        )
    )
    w = Window.partitionBy("source").orderBy(
        F.col("score").desc(), F.col("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 5)
        .select("source", "term", "tf", "df_sources", "score", "rank")
    )


# ---------------------------------------------------------------- funnel --


@query(
    "funnel_conversion",
    oracle="""
    WITH v AS (
        SELECT user_id, min(ts) AS t_view FROM events
        WHERE event_type = 'view' GROUP BY 1
    ), c AS (
        SELECT e.user_id, min(e.ts) AS t_click
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY 1
    ), p AS (
        SELECT e.user_id, min(e.ts) AS t_purchase
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY 1
    )
    SELECT (SELECT count(DISTINCT user_id) FROM events) AS users_total,
           (SELECT count(*) FROM v) AS viewed,
           (SELECT count(*) FROM c) AS clicked_after_view,
           (SELECT count(*) FROM p) AS purchased_after_click
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered three-step funnel (view → click → purchase): a user
    advances a stage only with an event strictly AFTER their previous
    stage's first event — the classic product-analytics funnel that a
    naive per-type EXISTS gets wrong (it ignores ordering).

    Scale shape: three user_id-keyed aggregates chained by inner joins on
    user_id — every shuffle is on the same key, so one hash partitioning
    is reused across all stages (co-partitioned joins, no re-shuffle);
    stage frames shrink monotonically. The four final counts are scalar
    aggregates crossed via broadcast — constant-size frames.
    """
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        e.agg(F.countDistinct("user_id").alias("users_total"))
        .crossJoin(F.broadcast(v.agg(F.count("*").alias("viewed"))))
        .crossJoin(
            F.broadcast(c.agg(F.count("*").alias("clicked_after_view")))
        )
        .crossJoin(
            F.broadcast(p.agg(F.count("*").alias("purchased_after_click")))
        )
    )


# --------------------------------------------------------------- cohorts --


@query(
    "cohort_retention",
    oracle="""
    WITH firsts AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS first_d
        FROM events GROUP BY 1
    ), enriched AS (
        SELECT e.user_id,
               CAST(date_trunc('week', f.first_d) AS DATE) AS cohort_week,
               CAST(floor(date_diff('day',
                    CAST(date_trunc('week', f.first_d) AS DATE),
                    CAST(e.ts AS DATE)) / 7.0) AS BIGINT) AS week_offset
        FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT cohort_week, week_offset,
           count(DISTINCT user_id) AS active_users
    FROM enriched GROUP BY 1, 2
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users bucketed by the ISO week of
    their first event (both engines' date_trunc('week') is
    Monday-aligned), counted distinct per whole-week offset since that
    cohort week started. Integer day arithmetic end-to-end.

    Scale shape: one user_id shuffle for first-event dates, reused by the
    events⋈firsts join (same key — co-partitioned, no second exchange on
    the big side), then a (cohort, offset)-keyed distinct-count whose
    partial aggregation collapses each user to one row per (cohort,
    offset) map-side. Cohort keys are bounded (weeks × offsets), so the
    final shuffle is tiny regardless of input size.
    """
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    firsts = e.groupBy("user_id").agg(F.min("d").alias("first_d"))
    enriched = e.join(firsts, "user_id").select(
        "user_id",
        F.date_trunc("week", F.col("first_d"))
        .cast("date")
        .alias("cohort_week"),
        F.floor(
            F.datediff(
                F.col("d"), F.date_trunc("week", F.col("first_d")).cast("date")
            )
            / 7.0
        )
        .cast("long")
        .alias("week_offset"),
    )
    return enriched.groupBy("cohort_week", "week_offset").agg(
        F.countDistinct("user_id").alias("active_users")
    )


# ------------------------------------------------------- mixture resample --

# weight(srcN) = 1 + (N mod 3) ∈ {1,2,3}; acceptance threshold =
# weight·1e6 div 3 compared against a 1e6-bucket md5 hash of doc_id —
# deterministic, reproducible sampling with zero data movement.
# try_cast + coalesce on BOTH sides: on a digit-less source value a plain
# cast diverges cross-engine (Spark cast('' as int) → NULL and the row is
# silently never kept; DuckDB CAST('' AS INT) hard-errors). try_cast makes
# the degenerate case defined and identical: weight defaults to 1 (keep
# at the lowest 1/3 rate) instead of NULL/error.
_SPARK_W = (
    "(1 + coalesce(try_cast(regexp_extract(source, '(\\\\d+)', 1) as int), 0)"
    " % 3)"
)
_SQL_W = (
    "(1 + COALESCE(TRY_CAST(regexp_extract(source, '(\\d+)', 1) AS INT), 0)"
    " % 3)"
)


@query(
    "domain_mixture_resample",
    oracle=f"""
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN {sql_md5_int("CAST(doc_id AS VARCHAR)")} % 1000000
                         < {_SQL_W} * 1000000 // 3
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(max({_SQL_W} * 1000000 // 3) AS BIGINT) AS keep_threshold
    FROM documents GROUP BY 1
    """,
)
def domain_mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic domain-mixture resampling: each source domain gets a
    target weight (here 1 + src_index mod 3, standing in for a DoReMi /
    heuristic mixture table) and documents are kept iff a uniform 1e6-
    bucket hash of doc_id falls under weight·1e6 div 3 — i.e. domains are
    down-sampled to 1/3, 2/3, or full rate, reproducibly (same doc set on
    every run and every engine, no RNG).

    Scale shape: the keep decision is a scan-side expression (md5 +
    integer compare, whole-stage codegen, zero shuffle); only the
    per-domain audit counts aggregate — bounded by #domains. The same
    predicate dropped into any scan is the production filter form;
    changing the mixture = changing a broadcast weight table.
    """
    docs = load_table(spark, sf_dir, "documents")
    h = F.expr(spark_md5_int("cast(doc_id as string)")) % 1000000
    thr = F.expr(f"{_SPARK_W} * 1000000 div 3")
    return docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(h < thr, 1).otherwise(0)).alias("n_kept"),
        F.max(thr).alias("keep_threshold"),
    )


# ------------------------------------------------------------- winsorize --


@query(
    "winsorized_stats",
    oracle=f"""
    WITH ranked AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type ORDER BY value)
                   AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM events
    ), cuts AS (
        SELECT event_type,
               min(CASE WHEN rn - 1 = least(CAST(floor(n * 0.05) AS BIGINT),
                                            n - 1) OR
                             rn - 1 = least(CAST(floor(n * 0.95) AS BIGINT),
                                            n - 1)
                        THEN value END) AS p05,
               max(CASE WHEN rn - 1 = least(CAST(floor(n * 0.05) AS BIGINT),
                                            n - 1) OR
                             rn - 1 = least(CAST(floor(n * 0.95) AS BIGINT),
                                            n - 1)
                        THEN value END) AS p95
        FROM ranked GROUP BY 1
    )
    SELECT e.event_type,
           count(*) AS n_events,
           max(c.p05) AS p05,
           max(c.p95) AS p95,
           {sql_stable_avg("least(greatest(e.value, c.p05), c.p95)")}
               AS winsorized_mean
    FROM events e JOIN cuts c ON e.event_type = c.event_type
    GROUP BY 1
    """,
)
def winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier-robust per-group statistics: clamp each event_type's
    values to its own exact nearest-rank [p05, p95] (the same floor(n·p)
    index convention as the latency monitor, bench/latency.py:47), then
    average the clamped values — winsorization, the standard guard
    before feeding heavy-tailed quality scores into selection thresholds.

    Cross-engine determinism: the cut values are EXISTING data points
    (nearest-rank, never interpolated) so both engines clamp identically;
    the mean uses the exact-decimal stable_avg scheme.

    Scale shape: one sort-shuffle per group partition for the ranked
    CTE (row_number over event_type), a broadcast of the #groups-sized
    cuts table back onto the scan, and a partial-agg reduction. At 100 TB
    the per-group sort is the cost — the approx_quantiles_bounded query
    is the sketch-based alternative when exactness is negotiable.
    """
    e = load_table(spark, sf_dir, "events").select("event_type", "value")
    wp = Window.partitionBy("event_type")
    ranked = e.select(
        "event_type",
        "value",
        F.row_number().over(wp.orderBy("value")).alias("rn"),
        F.count("*").over(wp).alias("n"),
    )
    is_cut = (
        F.col("rn") - 1
        == F.least(F.floor(F.col("n") * 0.05).cast("long"), F.col("n") - 1)
    ) | (
        F.col("rn") - 1
        == F.least(F.floor(F.col("n") * 0.95).cast("long"), F.col("n") - 1)
    )
    cuts = (
        ranked.where(is_cut)
        .groupBy("event_type")
        .agg(F.min("value").alias("p05"), F.max("value").alias("p95"))
    )
    clamped = e.join(F.broadcast(cuts), "event_type").select(
        "event_type",
        "p05",
        "p95",
        F.least(F.greatest("value", F.col("p05")), F.col("p95")).alias("cv"),
    )
    return clamped.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.max("p05").alias("p05"),
        F.max("p95").alias("p95"),
        stable_avg("cv").alias("winsorized_mean"),
    )


# ----------------------------------------------------- rolling active set --


@query(
    "rolling_7day_active_users",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ), bounds AS (
        SELECT min(d) AS lo, max(d) AS hi FROM days
    ), expanded AS (
        SELECT DISTINCT user_id, d + CAST(k AS INT) AS active_day
        FROM days CROSS JOIN range(0, 7) t(k)
    )
    SELECT e.active_day, count(DISTINCT e.user_id) AS wau
    FROM expanded e CROSS JOIN bounds b
    WHERE e.active_day BETWEEN b.lo AND b.hi
    GROUP BY 1
    """,
)
def rolling_7day_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day active users (WAU) per calendar day — the sliding
    distinct-count that window functions cannot express (COUNT(DISTINCT)
    over a moving frame is unsupported in every engine).

    The scalable form is the EXPLODE trick: a user active on day d
    contributes to the active sets of days d..d+6, so emit those 7
    (user, day) rows, de-dup, and count per day — turning an O(n·w)
    sliding recount into one narrow 7× row expansion plus an ordinary
    partial-agg distinct count keyed by day. At 100 TB the expansion
    happens map-side after a (user, day) de-dup that collapses each
    user's events to ≤1 row per day first, so the 7× applies to
    user-days, not raw events. Day keys are bounded → final shuffle tiny.
    """
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    days = e.distinct()
    bounds = F.broadcast(
        days.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    )
    expanded = (
        days.select(
            "user_id",
            F.explode(F.expr("sequence(0, 6)")).alias("k"),
            "d",
        )
        .select(
            "user_id", F.date_add(F.col("d"), F.col("k")).alias("active_day")
        )
        .distinct()
    )
    return (
        expanded.crossJoin(bounds)
        .where(F.col("active_day").between(F.col("lo"), F.col("hi")))
        .groupBy("active_day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )


# ------------------------------------------------------- containment dup --

_CONT_K, _CONT_BANDS, _CONT_N, _CONT_THR = 16, 4, 3, 0.6
_CONT_ROWS = _CONT_K // _CONT_BANDS


def _containment_oracle() -> str:
    sh = sql_word_shingles("text", _CONT_N)
    inter = (
        "len(list_filter(sa.shingles, s -> list_contains(sb.shingles, s)))"
    )
    return f"""
    WITH sh AS (
        SELECT doc_id, {sh} AS shingles FROM documents
    ), sigged AS (
        SELECT doc_id, {sql_minhash_sig("shingles", _CONT_K)} AS sig FROM sh
    ), banded AS (
        SELECT doc_id, b AS band_idx,
               md5(array_to_string(list_transform(
                   sig[b*{_CONT_ROWS}+1 : b*{_CONT_ROWS}+{_CONT_ROWS}],
                   x -> CAST(x AS VARCHAR)), '-')) AS bh
        FROM sigged, range(0, {_CONT_BANDS}) t(b)
    ), cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM banded a
        JOIN banded b ON a.band_idx = b.band_idx AND a.bh = b.bh
                      AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST({inter} AS DOUBLE)
             / CAST(least(len(sa.shingles), len(sb.shingles)) AS DOUBLE)
             AS containment
    FROM cand
    JOIN sh sa ON cand.doc_a = sa.doc_id
    JOIN sh sb ON cand.doc_b = sb.doc_id
    WHERE CAST({inter} AS DOUBLE)
             / CAST(least(len(sa.shingles), len(sb.shingles)) AS DOUBLE)
          >= {_CONT_THR}
    """


@query("dedup_containment", oracle=_containment_oracle())
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment near-dup: |A∩B| / min(|A|,|B|) over word
    3-shingles — catches subset/quote relationships (a short doc embedded
    in a longer one) that symmetric Jaccard under-scores because the
    union is dominated by the longer doc. The standard companion metric
    to MinHash-Jaccard in corpus dedup.

    Candidates come from the SAME banded minhash-LSH front half as
    dedup_minhash_lsh (llm/dedup.lsh_banded_buckets — one shingle pass,
    codegen'd md5 minhash under one shuffle, band-bucket self-join, never
    all-pairs); only the verify metric differs. Note containment-biased
    recall wants per-length band tuning at scale; the pigeonhole analysis
    in docs/DESIGN_100TB.md applies unchanged.
    """
    from sparkksqldbbenchmark_spark.llm.dedup import lsh_banded_buckets

    docs = load_table(spark, sf_dir, "documents")
    shingle_side, exploded = lsh_banded_buckets(
        docs,
        "text",
        "doc_id",
        num_hashes=_CONT_K,
        bands=_CONT_BANDS,
        shingle_n=_CONT_N,
    )
    left = exploded.select(F.col("doc_id").alias("doc_a"), "band_idx", "bh")
    right = exploded.select(F.col("doc_id").alias("doc_b"), "band_idx", "bh")
    cand = (
        left.join(right, on=["band_idx", "bh"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    verified = cand.join(
        shingle_side.select(
            F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a")
        ),
        "doc_a",
    ).join(
        shingle_side.select(
            F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b")
        ),
        "doc_b",
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    cont = inter / F.least(F.size("sh_a"), F.size("sh_b")).cast("double")
    return (
        verified.withColumn("containment", cont)
        .where(F.col("containment") >= _CONT_THR)
        .select("doc_a", "doc_b", "containment")
    )


# -------------------------------------------------- quality CDF normalize --


def _quality_cdf_oracle() -> str:
    from sparkksqldbbenchmark_spark.plans.llm_queries import (
        sql_quality_score,
    )

    return """
    WITH scored AS (
        SELECT doc_id, source, __QUALITY__ AS quality_score FROM documents
    ), bucketed AS (
        SELECT doc_id, source, quality_score,
               CAST(floor(quality_score * 100.0) AS BIGINT) AS bucket
        FROM scored
    ), hist AS (
        SELECT bucket, count(*) AS cnt FROM bucketed GROUP BY 1
    ), cdf AS (
        SELECT bucket,
               sum(cnt) OVER (ORDER BY bucket
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS cum,
               sum(cnt) OVER () AS n
        FROM hist
    )
    SELECT b.doc_id, b.source, b.bucket,
           CAST(c.cum AS DOUBLE) / CAST(c.n AS DOUBLE) AS cdf_pct
    FROM bucketed b JOIN cdf c ON b.bucket = c.bucket
    """.replace(
        "__QUALITY__", sql_quality_score("text")
    )


@query("quality_cdf_normalize", oracle=_quality_cdf_oracle())
def quality_cdf_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-CDF quantile normalization of the composite quality
    score: bucket every document into a fixed 0.01-wide score bucket,
    build the global CDF over the (bounded, ≤ ~120-row) bucket histogram,
    and assign each document its bucket's cumulative fraction — the
    scalable sketch of quantile normalization used to make per-source
    quality thresholds comparable ("keep the global top 30%") without a
    global sort.

    Scale shape: scoring and bucketing are scan-side codegen; the
    histogram is one bounded-key aggregation; the running sum runs over a
    CONSTANT-size frame (the histogram, single partition by design —
    same class as the prefix-sum carries in operators/packing.py); the
    CDF maps back onto the scan via broadcast join. Contrast with
    percent_rank over a global window, which would single-partition the
    full corpus — the anti-pattern this query exists to avoid.
    """
    from sparkksqldbbenchmark_spark.llm.text import with_quality_scores

    docs = load_table(spark, sf_dir, "documents")
    scored = with_quality_scores(docs).select(
        "doc_id", "source", "quality_score"
    )
    bucketed = scored.withColumn(
        "bucket", F.floor(F.col("quality_score") * 100.0).cast("long")
    )
    hist = bucketed.groupBy("bucket").agg(F.count("*").alias("cnt"))
    wcum = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cdf = hist.select(
        "bucket",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(Window.partitionBy()).alias("n"),
    )
    return bucketed.join(F.broadcast(cdf), "bucket").select(
        "doc_id",
        "source",
        "bucket",
        (F.col("cum").cast("double") / F.col("n").cast("double")).alias(
            "cdf_pct"
        ),
    )


# ------------------------------------------------- at-rest layout: Z-order --


_SV = sql_stable_sum("value", 2)
_SP = sql_stable_sum("l.l_extendedprice", 2)


@query(
    "zorder_layout_scan",
    oracle=f"""
    SELECT count(*) AS n_rows,
           min(event_id) AS min_x,
           max(user_id) AS max_y,
           {_SV} AS sum_value
    FROM events
    WHERE event_id BETWEEN ((SELECT max(event_id) FROM events) * 10) // 100
                       AND ((SELECT max(event_id) FROM events) * 35) // 100
      AND user_id BETWEEN ((SELECT max(user_id) FROM events) * 10) // 100
                      AND ((SELECT max(user_id) FROM events) * 35) // 100
    """,
)
def zorder_layout_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) multi-dimensional layout, graded — the
    fourth leg of the at-rest layout family (hash bucketing / hive
    partitioning / 1-D range sort, all already graded): events are
    clustered along the interleaved-bit curve over (event_id, user_id),
    so every output file covers a rectangle-ish TILE of the 2-D plane
    and parquet footer min/max stats are tight on BOTH dims. The graded
    assertions, read from the written footers (the same stats any
    engine's planner consults): a 2-D box touches a strict subset of
    files, and at least one file that OVERLAPS the box's event_id range
    is skipped purely by its user_id stats — the skip a 1-D
    event_id-sorted layout can never produce (each of its files spans
    the full user_id range). Delta/Iceberg `OPTIMIZE ZORDER BY` is this
    construction; at 100 TB it is the difference between "filter on the
    second dim reads everything" and proportional scan cost. The oracle
    is the plain box aggregate: layout moves scan cost, never answers."""
    from sparkksqldbbenchmark_spark.operators.layout import (
        file_range_stats,
        write_zordered,
    )
    from sparkksqldbbenchmark_spark.plans.extended_queries import (
        _scratch_dir,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    d = _scratch_dir("events_zorder", spark, sf_dir)
    write_zordered(ev, d, "event_id", "user_id", bits=8, num_files=8)

    # bounds come from the freshly-written parquet footers — the same
    # stats the skipping assertions read; a separate max() aggregate
    # would re-scan the table a third time for numbers already on disk
    xs = {f: (lo, hi) for f, lo, hi in file_range_stats(d, "event_id")}
    ys = {f: (lo, hi) for f, lo, hi in file_range_stats(d, "user_id")}
    xmax = max(hi for _, hi in xs.values())
    ymax = max(hi for _, hi in ys.values())
    x_lo, x_hi = (xmax * 10) // 100, (xmax * 35) // 100
    y_lo, y_hi = (ymax * 10) // 100, (ymax * 35) // 100
    x_overlap = {f for f, (lo, hi) in xs.items() if lo <= x_hi and hi >= x_lo}
    box_overlap = {
        f
        for f in x_overlap
        if ys[f][0] <= y_hi and ys[f][1] >= y_lo
    }
    assert 0 < len(box_overlap) < len(xs), (
        f"2-D box should touch a strict subset: {len(box_overlap)}/{len(xs)}"
    )
    assert box_overlap < x_overlap, (
        "no file was skipped by second-dim stats — layout is not "
        f"multi-dimensional: x_overlap={sorted(x_overlap)} "
        f"box={sorted(box_overlap)}"
    )

    from sparkksqldbbenchmark_spark.functions.stable import stable_sum

    return (
        spark.read.parquet(d)
        .where(
            F.col("event_id").between(x_lo, x_hi)
            & F.col("user_id").between(y_lo, y_hi)
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("event_id").alias("min_x"),
            F.max("user_id").alias("max_y"),
            stable_sum("value", 2).alias("sum_value"),
        )
    )


# --------------------------------------------------- ANN recall certificate --


def _ann_recall_oracle(nq: int = 10, k: int = 5, dim: int = 64) -> str:
    from sparkksqldbbenchmark_spark.plans.llm_queries import (
        _planes_values,
        _sql_dot,
    )

    return f"""
    WITH base AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        FROM embeddings
    ), normed AS (
        SELECT vec_id, vec, sqrt({_sql_dot("vec", "vec", dim)}) AS norm
        FROM base
    ), exact AS (
        SELECT query_id, cand_id FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY {_sql_dot("q.vec", "c.vec", dim)}
                                / (q.norm * c.norm) DESC, c.vec_id
                   ) AS rank
            FROM normed q JOIN normed c ON q.vec_id != c.vec_id
            WHERE q.vec_id < {nq}
        ) WHERE rank <= {k}
    ), buckets AS (
        SELECT n.vec_id,
               SUM(CASE WHEN {_sql_dot("n.vec", "p.pvec", dim)} >= 0.0
                        THEN (1::BIGINT << p.pid) ELSE 0::BIGINT END)
                   AS bucket
        FROM normed n, {_planes_values(4, dim)}
        GROUP BY n.vec_id
    ), nb AS (
        SELECT n.vec_id, n.vec, n.norm, b.bucket
        FROM normed n JOIN buckets b ON n.vec_id = b.vec_id
    ), ann AS (
        SELECT query_id, cand_id FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY {_sql_dot("q.vec", "c.vec", dim)}
                                / (q.norm * c.norm) DESC, c.vec_id
                   ) AS rank
            FROM nb q JOIN nb c
              ON q.bucket = c.bucket AND q.vec_id != c.vec_id
            WHERE q.vec_id < {nq}
        ) WHERE rank <= {k}
    )
    SELECT e.query_id,
           CAST(count(a.cand_id) AS BIGINT) AS hits,
           CAST(count(a.cand_id) * 100 // {k} AS BIGINT) AS recall_pct
    FROM exact e
    LEFT JOIN ann a
      ON e.query_id = a.query_id AND e.cand_id = a.cand_id
    GROUP BY e.query_id
    """


@query("ann_recall_certified", oracle=_ann_recall_oracle())
def ann_recall_certified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k certificate for the approximate similarity path — the
    measurement that justifies shipping LSH instead of brute force at
    100 TB: run the exact cosine top-k (the O(|Q|·n·d) baseline, fine
    for a sampled query set) and the hyperplane-LSH top-k over the SAME
    vectors, then score per-query |ANN ∩ exact| / k. Both legs are
    independently oracle-green rows already (`similarity_topk_cosine`,
    `similarity_ann_lsh`); this row grades the JOIN of the two — the
    number a production pipeline monitors to catch bucket-collapse or
    plane-drift regressions. Integer recall (hits, percent) keeps the
    comparison exact cross-engine. At scale the exact leg runs on a
    fixed query SAMPLE (|Q| bounded), so the certificate costs
    O(|Q|·n·d) — linear in corpus size, constant in its square."""
    from sparkksqldbbenchmark_spark.llm import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    k = 5
    exact = similarity.cosine_topk(emb).select("query_id", "cand_id")
    ann = similarity.ann_lsh_topk(emb).select(
        "query_id", "cand_id", F.lit(1).alias("hit")
    )
    return (
        exact.join(ann, ["query_id", "cand_id"], "left")
        .groupBy("query_id")
        .agg(F.count("hit").alias("hits"))
        .select(
            "query_id",
            "hits",
            # floor division on BOTH sides: DuckDB CAST(double) rounds
            # while Spark cast('long') truncates, so a k that does not
            # divide 100 would otherwise diverge
            F.expr(f"CAST(hits * 100 DIV {k} AS BIGINT)").alias(
                "recall_pct"
            ),
        )
    )


# ---------------------------------------------- runtime bloom-filter join --


@query(
    "bloom_semijoin_pushdown",
    oracle=f"""
    SELECT count(*) AS n_rows,
           {_SP} AS sum_price,
           CAST(count(DISTINCT l.l_orderkey) AS BIGINT) AS n_orders
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    """,
)
def bloom_semijoin_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime Bloom-filter pushdown — the row-level twin of dynamic
    partition pruning (already graded) and the third runtime-filter
    lever at 100 TB: when a selective dim-side filter feeds a SHUFFLE
    join (dim too big to broadcast, fact not partitioned on the key),
    Spark builds a Bloom filter from the filtered dim keys and injects
    `might_contain(...)` into the fact scan, so ~96% of fact rows die
    BEFORE the shuffle instead of after it. The graded query pins the
    injection (bloom_filter_agg + might_contain in the optimized plan)
    under in-query confs sized for the sandbox's tiny inputs (prod
    defaults only trigger at >10 GB application-side scans — exactly
    the regime the engine targets); confs are restored before return
    so the frozen plan is the only thing the setting touched. The
    oracle is the plain filtered join: the filter moves work, never
    answers (false positives are re-checked by the join itself)."""
    from sparkksqldbbenchmark_spark.functions.stable import stable_sum

    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        # AQE reads its own threshold at RUNTIME re-optimization; without
        # this pin the initial sort-merge join could still flip to
        # broadcast when the query executes, silently voiding the
        # plan-shape claim below even though the answer is unaffected
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter."
        "creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
    }
    saved: dict[str, str | None] = {}
    for key in confs:
        try:
            saved[key] = spark.conf.get(key)
        except Exception:
            saved[key] = None
    try:
        for key, val in confs.items():
            spark.conf.set(key, val)
        dim = o.where(F.col("o_orderpriority") == "1-URGENT")
        out = (
            l.join(dim, l.l_orderkey == dim.o_orderkey)
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                stable_sum("l_extendedprice", 2).alias("sum_price"),
                F.count_distinct(F.col("l_orderkey")).alias("n_orders"),
            )
        )
        # Execute INSIDE the conf window and assert on the POST-execution
        # plan: freezing only the pre-execution executedPlan() is not
        # enough under AQE — the printed plan is the initial one inside
        # AdaptiveSparkPlan, and runtime re-optimization (which reads the
        # session conf at execution time) could still swap the sort-merge
        # join for a broadcast after the finally block restores the
        # thresholds. Collecting here means the adaptive final plan below
        # is the plan that actually produced the graded rows.
        rows = out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan and "bloom_filter_agg" in plan, (
            "runtime bloom filter not injected:\n" + plan
        )
        assert "BroadcastHashJoin" not in plan, (
            "dim side was broadcast — not the shuffle-join regime this "
            "row grades:\n" + plan
        )
        # 1-row aggregate, re-wrapped so the driver's later collect sees
        # exactly the rows the asserted execution produced
        return spark.createDataFrame(rows, out.schema)
    finally:
        for key, old in saved.items():
            if old is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, old)


# ------------------------------------------- chained stateful streaming --


@query(
    "streaming_chained_window_agg",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL 2 HOUR, ts),
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*) AS message_count,
           {SS} AS sum_value
    FROM events
    GROUP BY 1, 2
    HAVING max(time_bucket(INTERVAL 2 HOUR, ts)) + INTERVAL 2 HOUR
           <= (SELECT max(ts) FROM events) - INTERVAL 90 MINUTE
    """.replace("{SS}", sql_stable_sum("value", 2)),
)
def streaming_chained_window_agg(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TWO stateful window aggregations chained in ONE streaming query —
    the multi-stateful-operator pipeline Spark supports natively since
    3.5 (and the reason a metrics rollup no longer needs two jobs + an
    intermediate topic): a 30-minute tumbling pre-aggregate feeds a
    2-hour re-aggregate keyed on `window(window, ...)`, both stateful,
    one checkpoint. Append mode + watermark drive BOTH state stores'
    eviction; the final emitted set is exactly the 2-hour windows the
    final watermark (max event time − 90 min) closed, which the oracle
    recomputes relationally — the same closed-set rule the graded
    `streaming_watermarked_append` row pins for one operator, here
    proven through a two-deep stateful chain. At scale the pre-aggregate
    shrinks the second shuffle to |30-min windows × groups| rows — the
    partial-aggregation idea applied across stateful stages. The inner
    2-dp sums are exact decimals, so re-summing them equals the oracle's
    one-shot sum over raw rows (functions/stable.py)."""
    from sparkksqldbbenchmark_spark.functions.stable import stable_sum
    from sparkksqldbbenchmark_spark.plans.streaming_queries import (
        _read_events_stream,
    )
    from sparkksqldbbenchmark_spark.streaming.pipeline import run_to_memory

    stream = _read_events_stream(spark, sf_dir).withWatermark(
        "ts", "90 minutes"
    )
    inner = stream.groupBy(
        F.window("ts", "30 minutes").alias("window"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("inner_count"),
        stable_sum("value", 2).alias("inner_sum"),
    )
    outer = (
        inner.groupBy(
            F.window(F.col("window"), "2 hours").alias("window2"),
            "event_type",
        )
        .agg(
            F.sum("inner_count").alias("message_count"),
            stable_sum("inner_sum", 2).alias("sum_value"),
        )
        .select(
            F.date_format("window2.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "message_count",
            "sum_value",
        )
    )
    import uuid

    name = f"stream_chain_{uuid.uuid4().hex[:8]}"
    q = run_to_memory(outer, name, output_mode="append")
    q.stop()
    return spark.table(name)


# ------------------------------------------ cross-source dup contamination --


def _cross_source_oracle() -> str:
    from sparkksqldbbenchmark_spark.plans.llm_queries import _minhash_oracle

    return f"""
    WITH pairs AS ({_minhash_oracle()})
    SELECT least(da.source, db.source) AS source_a,
           greatest(da.source, db.source) AS source_b,
           count(*) AS n_pairs,
           CAST(count(DISTINCT CASE WHEN da.source <= db.source
                                    THEN p.doc_a ELSE p.doc_b END)
                AS BIGINT) AS n_docs_a
    FROM pairs p
    JOIN documents da ON p.doc_a = da.doc_id
    JOIN documents db ON p.doc_b = db.doc_id
    GROUP BY 1, 2
    """


@query("dedup_cross_source_matrix", oracle=_cross_source_oracle())
def dedup_cross_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix — the contamination AUDIT built on
    the near-dup pair machinery: label each verified minhash-LSH pair
    with its endpoints' source fields and aggregate to an
    upper-triangular (source_a ≤ source_b) matrix of pair counts plus
    the distinct count of the lower-source endpoint docs. This is how a
    corpus owner finds "web scrape X is 40% re-crawl of dump Y" or
    leakage from an eval source into training — per-PAIR grain stays
    bounded by the LSH candidate set (never n²), and the two doc-id
    joins broadcast only the doc→source projection. The distinct-doc
    tiebreak (endpoint of the lexicographically smaller source) keeps
    the count well-defined when both endpoints share a source."""
    from sparkksqldbbenchmark_spark.llm import dedup

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, "text", "doc_id")
    src = docs.select("doc_id", "source")
    labeled = (
        pairs.join(
            F.broadcast(src).withColumnsRenamed(
                {"doc_id": "doc_a", "source": "src_a"}
            ),
            "doc_a",
        )
        .join(
            F.broadcast(src).withColumnsRenamed(
                {"doc_id": "doc_b", "source": "src_b"}
            ),
            "doc_b",
        )
    )
    return (
        labeled.select(
            F.least("src_a", "src_b").alias("source_a"),
            F.greatest("src_a", "src_b").alias("source_b"),
            F.when(F.col("src_a") <= F.col("src_b"), F.col("doc_a"))
            .otherwise(F.col("doc_b"))
            .alias("low_doc"),
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.count_distinct("low_doc").alias("n_docs_a"),
        )
    )


# ----------------------------------------------------- SCD-2 dimension --


@query(
    "scd2_dimension_build",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER w AS prev_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
    ), changes AS (
        SELECT user_id, event_type, ts, event_id
        FROM ordered
        WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id,
           event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
           strftime(lead(ts) OVER w, '%Y-%m-%d %H:%M:%S') AS valid_to,
           CAST(row_number() OVER w AS BIGINT) AS version,
           CAST(lead(ts) OVER w IS NULL AS BOOLEAN) AS is_current
    FROM changes
    WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
    """,
)
def scd2_dimension_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 build from a change stream — the
    standard warehouse pattern for "what was this user's state at time
    T": collapse consecutive equal attribute values per key (change
    detection via lag), then stamp each surviving change with its
    validity interval [valid_from, valid_to) via lead, a version
    counter, and the open-ended is_current marker. ONE shuffle on the
    key; both window passes share the (user_id × event_id) sort, so
    Catalyst plans a single Sort under both Window operators. At 100 TB
    the key-partitioned window is embarrassingly parallel (no global
    order), and the change-compression pass shrinks the dimension to
    |changes| rows before the interval stamping. The deterministic
    event_id tiebreak makes versions reproducible under equal
    timestamps."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = W.partitionBy("user_id").orderBy("event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .where(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .drop("prev_type")
    )
    return changes.select(
        "user_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format(F.lead("ts").over(w), "yyyy-MM-dd HH:mm:ss").alias(
            "valid_to"
        ),
        F.row_number().over(w).cast("long").alias("version"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


# ------------------------------------------------ deterministic sampling --


@query(
    "group_exact_k_sample",
    oracle="""
    SELECT doc_id, source, pick_rank FROM (
        SELECT doc_id, source,
               CAST(row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR) || '/sample'),
                            doc_id
               ) AS BIGINT) AS pick_rank
        FROM documents
    ) WHERE pick_rank <= 20
    """,
)
def group_exact_k_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-group deterministic sample — the eval-set/holdout
    builder stratified_sample (Bernoulli, EXPECTED rate) cannot provide:
    rank rows inside each group by a salted md5 of their id (uniform,
    reproducible, engine-independent) and keep the first k. Unlike
    ORDER BY rand() this survives retries/re-runs bit-identically, and
    unlike reservoir sampling it needs no driver state: one shuffle on
    the group key, the per-group top-k window pattern. The doc_id
    tiebreak covers the (astronomically unlikely) md5 collision so
    row_number stays deterministic. At 100 TB the rank-window input is
    the group's rows only — no global sort, no collect."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("/sample"))),
        "doc_id",
    )
    return (
        docs.select(
            "doc_id",
            "source",
            F.row_number().over(w).cast("long").alias("pick_rank"),
        )
        .where(F.col("pick_rank") <= 20)
    )


# ---------------------------------------------------- column statistics --


@query(
    "analyze_column_stats",
    oracle="""
    SELECT 'event_id' AS col, count(*) AS n_rows,
           count(event_id) AS n_nonnull,
           CAST(count(DISTINCT event_id) AS BIGINT) AS ndv,
           CAST(min(event_id) AS VARCHAR) AS min_str,
           CAST(max(event_id) AS VARCHAR) AS max_str
    FROM events
    UNION ALL
    SELECT 'user_id', count(*), count(user_id),
           CAST(count(DISTINCT user_id) AS BIGINT),
           CAST(min(user_id) AS VARCHAR), CAST(max(user_id) AS VARCHAR)
    FROM events
    UNION ALL
    SELECT 'event_type', count(*), count(event_type),
           CAST(count(DISTINCT event_type) AS BIGINT),
           min(event_type), max(event_type)
    FROM events
    """,
)
def analyze_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column statistics (rows, non-null count, NDV,
    min/max) for the planner-stats backbone every cost-based optimizer
    feeds on — computed for three columns in ONE scan via per-column
    aggregates, then reshaped to the (col, stats) long form with a
    stack/unpivot (no second pass, no per-column scans the naive
    ANALYZE loop would issue). min/max are stringified so one schema
    carries numeric and string columns alike. Exact NDV here (graded
    cross-engine); production would swap approx_count_distinct per
    column under the same one-scan shape — that swap is itself graded
    by the approx_count_distinct row. Shuffle honesty: the EXACT NDVs
    are what shuffle here (each count_distinct expands its column's
    distinct values through the exchange — see this row in
    docs/SHUFFLE_AUDIT.md); the production approx swap collapses that
    to mergeable constant-size HLL sketches, making the pass
    effectively scan-bound. Still one scan either way."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("event_id").alias("nn_id"),
        F.count_distinct("event_id").alias("ndv_id"),
        F.min("event_id").cast("string").alias("min_id"),
        F.max("event_id").cast("string").alias("max_id"),
        F.count("user_id").alias("nn_uid"),
        F.count_distinct("user_id").alias("ndv_uid"),
        F.min("user_id").cast("string").alias("min_uid"),
        F.max("user_id").cast("string").alias("max_uid"),
        F.count("event_type").alias("nn_et"),
        F.count_distinct("event_type").alias("ndv_et"),
        F.min("event_type").alias("min_et"),
        F.max("event_type").alias("max_et"),
    )
    return agg.select(
        F.expr(
            "stack(3,"
            " 'event_id', n, nn_id, ndv_id, min_id, max_id,"
            " 'user_id', n, nn_uid, ndv_uid, min_uid, max_uid,"
            " 'event_type', n, nn_et, ndv_et, min_et, max_et)"
            " AS (col, n_rows, n_nonnull, ndv, min_str, max_str)"
        )
    )


# ----------------------------------------------------- null-safe join --


@query(
    "nullsafe_join_agg",
    oracle="""
    WITH l AS (
        SELECT CASE WHEN event_id % 7 = 0 THEN NULL ELSE user_id END AS k
        FROM events
    ), r AS (
        SELECT DISTINCT
               CASE WHEN user_id % 5 = 0 THEN NULL ELSE user_id END AS k,
               user_id % 3 AS grp
        FROM events
    )
    SELECT coalesce(CAST(l.k AS VARCHAR), '<null>') AS join_key,
           count(*) AS n_rows,
           CAST(count(DISTINCT r.grp) AS BIGINT) AS n_grps
    FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
    GROUP BY 1
    """,
)
def nullsafe_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (`<=>` ≡ IS NOT DISTINCT FROM) — the join
    variant where NULL keys MATCH each other instead of silently
    dropping, the classic source of "why did my row count change"
    migration bugs. Spark plans `<=>` as a true hash-join key (no
    fallback to nested-loop), so the null bucket rides the same shuffle
    as everything else; the graded row proves the null×null matches
    exist (the '<null>' output group) and that both engines agree on
    every group. A hot null bucket at scale is just a skewed key —
    the salting/AQE-skew machinery graded elsewhere applies
    unchanged."""
    ev = load_table(spark, sf_dir, "events")
    left = ev.select(
        F.when(F.col("event_id") % 7 == 0, F.lit(None))
        .otherwise(F.col("user_id"))
        .alias("k"),
    )
    right = ev.select(
        F.when(F.col("user_id") % 5 == 0, F.lit(None))
        .otherwise(F.col("user_id"))
        .alias("k"),
        (F.col("user_id") % 3).alias("grp"),
    ).distinct()
    return (
        left.join(right, left.k.eqNullSafe(right.k))
        .select(
            F.coalesce(left.k.cast("string"), F.lit("<null>")).alias(
                "join_key"
            ),
            "grp",
        )
        .groupBy("join_key")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct("grp").alias("n_grps"),
        )
    )


# --------------------------------------------------------- CDC apply --


@query(
    "cdc_snapshot_apply",
    oracle="""
    WITH ops AS (
        SELECT user_id AS key,
               event_id,
               value,
               CASE WHEN event_id % 10 = 0 THEN 'D'
                    WHEN event_id % 3 = 0 THEN 'U'
                    ELSE 'I' END AS op
        FROM events
    ), latest AS (
        SELECT key,
               max_by(op, event_id) AS last_op,
               max_by(value, event_id) AS last_value,
               max(event_id) AS last_event_id,
               count(*) AS n_changes
        FROM ops GROUP BY key
    )
    SELECT key, last_value, last_event_id, n_changes
    FROM latest
    WHERE last_op <> 'D'
    """,
)
def cdc_snapshot_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture snapshot apply — the MERGE that turns a
    change stream (insert/update/delete ops) into the current table
    state: one max_by aggregate per key picks the latest op in change
    order, keys whose final op is a delete drop out, everything else
    materializes its latest value. This is the Debezium/Delta-merge
    pattern reduced to its scale-safe core: ONE shuffle on the key,
    no iterative apply, no sort of the full history — max_by's
    partial aggregation keeps only (op, value, id) triples per key per
    partition. Ops are derived deterministically from event_id residues
    (10% deletes, ~30% updates) so both engines see the identical
    change stream. The n_changes count proves the full history was
    consumed, not just the winning row."""
    ev = load_table(spark, sf_dir, "events")
    ops = ev.select(
        F.col("user_id").alias("key"),
        "event_id",
        "value",
        F.when(F.col("event_id") % 10 == 0, F.lit("D"))
        .when(F.col("event_id") % 3 == 0, F.lit("U"))
        .otherwise(F.lit("I"))
        .alias("op"),
    )
    latest = ops.groupBy("key").agg(
        F.max_by("op", "event_id").alias("last_op"),
        F.max_by("value", "event_id").alias("last_value"),
        F.max("event_id").alias("last_event_id"),
        F.count(F.lit(1)).alias("n_changes"),
    )
    return latest.where(F.col("last_op") != "D").select(
        "key", "last_value", "last_event_id", "n_changes"
    )


@query(
    "streaming_cdc_latest",
    oracle="""
    WITH ops AS (
        SELECT user_id AS key,
               event_id,
               value,
               CASE WHEN event_id % 10 = 0 THEN 'D'
                    WHEN event_id % 3 = 0 THEN 'U'
                    ELSE 'I' END AS op
        FROM events
    ), latest AS (
        SELECT key,
               max_by(op, event_id) AS last_op,
               max_by(value, event_id) AS last_value,
               max(event_id) AS last_event_id
        FROM ops GROUP BY key
    )
    SELECT key, last_value, last_event_id
    FROM latest
    WHERE last_op <> 'D'
    """,
)
def streaming_cdc_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CDC snapshot maintained as a STREAM — cdc_snapshot_apply's
    continuous twin: the change feed flows through a stateful max_by
    aggregate (latest op/value per key in change order), and the
    delete filter applies to the aggregate's continuously-updated
    output, so a key vanishes from the materialization the moment its
    latest change is a delete and reappears if a later insert arrives.
    Complete-mode memory sink holds exactly the final snapshot, which
    must hash-match the batch merge — stream-batch equivalence, the
    same argument every streaming row here rides on. State per key is
    three scalars; the filter is stateless post-aggregate. This is the
    Debezium→materialized-table topology with the merge expressed as
    aggregation instead of per-row MERGE INTO."""
    from sparkksqldbbenchmark_spark.plans.streaming_queries import (
        _read_events_stream,
    )
    from sparkksqldbbenchmark_spark.streaming.pipeline import run_to_memory

    stream = _read_events_stream(spark, sf_dir)
    ops = stream.select(
        F.col("user_id").alias("key"),
        "event_id",
        "value",
        F.when(F.col("event_id") % 10 == 0, F.lit("D"))
        .when(F.col("event_id") % 3 == 0, F.lit("U"))
        .otherwise(F.lit("I"))
        .alias("op"),
    )
    latest = (
        ops.groupBy("key")
        .agg(
            F.max_by("op", "event_id").alias("last_op"),
            F.max_by("value", "event_id").alias("last_value"),
            F.max("event_id").alias("last_event_id"),
        )
        .where(F.col("last_op") != "D")
        .select("key", "last_value", "last_event_id")
    )
    import uuid

    name = f"stream_cdc_{uuid.uuid4().hex[:8]}"
    q = run_to_memory(latest, name, output_mode="complete")
    q.stop()
    return spark.table(name)
