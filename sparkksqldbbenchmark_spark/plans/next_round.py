"""Round-13 staging area: fully-built, oracle-verified queries that are
NOT yet registered with the driver-graded registry.

Why a separate module: the driver grades exactly the first 50 entries of
``__spark_entry__.queries()`` and the round-12 head is committed (8
flagships + the 42 round-11 graduates in plans/round11_queries.py).
New work lands here with a MODULE-LOCAL registry; tests/test_next_round.py
runs the same Spark-vs-DuckDB comparison the driver runs, so each staged
query is already verified green before it rotates into the graded head
next round (swap ``staged_query`` for ``plans.registry.query``, import
the module from ``__spark_entry__``, and move freshly-green head rows to
TAIL with pins -- mechanics as executed in rounds 6-12, see
plans/round6_queries.py .. round11_queries.py history).

Opening cohort: the eleven suite siblings held back from the round-11
graduation (53 staged > 42 free slots; docs/ROTATION_R11.md holdback
priority -- suite rows whose machinery already carries a graded
sibling) -- each verified at sf0.001/0.01/0.1 while staged in round 10.
New round-12 staging lands below them.

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
# Held back from the round-11 graduation (docs/ROTATION_R11.md):
# graded siblings cover each one's machinery; they graduate round 13.
# ===================================================================

# -------------------------------------- aggregate-modifier breadth --


@staged_query(
    "agg_breadth_suite",
    oracle="""
    SELECT event_type,
           CAST(count_if(value > 500) AS BIGINT) AS n_high,
           bool_and(value >= 0) AS all_nonneg,
           bool_or(value > 999) AS any_extreme,
           any_value(upper(event_type)) AS type_upper,
           CAST(sum(DISTINCT CAST(floor(value * 100) AS BIGINT))
                AS BIGINT) AS distinct_cents_sum,
           count(DISTINCT CAST(floor(value * 100) AS BIGINT))
               AS distinct_cents
    FROM events GROUP BY event_type
    """,
)
def agg_breadth_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-surface breadth: count_if, bool_and/bool_or,
    any_value (made deterministic by aggregating a group-constant
    expression — the only sound use of an otherwise arbitrary-pick
    aggregate), and DISTINCT-modified sum/count over exact cents.
    Completes the aggregate-modifier matrix started by
    filter_clause_agg (FILTER), listagg_ordered (WITHIN GROUP) and
    the r8 collation rows.

    Scale shape: count_if/bool_* are constant-state partial aggs;
    the DISTINCT pair adds one dedup exchange on (group, value) —
    bounded by distinct cents (≤100k) per type, not rows.

    Reference basis: SURVEY §2.4 A7/A9 surface extension."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100).cast("long")
    return ev.groupBy("event_type").agg(
        F.expr("count_if(value > 500)").alias("n_high"),
        F.expr("bool_and(value >= 0)").alias("all_nonneg"),
        F.expr("bool_or(value > 999)").alias("any_extreme"),
        F.any_value(F.upper("event_type")).alias("type_upper"),
        F.sum_distinct(cents).cast("long").alias("distinct_cents_sum"),
        F.count_distinct(cents).alias("distinct_cents"),
    )


# ----------------------------------- score calibration reliability --


@staged_query(
    "score_calibration_bins",
    oracle="""
    WITH scored AS (
        SELECT doc_id,
               (('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '#cal'),
                                   1, 15))::BIGINT % 1000) AS pred_ppk,
               CASE WHEN n_chars > 900 THEN 1 ELSE 0 END AS label
        FROM documents
    )
    SELECT pred_ppk // 100 AS bin,
           count(*) AS n,
           CAST(sum(pred_ppk) AS BIGINT) AS pred_ppk_sum,
           CAST(sum(label) AS BIGINT) AS n_pos,
           (CAST(sum(pred_ppk) AS DOUBLE) / (count(*) * 1000))
               - (CAST(sum(label) AS DOUBLE) / count(*)) AS calib_gap
    FROM scored GROUP BY 1
    """,
)
def score_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram bins for a quality classifier: bucket a
    deterministic pseudo-score (cross-engine md5-int, llm/hashing.py)
    into deciles and compare mean predicted probability against the
    observed positive rate per bin — the calibration audit every
    model-scored curation pipeline runs before trusting its scores as
    sampling weights (miscalibrated scores silently skew the kept
    corpus). Integer sums carry exactly; the gap is two IEEE divisions
    in fixed order.

    Scale shape: scan → ten-group partial agg. Nothing else.

    Reference basis: LLM-pipeline extension; consumer side of the
    quality scores graded since r2 (text_quality_scores)."""
    from sparkksqldbbenchmark_spark.llm.hashing import spark_md5_int

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        (
            F.expr(spark_md5_int("concat(cast(doc_id as string), '#cal')"))
            % 1000
        ).alias("pred_ppk"),
        F.when(F.col("n_chars") > 900, 1).otherwise(0).alias("label"),
    )
    n = F.count(F.lit(1))
    return scored.groupBy(
        (F.col("pred_ppk") / 100).cast("long").alias("bin")
    ).agg(
        n.alias("n"),
        F.sum("pred_ppk").cast("long").alias("pred_ppk_sum"),
        F.sum("label").cast("long").alias("n_pos"),
        (
            (F.sum("pred_ppk").cast("double") / (n * 1000))
            - (F.sum("label").cast("double") / n)
        ).alias("calib_gap"),
    )


# ----------------------------------- DataFrame.transpose (Spark 4) --


@staged_query(
    "dataframe_transpose_suite",
    oracle="""
    WITH m AS (
        SELECT event_type,
               count(*) AS n_events,
               CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents_sum,
               CAST(max(event_id) AS BIGINT) AS max_event_id
        FROM events GROUP BY event_type
    )
    SELECT 'n_events' AS metric,
           CAST(max(CASE WHEN event_type = 'click' THEN n_events END)
                AS BIGINT) AS click,
           CAST(max(CASE WHEN event_type = 'error' THEN n_events END)
                AS BIGINT) AS error,
           CAST(max(CASE WHEN event_type = 'purchase' THEN n_events END)
                AS BIGINT) AS purchase,
           CAST(max(CASE WHEN event_type = 'signup' THEN n_events END)
                AS BIGINT) AS signup,
           CAST(max(CASE WHEN event_type = 'view' THEN n_events END)
                AS BIGINT) AS view
    FROM m
    UNION ALL
    SELECT 'cents_sum',
           max(CASE WHEN event_type = 'click' THEN cents_sum END),
           max(CASE WHEN event_type = 'error' THEN cents_sum END),
           max(CASE WHEN event_type = 'purchase' THEN cents_sum END),
           max(CASE WHEN event_type = 'signup' THEN cents_sum END),
           max(CASE WHEN event_type = 'view' THEN cents_sum END)
    FROM m
    UNION ALL
    SELECT 'max_event_id',
           max(CASE WHEN event_type = 'click' THEN max_event_id END),
           max(CASE WHEN event_type = 'error' THEN max_event_id END),
           max(CASE WHEN event_type = 'purchase' THEN max_event_id END),
           max(CASE WHEN event_type = 'signup' THEN max_event_id END),
           max(CASE WHEN event_type = 'view' THEN max_event_id END)
    FROM m
    """,
)
def dataframe_transpose_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``DataFrame.transpose`` (Spark 4.0) — rows↔columns over an
    aggregate: per-type metrics become one column per event type, one
    row per metric, with the index column's values becoming column
    NAMES at plan time (transpose must execute the child to learn
    them — a deliberate eager step, fine over an already-aggregated
    5-row input). The oracle spells the same reshape as conditional
    aggregation, so every transposed cell is value-checked. All
    metrics pre-cast to BIGINT: transpose requires a least common
    type across the value columns.

    Scale shape: transpose is driver-bounded by |index values| ×
    |metrics| — legitimate ONLY downstream of an aggregate (exactly
    this shape: 5×3). The unbounded direction (transposing a fact
    table) is a modeling error, not an engine path.

    Reference basis: reshape family sibling of pivot/unpivot
    (SURVEY §2 reshape rows, graded since r4)."""
    ev = load_table(spark, sf_dir, "events")
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.floor(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("cents_sum"),
        F.max("event_id").cast("long").alias("max_event_id"),
    )
    # transpose: index column first; metric names arrive in a `key`
    # column named after the index column's header semantics
    t = m.transpose(F.col("event_type"))
    return t.withColumnRenamed("key", "metric")


# ------------------------------------------- DataFrame.melt API --


@staged_query(
    "melt_api_reshape",
    oracle="""
    SELECT o_orderkey,
           'price_cents' AS measure,
           CAST(CAST(o_totalprice AS DECIMAL(38,6)) * 100 AS BIGINT)
               AS val
    FROM orders WHERE o_orderkey < 2000
    UNION ALL
    SELECT o_orderkey, 'status_code',
           CAST(ascii(substring(o_orderstatus, 1, 1)) AS BIGINT)
    FROM orders WHERE o_orderkey < 2000
    UNION ALL
    SELECT o_orderkey, 'order_year',
           CAST(year(o_orderdate) AS BIGINT)
    FROM orders WHERE o_orderkey < 2000
    """,
)
def melt_api_reshape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``DataFrame.melt`` — the DataFrame-API unpivot (the SQL UNPIVOT
    surface graded via groupby_all_unpivot_sql in r8; this grades the
    API twin pandas users reach for): three typed measures melt into
    (id, measure, val) rows, the oracle re-derives the long form as a
    UNION ALL expansion. Measures pre-cast to BIGINT — melt, like
    UNPIVOT, requires a least common value type, and exact cents keep
    the comparison integral.

    Scale shape: melt compiles to the same Expand node as UNPIVOT —
    |measures|× row replication, scan-side, no shuffle.

    Reference basis: reshape family (SURVEY §2 pivot/unpivot rows)."""
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderkey") < 2000
    )
    typed = o.select(
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(38,6)") * 100)
        .cast("long")
        .alias("price_cents"),
        F.ascii(F.substring("o_orderstatus", 1, 1))
        .cast("long")
        .alias("status_code"),
        F.year("o_orderdate").cast("long").alias("order_year"),
    )
    return typed.melt(
        ids=["o_orderkey"],
        values=["price_cents", "status_code", "order_year"],
        variableColumnName="measure",
        valueColumnName="val",
    )


# ------------------------------------------ string format breadth --


@staged_query(
    "string_format_suite",
    oracle="""
    SELECT event_id,
           printf('%s-%05d', event_type, event_id) AS tagged,
           lpad(event_type, 10, '.') AS padded_l,
           rpad(event_type, 10, '.') AS padded_r,
           translate(event_type, 'aeiou', 'AEIOU') AS vowel_caps,
           upper(substring(event_type, 1, 1))
               || lower(substring(event_type, 2)) AS init_cap,
           reverse(event_type) AS reversed,
           repeat(substring(event_type, 1, 2), 3) AS repeated
    FROM events WHERE event_id < 3000
    """,
)
def string_format_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String formatting breadth: format_string (printf semantics with
    width/zero-pad flags), lpad/rpad with custom fill, translate
    (character mapping), initcap (oracle spells it definitionally —
    DuckDB has no initcap; single-token inputs make the expansion
    exact), reverse, repeat. Complements string_suite2 (r9: split/
    substring index/soundex-adjacent ops) with the FORMATTING half of
    the F-suite surface.

    Scale shape: scan-side codegen expressions, zero shuffles.

    Reference basis: SURVEY §2.8 scalar-function family (F2-F8
    string ops)."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_id") < 3000
    )
    return ev.select(
        "event_id",
        F.format_string("%s-%05d", "event_type", "event_id").alias(
            "tagged"
        ),
        F.lpad("event_type", 10, ".").alias("padded_l"),
        F.rpad("event_type", 10, ".").alias("padded_r"),
        F.translate("event_type", "aeiou", "AEIOU").alias("vowel_caps"),
        F.initcap("event_type").alias("init_cap"),
        F.reverse("event_type").alias("reversed"),
        F.repeat(F.substring("event_type", 1, 2), 3).alias("repeated"),
    )


# ------------------------------- ORDER BY ALL + OFFSET pagination --


@staged_query(
    "order_by_all_offset_sql",
    oracle="""
    SELECT o_orderpriority,
           CAST(o_orderdate AS DATE) AS od,
           count(*) AS n,
           CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
    FROM orders WHERE o_orderkey < 30000
    GROUP BY 1, 2
    ORDER BY ALL
    LIMIT 50 OFFSET 100
    """,
)
def order_by_all_offset_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ORDER BY ALL`` + ``LIMIT ... OFFSET`` — the pagination idiom
    (modern-SQL ergonomics row, sibling of GROUP BY ALL graded in r8):
    ORDER BY ALL sorts by every select-list column left-to-right, which
    over a grouped result is a TOTAL order — making OFFSET pagination
    deterministic, the property this row grades (an OFFSET under a
    partial order is a lottery). Both engines run the identical text.

    Scale shape: global sort limited by LIMIT+OFFSET — Spark plans
    TakeOrderedAndProject with k = offset+limit, so the driver
    materializes 150 rows, not the table. Deep pagination (OFFSET ≫)
    degrades by construction in ANY engine; keyset pagination is the
    100 TB answer and is already graded via the rank-cut rows.

    Reference basis: SURVEY §2.6 O-family (sorts/top-k) SQL surface."""
    _view(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(o_orderdate AS DATE) AS od,
               count(*) AS n,
               CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders WHERE o_orderkey < 30000
        GROUP BY 1, 2
        ORDER BY ALL
        LIMIT 50 OFFSET 100
        """
    )


# --------------------------------------- EXECUTE IMMEDIATE --


@staged_query(
    "execute_immediate_sql",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
               AS cents
    FROM events
    WHERE user_id < 400 AND event_id % 3 = 1
    GROUP BY 1
    """,
)
def execute_immediate_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``EXECUTE IMMEDIATE`` (Spark 4 dynamic SQL): the query text is a
    VALUE — assembled at runtime and executed with named parameter
    binding (USING ... AS alias), the safe-templating primitive that
    replaces string concatenation in orchestration code (parameters
    bind as typed literals, closing the injection hole). Completes the
    dynamic-SQL trio: session variables (r9), IDENTIFIER() binding
    (r9), and now statement-level dynamic execution. The oracle is the
    statically-spelled equivalent.

    Scale shape: plan-time indirection only — the executed statement
    compiles to the same aggregate plan as its static twin.

    Reference basis: SQL-surface extension (SURVEY §2 A2 front door:
    the reference drives everything through ksql strings — dynamic SQL
    is that workflow made parameter-safe)."""
    _view(spark, sf_dir, "events")
    return spark.sql(
        """
        EXECUTE IMMEDIATE
            'SELECT event_type,
                    count(*) AS n,
                    CAST(sum(CAST(floor(value * 100) AS BIGINT))
                         AS BIGINT) AS cents
             FROM events
             WHERE user_id < :u AND event_id % :m = 1
             GROUP BY 1'
            USING 400 AS u, 3 AS m
        """
    )


# -------------------------- nth_value / frame-default traps --


@staged_query(
    "nth_value_window_suite",
    oracle="""
    SELECT user_id, event_id,
           nth_value(value, 2) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS second_value,
           first_value(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS first_seen,
           last_value(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS last_default_frame,
           last_value(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS last_full_frame
    FROM events WHERE user_id < 50
    """,
)
def nth_value_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value + the DEFAULT-FRAME trap, pinned: with an ORDER BY and
    no frame clause, the ANSI default frame is RANGE UNBOUNDED
    PRECEDING..CURRENT ROW — so `last_value` over the default frame is
    just the CURRENT row (the classic window bug), while the explicit
    full frame gives the partition's true last. Both spellings graded
    side by side, plus nth_value(2) over the full frame and
    first_value (where the default frame IS correct). Both engines run
    the identical ANSI text.

    Scale shape: one window exchange+sort per partition spec — all
    four functions share the same (user_id | ts,event_id) spec, so
    Catalyst computes them in a single Window operator pass.

    Reference basis: SURVEY §2.5 W-family completion (navigation
    functions graded since r3/r8; this pins the frame-default
    semantics)."""
    _view(spark, sf_dir, "events")
    return spark.sql(
        """
        SELECT user_id, event_id,
               nth_value(value, 2) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING
                            AND UNBOUNDED FOLLOWING
               ) AS second_value,
               first_value(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS first_seen,
               last_value(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS last_default_frame,
               last_value(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING
                            AND UNBOUNDED FOLLOWING
               ) AS last_full_frame
        FROM events WHERE user_id < 50
        """
    )


# ------------------- inter-arrival dyadic histogram --


@staged_query(
    "interarrival_dyadic_histogram",
    oracle="""
    WITH deltas AS (
        SELECT user_id,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS d_us
        FROM events
    )
    SELECT CAST(length(bin(greatest(d_us, 1))) AS INTEGER)
               AS delta_bucket,
           count(*) AS n_gaps,
           CAST(sum(d_us) AS BIGINT) AS total_us,
           CAST(min(d_us) AS BIGINT) AS min_us,
           CAST(max(d_us) AS BIGINT) AS max_us
    FROM deltas WHERE d_us IS NOT NULL
    GROUP BY 1
    """,
)
def interarrival_dyadic_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Inter-arrival-time distribution in DYADIC microsecond buckets
    (bucket = bit count of the gap — the log-free log₂ again): the
    traffic-shape fingerprint behind capacity planning and bot
    detection (human sessions produce a bimodal dyadic histogram —
    within-burst vs between-visit gaps; constant-rate automation
    collapses to one bucket). Per-user consecutive gaps via one
    lag window, exact integer microseconds end to end.

    Scale shape: one hash exchange on user_id + in-partition sort for
    the lag, then a ≤64-row bucket aggregate — the sessionize plan
    family with the histogram readout instead of islands.

    Reference basis: time-series diagnostics family (Fano burstiness
    r10, ACF r10 — this adds the gap-distribution view)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    deltas = ev.select(
        (
            F.unix_micros("ts")
            - F.lag(F.unix_micros("ts")).over(w)
        ).alias("d_us")
    ).where(F.col("d_us").isNotNull())
    return deltas.groupBy(
        F.length(F.bin(F.greatest("d_us", F.lit(1))))
        .cast("int")
        .alias("delta_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("d_us").cast("long").alias("total_us"),
        F.min("d_us").cast("long").alias("min_us"),
        F.max("d_us").cast("long").alias("max_us"),
    )


# ----------------------------- OHLC hourly bars --


@staged_query(
    "ohlc_hourly_bars",
    oracle="""
    WITH e AS (
        SELECT event_type,
               time_bucket(INTERVAL 1 HOUR, ts) AS h,
               CAST(floor(value * 100) AS BIGINT) AS cents,
               row_number() OVER (
                   PARTITION BY event_type,
                                time_bucket(INTERVAL 1 HOUR, ts)
                   ORDER BY ts, event_id
               ) AS rn_open,
               row_number() OVER (
                   PARTITION BY event_type,
                                time_bucket(INTERVAL 1 HOUR, ts)
                   ORDER BY ts DESC, event_id DESC
               ) AS rn_close
        FROM events
    )
    SELECT event_type,
           strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
           CAST(max(CASE WHEN rn_open = 1 THEN cents END) AS BIGINT)
               AS open_cents,
           CAST(max(cents) AS BIGINT) AS high_cents,
           CAST(min(cents) AS BIGINT) AS low_cents,
           CAST(max(CASE WHEN rn_close = 1 THEN cents END) AS BIGINT)
               AS close_cents,
           count(*) AS volume
    FROM e GROUP BY 1, 2
    """,
)
def ohlc_hourly_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bar construction — the canonical time-series downsampling
    (open = first value in the bucket, high/low = extremes, close =
    last, volume = count), ordered by (ts, event_id) so ties are
    deterministic: one aggregate pass with min_by/max_by over a
    composite ordering struct, no window (the oracle spells the same
    first/last via rank because DuckDB's min_by rejects struct
    ordering keys — the aggregate and window derivations must agree
    exactly, which is itself part of the grade).

    Scale shape: partial-combinable min_by/max_by/min/max/count —
    constant state per (type, hour) group, one shuffle of group rows.
    The downsampling that turns 10¹² ticks into 10⁵ bars before any
    heavier analytics runs.

    Reference basis: SURVEY §2.4 A3 (LATEST_BY_OFFSET = max_by) —
    this completes the first/last-by-order aggregate family over
    buckets."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100).cast("long")
    order = F.struct(F.col("ts"), F.col("event_id"))
    return (
        ev.select(
            "event_type",
            F.date_trunc("hour", "ts").alias("h"),
            cents.alias("cents"),
            order.alias("o"),
        )
        .groupBy("event_type", "h")
        .agg(
            F.expr("min_by(cents, o)").alias("open_cents"),
            F.max("cents").alias("high_cents"),
            F.min("cents").alias("low_cents"),
            F.expr("max_by(cents, o)").alias("close_cents"),
            F.count(F.lit(1)).alias("volume"),
        )
        .select(
            "event_type",
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "open_cents",
            "high_cents",
            "low_cents",
            "close_cents",
            "volume",
        )
    )


# ----------------------------- id-sequence gap audit --


@staged_query(
    "id_sequence_gap_audit",
    oracle="""
    WITH present AS (
        SELECT event_id AS id FROM events WHERE event_id % 7 <> 3
    ),
    marked AS (
        SELECT id,
               id - lag(id) OVER (ORDER BY id) AS step
        FROM present
    ),
    gaps AS (
        SELECT lag(id) OVER (ORDER BY id) + 1 AS gap_lo,
               id - 1 AS gap_hi
        FROM present
        QUALIFY id - lag(id) OVER (ORDER BY id) > 1
    )
    SELECT count(*) AS n_gaps,
           CAST(sum(gap_hi - gap_lo + 1) AS BIGINT) AS missing_ids,
           CAST(min(gap_lo) AS BIGINT) AS first_gap_lo,
           CAST(max(gap_hi) AS BIGINT) AS last_gap_hi,
           CAST(sum(gap_lo + gap_hi) AS BIGINT) AS gap_checksum
    FROM gaps
    """,
)
def id_sequence_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-integrity audit — find every GAP RANGE in an id
    sequence (the offsets-lost / rows-dropped check every ingest
    pipeline runs against Kafka offsets or CDC LSNs): a planted
    filter (id % 7 = 3 removed) creates known holes; consecutive-id
    lag detects each gap's [lo, hi] range, and the summary (count,
    total missing, first/last, checksum of bounds) is exact. The
    Spark side runs the CHUNKED two-level form (SURVEY §7 risk 7:
    never a global window over raw rows — the global_peak_concurrency
    pattern): ids bucket by a coarse 2^16 range, lag runs inside each
    bucket in parallel, and only the per-bucket (min, max) summary —
    one row per non-empty bucket — is cumulated in an ordered pass to
    catch gaps that STRADDLE bucket boundaries (including runs of
    entirely-empty buckets, which collapse into one straddling gap
    between the neighbouring non-empty summaries). The oracle is the
    definitional single global window (QUALIFY over ORDER BY id) —
    DuckDB can afford it at oracle scale, which is the point: the
    distributed plan must equal the naive one.

    Scale shape: one hash exchange on the id bucket; the only
    single-partition work is the |buckets|-row summary cumulation
    (65536 ids per row — a 100 TB id space summarises ~65000× smaller).
    At deployment the bucket is the natural shard (Kafka partition,
    LSN shard) and even the summary pass parallelises per shard.

    Reference basis: ops/integrity extension of the S-family (offset
    bookkeeping the reference's consumer trusts Kafka for — made
    auditable)."""
    ev = load_table(spark, sf_dir, "events")
    present = ev.where(F.col("event_id") % 7 != 3).select(
        F.col("event_id").alias("id")
    )
    bucket_width = 1 << 16
    b = present.withColumn(
        "bkt", F.floor(F.col("id") / bucket_width).cast("long")
    )
    w_in = Window.partitionBy("bkt").orderBy("id")
    in_gaps = (
        b.select("bkt", "id", F.lag("id").over(w_in).alias("prev"))
        .where(
            F.col("prev").isNotNull()
            & (F.col("id") - F.col("prev") > 1)
        )
        .select(
            (F.col("prev") + 1).alias("gap_lo"),
            (F.col("id") - 1).alias("gap_hi"),
        )
    )
    summary = b.groupBy("bkt").agg(
        F.min("id").alias("lo"), F.max("id").alias("hi")
    )
    w_b = Window.orderBy("bkt")
    boundary_gaps = (
        summary.select(
            F.lag("hi").over(w_b).alias("prev_hi"), F.col("lo")
        )
        .where(
            F.col("prev_hi").isNotNull()
            & (F.col("lo") - F.col("prev_hi") > 1)
        )
        .select(
            (F.col("prev_hi") + 1).alias("gap_lo"),
            (F.col("lo") - 1).alias("gap_hi"),
        )
    )
    gaps = in_gaps.unionByName(boundary_gaps)
    return gaps.agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum(F.col("gap_hi") - F.col("gap_lo") + 1)
        .cast("long")
        .alias("missing_ids"),
        F.min("gap_lo").cast("long").alias("first_gap_lo"),
        F.max("gap_hi").cast("long").alias("last_gap_hi"),
        F.sum(F.col("gap_lo") + F.col("gap_hi"))
        .cast("long")
        .alias("gap_checksum"),
    )
