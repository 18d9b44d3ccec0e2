"""Round-8 graduated queries: the 33 queries staged (and locally
DuckDB-verified at sf0.001/0.01/0.1) during round 7, now registered with
the driver-graded registry per docs/ROTATION_R8.md. Nine machinery-
sibling rows from the round-7 staging area stay behind in
plans/next_round.py and graduate next round.

Engine/SQL surface: LATERAL correlated subqueries, SQL-defined scalar
functions (CREATE TEMPORARY FUNCTION ... RETURN), the VARIANT
semi-structured type with try_parse_json/variant_get, UTF8_LCASE
collations, GROUP BY ALL / ORDER BY ALL / SQL UNPIVOT, map-typed
columns, array set algebra, generator NULL semantics (explode_outer /
posexplode_outer), regexp breadth, calendar INTERVAL arithmetic (and a
documented DuckDB 1.0.0 interval-CSE bug), per-key sequence
densification, exact DECIMAL arithmetic under a canonical-string
contract, join-strategy hints (plan-asserted, answer-invariant),
Dataset.observe() instrumentation, XML codec round-trip, Python UDTF
document chunking, and the Python DataSource V2 trio (custom batch
source for the reference's paginated-GeoJSON ingest, offset-
deterministic streaming source, manifest-publishing exactly-once sink).
Streaming: session windows (complete + watermarked append),
stream-stream FULL OUTER join, per-micro-batch observe() audit totals.
LLM-pipeline: ANN MRR certificate, near-dup graph degree audit,
exact-dyadic EMA, TWAP, largest-remainder quota apportionment,
DataSketches-HLL + exact-bitmap distinct certificate, certified
heavy-hitters (approx_top_k), as-of join with staleness tolerance,
robust z-score over applyInPandas, and the one-scan pivot-fold replan
of the multiway time join (measured 1.72x at 100M rows).

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
from sparkksqldbbenchmark_spark.plans.registry import ORACLE, query

QueryFn = Callable[[SparkSession, str], DataFrame]

def _view(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register TESTDATA tables as temp views for spark.sql queries
    (CREATE OR REPLACE so re-runs in one session are safe)."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


# ------------------------------------------------ LATERAL correlated --


@query(
    "lateral_topn_per_key",
    oracle="""
    SELECT c.c_custkey, t.o_orderkey, t.price_cents
    FROM customer c,
    LATERAL (
        SELECT o_orderkey,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS price_cents
        FROM orders o
        WHERE o.o_custkey = c.c_custkey
        ORDER BY o.o_totalprice DESC, o.o_orderkey
        LIMIT 2
    ) t
    WHERE c.c_custkey < 500
    """,
)
def lateral_topn_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery (Spark 4) — the per-row "top-2 orders
    of THIS customer" shape, written as the SQL standard's lateral join
    rather than a window function. Byte-identical SQL runs on DuckDB.

    Scale shape: Catalyst decorrelates the lateral LIMIT into a
    rank-over-partition rewrite — hash exchanges on the correlation
    key feeding a Window + filter, never a per-row re-execution of the
    subquery (pinned in docs/PLANS.md: BroadcastHashJoin over the
    windowed orders side; no iterative operator). The c_custkey < 500
    slice bounds the graded frame; the decorrelated plan is the one a
    full-table run would use."""
    _view(spark, sf_dir, "customer", "orders")
    return spark.sql(ORACLE["lateral_topn_per_key"])


# ----------------------------------------------- SQL-defined functions --


@query(
    "sql_macro_suite",
    oracle="""
    SELECT CASE WHEN o_totalprice >= 300000 THEN 'high'
                WHEN o_totalprice >= 150000 THEN 'mid'
                ELSE 'low' END AS price_band,
           count(*) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT) * 107 // 100)
                AS BIGINT) AS taxed_cents
    FROM orders
    GROUP BY 1
    """,
)
def sql_macro_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined scalar functions (Spark 4 `CREATE TEMPORARY FUNCTION
    ... RETURN expr`, SPARK-44076) — the engine-side macro layer DuckDB
    calls MACRO and ksqlDB approximates with inline CASE. Two macros
    (a banding CASE and an integer-cent tax computation) are DEFINED in
    SQL, then used in an aggregate; the oracle inlines the identical
    expressions, proving definition-then-call equals inline semantics.

    Scale shape: SQL UDFs are pure Catalyst expression substitution —
    inlined before optimization, fully codegen'd, zero serialization
    boundary (unlike Python UDFs). The plan is byte-identical to the
    hand-inlined query: one partial-aggregated shuffle on the 3-value
    band key. This is the scalable way to share business logic across
    queries: macros, not row-at-a-time UDFs."""
    _view(spark, sf_dir, "orders")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION price_band(p DOUBLE) "
        "RETURNS STRING RETURN "
        "CASE WHEN p >= 300000 THEN 'high' "
        "WHEN p >= 150000 THEN 'mid' ELSE 'low' END"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION taxed_cents(p DOUBLE) "
        "RETURNS BIGINT RETURN "
        "CAST(floor(p * 100) AS BIGINT) * 107 DIV 100"
    )
    return spark.sql(
        """
        SELECT price_band(o_totalprice) AS price_band,
               count(*) AS n_orders,
               sum(taxed_cents(o_totalprice)) AS taxed_cents
        FROM orders
        GROUP BY 1
        """
    )


# --------------------------------------------------- VARIANT extraction --


@query(
    "variant_extract_suite",
    oracle="""
    WITH src AS (
        SELECT event_type,
               CASE WHEN event_id % 97 = 0 THEN substr(props, 1, 3)
                    ELSE props END AS s
        FROM events
    ), parsed AS (
        SELECT event_type,
               CASE WHEN json_valid(s)
                    THEN CAST(json_extract_string(s, '$.k') AS INT)
               END AS k,
               CASE WHEN json_valid(s) THEN 0 ELSE 1 END AS bad
        FROM src
    )
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(bad) AS BIGINT) AS n_malformed,
           count(k) AS n_with_k,
           CAST(sum(k) AS BIGINT) AS sum_k,
           CAST(max(k) AS INTEGER) AS max_k
    FROM parsed GROUP BY 1
    """,
)
def variant_extract_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The VARIANT semi-structured type (Spark 4): `try_parse_json` into
    an open-schema variant value, typed path access via `variant_get`,
    and graceful malformed-input handling (every 97th row is truncated
    to invalid JSON; try_parse_json yields NULL where DuckDB's
    json_valid guard yields NULL). This is the modern lakehouse answer
    to schemaless event payloads — parse once into a binary-encoded
    variant, then cheap typed field access, vs re-parsing a string per
    field.

    Scale shape: variant parse + path access are JVM expression codegen
    (no Python); the malformed guard is a scan-side predicate. One
    partial-aggregated shuffle on the bounded event_type key. At 100 TB
    the variant binary encoding additionally shreds into parquet
    (variant shredding) so `$.k` access prunes like a real column."""
    ev = load_table(spark, sf_dir, "events")
    s = F.when(
        F.col("event_id") % 97 == 0, F.expr("substr(props, 1, 3)")
    ).otherwise(F.col("props"))
    v = F.expr("try_parse_json(s)")
    parsed = ev.select(
        "event_type",
        s.alias("s"),
    ).select(
        "event_type",
        F.expr("variant_get(try_parse_json(s), '$.k', 'int')").alias("k"),
        F.when(v.isNull(), 1).otherwise(0).alias("bad"),
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("bad").alias("n_malformed"),
        F.count("k").alias("n_with_k"),
        F.sum("k").alias("sum_k"),
        F.max("k").alias("max_k"),
    )


# ------------------------------------------------------- collations --


@query(
    "collation_group_suite",
    oracle="""
    WITH mixed AS (
        SELECT CASE WHEN doc_id % 3 = 0 THEN upper(source)
                    WHEN doc_id % 3 = 1 THEN source
                    ELSE concat(upper(substr(source, 1, 1)),
                                substr(source, 2)) END AS s,
               n_chars
        FROM documents
    )
    SELECT lower(s) AS source_ci,
           count(*) AS n_docs,
           CAST(count(DISTINCT s) AS BIGINT) AS n_case_variants,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM mixed
    GROUP BY lower(s)
    """,
)
def collation_group_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String collations (Spark 4): grouping under the UTF8_LCASE
    collation folds case variants of a source label into one group —
    graded against DuckDB's lower() canonicalization, proving
    collation-aware GROUP BY ≡ canonicalize-then-group. The case
    variants are synthesized deterministically (upper / as-is /
    initcap by doc_id mod 3); n_case_variants counts them per group
    under BINARY collation to show both collations coexist in one
    aggregate. The emitted key is lower()-canonical because the
    collation group's representative value is engine-internal.

    Scale shape: collation comparison is a JVM-side collation key —
    grouping hashes the collation key exactly like any other group-by
    (one partial-aggregated exchange); no normalization materialization
    needed. At 100 TB prefer storing the canonical form; collation
    grouping is for the read path over data you don't own."""
    docs = load_table(spark, sf_dir, "documents")
    mixed = docs.select(
        F.expr(
            "CASE WHEN doc_id % 3 = 0 THEN upper(source) "
            "WHEN doc_id % 3 = 1 THEN source "
            "ELSE concat(upper(substr(source, 1, 1)), substr(source, 2)) "
            "END"
        ).alias("s"),
        "n_chars",
    )
    return (
        mixed.groupBy(F.expr("s COLLATE UTF8_LCASE").alias("s_ci"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct(F.expr("s COLLATE UTF8_BINARY")).alias(
                "n_case_variants"
            ),
            F.sum("n_chars").alias("total_chars"),
        )
        .select(
            F.lower(F.col("s_ci").cast("string")).alias("source_ci"),
            "n_docs",
            "n_case_variants",
            "total_chars",
        )
    )


# ------------------------------------ GROUP BY ALL / ORDER BY ALL / UNPIVOT --


@query(
    "groupby_all_unpivot_sql",
    oracle="""
    SELECT o_orderpriority, metric, CAST(v AS BIGINT) AS v
    FROM (
        SELECT o_orderpriority,
               count(*) AS n_orders,
               CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS total_cents,
               CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
        FROM orders
        GROUP BY ALL
    ) UNPIVOT (v FOR metric IN (n_orders, total_cents, n_customers))
    ORDER BY ALL
    """,
)
def groupby_all_unpivot_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modern SQL syntax parity row: GROUP BY ALL (infer grouping keys
    from the select list), SQL-syntax UNPIVOT (the keyword form — the
    DataFrame `unpivot`/`stack` forms are graded elsewhere), and ORDER
    BY ALL, in one byte-identical statement on both engines.

    Scale shape: GROUP BY ALL is pure analysis-time sugar (same
    partial-agg plan); UNPIVOT compiles to the same Expand operator as
    stack() — one pass, rows×3 output with constant replication, no
    extra scan per measure (the UNION ALL anti-pattern this syntax
    replaces would scan orders three times)."""
    _view(spark, sf_dir, "orders")
    return spark.sql(ORACLE["groupby_all_unpivot_sql"])


# ---------------------------------------------------- map-typed columns --


@query(
    "map_function_suite",
    oracle="""
    WITH per AS (
        SELECT user_id, event_type, count(*) AS c
        FROM events GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(max(CASE WHEN event_type = 'click' THEN c END)
                AS BIGINT) AS n_click,
           CAST(count(*) AS INTEGER) AS n_types,
           array_to_string(list_sort(list(event_type)), '|') AS types,
           CAST(sum(c * 2) AS BIGINT) AS double_total,
           CAST(sum(CASE WHEN c >= 10 THEN 1 ELSE 0 END)
                AS INTEGER) AS n_ge10
    FROM per
    WHERE user_id < 200
    GROUP BY user_id
    """,
)
def map_function_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed columns end to end: per-user event-type count maps are
    BUILT (`map_from_entries` over collected entries), ACCESSED
    (`element_at` — NULL on a missing key, the lenient lookup),
    INSPECTED (`map_keys` sorted, `size`), and TRANSFORMED
    (`transform_values` lambda, `map_filter` predicate). The oracle
    computes every derived value relationally — map semantics graded
    against plain SQL, the same proof pattern the HOF suite uses.

    Emitted columns are scalar lookups and the SORTED key list serialized
    to a pipe-joined string: map internal ordering is engine-private and
    array-typed payloads are not a result-contract type (the driver's
    hash comparator cannot canonicalize them — the r04
    grouped_array_collect lesson, re-learned in r08 by this very row), so
    no raw map OR array ever reaches the comparator.

    Scale shape: one partial-aggregated shuffle to (user, type) counts,
    a second keyed on user to assemble the map — both on uniform keys;
    per-user maps are bounded by |event types| (5), so state per group
    is constant. Lambdas over maps are JVM codegen, not UDFs."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 200)
    per = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    m = per.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "c")))
        ).alias("m")
    )
    return m.select(
        "user_id",
        F.element_at("m", F.lit("click")).alias("n_click"),
        F.size("m").alias("n_types"),
        F.array_join(F.sort_array(F.map_keys("m")), "|").alias("types"),
        F.expr(
            "aggregate(map_values(transform_values(m, (k, v) -> v * 2)),"
            " 0L, (acc, v) -> acc + v)"
        ).alias("double_total"),
        F.size(F.expr("map_filter(m, (k, v) -> v >= 10)")).alias("n_ge10"),
    )


# ------------------------------------------------------ array algebra --


@query(
    "array_algebra_suite",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               string_split(text, ' ')[1:10] AS a,
               string_split(text, ' ')[-10:] AS b
        FROM documents WHERE doc_id < 300
    )
    SELECT doc_id,
           CAST(len(list_distinct(a)) AS INTEGER) AS n_distinct_a,
           coalesce(array_to_string(
               list_sort(list_distinct(list_intersect(a, b))), '|'),
               '') AS inter_sorted,
           CAST(len(list_distinct(list_concat(a, b)))
                AS INTEGER) AS n_union,
           CAST(len(list_filter(list_distinct(a),
                                x -> NOT list_contains(b, x)))
                AS INTEGER) AS n_except,
           CAST(len(flatten([a, b])) AS INTEGER) AS flat_n,
           CAST(coalesce(list_position(a, 'the'), 0) AS INTEGER)
               AS pos_the,
           len(list_intersect(a, b)) > 0 AS has_overlap
    FROM t
    """,
)
def array_algebra_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra over token arrays: array_distinct /
    array_intersect / array_union / array_except / flatten /
    array_position / arrays_overlap, graded against DuckDB's list
    functions. Set-valued outputs are sorted AND serialized to a
    pipe-joined string before emission (set ops define CONTENT, not
    order — both engines return implementation order — and array-typed
    columns are not a result-contract type: the driver's hash comparator
    cannot canonicalize them) and set sizes otherwise; the first-10 /
    last-10 token slices give every doc two genuinely overlapping
    operand arrays.

    Scale shape: all pure scan-side expression work — zero shuffles,
    zero joins; array lambdas and set ops are JVM codegen over the
    token arrays. The doc_id < 300 slice bounds the graded rowset; the
    plan is a single narrow Project at any scale."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    t = docs.select(
        "doc_id",
        F.expr("slice(split(text, ' '), 1, 10)").alias("a"),
        F.expr("slice(split(text, ' '), -10, 10)").alias("b"),
    )
    return t.select(
        "doc_id",
        F.size(F.array_distinct("a")).alias("n_distinct_a"),
        F.array_join(
            F.sort_array(F.array_distinct(F.array_intersect("a", "b"))), "|"
        ).alias("inter_sorted"),
        F.size(F.array_union("a", "b")).alias("n_union"),
        F.size(F.array_except("a", "b")).alias("n_except"),
        F.size(F.flatten(F.array("a", "b"))).alias("flat_n"),
        F.expr("array_position(a, 'the')").cast("int").alias("pos_the"),
        F.arrays_overlap("a", "b").alias("has_overlap"),
    )


# ------------------------------------------- generator null semantics --


@query(
    "explode_outer_semantics",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '),
                           x -> len(x) >= 8) AS l
        FROM documents WHERE doc_id < 400
    )
    SELECT t.doc_id,
           CAST(u.ord - 1 AS INTEGER) AS pos,
           u.e AS tok
    FROM t LEFT JOIN LATERAL (
        SELECT unnest(l) AS e,
               unnest(generate_series(1, len(l))) AS ord
    ) u ON TRUE
    """,
)
def explode_outer_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator NULL semantics: `posexplode_outer` must PRESERVE rows
    whose array is empty (emitting NULL pos/tok) where plain explode
    drops them — the LEFT-JOIN-shaped generator. The filter keeps only
    ≥8-char tokens so a meaningful fraction of docs genuinely explode
    to nothing; the oracle replays the same semantics with DuckDB's
    LEFT JOIN LATERAL unnest (zipped with generate_series for the
    ordinal, 1-based → 0-based to match Spark's pos).

    Scale shape: Generate(outer=true) is a narrow streaming operator —
    no shuffle, no join in the Spark plan (the LATERAL in the oracle is
    DuckDB's spelling, not Spark's plan); output row count is
    sum(len)+|empty| and each input row expands locally."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 400)
    t = docs.select(
        "doc_id",
        F.expr("filter(split(text, ' '), x -> length(x) >= 8)").alias("l"),
    )
    return t.select(
        "doc_id",
        F.posexplode_outer("l").alias("pos", "tok"),
    )


# ----------------------------------------------------- regexp breadth --


@query(
    "regexp_suite2",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '([a-z]{6,})', 1))
                AS INTEGER) AS n_long,
           coalesce(array_to_string(list_sort(list_distinct(
               regexp_extract_all(text, '([a-z]{8,})', 1))), '|'), '')
               AS long_toks,
           CAST(len(regexp_extract_all(text, '[aeiou]{2}'))
                AS INTEGER) AS n_vowel_pairs,
           len(regexp_replace(text, 's[a-z]+', 'X', 'g')) AS len_replaced,
           regexp_matches(text, '\\bspark\\b') AS mentions_spark
    FROM documents WHERE doc_id < 400
    """,
)
def regexp_suite2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp breadth beyond extract/replace basics: `regexp_extract_all`
    (all matches, as an array — sorted-distinct AND pipe-joined to a
    string before emission, since only CONTENT is portable and raw
    array columns are not a result-contract type), `regexp_count`
    (graded against DuckDB's
    len(extract_all) since DuckDB has no count form), global
    regexp_replace (DuckDB needs the explicit 'g' flag for Spark's
    replace-all default — a real cross-engine trap, documented here),
    and word-boundary `rlike`. Patterns stay in the RE2∩Java-regex
    intersection (classes, bounded reps, \\b) — the backreference
    divergence is graded by text_normalization_suite.

    Scale shape: all scan-side codegen over the text column; zero
    shuffles. Regex cost is linear per row and embarrassingly parallel
    — at 100 TB this is purely scan-bound, the ideal operator shape."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 400)
    return docs.select(
        "doc_id",
        F.expr("regexp_count(text, '[a-z]{6,}')")
        .cast("int")
        .alias("n_long"),
        F.array_join(
            F.sort_array(
                F.array_distinct(
                    F.expr("regexp_extract_all(text, '([a-z]{8,})', 1)")
                )
            ),
            "|",
        ).alias("long_toks"),
        F.expr("regexp_count(text, '[aeiou]{2}')")
        .cast("int")
        .alias("n_vowel_pairs"),
        F.length(F.regexp_replace("text", "s[a-z]+", "X")).alias(
            "len_replaced"
        ),
        F.col("text").rlike(r"\bspark\b").alias("mentions_spark"),
    )


# ------------------------------------------- datetime interval algebra --


@query(
    "interval_datetime_suite",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) AS d,
           CAST(o_orderdate + INTERVAL 90 DAY AS DATE) AS due_90d,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE)
               AS due_3mo,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(date_trunc('quarter', o_orderdate) AS DATE) AS quarter_start,
           CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start,
           CAST(datediff('day', DATE '1995-01-01',
                         CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since,
           CAST((year(o_orderdate) - 1995) * 12
                + (month(o_orderdate) - 1) AS INTEGER) AS months_since,
           dayofweek(CAST(o_orderdate AS DATE)) % 7 + 1 AS dow
    FROM orders WHERE o_orderkey < 2000
    """,
)
def interval_datetime_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime interval arithmetic: +INTERVAL day/month (calendar-aware
    month addition with end-of-month clamping), last_day, date_trunc to
    quarter/week boundaries, day difference from an epoch, whole-month
    difference (spelled in year/month integer arithmetic — Spark's
    months_between is fractional, DuckDB's date_diff('month') counts
    boundary crossings; the explicit form is the only one with a single
    cross-engine meaning, which IS the finding this row documents), and
    day-of-week (DuckDB dayofweek is 0=Sunday, Spark 1=Sunday — the
    oracle normalizes).

    Engine-bug finding (staging caught it): DuckDB 1.0.0 conflates two
    different INTERVAL additions over the SAME timestamp operand —
    `ts + INTERVAL 90 DAY` and `ts + INTERVAL 3 MONTH` in one SELECT
    both evaluate to +90 days (faulty common-subexpression match on the
    interval constant). The oracle sidesteps it by adding the months to
    the DATE-cast operand, which also pins that month addition is
    day-preserving on dates, not 30-day arithmetic.

    Scale shape: scan-side codegen, zero shuffles; date arithmetic on
    the int32 days-since-epoch representation."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 2000)
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        d.alias("d"),
        F.date_add(d, 90).alias("due_90d"),
        F.add_months(d, 3).alias("due_3mo"),
        F.last_day(d).alias("month_end"),
        F.date_trunc("quarter", "o_orderdate").cast("date").alias(
            "quarter_start"
        ),
        F.date_trunc("week", "o_orderdate").cast("date").alias("week_start"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).alias("days_since"),
        (
            (F.year(d) - 1995) * 12 + (F.month(d) - 1)
        ).cast("int").alias("months_since"),
        F.dayofweek(d).alias("dow"),
    )


# ------------------------------------------ per-key sequence densify --


@query(
    "sequence_densify_per_key",
    oracle="""
    WITH span AS (
        SELECT user_id,
               min(CAST(ts AS DATE)) AS d0,
               max(CAST(ts AS DATE)) AS d1
        FROM events WHERE user_id < 50 GROUP BY 1
    ), spine AS (
        SELECT s.user_id, CAST(g.d AS DATE) AS day
        FROM span s, LATERAL (
            SELECT unnest(generate_series(s.d0, s.d1,
                                          INTERVAL 1 DAY)) AS d
        ) g
    ), active AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        FROM events WHERE user_id < 50
    )
    SELECT sp.user_id, sp.day,
           a.day IS NOT NULL AS was_active
    FROM spine sp LEFT JOIN active a
        ON sp.user_id = a.user_id AND sp.day = a.day
    """,
)
def sequence_densify_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key calendar densification: each user's own [first, last]
    activity span is expanded to one row per day via the `sequence()`
    array constructor + explode — the per-entity spine (the global-grid
    twin is calendar_spine_gapfill). Left-joining distinct activity
    days marks gaps — the fuel for per-user streak/churn features.

    Scale shape: span aggregation and the activity dedup both key on
    user_id, and Catalyst reuses that one partitioning for the final
    join — the explode expands |span_days| rows per user LOCALLY
    between the shuffles (no cross-partition movement for the spine).
    Span length is bounded by the data's time window, not its row
    count, so expansion is constant-factor at any corpus size."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 50)
    span = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        F.max(F.col("ts").cast("date")).alias("d1"),
    )
    spine = span.select(
        "user_id",
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
    )
    active = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    return spine.join(active, ["user_id", "day"], "left_outer").select(
        spine.user_id,
        spine.day,
        active.day.isNotNull().alias("was_active"),
    )


# ------------------------------------------- sketch aggregate suite --


@query(
    "hll_bitmap_sketch_suite",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct,
           CAST(count(DISTINCT user_id) AS BIGINT) AS bitmap_distinct,
           TRUE AS hll_within_5pct
    FROM events GROUP BY 1
    """,
)
def hll_bitmap_sketch_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two modern distinct-count sketches Spark 4 ships natively,
    certified against the exact count in one row: the Apache
    DataSketches HLL (`hll_sketch_agg` → `hll_sketch_estimate`, graded
    as a ≤5% certificate — the approx_count_distinct grading pattern)
    and the RoaringBitmap-style exact bitmap (`bitmap_bucket_number` /
    `bitmap_bit_position` / `bitmap_construct_agg` / `bitmap_count`,
    graded for EQUALITY because bitmaps are lossless). The bitmap path
    buckets ids into 32768-bit pages keyed by (event_type, bucket) so
    arbitrary id ranges work, then sums per-page popcounts.

    Scale shape: both sketches are algebraic aggregates with tiny
    mergeable partials (HLL registers / bitmap pages) — map-side
    combine absorbs the row volume, the shuffle carries kilobytes per
    key. At 100 TB the bitmap pages also make distinct counts
    COMPOSABLE across time partitions (bit_or of pages), which is why
    bitmap_day_activity is graded separately; this row certifies the
    primitives."""
    ev = load_table(spark, sf_dir, "events")
    pages = ev.groupBy(
        "event_type",
        F.expr("bitmap_bucket_number(user_id)").alias("pg"),
    ).agg(
        F.expr(
            "bitmap_count(bitmap_construct_agg(bitmap_bit_position(user_id)))"
        ).alias("page_count")
    )
    bitmap = pages.groupBy("event_type").agg(
        F.sum("page_count").alias("bitmap_distinct")
    )
    hll = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_distinct"),
        F.expr("hll_sketch_estimate(hll_sketch_agg(user_id))").alias("est"),
    )
    return hll.join(bitmap, "event_type").select(
        "event_type",
        "exact_distinct",
        "bitmap_distinct",
        (
            F.abs(F.col("est") - F.col("exact_distinct")) * 100
            <= F.col("exact_distinct") * 5
        ).alias("hll_within_5pct"),
    )


# ----------------------------------------- exact-dyadic EMA smoothing --


def _ema_terms(prefix: str, n: int = 16) -> str:
    """sum of lag(v_cents, i) * 2^(n-1-i) for i in 0..n-1 — the trailing
    exponentially-weighted sum in PURE INTEGER arithmetic (weights are
    powers of two, values integer cents), identical in any engine."""
    terms = [
        f"coalesce(lag({prefix}, {i}) OVER w, 0) * {1 << (15 - i)}"
        for i in range(n)
    ]
    return " + ".join(terms)


@query(
    "ema_dyadic_decay",
    oracle=f"""
    WITH t AS (
        SELECT user_id, event_id,
               CAST(floor(value * 100) AS BIGINT) AS v_cents
        FROM events WHERE user_id < 30
    )
    SELECT user_id, event_id,
           CAST({_ema_terms("v_cents")} AS BIGINT) AS ema_weighted,
           CAST(({_ema_terms("v_cents")}) AS DOUBLE) / 65536.0 AS ema
    FROM t
    WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
    """,
)
def ema_dyadic_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential moving average — the classic quality-signal smoother
    that resists distributed evaluation because EMA's recurrence is
    non-associative. Two levers make it exact AND parallel here: (a)
    truncate the tail at 16 terms (decay 1/2 ⇒ the dropped tail is
    < 2^-16 of the signal), turning the recurrence into a fixed
    trailing weighted sum; (b) keep everything in INTEGER arithmetic —
    values in cents, weights 2^15..2^0 — so partial order cannot
    produce float drift, then divide by 2^16 once at the end (a power
    of two: the division is EXACT in IEEE doubles, so even the double
    column hashes identically cross-engine).

    Scale shape: one hash exchange on user_id; all 16 lag terms ride
    ONE window (same spec ⇒ one Window operator, one sort) — the
    moving-average discipline window_function_suite pinned, here with
    geometric weights."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 30)
    t = ev.select(
        "user_id",
        "event_id",
        F.floor(F.col("value") * 100).alias("v_cents"),
    )
    from sparkksqldbbenchmark_spark.functions.timeseries import (
        dyadic_ema_weighted,
    )

    w = Window.partitionBy("user_id").orderBy("event_id")
    terms = dyadic_ema_weighted("v_cents", w, terms=16)
    return t.select(
        "user_id",
        "event_id",
        terms.alias("ema_weighted"),
        (terms.cast("double") / F.lit(65536.0)).alias("ema"),
    )


# -------------------------------- largest-remainder quota apportionment --


@query(
    "mixture_quota_largest_remainder",
    oracle="""
    WITH counts AS (
        SELECT source, count(*) AS c FROM documents GROUP BY 1
    ), tot AS (
        SELECT sum(c) AS t, sum(10000 * c // (SELECT sum(c) FROM counts))
                   AS base_sum
        FROM counts
    ), quotas AS (
        SELECT source, c,
               10000 * c // t AS base_quota,
               10000 * c % t AS remainder,
               row_number() OVER (ORDER BY 10000 * c % t DESC, source)
                   AS rem_rank,
               10000 - base_sum AS r
        FROM counts, tot
    )
    SELECT source,
           CAST(c AS BIGINT) AS n_docs,
           CAST(base_quota AS BIGINT) AS base_quota,
           CAST(CASE WHEN rem_rank <= r THEN 1 ELSE 0 END AS BIGINT)
               AS extra,
           CAST(base_quota + CASE WHEN rem_rank <= r THEN 1 ELSE 0 END
                AS BIGINT) AS final_quota
    FROM quotas
    """,
)
def mixture_quota_largest_remainder(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Largest-remainder apportionment — the standard way to split a
    global sample budget (here 10,000 docs) across sources proportional
    to their sizes with NO fractional quotas and an EXACT total: floor
    quotas first, then award the leftover seats to the largest
    remainders (ties to the lexicographically first source, making the
    allocation fully deterministic). This is the planning half of
    mixture resampling: domain_mixture_resample grades the scan-side
    keep-predicate; this row grades computing the per-domain targets
    themselves (sum(final_quota) = budget exactly — the property
    floor-only or rounding allocations violate).

    Scale shape: one partial-aggregated count shuffle; everything after
    operates on the |sources|-row frame (bounded ≪ data), where the
    single-partition window is a constant-size frame — the shuffle
    audit's allowed class."""
    from sparkksqldbbenchmark_spark.operators.apportion import (
        largest_remainder_quotas,
    )

    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("c"))
    return largest_remainder_quotas(
        counts, "source", "c", budget=10000
    ).withColumnRenamed("weight", "n_docs")


# ------------------------------------------------ ANN MRR certificate --


def _ann_mrr_oracle(num_planes: int = 4, nq: int = 10, k: int = 5,
                    dim: int = 64) -> str:
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
    ), exact1 AS (
        SELECT query_id, cand_id AS top1_cand FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY {_sql_dot("q.vec", "c.vec", dim)}
                                / (q.norm * c.norm) DESC, c.vec_id
                   ) AS rank
            FROM normed q JOIN normed c ON q.vec_id != c.vec_id
            WHERE q.vec_id < {nq}
        ) WHERE rank = 1
    ), buckets AS (
        SELECT n.vec_id,
               SUM(CASE WHEN {_sql_dot("n.vec", "p.pvec", dim)} >= 0.0
                        THEN (1::BIGINT << p.pid) ELSE 0::BIGINT END)
                   AS bucket
        FROM normed n, {_planes_values(num_planes, dim)}
        GROUP BY n.vec_id
    ), nb AS (
        SELECT n.vec_id, n.vec, n.norm, b.bucket
        FROM normed n JOIN buckets b ON n.vec_id = b.vec_id
    ), ann AS (
        SELECT query_id, cand_id, rank FROM (
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
           e.top1_cand,
           a.rank IS NOT NULL AS found,
           CAST(coalesce(1000000 // a.rank, 0) AS BIGINT) AS rr_micro
    FROM exact1 e
    LEFT JOIN ann a
      ON e.query_id = a.query_id AND e.top1_cand = a.cand_id
    """


@query("ann_mrr_certified", oracle=_ann_mrr_oracle())
def ann_mrr_certified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-aware ANN certificate: recall@k (already graded) says the
    true neighbors APPEAR; MRR says they appear EARLY — the metric that
    catches an index returning the right set in a scrambled order,
    which recall cannot see. Per query: the exact cosine top-1 (the
    single most important neighbor), its rank in the hyperplane-LSH
    top-k list, and the reciprocal rank in integer micro-units
    (1000000 DIV rank — floor division on both engines so no float
    ratio reaches the comparator; 0 when the true neighbor was missed).
    The fleet average of rr_micro is the MRR a retrieval dashboard
    plots; emitting per-query rows keeps the certificate auditable.

    Scale shape: both legs are the already-audited similarity plans
    (bounded broadcast query sets; the LSH leg replaces the n² join
    with a bucket join). The certificate itself joins two k·|Q|-row
    frames — negligible at any scale."""
    from sparkksqldbbenchmark_spark.llm import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    exact1 = (
        similarity.cosine_topk(emb)
        .where(F.col("rank") == 1)
        .select("query_id", F.col("cand_id").alias("top1_cand"))
    )
    ann = similarity.ann_lsh_topk(emb).select(
        "query_id", F.col("cand_id").alias("top1_cand"), "rank"
    )
    return exact1.join(ann, ["query_id", "top1_cand"], "left").select(
        "query_id",
        "top1_cand",
        F.col("rank").isNotNull().alias("found"),
        F.coalesce(
            F.expr("1000000 DIV rank"), F.lit(0)
        ).alias("rr_micro"),
    )


# ------------------------------------- near-dup graph degree audit --


def _dup_degree_oracle(k: int = 16, bands: int = 4, n: int = 3) -> str:
    from sparkksqldbbenchmark_spark.llm.hashing import (
        sql_minhash_sig,
        sql_word_shingles,
    )

    rows = k // bands
    sh = sql_word_shingles("text", n)
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
    ), cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM banded a
        JOIN banded b ON a.band_idx = b.band_idx AND a.bh = b.bh
                      AND a.doc_id < b.doc_id
    ), deg AS (
        SELECT doc, count(*) AS degree FROM (
            SELECT doc_a AS doc FROM cand
            UNION ALL
            SELECT doc_b AS doc FROM cand
        ) GROUP BY doc
    )
    SELECT CAST(degree AS BIGINT) AS degree,
           count(*) AS n_docs,
           CAST(min(doc) AS BIGINT) AS min_doc
    FROM deg GROUP BY 1
    """


@query("dup_graph_degree_stats", oracle=_dup_degree_oracle())
def dup_graph_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate-graph degree audit — the health check run
    BEFORE trusting an LSH dedup at scale: the degree distribution of
    the candidate-pair graph exposes bucket collapse (a degenerate band
    hash puts thousands of docs in one bucket → a hub node with huge
    degree → the verify join quadratically explodes). Per degree: how
    many docs have exactly that many candidate partners, plus the
    smallest such doc id for drill-down. A healthy corpus shows a
    rapidly decaying histogram; a poisoned hash function shows mass at
    high degree — THE early-warning signal for the n² blowup.

    Scale shape: reuses the audited lsh_banded_buckets front half (one
    doc-keyed exchange for signatures, one bucket-keyed for the
    self-join); the degree aggregate keys on doc_id (uniform), the
    histogram on the small degree domain. Nothing new shuffles at
    scale beyond what dedup itself already pays."""
    from sparkksqldbbenchmark_spark.llm.dedup import lsh_banded_buckets

    docs = load_table(spark, sf_dir, "documents")
    _, buckets = lsh_banded_buckets(docs, "text", "doc_id")
    a = buckets.select(
        F.col("doc_id").alias("doc_a"), "band_idx", "bh"
    )
    b = buckets.select(
        F.col("doc_id").alias("doc_b"), "band_idx", "bh"
    )
    cand = (
        a.join(b, ["band_idx", "bh"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    deg = (
        cand.select(F.col("doc_a").alias("doc"))
        .unionAll(cand.select(F.col("doc_b").alias("doc")))
        .groupBy("doc")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return deg.groupBy("degree").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc").alias("min_doc"),
    )


# --------------------------------- streaming: FULL OUTER stream join --


@query(
    "streaming_stream_full_outer_join",
    oracle="""
    WITH v AS (SELECT user_id, event_id, ts FROM events
               WHERE event_type = 'view'),
    c AS (SELECT user_id, event_id, ts FROM events
          WHERE event_type = 'click'),
    wm AS (SELECT least((SELECT max(ts) FROM v), (SELECT max(ts) FROM c))
                  - INTERVAL 2 HOUR AS w),
    matched AS (
        SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id
        FROM v JOIN c
          ON v.user_id = c.user_id
         AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 1 HOUR
    ),
    unmatched_v AS (
        SELECT v.user_id, v.event_id AS view_id,
               CAST(NULL AS BIGINT) AS click_id
        FROM v
        WHERE NOT EXISTS (
            SELECT 1 FROM c
            WHERE c.user_id = v.user_id
              AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 1 HOUR
        ) AND v.ts + INTERVAL 1 HOUR < (SELECT w FROM wm)
    ),
    unmatched_c AS (
        SELECT c.user_id, CAST(NULL AS BIGINT) AS view_id,
               c.event_id AS click_id
        FROM c
        WHERE NOT EXISTS (
            SELECT 1 FROM v
            WHERE v.user_id = c.user_id
              AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 1 HOUR
        ) AND c.ts < (SELECT w FROM wm)
    )
    SELECT * FROM matched
    UNION ALL SELECT * FROM unmatched_v
    UNION ALL SELECT * FROM unmatched_c
    """,
)
def streaming_stream_full_outer_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Watermarked stream-stream FULL OUTER join — completes the
    streaming join-mode family (inner graded r04, LEFT OUTER r07): both
    the views that never converted AND the clicks with no preceding
    view must surface, each under its own watermark-driven closed-set
    rule. A view's NULL row emits once view_ts + 1 h (its match-window
    upper bound) passes the global watermark; a click's NULL row emits
    once click_ts itself passes it (any view it could match has
    view_ts ≤ click_ts, and arrivals below the watermark are
    impossible). The oracle replays BOTH eviction rules relationally —
    matched pairs unconditionally, each side's unmatched rows gated on
    its own closure predicate — the left-join oracle's argument run in
    both directions.

    Scale shape: both sides shuffle on user_id; per-side state is
    bounded by (watermark delay + match range); NULL emission is the
    state-eviction scan the engine performs anyway. Same cost model as
    the inner join — outer-ness only changes what eviction EMITS."""
    import uuid

    from sparkksqldbbenchmark_spark.plans.streaming_queries import (
        _read_events_stream,
    )
    from sparkksqldbbenchmark_spark.streaming.pipeline import run_to_memory

    views = (
        _read_events_stream(spark, sf_dir)
        .where(F.col("event_type") == "view")
        .select(
            "user_id",
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", "2 hours")
    )
    clicks = (
        _read_events_stream(spark, sf_dir)
        .where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user_id"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "2 hours")
    )
    joined = views.join(
        clicks,
        F.expr(
            "user_id = c_user_id AND click_ts >= view_ts"
            " AND click_ts <= view_ts + interval 1 hour"
        ),
        "full_outer",
    ).select(
        F.coalesce("user_id", "c_user_id").alias("user_id"),
        "view_id",
        "click_id",
    )
    name = f"stream_fjoin_{uuid.uuid4().hex[:8]}"
    q = run_to_memory(joined, name, output_mode="append")
    q.stop()
    return spark.table(name)


# ----------------------------------- streaming: session window agg --


@query(
    "streaming_session_window_agg",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts,
               CASE WHEN epoch_us(ts)
                         - lag(epoch_us(ts)) OVER (
                               PARTITION BY user_id ORDER BY ts)
                         > 1800000000
                         OR lag(ts) OVER (
                               PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    ), sess AS (
        SELECT user_id, ts,
               sum(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS session_id
        FROM marked
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events
    FROM sess
    GROUP BY user_id, session_id
    """,
)
def streaming_session_window_agg(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming SESSION windows — `session_window(ts, gap)` inside a
    streaming aggregation, the stateful operator that MERGES windows as
    events arrive (an event landing between two open sessions closer
    than the gap fuses them — state is dynamic-width, unlike
    tumbling/hopping whose windows are fixed). Complete-mode
    availableNow run; the memory sink then holds the final merged
    sessions, which must equal batch gaps-and-islands sessionization
    (30-min gap) exactly — window.start = first event, window.end =
    last event + gap. The oracle is that relational replay (the same
    lag → running-sum island construction batch_sessionize graded,
    plus the +gap end-point convention session_window defines).

    Scale shape: state shuffles on user_id; per-key state is the OPEN
    sessions only (merge on arrival, numEventsInWindow-free); the
    documented production form adds a watermark so closed sessions
    evict — complete mode here is what makes the memory-sink result a
    deterministic batch-equal set in one availableNow pass."""
    import uuid

    from sparkksqldbbenchmark_spark.plans.streaming_queries import (
        _read_events_stream,
    )
    from sparkksqldbbenchmark_spark.streaming.pipeline import run_to_memory

    ev = _read_events_stream(spark, sf_dir)
    sess = (
        ev.groupBy(
            F.session_window("ts", "30 minutes"), F.col("user_id")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )
    name = f"stream_sess_{uuid.uuid4().hex[:8]}"
    q = run_to_memory(sess, name, output_mode="complete")
    q.stop()
    return spark.table(name)


# ------------------------------------------ as-of join with tolerance --


@query(
    "asof_tolerance_join",
    oracle="""
    WITH px AS (
        SELECT user_id, ts,
               CAST(floor(value * 100) AS BIGINT) AS px_cents
        FROM events WHERE event_type = 'view'
    ), want AS (
        SELECT user_id, event_id, ts
        FROM events WHERE event_type = 'click' AND user_id < 100
    )
    SELECT w.user_id, w.event_id,
           CASE WHEN p.ts >= w.ts - INTERVAL 1 HOUR
                THEN p.px_cents END AS asof_px_cents,
           CASE WHEN p.ts >= w.ts - INTERVAL 1 HOUR
                THEN CAST(epoch_us(w.ts) - epoch_us(p.ts) AS BIGINT)
           END AS staleness_us
    FROM want w ASOF LEFT JOIN px p
      ON w.user_id = p.user_id AND p.ts <= w.ts
    """,
)
def asof_tolerance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a TOLERANCE bound (pandas merge_asof's
    `tolerance=`): each click picks the latest same-user view price
    at-or-before it, but a match staler than 1 hour is rejected to NULL
    — the data-quality guard every production as-of pipeline needs
    (a quote from last week must not price today's trade). Graded
    against DuckDB's native ASOF LEFT JOIN with the tolerance applied
    as a post-predicate — semantically exactly "match, then reject
    stale", which is why the custom operator applies it the same way
    rather than pre-filtering the right side (pre-filtering would
    promote the SECOND-latest row into a match, the classic
    tolerance-implementation bug this row exists to pin).

    Scale shape: rides the audited one-shuffle union-tag asof_join
    (sort by (ts, tag) per key + one last-non-null carry window — no
    inequality join, no broadcast); the tolerance is a scan-side CASE
    over the carried timestamp. user_id < 100 bounds the graded
    output."""
    from sparkksqldbbenchmark_spark.operators.joins import asof_join

    ev = load_table(spark, sf_dir, "events")
    px = ev.where(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.floor(F.col("value") * 100).alias("px_cents"),
    )
    want = ev.where(
        (F.col("event_type") == "click") & (F.col("user_id") < 100)
    ).select("user_id", "event_id", "ts")
    carried = asof_join(
        want,
        px.withColumn("asof_ts", F.col("ts")),
        on=["user_id"],
        ts_col="ts",
        payload_cols=["px_cents", "asof_ts"],
    )
    fresh = F.col("asof_ts") >= F.col("ts") - F.expr("interval 1 hour")
    return carried.select(
        "user_id",
        "event_id",
        F.when(fresh, F.col("px_cents")).alias("asof_px_cents"),
        F.when(
            fresh, F.unix_micros("ts") - F.unix_micros("asof_ts")
        ).alias("staleness_us"),
    )


# ------------------------------------ applyInPandas grouped-map oracle --


@query(
    "robust_zscore_applyinpandas",
    oracle="""
    WITH t AS (
        SELECT user_id, event_id,
               CAST(floor(value * 100) AS BIGINT) AS v_cents
        FROM events WHERE user_id < 40
    ), med AS (
        SELECT user_id,
               CAST(2 * median(v_cents) AS BIGINT) AS med2
        FROM t GROUP BY 1
    ), dev AS (
        SELECT t.user_id, t.event_id, t.v_cents, m.med2,
               abs(2 * t.v_cents - m.med2) AS absdev2
        FROM t JOIN med m ON t.user_id = m.user_id
    ), mad AS (
        SELECT user_id,
               CAST(2 * median(absdev2) AS BIGINT) AS mad4
        FROM dev GROUP BY 1
    )
    SELECT d.user_id, d.event_id, d.v_cents,
           d.med2, a.mad4,
           CASE WHEN a.mad4 > 0
                THEN CAST((2 * d.v_cents - d.med2) * 1000000 // a.mad4
                          AS BIGINT)
                ELSE 0 END AS rz_half_micro
    FROM dev d JOIN mad a ON d.user_id = a.user_id
    """,
)
def robust_zscore_applyinpandas(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Grouped-map `applyInPandas` with a full relational oracle — the
    one Python-boundary surface (outside the multimodal codecs) graded
    value-for-value against SQL: per-user robust z-scores
    ((x − median) / MAD), the outlier scorer that resists the
    contamination plain mean/stddev suffers. The pandas side computes
    medians with numpy over integer cents; medians of an even count
    are the HALF-integer midpoint, so both the median and the MAD are
    carried ×2 and ×4 respectively as exact integers (med2, mad4), and
    the score is emitted as an integer floor-division in micro-units —
    no float ever crosses the comparator, proving the Arrow
    batch-transfer boundary is bit-faithful.

    Scale shape: applyInPandas shuffles once on user_id and streams one
    Arrow batch per group through Python — the legitimate use-case is
    exactly this (per-group algorithms with no builtin equivalent);
    the honest cost note is ~10-100× the codegen path for work
    builtins CAN express, which is why only this row and the codecs
    use it."""
    import pandas as pd

    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 40)
    t = ev.select(
        "user_id",
        "event_id",
        F.floor(F.col("value") * 100).cast("long").alias("v_cents"),
    )

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["v_cents"].to_numpy()
        srt = sorted(v.tolist())
        n = len(srt)
        med2 = (
            2 * srt[n // 2]
            if n % 2
            else srt[n // 2 - 1] + srt[n // 2]
        )
        absdev2 = [abs(2 * int(x) - med2) for x in v]
        sdev = sorted(absdev2)
        mad4 = (
            2 * sdev[n // 2]
            if n % 2
            else sdev[n // 2 - 1] + sdev[n // 2]
        )
        out = pdf.copy()
        out["med2"] = med2
        out["mad4"] = mad4
        def trunc_div(num: int, den: int) -> int:
            # SQL integer division (DuckDB //, Spark DIV) TRUNCATES
            # toward zero; Python // floors toward -inf — they disagree
            # on every negative numerator (staging caught the off-by-one
            # on below-median scores). Match SQL explicitly.
            return -((-num) // den) if num < 0 else num // den

        out["rz_half_micro"] = [
            trunc_div((2 * int(x) - med2) * 1000000, mad4)
            if mad4 > 0
            else 0
            for x in v
        ]
        return out

    schema = (
        "user_id bigint, event_id bigint, v_cents bigint,"
        " med2 bigint, mad4 bigint, rz_half_micro bigint"
    )
    return t.groupBy("user_id").applyInPandas(score, schema)


# ------------------------------------------------ time-weighted average --


@query(
    "time_weighted_avg",
    oracle="""
    WITH seg AS (
        SELECT user_id,
               CAST(floor(value * 100) AS BIGINT) AS v_cents,
               epoch_us(ts) AS t0,
               lead(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS t1
        FROM events WHERE event_type = 'view' AND user_id < 60
    )
    SELECT user_id,
           CAST(count(t1) AS BIGINT) AS n_segments,
           CAST(sum(v_cents * (t1 - t0)) AS BIGINT) AS vt_sum,
           CAST(sum(t1 - t0) AS BIGINT) AS t_sum,
           CAST(sum(v_cents * (t1 - t0)) // sum(t1 - t0) AS BIGINT)
               AS twap_cents
    FROM seg WHERE t1 IS NOT NULL
    GROUP BY 1
    """,
)
def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TWAP) — the correct mean for
    irregularly-sampled series, where each observation holds until the
    next one: weight every value by its holding interval (lead(ts) − ts
    in integer microseconds, a step-function integral), then divide the
    weighted sum by total held time. A plain avg() over the same rows
    is wrong whenever sampling is bursty — which event streams always
    are. All arithmetic integer (cents × micros, floor-division at the
    end); the last observation per key has no successor and is
    excluded (open interval) — the documented convention.

    Scale shape: one hash exchange on user_id; the lead() window and
    the aggregate share the same partitioning so Catalyst plans one
    sort, one shuffle. At 100 TB identical to any per-key window — the
    integral form never materializes a resampled grid (contrast the
    gap-fill row which does, for its different contract)."""
    ev = load_table(spark, sf_dir, "events").where(
        (F.col("event_type") == "view") & (F.col("user_id") < 60)
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = ev.select(
        "user_id",
        F.floor(F.col("value") * 100).cast("long").alias("v_cents"),
        F.unix_micros("ts").alias("t0"),
        F.lead(F.unix_micros("ts")).over(w).alias("t1"),
    ).where(F.col("t1").isNotNull())
    from sparkksqldbbenchmark_spark.functions.timeseries import (
        time_weighted_avg_agg,
        twap_col,
    )

    return (
        seg.groupBy("user_id")
        .agg(*time_weighted_avg_agg("v_cents", "t0", "t1"))
        .withColumn("twap_cents", twap_col())
    )


# ------------------------------------------------ DECIMAL arithmetic --


@query(
    "decimal_arithmetic_suite",
    oracle="""
    SELECT o_orderpriority,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18, 2)))
                AS VARCHAR) AS total_dec,
           CAST(CAST(avg(CAST(o_totalprice AS DECIMAL(18, 2)))
                     AS DECIMAL(24, 6)) AS VARCHAR) AS avg_dec,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18, 2))
                    * CAST(0.07 AS DECIMAL(4, 2)))
                AS VARCHAR) AS tax_dec,
           CAST(max(CAST(o_totalprice AS DECIMAL(18, 2))
                    - CAST(o_totalprice AS DECIMAL(18, 0)))
                AS VARCHAR) AS max_frac
    FROM orders GROUP BY 1
    """,
)
def decimal_arithmetic_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DECIMAL arithmetic — the type money actually requires
    (float sums drift; every stable_sum in this repo works around that
    with integer cents — this row grades the ENGINE's native exact
    path). Casts to DECIMAL(18,2), then sum / average / scaled multiply
    (0.07 tax at DECIMAL(4,2) — product scale rules) / truncation
    difference, each emitted as a CANONICAL STRING: Spark and DuckDB
    assign different result precision/scale to intermediate decimals
    (Spark sum → (28,2), DuckDB sum → (38,2)), so the portable contract
    is the VALUE at an agreed scale, pinned by explicit final casts and
    string rendering — which is also how a file interchange would
    serialize them.

    Scale shape: decimal aggregation is codegen over unscaled longs
    (128-bit where needed) — same partial/final hash-agg plan as any
    sum, ~2× the ALU cost of a double but exact; one shuffle on the
    bounded priority key."""
    o = load_table(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    return o.groupBy("o_orderpriority").agg(
        F.sum(dec).cast("string").alias("total_dec"),
        F.avg(dec).cast("decimal(24,6)").cast("string").alias("avg_dec"),
        F.sum(dec * F.lit("0.07").cast("decimal(4,2)"))
        .cast("string")
        .alias("tax_dec"),
        F.max(dec - F.col("o_totalprice").cast("decimal(18,0)"))
        .cast("string")
        .alias("max_frac"),
    )


# ------------------------------------------------ join strategy hints --


@query(
    "hint_join_strategies",
    oracle="""
    SELECT n_name,
           count(*) AS n_customers,
           CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT)
               AS bal_cents
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY 1
    """,
)
def hint_join_strategies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join strategy HINTS — the per-query override lever when the
    optimizer's size estimates are wrong (the 100 TB reality: stale
    stats after a backfill): the same customer⋈nation aggregate is
    planned under BROADCAST, MERGE (sort-merge) and SHUFFLE_HASH hints,
    the query ASSERTS each hint actually selected its strategy in the
    physical plan (BroadcastHashJoin / SortMergeJoin / ShuffledHashJoin
    — a silently ignored hint is the failure mode this row exists to
    catch), asserts all three agree with the unhinted plan's answer,
    and returns the broadcast variant for grading. The oracle is the
    plain join: hints move work, never answers.

    Scale shape: broadcast is right here (nation is tiny) and is what
    the unhinted plan picks; the MERGE/SHUFFLE_HASH variants exist to
    prove the escape hatch works — on real skew you'd reach for them
    deliberately, paying one exchange per side instead of a driver
    OOM on a mis-estimated broadcast."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")

    def agg_of(joined: DataFrame) -> DataFrame:
        return joined.groupBy("n_name").agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.floor(F.col("c_acctbal") * 100)).alias("bal_cents"),
        )

    cond = c.c_nationkey == n.n_nationkey
    variants = {
        "BROADCAST": ("BroadcastHashJoin", agg_of(c.join(n.hint("broadcast"), cond))),
        "MERGE": ("SortMergeJoin", agg_of(c.join(n.hint("merge"), cond))),
        "SHUFFLE_HASH": (
            "ShuffledHashJoin",
            agg_of(c.join(n.hint("shuffle_hash"), cond)),
        ),
    }
    rows_ref = None
    for hint_name, (op, df) in variants.items():
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert op in plan, f"{hint_name} hint ignored — no {op} in plan"
        got = sorted(tuple(r) for r in df.collect())
        if rows_ref is None:
            rows_ref = got
        else:
            assert got == rows_ref, f"{hint_name} changed the answer"
    return variants["BROADCAST"][1]


# -------------------------------------------- observe() metrics API --


@query(
    "observe_metrics_suite",
    oracle="""
    SELECT 'n_rows' AS metric, count(*) AS value FROM events
    UNION ALL
    SELECT 'sum_cents', CAST(sum(CAST(floor(value * 100) AS BIGINT))
                             AS BIGINT) FROM events
    UNION ALL
    SELECT 'n_click', CAST(sum(CASE WHEN event_type = 'click'
                                    THEN 1 ELSE 0 END) AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'n_null_props', CAST(sum(CASE WHEN props IS NULL
                                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM events
    """,
)
def observe_metrics_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `Dataset.observe` metrics API — Spark's zero-extra-pass
    pipeline instrumentation: named aggregate metrics attach to a point
    in the plan and accumulate DURING whatever action runs, instead of
    a second scan. At 100 TB this is THE way to get row counts, null
    rates and checksums out of an ingest job for free; a separate audit
    query would double the scan bill. The graded claim: metrics
    observed on the scan during an unrelated downstream action equal a
    direct aggregation of the same table (the oracle) — i.e. the
    observation sees every row exactly once, unaffected by what the
    main query computes.

    Scale shape: observed metrics are accumulator-style partials merged
    on the driver — no shuffle, no extra pass; the downstream action
    here is a tiny count. (The driver-side Observation.get and the
    4-row createDataFrame are metric plumbing, not data movement —
    same class as the bench's report rendering.)"""
    from pyspark.sql import Observation

    ev = load_table(spark, sf_dir, "events")
    obs = Observation("audit")
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.floor(F.col("value") * 100)).alias("sum_cents"),
        F.sum(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        ).alias("n_click"),
        F.sum(F.when(F.col("props").isNull(), 1).otherwise(0)).alias(
            "n_null_props"
        ),
    )
    observed.groupBy().count().collect()  # any action flushes metrics
    vals = obs.get
    rows = [
        ("n_rows", int(vals["n_rows"])),
        ("sum_cents", int(vals["sum_cents"])),
        ("n_click", int(vals["n_click"])),
        ("n_null_props", int(vals["n_null_props"])),
    ]
    return spark.createDataFrame(rows, "metric string, value bigint")


@query(
    "streaming_session_window_append",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts,
               CASE WHEN epoch_us(ts)
                         - lag(epoch_us(ts)) OVER (
                               PARTITION BY user_id ORDER BY ts)
                         > 1800000000
                         OR lag(ts) OVER (
                               PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    ), sess AS (
        SELECT user_id, ts,
               sum(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS session_id
        FROM marked
    ), agg AS (
        SELECT user_id,
               min(ts) AS session_start,
               max(ts) + INTERVAL 30 MINUTE AS session_end,
               count(*) AS n_events
        FROM sess GROUP BY user_id, session_id
    ), wm AS (
        SELECT max(ts) - INTERVAL 2 HOUR AS w FROM events
    )
    SELECT user_id, session_start, session_end, n_events
    FROM agg WHERE session_end < (SELECT w FROM wm)
    """,
)
def streaming_session_window_append(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Watermarked session windows in APPEND mode — the production form
    of the complete-mode row staged alongside: a session emits exactly
    once, when the watermark proves it can no longer grow (no event can
    arrive within the gap of its last event). The closed-set rule:
    emit iff session_end (= last event + gap) < final watermark
    (max event time − 2 h delay); later sessions are HELD in state, not
    emitted — the same trade the outer-join rows pin, here for the
    MERGING window operator whose state width is dynamic. The oracle
    replays gaps-and-islands sessionization and applies the eviction
    predicate relationally.

    Scale shape: state shuffles on user_id and holds only OPEN sessions
    (closed ones evicted at each watermark advance — this is what
    bounds memory on an infinite stream, and exactly what the
    complete-mode twin trades away for batch-equality)."""
    import uuid

    from sparkksqldbbenchmark_spark.plans.streaming_queries import (
        _read_events_stream,
    )
    from sparkksqldbbenchmark_spark.streaming.pipeline import run_to_memory

    ev = _read_events_stream(spark, sf_dir).withWatermark("ts", "2 hours")
    sess = (
        ev.groupBy(F.session_window("ts", "30 minutes"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )
    name = f"stream_sessap_{uuid.uuid4().hex[:8]}"
    q = run_to_memory(sess, name, output_mode="append")
    q.stop()
    return spark.table(name)


# ----------------------------------- pivot fold of the multiway join --


def _pivot_fold_oracle() -> str:
    from sparkksqldbbenchmark_spark.plans.reference_queries import (
        _AVG_V,
        _BUCKET_H,
        _FMT,
    )

    return f"""
    WITH click AS (
        SELECT {_BUCKET_H} AS datetime, {_AVG_V} AS click_value
        FROM events WHERE event_type = 'click' GROUP BY 1
    ), view AS (
        SELECT {_BUCKET_H} AS datetime, {_AVG_V} AS view_value
        FROM events WHERE event_type = 'view' GROUP BY 1
    ), error AS (
        SELECT {_BUCKET_H} AS datetime, {_AVG_V} AS error_value
        FROM events WHERE event_type = 'error' GROUP BY 1
    ), merged AS (
        SELECT coalesce(click.datetime, view.datetime, error.datetime)
                   AS datetime,
               click_value, view_value, error_value
        FROM click
        FULL OUTER JOIN view ON click.datetime = view.datetime
        FULL OUTER JOIN error
            ON coalesce(click.datetime, view.datetime) = error.datetime
    )
    SELECT strftime(datetime, {_FMT}) AS datetime,
           last_value(click_value IGNORE NULLS)
               OVER (ORDER BY datetime ROWS UNBOUNDED PRECEDING)
               AS click_value,
           last_value(view_value IGNORE NULLS)
               OVER (ORDER BY datetime ROWS UNBOUNDED PRECEDING)
               AS view_value,
           last_value(error_value IGNORE NULLS)
               OVER (ORDER BY datetime ROWS UNBOUNDED PRECEDING)
               AS error_value
    FROM merged
    """


@query("hourly_series_pivot_fold", oracle=_pivot_fold_oracle())
def hourly_series_pivot_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multiway series fold REPLANNED: where `multiway_timejoin_ffill`
    (the graded J1 operator demonstration — the reference notebook's
    merge-fold) scans events once per series and folds N−1 full-outer
    joins, this twin computes every series in ONE scan — group by
    (hour, event_type), then pivot the bounded type set to columns. The
    pivot's missing cells are NULL exactly where the full outer join
    produces NULL, so the result is BIT-IDENTICAL (verified against the
    same oracle and measured against the join form directly: 0.56 s vs
    0.69 s best-of-4 at sf0.1 — ~19% faster at 3 series, and the gap
    grows linearly with series count since the join form adds a scan
    and a join per series while this form adds only a pivot column).

    Scale shape: one events scan, one partial-aggregated shuffle on
    (hour, type), one bounded-key pivot aggregate — versus N scans +
    N shuffles + (N−1) joins. At 100 TB this is THE production plan for
    folding same-source series; the join form remains the right shape
    when the series come from DIFFERENT sources (no shared scan to
    pivot). Both are graded against the identical oracle."""
    from sparkksqldbbenchmark_spark.functions.stable import stable_avg
    from sparkksqldbbenchmark_spark.operators.joins import forward_fill

    events = load_table(spark, sf_dir, "events")
    merged = (
        events.where(F.col("event_type").isin("click", "view", "error"))
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(stable_avg("value", 2).alias("v"))
        .groupBy(F.col("w.start").alias("datetime"))
        .pivot("event_type", ["click", "view", "error"])
        .agg(F.first("v"))
        .withColumnRenamed("click", "click_value")
        .withColumnRenamed("view", "view_value")
        .withColumnRenamed("error", "error_value")
    )
    filled = forward_fill(
        merged, "datetime", ["click_value", "view_value", "error_value"]
    )
    return filled.withColumn(
        "datetime", F.date_format("datetime", "yyyy-MM-dd HH:mm:ss")
    )


# --------------------------------------- Python DataSource V2 sources --


@query(
    "python_datasource_stream_agg",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts),
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           count(*) AS n_events,
           CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
               AS cents
    FROM events GROUP BY 1
    """,
)
def python_datasource_stream_agg(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """A CUSTOM STREAMING SOURCE written against Spark 4's Python
    DataSource V2 API (sources/pyds.py `events_replay`), graded end to
    end: the source replays the events parquet as a deterministic
    micro-batched stream (offsets are row indexes; the full
    initialOffset → latestOffset → partitions → read → commit contract
    Spark drives), a windowed aggregation consumes it, and the
    complete-mode result must equal DuckDB aggregating the file
    directly — proving the source delivers every row exactly once with
    bit-faithful values and timestamps (integer-µs across the Python
    boundary; no float or tz ambiguity).

    Scale shape: partitions() shards the backlog into bounded row
    ranges read in parallel on executors; offset determinism is what
    makes restart/recovery exactly-once. The production upgrade is
    row-group-aligned ranges; the CONTRACT graded here is unchanged by
    that. This is the API for ingesting anything Spark lacks a
    connector for — queues, REST firehoses, proprietary formats —
    without leaving Python."""
    import uuid

    from sparkksqldbbenchmark_spark.sources.pyds import (
        register_python_sources,
    )
    from sparkksqldbbenchmark_spark.streaming.pipeline import run_to_memory

    register_python_sources(spark)
    stream = (
        spark.readStream.format("events_replay")
        .option("path", f"{sf_dir}/events.parquet")
        .option("batch_rows", "20000")
        .load()
    )
    agg = (
        stream.groupBy(F.window(F.timestamp_micros("ts_us"), "1 hour"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 100)).alias("cents"),
        )
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "n_events",
            "cents",
        )
    )
    name = f"pyds_agg_{uuid.uuid4().hex[:8]}"
    q = run_to_memory(agg, name, output_mode="complete")
    q.stop()
    return spark.table(name)


@query(
    "python_datasource_geojson_scan",
    oracle="""
    SELECT c_mktsegment AS parameter_id,
           count(*) AS n_obs,
           CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT)
               AS cents,
           CAST(min(c_custkey) AS BIGINT) AS min_station
    FROM customer WHERE c_custkey < 400
    GROUP BY 1
    """,
)
def python_datasource_geojson_scan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The reference's paginated-GeoJSON ingest as a CUSTOM BATCH
    DataSource (sources/pyds.py `geojson_pages`) — the executor-parallel
    upgrade of the driver-side loop sources/rest.py reproduces: landed
    pages are synthesized deterministically from the customer table
    (station = custkey, parameter = market segment, value = account
    balance), then read back THROUGH the source (one input partition
    per page, flatten on executors) and aggregated; the oracle
    aggregates the customer table directly. Equality proves the
    source's partitioning/flatten path delivers every feature exactly
    once with JSON-round-trip-exact doubles.

    Scale shape: page-per-partition parallelism — flatten cost scales
    out with executors instead of serializing on the driver, which is
    the entire point of writing the source against the engine API
    rather than as an ingest script. The page synthesis here is test
    plumbing (pyarrow → 4 json files in a tempdir), not part of the
    graded operator."""
    import json
    import os
    import tempfile

    import pyarrow.parquet as pq

    from sparkksqldbbenchmark_spark.sources.pyds import (
        register_python_sources,
    )

    register_python_sources(spark)
    tbl = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment", "c_acctbal", "c_nationkey"],
    )
    rows = [
        r
        for r in tbl.to_pylist()
        if r["c_custkey"] < 400
    ]
    rows.sort(key=lambda r: r["c_custkey"])
    d = tempfile.mkdtemp(prefix="geojson_cust_")
    page_size = 100
    for p in range(0, len(rows), page_size):
        feats = [
            {
                "properties": {
                    "stationId": str(r["c_custkey"]),
                    "parameterId": r["c_mktsegment"],
                    "value": r["c_acctbal"],
                    "observed": "2024-01-01",
                },
                "geometry": {
                    "coordinates": [
                        float(r["c_nationkey"]),
                        float(r["c_nationkey"]) / 2.0,
                    ]
                },
            }
            for r in rows[p : p + page_size]
        ]
        with open(
            os.path.join(d, f"page-{p // page_size:04d}.json"), "w"
        ) as fh:
            json.dump({"features": feats}, fh)
    df = spark.read.format("geojson_pages").option("path", d).load()
    return df.groupBy(
        F.col("parameterId").alias("parameter_id")
    ).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum(F.floor(F.col("value") * 100)).alias("cents"),
        F.min(F.col("stationId").cast("long")).alias("min_station"),
    )


@query(
    "python_datasource_sink_roundtrip",
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents WHERE doc_id < 500
    GROUP BY 1
    """,
)
def python_datasource_sink_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """A CUSTOM SINK on the Python DataSource V2 writer contract
    (sources/pyds.py `jsonl_pages`): executors write one JSONL file per
    task and return a commit message; the DRIVER's commit() publishes a
    manifest naming the complete file set — the exactly-once publish
    step (a reader honoring the manifest can never observe a partial
    job; abort() removes orphans). The graded claim is the round trip:
    documents → custom sink → manifest-driven read-back → aggregate
    must equal aggregating the source table directly, proving every
    partition's rows landed exactly once and survived the JSON
    round-trip losslessly.

    Scale shape: write parallelism = partition count with zero driver
    data movement (driver sees only KB-scale commit messages); the
    manifest is the idempotent-publish pattern every lakehouse commit
    protocol (Iceberg/Delta snapshot manifests) builds on, expressed in
    the engine's own writer API."""
    import json
    import os
    import tempfile

    from sparkksqldbbenchmark_spark.sources.pyds import (
        register_python_sources,
    )

    register_python_sources(spark)
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 500
    ).select("doc_id", "lang", "n_chars")
    d = tempfile.mkdtemp(prefix="jsonl_sink_")
    docs.repartition(4).write.format("jsonl_pages").option(
        "path", d
    ).mode("append").save()
    with open(os.path.join(d, "_MANIFEST.json")) as fh:
        manifest = json.load(fh)
    back = spark.read.json(
        [os.path.join(d, f) for f in manifest["files"]]
    )
    assert back.count() == manifest["rows"]
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


# ------------------------------------------------------- Python UDTF --


@query(
    "udtf_chunk_documents",
    oracle="""
    SELECT d.doc_id,
           CAST(g.i AS INTEGER) AS chunk_idx,
           substr(d.text, CAST(g.i AS INTEGER) * 120 + 1, 120) AS chunk
    FROM documents d, LATERAL (
        SELECT unnest(generate_series(
            0, CAST(ceil(len(d.text) / 120.0) AS INT) - 1)) AS i
    ) g
    WHERE d.doc_id < 300
    """,
)
def udtf_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A Python USER-DEFINED TABLE FUNCTION (Spark 4 `@udtf`,
    Arrow-optimized) — the API for row→many-rows logic too imperative
    for builtin generators: a document chunker yielding fixed 120-char
    windows with their index, invoked through the SQL LATERAL syntax
    (`FROM docs, LATERAL chunk_doc(...)`) exactly like a builtin
    generator. The oracle replays the chunking relationally
    (generate_series × substr), proving the Python table function's
    row expansion is value-identical to the declarative form.

    Honest cost note: the builtin-expression chunker
    (doc_chunk_stride, graded r06) IS the production path — UDTFs pay
    the Python boundary per row. The surface matters because real
    pipelines have expansion logic with no builtin twin (parsers,
    segmenters, tokenizers); this row pins the contract the engine
    gives them. Scale shape: UDTF evaluation is narrow (no shuffle) and
    partition-parallel, same as explode."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx: int, chunk: string", useArrow=True)
    class ChunkDoc:
        def eval(self, text: str):
            if text is None:
                return
            for i in range(0, len(text), 120):
                yield i // 120, text[i : i + 120]

    spark.udtf.register("chunk_doc", ChunkDoc)
    load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 300
    ).createOrReplaceTempView("docs_to_chunk")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.chunk
        FROM docs_to_chunk d, LATERAL chunk_doc(d.text) c
        """
    )


# ----------------------------------------------- XML codec round-trip --


@query(
    "xml_roundtrip_suite",
    oracle="""
    SELECT event_id,
           event_type AS rt_type,
           CAST(floor(value * 100) AS BIGINT) AS rt_cents,
           event_type AS xp_type,
           CAST(user_id AS VARCHAR) AS xp_user
    FROM events WHERE event_id < 2000
    """,
)
def xml_roundtrip_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML as a first-class codec (Spark 4 ships spark-xml in core):
    rows are ENCODED with `to_xml(struct(...))`, then read back two
    independent ways — `from_xml` with an explicit schema (the typed
    path) and the `xpath_string` function family (the query-language
    path) — and both must reproduce the original columns exactly (the
    oracle is the identity: the source columns themselves). Round-trip
    identity through two different decoders is the strongest
    self-contained XML-correctness claim the sandbox allows (DuckDB has
    no XML functions to twin against).

    Scale shape: encode/parse/xpath are all scan-side JVM codegen —
    zero shuffles; the same cost model as the JSON/variant rows. At
    100 TB the guidance mirrors JSON's: parse ONCE with a full schema
    (from_xml), not once per field (xpath)."""
    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") < 2000)
    xml = ev.select(
        "event_id",
        F.expr(
            "to_xml(struct(event_type AS t,"
            " CAST(floor(value * 100) AS BIGINT) AS c,"
            " user_id AS u))"
        ).alias("x"),
    )
    parsed = xml.select(
        "event_id",
        F.expr("from_xml(x, 't STRING, c BIGINT, u BIGINT')").alias("s"),
        F.expr("xpath_string(x, '/ROW/t')").alias("xp_type"),
        F.expr("xpath_string(x, '/ROW/u')").alias("xp_user"),
    )
    return parsed.select(
        "event_id",
        F.col("s.t").alias("rt_type"),
        F.col("s.c").alias("rt_cents"),
        "xp_type",
        "xp_user",
    )


# ------------------------------------------- approx top-k certified --


@query(
    "approx_topk_certified",
    oracle="""
    SELECT event_type AS item,
           count(*) AS approx_count,
           count(*) AS exact_count,
           TRUE AS count_exact
    FROM events GROUP BY 1
    """,
)
def approx_topk_certified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`approx_top_k` — the heavy-hitters sketch (space-saving style)
    Spark 4 ships natively — certified against exact counts: with the
    domain under the sketch's tracking capacity the sketch is PROVABLY
    exact, so every (item, count) it returns must equal the exact
    group-by (the certificate joins them and asserts equality — the
    approx_count_distinct/HLL grading pattern). k is set to the full
    domain so ties cannot make set membership ambiguous.

    Scale shape: one mergeable sketch partial per partition (bounded by
    tracked-item capacity, independent of row count) versus the exact
    path's full group-by — at 100 TB the sketch answers "top sources /
    top URLs / top tokens" from kilobytes of state where the exact
    answer needs a full shuffle; the certificate documents exactly when
    its counts can be trusted as exact (domain ≤ capacity)."""
    ev = load_table(spark, sf_dir, "events")
    sk = ev.agg(
        F.expr("approx_top_k(event_type, 5)").alias("top")
    ).select(F.explode("top").alias("e")).select(
        F.col("e.item").alias("item"),
        F.col("e.count").alias("approx_count"),
    )
    exact = ev.groupBy(F.col("event_type").alias("item")).agg(
        F.count(F.lit(1)).alias("exact_count")
    )
    return sk.join(exact, "item").select(
        "item",
        "approx_count",
        "exact_count",
        (F.col("approx_count") == F.col("exact_count")).alias(
            "count_exact"
        ),
    )


@query(
    "streaming_observe_metrics",
    oracle="""
    SELECT 'n_rows' AS metric, count(*) AS value FROM events
    UNION ALL
    SELECT 'cents', CAST(sum(CAST(floor(value * 100) AS BIGINT))
                         AS BIGINT) FROM events
    UNION ALL
    SELECT 'n_click', CAST(sum(CASE WHEN event_type = 'click'
                                    THEN 1 ELSE 0 END) AS BIGINT)
    FROM events
    """,
)
def streaming_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`observe()` on a STREAMING query — the per-micro-batch audit
    channel: named metrics attach to the stream and surface in each
    batch's StreamingQueryProgress (`observedMetrics`), which is how a
    production pipeline alerts on per-batch row counts / null rates /
    checksums WITHOUT a second stateful aggregation competing with the
    real one. The graded claim: the SUM of the per-batch observed
    metrics over the whole availableNow run equals DuckDB aggregating
    the source directly — i.e. the observation channel saw every row
    exactly once across all batches (the batch observe row's claim,
    extended over micro-batch boundaries).

    Scale shape: observed metrics are accumulator partials merged per
    batch — no state store, no extra shuffle; the progress JSON is the
    driver-side metric plumbing (same class as the bench's progress
    collection, mirroring the reference's monitor)."""
    import json
    import uuid

    from sparkksqldbbenchmark_spark.plans.streaming_queries import (
        _read_events_stream,
    )
    from sparkksqldbbenchmark_spark.streaming.pipeline import run_to_memory

    ev = _read_events_stream(spark, sf_dir)
    observed = ev.observe(
        "audit",
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.floor(F.col("value") * 100)).alias("cents"),
        F.sum(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        ).alias("n_click"),
    )
    agg = observed.groupBy("event_type").count()
    name = f"sobs_{uuid.uuid4().hex[:8]}"
    # recentProgress is a RING BUFFER capped by numRecentProgressUpdates
    # (default 100): a run with more micro-batches would silently drop
    # the earliest batches' metrics and undercount (ADVICE r07). Raise
    # the cap for the run and ASSERT we stayed under it, so the "saw
    # every row exactly once" total is provably complete.
    cap_key = "spark.sql.streaming.numRecentProgressUpdates"
    prev_cap = spark.conf.get(cap_key, None)
    spark.conf.set(cap_key, "10000")
    try:
        q = run_to_memory(agg, name, output_mode="complete")
        progresses = list(q.recentProgress)
        q.stop()
    finally:
        if prev_cap is None:
            spark.conf.unset(cap_key)
        else:
            spark.conf.set(cap_key, prev_cap)
    assert len(progresses) < 10000, (
        f"{len(progresses)} progress updates reached the ring-buffer cap;"
        " per-batch observed metrics may have been dropped"
    )
    mets = [
        m
        for m in (
            json.loads(p.json).get("observedMetrics", {}).get("audit")
            for p in progresses
        )
        if m
    ]
    totals = {
        "n_rows": sum(int(m["n_rows"]) for m in mets),
        "cents": sum(int(m["cents"]) for m in mets),
        "n_click": sum(int(m["n_click"]) for m in mets),
    }
    return spark.createDataFrame(
        [(k, v) for k, v in totals.items()], "metric string, value bigint"
    )
