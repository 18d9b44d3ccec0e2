"""Round-11 staging area: fully-built, oracle-verified queries that are
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
TAIL with pins -- mechanics as executed in rounds 6-10, see
plans/round6_queries.py .. round10_queries.py history).

Opening cohort: the eight suite siblings held back from the round-10
graduation (43 staged > 35 free slots; docs/ROTATION_R10.md holdback
priorities) -- each already verified at sf0.001/0.01/0.1 while staged
in round 9. New round-10 staging lands below them.

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
# Held back from the round-10 graduation (docs/ROTATION_R10.md):
# graded siblings cover each one's machinery; they graduate round 11.
# ===================================================================

# ------------------------------------------ HOF breadth, round 2 --


@staged_query(
    "hof_suite2",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               string_split(text, ' ')[1:8] AS a,
               string_split(text, ' ')[-8:] AS b
        FROM documents WHERE doc_id < 300
    )
    SELECT doc_id,
           len(list_filter(a, x -> len(x) > 6)) > 0 AS any_long,
           len(list_filter(a, x -> NOT (len(x) > 2))) = 0 AS all_gt2,
           array_to_string(
               list_transform(range(1, least(len(a), len(b)) + 1),
                              i -> a[i] || '_' || b[i]), '|') AS zipped,
           CAST(list_reduce(list_transform(a, x -> len(x)),
                            (acc, x) -> acc + x) * 2 AS BIGINT)
               AS double_len_sum,
           CAST(len(list_distinct(list_transform(a, x -> len(x))))
                AS INTEGER) AS n_distinct_lens
    FROM t
    """,
)
def hof_suite2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order-function breadth, round two (round one graded
    transform/filter/aggregate): `exists` / `forall` (the quantifier
    pair — DuckDB spells them through list_filter emptiness, which IS
    their definition), `zip_with` (element-wise pairing; the oracle
    replays it index-based since DuckDB's list_zip yields structs),
    and `aggregate` with a FINISH lambda (the third lambda slot round
    one didn't cover — fold then transform the accumulator). Zipped
    output serialized pipe-joined (container gate); zip_with over
    unequal lengths is truncated by slicing both sides to 8 tokens and
    the oracle ranges over least(len,len), pinning the
    shorter-length semantics explicitly.

    Scale shape: pure scan-side JVM codegen lambdas, zero shuffles —
    the whole point of HOFs over explode/re-collect.

    Reference basis: SURVEY §2.8 scalar-function surface, array-lambda
    completion."""
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 300
    )
    t = docs.select(
        "doc_id",
        F.expr("slice(split(text, ' '), 1, 8)").alias("a"),
        F.expr("slice(split(text, ' '), -8, 8)").alias("b"),
    )
    return t.select(
        "doc_id",
        F.expr("exists(a, x -> length(x) > 6)").alias("any_long"),
        F.expr("forall(a, x -> length(x) > 2)").alias("all_gt2"),
        F.array_join(
            F.expr("zip_with(a, b, (x, y) -> concat(x, '_', y))"), "|"
        ).alias("zipped"),
        F.expr(
            "aggregate(a, 0L, (acc, x) -> acc + length(x),"
            " acc -> acc * 2)"
        ).alias("double_len_sum"),
        F.size(
            F.array_distinct(F.expr("transform(a, x -> length(x))"))
        ).alias("n_distinct_lens"),
    )



# -------------------------------------- struct field mutation --


@staged_query(
    "struct_field_mutation_suite",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus AS status,
           CAST(CAST(o_totalprice AS DECIMAL(38,6)) * 100 AS BIGINT)
               AS cents,
           year(o_orderdate) AS order_year,
           upper(o_orderpriority) AS priority_uc
    FROM orders WHERE o_orderkey < 3000
    """,
)
def struct_field_mutation_suite(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Struct-column surgery — ``Column.withField`` / ``dropFields``
    (Spark 3.1+), the API that mutates ONE field of a deep struct
    without rebuilding the whole literal (the nested-payload editing
    primitive for event envelopes and feature bundles): build an order
    envelope struct, ADD two derived fields with withField, DROP the
    raw price field, then flatten to scalars at the boundary (struct
    outputs are not a result-contract type — container gate). The
    oracle computes the surviving fields directly, proving the
    mutation chain is value-preserving.

    Scale shape: withField/dropFields compile to a single
    UpdateFields expression — scan-side codegen, no shuffle, and
    column pruning still reaches the parquet scan through it.

    Reference basis: the reference's payload flattening (P1) works on
    structs the consumer REBUILDS; this grades the in-place mutation
    API a Spark-first pipeline uses instead."""
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderkey") < 3000
    )
    env = o.select(
        "o_orderkey",
        F.struct(
            F.col("o_orderstatus").alias("status"),
            F.col("o_totalprice").alias("price"),
            F.col("o_orderdate").alias("d"),
            F.col("o_orderpriority").alias("prio"),
        ).alias("s"),
    )
    mutated = env.select(
        "o_orderkey",
        F.col("s")
        .withField(
            "cents",
            (F.col("s.price").cast("decimal(38,6)") * 100).cast("long"),
        )
        .withField("order_year", F.year("s.d"))
        .withField("priority_uc", F.upper("s.prio"))
        .dropFields("price", "d", "prio")
        .alias("s"),
    )
    return mutated.select(
        "o_orderkey",
        F.col("s.status").alias("status"),
        F.col("s.cents").alias("cents"),
        F.col("s.order_year").alias("order_year"),
        F.col("s.priority_uc").alias("priority_uc"),
    )



# ------------------------------------------ named WINDOW clause --


@staged_query(
    "named_window_clause_sql",
    oracle="""
    SELECT event_id,
           user_id,
           row_number() OVER w AS rn,
           CAST(sum(CAST(CAST(value AS DECIMAL(38,6)) * 100 AS BIGINT))
                OVER wf AS BIGINT) AS running_cents,
           CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_user
    FROM events WHERE event_id < 3000
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
           wf AS (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def named_window_clause_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-standard named WINDOW clause: one window definition
    (`WINDOW w AS (...)`) referenced by multiple window functions —
    graded byte-identical SQL on both engines. Cross-engine parser
    finding this row pins: the SQL-standard in-place frame extension of
    a named window (`OVER (w ROWS ...)`) parses in DuckDB but NOT in
    Spark 4, so the portable spelling is a second named window carrying
    the frame (`wf AS (... ROWS ...)`), used here on both sides.
    Running cents accumulate in exact integers (the decimal-cents
    contract); both named windows must bind to the same
    partitioning/order for the one-exchange plan.

    Scale shape: all three window functions share one (user_id)
    partitioning; Catalyst plans a single exchange + sort and evaluates
    the unordered count in the same pass. Named windows are purely
    front-end — the plan is identical to the expanded form.

    Reference basis: SQL-surface family (SURVEY §2 A2's ksql/SQL front
    door; siblings pipe_syntax/groupby_all graduated r9)."""
    _view(spark, sf_dir, "events")
    return spark.sql(
        """
        SELECT event_id,
               user_id,
               row_number() OVER w AS rn,
               CAST(sum(CAST(CAST(value AS DECIMAL(38,6)) * 100
                        AS BIGINT))
                    OVER wf AS BIGINT) AS running_cents,
               CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT)
                   AS n_user
        FROM events WHERE event_id < 3000
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
               wf AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        """
    )



# ------------------------------------- LIKE quantifier breadth --


@staged_query(
    "like_quantifier_suite",
    oracle="""
    SELECT doc_id,
           (text LIKE '%join%' AND text LIKE '%hash%') AS has_both,
           (text LIKE '%vector%' OR text LIKE '%batch%') AS has_either,
           NOT (text LIKE '%window%') AS lacks_window,
           (upper(text) LIKE '%SCAN%') AS ilike_scan,
           (text LIKE '%sort%merge%') AS ordered_pair
    FROM documents WHERE doc_id < 400
    """,
)
def like_quantifier_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE-family quantifiers: Spark's `LIKE ALL (...)` / `LIKE ANY
    (...)` multi-pattern forms, `NOT LIKE`, `ILIKE` (case-insensitive),
    and a multi-wildcard ordered pattern — graded against the oracle's
    definitional AND/OR expansion (DuckDB has no LIKE ALL/ANY, which is
    the portability note this row documents: the quantifier forms are
    Spark sugar over conjunction/disjunction, and the expansion is the
    cross-engine spelling). ILIKE grades against upper() + LIKE, its
    definition.

    Scale shape: scan-side codegen; multi-pattern LIKE compiles to the
    same conjunction the oracle spells, and a leading-wildcard pattern
    is a contains scan — linear per row, embarrassingly parallel.

    Reference basis: SURVEY §2.8 string-predicate breadth (F-suite
    siblings: regexp rows, string_suite2)."""
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 400
    )
    return docs.select(
        "doc_id",
        F.expr("text LIKE ALL ('%join%', '%hash%')").alias("has_both"),
        F.expr("text LIKE ANY ('%vector%', '%batch%')").alias(
            "has_either"
        ),
        F.expr("text NOT LIKE '%window%'").alias("lacks_window"),
        F.expr("text ILIKE '%ScAn%'").alias("ilike_scan"),
        F.expr("text LIKE '%sort%merge%'").alias("ordered_pair"),
    )



# --------------------------------------- text format round-trip --


@staged_query(
    "text_format_roundtrip",
    oracle="""
    SELECT doc_id,
           lang,
           CAST(n_chars AS BIGINT) AS n_chars,
           CAST(len(text) AS BIGINT) AS text_len
    FROM documents WHERE doc_id < 400
    """,
)
def text_format_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TEXT file format as a first-class source/sink (the last core
    format untested: parquet/ORC/CSV/JSON/XML all have graded rows):
    rows serialize to pipe-delimited LINES via write.text, read back
    with spark.read.text (one `value` column per line), and parse back
    to typed columns — the log-file / plain-corpus ingestion shape. The
    oracle recomputes every parsed value from the base table, so the
    round-trip is proven lossless for the serialized fields (text
    LENGTH survives; the text itself stays out of the line protocol —
    embedded delimiters are the csv_line_codec row's territory).

    Scale shape: text write/read is the cheapest scan there is (no
    footer, no schema — splittable by line); parsing is scan-side
    split/cast codegen. The honest note: losing types/stats/pushdown
    is WHY parquet wins at rest — this row grades the format because
    raw-text corpora are an ingestion reality, not a recommendation.

    Reference basis: SURVEY §2.1 source/format matrix completion."""
    import tempfile as _tempfile

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 400
    )
    out = _tempfile.mkdtemp(prefix="textfmt_") + "/lines"
    (
        docs.select(
            F.concat_ws(
                "|",
                F.col("doc_id").cast("string"),
                "lang",
                F.col("n_chars").cast("string"),
                F.length("text").cast("string"),
            ).alias("value")
        )
        .coalesce(1)
        .write.mode("overwrite")
        .text(out)
    )
    lines = spark.read.text(out)
    parts = F.split(F.col("value"), r"\|")
    return lines.select(
        F.element_at(parts, 1).cast("long").alias("doc_id"),
        F.element_at(parts, 2).alias("lang"),
        F.element_at(parts, 3).cast("long").alias("n_chars"),
        F.element_at(parts, 4).cast("long").alias("text_len"),
    )



# ----------------------------------------- map HOFs, round two --


@staged_query(
    "map_hof_suite2",
    oracle="""
    WITH per AS (
        SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c,
               CAST(sum(CAST(CAST(value AS DECIMAL(38,6)) * 100
                    AS BIGINT)) AS BIGINT) AS cents
        FROM events WHERE user_id < 150 GROUP BY 1, 2
    )
    SELECT user_id,
           array_to_string(list_sort(list_transform(
               list(event_type), t -> 'k_' || t)), '|') AS renamed_keys,
           CAST(sum(c * cents) AS BIGINT) AS zip_dot,
           CAST(max(CASE WHEN c >= 5 THEN cents END) AS BIGINT)
               AS max_cents_hot
    FROM per GROUP BY user_id
    """,
)
def map_hof_suite2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions, round two (round one graded
    element_at/map_keys/transform_values/map_filter): `transform_keys`
    (rename every key through a lambda — emitted as the sorted
    pipe-joined key list), and `map_zip_with` (align TWO maps on their
    key union and combine per key — here a count-map and a cent-sum map
    zip to per-key products, folded to a scalar). The oracle computes
    each derived value relationally from the same per-(user, type)
    aggregates; map internal order never reaches the comparator.

    Scale shape: same two-level aggregate as round one (partial shuffle
    to (user, type), second keyed on user); per-user maps bounded by
    |event types| = 5. All lambdas are JVM codegen.

    Reference basis: completes SURVEY §2.8's map-lambda surface."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 150)
    per = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum((F.col("value").cast("decimal(38,6)") * 100).cast("long"))
        .cast("long")
        .alias("cents"),
    )
    m = per.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "c")))
        ).alias("mc"),
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "cents")))
        ).alias("ms"),
    )
    return m.select(
        "user_id",
        F.array_join(
            F.sort_array(
                F.map_keys(
                    F.expr("transform_keys(mc, (k, v) -> concat('k_', k))")
                )
            ),
            "|",
        ).alias("renamed_keys"),
        F.expr(
            "aggregate(map_values(map_zip_with(mc, ms,"
            " (k, c, s) -> c * s)), 0L, (acc, x) -> acc + x)"
        ).alias("zip_dot"),
        F.expr(
            "array_max(map_values(map_filter(map_zip_with(mc, ms,"
            " (k, c, s) -> IF(c >= 5, s, NULL)), (k, v) -> v IS NOT"
            " NULL)))"
        ).alias("max_cents_hot"),
    )



# ----------------------------- unionByName with missing columns --


@staged_query(
    "union_missing_columns_suite",
    oracle="""
    SELECT o_orderkey AS k, o_orderstatus AS status,
           CAST(CAST(o_totalprice AS DECIMAL(38,6)) * 100 AS BIGINT)
               AS cents,
           'orders_v1' AS src
    FROM orders WHERE o_orderkey < 1500
    UNION ALL
    SELECT o_orderkey AS k, o_orderstatus AS status,
           CAST(NULL AS BIGINT) AS cents,
           'orders_v2' AS src
    FROM orders WHERE o_orderkey >= 1500 AND o_orderkey < 2500
    """,
)
def union_missing_columns_suite(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``unionByName(allowMissingColumns=True)`` — the schema-drift
    union (two snapshots of a feed where a column was added/dropped):
    columns align BY NAME, and a column absent from one side
    materializes as typed NULLs instead of failing or silently
    position-shifting (plain UNION's classic corruption when schemas
    drift). The v2 slice drops the price column; the oracle spells the
    NULL materialization explicitly. This is the batch twin of
    schema_evolution_mergeschema (which graded the same drift at the
    FILE level).

    Scale shape: union is a no-shuffle plan node; the NULL fill is a
    projection. Nothing here grows with scale.

    Reference basis: SURVEY §2.7 set-op family (U1–U3) under schema
    evolution."""
    o = load_table(spark, sf_dir, "orders")
    v1 = o.where(F.col("o_orderkey") < 1500).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        (F.col("o_totalprice").cast("decimal(38,6)") * 100)
        .cast("long")
        .alias("cents"),
        F.lit("orders_v1").alias("src"),
    )
    v2 = o.where(
        (F.col("o_orderkey") >= 1500) & (F.col("o_orderkey") < 2500)
    ).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.lit("orders_v2").alias("src"),
    )
    return v1.unionByName(v2, allowMissingColumns=True)



# -------------------------------------- lateral column aliases --


@staged_query(
    "lateral_column_alias_sql",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_totalprice AS DECIMAL(38,6)) * 100 AS BIGINT)
               AS cents,
           CAST(CAST(o_totalprice AS DECIMAL(38,6)) * 100 AS BIGINT)
               // 100000 AS price_band,
           (CAST(CAST(o_totalprice AS DECIMAL(38,6)) * 100 AS BIGINT)
               // 100000) * 2 + year(o_orderdate) % 2 AS band_code
    FROM orders WHERE o_orderkey < 3000
    """,
)
def lateral_column_alias_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL COLUMN ALIASES (Spark 3.4 SQL): a SELECT item referencing
    a SIBLING alias defined earlier in the same list (`cents` feeds
    `price_band` feeds `band_code`) — the deduplication that otherwise
    forces nested subqueries or repeated expressions. Graded against
    the fully-expanded oracle (DuckDB also resolves lateral aliases,
    but the EXPANDED form is the engine-neutral meaning this row pins —
    alias chains must be pure sugar, value-identical to substitution).
    Exact integer cents/band arithmetic throughout.

    Scale shape: alias resolution is purely syntactic — Catalyst
    substitutes the expression tree, producing the identical scan-side
    codegen Project as the expanded spelling; zero runtime cost.

    Reference basis: SQL-surface family (pipe syntax, GROUP BY ALL,
    named windows — the modern-SQL ergonomics set)."""
    _view(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(38,6)) * 100 AS BIGINT)
                   AS cents,
               cents DIV 100000 AS price_band,
               price_band * 2 + year(o_orderdate) % 2 AS band_code
        FROM orders WHERE o_orderkey < 3000
        """
    )



# ===================================================================
# Round-10 staging: new-surface operators for the round-11 graduation.
# ===================================================================

# ----------------------- null-aware anti join (NOT IN with NULLs) --


@staged_query(
    "null_aware_antijoin_notin",
    oracle="""
    WITH dim AS (
        SELECT CASE WHEN c_custkey % 97 = 0 THEN NULL
                    ELSE c_custkey END AS k
        FROM customer WHERE c_mktsegment = 'BUILDING'
    ),
    dim_clean AS (
        SELECT c_custkey AS k FROM customer
        WHERE c_mktsegment = 'BUILDING' AND c_custkey % 97 <> 0
    )
    SELECT 'with_null_set' AS variant,
           count(*) AS n_rows,
           CAST(coalesce(sum(o_orderkey), 0) AS BIGINT) AS key_sum
    FROM orders
    WHERE o_custkey NOT IN (SELECT k FROM dim)
    UNION ALL
    SELECT 'null_free_set' AS variant,
           count(*) AS n_rows,
           CAST(coalesce(sum(o_orderkey), 0) AS BIGINT) AS key_sum
    FROM orders
    WHERE o_custkey NOT IN (SELECT k FROM dim_clean)
    """,
)
def null_aware_antijoin_notin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN over a subquery whose column CONTAINS NULLs — the
    three-valued-logic trap ANSI mandates: one NULL in the set makes
    `x NOT IN (set)` UNKNOWN for every x, so the with-null branch must
    return ZERO rows, while the null-free branch is an ordinary anti
    join. Spark compiles the nullable case to a dedicated physical
    operator (BroadcastNullAwareHashJoin — asserted in-query) because a
    plain hash anti join would silently return the wrong rows; the
    null-free twin stays an ordinary Broadcast/SMJ anti join. Both
    branches graded value-for-value against DuckDB's ANSI semantics.

    Scale shape: null-aware anti join requires the build side broadcast
    (the null check is a global property, not partitionable by key) —
    which is exactly why production pipelines rewrite hot NOT IN paths
    to NOT EXISTS when the column is provably non-null; this row pins
    BOTH behaviors so the rewrite's legality is graded, not assumed.

    Reference basis: filter/subquery semantics family (SURVEY §2.2 P4
    null handling; extension beyond the reference's F-suite)."""
    _view(spark, sf_dir, "orders", "customer")
    df = spark.sql(
        """
        WITH dim AS (
            SELECT CASE WHEN c_custkey % 97 = 0 THEN NULL
                        ELSE c_custkey END AS k
            FROM customer WHERE c_mktsegment = 'BUILDING'
        ),
        dim_clean AS (
            SELECT c_custkey AS k FROM customer
            WHERE c_mktsegment = 'BUILDING' AND c_custkey % 97 <> 0
        )
        SELECT 'with_null_set' AS variant,
               count(*) AS n_rows,
               CAST(coalesce(sum(o_orderkey), 0) AS BIGINT) AS key_sum
        FROM orders
        WHERE o_custkey NOT IN (SELECT k FROM dim)
        UNION ALL
        SELECT 'null_free_set' AS variant,
               count(*) AS n_rows,
               CAST(coalesce(sum(o_orderkey), 0) AS BIGINT) AS key_sum
        FROM orders
        WHERE o_custkey NOT IN (SELECT k FROM dim_clean)
        """
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the isNullAwareAntiJoin flag prints as the trailing `true` of
    # `BroadcastHashJoin [...], [...], LeftAnti, BuildRight, true`
    assert "LeftAnti, BuildRight, true" in plan, (
        "expected the null-aware anti join flag in the plan:\n" + plan
    )
    return df


# ------------------------------- FULL JOIN USING key coalescing --


@staged_query(
    "using_join_full_coalesce",
    oracle="""
    WITH a AS (
        SELECT o_custkey AS k, count(*) AS n_orders
        FROM orders WHERE o_orderkey % 3 = 0 GROUP BY 1
    ),
    b AS (
        SELECT o_custkey AS k, count(*) AS n_big
        FROM orders WHERE o_totalprice > 100000 GROUP BY 1
    )
    SELECT k,
           coalesce(n_orders, 0) + 0 AS n_orders,
           coalesce(n_big, 0) + 0 AS n_big,
           CASE WHEN n_orders IS NULL THEN 'right_only'
                WHEN n_big IS NULL THEN 'left_only'
                ELSE 'both' END AS side
    FROM a FULL JOIN b USING (k)
    """,
)
def using_join_full_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER JOIN ... USING(k): ANSI requires the USING column to
    surface ONCE, coalesced across sides — `k` must be non-null even
    for rows that exist on only one side (where a qualified a.k or b.k
    would be NULL). The side marker recomputes which input each row
    came from, so a broken coalesce (Spark emitting the left key only —
    the classic USING bug class) would null out every right_only key
    and hash-mismatch. Both engines run the identical ANSI text.

    Scale shape: ordinary shuffled full-outer on the grouped inputs —
    |keys| rows a side, uniform custkey distribution; the USING
    projection is free.

    Reference basis: join-semantics family (SURVEY §2.3; extension —
    the reference's joins are equi ON joins)."""
    _view(spark, sf_dir, "orders")
    return spark.sql(
        """
        WITH a AS (
            SELECT o_custkey AS k, count(*) AS n_orders
            FROM orders WHERE o_orderkey % 3 = 0 GROUP BY 1
        ),
        b AS (
            SELECT o_custkey AS k, count(*) AS n_big
            FROM orders WHERE o_totalprice > 100000 GROUP BY 1
        )
        SELECT k,
               coalesce(n_orders, 0) + 0 AS n_orders,
               coalesce(n_big, 0) + 0 AS n_big,
               CASE WHEN n_orders IS NULL THEN 'right_only'
                    WHEN n_big IS NULL THEN 'left_only'
                    ELSE 'both' END AS side
        FROM a FULL JOIN b USING (k)
        """
    )


# ------------------------- correlated EXISTS with non-equi term --


@staged_query(
    "correlated_nonequi_exists",
    oracle="""
    SELECT o.o_orderpriority,
           count(*) AS n_orders
    FROM orders o
    WHERE o.o_orderkey < 20000
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 45 DAY
          AND l.l_quantity > 25
      )
    GROUP BY 1
    """,
)
def correlated_nonequi_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS whose predicate mixes an equi term
    (l_orderkey = o_orderkey) with a NON-EQUI correlation
    (l_shipdate > o_orderdate + 45 days): the decorrelator must carry
    the outer's o_orderdate INTO the join and keep the inequality as a
    join condition, not a post-filter on a semi join keyed only on
    orderkey (which would be wrong only when an order has late-but-
    small and early-but-large lineitems — planted by the quantity
    term). TPC-H Q4's shape plus the inequality stress. Both engines
    decorrelate the identical ANSI text.

    Scale shape: LEFT SEMI hash/SMJ on the equi key with the non-equi
    residual evaluated inside the join — one shuffle on orderkey,
    uniform by construction.

    Reference basis: SURVEY §2.3 J-family extension (the q4/q21/q22
    correlated shapes graded since r4; this adds the non-equi term)."""
    _view(spark, sf_dir, "orders", "lineitem")
    return spark.sql(
        """
        SELECT o.o_orderpriority,
               count(*) AS n_orders
        FROM orders o
        WHERE o.o_orderkey < 20000
          AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 45 DAY
              AND l.l_quantity > 25
          )
        GROUP BY 1
        """
    )
