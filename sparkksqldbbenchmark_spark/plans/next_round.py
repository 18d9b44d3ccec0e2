"""Round-8 staging area: fully-built, oracle-verified queries that are
NOT yet registered with the driver-graded registry.

Why a separate module: the driver grades exactly the first 50 entries of
``__spark_entry__.queries()`` and this round's 50-slot head is already
committed (every slot holds a query awaiting a fresh green row —
displacing one would leave it ungraded, violating the rotation contract
in tests/test_contract.py). New work therefore lands here with a
MODULE-LOCAL registry; tests/test_next_round.py runs the same
Spark-vs-DuckDB comparison the driver runs, so each staged query is
already verified green before it rotates into the graded head next
round (swap ``staged_query`` for ``plans.registry.query``, import the
module from ``__spark_entry__``, and move freshly-green head rows to
TAIL with pins — mechanics as executed in rounds 6 and 7, see
plans/round6_queries.py and plans/round7_queries.py history).

Round-8 themes: the modern Spark-4 SQL surface still uncovered after
round 7 — LATERAL correlated subqueries, SQL-defined scalar functions
(CREATE TEMPORARY FUNCTION ... RETURN, the macro layer), the VARIANT
semi-structured type, string collations, GROUP BY ALL / ORDER BY ALL /
SQL UNPIVOT syntax, map-typed columns, array algebra, generator
null-semantics (explode_outer/posexplode_outer/inline), regexp and
string function breadth, bitwise algebra, datetime interval arithmetic,
per-key sequence densification, width_bucket histograms, sketch
aggregates (datasketches HLL + exact bitmap) — plus LLM-pipeline
operators (exact-dyadic EMA quality smoothing, share-of-total mixture
reporting, largest-remainder quota apportionment, ANN MRR certificate,
near-dup graph degree audit, log2 token-length histogram) and two
streaming semantics (stream-stream FULL OUTER join, streaming session
windows).

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
    """Module-local twin of plans.registry.query — keeps staged work out
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


# ------------------------------------------------ LATERAL correlated --


@staged_query(
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
    rank-over-partition rewrite — one hash exchange on the correlation
    key, per-key heaps, never a per-row re-execution of the subquery
    (the plan contains a Window + filter, not an iterative loop). The
    c_custkey < 500 slice bounds the graded frame; the decorrelated
    plan is the one a full-table run would use."""
    _view(spark, sf_dir, "customer", "orders")
    return spark.sql(STAGED_ORACLE["lateral_topn_per_key"])


# ----------------------------------------------- SQL-defined functions --


@staged_query(
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


@staged_query(
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


@staged_query(
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


@staged_query(
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
    return spark.sql(STAGED_ORACLE["groupby_all_unpivot_sql"])
