"""Training-data curation queries: composite pipelines a 100 TB data
curation job actually runs — vocabulary statistics, quality+lang+dedup
filtering — built from the llm/ operators."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkksqldbbenchmark_spark.catalog import load_table
from sparkksqldbbenchmark_spark.llm import text as text_ops
from sparkksqldbbenchmark_spark.llm.hashing import spark_tokens
from sparkksqldbbenchmark_spark.plans.registry import query


@query(
    "vocab_top_tokens",
    oracle=r"""
    WITH tok AS (
        SELECT doc_id, unnest(list_distinct(regexp_extract_all(lower(text),
               '\S+'))) AS token
        FROM documents
    )
    SELECT token,
           count(*) AS doc_frequency
    FROM tok
    GROUP BY token
    ORDER BY doc_frequency DESC, token
    LIMIT 20
    """,
)
def vocab_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary statistics: top-20 tokens by document frequency
    (distinct docs containing the token). explode(distinct tokens) →
    count → TakeOrderedAndProject; partial counts merge map-side so the
    shuffle carries one row per (token, partition)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.expr(spark_tokens("lower(text)")))
        ).alias("token"),
    )
    return (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("doc_frequency"))
        .orderBy(F.desc("doc_frequency"), F.asc("token"))
        .limit(20)
    )


@query(
    "text_repetition_ratio",
    oracle=r"""
    WITH t AS (
        SELECT doc_id, regexp_extract_all(text, '\S+') AS toks FROM documents
    ), g AS (
        SELECT doc_id,
               list_transform(range(1, greatest(len(toks) - 2, 1) + 1),
                   i -> array_to_string(toks[i : i + 2], ' ')) AS grams
        FROM t
    )
    SELECT doc_id,
           CAST(len(grams) AS BIGINT) AS total_3grams,
           CAST(len(list_distinct(grams)) AS BIGINT) AS distinct_3grams,
           1.0 - CAST(len(list_distinct(grams)) AS DOUBLE)
                 / CAST(len(grams) AS DOUBLE) AS repetition_ratio
    FROM g
    """,
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition (boilerplate/spam signal): fraction of
    word 3-grams that are repeats. High ratio → templated or degenerate
    text — a standard pretraining-quality heuristic alongside the
    stopword/length filters."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.expr(spark_tokens("text")).alias("toks")
    )
    grams = toks.select(
        "doc_id",
        F.expr(
            "transform(sequence(1, greatest(size(toks) - 2, 1)),"
            " i -> concat_ws(' ', slice(toks, i, 3)))"
        ).alias("grams"),
    )
    return grams.select(
        "doc_id",
        F.size("grams").cast("long").alias("total_3grams"),
        F.size(F.array_distinct("grams")).cast("long").alias("distinct_3grams"),
        (
            F.lit(1.0)
            - F.size(F.array_distinct("grams")).cast("double")
            / F.size("grams").cast("double")
        ).alias("repetition_ratio"),
    )


@query(
    "curation_pipeline",
    oracle=rf"""
    WITH scored AS (
        SELECT doc_id, source, lang,
               CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)
                   AS n_tokens,
               CAST(len(list_filter(regexp_extract_all(text, '\S+'),
                    t -> list_contains([{",".join(chr(39)+w+chr(39) for w in text_ops.STOPWORDS["en"])}], lower(t))))
                   AS BIGINT) AS stopword_hits,
               min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id
        FROM documents
    ), kept AS (
        SELECT * FROM scored
        WHERE doc_id = canonical_id        -- exact-dedup keep-first
          AND n_tokens >= 20               -- length floor
          AND stopword_hits * 1.0 / n_tokens >= 0.05  -- quality floor
    )
    SELECT source,
           count(*) AS docs_kept,
           CAST(sum(n_tokens) AS BIGINT) AS tokens_kept
    FROM kept GROUP BY source
    """,
)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composite curation job: exact-dedup (keep canonical) + length
    floor + stopword-ratio quality floor, reporting kept docs/tokens per
    source — the shape of a real pretraining-data filter stage. One
    window (content-hash partition) + one aggregation."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    scored = text_ops.with_quality_scores(docs).withColumn(
        "canonical_id",
        F.min("doc_id").over(Window.partitionBy(F.md5("text"))),
    )
    kept = scored.where(
        (F.col("doc_id") == F.col("canonical_id"))
        & (F.col("n_tokens") >= 20)
        & (F.col("stopword_hits") * 1.0 / F.col("n_tokens") >= 0.05)
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("docs_kept"),
        F.sum("n_tokens").alias("tokens_kept"),
    )
