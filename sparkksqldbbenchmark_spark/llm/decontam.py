"""Benchmark decontamination: flag training documents whose word
n-grams overlap an evaluation set.

The standard pre-training hygiene pass (reference corpus-curation
surface has no equivalent — beyond-reference training-pipeline op):
any training document sharing enough long word n-grams with an eval
benchmark is contamination and must be dropped or flagged before
training. n is chosen long (8+ words) so incidental phrase reuse does
not fire; only real copies share 8-grams.

Scale design: the eval side of the join is small by construction
(benchmarks are MBs, the corpus is TBs), so its distinct shingle-hash
set is BROADCAST — the corpus-side scan streams through a map-side
hash join with no shuffle of the corpus at all. Shingles are hashed to
the shared 60-bit md5 integer (llm/hashing) so the broadcast holds
longs, not strings. If the eval set ever outgrows the broadcast
threshold, pass ``broadcast_eval=False`` to fall back to a shuffle
join keyed on the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkksqldbbenchmark_spark.llm.hashing import (
    spark_md5_int,
    spark_tokens,
    spark_word_shingles_from_tokens,
)


def shingle_hash_rows(
    df: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    """(id, shash) — one row per DISTINCT word n-gram of each document,
    hashed to the cross-engine 60-bit md5 integer. Token array is
    materialized in its own projection first (see
    spark_word_shingles_from_tokens: inlining the tokenizer into the
    shingle lambda re-runs the regex per shingle)."""
    return (
        df.select(
            F.col(id_col), F.expr(spark_tokens(text_col)).alias("__toks")
        )
        .select(
            id_col,
            F.explode(
                F.expr(spark_word_shingles_from_tokens("__toks", n))
            ).alias("__sh"),
        )
        .select(id_col, F.expr(spark_md5_int("__sh")).alias("shash"))
    )


def ngram_overlap(
    train: DataFrame,
    eval_df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    threshold: float = 0.3,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Per training document: total distinct n-gram count, how many of
    those n-grams appear anywhere in the eval set, the overlap fraction,
    and ``contaminated`` = fraction >= threshold. Every training doc is
    returned (overlap 0 included) so the output is a full audit table."""
    ev = (
        shingle_hash_rows(eval_df, text_col, id_col, n)
        .select("shash")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    if broadcast_eval:
        ev = F.broadcast(ev)
    tr = shingle_hash_rows(train, text_col, id_col, n)
    # ONE corpus pass: left-join the (distinct, so at most one match per
    # shingle) eval hash set onto the shingle stream map-side, then a
    # single groupBy counts total and hit shingles together. The naive
    # form — separate totals/hits aggregates joined back — shuffles the
    # corpus twice and shuffles again for the join; this shape shuffles
    # the corpus exactly once and partial-aggregates map-side first.
    joined = tr.join(ev, "shash", "left")
    frac = F.col("overlap_count").cast("double") / F.col("n_shingles").cast(
        "double"
    )
    return (
        joined.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("__hit").alias("overlap_count"),
        )
        .withColumn("overlap_frac", frac)
        .withColumn("contaminated", frac >= F.lit(threshold))
    )
