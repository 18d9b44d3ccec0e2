"""Exact-substring duplication at token-position grain — the span-level
dedup operator behind Lee-et-al exact-substring training-data dedup,
at k-token window resolution (the window grain downstream span-excision
actually consumes).

Pipeline: slide a k-token window over each document, hash each window
(md5 60-bit — the repo's cross-engine hash, llm/hashing.py), mark
positions whose window text occurs in >= min_docs distinct documents,
and merge CONSECUTIVE shared positions into maximal spans with the
gaps-and-islands construction (pos − row_number() is constant within a
consecutive run).

Scale shape: one shuffle on the window hash for the document-frequency
aggregate, one hash join back on the same key (re-usable exchange),
one id-keyed window+fold. Never materializes document PAIRS — cost is
O(total windows) = O(total tokens), the property that separates this
from the n² all-pairs formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def positional_window_hashes(
    df: DataFrame, text_col: str, id_col: str, k: int
) -> DataFrame:
    """(id, pos, h): one row per k-token window position (1-based over
    the whitespace-token sequence of lowercased text); h is the md5
    60-bit hash of the space-joined window. Documents shorter than k
    tokens contribute nothing."""
    toks = df.select(
        F.col(id_col),
        F.expr(
            f"regexp_extract_all(lower({text_col}), '\\\\S+', 0)"
        ).alias("t"),
    ).where(F.expr(f"size(t) >= {k}"))
    return toks.select(
        id_col,
        F.explode(
            F.expr(
                f"transform(sequence(1, size(t) - {k - 1}),"
                f" i -> struct(i AS pos,"
                f" cast(conv(substring(md5(concat_ws(' ',"
                f" slice(t, i, {k}))), 1, 15), 16, 10) as bigint)"
                f" AS h))"
            )
        ).alias("pk"),
    ).select(id_col, F.col("pk.pos").alias("pos"), F.col("pk.h").alias("h"))


def shared_span_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Per-document shared-substring span statistics: (id_col,
    n_shared_pos, n_spans, longest_span_tokens). Only documents with at
    least one shared window appear. longest_span_tokens counts TOKENS
    (span windows + k − 1)."""
    pos = positional_window_hashes(df, text_col, id_col, k)
    if min_docs == 2:
        # "occurs in >= 2 distinct documents" ⟺ min(id) != max(id) over
        # the hash partition. Two window aggregates over ONE exchange on
        # h replace the count_distinct aggregate + join-back, which
        # computed the tokenize/hash projection TWICE (each consumer
        # re-derived `pos`) and shuffled it twice (the aggregate's
        # partial rows and the join's probe side do not share an
        # exchange). Skew behavior is unchanged: a hot window hash lands
        # in one task either way. min_docs > 2 keeps the general
        # count_distinct form.
        wh = Window.partitionBy("h")
        shared = (
            pos.withColumn("__id_min", F.min(id_col).over(wh))
            .withColumn("__id_max", F.max(id_col).over(wh))
            .where(F.col("__id_min") != F.col("__id_max"))
            .select(id_col, "pos")
        )
    else:
        freq = pos.groupBy("h").agg(F.count_distinct(id_col).alias("nd"))
        shared = pos.join(
            freq.where(F.col("nd") >= min_docs), "h"
        ).select(id_col, "pos")
    w = Window.partitionBy(id_col).orderBy("pos")
    isl = shared.withColumn("grp", F.col("pos") - F.row_number().over(w))
    spans = isl.groupBy(id_col, "grp").agg(
        F.count(F.lit(1)).alias("span_kg")
    )
    return spans.groupBy(id_col).agg(
        F.sum("span_kg").cast("long").alias("n_shared_pos"),
        F.count(F.lit(1)).alias("n_spans"),
        (F.max("span_kg") + (k - 1)).cast("long").alias(
            "longest_span_tokens"
        ),
    )
