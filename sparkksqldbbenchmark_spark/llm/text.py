"""Text analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting. All built-in
string/regex/array expressions — zero Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkksqldbbenchmark_spark.llm.hashing import spark_md5_int

# n-gram-heuristic language ID: stopword hit counts per language, CJK by
# script range. Shared with the oracle (llm_queries inlines the same sets).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "pour"],
    "es": ["el", "los", "las", "y", "es", "un", "una", "en", "por"],
}

# BPE-ish pre-tokenizer: letter runs, single digits, non-space symbols —
# the GPT-2-style split shape, regex-only.
BPE_PATTERN = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\\\s]"
PUNCT_PATTERN = "[^A-Za-z0-9\\\\s]"
WS_PATTERN = "\\\\S+"


def _count(col: str, pattern: str) -> F.Column:
    return F.expr(f"size(regexp_extract_all({col}, '{pattern}', 0))").cast(
        "long"
    )


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish subword count."""
    return df.withColumn(
        "ws_tokens", _count(text_col, WS_PATTERN)
    ).withColumn("bpe_tokens", _count(text_col, BPE_PATTERN))


def with_quality_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features: length, token stats, punctuation and
    stopword ratios, and a fixed-weight composite score. Ratios stay
    unrounded doubles (deterministic IEEE — same expression both engines).
    """
    n_chars = F.length(text_col).cast("long")
    ws = _count(text_col, WS_PATTERN)
    punct = _count(text_col, PUNCT_PATTERN)
    stop_arr = ",".join(f"'{w}'" for w in STOPWORDS["en"])
    stop_hits = F.expr(
        f"size(filter(regexp_extract_all({text_col}, '{WS_PATTERN}', 0),"
        f" t -> array_contains(array({stop_arr}), lower(t))))"
    ).cast("long")
    tokens_d = ws.cast("double")
    return (
        df.withColumn("n_chars_calc", n_chars)
        .withColumn("n_tokens", ws)
        .withColumn("punct_count", punct)
        .withColumn("stopword_hits", stop_hits)
        .withColumn(
            "avg_token_len",
            F.expr(
                f"aggregate(regexp_extract_all({text_col}, '{WS_PATTERN}', 0),"
                " cast(0 as bigint), (a, t) -> a + length(t))"
            ).cast("double")
            / tokens_d,
        )
        .withColumn("punct_ratio", punct.cast("double") / n_chars.cast("double"))
        .withColumn("stopword_ratio", stop_hits.cast("double") / tokens_d)
        .withColumn(
            "quality_score",
            F.lit(0.4) * F.least(tokens_d / F.lit(100.0), F.lit(1.0))
            + F.lit(0.4) * (stop_hits.cast("double") / tokens_d)
            + F.lit(0.2)
            * (F.lit(1.0) - punct.cast("double") / n_chars.cast("double")),
        )
    )


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Predict language: CJK script presence → zh; otherwise argmax of
    per-language stopword hits (ties resolved in en>de>fr>es order);
    no hits → und."""
    def hits(lang: str) -> F.Column:
        arr = ",".join(f"'{w}'" for w in STOPWORDS[lang])
        return F.expr(
            f"size(filter(regexp_extract_all({text_col}, '{WS_PATTERN}', 0),"
            f" t -> array_contains(array({arr}), lower(t))))"
        ).cast("long")

    df = (
        df.withColumn("hits_en", hits("en"))
        .withColumn("hits_de", hits("de"))
        .withColumn("hits_fr", hits("fr"))
        .withColumn("hits_es", hits("es"))
        .withColumn(
            "has_cjk",
            F.expr(f"{text_col} rlike '[\\\\x{{4e00}}-\\\\x{{9fff}}]'"),
        )
    )
    best = F.greatest("hits_en", "hits_de", "hits_fr", "hits_es")
    return df.withColumn(
        "predicted_lang",
        F.when(F.col("has_cjk"), "zh")
        .when(best == 0, "und")
        .when(F.col("hits_en") == best, "en")
        .when(F.col("hits_de") == best, "de")
        .when(F.col("hits_fr") == best, "fr")
        .otherwise("es"),
    )


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprint: md5 of the lowercased alphanumeric-only
    normalization, plus a 60-bit integer form for joins/partitioning."""
    norm = f"lower(regexp_replace({text_col}, '[^A-Za-z0-9]+', ''))"
    return df.withColumn("fingerprint", F.expr(f"md5({norm})")).withColumn(
        "fingerprint_int", F.expr(spark_md5_int(norm))
    )
