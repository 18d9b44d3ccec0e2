"""PII detection and redaction over document text — a standard
pretraining-curation stage (strip emails/phones/SSNs/IPs before a corpus
ships to training).

All regex work is built-in `regexp_replace` / `split` expressions — JVM
whole-stage-codegen, zero Python in the hot path, embarrassingly parallel
(per-row, no shuffle). At 100 TB this runs at scan speed.

Pattern dialect: the patterns below restrict themselves to the syntax
subset Java regex (Spark) and RE2 (the DuckDB oracle) implement
identically — character classes, bounded repetition, alternation, and
ASCII word boundaries. No lookaround, no backreferences (RE2 has
neither).

Match counting uses the split identity `count(pat) = size(split(s, pat,
-1)) - 1`; limit -1 keeps trailing empty fields in BOTH engines, so a
string ending in a match still counts it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Order matters: patterns are counted independently (they cannot overlap
# each other's matches — distinct shapes) but redaction applies them in
# this sequence.
PII_PATTERNS: dict[str, str] = {
    # local@domain.tld — conservative char classes, 2+ letter TLD
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # 3-2-4 digit groups (US SSN shape); \b keeps it off longer digit runs
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    # 3-3-4 digit groups (US phone shape) — disjoint from the SSN shape
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
    # dotted-quad IPv4 (loose: no 0-255 range check, matching common
    # scrubber practice — over-redaction is the safe direction)
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_count(text_col: str, pattern: str) -> F.Column:
    """Number of pattern matches in the column (split identity, see module
    docstring)."""
    return (F.size(F.split(F.col(text_col), pattern, -1)) - 1).cast("long")


def with_pii_scrub(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "redacted",
) -> DataFrame:
    """Add per-class PII match counts and a redacted text column where
    every match is replaced by its ``<CLASS>`` token.

    Counts are measured on the ORIGINAL text (before any replacement) so
    each class reports its true occurrence count regardless of redaction
    order.
    """
    out = df
    for name, pat in PII_PATTERNS.items():
        out = out.withColumn(f"{name}_count", pii_count(text_col, pat))
    red = F.col(text_col)
    for name, pat in PII_PATTERNS.items():
        red = F.regexp_replace(red, pat, f"<{name.upper()}>")
    total = None
    for name in PII_PATTERNS:
        c = F.col(f"{name}_count")
        total = c if total is None else total + c
    return out.withColumn(out_col, red).withColumn("total_pii", total)


def sql_pii_count(text_expr: str, pattern: str) -> str:
    """DuckDB twin of :func:`pii_count` (RE2 executes the same pattern)."""
    return (
        f"CAST(len(regexp_split_to_array({text_expr}, '{pattern}')) - 1"
        f" AS BIGINT)"
    )


def sql_pii_scrub(text_expr: str) -> str:
    """DuckDB twin of the redaction chain ('g' = replace all matches)."""
    red = text_expr
    for name, pat in PII_PATTERNS.items():
        red = f"regexp_replace({red}, '{pat}', '<{name.upper()}>', 'g')"
    return red
